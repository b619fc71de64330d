"""Pallas TPU kernels for tile×cluster ray traversal.

Three design decisions carry all the performance here:

1. **Per-tile trip counts.** The jnp tracer (geom/cluster.py) runs all
   tiles in lock-step: every round sweeps (tiles × TILE × CH·K) lanes
   and the loop runs until the WORST tile's cluster list is exhausted.
   Here the pallas grid is one program per ray tile and each tile runs
   `ceil(own_coverage / CH)` rounds (coverage via scalar prefetch), with
   double-buffered HBM→VMEM DMA of the cluster feature blocks and an
   ordered-entry-t pruning test that stops a tile as soon as the next
   cluster's entry t exceeds every lane's best hit — the wavefront
   analog of near-child-first BVH descent (bvh.rs:840-874 semantics).

2. **The intersection test is a matmul.** The scalarised Plücker test
   (w_i = d·U_i + m·V_i, t = (k − n·o)/(n·d)) is linear in the ray, so
   for a whole round of CH clusters it is ONE f32 matmul on the MXU
   systolic array: L(TILE,16) @ F(16, 5·CH·K) with ray rows
   L = [d m 0 0 o 1 tmin tmax 0 0]. tmin/tmax ride in L columns whose
   feature rows are zero, so they don't perturb the product. Only the
   sign tests, the division and the argmin reduction stay on the VPU.

3. **Block-major rounds.** The HBM layout is (C, 16, 5, K): one DMA
   per cluster lands block-major in scratch (16, 5, CH, K), so after
   the matmul each of the five Plücker planes [w0|w1|w2|nd|tnum] is a
   single contiguous (TILE, CH·K) slice — the whole VPU tail runs once
   per round on wide vectors instead of once per cluster on narrow
   ones (~CH× fewer vector instructions).

Layout contract (produced by geom/cluster.py):
  packed_mxu (C, 16, 5, K) f32  MXU feature blocks; K=128 lanes
  rays       (nt, TILE, 16) f32 L rows as above
  corder     (nt, CPAD) i32   per-tile cluster ids, ascending entry t
  tnear      (nt, CPAD) f32   matching entry t (INF past the coverage)
  counts     (nt,)      i32   covered clusters per tile
outputs:
  closest:  t_best (nt, TILE) f32 (t_max where missed),
            slot   (nt, TILE) i32 global slot = cluster_rank·K + lane
            (cluster_rank indexes corder), -1 where missed
  any-hit:  occ    (nt, TILE) i32 0/1
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import INF

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 8          # clusters fetched per round
SLOT_MASK = 2047
_EPS = 1e-12

# MXU precision for the Plücker matmul. "highest" = 6 bf16 passes
# (exact f32); "bf16x3" = 3-pass split-float (hi/lo bf16, dropping only
# the lo·lo term ~2^-16 relative — f32-faithful products, validated
# against brute force on real scenes, 2× faster than highest);
# "bf16x3f" (default) = the SAME three products fused into ONE matmul
# by stacking the splits along the contraction axis:
#     [Lhi | Llo | Lhi] (TILE,48) @ [Fhi ; Fhi ; Flo] (48,N)
#   = Lhi·Fhi + Llo·Fhi + Lhi·Flo  (= bf16x3 exactly)
# The MXU pads K to its native 128 either way, so K=48 costs one pass —
# measured ~3× less MXU time than three K=16 passes, bit-identical
# accumulation order aside. Mosaic has no native Precision.HIGH, hence
# the manual splits. "default" (1 bf16 pass) flips sign tests on
# near-edge hits — only for experiments.
PRECISION = os.environ.get("PBRT_TPU_MXU_PRECISION", "bf16x3f")


def _dot_raw(L, F, precision):
    return jax.lax.dot_general(L, F, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(L, F):
    if PRECISION == "highest":
        return _dot_raw(L, F, jax.lax.Precision.HIGHEST)
    if PRECISION == "default":
        return _dot_raw(L, F, jax.lax.Precision.DEFAULT)
    lhi, llo = _split_bf16(L)
    fhi, flo = _split_bf16(F)
    d = jax.lax.Precision.DEFAULT
    if PRECISION == "bf16x3":
        return (_dot_raw(lhi, fhi, d) + _dot_raw(lhi, flo, d)
                + _dot_raw(llo, fhi, d))
    # bf16x3f: one K=48 pass (see module docstring above)
    L3 = jnp.concatenate([lhi, llo, lhi], axis=1)
    F3 = jnp.concatenate([fhi, fhi, flo], axis=0)
    return _dot_raw(L3, F3, d)


def _round_planes(L, scratch_round, k):
    """MXU pass for one round + the five contiguous plane slices.
    scratch_round: (16, 5, CH·K) block-major features."""
    chk = scratch_round.shape[2] * scratch_round.shape[3]
    W = _dot(L, scratch_round.reshape(16, 5 * chk))   # (TILE, 5·CHK)
    w0 = W[:, 0 * chk:1 * chk]
    w1 = W[:, 1 * chk:2 * chk]
    w2 = W[:, 2 * chk:3 * chk]
    nd = W[:, 3 * chk:4 * chk]
    tnum = W[:, 4 * chk:5 * chk]
    return w0, w1, w2, nd, tnum


def _round_t(L, scratch_round, k, tmin, t_lim):
    """Fused VPU tail: sign test, plane t, validity → t (TILE, CHK)
    with misses at INF."""
    w0, w1, w2, nd, tnum = _round_planes(L, scratch_round, k)
    same = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) | \
           ((w0 <= 0) & (w1 <= 0) & (w2 <= 0))
    ndok = jnp.abs(nd) > _EPS
    t = tnum / jnp.where(ndok, nd, _EPS)
    ok = same & ndok & (t > tmin) & (t < t_lim)
    return jnp.where(ok, t, INF)


def _start_round(corder_ref, packed_ref, scratch, sems, r, s):
    for j in range(CH):
        cid = corder_ref[0, 0, r * CH + j]
        pltpu.make_async_copy(
            packed_ref.at[cid],
            scratch.at[s, :, :, j, :],
            sems.at[s, j]).start()


def _wait_round(packed_ref, scratch, sems, s):
    for j in range(CH):
        pltpu.make_async_copy(
            packed_ref.at[0],
            scratch.at[s, :, :, j, :],
            sems.at[s, j]).wait()


def _make_closest_kernel(tile, k):
    chk = CH * k

    def kernel(counts_ref, corder_ref, tnear_ref, rays_ref, packed_ref,
               t_out, slot_out, scratch, sems):
        count = counts_ref[0, 0, 0]
        n_rounds = (count + CH - 1) // CH
        cpad = tnear_ref.shape[2]

        L = rays_ref[0]                                  # (TILE, 16)
        tmin = rays_ref[0, :, 12:13]
        tmax = rays_ref[0, :, 13:14]
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, chk), 1)

        @pl.when(n_rounds > 0)
        def _():
            _start_round(corder_ref, packed_ref, scratch, sems, 0, 0)

        def body(r, carry):
            t_best, best_slot, done = carry
            cur = r % 2

            @pl.when(r + 1 < n_rounds)
            def _():
                _start_round(corder_ref, packed_ref, scratch, sems,
                             r + 1, 1 - cur)
            _wait_round(packed_ref, scratch, sems, cur)

            def compute(args):
                t_best, best_slot = args
                t = _round_t(L, scratch[cur], k, tmin, t_best)
                # pack (t, slot) into one int key: a single min-reduce
                # yields both the (slightly conservative) best t and
                # the winning lane; the exact t is recovered by the
                # host-side finalize pass. t > tmin ≥ 0 keeps the f32
                # bit pattern order-preserving as int32.
                t_bits = jax.lax.bitcast_convert_type(t, jnp.int32)
                key = (t_bits & ~jnp.int32(SLOT_MASK)) | slot_iota
                kmin = jnp.min(key, axis=1, keepdims=True)
                tj = jax.lax.bitcast_convert_type(
                    kmin & ~jnp.int32(SLOT_MASK), jnp.float32)
                upd = tj < t_best
                gslot = r * chk + (kmin & SLOT_MASK)
                best_slot = jnp.where(upd, gslot, best_slot)
                t_best = jnp.where(upd, tj, t_best)
                return t_best, best_slot

            t_best, best_slot = jax.lax.cond(
                done, lambda args: args, compute, (t_best, best_slot))
            # ordered-entry-t pruning: clusters arrive sorted by entry
            # t, so once the next round's nearest entry exceeds every
            # lane's best hit no later cluster can improve any lane.
            nxt = jnp.minimum((r + 1) * CH, cpad - 1)
            done = done | (tnear_ref[0, 0, nxt] >= jnp.max(t_best))
            return t_best, best_slot, done

        init = (tmax, jnp.full((tile, 1), -1, jnp.int32),
                jnp.zeros((), jnp.bool_))
        t_best, best_slot, _ = jax.lax.fori_loop(0, n_rounds, body, init)
        t_out[0, :, :] = t_best
        slot_out[0, :, :] = best_slot

    return kernel


def _make_anyhit_kernel(tile, k):
    def kernel(counts_ref, corder_ref, tnear_ref, rays_ref, packed_ref,
               occ_out, scratch, sems):
        count = counts_ref[0, 0, 0]
        n_rounds = (count + CH - 1) // CH

        L = rays_ref[0]
        tmin = rays_ref[0, :, 12:13]
        tmax = rays_ref[0, :, 13:14]
        live = tmax > tmin

        @pl.when(n_rounds > 0)
        def _():
            _start_round(corder_ref, packed_ref, scratch, sems, 0, 0)

        def body(r, carry):
            occ, done = carry
            cur = r % 2

            @pl.when(r + 1 < n_rounds)
            def _():
                _start_round(corder_ref, packed_ref, scratch, sems,
                             r + 1, 1 - cur)
            _wait_round(packed_ref, scratch, sems, cur)

            def compute(occ):
                t = _round_t(L, scratch[cur], k, tmin, tmax)
                # occ carried as i32: Mosaic can't legalize (TILE,1)
                # i1 vectors as fori_loop carries.
                return occ | jnp.any(t < INF, axis=1,
                                     keepdims=True).astype(jnp.int32)

            occ = jax.lax.cond(done, lambda o: o, compute, occ)
            done = jnp.all((occ != 0) | ~live)
            return occ, done

        init = (jnp.zeros((tile, 1), jnp.int32), jnp.zeros((), jnp.bool_))
        occ, _ = jax.lax.fori_loop(0, n_rounds, body, init)
        occ_out[0, :, :] = occ

    return kernel


def _common_specs(nt, tile, cpad, n_out):
    """(in_specs, out_specs) for the traversal kernels.

    counts/corder/tnear ride as per-tile SMEM blocks: whole-array
    scalar prefetch would need nt*cpad*8 bytes of SMEM (~1.3 MB at
    256 tiles x 644 clusters) and overflows it."""
    # 3-D with singleton middle axis: the TPU block rule wants the last
    # two block dims divisible by (8, 128) OR equal to the array dims —
    # (1, cpad) blocks of an (nt, 1, cpad) array satisfy the latter.
    in_specs = [
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, cpad), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, cpad), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, tile, 16), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    out_specs = [
        pl.BlockSpec((1, tile, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    ] * n_out
    return in_specs, out_specs


def traverse_tiles(packed_mxu, rays, corder, tnear, counts, interpret=False):
    """Closest hit. packed_mxu (C, 16, 5, K) f32, rays (nt, TILE, 16)
    f32, corder (nt, CPAD) i32 / tnear (nt, CPAD) f32 (CPAD a CH
    multiple, ascending entry t), counts (nt,) i32 →
    (t_best (nt, TILE) f32, slot (nt, TILE) i32, slot = rank·K+lane)."""
    nt, tile, _ = rays.shape
    c, nf, nb, k = packed_mxu.shape
    cpad = corder.shape[1]
    in_specs, out_specs = _common_specs(nt, tile, cpad, 2)
    t_b, slot = pl.pallas_call(
        _make_closest_kernel(tile, k),
        grid=(nt,), in_specs=in_specs, out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((nt, tile, 1), jnp.float32),
                   jax.ShapeDtypeStruct((nt, tile, 1), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((2, 16, 5, CH, k), jnp.float32),
            pltpu.SemaphoreType.DMA((2, CH)),
        ],
        interpret=interpret,
    )(counts[:, None, None].astype(jnp.int32), corder[:, None, :],
      tnear[:, None, :], rays, packed_mxu)
    return t_b[:, :, 0], slot[:, :, 0]


def occluded_tiles(packed_mxu, rays, corder, tnear, counts, interpret=False):
    """Any hit (shadow rays). Same layout contract as traverse_tiles →
    occ (nt, TILE) bool."""
    nt, tile, _ = rays.shape
    c, nf, nb, k = packed_mxu.shape
    cpad = corder.shape[1]
    in_specs, out_specs = _common_specs(nt, tile, cpad, 1)
    occ = pl.pallas_call(
        _make_anyhit_kernel(tile, k),
        grid=(nt,), in_specs=in_specs, out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((nt, tile, 1), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((2, 16, 5, CH, k), jnp.float32),
            pltpu.SemaphoreType.DMA((2, CH)),
        ],
        interpret=interpret,
    )(counts[:, None, None].astype(jnp.int32), corder[:, None, :],
      tnear[:, None, :], rays, packed_mxu)[0]
    return occ[:, :, 0] != 0
