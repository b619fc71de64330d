"""Pallas TPU kernels for tile×cluster ray traversal.

Two design decisions carry all the performance here:

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
   for a whole cluster it is ONE f32 matmul on the MXU systolic array:
   L(TILE,16) @ F(16,5K) with ray rows L = [d m 0 0 o 1 tmin tmax 0 0]
   and per-triangle feature columns [U|V, n, −n|k] (layout in
   geom/cluster.py NF_MXU). tmin/tmax ride in L columns whose feature
   rows are zero, so they don't perturb the product. Only the sign
   tests, the division and the argmin reduction stay on the VPU — ~8×
   less VPU work than the FMA-chain formulation.

Layout contract (produced by geom/cluster.py):
  packed_mxu (C, 16, 5K) f32  MXU feature blocks; K=128 lanes
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

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import INF

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 4          # clusters fetched per round
SLOT_MASK = 2047
_EPS = 1e-12


def _dot(L, F):
    # HIGHEST: full-f32 MXU passes. DEFAULT would run one bf16 pass
    # (8-bit mantissa) and flip the w-sign tests on near-edge hits.
    return jax.lax.dot_general(L, F, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _cluster_blocks(W, j, k, tmin, t_lim):
    """VPU tail of the matmul: sign test, plane t, validity mask.
    Returns t (TILE, K) with misses at INF."""
    kb = 5 * k
    w0 = W[:, j * kb + 0 * k: j * kb + 1 * k]
    w1 = W[:, j * kb + 1 * k: j * kb + 2 * k]
    w2 = W[:, j * kb + 2 * k: j * kb + 3 * k]
    nd = W[:, j * kb + 3 * k: j * kb + 4 * k]
    tnum = W[:, j * kb + 4 * k: j * kb + 5 * k]
    same = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) | \
           ((w0 <= 0) & (w1 <= 0) & (w2 <= 0))
    ndok = jnp.abs(nd) > _EPS
    t = tnum / jnp.where(ndok, nd, _EPS)
    ok = same & ndok & (t > tmin) & (t < t_lim)
    return jnp.where(ok, t, INF)


def _make_closest_kernel(tile, k):
    kb = 5 * k

    def kernel(counts_ref, corder_ref, tnear_ref, rays_ref, packed_ref,
               t_out, slot_out, scratch, sems):
        count = counts_ref[0, 0, 0]
        n_rounds = (count + CH - 1) // CH
        cpad = tnear_ref.shape[2]

        L = rays_ref[0]                                  # (TILE, 16)
        tmin = rays_ref[0, :, 12:13]
        tmax = rays_ref[0, :, 13:14]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

        def start_round(r, s):
            for j in range(CH):
                cid = corder_ref[0, 0, r * CH + j]
                pltpu.make_async_copy(
                    packed_ref.at[cid],
                    scratch.at[s, slice(None), pl.ds(j * kb, kb)],
                    sems.at[s, j]).start()

        def wait_round(s):
            for j in range(CH):
                pltpu.make_async_copy(
                    packed_ref.at[0],
                    scratch.at[s, slice(None), pl.ds(j * kb, kb)],
                    sems.at[s, j]).wait()

        @pl.when(n_rounds > 0)
        def _():
            start_round(0, 0)

        def body(r, carry):
            t_best, best_slot, done = carry
            cur = r % 2

            @pl.when(r + 1 < n_rounds)
            def _():
                start_round(r + 1, 1 - cur)
            wait_round(cur)

            def compute(args):
                t_best, best_slot = args
                W = _dot(L, scratch[cur])                # (TILE, CH·kb) MXU
                for j in range(CH):
                    t = _cluster_blocks(W, j, k, tmin, t_best)
                    # pack (t, lane) into one int key: a single
                    # min-reduce yields both the (slightly conservative)
                    # best t and the winning lane; exact t is recovered
                    # by the host-side finalize pass. t > tmin ≥ 0 keeps
                    # the f32 bit pattern order-preserving as int32.
                    t_bits = jax.lax.bitcast_convert_type(t, jnp.int32)
                    key = (t_bits & ~jnp.int32(SLOT_MASK)) | lane_iota
                    kmin = jnp.min(key, axis=1, keepdims=True)
                    tj = jax.lax.bitcast_convert_type(
                        kmin & ~jnp.int32(SLOT_MASK), jnp.float32)
                    upd = tj < t_best
                    gslot = (r * CH + j) * k + (kmin & SLOT_MASK)
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
    kb = 5 * k

    def kernel(counts_ref, corder_ref, tnear_ref, rays_ref, packed_ref,
               occ_out, scratch, sems):
        count = counts_ref[0, 0, 0]
        n_rounds = (count + CH - 1) // CH

        L = rays_ref[0]
        tmin = rays_ref[0, :, 12:13]
        tmax = rays_ref[0, :, 13:14]
        live = tmax > tmin

        def start_round(r, s):
            for j in range(CH):
                cid = corder_ref[0, 0, r * CH + j]
                pltpu.make_async_copy(
                    packed_ref.at[cid],
                    scratch.at[s, slice(None), pl.ds(j * kb, kb)],
                    sems.at[s, j]).start()

        def wait_round(s):
            for j in range(CH):
                pltpu.make_async_copy(
                    packed_ref.at[0],
                    scratch.at[s, slice(None), pl.ds(j * kb, kb)],
                    sems.at[s, j]).wait()

        @pl.when(n_rounds > 0)
        def _():
            start_round(0, 0)

        def body(r, carry):
            occ, done = carry
            cur = r % 2

            @pl.when(r + 1 < n_rounds)
            def _():
                start_round(r + 1, 1 - cur)
            wait_round(cur)

            def compute(occ):
                W = _dot(L, scratch[cur])
                for j in range(CH):
                    t = _cluster_blocks(W, j, k, tmin, tmax)
                    # occ carried as i32: Mosaic can't legalize (TILE,1)
                    # i1 vectors as fori_loop carries.
                    occ = occ | jnp.any(t < INF, axis=1,
                                        keepdims=True).astype(jnp.int32)
                return occ

            occ = jax.lax.cond(done, lambda o: o, compute, occ)
            done = jnp.all((occ != 0) | ~live)
            return occ, done

        init = (jnp.zeros((tile, 1), jnp.int32), jnp.zeros((), jnp.bool_))
        occ, _ = jax.lax.fori_loop(0, n_rounds, body, init)
        occ_out[0, :, :] = occ

    return kernel


def _common_specs(nt, tile, kb, cpad, n_out):
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
    """Closest hit. packed_mxu (C, 16, 5K) f32, rays (nt, TILE, 16) f32,
    corder (nt, CPAD) i32 / tnear (nt, CPAD) f32 (CPAD a CH multiple,
    ascending entry t), counts (nt,) i32 →
    (t_best (nt, TILE) f32, slot (nt, TILE) i32, slot = rank·K+lane)."""
    nt, tile, _ = rays.shape
    c, nf, kb5 = packed_mxu.shape
    k = kb5 // 5
    cpad = corder.shape[1]
    in_specs, out_specs = _common_specs(nt, tile, kb5, cpad, 2)
    t_b, slot = pl.pallas_call(
        _make_closest_kernel(tile, k),
        grid=(nt,), in_specs=in_specs, out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((nt, tile, 1), jnp.float32),
                   jax.ShapeDtypeStruct((nt, tile, 1), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((2, 16, CH * kb5), jnp.float32),
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
    c, nf, kb5 = packed_mxu.shape
    k = kb5 // 5
    cpad = corder.shape[1]
    in_specs, out_specs = _common_specs(nt, tile, kb5, cpad, 1)
    occ = pl.pallas_call(
        _make_anyhit_kernel(tile, k),
        grid=(nt,), in_specs=in_specs, out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((nt, tile, 1), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((2, 16, CH * kb5), jnp.float32),
            pltpu.SemaphoreType.DMA((2, CH)),
        ],
        interpret=interpret,
    )(counts[:, None, None].astype(jnp.int32), corder[:, None, :],
      tnear[:, None, :], rays, packed_mxu)[0]
    return occ[:, :, 0] != 0
