"""Pallas TPU kernels for tile×cluster ray traversal.

Four design decisions carry all the performance here:

1. **Per-tile trip counts.** The jnp tracer (geom/cluster.py) runs all
   tiles in lock-step: every round sweeps (tiles × TILE × CH·K) lanes
   and the loop runs until the WORST tile's cluster list is exhausted.
   Here the pallas grid is one program per ray tile and each tile runs
   `ceil(own_coverage / CH)` rounds (coverage via scalar prefetch), with
   double-buffered HBM→VMEM DMA of the cluster feature blocks and an
   ordered-entry-t pruning test that stops a tile as soon as the next
   cluster's entry t exceeds every lane's best hit — the wavefront
   analog of near-child-first BVH descent (bvh.rs:840-874 semantics).

2. **Every hot test is a matmul.** The scalarised Plücker test
   (w_i = d·U_i + m·V_i, t = (k − n·o)/(n·d)) is linear in the ray, so
   for a whole round of CH clusters it is ONE f32-faithful matmul on the
   MXU: L(16,TILE) vs F(16, 5·CH·K) contracted over the 16 feature rows,
   with ray columns L = [d m 0 0 o 1 tmin tmax 0 0]ᵀ. The slab test of
   the coverage pass is ALSO linear in (inv_d, −o·inv_d), so the whole
   per-lane tile→cluster coverage is one K=6 matmul against a
   precomputed (6, 6·CPAD) bounds-feature table. Only sign tests, one
   division and the reductions stay on the VPU.

3. **Split-float contraction stacking.** f32-faithful MXU products come
   from the bf16 hi/lo split; the three product terms stack along the
   contraction axis ([Lhi|Llo|Lhi] vs [Fhi;Fhi;Flo]) into a SINGLE
   matmul (the MXU pads K to its native 128 either way) — measured 3×
   less MXU time than three separate passes, same results.

4. **TILE-minor layout, zero relayout.** Every vector intermediate
   keeps the ray lane as the minor (lane) axis: the sorted ray
   components arrive as EIGHT separate (nt, 1, TILE) planes (pure
   reshapes of the sort output — no stack, no relayout), the L feature
   matrix (incl. the Plücker moment m = o×d) is assembled in-kernel
   from (1, TILE) rows, matmul results are (planes, TILE), reductions
   run across sublanes, and outputs leave as (nt, w, TILE). Nothing in
   the pipeline materialises a minor-dim-16 array.

Layout contract (produced by geom/cluster.py):
  packed_mxu (C, 16, 5, K) f32  MXU feature blocks; K=128 lanes
  planes     8×(nt, 1, TILE) f32 sorted ox oy oz dx dy dz tmin tmax
  cov_mxu    (6, 6·CPAD) f32   slab-plane features (build_clusters)
  corder     (nt, CPAD) i32   per-tile cluster ids, ascending entry t
  tnear      (nt, CPAD) f32   matching entry t (INF past the coverage)
  counts     (nt,)      i32   covered clusters per tile
outputs:
  coverage: tnear  (nt, CPAD) f32 entry t per (tile, cluster), INF if
            the tile misses the cluster
  closest:  t      (nt, TILE) f32 exact plane t (t_max where missed),
            slot   (nt, TILE) i32 global slot = cluster_rank·K + lane
            (cluster_rank indexes corder), -1 where missed,
            bary   (nt, 2, TILE) f32 (b1, b2) Plücker barycentrics
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

CH = int(os.environ.get("PBRT_TPU_CH", 8))   # clusters fetched per round
TPB = int(os.environ.get("PBRT_TPU_TPB", 8))  # ray tiles per grid step —
# the pallas grid-step overhead is ~3.2us regardless of work (measured,
# profile_overhead.py), so each program processes TPB tiles sequentially
SLOT_MASK = 2047
_EPS = 1e-12
# clusters per coverage grid step (VMEM bound: the kernel materialises
# (COV_CBLK, TILE) intermediates)
COV_CBLK = int(os.environ.get("PBRT_TPU_COV_CBLK", 768))

# Lane compaction (round 5): tile-union coverage tests ~30x more
# (ray, cluster) pairs than rays individually need (profile_coverage.py),
# and the kernel bound is the MXU output stream — so per round, pack the
# lanes that actually enter this round's clusters into 128-column blocks
# with one-hot MXU permutation matmuls and stream 5·CH·K × 128·blocks
# instead of 5·CH·K × TILE. rank = mask @ strict-upper-tri-ones;
# select = (iota == rank); compact/expand are exact one-hot _sel_dot
# matmuls.
LC = os.environ.get("PBRT_TPU_LC", "1") != "0"
LC_NB = int(os.environ.get("PBRT_TPU_LC_NB", 128))  # compacted block width



def _split3(A):
    """Exact 3-way bf16 split: a1 + a2 + a3 == A for every f32 (8+8+8
    mantissa bits cover f32's 24)."""
    a1 = A.astype(jnp.bfloat16)
    r1 = A - a1.astype(jnp.float32)
    a2 = r1.astype(jnp.bfloat16)
    a3 = (r1 - a2.astype(jnp.float32)).astype(jnp.bfloat16)
    return a1, a2, a3


def _sel_dot(A, Q, transpose_q):
    """EXACT f32 one-hot select matmul: A f32, Q a 0/1 selection matrix
    with at most one 1 per output element. Splitting A exactly into
    three bf16 planes makes every partial product exact, and each output
    sums exactly one selected product per plane — so the f32 result is
    bit-exact regardless of the MXU's bf16 passes (no reliance on
    Precision.HIGHEST, which Mosaic may lower to a single pass).
    transpose_q: contract A dim1 with Q dim1 (compaction, Q (NB, K))
    instead of Q dim0 (expansion, Q (K, n))."""
    m = A.shape[0]
    a1, a2, a3 = _split3(A)
    A3 = jnp.concatenate([a1, a2, a3], axis=0)
    dims = (((1,), (1,)), ((), ())) if transpose_q else (((1,), (0,)), ((), ()))
    W = jax.lax.dot_general(A3, Q.astype(jnp.bfloat16), dims,
                            preferred_element_type=jnp.float32)
    return W[0:m] + W[m:2 * m] + W[2 * m:3 * m]


def _same_sign(w0, w1, w2):
    """Plücker volume sign-consistency via pairwise products — 8 VPU ops
    vs 11 for the six-comparison form, identical truth table (zeros
    count as matching either sign; the all-zero degenerate-padding case
    is filtered by the |n·d| test)."""
    return (w0 * w1 >= 0) & (w1 * w2 >= 0) & (w0 * w2 >= 0)


def _hit_mask(w0, w1, w2, nd):
    """Sign-consistency + orientation in 6 VPU ops: a ray pierces the
    triangle iff every signed volume w_i carries nd's sign (either
    orientation), i.e. min_i(w_i·nd) >= 0. Zeros (edge grazes) count as
    hits like _same_sign; the nd == 0 degenerate/parallel case passes
    here but dies at the t-window test (t becomes ±inf/NaN)."""
    return jnp.minimum(jnp.minimum(w0 * nd, w1 * nd), w2 * nd) >= 0.0


def _recip(x, approx):
    """Reciprocal — approximate (fast VPU op) on real TPU, exact in
    interpret mode and wherever exactness is required."""
    if approx:
        return pl.reciprocal(x, approx=True)
    return 1.0 / x

# MXU precision for the Plücker/slab matmuls. "highest" = 6 bf16 passes
# (exact f32); "bf16x3" = 3-pass split-float (hi/lo bf16, dropping only
# the lo·lo term ~2^-16 relative — f32-faithful products, validated
# against brute force on real scenes); "bf16x3f" (default) = the SAME
# three products fused into ONE matmul by stacking the splits along the
# contraction axis (decision 3 above). "default" (1 bf16 pass) flips
# sign tests on near-edge hits — only for experiments.
PRECISION = os.environ.get("PBRT_TPU_MXU_PRECISION", "bf16x3f")


def _dot_tn(A, B, precision):
    """(ka, m) x (kb, n) contracted over dim 0 → (m, n). (Mosaic
    requires a 32-bit accumulator; a bf16 output to halve the MXU
    output streaming — the measured kernel bound — is rejected by the
    tpu.matmul verifier.)"""
    return jax.lax.dot_general(A, B, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(F, L):
    """f32-faithful (K, m) x (K, n) → (m, n) per PRECISION."""
    if PRECISION == "highest":
        return _dot_tn(F, L, jax.lax.Precision.HIGHEST)
    if PRECISION == "default":
        return _dot_tn(F, L, jax.lax.Precision.DEFAULT)
    fhi, flo = _split_bf16(F)
    lhi, llo = _split_bf16(L)
    d = jax.lax.Precision.DEFAULT
    if PRECISION == "bf16x3":
        return (_dot_tn(fhi, lhi, d) + _dot_tn(flo, lhi, d)
                + _dot_tn(fhi, llo, d))
    # bf16x3f: one 3K-contraction pass
    F3 = jnp.concatenate([fhi, flo, fhi], axis=0)
    L3 = jnp.concatenate([lhi, lhi, llo], axis=0)
    return _dot_tn(F3, L3, d)


def _round_planes(L_T, scratch_round, k):
    """MXU pass for one round. L_T (16, TILE); scratch_round
    (16, 5, CH, K) block-major features → five (CHK, TILE) planes."""
    chk = scratch_round.shape[2] * scratch_round.shape[3]
    W = _dot(scratch_round.reshape(16, 5 * chk), L_T)   # (5·CHK, TILE)
    w0 = W[0 * chk:1 * chk, :]
    w1 = W[1 * chk:2 * chk, :]
    w2 = W[2 * chk:3 * chk, :]
    nd = W[3 * chk:4 * chk, :]
    tnum = W[4 * chk:5 * chk, :]
    return w0, w1, w2, nd, tnum


def _start_round(corder_ref, tt, packed_ref, scratch, sems, r, s):
    for j in range(CH):
        cid = corder_ref[tt, 0, r * CH + j]
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


# ------------------------------------------------------------- coverage

def _ray_rows(plane_refs, tt=0):
    """(o3, d3, tmin, tmax) rows of tile `tt` from the eight
    (TPB, 1, TILE) blocks. tmin/tmax are clamped finite: they ride in
    matmul columns whose feature rows are zero, and 0·inf = NaN would
    poison the row."""
    ox, oy, oz, dx, dy, dz, tmin, tmax = [r[tt] for r in plane_refs]
    big = 3e37
    o3 = jnp.concatenate([ox, oy, oz], axis=0)
    d3 = jnp.concatenate([dx, dy, dz], axis=0)
    return o3, d3, jnp.clip(tmin, -big, big), jnp.clip(tmax, -big, big)


def _assemble_L(plane_refs, tt=0):
    """The (16, TILE) Plücker L feature matrix, in-kernel."""
    o3, d3, tmin, tmax = _ray_rows(plane_refs, tt)
    ox, oy, oz = o3[0:1], o3[1:2], o3[2:3]
    dx, dy, dz = d3[0:1], d3[1:2], d3[2:3]
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx
    z = jnp.zeros_like(ox)
    one = jnp.ones_like(ox)
    return jnp.concatenate([d3, mx, my, mz, z, z, o3, one,
                            tmin, tmax, z, z], axis=0), tmin, tmax


def _make_coverage_kernel(tile, cblk):
    nb32 = cblk // 32

    def kernel(*refs):
        nlive_ref, plane_refs = refs[0], refs[1:9]
        cov_ref, tnear_out, covbits_out = refs[9], refs[10], refs[11]
        base = pl.program_id(0) * TPB
        for tt in range(TPB):

            @pl.when(base + tt < nlive_ref[0, 0, 0])
            def _():
                # the slab test as a K=6 matmul —
                # t_plane = b·inv_ax + 1·(−o_ax·inv_ax). The cluster
                # axis is BLOCKED (grid dim 1, cblk clusters per step)
                # so big scenes never materialise (CPAD, TILE) in VMEM.
                o3, d3, tmin, tmax = _ray_rows(plane_refs, tt)
                inv = 1.0 / jnp.where(jnp.abs(d3) < 1e-12,
                                      jnp.where(d3 < 0, -1e-12, 1e-12), d3)
                L_cov = jnp.concatenate([inv, -o3 * inv], axis=0)   # (6, TILE)
                W = _dot(cov_ref[...].reshape(6, 6 * cblk), L_cov)
                tn = jnp.broadcast_to(tmin, (cblk, tile))
                tf = jnp.broadcast_to(tmax, (cblk, tile))
                for ax in range(3):
                    lo = W[(2 * ax) * cblk:(2 * ax + 1) * cblk, :]
                    hi = W[(2 * ax + 1) * cblk:(2 * ax + 2) * cblk, :]
                    tn = jnp.maximum(tn, jnp.minimum(lo, hi))
                    tf = jnp.minimum(tf, jnp.maximum(lo, hi) * 1.0001)
                hit = tn <= tf                                  # (cblk, TILE)
                tnear = jnp.min(jnp.where(hit, tn, INF), axis=1, keepdims=True)
                tnear_out[tt, :, :] = tnear.reshape(1, cblk)
                # per-LANE coverage bitmask, packed over cluster ids
                # (bit c%32 of row c//32): drives the traversal kernel's
                # per-round lane compaction.
                h3 = hit.astype(jnp.int32).reshape(nb32, 32, tile)
                acc = jnp.zeros((nb32, tile), jnp.int32)
                for b in range(32):
                    acc = acc | (h3[:, b, :] << b)
                covbits_out[tt, :, :] = acc

            @pl.when(base + tt >= nlive_ref[0, 0, 0])
            def _():
                # dead tile (dead lanes sort to the suffix): no coverage
                tnear_out[tt, :, :] = jnp.full((1, cblk), INF, jnp.float32)
                covbits_out[tt, :, :] = jnp.zeros((nb32, tile), jnp.int32)

    return kernel


def _plane_specs(tile):
    return [pl.BlockSpec((TPB, 1, tile), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)] * 8


def _pad_tiles(nt):
    return -(-nt // TPB) * TPB


def coverage_tiles(planes, cov_mxu, n_clusters, n_live_tiles=None,
                   interpret=False):
    """Per-tile cluster coverage + entry t via one K=6 MXU pass per
    (tile, cluster-block) against VMEM-resident bounds features —
    replaces the XLA (nt·TILE·C) slab pass, which materialises hundreds
    of MB of HBM intermediates at wavefront sizes. Each grid step covers
    TPB tiles × COV_CBLK clusters (cluster blocking keeps VMEM bounded
    for 10k+-cluster scenes); tiles past `n_live_tiles` (dead lanes sort
    to the suffix) skip the matmul and write INF.

    planes: 8×(nt, 1, TILE) f32 with nt % TPB == 0; cov_mxu
    (6, 6, CPAD) f32; returns (tnear (nt, CPAD) f32 with INF where the
    tile does not enter the cluster (pad columns forced to INF),
    covbits (nt, CPAD/32, TILE) i32 per-lane coverage bitmasks)."""
    nt, _, tile = planes[0].shape
    assert nt % TPB == 0
    cpad = cov_mxu.shape[2]
    # largest 128-multiple block <= COV_CBLK that divides cpad (cpad is
    # always a 128 multiple, so 128 is a guaranteed fallback)
    cblk = 128
    for b in range(min(cpad, COV_CBLK), 127, -128):
        if cpad % b == 0:
            cblk = b
            break
    nb32 = cblk // 32
    if n_live_tiles is None:
        n_live_tiles = jnp.full((), nt, jnp.int32)
    tnear, covbits = pl.pallas_call(
        _make_coverage_kernel(tile, cblk),
        grid=(nt // TPB, cpad // cblk),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec((TPB, 1, tile), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)] * 8 + [
            pl.BlockSpec((6, 6, cblk), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((TPB, 1, cblk), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((TPB, nb32, tile), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nt, 1, cpad), jnp.float32),
                   jax.ShapeDtypeStruct((nt, cpad // 32, tile), jnp.int32)],
        interpret=interpret,
    )(n_live_tiles.astype(jnp.int32).reshape(1, 1, 1), *planes, cov_mxu)
    tnear = tnear[:, 0, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, cpad), 1)
    return jnp.where(col < n_clusters, tnear, INF), covbits


# ------------------------------------------------------------ traversal

def _make_closest_kernel(tile, k, approx=True):
    chk = CH * k

    def kernel(*refs):
        counts_ref, corder_ref, tnear_ref = refs[:3]
        plane_refs, ah_ref, packed_ref = refs[3:11], refs[11], refs[12]
        t_out, slot_out, bary_out, scratch, sems = refs[13:]
        cpad = tnear_ref.shape[2]
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (chk, 1), 0)

        def live_tile(tt, count, n_rounds):
            L_T, tmin, tmax = _assemble_L(plane_refs, tt)     # (16, TILE)
            # any-hit lanes (shadow rays fused into the closest-hit
            # launch): after their FIRST accepted hit their t_best drops
            # to -1, so (a) no further round can update them (t > tmin ≥
            # 0 > -1) and (b) they leave the tile's max-t_best pruning
            # bound — per-lane early-out without divergent control flow.
            anyhit = ah_ref[tt] > 0.0                          # (1, TILE)
            _start_round(corder_ref, tt, packed_ref, scratch, sems, 0, 0)

            def cond(carry):
                r, t_best, best_slot, tb12, done = carry
                return (r < n_rounds) & ~done

            def body(carry):
                r, t_best, best_slot, tb12, done = carry
                cur = r % 2

                @pl.when(r + 1 < n_rounds)
                def _():
                    _start_round(corder_ref, tt, packed_ref, scratch, sems,
                                 r + 1, 1 - cur)
                _wait_round(packed_ref, scratch, sems, cur)

                def compute(args):
                    t_best, best_slot, tb12 = args
                    w0, w1, w2, nd, tnum = _round_planes(L_T, scratch[cur], k)
                    # approximate reciprocal for the per-slot t (the
                    # winner's exact t is recovered by one true division
                    # in `extract`); nd == 0 → t = ±inf/NaN → no key.
                    t = tnum * _recip(nd, approx)
                    ok = _hit_mask(w0, w1, w2, nd) & (t > tmin)
                    # pack (t, slot) into one int key: a single min-reduce
                    # yields both the (slightly conservative) best t and
                    # the winning lane. t > tmin ≥ 0 keeps the f32 bit
                    # pattern order-preserving as int32; misses carry
                    # INT32_MAX. The t < t_best window check happens once
                    # on the (1, TILE) row (`upd`), not per slot: the
                    # round's min-t candidate is the only one that matters.
                    t_bits = jax.lax.bitcast_convert_type(t, jnp.int32)
                    key = jnp.where(ok, (t_bits & ~jnp.int32(SLOT_MASK)) | slot_iota,
                                    jnp.int32(0x7FFFFFFF))
                    kmin = jnp.min(key, axis=0, keepdims=True)   # (1, TILE)
                    tj = jax.lax.bitcast_convert_type(
                        kmin & ~jnp.int32(SLOT_MASK), jnp.float32)
                    upd = tj < t_best

                    def extract(tb12):
                        # one-hot extraction of the winner's exact t and
                        # Plücker volumes: the signed volumes ARE the
                        # barycentrics (w1 ↦ vertex p0, w2 ↦ p1, w0 ↦ p2),
                        # so no host-side Möller–Trumbore finalize pass
                        # (and none of its random vertex gathers) is
                        # needed. Only runs on rounds that improved a lane.
                        sel = key == kmin
                        selw = lambda a: jnp.sum(jnp.where(sel, a, 0.0),
                                                 axis=0, keepdims=True)
                        # exact plane t for the winner: one true division
                        # on the (1, TILE) row
                        s_nd = selw(nd)
                        s_t = selw(tnum) / jnp.where(jnp.abs(s_nd) > _EPS,
                                                     s_nd, _EPS)
                        s_w0 = selw(w0)
                        s_w1 = selw(w1)
                        s_w2 = selw(w2)
                        s_sum = s_w0 + s_w1 + s_w2
                        inv = 1.0 / jnp.where(jnp.abs(s_sum) > 1e-30, s_sum, 1e-30)
                        cand = jnp.concatenate([s_t, s_w2 * inv, s_w0 * inv],
                                               axis=0)
                        return jnp.where(upd, cand, tb12)

                    tb12 = jax.lax.cond(jnp.any(upd), extract, lambda x: x, tb12)
                    # GLOBAL tri slot = cluster_id·K + lane: map the
                    # winner's chunk index to its cluster id with CH
                    # scalar reads + selects — kills the slot→corder→
                    # c_tri_id gather chain on the XLA side.
                    s = kmin & jnp.int32(SLOT_MASK)
                    jwin = s // k
                    gcid = jnp.zeros_like(s)
                    for j in range(CH):
                        cid_j = corder_ref[tt, 0, r * CH + j]
                        gcid = jnp.where(jwin == j, cid_j, gcid)
                    gslot = gcid * k + (s % k)
                    best_slot = jnp.where(upd, gslot, best_slot)
                    t_best = jnp.where(upd, jnp.where(anyhit, -1.0, tj), t_best)
                    return t_best, best_slot, tb12

                t_best, best_slot, tb12 = compute((t_best, best_slot, tb12))
                # ordered-entry-t pruning: clusters arrive sorted by
                # entry t, so once the next round's nearest entry exceeds
                # every lane's best hit no later cluster can improve.
                nxt = jnp.minimum((r + 1) * CH, cpad - 1)
                done = tnear_ref[tt, 0, nxt] >= jnp.max(t_best)
                return r + 1, t_best, best_slot, tb12, done

            init = (jnp.zeros((), jnp.int32), tmax,
                    jnp.full((1, tile), -1, jnp.int32),
                    jnp.concatenate([tmax, jnp.zeros((2, tile), jnp.float32)],
                                    axis=0),
                    jnp.zeros((), jnp.bool_))
            r_end, t_best, best_slot, tb12, _ = jax.lax.while_loop(
                cond, body, init)

            # drain: an early exit leaves round r_end's DMA in flight
            @pl.when(r_end < n_rounds)
            def _():
                _wait_round(packed_ref, scratch, sems, r_end % 2)
            t_out[tt, :, :] = tb12[0:1, :]
            slot_out[tt, :, :] = best_slot
            bary_out[tt, :, :] = tb12[1:3, :]

        for tt in range(TPB):
            count = counts_ref[tt, 0, 0]
            n_rounds = (count + CH - 1) // CH

            # dead-tile fast path: zero-coverage tiles (all-dead lanes
            # sort to the wavefront suffix, and fully-missing tiles have
            # no covered clusters) skip L assembly and the whole loop —
            # only the default output writes run.
            @pl.when(n_rounds == 0)
            def _():
                t_out[tt, :, :] = plane_refs[7][tt]          # = tmax (miss)
                slot_out[tt, :, :] = jnp.full((1, tile), -1, jnp.int32)
                bary_out[tt, :, :] = jnp.zeros((2, tile), jnp.float32)

            @pl.when(n_rounds > 0)
            def _():
                live_tile(tt, count, n_rounds)

    return kernel


def _make_closest_kernel_lc(tile, k, approx=True):
    """Lane-compacted closest-hit kernel (round-5 redesign; see LC).

    Per (round, block) iteration of ONE flat while loop, the per-lane
    participation mask (coverage bit of any of the round's clusters AND
    entry t not past the lane's best hit) is ranked with a one-hot MXU
    matmul and the masked lanes are packed into an LC_NB-column block;
    the Plücker MXU pass runs on the compacted block only. Rounds whose
    masks fit one block pay ONE 5·CH·K × 128 stream instead of
    5·CH·K × TILE — the measured kernel bound — and extra blocks only
    run when >NB lanes participate (the loop simply revisits the round
    with b+1). The body is straight-line (no nested cond/fori around the
    matmul): nested block control flow mis-lowers on Mosaic — two
    different dump builds of the same math returned contradictory
    values in-kernel — while this flat shape matches the proven
    full-tile kernel."""
    chk = CH * k

    def kernel(*refs):
        counts_ref, corder_ref, tnear_ref = refs[:3]
        plane_refs = refs[3:11]
        ah_ref, cb_ref, packed_ref = refs[11], refs[12], refs[13]
        t_out, slot_out, bary_out, scratch, sems = refs[14:]
        cpad = tnear_ref.shape[2]
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (chk, 1), 0)
        # strict upper-triangular ones: rank[j] = #masked lanes before j
        i0 = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        i1 = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        UT = (i0 < i1).astype(jnp.float32)
        blk_iota = jax.lax.broadcasted_iota(jnp.int32, (LC_NB, tile), 0)

        def live_tile(tt, count, n_rounds):
            L_T, tmin, tmax = _assemble_L(plane_refs, tt)     # (16, TILE)
            anyhit = ah_ref[tt] > 0.0                          # (1, TILE)
            _start_round(corder_ref, tt, packed_ref, scratch, sems, 0, 0)

            def cond(carry):
                r, b, t_best, best_slot, tb12, mask_carry, done = carry
                return (r < n_rounds) & ~done

            def body(carry):
                r, b, t_best, best_slot, tb12, mask_carry, done = carry
                cur = r % 2

                @pl.when(b == 0)
                def _():
                    # entering round r: prefetch r+1, wait for r
                    @pl.when(r + 1 < n_rounds)
                    def _():
                        _start_round(corder_ref, tt, packed_ref, scratch,
                                     sems, r + 1, 1 - cur)
                    _wait_round(packed_ref, scratch, sems, cur)

                # --- per-lane round mask: lane enters one of this
                # round's clusters (coverage bit) AND that cluster's
                # tile entry t could still beat the lane's best hit.
                # Any-hit lanes that found a hit carry t_best = -1 <
                # every entry t — they drop out of all later masks.
                # FROZEN at b == 0 for the whole round: a shadow lane
                # occluded in an earlier block would otherwise renumber
                # the ranks and skip lanes whose rank slides below the
                # block window. (Extension lanes cannot drop mid-round —
                # a new hit's t is >= the round's sorted entry t — so
                # the freeze only matters for any-hit lanes.)
                fresh = jnp.zeros((1, tile), jnp.bool_)
                cids = []
                for j in range(CH):
                    cid = corder_ref[tt, 0, r * CH + j]
                    cids.append(cid)
                    row = cb_ref[tt, pl.ds(cid // 32, 1), :]   # (1, TILE)
                    bitj = ((row >> (cid % 32)) & 1) != 0
                    tn_j = tnear_ref[tt, 0, r * CH + j]
                    fresh = fresh | (bitj & (t_best >= tn_j))
                # (select in i32 — Mosaic cannot legalize i1 selects)
                mask_i = jnp.where(b == 0, fresh.astype(jnp.int32), mask_carry)
                mask = mask_i != 0
                maskf = mask.astype(jnp.float32)
                # rank = #masked lanes before j; 0/1 products are exact
                # in bf16 and the f32 accumulator sums them exactly
                # (a VPU cumsum would shorten the serial chain, but
                # Pallas TPU has no cumsum lowering — the matmul stays)
                rank_i = jax.lax.dot_general(
                    maskf, UT, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
                ltot = jnp.sum(maskf).astype(jnp.int32)

                # --- block b of this round (straight-line compute; an
                # empty Q self-neutralises: nd = 0 → no key → no update)
                sel = (blk_iota == (rank_i - LC_NB * b)) & mask
                Q = sel.astype(jnp.float32)                   # (NB, TILE)
                # compact rays + per-lane windows (exact f32: each
                # output column is one selected product)
                aux = jnp.concatenate([L_T, tmin, t_best], axis=0)
                aux_c = _sel_dot(aux, Q, transpose_q=True)    # (18, NB)
                Lc = aux_c[0:16]
                tmin_c = aux_c[16:17]
                tbest_c = aux_c[17:18]
                w0, w1, w2, nd, tnum = _round_planes(Lc, scratch[cur], k)
                t = tnum * _recip(nd, approx)
                ok = _hit_mask(w0, w1, w2, nd) & (t > tmin_c)
                t_bits = jax.lax.bitcast_convert_type(t, jnp.int32)
                key = jnp.where(ok,
                                (t_bits & ~jnp.int32(SLOT_MASK)) | slot_iota,
                                jnp.int32(0x7FFFFFFF))
                kmin = jnp.min(key, axis=0, keepdims=True)    # (1, NB)
                tj = jax.lax.bitcast_convert_type(
                    kmin & ~jnp.int32(SLOT_MASK), jnp.float32)
                upd_c = tj < tbest_c

                # extraction (compacted domain) + expansion to lanes
                selk = key == kmin
                selw = lambda a: jnp.sum(jnp.where(selk, a, 0.0),
                                         axis=0, keepdims=True)
                s_nd = selw(nd)
                s_t = selw(tnum) / jnp.where(jnp.abs(s_nd) > _EPS, s_nd, _EPS)
                s_w0 = selw(w0)
                s_w1 = selw(w1)
                s_w2 = selw(w2)
                s_sum = s_w0 + s_w1 + s_w2
                inv = 1.0 / jnp.where(jnp.abs(s_sum) > 1e-30, s_sum, 1e-30)
                # winner's global tri slot = cluster_id·K + lane
                sw = kmin & jnp.int32(SLOT_MASK)
                jwin = sw // k
                gcid = jnp.zeros_like(sw)
                for j in range(CH):
                    gcid = jnp.where(jwin == j, cids[j], gcid)
                gslot = gcid * k + (sw % k)
                updf = upd_c.astype(jnp.float32)
                # expand (exact f32 one-hot matmul); gslot < C·K < 2^24
                # is exact as f32; ×updf zeroes non-winning columns so
                # NaN/garbage in missed columns never leaves the block
                rows = jnp.concatenate(
                    [updf, jnp.where(upd_c, s_t, 0.0),
                     jnp.where(upd_c, s_w2 * inv, 0.0),
                     jnp.where(upd_c, s_w0 * inv, 0.0),
                     jnp.where(upd_c, tj, 0.0),
                     gslot.astype(jnp.float32) * updf], axis=0)
                exp = _sel_dot(rows, Q, transpose_q=False)    # (6, TILE)
                upd = exp[0:1] > 0.5
                tb12 = jnp.where(upd, exp[1:4], tb12)
                best_slot = jnp.where(
                    upd, (exp[5:6] + 0.5).astype(jnp.int32), best_slot)
                t_best = jnp.where(upd, jnp.where(anyhit, -1.0, exp[4:5]),
                                   t_best)

                # --- advance (r, b): revisit the round while more
                # blocks of masked lanes remain, else next round with
                # the ordered-entry-t pruning check
                more = (b + 1) * LC_NB < ltot
                r_next = jnp.where(more, r, r + 1)
                b_next = jnp.where(more, b + 1, 0)
                nxt = jnp.minimum(jnp.maximum(r_next * CH, 0), cpad - 1)
                done = ~more & (tnear_ref[tt, 0, nxt] >= jnp.max(t_best))
                return (r_next, b_next, t_best, best_slot, tb12,
                        mask_i, done)

            init = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32), tmax,
                    jnp.full((1, tile), -1, jnp.int32),
                    jnp.concatenate([tmax, jnp.zeros((2, tile), jnp.float32)],
                                    axis=0),
                    jnp.zeros((1, tile), jnp.int32),
                    jnp.zeros((), jnp.bool_))
            r_end, _, t_best, best_slot, tb12, _, _ = jax.lax.while_loop(
                cond, body, init)

            # drain: an early exit leaves round r_end's DMA in flight
            @pl.when(r_end < n_rounds)
            def _():
                _wait_round(packed_ref, scratch, sems, r_end % 2)
            t_out[tt, :, :] = tb12[0:1, :]
            slot_out[tt, :, :] = best_slot
            bary_out[tt, :, :] = tb12[1:3, :]

        for tt in range(TPB):
            count = counts_ref[tt, 0, 0]
            n_rounds = (count + CH - 1) // CH

            @pl.when(n_rounds == 0)
            def _():
                t_out[tt, :, :] = plane_refs[7][tt]          # = tmax (miss)
                slot_out[tt, :, :] = jnp.full((1, tile), -1, jnp.int32)
                bary_out[tt, :, :] = jnp.zeros((2, tile), jnp.float32)

            @pl.when(n_rounds > 0)
            def _():
                live_tile(tt, count, n_rounds)

    return kernel

def _make_anyhit_kernel_lc(tile, k, approx=True):
    """Lane-compacted any-hit kernel (same flat (round, block) while
    shape as _make_closest_kernel_lc): per round only lanes that cover
    one of the round's clusters AND are not yet occluded are packed
    into LC_NB-column blocks. Shadow wavefronts stream 128 columns per
    round instead of TILE."""
    chk = CH * k

    def kernel(*refs):
        counts_ref, corder_ref, tnear_ref = refs[:3]
        plane_refs, cb_ref, packed_ref = refs[3:11], refs[11], refs[12]
        occ_out, scratch, sems = refs[13:]
        i0 = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        i1 = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        UT = (i0 < i1).astype(jnp.float32)
        blk_iota = jax.lax.broadcasted_iota(jnp.int32, (LC_NB, tile), 0)

        def live_tile(tt, count, n_rounds):
            L_T, tmin, tmax = _assemble_L(plane_refs, tt)
            live = tmax > tmin
            _start_round(corder_ref, tt, packed_ref, scratch, sems, 0, 0)

            def cond(carry):
                r, b, occ, mask_carry, done = carry
                return (r < n_rounds) & ~done

            def body(carry):
                r, b, occ, mask_carry, done = carry
                cur = r % 2

                @pl.when(b == 0)
                def _():
                    @pl.when(r + 1 < n_rounds)
                    def _():
                        _start_round(corder_ref, tt, packed_ref, scratch,
                                     sems, r + 1, 1 - cur)
                    _wait_round(packed_ref, scratch, sems, cur)

                # mask: covers one of this round's clusters, still live,
                # not yet occluded. FROZEN at b == 0 for the whole round:
                # recomputing it per block would let lanes occluded in an
                # earlier block renumber the ranks, skipping lanes whose
                # rank slides below the block window (measured 10% missed
                # occlusions before the freeze).
                fresh = jnp.zeros((1, tile), jnp.bool_)
                for j in range(CH):
                    cid = corder_ref[tt, 0, r * CH + j]
                    row = cb_ref[tt, pl.ds(cid // 32, 1), :]
                    fresh = fresh | (((row >> (cid % 32)) & 1) != 0)
                fresh = fresh & live & (occ == 0)
                # (select in i32 — Mosaic cannot legalize i1 selects)
                mask_i = jnp.where(b == 0, fresh.astype(jnp.int32), mask_carry)
                mask = mask_i != 0
                maskf = mask.astype(jnp.float32)
                rank_i = jax.lax.dot_general(
                    maskf, UT, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
                ltot = jnp.sum(maskf).astype(jnp.int32)

                sel = (blk_iota == (rank_i - LC_NB * b)) & mask
                Q = sel.astype(jnp.float32)
                aux = jnp.concatenate([L_T, tmin, tmax], axis=0)
                aux_c = _sel_dot(aux, Q, transpose_q=True)    # (18, NB)
                Lc = aux_c[0:16]
                tmin_c = aux_c[16:17]
                tmax_c = aux_c[17:18]
                w0, w1, w2, nd, tnum = _round_planes(Lc, scratch[cur], k)
                t = tnum * _recip(nd, approx)
                ok = _hit_mask(w0, w1, w2, nd) & (t > tmin_c) & (t < tmax_c)
                occ_c = jnp.any(ok, axis=0, keepdims=True).astype(jnp.float32)
                exp = _sel_dot(occ_c, Q, transpose_q=False)   # (1, tile)
                occ = occ | (exp > 0.5).astype(jnp.int32)

                more = (b + 1) * LC_NB < ltot
                r_next = jnp.where(more, r, r + 1)
                b_next = jnp.where(more, b + 1, 0)
                done = ~more & jnp.all((occ != 0) | ~live)
                return r_next, b_next, occ, mask_i, done

            init = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                    jnp.zeros((1, tile), jnp.int32),
                    jnp.zeros((1, tile), jnp.int32), jnp.zeros((), jnp.bool_))
            r_end, _, occ, _, _ = jax.lax.while_loop(cond, body, init)

            @pl.when(r_end < n_rounds)
            def _():
                _wait_round(packed_ref, scratch, sems, r_end % 2)
            occ_out[tt, :, :] = occ

        for tt in range(TPB):
            count = counts_ref[tt, 0, 0]
            n_rounds = (count + CH - 1) // CH

            @pl.when(n_rounds == 0)
            def _():
                occ_out[tt, :, :] = jnp.zeros((1, tile), jnp.int32)

            @pl.when(n_rounds > 0)
            def _():
                live_tile(tt, count, n_rounds)

    return kernel


def _make_anyhit_kernel(tile, k, approx=True):
    def kernel(*refs):
        counts_ref, corder_ref, tnear_ref = refs[:3]
        plane_refs, packed_ref = refs[3:11], refs[11]
        occ_out, scratch, sems = refs[12:]

        def live_tile(tt, count, n_rounds):
            L_T, tmin, tmax = _assemble_L(plane_refs, tt)
            live = tmax > tmin
            _start_round(corder_ref, tt, packed_ref, scratch, sems, 0, 0)

            def cond(carry):
                r, occ, done = carry
                return (r < n_rounds) & ~done

            def body(carry):
                r, occ, done = carry
                cur = r % 2

                @pl.when(r + 1 < n_rounds)
                def _():
                    _start_round(corder_ref, tt, packed_ref, scratch, sems,
                                 r + 1, 1 - cur)
                _wait_round(packed_ref, scratch, sems, cur)

                w0, w1, w2, nd, tnum = _round_planes(L_T, scratch[cur], k)
                t = tnum * _recip(nd, approx)
                ok = _hit_mask(w0, w1, w2, nd) & (t > tmin) & (t < tmax)
                # occ carried as i32: Mosaic can't legalize (1, TILE)
                # i1 vectors as while_loop carries.
                occ = occ | jnp.any(ok, axis=0, keepdims=True).astype(jnp.int32)
                done = jnp.all((occ != 0) | ~live)
                return r + 1, occ, done

            init = (jnp.zeros((), jnp.int32), jnp.zeros((1, tile), jnp.int32),
                    jnp.zeros((), jnp.bool_))
            r_end, occ, _ = jax.lax.while_loop(cond, body, init)

            @pl.when(r_end < n_rounds)
            def _():
                _wait_round(packed_ref, scratch, sems, r_end % 2)
            occ_out[tt, :, :] = occ

        for tt in range(TPB):
            count = counts_ref[tt, 0, 0]
            n_rounds = (count + CH - 1) // CH

            @pl.when(n_rounds == 0)
            def _():
                occ_out[tt, :, :] = jnp.zeros((1, tile), jnp.int32)

            @pl.when(n_rounds > 0)
            def _():
                live_tile(tt, count, n_rounds)

    return kernel


def _common_specs(nt, tile, cpad, out_widths, extra_planes=0, nb32=0):
    """(in_specs, out_specs) for the traversal kernels. Each grid step
    covers TPB tiles (the ~3.2µs per-step overhead dominates small
    tiles — profile_overhead.py). counts/corder/tnear ride as per-step
    SMEM blocks (scalar reads drive the DMA engine). `extra_planes`
    appends further (nt, 1, TILE) VMEM planes (e.g. the anyhit flag)
    between the ray planes and the trailing ANY ref; `nb32` > 0 appends
    the (nt, nb32, TILE) i32 coverage-bitmask block after those,
    keeping the spec list and the kernel's ref unpacking defined in one
    place."""
    in_specs = [
        pl.BlockSpec((TPB, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((TPB, 1, cpad), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((TPB, 1, cpad), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
    ] + _plane_specs(tile) + _plane_specs(tile)[:1] * extra_planes + ([
        pl.BlockSpec((TPB, nb32, tile), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)] if nb32 else []) + [
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    out_specs = [
        pl.BlockSpec((TPB, w, tile), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for w in out_widths
    ]
    return in_specs, out_specs


def traverse_tiles(packed_mxu, planes, corder, tnear, counts, anyhit=None,
                   covbits=None, interpret=False):
    """Closest hit. packed_mxu (C, 16, 5, K) f32, planes 8×(nt, 1, TILE)
    f32 (nt % TPB == 0), corder (nt, CPAD) i32 / tnear (nt, CPAD) f32
    (CPAD a CH multiple, ascending entry t), counts (nt,) i32 →
    (t (nt, TILE) f32 exact plane t, slot (nt, TILE) i32 = GLOBAL tri
    slot cluster_id·K + lane (-1 where missed), bary (nt, 2, TILE) f32).

    `anyhit` (nt, 1, TILE) f32 (optional): lanes with anyhit > 0 run in
    shadow-ray mode — they stop constraining the tile after their first
    accepted hit (occluded ⟺ slot ≥ 0); their t/bary outputs are
    meaningless. Fusing shadow and extension rays into ONE launch halves
    the per-bounce sort/coverage/launch overhead and lets mixed-coherence
    wavefronts share tiles."""
    nt, _, tile = planes[0].shape
    c, nf, nb, k = packed_mxu.shape
    assert CH * k <= SLOT_MASK + 1, "slot index must fit the packed key"
    assert nt % TPB == 0
    if anyhit is None:
        anyhit = jnp.zeros((nt, 1, tile), jnp.float32)
    cpad = corder.shape[1]
    use_lc = LC and covbits is not None
    if use_lc:
        nb32 = covbits.shape[1]
        kern = _make_closest_kernel_lc(tile, k, approx=not interpret)
        extra = (covbits,)
    else:
        nb32 = 0
        kern = _make_closest_kernel(tile, k, approx=not interpret)
        extra = ()
    in_specs, out_specs = _common_specs(nt, tile, cpad, (1, 1, 2),
                                        extra_planes=1, nb32=nb32)
    t_b, slot, bary = pl.pallas_call(
        kern,
        grid=(nt // TPB,), in_specs=in_specs, out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((nt, 1, tile), jnp.float32),
                   jax.ShapeDtypeStruct((nt, 1, tile), jnp.int32),
                   jax.ShapeDtypeStruct((nt, 2, tile), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((2, 16, 5, CH, k), jnp.float32),
            pltpu.SemaphoreType.DMA((2, CH)),
        ],
        interpret=interpret,
    )(counts[:, None, None].astype(jnp.int32), corder[:, None, :],
      tnear[:, None, :], *planes, anyhit, *extra, packed_mxu)
    return t_b[:, 0, :], slot[:, 0, :], bary


def occluded_tiles(packed_mxu, planes, corder, tnear, counts, covbits=None,
                   interpret=False):
    """Any hit (shadow rays). Same layout contract as traverse_tiles →
    occ (nt, TILE) bool. With covbits (and LC on), shadow wavefronts run
    the lane-compacted kernel — the standalone any-hit path feeds
    volpath's medium NEE, BDPT connections, SPPM visibility."""
    nt, _, tile = planes[0].shape
    c, nf, nb, k = packed_mxu.shape
    assert nt % TPB == 0
    cpad = corder.shape[1]
    use_lc = LC and covbits is not None
    if use_lc:
        nb32 = covbits.shape[1]
        kern = _make_anyhit_kernel_lc(tile, k, approx=not interpret)
        extra = (covbits,)
    else:
        nb32 = 0
        kern = _make_anyhit_kernel(tile, k, approx=not interpret)
        extra = ()
    in_specs, out_specs = _common_specs(nt, tile, cpad, (1,), nb32=nb32)
    occ = pl.pallas_call(
        kern,
        grid=(nt // TPB,), in_specs=in_specs, out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((nt, 1, tile), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((2, 16, 5, CH, k), jnp.float32),
            pltpu.SemaphoreType.DMA((2, CH)),
        ],
        interpret=interpret,
    )(counts[:, None, None].astype(jnp.int32), corder[:, None, :],
      tnear[:, None, :], *planes, *extra, packed_mxu)[0]
    return occ[:, 0, :] != 0
