"""Tile×cluster tracer — the TPU-native acceleration structure.

This replaces pointer-chasing BVH traversal (src/accelerators/bvh.rs:
828-932) with a formulation built around the TPU's strengths (dense VPU
math, fast sorts, contiguous block fetches) and its weakness (per-lane
divergent gathers):

  1. triangles are reordered by the SAH builder's depth-first prim order
     (geom/bvh.py / native C++ builder) and grouped into fixed-size
     spatially-coherent *clusters*; cluster AABBs play the role of BVH
     nodes,
  2. rays are sorted by a (direction-octant, origin-Morton) key into
     *tiles* of TR rays — the wavefront analog of the reference's
     coherent 16×16 image tiles (parallel.rs),
  3. a dense (tile, cluster) slab pass finds which clusters any ray of
     the tile enters, and at what entry t,
  4. per tile, clusters are processed in ascending-entry-t order in
     chunks; each round fetches CH whole clusters (a streaming block
     fetch) and runs a dense ray-triangle pass on the VPU,
  5. rounds stop when every unprocessed cluster's entry t exceeds every
     lane's current best hit — the ordered-traversal pruning of a BVH's
     near-child-first descent.

The inner test is *scalarised Plücker*: per triangle we precompute the
three edge line-coordinates (U=a×b, V=b−a), the normal and plane offset;
a ray (d, m=o×d) hits iff the three signed volumes wᵢ = d·Uᵢ + m·Vᵢ
share a sign, with t from the plane equation. All arithmetic runs on
(tiles, TR, CH·K) scalar planes — no trailing-3 axes, which XLA:TPU
tiles ~8× better than vector broadcasts. Barycentrics are recovered
after the loop by one Möller–Trumbore evaluation of each ray's winning
triangle, keeping results bit-consistent with the brute-force reference.
"""
from __future__ import annotations

from typing import NamedTuple

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Float, Int, INF
from . import triangle as trimod

# rays per tile: 512 measured best on v5e with the lane-compacted kernel
# (fixed per-tile costs amortise over more rays while compaction keeps the
# streamed matmul at 128 columns; 1024 exceeds the 16M scoped-VMEM limit)
TILE = int(os.environ.get("PBRT_TPU_TILE", 1024))
_SLOT_BITS = 11      # low mantissa bits of t reused for the slot index

# tri-state override for the pallas kernel path: None = auto (use the
# pallas per-tile kernel on TPU, the jnp lock-step tracer elsewhere).
USE_PALLAS = None


def pallas_enabled(cs) -> bool:
    if USE_PALLAS is not None:
        return bool(USE_PALLAS)
    return jax.default_backend() == "tpu" and cs.cluster_size == 128


def _chunk_clusters(k):
    """Clusters fetched per jnp-tracer round; chunk·k slots must fit in
    the _SLOT_BITS low mantissa bits of the packed t|slot key."""
    return max(1, (1 << _SLOT_BITS) // k)
# packed per-tri feature layout (C, NF, K) (+2 zero pad rows → 24 for
# TPU sublane alignment in the pallas kernel):
# 0:3 U0 | 3:6 V0 | 6:9 U1 | 9:12 V1 | 12:15 U2 | 15:18 V2 | 18:21 n | 21 k
NF = 24
# MXU feature layout (C, 16, 5, K): the whole Plücker+plane test
# becomes ONE f32 matmul L(TILE,16) @ F(16, 5·CH·K) per round on the
# systolic array, with L = [dx dy dz mx my mz 0 0 ox oy oz 1 0 0 0 0]
# per ray. Block axis b (second-to-last) selects the plane:
#   b=0: rows 0:3 = U0, rows 3:6 = V0         → w0
#   b=1: rows 0:3 = U1, rows 3:6 = V1         → w1
#   b=2: rows 0:3 = U2, rows 3:6 = V2         → w2
#   b=3: rows 0:3 = n                         → n·d
#   b=4: rows 8:11 = −n, row 11 = k_plane     → k − n·o
# The kernel DMAs whole clusters into block-major scratch
# (16, 5, CH, K) so each plane is one contiguous (TILE, CH·K) slice.
NF_MXU = 16


class ClusterSet(NamedTuple):
    packed: jnp.ndarray    # (C, NF, K) Plücker/plane features
    packed_mxu: jnp.ndarray  # (C, 16, 5, K) matmul layout (see NF_MXU)
    c_p0: jnp.ndarray      # (C, K, 3) corners (for final barycentric pass)
    c_p1: jnp.ndarray
    c_p2: jnp.ndarray
    c_tri_id: jnp.ndarray  # (C, K) int32 original triangle id (pad 0)
    c_bmin: jnp.ndarray    # (C, 3)
    c_bmax: jnp.ndarray    # (C, 3)
    cov_mxu: jnp.ndarray   # (6, 6, CPAD) slab-plane features, CPAD %128
    world_min: jnp.ndarray
    world_max: jnp.ndarray

    @property
    def n_clusters(self):
        return self.packed.shape[0]

    @property
    def cluster_size(self):
        return self.packed.shape[2]


def _treelet_groups(rp, nn, t, k, unit=None):
    """Cut the depth-first BVH into contiguous prim ranges, each a pack
    of whole subtrees with ≤ `unit` prims (treelets), then greedily pack
    consecutive treelets into clusters of ≤ k — the cluster analog of
    BVH interior nodes. `unit` < k trades slightly looser cluster AABBs
    (a cluster spans a few DFS-adjacent subtrees) for much better slot
    fill (~0.95 vs ~0.77 at unit = k), i.e. fewer clusters and fewer
    padded-slot triangle tests per round. Node layout (geom/bvh.py):
    left child = i+1, interior right child = rp[i], leaf prim offset =
    rp[i] with nn[i] > 0. Returns [(start, count)] covering [0, t)."""
    if unit is None:
        unit = max(k // 4, 16)
    m = len(nn)
    count = np.zeros(m, np.int64)
    start = np.zeros(m, np.int64)
    for i in range(m - 1, -1, -1):      # children have larger indices
        if nn[i] > 0:
            count[i] = nn[i]
            start[i] = rp[i]
        else:
            count[i] = count[i + 1] + count[rp[i]]
            start[i] = start[i + 1]
    # maximal subtrees with ≤ unit prims, in DFS (= prim) order
    units = []
    stack = [0]
    while stack:
        i = stack.pop()
        if nn[i] > 0 or count[i] <= unit:
            units.append((int(start[i]), int(count[i])))
        else:
            stack.append(int(rp[i]))    # right pushed first →
            stack.append(i + 1)         # left popped first (DFS order)
    # greedy pack of consecutive units (contiguous in prim space)
    groups = []
    cur_s, cur_c = units[0]
    for s, cnt in units[1:]:
        if cur_c + cnt <= k:
            cur_c += cnt
        else:
            groups.append((cur_s, cur_c))
            cur_s, cur_c = s, cnt
    groups.append((cur_s, cur_c))
    assert sum(c for _, c in groups) == t
    return groups


def build_clusters(positions, indices, prim_order=None, k=128):
    """Group triangles into K-sized spatially-tight clusters: the SAH
    BVH is cut at subtree boundaries (treelets, ≤ k prims each) and
    consecutive treelets are packed into clusters — much tighter AABBs
    than arbitrary K-chunks of the depth-first order, which straddle
    subtree boundaries (the wavefront analog of interior BVH nodes,
    bvh.rs:840-874). Host-side numpy; per-cluster padding slots carry
    degenerate triangles (zero normal ⇒ never hit)."""
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int32).reshape(-1, 3)
    t = len(indices)
    groups = None
    if prim_order is None:
        from . import native_build
        pa = positions[indices[:, 0]]
        pb = positions[indices[:, 1]]
        pc = positions[indices[:, 2]]
        pmin = np.minimum(np.minimum(pa, pb), pc)
        pmax = np.maximum(np.maximum(pa, pb), pc)
        res = native_build.build_bvh_native(pmin, pmax, 4, "sah")
        if res is not None:
            prim_order = res[5]
            groups = _treelet_groups(res[2], res[3], t, k)
        else:
            prim_order = np.arange(t, dtype=np.int32)
    prim_order = np.asarray(prim_order, np.int32)
    if groups is None:
        groups = [(s, min(k, t - s)) for s in range(0, t, k)]
    c = len(groups)
    # per-cluster slot table into prim_order; pads repeat the first slot
    slots = np.zeros((c, k), np.int64)
    valid = np.zeros((c, k), bool)
    for ci, (s, cnt) in enumerate(groups):
        slots[ci, :cnt] = np.arange(s, s + cnt)
        slots[ci, cnt:] = s
        valid[ci, :cnt] = True
    order = prim_order[slots.reshape(-1)]           # (c*k,) global tri ids
    valid = valid.reshape(-1)
    idx = indices[order]
    p0 = positions[idx[:, 0]].astype(np.float64)
    p1 = positions[idx[:, 1]].astype(np.float64)
    p2 = positions[idx[:, 2]].astype(np.float64)
    # degenerate padding (p0=p1=p2 ⇒ zero normal ⇒ never hit)
    p1[~valid] = p0[~valid]
    p2[~valid] = p0[~valid]

    def edge(a, b):
        return np.cross(a, b), b - a          # (U, V)

    u0, v0 = edge(p0, p1)
    u1, v1 = edge(p1, p2)
    u2, v2 = edge(p2, p0)
    n = np.cross(p1 - p0, p2 - p0)
    kplane = np.sum(n * p0, axis=-1)
    packed = np.concatenate(
        [u0, v0, u1, v1, u2, v2, n, kplane[:, None],
         np.zeros((len(p0), 2))], axis=1).astype(np.float32)
    packed = packed.reshape(c, k, NF).transpose(0, 2, 1)   # (C, NF, K)

    nt_ = c * k
    mxu = np.zeros((nt_, NF_MXU, 5), np.float32)           # (tri, row, block)
    mxu[:, 0:3, 0] = u0; mxu[:, 3:6, 0] = v0
    mxu[:, 0:3, 1] = u1; mxu[:, 3:6, 1] = v1
    mxu[:, 0:3, 2] = u2; mxu[:, 3:6, 2] = v2
    mxu[:, 0:3, 3] = n
    mxu[:, 8:11, 4] = -n; mxu[:, 11, 4] = kplane
    # (C, 16, 5, K): per cluster, feature rows × plane block × K lanes
    # (NOTE: n·d = w0+w1+w2 algebraically, but the m·Vᵢ terms cancel
    # catastrophically under bf16 split products — measured 1e-3 t error
    # vs the dedicated exact block, so nd keeps its own plane.)
    packed_mxu = mxu.reshape(c, k, NF_MXU, 5).transpose(0, 2, 3, 1)

    p0f = p0.astype(np.float32).reshape(c, k, 3)
    p1f = p1.astype(np.float32).reshape(c, k, 3)
    p2f = p2.astype(np.float32).reshape(c, k, 3)
    tri_id = order.reshape(c, k)
    bmin = np.minimum(np.minimum(p0f.min(1), p1f.min(1)), p2f.min(1))
    bmax = np.maximum(np.maximum(p0f.max(1), p1f.max(1)), p2f.max(1))
    # slab-plane feature table for the MXU coverage pass
    # (kernels/cluster_pallas.coverage_tiles): plane p = 2·ax+{lo,hi}
    # evaluates t = b_ax·inv_ax + 1·(−o_ax·inv_ax).
    cpad = -(-c // 128) * 128
    cov = np.zeros((6, 6, cpad), np.float32)
    for ax in range(3):
        cov[ax, 2 * ax, :c] = bmin[:, ax]
        cov[ax, 2 * ax + 1, :c] = bmax[:, ax]
        cov[3 + ax, 2 * ax, :c] = 1.0
        cov[3 + ax, 2 * ax + 1, :c] = 1.0
    return ClusterSet(
        packed=jnp.asarray(packed),
        packed_mxu=jnp.asarray(packed_mxu),
        c_p0=jnp.asarray(p0f), c_p1=jnp.asarray(p1f), c_p2=jnp.asarray(p2f),
        c_tri_id=jnp.asarray(tri_id),
        c_bmin=jnp.asarray(bmin), c_bmax=jnp.asarray(bmax),
        cov_mxu=jnp.asarray(cov),        # (6 planes, 6 features, CPAD)
        world_min=jnp.asarray(bmin.min(0)), world_max=jnp.asarray(bmax.max(0)))


# -------------------------------------------------------- ray coherence

def _expand_bits10(v):
    v = (v | (v << jnp.uint32(16))) & jnp.uint32(0x030000FF)
    v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
    v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
    v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249249)
    return v


def _morton3(q, bits):
    """Interleave 3×`bits`-bit fixed-point coords (q in [0,1]^3)."""
    scale = np.float32((1 << bits) - 1)
    qi = (jnp.clip(q, 0.0, 1.0) * scale).astype(jnp.uint32)
    m = (_expand_bits10(qi[..., 0])
         | (_expand_bits10(qi[..., 1]) << 1)
         | (_expand_bits10(qi[..., 2]) << 2))
    return m & jnp.uint32((1 << (3 * bits)) - 1)


_KEY_OBITS = int(os.environ.get("PBRT_TPU_KEY_OBITS", 5))  # origin bits/axis
_KEY_DBITS = int(os.environ.get("PBRT_TPU_KEY_DBITS", 4))  # direction bits/axis


def _coherence_key(cs, o, d):
    """uint32 sort key: direction octant, coarse origin Morton, then
    direction Morton (SURVEY §7 'sort rays by direction octant/origin
    cell'). The direction bits matter for pinhole primary rays (all
    origins equal) — without them tiles degenerate to scanline strips
    with wide frusta."""
    octant = ((d[..., 0] < 0).astype(jnp.uint32)
              | ((d[..., 1] < 0).astype(jnp.uint32) << 1)
              | ((d[..., 2] < 0).astype(jnp.uint32) << 2))
    ext = jnp.maximum(cs.world_max - cs.world_min, 1e-6)
    q = (o - cs.world_min) / ext
    m_origin = _morton3(q, _KEY_OBITS)
    m_dir = _morton3(0.5 * (d + 1.0), _KEY_DBITS)
    db = jnp.uint32(3 * _KEY_DBITS)
    return (octant << jnp.uint32(3 * (_KEY_OBITS + _KEY_DBITS))) \
        | (m_origin << db) | m_dir


def _world_exit_cap(cs, o, d, t_min, t_max):
    """min(t_max, ray's exit t from the whole cluster-set AABB): gives
    miss-lanes a FINITE best-t so the kernels' ordered-entry-t pruning
    can fire (an INF t_best in one lane blocks the whole tile), and
    turns rays that miss the box entirely into dead lanes."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d < 0, -1e-12, 1e-12), d)
    t0 = (cs.world_min - o) * inv
    t1 = (cs.world_max - o) * inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    miss = (tn > tf * 1.0001) | (tf < t_min)
    cap = tf * 1.0005 + 1e-4
    return jnp.where(miss, t_min - 1.0, jnp.minimum(t_max, cap))


def _prepare(cs, o, d, t_min, t_max, flag=None):
    """Flatten, sort by coherence, pad to a tile multiple. Returns ray
    component planes (NT, TILE) plus bookkeeping.

    The permutation is applied with ONE (N, 8) row gather of the packed
    (o, d, tmin, tmax) record — TPU gather cost is per-row, nearly
    independent of row width, so one 32-byte-row gather beats four
    narrow ones ~4×. `flag` (optional per-lane f32, e.g. the fused
    shadow-ray any-hit marker) rides the record as a ninth column."""
    shp = o.shape[:-1]
    n = int(np.prod(shp)) if shp else 1
    o = o.reshape(n, 3)
    d = d.reshape(n, 3)
    t_min = jnp.broadcast_to(t_min, shp).reshape(n)
    t_max = jnp.broadcast_to(t_max, shp).reshape(n)
    t_max = _world_exit_cap(cs, o, d, t_min, t_max)
    key = _coherence_key(cs, o, d)
    # dead lanes (t_max <= t_min) sort to the very end: they concentrate
    # into tiles with zero cluster coverage, which the traversal kernels
    # skip outright (count = 0 ⇒ 0 rounds) — free wavefront compaction.
    live = t_max > t_min
    key = jnp.where(live, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    from ..kernels.cluster_pallas import TPB
    pad = (-n) % (TILE * TPB)        # tiles come in TPB-sized grid steps
    order_p = jnp.concatenate([order, jnp.zeros(pad, order.dtype)]) if pad else order
    cols = [o, d, t_min[:, None], t_max[:, None]]
    if flag is not None:
        cols.append(flag.reshape(n, 1).astype(Float))
    rec = jnp.concatenate(cols, axis=1)
    rec_s = rec[order_p]                       # (n+pad, 8|9) — THE gather
    npad = n + pad
    nt = npad // TILE
    tmaxs = rec_s[:, 7]
    if pad:
        # padded lanes: t_max < t_min ⇒ inert
        tmaxs = jnp.where(jnp.arange(npad) < n, tmaxs, -1.0)
    os = rec_s[:, 0:3]
    ds = rec_s[:, 3:6]
    m = jnp.cross(os, ds)   # ray moment (Plücker; jnp tracer only — DCE'd
    #                         on the pallas path, which assembles m in-kernel)
    comp = dict(
        ox=rec_s[:, 0].reshape(nt, TILE), oy=rec_s[:, 1].reshape(nt, TILE),
        oz=rec_s[:, 2].reshape(nt, TILE),
        dx=rec_s[:, 3].reshape(nt, TILE), dy=rec_s[:, 4].reshape(nt, TILE),
        dz=rec_s[:, 5].reshape(nt, TILE),
        mx=m[:, 0].reshape(nt, TILE), my=m[:, 1].reshape(nt, TILE),
        mz=m[:, 2].reshape(nt, TILE),
        tmin=rec_s[:, 6].reshape(nt, TILE), tmax=tmaxs.reshape(nt, TILE))
    if flag is not None:
        comp["flag"] = rec_s[:, 8].reshape(nt, TILE)
    return shp, n, order, comp, os.reshape(nt, TILE, 3), ds.reshape(nt, TILE, 3), nt


def _tile_cluster_pass(cs, os, ds, tmins, tmaxs):
    """Dense (tiles, clusters) coverage: does any lane of the tile enter
    the cluster box, and the smallest entry t. Scalarised slab test."""
    nt = os.shape[0]
    c = cs.n_clusters
    inv_d = 1.0 / jnp.where(jnp.abs(ds) < 1e-12,
                            jnp.where(ds < 0, -1e-12, 1e-12), ds)
    t_near = jnp.full((nt, c), INF, Float)
    cov = jnp.zeros((nt, c), bool)
    # components: rays (nt, TILE, 1) vs clusters (1, 1, C)
    tn = jnp.broadcast_to(tmins[:, :, None], (nt, os.shape[1], c)) * 0 + tmins[:, :, None]
    tf = tmaxs[:, :, None] * jnp.ones((1, 1, c), Float)
    for ax in range(3):
        bmin = cs.c_bmin[:, ax][None, None, :]
        bmax = cs.c_bmax[:, ax][None, None, :]
        oa = os[:, :, ax:ax + 1]
        ia = inv_d[:, :, ax:ax + 1]
        t0 = (bmin - oa) * ia
        t1 = (bmax - oa) * ia
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1) * 1.0001)
    hit = tn <= tf                                   # (nt, TILE, c)
    cov = jnp.any(hit, axis=1)
    t_near = jnp.min(jnp.where(hit, tn, INF), axis=1)
    return cov, t_near


def _round_test(cs, comp, cids, t_best):
    """One dense round: rays of every tile vs the CH gathered clusters.
    Returns (t (nt,TILE,CHK), slot t-values with misses at INF)."""
    nt = cids.shape[0]
    k = cs.cluster_size
    chk = cids.shape[1] * k
    feat = cs.packed[cids]                          # (nt, CH, NF, K)
    feat = feat.transpose(0, 2, 1, 3).reshape(nt, NF, chk)

    def F(i):
        return feat[:, i, :][:, None, :]            # (nt, 1, chk)

    dx, dy, dz = comp["dx"][:, :, None], comp["dy"][:, :, None], comp["dz"][:, :, None]
    mx, my, mz = comp["mx"][:, :, None], comp["my"][:, :, None], comp["mz"][:, :, None]
    ox, oy, oz = comp["ox"][:, :, None], comp["oy"][:, :, None], comp["oz"][:, :, None]

    w0 = dx * F(0) + dy * F(1) + dz * F(2) + mx * F(3) + my * F(4) + mz * F(5)
    w1 = dx * F(6) + dy * F(7) + dz * F(8) + mx * F(9) + my * F(10) + mz * F(11)
    w2 = dx * F(12) + dy * F(13) + dz * F(14) + mx * F(15) + my * F(16) + mz * F(17)
    same_sign = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) | \
                ((w0 <= 0) & (w1 <= 0) & (w2 <= 0))
    ndotd = dx * F(18) + dy * F(19) + dz * F(20)
    ndoto = ox * F(18) + oy * F(19) + oz * F(20)
    t = (F(21) - ndoto) / jnp.where(jnp.abs(ndotd) > 1e-12, ndotd, 1e-12)
    ok = same_sign & (jnp.abs(ndotd) > 1e-12) \
        & (t > comp["tmin"][:, :, None]) & (t < t_best[:, :, None])
    return jnp.where(ok, t, INF)


def _finalize_hits(cs, tri, o_flat, d_flat, t_min_flat, hit, tri_idx):
    """Recover (t, b1, b2) for the winning triangle of each ray via one
    Möller–Trumbore evaluation (bit-consistent with the brute path)."""
    idx = tri.indices[jnp.maximum(tri_idx, 0)]
    p0 = tri.positions[idx[:, 0]]
    p1 = tri.positions[idx[:, 1]]
    p2 = tri.positions[idx[:, 2]]
    h, t, b1, b2 = trimod.moller_trumbore(
        o_flat, d_flat, p0, p1, p2, t_min_flat, jnp.full(t_min_flat.shape, INF, Float))
    ok = hit & h
    return ok, jnp.where(ok, t, INF), b1, b2


def _sorted_cluster_order(cov, tnear):
    tnear = jnp.where(cov, tnear, INF)
    corder = jnp.argsort(tnear, axis=1).astype(Int)
    tnear_sorted = jnp.take_along_axis(tnear, corder, axis=1)
    return corder, tnear_sorted


def intersect(cs: ClusterSet, tri, o, d, t_min, t_max):
    """Closest-hit query. Returns (hit, t, tri_idx, b1, b2) with the
    original lane shape."""
    shp, n, order, comp, os, ds, nt = _prepare(cs, o, d, t_min, t_max)
    c = cs.n_clusters
    k = cs.cluster_size
    ch = _chunk_clusters(k)

    cov, tnear = _tile_cluster_pass(cs, os, ds, comp["tmin"], comp["tmax"])
    corder, tnear_sorted = _sorted_cluster_order(cov, tnear)

    max_rounds = (c + ch - 1) // ch
    pad_c = max_rounds * ch - c
    corder_p = jnp.pad(corder, ((0, 0), (0, pad_c)))
    tnear_p = jnp.pad(tnear_sorted, ((0, 0), (0, pad_c)), constant_values=INF)

    def cond(s):
        r, _, t_best, _ = s
        next_tn = jax.lax.dynamic_slice_in_dim(tnear_p, r * ch, 1, axis=1)[:, 0]
        return (r < max_rounds) & jnp.any(next_tn < jnp.max(t_best, axis=1))

    chk = ch * k
    slot_iota = jax.lax.broadcasted_iota(Int, (1, 1, chk), 2)
    slot_mask = (1 << _SLOT_BITS) - 1
    assert chk <= (1 << _SLOT_BITS)

    def body(s):
        r, hitb, t_best, i_best = s
        cids = jax.lax.dynamic_slice_in_dim(corder_p, r * ch,
                                            ch, axis=1)     # (nt, CH)
        t = _round_test(cs, comp, cids, t_best)       # (nt, TILE, CHK)
        # pack (t, slot) into one int key: low mantissa bits carry the
        # slot, so a single min-reduce yields both the (slightly
        # conservative) best t and the winning slot — the exact t is
        # recovered by the finalize pass. t ≥ t_min > 0, so the float
        # bit pattern is order-preserving as int32.
        t_bits = jax.lax.bitcast_convert_type(t, jnp.int32)
        key = (t_bits & ~slot_mask) | slot_iota
        kmin = jnp.min(key, axis=-1)                  # (nt, TILE)
        slot = kmin & slot_mask
        tj = jax.lax.bitcast_convert_type(kmin & ~slot_mask, Float)
        tid = cs.c_tri_id[cids].reshape(nt, chk)
        upd = tj < t_best
        t_best = jnp.where(upd, tj, t_best)
        i_best = jnp.where(upd, jnp.take_along_axis(tid, slot, axis=-1), i_best)
        return (r + 1, hitb | upd, t_best, i_best)

    init = (jnp.zeros((), Int), jnp.zeros((nt, TILE), bool), comp["tmax"],
            jnp.zeros((nt, TILE), Int))
    _, hitb, t_best, i_best = jax.lax.while_loop(cond, body, init)

    inv = jnp.argsort(order)

    def un(a):
        return a.reshape(-1)[inv].reshape(shp)

    hit_flat = un(hitb).reshape(-1)
    idx_flat = un(i_best).reshape(-1)
    o_flat = o.reshape(-1, 3)
    d_flat = d.reshape(-1, 3)
    tmin_flat = jnp.broadcast_to(t_min, shp).reshape(-1)
    ok, t_fin, b1, b2 = _finalize_hits(cs, tri, o_flat, d_flat, tmin_flat,
                                       hit_flat, idx_flat)
    return (ok.reshape(shp), t_fin.reshape(shp), idx_flat.reshape(shp),
            b1.reshape(shp), b2.reshape(shp))


def occluded(cs: ClusterSet, tri, o, d, t_min, t_max):
    """Any-hit query (shadow rays): rounds stop as soon as every live
    lane is occluded or clusters are exhausted."""
    shp, n, order, comp, os, ds, nt = _prepare(cs, o, d, t_min, t_max)
    c = cs.n_clusters
    k = cs.cluster_size
    ch = _chunk_clusters(k)
    cov, tnear = _tile_cluster_pass(cs, os, ds, comp["tmin"], comp["tmax"])
    corder, tnear_sorted = _sorted_cluster_order(cov, tnear)
    max_rounds = (c + ch - 1) // ch
    pad_c = max_rounds * ch - c
    corder_p = jnp.pad(corder, ((0, 0), (0, pad_c)))
    tnear_p = jnp.pad(tnear_sorted, ((0, 0), (0, pad_c)), constant_values=INF)
    live_lane = comp["tmax"] > comp["tmin"]

    def cond(s):
        r, occ = s
        next_tn = jax.lax.dynamic_slice_in_dim(tnear_p, r * ch, 1, axis=1)[:, 0]
        tile_live = jnp.any(live_lane & ~occ, axis=1) & (next_tn < INF)
        return (r < max_rounds) & jnp.any(tile_live)

    def body(s):
        r, occ = s
        cids = jax.lax.dynamic_slice_in_dim(corder_p, r * ch,
                                            ch, axis=1)
        t = _round_test(cs, comp, cids, comp["tmax"])
        return r + 1, occ | jnp.any(t < INF, axis=-1)

    init = (jnp.zeros((), Int), jnp.zeros((nt, TILE), bool))
    _, occ = jax.lax.while_loop(cond, body, init)
    inv = jnp.argsort(order)
    return occ.reshape(-1)[inv].reshape(shp)


def _pallas_inputs(cs, comp, os_, ds_, interpret=False):
    """Sorted ray component planes for the MXU kernels — eight separate
    (nt, 1, TILE) arrays (pure reshapes, no stack/relayout; the kernels
    assemble the L feature matrix incl. the Plücker moment in-register)
    + the pallas coverage pass + the per-tile entry-t cluster order."""
    from ..kernels import cluster_pallas as kp
    CH_ = kp.CH
    c = cs.n_clusters
    planes = tuple(comp[f][:, None, :] for f in
                   ("ox", "oy", "oz", "dx", "dy", "dz", "tmin", "tmax"))
    # live lanes are a sorted prefix → tiles past the live prefix skip
    # the coverage matmul entirely (dead-suffix gating)
    n_live = jnp.sum((comp["tmax"] > comp["tmin"]).astype(jnp.int32))
    n_live_tiles = (n_live + TILE - 1) // TILE
    tnear, covbits = kp.coverage_tiles(planes, cs.cov_mxu, c,
                                       n_live_tiles=n_live_tiles,
                                       interpret=interpret)
    counts = jnp.sum((tnear < INF).astype(Int), axis=1)
    corder = jnp.argsort(tnear, axis=1).astype(Int)
    tnear_sorted = jnp.take_along_axis(tnear, corder, axis=1)
    # clamp: positions past `counts` may name pad columns (≥ C); the
    # kernel's last partial round still DMAs them, so point them at a
    # real cluster (redundant exact tests are harmless).
    corder = jnp.minimum(corder, c - 1)
    # traversal-side cluster-list cap: corder/tnear ride per-grid-step
    # SMEM blocks in the kernels, which overflow scalar memory on
    # 10k+-cluster scenes at full CPAD width. Entries are sorted by
    # entry t, so truncation drops only the FARTHEST clusters of tiles
    # whose coverage exceeds the cap — far above any measured per-tile
    # coverage (max 635 at 81k tris / TILE=512; the 1.3M-tri scene
    # measures ~2k max). Raise PBRT_TPU_TRAV_CPAD if profile_scaling
    # ever reports max coverage near the cap.
    tcap = int(os.environ.get("PBRT_TPU_TRAV_CPAD", 4096))
    tcap = -(-tcap // CH_) * CH_
    if tcap < corder.shape[1]:
        corder = corder[:, :tcap]
        tnear_sorted = tnear_sorted[:, :tcap]
        counts = jnp.minimum(counts, tcap)
    cmax = int(os.environ.get("PBRT_TPU_CMAX", 0))
    if cmax and cmax < corder.shape[1]:
        # timing probe / coverage cap: only the nearest cmax clusters
        # per tile are traversed (MAY MISS HITS on overflow tiles) —
        # never allow it to silently poison a correctness run
        import warnings
        warnings.warn(
            f"PBRT_TPU_CMAX={cmax} caps per-tile cluster coverage below "
            f"the worst case ({corder.shape[1]}); hits may be missed — "
            "timing probes only", stacklevel=2)
        corder = corder[:, :cmax]
        tnear_sorted = tnear_sorted[:, :cmax]
        counts = jnp.minimum(counts, cmax)
    return planes, corder, tnear_sorted, counts, covbits


def intersect_pallas(cs: ClusterSet, o, d, t_min, t_max, interpret=False):
    """Closest-hit via the pallas per-tile MXU kernel
    (kernels/cluster_pallas.py). Requires a ClusterSet built with
    k=128. Same return contract as `intersect`.

    The kernel extracts the winner's exact plane t and Plücker-volume
    barycentrics in-register (one-hot over the round), so no
    Möller–Trumbore finalize pass (and none of its random vertex
    gathers) is needed — only the slot→triangle-id lookup and one
    packed unsort gather remain on the XLA side."""
    from ..kernels import cluster_pallas as kp
    shp, n, order, comp, os_, ds_, nt = _prepare(cs, o, d, t_min, t_max)
    k = cs.cluster_size
    planes, corder_p, tnear_p, counts, covbits = _pallas_inputs(
        cs, comp, os_, ds_, interpret=interpret)

    t_best, gslot, bary = kp.traverse_tiles(cs.packed_mxu, planes, corder_p,
                                            tnear_p, counts, covbits=covbits,
                                            interpret=interpret)
    # kernel returns GLOBAL tri slots (cluster_id·K + lane): one flat
    # gather resolves the original triangle id
    hit = gslot >= 0
    tid = cs.c_tri_id.reshape(-1)[jnp.maximum(gslot, 0)]

    # one packed unsort gather: [t, b1, b2, tid, hit] per sorted lane.
    # (A direct .at[order].set scatter was tried and LOSES ~4 ms/launch
    # at fused 524k-lane widths on v5e — XLA's scatter lowering beats
    # argsort+gather only below ~300k rows.)
    packed = jnp.stack([
        t_best.reshape(-1), bary[:, 0, :].reshape(-1),
        bary[:, 1, :].reshape(-1), tid.reshape(-1).astype(Float),
        hit.reshape(-1).astype(Float)], axis=-1)
    inv = jnp.argsort(order)
    out = packed[inv]
    ok = out[:, 4] > 0.5
    t_fin = jnp.where(ok, out[:, 0], INF)
    return (ok.reshape(shp), t_fin.reshape(shp),
            out[:, 3].astype(Int).reshape(shp),
            out[:, 1].reshape(shp), out[:, 2].reshape(shp))


def intersect_occluded_pallas(cs: ClusterSet, o, d, t_min, t_max,
                              o_sh, d_sh, tmin_sh, tmax_sh, interpret=False):
    """FUSED closest-hit + any-hit query: the extension rays (closest)
    and the bounce's NEE shadow rays (any-hit) share ONE coherence sort,
    ONE coverage pass and ONE kernel launch — the per-bounce traversal
    overhead (two argsorts, two coverage matmuls, two grid launches)
    halves, and rays leaving the same surface points land in the same
    tiles. Shadow lanes run the kernel in any-hit mode (see
    kernels/cluster_pallas.traverse_tiles).

    Returns ((hit, t, tri_idx, b1, b2), occ) with the original shapes."""
    shp = o.shape[:-1]
    shp_sh = o_sh.shape[:-1]
    n = int(np.prod(shp)) if shp else 1
    n_sh = int(np.prod(shp_sh)) if shp_sh else 1
    oc = jnp.concatenate([o.reshape(n, 3), o_sh.reshape(n_sh, 3)], axis=0)
    dc = jnp.concatenate([d.reshape(n, 3), d_sh.reshape(n_sh, 3)], axis=0)
    tminc = jnp.concatenate([jnp.broadcast_to(t_min, shp).reshape(n),
                             jnp.broadcast_to(tmin_sh, shp_sh).reshape(n_sh)])
    tmaxc = jnp.concatenate([jnp.broadcast_to(t_max, shp).reshape(n),
                             jnp.broadcast_to(tmax_sh, shp_sh).reshape(n_sh)])
    flag = jnp.concatenate([jnp.zeros(n, Float), jnp.ones(n_sh, Float)])

    from ..kernels import cluster_pallas as kp
    _, _, order, comp, os_, ds_, nt = _prepare(cs, oc, dc, tminc, tmaxc,
                                               flag=flag)
    k = cs.cluster_size
    planes, corder_p, tnear_p, counts, covbits = _pallas_inputs(
        cs, comp, os_, ds_, interpret=interpret)
    ah = comp["flag"][:, None, :]
    t_best, gslot, bary = kp.traverse_tiles(cs.packed_mxu, planes, corder_p,
                                            tnear_p, counts, anyhit=ah,
                                            covbits=covbits,
                                            interpret=interpret)
    hit = gslot >= 0
    tid = cs.c_tri_id.reshape(-1)[jnp.maximum(gslot, 0)]
    packed = jnp.stack([
        t_best.reshape(-1), bary[:, 0, :].reshape(-1),
        bary[:, 1, :].reshape(-1), tid.reshape(-1).astype(Float),
        hit.reshape(-1).astype(Float)], axis=-1)
    inv = jnp.argsort(order)
    out = packed[inv]
    oute = out[:n]
    ok = oute[:, 4] > 0.5
    t_fin = jnp.where(ok, oute[:, 0], INF)
    occ = out[n:, 4] > 0.5
    return ((ok.reshape(shp), t_fin.reshape(shp),
             oute[:, 3].astype(Int).reshape(shp),
             oute[:, 1].reshape(shp), oute[:, 2].reshape(shp)),
            occ.reshape(shp_sh))


def occluded_pallas(cs: ClusterSet, o, d, t_min, t_max, interpret=False):
    """Any-hit via the pallas per-tile MXU kernel. Same return contract
    as `occluded`."""
    from ..kernels import cluster_pallas as kp
    shp, n, order, comp, os_, ds_, nt = _prepare(cs, o, d, t_min, t_max)
    planes, corder_p, tnear_p, counts, covbits = _pallas_inputs(
        cs, comp, os_, ds_, interpret=interpret)
    occ = kp.occluded_tiles(cs.packed_mxu, planes, corder_p, tnear_p, counts,
                            covbits=covbits, interpret=interpret)
    inv = jnp.argsort(order)
    return occ.reshape(-1)[inv].reshape(shp)
