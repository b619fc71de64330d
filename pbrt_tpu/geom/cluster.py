"""Tile×cluster tracer — the TPU-native acceleration structure.

This replaces pointer-chasing BVH traversal (src/accelerators/bvh.rs:
828-932) with a formulation built for the TPU's strengths (dense VPU/MXU
math, fast sorts, slab-contiguous memory) and around its weakness
(per-lane divergent gathers):

  1. triangles are reordered by the SAH builder's depth-first prim order
     (geom/bvh.py) and grouped into fixed-size spatially-coherent
     *clusters*; cluster AABBs play the role of BVH nodes,
  2. rays are sorted by a (direction-octant, origin-Morton) key and
     blocked into *tiles* of TR rays — the wavefront analog of the
     reference's coherent 16×16 image tiles (parallel.rs),
  3. a dense (tile, cluster) slab pass computes, per tile, which
     clusters any ray enters and at what entry t,
  4. per tile, clusters are processed in ascending-t order in chunks:
     each round gathers CH whole clusters (contiguous blocks — a
     streaming fetch, not a divergent gather) and runs a dense
     Möller–Trumbore of (TR rays × CH·K tris) on the vector units,
  5. rounds stop when every unprocessed cluster's entry t exceeds every
     lane's current best hit (the same ordered-traversal pruning as a
     BVH's near-child-first descent).

All shapes are static; the only sequential construct is a `fori_loop`
over rounds with masked tiles. Results are bit-identical to the
brute-force reference (same MT kernel, same tie-break by argmin over
ascending triangle order within a round — verified in tests).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Float, Int, INF
from . import triangle as trimod

TILE = 256          # rays per tile
CHUNK_CLUSTERS = 8  # clusters fetched per round


class ClusterSet(NamedTuple):
    c_p0: jnp.ndarray      # (C, K, 3) corner 0, degenerate-padded
    c_p1: jnp.ndarray
    c_p2: jnp.ndarray
    c_tri_id: jnp.ndarray  # (C, K) int32 original triangle id (pad 0)
    c_bmin: jnp.ndarray    # (C, 3)
    c_bmax: jnp.ndarray    # (C, 3)
    world_min: jnp.ndarray  # (3,)
    world_max: jnp.ndarray  # (3,)

    @property
    def n_clusters(self):
        return self.c_p0.shape[0]

    @property
    def cluster_size(self):
        return self.c_p0.shape[1]


def build_clusters(positions, indices, prim_order=None, k=64):
    """Group triangles into K-sized clusters following `prim_order`
    (SAH depth-first order → spatial coherence). Host-side numpy."""
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int32).reshape(-1, 3)
    t = len(indices)
    if prim_order is None:
        from . import native_build
        p0 = positions[indices[:, 0]]
        p1 = positions[indices[:, 1]]
        p2 = positions[indices[:, 2]]
        pmin = np.minimum(np.minimum(p0, p1), p2)
        pmax = np.maximum(np.maximum(p0, p1), p2)
        res = native_build.build_bvh_native(pmin, pmax, 4, "sah")
        prim_order = res[5] if res is not None else np.arange(t, dtype=np.int32)
    prim_order = np.asarray(prim_order, np.int32)
    c = (t + k - 1) // k
    pad = c * k - t
    order = np.concatenate([prim_order, np.zeros(pad, np.int32)])
    idx = indices[order]
    p0 = positions[idx[:, 0]].reshape(c, k, 3)
    p1 = positions[idx[:, 1]].reshape(c, k, 3)
    p2 = positions[idx[:, 2]].reshape(c, k, 3)
    if pad:
        # degenerate padding (p0=p1=p2 ⇒ det≈0 ⇒ never hit)
        p1.reshape(-1, 3)[t:] = p0.reshape(-1, 3)[t:]
        p2.reshape(-1, 3)[t:] = p0.reshape(-1, 3)[t:]
    tri_id = order.reshape(c, k)
    bmin = np.minimum(np.minimum(p0.min(1), p1.min(1)), p2.min(1))
    bmax = np.maximum(np.maximum(p0.max(1), p1.max(1)), p2.max(1))
    return ClusterSet(
        c_p0=jnp.asarray(p0), c_p1=jnp.asarray(p1), c_p2=jnp.asarray(p2),
        c_tri_id=jnp.asarray(tri_id),
        c_bmin=jnp.asarray(bmin), c_bmax=jnp.asarray(bmax),
        world_min=jnp.asarray(bmin.min(0)), world_max=jnp.asarray(bmax.max(0)))


def _expand_bits10(v):
    v = (v | (v << jnp.uint32(16))) & jnp.uint32(0x030000FF)
    v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
    v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
    v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249249)
    return v


def _coherence_key(cs, o, d):
    """uint32 sort key: 3-bit direction octant, then 27-bit origin
    Morton code in world bounds — restores packet coherence for bounce
    rays (SURVEY §7 'sort rays by direction octant/origin cell')."""
    octant = ((d[..., 0] < 0).astype(jnp.uint32)
              | ((d[..., 1] < 0).astype(jnp.uint32) << 1)
              | ((d[..., 2] < 0).astype(jnp.uint32) << 2))
    ext = jnp.maximum(cs.world_max - cs.world_min, 1e-6)
    q = jnp.clip((o - cs.world_min) / ext, 0.0, 1.0)
    qi = (q * 511.0).astype(jnp.uint32)
    morton = (_expand_bits10(qi[..., 0])
              | (_expand_bits10(qi[..., 1]) << 1)
              | (_expand_bits10(qi[..., 2]) << 2))
    return (octant << jnp.uint32(27)) | (morton & jnp.uint32(0x07FFFFFF))


def _slab(bmin, bmax, o, inv_d, t_min, t_max):
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(tn, axis=-1), t_min)
    t_far = jnp.minimum(jnp.min(tf, axis=-1) * 1.0001, t_max)
    return t_near <= t_far, t_near


def _prepare(cs, o, d, t_min, t_max):
    """Flatten, sort by coherence, pad to a tile multiple."""
    shp = o.shape[:-1]
    n = int(np.prod(shp)) if shp else 1
    o = o.reshape(n, 3)
    d = d.reshape(n, 3)
    t_min = jnp.broadcast_to(t_min, shp).reshape(n)
    t_max = jnp.broadcast_to(t_max, shp).reshape(n)
    key = _coherence_key(cs, o, d)
    order = jnp.argsort(key)
    pad = (-n) % TILE
    if pad:
        order_p = jnp.concatenate([order, jnp.zeros(pad, order.dtype)])
    else:
        order_p = order
    os = o[order_p]
    ds = d[order_p]
    tmins = t_min[order_p]
    tmaxs = jnp.concatenate([t_max[order], jnp.full((pad,), -1.0, Float)]) if pad \
        else t_max[order]   # padded lanes: t_max < t_min ⇒ inert
    nt = (n + pad) // TILE
    return (shp, n, order,
            os.reshape(nt, TILE, 3), ds.reshape(nt, TILE, 3),
            tmins.reshape(nt, TILE), tmaxs.reshape(nt, TILE), nt)


def _tile_cluster_pass(cs, os, ds, tmins, tmaxs):
    """Dense (tiles, clusters) coverage: does any lane of the tile enter
    the cluster box, and the smallest entry t. Chunked over clusters."""
    nt = os.shape[0]
    c = cs.n_clusters
    inv_d = 1.0 / jnp.where(jnp.abs(ds) < 1e-12,
                            jnp.where(ds < 0, -1e-12, 1e-12), ds)
    ch = 256
    n_ch = (c + ch - 1) // ch
    bmin_p = jnp.pad(cs.c_bmin, ((0, n_ch * ch - c), (0, 0)), constant_values=1e30)
    bmax_p = jnp.pad(cs.c_bmax, ((0, n_ch * ch - c), (0, 0)), constant_values=-1e30)
    bmin_c = bmin_p.reshape(n_ch, ch, 3)
    bmax_c = bmax_p.reshape(n_ch, ch, 3)

    def body(ci, acc):
        any_acc, tnear_acc = acc
        hit, tn = _slab(bmin_c[ci][None, None], bmax_c[ci][None, None],
                        os[:, :, None, :], inv_d[:, :, None, :],
                        tmins[:, :, None], tmaxs[:, :, None])  # (nt, TILE, ch)
        any_t = jnp.any(hit, axis=1)                            # (nt, ch)
        tn_t = jnp.min(jnp.where(hit, tn, INF), axis=1)         # (nt, ch)
        any_acc = jax.lax.dynamic_update_slice_in_dim(any_acc, any_t, ci * ch, axis=1)
        tnear_acc = jax.lax.dynamic_update_slice_in_dim(tnear_acc, tn_t, ci * ch, axis=1)
        return any_acc, tnear_acc

    init = (jnp.zeros((nt, n_ch * ch), bool), jnp.full((nt, n_ch * ch), INF, Float))
    if n_ch == 1:
        any_acc, tnear_acc = body(0, init)
    else:
        any_acc, tnear_acc = jax.lax.fori_loop(0, n_ch, body, init)
    return any_acc[:, :c], tnear_acc[:, :c]


def intersect(cs: ClusterSet, tri, o, d, t_min, t_max):
    """Closest-hit query. Returns (hit, t, tri_idx, b1, b2) with the
    original lane shape."""
    shp, n, order, os, ds, tmins, tmaxs, nt = _prepare(cs, o, d, t_min, t_max)
    c = cs.n_clusters
    k = cs.cluster_size

    cov, tnear = _tile_cluster_pass(cs, os, ds, tmins, tmaxs)
    tnear = jnp.where(cov, tnear, INF)
    corder = jnp.argsort(tnear, axis=1).astype(Int)       # (nt, C) asc entry t
    tnear_sorted = jnp.take_along_axis(tnear, corder, axis=1)
    counts = jnp.sum(cov, axis=1)                          # (nt,)

    max_rounds = (c + CHUNK_CLUSTERS - 1) // CHUNK_CLUSTERS
    pad_c = max_rounds * CHUNK_CLUSTERS - c
    corder_p = jnp.pad(corder, ((0, 0), (0, pad_c)))
    tnear_p = jnp.pad(tnear_sorted, ((0, 0), (0, pad_c)), constant_values=INF)

    def cond(s):
        r = s[0]
        t_best = s[2]
        next_tn = jax.lax.dynamic_slice_in_dim(tnear_p, r * CHUNK_CLUSTERS, 1, axis=1)[:, 0]
        live = (r < max_rounds) & jnp.any(next_tn < jnp.max(t_best, axis=1))
        return live

    def body(s):
        r, hitb, t_best, i_best, b1b, b2b = s
        cids = jax.lax.dynamic_slice_in_dim(corder_p, r * CHUNK_CLUSTERS,
                                            CHUNK_CLUSTERS, axis=1)     # (nt, CH)
        p0 = cs.c_p0[cids].reshape(nt, CHUNK_CLUSTERS * k, 3)
        p1 = cs.c_p1[cids].reshape(nt, CHUNK_CLUSTERS * k, 3)
        p2 = cs.c_p2[cids].reshape(nt, CHUNK_CLUSTERS * k, 3)
        tid = cs.c_tri_id[cids].reshape(nt, CHUNK_CLUSTERS * k)
        hit, t, b1, b2 = trimod.moller_trumbore(
            os[:, :, None, :], ds[:, :, None, :], p0[:, None], p1[:, None], p2[:, None],
            tmins[:, :, None], t_best[:, :, None])       # (nt, TILE, CH*k)
        j = jnp.argmin(t, axis=-1)                        # (nt, TILE)
        take_ = lambda a: jnp.take_along_axis(a, j[..., None], axis=-1)[..., 0]
        tj = take_(t)
        upd = take_(hit) & (tj < t_best)
        t_best = jnp.where(upd, tj, t_best)
        i_best = jnp.where(upd, jnp.take_along_axis(tid, j, axis=-1), i_best)
        b1b = jnp.where(upd, take_(b1), b1b)
        b2b = jnp.where(upd, take_(b2), b2b)
        return (r + 1, hitb | upd, t_best, i_best, b1b, b2b)

    init = (jnp.zeros((), Int),
            jnp.zeros((nt, TILE), bool),
            tmaxs,
            jnp.zeros((nt, TILE), Int),
            jnp.zeros((nt, TILE), Float), jnp.zeros((nt, TILE), Float))
    _, hitb, t_best, i_best, b1b, b2b = jax.lax.while_loop(cond, body, init)

    # unsort back to caller lane order (inverse permutation via argsort —
    # avoids a TPU scatter)
    inv = jnp.argsort(order)

    def un(a):
        return a.reshape(-1)[inv].reshape(shp)
    return (un(hitb), jnp.where(un(hitb), un(t_best), INF), un(i_best),
            un(b1b), un(b2b))


def occluded(cs: ClusterSet, tri, o, d, t_min, t_max):
    """Any-hit query (shadow rays): rounds stop as soon as every live
    lane is occluded or clusters are exhausted."""
    shp, n, order, os, ds, tmins, tmaxs, nt = _prepare(cs, o, d, t_min, t_max)
    c = cs.n_clusters
    k = cs.cluster_size
    cov, tnear = _tile_cluster_pass(cs, os, ds, tmins, tmaxs)
    tnear = jnp.where(cov, tnear, INF)
    corder = jnp.argsort(tnear, axis=1).astype(Int)
    tnear_sorted = jnp.take_along_axis(tnear, corder, axis=1)
    max_rounds = (c + CHUNK_CLUSTERS - 1) // CHUNK_CLUSTERS
    pad_c = max_rounds * CHUNK_CLUSTERS - c
    corder_p = jnp.pad(corder, ((0, 0), (0, pad_c)))
    tnear_p = jnp.pad(tnear_sorted, ((0, 0), (0, pad_c)), constant_values=INF)
    live_lane = tmaxs > tmins

    def cond(s):
        r, occ = s
        next_tn = jax.lax.dynamic_slice_in_dim(tnear_p, r * CHUNK_CLUSTERS, 1, axis=1)[:, 0]
        tile_live = jnp.any(live_lane & ~occ, axis=1) & (next_tn < INF)
        return (r < max_rounds) & jnp.any(tile_live)

    def body(s):
        r, occ = s
        cids = jax.lax.dynamic_slice_in_dim(corder_p, r * CHUNK_CLUSTERS,
                                            CHUNK_CLUSTERS, axis=1)
        p0 = cs.c_p0[cids].reshape(nt, CHUNK_CLUSTERS * k, 3)
        p1 = cs.c_p1[cids].reshape(nt, CHUNK_CLUSTERS * k, 3)
        p2 = cs.c_p2[cids].reshape(nt, CHUNK_CLUSTERS * k, 3)
        hit, _, _, _ = trimod.moller_trumbore(
            os[:, :, None, :], ds[:, :, None, :], p0[:, None], p1[:, None], p2[:, None],
            tmins[:, :, None], tmaxs[:, :, None])
        return r + 1, occ | jnp.any(hit, axis=-1)

    init = (jnp.zeros((), Int), jnp.zeros((nt, TILE), bool))
    _, occ = jax.lax.while_loop(cond, body, init)
    inv = jnp.argsort(order)
    return occ.reshape(-1)[inv].reshape(shp)
