"""kd-tree accelerator.

TPU-native counterpart of src/accelerators/kdtreeaccel.rs: SAH kd-tree
build (BoundEdge event sort, kdtreeaccel.rs:254+) on the host, flattened
into `KdAccelNode`-style SoA arrays (the reference's C-union node packs
split-axis/leaf flags into two words, kdtreeaccel.rs:40-70; we keep
explicit columns — TPU arrays are cheap, unions are not), and a
vectorised stackless-stack traversal mirroring geom/bvh.py's wavefront
loop. Secondary accelerator for parity and CPU validation; the cluster
tracer remains the production path (ARCHITECTURE.md axiom 5).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Float, Int, INF
from . import triangle as trimod

STACK_DEPTH = 64
MAX_PRIMS_PER_LEAF_TEST = 8


class KdTreeArrays(NamedTuple):
    axis: jnp.ndarray        # (M,) int32 split axis; 3 = leaf
    split: jnp.ndarray       # (M,) float split position
    above: jnp.ndarray       # (M,) int32 above-child index (below = i+1)
    prim_start: jnp.ndarray  # (M,) int32 into prim_ids (leaves)
    prim_count: jnp.ndarray  # (M,)
    prim_ids: jnp.ndarray    # (P,) int32 triangle ids (with duplication)
    bounds_min: jnp.ndarray  # (3,) world bounds
    bounds_max: jnp.ndarray


def build_kdtree(positions, indices, isect_cost=80.0, trav_cost=1.0,
                 empty_bonus=0.5, max_prims=4, max_depth=None):
    """Host-side SAH kd-tree build (kdtreeaccel.rs:100-410 semantics)."""
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int32).reshape(-1, 3)
    t = len(indices)
    p0 = positions[indices[:, 0]]
    p1 = positions[indices[:, 1]]
    p2 = positions[indices[:, 2]]
    pmin = np.minimum(np.minimum(p0, p1), p2)
    pmax = np.maximum(np.maximum(p0, p1), p2)
    wmin = pmin.min(0) if t else np.zeros(3, np.float32)
    wmax = pmax.max(0) if t else np.ones(3, np.float32)
    if max_depth is None:
        max_depth = int(8 + 1.3 * np.log2(max(t, 1))) if t else 1

    axis_l, split_l, above_l, pstart_l, pcount_l = [], [], [], [], []
    prim_ids = []

    def new_node():
        axis_l.append(3)
        split_l.append(0.0)
        above_l.append(0)
        pstart_l.append(0)
        pcount_l.append(0)
        return len(axis_l) - 1

    def make_leaf(ni, ids):
        axis_l[ni] = 3
        pstart_l[ni] = len(prim_ids)
        pcount_l[ni] = len(ids)
        prim_ids.extend(ids)

    def build(ids, bmin, bmax, depth, bad_refines):
        ni = new_node()
        if len(ids) <= max_prims or (depth >= max_depth
                                     and len(ids) <= MAX_PRIMS_PER_LEAF_TEST):
            make_leaf(ni, ids)
            return ni
        if depth >= max_depth + 8:   # hard stop even if oversized
            make_leaf(ni, ids[:MAX_PRIMS_PER_LEAF_TEST * 4])
            return ni
        # SAH over edge events on the longest axes (retry order)
        d = bmax - bmin
        total_sa = 2 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])
        inv_sa = 1.0 / max(total_sa, 1e-12)
        old_cost = isect_cost * len(ids)
        best = None
        for ax in np.argsort(-d):
            lo = pmin[ids, ax]
            hi = pmax[ids, ax]
            # events: (pos, is_end)
            pos = np.concatenate([lo, hi])
            typ = np.concatenate([np.zeros(len(ids)), np.ones(len(ids))])
            order = np.lexsort((typ, pos))
            pos_s, typ_s = pos[order], typ[order]
            n_below, n_above = 0, len(ids)
            for k in range(len(pos_s)):
                if typ_s[k] == 1:
                    n_above -= 1
                p_split = pos_s[k]
                if bmin[ax] < p_split < bmax[ax]:
                    o = [0, 1, 2]
                    o.remove(ax)
                    a0, a1 = o
                    below_sa = 2 * (d[a0] * d[a1] + (p_split - bmin[ax]) * (d[a0] + d[a1]))
                    above_sa = 2 * (d[a0] * d[a1] + (bmax[ax] - p_split) * (d[a0] + d[a1]))
                    pb = below_sa * inv_sa
                    pa = above_sa * inv_sa
                    eb = empty_bonus if (n_above == 0 or n_below == 0) else 0.0
                    cost = trav_cost + isect_cost * (1 - eb) * (pb * n_below + pa * n_above)
                    if best is None or cost < best[0]:
                        best = (cost, ax, p_split)
                if typ_s[k] == 0:
                    n_below += 1
            if best is not None:
                break
        if best is None or (best[0] > 4 * old_cost and len(ids) < 16) or bad_refines == 3:
            if len(ids) > MAX_PRIMS_PER_LEAF_TEST:
                # oversized fallback leaf → spatial median split so the
                # bounded leaf-test unroll stays correct
                ax = int(np.argmax(d))
                p_split = float(np.median(0.5 * (pmin[ids, ax] + pmax[ids, ax])))
                if bmin[ax] < p_split < bmax[ax]:
                    best = (old_cost, ax, p_split)
                else:
                    make_leaf(ni, ids)
                    return ni
            else:
                make_leaf(ni, ids)
                return ni
        cost, ax, p_split = best
        if cost > old_cost:
            bad_refines += 1
        below_ids = [i for i in ids if pmin[i, ax] < p_split]
        above_ids = [i for i in ids if pmax[i, ax] > p_split]
        axis_l[ni] = int(ax)
        split_l[ni] = float(p_split)
        bmax_b = bmax.copy()
        bmax_b[ax] = p_split
        bmin_a = bmin.copy()
        bmin_a[ax] = p_split
        build(below_ids, bmin, bmax_b, depth + 1, bad_refines)
        above = build(above_ids, bmin_a, bmax, depth + 1, bad_refines)
        above_l[ni] = above
        return ni

    import sys
    lim = sys.getrecursionlimit()
    sys.setrecursionlimit(max(lim, 10000))
    try:
        if t:
            build(list(range(t)), wmin.copy(), wmax.copy(), 0, 0)
        else:
            make_leaf(new_node(), [])
    finally:
        sys.setrecursionlimit(lim)

    return KdTreeArrays(
        axis=jnp.asarray(np.array(axis_l, np.int32)),
        split=jnp.asarray(np.array(split_l, np.float32)),
        above=jnp.asarray(np.array(above_l, np.int32)),
        prim_start=jnp.asarray(np.array(pstart_l, np.int32)),
        prim_count=jnp.asarray(np.array(pcount_l, np.int32)),
        prim_ids=jnp.asarray(np.array(prim_ids if prim_ids else [0], np.int32)),
        bounds_min=jnp.asarray(wmin), bounds_max=jnp.asarray(wmax))


def traverse_closest(kd: KdTreeArrays, tri, o, d, t_min, t_max):
    """Vectorised kd traversal with per-lane (node, t-range) stacks
    (kdtreeaccel.rs:419+ semantics). Returns (hit, t, idx, b1, b2)."""
    n = o.shape[:-1]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                            jnp.where(d < 0, -1e-12, 1e-12), d)
    # clip to world bounds
    t0w = (kd.bounds_min - o) * inv_d
    t1w = (kd.bounds_max - o) * inv_d
    tn = jnp.maximum(jnp.max(jnp.minimum(t0w, t1w), axis=-1), t_min)
    tf = jnp.minimum(jnp.min(jnp.maximum(t0w, t1w), axis=-1), t_max)
    alive0 = tn <= tf

    p0a, p1a, p2a = tri.corners()
    slot_iota = jax.lax.broadcasted_iota(Int, n + (STACK_DEPTH,), len(n))

    state = dict(
        cur=jnp.where(alive0, 0, -1),
        cur_tmin=tn, cur_tmax=tf,
        sp=jnp.zeros(n, Int),
        st_node=jnp.zeros(n + (STACK_DEPTH,), Int),
        st_tmin=jnp.zeros(n + (STACK_DEPTH,), Float),
        st_tmax=jnp.zeros(n + (STACK_DEPTH,), Float),
        best_t=jnp.asarray(t_max, Float) * jnp.ones(n, Float),
        best_i=jnp.zeros(n, Int), b1=jnp.zeros(n, Float), b2=jnp.zeros(n, Float),
        hit=jnp.zeros(n, bool))

    def cond(s):
        return jnp.any(s["cur"] >= 0)

    def body(s):
        ci = jnp.maximum(s["cur"], 0)
        active = s["cur"] >= 0
        ax = kd.axis[ci]
        is_leaf = ax == 3

        # ---- leaf: test primitives (bounded unroll)
        best_t, best_i, b1b, b2b, hitb = (s["best_t"], s["best_i"], s["b1"], s["b2"], s["hit"])
        start = kd.prim_start[ci]
        count = kd.prim_count[ci]
        for k in range(MAX_PRIMS_PER_LEAF_TEST):
            ok_k = active & is_leaf & (k < count)
            pid = kd.prim_ids[jnp.clip(start + k, 0, kd.prim_ids.shape[0] - 1)]
            h, tt, bb1, bb2 = trimod.moller_trumbore(
                o, d, p0a[pid], p1a[pid], p2a[pid], t_min, best_t)
            take = ok_k & h
            best_t = jnp.where(take, tt, best_t)
            best_i = jnp.where(take, pid, best_i)
            b1b = jnp.where(take, bb1, b1b)
            b2b = jnp.where(take, bb2, b2b)
            hitb = hitb | take

        # ---- interior: descend
        axc = jnp.clip(ax, 0, 2)
        oa = jnp.take_along_axis(o, axc[..., None], axis=-1)[..., 0]
        ia = jnp.take_along_axis(inv_d, axc[..., None], axis=-1)[..., 0]
        t_plane = (kd.split[ci] - oa) * ia
        below_first = (oa < kd.split[ci]) | ((oa == kd.split[ci]) & (ia <= 0))
        first = jnp.where(below_first, ci + 1, kd.above[ci])
        second = jnp.where(below_first, kd.above[ci], ci + 1)
        only_first = (t_plane > s["cur_tmax"]) | (t_plane <= 0)
        # first-child check takes priority (kdtreeaccel.rs traversal:
        # tPlane <= 0 means the plane is behind — descend first only)
        only_second = (t_plane < s["cur_tmin"]) & ~only_first
        # push second (with [t_plane, tmax]) when both children needed
        push = active & ~is_leaf & ~only_first & ~only_second
        sel = slot_iota == s["sp"][..., None]
        st_node = jnp.where(sel & push[..., None], second[..., None], s["st_node"])
        st_tmin = jnp.where(sel & push[..., None], t_plane[..., None], s["st_tmin"])
        st_tmax = jnp.where(sel & push[..., None], s["cur_tmax"][..., None], s["st_tmax"])
        sp = s["sp"] + push.astype(Int)

        next_interior = jnp.where(only_second, second, first)
        next_tmax = jnp.where(push, jnp.minimum(t_plane, s["cur_tmax"]), s["cur_tmax"])
        next_tmin = jnp.where(only_second, jnp.maximum(t_plane, s["cur_tmin"]), s["cur_tmin"])

        # pop when at a leaf (after testing) — with early out if best_t < stack tmin
        need_pop = active & is_leaf
        can_pop = sp > 0
        sel_top = slot_iota == (sp - 1)[..., None]
        top_node = jnp.sum(jnp.where(sel_top, st_node, 0), axis=-1)
        top_tmin = jnp.sum(jnp.where(sel_top, st_tmin, 0.0), axis=-1)
        top_tmax = jnp.sum(jnp.where(sel_top, st_tmax, 0.0), axis=-1)
        do_pop = need_pop & can_pop & (top_tmin <= best_t)
        done = need_pop & (~can_pop | (can_pop & (top_tmin > best_t) & False))
        # (skipping early-out on stack tmin>best_t would need repeated
        # pops; we conservatively continue — correct, slightly slower)
        do_pop = need_pop & can_pop
        done = need_pop & ~can_pop

        cur = jnp.where(active & ~is_leaf, next_interior,
                        jnp.where(do_pop, top_node, -1))
        cur = jnp.where(active, cur, -1)
        cur_tmin = jnp.where(do_pop, top_tmin, next_tmin)
        cur_tmax = jnp.where(do_pop, top_tmax, next_tmax)
        sp = jnp.where(do_pop, sp - 1, sp)
        return dict(cur=cur, cur_tmin=cur_tmin, cur_tmax=cur_tmax, sp=sp,
                    st_node=st_node, st_tmin=st_tmin, st_tmax=st_tmax,
                    best_t=best_t, best_i=best_i, b1=b1b, b2=b2b, hit=hitb)

    out = jax.lax.while_loop(cond, body, state)
    return (out["hit"], jnp.where(out["hit"], out["best_t"], INF),
            out["best_i"], out["b1"], out["b2"])
