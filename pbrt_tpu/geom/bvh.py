"""BVH: host-side binned-SAH builder + device traversal.

TPU-native counterpart of src/accelerators/bvh.rs. The build (numpy; a
C++ builder drops in behind the same array contract — see
geom/native/bvh_builder.cc) mirrors the reference pipeline:
recursive binned SAH with 12 buckets (bvh.rs:273-473) flattened
depth-first into LinearBVHNode SoA arrays (bvh.rs:129-135, 774-811).

Traversal is the reference's stackless-stack loop (fixed-size per-ray
stack, dir-sign child ordering, bvh.rs:828-932) vectorised over the
wavefront: every lane carries (current node, stack, stack ptr) and a
`lax.while_loop` steps all lanes until every stack is empty. Leaf
primitive tests are a statically-unrolled Möller–Trumbore batch
(≤ MAX_LEAF_PRIMS per node, fixed at build).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Float, Int, INF
from . import triangle as trimod

MAX_LEAF_PRIMS = 4
STACK_DEPTH = 64  # matches the reference's 64-entry traversal stack (bvh.rs:840)
N_BUCKETS = 12


class BVHArrays(NamedTuple):
    """Flattened LinearBVHNode SoA (bvh.rs:129-135)."""
    bounds_min: jnp.ndarray   # (M, 3)
    bounds_max: jnp.ndarray   # (M, 3)
    right_or_prim: jnp.ndarray  # (M,) int32: interior → 2nd child; leaf → prim offset
    n_prims: jnp.ndarray      # (M,) int32: 0 → interior
    axis: jnp.ndarray         # (M,) int32 split axis
    prim_order: jnp.ndarray   # (T,) int32 — permutation of triangle ids

    @property
    def n_nodes(self):
        return self.bounds_min.shape[0]


def build_bvh(positions, indices, max_leaf=MAX_LEAF_PRIMS, method="sah"):
    """Binned-SAH build over triangles — native C++ builder when
    available (geom/native/bvh_builder.cc), numpy fallback otherwise.

    positions (V,3) float32, indices (T,3) int32 → BVHArrays.
    """
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int32).reshape(-1, 3)
    t = len(indices)
    p0 = positions[indices[:, 0]]
    p1 = positions[indices[:, 1]]
    p2 = positions[indices[:, 2]]
    prim_min = np.minimum(np.minimum(p0, p1), p2)
    prim_max = np.maximum(np.maximum(p0, p1), p2)

    if t:
        from . import native_build
        res = native_build.build_bvh_native(prim_min, prim_max, max_leaf, method)
        if res is not None:
            bmin, bmax, rp, nn, ax, order = res
            return BVHArrays(
                bounds_min=jnp.asarray(bmin), bounds_max=jnp.asarray(bmax),
                right_or_prim=jnp.asarray(rp), n_prims=jnp.asarray(nn),
                axis=jnp.asarray(ax), prim_order=jnp.asarray(order))

    centroid = 0.5 * (prim_min + prim_max)

    order = np.arange(t, dtype=np.int32)
    nodes_min, nodes_max, nodes_rp, nodes_n, nodes_ax = [], [], [], [], []

    def new_node():
        nodes_min.append(np.zeros(3, np.float32))
        nodes_max.append(np.zeros(3, np.float32))
        nodes_rp.append(0)
        nodes_n.append(0)
        nodes_ax.append(0)
        return len(nodes_n) - 1

    # iterative DFS so deep scenes don't hit the recursion limit;
    # emits nodes in the reference's depth-first order (left child
    # immediately follows its parent, bvh.rs:774-811).
    def emit(lo, hi):
        """Build subtree over order[lo:hi]; returns node index."""
        ni = new_node()
        ids = order[lo:hi]
        bmin = prim_min[ids].min(0)
        bmax = prim_max[ids].max(0)
        nodes_min[ni], nodes_max[ni] = bmin, bmax
        n = hi - lo
        if n <= max_leaf:
            nodes_rp[ni] = lo
            nodes_n[ni] = n
            return ni
        cmin = centroid[ids].min(0)
        cmax = centroid[ids].max(0)
        diag = cmax - cmin
        ax = int(np.argmax(diag))
        nodes_ax[ni] = ax
        if diag[ax] < 1e-12:
            # degenerate: split equally
            mid = lo + n // 2
        else:
            # binned SAH (bvh.rs:319-430)
            b = np.minimum((N_BUCKETS * (centroid[ids, ax] - cmin[ax]) / diag[ax]).astype(np.int32),
                           N_BUCKETS - 1)
            costs = np.full(N_BUCKETS - 1, np.inf, np.float64)
            counts = np.bincount(b, minlength=N_BUCKETS)
            # per-bucket bounds
            bk_min = np.full((N_BUCKETS, 3), np.inf, np.float32)
            bk_max = np.full((N_BUCKETS, 3), -np.inf, np.float32)
            for k in range(N_BUCKETS):
                m = b == k
                if m.any():
                    bk_min[k] = prim_min[ids[m]].min(0)
                    bk_max[k] = prim_max[ids[m]].max(0)

            def area(mn, mx):
                d = np.maximum(mx - mn, 0)
                return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])

            for k in range(N_BUCKETS - 1):
                c0, c1 = counts[:k + 1].sum(), counts[k + 1:].sum()
                if c0 == 0 or c1 == 0:
                    continue
                a0 = area(bk_min[:k + 1].min(0), bk_max[:k + 1].max(0))
                a1 = area(bk_min[k + 1:].min(0), bk_max[k + 1:].max(0))
                costs[k] = 0.125 + (c0 * a0 + c1 * a1) / max(area(bmin, bmax), 1e-12)
            best = int(np.argmin(costs))
            leaf_cost = float(n)
            if n > max_leaf or costs[best] < leaf_cost:
                sel = b <= best
                if sel.all() or not sel.any():
                    mid = lo + n // 2
                    o = np.argsort(centroid[ids, ax], kind="stable")
                    order[lo:hi] = ids[o]
                else:
                    left_ids = ids[sel]
                    right_ids = ids[~sel]
                    order[lo:lo + len(left_ids)] = left_ids
                    order[lo + len(left_ids):hi] = right_ids
                    mid = lo + len(left_ids)
            else:
                nodes_rp[ni] = lo
                nodes_n[ni] = n
                return ni
        emit(lo, mid)
        right = emit(mid, hi)
        nodes_rp[ni] = right
        return ni

    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000 + 2 * t))
    try:
        if t:
            emit(0, t)
        else:
            ni = new_node()
            nodes_n[ni] = 0
    finally:
        sys.setrecursionlimit(old_limit)

    return BVHArrays(
        bounds_min=jnp.asarray(np.stack(nodes_min)),
        bounds_max=jnp.asarray(np.stack(nodes_max)),
        right_or_prim=jnp.asarray(np.array(nodes_rp, np.int32)),
        n_prims=jnp.asarray(np.array(nodes_n, np.int32)),
        axis=jnp.asarray(np.array(nodes_ax, np.int32)),
        prim_order=jnp.asarray(order),
    )


def _slab_test(bmin, bmax, o, inv_d, t_min, t_max):
    """Bounds3f::intersect_p fast variant (geometry.rs:709-751)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(tn, axis=-1), t_min)
    t_far = jnp.minimum(jnp.min(tf, axis=-1) * 1.0001, t_max)
    return t_near <= t_far


class _TravState(NamedTuple):
    cur: jnp.ndarray      # (N,) current node or -1
    sp: jnp.ndarray       # (N,) stack pointer
    stack: jnp.ndarray    # (N, STACK_DEPTH)
    t_best: jnp.ndarray   # (N,)
    idx_best: jnp.ndarray  # (N,)
    b1: jnp.ndarray
    b2: jnp.ndarray
    hit: jnp.ndarray      # (N,) bool


def _traverse(bvh: BVHArrays, tri, o, d, t_min, t_max, any_hit):
    n = o.shape[:-1]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
    neg = (d < 0.0)
    p0a, p1a, p2a = tri.corners()

    init = _TravState(
        cur=jnp.zeros(n, Int),
        sp=jnp.zeros(n, Int),
        stack=jnp.zeros(n + (STACK_DEPTH,), Int),
        t_best=jnp.asarray(t_max, Float) * jnp.ones(n, Float),
        idx_best=jnp.zeros(n, Int),
        b1=jnp.zeros(n, Float), b2=jnp.zeros(n, Float),
        hit=jnp.zeros(n, bool))

    # stack slot index grid — pushes/pops are one-hot selects along the
    # slot axis (a TPU scatter would serialise; a 64-wide select is a
    # couple of VPU ops)
    slot_iota = jax.lax.broadcasted_iota(Int, n + (STACK_DEPTH,), len(n))

    def cond(s):
        return jnp.any(s.cur >= 0)

    def body(s):
        active = s.cur >= 0
        ci = jnp.maximum(s.cur, 0)
        bmin = bvh.bounds_min[ci]
        bmax = bvh.bounds_max[ci]
        hitbox = active & _slab_test(bmin, bmax, o, inv_d, t_min, s.t_best)
        nprims = bvh.n_prims[ci]
        rp = bvh.right_or_prim[ci]
        is_leaf = nprims > 0

        # ---- leaf: test ≤ MAX_LEAF_PRIMS triangles (static unroll)
        t_best, idx_best, b1b, b2b, hitb = s.t_best, s.idx_best, s.b1, s.b2, s.hit
        do_leaf = hitbox & is_leaf
        for k in range(MAX_LEAF_PRIMS):
            slot_ok = do_leaf & (k < nprims)
            pid = bvh.prim_order[jnp.clip(rp + k, 0, bvh.prim_order.shape[0] - 1)]
            h, t, bb1, bb2 = trimod.moller_trumbore(
                o, d, p0a[pid], p1a[pid], p2a[pid], t_min, t_best)
            take = slot_ok & h
            t_best = jnp.where(take, t, t_best)
            idx_best = jnp.where(take, pid, idx_best)
            b1b = jnp.where(take, bb1, b1b)
            b2b = jnp.where(take, bb2, b2b)
            hitb = hitb | take

        # ---- next node
        axis = bvh.axis[ci]
        go_first_right = jnp.take_along_axis(neg, axis[..., None], axis=-1)[..., 0]
        near = jnp.where(go_first_right, rp, ci + 1)
        far = jnp.where(go_first_right, ci + 1, rp)
        push = hitbox & ~is_leaf
        stack = jnp.where((slot_iota == s.sp[..., None]) & push[..., None],
                          far[..., None], s.stack)
        sp = s.sp + push.astype(Int)

        # early-out for any-hit queries
        done_early = hitb if any_hit else jnp.zeros(n, bool)

        can_pop = (sp > 0) & active & ~done_early
        popped = jnp.sum(jnp.where(slot_iota == (sp - 1)[..., None], stack, 0), axis=-1)
        cur_next = jnp.where(push & ~done_early, near,
                             jnp.where(can_pop, popped, -1))
        sp = jnp.where(push | ~can_pop, sp, sp - 1)
        sp = jnp.where(done_early, 0, sp)
        cur_next = jnp.where(active, cur_next, -1)
        return _TravState(cur_next, sp, stack, t_best, idx_best, b1b, b2b, hitb)

    out = jax.lax.while_loop(cond, body, init)
    return out


def traverse_closest(bvh, tri, o, d, t_min, t_max):
    s = _traverse(bvh, tri, o, d, t_min, t_max, any_hit=False)
    return s.hit, jnp.where(s.hit, s.t_best, INF), s.idx_best, s.b1, s.b2


def traverse_any(bvh, tri, o, d, t_min, t_max):
    s = _traverse(bvh, tri, o, d, t_min, t_max, any_hit=True)
    return s.hit
