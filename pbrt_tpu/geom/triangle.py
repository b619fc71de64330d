"""Ray–triangle intersection (Möller–Trumbore), batched.

TPU-native counterpart of src/shapes/triangle.rs:74-316. The reference
uses the watertight permuted-axis test with f64 edge functions; on TPU we
use Möller–Trumbore in f32 (per the north-star spec) — branch-free,
4 cross/dot chains that fuse on the VPU. Shading-frame reconstruction
(interpolated normals, dpdu from UV deltas) follows triangle.rs:182-316.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.types import Float, Int, INF
from ..core import vecmath as vm


def moller_trumbore(o, d, p0, p1, p2, t_min, t_max):
    """Single ray vs single triangle, all args broadcastable.

    Returns (hit, t, b1, b2): b1/b2 barycentrics of p1/p2.
    """
    e1 = p1 - p0
    e2 = p2 - p0
    pv = vm.cross(d, e2)
    det = vm.dot(e1, pv)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    tv = o - p0
    b1 = vm.dot(tv, pv) * inv_det
    qv = vm.cross(tv, e1)
    b2 = vm.dot(d, qv) * inv_det
    t = vm.dot(e2, qv) * inv_det
    hit = (jnp.abs(det) > 1e-12) & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0) \
        & (t > t_min) & (t < t_max)
    return hit, jnp.where(hit, t, INF), b1, b2


# Above this many ray×tri pairs the all-pairs test is evaluated in
# triangle chunks so HLO temps stay bounded (~chunk × N × 4B each).
_BRUTE_PAIR_BUDGET = 128 * 1024 * 1024


def _tri_chunk(n_rays, n_tris):
    n_lanes = max(int(np.prod(n_rays)) if not isinstance(n_rays, int) else n_rays, 1)
    chunk = max(_BRUTE_PAIR_BUDGET // max(n_lanes, 1), 256)
    return min(chunk, n_tris)


def _padded_corners(tri, chunk):
    """Corner arrays padded to a chunk multiple with degenerate (never-
    hit) triangles, reshaped to (n_chunks, chunk, 3)."""
    p0a, p1a, p2a = tri.corners()
    t_count = p0a.shape[0]
    n_chunks = max((t_count + chunk - 1) // chunk, 1)
    pad = n_chunks * chunk - t_count
    pad3 = ((0, pad), (0, 0))

    def prep(a):
        return jnp.pad(a, pad3).reshape(n_chunks, chunk, 3)

    return prep(p0a), prep(p1a), prep(p2a), n_chunks


def intersect_brute(tri, o, d, t_min, t_max):
    """Brute-force all-pairs intersect: rays (N,3) × tris (T,…), chunked
    over triangles with a sequential `fori_loop` so only one chunk's
    temporaries are ever live (an unrolled python loop lets the XLA
    scheduler overlap every chunk and OOM).

    Returns (hit_any (N,), t (N,), tri_idx (N,), b1, b2). Used for small
    scenes and as the oracle for the accelerated tracers.
    """
    import jax
    n = o.shape[:-1]
    t_count = tri.count
    chunk = _tri_chunk(n, t_count)
    p0c, p1c, p2c, n_chunks = _padded_corners(tri, chunk)

    def body(ci, carry):
        any_hit, best_t, best_i, best_b1, best_b2 = carry
        p0 = p0c[ci]
        p1 = p1c[ci]
        p2 = p2c[ci]
        hit, t, b1, b2 = moller_trumbore(
            o[..., None, :], d[..., None, :], p0, p1, p2,
            t_min[..., None], best_t[..., None])       # (N, chunk)
        j = jnp.argmin(t, axis=-1)
        take_ = lambda a: jnp.take_along_axis(a, j[..., None], axis=-1)[..., 0]
        tj = take_(t)
        upd = take_(hit) & (tj < best_t)
        return (any_hit | upd,
                jnp.where(upd, tj, best_t),
                jnp.where(upd, j.astype(jnp.int32) + ci * chunk, best_i),
                jnp.where(upd, take_(b1), best_b1),
                jnp.where(upd, take_(b2), best_b2))

    init = (jnp.zeros(n, bool),
            jnp.asarray(t_max, jnp.float32) * jnp.ones(n, jnp.float32),
            jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32))
    if n_chunks == 1:
        out = body(0, init)
    else:
        out = jax.lax.fori_loop(0, n_chunks, body, init)
    any_hit, best_t, best_i, best_b1, best_b2 = out
    return any_hit, jnp.where(any_hit, best_t, INF), best_i, best_b1, best_b2


def occluded_brute(tri, o, d, t_min, t_max):
    import jax
    n = o.shape[:-1]
    t_count = tri.count
    chunk = _tri_chunk(n, t_count)
    p0c, p1c, p2c, n_chunks = _padded_corners(tri, chunk)

    def body(ci, occ):
        hit, _, _, _ = moller_trumbore(
            o[..., None, :], d[..., None, :], p0c[ci], p1c[ci], p2c[ci],
            t_min[..., None], t_max[..., None])
        return occ | jnp.any(hit, axis=-1)

    init = jnp.zeros(n, bool)
    if n_chunks == 1:
        return body(0, init)
    return jax.lax.fori_loop(0, n_chunks, body, init)


def shading_from_rec(tri, tri_idx, b1, b2):
    """Hit shading data via ONE packed-record gather (geom/types.py
    shade_rec layout) — the TPU-efficient form of shading_geometry.
    Returns (p, ng, ns, uv, dpdu, material_id, light_id)."""
    r = tri.shade_rec[tri_idx]                      # (N, 28) — THE gather
    p0, p1, p2 = r[..., 0:3], r[..., 3:6], r[..., 6:9]
    uv0, uv1, uv2 = r[..., 9:11], r[..., 11:13], r[..., 13:15]
    n0, n1, n2 = r[..., 15:18], r[..., 18:21], r[..., 21:24]
    b0 = 1.0 - b1 - b2
    p = b0[..., None] * p0 + b1[..., None] * p1 + b2[..., None] * p2
    ng = vm.normalize(vm.cross(p1 - p0, p2 - p0))
    uv = b0[..., None] * uv0 + b1[..., None] * uv1 + b2[..., None] * uv2

    duv02 = uv0 - uv2
    duv12 = uv1 - uv2
    dp02 = p0 - p2
    dp12 = p1 - p2
    det = duv02[..., 0] * duv12[..., 1] - duv02[..., 1] * duv12[..., 0]
    inv_det = jnp.where(jnp.abs(det) > 1e-10, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    dpdu = (duv12[..., 1:2] * dp02 - duv02[..., 1:2] * dp12) * inv_det[..., None]
    degenerate = jnp.abs(det) <= 1e-10
    fallback, _ = vm.coordinate_system(ng)
    dpdu = jnp.where(degenerate[..., None], fallback, vm.normalize(dpdu))

    ns_interp = b0[..., None] * n0 + b1[..., None] * n1 + b2[..., None] * n2
    has_ns = (r[..., 24] > 0.5) & (vm.length_squared(ns_interp) > 1e-12)
    ns = jnp.where(has_ns[..., None], vm.normalize(ns_interp), ng)
    ng = vm.face_forward(ng, ns)
    dpdu = vm.normalize(dpdu - vm.dot(dpdu, ns)[..., None] * ns)
    uv_scale = _uv_scale(det, p1 - p0, p2 - p0)
    return (p, ng, ns, uv, dpdu, uv_scale,
            r[..., 25].astype(Int), r[..., 26].astype(Int))


def _uv_scale(uv_det, e1, e2):
    """uv units per world unit: sqrt(uv_area / world_area) of the
    triangle parametrization (|uv_det| = 2·uv_area)."""
    world2 = vm.length(vm.cross(e1, e2))        # = 2·world_area
    return jnp.sqrt(jnp.abs(uv_det) / jnp.maximum(world2, 1e-20))


def shading_geometry(tri, o, d, tri_idx, t, b1, b2):
    """Reconstruct hit point/normals/uv/dpdu for chosen triangles
    (triangle.rs:182-316 semantics, vectorised)."""
    idx = tri.indices[tri_idx]                      # (N, 3)
    p0 = tri.positions[idx[..., 0]]
    p1 = tri.positions[idx[..., 1]]
    p2 = tri.positions[idx[..., 2]]
    b0 = 1.0 - b1 - b2
    p = b0[..., None] * p0 + b1[..., None] * p1 + b2[..., None] * p2
    ng = vm.normalize(vm.cross(p1 - p0, p2 - p0))

    uv0 = tri.uvs[idx[..., 0]]
    uv1 = tri.uvs[idx[..., 1]]
    uv2 = tri.uvs[idx[..., 2]]
    uv = b0[..., None] * uv0 + b1[..., None] * uv1 + b2[..., None] * uv2

    # dpdu from the UV parameterisation (triangle.rs:217-247)
    duv02 = uv0 - uv2
    duv12 = uv1 - uv2
    dp02 = p0 - p2
    dp12 = p1 - p2
    det = duv02[..., 0] * duv12[..., 1] - duv02[..., 1] * duv12[..., 0]
    inv_det = jnp.where(jnp.abs(det) > 1e-10, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    dpdu = (duv12[..., 1:2] * dp02 - duv02[..., 1:2] * dp12) * inv_det[..., None]
    degenerate = jnp.abs(det) <= 1e-10
    fallback, _ = vm.coordinate_system(ng)
    dpdu = jnp.where(degenerate[..., None], fallback, vm.normalize(dpdu))

    # shading normal: interpolate vertex normals where present
    n0 = tri.normals[idx[..., 0]]
    n1 = tri.normals[idx[..., 1]]
    n2 = tri.normals[idx[..., 2]]
    ns_interp = b0[..., None] * n0 + b1[..., None] * n1 + b2[..., None] * n2
    has_ns = tri.has_normals[tri_idx] & (vm.length_squared(ns_interp) > 1e-12)
    ns = jnp.where(has_ns[..., None], vm.normalize(ns_interp), ng)
    # orient geometric normal to the shading normal's side (triangle.rs:300)
    ng = vm.face_forward(ng, ns)
    # re-orthogonalise dpdu against ns
    dpdu = vm.normalize(dpdu - vm.dot(dpdu, ns)[..., None] * ns)
    return p, ng, ns, uv, dpdu, _uv_scale(det, p1 - p0, p2 - p0)


def triangle_area(tri):
    p0, p1, p2 = tri.corners()
    return 0.5 * vm.length(vm.cross(p1 - p0, p2 - p0))


def sample_triangles(tri, tri_idx, u2):
    """Uniform-by-area point on triangles tri_idx (shape (N,)).
    Returns (p, ng, pdf_area)."""
    idx = tri.indices[tri_idx]
    p0 = tri.positions[idx[..., 0]]
    p1 = tri.positions[idx[..., 1]]
    p2 = tri.positions[idx[..., 2]]
    su0 = jnp.sqrt(jnp.maximum(u2[..., 0], 0.0))
    b0 = 1.0 - su0
    b1 = u2[..., 1] * su0
    p = b0[..., None] * p0 + b1[..., None] * p1 + (1.0 - b0 - b1)[..., None] * p2
    n = vm.cross(p1 - p0, p2 - p0)
    area = 0.5 * vm.length(n)
    ng = vm.normalize(n)
    return p, ng, 1.0 / jnp.maximum(area, 1e-12)
