"""Ray–triangle intersection (Möller–Trumbore), batched.

TPU-native counterpart of src/shapes/triangle.rs:74-316. The reference
uses the watertight permuted-axis test with f64 edge functions; on TPU we
use Möller–Trumbore in f32 (per the north-star spec) — branch-free,
4 cross/dot chains that fuse on the VPU. Shading-frame reconstruction
(interpolated normals, dpdu from UV deltas) follows triangle.rs:182-316.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.types import Float, INF
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


def intersect_brute(tri, o, d, t_min, t_max):
    """Brute-force all-pairs intersect: rays (N,3) × tris (T,…).

    Returns (hit_any (N,), t (N,), tri_idx (N,), b1, b2). Used for small
    scenes and as the oracle for the BVH kernels.
    """
    p0, p1, p2 = tri.corners()                        # (T, 3)
    hit, t, b1, b2 = moller_trumbore(
        o[..., None, :], d[..., None, :], p0, p1, p2,
        t_min[..., None], t_max[..., None])           # (N, T)
    best = jnp.argmin(t, axis=-1)
    take = lambda a: jnp.take_along_axis(a, best[..., None], axis=-1)[..., 0]
    return take(hit), take(t), best.astype(jnp.int32), take(b1), take(b2)


def occluded_brute(tri, o, d, t_min, t_max):
    p0, p1, p2 = tri.corners()
    hit, _, _, _ = moller_trumbore(
        o[..., None, :], d[..., None, :], p0, p1, p2,
        t_min[..., None], t_max[..., None])
    return jnp.any(hit, axis=-1)


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
    return p, ng, ns, uv, dpdu


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
