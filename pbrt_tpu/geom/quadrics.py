"""Fused ray–quadric intersection kernel.

TPU-native counterpart of src/shapes/{sphere,disk,cylinder,cone,
paraboloid,hyperboloid}.rs. The reference gives each quadric its own
trait impl; here one branch-free kernel computes quadratic coefficients
per kind with where-selects (the kinds differ only in their implicit
coefficients), applies z/phi clipping with the t0→t1 retry, and returns
the full shading frame. EFloat error bounds (sphere.rs:28-80) are
replaced by f32 + conservative ray offsets.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.types import Float, INF, PI, quadratic, safe_sqrt
from ..core import vecmath as vm
from .types import (QUAD_SPHERE, QUAD_DISK, QUAD_CYLINDER, QUAD_CONE,
                    QUAD_PARABOLOID, QUAD_HYPERBOLOID)


def _transform_ray(w2o, o, d):
    ro = jnp.einsum("...ij,...j->...i", w2o[..., :3, :3], o) + w2o[..., :3, 3]
    rd = jnp.einsum("...ij,...j->...i", w2o[..., :3, :3], d)
    return ro, rd


def _phi_of(p, phi_max):
    phi = jnp.arctan2(p[..., 1], p[..., 0])
    return jnp.where(phi < 0.0, phi + 2.0 * PI, phi)


def _candidate_valid(kind, p, phi, params, is_disk_radial):
    z_min, z_max, phi_max = params[..., 1], params[..., 2], params[..., 3]
    zok = (p[..., 2] >= z_min) & (p[..., 2] <= z_max)
    zok = jnp.where(kind == QUAD_SPHERE,
                    (p[..., 2] >= z_min) & (p[..., 2] <= z_max), zok)
    phiok = phi <= phi_max
    ok = zok & phiok
    return jnp.where(kind == QUAD_DISK, is_disk_radial & phiok, ok)


def intersect_one(kind, w2o, o2w, params, o, d, t_min, t_max):
    """Intersect rays (broadcast batch) against ONE quadric each —
    `kind`/transforms/params have the same batch shape as the rays
    (callers gather per-lane quadric data). Returns
    (hit, t, p_world, ng_world, uv, dpdu_world)."""
    ro, rd = _transform_ray(w2o, o, d)
    r = params[..., 0]
    z_min, z_max, phi_max = params[..., 1], params[..., 2], params[..., 3]
    e0, e1 = params[..., 4], params[..., 5]

    ox, oy, oz = ro[..., 0], ro[..., 1], ro[..., 2]
    dx, dy, dz = rd[..., 0], rd[..., 1], rd[..., 2]

    # quadratic coefficients per kind (branch-free select)
    # sphere
    a_s = dx * dx + dy * dy + dz * dz
    b_s = 2.0 * (ox * dx + oy * dy + oz * dz)
    c_s = ox * ox + oy * oy + oz * oz - r * r
    # cylinder
    a_c = dx * dx + dy * dy
    b_c = 2.0 * (ox * dx + oy * dy)
    c_c = ox * ox + oy * oy - r * r
    # cone: k = (r / h)^2, apex at z=h (cone.rs); e0 = height h
    h = jnp.where(e0 != 0.0, e0, z_max)
    kcone = (r / jnp.maximum(h, 1e-8)) ** 2
    a_k = dx * dx + dy * dy - kcone * dz * dz
    b_k = 2.0 * (ox * dx + oy * dy - kcone * dz * (oz - h))
    c_k = ox * ox + oy * oy - kcone * (oz - h) * (oz - h)
    # paraboloid: z = zmax * (x^2+y^2)/r^2 → k (x²+y²) − z = 0, k = zmax/r²
    kpar = z_max / jnp.maximum(r * r, 1e-12)
    a_p = kpar * (dx * dx + dy * dy)
    b_p = 2.0 * kpar * (ox * dx + oy * dy) - dz
    c_p = kpar * (ox * ox + oy * oy) - oz
    # hyperboloid: ah (x²+y²) − ch z² = 1; e0 = ah, e1 = ch (host-computed)
    a_h = e0 * (dx * dx + dy * dy) - e1 * dz * dz
    b_h = 2.0 * (e0 * (ox * dx + oy * dy) - e1 * oz * dz)
    c_h = e0 * (ox * ox + oy * oy) - e1 * oz * oz - 1.0

    def sel(s, c, k, p, hb):
        return jnp.where(kind == QUAD_SPHERE, s,
               jnp.where(kind == QUAD_CYLINDER, c,
               jnp.where(kind == QUAD_CONE, k,
               jnp.where(kind == QUAD_PARABOLOID, p, hb))))

    a = sel(a_s, a_c, a_k, a_p, a_h)
    b = sel(b_s, b_c, b_k, b_p, b_h)
    c = sel(c_s, c_c, c_k, c_p, c_h)

    has, t0, t1 = quadratic(a, b, c)
    # disk: planar hit at z = e0 (disk height), radial clip [e1, r]
    t_disk = jnp.where(jnp.abs(dz) > 1e-9, (e0 - oz) / jnp.where(dz != 0.0, dz, 1.0), INF)
    is_disk = kind == QUAD_DISK
    has = jnp.where(is_disk, jnp.abs(dz) > 1e-9, has)
    t0 = jnp.where(is_disk, t_disk, t0)
    t1 = jnp.where(is_disk, INF, t1)

    def eval_at(t):
        p = ro + t[..., None] * rd
        # re-project sphere hit for robustness (sphere.rs:96-101)
        pr = p * (r / jnp.maximum(vm.length(p), 1e-12))[..., None]
        p = jnp.where((kind == QUAD_SPHERE)[..., None], pr, p)
        phi = _phi_of(p, phi_max)
        rad2 = p[..., 0] ** 2 + p[..., 1] ** 2
        disk_ok = (rad2 <= r * r) & (rad2 >= e1 * e1)
        return p, phi, _candidate_valid(kind, p, phi, params, disk_ok)

    p0c, phi0, ok0 = eval_at(t0)
    p1c, phi1, ok1 = eval_at(t1)
    in0 = has & (t0 > t_min) & (t0 < t_max) & ok0
    in1 = has & (t1 > t_min) & (t1 < t_max) & ok1
    hit = in0 | in1
    t = jnp.where(in0, t0, jnp.where(in1, t1, INF))
    p = jnp.where(in0[..., None], p0c, p1c)
    phi = jnp.where(in0, phi0, phi1)

    # object-space normal from implicit gradient
    px, py, pz = p[..., 0], p[..., 1], p[..., 2]
    n_s = p
    n_c = jnp.stack([px, py, jnp.zeros_like(pz)], axis=-1)
    n_d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], Float), p.shape)
    n_k = jnp.stack([px, py, -kcone * (pz - h)], axis=-1)
    n_p = jnp.stack([2.0 * kpar * px, 2.0 * kpar * py, -jnp.ones_like(pz)], axis=-1)
    n_h = jnp.stack([e0 * px, e0 * py, -e1 * pz], axis=-1)
    ng_obj = jnp.where((kind == QUAD_SPHERE)[..., None], n_s,
             jnp.where((kind == QUAD_DISK)[..., None], n_d,
             jnp.where((kind == QUAD_CYLINDER)[..., None], n_c,
             jnp.where((kind == QUAD_CONE)[..., None], n_k,
             jnp.where((kind == QUAD_PARABOLOID)[..., None], n_p, n_h)))))
    ng_obj = vm.normalize(ng_obj)

    # uv (sphere.rs:143-150 & friends)
    u = phi / jnp.maximum(phi_max, 1e-9)
    theta = jnp.arccos(jnp.clip(pz / jnp.maximum(r, 1e-12), -1.0, 1.0))
    tmin_s = jnp.arccos(jnp.clip(z_max / jnp.maximum(r, 1e-12), -1.0, 1.0))
    tmax_s = jnp.arccos(jnp.clip(z_min / jnp.maximum(r, 1e-12), -1.0, 1.0))
    v_s = (theta - tmin_s) / jnp.maximum(tmax_s - tmin_s, 1e-9)
    v_lin = (pz - z_min) / jnp.maximum(z_max - z_min, 1e-9)
    rad = safe_sqrt(px * px + py * py)
    v_d = 1.0 - (rad - e1) / jnp.maximum(r - e1, 1e-9)
    v = jnp.where(kind == QUAD_SPHERE, v_s, jnp.where(is_disk, v_d, v_lin))
    uv = jnp.stack([u, v], axis=-1)

    # dpdu = ∂p/∂phi direction (all these surfaces are φ-revolutions)
    dpdu_obj = jnp.stack([-phi_max * py, phi_max * px, jnp.zeros_like(pz)], axis=-1)
    dpdu_obj = jnp.where(is_disk[..., None],
                         jnp.stack([-py, px, jnp.zeros_like(pz)], axis=-1), dpdu_obj)
    small = vm.length_squared(dpdu_obj) < 1e-14
    fb, _ = vm.coordinate_system(ng_obj)
    dpdu_obj = jnp.where(small[..., None], fb, vm.normalize(dpdu_obj))

    # back to world
    p_w = jnp.einsum("...ij,...j->...i", o2w[..., :3, :3], p) + o2w[..., :3, 3]
    ng_w = vm.normalize(jnp.einsum("...ji,...j->...i", w2o[..., :3, :3], ng_obj))
    dpdu_w = vm.normalize(jnp.einsum("...ij,...j->...i", o2w[..., :3, :3], dpdu_obj))
    return hit, jnp.where(hit, t, INF), p_w, ng_w, uv, dpdu_w


def intersect_brute(quad, o, d, t_min, t_max):
    """All-pairs rays × quadrics; returns (hit, t, quad_idx, p, ng, uv, dpdu)."""
    n_q = quad.count
    hit, t, p, ng, uv, dpdu = intersect_one(
        quad.kind, quad.world_to_obj, quad.obj_to_world, quad.params,
        o[..., None, :], d[..., None, :], t_min[..., None], t_max[..., None])
    best = jnp.argmin(t, axis=-1)
    tk = lambda a: jnp.take_along_axis(a, best[..., None], axis=-1)[..., 0]
    tk3 = lambda a: jnp.take_along_axis(a, best[..., None, None], axis=-2)[..., 0, :]
    return tk(hit), tk(t), best.astype(jnp.int32), tk3(p), tk3(ng), tk3(uv), tk3(dpdu)


def occluded_brute(quad, o, d, t_min, t_max):
    hit, _, _, _, _, _ = intersect_one(
        quad.kind, quad.world_to_obj, quad.obj_to_world, quad.params,
        o[..., None, :], d[..., None, :], t_min[..., None], t_max[..., None])
    return jnp.any(hit, axis=-1)


def sphere_sample(quad, quad_idx, p_ref, u2):
    """Sample a point on sphere #quad_idx visible from p_ref — cone
    sampling when outside (sphere.rs:160-226). Returns
    (p_light, ng, pdf_solid_angle)."""
    o2w = quad.obj_to_world[quad_idx]
    center = o2w[..., :3, 3]
    radius = quad.params[quad_idx, ..., 0]
    dc = center - p_ref
    dist2 = vm.length_squared(dc)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    inside = dist2 <= radius * radius * 1.0001

    # outside: sample the visible cone
    sin2_max = jnp.clip(radius * radius / dist2, 0.0, 1.0)
    cos_max = safe_sqrt(1.0 - sin2_max)
    cos_t = (1.0 - u2[..., 0]) + u2[..., 0] * cos_max
    sin_t = safe_sqrt(1.0 - cos_t * cos_t)
    phi = 2.0 * PI * u2[..., 1]
    # distance to sample point on sphere along cone dir (pbrt v3 §14.2.3)
    ds = dist * cos_t - safe_sqrt(jnp.maximum(radius * radius - dist2 * sin_t * sin_t, 0.0))
    cos_alpha = (dist2 + radius * radius - ds * ds) / jnp.maximum(2.0 * dist * radius, 1e-12)
    sin_alpha = safe_sqrt(1.0 - cos_alpha * cos_alpha)
    wz = vm.normalize(dc)
    wx, wy = vm.coordinate_system(wz)
    n_obj = -(sin_alpha[..., None] * (jnp.cos(phi)[..., None] * wx + jnp.sin(phi)[..., None] * wy)
              + cos_alpha[..., None] * wz)
    p_cone = center + radius[..., None] * (-n_obj)
    pdf_cone = 1.0 / (2.0 * PI * jnp.maximum(1.0 - cos_max, 1e-9))

    # inside: uniform over the whole sphere, area pdf → solid-angle pdf
    z = 1.0 - 2.0 * u2[..., 0]
    rr = safe_sqrt(1.0 - z * z)
    n_in = jnp.stack([rr * jnp.cos(phi), rr * jnp.sin(phi), z], axis=-1)
    p_in = center + radius[..., None] * n_in
    wi_in = p_in - p_ref
    d2_in = jnp.maximum(vm.length_squared(wi_in), 1e-12)
    cos_l = vm.absdot(n_in, -vm.normalize(wi_in))
    area = 4.0 * PI * radius * radius
    pdf_in = d2_in / jnp.maximum(cos_l * area, 1e-12)

    p_l = jnp.where(inside[..., None], p_in, p_cone)
    ng = jnp.where(inside[..., None], n_in, -n_obj)
    pdf = jnp.where(inside, pdf_in, pdf_cone)
    return p_l, ng, pdf


def sphere_pdf(quad, quad_idx, p_ref, wi):
    """Solid-angle pdf of sphere_sample for direction wi (sphere.rs pdf2)."""
    o2w = quad.obj_to_world[quad_idx]
    center = o2w[..., :3, 3]
    radius = quad.params[quad_idx, ..., 0]
    dist2 = vm.length_squared(center - p_ref)
    sin2_max = jnp.clip(radius * radius / jnp.maximum(dist2, 1e-12), 0.0, 1.0)
    cos_max = safe_sqrt(1.0 - sin2_max)
    outside = dist2 > radius * radius
    return jnp.where(outside, 1.0 / (2.0 * PI * jnp.maximum(1.0 - cos_max, 1e-9)), 0.0)
