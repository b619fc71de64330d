"""Shared integrator machinery: shading frames, MIS next-event
estimation, light selection.

TPU-native counterpart of src/core/integrator.rs helpers:
`uniform_sample_one_light` (integrator.rs:92-134) and `estimate_direct`
(integrator.rs:136-266 — MIS NEE with the power heuristic). Everything is
masked wavefront math; the reference's NaN-check bug (integrator.rs:455)
and inverted visibility (light.rs:126) are not reproduced.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.types import Float, Int, INF, SHADOW_EPS
from ..core import vecmath as vm
from ..core.sampling import power_heuristic
from ..core.spectrum import luminance
from ..geom import scene as scenemod
from ..lights import lights as lightsmod
from ..shade import materials as matmod
from ..shade import bxdf


class Frame(NamedTuple):
    t: jnp.ndarray
    b: jnp.ndarray
    n: jnp.ndarray

    def to_local(self, v):
        return vm.to_local(v, self.t, self.b, self.n)

    def to_world(self, v):
        return vm.to_world(v, self.t, self.b, self.n)


def shading_frame(hit, scene=None):
    """Orthonormal shading frame; applies bump mapping when the scene's
    materials declare bump textures (material.rs:16-55 — displacement via
    finite differences of the bump texture along u/v)."""
    t = hit.dpdu
    n = hit.ns
    if scene is not None and scene.textures is not None and \
            getattr(scene.materials, "has_bump", False):
        from ..shade import textures as texmod
        mats = scene.materials
        mid = jnp.maximum(hit.material_id, 0)
        btex = mats.bump_tex[mid]
        b_axis = vm.normalize(vm.cross(n, t))
        du = 5e-4
        h0 = texmod.evaluate(scene.textures, btex, hit.uv, hit.p)[..., 0]
        hu = texmod.evaluate(scene.textures, btex, hit.uv + jnp.array([du, 0.0]),
                             hit.p + du * t)[..., 0]
        hv = texmod.evaluate(scene.textures, btex, hit.uv + jnp.array([0.0, du]),
                             hit.p + du * b_axis)[..., 0]
        dhdu = (hu - h0) / du
        dhdv = (hv - h0) / du
        n_b = vm.normalize(n - dhdu[..., None] * t - dhdv[..., None] * b_axis)
        n = jnp.where((btex >= 0)[..., None], n_b, n)
        t = vm.normalize(t - vm.dot(t, n)[..., None] * n)
    b = vm.normalize(vm.cross(n, t))
    t = vm.cross(b, n)
    return Frame(t, b, n)


def select_light_uniform(lights, u):
    """(light index, pmf) — UniformSampleOne (integrator.rs:92-110)."""
    n = lights.count
    idx = jnp.minimum((u * n).astype(jnp.int32), n - 1)
    return idx, jnp.full(u.shape, 1.0 / n, Float)


def select_light_power(lights, power_dist, u):
    """Power-weighted selection (lightdistrib.rs Power)."""
    idx, pmf, _ = power_dist.sample_discrete(u)
    return idx.astype(jnp.int32), pmf


def select_light(scene, strategy, p, u, world_radius=None):
    """Strategy dispatch (lightdistrib.rs:222-232 factory):
    uniform | power | spatial."""
    lights = scene.lights
    if strategy == "power":
        from ..lights.distrib import power_distribution
        dist = power_distribution(lights, scene.world_radius)
        return select_light_power(lights, dist, u)
    if strategy == "spatial" and scene.light_distrib is not None:
        from ..lights.distrib import spatial_lookup_sample
        return spatial_lookup_sample(scene.light_distrib, p, u)
    return select_light_uniform(lights, u)


def select_light_pmf(scene, strategy, p, light_id):
    """pmf the selection strategy assigns to `light_id` at shading point
    `p` — the selection half of the NEE density, needed to MIS-weight
    emission found by BSDF-sampled rays (integrator.rs:216-262 analog
    under sample reuse)."""
    lights = scene.lights
    nl = max(int(lights.count), 1)
    lid = jnp.maximum(light_id, 0)
    if strategy == "power":
        from ..lights.distrib import power_distribution
        dist = power_distribution(lights, scene.world_radius)
        return dist.func[lid] / jnp.maximum(dist.func_int * nl, 1e-20)
    if strategy == "spatial" and scene.light_distrib is not None:
        from ..core.types import clamp
        sd = scene.light_distrib
        nz, ny, nx = sd.resolution
        q = clamp((p - sd.world_min) / sd.world_ext, 0.0, 0.9999)
        xi = (q[..., 0] * nx).astype(Int)
        yi = (q[..., 1] * ny).astype(Int)
        zi = (q[..., 2] * nz).astype(Int)
        vi = (zi * ny + yi) * nx + xi
        func = sd.grid_func[vi]
        return jnp.take_along_axis(func, lid[..., None], axis=-1)[..., 0] \
            / jnp.maximum(jnp.sum(func, axis=-1), 1e-20)
    return jnp.full(jnp.shape(light_id), 1.0 / nl, Float)


def nee_light_defer(scene, lights, lp, kinds_present, frame, p, ns, ng, wo,
                    lt, u_light, active):
    """Light-sampling half of estimate_direct WITHOUT the shadow trace
    (integrator.rs:155-195 split at the visibility test). Returns
    (contrib (N,3) — unoccluded candidate, NOT pmf-divided,
     o_sh, wi, tmax_sh, usable, ls); the caller traces the shadow ray —
    possibly fused into the bounce's extension-ray launch
    (scenemod.intersect_occluded) — and applies contrib·~occ."""
    ls = lightsmod.sample_li(lights, scene, lt, p, u_light, scene.world_radius)
    wi = ls["wi"]
    wo_l = frame.to_local(wo)
    wi_l = frame.to_local(wi)
    f = matmod.evaluate_f(lp, kinds_present, wo_l, wi_l) * vm.absdot(wi, ns)[..., None]
    scat_pdf = matmod.pdf(lp, kinds_present, wo_l, wi_l)
    usable = active & (ls["pdf"] > 0.0) & (luminance(ls["li"]) > 0.0) & (luminance(f) > 0.0)
    o_sh = vm.offset_ray_origin(p, ng, wi)
    tmax_sh = jnp.maximum(ls["dist"] * (1.0 - 1e-3), SHADOW_EPS)
    w_l = jnp.where(ls["is_delta"], 1.0, power_heuristic(1.0, ls["pdf"], 1.0, scat_pdf))
    contrib = f * ls["li"] * (w_l / jnp.maximum(ls["pdf"], 1e-12))[..., None]
    contrib = jnp.where(usable[..., None], contrib, 0.0)
    return contrib, o_sh, wi, tmax_sh, usable, ls


def nee_light_part(scene, lights, lp, kinds_present, frame, p, ns, ng, wo,
                   lt, u_light, active):
    """Light-sampling half of estimate_direct (integrator.rs:155-195).
    Returns (ld_light (N,3) — NOT divided by the selection pmf, ls)."""
    contrib, o_sh, wi, tmax_sh, usable, ls = nee_light_defer(
        scene, lights, lp, kinds_present, frame, p, ns, ng, wo,
        lt, u_light, active)
    occ = scenemod.occluded(scene, o_sh, wi, t_max=tmax_sh, active=usable)
    return jnp.where((usable & ~occ)[..., None], contrib, 0.0), ls


def nee_bsdf_ray(lp, kinds_present, frame, p, ns, ng, wo, u_lobe, u_bsdf):
    """Sample the MIS-BSDF ray (integrator.rs:196-215). Returns
    (o_b, wi_b, f_b·|cos|, pdf_b, spec_b)."""
    wo_l = frame.to_local(wo)
    wi_b_l, f_b, pdf_b, spec_b, _ = matmod.sample(lp, kinds_present, wo_l, u_lobe, u_bsdf)
    wi_b = frame.to_world(wi_b_l)
    f_b = f_b * vm.absdot(wi_b, ns)[..., None]
    o_b = vm.offset_ray_origin(p, ng, wi_b)
    return o_b, wi_b, f_b, pdf_b, spec_b


def nee_bsdf_part(scene, lights, ls, lt, p, wi_b, f_b, pdf_b, spec_b, hit_b, active):
    """BSDF-sampling half of estimate_direct given the traced hit
    (integrator.rs:216-262). Returns ld_bsdf (N,3), not pmf-divided."""
    try_bsdf = active & ~ls["is_delta"] & ~spec_b & (pdf_b > 0.0) & (luminance(f_b) > 0.0)
    same_light = hit_b.valid & (hit_b.light_id == lt)
    li_surf = lightsmod.area_light_radiance(lights, hit_b.light_id, hit_b.ng, -wi_b)
    pdf_light_b = lightsmod.pdf_li_area_scene(lights, scene, lt, p, hit_b.p, hit_b.ng)
    if lights.env_index >= 0:
        is_env = lt == lights.env_index
        li_env = lightsmod.env_radiance(lights, wi_b)
        pdf_env = lightsmod.env_pdf_li(lights, wi_b)
        li_b = jnp.where((~hit_b.valid & is_env)[..., None], li_env,
                         jnp.where(same_light[..., None], li_surf, 0.0))
        pdf_light_b = jnp.where(~hit_b.valid & is_env, pdf_env,
                                jnp.where(same_light, pdf_light_b, 0.0))
        got_light = (~hit_b.valid & is_env) | same_light
    else:
        li_b = jnp.where(same_light[..., None], li_surf, 0.0)
        pdf_light_b = jnp.where(same_light, pdf_light_b, 0.0)
        got_light = same_light
    w_b = power_heuristic(1.0, pdf_b, 1.0, pdf_light_b)
    contrib_b = f_b * li_b * (w_b / jnp.maximum(pdf_b, 1e-12))[..., None]
    ok_b = try_bsdf & got_light & (pdf_light_b > 0.0)
    return jnp.where(ok_b[..., None], contrib_b, 0.0)


def estimate_direct(scene, lights, lp, kinds_present, frame, p, ns, ng, wo,
                    lt, lt_pmf, u_light, u_bsdf, u_lobe, active,
                    handle_media=False):
    """MIS direct lighting for one sampled light per lane
    (integrator.rs:136-266). Returns (N, 3) radiance (already divided by
    the light-selection pmf)."""
    n_shape = p.shape[:-1]
    ld = jnp.zeros(p.shape, Float)

    # ---- light-sampling strategy (integrator.rs:155-195)
    ls = lightsmod.sample_li(lights, scene, lt, p, u_light, scene.world_radius)
    wi = ls["wi"]
    wo_l = frame.to_local(wo)
    wi_l = frame.to_local(wi)
    f = matmod.evaluate_f(lp, kinds_present, wo_l, wi_l) * vm.absdot(wi, ns)[..., None]
    scat_pdf = matmod.pdf(lp, kinds_present, wo_l, wi_l)
    usable = active & (ls["pdf"] > 0.0) & (luminance(ls["li"]) > 0.0) & (luminance(f) > 0.0)
    # shadow ray: offset origin along ng toward wi; clip just short of the
    # light sample so we don't hit the light itself.
    o_sh = vm.offset_ray_origin(p, ng, wi)
    t_max = ls["dist"] * (1.0 - 1e-3)
    occ = scenemod.occluded(scene, o_sh, wi, t_max=jnp.maximum(t_max, SHADOW_EPS))
    vis = usable & ~occ
    w_l = jnp.where(ls["is_delta"], 1.0, power_heuristic(1.0, ls["pdf"], 1.0, scat_pdf))
    contrib = f * ls["li"] * (w_l / jnp.maximum(ls["pdf"], 1e-12))[..., None]
    ld = ld + jnp.where(vis[..., None], contrib, 0.0)

    # ---- BSDF-sampling strategy (integrator.rs:196-262)
    wi_b_l, f_b, pdf_b, spec_b, _ = matmod.sample(lp, kinds_present, wo_l, u_lobe, u_bsdf)
    wi_b = frame.to_world(wi_b_l)
    f_b = f_b * vm.absdot(wi_b, ns)[..., None]
    light_is_delta = ls["is_delta"]
    try_bsdf = active & ~light_is_delta & ~spec_b & (pdf_b > 0.0) & (luminance(f_b) > 0.0)
    o_b = vm.offset_ray_origin(p, ng, wi_b)
    hit_b = scenemod.intersect(scene, o_b, wi_b)
    same_light = hit_b.valid & (hit_b.light_id == lt)
    li_surf = lightsmod.area_light_radiance(lights, hit_b.light_id, hit_b.ng, -wi_b)
    pdf_light_b = lightsmod.pdf_li_area_scene(lights, scene, lt, p, hit_b.p, hit_b.ng)
    # escaped ray hitting the chosen infinite light
    if lights.env_index >= 0:
        is_env = lt == lights.env_index
        li_env = lightsmod.env_radiance(lights, wi_b)
        pdf_env = lightsmod.env_pdf_li(lights, wi_b)
        li_b = jnp.where((~hit_b.valid & is_env)[..., None], li_env,
                         jnp.where(same_light[..., None], li_surf, 0.0))
        pdf_light_b = jnp.where(~hit_b.valid & is_env, pdf_env,
                                jnp.where(same_light, pdf_light_b, 0.0))
        got_light = (~hit_b.valid & is_env) | same_light
    else:
        li_b = jnp.where(same_light[..., None], li_surf, 0.0)
        pdf_light_b = jnp.where(same_light, pdf_light_b, 0.0)
        got_light = same_light
    w_b = power_heuristic(1.0, pdf_b, 1.0, pdf_light_b)
    contrib_b = f_b * li_b * (w_b / jnp.maximum(pdf_b, 1e-12))[..., None]
    ok_b = try_bsdf & got_light & (pdf_light_b > 0.0)
    ld = ld + jnp.where(ok_b[..., None], contrib_b, 0.0)

    return ld / jnp.maximum(lt_pmf, 1e-12)[..., None]
