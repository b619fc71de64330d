"""Volumetric path tracer.

TPU-native counterpart of src/integrators/volpath.rs:60-236: the path
loop gains a medium-sampling step on every segment — if the medium
scatters before the surface hit, shade a phase-function event (NEE with
transmittance + HG sampling for the continuation); otherwise proceed
with the surface event, with NEE shadow rays attenuated by Tr
(handle_media estimate_direct, integrator.rs:155-195).

Scene-level medium model: one global medium (scene.media row 0) filling
the scene — BASELINE config 4's homogeneous/volumetric setup. Per-
primitive interface media are future work.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.types import Float, INF
from ..core import samplers as smp
from ..core import vecmath as vm
from ..core.spectrum import luminance
from ..core.sampling import power_heuristic
from ..core.rng import hash_combine
from ..geom import scene as scenemod
from ..lights import lights as lightsmod
from ..shade import materials as matmod
from ..shade import media as medmod
from . import common


def _medium_tr(media, o, wi, dist, key):
    if medmod.MEDIUM_GRID in media.kinds_present:
        mid = jnp.zeros(o.shape[:-1], jnp.int32)
        return medmod.grid_tr(media, mid, o, wi, dist, key)
    sigma_t = media.sigma_a[0] + media.sigma_s[0]
    return medmod.homogeneous_tr(sigma_t, dist)


def li(scene, o, d, pixel_id, sample_idx, cfg, rr_start=3):
    lights = scene.lights
    media = scene.media
    kinds = scene.materials.kinds_present
    n = pixel_id.shape
    mid0 = jnp.zeros(n, jnp.int32)

    L = jnp.zeros(o.shape, Float)
    beta = jnp.ones(o.shape, Float)
    active = jnp.ones(n, bool)
    specular_bounce = jnp.zeros(n, bool)

    for bounce in range(cfg.max_depth):
        hit = scenemod.intersect(scene, o, d)
        wo = -d
        seg_dist = jnp.where(hit.valid, hit.t, 2.0 * scene.world_radius)

        # ---- medium interaction on this segment (volpath.rs:62-90)
        u_med = smp.sample_1d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(bounce, 7))
        u_ch = smp.sample_1d(cfg.sampler, pixel_id, sample_idx,
                             smp.bounce_dim(bounce, 7) + 100)
        if medmod.MEDIUM_GRID in media.kinds_present:
            key = hash_combine(pixel_id, sample_idx, jnp.uint32(37 + bounce))
            m_sampled, m_t, m_w = medmod.grid_sample(media, mid0, o, d, seg_dist, key)
        else:
            sigma_t = media.sigma_a[0] + media.sigma_s[0]
            m_sampled, m_t, m_w = medmod.homogeneous_sample(
                sigma_t * jnp.ones(n + (3,), Float),
                media.sigma_s[0] * jnp.ones(n + (3,), Float),
                seg_dist, u_med, u_ch)
        m_sampled = m_sampled & active
        beta = jnp.where(active[..., None], beta * m_w, beta)
        p_med = o + m_t[..., None] * d

        # ---------------- medium event: NEE + phase sampling
        g = media.g[0]
        u_sel = smp.sample_1d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(bounce, 5))
        lt, pmf = common.select_light_uniform(lights, u_sel)
        u_light = smp.sample_2d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(bounce, 3))
        ls = lightsmod.sample_li(lights, scene, lt, p_med, u_light, scene.world_radius)
        ph = medmod.hg_phase(vm.dot(wo, ls["wi"]), g)
        occ = scenemod.occluded(scene, p_med, ls["wi"],
                                t_max=jnp.maximum(ls["dist"] * (1 - 1e-3), 1e-4))
        key_tr = hash_combine(pixel_id, sample_idx, jnp.uint32(91 + bounce))
        tr_sh = _medium_tr(media, p_med, ls["wi"], ls["dist"], key_tr)
        w_l = jnp.where(ls["is_delta"], 1.0, power_heuristic(1.0, ls["pdf"], 1.0, ph))
        ld_med = ls["li"] * tr_sh * (ph * w_l / jnp.maximum(ls["pdf"], 1e-12))[..., None] \
            / jnp.maximum(pmf, 1e-12)[..., None]
        vis = m_sampled & ~occ & (ls["pdf"] > 0)
        L = L + jnp.where(vis[..., None], beta * ld_med, 0.0)

        u_ph = smp.sample_2d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(bounce, 0))
        wi_med, _ph_pdf = medmod.hg_sample(d, g, u_ph)  # forward dir = d

        # ---------------- surface event (standard path logic)
        surf = active & ~m_sampled & hit.valid & (hit.material_id >= 0)
        count_emit = active & ~m_sampled & ((bounce == 0) | specular_bounce)
        le_hit = lightsmod.area_light_radiance(lights, hit.light_id, hit.ng, wo)
        le_env = lightsmod.env_radiance(lights, d)
        le = jnp.where(hit.valid[..., None], le_hit, le_env)
        L = L + jnp.where(count_emit[..., None], beta * le, 0.0)

        frame = common.shading_frame(hit, scene)
        lp = matmod.resolve(scene.materials, hit.material_id, hit.uv, hit.p,
                            scene.textures)
        u_nee_b = smp.sample_2d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(bounce, 6))
        u_nee_l = smp.sample_1d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(bounce, 2))
        ld_surf = common.estimate_direct(
            scene, lights, lp, kinds, frame, hit.p, hit.ns, hit.ng, wo,
            lt, pmf, u_light, u_nee_b, u_nee_l, surf,
            handle_media=False)
        # attenuate surface NEE by Tr along the shadow ray
        tr_surf = _medium_tr(media, hit.p, ls["wi"], ls["dist"],
                             hash_combine(pixel_id, sample_idx, jnp.uint32(121 + bounce)))
        L = L + jnp.where(surf[..., None], beta * ld_surf * tr_surf, 0.0)

        u_bsdf = smp.sample_2d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(bounce, 0))
        u_lobe = smp.sample_1d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(bounce, 2))
        wo_l = frame.to_local(wo)
        wi_l, f, pdf, spec, _trans = matmod.sample(lp, kinds, wo_l, u_lobe, u_bsdf)
        wi_surf = frame.to_world(wi_l)
        good_surf = surf & (pdf > 0.0) & (luminance(f) > 0.0)
        beta = jnp.where(good_surf[..., None],
                         beta * f * (vm.absdot(wi_surf, hit.ns) / jnp.maximum(pdf, 1e-12))[..., None],
                         beta)

        # ---------------- merge continuations
        active = m_sampled | good_surf
        specular_bounce = jnp.where(m_sampled, False, spec)
        o = jnp.where(m_sampled[..., None], p_med,
                      vm.offset_ray_origin(hit.p, hit.ng, wi_surf))
        d = jnp.where(m_sampled[..., None], wi_med, wi_surf)

        if bounce >= rr_start:
            rr_beta = vm.max_component(beta)
            q = jnp.maximum(0.05, 1.0 - rr_beta)
            u_rr = smp.sample_1d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(bounce, 4))
            survive = u_rr >= q
            beta = jnp.where((active & survive)[..., None],
                             beta / jnp.maximum(1.0 - q, 1e-6)[..., None], beta)
            active = active & survive

    return L


def make_li(cfg, rr_start=3):
    return lambda scene, o, d, pid, sid: li(scene, o, d, pid, sid, cfg, rr_start)
