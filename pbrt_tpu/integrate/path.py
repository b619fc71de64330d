"""Unidirectional path tracer — the flagship wavefront pipeline.

TPU-native counterpart of src/integrators/path.rs:65-213. The reference's
recursive `li` with trait dispatch becomes a statically-unrolled bounce
loop over masked SoA lanes:

    for bounce < max_depth:
        intersect → emitted/escaped (specular-or-first only)
        → NEE (MIS, one light) → BSDF sample → throughput update
        → Russian roulette (after bounce 3, eta-scaled) → respawn

Lane liveness is a mask (`active`); dead lanes ride along at zero cost to
correctness (stream compaction is a perf optimisation applied at the
kernel layer, not here). Replaying is exact because every random number
is counter-indexed by (pixel, sample, dim) — this is what makes
path-replay backprop (diff/) work.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.types import Float
from ..core import samplers as smp
from ..core import vecmath as vm
from ..core.spectrum import luminance
from ..geom import scene as scenemod
from ..lights import lights as lightsmod
from ..shade import materials as matmod
from . import common


def default_provider(cfg, pixel_id, sample_idx):
    """Sample provider: (bounce, slot) → uniforms from the stateless
    sampler. MLT substitutes a primary-sample-vector provider (mlt.py)."""
    def sample1(bounce, slot):
        return smp.sample_1d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(bounce, slot))

    def sample2(bounce, slot):
        return smp.sample_2d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(bounce, slot))

    return sample1, sample2


def li(scene, o, d, pixel_id, sample_idx, cfg, rr_start=3, return_stats=False,
       provider=None):
    lights = scene.lights
    kinds = scene.materials.kinds_present
    n = pixel_id.shape
    sample1, sample2 = provider if provider is not None else \
        default_provider(cfg, pixel_id, sample_idx)

    L = jnp.zeros(o.shape, Float)
    beta = jnp.ones(o.shape, Float)
    active = jnp.ones(n, bool)
    specular_bounce = jnp.zeros(n, bool)
    eta_scale = jnp.ones(n, Float)
    rays_traced = jnp.zeros((), Float)

    for bounce in range(cfg.max_depth):
        # closest-hit for every live lane + 2 NEE rays (shadow + BSDF
        # MIS ray inside estimate_direct) for lanes that reach shading.
        rays_traced = rays_traced + jnp.sum(active.astype(Float))
        hit = scenemod.intersect(scene, o, d)
        wo = -d

        # Emitted radiance: only on the first bounce or after a specular
        # bounce (other cases are covered by NEE; path.rs:80-92).
        count_emit = active & ((bounce == 0) | specular_bounce)
        le_hit = lightsmod.area_light_radiance(lights, hit.light_id, hit.ng, wo)
        le_env = lightsmod.env_radiance(lights, d)
        le = jnp.where(hit.valid[..., None], le_hit, le_env)
        L = L + jnp.where(count_emit[..., None], beta * le, 0.0)

        active = active & hit.valid & (hit.material_id >= 0)

        frame = common.shading_frame(hit)
        lp = matmod.resolve(scene.materials, hit.material_id, hit.uv, hit.p,
                            scene.textures)

        # --- NEE with MIS (path.rs:100-126 → integrator.rs:92-266)
        u_sel = sample1(bounce, 5)
        lt, pmf = common.select_light(scene, cfg.light_strategy, hit.p, u_sel)
        u_light = sample2(bounce, 3)
        u_nee_bsdf = sample2(bounce, 6)
        u_nee_lobe = sample1(bounce, 2)
        ld = common.estimate_direct(
            scene, lights, lp, kinds, frame, hit.p, hit.ns, hit.ng, wo,
            lt, pmf, u_light, u_nee_bsdf, u_nee_lobe, active)
        L = L + jnp.where(active[..., None], beta * ld, 0.0)
        rays_traced = rays_traced + 2.0 * jnp.sum(active.astype(Float))

        # --- BSDF sampling for the continuation ray (path.rs:127-152)
        u_bsdf = sample2(bounce, 0)
        u_lobe = sample1(bounce, 2)
        wo_l = frame.to_local(wo)
        wi_l, f, pdf, spec, trans = matmod.sample(lp, kinds, wo_l, u_lobe, u_bsdf)
        wi = frame.to_world(wi_l)
        good = active & (pdf > 0.0) & (luminance(f) > 0.0)
        beta = jnp.where(good[..., None],
                         beta * f * (vm.absdot(wi, hit.ns) / jnp.maximum(pdf, 1e-12))[..., None],
                         beta)
        active = good
        specular_bounce = spec
        eta_scale = jnp.where(trans, eta_scale * matmod.eta_scale_on_transmit(lp, wo_l[..., 2]),
                              eta_scale)

        # --- Russian roulette (path.rs:200-207)
        if bounce >= rr_start:
            rr_beta = vm.max_component(beta * eta_scale[..., None])
            q = jnp.maximum(0.05, 1.0 - rr_beta)
            u_rr = sample1(bounce, 4)
            survive = u_rr >= q
            beta = jnp.where((active & survive)[..., None],
                             beta / jnp.maximum(1.0 - q, 1e-6)[..., None], beta)
            active = active & survive

        o = vm.offset_ray_origin(hit.p, hit.ng, wi)
        d = wi

    if return_stats:
        return L, {"rays_traced": rays_traced}
    return L


def make_li(cfg, rr_start=3):
    return lambda scene, o, d, pid, sid: li(scene, o, d, pid, sid, cfg, rr_start)
