"""Unidirectional path tracer — the flagship wavefront pipeline.

TPU-native counterpart of src/integrators/path.rs:65-213. The reference's
recursive `li` with trait dispatch becomes a statically-unrolled bounce
loop over masked SoA lanes:

    for bounce < max_depth:
        (hit carried from the previous fused trace)
        emitted/escaped (specular-or-first only)
        → NEE light sample (shadow any-hit query)
        → MIS-BSDF ray + extension ray fused into ONE 2N-lane
          closest-hit traversal (halves tracer invocations — the
          dominant fixed cost on TPU)
        → throughput update → Russian roulette (after bounce 3)

Lane liveness is a mask; dead lanes ride along. Every random number is
counter-indexed by (pixel, sample, dim), so path replay (gradients, MLT
PSS providers) is exact.
"""
from __future__ import annotations

import jax
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


def _split_hit(hit, n):
    a = jax.tree_util.tree_map(lambda x: x[:n], hit)
    b = jax.tree_util.tree_map(lambda x: x[n:], hit)
    return a, b


def li(scene, o, d, pixel_id, sample_idx, cfg, rr_start=3, return_stats=False,
      provider=None):
    lights = scene.lights
    kinds = scene.materials.kinds_present
    shp = pixel_id.shape
    sample1, sample2 = provider if provider is not None else \
        default_provider(cfg, pixel_id, sample_idx)

    # flatten lanes so fused 2N traces concatenate on axis 0
    n = int(jnp.size(pixel_id))
    o = o.reshape(n, 3)
    d = d.reshape(n, 3)
    flat = lambda a: a.reshape((n,) + a.shape[len(shp):])

    L = jnp.zeros((n, 3), Float)
    beta = jnp.ones((n, 3), Float)
    active = jnp.ones((n,), bool)
    specular_bounce = jnp.zeros((n,), bool)
    eta_scale = jnp.ones((n,), Float)
    rays_traced = jnp.zeros((), Float)

    hit = scenemod.intersect(scene, o, d)
    rays_traced = rays_traced + n

    for bounce in range(cfg.max_depth):
        wo = -d

        # Emitted radiance: first bounce or after a specular bounce
        # (others covered by NEE; path.rs:80-92).
        count_emit = active & ((bounce == 0) | specular_bounce)
        le_hit = lightsmod.area_light_radiance(lights, hit.light_id, hit.ng, wo)
        le_env = lightsmod.env_radiance(lights, d)
        le = jnp.where(hit.valid[..., None], le_hit, le_env)
        L = L + jnp.where(count_emit[..., None], beta * le, 0.0)

        active = active & hit.valid & (hit.material_id >= 0)

        frame = common.shading_frame(hit, scene)
        lp = matmod.resolve(scene.materials, hit.material_id, hit.uv, hit.p,
                            scene.textures)

        # --- NEE light half (path.rs:100-126 → integrator.rs:155-195)
        u_sel = flat(sample1(bounce, 5))
        lt, pmf = common.select_light(scene, cfg.light_strategy, hit.p, u_sel)
        u_light = flat(sample2(bounce, 3))
        ld_light, ls = common.nee_light_part(
            scene, lights, lp, kinds, frame, hit.p, hit.ns, hit.ng, wo,
            lt, u_light, active)
        rays_traced = rays_traced + jnp.sum(active.astype(Float))

        # --- MIS-BSDF ray + extension ray, fused closest-hit
        u_nb = flat(sample2(bounce, 6))
        u_nl = flat(sample1(bounce, 2))
        o_b, wi_b, f_b, pdf_b, spec_b = common.nee_bsdf_ray(
            lp, kinds, frame, hit.p, hit.ns, hit.ng, wo, u_nl, u_nb)

        u_bsdf = flat(sample2(bounce, 0))
        u_lobe = flat(sample1(bounce, 2))
        wo_l = frame.to_local(wo)
        wi_l, f, pdf, spec, trans = matmod.sample(lp, kinds, wo_l, u_lobe, u_bsdf)
        wi = frame.to_world(wi_l)
        o_ext = vm.offset_ray_origin(hit.p, hit.ng, wi)

        last = bounce == cfg.max_depth - 1
        if last:
            hit_b = scenemod.intersect(scene, o_b, wi_b)
            hit_next = None
        else:
            hit_cat = scenemod.intersect(scene,
                                         jnp.concatenate([o_b, o_ext], axis=0),
                                         jnp.concatenate([wi_b, wi], axis=0))
            hit_b, hit_next = _split_hit(hit_cat, n)
        rays_traced = rays_traced + (1.0 + (0.0 if last else 1.0)) \
            * jnp.sum(active.astype(Float))

        ld_bsdf = common.nee_bsdf_part(scene, lights, ls, lt, hit.p,
                                       wi_b, f_b, pdf_b, spec_b, hit_b, active)
        ld = (ld_light + ld_bsdf) / jnp.maximum(pmf, 1e-12)[..., None]
        L = L + jnp.where(active[..., None], beta * ld, 0.0)

        # --- throughput update (path.rs:127-152)
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
            u_rr = flat(sample1(bounce, 4))
            survive = u_rr >= q
            beta = jnp.where((active & survive)[..., None],
                             beta / jnp.maximum(1.0 - q, 1e-6)[..., None], beta)
            active = active & survive

        o = o_ext
        d = wi
        hit = hit_next

    L = L.reshape(shp + (3,))
    if return_stats:
        return L, {"rays_traced": rays_traced}
    return L


def make_li(cfg, rr_start=3):
    return lambda scene, o, d, pid, sid: li(scene, o, d, pid, sid, cfg, rr_start)
