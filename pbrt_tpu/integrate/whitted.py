"""Whitted integrator (src/integrators/whitted.rs:47-98): all-lights NEE
at each hit + specular reflect/transmit continuation only. A restriction
of the path loop: continuation rays are traced only for lanes whose BSDF
sample was a delta lobe (specular_reflect/transmit, integrator.rs:294-391)."""
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


def li(scene, o, d, pixel_id, sample_idx, cfg):
    lights = scene.lights
    kinds = scene.materials.kinds_present
    n = pixel_id.shape
    L = jnp.zeros(o.shape, Float)
    beta = jnp.ones(o.shape, Float)
    active = jnp.ones(n, bool)

    for depth in range(cfg.max_depth):
        hit = scenemod.intersect(scene, o, d)
        wo = -d
        le_hit = lightsmod.area_light_radiance(lights, hit.light_id, hit.ng, wo)
        le_env = lightsmod.env_radiance(lights, d)
        le = jnp.where(hit.valid[..., None], le_hit, le_env)
        L = L + jnp.where(active[..., None], beta * le, 0.0)
        active = active & hit.valid & (hit.material_id >= 0)

        frame = common.shading_frame(hit, scene)
        lp = matmod.resolve(scene.materials, hit.material_id, hit.uv, hit.p, scene.textures)

        # all-lights NEE (whitted.rs:60-80)
        ld = jnp.zeros(o.shape, Float)
        for l_idx in range(int(lights.count)):
            lt = jnp.full(n, l_idx, jnp.int32)
            u_light = smp.sample_2d(cfg.sampler, pixel_id, sample_idx,
                                    smp.bounce_dim(depth, 3) + 10 * l_idx)
            ls = lightsmod.sample_li(lights, scene, lt, hit.p, u_light, scene.world_radius)
            wo_l = frame.to_local(wo)
            wi_l = frame.to_local(ls["wi"])
            f = matmod.evaluate_f(lp, kinds, wo_l, wi_l) * vm.absdot(ls["wi"], hit.ns)[..., None]
            o_sh = vm.offset_ray_origin(hit.p, hit.ng, ls["wi"])
            occ = scenemod.occluded(scene, o_sh, ls["wi"],
                                    t_max=jnp.maximum(ls["dist"] * (1 - 1e-3), 1e-4))
            ok = active & ~occ & (ls["pdf"] > 0) & (luminance(f) > 0)
            ld = ld + jnp.where(ok[..., None], f * ls["li"] / jnp.maximum(ls["pdf"], 1e-12)[..., None], 0.0)
        L = L + jnp.where(active[..., None], beta * ld, 0.0)

        # specular continuation only
        u_bsdf = smp.sample_2d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(depth, 0))
        u_lobe = smp.sample_1d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(depth, 2))
        wo_l = frame.to_local(wo)
        wi_l, f, pdf, spec, _ = matmod.sample(lp, kinds, wo_l, u_lobe, u_bsdf)
        wi = frame.to_world(wi_l)
        cont = active & spec & (pdf > 0.0) & (luminance(f) > 0.0)
        beta = jnp.where(cont[..., None],
                         beta * f * (vm.absdot(wi, hit.ns) / jnp.maximum(pdf, 1e-12))[..., None],
                         beta)
        active = cont
        o = vm.offset_ray_origin(hit.p, hit.ng, wi)
        d = wi
    return L


def make_li(cfg):
    return lambda scene, o, d, pid, sid: li(scene, o, d, pid, sid, cfg)
