"""Direct-lighting integrator.

TPU-native counterpart of src/integrators/directlighting.rs: one camera
hit, emitted radiance, and MIS NEE (UniformSampleAll or UniformSampleOne,
directlighting.rs:17-127). Specular reflection/transmission recursion
(whitted-style) is in whitted.py.
"""
from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from ..core.types import Float
from ..core import samplers as smp
from ..core import vecmath as vm
from ..geom import scene as scenemod
from ..lights import lights as lightsmod
from ..shade import materials as matmod
from . import common


def li(scene, o, d, pixel_id, sample_idx, cfg, strategy="one"):
    """Radiance for primary rays. strategy: 'one' | 'all'."""
    lights = scene.lights
    hit = scenemod.intersect(scene, o, d)
    wo = -d
    # emitted radiance at the hit (le, interaction.rs:387) + env on miss
    l_emit = jnp.where(hit.valid[..., None],
                       lightsmod.area_light_radiance(lights, hit.light_id, hit.ng, wo),
                       lightsmod.env_radiance(lights, d))
    frame = common.shading_frame(hit, scene)
    lp = matmod.resolve(scene.materials, hit.material_id, hit.uv, hit.p,
                        scene.textures)
    kinds = scene.materials.kinds_present
    active = hit.valid & (hit.material_id >= 0)

    if strategy == "all":
        ld = jnp.zeros(o.shape, Float)
        for l_idx in range(int(lights.count)):
            lt = jnp.full(pixel_id.shape, l_idx, jnp.int32)
            u_light = smp.sample_2d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(0, 3))
            u_bsdf = smp.sample_2d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(0, 0))
            u_lobe = smp.sample_1d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(0, 2))
            ld = ld + common.estimate_direct(
                scene, lights, lp, kinds, frame, hit.p, hit.ns, hit.ng, wo,
                lt, jnp.ones(pixel_id.shape, Float), u_light, u_bsdf, u_lobe, active)
    else:
        u_sel = smp.sample_1d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(0, 5))
        lt, pmf = common.select_light_uniform(lights, u_sel)
        u_light = smp.sample_2d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(0, 3))
        u_bsdf = smp.sample_2d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(0, 0))
        u_lobe = smp.sample_1d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(0, 2))
        ld = common.estimate_direct(
            scene, lights, lp, kinds, frame, hit.p, hit.ns, hit.ng, wo,
            lt, pmf, u_light, u_bsdf, u_lobe, active)

    return l_emit + jnp.where(active[..., None], ld, 0.0)


def make_li(cfg, strategy="one"):
    return lambda scene, o, d, pid, sid: li(scene, o, d, pid, sid, cfg, strategy)
