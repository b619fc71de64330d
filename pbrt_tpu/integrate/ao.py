"""Ambient-occlusion integrator (src/integrators/ao.rs:55-104):
one camera hit, N cosine- or uniform-hemisphere occlusion samples."""
from __future__ import annotations

import jax.numpy as jnp

from ..core.types import Float, PI, INV_PI
from ..core import samplers as smp
from ..core import vecmath as vm
from ..core.sampling import cosine_sample_hemisphere, uniform_sample_hemisphere
from ..geom import scene as scenemod
from . import common


def li(scene, o, d, pixel_id, sample_idx, cfg, cos_sample=True, n_samples=4):
    hit = scenemod.intersect(scene, o, d)
    frame = common.shading_frame(hit)
    active = hit.valid
    acc = jnp.zeros(pixel_id.shape, Float)
    for s in range(n_samples):
        u = smp.sample_2d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(0, 0) + 2 * s)
        if cos_sample:
            wi_l = cosine_sample_hemisphere(u)
            pdf = jnp.maximum(wi_l[..., 2] * INV_PI, 1e-8)
        else:
            wi_l = uniform_sample_hemisphere(u)
            pdf = jnp.full(u.shape[:-1], 1.0 / (2.0 * PI), Float)
        wi = frame.to_world(wi_l)
        o_sh = vm.offset_ray_origin(hit.p, hit.ng, wi)
        occ = scenemod.occluded(scene, o_sh, wi, t_max=2.0 * scene.world_radius)
        contrib = jnp.where(active & ~occ, wi_l[..., 2] * INV_PI / pdf, 0.0)
        acc = acc + contrib
    val = acc / n_samples
    return jnp.repeat(val[..., None], 3, axis=-1)


def make_li(cfg, cos_sample=True, n_samples=4):
    return lambda scene, o, d, pid, sid: li(scene, o, d, pid, sid, cfg, cos_sample, n_samples)
