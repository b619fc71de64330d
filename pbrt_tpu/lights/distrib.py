"""Light-selection distributions: uniform, power, spatial.

TPU-native counterpart of src/core/lightdistrib.rs. Uniform
(lightdistrib.rs:26-46) and power (:48-74) are Distribution1Ds over the
light list; Spatial (:76-219) voxelises the world bounds and estimates
each light's unoccluded contribution per voxel — but where the reference
uses a lock-free hash table with atomic CAS filled lazily per lookup, we
precompute the whole dense voxel→CDF grid in one batched pass (no
atomics, no hashing — SURVEY §2.10) and look up with a gather.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Float, Int, clamp
from ..core.sampling import Distribution1D
from ..core import vecmath as vm
from ..core.rng import uniform_float
from . import lights as lightsmod


class SpatialLightDistribution(NamedTuple):
    grid_cdf: jnp.ndarray    # (V, L+1) per-voxel CDF
    grid_func: jnp.ndarray   # (V, L)
    resolution: tuple        # static (nz, ny, nx)
    world_min: jnp.ndarray
    world_ext: jnp.ndarray


def power_distribution(lights, world_radius):
    """Distribution1D over approximate emitted power
    (compute_light_power_distribution, integrator.rs:268-292)."""
    return Distribution1D.build(lightsmod.power(lights, world_radius))


def build_spatial(scene, lights, resolution=(8, 8, 8), n_estimate=32, seed=0):
    """Per-voxel light importance (lightdistrib.rs:121-219 semantics):
    for each voxel, MC-estimate each light's mean unoccluded-ignored
    contribution from sample points in the voxel; floor at a small
    fraction of the mean so no light gets probability 0."""
    nz, ny, nx = resolution
    v = nz * ny * nx
    l = lights.count
    wmin = scene.world_center - scene.world_radius
    ext = 2.0 * scene.world_radius * jnp.ones((3,), Float)

    # voxel-center grid + jittered sample points
    zi, yi, xi = jnp.meshgrid(jnp.arange(nz), jnp.arange(ny), jnp.arange(nx), indexing="ij")
    base = jnp.stack([xi, yi, zi], axis=-1).reshape(v, 3).astype(Float)
    res_f = jnp.array([nx, ny, nz], Float)

    func = jnp.zeros((v, l), Float)
    for k in range(n_estimate):
        u = jnp.stack([uniform_float(jnp.uint32(seed), jnp.arange(v, dtype=jnp.uint32),
                                     jnp.uint32(k), jnp.uint32(ax)) for ax in range(3)], axis=-1)
        p = wmin + (base + u) / res_f * ext          # (V, 3)
        for li in range(int(l)):
            lt = jnp.full((v,), li, Int)
            u2 = jnp.stack([uniform_float(jnp.uint32(seed + 1), jnp.arange(v, dtype=jnp.uint32),
                                          jnp.uint32(k), jnp.uint32(10 + li * 2 + ax))
                            for ax in range(2)], axis=-1)
            ls = lightsmod.sample_li(lights, scene, lt, p, u2, scene.world_radius)
            from ..core.spectrum import luminance
            contrib = jnp.where(ls["pdf"] > 0,
                                luminance(ls["li"]) / jnp.maximum(ls["pdf"], 1e-12), 0.0)
            func = func.at[:, li].add(contrib)
    func = func / n_estimate
    # floor: minimum share so every light stays sampleable (lightdistrib.rs:204-214)
    mean = jnp.mean(func, axis=-1, keepdims=True)
    func = jnp.maximum(func, 0.1 * mean + 1e-9)
    dist = Distribution1D.build(func)
    return SpatialLightDistribution(
        grid_cdf=dist.cdf, grid_func=dist.func, resolution=resolution,
        world_min=wmin, world_ext=ext)


def spatial_lookup_sample(sd: SpatialLightDistribution, p, u):
    """Select a light for shading points p (N,3): (light_idx, pmf)."""
    nz, ny, nx = sd.resolution
    q = clamp((p - sd.world_min) / sd.world_ext, 0.0, 0.9999)
    xi = (q[..., 0] * nx).astype(Int)
    yi = (q[..., 1] * ny).astype(Int)
    zi = (q[..., 2] * nz).astype(Int)
    vi = (zi * ny + yi) * nx + xi
    cdf = sd.grid_cdf[vi]
    func = sd.grid_func[vi]
    d = Distribution1D(func, cdf, jnp.sum(func, axis=-1) / func.shape[-1])
    idx, pmf, _ = d.sample_discrete(u)
    return idx.astype(Int), pmf
