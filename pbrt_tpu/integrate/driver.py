"""Render driver: the wavefront analog of SamplerIntegrator::render
(src/core/integrator.rs:399-480).

The reference's 16×16-tile rayon loop becomes: organise the wavefront as
(samples, H·W) lanes, loop over sample batches (python loop — static,
each batch is one fused XLA program), FIS film sampling, camera raygen,
integrator `li`, and a reduction into the film. Per-pixel seeding uses
the flat pixel id (the analog of the reference's per-tile seed,
integrator.rs:414, at pixel granularity — reproducible under any
sharding).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Float
from ..core import samplers as smp
from ..cameras import generate_rays_weighted
from ..film import film as filmmod
from ..film import filters as filtmod


class RenderConfig(NamedTuple):
    width: int = 64
    height: int = 64
    spp: int = 4
    max_depth: int = 5
    sampler: smp.SamplerConfig = smp.SamplerConfig()
    filter: filtmod.Filter = filtmod.Filter()
    samples_per_batch: int = 0   # 0 → all spp in one launch
    light_strategy: str = "uniform"  # uniform | power | spatial
    # anisotropic texture filtering: 1 = ONE stochastic major-axis tap
    # per sample (expectation = ellipse filter; right at real spp), >1 =
    # DETERMINISTIC midpoint taps averaged per lookup (EWA-style; for
    # 1-4 spp previews where the stochastic tap is noise, mipmap.rs
    # :297-345 capability at reduced tap count). Taps multiply the
    # texture-gather cost.
    aniso_taps: int = 1


def render_batch(scene, camera, cfg: RenderConfig, li_fn, sample_lo, sample_hi):
    """Render sample indices [sample_lo, sample_hi) for every pixel.
    Returns (radiance (S,HW,3), weight (S,HW))."""
    h, w = cfg.height, cfg.width
    hw = h * w
    s = sample_hi - sample_lo
    pixel_id = jnp.tile(jnp.arange(hw, dtype=jnp.uint32)[None, :], (s, 1))
    sample_idx = (jnp.arange(s, dtype=jnp.uint32) + jnp.uint32(sample_lo))[:, None] \
        * jnp.ones((1, hw), jnp.uint32)

    # film position via filter importance sampling
    u_film = smp.sample_2d(cfg.sampler, pixel_id, sample_idx, smp.DIM_FILM)
    px = (pixel_id % jnp.uint32(w)).astype(Float)
    py = (pixel_id // jnp.uint32(w)).astype(Float)
    off, fw = filtmod.sample_offset(cfg.filter, u_film)
    pfilm = jnp.stack([px + 0.5 + off[..., 0], py + 0.5 + off[..., 1]], axis=-1)

    u_lens = smp.sample_2d(cfg.sampler, pixel_id, sample_idx, smp.DIM_LENS)
    u_time = smp.sample_1d(cfg.sampler, pixel_id, sample_idx, smp.DIM_TIME)
    o, d, _time, cw = generate_rays_weighted(camera, pfilm, u_lens, u_time)

    # vignetted lens rays contribute zero radiance but full filter
    # weight (film.rs add_sample semantics: the sample still lands)
    radiance = li_fn(scene, o, d, pixel_id, sample_idx) * cw[..., None]
    weight = fw * jnp.ones(pixel_id.shape, Float)
    return radiance, weight


def render(scene, camera, cfg: RenderConfig, li_fn, jit=True):
    """Full render → (H, W, 3) image. li_fn(scene, o, d, pixel_id,
    sample_idx) -> (..., 3) is the integrator."""
    h, w = cfg.height, cfg.width
    batch = cfg.samples_per_batch or cfg.spp

    def one_batch(scene, camera, lo, hi):
        rad, wt = render_batch(scene, camera, cfg, li_fn, lo, hi)
        return (jnp.sum(rad * wt[..., None], axis=0).reshape(h, w, 3),
                jnp.sum(wt, axis=0).reshape(h, w))

    fn = jax.jit(one_batch, static_argnums=(2, 3)) if jit else one_batch
    acc = jnp.zeros((h, w, 3), Float)
    wacc = jnp.zeros((h, w), Float)
    for lo in range(0, cfg.spp, batch):
        hi = min(lo + batch, cfg.spp)
        r, wt = fn(scene, camera, lo, hi)
        acc = acc + r
        wacc = wacc + wt
    return acc / jnp.maximum(wacc[..., None], 1e-10)
