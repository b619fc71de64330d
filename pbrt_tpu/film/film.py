"""Film: weighted radiance accumulation + splats.

TPU-native counterpart of src/core/film.rs. The reference accumulates
per-tile AoS pixels behind locks (film.rs:224-295, merge film.rs:111);
ours is a pytree of dense arrays:

    pixels   (H, W, 3)  filter-weighted radiance sum
    weights  (H, W)     filter weight sum
    splats   (H, W, 3)  unweighted splat sum (BDPT t=1 / MLT / SPPM)

Two accumulation paths:
  * `accumulate_samples` — the wavefront path. Lanes are organised
    (spp, H, W); with filter importance sampling each sample contributes
    to exactly its own pixel, so accumulation is a pure reduction over
    the spp axis — no scatter, no atomics (cf. film.rs:252-295 splatting).
  * `add_splats` — scatter-add for light-traced contributions at arbitrary
    film positions (film.rs:137-151); `jnp.ndarray.at[].add` lowers to a
    deterministic XLA scatter.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.types import Float
from . import filters


class Film(NamedTuple):
    pixels: jnp.ndarray    # (H, W, 3)
    weights: jnp.ndarray   # (H, W)
    splats: jnp.ndarray    # (H, W, 3)

    @property
    def resolution(self):
        return self.pixels.shape[:2]


def new_film(height, width):
    return Film(
        pixels=jnp.zeros((height, width, 3), Float),
        weights=jnp.zeros((height, width), Float),
        splats=jnp.zeros((height, width, 3), Float),
    )


def accumulate_samples(film: Film, radiance, weight):
    """radiance: (S, H, W, 3) per-sample radiance; weight: (S, H, W)
    filter weights (1 for FIS). Returns updated film."""
    return film._replace(
        pixels=film.pixels + jnp.sum(radiance * weight[..., None], axis=0),
        weights=film.weights + jnp.sum(weight, axis=0),
    )


def add_splats(film: Film, pfilm, value, enabled=None):
    """pfilm: (N, 2) continuous film coords (x, y); value: (N, 3)."""
    h, w = film.resolution
    xi = jnp.clip(pfilm[..., 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(pfilm[..., 1].astype(jnp.int32), 0, h - 1)
    inside = (pfilm[..., 0] >= 0) & (pfilm[..., 0] < w) & \
             (pfilm[..., 1] >= 0) & (pfilm[..., 1] < h)
    if enabled is not None:
        inside = inside & enabled
    v = jnp.where(inside[..., None], value, 0.0)
    return film._replace(splats=film.splats.at[yi, xi].add(v))


def develop(film: Film, splat_scale=0.0):
    """Final (H, W, 3) image (film.rs:153-180 semantics, minus todo!)."""
    img = film.pixels / jnp.maximum(film.weights[..., None], 1e-10)
    if splat_scale:
        img = img + splat_scale * film.splats
    return img


def film_sample_positions(height, width, u_film, filt: filters.Filter):
    """Continuous film sample positions for the (S, H, W) wavefront using
    filter importance sampling. u_film: (S, H, W, 2) uniforms.
    Returns (pfilm (S,H,W,2), weight (S,H,W))."""
    px = jnp.arange(width, dtype=Float)[None, None, :]
    py = jnp.arange(height, dtype=Float)[None, :, None]
    off, wt = filters.sample_offset(filt, u_film)
    x = px + 0.5 + off[..., 0]
    y = py + 0.5 + off[..., 1]
    return jnp.stack([x, y], axis=-1), wt * jnp.ones(u_film.shape[:-1], Float)
