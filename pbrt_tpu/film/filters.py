"""Reconstruction filters.

TPU-native counterpart of src/core/filter.rs + src/filters/ (box, triangle,
gaussian, mitchell, lanczos-sinc). Each filter provides `evaluate(x, y)`
and an importance-sampling table. Filters are described by a static kind
plus parameter scalars so the film can build its splat weight table or use
filter importance sampling (FIS): jitter the camera sample by a
filter-distributed offset and splat weight 1 — unbiased, scatter-free.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.types import Float, PI


class Filter(NamedTuple):
    kind: str = "box"            # static: box|triangle|gaussian|mitchell|lanczos
    radius: float = 0.5          # static python float (xy-symmetric)
    alpha: float = 2.0           # gaussian
    b: float = 1.0 / 3.0         # mitchell
    c: float = 1.0 / 3.0         # mitchell
    tau: float = 3.0             # lanczos


def evaluate(f: Filter, x, y):
    """Filter value at offset (x, y) from the sample position."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    inside = (ax <= f.radius) & (ay <= f.radius)
    if f.kind == "box":
        w = jnp.ones_like(x)
    elif f.kind == "triangle":
        w = jnp.maximum(0.0, f.radius - ax) * jnp.maximum(0.0, f.radius - ay)
    elif f.kind == "gaussian":
        def g(d):
            e = np.float32(np.exp(-f.alpha * f.radius * f.radius))
            return jnp.maximum(0.0, jnp.exp(-f.alpha * d * d) - e)
        w = g(x) * g(y)
    elif f.kind == "mitchell":
        w = _mitchell_1d(f, x / f.radius) * _mitchell_1d(f, y / f.radius)
    elif f.kind == "lanczos":
        w = _windowed_sinc(f, x) * _windowed_sinc(f, y)
    else:
        raise ValueError(f.kind)
    return jnp.where(inside, w, 0.0)


def _mitchell_1d(f, x):
    """Mitchell–Netravali on [-1,1]-normalised offsets (mitchell.rs)."""
    x = jnp.abs(2.0 * x)
    b, c = f.b, f.c
    big = ((-b - 6 * c) * x ** 3 + (6 * b + 30 * c) * x ** 2
           + (-12 * b - 48 * c) * x + (8 * b + 24 * c)) * (1.0 / 6.0)
    small = ((12 - 9 * b - 6 * c) * x ** 3 + (-18 + 12 * b + 6 * c) * x ** 2
             + (6 - 2 * b)) * (1.0 / 6.0)
    return jnp.where(x > 1.0, big, small)


def _sinc(x):
    x = jnp.abs(x)
    return jnp.where(x < 1e-5, 1.0, jnp.sin(PI * x) / (PI * x))


def _windowed_sinc(f, x):
    ax = jnp.abs(x)
    lanczos = _sinc(ax / f.tau)
    return jnp.where(ax > f.radius, 0.0, _sinc(ax) * lanczos)


def sample_offset(f: Filter, u2):
    """Importance-sample an offset from the (positive-lobe approximation
    of the) filter for FIS. Returns (offset (...,2), weight).

    box/triangle/gaussian are sampled exactly (weight 1 or sign-corrected
    constant); mitchell/lanczos fall back to tabulated inversion of |f|
    with weight sign(f)·∫|f| — handled by the table path in film.py.
    """
    if f.kind == "box":
        off = (u2 - 0.5) * (2.0 * f.radius)
        return off, jnp.ones(u2.shape[:-1], Float)
    if f.kind == "triangle":
        # tent: inverse-CDF of the 1D tent on [-r, r]
        def tent(u):
            return jnp.where(u < 0.5,
                             f.radius * (jnp.sqrt(2.0 * u) - 1.0),
                             f.radius * (1.0 - jnp.sqrt(jnp.maximum(2.0 - 2.0 * u, 0.0))))
        off = jnp.stack([tent(u2[..., 0]), tent(u2[..., 1])], axis=-1)
        return off, jnp.ones(u2.shape[:-1], Float)
    if f.kind == "gaussian":
        # Box–Muller, rejection-free; truncation bias at the tails is
        # negligible for alpha≥2 with r≥1.5σ, matching PBRT's truncation.
        sigma = np.float32(1.0 / np.sqrt(2.0 * f.alpha))
        r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - u2[..., 0], 1e-10))) * sigma
        th = 2.0 * PI * u2[..., 1]
        off = jnp.stack([r * jnp.cos(th), r * jnp.sin(th)], axis=-1)
        off = jnp.clip(off, -f.radius, f.radius)
        return off, jnp.ones(u2.shape[:-1], Float)
    # negative-lobed filters: tabulated inverse of |f| per axis
    xs, cdf, integ_abs = _abs_cdf_table(f)
    def inv(u):
        idx = jnp.clip(jnp.searchsorted(cdf, u) - 1, 0, len(xs) - 2)
        c0, c1 = cdf[idx], cdf[idx + 1]
        t = (u - c0) / jnp.maximum(c1 - c0, 1e-12)
        return xs[idx] + t * (xs[idx + 1] - xs[idx])
    ox, oy = inv(u2[..., 0]), inv(u2[..., 1])
    off = jnp.stack([ox, oy], axis=-1)
    w1 = evaluate(f, ox, jnp.zeros_like(ox))
    w2 = evaluate(f, jnp.zeros_like(oy), oy)
    sgn = jnp.sign(w1) * jnp.sign(w2)
    return off, sgn * np.float32(integ_abs ** 2)


def _abs_cdf_table(f: Filter, n=256):
    xs = np.linspace(-f.radius, f.radius, n + 1, dtype=np.float32)
    mid = 0.5 * (xs[:-1] + xs[1:])
    vals = np.abs(np.asarray(evaluate(f, jnp.asarray(mid), jnp.zeros_like(jnp.asarray(mid)))))
    cdf = np.concatenate([[0.0], np.cumsum(vals)]).astype(np.float32)
    integ = cdf[-1] * (2.0 * f.radius / n)
    cdf /= max(cdf[-1], 1e-12)
    return jnp.asarray(xs), jnp.asarray(cdf), float(integ)
