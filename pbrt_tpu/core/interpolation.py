"""Catmull–Rom spline machinery + Fourier evaluation.

TPU-native counterpart of src/core/interpolation.rs (eval/weights/
sampling :4-355, fourier :356-436). Needed by the tabulated BSSRDF
(shade/bssrdf.py) and the FourierBSDF. All functions are batched jnp.
"""
from __future__ import annotations

import jax.numpy as jnp

from .types import Float, find_interval


def catmull_rom_weights(nodes, x):
    """Returns (offset, w0..w3) spline weights at x over `nodes` (1-D
    sorted); interpolation.rs:40-99 (PBRT-v3 CatmullRomWeights)."""
    n = nodes.shape[0]
    i = find_interval(nodes, x)
    x0 = nodes[i]
    x1 = nodes[i + 1]
    t = (x - x0) / jnp.maximum(x1 - x0, 1e-12)
    t2 = t * t
    t3 = t2 * t
    w1 = 2.0 * t3 - 3.0 * t2 + 1.0
    w2 = -2.0 * t3 + 3.0 * t2

    has_prev = i > 0
    x_1 = nodes[jnp.maximum(i - 1, 0)]
    w0p = (t3 - 2.0 * t2 + t) * (x1 - x0) / jnp.maximum(x1 - x_1, 1e-12)
    w0n = t3 - 2.0 * t2 + t
    w0 = jnp.where(has_prev, -w0p, 0.0)
    w1 = jnp.where(has_prev, w1, w1 - w0n)
    w2 = w2 + jnp.where(has_prev, w0p, w0n)

    has_next = i + 2 < n
    x2 = nodes[jnp.minimum(i + 2, n - 1)]
    w3p = (t3 - t2) * (x1 - x0) / jnp.maximum(x2 - x0, 1e-12)
    w3n = t3 - t2
    w3 = jnp.where(has_next, w3p, 0.0)
    w1 = w1 - jnp.where(has_next, w3p, w3n)
    w2 = jnp.where(has_next, w2, w2 + w3n)
    return i, w0, w1, w2, w3


def catmull_rom(nodes, values, x):
    """1-D spline interpolation of `values` at x (interpolation.rs:4-38)."""
    i, w0, w1, w2, w3 = catmull_rom_weights(nodes, x)
    n = nodes.shape[0]

    def v(j):
        return values[jnp.clip(j, 0, n - 1)]

    return w0 * v(i - 1) + w1 * v(i) + w2 * v(i + 1) + w3 * v(i + 2)


def integrate_catmull_rom(nodes, values):
    """CDF of the spline over nodes (interpolation.rs:220-260). Host or
    trace time; returns (cdf (n,), total)."""
    n = nodes.shape[0]
    widths = nodes[1:] - nodes[:-1]
    v0 = values[:-1]
    v1 = values[1:]
    # derivative estimates
    d_prev = jnp.concatenate([values[1:2] - values[0:1],
                              (values[2:] - values[:-2]) * 0.5])
    d_next = jnp.concatenate([(values[2:] - values[:-2]) * 0.5,
                              values[-1:] - values[-2:-1]])
    seg = widths * ((v0 + v1) * 0.5 + (d_prev - d_next) / 12.0)
    cdf = jnp.concatenate([jnp.zeros(1, Float), jnp.cumsum(seg)])
    return cdf, cdf[-1]


def sample_catmull_rom_2d(nodes1, nodes2, values, cdf, alpha, u):
    """Sample the conditional spline row selected by alpha
    (interpolation.rs:262-355). values/cdf: (n1, n2). Returns
    (x, pdf). Simplified: linear interpolation inside the selected
    segment (adequate for BSSRDF profile sampling)."""
    # weights over rows
    i, w0, w1, w2, w3 = catmull_rom_weights(nodes1, alpha)
    n1 = nodes1.shape[0]

    def row(j):
        jc = jnp.clip(j, 0, n1 - 1)
        return values[jc], cdf[jc]

    v_m1, c_m1 = row(i - 1)
    v_0, c_0 = row(i)
    v_1, c_1 = row(i + 1)
    v_2, c_2 = row(i + 2)
    vals = w0[..., None] * v_m1 + w1[..., None] * v_0 + w2[..., None] * v_1 + w3[..., None] * v_2
    cdfs = w0[..., None] * c_m1 + w1[..., None] * c_0 + w2[..., None] * c_1 + w3[..., None] * c_2
    total = cdfs[..., -1]
    target = u * jnp.maximum(total, 1e-12)
    seg = find_interval(cdfs, target)
    c0 = jnp.take_along_axis(cdfs, seg[..., None], axis=-1)[..., 0]
    c1 = jnp.take_along_axis(cdfs, seg[..., None] + 1, axis=-1)[..., 0]
    f0 = jnp.take_along_axis(vals, seg[..., None], axis=-1)[..., 0]
    x0 = nodes2[seg]
    x1 = nodes2[seg + 1]
    t = (target - c0) / jnp.maximum(c1 - c0, 1e-12)
    x = x0 + t * (x1 - x0)
    pdf = jnp.maximum(f0, 0.0) / jnp.maximum(total, 1e-12)
    return x, pdf


def fourier(a, cos_phi, m):
    """Σ a_k cos(kφ) via the recurrence (interpolation.rs:356-390).
    a: (..., m_max) coefficients; m: active order mask length."""
    value = jnp.zeros(cos_phi.shape, Float)
    cos_km1 = cos_phi
    cos_k = jnp.ones_like(cos_phi)
    for k in range(a.shape[-1]):
        value = value + jnp.where(k < m, a[..., k] * cos_k, 0.0)
        cos_k1 = 2.0 * cos_phi * cos_k - cos_km1
        cos_km1 = cos_k
        cos_k = cos_k1
    return value
