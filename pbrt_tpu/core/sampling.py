"""Monte Carlo warps, MIS heuristics and tabulated distributions.

TPU-native counterpart of src/core/sampling.rs (warps: sampling.rs:219-299,
MIS: sampling.rs:302-312, Distribution1D/2D: sampling.rs:69-217). All warps
take `(..., 2)` (or `(...,)`) uniforms and broadcast over wavefront axes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .types import Float, INV_PI, INV_2PI, INV_4PI, PI, PI_OVER_2, PI_OVER_4, find_interval, safe_sqrt
from . import vecmath as vm


# ----------------------------------------------------------------- warps

def uniform_sample_hemisphere(u):
    z = u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_hemisphere_pdf():
    return INV_2PI


def uniform_sample_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sphere_pdf():
    return INV_4PI


def concentric_sample_disk(u):
    """Shirley–Chiu concentric disk warp (sampling.rs:241-258), branch-free."""
    ox = 2.0 * u[..., 0] - 1.0
    oy = 2.0 * u[..., 1] - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(use_x,
                      PI_OVER_4 * jnp.where(ox != 0.0, oy / jnp.where(ox != 0.0, ox, 1.0), 0.0),
                      PI_OVER_2 - PI_OVER_4 * jnp.where(oy != 0.0, ox / jnp.where(oy != 0.0, oy, 1.0), 0.0))
    p = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    return jnp.where(zero[..., None], 0.0, p)


def cosine_sample_hemisphere(u):
    d = concentric_sample_disk(u)
    z = safe_sqrt(1.0 - d[..., 0] ** 2 - d[..., 1] ** 2)
    return jnp.stack([d[..., 0], d[..., 1], z], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * INV_PI


def uniform_sample_cone(u, cos_theta_max):
    cos_theta = (1.0 - u[..., 0]) + u[..., 0] * cos_theta_max
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * PI * u[..., 1]
    return vm.spherical_direction(sin_theta, cos_theta, phi)


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2.0 * PI * jnp.maximum(1.0 - cos_theta_max, 1e-9))


def uniform_sample_triangle(u):
    """Barycentrics from a square (sampling.rs:293-299)."""
    su0 = safe_sqrt(u[..., 0])
    return jnp.stack([1.0 - su0, u[..., 1] * su0], axis=-1)


def stratified_1d(idx, n, jitter):
    """Sample idx of n strata with jitter in [0,1)."""
    return (idx.astype(Float) + jitter) / n


# ------------------------------------------------------------------- MIS

def balance_heuristic(nf, f_pdf, ng, g_pdf):
    return (nf * f_pdf) / jnp.maximum(nf * f_pdf + ng * g_pdf, 1e-20)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    f = nf * f_pdf
    g = ng * g_pdf
    return (f * f) / jnp.maximum(f * f + g * g, 1e-20)


# ----------------------------------------------------- Distribution1D/2D

def _gather(arr, idx):
    """arr[..., idx] supporting both an unbatched table (arr 1-D, idx any
    shape) and per-row tables (arr batch dims == idx batch dims)."""
    if arr.ndim == 1:
        return arr[idx]
    return jnp.take_along_axis(arr, idx[..., None], axis=-1)[..., 0]

class Distribution1D(NamedTuple):
    """Tabulated 1D distribution: piecewise-constant pdf over [0,1).

    `func` is (..., n), `cdf` is (..., n+1), `func_int` is (...,). Built on
    host or in-graph; sampling is a batched find_interval (no per-element
    loops — the reference's binary search becomes a vectorised reduction).
    Mirrors src/core/sampling.rs:69-154.
    """
    func: jnp.ndarray
    cdf: jnp.ndarray
    func_int: jnp.ndarray

    @property
    def count(self):
        return self.func.shape[-1]

    @staticmethod
    def build(func):
        func = jnp.maximum(jnp.asarray(func, Float), 0.0)
        n = func.shape[-1]
        cdf = jnp.cumsum(func, axis=-1) / n
        func_int = cdf[..., -1]
        safe_int = jnp.where(func_int > 0.0, func_int, 1.0)
        cdf = jnp.where(func_int[..., None] > 0.0,
                        cdf / safe_int[..., None],
                        (jnp.arange(1, n + 1, dtype=Float)) / n)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
        return Distribution1D(func, cdf, func_int)

    def sample_continuous(self, u):
        """Returns (x in [0,1), pdf, offset). u broadcasts with batch dims."""
        off = find_interval(self.cdf, u)
        c0 = _gather(self.cdf, off)
        c1 = _gather(self.cdf, off + 1)
        f = _gather(self.func, off)
        du = u - c0
        denom = c1 - c0
        du = jnp.where(denom > 0.0, du / jnp.where(denom > 0.0, denom, 1.0), du)
        pdf = jnp.where(self.func_int > 0.0, f / jnp.maximum(self.func_int, 1e-20), 0.0)
        x = (off.astype(Float) + du) / self.count
        return x, pdf, off

    def sample_discrete(self, u):
        """Returns (offset, pmf, u_remapped)."""
        off = find_interval(self.cdf, u)
        c0 = _gather(self.cdf, off)
        c1 = _gather(self.cdf, off + 1)
        f = _gather(self.func, off)
        pmf = jnp.where(self.func_int > 0.0,
                        f / (jnp.maximum(self.func_int, 1e-20) * self.count), 0.0)
        denom = jnp.maximum(c1 - c0, 1e-20)
        return off, pmf, (u - c0) / denom

    def discrete_pdf(self, index):
        f = _gather(self.func, index)
        return f / (jnp.maximum(self.func_int, 1e-20) * self.count)


class Distribution2D(NamedTuple):
    """Product distribution over a (ny, nx) grid (src/core/sampling.rs:169-217).

    conditional: Distribution1D with batch dim ny (rows); marginal over rows.
    """
    conditional: Distribution1D
    marginal: Distribution1D

    @staticmethod
    def build(func):
        func = jnp.asarray(func, Float)          # (ny, nx)
        conditional = Distribution1D.build(func)  # batched over rows
        marginal = Distribution1D.build(conditional.func_int)
        return Distribution2D(conditional, marginal)

    def sample_continuous(self, u):
        """u: (..., 2) → ((..., 2) point in [0,1)^2 as (u, v), pdf)."""
        d1, pdf1, iy = self.marginal.sample_continuous(u[..., 1])
        # Gather the row distribution for each sample, then sample along x.
        cond_func = self.conditional.func[iy]          # (..., nx)
        cond_cdf = self.conditional.cdf[iy]            # (..., nx+1)
        cond_int = self.conditional.func_int[iy]       # (...,)
        row = Distribution1D(cond_func, cond_cdf, cond_int)
        d0, pdf0, _ = row.sample_continuous(u[..., 0])
        return jnp.stack([d0, d1], axis=-1), pdf0 * pdf1

    def pdf(self, p):
        ny, nx = self.conditional.func.shape
        xi = jnp.clip((p[..., 0] * nx).astype(jnp.int32), 0, nx - 1)
        yi = jnp.clip((p[..., 1] * ny).astype(jnp.int32), 0, ny - 1)
        f = self.conditional.func[yi, xi]
        return f / jnp.maximum(self.marginal.func_int, 1e-20)
