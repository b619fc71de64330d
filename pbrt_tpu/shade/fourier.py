"""FourierBSDF — measured/tabulated BSDFs as azimuthal Fourier series.

TPU-native counterpart of src/core/reflection.rs:1282-1300 +
`FourierBSDFTable` (whose `read` is todo!() in the reference,
reflection.rs:187-189 — ours actually loads the PBRT-v3 "SCATFUN v1"
binary format). f(μi, μo, φ) = Σ a_k cos(k·φ) with coefficients
interpolated over the (μi, μo) grid by Catmull–Rom weights.

Table storage is ragged in the file; we densify to (n, n, m_max[, 3])
coefficient blocks — TPU arrays want rectangles, and even the largest
PBRT tables densify to a few hundred MB only for extreme m_max, so we
cap m_max (smooth materials need few orders).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Float, Int, INV_PI, PI, clamp
from ..core.interpolation import catmull_rom_weights, fourier
from ..core import vecmath as vm
from . import bxdf


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FourierTable:
    mu: jnp.ndarray        # (n,) zenith cosines (sorted)
    a: jnp.ndarray         # (n, n, 3, m_max) dense coefficients (Y, R, B)
    m: jnp.ndarray         # (n, n) active orders
    # static: shape-determining / python-control-flow values
    eta: float = field(metadata=dict(static=True), default=1.0)
    m_max: int = field(metadata=dict(static=True), default=1)


def load_bsdf_file(path, m_cap=64):
    """Load a PBRT-v3 .bsdf ("SCATFUN" v1) file → FourierTable."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:7] != b"SCATFUN":
        raise ValueError("not a SCATFUN file")
    version = data[7]
    if version != 1:
        raise ValueError(f"unsupported SCATFUN version {version}")
    (flags, n_mu, n_coeffs, m_max, n_channels, n_bases, _unused0, _unused1,
     eta, _r0, _r1, _r2, _r3, _r4) = struct.unpack("<8i6f", data[8:8 + 56])
    off = 64
    mu = np.frombuffer(data, "<f4", n_mu, off); off += 4 * n_mu
    cdf = np.frombuffer(data, "<f4", n_mu * n_mu, off); off += 4 * n_mu * n_mu
    offset_and_length = np.frombuffer(data, "<i4", 2 * n_mu * n_mu, off)
    off += 8 * n_mu * n_mu
    coeffs = np.frombuffer(data, "<f4", n_coeffs, off)
    return _densify(mu, offset_and_length.reshape(-1, 2), coeffs,
                    n_mu, n_channels, float(eta), min(m_max, m_cap))


def _densify(mu, offlen, coeffs, n, n_channels, eta, m_max):
    a = np.zeros((n, n, 3, m_max), np.float32)
    m = np.zeros((n, n), np.int32)
    for i in range(n):
        for j in range(n):
            o, l = offlen[i * n + j]
            per = l // max(n_channels, 1) if n_channels else 0
            take = min(per, m_max)
            m[i, j] = take
            for c in range(min(n_channels, 3)):
                a[i, j, c, :take] = coeffs[o + c * per:o + c * per + take]
            if n_channels == 1:
                a[i, j, 1] = a[i, j, 0]
                a[i, j, 2] = a[i, j, 0]
    return FourierTable(jnp.asarray(mu), jnp.asarray(a), jnp.asarray(m),
                        eta, m_max)


def make_lambertian_table(albedo=(0.5, 0.5, 0.5), n_mu=16):
    """Synthetic constant-profile table (a_0 = ρ/π) — used by tests and
    as a template for building tables programmatically."""
    mu = np.linspace(-1.0, 1.0, n_mu).astype(np.float32)
    a = np.zeros((n_mu, n_mu, 3, 1), np.float32)
    alb = np.asarray(albedo, np.float32)
    # PBRT convention: coefficients include the 1/|μi| cancellation —
    # store f·|μi| so eval divides; for the synthetic table we store the
    # plain value and document eval's contract instead.
    y_lum = 0.212671 * alb[0] + 0.715160 * alb[1] + 0.072169 * alb[2]
    for i in range(n_mu):
        for j in range(n_mu):
            a[i, j, 0, 0] = y_lum * INV_PI       # channel 0 = luminance Y
            a[i, j, 1, 0] = alb[0] * INV_PI      # channel 1 = R
            a[i, j, 2, 0] = alb[2] * INV_PI      # channel 2 = B
    m = np.ones((n_mu, n_mu), np.int32)
    return FourierTable(jnp.asarray(mu), jnp.asarray(a), jnp.asarray(m), 1.0, 1)


def fourier_f(table: FourierTable, wo, wi):
    """Evaluate f(wo, wi) (..., 3). Reflection convention: μi is negated
    (reflection.rs FourierBSDF::f uses muI = cosTheta(-wi))."""
    mu_i = clamp(-wi[..., 2], -1.0, 1.0)
    mu_o = clamp(wo[..., 2], -1.0, 1.0)
    # azimuth difference cosine
    sin2_i = jnp.maximum(0.0, 1.0 - wi[..., 2] ** 2)
    sin2_o = jnp.maximum(0.0, 1.0 - wo[..., 2] ** 2)
    sin_i = jnp.sqrt(sin2_i)
    sin_o = jnp.sqrt(sin2_o)
    cos_phi = jnp.where((sin_i > 1e-8) & (sin_o > 1e-8),
                        clamp((wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1])
                              / jnp.maximum(sin_i * sin_o, 1e-8), -1.0, 1.0),
                        1.0)

    ii, wi0, wi1, wi2, wi3 = catmull_rom_weights(table.mu, mu_i)
    oi, wo0, wo1, wo2, wo3 = catmull_rom_weights(table.mu, mu_o)
    n = table.mu.shape[0]

    def gather(di, dj, wgt_i, wgt_o):
        i_idx = jnp.clip(ii + di, 0, n - 1)
        o_idx = jnp.clip(oi + dj, 0, n - 1)
        coef = table.a[i_idx, o_idx]            # (..., 3, m_max)
        return (wgt_i * wgt_o)[..., None, None] * coef

    acc = jnp.zeros(wo.shape[:-1] + (3, table.m_max), Float)
    for di, wgt_i in zip((-1, 0, 1, 2), (wi0, wi1, wi2, wi3)):
        for dj, wgt_o in zip((-1, 0, 1, 2), (wo0, wo1, wo2, wo3)):
            acc = acc + gather(di, dj, wgt_i, wgt_o)

    out = []
    for c in range(3):
        val = fourier(acc[..., c, :], cos_phi, table.m_max)
        out.append(jnp.maximum(val, 0.0))
    # channel order in files is (Y, R, B); reconstruct G from Y
    y, r, bch = out
    g = 1.39829 * y - 0.100913 * bch - 0.297375 * r
    return jnp.stack([r, jnp.maximum(g, 0.0), bch], axis=-1)


def fourier_sample(table: FourierTable, wo, u2):
    """Cosine-hemisphere importance sampling with the table's f and the
    matching pdf (PBRT's exact inverse-CDF sampling of μi is a further
    optimisation; this estimator is unbiased)."""
    from ..core.sampling import cosine_sample_hemisphere
    wi = cosine_sample_hemisphere(u2)      # +z hemisphere
    # reflection side = SAME hemisphere as wo (muI·muO < 0 in the
    # table's negated-muI convention, reflection.rs FourierBSDF::f)
    wi = jnp.where((wo[..., 2] < 0.0)[..., None],
                   wi * jnp.array([1.0, 1.0, -1.0], Float), wi)
    f = fourier_f(table, wo, wi)
    pdf = jnp.abs(wi[..., 2]) * INV_PI
    return wi, f, pdf
