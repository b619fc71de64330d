"""Spectra: RGB first-class, optional sampled-spectrum axis.

TPU-native counterpart of src/core/spectrum.rs. The reference defaults to
`RGBSpectrum` (spectrum.rs:713-716); we make RGB the canonical on-device
representation — a trailing `(..., 3)` channel axis that fuses into every
shading op. `SampledSpectrum` support is provided as an extra `(..., NS)`
axis with CIE curves generated from the Wyman–Sloan–Shirley multi-lobe
Gaussian fits (analytic, so no copied tables).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .types import Float

N_SPECTRAL_SAMPLES = 60
LAMBDA_START = 400.0
LAMBDA_END = 700.0


def rgb(r, g, b):
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(r, Float), jnp.asarray(g, Float), jnp.asarray(b, Float)), axis=-1)


def is_black(s):
    return jnp.all(s == 0.0, axis=-1)


def luminance(s):
    """y() of an RGB triple (spectrum.rs:703-707 weights)."""
    w = jnp.array([0.212671, 0.715160, 0.072169], Float)
    return jnp.sum(s * w, axis=-1)


def rgb_to_xyz(c):
    m = jnp.array([
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ], Float)
    return jnp.einsum("ij,...j->...i", m, c)


def xyz_to_rgb(c):
    m = jnp.array([
        [3.240479, -1.537150, -0.498535],
        [-0.969256, 1.875991, 0.041556],
        [0.055648, -0.204043, 1.057311],
    ], Float)
    return jnp.einsum("ij,...j->...i", m, c)


def gamma_correct(v):
    """Linear → sRGB (src/core/pbrt.rs:94-100)."""
    v = jnp.clip(v, 0.0, 1.0)
    return jnp.where(v <= 0.0031308, 12.92 * v, 1.055 * jnp.power(v, 1.0 / 2.4) - 0.055)


def inverse_gamma_correct(v):
    return jnp.where(v <= 0.04045, v / 12.92, jnp.power((v + 0.055) / 1.055, 2.4))


# ------------------------------------------------- sampled-spectrum tools

def _gauss(x, alpha, mu, s1, s2):
    s = np.where(x < mu, s1, s2)
    return alpha * np.exp(-((x - mu) ** 2) / (2 * s * s))


def cie_xyz_curves(lams):
    """CIE 1931 colour matching functions via the analytic multi-lobe
    Gaussian fit (Wyman, Sloan & Shirley, JCGT 2013). Max abs error vs the
    measured tables is < 0.8% — ample for rendering."""
    lams = np.asarray(lams, np.float64)
    x = (_gauss(lams, 1.056, 599.8, 37.9, 31.0)
         + _gauss(lams, 0.362, 442.0, 16.0, 26.7)
         + _gauss(lams, -0.065, 501.1, 20.4, 26.2))
    y = _gauss(lams, 0.821, 568.8, 46.9, 40.5) + _gauss(lams, 0.286, 530.9, 16.3, 31.1)
    z = _gauss(lams, 1.217, 437.0, 11.8, 36.0) + _gauss(lams, 0.681, 459.0, 26.0, 13.8)
    return np.stack([x, y, z], axis=0).astype(np.float32)


def spectral_lambdas(n=N_SPECTRAL_SAMPLES):
    edges = np.linspace(LAMBDA_START, LAMBDA_END, n + 1)
    return 0.5 * (edges[:-1] + edges[1:])


def sampled_to_xyz(s):
    """(..., NS) sampled spectrum → (..., 3) XYZ by Riemann sum,
    normalised by the y-bar integral (spectrum.rs to_xyz semantics):
    a FLAT unit spectrum maps to Y = 1, so reflectance spectra are
    dimensionless O(1) albedos and radiometric products keep their
    scale across any number of bounce factors."""
    lams = spectral_lambdas(s.shape[-1])
    cmf = jnp.asarray(cie_xyz_curves(lams))              # (3, NS)
    dl = (LAMBDA_END - LAMBDA_START) / s.shape[-1]
    y_int = float(np.sum(cie_xyz_curves(lams)[1]) * dl)
    return jnp.einsum("cn,...n->...c", cmf, s) * (dl / y_int)


def rgb_reflectance_basis(n=N_SPECTRAL_SAMPLES):
    """(N, 3) smooth spectral basis whose weighted sum reproduces an
    RGB reflectance EXACTLY through the spectrum→XYZ→RGB round trip
    (spectrum.rs:566 from_rgb analog): smooth Gaussian bumps around the
    sRGB primaries, calibrated with one 3x3 solve against the CIE
    curves. Host-side numpy const."""
    lams = spectral_lambdas(n)
    # flat + two smooth sigmoids: white decomposes to an (almost exactly)
    # FLAT spectrum, so products of near-neutral spectra stay faithful
    # (the Smits-1999 insight; spiky per-primary bumps make white bumpy
    # and reflectance products blow up)
    raw = np.stack([
        np.ones_like(lams),
        1.0 / (1.0 + np.exp(-(lams - 575.0) / 30.0)),     # long-λ ramp
        1.0 / (1.0 + np.exp((lams - 510.0) / 30.0)),      # short-λ ramp
    ], axis=1)                                            # (N, 3)
    # calibrate: want rgb_of_spectrum(raw @ w) == w for all w
    cmf = cie_xyz_curves(lams).astype(np.float64)         # (3, N)
    dl = (LAMBDA_END - LAMBDA_START) / n
    y_int = float(np.sum(cmf[1]) * dl)
    xyz_of_basis = cmf @ raw * (dl / y_int)               # (3, 3)
    m_xyz2rgb = np.array([[3.240479, -1.537150, -0.498535],
                          [-0.969256, 1.875991, 0.041556],
                          [0.055648, -0.204043, 1.057311]])
    a = m_xyz2rgb @ xyz_of_basis                          # rgb of basis cols
    return (raw @ np.linalg.inv(a)).astype(np.float32)    # (N, 3)


def rgb_to_spectrum(c, n=N_SPECTRAL_SAMPLES):
    """(..., 3) RGB → (..., N) sampled reflectance/radiance spectrum
    (clamped at 0; the exact-round-trip basis can dip slightly
    negative for saturated colours)."""
    basis = jnp.asarray(rgb_reflectance_basis(n))         # (N, 3)
    return jnp.maximum(jnp.einsum("nc,...c->...n", basis, c), 0.0)


def blackbody(lams_nm, temperature_k):
    """Planck's law, W/(m^2 sr nm) (PBRT-v3 §12.1.1)."""
    lams = jnp.asarray(lams_nm, Float) * 1e-9
    c = 299792458.0
    h = 6.62606957e-34
    kb = 1.3806488e-23
    l5 = lams ** 5
    return (2.0 * h * c * c) / (l5 * (jnp.exp(h * c / (lams * kb * temperature_k)) - 1.0)) * 1e-9


def blackbody_normalized(lams_nm, temperature_k):
    le = blackbody(lams_nm, temperature_k)
    lambda_max = 2.8977721e-3 / temperature_k * 1e9
    max_l = blackbody(lambda_max, temperature_k)
    return le / max_l
