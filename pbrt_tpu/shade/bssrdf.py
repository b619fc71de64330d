"""BSSRDF: separable subsurface scattering with tabulated profiles.

TPU-native counterpart of src/core/bssrdf.rs: Fresnel moments (:25-54),
`SeparableBSSRDF` Sp/Sw factorisation (:60-130), `TabulateBSSRDF` with a
Catmull–Rom (ρ, r) profile table (:324-493) and the photon-beam-diffusion
precompute (:530-651). The table is built host-side in numpy (it is a
pure function of the medium parameters); profile evaluation/sampling on
device is a batched spline lookup.

Integration hook (path.rs:154-198 semantics): after a BSDF sample on a
subsurface material, sample an exit point with `sample_radius` around
the entry point via probe rays, then continue with the diffuse Sw lobe.
The probe-ray machinery lives in integrate/path_sss.py (future wiring);
this module provides the complete radiometric core + tests.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.types import Float, PI, INV_PI, clamp, safe_sqrt
from ..core.interpolation import catmull_rom, catmull_rom_weights


def fresnel_moment1(eta):
    """∫ Fr(η, cosθ) cosθ sinθ dθ polynomial fit (bssrdf.rs:25-39)."""
    eta2, eta3 = eta * eta, eta ** 3
    eta4, eta5 = eta ** 4, eta ** 5
    lo = 0.45966 - 1.73965 * eta + 3.37668 * eta2 - 3.904945 * eta3 \
        + 2.49277 * eta4 - 0.68441 * eta5
    hi = -4.61686 + 11.1136 * eta - 10.4646 * eta2 + 5.11455 * eta3 \
        - 1.27198 * eta4 + 0.12746 * eta5
    return jnp.where(eta < 1.0, lo, hi)


def fresnel_moment2(eta):
    """(bssrdf.rs:41-54)."""
    eta2, eta3 = eta * eta, eta ** 3
    eta4, eta5 = eta ** 4, eta ** 5
    lo = 0.27614 - 0.87350 * eta + 1.12077 * eta2 - 0.65095 * eta3 \
        + 0.07883 * eta4 + 0.04860 * eta5
    hi = -547.033 + 45.3087 / eta3 - 218.725 / eta2 + 458.843 / eta \
        + 404.557 * eta - 189.519 * eta2 + 54.9327 * eta3 - 9.00603 * eta4 \
        + 0.63942 * eta5
    return jnp.where(eta < 1.0, lo, hi)


# ----------------------------------------------- beam diffusion tables

def beam_diffusion_ms(sigma_s, sigma_a, g, eta, r, n_samples=100):
    """Multiple-scattering profile via photon beam diffusion
    (bssrdf.rs:530-610; Habel et al. PBD). Host-side numpy scalar."""
    sigmap_s = sigma_s * (1 - g)
    sigmap_t = sigma_a + sigmap_s
    if sigmap_t <= 0:
        return 0.0
    rhop = sigmap_s / sigmap_t
    d_g = (2 * sigma_a + sigmap_s) / (3 * sigmap_t ** 2)
    sigma_tr = np.sqrt(sigma_a / d_g)
    fm1 = float(fresnel_moment1(jnp.asarray(eta, jnp.float32)))
    fm2 = float(fresnel_moment2(jnp.asarray(eta, jnp.float32)))
    ze = -2 * d_g * (1 + 3 * fm2) / (1 - 2 * fm1)
    c_phi = 0.25 * (1 - 2 * fm1)
    c_e = 0.5 * (1 - 3 * fm2)
    ed = 0.0
    for i in range(n_samples):
        zr = -np.log(1 - (i + 0.5) / n_samples) / sigmap_t
        zv = -zr + 2 * ze
        dr = np.sqrt(r * r + zr * zr)
        dv = np.sqrt(r * r + zv * zv)
        phi_d = (np.exp(-sigma_tr * dr) / dr - np.exp(-sigma_tr * dv) / dv) \
            / (4 * np.pi * d_g)
        edn = (zr * (1 + sigma_tr * dr) * np.exp(-sigma_tr * dr) / dr ** 3
               - zv * (1 + sigma_tr * dv) * np.exp(-sigma_tr * dv) / dv ** 3) / (4 * np.pi)
        kappa = 1 - np.exp(-2 * sigmap_t * (dr + zr))
        ed += rhop * rhop * np.exp(-sigma_a * zr) * kappa * (c_phi * phi_d + c_e * edn)
    return max(ed / n_samples, 0.0)


def beam_diffusion_ss(sigma_s, sigma_a, g, eta, r, n_samples=100):
    """Single-scattering term (bssrdf.rs:612-651). Host-side scalar."""
    sigma_t = sigma_a + sigma_s
    if sigma_t <= 0:
        return 0.0
    rho = sigma_s / sigma_t
    t_crit = r * np.sqrt(max(eta * eta - 1.0, 0.0))
    ess = 0.0
    for i in range(n_samples):
        ti = t_crit - np.log(1 - (i + 0.5) / n_samples) / sigma_t
        d = np.sqrt(r * r + ti * ti)
        cos_theta_o = ti / max(d, 1e-12)
        # HG phase at the scattering angle + fresnel transmittance approx
        cos_g = -cos_theta_o
        denom = 1 + g * g + 2 * g * cos_g
        phase = (1 - g * g) / (4 * np.pi * denom * np.sqrt(max(denom, 1e-12)))
        fr = _fr_dielectric_np(cos_theta_o, 1.0, eta)
        ess += rho * np.exp(-sigma_t * (d + t_crit)) / (d * d) * phase \
            * (1 - fr) * abs(cos_theta_o)
    return max(ess / n_samples, 0.0)


def _fr_dielectric_np(ci, ei, et):
    ci = abs(ci)
    si = np.sqrt(max(0.0, 1 - ci * ci))
    st = ei / et * si
    if st >= 1:
        return 1.0
    ct = np.sqrt(max(0.0, 1 - st * st))
    rpar = (et * ci - ei * ct) / max(et * ci + ei * ct, 1e-12)
    rperp = (ei * ci - et * ct) / max(ei * ci + et * ct, 1e-12)
    return 0.5 * (rpar ** 2 + rperp ** 2)


class BSSRDFTable(NamedTuple):
    rho_samples: jnp.ndarray     # (n_rho,)
    radius_samples: jnp.ndarray  # (n_r,)
    profile: jnp.ndarray         # (n_rho, n_r)  r·Sr(ρ, r)
    profile_cdf: jnp.ndarray     # (n_rho, n_r)
    rho_eff: jnp.ndarray         # (n_rho,) effective albedo


def compute_beam_diffusion_table(g=0.0, eta=1.33, n_rho=32, n_r=64):
    """Fill the (ρ, r) profile table (ComputeBeamDiffusionBSSRDF,
    bssrdf.rs table fill). Host-side; cache per (g, eta)."""
    rho = 1.0 - np.exp(-8.0 * np.arange(n_rho) / (n_rho - 1))
    radius = np.zeros(n_r)
    radius[1:] = 0.0025 * 1.2 ** np.arange(n_r - 1)
    profile = np.zeros((n_rho, n_r))
    rho_eff = np.zeros(n_rho)
    for i, rh in enumerate(rho):
        for j, r in enumerate(radius):
            rr = max(r, 1e-6)
            profile[i, j] = 2 * np.pi * rr * (
                beam_diffusion_ms(rh, 1 - rh, g, eta, rr)
                + beam_diffusion_ss(rh, 1 - rh, g, eta, rr))
        # effective albedo = ∫ profile dr
        seg = 0.5 * (profile[i, 1:] + profile[i, :-1]) * np.diff(radius)
        cdf = np.concatenate([[0.0], np.cumsum(seg)])
        rho_eff[i] = cdf[-1]
    cdfs = np.zeros_like(profile)
    for i in range(n_rho):
        seg = 0.5 * (profile[i, 1:] + profile[i, :-1]) * np.diff(radius)
        c = np.concatenate([[0.0], np.cumsum(seg)])
        cdfs[i] = c / max(c[-1], 1e-12)
    return BSSRDFTable(jnp.asarray(rho, jnp.float32), jnp.asarray(radius, jnp.float32),
                       jnp.asarray(profile, jnp.float32), jnp.asarray(cdfs, jnp.float32),
                       jnp.asarray(rho_eff, jnp.float32))


def sr(table: BSSRDFTable, sigma_t, rho, r):
    """Radial profile Sr(r) per channel (TabulatedBSSRDF::Sr,
    bssrdf.rs:380-440): bilinear in (ρ, r·σt) of the unitless table."""
    r_opt = r[..., None] * sigma_t            # (..., 3)
    n_rho = table.rho_samples.shape[0]

    def lookup(rho_c, r_c):
        i_rho = jnp.clip(jnp.searchsorted(table.rho_samples, rho_c) - 1, 0, n_rho - 2)
        f_rho = (rho_c - table.rho_samples[i_rho]) / jnp.maximum(
            table.rho_samples[i_rho + 1] - table.rho_samples[i_rho], 1e-9)
        n_r = table.radius_samples.shape[0]
        i_r = jnp.clip(jnp.searchsorted(table.radius_samples, r_c) - 1, 0, n_r - 2)
        f_r = (r_c - table.radius_samples[i_r]) / jnp.maximum(
            table.radius_samples[i_r + 1] - table.radius_samples[i_r], 1e-9)
        p00 = table.profile[i_rho, i_r]
        p01 = table.profile[i_rho, i_r + 1]
        p10 = table.profile[i_rho + 1, i_r]
        p11 = table.profile[i_rho + 1, i_r + 1]
        v = (1 - f_rho) * ((1 - f_r) * p00 + f_r * p01) \
            + f_rho * ((1 - f_r) * p10 + f_r * p11)
        return jnp.maximum(v, 0.0)

    out = []
    for c in range(3):
        val = lookup(rho[..., c], r_opt[..., c])
        # cancel the 2π·r_optical change of variables, then scale the
        # unitless profile to world area by σt² (bssrdf.rs Sr math:
        # sr /= 2π·rOptical; sr *= σt²) — the OPTICAL radius divides,
        # so ∫ Sr(r)·2πr dr = ∫ P dr_opt = rho_eff, dimensionless.
        val = val * sigma_t[..., c] * sigma_t[..., c] / jnp.maximum(
            2.0 * PI * jnp.maximum(r_opt[..., c], 1e-6), 1e-9)
        out.append(val)
    return jnp.stack(out, axis=-1)


def sample_radius(table: BSSRDFTable, sigma_t_c, rho_c, u):
    """Inverse-CDF sample of the radial profile for ONE channel
    (bssrdf.rs sample_sp radius step). Returns (r, pdf_r)."""
    n_rho = table.rho_samples.shape[0]
    i_rho = jnp.clip(jnp.searchsorted(table.rho_samples, rho_c) - 1, 0, n_rho - 2)
    cdf = table.profile_cdf[i_rho]            # (..., n_r) via gather
    n_r = table.radius_samples.shape[0]
    seg = jnp.clip(jnp.sum((cdf <= u[..., None]).astype(jnp.int32), axis=-1) - 1, 0, n_r - 2)
    c0 = jnp.take_along_axis(cdf, seg[..., None], axis=-1)[..., 0]
    c1 = jnp.take_along_axis(cdf, seg[..., None] + 1, axis=-1)[..., 0]
    t = (u - c0) / jnp.maximum(c1 - c0, 1e-9)
    r0 = table.radius_samples[seg]
    r1 = table.radius_samples[seg + 1]
    r_opt = r0 + t * (r1 - r0)
    prof = table.profile[i_rho]
    p0 = jnp.take_along_axis(prof, seg[..., None], axis=-1)[..., 0]
    pdf_opt = p0 / jnp.maximum(table.rho_eff[i_rho], 1e-9)
    r = r_opt / jnp.maximum(sigma_t_c, 1e-9)
    return r, pdf_opt * sigma_t_c


def sw(eta, cos_theta):
    """Directional term Sw (SeparableBSSRDF::Sw, bssrdf.rs:100-112)."""
    c = 1.0 - 2.0 * fresnel_moment1(1.0 / eta)
    from .bxdf import fresnel_dielectric
    fr = fresnel_dielectric(cos_theta, jnp.ones_like(eta), eta)
    return (1.0 - fr) / (c * PI)
