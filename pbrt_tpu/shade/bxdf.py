"""BxDF lobes, Fresnel terms and microfacet distributions — local frame.

TPU-native counterpart of src/core/reflection.rs (Fresnel :19-70, frame
helpers :72-158, 12 BxDFs :521-1300) and src/core/microfacet.rs (Beckmann
+ Trowbridge-Reitz/GGX :34-240). All functions operate on shading-local
directions (z = shading normal) with arbitrary batch shape and are
differentiable w.r.t. the continuous material parameters.

Deviations from the reference (implementing PBRT-v3 semantics where the
port has noted bugs): none of reflection.rs's math bugs are reproduced.
GGX uses visible-normal sampling (Heitz 2018) — better than full-D.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.types import Float, INV_PI, PI, clamp, safe_sqrt
from ..core import vecmath as vm
from ..core.sampling import cosine_sample_hemisphere


# ------------------------------------------------- shading-frame helpers

def cos_theta(w):
    return w[..., 2]


def cos2_theta(w):
    return w[..., 2] * w[..., 2]


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def sin2_theta(w):
    return jnp.maximum(0.0, 1.0 - cos2_theta(w))


def sin_theta(w):
    return jnp.sqrt(sin2_theta(w))


def tan_theta(w):
    return sin_theta(w) / jnp.where(cos_theta(w) != 0.0, cos_theta(w), 1e-8)


def tan2_theta(w):
    return sin2_theta(w) / jnp.maximum(cos2_theta(w), 1e-12)


def cos_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0.0, 1.0, clamp(w[..., 0] / jnp.maximum(s, 1e-12), -1.0, 1.0))


def sin_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0.0, 0.0, clamp(w[..., 1] / jnp.maximum(s, 1e-12), -1.0, 1.0))


def same_hemisphere(a, b):
    return a[..., 2] * b[..., 2] > 0.0


def reflect_local(wo):
    return jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)


# ---------------------------------------------------------------- Fresnel

def fresnel_dielectric(cos_theta_i, eta_i, eta_t):
    """Unpolarised Fresnel for dielectrics (reflection.rs:19-47).
    Handles both sides (cos_theta_i < 0 swaps media)."""
    ci = clamp(cos_theta_i, -1.0, 1.0)
    entering = ci > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    ci = jnp.abs(ci)
    si = safe_sqrt(1.0 - ci * ci)
    st = ei / et * si
    tir = st >= 1.0
    ct = safe_sqrt(1.0 - st * st)
    r_par = ((et * ci) - (ei * ct)) / jnp.maximum((et * ci) + (ei * ct), 1e-12)
    r_perp = ((ei * ci) - (et * ct)) / jnp.maximum((ei * ci) + (et * ct), 1e-12)
    fr = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(tir, 1.0, fr)


def fresnel_conductor(cos_theta_i, eta_i, eta_t, k):
    """Fresnel for conductors, per-channel (reflection.rs:49-70).
    eta_i scalar/broadcast, eta_t & k are (..., 3)."""
    ci = clamp(jnp.abs(cos_theta_i), 0.0, 1.0)[..., None]
    eta = eta_t / eta_i[..., None] if eta_i.ndim < eta_t.ndim else eta_t / eta_i
    etak = k / (eta_i[..., None] if eta_i.ndim < k.ndim else eta_i)
    ci2 = ci * ci
    si2 = 1.0 - ci2
    eta2 = eta * eta
    etak2 = etak * etak
    t0 = eta2 - etak2 - si2
    a2b2 = safe_sqrt(t0 * t0 + 4.0 * eta2 * etak2)
    t1 = a2b2 + ci2
    a = safe_sqrt(0.5 * (a2b2 + t0))
    t2 = 2.0 * a * ci
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-12)
    t3 = ci2 * a2b2 + si2 * si2
    t4 = t2 * si2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-12)
    return 0.5 * (rp + rs)


def fresnel_schlick(cos_theta_i, r0):
    """r0: (..., 3); cos_theta_i: (...,)."""
    m = clamp(1.0 - jnp.abs(cos_theta_i), 0.0, 1.0)
    return r0 + (1.0 - r0) * (m ** 5)[..., None]


# ------------------------------------------- microfacet distributions

DIST_GGX = 0
DIST_BECKMANN = 1


def _alpha_clamp(a):
    return jnp.maximum(a, 1e-3)


def roughness_to_alpha(roughness):
    """PBRT-v3 roughness remap (microfacet.rs / TrowbridgeReitz::roughness_to_alpha)."""
    x = jnp.log(jnp.maximum(roughness, 1e-3))
    return 1.62142 + 0.819955 * x + 0.1734 * x * x + 0.0171201 * x ** 3 + 0.000640711 * x ** 4


def mf_d(dist, ax, ay, wh):
    """Normal distribution D(wh) (microfacet.rs Beckmann :34, TR :145)."""
    ax, ay = _alpha_clamp(ax), _alpha_clamp(ay)
    t2 = tan2_theta(wh)
    c4 = cos2_theta(wh) ** 2
    cp2, sp2 = cos_phi(wh) ** 2, sin_phi(wh) ** 2
    if dist == DIST_BECKMANN:
        d = jnp.exp(-t2 * (cp2 / (ax * ax) + sp2 / (ay * ay))) / (PI * ax * ay * jnp.maximum(c4, 1e-12))
    else:
        e = (cp2 / (ax * ax) + sp2 / (ay * ay)) * t2
        d = 1.0 / (PI * ax * ay * jnp.maximum(c4, 1e-12) * jnp.maximum((1.0 + e) ** 2, 1e-12))
    return jnp.where(jnp.isfinite(t2), d, 0.0)


def mf_lambda(dist, ax, ay, w):
    ax, ay = _alpha_clamp(ax), _alpha_clamp(ay)
    abs_tan = jnp.abs(tan_theta(w))
    alpha = jnp.sqrt(cos_phi(w) ** 2 * ax * ax + sin_phi(w) ** 2 * ay * ay)
    if dist == DIST_BECKMANN:
        a = 1.0 / jnp.maximum(alpha * abs_tan, 1e-12)
        lam = jnp.where(a >= 1.6, 0.0,
                        (1.0 - 1.259 * a + 0.396 * a * a) / (3.535 * a + 2.181 * a * a))
    else:
        a2t2 = (alpha * abs_tan) ** 2
        lam = (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0
    return jnp.where(jnp.isfinite(abs_tan), lam, 0.0)


def mf_g1(dist, ax, ay, w):
    return 1.0 / (1.0 + mf_lambda(dist, ax, ay, w))


def mf_g(dist, ax, ay, wo, wi):
    return 1.0 / (1.0 + mf_lambda(dist, ax, ay, wo) + mf_lambda(dist, ax, ay, wi))


def mf_sample_wh(dist, ax, ay, wo, u2):
    """Sample a half vector. GGX: visible-normal sampling (Heitz 2018);
    Beckmann: full-D inversion (microfacet.rs:60-110)."""
    ax, ay = _alpha_clamp(ax), _alpha_clamp(ay)
    if dist == DIST_BECKMANN:
        log_u = jnp.log(jnp.maximum(1.0 - u2[..., 0], 1e-10))
        phi = jnp.arctan2(ay * jnp.sin(2.0 * PI * u2[..., 1] + 0.5 * PI),
                          ax * jnp.cos(2.0 * PI * u2[..., 1] + 0.5 * PI))
        cp, sp = jnp.cos(phi), jnp.sin(phi)
        t2 = -log_u / jnp.maximum(cp * cp / (ax * ax) + sp * sp / (ay * ay), 1e-12)
        ct = 1.0 / jnp.sqrt(1.0 + t2)
        st = safe_sqrt(1.0 - ct * ct)
        wh = vm.spherical_direction(st, ct, phi)
        return jnp.where(same_hemisphere(wo, wh)[..., None], wh, -wh)
    # GGX VNDF (flip wo to upper hemisphere, sample, flip back)
    flip = wo[..., 2] < 0.0
    w = jnp.where(flip[..., None], -wo, wo)
    vh = vm.normalize(jnp.stack([ax * w[..., 0], ay * w[..., 1], w[..., 2]], axis=-1))
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    t1 = jnp.where(lensq[..., None] > 1e-12,
                   jnp.stack([-vh[..., 1], vh[..., 0], jnp.zeros_like(lensq)], axis=-1)
                   / jnp.sqrt(jnp.maximum(lensq, 1e-12))[..., None],
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], Float), vh.shape))
    t2v = vm.cross(vh, t1)
    r = jnp.sqrt(u2[..., 0])
    phi = 2.0 * PI * u2[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * safe_sqrt(1.0 - p1 * p1) + s * p2
    p3 = safe_sqrt(1.0 - p1 * p1 - p2 * p2)
    nh = p1[..., None] * t1 + p2[..., None] * t2v + p3[..., None] * vh
    wh = vm.normalize(jnp.stack([ax * nh[..., 0], ay * nh[..., 1],
                                 jnp.maximum(nh[..., 2], 1e-6)], axis=-1))
    return jnp.where(flip[..., None], -wh, wh)


def mf_pdf(dist, ax, ay, wo, wh):
    """pdf of mf_sample_wh w.r.t. solid angle of wh."""
    if dist == DIST_BECKMANN:
        return mf_d(dist, ax, ay, wh) * abs_cos_theta(wh)
    return mf_d(dist, ax, ay, wh) * mf_g1(dist, ax, ay, wo) * vm.absdot(wo, wh) \
        / jnp.maximum(abs_cos_theta(wo), 1e-8)


# ----------------------------------------------------------- BxDF lobes
# Each lobe: f(...)->(...,3) | sample(...)->(wi, f, pdf) | pdf(...)

def lambertian_f(r, wo, wi):
    """(reflection.rs:821-855)"""
    val = r * INV_PI
    return jnp.where(same_hemisphere(wo, wi)[..., None], val, 0.0)


def lambertian_sample(r, wo, u2):
    wi = cosine_sample_hemisphere(u2)
    wi = jnp.where((wo[..., 2] < 0.0)[..., None],
                   wi * jnp.array([1.0, 1.0, -1.0], Float), wi)
    pdf = abs_cos_theta(wi) * INV_PI
    return wi, r * INV_PI, pdf


def lambertian_pdf(wo, wi):
    return jnp.where(same_hemisphere(wo, wi), abs_cos_theta(wi) * INV_PI, 0.0)


def lambertian_transmission_f(t, wo, wi):
    """(reflection.rs:857-915)"""
    val = t * INV_PI
    return jnp.where(~same_hemisphere(wo, wi)[..., None], val, 0.0)


def lambertian_transmission_sample(t, wo, u2):
    wi = cosine_sample_hemisphere(u2)
    # flip into the opposite hemisphere of wo
    wi = jnp.where((wo[..., 2] > 0.0)[..., None],
                   wi * jnp.array([1.0, 1.0, -1.0], Float), wi)
    pdf = abs_cos_theta(wi) * INV_PI
    return wi, t * INV_PI, pdf


def lambertian_transmission_pdf(wo, wi):
    return jnp.where(~same_hemisphere(wo, wi), abs_cos_theta(wi) * INV_PI, 0.0)


def oren_nayar_f(r, sigma_deg, wo, wi):
    """(reflection.rs:917-975)"""
    sigma = jnp.deg2rad(sigma_deg)
    s2 = sigma * sigma
    a = 1.0 - s2 / (2.0 * (s2 + 0.33))
    b = 0.45 * s2 / (s2 + 0.09)
    sin_ti, sin_to = sin_theta(wi), sin_theta(wo)
    cos_dphi = cos_phi(wi) * cos_phi(wo) + sin_phi(wi) * sin_phi(wo)
    max_cos = jnp.maximum(0.0, cos_dphi)
    abs_ci, abs_co = abs_cos_theta(wi), abs_cos_theta(wo)
    big = abs_ci > abs_co
    sin_alpha = jnp.where(big, sin_to, sin_ti)
    tan_beta = jnp.where(big, sin_ti / jnp.maximum(abs_ci, 1e-6),
                         sin_to / jnp.maximum(abs_co, 1e-6))
    val = r * (INV_PI * (a + b * max_cos * sin_alpha * tan_beta))[..., None]
    return jnp.where(same_hemisphere(wo, wi)[..., None], val, 0.0)


def microfacet_reflection_f(rs, dist, ax, ay, fresnel_fn, wo, wi):
    """Torrance–Sparrow (reflection.rs:977-1056). fresnel_fn(cos)->(...,3)."""
    co, ci = abs_cos_theta(wo), abs_cos_theta(wi)
    wh = wi + wo
    degenerate = (ci == 0.0) | (co == 0.0) | (vm.length_squared(wh) == 0.0)
    wh_n = vm.normalize(wh)
    f = fresnel_fn(vm.dot(wi, vm.face_forward(wh_n, jnp.broadcast_to(jnp.array([0., 0., 1.], Float), wh_n.shape))))
    d = mf_d(dist, ax, ay, wh_n)
    g = mf_g(dist, ax, ay, wo, wi)
    val = rs * f * (d * g / jnp.maximum(4.0 * co * ci, 1e-8))[..., None]
    ok = same_hemisphere(wo, wi) & ~degenerate
    return jnp.where(ok[..., None], val, 0.0)


def microfacet_reflection_sample(rs, dist, ax, ay, fresnel_fn, wo, u2):
    wh = mf_sample_wh(dist, ax, ay, wo, u2)
    wi = vm.reflect(wo, wh)
    pdf = mf_pdf(dist, ax, ay, wo, wh) / jnp.maximum(4.0 * vm.absdot(wo, wh), 1e-8)
    ok = same_hemisphere(wo, wi) & (vm.dot(wo, wh) > 0.0)
    f = microfacet_reflection_f(rs, dist, ax, ay, fresnel_fn, wo, wi)
    return wi, jnp.where(ok[..., None], f, 0.0), jnp.where(ok, pdf, 0.0)


def microfacet_reflection_pdf(dist, ax, ay, wo, wi):
    wh = vm.normalize(wo + wi)
    pdf = mf_pdf(dist, ax, ay, wo, wh) / jnp.maximum(4.0 * vm.absdot(wo, wh), 1e-8)
    return jnp.where(same_hemisphere(wo, wi), pdf, 0.0)


def microfacet_transmission_f(ts, dist, ax, ay, eta_a, eta_b, wo, wi, mode_radiance=True):
    """(reflection.rs:1058-1192)"""
    co, ci = cos_theta(wo), cos_theta(wi)
    eta = jnp.where(co > 0.0, eta_b / eta_a, eta_a / eta_b)
    wh = vm.normalize(wo + wi * eta[..., None])
    wh = vm.face_forward(wh, jnp.broadcast_to(jnp.array([0., 0., 1.], Float), wh.shape))
    denom_ok = (vm.dot(wo, wh) * vm.dot(wi, wh)) <= 0.0
    fr = fresnel_dielectric(vm.dot(wo, wh), eta_a, eta_b)
    d = mf_d(dist, ax, ay, wh)
    g = mf_g(dist, ax, ay, wo, wi)
    sqrt_denom = vm.dot(wo, wh) + eta * vm.dot(wi, wh)
    factor = (1.0 / jnp.maximum(eta, 1e-8)) if mode_radiance else jnp.ones_like(eta)
    scalar = jnp.abs(d * g * eta * eta * vm.absdot(wi, wh) * vm.absdot(wo, wh)
                     * factor * factor
                     / jnp.maximum(jnp.abs(ci * co) * sqrt_denom * sqrt_denom, 1e-10))
    val = (1.0 - fr)[..., None] * ts * scalar[..., None]
    ok = (~same_hemisphere(wo, wi)) & (ci != 0.0) & (co != 0.0) & denom_ok
    return jnp.where(ok[..., None], val, 0.0)


def microfacet_transmission_sample(ts, dist, ax, ay, eta_a, eta_b, wo, u2):
    wh = mf_sample_wh(dist, ax, ay, wo, u2)
    eta = jnp.where(cos_theta(wo) > 0.0, eta_a / eta_b, eta_b / eta_a)
    ok_side = vm.dot(wo, wh) > 0.0
    refr_ok, wi = vm.refract(wo, vm.face_forward(wh, wo), eta)
    f = microfacet_transmission_f(ts, dist, ax, ay, eta_a, eta_b, wo, wi)
    pdf = microfacet_transmission_pdf(dist, ax, ay, eta_a, eta_b, wo, wi)
    ok = ok_side & refr_ok
    return wi, jnp.where(ok[..., None], f, 0.0), jnp.where(ok, pdf, 0.0)


def microfacet_transmission_pdf(dist, ax, ay, eta_a, eta_b, wo, wi):
    co = cos_theta(wo)
    eta = jnp.where(co > 0.0, eta_b / eta_a, eta_a / eta_b)
    wh = vm.normalize(wo + wi * eta[..., None])
    sqrt_denom = vm.dot(wo, wh) + eta * vm.dot(wi, wh)
    dwh_dwi = jnp.abs((eta * eta * vm.dot(wi, wh)) / jnp.maximum(sqrt_denom * sqrt_denom, 1e-10))
    pdf = mf_pdf(dist, ax, ay, wo, vm.face_forward(wh, jnp.broadcast_to(jnp.array([0., 0., 1.], Float), wh.shape))) * dwh_dwi
    return jnp.where(~same_hemisphere(wo, wi), pdf, 0.0)


def fresnel_blend_f(rd, rs, dist, ax, ay, wo, wi):
    """Ashikhmin–Shirley substrate (reflection.rs:1194-1280)."""
    def pow5(v):
        return (v * v) * (v * v) * v
    diffuse = (28.0 / (23.0 * PI)) * rd * (1.0 - rs) * \
        ((1.0 - pow5(1.0 - 0.5 * abs_cos_theta(wi))) *
         (1.0 - pow5(1.0 - 0.5 * abs_cos_theta(wo))))[..., None]
    wh = wi + wo
    wh_ok = vm.length_squared(wh) > 1e-12
    wh_n = vm.normalize(wh)
    d = mf_d(dist, ax, ay, wh_n)
    spec = (d / jnp.maximum(4.0 * vm.absdot(wi, wh_n) *
                            jnp.maximum(abs_cos_theta(wi), abs_cos_theta(wo)), 1e-8))[..., None] \
        * fresnel_schlick(vm.dot(wi, wh_n), rs)
    val = diffuse + jnp.where(wh_ok[..., None], spec, 0.0)
    return jnp.where(same_hemisphere(wo, wi)[..., None], val, 0.0)


def fresnel_blend_sample(rd, rs, dist, ax, ay, wo, u2, u_lobe):
    # half the samples diffuse, half microfacet (reflection.rs sample_f)
    use_spec = u_lobe < 0.5
    wi_d = cosine_sample_hemisphere(u2)
    wi_d = jnp.where((wo[..., 2] < 0.0)[..., None], wi_d * jnp.array([1., 1., -1.], Float), wi_d)
    wh = mf_sample_wh(dist, ax, ay, wo, u2)
    wi_s = vm.reflect(wo, wh)
    wi = jnp.where(use_spec[..., None], wi_s, wi_d)
    f = fresnel_blend_f(rd, rs, dist, ax, ay, wo, wi)
    pdf = fresnel_blend_pdf(dist, ax, ay, wo, wi)
    ok = same_hemisphere(wo, wi)
    return wi, jnp.where(ok[..., None], f, 0.0), jnp.where(ok, pdf, 0.0)


def fresnel_blend_pdf(dist, ax, ay, wo, wi):
    wh = vm.normalize(wo + wi)
    pdf_wh = mf_pdf(dist, ax, ay, wo, wh)
    pdf = 0.5 * (abs_cos_theta(wi) * INV_PI + pdf_wh / jnp.maximum(4.0 * vm.absdot(wo, wh), 1e-8))
    return jnp.where(same_hemisphere(wo, wi), pdf, 0.0)


# specular (delta) lobes — handled via sample only; f()=0, pdf()=0

def specular_reflection_sample(r, fresnel_fn, wo):
    """(reflection.rs:614-659)"""
    wi = reflect_local(wo)
    ci = abs_cos_theta(wi)
    f = fresnel_fn(cos_theta(wi)) * r / jnp.maximum(ci, 1e-8)[..., None]
    return wi, f, jnp.ones(wo.shape[:-1], Float)


def specular_transmission_sample(t, eta_a, eta_b, wo, mode_radiance=True):
    """(reflection.rs:661-731)"""
    entering = cos_theta(wo) > 0.0
    ei = jnp.where(entering, eta_a, eta_b)
    et = jnp.where(entering, eta_b, eta_a)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], Float), wo.shape)
    n = vm.face_forward(n, wo)
    ok, wi = vm.refract(wo, n, ei / et)
    fr = fresnel_dielectric(cos_theta(wo), eta_a, eta_b)
    scale = jnp.where(mode_radiance, (ei * ei) / jnp.maximum(et * et, 1e-12), 1.0)
    f = (1.0 - fr)[..., None] * t * (scale / jnp.maximum(abs_cos_theta(wi), 1e-8))[..., None]
    return wi, jnp.where(ok[..., None], f, 0.0), jnp.where(ok, 1.0, 0.0), ok


def fresnel_specular_sample(r, t, eta_a, eta_b, wo, u, mode_radiance=True):
    """Dielectric with stochastic R/T choice (reflection.rs:733-819).
    Returns (wi, f, pdf, is_transmission)."""
    fr = fresnel_dielectric(cos_theta(wo), eta_a, eta_b)
    choose_r = u < fr
    wi_r = reflect_local(wo)
    f_r = (fr / jnp.maximum(abs_cos_theta(wi_r), 1e-8))[..., None] * r
    wi_t, f_t_full, pdf_t_ok, ok_t = specular_transmission_sample(t, eta_a, eta_b, wo, mode_radiance)
    # rescale: choosing T with prob (1-fr); f already contains (1-fr)
    wi = jnp.where(choose_r[..., None], wi_r, wi_t)
    f = jnp.where(choose_r[..., None], f_r, f_t_full)
    pdf = jnp.where(choose_r, fr, (1.0 - fr) * pdf_t_ok)
    return wi, f, pdf, ~choose_r & ok_t
