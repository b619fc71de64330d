"""Disney principled BSDF.

TPU-native counterpart of src/materials/disney.rs (the only material the
reference gives a struct — its evaluation is todo!(), disney.rs:82; we
implement the PBRT-v3 DisneyMaterial model): diffuse + retro-reflection
+ sheen + GGX metallic/specular lobe + clearcoat GTR1, parameterised by
baseColor/metallic/roughness/specTint/sheen/sheenTint/clearcoat/
clearcoatGloss. (specTrans/thin are future work.) Local-frame batched.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.types import Float, PI, INV_PI, clamp, lerp, safe_sqrt
from ..core import vecmath as vm
from ..core.spectrum import luminance
from ..core.sampling import cosine_sample_hemisphere
from . import bxdf


def _schlick_weight(c):
    m = clamp(1.0 - c, 0.0, 1.0)
    return (m * m) * (m * m) * m


def _gtr1(cos_theta_h, alpha):
    a2 = alpha * alpha
    denom = PI * jnp.log(jnp.maximum(a2, 1e-6)) * (1.0 + (a2 - 1.0) * cos_theta_h ** 2)
    return (a2 - 1.0) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)


def _smith_g_ggx(cos_v, alpha):
    a2 = alpha * alpha
    b = cos_v * cos_v
    return 1.0 / jnp.maximum(cos_v + safe_sqrt(a2 + b - a2 * b), 1e-8)


def disney_f(base_color, metallic, roughness, spec_tint, sheen, sheen_tint,
             clearcoat, cc_gloss, wo, wi):
    """f(wo, wi) in the local frame; (..., 3)."""
    same = bxdf.same_hemisphere(wo, wi)
    co = bxdf.abs_cos_theta(wo)
    ci = bxdf.abs_cos_theta(wi)
    wh = vm.normalize(wo + wi)
    cos_d = vm.dot(wi, wh)

    lum = jnp.maximum(luminance(base_color), 1e-6)
    tint = base_color / lum[..., None]

    # diffuse + retro (Burley 2012)
    fo = _schlick_weight(co)
    fi = _schlick_weight(ci)
    f_d = base_color * INV_PI * ((1.0 - 0.5 * fo) * (1.0 - 0.5 * fi))[..., None]
    rr = 2.0 * roughness * cos_d * cos_d
    f_retro = base_color * INV_PI * (rr * (fo + fi + fo * fi * (rr - 1.0)))[..., None]

    # sheen
    c_sheen = lerp(sheen_tint[..., None], jnp.ones_like(tint), tint)
    f_sheen = sheen[..., None] * c_sheen * _schlick_weight(cos_d)[..., None]

    # specular GGX
    alpha = jnp.maximum(roughness * roughness, 1e-3)
    d_s = bxdf.mf_d(bxdf.DIST_GGX, alpha, alpha, wh)
    c_spec0 = lerp(metallic[..., None],
                   0.08 * lerp(spec_tint[..., None], jnp.ones_like(tint), tint),
                   base_color)
    f_spec_fresnel = c_spec0 + (1.0 - c_spec0) * _schlick_weight(cos_d)[..., None]
    g_s = _smith_g_ggx(co, alpha) * _smith_g_ggx(ci, alpha)
    f_spec = f_spec_fresnel * (d_s * g_s / 4.0)[..., None]
    # note: the 1/(4 cos cos) is folded into g here (UE4-style G/(4..))

    # clearcoat GTR1
    a_cc = lerp(cc_gloss, 0.1, 0.001)
    d_cc = _gtr1(bxdf.abs_cos_theta(wh), a_cc)
    f_cc_fr = 0.04 + 0.96 * _schlick_weight(cos_d)
    g_cc = _smith_g_ggx(co, 0.25) * _smith_g_ggx(ci, 0.25)
    f_cc = (0.25 * clearcoat * d_cc * f_cc_fr * g_cc)[..., None]

    diffuse_weight = (1.0 - metallic)[..., None]
    f_total = diffuse_weight * (f_d + f_retro + f_sheen) + f_spec + f_cc
    return jnp.where(same[..., None], f_total, 0.0)


def disney_pdf(roughness, metallic, clearcoat, wo, wi):
    same = bxdf.same_hemisphere(wo, wi)
    alpha = jnp.maximum(roughness * roughness, 1e-3)
    pdf_diff = bxdf.abs_cos_theta(wi) * INV_PI
    pdf_spec = bxdf.microfacet_reflection_pdf(bxdf.DIST_GGX, alpha, alpha, wo, wi)
    w_spec = 0.5 + 0.5 * metallic
    pdf = (1.0 - w_spec) * pdf_diff + w_spec * pdf_spec
    return jnp.where(same, pdf, 0.0)


def disney_sample(base_color, metallic, roughness, spec_tint, sheen, sheen_tint,
                  clearcoat, cc_gloss, wo, u_lobe, u2):
    alpha = jnp.maximum(roughness * roughness, 1e-3)
    w_spec = 0.5 + 0.5 * metallic
    use_spec = u_lobe < w_spec
    wi_d = cosine_sample_hemisphere(u2)
    wi_d = jnp.where((wo[..., 2] < 0.0)[..., None],
                     wi_d * jnp.array([1.0, 1.0, -1.0], Float), wi_d)
    wh = bxdf.mf_sample_wh(bxdf.DIST_GGX, alpha, alpha, wo, u2)
    wi_s = vm.reflect(wo, wh)
    wi = jnp.where(use_spec[..., None], wi_s, wi_d)
    f = disney_f(base_color, metallic, roughness, spec_tint, sheen, sheen_tint,
                 clearcoat, cc_gloss, wo, wi)
    pdf = disney_pdf(roughness, metallic, clearcoat, wo, wi)
    ok = bxdf.same_hemisphere(wo, wi)
    return wi, jnp.where(ok[..., None], f, 0.0), jnp.where(ok, pdf, 0.0)
