"""Material table + wavefront BSDF dispatch.

TPU-native counterpart of src/core/material.rs + src/materials/. In the
reference only Disney has a struct and ALL concrete materials are stubs
(src/materials/matte.rs:1 … uber.rs:1, disney.rs:82 todo!()); we implement
the standard PBRT-v3 material set directly from the BxDF lobes in
reflection.rs (which the reference does carry):

  matte       → Lambertian / Oren–Nayar            (matte.rs)
  plastic     → Lambertian + GGX dielectric         (plastic.rs)
  glass       → FresnelSpecular or rough GGX R+T    (glass.rs)
  metal       → GGX conductor                       (metal.rs)
  mirror      → specular reflection                 (mirror.rs)
  substrate   → FresnelBlend (Ashikhmin–Shirley)    (substrate.rs)
  translucent → diffuse+glossy reflection+transmission (translucent.rs)
  uber        → kd+ks+kr+kt with opacity            (uber.rs)

Dispatch is data-parallel: the table stores a `kind` id per material; the
shade stage evaluates the lobes of each kind *present in the scene*
(static set) under lane masks — polymorphism without vtables.

Texture hooks: each spatially-varying parameter has a `*_tex` id column
(-1 = use the constant column); `resolve` applies texture lookups.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Float, Int, PI, INV_PI
from ..core import vecmath as vm
from . import bxdf

MAT_MATTE = 0
MAT_PLASTIC = 1
MAT_GLASS = 2
MAT_METAL = 3
MAT_MIRROR = 4
MAT_SUBSTRATE = 5
MAT_TRANSLUCENT = 6
MAT_UBER = 7
MAT_DISNEY = 8
MAT_MIX = 9
MAT_SUBSURFACE = 10
MAT_HAIR = 11
MAT_FOURIER = 12

_SPECULAR_KINDS = (MAT_GLASS, MAT_MIRROR, MAT_UBER)  # may sample delta lobes


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MaterialTable:
    kind: jnp.ndarray            # (M,) int32
    kd: jnp.ndarray              # (M, 3) diffuse / base reflectance
    ks: jnp.ndarray              # (M, 3) glossy reflectance
    kr: jnp.ndarray              # (M, 3) specular reflectance (mirror/uber)
    kt: jnp.ndarray              # (M, 3) transmittance
    roughness: jnp.ndarray       # (M, 2) u/v roughness (0 → perfect specular)
    eta: jnp.ndarray             # (M,) dielectric IOR (or conductor eta scale)
    metal_eta: jnp.ndarray       # (M, 3) conductor eta
    metal_k: jnp.ndarray         # (M, 3) conductor absorption
    sigma: jnp.ndarray           # (M,) Oren–Nayar sigma (degrees)
    opacity: jnp.ndarray         # (M, 3) uber opacity
    remap_roughness: jnp.ndarray  # (M,) bool
    kd_tex: jnp.ndarray          # (M,) int32 texture id or -1
    ks_tex: jnp.ndarray
    kr_tex: jnp.ndarray
    kt_tex: jnp.ndarray
    roughness_tex: jnp.ndarray
    sigma_tex: jnp.ndarray
    bump_tex: jnp.ndarray
    # kind-specific extras: disney [metallic, specTint, sheen, sheenTint,
    # clearcoat, ccGloss]; mix [mat1, mat2]; subsurface [scale, bssrdf]
    aux: jnp.ndarray             # (M, 8)
    kinds_present: tuple = field(metadata=dict(static=True), default=())
    has_bump: bool = field(metadata=dict(static=True), default=False)
    # channels with ANY texture id >= 0 — static, so `resolve` skips the
    # texture evaluation (incl. its atlas gathers) for untextured
    # channels entirely instead of masking it out after the fact
    tex_channels: tuple = field(metadata=dict(static=True), default=())
    # beam-diffusion BSSRDF profile (shade/bssrdf.BSSRDFTable) when the
    # scene has MAT_SUBSURFACE rows; None otherwise
    sss_table: Any = None
    # shade/fourier.FourierTable when the scene has MAT_FOURIER rows
    # (reflection.rs:1282-1300; one measured table per scene)
    fourier_table: Any = None
    # per-material medium interface (primitive.rs MediumInterface /
    # medium.rs semantics): medium id entered when transmitting INTO the
    # surface (against ng) / OUT of it; -1 = vacuum. None (no row sets
    # one) keeps volpath's global-medium behavior.
    med_inside: Any = None   # (M,) int32 or None
    med_outside: Any = None  # (M,) int32 or None

    @property
    def count(self):
        return self.kind.shape[0]


def build_materials(rows):
    """rows: list of dicts with keys kind, kd, ks, kr, kt, roughness, eta,
    metal_eta, metal_k, sigma, opacity, remap_roughness + *_tex ids."""
    m = len(rows)

    def col(key, default, shape=()):
        out = np.zeros((m,) + shape, np.float32)
        for i, r in enumerate(rows):
            v = r.get(key, default)
            out[i] = np.broadcast_to(np.asarray(v, np.float32), shape) if shape else v
        return jnp.asarray(out)

    def icol(key, default=-1):
        return jnp.asarray(np.array([r.get(key, default) for r in rows], np.int32))

    kinds = tuple(sorted({int(r["kind"]) for r in rows})) if rows else ()
    tex_channels = tuple(ch for ch in ("kd", "ks", "kr", "kt", "roughness", "sigma")
                         if any(r.get(ch + "_tex", -1) >= 0 for r in rows))
    fourier_table = None
    for r in rows:
        if int(r["kind"]) == MAT_FOURIER:
            fourier_table = r.get("fourier_table")
    has_iface = any("med_inside" in r or "med_outside" in r for r in rows)
    med_inside = icol("med_inside", -1) if has_iface else None
    med_outside = icol("med_outside", -1) if has_iface else None
    sss_table = None
    if MAT_SUBSURFACE in kinds:
        from . import bssrdf as bssr
        sss_rows = [r for r in rows if int(r["kind"]) == MAT_SUBSURFACE]
        g = float(sss_rows[0].get("aux", [0.0] * 8)[6]) if sss_rows else 0.0
        eta = float(sss_rows[0].get("eta", 1.33))
        sss_table = bssr.compute_beam_diffusion_table(g=g, eta=eta)
    return MaterialTable(
        kind=icol("kind", MAT_MATTE),
        kd=col("kd", 0.5, (3,)), ks=col("ks", 0.0, (3,)),
        kr=col("kr", 0.0, (3,)), kt=col("kt", 0.0, (3,)),
        roughness=col("roughness", 0.0, (2,)),
        eta=col("eta", 1.5), metal_eta=col("metal_eta", 0.2, (3,)),
        metal_k=col("metal_k", 3.9, (3,)), sigma=col("sigma", 0.0),
        opacity=col("opacity", 1.0, (3,)),
        remap_roughness=jnp.asarray(np.array([bool(r.get("remap_roughness", True)) for r in rows])),
        kd_tex=icol("kd_tex"), ks_tex=icol("ks_tex"), kr_tex=icol("kr_tex"),
        kt_tex=icol("kt_tex"), roughness_tex=icol("roughness_tex"),
        sigma_tex=icol("sigma_tex"), bump_tex=icol("bump_tex"),
        aux=col("aux", 0.0, (8,)),
        kinds_present=kinds,
        has_bump=any(r.get("bump_tex", -1) >= 0 for r in rows),
        tex_channels=tex_channels,
        sss_table=sss_table,
        fourier_table=fourier_table,
        med_inside=med_inside,
        med_outside=med_outside,
    )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LaneParams:
    """Per-lane resolved material parameters."""
    kind: jnp.ndarray
    kd: jnp.ndarray
    ks: jnp.ndarray
    kr: jnp.ndarray
    kt: jnp.ndarray
    ax: jnp.ndarray
    ay: jnp.ndarray
    eta: jnp.ndarray
    metal_eta: jnp.ndarray
    metal_k: jnp.ndarray
    sigma: jnp.ndarray
    opacity: jnp.ndarray
    rough_is_zero: jnp.ndarray
    aux: jnp.ndarray
    fourier: Any = None          # shade.fourier.FourierTable (MAT_FOURIER)


def resolve(mats: MaterialTable, mid, uv=None, p=None, textures=None, fp=None):
    """Gather per-lane parameters for material ids `mid` (N,), applying
    texture lookups where a *_tex id is set (material.rs compute-
    scattering analog, minus lobe allocation). `fp` = per-lane texture
    footprint in uv units (ray-cone LOD for mipmapped lookups)."""
    mid = jnp.maximum(mid, 0)
    kd = mats.kd[mid]
    ks = mats.ks[mid]
    kr = mats.kr[mid]
    kt = mats.kt[mid]
    rough = mats.roughness[mid]
    sigma = mats.sigma[mid]
    if textures is not None and uv is not None:
        from . import textures as texmod
        ch = mats.tex_channels     # static: untextured channels skip the
        #                            evaluation (and its atlas gathers)
        if "kd" in ch:
            kd = texmod.apply_tex(textures, mats.kd_tex[mid], uv, p, kd, fp=fp)
        if "ks" in ch:
            ks = texmod.apply_tex(textures, mats.ks_tex[mid], uv, p, ks, fp=fp)
        if "kr" in ch:
            kr = texmod.apply_tex(textures, mats.kr_tex[mid], uv, p, kr, fp=fp)
        if "kt" in ch:
            kt = texmod.apply_tex(textures, mats.kt_tex[mid], uv, p, kt, fp=fp)
        if "roughness" in ch:
            rough_rgb = texmod.apply_tex(textures, mats.roughness_tex[mid], uv, p,
                                         jnp.concatenate([rough, rough[..., :1]], axis=-1),
                                         fp=fp)
            rough = rough_rgb[..., :2]
        if "sigma" in ch:
            sigma = texmod.apply_tex(textures, mats.sigma_tex[mid], uv, p,
                                     sigma[..., None] * jnp.ones((1, 3), Float),
                                     fp=fp)[..., 0]
    rough_is_zero = jnp.max(rough, axis=-1) < 1e-5
    remap = mats.remap_roughness[mid]
    ax = jnp.where(remap, bxdf.roughness_to_alpha(rough[..., 0]), rough[..., 0])
    ay = jnp.where(remap, bxdf.roughness_to_alpha(rough[..., 1]), rough[..., 1])
    return LaneParams(
        kind=mats.kind[mid], kd=kd, ks=ks, kr=kr, kt=kt,
        ax=ax, ay=ay, eta=mats.eta[mid],
        metal_eta=mats.metal_eta[mid], metal_k=mats.metal_k[mid],
        sigma=sigma, opacity=mats.opacity[mid],
        rough_is_zero=rough_is_zero, aux=mats.aux[mid],
        fourier=mats.fourier_table)


# ------------------------------------------------------------- dispatch
# Each kind contributes (f, pdf, sample) in the shading-local frame; the
# wavefront combines kinds present in the scene under lane masks.

_GGX = bxdf.DIST_GGX


def _diel_fresnel(eta):
    return lambda c: fresnel_rgb(bxdf.fresnel_dielectric(c, jnp.ones_like(eta), eta))


def fresnel_rgb(fr):
    return jnp.repeat(fr[..., None], 3, axis=-1)


def _matte_f(lp, wo, wi):
    return bxdf.oren_nayar_f(lp.kd, lp.sigma, wo, wi)


def _matte_pdf(lp, wo, wi):
    return bxdf.lambertian_pdf(wo, wi)


def _matte_sample(lp, wo, u_lobe, u2):
    wi, _, pdf = bxdf.lambertian_sample(lp.kd, wo, u2)
    return wi, _matte_f(lp, wo, wi), pdf, jnp.zeros(pdf.shape, bool), jnp.zeros(pdf.shape, bool)


def _plastic_f(lp, wo, wi):
    fr = _diel_fresnel(lp.eta)
    return bxdf.lambertian_f(lp.kd, wo, wi) + \
        bxdf.microfacet_reflection_f(lp.ks, _GGX, lp.ax, lp.ay, fr, wo, wi)


def _plastic_pdf(lp, wo, wi):
    return 0.5 * (bxdf.lambertian_pdf(wo, wi) +
                  bxdf.microfacet_reflection_pdf(_GGX, lp.ax, lp.ay, wo, wi))


def _plastic_sample(lp, wo, u_lobe, u2):
    use_spec = u_lobe < 0.5
    wi_d, _, _ = bxdf.lambertian_sample(lp.kd, wo, u2)
    wh = bxdf.mf_sample_wh(_GGX, lp.ax, lp.ay, wo, u2)
    wi_s = vm.reflect(wo, wh)
    wi = jnp.where(use_spec[..., None], wi_s, wi_d)
    f = _plastic_f(lp, wo, wi)
    pdf = _plastic_pdf(lp, wo, wi)
    ok = bxdf.same_hemisphere(wo, wi)
    z = jnp.zeros(pdf.shape, bool)
    return wi, jnp.where(ok[..., None], f, 0.0), jnp.where(ok, pdf, 0.0), z, z


def _glass_f(lp, wo, wi):
    fr = _diel_fresnel(lp.eta)
    rough = bxdf.microfacet_reflection_f(lp.kr, _GGX, lp.ax, lp.ay, fr, wo, wi) + \
        bxdf.microfacet_transmission_f(lp.kt, _GGX, lp.ax, lp.ay,
                                       jnp.ones_like(lp.eta), lp.eta, wo, wi)
    return jnp.where(lp.rough_is_zero[..., None], 0.0, rough)


def _glass_pdf(lp, wo, wi):
    pdf = 0.5 * (bxdf.microfacet_reflection_pdf(_GGX, lp.ax, lp.ay, wo, wi) +
                 bxdf.microfacet_transmission_pdf(_GGX, lp.ax, lp.ay,
                                                  jnp.ones_like(lp.eta), lp.eta, wo, wi))
    return jnp.where(lp.rough_is_zero, 0.0, pdf)


def _glass_sample(lp, wo, u_lobe, u2):
    one = jnp.ones_like(lp.eta)
    # delta branch
    wi_d, f_d, pdf_d, trans_d = bxdf.fresnel_specular_sample(lp.kr, lp.kt, one, lp.eta, wo, u_lobe)
    # rough branch: choose R/T by 0.5
    use_t = u_lobe >= 0.5
    fr = _diel_fresnel(lp.eta)
    wi_r, _, _ = bxdf.microfacet_reflection_sample(lp.kr, _GGX, lp.ax, lp.ay, fr, wo, u2)
    wi_t, _, _ = bxdf.microfacet_transmission_sample(lp.kt, _GGX, lp.ax, lp.ay, one, lp.eta, wo, u2)
    wi_rough = jnp.where(use_t[..., None], wi_t, wi_r)
    f_rough = _glass_f(lp, wo, wi_rough)
    pdf_rough = _glass_pdf(lp, wo, wi_rough)
    is0 = lp.rough_is_zero
    wi = jnp.where(is0[..., None], wi_d, wi_rough)
    f = jnp.where(is0[..., None], f_d, f_rough)
    pdf = jnp.where(is0, pdf_d, pdf_rough)
    trans = jnp.where(is0, trans_d, use_t & (~bxdf.same_hemisphere(wo, wi_rough)))
    return wi, f, pdf, is0, trans


def _metal_f(lp, wo, wi):
    fr = lambda c: bxdf.fresnel_conductor(c, jnp.ones_like(lp.eta), lp.metal_eta, lp.metal_k)
    return bxdf.microfacet_reflection_f(lp.ks, _GGX, lp.ax, lp.ay, fr, wo, wi)


def _metal_pdf(lp, wo, wi):
    return bxdf.microfacet_reflection_pdf(_GGX, lp.ax, lp.ay, wo, wi)


def _metal_sample(lp, wo, u_lobe, u2):
    fr = lambda c: bxdf.fresnel_conductor(c, jnp.ones_like(lp.eta), lp.metal_eta, lp.metal_k)
    wi, f, pdf = bxdf.microfacet_reflection_sample(lp.ks, _GGX, lp.ax, lp.ay, fr, wo, u2)
    z = jnp.zeros(pdf.shape, bool)
    return wi, f, pdf, z, z


def _mirror_sample(lp, wo, u_lobe, u2):
    wi, f, pdf = bxdf.specular_reflection_sample(lp.kr, lambda c: jnp.ones(wo.shape, Float), wo)
    return wi, f, pdf, jnp.ones(pdf.shape, bool), jnp.zeros(pdf.shape, bool)


def _substrate_f(lp, wo, wi):
    return bxdf.fresnel_blend_f(lp.kd, lp.ks, _GGX, lp.ax, lp.ay, wo, wi)


def _substrate_pdf(lp, wo, wi):
    return bxdf.fresnel_blend_pdf(_GGX, lp.ax, lp.ay, wo, wi)


def _substrate_sample(lp, wo, u_lobe, u2):
    wi, f, pdf = bxdf.fresnel_blend_sample(lp.kd, lp.ks, _GGX, lp.ax, lp.ay, wo, u2, u_lobe)
    z = jnp.zeros(pdf.shape, bool)
    return wi, f, pdf, z, z


def _translucent_f(lp, wo, wi):
    return bxdf.lambertian_f(lp.kd * lp.kr, wo, wi) + \
        bxdf.lambertian_transmission_f(lp.kd * lp.kt, wo, wi)


def _translucent_pdf(lp, wo, wi):
    return 0.5 * (bxdf.lambertian_pdf(wo, wi) + bxdf.lambertian_transmission_pdf(wo, wi))


def _translucent_sample(lp, wo, u_lobe, u2):
    use_t = u_lobe >= 0.5
    wi_r, _, _ = bxdf.lambertian_sample(lp.kd, wo, u2)
    wi_t, _, _ = bxdf.lambertian_transmission_sample(lp.kd, wo, u2)
    wi = jnp.where(use_t[..., None], wi_t, wi_r)
    f = _translucent_f(lp, wo, wi)
    pdf = _translucent_pdf(lp, wo, wi)
    return wi, f, pdf, jnp.zeros(pdf.shape, bool), use_t


def _uber_f(lp, wo, wi):
    fr = _diel_fresnel(lp.eta)
    return lp.opacity * (bxdf.lambertian_f(lp.kd, wo, wi) +
                         bxdf.microfacet_reflection_f(lp.ks, _GGX, lp.ax, lp.ay, fr, wo, wi))


def _uber_weights(lp):
    from ..core.spectrum import luminance
    wd = luminance(lp.kd)
    ws = luminance(lp.ks)
    wr = luminance(lp.kr) + luminance(1.0 - lp.opacity)
    tot = jnp.maximum(wd + ws + wr, 1e-8)
    return wd / tot, ws / tot, wr / tot


def _uber_pdf(lp, wo, wi):
    wd, ws, wr = _uber_weights(lp)
    return wd * bxdf.lambertian_pdf(wo, wi) + \
        ws * bxdf.microfacet_reflection_pdf(_GGX, lp.ax, lp.ay, wo, wi)


def _uber_sample(lp, wo, u_lobe, u2):
    wd, ws, wr = _uber_weights(lp)
    # stretch u_lobe across {diffuse, glossy, delta-reflect}
    pick_d = u_lobe < wd
    pick_s = (~pick_d) & (u_lobe < wd + ws)
    pick_r = (~pick_d) & (~pick_s)
    wi_d, _, _ = bxdf.lambertian_sample(lp.kd, wo, u2)
    fr = _diel_fresnel(lp.eta)
    wi_s, _, _ = bxdf.microfacet_reflection_sample(lp.ks, _GGX, lp.ax, lp.ay, fr, wo, u2)
    wi_r, f_r, _ = bxdf.specular_reflection_sample(lp.kr, fr, wo)
    wi = jnp.where(pick_d[..., None], wi_d, jnp.where(pick_s[..., None], wi_s, wi_r))
    f_smooth = _uber_f(lp, wo, wi)
    pdf_smooth = _uber_pdf(lp, wo, wi)
    f = jnp.where(pick_r[..., None], lp.opacity * f_r, f_smooth)
    pdf = jnp.where(pick_r, jnp.maximum(wr, 1e-8), pdf_smooth)
    return wi, f, pdf, pick_r, jnp.zeros(pdf.shape, bool)


def _disney_args(lp):
    a = lp.aux
    rough = jnp.maximum((lp.ax + lp.ay) * 0.5, 1e-3)  # pre-remapped alpha avg
    # use raw roughness column semantics: store roughness in aux[6]
    rough = jnp.maximum(a[..., 6], 1e-3)
    return (lp.kd, a[..., 0], rough, a[..., 1], a[..., 2], a[..., 3],
            a[..., 4], a[..., 5])


def _disney_f(lp, wo, wi):
    from . import disney as dz
    return dz.disney_f(*_disney_args(lp), wo, wi)


def _disney_pdf(lp, wo, wi):
    from . import disney as dz
    a = lp.aux
    return dz.disney_pdf(jnp.maximum(a[..., 6], 1e-3), a[..., 0], a[..., 4], wo, wi)


def _disney_sample(lp, wo, u_lobe, u2):
    from . import disney as dz
    wi, f, pdf = dz.disney_sample(*_disney_args(lp), wo, u_lobe, u2)
    z = jnp.zeros(pdf.shape, bool)
    return wi, f, pdf, z, z


def _hair_f(lp, wo, wi):
    """Kajiya–Kay hair shading (simplified stand-in for PBRT-v3's
    Marschner model; the reference's hair.rs is an empty stub). The hair
    tangent is the local x axis (dpdu along the fiber)."""
    sin_to = jnp.sqrt(jnp.maximum(1.0 - wo[..., 0] ** 2, 0.0))
    sin_ti = jnp.sqrt(jnp.maximum(1.0 - wi[..., 0] ** 2, 0.0))
    diffuse = lp.kd * INV_PI * sin_ti[..., None]
    spec_cos = jnp.maximum(-wo[..., 0] * wi[..., 0] + sin_to * sin_ti, 0.0)
    shine = 1.0 / jnp.maximum(lp.ax, 1e-3)
    spec = lp.ks * ((spec_cos ** shine) * (shine + 2.0) / (2.0 * PI))[..., None]
    return diffuse + spec


def _hair_pdf(lp, wo, wi):
    return jnp.full(wo.shape[:-1], 1.0 / (4.0 * PI), Float)


def _hair_sample(lp, wo, u_lobe, u2):
    from ..core.sampling import uniform_sample_sphere
    wi = uniform_sample_sphere(u2)
    f = _hair_f(lp, wo, wi)
    pdf = _hair_pdf(lp, wo, wi)
    z = jnp.zeros(pdf.shape, bool)
    return wi, f, pdf, z, z


# subsurface surface-interface lobes = smooth dielectric (glass path);
# the BSSRDF transport itself is handled by the integrator (shade/bssrdf)
_SUBSURF_F = _glass_f
_SUBSURF_PDF = _glass_pdf
_SUBSURF_SAMPLE = _glass_sample


def _fourier_f(lp, wo, wi):
    from . import fourier as fouriermod
    return fouriermod.fourier_f(lp.fourier, wo, wi)


def _fourier_pdf(lp, wo, wi):
    # cosine-hemisphere sampling on wo's reflection side (fourier.py)
    same = bxdf.same_hemisphere(wo, wi)
    return jnp.where(same, jnp.abs(wi[..., 2]) * INV_PI, 0.0)


def _fourier_sample(lp, wo, u_lobe, u2):
    from . import fourier as fouriermod
    wi, f, pdf = fouriermod.fourier_sample(lp.fourier, wo, u2)
    trans = ~bxdf.same_hemisphere(wo, wi)
    return wi, f, pdf, jnp.zeros(pdf.shape, bool), trans


_F_FNS = {MAT_MATTE: _matte_f, MAT_PLASTIC: _plastic_f, MAT_GLASS: _glass_f,
          MAT_METAL: _metal_f, MAT_MIRROR: lambda lp, wo, wi: jnp.zeros(wo.shape, Float),
          MAT_SUBSTRATE: _substrate_f, MAT_TRANSLUCENT: _translucent_f, MAT_UBER: _uber_f,
          MAT_DISNEY: _disney_f, MAT_SUBSURFACE: _SUBSURF_F, MAT_HAIR: _hair_f,
          MAT_FOURIER: _fourier_f}
_PDF_FNS = {MAT_MATTE: _matte_pdf, MAT_PLASTIC: _plastic_pdf, MAT_GLASS: _glass_pdf,
            MAT_METAL: _metal_pdf, MAT_MIRROR: lambda lp, wo, wi: jnp.zeros(wo.shape[:-1], Float),
            MAT_SUBSTRATE: _substrate_pdf, MAT_TRANSLUCENT: _translucent_pdf, MAT_UBER: _uber_pdf,
            MAT_DISNEY: _disney_pdf, MAT_SUBSURFACE: _SUBSURF_PDF, MAT_HAIR: _hair_pdf,
            MAT_FOURIER: _fourier_pdf}
_SAMPLE_FNS = {MAT_MATTE: _matte_sample, MAT_PLASTIC: _plastic_sample, MAT_GLASS: _glass_sample,
               MAT_METAL: _metal_sample, MAT_MIRROR: _mirror_sample,
               MAT_SUBSTRATE: _substrate_sample, MAT_TRANSLUCENT: _translucent_sample,
               MAT_UBER: _uber_sample, MAT_DISNEY: _disney_sample,
               MAT_SUBSURFACE: _SUBSURF_SAMPLE, MAT_HAIR: _hair_sample,
               MAT_FOURIER: _fourier_sample}


def _mix_sub_params(mats, lp, which):
    """LaneParams of the material referenced by a MIX row (aux[0]/aux[1])."""
    mid = lp.aux[..., which].astype(jnp.int32)
    return resolve(mats, jnp.maximum(mid, 0))


def evaluate_f(lp: LaneParams, kinds_present, wo, wi, _mats=None):
    """Non-delta BSDF value, local frame. Masked sum over kinds present."""
    out = jnp.zeros(wo.shape, Float)
    for k in kinds_present:
        if k == MAT_MIX:
            continue
        mask = (lp.kind == k)[..., None]
        out = jnp.where(mask, _F_FNS[k](lp, wo, wi), out)
    if MAT_MIX in kinds_present and _mats is not None:
        lp1 = _mix_sub_params(_mats, lp, 0)
        lp2 = _mix_sub_params(_mats, lp, 1)
        sub_kinds = tuple(k for k in range(12) if k != MAT_MIX)
        f1 = evaluate_f(lp1, sub_kinds, wo, wi)
        f2 = evaluate_f(lp2, sub_kinds, wo, wi)
        amt = lp.kd
        out = jnp.where((lp.kind == MAT_MIX)[..., None], amt * f1 + (1 - amt) * f2, out)
    return out


def pdf(lp: LaneParams, kinds_present, wo, wi):
    out = jnp.zeros(wo.shape[:-1], Float)
    for k in kinds_present:
        mask = lp.kind == k
        out = jnp.where(mask, _PDF_FNS[k](lp, wo, wi), out)
    return out


def sample(lp: LaneParams, kinds_present, wo, u_lobe, u2):
    """Sample the BSDF. Returns (wi, f, pdf, is_specular, is_transmission)."""
    n = wo.shape[:-1]
    wi = jnp.zeros(wo.shape, Float)
    f = jnp.zeros(wo.shape, Float)
    pdf_out = jnp.zeros(n, Float)
    spec = jnp.zeros(n, bool)
    trans = jnp.zeros(n, bool)
    for k in kinds_present:
        mask = lp.kind == k
        wi_k, f_k, pdf_k, spec_k, trans_k = _SAMPLE_FNS[k](lp, wo, u_lobe, u2)
        wi = jnp.where(mask[..., None], wi_k, wi)
        f = jnp.where(mask[..., None], f_k, f)
        pdf_out = jnp.where(mask, pdf_k, pdf_out)
        spec = jnp.where(mask, spec_k, spec)
        trans = jnp.where(mask, trans_k, trans)
    return wi, f, pdf_out, spec, trans


def eta_scale_on_transmit(lp: LaneParams, wo_z):
    """eta² factor applied to the RR throughput on specular transmission
    (path.rs:140-152 etaScale semantics)."""
    eta = lp.eta
    return jnp.where(wo_z > 0.0, eta * eta, 1.0 / jnp.maximum(eta * eta, 1e-8))
