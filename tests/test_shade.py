"""BxDF physics tests: reciprocity, energy conservation, sampling
consistency; texture evaluation; light pdf consistency (SURVEY §4.1)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.shade import bxdf
from pbrt_tpu.shade import materials as mm
from pbrt_tpu.core import vecmath as vm


def _dirs(n, seed, up=True):
    r = np.random.RandomState(seed)
    v = r.randn(n, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    if up:
        v[:, 2] = np.abs(v[:, 2])
    return jnp.asarray(v, jnp.float32)


def test_lambertian_white_furnace():
    """∫ f cosθ dω = r for Lambertian (MC over cosine sampling)."""
    r_alb = jnp.asarray([[0.7, 0.5, 0.3]])
    n = 50000
    u = jnp.asarray(np.random.RandomState(0).rand(n, 2), jnp.float32)
    wo = jnp.tile(_dirs(1, 1), (n, 1))
    wi, f, pdf = bxdf.lambertian_sample(jnp.tile(r_alb, (n, 1)), wo, u)
    est = f * jnp.abs(wi[:, 2:3]) / jnp.maximum(pdf[:, None], 1e-9)
    np.testing.assert_allclose(np.asarray(est.mean(0)), [0.7, 0.5, 0.3], rtol=0.02)


def test_oren_nayar_reciprocity():
    wo = _dirs(200, 2)
    wi = _dirs(200, 3)
    kd = jnp.asarray([[0.8, 0.6, 0.4]])
    sigma = jnp.full((200,), 20.0)
    f1 = bxdf.oren_nayar_f(kd, sigma, wo, wi)
    f2 = bxdf.oren_nayar_f(kd, sigma, wi, wo)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-4)


def test_microfacet_reciprocity():
    wo = _dirs(200, 4)
    wi = _dirs(200, 5)
    ax = jnp.full((200,), 0.2)
    fr = lambda c: jnp.ones(c.shape + (3,), jnp.float32)
    f1 = bxdf.microfacet_reflection_f(jnp.ones((1, 3)), bxdf.DIST_GGX, ax, ax, fr, wo, wi)
    f2 = bxdf.microfacet_reflection_f(jnp.ones((1, 3)), bxdf.DIST_GGX, ax, ax, fr, wi, wo)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-3, atol=1e-5)


def test_ggx_energy_bounded():
    """GGX with F=1: ∫ f cos ≤ 1 (single-scatter white furnace)."""
    n = 40000
    ax = jnp.full((n,), 0.3)
    fr = lambda c: jnp.ones(c.shape + (3,), jnp.float32)
    wo = jnp.tile(_dirs(1, 6), (n, 1))
    u = jnp.asarray(np.random.RandomState(7).rand(n, 2), jnp.float32)
    wi, f, pdf = bxdf.microfacet_reflection_sample(
        jnp.ones((1, 3)), bxdf.DIST_GGX, ax, ax, fr, wo, u)
    est = jnp.where(pdf[:, None] > 0, f * jnp.abs(wi[:, 2:3]) / jnp.maximum(pdf[:, None], 1e-9), 0.0)
    mean = float(est.mean(0)[0])
    assert 0.5 < mean <= 1.05, mean  # < 1 from shadowing, > .5 for α=.3


def test_fresnel_dielectric_limits():
    f_normal = float(bxdf.fresnel_dielectric(jnp.asarray(1.0), jnp.asarray(1.0), jnp.asarray(1.5)))
    np.testing.assert_allclose(f_normal, ((1.5 - 1) / (1.5 + 1)) ** 2, rtol=1e-4)
    f_grazing = float(bxdf.fresnel_dielectric(jnp.asarray(1e-4), jnp.asarray(1.0), jnp.asarray(1.5)))
    assert f_grazing > 0.98
    # TIR from inside
    f_tir = float(bxdf.fresnel_dielectric(jnp.asarray(-0.3), jnp.asarray(1.0), jnp.asarray(1.5)))
    np.testing.assert_allclose(f_tir, 1.0)


def test_sample_pdf_consistency_plastic():
    """pdf() of sampled directions matches the sample's reported pdf."""
    rows = [dict(kind=mm.MAT_PLASTIC, kd=(0.4, 0.4, 0.4), ks=(0.4, 0.4, 0.4),
                 roughness=(0.2, 0.2), remap_roughness=False)]
    mats = mm.build_materials(rows)
    n = 2000
    lp = mm.resolve(mats, jnp.zeros(n, jnp.int32))
    wo = jnp.tile(_dirs(1, 8), (n, 1))
    r = np.random.RandomState(9)
    wi, f, pdf_s, spec, _ = mm.sample(lp, mats.kinds_present, wo,
                                      jnp.asarray(r.rand(n), jnp.float32),
                                      jnp.asarray(r.rand(n, 2), jnp.float32))
    pdf_e = mm.pdf(lp, mats.kinds_present, wo, wi)
    m = np.asarray(pdf_s) > 1e-5
    np.testing.assert_allclose(np.asarray(pdf_e)[m], np.asarray(pdf_s)[m], rtol=1e-3)


def test_hg_phase_normalization():
    """∫ p(cosθ) dω = 1 for Henyey–Greenstein."""
    from pbrt_tpu.shade.media import hg_phase
    for g in (0.0, 0.5, -0.3):
        mu = np.linspace(-1, 1, 20001)
        p = np.asarray(hg_phase(jnp.asarray(mu, jnp.float32), jnp.asarray(g, jnp.float32)))
        integral = 2 * np.pi * np.trapezoid(p, mu)
        np.testing.assert_allclose(integral, 1.0, rtol=2e-3)


def test_textures_checkerboard_and_scale():
    from pbrt_tpu.shade.textures import TextureBuilder, evaluate
    tb = TextureBuilder()
    t_check = tb.checkerboard((1, 0, 0), (0, 1, 0), su=2, sv=2)
    t_scale = tb.scale(t_check, (0.5, 0.5, 0.5))
    tex = tb.build()
    uv = jnp.asarray([[0.1, 0.1], [0.6, 0.1], [0.1, 0.6], [0.6, 0.6]])
    p = jnp.zeros((4, 3))
    v = np.asarray(evaluate(tex, jnp.full(4, t_check, jnp.int32), uv, p))
    np.testing.assert_allclose(v[0], [1, 0, 0])  # cell (0,0): parity even
    np.testing.assert_allclose(v[1], [0, 1, 0])  # cell (1,0): odd
    np.testing.assert_allclose(v[2], [0, 1, 0])  # cell (0,1): odd
    np.testing.assert_allclose(v[3], [1, 0, 0])  # cell (1,1): even
    vs = np.asarray(evaluate(tex, jnp.full(4, t_scale, jnp.int32), uv, p))
    np.testing.assert_allclose(vs[0], [0.5, 0, 0])


def test_texture_noise_finite():
    from pbrt_tpu.shade.textures import perlin, fbm_noise
    p = jnp.asarray(np.random.RandomState(1).rand(1000, 3) * 10, jnp.float32)
    n = np.asarray(perlin(p))
    assert np.isfinite(n).all() and np.abs(n).max() < 2.0
    assert abs(n.mean()) < 0.1  # zero-mean-ish
    f = np.asarray(fbm_noise(p, jnp.full(1000, 6, jnp.int32), jnp.full(1000, 0.5)))
    assert np.isfinite(f).all()


def test_light_sample_pdf_consistency_area():
    """sample_li pdf vs pdf_li_area_scene for the same geometry."""
    from scenes.cornell import cornell_spheres
    from pbrt_tpu.lights import lights as lm
    import jax
    scene = cornell_spheres()
    lights = scene.lights
    area_idx = int(np.argwhere(np.asarray(lights.kind) == lm.LIGHT_AREA_TRI)[0, 0])
    n = 1000
    r = np.random.RandomState(3)
    p_ref = jnp.asarray(np.stack([r.rand(n) * 0.8 + 0.1, r.rand(n) * 0.5,
                                  -r.rand(n) * 0.8 - 0.1], -1), jnp.float32)
    lt = jnp.full((n,), area_idx, jnp.int32)
    u2 = jnp.asarray(r.rand(n, 2), jnp.float32)
    ls = lm.sample_li(lights, scene, lt, p_ref, u2, scene.world_radius)
    pdf2 = lm.pdf_li_area_scene(lights, scene, lt, p_ref, ls["p_light"],
                                jnp.asarray([0.0, -1.0, 0.0]) * jnp.ones((n, 3)))
    m = np.asarray(ls["pdf"]) > 1e-6
    np.testing.assert_allclose(np.asarray(pdf2)[m], np.asarray(ls["pdf"])[m], rtol=1e-3)
