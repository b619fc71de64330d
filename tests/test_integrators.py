"""Integrator smoke + physics tests: AO, Whitted, volpath, samplers on
the render path, furnace-style checks."""
import numpy as np
import jax.numpy as jnp
import pytest

from scenes.cornell import cornell_spheres, cornell_camera
from pbrt_tpu.integrate import driver, direct, path, ao, whitted, volpath
from pbrt_tpu.core import samplers as smp
from pbrt_tpu.api import SceneBuilder
from pbrt_tpu.cameras import make_perspective
from pbrt_tpu.core import transform as tf


def _cfg(size=24, spp=2, depth=3, kind="zerotwo"):
    return driver.RenderConfig(width=size, height=size, spp=spp, max_depth=depth,
                               sampler=smp.SamplerConfig(kind=kind, spp=spp))


def test_ao_open_plane():
    """AO of an unoccluded plane = 1; fully open sky."""
    b = SceneBuilder()
    m = b.matte(kd=0.5)
    b.add_quad([-5, 0, 5], [5, 0, 5], [5, 0, -5], [-5, 0, -5], m)
    b.point_light([0, 3, 0], (1, 1, 1))  # lights unused by AO
    scene = b.build()
    c2w = tf.look_at(np.array([0., 2., 3.]), np.array([0., 0., 0.]), np.array([0., 1., 0.]))
    cam = make_perspective(c2w, 45.0, (16, 16))
    cfg = _cfg(16)
    img = np.asarray(driver.render(scene, cam, cfg, ao.make_li(cfg, n_samples=8)))
    center = img[10:14, 6:10].mean()
    np.testing.assert_allclose(center, 1.0, atol=0.05)


def test_whitted_equals_direct_for_diffuse_scene():
    """No specular materials → whitted == direct(all) estimator family."""
    scene = cornell_spheres()
    cam = cornell_camera((24, 24))
    cfg = _cfg(24, spp=4)
    img_w = np.asarray(driver.render(scene, cam, cfg, whitted.make_li(cfg)))
    img_d = np.asarray(driver.render(scene, cam, cfg, direct.make_li(cfg, strategy="all")))
    # same estimator up to the MIS-BSDF term (small for this scene)
    assert abs(img_w.mean() - img_d.mean()) < 0.05 * max(img_d.mean(), 1e-3)


def test_volpath_thin_medium_converges_to_path():
    scene = cornell_spheres()
    import dataclasses
    b_thin = SceneBuilder()
    # rebuild with a nearly-vacuum medium
    scene_thin = scene
    from pbrt_tpu.shade import media as medmod
    med = medmod.build_media([dict(kind=medmod.MEDIUM_HOMOGENEOUS,
                                   sigma_a=(1e-5, 1e-5, 1e-5),
                                   sigma_s=(1e-5, 1e-5, 1e-5), g=0.0)])
    scene_thin = scene._replace(media=med)
    cam = cornell_camera((24, 24))
    cfg = _cfg(24, spp=4)
    img_v = np.asarray(driver.render(scene_thin, cam, cfg, volpath.make_li(cfg)))
    img_p = np.asarray(driver.render(scene, cam, cfg, path.make_li(cfg)))
    assert abs(img_v.mean() - img_p.mean()) < 0.03 * max(img_p.mean(), 1e-3)
    assert np.isnan(img_v).sum() == 0


def test_volpath_dense_medium_darkens_surfaces():
    scene = cornell_spheres()
    from pbrt_tpu.shade import media as medmod
    med = medmod.build_media([dict(kind=medmod.MEDIUM_HOMOGENEOUS,
                                   sigma_a=(1.5, 1.5, 1.5),
                                   sigma_s=(0.5, 0.5, 0.5), g=0.0)])
    scene_fog = scene._replace(media=med)
    cam = cornell_camera((24, 24))
    cfg = _cfg(24, spp=4)
    img_fog = np.asarray(driver.render(scene_fog, cam, cfg, volpath.make_li(cfg)))
    thin = medmod.build_media([dict(kind=medmod.MEDIUM_HOMOGENEOUS,
                                    sigma_a=(1e-5,) * 3, sigma_s=(1e-5,) * 3)])
    img_clear = np.asarray(driver.render(scene._replace(media=thin), cam, cfg,
                                         volpath.make_li(cfg)))
    # absorbing fog reduces overall radiance
    assert img_fog.mean() < img_clear.mean() * 0.8
    assert np.isnan(img_fog).sum() == 0


def test_volpath_vacuum_matches_path_exactly():
    """σ = 0 medium: distance sampling never scatters and every weight
    is 1, so volpath's surface stream must reproduce path.li (same
    sample dims, same estimator) to float tolerance."""
    scene = cornell_spheres()
    from pbrt_tpu.shade import media as medmod
    med = medmod.build_media([dict(kind=medmod.MEDIUM_HOMOGENEOUS,
                                   sigma_a=(0.0,) * 3, sigma_s=(0.0,) * 3)])
    cam = cornell_camera((16, 16))
    cfg = _cfg(16, spp=2, depth=3)
    img_v = np.asarray(driver.render(scene._replace(media=med), cam, cfg,
                                     volpath.make_li(cfg)))
    img_p = np.asarray(driver.render(scene, cam, cfg, path.make_li(cfg)))
    np.testing.assert_allclose(img_v, img_p, rtol=1e-4, atol=1e-5)


def test_volpath_scattering_furnace():
    """Pure-scattering medium (albedo 1) inside a uniform environment:
    L = Le exactly, for any σ_s — every scattered path eventually
    escapes with no absorption. Catches the missing phase-MIS half
    (VERDICT r2 weak #2a): dropping emission found by phase-sampled
    continuation rays makes L < Le."""
    b = SceneBuilder()
    b.infinite_light(radiance=1.0)
    b.set_homogeneous_medium(sigma_a=(0.0,) * 3, sigma_s=(0.4,) * 3, g=0.0)
    scene = b.build()
    c2w = tf.look_at(np.array([0., 0., 0.]), np.array([0., 0., -1.]),
                     np.array([0., 1., 0.]))
    cam = make_perspective(c2w, 60.0, (12, 12))
    cfg = _cfg(12, spp=32, depth=8)
    img = np.asarray(driver.render(scene, cam, cfg, volpath.make_li(cfg)))
    assert np.isnan(img).sum() == 0
    np.testing.assert_allclose(img.mean(), 1.0, rtol=0.02)


def test_volpath_single_scatter_analytic():
    """Single scattering from a point light in a homogeneous medium vs
    a quadrature oracle: with max_depth=1 volpath computes EXACTLY
    L = ∫ σ_s e^{−σ_t s} p(θ) I e^{−σ_t d(s)} / d(s)² ds (the
    volpath.rs:62-136 medium-event estimator; VERDICT r2 weak #2)."""
    from pbrt_tpu.shade import media as medmod
    from pbrt_tpu.cameras import cameras as cammod
    import jax.numpy as jnp

    sig_a, sig_s = 0.15, 0.1
    sig_t = sig_a + sig_s
    I = 4.0
    lp = np.array([0.6, 0.4, -1.0], np.float32)

    b = SceneBuilder()
    b.point_light(lp, (I, I, I))
    b.set_homogeneous_medium(sigma_a=(sig_a,) * 3, sigma_s=(sig_s,) * 3, g=0.0)
    scene = b.build()

    res, spp = 8, 256
    c2w = tf.look_at(np.array([0., 0., 1.]), np.array([0., 0., -1.]),
                     np.array([0., 1., 0.]))
    cam = make_perspective(c2w, 50.0, (res, res))
    cfg = _cfg(res, spp=spp, depth=1)

    hw = res * res
    pix = jnp.arange(hw, dtype=jnp.uint32)
    px = (pix % res).astype(jnp.float32) + 0.5
    py = (pix // res).astype(jnp.float32) + 0.5
    pfilm = jnp.stack([px, py], axis=-1)
    o, d, _ = cammod.generate_rays(cam, pfilm, jnp.zeros((hw, 2)), jnp.zeros(hw))

    acc = np.zeros((hw, 3), np.float64)
    for s in range(spp):
        sid = jnp.full((hw,), s, jnp.uint32)
        acc += np.asarray(volpath.li(scene, o, d, pix, sid, cfg))
    img = acc / spp

    # quadrature oracle over each camera ray, truncated at the same
    # 2·world_radius escape distance volpath uses
    on, dn = np.asarray(o, np.float64), np.asarray(d, np.float64)
    seg = 2.0 * float(scene.world_radius)
    sgrid = (np.arange(4096) + 0.5) / 4096 * seg
    ds_ = seg / 4096
    ref = np.zeros(hw)
    for ax in range(hw):
        x = on[ax] + sgrid[:, None] * dn[ax]
        dist = np.linalg.norm(lp - x, axis=-1)
        ref[ax] = np.sum(sig_s * np.exp(-sig_t * sgrid)
                         * (1.0 / (4.0 * np.pi))
                         * I * np.exp(-sig_t * dist) / dist ** 2) * ds_
    np.testing.assert_allclose(img.mean(), ref.mean(), rtol=0.05)
    # per-pixel agreement at a looser tolerance (MC noise)
    np.testing.assert_allclose(img.mean(axis=-1), ref, rtol=0.2)


@pytest.mark.parametrize("kind", ["random", "stratified", "halton", "sobol", "zerotwo"])
def test_all_samplers_render(kind):
    scene = cornell_spheres()
    cam = cornell_camera((16, 16))
    cfg = _cfg(16, spp=4, kind=kind)
    img = np.asarray(driver.render(scene, cam, cfg, direct.make_li(cfg)))
    assert np.isnan(img).sum() == 0
    assert 0.1 < img.mean() < 2.0


def test_stratified_lower_variance_than_random():
    """Stratification must reduce per-pixel variance vs independent."""
    scene = cornell_spheres()
    cam = cornell_camera((16, 16))

    def var_of(kind):
        imgs = []
        for seed in range(4):
            cfg = driver.RenderConfig(width=16, height=16, spp=4,
                                      sampler=smp.SamplerConfig(kind=kind, spp=4, seed=seed))
            imgs.append(np.asarray(driver.render(scene, cam, cfg, direct.make_li(cfg))))
        return np.var(np.stack(imgs), axis=0).mean()

    assert var_of("zerotwo") < var_of("random")


def test_sppm_grid_gather_matches_dense():
    """The sort-by-cell hash-grid photon gather (sppm.rs:300-355 analog)
    must reproduce the dense VP×photon distance-matrix gather exactly
    (same pairs; only float summation order differs)."""
    import jax.numpy as jnp
    from pbrt_tpu.integrate import sppm as sppmmod
    from pbrt_tpu.core import vecmath as vm

    b = SceneBuilder()
    b.matte(kd=(0.5, 0.5, 0.5))
    b.add_quad([-2, 0, 2], [2, 0, 2], [2, 0, -2], [-2, 0, -2], 0)
    b.point_light([0, 2, 0], (1, 1, 1))
    scene = b.build()

    rs = np.random.RandomState(3)
    hw, pt = 300, 2000
    vp = dict(
        p=jnp.asarray(rs.randn(hw, 3).astype(np.float32)),
        wo=jnp.asarray(vm.normalize(jnp.asarray(rs.randn(hw, 3), jnp.float32))),
        ns=jnp.tile(jnp.asarray([0., 0., 1.]), (hw, 1)),
        ng=jnp.tile(jnp.asarray([0., 0., 1.]), (hw, 1)),
        dpdu=jnp.tile(jnp.asarray([1., 0., 0.]), (hw, 1)),
        beta=jnp.ones((hw, 3)),
        mid=jnp.zeros((hw,), jnp.int32),
        uv=jnp.zeros((hw, 2)),
        valid=jnp.asarray(rs.rand(hw) > 0.1),
    )
    radius2 = jnp.asarray((0.05 + 0.1 * rs.rand(hw)).astype(np.float32) ** 2)
    ph_p = jnp.asarray((rs.randn(pt, 3) * 0.8).astype(np.float32))
    ph_wi = jnp.asarray(vm.normalize(jnp.asarray(rs.randn(pt, 3), jnp.float32)))
    ph_beta = jnp.asarray(rs.rand(pt, 3).astype(np.float32))
    ph_ok = jnp.asarray(rs.rand(pt) > 0.2)

    phi_d, m_d = sppmmod._gather(scene, vp, radius2, ph_p, ph_wi, ph_beta, ph_ok)
    phi_g, m_g, dropped = sppmmod._gather_grid(
        scene, vp, radius2, ph_p, ph_wi, ph_beta, ph_ok, max_per_cell=256)
    assert int(dropped) == 0
    np.testing.assert_array_equal(np.asarray(m_d), np.asarray(m_g))
    np.testing.assert_allclose(np.asarray(phi_d), np.asarray(phi_g),
                               rtol=1e-5, atol=1e-6)
