"""BSSRDF subsurface transport tests (path.rs:154-198 + bssrdf.rs).

1. Radiometric unit test: on an infinite plane, the exit-point estimator
   E[Sp / pdf_sp] must equal the profile's total diffuse reflectance
   rho_eff(rho) per channel (the MIS identity over probe axes/channels,
   bssrdf.rs:133-272).
2. Render tests: MAT_SUBSURFACE renders differently from glass and is
   energy-bounded / NaN-free.
"""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.api import SceneBuilder
from pbrt_tpu.cameras import make_perspective
from pbrt_tpu.core import samplers as smp
from pbrt_tpu.core import transform as tf
from pbrt_tpu.integrate import driver, path, path_sss, common
from pbrt_tpu.geom import scene as scenemod


def _cfg(size=16, spp=4, depth=4, kind="zerotwo"):
    return driver.RenderConfig(width=size, height=size, spp=spp, max_depth=depth,
                               sampler=smp.SamplerConfig(kind=kind, spp=spp))


def _plane_scene(sig_a, sig_s):
    b = SceneBuilder()
    m = b.subsurface(sigma_a=sig_a, sigma_s=sig_s, g=0.0, eta=1.33)
    s = 50.0
    b.add_quad([-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0], m)
    b.point_light([0, 0, 3], (1.0, 1.0, 1.0))
    return b.build()


def test_sample_exit_integrates_to_rho_eff():
    """MC mean of Sp/pdf_sp over exit samples on a plane = rho_eff per
    channel (within the 0.1% profile-tail truncation + MC noise)."""
    sig_a = (0.1, 0.3, 1.0)
    sig_s = (9.9, 9.7, 9.0)      # rho = 0.99, 0.97, 0.90
    scene = _plane_scene(sig_a, sig_s)
    table = scene.materials.sss_table
    assert table is not None

    n = 8192
    o = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (n, 1))
    hit = scenemod.intersect(scene, o, d)
    assert bool(hit.valid.all())
    frame = common.shading_frame(hit, scene)

    rs = np.random.RandomState(7)
    u = [jnp.asarray(rs.rand(n), jnp.float32) for _ in range(4)]
    exit_hit, sp_w, ok, eta = path_sss.sample_exit(
        scene, hit, frame, u[0], u[1], u[2], u[3],
        jnp.ones(n, bool))
    sp_w = np.asarray(sp_w)
    est = sp_w.mean(axis=0)                    # E over ALL draws (failed = 0)

    rho = np.asarray(sig_s, np.float64) / (np.asarray(sig_a) + np.asarray(sig_s))
    rho_s = np.asarray(table.rho_samples)
    rho_eff = np.asarray(table.rho_eff)
    want = np.interp(rho, rho_s, rho_eff)
    np.testing.assert_allclose(est, want, rtol=0.08)
    # exit points lie on the plane, around the entry
    ep = np.asarray(exit_hit.p)[np.asarray(ok)]
    assert np.abs(ep[:, 2]).max() < 1e-3


def _ball_scene(mat):
    b = SceneBuilder()
    if mat == "sss":
        m = b.subsurface(sigma_a=(0.2, 0.5, 1.5), sigma_s=(30.0, 30.0, 30.0),
                         g=0.0, eta=1.33)
    else:
        m = b.glass(eta=1.33)
    floor = b.matte(kd=(0.6, 0.6, 0.6))
    b.add_sphere([0.0, 0.4, 0.0], 0.4, m)
    s = 3.0
    b.add_quad([-s, 0, s], [s, 0, s], [s, 0, -s], [-s, 0, -s], floor)
    b.area_light_quad([-0.4, 2.0, -0.4], [0.4, 2.0, -0.4],
                      [0.4, 2.0, 0.4], [-0.4, 2.0, 0.4], (12.0, 12.0, 12.0))
    return b.build()


def _render(scene, size=16, spp=8, depth=5):
    c2w = tf.look_at(np.array([0.0, 0.8, 1.8]), np.array([0.0, 0.35, 0.0]),
                     np.array([0.0, 1.0, 0.0]))
    cam = make_perspective(c2w, 45.0, (size, size))
    cfg = _cfg(size, spp=spp, depth=depth)
    return np.asarray(driver.render(scene, cam, cfg, path.make_li(cfg)))


def test_subsurface_differs_from_glass_and_is_bounded():
    img_sss = _render(_ball_scene("sss"))
    img_gls = _render(_ball_scene("glass"))
    assert np.isnan(img_sss).sum() == 0
    assert img_sss.mean() > 0.01
    # a dense scattering ball is NOT clear glass: the sphere region must
    # differ materially (diffuse glow vs refraction)
    rel = np.abs(img_sss - img_gls).mean() / max(img_gls.mean(), 1e-6)
    assert rel > 0.15
    # energy sanity: no pixel outside the light exceeds the light bound
    assert img_sss.mean() < 12.0


def test_fourier_lambertian_table_matches_matte():
    """A synthetic constant-profile Fourier table (a0 = rho/pi) wired
    through MAT_FOURIER must render like the equivalent matte material
    (reflection.rs:1282-1300 dispatch parity)."""
    from pbrt_tpu.shade.fourier import make_lambertian_table
    albedo = (0.6, 0.4, 0.3)

    def scene_with(mat_fn):
        b = SceneBuilder()
        m = mat_fn(b)
        s = 3.0
        b.add_quad([-s, 0, s], [s, 0, s], [s, 0, -s], [-s, 0, -s], m)
        b.add_sphere([0.0, 0.5, 0.0], 0.5, m)
        b.area_light_quad([-0.5, 2.5, -0.5], [0.5, 2.5, -0.5],
                          [0.5, 2.5, 0.5], [-0.5, 2.5, 0.5], (10.0,) * 3)
        return b.build()

    s_fourier = scene_with(lambda b: b.fourier(table=make_lambertian_table(albedo)))
    s_matte = scene_with(lambda b: b.matte(kd=albedo))
    img_f = _render(s_fourier, size=12, spp=16, depth=3)
    img_m = _render(s_matte, size=12, spp=16, depth=3)
    assert np.isnan(img_f).sum() == 0
    np.testing.assert_allclose(img_f.mean(), img_m.mean(), rtol=0.05)
    np.testing.assert_allclose(img_f.mean(axis=(0, 1)), img_m.mean(axis=(0, 1)),
                               rtol=0.08)
