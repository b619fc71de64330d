"""Round-4 coverage: photon emission from gonio/projection lights,
per-primitive medium interfaces, and the SPPM overflow census.

(VERDICT r3 'Next round' #7: all three were wired but unexercised.)
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.lights import lights as lightsmod
from pbrt_tpu.core.types import Float


def _mc_power(lights, n=1 << 15, seed=0):
    """MC estimate of total emitted power from sample_le:
    E[le / (pdf_pos * pdf_dir)] over the emission distribution."""
    r = np.random.RandomState(seed)
    u_pos = jnp.asarray(r.rand(n, 2), Float)
    u_dir = jnp.asarray(r.rand(n, 2), Float)
    lt = jnp.zeros((n,), jnp.int32)
    le = lightsmod.sample_le(lights, None, lt, u_pos, u_dir,
                             jnp.asarray(10.0, Float))
    w = le["le"] / jnp.maximum(le["pdf_pos"] * le["pdf_dir"], 1e-12)[..., None]
    return np.asarray(jnp.mean(w, axis=0)), le


def _sphere_grid(n=200_000, seed=1):
    r = np.random.RandomState(seed)
    z = r.rand(n) * 2.0 - 1.0
    phi = r.rand(n) * 2.0 * np.pi
    s = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    return np.stack([s * np.cos(phi), s * np.sin(phi), z], -1).astype(np.float32)


def test_gonio_sample_le_power_matches_quadrature():
    """Photon emission from a goniometric light: the MC power estimate
    from sample_le (goniometric.rs sample_le analog) must equal the
    brute quadrature of I*g(w) over the sphere."""
    img = np.ones((16, 32, 3), np.float32)
    img[:8] *= 0.25          # asymmetric: top half dimmer
    img[:, :16, 0] *= 2.0    # and chromatic
    lights = lightsmod.build_lights(
        [dict(kind=lightsmod.LIGHT_GONIO, p=(0.0, 0.0, 0.0), I=(2.0, 1.0, 1.0))],
        gonio_image=img)
    est, le = _mc_power(lights)
    # independent quadrature: uniform sphere points through the same
    # lat-long lookup (tests the pdf/weight wiring of the sampler)
    dirs = jnp.asarray(_sphere_grid())
    g = lightsmod._latlong_lookup(lights.gonio_image, dirs)
    ref = 4.0 * np.pi * np.asarray(jnp.mean(g, axis=0)) * np.array([2.0, 1.0, 1.0])
    np.testing.assert_allclose(est, ref, rtol=0.05)
    assert np.isfinite(np.asarray(le["d"])).all()


def test_projection_sample_le_support_and_power():
    """Projection-light photons: directions lie inside the fov cone,
    radiance is zero outside the image frame, and the MC power matches
    cone quadrature of the projected texture (projection.rs sample_le)."""
    img = np.ones((16, 16, 3), np.float32)
    img[:, 8:] *= 0.5        # right half dimmer
    lights = lightsmod.build_lights(
        [dict(kind=lightsmod.LIGHT_PROJECTION, p=(0.0, 0.0, 0.0),
              direction=(0.0, 0.0, 1.0), I=3.0, fov_deg=60.0)],
        gonio_image=img)
    est, le = _mc_power(lights)
    d = np.asarray(le["d"])
    cos_end = float(np.asarray(lights.cos_end)[0])
    # support: every emitted direction inside the cone
    assert (d[:, 2] >= cos_end - 1e-4).all()
    # quadrature over the cone (uniform-in-cone dirs = the same sampler
    # with pdf divided out, so build an independent grid)
    r = np.random.RandomState(7)
    ct = 1.0 - r.rand(100_000) * (1.0 - cos_end)
    st = np.sqrt(np.maximum(1.0 - ct**2, 0.0))
    phi = r.rand(100_000) * 2 * np.pi
    dirs = jnp.asarray(np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1),
                       Float)
    lt = jnp.zeros((100_000,), jnp.int32)
    su, sv, inside = lightsmod._project_uv(lights, lt, dirs,
                                           jnp.asarray([0.0, 0.0, 1.0], Float))
    proj = lightsmod._image_lookup_clamped(lights.gonio_image,
                                           jnp.stack([su, sv], -1))
    val = np.asarray(proj) * np.asarray(inside)[:, None] * 3.0
    solid_angle = 2 * np.pi * (1.0 - cos_end)
    ref = val.mean(0) * solid_angle
    np.testing.assert_allclose(est, ref, rtol=0.06)


def test_volpath_two_media_interface():
    """Glass sphere with a vacuum interior inside an absorbing fog
    (volpath per-primitive medium interfaces, medium.rs
    MediumInterface): looking through the sphere at the environment,
    the interior chord must NOT be attenuated — radiance brighter than
    the same scene with fog inside by ~exp(sigma_t * chord)."""
    from pbrt_tpu.api import SceneBuilder
    from pbrt_tpu.integrate import driver, volpath
    from pbrt_tpu.core import samplers as smp
    from pbrt_tpu.core import transform as tf
    from pbrt_tpu.cameras.cameras import make_perspective

    sigma = 0.4
    radius = 0.8

    def build(inside_med):
        b = SceneBuilder()
        glass = b.glass(kr=0.0, kt=1.0, eta=1.0)   # eta 1: straight rays
        b.medium_interface(glass, inside=inside_med, outside=0)
        b.add_sphere((0.0, 0.0, 0.0), radius, glass)
        b.set_homogeneous_medium(sigma_a=(sigma,) * 3, sigma_s=(0.0,) * 3)
        b.infinite_light(radiance=1.0)
        return b.build()

    c2w = tf.look_at(np.array([0., 0., -3.]), np.array([0., 0., 0.]),
                     np.array([0., 1., 0.]))
    cam = make_perspective(c2w, 35.0, (32, 32))
    cfg = driver.RenderConfig(width=32, height=32, spp=8, max_depth=6,
                              sampler=smp.SamplerConfig(kind="stratified", spp=8))
    img_vac = np.asarray(driver.render(build(-1), cam, cfg, volpath.make_li(cfg)))
    img_fog = np.asarray(driver.render(build(0), cam, cfg, volpath.make_li(cfg)))
    assert np.isnan(img_vac).sum() == 0
    c_vac = img_vac[14:18, 14:18].mean()
    c_fog = img_fog[14:18, 14:18].mean()
    # center ray chord ≈ 2r → expected brightness ratio exp(sigma*2r)
    expected = np.exp(sigma * 2.0 * radius)
    assert c_vac > c_fog * (1.0 + 0.4 * (expected - 1.0)), (c_vac, c_fog)
    np.testing.assert_allclose(c_vac / max(c_fog, 1e-9), expected, rtol=0.25)


def test_sppm_grid_overflow_census_is_loud():
    """Forcing max_photons_per_cell below the photon density must be
    COUNTED (dropped > 0) and surfaced via return_stats — the 'never
    silent' cap contract (sppm.rs linked lists are unbounded)."""
    from scenes.cornell import cornell_spheres, cornell_camera
    from pbrt_tpu.integrate import sppm as sppmmod

    scene = cornell_spheres()
    camera = cornell_camera((16, 16))
    base = dict(width=16, height=16, n_iterations=1, photons_per_iter=4096,
                max_depth=3, initial_radius=0.25, gather="grid",
                return_stats=True)
    img_tiny, st_tiny = sppmmod.render(scene, camera,
                                       sppmmod.SPPMConfig(**base,
                                                          max_photons_per_cell=2))
    img_big, st_big = sppmmod.render(scene, camera,
                                     sppmmod.SPPMConfig(**base,
                                                        max_photons_per_cell=512))
    assert st_tiny["photons_dropped"] > 0
    assert st_big["photons_dropped"] == 0
    # dropping photons can only darken the gathered flux
    assert img_tiny.mean() <= img_big.mean() + 1e-6


def test_bdpt_media_matches_volpath():
    """BDPT media vertices (VERDICT r4 #3; random_walk medium branch,
    bdpt.rs:860-958 + Tr connections :1003-1024): a homogeneous-fog
    Cornell must match volpath pixel-wise — phase vertices in both
    subpaths, Tr in every connection, cos-free medium densities."""
    from scenes.cornell import cornell_spheres, cornell_camera
    from pbrt_tpu.integrate import driver, volpath, bdpt
    from pbrt_tpu.core import samplers as smp
    from pbrt_tpu.api import SceneBuilder

    scene = cornell_spheres()
    from pbrt_tpu.shade import media as medmod
    media = medmod.build_media([dict(kind=medmod.MEDIUM_HOMOGENEOUS,
                                     sigma_a=(0.08, 0.08, 0.08),
                                     sigma_s=(0.45, 0.45, 0.45), g=0.0)])
    scene = scene._replace(media=media)
    cam = cornell_camera((24, 24))
    cfg = driver.RenderConfig(width=24, height=24, spp=128, max_depth=3,
                              sampler=smp.SamplerConfig(kind="zerotwo", spp=128))
    img_v = np.asarray(driver.render(scene, cam, cfg, volpath.make_li(cfg)))
    bcfg = bdpt.BDPTConfig(width=24, height=24, spp=128, max_depth=3,
                           sampler=smp.SamplerConfig(kind="random", spp=128))
    img_b = np.asarray(bdpt.render(scene, cam, bcfg))
    assert np.isnan(img_b).sum() == 0
    assert img_b.mean() > 0
    rel = abs(img_b.mean() - img_v.mean()) / img_v.mean()
    assert rel < 0.03, (img_b.mean(), img_v.mean(), rel)
    # BDPT's t=1 splat strategies carry ~30% of the energy in fog and
    # their noise is heavy-tailed: the raw per-pixel error is variance,
    # not bias (it halves under 2x2 averaging and the diff is symmetric
    # around zero) — bound raw loosely, the 2x2-binned image tightly
    ref = np.maximum(img_v.mean(-1, keepdims=True), 0.05)
    mare = float((np.abs(img_b - img_v).mean(-1, keepdims=True) / ref).mean())
    assert mare < 0.28, mare
    ds = lambda a: a.reshape(12, 2, 12, 2, 3).mean((1, 3))
    refd = np.maximum(ds(img_v).mean(-1, keepdims=True), 0.05)
    mare2 = float((np.abs(ds(img_b) - ds(img_v)).mean(-1, keepdims=True)
                   / refd).mean())
    assert mare2 < 0.13, mare2
