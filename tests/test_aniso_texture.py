"""Anisotropic texture filtering (VERDICT r3 #9: EWA capability,
mipmap.rs:258,297-345) — realised as one stochastic tap along the
footprint's major axis per path sample: LOD comes from the MINOR axis
(no grazing over-blur), the major axis is integrated by sampling, and
the per-sample expectation equals the anisotropic line-box filter."""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.shade import textures as texmod
from pbrt_tpu.core.types import Float


def _checker_img(n=128, cells=16):
    y, x = np.mgrid[0:n, 0:n]
    par = ((x * cells // n) + (y * cells // n)) % 2
    return np.repeat(par[..., None], 3, -1).astype(np.float32)


def _table():
    b = texmod.TextureBuilder()
    tid = b.image(_checker_img())
    return b.build(), tid


def _truth(uv, minor, major, direc, n=4096):
    """Ground-truth anisotropic footprint integral: dense point sampling
    of the level-0 checkerboard over the line-box kernel (length =
    major along `direc`, width = minor isotropic)."""
    r = np.random.RandomState(0)
    tj = (r.rand(n) - 0.5) * max(major - minor, 0.0)
    oj = (r.rand(n, 2) - 0.5) * minor
    pts = uv[None, :] + direc[None, :] * tj[:, None] + oj
    img = _checker_img()
    x = np.mod(pts[:, 0], 1.0) * img.shape[1]
    y = np.mod(pts[:, 1], 1.0) * img.shape[0]
    return img[np.clip(y.astype(int), 0, 127), np.clip(x.astype(int), 0, 127)].mean(0)


def _filtered(tex, tid, uv, minor, major, direc, n_jit=256):
    """The renderer's estimator: stochastic major-axis tap + minor-axis
    trilinear LOD, averaged over the jitter (what spp averaging does)."""
    u_j = (np.arange(n_jit) + 0.5) / n_jit - 0.5
    uvs = jnp.asarray(uv[None, :] + direc[None, :] * ((major - minor) * u_j)[:, None],
                      Float)
    fp = jnp.full((n_jit,), minor, Float)
    tids = jnp.full((n_jit,), tid, jnp.int32)
    vals = texmod.evaluate(tex, tids, uvs, jnp.zeros((n_jit, 3), Float), fp=fp)
    return np.asarray(vals).mean(0)


def _iso(tex, tid, uv, fp):
    v = texmod.evaluate(tex, jnp.asarray([tid], jnp.int32),
                        jnp.asarray(uv[None, :], Float),
                        jnp.zeros((1, 3), Float),
                        fp=jnp.asarray([fp], Float))
    return np.asarray(v)[0]


def test_stochastic_major_axis_tap_matches_ellipse_integral():
    """At 8:1 anisotropy the stochastic-tap expectation tracks the true
    footprint integral far better than either isotropic choice (minor
    LOD alone = aliasing; major LOD = over-blur toward 0.5 everywhere,
    killing contrast the truth retains)."""
    tex, tid = _table()
    r = np.random.RandomState(3)
    errs_a, errs_min, errs_maj = [], [], []
    for k in range(12):
        uv = r.rand(2).astype(np.float32)
        phi = r.rand() * 2 * np.pi
        direc = np.array([np.cos(phi), np.sin(phi)], np.float32)
        minor = 1.0 / 64.0          # ~2 texels of the 16-cell checker
        major = minor * 8.0         # 8:1 grazing anisotropy
        t = _truth(uv, minor, major, direc)
        errs_a.append(np.abs(_filtered(tex, tid, uv, minor, major, direc) - t).mean())
        errs_min.append(np.abs(_iso(tex, tid, uv, minor) - t).mean())
        errs_maj.append(np.abs(_iso(tex, tid, uv, major) - t).mean())
    ea, emin, emaj = map(lambda v: float(np.mean(v)), (errs_a, errs_min, errs_maj))
    assert ea < 0.6 * emin, (ea, emin)     # beats minor-LOD point sampling
    assert ea < 0.6 * emaj, (ea, emaj)     # beats major-LOD over-blur
    assert ea < 0.08, ea                   # and is accurate in absolute terms


def test_grazing_render_smoke():
    """End-to-end: the anisotropic tap renders a grazing textured floor
    without NaNs and with near-field contrast preserved (no over-blur)."""
    from pbrt_tpu.api import SceneBuilder
    from pbrt_tpu.integrate import driver, path
    from pbrt_tpu.core import samplers as smp
    from pbrt_tpu.core import transform as tfm
    from pbrt_tpu.cameras.cameras import make_perspective

    b = SceneBuilder()
    tex = b.textures.image(_checker_img() * 0.8 + 0.1, su=8.0, sv=8.0)
    m = b.material(kind=0, kd=(1.0, 1.0, 1.0), kd_tex=tex)
    s = 40.0
    b.add_quad([-s, 0, -s], [s, 0, -s], [s, 0, s], [-s, 0, s], m,
               uvs=[(0, 0), (1, 0), (1, 1), (0, 1)])
    b.infinite_light(radiance=1.0)
    scene = b.build()
    c2w = tfm.look_at(np.array([0.0, 0.4, 6.0]), np.array([0.0, 0.0, -6.0]),
                      np.array([0.0, 1.0, 0.0]))
    cam = make_perspective(c2w, 45.0, (48, 48))
    cfg = driver.RenderConfig(width=48, height=48, spp=4, max_depth=1,
                              sampler=smp.SamplerConfig(kind="stratified", spp=4))
    img = np.asarray(driver.render(scene, cam, cfg, path.make_li(cfg)))
    assert np.isnan(img).sum() == 0
    near = img[40:, :]                   # big on-screen checkers
    assert near.std() > 0.1              # contrast survives (no over-blur)


def test_deterministic_taps_beat_stochastic_at_low_spp():
    """cfg.aniso_taps > 1 (VERDICT r4 missing #3: deterministic
    EWA-style filtering for previews): at 1 spp the 3-tap deterministic
    filter must be closer to the converged image than the single
    stochastic tap, whose footprint integral only converges over spp."""
    from pbrt_tpu.api import SceneBuilder
    from pbrt_tpu.integrate import driver, path
    from pbrt_tpu.core import samplers as smp
    from pbrt_tpu.core import transform as tfm
    from pbrt_tpu.cameras.cameras import make_perspective

    b = SceneBuilder()
    tex = b.textures.image(_checker_img() * 0.8 + 0.1, su=8.0, sv=8.0)
    m = b.material(kind=0, kd=(1.0, 1.0, 1.0), kd_tex=tex)
    s = 40.0
    b.add_quad([-s, 0, -s], [s, 0, -s], [s, 0, s], [-s, 0, s], m,
               uvs=[(0, 0), (1, 0), (1, 1), (0, 1)])
    b.infinite_light(radiance=1.0)
    scene = b.build()
    c2w = tfm.look_at(np.array([0.0, 0.4, 6.0]), np.array([0.0, 0.0, -6.0]),
                      np.array([0.0, 1.0, 0.0]))
    cam = make_perspective(c2w, 45.0, (48, 48))

    def render(spp, taps):
        cfg = driver.RenderConfig(width=48, height=48, spp=spp, max_depth=1,
                                  sampler=smp.SamplerConfig(kind="stratified",
                                                            spp=spp),
                                  aniso_taps=taps)
        return np.asarray(driver.render(scene, cam, cfg, path.make_li(cfg)))

    ref = render(64, 1)                  # converged stochastic = truth
    img_s1 = render(1, 1)
    img_d3 = render(1, 3)
    err_s = np.abs(img_s1 - ref).mean()
    err_d = np.abs(img_d3 - ref).mean()
    assert err_d < 0.8 * err_s, (err_d, err_s)
