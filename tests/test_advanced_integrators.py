"""SPPM / MLT cross-validation against the path tracer (all three
estimate the same light transport — means must agree)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scenes.cornell import cornell_spheres, cornell_camera
from pbrt_tpu.integrate import sppm, mlt, driver, path
from pbrt_tpu.core import samplers as smp


@pytest.fixture(scope="module")
def path_ref():
    scene = cornell_spheres()
    cam = cornell_camera((24, 24))
    cfg = driver.RenderConfig(width=24, height=24, spp=16, max_depth=4,
                              sampler=smp.SamplerConfig(kind="zerotwo", spp=16))
    img = np.asarray(driver.render(scene, cam, cfg, path.make_li(cfg)))
    return scene, cam, img


def test_sppm_matches_path(path_ref):
    scene, cam, img_p = path_ref
    cfg = sppm.SPPMConfig(width=24, height=24, n_iterations=4,
                          photons_per_iter=4096, max_depth=4, initial_radius=0.06)
    img_s = np.asarray(sppm.render(scene, cam, cfg))
    assert np.isnan(img_s).sum() == 0
    assert abs(img_s.mean() - img_p.mean()) < 0.06 * img_p.mean()


def test_mlt_matches_path(path_ref):
    scene, cam, img_p = path_ref
    cfg = mlt.MLTConfig(width=24, height=24, max_depth=4, n_bootstrap=2048,
                        n_chains=256, mutations_per_pixel=8)
    img_m = np.asarray(mlt.render(scene, cam, cfg))
    assert np.isnan(img_m).sum() == 0
    assert abs(img_m.mean() - img_p.mean()) < 0.12 * img_p.mean()


def test_bdpt_matches_path(path_ref):
    from pbrt_tpu.integrate import bdpt
    scene, cam, img_p = path_ref
    cfg = bdpt.BDPTConfig(width=24, height=24, spp=8, max_depth=4,
                          sampler=smp.SamplerConfig(kind="random", spp=8))
    img_b = np.asarray(bdpt.render(scene, cam, cfg))
    assert np.isnan(img_b).sum() == 0
    assert abs(img_b.mean() - img_p.mean()) < 0.08 * img_p.mean()
    # per-region agreement (quarters) — catches MIS weighting errors
    for ys in (slice(0, 12), slice(12, 24)):
        for xs in (slice(0, 12), slice(12, 24)):
            a, b = img_b[ys, xs].mean(), img_p[ys, xs].mean()
            assert abs(a - b) < 0.15 * max(b, 1e-3), (ys, xs, a, b)
