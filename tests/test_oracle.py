"""Golden validation: JAX renderer vs the independent numpy CPU oracle on
BASELINE config 1 (Cornell spheres, direct lighting, 64×64 @ 4spp).

Both consume identical counter-based RNG streams ('random' sampler), so
images must match to float tolerance pixel-by-pixel — not just
statistically (SURVEY.md §4.2, §7 hard-parts list: RNG parity)."""
import numpy as np
import jax

from scenes.cornell import cornell_spheres, cornell_camera
from pbrt_tpu.integrate import driver, direct
from pbrt_tpu.core import samplers as smp
from pbrt_tpu.oracle import cpu_reference as oracle


def _render_pair(light, size=32, spp=2):
    scene = cornell_spheres(light=light)
    cam = cornell_camera((size, size))
    cfg = driver.RenderConfig(width=size, height=size, spp=spp,
                              sampler=smp.SamplerConfig(kind="random", spp=spp, seed=0))
    img_dev = np.asarray(driver.render(scene, cam, cfg, direct.make_li(cfg)))
    img_ora = oracle.render_direct(scene, cam, size, size, spp, seed=0)
    return img_dev, img_ora


def _check(img_dev, img_ora, frac=0.995, tol=2e-3):
    diff = np.abs(img_dev - img_ora)
    scale = np.maximum(np.abs(img_ora), 1e-2)
    ok = (diff / scale < tol).all(axis=-1)
    assert ok.mean() >= frac, f"only {ok.mean():.4f} of pixels match (want {frac})"
    # aggregate error must be tiny as well
    assert np.abs(img_dev.mean() - img_ora.mean()) < 1e-3


def test_direct_matches_oracle_point_light():
    img_dev, img_ora = _render_pair("point")
    _check(img_dev, img_ora)


def test_direct_matches_oracle_area_light():
    img_dev, img_ora = _render_pair("area")
    _check(img_dev, img_ora)
