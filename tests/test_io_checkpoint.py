"""Image IO roundtrips + checkpoint/resume exactness."""
import os
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.film import io as fio
from pbrt_tpu.diff import checkpoint as ckpt
from scenes.cornell import cornell_spheres, cornell_camera
from pbrt_tpu.integrate import driver, direct
from pbrt_tpu.core import samplers as smp


def test_exr_pfm_png_roundtrip(tmp_path):
    img = np.random.RandomState(0).rand(11, 13, 3).astype(np.float32) * 3
    fio.write_exr(tmp_path / "a.exr", img)
    np.testing.assert_allclose(fio.read_exr(tmp_path / "a.exr"), img)
    fio.write_pfm(tmp_path / "a.pfm", img)
    np.testing.assert_allclose(fio.read_pfm(tmp_path / "a.pfm"), img)
    fio.write_png(tmp_path / "a.png", np.clip(img, 0, 1))
    back = fio.read_png(tmp_path / "a.png")
    assert np.abs(back - np.clip(img, 0, 1)).mean() < 0.02  # 8-bit quantised


def test_render_resume_is_exact(tmp_path):
    scene = cornell_spheres()
    cam = cornell_camera((16, 16))
    cfg = driver.RenderConfig(width=16, height=16, spp=4, samples_per_batch=2,
                              sampler=smp.SamplerConfig(kind="zerotwo", spp=4))
    li = direct.make_li(cfg)
    straight = np.asarray(driver.render(scene, cam, cfg, li))

    # render first half, checkpoint, reload, finish
    path = str(tmp_path / "ck.npz")
    cfg_half = cfg._replace(spp=2)
    ckpt.render_resumable(scene, cam, cfg_half, li, checkpoint_path=path)
    resumed = np.asarray(ckpt.render_resumable(scene, cam, cfg, li, checkpoint_path=path))
    np.testing.assert_allclose(resumed, straight, rtol=1e-5, atol=1e-6)


def test_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(5.0), "b": (jnp.ones((2, 2)), jnp.zeros(3))}
    p = str(tmp_path / "t.npz")
    ckpt.save_pytree(p, tree, meta={"step": 7})
    back, meta = ckpt.load_pytree(p, tree)
    assert meta["step"] == 7
    np.testing.assert_allclose(np.asarray(back["a"]), np.arange(5.0))
