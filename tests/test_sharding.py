"""Multi-device sharding tests on the 8-device virtual CPU mesh
(conftest.py): the SURVEY §4.4 same-seed equivalence contract and the
multi-host entry plumbing."""
import numpy as np
import jax

from scenes.cornell import cornell_spheres, cornell_camera
from pbrt_tpu.integrate import driver, path
from pbrt_tpu.core import samplers as smp
from pbrt_tpu.dist import sharding, multihost


def _cfg(size, spp):
    return driver.RenderConfig(width=size, height=size, spp=spp, max_depth=3,
                               sampler=smp.SamplerConfig(kind="zerotwo", spp=spp))


def test_sharded_render_bitwise_equals_single_device():
    """Per-pixel counter seeding ⇒ the 8-device sharded render must be
    bitwise-identical to the 1-device render (SURVEY §4.4)."""
    assert len(jax.devices()) >= 8
    scene = cornell_spheres()
    cam = cornell_camera((16, 16))
    cfg = _cfg(16, spp=2)
    li = path.make_li(cfg)
    img1 = np.asarray(sharding.render_sharded(scene, cam, cfg, li,
                                              mesh=sharding.make_mesh(1)))
    img8 = np.asarray(sharding.render_sharded(scene, cam, cfg, li,
                                              mesh=sharding.make_mesh(8)))
    np.testing.assert_array_equal(img1, img8)


def test_train_step_grads_match_single_device():
    """pmean-reduced sharded gradients == single-device gradients."""
    import dataclasses
    scene = cornell_spheres()
    cam = cornell_camera((16, 16))
    cfg = _cfg(16, spp=1)

    def param_get(sc):
        return {"kd": sc.materials.kd}

    def param_set(sc, params):
        return sc._replace(materials=dataclasses.replace(sc.materials,
                                                         kd=params["kd"]))

    target = np.zeros((16, 16, 3), np.float32)
    outs = []
    for nd in (1, 8):
        step = sharding.make_train_step(cfg, path.make_li(cfg), param_get,
                                        param_set, mesh=sharding.make_mesh(nd))
        sc2, loss = step(scene, cam, target, 0.05)
        outs.append((float(loss), np.asarray(sc2.materials.kd)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5, atol=1e-7)


def test_multihost_entry_single_process_noop():
    """ensure_initialized is a safe no-op in a single process and
    reports (1, 0); make_mesh sees the (global) device list."""
    nproc, pid = multihost.ensure_initialized()
    assert nproc == 1 and pid == 0
    mesh = sharding.make_mesh()
    assert mesh.devices.size == len(jax.devices())
