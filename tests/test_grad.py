"""Gradient tests: autodiff (path replay) vs central finite differences
of the SAME deterministic sample estimate (identical RNG streams), per
SURVEY §4.3. Also an end-to-end inverse-rendering convergence test."""
import numpy as np
import jax
import jax.numpy as jnp

from scenes.cornell import cornell_spheres, cornell_camera
from pbrt_tpu.integrate import driver, direct, path
from pbrt_tpu.core import samplers as smp
from pbrt_tpu.diff import inverse


def _make_render(size=24, spp=2, integrator="direct"):
    cam = cornell_camera((size, size))
    cfg = driver.RenderConfig(width=size, height=size, spp=spp, max_depth=3,
                              sampler=smp.SamplerConfig(kind="random", spp=spp))
    li = direct.make_li(cfg) if integrator == "direct" else path.make_li(cfg)

    def render_fn(scene, step):
        return driver.render(scene, cam, cfg, li, jit=False)

    return render_fn


def test_grad_matches_fd_albedo():
    scene = cornell_spheres()
    render_fn = _make_render()
    # material 0 = white walls, red channel
    g, fd = inverse.finite_difference_check(
        scene, render_fn, ("materials", "kd", (0, 0)), eps=1e-2)
    assert abs(g - fd) < 0.05 * max(abs(fd), 1e-3), (g, fd)
    assert abs(g) > 1e-4  # non-trivial gradient


def test_grad_matches_fd_emission():
    scene = cornell_spheres()
    render_fn = _make_render()
    lid = int(np.argwhere(np.asarray(scene.lights.kind) == 3)[0, 0]) \
        if (np.asarray(scene.lights.kind) == 3).any() else 0
    g, fd = inverse.finite_difference_check(
        scene, render_fn, ("lights", "emit", (lid, 1)), eps=1e-2)
    assert abs(g - fd) < 0.05 * max(abs(fd), 1e-3), (g, fd)
    assert g > 0  # brighter light -> brighter image


def test_grad_path_integrator_albedo():
    scene = cornell_spheres()
    render_fn = _make_render(integrator="path")
    g, fd = inverse.finite_difference_check(
        scene, render_fn, ("materials", "kd", (0, 1)), eps=1e-2)
    assert abs(g - fd) < 0.08 * max(abs(fd), 1e-3), (g, fd)


def test_inverse_rendering_recovers_albedo():
    """Perturb a wall colour, optimise it back toward the target render."""
    import dataclasses
    scene = cornell_spheres()
    render_fn = _make_render(size=24, spp=2)
    target = render_fn(scene, 0)

    wrong_kd = scene.materials.kd.at[1].set(jnp.array([0.1, 0.6, 0.6]))
    bad_scene = scene._replace(materials=dataclasses.replace(scene.materials, kd=wrong_kd))

    def render_step(sc, step):
        return render_fn(sc, step)

    fitted, losses = inverse.fit(
        bad_scene, target, render_step, n_steps=40,
        param_get=lambda s: {"materials": {"kd": s.materials.kd}},
        loss_fn=inverse.l2_loss)
    err0 = float(jnp.abs(wrong_kd[1] - scene.materials.kd[1]).mean())
    err1 = float(jnp.abs(fitted.materials.kd[1] - scene.materials.kd[1]).mean())
    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])
    assert err1 < err0 * 0.35, (err0, err1)
