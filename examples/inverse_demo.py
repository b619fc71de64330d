"""BASELINE config 5 demo: multi-device inverse rendering.

Renders a target Cornell image, perturbs wall albedos + light emission,
then recovers them by gradient descent with pixels sharded over the
device mesh and gradients psum-reduced (dist/sharding.make_train_step).

Run on N virtual devices:
  JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/inverse_demo.py
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scenes.cornell import cornell_spheres, cornell_camera
from pbrt_tpu.integrate import driver, path
from pbrt_tpu.core import samplers as smp
from pbrt_tpu.dist import sharding


def main():
    h = w = 32
    spp = 4
    scene = cornell_spheres()
    camera = cornell_camera((h, w))
    cfg = driver.RenderConfig(width=w, height=h, spp=spp, max_depth=4,
                              sampler=smp.SamplerConfig(kind="zerotwo", spp=spp))
    mesh = sharding.make_mesh()
    print(f"device mesh: {mesh.devices.size} devices")

    li = path.make_li(cfg)
    target = sharding.render_sharded(scene, camera, cfg, li, mesh=mesh)

    # perturb: gray out the coloured walls, dim the light
    kd = scene.materials.kd.at[1].set(jnp.full(3, 0.4)).at[2].set(jnp.full(3, 0.4))
    emit = scene.lights.emit * 0.5
    bad = scene._replace(
        materials=dataclasses.replace(scene.materials, kd=kd),
        lights=dataclasses.replace(scene.lights, emit=emit))

    def pget(sc):
        return {"kd": sc.materials.kd, "emit": sc.lights.emit}

    def pset(sc, p):
        return sc._replace(
            materials=dataclasses.replace(sc.materials, kd=jnp.clip(p["kd"], 0, 1)),
            lights=dataclasses.replace(sc.lights, emit=jnp.maximum(p["emit"], 0)))

    step = sharding.make_train_step(cfg, li, pget, pset, mesh=mesh)
    sc = bad
    for it in range(60):
        sc, loss = step(sc, camera, target, 0.25)
        if it % 10 == 0:
            print(f"step {it:3d}  loss {float(loss):.5f}")

    err0 = float(jnp.abs(bad.materials.kd[1:3] - scene.materials.kd[1:3]).mean())
    err1 = float(jnp.abs(sc.materials.kd[1:3] - scene.materials.kd[1:3]).mean())
    eerr0 = float(jnp.abs(bad.lights.emit - scene.lights.emit).mean())
    eerr1 = float(jnp.abs(sc.lights.emit - scene.lights.emit).mean())
    print(f"wall albedo error: {err0:.4f} -> {err1:.4f}")
    print(f"emission error:    {eerr0:.4f} -> {eerr1:.4f}")
    assert err1 < err0 * 0.5 and eerr1 < eerr0 * 0.6, "inverse rendering did not converge"
    print("converged ✓")


if __name__ == "__main__":
    main()
