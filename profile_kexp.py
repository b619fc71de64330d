#!/usr/bin/env python
"""Kernel-overhead experiments: time the traversal kernel alone at two
occupancies under CMAX / TPB / CH variations to locate the fixed cost."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

from scenes.bunny import mesh_scene, mesh_camera
from pbrt_tpu.geom import cluster as clmod
from pbrt_tpu.core import rng
from pbrt_tpu.cameras import cameras as cam

RTT = 0.0


def measure_rtt():
    global RTT
    x = jnp.zeros(())
    f = jax.jit(lambda x: x + 1)
    for _ in range(3):
        float(f(x))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    RTT = min(ts)


def timeit(fn, *args, k=8, outer=3):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    best = 1e9
    for _ in range(outer):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 1e-9) / k


def main():
    measure_rtt()
    scene = mesh_scene(subdivisions=6, use_bvh=True)
    cs = scene.clusters
    tri = scene.tri
    res = 512
    hw = res * res
    camera = mesh_camera((res, res))
    pix = jnp.arange(hw, dtype=jnp.uint32)
    px = (pix % res).astype(jnp.float32) + 0.5
    py = (pix // res).astype(jnp.float32) + 0.5
    pfilm = jnp.stack([px, py], axis=-1)
    o, d, _ = cam.generate_rays(camera, pfilm, jnp.zeros((hw, 2)), jnp.zeros(hw))
    t_min = jnp.zeros(hw)
    f_pal = jax.jit(lambda o, d, tmx: clmod.intersect_pallas(cs, o, d, t_min, tmx)[1])

    outp = jax.jit(lambda o, d: clmod.intersect_pallas(
        cs, tri, o, d, t_min, jnp.full((hw,), 1e30)))(o, d)
    hitm, t_hit = outp[0], outp[1]
    t_c = jnp.where(hitm, t_hit, 1.0)
    p_hit = o + d * t_c[:, None] * 0.999
    ub = jnp.stack([rng.uniform_float(pix, jnp.uint32(i)) for i in (13, 14, 15)], -1)
    db = ub * 2.0 - 1.0
    db = db / jnp.linalg.norm(db, axis=-1, keepdims=True)

    for live_f in (1.0, 0.5, 0.125):
        live = rng.uniform_float(pix, jnp.uint32(21)) < live_f
        tmx_b = jnp.where(live, 1e30, -1.0)
        dt = timeit(f_pal, p_hit, db, tmx_b)
        print(f"bounce live={live_f:5.3f}: {dt*1e3:8.2f} ms  {hw/dt/1e6:7.2f} Mrays/s")

    dt = timeit(f_pal, o, d, jnp.full((hw,), 1e30))
    print(f"primary:           {dt*1e3:8.2f} ms  {hw/dt/1e6:7.2f} Mrays/s")


if __name__ == "__main__":
    main()
