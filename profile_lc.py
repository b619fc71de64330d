#!/usr/bin/env python
"""A/B the lane-compacted traversal kernel (PBRT_TPU_LC) against the
round-4 full-tile kernel on real bounce rays: agreement + wall time."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

from scenes.bunny import mesh_scene, mesh_camera
from pbrt_tpu.geom import cluster as clmod
from pbrt_tpu.kernels import cluster_pallas as kp
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
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(outer):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 1e-9) / k, out


def main():
    measure_rtt()
    scene = mesh_scene(subdivisions=6, use_bvh=True)
    cs = scene.clusters
    res = 512
    hw = res * res
    camera = mesh_camera((res, res))
    pix = jnp.arange(hw, dtype=jnp.uint32)
    px = (pix % res).astype(jnp.float32) + 0.5
    py = (pix // res).astype(jnp.float32) + 0.5
    pfilm = jnp.stack([px, py], axis=-1)
    o, d, _ = cam.generate_rays(camera, pfilm, jnp.zeros((hw, 2)), jnp.zeros(hw))
    t_min = jnp.zeros(hw)
    t_max = jnp.full((hw,), 1e30)

    f_pal = jax.jit(lambda o, d, tmx: clmod.intersect_pallas(cs, o, d, t_min, tmx))
    hitm, t_hit = f_pal(o, d, t_max)[:2]
    t_c = jnp.where(hitm, t_hit, 1.0)
    p_hit = o + d * t_c[:, None] * 0.999
    ub = jnp.stack([rng.uniform_float(pix, jnp.uint32(i)) for i in (13, 14, 15)], -1)
    db = ub * 2.0 - 1.0
    db = db / jnp.linalg.norm(db, axis=-1, keepdims=True)
    live = rng.uniform_float(pix, jnp.uint32(21)) < 0.5
    tmx_b = jnp.where(live, 1e30, -1.0)

    for name, oo, dd, tmx in (("primary", o, d, t_max),
                              ("bounce50", p_hit, db, tmx_b)):
        outs = {}
        for lc in (False, True):
            kp.LC = lc
            f = jax.jit(lambda o, d, tmx: clmod.intersect_pallas(cs, o, d, t_min, tmx))
            dt, out = timeit(f, oo, dd, tmx)
            hit, t, tid, b1, b2 = out
            n = float(jnp.sum((tmx > 0)))
            print(f"{name:9s} LC={int(lc)}  {dt*1e3:7.2f} ms  "
                  f"{n/dt/1e6:6.2f} Mrays/s  hits={int(jnp.sum(hit))}")
            outs[lc] = out
        h0, t0_, i0, _, _ = outs[False]
        h1, t1_, i1, _, _ = outs[True]
        agree_h = float(jnp.mean((h0 == h1).astype(jnp.float32)))
        both = h0 & h1
        dt_ = jnp.where(both, jnp.abs(t0_ - t1_) / jnp.maximum(t0_, 1e-6), 0.0)
        same_tri = float(jnp.mean(jnp.where(both, (i0 == i1), True).astype(jnp.float32)))
        print(f"  agree: hitmask {agree_h:.6f}  tri {same_tri:.6f}  "
              f"max rel t diff {float(jnp.max(dt_)):.2e}")
    kp.LC = True


if __name__ == "__main__":
    main()
