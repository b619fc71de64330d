#!/usr/bin/env python
"""Profile traversal stages on the real chip: jnp tracer vs pallas
kernel, primary + bounce rays, plus sub-stage timings.

Timing method: the axon tunnel defers execution — block_until_ready
does not actually wait, and every host fetch costs a ~24 ms RTT. So we
queue `k` dispatches back-to-back (device executes them serially) and
fetch one scalar at the end: total ≈ k*T + RTT.
"""
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
    print(f"fetch RTT: {RTT*1e3:.2f} ms")


def fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def timeit(fn, *args, k=8, outer=3):
    out = fn(*args)
    fetch(out)           # compile + warm
    best = 1e9
    for _ in range(outer):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 1e-9) / k, out


def main():
    print("devices:", jax.devices())
    measure_rtt()
    scene = mesh_scene(subdivisions=6, use_bvh=True)
    cs = scene.clusters
    tri = scene.tri
    print(f"tris={tri.indices.shape[0]} clusters={cs.n_clusters} k={cs.cluster_size}")

    res = 256
    camera = mesh_camera((res, res))
    from pbrt_tpu.cameras import cameras as cam
    hw = res * res
    pix = jnp.arange(hw, dtype=jnp.uint32)
    px = (pix % res).astype(jnp.float32) + 0.5
    py = (pix // res).astype(jnp.float32) + 0.5
    pfilm = jnp.stack([px, py], axis=-1)
    o, d, _ = cam.generate_rays(camera, pfilm, jnp.zeros((hw, 2)), jnp.zeros(hw))
    t_min = jnp.zeros(hw)
    t_max = jnp.full((hw,), 1e30)
    n_rays = hw
    print(f"rays: {n_rays}")

    f_jnp = jax.jit(lambda o, d: clmod.intersect(cs, tri, o, d, t_min, t_max))
    dt, out = timeit(f_jnp, o, d)
    print(f"jnp intersect primary:    {dt*1e3:8.2f} ms  {n_rays/dt/1e6:7.2f} Mrays/s  hit%={float(jnp.mean(out[0])):.3f}")

    pallas_ok = cs.cluster_size == 128
    if pallas_ok:
        f_pal = jax.jit(lambda o, d: clmod.intersect_pallas(cs, o, d, t_min, t_max))
        try:
            dt, outp = timeit(f_pal, o, d)
            print(f"pallas intersect primary: {dt*1e3:8.2f} ms  {n_rays/dt/1e6:7.2f} Mrays/s  hit%={float(jnp.mean(outp[0])):.3f}")
            agree = float(jnp.mean((outp[0] == out[0]).astype(jnp.float32)))
            print(f"  hit agreement: {agree:.4f}")
        except Exception as e:
            print("pallas failed:", repr(e)[:500])
            pallas_ok = False
    else:
        print("pallas skipped (needs k=128 clusters)")

    def stage_prepare(o, d):
        return clmod._prepare(cs, o, d, t_min, t_max)[3]
    dt, _ = timeit(jax.jit(stage_prepare), o, d)
    print(f"  prepare(sort rays):     {dt*1e3:8.2f} ms")

    def stage_cov(o, d):
        shp, n, order, comp, os_, ds_, nt = clmod._prepare(cs, o, d, t_min, t_max)
        cov, tnear = clmod._tile_cluster_pass(cs, os_, ds_, comp["tmin"], comp["tmax"])
        return cov
    dt, cov = timeit(jax.jit(stage_cov), o, d)
    print(f"  prepare+coverage:       {dt*1e3:8.2f} ms")

    def stage_sort(o, d):
        shp, n, order, comp, os_, ds_, nt = clmod._prepare(cs, o, d, t_min, t_max)
        cov, tnear = clmod._tile_cluster_pass(cs, os_, ds_, comp["tmin"], comp["tmax"])
        corder, tns = clmod._sorted_cluster_order(cov, tnear)
        return corder
    dt, _ = timeit(jax.jit(stage_sort), o, d)
    print(f"  +cluster argsort:       {dt*1e3:8.2f} ms")

    cov_counts = jnp.sum(cov, axis=1)
    print(f"  coverage/tile: mean={float(jnp.mean(cov_counts)):.1f} max={int(jnp.max(cov_counts))} p50={float(jnp.percentile(cov_counts,50)):.0f} p90={float(jnp.percentile(cov_counts,90)):.0f}")

    u = rng.uniform_float(pix, jnp.uint32(7))
    u2 = rng.uniform_float(pix, jnp.uint32(8))
    target = jnp.array([0.0, 1.5, 0.0])[None, :] + jnp.stack([u - 0.5, u2 * 0 + 0.0, u2 - 0.5], -1) * 0.2
    dsh = target - o
    f_occ = jax.jit(lambda o, d: clmod.occluded(cs, tri, o, d, t_min, jnp.ones(hw)))
    dt, occ = timeit(f_occ, o, dsh)
    print(f"jnp occluded:             {dt*1e3:8.2f} ms  {n_rays/dt/1e6:7.2f} Mrays/s  occ%={float(jnp.mean(occ)):.3f}")

    hitm = out[0]
    t_hit = jnp.where(hitm, out[1], 1.0)
    p_hit = o + d * t_hit[:, None] * 0.999
    ub = jnp.stack([rng.uniform_float(pix, jnp.uint32(i)) for i in (13, 14, 15)], -1)
    db = ub * 2.0 - 1.0
    db = db / jnp.linalg.norm(db, axis=-1, keepdims=True)
    dt, outb = timeit(f_jnp, p_hit, db)
    print(f"jnp intersect bounce:     {dt*1e3:8.2f} ms  {n_rays/dt/1e6:7.2f} Mrays/s  hit%={float(jnp.mean(outb[0])):.3f}")
    if pallas_ok:
        dt, outbp = timeit(f_pal, p_hit, db)
        print(f"pallas intersect bounce:  {dt*1e3:8.2f} ms  {n_rays/dt/1e6:7.2f} Mrays/s  hit%={float(jnp.mean(outbp[0])):.3f}")


if __name__ == "__main__":
    main()
