#!/usr/bin/env python
"""Fine-grained stage profile of intersect_pallas at bench scale
(262k incoherent bounce rays): prepare sort / inverse / coverage /
cluster order / kernel / post. Drives the round-3 perf work."""
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


def fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def timeit(fn, *args, k=8, outer=3):
    out = fn(*args)
    fetch(out)
    best = 1e9
    for _ in range(outer):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 1e-9) / k, out


def main():
    measure_rtt()
    print(f"RTT {RTT*1e3:.1f} ms")
    scene = mesh_scene(subdivisions=6, use_bvh=True)
    cs = scene.clusters
    tri = scene.tri
    res = int(os.environ.get("RES", 512))
    hw = res * res
    camera = mesh_camera((res, res))
    pix = jnp.arange(hw, dtype=jnp.uint32)
    px = (pix % res).astype(jnp.float32) + 0.5
    py = (pix // res).astype(jnp.float32) + 0.5
    pfilm = jnp.stack([px, py], axis=-1)
    o, d, _ = cam.generate_rays(camera, pfilm, jnp.zeros((hw, 2)), jnp.zeros(hw))
    t_min = jnp.zeros(hw)
    t_max = jnp.full((hw,), 1e30)
    print(f"rays={hw} clusters={cs.n_clusters}")

    f_pal = jax.jit(lambda o, d, tmx: clmod.intersect_pallas(cs, o, d, t_min, tmx))
    dt, outp = timeit(f_pal, o, d, t_max)
    print(f"pallas primary:   {dt*1e3:8.2f} ms  {hw/dt/1e6:7.2f} Mrays/s")

    # bounce-like rays: origins on surface, cosine-ish random dirs
    hitm, t_hit = outp[0], outp[1]
    t_c = jnp.where(hitm, t_hit, 1.0)
    p_hit = o + d * t_c[:, None] * 0.999
    ub = jnp.stack([rng.uniform_float(pix, jnp.uint32(i)) for i in (13, 14, 15)], -1)
    db = ub * 2.0 - 1.0
    db = db / jnp.linalg.norm(db, axis=-1, keepdims=True)
    live = rng.uniform_float(pix, jnp.uint32(21)) < float(os.environ.get("LIVE", 0.5))
    tmx_b = jnp.where(live, 1e30, -1.0)

    dt, outb = timeit(f_pal, p_hit, db, tmx_b)
    print(f"pallas bounce:    {dt*1e3:8.2f} ms  {hw/dt/1e6:7.2f} Mrays/s (live={float(jnp.mean(live)):.2f})")

    # ---- stages on bounce rays
    def s_prepare(o, d, tmx):
        return clmod._prepare(cs, o, d, t_min, tmx)[3]["ox"]
    dt, _ = timeit(jax.jit(s_prepare), p_hit, db, tmx_b)
    print(f"  prepare (key+argsort+gather): {dt*1e3:8.2f} ms")

    def s_key(o, d, tmx):
        key = clmod._coherence_key(cs, o, d)
        return jnp.where(tmx > t_min, key, jnp.uint32(0xFFFFFFFF))
    dt, key = timeit(jax.jit(s_key), p_hit, db, tmx_b)
    print(f"    key only:                   {dt*1e3:8.2f} ms")

    f_sort = jax.jit(lambda k: jnp.argsort(k))
    dt, order = timeit(f_sort, key)
    print(f"    argsort 262k:               {dt*1e3:8.2f} ms")

    f_inv_argsort = jax.jit(lambda o: jnp.argsort(o))
    dt, _ = timeit(f_inv_argsort, order)
    print(f"    inverse via argsort:        {dt*1e3:8.2f} ms")

    def inv_scatter(o):
        n = o.shape[0]
        return jnp.zeros(n, o.dtype).at[o].set(jnp.arange(n, dtype=o.dtype))
    dt, _ = timeit(jax.jit(inv_scatter), order)
    print(f"    inverse via scatter:        {dt*1e3:8.2f} ms")

    def s_cov(o, d, tmx):
        shp, n, order, comp, os_, ds_, nt = clmod._prepare(cs, o, d, t_min, tmx)
        planes, corder, tnear_sorted, counts, covbits = clmod._pallas_inputs(cs, comp, os_, ds_)
        return counts
    dt, counts = timeit(jax.jit(s_cov), p_hit, db, tmx_b)
    print(f"  prepare+coverage+corder:      {dt*1e3:8.2f} ms")
    cnp = np.asarray(counts)
    print(f"  coverage/tile: mean={cnp.mean():.1f} max={cnp.max()} p50={np.percentile(cnp,50):.0f} p90={np.percentile(cnp,90):.0f} rounds_sum={np.ceil(cnp/8).sum():.0f}")

    def s_kernel(o, d, tmx):
        from pbrt_tpu.kernels import cluster_pallas as kp
        shp, n, order, comp, os_, ds_, nt = clmod._prepare(cs, o, d, t_min, tmx)
        planes, corder, tnear_sorted, counts, covbits = clmod._pallas_inputs(cs, comp, os_, ds_)
        t_best, slot, bary = kp.traverse_tiles(cs.packed_mxu, planes, corder,
                                               tnear_sorted, counts,
                                               covbits=covbits)
        return t_best
    dt, _ = timeit(jax.jit(s_kernel), p_hit, db, tmx_b)
    print(f"  prepare+coverage+kernel:      {dt*1e3:8.2f} ms")

    # occluded on same rays
    f_occ = jax.jit(lambda o, d, tmx: clmod.occluded_pallas(cs, o, d, t_min,
                                                            jnp.where(tmx > 0, 1.0, -1.0)))
    dt, _ = timeit(f_occ, p_hit, db, tmx_b)
    print(f"pallas occluded (dist 1.0):     {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
