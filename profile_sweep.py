#!/usr/bin/env python
"""One-number kernel-parameter probe: fused closest-hit on 262k
50%-live bounce rays (the dominant path-step stage), honoring the
PBRT_TPU_{CH,TPB,TILE,LC_NB,COV_CBLK} env knobs read at import time.
Run it once per setting (fresh process) to sweep:

  for s in "" "PBRT_TPU_CH=4" "PBRT_TPU_TPB=16" ...; do env $s python profile_sweep.py; done
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))


def timeit(fn, *args, k=6):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(k):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    from scenes.bunny import mesh_scene, mesh_camera
    from pbrt_tpu.geom import cluster as clmod
    from pbrt_tpu.core import rng
    from pbrt_tpu.cameras import cameras as cam

    res = 512
    hw = res * res
    scene = mesh_scene(subdivisions=6, use_bvh=True, textured=True)
    cs = scene.clusters
    camera = mesh_camera((res, res))

    pix = jnp.arange(hw, dtype=jnp.uint32)
    px = (pix % res).astype(jnp.float32) + 0.5
    py = (pix // res).astype(jnp.float32) + 0.5
    o, d, _ = cam.generate_rays(camera, jnp.stack([px, py], -1),
                                jnp.zeros((hw, 2)), jnp.zeros(hw))
    t_min = jnp.zeros(hw)
    t_max = jnp.full((hw,), 1e30)
    f_pal = jax.jit(lambda o, d, tmx: clmod.intersect_pallas(cs, o, d, t_min, tmx))
    _, outp = timeit(f_pal, o, d, t_max, k=2)
    hitm, t_hit = outp[0], outp[1]
    p_hit = o + d * jnp.where(hitm, t_hit, 1.0)[:, None] * 0.999
    ub = jnp.stack([rng.uniform_float(pix, jnp.uint32(i)) for i in (13, 14, 15)], -1)
    db = (ub * 2 - 1) / jnp.linalg.norm(ub * 2 - 1, axis=-1, keepdims=True)
    live = rng.uniform_float(pix, jnp.uint32(21)) < 0.5
    tmx_b = jnp.where(live, 1e30, -1.0)
    dt_bounce, ob = timeit(f_pal, p_hit, db, tmx_b)
    env = {k: os.environ[k] for k in os.environ if k.startswith("PBRT_TPU_")}
    print(f"SWEEP env={env} bounce_e2e={dt_bounce*1e3:.2f} ms "
          f"hit%={float(jnp.mean(ob[0])):.4f}", flush=True)


if __name__ == "__main__":
    main()
