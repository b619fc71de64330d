#!/usr/bin/env python
"""Headline benchmark: forward path-tracing throughput on one chip.

Prints ONE JSON line:
  {"metric": "Mrays/s/chip fwd path d5 mesh+BVH", "value": N,
   "unit": "Mrays/s", "vs_baseline": N}

vs_baseline is against the BASELINE.json north-star target of
50 Mrays/s/chip (the reference publishes no numbers of its own —
BASELINE.md).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

    from scenes.bunny import mesh_scene, mesh_camera
    from pbrt_tpu.integrate import driver, path
    from pbrt_tpu.core import samplers as smp
    from pbrt_tpu.dist.sharding import _render_lanes

    res = int(os.environ.get("BENCH_RES", 512))
    # 2 spp per dispatch amortises the per-dispatch host/tunnel overhead
    # (~40 ms through the axon tunnel) over twice the rays
    spp_batch = int(os.environ.get("BENCH_SPP_BATCH", 2))
    n_iters = int(os.environ.get("BENCH_ITERS", 3))
    depth = 5

    scene = mesh_scene(subdivisions=6, use_bvh=True,
                       textured=os.environ.get("BENCH_TEXTURED", "1") == "1")
    camera = mesh_camera((res, res))
    cfg = driver.RenderConfig(
        width=res, height=res, spp=spp_batch, max_depth=depth,
        sampler=smp.SamplerConfig(kind="zerotwo", spp=max(spp_batch, 1)))

    hw = res * res

    from pbrt_tpu.cameras import cameras as cammod
    cone = cammod.cone_start(camera)   # host-side: resolution must be concrete

    def bench_step(scene, camera, sample_lo):
        pixel_id = jnp.tile(jnp.arange(hw, dtype=jnp.uint32)[None, :], (spp_batch, 1))
        sample_idx = (jnp.arange(spp_batch, dtype=jnp.uint32) + sample_lo)[:, None] \
            * jnp.ones((1, hw), jnp.uint32)
        li_fn = lambda sc, o, d, pid, sid: path.li(sc, o, d, pid, sid, cfg,
                                                   return_stats=True, cone=cone,
                                                   compact_from=1)
        (rad, stats), wt = _render_lanes(scene, camera, cfg, li_fn, pixel_id, sample_idx)
        return (jnp.sum(rad * wt[..., None], axis=0), stats["rays_traced"],
                stats["occupancy"])

    step = jax.jit(bench_step)

    # warmup/compile
    img, rays, occ = step(scene, camera, jnp.uint32(0))
    img.block_until_ready()

    t0 = time.perf_counter()
    total_rays = 0.0
    for i in range(n_iters):
        img, rays, occ = step(scene, camera, jnp.uint32(i * spp_batch))
        img.block_until_ready()
        total_rays += float(rays)
    dt = time.perf_counter() - t0

    mrays = total_rays / dt / 1e6
    target = 50.0
    print(json.dumps({
        "metric": "Mrays/s/chip fwd path d5 mesh+BVH",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / target, 3),
        "step_ms": round(dt / n_iters * 1e3, 1),
        "occupancy_per_bounce": [round(float(x), 3) for x in np.asarray(occ)],
    }))


if __name__ == "__main__":
    main()
