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
    # wavefront width stays at one spp (262k lanes — wider wavefronts
    # measured slower per-ray); the per-dispatch host/tunnel overhead
    # (~40 ms through the axon tunnel) is amortised by running
    # BENCH_SPP_SEQ full 1-spp renders SEQUENTIALLY inside one jit step
    spp_batch = int(os.environ.get("BENCH_SPP_BATCH", 1))
    spp_seq = int(os.environ.get("BENCH_SPP_SEQ", 8))
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

    def one_batch(scene, camera, sample_lo):
        pixel_id = jnp.tile(jnp.arange(hw, dtype=jnp.uint32)[None, :], (spp_batch, 1))
        sample_idx = (jnp.arange(spp_batch, dtype=jnp.uint32) + sample_lo)[:, None] \
            * jnp.ones((1, hw), jnp.uint32)
        li_fn = lambda sc, o, d, pid, sid: path.li(sc, o, d, pid, sid, cfg,
                                                   return_stats=True, cone=cone,
                                                   compact_from=1)
        (rad, stats), wt = _render_lanes(scene, camera, cfg, li_fn, pixel_id, sample_idx)
        return (jnp.sum(rad * wt[..., None], axis=0), stats["rays_traced"],
                stats["occupancy"])

    def bench_step(scene, camera, sample_lo):
        # spp_seq sequential 1-spp renders inside ONE device dispatch:
        # the wavefront stays at its fastest width while the tunnel RTT
        # is paid once per spp_seq samples
        import jax.lax as lax

        def body(carry, k):
            img, rays = carry
            i2, r2, occ = one_batch(scene, camera, sample_lo + k * spp_batch)
            return (img + i2, rays + r2), occ

        init = (jnp.zeros((hw, 3)), jnp.zeros((), jnp.float32))
        (img, rays), occs = lax.scan(body, init,
                                     jnp.arange(spp_seq, dtype=jnp.uint32))
        return img, rays, occs[-1]

    step = jax.jit(bench_step)

    # warmup/compile
    img, rays, occ = step(scene, camera, jnp.uint32(0))
    img.block_until_ready()

    t0 = time.perf_counter()
    total_rays = 0.0
    for i in range(n_iters):
        img, rays, occ = step(scene, camera, jnp.uint32(i * spp_batch * spp_seq))
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
