"""Multi-host distributed entry (SURVEY §5.8; BASELINE config 5).

The reference's entire parallel runtime is single-process rayon
(src/core/parallel.rs); the TPU-native equivalent is the JAX runtime:
`jax.distributed.initialize` connects the processes of a pod slice over
DCN, after which `jax.devices()` is the GLOBAL device list and the
existing `sharding.make_mesh()` + `shard_map` pipeline scales across
hosts with zero further changes — collectives ride ICI within a host
and DCN across hosts.

Run a 2-host weak-scaling job as a command (not a refactor):

    # host 0                                    # host 1
    python -m pbrt_tpu.dist.multihost \\        python -m pbrt_tpu.dist.multihost \\
        --coordinator host0:1234 \\                 --coordinator host0:1234 \\
        --num-processes 2 --process-id 0            --num-processes 2 --process-id 1

Environment fallbacks: PBRT_TPU_COORDINATOR, PBRT_TPU_NUM_PROCESSES,
PBRT_TPU_PROCESS_ID (Cloud TPU autodetects all three when unset).
"""
from __future__ import annotations

import os
import time

_INITIALIZED = False


def ensure_initialized(coordinator=None, num_processes=None, process_id=None):
    """Idempotent multi-host init. Single-process (num_processes absent
    or 1) is a no-op beyond reading the env. Returns
    (process_count, process_index)."""
    global _INITIALIZED
    import jax

    coordinator = coordinator or os.environ.get("PBRT_TPU_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("PBRT_TPU_NUM_PROCESSES", "1"))
    if process_id is None and "PBRT_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["PBRT_TPU_PROCESS_ID"])

    if not _INITIALIZED and (num_processes > 1 or coordinator):
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        _INITIALIZED = True
    return jax.process_count(), jax.process_index()


def weak_scaling_bench(res=256, spp=4, depth=5):
    """Per-host throughput report for the weak-scaling run: every
    process renders its shard of a bunny frame; the mesh spans ALL
    global devices, so adding a host doubles the wavefront at constant
    per-device work (≥80% efficiency target, BASELINE config 5)."""
    import jax
    import jax.numpy as jnp
    from scenes.bunny import mesh_scene, mesh_camera
    from pbrt_tpu.integrate import driver, path
    from pbrt_tpu.core import samplers as smp
    from . import sharding

    nproc, pid = ensure_initialized()
    mesh = sharding.make_mesh()
    scene = mesh_scene(subdivisions=6, use_bvh=True)
    camera = mesh_camera((res, res))
    cfg = driver.RenderConfig(width=res, height=res, spp=spp, max_depth=depth,
                              sampler=smp.SamplerConfig(kind="zerotwo", spp=spp))

    img = sharding.render_sharded(scene, camera, cfg, path.make_li(cfg, camera=camera),
                                  mesh=mesh)
    jax.block_until_ready(img)       # compile warmup
    t0 = time.perf_counter()
    img = sharding.render_sharded(scene, camera, cfg, path.make_li(cfg, camera=camera),
                                  mesh=mesh)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    rays = res * res * spp * (2 * depth + 1)
    if pid == 0:
        print(f"processes={nproc} devices={len(jax.devices())} "
              f"wall={dt*1e3:.0f}ms upper-bound-rays={rays} "
              f"({rays/dt/1e6:.2f} Mrays/s aggregate)")
    return dt


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()
    ensure_initialized(args.coordinator, args.num_processes, args.process_id)
    weak_scaling_bench(res=args.res)
