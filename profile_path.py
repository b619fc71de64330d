#!/usr/bin/env python
"""Per-stage profile of the full path-tracing step on the real chip —
the SURVEY §5.1 profiling deliverable. Times each wavefront stage of
bounce 1 in isolation (jit'd separately; XLA fusion means the parts
don't sum exactly to the whole, but this locates the hogs) plus the
full li() step, at the bench scene/shape.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

from scenes.bunny import mesh_scene, mesh_camera
from pbrt_tpu.integrate import driver, path, common
from pbrt_tpu.core import samplers as smp
from pbrt_tpu.core import vecmath as vm
from pbrt_tpu.geom import scene as scenemod
from pbrt_tpu.shade import materials as matmod
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


def timeit(fn, *args, k=4, outer=2):
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
    res = int(os.environ.get("BENCH_RES", 512))
    depth = 5
    measure_rtt()
    scene = mesh_scene(subdivisions=6, use_bvh=True)
    camera = mesh_camera((res, res))
    cfg = driver.RenderConfig(width=res, height=res, spp=1, max_depth=depth,
                              sampler=smp.SamplerConfig(kind="zerotwo", spp=1))
    hw = res * res
    pixel_id = jnp.arange(hw, dtype=jnp.uint32)
    sample_idx = jnp.zeros((hw,), jnp.uint32)
    px = (pixel_id % res).astype(jnp.float32) + 0.5
    py = (pixel_id // res).astype(jnp.float32) + 0.5
    pfilm = jnp.stack([px, py], axis=-1)
    o, d, _ = cam.generate_rays(camera, pfilm, jnp.zeros((hw, 2)), jnp.zeros(hw))
    print(f"rays/batch: {hw}  depth: {depth}")

    # full step
    li_fn = lambda o, d: path.li(scene, o, d, pixel_id, sample_idx, cfg,
                                 return_stats=True)
    f_full = jax.jit(li_fn)
    dt_full = timeit(f_full, o, d)
    (_, stats) = f_full(o, d)
    rays = float(stats["rays_traced"])
    occ = np.asarray(stats["occupancy"])
    print(f"full li step:        {dt_full*1e3:8.1f} ms   rays={rays:.0f}  "
          f"{rays/dt_full/1e6:6.2f} Mrays/s")
    print(f"  occupancy/bounce:  {np.array2string(occ, precision=2)}")

    # stage timings at bounce-1 state
    f_hit = jax.jit(lambda o, d: scenemod.intersect(scene, o, d))
    dt = timeit(f_hit, o, d)
    print(f"intersect primary:   {dt*1e3:8.1f} ms")
    hit = f_hit(o, d)

    sample1, sample2 = path.default_provider(cfg, pixel_id, sample_idx)
    active = hit.valid & (hit.material_id >= 0)

    def stage_shade(hit, d):
        wo = -d
        frame = common.shading_frame(hit, scene)
        lp = matmod.resolve(scene.materials, hit.material_id, hit.uv, hit.p,
                            scene.textures)
        u_bsdf = sample2(1, 0)
        u_lobe = sample1(1, 2)
        wo_l = frame.to_local(wo)
        wi_l, f, pdf, spec, trans = matmod.sample(lp, scene.materials.kinds_present,
                                                  wo_l, u_lobe, u_bsdf)
        return frame.to_world(wi_l), f, pdf

    dt = timeit(jax.jit(stage_shade), hit, d)
    print(f"shade+bsdf sample:   {dt*1e3:8.1f} ms")
    wi, _, _ = jax.jit(stage_shade)(hit, d)

    def stage_nee_nosh(hit, d):
        """NEE light half minus the shadow ray."""
        wo = -d
        frame = common.shading_frame(hit, scene)
        lp = matmod.resolve(scene.materials, hit.material_id, hit.uv, hit.p,
                            scene.textures)
        lt, pmf = common.select_light(scene, cfg.light_strategy, hit.p, sample1(1, 5))
        from pbrt_tpu.lights import lights as lightsmod
        ls = lightsmod.sample_li(scene.lights, scene, lt, hit.p, sample2(1, 3),
                                 scene.world_radius)
        f = matmod.evaluate_f(lp, scene.materials.kinds_present,
                              frame.to_local(wo), frame.to_local(ls["wi"]))
        return f, ls["pdf"]

    dt = timeit(jax.jit(stage_nee_nosh), hit, d)
    print(f"nee (minus shadow):  {dt*1e3:8.1f} ms")

    o_b = vm.offset_ray_origin(hit.p, hit.ng, wi)
    f_occ = jax.jit(lambda o, w, a: scenemod.occluded(scene, o, w, t_max=jnp.full((hw,), 1.0), active=a))
    dt = timeit(f_occ, o_b, wi, active)
    print(f"occluded (shadow):   {dt*1e3:8.1f} ms  (live={float(jnp.mean(active)):.2f})")

    f_ext = jax.jit(lambda o, w, a: scenemod.intersect(scene, o, w, active=a))
    dt = timeit(f_ext, o_b, wi, active)
    print(f"intersect bounce:    {dt*1e3:8.1f} ms  (live={float(jnp.mean(active)):.2f})")

    half = active & (jnp.arange(hw) % 4 == 0)
    dt = timeit(f_ext, o_b, wi, half)
    print(f"intersect 1/4 live:  {dt*1e3:8.1f} ms  (live={float(jnp.mean(half)):.2f})")

    def stage_emit(hit, d):
        return path._emission_pickup(scene, scene.lights, cfg, hit, d, o,
                                     jnp.ones((hw,)), jnp.zeros((hw,), bool), active)
    dt = timeit(jax.jit(stage_emit), hit, d)
    print(f"emission pickup:     {dt*1e3:8.1f} ms")

    def stage_sampler(pid, sid):
        return sum(jnp.sum(sample2(b, 0)) + jnp.sum(sample2(b, 3))
                   + jnp.sum(sample1(b, 2)) + jnp.sum(sample1(b, 5))
                   + jnp.sum(sample1(b, 6)) for b in range(depth))
    dt = timeit(jax.jit(stage_sampler), pixel_id, sample_idx)
    print(f"sampler (all dims):  {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
