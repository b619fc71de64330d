#!/usr/bin/env python
"""Scene-size scaling of the tile×cluster traversal (VERDICT r3 #1
'done' criterion): a ≥500k-triangle scene must render with per-tile
covered-cluster counts SUBLINEAR in the cluster count C. Renders the
blob scene at growing subdivision levels, reporting per-tile coverage
stats, the coverage/corder overhead, and end-to-end throughput.

Appends/refreshes the 'Scene-size scaling' section numbers for
PROFILE_r04.md (run on the TPU chip)."""
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
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(())
    for _ in range(3):
        float(f(x))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    RTT = min(ts)


def timeit(fn, *args, k=4):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 1e-9) / k, out


def main():
    measure_rtt()
    res = 512
    hw = res * res
    rows = []
    for sub in (6, 8):
        scene = mesh_scene(subdivisions=sub, use_bvh=True, textured=False)
        cs = scene.clusters
        camera = mesh_camera((res, res))
        pix = jnp.arange(hw, dtype=jnp.uint32)
        px = (pix % res).astype(jnp.float32) + 0.5
        py = (pix // res).astype(jnp.float32) + 0.5
        o, d, _ = cam.generate_rays(camera, jnp.stack([px, py], -1),
                                    jnp.zeros((hw, 2)), jnp.zeros(hw))
        t_min = jnp.zeros(hw)
        t_max = jnp.full((hw,), 1e30)

        # pass the cluster arrays as ARGUMENTS: closure capture bakes the
        # multi-hundred-MB feature tables into the HLO as constants and
        # overflows the remote-compile request at 1M+ triangles
        f_pal = jax.jit(lambda cs_, o, d, tmx: clmod.intersect_pallas(cs_, o, d, t_min, tmx))
        dt, outp = timeit(f_pal, cs, o, d, t_max)

        # bounce rays at 50% live (the incoherent worst case)
        hitm, t_hit = outp[0], outp[1]
        p_hit = o + d * jnp.where(hitm, t_hit, 1.0)[:, None] * 0.999
        ub = jnp.stack([rng.uniform_float(pix, jnp.uint32(i)) for i in (13, 14, 15)], -1)
        db = (ub * 2 - 1) / jnp.linalg.norm(ub * 2 - 1, axis=-1, keepdims=True)
        live = rng.uniform_float(pix, jnp.uint32(21)) < 0.5
        tmx_b = jnp.where(live, 1e30, -1.0)
        dt_b, _ = timeit(f_pal, cs, p_hit, db, tmx_b)

        def s_cov(cs_, o_, d_, tmx):
            _, _, _, comp, os_, ds_, _ = clmod._prepare(cs_, o_, d_, t_min, tmx)
            return clmod._pallas_inputs(cs_, comp, os_, ds_)[3]  # counts

        dt_cov, counts = timeit(jax.jit(s_cov), cs, p_hit, db, tmx_b)
        cnp = np.asarray(counts)
        live_tiles = cnp[cnp > 0]
        rows.append(dict(
            sub=sub, tris=int(scene.tri.count), C=cs.n_clusters,
            cov_mean=float(live_tiles.mean()) if len(live_tiles) else 0.0,
            cov_p90=float(np.percentile(live_tiles, 90)) if len(live_tiles) else 0.0,
            cov_frac=float(live_tiles.mean() / cs.n_clusters),
            cov_ms=dt_cov * 1e3,
            prim_ms=dt * 1e3, prim_mrays=hw / dt / 1e6,
            bounce_ms=dt_b * 1e3, bounce_mrays=hw / dt_b / 1e6))
        print(rows[-1])

    print("\n| tris | clusters C | covered/tile (live mean) | p90 | mean/C "
          "| coverage+corder ms | primary Mrays/s | bounce Mrays/s |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['tris']} | {r['C']} | {r['cov_mean']:.1f} | "
              f"{r['cov_p90']:.0f} | {r['cov_frac']:.3f} | {r['cov_ms']:.1f} | "
              f"{r['prim_mrays']:.2f} | {r['bounce_mrays']:.2f} |")
    c0, c1 = rows[0], rows[-1]
    growth_c = c1["C"] / c0["C"]
    growth_cov = max(c1["cov_mean"], 1e-9) / max(c0["cov_mean"], 1e-9)
    print(f"\nC grew {growth_c:.1f}x; per-tile coverage grew {growth_cov:.2f}x "
          f"(sublinear factor {growth_cov/growth_c:.3f}).")


if __name__ == "__main__":
    main()
