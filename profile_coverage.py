#!/usr/bin/env python
"""Measure WHERE the traversal's wasted triangle tests come from.

For bench-scale bounce rays, computes total tested-triangle work
W = sum over (tile, covered cluster) of TILE, under variations:
  - tile size 64/128/256
  - origin-morton key bits 5/6/7
  - cluster granularity 128 vs sub-boxes of 32 (4 per cluster)
  - per-RAY coverage (the ray-binning lower bound)
Pure jnp (no pallas) — drives the round-4 kernel redesign.
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
from pbrt_tpu.cameras import cameras as cam


def first_cluster_key(cs, o, d, t_min, t_max, bmin, bmax, nearest=1):
    """Per-ray key: id(s) of the nearest-entry cluster(s), then dir octant."""
    n = o.shape[0]
    c = bmin.shape[0]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d < 0, -1e-12, 1e-12), d)

    @jax.jit
    def chunk(o, d, inv, tmn, tmx):
        m = o.shape[0]
        tn = jnp.broadcast_to(tmn[:, None], (m, c))
        tf = jnp.broadcast_to(tmx[:, None], (m, c))
        for ax in range(3):
            t0 = (bmin[None, :, ax] - o[:, ax:ax+1]) * inv[:, ax:ax+1]
            t1 = (bmax[None, :, ax] - o[:, ax:ax+1]) * inv[:, ax:ax+1]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1) * 1.0001)
        tnear = jnp.where(tn <= tf, tn, np.float32(np.inf))
        return jnp.argmin(tnear, axis=1), jnp.min(tnear, axis=1)

    outs = []
    step = max(1, (1 << 24) // c)
    for s in range(0, n, step):
        e = min(n, s + step)
        outs.append(chunk(o[s:e], d[s:e], inv[s:e], t_min[s:e], t_max[s:e]))
    fc = jnp.concatenate([a for a, _ in outs])
    ftn = jnp.concatenate([b for _, b in outs])
    octant = ((d[:, 0] < 0) * 1 + (d[:, 1] < 0) * 2 + (d[:, 2] < 0) * 4)
    miss = ~jnp.isfinite(ftn)
    key = fc.astype(jnp.uint32) * 8 + octant.astype(jnp.uint32)
    return jnp.where(miss, jnp.uint32(0xFFFFFFFF), key)


def coverage_stats(cs, o, d, t_min, t_max, tile, obits, bmin, bmax, label,
                   key_override=None):
    """Returns (n_pairs, work) where work = sum_tile cov(tile)*tile."""
    n = o.shape[0]
    t_max = clmod._world_exit_cap(cs, o, d, t_min, t_max)
    import pbrt_tpu.geom.cluster as cl
    old = cl._KEY_OBITS
    cl._KEY_OBITS = obits
    key = cl._coherence_key(cs, o, d)
    cl._KEY_OBITS = old
    live = t_max > t_min
    if key_override is not None:
        key = key_override
    key = jnp.where(live, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    pad = (-n) % tile
    order = jnp.concatenate([order, jnp.zeros(pad, order.dtype)]) if pad else order
    os_ = o[order].reshape(-1, tile, 3)
    ds_ = d[order].reshape(-1, tile, 3)
    tmins = t_min[order].reshape(-1, tile)
    tmaxs = jnp.where(jnp.arange(n + pad) < n, t_max[order], -1.0).reshape(-1, tile)
    nt = os_.shape[0]
    c = bmin.shape[0]

    @jax.jit
    def chunk(os_, ds_, tmins, tmaxs):
        m = os_.shape[0]
        inv = 1.0 / jnp.where(jnp.abs(ds_) < 1e-12,
                              jnp.where(ds_ < 0, -1e-12, 1e-12), ds_)
        tn = jnp.broadcast_to(tmins[:, :, None], (m, tile, c))
        tf = jnp.broadcast_to(tmaxs[:, :, None], (m, tile, c))
        for ax in range(3):
            t0 = (bmin[None, None, :, ax] - os_[:, :, ax:ax+1]) * inv[:, :, ax:ax+1]
            t1 = (bmax[None, None, :, ax] - os_[:, :, ax:ax+1]) * inv[:, :, ax:ax+1]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1) * 1.0001)
        hit = tn <= tf                                     # (m, tile, c)
        return jnp.sum(hit, axis=(1, 2)), jnp.sum(jnp.any(hit, axis=1), axis=1)

    per_ray = []
    n_cov = []
    step = max(1, (1 << 26) // (tile * c))
    step = max(1, min(nt, step))
    for s in range(0, nt, step):
        e = min(nt, s + step)
        pr, ncv = chunk(os_[s:e], ds_[s:e], tmins[s:e], tmaxs[s:e])
        per_ray.append(pr)
        n_cov.append(ncv)
    per_ray = jnp.concatenate(per_ray)
    n_cov = jnp.concatenate(n_cov)
    live_rays = jnp.sum(live)
    work_tile = float(jnp.sum(n_cov) * tile)
    work_ray = float(jnp.sum(per_ray))
    print(f"{label:42s} pairs/tile={float(jnp.mean(n_cov)):7.1f} "
          f"work(tileU)={work_tile/1e6:8.2f}M  work(perRay)={work_ray/1e6:8.2f}M "
          f"per-live-ray={work_ray/max(float(live_rays),1):6.1f}")
    return work_tile, work_ray


def main():
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

    # bounce rays at 50% live
    f_pal = jax.jit(lambda o, d, tmx: clmod.intersect_pallas(cs, o, d, t_min, tmx))
    tri_ = scene.tri
    hitm, t_hit = f_pal(o, d, t_max)[:2]
    t_c = jnp.where(hitm, t_hit, 1.0)
    p_hit = o + d * t_c[:, None] * 0.999
    ub = jnp.stack([rng.uniform_float(pix, jnp.uint32(i)) for i in (13, 14, 15)], -1)
    db = ub * 2.0 - 1.0
    db = db / jnp.linalg.norm(db, axis=-1, keepdims=True)
    live = rng.uniform_float(pix, jnp.uint32(21)) < 0.5
    tmx_b = jnp.where(live, 1e30, -1.0)

    # cluster-level boxes
    bmin128, bmax128 = np.asarray(cs.c_bmin), np.asarray(cs.c_bmax)
    # sub-boxes of 32 tris
    p0 = np.asarray(cs.c_p0).reshape(-1, 4, 32, 3)
    p1 = np.asarray(cs.c_p1).reshape(-1, 4, 32, 3)
    p2 = np.asarray(cs.c_p2).reshape(-1, 4, 32, 3)
    sbmin = np.minimum(np.minimum(p0.min(2), p1.min(2)), p2.min(2)).reshape(-1, 3)
    sbmax = np.maximum(np.maximum(p0.max(2), p1.max(2)), p2.max(2)).reshape(-1, 3)
    print(f"clusters={cs.n_clusters} (K=128), sub-boxes={len(sbmin)} (K=32)")

    for rays, name in ((None, "primary"), (True, "bounce50")):
        if rays is None:
            oo, dd, tm = o, d, t_max
        else:
            oo, dd, tm = p_hit, db, tmx_b
        print(f"--- {name}")
        for tile in (64, 128, 256):
            coverage_stats(cs, oo, dd, t_min, tm, tile, 5,
                           jnp.asarray(bmin128), jnp.asarray(bmax128),
                           f"K=128 TILE={tile} obits=5")
        for obits in (6, 7):
            coverage_stats(cs, oo, dd, t_min, tm, 256, obits,
                           jnp.asarray(bmin128), jnp.asarray(bmax128),
                           f"K=128 TILE=256 obits={obits}")
        coverage_stats(cs, oo, dd, t_min, tm, 256, 5,
                       jnp.asarray(sbmin), jnp.asarray(sbmax),
                       "K=32  TILE=256 obits=5")
        coverage_stats(cs, oo, dd, t_min, tm, 128, 6,
                       jnp.asarray(sbmin), jnp.asarray(sbmax),
                       "K=32  TILE=128 obits=6")
        tmc = clmod._world_exit_cap(cs, oo, dd, t_min, tm)
        fck = first_cluster_key(cs, oo, dd, t_min, tmc,
                                jnp.asarray(bmin128), jnp.asarray(bmax128))
        coverage_stats(cs, oo, dd, t_min, tm, 256, 5,
                       jnp.asarray(bmin128), jnp.asarray(bmax128),
                       "K=128 TILE=256 key=firstcluster", key_override=fck)
        coverage_stats(cs, oo, dd, t_min, tm, 128, 5,
                       jnp.asarray(bmin128), jnp.asarray(bmax128),
                       "K=128 TILE=128 key=firstcluster", key_override=fck)
        sfck = first_cluster_key(cs, oo, dd, t_min, tmc,
                                 jnp.asarray(sbmin), jnp.asarray(sbmax))
        coverage_stats(cs, oo, dd, t_min, tm, 256, 5,
                       jnp.asarray(bmin128), jnp.asarray(bmax128),
                       "K=128 TILE=256 key=firstSUBcluster", key_override=sfck)
        coverage_stats(cs, oo, dd, t_min, tm, 256, 5,
                       jnp.asarray(sbmin), jnp.asarray(sbmax),
                       "K=32  TILE=256 key=firstSUBcluster", key_override=sfck)


if __name__ == "__main__":
    main()
