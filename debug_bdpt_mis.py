#!/usr/bin/env python
"""BDPT MIS audit (depth-restricted): per-strategy weighted vs
UNWEIGHTED contributions on the area-lit Cornell scene, against the
path tracer. Each strategy unweighted must equal the full transport for
its depth; the weighted strategies must sum to it. CPU backend."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from scenes.cornell import cornell_spheres, cornell_camera
from pbrt_tpu.integrate import bdpt, driver, path
from pbrt_tpu.core import samplers as smp

RES = 24
SPP = 256
DEPTH = int(os.environ.get("DBG_DEPTH", 1))


def path_img(scene, cam, depth, spp=SPP):
    cfg = driver.RenderConfig(width=RES, height=RES, spp=spp, max_depth=depth,
                              sampler=smp.SamplerConfig(kind="zerotwo", spp=spp))
    return np.asarray(driver.render(scene, cam, cfg, path.make_li(cfg)))


def main():
    scene = cornell_spheres()
    cam = cornell_camera((RES, RES))
    p1 = path_img(scene, cam, DEPTH)
    p0 = path_img(scene, cam, 0)
    print(f"path mean depth<={DEPTH}: {p1.mean():.6f}   depth0: {p0.mean():.6f}  "
          f"depth-{DEPTH}-only: {p1.mean() - p0.mean():.6f}")

    cfg = bdpt.BDPTConfig(width=RES, height=RES, spp=SPP, max_depth=DEPTH,
                          sampler=smp.SamplerConfig(kind="random", spp=SPP))
    img, strat = bdpt.render(scene, cam, cfg, debug_strategies=True)
    img = np.asarray(img)
    print(f"bdpt mean: {img.mean():.6f}  vs path {p1.mean():.6f} "
          f"({(img.mean()/p1.mean()-1)*100:+.2f}%)")
    print(f"{'strategy':>10s} {'weighted':>12s} {'unweighted':>12s} {'w/u':>8s}")
    tot_w = 0.0
    by_depth = {}
    for k in sorted(strat.keys(), key=str):
        wsum, usum = strat[k]
        tot_w += wsum
        print(f"{str(k):>10s} {wsum:12.6f} {usum:12.6f} "
              f"{wsum/max(usum,1e-12):8.4f}")
        if isinstance(k[0], int):
            s, t = k
            d = s + t - 2
        else:
            d = k[1] - 2
        by_depth.setdefault(d, [0.0, []])
        by_depth[d][0] += wsum
        by_depth[d][1].append((k, usum))
    print(f"sum weighted: {tot_w:.6f}")
    for d in sorted(by_depth):
        wsum, us = by_depth[d]
        ref = p1.mean() - p0.mean() if d == DEPTH else None
        tag = f" (path depth-{d} = {ref:.6f}, ratio {wsum/max(ref,1e-12):.4f})" \
            if ref is not None and d == 1 else ""
        print(f"depth {d}: weighted sum {wsum:.6f}{tag}")
        for k, u in us:
            print(f"    unweighted {str(k):>8s}: {u:.6f}" +
                  (f"  vs depth-total ratio {u/max(ref,1e-12):.4f}"
                   if ref is not None else ""))


if __name__ == "__main__":
    main()
