"""Stochastic progressive photon mapping.

TPU-native counterpart of src/integrators/sppm.rs:145-553. Per iteration:
  * camera pass — the wavefront traces to the first diffuse hit, storing
    a per-pixel VisiblePoint (p, wo, β, material) and accumulating direct
    light via MIS NEE (sppm.rs:172-283),
  * photon pass — lights are sampled ∝ power, `sample_le` emits photon
    rays that random-walk the scene (sppm.rs:356-493),
  * photon–VP gathering: the reference builds an atomic linked-list
    spatial hash (sppm.rs:300-355); here deposition is a dense
    (VP × photon-chunk) distance test — no atomics, fully vectorised.
    (A sort-by-cell + segment-sum grid is the planned optimisation for
    large photon counts; the estimator is identical.)
  * per-pixel radius/flux update with α (sppm.rs:500-527).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Float, Int, PI
from ..core import samplers as smp
from ..core import vecmath as vm
from ..core.spectrum import luminance
from ..core.sampling import Distribution1D
from ..geom import scene as scenemod
from ..lights import lights as lightsmod
from ..lights.distrib import power_distribution
from ..shade import materials as matmod
from . import common
from . import driver as drivermod


class SPPMConfig(NamedTuple):
    width: int = 64
    height: int = 64
    n_iterations: int = 8
    photons_per_iter: int = 8192
    max_depth: int = 5
    initial_radius: float = 0.05
    alpha: float = 0.7
    sampler: smp.SamplerConfig = smp.SamplerConfig(kind="random", spp=1)
    # photon gathering: "dense" (VP × photon distance matrix), "grid"
    # (sort-by-cell hash grid, sppm.rs:300-355 analog), or "auto"
    gather: str = "auto"
    max_photons_per_cell: int = 32
    return_stats: bool = False   # render() → (img, {"photons_dropped"})


def _camera_pass(scene, camera, cfg, it):
    """Trace one camera sample per pixel to the first diffuse vertex.
    Returns (ld, vp) where vp is a dict of per-pixel arrays."""
    h, w = cfg.height, cfg.width
    hw = h * w
    pixel_id = jnp.arange(hw, dtype=jnp.uint32)
    sample_idx = jnp.full((hw,), it, jnp.uint32)
    scfg = cfg.sampler

    u_film = smp.sample_2d(scfg, pixel_id, sample_idx, smp.DIM_FILM)
    px = (pixel_id % jnp.uint32(w)).astype(Float)
    py = (pixel_id // jnp.uint32(w)).astype(Float)
    pfilm = jnp.stack([px + u_film[..., 0], py + u_film[..., 1]], axis=-1)
    from ..cameras import generate_rays
    u_lens = smp.sample_2d(scfg, pixel_id, sample_idx, smp.DIM_LENS)
    u_time = smp.sample_1d(scfg, pixel_id, sample_idx, smp.DIM_TIME)
    o, d, _ = generate_rays(camera, pfilm, u_lens, u_time)

    lights = scene.lights
    kinds = scene.materials.kinds_present
    ld = jnp.zeros((hw, 3), Float)
    beta = jnp.ones((hw, 3), Float)
    active = jnp.ones((hw,), bool)
    stored = jnp.zeros((hw,), bool)
    vp = dict(p=jnp.zeros((hw, 3), Float), wo=jnp.zeros((hw, 3), Float),
              ns=jnp.zeros((hw, 3), Float), ng=jnp.zeros((hw, 3), Float),
              dpdu=jnp.zeros((hw, 3), Float),
              beta=jnp.zeros((hw, 3), Float), mid=jnp.full((hw,), -1, Int),
              uv=jnp.zeros((hw, 2), Float), valid=jnp.zeros((hw,), bool))

    specular_bounce = jnp.zeros((hw,), bool)
    for bounce in range(cfg.max_depth):
        hit = scenemod.intersect(scene, o, d)
        wo = -d
        le = jnp.where(hit.valid[..., None],
                       lightsmod.area_light_radiance(lights, hit.light_id, hit.ng, wo),
                       lightsmod.env_radiance(lights, d))
        count_emit = active & ((bounce == 0) | specular_bounce)
        ld = ld + jnp.where(count_emit[..., None], beta * le, 0.0)
        active = active & hit.valid & (hit.material_id >= 0)

        frame = common.shading_frame(hit, scene)
        lp = matmod.resolve(scene.materials, hit.material_id, hit.uv, hit.p, scene.textures)
        # NEE at every camera vertex (sppm.rs:236-243)
        u_sel = smp.sample_1d(scfg, pixel_id, sample_idx, smp.bounce_dim(bounce, 5))
        lt, pmf = common.select_light_uniform(lights, u_sel)
        u_light = smp.sample_2d(scfg, pixel_id, sample_idx, smp.bounce_dim(bounce, 3))
        u_nb = smp.sample_2d(scfg, pixel_id, sample_idx, smp.bounce_dim(bounce, 6))
        u_nl = smp.sample_1d(scfg, pixel_id, sample_idx, smp.bounce_dim(bounce, 2))
        ld_b = common.estimate_direct(scene, lights, lp, kinds, frame,
                                      hit.p, hit.ns, hit.ng, wo, lt, pmf,
                                      u_light, u_nb, u_nl, active)
        ld = ld + jnp.where(active[..., None], beta * ld_b, 0.0)

        # store VP at the first diffuse-ish vertex (sppm.rs:244-249)
        is_diffuse = (lp.kind == matmod.MAT_MATTE) | (lp.kind == matmod.MAT_PLASTIC) | \
                     (lp.kind == matmod.MAT_SUBSTRATE) | (lp.kind == matmod.MAT_TRANSLUCENT) | \
                     (lp.kind == matmod.MAT_UBER)
        store_now = active & is_diffuse & ~stored
        for k in ("p", "wo", "ns", "ng", "dpdu"):
            src = dict(p=hit.p, wo=wo, ns=hit.ns, ng=hit.ng, dpdu=hit.dpdu)[k]
            vp[k] = jnp.where(store_now[..., None], src, vp[k])
        vp["beta"] = jnp.where(store_now[..., None], beta, vp["beta"])
        vp["mid"] = jnp.where(store_now, hit.material_id, vp["mid"])
        vp["uv"] = jnp.where(store_now[..., None], hit.uv, vp["uv"])
        vp["valid"] = vp["valid"] | store_now
        stored = stored | store_now
        active = active & ~store_now   # stop at stored vertex (non-specular)

        # continue through specular surfaces only
        u_bsdf = smp.sample_2d(scfg, pixel_id, sample_idx, smp.bounce_dim(bounce, 0))
        u_lobe = smp.sample_1d(scfg, pixel_id, sample_idx, smp.bounce_dim(bounce, 2))
        wo_l = frame.to_local(wo)
        wi_l, f, pdf, spec, _ = matmod.sample(lp, kinds, wo_l, u_lobe, u_bsdf)
        wi = frame.to_world(wi_l)
        good = active & (pdf > 0) & (luminance(f) > 0)
        beta = jnp.where(good[..., None],
                         beta * f * (vm.absdot(wi, hit.ns) / jnp.maximum(pdf, 1e-12))[..., None],
                         beta)
        active = good
        specular_bounce = spec
        o = vm.offset_ray_origin(hit.p, hit.ng, wi)
        d = wi
    return ld, vp


def _photon_pass(scene, cfg, it, power_dist):
    """Emit and walk photons. Returns per-deposit arrays (padded over
    (photons, depth)): position, incoming dir wi (photon travel dir),
    power β, valid."""
    p_count = cfg.photons_per_iter
    lights = scene.lights
    kinds = scene.materials.kinds_present
    scfg = cfg.sampler
    pid = jnp.arange(p_count, dtype=jnp.uint32) + jnp.uint32(0x8000_0000)
    sid = jnp.full((p_count,), it, jnp.uint32)

    u_sel = smp.sample_1d(scfg, pid, sid, 0)
    lt, pmf, _ = power_dist.sample_discrete(u_sel)
    lt = lt.astype(Int)
    u_pos = smp.sample_2d(scfg, pid, sid, 1)
    u_dir = smp.sample_2d(scfg, pid, sid, 3)
    le = lightsmod.sample_le(lights, scene, lt, u_pos, u_dir, scene.world_radius)

    cos0 = vm.absdot(le["ng_l"], le["d"])
    beta = le["le"] * cos0[..., None] / jnp.maximum(
        (pmf * le["pdf_pos"] * le["pdf_dir"])[..., None], 1e-12)
    active = luminance(beta) > 0
    o = vm.offset_ray_origin(le["o"], le["ng_l"], le["d"])
    d = le["d"]

    deposits = []
    for bounce in range(cfg.max_depth):
        hit = scenemod.intersect(scene, o, d)
        active = active & hit.valid & (hit.material_id >= 0)
        # deposit only after the first bounce (direct light handled by NEE,
        # sppm.rs:407-427)
        deposit_ok = active & (bounce > 0)
        deposits.append((hit.p, -d, beta, deposit_ok))

        frame = common.shading_frame(hit, scene)
        lp = matmod.resolve(scene.materials, hit.material_id, hit.uv, hit.p, scene.textures)
        u_bsdf = smp.sample_2d(scfg, pid, sid, smp.bounce_dim(bounce, 0) + 50)
        u_lobe = smp.sample_1d(scfg, pid, sid, smp.bounce_dim(bounce, 2) + 50)
        wo_l = frame.to_local(-d)
        wi_l, f, pdf, _, _ = matmod.sample(lp, kinds, wo_l, u_lobe, u_bsdf)
        wi = frame.to_world(wi_l)
        bnew = beta * f * (vm.absdot(wi, hit.ns) / jnp.maximum(pdf, 1e-12))[..., None]
        good = active & (pdf > 0) & (luminance(f) > 0)
        # photon RR (sppm.rs:470-480)
        q = jnp.maximum(0.0, 1.0 - luminance(bnew) / jnp.maximum(luminance(beta), 1e-12))
        u_rr = smp.sample_1d(scfg, pid, sid, smp.bounce_dim(bounce, 4) + 50)
        survive = u_rr >= q
        beta = jnp.where((good & survive)[..., None],
                         bnew / jnp.maximum(1.0 - q, 1e-6)[..., None], bnew)
        active = good & survive
        o = vm.offset_ray_origin(hit.p, hit.ng, wi)
        d = wi

    ph_p = jnp.concatenate([dp[0] for dp in deposits], axis=0)
    ph_wi = jnp.concatenate([dp[1] for dp in deposits], axis=0)
    ph_beta = jnp.concatenate([dp[2] for dp in deposits], axis=0)
    ph_ok = jnp.concatenate([dp[3] for dp in deposits], axis=0)
    return ph_p, ph_wi, ph_beta, ph_ok


def _gather(scene, vp, radius2, ph_p, ph_wi, ph_beta, ph_ok):
    """Dense photon gathering: Σ over photons within each VP's radius of
    β_ph · f(wo, wi). Chunked over photons. Returns (phi (hw,3), m (hw,))."""
    hw = vp["p"].shape[0]
    kinds = scene.materials.kinds_present
    lp = matmod.resolve(scene.materials, vp["mid"], vp["uv"], vp["p"], scene.textures)
    b = vm.normalize(vm.cross(vp["ns"], vp["dpdu"]))
    t = vm.cross(b, vp["ns"])
    frame = common.Frame(t=t, b=b, n=vp["ns"])
    wo_l = frame.to_local(vp["wo"])

    p_total = ph_p.shape[0]
    chunk = max(1, min(p_total, 64 * 1024 * 1024 // max(hw, 1)))
    n_chunks = (p_total + chunk - 1) // chunk
    pad = n_chunks * chunk - p_total
    ph_p = jnp.pad(ph_p, ((0, pad), (0, 0)))
    ph_wi = jnp.pad(ph_wi, ((0, pad), (0, 0)))
    ph_beta = jnp.pad(ph_beta, ((0, pad), (0, 0)))
    ph_ok = jnp.pad(ph_ok, ((0, pad),))
    ph_p = ph_p.reshape(n_chunks, chunk, 3)
    ph_wi = ph_wi.reshape(n_chunks, chunk, 3)
    ph_beta = ph_beta.reshape(n_chunks, chunk, 3)
    ph_ok = ph_ok.reshape(n_chunks, chunk)

    def body(ci, acc):
        phi, m = acc
        dist2 = jnp.sum((vp["p"][:, None, :] - ph_p[ci][None]) ** 2, -1)   # (hw, chunk)
        near = vp["valid"][:, None] & ph_ok[ci][None] & (dist2 <= radius2[:, None])
        wi_l = vm.to_local(ph_wi[ci][None], t[:, None], b[:, None], vp["ns"][:, None])
        f = matmod.evaluate_f(
            jax.tree_util.tree_map(lambda a: a[:, None] if a.ndim else a, lp),
            kinds, jnp.broadcast_to(wo_l[:, None], wi_l.shape), wi_l)      # (hw, chunk, 3)
        contrib = jnp.where(near[..., None], f * ph_beta[ci][None], 0.0)
        return phi + jnp.sum(contrib, axis=1), m + jnp.sum(near, axis=1).astype(Float)

    init = (jnp.zeros((hw, 3), Float), jnp.zeros((hw,), Float))
    if n_chunks == 1:
        phi, m = body(0, init)
    else:
        phi, m = jax.lax.fori_loop(0, n_chunks, body, init)
    return phi, m


def _hash3(ix, iy, iz, hsize):
    """Spatial hash of integer cell coords (sppm.rs hash function
    analog); hsize is a power of two."""
    h = (ix.astype(jnp.uint32) * jnp.uint32(73856093)) \
        ^ (iy.astype(jnp.uint32) * jnp.uint32(19349663)) \
        ^ (iz.astype(jnp.uint32) * jnp.uint32(83492791))
    return (h & jnp.uint32(hsize - 1)).astype(Int)


def _gather_grid(scene, vp, radius2, ph_p, ph_wi, ph_beta, ph_ok,
                 max_per_cell=32):
    """Photon gathering via a sort-by-cell spatial hash — the atomics-
    free TPU analog of the reference's lock-free linked-list grid
    (sppm.rs:300-355): photons are keyed by the hash of their grid cell
    (cell edge = the max search radius) and SORTED; each visible point
    probes the 8 cells its radius ball can overlap and scans each
    cell's contiguous photon segment (searchsorted bounds, bounded at
    `max_per_cell` — overflow is counted and returned, never silent).

    Returns (phi (hw,3), m (hw,), dropped ())."""
    hw = vp["p"].shape[0]
    kinds = scene.materials.kinds_present
    lp = matmod.resolve(scene.materials, vp["mid"], vp["uv"], vp["p"], scene.textures)
    b = vm.normalize(vm.cross(vp["ns"], vp["dpdu"]))
    t = vm.cross(b, vp["ns"])
    wo_l = vm.to_local(vp["wo"], t, b, vp["ns"])

    p_total = ph_p.shape[0]
    hsize = 1 << max(int(np.ceil(np.log2(max(hw, 1)))) + 1, 10)
    r_max = jnp.sqrt(jnp.max(jnp.where(vp["valid"], radius2, 0.0)))
    # cell edge = ball DIAMETER: an interval of length 2r ≤ cell spans at
    # most two cells per axis, so the 8 lo/hi probes cover the ball
    cell = jnp.maximum(2.0 * r_max, 1e-6)
    inv_cell = 1.0 / cell

    # photons: hash-sort by containing cell
    pc = jnp.floor(ph_p * inv_cell).astype(Int)
    ph_h = jnp.where(ph_ok, _hash3(pc[:, 0], pc[:, 1], pc[:, 2], hsize),
                     jnp.asarray(hsize, Int))      # dead photons → sentinel
    order = jnp.argsort(ph_h)
    ph_h_s = ph_h[order]
    rec = jnp.concatenate([ph_p, ph_wi, ph_beta], axis=1)[order]   # (P, 9)

    # per-cell overflow census (for the 'no silent caps' contract)
    seg_len = jnp.searchsorted(ph_h_s, jnp.arange(hsize, dtype=Int), side="right") \
        - jnp.searchsorted(ph_h_s, jnp.arange(hsize, dtype=Int), side="left")
    dropped = jnp.sum(jnp.maximum(seg_len - max_per_cell, 0))

    # VP ball (radius ≤ cell) overlaps ≤ 2 cells per axis: the cells of
    # floor((p−r)/cell) and floor((p+r)/cell)
    r_vp = jnp.sqrt(jnp.maximum(radius2, 0.0))[..., None]
    lo = jnp.floor((vp["p"] - r_vp) * inv_cell).astype(Int)
    hi = jnp.floor((vp["p"] + r_vp) * inv_cell).astype(Int)

    phi = jnp.zeros((hw, 3), Float)
    m = jnp.zeros((hw,), Float)
    probed = []      # bucket ids already scanned (dedupes both the
    #                  lo==hi axis case AND hash collisions between
    #                  distinct probe cells, which would double-count)
    for cx in range(2):
        for cy in range(2):
            for cz in range(2):
                ix = jnp.where(cx == 0, lo[:, 0], hi[:, 0])
                iy = jnp.where(cy == 0, lo[:, 1], hi[:, 1])
                iz = jnp.where(cz == 0, lo[:, 2], hi[:, 2])
                hv = _hash3(ix, iy, iz, hsize)
                dup = jnp.zeros((hw,), bool)
                for prev in probed:
                    dup = dup | (hv == prev)
                probed.append(hv)
                start = jnp.searchsorted(ph_h_s, hv, side="left")
                end = jnp.searchsorted(ph_h_s, hv, side="right")
                end = jnp.minimum(end, start + max_per_cell)
                idx = start[:, None] + jnp.arange(max_per_cell)    # (hw, M)
                ok = (idx < end[:, None]) & ~dup[:, None] & vp["valid"][:, None]
                r = rec[jnp.minimum(idx, p_total - 1)]             # (hw, M, 9)
                d2 = jnp.sum((vp["p"][:, None] - r[..., 0:3]) ** 2, -1)
                near = ok & (d2 <= radius2[:, None])
                wi_l = vm.to_local(r[..., 3:6], t[:, None], b[:, None],
                                   vp["ns"][:, None])
                f = matmod.evaluate_f(
                    jax.tree_util.tree_map(lambda a: a[:, None] if a.ndim else a, lp),
                    kinds, jnp.broadcast_to(wo_l[:, None], wi_l.shape), wi_l)
                contrib = jnp.where(near[..., None], f * r[..., 6:9], 0.0)
                phi = phi + jnp.sum(contrib, axis=1)
                m = m + jnp.sum(near, axis=1).astype(Float)
    return phi, m, dropped


def render(scene, camera, cfg: SPPMConfig):
    """Full SPPM render → (H, W, 3)."""
    h, w = cfg.height, cfg.width
    hw = h * w
    power_dist = power_distribution(scene.lights, scene.world_radius)

    radius2 = jnp.full((hw,), cfg.initial_radius ** 2, Float)
    n_acc = jnp.zeros((hw,), Float)      # accumulated photon count N
    tau = jnp.zeros((hw, 3), Float)      # accumulated flux
    ld_acc = jnp.zeros((hw, 3), Float)

    method = cfg.gather
    if method == "auto":
        # dense is exact+cheap at small scale; the grid is the only
        # feasible option at config scale (512², ≥256k photons/iter)
        p_total = cfg.photons_per_iter * cfg.max_depth
        method = "grid" if hw * p_total > (1 << 28) else "dense"

    @jax.jit
    def one_iter(scene, camera, it, radius2, n_acc, tau):
        ld, vp = _camera_pass(scene, camera, cfg, it)
        ph_p, ph_wi, ph_beta, ph_ok = _photon_pass(scene, cfg, it, power_dist)
        if method == "grid":
            phi, m, dropped = _gather_grid(scene, vp, radius2, ph_p, ph_wi,
                                           ph_beta, ph_ok,
                                           cfg.max_photons_per_cell)
        else:
            phi, m = _gather(scene, vp, radius2, ph_p, ph_wi, ph_beta, ph_ok)
            dropped = jnp.zeros((), Int)   # dense gather is exact
        # radius/flux update (sppm.rs:500-527)
        has = m > 0
        n_new = n_acc + cfg.alpha * m
        ratio = jnp.where(has, n_new / jnp.maximum(n_acc + m, 1e-6), 1.0)
        r2_new = jnp.where(has, radius2 * ratio, radius2)
        tau_new = jnp.where(has[..., None],
                            (tau + vp["beta"] * phi) * ratio[..., None], tau)
        return ld, r2_new, n_new, tau_new, dropped

    dropped_total = 0
    for it in range(cfg.n_iterations):
        ld, radius2, n_acc, tau, dropped = one_iter(scene, camera,
                                                    jnp.uint32(it),
                                                    radius2, n_acc, tau)
        ld_acc = ld_acc + ld
        dropped_total += int(dropped)

    if dropped_total:
        # the 'no silent caps' contract (sppm.rs linked lists are
        # unbounded; our sorted-segment scan is not): surface overflow
        import logging
        logging.getLogger(__name__).warning(
            "SPPM grid gather dropped %d photon-cell entries "
            "(max_photons_per_cell=%d too small for the photon density); "
            "radiance is underestimated near bright caustics",
            dropped_total, cfg.max_photons_per_cell)

    n_photons_total = cfg.n_iterations * cfg.photons_per_iter
    l_indirect = tau / (n_photons_total * PI * jnp.maximum(radius2[..., None], 1e-12))
    img = ld_acc / cfg.n_iterations + l_indirect
    img = img.reshape(h, w, 3)
    if cfg.return_stats:
        return img, {"photons_dropped": dropped_total}
    return img
