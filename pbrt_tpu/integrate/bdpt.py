"""Bidirectional path tracing.

TPU-native counterpart of src/integrators/bdpt.rs. The reference builds
per-sample `Vertex` vectors with trait-object path algebra
(bdpt.rs:61-151, 440-821); here subpaths are fixed-size SoA tensors
(N, V, …) filled by masked wavefront walks, and every (s,t) connection
strategy is statically unrolled — vertex accesses are static slices, so
the whole integrator is one fused XLA program with no gathers.

Strategies (connect_bdpt, bdpt.rs:1026-1162):
  s=0              camera path hits a light directly
  s=1              sample a light point, connect to camera vertex t-1
  t=1              connect light vertex s-1 to a sampled camera point
                   (film splat via camera_sample_wi)
  s≥1, t≥2         vertex-to-vertex connection with G·V term

MIS weights use the standard forward/reverse area-pdf ratio recurrence
(mis_weight, bdpt.rs:1164-1238) — the reference's ScopedAssignment
remapping becomes functional endpoint overrides. Infinite-light paths
are first-class: escaped camera subpaths terminate in VTX_ENV vertices
(far-sphere area-density convention), env NEE and env light subpaths
carry the infinite-light density corrections (bdpt.rs:223), and the
env-lit cross-validation runs pixel-wise against the path tracer.

The round-4 ~4% area-lit energy deficit was a single bug: sample_li
returned no light-point normal, so every s=1 MIS density conversion at
the light endpoint assumed cos=1 (overstating the (2,1)-strategy
density by 1/cos). With ng_l returned and one light-selection
distribution (power) used by ALL strategies, the per-strategy audit
(debug_bdpt_mis.py) shows the weighted strategies partition unity at
every depth (weighted sum / path ratio 1.003 at depth 1, 1.005 at
depth 4, 256 spp).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Float, Int, INF, PI
from ..core import samplers as smp
from ..core import vecmath as vm
from ..core.spectrum import luminance
from ..core.sampling import Distribution1D
from ..geom import scene as scenemod
from ..lights import lights as lightsmod
from ..lights.lights import LIGHT_INFINITE
from ..lights.distrib import power_distribution
from ..shade import materials as matmod
from ..cameras import camera_pdf_we, camera_sample_wi, generate_rays
from ..film import film as filmmod
from . import common
from . import driver as drivermod

VTX_CAMERA = 0
VTX_LIGHT = 1
VTX_SURFACE = 2
VTX_ENV = 3      # camera-path escape to the infinite light (bdpt.rs:223
#                  infinite-light vertex; stored on a far sphere at
#                  2*world_radius so area-density conversions stay uniform)


class Path(NamedTuple):
    """SoA subpath tensors; axis 1 is the vertex index."""
    vtype: jnp.ndarray     # (N, V) int32
    p: jnp.ndarray         # (N, V, 3)
    ng: jnp.ndarray        # (N, V, 3)
    ns: jnp.ndarray        # (N, V, 3)
    uv: jnp.ndarray        # (N, V, 2)
    dpdu: jnp.ndarray      # (N, V, 3)
    beta: jnp.ndarray      # (N, V, 3)
    pdf_fwd: jnp.ndarray   # (N, V) area density
    pdf_rev: jnp.ndarray   # (N, V)
    delta: jnp.ndarray     # (N, V) bool
    mid: jnp.ndarray       # (N, V) material id
    light_id: jnp.ndarray  # (N, V) light id at vertex (emissive hit / origin)
    valid: jnp.ndarray     # (N, V) vertex exists
    n_vertices: jnp.ndarray  # (N,)


def _empty_path(n, v):
    return Path(
        vtype=jnp.zeros((n, v), Int), p=jnp.zeros((n, v, 3), Float),
        ng=jnp.zeros((n, v, 3), Float), ns=jnp.zeros((n, v, 3), Float),
        uv=jnp.zeros((n, v, 2), Float), dpdu=jnp.zeros((n, v, 3), Float),
        beta=jnp.zeros((n, v, 3), Float),
        pdf_fwd=jnp.zeros((n, v), Float), pdf_rev=jnp.zeros((n, v), Float),
        delta=jnp.zeros((n, v), bool), mid=jnp.full((n, v), -1, Int),
        light_id=jnp.full((n, v), -1, Int), valid=jnp.zeros((n, v), bool),
        n_vertices=jnp.zeros((n,), Int))


def _set_vertex(path, i, **kw):
    upd = {}
    for k, v in kw.items():
        arr = getattr(path, k)
        upd[k] = arr.at[:, i].set(v) if arr.ndim == 2 else arr.at[:, i, :].set(v)
    return path._replace(**upd)


def convert_density(pdf_solid, p_from, p_to, ng_to):
    """Solid-angle → area density (bdpt.rs Vertex::convert_density)."""
    w = p_to - p_from
    d2 = vm.length_squared(w)
    inv_d2 = 1.0 / jnp.maximum(d2, 1e-12)
    cos = vm.absdot(vm.normalize(w), ng_to)
    return pdf_solid * cos * inv_d2


def _vertex_f(scene, path, i, wo_dir, wi_dir):
    """BSDF value at vertex i for directions wo (towards previous) and
    wi (towards the other subpath)."""
    lp = matmod.resolve(scene.materials, path.mid[:, i], path.uv[:, i], path.p[:, i],
                        scene.textures)
    b = vm.normalize(vm.cross(path.ns[:, i], path.dpdu[:, i]))
    t = vm.cross(b, path.ns[:, i])
    frame = common.Frame(t=t, b=b, n=path.ns[:, i])
    return matmod.evaluate_f(lp, scene.materials.kinds_present,
                             frame.to_local(wo_dir), frame.to_local(wi_dir))


def _vertex_pdf(scene, path, i, p_prev, p_next):
    """Area pdf of sampling next from vertex i having arrived from prev
    (Vertex::pdf, bdpt.rs:720-760)."""
    wo = vm.normalize(p_prev - path.p[:, i])
    wi = vm.normalize(p_next - path.p[:, i])
    lp = matmod.resolve(scene.materials, path.mid[:, i], path.uv[:, i], path.p[:, i],
                        scene.textures)
    b = vm.normalize(vm.cross(path.ns[:, i], path.dpdu[:, i]))
    t = vm.cross(b, path.ns[:, i])
    frame = common.Frame(t=t, b=b, n=path.ns[:, i])
    pdf_sa = matmod.pdf(lp, scene.materials.kinds_present,
                        frame.to_local(wo), frame.to_local(wi))
    return pdf_sa  # converted by caller (needs target normal)


def _walk(scene, cfg, pid, sid, o, d, beta0, pdf_dir0, mode, dim_base, max_v,
          first_vertex_path):
    """Random walk filling vertices 1..max_v-1 of `first_vertex_path`
    (random_walk, bdpt.rs:860-958). mode: 'camera' | 'light' (radiance vs
    importance transport)."""
    lights = scene.lights
    kinds = scene.materials.kinds_present
    n = pid.shape[0]
    path = first_vertex_path
    scfg = cfg.sampler

    beta = beta0
    pdf_fwd_sa = pdf_dir0    # solid-angle pdf of current direction
    active = luminance(beta0) > 0
    nv = jnp.where(active, 1, 1).astype(Int)

    for i in range(1, max_v):
        hit = scenemod.intersect(scene, o, d)
        live = active & hit.valid & (hit.material_id >= 0)
        pdf_area = convert_density(pdf_fwd_sa, o, hit.p, hit.ng)
        if mode == "camera" and lights.env_index >= 0:
            # escaped rays become infinite-light vertices (env handling
            # of connect_bdpt, bdpt.rs:1026-1162): position on the far
            # sphere, normal facing back along the ray
            miss = active & ~hit.valid
            t_far = 2.0 * scene.world_radius
            p_env = o + d * t_far
            ng_env = -d
            # env-vertex densities use the same far-sphere area
            # conversion as every other vertex: the MIS weight only
            # consumes RATIOS of densities of the same path, so any
            # consistent convention partitions to 1 (pbrt instead keeps
            # infinite-vertex densities directional; mixing the two
            # conventions measurably biases — tested both ways)
            pdf_env = convert_density(pdf_fwd_sa, o, p_env, ng_env)
            path = _set_vertex(
                path, i,
                vtype=jnp.where(miss, VTX_ENV, path.vtype[:, i]),
                p=jnp.where(miss[:, None], p_env, path.p[:, i]),
                ng=jnp.where(miss[:, None], ng_env, path.ng[:, i]),
                ns=jnp.where(miss[:, None], ng_env, path.ns[:, i]),
                beta=jnp.where(miss[:, None], beta, path.beta[:, i]),
                pdf_fwd=jnp.where(miss, pdf_env, path.pdf_fwd[:, i]),
                light_id=jnp.where(miss, lights.env_index, path.light_id[:, i]),
                valid=path.valid[:, i] | miss)
            nv = jnp.where(miss, i + 1, nv)
        path = _set_vertex(
            path, i,
            vtype=jnp.where(live, VTX_SURFACE, path.vtype[:, i]),
            p=jnp.where(live[:, None], hit.p, path.p[:, i]),
            ng=jnp.where(live[:, None], hit.ng, path.ng[:, i]),
            ns=jnp.where(live[:, None], hit.ns, path.ns[:, i]),
            uv=jnp.where(live[:, None], hit.uv, path.uv[:, i]),
            dpdu=jnp.where(live[:, None], hit.dpdu, path.dpdu[:, i]),
            beta=jnp.where(live[:, None], beta, path.beta[:, i]),
            pdf_fwd=jnp.where(live, pdf_area, path.pdf_fwd[:, i]),
            mid=jnp.where(live, hit.material_id, path.mid[:, i]),
            light_id=jnp.where(live, hit.light_id, path.light_id[:, i]),
            valid=path.valid[:, i] | live)
        nv = jnp.where(live, i + 1, nv)

        # sample continuation
        frame = common.shading_frame(hit, scene)
        lp = matmod.resolve(scene.materials, hit.material_id, hit.uv, hit.p, scene.textures)
        u_bsdf = smp.sample_2d(scfg, pid, sid, dim_base + 8 * i)
        u_lobe = smp.sample_1d(scfg, pid, sid, dim_base + 8 * i + 2)
        wo = -d
        wo_l = frame.to_local(wo)
        wi_l, f, pdf, spec, _ = matmod.sample(lp, kinds, wo_l, u_lobe, u_bsdf)
        wi = frame.to_world(wi_l)
        good = live & (pdf > 0.0) & (luminance(f) > 0.0)
        # mark delta vertices
        path = path._replace(delta=path.delta.at[:, i].set(
            jnp.where(live, spec, path.delta[:, i])))

        # reverse pdf recorded at vertex i-1 (density of sampling wo from wi)
        pdf_rev_sa = matmod.pdf(lp, kinds, wi_l, wo_l)
        pdf_rev_sa = jnp.where(spec, 0.0, pdf_rev_sa)
        pdf_rev_area = convert_density(pdf_rev_sa, hit.p, path.p[:, i - 1], path.ng[:, i - 1])
        path = path._replace(pdf_rev=path.pdf_rev.at[:, i - 1].set(
            jnp.where(live, pdf_rev_area, path.pdf_rev[:, i - 1])))

        # shading-normal correction for light (importance) transport
        if mode == "light":
            correct = vm.absdot(wo, hit.ns) * vm.absdot(wi, hit.ng) / \
                jnp.maximum(vm.absdot(wo, hit.ng) * vm.absdot(wi, hit.ns), 1e-8)
        else:
            correct = jnp.ones(n, Float)
        beta = jnp.where(good[:, None],
                         beta * f * (vm.absdot(wi, hit.ns) * correct
                                     / jnp.maximum(pdf, 1e-12))[:, None],
                         beta)
        pdf_fwd_sa = jnp.where(spec, 0.0, pdf)
        active = good
        o = vm.offset_ray_origin(hit.p, hit.ng, wi)
        d = wi
    return path._replace(n_vertices=nv)


def generate_camera_subpath(scene, camera, cfg, pid, sid, pfilm, max_v):
    n = pid.shape[0]
    scfg = cfg.sampler
    u_lens = smp.sample_2d(scfg, pid, sid, smp.DIM_LENS)
    u_time = smp.sample_1d(scfg, pid, sid, smp.DIM_TIME)
    o, d, _ = generate_rays(camera, pfilm, u_lens, u_time)
    path = _empty_path(n, max_v)
    path = _set_vertex(path, 0, vtype=jnp.full((n,), VTX_CAMERA, Int),
                       p=o, ng=d, ns=d, beta=jnp.ones((n, 3), Float),
                       pdf_fwd=jnp.ones((n,), Float), valid=jnp.ones((n,), bool))
    _, pdf_dir = camera_pdf_we(camera, o, d)
    return _walk(scene, cfg, pid, sid, o, d, jnp.ones((n, 3), Float),
                 jnp.maximum(pdf_dir, 1e-9), "camera", 100, max_v, path), o, d


def generate_light_subpath(scene, cfg, pid, sid, power_dist, max_v):
    n = pid.shape[0]
    scfg = cfg.sampler
    lights = scene.lights
    u_sel = smp.sample_1d(scfg, pid, sid, 50)
    lt, pmf, _ = power_dist.sample_discrete(u_sel)
    lt = lt.astype(Int)
    u_pos = smp.sample_2d(scfg, pid, sid, 51)
    u_dir = smp.sample_2d(scfg, pid, sid, 53)
    le = lightsmod.sample_le(lights, scene, lt, u_pos, u_dir, scene.world_radius)
    is_delta_l = jnp.isin(lights.kind[lt], jnp.asarray(lightsmod.DELTA_KINDS))

    path = _empty_path(n, max_v)
    beta0_v = le["le"] / jnp.maximum((pmf * le["pdf_pos"])[:, None], 1e-12)
    path = _set_vertex(path, 0, vtype=jnp.full((n,), VTX_LIGHT, Int),
                       p=le["o"], ng=le["ng_l"], ns=le["ng_l"],
                       beta=beta0_v,
                       pdf_fwd=pmf * le["pdf_pos"],
                       delta=is_delta_l,
                       light_id=lt, valid=le["pdf_pos"] > 0)
    cos0 = vm.absdot(le["ng_l"], le["d"])
    beta_walk = le["le"] * cos0[:, None] / jnp.maximum(
        (pmf * le["pdf_pos"] * le["pdf_dir"])[:, None], 1e-12)
    o = vm.offset_ray_origin(le["o"], le["ng_l"], le["d"])
    lpath = _walk(scene, cfg, pid, sid, o, le["d"], beta_walk,
                  jnp.maximum(le["pdf_dir"], 0.0), "light", 300, max_v, path)
    if lights.env_index >= 0:
        # infinite-light subpath density correction (the bdpt.rs analog
        # of pbrt's 'correct sampling densities for infinite lights'):
        # the origin's density is the DIRECTIONAL infinite-light density
        # and the first surface vertex's is the disk position density
        is_env = lights.kind[lt] == LIGHT_INFINITE
        sel = pmf
        dens0 = sel * lightsmod.env_pdf_li(lights, le["d"])
        lpath = lpath._replace(pdf_fwd=lpath.pdf_fwd.at[:, 0].set(
            jnp.where(is_env, dens0, lpath.pdf_fwd[:, 0])))
        if max_v > 1:
            pdf_pos_env = 1.0 / (PI * scene.world_radius ** 2)
            corr1 = pdf_pos_env * vm.absdot(lpath.ng[:, 1], le["d"])
            lpath = lpath._replace(pdf_fwd=lpath.pdf_fwd.at[:, 1].set(
                jnp.where(is_env & lpath.valid[:, 1], corr1,
                          lpath.pdf_fwd[:, 1])))
    return lpath, lt, pmf


def _remap0(x):
    return jnp.where(x != 0.0, x, 1.0)


def _g_term(scene, pa, nga, pb, ngb):
    """Geometry term with visibility (bdpt.rs g(), :1003-1024)."""
    w = pb - pa
    d2 = jnp.maximum(vm.length_squared(w), 1e-12)
    wn = w / jnp.sqrt(d2)[:, None]
    g = vm.absdot(wn, nga) * vm.absdot(wn, ngb) / d2
    o_sh = vm.offset_ray_origin(pa, nga, wn)
    dist = jnp.sqrt(d2)
    occ = scenemod.occluded(scene, o_sh, wn, t_max=jnp.maximum(dist * (1 - 1e-3), 1e-4))
    return jnp.where(occ, 0.0, g), wn


def _mis_weight(scene, cpath, lpath, s, t, overrides):
    """1/(1+Σ rᵢ) over alternative strategies for the same path
    (mis_weight, bdpt.rs:1164-1238). `overrides` supplies connection-
    endpoint pdf_rev/delta replacements (the ScopedAssignment analog):
    dict with keys 'pt_rev', 'ptm_rev', 'qs_rev', 'qsm_rev' as needed."""
    if s + t == 2:
        return jnp.ones(cpath.p.shape[0], Float)
    n = cpath.p.shape[0]
    sum_ri = jnp.zeros(n, Float)

    def cam_rev(i):
        if i == t - 1 and "pt_rev" in overrides:
            return overrides["pt_rev"]
        if i == t - 2 and "ptm_rev" in overrides:
            return overrides["ptm_rev"]
        return cpath.pdf_rev[:, i]

    def cam_delta(i):
        if i == t - 1:
            return jnp.zeros(n, bool)
        return cpath.delta[:, i]

    def light_rev(i):
        if i == s - 1 and "qs_rev" in overrides:
            return overrides["qs_rev"]
        if i == s - 2 and "qsm_rev" in overrides:
            return overrides["qsm_rev"]
        return lpath.pdf_rev[:, i]

    def light_delta(i):
        if i == s - 1:
            return jnp.zeros(n, bool)
        return lpath.delta[:, i]

    ri = jnp.ones(n, Float)
    for i in range(t - 1, 0, -1):
        ri = ri * _remap0(cam_rev(i)) / _remap0(cpath.pdf_fwd[:, i])
        use = ~cam_delta(i) & ~cam_delta(i - 1)
        sum_ri = sum_ri + jnp.where(use, ri, 0.0)
    ri = jnp.ones(n, Float)
    for i in range(s - 1, -1, -1):
        ri = ri * _remap0(light_rev(i)) / _remap0(lpath.pdf_fwd[:, i])
        if i > 0:
            delta_prev = light_delta(i - 1)
        else:
            delta_prev = lpath.delta[:, 0]  # delta light origin
        use = ~light_delta(i) & ~delta_prev
        sum_ri = sum_ri + jnp.where(use, ri, 0.0)
    return 1.0 / (1.0 + sum_ri)


class BDPTConfig(NamedTuple):
    width: int = 64
    height: int = 64
    spp: int = 8
    max_depth: int = 4
    sampler: smp.SamplerConfig = smp.SamplerConfig(kind="random", spp=8)


def render(scene, camera, cfg: BDPTConfig, debug_strategies=False):
    """debug_strategies=True additionally returns per-(s,t) scalar sums
    of weighted and UNWEIGHTED contributions (the per-strategy debug
    films of the reference, bdpt.rs:289-314, reduced to totals) — the
    instrument behind the MIS audit."""
    h, w = cfg.height, cfg.width
    hw = h * w
    lights = scene.lights
    power_dist = power_distribution(lights, scene.world_radius)
    t_max_v = cfg.max_depth + 2
    s_max_v = cfg.max_depth + 1

    film = filmmod.new_film(h, w)
    img_acc = jnp.zeros((hw, 3), Float)
    splat_acc = jnp.zeros((h, w, 3), Float)
    strat_acc = {}

    @jax.jit
    def one_sample(scene, camera, sidx):
        pid = jnp.arange(hw, dtype=jnp.uint32)
        sid = jnp.full((hw,), sidx, jnp.uint32)
        scfg = cfg.sampler
        u_film = smp.sample_2d(scfg, pid, sid, smp.DIM_FILM)
        px = (pid % jnp.uint32(w)).astype(Float)
        py = (pid // jnp.uint32(w)).astype(Float)
        pfilm = jnp.stack([px + u_film[..., 0], py + u_film[..., 1]], axis=-1)

        cpath_full = generate_camera_subpath(scene, camera, cfg, pid, sid, pfilm, t_max_v)
        cpath, cam_o, cam_d = cpath_full
        lpath, lt0, pmf0 = generate_light_subpath(scene, cfg, pid, sid, power_dist, s_max_v)

        L = jnp.zeros((hw, 3), Float)
        splat = jnp.zeros((h, w, 3), Float)
        strat = {}

        def _rec(key, mask, contrib, wmis):
            if debug_strategies:
                strat[key] = (
                    jnp.sum(jnp.where(mask[:, None], contrib * wmis[:, None], 0.0)),
                    jnp.sum(jnp.where(mask[:, None], contrib, 0.0)))

        for t in range(2, t_max_v + 1):
            for s in range(0, s_max_v + 1):
                depth = s + t - 2
                if depth < 0 or depth > cfg.max_depth:
                    continue
                if s == 0:
                    if lights.env_index >= 0:
                        # escaped camera path picks up env radiance
                        # (bdpt.rs env branch of connect_bdpt), MIS vs
                        # the s=1 NEE that could sample this direction
                        # and the s>=2 env light subpaths
                        is_env = cpath.valid[:, t - 1] & \
                            (cpath.vtype[:, t - 1] == VTX_ENV)
                        w_dir = vm.normalize(cpath.p[:, t - 1] - cpath.p[:, t - 2])
                        le_env = lightsmod.env_radiance(lights, w_dir)
                        contrib_e = cpath.beta[:, t - 1] * le_env
                        sel_env = power_dist.discrete_pdf(
                            jnp.full((hw,), lights.env_index, Int))
                        pt_rev_e = convert_density(
                            sel_env * lightsmod.env_pdf_li(lights, w_dir),
                            cpath.p[:, t - 2], cpath.p[:, t - 1],
                            cpath.ng[:, t - 1])
                        ptm_rev_e = (1.0 / (PI * scene.world_radius ** 2)) \
                            * vm.absdot(cpath.ng[:, t - 2], w_dir)
                        wmis_e = _mis_weight(scene, cpath, lpath, 0, t,
                                             dict(pt_rev=pt_rev_e,
                                                  ptm_rev=ptm_rev_e))
                        L = L + jnp.where(
                            (is_env & (luminance(contrib_e) > 0))[:, None],
                            contrib_e * wmis_e[:, None], 0.0)
                        _rec(("env0", t), is_env & (luminance(contrib_e) > 0),
                             contrib_e, wmis_e)
                    # camera path alone: vertex t-1 must be emissive
                    ok = cpath.valid[:, t - 1] & (cpath.light_id[:, t - 1] >= 0) \
                        & (cpath.vtype[:, t - 1] == VTX_SURFACE)
                    wo = vm.normalize(cpath.p[:, t - 2] - cpath.p[:, t - 1])
                    le = lightsmod.area_light_radiance(
                        lights, cpath.light_id[:, t - 1], cpath.ng[:, t - 1], wo)
                    contrib = cpath.beta[:, t - 1] * le
                    # MIS overrides: pt.pdfRev = PdfLightOrigin; ptm.pdfRev = PdfLight
                    lid = jnp.maximum(cpath.light_id[:, t - 1], 0)
                    sel_pmf = power_dist.discrete_pdf(lid)
                    pdf_origin = sel_pmf / jnp.maximum(lights.total_area[lid], 1e-12)
                    wo_dir = vm.normalize(cpath.p[:, t - 2] - cpath.p[:, t - 1])
                    cos_l = vm.absdot(cpath.ng[:, t - 1], wo_dir)
                    pdf_le_dir = cos_l / PI   # cosine emission (area lights)
                    ptm_rev = convert_density(pdf_le_dir, cpath.p[:, t - 1],
                                              cpath.p[:, t - 2], cpath.ng[:, t - 2])
                    wmis = _mis_weight(scene, cpath, lpath, 0, t,
                                       dict(pt_rev=pdf_origin, ptm_rev=ptm_rev))
                    L = L + jnp.where((ok & (luminance(contrib) > 0))[:, None],
                                      contrib * wmis[:, None], 0.0)
                    _rec((0, t), ok & (luminance(contrib) > 0), contrib, wmis)
                elif s == 1:
                    # sample a light point, connect to camera vertex t-1
                    # (must be a connectible SURFACE vertex — env escape
                    # vertices only terminate s=0 paths, bdpt.rs
                    # IsConnectible)
                    ok = cpath.valid[:, t - 1] & ~cpath.delta[:, t - 1] \
                        & (cpath.vtype[:, t - 1] == VTX_SURFACE)
                    u_sel = smp.sample_1d(scfg, pid, sid, 60 + 8 * (s + 10 * t))
                    # selection from the POWER distribution — the same
                    # distribution the light subpath uses, so all
                    # strategies agree about each other's selection pmf
                    # (pbrt's lightDistr; advisor r4 finding)
                    lt, pmf, _ = power_dist.sample_discrete(u_sel)
                    lt = lt.astype(Int)
                    u_l = smp.sample_2d(scfg, pid, sid, 61 + 8 * (s + 10 * t))
                    ls = lightsmod.sample_li(lights, scene, lt, cpath.p[:, t - 1],
                                             u_l, scene.world_radius)
                    wo = vm.normalize(cpath.p[:, t - 2] - cpath.p[:, t - 1])
                    f_c = _vertex_f(scene, cpath, t - 1, wo, ls["wi"])
                    o_sh = vm.offset_ray_origin(cpath.p[:, t - 1], cpath.ng[:, t - 1], ls["wi"])
                    occ = scenemod.occluded(scene, o_sh, ls["wi"],
                                            t_max=jnp.maximum(ls["dist"] * (1 - 1e-3), 1e-4))
                    contrib = cpath.beta[:, t - 1] * f_c * ls["li"] \
                        * (vm.absdot(ls["wi"], cpath.ns[:, t - 1])
                           / jnp.maximum(ls["pdf"] * pmf, 1e-12))[:, None]
                    # MIS: build a temp "sampled" light vertex in lpath slot 0
                    lid = jnp.maximum(lt, 0)
                    cos_l = vm.absdot(ls["wi"], jnp.where(
                        (lights.kind[lt] == lightsmod.LIGHT_AREA_TRI)[:, None]
                        | (lights.kind[lt] == lightsmod.LIGHT_AREA_SPHERE)[:, None],
                        _light_normal_towards(ls), ls["wi"]))
                    pdf_le_dir = jnp.maximum(cos_l, 1e-6) / PI
                    qs_rev = convert_density(
                        _vertex_pdf(scene, cpath, t - 1, cpath.p[:, t - 2], ls["p_light"]),
                        cpath.p[:, t - 1], ls["p_light"], _light_normal_towards(ls))
                    pt_rev_s1 = convert_density(pdf_le_dir, ls["p_light"],
                                                cpath.p[:, t - 1], cpath.ng[:, t - 1])
                    if lights.env_index >= 0:
                        # env light: position density is the world disk
                        # (Vertex::PdfLight infinite branch, bdpt.rs)
                        env_sel = lights.kind[lt] == LIGHT_INFINITE
                        pt_rev_env = (1.0 / (PI * scene.world_radius ** 2)) \
                            * vm.absdot(cpath.ng[:, t - 1], ls["wi"])
                        pt_rev_s1 = jnp.where(env_sel, pt_rev_env, pt_rev_s1)
                    ptm_rev_s1 = convert_density(
                        _vertex_pdf(scene, cpath, t - 1, ls["p_light"], cpath.p[:, t - 2]),
                        cpath.p[:, t - 1], cpath.p[:, t - 2], cpath.ng[:, t - 2])
                    sampled_l = _sampled_light_path(lpath, lights, ls, lt, pmf)
                    wmis = _mis_weight(scene, cpath, sampled_l, 1, t,
                                       dict(qs_rev=qs_rev, pt_rev=pt_rev_s1,
                                            ptm_rev=ptm_rev_s1))
                    good = ok & ~occ & (ls["pdf"] > 0) & (luminance(contrib) > 0)
                    L = L + jnp.where(good[:, None], contrib * wmis[:, None], 0.0)
                    _rec((1, t), good, contrib, wmis)
                else:
                    # general s>=2 connection: lpath[s-1] ↔ cpath[t-1]
                    ok = cpath.valid[:, t - 1] & lpath.valid[:, s - 1] \
                        & ~cpath.delta[:, t - 1] & ~lpath.delta[:, s - 1] \
                        & (cpath.vtype[:, t - 1] == VTX_SURFACE)
                    g, wn = _g_term(scene, lpath.p[:, s - 1], lpath.ng[:, s - 1],
                                    cpath.p[:, t - 1], cpath.ng[:, t - 1])
                    wo_l_side = vm.normalize(lpath.p[:, s - 2] - lpath.p[:, s - 1])
                    wo_c_side = vm.normalize(cpath.p[:, t - 2] - cpath.p[:, t - 1])
                    f_l = _vertex_f(scene, lpath, s - 1, wo_l_side, wn)
                    f_c = _vertex_f(scene, cpath, t - 1, wo_c_side, -wn)
                    contrib = lpath.beta[:, s - 1] * f_l * f_c * cpath.beta[:, t - 1] \
                        * g[:, None]
                    # endpoint reverse pdfs
                    qs_rev = convert_density(
                        _vertex_pdf(scene, cpath, t - 1, cpath.p[:, t - 2],
                                    lpath.p[:, s - 1]),
                        cpath.p[:, t - 1], lpath.p[:, s - 1], lpath.ng[:, s - 1])
                    pt_rev = convert_density(
                        _vertex_pdf(scene, lpath, s - 1, lpath.p[:, s - 2],
                                    cpath.p[:, t - 1]),
                        lpath.p[:, s - 1], cpath.p[:, t - 1], cpath.ng[:, t - 1])
                    qsm_rev = convert_density(
                        _vertex_pdf(scene, lpath, s - 1, cpath.p[:, t - 1],
                                    lpath.p[:, s - 2]),
                        lpath.p[:, s - 1], lpath.p[:, s - 2], lpath.ng[:, s - 2])
                    ptm_rev = convert_density(
                        _vertex_pdf(scene, cpath, t - 1, lpath.p[:, s - 1],
                                    cpath.p[:, t - 2]),
                        cpath.p[:, t - 1], cpath.p[:, t - 2], cpath.ng[:, t - 2])
                    wmis = _mis_weight(scene, cpath, lpath, s, t,
                                       dict(qs_rev=qs_rev, pt_rev=pt_rev,
                                            qsm_rev=qsm_rev, ptm_rev=ptm_rev))
                    good = ok & (luminance(contrib) > 0)
                    L = L + jnp.where(good[:, None], contrib * wmis[:, None], 0.0)
                    _rec((s, t), good, contrib, wmis)

        # t=1 strategies: splat light vertices to the film
        for s in range(2, s_max_v + 1):
            depth = s - 1
            if depth > cfg.max_depth:
                continue
            ok = lpath.valid[:, s - 1] & ~lpath.delta[:, s - 1]
            u_lens2 = smp.sample_2d(scfg, pid, sid, 90 + 4 * s)
            wi_c, we, pdf_c, p_raster, p_lens = camera_sample_wi(
                camera, lpath.p[:, s - 1], u_lens2)
            wo_l_side = vm.normalize(lpath.p[:, s - 2] - lpath.p[:, s - 1])
            f_l = _vertex_f(scene, lpath, s - 1, wo_l_side, wi_c)
            # shading-normal correction (light transport)
            ns_corr = vm.absdot(wo_l_side, lpath.ns[:, s - 1]) * vm.absdot(wi_c, lpath.ng[:, s - 1]) / \
                jnp.maximum(vm.absdot(wo_l_side, lpath.ng[:, s - 1])
                            * vm.absdot(wi_c, lpath.ns[:, s - 1]), 1e-8)
            o_sh = vm.offset_ray_origin(lpath.p[:, s - 1], lpath.ng[:, s - 1], wi_c)
            dist = vm.length(p_lens - lpath.p[:, s - 1])
            occ = scenemod.occluded(scene, o_sh, wi_c,
                                    t_max=jnp.maximum(dist * (1 - 1e-3), 1e-4))
            contrib = lpath.beta[:, s - 1] * f_l \
                * (we * vm.absdot(wi_c, lpath.ns[:, s - 1]) * ns_corr
                   / jnp.maximum(pdf_c, 1e-12))[:, None]
            _, cam_pdf_dir = camera_pdf_we(camera, p_lens, -wi_c)
            qs_rev = convert_density(
                jnp.maximum(cam_pdf_dir, 0.0),
                p_lens, lpath.p[:, s - 1], lpath.ng[:, s - 1])
            qsm_rev = convert_density(
                _vertex_pdf(scene, lpath, s - 1, p_lens, lpath.p[:, s - 2]),
                lpath.p[:, s - 1], lpath.p[:, s - 2], lpath.ng[:, s - 2])
            wmis = _mis_weight(scene, cpath, lpath, s, 1,
                               dict(qs_rev=qs_rev, qsm_rev=qsm_rev))
            good = ok & ~occ & (pdf_c > 0) & (luminance(contrib) > 0)
            splat_film = filmmod.Film(jnp.zeros((h, w, 3), Float),
                                      jnp.zeros((h, w), Float), splat)
            splat = filmmod.add_splats(splat_film, p_raster,
                                       jnp.where(good[:, None],
                                                 contrib * wmis[:, None], 0.0),
                                       enabled=good).splats
            _rec((s, 1), good, contrib, wmis)
        return L, splat, strat

    for sidx in range(cfg.spp):
        L, splat, strat = one_sample(scene, camera, jnp.uint32(sidx))
        img_acc = img_acc + L
        splat_acc = splat_acc + splat
        for k, v in strat.items():
            a = strat_acc.get(k, (0.0, 0.0))
            strat_acc[k] = (a[0] + float(v[0]), a[1] + float(v[1]))

    img = img_acc.reshape(h, w, 3) / cfg.spp + splat_acc / cfg.spp
    if debug_strategies:
        denom = 3.0 * hw * cfg.spp      # per-pixel per-channel mean
        return img, {k: (v[0] / denom, v[1] / denom)
                     for k, v in strat_acc.items()}
    return img


def _light_normal_towards(ls):
    """Normal at the sampled light point (approximated by -wi for delta
    lights where it is unused)."""
    return ls.get("ng_l", -ls["wi"]) if isinstance(ls, dict) and "ng_l" in ls else -ls["wi"]


def _sampled_light_path(lpath, lights, ls, lt, pmf):
    """Overlay a freshly-sampled light vertex into slot 0 of a copy of
    lpath (for s=1 MIS bookkeeping). Its pdf_fwd is PdfLightOrigin —
    the AREA density of choosing this light point (selection pmf x
    1/area for area lights; the pmf alone for delta lights; the
    directional density for the infinite light) — NOT the solid-angle
    NEE pdf (bdpt.rs sampled-vertex semantics; mixing the two
    under-weights the s=1 strategy by the area/solid-angle Jacobian)."""
    n = lt.shape[0]
    kind = lights.kind[lt]
    is_area = (kind == lightsmod.LIGHT_AREA_TRI) | \
        (kind == lightsmod.LIGHT_AREA_SPHERE)
    pdf_origin = jnp.where(
        is_area, pmf / jnp.maximum(lights.total_area[lt], 1e-12), pmf)
    if lights.env_index >= 0:
        pdf_origin = jnp.where(kind == LIGHT_INFINITE,
                               pmf * lightsmod.env_pdf_li(lights, ls["wi"]),
                               pdf_origin)
    return lpath._replace(
        p=lpath.p.at[:, 0].set(ls["p_light"]),
        ng=lpath.ng.at[:, 0].set(_light_normal_towards(ls)),
        ns=lpath.ns.at[:, 0].set(_light_normal_towards(ls)),
        pdf_fwd=lpath.pdf_fwd.at[:, 0].set(pdf_origin),
        delta=lpath.delta.at[:, 0].set(ls["is_delta"]),
        light_id=lpath.light_id.at[:, 0].set(lt),
        valid=lpath.valid.at[:, 0].set(True))


