"""Unidirectional path tracer — the flagship wavefront pipeline.

TPU-native counterpart of src/integrators/path.rs:65-213. The reference's
recursive `li` with trait dispatch becomes a statically-unrolled bounce
loop over masked SoA lanes:

    hit = closest_hit(primary)
    for bounce < max_depth:
        emission pickup at `hit` with MIS vs the NEE strategy
        NEE light sample at `hit` (shadow any-hit query)
        ONE BSDF sample -> extension ray -> closest_hit
        throughput update -> Russian roulette (after bounce 3)
    final emission pickup (completes the last vertex's BSDF-MIS half)

This is the sample-reuse estimator (wavefront practice; same MIS family
as estimate_direct's two halves, integrator.rs:136-266): the single BSDF
sample serves BOTH as the MIS counterpart of the light sample AND as the
path continuation, so each bounce costs exactly one closest-hit and one
any-hit traversal instead of the reference's two independent BSDF draws
(integrator.rs:196-262 + path.rs:127). Emission found by the extension
ray is weighted by power_heuristic(pdf_bsdf, pdf_nee(that light)), where
pdf_nee includes the light-selection pmf — so the combined estimator
covers the same path family with the same expectation and fewer rays.

Lane liveness is a mask AND a work filter: dead lanes carry t_max < 0
into the traversal, sort to the end of the ray buffer, and collapse into
zero-coverage tiles the pallas kernel skips entirely (free compaction —
no gather/scatter reshuffle needed). Every random number is
counter-indexed by (pixel, sample, dim), so path replay (gradients, MLT
PSS providers) is exact.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import Float
from ..core import samplers as smp
from ..core import vecmath as vm
from ..core.sampling import power_heuristic
from ..core.spectrum import luminance
from ..geom import scene as scenemod
from ..lights import lights as lightsmod
from ..shade import materials as matmod
from . import common


# sample-dimension slot of the compaction subset draw (own per-bounce
# block well past the SSS stream, like path_sss.DIM_SSS)
DIM_COMPACT = 8000
# slot of the anisotropic-footprint jitter (one per bounce)
DIM_TEXLOD = 9000
# test hook: disable the anisotropic major-axis tap (isotropic LOD only)
ANISO_TEXTURE = True


def _compact_width(n0, bounce, compact_from, floor=2048):
    """Static wavefront width for `bounce`: halves each bounce past
    `compact_from`; from the 4th compacted bounce the schedule drops two
    extra octaves (measured occupancy collapses to ~0.006 by then —
    BENCH r4 — so depth-5 was riding 90% dead lanes at the old n0/16
    cap); floored at `floor` lanes. Estimator stays unbiased at any
    width (random-subset RR with live/kept compensation)."""
    shift = bounce - compact_from + 1
    if shift >= 4:
        shift += 2
    shift = min(shift, 7)
    return max(min(n0 >> shift, n0), min(floor, n0))


def _gather_packed(order, arrays):
    """Permute many per-lane arrays with ONE wide-row gather (TPU gather
    cost is per-row — 20 narrow gathers would cost 20x). Ints/bools ride
    as f32 bit patterns (gather copies bits; no arithmetic touches
    them)."""
    cols, meta = [], []
    for a in arrays:
        a2 = a[:, None] if a.ndim == 1 else a
        meta.append((a.dtype, a.ndim, a2.shape[1]))
        if a.dtype == jnp.bool_:
            a2 = a2.astype(Float)
        elif a2.dtype != Float:
            a2 = jax.lax.bitcast_convert_type(a2, Float)
        cols.append(a2)
    out = jnp.concatenate(cols, axis=1)[order]
    res, i = [], 0
    for dtype, nd, k in meta:
        c = out[:, i:i + k]
        i += k
        if dtype == jnp.bool_:
            c = c > 0.5
        elif dtype != Float:
            c = jax.lax.bitcast_convert_type(c, dtype)
        if nd == 1:
            c = c[:, 0]
        res.append(c)
    return res


def default_provider(cfg, pixel_id, sample_idx):
    """Sample provider: (bounce, slot) → uniforms from the stateless
    sampler. MLT substitutes a primary-sample-vector provider (mlt.py)."""
    def sample1(bounce, slot):
        return smp.sample_1d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(bounce, slot))

    def sample2(bounce, slot):
        return smp.sample_2d(cfg.sampler, pixel_id, sample_idx, smp.bounce_dim(bounce, slot))

    return sample1, sample2


def _emission_pickup(scene, lights, cfg, hit, d, prev_p, prev_pdf, prev_spec,
                     counts):
    """L contribution of the emitter hit (or env escaped to) by a ray,
    MIS-weighted against the NEE strategy that could have sampled the
    same emitter (path.rs:80-92 + integrator.rs:216-262 folded into the
    extension ray)."""
    le_hit = lightsmod.area_light_radiance(lights, hit.light_id, hit.ng, -d)
    le_env = lightsmod.env_radiance(lights, d)
    le = jnp.where(hit.valid[..., None], le_hit, le_env)

    # pdf of NEE producing this direction: selection pmf x solid-angle pdf
    got_area = hit.valid & (hit.light_id >= 0)
    pdf_area = lightsmod.pdf_li_area_scene(lights, scene, hit.light_id,
                                           prev_p, hit.p, hit.ng)
    sel_area = common.select_light_pmf(scene, cfg.light_strategy, prev_p,
                                       hit.light_id)
    pdf_nee = jnp.where(got_area, pdf_area * sel_area, 0.0)
    if lights.env_index >= 0:
        env_sel = common.select_light_pmf(
            scene, cfg.light_strategy, prev_p,
            jnp.full(hit.valid.shape, lights.env_index, jnp.int32))
        pdf_env = lightsmod.env_pdf_li(lights, d) * env_sel
        pdf_nee = jnp.where(~hit.valid, pdf_env, pdf_nee)
    w = jnp.where(prev_spec, 1.0, power_heuristic(1.0, prev_pdf, 1.0, pdf_nee))
    return jnp.where(counts[..., None], le * w[..., None], 0.0)


def li(scene, o, d, pixel_id, sample_idx, cfg, rr_start=3, return_stats=False,
      provider=None, cone=None, compact_from=None):
    lights = scene.lights
    kinds = scene.materials.kinds_present
    shp = pixel_id.shape
    sample1, sample2 = provider if provider is not None else \
        default_provider(cfg, pixel_id, sample_idx)
    # wavefront compaction rebinds the sampler to the surviving lanes'
    # (pixel, sample) ids — only possible for the default provider
    # (MLT's PSS provider closes over lane-indexed mutation state)
    do_compact = compact_from is not None and provider is None

    n = int(jnp.size(pixel_id))
    n0 = n
    pixel_id = pixel_id.reshape(n)
    sample_idx = jnp.broadcast_to(sample_idx, shp).reshape(n)
    if provider is None:       # rebind to the flattened ids
        sample1, sample2 = default_provider(cfg, pixel_id, sample_idx)
        flat = lambda a: a     # provider outputs are already lane-major
    else:
        flat = lambda a: a.reshape((n,) + a.shape[len(shp):])
    o = o.reshape(n, 3)
    d = d.reshape(n, 3)
    # shutter time for AnimatedTransform instances (transform.rs:2010):
    # recomputed from the stateless sampler (same stream the camera used)
    # so the li signature stays (scene, o, d, pixel_id, sample_idx)
    animated = bool(scene.instances) and any(s.animated for s in scene.instances)
    time = smp.sample_1d(cfg.sampler, pixel_id, sample_idx, smp.DIM_TIME) \
        if (animated and provider is None) else None

    L = jnp.zeros((n, 3), Float)
    beta = jnp.ones((n, 3), Float)
    active = jnp.ones((n,), bool)
    prev_spec = jnp.ones((n,), bool)       # bounce-0 emission counts fully
    prev_pdf = jnp.zeros((n,), Float)
    prev_p = o
    eta_scale = jnp.ones((n,), Float)
    rays_traced = jnp.zeros((), Float)
    occupancy = []

    # pixel ray cone → texture footprint (ray differentials analog;
    # cameras.cone_start). `cone` = (width0, spread); without a camera
    # hooked in, fall back to a typical-fov pixel angle.
    if cone is None:
        cone = (jnp.zeros((), Float), 0.9 / max(cfg.height, 1))
    cone_w = jnp.broadcast_to(cone[0], (n,))
    cone_s = jnp.broadcast_to(cone[1], (n,))

    hit = scenemod.intersect(scene, o, d, time=time)
    rays_traced = rays_traced + n

    # lane → original-frame index (compaction bookkeeping); L_out holds
    # radiance of lanes that were dropped by an earlier compaction
    gid = jnp.arange(n, dtype=jnp.int32)
    L_out = None

    for bounce in range(cfg.max_depth):
        # --- wavefront compaction: occupancy collapses geometrically
        # ([1, .5, .2, .1, .01] on the bench scene), but shading, NEE
        # and the traversal's fixed costs all scale with the STATIC lane
        # count. Shrink the wavefront on a static width schedule: keep a
        # uniformly-random subset of the live lanes (plus inert filler)
        # and scale survivors by live/kept — plain Russian roulette with
        # survival probability kept/live, so the estimator stays
        # unbiased; when live ≤ width (the common case, schedule chosen
        # above typical occupancy) nothing is killed and the render is
        # unchanged (path.rs:200-207 is the same lever, per-path).
        if do_compact and bounce >= compact_from:
            m = _compact_width(n0, bounce, compact_from)
            if m < n:
                u_c = sample1(bounce, DIM_COMPACT)
                key = jnp.where(active, u_c, 2.0)       # dead sort last
                order = jnp.argsort(key)[:m]
                live_n = jnp.sum(active.astype(Float))
                if L_out is None:
                    L_out = jnp.zeros((n0, 3), Float)
                L_out = L_out.at[gid].add(L, unique_indices=True)
                tcol = [] if time is None else [time]
                (beta, eta_scale, cone_w, cone_s, pixel_id, sample_idx,
                 active, gid, d, prev_p, prev_pdf, prev_spec,
                 hv, ht, hp, hng, hns, huv, hdpdu, hwo,
                 hmat, hlid, hpk, hpid, huvs, *trest) = _gather_packed(order, [
                     beta, eta_scale, cone_w, cone_s, pixel_id, sample_idx,
                     active, gid, d, prev_p, prev_pdf, prev_spec,
                     hit.valid, hit.t, hit.p, hit.ng,
                     hit.ns, hit.uv, hit.dpdu, hit.wo, hit.material_id,
                     hit.light_id, hit.prim_kind, hit.prim_id, hit.uv_scale]
                     + tcol)
                if time is not None:
                    time = trest[0]
                hit = scenemod.Hit(valid=hv, t=ht, p=hp, ng=hng, ns=hns,
                                   uv=huv, dpdu=hdpdu, wo=hwo, material_id=hmat,
                                   light_id=hlid, prim_kind=hpk, prim_id=hpid,
                                   uv_scale=huvs)
                L = jnp.zeros((m, 3), Float)
                # RR compensation when live lanes exceeded the width
                scale = jnp.maximum(1.0, live_n / m)
                beta = jnp.where(active[..., None], beta * scale, beta)
                n = m
                sample1, sample2 = default_provider(cfg, pixel_id, sample_idx)

        wo = -d
        occupancy.append(jnp.sum(active.astype(Float)) / n0)

        # Emission at this vertex, MIS vs NEE at the PREVIOUS vertex
        L = L + beta * _emission_pickup(scene, lights, cfg, hit, d, prev_p,
                                        prev_pdf, prev_spec, active)

        active = active & hit.valid & (hit.material_id >= 0)

        frame = common.shading_frame(hit, scene)
        # footprint at the hit: cone diameter × surface uv density gives
        # the MINOR axis; at grazing incidence the footprint stretches by
        # 1/cos along the projected view direction. Instead of an EWA
        # multi-tap ellipse filter (mipmap.rs:258,297-345 — each tap is
        # a random gather, the one expensive op on TPU), take ONE
        # stochastic tap along the major axis per path sample: the
        # expectation over samples IS the anisotropic ellipse filter,
        # with LOD chosen from the minor axis (no grazing over-blur).
        fp_uv = (cone_w + cone_s * jnp.where(hit.valid, hit.t, 0.0)) * hit.uv_scale
        cos_i = vm.absdot(d, hit.ns)
        aniso = jnp.clip(1.0 / jnp.maximum(cos_i, 0.125), 1.0, 8.0)
        if not ANISO_TEXTURE:
            aniso = jnp.ones_like(aniso)
        d_t = d - hit.ns * vm.dot(d, hit.ns)[..., None]
        d_tn = d_t / jnp.maximum(vm.length(d_t), 1e-8)[..., None]
        b_ax = vm.cross(hit.ns, hit.dpdu)
        uv_dir = jnp.stack([vm.dot(d_tn, hit.dpdu), vm.dot(d_tn, b_ax)], axis=-1)
        # custom providers (MLT's PSS vector) don't cover the TEXLOD
        # dimension — indexing past their vector silently clamps to the
        # last (mutated) column and correlates the jitter with a path
        # dimension. Center tap (u_j = 0) there instead (advisor r4).
        taps = int(getattr(cfg, "aniso_taps", 1) or 1)
        if taps > 1:
            # deterministic EWA-style midpoint taps (VERDICT r4 missing
            # #3): filters per LOOKUP instead of in expectation over spp
            # — for low-spp previews; averages the resolved float params
            import dataclasses as _dc
            lps = []
            for k_t in range(taps):
                off = (k_t + 0.5) / taps - 0.5
                uv_k = hit.uv + uv_dir * (fp_uv * (aniso - 1.0) * off)[..., None]
                lps.append(matmod.resolve(scene.materials, hit.material_id,
                                          uv_k, hit.p, scene.textures,
                                          fp=fp_uv))
            avg = {f.name: (getattr(lps[0], f.name)
                            if f.name in ("kind", "rough_is_zero", "fourier")
                            else sum(getattr(l, f.name) for l in lps) / taps)
                   for f in _dc.fields(lps[0])}
            lp = matmod.LaneParams(**avg)
        else:
            u_j = (flat(sample1(bounce, DIM_TEXLOD)) - 0.5) if provider is None \
                else jnp.zeros((n,), Float)
            uv_eval = hit.uv + uv_dir * (fp_uv * (aniso - 1.0) * u_j)[..., None]
            lp = matmod.resolve(scene.materials, hit.material_id, uv_eval, hit.p,
                                scene.textures, fp=fp_uv)

        # --- NEE light half (path.rs:100-126 → integrator.rs:155-195).
        # The shadow trace is DEFERRED: the candidate contribution and
        # shadow ray are kept and traced together with this bounce's
        # extension ray in ONE fused kernel launch (shared coherence
        # sort + coverage pass; scenemod.intersect_occluded).
        u_sel = flat(sample1(bounce, 5))
        lt, pmf = common.select_light(scene, cfg.light_strategy, hit.p, u_sel)
        u_light = flat(sample2(bounce, 3))
        nee_c, o_sh, wi_sh, tmax_sh, usable, ls = common.nee_light_defer(
            scene, lights, lp, kinds, frame, hit.p, hit.ns, hit.ng, wo,
            lt, u_light, active)
        rays_traced = rays_traced + jnp.sum(usable.astype(Float))
        # fold beta and the selection pmf now — beta mutates below
        nee_c = jnp.where(active[..., None],
                          beta * nee_c / jnp.maximum(pmf, 1e-12)[..., None],
                          0.0)

        # --- ONE BSDF sample: MIS counterpart AND path continuation
        u_bsdf = flat(sample2(bounce, 0))
        u_lobe = flat(sample1(bounce, 2))
        wo_l = frame.to_local(wo)
        wi_l, f, pdf, spec, trans = matmod.sample(lp, kinds, wo_l, u_lobe, u_bsdf)
        wi = frame.to_world(wi_l)

        # --- throughput update (path.rs:127-152)
        good = active & (pdf > 0.0) & (luminance(f) > 0.0)
        beta = jnp.where(good[..., None],
                         beta * f * (vm.absdot(wi, hit.ns) / jnp.maximum(pdf, 1e-12))[..., None],
                         beta)
        active = good
        eta_scale = jnp.where(trans, eta_scale * matmod.eta_scale_on_transmit(lp, wo_l[..., 2]),
                              eta_scale)

        # --- Russian roulette (path.rs:200-207)
        if bounce >= rr_start:
            rr_beta = vm.max_component(beta * eta_scale[..., None])
            q = jnp.maximum(0.05, 1.0 - rr_beta)
            u_rr = flat(sample1(bounce, 6))
            survive = u_rr >= q
            beta = jnp.where((active & survive)[..., None],
                             beta / jnp.maximum(1.0 - q, 1e-6)[..., None], beta)
            active = active & survive

        # --- subsurface leg (path.rs:154-198): transmission events on
        # MAT_SUBSURFACE lanes re-emerge at a profile-sampled exit point
        # (statically gated — scenes without subsurface skip all of it)
        sss_state = None
        if matmod.MAT_SUBSURFACE in kinds:
            from . import path_sss
            is_sss = active & (lp.kind == matmod.MAT_SUBSURFACE) & trans
            exit_hit, sp_w, ok_sss, eta_sss = path_sss.sample_exit(
                scene, hit, frame,
                flat(sample1(bounce, 0 + path_sss.DIM_SSS)),
                flat(sample1(bounce, 1 + path_sss.DIM_SSS)),
                flat(sample1(bounce, 2 + path_sss.DIM_SSS)),
                flat(sample1(bounce, 3 + path_sss.DIM_SSS)), is_sss)
            active = active & (~is_sss | ok_sss)
            beta = jnp.where(ok_sss[..., None], beta * sp_w, beta)
            # NEE at the exit point with the Sw lobe (+ its own shadow ray)
            u_sel2 = flat(sample1(bounce, 4 + path_sss.DIM_SSS))
            lt2, pmf2 = common.select_light(scene, cfg.light_strategy,
                                            exit_hit.p, u_sel2)
            u_light2 = flat(sample2(bounce, 5 + path_sss.DIM_SSS))
            ld_sss = path_sss.sw_nee(scene, lights, exit_hit, eta_sss, lt2,
                                     u_light2, ok_sss)
            L = L + jnp.where(ok_sss[..., None],
                              beta * ld_sss / jnp.maximum(pmf2, 1e-12)[..., None],
                              0.0)
            # cosine continuation through Sw
            wi_sss, w_sw, pdf_cos = path_sss.sw_sample(
                exit_hit, eta_sss, flat(sample2(bounce, 7 + path_sss.DIM_SSS)))
            beta = jnp.where(ok_sss[..., None], beta * w_sw[..., None], beta)
            sss_state = (ok_sss, exit_hit, wi_sss, pdf_cos)

        # --- extension ray = the same BSDF sample, traced closest-hit
        prev_p = hit.p
        prev_pdf = pdf
        prev_spec = spec
        # cone update: advance the apex to the hit; diffuse/glossy
        # bounces widen the angular spread (ray-cone approximation of
        # specular_reflect/transmit differential propagation,
        # integrator.rs:294-391)
        cone_w = cone_w + cone_s * jnp.where(hit.valid, hit.t, 0.0)
        # non-specular bounces widen the angular spread by the sampled
        # lobe's sharpness: a pdf-p lobe has solid angle ~1/p, i.e.
        # half-angle ~1/sqrt(p) — material-agnostic (GGX alpha and the
        # cosine lobe both land right), replacing the old 0.2 constant
        lobe_spread = jnp.minimum(0.7, jax.lax.rsqrt(jnp.maximum(pdf, 2.0)))
        cone_s = jnp.where(spec, cone_s, jnp.maximum(cone_s, lobe_spread))
        o = vm.offset_ray_origin(hit.p, hit.ng, wi)
        d = wi
        if sss_state is not None:
            ok_sss, exit_hit, wi_sss, pdf_cos = sss_state
            m3 = ok_sss[..., None]
            o = jnp.where(m3, vm.offset_ray_origin(exit_hit.p, exit_hit.ns, wi_sss), o)
            d = jnp.where(m3, wi_sss, d)
            prev_p = jnp.where(m3, exit_hit.p, prev_p)
            prev_pdf = jnp.where(ok_sss, pdf_cos, prev_pdf)
            prev_spec = jnp.where(ok_sss, False, prev_spec)
        hit, occ = scenemod.intersect_occluded(scene, o, d, o_sh, wi_sh,
                                               tmax_sh, active=active,
                                               active_sh=usable, time=time)
        L = L + jnp.where((usable & ~occ)[..., None], nee_c, 0.0)
        rays_traced = rays_traced + jnp.sum(active.astype(Float))

    # Final emission pickup: completes the BSDF-MIS half of the last
    # vertex's direct lighting (integrator.rs:216-262 analog).
    L = L + beta * _emission_pickup(scene, lights, cfg, hit, d, prev_p,
                                    prev_pdf, prev_spec, active)

    if L_out is not None:      # fold compacted frames back to lane order
        L = L_out.at[gid].add(L, unique_indices=True)
    L = L.reshape(shp + (3,))
    if return_stats:
        return L, {"rays_traced": rays_traced,
                   "occupancy": jnp.stack(occupancy)}
    return L


def make_li(cfg, rr_start=3, camera=None, compact_from=None):
    cone = None
    if camera is not None:
        from ..cameras import cameras as cammod
        cone = cammod.cone_start(camera)
    return lambda scene, o, d, pid, sid: li(scene, o, d, pid, sid, cfg, rr_start,
                                            cone=cone, compact_from=compact_from)
