"""Volumetric path tracer.

TPU-native counterpart of src/integrators/volpath.rs:60-236: the path
loop gains a medium-sampling step on every segment — if the medium
scatters before the surface hit, shade a phase-function event (NEE with
transmittance + HG sampling for the continuation); otherwise proceed
with the surface event, with NEE shadow rays attenuated by Tr
(handle_media estimate_direct, integrator.rs:155-195).

Estimator structure mirrors path.py's sample-reuse MIS: the ONE
direction sample per vertex (BSDF at surface vertices, phase at medium
vertices) is both the NEE-MIS counterpart and the path continuation —
emission found by the extension ray is weighted by
power_heuristic(prev_pdf, pdf_nee(that light)), where prev_pdf is the
BSDF pdf or the phase pdf of the previous vertex. This collects BOTH
MIS halves at medium events (volpath.rs:118-150 semantics): the light
half at the event, the phase half via the continuation pickup.

Media are dispatched per lane through shade/media.medium_* (masked
type-switch over homogeneous/grid/vacuum — the Medium trait analog,
medium.rs:41). Lanes carry a current-medium id; scenes with a single
global medium start every lane in medium 0 (BASELINE config 4), and
per-primitive interface transitions hook in at the transmission step.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.types import Float, INF
from ..core import samplers as smp
from ..core import vecmath as vm
from ..core.spectrum import luminance
from ..core.sampling import power_heuristic
from ..core.rng import hash_combine
from ..geom import scene as scenemod
from ..lights import lights as lightsmod
from ..shade import materials as matmod
from ..shade import media as medmod
from . import common
from .path import _emission_pickup

# extra dimension offsets beyond the shared per-bounce slot layout
# (samplers.DIMS_PER_BOUNCE): the medium stream must not collide with
# the surface stream's dims (VERDICT r2 weak #2c).
_DIM_MED_CH = 1000      # channel selection (1D)
_DIM_PHASE = 2000       # phase direction (2D)
_DIM_MED_SEL = 3000     # medium-event light selection (1D)
_DIM_MED_LIGHT = 3001   # medium-event light sample (2D)


def li(scene, o, d, pixel_id, sample_idx, cfg, rr_start=3):
    lights = scene.lights
    media = scene.media
    kinds = scene.materials.kinds_present
    n = pixel_id.shape

    def s1(bounce, slot, extra=0):
        return smp.sample_1d(cfg.sampler, pixel_id, sample_idx,
                             smp.bounce_dim(bounce, slot) + extra)

    def s2(bounce, slot, extra=0):
        return smp.sample_2d(cfg.sampler, pixel_id, sample_idx,
                             smp.bounce_dim(bounce, slot) + extra)

    L = jnp.zeros(o.shape, Float)
    beta = jnp.ones(o.shape, Float)
    active = jnp.ones(n, bool)
    prev_spec = jnp.ones(n, bool)       # bounce-0 emission counts fully
    prev_pdf = jnp.zeros(n, Float)
    prev_p = o
    # every lane starts inside medium 0 when the scene has media
    # (camera medium; per-primitive interfaces switch this on transmit)
    cur_med = jnp.full(n, 0 if media is not None else -1, jnp.int32)

    # primary closest hit; per bounce, BOTH NEE shadow wavefronts
    # (medium + surface) are DEFERRED and traced together with the next
    # bounce's extension rays in ONE fused launch (the path.py pattern;
    # 3 traversal launches per bounce collapse into 1)
    hit = scenemod.intersect(scene, o, d, active=active)
    for bounce in range(cfg.max_depth):
        wo = -d
        seg_dist = jnp.where(hit.valid, hit.t, 2.0 * scene.world_radius)

        # ---- medium interaction on this segment (volpath.rs:62-90)
        u_med = s1(bounce, 7)
        u_ch = s1(bounce, 7, _DIM_MED_CH)
        key = hash_combine(pixel_id, sample_idx, jnp.uint32(37 + bounce))
        m_sampled, m_t, m_w = medmod.medium_sample(
            media, cur_med, o, d, seg_dist, u_med, u_ch, key)
        m_sampled = m_sampled & active
        beta = jnp.where(active[..., None], beta * m_w, beta)
        p_med = o + m_t[..., None] * d

        # ---- emission pickup at the surface vertex (or env escape),
        # MIS vs the NEE of the PREVIOUS vertex — only lanes whose
        # segment was NOT cut short by a medium scatter reach it.
        reach = active & ~m_sampled
        L = L + beta * _emission_pickup(scene, lights, cfg, hit, d, prev_p,
                                        prev_pdf, prev_spec, reach)

        # ================= medium event: NEE light half + phase sample
        g = medmod.phase_g(media, cur_med)
        u_msel = s1(bounce, 5, _DIM_MED_SEL)
        lt_m, pmf_m = common.select_light(scene, cfg.light_strategy, p_med, u_msel)
        u_mlight = s2(bounce, 5, _DIM_MED_LIGHT)
        ls_m = lightsmod.sample_li(lights, scene, lt_m, p_med, u_mlight,
                                   scene.world_radius)
        ph_l = medmod.hg_phase(vm.dot(wo, ls_m["wi"]), g)
        key_tr = hash_combine(pixel_id, sample_idx, jnp.uint32(91 + bounce))
        tr_m = medmod.medium_tr(media, cur_med, p_med, ls_m["wi"], ls_m["dist"],
                                key_tr)
        # HG sampling pdf == phase value, so the MIS counterpart pdf of
        # the light sample IS ph_l (volpath.rs:118-136).
        w_lm = jnp.where(ls_m["is_delta"], 1.0,
                         power_heuristic(1.0, ls_m["pdf"], 1.0, ph_l))
        ld_med = ls_m["li"] * tr_m * (ph_l * w_lm / jnp.maximum(ls_m["pdf"], 1e-12))[..., None] \
            / jnp.maximum(pmf_m, 1e-12)[..., None]
        usable_m = m_sampled & (ls_m["pdf"] > 0)
        tmax_m = jnp.maximum(ls_m["dist"] * (1 - 1e-3), 1e-4)
        # fold beta NOW (it mutates below); occlusion applied after the
        # fused trace
        nee_med = jnp.where(usable_m[..., None], beta * ld_med, 0.0)

        # phase continuation (its emission pickup next bounce completes
        # the MIS pair — phase pdf rides in prev_pdf)
        u_ph = s2(bounce, 0, _DIM_PHASE)
        wi_med, ph_pdf = medmod.hg_sample(d, g, u_ph)   # forward dir = d

        # ================= surface event (path.py sample-reuse logic)
        surf = reach & hit.valid & (hit.material_id >= 0)

        frame = common.shading_frame(hit, scene)
        lp = matmod.resolve(scene.materials, hit.material_id, hit.uv, hit.p,
                            scene.textures)

        # --- NEE light half at the surface, with Tr over the SURFACE
        # shadow segment (its own light sample at hit.p — volpath.rs
        # handle_media estimate_direct, integrator.rs:155-195)
        u_sel = s1(bounce, 5)
        lt_s, pmf_s = common.select_light(scene, cfg.light_strategy, hit.p, u_sel)
        u_light = s2(bounce, 3)
        ld_surf_c, o_sh_s, wi_sh_s, tmax_s, usable_s, ls_s = \
            common.nee_light_defer(scene, lights, lp, kinds, frame, hit.p,
                                   hit.ns, hit.ng, wo, lt_s, u_light, surf)
        key_trs = hash_combine(pixel_id, sample_idx, jnp.uint32(121 + bounce))
        tr_s = medmod.medium_tr(media, cur_med, hit.p, ls_s["wi"], ls_s["dist"],
                                key_trs)
        nee_surf = jnp.where(surf[..., None],
                             beta * ld_surf_c * tr_s
                             / jnp.maximum(pmf_s, 1e-12)[..., None], 0.0)

        # --- ONE BSDF sample: MIS counterpart AND continuation
        u_bsdf = s2(bounce, 0)
        u_lobe = s1(bounce, 2)
        wo_l = frame.to_local(wo)
        wi_l, f, pdf, spec, trans = matmod.sample(lp, kinds, wo_l, u_lobe, u_bsdf)
        wi_surf = frame.to_world(wi_l)
        good_surf = surf & (pdf > 0.0) & (luminance(f) > 0.0)
        beta = jnp.where(good_surf[..., None],
                         beta * f * (vm.absdot(wi_surf, hit.ns)
                                     / jnp.maximum(pdf, 1e-12))[..., None],
                         beta)

        # ---------------- merge continuations
        active = m_sampled | good_surf
        prev_spec = jnp.where(m_sampled, False, spec)
        prev_pdf = jnp.where(m_sampled, ph_pdf, pdf)
        prev_p = jnp.where(m_sampled[..., None], p_med, hit.p)
        o = jnp.where(m_sampled[..., None], p_med,
                      vm.offset_ray_origin(hit.p, hit.ng, wi_surf))
        d = jnp.where(m_sampled[..., None], wi_med, wi_surf)
        # per-primitive medium interfaces: transmission through a
        # surface with an interface flips the lane's medium id here
        # (medium.rs MediumInterface). Scenes register interfaces via
        # materials.med_inside/med_outside; absent → global medium.
        mi = getattr(scene.materials, "med_inside", None)
        if mi is not None and media is not None:
            mo = scene.materials.med_outside
            midx = jnp.maximum(hit.material_id, 0)
            entering = vm.dot(wi_surf, hit.ng) < 0.0
            new_med = jnp.where(entering, mi[midx], mo[midx])
            cur_med = jnp.where(good_surf & trans, new_med, cur_med)

        if bounce >= rr_start:
            rr_beta = vm.max_component(beta)
            q = jnp.maximum(0.05, 1.0 - rr_beta)
            u_rr = s1(bounce, 6)
            survive = u_rr >= q
            beta = jnp.where((active & survive)[..., None],
                             beta / jnp.maximum(1.0 - q, 1e-6)[..., None], beta)
            active = active & survive

        # ---- ONE fused launch: next extension closest-hit + BOTH
        # deferred shadow wavefronts (medium NEE from p_med, surface NEE
        # from the offset surface point)
        o_sh = jnp.concatenate([p_med, o_sh_s], axis=0)
        wi_sh = jnp.concatenate([ls_m["wi"], wi_sh_s], axis=0)
        tmax_sh = jnp.concatenate([tmax_m, tmax_s], axis=0)
        usable_sh = jnp.concatenate([usable_m, usable_s], axis=0)
        hit, occ2 = scenemod.intersect_occluded(scene, o, d, o_sh, wi_sh,
                                                tmax_sh, active=active,
                                                active_sh=usable_sh)
        n_l = p_med.shape[0]
        occ_m = occ2[:n_l]
        occ_s = occ2[n_l:]
        L = L + jnp.where((usable_m & ~occ_m)[..., None], nee_med, 0.0)
        L = L + jnp.where((usable_s & ~occ_s)[..., None], nee_surf, 0.0)

    # final segment: medium attenuation + emission pickup for the last
    # extension ray (completes the last vertex's MIS half — `hit` is the
    # last fused launch's closest-hit result)
    seg_dist = jnp.where(hit.valid, hit.t, 2.0 * scene.world_radius)
    key_f = hash_combine(pixel_id, sample_idx, jnp.uint32(191))
    tr_f = medmod.medium_tr(media, cur_med, o, d, seg_dist, key_f)
    L = L + beta * tr_f * _emission_pickup(scene, lights, cfg, hit, d, prev_p,
                                           prev_pdf, prev_spec, active)

    return L


def make_li(cfg, rr_start=3):
    return lambda scene, o, d, pid, sid: li(scene, o, d, pid, sid, cfg, rr_start)
