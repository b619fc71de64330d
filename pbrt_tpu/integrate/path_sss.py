"""Subsurface-scattering leg of the path integrator.

TPU-native counterpart of the BSSRDF hook in src/integrators/path.rs:
154-198 and SeparableBSSRDF::sample_sp / pdf_sp (src/core/bssrdf.rs:
133-272): when the BSDF sample at a MAT_SUBSURFACE surface is a
transmission event, the path re-emerges at an exit point sampled from
the tabulated radial profile around the entry point:

  1. pick a probe axis from the entry shading frame (ns 0.5 / ss 0.25 /
     ts 0.25) and a spectral channel (uniform of 3),
  2. sample a radius r from the channel's profile CDF and an angle phi,
  3. trace a probe segment of length 2*sqrt(r_max^2 - r^2) through the
     surface, collecting up to PROBE_CHAIN hits on the same material
     and picking one uniformly (the IntersectionChain of
     bssrdf.rs:180-214, bounded instead of unbounded),
  4. weight = Sp(po, pi) / pdf_sp(po, pi) with the axis x channel MIS
     density (bssrdf.rs:216-272),
  5. at the exit point: NEE with the Sw directional lobe and a
     cosine-sampled continuation (path.rs:182-198; Sw from
     shade/bssrdf.sw, its pdf is the cosine hemisphere).

Everything is masked wavefront math: lanes without an SSS event carry
zero weights and inert probe rays (active=False), so scenes whose
material table contains no MAT_SUBSURFACE never enter this module
(static kinds_present gate in path.li).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.types import Float, Int, PI, RAY_EPS
from ..core import vecmath as vm
from ..core.sampling import cosine_sample_hemisphere
from ..geom import scene as scenemod
from ..shade import bssrdf as bssr

PROBE_CHAIN = 2    # probe hits collected (bounded IntersectionChain)
DIM_SSS = 4000     # sample-dimension offset of the SSS stream (keeps the
#                    probe/exit draws off the shared per-bounce slots,
#                    volpath._DIM_* convention)


def _sss_params(mats, mid):
    """Per-lane (sigma_t (N,3), rho (N,3), eta (N,), g-table)."""
    mid = jnp.maximum(mid, 0)
    sig_a = mats.aux[mid, 0:3]
    sig_s = mats.aux[mid, 3:6]
    scale = jnp.maximum(mats.aux[mid, 7:8], 1e-6)
    sig_a = sig_a * scale
    sig_s = sig_s * scale
    sig_t = sig_a + sig_s
    rho = sig_s / jnp.maximum(sig_t, 1e-9)
    eta = mats.eta[mid]
    return sig_t, rho, eta


def _pdf_sp(table, sig_t, rho, d_local, n_local):
    """Area-measure pdf of sampling the exit point, MIS over the 3 probe
    axes x 3 channels (bssrdf.rs pdf_sp, :240-272). d_local/n_local are
    the entry-frame coordinates of (po - pi) and the exit normal."""
    # projected radii on the three axis planes (bssrdf.rs:252-255)
    r_proj = jnp.stack([
        jnp.sqrt(d_local[..., 1] ** 2 + d_local[..., 2] ** 2),
        jnp.sqrt(d_local[..., 2] ** 2 + d_local[..., 0] ** 2),
        jnp.sqrt(d_local[..., 0] ** 2 + d_local[..., 1] ** 2)], axis=-1)
    axis_prob = jnp.asarray([0.25, 0.25, 0.5], Float)   # ss, ts, ns
    ch_prob = 1.0 / 3.0
    pdf = jnp.zeros(d_local.shape[:-1], Float)
    for ax in range(3):
        r = jnp.maximum(r_proj[..., ax], 1e-6)
        for ch in range(3):
            # radius pdf in r-measure -> area measure / (2 pi r)
            pdf_r = _pdf_sr(table, sig_t[..., ch], rho[..., ch], r)
            pdf = pdf + jnp.abs(n_local[..., ax]) * axis_prob[ax] * ch_prob \
                * pdf_r / (2.0 * PI * r)
    return pdf


def _pdf_sr(table, sig_t_c, rho_c, r):
    """pdf (r-measure) that sample_radius produced `r` for one channel:
    profile(rho, r*sig_t)/rho_eff(rho) * sig_t (bssrdf.rs pdf_sr)."""
    n_rho = table.rho_samples.shape[0]
    i_rho = jnp.clip(jnp.searchsorted(table.rho_samples, rho_c) - 1, 0, n_rho - 2)
    r_opt = r * sig_t_c
    n_r = table.radius_samples.shape[0]
    i_r = jnp.clip(jnp.searchsorted(table.radius_samples, r_opt) - 1, 0, n_r - 2)
    f_r = (r_opt - table.radius_samples[i_r]) / jnp.maximum(
        table.radius_samples[i_r + 1] - table.radius_samples[i_r], 1e-9)
    f_r = jnp.clip(f_r, 0.0, 1.0)
    prof = (1 - f_r) * table.profile[i_rho, i_r] + f_r * table.profile[i_rho, i_r + 1]
    return jnp.maximum(prof, 0.0) / jnp.maximum(table.rho_eff[i_rho], 1e-9) * sig_t_c


def sample_exit(scene, hit, frame, u_axch, u_r, u_phi, u_pick, is_sss):
    """Sample the subsurface exit point for lanes flagged `is_sss`.

    Returns (exit_hit, sp_weight (N,3), ok (N,), eta (N,)): exit_hit is a
    Hit at the sampled exit point (same material), sp_weight =
    Sp / pdf_sp / P(chain pick), ok marks lanes whose probe found a
    valid exit."""
    mats = scene.materials
    table = mats.sss_table
    sig_t, rho, eta = _sss_params(mats, hit.material_id)

    # ---- probe frame: axis choice permutes (ss, ts, ns) (bssrdf.rs:150-166)
    ss, ts, ns = frame.t, frame.b, frame.n
    u = u_axch
    # u < .5 -> ns (remap u*2); < .75 -> ss; else ts
    pick_ns = u < 0.5
    pick_ss = (u >= 0.5) & (u < 0.75)
    vz = jnp.where(pick_ns[..., None], ns, jnp.where(pick_ss[..., None], ss, ts))
    vx = jnp.where(pick_ns[..., None], ss, jnp.where(pick_ss[..., None], ts, ns))
    vy = vm.cross(vz, vx)
    axis_pdf = jnp.where(pick_ns, 0.5, 0.25)

    # ---- channel + radius (bssrdf.rs:168-178)
    u_ch = jnp.where(pick_ns, u * 2.0, jnp.where(pick_ss, (u - 0.5) * 4.0,
                                                 (u - 0.75) * 4.0))
    ch = jnp.clip((u_ch * 3.0).astype(Int), 0, 2)
    sig_t_c = jnp.take_along_axis(sig_t, ch[..., None], axis=-1)[..., 0]
    rho_c = jnp.take_along_axis(rho, ch[..., None], axis=-1)[..., 0]
    r, _ = bssr.sample_radius(table, sig_t_c, rho_c, u_r)
    r_max, _ = bssr.sample_radius(table, sig_t_c, rho_c,
                                  jnp.full(u_r.shape, 0.999, Float))
    ok = is_sss & (r > 0.0) & (r < r_max)
    phi = 2.0 * PI * u_phi

    # ---- probe segment (bssrdf.rs:180-196)
    half_l = jnp.sqrt(jnp.maximum(r_max * r_max - r * r, 0.0))
    base = hit.p + r[..., None] * (jnp.cos(phi)[..., None] * vx
                                   + jnp.sin(phi)[..., None] * vy)
    p_start = base + half_l[..., None] * vz
    probe_len = 2.0 * half_l

    # bounded chain: up to PROBE_CHAIN closest-hit probes, keeping hits
    # on the same material
    hits = []
    o_probe = p_start
    t_left = probe_len
    for _ in range(PROBE_CHAIN):
        h = scenemod.intersect(scene, o_probe, -vz,
                               t_min=jnp.full(r.shape, 1e-4, Float),
                               t_max=t_left, active=ok)
        match = h.valid & (h.material_id == hit.material_id)
        hits.append((h, match))
        o_probe = o_probe - vz * (h.t[..., None] + 1e-4)
        t_left = jnp.maximum(t_left - h.t - 1e-4, 0.0)

    n_found = sum(m.astype(Int) for _, m in hits)
    ok = ok & (n_found > 0)
    pick = jnp.minimum((u_pick * n_found.astype(Float)).astype(Int),
                       n_found - 1)
    # select the pick-th matching hit
    rank = jnp.zeros_like(n_found)
    exit_hit = hits[0][0]
    import jax
    for h, m in hits:
        sel = ok & m & (rank == pick)
        exit_hit = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                sel.reshape(sel.shape + (1,) * (old.ndim - sel.ndim)), new, old),
            h, exit_hit)
        rank = rank + m.astype(Int)

    # ---- Sp / pdf_sp (bssrdf.rs:216-272)
    dvec = hit.p - exit_hit.p
    r_exit = vm.length(dvec)
    sp = bssr.sr(table, sig_t, rho, r_exit)
    d_local = jnp.stack([vm.dot(ss, dvec), vm.dot(ts, dvec), vm.dot(ns, dvec)],
                        axis=-1)
    n_local = jnp.stack([vm.dot(ss, exit_hit.ns), vm.dot(ts, exit_hit.ns),
                         vm.dot(ns, exit_hit.ns)], axis=-1)
    pdf = _pdf_sp(table, sig_t, rho, d_local, n_local)
    pdf = pdf / jnp.maximum(n_found.astype(Float), 1.0)
    sp_w = sp / jnp.maximum(pdf, 1e-12)[..., None]
    ok = ok & (pdf > 0.0) & (jnp.max(sp, axis=-1) > 0.0)
    return exit_hit, jnp.where(ok[..., None], sp_w, 0.0), ok, eta


def sw_nee(scene, lights, exit_hit, eta, lt, u_light, active):
    """MIS NEE at the subsurface exit point with the Sw lobe as the
    scattering function (path.rs:182-190: estimate_direct over the
    reconstructed Sw BSDF). Returns ld (N,3), not selection-pmf-divided."""
    from ..lights import lights as lightsmod
    from ..core.sampling import power_heuristic
    from ..core.types import SHADOW_EPS

    ls = lightsmod.sample_li(lights, scene, lt, exit_hit.p, u_light,
                             scene.world_radius)
    cos_wi = vm.dot(ls["wi"], exit_hit.ns)
    f = sw_eval(eta, cos_wi) * jnp.abs(cos_wi)
    pdf_sw = jnp.maximum(cos_wi, 0.0) / PI          # cosine-lobe counterpart
    usable = active & (ls["pdf"] > 0.0) & (f > 0.0) & (cos_wi > 0.0)
    o_sh = vm.offset_ray_origin(exit_hit.p, exit_hit.ns, ls["wi"])
    t_max = ls["dist"] * (1.0 - 1e-3)
    occ = scenemod.occluded(scene, o_sh, ls["wi"],
                            t_max=jnp.maximum(t_max, SHADOW_EPS), active=usable)
    w_l = jnp.where(ls["is_delta"], 1.0,
                    power_heuristic(1.0, ls["pdf"], 1.0, pdf_sw))
    contrib = ls["li"] * (f * w_l / jnp.maximum(ls["pdf"], 1e-12))[..., None]
    return jnp.where((usable & ~occ)[..., None], contrib, 0.0)


def sw_eval(eta, cos_theta):
    """Directional exit lobe f = Sw(w) (bssrdf.rs:100-112); pdf is the
    cosine hemisphere around the exit normal."""
    return bssr.sw(eta, jnp.abs(cos_theta))


def sw_sample(exit_hit, eta, u2):
    """Cosine-sample the exit lobe. Returns (wi (N,3), weight (N,) =
    f |cos| / pdf = Sw * pi, pdf (N,))."""
    ns = exit_hit.ns
    t = vm.normalize(exit_hit.dpdu - vm.dot(exit_hit.dpdu, ns)[..., None] * ns)
    b = vm.cross(ns, t)
    w_l = cosine_sample_hemisphere(u2)
    wi = w_l[..., 0:1] * t + w_l[..., 1:2] * b + w_l[..., 2:3] * ns
    cos_t = jnp.maximum(w_l[..., 2], 1e-6)
    pdf = cos_t / PI
    weight = sw_eval(eta, cos_t) * PI
    return wi, weight, pdf
