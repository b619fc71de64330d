#!/usr/bin/env python
"""Per-path reciprocity audit of the depth-1 BDPT strategy triplet:
for ONE geometric path x0->x1->x2 (camera, floor, light) compute each
strategy's claimed density ratios and check r_AB * r_BA == 1.
CPU backend."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from scenes.cornell import cornell_spheres, cornell_camera
from pbrt_tpu.integrate import bdpt, common
from pbrt_tpu.integrate.bdpt import convert_density, _vertex_pdf, _remap0
from pbrt_tpu.core import samplers as smp
from pbrt_tpu.core import vecmath as vm
from pbrt_tpu.core.types import Float, PI
from pbrt_tpu.lights import lights as lightsmod
from pbrt_tpu.lights.distrib import power_distribution
from pbrt_tpu.cameras import camera_pdf_we, camera_sample_wi

RES = 8


def main():
    scene = cornell_spheres()
    cam = cornell_camera((RES, RES))
    lights = scene.lights
    power_dist = power_distribution(lights, scene.world_radius)
    hw = RES * RES
    cfg = bdpt.BDPTConfig(width=RES, height=RES, spp=1, max_depth=1,
                          sampler=smp.SamplerConfig(kind="random", spp=1))
    pid = jnp.arange(hw, dtype=jnp.uint32)
    sid = jnp.zeros(hw, jnp.uint32)
    px = (pid % jnp.uint32(RES)).astype(Float) + 0.5
    py = (pid // jnp.uint32(RES)).astype(Float) + 0.5
    pfilm = jnp.stack([px, py], axis=-1)
    cpath_full = bdpt.generate_camera_subpath(scene, cam, cfg, pid, sid, pfilm, 3)
    cpath, cam_o, cam_d = cpath_full

    # NEE light sample from x1 (t=2 vertex)
    u_l = smp.sample_2d(cfg.sampler, pid, sid, 777)
    lt = jnp.zeros(hw, jnp.int32) + int(np.argmax(np.asarray(
        (lights.kind == lightsmod.LIGHT_AREA_TRI) |
        (lights.kind == lightsmod.LIGHT_AREA_SPHERE))))
    pmf_uni = jnp.ones(hw, Float) / jnp.maximum(lights.count, 1)
    x1 = cpath.p[:, 1]
    ls = lightsmod.sample_li(lights, scene, lt, x1, u_l, scene.world_radius)
    x2 = ls["p_light"]
    ngl = bdpt._light_normal_towards(ls)

    ok = cpath.valid[:, 1] & (cpath.vtype[:, 1] == bdpt.VTX_SURFACE) & (ls["pdf"] > 0)
    i = int(np.argmax(np.asarray(ok)))
    print("lane", i, "x1", np.asarray(x1[i]), "x2", np.asarray(x2[i]))

    # shared quantities
    A = float(lights.total_area[int(lt[0])])
    porigin = float(pmf_uni[i]) / A                     # area density of light point
    pcam_x1 = float(cpath.pdf_fwd[i, 1])                # camera area density at x1
    # light emission toward x1: cos at light / pi, converted to area at x1
    w21 = vm.normalize(x1 - x2)
    cosl = vm.absdot(w21, ngl)
    ple_x1 = float(convert_density(cosl / PI, x2, x1, cpath.ng[:, 1])[i])
    # bsdf x1->x2 area density at x2
    pbsdf_x2 = float(convert_density(
        _vertex_pdf(scene, cpath, 1, cpath.p[:, 0], x2), x1, x2, ngl)[i])
    # NEE area density of x2: ls["pdf"] is solid angle at x1 -> area
    pnee_x2_area = float(convert_density(ls["pdf"], x1, x2, ngl)[i])

    print(f"A={A:.4f} porigin={porigin:.4f} pnee_area={pnee_x2_area:.4f} "
          f"(should equal porigin)")
    print(f"pcam(x1)={pcam_x1:.4f} ple(x1)={ple_x1:.4f} pbsdf(x2)={pbsdf_x2:.4f}")

    # true density products (x0 delta -> factor 1)
    p12 = pcam_x1 * porigin
    p21 = porigin * ple_x1
    p03 = pcam_x1 * pbsdf_x2
    print(f"p03={p03:.5f} p12={p12:.5f} p21={p21:.5f}")
    print(f"true shares: w03={p03/(p03+p12+p21):.4f} w12={p12/(p03+p12+p21):.4f} "
          f"w21={p21/(p03+p12+p21):.4f}")

    # ---- what the code computes ----
    # (1,2): overrides
    qs_rev_12 = convert_density(
        _vertex_pdf(scene, cpath, 1, cpath.p[:, 0], x2), x1, x2, ngl)
    cos_l12 = vm.absdot(ls["wi"], ngl)
    pt_rev_s1 = convert_density(jnp.maximum(cos_l12, 1e-6) / PI, x2, x1,
                                cpath.ng[:, 1])
    sampled_l = bdpt._sampled_light_path(bdpt._empty_path(hw, 2), lights, ls,
                                         lt, pmf_uni)
    r_c_12 = float((_remap0(pt_rev_s1) / _remap0(cpath.pdf_fwd[:, 1]))[i])
    r_l_12 = float((_remap0(qs_rev_12) / _remap0(sampled_l.pdf_fwd[:, 0]))[i])
    print(f"(1,2): r_c (claims p21/p12) = {r_c_12:.5f}  truth {p21/p12:.5f}")
    print(f"(1,2): r_l (claims p03/p12) = {r_l_12:.5f}  truth {p03/p12:.5f}")

    # (2,1): build lpath bookkeeping for the same path
    u_lens2 = jnp.zeros((hw, 2), Float) + 0.5
    wi_c, we, pdf_c, p_raster, p_lens = camera_sample_wi(cam, x1, u_lens2)
    _, cam_pdf_dir = camera_pdf_we(cam, p_lens, -wi_c)
    qs_rev_21 = convert_density(jnp.maximum(cam_pdf_dir, 0.0), p_lens, x1,
                                cpath.ng[:, 1])
    # light subpath's own pdf_fwd at x1
    pdf_fwd1_l = convert_density(cosl / PI, x2, x1, cpath.ng[:, 1])
    qsm_rev_21 = convert_density(
        _vertex_pdf(scene, cpath, 1, p_lens, x2), x1, x2, ngl)
    r1_21 = float((_remap0(qs_rev_21) / _remap0(pdf_fwd1_l))[i])
    r0_21 = r1_21 * float((_remap0(qsm_rev_21) / _remap0(jnp.full(hw, porigin)))[i])
    print(f"(2,1): r1 (claims p12/p21) = {r1_21:.5f}  truth {p12/p21:.5f}")
    print(f"(2,1): r0 (claims p03/p21) = {r0_21:.5f}  truth {p03/p21:.5f}")
    print(f"reciprocity r_c_12*r1_21 = {r_c_12*r1_21:.5f} (should be 1)")

    # (0,3) bookkeeping needs a cpath that actually hit the light; skip —
    # the (1,2)/(2,1) pair is the suspected break.
    print(f"camera pdf check: pdf_fwd[1]={pcam_x1:.5f} "
          f"qs_rev_21={float(qs_rev_21[i]):.5f} (should be equal)")
    print(f"pdf_c (SampleWi lens pdf) = {float(pdf_c[i]):.5f} (pinhole: ?)")


if __name__ == "__main__":
    main()
