"""Realistic (lens-stack) camera: thick-lens focusing and an
end-to-end render through the camera dispatch (VERDICT r3 #6 —
realistic.rs:27-483 as a reachable capability)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.cameras import realistic as rc
from pbrt_tpu.core import transform as tf
from pbrt_tpu.core import vecmath as vm


def _cam(focus=2.0, res=(32, 32)):
    c2w = tf.look_at(np.array([0.0, 0.0, 3.0]), np.array([0.0, 0.0, 0.0]),
                     np.array([0.0, 1.0, 0.0]))
    return rc.make_realistic(c2w, rc.DEMO_LENS, res, focus_distance=focus)


def _film_spot(cam, obj_z, n=512, pupil_frac=0.5):
    """Trace rays from the on-axis object point at `obj_z` through the
    pupil; return RMS film-spot radius (m) and pass fraction."""
    r = np.random.RandomState(0)
    zf = float(np.asarray(cam.z_front)[0])
    ap = float(np.asarray(cam.aperture_radius)[0]) * pupil_frac
    xy = (r.rand(n, 2) * 2 - 1) * ap
    src = jnp.asarray(np.tile([[0.0, 0.0, obj_z]], (n, 1)), jnp.float32)
    aim = jnp.asarray(np.concatenate([xy, np.full((n, 1), zf)], -1), jnp.float32)
    d = vm.normalize(aim - src)
    ok, o, dd = rc._trace_lenses_from_scene(cam, src, d)
    t = (0.0 - o[:, 2]) / dd[:, 2]
    pf = np.asarray(o + t[:, None] * dd)[np.asarray(ok)][:, :2]
    return float(np.sqrt((pf ** 2).sum(1)).mean()), float(np.asarray(ok).mean())


def test_thick_lens_focus():
    """The autofocused stack images the focus plane to a tight spot; a
    point off the focus plane blurs, and refocusing there sharpens it
    (realistic.rs:240-300 focus_thick_lens behavior)."""
    cam2 = _cam(focus=2.0)
    spot_in, frac = _film_spot(cam2, -2.0)
    spot_out, _ = _film_spot(cam2, -0.5)
    assert frac > 0.9
    assert spot_in < 3e-4                      # sub-0.3mm spot on 35mm film
    assert spot_out > 2.0 * spot_in            # defocus visibly blurs
    cam05 = _cam(focus=0.5)
    spot_re, _ = _film_spot(cam05, -0.5)
    assert spot_re < 3e-4


def test_exit_pupil_nonempty_and_bounded():
    cam = _cam()
    ep = np.asarray(cam.exit_pupil)
    rear = float(np.asarray(cam.aperture_radius)[-1])
    assert (ep[:, 2] >= ep[:, 0]).all() and (ep[:, 3] >= ep[:, 1]).all()
    assert (np.abs(ep) <= rear + 1e-6).all()


def test_realistic_camera_renders_cornell():
    """End-to-end: the realistic camera goes through the shared
    generate_rays(_weighted) dispatch and produces a sane image."""
    from scenes.cornell import cornell_spheres
    from pbrt_tpu.integrate import driver, path
    from pbrt_tpu.core import samplers as smp

    scene = cornell_spheres()
    # camera inside the box looking at the back wall; scene units are
    # meters-ish — the demo lens focuses at 2.5
    c2w = tf.look_at(np.array([0.0, 1.0, 2.9]), np.array([0.0, 1.0, 0.0]),
                     np.array([0.0, 1.0, 0.0]))
    cam = rc.make_realistic(c2w, rc.DEMO_LENS, (24, 24), focus_distance=2.5)
    cfg = driver.RenderConfig(width=24, height=24, spp=4,
                              sampler=smp.SamplerConfig(kind="stratified", spp=4))
    img = np.asarray(driver.render(scene, cam, cfg, path.make_li(cfg)))
    assert np.isnan(img).sum() == 0
    assert img.mean() > 0.02                   # not black
    assert np.isfinite(img).all()
