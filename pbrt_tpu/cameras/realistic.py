"""Realistic (lens-system) camera.

TPU-native counterpart of src/cameras/realistic.rs:27-483: a stack of
spherical lens elements traced element-by-element, thick-lens focusing,
and exit-pupil importance sampling. Element tracing is a statically
unrolled per-element loop over the wavefront (each element: one sphere
intersection + refraction — branch-free), so `generate_rays` stays one
fused program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Float, PI, quadratic, safe_sqrt
from ..core import transform as tf
from ..core import vecmath as vm
from ..core.sampling import concentric_sample_disk


class RealisticCamera(NamedTuple):
    camera_to_world: tf.Transform
    # per element, film-side last (realistic.rs element tables):
    curvature_radius: jnp.ndarray   # (E,)
    thickness: jnp.ndarray          # (E,)
    eta: jnp.ndarray                # (E,)
    aperture_radius: jnp.ndarray    # (E,)
    z_front: jnp.ndarray            # (E,) element z positions (film at z=0)
    film_diag: jnp.ndarray
    exit_pupil: jnp.ndarray         # (P, 4) bounds per film-radius bin
    shutter_open: jnp.ndarray
    shutter_close: jnp.ndarray
    res_wh: jnp.ndarray             # (2,) [w, h] as f32 (jit-safe)
    resolution: tuple


def make_realistic(camera_to_world, lens_elements, resolution, film_diag=0.035,
                   focus_distance=2.0, aperture_scale=1.0,
                   shutter_open=0.0, shutter_close=1.0):
    """lens_elements: list of (curvature_radius_m, thickness_m, eta,
    aperture_diameter_m), front-to-back (realistic.rs:40-80)."""
    el = np.asarray(lens_elements, np.float64)
    curv = el[:, 0]
    thick = el[:, 1]
    eta = np.where(el[:, 2] == 0, 1.0, el[:, 2])
    ap = el[:, 3] * 0.5 * aperture_scale
    # film at z=0; elements stacked towards -z (scene side)
    z = np.zeros(len(el))
    acc = 0.0
    for i in range(len(el) - 1, -1, -1):
        acc -= thick[i]
        z[i] = acc

    cam = RealisticCamera(
        camera_to_world=camera_to_world,
        curvature_radius=jnp.asarray(curv, Float),
        thickness=jnp.asarray(thick, Float),
        eta=jnp.asarray(eta, Float),
        aperture_radius=jnp.asarray(ap, Float),
        z_front=jnp.asarray(z, Float),
        film_diag=jnp.asarray(film_diag, Float),
        exit_pupil=jnp.zeros((1, 4), Float),
        shutter_open=jnp.asarray(shutter_open, Float),
        shutter_close=jnp.asarray(shutter_close, Float),
        res_wh=jnp.asarray([resolution[1], resolution[0]], Float),
        resolution=tuple(resolution))
    cam = _focus(cam, focus_distance)
    cam = cam._replace(exit_pupil=_compute_exit_pupil(cam))
    return cam


def _surface_media(cam, i):
    """(film-side eta, scene-side eta) of surface i. Lens tables use the
    pbrt .dat convention: row i's eta is the medium BETWEEN surfaces i
    and i+1 (the film side of surface i); the scene side of surface i is
    row i-1's medium (air before the front surface)."""
    film_eta = cam.eta[i]
    scene_eta = cam.eta[i - 1] if i > 0 else jnp.ones((), Float)
    return film_eta, scene_eta


def _trace_element(cam, i, o, d, ok, from_film):
    """One element interaction (intersect + aperture clip + refract),
    shared by both trace directions (realistic.rs:120-210)."""
    r = cam.curvature_radius[i]
    z_el = cam.z_front[i]
    is_stop = r == 0.0
    zc = z_el + r                              # sphere center
    oc = o - jnp.array([0.0, 0.0, 1.0], Float) * zc
    a = vm.dot(d, d)
    b = 2.0 * vm.dot(oc, d)
    c = vm.dot(oc, oc) - r * r
    has, t0, t1 = quadratic(a, b, c)
    # root on the correct side of the element vertex:
    # closer root iff (d.z > 0) XOR (r < 0) (realistic.rs:150-170)
    use_closer = (d[..., 2] > 0) ^ (r < 0)
    t_sph = jnp.where(use_closer, t0, t1)
    t_stop = (z_el - o[..., 2]) / jnp.where(jnp.abs(d[..., 2]) > 1e-9,
                                            d[..., 2], 1e-9)
    t = jnp.where(is_stop, t_stop, t_sph)
    elem_ok = jnp.where(is_stop, jnp.abs(d[..., 2]) > 1e-9, has & (t > 0))
    p = o + t[..., None] * d
    r2 = p[..., 0] ** 2 + p[..., 1] ** 2
    elem_ok = elem_ok & (r2 <= cam.aperture_radius[i] ** 2)
    n_vec = vm.normalize(p - jnp.array([0.0, 0.0, 1.0], Float) * zc)
    n_vec = vm.face_forward(n_vec, -d)
    film_eta, scene_eta = _surface_media(cam, i)
    eta_i, eta_t = (film_eta, scene_eta) if from_film else (scene_eta, film_eta)
    refr_ok, wt = vm.refract(-d, n_vec,
                             jnp.broadcast_to(eta_i / eta_t, o.shape[:-1]))
    d_new = jnp.where(is_stop, d, jnp.where(refr_ok[..., None], wt, d))
    elem_ok = elem_ok & jnp.where(is_stop, True, refr_ok)
    o = jnp.where(elem_ok[..., None], p, o)
    d = jnp.where(elem_ok[..., None], vm.normalize(d_new), d)
    return ok & elem_ok, o, d


def _trace_lenses_from_film(cam, o, d):
    """Trace rays (film side, toward -z) through the element stack
    (realistic.rs trace_lenses_from_film). Returns (ok, o, d)."""
    n_el = cam.curvature_radius.shape[0]
    ok = jnp.ones(o.shape[:-1], bool)
    for i in range(n_el - 1, -1, -1):
        ok, o, d = _trace_element(cam, i, o, d, ok, from_film=True)
    return ok, o, d


def _trace_lenses_from_scene(cam, o, d):
    """Scene-side trace (rays toward +z / the film) — realistic.rs
    trace_lenses_from_scene; used by focusing and `we`."""
    n_el = cam.curvature_radius.shape[0]
    ok = jnp.ones(o.shape[:-1], bool)
    for i in range(n_el):
        ok, o, d = _trace_element(cam, i, o, d, ok, from_film=False)
    return ok, o, d


def _axial_crossing(cam, focus_distance):
    """z where near-axis rays from the on-axis object point at
    -focus_distance cross the axis after the lens (host-side float)."""
    x = 0.05 * float(np.min(np.asarray(cam.aperture_radius)))
    z0 = -float(focus_distance)
    zf = float(np.asarray(cam.z_front)[0])
    o = jnp.asarray([[0.0, 0.0, z0], [0.0, 0.0, z0]], Float)
    aim = jnp.asarray([[x * 0.5, 0.0, zf], [x, 0.0, zf]], Float)
    d = vm.normalize(aim - o)
    ok, oo, dd = _trace_lenses_from_scene(cam, o, d)
    if not bool(jnp.all(ok)):
        raise ValueError("lens stack does not pass near-axis rays; "
                         "check the element table")
    t = -oo[:, 0] / dd[:, 0]
    z_cross = oo[:, 2] + t * dd[:, 2]
    return float(jnp.mean(z_cross))


def _focus(cam, focus_distance):
    """Thick-lens autofocus (realistic.rs:240-300 semantics): shift the
    whole stack along z until the on-axis object point at
    `focus_distance` images onto the film (z = 0). A stack shift moves
    the axial crossing by exactly the same amount for the exit segment,
    so a couple of fixed-point steps converge to machine precision."""
    for _ in range(3):
        z_cross = _axial_crossing(cam, focus_distance)
        cam = cam._replace(z_front=cam.z_front - z_cross)
    return cam


def _compute_exit_pupil(cam, n_bins=32, n_samples=512):
    """Exit-pupil bounds per film-radius bin (realistic.rs:320-380):
    sample points on the rear element, keep those that trace through."""
    rear_r = cam.aperture_radius[-1]
    rear_z = cam.z_front[-1]
    half_diag = cam.film_diag * 0.5
    bounds = []
    key_r = np.random.RandomState(11)
    for b in range(n_bins):
        r_film = (b + 0.5) / n_bins * half_diag
        xy = (key_r.rand(n_samples, 2) * 2 - 1) * float(rear_r)
        o = jnp.asarray(np.stack([np.full(n_samples, float(r_film)),
                                  np.zeros(n_samples), np.zeros(n_samples)], -1), Float)
        target = jnp.asarray(np.concatenate([xy, np.full((n_samples, 1), float(rear_z))], -1), Float)
        d = vm.normalize(target - o)
        ok, _, _ = _trace_lenses_from_film(cam, o, d)
        okn = np.asarray(ok)
        if okn.any():
            xs = xy[okn, 0]
            ys = xy[okn, 1]
            bounds.append([xs.min(), ys.min(), xs.max(), ys.max()])
        else:
            bounds.append([-float(rear_r), -float(rear_r), float(rear_r), float(rear_r)])
    return jnp.asarray(np.asarray(bounds, np.float32))


def generate_rays(cam: RealisticCamera, pfilm, u_lens, u_time):
    """Batched raygen through the lens stack. Returns (o, d, time, ok)."""
    w, h = cam.res_wh[0], cam.res_wh[1]
    half_diag = cam.film_diag * 0.5
    aspect = jnp.sqrt(w / h)
    fw = half_diag * aspect * 2.0
    fh = half_diag / aspect * 2.0
    # film point: physical image inversion happens through the lens; the
    # trailing 180-deg y-rotation to the shared +z camera convention
    # absorbs the usual film-x negation (realistic.rs film mapping)
    x = (pfilm[..., 0] / w - 0.5) * fw
    y = (pfilm[..., 1] / h - 0.5) * fh
    o_film = jnp.stack([x, y, jnp.zeros_like(x)], axis=-1)

    # sample a point in the exit-pupil bounds for this film radius
    r_film = jnp.sqrt(x * x + y * y)
    n_bins = cam.exit_pupil.shape[0]
    bidx = jnp.clip((r_film / half_diag * n_bins).astype(jnp.int32), 0, n_bins - 1)
    bb = cam.exit_pupil[bidx]
    px = bb[..., 0] + u_lens[..., 0] * (bb[..., 2] - bb[..., 0])
    py = bb[..., 1] + u_lens[..., 1] * (bb[..., 3] - bb[..., 1])
    # rotate pupil sample to the film point's azimuth
    phi = jnp.arctan2(y, x)
    c, s = jnp.cos(phi), jnp.sin(phi)
    pxr = c * px - s * py
    pyr = s * px + c * py
    rear_z = cam.z_front[-1]
    p_rear = jnp.stack([pxr, pyr, jnp.broadcast_to(rear_z, x.shape)], axis=-1)
    d = vm.normalize(p_rear - o_film)
    ok, o_out, d_out = _trace_lenses_from_film(cam, o_film, d)
    # internal lens space puts the scene at -z; the shared camera-space
    # convention (perspective camera, camera_to_world) looks down +z.
    # Rotate 180 deg about y (proper rotation; the lens is rotationally
    # symmetric): (x, y, z) -> (-x, y, -z).
    flip = jnp.asarray([-1.0, 1.0, -1.0], Float)
    o_w = cam.camera_to_world.apply_point(o_out * flip)
    d_w = vm.normalize(cam.camera_to_world.apply_vector(d_out * flip))
    time = cam.shutter_open + u_time * (cam.shutter_close - cam.shutter_open)
    return o_w, d_w, time, ok


# a simple double-gauss-ish demo lens (meters)
DEMO_LENS = [
    (0.0291, 0.00396, 1.67, 0.0253),
    (1.2563, 0.000127, 1.0, 0.0253),
    (0.0171, 0.00908, 1.67, 0.023),
    (-0.0396, 0.00176, 1.699, 0.0206),
    (0.0129, 0.00611, 1.0, 0.0177),
    (0.0, 0.00343, 0.0, 0.0095),      # aperture stop
    (-0.0134, 0.00196, 1.603, 0.0169),
    (0.0284, 0.00793, 1.658, 0.0191),
    (-0.0276, 0.000127, 1.0, 0.0191),
    (0.0796, 0.00518, 1.717, 0.0206),
    (-0.0514, 0.0450, 1.0, 0.0206),    # rear air gap = back focal distance
]
