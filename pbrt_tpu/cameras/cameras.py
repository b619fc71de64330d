"""Cameras: batched ray generation + importance sampling.

TPU-native counterpart of src/core/camera.rs and src/cameras/. Ray
generation is a pure map over film sample positions — no per-ray state,
differentiable w.r.t. the camera pose/fov (pytree leaves). Perspective
camera includes thin-lens depth of field and the `we`/`pdf_we`/`sample_wi`
importance functions needed by BDPT t=1 strategies
(src/cameras/perspective.rs:20-286).

Ray differentials use analytic per-pixel offsets (camera.rs:25-62 uses
finite differences; analytic is exact and free here).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.types import Float, PI, INF
from ..core import transform as tf
from ..core import vecmath as vm
from ..core.sampling import concentric_sample_disk


class PerspectiveCamera(NamedTuple):
    camera_to_world: tf.Transform
    raster_to_camera: tf.Transform
    lens_radius: jnp.ndarray
    focal_distance: jnp.ndarray
    shutter_open: jnp.ndarray
    shutter_close: jnp.ndarray
    area: jnp.ndarray           # film area in camera space at z=1 (for we)
    resolution: tuple           # static (h, w)


class OrthographicCamera(NamedTuple):
    camera_to_world: tf.Transform
    raster_to_camera: tf.Transform
    lens_radius: jnp.ndarray
    focal_distance: jnp.ndarray
    shutter_open: jnp.ndarray
    shutter_close: jnp.ndarray
    resolution: tuple


class EnvironmentCamera(NamedTuple):
    camera_to_world: tf.Transform
    shutter_open: jnp.ndarray
    shutter_close: jnp.ndarray
    resolution: tuple


def _screen_window(h, w):
    aspect = w / h
    if aspect > 1.0:
        return (-aspect, aspect, -1.0, 1.0)
    return (-1.0, 1.0, -1.0 / aspect, 1.0 / aspect)


def _raster_to_screen(h, w):
    x0, x1, y0, y1 = _screen_window(h, w)
    s = tf.scale(jnp.array([1.0 / w, 1.0 / h, 1.0]))
    flip = tf.scale(jnp.array([x1 - x0, y0 - y1, 1.0]))
    t = tf.translate(jnp.array([x0, y1, 0.0]))
    return t @ flip @ s


def make_perspective(camera_to_world, fov_deg, resolution, lens_radius=0.0,
                     focal_distance=1e6, shutter_open=0.0, shutter_close=1.0):
    h, w = resolution
    cam2screen = tf.perspective(fov_deg, 1e-2, 1000.0)
    raster_to_camera = cam2screen.inverse() @ _raster_to_screen(h, w)
    # film-plane area at z=1 for importance (perspective.rs:97-112)
    x0, x1, y0, y1 = _screen_window(h, w)
    tan_half = jnp.tan(jnp.deg2rad(jnp.asarray(fov_deg, Float)) / 2.0)
    area = jnp.abs((x1 - x0) * (y1 - y0)) * tan_half * tan_half
    return PerspectiveCamera(
        camera_to_world=camera_to_world,
        raster_to_camera=raster_to_camera,
        lens_radius=jnp.asarray(lens_radius, Float),
        focal_distance=jnp.asarray(focal_distance, Float),
        shutter_open=jnp.asarray(shutter_open, Float),
        shutter_close=jnp.asarray(shutter_close, Float),
        area=area,
        resolution=(h, w),
    )


def make_orthographic(camera_to_world, resolution, lens_radius=0.0,
                      focal_distance=1e6, shutter_open=0.0, shutter_close=1.0):
    h, w = resolution
    cam2screen = tf.orthographic(0.0, 1.0)
    raster_to_camera = cam2screen.inverse() @ _raster_to_screen(h, w)
    return OrthographicCamera(camera_to_world, raster_to_camera,
                              jnp.asarray(lens_radius, Float),
                              jnp.asarray(focal_distance, Float),
                              jnp.asarray(shutter_open, Float),
                              jnp.asarray(shutter_close, Float), (h, w))


def make_environment(camera_to_world, resolution, shutter_open=0.0, shutter_close=1.0):
    return EnvironmentCamera(camera_to_world,
                             jnp.asarray(shutter_open, Float),
                             jnp.asarray(shutter_close, Float), tuple(resolution))


def cone_start(camera):
    """(width0, spread) of the pixel ray cone — the compact TPU-native
    stand-in for per-ray differentials (camera.rs:25-62 generates dx/dy
    rays; a cone carries the same footprint information in 2 scalars,
    which the mip LOD consumes via Hit.uv_scale)."""
    h, w = camera.resolution
    x0, x1, y0, y1 = _screen_window(h, w)
    if isinstance(camera, PerspectiveCamera):
        tan_half = jnp.sqrt(camera.area / jnp.abs((x1 - x0) * (y1 - y0)))
        return jnp.zeros((), Float), (y1 - y0) * tan_half / h
    if isinstance(camera, OrthographicCamera):
        return jnp.asarray((y1 - y0) / h, Float), jnp.zeros((), Float)
    return jnp.zeros((), Float), jnp.asarray(PI / h, Float)


def generate_rays_weighted(camera, pfilm, u_lens, u_time):
    """Batched ray generation with a per-ray weight: 1 for the analytic
    cameras, the lens-stack vignetting indicator for RealisticCamera
    (realistic.rs:200-230 returns weight 0 for rays the element stack
    rejects). Returns (o, d, time, weight)."""
    from . import realistic as realmod
    if isinstance(camera, realmod.RealisticCamera):
        o, d, time, ok = realmod.generate_rays(camera, pfilm, u_lens, u_time)
        return o, d, time, ok.astype(Float)
    o, d, time = generate_rays(camera, pfilm, u_lens, u_time)
    return o, d, time, jnp.ones(pfilm.shape[:-1], Float)


def generate_rays(camera, pfilm, u_lens, u_time):
    """Batched ray generation.

    pfilm: (..., 2) continuous raster positions; u_lens: (..., 2);
    u_time: (...,). Returns (o, d, time) with o/d (..., 3) world-space.
    (Use generate_rays_weighted for cameras that can reject rays.)
    """
    from . import realistic as realmod
    if isinstance(camera, realmod.RealisticCamera):
        o, d, time, _ok = realmod.generate_rays(camera, pfilm, u_lens, u_time)
        return o, d, time
    time = camera.shutter_open + u_time * (camera.shutter_close - camera.shutter_open)
    if isinstance(camera, EnvironmentCamera):
        h, w = camera.resolution
        theta = PI * pfilm[..., 1] / h
        phi = 2.0 * PI * pfilm[..., 0] / w
        d_cam = jnp.stack([jnp.sin(theta) * jnp.cos(phi), jnp.cos(theta),
                           jnp.sin(theta) * jnp.sin(phi)], axis=-1)
        o_cam = jnp.zeros_like(d_cam)
        o, d = camera.camera_to_world.apply_point(o_cam), camera.camera_to_world.apply_vector(d_cam)
        return o, vm.normalize(d), time

    p_raster = jnp.concatenate([pfilm, jnp.zeros_like(pfilm[..., :1])], axis=-1)
    p_cam = camera.raster_to_camera.apply_point(p_raster)
    if isinstance(camera, PerspectiveCamera):
        o_cam = jnp.zeros_like(p_cam)
        d_cam = vm.normalize(p_cam)
    else:  # orthographic
        o_cam = p_cam
        d_cam = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], Float), p_cam.shape)

    # thin-lens DOF (perspective.rs:150-170)
    def with_lens(o_cam, d_cam):
        p_lens = camera.lens_radius * concentric_sample_disk(u_lens)
        ft = camera.focal_distance / jnp.maximum(d_cam[..., 2], 1e-8)
        p_focus = o_cam + ft[..., None] * d_cam
        o2 = jnp.concatenate([p_lens, o_cam[..., 2:3]], axis=-1)
        d2 = vm.normalize(p_focus - o2)
        return o2, d2

    # Always evaluate the lens path; select by lens_radius > 0 (traced-safe).
    o_l, d_l = with_lens(o_cam, d_cam)
    use_lens = camera.lens_radius > 0.0
    o_cam = jnp.where(use_lens, o_l, o_cam)
    d_cam = jnp.where(use_lens, d_l, d_cam)

    o = camera.camera_to_world.apply_point(o_cam)
    d = vm.normalize(camera.camera_to_world.apply_vector(d_cam))
    return o, d, time


def camera_we(camera: PerspectiveCamera, o, d):
    """Importance We(ray) and raster position (perspective.rs:188-235).
    Returns (we (...,), praster (..., 2), valid)."""
    c2w = camera.camera_to_world
    cos_theta = vm.dot(d, c2w.apply_vector(jnp.array([0.0, 0.0, 1.0], Float)))
    valid = cos_theta > 0.0
    ct = jnp.maximum(cos_theta, 1e-6)
    focus_t = jnp.where(camera.lens_radius > 0.0, camera.focal_distance, 1.0) / ct
    p_focus = o + focus_t[..., None] * d
    p_cam = c2w.inverse().apply_point(p_focus)
    p_cam = p_cam / jnp.maximum(p_cam[..., 2:3], 1e-8)
    p_raster = camera.raster_to_camera.inverse().apply_point(p_cam)
    h, w = camera.resolution
    inside = (p_raster[..., 0] >= 0) & (p_raster[..., 0] < w) & \
             (p_raster[..., 1] >= 0) & (p_raster[..., 1] < h)
    valid = valid & inside
    lens_area = jnp.where(camera.lens_radius > 0.0,
                          PI * camera.lens_radius ** 2, 1.0)
    we = 1.0 / (camera.area * lens_area * ct ** 4)
    return jnp.where(valid, we, 0.0), p_raster[..., :2], valid


def camera_pdf_we(camera: PerspectiveCamera, o, d):
    """(pdf_pos, pdf_dir) of sample_we (perspective.rs:237-259)."""
    we, _, valid = camera_we(camera, o, d)
    c2w = camera.camera_to_world
    cos_theta = jnp.maximum(vm.dot(d, c2w.apply_vector(jnp.array([0.0, 0.0, 1.0], Float))), 1e-6)
    lens_area = jnp.where(camera.lens_radius > 0.0, PI * camera.lens_radius ** 2, 1.0)
    pdf_pos = 1.0 / lens_area
    pdf_dir = 1.0 / (camera.area * cos_theta ** 3)
    return jnp.where(valid, pdf_pos, 0.0), jnp.where(valid, pdf_dir, 0.0)


def camera_sample_wi(camera: PerspectiveCamera, p_ref, u_lens):
    """Sample a direction from p_ref to the camera lens (perspective.rs
    sample_wi, used by BDPT t=1). Returns (wi, we, pdf, p_raster, p_lens_world)."""
    p_lens = camera.lens_radius * concentric_sample_disk(u_lens)
    p_lens_world = camera.camera_to_world.apply_point(
        jnp.concatenate([p_lens, jnp.zeros_like(p_lens[..., :1])], axis=-1))
    wi = p_lens_world - p_ref
    dist = vm.length(wi)
    wi = wi / jnp.maximum(dist[..., None], 1e-8)
    lens_area = jnp.where(camera.lens_radius > 0.0, PI * camera.lens_radius ** 2, 1.0)
    normal = camera.camera_to_world.apply_vector(jnp.array([0.0, 0.0, 1.0], Float))
    cos = jnp.abs(vm.dot(normal, -wi))
    pdf = (dist * dist) / jnp.maximum(cos * lens_area, 1e-12)
    we, p_raster, valid = camera_we(camera, p_lens_world, -wi)
    return wi, jnp.where(valid, we, 0.0), jnp.where(valid, pdf, 0.0), p_raster, p_lens_world
