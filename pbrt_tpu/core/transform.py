"""4x4 transforms, quaternions and animated transforms.

TPU-native counterpart of src/core/transform.rs and quaternion.rs. A
Transform is a NamedTuple of (m, m_inv) so it is a pytree (differentiable
camera/object poses are just leaves). Application functions broadcast over
`(..., 3)` point/vector/normal batches.

The reference's `scale()` builds a wrong matrix (transform.rs:427-432);
we implement correct PBRT-v3 semantics (noted deviation).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .types import Float
from . import vecmath as vm


class Transform(NamedTuple):
    m: jnp.ndarray      # (..., 4, 4)
    m_inv: jnp.ndarray  # (..., 4, 4)

    def inverse(self):
        return Transform(self.m_inv, self.m)

    def __matmul__(self, other: "Transform"):
        return Transform(self.m @ other.m, other.m_inv @ self.m_inv)

    def apply_point(self, p):
        r = jnp.einsum("...ij,...j->...i", self.m[..., :3, :3], p) + self.m[..., :3, 3]
        w = jnp.einsum("...j,...j->...", self.m[..., 3, :3], p) + self.m[..., 3, 3]
        return r / w[..., None]

    def apply_vector(self, v):
        return jnp.einsum("...ij,...j->...i", self.m[..., :3, :3], v)

    def apply_normal(self, n):
        # Normals transform by the inverse transpose (transform.rs:600-616).
        return jnp.einsum("...ji,...j->...i", self.m_inv[..., :3, :3], n)

    def apply_ray(self, o, d):
        return self.apply_point(o), self.apply_vector(d)

    def swaps_handedness(self):
        return jnp.linalg.det(self.m[..., :3, :3]) < 0.0


def identity():
    m = jnp.eye(4, dtype=Float)
    return Transform(m, m)


def from_matrix(m):
    m = jnp.asarray(m, Float)
    return Transform(m, jnp.linalg.inv(m))


def translate(delta):
    delta = jnp.asarray(delta, Float)
    m = jnp.eye(4, dtype=Float).at[:3, 3].set(delta)
    mi = jnp.eye(4, dtype=Float).at[:3, 3].set(-delta)
    return Transform(m, mi)


def scale(s):
    s = jnp.broadcast_to(jnp.asarray(s, Float), (3,))
    m = jnp.diag(jnp.concatenate([s, jnp.ones((1,), Float)]))
    mi = jnp.diag(jnp.concatenate([1.0 / s, jnp.ones((1,), Float)]))
    return Transform(m, mi)


def rotate_x(theta_deg):
    t = jnp.deg2rad(jnp.asarray(theta_deg, Float))
    c, s = jnp.cos(t), jnp.sin(t)
    m = jnp.array([[1, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1]], dtype=Float)
    m = m.at[1, 1].set(c).at[1, 2].set(-s).at[2, 1].set(s).at[2, 2].set(c)
    return Transform(m, m.T)


def rotate_y(theta_deg):
    t = jnp.deg2rad(jnp.asarray(theta_deg, Float))
    c, s = jnp.cos(t), jnp.sin(t)
    m = jnp.array([[0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1]], dtype=Float)
    m = m.at[0, 0].set(c).at[0, 2].set(s).at[2, 0].set(-s).at[2, 2].set(c)
    return Transform(m, m.T)


def rotate_z(theta_deg):
    t = jnp.deg2rad(jnp.asarray(theta_deg, Float))
    c, s = jnp.cos(t), jnp.sin(t)
    m = jnp.array([[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], dtype=Float)
    m = m.at[0, 0].set(c).at[0, 1].set(-s).at[1, 0].set(s).at[1, 1].set(c)
    return Transform(m, m.T)


def rotate(theta_deg, axis):
    """Rotation about an arbitrary axis (transform.rs:480-520)."""
    a = vm.normalize(jnp.asarray(axis, Float))
    t = jnp.deg2rad(jnp.asarray(theta_deg, Float))
    s, c = jnp.sin(t), jnp.cos(t)
    x, y, z = a[0], a[1], a[2]
    m3 = jnp.array([
        [c + x * x * (1 - c), x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
        [x * y * (1 - c) + z * s, c + y * y * (1 - c), y * z * (1 - c) - x * s],
        [x * z * (1 - c) - y * s, y * z * (1 - c) + x * s, c + z * z * (1 - c)],
    ], dtype=Float)
    m = jnp.eye(4, dtype=Float).at[:3, :3].set(m3)
    return Transform(m, m.T)


def look_at(pos, look, up):
    """camera→world transform (transform.rs:522-552)."""
    pos = jnp.asarray(pos, Float)
    look = jnp.asarray(look, Float)
    up = jnp.asarray(up, Float)
    dir_ = vm.normalize(look - pos)
    right = vm.normalize(vm.cross(vm.normalize(up), dir_))
    new_up = vm.cross(dir_, right)
    c2w = jnp.stack([
        jnp.concatenate([right, jnp.zeros((1,), Float)]),
        jnp.concatenate([new_up, jnp.zeros((1,), Float)]),
        jnp.concatenate([dir_, jnp.zeros((1,), Float)]),
        jnp.concatenate([pos, jnp.ones((1,), Float)]),
    ], axis=1)
    return Transform(c2w, jnp.linalg.inv(c2w))


def orthographic(z_near, z_far):
    m = jnp.eye(4, dtype=Float).at[2, 2].set(1.0 / (z_far - z_near)).at[2, 3].set(-z_near / (z_far - z_near))
    return Transform(m, jnp.linalg.inv(m))


def perspective(fov_deg, n, f):
    """Perspective projection (transform.rs:554-567)."""
    persp = jnp.array([
        [1, 0, 0, 0],
        [0, 1, 0, 0],
        [0, 0, f / (f - n), -f * n / (f - n)],
        [0, 0, 1, 0],
    ], dtype=Float)
    inv_tan = 1.0 / jnp.tan(jnp.deg2rad(jnp.asarray(fov_deg, Float)) / 2.0)
    s = scale(jnp.array([inv_tan, inv_tan, 1.0]))
    return s @ Transform(persp, jnp.linalg.inv(persp))


# ------------------------------------------------------------ quaternion

def quat_from_matrix(m):
    """Rotation matrix (...,4,4) → quaternion (x,y,z,w) (quaternion.rs:96-160)."""
    t = jnp.trace(m[..., :3, :3], axis1=-2, axis2=-1)
    # Branch-free Shepperd's method via where-select of four candidates.
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    qw = jnp.sqrt(jnp.maximum(1.0 + t, 1e-12)) / 2.0
    qx = (m[..., 2, 1] - m[..., 1, 2]) / (4.0 * qw)
    qy = (m[..., 0, 2] - m[..., 2, 0]) / (4.0 * qw)
    qz = (m[..., 1, 0] - m[..., 0, 1]) / (4.0 * qw)
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def quat_to_matrix(q):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    m3 = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)
    m = jnp.zeros(q.shape[:-1] + (4, 4), Float)
    m = m.at[..., :3, :3].set(m3).at[..., 3, 3].set(1.0)
    return m


def slerp(t, q0, q1):
    """Spherical linear interpolation (quaternion.rs:31-50)."""
    cos_theta = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(cos_theta[..., None] < 0.0, -q1, q1)
    cos_theta = jnp.abs(cos_theta)
    near = cos_theta > 0.9995
    # linear fallback near parallel
    lin = vm.normalize((1 - t) * q0 + t * q1)
    theta = jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0))
    thetap = theta * t
    qperp = vm.normalize(q1 - q0 * cos_theta[..., None])
    sl = q0 * jnp.cos(thetap)[..., None] + qperp * jnp.sin(thetap)[..., None]
    return jnp.where(near[..., None], lin, sl)


class AnimatedTransform(NamedTuple):
    """Two-keyframe rigid animation via decompose + slerp
    (transform.rs:853-2084; we interpolate T/R/S rather than tabulating
    motion-derivative bounds — bounds come from sampled interpolation).
    """
    start: Transform
    end: Transform
    t0: jnp.ndarray
    t1: jnp.ndarray

    def interpolate(self, time):
        dt = jnp.clip((time - self.t0) / jnp.maximum(self.t1 - self.t0, 1e-9), 0.0, 1.0)
        # Decompose: translation is the last column; rotation via quats
        # (uniform-scale scenes; full polar decomposition deferred).
        tr = (1 - dt)[..., None] * self.start.m[..., :3, 3] + dt[..., None] * self.end.m[..., :3, 3]
        q0 = quat_from_matrix(self.start.m)
        q1 = quat_from_matrix(self.end.m)
        q = slerp(dt, q0, q1)
        m = quat_to_matrix(q)
        m = m.at[..., :3, 3].set(tr)
        return Transform(m, jnp.linalg.inv(m))
