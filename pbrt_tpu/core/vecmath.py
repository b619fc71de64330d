"""Batched 3-vector math over `(..., 3)` arrays.

TPU-native counterpart of the reference's Vector/Point/Normal types
(reference: src/core/geometry.rs:316-1222). Instead of AoS structs we keep
everything as SoA-friendly trailing-3 arrays; every function broadcasts
over arbitrary leading (wavefront) axes.
"""
from __future__ import annotations

import jax.numpy as jnp

from .types import PI, safe_sqrt


def vec(x, y, z, dtype=jnp.float32):
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)), axis=-1)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def absdot(a, b):
    return jnp.abs(dot(a, b))


def cross(a, b):
    return jnp.cross(a, b)


def length_squared(v):
    return dot(v, v)


def length(v):
    return jnp.sqrt(length_squared(v))


def distance(a, b):
    return length(a - b)


def distance_squared(a, b):
    return length_squared(a - b)


def normalize(v):
    return v / jnp.maximum(length(v)[..., None], 1e-20)


def face_forward(n, v):
    """Flip n to lie in the hemisphere of v (geometry.rs face_forward)."""
    return jnp.where(dot(n, v)[..., None] < 0.0, -n, n)


def reflect(wo, n):
    return -wo + 2.0 * dot(wo, n)[..., None] * n


def refract(wi, n, eta):
    """Refract wi about n with relative IOR eta = eta_i/eta_t.

    Returns (ok, wt). `wi` points away from the surface (PBRT convention,
    reference: src/core/reflection.rs:104-121)."""
    cos_theta_i = dot(n, wi)
    sin2_theta_i = jnp.maximum(0.0, 1.0 - cos_theta_i * cos_theta_i)
    sin2_theta_t = eta * eta * sin2_theta_i
    ok = sin2_theta_t < 1.0
    cos_theta_t = safe_sqrt(1.0 - sin2_theta_t)
    wt = eta[..., None] * (-wi) + (eta * cos_theta_i - cos_theta_t)[..., None] * n
    return ok, wt


def coordinate_system(v1):
    """Build an orthonormal frame around unit v1 (branch-free Duff et al.,
    replacing the sign-branching variant in geometry.rs)."""
    s = jnp.where(v1[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + v1[..., 2])
    b = v1[..., 0] * v1[..., 1] * a
    v2 = jnp.stack([1.0 + s * v1[..., 0] * v1[..., 0] * a, s * b, -s * v1[..., 0]], axis=-1)
    v3 = jnp.stack([b, s + v1[..., 1] * v1[..., 1] * a, -v1[..., 1]], axis=-1)
    return v2, v3


def spherical_direction(sin_theta, cos_theta, phi):
    return jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1)


def spherical_direction_in_frame(sin_theta, cos_theta, phi, x, y, z):
    return (sin_theta * jnp.cos(phi))[..., None] * x + \
           (sin_theta * jnp.sin(phi))[..., None] * y + cos_theta[..., None] * z


def spherical_theta(v):
    return jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))


def spherical_phi(v):
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0.0, p + 2.0 * PI, p)


def to_local(v, t, b, n):
    """World direction → shading-local (z = n) coordinates."""
    return jnp.stack([dot(v, t), dot(v, b), dot(v, n)], axis=-1)


def to_world(v, t, b, n):
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


def offset_ray_origin(p, n, d):
    """Offset a spawned ray origin along the normal to avoid
    self-intersection (reference: src/core/geometry.rs:1139-1155; we use a
    scale-aware epsilon instead of exact FP error bounds)."""
    eps = 1e-4 * jnp.maximum(1.0, jnp.max(jnp.abs(p), axis=-1))
    off = jnp.where(dot(d, n) < 0.0, -eps, eps)
    return p + off[..., None] * n


def max_component(v):
    return jnp.max(v, axis=-1)


def min_component(v):
    return jnp.min(v, axis=-1)
