"""Global numeric policy and constants.

TPU-native counterpart of the reference's scalar utility layer
(reference: src/core/pbrt.rs:8-292). We standardise on float32 compute
(f32 is the TPU VPU native width; f64 is software-emulated) and replace
the reference's EFloat running-error machinery (src/core/efloat.rs) with
conservative epsilon offsets — interval arithmetic is anti-vectorisation
and unnecessary at f32 with robust ray offsets.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

Float = jnp.float32
Int = jnp.int32
UInt = jnp.uint32

PI = np.float32(np.pi)
INV_PI = np.float32(1.0 / np.pi)
INV_2PI = np.float32(1.0 / (2.0 * np.pi))
INV_4PI = np.float32(1.0 / (4.0 * np.pi))
PI_OVER_2 = np.float32(np.pi / 2.0)
PI_OVER_4 = np.float32(np.pi / 4.0)
SQRT_2 = np.float32(np.sqrt(2.0))

INF = np.float32(np.inf)
MACHINE_EPSILON = np.float32(np.finfo(np.float32).eps * 0.5)
# One-sided ulp-scale bound used for shadow-ray epsilon and t_max padding
# (replaces reference gamma() bounds, src/core/pbrt.rs:89-92).
SHADOW_EPS = np.float32(1e-4)
RAY_EPS = np.float32(1e-4)

MAX_FLOAT = np.float32(np.finfo(np.float32).max)
ONE_MINUS_EPSILON = np.float32(np.nextafter(np.float32(1.0), np.float32(0.0)))


def lerp(t, a, b):
    return (1.0 - t) * a + t * b


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def sqr(x):
    return x * x


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def safe_div(a, b, out=0.0):
    """a/b with 0 (or `out`) where b == 0 — keeps kernels NaN-free."""
    return jnp.where(b != 0.0, a / jnp.where(b != 0.0, b, 1.0), out)


def quadratic(a, b, c):
    """Stable quadratic solve. Returns (has_solution, t0, t1), t0 <= t1.

    Mirrors the reference's EFloat::quadratic semantics
    (src/core/efloat.rs:63) without interval tracking: the discriminant is
    computed in f64-free Kahan style adequate for f32 scene scales.
    """
    disc = b * b - 4.0 * a * c
    has = disc >= 0.0
    sqrt_disc = safe_sqrt(disc)
    q = jnp.where(b < 0.0, -0.5 * (b - sqrt_disc), -0.5 * (b + sqrt_disc))
    t0 = safe_div(q, a, out=INF)
    t1 = safe_div(c, q, out=INF)
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    return has, lo, hi


def find_interval(cdf, x):
    """Index i such that cdf[..., i] <= x < cdf[..., i+1], clamped to a
    valid interval (reference: src/core/pbrt.rs:223-243). `cdf` is sorted
    along the last axis; `x` has the batch shape of cdf[..., 0]."""
    n = cdf.shape[-1]
    # Comparison-sum instead of searchsorted: O(n) but branch-free, batched
    # over leading axes, and maps onto the VPU as a single reduction.
    idx = jnp.sum((cdf <= x[..., None]).astype(jnp.int32), axis=-1) - 1
    return jnp.clip(idx, 0, n - 2)
