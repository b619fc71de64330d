"""Counter-based stateless RNG.

Replaces the reference's mutable PCG32 stream (src/core/rng.rs:5-98) with a
pure hash: every uniform variate is a function of a 32-bit key tuple
(seed, pixel, sample index, dimension). This gives
  * exact replay for path-replay backprop,
  * bitwise-identical streams between the numpy oracle and the TPU path
    (both evaluate the same u32 integer hash),
  * no cross-lane state: perfectly vectorisable and shardable.

The mix function is the PCG output permutation applied to a Weyl-sequence
input (O'Neill's pcg32 hash specialised to stateless use).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .types import ONE_MINUS_EPSILON

_PCG_MULT = np.uint32(747796405)
_PCG_INC = np.uint32(2891336453)


def _u32(x):
    return jnp.asarray(x).astype(jnp.uint32)


def pcg_hash(x):
    """uint32 → uint32 mix (pcg output permutation RXS-M-XS)."""
    x = _u32(x)
    state = x * _PCG_MULT + _PCG_INC
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


def hash_combine(*keys):
    """Fold several uint32 keys into one (boost-style combine)."""
    h = _u32(keys[0])
    for k in keys[1:]:
        h = pcg_hash(h ^ (_u32(k) + jnp.uint32(0x9E3779B9) + (h << jnp.uint32(6)) + (h >> jnp.uint32(2))))
    return h


def uniform_u32(*keys):
    return pcg_hash(hash_combine(*keys))


def uniform_float(*keys):
    """U[0, 1) from integer keys; broadcasts over array-valued keys."""
    bits = uniform_u32(*keys)
    return jnp.minimum((bits >> jnp.uint32(8)).astype(jnp.float32) * np.float32(1.0 / (1 << 24)),
                       ONE_MINUS_EPSILON)


# numpy mirrors (used by the CPU oracle so streams match bitwise) ---------

def np_pcg_hash(x):
    x = np.asarray(x, np.uint32)
    with np.errstate(over="ignore"):
        state = x * _PCG_MULT + _PCG_INC
        word = ((state >> ((state >> np.uint32(28)) + np.uint32(4))) ^ state) * np.uint32(277803737)
    return (word >> np.uint32(22)) ^ word


def np_hash_combine(*keys):
    h = np.asarray(keys[0], np.uint32)
    with np.errstate(over="ignore"):
        for k in keys[1:]:
            k = np.asarray(k, np.uint32)
            h = np_pcg_hash(h ^ (k + np.uint32(0x9E3779B9) + (h << np.uint32(6)) + (h >> np.uint32(2))))
    return h


def np_uniform_float(*keys):
    bits = np_pcg_hash(np_hash_combine(*keys))
    return np.minimum((bits >> np.uint32(8)).astype(np.float32) * np.float32(1.0 / (1 << 24)),
                      np.float32(1.0 - np.finfo(np.float32).eps / 2))
