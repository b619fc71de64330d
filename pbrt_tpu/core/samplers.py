"""Stateless samplers.

TPU-native counterpart of src/core/sampler.rs + src/samplers/. The
reference's samplers are mutable per-pixel state machines behind
`Arc<RwLock>` (sampler.rs:125-249); ours are pure functions

    u = sample(cfg, pixel_id, sample_index, dim)

so every lane of a wavefront draws its own dimensions with no state, the
CPU oracle reproduces streams bitwise, and path replay is free.

Sampler kinds (src/samplers/*):
  random      — PCG-hash uniform (random.rs)
  stratified  — jittered strata with per-pixel stratum shuffle (stratified.rs)
  zerotwo     — Owen-scrambled (0,2)-sequence, Sobol dims 0/1 (zerotwosequence.rs)
  maxmin      — alias of zerotwo (maxmin.rs's special matrices are a
                quality tweak of the same (0,2) construction)
  halton      — scrambled Halton; per-pixel digit scrambling replaces the
                reference's CRT global-index arithmetic (halton.rs:25-156)
  sobol       — Owen-scrambled global Sobol' (sobol.rs — `todo!()` in the
                reference; ours is complete)

`dim` may be traced. Dimension layout convention used by integrators:
dims 0-1 film xy, 2-3 lens, 4 time, then 7 dims per bounce.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .types import Float, ONE_MINUS_EPSILON
from .rng import uniform_float, hash_combine, pcg_hash
from . import lowdiscrepancy as ld

KINDS = ("random", "stratified", "zerotwo", "maxmin", "halton", "sobol")


class SamplerConfig(NamedTuple):
    kind: str = "random"     # static (python) — chosen at trace time
    spp: int = 16            # samples per pixel (static)
    seed: int = 0
    jitter: bool = True


def _kensler_mix(x, p, w):
    """One round of Kensler's in-place hash permutation network
    (Correlated Multi-Jittered Sampling, Pixar TM 13-01), masked to the
    pow2 window w+1 ≥ n. Bijective on [0, w]."""
    x = x ^ p
    x = x * jnp.uint32(0xE170893D)
    x = x ^ (p >> jnp.uint32(16))
    x = x ^ ((x & w) >> jnp.uint32(4))
    x = x ^ (p >> jnp.uint32(8))
    x = x * jnp.uint32(0x0929EB3F)
    x = x ^ (p >> jnp.uint32(23))
    x = x ^ ((x & w) >> jnp.uint32(1))
    x = x * (jnp.uint32(1) | (p >> jnp.uint32(27)))
    x = x * jnp.uint32(0x6935FA69)
    x = x ^ ((x & w) >> jnp.uint32(11))
    x = x * jnp.uint32(0x74DCB303)
    x = x ^ ((x & w) >> jnp.uint32(2))
    x = x * jnp.uint32(0x9E501CC3)
    x = x ^ ((x & w) >> jnp.uint32(2))
    x = x * jnp.uint32(0xC860A3DF)
    x = x & w
    return x ^ (x >> jnp.uint32(5))


def _perm_element(i, n, seed):
    """Stateless PERMUTATION of [0,n): Kensler cycle-walking hash
    (replaces the round-1 hash-offset rotation, whose stratum visitation
    order was correlated across pixels — every pixel walked strata in the
    same cyclic order). Expected <2 walk steps per lane; the walk runs as
    one whole-array while_loop."""
    i, seed = jnp.broadcast_arrays(jnp.asarray(i, jnp.uint32),
                                   jnp.asarray(seed, jnp.uint32))
    if n <= 1:
        return jnp.zeros_like(i)
    w = np.uint32(1)
    while w < n:
        w = np.uint32(w << 1)
    w = jnp.uint32(w - 1)
    nn = jnp.uint32(n)
    x = _kensler_mix(i, seed, w)
    x = jax.lax.while_loop(
        lambda x: jnp.any(x >= nn),
        lambda x: jnp.where(x >= nn, _kensler_mix(x, seed, w), x),
        x)
    return (x + seed) % nn


def sample_1d(cfg: SamplerConfig, pixel_id, sample_idx, dim):
    """One U[0,1) per lane. pixel_id: uint32 array; sample_idx: int array
    or scalar; dim: static int or traced int array."""
    pixel_id = jnp.asarray(pixel_id, jnp.uint32)
    sample_idx = jnp.asarray(sample_idx, jnp.uint32)
    dim_u = jnp.asarray(dim, jnp.uint32)
    seed = jnp.uint32(cfg.seed)
    if cfg.kind == "random":
        return uniform_float(seed, pixel_id, sample_idx, dim_u)
    if cfg.kind == "stratified":
        n = jnp.uint32(cfg.spp)
        stratum = _perm_element(sample_idx, cfg.spp, hash_combine(seed, pixel_id, dim_u))
        j = uniform_float(seed, pixel_id, sample_idx, dim_u) if cfg.jitter else 0.5
        return jnp.minimum((stratum.astype(Float) + j) / cfg.spp, ONE_MINUS_EPSILON)
    if cfg.kind in ("zerotwo", "maxmin"):
        scr = hash_combine(seed, pixel_id, dim_u)
        return ld.sobol_sample(sample_idx, 0, scramble_seed=scr)
    if cfg.kind == "sobol":
        scr = hash_combine(seed, pixel_id, dim_u)
        d = jnp.minimum(dim_u, jnp.uint32(ld.NUM_SOBOL_DIMENSIONS - 1)).astype(jnp.int32)
        return ld.sobol_sample(sample_idx, d, scramble_seed=scr)
    if cfg.kind == "halton":
        scr = hash_combine(seed, pixel_id)
        d = jnp.minimum(dim_u, jnp.uint32(999)).astype(jnp.int32)
        return ld.scrambled_radical_inverse(d, sample_idx, scr)
    raise ValueError(f"unknown sampler kind {cfg.kind!r}")


def sample_2d(cfg: SamplerConfig, pixel_id, sample_idx, dim):
    """Two U[0,1) per lane, shape (..., 2). Uses dims (dim, dim+1)."""
    pixel_id = jnp.asarray(pixel_id, jnp.uint32)
    sample_idx = jnp.asarray(sample_idx, jnp.uint32)
    dim_u = jnp.asarray(dim, jnp.uint32)
    seed = jnp.uint32(cfg.seed)
    if cfg.kind == "stratified":
        # Factor spp into an nx×ny grid for true 2D stratification
        # (stratified.rs:13-60 semantics, stateless).
        nx = int(np.floor(np.sqrt(cfg.spp)))
        while cfg.spp % nx:
            nx -= 1
        ny = cfg.spp // nx
        stratum = _perm_element(sample_idx, cfg.spp, hash_combine(seed, pixel_id, dim_u))
        sx = (stratum % jnp.uint32(nx)).astype(Float)
        sy = (stratum // jnp.uint32(nx)).astype(Float)
        if cfg.jitter:
            jx = uniform_float(seed, pixel_id, sample_idx, dim_u)
            jy = uniform_float(seed, pixel_id, sample_idx, dim_u + jnp.uint32(1))
        else:
            jx = jy = 0.5
        u = jnp.minimum((sx + jx) / nx, ONE_MINUS_EPSILON)
        v = jnp.minimum((sy + jy) / ny, ONE_MINUS_EPSILON)
        return jnp.stack([u, v], axis=-1)
    if cfg.kind in ("zerotwo", "maxmin"):
        # Proper (0,2)-net: Sobol dims 0 and 1 share the index; the pair
        # gets one Owen scramble pair per (pixel, dim-slot).
        scr0 = hash_combine(seed, pixel_id, dim_u, jnp.uint32(0))
        scr1 = hash_combine(seed, pixel_id, dim_u, jnp.uint32(1))
        u = ld.sobol_sample(sample_idx, 0, scramble_seed=scr0)
        v = ld.sobol_sample(sample_idx, 1, scramble_seed=scr1)
        return jnp.stack([u, v], axis=-1)
    u = sample_1d(cfg, pixel_id, sample_idx, dim_u)
    v = sample_1d(cfg, pixel_id, sample_idx, dim_u + jnp.uint32(1))
    return jnp.stack([u, v], axis=-1)


# Dimension layout helpers (shared by integrators & oracle) --------------
DIM_FILM = 0          # 2D: film jitter
DIM_LENS = 2          # 2D: lens
DIM_TIME = 4          # 1D: shutter time
DIM_BOUNCE0 = 5       # first per-bounce block
DIMS_PER_BOUNCE = 8   # slots: 0-1 bsdf u2, 2 lobe u1, 3-4 light u2,
#                              5 light-select u1, 6 rr u1, 7 phase/medium u1


def bounce_dim(bounce, slot):
    """Dimension index for `slot` within `bounce` (either may be traced)."""
    return DIM_BOUNCE0 + bounce * DIMS_PER_BOUNCE + slot
