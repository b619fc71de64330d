"""Low-discrepancy sequences: radical inverse, Halton, Sobol'.

TPU-native counterpart of src/core/lowdiscrepancy.rs + sobolmatrices.rs.

Instead of shipping the reference's 60k-line table of Joe–Kuo direction
numbers (src/core/sobolmatrices.rs), we *generate* Sobol' direction
matrices at import time: primitive polynomials over GF(2) are found by
order-checking x in GF(2)[x]/(p), and direction numbers follow the
standard recurrence with deterministic pseudo-random (valid) initial
values. Any valid initialisation yields a digital (t,s)-sequence with the
same equidistribution guarantees; randomised quality is restored by
per-dimension Owen scrambling (Laine–Karras hash), which the reference
lacks entirely (its Sobol sampler is `todo!()`, src/samplers/sobol.rs:56).

Evaluation is stateless: sample(index, dim) — a 32-step XOR fold, fully
vectorised over wavefront axes, identical in numpy (oracle) and jnp (TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .types import Float, ONE_MINUS_EPSILON
from .rng import pcg_hash, hash_combine

NUM_SOBOL_DIMENSIONS = 160
SOBOL_BITS = 32


# ---------------------------------------------------------- GF(2) helpers

def _polymulmod(a, b, mod, d):
    """Multiply bit-polynomials a*b mod `mod` (degree d)."""
    r = 0
    top = 1 << d
    while b:
        if b & 1:
            r ^= a
        b >>= 1
        a <<= 1
        if a & top:
            a ^= mod
    return r


def _prime_factors(n):
    fs = set()
    f = 2
    while f * f <= n:
        while n % f == 0:
            fs.add(f)
            n //= f
        f += 1
    if n > 1:
        fs.add(n)
    return fs


def _x_order_is_maximal(poly, d):
    """True iff x has order 2^d-1 in GF(2)[x]/(poly) — i.e. poly primitive
    (given poly irreducible; maximal order implies irreducible too)."""
    n = (1 << d) - 1

    def x_pow(e):
        r, base = 1, 2  # 1, x
        while e:
            if e & 1:
                r = _polymulmod(r, base, poly, d)
            base = _polymulmod(base, base, poly, d)
            e >>= 1
        return r

    if x_pow(n) != 1:
        return False
    return all(x_pow(n // q) != 1 for q in _prime_factors(n))


def _primitive_polynomials(count):
    """First `count` primitive polynomials over GF(2), ordered by degree.
    Each is returned as (degree, coefficient bitmask incl. leading term)."""
    out = []
    d = 1
    while len(out) < count:
        # candidates: x^d + ... + 1 (constant term required for primitivity)
        for mid in range(1 << max(d - 1, 0)):
            poly = (1 << d) | (mid << 1) | 1
            if d == 1:
                poly = 0b11 if mid == 0 else None  # x + 1 only
                if poly is None:
                    continue
            if _x_order_is_maximal(poly, d):
                out.append((d, poly))
                if len(out) >= count:
                    break
        d += 1
    return out


@functools.lru_cache(maxsize=None)
def sobol_matrices(n_dims=NUM_SOBOL_DIMENSIONS):
    """(n_dims, 32) uint32 direction vectors v_k (MSB-aligned)."""
    v = np.zeros((n_dims, SOBOL_BITS), np.uint32)
    # Dimension 0: van der Corput — identity generator matrix.
    for k in range(SOBOL_BITS):
        v[0, k] = np.uint32(1) << np.uint32(31 - k)
    rng = np.random.RandomState(0x5060B)
    polys = _primitive_polynomials(n_dims - 1)
    for j, (d, poly) in enumerate(polys, start=1):
        a = [(poly >> (d - i)) & 1 for i in range(1, d)]  # a_1..a_{d-1}
        m = np.zeros(SOBOL_BITS + 1, np.uint64)
        m[1] = 1  # canonical m_1; any odd < 2 works only as 1
        for k in range(2, d + 1):
            m[k] = np.uint64(2 * rng.randint(0, 1 << (k - 1)) + 1)  # odd, < 2^k
        for k in range(d + 1, SOBOL_BITS + 1):
            acc = m[k - d] ^ np.uint64((1 << d)) * m[k - d]
            for i in range(1, d):
                if a[i - 1]:
                    acc ^= np.uint64(1 << i) * m[k - i]
            m[k] = acc
        for k in range(1, SOBOL_BITS + 1):
            v[j, k - 1] = np.uint32(m[k] << np.uint64(SOBOL_BITS - k))
    return v


# ------------------------------------------------------------- evaluation

def _sobol_u32_np(index, dim_vectors):
    index = np.asarray(index, np.uint32)
    out = np.zeros_like(index)
    for k in range(SOBOL_BITS):
        bit = (index >> np.uint32(k)) & np.uint32(1)
        out ^= np.where(bit.astype(bool), dim_vectors[k], np.uint32(0))
    return out


def sobol_u32(index, dim):
    """Sobol' sample bits: XOR-fold of direction vectors selected by the
    set bits of `index`. `dim` may be a static int or a traced int array
    (broadcasting with `index`); `index` is batched uint32."""
    vall = jnp.asarray(sobol_matrices())            # (D, 32) const
    v = vall[jnp.asarray(dim, jnp.int32)]           # (..., 32)
    index = jnp.asarray(index).astype(jnp.uint32)
    index, _ = jnp.broadcast_arrays(index, jnp.zeros(v.shape[:-1], jnp.uint32))

    def body(k, acc):
        bit = (index >> k.astype(jnp.uint32)) & jnp.uint32(1)
        return acc ^ jnp.where(bit == 1, v[..., k], jnp.uint32(0))

    return jax.lax.fori_loop(0, SOBOL_BITS, body, jnp.zeros_like(index))


def owen_scramble_u32(x, seed):
    """Hash-based Owen scrambling (Laine–Karras / Burley 2020 style):
    a per-bit nested scramble approximated by the LK permutation on
    bit-reversed input. seed broadcasts with x (uint32)."""
    x = jnp.asarray(x).astype(jnp.uint32)
    seed = jnp.asarray(seed).astype(jnp.uint32)
    x = _reverse_bits32(x)
    x = x + seed
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return _reverse_bits32(x)


def _reverse_bits32(x):
    x = ((x & jnp.uint32(0x55555555)) << 1) | ((x >> 1) & jnp.uint32(0x55555555))
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x >> 2) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
    return (x << 16) | (x >> 16)


def u32_to_unit_float(bits):
    return jnp.minimum(bits.astype(jnp.float32) * np.float32(2.3283064365386963e-10),
                       ONE_MINUS_EPSILON)


def sobol_sample(index, dim, scramble_seed=None):
    """Owen-scrambled Sobol' sample in [0,1). `dim` static int."""
    bits = sobol_u32(index, dim)
    if scramble_seed is not None:
        bits = owen_scramble_u32(bits, scramble_seed)
    return u32_to_unit_float(bits)


# ------------------------------------------------------------- max-min

@functools.lru_cache(maxsize=None)
def maxmin_matrix(m):
    """Generator matrix (32 MSB-aligned uint32 direction vectors) for
    the y component of an n = 2^m max-min-distance point set
    {(i/n, C·i)} — the MaxMinDist sampler's special matrices
    (maxmin.rs:15-105, tables at lowdiscrepancy.rs:171). The reference
    ships precomputed search results; we regenerate the capability by
    hill-climbing the minimum toroidal distance from the (0,2) Sobol'
    matrix (which it strictly improves on for every m used)."""
    assert 1 <= m <= 10
    n = 1 << m
    idx = np.arange(n, dtype=np.uint32)
    x = idx.astype(np.float64) / n
    dx = np.abs(x[:, None] - x[None, :])
    dx = np.minimum(dx, 1.0 - dx) ** 2
    big = np.eye(n) * 4.0

    def points(vrows):
        y = np.zeros(n, np.uint32)
        for k in range(m):
            bit = ((idx >> np.uint32(k)) & 1).astype(bool)
            y = y ^ np.where(bit, vrows[k], np.uint32(0))
        return y.astype(np.float64) / 2.0 ** 32

    def min_d2(vrows):
        y = points(vrows)
        dy = np.abs(y[:, None] - y[None, :])
        dy = np.minimum(dy, 1.0 - dy) ** 2
        return float((dx + dy + big).min())

    v = sobol_matrices(2)[1][:m].astype(np.uint32).copy()
    best = min_d2(v)
    rng = np.random.RandomState(977 + m)
    for _ in range(600):
        k = int(rng.randint(m))
        b = int(rng.randint(m))
        cand = v.copy()
        cand[k] ^= np.uint32(1) << np.uint32(31 - b)
        d = min_d2(cand)
        if d > best:
            v, best = cand, d
    out = np.zeros(SOBOL_BITS, np.uint32)
    out[:m] = v
    # higher index bits (index >= n, only reached when spp exceeds the
    # matrix size) fall back to the Sobol' rows
    out[m:] = sobol_matrices(2)[1][m:]
    return out


def maxmin_sample2(index, m, seed0, seed1):
    """Owen-scrambled (x, y) of the n = 2^m max-min point set; `index`
    is taken modulo 2^m (maxmin.rs sample layout: x = i/n stratified,
    y = C·i)."""
    v = jnp.asarray(maxmin_matrix(m))
    index = jnp.asarray(index).astype(jnp.uint32)
    xbits = index << jnp.uint32(32 - m)

    def body(k, acc):
        bit = (index >> k.astype(jnp.uint32)) & jnp.uint32(1)
        return acc ^ jnp.where(bit == 1, v[k], jnp.uint32(0))

    ybits = jax.lax.fori_loop(0, SOBOL_BITS, body, jnp.zeros_like(index))
    u = u32_to_unit_float(owen_scramble_u32(xbits, seed0))
    vq = u32_to_unit_float(owen_scramble_u32(ybits, seed1))
    return jnp.stack([u, vq], axis=-1)


# --------------------------------------------------------------- radical

@functools.lru_cache(maxsize=None)
def primes(n=1000):
    """First n primes (the reference embeds this table,
    lowdiscrepancy.rs:12-77; we sieve it)."""
    limit = max(16, int(n * (np.log(n) + np.log(np.log(n + 2)) + 2)))
    sieve = np.ones(limit, bool)
    sieve[:2] = False
    for p in range(2, int(limit ** 0.5) + 1):
        if sieve[p]:
            sieve[p * p::p] = False
    return np.nonzero(sieve)[0][:n].astype(np.uint32)


def radical_inverse(base_index, a):
    """Radical inverse of integer a in prime base #base_index
    (lowdiscrepancy.rs:293-340). `base_index` may be static or traced;
    `a` is batched uint32. Fixed 32-digit additive fold — digits past the
    top of `a` contribute zero, so the traced-base case is exact."""
    base = jnp.asarray(primes())[jnp.asarray(base_index, jnp.int32)].astype(jnp.uint32)
    basef = base.astype(Float)
    a = jnp.asarray(a).astype(jnp.uint32)
    a, _ = jnp.broadcast_arrays(a, jnp.zeros(jnp.shape(base), jnp.uint32))
    base = jnp.broadcast_to(base, a.shape)
    rev = jnp.zeros(a.shape, Float)
    scale = jnp.ones(a.shape, Float)
    basef = jnp.broadcast_to(basef, a.shape)
    for _ in range(SOBOL_BITS):
        digit = (a % base).astype(Float)
        scale = scale / basef
        rev = rev + digit * scale
        a = a // base
    return jnp.minimum(rev, ONE_MINUS_EPSILON)


def scrambled_radical_inverse(base_index, a, pixel_seed):
    """Radical inverse with per-digit-position random rotation derived
    from `pixel_seed` (replaces the precomputed permutation tables of
    lowdiscrepancy.rs:364-409 with hash-generated digit permutations)."""
    base = jnp.asarray(primes())[jnp.asarray(base_index, jnp.int32)].astype(jnp.uint32)
    basef = base.astype(Float)
    a = jnp.asarray(a).astype(jnp.uint32)
    a, _ = jnp.broadcast_arrays(a, jnp.zeros(jnp.shape(base), jnp.uint32))
    base = jnp.broadcast_to(base, a.shape)
    basef = jnp.broadcast_to(basef, a.shape)
    bidx = jnp.broadcast_to(jnp.asarray(base_index, jnp.uint32), a.shape)
    seed = jnp.broadcast_to(jnp.asarray(pixel_seed, jnp.uint32), a.shape)
    rev = jnp.zeros(a.shape, Float)
    scale = jnp.ones(a.shape, Float)
    for i in range(SOBOL_BITS):
        digit = a % base
        shift = pcg_hash(hash_combine(seed, bidx, jnp.uint32(i))) % base
        # A rotation is a valid digit permutation; applied even to the
        # infinite trailing zeros this is the classic scrambled Halton.
        pdigit = ((digit + shift) % base).astype(Float)
        scale = scale / basef
        rev = rev + pdigit * scale
        a = a // base
    return jnp.minimum(rev, ONE_MINUS_EPSILON)
