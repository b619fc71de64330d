"""Metropolis light transport (primary-sample-space, PSSMLT).

TPU-native counterpart of src/integrators/mlt.rs. The reference's
`MLTSampler` lazily mutates per-dimension records inside a trait object
(mlt.rs:31-159); here a chain's state IS its primary-sample vector
u ∈ [0,1)^D, and the path evaluation is the wavefront path tracer with a
provider that reads dimensions straight from u (path.li provider hook).

Pipeline (mlt.rs:294-430): bootstrap N paths from hash-indexed uniforms →
luminance normalisation b → seed C chains ∝ luminance → run mutations
(large-step with p_large, else gaussian-ish small-step with wraparound),
Metropolis accept, expected-value splatting of both candidate and
current. All C chains advance in lock-step as one wavefront — the
"sequential in time, parallel in chains" design of SURVEY §2.3.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Float, Int, ONE_MINUS_EPSILON
from ..core import samplers as smp
from ..core.rng import uniform_float, hash_combine
from ..core.sampling import Distribution1D
from ..core.spectrum import luminance
from ..film import film as filmmod
from ..cameras import generate_rays
from . import path as pathmod
from . import driver as drivermod

SIGMA = 0.01
P_LARGE = 0.3


class MLTConfig(NamedTuple):
    width: int = 64
    height: int = 64
    max_depth: int = 5
    n_bootstrap: int = 4096
    n_chains: int = 1024
    mutations_per_pixel: int = 16
    sampler: smp.SamplerConfig = smp.SamplerConfig(kind="random", spp=1)


def _n_dims(cfg):
    return smp.DIM_BOUNCE0 + cfg.max_depth * smp.DIMS_PER_BOUNCE + 2


def _array_provider(u_vec):
    """Provider reading path dimensions from a (N, D) PSS vector."""
    def sample1(bounce, slot):
        return u_vec[:, smp.bounce_dim(bounce, slot)]

    def sample2(bounce, slot):
        d0 = smp.bounce_dim(bounce, slot)
        return u_vec[:, d0:d0 + 2]

    return sample1, sample2


def _eval_path(scene, camera, cfg, u_vec):
    """Radiance + film position for PSS vectors u (N, D).
    Dims 0-1: film xy; 2-3: lens; 4: time; rest: path dims."""
    h, w = cfg.height, cfg.width
    pfilm = jnp.stack([u_vec[:, 0] * w, u_vec[:, 1] * h], axis=-1)
    o, d, _ = generate_rays(camera, pfilm, u_vec[:, 2:4], u_vec[:, 4])
    n = u_vec.shape[0]
    rcfg = drivermod.RenderConfig(width=w, height=h, spp=1,
                                  max_depth=cfg.max_depth, sampler=cfg.sampler)
    L = pathmod.li(scene, o, d,
                   jnp.zeros((n,), jnp.uint32), jnp.zeros((n,), jnp.uint32),
                   rcfg, provider=_array_provider(u_vec))
    return L, pfilm


def _bootstrap_u(cfg, i, d):
    """Deterministic bootstrap uniforms: hash(bootstrap index, dim)."""
    return uniform_float(jnp.uint32(0xB007), i, jnp.uint32(0), d)


def render(scene, camera, cfg: MLTConfig, seed=0):
    h, w = cfg.height, cfg.width
    nd = _n_dims(cfg)

    # ---- bootstrap (mlt.rs:305-338)
    bi = jnp.arange(cfg.n_bootstrap, dtype=jnp.uint32)
    u_boot = jnp.stack([_bootstrap_u(cfg, bi, jnp.uint32(dd)) for dd in range(nd)], axis=-1)

    @jax.jit
    def boot_lum(scene, camera, u):
        L, _ = _eval_path(scene, camera, cfg, u)
        return luminance(L)

    lum = boot_lum(scene, camera, u_boot)
    b = jnp.mean(lum)
    dist = Distribution1D.build(lum + 1e-12)

    # ---- seed chains ∝ luminance (mlt.rs:340-352)
    ci = jnp.arange(cfg.n_chains, dtype=jnp.uint32)
    u_seed_sel = uniform_float(jnp.uint32(seed + 1), ci)
    seed_idx, _, _ = dist.sample_discrete(u_seed_sel)
    u_cur = u_boot[seed_idx]

    n_mutations = (cfg.mutations_per_pixel * h * w) // cfg.n_chains

    @jax.jit
    def run_chains(scene, camera, u_cur, film_splat):
        L_cur, p_cur = _eval_path(scene, camera, cfg, u_cur)
        lum_cur = luminance(L_cur)

        def mutate(m, carry):
            u_cur, L_cur, p_cur, lum_cur, splat = carry
            key = hash_combine(jnp.uint32(seed + 7), ci, jnp.uint32(m))
            u_large = uniform_float(key, jnp.uint32(0xAAAA))
            is_large = (u_large < P_LARGE)[:, None]
            fresh = jnp.stack([uniform_float(key, jnp.uint32(100 + dd), ci)
                               for dd in range(nd)], axis=-1)
            # small step: wrapped gaussian-ish perturbation (mlt.rs:100-140)
            g1 = jnp.stack([uniform_float(key, jnp.uint32(500 + dd), ci)
                            for dd in range(nd)], axis=-1)
            g2 = jnp.stack([uniform_float(key, jnp.uint32(900 + dd), ci)
                            for dd in range(nd)], axis=-1)
            normal = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(g1, 1e-10))) * \
                jnp.cos(2.0 * np.pi * g2)
            perturbed = (u_cur + SIGMA * normal) % 1.0
            u_prop = jnp.clip(jnp.where(is_large, fresh, perturbed), 0.0, ONE_MINUS_EPSILON)

            L_prop, p_prop = _eval_path(scene, camera, cfg, u_prop)
            lum_prop = luminance(L_prop)
            accept = jnp.minimum(1.0, lum_prop / jnp.maximum(lum_cur, 1e-12))

            # expected-value splats (mlt.rs:402-424)
            w_prop = accept / jnp.maximum(lum_prop, 1e-12)
            w_cur = (1.0 - accept) / jnp.maximum(lum_cur, 1e-12)
            splat = filmmod.add_splats(filmmod.Film(splat * 0.0, splat[..., 0] * 0.0, splat),
                                       p_prop, L_prop * w_prop[:, None],
                                       enabled=lum_prop > 0).splats
            splat = filmmod.add_splats(filmmod.Film(splat * 0.0, splat[..., 0] * 0.0, splat),
                                       p_cur, L_cur * w_cur[:, None],
                                       enabled=lum_cur > 0).splats

            u_accept = uniform_float(key, jnp.uint32(0xBBBB))
            take = (u_accept < accept)
            u_cur = jnp.where(take[:, None], u_prop, u_cur)
            L_cur = jnp.where(take[:, None], L_prop, L_cur)
            p_cur = jnp.where(take[:, None], p_prop, p_cur)
            lum_cur = jnp.where(take, lum_prop, lum_cur)
            return u_cur, L_cur, p_cur, lum_cur, splat

        out = jax.lax.fori_loop(0, n_mutations, mutate,
                                (u_cur, L_cur, p_cur, lum_cur, film_splat))
        return out[4]

    splat = run_chains(scene, camera, u_cur, jnp.zeros((h, w, 3), Float))
    total_samples = n_mutations * cfg.n_chains
    return splat * (b / jnp.maximum(total_samples / (h * w), 1e-12))
