"""Multi-device rendering: tile/wavefront sharding over a device mesh.

TPU-native counterpart of the reference's entire parallel runtime
(src/core/parallel.rs — rayon `parallel_for_2d!` over 16×16 film tiles,
used by integrator.rs:412). Here the image's pixel axis is sharded over a
1-D `jax.sharding.Mesh` with `shard_map`: each device renders its slice
of the wavefront against a replicated scene (the analog of tiles-on-
threads, but across chips over ICI). Film assembly is a concatenation
(out_specs along the pixel axis); inverse-rendering gradients are
`psum`-reduced across the mesh — the collective the reference never had
(SURVEY.md §2.10, §5.8).

Per-pixel seeding makes the sharded render bitwise-identical to the
single-device render for any device count.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.types import Float
from ..core import samplers as smp
from ..cameras import generate_rays_weighted
from ..film import filters as filtmod
from ..integrate import driver as drivermod

AXIS = "tiles"


def make_mesh(n_devices=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def _render_lanes(scene, camera, cfg, li_fn, pixel_id, sample_idx):
    """Render explicit lanes (pixel ids × sample idx); returns
    (radiance (S,K,3), weight (S,K))."""
    w = cfg.width
    u_film = smp.sample_2d(cfg.sampler, pixel_id, sample_idx, smp.DIM_FILM)
    px = (pixel_id % jnp.uint32(w)).astype(Float)
    py = (pixel_id // jnp.uint32(w)).astype(Float)
    off, fw = filtmod.sample_offset(cfg.filter, u_film)
    pfilm = jnp.stack([px + 0.5 + off[..., 0], py + 0.5 + off[..., 1]], axis=-1)
    u_lens = smp.sample_2d(cfg.sampler, pixel_id, sample_idx, smp.DIM_LENS)
    u_time = smp.sample_1d(cfg.sampler, pixel_id, sample_idx, smp.DIM_TIME)
    o, d, _t, cw = generate_rays_weighted(camera, pfilm, u_lens, u_time)
    radiance = li_fn(scene, o, d, pixel_id, sample_idx)
    if isinstance(radiance, tuple):
        # (radiance, stats) — apply the camera ray weight (realistic-lens
        # vignetting / failed-ray zero) to the radiance half too
        # (advisor r4: it was silently dropped on the stats path)
        radiance = (radiance[0] * cw[..., None],) + radiance[1:]
    else:
        radiance = radiance * cw[..., None]
    return radiance, fw * jnp.ones(pixel_id.shape, Float)


def render_sharded(scene, camera, cfg, li_fn, mesh=None, sample_lo=0, sample_hi=None):
    """Forward render with pixels sharded over the mesh.

    Returns (H, W, 3) image. Bitwise-equal to the single-device render."""
    mesh = mesh if mesh is not None else make_mesh()
    h, w = cfg.height, cfg.width
    hw = h * w
    n_dev = mesh.devices.size
    pad = (-hw) % n_dev
    s_lo = sample_lo
    s_hi = cfg.spp if sample_hi is None else sample_hi
    s = s_hi - s_lo

    pixel_id = jnp.arange(hw + pad, dtype=jnp.uint32)
    pixel_id = jnp.tile(pixel_id[None, :], (s, 1))
    sample_idx = (jnp.arange(s, dtype=jnp.uint32) + jnp.uint32(s_lo))[:, None] \
        * jnp.ones((1, hw + pad), jnp.uint32)

    def shard_fn(scene, camera, pix, samp):
        rad, wt = _render_lanes(scene, camera, cfg, li_fn, pix, samp)
        return rad, wt

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(), P(), P(None, AXIS), P(None, AXIS)),
                       out_specs=(P(None, AXIS), P(None, AXIS)))
    rad, wt = jax.jit(fn)(scene, camera, pixel_id, sample_idx)
    img = jnp.sum(rad * wt[..., None], axis=0)[:hw].reshape(h, w, 3)
    wsum = jnp.sum(wt, axis=0)[:hw].reshape(h, w)
    return img / jnp.maximum(wsum[..., None], 1e-10)


def make_train_step(cfg, li_fn, param_get, param_set, mesh=None):
    """Build a jitted inverse-rendering step: grads of an L2 image loss
    w.r.t. differentiable scene params, pixel-sharded, psum over the mesh
    (the gradient all-reduce of BASELINE config 5).

    param_get(scene) -> pytree of leaves; param_set(scene, pytree) -> scene.
    Returns step(scene, camera, target_img, lr) -> (scene, loss).
    """
    mesh = mesh if mesh is not None else make_mesh()
    h, w = cfg.height, cfg.width
    hw = h * w
    n_dev = mesh.devices.size
    assert hw % n_dev == 0, "pixel count must divide the mesh for the demo step"

    # differentiate THROUGH shard_map: the forward is pixel-sharded, the
    # transpose inserts the gradient all-reduce (psum over the mesh) at
    # the replicated-param boundary automatically — collectives ride ICI
    # within a host, DCN across hosts (SURVEY §5.8).
    fwd = jax.shard_map(
        lambda sc, cam_, pix, samp: _render_lanes(sc, cam_, cfg, li_fn, pix, samp),
        mesh=mesh,
        in_specs=(P(), P(), P(None, AXIS), P(None, AXIS)),
        out_specs=(P(None, AXIS), P(None, AXIS)))

    def loss_fn(params, scene, camera, target_flat, pix, samp):
        sc = param_set(scene, params)
        rad, wt = fwd(sc, camera, pix, samp)
        img = jnp.sum(rad * wt[..., None], axis=0) / \
            jnp.maximum(jnp.sum(wt, axis=0)[..., None], 1e-10)
        return jnp.mean((img - target_flat) ** 2)

    @jax.jit
    def step(scene, camera, target_img, lr):
        s = cfg.spp
        pixel_id = jnp.tile(jnp.arange(hw, dtype=jnp.uint32)[None, :], (s, 1))
        sample_idx = jnp.arange(s, dtype=jnp.uint32)[:, None] * jnp.ones((1, hw), jnp.uint32)
        loss, grads = jax.value_and_grad(loss_fn)(
            param_get(scene), scene, camera, target_img.reshape(hw, 3),
            pixel_id, sample_idx)
        params = param_get(scene)
        params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return param_set(scene, params), loss

    return step
