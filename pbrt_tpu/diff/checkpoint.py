"""Checkpoint / resume.

The reference has none (SURVEY §5.4); ours makes long renders and
inverse-rendering runs resumable: because samplers are stateless, a
(film accumulators, next-sample-index) pair IS the complete render
state — resuming re-derives every stream exactly. Optimiser state and
scene parameters round-trip as flattened pytrees in one .npz.
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def save_pytree(path, tree, meta=None):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_pytree(path, like_tree):
    """Restore a pytree saved by save_pytree into the structure of
    `like_tree`. Returns (tree, meta)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like_tree)
    out = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data else {}
    return jax.tree_util.tree_unflatten(treedef, out), meta


class RenderCheckpoint:
    """Accumulating render with save/resume (film sums + sample cursor)."""

    def __init__(self, height, width):
        self.acc = jnp.zeros((height, width, 3), jnp.float32)
        self.wacc = jnp.zeros((height, width), jnp.float32)
        self.next_sample = 0

    def add_batch(self, radiance_sum, weight_sum, n_samples):
        self.acc = self.acc + radiance_sum
        self.wacc = self.wacc + weight_sum
        self.next_sample += n_samples

    def image(self):
        return self.acc / jnp.maximum(self.wacc[..., None], 1e-10)

    def save(self, path):
        save_pytree(path, (self.acc, self.wacc),
                    meta={"next_sample": self.next_sample})

    @classmethod
    def load(cls, path):
        data = np.load(path)
        acc = jnp.asarray(data["leaf_0"])
        wacc = jnp.asarray(data["leaf_1"])
        meta = json.loads(bytes(data["__meta__"]).decode())
        ck = cls(acc.shape[0], acc.shape[1])
        ck.acc, ck.wacc = acc, wacc
        ck.next_sample = meta["next_sample"]
        return ck


def render_resumable(scene, camera, cfg, li_fn, checkpoint_path=None,
                     save_every=0):
    """driver.render with checkpointing: identical output to a straight
    render at the same spp (stateless sampling ⇒ exact resume)."""
    import os
    from ..integrate import driver as drivermod

    h, w = cfg.height, cfg.width
    if checkpoint_path and os.path.exists(checkpoint_path):
        ck = RenderCheckpoint.load(checkpoint_path)
    else:
        ck = RenderCheckpoint(h, w)

    batch = cfg.samples_per_batch or cfg.spp

    def one_batch(scene, camera, lo, hi):
        rad, wt = drivermod.render_batch(scene, camera, cfg, li_fn, lo, hi)
        return (jnp.sum(rad * wt[..., None], axis=0).reshape(h, w, 3),
                jnp.sum(wt, axis=0).reshape(h, w))

    fn = jax.jit(one_batch, static_argnums=(2, 3))
    while ck.next_sample < cfg.spp:
        lo = ck.next_sample
        hi = min(lo + batch, cfg.spp)
        r, wt = fn(scene, camera, lo, hi)
        ck.add_batch(r, wt, hi - lo)
        if checkpoint_path and save_every and \
                (ck.next_sample // batch) % save_every == 0:
            ck.save(checkpoint_path)
    if checkpoint_path:
        ck.save(checkpoint_path)
    return ck.image()
