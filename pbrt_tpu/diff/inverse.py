"""Differentiable / inverse rendering.

The gradient path the reference never had (pbrt-rs is forward-only):
because every random number is a pure function of (pixel, sample, dim)
counters, differentiating the wavefront integrator IS path-replay
backprop — the same paths are re-traced under `jax.grad` with identical
sampling decisions, and gradients flow through the *continuous* shading
chain (BSDF values, light emission, camera response) while sampled
directions/pdfs and visibility are treated as detached (standard
detached-sampling estimator; visibility/silhouette gradients are out of
scope, matching BASELINE's gradient metric).

Provides: parameter views over Scene, an L2/relative-L2 loss, Adam (via
optax), and a simple fit loop used by tests and the multi-host demo.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..core.types import Float


# ------------------------------------------------ parameter views

def material_params(scene, fields=("kd", "ks", "kr", "kt", "roughness", "eta")):
    return {f: getattr(scene.materials, f) for f in fields}


def light_params(scene):
    return {"emit": scene.lights.emit}


def default_params(scene):
    return {"materials": material_params(scene), "lights": light_params(scene)}


def apply_params(scene, params):
    sc = scene
    if "materials" in params:
        sc = sc._replace(materials=dataclasses.replace(sc.materials, **params["materials"]))
    if "lights" in params:
        sc = sc._replace(lights=dataclasses.replace(sc.lights, **params["lights"]))
    return sc


def clamp_params(params):
    """Project back into physically-valid ranges after a gradient step."""
    out = jax.tree_util.tree_map(lambda p: p, params)
    if "materials" in out:
        m = dict(out["materials"])
        for k in ("kd", "ks", "kr", "kt"):
            if k in m:
                m[k] = jnp.clip(m[k], 0.0, 1.0)
        if "roughness" in m:
            m["roughness"] = jnp.clip(m["roughness"], 1e-3, 1.0)
        if "eta" in m:
            m["eta"] = jnp.clip(m["eta"], 1.01, 3.0)
        out["materials"] = m
    if "lights" in out:
        l = dict(out["lights"])
        if "emit" in l:
            l["emit"] = jnp.maximum(l["emit"], 0.0)
        out["lights"] = l
    return out


# ------------------------------------------------------- losses

def l2_loss(img, target):
    return jnp.mean((img - target) ** 2)


def rel_l2_loss(img, target):
    """Relative L2 — the standard inverse-rendering loss (weights down
    bright-pixel MC noise)."""
    return jnp.mean((img - target) ** 2 / (jnp.square(jax.lax.stop_gradient(img)) + 1e-2))


# ----------------------------------------------------- optimisation

class FitState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_fit_step(render_fn, loss_fn=rel_l2_loss, optimizer=None,
                  param_get=default_params, param_set=apply_params):
    """render_fn(scene, step) -> (H, W, 3) image (step seeds the sampler
    so each iteration uses fresh paths). Returns (init_fn, step_fn)."""
    optimizer = optimizer or optax.adam(2e-2)

    def init_fn(scene):
        params = param_get(scene)
        return FitState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

    @jax.jit
    def step_fn(state: FitState, scene, target):
        def loss_of(params):
            sc = param_set(scene, params)
            img = render_fn(sc, state.step)
            return loss_fn(img, target)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = clamp_params(params)
        return FitState(params, opt_state, state.step + 1), loss

    return init_fn, step_fn


def fit(scene, target, render_fn, n_steps=100, **kw):
    """Optimise scene parameters to match `target`. Returns
    (optimised scene, loss history)."""
    init_fn, step_fn = make_fit_step(render_fn, **kw)
    state = init_fn(scene)
    losses = []
    for _ in range(n_steps):
        state, loss = step_fn(state, scene, target)
        losses.append(float(loss))
    return apply_params(scene, state.params), losses


def finite_difference_check(scene, render_fn, param_path, eps=1e-3, loss_fn=None,
                            target=None):
    """Central-difference gradient for ONE scalar parameter vs autodiff
    (the FD gate of SURVEY §4.3). param_path: (group, field, index tuple).
    Returns (autodiff_grad, fd_grad)."""
    group, field, idx = param_path
    loss_fn = loss_fn or (lambda img: jnp.mean(img))

    def loss_of_scene(sc):
        return loss_fn(render_fn(sc, 0))

    def set_param(scene, value):
        params = default_params(scene)
        arr = params[group][field].at[idx].set(value)
        return apply_params(scene, {group: {field: arr}})

    base = default_params(scene)[group][field][idx]
    g = jax.grad(lambda v: loss_of_scene(set_param(scene, v)))(base)
    lp = loss_of_scene(set_param(scene, base + eps))
    lm = loss_of_scene(set_param(scene, base - eps))
    return float(g), float((lp - lm) / (2 * eps))
