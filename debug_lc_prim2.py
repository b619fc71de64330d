#!/usr/bin/env python
"""Primitive test v2: where-merge + tuple carry + while_loop + 2-block
cond chain, mimicking the real LC kernel's structure. Each variant must
return val*mask exactly."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256
NB = 128
VARIANT = os.environ.get("V", "while_tuple")


def _split3(A):
    a1 = A.astype(jnp.bfloat16)
    r1 = A - a1.astype(jnp.float32)
    a2 = r1.astype(jnp.bfloat16)
    a3 = (r1 - a2.astype(jnp.float32)).astype(jnp.bfloat16)
    return a1, a2, a3


def _sel_dot(A, Q, transpose_q):
    m = A.shape[0]
    a1, a2, a3 = _split3(A)
    A3 = jnp.concatenate([a1, a2, a3], axis=0)
    dims = (((1,), (1,)), ((), ())) if transpose_q else (((1,), (0,)), ((), ()))
    W = jax.lax.dot_general(A3, Q.astype(jnp.bfloat16), dims,
                            preferred_element_type=jnp.float32)
    return W[0:m] + W[m:2 * m] + W[2 * m:3 * m]


def kernel(mask_ref, val_ref, out_ref, slot_ref):
    i0 = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    UT = (i0 < i1).astype(jnp.float32)
    blk_iota = jax.lax.broadcasted_iota(jnp.int32, (NB, TILE), 0)
    mask = mask_ref[0] > 0.5
    maskf = mask.astype(jnp.float32)
    rank_i = jax.lax.dot_general(maskf, UT, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32).astype(jnp.int32)
    ltot = jnp.sum(maskf).astype(jnp.int32)
    val = val_ref[0]

    def round_body(carry):
        r, t_best, best_slot = carry

        def block(b, c):
            t_best, best_slot = c
            sel = (blk_iota == (rank_i - NB * b)) & mask
            Q = sel.astype(jnp.float32)
            vc = _sel_dot(val, Q, transpose_q=True)          # (1, NB)
            upd_c = jnp.ones((1, NB), jnp.float32) * (vc != 0)
            rows = jnp.concatenate([upd_c, vc], axis=0)
            exp = _sel_dot(rows, Q, transpose_q=False)       # (2, TILE)
            upd = exp[0:1] > 0.5
            t_best = jnp.where(upd, exp[1:2], t_best)
            best_slot = jnp.where(upd, jnp.ones((1, TILE), jnp.int32),
                                  best_slot)
            return t_best, best_slot

        c2 = (t_best, best_slot)
        for b in range(TILE // NB):
            c2 = jax.lax.cond(b * NB < ltot,
                              lambda c, b=b: block(b, c), lambda c: c, c2)
        t_best, best_slot = c2
        return r + 1, t_best, best_slot

    init = (jnp.zeros((), jnp.int32), jnp.zeros((1, TILE), jnp.float32),
            jnp.full((1, TILE), -1, jnp.int32))
    if VARIANT == "while_tuple":
        _, t_best, best_slot = jax.lax.while_loop(
            lambda c: c[0] < 1, round_body, init)
    else:   # nowhile
        _, t_best, best_slot = round_body(init)
    out_ref[0] = t_best
    slot_ref[0] = best_slot


def main():
    rng = np.random.RandomState(0)
    mask = (rng.rand(1, TILE) < 0.7).astype(np.float32)
    val = (rng.rand(1, TILE).astype(np.float32) * 100 + 1.0)
    out, slot = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, 1, TILE), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1, TILE), jnp.int32)],
    )(jnp.asarray(mask)[None], jnp.asarray(val)[None])
    got = np.asarray(out)[0]
    gslot = np.asarray(slot)[0]
    expect = val * mask
    okv = np.isclose(got, expect, atol=1e-5)
    oks = (gslot[0] == np.where(mask[0] > 0, 1, -1))
    print(f"V={VARIANT} val ok: {bool(okv.all())} bad: {np.argwhere(~okv[0])[:6].ravel()}")
    print(f"slot ok: {bool(oks.all())} bad: {np.argwhere(~oks)[:6].ravel()}")
    if not okv.all():
        b = np.argwhere(~okv[0]).ravel()
        lo = b.min(); hi = b.max()
        ranks = np.concatenate([[0], np.cumsum(mask[0])[:-1]])
        print(f"  bad lanes {len(b)}, rank range [{ranks[lo]}, {ranks[hi]}]")


if __name__ == "__main__":
    main()
