#!/usr/bin/env python
"""Isolate the pallas per-tile (grid-step) overhead: kernels with the
same block/spec structure as traverse_tiles but varying amounts of work."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

NT = 1024
TILE = 256
CPAD = 1024
C = 900
CH = 8
K = 128


def timeit(fn, *args, k=8, outer=3):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    best = 1e9
    for _ in range(outer):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / k


def make(kind):
    def kernel(*refs):
        counts_ref, corder_ref, tnear_ref = refs[:3]
        plane_refs, packed_ref = refs[3:11], refs[11]
        t_out, scratch, sems = refs[12], refs[13], refs[14]
        if kind == "empty":
            t_out[0, :, :] = plane_refs[0][0]
            return
        count = counts_ref[0, 0, 0]
        n_rounds = (count + CH - 1) // CH

        def start(r, s):
            for j in range(CH):
                cid = corder_ref[0, 0, r * CH + j]
                pltpu.make_async_copy(packed_ref.at[cid],
                                      scratch.at[s, :, :, j, :],
                                      sems.at[s, j]).start()

        def wait(s):
            for j in range(CH):
                pltpu.make_async_copy(packed_ref.at[0],
                                      scratch.at[s, :, :, j, :],
                                      sems.at[s, j]).wait()

        @pl.when(n_rounds > 0)
        def _():
            start(0, 0)

        def cond(carry):
            r, acc = carry
            return r < n_rounds

        def body(carry):
            r, acc = carry
            cur = r % 2

            @pl.when(r + 1 < n_rounds)
            def _():
                start(r + 1, 1 - cur)
            wait(cur)
            if kind == "dma+compute":
                L = jnp.concatenate([p[0] for p in plane_refs] * 2, axis=0)  # (16,TILE)
                W = jax.lax.dot_general(
                    scratch[cur].reshape(16, 5 * CH * K), L,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + jnp.min(W, axis=0, keepdims=True)
            else:
                acc = acc + scratch[cur, 0, 0, 0, 0:1][None, :] * jnp.ones((1, TILE), jnp.float32)
            return r + 1, acc

        _, acc = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32),
                                                 jnp.zeros((1, TILE), jnp.float32)))
        t_out[0, :, :] = acc

    return kernel


def run(kind, counts_val, smem_blocks=True):
    packed = jnp.ones((C, 16, 5, K), jnp.float32)
    planes = [jnp.ones((NT, 1, TILE), jnp.float32) for _ in range(8)]
    corder = jnp.tile(jnp.arange(CPAD, dtype=jnp.int32)[None] % C, (NT, 1))
    tnear = jnp.zeros((NT, CPAD), jnp.float32)
    counts = jnp.full((NT,), counts_val, jnp.int32)
    cw = CPAD if smem_blocks else 1
    corder = corder[:, :cw]
    tnear = tnear[:, :cw]
    in_specs = [
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, cw), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, cw), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
    ] + [pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] * 8 \
      + [pl.BlockSpec(memory_space=pltpu.ANY)]
    f = pl.pallas_call(
        make(kind), grid=(NT,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((NT, 1, TILE), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2, 16, 5, CH, K), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, CH))],
    )
    g = jax.jit(lambda *a: f(*a)[0])
    dt = timeit(g, counts[:, None, None], corder[:, None, :], tnear[:, None, :],
                *planes, packed)
    rounds = NT * ((counts_val + CH - 1) // CH)
    print(f"{kind:14s} smem={int(smem_blocks)} counts={counts_val:4d} rounds={rounds:6d}  "
          f"{dt*1e3:8.2f} ms  {dt/NT*1e6:6.2f} us/tile")


def main():
    print("devices:", jax.devices())
    run("empty", 0)
    run("empty", 0, smem_blocks=False)
    run("dma", 0)
    run("dma", 8)
    run("dma", 32)
    run("dma", 64)
    run("dma+compute", 8)
    run("dma+compute", 32)
    run("dma+compute", 64)


if __name__ == "__main__":
    main()
