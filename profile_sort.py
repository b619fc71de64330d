#!/usr/bin/env python
"""Measure sort primitives on the chip — the traversal pre-pass cost."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    n = 65536
    key = jax.random.PRNGKey(0)
    k32 = jax.random.randint(key, (n,), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
    k8 = (k32 >> 24).astype(jnp.uint32)

    dt = timeit(jax.jit(jnp.argsort), k32)
    print(f"argsort u32 {n}:          {dt*1e3:7.2f} ms")
    dt = timeit(jax.jit(lambda k: jnp.argsort(k8)), k32)
    print(f"argsort u8-key {n}:       {dt*1e3:7.2f} ms")

    def sort2(k):
        io = jnp.arange(n, dtype=jnp.int32)
        ks, vs = jax.lax.sort((k, io), num_keys=1)
        return vs
    dt = timeit(jax.jit(sort2), k32)
    print(f"lax.sort pair {n}:        {dt*1e3:7.2f} ms")

    def sort_inv(k):
        io = jnp.arange(n, dtype=jnp.int32)
        ks, vs = jax.lax.sort((k, io), num_keys=1)
        inv = jnp.argsort(vs)
        return inv
    dt = timeit(jax.jit(sort_inv), k32)
    print(f"sort+invert {n}:          {dt*1e3:7.2f} ms")

    # invert via second pair-sort instead of argsort
    def sort_inv2(k):
        io = jnp.arange(n, dtype=jnp.int32)
        ks, vs = jax.lax.sort((k, io), num_keys=1)
        _, inv = jax.lax.sort((vs, io), num_keys=1)
        return inv
    dt = timeit(jax.jit(sort_inv2), k32)
    print(f"pair-sort invert {n}:     {dt*1e3:7.2f} ms")

    # scatter-based inversion
    def scat_inv(k):
        io = jnp.arange(n, dtype=jnp.int32)
        ks, vs = jax.lax.sort((k, io), num_keys=1)
        inv = jnp.zeros(n, jnp.int32).at[vs].set(io)
        return inv
    dt = timeit(jax.jit(scat_inv), k32)
    print(f"scatter invert {n}:       {dt*1e3:7.2f} ms")

    # gather of rays by order (the reorder itself)
    o = jax.random.normal(key, (n, 3))
    def reorder(k, o):
        order = jnp.argsort(k)
        return o[order]
    dt = timeit(jax.jit(reorder), k32, o)
    print(f"argsort+gather(n,3):      {dt*1e3:7.2f} ms")

    # per-tile cluster argsort (256, 1281) f32 along axis 1
    t = jax.random.uniform(key, (256, 1281))
    dt = timeit(jax.jit(lambda t: jnp.argsort(t, axis=1)), t)
    print(f"argsort (256,1281) ax1:   {dt*1e3:7.2f} ms")

    # top-k style: do we even need full sort of clusters?
    dt = timeit(jax.jit(lambda t: jax.lax.top_k(-t, 128)[1]), t)
    print(f"top_k 128 of 1281:        {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
