#!/usr/bin/env python
"""Microbench the XLA primitives the binned traversal needs:
scatter-min, nonzero(size=), row gather, cumsum at pair scale."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

RTT = 0.0


def measure_rtt():
    global RTT
    x = jnp.zeros(())
    f = jax.jit(lambda x: x + 1)
    for _ in range(3):
        float(f(x))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    RTT = min(ts)


def timeit(fn, *args, k=8):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 1e-9) / k


def main():
    measure_rtt()
    print(f"RTT {RTT*1e3:.2f} ms")
    N = 262144
    P = 2 * 1024 * 1024
    key = jax.random.PRNGKey(0)
    ray_ids = jax.random.randint(key, (P,), 0, N, jnp.int32)
    vals = jax.random.randint(key, (P,), 0, 1 << 30, jnp.int32)

    f = jax.jit(lambda r, v: jnp.full(N, np.int32(2**31 - 1)).at[r].min(v))
    print(f"scatter-min {P/1e6:.1f}M->{N/1e3:.0f}k:  {timeit(f, ray_ids, vals)*1e3:8.2f} ms")

    f = jax.jit(lambda r, v: jnp.full(N, np.int32(-1)).at[r].max(v))
    print(f"scatter-max:                {timeit(f, ray_ids, vals)*1e3:8.2f} ms")

    mask = jax.random.bernoulli(key, 0.05, (N * 44,))
    f = jax.jit(lambda m: jnp.nonzero(m, size=P, fill_value=-1)[0])
    print(f"nonzero 11.5M mask size=2M: {timeit(f, mask)*1e3:8.2f} ms")

    mask2 = jax.random.bernoulli(key, 0.03, (1024 * 1024 * 16,))
    f = jax.jit(lambda m: jnp.nonzero(m, size=P, fill_value=-1)[0])
    print(f"nonzero 16M mask size=2M:   {timeit(f, mask2)*1e3:8.2f} ms")

    rec = jax.random.normal(key, (N, 8), jnp.float32)
    f = jax.jit(lambda r, i: r[i])
    print(f"gather (2M,8) rows:         {timeit(f, rec, ray_ids)*1e3:8.2f} ms")

    f = jax.jit(lambda r, i: r[i].T.reshape(8, -1, 256))
    print(f"gather+transpose planes:    {timeit(f, rec, ray_ids)*1e3:8.2f} ms")

    f = jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32)))
    print(f"cumsum 16M:                 {timeit(f, mask2)*1e3:8.2f} ms")

    seg = jax.random.randint(key, (P,), 0, 704, jnp.int32)
    f = jax.jit(lambda s: jnp.sort(s))
    print(f"sort 2M i32:                {timeit(f, seg)*1e3:8.2f} ms")
    f = jax.jit(lambda s: jnp.argsort(s))
    print(f"argsort 2M i32:             {timeit(f, seg)*1e3:8.2f} ms")

    tbl = jax.random.normal(key, (44, 96), jnp.float32)
    sid = jax.random.randint(key, (1024 * 1024,), 0, 44, jnp.int32)
    f = jax.jit(lambda t, s: t[s])
    print(f"gather (1M,96) from (44,96):{timeit(f, tbl, sid)*1e3:8.2f} ms")

    f = jax.jit(lambda t, s: jax.nn.one_hot(s, 44, dtype=jnp.bfloat16) @ t.astype(jnp.bfloat16))
    print(f"one-hot matmul variant:     {timeit(f, tbl, sid)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
