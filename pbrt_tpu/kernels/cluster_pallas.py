"""Pallas TPU kernel for tile×cluster ray traversal.

The jnp tracer (geom/cluster.py) runs all tiles in lock-step: every
round sweeps (tiles × TILE × CH·K) lanes and the loop runs until the
WORST tile's cluster list is exhausted — measured 3-10× waste on bounce
rays. This kernel removes the lock-step: the pallas grid is one program
per ray tile, and each tile runs `ceil(own_coverage / CH)` rounds of
dense Plücker tests, fetching its cluster feature blocks HBM→VMEM with
async DMA. Per-tile loop bounds come from the coverage pass (scalar
prefetch), so a tile with 1 covered cluster does 1 round while its
neighbour does 12; the Mosaic grid pipeline overlaps programs.

Layout contract (produced by geom/cluster.py):
  packed   (C, NFP, K) f32  per-cluster Plücker features; K=128 lanes,
                            NFP=24 padded sublanes (22 used; see
                            cluster.py for the row meaning)
  rays     (nt, TILE, 16) f32 per-ray component columns
           [ox oy oz dx dy dz mx my mz tmin tmax pad...]
  corder   (nt, CPAD)  i32  per-tile cluster ids, ascending entry t
  counts   (nt,)       i32  covered clusters per tile
outputs:
  t_best   (nt, TILE)  f32  (t_max where missed)
  slot     (nt, TILE)  i32  global slot = round·CH·K + chunk·K + lane
                            (-1 where missed)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Float, Int, INF

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 4          # clusters fetched per round
NFP = 24        # padded feature rows
SLOT_MASK = 2047


def _make_kernel(tile, k):
    chk = CH * k

    def kernel(counts_ref, corder_ref, rays_ref, packed_ref, t_out, slot_out,
               scratch, sems):
        i = pl.program_id(0)
        count = counts_ref[i]
        n_rounds = (count + CH - 1) // CH

        # rays block is (1, TILE, 16): components come out (TILE, 1) —
        # sublane-major, which broadcasts cleanly against (1, K) feature
        # rows without any lane<->sublane shape casts (Mosaic rejects
        # those).
        def plane(row):
            return rays_ref[0, :, row:row + 1]              # (TILE, 1)

        ox, oy, oz = plane(0), plane(1), plane(2)
        dx, dy, dz = plane(3), plane(4), plane(5)
        mx, my, mz = plane(6), plane(7), plane(8)
        tmin = plane(9)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

        def body(r, carry):
            t_best, best_key = carry
            for j in range(CH):
                cid = corder_ref[i, r * CH + j]
                pltpu.make_async_copy(packed_ref.at[cid], scratch.at[j],
                                      sems.at[j]).start()
            for j in range(CH):
                pltpu.make_async_copy(packed_ref.at[0], scratch.at[j],
                                      sems.at[j]).wait()

            for j in range(CH):
                def F(fi):
                    return scratch[j, fi:fi + 1, :]          # (1, k)

                w0 = dx * F(0) + dy * F(1) + dz * F(2) \
                    + mx * F(3) + my * F(4) + mz * F(5)
                w1 = dx * F(6) + dy * F(7) + dz * F(8) \
                    + mx * F(9) + my * F(10) + mz * F(11)
                w2 = dx * F(12) + dy * F(13) + dz * F(14) \
                    + mx * F(15) + my * F(16) + mz * F(17)
                same = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) | \
                       ((w0 <= 0) & (w1 <= 0) & (w2 <= 0))
                ndotd = dx * F(18) + dy * F(19) + dz * F(20)
                ndoto = ox * F(18) + oy * F(19) + oz * F(20)
                t = (F(21) - ndoto) / jnp.where(jnp.abs(ndotd) > 1e-12,
                                                ndotd, 1e-12)
                ok = same & (jnp.abs(ndotd) > 1e-12) & (t > tmin) \
                    & (t < t_best)                           # (TILE, k)
                t = jnp.where(ok, t, INF)
                t_bits = jax.lax.bitcast_convert_type(t, jnp.int32)
                key = (t_bits & ~jnp.int32(SLOT_MASK)) \
                    | (lane_iota + 0)                        # lane slot
                kmin = jnp.min(key, axis=1, keepdims=True)   # (TILE, 1)
                tj = jax.lax.bitcast_convert_type(
                    kmin & ~jnp.int32(SLOT_MASK), jnp.float32)
                upd = tj < t_best
                gslot = (r * CH + j) * k + (kmin & SLOT_MASK)
                best_key = jnp.where(upd, gslot, best_key)
                t_best = jnp.where(upd, tj, t_best)
            return t_best, best_key

        t0 = rays_ref[0, :, 10:11]                           # (TILE, 1)
        init = (t0, jnp.full((tile, 1), -1, jnp.int32))
        t_best, best_key = jax.lax.fori_loop(0, n_rounds, body, init)
        t_out[0, :, :] = t_best
        slot_out[0, :, :] = best_key

    return kernel


def traverse_tiles(packed, rays, corder, counts, interpret=False):
    """packed (C, NFP, K) f32, rays (nt, 16, TILE) f32, corder (nt, CPAD)
    i32 (CPAD a CH multiple), counts (nt,) i32 →
    (t_best (nt, TILE) f32, slot (nt, TILE) i32)."""
    nt, tile, _ = rays.shape
    c, nfp, k = packed.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,     # counts, corder
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, tile, 16), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # packed stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, tile, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((CH, nfp, k), jnp.float32),
            pltpu.SemaphoreType.DMA((CH,)),
        ],
    )
    t_b, slot = pl.pallas_call(
        _make_kernel(tile, k),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nt, tile, 1), jnp.float32),
                   jax.ShapeDtypeStruct((nt, tile, 1), jnp.int32)],
        interpret=interpret,
    )(counts, corder, rays, packed)
    return t_b[:, :, 0], slot[:, :, 0]

