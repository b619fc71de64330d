"""Textures: procedural + mipmapped image lookups.

TPU-native counterpart of src/core/{texture,mipmap}.rs + src/textures/.
All 13 reference texture types (constant, scale, mix, bilerp, uv,
checkerboard 2D/3D, dots, fbm, wrinkled, windy, marble, imagemap) are
provided; `imagemap` gets a real trilinear mipmap (the reference's lookup
is todo!(), src/textures/imagemap.rs:102; mipmap.rs:215-232 is the spec).

A TextureTable is a packed SoA: every texture row has a kind, parameter
scalars, and (for image maps) an atlas slot. Evaluation is a masked
type-switch returning (..., 3) — evaluated only for the kinds present.
Perlin noise follows texture.rs:214-300 (gradient noise on a permuted
lattice; our permutation comes from the stateless hash, no table).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Float, Int, clamp, lerp
from ..core import rng

TEX_CONSTANT = 0   # value (stored inline in the material column; id -1)
TEX_SCALE = 1      # tex1 * scale
TEX_MIX = 2        # lerp(amount, v1, v2)
TEX_BILERP = 3     # bilinear of 4 corner values over uv
TEX_UV = 4         # (u, v, 0)
TEX_CHECKER2D = 5  # v1/v2 by parity of floor(su)+floor(sv)
TEX_CHECKER3D = 6  # parity in 3D world coords
TEX_DOTS = 7       # polka dots
TEX_FBM = 8        # fbm noise (scalar → rgb splat)
TEX_WRINKLED = 9   # turbulence
TEX_WINDY = 10     # windy waves
TEX_MARBLE = 11    # marble via sin warp of fbm
TEX_IMAGE = 12     # mipmapped image lookup


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TextureTable:
    kind: jnp.ndarray       # (K,) int32
    v1: jnp.ndarray         # (K, 3) primary color/value
    v2: jnp.ndarray         # (K, 3) secondary color
    v3: jnp.ndarray         # (K, 3) bilerp v01 corner
    v4: jnp.ndarray         # (K, 3) bilerp v11 corner
    su: jnp.ndarray         # (K,) u scale
    sv: jnp.ndarray         # (K,) v scale
    octaves: jnp.ndarray    # (K,) int32 noise octaves
    omega: jnp.ndarray      # (K,) noise roughness
    scale: jnp.ndarray      # (K,) scalar (marble variation / dots radius)
    ref1: jnp.ndarray       # (K,) int32 nested texture id (-1 → v1)
    ref2: jnp.ndarray       # (K,) int32 nested texture id (-1 → v2)
    atlas_slot: jnp.ndarray  # (K,) int32 image atlas slot or -1
    # mip atlas: flat QUAD-PACKED chain (S, T, 12). Entry (slot,
    # lvl_off[l] + y*sz_l + x) holds the texel's whole 2x2 wrap-around
    # neighborhood [c00 c01 c10 c11] (3 channels each), so one bilinear
    # tap = ONE row gather instead of four (TPU gather cost is per-row;
    # the 4x texel duplication costs 4/3 of a plain chain and far less
    # than the old repeat-upsampled (S,L,H,W,3) pyramid). Levels are
    # stored at their own dyadic size (mipmap.rs:76-181 pyramid).
    atlas: jnp.ndarray
    atlas_sizes: jnp.ndarray  # (S, 2) int32 base (h, w)
    lvl_size: jnp.ndarray     # (L,) int32 per-level edge length
    lvl_off: jnp.ndarray      # (L,) int32 per-level flat offset
    kinds_present: tuple = field(metadata=dict(static=True), default=())
    atlas_base: int = field(metadata=dict(static=True), default=1)

    @property
    def count(self):
        return self.kind.shape[0]


class TextureBuilder:
    def __init__(self):
        self.rows = []
        self.images = []

    def _add(self, **kw):
        self.rows.append(kw)
        return len(self.rows) - 1

    def constant(self, value):
        return self._add(kind=TEX_CONSTANT, v1=value)

    def scale(self, tex_id, scale_value):
        return self._add(kind=TEX_SCALE, ref1=tex_id, v1=scale_value)

    def mix(self, tex1, tex2, amount):
        return self._add(kind=TEX_MIX, ref1=tex1, ref2=tex2, scale=amount)

    def bilerp(self, v00, v01, v10, v11):
        return self._add(kind=TEX_BILERP, v1=v00, v3=v01, v2=v10, v4=v11)

    def uv(self):
        return self._add(kind=TEX_UV)

    def checkerboard(self, v1, v2, su=1.0, sv=1.0, dims=2):
        return self._add(kind=TEX_CHECKER2D if dims == 2 else TEX_CHECKER3D,
                         v1=v1, v2=v2, su=su, sv=sv)

    def dots(self, inside, outside, su=1.0, sv=1.0):
        return self._add(kind=TEX_DOTS, v1=inside, v2=outside, su=su, sv=sv)

    def fbm(self, octaves=8, omega=0.5):
        return self._add(kind=TEX_FBM, octaves=octaves, omega=omega)

    def wrinkled(self, octaves=8, omega=0.5):
        return self._add(kind=TEX_WRINKLED, octaves=octaves, omega=omega)

    def windy(self):
        return self._add(kind=TEX_WINDY)

    def marble(self, octaves=8, omega=0.5, scale=1.0, variation=0.2):
        return self._add(kind=TEX_MARBLE, octaves=octaves, omega=omega,
                         su=scale, scale=variation)

    def image(self, img, su=1.0, sv=1.0):
        self.images.append(np.asarray(img, np.float32))
        return self._add(kind=TEX_IMAGE, atlas_slot=len(self.images) - 1, su=su, sv=sv)

    def build(self):
        k = len(self.rows)

        def col(key, default, shape=()):
            out = np.zeros((k,) + shape, np.float32)
            for i, r in enumerate(self.rows):
                v = r.get(key, default)
                out[i] = np.broadcast_to(np.asarray(v, np.float32), shape) if shape else v
            return jnp.asarray(out)

        def icol(key, default):
            return jnp.asarray(np.array([r.get(key, default) for r in self.rows], np.int32))

        atlas, sizes, lvl_size, lvl_off, base = _build_atlas(self.images)
        return TextureTable(
            kind=icol("kind", TEX_CONSTANT),
            v1=col("v1", 1.0, (3,)), v2=col("v2", 0.0, (3,)),
            v3=col("v3", 0.0, (3,)), v4=col("v4", 0.0, (3,)),
            su=col("su", 1.0), sv=col("sv", 1.0),
            octaves=icol("octaves", 8), omega=col("omega", 0.5),
            scale=col("scale", 1.0),
            ref1=icol("ref1", -1), ref2=icol("ref2", -1),
            atlas_slot=icol("atlas_slot", -1),
            atlas=atlas, atlas_sizes=sizes,
            lvl_size=lvl_size, lvl_off=lvl_off, atlas_base=base,
            kinds_present=tuple(sorted({int(r.get("kind", 0)) for r in self.rows})),
        )


def _quad_pack(level):
    """(sz, sz, 3) → (sz·sz, 12): each texel with its wrap-around 2x2
    neighborhood [c00 c01 c10 c11] (the 4 bilinear corners for any
    sample point whose floor cell is this texel)."""
    right = np.roll(level, -1, axis=1)
    down = np.roll(level, -1, axis=0)
    diag = np.roll(down, -1, axis=1)
    q = np.concatenate([level, right, down, diag], axis=-1)
    return q.reshape(-1, 12)


def _build_atlas(images):
    """Pad images to a common pow2 size, build mip pyramids
    (mipmap.rs:76-181; box-filter downsampling), pack each level
    quad-packed into one flat chain (S, T, 12). Returns
    (atlas, sizes, lvl_size, lvl_off, base_size)."""
    if not images:
        return (jnp.zeros((1, 1, 12), Float), jnp.ones((1, 2), Int),
                jnp.ones((1,), Int), jnp.zeros((1,), Int), 1)
    hmax = max(int(2 ** np.ceil(np.log2(i.shape[0]))) for i in images)
    wmax = max(int(2 ** np.ceil(np.log2(i.shape[1]))) for i in images)
    size = max(hmax, wmax)
    levels = int(np.log2(size)) + 1
    lvl_size = np.array([size >> l for l in range(levels)], np.int32)
    lvl_off = np.concatenate([[0], np.cumsum(lvl_size.astype(np.int64) ** 2)[:-1]]).astype(np.int32)
    total = int(np.sum(lvl_size.astype(np.int64) ** 2))
    out = np.zeros((len(images), total, 12), np.float32)
    sizes = np.zeros((len(images), 2), np.int32)
    for s, img in enumerate(images):
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, -1)
        h, w = img.shape[:2]
        sizes[s] = (h, w)
        # resample to (size, size) by nearest (simple; Lanczos later)
        yi = np.clip((np.arange(size) * h / size).astype(int), 0, h - 1)
        xi = np.clip((np.arange(size) * w / size).astype(int), 0, w - 1)
        cur = img[yi][:, xi].astype(np.float32)
        for l in range(levels):
            out[s, lvl_off[l]:lvl_off[l] + lvl_size[l] ** 2] = _quad_pack(cur)
            if l + 1 < levels:
                cur = 0.25 * (cur[0::2, 0::2] + cur[1::2, 0::2]
                              + cur[0::2, 1::2] + cur[1::2, 1::2])
    return (jnp.asarray(out), jnp.asarray(sizes),
            jnp.asarray(lvl_size), jnp.asarray(lvl_off), size)


# ------------------------------------------------------------ noise

def _noise_grad(ix, iy, iz, dx, dy, dz):
    """Gradient contribution at lattice corner — hash-based gradient
    directions (texture.rs grad(), permutation replaced by pcg hash)."""
    h = rng.uniform_u32(ix.astype(jnp.uint32), iy.astype(jnp.uint32),
                        iz.astype(jnp.uint32)) & jnp.uint32(15)
    u = jnp.where(h < 8, dx, dy)
    v = jnp.where(h < 4, dy, jnp.where((h == 12) | (h == 14), dx, dz))
    return jnp.where(h & 1 == 0, u, -u) + jnp.where(h & 2 == 0, v, -v)


def perlin(p):
    """Perlin gradient noise on (..., 3) points → (...,) in ~[-1,1]."""
    pi = jnp.floor(p)
    pf = p - pi
    ix, iy, iz = pi[..., 0].astype(Int), pi[..., 1].astype(Int), pi[..., 2].astype(Int)
    dx, dy, dz = pf[..., 0], pf[..., 1], pf[..., 2]

    def w(t):
        return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)

    wx, wy, wz = w(dx), w(dy), w(dz)
    res = 0.0
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                g = _noise_grad(ix + cx, iy + cy, iz + cz, dx - cx, dy - cy, dz - cz)
                weight = (wx if cx else (1 - wx)) * (wy if cy else (1 - wy)) * (wz if cz else (1 - wz))
                res = res + g * weight
    return res


def fbm_noise(p, octaves, omega):
    """(texture.rs fbm; static max 8 octaves with mask on traced count)."""
    total = jnp.zeros(p.shape[:-1], Float)
    lam = 1.0
    o = 1.0
    for i in range(8):
        m = i < octaves
        total = total + jnp.where(m, o * perlin(p * lam), 0.0)
        lam = lam * 1.99
        o = o * omega
    return total


def turbulence(p, octaves, omega):
    total = jnp.zeros(p.shape[:-1], Float)
    lam = 1.0
    o = 1.0
    for i in range(8):
        m = i < octaves
        total = total + jnp.where(m, o * jnp.abs(perlin(p * lam)), 0.0)
        lam = lam * 1.99
        o = o * omega
    return total


# ------------------------------------------------------------ evaluate

def _level_bilinear(tex, slot, level, u, v):
    """Bilinear lookup at mip `level` (per-lane int): ONE row gather of
    the quad-packed chain yields all four corners (see TextureTable
    docstring)."""
    sz = tex.lvl_size[level]
    off = tex.lvl_off[level]
    szf = sz.astype(Float)
    x = u * szf - 0.5
    y = v * szf - 0.5
    x0 = jnp.floor(x).astype(Int)
    y0 = jnp.floor(y).astype(Int)
    fx = (x - x0.astype(Float))[..., None]
    fy = (y - y0.astype(Float))[..., None]
    x0w = jnp.mod(x0, sz)                                 # wrap (uv % 1 tiling)
    y0w = jnp.mod(y0, sz)
    q = tex.atlas[slot, off + y0w * sz + x0w]             # (..., 12)
    c00, c01 = q[..., 0:3], q[..., 3:6]
    c10, c11 = q[..., 6:9], q[..., 9:12]
    return (1 - fy) * ((1 - fx) * c00 + fx * c01) + fy * ((1 - fx) * c10 + fx * c11)


def _image_lookup(tex: TextureTable, slot, uv, lod=None):
    """Mipmapped atlas lookup: bilinear at level 0 when no LOD is given,
    trilinear between the two bracketing levels otherwise
    (mipmap.rs:215-232 MIPMap::lookup triangle-filter semantics)."""
    s, n_levels = tex.atlas.shape[0], tex.lvl_size.shape[0]
    slot = jnp.clip(slot, 0, s - 1)
    u = uv[..., 0] % 1.0
    v = uv[..., 1] % 1.0
    if lod is None:
        return _level_bilinear(tex, slot, jnp.zeros_like(slot), u, v)
    lod = jnp.clip(lod, 0.0, n_levels - 1 - 1e-4)
    l0 = jnp.floor(lod).astype(Int)
    fl = (lod - l0.astype(Float))[..., None]
    c0 = _level_bilinear(tex, slot, l0, u, v)
    c1 = _level_bilinear(tex, slot, jnp.minimum(l0 + 1, n_levels - 1), u, v)
    return (1.0 - fl) * c0 + fl * c1


def evaluate(tex: TextureTable, tid, uv, p, _depth=0, fp=None):
    """Evaluate texture ids `tid` (N,) at uv (N,2) / world p (N,3) →
    (N, 3). Nested refs resolve one level deep (scale/mix). `fp` is the
    per-lane filter footprint in (unscaled) uv units — the ray-cone
    analog of duvdx/duvdy (interaction.rs:224-385) driving mip LOD."""
    t = jnp.maximum(tid, 0)
    kind = tex.kind[t]
    v1 = tex.v1[t]
    v2 = tex.v2[t]
    su = tex.su[t]
    sv = tex.sv[t]
    out = v1  # constant default
    kp = tex.kinds_present

    if TEX_UV in kp:
        out = jnp.where((kind == TEX_UV)[..., None],
                        jnp.stack([uv[..., 0] % 1.0, uv[..., 1] % 1.0,
                                   jnp.zeros_like(uv[..., 0])], -1), out)
    if TEX_BILERP in kp:
        v3 = tex.v3[t]
        v4 = tex.v4[t]
        u = uv[..., 0:1] % 1.0
        vv = uv[..., 1:2] % 1.0
        bil = (1 - u) * (1 - vv) * v1 + (1 - u) * vv * v3 + u * (1 - vv) * v2 + u * vv * v4
        out = jnp.where((kind == TEX_BILERP)[..., None], bil, out)
    if TEX_CHECKER2D in kp:
        par = (jnp.floor(uv[..., 0] * su) + jnp.floor(uv[..., 1] * sv)).astype(Int) % 2
        out = jnp.where((kind == TEX_CHECKER2D)[..., None],
                        jnp.where((par == 0)[..., None], v1, v2), out)
    if TEX_CHECKER3D in kp:
        par = (jnp.floor(p[..., 0]) + jnp.floor(p[..., 1]) + jnp.floor(p[..., 2])).astype(Int) % 2
        out = jnp.where((kind == TEX_CHECKER3D)[..., None],
                        jnp.where((par == 0)[..., None], v1, v2), out)
    if TEX_DOTS in kp:
        us, vs = uv[..., 0] * su, uv[..., 1] * sv
        cell = jnp.stack([jnp.floor(us + 0.5), jnp.floor(vs + 0.5)], -1)
        cu = rng.uniform_float(cell[..., 0].astype(jnp.uint32), cell[..., 1].astype(jnp.uint32), jnp.uint32(1))
        cv = rng.uniform_float(cell[..., 0].astype(jnp.uint32), cell[..., 1].astype(jnp.uint32), jnp.uint32(2))
        has_dot = rng.uniform_float(cell[..., 0].astype(jnp.uint32), cell[..., 1].astype(jnp.uint32), jnp.uint32(0)) < 0.5
        center_u = cell[..., 0] + (cu - 0.5) * 0.5
        center_v = cell[..., 1] + (cv - 0.5) * 0.5
        d2 = (us - center_u) ** 2 + (vs - center_v) ** 2
        inside = has_dot & (d2 < 0.35 * 0.35)
        out = jnp.where((kind == TEX_DOTS)[..., None],
                        jnp.where(inside[..., None], v1, v2), out)
    if TEX_FBM in kp or TEX_WRINKLED in kp or TEX_WINDY in kp or TEX_MARBLE in kp:
        octv = tex.octaves[t]
        om = tex.omega[t]
        if TEX_FBM in kp:
            n = fbm_noise(p, octv, om)[..., None]
            out = jnp.where((kind == TEX_FBM)[..., None], v1 * (0.5 + 0.5 * n), out)
        if TEX_WRINKLED in kp:
            n = turbulence(p, octv, om)[..., None]
            out = jnp.where((kind == TEX_WRINKLED)[..., None], v1 * n, out)
        if TEX_WINDY in kp:
            strength = jnp.abs(fbm_noise(0.1 * p, jnp.full_like(octv, 3), jnp.full_like(om, 0.5)))
            height = fbm_noise(p, jnp.full_like(octv, 6), jnp.full_like(om, 0.5))
            out = jnp.where((kind == TEX_WINDY)[..., None],
                            v1 * (strength * height)[..., None], out)
        if TEX_MARBLE in kp:
            sc = tex.su[t]
            var = tex.scale[t]
            marble_t = jnp.sin(p[..., 1] * sc * 4.0 + var * fbm_noise(p * sc, octv, om) * 5.0)
            mt = 0.5 + 0.5 * marble_t
            # blend through marble color ramp (texture.rs marble colors)
            c_dark = jnp.array([0.25, 0.25, 0.35], Float)
            c_mid = jnp.array([0.58, 0.58, 0.6], Float)
            c_light = jnp.array([0.9, 0.9, 0.91], Float)
            lo = mt < 0.5
            col = jnp.where(lo[..., None],
                            c_dark + (mt * 2.0)[..., None] * (c_mid - c_dark),
                            c_mid + ((mt - 0.5) * 2.0)[..., None] * (c_light - c_mid))
            out = jnp.where((kind == TEX_MARBLE)[..., None], col, out)
    if TEX_IMAGE in kp:
        suv = jnp.stack([uv[..., 0] * su, uv[..., 1] * sv], -1)
        lod = None
        if fp is not None:
            # footprint in texels of the base level → mip level
            size = tex.atlas_base
            fp_tex = fp * jnp.maximum(su, sv) * size
            lod = jnp.log2(jnp.maximum(fp_tex, 1.0))
        img = _image_lookup(tex, tex.atlas_slot[t], suv, lod=lod)
        out = jnp.where((kind == TEX_IMAGE)[..., None], img, out)
    if _depth == 0 and (TEX_SCALE in kp or TEX_MIX in kp):
        r1 = evaluate(tex, tex.ref1[t], uv, p, _depth=1, fp=fp)
        if TEX_SCALE in kp:
            out = jnp.where((kind == TEX_SCALE)[..., None], r1 * v1, out)
        if TEX_MIX in kp:
            r2 = evaluate(tex, tex.ref2[t], uv, p, _depth=1, fp=fp)
            amt = tex.scale[t][..., None]
            out = jnp.where((kind == TEX_MIX)[..., None],
                            (1.0 - amt) * r1 + amt * r2, out)
    return out


def apply_tex(tex: TextureTable, tid, uv, p, base, fp=None):
    """base where tid < 0, texture value otherwise (material hook)."""
    if tex is None:
        return base
    val = evaluate(tex, tid, uv, p, fp=fp)
    return jnp.where((tid >= 0)[..., None], val, base)
