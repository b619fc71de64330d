"""BASELINE config 3 scene: ~80k-triangle mesh in a lit box, BVH.

Uses the procedural displaced-icosphere stand-in (no network to fetch the
Stanford bunny; the geometry load matches: ~70-80k triangles under a BVH).
A real PLY (e.g. the bunny) can be swapped in via `mesh_scene(ply=...)`.
"""
from __future__ import annotations

import numpy as np

from pbrt_tpu.api import SceneBuilder
from pbrt_tpu.cameras import make_perspective
from pbrt_tpu.core import transform as tf
from pbrt_tpu.geom.meshio import bench_blob, read_ply


def _wood_image(size=512):
    """Procedural plank image baked to a texture — gives the bench real
    mipmapped texture gathers (BASELINE config 3 'textured materials')."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    rings = 0.5 + 0.5 * np.sin((x * 9.0 + 0.35 * np.sin(y * 23.0)) * np.pi * 2.0)
    planks = (np.floor(y * 8.0) % 2.0)
    base = np.stack([0.45 + 0.25 * rings, 0.28 + 0.16 * rings,
                     0.14 + 0.08 * rings], axis=-1)
    return (base * (0.8 + 0.2 * planks[..., None])).astype(np.float32)


def mesh_scene(subdivisions=6, ply=None, use_bvh=True, metal_blob=False,
               textured=True):
    b = SceneBuilder()
    white = b.matte(kd=(0.73, 0.73, 0.73))
    if textured:
        wood = b.textures.image(_wood_image(), su=3.0, sv=3.0)
        import pbrt_tpu.shade.materials as _mm
        floor_mat = b.material(kind=_mm.MAT_MATTE, kd=(1.0, 1.0, 1.0),
                               kd_tex=wood, sigma=0.0)
    else:
        floor_mat = white
    if metal_blob:
        blob_mat = b.metal(roughness=0.05)
    else:
        blob_mat = b.plastic(kd=(0.4, 0.25, 0.12), ks=(0.3, 0.3, 0.3), roughness=0.08)

    if ply is not None:
        mesh = read_ply(ply)
        v, f = mesh["vertices"], mesh["indices"]
        vn = mesh.get("normals")
        # normalise into the box
        lo, hi = v.min(0), v.max(0)
        v = (v - (lo + hi) / 2.0) / max(hi - lo) * 0.6
        v = v + np.array([0.5, 0.3, -0.5], np.float32)
    else:
        v, f, vn = bench_blob(subdivisions)
        v = v + np.array([0.5, 0.35, -0.5], np.float32)
    b.add_mesh(v, f, blob_mat, normals=vn)

    s = 1.0
    b.add_quad([0, 0, 0], [s, 0, 0], [s, 0, -s], [0, 0, -s], floor_mat)  # floor
    b.add_quad([0, s, 0], [0, s, -s], [s, s, -s], [s, s, 0], white)     # ceiling
    b.add_quad([0, 0, -s], [s, 0, -s], [s, s, -s], [0, s, -s], white)   # back
    e, c, y = 0.25, s / 2, s - 1e-3
    b.area_light_quad([c - e, y, -c + e], [c - e, y, -c - e],
                      [c + e, y, -c - e], [c + e, y, -c + e],
                      radiance=(14.0, 14.0, 14.0))
    b.use_bvh = use_bvh
    return b.build()


def mesh_camera(resolution):
    c2w = tf.look_at(pos=np.array([0.5, 0.5, 1.35]),
                     look=np.array([0.5, 0.35, -0.5]),
                     up=np.array([0.0, 1.0, 0.0]))
    return make_perspective(c2w, fov_deg=42.0, resolution=resolution)
