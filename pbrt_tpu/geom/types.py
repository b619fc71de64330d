"""Geometry SoA containers and the hit record.

TPU-native counterpart of src/core/{shape,primitive,interaction}.rs. The
reference dispatches `Shape`/`Primitive` trait objects per ray
(primitive.rs:17-30); we keep two typed SoA pools — triangles and
quadrics — and a dense `Hit` record, the wavefront analog of
`SurfaceInteraction` (interaction.rs:224-385).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..core.types import Float, Int, INF

# quadric kinds
QUAD_SPHERE = 0
QUAD_DISK = 1
QUAD_CYLINDER = 2
QUAD_CONE = 3
QUAD_PARABOLOID = 4
QUAD_HYPERBOLOID = 5


class TriangleSoA(NamedTuple):
    """All scene triangles, world space (meshes are pre-transformed on the
    host like the reference bakes object_to_world into TriangleMesh,
    src/shapes/triangle.rs:17-44)."""
    positions: jnp.ndarray    # (V, 3)
    indices: jnp.ndarray      # (T, 3) int32
    normals: jnp.ndarray      # (V, 3); zeros → use geometric normal
    uvs: jnp.ndarray          # (V, 2)
    has_normals: jnp.ndarray  # (T,) bool
    material_id: jnp.ndarray  # (T,) int32
    light_id: jnp.ndarray     # (T,) int32, -1 = not emissive
    # packed per-triangle shading record, built by make_scene: TPU
    # gather cost is per-row (nearly independent of width), so hit
    # shading does ONE (N, 28) record gather instead of ~13 narrow ones.
    # layout: 0:9 p0 p1 p2 | 9:15 uv0 uv1 uv2 | 15:24 n0 n1 n2 |
    #         24 has_ns | 25 material_id | 26 light_id | 27 pad
    shade_rec: Optional[jnp.ndarray] = None   # (T, 28) or None

    @property
    def count(self):
        return self.indices.shape[0]

    def corners(self):
        i = self.indices
        return self.positions[i[:, 0]], self.positions[i[:, 1]], self.positions[i[:, 2]]

    def with_shade_rec(self):
        """Attach the packed shading record (host-side numpy)."""
        import numpy as np
        if self.shade_rec is not None or not self.indices.shape[0]:
            return self
        pos = np.asarray(self.positions, np.float32)
        idx = np.asarray(self.indices)
        nrm = np.asarray(self.normals, np.float32)
        uvs = np.asarray(self.uvs, np.float32)
        t = idx.shape[0]
        rec = np.zeros((t, 28), np.float32)
        rec[:, 0:3] = pos[idx[:, 0]]
        rec[:, 3:6] = pos[idx[:, 1]]
        rec[:, 6:9] = pos[idx[:, 2]]
        rec[:, 9:11] = uvs[idx[:, 0]]
        rec[:, 11:13] = uvs[idx[:, 1]]
        rec[:, 13:15] = uvs[idx[:, 2]]
        rec[:, 15:18] = nrm[idx[:, 0]]
        rec[:, 18:21] = nrm[idx[:, 1]]
        rec[:, 21:24] = nrm[idx[:, 2]]
        rec[:, 24] = np.asarray(self.has_normals).astype(np.float32)
        rec[:, 25] = np.asarray(self.material_id).astype(np.float32)
        rec[:, 26] = np.asarray(self.light_id).astype(np.float32)
        return self._replace(shade_rec=jnp.asarray(rec))


class QuadricSoA(NamedTuple):
    """Spheres + other quadrics. Stored with object↔world transforms so
    partial quadrics (zmin/zmax/phi_max clipping) stay exact
    (src/shapes/sphere.rs:28-226 etc.)."""
    kind: jnp.ndarray          # (Q,) int32
    obj_to_world: jnp.ndarray  # (Q, 4, 4)
    world_to_obj: jnp.ndarray  # (Q, 4, 4)
    # params[:, 0]=radius, 1=z_min, 2=z_max, 3=phi_max,
    # 4=extra (disk inner radius / cone height / hyperboloid r2), 5=extra2
    params: jnp.ndarray        # (Q, 6)
    material_id: jnp.ndarray   # (Q,) int32
    light_id: jnp.ndarray      # (Q,) int32

    @property
    def count(self):
        return self.kind.shape[0]


class Hit(NamedTuple):
    """Wavefront hit record (SoA SurfaceInteraction)."""
    valid: jnp.ndarray        # (N,) bool — hit anything
    t: jnp.ndarray            # (N,)
    p: jnp.ndarray            # (N, 3)
    ng: jnp.ndarray           # (N, 3) geometric normal (unit)
    ns: jnp.ndarray           # (N, 3) shading normal (unit)
    uv: jnp.ndarray           # (N, 2)
    dpdu: jnp.ndarray         # (N, 3) primary tangent (unit, ⊥ ns)
    wo: jnp.ndarray           # (N, 3) -ray.d
    material_id: jnp.ndarray  # (N,) int32
    light_id: jnp.ndarray     # (N,) int32 (area light or -1)
    prim_kind: jnp.ndarray    # (N,) int32: 0 tri, 1 quadric
    prim_id: jnp.ndarray      # (N,) int32
    uv_scale: jnp.ndarray     # (N,) uv units per world unit at the hit —
    #   sqrt(uv_area / world_area) of the surface parametrization; drives
    #   ray-cone texture LOD (the duvdx/duvdy analog, interaction.rs:224-385)


def empty_triangles():
    z3 = jnp.zeros((0, 3), Float)
    return TriangleSoA(z3, jnp.zeros((0, 3), Int), z3, jnp.zeros((0, 2), Float),
                       jnp.zeros((0,), bool), jnp.zeros((0,), Int), jnp.zeros((0,), Int))


def empty_quadrics():
    return QuadricSoA(jnp.zeros((0,), Int), jnp.zeros((0, 4, 4), Float),
                      jnp.zeros((0, 4, 4), Float), jnp.zeros((0, 6), Float),
                      jnp.zeros((0,), Int), jnp.zeros((0,), Int))
