"""Scene: the pytree of everything the kernels consume, plus the
top-level intersect/occlusion dispatch.

TPU-native counterpart of src/core/scene.rs (facade over aggregate +
lights, scene.rs:11-72) — but as data: a Scene is a NamedTuple of SoA
arrays (triangles, quadrics, BVH, material/light/media tables). The
differentiable leaves live in `materials`/`lights`/`media`/camera.

Intersection dispatch selects between the brute-force all-pairs path
(small scenes, oracle) and BVH traversal (meshes), combining triangle and
quadric pools — the analog of BVHAccel over mixed primitives
(src/accelerators/bvh.rs:828-932 + primitive.rs:33-102).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Any

import jax
import jax.numpy as jnp

from ..core.types import Float, Int, INF, RAY_EPS
from ..core import vecmath as vm
from . import triangle as trimod
from . import quadrics as quadmod
from .types import TriangleSoA, QuadricSoA, Hit, empty_triangles, empty_quadrics


class Scene(NamedTuple):
    tri: TriangleSoA
    quad: QuadricSoA
    bvh: Any                  # Optional[BVHArrays] — None → brute force
    clusters: Any             # Optional[cluster.ClusterSet] — preferred tracer
    materials: Any            # shade.materials.MaterialTable
    lights: Any               # lights.types.LightTable
    media: Any                # shade.media.MediumTable or None
    textures: Any             # shade.textures.TextureTable or None
    light_distrib: Any        # lights.distrib.SpatialLightDistribution or None
    world_center: jnp.ndarray
    world_radius: jnp.ndarray
    # tuple of geom.instances.InstanceSet (TransformedPrimitive /
    # AnimatedTransform analog, primitive.rs:105-177) or None
    instances: Any = None


def make_scene(tri=None, quad=None, materials=None, lights=None, media=None, bvh=None,
               textures=None, clusters=None, light_distrib=None, instances=None):
    import numpy as np
    tri = tri if tri is not None else empty_triangles()
    if tri.indices.shape[0] and tri.shade_rec is None:
        tri = tri.with_shade_rec()
    quad = quad if quad is not None else empty_quadrics()
    # world bounds from geometry (host-side, static)
    pts = []
    if tri.positions.shape[0]:
        pts.append(np.asarray(tri.positions))
    if quad.kind.shape[0]:
        # conservative per-quadric object-space AABB: xy extent from the
        # largest radius-like parameter, z extent from [z_min, z_max]
        # widened by the radius (sphere stores z_min/z_max = ∓r); the 8
        # corners are pushed through obj_to_world. Fixes cones/
        # hyperboloids whose extent is NOT params[:,0] alone
        # (cone.rs/hyperboloid.rs object_bound analogs).
        o2w = np.asarray(quad.obj_to_world)
        prm = np.asarray(quad.params)
        knd = np.asarray(quad.kind)
        r_xy = np.max(np.abs(prm[:, [0, 4, 5]]), axis=1)
        # hyperboloid a(x²+y²) − c z² = 1 (params e0=a, e1=c): the xy
        # radius grows with |z| as sqrt((1 + c z²)/a), so the generic
        # max-of-params bound is NOT conservative (hyperboloid.rs
        # object_bound analog; ADVICE r2).
        from .types import QUAD_HYPERBOLOID
        z2 = np.maximum(prm[:, 1] ** 2, prm[:, 2] ** 2)
        r_hyp = np.sqrt(np.maximum(1.0 + np.abs(prm[:, 5]) * z2, 0.0)
                        / np.maximum(np.abs(prm[:, 4]), 1e-12))
        r_xy = np.where(knd == QUAD_HYPERBOLOID, r_hyp, r_xy)
        ext = np.maximum(np.abs(prm[:, 0]), np.abs(prm[:, 4]))
        z_lo = np.minimum(prm[:, 1], -ext)
        z_hi = np.maximum(prm[:, 2], ext)
        for sx in (-1, 1):
            for sy in (-1, 1):
                for z in (z_lo, z_hi):
                    corner = np.stack([sx * r_xy, sy * r_xy, z], axis=-1)
                    w = np.einsum("qij,qj->qi", o2w[:, :3, :3], corner) + o2w[:, :3, 3]
                    pts.append(w)
    if pts:
        allp = np.concatenate(pts, axis=0)
        lo, hi = allp.min(0), allp.max(0)
        center = (lo + hi) / 2.0
        radius = float(np.linalg.norm(hi - center)) + 1e-4
    else:
        center, radius = np.zeros(3), 1.0
    if instances:
        for iset in instances:
            pos = np.asarray(iset.proto.positions)
            for i in range(iset.count):
                lin = np.asarray(iset.lin[i])
                q0 = np.asarray(iset.q0[i])
                q1 = np.asarray(iset.q1[i])
                t0 = np.asarray(iset.t0[i])
                t1 = np.asarray(iset.t1[i])
                # slerp-interpolated rotations can sweep vertices OUTSIDE
                # the two endpoint point clouds (reference MotionBounds is
                # conservative, transform.rs:2032); sample intermediate
                # shutter times too so animated-instance world bounds
                # cover the whole sweep (advisor r4)
                n_times = 2 if np.allclose(q0, q1) else 5
                for s in np.linspace(0.0, 1.0, n_times):
                    d01 = float(np.clip(np.dot(q0, q1), -1.0, 1.0))
                    qb = q1 if d01 >= 0 else -q1
                    th = np.arccos(abs(d01))
                    if th < 1e-6:
                        q = q0
                    else:
                        q = (np.sin((1 - s) * th) * q0 + np.sin(s * th) * qb) \
                            / np.sin(th)
                    q = q / np.linalg.norm(q)
                    t = (1 - s) * t0 + s * t1
                    w, x, y, z = q
                    r = np.array([[1-2*(y*y+z*z), 2*(x*y-w*z), 2*(x*z+w*y)],
                                  [2*(x*y+w*z), 1-2*(x*x+z*z), 2*(y*z-w*x)],
                                  [2*(x*z-w*y), 2*(y*z+w*x), 1-2*(x*x+y*y)]])
                    pts.append(pos @ (r @ lin).T + t)
        allp = np.concatenate(pts, axis=0)
        lo, hi = allp.min(0), allp.max(0)
        center = (lo + hi) / 2.0
        radius = float(np.linalg.norm(hi - center)) + 1e-4
        if any(s.animated for s in instances):
            # chord-sampling the slerp leaves a small sliver between
            # samples; a few % of slack keeps the bound conservative
            # (only loosens env far-sphere / BDPT density conventions)
            radius *= 1.05
    return Scene(tri=tri, quad=quad, bvh=bvh, clusters=clusters, materials=materials,
                 lights=lights, media=media, textures=textures,
                 light_distrib=light_distrib,
                 world_center=jnp.asarray(center, Float),
                 world_radius=jnp.asarray(radius, Float),
                 instances=tuple(instances) if instances else None)


def _empty_hit(o, d):
    n = o.shape[:-1]
    z3 = jnp.zeros(n + (3,), Float)
    return Hit(valid=jnp.zeros(n, bool), t=jnp.full(n, INF, Float), p=z3,
               ng=z3, ns=z3, uv=jnp.zeros(n + (2,), Float), dpdu=z3,
               wo=-d, material_id=jnp.full(n, -1, Int),
               light_id=jnp.full(n, -1, Int), prim_kind=jnp.zeros(n, Int),
               prim_id=jnp.full(n, -1, Int), uv_scale=jnp.ones(n, Float))


def intersect(scene: Scene, o, d, t_min=None, t_max=None, active=None,
              time=None, _tri_result=None) -> Hit:
    """Closest-hit query for a wavefront of rays o/d (N, 3).

    `active` (optional bool mask) marks live lanes: dead lanes get
    t_max < t_min, sort to the end of the coherence order, land in
    zero-coverage tiles, and cost the traversal kernels nothing — free
    wavefront compaction with no gather/scatter reshuffle.

    `_tri_result` (internal): precomputed triangle-pool traversal output
    (hit, t, idx, b1, b2) from a fused query (see intersect_occluded) —
    the shading-record assembly and quadric pass still run here."""
    n = o.shape[:-1]
    t_min = jnp.broadcast_to(jnp.asarray(RAY_EPS if t_min is None else t_min, Float), n)
    t_max = jnp.broadcast_to(jnp.asarray(INF if t_max is None else t_max, Float), n)
    if active is not None:
        t_max = jnp.where(active, t_max, -1.0)

    hit = _empty_hit(o, d)
    best_t = t_max

    if scene.tri.count:
        if _tri_result is not None:
            t_hit, t_t, t_idx, b1, b2 = _tri_result
        elif scene.clusters is not None:
            from . import cluster as clmod
            if clmod.pallas_enabled(scene.clusters):
                t_hit, t_t, t_idx, b1, b2 = clmod.intersect_pallas(
                    scene.clusters, o, d, t_min, best_t)
            else:
                t_hit, t_t, t_idx, b1, b2 = clmod.intersect(
                    scene.clusters, scene.tri, o, d, t_min, best_t)
        elif scene.bvh is not None:
            from . import bvh as bvhmod
            t_hit, t_t, t_idx, b1, b2 = bvhmod.traverse_closest(
                scene.bvh, scene.tri, o, d, t_min, best_t)
        else:
            t_hit, t_t, t_idx, b1, b2 = trimod.intersect_brute(scene.tri, o, d, t_min, best_t)
        if scene.tri.shade_rec is not None:
            p, ng, ns, uv, dpdu, uvs_, mat_id, light_id = trimod.shading_from_rec(
                scene.tri, t_idx, b1, b2)
        else:
            p, ng, ns, uv, dpdu, uvs_ = trimod.shading_geometry(
                scene.tri, o, d, t_idx, t_t, b1, b2)
            mat_id = scene.tri.material_id[t_idx]
            light_id = scene.tri.light_id[t_idx]
        take = t_hit & (t_t < best_t)
        hit = Hit(valid=hit.valid | take,
                  t=jnp.where(take, t_t, hit.t),
                  p=jnp.where(take[..., None], p, hit.p),
                  ng=jnp.where(take[..., None], ng, hit.ng),
                  ns=jnp.where(take[..., None], ns, hit.ns),
                  uv=jnp.where(take[..., None], uv, hit.uv),
                  dpdu=jnp.where(take[..., None], dpdu, hit.dpdu),
                  wo=hit.wo,
                  material_id=jnp.where(take, mat_id, hit.material_id),
                  light_id=jnp.where(take, light_id, hit.light_id),
                  prim_kind=jnp.where(take, 0, hit.prim_kind),
                  prim_id=jnp.where(take, t_idx, hit.prim_id),
                  uv_scale=jnp.where(take, uvs_, hit.uv_scale))
        best_t = jnp.where(take, t_t, best_t)

    if scene.quad.count:
        q_hit, q_t, q_idx, p, ng, uv, dpdu = quadmod.intersect_brute(
            scene.quad, o, d, t_min, best_t)
        take = q_hit & (q_t < best_t)
        hit = Hit(valid=hit.valid | take,
                  t=jnp.where(take, q_t, hit.t),
                  p=jnp.where(take[..., None], p, hit.p),
                  ng=jnp.where(take[..., None], ng, hit.ng),
                  ns=jnp.where(take[..., None], ng, hit.ns),
                  uv=jnp.where(take[..., None], uv, hit.uv),
                  dpdu=jnp.where(take[..., None], dpdu, hit.dpdu),
                  wo=hit.wo,
                  material_id=jnp.where(take, scene.quad.material_id[q_idx], hit.material_id),
                  light_id=jnp.where(take, scene.quad.light_id[q_idx], hit.light_id),
                  prim_kind=jnp.where(take, 1, hit.prim_kind),
                  prim_id=jnp.where(take, q_idx, hit.prim_id),
                  # quadric uv spans the full surface: ~1/r per uv unit
                  uv_scale=jnp.where(
                      take, 1.0 / jnp.maximum(scene.quad.params[q_idx, ..., 0], 1e-6),
                      hit.uv_scale))
        best_t = jnp.where(take, q_t, best_t)

    if scene.instances:
        # TransformedPrimitive pass (primitive.rs:105-177): each instance
        # masked-merges its object-space hit; `time` drives the
        # AnimatedTransform interpolation (transform.rs:2010). A slab
        # pre-cull against the instance's conservative world AABB (the
        # wavefront analog of the BVH bound test, bvh.rs:842) gates each
        # instance behind lax.cond — per-bounce cost scales with ENTERED
        # instances only, not the instance count (VERDICT r4 #5).
        from . import instances as instmod
        o_flat = o.reshape(-1, 3)
        d_flat = d.reshape(-1, 3)
        t_flat = None if time is None else jnp.broadcast_to(time, n).reshape(-1)
        tmin_flat = t_min.reshape(-1)
        for iset in scene.instances:
            for i in range(iset.count):
                enter = instmod.entered(iset, i, o_flat, d_flat, tmin_flat,
                                        best_t.reshape(-1))

                def _do(args, iset=iset, i=i, enter=enter):
                    hit, best_t = args
                    h_i, t_i, sh = instmod.intersect_one(
                        iset, i, o_flat, d_flat, t_flat, tmin_flat,
                        jnp.where(enter, best_t.reshape(-1), -1.0))
                    h_i = h_i.reshape(n)
                    t_i = t_i.reshape(n)
                    take = h_i & (t_i < best_t)
                    tk3 = take[..., None]
                    rs = lambda a, k=3: a.reshape(n + ((k,) if k else ()))
                    hit = Hit(valid=hit.valid | take,
                              t=jnp.where(take, t_i, hit.t),
                              p=jnp.where(tk3, rs(sh["p"]), hit.p),
                              ng=jnp.where(tk3, rs(sh["ng"]), hit.ng),
                              ns=jnp.where(tk3, rs(sh["ns"]), hit.ns),
                              uv=jnp.where(tk3, rs(sh["uv"], 2)[..., :2], hit.uv),
                              dpdu=jnp.where(tk3, rs(sh["dpdu"]), hit.dpdu),
                              wo=hit.wo,
                              material_id=jnp.where(take, iset.material_id[i],
                                                    hit.material_id),
                              light_id=jnp.where(take, iset.light_id[i],
                                                 hit.light_id),
                              prim_kind=jnp.where(take, 2, hit.prim_kind),
                              prim_id=jnp.where(take, rs(sh["prim_id"], 0),
                                                hit.prim_id),
                              uv_scale=jnp.where(take, rs(sh["uv_scale"], 0),
                                                 hit.uv_scale))
                    return hit, jnp.where(take, t_i, best_t)

                hit, best_t = jax.lax.cond(jnp.any(enter), _do,
                                           lambda a: a, (hit, best_t))
    return hit


def intersect_occluded(scene: Scene, o, d, o_sh, d_sh, tmax_sh,
                       active=None, active_sh=None, time=None):
    """Fused closest-hit (o, d) + any-hit shadow (o_sh, d_sh) query.

    When the pallas cluster tracer is active, both wavefronts share ONE
    coherence sort, ONE coverage pass and ONE kernel launch (shadow lanes
    run in any-hit mode) — halving the per-bounce traversal overhead of
    the path integrator's NEE + extension pattern (path.rs:100-152 traces
    them as two separate scene queries). Falls back to separate
    intersect/occluded calls otherwise. Returns (Hit, occ)."""
    use_fused = (scene.tri.count and scene.clusters is not None)
    if use_fused:
        from . import cluster as clmod
        use_fused = clmod.pallas_enabled(scene.clusters)
    if not use_fused:
        return (intersect(scene, o, d, active=active, time=time),
                occluded(scene, o_sh, d_sh, t_max=tmax_sh, active=active_sh,
                         time=time))
    from . import cluster as clmod
    n = o.shape[:-1]
    n_sh = o_sh.shape[:-1]
    t_min = jnp.broadcast_to(jnp.asarray(RAY_EPS, Float), n)
    t_max = jnp.full(n, INF, Float)
    if active is not None:
        t_max = jnp.where(active, t_max, -1.0)
    tmin_sh = jnp.broadcast_to(jnp.asarray(RAY_EPS, Float), n_sh)
    tmax_sh = jnp.broadcast_to(jnp.asarray(tmax_sh, Float), n_sh)
    if active_sh is not None:
        tmax_sh = jnp.where(active_sh, tmax_sh, -1.0)
    tri_result, occ = clmod.intersect_occluded_pallas(
        scene.clusters, o, d, t_min, t_max,
        o_sh, d_sh, tmin_sh, tmax_sh)
    hit = intersect(scene, o, d, active=active, time=time,
                    _tri_result=tri_result)
    if scene.quad.count:
        occ = occ | quadmod.occluded_brute(scene.quad, o_sh, d_sh,
                                           tmin_sh, tmax_sh)
    if scene.instances:
        from . import instances as instmod
        t_flat = None if time is None else \
            jnp.broadcast_to(time, n_sh).reshape(-1)
        for iset in scene.instances:
            for i in range(iset.count):
                occ_i = instmod.occluded_one(
                    iset, i, o_sh.reshape(-1, 3), d_sh.reshape(-1, 3), t_flat,
                    tmin_sh.reshape(-1), tmax_sh.reshape(-1))
                occ = occ | occ_i.reshape(n_sh)
    return hit, occ


def occluded(scene: Scene, o, d, t_min=None, t_max=None, active=None,
             time=None):
    """Any-hit (shadow) query (scene.rs:57 intersect_p). `active` marks
    live lanes (see `intersect`)."""
    n = o.shape[:-1]
    t_min = jnp.broadcast_to(jnp.asarray(RAY_EPS if t_min is None else t_min, Float), n)
    t_max = jnp.broadcast_to(jnp.asarray(INF if t_max is None else t_max, Float), n)
    if active is not None:
        t_max = jnp.where(active, t_max, -1.0)
    occ = jnp.zeros(n, bool)
    if scene.tri.count:
        if scene.clusters is not None:
            from . import cluster as clmod
            if clmod.pallas_enabled(scene.clusters):
                occ = occ | clmod.occluded_pallas(scene.clusters, o, d,
                                                  t_min, t_max)
            else:
                occ = occ | clmod.occluded(scene.clusters, scene.tri, o, d,
                                           t_min, t_max)
        elif scene.bvh is not None:
            from . import bvh as bvhmod
            occ = occ | bvhmod.traverse_any(scene.bvh, scene.tri, o, d, t_min, t_max)
        else:
            occ = occ | trimod.occluded_brute(scene.tri, o, d, t_min, t_max)
    if scene.quad.count:
        occ = occ | quadmod.occluded_brute(scene.quad, o, d, t_min, t_max)
    if scene.instances:
        from . import instances as instmod
        t_flat = None if time is None else jnp.broadcast_to(time, n).reshape(-1)
        o_flat = o.reshape(-1, 3)
        d_flat = d.reshape(-1, 3)
        tmin_flat = t_min.reshape(-1)
        tmax_flat = t_max.reshape(-1)
        for iset in scene.instances:
            for i in range(iset.count):
                # shadow lanes already occluded need no further work
                enter = instmod.entered(iset, i, o_flat, d_flat, tmin_flat,
                                        jnp.where(occ.reshape(-1), -1.0,
                                                  tmax_flat))

                def _do(occ, iset=iset, i=i, enter=enter):
                    occ_i = instmod.occluded_one(
                        iset, i, o_flat, d_flat, t_flat, tmin_flat,
                        jnp.where(enter, tmax_flat, -1.0))
                    return occ | occ_i.reshape(n)

                occ = jax.lax.cond(jnp.any(enter), _do, lambda x: x, occ)
    return occ
