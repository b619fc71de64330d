"""Instanced (and animated) primitives.

TPU-native counterpart of TransformedPrimitive
(src/core/primitive.rs:105-177) + AnimatedTransform interpolation
(src/core/transform.rs:853-2084): a prototype mesh is stored ONCE; each
instance carries a rigid motion decomposed host-side into
(translation, rotation-quaternion, static linear part), interpolated
per-RAY at the lane's shutter time (translation lerp + quaternion
slerp — transform.rs:2010 interpolate semantics). Rays are transformed
into object space WITHOUT renormalising the direction, so the hit t is
shared with world space directly (primitive.rs:130-148); normals return
through the inverse-transpose.

Wavefront formulation: instances are a static python loop (each one
masked-merges into the running best hit) — the analog of the reference's
per-primitive virtual dispatch, but over whole ray wavefronts. The
prototype pool is intersected brute-force (prototypes are expected to be
small; large instanced scenes should flatten into the cluster tracer).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Float, Int, INF
from ..core import vecmath as vm
from . import triangle as trimod


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class InstanceSet:
    proto: Any                # TriangleSoA prototype (one copy)
    q0: jnp.ndarray           # (I, 4) rotation quat at shutter open (w,x,y,z)
    q1: jnp.ndarray           # (I, 4) at shutter close
    t0: jnp.ndarray           # (I, 3) translation at open
    t1: jnp.ndarray           # (I, 3) at close
    lin: jnp.ndarray          # (I, 3, 3) static linear part S (applied first)
    lin_inv: jnp.ndarray      # (I, 3, 3)
    material_id: jnp.ndarray  # (I,)
    # conservative per-instance WORLD AABBs over the whole shutter
    # (primitive.rs world_bound -> motion_bounds analog): the wavefront
    # pre-cull tests rays against these before any brute pass
    bmin: jnp.ndarray = None  # (I, 3)
    bmax: jnp.ndarray = None  # (I, 3)
    light_id: jnp.ndarray = None  # (I,) area-light id or -1
    # static: any instance with q0 != q1 or t0 != t1
    animated: bool = field(metadata=dict(static=True), default=False)

    @property
    def count(self):
        return self.q0.shape[0]


def _polar_rotation(m):
    """Rotation factor of a 3x3 via Higham iteration (transform.rs:264
    decompose analog, host-side numpy)."""
    r = m.astype(np.float64)
    for _ in range(32):
        r_next = 0.5 * (r + np.linalg.inv(r.T))
        if np.max(np.abs(r_next - r)) < 1e-12:
            r = r_next
            break
        r = r_next
    return r


def _mat_to_quat(r):
    """Rotation matrix → quaternion (w, x, y, z), host-side."""
    tr = np.trace(r)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        return np.array([0.25 * s, (r[2, 1] - r[1, 2]) / s,
                         (r[0, 2] - r[2, 0]) / s, (r[1, 0] - r[0, 1]) / s])
    i = int(np.argmax(np.diag(r)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(1.0 + r[i, i] - r[j, j] - r[k, k], 1e-12)) * 2
    q = np.zeros(4)
    q[0] = (r[k, j] - r[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (r[j, i] + r[i, j]) / s
    q[1 + k] = (r[k, i] + r[i, k]) / s
    return q


def _decompose(m):
    """4x4 → (quat, translation, linear S) with M[:3,:3] = R @ S."""
    m = np.asarray(m, np.float64)
    t = m[:3, 3]
    r = _polar_rotation(m[:3, :3])
    s = r.T @ m[:3, :3]
    return _mat_to_quat(r), t, s


def _aabb_corners(lo, hi):
    return np.array([[x, y, z] for x in (lo[0], hi[0])
                     for y in (lo[1], hi[1]) for z in (lo[2], hi[2])])


def build_instances(proto, transforms, materials, transforms1=None,
                    light_ids=None):
    """proto: TriangleSoA (ONE copy of the mesh). transforms: list of
    4x4 object→world at shutter open; transforms1: optional list at
    shutter close (motion blur). materials: per-instance material id.
    light_ids: optional per-instance area-light id (emissive
    instances)."""
    if proto.shade_rec is None and proto.indices.shape[0]:
        proto = proto.with_shade_rec()
    n = len(transforms)
    transforms1 = transforms if transforms1 is None else transforms1
    q0 = np.zeros((n, 4))
    q1 = np.zeros((n, 4))
    t0 = np.zeros((n, 3))
    t1 = np.zeros((n, 3))
    lin = np.zeros((n, 3, 3))
    for i in range(n):
        qa, ta, sa = _decompose(transforms[i])
        qb, tb, sb = _decompose(transforms1[i])
        # keep shortest-arc slerp (quaternion.rs:31)
        if np.dot(qa, qb) < 0:
            qb = -qb
        q0[i], t0[i], lin[i] = qa, ta, sa
        q1[i], t1[i] = qb, tb
        if not np.allclose(sa, sb, atol=1e-5):
            raise ValueError("animated scale/shear is not supported; "
                             "keep the linear part constant over the shutter")
    animated = bool(np.any(np.abs(q0 - q1) > 1e-7) or np.any(np.abs(t0 - t1) > 1e-7))
    # conservative world AABB per instance: proto AABB corners through
    # transforms sampled across the shutter (affine image of a box is
    # bounded by the image of its corners; slerp sampled at 5 times plus
    # slack covers the rotation sweep — same scheme as the scene bounds)
    pos = np.asarray(proto.positions) if proto.indices.shape[0] else np.zeros((1, 3))
    plo, phi = pos.min(0), pos.max(0)
    corners = _aabb_corners(plo, phi)
    bmin = np.zeros((n, 3))
    bmax = np.zeros((n, 3))
    for i in range(n):
        pts = []
        n_times = 5 if (np.any(np.abs(q0[i] - q1[i]) > 1e-7)
                        or np.any(np.abs(t0[i] - t1[i]) > 1e-7)) else 1
        for u in np.linspace(0.0, 1.0, max(n_times, 1)):
            d01 = float(np.clip(np.dot(q0[i], q1[i]), -1.0, 1.0))
            th = np.arccos(abs(d01))
            if th < 1e-6 or n_times == 1:
                q = q0[i]
            else:
                q = (np.sin((1 - u) * th) * q0[i] + np.sin(u * th) * q1[i])                     / np.sin(th)
            q = q / np.linalg.norm(q)
            w, x, y, z = q
            r = np.array([[1-2*(y*y+z*z), 2*(x*y-w*z), 2*(x*z+w*y)],
                          [2*(x*y+w*z), 1-2*(x*x+z*z), 2*(y*z-w*x)],
                          [2*(x*z-w*y), 2*(y*z+w*x), 1-2*(x*x+y*y)]])
            t = (1 - u) * t0[i] + u * t1[i]
            pts.append(corners @ (r @ lin[i]).T + t)
        allp = np.concatenate(pts, 0)
        c = (allp.min(0) + allp.max(0)) / 2
        half = (allp.max(0) - allp.min(0)) / 2
        pad = 0.05 if n_times > 1 else 1e-5
        bmin[i] = c - half * (1 + pad) - 1e-5
        bmax[i] = c + half * (1 + pad) + 1e-5
    if light_ids is None:
        light_ids = np.full(n, -1, np.int32)
    return InstanceSet(
        proto=proto,
        q0=jnp.asarray(q0, Float), q1=jnp.asarray(q1, Float),
        t0=jnp.asarray(t0, Float), t1=jnp.asarray(t1, Float),
        lin=jnp.asarray(lin, Float),
        lin_inv=jnp.asarray(np.linalg.inv(lin), Float),
        material_id=jnp.asarray(np.asarray(materials, np.int32)),
        bmin=jnp.asarray(bmin, Float), bmax=jnp.asarray(bmax, Float),
        light_id=jnp.asarray(np.asarray(light_ids, np.int32)),
        animated=animated)


def _slerp(q0, q1, u):
    """Quaternion slerp, u (N,) (quaternion.rs:31)."""
    d = jnp.clip(jnp.sum(q0 * q1), -1.0, 1.0)
    theta = jnp.arccos(d)
    s = jnp.sin(theta)
    near = s < 1e-4
    w0 = jnp.where(near, 1.0 - u, jnp.sin((1.0 - u) * theta) / jnp.maximum(s, 1e-9))
    w1 = jnp.where(near, u, jnp.sin(u * theta) / jnp.maximum(s, 1e-9))
    q = w0[..., None] * q0 + w1[..., None] * q1
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def _qrot(q, v):
    """Rotate v (N,3) by quaternion q (N,4) (w,x,y,z)."""
    u = q[..., 1:4]
    w = q[..., 0:1]
    c = jnp.cross(u, v)
    return v + 2.0 * (w * c + jnp.cross(u, c))


def _qrot_inv(q, v):
    qc = q * jnp.asarray([1.0, -1.0, -1.0, -1.0], Float)
    return _qrot(qc, v)


def _instance_frames(iset, i, time, n):
    """(q, trans) of instance i at per-lane `time` (None → shutter open)."""
    if time is None or not iset.animated:
        q = jnp.broadcast_to(iset.q0[i], (n, 4))
        tr = jnp.broadcast_to(iset.t0[i], (n, 3))
        return q, tr
    u = jnp.clip(jnp.broadcast_to(time, (n,)), 0.0, 1.0)
    q = _slerp(iset.q0[i], iset.q1[i], u)
    tr = (1.0 - u)[..., None] * iset.t0[i] + u[..., None] * iset.t1[i]
    return q, tr


def _ray_to_object(iset, i, o, d, q, tr):
    """World ray → instance object space; direction NOT renormalised so
    t carries over unchanged (primitive.rs:130-148)."""
    o_r = _qrot_inv(q, o - tr)
    d_r = _qrot_inv(q, d)
    o_l = jnp.einsum("ij,...j->...i", iset.lin_inv[i], o_r)
    d_l = jnp.einsum("ij,...j->...i", iset.lin_inv[i], d_r)
    return o_l, d_l


def intersect_one(iset, i, o, d, time, t_min, t_max):
    """Closest hit of instance i. Returns (hit, t, shading dict)."""
    n = o.shape[0]
    q, tr = _instance_frames(iset, i, time, n)
    o_l, d_l = _ray_to_object(iset, i, o, d, q, tr)
    h, t, idx, b1, b2 = trimod.intersect_brute(iset.proto, o_l, d_l, t_min, t_max)
    if iset.proto.shade_rec is not None:
        p, ng, ns, uv, dpdu, uvs, _m, _l = trimod.shading_from_rec(
            iset.proto, idx, b1, b2)
    else:
        p, ng, ns, uv, dpdu, uvs = trimod.shading_geometry(
            iset.proto, o_l, d_l, idx, t, b1, b2)
    # back to world: points through M, normals through M^-T = R @ S^-T
    lin = iset.lin[i]
    lin_it = iset.lin_inv[i].T
    p_w = o + t[..., None] * d               # exact (t is world-parameterised)
    ng_w = vm.normalize(_qrot(q, jnp.einsum("ij,...j->...i", lin_it, ng)))
    ns_w = vm.normalize(_qrot(q, jnp.einsum("ij,...j->...i", lin_it, ns)))
    dpdu_w = vm.normalize(_qrot(q, jnp.einsum("ij,...j->...i", lin, dpdu)))
    return h, t, dict(p=p_w, ng=ng_w, ns=ns_w, uv=uv, dpdu=dpdu_w,
                      uv_scale=uvs, prim_id=idx)


def entered(iset, i, o, d, t_min, t_max):
    """Wavefront pre-cull: does the ray's (t_min, t_max) window enter
    instance i's conservative world AABB (slab test; the wavefront
    analog of the BVH testing TransformedPrimitive::world_bound,
    bvh.rs:842)?"""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d < 0, -1e-12, 1e-12), d)
    t0 = (iset.bmin[i] - o) * inv
    t1 = (iset.bmax[i] - o) * inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1) * 1.0001
    return (tn <= tf) & (tf >= t_min) & (tn <= t_max)


def occluded_one(iset, i, o, d, time, t_min, t_max):
    n = o.shape[0]
    q, tr = _instance_frames(iset, i, time, n)
    o_l, d_l = _ray_to_object(iset, i, o, d, q, tr)
    return trimod.occluded_brute(iset.proto, o_l, d_l, t_min, t_max)
