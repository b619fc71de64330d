"""Geometry tests: Möller–Trumbore vs closed forms, quadrics, BVH vs
brute force (SURVEY.md §4.1)."""
import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.geom import triangle as trimod
from pbrt_tpu.geom import quadrics as quadmod
from pbrt_tpu.geom import bvh as bvhmod
from pbrt_tpu.geom.types import TriangleSoA, QuadricSoA, QUAD_SPHERE
from pbrt_tpu.core.types import INF


def _tri_soa(verts, idx):
    verts = jnp.asarray(verts, jnp.float32)
    idx = jnp.asarray(idx, jnp.int32)
    t = idx.shape[0]
    return TriangleSoA(verts, idx, jnp.zeros_like(verts),
                       jnp.zeros((verts.shape[0], 2), jnp.float32),
                       jnp.zeros((t,), bool), jnp.zeros((t,), jnp.int32),
                       jnp.full((t,), -1, jnp.int32))


def test_moller_trumbore_analytic():
    # unit triangle in z=0 plane
    o = jnp.array([[0.25, 0.25, 1.0], [2.0, 2.0, 1.0], [0.25, 0.25, -1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]] * 3)
    p0 = jnp.array([0.0, 0.0, 0.0])
    p1 = jnp.array([1.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 1.0, 0.0])
    hit, t, b1, b2 = trimod.moller_trumbore(o, d, p0, p1, p2,
                                            jnp.zeros(3), jnp.full(3, INF))
    assert list(np.asarray(hit)) == [True, False, False]  # 3rd points away
    np.testing.assert_allclose(float(t[0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose([float(b1[0]), float(b2[0])], [0.25, 0.25], rtol=1e-5)


def test_sphere_intersect_analytic():
    q = QuadricSoA(
        kind=jnp.array([QUAD_SPHERE], jnp.int32),
        obj_to_world=jnp.eye(4)[None].astype(jnp.float32),
        world_to_obj=jnp.eye(4)[None].astype(jnp.float32),
        params=jnp.array([[1.0, -1.0, 1.0, 2 * np.pi, 0, 0]], jnp.float32),
        material_id=jnp.zeros(1, jnp.int32), light_id=jnp.full((1,), -1, jnp.int32))
    o = jnp.array([[0.0, 0.0, 3.0], [0.0, 2.0, 3.0]])
    d = jnp.array([[0.0, 0.0, -1.0]] * 2)
    hit, t, idx, p, ng, uv, dpdu = quadmod.intersect_brute(
        q, o, d, jnp.zeros(2), jnp.full(2, INF))
    assert list(np.asarray(hit)) == [True, False]
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p[0]), [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ng[0]), [0, 0, 1], atol=1e-5)


def test_partial_sphere_z_clip():
    q = QuadricSoA(
        kind=jnp.array([QUAD_SPHERE], jnp.int32),
        obj_to_world=jnp.eye(4)[None].astype(jnp.float32),
        world_to_obj=jnp.eye(4)[None].astype(jnp.float32),
        params=jnp.array([[1.0, -0.5, 0.5, 2 * np.pi, 0, 0]], jnp.float32),
        material_id=jnp.zeros(1, jnp.int32), light_id=jnp.full((1,), -1, jnp.int32))
    # ray along -z through the pole: z=1 is clipped, should hit z=0.5 band edge? no — misses band
    o = jnp.array([[0.0, 0.0, 3.0], [3.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [-1.0, 0.0, 0.0]])
    hit, t, *_ = quadmod.intersect_brute(q, o, d, jnp.zeros(2), jnp.full(2, INF))
    assert list(np.asarray(hit)) == [False, True]
    np.testing.assert_allclose(float(t[1]), 2.0, rtol=1e-5)


def _random_soup(n_tris, seed=0):
    r = np.random.RandomState(seed)
    centers = r.rand(n_tris, 3).astype(np.float32) * 10
    verts = (centers[:, None, :] + 0.5 * (r.rand(n_tris, 3, 3) - 0.5)).astype(np.float32)
    verts = verts.reshape(-1, 3)
    idx = np.arange(3 * n_tris, dtype=np.int32).reshape(-1, 3)
    return verts, idx


def test_bvh_matches_brute_force():
    verts, idx = _random_soup(500)
    tri = _tri_soa(verts, idx)
    bvh = bvhmod.build_bvh(verts, idx)
    r = np.random.RandomState(1)
    n = 512
    o = jnp.asarray(r.rand(n, 3) * 10, jnp.float32)
    d = jnp.asarray(r.randn(n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_min = jnp.full((n,), 1e-4, jnp.float32)
    t_max = jnp.full((n,), np.inf, jnp.float32)
    bh, bt, bidx, bb1, bb2 = trimod.intersect_brute(tri, o, d, t_min, t_max)
    vh, vt, vidx, vb1, vb2 = bvhmod.traverse_closest(bvh, tri, o, d, t_min, t_max)
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(vh))
    m = np.asarray(bh)
    np.testing.assert_allclose(np.asarray(bt)[m], np.asarray(vt)[m], rtol=1e-4)
    # same triangle (modulo exact ties)
    same = np.asarray(bidx)[m] == np.asarray(vidx)[m]
    assert same.mean() > 0.99


def test_bvh_any_hit_matches():
    verts, idx = _random_soup(300, seed=2)
    tri = _tri_soa(verts, idx)
    bvh = bvhmod.build_bvh(verts, idx)
    r = np.random.RandomState(3)
    n = 256
    o = jnp.asarray(r.rand(n, 3) * 10, jnp.float32)
    d = jnp.asarray(r.randn(n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_min = jnp.full((n,), 1e-4, jnp.float32)
    t_max = jnp.full((n,), 4.0, jnp.float32)
    occ_b = trimod.occluded_brute(tri, o, d, t_min, t_max)
    occ_v = bvhmod.traverse_any(bvh, tri, o, d, t_min, t_max)
    np.testing.assert_array_equal(np.asarray(occ_b), np.asarray(occ_v))


def test_bvh_shadow_rays_respect_tmax():
    verts, idx = _random_soup(100, seed=4)
    tri = _tri_soa(verts, idx)
    bvh = bvhmod.build_bvh(verts, idx)
    o = jnp.asarray(np.full((16, 3), 5.0), jnp.float32)
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (16, 1))
    t_min = jnp.full((16,), 1e-4, jnp.float32)
    occ_short = bvhmod.traverse_any(bvh, tri, o, d, t_min, jnp.full((16,), 1e-3, jnp.float32))
    assert not bool(np.asarray(occ_short).any())


def test_kdtree_matches_brute_force():
    from pbrt_tpu.geom import kdtree as kdmod
    verts, idx = _random_soup(300, seed=11)
    tri = _tri_soa(verts, idx)
    kd = kdmod.build_kdtree(verts, idx)
    r = np.random.RandomState(12)
    n = 256
    o = jnp.asarray(r.rand(n, 3) * 10, jnp.float32)
    d = jnp.asarray(r.randn(n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_min = jnp.full((n,), 1e-4, jnp.float32)
    t_max = jnp.full((n,), np.inf, jnp.float32)
    bh, bt, bi, _, _ = trimod.intersect_brute(tri, o, d, t_min, t_max)
    kh, kt, ki, _, _ = kdmod.traverse_closest(kd, tri, o, d, t_min, t_max)
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(kh))
    m = np.asarray(bh)
    np.testing.assert_allclose(np.asarray(bt)[m], np.asarray(kt)[m], rtol=1e-4)
