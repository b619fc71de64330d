"""Tile×cluster tracer vs brute force (the same validation contract the
BVH traversal has — SURVEY.md §4.1)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.geom import cluster as clmod
from pbrt_tpu.geom import triangle as trimod
from tests.test_geometry import _tri_soa, _random_soup


def _rand_rays(n, seed, spread=10.0):
    r = np.random.RandomState(seed)
    o = jnp.asarray(r.rand(n, 3) * spread, jnp.float32)
    d = r.randn(n, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d, jnp.float32)


def test_cluster_matches_brute_closest():
    verts, idx = _random_soup(700, seed=5)
    tri = _tri_soa(verts, idx)
    cs = clmod.build_clusters(verts, idx, k=32)
    o, d = _rand_rays(777, seed=6)
    t_min = jnp.full((777,), 1e-4, jnp.float32)
    t_max = jnp.full((777,), np.inf, jnp.float32)
    bh, bt, bi, bb1, bb2 = trimod.intersect_brute(tri, o, d, t_min, t_max)
    ch, ct, ci, cb1, cb2 = clmod.intersect(cs, tri, o, d, t_min, t_max)
    # Plücker vs Möller–Trumbore may disagree on borderline edge hits
    agree = np.asarray(bh) == np.asarray(ch)
    assert agree.mean() > 0.995, agree.mean()
    m = np.asarray(bh) & np.asarray(ch)
    np.testing.assert_allclose(np.asarray(bt)[m], np.asarray(ct)[m], rtol=1e-3)
    assert (np.asarray(bi)[m] == np.asarray(ci)[m]).mean() > 0.99


def test_cluster_matches_brute_anyhit():
    verts, idx = _random_soup(400, seed=7)
    tri = _tri_soa(verts, idx)
    cs = clmod.build_clusters(verts, idx, k=64)
    o, d = _rand_rays(512, seed=8)
    t_min = jnp.full((512,), 1e-4, jnp.float32)
    t_max = jnp.full((512,), 5.0, jnp.float32)
    occ_b = trimod.occluded_brute(tri, o, d, t_min, t_max)
    occ_c = clmod.occluded(cs, tri, o, d, t_min, t_max)
    assert (np.asarray(occ_b) == np.asarray(occ_c)).mean() > 0.995


def test_cluster_2d_lane_shape():
    verts, idx = _random_soup(100, seed=9)
    tri = _tri_soa(verts, idx)
    cs = clmod.build_clusters(verts, idx, k=16)
    o, d = _rand_rays(6 * 50, seed=10)
    o = o.reshape(6, 50, 3)
    d = d.reshape(6, 50, 3)
    t_min = jnp.full((6, 50), 1e-4, jnp.float32)
    t_max = jnp.full((6, 50), np.inf, jnp.float32)
    ch, ct, ci, _, _ = clmod.intersect(cs, tri, o, d, t_min, t_max)
    bh, bt, bi, _, _ = trimod.intersect_brute(tri, o, d, t_min, t_max)
    assert (np.asarray(bh) == np.asarray(ch)).mean() > 0.99


def test_pallas_fused_intersect_occluded_matches_separate():
    """Fused closest-hit + any-hit launch (interpret mode) vs brute force
    on both halves, including dead lanes on each side."""
    verts, idx = _random_soup(600, seed=31)
    tri = _tri_soa(verts, idx)
    cs = clmod.build_clusters(verts, idx, k=128)
    o, d = _rand_rays(500, seed=32)
    o_sh, d_sh = _rand_rays(400, seed=33)
    r = np.random.RandomState(34)
    t_min = jnp.full((500,), 1e-4, jnp.float32)
    # ~20% dead lanes on each side (t_max < t_min → compacted out)
    t_max = jnp.asarray(np.where(r.rand(500) < 0.2, -1.0, np.inf), jnp.float32)
    tmin_sh = jnp.full((400,), 1e-4, jnp.float32)
    tmax_sh = jnp.asarray(np.where(r.rand(400) < 0.2, -1.0, 6.0), jnp.float32)

    (ph, pt, pi, _, _), occ = clmod.intersect_occluded_pallas(
        cs, o, d, t_min, t_max, o_sh, d_sh, tmin_sh, tmax_sh,
        interpret=True)
    bh, bt, bi, _, _ = trimod.intersect_brute(tri, o, d, t_min, t_max)
    occ_b = trimod.occluded_brute(tri, o_sh, d_sh, tmin_sh, tmax_sh)
    assert (np.asarray(bh) == np.asarray(ph)).mean() > 0.995
    both = np.asarray(bh) & np.asarray(ph)
    assert (np.asarray(bi)[both] == np.asarray(pi)[both]).mean() > 0.99
    m = both & (np.asarray(bi) == np.asarray(pi))
    np.testing.assert_allclose(np.asarray(bt)[m], np.asarray(pt)[m], rtol=1e-3)
    assert (np.asarray(occ_b) == np.asarray(occ)).mean() > 0.995
    # dead lanes must come back unhit / unoccluded
    dead_e = np.asarray(t_max) < 0
    dead_s = np.asarray(tmax_sh) < 0
    assert not np.asarray(ph)[dead_e].any()
    assert not np.asarray(occ)[dead_s].any()


def test_pallas_kernel_interpret_matches_brute():
    """Pallas per-tile kernel (interpret mode) vs brute force."""
    verts, idx = _random_soup(600, seed=21)
    tri = _tri_soa(verts, idx)
    cs = clmod.build_clusters(verts, idx, k=128)
    o, d = _rand_rays(700, seed=22)
    t_min = jnp.full((700,), 1e-4, jnp.float32)
    t_max = jnp.full((700,), np.inf, jnp.float32)
    bh, bt, bi, bb1, bb2 = trimod.intersect_brute(tri, o, d, t_min, t_max)
    ph, pt, pi, pb1, pb2 = clmod.intersect_pallas(cs, o, d, t_min, t_max,
                                                  interpret=True)
    assert (np.asarray(bh) == np.asarray(ph)).mean() > 0.995
    both = np.asarray(bh) & np.asarray(ph)
    assert (np.asarray(bi)[both] == np.asarray(pi)[both]).mean() > 0.99
    m = both & (np.asarray(bi) == np.asarray(pi))
    np.testing.assert_allclose(np.asarray(bt)[m], np.asarray(pt)[m], rtol=1e-3)
    # the kernel's Plücker-volume barycentrics must match Möller–Trumbore
    np.testing.assert_allclose(np.asarray(bb1)[m], np.asarray(pb1)[m], atol=2e-3)
    np.testing.assert_allclose(np.asarray(bb2)[m], np.asarray(pb2)[m], atol=2e-3)


def test_pallas_anyhit_multiblock_mask_freeze():
    """Regression (r5): in multi-block lane-compacted rounds, lanes
    occluded in an earlier block must NOT renumber the round's ranks —
    the per-round mask is frozen at block 0. Trigger: one coherent
    beam wider than LC_NB (>=129 lanes covering the same clusters) with
    finite shadow windows so early occlusions happen; the pre-fix
    kernel missed ~10% of occlusions here."""
    from pbrt_tpu.kernels import cluster_pallas as kp
    verts, idx = _random_soup(900, seed=11)
    tri = _tri_soa(verts, idx)
    cs = clmod.build_clusters(verts, idx)
    n = 512                    # two tiles at the test TILE=256
    r = np.random.RandomState(4)
    # parallel beam through the soup: same octant + tight origin cell →
    # one tile, every lane covering the same cluster list
    o = jnp.asarray(np.stack([np.full(n, -5.0),
                              r.rand(n) * 10.0, r.rand(n) * 10.0], 1),
                    jnp.float32)
    d = jnp.asarray(np.tile([[1.0, 0.0, 0.0]], (n, 1))
                    + r.randn(n, 3) * 0.02, jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_min = jnp.zeros(n)
    t_max = jnp.asarray(5.0 + r.rand(n) * 12.0, jnp.float32)
    occ_ref = np.asarray(trimod.occluded_brute(tri, o, d, t_min, t_max))
    occ = np.asarray(clmod.occluded_pallas(cs, o, d, t_min, t_max,
                                           interpret=True))
    np.testing.assert_array_equal(occ, occ_ref)
