"""Unit tests: vector math, transforms, distributions, warps, RNG.

Mirrors the kernel-unit-test strategy of SURVEY.md §4.1 (closed forms and
statistical properties; the reference ships no renderer tests)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrt_tpu.core import vecmath as vm
from pbrt_tpu.core import transform as tf
from pbrt_tpu.core import sampling as smp
from pbrt_tpu.core import rng
from pbrt_tpu.core.types import find_interval, quadratic


def test_normalize_and_dot():
    v = jnp.array([[3.0, 4.0, 0.0], [0.0, 0.0, 2.0]])
    n = vm.normalize(v)
    np.testing.assert_allclose(vm.length(n), [1.0, 1.0], rtol=1e-6)
    np.testing.assert_allclose(vm.dot(n[0], n[1]), 0.0, atol=1e-7)


def test_coordinate_system_orthonormal():
    key = np.random.RandomState(0)
    v = vm.normalize(jnp.asarray(key.randn(100, 3), jnp.float32))
    t, b = vm.coordinate_system(v)
    np.testing.assert_allclose(vm.dot(t, v), 0.0, atol=1e-5)
    np.testing.assert_allclose(vm.dot(b, v), 0.0, atol=1e-5)
    np.testing.assert_allclose(vm.dot(t, b), 0.0, atol=1e-5)
    np.testing.assert_allclose(vm.length(t), 1.0, rtol=1e-5)


def test_reflect_refract():
    n = jnp.array([0.0, 0.0, 1.0])
    wo = vm.normalize(jnp.array([1.0, 0.0, 1.0]))
    r = vm.reflect(wo, n)
    np.testing.assert_allclose(np.asarray(r), [-0.70710677, 0.0, 0.70710677], rtol=1e-5)
    ok, wt = vm.refract(wo, n, jnp.asarray(1.0 / 1.5, jnp.float32))
    assert bool(ok)
    # Snell: sinθt = sinθi/1.5
    sin_t = np.sqrt(wt[0] ** 2 + wt[1] ** 2) / np.linalg.norm(np.asarray(wt))
    np.testing.assert_allclose(sin_t, np.sin(np.pi / 4) / 1.5, rtol=1e-5)


def test_transform_roundtrip():
    t = tf.translate(jnp.array([1.0, 2.0, 3.0])) @ tf.rotate(35.0, jnp.array([0.3, 1.0, 0.2])) \
        @ tf.scale(jnp.array([2.0, 2.0, 2.0]))
    p = jnp.asarray(np.random.RandomState(1).randn(50, 3), jnp.float32)
    q = t.inverse().apply_point(t.apply_point(p))
    np.testing.assert_allclose(np.asarray(q), np.asarray(p), atol=1e-4)


def test_normal_transform_preserves_orthogonality():
    t = tf.scale(jnp.array([2.0, 1.0, 0.5])) @ tf.rotate_x(30.0)
    # tangent v on surface, normal n orthogonal
    v = jnp.array([1.0, 0.0, 0.0])
    n = jnp.array([0.0, 0.0, 1.0])
    v2 = t.apply_vector(v)
    n2 = t.apply_normal(n)
    np.testing.assert_allclose(float(vm.dot(v2, n2)), 0.0, atol=1e-6)


def test_look_at_maps_origin_to_pos():
    c2w = tf.look_at(jnp.array([1.0, 2.0, 3.0]), jnp.array([0.0, 0.0, 0.0]),
                     jnp.array([0.0, 1.0, 0.0]))
    o = c2w.apply_point(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(o), [1.0, 2.0, 3.0], atol=1e-5)
    # +z in camera space looks toward the target
    d = c2w.apply_vector(jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(vm.normalize(d)),
                               np.asarray(vm.normalize(jnp.array([-1.0, -2.0, -3.0]))), atol=1e-5)


def test_quadratic():
    has, t0, t1 = quadratic(jnp.asarray(1.0), jnp.asarray(-5.0), jnp.asarray(6.0))
    assert bool(has)
    np.testing.assert_allclose([float(t0), float(t1)], [2.0, 3.0], rtol=1e-6)
    has, _, _ = quadratic(jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(1.0))
    assert not bool(has)


def test_find_interval():
    cdf = jnp.array([0.0, 0.1, 0.4, 1.0])
    x = jnp.array([0.05, 0.1, 0.39, 0.9, 0.0, 1.0])
    idx = find_interval(cdf, x)
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 1, 2, 0, 2])


def test_distribution1d_matches_pdf():
    func = jnp.array([1.0, 3.0, 2.0, 0.0])
    d = smp.Distribution1D.build(func)
    u = jnp.asarray(np.random.RandomState(0).rand(200000), jnp.float32)
    x, pdf, _ = d.sample_continuous(u)
    # histogram ∝ func
    hist, _ = np.histogram(np.asarray(x), bins=4, range=(0, 1))
    frac = hist / hist.sum()
    np.testing.assert_allclose(frac, [1 / 6, 3 / 6, 2 / 6, 0.0], atol=5e-3)
    # pdf at sampled points should equal func/int
    np.testing.assert_allclose(np.asarray(pdf[:5]),
                               np.asarray(func / 1.5)[np.clip((np.asarray(x[:5]) * 4).astype(int), 0, 3)],
                               rtol=1e-4)


def test_distribution2d_marginals():
    f = np.zeros((4, 8), np.float32)
    f[1] = 2.0
    f[3] = 1.0
    d = smp.Distribution2D.build(jnp.asarray(f))
    u = jnp.asarray(np.random.RandomState(0).rand(100000, 2), jnp.float32)
    p, pdf = d.sample_continuous(u)
    ys = np.asarray(p[..., 1])
    hist, _ = np.histogram(ys, bins=4, range=(0, 1))
    np.testing.assert_allclose(hist / hist.sum(), [0, 2 / 3, 0, 1 / 3], atol=6e-3)
    assert np.all(np.asarray(pdf) > 0)


@pytest.mark.parametrize("warp,pdf_fn,domain", [
    ("hemisphere", None, None), ("sphere", None, None), ("cosine", None, None)])
def test_warp_statistics(warp, pdf_fn, domain):
    u = jnp.asarray(np.random.RandomState(3).rand(100000, 2), jnp.float32)
    if warp == "hemisphere":
        w = smp.uniform_sample_hemisphere(u)
        assert np.all(np.asarray(w[..., 2]) >= 0)
    elif warp == "sphere":
        w = smp.uniform_sample_sphere(u)
        np.testing.assert_allclose(float(jnp.mean(w[..., 2])), 0.0, atol=0.01)
    else:
        w = smp.cosine_sample_hemisphere(u)
        # E[cosθ] = 2/3 under p = cosθ/π
        np.testing.assert_allclose(float(jnp.mean(w[..., 2])), 2.0 / 3.0, atol=0.01)
    np.testing.assert_allclose(np.asarray(vm.length(w)), 1.0, atol=1e-4)


def test_concentric_disk_in_unit_disk():
    u = jnp.asarray(np.random.RandomState(4).rand(10000, 2), jnp.float32)
    p = smp.concentric_sample_disk(u)
    r2 = np.asarray(p[..., 0] ** 2 + p[..., 1] ** 2)
    assert r2.max() <= 1.0 + 1e-6
    # uniform density: mean radius² = 1/2
    np.testing.assert_allclose(r2.mean(), 0.5, atol=0.01)


def test_mis_power_heuristic():
    w = smp.power_heuristic(1.0, jnp.asarray(2.0), 1.0, jnp.asarray(1.0))
    np.testing.assert_allclose(float(w), 4.0 / 5.0, rtol=1e-6)


def test_rng_deterministic_and_uniform():
    keys = jnp.arange(100000, dtype=jnp.uint32)
    u = rng.uniform_float(jnp.uint32(7), keys, jnp.uint32(0), jnp.uint32(0))
    u2 = rng.uniform_float(jnp.uint32(7), keys, jnp.uint32(0), jnp.uint32(0))
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u2))
    a = np.asarray(u)
    assert 0.0 <= a.min() and a.max() < 1.0
    np.testing.assert_allclose(a.mean(), 0.5, atol=0.005)
    np.testing.assert_allclose(a.var(), 1.0 / 12.0, atol=0.005)


def test_rng_numpy_mirror_bitwise():
    keys = np.arange(1000, dtype=np.uint32)
    a = np.asarray(rng.uniform_float(jnp.uint32(3), jnp.asarray(keys), jnp.uint32(5), jnp.uint32(2)))
    b = rng.np_uniform_float(np.uint32(3), keys, np.uint32(5), np.uint32(2))
    np.testing.assert_array_equal(a, b)


def test_fourier_table_lambertian():
    from pbrt_tpu.shade.fourier import make_lambertian_table, fourier_f
    tbl = make_lambertian_table((0.6, 0.4, 0.2))
    wo = jnp.asarray([[0.2, 0.1, 0.97]])
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    wi = jnp.asarray([[-0.3, 0.2, 0.93]])
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    f = np.asarray(fourier_f(tbl, wo, wi))[0]
    np.testing.assert_allclose(f, np.array([0.6, 0.4, 0.2]) / np.pi, rtol=2e-2)
