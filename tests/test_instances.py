"""Instancing + motion blur (VERDICT r3 #4: TransformedPrimitive,
primitive.rs:105-177; AnimatedTransform, transform.rs:2010-2084)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.api import SceneBuilder
from pbrt_tpu.geom import scene as scenemod
from pbrt_tpu.geom import instances as instmod
from pbrt_tpu.core import transform as tfm
from pbrt_tpu.core.types import Float


def _icosphere(r=0.5, sub=1):
    """Small triangulated sphere via subdivided octahedron."""
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], np.float64)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
    for _ in range(sub):
        nv = list(v)
        nf = []
        for a, b, c in f:
            ab = len(nv); nv.append((v[a] + v[b]) / 2)
            bc = len(nv); nv.append((v[b] + v[c]) / 2)
            ca = len(nv); nv.append((v[c] + v[a]) / 2)
            nf += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        v = np.asarray(nv)
        f = np.asarray(nf)
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
    return (v * r).astype(np.float32), f.astype(np.int32)


def _translate(x, y, z):
    m = np.eye(4)
    m[:3, 3] = (x, y, z)
    return m


def test_two_instances_one_mesh_copy():
    """Two instances of one prototype render from ONE stored triangle
    copy; each is hit where placed, with its own material id."""
    verts, idx = _icosphere(0.5, 1)
    b = SceneBuilder()
    m_red = b.matte(kd=(0.8, 0.1, 0.1))
    m_blue = b.matte(kd=(0.1, 0.1, 0.8))
    proto = b.instanced_prototype(verts, idx)
    b.add_instance(proto, m_red, _translate(-1.0, 0.0, 0.0))
    b.add_instance(proto, m_blue, _translate(+1.0, 0.0, 0.0))
    b.point_light((0.0, 3.0, 0.0), (30.0, 30.0, 30.0))
    scene = b.build()

    # one stored copy, two instances
    assert len(scene.instances) == 1
    iset = scene.instances[0]
    assert iset.count == 2
    assert iset.proto.indices.shape[0] == idx.shape[0]

    # rays straight down the z axis at each instance center + between
    o = jnp.asarray([[-1.0, 0.0, -3.0], [1.0, 0.0, -3.0], [0.0, 0.0, -3.0]], Float)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 3, Float)
    hit = scenemod.intersect(scene, o, d)
    hv = np.asarray(hit.valid)
    assert hv[0] and hv[1] and not hv[2]
    assert int(hit.material_id[0]) == m_red
    assert int(hit.material_id[1]) == m_blue
    np.testing.assert_allclose(np.asarray(hit.t)[:2], 2.5, rtol=0.05)
    # world-space normals face the camera (coarse facets: loose bound)
    assert float(hit.ng[0, 2]) < -0.8 and float(hit.ng[1, 2]) < -0.8
    # occlusion sees instances too
    occ = scenemod.occluded(scene, o, d, t_min=jnp.zeros(3), t_max=jnp.full(3, 10.0))
    assert bool(occ[0]) and bool(occ[1]) and not bool(occ[2])


def test_rotated_scaled_instance_normals():
    """A rotated + non-uniformly scaled single-triangle instance returns
    the exact analytic world normal (inverse-transpose path) and hit t."""
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    b = SceneBuilder()
    m = b.matte(kd=(0.5, 0.5, 0.5))
    proto = b.instanced_prototype(verts, idx)
    # rotate 90 deg about x, then the instance scales non-uniformly
    rx = np.eye(4)
    rx[:3, :3] = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float64)
    s = np.eye(4)
    s[:3, :3] = np.diag([2.0, 1.0, 0.5])
    t = rx @ s                       # M = R S: object z-normal → world +y
    b.add_instance(proto, m, t)
    b.point_light((0.0, 3.0, 0.0), (10.0, 10.0, 10.0))
    scene = b.build()
    # the triangle now spans x in [0,2], z in [0,-0.5]? — object (u,v)
    # maps to world (2u, v*0 + ..., ...): hit it from above at a point
    # inside: object (0.25, 0.25, 0) → world (0.5, 0, 0.25)
    o = jnp.asarray([[0.5, 2.0, 0.25]], Float)
    d = jnp.asarray([[0.0, -1.0, 0.0]], Float)
    hit = scenemod.intersect(scene, o, d)
    assert bool(hit.valid[0])
    np.testing.assert_allclose(float(hit.t[0]), 2.0, rtol=1e-4)
    # analytic world normal = R * S^-T * (0,0,1) / |.| = R ẑ = (0,1,0)
    np.testing.assert_allclose(np.abs(np.asarray(hit.ng[0])),
                               [0.0, 1.0, 0.0], atol=1e-4)


def test_animated_instance_interpolates_and_smears():
    """A shutter-open→close moving sphere: time=0 hits at T0, time=1 at
    T1, time=0.5 midway (transform.rs:2010 interpolate); a distributed-
    time render covers the whole sweep (motion blur smear)."""
    verts, idx = _icosphere(0.4, 1)
    iset = instmod.build_instances(
        __import__("pbrt_tpu.geom.types", fromlist=["x"]).TriangleSoA(
            positions=jnp.asarray(verts), indices=jnp.asarray(idx),
            normals=jnp.zeros_like(jnp.asarray(verts)),
            uvs=jnp.zeros((len(verts), 2), Float),
            has_normals=jnp.zeros(len(idx), bool),
            material_id=jnp.zeros(len(idx), jnp.int32),
            light_id=jnp.full(len(idx), -1, jnp.int32)),
        [_translate(-1.0, 0.0, 0.0)], [0], transforms1=[_translate(1.0, 0.0, 0.0)])
    assert iset.animated

    def probe(x, time):
        o = jnp.asarray([[x, 0.0, -3.0]], Float)
        d = jnp.asarray([[0.0, 0.0, 1.0]], Float)
        h, t, _sh = instmod.intersect_one(
            iset, 0, o, d, jnp.asarray([time], Float),
            jnp.zeros(1), jnp.full(1, 100.0, Float))
        return bool(h[0])

    assert probe(-1.0, 0.0) and not probe(-1.0, 1.0)
    assert probe(1.0, 1.0) and not probe(1.0, 0.0)
    assert probe(0.0, 0.5) and not probe(0.0, 0.0) and not probe(0.0, 1.0)

    # render-level smear: coverage across x with sampled times spans the
    # sweep; the static version covers only the T0 ball
    n = 64
    xs = jnp.linspace(-1.6, 1.6, n)
    o = jnp.stack([xs, jnp.zeros(n), jnp.full(n, -3.0)], -1)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], Float), (n, 3))
    times = jnp.asarray(np.random.RandomState(0).rand(n), Float)
    h_blur, _, _ = instmod.intersect_one(iset, 0, o, d, times,
                                         jnp.zeros(n), jnp.full(n, 100.0, Float))
    h_static, _, _ = instmod.intersect_one(iset, 0, o, d, jnp.zeros(n),
                                           jnp.zeros(n), jnp.full(n, 100.0, Float))
    span_blur = np.asarray(xs)[np.asarray(h_blur)]
    span_static = np.asarray(xs)[np.asarray(h_static)]
    assert span_static.max() < 0.0                  # only around x=-1
    assert span_blur.max() > 0.8 and span_blur.min() < -0.8   # full sweep


def test_animated_instance_through_path_integrator():
    """End-to-end: path.li recomputes the shutter time from the sampler
    stream and the animated instance smears in the rendered image."""
    from pbrt_tpu.integrate import driver, path
    from pbrt_tpu.core import samplers as smp
    from pbrt_tpu.cameras.cameras import make_perspective
    verts, idx = _icosphere(0.4, 1)

    def build(animate):
        b = SceneBuilder()
        m = b.matte(kd=(0.05, 0.05, 0.05))   # dark → strong contrast vs env
        proto = b.instanced_prototype(verts, idx)
        b.add_instance(proto, m, _translate(-0.8, 0.0, 0.0),
                       transform1=_translate(0.8, 0.0, 0.0) if animate else None)
        b.infinite_light(radiance=1.0)
        return b.build()

    c2w = tfm.look_at(np.array([0.0, 0.0, -3.0]), np.zeros(3),
                      np.array([0.0, 1.0, 0.0]))
    cam = make_perspective(c2w, 50.0, (48, 48))
    cfg = driver.RenderConfig(width=48, height=48, spp=8, max_depth=2,
                              sampler=smp.SamplerConfig(kind="stratified", spp=8))
    img_a = np.asarray(driver.render(build(True), cam, cfg, path.make_li(cfg)))
    img_s = np.asarray(driver.render(build(False), cam, cfg, path.make_li(cfg)))
    # the dark sphere blocks the env light → dark trail; count columns
    # containing any clearly-darker-than-background pixel
    # smeared columns are only partially covered in time (pixel =
    # shutter average), so use a near-background threshold
    cov_a = (img_a.mean(axis=2).min(axis=0) < 0.9).sum()
    cov_s = (img_s.mean(axis=2).min(axis=0) < 0.9).sum()
    assert cov_a > cov_s + 8, (cov_a, cov_s)
    assert np.isnan(img_a).sum() == 0
