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


def test_many_instances_precull():
    """VERDICT r4 #5: a 100-instance field must (a) intersect correctly
    and (b) be gated by the per-instance AABB pre-cull so per-bounce
    cost scales with ENTERED instances, not the instance count. The
    entered-count is asserted directly from the slab masks the dispatch
    uses to skip instances via lax.cond."""
    verts, idx = _icosphere(0.4, 1)
    b = SceneBuilder()
    m = b.matte(kd=(0.6, 0.6, 0.6))
    proto = b.instanced_prototype(verts, idx)
    rng = np.random.RandomState(7)
    centers = np.stack([rng.uniform(-20, 20, 100),
                        rng.uniform(-20, 20, 100),
                        rng.uniform(-40, -5, 100)], axis=1)
    for c in centers:
        b.add_instance(proto, m, _translate(*c))
    b.point_light((0.0, 30.0, 0.0), (900.0, 900.0, 900.0))
    scene = b.build()
    iset = scene.instances[0]

    # narrow ray bundle aimed at instance 0 only
    n = 64
    o = jnp.asarray(np.tile(centers[0] + [0, 0, 20], (n, 1)), Float)
    jitter = rng.uniform(-0.05, 0.05, (n, 3)).astype(np.float32)
    d = jnp.asarray((centers[0] - (centers[0] + [0, 0, 20])) + jitter, Float)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hit = scenemod.intersect(scene, o, d)
    assert bool(jnp.all(hit.valid)), "bundle aimed at instance 0 must hit"
    # the pre-cull must admit only a handful of the 100 instances
    tmin = jnp.zeros(n, Float)
    tmax = jnp.full(n, 1e30, Float)
    entered = sum(int(jnp.any(instmod.entered(iset, i, o, d, tmin, tmax)))
                  for i in range(iset.count))
    assert entered <= 5, entered

    # brute comparison on a wider bundle: pre-cull must not change hits
    o2 = jnp.asarray(np.tile([[0.0, 0.0, 20.0]], (n, 1)), Float)
    dirs = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    dirs[:, 2] = -np.abs(dirs[:, 2]) - 0.2
    d2 = jnp.asarray(dirs, Float)
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    hit2 = scenemod.intersect(scene, o2, d2)
    # reference: disable the cull by inflating the AABBs
    import dataclasses
    big = dataclasses.replace(
        iset, bmin=jnp.full_like(iset.bmin, -1e30),
        bmax=jnp.full_like(iset.bmax, 1e30))
    scene_nocull = scene._replace(instances=(big,))
    hit_ref = scenemod.intersect(scene_nocull, o2, d2)
    np.testing.assert_array_equal(np.asarray(hit2.valid), np.asarray(hit_ref.valid))
    np.testing.assert_allclose(np.asarray(hit2.t), np.asarray(hit_ref.t), rtol=1e-6)


def test_emissive_instance():
    """Emissive instances: the transformed prototype is registered as a
    tri area light (explicit corners), so NEE samples it and BSDF hits
    pick up Le with the right MIS weight — cross-checked against the
    IDENTICAL scene built without instancing (beyond-reference feature:
    TransformedPrimitive::get_area_light is None, primitive.rs:161)."""
    from pbrt_tpu.integrate import driver, path
    from pbrt_tpu.core import samplers as smp

    quad_v = np.array([[-0.3, 0, -0.3], [0.3, 0, -0.3],
                       [0.3, 0, 0.3], [-0.3, 0, 0.3]], np.float32)
    quad_i = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    lift = np.eye(4); lift[:3, 3] = (0.5, 0.99, -0.5)

    def build(instanced):
        b = SceneBuilder()
        white = b.matte(kd=(0.73, 0.73, 0.73))
        s = 1.0
        b.add_quad([0, 0, 0], [s, 0, 0], [s, 0, -s], [0, 0, -s], white)
        b.add_quad([0, 0, -s], [s, 0, -s], [s, s, -s], [0, s, -s], white)
        if instanced:
            black = b.matte(kd=(0.0, 0.0, 0.0))
            proto = b.instanced_prototype(quad_v, quad_i)
            b.add_instance(proto, black, lift, emit=(10.0, 10.0, 10.0))
        else:
            m = np.asarray(lift)
            vw = quad_v @ m[:3, :3].T.astype(np.float32) + m[:3, 3].astype(np.float32)
            b.area_light_mesh(vw, quad_i, radiance=(10.0, 10.0, 10.0))
        return b.build()

    from scenes.cornell import cornell_camera
    cam = cornell_camera((24, 24))
    cfg = driver.RenderConfig(width=24, height=24, spp=16, max_depth=2,
                              sampler=smp.SamplerConfig(kind="zerotwo", spp=16))
    img_i = np.asarray(driver.render(build(True), cam, cfg, path.make_li(cfg)))
    img_r = np.asarray(driver.render(build(False), cam, cfg, path.make_li(cfg)))
    assert img_i.mean() > 0.01
    np.testing.assert_allclose(img_i.mean(), img_r.mean(), rtol=0.05)
    # pixelwise agreement (same estimator, same light geometry)
    err = np.abs(img_i - img_r).mean() / img_r.mean()
    assert err < 0.10, err
