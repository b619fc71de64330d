"""Cornell-box scene builders for the BASELINE configs.

Config 1: Cornell box with two spheres, direct lighting, 64×64 @ 4spp.
Config 2: Cornell box, path depth 5, 256×256 @ 64spp, diffuse+specular.
"""
from __future__ import annotations

import numpy as np

from pbrt_tpu.api import SceneBuilder
from pbrt_tpu.cameras import make_perspective
from pbrt_tpu.core import transform as tf


def cornell_spheres(specular=False, light="area"):
    """The classic box in [0,1]^3, camera looking down -z → box at z<0."""
    b = SceneBuilder()
    white = b.matte(kd=(0.73, 0.73, 0.73))
    red = b.matte(kd=(0.65, 0.05, 0.05))
    green = b.matte(kd=(0.12, 0.45, 0.15))
    if specular:
        sph1 = b.mirror(kr=0.9)
        sph2 = b.glass(eta=1.5)
    else:
        sph1 = b.matte(kd=(0.8, 0.6, 0.2))
        sph2 = b.matte(kd=(0.2, 0.4, 0.8))

    s = 1.0  # box side
    # floor (y=0), ceiling (y=s), back wall (z=-s), left (x=0,red), right (x=s,green)
    b.add_quad([0, 0, 0], [s, 0, 0], [s, 0, -s], [0, 0, -s], white)       # floor
    if light != "env":   # env variant: open ceiling, sky lights the box
        b.add_quad([0, s, 0], [0, s, -s], [s, s, -s], [s, s, 0], white)   # ceiling
    b.add_quad([0, 0, -s], [s, 0, -s], [s, s, -s], [0, s, -s], white)     # back
    b.add_quad([0, 0, 0], [0, 0, -s], [0, s, -s], [0, s, 0], red)         # left
    b.add_quad([s, 0, 0], [s, s, 0], [s, s, -s], [s, 0, -s], green)       # right

    b.add_sphere([0.3, 0.18, -0.6], 0.18, sph1)
    b.add_sphere([0.7, 0.15, -0.35], 0.15, sph2)

    if light == "area":
        # ceiling light, slightly below the ceiling, facing down (-y)
        e = 0.22
        c = s / 2
        y = s - 1e-3
        b.area_light_quad([c - e, y, -c + e], [c - e, y, -c - e],
                          [c + e, y, -c - e], [c + e, y, -c + e],
                          radiance=(12.0, 12.0, 12.0))
    elif light == "env":
        # non-uniform sky (bright warm band near the zenith) so env
        # importance sampling and MIS matter
        import numpy as _np
        th = _np.linspace(0, _np.pi, 32)[:, None] * _np.ones((1, 64))
        img = _np.stack([1.6 * _np.exp(-((th - 0.5) ** 2) / 0.18) + 0.25,
                         1.3 * _np.exp(-((th - 0.5) ** 2) / 0.18) + 0.3,
                         1.0 * _np.exp(-((th - 0.5) ** 2) / 0.18) + 0.45],
                        axis=-1).astype(_np.float32)
        b.infinite_light(radiance=1.0, image=img)
    else:
        b.point_light([0.5, 0.85, -0.5], intensity=(1.2, 1.2, 1.2))
    return b.build()


def cornell_camera(resolution):
    c2w = tf.look_at(pos=np.array([0.5, 0.5, 1.42]),
                     look=np.array([0.5, 0.5, -0.5]),
                     up=np.array([0.0, 1.0, 0.0]))
    return make_perspective(c2w, fov_deg=40.0, resolution=resolution)
