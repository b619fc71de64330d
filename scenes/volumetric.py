"""BASELINE config 4: participating-media scene (volumetric path tracing).

Cornell-style box filled with a homogeneous scattering medium (fog) plus
a variant with a procedural density grid (smoke column).
"""
from __future__ import annotations

import numpy as np

from pbrt_tpu.api import SceneBuilder
from scenes.cornell import cornell_camera


def fog_scene(sigma_a=(0.08, 0.08, 0.08), sigma_s=(0.45, 0.45, 0.45), g=0.2):
    b = SceneBuilder()
    white = b.matte(kd=(0.73, 0.73, 0.73))
    red = b.matte(kd=(0.65, 0.05, 0.05))
    green = b.matte(kd=(0.12, 0.45, 0.15))
    s = 1.0
    b.add_quad([0, 0, 0], [s, 0, 0], [s, 0, -s], [0, 0, -s], white)
    b.add_quad([0, s, 0], [0, s, -s], [s, s, -s], [s, s, 0], white)
    b.add_quad([0, 0, -s], [s, 0, -s], [s, s, -s], [0, s, -s], white)
    b.add_quad([0, 0, 0], [0, 0, -s], [0, s, -s], [0, s, 0], red)
    b.add_quad([s, 0, 0], [s, s, 0], [s, s, -s], [s, 0, -s], green)
    b.add_sphere([0.4, 0.25, -0.55], 0.22, b.mirror(kr=0.85))
    e, c, y = 0.2, s / 2, s - 1e-3
    b.area_light_quad([c - e, y, -c + e], [c - e, y, -c - e],
                      [c + e, y, -c - e], [c + e, y, -c + e],
                      radiance=(22.0, 22.0, 22.0))
    b.set_homogeneous_medium(sigma_a, sigma_s, g)
    return b.build()


def smoke_scene():
    """Grid-density medium: a wispy smoke column from 3D value noise."""
    b = SceneBuilder()
    white = b.matte(kd=(0.73, 0.73, 0.73))
    s = 1.0
    b.add_quad([0, 0, 0], [s, 0, 0], [s, 0, -s], [0, 0, -s], white)
    b.add_quad([0, 0, -s], [s, 0, -s], [s, s, -s], [0, s, -s], white)
    e, c, y = 0.2, s / 2, s - 1e-3
    b.area_light_quad([c - e, y, -c + e], [c - e, y, -c - e],
                      [c + e, y, -c - e], [c + e, y, -c + e],
                      radiance=(18.0, 18.0, 18.0))
    # density grid: gaussian column modulated by hashed noise
    n = 32
    z, yy, x = np.mgrid[0:n, 0:n, 0:n] / (n - 1.0)
    r2 = (x - 0.5) ** 2 + (z - 0.5) ** 2
    base = np.exp(-r2 / 0.05) * (1.0 - yy) ** 0.5
    rng = np.random.RandomState(4)
    noise = rng.rand(8, 8, 8)
    zoom = np.kron(noise, np.ones((4, 4, 4)))
    dens = np.clip(base * (0.5 + zoom), 0.0, 1.0).astype(np.float32)
    # medium space: unit cube mapped onto the box interior (x∈[0,1], z∈[-1,0])
    w2m = np.eye(4, dtype=np.float32)
    w2m[2, 2] = -1.0  # z flip: world z∈[-1,0] → medium z∈[0,1]
    b.set_grid_medium(dens, sigma_a=(0.05,) * 3, sigma_s=(0.9,) * 3, g=0.0,
                      world_to_medium=w2m, scale=8.0)
    return b.build()


volumetric_camera = cornell_camera
