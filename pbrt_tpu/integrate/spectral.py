"""Sampled-spectrum render mode.

TPU-native counterpart of the reference's `sampled_spectrum` cargo
feature (src/core/spectrum.rs:713-716, SampledSpectrum at :386): instead
of recompiling every radiometric type, the λ-binned axis rides the
existing RGB machinery — light transport is linear and per-wavelength
independent (no dispersion: IORs are λ-constant, as in the reference's
RGB build), so a 3·K-bin spectral render is K RGB renders whose material
reflectances and light emissions are the RGB-basis spectra evaluated at
that render's three λ bins. The stack converts to XYZ with the CIE
curves and then to sRGB.

Limitations (documented, same class as spectrum.rs's from_rgb):
- RGB texture maps are treated as per-bin reflectance scale factors:
  a texel's RGB multiplies the already-spectralised material constant,
  so on textured materials the colour is basis-projected TWICE (once
  when the constant is spectralised, once per-texel in RGB). For
  smooth reflectance spectra the double projection changes the result
  by at most a few percent (covered by
  tests/test_maxmin_spectral.py::test_spectral_textured_scene) —
  exact per-texel spectralisation would need the full basis lookup per
  texel fetch.
- No spectral dispersion (λ-independent eta).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..core import spectrum as spec
from ..core.types import Float
from . import driver as drivermod


def _spectralize_scene(scene, lam_slice, n_bins):
    """Scene with materials/lights re-expressed at three λ bins
    (lam_slice = slice of the bin axis, width 3)."""
    basis = np.asarray(spec.rgb_reflectance_basis(n_bins))      # (N, 3)
    b3 = jnp.asarray(basis[lam_slice])                          # (3, 3)

    def to_bins(c):
        # rows: the three bins of this pass; columns weighted by rgb
        return jnp.maximum(jnp.einsum("bc,...c->...b", b3, c), 0.0)

    mats = scene.materials
    mats = dataclasses.replace(
        mats, kd=to_bins(mats.kd), ks=to_bins(mats.ks),
        kr=to_bins(mats.kr), kt=to_bins(mats.kt))
    lights = dataclasses.replace(scene.lights,
                                 emit=to_bins(scene.lights.emit),
                                 env_image=to_bins(scene.lights.env_image))
    return scene._replace(materials=mats, lights=lights)


def render_spectral(scene, camera, cfg, make_li, n_bins=12):
    """Spectral render → (spectral (H, W, n_bins), rgb (H, W, 3)).

    n_bins must be a multiple of 3 (three bins ride each RGB pass)."""
    assert n_bins % 3 == 0
    stacks = []
    for k in range(0, n_bins, 3):
        sc = _spectralize_scene(scene, slice(k, k + 3), n_bins)
        img = drivermod.render(sc, camera, cfg, make_li(cfg))
        stacks.append(img)
    spectral = jnp.concatenate(stacks, axis=-1)                 # (H, W, N)
    xyz = spec.sampled_to_xyz(spectral)
    rgb = spec.xyz_to_rgb(xyz)
    return spectral, jnp.maximum(rgb, 0.0)
