"""pbrt_tpu — a TPU-native differentiable physically based renderer.

A from-scratch JAX/Pallas wavefront path tracer with the capability set of
PBRT-v3 (as embodied by the reference `lazytiger/pbrt-rs`): 8 integrators,
BVH + kd-tree accelerators, the full BxDF/microfacet stack, 7 light types,
6 samplers, participating media, mipmapped textures, and multi-chip scaling
over a `jax.sharding.Mesh`.

Design stance (see ARCHITECTURE.md):
  * wavefront, not megakernel: SoA ray/hit buffers, bounded `lax` loops,
    type-switched shading — no recursion, no trait objects.
  * stateless sampling: every random number is a pure function of
    (pixel, sample_index, dimension, seed) so replays are exact, the CPU
    oracle matches bitwise, and gradients use path replay for free.
  * the scene is a pytree of arrays; differentiable leaves are material,
    light, camera and medium parameters.
"""

__version__ = "0.1.0"
