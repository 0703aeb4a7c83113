"""TPU-native differentiable distribution ray tracer.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
C++/GLSL project ``rita-mota/DistributionRayTracer``:

- P3F scene loading (``scene.p3f``), skybox cubemaps (``scene.skybox``)
- Camera ray generation with jittered AA and thin-lens DOF (``ops.camera``)
- Sphere / triangle / plane / axis-aligned-box intersection (``ops.intersect``)
- Uniform-grid and flattened SAH-BVH acceleration (``accel``)
- Whitted + distribution integrator with soft shadows, reflection, refraction
  with Beer absorption, motion blur (``integrator.whitted``)
- Monte Carlo path tracer with diffuse/metal/dielectric/plastic materials,
  GGX direct lighting and Russian roulette (``integrator.pathtracer``)
- Multi-chip pixel-tile sharding over a ``jax.sharding.Mesh`` (``parallel``)

Unlike the reference, the scene lives HBM-resident in SoA layout, every kernel
is batched/masked (no recursion, no virtual dispatch), and rendering is
differentiable end-to-end w.r.t. materials, lights and camera.
"""

__version__ = "0.1.0"

from distributionraytracer_tpu.config import RenderConfig  # noqa: F401
