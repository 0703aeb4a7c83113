"""Compare the binned dense-streaming kernels against the grouped
packet walker and the native CPU reference traversal on a mesh scene.

Timing uses scalar-forced sync (a full-array fetch on the remote-TPU
platform adds ~100 ms of tunnel transfer per MB and corrupts kernel
micro-timings — PARITY round-5 notes).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from distributionraytracer_tpu.accel import pallas_binned as pb
from distributionraytracer_tpu.integrator.render import (
    _block_perm, _rays_from_samples, default_config, make_samples,
)
from distributionraytracer_tpu.renderer import Renderer, packet_intersectors
from distributionraytracer_tpu.scene import load_p3f

SCENES = "/root/reference/DistributionRayTracer/P3D_Scenes"


def timeit(fn, reps=5):
    float(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main(name="dragon"):
    scene = load_p3f(os.path.join(SCENES, f"{name}.p3f"))
    r = Renderer(scene, default_config(scene))
    st = scene.static
    H, W = st.res_y, st.res_x
    sc = r.scene
    bins = r._bins_for(H, W, 1)
    assert bins is not None, "scene not binned-eligible"
    samples = make_samples(sc, r.cfg, jax.random.PRNGKey(0))
    o, d, t, _ = _rays_from_samples(sc, r.cfg, samples)
    perm = _block_perm(H, W, 1)
    o = jnp.asarray(o)[perm]
    d = jnp.asarray(d)[perm]
    t = jnp.asarray(t)[perm]
    tabs = (r.grid_pallas.tabs if r.grid_pallas is not None
            else r.bvh_tabs)
    R = o.shape[0]

    cs = np.asarray(jax.device_get(bins.primary.chain_start))
    cnt = np.diff(cs)
    print(f"{name}: {R} primary rays, {cnt.sum()} candidates "
          f"(mean {cnt.mean():.1f}/chain, max {cnt.max()})")

    cl_b = jax.jit(lambda o, d, t: pb.binned_closest(
        sc, tabs, bins.primary, o, d, t).t.sum())
    print(f"binned closest:  {timeit(lambda: cl_b(o, d, t)):.1f} ms "
          f"(incl ~26ms dispatch)")
    mode = "grid" if r.grid_pallas is not None else "bvh"
    inner = packet_intersectors(sc, tabs, False, False, shadow_mode=mode)
    cl_p = jax.jit(lambda o, d, t: inner.closest(o, d, t).t.sum())
    print(f"packet closest:  {timeit(lambda: cl_p(o, d, t)):.1f} ms")

    try:
        from distributionraytracer_tpu import native
        from distributionraytracer_tpu.accel.grid import object_bboxes
        bb = object_bboxes(scene)
        nodes = native.build_bvh_native(bb[:, 0], bb[:, 1])
        obj12, types, _ = scene.packed_objects()
        obj12 = np.asarray(jax.device_get(obj12))
        on, dn = np.asarray(o), np.asarray(d)
        t0 = time.perf_counter()
        native.traverse_closest_native(
            nodes[:5], nodes[5], obj12, np.asarray(types, np.int32),
            on, dn)
        print(f"native CPU ref:  {(time.perf_counter()-t0)*1e3:.1f} ms "
              f"({os.cpu_count()} threads)")
    except Exception as e:
        print("native CPU ref unavailable:", e)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "dragon")
