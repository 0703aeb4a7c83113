"""Profile the Pallas BVH packet kernel on a reference scene.

Answers the round-3 verdict's "measure first" demand: where do the packet
walks spend their time — node-visit iterations (scalar fetch + slab test)
or leaf object tests — and how does ray coherence change the packet-union
size?  Reports, for image-ordered and shuffled primary rays:

- steady-state wall time + Mrays/s,
- total / per-packet node-visit iterations and leaf object tests,
- derived ns cost per node visit and per leaf object test (via a linear
  fit over the two measured workloads).

Usage: python tools/profile_packet.py [scene] [legacy]
(default profiles the production grouped kernel; "legacy" profiles the
round-3 union-walk kernel for comparison)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SCENES = "/root/reference/DistributionRayTracer/P3D_Scenes"


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "dragon_assignment1"
    legacy = "legacy" in sys.argv[2:]
    if legacy:
        from distributionraytracer_tpu.accel.pallas_bvh import (
            TILE, make_pallas_bvh_intersectors as make_inter,
            profile_closest,
        )
    else:
        from distributionraytracer_tpu.accel.pallas_packet import (
            TILE, make_grouped_intersectors as make_inter,
            profile_closest,
        )
    from distributionraytracer_tpu.ops.camera import primary_rays
    from distributionraytracer_tpu.renderer import build_accel
    from distributionraytracer_tpu.scene import load_p3f
    from distributionraytracer_tpu.scene.types import (
        ACCEL_BVH, ACCEL_GRID, derive_camera,
    )

    scene = load_p3f(os.path.join(SCENES, f"{name}.p3f"))
    st = scene.static
    ab = build_accel(scene,
                     packet_kernel="legacy" if legacy else "grouped")
    if ab.pallas is None:
        print("no pallas tables for this scene")
        return
    if st.accel == ACCEL_GRID:
        tabs = ab.pallas.tabs
        shadow_mode = "grid"
    else:
        tabs = ab.pallas
        shadow_mode = "bvh"
    if legacy:
        n_nodes = tabs.node_tab.shape[1]
        print(f"scene={name} objects={st.n_objects} "
              f"accel={int(st.accel)} node_tab={tabs.node_tab.shape} "
              f"obj_tab={tabs.obj_tab.shape} (LEGACY kernel)")
    else:
        n_nodes = tabs.n_nodes
        print(f"scene={name} objects={st.n_objects} "
              f"accel={int(st.accel)} nodes={n_nodes} "
              f"node_g={tabs.node_g.shape} obj_g={tabs.obj_g.shape}")

    # image-ordered primary rays at native res, center pixel sample
    H, W = st.res_y, st.res_x
    cam = derive_camera(scene)
    ys, xs = np.mgrid[0:H, 0:W]
    pix = np.stack([xs + 0.5, ys + 0.5], axis=-1).reshape(-1, 2)
    pix = jnp.asarray(pix, jnp.float32)
    o, d, t = primary_rays(cam, pix)
    o = jax.device_put(o)
    d = jax.device_put(d)
    t = jnp.zeros((o.shape[0],), jnp.float32)
    R = o.shape[0]
    print(f"rays={R} packets={-(-R // TILE)}")

    perm = np.random.RandomState(0).permutation(R)
    os_, ds_ = o[perm], d[perm]

    inter = make_inter(scene, tabs, shadow_mode=shadow_mode)
    f = jax.jit(lambda o, d, t: inter.closest(o, d, t).t)

    rows = {}
    for label, oo, dd in (("coherent", o, d), ("shuffled", os_, ds_)):
        r = f(oo, dd, t)
        jax.block_until_ready(r)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(oo, dd, t))
            times.append(time.perf_counter() - t0)
        dt = min(times)

        prof = profile_closest(scene, tabs, oo, dd, t,
                               shadow_mode=shadow_mode)
        iters = np.asarray(prof["iters"])
        lts = np.asarray(prof["leaf_tests"])
        rows[label] = (dt, iters, lts)
        print(f"\n[{label}] wall={dt*1e3:.1f} ms  "
              f"{R/dt/1e6:.2f} Mrays/s")
        print(f"  node visits: total={iters.sum():.0f} "
              f"mean/packet={iters.mean():.0f} max={iters.max():.0f} "
              f"({100*iters.mean()/n_nodes:.1f}% of {n_nodes} nodes)")
        print(f"  leaf tests : total={lts.sum():.0f} "
              f"mean/packet={lts.mean():.0f} max={lts.max():.0f}")
        print(f"  per ray    : visits={iters.sum()/R:.1f} "
              f"leaf_tests={lts.sum()/R:.1f}")

    # two-point fit: dt = a * iters + b * leaf_tests
    (d1, i1, l1), (d2, i2, l2) = rows["coherent"], rows["shuffled"]
    A = np.array([[i1.sum(), l1.sum()], [i2.sum(), l2.sum()]])
    b = np.array([d1, d2])
    try:
        x = np.linalg.solve(A, b)
        print(f"\nfit: node visit = {x[0]*1e9:.0f} ns, "
              f"leaf object test = {x[1]*1e9:.0f} ns")
    except np.linalg.LinAlgError:
        pass
    tot1 = i1.sum() + l1.sum()
    tot2 = i2.sum() + l2.sum()
    print(f"uniform-cost est: {d1/tot1*1e9:.0f} ns/iter (coherent), "
          f"{d2/tot2*1e9:.0f} ns/iter (shuffled)")


if __name__ == "__main__":
    main()
