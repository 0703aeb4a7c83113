"""Microbench: where does the binned closest kernel's per-column time go?

Variants of the slab-streaming kernel with parts removed, timed on the
dragon primary workload (run on the TPU).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distributionraytracer_tpu.accel import pallas_binned as pb
from distributionraytracer_tpu.accel.pallas_packet import _prim_test_grouped
from distributionraytracer_tpu.integrator.render import (
    _block_perm, _rays_from_samples, default_config, make_samples,
)
from distributionraytracer_tpu.renderer import Renderer
from distributionraytracer_tpu.scene import load_p3f

GROUP, LANES, CHAINS, BLK, SUB = 8, 128, 8, pb.BLK, pb.SUB
FLT_MAX = np.float32(3.4028235e38)


def variant_kernel(mode, types_present):
    def kernel(own_ref, tf_ref, dist_ref, slab_ref,
               ox, oy, oz, dx, dy, dz, tm, vd, t_ref):
        i = pl.program_id(0)
        shape = (GROUP, LANES)
        idx8 = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0)

        @pl.when(tf_ref[i * SUB] == 1)
        def _():
            t_ref[:] = jnp.full((CHAINS, LANES), FLT_MAX, jnp.float32)

        for sb in range(SUB):
            b = i * SUB + sb
            row = own_ref[b] % CHAINS
            o_b = tuple(jnp.broadcast_to(r[pl.ds(row, 1), :], shape)
                        for r in (ox, oy, oz))
            d_b = tuple(jnp.broadcast_to(r[pl.ds(row, 1), :], shape)
                        for r in (dx, dy, dz))
            inv_b = tuple(1.0 / dk for dk in d_b)
            time_b = jnp.zeros(shape, jnp.float32)
            bt = t_ref[pl.ds(row, 1), :]
            for j in range(sb * BLK, (sb + 1) * BLK):
                fld = lambda f, j=j: slab_ref[
                    f * GROUP:(f + 1) * GROUP, j:j + 1]
                if mode == "empty":
                    bt = jnp.minimum(bt, jnp.max(fld(0)))
                    continue
                t_c, n_c = _prim_test_grouped(
                    fld, o_b, d_b, inv_b, time_b, types_present, False)
                if mode == "test_only":
                    bt = jnp.minimum(bt, jnp.min(t_c, axis=0,
                                                 keepdims=True))
                    continue
                # full winner machinery
                tmin_c = jnp.min(t_c, axis=0, keepdims=True)
                first_r = jnp.min(jnp.where(t_c == tmin_c, idx8, GROUP),
                                  axis=0, keepdims=True)
                onehot = idx8 == first_r
                pick = lambda a: jnp.max(jnp.where(onehot, a, -FLT_MAX),
                                         axis=0, keepdims=True)
                better = tmin_c < bt
                bt = jnp.where(better, tmin_c, bt)
                for nc in n_c:
                    bt = jnp.minimum(bt, pick(nc) + 1e30)
            t_ref[pl.ds(row, 1), :] = bt

    return kernel


def main():
    scene = load_p3f(
        "/root/reference/DistributionRayTracer/P3D_Scenes/dragon.p3f")
    r = Renderer(scene, default_config(scene))
    st = scene.static
    H, W = st.res_y, st.res_x
    sc = r.scene
    bins = r._bins_for(H, W, 1).primary
    samples = make_samples(sc, r.cfg, jax.random.PRNGKey(0))
    o, d, t, _ = _rays_from_samples(sc, r.cfg, samples)
    perm = _block_perm(H, W, 1)
    o = jnp.asarray(o)[perm]
    d = jnp.asarray(d)[perm]
    t = jnp.asarray(t)[perm]
    types_present = tuple(sorted(set(st.obj_types)))
    B = bins.blk_owner.shape[0]
    C = bins.chain_start.shape[0] - 1
    Cp = -(-C // CHAINS) * CHAINS
    R = o.shape[0]
    vd = jnp.ones((R,), jnp.float32)
    rays = [pb._pad_rows(x, Cp) for x in
            (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t,
             vd)]
    # force all-stream: dist = -inf
    dist = jnp.full_like(bins.blk_dist, -np.inf)

    for mode in ("empty", "test_only", "full"):
        kern = variant_kernel(mode, types_present)
        tile_map = lambda i, own, tf, ds_: (own[i * SUB] // CHAINS, 0)
        row_spec = pl.BlockSpec((CHAINS, LANES), tile_map,
                                memory_space=pltpu.VMEM)
        slab_spec = pl.BlockSpec(
            (112, LANES), lambda i, own, tf, ds_: (0, i),
            memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3, grid=(B // SUB,),
            in_specs=[slab_spec] + [row_spec] * 8,
            out_specs=row_spec,
        )
        f = jax.jit(lambda *a: pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Cp, LANES), jnp.float32),
        )(*a))
        args = (bins.blk_owner, bins.blk_tfirst, dist, bins.slab, *rays)
        out = f(*args)
        np.asarray(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        ncols = B * BLK
        print(f"{mode}: {dt*1e3:.1f}ms  ({(dt-0.026)/ (B//SUB) *1e6:.1f}"
              f"us/step est, {(dt-0.026)/ncols*1e9:.0f}ns/col)")


if __name__ == "__main__":
    main()
