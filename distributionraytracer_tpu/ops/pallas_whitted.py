"""Fused Whitted level megakernel (SURVEY §7 step 11).

The brute-force Whitted pipeline streamed each tree level's ray state
through HBM ~5x: closest-hit kernel, material gather, per-light shading,
shadow kernel, child-spawn math all ran as separate XLA stages — the
round-3 headline measured 14 KB of HBM traffic per ray and 1.7% of its
own roofline.  This kernel runs ONE pallas_call per tree level: the
closest-hit fold (carrying the winner's 13 material fields and object id
out of SMEM), per-light shadow folds with the reference's accel-NONE
conventions (normalized direction so the max distance degenerates to
~1.0, ``t > 1e-4``, self-exclusion — main.cpp:399-440), Blinn-Phong
direct lighting (main.cpp:446-449), and the full child-spawn math
(Schlick cos selection, Beer, TIR, reflection gate — main.cpp:456-518),
emitting exactly the ``_shade_node`` result dict.

Scope (``fused_supported``): brute-force scenes without a skybox, hard
shadows, forward-only — the headline workload's shape (balls_low, dof,
motion, teste).  Skybox/soft-shadow/differentiable paths keep the staged
pipeline.  ``integrator.whitted.trace_whitted`` routes level batches
here when eligible; ``tests/test_whitted.py`` locks fused == staged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distributionraytracer_tpu.ops.pallas_intersect import (
    LANES, _fold_objects, _pad_view, _table_specs,
)

LEVEL_ROWS = 64  # rays per grid step (32/128 measured marginally slower)
OFFSET = np.float32(1e-4)  # secondary/shadow ray offset (main.cpp:378)


def fused_supported(scene, cfg) -> bool:
    from distributionraytracer_tpu.ops import pallas_intersect as _pi
    st = scene.static
    # skybox scenes fuse too: the miss color is computed in XLA by the
    # caller (the texel gather never was in the kernels)
    return (_pi.pallas_supported(scene)
            and cfg.soft_shadow == 0.0 and st.n_lights > 0)


def pack_whitted_mats(scene):
    """(O, 13) f32 per-OBJECT material rows: [cd3, cs3, kd, ks, kr,
    shine, T, ior, pad]; the closest fold carries the winner's row."""
    _, _, mats = scene.packed_objects()
    j = jnp.asarray
    row = jnp.concatenate([
        j(scene.mat_cd)[mats], j(scene.mat_cs)[mats],
        jnp.stack([j(scene.mat_kd)[mats], j(scene.mat_ks)[mats],
                   j(scene.mat_kr)[mats], j(scene.mat_shine)[mats],
                   j(scene.mat_T)[mats], j(scene.mat_ior)[mats],
                   jnp.zeros_like(j(scene.mat_kd)[mats])], axis=1),
    ], axis=1)
    return row.astype(jnp.float32)


def _norm3(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-24))
    return x * inv, y * inv, z * inv


def _level_kernel(obj_types, motion_blur, light_quads, spawn, ref_shadow,
                  grid_mode,
                  data_ref, mats_ref, mrow_ref, lights_ref, gbox_ref,
                  ox, oy, oz, dx, dy, dz, tmr, iorr, lsx, lsy, vd,
                  *outs):
    del mats_ref
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    time = tmr[:]
    ior1 = iorr[:]
    shape = time.shape
    valid = vd[:] > 0.0

    def grid_slab(o3, d3):
        """Init_Traverse's slab (grid.cpp:104-171 via
        accel.grid._init_traverse_batched): (ok, t1)."""
        t0 = t1 = None
        for k in range(3):
            a = 1.0 / d3[k]
            lo = gbox_ref[0, k]
            hi = gbox_ref[0, 3 + k]
            tn = jnp.where(a >= 0.0, (lo - o3[k]) * a, (hi - o3[k]) * a)
            tf = jnp.where(a >= 0.0, (hi - o3[k]) * a, (lo - o3[k]) * a)
            t0 = tn if t0 is None else jnp.maximum(t0, tn)
            t1 = tf if t1 is None else jnp.minimum(t1, tf)
        return ~((t0 > t1) | (t1 < 0.0)), t1

    # ---- closest hit: t, n3, gid, 13 material fields ----
    init = ((jnp.full(shape, np.float32(3.402823466e38), jnp.float32),)
            + tuple(jnp.zeros(shape, jnp.float32) for _ in range(3))
            + (jnp.full(shape, -1.0, jnp.float32),)
            + tuple(jnp.zeros(shape, jnp.float32) for _ in range(13)))

    def upd(c, gid, t, n):
        better = t < c[0]  # strict <: first wins (main.cpp:321)
        gidf = jnp.asarray(gid, jnp.int32).astype(jnp.float32)
        out = [jnp.where(better, t, c[0])]
        for k in range(3):
            out.append(jnp.where(better, n[k], c[1 + k]))
        out.append(jnp.where(better, gidf, c[4]))
        for k in range(13):
            out.append(jnp.where(better, mrow_ref[gid, k], c[5 + k]))
        return tuple(out)

    cc = _fold_objects(obj_types, motion_blur, data_ref, o, d, time,
                       upd, init)
    t_hit = cc[0]
    hit = cc[4] >= 0.0
    if grid_mode:
        # walking out of the grid drops the record; failed slab init is
        # a miss (grid.cpp:258-304 via accel.pallas_grid)
        g_ok, g_t1 = grid_slab(o, d)
        hit = hit & g_ok & (t_hit < g_t1)
    gid = cc[4]
    nx, ny, nz = _norm3(cc[1], cc[2], cc[3])
    cd = cc[5:8]
    cs = cc[8:11]
    kd, ks, kr, shine, trans, mat_ior = cc[11:17]

    hit_mask = hit & valid
    t_safe = jnp.where(hit, t_hit, 1.0)
    px = o[0] + d[0] * t_safe
    py = o[1] + d[1] * t_safe
    pz = o[2] + d[2] * t_safe
    # normal flip when hit from inside (main.cpp:363-364)
    outside = (d[0] * nx + d[1] * ny + d[2] * nz) < 0.0
    sgn = jnp.where(outside, 1.0, -1.0)
    Nx, Ny, Nz = nx * sgn, ny * sgn, nz * sgn
    vx, vy, vz = _norm3(d[0], d[1], d[2])
    vx, vy, vz = -vx, -vy, -vz

    # ---- direct lighting (main.cpp:383-451) ----
    direct = [jnp.zeros(shape, jnp.float32) for _ in range(3)]
    llx = jnp.zeros(shape, jnp.float32)
    lly = jnp.zeros(shape, jnp.float32)
    llz = jnp.zeros(shape, jnp.float32)
    sox = px + Nx * OFFSET
    soy = py + Ny * OFFSET
    soz = pz + Nz * OFFSET
    for j, is_quad in enumerate(light_quads):
        if is_quad:
            lpx = (lights_ref[j, 0] + lights_ref[j, 3] * lsx[:]
                   + lights_ref[j, 6] * lsy[:])
            lpy = (lights_ref[j, 1] + lights_ref[j, 4] * lsx[:]
                   + lights_ref[j, 7] * lsy[:])
            lpz = (lights_ref[j, 2] + lights_ref[j, 5] * lsx[:]
                   + lights_ref[j, 8] * lsy[:])
        else:
            z = jnp.zeros(shape, jnp.float32)
            lpx, lpy, lpz = (lights_ref[j, 0] + z, lights_ref[j, 1] + z,
                             lights_ref[j, 2] + z)
        llx, lly, llz = lpx, lpy, lpz
        ulx, uly, ulz = lpx - px, lpy - py, lpz - pz
        dist_true = jnp.sqrt(jnp.maximum(
            ulx * ulx + uly * uly + ulz * ulz, 1e-24))
        lx, ly, lz = ulx / dist_true, uly / dist_true, ulz / dist_true
        hx, hy, hz = _norm3(lx + vx, ly + vy, lz + vz)
        ndl = jnp.maximum(Nx * lx + Ny * ly + Nz * lz, 0.0)
        ndh = jnp.maximum(Nx * hx + Ny * hy + Nz * hz, 0.0)
        spec = jnp.power(jnp.maximum(ndh, 1e-12), shine)

        # shadow fold, accel-NONE conventions: normalized direction so
        # max dist degenerates to ~1.0 (the dangling-else quirk,
        # main.cpp:399-440); t > 1e-4; self-exclusion
        sdist = (jnp.ones(shape, jnp.float32) if ref_shadow
                 else dist_true)
        so = (sox, soy, soz)
        sd = (lx, ly, lz)

        if grid_mode:
            # grid occluder compare: strict t < dist, no self-exclusion
            # (grid.cpp:330-352); Init_Traverse failure counts as
            # shadowed (grid.cpp:321-324)
            def upd_occ(occ, g2, t, _n, sdist=sdist):
                return jnp.maximum(occ,
                                   jnp.where(t < sdist, 1.0, 0.0))
        else:
            def upd_occ(occ, g2, t, _n, sdist=sdist):
                g2f = jnp.asarray(g2, jnp.int32).astype(jnp.float32)
                hit_now = (t < sdist) & (t > 1e-4) & (gid != g2f)
                return jnp.maximum(occ, jnp.where(hit_now, 1.0, 0.0))

        occ = _fold_objects(obj_types, motion_blur, data_ref, so, sd,
                            jnp.zeros_like(time), upd_occ,
                            jnp.zeros(shape, jnp.float32))
        if grid_mode:
            s_ok, _ = grid_slab(so, sd)
            occ = jnp.maximum(occ, jnp.where(s_ok, 0.0, 1.0))
        lit = hit_mask & (occ == 0.0)
        for k in range(3):
            contrib = cd[k] * (kd * ndl) + cs[k] * (ks * spec)
            direct[k] = direct[k] + jnp.where(lit, contrib, 0.0)

    n_out = 0
    for k in range(3):
        outs[n_out][:] = direct[k]
        n_out += 1
    outs[n_out][:] = jnp.where(hit, 1.0, 0.0)
    n_out += 1

    if spawn:
        # ---- children (main.cpp:456-518) ----
        ior2 = jnp.where(outside, mat_ior, 1.0)
        eta = ior1 / ior2
        vdn = vx * Nx + vy * Ny + vz * Nz
        vtx = Nx * vdn - vx
        vty = Ny * vdn - vy
        vtz = Nz * vdn - vz
        sin_i = jnp.sqrt(jnp.maximum(
            vtx * vtx + vty * vty + vtz * vtz, 0.0))
        inv_si = 1.0 / jnp.maximum(sin_i, 1e-12)
        thx, thy, thz = vtx * inv_si, vty * inv_si, vtz * inv_si
        sin_t = eta * sin_i
        no_tir = sin_t < 1.0
        cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t * sin_t, 0.0))
        pos_si = sin_i > 0.0
        rnx = jnp.where(pos_si, thx * sin_t - Nx * cos_t, -Nx)
        rny = jnp.where(pos_si, thy * sin_t - Ny * cos_t, -Ny)
        rnz = jnp.where(pos_si, thz * sin_t - Nz * cos_t, -Nz)
        rdx, rdy, rdz = _norm3(rnx, rny, rnz)

        cos_i = vdn
        cos_theta = jnp.where(ior1 > ior2, cos_t, cos_i)
        r0 = ((ior1 - ior2) / (ior1 + ior2)) ** 2
        fres = r0 + (1.0 - r0) * jnp.maximum(1.0 - cos_theta, 0.0) ** 5

        do_refr = hit_mask & (trans == 1.0) & no_tir
        krf = jnp.where(do_refr, fres,
                        jnp.where(hit_mask & (trans > 0.0) & ~no_tir,
                                  1.0, kr))
        t_beer = jnp.where(hit_mask & ~outside, t_hit, 0.0)

        flx, fly, flz = _norm3(Nx * (2.0 * vdn) - vx,
                               Ny * (2.0 * vdn) - vy,
                               Nz * (2.0 * vdn) - vz)
        refl_gate = (flx * Nx + fly * Ny + flz * Nz) > 0.0
        do_refl = hit_mask & (ks > 0.0) & refl_gate

        vals = [
            jnp.where(do_refr, 1.0, 0.0),
            px - Nx * OFFSET, py - Ny * OFFSET, pz - Nz * OFFSET,
            rdx, rdy, rdz, ior2,
        ]
        for k in range(3):
            beer_k = jnp.where(outside, 1.0,
                               jnp.exp((1.0 - cd[k]) * (-t_beer)))
            vals.append(jnp.where(do_refr, beer_k * (1.0 - krf), 0.0))
        vals += [
            jnp.where(do_refl, 1.0, 0.0),
            px + Nx * OFFSET, py + Ny * OFFSET, pz + Nz * OFFSET,
            flx, fly, flz, ior1,
        ]
        for k in range(3):
            vals.append(jnp.where(do_refl, cs[k] * krf, 0.0))
        vals += [llx, lly, llz]
        for v in vals:
            outs[n_out][:] = v
            n_out += 1


def fused_level(scene, cfg, o, d, time, ior, light_sample, valid,
                spawn: bool, interpret: bool = False, grid_bbox=None):
    """One fused Whitted tree level; returns the ``_shade_node`` res dict
    (minus miss_color, which the caller adds in XLA).  ``grid_bbox``
    (bbox_min, bbox_max) switches the kernel to the uniform grid's
    observable semantics (slab gates + grid occluder compare) for the
    cost-based brute backend on grid scenes."""
    st = scene.static
    (data, mats2), _ = _table_specs(scene)
    mrow = pack_whitted_mats(scene)
    lights = jnp.concatenate(
        [jnp.asarray(scene.light_pos), jnp.asarray(scene.light_e1),
         jnp.asarray(scene.light_e2)], axis=1).astype(jnp.float32)
    if grid_bbox is None:
        gbox = jnp.zeros((1, 8), jnp.float32)
    else:
        gbox = jnp.concatenate(
            [jnp.asarray(grid_bbox[0], jnp.float32).reshape(3),
             jnp.asarray(grid_bbox[1], jnp.float32).reshape(3),
             jnp.zeros((2,), jnp.float32)]).reshape(1, 8)
    R = o.shape[0]
    rows = max(-(-R // LANES), 1)
    rows = -(-rows // LEVEL_ROWS) * LEVEL_ROWS
    grid = rows // LEVEL_ROWS

    pv = lambda a: _pad_view(jnp.asarray(a, jnp.float32), rows)
    rays = [pv(x) for x in (
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], time,
        ior, light_sample[:, 0], light_sample[:, 1],
        jnp.asarray(valid).astype(jnp.float32))]
    spec = pl.BlockSpec((LEVEL_ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    fshape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    tab_specs = [
        pl.BlockSpec(data.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(mats2.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(mrow.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(lights.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(gbox.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    n_out = 4 + (25 if spawn else 0)
    kern = functools.partial(
        _level_kernel, st.obj_types, cfg.motion_blur,
        tuple(bool(q) for q in st.light_quad), spawn,
        cfg.shadow_mode == "reference", grid_bbox is not None)
    outs = pl.pallas_call(
        kern, grid=(grid,),
        in_specs=tab_specs + [spec] * 11,
        out_specs=[spec] * n_out,
        out_shape=[fshape] * n_out,
        interpret=interpret,
    )(data, mats2, mrow, lights, gbox, *rays)
    fl = lambda a: a.reshape(-1)[:R]
    v3 = lambda i: jnp.stack([fl(outs[i]), fl(outs[i + 1]),
                              fl(outs[i + 2])], axis=-1)
    hit = fl(outs[3]) > 0.0
    res = {
        "direct": v3(0),
        "miss": jnp.asarray(valid) & ~hit,
        "valid": jnp.asarray(valid),
        "_hit": hit,
    }
    if spawn:
        res.update({
            "refr_valid": fl(outs[4]) > 0.0,
            "refr_o": v3(5),
            "refr_d": v3(8),
            "refr_ior": fl(outs[11]),
            "refr_weight": v3(12),
            "refl_valid": fl(outs[15]) > 0.0,
            "refl_o": v3(16),
            "refl_d": v3(19),
            "refl_ior": fl(outs[22]),
            "refl_weight": v3(23),
            "child_ls": v3(26),
        })
    return res
