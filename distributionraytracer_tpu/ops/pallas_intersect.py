"""Pallas TPU megakernel for brute-force ray-scene intersection.

The jnp path (:mod:`ops.intersect`) materializes ``(R, N)`` t-matrices in
HBM for every primitive type, then argmins and re-gathers winner parameters
— several full HBM round trips per closest-hit query.  This kernel keeps a
tile of rays in VMEM, walks the (small) packed object table in reference
insertion order with the strict ``rec.t < hitRec.t`` first-wins update
(main.cpp:315-326), and writes only the per-ray winner: one HBM read of the
rays, one write of the result.

Semantics match ``closest_hit_brute`` / ``any_hit_brute`` exactly
(scene.cpp:44-278 quirks preserved — see ops/intersect.py); the loop over
objects is unrolled (object *types* are static per scene, so each step
lowers to just that primitive's formula), with per-object parameters read
as scalars from an SMEM-resident copy of the packed table.

Scope: brute-force (accel NONE) scenes.  Small object tables are fully
unrolled (each step lowers to exactly one primitive formula); long runs of
consecutive same-type objects are handled by a ``fori_loop`` whose body
reads the row's parameters from SMEM with a dynamic index — processing
order stays insertion order either way, preserving the strict ``<``
first-wins tie-break.  The kernel itself is forward-only; inverse
rendering wraps it with ``integrator.whitted.differentiable_intersectors``
(traversal under stop_gradient picks the winner, whose hit is recomputed
differentiably) — selection in ``RenderConfig.pallas``
(integrator.whitted.brute_intersectors).

Layout: rays are passed SoA as ``(R,)`` streams (o, d, time), zero-padded
to a multiple of the tile and viewed ``(rows, 128)``, blocked
``(TILE_ROWS, 128)`` over a 1-D grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distributionraytracer_tpu.ops.common import EPSILON, FLT_MAX
from distributionraytracer_tpu.scene.types import (
    OBJ_BOX, OBJ_PLANE, OBJ_SPHERE, OBJ_TRIANGLE, SceneData,
)

LANES = 128
TILE_ROWS = 64  # 64*128 = 8192 rays per grid step
MAX_UNROLL = 128   # budget of fully-unrolled candidate tests (compile time)
LOOP_MIN = 16      # same-type runs at least this long use a fori_loop body
MAX_OBJECTS = 1024  # SMEM table bound: 1024 x 12 f32 = 48 KiB


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _sphere_step(o, d, time, c, r, motion_blur):
    """One sphere vs a ray tile; returns (t, normal), t=FLT_MAX on miss.

    scene.cpp:152-197; motion blur moves the center by (0,1,0)*time
    (velocity.y hardwired, scene.cpp:159-161).
    """
    cx, cy, cz = c
    if motion_blur:
        cy = cy + time
    ocx, ocy, ocz = o[0] - cx, o[1] - cy, o[2] - cz
    a = _dot3(*d, *d)
    b = 2.0 * _dot3(ocx, ocy, ocz, *d)
    cq = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - r * r
    disc = b * b - 4.0 * a * cq
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    t = jnp.where(t1 > EPSILON, t1, t2)
    ok = (disc >= 0.0) & (t > EPSILON)
    tm = jnp.where(ok, t, FLT_MAX)
    px, py, pz = o[0] + d[0] * t - cx, o[1] + d[1] * t - cy, o[2] + d[2] * t - cz
    inv = jax.lax.rsqrt(jnp.maximum(px * px + py * py + pz * pz, 1e-30))
    return tm, (px * inv, py * inv, pz * inv)


def _triangle_step(o, d, v0, e1, e2):
    """Moller-Trumbore (scene.cpp:44-92); constant geometric normal."""
    hx = d[1] * e2[2] - d[2] * e2[1]
    hy = d[2] * e2[0] - d[0] * e2[2]
    hz = d[0] * e2[1] - d[1] * e2[0]
    a = _dot3(e1[0], e1[1], e1[2], hx, hy, hz)
    f = 1.0 / jnp.where(a != 0.0, a, 1.0)
    sx, sy, sz = o[0] - v0[0], o[1] - v0[1], o[2] - v0[2]
    u = f * _dot3(sx, sy, sz, hx, hy, hz)
    qx = sy * e1[2] - sz * e1[1]
    qy = sz * e1[0] - sx * e1[2]
    qz = sx * e1[1] - sy * e1[0]
    v = f * _dot3(qx, qy, qz, *d)
    t = f * _dot3(e2[0], e2[1], e2[2], qx, qy, qz)
    ok = ((a != 0.0) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
          & (u + v <= 1.0) & (t > EPSILON))
    nx = e1[1] * e2[2] - e1[2] * e2[1]
    ny = e1[2] * e2[0] - e1[0] * e2[2]
    nz = e1[0] * e2[1] - e1[1] * e2[0]
    inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
    return jnp.where(ok, t, FLT_MAX), (nx * inv, ny * inv, nz * inv)


def _plane_step(o, d, pn, pd):
    """scene.cpp:118-149: parallel when |PN.D| < EPSILON; t > 0."""
    denom = _dot3(*d, *pn)
    nz = jnp.abs(denom) >= EPSILON
    t = -(_dot3(*o, *pn) + pd) / jnp.where(nz, denom, 1.0)
    ok = nz & (t > 0.0)
    return jnp.where(ok, t, FLT_MAX), pn


def _box_step(o, d, bmin, bmax):
    """aaBox slab test + EPSILON face-compare normal (scene.cpp:218-278)."""
    tmin = tmax = None
    for k in range(3):
        inv = 1.0 / d[k]
        ta = (bmin[k] - o[k]) * inv
        tb = (bmax[k] - o[k]) * inv
        lo = jnp.minimum(ta, tb)
        hi = jnp.maximum(ta, tb)
        tmin = lo if tmin is None else jnp.maximum(tmin, lo)
        tmax = hi if tmax is None else jnp.minimum(tmax, hi)
    ok = (tmin <= tmax) & (tmin > EPSILON)
    tm = jnp.where(ok, tmin, FLT_MAX)
    p = [o[k] + d[k] * tmin for k in range(3)]
    n = [jnp.zeros_like(tmin) for _ in range(3)]
    taken = jnp.zeros_like(tmin, dtype=jnp.bool_)
    # ordered if/else chain; first matching face wins (scene.cpp:262-274)
    for axis, bound, sign in (
            (0, bmin, -1.0), (0, bmax, 1.0),
            (1, bmin, -1.0), (1, bmax, 1.0),
            (2, bmin, -1.0), (2, bmax, 1.0)):
        c = jnp.abs(p[axis] - bound[axis]) < EPSILON
        use = c & ~taken
        n[axis] = jnp.where(use, sign, n[axis])
        taken = taken | c
    return tm, tuple(n)


def _type_runs(obj_types):
    """Compress the static per-object type list into (type, start, length)
    runs of consecutive same-type rows (insertion order preserved)."""
    runs = []
    for gid, typ in enumerate(obj_types):
        if runs and runs[-1][0] == typ:
            runs[-1][2] += 1
        else:
            runs.append([typ, gid, 1])
    return [tuple(r) for r in runs]


def _one_step(typ, motion_blur, row, o, d, time):
    """One primitive test; ``typ`` is static so only its formula lowers;
    ``row(k)`` reads column k of the object's packed SMEM row (the index may
    be a traced scalar inside a fori_loop body)."""
    if typ == OBJ_SPHERE:
        return _sphere_step(o, d, time, (row(0), row(1), row(2)),
                            row(3), motion_blur)
    if typ == OBJ_TRIANGLE:
        return _triangle_step(o, d, (row(0), row(1), row(2)),
                              (row(3), row(4), row(5)),
                              (row(6), row(7), row(8)))
    if typ == OBJ_PLANE:
        return _plane_step(o, d, (row(0), row(1), row(2)), row(3))
    return _box_step(o, d, (row(0), row(1), row(2)),
                     (row(3), row(4), row(5)))


def _fold_objects(obj_types, motion_blur, data_ref, o, d, time,
                  update, carry):
    """Fold ``update(carry, gid, t, normal) -> carry`` over every object in
    insertion order (strict-< first-wins tie-break preserved).  Short runs
    unroll (static row index → static scalar extracts); runs of at least
    LOOP_MIN same-type rows lower to one ``fori_loop`` whose body reads the
    row with a dynamic SMEM index, so the program size is O(#runs), not
    O(#objects)."""
    for typ, start, length in _type_runs(obj_types):
        if length < LOOP_MIN:
            for gid in range(start, start + length):
                t, n = _one_step(typ, motion_blur,
                                 lambda k, g=gid: data_ref[g, k], o, d, time)
                carry = update(carry, gid, t, n)
        else:
            def body(i, c, typ=typ):
                t, n = _one_step(typ, motion_blur,
                                 lambda k: data_ref[i, k], o, d, time)
                return update(c, i, t, n)
            carry = jax.lax.fori_loop(start, start + length, body, carry)
    return carry


def _closest_kernel(obj_types, motion_blur,
                    data_ref, mats_ref,
                    ox, oy, oz, dx, dy, dz, tmr, vd,
                    t_out, nx_out, ny_out, nz_out, oid_out, mid_out):
    del vd  # liveness parking measured slower here (pipeline stalls)
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    time = tmr[:]
    shape = time.shape

    init = (jnp.full(shape, FLT_MAX, jnp.float32),
            jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.full(shape, -1, jnp.int32), jnp.zeros(shape, jnp.int32))

    def update(c, gid, t, n):
        best_t, n0, n1, n2, best_oid, best_mid = c
        better = t < best_t  # strict <: first wins (main.cpp:321)
        gid = jnp.asarray(gid, jnp.int32)
        return (jnp.where(better, t, best_t),
                jnp.where(better, n[0], n0),
                jnp.where(better, n[1], n1),
                jnp.where(better, n[2], n2),
                jnp.where(better, gid, best_oid),
                jnp.where(better, mats_ref[gid, 0], best_mid))

    best_t, n0, n1, n2, best_oid, best_mid = _fold_objects(
        obj_types, motion_blur, data_ref, o, d, time, update, init)

    t_out[:] = best_t
    nx_out[:] = n0
    ny_out[:] = n1
    nz_out[:] = n2
    oid_out[:] = best_oid
    mid_out[:] = best_mid


def _anyhit_kernel(obj_types, motion_blur, mode,
                   data_ref, mats_ref,
                   ox, oy, oz, dx, dy, dz, dist, excl, vd, occ_out):
    del mats_ref, vd  # liveness parking measured slower here
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    max_d = dist[:]
    ex = excl[:]
    time = jnp.zeros_like(max_d)

    # occlusion carried as f32 0/1: Mosaic cannot yield i1 vectors from
    # fori_loop bodies (scenes with >= LOOP_MIN same-type objects lower
    # their runs to fori — e.g. the 100-sphere random scene)
    def update(occluded, gid, t, _n):
        if mode == "grid":
            # grid occluder compare: strict t < dist, no self-exclusion
            # (grid.cpp:330-352)
            hit = t < max_d
        elif mode == "bvh":
            # BVH any-hit: t <= dist + EPSILON, no self-exclusion
            # (bvh.cpp:376)
            hit = t <= max_d + EPSILON
        else:
            # main.cpp:432-440: t in (1e-4, dist), skipping the shaded
            # object
            gid = jnp.asarray(gid, jnp.int32)
            hit = (t < max_d) & (t > 1e-4) & (ex != gid)
        return jnp.maximum(occluded, hit.astype(jnp.float32))

    occluded = _fold_objects(obj_types, motion_blur, data_ref, o, d, time,
                             update, jnp.zeros(max_d.shape, jnp.float32))
    occ_out[:] = (occluded > 0.0).astype(jnp.int32)


def _pad_view(a, rows):
    """(R,) -> (rows, LANES) zero-padded view."""
    R = a.shape[0]
    need = rows * LANES
    if need != R:
        a = jnp.concatenate([a, jnp.zeros((need - R,), a.dtype)])
    return a.reshape(rows, LANES)


def _ray_grid(R):
    rows = max(-(-R // LANES), 1)
    rows = -(-rows // TILE_ROWS) * TILE_ROWS
    return rows, rows // TILE_ROWS


def pallas_supported(scene: SceneData) -> bool:
    """Brute-force kernel applicability: the SMEM table must fit, and the
    *unrolled* candidate count (rows in runs shorter than LOOP_MIN — runs of
    at least LOOP_MIN lower to a fori_loop, not code) must stay within the
    compile-time budget."""
    n = scene.static.n_objects
    if not 0 < n <= MAX_OBJECTS:
        return False
    unrolled = sum(length for _t, _s, length in
                   _type_runs(scene.static.obj_types) if length < LOOP_MIN)
    return unrolled <= MAX_UNROLL


def _table_specs(scene: SceneData):
    """Packed table + mats as SMEM-resident whole-array inputs."""
    data, _types, mats = scene.packed_objects()
    mats2 = mats[:, None].astype(jnp.int32)
    specs = [
        pl.BlockSpec(data.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(mats2.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    return (data, mats2), specs


def closest_hit_pallas(scene: SceneData, o, d, time, motion_blur: bool,
                       interpret: bool = False, valid=None):
    """Drop-in for closest_hit_brute (forward-only).  ``valid`` (bool
    (R,), optional) marks consumed lanes; all-dead tiles skip the whole
    object fold."""
    from distributionraytracer_tpu.ops.intersect import HitResult
    R = o.shape[0]
    rows, grid = _ray_grid(R)

    vd = (jnp.ones((R,), jnp.float32) if valid is None
          else valid.astype(jnp.float32))
    rays = [_pad_view(x, rows) for x in
            (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], time,
             vd)]
    (data, mats2), tab_specs = _table_specs(scene)

    spec = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    fshape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    ishape = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)

    kern = functools.partial(_closest_kernel, scene.static.obj_types,
                             motion_blur)
    t, nx, ny, nz, oid, mid = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=tab_specs + [spec] * 8,
        out_specs=[spec] * 6,
        out_shape=[fshape, fshape, fshape, fshape, ishape, ishape],
        interpret=interpret,
    )(data, mats2, *rays)

    flat = lambda a: a.reshape(-1)[:R]
    t = flat(t)
    hit = t < FLT_MAX
    normal = jnp.stack([flat(nx), flat(ny), flat(nz)], axis=-1)
    return HitResult(hit=hit, t=t, normal=normal,
                     obj_id=jnp.where(hit, flat(oid), -1),
                     mat_id=flat(mid))


def any_hit_pallas(scene: SceneData, o, d, max_dist, exclude_obj,
                   motion_blur: bool, interpret: bool = False,
                   mode: str = "none", valid=None):
    """Drop-in for any_hit_brute (shadow rays carry time = 0).

    ``mode`` selects the occluder comparison: "none" (linear-scan
    reference semantics incl. self-exclusion), "grid" or "bvh" (the
    accel-matched compares for the cost-based brute backend).
    ``valid`` marks consumed lanes; all-dead tiles skip the fold."""
    R = o.shape[0]
    rows, grid = _ray_grid(R)

    if exclude_obj is None:
        exclude_obj = jnp.full((R,), -1, jnp.int32)
    vd = (jnp.ones((R,), jnp.float32) if valid is None
          else valid.astype(jnp.float32))
    rays = [_pad_view(x, rows) for x in
            (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             max_dist, exclude_obj.astype(jnp.int32), vd)]
    (data, mats2), tab_specs = _table_specs(scene)

    spec = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_anyhit_kernel, scene.static.obj_types,
                             motion_blur, mode)
    occ = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=tab_specs + [spec] * 9,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=interpret,
    )(data, mats2, *rays)
    return occ.reshape(-1)[:R].astype(jnp.bool_)
