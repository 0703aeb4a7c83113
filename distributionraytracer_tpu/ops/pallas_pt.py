"""Pallas TPU megakernel for the GLSL path tracer's scene queries.

The jnp ``hit_world``/``any_hit`` (integrator.pathtracer) materialize
(primitives, rays) planes in HBM for every query — 4 queries per bounce
(1 closest + one shadow per point light in scene 0) × 10 bounces stream
tens of terabytes per frame at the 800×600×64spp harness shape.  This
kernel keeps a ray tile in VMEM and walks the packed primitive table in
``hit_world``'s group order (triangles, spheres, moving spheres —
P3D_RT.glsl:16-481's sequential if-chain) with the strict-``<``
first-wins update, writing only the winner: one HBM read of the rays,
one write of the result.

Semantics match ``hit_world`` / ``any_hit`` exactly (GLSL quirks
preserved: ``a != 0`` triangle gate, ``t > 1e-3`` sphere gates, negative
radius flipping the normal, the moving sphere's ``d1 = (c1-c0)*EPS``
quadratic and outside-test center selection).  Same structure as
ops.pallas_intersect (the Whitted brute megakernel): short same-type runs
unroll, long runs lower to a ``fori_loop`` over an SMEM-resident table.
Forward-only — the PT has no training path; CPU tests run interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_ROWS = 64  # 8192 rays per grid step
LOOP_MIN = 16
MAX_PRIMS = 1024  # SMEM bound (1024 x 12 f32 = 48 KiB)
EPS = 1e-3  # common.glsl:7
BIG = np.float32(1e4)  # hit_world's default tmax
FLT_MAX = np.float32(3.402823466e38)

PT_TRI, PT_SPH, PT_MSPH = 0, 1, 2


def pack_pt(scene):
    """PTScene -> ((K,12) f32 rows, (K,1) i32 mats, static type tuple).

    Row layouts: tri [v0, e1, e2]; sphere [c, r]; moving sphere
    [c0, c1-c0, r].  Group order matches hit_world's scan order.  Pure
    jnp on the scene leaves, so it traces under jit (the tables stay
    pytree inputs, never baked constants); the type tuple derives from
    static shapes only.
    """
    T = scene.tri_v0.shape[0]
    S = scene.sph_center.shape[0]
    M = scene.msph_c0.shape[0]
    parts, mparts = [], []
    if T:
        parts.append(jnp.concatenate(
            [scene.tri_v0, scene.tri_e1, scene.tri_e2,
             jnp.zeros((T, 3), jnp.float32)], axis=1))
        mparts.append(scene.tri_mat)
    if S:
        parts.append(jnp.concatenate(
            [scene.sph_center, scene.sph_radius[:, None],
             jnp.zeros((S, 8), jnp.float32)], axis=1))
        mparts.append(scene.sph_mat)
    if M:
        parts.append(jnp.concatenate(
            [scene.msph_c0, scene.msph_c1 - scene.msph_c0,
             scene.msph_radius[:, None], jnp.zeros((M, 5), jnp.float32)],
            axis=1))
        mparts.append(scene.msph_mat)
    types = (PT_TRI,) * T + (PT_SPH,) * S + (PT_MSPH,) * M
    if not parts:
        return (jnp.zeros((1, 12), jnp.float32),
                jnp.zeros((1, 1), jnp.int32), (PT_SPH,))
    data = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    mats = (mparts[0] if len(mparts) == 1
            else jnp.concatenate(mparts))[:, None].astype(jnp.int32)
    return data.astype(jnp.float32), mats, types


def pt_supported(scene) -> bool:
    n = (scene.tri_v0.shape[0] + scene.sph_center.shape[0]
         + scene.msph_c0.shape[0])
    return 0 < n <= MAX_PRIMS


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _tri_step(o, d, row):
    """hit_triangle (common.glsl:418-447) via hit_world's formulation."""
    v0 = (row(0), row(1), row(2))
    e1 = (row(3), row(4), row(5))
    e2 = (row(6), row(7), row(8))
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
          & (u + v <= 1.0) & (t > EPS))
    nx = e1[1] * e2[2] - e1[2] * e2[1]
    ny = e1[2] * e2[0] - e1[0] * e2[2]
    nz = e1[0] * e2[1] - e1[1] * e2[0]
    inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
    return jnp.where(ok, t, FLT_MAX), (nx * inv, ny * inv, nz * inv)


def _sph_step(o, d, row):
    """hit_sphere (common.glsl:513-549); negative radius flips the normal."""
    c = (row(0), row(1), row(2))
    r = row(3)
    ocx, ocy, ocz = o[0] - c[0], o[1] - c[1], o[2] - c[2]
    a = _dot3(*d, *d)
    b = 2.0 * _dot3(ocx, ocy, ocz, *d)
    cq = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - r * r
    disc = b * b - 4.0 * a * cq
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    t = jnp.where(t1 > EPS, t1, t2)
    ok = (disc >= 0.0) & (t > EPS)
    px = o[0] + d[0] * t - c[0]
    py = o[1] + d[1] * t - c[1]
    pz = o[2] + d[2] * t - c[2]
    inv = jax.lax.rsqrt(jnp.maximum(px * px + py * py + pz * pz, 1e-30))
    sign = jnp.where(r < 0.0, -1.0, 1.0)
    inv = inv * sign
    return jnp.where(ok, t, FLT_MAX), (px * inv, py * inv, pz * inv)


def _msph_step(o, d, time, row):
    """hit_movingSphere (common.glsl:551-605): the shader's quadratic in
    d1 = center(time+EPS) - center(time) = B*EPS (time-independent)."""
    A = (row(0), row(1), row(2))
    B = (row(3), row(4), row(5))
    r = row(6)
    c0 = (A[0] + B[0] * time, A[1] + B[1] * time, A[2] + B[2] * time)
    d1 = (B[0] * EPS, B[1] * EPS, B[2] * EPS)
    ocx, ocy, ocz = o[0] - c0[0], o[1] - c0[1], o[2] - c0[2]
    dd1 = _dot3(*d, *d1)
    a = _dot3(*d, *d) - dd1 * dd1
    oc_d = _dot3(ocx, ocy, ocz, *d)
    oc_d1 = _dot3(ocx, ocy, ocz, *d1)
    b = 2.0 * (oc_d - oc_d1 * dd1)
    cq = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - oc_d1 * oc_d1 - r * r
    disc = b * b - 4.0 * a * cq
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    t = jnp.where(t1 > EPS, t1, t2)
    outside = t1 > EPS
    ok = (disc >= 0.0) & (t > EPS)
    ctr = tuple(jnp.where(outside, c0[k], c0[k] + d1[k]) for k in range(3))
    px = o[0] + d[0] * t - ctr[0]
    py = o[1] + d[1] * t - ctr[1]
    pz = o[2] + d[2] * t - ctr[2]
    inv = jax.lax.rsqrt(jnp.maximum(px * px + py * py + pz * pz, 1e-30))
    return jnp.where(ok, t, FLT_MAX), (px * inv, py * inv, pz * inv)


def _one_step(typ, row, o, d, time):
    if typ == PT_TRI:
        return _tri_step(o, d, row)
    if typ == PT_SPH:
        return _sph_step(o, d, row)
    return _msph_step(o, d, time, row)


def _type_runs(types):
    runs = []
    for gid, typ in enumerate(types):
        if runs and runs[-1][0] == typ:
            runs[-1][2] += 1
        else:
            runs.append([typ, gid, 1])
    return [tuple(r) for r in runs]


def _fold(types, data_ref, o, d, time, update, carry):
    for typ, start, length in _type_runs(types):
        if length < LOOP_MIN:
            for gid in range(start, start + length):
                t, n = _one_step(typ, lambda k, g=gid: data_ref[g, k],
                                 o, d, time)
                carry = update(carry, gid, t, n)
        else:
            def body(i, c, typ=typ):
                t, n = _one_step(typ, lambda k: data_ref[i, k], o, d, time)
                return update(c, i, t, n)
            carry = jax.lax.fori_loop(start, start + length, body, carry)
    return carry


def _closest_kernel(types, data_ref, mats_ref,
                    ox, oy, oz, dx, dy, dz, tmr,
                    t_out, nx_out, ny_out, nz_out, mid_out):
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    time = tmr[:]
    shape = time.shape
    init = (jnp.full(shape, BIG, jnp.float32),
            jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.int32))

    def update(c, gid, t, n):
        bt, n0, n1, n2, bm = c
        better = t < bt  # strict <: table order first-wins
        gid = jnp.asarray(gid, jnp.int32)
        return (jnp.where(better, t, bt),
                jnp.where(better, n[0], n0),
                jnp.where(better, n[1], n1),
                jnp.where(better, n[2], n2),
                jnp.where(better, mats_ref[gid, 0], bm))

    bt, n0, n1, n2, bm = _fold(types, data_ref, o, d, time, update, init)
    t_out[:] = bt
    nx_out[:] = n0
    ny_out[:] = n1
    nz_out[:] = n2
    mid_out[:] = bm


def _anyhit_kernel(types, data_ref, mats_ref,
                   ox, oy, oz, dx, dy, dz, tmr, dist, occ_out):
    del mats_ref
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    time = tmr[:]
    max_d = dist[:]

    # occlusion carried as f32 0/1: Mosaic cannot yield i1 vectors from
    # fori_loop bodies (long same-type runs lower to fori)
    def update(occ, gid, t, _n):
        return jnp.maximum(occ, (t < max_d).astype(jnp.float32))

    occ = _fold(types, data_ref, o, d, time, update,
                jnp.zeros(max_d.shape, jnp.float32))
    occ_out[:] = (occ > 0.0).astype(jnp.int32)


def _pad_view(a, rows):
    R = a.shape[0]
    need = rows * LANES
    if need != R:
        a = jnp.concatenate([a, jnp.zeros((need - R,), a.dtype)])
    return a.reshape(rows, LANES)


def _ray_grid(R):
    rows = max(-(-R // LANES), 1)
    rows = -(-rows // TILE_ROWS) * TILE_ROWS
    return rows, rows // TILE_ROWS


def _specs(data, mats):
    return [
        pl.BlockSpec(data.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(mats.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]


def pt_closest(scene, o, d, time, interpret: bool = False):
    """Drop-in for hit_world at its default tmax (returns a PTHit)."""
    from distributionraytracer_tpu.integrator.pathtracer import PTHit
    data, mats, types = pack_pt(scene)
    R = o.shape[0]
    rows, grid = _ray_grid(R)
    rays = [_pad_view(x, rows) for x in
            (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], time)]
    spec = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    fshape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    ishape = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    kern = functools.partial(_closest_kernel, types)
    t, nx, ny, nz, mid = pl.pallas_call(
        kern, grid=(grid,),
        in_specs=_specs(data, mats) + [spec] * 7,
        out_specs=[spec] * 5,
        out_shape=[fshape, fshape, fshape, fshape, ishape],
        interpret=interpret,
    )(data, mats, *rays)
    flat = lambda a: a.reshape(-1)[:R]
    t = flat(t)
    hit = t < BIG
    normal = jnp.stack([flat(nx), flat(ny), flat(nz)], axis=-1)
    pos = o + d * jnp.where(hit, t, 1.0)[:, None]
    return PTHit(hit=hit, t=t, pos=pos, normal=normal, mat=flat(mid))


def pt_any_hit(scene, o, d, time, tmax, interpret: bool = False):
    """Drop-in for pathtracer.any_hit (tmin fixed at the GLSL 1e-3)."""
    data, mats, types = pack_pt(scene)
    R = o.shape[0]
    rows, grid = _ray_grid(R)
    tmax = jnp.broadcast_to(tmax, (R,))
    rays = [_pad_view(x, rows) for x in
            (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             time, tmax)]
    spec = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_anyhit_kernel, types)
    occ = pl.pallas_call(
        kern, grid=(grid,),
        in_specs=_specs(data, mats) + [spec] * 8,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=interpret,
    )(data, mats, *rays)
    return occ.reshape(-1)[:R].astype(jnp.bool_)
