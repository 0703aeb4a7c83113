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


# ---------------------------------------------------------------- bounce
# Fused per-bounce megakernel (VERDICT r3 item 4): closest hit + point
# -light direct lighting (with in-kernel shadow folds) + scatter +
# Russian roulette + gradient-sky miss + state update, one HBM round
# trip per bounce instead of the ~10 the XLA glue streams.  Scope gates
# (pt_bounce_supported): gradient sky, point lights only, no striped
# materials — exactly the harness scene 0 shape; other configs keep the
# query-kernel + XLA path.  Uniform random inputs are precomputed by the
# caller with the same jax.random stream as ray_color, so the estimator
# is unchanged (results match to float association).

BOUNCE_ROWS = 32  # rays per grid step (tuned: 8/16/64 measured slower)
PI = np.float32(3.14159265358979)
MT_DIFFUSE, MT_METAL, MT_DIELECTRIC, MT_PLASTIC = 0, 1, 2, 3


def pack_pt_mats(scene):
    """(M_objects, 16) f32 per-OBJECT material rows: [type, albedo3,
    spec3, emissive3, rough, refidx, refract3 (the Beer color), stripe]
    indexed by object id (the closest fold carries the winner's fields
    out of SMEM)."""
    _, mats, _ = pack_pt(scene)
    mid = mats[:, 0]
    j = jnp.asarray  # scene leaves may be host numpy; mid is traced
    row = jnp.concatenate([
        j(scene.mat_type)[mid][:, None].astype(jnp.float32),
        j(scene.mat_albedo)[mid], j(scene.mat_spec)[mid],
        j(scene.mat_emissive)[mid],
        j(scene.mat_rough)[mid][:, None],
        j(scene.mat_refidx)[mid][:, None],
        j(scene.mat_refract)[mid],
        j(scene.mat_stripe)[mid][:, None].astype(jnp.float32),
    ], axis=1)
    return row.astype(jnp.float32)


def pt_bounce_supported(scene) -> bool:
    """Static-only gate (callable on traced scenes).  Since round 5 the
    kernel covers every GLSL harness scene: quad-light direct lighting
    (jittered point, NO shadow ray — P3D_RT.glsl:483-523) runs in-kernel
    and cubemap skies latch the miss state (throughput + direction) for
    one texel gather per sample after the bounce scan (the gather is the
    only part that stays XLA — per-index DMA cost, see ops/cubemap)."""
    return pt_supported(scene)


def _norm3(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-24))
    return x * inv, y * inv, z * inv


def _fresnel_schlick1(cos_t, f0):
    return f0 + (1.0 - f0) * jnp.maximum(1.0 - cos_t, 0.0) ** 5


def _bounce_kernel(types, n_pl, n_ql, rr, grad_sky, data_ref, mats_ref,
                   lights_ref, qlights_ref,
                   ox, oy, oz, dx, dy, dz, tmr,
                   c0, c1, c2, th0, th1, th2, alv,
                   uch, ua0, ua1, ua2, ub0, ub1, ub2, urr,
                   *rest):
    uq = rest[:2 * n_ql]
    (mw0, mw1, mw2, md0, md1, md2) = rest[2 * n_ql:2 * n_ql + 6]
    outs = rest[2 * n_ql + 6:]
    (oxo, oyo, ozo, dxo, dyo, dzo,
     c0o, c1o, c2o, t0o, t1o, t2o, alvo,
     mw0o, mw1o, mw2o, md0o, md1o, md2o) = outs
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    time = tmr[:]
    shape = time.shape
    col = [c0[:], c1[:], c2[:]]
    thr = [th0[:], th1[:], th2[:]]
    alive = alv[:] > 0.0

    # ---- closest hit, carrying the winner's material row ----
    init = ((jnp.full(shape, BIG, jnp.float32),)
            + tuple(jnp.zeros(shape, jnp.float32) for _ in range(3))
            + tuple(jnp.zeros(shape, jnp.float32) for _ in range(16)))

    def upd_closest(c, gid, t, n):
        better = t < c[0]  # strict <: table order first-wins
        out = [jnp.where(better, t, c[0])]
        for k in range(3):
            out.append(jnp.where(better, n[k], c[1 + k]))
        for k in range(16):
            out.append(jnp.where(better, mats_ref[gid, k], c[4 + k]))
        return tuple(out)

    cc = _fold(types, data_ref, o, d, time, upd_closest, init)
    t_hit = cc[0]
    hit = t_hit < BIG
    nx, ny, nz = _norm3(cc[1], cc[2], cc[3])
    m_typ = cc[4]
    m_alb = list(cc[5:8])
    m_spec = cc[8:11]
    m_emis = cc[11:14]
    m_rough = cc[14]
    m_refidx = cc[15]
    m_refract = cc[16:19]
    m_stripe = cc[19]
    t_safe = jnp.where(hit, t_hit, 1.0)
    px = o[0] + d[0] * t_safe
    py = o[1] + d[1] * t_safe
    pz = o[2] + d[2] * t_safe
    # striped background shade (P3D_RT.glsl:149)
    shade = jnp.floor(jnp.mod(px, 1.0) * 2.0)
    for k in range(3):
        m_alb[k] = jnp.where(m_stripe > 0.5, shade, m_alb[k])

    live_hit = alive & hit
    emis_on = ((m_emis[0] != 0.0) | (m_emis[1] != 0.0)
               | (m_emis[2] != 0.0))
    g_em = live_hit & emis_on
    for k in range(3):
        col[k] = col[k] + jnp.where(g_em, m_emis[k] * thr[k], 0.0)

    # ---- direct lighting: point lights with in-kernel shadow folds ----
    vx, vy, vz = _norm3(d[0], d[1], d[2])
    vx, vy, vz = -vx, -vy, -vz  # viewDir (P3D_RT.glsl:526)
    is_gm = (m_typ == MT_METAL) | (m_typ == MT_PLASTIC)
    is_pla = m_typ == MT_PLASTIC
    for j in range(n_pl):
        lx = lights_ref[j, 0] - px
        ly = lights_ref[j, 1] - py
        lz = lights_ref[j, 2] - pz
        dist = jnp.sqrt(jnp.maximum(lx * lx + ly * ly + lz * lz, 1e-24))
        lx, ly, lz = lx / dist, ly / dist, lz / dist
        # shadow fold (any_hit, tmin 1e-3 .. dist - 1e-3, time = 0)
        so = (px + nx * EPS, py + ny * EPS, pz + nz * EPS)
        sd = (lx, ly, lz)
        max_d = dist - 1e-3

        def upd_occ(occ, gid, t, _n):
            return jnp.maximum(occ, jnp.where(t < max_d, 1.0, 0.0))

        occ = _fold(types, data_ref, so, sd, jnp.zeros_like(time),
                    upd_occ, jnp.zeros(shape, jnp.float32))
        shadowed = occ > 0.0

        ndl = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
        # Blinn H = normalize(l + v); shin = 8/rough^4 - 2
        hx2, hy2, hz2 = _norm3(lx + vx, ly + vy, lz + vz)
        ndh = jnp.maximum(nx * hx2 + ny * hy2 + nz * hz2, 0.0)
        shin = 8.0 / (m_rough ** 4 + EPS) - 2.0
        spec_b = ndh ** shin
        # GGX (common.glsl:243-298), V = viewDir for point lights
        nov = jnp.maximum(nx * vx + ny * vy + nz * vz, 0.0)
        cos_vh = jnp.maximum(vx * hx2 + vy * hy2 + vz * hz2, 0.0)
        alpha2 = (m_rough * m_rough) ** 2
        bb = ndh * ndh * (alpha2 - 1.0) + 1.0
        Dg = alpha2 / (PI * bb * bb + EPS)
        rr_ = 0.25 * m_rough
        kk = rr_ * rr_ / 2.0
        g1l = jnp.maximum(ndl, 0.0) / (ndl * (1.0 - kk) + kk + EPS)
        g1v = jnp.maximum(nov, 0.0) / (nov * (1.0 - kk) + kk + EPS)
        DG = (Dg * g1l * g1v) / (4.0 * nov * ndl + EPS)
        ks_f = [_fresnel_schlick1(jnp.maximum(nov, 0.0), m_spec[k])
                for k in range(3)]
        lit = (nx * lx + ny * ly + nz * lz) > 0.0
        gate = live_hit & lit & ~shadowed
        for k in range(3):
            ggx_k = DG * _fresnel_schlick1(cos_vh, m_spec[k])
            spec_k = jnp.where(is_gm, ggx_k, m_spec[k] * spec_b)
            diff_k = jnp.where(is_pla,
                               (1.0 - ks_f[k]) * m_alb[k] / PI,
                               m_alb[k] * ndl)
            contrib = ((diff_k + spec_k) * lights_ref[j, 3 + k] * ndl)
            col[k] = col[k] + jnp.where(gate, contrib * thr[k], 0.0)

    # ---- quad lights: jittered point, NO shadow ray, and the GGX view
    # sign quirk — BRDF_GGX receives -viewDir = the raw ray direction
    # while Blinn-H keeps +viewDir (P3D_RT.glsl:483-523) ----
    for j in range(n_ql):
        u1 = uq[2 * j][:]
        u2 = uq[2 * j + 1][:]
        lpx2 = (qlights_ref[j, 0] + qlights_ref[j, 3] * u1
                + qlights_ref[j, 6] * u2)
        lpy2 = (qlights_ref[j, 1] + qlights_ref[j, 4] * u1
                + qlights_ref[j, 7] * u2)
        lpz2 = (qlights_ref[j, 2] + qlights_ref[j, 5] * u1
                + qlights_ref[j, 8] * u2)
        lx, ly, lz = _norm3(lpx2 - px, lpy2 - py, lpz2 - pz)
        gx, gy, gz = -vx, -vy, -vz  # GGX view = +normalize(r.d)
        ndl = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
        # Blinn H with +viewDir
        hbx, hby, hbz = _norm3(lx + vx, ly + vy, lz + vz)
        ndh_b = jnp.maximum(nx * hbx + ny * hby + nz * hbz, 0.0)
        shin = 8.0 / (m_rough ** 4 + EPS) - 2.0
        spec_b = ndh_b ** shin
        # GGX with the quirked view
        hgx, hgy, hgz = _norm3(lx + gx, ly + gy, lz + gz)
        nov = jnp.maximum(nx * gx + ny * gy + nz * gz, 0.0)
        ndh = jnp.maximum(nx * hgx + ny * hgy + nz * hgz, 0.0)
        cos_vh = jnp.maximum(gx * hgx + gy * hgy + gz * hgz, 0.0)
        alpha2 = (m_rough * m_rough) ** 2
        bb = ndh * ndh * (alpha2 - 1.0) + 1.0
        Dg = alpha2 / (PI * bb * bb + EPS)
        rr_ = 0.25 * m_rough
        kk = rr_ * rr_ / 2.0
        g1l = jnp.maximum(ndl, 0.0) / (ndl * (1.0 - kk) + kk + EPS)
        g1v = jnp.maximum(nov, 0.0) / (nov * (1.0 - kk) + kk + EPS)
        DG = (Dg * g1l * g1v) / (4.0 * nov * ndl + EPS)
        ks_f = [_fresnel_schlick1(jnp.maximum(nov, 0.0), m_spec[k])
                for k in range(3)]
        lit = (nx * lx + ny * ly + nz * lz) > 0.0
        gate = live_hit & lit
        for k in range(3):
            ggx_k = DG * _fresnel_schlick1(cos_vh, m_spec[k])
            spec_k = jnp.where(is_gm, ggx_k, m_spec[k] * spec_b)
            diff_k = jnp.where(is_pla,
                               (1.0 - ks_f[k]) * m_alb[k] / PI,
                               m_alb[k] * ndl)
            contrib = ((diff_k + spec_k) * qlights_ref[j, 9 + k] * ndl)
            col[k] = col[k] + jnp.where(gate, contrib * thr[k], 0.0)

    # ---- scatter (common.glsl:300-407) ----
    outside = (d[0] * nx + d[1] * ny + d[2] * nz) < 0.0
    sgn = jnp.where(outside, 1.0, -1.0)
    Nx, Ny, Nz = nx * sgn, ny * sgn, nz * sgn

    def unit_sphere(u0, u1, u2):
        h0 = u0[:] * 2.0 - 1.0
        phi = u1[:] * 6.28318530718
        # jnp.cbrt fails Mosaic lowering (closed_call); u ∈ [0,1)
        r3 = jnp.power(jnp.maximum(u2[:], 0.0), 1.0 / 3.0)
        s = jnp.sqrt(jnp.maximum(1.0 - h0 * h0, 0.0))
        return (r3 * s * jnp.sin(phi), r3 * s * jnp.cos(phi), r3 * h0)

    sax, say, saz = unit_sphere(ua0, ua1, ua2)
    uvx, uvy, uvz = _norm3(sax, say, saz)
    sbx, sby, sbz = unit_sphere(ub0, ub1, ub2)

    # DIFFUSE: dir = N + unit vector, unnormalized
    ddx, ddy, ddz = Nx + uvx, Ny + uvy, Nz + uvz
    a_dif = [m_alb[k] * jnp.maximum(
        Nx * ddx + Ny * ddy + Nz * ddz, 0.0) for k in range(3)]

    # METAL: reflect + rough fuzz
    ddn = d[0] * Nx + d[1] * Ny + d[2] * Nz
    rfx = d[0] - 2.0 * ddn * Nx
    rfy = d[1] - 2.0 * ddn * Ny
    rfz = d[2] - 2.0 * ddn * Nz
    mx, my, mz = _norm3(rfx + sbx * m_rough, rfy + sby * m_rough,
                        rfz + sbz * m_rough)
    ok_met = (mx * Nx + my * Ny + mz * Nz) > 0.0

    # DIELECTRIC
    ior1 = jnp.where(outside, 1.0, m_refidx)
    ior2 = jnp.where(outside, m_refidx, 1.0)
    eta = ior1 / ior2
    vdn = vx * Nx + vy * Ny + vz * Nz
    vtx = Nx * vdn - vx
    vty = Ny * vdn - vy
    vtz = Nz * vdn - vz
    sin_i = jnp.sqrt(jnp.maximum(vtx * vtx + vty * vty + vtz * vtz, 0.0))
    sin_t = eta * sin_i
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t * sin_t, 0.0))
    cos_sel = jnp.where(ior1 > ior2, cos_t, vdn)
    r0 = ((ior1 - ior2) / (ior1 + ior2)) ** 2
    schl = r0 + (1.0 - r0) * jnp.maximum(1.0 - cos_sel, 0.0) ** 5
    refl_prob = jnp.where(sin_t >= 1.0, 1.0, schl)
    take_refl = uch[:] < refl_prob
    ix, iy, iz = _norm3(d[0], d[1], d[2])
    ndi = Nx * ix + Ny * iy + Nz * iz
    kref = 1.0 - eta * eta * (1.0 - ndi * ndi)
    kok = kref >= 0.0
    rt = eta * ndi + jnp.sqrt(jnp.maximum(kref, 0.0))
    rrx = jnp.where(kok, eta * ix - rt * Nx, 0.0)
    rry = jnp.where(kok, eta * iy - rt * Ny, 0.0)
    rrz = jnp.where(kok, eta * iz - rt * Nz, 0.0)
    qx, qy, qz = _norm3(rrx + sbx * m_rough, rry + sby * m_rough,
                        rrz + sbz * m_rough)
    dex = jnp.where(take_refl, mx, qx)
    dey = jnp.where(take_refl, my, qy)
    dez = jnp.where(take_refl, mz, qz)
    t_beer = jnp.where(hit, t_hit, 0.0)
    a_die = [jnp.where(take_refl | outside, 1.0,
                       jnp.exp(-m_refract[k] * t_beer))
             for k in range(3)]

    # PLASTIC
    lpx = o[0] - px
    lpy = o[1] - py
    lpz = o[2] - pz
    lpx, lpy, lpz = _norm3(lpx, lpy, lpz)
    hpx, hpy, hpz = _norm3(vx + lpx, vy + lpy, vz + lpz)
    cos_p = vx * hpx + vy * hpy + vz * hpz
    f_vec = [_fresnel_schlick1(cos_p, m_spec[k]) for k in range(3)]
    prob = (f_vec[0] + f_vec[1] + f_vec[2]) / 3.0
    take_spec = uch[:] < prob
    gate_p = (mx * Nx + my * Ny + mz * Nz) > 0.0
    pdx, pdy, pdz = _norm3(Nx + sbx, Ny + sby, Nz + sbz)
    plx = jnp.where(take_spec, mx, pdx)
    ply = jnp.where(take_spec, my, pdy)
    plz = jnp.where(take_spec, mz, pdz)

    is_dif = m_typ == MT_DIFFUSE
    is_met = m_typ == MT_METAL
    is_die = m_typ == MT_DIELECTRIC

    def sel(a_dif_, a_met_, a_die_, a_pla_):
        r = jnp.where(is_dif, a_dif_, a_pla_)
        r = jnp.where(is_met, a_met_, r)
        return jnp.where(is_die, a_die_, r)

    new_dx = sel(ddx, mx, dex, plx)
    new_dy = sel(ddy, my, dey, ply)
    new_dz = sel(ddz, mz, dez, plz)
    off = jnp.where(is_die & ~take_refl, -EPS, EPS)
    new_ox = px + Nx * off
    new_oy = py + Ny * off
    new_oz = pz + Nz * off
    atten = []
    for k in range(3):
        a_spec_k = jnp.where(gate_p,
                             m_spec[k] / jnp.maximum(prob, 1e-8), 1.0)
        a_dpla_k = ((1.0 - f_vec[k]) * m_alb[k] / PI
                    / jnp.maximum(1.0 - prob, 1e-8))
        a_pla_k = jnp.where(take_spec, a_spec_k, a_dpla_k)
        atten.append(sel(a_dif[k], m_spec[k], a_die[k], a_pla_k))
    ok = (~is_met) | ok_met  # bool select_n unsupported in Mosaic

    # no-scatter absorbed: col += thr * emissive (P3D_RT.glsl:641-645)
    g_ab = live_hit & ~ok
    for k in range(3):
        col[k] = col[k] + jnp.where(g_ab, thr[k] * m_emis[k], 0.0)
        thr[k] = jnp.where(live_hit & ok, thr[k] * atten[k], thr[k])

    # Russian roulette (P3D_RT.glsl:651-656)
    if rr:
        p = jnp.maximum(thr[0], jnp.maximum(thr[1], thr[2]))
        killed = urr[:] > p
        boost = 1.0 / jnp.maximum(p, 1e-12)
        g_rr = live_hit & ok & ~killed
        for k in range(3):
            thr[k] = jnp.where(g_rr, thr[k] * boost, thr[k])
    else:
        killed = jnp.zeros(shape, jnp.bool_)

    # miss (P3D_RT.glsl:659-672): gradient sky folds in-kernel; cubemap
    # modes latch (throughput, direction) instead — misses are terminal,
    # so the caller pays ONE texel gather per sample after the scan
    miss = alive & ~hit
    if grad_sky:
        tsky = jnp.clip(0.8 * (d[1] + 1.0), 0.0, 1.0)
        sky = (1.0 - tsky + tsky * 0.5, 1.0 - tsky + tsky * 0.7,
               1.0 - tsky + tsky * 1.0)
        for k in range(3):
            col[k] = col[k] + jnp.where(miss, thr[k] * sky[k], 0.0)
        mw0o[:] = mw0[:]
        mw1o[:] = mw1[:]
        mw2o[:] = mw2[:]
        md0o[:] = md0[:]
        md1o[:] = md1[:]
        md2o[:] = md2[:]
    else:
        mw0o[:] = jnp.where(miss, thr[0], mw0[:])
        mw1o[:] = jnp.where(miss, thr[1], mw1[:])
        mw2o[:] = jnp.where(miss, thr[2], mw2[:])
        md0o[:] = jnp.where(miss, d[0], md0[:])
        md1o[:] = jnp.where(miss, d[1], md1[:])
        md2o[:] = jnp.where(miss, d[2], md2[:])

    alive2 = alive & hit & ok & ~killed
    oxo[:] = jnp.where(alive2, new_ox, o[0])
    oyo[:] = jnp.where(alive2, new_oy, o[1])
    ozo[:] = jnp.where(alive2, new_oz, o[2])
    dxo[:] = jnp.where(alive2, new_dx, d[0])
    dyo[:] = jnp.where(alive2, new_dy, d[1])
    dzo[:] = jnp.where(alive2, new_dz, d[2])
    c0o[:] = col[0]
    c1o[:] = col[1]
    c2o[:] = col[2]
    t0o[:] = thr[0]
    t1o[:] = thr[1]
    t2o[:] = thr[2]
    alvo[:] = jnp.where(alive2, 1.0, 0.0)


def pt_bounce(scene, o, d, col, thr, alive, time, uch, u3a, u3b, urr,
              uq=None, miss_w=None, miss_d=None,
              rr: bool = True, interpret: bool = False):
    """One fused bounce step; state in, state out (see _bounce_kernel).

    ``uq``: (R, 2*n_ql) quad-light jitter uniforms (same key schedule as
    the jnp body).  ``miss_w``/``miss_d``: (R, 3) latched miss state for
    cubemap skies (carried through the scan; the caller applies the
    texel fetch once after the loop)."""
    from distributionraytracer_tpu.integrator.pathtracer import (
        SKY_GRADIENT,
    )
    data, mats, types = pack_pt(scene)
    mrows = pack_pt_mats(scene)
    lights = jnp.concatenate(
        [scene.plight_pos, scene.plight_color], axis=1).astype(jnp.float32)
    if lights.shape[0] == 0:
        lights = jnp.zeros((1, 6), jnp.float32)
    qlights = jnp.concatenate(
        [scene.qlight_pos, scene.qlight_e1, scene.qlight_e2,
         scene.qlight_color], axis=1).astype(jnp.float32)
    if qlights.shape[0] == 0:
        qlights = jnp.zeros((1, 12), jnp.float32)
    n_pl = scene.plight_pos.shape[0]
    n_ql = scene.qlight_pos.shape[0]
    grad_sky = scene.sky_mode == SKY_GRADIENT
    R = o.shape[0]
    rows = max(-(-R // LANES), 1)
    rows = -(-rows // BOUNCE_ROWS) * BOUNCE_ROWS
    grid = rows // BOUNCE_ROWS
    if miss_w is None:
        miss_w = jnp.zeros((R, 3), jnp.float32)
    if miss_d is None:
        miss_d = jnp.zeros((R, 3), jnp.float32)

    pv = lambda a: _pad_view(a, rows)
    rays = [pv(x) for x in (
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], time,
        col[:, 0], col[:, 1], col[:, 2], thr[:, 0], thr[:, 1], thr[:, 2],
        alive.astype(jnp.float32),
        uch, u3a[:, 0], u3a[:, 1], u3a[:, 2],
        u3b[:, 0], u3b[:, 1], u3b[:, 2], urr)]
    for j in range(n_ql):
        rays.append(pv(uq[:, 2 * j]))
        rays.append(pv(uq[:, 2 * j + 1]))
    for k in range(3):
        rays.append(pv(miss_w[:, k]))
    for k in range(3):
        rays.append(pv(miss_d[:, k]))
    spec = pl.BlockSpec((BOUNCE_ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    fshape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    tab_specs = [
        pl.BlockSpec(data.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(mrows.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(lights.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(qlights.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    n_in = 22 + 2 * n_ql + 6
    kern = functools.partial(_bounce_kernel, types, n_pl, n_ql, rr,
                             grad_sky)
    outs = pl.pallas_call(
        kern, grid=(grid,),
        in_specs=tab_specs + [spec] * n_in,
        out_specs=[spec] * 19,
        out_shape=[fshape] * 19,
        interpret=interpret,
    )(data, mrows, lights, qlights, *rays)
    fl = lambda a: a.reshape(-1)[:R]
    st3 = lambda i: jnp.stack([fl(outs[i]), fl(outs[i + 1]),
                               fl(outs[i + 2])], axis=-1)
    o2 = st3(0)
    d2 = st3(3)
    col2 = st3(6)
    thr2 = st3(9)
    alive2 = fl(outs[12]) > 0.0
    mw2 = st3(13)
    md2 = st3(16)
    return o2, d2, col2, thr2, alive2, mw2, md2
