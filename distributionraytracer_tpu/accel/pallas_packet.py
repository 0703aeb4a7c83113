"""Grouped Pallas packet traversal: 8 BVH nodes / 8 objects per VPU pass.

Second-generation packet kernel (successor of ``pallas_bvh.py``).  The
round-3 kernel walked one scalar node cursor per 1024-ray packet and paid,
per visited node, a scalar-fetch chain (block load + lane roll + 8
vector->scalar extracts) against one (8, 128)-tile slab test — measured
~25x more time in fetch/control overhead than in VPU arithmetic, and its
1024-ray packets made incoherent secondary rays walk near-whole-tree node
unions (tools/profile_packet.py).  This kernel restructures both axes:

- **Packets are 128 rays** (one lane row).  Unions shrink roughly with
  packet size for incoherent rays, directly attacking the union blowup.
- **Nodes live on sublanes**: the node table is packed so that one
  (64, 128) block column holds a *group* of 8 consecutive DFS nodes, each
  field as an (8, 1) sublane vector.  One slab test on (8, 128) tiles then
  tests 8 nodes x 128 rays — full VPU utilization with zero per-field
  scalar extracts (the only extracted scalars per group are one vote
  bitmask, one leaf bitmask and 8 skip links for the cursor walk).
- **Leaf objects are 8-aligned groups**: every collapsed leaf's objects
  are repacked into dedicated aligned groups of 8 (padded with inert
  type = -1 slots), each fetched as one (112, 128) block column giving all
  8 objects' params as (8, 1) sublane vectors — 8 primitive tests per VPU
  pass, zero scalar extracts (the round-3 kernel extracted 16 scalars per
  object).

Traversal stays the threaded DFS walk (child = node + 1, skip jumps the
subtree).  Each iteration processes the *aligned group of 8* containing
the cursor: every group node gets a per-lane vote
(``ok & entry_t < best_t``); voted leaves update only lanes that voted
them.  Processing nodes the scalar walk would have skipped is exact: a
lane can only vote a node if its own per-lane traversal would have
visited it (child AABB is contained in the parent's, entry_t is
non-decreasing down the tree, and best_t only decreases over time — so an
ancestor pruned for a lane implies every descendant fails that lane's
vote too).  Groups are visited in strictly increasing cursor order and at
most once, so leaf updates follow DFS object order and the strict-``<``
tie-break matches the XLA threaded path bit-exactly
(tests/test_pallas_accel.py locks grouped == legacy == XLA).

Reference semantics carried over (bvh.cpp:231-391 via accel/bvh.py):
entry-t slab with inside-AABB ``t := 0`` fix, closest-only ``entry_t <
best_t`` pruning, shadow any-hit ``t <= dist + EPSILON`` (BVH) or strict
``t < dist`` (grid emulation) with whole-packet early exit, shadow rays at
time = 0, no shadow self-exclusion.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distributionraytracer_tpu.accel.bvh import ThreadedBVH
from distributionraytracer_tpu.accel.pallas_bvh import packed_objects_np
from distributionraytracer_tpu.ops.common import EPSILON, FLT_MAX
from distributionraytracer_tpu.scene.types import (
    OBJ_BOX, OBJ_PLANE, OBJ_SPHERE, OBJ_TRIANGLE, SceneData,
)

LANES = 128
GROUP = 8  # nodes / objects per VPU pass (the sublane dimension)
PACKET = LANES  # rays per packet

NODE_FIELDS = 8  # bmin xyz, bmax xyz, skip, meta
OBJ_FIELDS = 14  # 12 packed params, type, global id
NODE_ROWS = NODE_FIELDS * GROUP  # 64
OBJ_ROWS = OBJ_FIELDS * GROUP  # 112

# leaf meta encoding: meta = obj_group_first * 16 + n_groups (> 0 iff leaf;
# interior/pad nodes carry 0).  Exact in f32 while obj_group_first < 2^19.
MAX_LEAF_GROUPS = 16

# Leaf size the packet tree is collapsed to.  8 = one aligned object group
# per leaf; larger multiples of 8 trade fewer node visits for more inert
# padding tests.
GROUPED_LEAF = 8


class GroupedBVH(NamedTuple):
    """Device tables for the grouped kernel (pytree of two arrays).

    ``node_g``: (64, Gn) f32 — column g holds nodes 8g..8g+7, row
    ``f * 8 + r`` = field f of node 8g+r.  ``obj_g``: (112, Go) f32 —
    column g holds objects 8g..8g+7 in leaf-group order (inert padding
    slots carry type = -1).  ``n_nodes``: int, the walk's termination
    bound (DFS sentinel); pad nodes carry impossible AABBs and
    ``skip = n_nodes``.
    """

    node_g: jnp.ndarray
    obj_g: jnp.ndarray
    n_nodes: int


def _to_groups(vals: np.ndarray, gpad: int) -> np.ndarray:
    """(N,) field values -> (8, gpad) with column g = items 8g..8g+7."""
    out = np.zeros((gpad * GROUP,), np.float32)
    out[: vals.shape[0]] = vals
    return out.reshape(gpad, GROUP).T


def pack_grouped(scene: SceneData, tb: ThreadedBVH) -> Optional[GroupedBVH]:
    """Host-side repack of a (leaf-collapsed) ThreadedBVH into grouped
    tables.  Returns None when the tree cannot be encoded exactly (a
    degenerate leaf needing >= MAX_LEAF_GROUPS object groups, or group
    indices overflowing the f32-exact meta encoding)."""
    box = np.asarray(jax.device_get(tb.node_box), np.float32)  # (N,6)
    meta = np.asarray(jax.device_get(tb.node_meta), np.int64)  # (N,4)
    oorder = np.asarray(jax.device_get(tb.obj_order), np.int64)
    N = box.shape[0]
    skip, first, nobjs = meta[:, 0], meta[:, 1], meta[:, 2]

    leaf_mask = nobjs > 0
    leaf_first = first[leaf_mask]
    leaf_nobj = nobjs[leaf_mask]
    ngroups = -(-leaf_nobj // GROUP)  # per-leaf object groups
    if ngroups.max(initial=0) >= MAX_LEAF_GROUPS:
        return None
    og_first = np.zeros(len(ngroups), np.int64)
    np.cumsum(ngroups[:-1], out=og_first[1:])
    total_groups = int(ngroups.sum())
    if total_groups * 16 + MAX_LEAF_GROUPS >= (1 << 24):
        return None

    # ---- node table ----
    gn = -(-(N + 1) // GROUP)
    gn_pad = max(-(-gn // LANES) * LANES, LANES)
    node_g = np.zeros((NODE_ROWS, gn_pad), np.float32)
    npad_items = gn_pad * GROUP

    def put(f, vals, pad):
        full = np.full((npad_items,), pad, np.float32)
        full[: vals.shape[0]] = vals
        node_g[f * GROUP:(f + 1) * GROUP] = full.reshape(
            gn_pad, GROUP).T

    for k in range(3):
        put(k, box[:, k], FLT_MAX)
        put(3 + k, box[:, 3 + k], -FLT_MAX)
    put(6, skip.astype(np.float32), float(N))
    node_meta_new = np.zeros(N, np.float32)
    node_meta_new[leaf_mask] = (og_first * 16 + ngroups).astype(np.float32)
    put(7, node_meta_new, 0.0)

    # ---- object table ----
    obj_data, obj_types, _ = packed_objects_np(scene)  # (O,12), (O,)
    O = oorder.shape[0]
    go_pad = max(-(-total_groups // LANES) * LANES, LANES)
    obj_g = np.zeros((OBJ_ROWS, go_pad), np.float32)
    obj_g[12 * GROUP:13 * GROUP] = -1.0  # inert type everywhere

    # slot of object k (position in obj_order): leaf L = searchsorted on
    # the DFS-contiguous leaf_first ranges, slot = og_first[L]*8 + offset
    if O:
        ks = np.arange(O, dtype=np.int64)
        L = np.searchsorted(leaf_first, ks, side="right") - 1
        slot = og_first[L] * GROUP + (ks - leaf_first[L])
        col, row = slot // GROUP, slot % GROUP
        src = oorder  # object slot k holds original object oorder[k]
        for p in range(12):
            obj_g[p * GROUP + row, col] = obj_data[src, p]
        obj_g[12 * GROUP + row, col] = obj_types[src].astype(np.float32)
        obj_g[13 * GROUP + row, col] = src.astype(np.float32)

    return GroupedBVH(node_g=node_g, obj_g=obj_g, n_nodes=int(N))


def _prim_test_grouped(fld, o, d, inv, time, types_present, motion_blur):
    """8 objects (params as (8,1) sublane vectors from ``fld``) vs a
    128-ray packet broadcast to (8,128).  Returns (t, (nx,ny,nz)) of shape
    (8,128); inert slots (type -1) yield t = FLT_MAX."""
    typ = fld(12)
    shape = o[0].shape
    t = jnp.full(shape, FLT_MAX, jnp.float32)
    n3 = [jnp.zeros(shape, jnp.float32) for _ in range(3)]

    def sel(tag, tk, nk):
        nonlocal t, n3
        m = typ == float(tag)
        t = jnp.where(m, tk, t)
        n3 = [jnp.where(m, a, b) for a, b in zip(nk, n3)]

    if OBJ_SPHERE in types_present:
        cx, cy, cz, r = fld(0), fld(1), fld(2), fld(3)
        if motion_blur:
            cy = cy + time
        ocx, ocy, ocz = o[0] - cx, o[1] - cy, o[2] - cz
        a = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        b = 2.0 * (ocx * d[0] + ocy * d[1] + ocz * d[2])
        cq = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - 4.0 * a * cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b - sq) / (2.0 * a)
        t2 = (-b + sq) / (2.0 * a)
        ts = jnp.where(t1 > EPSILON, t1, t2)
        ok = (disc >= 0.0) & (ts > EPSILON)
        px = o[0] + d[0] * ts - cx
        py = o[1] + d[1] * ts - cy
        pz = o[2] + d[2] * ts - cz
        ninv = jax.lax.rsqrt(jnp.maximum(px * px + py * py + pz * pz,
                                         1e-30))
        sel(OBJ_SPHERE, jnp.where(ok, ts, FLT_MAX),
            (px * ninv, py * ninv, pz * ninv))
    if OBJ_TRIANGLE in types_present:
        v0 = [fld(0), fld(1), fld(2)]
        e1 = [fld(3), fld(4), fld(5)]
        e2 = [fld(6), fld(7), fld(8)]
        hx = d[1] * e2[2] - d[2] * e2[1]
        hy = d[2] * e2[0] - d[0] * e2[2]
        hz = d[0] * e2[1] - d[1] * e2[0]
        a = e1[0] * hx + e1[1] * hy + e1[2] * hz
        f = 1.0 / a  # inf when parallel; bound checks reject (scene.cpp:65)
        sx, sy, sz = o[0] - v0[0], o[1] - v0[1], o[2] - v0[2]
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1[2] - sz * e1[1]
        qy = sz * e1[0] - sx * e1[2]
        qz = sx * e1[1] - sy * e1[0]
        v = f * (qx * d[0] + qy * d[1] + qz * d[2])
        ts = f * (e2[0] * qx + e2[1] * qy + e2[2] * qz)
        ok = ((u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
              & (ts > EPSILON))
        # geometric normal is per-triangle: (8,1) math, lane-broadcast
        nx = e1[1] * e2[2] - e1[2] * e2[1]
        ny = e1[2] * e2[0] - e1[0] * e2[2]
        nz = e1[0] * e2[1] - e1[1] * e2[0]
        nn = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
        zeros = jnp.zeros(shape, jnp.float32)
        sel(OBJ_TRIANGLE, jnp.where(ok, ts, FLT_MAX),
            (nx * nn + zeros, ny * nn + zeros, nz * nn + zeros))
    if OBJ_PLANE in types_present:
        pn = [fld(0), fld(1), fld(2)]
        pd = fld(3)
        denom = d[0] * pn[0] + d[1] * pn[1] + d[2] * pn[2]
        ts = -(o[0] * pn[0] + o[1] * pn[1] + o[2] * pn[2] + pd) / denom
        ok = (jnp.abs(denom) >= EPSILON) & (ts > 0.0)
        zeros = jnp.zeros(shape, jnp.float32)
        sel(OBJ_PLANE, jnp.where(ok, ts, FLT_MAX),
            (pn[0] + zeros, pn[1] + zeros, pn[2] + zeros))
    if OBJ_BOX in types_present:
        bmin = [fld(0), fld(1), fld(2)]
        bmax = [fld(3), fld(4), fld(5)]
        tmin = tmax = None
        for k in range(3):
            ta = (bmin[k] - o[k]) * inv[k]
            tb = (bmax[k] - o[k]) * inv[k]
            lo = jnp.minimum(ta, tb)
            hi = jnp.maximum(ta, tb)
            tmin = lo if tmin is None else jnp.maximum(tmin, lo)
            tmax = hi if tmax is None else jnp.minimum(tmax, hi)
        ok = (tmin <= tmax) & (tmin > EPSILON)
        ts = jnp.where(ok, tmin, FLT_MAX)
        # face normal: EPSILON compare, first match wins (scene.cpp:262-274)
        p = [o[k] + d[k] * tmin for k in range(3)]
        n = [jnp.zeros(shape, jnp.float32) for _ in range(3)]
        taken = jnp.zeros(shape, jnp.bool_)
        for axis, bound, sign in ((0, bmin, -1.0), (0, bmax, 1.0),
                                  (1, bmin, -1.0), (1, bmax, 1.0),
                                  (2, bmin, -1.0), (2, bmax, 1.0)):
            c = jnp.abs(p[axis] - bound[axis]) < EPSILON
            use = c & ~taken
            n[axis] = jnp.where(use, sign, n[axis])
            taken = taken | c
        sel(OBJ_BOX, ts, tuple(n))
    return t, tuple(n3)


def _make_grouped_kernel(types_present, motion_blur, is_shadow, n_nodes,
                         shadow_mode="bvh", profile=False):
    """Build the grouped kernel body.  See module docstring for the
    traversal contract; ``profile`` appends per-packet (node visits,
    leaf object tests) counter outputs."""
    gn_total = -(-(n_nodes + 1) // GROUP)
    max_iters = np.int32(gn_total + 8)
    n_end = np.int32(n_nodes)

    def kernel(node_ref, obj_ref, ox, oy, oz, dx, dy, dz, tm, vd, *outs):
        shape = (GROUP, LANES)
        bc = lambda r: jnp.broadcast_to(r[:], shape)
        o = (bc(ox), bc(oy), bc(oz))
        d = (bc(dx), bc(dy), bc(dz))
        inv = tuple(1.0 / dk for dk in d)
        time = (jnp.zeros(shape, jnp.float32) if is_shadow else bc(tm))
        valid = vd[:] > 0.0  # (1,128)

        node0 = jnp.where(jnp.any(valid), 0, n_end).astype(jnp.int32)
        fmax_row = jnp.full((1, LANES), FLT_MAX, jnp.float32)
        zrow = jnp.zeros((1, LANES), jnp.float32)
        w8 = (jnp.int32(1)
              << jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0))

        def leaf_groups(meta_scalar, gate, carry):
            og0 = meta_scalar // 16
            ng = meta_scalar % 16

            def one_group(j, c):
                og = og0 + j
                obase = pl.multiple_of((og // LANES) * LANES, LANES)
                oblk = obj_ref[:, pl.ds(obase, LANES)]
                ocol = pltpu.roll(oblk, shift=LANES - (og % LANES), axis=1)
                fld = lambda f: ocol[f * GROUP:(f + 1) * GROUP, 0:1]
                t_c, n_c = _prim_test_grouped(
                    fld, o, d, inv, time, types_present, motion_blur)
                if is_shadow:
                    bt, occ, lt = c
                    hit_now = ((t_c < bt) if shadow_mode == "grid"
                               else (t_c <= bt + EPSILON))
                    any_hit = jnp.any(hit_now, axis=0, keepdims=True)
                    return (bt, jnp.where(gate & any_hit, 1.0, occ),
                            lt + GROUP)
                bt, bnx, bny, bnz, boid, lt = c
                gidv = fld(13)
                # sequential strict-< chain in object-slot order keeps the
                # reference's first-wins tie-break (DFS object order)
                for rr in range(GROUP):
                    t_r = t_c[rr:rr + 1, :]
                    better = gate & (t_r < bt)
                    bt = jnp.where(better, t_r, bt)
                    bnx = jnp.where(better, n_c[0][rr:rr + 1, :], bnx)
                    bny = jnp.where(better, n_c[1][rr:rr + 1, :], bny)
                    bnz = jnp.where(better, n_c[2][rr:rr + 1, :], bnz)
                    boid = jnp.where(
                        better,
                        jnp.broadcast_to(gidv[rr:rr + 1, 0:1], (1, LANES)),
                        boid)
                return (bt, bnx, bny, bnz, boid, lt + GROUP)

            return jax.lax.fori_loop(0, ng, one_group, carry)

        def cond(s):
            return (s[0] < n_end) & (s[1] < max_iters)

        def body(s):
            if is_shadow:
                node, it, lt, sdist, occf = s
                live = valid & (occf == 0.0)
                bt_prune = sdist
            else:
                node, it, lt, bt, bnx, bny, bnz, boid = s
                live = valid
                bt_prune = bt
            g = node // GROUP
            gbase = pl.multiple_of((g // LANES) * LANES, LANES)
            blk = node_ref[:, pl.ds(gbase, LANES)]
            col = pltpu.roll(blk, shift=LANES - (g % LANES), axis=1)
            fld = lambda f: col[f * GROUP:(f + 1) * GROUP, 0:1]
            lo = [fld(0), fld(1), fld(2)]
            hi = [fld(3), fld(4), fld(5)]
            metav = fld(7)

            # slab test, entry-t semantics (boundingBox.cpp:64-124) with
            # the inside-AABB t := 0 fix (bvh.cpp:256-257); (8,128) =
            # 8 nodes x 128 rays
            tmin = tmax = None
            inside = None
            for k in range(3):
                ta = (lo[k] - o[k]) * inv[k]
                tb = (hi[k] - o[k]) * inv[k]
                pos = inv[k] >= 0.0
                tn = jnp.where(pos, ta, tb)
                tf = jnp.where(pos, tb, ta)
                tmin = tn if tmin is None else jnp.maximum(tmin, tn)
                tmax = tf if tmax is None else jnp.minimum(tmax, tf)
                ins_k = (o[k] > lo[k]) & (o[k] < hi[k])
                inside = ins_k if inside is None else (inside & ins_k)
            ok = (tmin < tmax) & (tmax > 0.0)
            tent = jnp.where(tmin < 0.0, tmax, tmin)
            tent = jnp.where(inside, 0.0, tent)

            if is_shadow:
                vote = live & ok  # no t-pruning (bvh.cpp:347-387)
            else:
                vote = live & ok & (tent < bt_prune)
            vote_any = jnp.any(vote, axis=1, keepdims=True)  # (8,1)
            is_leaf_v = metav > 0.0
            vmask = jnp.sum(jnp.where(vote_any, w8, 0))
            lmask = jnp.sum(jnp.where(vote_any & is_leaf_v, w8, 0))

            # scalar cursor walk through the group: voted -> node+1 (a
            # voted leaf's skip IS node+1 in DFS pre-order), else skip.
            # Positions only move forward, so one ascending pass suffices.
            g8 = g * GROUP
            cur = node
            for k in range(GROUP):
                nk = g8 + k
                act = cur == nk
                vbit = ((vmask >> k) & 1) == 1
                sk = col[6 * GROUP + k, 0].astype(jnp.int32)
                cur = jnp.where(act, jnp.where(vbit, nk + 1, sk), cur)
            nxt = jnp.maximum(cur, g8 + GROUP)

            # voted leaves, in DFS order within the group
            if is_shadow:
                carry = (sdist, occf, lt)
            else:
                carry = (bt, bnx, bny, bnz, boid, lt)
            for r in range(GROUP):
                pred = ((lmask >> r) & 1) == 1
                gate = vote[r:r + 1, :]
                mr = metav[r, 0].astype(jnp.int32)
                carry = jax.lax.cond(
                    pred,
                    lambda c, _m=mr, _g=gate: leaf_groups(_m, _g, c),
                    lambda c: c, carry)

            if is_shadow:
                sdist2, occf2, lt2 = carry
                nxt = jnp.where(jnp.any(valid & (occf2 == 0.0)), nxt,
                                n_end)
                return (nxt, it + 1, lt2, sdist2, occf2)
            bt2, bnx2, bny2, bnz2, boid2, lt2 = carry
            return (nxt, it + 1, lt2, bt2, bnx2, bny2, bnz2, boid2)

        if is_shadow:
            sdist = tm[:]  # shadow calls pass dist through the time slot
            state = (node0, jnp.int32(0), jnp.int32(0), sdist, zrow)
            out = jax.lax.while_loop(cond, body, state)
            outs[0][:] = out[4]
            base = 1
        else:
            state = (node0, jnp.int32(0), jnp.int32(0), fmax_row, zrow,
                     zrow, zrow, jnp.full((1, LANES), -1.0, jnp.float32))
            out = jax.lax.while_loop(cond, body, state)
            outs[0][:] = out[3]
            outs[1][:] = out[4]
            outs[2][:] = out[5]
            outs[3][:] = out[6]
            outs[4][:] = out[7]
            base = 5
        if profile:
            f32 = lambda v: jnp.full((1, LANES), 0.0, jnp.float32
                                     ) + v.astype(jnp.float32)
            outs[base][:] = f32(out[1])
            outs[base + 1][:] = f32(out[2])

    return kernel


# rays per device dispatch (see pallas_bvh.CHUNK_RAYS): one Mosaic kernel
# instance serves every Whitted level's batch size
CHUNK_RAYS = 512 * PACKET


def _pad_rows(a, rows):
    R = a.shape[0]
    need = rows * LANES
    if need != R:
        a = jnp.concatenate([a, jnp.zeros((need - R,), a.dtype)])
    return a.reshape(rows, LANES)


def _dispatch(tabs: GroupedBVH, kernel, tiled, n_out, interpret, rows):
    row_spec = pl.BlockSpec((1, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tab_specs = [
        pl.BlockSpec(tabs.node_g.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(tabs.obj_g.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    fshape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(rows,),
        in_specs=tab_specs + [row_spec] * 8,
        out_specs=[row_spec] * n_out,
        out_shape=[fshape] * n_out,
        interpret=interpret,
    )(tabs.node_g, tabs.obj_g, *tiled)


def _run(tabs: GroupedBVH, kernel, rays, n_out, interpret):
    """Dispatch over the ray batch in CHUNK_RAYS chunks (one compiled
    Mosaic instance for any batch size; lax.map over excess chunks)."""
    R = rays[0].shape[0]
    if R <= CHUNK_RAYS:
        rows = max(-(-R // LANES), 1)
        tiled = [_pad_rows(x, rows) for x in rays]
        outs = _dispatch(tabs, kernel, tiled, n_out, interpret, rows)
    else:
        rows = CHUNK_RAYS // LANES
        pad = (-R) % CHUNK_RAYS
        nc = (R + pad) // CHUNK_RAYS
        tiled = [_pad_rows(x, nc * rows).reshape(nc, rows, LANES)
                 for x in rays]
        outs = jax.lax.map(
            lambda args: _dispatch(tabs, kernel, args, n_out, interpret,
                                   rows),
            tuple(tiled))
    flat = lambda a: a.reshape(-1)[:R]
    return [flat(a) for a in outs]


def make_grouped_intersectors(scene: SceneData, tabs: GroupedBVH,
                              motion_blur: bool = False,
                              interpret: bool = False,
                              shadow_mode: str = "bvh"):
    """Grouped-kernel Intersectors; drop-in for make_threaded_intersectors
    and make_pallas_bvh_intersectors."""
    from distributionraytracer_tpu.integrator.whitted import Intersectors
    from distributionraytracer_tpu.ops.intersect import HitResult

    _, _, obj_mats = scene.packed_objects()
    types_present = tuple(sorted(set(scene.static.obj_types)))

    closest_k = _make_grouped_kernel(types_present, motion_blur, False,
                                     tabs.n_nodes)
    shadow_k = _make_grouped_kernel(types_present, motion_blur, True,
                                    tabs.n_nodes, shadow_mode=shadow_mode)

    def closest(o, d, time, valid=None):
        R = o.shape[0]
        vd = (jnp.ones((R,), jnp.float32) if valid is None
              else valid.astype(jnp.float32))
        t, nx, ny, nz, oid = _run(
            tabs, closest_k,
            [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], time,
             vd], 5, interpret)
        gid = oid.astype(jnp.int32)
        hit = gid >= 0
        normal = jnp.stack([nx, ny, nz], axis=-1)
        mat = obj_mats[jnp.maximum(gid, 0)]
        return HitResult(hit=hit, t=jnp.where(hit, t, FLT_MAX),
                         normal=normal, obj_id=gid, mat_id=mat)

    def shadow(o, d, dist, exclude_obj, valid=None):
        del exclude_obj  # reference BVH shadow has no self-exclusion
        R = o.shape[0]
        vd = (jnp.ones((R,), jnp.float32) if valid is None
              else valid.astype(jnp.float32))
        (occ,) = _run(
            tabs, shadow_k,
            [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], dist,
             vd], 1, interpret)
        return occ > 0.0

    return Intersectors(closest, shadow)


def profile_closest(scene: SceneData, tabs: GroupedBVH, o, d, time,
                    motion_blur: bool = False, interpret: bool = False,
                    shadow_mode: str = "bvh"):
    """Instrumented closest-hit: per-128-ray-packet traversal counters
    (group-visit iterations, leaf object tests incl. inert padding)."""
    types_present = tuple(sorted(set(scene.static.obj_types)))
    k = _make_grouped_kernel(types_present, motion_blur, False,
                             tabs.n_nodes, shadow_mode=shadow_mode,
                             profile=True)
    R = o.shape[0]
    vd = jnp.ones((R,), jnp.float32)
    outs = _run(tabs, k,
                [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                 time, vd], 7, interpret)
    t, nx, ny, nz, oid, iters, lts = outs
    P = -(-R // PACKET)
    pad = (-R) % PACKET
    if pad:
        iters = jnp.concatenate([iters, jnp.zeros((pad,), iters.dtype)])
        lts = jnp.concatenate([lts, jnp.zeros((pad,), lts.dtype)])
    return {
        "t": t,
        "obj_id": oid.astype(jnp.int32),
        "iters": iters.reshape(P, PACKET)[:, 0],
        "leaf_tests": lts.reshape(P, PACKET)[:, 0],
    }
