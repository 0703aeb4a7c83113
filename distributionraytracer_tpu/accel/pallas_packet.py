"""Grouped Pallas packet traversal: 8 interleaved 128-ray walks per tile.

Second-generation packet kernel (successor of ``pallas_bvh.py``), designed
from tools/profile_packet.py measurements on the 100k-triangle dragon:

- A traversal step's cost is ~250 ns of *serialized latency* (dynamic
  fetch -> vote -> scalar -> next index), nearly independent of how much
  VPU work rides on it (measured: the same chain costs 241-305 ns whether
  it tests 1 node on a (8,128) tile or 8 nodes via any fetch strategy).
- Independent chains overlap: 2 interleaved walks run at 131 ns/step
  each, 4 at 99 ns/step (measured) — Mosaic pipelines separate
  fetch/vote chains.
- 1024-ray packets make incoherent rays walk near-whole-tree unions
  (35% of nodes per shuffled packet); 128-ray packets shrink the union
  roughly with packet size.

So this kernel restructures the round-3 design on all three axes:

1. **8 independent 128-ray walks per (8,128) tile** — sublane row ci is
   its own packet with its own scalar cursor; the 8 fetch/vote chains
   interleave and hide each other's latency.  The tile/batch interface
   (and the _run/_dispatch chunking) is unchanged from pallas_bvh.
2. **8 nodes per fetch**: the node table is packed so one lane column
   holds a *group* of 8 consecutive DFS nodes, each field an (8, 1)
   sublane vector after one aligned block load + one lane roll.  One
   (8,128) slab test covers 8 nodes x 128 rays at full VPU width with
   zero per-field scalar extracts.
3. **8 objects per fetch**: every collapsed leaf's objects live in
   dedicated 8-aligned object groups (inert type = -1 padding), tested
   8-at-a-time per column with zero scalar extracts — the round-3
   kernel extracted 16 scalars per object.
4. **Branchless steps**: any per-chain lax.cond / pl.when serializes
   the chains (measured 38 -> 208-251 ns/step — the branch drains the
   vector pipeline), so every step unconditionally processes one node
   group AND one leaf object column; a scalar state machine (pending-
   column counter + latched walk exit) drains multi-column leaf spans
   one column per step, and finished chains park on an all-pad group.

The walk is vectorized and exact: per group, ``next_r = vote_r ?
node_r + 1 : skip_r`` (in DFS pre-order a voted leaf's successor IS
node+1); because skip intervals are nested, node r is walk-visited iff
the exclusive prefix-max of ``next`` over [c_rel, r) does not jump past
it (log-step sublane rolls), and the group exit is max(next_r) over
visited rows.  Leaf columns drain in DFS object order against the live
best-t, so each column's per-lane vote gate equals the per-lane
traversal's own gate at that leaf's visit time — results match the XLA
threaded path exactly up to float-association (same winners/ties;
t and normals to float tolerance, tests/test_pallas_packet.py), and the
moving-sphere quirk and the grid emulation's quantized plane boxes are
preserved.

Reference semantics carried over (bvh.cpp:231-391 via accel/bvh.py):
entry-t slab with inside-AABB ``t := 0`` fix, closest-only ``entry_t <
best_t`` pruning, shadow any-hit ``t <= dist + EPSILON`` (BVH) or strict
``t < dist`` (grid emulation) with whole-packet early exit, shadow rays
at time = 0, no shadow self-exclusion.
"""

from __future__ import annotations

from typing import Optional

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
GROUP = 8  # nodes / objects per fetch (the sublane dimension)
CHAINS = 8  # independent 128-ray walks per (8,128) tile
TILE = CHAINS * LANES

NODE_FIELDS = 8  # bmin xyz, bmax xyz, skip, meta
OBJ_FIELDS = 14  # 12 packed params, type, global id
NODE_ROWS = NODE_FIELDS * GROUP  # 64
OBJ_ROWS = OBJ_FIELDS * GROUP  # 112

# leaf meta: meta = obj_group_first * 16 + n_groups (> 0 iff leaf).
# Exact in f32 while obj_group_first < 2^19.
MAX_LEAF_GROUPS = 9  # n_groups <= 8

# Leaf size the packet tree is collapsed to (objects; GROUPED_LEAF // 8
# object groups per leaf).  Coarser leaves halve the node count per
# doubling at the cost of extra column steps for multi-group leaves.
GROUPED_LEAF = 16
REL_SLOTS = 16  # og slots per node group the leaf metas can address

_IBIG = np.int32(0x3FFFFFFF)


@jax.tree_util.register_pytree_node_class
class GroupedBVH:
    """Device tables for the grouped kernel.

    ``node_g``: (64, Gn) f32 — lane column g holds nodes 8g..8g+7, row
    ``f * 8 + r`` = field f of node 8g+r.  Pad nodes carry impossible
    AABBs, ``skip = n_nodes`` and meta 0.  ``obj_g``: (112, Go) f32 —
    column og holds objects 8og..8og+7 in leaf-group order; inert padding
    slots carry type -1.  ``og_base``: (Gn+1,) i32 scalar-memory table of
    each node group's first leaf's object group (leaf metas store an og
    RELATIVE to it, so one int-sum reduce yields the whole group's voted
    leaf bitmask — one vector->scalar sync instead of three).
    ``n_nodes`` is *static* pytree aux data (the kernel's termination
    bound must be a Python int under jit).
    """

    __slots__ = ("node_g", "obj_g", "og_base", "n_nodes", "n_groups")

    def __init__(self, node_g, obj_g, og_base, n_nodes, n_groups):
        self.node_g = node_g
        self.obj_g = obj_g
        self.og_base = og_base
        self.n_nodes = n_nodes
        self.n_groups = n_groups  # total object groups (static aux)

    def tree_flatten(self):
        return ((self.node_g, self.obj_g, self.og_base),
                (self.n_nodes, self.n_groups))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0], aux[1])


def pack_grouped(scene: SceneData, tb: ThreadedBVH) -> Optional[GroupedBVH]:
    """Host-side repack of a leaf-collapsed ThreadedBVH into grouped
    tables.

    Object groups are assigned per *node group* so that each node group's
    leaf span (a) stays within one 128-lane block (one roll serves the
    whole span) and (b) addresses at most REL_SLOTS object groups (the
    leaf metas' relative-og encoding and the kernel's unrolled bit
    scans).  Returns None when a degenerate tree cannot satisfy (b) —
    callers fall back to the legacy kernel.
    """
    box = np.asarray(jax.device_get(tb.node_box), np.float32)  # (N,6)
    meta = np.asarray(jax.device_get(tb.node_meta), np.int64)  # (N,4)
    oorder = np.asarray(jax.device_get(tb.obj_order), np.int64)
    N = box.shape[0]
    skip, first, nobjs = meta[:, 0], meta[:, 1], meta[:, 2]
    if N and nobjs.max(initial=0) > GROUP * (REL_SLOTS // 2):
        # oversized leaves (SAH fallback) overflow the relative-og meta
        # encoding; callers fall back to the legacy kernel
        return None
    # a multi-group leaf holding a protected object (infinite plane —
    # its hit can escape the leaf box) would let a live best-t update
    # from an earlier column of the SAME leaf skip its later columns
    # (the per-column gate recomputes against the live best-t, unlike
    # the per-lane traversal's visit-time gate); bvh.protect_mask keeps
    # such objects in single-object leaves except under a degenerate
    # SAH fallback — refuse that case, legacy kernel handles it
    from distributionraytracer_tpu.accel.bvh import protect_mask as _pm
    prot = _pm(scene)
    if N and prot.any():
        leaf_ids0 = np.nonzero(nobjs > 0)[0]
        for li in leaf_ids0:
            span = oorder[first[li]:first[li] + nobjs[li]]
            if nobjs[li] > GROUP and prot[span].any():
                return None

    gn = -(-N // GROUP)

    # --- assign object groups, node group by node group ---
    og_of_node = np.zeros(N, np.int64)  # first object group per leaf
    ng_of_node = np.zeros(N, np.int64)
    rel_of_node = np.zeros(N, np.int64)  # og slot relative to group base
    og_base = np.zeros(gn + 1, np.int64)  # per node group
    next_og = 0
    for g in range(gn):
        nodes = np.arange(g * GROUP, min((g + 1) * GROUP, N))
        leaves = nodes[nobjs[nodes] > 0]
        og_base[g] = next_og
        for li in leaves:
            ng = max(1, -(-int(nobjs[li]) // GROUP))
            og_of_node[li] = next_og
            rel_of_node[li] = next_og - og_base[g]
            ng_of_node[li] = ng
            next_og += ng
        if next_og - og_base[g] > REL_SLOTS:
            return None
    total_groups = next_og
    if total_groups >= (1 << 19):
        return None

    # --- node table ---
    gn_pad = max(-(-(gn + 1) // LANES) * LANES, LANES)
    node_g = np.zeros((NODE_ROWS, gn_pad), np.float32)
    npad_items = gn_pad * GROUP

    def put(f, vals, pad):
        full = np.full((npad_items,), pad, np.float32)
        full[: vals.shape[0]] = vals
        node_g[f * GROUP:(f + 1) * GROUP] = full.reshape(gn_pad, GROUP).T

    for k in range(3):
        put(k, box[:, k], FLT_MAX)
        put(3 + k, box[:, 3 + k], -FLT_MAX)
    put(6, skip.astype(np.float32), float(N))
    # leaf meta: rel_og * 16 + ng (> 0 iff leaf; exact small ints in f32)
    leaf_meta = np.zeros(N, np.float32)
    lm = nobjs > 0
    leaf_meta[lm] = (rel_of_node[lm] * 16 + ng_of_node[lm]).astype(
        np.float32)
    put(7, leaf_meta, 0.0)

    # --- object table ---
    obj_data, obj_types, _ = packed_objects_np(scene)  # (O,12), (O,)
    O = oorder.shape[0]
    go_pad = max(-(-max(total_groups, 1) // LANES) * LANES, LANES)
    obj_g = np.zeros((OBJ_ROWS, go_pad), np.float32)
    obj_g[12 * GROUP:13 * GROUP] = -1.0  # inert type everywhere

    if O:
        # object k of obj_order belongs to leaf L with
        # first[L] <= k < first[L] + nobjs[L] (DFS-contiguous ranges)
        leaf_ids = np.nonzero(lm)[0]
        lf = first[leaf_ids]
        order_ids = np.argsort(lf)
        lf_sorted = lf[order_ids]
        ks = np.arange(O, dtype=np.int64)
        Lpos = np.searchsorted(lf_sorted, ks, side="right") - 1
        L = leaf_ids[order_ids[Lpos]]
        slot = og_of_node[L] * GROUP + (ks - first[L])
        col, row = slot // GROUP, slot % GROUP
        src = oorder
        for p in range(12):
            obj_g[p * GROUP + row, col] = obj_data[src, p]
        obj_g[12 * GROUP + row, col] = obj_types[src].astype(np.float32)
        obj_g[13 * GROUP + row, col] = src.astype(np.float32)

    return GroupedBVH(node_g=node_g, obj_g=obj_g,
                      og_base=og_base.astype(np.int32), n_nodes=int(N),
                      n_groups=int(total_groups))


def _prim_test_grouped(fld, o, d, inv, time, types_present, motion_blur):
    """8 objects (params as (8,1) sublane vectors from ``fld``) vs one
    128-ray packet broadcast to (8,128).  Returns (t, (nx,ny,nz)) of
    shape (8,128); inert slots (type -1) keep t = FLT_MAX."""
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
                         n_groups, shadow_mode="bvh", profile=False):
    gn = -(-max(n_nodes, 1) // GROUP)
    # sound per-chain step bound: one iteration per visited node group
    # PLUS one per drained leaf object-group column (a full walk voting
    # every leaf drains every object group once) — the previous 2*gn+64
    # under-counted columns ~8x and could exit mid-walk (ADVICE r4)
    max_iters = np.int32(gn + max(n_groups, 1) + 64)
    n_end = np.int32(max(n_nodes, 1))
    n_term = np.int32(gn * GROUP)  # all-pad group: parked chains no-op

    # BRANCHLESS design: any per-chain lax.cond / pl.when was measured to
    # serialize the 8 chains (38 ns -> 208-251 ns per step, the branch
    # flushes the vector pipeline), so every chain-step unconditionally
    # processes ONE node group AND ONE leaf object column, with a scalar
    # state machine (pending-columns counter + latched walk exit)
    # draining multi-column leaf spans one column per step.  State lives
    # in the OUTPUT REFS (row-sliced read-modify-writes); the while-loop
    # carry is pure scalars.  Draining in DFS column order makes the
    # best-t evolution *exactly* per-lane ordered: each column's gate is
    # recomputed from the current best-t, which at that moment equals
    # the per-lane traversal's best-t at that leaf's visit — exact even
    # for moving spheres.
    def kernel(node_ref, obj_ref, ob_ref, ox, oy, oz, dx, dy, dz, tm, vd,
               *outs):
        shape = (GROUP, LANES)
        o_t = (ox[:], oy[:], oz[:])
        d_t = (dx[:], dy[:], dz[:])
        inv_t = tuple(1.0 / dk for dk in d_t)
        time_t = (jnp.zeros(shape, jnp.float32) if is_shadow else tm[:])
        valid_t = vd[:] > 0.0
        sdist_t = tm[:]  # shadow distance rides the time slot
        idx8 = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0)
        zero8 = jnp.zeros(shape, jnp.float32)

        if is_shadow:
            occ_ref = outs[0]
            occ_ref[:] = zero8
        else:
            t_ref, nx_ref, ny_ref, nz_ref, oid_ref = outs[0:5]
            t_ref[:] = jnp.full(shape, FLT_MAX, jnp.float32)
            nx_ref[:] = zero8
            ny_ref[:] = zero8
            nz_ref[:] = zero8
            oid_ref[:] = jnp.full(shape, -1.0, jnp.float32)
        base = 1 if is_shadow else 5

        cur0 = [jnp.where(jnp.any(valid_t[ci:ci + 1, :]), 0,
                          jnp.int32(n_term)).astype(jnp.int32)
                for ci in range(CHAINS)]
        zi = jnp.int32(0)

        def chain_step(ci, st, lt):
            """One branchless step of chain ci: node group + one leaf
            column.  ``st`` = (cursor, pend_og, pend_n, latch)."""
            cur, pend_og, pend_n, latch = st
            g = cur // GROUP
            gbase = pl.multiple_of((g // LANES) * LANES, LANES)
            blk = node_ref[:, pl.ds(gbase, LANES)]
            col = pltpu.roll(blk, shift=LANES - (g % LANES), axis=1)
            fld = lambda f: col[f * GROUP:(f + 1) * GROUP, 0:1]
            lo = [fld(0), fld(1), fld(2)]
            hi = [fld(3), fld(4), fld(5)]
            metav = fld(7).astype(jnp.int32)

            o_row = tuple(o_t[k][ci:ci + 1, :] for k in range(3))
            inv_row = tuple(inv_t[k][ci:ci + 1, :] for k in range(3))

            # slab test: 8 nodes x 128 rays (boundingBox.cpp:64-124 with
            # the inside-AABB t := 0 fix, bvh.cpp:256-257)
            tmin = tmax = None
            inside = None
            for k in range(3):
                ta = (lo[k] - o_row[k]) * inv_row[k]
                tb = (hi[k] - o_row[k]) * inv_row[k]
                pos = inv_row[k] >= 0.0
                tn = jnp.where(pos, ta, tb)
                tf = jnp.where(pos, tb, ta)
                tmin = tn if tmin is None else jnp.maximum(tmin, tn)
                tmax = tf if tmax is None else jnp.minimum(tmax, tf)
                ins_k = (o_row[k] > lo[k]) & (o_row[k] < hi[k])
                inside = ins_k if inside is None else (inside & ins_k)
            ok = (tmin < tmax) & (tmax > 0.0)
            tent = jnp.where(tmin < 0.0, tmax, tmin)
            tent = jnp.where(inside, 0.0, tent)

            if is_shadow:
                live = (valid_t[ci:ci + 1, :]
                        & (occ_ref[ci:ci + 1, :] == 0.0))
                vote = live & ok  # no t-pruning (bvh.cpp:347-387)
            else:
                live = valid_t[ci:ci + 1, :]
                bt_row = t_ref[ci:ci + 1, :]
                vote = live & ok & (tent < bt_row)
            vote_any = jnp.any(vote, axis=1, keepdims=True)  # (8,1)
            skipv = fld(6).astype(jnp.int32)

            # exact cursor walk, fully VECTORIZED.  Per node: next_r =
            # vote_r ? node_r+1 : skip_r (a voted leaf's DFS successor
            # IS node+1).  Skip intervals are nested, so node r is
            # walk-visited iff r >= c_rel and the exclusive prefix-max
            # of next over [c_rel, r) does not jump past it; the group
            # exit is max(next_r) over visited rows.
            g8 = g * GROUP
            c_rel = cur - g8
            nxt = jnp.where(vote_any, g8 + idx8 + 1, skipv)  # (8,1)
            nm = jnp.where(idx8 >= c_rel, nxt, jnp.int32(-1))
            pm = jnp.where(idx8 >= 1, pltpu.roll(nm, shift=1, axis=0),
                           jnp.int32(-1))
            for sft in (1, 2, 4):
                sh = pltpu.roll(pm, shift=sft, axis=0)
                pm = jnp.maximum(pm, jnp.where(idx8 >= sft, sh,
                                               jnp.int32(-1)))
            visited = (idx8 >= c_rel) & (pm <= g8 + idx8)
            exit_v = jnp.max(jnp.where(visited, nxt, -1))
            exit_v = jnp.where(exit_v >= n_end, jnp.int32(n_term),
                               exit_v)

            # the SECOND (and last) vector->scalar sync: the voted-leaf
            # bitmask over og slots relative to the group's base (leaf
            # metas store rel_og * 16 + 1; distinct powers of two make
            # the int-ADD reduce an OR)
            voted_leaf = vote_any & (metav > 0)
            relv = metav // 16
            ngv = metav % 16
            # bits mark each voted leaf's FIRST and LAST og slot; slots
            # are disjoint across leaves, so the int-ADD reduce never
            # carries (a one-group leaf contributes its slot bit once)
            lmask = jnp.sum(jnp.where(
                voted_leaf & (ngv > 1),
                (jnp.int32(1) << relv)
                + (jnp.int32(1) << (relv + ngv - 1)),
                jnp.where(voted_leaf, jnp.int32(1) << relv, 0)))
            has_leaf = lmask > 0
            ob = ob_ref[g]
            lo_rel = zi
            hi_rel = zi
            for k in range(REL_SLOTS - 1, -1, -1):
                lo_rel = jnp.where(((lmask >> k) & 1) == 1, k, lo_rel)
            for k in range(REL_SLOTS):
                hi_rel = jnp.where(((lmask >> k) & 1) == 1, k, hi_rel)
            og_lo = ob + lo_rel
            span = hi_rel - lo_rel + 1

            # -------- one leaf column, unconditionally --------
            pending = pend_n > 0
            fresh = (~pending) & has_leaf
            col_og = jnp.where(pending, pend_og,
                               jnp.where(has_leaf, og_lo, 0))
            have_col = pending | has_leaf

            # per-lane gate: the owning leaf's vote row, recomputed with
            # the CURRENT best-t — per-lane exact (moving spheres,
            # quantized plane boxes); with one object group per leaf the
            # owner test is an equality
            in_rng = (voted_leaf & (ob + relv <= col_og)
                      & (ob + relv + ngv > col_og))
            gate = jnp.any(vote & in_rng, axis=0, keepdims=True)
            gate = gate & have_col

            obase = pl.multiple_of((col_og // LANES) * LANES, LANES)
            oblk = obj_ref[:, pl.ds(obase, LANES)]
            ocol = pltpu.roll(oblk, shift=LANES - (col_og % LANES),
                              axis=1)
            fldo = lambda f: ocol[f * GROUP:(f + 1) * GROUP, 0:1]
            o_b = tuple(jnp.broadcast_to(o_row[k], shape)
                        for k in range(3))
            d_b = tuple(jnp.broadcast_to(d_t[k][ci:ci + 1, :], shape)
                        for k in range(3))
            inv_b = tuple(jnp.broadcast_to(inv_row[k], shape)
                          for k in range(3))
            time_b = jnp.broadcast_to(time_t[ci:ci + 1, :], shape)
            t_c, n_c = _prim_test_grouped(fldo, o_b, d_b, inv_b, time_b,
                                          types_present, motion_blur)
            if is_shadow:
                sd = sdist_t[ci:ci + 1, :]
                hit_now = ((t_c < sd) if shadow_mode == "grid"
                           else (t_c <= sd + EPSILON))
                anyh = jnp.any(hit_now, axis=0, keepdims=True)
                occ_ref[ci:ci + 1, :] = jnp.where(
                    gate & anyh, 1.0, occ_ref[ci:ci + 1, :])
            else:
                # per-ray winner among the 8 objects; lowest row (= DFS
                # object order) wins exact ties
                tmin_c = jnp.min(t_c, axis=0, keepdims=True)
                first_r = jnp.min(
                    jnp.where(t_c == tmin_c, idx8, GROUP),
                    axis=0, keepdims=True)
                onehot = idx8 == first_r  # (8,128)
                # one-hot row select via MAX (Mosaic rejects float ADD
                # sublane reductions on offset layouts)
                pick = lambda a: jnp.max(
                    jnp.where(onehot, a, -FLT_MAX), axis=0,
                    keepdims=True)
                gidv = ocol[13 * GROUP:14 * GROUP, 0:1]
                better = gate & (tmin_c < t_ref[ci:ci + 1, :])
                t_ref[ci:ci + 1, :] = jnp.where(
                    better, tmin_c, t_ref[ci:ci + 1, :])
                nx_ref[ci:ci + 1, :] = jnp.where(
                    better, pick(n_c[0]), nx_ref[ci:ci + 1, :])
                ny_ref[ci:ci + 1, :] = jnp.where(
                    better, pick(n_c[1]), ny_ref[ci:ci + 1, :])
                nz_ref[ci:ci + 1, :] = jnp.where(
                    better, pick(n_c[2]), nz_ref[ci:ci + 1, :])
                oid_ref[ci:ci + 1, :] = jnp.where(
                    better, pick(jnp.broadcast_to(gidv, shape)),
                    oid_ref[ci:ci + 1, :])

            # -------- scalar state advance --------
            n_after = jnp.where(pending, pend_n - 1,
                                jnp.where(fresh, span - 1, zi))
            og_after = col_og + 1
            latch2 = jnp.where(pending, latch, exit_v)
            new_cur = jnp.where(n_after > 0, cur, latch2)
            lt2 = lt + jnp.where(have_col, GROUP, 0)
            return (new_cur, og_after, n_after, latch2), lt2

        def cond(s):
            it = s[0]
            active = s[2] < n_end
            for ci in range(1, CHAINS):
                active = active | (s[2 + 4 * ci] < n_end)
            return active & (it < max_iters)

        def body(s):
            it, lt = s[0], s[1]
            sts = [tuple(s[2 + 4 * ci:2 + 4 * (ci + 1)])
                   for ci in range(CHAINS)]
            new = []
            for ci in range(CHAINS):
                st2, lt = chain_step(ci, sts[ci], lt)
                new.extend(st2)
            if is_shadow:
                done = ~jnp.any(valid_t & (occ_ref[:] == 0.0))
                for ci in range(CHAINS):
                    new[4 * ci] = jnp.where(done, jnp.int32(n_term),
                                            new[4 * ci])
                    new[4 * ci + 2] = jnp.where(done, zi,
                                                new[4 * ci + 2])
            return (it + 1, lt) + tuple(new)

        state = (jnp.int32(0), jnp.int32(0))
        for ci in range(CHAINS):
            state = state + (cur0[ci], zi, zi, jnp.int32(n_term))
        out = jax.lax.while_loop(cond, body, state)
        if profile:
            bc = lambda v: zero8 + v.astype(jnp.float32)
            outs[base][:] = bc(out[0])
            outs[base + 1][:] = bc(out[1])

    return kernel


# rays per device dispatch (see pallas_bvh.CHUNK_RAYS): one Mosaic kernel
# instance serves every Whitted level's batch size
CHUNK_RAYS = 64 * TILE


def _pad_tiles(a, rows):
    R = a.shape[0]
    need = rows * LANES
    if need != R:
        a = jnp.concatenate([a, jnp.zeros((need - R,), a.dtype)])
    return a.reshape(rows, LANES)


def _tile_rows(R):
    rows = max(-(-R // LANES), 1)
    return -(-rows // CHAINS) * CHAINS


def _dispatch(tabs: GroupedBVH, kernel, tiled, n_out, interpret, rows):
    tile_spec = pl.BlockSpec((CHAINS, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    tab_specs = [
        pl.BlockSpec(tabs.node_g.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(tabs.obj_g.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    fshape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(rows // CHAINS,),
        in_specs=tab_specs + [tile_spec] * 8,
        out_specs=[tile_spec] * n_out,
        out_shape=[fshape] * n_out,
        interpret=interpret,
    )(tabs.node_g, tabs.obj_g, tabs.og_base, *tiled)


def _run(tabs: GroupedBVH, kernel, rays, n_out, interpret):
    R = rays[0].shape[0]
    if R <= CHUNK_RAYS:
        rows = _tile_rows(R)
        tiled = [_pad_tiles(x, rows) for x in rays]
        outs = _dispatch(tabs, kernel, tiled, n_out, interpret, rows)
    else:
        rows = CHUNK_RAYS // LANES
        pad = (-R) % CHUNK_RAYS
        nc = (R + pad) // CHUNK_RAYS
        tiled = [_pad_tiles(x, nc * rows).reshape(nc, rows, LANES)
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
    """Grouped-kernel Intersectors; drop-in for
    make_pallas_bvh_intersectors / make_threaded_intersectors."""
    from distributionraytracer_tpu.integrator.whitted import Intersectors
    from distributionraytracer_tpu.ops.intersect import HitResult

    _, _, obj_mats = scene.packed_objects()
    types_present = tuple(sorted(set(scene.static.obj_types)))

    closest_k = _make_grouped_kernel(types_present, motion_blur, False,
                                     tabs.n_nodes, tabs.n_groups)
    shadow_k = _make_grouped_kernel(types_present, motion_blur, True,
                                    tabs.n_nodes, tabs.n_groups,
                                    shadow_mode=shadow_mode)

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
    """Instrumented closest-hit: per-tile counters — while-loop
    iterations (each fetches CHAINS node groups) and leaf object tests
    (incl. inert padding)."""
    types_present = tuple(sorted(set(scene.static.obj_types)))
    k = _make_grouped_kernel(types_present, motion_blur, False,
                             tabs.n_nodes, tabs.n_groups,
                             shadow_mode=shadow_mode, profile=True)
    R = o.shape[0]
    vd = jnp.ones((R,), jnp.float32)
    outs = _run(tabs, k,
                [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                 time, vd], 7, interpret)
    t, nx, ny, nz, oid, iters, lts = outs
    P = -(-R // TILE)
    pad = (-R) % TILE
    if pad:
        iters = jnp.concatenate([iters, jnp.zeros((pad,), iters.dtype)])
        lts = jnp.concatenate([lts, jnp.zeros((pad,), lts.dtype)])
    return {
        "t": t,
        "obj_id": oid.astype(jnp.int32),
        "iters": iters.reshape(P, TILE)[:, 0],
        "leaf_tests": lts.reshape(P, TILE)[:, 0],
    }
