"""Pallas TPU packet-traversal kernel over the threaded (skip-link) BVH.

Why a kernel: the pure-XLA batched traversal (``accel/bvh.py``,
``make_threaded_intersectors``) is correct but gather-bound — XLA lowers the
per-lane node/object gathers inside the batched ``lax.while_loop`` to code
whose cost grows super-linearly with the lane count (measured: 16k lanes →
0.35 Mrays/s on the 100k-triangle dragon; see ``config.py``).  This kernel
removes per-lane gathers entirely by inverting the parallelism:

- **One scalar node cursor per ray packet** (an (8, 128) = 1024-ray tile).
  The threaded BVH visits nodes in strictly increasing DFS pre-order
  (child = ``node + 1``, ``skip[node] > node``), so the packet walks the
  node table front to back, fetching each node exactly once with a *scalar*
  dynamic-slice — no gathers.
- **Vectorized tests**: the node AABB slab test and every leaf-object
  primitive test run on the whole tile in VPU registers.  A node is visited
  iff *any* live lane wants it (``ok & entry_t < best_t``); since a lane's
  eligibility is monotone down the tree (child AABB ⊆ parent, entry_t
  non-decreasing), the packet visits exactly the union of the per-lane
  visit sets, and testing a subtree on an ineligible lane cannot change its
  strict-``<`` winner (every t in the subtree ≥ entry_t ≥ best_t).  Results
  are therefore **identical** to the XLA threaded path (same tables, same
  DFS object order, same tie-breaks) — ``tests/test_pallas_accel.py`` locks
  this.

Table layout (``pack_threaded``): node and object tables are transposed so
the node/object id runs along the 128-wide *lane* dimension.  A fetch is
one aligned (rows, 128) block load at ``(id // 128) * 128`` (provably
128-aligned via ``pl.multiple_of``), one dynamic lane roll
(``pltpu.roll``), and static scalar extracts from lane 0 — the only three
dynamic-indexing primitives Mosaic supports unconditionally.  Integer
fields (skip link, leaf meta) are stored as exact f32 *values* (all
< 2^24), never bitcasts (small-int bit patterns are f32 denormals, which
the TPU flushes to zero).

Reference semantics carried over from accel/bvh.py (bvh.cpp:231-391):
t-pruning ``entry_t < best_t`` (closest only), inside-AABB ``t := 0`` fix,
shadow any-hit ``t <= dist + EPSILON`` with per-lane early stop, no
self-exclusion for shadows.
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
from distributionraytracer_tpu.ops.common import EPSILON, FLT_MAX
from distributionraytracer_tpu.scene.types import (
    OBJ_BOX, OBJ_PLANE, OBJ_SPHERE, OBJ_TRIANGLE, SceneData,
)

LANES = 128
SUBLANES = 8
TILE = SUBLANES * LANES  # rays per packet

# node meta packing: meta = first * MAX_LEAF + nobj (exact in f32 while
# first * MAX_LEAF + nobj < 2^24)
MAX_LEAF = 128

# Leaf size the packet tables are collapsed to (bvh.collapse_leaves).  The
# kernel pays a scalar fetch per visited NODE but tests leaf objects with
# full-tile VPU ops, so coarse leaves win until the extra primitive tests
# outweigh the saved fetches (tuned on the 100k-tri dragon, see PARITY.md).
PACKET_LEAF = 16


class PallasBVH(NamedTuple):
    """Device tables for the packet kernel (pytree of two arrays).

    ``node_tab``: (8, Npad) f32 — rows [bmin.xyz, bmax.xyz, skip,
    first*128+nobj]; ``obj_tab``: (16, Opad) f32 — rows [12 packed params
    (ops.intersect layout), type, global id, 2 spare].  Padding nodes carry
    an impossible AABB and ``skip = Npad`` so a cursor entering the pad
    region exits in one step; the DFS sentinel ``N`` lands there.
    """

    node_tab: jnp.ndarray
    obj_tab: jnp.ndarray


def packed_objects_np(scene: SceneData):
    """Numpy twin of ``SceneData.packed_objects`` for host-side packing.

    The jnp version traces fine under jit but runs *eagerly* when called
    host-side — on the remote-TPU platform every eager scatter is a network
    roundtrip, so table packing must stay in numpy.
    """
    st = scene.static
    g = lambda a: np.asarray(jax.device_get(a))
    O = st.n_objects
    data = np.zeros((max(O, 1), 12), np.float32)
    mats = np.zeros((max(O, 1),), np.int32)
    types = (np.array(st.obj_types, np.int32) if O
             else np.zeros((1,), np.int32))
    obj_types = np.array(st.obj_types, np.int64)
    obj_tidx = np.array(st.obj_tidx, np.int64)

    for t, cols, mat in (
            (OBJ_SPHERE,
             lambda s: np.concatenate(
                 [g(scene.sph_center)[s], g(scene.sph_radius)[s][:, None]],
                 axis=1), lambda s: g(scene.sph_mat)[s]),
            (OBJ_TRIANGLE,
             lambda s: np.concatenate(
                 [g(scene.tri_v0)[s], g(scene.tri_e1)[s],
                  g(scene.tri_e2)[s]], axis=1),
             lambda s: g(scene.tri_mat)[s]),
            (OBJ_PLANE,
             lambda s: np.concatenate(
                 [g(scene.pln_n)[s], g(scene.pln_d)[s][:, None]], axis=1),
             lambda s: g(scene.pln_mat)[s]),
            (OBJ_BOX,
             lambda s: np.concatenate(
                 [g(scene.box_min)[s], g(scene.box_max)[s]], axis=1),
             lambda s: g(scene.box_mat)[s])):
        ids = np.nonzero(obj_types == t)[0]
        if len(ids):
            sub = obj_tidx[ids]
            row = cols(sub).astype(np.float32)
            data[ids, :row.shape[1]] = row
            mats[ids] = mat(sub)
    return data, types, mats


def pack_threaded(scene: SceneData, tb: ThreadedBVH) -> Optional[PallasBVH]:
    """Host-side repack of ThreadedBVH into kernel tables (numpy).

    Returns None when the tree cannot be encoded exactly (first-object
    offset ≥ 2^24/128 or a degenerate fallback leaf with ≥ 128 objects) —
    callers fall back to the XLA threaded path.
    """
    box = np.asarray(jax.device_get(tb.node_box), np.float32)  # (N,6)
    meta = np.asarray(jax.device_get(tb.node_meta), np.int64)  # (N,4)
    oorder = np.asarray(jax.device_get(tb.obj_order), np.int64)
    N = box.shape[0]
    skip, first, nobjs = meta[:, 0], meta[:, 1], meta[:, 2]
    if nobjs.max(initial=0) >= MAX_LEAF:
        return None
    if (first.max(initial=0) * MAX_LEAF + MAX_LEAF) >= (1 << 24):
        return None
    if N + 1 >= (1 << 24):
        return None

    npad = -((N + 1) // -LANES) * LANES
    node = np.zeros((8, npad), np.float32)
    node[0:3, :N] = box[:, 0:3].T
    node[3:6, :N] = box[:, 3:6].T
    node[6, :N] = skip.astype(np.float32)
    node[7, :N] = (first * MAX_LEAF + nobjs).astype(np.float32)
    # pad nodes (incl. the sentinel N): impossible box, skip straight out
    node[0:3, N:] = np.float32(FLT_MAX)
    node[3:6, N:] = np.float32(-FLT_MAX)
    node[6, N:] = np.float32(npad)
    node[7, N:] = 0.0

    obj_data, obj_types, _ = packed_objects_np(scene)  # (O,12)
    O = oorder.shape[0]
    opad = max(-(O // -LANES) * LANES, LANES)
    obj = np.zeros((16, opad), np.float32)
    obj[0:12, :O] = obj_data[oorder].T
    obj[12, :O] = obj_types[oorder].astype(np.float32)
    obj[13, :O] = oorder.astype(np.float32)
    return PallasBVH(node_tab=node, obj_tab=obj)


def _fetch(tab_ref, idx, rows):
    """Fetch column ``idx`` of a (rows, Npad) table as ``rows`` scalars."""
    base = pl.multiple_of((idx // LANES) * LANES, LANES)
    blk = tab_ref[:, pl.ds(base, LANES)]  # (rows, 128)
    rolled = pltpu.roll(blk, shift=LANES - (idx % LANES), axis=1)
    return [rolled[r, 0] for r in range(rows)]


def _bcast(s):
    return jnp.full((SUBLANES, LANES), s, jnp.float32)


def _prim_test(params, typ, o, d, inv, time, types_present, motion_blur):
    """One object (scalar params) vs the ray tile; (t, n3) like hit_packed.

    ``params``: 12 scalars in ops.intersect packed layout; ``typ`` scalar.
    Computes each present type's formula on the VPU and selects by the
    scalar tag (cheap: the tag select is one where per output).
    """
    cand = {}
    if OBJ_SPHERE in types_present:
        cx, cy, cz = _bcast(params[0]), _bcast(params[1]), _bcast(params[2])
        if motion_blur:
            cy = cy + time
        r = params[3]
        ocx, ocy, ocz = o[0] - cx, o[1] - cy, o[2] - cz
        a = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        b = 2.0 * (ocx * d[0] + ocy * d[1] + ocz * d[2])
        cq = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - 4.0 * a * cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b - sq) / (2.0 * a)
        t2 = (-b + sq) / (2.0 * a)
        t = jnp.where(t1 > EPSILON, t1, t2)
        ok = (disc >= 0.0) & (t > EPSILON)
        px = o[0] + d[0] * t - cx
        py = o[1] + d[1] * t - cy
        pz = o[2] + d[2] * t - cz
        ninv = jax.lax.rsqrt(jnp.maximum(px * px + py * py + pz * pz, 1e-30))
        cand[OBJ_SPHERE] = (jnp.where(ok, t, FLT_MAX),
                            (px * ninv, py * ninv, pz * ninv))
    if OBJ_TRIANGLE in types_present:
        v0 = params[0:3]
        e1 = params[3:6]
        e2 = params[6:9]
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
        t = f * (e2[0] * qx + e2[1] * qy + e2[2] * qz)
        ok = ((u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t > EPSILON))
        # geometric normal is constant per triangle: scalar math
        nx = e1[1] * e2[2] - e1[2] * e2[1]
        ny = e1[2] * e2[0] - e1[0] * e2[2]
        nz = e1[0] * e2[1] - e1[1] * e2[0]
        nn = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
        cand[OBJ_TRIANGLE] = (jnp.where(ok, t, FLT_MAX),
                              (_bcast(nx * nn), _bcast(ny * nn),
                               _bcast(nz * nn)))
    if OBJ_PLANE in types_present:
        pn = params[0:3]
        pd = params[3]
        denom = d[0] * pn[0] + d[1] * pn[1] + d[2] * pn[2]
        t = -(o[0] * pn[0] + o[1] * pn[1] + o[2] * pn[2] + pd) / denom
        ok = (jnp.abs(denom) >= EPSILON) & (t > 0.0)
        cand[OBJ_PLANE] = (jnp.where(ok, t, FLT_MAX),
                           (_bcast(pn[0]), _bcast(pn[1]), _bcast(pn[2])))
    if OBJ_BOX in types_present:
        bmin = params[0:3]
        bmax = params[3:6]
        tmin = tmax = None
        for k in range(3):
            ta = (bmin[k] - o[k]) * inv[k]
            tb = (bmax[k] - o[k]) * inv[k]
            lo = jnp.minimum(ta, tb)
            hi = jnp.maximum(ta, tb)
            tmin = lo if tmin is None else jnp.maximum(tmin, lo)
            tmax = hi if tmax is None else jnp.minimum(tmax, hi)
        ok = (tmin <= tmax) & (tmin > EPSILON)
        t = jnp.where(ok, tmin, FLT_MAX)
        # face normal: EPSILON compare, first match wins (scene.cpp:262-274)
        p = [o[k] + d[k] * tmin for k in range(3)]
        n = [jnp.zeros((SUBLANES, LANES), jnp.float32) for _ in range(3)]
        taken = jnp.zeros((SUBLANES, LANES), jnp.bool_)
        for axis, bound, sign in ((0, bmin, -1.0), (0, bmax, 1.0),
                                  (1, bmin, -1.0), (1, bmax, 1.0),
                                  (2, bmin, -1.0), (2, bmax, 1.0)):
            c = jnp.abs(p[axis] - bound[axis]) < EPSILON
            use = c & ~taken
            n[axis] = jnp.where(use, sign, n[axis])
            taken = taken | c
        cand[OBJ_BOX] = (t, tuple(n))

    tags = [k for k in (OBJ_SPHERE, OBJ_TRIANGLE, OBJ_PLANE, OBJ_BOX)
            if k in cand]
    if len(tags) == 1:
        return cand[tags[0]]
    t, n = cand[tags[-1]]
    for k in tags[-2::-1]:
        sel = typ == k
        tk, nk = cand[k]
        t = jnp.where(sel, tk, t)
        n = tuple(jnp.where(sel, a, b) for a, b in zip(nk, n))
    return t, n


def _make_kernel(types_present, motion_blur, is_shadow, npad, n_obj_pad,
                 shadow_mode="bvh", profile=False):
    # shadow occluder comparison: BVH any-hit uses t <= dist + EPSILON
    # (bvh.cpp:376); the grid emulation needs the grid's strict t < dist
    # (grid.cpp:330-352)
    #
    # ``profile=True`` appends two extra outputs — per-packet node-visit
    # iterations and leaf object tests — the per-stage counters behind
    # bench.py's packet-kernel profile rows (VERDICT r3 "missing" #3).
    max_iters = np.int32(npad + n_obj_pad + 64)

    def kernel(node_ref, obj_ref, ox, oy, oz, dx, dy, dz, tm, vd, *outs):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        inv = tuple(1.0 / dk for dk in d)
        # shadow calls pass the occlusion distance through the tm slot;
        # shadow rays trace at time = 0 (Ray ctor default, ray.h:6-15)
        time = jnp.zeros_like(tm[:]) if is_shadow else tm[:]
        valid = vd[:] > 0.0

        # occlusion mask carried as f32 0/1 — Mosaic cannot yield i1
        # vectors from while/fori loops
        best_t = jnp.full((SUBLANES, LANES), FLT_MAX, jnp.float32)
        zero = jnp.zeros((SUBLANES, LANES), jnp.float32)
        node0 = jnp.where(jnp.any(valid), 0, npad).astype(jnp.int32)

        def leaf_objects(first, nobj, carry_in, live):
            def obj_body(k, carry):
                if is_shadow:
                    bt, occf = carry
                else:
                    bt, bnx, bny, bnz, boid = carry
                vals = _fetch(obj_ref, first + k, 16)
                t, n3 = _prim_test(vals[0:12], vals[12], o, d, inv, time,
                                   types_present, motion_blur)
                if is_shadow:
                    # `bt` carries the shadow distance per lane
                    occ_now = (t < bt) if shadow_mode == "grid" else (
                        t <= bt + EPSILON)
                    occf = jnp.where(live & occ_now, 1.0, occf)
                    return bt, occf
                better = live & (t < bt)
                gid = vals[13]
                return (jnp.where(better, t, bt),
                        jnp.where(better, n3[0], bnx),
                        jnp.where(better, n3[1], bny),
                        jnp.where(better, n3[2], bnz),
                        jnp.where(better, _bcast(gid), boid))
            return jax.lax.fori_loop(0, nobj, obj_body, carry_in)

        def cond(s):
            return (s[0] < npad) & (s[1] < max_iters)

        def body(s):
            if is_shadow:
                node, it, lt, sdist, occf = s
                live = valid & (occf == 0.0)
            else:
                node, it, lt, bt, bnx, bny, bnz, boid = s
                live = valid
            vals = _fetch(node_ref, node, 8)
            lo = vals[0:3]
            hi = vals[3:6]
            skip = vals[6].astype(jnp.int32)
            meta = vals[7].astype(jnp.int32)
            first = meta // MAX_LEAF
            nobj = meta % MAX_LEAF

            # slab test, entry-t semantics (boundingBox.cpp:64-124) with the
            # inside-AABB t := 0 fix (bvh.cpp:256-257)
            tmin = tmax = None
            inside = None
            for k in range(3):
                lok, hik = _bcast(lo[k]), _bcast(hi[k])
                ta = (lok - o[k]) * inv[k]
                tb = (hik - o[k]) * inv[k]
                pos = inv[k] >= 0.0
                tn = jnp.where(pos, ta, tb)
                tf = jnp.where(pos, tb, ta)
                tmin = tn if tmin is None else jnp.maximum(tmin, tn)
                tmax = tf if tmax is None else jnp.minimum(tmax, tf)
                ins_k = (o[k] > lok) & (o[k] < hik)
                inside = ins_k if inside is None else (inside & ins_k)
            ok = (tmin < tmax) & (tmax > 0.0)
            tent = jnp.where(tmin < 0.0, tmax, tmin)
            tent = jnp.where(inside, zero, tent)

            if is_shadow:
                vote = live & ok  # no t-pruning (bvh.cpp:347-387)
            else:
                vote = live & ok & (tent < bt)
            anyv = jnp.any(vote)
            is_leaf = nobj > 0

            # leaf updates are gated by each lane's own *vote*, not mere
            # liveness: a lane whose per-lane traversal would have pruned
            # this node must not accept hits from it.  With static geometry
            # the gate is redundant (every t in the subtree >= entry_t >=
            # best_t), but moving spheres can escape their static AABBs
            # (reference quirk, scene.cpp:158-162 + static GetBoundingBox),
            # and there the gate is what keeps packet == per-lane exact.
            lt2 = lt + jnp.where(anyv & is_leaf, nobj, 0)
            if is_shadow:
                sdist2, occf2 = jax.lax.cond(
                    anyv & is_leaf,
                    lambda c: leaf_objects(first, nobj, c, vote),
                    lambda c: c, (sdist, occf))
                nxt = jnp.where(anyv & ~is_leaf, node + 1, skip)
                nxt = jnp.where(jnp.any(valid & (occf2 == 0.0)), nxt,
                                jnp.int32(npad))
                return (nxt, it + 1, lt2, sdist2, occf2)
            bt2, bnx2, bny2, bnz2, boid2 = jax.lax.cond(
                anyv & is_leaf,
                lambda c: leaf_objects(first, nobj, c, vote),
                lambda c: c, (bt, bnx, bny, bnz, boid))
            nxt = jnp.where(anyv & ~is_leaf, node + 1, skip)
            return (nxt, it + 1, lt2, bt2, bnx2, bny2, bnz2, boid2)

        if is_shadow:
            sdist = tm[:]  # shadow calls pass dist through the time slot
            state = (node0, jnp.int32(0), jnp.int32(0), sdist,
                     jnp.zeros((SUBLANES, LANES), jnp.float32))
            out = jax.lax.while_loop(cond, body, state)
            outs[0][:] = out[3 + 1]
            base = 1
        else:
            state = (node0, jnp.int32(0), jnp.int32(0), best_t, zero, zero,
                     zero, jnp.full((SUBLANES, LANES), -1.0, jnp.float32))
            out = jax.lax.while_loop(cond, body, state)
            outs[0][:] = out[3]
            outs[1][:] = out[4]
            outs[2][:] = out[5]
            outs[3][:] = out[6]
            outs[4][:] = out[7]
            base = 5
        if profile:
            outs[base][:] = _bcast(out[1].astype(jnp.float32))
            outs[base + 1][:] = _bcast(out[2].astype(jnp.float32))

    return kernel


# Measured dead end (kept as a note, code removed): a per-sublane-row
# variant gave each (1, 128) row its own node cursor to overlap the 8
# scalar fetch->test->advance chains and shrink per-walk unions.  On the
# 100k-tri dragon it lost both ways — coherent primaries 65 -> 120 ms
# (leaf tests run per row instead of per packet), shuffled rays
# 1252 -> 1560 ms (no measurable latency overlap from Mosaic) — so the
# single-cursor packet walk above stays.


def _pad_tiles(a, rows):
    R = a.shape[0]
    need = rows * LANES
    if need != R:
        a = jnp.concatenate([a, jnp.zeros((need - R,), a.dtype)])
    return a.reshape(rows, LANES)


def _tile_grid(R):
    rows = max(-(-R // LANES), 1)
    rows = -(-rows // SUBLANES) * SUBLANES
    return rows, rows // SUBLANES


# rays per device dispatch: every pallas_call in a program shares this
# batch shape, so the Whitted tree's growing level batches (R, 2R ... 16R)
# lower to ONE Mosaic kernel instance per (kernel, table-shape) instead of
# one per level — the dominant share of the 3-minute first-render compiles
# (VERDICT r2 item 3).  64 packets amortize dispatch fine.
CHUNK_RAYS = 64 * TILE


def _dispatch(tabs: PallasBVH, kernel, tiled, n_out, interpret, rows):
    tile_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    tab_specs = [
        pl.BlockSpec(tabs.node_tab.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(tabs.obj_tab.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    fshape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(rows // SUBLANES,),
        in_specs=tab_specs + [tile_spec] * 8,
        out_specs=[tile_spec] * n_out,
        out_shape=[fshape] * n_out,
        interpret=interpret,
    )(tabs.node_tab, tabs.obj_tab, *tiled)


def _run(tabs: PallasBVH, kernel, rays, n_out, interpret):
    """Dispatch a packet kernel over the ray batch in CHUNK_RAYS chunks."""
    R = rays[0].shape[0]
    if R <= CHUNK_RAYS:
        rows, _ = _tile_grid(R)
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


def profile_closest(scene: SceneData, tabs: PallasBVH, o, d, time,
                    motion_blur: bool = False, interpret: bool = False,
                    shadow_mode: str = "bvh"):
    """Instrumented closest-hit: returns per-packet traversal counters.

    Output: dict with ``t`` (R,), ``iters`` (P,) node-visit loop iterations
    per packet, ``leaf_tests`` (P,) leaf object tests per packet, where P =
    number of (8, 128) ray packets.  The per-stage evidence BASELINE.md:26
    asks for — where a packet's walk actually spends its visits.
    """
    types_present = tuple(sorted(set(scene.static.obj_types)))
    npad = tabs.node_tab.shape[1]
    opad = tabs.obj_tab.shape[1]
    k = _make_kernel(types_present, motion_blur, False, npad, opad,
                     shadow_mode=shadow_mode, profile=True)
    R = o.shape[0]
    vd = jnp.ones((R,), jnp.float32)
    outs = _run(tabs, k,
                [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                 time, vd], 7, interpret)
    # _run flattens each (rows, LANES) output to (R,); packet p's counter
    # is broadcast over its TILE lanes, so stride-sample lane 0 of each
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


def make_pallas_bvh_intersectors(scene: SceneData, tabs: PallasBVH,
                                 motion_blur: bool = False,
                                 interpret: bool = False,
                                 shadow_mode: str = "bvh"):
    """Packet-kernel Intersectors; drop-in for make_threaded_intersectors.

    ``tabs`` comes from ``pack_threaded`` (host-side, once per scene) and
    crosses the jit boundary as a pytree argument.
    """
    from distributionraytracer_tpu.integrator.whitted import Intersectors
    from distributionraytracer_tpu.ops.intersect import HitResult

    _, _, obj_mats = scene.packed_objects()
    types_present = tuple(sorted(set(scene.static.obj_types)))
    npad = tabs.node_tab.shape[1]
    opad = tabs.obj_tab.shape[1]

    closest_k = _make_kernel(types_present, motion_blur, False, npad, opad)
    shadow_k = _make_kernel(types_present, motion_blur, True, npad, opad,
                            shadow_mode=shadow_mode)

    def closest(o, d, time, valid=None):
        R = o.shape[0]
        vd = (jnp.ones((R,), jnp.float32) if valid is None
              else valid.astype(jnp.float32))
        t, nx, ny, nz, oid = _run(
            tabs, closest_k,
            [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], time, vd],
            5, interpret)
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
            [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], dist, vd],
            1, interpret)
        return occ > 0.0

    return Intersectors(closest, shadow)
