"""Flattened SAH BVH as int32/float32 node tables.

Build (host, NumPy) mirrors ``BVH::build_recursive`` (bvh.cpp:62-227):
12-bucket SAH over all three axes with per-axis centroid sort, leaf
threshold 2, fallback-to-leaf when the split is invalid or the best cost is
not below ``n``.  Children are appended contiguously so ``right = left + 1``
(bvh.cpp:206-222) — the flat array layout ports directly to a TPU-resident
node table.

Traversal (bvh.cpp:231-391) becomes a scalar ``lax.while_loop`` with a fixed
int32 stack, ``vmap``-ed over rays: near-child-first ordering, the
inside-AABB ``t := 0`` fix (bvh.cpp:256-257), and stack pops pruned by
``stack.t < hitRec.t`` (bvh.cpp:300-308).  The shadow variant any-hits with
``t <= dist + EPSILON`` (bvh.cpp:376).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from distributionraytracer_tpu.accel.grid import object_bboxes
from distributionraytracer_tpu.ops.common import EPSILON, FLT_MAX
from distributionraytracer_tpu.ops.intersect import hit_packed
from distributionraytracer_tpu.scene.types import SceneData

STACK_SIZE = 64
LEAF_THRESHOLD = 2
BUCKETS = 12


class BVHArrays(NamedTuple):
    node_min: jnp.ndarray  # (N,3)
    node_max: jnp.ndarray  # (N,3)
    node_leaf: jnp.ndarray  # (N,) bool
    node_index: jnp.ndarray  # (N,) i32: left child, or first-object offset
    node_nobjs: jnp.ndarray  # (N,) i32
    obj_order: jnp.ndarray  # (O,) i32: leaf ranges index this permutation


def _area(lo, hi):
    e = hi - lo
    return 2.0 * (e[0] * e[1] + e[0] * e[2] + e[1] * e[2])


def build_bvh(scene: SceneData, use_native: bool = True) -> BVHArrays:
    st = scene.static
    bb32 = object_bboxes(scene)
    if use_native:
        from distributionraytracer_tpu import native
        res = native.build_bvh_native(bb32[:, 0], bb32[:, 1])
        if res is not None:
            nmin, nmax, leaf, index, nobjs, order = res
            return BVHArrays(
                node_min=jnp.asarray(nmin), node_max=jnp.asarray(nmax),
                node_leaf=jnp.asarray(leaf), node_index=jnp.asarray(index),
                node_nobjs=jnp.asarray(nobjs), obj_order=jnp.asarray(order))
    bb = bb32.astype(np.float64)  # (O,2,3)
    O = st.n_objects
    centroids = (bb[:, 0] + bb[:, 1]) / 2.0

    order = np.arange(O, dtype=np.int64)  # permutation being sorted in place
    node_min, node_max, node_leaf, node_index, node_nobjs = [], [], [], [], []

    root_min = bb[:, 0].min(0) - EPSILON
    root_max = bb[:, 1].max(0) + EPSILON
    node_min.append(root_min)
    node_max.append(root_max)
    node_leaf.append(False)
    node_index.append(0)
    node_nobjs.append(0)

    def recurse(left, right, node):
        n = right - left
        if n <= LEAF_THRESHOLD:
            node_leaf[node] = True
            node_index[node] = left
            node_nobjs[node] = n
            return
        box_lo, box_hi = node_min[node], node_max[node]
        parent_area = _area(box_lo, box_hi)

        best_cost = np.inf
        best_axis = 0
        best_split = left
        for axis in range(3):
            seg = order[left:right]
            # std::sort by centroid (bvh.cpp:88-92); stable here
            seg_sorted = seg[np.argsort(centroids[seg, axis], kind="stable")]
            order[left:right] = seg_sorted

            lo_b, hi_b = box_lo[axis], box_hi[axis]
            scale = BUCKETS / (hi_b - lo_b) if hi_b - lo_b > 0 else 0.0
            idx = np.minimum(BUCKETS - 1,
                             ((centroids[seg_sorted, axis] - lo_b) * scale)
                             .astype(np.int64))
            counts = np.bincount(idx, minlength=BUCKETS)
            bmin = np.full((BUCKETS, 3), np.inf)
            bmax = np.full((BUCKETS, 3), -np.inf)
            for b in range(BUCKETS):
                sel = seg_sorted[idx == b]
                if len(sel):
                    bmin[b] = bb[sel, 0].min(0)
                    bmax[b] = bb[sel, 1].max(0)
            # empty buckets carry +-inf bounds; 0 * inf = nan costs are never
            # selected (`cost < best_cost` is false), matching the C++'s
            # FLT_MAX arithmetic (bvh.cpp:95-188)
            np_err = np.seterr(invalid="ignore")
            for i in range(1, BUCKETS):
                lc = counts[:i].sum()
                rc = counts[i:].sum()
                lmin = bmin[:i].min(0)
                lmax = bmax[:i].max(0)
                rmin = bmin[i:].min(0)
                rmax = bmax[i:].max(0)
                larea = _area(lmin, lmax)
                rarea = _area(rmin, rmax)
                cost = 1.0 + (lc * larea + rc * rarea) / parent_area
                if cost < best_cost:
                    best_cost = cost
                    best_axis = axis
                    best_split = left + int(lc)
            np.seterr(**np_err)

        if (best_split <= left or best_split >= right
                or best_cost >= float(n)):
            node_leaf[node] = True
            node_index[node] = left
            node_nobjs[node] = n
            return

        # re-sort on best axis (bvh.cpp:198-201)
        seg = order[left:right]
        order[left:right] = seg[np.argsort(centroids[seg, best_axis],
                                           kind="stable")]

        li = len(node_min)
        node_index[node] = li
        node_leaf[node] = False
        lsel = order[left:best_split]
        rsel = order[best_split:right]
        node_min.append(bb[lsel, 0].min(0))
        node_max.append(bb[lsel, 1].max(0))
        node_min.append(bb[rsel, 0].min(0))
        node_max.append(bb[rsel, 1].max(0))
        node_leaf.extend([False, False])
        node_index.extend([0, 0])
        node_nobjs.extend([0, 0])
        recurse(left, best_split, li)
        recurse(best_split, right, li + 1)

    import sys
    old_lim = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_lim, 100000))
    try:
        recurse(0, O, 0)
    finally:
        sys.setrecursionlimit(old_lim)

    return BVHArrays(
        node_min=jnp.asarray(np.stack(node_min), jnp.float32),
        node_max=jnp.asarray(np.stack(node_max), jnp.float32),
        node_leaf=jnp.asarray(np.array(node_leaf, bool)),
        node_index=jnp.asarray(np.array(node_index, np.int32)),
        node_nobjs=jnp.asarray(np.array(node_nobjs, np.int32)),
        obj_order=jnp.asarray(order, jnp.int32))


# --------------------------------------------------------------- traversal
def _aabb_hit(o, d, lo, hi):
    """AABB::hit entry-t semantics (boundingBox.cpp:64-124), scalar ray."""
    a = 1.0 / d
    tmin = jnp.where(a >= 0, (lo - o) * a, (hi - o) * a)
    tmax = jnp.where(a >= 0, (hi - o) * a, (lo - o) * a)
    t0 = jnp.max(tmin)
    t1 = jnp.min(tmax)
    t = jnp.where(t0 < 0, t1, t0)
    return (t0 < t1) & (t1 > 0), t


def _inside(o, lo, hi):
    return jnp.all((o > lo) & (o < hi))


def make_bvh_intersectors(scene: SceneData, bvh: BVHArrays,
                          motion_blur: bool = False):
    obj_data, obj_types, obj_mats = scene.packed_objects()
    nmin, nmax = bvh.node_min, bvh.node_max
    nleaf, nindex, nnobjs = bvh.node_leaf, bvh.node_index, bvh.node_nobjs
    oorder = bvh.obj_order

    def _traverse_one(o, d, time, shadow_dist=None):
        """shadow_dist None => closest-hit; else any-hit bool."""
        is_shadow = shadow_dist is not None
        root_ok, _ = _aabb_hit(o, d, nmin[0], nmax[0])

        state = dict(
            node=np.int32(0), sp=np.int32(0),
            stack_n=np.zeros(STACK_SIZE, np.int32),
            stack_t=np.zeros(STACK_SIZE, np.float32),
            best_t=np.float32(FLT_MAX), best_n=np.zeros(3, np.float32),
            best_obj=np.int32(-1), occluded=np.False_,
            active=root_ok)

        def cond(s):
            return s["active"]

        def body(s):
            node = s["node"]
            leaf = nleaf[node]

            # ---------------- inner node ----------------
            # (for leaves nindex is an object offset; clamp to a valid node
            # id and gate everything with ``leaf``)
            li = jnp.clip(jnp.where(leaf, 1, nindex[node]), 0,
                          nmin.shape[0] - 2)
            ri = li + 1
            okL, tL = _aabb_hit(o, d, nmin[li], nmax[li])
            okR, tR = _aabb_hit(o, d, nmin[ri], nmax[ri])
            tL = jnp.where(_inside(o, nmin[li], nmax[li]), 0.0, tL)
            tR = jnp.where(_inside(o, nmin[ri], nmax[ri]), 0.0, tR)

            both = okL & okR
            # closest uses strict <, shadow uses <= (bvh.cpp:261 vs 347)
            left_first = (tL < tR) if not is_shadow else (tL <= tR)
            near = jnp.where(both & left_first, li, ri)
            far = jnp.where(both & left_first, ri, li)
            far_t = jnp.where(both & left_first, tR, tL)

            one = okL ^ okR
            next_inner = jnp.where(both, near, jnp.where(okL, li, ri))
            descend = (both | one) & ~leaf

            push = both & ~leaf
            sp2 = jnp.where(push, s["sp"] + 1, s["sp"])
            stack_n = jnp.where(
                push, s["stack_n"].at[s["sp"]].set(far), s["stack_n"])
            stack_t = jnp.where(
                push, s["stack_t"].at[s["sp"]].set(far_t), s["stack_t"])

            # ---------------- leaf node ----------------
            nobj = nnobjs[node]
            first = nindex[node]

            def leaf_body(i, carry):
                bt, bn, bo, occ = carry
                gid = oorder[jnp.clip(first + i, 0, oorder.shape[0] - 1)]
                t, nrm = hit_packed(o, d, time, obj_data[gid],
                                    obj_types[gid], motion_blur)
                if is_shadow:
                    occ = occ | (t <= shadow_dist + EPSILON)
                    return bt, bn, bo, occ
                better = t < bt
                return (jnp.where(better, t, bt),
                        jnp.where(better, nrm, bn),
                        jnp.where(better, gid, bo), occ)

            bt, bn, bo, occ = jax.lax.fori_loop(
                0, jnp.where(leaf, nobj, 0), leaf_body,
                (s["best_t"], s["best_n"], s["best_obj"], s["occluded"]))

            # ---------------- pop / finish ----------------
            # After a leaf (or an inner with no child hit), pop entries,
            # pruning those with stack.t >= best_t in closest mode
            # (bvh.cpp:299-311); shadow mode pops unconditionally
            # (bvh.cpp:381-387) and stops when occluded.
            need_pop = leaf | (~leaf & ~descend)

            def pop_loop(carry):
                sp, node, found = carry
                return (~found) & (sp > 0)

            def pop_body(carry):
                sp, node, found = carry
                sp = sp - 1
                cand = stack_n[sp]
                cand_t = stack_t[sp]
                good = (cand_t < bt) if not is_shadow else np.True_
                return (sp, jnp.where(good, cand, node), good)

            # lanes that descend skip the pop loop (found starts True)
            sp3, popped_node, found = jax.lax.while_loop(
                pop_loop, pop_body, (sp2, s["node"], ~need_pop))

            new_node = jnp.where(need_pop, popped_node,
                                 jnp.where(leaf, s["node"], next_inner))
            new_sp = jnp.where(need_pop, sp3, sp2)
            done = need_pop & ~found
            if is_shadow:
                done = done | occ
            active = s["active"] & ~done

            return dict(node=new_node, sp=new_sp,
                        stack_n=stack_n, stack_t=stack_t,
                        best_t=bt, best_n=bn, best_obj=bo,
                        occluded=occ, active=active)

        s = jax.lax.while_loop(cond, body, state)
        if is_shadow:
            return s["occluded"]
        hit = s["best_obj"] >= 0
        return hit, jnp.where(hit, s["best_t"], FLT_MAX), s["best_n"], s["best_obj"]

    closest_v = jax.vmap(lambda o, d, t: _traverse_one(o, d, t))
    shadow_v = jax.vmap(lambda o, d, dist: _traverse_one(
        o, d, np.float32(0.0), shadow_dist=dist))

    def closest(o, d, time):
        from distributionraytracer_tpu.ops.intersect import HitResult
        hit, t, nrm, gid = closest_v(o, d, time)
        mat = obj_mats[jnp.maximum(gid, 0)]
        return HitResult(hit=hit, t=t, normal=nrm, obj_id=gid, mat_id=mat)

    def shadow(o, d, dist, exclude_obj):
        del exclude_obj
        return shadow_v(o, d, dist)

    from distributionraytracer_tpu.integrator.whitted import Intersectors
    return Intersectors(closest, shadow)
