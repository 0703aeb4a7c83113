"""Pallas packet traversal for uniform-grid scenes, via cell quantization.

The reference grid's observable semantics (grid.cpp:100-358) reduce to a
set-of-tested-objects plus two gates — which lets the grid ride the same
packet kernel as the BVH (``accel/pallas_bvh.py``) instead of needing a
divergent per-lane DDA kernel:

1. **Tested set.** The DDA tests object ``o`` iff the ray visits a cell
   containing ``o``; objects are multi-inserted into *every* cell their
   AABB overlaps (grid.cpp:75-92), so the cells containing ``o`` form a
   rectangular span whose union is the object's **AABB quantized outward to
   cell boundaries**.  "Ray visits a cell of the span" ⇔ "ray hits the
   quantized AABB" (cells are visited exactly along the ray's in-grid
   segment).  A BVH built over quantized AABBs therefore tests exactly the
   DDA's object set.
2. **Closest-hit accept.** The DDA records the strict-``<`` minimum over
   tested objects, early-exits when ``hitRec.t < t_next`` (grid.cpp:
   277-304), and *drops* the record if it walks out of the grid first.
   Since cells are visited in increasing-t order and a hit always lies in
   a cell of its object's span, the early exit never changes the winner;
   the walk-out drop is exactly ``t_hit < t1`` where ``t1`` is the grid
   slab exit parameter.  So: closest = (min-t over tested objects,
   accepted iff ``t < t1``).
3. **Shadow.** Occluded iff any tested object has ``t < dist`` (strict,
   grid.cpp:330-352), plus the quirk that a failed ``Init_Traverse``
   counts as shadowed (grid.cpp:321-324).

Deviations from the XLA DDA (``accel/grid.py``): float-boundary cases —
rays passing exactly on cell faces can differ between slab arithmetic and
DDA stepping (measure-zero; ``tests/test_pallas_accel.py`` budgets them),
and exact-tie winners follow BVH leaf order instead of per-cell insertion
order (also measure-zero).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from distributionraytracer_tpu.accel.bvh import build_bvh, thread_bvh
from distributionraytracer_tpu.accel.grid import (
    GridArrays, _init_traverse_batched, object_bboxes,
)
from distributionraytracer_tpu.accel.pallas_bvh import (
    PallasBVH, make_pallas_bvh_intersectors, pack_threaded,
)
from distributionraytracer_tpu.ops.common import FLT_MAX
from distributionraytracer_tpu.scene.types import SceneData


class PallasGrid(NamedTuple):
    """Kernel tables + the grid slab parameters needed for the gates.

    ``tabs`` is whichever packet-kernel family packed the emulation tree:
    GroupedBVH (pallas_packet, default) or PallasBVH (legacy)."""

    tabs: object
    bbox_min: jnp.ndarray  # (3,)
    bbox_max: jnp.ndarray  # (3,)
    ncells: jnp.ndarray  # (3,) i32


def quantized_bboxes(scene: SceneData, grid: GridArrays) -> np.ndarray:
    """Object AABBs expanded outward to the cell boundaries they overlap.

    Uses the same cell mapping as the insertion pass (grid.cpp:80-85):
    ``cell = clip(trunc((p - min) * n / (max - min)), 0, n - 1)``.
    """
    bb = object_bboxes(scene).astype(np.float64)  # (O,2,3)
    gmin = np.asarray(jax.device_get(grid.bbox_min), np.float64)
    gmax = np.asarray(jax.device_get(grid.bbox_max), np.float64)
    n = np.asarray(jax.device_get(grid.ncells), np.float64)
    scale = n / (gmax - gmin)
    lo_cell = np.clip(np.trunc((bb[:, 0] - gmin) * scale), 0, n - 1)
    hi_cell = np.clip(np.trunc((bb[:, 1] - gmin) * scale), 0, n - 1)
    q = np.empty_like(bb)
    q[:, 0] = gmin + lo_cell / scale
    q[:, 1] = gmin + (hi_cell + 1.0) / scale
    return q.astype(np.float32)


def emulation_bboxes(scene: SceneData, grid: GridArrays,
                     motion_blur: bool = False) -> np.ndarray:
    """Per-object boxes for the emulation BVH: true AABBs where safe,
    cell-quantized where the DDA's *tested-set* semantics leak.

    The DDA tests object ``o`` whenever the ray crosses a cell of ``o``'s
    span; most of those tests miss.  What is observable is only (min-t,
    any-t<dist) over the *hits*, and every hit on a **static triangle,
    box or sphere lies inside its true AABB** — so a BVH over true AABBs
    tests a subset of the DDA's set that contains every object with a
    valid hit, giving identical closest/shadow results (tie order and
    exact float-boundary cases excepted — the same measure-zero class
    already budgeted vs the XLA DDA).  True AABBs restore the SAH
    separation the cell quantization destroyed: 100k-triangle grid scenes
    (assignment1) traverse like their BVH twins (dragon_assignment1)
    instead of ~870x slower (round-2 measurement).

    Quantization must be kept where a hit CAN fall outside the box:

    - **planes**: the reference never overrides the default (-1,-1,-1)..
      (1,1,1) Object bbox (scene.h:116), so the DDA only tests a plane
      near the origin — a kept reference bug; the observable tested set
      IS the quantized span.
    - **moving spheres** (motion blur): centers move by velocity*time but
      insertion uses the static bbox (grid.cpp:75-92 + scene.cpp:158-162)
      — a hit can escape the static AABB yet be found via the span.
      Spheres are therefore quantized when ``motion_blur`` is on; with it
      off a static sphere's hits all lie inside its true AABB and the
      same subset argument as triangles applies (tight boxes measured
      balls_high — 7.4k spheres, grid — 1.43 s -> interactive).
    """
    from distributionraytracer_tpu.scene.types import (
        OBJ_BOX, OBJ_SPHERE, OBJ_TRIANGLE,
    )
    true_bb = object_bboxes(scene)
    q = quantized_bboxes(scene, grid)
    types = np.array(scene.static.obj_types, np.int64)
    tight = (types == OBJ_TRIANGLE) | (types == OBJ_BOX)
    if not motion_blur:
        tight = tight | (types == OBJ_SPHERE)
    q[tight] = true_bb[tight]
    return q


def pack_grid(scene: SceneData, grid: GridArrays,
              motion_blur: bool = False,
              packet_kernel: str = "grouped") -> Optional[PallasGrid]:
    """Host-side: SAH BVH over emulation AABBs, leaf-collapsed for the
    packet kernel (see accel.bvh.collapse_leaves; objects whose hits can
    escape their emulation boxes keep their own leaves, bvh.protect_mask),
    threaded + packed for the selected kernel family.

    ``motion_blur`` must match the render config: it decides whether
    sphere AABBs may be kept tight (see emulation_bboxes) and which
    objects the collapse protects.
    """
    from distributionraytracer_tpu.accel.bvh import (
        collapse_leaves, protect_mask,
    )
    q = emulation_bboxes(scene, grid, motion_blur)
    tb = thread_bvh(build_bvh(scene, bboxes=q))
    prot = protect_mask(scene, motion_blur)
    tabs = None
    if packet_kernel == "grouped":
        from distributionraytracer_tpu.accel.pallas_packet import (
            GROUPED_LEAF, pack_grouped,
        )
        tabs = pack_grouped(
            scene, collapse_leaves(tb, GROUPED_LEAF, protect=prot))
    if tabs is None:
        from distributionraytracer_tpu.accel.pallas_bvh import PACKET_LEAF
        tabs = pack_threaded(
            scene, collapse_leaves(tb, PACKET_LEAF, protect=prot))
    if tabs is None:
        return None
    return PallasGrid(
        tabs=tabs,
        bbox_min=np.asarray(jax.device_get(grid.bbox_min), np.float32),
        bbox_max=np.asarray(jax.device_get(grid.bbox_max), np.float32),
        ncells=np.asarray(jax.device_get(grid.ncells), np.int32))


def make_brute_grid_intersectors(scene: SceneData, pg: PallasGrid,
                                 motion_blur: bool = False,
                                 interpret: bool = False):
    """Cost-selected brute backend for small grid scenes.

    Tests EVERY object with the linear megakernel (ops.pallas_intersect)
    and applies the grid's observable gates on top: closest accepted iff
    the slab init succeeds and ``t < t1`` (walk-out drop,
    grid.cpp:258-304); shadow uses the strict ``t < dist`` occluder
    compare with no self-exclusion (grid.cpp:330-352) and a failed
    Init_Traverse counts as shadowed (grid.cpp:321-324).  Exact vs the
    DDA for scenes without infinite planes or moving spheres: every hit
    of a static sphere/triangle/box lies inside its true AABB, so the
    DDA's tested set contains every object with a valid hit and the
    strict-< winner coincides (renderer._use_cost_brute refuses scenes
    where that argument fails).
    """
    from distributionraytracer_tpu.integrator.whitted import Intersectors
    from distributionraytracer_tpu.ops import pallas_intersect as _pi
    from distributionraytracer_tpu.ops.intersect import HitResult

    gstub = GridArrays(bbox_min=pg.bbox_min, bbox_max=pg.bbox_max,
                       ncells=pg.ncells, cell_start=None, cell_objs=None,
                       cell_dist=None)

    def closest(o, d, time, valid=None):
        h = _pi.closest_hit_pallas(scene, o, d, time, motion_blur,
                                   interpret=interpret, valid=valid)
        ok, _cell, _dt, _tn, _st, _sp, _tmin, t1 = _init_traverse_batched(
            gstub, o, d)
        hit = h.hit & ok & (h.t < t1)
        return HitResult(
            hit=hit, t=jnp.where(hit, h.t, FLT_MAX), normal=h.normal,
            obj_id=jnp.where(hit, h.obj_id, -1), mat_id=h.mat_id)

    def shadow(o, d, dist, exclude_obj, valid=None):
        occ = _pi.any_hit_pallas(scene, o, d, dist, None, motion_blur,
                                 interpret=interpret, mode="grid",
                                 valid=valid)
        ok, *_ = _init_traverse_batched(gstub, o, d)
        return occ | ~ok

    return Intersectors(closest, shadow)


def make_pallas_grid_intersectors(scene: SceneData, pg: PallasGrid,
                                  motion_blur: bool = False,
                                  interpret: bool = False, bins=None):
    """``bins`` (pallas_binned.BinSet, optional) routes the primary
    closest level and all shadow levels through the binned
    dense-streaming kernels; the grid's observable gates below apply
    identically on top of either inner implementation."""
    from distributionraytracer_tpu.integrator.whitted import Intersectors
    from distributionraytracer_tpu.ops.intersect import HitResult
    from distributionraytracer_tpu.renderer import packet_intersectors

    inner = packet_intersectors(scene, pg.tabs, motion_blur,
                                interpret=interpret, shadow_mode="grid")
    if bins is not None:
        from distributionraytracer_tpu.accel.pallas_binned import (
            leveled_binned_intersectors,
        )
        inner = leveled_binned_intersectors(
            scene, pg.tabs, bins, inner, motion_blur,
            interpret=interpret, shadow_mode="grid")
    gstub = GridArrays(bbox_min=pg.bbox_min, bbox_max=pg.bbox_max,
                       ncells=pg.ncells, cell_start=None, cell_objs=None,
                       cell_dist=None)

    def closest(o, d, time, valid=None):
        h = inner.closest(o, d, time, valid=valid)
        ok, _cell, _dt, _tn, _st, _sp, _tmin, t1 = _init_traverse_batched(
            gstub, o, d)
        # walking out of the grid drops the record (grid.cpp:289-304);
        # a failed slab init is a miss (grid.cpp:258-260)
        hit = h.hit & ok & (h.t < t1)
        return HitResult(
            hit=hit, t=jnp.where(hit, h.t, FLT_MAX), normal=h.normal,
            obj_id=jnp.where(hit, h.obj_id, -1), mat_id=h.mat_id)

    def shadow(o, d, dist, exclude_obj, valid=None):
        occ = inner.shadow(o, d, dist, exclude_obj, valid=valid)
        ok, *_ = _init_traverse_batched(gstub, o, d)
        # Init_Traverse failure counts as shadowed (grid.cpp:321-324)
        return occ | ~ok

    return Intersectors(closest, shadow)
