"""Binned dense-streaming intersectors: rasterization-style culling.

Third-generation accelerated path for big-mesh scenes, replacing tree
*walking* with candidate-list *streaming* — the design thesis is that a
TPU prefers dense full-width work over pointer chasing:

- The grouped packet walker (``pallas_packet.py``) spends ~75% of its
  per-step vector ops on walk overhead (dynamic node fetches, cursor
  prefix-max machinery, state read-modify-writes) and still tests ~1.5k
  nodes + 0.5k objects per ray on the 100k-triangle dragon (its own
  ``packet_profile``).
- Primary rays need no walk at all: every ray of a 128-lane chain goes
  through a known pixel rectangle, so a *host-side conservative screen
  projection* of the leaf object groups yields each chain's complete
  candidate list up front.  The kernel just streams the list: one
  dynamic column fetch + one dense (8 objects x 128 rays) test per
  candidate, at full VPU width, with **front-to-back early termination**
  (lists are sorted by eye distance; once every live lane's best-t is
  closer than the next candidate's conservative entry distance, the
  chain stops — typically after the first depth layer).
- Shadow rays all point at a light: a per-light *frustum tile binning*
  (a shadow-map-style K x K parametrization of the scene's solid angle
  as seen from the light) gives each shadow chain its occluder
  candidates from the tiles its lanes cover.

Exactness: candidate lists are conservative supersets built from true
object AABBs (projection of a convex hull covers the projections of its
points), and the tests themselves are the reference primitive formulas
(shared with pallas_packet), so closest/any-hit results equal the
brute-force reference semantics; the grid's observable gates (slab init,
walk-out drop, Init_Traverse-fail) are applied by the same wrappers that
gate the packet path (accel/pallas_grid.py).  Eligibility is checked by
``binned_supported`` — no infinite planes, no moving spheres, punctual
lights outside the scene bounds (see each check's comment for the
reference quirk it protects).

Reference semantics carried: closest strict-< first-wins (main.cpp:321,
bvh.cpp:300-308), BVH shadow ``t <= dist + EPSILON`` (bvh.cpp:376), grid
shadow strict ``t < dist`` (grid.cpp:330-352).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distributionraytracer_tpu.ops.common import EPSILON, FLT_MAX
from distributionraytracer_tpu.scene.types import OBJ_PLANE, SceneData

LANES = 128
GROUP = 8
CHAINS = 8  # chains per (8, 128) Mosaic tile
NODE_SLAB_ROWS = 14 * GROUP  # 112: the grouped object-table row count
PAD_PX = 2.0  # conservative screen-projection padding (pixel jitter +1)
# Light-frustum tiles per axis.  Far lights see the scene under a small
# solid angle with deep depth stacking (a 100k-tri mesh piles thousands
# of groups into a coarse tile); 128 keeps hot-tile occupancy near the
# per-ray depth complexity while tile_start (L*K^2) stays SMEM-sized.
LIGHT_K = 128
P_BUCKET = 16384  # candidate-array padding bucket (bounds recompiles)
# chain-count cap: the per-camera candidate slab costs ~#cands * 448 B
# of HBM (~75 MB on dragon's 3.7k chains); past ~16k chains (high-spp
# mesh frames) the build cost and slab size stop paying for themselves
# and the packet walker takes the frame instead
MAX_CHAINS = 16384


# --------------------------------------------------------------- group boxes
def group_boxes(scene: SceneData, tabs) -> np.ndarray:
    """(Go, 7) f32: [min3, max3, n_members] world AABBs of the grouped
    object table's 8-object columns (true object AABBs — see module
    docstring for why true boxes are superset-safe here)."""
    from distributionraytracer_tpu.accel.grid import object_bboxes
    og = np.asarray(jax.device_get(tabs.obj_g), np.float32)
    Go = og.shape[1]
    types = og[12 * GROUP:13 * GROUP, :].T  # (Go, 8); -1 = inert
    ids = og[13 * GROUP:14 * GROUP, :].T.astype(np.int64)
    live = types >= 0.0
    bb = object_bboxes(scene)  # (O, 2, 3)
    mb = bb[np.clip(ids, 0, max(bb.shape[0] - 1, 0))]  # (Go, 8, 2, 3)
    out = np.empty((Go, 7), np.float32)
    mins = np.where(live[:, :, None], mb[:, :, 0, :], np.float32(np.inf))
    maxs = np.where(live[:, :, None], mb[:, :, 1, :], np.float32(-np.inf))
    out[:, 0:3] = mins.min(axis=1)
    out[:, 3:6] = maxs.max(axis=1)
    out[:, 6] = live.sum(axis=1)
    return out


def _host_camera(scene: SceneData):
    """NumPy twin of scene.types.derive_camera (camera.h:44-57)."""
    st = scene.static
    eye = np.asarray(jax.device_get(scene.cam_eye), np.float64)
    at = np.asarray(jax.device_get(scene.cam_at), np.float64)
    up = np.asarray(jax.device_get(scene.cam_up), np.float64)
    n = eye - at
    pd = np.linalg.norm(n)
    n = n / pd
    u = np.cross(up, n)
    u = u / np.linalg.norm(u)
    v = np.cross(n, u)
    h = 2.0 * pd * np.tan((np.pi * st.fovy / 180.0) / 2.0)
    w = (st.res_x / st.res_y) * h
    return eye, u, v, n, pd, w, h


# ------------------------------------------------------------- primary bins
BLK = 32  # candidate columns per logical slab block
SUB = LANES // BLK  # logical blocks per streamed (112, 128) superblock


class PrimaryBins(NamedTuple):
    """Per-frame chain candidates (host-built, camera-dependent).

    Chain-level CSR (``chain_start (C+1,)`` i32 into ``cand (P,)`` i32
    group-column ids, per-chain sorted ascending by ``cand_dist`` (P,)
    f32 conservative eye->group entry distance) plus the block-level
    streaming layout the kernel actually consumes: candidate columns are
    materialized into BLK-column slabs (``slab`` (112, B*BLK) f32, built
    on device from ``tabs.obj_g`` once per camera, HBM-resident) with
    per-block metadata ``blk_owner`` (B,) i32 chain id and ``blk_dist``
    (B,) f32 (min entry distance -> front-to-back block skip), and
    ``tile_start`` (T+1,) i32 per-ray-tile superblock ranges.  The
    Pallas grid runs one step per ray tile; the kernel double-buffer
    DMAs its tile's slab superblocks from HBM."""

    chain_start: jnp.ndarray
    cand: jnp.ndarray
    cand_dist: jnp.ndarray
    blk_owner: jnp.ndarray
    blk_dist: jnp.ndarray
    tile_start: jnp.ndarray
    slab: jnp.ndarray


def _chain_grid(H: int, W: int, S: int):
    """The chain->pixel-rect structure induced by render._block_perm.

    Returns (rw, rh, grid) where chains tile the image in (rh, rw) pixel
    rects and ``grid[y // rh, x // rw]`` is the chain id owning pixel
    (x, y) — or None when the structure is not a uniform rect tiling
    (odd S or non-dividing resolutions; callers fall back to the packet
    path)."""
    from distributionraytracer_tpu.integrator.render import _block_perm
    if S > 128 or (128 % S) != 0:
        return None
    perm = _block_perm(H, W, S)
    R = perm.shape[0]
    C = -(-R // LANES)
    if R % LANES:
        return None
    pix = perm.reshape(C, LANES) // S
    xs, ys = pix % W, pix // W
    x0, x1 = xs.min(axis=1), xs.max(axis=1)
    y0, y1 = ys.min(axis=1), ys.max(axis=1)
    rw = int(x1[0] - x0[0] + 1)
    rh = int(y1[0] - y0[0] + 1)
    if (W % rw) or (H % rh):
        return None
    if not (np.all(x1 - x0 + 1 == rw) and np.all(y1 - y0 + 1 == rh)):
        return None
    grid = np.full((H // rh, W // rw), -1, np.int64)
    grid[y0 // rh, x0 // rw] = np.arange(C)
    if (grid < 0).any():
        return None
    return rw, rh, grid


def build_primary_bins(scene: SceneData, gbox: np.ndarray, tabs,
                       H: int, W: int, S: int) -> Optional[PrimaryBins]:
    """Host-side conservative screen binning of object groups to chains.

    Each group's 8 AABB corners are projected through the exact pinhole
    mapping of ops.camera.primary_rays (inverted); the padded screen
    bbox covers every pixel whose primary ray can hit any member object
    (projection of a convex hull contains the projections of its
    points).  Groups with any corner at or behind the eye plane go into
    every chain's list.  Returns None when the chain structure is not a
    uniform tiling (caller falls back)."""
    cg = _chain_grid(H, W, S)
    if cg is None:
        return None
    rw, rh, grid = cg
    C = grid.size
    if C > MAX_CHAINS:
        return None  # high-spp / huge frames: slab memory would balloon
    eye, u, v, n, pd, w, h = _host_camera(scene)

    live = gbox[:, 6] > 0
    gids = np.nonzero(live)[0]
    if gids.size == 0:
        return _finish_primary_bins(
            tabs, C, np.zeros((C + 1,), np.int64),
            np.zeros((0,), np.int32), np.zeros((0,), np.float32))
    bmin = gbox[gids, 0:3].astype(np.float64)
    bmax = gbox[gids, 3:6].astype(np.float64)

    # 8 corners -> viewport coords (inverse of primary_rays: a ray through
    # viewport (px, py) has dir ~ u*w*(px/W-.5) + v*h*(py/H-.5) - n*pd)
    corners = np.stack([np.where((np.arange(8)[:, None] >> k) & 1,
                                 bmax[:, k][None, :], bmin[:, k][None, :])
                        for k in range(3)], axis=-1)  # (8, G, 3)
    vec = corners - eye
    a = vec @ u
    b = vec @ v
    c = vec @ n
    front = c < -1e-9  # camera looks along -n
    s = np.where(front, -c / pd, 1.0)
    px = (a / (s * w) + 0.5) * W
    py = (b / (s * h) + 0.5) * H
    unbounded = ~front.all(axis=0)
    px0 = np.where(unbounded, 0.0, px.min(axis=0) - PAD_PX)
    px1 = np.where(unbounded, W - 1.0, px.max(axis=0) + PAD_PX)
    py0 = np.where(unbounded, 0.0, py.min(axis=0) - PAD_PX)
    py1 = np.where(unbounded, H - 1.0, py.max(axis=0) + PAD_PX)

    onscreen = (px1 >= 0) & (px0 <= W - 1) & (py1 >= 0) & (py0 <= H - 1)
    keep = np.nonzero(onscreen)[0]
    gids = gids[keep]
    gx0 = np.clip(px0[keep], 0, W - 1).astype(np.int64) // rw
    gx1 = np.clip(px1[keep], 0, W - 1).astype(np.int64) // rw
    gy0 = np.clip(py0[keep], 0, H - 1).astype(np.int64) // rh
    gy1 = np.clip(py1[keep], 0, H - 1).astype(np.int64) // rh

    # conservative eye->AABB distance (lower-bounds any member hit t;
    # primary dirs are normalized so ray t == euclidean distance)
    dv = np.maximum(np.maximum(bmin[keep] - eye, eye - bmax[keep]), 0.0)
    gdist = np.sqrt((dv * dv).sum(axis=1)).astype(np.float32)

    # vectorized (chain, group) pair emission over the 2-D chain ranges
    ngx = gx1 - gx0 + 1
    ngy = gy1 - gy0 + 1
    cnt = ngx * ngy
    total = int(cnt.sum())
    rep = np.repeat(np.arange(gids.size), cnt)
    k = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    cx = gx0[rep] + k % ngx[rep]
    cy = gy0[rep] + k // ngx[rep]
    chain = grid[cy, cx]
    order = np.lexsort((gdist[rep], chain))
    cand = gids[rep[order]].astype(np.int32)
    cdist = gdist[rep[order]]
    chain_start = np.searchsorted(chain[order], np.arange(C + 1))
    return _finish_primary_bins(tabs, C, chain_start, cand, cdist)


def _finish_primary_bins(tabs, C, chain_start, cand, cdist):
    """Block-level streaming layout from the per-chain CSR: every chain
    gets >= 1 BLK-column block (so its output rows are initialized even
    when it has no candidates); block order follows chain order, so
    blocks of one (8-chain) ray tile are consecutive and the output
    block stays VMEM-resident across them."""
    cnt = np.diff(chain_start)
    nb = np.maximum(1, -(-cnt // BLK))
    owner = np.repeat(np.arange(C), nb)
    k = np.arange(owner.size) - np.repeat(np.cumsum(nb) - nb, nb)
    src0 = chain_start[owner] + k * BLK  # first cand of this block
    in_rng = k * BLK < cnt[owner]
    bdist = np.where(
        in_rng, cdist[np.minimum(src0, max(len(cdist) - 1, 0))]
        if len(cdist) else FLT_MAX, FLT_MAX).astype(np.float32)
    cols = src0[:, None] + np.arange(BLK)[None, :]
    cval = (cols < (chain_start[owner] + cnt[owner])[:, None]) & (
        cols < max(len(cand), 1))
    ids2 = np.where(cval, cand[np.minimum(cols, max(len(cand) - 1, 0))]
                    if len(cand) else -1, -1)  # (B0, BLK), -1 = inert

    # a streamed (112, 128) superblock carries SUB logical blocks, and
    # its ray/output tile is chosen once per grid step — so pad every
    # ray tile's block run to a SUB multiple (pad blocks: same tile,
    # dist = +inf, inert columns)
    tile = owner // CHAINS
    ob, od, oi = [], [], []
    ntile = -(-C // CHAINS)
    tile_sb = np.zeros(ntile + 1, np.int64)  # superblock starts
    start_idx = np.searchsorted(tile, np.arange(ntile + 1))
    for tt in range(ntile):
        lo, hi = start_idx[tt], start_idx[tt + 1]
        ob.append(owner[lo:hi])
        od.append(bdist[lo:hi])
        oi.append(ids2[lo:hi])
        pad = (-(hi - lo)) % SUB
        if pad:
            ob.append(np.full(pad, tt * CHAINS, np.int64))
            od.append(np.full(pad, FLT_MAX, np.float32))
            oi.append(np.full((pad, BLK), -1, np.int64))
        tile_sb[tt + 1] = tile_sb[tt] + (hi - lo + pad) // SUB
    owner_b = np.concatenate(ob) if ob else np.zeros(0, np.int64)
    bdist_b = np.concatenate(od) if od else np.zeros(0, np.float32)
    ids_b = (np.concatenate(oi) if oi
             else np.zeros((0, BLK), np.int64))
    B = owner_b.size
    Bp = max(-(-B // 512) * 512, 512)
    owner_p = np.concatenate(
        [owner_b, np.zeros(Bp - B, np.int64)]).astype(np.int32)
    bdist_p = np.concatenate(
        [bdist_b, np.full(Bp - B, FLT_MAX, np.float32)])
    ids_p = np.concatenate(
        [ids_b.reshape(-1),
         np.full((Bp - B) * BLK, -1, np.int64)]).astype(np.int32)

    # device: materialize the slab from the grouped object table (one
    # column gather per camera); inert columns get type -1
    idsj = jnp.asarray(ids_p)
    slab = jnp.take(tabs.obj_g, jnp.maximum(idsj, 0), axis=1)
    inert = (idsj < 0)[None, :]
    tmask = np.zeros((NODE_SLAB_ROWS, 1), np.float32)
    tmask[12 * GROUP:13 * GROUP] = 1.0
    slab = jnp.where(inert & (tmask > 0), -1.0, slab)

    P = max(len(cand), 1)
    cand_p = np.zeros((P,), np.int32)
    cand_p[:len(cand)] = cand
    dist_p = np.full((P,), FLT_MAX, np.float32)
    dist_p[:len(cdist)] = cdist
    return PrimaryBins(
        chain_start=jnp.asarray(chain_start.astype(np.int32)),
        cand=jnp.asarray(cand_p), cand_dist=jnp.asarray(dist_p),
        blk_owner=jnp.asarray(owner_p),
        blk_dist=jnp.asarray(bdist_p),
        tile_start=jnp.asarray(tile_sb.astype(np.int32)), slab=slab)


# --------------------------------------------------------------- light bins
class LightBins(NamedTuple):
    """Per-scene occluder binning for punctual lights (host-built once).

    A K x K tile grid over each light's scene-bounding frustum (axis =
    light->scene-center; a shadow ray from a point inside the scene
    bounds always maps into it).  ``tile_start`` (L*K*K + 1,) i32 CSR
    with x-fastest tile order so one (light, row, tx0..tx1) span is a
    contiguous entry range; ``frames`` (L, 16) f32 rows [Lpos3, u3, v3,
    w3, sx, sy, pad2].  ``slab`` (120, Qpad) f32 is the dense
    entry-parameter table the kernel streams (rows 0..111 = the entry's
    grouped-object column, rows 112..119 = the group's min distance
    from the light, replicated): entries within a tile sort ascending
    by that distance, so a chain stops a span once the distance passes
    its lanes' max |origin - light| (an occluder on segment [o, L] is
    nearer the light than o)."""

    tile_start: jnp.ndarray
    frames: jnp.ndarray
    slab: jnp.ndarray


def build_light_bins(scene: SceneData, gbox: np.ndarray, tabs,
                     K: int = LIGHT_K) -> Optional[LightBins]:
    """Conservative per-light frustum binning of object groups.

    Returns None when any light sits inside (or too close to) the scene
    bounds — the frustum parametrization needs the light outside, and
    GRID scenes additionally need every light >= 1 unit away: their
    shadow convention compares occluder t against ~1.0 along a
    normalized direction (the dangling-else quirk, main.cpp:411-420),
    so the tested window can extend past a closer light, where
    direction binning no longer covers.  Callers fall back to the
    packet shadow path."""
    from distributionraytracer_tpu.scene.types import ACCEL_GRID
    st = scene.static
    min_dist = 1.05 if st.accel == ACCEL_GRID else 1e-3
    L = st.n_lights
    live = gbox[:, 6] > 0
    if not live.any() or L == 0:
        return None
    smin = gbox[live, 0:3].min(axis=0).astype(np.float64)
    smax = gbox[live, 3:6].max(axis=0).astype(np.float64)
    center = (smin + smax) / 2.0
    half = (smax - smin) / 2.0
    lpos = np.asarray(jax.device_get(scene.light_pos), np.float64)

    frames = np.zeros((L, 16), np.float32)
    all_start = []
    all_entries = []
    gids = np.nonzero(live)[0]
    bmin = gbox[gids, 0:3].astype(np.float64)
    bmax = gbox[gids, 3:6].astype(np.float64)
    corners = np.stack([np.where((np.arange(8)[:, None] >> k) & 1,
                                 bmax[:, k][None, :], bmin[:, k][None, :])
                        for k in range(3)], axis=-1)  # (8, G, 3)

    for li in range(L):
        Lp = lpos[li]
        # light must be outside the scene box by min_dist: the frustum
        # axis construction (and, for grid scenes, the normalized-dist
        # shadow window — see docstring) both need it
        gap = np.maximum(np.abs(Lp - center) - half, 0.0)
        if np.linalg.norm(gap) < min_dist:
            return None
        wax = center - Lp
        dist_c = np.linalg.norm(wax)
        wax = wax / dist_c
        tmp = np.array([0.0, 1.0, 0.0]) if abs(wax[1]) < 0.9 else np.array(
            [1.0, 0.0, 0.0])
        ua = np.cross(tmp, wax)
        ua /= np.linalg.norm(ua)
        va = np.cross(wax, ua)
        # frustum half-extent: max tangent of any scene-box corner
        scorn = np.stack([np.where((np.arange(8)[:, None] >> k) & 1,
                                   smax[k], smin[k]) for k in range(3)],
                         axis=-1)  # (8, 3)
        svec = scorn - Lp
        sw = svec @ wax
        if np.any(sw <= 1e-9):
            return None  # box wraps behind the light axis
        sx = float(np.max(np.abs(svec @ ua) / sw)) * 1.001 + 1e-6
        sy = float(np.max(np.abs(svec @ va) / sw)) * 1.001 + 1e-6
        frames[li, 0:3] = Lp
        frames[li, 3:6] = ua
        frames[li, 6:9] = va
        frames[li, 9:12] = wax
        frames[li, 12] = sx
        frames[li, 13] = sy

        vec = corners - Lp  # (8, G, 3)
        aw = vec @ wax
        behind = np.any(aw <= 1e-9, axis=0)  # group box reaches the
        # light's lateral plane (or EPSILON-touches the light): bin to
        # every tile — covers occluders just past the light that the
        # BVH compare t <= dist + EPSILON still accepts
        sa = (vec @ ua) / np.where(aw > 1e-9, aw, 1.0)
        ta = (vec @ va) / np.where(aw > 1e-9, aw, 1.0)
        tx0 = np.where(behind, 0, np.clip(
            ((sa.min(axis=0) / sx) * 0.5 + 0.5) * K, 0, K - 1).astype(
                np.int64))
        tx1 = np.where(behind, K - 1, np.clip(
            ((sa.max(axis=0) / sx) * 0.5 + 0.5) * K, 0, K - 1).astype(
                np.int64))
        ty0 = np.where(behind, 0, np.clip(
            ((ta.min(axis=0) / sy) * 0.5 + 0.5) * K, 0, K - 1).astype(
                np.int64))
        ty1 = np.where(behind, K - 1, np.clip(
            ((ta.max(axis=0) / sy) * 0.5 + 0.5) * K, 0, K - 1).astype(
                np.int64))
        ntx = tx1 - tx0 + 1
        nty = ty1 - ty0 + 1
        cnt = ntx * nty
        total = int(cnt.sum())
        rep = np.repeat(np.arange(gids.size), cnt)
        k2 = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        px = tx0[rep] + k2 % ntx[rep]
        py = ty0[rep] + k2 // ntx[rep]
        tile = py * K + px
        # min distance from the light to the group AABB: the span cut
        # key (entries sort ascending by it within each tile)
        dv = np.maximum(np.maximum(bmin - Lp, Lp - bmax), 0.0)
        gd = np.sqrt((dv * dv).sum(axis=1)).astype(np.float32)
        order = np.lexsort((gd[rep], tile))
        ent = gids[rep[order]].astype(np.int32)
        tstart = np.searchsorted(tile[order],
                                 np.arange(K * K)).astype(np.int64)
        all_start.append(tstart)
        all_entries.append((ent, gd[rep[order]]))

    # concatenate per-light CSRs with running offsets; final sentinel
    offs = np.cumsum([0] + [e[0].size for e in all_entries])
    start = np.concatenate(
        [all_start[i] + offs[i] for i in range(L)] + [offs[-1:]])
    entries = (np.concatenate([e[0] for e in all_entries])
               if offs[-1] else np.zeros((1,), np.int32))
    edist = (np.concatenate([e[1] for e in all_entries])
             if offs[-1] else np.full((1,), FLT_MAX, np.float32))
    Q = max(-(-entries.size // P_BUCKET) * P_BUCKET, P_BUCKET)
    ent_p = np.zeros((Q,), np.int64)
    ent_p[:entries.size] = entries
    dist_p = np.full((Q,), FLT_MAX, np.float32)
    dist_p[:entries.size] = edist
    # dense entry-parameter slab, HBM-resident, streamed by the kernel
    idsj = jnp.asarray(ent_p.astype(np.int32))
    cols = jnp.take(tabs.obj_g, jnp.maximum(idsj, 0), axis=1)
    drow = jnp.broadcast_to(jnp.asarray(dist_p)[None, :], (8, Q))
    slab = jnp.concatenate([cols, drow], axis=0)  # (120, Q)
    return LightBins(tile_start=jnp.asarray(start.astype(np.int32)),
                     frames=jnp.asarray(frames), slab=slab)


# ------------------------------------------------------------------ kernels
def _make_binned_closest_kernel(types_present, motion_blur):
    from distributionraytracer_tpu.accel.pallas_packet import (
        _prim_test_grouped,
    )

    def kernel(tbs_ref, own_ref, dist_ref, slab_ref,
               ox, oy, oz, dx, dy, dz, tm, vd,
               t_ref, nx_ref, ny_ref, nz_ref, oid_ref,
               buf, sem):
        # one grid step per RAY TILE (all block specs are static grid
        # functions, so Pallas fetches each tile's rays and writes its
        # outputs exactly once — a scalar-dependent index_map was
        # measured to re-DMA every block every step, ~54us of pure
        # framework overhead).  The tile's candidate slab superblocks
        # stream HBM -> VMEM through a double-buffered manual DMA while
        # the previous superblock's 4x32 columns are tested densely.
        ti = pl.program_id(0)
        shape = (GROUP, LANES)
        idx8 = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0)

        t_ref[:] = jnp.full((CHAINS, LANES), FLT_MAX, jnp.float32)
        nx_ref[:] = jnp.zeros((CHAINS, LANES), jnp.float32)
        ny_ref[:] = jnp.zeros((CHAINS, LANES), jnp.float32)
        nz_ref[:] = jnp.zeros((CHAINS, LANES), jnp.float32)
        oid_ref[:] = jnp.full((CHAINS, LANES), -1.0, jnp.float32)

        s = tbs_ref[ti]  # superblock range of this tile
        e = tbs_ref[ti + 1]

        def get_dma(slot, k):
            off = pl.multiple_of(k * LANES, LANES)
            return pltpu.make_async_copy(
                slab_ref.at[:, pl.ds(off, LANES)],
                buf.at[slot], sem.at[slot])

        @pl.when(s < e)
        def _():
            get_dma(0, s).start()

        def body(k, _):
            slot = (k - s) % 2

            @pl.when(k + 1 < e)
            def _():
                get_dma((k - s + 1) % 2, k + 1).start()

            get_dma(slot, k).wait()
            # one register load of the whole superblock: the per-column
            # field slices below then select from live vregs instead of
            # issuing 14 VMEM reads per column
            blk = buf[slot]

            for sb in range(SUB):
                b = k * SUB + sb
                row = own_ref[b] % CHAINS
                valid = vd[pl.ds(row, 1), :] > 0.0
                # front-to-back block skip: blocks are per-chain
                # dist-sorted and primary origins sit at the eye (ray
                # t == euclidean distance), so once every live lane
                # beats this block's entry distance nothing later wins
                worst = jnp.max(jnp.where(
                    valid, t_ref[pl.ds(row, 1), :], -FLT_MAX))

                @pl.when(worst >= dist_ref[b])
                def _(sb=sb, row=row, valid=valid, slot=slot):
                    o_b = tuple(jnp.broadcast_to(r[pl.ds(row, 1), :],
                                                 shape)
                                for r in (ox, oy, oz))
                    d_b = tuple(jnp.broadcast_to(r[pl.ds(row, 1), :],
                                                 shape)
                                for r in (dx, dy, dz))
                    inv_b = tuple(1.0 / dk for dk in d_b)
                    time_b = jnp.broadcast_to(tm[pl.ds(row, 1), :],
                                              shape)
                    bt = t_ref[pl.ds(row, 1), :]
                    bn0 = nx_ref[pl.ds(row, 1), :]
                    bn1 = ny_ref[pl.ds(row, 1), :]
                    bn2 = nz_ref[pl.ds(row, 1), :]
                    boid = oid_ref[pl.ds(row, 1), :]
                    for j in range(sb * BLK, (sb + 1) * BLK):
                        fld = lambda f, j=j: blk[
                            f * GROUP:(f + 1) * GROUP, j:j + 1]
                        t_c, n_c = _prim_test_grouped(
                            fld, o_b, d_b, inv_b, time_b,
                            types_present, motion_blur)
                        # per-ray winner among the 8; lowest row wins
                        # exact ties (DFS object order, pallas_packet)
                        tmin_c = jnp.min(t_c, axis=0, keepdims=True)
                        first_r = jnp.min(
                            jnp.where(t_c == tmin_c, idx8, GROUP),
                            axis=0, keepdims=True)
                        onehot = idx8 == first_r
                        pick = lambda a: jnp.max(
                            jnp.where(onehot, a, -FLT_MAX),
                            axis=0, keepdims=True)
                        gidv = blk[13 * GROUP:14 * GROUP,
                                   j:j + 1]
                        better = valid & (tmin_c < bt)
                        bt = jnp.where(better, tmin_c, bt)
                        bn0 = jnp.where(better, pick(n_c[0]), bn0)
                        bn1 = jnp.where(better, pick(n_c[1]), bn1)
                        bn2 = jnp.where(better, pick(n_c[2]), bn2)
                        boid = jnp.where(
                            better,
                            pick(jnp.broadcast_to(gidv, shape)), boid)
                    t_ref[pl.ds(row, 1), :] = bt
                    nx_ref[pl.ds(row, 1), :] = bn0
                    ny_ref[pl.ds(row, 1), :] = bn1
                    nz_ref[pl.ds(row, 1), :] = bn2
                    oid_ref[pl.ds(row, 1), :] = boid
            return 0

        jax.lax.fori_loop(s, e, body, 0)

    return kernel


def _make_binned_shadow_kernel(types_present, motion_blur, shadow_mode, K):
    from distributionraytracer_tpu.accel.pallas_packet import (
        _prim_test_grouped,
    )

    def kernel(ts_ref, fr_ref, lid_ref, slab_ref,
               ox, oy, oz, dx, dy, dz, dist, vd, occ_ref, buf, sem):
        # Same shape as the binned closest kernel: one grid step per ray
        # tile (static block index maps), chains handled sequentially,
        # the dense entry-parameter slab DMA-streamed from HBM in
        # (120, 128) windows.  Each chain tests only the entry spans of
        # the light-frustum tile rows its lanes cover, gated per column
        # by (a) span membership and (b) the light-distance cut: an
        # occluder on segment [origin, light] is nearer the light than
        # the origin, so entries beyond max |o - L| cannot occlude.
        shape = (GROUP, LANES)
        occ_ref[:] = jnp.zeros((CHAINS, LANES), jnp.float32)
        fK = np.float32(K)
        ti = pl.program_id(0)
        nwin = slab_ref.shape[1] // LANES

        def get_dma(w):
            off = pl.multiple_of(w * LANES, LANES)
            return pltpu.make_async_copy(
                slab_ref.at[:, pl.ds(off, LANES)], buf, sem)

        for ci in range(CHAINS):
            o_r = (ox[ci:ci + 1, :], oy[ci:ci + 1, :], oz[ci:ci + 1, :])
            o_b = tuple(jnp.broadcast_to(r, shape) for r in o_r)
            d_b = tuple(jnp.broadcast_to(r[ci:ci + 1, :], shape)
                        for r in (dx, dy, dz))
            inv_b = tuple(1.0 / dk for dk in d_b)
            time_b = jnp.zeros(shape, jnp.float32)  # shadow: time = 0
            sd = dist[ci:ci + 1, :]
            valid = vd[ci:ci + 1, :] > 0.0

            c = ti * CHAINS + ci
            li = lid_ref[c]
            base = li * 16
            Lx, Ly, Lz = (fr_ref[base + 0], fr_ref[base + 1],
                          fr_ref[base + 2])
            ua = (fr_ref[base + 3], fr_ref[base + 4], fr_ref[base + 5])
            va = (fr_ref[base + 6], fr_ref[base + 7], fr_ref[base + 8])
            wa = (fr_ref[base + 9], fr_ref[base + 10], fr_ref[base + 11])
            sx, sy = fr_ref[base + 12], fr_ref[base + 13]

            # per-lane light-frustum tile of the origin (the direction
            # from the light through every point of [o, light] is o - L)
            vx, vy, vz = o_r[0] - Lx, o_r[1] - Ly, o_r[2] - Lz
            aw = vx * wa[0] + vy * wa[1] + vz * wa[2]
            aws = jnp.where(aw > 1e-9, aw, 1.0)
            su = (vx * ua[0] + vy * ua[1] + vz * ua[2]) / aws
            tv = (vx * va[0] + vy * va[1] + vz * va[2]) / aws
            txf = jnp.clip((su / sx) * 0.5 + 0.5, 0.0, 1.0) * fK
            tyf = jnp.clip((tv / sy) * 0.5 + 0.5, 0.0, 1.0) * fK
            tx = jnp.clip(txf.astype(jnp.int32), 0, K - 1)
            ty = jnp.clip(tyf.astype(jnp.int32), 0, K - 1)
            big = jnp.int32(K)
            tx0 = jnp.min(jnp.where(valid, tx, big))
            tx1 = jnp.max(jnp.where(valid, tx, -1))
            ty0 = jnp.min(jnp.where(valid, ty, big))
            ty1 = jnp.max(jnp.where(valid, ty, -1))  # -1: all dead
            tbase = li * (K * K)
            # light-distance cut bound over live lanes
            od2 = vx * vx + vy * vy + vz * vz
            maxd = jnp.sqrt(jnp.maximum(jnp.max(
                jnp.where(valid, od2, 0.0)), 0.0)) + np.float32(1e-3)

            def row_body(ty_j, _, ci=ci, tbase=tbase, tx0=tx0, tx1=tx1,
                         valid=valid, o_b=o_b, d_b=d_b, inv_b=inv_b,
                         time_b=time_b, sd=sd, maxd=maxd):
                rs = ts_ref[tbase + ty_j * K + tx0]
                re = ts_ref[tbase + ty_j * K + tx1 + 1]
                w0 = rs // LANES
                w1 = jnp.minimum((re + LANES - 1) // LANES,
                                 jnp.int32(nwin))

                def win_body(w, _):
                    occ_row = occ_ref[ci:ci + 1, :]
                    live = jnp.any(valid & (occ_row == 0.0))

                    @pl.when(live)
                    def _(w=w):
                        dma = get_dma(w)
                        dma.start()
                        dma.wait()
                        blk = buf[:]
                        for sb in range(SUB):
                            j0 = w * LANES + sb * BLK
                            # sub-block overlap + distance-cut gates
                            dmin = jnp.min(blk[
                                14 * GROUP:14 * GROUP + 1,
                                sb * BLK:(sb + 1) * BLK])
                            ok_sb = ((j0 + BLK > rs) & (j0 < re)
                                     & (dmin <= maxd))

                            @pl.when(ok_sb)
                            def _(sb=sb, j0=j0):
                                occ = occ_ref[ci:ci + 1, :]
                                for j in range(BLK):
                                    jj = sb * BLK + j
                                    fld = lambda f, jj=jj: blk[
                                        f * GROUP:(f + 1) * GROUP,
                                        jj:jj + 1]
                                    t_c, _n = _prim_test_grouped(
                                        fld, o_b, d_b, inv_b, time_b,
                                        types_present, motion_blur)
                                    if shadow_mode == "grid":
                                        hit = t_c < sd  # grid.cpp:330
                                    else:
                                        hit = t_c <= sd + EPSILON
                                    dj = blk[14 * GROUP:14 * GROUP + 1,
                                             jj:jj + 1]
                                    idx_ok = ((j0 + j >= rs)
                                              & (j0 + j < re)
                                              & (dj[0, 0] <= maxd))
                                    anyh = (jnp.any(hit, axis=0,
                                                    keepdims=True)
                                            & idx_ok)
                                    occ = jnp.where(valid & anyh, 1.0,
                                                    occ)
                                occ_ref[ci:ci + 1, :] = occ
                    return 0

                jax.lax.fori_loop(w0, w1, win_body, 0)
                return 0

            @pl.when(ty1 >= 0)
            def _(ty0=ty0, ty1=ty1, row_body=row_body):
                jax.lax.fori_loop(ty0, ty1 + 1, row_body, 0)

    return kernel


# ---------------------------------------------------------------- dispatch
def _pad_rows(a, C):
    R = a.shape[0]
    need = C * LANES
    if need != R:
        a = jnp.concatenate([a, jnp.zeros((need - R,), a.dtype)])
    return a.reshape(C, LANES)


def _pad_chains(C):
    """Chains per frame padded to a whole number of (8, 128) tiles."""
    return -(-C // CHAINS) * CHAINS


def binned_closest(scene: SceneData, tabs, bins: PrimaryBins,
                   o, d, time, motion_blur: bool = False,
                   interpret: bool = False, valid=None):
    from distributionraytracer_tpu.ops.intersect import HitResult
    _, _, obj_mats = scene.packed_objects()
    types_present = tuple(sorted(set(scene.static.obj_types)))
    R = o.shape[0]
    C = bins.chain_start.shape[0] - 1
    assert -(-R // LANES) == C, (R, C)
    Cp = _pad_chains(C)
    vd = (jnp.ones((R,), jnp.float32) if valid is None
          else valid.astype(jnp.float32))
    rays = [_pad_rows(x, Cp) for x in
            (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], time,
             vd)]
    kern = _make_binned_closest_kernel(types_present, motion_blur)
    row_spec = pl.BlockSpec((CHAINS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    slab_spec = pl.BlockSpec(memory_space=pltpu.ANY)  # stays in HBM
    fshape = jax.ShapeDtypeStruct((Cp, LANES), jnp.float32)
    t, nx, ny, nz, oid = pl.pallas_call(
        kern,
        grid=(Cp // CHAINS,),
        in_specs=[smem, smem, smem, slab_spec] + [row_spec] * 8,
        out_specs=[row_spec] * 5,
        out_shape=[fshape] * 5,
        scratch_shapes=[
            pltpu.VMEM((2, NODE_SLAB_ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(bins.tile_start, bins.blk_owner, bins.blk_dist, bins.slab, *rays)
    flat = lambda a: a.reshape(-1)[:R]
    t, nx, ny, nz, oid = map(flat, (t, nx, ny, nz, oid))
    gid = oid.astype(jnp.int32)
    hit = gid >= 0
    normal = jnp.stack([nx, ny, nz], axis=-1)
    mat = obj_mats[jnp.maximum(gid, 0)]
    return HitResult(hit=hit, t=jnp.where(hit, t, FLT_MAX),
                     normal=normal, obj_id=gid, mat_id=mat)


def binned_shadow(scene: SceneData, tabs, lbins: LightBins, light_id,
                  o, d, dist, motion_blur: bool = False,
                  interpret: bool = False, valid=None,
                  shadow_mode: str = "bvh", K: int = LIGHT_K):
    """``light_id``: (R,) i32 per-lane light index (constant per chain —
    guaranteed by the integrator's per-light concatenation layout)."""
    types_present = tuple(sorted(set(scene.static.obj_types)))
    R = o.shape[0]
    Cp = _pad_chains(-(-R // LANES))
    vd = (jnp.ones((R,), jnp.float32) if valid is None
          else valid.astype(jnp.float32))
    rays = [_pad_rows(x, Cp) for x in
            (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], dist,
             vd)]
    lid = _pad_rows(light_id.astype(jnp.float32),
                    Cp)[:, 0].astype(jnp.int32)
    kern = _make_binned_shadow_kernel(
        types_present, motion_blur, shadow_mode, K)
    row_spec = pl.BlockSpec((CHAINS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    slab_spec = pl.BlockSpec(memory_space=pltpu.ANY)  # stays in HBM
    occ = pl.pallas_call(
        kern,
        grid=(Cp // CHAINS,),
        in_specs=[smem, smem, smem, slab_spec] + [row_spec] * 8,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((Cp, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((15 * GROUP, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(lbins.tile_start, lbins.frames.reshape(-1), lid, lbins.slab,
      *rays)
    return occ.reshape(-1)[:R] > 0.0


# ----------------------------------------------------------------- routing
def binned_supported(scene: SceneData, cfg) -> bool:
    """Scene-level eligibility (see module docstring):

    - infinite planes break the conservative-superset argument (their
      reference AABBs gate which rays test them, scene.h:116);
    - moving spheres under motion blur escape their static boxes
      (scene.cpp:158-162);
    - DOF primaries do not share the pinhole projection.
    """
    st = scene.static
    types = set(st.obj_types)
    if OBJ_PLANE in types:
        return False
    if cfg.motion_blur:
        return False
    if cfg.dof:
        return False
    return st.n_objects > 0


# Light-frustum shadow binning switch.  Two generations were measured
# against the grouped packet walker's any-hit and both LOST: the
# roll-fetch version at 1.37 s and the dense-slab DMA version at ~0.2 s
# vs the walker's 17-43 ms on dragon's grid-mode shadow batch, and
# 222 ms vs 86 ms on dragon_assignment1's BVH-mode batch (real light
# distances; results bit-identical in both tests).  Root cause: shadow
# spans per (chain, tile-row) are short (~10-30 entries after the
# light-distance cut), so a (120, 128) DMA window mostly streams
# columns the chain does not need, while the walker's any-hit
# early-exits on tight per-packet unions.  Kept for the record and the
# interpret-mode tests; off in production routing.
SHADOW_BINNING = False


def shadow_binning_ok(scene: SceneData, lbins) -> bool:
    """Shadow bins additionally need every light punctual and outside the
    scene bounds (checked at build — lbins is None otherwise), and, for
    the grid's normalized-direction quirk (dist compares against ~1.0,
    main.cpp:411-420), every light at least 1 unit from the scene bounds
    — guaranteed by requiring distance(light, scene box) >= 1 + margin
    at build time (build_light_bins caller)."""
    st = scene.static
    if lbins is None:
        return False
    return not any(st.light_quad)


class BinSet(NamedTuple):
    """Camera-dependent primary bins + scene-static light bins."""

    primary: Optional[PrimaryBins]
    lights: Optional[LightBins]


def leveled_binned_intersectors(scene: SceneData, tabs, bins: BinSet,
                                inner, motion_blur: bool = False,
                                interpret: bool = False,
                                shadow_mode: str = "bvh"):
    """Route the primary closest level to the binned kernel, all shadow
    levels to the light-frustum kernel, everything else to ``inner``
    (the grouped packet walker).  trace_whitted calls closest exactly
    once per tree level in order, so a trace-time counter distinguishes
    the primary call.  Requires cfg.compact_lanes off (the shadow
    light-id layout is positional)."""
    from distributionraytracer_tpu.integrator.whitted import Intersectors
    state = {"calls": 0, "shadow_calls": 0}
    nl = scene.static.n_lights

    def closest(o, d, time, valid=None):
        state["calls"] += 1
        if (state["calls"] == 1 and bins.primary is not None
                and -(-o.shape[0] // LANES)
                == bins.primary.chain_start.shape[0] - 1):
            # the chain CSR addresses the full post-permutation frame —
            # a chunked/padded batch would misalign chains, fall back
            return binned_closest(scene, tabs, bins.primary, o, d, time,
                                  motion_blur, interpret=interpret,
                                  valid=valid)
        return inner.closest(o, d, time, valid=valid)

    def shadow(o, d, dist, exclude_obj, valid=None):
        state["shadow_calls"] += 1
        # bin only the PRIMARY level's shadow query: its origins are
        # pixel-block coherent, so chains cover few light tiles.  Deep
        # tree levels scatter sparse live lanes across every chain and
        # the per-chain tile-bbox union degenerates toward the whole
        # frustum — the packet walker handles those better.
        if bins.lights is None or state["shadow_calls"] > 1:
            return inner.shadow(o, d, dist, exclude_obj, valid=valid)
        R = o.shape[0]
        # the integrator concatenates the per-light queries (whitted.py
        # _shade_node): lane k belongs to light k // (R / n_lights)
        rn = R // max(nl, 1)
        if nl > 1 and rn * nl == R:
            lid = jnp.arange(R, dtype=jnp.int32) // rn
        else:
            lid = jnp.zeros((R,), jnp.int32)
        return binned_shadow(scene, tabs, bins.lights, lid, o, d, dist,
                             motion_blur, interpret=interpret,
                             valid=valid, shadow_mode=shadow_mode)

    return Intersectors(closest, shadow)
