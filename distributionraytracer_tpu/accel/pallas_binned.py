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
CHAINS = 8  # chains per (8, 128) Mosaic tile (walked sequentially)
PAD_PX = 2.0  # conservative screen-projection padding (pixel jitter +1)
# Light-frustum tiles per axis.  Far lights see the scene under a small
# solid angle with deep depth stacking (a 100k-tri mesh piles thousands
# of groups into a coarse tile); 128 keeps hot-tile occupancy near the
# per-ray depth complexity while tile_start (L*K^2) stays SMEM-sized.
LIGHT_K = 128
P_BUCKET = 16384  # candidate-array padding bucket (bounds recompiles)


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
class PrimaryBins(NamedTuple):
    """Per-frame chain candidate CSR (host-built, camera-dependent).

    ``chain_start (C+1,)`` i32, ``cand (P,)`` i32 group-column ids into
    ``tabs.obj_g``, ``cand_dist (P,)`` f32 conservative eye->group entry
    distances; ``cand`` is per-chain sorted ascending by ``cand_dist``
    (front-to-back early termination)."""

    chain_start: jnp.ndarray
    cand: jnp.ndarray
    cand_dist: jnp.ndarray


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


def build_primary_bins(scene: SceneData, gbox: np.ndarray,
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
    eye, u, v, n, pd, w, h = _host_camera(scene)

    live = gbox[:, 6] > 0
    gids = np.nonzero(live)[0]
    if gids.size == 0:
        return PrimaryBins(
            chain_start=jnp.zeros((C + 1,), jnp.int32),
            cand=jnp.zeros((P_BUCKET,), jnp.int32),
            cand_dist=jnp.full((P_BUCKET,), FLT_MAX, jnp.float32))
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
    chain_sorted = chain[order]
    chain_start = np.searchsorted(
        chain_sorted, np.arange(C + 1)).astype(np.int32)

    P = max(-(-total // P_BUCKET) * P_BUCKET, P_BUCKET)
    cand_p = np.zeros((P,), np.int32)
    cand_p[:total] = cand
    dist_p = np.full((P,), FLT_MAX, np.float32)
    dist_p[:total] = cdist
    return PrimaryBins(chain_start=jnp.asarray(chain_start),
                       cand=jnp.asarray(cand_p),
                       cand_dist=jnp.asarray(dist_p))


# --------------------------------------------------------------- light bins
class LightBins(NamedTuple):
    """Per-scene occluder binning for punctual lights (host-built once).

    A K x K tile grid over each light's scene-bounding frustum (axis =
    light->scene-center; a shadow ray from a point inside the scene
    bounds always maps into it).  ``tile_start`` (L*K*K + 1,) i32 CSR
    with x-fastest tile order so one (light, row, tx0..tx1) span is a
    contiguous entry range; ``entries`` (Q,) i32 group ids; ``frames``
    (L, 16) f32 rows [Lpos3, u3, v3, w3, sx, sy, pad2]."""

    tile_start: jnp.ndarray
    entries: jnp.ndarray
    frames: jnp.ndarray


def build_light_bins(scene: SceneData, gbox: np.ndarray,
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
        order = np.argsort(tile, kind="stable")
        ent = gids[rep[order]].astype(np.int32)
        tstart = np.searchsorted(tile[order],
                                 np.arange(K * K)).astype(np.int64)
        all_start.append(tstart)
        all_entries.append(ent)

    # concatenate per-light CSRs with running offsets; final sentinel
    offs = np.cumsum([0] + [e.size for e in all_entries])
    start = np.concatenate(
        [all_start[i] + offs[i] for i in range(L)] + [offs[-1:]])
    entries = np.concatenate(all_entries) if offs[-1] else np.zeros(
        (1,), np.int32)
    # entries live in VMEM as (Q/128, 128) rows (they can exceed the
    # ~1 MB SMEM budget on mesh scenes); tile_start stays SMEM
    Q = max(-(-entries.size // P_BUCKET) * P_BUCKET, P_BUCKET)
    ent_p = np.zeros((Q,), np.int32)
    ent_p[:entries.size] = entries
    return LightBins(tile_start=jnp.asarray(start.astype(np.int32)),
                     entries=jnp.asarray(ent_p.reshape(-1, LANES)),
                     frames=jnp.asarray(frames))


# ------------------------------------------------------------------ kernels
def _fetch_col(obj_ref, og):
    """Dynamic 8-object column fetch from the grouped object table
    (same aligned-block-load + lane-roll as pallas_packet)."""
    obase = pl.multiple_of((og // LANES) * LANES, LANES)
    oblk = obj_ref[:, pl.ds(obase, LANES)]
    ocol = pltpu.roll(oblk, shift=LANES - (og % LANES), axis=1)
    return lambda f: ocol[f * GROUP:(f + 1) * GROUP, 0:1], ocol


def _make_binned_closest_kernel(types_present, motion_blur):
    from distributionraytracer_tpu.accel.pallas_packet import (
        _prim_test_grouped,
    )

    def kernel(cs_ref, cand_ref, cdist_ref, obj_ref,
               ox, oy, oz, dx, dy, dz, tm, vd,
               t_ref, nx_ref, ny_ref, nz_ref, oid_ref):
        # Mosaic blocks are (8, 128): each invocation walks its tile's 8
        # chains sequentially (sublane row ci = chain 8*i + ci)
        i = pl.program_id(0)
        shape = (GROUP, LANES)
        idx8 = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0)
        pmax = cand_ref.shape[0] - 1

        t_ref[:] = jnp.full((CHAINS, LANES), FLT_MAX, jnp.float32)
        nx_ref[:] = jnp.zeros((CHAINS, LANES), jnp.float32)
        ny_ref[:] = nx_ref[:]
        nz_ref[:] = nx_ref[:]
        oid_ref[:] = jnp.full((CHAINS, LANES), -1.0, jnp.float32)

        for ci in range(CHAINS):
            o_b = tuple(jnp.broadcast_to(r[ci:ci + 1, :], shape)
                        for r in (ox, oy, oz))
            d_b = tuple(jnp.broadcast_to(r[ci:ci + 1, :], shape)
                        for r in (dx, dy, dz))
            inv_b = tuple(1.0 / dk for dk in d_b)
            time_b = jnp.broadcast_to(tm[ci:ci + 1, :], shape)
            valid = vd[ci:ci + 1, :] > 0.0
            c = i * CHAINS + ci
            s = cs_ref[c]
            e = cs_ref[c + 1]

            def body(j, ci=ci, o_b=o_b, d_b=d_b, inv_b=inv_b,
                     time_b=time_b, valid=valid, e=e):
                fldo, ocol = _fetch_col(obj_ref, cand_ref[j])
                t_c, n_c = _prim_test_grouped(
                    fldo, o_b, d_b, inv_b, time_b, types_present,
                    motion_blur)
                # per-ray winner among the 8; lowest row wins exact
                # ties (DFS object order in a group, as pallas_packet)
                tmin_c = jnp.min(t_c, axis=0, keepdims=True)
                first_r = jnp.min(jnp.where(t_c == tmin_c, idx8, GROUP),
                                  axis=0, keepdims=True)
                onehot = idx8 == first_r
                pick = lambda a: jnp.max(jnp.where(onehot, a, -FLT_MAX),
                                         axis=0, keepdims=True)
                gidv = ocol[13 * GROUP:14 * GROUP, 0:1]
                better = valid & (tmin_c < t_ref[ci:ci + 1, :])
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
                # front-to-back termination: candidates are dist-sorted
                # and primary origins sit at the eye (t == euclidean
                # distance), so once every live lane beats the next
                # candidate's entry distance no later candidate can win
                worst = jnp.max(jnp.where(
                    valid, t_ref[ci:ci + 1, :], -FLT_MAX))
                done = worst < cdist_ref[jnp.minimum(j + 1, pmax)]
                return jnp.where(done, e, j + 1)

            jax.lax.while_loop(lambda j, e=e: j < e, body, s)

    return kernel


def _make_binned_shadow_kernel(types_present, motion_blur, shadow_mode,
                               n_lights, K):
    from distributionraytracer_tpu.accel.pallas_packet import (
        _prim_test_grouped,
    )

    def kernel(ts_ref, ent_ref, fr_ref, lid_ref, obj_ref,
               ox, oy, oz, dx, dy, dz, dist, vd, occ_ref):
        i = pl.program_id(0)
        shape = (GROUP, LANES)
        occ_ref[:] = jnp.zeros((CHAINS, LANES), jnp.float32)
        fK = np.float32(K)

        for ci in range(CHAINS):
            o_r = (ox[ci:ci + 1, :], oy[ci:ci + 1, :], oz[ci:ci + 1, :])
            o_b = tuple(jnp.broadcast_to(r, shape) for r in o_r)
            d_b = tuple(jnp.broadcast_to(r[ci:ci + 1, :], shape)
                        for r in (dx, dy, dz))
            inv_b = tuple(1.0 / dk for dk in d_b)
            time_b = jnp.zeros(shape, jnp.float32)  # shadow: time = 0
            sd = dist[ci:ci + 1, :]
            valid = vd[ci:ci + 1, :] > 0.0

            c = i * CHAINS + ci
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
            # chain tile bbox over live lanes (dead lanes excluded)
            big = jnp.int32(K)
            tx0 = jnp.min(jnp.where(valid, tx, big))
            tx1 = jnp.max(jnp.where(valid, tx, -1))
            ty0 = jnp.min(jnp.where(valid, ty, big))
            ty1 = jnp.max(jnp.where(valid, ty, -1))
            any_live = tx1 >= 0
            tbase = li * (K * K)

            def test_col(og, occ, o_b=o_b, d_b=d_b, inv_b=inv_b,
                         time_b=time_b, sd=sd, valid=valid):
                fldo, _ = _fetch_col(obj_ref, og)
                t_c, _ = _prim_test_grouped(
                    fldo, o_b, d_b, inv_b, time_b, types_present,
                    motion_blur)
                if shadow_mode == "grid":
                    hit = t_c < sd  # strict (grid.cpp:330-352)
                else:
                    hit = t_c <= sd + EPSILON  # bvh.cpp:376
                anyh = jnp.any(hit, axis=0, keepdims=True)
                return jnp.where(valid & anyh, 1.0, occ)

            @pl.when(any_live)
            def _(ci=ci, tbase=tbase, tx0=tx0, tx1=tx1, ty0=ty0,
                  ty1=ty1, valid=valid, test_col=test_col):
                def row_body(ty_j, _):
                    rs = ts_ref[tbase + ty_j * K + tx0]
                    re = ts_ref[tbase + ty_j * K + tx1 + 1]

                    def col_body(j, re=re):
                        # scalar id from the VMEM-resident entry table:
                        # dynamic-sublane row load + lane roll (Mosaic
                        # has no dynamic-lane scalar indexing)
                        erow = ent_ref[pl.ds(j // LANES, 1), :]
                        og = pltpu.roll(
                            erow, shift=LANES - (j % LANES), axis=1)[0, 0]
                        occ = test_col(og, occ_ref[ci:ci + 1, :])
                        occ_ref[ci:ci + 1, :] = occ
                        # early out once every live lane is occluded
                        done = ~jnp.any(valid & (occ == 0.0))
                        return jnp.where(done, re, j + 1)

                    jax.lax.while_loop(lambda j, re=re: j < re,
                                       col_body, rs)
                    return 0

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
    cs = bins.chain_start
    if Cp != C:  # padded chains stream nothing (empty CSR tail)
        cs = jnp.concatenate(
            [cs, jnp.broadcast_to(cs[-1:], (Cp - C,))])
    kern = _make_binned_closest_kernel(types_present, motion_blur)
    row_spec = pl.BlockSpec((CHAINS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    obj_spec = pl.BlockSpec(tabs.obj_g.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    fshape = jax.ShapeDtypeStruct((Cp, LANES), jnp.float32)
    t, nx, ny, nz, oid = pl.pallas_call(
        kern,
        grid=(Cp // CHAINS,),
        in_specs=[smem, smem, smem, obj_spec] + [row_spec] * 8,
        out_specs=[row_spec] * 5,
        out_shape=[fshape] * 5,
        interpret=interpret,
    )(cs, bins.cand, bins.cand_dist, tabs.obj_g, *rays)
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
        types_present, motion_blur, shadow_mode,
        scene.static.n_lights, K)
    row_spec = pl.BlockSpec((CHAINS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    obj_spec = pl.BlockSpec(tabs.obj_g.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    ent_spec = pl.BlockSpec(lbins.entries.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        kern,
        grid=(Cp // CHAINS,),
        in_specs=[smem, ent_spec, smem, smem, obj_spec] + [row_spec] * 8,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((Cp, LANES), jnp.float32),
        interpret=interpret,
    )(lbins.tile_start, lbins.entries,
      lbins.frames.reshape(-1), lid, tabs.obj_g, *rays)
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
