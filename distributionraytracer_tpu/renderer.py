"""High-level renderer facade: the TPU equivalent of init_scene + renderScene.

Builds the scene's acceleration structure host-side once (grid.cpp:30-97 /
bvh.cpp:27-227 equivalents), keeps the tables HBM-resident, and exposes fully
jitted render entry points.  Accel tables cross the jit boundary as pytree
*arguments* so they are never embedded as device constants (see
tests/test_tracing_hygiene.py).

Usage:
    r = Renderer(load_p3f("scene.p3f"))
    img = r.render(jax.random.PRNGKey(0))        # batch mode (Zone B)
    state = r.progressive_init()
    state = r.progressive_step(state, key)       # Zone A frames
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from distributionraytracer_tpu.accel.bvh import (
    ThreadedBVH, build_bvh, make_threaded_intersectors, thread_bvh,
)
from distributionraytracer_tpu.accel.grid import (
    GridArrays, build_grid, make_grid_intersectors,
)
from distributionraytracer_tpu.config import RenderConfig
from distributionraytracer_tpu.integrator.render import (
    SampleSet, default_config, make_samples, render_from_samples,
)
from distributionraytracer_tpu.scene.types import (
    ACCEL_BVH, ACCEL_GRID, ACCEL_NONE, SceneData,
)


@partial(jax.jit, static_argnums=(1, 3))
def _render_none(scene, cfg, samples, return_rays=False):
    return render_from_samples(scene, cfg, samples, return_rays=return_rays)


@partial(jax.jit, static_argnums=(1, 6, 7))
def _render_grid(scene, cfg, grid: GridArrays, pg, samples, row_offset,
                 unroll, return_rays=False, bins=None):
    if pg is not None and _use_pallas_accel(cfg):
        from distributionraytracer_tpu.accel.pallas_grid import (
            make_brute_grid_intersectors, make_pallas_grid_intersectors,
        )
        interp = jax.default_backend() == "cpu"
        if bins is not None:
            inter = make_pallas_grid_intersectors(
                scene, pg, cfg.motion_blur, interpret=interp, bins=bins)
            cfg = cfg.replace(accel_tile_rays=1 << 30)
            return render_from_samples(scene, cfg, samples,
                                       row_offset=row_offset, inter=inter,
                                       return_rays=return_rays)
        if _use_cost_brute(scene, cfg):
            # NOTE: the fused level megakernel has a grid mode
            # (render_from_samples(fused_grid=...)); measured 10% slower
            # than the staged cost-brute here because these scenes are
            # dominated by the per-level skybox texel gather, which both
            # paths pay in XLA.  Revisit when the gather is solved.
            inter = make_brute_grid_intersectors(
                scene, pg, cfg.motion_blur, interpret=interp)
        else:
            inter = make_pallas_grid_intersectors(
                scene, pg, cfg.motion_blur, interpret=interp)
        cfg = cfg.replace(accel_tile_rays=cfg.tile_rays)
    else:
        inter = make_grid_intersectors(scene, grid, cfg.motion_blur,
                                       unroll=unroll)
    return render_from_samples(scene, cfg, samples, row_offset=row_offset,
                               inter=inter, return_rays=return_rays)


def _use_pallas_accel(cfg) -> bool:
    backend = jax.default_backend()
    if cfg.accel_backend == "xla":
        return False
    if cfg.accel_backend == "pallas":
        return True
    return backend != "cpu"


def _use_cost_brute(scene, cfg) -> bool:
    """Cost-based backend override (RenderConfig.accel_cost_threshold):
    small scenes run the linear brute megakernel with accel-matched
    gates — on TPU it beats tree traversal below ~1k objects.  Refused
    when the accel's *tested set* is observable: infinite planes (their
    default/quantized boxes gate which rays ever test them,
    scene.h:116 / grid.cpp:80-85) or moving spheres under motion blur
    (hits escape the static boxes, scene.cpp:158-162)."""
    from distributionraytracer_tpu.ops import pallas_intersect as _pi
    from distributionraytracer_tpu.scene.types import OBJ_PLANE, OBJ_SPHERE
    st = scene.static
    if not cfg.accel_cost_threshold:
        return False
    if st.n_objects > cfg.accel_cost_threshold:
        return False
    types = set(st.obj_types)
    if OBJ_PLANE in types:
        return False
    if cfg.motion_blur and OBJ_SPHERE in types:
        return False
    return _pi.pallas_supported(scene)


def _brute_bvh_intersectors(scene, cfg, interpret):
    """Cost-selected brute backend for small BVH scenes: linear
    megakernel closest (no gates — BVH traversal tests a superset-safe
    set) + the BVH any-hit compare (t <= dist + EPSILON, no
    self-exclusion, bvh.cpp:376)."""
    from distributionraytracer_tpu.integrator.whitted import Intersectors
    from distributionraytracer_tpu.ops import pallas_intersect as _pi

    def closest(o, d, time, valid=None):
        return _pi.closest_hit_pallas(scene, o, d, time, cfg.motion_blur,
                                      interpret=interpret, valid=valid)

    def shadow(o, d, dist, exclude_obj, valid=None):
        return _pi.any_hit_pallas(scene, o, d, dist, None,
                                  cfg.motion_blur, interpret=interpret,
                                  mode="bvh", valid=valid)

    return Intersectors(closest, shadow)


def packet_intersectors(scene, tabs, motion_blur, interpret,
                        shadow_mode="bvh"):
    """Intersectors for whichever packet-kernel family packed ``tabs``
    (GroupedBVH -> pallas_packet, PallasBVH -> pallas_bvh legacy)."""
    from distributionraytracer_tpu.accel.pallas_packet import (
        GroupedBVH, make_grouped_intersectors,
    )
    if isinstance(tabs, GroupedBVH):
        return make_grouped_intersectors(scene, tabs, motion_blur,
                                         interpret=interpret,
                                         shadow_mode=shadow_mode)
    from distributionraytracer_tpu.accel.pallas_bvh import (
        make_pallas_bvh_intersectors,
    )
    return make_pallas_bvh_intersectors(scene, tabs, motion_blur,
                                        interpret=interpret,
                                        shadow_mode=shadow_mode)


@partial(jax.jit, static_argnums=(1, 6))
def _render_bvh(scene, cfg, tbvh: ThreadedBVH, tabs, samples, row_offset,
                return_rays=False, bins=None):
    if tabs is not None and _use_pallas_accel(cfg):
        interp = jax.default_backend() == "cpu"
        if _use_cost_brute(scene, cfg):
            inter = _brute_bvh_intersectors(scene, cfg, interpret=interp)
        else:
            inter = packet_intersectors(
                scene, tabs, cfg.motion_blur, interpret=interp)
            if bins is not None:
                from distributionraytracer_tpu.accel.pallas_binned import (
                    leveled_binned_intersectors,
                )
                inter = leveled_binned_intersectors(
                    scene, tabs, bins, inter, cfg.motion_blur,
                    interpret=interp, shadow_mode="bvh")
                cfg = cfg.replace(accel_tile_rays=1 << 30)
        # the packet kernel has no gather-vs-lanes pathology: full-size
        # wavefronts amortize dispatch overhead (accel_tile_rays guards the
        # *XLA* traversal, config.py)
        if bins is None:
            cfg = cfg.replace(accel_tile_rays=cfg.tile_rays)
    else:
        inter = make_threaded_intersectors(scene, tbvh, cfg.motion_blur)
    return render_from_samples(scene, cfg, samples, row_offset=row_offset,
                               inter=inter, return_rays=return_rays)


class AccelBuild:
    """Host-built accel tables for one scene (plain attribute holder, not a
    pytree).  ``xla`` / ``pallas`` are the pytrees to thread through jit /
    shard_map boundaries; ``grid_unroll`` is the static unroll factor."""

    __slots__ = ("kind", "xla", "pallas", "grid_unroll",
                 "built_motion_blur")

    def __init__(self, kind, xla=None, pallas=None, grid_unroll=None,
                 built_motion_blur=False):
        self.kind = kind
        self.xla = xla
        self.pallas = pallas
        self.grid_unroll = grid_unroll
        # the motion_blur flag the tables were built under: grid-emulation
        # sphere AABBs are only tight when it was False (ADVICE r3) —
        # consumers must render with a matching RenderConfig.motion_blur
        self.built_motion_blur = built_motion_blur


def build_accel(scene: SceneData, verbose: bool = False,
                motion_blur: bool = False,
                packet_kernel: str = "grouped") -> AccelBuild:
    """Build the scene's accel structure host-side (grid.cpp:30-97 /
    bvh.cpp:27-227 equivalents) and device_put the tables once.

    Returns an AccelBuild whose ``xla`` pytree (GridArrays / ThreadedBVH) is
    the differentiable traversal and whose ``pallas`` pytree (PallasGrid /
    GroupedBVH / PallasBVH, may be None if not encodable) feeds the packet
    kernels.  ``motion_blur`` must match the render config — it decides
    which objects the leaf collapse must protect (bvh.protect_mask) and
    whether the grid emulation may keep sphere AABBs tight
    (accel.pallas_grid.emulation_bboxes).  ``packet_kernel`` selects the
    kernel family the tables are packed for (RenderConfig.packet_kernel).
    """
    st = scene.static
    out = AccelBuild(st.accel, built_motion_blur=motion_blur)
    t0 = time.perf_counter()
    if st.accel == ACCEL_GRID:
        from distributionraytracer_tpu.accel.grid import _pick_unroll
        from distributionraytracer_tpu.accel.pallas_grid import pack_grid
        grid = build_grid(scene)
        out.grid_unroll = _pick_unroll(grid.cell_start)
        pg = pack_grid(scene, grid, motion_blur,
                       packet_kernel=packet_kernel)
        out.pallas = jax.device_put(pg) if pg is not None else None
        out.xla = jax.device_put(grid)
        if verbose:
            n = out.xla.ncells
            print(f"GRID: total cells = {int(n[0]*n[1]*n[2])}, "
                  f"total objects = {st.n_objects}, ResX = {int(n[0])}, "
                  f"ResY = {int(n[1])}, ResZ = {int(n[2])}")
    elif st.accel == ACCEL_BVH:
        # build + DFS-renumber host-side (all numpy), one device_put;
        # traversal uses the threaded (stackless) tables.  The packet
        # kernels get a leaf-collapsed twin of the tree (coarse leaves
        # amortize the per-node fetch; bvh.collapse_leaves, winners
        # identical; objects whose hits can escape their AABB stay in
        # their own leaves — bvh.protect_mask).
        from distributionraytracer_tpu.accel.bvh import (
            collapse_leaves, protect_mask,
        )
        tb = thread_bvh(build_bvh(scene))
        prot = protect_mask(scene, motion_blur)
        tabs = None
        if packet_kernel == "grouped":
            from distributionraytracer_tpu.accel.pallas_packet import (
                GROUPED_LEAF, pack_grouped,
            )
            tabs = pack_grouped(
                scene, collapse_leaves(tb, GROUPED_LEAF, protect=prot))
        if tabs is None:
            from distributionraytracer_tpu.accel.pallas_bvh import (
                PACKET_LEAF, pack_threaded,
            )
            tabs = pack_threaded(
                scene, collapse_leaves(tb, PACKET_LEAF, protect=prot))
        out.xla = jax.device_put(tb)
        out.pallas = jax.device_put(tabs) if tabs is not None else None
        if verbose:
            print(f"BVH: {out.xla.node_box.shape[0]} nodes over "
                  f"{st.n_objects} objects (threaded"
                  f"{', pallas tables' if tabs is not None else ''})")
    if verbose and st.accel != ACCEL_NONE:
        print(f"accel build: {time.perf_counter() - t0:.2f}s")
    return out


class Renderer:
    def __init__(self, scene: SceneData, cfg: Optional[RenderConfig] = None,
                 verbose: bool = False):
        self.cfg = cfg if cfg is not None else default_config(scene)
        self.scene = scene.device_put()
        ab = build_accel(scene, verbose=verbose,
                         motion_blur=self.cfg.motion_blur,
                         packet_kernel=self.cfg.packet_kernel)
        assert ab.built_motion_blur == self.cfg.motion_blur
        self.accel = ab.kind
        self.grid = ab.xla if ab.kind == ACCEL_GRID else None
        self.grid_pallas = ab.pallas if ab.kind == ACCEL_GRID else None
        self.grid_unroll = ab.grid_unroll
        self.bvh = ab.xla if ab.kind == ACCEL_BVH else None
        self.bvh_tabs = ab.pallas if ab.kind == ACCEL_BVH else None
        self._init_binning(scene)

    def _init_binning(self, scene):
        """Precompute the camera-independent half of the binned
        dense-streaming route (accel.pallas_binned): group AABBs and the
        per-light frustum bins.  Primary bins are camera-dependent and
        built lazily per render (cached by camera)."""
        self._gbox = None
        self._light_bins = None
        self._primary_cache = {}
        if self.cfg.compact_lanes or self.cfg.soft_shadow > 0.0:
            return  # binned routing requires the positional lane layout
        from distributionraytracer_tpu.accel import pallas_binned as _pb
        from distributionraytracer_tpu.accel.pallas_packet import GroupedBVH
        tabs = self.bvh_tabs
        if self.accel == ACCEL_GRID and self.grid_pallas is not None:
            tabs = self.grid_pallas.tabs
        if not isinstance(tabs, GroupedBVH):
            return
        if not _pb.binned_supported(scene, self.cfg):
            return
        self._bins_tabs = tabs
        self._gbox = _pb.group_boxes(scene, tabs)
        if _pb.SHADOW_BINNING:
            lb = _pb.build_light_bins(scene, self._gbox, tabs)
            if lb is not None and _pb.shadow_binning_ok(scene, lb):
                self._light_bins = jax.device_put(lb)

    def _bins_for(self, H, W, S):
        """BinSet for this frame's camera/shape, or None (packet path)."""
        if self._gbox is None:
            return None
        from distributionraytracer_tpu.accel import pallas_binned as _pb
        sc = self.scene
        key = (H, W, S,
               tuple(np.asarray(jax.device_get(sc.cam_eye)).tolist()),
               tuple(np.asarray(jax.device_get(sc.cam_at)).tolist()),
               tuple(np.asarray(jax.device_get(sc.cam_up)).tolist()))
        pb = self._primary_cache.get(key)
        if pb is None:
            pb = _pb.build_primary_bins(sc, self._gbox, self._bins_tabs,
                                        H, W, S)
            if pb is None:
                return None
            pb = jax.device_put(pb)
            self._primary_cache.clear()  # one camera's bins at a time
            self._primary_cache[key] = pb
        return _pb.BinSet(primary=pb, lights=self._light_bins)

    def executed_backend(self) -> str:
        """The backend the render path will actually execute for this
        scene+config — mirrors the routing in _render_none/_render_grid/
        _render_bvh exactly (BENCH's ``backend`` column; VERDICT r4 weak
        #4: the declared accel misreported cost-brute scenes)."""
        from distributionraytracer_tpu.accel.pallas_packet import GroupedBVH
        from distributionraytracer_tpu.ops import pallas_whitted as _pw
        cfg = self.cfg
        if self.accel == ACCEL_NONE:
            use_pallas = cfg.pallas != "off" and (
                cfg.pallas == "on" or jax.default_backend() != "cpu")
            if use_pallas and _pw.fused_supported(self.scene, cfg):
                return "fused-level"
            return "brute-megakernel" if use_pallas else "brute-xla"
        binned = "" if self._gbox is None else (
            "binned+" if self._light_bins is not None
            else "binned-primary+")
        if self.accel == ACCEL_GRID:
            if self.grid_pallas is not None and _use_pallas_accel(cfg):
                return ("cost-brute" if _use_cost_brute(self.scene, cfg)
                        else binned + "grid-packet")
            return "grid-xla"
        if self.bvh_tabs is not None and _use_pallas_accel(cfg):
            if _use_cost_brute(self.scene, cfg):
                return "cost-brute"
            return binned + (
                "grouped-packet" if isinstance(self.bvh_tabs, GroupedBVH)
                else "legacy-packet")
        return "bvh-xla"

    # ------------------------------------------------------------- batch
    def _render_chunk(self, samples: SampleSet, row_offset,
                      return_rays=False, bins=None):
        if self.accel == ACCEL_GRID:
            return _render_grid(self.scene, self.cfg, self.grid,
                                self.grid_pallas, samples, row_offset,
                                self.grid_unroll, return_rays, bins)
        return _render_bvh(self.scene, self.cfg, self.bvh, self.bvh_tabs,
                           samples, row_offset, return_rays, bins)

    def render_with_samples(self, samples: SampleSet, return_rays=False):
        if self.accel == ACCEL_NONE:
            return _render_none(self.scene, self.cfg, samples, return_rays)
        H, W, S = samples.time.shape
        cfg = self.cfg
        bins = None
        if ((self.bvh_tabs is not None or self.grid_pallas is not None)
                and _use_pallas_accel(cfg)):
            # packet kernel renders orders of magnitude faster than the XLA
            # traversal; whole frames stay far under the platform watchdog
            rows = H
            if not _use_cost_brute(self.scene, cfg):
                bins = self._bins_for(H, W, S)
        else:
            rows = (max(1, cfg.accel_dispatch_rays // (W * S))
                    if cfg.accel_dispatch_rays else H)
        if rows >= H:
            return self._render_chunk(samples, jnp.zeros((), jnp.float32),
                                      return_rays, bins=bins)
        # host-chunked dispatch: every device execution stays under the
        # remote platform's watchdog; one compile reused for all chunks
        # (row_offset is a traced scalar, the last chunk is padded)
        pad = (-H) % rows
        if pad:
            f = lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
            samples = SampleSet(f(samples.pixel), f(samples.light),
                                f(samples.lens), f(samples.time))
        outs, counts = [], []
        for off in range(0, H + pad, rows):
            sl = lambda a: jax.lax.slice_in_dim(a, off, off + rows, axis=0)
            chunk = SampleSet(sl(samples.pixel), sl(samples.light),
                              sl(samples.lens), sl(samples.time))
            out = self._render_chunk(chunk, jnp.float32(off), return_rays)
            if return_rays:
                out, nr = out
                counts.append(nr)
            outs.append(out)
        img = jnp.concatenate(outs, axis=0)[:H]
        if return_rays:
            return img, sum(counts)
        return img

    def render(self, key=None, return_rays=False):
        """Full Zone-B render (main.cpp:602-737): returns (H, W, 3) f32.

        ``return_rays=True`` also returns the exact traced-ray count
        (primary tree nodes + shadow rays, from the integrator's per-level
        counters) — the denominator bench.py uses for rays/s."""
        if key is None:
            key = jax.random.PRNGKey(0)
        samples = make_samples(self.scene, self.cfg, key)
        return self.render_with_samples(samples, return_rays=return_rays)

    # ------------------------------------------------------ progressive
    def progressive_init(self):
        from distributionraytracer_tpu.integrator.render import (
            progressive_init,
        )
        return progressive_init(self.scene)

    def progressive_step(self, state, key):
        """One Zone-A frame (main.cpp:536-599) under the scene's accel."""
        import numpy as np
        from distributionraytracer_tpu.ops import sampling
        st = self.scene.static
        H, W = st.res_y, st.res_x
        k1, k2, k3, k4 = jax.random.split(key, 4)
        samples = SampleSet(
            pixel=jax.random.uniform(k1, (H, W, 1, 2)),
            light=jax.random.uniform(k2, (H, W, 1, 2)),
            lens=sampling.unit_disk(k3, (H, W, 1)),
            time=(jax.random.uniform(k4, (H, W, 1))
                  if self.cfg.motion_blur
                  else np.zeros((H, W, 1), np.float32)))
        frame = self.render_with_samples(samples)
        mean, count = state
        new_count = jnp.minimum(count + 1.0, float(self.cfg.max_samples))
        upd = count < float(self.cfg.max_samples)
        mean = jnp.where(upd, mean + (frame - mean) / new_count, mean)
        return (mean, jnp.where(upd, new_count, count))

    # ------------------------------------------------------- checkpoint
    def save_progressive(self, path: str, state):
        """Checkpoint the (mean, count) accumulator — the resumable analog
        of the reference's colors[]/FrameCount buffer (main.cpp:574-586)."""
        import numpy as np
        mean, count = state
        np.savez(path, mean=np.asarray(mean), count=np.asarray(count))

    def load_progressive(self, path: str):
        import numpy as np
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        return (jnp.asarray(z["mean"]), jnp.asarray(z["count"]))
