"""Render configuration.

The reference drives these knobs from compile-time flags and the P3F scene
file (main.cpp:29-39, scene.cpp:489-693).  Here they live in one dataclass.
All fields are static (hashable) so the config can be closed over by ``jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static knobs of a render.

    Mirrors the reference's flag set:

    - ``max_depth``:      ``#define MAX_DEPTH 4`` (main.cpp:34).
    - ``spp``:            samples per pixel; ``0`` selects the no-AA branch
                          (main.cpp:674-703), ``>0`` the stratified-jitter AA
                          branch (main.cpp:618-671).
    - ``dof``:            thin-lens lens sampling (main.cpp:655-660).
    - ``motion_blur``:    per-sample time jitter + moving sphere centers
                          (main.cpp:549-551, scene.cpp:158-162).
    - ``max_samples``:    progressive-mode cap, ``MAX_SAMPLES`` (main.cpp:39).
    - ``shadow_mode``:    'reference' reproduces the reference's per-accel
                          shadow-distance conventions, including the quirk
                          that NONE and GRID compare against a normalized
                          direction (length 1.0, main.cpp:411-440); 'correct'
                          uses the true light distance everywhere.
    - ``tile_rays``:      wavefront tile size (pixel-samples per kernel
                          launch).  Purely a performance knob.
    """

    max_depth: int = 4
    spp: int = 0
    # Drop statically-dead ray-tree subtrees (no T==1 material => no
    # refraction subtree; no Ks>0 material => no reflection subtree).  Bit
    # identical to the full tree because the per-lane spawn masks are implied
    # by the same material facts; disable when *training* materials across
    # the T==1 / Ks>0 boundaries (scene.types.SceneStatic.any_refr).
    static_prune: bool = True
    # Brute-force intersection backend: 'auto' uses the Pallas megakernel
    # (ops.pallas_intersect) on TPU backends and the jnp path on CPU; 'on'
    # forces the kernel (interpret-mode on CPU); 'off' forces the jnp path.
    # The kernel is forward-only — training paths force 'off'.
    pallas: str = "auto"  # 'auto' | 'on' | 'off'
    # Accelerated-traversal backend: 'auto' uses the Pallas packet kernels
    # (accel/pallas_bvh.py) on TPU backends when the scene's tables are
    # encodable, the XLA batched traversals otherwise; 'pallas' forces the
    # kernels (interpret-mode off-TPU, for tests); 'xla' forces the pure-XLA
    # paths (the differentiable ones — training forces 'xla').
    accel_backend: str = "auto"  # 'auto' | 'pallas' | 'xla'
    # Which Pallas packet kernel family the accel path uses: 'grouped'
    # (accel/pallas_packet.py — 8 interleaved 128-ray walks, 8-node /
    # 8-object fetches; measured ~7x the legacy kernel on the dragon) or
    # 'legacy' (accel/pallas_bvh.py — one 1024-ray union walk, kept as
    # the fallback for trees the grouped packer cannot encode and for
    # A/B measurement).
    packet_kernel: str = "grouped"  # 'grouped' | 'legacy'
    # Cost-based backend selection (scene.cpp:489 treats the P3F accel
    # line as scene config, not an execution mandate): on TPU a linear
    # brute megakernel beats tree traversal below ~1k objects (measured:
    # blueDiamond, 178 objects, 1.1 -> ~10 Mrays/s), so accel scenes with
    # n_objects <= this threshold run the brute kernel with accel-matched
    # shadow/gate semantics (identical hit records; tie order within the
    # measure-zero budget).  0 disables the override.  Scenes with
    # infinite planes or moving spheres keep the traversal (their tested
    # set is observable — see bvh.protect_mask).
    accel_cost_threshold: int = 1024
    dof: bool = False
    motion_blur: bool = False
    # Discontinuity-aware shadow gradients (SURVEY §7 step 9): 0 keeps the
    # reference's hard boolean shadow gate (main.cpp:383-451); > 0 replaces
    # it with a sigmoid-relaxed visibility of that width (world units) so
    # expected pixel gradients at shadow edges match finite differences
    # (ops.intersect.soft_visibility).  Opt-in, training-time only: the
    # forward image softens within ~tau of shadow boundaries.
    soft_shadow: float = 0.0
    # Primary-silhouette relaxation width (world units): > 0 blends each
    # pixel with its "winner removed" counterfactual by the winner's smooth
    # coverage (integrator.whitted.trace_whitted_soft), so expected
    # gradients at hit-vs-miss silhouette edges match finite differences.
    # Training-time opt-in, ~2x forward cost; brute-force path only.
    soft_silhouette: float = 0.0
    # Live-lane compaction for accel-traversal queries: stable-partition
    # every masked closest/shadow query so live lanes come first and
    # all-dead packets exit their traversal immediately
    # (integrator.whitted.compacting_intersectors).  Output-identical, but
    # OFF by default: the partition costs ~14 R-lane XLA gathers per query,
    # and on TPU those lower to near-serial loops — measured on
    # dragon_assignment1 512x512 (glass dragon, most deep-tree lanes live):
    # 2.08 s -> 2.82 s/frame.  Worth enabling only for scenes whose deep
    # levels are mostly dead (low specular/transmissive coverage).
    compact_lanes: bool = False
    max_samples: int = 10000
    shadow_mode: str = "reference"  # 'reference' | 'correct'
    tile_rays: int = 65536
    # Tile size for grid/BVH traversal loops.  XLA's gather lowering on TPU
    # degrades super-linearly with batched-while state size (measured:
    # 16k lanes -> 0.35 Mrays/s, 262k lanes -> 0.03 Mrays/s on the dragon
    # BVH), so accelerated scenes run smaller wavefronts than brute force.
    accel_tile_rays: int = 16384
    # Max primary pixel-samples per *device dispatch* for accelerated
    # scenes (0 = whole frame in one dispatch).  The remote-TPU platform
    # kills any single execution that runs longer than its watchdog
    # (~60-100s); heavy grid scenes (assignment1: 100k tris in a 178x26x178
    # grid) exceed that at full resolution, so the Renderer splits the frame
    # into row chunks dispatched from the host.  Purely a robustness/
    # latency knob — results are identical.
    accel_dispatch_rays: int = 4096
    # Path-tracer knobs (P3D_RT.glsl:581, 739)
    max_bounces: int = 10
    russian_roulette: bool = True
    # Path-tracer wavefront tile (rays per lax.map step inside render_pt).
    # Caps live HBM at O(tile x primitives): the untiled trace at the
    # reference harness shape (800x600, 8-spp chunk) needed 16.2 GB of
    # (rays, primitives) temps — more than one chip.  0 = no tiling.
    pt_tile_rays: int = 131072

    def __post_init__(self):
        if self.shadow_mode not in ("reference", "correct"):
            raise ValueError(f"bad shadow_mode: {self.shadow_mode}")
        if self.pallas not in ("auto", "on", "off"):
            raise ValueError(f"bad pallas mode: {self.pallas}")
        if self.accel_backend not in ("auto", "pallas", "xla"):
            raise ValueError(f"bad accel_backend: {self.accel_backend}")
        if self.packet_kernel not in ("grouped", "legacy"):
            raise ValueError(f"bad packet_kernel: {self.packet_kernel}")

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)
