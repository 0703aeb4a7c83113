"""Binned dense-streaming route (accel/pallas_binned) vs the packet path.

The binned kernels share the primitive formulas with pallas_packet, so a
full render routed binned (primary closest + all shadow levels) must be
bit-identical to the packet-only render except at exact-t ties, whose
winner can follow candidate order (dist-sorted) instead of DFS order —
the same measure-zero class budgeted for the grid emulation.  Interpret
mode on CPU (conftest forces JAX_PLATFORMS=cpu).
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

from distributionraytracer_tpu.config import RenderConfig
from distributionraytracer_tpu.renderer import Renderer
from distributionraytracer_tpu.scene import load_p3f
from distributionraytracer_tpu.scene.types import ACCEL_BVH

SCENES = "/root/reference/DistributionRayTracer/P3D_Scenes"


def _small_scene(accel=None, res=64):
    scene = load_p3f(os.path.join(SCENES, "blueDiamond.p3f"))
    st = dataclasses.replace(scene.static, res_x=res, res_y=res)
    if accel is not None:
        st = dataclasses.replace(st, accel=accel)
    return dataclasses.replace(scene, static=st)


def _cfg():
    # accel_backend="pallas" forces the packet/binned route in interpret
    # mode on CPU; cost_threshold=0 disables the cost-brute override so
    # the small test scene exercises the packet/binned kernels
    return RenderConfig(spp=0, accel_backend="pallas",
                        accel_cost_threshold=0)


def _render_pair(scene):
    from distributionraytracer_tpu.accel import pallas_binned as _pb
    r = Renderer(scene, _cfg())
    assert r._gbox is not None, "binned route should be eligible"
    if _pb.SHADOW_BINNING:
        assert r._light_bins is not None, "shadow bins should build"
    else:
        # exercise the shadow kernel in interpret mode even while the
        # production routing keeps the packet walker (see SHADOW_BINNING)
        lb = _pb.build_light_bins(scene, r._gbox, r._bins_tabs)
        if lb is not None and _pb.shadow_binning_ok(scene, lb):
            r._light_bins = jax.device_put(lb)
    img_b = np.asarray(r.render(jax.random.PRNGKey(0)))
    backend = r.executed_backend()
    r._gbox = None  # force the packet-only path
    r._light_bins = None
    img_p = np.asarray(r.render(jax.random.PRNGKey(0)))
    return img_b, img_p, backend


@pytest.mark.parametrize("accel", [None, ACCEL_BVH],
                         ids=["grid", "bvh"])
def test_binned_render_matches_packet(accel):
    img_b, img_p, backend = _render_pair(_small_scene(accel))
    assert backend.startswith("binned+")
    diff = np.abs(img_b - img_p).max(axis=-1)
    # measure-zero tie/association budget (same as test_pallas_accel)
    bad = (diff > 1e-5).sum()
    assert bad <= img_b.shape[0] * img_b.shape[1] * 0.002, (
        bad, float(diff.max()))


def test_chain_grid_structure():
    from distributionraytracer_tpu.accel.pallas_binned import _chain_grid
    cg = _chain_grid(64, 64, 1)
    assert cg is not None
    rw, rh, grid = cg
    assert rw * rh == 128
    assert grid.shape == (64 // rh, 64 // rw)
    assert sorted(grid.ravel().tolist()) == list(range(grid.size))
    # 800x600 (dof/teste shapes) must also tile uniformly
    assert _chain_grid(600, 800, 1) is not None


def test_primary_bins_cover_hits():
    """Every primary hit's winning group must appear in its chain's
    candidate list (conservativeness of the screen projection)."""
    from distributionraytracer_tpu.accel import pallas_binned as _pb
    scene = _small_scene(ACCEL_BVH)
    r = Renderer(scene, _cfg())
    H = W = 64
    bins = jax.device_get(r._bins_for(H, W, 1).primary)
    # winner groups from the packet render path
    from distributionraytracer_tpu.integrator.render import (
        _block_perm, make_samples, _rays_from_samples,
    )
    from distributionraytracer_tpu.accel.bvh import (
        make_threaded_intersectors,
    )
    samples = make_samples(scene.device_put(), r.cfg, jax.random.PRNGKey(0))
    o, d, t, _ = _rays_from_samples(scene.device_put(), r.cfg, samples)
    perm = _block_perm(H, W, 1)
    o, d, t = np.asarray(o)[perm], np.asarray(d)[perm], np.asarray(t)[perm]
    xla = make_threaded_intersectors(scene.device_put(), r.bvh)
    h = xla.closest(o, d, t)
    oid = np.asarray(h.obj_id)
    hit = np.asarray(h.hit)
    # group of each object id via the packed table
    og = np.asarray(jax.device_get(r.bvh_tabs.obj_g))
    ids = og[13 * 8:14 * 8, :].T.astype(np.int64).ravel()
    types = og[12 * 8:13 * 8, :].T.ravel()
    group_of = np.full(int(ids.max()) + 2, -1, np.int64)
    slot = np.arange(ids.size) // 8
    group_of[ids[types >= 0]] = slot[types >= 0]
    miss = 0
    for lane in np.nonzero(hit)[0]:
        chain = lane // 128
        s, e = bins.chain_start[chain], bins.chain_start[chain + 1]
        if group_of[oid[lane]] not in set(bins.cand[s:e].tolist()):
            miss += 1
    assert miss == 0, miss


def test_binned_eligibility_fallbacks():
    """Routing must refuse configurations the conservative-superset
    argument does not cover, falling back to the packet path."""
    import dataclasses

    from distributionraytracer_tpu.accel import pallas_binned as _pb
    from distributionraytracer_tpu.config import RenderConfig
    from distributionraytracer_tpu.scene import load_p3f

    scenes = "/root/reference/DistributionRayTracer/P3D_Scenes"
    cfg = RenderConfig(spp=0)
    # balls_low has infinite planes -> ineligible
    bl = load_p3f(f"{scenes}/balls_low.p3f")
    assert not _pb.binned_supported(bl, cfg)
    # motion blur -> ineligible
    bd = load_p3f(f"{scenes}/blueDiamond.p3f")
    assert _pb.binned_supported(bd, cfg)
    assert not _pb.binned_supported(bd, cfg.replace(motion_blur=True))
    assert not _pb.binned_supported(bd, cfg.replace(dof=True))
    # light INSIDE the scene bounds -> no shadow bins
    import jax
    import numpy as np
    from distributionraytracer_tpu.renderer import Renderer
    r = Renderer(bd, RenderConfig(spp=0, accel_backend="pallas",
                                  accel_cost_threshold=0))
    live = r._gbox[:, 6] > 0
    center = (r._gbox[live, 0:3].min(0) + r._gbox[live, 3:6].max(0)) / 2
    inside = dataclasses.replace(
        bd, light_pos=np.broadcast_to(
            center, np.asarray(bd.light_pos).shape).copy())
    assert _pb.build_light_bins(inside, r._gbox, r._bins_tabs) is None
    # chain-grid refuses a non-dividing resolution
    assert _pb._chain_grid(50, 77, 1) is None
