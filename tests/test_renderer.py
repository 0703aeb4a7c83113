"""Renderer facade: accel wiring, progressive checkpointing, CLI."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distributionraytracer_tpu.config import RenderConfig
from distributionraytracer_tpu.integrator.render import make_samples
from distributionraytracer_tpu.renderer import Renderer
from distributionraytracer_tpu.scene import load_p3f
from distributionraytracer_tpu.scene.types import ACCEL_NONE


def _crop(scene, w, h, spp=None):
    st = scene.static
    kw = dict(res_x=w, res_y=h)
    if spp is not None:
        kw["spp"] = spp
    return dataclasses.replace(scene, static=dataclasses.replace(st, **kw))


def _compare_accel_vs_brute(scene, cfg, atol=3e-3, outliers=0.02):
    """Same scene through the accel path and the brute path.

    Shadow conventions differ slightly between NONE (self-exclusion) and
    grid/BVH, so allow a small pixel-outlier budget.
    """
    samples = make_samples(scene, cfg, jax.random.PRNGKey(0))
    r_acc = Renderer(scene, cfg)
    img_acc = np.asarray(r_acc.render_with_samples(samples))

    brute = dataclasses.replace(
        scene, static=dataclasses.replace(scene.static, accel=ACCEL_NONE))
    r_bru = Renderer(brute, cfg)
    img_bru = np.asarray(r_bru.render_with_samples(samples))

    diff = np.abs(img_acc - img_bru)
    frac_bad = (diff > atol).mean()
    assert frac_bad <= outliers, (frac_bad, diff.max())
    assert img_acc.std() > 0.03
    return img_acc


def test_grid_scene_end_to_end(scenes_dir):
    scene = _crop(load_p3f(os.path.join(scenes_dir, "balls_high.p3f")),
                  32, 32)
    cfg = RenderConfig(spp=0, tile_rays=32 * 32 * 16)
    _compare_accel_vs_brute(scene, cfg)


def test_balls_box_grid_with_boxes(scenes_dir):
    scene = _crop(load_p3f(os.path.join(scenes_dir, "balls_box.p3f")),
                  32, 32)
    cfg = RenderConfig(spp=0, tile_rays=32 * 32 * 16)
    _compare_accel_vs_brute(scene, cfg)


def test_bvh_mesh_scene_end_to_end(scenes_dir):
    scene = _crop(load_p3f(os.path.join(scenes_dir, "blueDiamond.p3f")),
                  24, 24)
    cfg = RenderConfig(spp=0, tile_rays=24 * 24)
    # force BVH regardless of the scene's grid setting
    scene = dataclasses.replace(
        scene, static=dataclasses.replace(scene.static, accel=2))
    _compare_accel_vs_brute(scene, cfg, outliers=0.03)


def test_progressive_checkpoint_roundtrip(tmp_path):
    from tests.test_whitted import small_scene
    scene = small_scene()
    r = Renderer(scene, RenderConfig(spp=1))
    state = r.progressive_init()
    key = jax.random.PRNGKey(0)
    for i in range(3):
        state = r.progressive_step(state, jax.random.fold_in(key, i))
    p = str(tmp_path / "ckpt")
    r.save_progressive(p, state)
    state2 = r.load_progressive(p)
    np.testing.assert_allclose(np.asarray(state[0]), np.asarray(state2[0]))
    assert float(state2[1]) == 3.0
    # resuming produces identical results to continuing
    s_cont = r.progressive_step(state, jax.random.fold_in(key, 3))
    s_res = r.progressive_step(state2, jax.random.fold_in(key, 3))
    np.testing.assert_allclose(np.asarray(s_cont[0]), np.asarray(s_res[0]),
                               atol=1e-7)


def test_cli_render_smoke(tmp_path, scenes_dir):
    from distributionraytracer_tpu.cli import main
    out = str(tmp_path / "out.png")
    main(["render", os.path.join(scenes_dir, "balls_low.p3f"),
          "-o", out, "--res", "24", "24", "--spp", "1"])
    assert os.path.exists(out)
    from distributionraytracer_tpu.utils.image import read_png
    img = read_png(out)
    assert img.shape == (24, 24, 3)
    assert img.std() > 0.03


def test_cli_pathtrace_smoke(tmp_path):
    from distributionraytracer_tpu.cli import main
    out = str(tmp_path / "pt.png")
    main(["pathtrace", "--scene", "3", "-o", out, "--res", "16", "16",
          "--spp", "2", "--bounces", "3"])
    assert os.path.exists(out)
