"""Pallas intersection megakernel vs the jnp reference path.

Runs in interpret mode on the CPU test backend; the kernel itself is
exercised compiled on real TPU by bench.py and the driver's entry checks.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distributionraytracer_tpu.config import RenderConfig
from distributionraytracer_tpu.integrator.render import render_image
from distributionraytracer_tpu.ops import pallas_intersect as PI
from distributionraytracer_tpu.ops.intersect import (
    any_hit_brute, closest_hit_brute,
)
from distributionraytracer_tpu.scene import load_p3f


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.normal(0, 3, (n, 3)), jnp.float32)
    d = rng.normal(0, 1, (n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                    jnp.float32)
    t = jnp.asarray(rng.random(n), jnp.float32)
    return o, d, t


@pytest.mark.parametrize("name,mb", [
    ("balls_low", False),   # spheres + plane
    ("teste", False),       # glass, metal, aaBox
    ("motion", True),       # motion-blurred sphere centers
])
def test_closest_hit_matches_jnp(scenes_dir, name, mb):
    scene = load_p3f(os.path.join(scenes_dir, f"{name}.p3f")).device_put()
    o, d, t = _random_rays(700)
    a = closest_hit_brute(scene, o, d, t, mb)
    b = PI.closest_hit_pallas(scene, o, d, t, mb, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_array_equal(np.asarray(a.obj_id), np.asarray(b.obj_id))
    np.testing.assert_array_equal(np.asarray(a.mat_id)[np.asarray(a.hit)],
                                  np.asarray(b.mat_id)[np.asarray(a.hit)])
    hit = np.asarray(a.hit)
    np.testing.assert_allclose(np.asarray(a.t)[hit], np.asarray(b.t)[hit],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.normal)[hit],
                               np.asarray(b.normal)[hit],
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("name,mb", [("balls_low", False), ("teste", False)])
def test_any_hit_matches_jnp(scenes_dir, name, mb):
    scene = load_p3f(os.path.join(scenes_dir, f"{name}.p3f")).device_put()
    o, d, _ = _random_rays(700, seed=1)
    rng = np.random.default_rng(2)
    dist = jnp.asarray(rng.random(700) * 10, jnp.float32)
    ex = jnp.asarray(
        rng.integers(-1, scene.static.n_objects, 700), jnp.int32)
    a = any_hit_brute(scene, o, d, jnp.zeros(700), dist, ex, mb)
    b = PI.any_hit_pallas(scene, o, d, dist, ex, mb, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_render_pallas_on_vs_off(scenes_dir):
    """End-to-end: forcing the kernel must reproduce the jnp render."""
    import dataclasses
    scene = load_p3f(os.path.join(scenes_dir, "balls_low.p3f"))
    st = dataclasses.replace(scene.static, res_x=24, res_y=24)
    scene = dataclasses.replace(scene, static=st).device_put()
    key = jax.random.PRNGKey(5)
    base = RenderConfig(spp=2)
    a = np.asarray(render_image(scene, base.replace(pallas="off"), key=key))
    b = np.asarray(render_image(scene, base.replace(pallas="on"), key=key))
    np.testing.assert_allclose(a, b, atol=5e-4)


def test_pallas_supported_bounds(scenes_dir):
    import dataclasses
    scene = load_p3f(os.path.join(scenes_dir, "balls_low.p3f"))
    assert PI.pallas_supported(scene)

    def with_types(types):
        st = dataclasses.replace(scene.static, obj_types=types,
                                 n_objects=len(types))
        return dataclasses.replace(scene, static=st)

    # one long same-type run lowers to a fori_loop -> supported beyond the
    # unroll budget, up to the SMEM table bound
    assert PI.pallas_supported(with_types((0,) * (PI.MAX_UNROLL + 1)))
    assert PI.pallas_supported(with_types((0,) * PI.MAX_OBJECTS))
    assert not PI.pallas_supported(with_types((0,) * (PI.MAX_OBJECTS + 1)))
    # alternating types = all runs short = all unrolled -> budget applies
    assert not PI.pallas_supported(
        with_types((0, 1) * (PI.MAX_UNROLL // 2 + 1)))


def test_closest_hit_loop_path_matches_jnp(scenes_dir):
    """blueDiamond's 178-triangle mesh exceeds MAX_UNROLL: its run lowers
    to the dynamic-index fori_loop body, which must agree with the jnp
    brute scan exactly (incl. first-wins insertion-order tie-break)."""
    scene = load_p3f(os.path.join(scenes_dir, "blueDiamond.p3f"))
    assert scene.static.n_objects > PI.MAX_UNROLL
    assert PI.pallas_supported(scene)
    scene = scene.device_put()
    o, d, t = _random_rays(500, seed=3)
    # aim half the rays at the mesh so plenty hit triangles
    a = closest_hit_brute(scene, o, d, t, False)
    b = PI.closest_hit_pallas(scene, o, d, t, False, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_array_equal(np.asarray(a.obj_id), np.asarray(b.obj_id))
    hit = np.asarray(a.hit)
    np.testing.assert_allclose(np.asarray(a.t)[hit], np.asarray(b.t)[hit],
                               rtol=1e-4, atol=1e-4)

    rng = np.random.default_rng(4)
    dist = jnp.asarray(rng.random(500) * 10, jnp.float32)
    ex = jnp.asarray(rng.integers(-1, scene.static.n_objects, 500),
                     jnp.int32)
    sa = any_hit_brute(scene, o, d, jnp.zeros(500), dist, ex, False)
    sb = PI.any_hit_pallas(scene, o, d, dist, ex, False, interpret=True)
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
