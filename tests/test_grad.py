"""Differentiability: autodiff pixel gradients vs finite differences."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distributionraytracer_tpu.config import RenderConfig
from distributionraytracer_tpu.integrator.render import (
    make_samples, render_from_samples,
)
from tests.test_whitted import small_scene


def _loss_wrt(scene, cfg, samples, leaf_name):
    def f(x):
        s = dataclasses.replace(scene, **{leaf_name: x})
        img = render_from_samples(s, cfg, samples)
        return jnp.sum(img * jnp.cos(jnp.arange(img.size).reshape(img.shape)))
    return f


@pytest.mark.parametrize("leaf", ["mat_cd", "mat_kd", "light_pos", "cam_eye",
                                  "sph_center"])
def test_grad_matches_finite_difference(leaf):
    scene = small_scene(glass=True).device_put()
    cfg = RenderConfig(spp=1)
    samples = make_samples(scene, cfg, jax.random.PRNGKey(2))
    f = jax.jit(_loss_wrt(scene, cfg, samples, leaf))
    x0 = getattr(scene, leaf)
    g = jax.jit(jax.grad(_loss_wrt(scene, cfg, samples, leaf)))(x0)
    g = np.asarray(g)
    assert np.isfinite(g).all(), f"non-finite grad for {leaf}"

    # central differences on the 3 largest-|g| coordinates
    flat = np.asarray(x0, np.float64).ravel()
    order = np.argsort(-np.abs(g.ravel()))[:3]
    eps = 1e-3
    for i in order:
        e = np.zeros_like(flat)
        e[i] = eps
        fp = float(f(jnp.asarray((flat + e).reshape(x0.shape), jnp.float32)))
        fm = float(f(jnp.asarray((flat - e).reshape(x0.shape), jnp.float32)))
        fd = (fp - fm) / (2 * eps)
        ad = g.ravel()[i]
        # rendering is piecewise smooth; fd across a discontinuity can
        # disagree, so tolerate either a close match or both being small
        if abs(fd) > 1e-3 or abs(ad) > 1e-3:
            assert abs(fd - ad) <= 0.12 * max(abs(fd), abs(ad)) + 1e-3, (
                leaf, i, fd, ad)


def test_grad_through_quad_light_and_skybox(scenes_dir):
    import os
    from distributionraytracer_tpu.scene import load_p3f
    scene = load_p3f(os.path.join(scenes_dir, "balls_low.p3f")).device_put()
    st = dataclasses.replace(scene.static, res_x=16, res_y=16, spp=0)
    scene = dataclasses.replace(scene, static=st)
    cfg = RenderConfig(spp=0)
    samples = make_samples(scene, cfg, jax.random.PRNGKey(0))

    def loss(cd):
        s = dataclasses.replace(scene, mat_cd=cd)
        return jnp.mean(render_from_samples(s, cfg, samples))

    g = jax.grad(loss)(scene.mat_cd)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
