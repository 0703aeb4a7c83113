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


def test_soft_shadow_grad_matches_fd_at_edge():
    """Discontinuity-aware gradients (SURVEY §7 step 9): with the
    sigmoid-relaxed visibility enabled, autodiff matches central finite
    differences *at* a constructed shadow edge, instead of the hard-shadow
    path's zero gradient there.

    Construction: overhead camera sees only a floor region crossed by a
    sphere's shadow boundary (the sphere itself is outside the cropped
    loss window, so no primary-silhouette discontinuity pollutes the FD).
    """
    from distributionraytracer_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    # camera straight down; window x in [-0.03, 1.23] at the floor, shadow
    # edge at x = 0.6 (sphere r=0.4 at y=1, light at (0,5,0), floor y=-1)
    b.set_camera([0.6, 8.0, 1e-3], [0.6, -1.0, 0.0], [0, 0, 1],
                 8.0, 0.01, 32, 32, 0, 1)
    floor = b.add_material([0.7, 0.7, 0.7], 0.9, [0, 0, 0], 0.0, 10, 0, 1)
    b.add_plane_hessian([0, 1, 0], 1.0, floor)
    occ = b.add_material([0.8, 0.2, 0.2], 0.9, [0, 0, 0], 0.0, 10, 0, 1)
    b.add_sphere([0.0, 1.0, 0.0], 0.4, occ)
    b.add_point_light([0.0, 5.0, 0.0], [1, 1, 1])
    scene = b.build().device_put()

    cfg = RenderConfig(spp=1, soft_shadow=0.05)
    samples = make_samples(scene, cfg, jax.random.PRNGKey(0))

    def loss(c):
        s = dataclasses.replace(scene, sph_center=c)
        img = render_from_samples(s, cfg, samples)
        # camera u = up x n = -x, so columns run toward negative world x:
        # cols 0..18 cover floor x in [1.23, 0.48] — shadow edge at 0.6
        # included, sphere silhouette (x < 0.35, cols >= 22) excluded
        return jnp.mean(img[:, :19])

    g = np.asarray(jax.jit(jax.grad(loss))(scene.sph_center))
    assert np.isfinite(g).all()
    # the shadow edge must produce a real gradient (hard shadows give ~0)
    assert np.abs(g).max() > 1e-3, g

    f = jax.jit(loss)
    flat = np.asarray(scene.sph_center, np.float64).ravel()
    order = np.argsort(-np.abs(g.ravel()))[:2]
    eps = 1e-3
    for i in order:
        e = np.zeros_like(flat)
        e[i] = eps
        fp = float(f(jnp.asarray((flat + e).reshape(g.shape), jnp.float32)))
        fm = float(f(jnp.asarray((flat - e).reshape(g.shape), jnp.float32)))
        fd = (fp - fm) / (2 * eps)
        ad = g.ravel()[i]
        # smooth renderer: FD and AD must agree AT the edge, no excuses
        assert abs(fd - ad) <= 0.05 * max(abs(fd), abs(ad)) + 1e-4, (
            i, fd, ad)


def test_soft_shadow_off_is_reference_hard_shadow():
    """soft_shadow=0 must leave the reference path bit-identical."""
    scene = small_scene().device_put()
    cfg = RenderConfig(spp=1)
    samples = make_samples(scene, cfg, jax.random.PRNGKey(1))
    a = render_from_samples(scene, cfg, samples)
    b = render_from_samples(scene, cfg.replace(soft_shadow=0.0), samples)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_with_pallas_brute_kernel():
    """Inverse rendering no longer falls back off the Pallas megakernel:
    the forward-only kernel runs under stop_gradient to pick winners and
    the winning hit is recomputed differentiably
    (parallel.mesh.accel_intersectors(differentiable=True)).  Forward must
    match the plain jnp render and gradients must match the jnp autodiff
    path (same piecewise-smooth function away from selection boundaries)."""
    from distributionraytracer_tpu.parallel.mesh import accel_intersectors

    scene = small_scene(glass=True).device_put()
    samples = make_samples(scene, RenderConfig(spp=1), jax.random.PRNGKey(2))

    def loss(cd, cfg):
        s = dataclasses.replace(scene, mat_cd=cd)
        inter = accel_intersectors(s, cfg, None, differentiable=True)
        img = render_from_samples(s, cfg, samples, inter=inter)
        return jnp.sum(img * jnp.cos(jnp.arange(img.size).reshape(img.shape)))

    on = RenderConfig(spp=1, pallas="on")    # interpret-mode kernel on CPU
    off = RenderConfig(spp=1, pallas="off")  # plain jnp brute autodiff
    v_on, g_on = jax.value_and_grad(loss)(scene.mat_cd, on)
    v_off, g_off = jax.value_and_grad(lambda cd: loss(cd, off))(scene.mat_cd)
    np.testing.assert_allclose(float(v_on), float(v_off), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_on), np.asarray(g_off),
                               rtol=1e-3, atol=1e-5)
    assert np.abs(np.asarray(g_on)).max() > 0


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


def _fd_check(loss, param, g, picks=2, eps=1e-3, rtol=0.05):
    """Central finite differences vs autodiff at the largest |grad| dims."""
    f = jax.jit(loss)
    flat = np.asarray(param, np.float64).ravel()
    order = np.argsort(-np.abs(g.ravel()))[:picks]
    for i in order:
        e = np.zeros_like(flat)
        e[i] = eps
        fp = float(f(jnp.asarray((flat + e).reshape(g.shape), jnp.float32)))
        fm = float(f(jnp.asarray((flat - e).reshape(g.shape), jnp.float32)))
        fd = (fp - fm) / (2 * eps)
        ad = g.ravel()[i]
        assert abs(fd - ad) <= rtol * max(abs(fd), abs(ad)) + 1e-4, (
            i, fd, ad)


def test_soft_shadow_grad_matches_fd_at_triangle_edge():
    """Discontinuity-aware shadow gradients for TRIANGLE occluders
    (VERDICT r2 item 5): sigmoid on the signed edge-distance margin makes
    autodiff match FD at a triangle shadow edge, where the hard path's
    gradient is zero.

    Construction mirrors the sphere test: overhead camera sees only floor;
    a triangle at y=1 casts a shadow edge crossing the loss window."""
    from distributionraytracer_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    b.set_camera([0.6, 8.0, 1e-3], [0.6, -1.0, 0.0], [0, 0, 1],
                 8.0, 0.01, 32, 32, 0, 1)
    floor = b.add_material([0.7, 0.7, 0.7], 0.9, [0, 0, 0], 0.0, 10, 0, 1)
    b.add_plane_hessian([0, 1, 0], 1.0, floor)
    occ = b.add_material([0.8, 0.2, 0.2], 0.9, [0, 0, 0], 0.0, 10, 0, 1)
    # triangle hovering at y=1, +x vertex at x=0.45: its shadow edge from
    # the (0,5,0) light lands at floor x ~ 0.675 — inside the loss window
    # below — while the triangle itself (x <= 0.45) stays outside it, so
    # no (hard) primary silhouette pollutes the FD
    b.add_triangle([-0.6, 1.0, -2.0], [0.45, 1.0, 0.0], [-0.6, 1.0, 2.0],
                   occ)
    b.add_point_light([0.0, 5.0, 0.0], [1, 1, 1])
    scene = b.build().device_put()

    cfg = RenderConfig(spp=1, soft_shadow=0.05)
    samples = make_samples(scene, cfg, jax.random.PRNGKey(0))

    def loss(v0):
        s = dataclasses.replace(scene, tri_v0=v0)
        img = render_from_samples(s, cfg, samples)
        # camera u = up x n = -x: cols 0..18 cover floor x in [1.23, 0.48]
        # (shadow edge ~0.675 included, triangle x <= 0.45 excluded)
        return jnp.mean(img[:, :19])

    g = np.asarray(jax.jit(jax.grad(loss))(scene.tri_v0))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 1e-3, g
    _fd_check(loss, scene.tri_v0, g)


def test_soft_silhouette_grad_matches_fd_at_sphere_edge():
    """Primary-silhouette gradients (VERDICT r2 item 5, second half): with
    soft_silhouette > 0 the pixel blends smoothly across the sphere's
    hit-vs-miss boundary, so d(image)/d(center) matches FD at the
    silhouette — the hard renderer's gradient there is zero."""
    from distributionraytracer_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    # camera looking straight at a floating sphere against the background;
    # the loss window spans the silhouette edge
    b.set_camera([0.0, 0.0, 6.0], [0.0, 0.0, 0.0], [0, 1, 0],
                 20.0, 0.01, 32, 32, 0, 1)
    m = b.add_material([0.8, 0.3, 0.2], 0.9, [0, 0, 0], 0.0, 10, 0, 1)
    b.add_sphere([0.0, 0.0, 0.0], 0.8, m)
    b.add_point_light([3.0, 4.0, 6.0], [1, 1, 1])
    b.bg_color = np.array([0.1, 0.1, 0.6], np.float32)
    scene = b.build().device_put()

    cfg = RenderConfig(spp=1, soft_silhouette=0.03)
    samples = make_samples(scene, cfg, jax.random.PRNGKey(0))

    def loss(c):
        s = dataclasses.replace(scene, sph_center=c)
        img = render_from_samples(s, cfg, samples)
        return jnp.mean(img)

    g = np.asarray(jax.jit(jax.grad(loss))(scene.sph_center))
    assert np.isfinite(g).all()
    # moving the sphere toward/away from the camera or sideways changes
    # covered-pixel count -> nonzero gradient through the silhouette ramp
    assert np.abs(g).max() > 1e-3, g
    _fd_check(loss, scene.sph_center, g)

    # hard renderer: silhouette gradient is (near) zero — the thing the
    # relaxation exists to fix
    def hard_loss(c):
        s = dataclasses.replace(scene, sph_center=c)
        img = render_from_samples(s, cfg.replace(soft_silhouette=0.0),
                                  samples)
        return jnp.mean(img)

    gh = np.asarray(jax.jit(jax.grad(hard_loss))(scene.sph_center))
    # the hard pointwise gradient lacks the silhouette boundary term the
    # FD (and the soft AD) contain — it is off by an order of magnitude,
    # which is exactly the wrongness the relaxation exists to fix
    assert np.abs(gh - g).max() > 10 * np.abs(g[..., 0]).max()


def test_soft_silhouette_off_is_reference():
    """soft_silhouette=0 leaves the reference path bit-identical."""
    scene = small_scene().device_put()
    cfg = RenderConfig(spp=1)
    samples = make_samples(scene, cfg, jax.random.PRNGKey(1))
    a = render_from_samples(scene, cfg, samples)
    b = render_from_samples(scene, cfg.replace(soft_silhouette=0.0), samples)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
