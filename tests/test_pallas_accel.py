"""Pallas packet-traversal BVH kernel vs the XLA threaded path.

Same tables, same DFS object order, so per-lane winners (hit flag, object
id, normals) must match exactly and t to float tolerance (the kernel's
scalar arithmetic associates differently from hit_packed's vector ops).
Runs in interpret mode on the CPU mesh (conftest forces JAX_PLATFORMS=cpu).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distributionraytracer_tpu.accel.bvh import (
    build_bvh, make_threaded_intersectors, thread_bvh,
)
from distributionraytracer_tpu.accel.pallas_bvh import (
    make_pallas_bvh_intersectors, pack_threaded,
)
from distributionraytracer_tpu.scene import load_p3f

SCENES = "/root/reference/DistributionRayTracer/P3D_Scenes"


def _rays_for(tb, n=257, seed=0):
    rng = np.random.default_rng(seed)
    lo = np.asarray(tb.node_box[0, 0:3])
    hi = np.asarray(tb.node_box[0, 3:6])
    ctr = (lo + hi) / 2
    o = (ctr + rng.standard_normal((n, 3)) * (hi - lo).max() * 1.2)
    tgt = ctr + rng.uniform(-0.5, 0.5, (n, 3)) * (hi - lo)
    d = tgt - o
    dist = np.linalg.norm(d, axis=1)
    d = d / dist[:, None]
    valid = np.ones(n, bool)
    valid[::7] = False
    return (o.astype(np.float32), d.astype(np.float32),
            dist.astype(np.float32), valid)


@pytest.mark.parametrize("name", ["blueDiamond", "teste", "balls_low"])
def test_pallas_bvh_matches_threaded(name):
    scene = load_p3f(os.path.join(SCENES, name + ".p3f"))
    tb = thread_bvh(build_bvh(scene))
    tabs = pack_threaded(scene, tb)
    assert tabs is not None
    xla = make_threaded_intersectors(scene, tb)
    pls = make_pallas_bvh_intersectors(scene, tabs, interpret=True)

    o, d, dist, valid = _rays_for(tb)
    time = np.zeros(o.shape[0], np.float32)
    h1 = xla.closest(jnp.asarray(o), jnp.asarray(d), jnp.asarray(time),
                     valid=jnp.asarray(valid))
    h2 = pls.closest(jnp.asarray(o), jnp.asarray(d), jnp.asarray(time),
                     valid=jnp.asarray(valid))
    m = valid
    assert np.array_equal(np.asarray(h1.hit)[m], np.asarray(h2.hit)[m])
    assert np.array_equal(np.asarray(h1.obj_id)[m], np.asarray(h2.obj_id)[m])
    np.testing.assert_allclose(np.asarray(h1.t)[m], np.asarray(h2.t)[m],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1.normal)[m],
                               np.asarray(h2.normal)[m],
                               rtol=1e-3, atol=1e-4)
    assert np.array_equal(np.asarray(h1.mat_id)[m], np.asarray(h2.mat_id)[m])

    s1 = xla.shadow(jnp.asarray(o), jnp.asarray(d), jnp.asarray(dist), None,
                    valid=jnp.asarray(valid))
    s2 = pls.shadow(jnp.asarray(o), jnp.asarray(d), jnp.asarray(dist), None,
                    valid=jnp.asarray(valid))
    assert np.array_equal(np.asarray(s1)[m], np.asarray(s2)[m])


def test_pallas_bvh_render_matches_xla():
    """Full Renderer output: accel_backend='pallas' == 'xla' (tight)."""
    import dataclasses

    from distributionraytracer_tpu.config import RenderConfig
    from distributionraytracer_tpu.renderer import Renderer

    scene = load_p3f(os.path.join(SCENES, "blueDiamond.p3f"))
    st = dataclasses.replace(scene.static, res_x=32, res_y=32)
    scene = dataclasses.replace(scene, static=st)
    key = jax.random.PRNGKey(3)

    imgs = {}
    for backend in ("xla", "pallas"):
        cfg = RenderConfig(spp=1, accel_backend=backend,
                           accel_dispatch_rays=0)
        imgs[backend] = np.asarray(Renderer(scene, cfg).render(key))
    np.testing.assert_allclose(imgs["pallas"], imgs["xla"],
                               rtol=1e-4, atol=1e-4)


def test_pallas_bvh_motion_blur_time():
    """Sphere motion blur uses ray time in closest; shadow rays at t=0."""
    import dataclasses

    scene = load_p3f(os.path.join(SCENES, "balls_low.p3f"))
    tb = thread_bvh(build_bvh(scene))
    tabs = pack_threaded(scene, tb)
    xla = make_threaded_intersectors(scene, tb, motion_blur=True)
    pls = make_pallas_bvh_intersectors(scene, tabs, motion_blur=True,
                                       interpret=True)
    o, d, dist, valid = _rays_for(tb, seed=5)
    time = np.linspace(0.0, 1.0, o.shape[0]).astype(np.float32)
    h1 = xla.closest(jnp.asarray(o), jnp.asarray(d), jnp.asarray(time),
                     valid=jnp.asarray(valid))
    h2 = pls.closest(jnp.asarray(o), jnp.asarray(d), jnp.asarray(time),
                     valid=jnp.asarray(valid))
    m = valid
    # moving spheres overlap; last-ULP t differences (scalar vs vector
    # arithmetic order) can flip near-exact ties — allow a rare flip but
    # t itself must agree everywhere
    oid1, oid2 = np.asarray(h1.obj_id)[m], np.asarray(h2.obj_id)[m]
    assert (oid1 != oid2).mean() < 0.02, (oid1, oid2)
    np.testing.assert_allclose(np.asarray(h1.t)[m], np.asarray(h2.t)[m],
                               rtol=1e-4, atol=1e-4)
    s1 = xla.shadow(jnp.asarray(o), jnp.asarray(d), jnp.asarray(dist), None)
    s2 = pls.shadow(jnp.asarray(o), jnp.asarray(d), jnp.asarray(dist), None)
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
