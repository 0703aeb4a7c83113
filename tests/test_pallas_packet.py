"""Grouped packet kernel (pallas_packet) vs the XLA threaded path.

Same underlying tree (the grouped tables are packed from a leaf-collapsed
twin whose winners are provably identical), so per-lane winners (hit flag,
object id) must match exactly, t/normals to float tolerance (the kernel's
sublane-vector arithmetic associates differently from hit_packed's ops).
Runs in interpret mode on the CPU mesh (conftest forces JAX_PLATFORMS=cpu).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from distributionraytracer_tpu.accel.bvh import (
    build_bvh, collapse_leaves, make_threaded_intersectors, protect_mask,
    thread_bvh,
)
from distributionraytracer_tpu.accel.pallas_packet import (
    GROUPED_LEAF, make_grouped_intersectors, pack_grouped,
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


def _build(name, motion_blur=False):
    scene = load_p3f(os.path.join(SCENES, name + ".p3f"))
    tb = thread_bvh(build_bvh(scene))
    prot = protect_mask(scene, motion_blur)
    tabs = pack_grouped(scene,
                        collapse_leaves(tb, GROUPED_LEAF, protect=prot))
    assert tabs is not None
    return scene, tb, tabs


@pytest.mark.parametrize("name", ["blueDiamond", "teste", "balls_low"])
def test_grouped_matches_threaded(name):
    scene, tb, tabs = _build(name)
    xla = make_threaded_intersectors(scene, tb)
    new = make_grouped_intersectors(scene, tabs, interpret=True)

    o, d, dist, valid = _rays_for(tb)
    time = np.zeros(o.shape[0], np.float32)
    h1 = xla.closest(jnp.asarray(o), jnp.asarray(d), jnp.asarray(time),
                     valid=jnp.asarray(valid))
    h2 = new.closest(jnp.asarray(o), jnp.asarray(d), jnp.asarray(time),
                     valid=jnp.asarray(valid))
    m = valid
    assert np.array_equal(np.asarray(h1.hit)[m], np.asarray(h2.hit)[m])
    assert np.array_equal(np.asarray(h1.obj_id)[m],
                          np.asarray(h2.obj_id)[m])
    hm = m & np.asarray(h1.hit)
    np.testing.assert_allclose(np.asarray(h1.t)[hm], np.asarray(h2.t)[hm],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1.normal)[hm],
                               np.asarray(h2.normal)[hm],
                               rtol=1e-3, atol=1e-4)
    assert np.array_equal(np.asarray(h1.mat_id)[m],
                          np.asarray(h2.mat_id)[m])

    s1 = xla.shadow(jnp.asarray(o), jnp.asarray(d), jnp.asarray(dist),
                    None, valid=jnp.asarray(valid))
    s2 = new.shadow(jnp.asarray(o), jnp.asarray(d), jnp.asarray(dist),
                    None, valid=jnp.asarray(valid))
    assert np.array_equal(np.asarray(s1)[m], np.asarray(s2)[m])


def test_grouped_grid_shadow_mode():
    """Grid-emulation shadow compare (strict t < dist) vs XLA threaded's
    BVH compare differ only where an occluder sits exactly at dist —
    here: the strict mode must match itself across kernels."""
    scene, tb, tabs = _build("balls_box")
    from distributionraytracer_tpu.accel.pallas_bvh import (
        make_pallas_bvh_intersectors, pack_threaded,
    )
    legacy = make_pallas_bvh_intersectors(
        scene, pack_threaded(scene, collapse_leaves(tb, 16)),
        interpret=True, shadow_mode="grid")
    new = make_grouped_intersectors(scene, tabs, interpret=True,
                                    shadow_mode="grid")
    o, d, dist, valid = _rays_for(tb, n=200, seed=3)
    s1 = legacy.shadow(jnp.asarray(o), jnp.asarray(d), jnp.asarray(dist),
                       None, valid=jnp.asarray(valid))
    s2 = new.shadow(jnp.asarray(o), jnp.asarray(d), jnp.asarray(dist),
                    None, valid=jnp.asarray(valid))
    assert np.array_equal(np.asarray(s1)[valid], np.asarray(s2)[valid])


def test_grouped_motion_blur_time():
    """Moving spheres (center.y += time, scene.cpp:158-162): the per-leaf
    vote gate must keep packet results == per-lane results even when a
    hit escapes its static AABB."""
    scene, tb, tabs = _build("motion", motion_blur=True)
    xla = make_threaded_intersectors(scene, tb, motion_blur=True)
    new = make_grouped_intersectors(scene, tabs, motion_blur=True,
                                    interpret=True)
    o, d, dist, valid = _rays_for(tb, n=200, seed=1)
    rng = np.random.default_rng(2)
    time = rng.uniform(0.0, 1.0, o.shape[0]).astype(np.float32)
    h1 = xla.closest(jnp.asarray(o), jnp.asarray(d), jnp.asarray(time),
                     valid=jnp.asarray(valid))
    h2 = new.closest(jnp.asarray(o), jnp.asarray(d), jnp.asarray(time),
                     valid=jnp.asarray(valid))
    m = valid
    oid1 = np.asarray(h1.obj_id)[m]
    oid2 = np.asarray(h2.obj_id)[m]
    # boundary rays whose winner flips are measure-zero; budget a couple
    assert (oid1 != oid2).mean() < 0.02, (oid1, oid2)
    same = m & np.asarray(h1.hit) & (np.asarray(h1.obj_id)
                                     == np.asarray(h2.obj_id))
    np.testing.assert_allclose(np.asarray(h1.t)[same],
                               np.asarray(h2.t)[same],
                               rtol=1e-4, atol=1e-4)


def test_grouped_pack_structure():
    """Pack invariants: every object appears exactly once, inert padding
    has type -1, leaf spans stay within one 128-lane block."""
    scene, tb, tabs = _build("teste")
    obj_g = np.asarray(tabs.obj_g)
    gids = obj_g[13 * 8:14 * 8, :]
    types = obj_g[12 * 8:13 * 8, :]
    real = types >= 0.0
    seen = gids[real].astype(np.int64)
    assert sorted(seen.tolist()) == list(range(scene.static.n_objects))
    assert (types[~real] == -1.0).all()
