"""Path-tracer Pallas megakernel vs the jnp hit_world/any_hit (interpret
mode on CPU — ops/pallas_pt.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distributionraytracer_tpu.config import RenderConfig
from distributionraytracer_tpu.integrator import pathtracer as PT
from distributionraytracer_tpu.ops import pallas_pt as PK
from distributionraytracer_tpu.scene import pt_scenes as PS


def _rays(seed, R=3000):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.normal(0, 5, (R, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    tm = jnp.asarray(rng.uniform(0, 1, R).astype(np.float32))
    dist = jnp.asarray(rng.uniform(0.5, 20, R).astype(np.float32))
    return o, d, tm, dist


@pytest.mark.parametrize("si", [0, 3])
def test_pt_kernel_matches_jnp(si):
    sc = jax.device_put(PS.SCENE_BUILDERS[si]())
    o, d, tm, dist = _rays(si)
    hj = PT.hit_world(sc, o, d, tm)
    hk = PK.pt_closest(sc, o, d, tm, interpret=True)
    np.testing.assert_array_equal(np.asarray(hj.hit), np.asarray(hk.hit))
    hit = np.asarray(hj.hit)
    tj, tk = np.asarray(hj.t)[hit], np.asarray(hk.t)[hit]
    np.testing.assert_allclose(tj, tk, rtol=2e-4)
    np.testing.assert_array_equal(np.asarray(hj.mat)[hit],
                                  np.asarray(hk.mat)[hit])
    # normals agree to float rounding (t rounding shifts the hit point)
    nj = np.asarray(hj.normal)[hit]
    nk = np.asarray(hk.normal)[hit]
    assert (np.abs(nj - nk).max(-1) > 1e-3).mean() < 0.005

    aj = PT.any_hit(sc, o, d, tm, 1e-3, dist)
    ak = PK.pt_any_hit(sc, o, d, tm, dist, interpret=True)
    np.testing.assert_array_equal(np.asarray(aj), np.asarray(ak))


def test_render_pt_kernel_backend_statistics():
    """Full render through the kernel path (pallas='on', interpret) agrees
    with the jnp path: identical RNG stream, so images match to float
    noise except at chaos-amplified silhouette pixels."""
    sc = jax.device_put(PS.scene3())
    kw = dict(eye=jnp.array([0.0, -3.0, -4.0]),
              at=jnp.array([0.0, -3.0, 10.0]), spp=4)
    a = np.asarray(PT.render_pt(sc, RenderConfig(max_bounces=4,
                                                 pallas="off"),
                                16, 16, key=jax.random.PRNGKey(5), **kw))
    b = np.asarray(PT.render_pt(sc, RenderConfig(max_bounces=4,
                                                 pallas="on"),
                                16, 16, key=jax.random.PRNGKey(5), **kw))
    assert np.isfinite(b).all()
    assert (np.abs(a - b) > 1e-3).mean() < 0.05
    assert abs(a.mean() - b.mean()) < 5e-3


def test_fused_bounce_matches_jnp():
    """The fused per-bounce megakernel (closest + shadow folds + direct
    + scatter + RR + sky in one pallas_call) must reproduce the jnp
    ray_color on the same key schedule (float-association tolerance)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from distributionraytracer_tpu.config import RenderConfig
    from distributionraytracer_tpu.integrator.pathtracer import ray_color
    from distributionraytracer_tpu.ops.pallas_pt import pt_bounce_supported
    from distributionraytracer_tpu.scene.pt_scenes import scene0

    sc = scene0().device_put()
    assert pt_bounce_supported(sc)
    R = 384
    rng = np.random.default_rng(3)
    o = np.tile(np.array([[6, 1.6, -6]], np.float32), (R, 1))
    tgt = rng.uniform(-3, 3, (R, 3)).astype(np.float32)
    tgt[:, 1] = rng.uniform(0, 2, R)
    d = tgt - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    t = rng.uniform(0, 1, R).astype(np.float32)
    key = jax.random.PRNGKey(11)
    cfg = RenderConfig(max_bounces=4)
    ref = np.asarray(ray_color(sc, cfg.replace(pallas="off"),
                               jnp.asarray(o), jnp.asarray(d),
                               jnp.asarray(t), key))
    new = np.asarray(ray_color(sc, cfg.replace(pallas="on"),
                               jnp.asarray(o), jnp.asarray(d),
                               jnp.asarray(t), key))
    np.testing.assert_allclose(new, ref, rtol=2e-3, atol=2e-3)


def test_fused_bounce_quad_cubemap_scenes():
    """Round-5 extension: scenes with quad lights and cubemap skies run
    the fused kernel too (quad direct lighting in-kernel, miss state
    latched for one post-scan texel gather) and must match the jnp
    path on the same key schedule."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from distributionraytracer_tpu.config import RenderConfig
    from distributionraytracer_tpu.integrator.pathtracer import ray_color
    from distributionraytracer_tpu.ops.pallas_pt import pt_bounce_supported
    from distributionraytracer_tpu.scene.pt_scenes import SCENE_BUILDERS

    rng = np.random.default_rng(5)
    for sid in (1, 3):  # quad light + cubemap; Cornell-like emissive box
        sc = SCENE_BUILDERS[sid]().device_put()
        assert pt_bounce_supported(sc)
        R = 256
        o = np.tile(np.array([[0, 2, -8]], np.float32), (R, 1))
        tgt = rng.uniform(-4, 4, (R, 3)).astype(np.float32)
        tgt[:, 1] = rng.uniform(0, 3, R)
        d = tgt - o
        d = d / np.linalg.norm(d, axis=1, keepdims=True)
        t = np.zeros(R, np.float32)
        key = jax.random.PRNGKey(17)
        cfg = RenderConfig(max_bounces=4)
        ref = np.asarray(ray_color(sc, cfg.replace(pallas="off"),
                                   jnp.asarray(o), jnp.asarray(d),
                                   jnp.asarray(t), key))
        new = np.asarray(ray_color(sc, cfg.replace(pallas="on"),
                                   jnp.asarray(o), jnp.asarray(d),
                                   jnp.asarray(t), key))
        np.testing.assert_allclose(new, ref, rtol=2e-3, atol=2e-3)
