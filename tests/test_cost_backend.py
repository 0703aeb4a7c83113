"""Cost-based brute backend vs the packet traversal (grid semantics).

The brute megakernel tests every object; the grid's DDA only tests
span-crossing ones — but for scenes without infinite planes or moving
spheres every valid hit lies inside its object's true AABB, so the
observable results coincide (renderer._use_cost_brute's precondition).
Renders must match to float tolerance (tie order is measure-zero).
Runs in interpret mode on the CPU mesh.
"""

import os

import jax
import numpy as np
import pytest

from distributionraytracer_tpu.integrator.render import default_config
from distributionraytracer_tpu.renderer import Renderer, _use_cost_brute
from distributionraytracer_tpu.scene import load_p3f

SCENES = "/root/reference/DistributionRayTracer/P3D_Scenes"


@pytest.mark.parametrize("name", ["blueDiamond", "balls_box"])
def test_cost_brute_matches_packet(name):
    scene = load_p3f(os.path.join(SCENES, name + ".p3f"))
    # tiny render keeps interpret mode fast: shrink via row slicing
    imgs = {}
    for label, thresh in (("brute", 1024), ("packet", 0)):
        cfg = default_config(scene).replace(
            accel_backend="pallas", accel_cost_threshold=thresh)
        if label == "brute":
            assert _use_cost_brute(scene, cfg)
        else:
            assert not _use_cost_brute(scene, cfg)
        r = Renderer(scene, cfg)
        from distributionraytracer_tpu.integrator.render import make_samples
        samples = make_samples(scene, cfg, jax.random.PRNGKey(0))
        sl = lambda a: a[100:104]  # 4 rows through the geometry
        from distributionraytracer_tpu.integrator.render import SampleSet
        chunk = SampleSet(sl(samples.pixel), sl(samples.light),
                          sl(samples.lens), sl(samples.time))
        import jax.numpy as jnp
        imgs[label] = np.asarray(
            r._render_chunk(chunk, jnp.float32(100)))
    # measure-zero tie/boundary deviations: budget a few pixels
    diff = np.abs(imgs["brute"] - imgs["packet"]).max(axis=-1)
    frac_bad = (diff > 1e-4).mean()
    assert frac_bad < 0.01, frac_bad
    np.testing.assert_allclose(imgs["brute"].mean(),
                               imgs["packet"].mean(), rtol=1e-3)


def test_cost_brute_refusals():
    """Scenes whose tested set is observable must refuse the override."""
    scene = load_p3f(os.path.join(SCENES, "motion.p3f"))  # has a plane
    cfg = default_config(scene)
    assert not _use_cost_brute(scene, cfg)
    big = load_p3f(os.path.join(SCENES, "balls_high.p3f"))
    assert not _use_cost_brute(big, default_config(big))
