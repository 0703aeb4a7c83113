"""Microbenchmark: skybox texel-fetch strategies on the TPU.

The per-level miss-color texel gather is 56% of blueDiamond's frame
(VERDICT r4 gap #3).  This tool measures what a gather actually costs on
this chip as a function of (a) index count, (b) table size/layout,
(c) index coherence — to pick the round-5 fix with data rather than
guesses.  Reference semantics: Scene::GetSkyboxColor nearest-texel fetch
(scene.cpp:440-457).

Axon note: a single dispatch costs ~25ms of network roundtrip, so each
measurement loops the op N times inside one jit (index-perturbed to
defeat CSE) and reports (t_N - t_1) / (N - 1).
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_REP = 512


@partial(jax.jit, static_argnums=(2,))
def loop_gather(tb, idx, n):
    def body(k, acc):
        v = tb[(idx + k) % tb.shape[0]]
        return acc + (v.astype(jnp.float32).sum()
                      if v.dtype != jnp.float32 else v.sum())
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))


def timeit(fn, reps=3):
    # force a scalar device->host fetch: on axon, block_until_ready on
    # an unfetched array can return before execution (PARITY r5 notes)
    float(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench(tb, idx, label):
    t1 = timeit(lambda: loop_gather(tb, idx, 1))
    tn = timeit(lambda: loop_gather(tb, idx, N_REP))
    per = (tn - t1) / (N_REP - 1)
    R = idx.shape[0]
    print(f"{label}: {per*1e3:.3f}ms/gather ({per/R*1e9:.2f}ns/idx)")
    return per


def main():
    H = W = 2048
    F = 6
    rng = np.random.default_rng(0)
    faces_f32 = jnp.asarray(rng.random((F, H, W, 3), np.float32))
    flat_f32 = faces_f32.reshape(F * H * W, 3)
    packed = jnp.asarray(rng.integers(0, 1 << 24, F * H * W, np.uint32))
    small = jnp.asarray(rng.random((4096, 3), np.float32))

    R = 262_144
    base = rng.integers(0, F * H * W - 4096, size=R // 128)
    coh = (base[:, None] + rng.integers(0, 2048, (R // 128, 128))
           ).reshape(-1).astype(np.int32)
    rand = rng.integers(0, F * H * W, size=R).astype(np.int32)
    srt = np.sort(rand)
    for name, idx in (("coh", coh), ("rand", rand), ("sorted", srt)):
        idx = jnp.asarray(idx)
        bench(flat_f32, idx, f"R={R} {name} f32(N,3) 300MB")
        bench(packed, idx, f"R={R} {name} u32(N,) 100MB")
        bench(small, idx % 4096, f"R={R} {name} small(4096,3)")

    for Rs in (32_768, 65_536):
        idx = jnp.asarray(rand[:Rs])
        bench(packed, idx, f"R={Rs} rand u32(N,) 100MB")


if __name__ == "__main__":
    main()
