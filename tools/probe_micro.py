#!/usr/bin/env python
"""Micro-probes on real TPU: (a) jnp lockstep trace throughput per ray
class, (b) raw gather cost, (c) packet node-visit counts via an
instrumented kernel variant."""
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

from goblin_tpu.assets import ensure_bunny_obj
from goblin_tpu.scene.loader import load_scene
from goblin_tpu.accel.bvh import build_bvh
from goblin_tpu.accel.traverse import trace as jnp_trace


def timeit(f, *a, iters=3):
    o = f(*a)
    jax.block_until_ready(o)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        o = f(*a)
        jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ensure_bunny_obj(os.path.join(_REPO, "examples", "models", "bunny.obj"))
    scene, meta = load_scene(
        os.path.join(_REPO, "examples", "bunny.json"),
        {"render_method": "path_tracing"},
    )
    ts = np.asarray(scene["tri_soup"])
    v0 = ts[:, 0:3]
    v1 = v0 + ts[:, 3:6]
    v2 = v0 + ts[:, 6:9]
    R = 1 << 16
    cam = meta.camera
    spec = cam.film
    ids = np.arange(R) % (spec.x_res * spec.y_res)
    x = (ids % spec.x_res + 0.5).astype(np.float32)
    y = (ids // spec.x_res + 0.5).astype(np.float32)
    ray = cam.generate_ray(jnp.asarray(x), jnp.asarray(y))
    o_p = jax.device_put(np.asarray(ray["o"]))
    d_p = jax.device_put(np.asarray(ray["d"]))
    mint = jax.device_put(np.full(R, 1e-4, np.float32))
    maxt = jax.device_put(np.full(R, 3e38, np.float32))

    for K in [4]:
        bvh = build_bvh(v0, v1, v2, max_leaf=K)
        soup = ts[bvh.order]
        nb = jax.device_put(bvh.bounds)
        nm = jax.device_put(bvh.meta)
        sp = jax.device_put(soup)
        N = bvh.bounds.shape[0]
        print(f"K={K}: {N} nodes", flush=True)

        res = jnp_trace(nb, nm, sp, o_p, d_p, mint, maxt, max_leaf=K)
        hitm = np.asarray(res.hit)
        p = np.asarray(o_p) + np.where(hitm, np.asarray(res.t), 1.0)[:, None] \
            * np.asarray(d_p)
        rng = np.random.default_rng(1)
        dvec = rng.normal(size=(R, 3)).astype(np.float32)
        dvec /= np.linalg.norm(dvec, axis=-1, keepdims=True)
        o_b = jax.device_put(p.astype(np.float32))
        d_b = jax.device_put(dvec)

        f = jax.jit(partial(jnp_trace, max_leaf=K))
        dt = timeit(f, nb, nm, sp, o_p, d_p, mint, maxt)
        print(f"  jnp trace primary: {R/dt/1e6:.3f} Mrays/s", flush=True)
        dt = timeit(f, nb, nm, sp, o_b, d_b, mint, maxt)
        print(f"  jnp trace bounce:  {R/dt/1e6:.3f} Mrays/s", flush=True)

        # raw gather cost: the traversal does 2 gathers/step + K tri gathers
        idx = jax.device_put(
            rng.integers(0, N, size=R).astype(np.int32))

        @jax.jit
        def g1(tbl, idx):
            return jnp.take(tbl, idx, axis=0)

        dt = timeit(g1, nb, idx)
        print(f"  gather (N={N},6) x {R}: {dt*1e3:.3f} ms", flush=True)
        dt = timeit(g1, sp, idx)
        print(f"  gather (T,9) x {R}:     {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
