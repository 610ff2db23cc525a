#!/usr/bin/env python
"""Microbenchmark: BVH traversal variants on the real chip, bunny scale.

Compares the pure-jnp skip-link walk (accel/traverse.py) with the Pallas
packet kernels (ops/pallas_trace.py) on coherent (camera) and incoherent
(random) ray distributions. Not part of the driver bench — a tuning tool.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

from goblin_tpu.assets import ensure_bunny_obj
from goblin_tpu.scene.loader import load_scene


def timeit(f, *args, iters=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ensure_bunny_obj(os.path.join(_REPO, "examples", "models", "bunny.obj"))
    scene, meta = load_scene(
        os.path.join(_REPO, "examples", "bunny.json"),
        {"render_method": "path_tracing"},
    )
    nb = np.asarray(scene["node_bounds"])
    nm = np.asarray(scene["node_meta"])
    ts = np.asarray(scene["tri_soup"])
    print(f"nodes={nb.shape[0]} tris={ts.shape[0]} max_leaf={meta.max_leaf}")

    R = 1 << 16
    rng = np.random.default_rng(0)
    cam = meta.camera
    spec = cam.film
    # coherent: camera rays
    ids = np.arange(R) % (spec.x_res * spec.y_res)
    x = (ids % spec.x_res + 0.5).astype(np.float32)
    y = (ids // spec.x_res + 0.5).astype(np.float32)
    ray = cam.generate_ray(jnp.asarray(x), jnp.asarray(y))
    o_c, d_c = np.asarray(ray["o"]), np.asarray(ray["d"])
    # incoherent: origins near the bunny, random dirs
    center = (nb[0, 0:3] + nb[0, 3:6]) / 2
    ext = (nb[0, 3:6] - nb[0, 0:3]).max()
    o_i = (center + rng.uniform(-0.5, 0.5, (R, 3)) * ext).astype(np.float32)
    d_i = rng.normal(size=(R, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=-1, keepdims=True)
    mint = np.full(R, 1e-4, np.float32)
    maxt = np.full(R, 3e38, np.float32)

    from goblin_tpu.accel.traverse import trace as jnp_trace

    def run_jnp(o, d):
        return jnp_trace(scene["node_bounds"], scene["node_meta"],
                         scene["tri_soup"], jnp.asarray(o), jnp.asarray(d),
                         jnp.asarray(mint), jnp.asarray(maxt),
                         max_leaf=meta.max_leaf)

    for name, o, d in [("coherent", o_c, d_c), ("incoherent", o_i, d_i)]:
        dt = timeit(run_jnp, o, d, iters=3)
        print(f"jnp skip-link   {name:10s}: {R/dt/1e6:8.2f} Mrays/s")

    from goblin_tpu.ops.pallas_trace import pack_scene, trace_packets

    packed = pack_scene(nb, nm, ts)
    pk = {k: jnp.asarray(v) for k, v in packed.items()
          if not k.startswith("n_")}

    for rows in (8, 32):
        def run_pallas(o, d):
            return trace_packets(pk["nodes"], pk["meta"], pk["tris"],
                                 jnp.asarray(o), jnp.asarray(d),
                                 jnp.asarray(mint), jnp.asarray(maxt),
                                 max_leaf=meta.max_leaf, rows=rows)

        for name, o, d in [("coherent", o_c, d_c), ("incoherent", o_i, d_i)]:
            dt = timeit(run_pallas, o, d, iters=3)
            print(f"pallas rows={rows:3d} {name:10s}: {R/dt/1e6:8.2f} Mrays/s")


if __name__ == "__main__":
    main()
