#!/usr/bin/env python
"""Benchmark: bunny.json path-trace ray throughput on the current device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline target: 100 Mrays/s/chip (BASELINE.md).

Methodology: times the production render path end-to-end (the
regenerative wavefront driver — integrators/wavefront.py — which render.py
uses for path_tracing; GOBLIN_REGEN=0 falls back to the chunked driver).
Per pixel-sample the estimator performs 1 primary closest-hit plus
(max_depth-1) x (1 shadow any-hit + 1 continuation closest-hit)
= 1 + 2*(depth-1) estimator rays; that fixed count / wall time is the
driver-comparable metric. The regenerative pool retires finished paths
and immediately starts new ones, so hardware lanes stay busy:
"lane_utilization" reports useful segments / traced lane-slots.
max_ray_depth=5 matches the reference path-tracer default (bunny.json's
depth 20 belongs to its SPPM config)."""

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

    from goblin_tpu.assets import ensure_bunny_obj
    from goblin_tpu.integrators.wavefront import render_wavefront
    from goblin_tpu.scene.loader import load_scene

    depth = 5
    spp = 4
    pool = int(os.environ.get("GOBLIN_BENCH_POOL", 1 << 16))
    ensure_bunny_obj(os.path.join(_REPO, "examples", "models", "bunny.obj"))
    scene, meta = load_scene(
        os.path.join(_REPO, "examples", "bunny.json"),
        {"render_method": "path_tracing", "max_ray_depth": depth,
         "sample_per_pixel": spp},
    )
    spec = meta.camera.film
    n_pix = spec.x_res * spec.y_res

    # warmup / compile
    img, stats = render_wavefront(scene, meta, spp=spp, seed=0, pool=pool,
                                  with_stats=True)
    jax.block_until_ready(img)

    t0 = time.perf_counter()
    img, stats = render_wavefront(scene, meta, spp=spp, seed=0, pool=pool,
                                  with_stats=True)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0

    rays_per_sample = 1 + 2 * (depth - 1)
    total_rays = spp * n_pix * rays_per_sample
    mrays = total_rays / dt / 1e6
    # useful_segments counts occupied trace slots (shadow considers +
    # fresh/continuation closest-hits) out of iterations * pool * 2
    lane_slots = stats["lane_rays"]
    util = stats["useful_segments"] / max(lane_slots, 1)
    print(
        json.dumps(
            {
                "metric": "bunny_path_trace_throughput",
                "value": round(mrays, 3),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / 100.0, 4),
                "driver": "wavefront-regen",
                "pool": stats["pool"],
                "iterations": stats["iterations"],
                "lane_utilization": round(util, 4),
                "trace_backend": meta.trace_backend,
                "max_leaf": meta.max_leaf,
                "spp": spp,
                "depth": depth,
                "seconds_per_pass": round(dt / spp, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
