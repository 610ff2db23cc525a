#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE.md ">=85% rays/s scaling" row).

Two modes, one JSON line each:

  python bench_scaling.py            # fake-mesh mode (default off-TPU):
      forces JAX_PLATFORMS=cpu with 8 virtual devices and times the SAME
      total work under a 1-device mesh and an 8-device mesh. Virtual
      devices share one host's cores, so wall-clock cannot *improve*;
      the reported `efficiency_8dev` = t_mesh1 / t_mesh8 measures the
      *sharding overhead* (partitioning, cross-device film reduction) —
      1.0 means GSPMD adds nothing on top of the compute, which is the
      property that must hold for real-chip scaling to track the
      hardware. Real >=85% scaling needs a pod slice the driver runs.

  python bench_scaling.py --tpu      # real-chip mode:
      times the unsharded chunked render vs the same render under a
      mesh of 1 real device (sharded code path, same work) — the
      single-chip sharding overhead.

Writes bench_scaling.json next to this file as well.
"""

import json
import os
import sys
import time

_TPU = "--tpu" in sys.argv
if not _TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)


def _timed(fn, reps=2):
    import jax

    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax

    if not _TPU:
        # the environment's sitecustomize imports jax before this script
        # runs, so the env var alone is ignored (see tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from goblin_tpu.assets import ensure_bunny_obj
    from goblin_tpu.integrators.path import make_li
    from goblin_tpu.parallel.mesh import (make_mesh, render_sharded,
                                          render_sharded_dense)
    from goblin_tpu.scene.loader import load_scene

    # real-resolution workload in BOTH modes (round-4 verdict: the
    # 256x192/depth-3 fake-mesh run had no signal — efficiency > 1 was
    # measurement noise)
    depth = 5
    spp = 1
    res = [512, 384]
    ensure_bunny_obj(os.path.join(_REPO, "examples", "models", "bunny.obj"))
    overrides = {
        "render_method": "path_tracing",
        "max_ray_depth": depth,
        "sample_per_pixel": spp,
    }
    scene, meta = load_scene(
        os.path.join(_REPO, "examples", "bunny.json"), overrides
    )
    import dataclasses

    film = dataclasses.replace(meta.camera.film, x_res=res[0], y_res=res[1])
    meta.camera = dataclasses.replace(meta.camera, film=film)
    li = make_li(meta)
    n_pix = res[0] * res[1]
    rays = spp * n_pix * (1 + 2 * (depth - 1))

    out = {"metric": "scaling_efficiency", "resolution": res,
           "spp": spp, "depth": depth,
           "note": (
               "cpu-fake-mesh: 8 virtual devices share one host's cores, "
               "so efficiency_8dev measures GSPMD partitioning overhead "
               "(~1.0 = sharding adds nothing; slightly >1 just means "
               "the partitioned program spread across host threads "
               "better), NOT hardware scaling; "
               "real >=85% rays/s scaling needs a pod slice. tpu-1chip "
               "fields record the real-chip sharded-vs-unsharded "
               "overhead on one device."
           )}

    if _TPU:
        import jax.numpy as jnp

        from goblin_tpu.camera import film as film_mod
        from goblin_tpu.integrators import common
        from goblin_tpu.parallel.mesh import make_sharded_render_step
        from goblin_tpu.parallel.multihost import global_put
        from jax.sharding import NamedSharding, PartitionSpec as P

        # time PREBUILT steps (the render()/render_sharded wrappers
        # re-jit per call, which would measure cache lookups, not work)
        render_pass, _ = common.make_render_pass(scene, meta, li, spp=spp,
                                                 seed=0, chunk_size=1 << 16)
        color, weight = film_mod.new_film(meta.camera.film)

        def plain():
            return render_pass(*film_mod.new_film(meta.camera.film),
                               jnp.int32(0))

        t_plain = _timed(plain)

        mesh1 = make_mesh(1)
        from goblin_tpu.parallel.mesh import make_sharded_render_pass

        spass, _ = make_sharded_render_pass(scene, meta, li, mesh1,
                                            spp=spp, seed=0)
        rep = NamedSharding(mesh1, P())

        def sharded():
            c, w = film_mod.new_film(meta.camera.film)
            c, w = global_put(c, rep), global_put(w, rep)
            return spass(c, w, jnp.int32(0))

        t_mesh1 = _timed(sharded)
        out.update({
            "mode": "tpu-1chip",
            "unsharded_mrays": round(rays / t_plain / 1e6, 3),
            "mesh1_mrays": round(rays / t_mesh1 / 1e6, 3),
            "sharding_overhead": round(t_mesh1 / t_plain, 4),
        })
    else:
        mesh1 = make_mesh(1)
        mesh8 = make_mesh(8)
        t1 = _timed(lambda: render_sharded_dense(scene, meta, li, mesh1,
                                                 spp=spp), reps=1)
        t8 = _timed(lambda: render_sharded_dense(scene, meta, li, mesh8,
                                                 spp=spp), reps=1)
        a = np.asarray(render_sharded_dense(scene, meta, li, mesh1, spp=spp))
        b = np.asarray(render_sharded_dense(scene, meta, li, mesh8, spp=spp))
        out.update({
            "mode": "cpu-fake-mesh",
            "mesh1_mrays": round(rays / t1 / 1e6, 3),
            "mesh8_mrays": round(rays / t8 / 1e6, 3),
            "efficiency_8dev": round(t1 / t8, 4),
            "mesh1_vs_mesh8_maxdiff": float(np.abs(a - b).max()),
        })

    print(json.dumps(out))
    # accumulate both modes into one artifact
    path = os.path.join(_REPO, "bench_scaling.json")
    merged = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged = json.load(f)
        except Exception:
            merged = {}
    merged.update(out)
    with open(path, "w") as f:
        json.dump(merged, f)


if __name__ == "__main__":
    main()
