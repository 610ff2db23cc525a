#!/usr/bin/env python
"""Probe: VMEM packet kernel (trace_packets) vs leaf size K and packet
rows, on real TPU. Ray sets: tile-coherent primary, diffuse bounce,
any-hit shadow. Parity-checked against the jnp lockstep traversal."""
import json
import os
import sys
import time

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
from goblin_tpu.ops.pallas_trace import pack_scene, trace_packets


def timeit(f, *a, iters=5):
    o = f(*a)
    jax.block_until_ready(o)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        o = f(*a)
        jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    return best


def tile_coherent_ids(spec, R, ts=32):
    ids = []
    n = 0
    for tyi in range(spec.y_res // ts):
        for txi in range(spec.x_res // ts):
            if n >= R:
                break
            yy, xx = np.meshgrid(np.arange(ts), np.arange(ts), indexing="ij")
            ids.append(((tyi * ts + yy) * spec.x_res + txi * ts + xx).ravel())
            n += ts * ts
    ids = np.concatenate(ids)
    reps = (R + ids.size - 1) // ids.size
    return np.tile(ids, reps)[:R]


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
    T = v0.shape[0]
    print(f"tris={T}", flush=True)

    R = 1 << 18
    cam = meta.camera
    spec = cam.film

    ids = tile_coherent_ids(spec, R)
    x = (ids % spec.x_res + 0.5).astype(np.float32)
    y = (ids // spec.x_res + 0.5).astype(np.float32)
    ray = cam.generate_ray(jnp.asarray(x), jnp.asarray(y))
    o_p = jax.device_put(np.asarray(ray["o"]))
    d_p = jax.device_put(np.asarray(ray["d"]))
    mint = jax.device_put(np.full(R, 1e-4, np.float32))
    maxt = jax.device_put(np.full(R, 3e38, np.float32))

    results = {}
    for K in [4, 8, 16, 32]:
        bvh = build_bvh(v0, v1, v2, max_leaf=K)
        soup = ts[bvh.order]
        packed = pack_scene(bvh.bounds, bvh.meta, soup)
        nodes = jax.device_put(packed["nodes"])
        metap = jax.device_put(packed["meta"])
        trisp = jax.device_put(packed["tris"])
        nb = jax.device_put(bvh.bounds)
        nm = jax.device_put(bvh.meta)
        sp = jax.device_put(soup)

        # parity check (64k subset)
        sub = slice(0, 1 << 16)
        try:
            hp, tp, trip, _, _ = trace_packets(
                nodes, metap, trisp, o_p[sub], d_p[sub], mint[sub], maxt[sub],
                max_leaf=K)
            rj = jnp_trace(nb, nm, sp, o_p[sub], d_p[sub], mint[sub],
                           maxt[sub], max_leaf=K)
            okm = bool(jnp.mean((hp == rj.hit).astype(jnp.float32)) > 0.9999)
            tok = bool(
                jnp.max(jnp.where(hp & rj.hit, jnp.abs(tp - rj.t), 0.0)) < 1e-3
            )
            print(f"K={K} parity hit={okm} t={tok}", flush=True)
        except Exception as e:
            print(f"K={K} parity FAIL({type(e).__name__}: {str(e)[:120]})",
                  flush=True)
            continue

        # diffuse bounce rays from primary hits (realistic secondary set)
        res_full = jnp_trace(nb, nm, sp, o_p, d_p, mint, maxt, max_leaf=K)
        hitm = np.asarray(res_full.hit)
        tfull = np.asarray(res_full.t)
        p = np.asarray(o_p) + np.where(hitm, tfull, 1.0)[:, None] * np.asarray(d_p)
        rng = np.random.default_rng(1)
        dvec = rng.normal(size=(R, 3)).astype(np.float32)
        dvec /= np.linalg.norm(dvec, axis=-1, keepdims=True)
        o_b = jax.device_put(p.astype(np.float32))
        d_b = jax.device_put(dvec)
        # shadow rays: toward the area light (up)
        d_s = jax.device_put(
            np.tile(np.float32([0.1, 0.95, 0.1]) / np.linalg.norm([0.1, 0.95, 0.1]),
                    (R, 1)))

        for rows in [8, 16, 32]:
            for name, (oo, dd, ah) in {
                "primary": (o_p, d_p, False),
                "bounce": (o_b, d_b, False),
                "shadow": (o_b, d_s, True),
            }.items():
                try:
                    dt = timeit(
                        lambda: trace_packets(
                            nodes, metap, trisp, oo, dd, mint, maxt,
                            max_leaf=K, any_hit=ah, rows=rows))
                    mrays = R / dt / 1e6
                    results[f"K{K}_r{rows}_{name}"] = round(mrays, 2)
                    print(f"K={K} rows={rows} {name}: {mrays:.1f} Mrays/s",
                          flush=True)
                except Exception as e:
                    results[f"K{K}_r{rows}_{name}"] = f"FAIL({type(e).__name__})"
                    print(f"K={K} rows={rows} {name}: "
                          f"FAIL({type(e).__name__}: {str(e)[:100]})", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
