#!/usr/bin/env python
"""Probe: SMEM packet kernel vs leaf size + packet coherence, on real TPU."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax, jax.numpy as jnp, numpy as np
from goblin_tpu.assets import ensure_bunny_obj
from goblin_tpu.scene.loader import load_scene
from goblin_tpu.accel.bvh import build_bvh
from goblin_tpu.ops.pallas_trace import pack_scene_smem, trace_packets_smem


def timeit(f, *a, iters=5):
    o = f(*a); jax.block_until_ready(o)
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
    v0 = ts[:, 0:3]; v1 = v0 + ts[:, 3:6]; v2 = v0 + ts[:, 6:9]

    R = 1 << 16
    rng = np.random.default_rng(0)
    cam = meta.camera
    spec = cam.film
    # tile-coherent: 32x32 pixel tiles -> 1024-ray packets
    TS = 32
    tx = spec.x_res // TS
    ids = []
    n = 0
    for tyi in range(spec.y_res // TS):
        for txi in range(tx):
            if n >= R: break
            yy, xx = np.meshgrid(np.arange(TS), np.arange(TS), indexing="ij")
            ids.append(((tyi * TS + yy) * spec.x_res + txi * TS + xx).ravel())
            n += TS * TS
    ids = np.concatenate(ids)[:R]
    x = (ids % spec.x_res + 0.5).astype(np.float32)
    y = (ids // spec.x_res + 0.5).astype(np.float32)
    ray = cam.generate_ray(jnp.asarray(x), jnp.asarray(y))
    o_t, d_t = np.asarray(ray["o"]), np.asarray(ray["d"])
    # row-ordered (old "coherent")
    ids2 = np.arange(R) % (spec.x_res * spec.y_res)
    x2 = (ids2 % spec.x_res + 0.5).astype(np.float32)
    y2 = (ids2 // spec.x_res + 0.5).astype(np.float32)
    ray2 = cam.generate_ray(jnp.asarray(x2), jnp.asarray(y2))
    o_r, d_r = np.asarray(ray2["o"]), np.asarray(ray2["d"])
    # incoherent
    center = v0.mean(axis=0)
    ext = (v0.max(0) - v0.min(0)).max()
    o_i = (center + rng.uniform(-0.5, 0.5, (R, 3)) * ext).astype(np.float32)
    d_i = rng.normal(size=(R, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=-1, keepdims=True)
    mint = jnp.full(R, 1e-4, jnp.float32)
    maxt = jnp.full(R, 3e38, jnp.float32)

    for K in (8, 16, 32, 64):
        bvh = build_bvh(v0, v1, v2, max_leaf=K)
        soup = ts[bvh.order]
        sm = pack_scene_smem(bvh.bounds, bvh.meta, soup)
        smem_kb = (sm["bounds_flat"].nbytes + sm["meta_flat"].nbytes) / 1024
        bf = jnp.asarray(sm["bounds_flat"]); mf = jnp.asarray(sm["meta_flat"])
        tj = jnp.asarray(sm["tris"])

        dev = {name: (jax.device_put(jnp.asarray(o)), jax.device_put(jnp.asarray(d)))
               for name, o, d in [("tile", o_t, d_t), ("row", o_r, d_r),
                                  ("inc", o_i, d_i)]}

        def run(o, d):
            return trace_packets_smem(bf, mf, tj, o, d, mint, maxt, max_leaf=K)

        line = f"K={K:3d} nodes={bvh.num_nodes:6d} smem={smem_kb:6.0f}KB"
        for name, (o, d) in dev.items():
            try:
                dt = timeit(run, o, d)
                line += f"  {name}={R/dt/1e6:7.2f}M"
            except Exception as e:
                line += f"  {name}=FAIL({type(e).__name__}: {str(e)[:80]})"
        print(line, flush=True)


if __name__ == "__main__":
    main()
