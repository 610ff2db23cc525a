#!/usr/bin/env python
"""Probe: does ray reordering (direction octant + origin Morton cell)
restore packet coherence for bounce rays? Measures sorted-vs-unsorted
bounce throughput including the sort cost itself, on real TPU."""
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
from functools import partial


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
    R = 1 << 18
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

    K = 16
    bvh = build_bvh(v0, v1, v2, max_leaf=K)
    soup = ts[bvh.order]
    packed = pack_scene(bvh.bounds, bvh.meta, soup)
    nodes = jax.device_put(packed["nodes"])
    metap = jax.device_put(packed["meta"])
    trisp = jax.device_put(packed["tris"])
    nb = jax.device_put(bvh.bounds)
    nm = jax.device_put(bvh.meta)
    sp = jax.device_put(soup)

    res = jnp_trace(nb, nm, sp, o_p, d_p, mint, maxt, max_leaf=K)
    hitm = np.asarray(res.hit)
    print(f"primary hit fraction: {hitm.mean():.3f}")
    p = np.asarray(o_p) + np.where(hitm, np.asarray(res.t), 1.0)[:, None] \
        * np.asarray(d_p)
    rng = np.random.default_rng(1)
    dvec = rng.normal(size=(R, 3)).astype(np.float32)
    dvec /= np.linalg.norm(dvec, axis=-1, keepdims=True)
    o_b = jax.device_put(p.astype(np.float32))
    d_b = jax.device_put(dvec)
    # mask dead lanes like the real wavefront: miss lanes get maxt=0
    maxt_live = jax.device_put(np.where(hitm, 3e38, 0.0).astype(np.float32))

    wmin = p.min(axis=0)
    wext = float((p.max(axis=0) - wmin).max())

    def morton3(q):
        # 10-bit per axis morton interleave
        def part(v):
            v = v.astype(jnp.uint32)
            v = (v | (v << 16)) & 0x030000FF
            v = (v | (v << 8)) & 0x0300F00F
            v = (v | (v << 4)) & 0x030C30C3
            v = (v | (v << 2)) & 0x09249249
            return v
        return part(q[:, 0]) | (part(q[:, 1]) << 1) | (part(q[:, 2]) << 2)

    @partial(jax.jit, static_argnames=("nbits",))
    def sort_key(o, d, live, nbits=6):
        oct_ = ((d[:, 0] >= 0).astype(jnp.uint32)
                | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
                | ((d[:, 2] >= 0).astype(jnp.uint32) << 2))
        q = jnp.clip((o - wmin) / wext * (2 ** nbits - 1), 0, 2 ** nbits - 1)
        m = morton3(q)
        key = (oct_ << 30) | m
        key = jnp.where(live, key, jnp.uint32(0xFFFFFFFF))  # dead last
        return jnp.argsort(key)

    def trace_pk(oo, dd, mn, mx):
        return trace_packets(nodes, metap, trisp, oo, dd, mn, mx,
                             max_leaf=K, rows=16)

    @jax.jit
    def traced_sorted(oo, dd, mn, mx, live):
        perm = sort_key(oo, dd, live)
        h, t, tri, b1, b2 = trace_packets(
            nodes, metap, trisp, oo[perm], dd[perm], mn[perm], mx[perm],
            max_leaf=K, rows=16)
        inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(perm.shape[0]))
        return h[inv], t[inv], tri[inv], b1[inv], b2[inv]

    live = jax.device_put(hitm)

    dt = timeit(trace_pk, o_b, d_b, mint, maxt)
    print(f"bounce unsorted (all live):      {R/dt/1e6:.2f} Mrays/s")
    dt = timeit(trace_pk, o_b, d_b, mint, maxt_live)
    print(f"bounce unsorted (dead masked):   {R/dt/1e6:.2f} Mrays/s")
    dt = timeit(traced_sorted, o_b, d_b, mint, maxt, jnp.ones(R, bool))
    print(f"bounce sorted   (all live):      {R/dt/1e6:.2f} Mrays/s")
    dt = timeit(traced_sorted, o_b, d_b, mint, maxt_live, live)
    print(f"bounce sorted   (dead masked):   {R/dt/1e6:.2f} Mrays/s")

    # sort overhead alone
    @jax.jit
    def just_sort(oo, dd, live):
        perm = sort_key(oo, dd, live)
        return oo[perm], dd[perm]
    dt = timeit(just_sort, o_b, d_b, live)
    print(f"sort+permute alone: {dt*1e3:.2f} ms for {R} rays")

    # sorted shadow rays to area light point
    d_s = jax.device_put(np.tile(
        np.float32([0.1, 0.95, 0.1]) / np.linalg.norm([0.1, 0.95, 0.1]),
        (R, 1)))

    @jax.jit
    def shadow_sorted(oo, dd, mn, mx, live):
        perm = sort_key(oo, dd, live)
        h, *_ = trace_packets(
            nodes, metap, trisp, oo[perm], dd[perm], mn[perm], mx[perm],
            max_leaf=K, any_hit=True, rows=16)
        inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(perm.shape[0]))
        return h[inv]
    dt = timeit(shadow_sorted, o_b, d_s, mint, maxt_live, live)
    print(f"shadow sorted   (dead masked):   {R/dt/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
