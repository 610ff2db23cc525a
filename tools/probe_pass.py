#!/usr/bin/env python
"""Probe: where does the production pass spend its time?

Times, at the production packet config (max_leaf/rows from bake):
  1. primary closest-hit trace alone (tile-coherent camera rays)
  2. any-hit shadow trace alone (rays toward the spot light)
  3. diffuse-bounce closest trace (hemisphere dirs from hits)
  4. full render pass (bench.py's exact path)
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

from goblin_tpu.assets import ensure_bunny_obj
from goblin_tpu.integrators import common
from goblin_tpu.integrators.path import make_li
from goblin_tpu.scene.loader import load_scene
from goblin_tpu.scene import intersect as scn
from goblin_tpu.camera import film as film_mod


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
        {"render_method": "path_tracing", "max_ray_depth": 5},
    )
    print(f"config: max_leaf={meta.max_leaf} rows={meta.trace_rows} "
          f"sort={meta.trace_sort}")
    cam = meta.camera
    spec = cam.film
    R = 1 << 16
    # tile-coherent ids like the production pass
    tile = 64
    idx = np.arange(spec.x_res * spec.y_res, dtype=np.int32).reshape(
        spec.y_res, spec.x_res)
    ids = np.concatenate([
        idx[ty:ty + tile, tx:tx + tile].reshape(-1)
        for ty in range(0, spec.y_res, tile)
        for tx in range(0, spec.x_res, tile)
    ])[:R]
    x = (ids % spec.x_res + 0.5).astype(np.float32)
    y = (ids // spec.x_res + 0.5).astype(np.float32)
    ray = cam.generate_ray(jnp.asarray(x), jnp.asarray(y))
    o, d = ray["o"], ray["d"]
    mint = jnp.full(R, 1e-3); maxt = jnp.full(R, 3e37)

    tr1 = jax.jit(lambda o, d: scn.trace_rays(scene, meta, o, d, mint, maxt))
    dt = timeit(tr1, o, d)
    print(f"primary closest: {R/dt/1e6:7.2f} Mrays/s ({dt*1e3:.1f} ms)")

    res = tr1(o, d)
    p = o + res.t[:, None] * d * 0.999
    lpos = jnp.asarray(np.asarray(scene["lights"]["position"])[0])
    wi = lpos - p
    dist = jnp.sqrt(jnp.sum(wi * wi, -1, keepdims=True))
    wi = wi / dist
    sm = dist[:, 0] - 1e-3
    live = res.hit
    tr2 = jax.jit(lambda p, wi: scn.trace_rays(
        scene, meta, p, wi,
        jnp.where(live, 1e-3, scn.BIG_T), jnp.where(live, sm, 0.0),
        any_hit=True))
    dt = timeit(tr2, p, wi)
    print(f"shadow any-hit:  {R/dt/1e6:7.2f} Mrays/s ({dt*1e3:.1f} ms)"
          f"  live={float(live.mean()):.2f}")

    # hemisphere continuation dirs
    rng = np.random.default_rng(0)
    dd = rng.normal(size=(R, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    dd = jnp.asarray(dd)
    tr3 = jax.jit(lambda p, dd: scn.trace_rays(
        scene, meta, p, dd,
        jnp.where(live, 1e-3, scn.BIG_T), jnp.where(live, 3e37, 0.0)))
    dt = timeit(tr3, p, dd)
    print(f"bounce closest:  {R/dt/1e6:7.2f} Mrays/s ({dt*1e3:.1f} ms)"
          f"  live={float(live.mean()):.2f}")

    li = make_li(meta)
    render_pass, _ = common.make_render_pass(scene, meta, li, spp=4,
                                             seed=0, chunk_size=1 << 16)
    color, weight = film_mod.new_film(spec)
    color, weight = render_pass(color, weight, jnp.int32(0))
    jax.block_until_ready((color, weight))
    t0 = time.perf_counter()
    color, weight = render_pass(color, weight, jnp.int32(1))
    jax.block_until_ready((color, weight))
    dt = time.perf_counter() - t0
    n_pix = spec.x_res * spec.y_res
    print(f"full pass:       {dt*1e3:.1f} ms "
          f"({n_pix*9/dt/1e6:.2f} Mrays/s lane-rate)")


if __name__ == "__main__":
    main()
