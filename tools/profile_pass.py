#!/usr/bin/env python
"""Stage-level timing of the production render pass on the real chip.

Times, separately jitted: primary intersect, shadow any-hit, material
gather + BSDF eval/sample, and the full li/pass — to find where the
263 ms/pass actually goes. Tuning tool, not part of the driver bench.
"""
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
from goblin_tpu.scene import intersect as scn
from goblin_tpu.integrators.materials import gather_material
from goblin_tpu.shading import bsdf as bx
from goblin_tpu.integrators import common
from goblin_tpu.integrators.path import make_li
from goblin_tpu.camera import film as film_mod


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
        {"render_method": "path_tracing", "max_ray_depth": 5},
    )
    cam = meta.camera
    spec = cam.film
    n_pix = spec.x_res * spec.y_res
    R = 1 << 16

    ids = jnp.arange(R, dtype=jnp.int32) % n_pix
    x, y = common.pixel_samples(0, ids, spec.x_res, jnp.int32(0), 2)
    ray = cam.generate_ray(x, y)

    o, d = ray["o"], ray["d"]
    mint = jnp.full(R, 1e-4, jnp.float32)
    maxt = jnp.full(R, 3e38, jnp.float32)

    @jax.jit
    def f_intersect(o, d, mint, maxt):
        return scn.intersect(scene, meta, o, d, mint, maxt)

    dt = timeit(f_intersect, o, d, mint, maxt)
    print(f"intersect (closest, {R} rays): {dt*1e3:8.2f} ms  {R/dt/1e6:7.2f} Mrays/s")

    @jax.jit
    def f_occl(o, d, mint, maxt):
        return scn.occluded_attenuated(scene, meta, o, d, mint, maxt)

    dt = timeit(f_occl, o, d, mint, maxt)
    print(f"occluded_attenuated ({R} rays): {dt*1e3:8.2f} ms  {R/dt/1e6:7.2f} Mrays/s")

    frag = jax.block_until_ready(f_intersect(o, d, mint, maxt))

    @jax.jit
    def f_shade(frag):
        mat = gather_material(scene, meta, frag, u_mask=jnp.zeros(R))
        wi = frag["ns"]
        f_l = bx.bsdf_eval(mat, frag["ns"], frag["wo"], wi, bx.BSDF_ALL)
        pdf = bx.bsdf_pdf(mat, frag["ns"], frag["wo"], wi, bx.BSDF_ALL)
        bs = bx.bsdf_sample(
            mat, frag["ns"], frag["dpdu"], frag["wo"],
            jnp.full(R, 0.3), jnp.full(R, 0.7), jnp.full(R, 0.5), bx.BSDF_ALL,
        )
        return f_l, pdf, bs

    dt = timeit(f_shade, frag)
    print(f"gather_material+bsdf eval/pdf/sample: {dt*1e3:8.2f} ms")

    # full li on one chunk
    li = make_li(meta)

    @jax.jit
    def f_li(o, d):
        ray2 = dict(ray)
        return li(scene, meta, ray2, ids, jnp.int32(0), 0)

    dt = timeit(f_li, o, d, iters=3)
    print(f"full li chunk ({R}): {dt*1e3:8.2f} ms")

    # full pass
    render_pass, _ = common.make_render_pass(scene, meta, li, spp=4, seed=0,
                                             chunk_size=1 << 16)
    color, weight = film_mod.new_film(spec)
    color, weight = render_pass(color, weight, jnp.int32(0))
    jax.block_until_ready((color, weight))
    t0 = time.perf_counter()
    for s in range(3):
        color, weight = render_pass(color, weight, jnp.int32(s))
    jax.block_until_ready((color, weight))
    dt = (time.perf_counter() - t0) / 3
    print(f"full pass ({n_pix} pix): {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
