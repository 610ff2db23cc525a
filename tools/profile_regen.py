#!/usr/bin/env python
"""Attribute the regen step's on-chip cost: full step vs with the shadow
trace stubbed vs with both traces stubbed. Tuning tool."""
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


def timeit(f, *args, iters=3):
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
        {"render_method": "path_tracing", "max_ray_depth": 5,
         "sample_per_pixel": 4},
    )
    R = 1 << 16

    # representative mixed state: run the real driver internals 3 steps
    import goblin_tpu.integrators.wavefront as wf

    # reach into render_wavefront? simpler: re-create a state by tracing
    # camera rays for a mixed set and classifying
    rng = np.random.default_rng(0)
    spec = meta.camera.film
    n_pix = spec.x_res * spec.y_res
    ids = jnp.asarray(rng.integers(0, n_pix, R).astype(np.int32))
    from goblin_tpu.integrators import common
    x, y = common.pixel_samples(0, ids, spec.x_res, jnp.int32(0), 2)
    ray = meta.camera.generate_ray(x, y)

    @jax.jit
    def prim(o, d, mint, maxt):
        return scn.intersect(scene, meta, o, d, mint, maxt)

    frag = prim(ray["o"], ray["d"], ray["mint"], ray["maxt"])
    jax.block_until_ready(frag)
    dt = timeit(prim, ray["o"], ray["d"], ray["mint"], ray["maxt"])
    print(f"closest-hit, coherent random-pixel rays: {dt*1e3:8.1f} ms")

    # incoherent bounce-like rays: random directions from hit points
    d2 = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    dt = timeit(prim, frag["p"], d2, frag["eps"],
                jnp.full((R,), 3e37, jnp.float32))
    print(f"closest-hit, incoherent bounce rays:     {dt*1e3:8.1f} ms")

    # mixture (half fresh camera, half bounce) — the regen regime
    mix_o = jnp.where((jnp.arange(R) % 2 == 0)[:, None], ray["o"], frag["p"])
    mix_d = jnp.where((jnp.arange(R) % 2 == 0)[:, None], ray["d"], d2)
    dt = timeit(prim, mix_o, mix_d, ray["mint"],
                jnp.full((R,), 3e37, jnp.float32))
    print(f"closest-hit, mixed regen-style rays:     {dt*1e3:8.1f} ms")

    # any-hit shadow
    @jax.jit
    def sh(o, d, mint, maxt):
        return scn.occluded_attenuated(scene, meta, o, d, mint, maxt)

    dt = timeit(sh, frag["p"], d2, frag["eps"],
                jnp.full((R,), 10.0, jnp.float32))
    print(f"any-hit, incoherent shadow rays:         {dt*1e3:8.1f} ms")

    # dead-lane trace (all masked)
    dt = timeit(prim, mix_o, mix_d, jnp.full((R,), scn.BIG_T),
                jnp.zeros((R,)))
    print(f"closest-hit, all-dead rays:              {dt*1e3:8.1f} ms")

    # shade-side cost: gather_material + bsdf trio
    from goblin_tpu.integrators.materials import gather_material
    from goblin_tpu.shading import bsdf as bx

    @jax.jit
    def shade(frag):
        mat = gather_material(scene, meta, frag, u_mask=jnp.zeros(R))
        f_l = bx.bsdf_eval(mat, frag["ns"], frag["wo"], d2, bx.BSDF_ALL)
        pdf = bx.bsdf_pdf(mat, frag["ns"], frag["wo"], d2, bx.BSDF_ALL)
        bs = bx.bsdf_sample(mat, frag["ns"], frag["dpdu"], frag["wo"],
                            jnp.full(R, 0.3), jnp.full(R, 0.7),
                            jnp.full(R, 0.5), bx.BSDF_ALL)
        return f_l, pdf, bs

    dt = timeit(shade, frag)
    print(f"gather_material + bsdf eval/pdf/sample:  {dt*1e3:8.1f} ms")

    # L_buf scatter + cumsum regen logic
    total = n_pix * 4
    L_buf = jnp.zeros((total, 3), jnp.float32)
    retire = jnp.asarray(rng.random(R) < 0.4)
    slot = jnp.asarray(rng.integers(0, total, R).astype(np.int32))
    Lv = jnp.ones((R, 3), jnp.float32)

    @jax.jit
    def scatter(L_buf, retire, slot, Lv):
        L_buf = L_buf.at[slot].add(jnp.where(retire[:, None], Lv, 0.0))
        rank = jnp.cumsum(retire.astype(jnp.int32)) - 1
        return L_buf, rank

    dt = timeit(scatter, L_buf, retire, slot, Lv)
    print(f"L_buf scatter-add + cumsum:              {dt*1e3:8.1f} ms")

    # pixel-id gather
    tab = jnp.asarray(np.arange(n_pix, dtype=np.int32))

    @jax.jit
    def pgather(k):
        return tab[k % n_pix]

    dt = timeit(pgather, slot)
    print(f"pixel-id gather (64k from 196k):         {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
