"""Wavefront render driver shared by all integrators.

The reference's per-thread tile loop (RenderTask::run,
src/GoblinRenderer.cpp:29-52) becomes: for each spp index, jit-render a
flat chunk of pixels — raygen -> Li (integrator-specific batched fn) ->
film scatter-add — with film arrays donated across chunk calls. Sample
decorrelation uses the stateless hash streams (core/rng.py) with
per-pixel stratification over a ceil(sqrt(spp))^2 grid, the wavefront
analogue of the reference's stratified Sampler (spp rounded to a square,
src/GoblinSampler.cpp:23-33,63-197).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import film as film_mod
from ..core.rng import hash_uniform

# reserved dimension ids for the hash streams
DIM_PIXEL_X = 0
DIM_PIXEL_Y = 1
DIM_LENS_U = 2
DIM_LENS_V = 3
DIM_BASE = 4  # integrator dims start here
# bounce id used for camera-sample dims
BOUNCE_CAMERA = 0x7FFF


def spp_grid(spp: int) -> int:
    """Stratification grid edge: smallest n with n*n >= spp (reference
    roundToSquare semantics — spp is rounded up to a perfect square)."""
    return int(np.ceil(np.sqrt(max(1, spp))))


def pixel_samples(seed, pixel_ids, x_res, s_idx, n_grid):
    """Stratified-jittered continuous image coords for sample index s_idx."""
    px = (pixel_ids % x_res).astype(jnp.float32)
    py = (pixel_ids // x_res).astype(jnp.float32)
    sx = (s_idx % n_grid).astype(jnp.float32)
    sy = (s_idx // n_grid).astype(jnp.float32)
    jx = hash_uniform(seed, pixel_ids, s_idx, BOUNCE_CAMERA, DIM_PIXEL_X)
    jy = hash_uniform(seed, pixel_ids, s_idx, BOUNCE_CAMERA, DIM_PIXEL_Y)
    x = px + (sx + jx) / n_grid
    y = py + (sy + jy) / n_grid
    return x, y


def render(scene, meta, li_fn, spp=None, seed=None, chunk_size=1 << 14,
           report=None):
    """Render with a batched radiance function.

    li_fn(scene, meta, ray, pixel_ids, s_idx, seed) -> (R, 3) radiance.
    Returns the resolved image (H, W, 3) jnp array.
    """
    cam = meta.camera
    spec = cam.film
    settings = meta.settings
    if spp is None:
        spp = int(settings.get("sample_per_pixel", 1))
    if seed is None:
        seed = int(settings.get("seed", 0))
    n_grid = spp_grid(spp)
    n_spp = n_grid * n_grid

    xs_, xc, ys_, yc = spec.crop_window()
    pixel_ids_all = (
        (np.arange(ys_, ys_ + yc)[:, None] * spec.x_res
         + np.arange(xs_, xs_ + xc)[None, :]).reshape(-1).astype(np.int32)
    )
    n_pix = pixel_ids_all.size
    n_chunks = (n_pix + chunk_size - 1) // chunk_size
    # pad to full chunks with repeated last pixel, weight-masked out
    pad = n_chunks * chunk_size - n_pix
    valid_all = np.ones(n_pix + pad, bool)
    if pad:
        pixel_ids_all = np.concatenate(
            [pixel_ids_all, np.full(pad, pixel_ids_all[-1], np.int32)]
        )
        valid_all[n_pix:] = False

    @partial(jax.jit, donate_argnums=(0, 1), static_argnames=())
    def render_chunk(color, weight, pixel_ids, valid, s_idx):
        x, y = pixel_samples(seed, pixel_ids, spec.x_res, s_idx, n_grid)
        lu = hash_uniform(seed, pixel_ids, s_idx, BOUNCE_CAMERA, DIM_LENS_U)
        lv = hash_uniform(seed, pixel_ids, s_idx, BOUNCE_CAMERA, DIM_LENS_V)
        ray = cam.generate_ray(x, y, lu, lv)
        L = li_fn(scene, meta, ray, pixel_ids, s_idx, seed)
        L = jnp.where(valid[:, None], L, jnp.nan)  # NaN -> splat discards
        return film_mod.splat(spec, color, weight, x, y, L)

    color, weight = film_mod.new_film(spec)
    for s in range(n_spp):
        for c in range(n_chunks):
            sl = slice(c * chunk_size, (c + 1) * chunk_size)
            color, weight = render_chunk(
                color, weight,
                jnp.asarray(pixel_ids_all[sl]),
                jnp.asarray(valid_all[sl]),
                jnp.int32(s),
            )
        if report is not None:
            report(s + 1, n_spp)
    return film_mod.to_image(color, weight, normalize=True)
