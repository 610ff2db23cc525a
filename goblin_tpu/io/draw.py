"""Debug draw overlay: project world-space rays/points and rasterize
them onto a rendered image.

Parity with the reference DebugData pipeline (src/GoblinDebugData.h:12-33,
Renderer::drawDebugData src/GoblinRenderer.cpp:667-690, drawLine/drawPoint
src/GoblinUtils.cpp:115-197), redesigned batch-first: all segments are
projected with the camera's worldToScreen in one vectorized call, then
rasterized by sampling T points along every segment and scatter-writing
into the image — the data-parallel analogue of Bresenham (exact integer
Bresenham is a serial per-pixel walk; dense sampling at >= 2x the
screen-length rate covers the same pixels).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


@dataclass
class DebugData:
    """Host-side collector (reference DebugData)."""

    rays: list = field(default_factory=list)  # (p0 (3,), p1 (3,), rgb)
    points: list = field(default_factory=list)  # (p (3,), rgb)

    def add_ray(self, p0, p1, color=(0.0, 1.0, 0.0)):
        self.rays.append((np.asarray(p0, np.float32),
                          np.asarray(p1, np.float32),
                          np.asarray(color, np.float32)))

    def add_point(self, p, color=(1.0, 0.0, 0.0)):
        self.points.append((np.asarray(p, np.float32),
                            np.asarray(color, np.float32)))


def draw_overlay(image, camera, debug: DebugData, samples_per_line=None):
    """Return image with the debug rays/points rasterized on top.

    image: (H, W, 3). Segments whose endpoints fail worldToScreen
    validity (behind lens, off film) are clipped out per sample.
    """
    img = jnp.asarray(image)
    H, W = img.shape[:2]
    if samples_per_line is None:
        samples_per_line = 2 * max(H, W)

    if debug.rays:
        p0 = jnp.asarray(np.stack([r[0] for r in debug.rays]))  # (L,3)
        p1 = jnp.asarray(np.stack([r[1] for r in debug.rays]))
        col = jnp.asarray(np.stack([r[2] for r in debug.rays]))
        ts = jnp.linspace(0.0, 1.0, samples_per_line)
        pw = p0[:, None, :] + ts[None, :, None] * (p1 - p0)[:, None, :]
        flat = pw.reshape(-1, 3)
        sx, sy, _, valid = camera.world_to_screen(flat)
        xi = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, H - 1)
        inside = (
            valid & (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
        )
        c = jnp.repeat(col, samples_per_line, axis=0)
        img = img.at[yi, xi].set(
            jnp.where(inside[:, None], c, img[yi, xi])
        )

    if debug.points:
        p = jnp.asarray(np.stack([q[0] for q in debug.points]))
        col = jnp.asarray(np.stack([q[1] for q in debug.points]))
        sx, sy, _, valid = camera.world_to_screen(p)
        xi = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, H - 1)
        inside = valid & (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
        # 3x3 splat like the reference's drawPoint square
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                xj = jnp.clip(xi + dx, 0, W - 1)
                yj = jnp.clip(yi + dy, 0, H - 1)
                img = img.at[yj, xj].set(
                    jnp.where(inside[:, None], col, img[yj, xj])
                )
    return img
