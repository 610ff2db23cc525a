"""Texture programs: baked, branch-free texture evaluation.

The reference's Texture class tree (src/GoblinTexture.{h,cpp}) — constant /
checkerboard / scale / image with uv or spherical mappings — becomes a
static per-scene *program*: textures are topologically sorted at bake time
and evaluated in order as dense vectorized ops over the whole wavefront,
each lane then gathers its material's texture value by id. With the
handful of textures a scene declares this is cheaper on TPU than per-lane
dispatch, and it keeps control flow static for XLA.

Image data lives in one flat f32 atlas; each image texture stores
(offset, height, width, channels). Nearest and bilinear lookups are
implemented; trilinear/EWA MIPMap filtering is future work (reference
src/GoblinTexture.cpp:131-271).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

TEX_CONSTANT = 0
TEX_CHECKERBOARD = 1
TEX_SCALE = 2
TEX_IMAGE = 3

MAP_UV = 0
MAP_SPHERICAL = 1

ADDRESS_REPEAT = 0
ADDRESS_CLAMP = 1
ADDRESS_BORDER = 2

FILTER_NEAREST = 0
FILTER_BILINEAR = 1


@dataclass
class TexSpec:
    """Host-side texture description (one node of the program)."""

    kind: int = TEX_CONSTANT
    value: np.ndarray = field(default_factory=lambda: np.ones(3, np.float32))
    # checkerboard / scale children (indices into the same spec list)
    child0: int = -1
    child1: int = -1
    scale: np.ndarray = field(default_factory=lambda: np.ones(3, np.float32))
    # uv mapping: uv' = uv * map_scale + map_offset
    map_scale: tuple = (1.0, 1.0)
    map_offset: tuple = (0.0, 0.0)
    # image
    image: np.ndarray | None = None  # (H, W, C) float32
    address: int = ADDRESS_REPEAT
    filter: int = FILTER_NEAREST
    gamma: float = 1.0
    # checkerboard filtering flag (reference box-filtered antialiasing)
    checker_filter: bool = False


class TextureSystem:
    """Bakes a list of TexSpec into device arrays + an eval program."""

    def __init__(self, specs: list[TexSpec]):
        self.specs = specs
        self.order = self._topo_order()
        # build atlas
        chunks = []
        offset = 0
        self.image_info = {}
        for i, s in enumerate(specs):
            if s.kind == TEX_IMAGE and s.image is not None:
                img = np.asarray(s.image, dtype=np.float32)
                if s.gamma != 1.0:
                    img = np.power(np.maximum(img, 0.0), s.gamma)
                h, w = img.shape[:2]
                c = img.shape[2] if img.ndim == 3 else 1
                img = img.reshape(h, w, c)
                if c < 3:
                    img = np.repeat(img[:, :, :1], 3, axis=2)
                self.image_info[i] = (offset, h, w)
                chunks.append(img[:, :, :3].reshape(-1))
                offset += h * w * 3
        self.atlas = (
            jnp.asarray(np.concatenate(chunks))
            if chunks
            else jnp.zeros((3,), jnp.float32)
        )

    def _topo_order(self):
        order, seen = [], set()

        def visit(i):
            if i < 0 or i in seen:
                return
            s = self.specs[i]
            visit(s.child0)
            visit(s.child1)
            seen.add(i)
            order.append(i)

        for i in range(len(self.specs)):
            visit(i)
        return order

    # -- evaluation --------------------------------------------------------

    def _eval_image(self, spec_id, uv):
        s = self.specs[spec_id]
        off, h, w = self.image_info[spec_id]
        u = uv[..., 0] * s.map_scale[0] + s.map_offset[0]
        v = uv[..., 1] * s.map_scale[1] + s.map_offset[1]

        def addr(x, n):
            if s.address == ADDRESS_REPEAT:
                return jnp.mod(x, n)
            return jnp.clip(x, 0, n - 1)

        if s.filter == FILTER_NEAREST:
            xi = jnp.floor(u * w).astype(jnp.int32)
            yi = jnp.floor(v * h).astype(jnp.int32)
            inside = (
                (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                if s.address == ADDRESS_BORDER
                else None
            )
            xi, yi = addr(xi, w), addr(yi, h)
            base = off + (yi * w + xi) * 3
            rgb = jnp.stack(
                [jnp.take(self.atlas, base + k, mode="clip") for k in range(3)],
                axis=-1,
            )
            if inside is not None:
                rgb = jnp.where(inside[..., None], rgb, 0.0)
            return rgb
        # bilinear
        fx = u * w - 0.5
        fy = v * h - 0.5
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        tx = fx - x0
        ty = fy - y0
        out = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                xi, yi = x0 + dx, y0 + dy
                if s.address == ADDRESS_BORDER:
                    inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                else:
                    inside = None
                xi, yi = addr(xi, w), addr(yi, h)
                base = off + (yi * w + xi) * 3
                rgb = jnp.stack(
                    [jnp.take(self.atlas, base + k, mode="clip") for k in range(3)],
                    axis=-1,
                )
                if inside is not None:
                    rgb = jnp.where(inside[..., None], rgb, 0.0)
                wgt = (jnp.where(dx, tx, 1 - tx) * jnp.where(dy, ty, 1 - ty))[
                    ..., None
                ]
                out = out + wgt * rgb
        return out

    def eval_all(self, uv):
        """Evaluate every texture at uv (..., 2) -> (X, ..., 3) stack."""
        n = len(self.specs)
        vals: list = [None] * n
        for i in self.order:
            s = self.specs[i]
            if s.kind == TEX_CONSTANT:
                v = jnp.broadcast_to(
                    jnp.asarray(s.value, dtype=jnp.float32), uv.shape[:-1] + (3,)
                )
            elif s.kind == TEX_CHECKERBOARD:
                u_ = uv[..., 0] * s.map_scale[0] + s.map_offset[0]
                v_ = uv[..., 1] * s.map_scale[1] + s.map_offset[1]
                even = (
                    jnp.floor(u_).astype(jnp.int32) + jnp.floor(v_).astype(jnp.int32)
                ) % 2 == 0
                c0 = vals[s.child0] if s.child0 >= 0 else jnp.ones_like(uv[..., :1])
                c1 = vals[s.child1] if s.child1 >= 0 else jnp.zeros_like(uv[..., :1])
                v = jnp.where(even[..., None], c0, c1)
            elif s.kind == TEX_SCALE:
                base = vals[s.child0]
                v = base * jnp.asarray(s.scale, dtype=jnp.float32)
            elif s.kind == TEX_IMAGE:
                v = self._eval_image(i, uv)
            else:
                raise ValueError(s.kind)
            vals[i] = v
        stacked = jnp.stack(
            [vals[i] if vals[i] is not None else jnp.zeros(uv.shape[:-1] + (3,))
             for i in range(n)],
            axis=0,
        )
        return stacked

    def gather(self, stacked, tex_ids):
        """Per-lane texture value: stacked (X, R, 3), tex_ids (R,) -> (R, 3)."""
        return jnp.take_along_axis(
            stacked, tex_ids[None, :, None].astype(jnp.int32), axis=0
        )[0]
