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
    # mapping kind; spherical uses world_to_tex on the hit position
    mapping: int = MAP_UV
    world_to_tex: np.ndarray | None = None  # (4,4), spherical mapping only


class TextureSystem:
    """Bakes a list of TexSpec into device arrays + an eval program."""

    def __init__(self, specs: list[TexSpec]):
        self.specs = specs
        self.order = self._topo_order()
        # per-spec constant table: TEX_CONSTANT value / TEX_SCALE factor.
        # Lives in the scene pytree (scene["tex_const"]) so gradients flow
        # to material constants (Kd etc.) — the differentiable-parameter
        # analogue of the reference's ConstantTexture values.
        def _const_row(s):
            v = np.asarray(
                s.scale if s.kind == TEX_SCALE else s.value, np.float32
            ).reshape(-1)
            return np.broadcast_to(v[:3] if v.size >= 3 else v[:1], (3,))

        self.const = jnp.asarray(
            np.stack([_const_row(s) for s in specs]).astype(np.float32)
            if specs else np.zeros((0, 3), np.float32)
        )
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

    def _eval_image(self, spec_id, uv, atlas=None):
        s = self.specs[spec_id]
        if atlas is None:
            atlas = self.atlas
        off, h, w = self.image_info[spec_id]
        # uv arrives pre-mapped by _spec_uv (scale/offset or spherical)
        u = uv[..., 0]
        v = uv[..., 1]

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
                [jnp.take(atlas, base + k, mode="clip") for k in range(3)],
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
                    [jnp.take(atlas, base + k, mode="clip") for k in range(3)],
                    axis=-1,
                )
                if inside is not None:
                    rgb = jnp.where(inside[..., None], rgb, 0.0)
                wgt = (jnp.where(dx, tx, 1 - tx) * jnp.where(dy, ty, 1 - ty))[
                    ..., None
                ]
                out = out + wgt * rgb
        return out

    def _spec_uv(self, s, uv, p):
        """Per-spec texture coordinates: uv mapping (scale+offset) or
        spherical mapping of the world position (reference
        SphericalMapping, src/GoblinTexture.cpp:293-307)."""
        if s.mapping == MAP_SPHERICAL and p is not None:
            m = np.asarray(s.world_to_tex, np.float32)
            q = p @ m[:3, :3].T + m[:3, 3]
            ln = jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=-1), 1e-30))
            vec = q / ln[..., None]
            theta = jnp.arccos(jnp.clip(vec[..., 2], -1.0, 1.0))
            phi = jnp.arctan2(vec[..., 1], vec[..., 0])
            phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
            return jnp.stack(
                [phi / (2 * jnp.pi), theta / jnp.pi], axis=-1
            )
        return jnp.stack(
            [
                uv[..., 0] * s.map_scale[0] + s.map_offset[0],
                uv[..., 1] * s.map_scale[1] + s.map_offset[1],
            ],
            axis=-1,
        )

    def eval_all(self, uv, atlas=None, const=None, p=None, duv=None):
        """Evaluate every texture at uv (..., 2) -> (X, ..., 3) stack.

        atlas/const: scene-pytree arrays (scene["tex_atlas"] /
        scene["tex_const"]) so texture data sits on the differentiation
        path; defaults to the baked copies. p: world positions for
        spherical mappings. duv: optional (..., 2) uv filter footprint for
        box-filtered checkerboards (reference integrateChecker,
        src/GoblinTexture.cpp:371-416).
        """
        if const is None:
            const = self.const
        n = len(self.specs)
        vals: list = [None] * n
        for i in self.order:
            s = self.specs[i]
            if s.kind == TEX_CONSTANT:
                v = jnp.broadcast_to(const[i], uv.shape[:-1] + (3,))
            elif s.kind == TEX_CHECKERBOARD:
                suv = self._spec_uv(s, uv, p)
                u_, v_ = suv[..., 0], suv[..., 1]
                c0 = vals[s.child0] if s.child0 >= 0 else jnp.ones_like(uv[..., :1])
                c1 = vals[s.child1] if s.child1 >= 0 else jnp.zeros_like(uv[..., :1])
                if s.checker_filter and duv is not None:
                    # analytic box filter: fraction of the [u-w,u+w]x[v-w,v+w]
                    # footprint landing on texture1 (checker "even" squares)
                    wu = jnp.maximum(
                        jnp.abs(duv[..., 0]) * abs(s.map_scale[0]), 1e-8
                    )
                    wv = jnp.maximum(
                        jnp.abs(duv[..., 1]) * abs(s.map_scale[1]), 1e-8
                    )

                    def stair(x):
                        # integral of the 1-period square wave indicator of
                        # "even cell" from 0 to x
                        per = jnp.floor(x / 2.0)
                        r = x - 2.0 * per
                        return per + jnp.minimum(r, 1.0)

                    def frac_even(c, w):
                        return (stair(c + w) - stair(c - w)) / (2.0 * w)

                    fe_u = frac_even(u_, wu)
                    fe_v = frac_even(v_, wv)
                    # even cell <=> (floor(u)+floor(v)) even: prob both even
                    # axes agree
                    w1 = fe_u * fe_v + (1.0 - fe_u) * (1.0 - fe_v)
                    v = w1[..., None] * c0 + (1.0 - w1[..., None]) * c1
                else:
                    even = (
                        jnp.floor(u_).astype(jnp.int32)
                        + jnp.floor(v_).astype(jnp.int32)
                    ) % 2 == 0
                    v = jnp.where(even[..., None], c0, c1)
            elif s.kind == TEX_SCALE:
                base = vals[s.child0]
                v = base * const[i]
            elif s.kind == TEX_IMAGE:
                v = self._eval_image(i, self._spec_uv(s, uv, p), atlas)
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
