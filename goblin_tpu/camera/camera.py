"""Batched perspective / orthographic cameras.

Conventions from the reference (src/GoblinCamera.cpp):
- left-handed view space, camera looks +z; orientation quaternion columns
  give (right, up, look)
- LH D3D projection with z in [0,1]; screen mapping
  screen = ((ndc.x+1)/2 * xRes, (1-ndc.y)/2 * yRes)
- generateRay: NDC -> view via the inverse projection diagonal, thin-lens
  DOF when lens_radius > 0, ray differentials at +1 pixel offsets,
  mint = 1e-3
- bidirectional emission suite We/pdf (samplePosition/sampleDirection/
  evalWe/pdfPosition/pdfDirection) used by LT/BDPT
  (src/GoblinCamera.cpp:150-288)

A camera is a frozen spec (static python floats, baked at scene load) whose
methods are traced into the wavefront; all per-ray math is batched jnp.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property

import jax.numpy as jnp
import numpy as np

from ..core import sampling as sp
from ..core import vecmath as vm
from .film import FilmSpec


@dataclass(frozen=True)
class CameraSpec:
    kind: str = "perspective"  # or "orthographic"
    position: tuple = (0.0, 0.0, 0.0)
    orientation: tuple = (1.0, 0.0, 0.0, 0.0)  # wxyz
    fov: float = np.radians(60.0)  # radians (perspective)
    z_near: float = 0.1
    z_far: float = 1000.0
    lens_radius: float = 0.0
    focal_distance: float = 1.0
    film_width: float = 35.0  # orthographic
    film: FilmSpec = field(default_factory=FilmSpec)

    # ---- host-side derived quantities (numpy; baked once) ----

    @cached_property
    def _rot(self) -> np.ndarray:
        # pure numpy (host-side bake; must not trace even if first touched
        # inside jit)
        w, x, y, z = [float(v) for v in self.orientation]
        x2, y2, z2 = 2 * x, 2 * y, 2 * z
        m = np.array(
            [
                [1 - y2 * y - z2 * z, x2 * y - z2 * w, x2 * z + y2 * w],
                [x2 * y + z2 * w, 1 - x2 * x - z2 * z, y2 * z - x2 * w],
                [x2 * z - y2 * w, y2 * z + x2 * w, 1 - x2 * x - y2 * y],
            ],
            dtype=np.float32,
        )
        return m

    @cached_property
    def look(self) -> np.ndarray:
        return self._rot[:, 2]

    @cached_property
    def right(self) -> np.ndarray:
        return self._rot[:, 0]

    @cached_property
    def up(self) -> np.ndarray:
        return self._rot[:, 1]

    @cached_property
    def proj(self) -> np.ndarray:
        if self.kind == "perspective":
            return np.asarray(
                vm.perspective_lh_d3d(
                    self.fov, self.film.aspect_ratio, self.z_near, self.z_far
                )
            )
        h = self.film_width / self.film.aspect_ratio
        return np.asarray(vm.ortho_lh_d3d(self.film_width, h, self.z_near, self.z_far))

    @cached_property
    def view(self) -> np.ndarray:
        r, u, l = self.right, self.up, self.look
        p = np.asarray(self.position, dtype=np.float32)
        m = np.eye(4, dtype=np.float32)
        m[0, :3], m[1, :3], m[2, :3] = r, u, l
        m[0, 3], m[1, 3], m[2, 3] = -p @ r, -p @ u, -p @ l
        return m

    @cached_property
    def film_area(self) -> float:
        """World-space film area at the focal plane (perspective) or the
        ortho film plate (reference ctors)."""
        if self.kind == "perspective":
            h = 2.0 * self.focal_distance * np.tan(0.5 * self.fov)
            return float(h * h * self.film.aspect_ratio)
        return float(self.film_width * self.film_width / self.film.aspect_ratio)

    @property
    def is_delta(self) -> bool:
        return self.kind == "orthographic" or self.lens_radius == 0.0

    # ---- traced batched methods ----

    def generate_ray(self, image_x, image_y, lens_u1=None, lens_u2=None):
        """(R,) continuous image coords -> dict ray {o, d, mint, maxt}.

        Also returns dx/dy differential directions for texture filtering.
        """
        inv_x = 1.0 / self.film.x_res
        inv_y = 1.0 / self.film.y_res
        x_ndc = 2.0 * image_x * inv_x - 1.0
        y_ndc = -2.0 * image_y * inv_y + 1.0
        dx_ndc = 2.0 * (image_x + 1.0) * inv_x - 1.0
        dy_ndc = -2.0 * (image_y + 1.0) * inv_y + 1.0
        rot = jnp.asarray(self._rot)
        pos = jnp.asarray(self.position, dtype=jnp.float32)

        if self.kind == "perspective":
            p00, p11 = float(self.proj[0, 0]), float(self.proj[1, 1])
            view_dir = jnp.stack(
                [x_ndc / p00, y_ndc / p11, jnp.ones_like(x_ndc)], axis=-1
            )
            dxv = jnp.stack([dx_ndc / p00, y_ndc / p11, jnp.ones_like(x_ndc)], -1)
            dyv = jnp.stack([x_ndc / p00, dy_ndc / p11, jnp.ones_like(x_ndc)], -1)
            if self.lens_radius > 0.0 and lens_u1 is not None:
                ft = self.focal_distance / view_dir[..., 2]
                p_focus = view_dir * ft[..., None]
                pdx_focus = dxv * (self.focal_distance / dxv[..., 2])[..., None]
                pdy_focus = dyv * (self.focal_distance / dyv[..., 2])[..., None]
                lens = self.lens_radius * sp.uniform_sample_disk(lens_u1, lens_u2)
                view_o = jnp.concatenate([lens, jnp.zeros_like(lens[..., :1])], -1)
                o = vm.mat3_apply(rot, view_o) + pos
                d = vm.mat3_apply(rot, vm.normalize(p_focus - view_o)
                )
                dxd = vm.mat3_apply(rot, vm.normalize(pdx_focus - view_o)
                )
                dyd = vm.mat3_apply(rot, vm.normalize(pdy_focus - view_o)
                )
            else:
                o = jnp.broadcast_to(pos, view_dir.shape)
                d = vm.mat3_apply(rot, vm.normalize(view_dir))
                dxd = vm.mat3_apply(rot, vm.normalize(dxv))
                dyd = vm.mat3_apply(rot, vm.normalize(dyv))
        else:  # orthographic: parallel rays through the film plane
            w = self.film_width
            h = w / self.film.aspect_ratio
            view_o = jnp.stack(
                [0.5 * w * x_ndc, 0.5 * h * y_ndc, jnp.zeros_like(x_ndc)], -1
            )
            o = vm.mat3_apply(rot, view_o) + pos
            d = jnp.broadcast_to(jnp.asarray(self.look, dtype=jnp.float32), o.shape)
            dxd = dyd = d

        return {
            "o": o,
            "d": d,
            "dxd": dxd,
            "dyd": dyd,
            "mint": jnp.full(o.shape[:-1], 1e-3, jnp.float32),
            "maxt": jnp.full(o.shape[:-1], 3.0e38, jnp.float32),
        }

    def world_to_screen(self, p_world, p_lens=None):
        """-> (screen_x, screen_y, view_z, valid). Invalid points (behind
        lens, off-lens, off-film) are flagged per the reference
        (src/GoblinCamera.cpp:256-288)."""
        view = jnp.asarray(self.view)
        proj = jnp.asarray(self.proj)
        p_view = vm.transform_point(view, p_world)
        if p_lens is None:
            p_lens_view = jnp.zeros_like(p_view)
        else:
            p_lens_view = vm.transform_point(view, p_lens)
        valid = p_view[..., 2] >= 0.0
        if self.lens_radius > 0.0:
            r2 = p_lens_view[..., 0] ** 2 + p_lens_view[..., 1] ** 2
            valid &= r2 <= self.lens_radius ** 2
        dirv = p_view - p_lens_view
        dz = dirv[..., 2]
        valid &= jnp.abs(dz) >= 1e-7
        if self.kind == "perspective":
            p_focus = p_lens_view + dirv * (
                self.focal_distance / jnp.where(dz == 0.0, 1e-7, dz)
            )[..., None]
        else:
            p_focus = p_view
        ph = jnp.concatenate([p_focus, jnp.ones_like(p_focus[..., :1])], -1)
        ndc = jnp.stack([jnp.sum(proj[i] * ph, axis=-1) for i in range(4)], axis=-1)
        ndc = ndc / jnp.where(ndc[..., 3:4] == 0.0, 1e-12, ndc[..., 3:4])
        sx = (ndc[..., 0] + 1.0) * 0.5 * self.film.x_res
        sy = (1.0 - ndc[..., 1]) * 0.5 * self.film.y_res
        xs, xe, ys, ye = self.film.sample_range()
        valid &= (sx >= xs) & (sx <= xe) & (sy >= ys) & (sy <= ye)
        return sx, sy, p_view[..., 2], valid

    # ---- emission (importance) side, for LT/BDPT ----

    def sample_position(self, u1, u2):
        """-> (p (R,3), n (R,3), pdf_area (R,)). Lens-disk sampling when
        lens_radius > 0, else the delta pinhole point."""
        rot = jnp.asarray(self._rot)
        pos = jnp.asarray(self.position, dtype=jnp.float32)
        if self.lens_radius > 0.0:
            lens = self.lens_radius * sp.uniform_sample_disk(u1, u2)
            view_o = jnp.concatenate([lens, jnp.zeros_like(lens[..., :1])], -1)
            p = vm.mat3_apply(rot, view_o) + pos
            pdf = jnp.full(
                u1.shape, 1.0 / (np.pi * self.lens_radius ** 2), jnp.float32
            )
        else:
            p = jnp.broadcast_to(pos, u1.shape + (3,))
            pdf = jnp.ones(u1.shape, jnp.float32)
        n = jnp.broadcast_to(jnp.asarray(self.look, dtype=jnp.float32), p.shape)
        return p, n, pdf

    def sample_direction(self, image_x, image_y, p_camera):
        """-> (dir, We, pdf_w) for LT splats (perspective; reference
        PerspectiveCamera::sampleDirection)."""
        p00, p11 = float(self.proj[0, 0]), float(self.proj[1, 1])
        inv_x = 1.0 / self.film.x_res
        inv_y = 1.0 / self.film.y_res
        x_ndc = 2.0 * image_x * inv_x - 1.0
        y_ndc = -2.0 * image_y * inv_y + 1.0
        view_dir = jnp.stack(
            [x_ndc / p00, y_ndc / p11, jnp.ones_like(x_ndc)], axis=-1
        )
        rot = jnp.asarray(self._rot)
        pos = jnp.asarray(self.position, dtype=jnp.float32)
        p_focus = vm.mat3_apply(rot, self.focal_distance * view_dir
        ) + pos
        sd = p_focus - p_camera
        dist2 = vm.squared_length(sd)
        sd = vm.normalize(sd)
        look = jnp.asarray(self.look, dtype=jnp.float32)
        cos_t = vm.absdot(jnp.broadcast_to(look, sd.shape), sd)
        G = cos_t * cos_t / jnp.maximum(dist2, 1e-20)
        lens_area = np.pi * self.lens_radius ** 2
        We = jnp.where(
            self.lens_radius > 0.0,
            1.0 / jnp.maximum(self.film_area * lens_area * G, 1e-30),
            1.0 / jnp.maximum(self.film_area * G, 1e-30),
        )
        pdf_w = dist2 / jnp.maximum(self.film_area * cos_t, 1e-20)
        return sd, We, pdf_w

    def eval_we(self, p_camera, p_world):
        """Importance emitted from p_camera toward p_world; 0 when the
        point doesn't project into the film (reference evalWe)."""
        _, _, _, valid = self.world_to_screen(p_world, p_camera)
        view = jnp.asarray(self.view)
        p_view = vm.transform_point(view, p_world)
        p_lens = vm.transform_point(view, p_camera)
        dirv = p_view - p_lens
        dz = jnp.where(dirv[..., 2] == 0.0, 1e-7, dirv[..., 2])
        p_focus = p_lens + dirv * (self.focal_distance / dz)[..., None]
        lens_to_film = p_focus - p_lens
        dist2 = vm.squared_length(lens_to_film)
        cos_t = vm.normalize(lens_to_film)[..., 2]
        G = cos_t * cos_t / jnp.maximum(dist2, 1e-20)
        lens_area = np.pi * self.lens_radius ** 2
        We = jnp.where(
            self.lens_radius > 0.0,
            1.0 / jnp.maximum(self.film_area * lens_area * G, 1e-30),
            1.0 / jnp.maximum(self.film_area * G, 1e-30),
        )
        return jnp.where(valid, We, 0.0)

    def pdf_position(self):
        """Area pdf on the lens (reference pdfPosition)."""
        if self.lens_radius > 0.0:
            return 1.0 / (np.pi * self.lens_radius ** 2)
        return 0.0

    def pdf_direction(self, wo):
        """Solid-angle pdf of emitting direction wo (reference pdfDirection:
        focalDistance^2 / (filmArea * cos^3))."""
        look = jnp.asarray(self.look, dtype=jnp.float32)
        cos_t = vm.dot(jnp.broadcast_to(look, wo.shape), wo)
        return self.focal_distance ** 2 / jnp.maximum(
            self.film_area * cos_t ** 3, 1e-20
        )


# ---------------------------------------------------------------------------
# Interactive-style camera movement helpers (reference
# src/GoblinCamera.h:110-185). CameraSpec is an immutable bake (its
# matrices are cached_property), so the reference's mutate-and-dirty
# pattern becomes pure functions returning a NEW spec — re-bake by
# re-creating any jitted pass that closed over the old one.
# ---------------------------------------------------------------------------


def _quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def rotate(spec: CameraSpec, axis, angle: float) -> CameraSpec:
    """orientation' = normalize(Quaternion(axis, angle) * orientation)
    (reference Camera::rotate, src/GoblinCamera.h:176-179)."""
    import dataclasses

    ax = np.asarray(axis, np.float64)
    ax = ax / max(np.linalg.norm(ax), 1e-20)
    h = 0.5 * float(angle)
    q = (np.cos(h), *(np.sin(h) * ax))
    o = _quat_mul(q, spec.orientation)
    n = max(np.sqrt(sum(v * v for v in o)), 1e-20)
    return dataclasses.replace(
        spec, orientation=tuple(float(v) / n for v in o)
    )


def translate(spec: CameraSpec, d) -> CameraSpec:
    """position += d (reference Camera::translate)."""
    import dataclasses

    return dataclasses.replace(
        spec,
        position=tuple(float(p) + float(v)
                       for p, v in zip(spec.position, d)),
    )


def roll(spec: CameraSpec, angle: float) -> CameraSpec:
    return rotate(spec, spec.look, angle)


def pitch(spec: CameraSpec, angle: float) -> CameraSpec:
    return rotate(spec, spec.right, angle)


def yaw(spec: CameraSpec, angle: float) -> CameraSpec:
    return rotate(spec, spec.up, angle)


def rotate_x(spec: CameraSpec, angle: float) -> CameraSpec:
    return rotate(spec, (1.0, 0.0, 0.0), angle)


def rotate_y(spec: CameraSpec, angle: float) -> CameraSpec:
    return rotate(spec, (0.0, 1.0, 0.0), angle)


def rotate_z(spec: CameraSpec, angle: float) -> CameraSpec:
    return rotate(spec, (0.0, 0.0, 1.0), angle)
