"""Image-based (environment) light: lat-long map eval/sample/pdf.

Parity with reference ImageBasedLight (src/GoblinLight.cpp:464-629):
- default orientation = user_quat * rotY(-pi/2) * rotX(-pi/2) so the z-up
  spherical parameterization faces the map center
- Le(dir): local dir -> (theta, phi) -> (s, t) = (phi/2pi, theta/pi)
- importance sampling from a luminance*sin(theta) CDF2D built on a
  downsampled level (reference uses mip maxLevel-8, i.e. <= ~256 wide)
- direction pdf = pdfST / (2*pi^2*sin(theta))
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import sampling as sp
from ..core import vecmath as vm


def _quat_mul_np(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        dtype=np.float64,
    )


def _quat_rot_np(q):
    from ..scene.params import quat_matrix_np

    return quat_matrix_np(q)


def bake_env(image: np.ndarray, filter_color, orientation,
             dist_max_width: int = 256):
    """-> device dict for the scene: img, rotation, CDF2D tables."""
    img = np.asarray(image, dtype=np.float32) * np.asarray(
        filter_color, np.float32
    )
    h, w = img.shape[:2]
    # base orientation: rotX(-pi/2) then rotY(-pi/2), then user quat
    qx = np.array([np.cos(-np.pi / 4), np.sin(-np.pi / 4), 0.0, 0.0])
    qy = np.array([np.cos(-np.pi / 4), 0.0, np.sin(-np.pi / 4), 0.0])
    base = _quat_mul_np(qy, qx)
    q = _quat_mul_np(np.asarray(orientation, np.float64), base)
    R = _quat_rot_np(q)  # local -> world

    # downsampled luminance * sin(theta) distribution
    ds = max(1, int(np.ceil(w / dist_max_width)))
    dw, dh = max(1, w // ds), max(1, h // ds)
    small = img[: dh * ds, : dw * ds].reshape(dh, ds, dw, ds, 3).mean(axis=(1, 3))
    lum = (
        0.212671 * small[..., 0]
        + 0.715160 * small[..., 1]
        + 0.072169 * small[..., 2]
    )
    sin_t = np.sin((np.arange(dh) + 0.5) / dh * np.pi)
    dist = (lum * sin_t[:, None]).astype(np.float32)
    cdf2d = sp.build_cdf_2d(jnp.asarray(np.maximum(dist, 0.0)))

    return {
        "img": jnp.asarray(img),
        "rot": jnp.asarray(R.astype(np.float32)),  # local -> world
        "cdf": cdf2d,
        "mean": jnp.asarray(img.reshape(-1, 3).mean(axis=0)),
    }


def _lookup(env, s, t):
    """Bilinear lat-long lookup at (s, t) in [0,1)^2."""
    img = env["img"]
    h, w = img.shape[:2]
    fx = s * w - 0.5
    fy = t * h - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = fx - x0
    ty = fy - y0
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            xi = jnp.mod(x0 + dx, w)
            yi = jnp.clip(y0 + dy, 0, h - 1)
            rgb = img[yi, xi]
            wgt = (jnp.where(dx, tx, 1 - tx) * jnp.where(dy, ty, 1 - ty))[
                ..., None
            ]
            out = out + wgt * rgb
    return out


def eval_env(scene, meta, d_world):
    """Environment radiance for (unit) world directions (..., 3)."""
    env = scene["env"]
    w_local = vm.mat3_apply_t(env["rot"], d_world)  # R^T = world -> local
    theta = vm.spherical_theta(w_local)
    phi = vm.spherical_phi(w_local)
    return _lookup(env, phi * (0.5 / np.pi), theta * (1.0 / np.pi))


def sample_env(scene, meta, u1, u2):
    """Importance-sample the env map. -> (Li, wi_world, pdf_w)."""
    env = scene["env"]
    st, pdf_st = sp.sample_cdf_2d(env["cdf"], u1, u2)
    theta = st[..., 1] * np.pi
    phi = st[..., 0] * (2.0 * np.pi)
    sin_t = jnp.sin(theta)
    w_local = jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), jnp.cos(theta)], axis=-1
    )
    wi = vm.mat3_apply(env["rot"], w_local)
    pdf = pdf_st / jnp.maximum(2.0 * np.pi * np.pi * sin_t, 1e-12)
    Li = _lookup(env, st[..., 0], st[..., 1])
    return Li, wi, pdf


def pdf_env(scene, meta, wi_world):
    """Solid-angle pdf the env sampler assigns to wi."""
    env = scene["env"]
    w_local = vm.mat3_apply_t(env["rot"], wi_world)
    theta = vm.spherical_theta(w_local)
    sin_t = jnp.sin(theta)
    phi = vm.spherical_phi(w_local)
    pdf_st = sp.pdf_cdf_2d(
        env["cdf"], phi * (0.5 / np.pi), theta * (1.0 / np.pi)
    )
    return jnp.where(
        sin_t <= 0.0,
        0.0,
        pdf_st / jnp.maximum(2.0 * np.pi * np.pi * sin_t, 1e-12),
    )
