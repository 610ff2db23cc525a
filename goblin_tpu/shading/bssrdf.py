"""BSSRDF dipole diffusion model (Jensen/Donner).

Batched re-derivation of the reference BSSRDF
(src/GoblinMaterial.cpp:39-219): internal Fresnel reflectivity Fdr, the
dipole Rd(d^2) profile, and the diffuse-albedo -> (sigma_a, sigma_s')
inversion by bisection (host-side numpy at bake time, since material
constants are static per scene).

Conventions match the reference exactly:
- A = (1 + Fdr) / (1 - Fdr)
- sigma_t' = sigma_a + sigma_s'    (reduced extinction)
- sigma_tr = sqrt(3 sigma_a sigma_t')
- zr = 1/sigma_t', zv = zr (1 + 4A/3)
- Rd = alpha'/(4 pi) * [ zr (1+str*dr) e^{-str*dr}/dr^3
                       + zv (1+str*dv) e^{-str*dv}/dv^3 ]
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fdr(eta: float) -> float:
    """Internal diffuse Fresnel reflectivity (Donner 06 polynomial)."""
    if eta < 1.0:
        return (-0.4399 + 0.7099 / eta - 0.3319 / (eta * eta)
                + 0.0636 / (eta ** 3))
    return (-1.4399 / (eta * eta) + 0.7099 / eta + 0.6681
            + 0.0636 * eta)


def fresnel_a(eta: float) -> float:
    f = fdr(eta)
    return (1.0 + f) / (1.0 - f)


def diffuse_reflectance(alpha_prime: np.ndarray, A: float) -> np.ndarray:
    s = np.sqrt(3.0 * (1.0 - alpha_prime))
    return (0.5 * alpha_prime * (1.0 + np.exp(-(4.0 / 3.0) * A * s))
            * np.exp(-s))


def convert_from_diffuse(kd, mean_free_path, A: float):
    """Invert diffuse albedo -> (sigma_a, sigma_s') per RGB channel via
    16-iteration bisection on alpha' (reference convertFromDiffuse)."""
    kd = np.asarray(kd, np.float64)
    sigma_tr = 1.0 / np.asarray(mean_free_path, np.float64)
    lo = np.zeros(3)
    hi = np.ones(3)
    for _ in range(16):
        mid = 0.5 * (lo + hi)
        rd = diffuse_reflectance(mid, A)
        hi = np.where(rd > kd, mid, hi)
        lo = np.where(rd > kd, lo, mid)
    alpha_prime = 0.5 * (lo + hi)
    sigma_t_prime = sigma_tr / np.sqrt(3.0 * (1.0 - alpha_prime))
    sigma_s_prime = alpha_prime * sigma_t_prime
    sigma_a = sigma_t_prime - sigma_s_prime
    return sigma_a.astype(np.float32), sigma_s_prime.astype(np.float32)


def rd_dipole(sigma_a, sigma_sp, A, d2):
    """Dipole diffusion profile, batched. sigma_a/sigma_sp: (..., 3),
    A: (...,) or scalar, d2: (...,) squared distance. Returns (..., 3)."""
    sigma_tp = sigma_a + sigma_sp
    sigma_tp = jnp.maximum(sigma_tp, 1e-12)
    sigma_tr = jnp.sqrt(3.0 * sigma_a * sigma_tp)
    zr = 1.0 / sigma_tp
    zv = zr * (1.0 + (4.0 / 3.0) * jnp.asarray(A)[..., None])
    d2e = d2[..., None]
    dr = jnp.sqrt(zr * zr + d2e)
    dv = jnp.sqrt(zv * zv + d2e)
    alpha_p = sigma_sp / sigma_tp
    str_dr = sigma_tr * dr
    str_dv = sigma_tr * dv
    rd = (0.25 / jnp.pi) * alpha_p * (
        zr * (1.0 + str_dr) * jnp.exp(-str_dr) / (dr ** 3)
        + zv * (1.0 + str_dv) * jnp.exp(-str_dv) / (dv ** 3)
    )
    return jnp.clip(rd, 0.0, None)


def luminance(c):
    return (0.212671 * c[..., 0] + 0.715160 * c[..., 1]
            + 0.072169 * c[..., 2])


def gaussian_pdf_projected(p_center, p_sample, axis, falloff, r_max):
    """Truncated-gaussian disc pdf of p_sample seen from the plane
    through p_center perpendicular to axis (reference
    gaussianSample2DPdf(pCenter, pSample, N, falloff, Rmax))."""
    d = p_sample - p_center
    proj = d - axis * jnp.sum(d * axis, axis=-1, keepdims=True)
    r2 = jnp.sum(proj * proj, axis=-1)
    norm = 1.0 - jnp.exp(-falloff * r_max * r_max)
    return (falloff / jnp.pi) * jnp.exp(-falloff * r2) / jnp.maximum(
        norm, 1e-20
    )
