"""Wavefront subsurface scattering: single-scatter + dipole diffusion.

Batched analogue of Renderer::Lsubsurface
(reference src/GoblinRenderer.cpp:128-294):

- single scatter (LbssrdfSingle): refract wo into the medium, sample a
  depth with exponential falloff, connect that interior point to a light
  through the surface (closest-hit exit point must belong to the same
  subsurface material), attenuate by both path segments.
- multi scatter (LbssrdfDiffusion): sample a gaussian-falloff disc
  around the hit point along one of the shading axes (N:U:V picked
  2:1:1, MIS power-heuristic weights 4:1:1 as in sampleProbeRay),
  probe-trace to find a nearby surface point of the same
  material, evaluate the dipole Rd against the irradiance there, and
  MIS-combine the three axis strategies with the power heuristic
  (BSSRDF::MISWeight, src/GoblinMaterial.cpp:84-127).

Lanes whose material is not subsurface trace killed rays (mint=BIG,
maxt=0), so whole dead packets retire at the BVH root.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import vecmath as vm
from ..core.rng import hash_uniform
from ..core.sampling import (
    exponential_pdf,
    exponential_sample,
    gaussian_sample_2d,
    gaussian_sample_2d_pdf,
)
from ..lights import lights as lt
from ..scene import intersect as scn
from ..shading.bsdf import MAT_SUBSURFACE, fresnel_dielectric
from ..shading.bssrdf import gaussian_pdf_projected, luminance, rd_dipole
from .common import DIM_BASE

DIM_SS = DIM_BASE + 64  # bssrdf dimension block (8 dims per sample)


def _refract_in(wo, n, eta_mat):
    """Refraction of wo through n INTO the medium (etai=1, etat=eta),
    reference specularRefract (src/GoblinMaterial.cpp:418-433)."""
    eta = 1.0 / eta_mat
    cosi = vm.absdot(n, wo)
    cost = jnp.sqrt(
        jnp.maximum(0.0, 1.0 - eta * eta * (1.0 - cosi * cosi))
    )
    return vm.normalize(
        n * (eta * cosi - cost)[..., None] - eta[..., None] * wo,
        eps=1e-30,
    )


def subsurface_L(scene, meta, frag, active, pixel_ids, s_idx, seed,
                 bounce=0):
    """Radiance added by subsurface transport at the fragment. Returns
    (R, 3); zero on lanes whose material is not subsurface."""
    lights = scene["lights"]
    tri_data = {"em_rows": scene["em_rows"]}
    mid = frag["mat"]
    is_ss = (jnp.take(scene["mat_type"], mid) == MAT_SUBSURFACE) & active \
        & frag["hit"]
    p = frag["p"]
    ns = frag["ns"]
    wo = frag["wo"]
    eta = jnp.take(scene["mat_eta"], mid)
    sigma_a = jnp.take(scene["mat_sigma_a"], mid, axis=0)
    sigma_sp = jnp.take(scene["mat_sigma_sp"], mid, axis=0)
    g = jnp.take(scene["mat_ss_g"], mid)
    A = jnp.take(scene["mat_ss_A"], mid)
    # getScatter = sigma_s' / (1 - g); attenuation sigma_t = scatter + a
    scatter = sigma_sp / jnp.maximum(1.0 - g, 1e-6)[..., None]
    sigma_t = scatter + sigma_a
    falloff = jnp.maximum(luminance(sigma_t), 1e-6)
    coso = vm.absdot(wo, ns)
    Ft_o = 1.0 - fresnel_dielectric(coso, 1.0, eta)
    wo_refr = _refract_in(wo, ns, eta)

    # shading frame for probe axes
    t_ = vm.normalize(
        frag["dpdu"] - vm.dot(frag["dpdu"], ns)[..., None] * ns, eps=1e-30
    )
    b_ = jnp.cross(ns, t_)

    sigma_tp = sigma_a + sigma_sp
    sigma_tr = jnp.maximum(
        luminance(jnp.sqrt(3.0 * sigma_a * sigma_tp)), 1e-6
    )
    # pdf(Rmax)/pdf(0) = 0.01 truncation (reference skipRatio)
    r_max = jnp.sqrt(jnp.log(0.01) / -sigma_tr)

    n_samples = int(meta.settings.get("bssrdf_sample_num", 4))
    dead_mint = jnp.full_like(falloff, scn.BIG_T)
    L_single = jnp.zeros(p.shape, jnp.float32)
    L_multi = jnp.zeros(p.shape, jnp.float32)

    def dim(i, k):
        return DIM_SS + 16 * i + k

    for i in range(n_samples):
        u = [hash_uniform(seed, pixel_ids, s_idx,
                          0x5542 + 131 * bounce + i, dim(i, k))
             for k in range(8)]

        # ---- single scatter ------------------------------------------
        d_s = exponential_sample(u[0], falloff)
        p_samp = p + d_s[..., None] * wo_refr
        samp_pdf = exponential_pdf(d_s, falloff)
        lid, pick_pdf = lt.pick_light(lights, u[1])
        ls = lt.sample_li(lights, tri_data, lid, p_samp, 1e-5, u[2], u[3])
        cand = is_ss & (ls["pdf"] > 0.0) & jnp.any(ls["Li"] > 0.0, -1)
        # closest hit from the interior point toward the light = exit pt
        exit_frag = scn.intersect(
            scene, meta, p_samp, ls["wi"],
            jnp.where(cand, 1e-5, dead_mint),
            jnp.where(cand, ls["shadow_maxt"], 0.0),
        )
        same_mat = exit_frag["hit"] & (exit_frag["mat"] == mid)
        occ = scn.occluded(
            scene, meta, p_samp, ls["wi"],
            jnp.where(cand & same_mat,
                      exit_frag["t"] + exit_frag["eps"], dead_mint),
            jnp.where(cand & same_mat, ls["shadow_maxt"], 0.0),
        )
        ok = cand & same_mat & ~occ
        ni = exit_frag["ns"]
        wi = ls["wi"]
        cosi = vm.absdot(ni, wi)
        Ft_i = 1.0 - fresnel_dielectric(cosi, 1.0, eta)
        phase = _phase_hg(wi, wo_refr, g)
        G = vm.absdot(ni, wo_refr) / jnp.maximum(cosi, 1e-6)
        sigma_tc = sigma_t + G[..., None] * sigma_t
        di = vm.length(exit_frag["p"] - p_samp)
        et = 1.0 / eta
        di_prime = di * cosi / jnp.sqrt(jnp.maximum(
            1.0 - et * et * (1.0 - cosi * cosi), 1e-6))
        contrib = (
            (Ft_o * Ft_i * phase)[..., None] * scatter / sigma_tc
            * jnp.exp(-di_prime[..., None] * sigma_t)
            * jnp.exp(-d_s[..., None] * sigma_t)
            * ls["Li"]
            / jnp.maximum(ls["pdf"] * pick_pdf * samp_pdf, 1e-20)[..., None]
        )
        L_single = L_single + jnp.where(ok[..., None], contrib, 0.0)

        # ---- dipole diffusion ----------------------------------------
        dxy = gaussian_sample_2d(u[4], u[5], sigma_tr, r_max)
        dx, dy = dxy[..., 0], dxy[..., 1]
        r2 = dx * dx + dy * dy
        half = jnp.sqrt(jnp.maximum(r_max * r_max - r2, 0.0))
        # axis pick 2:1:1 (N:U:V)
        pick_n = u[6] <= 0.5
        pick_u = (u[6] > 0.5) & (u[6] <= 0.75)
        axis_pdf = jnp.where(pick_n, 0.5, 0.25)
        off = jnp.where(
            pick_n[..., None],
            dx[..., None] * t_ + dy[..., None] * b_
            - half[..., None] * ns,
            jnp.where(
                pick_u[..., None],
                dx[..., None] * b_ + dy[..., None] * ns
                - half[..., None] * t_,
                dy[..., None] * ns + dx[..., None] * t_
                - half[..., None] * b_,
            ),
        )
        probe_d = jnp.where(
            pick_n[..., None], ns,
            jnp.where(pick_u[..., None], t_, b_),
        )
        probe_o = p + off
        disc_pdf = axis_pdf * gaussian_sample_2d_pdf(
            dx, dy, sigma_tr, r_max
        )
        probe = scn.intersect(
            scene, meta, probe_o, probe_d,
            jnp.where(is_ss, 0.0, dead_mint),
            jnp.where(is_ss, 2.0 * half, 0.0),
        )
        hit_ss = probe["hit"] & (probe["mat"] == mid)
        pp = probe["p"]
        d2 = vm.squared_length(pp - p)
        rd = rd_dipole(sigma_a, sigma_sp, A, d2)
        lid2, pick_pdf2 = lt.pick_light(lights, u[7])
        ls2 = lt.sample_li(
            lights, tri_data, lid2, pp, probe["eps"],
            u[2], u[3],  # reference reuses the same ls sample per i
        )
        cand2 = hit_ss & (ls2["pdf"] > 0.0) & jnp.any(ls2["Li"] > 0.0, -1)
        occ2 = scn.occluded(
            scene, meta, pp, ls2["wi"],
            jnp.where(cand2, probe["eps"], dead_mint),
            jnp.where(cand2, ls2["shadow_maxt"], 0.0),
        )
        ok2 = cand2 & ~occ2
        ni2 = probe["ns"]
        cosi2 = vm.absdot(ni2, ls2["wi"])
        irradiance = ls2["Li"] * (
            cosi2 / jnp.maximum(ls2["pdf"] * pick_pdf2, 1e-20)
        )[..., None]
        Ft_i2 = 1.0 - fresnel_dielectric(cosi2, 1.0, eta)
        pdf_probe = disc_pdf * vm.absdot(probe_d, ni2)
        w = _axis_mis(
            p, pp, ni2, ns, t_, b_, pick_n, pick_u, pdf_probe,
            sigma_tr, r_max,
        )
        contrib2 = (
            (w / jnp.pi * Ft_o * Ft_i2)[..., None] * rd * irradiance
            / jnp.maximum(pdf_probe, 1e-20)[..., None]
        )
        L_multi = L_multi + jnp.where(ok2[..., None], contrib2, 0.0)

    inv_n = 1.0 / float(n_samples)
    return jnp.where(
        is_ss[..., None], (L_single + L_multi) * inv_n, 0.0
    )


def _phase_hg(wi, wo, g):
    # same sign convention as volume.phase_hg / reference phaseHG
    # (GoblinVolume.h:126-134): denom = 1 + g^2 - 2 g cos
    cos_t = vm.dot(wi, wo)
    denom = 1.0 + g * g - 2.0 * g * cos_t
    return (1.0 - g * g) / jnp.maximum(
        4.0 * jnp.pi * denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12
    )


def _axis_mis(pwo, pwi, ni, n, t_, b_, pick_n, pick_u, pdf, sigma_tr,
              r_max):
    """Power-heuristic MIS across the N/U/V probe axes with the 1:1:4
    weighting from the 2:1:1 pick ratio (BSSRDF::MISWeight,
    src/GoblinMaterial.cpp:84-127)."""

    def axis_pdf(ax, frac):
        return frac * gaussian_pdf_projected(
            pwo, pwi, ax, sigma_tr, r_max
        ) * vm.absdot(ax, ni)

    pdf_n = axis_pdf(n, 0.5)
    pdf_u = axis_pdf(t_, 0.25)
    pdf_v = axis_pdf(b_, 0.25)
    p2 = pdf * pdf
    w_n = 4.0 * p2 / jnp.maximum(
        4.0 * p2 + pdf_u * pdf_u + pdf_v * pdf_v, 1e-20
    )
    w_u = p2 / jnp.maximum(
        4.0 * pdf_n * pdf_n + p2 + pdf_v * pdf_v, 1e-20
    )
    w_v = p2 / jnp.maximum(
        4.0 * pdf_n * pdf_n + pdf_u * pdf_u + p2, 1e-20
    )
    return jnp.where(pick_n, w_n, jnp.where(pick_u, w_u, w_v))
