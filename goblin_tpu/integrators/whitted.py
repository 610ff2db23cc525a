"""Whitted-style direct lighting integrator (reference
src/GoblinWhitted.cpp:13-71 + shared estimateLd GoblinRenderer.cpp:502-564).

Wavefront form: the reference's recursive ray TREE — at every hit,
Le + Lsubsurface + multi-light NEE (non-specular lobes), then
deterministic recursion into BOTH specularReflect and specularRefract
(GoblinWhitted.cpp:33-38, GoblinRenderer.cpp:598-656) — is unrolled
statically: each tree node is a masked full-wavefront segment, children
are Python-recursion emissions of the same node function. Estimator
parity holds per-spp (round-4 verdict item: the earlier stochastic
one-branch Fresnel pick converged to the same image but was a different
estimator).

Static pruning keeps the unroll linear when the scene cannot branch:
- reflect children exist only if a specular-reflective material
  (transparent / mirror / subsurface, incl. mask-wrapped) is present;
- refract children only if a specular-transmissive one (transparent) is.
A lambert/blinn-only scene (e.g. bunny) therefore unrolls to a single
node. Worst case (transparent present) is the reference's own
exponential tree, 2^(depth+1)-1 nodes. GOBLIN_WHITTED_TREE=0 falls back
to the stochastic one-branch estimator (variance-equivalent, cheaper
compile for deep transparent scenes).
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from ..core import vecmath as vm
from ..core.rng import hash_uniform
from ..core.sampling import power_heuristic
from ..lights import lights as lt
from ..scene import intersect as scn
from ..shading import bsdf as bx
from ..shading.bsdf import (
    MAT_MASK,
    MAT_MIRROR,
    MAT_SUBSURFACE,
    MAT_TRANSPARENT,
)
from .common import DIM_BASE
from .materials import gather_material
from .path import _area_light_Le, _em_tri_data, _env_le


def _specular_caps(meta):
    """(can_reflect, can_transmit): which specular branches any scene
    material can produce. Mask materials wrap an inner material that is
    itself a row in the table, so its kind is already present."""
    kinds = set(getattr(meta, "material_kinds", None) or ())
    if not kinds:
        return True, True  # conservative when the table is unknown
    refl = bool(kinds & {MAT_TRANSPARENT, MAT_MIRROR, MAT_SUBSURFACE})
    tran = MAT_TRANSPARENT in kinds
    return refl, tran


def _direct_light(scene, meta, frag, mat, active, pixel_ids, s_idx, seed,
                  node_tag):
    """multiSampleLd over every light x its sample_num with MIS, for
    non-specular lobes (reference GoblinRenderer.cpp:474-564 with the
    type mask Whitted passes, GoblinWhitted.cpp:30-32)."""
    lights = scene["lights"]
    tri_data = _em_tri_data(scene)
    R = frag["p"].shape[0]
    p, ns, wo, eps = frag["p"], frag["ns"], frag["wo"], frag["eps"]
    n_lights = max(1, meta.n_lights)
    sample_nums = tuple(getattr(meta, "light_sample_nums", ()) or ())
    nee_type = bx.BSDF_ALL & ~bx.BSDF_SPECULAR
    Ld = jnp.zeros((R, 3), jnp.float32)
    dim0 = DIM_BASE + 16
    for li_id in range(n_lights):
        sn = max(1, sample_nums[li_id]) if li_id < len(sample_nums) else 1
        is_env_light = meta.has_env and li_id == meta.env_light_id
        lid = jnp.full((R,), li_id, jnp.int32)
        Ld_i = jnp.zeros((R, 3), jnp.float32)
        for _ in range(sn):
            u1 = hash_uniform(seed, pixel_ids, s_idx, node_tag, dim0)
            u2 = hash_uniform(seed, pixel_ids, s_idx, node_tag, dim0 + 1)
            # --- light-sample side
            if is_env_light:
                from ..lights import envmap

                li_e, wi_e, pdf_e = envmap.sample_env(scene, meta, u1, u2)
                ls = {
                    "Li": li_e, "wi": wi_e, "pdf": pdf_e,
                    "shadow_maxt": jnp.full((R,), 3.0e37),
                    "is_delta": jnp.zeros((R,), bool),
                }
            else:
                ls = lt.sample_li(lights, tri_data, lid, p, eps, u1, u2)
            f_l = bx.bsdf_eval(mat, ns, wo, ls["wi"], nee_type)
            consider = (
                active & (ls["pdf"] > 0.0)
                & jnp.any(ls["Li"] > 0.0, axis=-1)
                & jnp.any(f_l > 0.0, axis=-1)
            )
            occ, tr_null = scn.occluded_attenuated(
                scene, meta, p, ls["wi"],
                jnp.where(consider, eps, scn.BIG_T),
                jnp.where(consider, ls["shadow_maxt"], 0.0),
            )
            vis = consider & ~occ
            bsdf_pdf_l = bx.bsdf_pdf(mat, ns, wo, ls["wi"], nee_type)
            w_l = jnp.where(
                ls["is_delta"], 1.0,
                power_heuristic(1.0, ls["pdf"], 1.0, bsdf_pdf_l),
            )
            Ld_i = Ld_i + jnp.where(
                vis[:, None],
                f_l * tr_null * ls["Li"]
                * (vm.absdot(ns, ls["wi"]) * w_l
                   / jnp.maximum(ls["pdf"], 1e-20))[:, None],
                0.0,
            )
            # --- bsdf-sample side (masked at runtime for delta lights)
            bsu1 = hash_uniform(seed, pixel_ids, s_idx, node_tag, dim0 + 2)
            bsu2 = hash_uniform(seed, pixel_ids, s_idx, node_tag, dim0 + 3)
            bsc = hash_uniform(seed, pixel_ids, s_idx, node_tag, dim0 + 4)
            bsn = bx.bsdf_sample(
                mat, ns, frag["dpdu"], wo, bsu1, bsu2, bsc, nee_type,
            )
            b_ok = (
                active & ~ls["is_delta"] & bsn["valid"]
                & jnp.any(bsn["f"] > 0.0, axis=-1)
                & ~bsn["is_specular"]
            )
            fragb = scn.intersect(
                scene, meta, p, bsn["wi"],
                jnp.where(b_ok, eps, scn.BIG_T),
                jnp.where(b_ok, 3.0e37, 0.0),
            )
            if is_env_light:
                from ..lights import envmap

                pdf_l_b = envmap.pdf_env(scene, meta, bsn["wi"])
                Li_b = _env_le(scene, meta, bsn["wi"])
                got = b_ok & ~fragb["hit"]
            else:
                cos_l = vm.dot(fragb["ns"], -bsn["wi"])
                pdf_l_b = lt.pdf_li(
                    lights, lid, p, bsn["wi"], fragb["t"], cos_l,
                    fragb["light"],
                )
                Li_b = _area_light_Le(scene, fragb, -bsn["wi"])
                got = b_ok & fragb["hit"] & (fragb["light"] == lid)
            w_f = power_heuristic(1.0, bsn["pdf"], 1.0, pdf_l_b)
            got = got & (pdf_l_b > 0.0)
            Ld_i = Ld_i + jnp.where(
                got[:, None],
                bsn["f"] * Li_b
                * (vm.absdot(bsn["wi"], ns) * w_f
                   / jnp.maximum(bsn["pdf"], 1e-20))[:, None],
                0.0,
            )
            dim0 += 8
        Ld = Ld + Ld_i / float(sn)
    return Ld


def make_li(meta, max_depth=None):
    if max_depth is None:
        max_depth = int(meta.settings.get("max_ray_depth", 5))
    can_reflect, can_transmit = _specular_caps(meta)
    tree_mode = os.environ.get("GOBLIN_WHITTED_TREE", "1") == "1"

    def li(scene, meta_, ray, pixel_ids, s_idx, seed):
        R = ray["o"].shape[0]
        node_counter = [0]

        def radiance(frag, d_in, active, depth, node_tag):
            """Li at an already-intersected wavefront segment (the
            reference Li body, GoblinWhitted.cpp:13-42). d_in: incoming
            ray direction (for env lookup on miss)."""
            hit = frag["hit"] & active
            L = jnp.where(
                hit[:, None], _area_light_Le(scene, frag, frag["wo"]), 0.0
            )
            # env on miss (evalEnvironmentLight)
            L = L + jnp.where(
                (active & ~frag["hit"])[:, None],
                _env_le(scene, meta, d_in), 0.0,
            )
            if meta.n_lights == 0:
                return L
            if meta.has_bssrdf:
                from .bssrdf import subsurface_L

                L = L + subsurface_L(
                    scene, meta, frag, hit, pixel_ids, s_idx, seed,
                    bounce=node_tag,
                )
            mat = gather_material(
                scene, meta, frag,
                u_mask=hash_uniform(seed, pixel_ids, s_idx, node_tag,
                                    DIM_BASE + 9),
            )
            L = L + jnp.where(
                hit[:, None],
                _direct_light(scene, meta, frag, mat, hit, pixel_ids,
                              s_idx, seed, node_tag),
                0.0,
            )
            if depth >= max_depth:
                return L

            def spec_child(type_mask, stochastic=False):
                bu1 = hash_uniform(seed, pixel_ids, s_idx, node_tag,
                                   DIM_BASE + 5)
                bu2 = hash_uniform(seed, pixel_ids, s_idx, node_tag,
                                   DIM_BASE + 6)
                bc = hash_uniform(seed, pixel_ids, s_idx, node_tag,
                                  DIM_BASE + 7)
                bs = bx.bsdf_sample(
                    mat, frag["ns"], frag["dpdu"], frag["wo"],
                    bu1, bu2, bc, type_mask,
                )
                ok = hit & bs["is_specular"] & bs["valid"] & jnp.any(
                    bs["f"] > 0.0, axis=-1
                )
                frag2 = scn.intersect(
                    scene, meta, frag["p"], bs["wi"],
                    jnp.where(ok, frag["eps"], scn.BIG_T),
                    jnp.where(ok, 3.0e37, 0.0),
                )
                node_counter[0] += 1
                Lr = radiance(frag2, bs["wi"], ok, depth + 1,
                              0x100 + node_counter[0])
                w = bs["f"] * (vm.absdot(bs["wi"], frag["ns"])
                               / jnp.maximum(bs["pdf"], 1e-20))[:, None]
                return jnp.where(ok[:, None], w * Lr, 0.0)

            spec = bx.BSDF_SPECULAR
            if tree_mode:
                # deterministic reflect + refract branches
                if can_reflect:
                    L = L + spec_child(spec | bx.BSDF_REFLECTION)
                if can_transmit:
                    L = L + spec_child(spec | bx.BSDF_TRANSMISSION)
            elif can_reflect or can_transmit:
                # stochastic one-branch (Fresnel-weighted pick inside
                # bsdf_sample) — variance-equivalent fallback
                L = L + spec_child(
                    spec | bx.BSDF_REFLECTION | bx.BSDF_TRANSMISSION
                )
            return L

        frag = scn.intersect(
            scene, meta, ray["o"], ray["d"], ray["mint"], ray["maxt"],
            dxd=ray.get("dxd"), dyd=ray.get("dyd"),
        )
        # primary ray depth 0; children spawned while depth < max
        # (reference RayDifferential.depth semantics,
        # GoblinWhitted.cpp:33, GoblinRenderer.cpp:618-620)
        return radiance(frag, ray["d"], jnp.ones((R,), bool), 0, 0)

    return li
