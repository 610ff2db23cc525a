"""Whitted-style direct lighting integrator (reference
src/GoblinWhitted.cpp:13-71 + shared estimateLd GoblinRenderer.cpp:502-564).

Wavefront form: per bounce, NEE over EVERY light (reference loops all
lights with per-light sample counts), then a continuation ray only
through specular materials. Divergence from the reference (documented):
the reference recurses into BOTH specularReflect and specularRefract
branches (a ray tree); here transmissive lanes stochastically pick one
branch Fresnel-weighted (the transparent BSDF's own importance sampling),
which converges to the same image with spp instead of branching.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import vecmath as vm
from ..core.rng import hash_uniform
from ..core.sampling import power_heuristic
from ..lights import lights as lt
from ..scene import intersect as scn
from ..shading import bsdf as bx
from .common import DIM_BASE
from .materials import gather_material
from .path import _area_light_Le, _em_tri_data, _env_le


def make_li(meta, max_depth=None):
    if max_depth is None:
        max_depth = int(meta.settings.get("max_ray_depth", 5))
    n_lights = max(1, meta.n_lights)
    sample_nums = tuple(getattr(meta, "light_sample_nums", ()) or ())

    def li(scene, meta_, ray, pixel_ids, s_idx, seed):
        lights = scene["lights"]
        tri_data = _em_tri_data(scene)
        R = ray["o"].shape[0]

        frag = scn.intersect(
            scene, meta, ray["o"], ray["d"], ray["mint"], ray["maxt"],
            dxd=ray.get("dxd"), dyd=ray.get("dyd"),
        )
        L = jnp.where(
            frag["hit"][:, None],
            _area_light_Le(scene, frag, frag["wo"]),
            _env_le(scene, meta, ray["d"]),
        )
        if meta.n_lights == 0:
            return L

        def bounce_body(state, b):
            L, throughput, frag, active = state
            p, ns, wo, eps = frag["p"], frag["ns"], frag["wo"], frag["eps"]
            if meta.has_bssrdf:
                # Whitted adds Lsubsurface at every recursion level
                # (src/GoblinWhitted.cpp:24-26); here: per bounce vertex
                from .bssrdf import subsurface_L

                L = L + throughput * subsurface_L(
                    scene, meta, frag, active, pixel_ids, s_idx, seed,
                    bounce=b,
                )
            mat = gather_material(
                scene, meta, frag,
                u_mask=hash_uniform(seed, pixel_ids, s_idx, b, DIM_BASE + 9),
            )
            # ---- NEE over every light x its sample_num (static loops;
            # reference multiSampleLd: per light, samplesNum MIS
            # estimates averaged then summed over lights —
            # GoblinRenderer.cpp:474-500; both the light-sample and the
            # bsdf-sample side of estimateLd, with the non-specular type
            # mask Whitted passes — GoblinWhitted.cpp:30-32)
            nee_type = bx.BSDF_ALL & ~bx.BSDF_SPECULAR
            Ld = jnp.zeros((R, 3), jnp.float32)
            dim0 = DIM_BASE + 16
            for li_id in range(n_lights):
                sn = max(1, sample_nums[li_id]) if li_id < len(
                    sample_nums) else 1
                is_env_light = meta.has_env and li_id == meta.env_light_id
                lid = jnp.full((R,), li_id, jnp.int32)
                Ld_i = jnp.zeros((R, 3), jnp.float32)
                for n_s in range(sn):
                    u1 = hash_uniform(seed, pixel_ids, s_idx, b, dim0)
                    u2 = hash_uniform(seed, pixel_ids, s_idx, b, dim0 + 1)
                    # --- light-sample side
                    if is_env_light:
                        from ..lights import envmap

                        li_e, wi_e, pdf_e = envmap.sample_env(
                            scene, meta, u1, u2
                        )
                        ls = {
                            "Li": li_e, "wi": wi_e, "pdf": pdf_e,
                            "shadow_maxt": jnp.full((R,), 3.0e37),
                            "is_delta": jnp.zeros((R,), bool),
                        }
                    else:
                        ls = lt.sample_li(lights, tri_data, lid, p, eps,
                                          u1, u2)
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
                    bsdf_pdf_l = bx.bsdf_pdf(mat, ns, wo, ls["wi"],
                                             nee_type)
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
                    # --- bsdf-sample side (masked off at runtime for
                    # delta lights: their light-side is exact)
                    bsu1 = hash_uniform(seed, pixel_ids, s_idx, b,
                                        dim0 + 2)
                    bsu2 = hash_uniform(seed, pixel_ids, s_idx, b,
                                        dim0 + 3)
                    bsc = hash_uniform(seed, pixel_ids, s_idx, b,
                                       dim0 + 4)
                    bsn = bx.bsdf_sample(
                        mat, ns, frag["dpdu"], wo, bsu1, bsu2, bsc,
                        nee_type,
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

                        pdf_l_b = envmap.pdf_env(scene, meta,
                                                 bsn["wi"])
                        Li_b = _env_le(scene, meta, bsn["wi"])
                        got = b_ok & ~fragb["hit"]
                    else:
                        cos_l = vm.dot(fragb["ns"], -bsn["wi"])
                        pdf_l_b = lt.pdf_li(
                            lights, lid, p, bsn["wi"], fragb["t"],
                            cos_l, fragb["light"],
                        )
                        Li_b = _area_light_Le(scene, fragb,
                                              -bsn["wi"])
                        got = (
                            b_ok & fragb["hit"]
                            & (fragb["light"] == lid)
                        )
                    w_f = power_heuristic(1.0, bsn["pdf"], 1.0,
                                          pdf_l_b)
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
            L = L + jnp.where(active[:, None], throughput * Ld, 0.0)

            # ---- specular continuation only
            bu1 = hash_uniform(seed, pixel_ids, s_idx, b, DIM_BASE + 5)
            bu2 = hash_uniform(seed, pixel_ids, s_idx, b, DIM_BASE + 6)
            bc = hash_uniform(seed, pixel_ids, s_idx, b, DIM_BASE + 7)
            bs = bx.bsdf_sample(
                mat, ns, frag["dpdu"], wo, bu1, bu2, bc,
                bx.BSDF_SPECULAR | bx.BSDF_REFLECTION | bx.BSDF_TRANSMISSION,
            )
            cont_ok = active & bs["is_specular"] & bs["valid"] & jnp.any(
                bs["f"] > 0.0, axis=-1
            )
            frag2 = scn.intersect(
                scene, meta, p, bs["wi"],
                jnp.where(cont_ok, eps, scn.BIG_T),
                jnp.where(cont_ok, 3.0e37, 0.0),
            )
            new_tp = throughput * bs["f"] * (
                vm.absdot(bs["wi"], ns) / jnp.maximum(bs["pdf"], 1e-20)
            )[:, None]
            # specular path sees emission / env directly
            Le2 = jnp.where(
                frag2["hit"][:, None],
                _area_light_Le(scene, frag2, -bs["wi"]),
                _env_le(scene, meta, bs["wi"]),
            )
            L = L + jnp.where(cont_ok[:, None], new_tp * Le2, 0.0)

            throughput = jnp.where(cont_ok[:, None], new_tp, throughput)
            active = cont_ok & frag2["hit"]
            new_frag = jax.tree_util.tree_map(
                lambda a, b_: jnp.where(
                    active.reshape(active.shape + (1,) * (a.ndim - 1)), b_, a
                ),
                frag, frag2,
            )
            return (L, throughput, new_frag, active), None

        init = (L, jnp.ones((R, 3), jnp.float32), frag, frag["hit"])
        (L, _, _, _), _ = jax.lax.scan(
            bounce_body, init, jnp.arange(max_depth - 1)
        )
        return L

    return li
