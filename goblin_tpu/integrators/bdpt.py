"""Bidirectional path tracing, wavefront form.

Faithful batched re-derivation of the reference BDPT
(src/GoblinBDPT.cpp): light + eye random walks storing stacked
PathVertex arrays (throughput, fwd/bwd directional pdfs, specular flags,
G to previous), every (s,t) connection strategy per path length
(including t=1 lens connection with pixel re-projection; t=0 lens-hit
strategies require a lens in the scene and are skipped for pinhole
cameras), and the MIS pdf-ratio chain walked in both directions with
specular-vertex skips and the power heuristic
(src/GoblinBDPT.cpp:376-526). debug_s / debug_t / debug_no_mis toggles
(reference :59-63,105-109) isolate single strategies — the estimator-
consistency harness SURVEY.md §4 calls for.

Wavefront mapping: each lane is one (pixel, spp) camera sample; both
walks are lax.scans producing (V, R) vertex stacks; the (s,t) double
loop and the MIS chains are static python unrolls of masked vector ops
(max_path_length is small for BDPT configs).

Known divergence: camera->pdfPosition for lens cameras uses the correct
1/(pi r^2) (the reference's expression `1/r*r*PI` reduces to pi due to a
parenthesization slip, src/GoblinCamera.cpp:211-214) — only affects MIS
weights of t=0 strategies with DOF cameras.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import film as film_mod
from ..core import vecmath as vm
from ..core.rng import hash_uniform
from ..lights import lights as lt
from ..scene import intersect as scn
from ..shading import bsdf as bx
from .common import DIM_BASE, pixel_samples, spp_grid
from .materials import gather_material
from .path import _em_tri_data

_D = DIM_BASE


def _walk(scene, meta, ids, s_idx, seed, start_p, start_d, tp0, mode,
          max_len, salt, env_sphere=None):
    """Shared random walk: returns stacked surface vertices (V, R, ...)
    with fields p, ns, uv, mat, light, eps, wo (to prev), tp, pdf_fwd,
    pdf_bwd (directional pdfs / |cos|), is_spec, G (to prev), is_env,
    valid.

    env_sphere: (world_center, world_radius, env_light_id) — when given
    (eye walk in an IBL scene), rays that escape the scene synthesize a
    *virtual light vertex* on the world bounding sphere (inward normal,
    light = env id, no BSDF): the environment becomes an ordinary
    emissive surface so every s=0 "eye path ends on a light" strategy
    and every MIS chain works unchanged. The walk terminates there."""
    R = ids.shape[0]

    def body(carry, b):
        o, d, eps, tp, active, prev_p, prev_ns = carry
        frag = scn.intersect(scene, meta, o, d, eps,
                             jnp.full((R,), 3.0e37, jnp.float32))
        escaped = jnp.zeros((R,), bool)
        if env_sphere is not None:
            wc, wr, env_lid = env_sphere
            escaped = active & ~frag["hit"]
            oc = o - wc
            bq = vm.dot(d, oc)
            disc = jnp.maximum(bq * bq - (vm.squared_length(oc) - wr * wr),
                               0.0)
            t_sph = jnp.maximum(-bq + jnp.sqrt(disc), 1e-3)  # far root
            p_sph = o + t_sph[:, None] * d
            n_sph = vm.normalize(wc - p_sph, eps=1e-30)  # inward
            e_mask = escaped[:, None]
            frag = dict(frag)
            frag["p"] = jnp.where(e_mask, p_sph, frag["p"])
            frag["ns"] = jnp.where(e_mask, n_sph, frag["ns"])
            frag["light"] = jnp.where(escaped, env_lid, frag["light"])
        valid = active & (frag["hit"] | escaped)
        mat = gather_material(
            scene, meta, frag,
            u_mask=hash_uniform(seed, ids, s_idx, b, salt + 3),
        )
        bs = bx.bsdf_sample(
            mat, frag["ns"], frag["dpdu"], frag["wo"],
            hash_uniform(seed, ids, s_idx, b, salt),
            hash_uniform(seed, ids, s_idx, b, salt + 1),
            hash_uniform(seed, ids, s_idx, b, salt + 2),
            bx.BSDF_ALL, mode=mode,
        )
        cos_wi = vm.absdot(bs["wi"], frag["ns"])
        cos_wo = vm.absdot(frag["wo"], frag["ns"])
        pdf_fwd = bs["pdf"] / jnp.maximum(cos_wi, 1e-20)
        pdf_bwd_eval = bx.bsdf_pdf(mat, frag["ns"], bs["wi"], frag["wo"],
                                   bx.BSDF_ALL) / jnp.maximum(cos_wo, 1e-20)
        pdf_bwd = jnp.where(bs["is_specular"], pdf_fwd, pdf_bwd_eval)
        # G to previous vertex (prev normal from the carry; vertex 1's
        # origin normal is patched by _fix_G_first)
        v = frag["p"] - prev_p
        inv_l2 = 1.0 / jnp.maximum(vm.squared_length(v), 1e-20)
        dab = v * jnp.sqrt(inv_l2)[:, None]
        G = vm.absdot(frag["ns"], dab) * vm.absdot(prev_ns, dab) * inv_l2
        vert = {
            "p": frag["p"], "ns": frag["ns"], "uv": frag["uv"],
            "mat": frag["mat"], "light": frag["light"],
            "dpdu": frag["dpdu"], "eps": frag["eps"],
            "wo": frag["wo"], "tp": jnp.where(valid[:, None], tp, 0.0),
            "pdf_fwd": pdf_fwd, "pdf_bwd": pdf_bwd,
            "is_spec": bs["is_specular"], "G": G, "valid": valid,
            "is_env": escaped, "is_lens": frag["is_lens"] & valid,
        }
        cont = valid & ~escaped & bs["valid"] & jnp.any(bs["f"] > 0.0, -1)
        tp2 = tp * bs["f"] / jnp.maximum(pdf_fwd, 1e-20)[:, None]
        tp2 = jnp.where(cont[:, None], tp2, 0.0)
        return (frag["p"], bs["wi"], frag["eps"], tp2, cont, frag["p"],
                frag["ns"]), vert

    init = (start_p, start_d, jnp.full((R,), 1e-3, jnp.float32), tp0,
            jnp.ones((R,), bool), start_p, start_d)
    _, verts = jax.lax.scan(body, init, jnp.arange(1, max_len + 1))
    return verts


def _fix_G_first(verts, origin_p, origin_n, origin_is_delta):
    """Vertex 1's G uses the origin's normal (reference evalG: cosA from
    the light/camera normal with delta-light exception)."""
    p1 = verts["p"][0]
    v = p1 - origin_p
    inv_l2 = 1.0 / jnp.maximum(vm.squared_length(v), 1e-20)
    dab = v * jnp.sqrt(inv_l2)[:, None]
    cosA = jnp.where(origin_is_delta, 1.0, vm.absdot(origin_n, dab))
    cosB = vm.absdot(verts["ns"][0], dab)
    verts["G"] = verts["G"].at[0].set(cosA * cosB * inv_l2)
    return verts


def _eval_g(pa, na, pb, nb, a_delta=None):
    v = pb - pa
    inv_l2 = 1.0 / jnp.maximum(vm.squared_length(v), 1e-20)
    dab = v * jnp.sqrt(inv_l2)[:, None]
    cosA = vm.absdot(na, dab)
    if a_delta is not None:
        cosA = jnp.where(a_delta, 1.0, cosA)
    cosB = vm.absdot(nb, dab)
    return cosA * cosB * inv_l2


def bdpt_contributions(scene, meta, pixel_ids, s_idx, seed, max_len,
                       debug_s=-1, debug_t=-1, debug_no_mis=False):
    """-> (x, y, contribution) lists flattened over strategies."""
    lights = scene["lights"]
    tri_data = _em_tri_data(scene)
    cam = meta.camera
    spec = cam.film
    R = pixel_ids.shape[0]
    n_grid = spp_grid(int(meta.settings.get("sample_per_pixel", 1)))

    # ---- light path start
    u_pick = hash_uniform(seed, pixel_ids, s_idx, 0, _D)
    lid, pick_pdf = lt.pick_light(lights, u_pick)
    em = lt.sample_emission(
        lights, tri_data, lid,
        hash_uniform(seed, pixel_ids, s_idx, 0, _D + 1),
        hash_uniform(seed, pixel_ids, s_idx, 0, _D + 2),
        hash_uniform(seed, pixel_ids, s_idx, 0, _D + 3),
        hash_uniform(seed, pixel_ids, s_idx, 0, _D + 4),
    )
    pdf_bwd_l0 = em["pdf_pos"] * pick_pdf
    cos_l = vm.absdot(em["n"], em["dir"])
    pdf_fwd_l0 = jnp.where(em["is_delta"], em["pdf_dir"],
                           em["pdf_dir"] / jnp.maximum(cos_l, 1e-20))
    # only directional lights have sampleDirection pdf != pdfDirection
    l0_spec = lights["type"][lid] == lt.LIGHT_DIRECTIONAL
    from ..splatting import _env_le_at

    l0_tp = 1.0 / jnp.maximum(pdf_bwd_l0, 1e-20)
    Le0 = lt.eval_emission(lights, lid, em["n"], em["dir"],
                           env_le=_env_le_at(scene, meta, em["dir"]))
    walk_tp_l = (l0_tp / jnp.maximum(pdf_fwd_l0, 1e-20))[:, None] * Le0
    lverts = _walk(scene, meta, pixel_ids, s_idx, seed, em["p"], em["dir"],
                   walk_tp_l, bx.MODE_IMPORTANCE, max_len, _D + 10)
    # delta light can't be hit: vertex1 pdf_bwd = 0 (reference :206-208)
    lverts["pdf_bwd"] = lverts["pdf_bwd"].at[0].set(
        jnp.where(em["is_delta"], 0.0, lverts["pdf_bwd"][0])
    )
    lverts = _fix_G_first(lverts, em["p"], em["n"], em["is_delta"])

    # ---- eye path start
    x, y = pixel_samples(seed, pixel_ids, spec.x_res, s_idx, n_grid)
    lu = hash_uniform(seed, pixel_ids, s_idx, 0, _D + 5)
    lv = hash_uniform(seed, pixel_ids, s_idx, 0, _D + 6)
    p_cam, n_cam, pdf_cam = cam.sample_position(lu, lv)
    dir_e, We, pdf_dir_e = cam.sample_direction(x, y, p_cam)
    cos_e = vm.absdot(n_cam, dir_e)
    pdf_fwd_e0 = pdf_dir_e / jnp.maximum(cos_e, 1e-20)
    e0_tp = 1.0 / jnp.maximum(pdf_cam, 1e-20)
    walk_tp_e = (e0_tp * We / jnp.maximum(pdf_fwd_e0, 1e-20))[:, None]
    walk_tp_e = jnp.broadcast_to(walk_tp_e, (R, 3))
    env_sphere = None
    if meta.has_env:
        env_sphere = (lights["world_center"], lights["world_radius"],
                      jnp.int32(meta.env_light_id))
    everts = _walk(scene, meta, pixel_ids, s_idx, seed, p_cam, dir_e,
                   walk_tp_e, bx.MODE_RADIANCE, max_len, _D + 20,
                   env_sphere=env_sphere)
    everts["pdf_bwd"] = everts["pdf_bwd"].at[0].set(
        jnp.where(cam.is_delta, 0.0, everts["pdf_bwd"][0])
    )
    everts = _fix_G_first(everts, p_cam, jnp.broadcast_to(
        jnp.asarray(cam.look, jnp.float32), (R, 3)), False)

    # vertex counts
    l_count = 1 + jnp.sum(lverts["valid"].astype(jnp.int32), axis=0)
    e_count = 1 + jnp.sum(everts["valid"].astype(jnp.int32), axis=0)

    def lv_get(field, i):
        """Light path vertex i (0 = the light itself)."""
        if i == 0:
            return {
                "p": em["p"], "ns": em["n"],
                "tp": jnp.broadcast_to(l0_tp[:, None], (R, 3)),
                "pdf_fwd": pdf_fwd_l0, "pdf_bwd": pdf_bwd_l0,
                "is_spec": l0_spec, "G": jnp.zeros((R,)),
                "light": lid, "mat": None,
                "is_lens": jnp.zeros((R,), bool),
            }[field]
        return lverts[field][i - 1]

    def ev_get(field, i):
        if i == 0:
            return {
                "p": p_cam, "ns": jnp.broadcast_to(
                    jnp.asarray(cam.look, jnp.float32), (R, 3)),
                "tp": jnp.broadcast_to(e0_tp[:, None], (R, 3)),
                "pdf_fwd": pdf_fwd_e0, "pdf_bwd": pdf_cam,
                "is_spec": jnp.zeros((R,), bool), "G": jnp.zeros((R,)),
                "light": jnp.full((R,), -1, jnp.int32), "mat": None,
                "is_lens": jnp.zeros((R,), bool),
            }[field]
        return everts[field][i - 1]

    def vertex_bsdf(verts, i, wo, wi, mode):
        frag = {"mat": verts["mat"][i - 1], "uv": verts["uv"][i - 1]}
        mat = gather_material(scene, meta, frag)
        f = bx.bsdf_eval(mat, verts["ns"][i - 1], wo, wi, bx.BSDF_ALL,
                         mode=mode)
        # virtual env vertices carry no BSDF (like the reference's black-
        # lambert area-light surface, connections through them are zero)
        return jnp.where(verts["is_env"][i - 1][:, None], 0.0, f)

    def vertex_pdf(verts, i, wo, wi):
        frag = {"mat": verts["mat"][i - 1], "uv": verts["uv"][i - 1]}
        mat = gather_material(scene, meta, frag)
        pdf = bx.bsdf_pdf(mat, verts["ns"][i - 1], wo, wi, bx.BSDF_ALL)
        return jnp.where(verts["is_env"][i - 1], 0.0, pdf)

    xs, ys, cs = [], [], []
    pick_table = lights["power"] / jnp.sum(lights["power"])

    for path_length in range(1, max_len + 1):
        pvc = path_length + 1
        for s in range(0, pvc + 1):
            t = pvc - s
            if debug_s != -1 and s != debug_s:
                continue
            if debug_t != -1 and t != debug_t:
                continue
            if (s == 0 and t < 2) or (t == 0 and s < 2) or s + t < 2:
                continue
            if t == 0 and (cam.is_delta or not meta.has_lens):
                continue  # lens-hit strategies need a lens primitive
            if s > max_len + 1 or t > max_len + 1:
                continue
            ok = (s <= l_count) & (t <= e_count)

            # ---------- unweighted contribution
            if s == 0:
                # eye path end vertex eyePath[t-1] IS a light (reference
                # `s == 0 && !eyePath[t - 1].isLight()` skip,
                # src/GoblinBDPT.cpp:119-122)
                end_light = ev_get("light", t - 1)
                ok = ok & (end_light >= 0)
                wo = vm.normalize(ev_get("p", t - 2) - ev_get("p", t - 1),
                                  eps=1e-30)
                cst = lt.eval_emission(lights, jnp.maximum(end_light, 0),
                                       ev_get("ns", t - 1), wo,
                                       env_le=_env_le_at(scene, meta, wo))
                aL = jnp.ones((R, 3))
                aE = ev_get("tp", t - 1)
                Gc = jnp.ones((R,))
                sx, sy = x, y
                scr_ok = jnp.ones((R,), bool)
            elif t == 0:
                # light path end vertex hit the camera lens: splat at the
                # re-projected pixel (reference GoblinBDPT.cpp:127-133,
                # evalUnweightedContribution t==0 branch :303-306)
                ok = ok & lv_get("is_lens", s - 1)
                pS1 = lv_get("p", s - 1)
                pS2 = lv_get("p", s - 2)
                cst = cam.eval_we(pS1, pS2)[:, None] * jnp.ones((R, 3))
                sx, sy, _, scr_ok = cam.world_to_screen(pS2, pS1)
                ok = ok & scr_ok
                aL = lv_get("tp", s - 1)
                aE = jnp.ones((R, 3))
                Gc = jnp.ones((R,))
            else:
                sp_ = lv_get("p", s - 1)
                tp_ = ev_get("p", t - 1)
                conn = tp_ - sp_
                dist = jnp.maximum(vm.length(conn), 1e-20)
                cd = conn / dist[:, None]
                if s == 1:
                    fsL = lt.eval_emission(
                        lights, lid, em["n"], cd,
                        env_le=_env_le_at(scene, meta, cd),
                    )
                else:
                    woL = vm.normalize(lv_get("p", s - 2) - sp_, eps=1e-30)
                    fsL = vertex_bsdf(lverts, s - 1, woL, cd,
                                      bx.MODE_IMPORTANCE)
                if t == 1:
                    fsE = cam.eval_we(tp_, sp_)[:, None]
                    sx, sy, _, scr_ok = cam.world_to_screen(sp_, tp_)
                else:
                    woE = vm.normalize(ev_get("p", t - 2) - tp_, eps=1e-30)
                    fsE = vertex_bsdf(everts, t - 1, woE, -cd,
                                      bx.MODE_RADIANCE)
                    sx, sy = x, y
                    scr_ok = jnp.ones((R,), bool)
                a_delta = em["is_delta"] if s == 1 else None
                nsE = ev_get("ns", t - 1)
                nsL = lv_get("ns", s - 1)
                Gc = _eval_g(sp_, nsL, tp_, nsE, a_delta)
                eps_c = 1e-3 * dist
                occ = scn.occluded(scene, meta, sp_, cd, eps_c,
                                   dist - eps_c)
                ok = ok & ~occ & (Gc > 0.0) & scr_ok
                if t == 1 and s == 1:
                    cst = fsL * fsE * Gc[:, None]
                else:
                    cst = fsL * fsE * Gc[:, None]
                aL = lv_get("tp", s - 1)
                aE = ev_get("tp", t - 1)
            contrib = aL * cst * aE
            ok = ok & jnp.any(contrib != 0.0, axis=-1)

            # ---------- MIS weight
            if debug_no_mis:
                weight = jnp.ones((R,))
            else:
                weight = _mis_weight(
                    scene, meta, cam, lights, pick_table,
                    lv_get, ev_get, lverts, everts, vertex_pdf,
                    em, lid, s, t, Gc, R,
                )
            c = jnp.where(ok[:, None], weight[:, None] * contrib, 0.0)
            xs.append(jnp.where(ok, sx, -1e9))
            ys.append(jnp.where(ok, sy, -1e9))
            cs.append(c)

    if not xs:  # debug filters can exclude every strategy
        return (jnp.full((R,), -1e9), jnp.full((R,), -1e9),
                jnp.zeros((R, 3)))
    return jnp.concatenate(xs), jnp.concatenate(ys), jnp.concatenate(cs)


def _mis_weight(scene, meta, cam, lights, pick_table, lv_get, ev_get,
                lverts, everts, vertex_pdf, em, lid, s, t, Gc, R):
    """Reference evalMIS translated to masked vector ops."""
    zero = jnp.zeros((R,))
    # end-vertex pdf re-evaluation
    if s == 0:
        end_light = jnp.maximum(ev_get("light", t - 1), 0)
        p = ev_get("p", t - 1)
        n = ev_get("ns", t - 1)
        pdfT_fwd = pick_table[end_light] * lt.pdf_emission_position(
            lights, end_light
        )
        wo = vm.normalize(ev_get("p", t - 2) - p, eps=1e-30)
        pdfT_bwd = lt.pdf_emission_direction(lights, end_light, n, wo) / \
            jnp.where(vm.dot(n, wo) == 0, 1e-20, vm.dot(n, wo))
        pdfS_fwd = pdfS_bwd = zero
    elif t == 0:
        # light path end vertex is the camera lens (reference evalMIS
        # t==0 branch, GoblinBDPT.cpp:397-405). Divergence note: our
        # pdf_position is the true 1/(pi r^2); the reference's has a
        # parenthesization slip (see module docstring).
        p = lv_get("p", s - 1)
        n = lv_get("ns", s - 1)
        pdfS_fwd = jnp.broadcast_to(
            jnp.asarray(cam.pdf_position(), jnp.float32), (R,)
        )
        wo = vm.normalize(lv_get("p", s - 2) - p, eps=1e-30)
        pdfS_bwd = cam.pdf_direction(wo) / jnp.where(
            vm.dot(n, wo) == 0, 1e-20, vm.dot(n, wo)
        )
        pdfT_fwd = pdfT_bwd = zero
    else:
        sp_ = lv_get("p", s - 1)
        tp_ = ev_get("p", t - 1)
        d_st = vm.normalize(tp_ - sp_, eps=1e-30)
        nS = lv_get("ns", s - 1)
        nT = ev_get("ns", t - 1)
        if s == 1:
            pdfW = lt.pdf_emission_direction(lights, lid, em["n"], d_st)
            pdfS_fwd = jnp.where(
                em["is_delta"], pdfW,
                pdfW / jnp.where(vm.dot(nS, d_st) == 0, 1e-20,
                                 vm.dot(nS, d_st)),
            )
            pdfS_bwd = lv_get("pdf_bwd", 0)
        else:
            woS = vm.normalize(lv_get("p", s - 2) - sp_, eps=1e-30)
            pdfS_fwd = vertex_pdf(lverts, s - 1, woS, d_st) / jnp.where(
                vm.dot(d_st, nS) == 0, 1e-20, vm.dot(d_st, nS))
            pdfS_bwd = vertex_pdf(lverts, s - 1, d_st, woS) / jnp.where(
                vm.dot(woS, nS) == 0, 1e-20, vm.dot(woS, nS))
        d_ts = -d_st
        if t == 1:
            pdfW = cam.pdf_direction(d_ts)
            pdfT_fwd = pdfW / jnp.where(vm.dot(nT, d_ts) == 0, 1e-20,
                                        vm.dot(nT, d_ts))
            pdfT_bwd = ev_get("pdf_bwd", 0)
        else:
            woT = vm.normalize(ev_get("p", t - 2) - tp_, eps=1e-30)
            pdfT_fwd = vertex_pdf(everts, t - 1, woT, d_ts) / jnp.where(
                vm.dot(d_ts, nT) == 0, 1e-20, vm.dot(d_ts, nT))
            pdfT_bwd = vertex_pdf(everts, t - 1, d_ts, woT) / jnp.where(
                vm.dot(woT, nT) == 0, 1e-20, vm.dot(woT, nT))

    # misNodes arrays
    k = s + t - 1
    n_nodes = k + 1
    pL = [zero] * n_nodes  # pTowardLight
    pE = [zero] * n_nodes  # pTowardEye
    spec = [jnp.zeros((R,), bool)] * n_nodes
    for i in range(0, s - 1):
        pL[i] = (lv_get("pdf_bwd", 0) if i == 0
                 else lv_get("pdf_bwd", i) * lv_get("G", i))
        pE[i] = lv_get("pdf_fwd", i) * lv_get("G", i + 1)
        spec[i] = lv_get("is_spec", i)
    if s > 0:
        pL[s - 1] = (pdfS_bwd if s == 1
                     else pdfS_bwd * lv_get("G", s - 1))
        pE[s - 1] = pdfS_fwd if (s - 1) == k else pdfS_fwd * Gc
        spec[s - 1] = lv_get("is_spec", s - 1)
    for i in range(0, t - 1):
        pE[k - i] = (ev_get("pdf_bwd", 0) if i == 0
                     else ev_get("pdf_bwd", i) * ev_get("G", i))
        pL[k - i] = ev_get("pdf_fwd", i) * ev_get("G", i + 1)
        spec[k - i] = ev_get("is_spec", i)
    if t > 0:
        pE[k - (t - 1)] = (pdfT_bwd if t == 1
                           else pdfT_bwd * ev_get("G", t - 1))
        pL[k - (t - 1)] = pdfT_fwd if (t - 1) == k else pdfT_fwd * Gc
        spec[k - (t - 1)] = ev_get("is_spec", t - 1)

    def safe_div(a, b):
        return a / jnp.where(jnp.abs(b) < 1e-30, 1e-30, b)

    mis_sum = jnp.ones((R,))
    pK = jnp.ones((R,))
    # walk toward the eye side
    for i in range(s, k + 1):
        if i == 0:
            pK = pK * safe_div(pL[0], pL[1])
            add = ~spec[1]
        elif i == k:
            if cam.is_delta:
                break
            pK = pK * safe_div(pE[k - 1], pE[k])
            add = jnp.ones((R,), bool)
        else:
            pK = pK * safe_div(pE[i - 1], pL[i + 1])
            add = ~(spec[i] | spec[i + 1])
        mis_sum = mis_sum + jnp.where(add, pK * pK, 0.0)
    # walk toward the light side
    pK = jnp.ones((R,))
    for i in range(s, 0, -1):
        if i == (k + 1):
            pK = pK * safe_div(pE[k], pE[k - 1])
            add = ~spec[k - 1]
        elif i == 1:
            pK = pK * safe_div(pL[1], pL[0])
            # eye path can't hit a delta light
            add = ~em["is_delta"]
        else:
            pK = pK * safe_div(pL[i], pE[i - 2])
            add = ~(spec[i - 1] | spec[i - 2])
        mis_sum = mis_sum + jnp.where(add, pK * pK, 0.0)

    return 1.0 / mis_sum


def render_bdpt(scene, meta, chunk_size=1 << 13, spp=None, seed=None):
    """Full BDPT render. Film: splat, normalize=False, scale
    pixelCount/totalSamples (reference :553-558)."""
    spec = meta.camera.film
    if spp is None:
        spp = int(meta.settings.get("sample_per_pixel", 1))
    if seed is None:
        seed = int(meta.settings.get("seed", 0))
    max_len = max(1, int(meta.settings.get("max_ray_depth", 5)))
    debug_s = int(meta.settings.get("debug_s", -1))
    debug_t = int(meta.settings.get("debug_t", -1))
    debug_no_mis = bool(meta.settings.get("debug_no_mis", False))
    n_grid = spp_grid(spp)
    n_spp = n_grid * n_grid

    xs_, xc, ys_, yc = spec.crop_window()
    n_pix = xc * yc
    pixel_ids_all = (
        (np.arange(ys_, ys_ + yc)[:, None] * spec.x_res
         + np.arange(xs_, xs_ + xc)[None, :]).reshape(-1).astype(np.int32)
    )
    n_chunks = (n_pix + chunk_size - 1) // chunk_size
    pad = n_chunks * chunk_size - n_pix
    if pad:
        pixel_ids_all = np.concatenate(
            [pixel_ids_all, np.full(pad, pixel_ids_all[-1], np.int32)]
        )
    valid_all = np.ones(pixel_ids_all.size, bool)
    if pad:
        valid_all[n_pix:] = False

    def build_chunk_fns():
        @jax.jit
        def taps_fn(pixel_ids, valid, s_idx):
            x, y, c = bdpt_contributions(
                scene, meta, pixel_ids, s_idx, seed, max_len,
                debug_s, debug_t, debug_no_mis,
            )
            n_strat = x.shape[0] // pixel_ids.shape[0]
            v = jnp.tile(valid, n_strat)
            c = jnp.where(v[:, None], c, 0.0)
            x = jnp.where(v, x, -1e9)
            return film_mod.splat_taps(spec, x, y, c, normalized=True)

        # the scatter MUST be its own dispatch (film.splat_taps doc)
        accum_fn = jax.jit(film_mod.splat_accum, donate_argnums=(0, 1))
        return taps_fn, accum_fn

    from .common import jit_cache

    taps_fn, accum_fn = jit_cache(
        meta,
        ("bdpt", id(scene), seed, max_len, chunk_size, debug_s, debug_t,
         debug_no_mis),
        build_chunk_fns,
    )

    def chunk_fn(color, weight, pixel_ids, valid, s_idx):
        return accum_fn(color, weight, *taps_fn(pixel_ids, valid, s_idx))

    color, weight = film_mod.new_film(spec)
    total = 0
    for s in range(n_spp):
        for ci in range(n_chunks):
            sl = slice(ci * chunk_size, (ci + 1) * chunk_size)
            color, weight = chunk_fn(
                color, weight, jnp.asarray(pixel_ids_all[sl]),
                jnp.asarray(valid_all[sl]), jnp.int32(s),
            )
        total += n_pix
    img = film_mod.to_image(color, weight, normalize=False)
    return img * (float(n_pix) / float(total))
