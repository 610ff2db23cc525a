"""Per-lane material resolution: gather material rows + evaluate textures.

Bridges the baked scene tables to the BSDF module's per-lane `mat` dict.
Mask materials are flattened here: the lane carries the *inner* material's
parameters plus (alpha, transparent_color) for the null lobe — the
wavefront equivalent of MaskMaterial wrapping
(reference src/GoblinMaterial.cpp:747-811).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..shading.bsdf import MAT_MASK


def gather_material(scene, meta, frag, u_mask=None):
    mid = frag["mat"]
    mtype_raw = jnp.take(scene["mat_type"], mid)
    is_masked = mtype_raw == MAT_MASK
    inner = jnp.take(scene["mat_inner"], mid)
    eff = jnp.where(is_masked, jnp.maximum(inner, 0), mid)

    tex_stack = meta.texture_system.eval_all(
        frag["uv"], atlas=scene.get("tex_atlas"), const=scene.get("tex_const"),
        p=frag.get("p"), duv=frag.get("duv"), duv4=frag.get("duv4"),
    )  # (X, R, 3)
    ftex_stack = meta.float_texture_system.eval_all(
        frag["uv"], atlas=scene.get("ftex_atlas"),
        const=scene.get("ftex_const"), p=frag.get("p"), duv=frag.get("duv"),
        duv4=frag.get("duv4"),
    )

    def gc(ids):
        return jnp.take_along_axis(
            tex_stack, ids[None, :, None].astype(jnp.int32), axis=0
        )[0]

    def gf(ids):
        return jnp.take_along_axis(
            ftex_stack, ids[None, :, None].astype(jnp.int32), axis=0
        )[0][..., 0]

    mat = {
        "mtype": jnp.take(scene["mat_type"], eff),
        "c0": gc(jnp.take(scene["mat_tex_c0"], eff)),
        "c1": jnp.where(
            is_masked[..., None],
            gc(jnp.take(scene["mat_tex_c1"], mid)),  # transparent_color
            gc(jnp.take(scene["mat_tex_c1"], eff)),
        ),
        "f0": gf(jnp.take(scene["mat_tex_f0"], eff)),
        "eta": jnp.take(scene["mat_eta"], eff),
        "k": jnp.take(scene["mat_k"], eff),
        "is_masked": is_masked,
        "mask_alpha": gf(jnp.take(scene["mat_tex_f1"], mid)),
    }
    if u_mask is not None:
        mat["mask_u"] = u_mask
    else:
        mat["mask_u"] = jnp.zeros_like(mat["mask_alpha"])
    return mat
