"""Texture chain: UV differentials -> MIPMap trilinear/EWA -> bump/normal.

Covers the reference behaviors of Intersection::computeUVDifferential
(src/GoblinPrimitive.cpp:32-97), MIPMap filtering
(src/GoblinTexture.cpp:131-271) and Material::perturb
(src/GoblinMaterial.cpp:221-283) in their wavefront forms.
"""

import json
import os

import jax.numpy as jnp
import numpy as np

from goblin_tpu.io.exr import write_exr
from goblin_tpu.scene import intersect as scn
from goblin_tpu.scene.loader import load_scene
from goblin_tpu.shading.textures import (
    FILTER_EWA,
    FILTER_TRILINEAR,
    TEX_IMAGE,
    TexSpec,
    TextureSystem,
)

UV_PLANE_OBJ = (
    "v -1 0 -1\nv 1 0 -1\nv 1 0 1\nv -1 0 1\n"
    "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
    "vn 0 1 0\n"
    "f 1/1/1 2/2/1 3/3/1\nf 1/1/1 3/3/1 4/4/1\n"
)


def _plane_scene(tmp_path, materials, textures, extra_files=None):
    doc = {
        "render_setting": {"render_method": "path_tracing",
                           "sample_per_pixel": 1},
        "camera": {
            "position": [0, 2.0, 0], "euler": [90, 0, 0],
            "rotation_order": "xyz", "fov": 60.0,
            "film": {"resolution": [16, 16]},
            "filter": {"type": "box", "width": [0.5, 0.5]},
        },
        "geometries": [
            {"name": "plane", "type": "mesh", "file": "uvplane.obj"},
        ],
        "textures": textures,
        "materials": materials,
        "primitives": [
            {"type": "model", "name": "pm", "geometry": "plane",
             "material": materials[0]["name"]},
            {"type": "instance", "name": "pi", "model": "pm"},
        ],
        "lights": [
            {"name": "key", "type": "point", "intensity": [5, 5, 5],
             "position": [1, 3, 1]},
        ],
    }
    with open(os.path.join(tmp_path, "uvplane.obj"), "w") as f:
        f.write(UV_PLANE_OBJ)
    for name, img in (extra_files or {}).items():
        write_exr(os.path.join(tmp_path, name), img)
    p = os.path.join(tmp_path, "scene.json")
    with open(p, "w") as f:
        json.dump(doc, f)
    return load_scene(p)


WHITE = [{"format": "color", "name": "white", "type": "constant",
          "color": [0.8, 0.8, 0.8]}]
LAMBERT = [{"name": "mat", "type": "lambert", "Kd": "white"}]


def test_uv_differentials_analytic(tmp_path):
    """Straight-down rays on the uv plane (u=(x+1)/2, v=(z+1)/2):
    aux direction offset dx maps to dudx = dx_world/2."""
    scene, meta = _plane_scene(str(tmp_path), LAMBERT, WHITE)
    R = 8
    o = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (R, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (R, 3))
    dxd = jnp.broadcast_to(
        jnp.asarray([0.01, -1.0, 0.0]) / np.sqrt(1.0001), (R, 3))
    dyd = jnp.broadcast_to(
        jnp.asarray([0.0, -1.0, 0.01]) / np.sqrt(1.0001), (R, 3))
    mint = jnp.full((R,), 1e-4)
    maxt = jnp.full((R,), 1e30)
    frag = scn.intersect(scene, meta, o, d, mint, maxt, dxd=dxd, dyd=dyd)
    assert bool(frag["hit"].all())
    duv4 = np.asarray(frag["duv4"])
    # plane hit at t=1; aux offset 0.01 world -> du = 0.005
    np.testing.assert_allclose(duv4[:, 0], 0.005, rtol=1e-3)  # dudx
    np.testing.assert_allclose(duv4[:, 3], 0.005, rtol=1e-3)  # dvdy
    np.testing.assert_allclose(duv4[:, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(duv4[:, 2], 0.0, atol=1e-6)
    duv = np.asarray(frag["duv"])
    np.testing.assert_allclose(duv[:, 0], 0.005, rtol=1e-3)


def _checker_img(n=64):
    img = np.zeros((n, n, 3), np.float32)
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    img[((yy // 8 + xx // 8) % 2) == 0] = 1.0
    return img


def test_mip_trilinear_converges_to_mean():
    img = _checker_img()
    sys_ = TextureSystem([TexSpec(kind=TEX_IMAGE, image=img,
                                  filter=FILTER_TRILINEAR)])
    uv = jnp.asarray([[0.3, 0.4], [0.7, 0.2]])
    # huge footprint -> coarsest level == image mean (0.5)
    wide = sys_.eval_all(uv, duv=jnp.full((2, 2), 4.0))
    np.testing.assert_allclose(np.asarray(wide)[0], 0.5, atol=1e-3)
    # tiny footprint -> matches plain bilinear at level 0
    tiny = sys_.eval_all(uv, duv=jnp.full((2, 2), 1e-5))
    bil = TextureSystem([TexSpec(kind=TEX_IMAGE, image=img, filter=1)])
    ref = bil.eval_all(uv)
    np.testing.assert_allclose(np.asarray(tiny), np.asarray(ref), atol=1e-5)


def test_mip_ewa_anisotropic():
    """A footprint wide in u and thin in v should average along u only:
    for a u-striped image the EWA result approaches the stripe mean while
    an isotropic trilinear lookup at the same area over-blurs less
    selectively."""
    n = 64
    img = np.zeros((n, n, 3), np.float32)
    img[:, (np.arange(n) // 8) % 2 == 0] = 1.0  # stripes along u
    sys_ = TextureSystem([TexSpec(kind=TEX_IMAGE, image=img,
                                  filter=FILTER_EWA)])
    uv = jnp.asarray([[0.5, 0.5]])
    duv4 = jnp.asarray([[0.5, 0.0, 0.0, 1e-4]])  # wide in u, thin in v
    duv = jnp.asarray([[0.5, 1e-4]])
    out = np.asarray(sys_.eval_all(uv, duv=duv, duv4=duv4))[0, 0, 0]
    assert abs(out - 0.5) < 0.1  # averaged across stripes
    # thin isotropic footprint stays sharp (probe stripe interior,
    # not the u=0.5 stripe boundary)
    duv4s = jnp.asarray([[1e-4, 0.0, 0.0, 1e-4]])
    duvs = jnp.asarray([[1e-4, 1e-4]])
    uv_in = jnp.asarray([[0.44, 0.5]])
    sharp = np.asarray(sys_.eval_all(uv_in, duv=duvs, duv4=duv4s))[0, 0, 0]
    assert abs(sharp - round(sharp)) < 0.05


def test_bump_map_tilts_normal(tmp_path):
    """Height ramp h(u)=u on the uv plane tilts the shading normal
    toward -x (n' ~ (-2*dhdu, 4, -2*dhdv) direction for dpdu=(2,0,0),
    dpdv=(0,0,2), n=(0,1,0))."""
    n = 64
    ramp = np.broadcast_to(
        (np.arange(n, dtype=np.float32) / n)[None, :, None], (n, n, 3)
    ).copy()
    textures = WHITE + [
        {"format": "float", "name": "ramp", "type": "image",
         "file": "ramp.exr", "filter": "bilinear"},
    ]
    mats = [{"name": "mat", "type": "lambert", "Kd": "white",
             "bumpmap": "ramp"}]
    scene, meta = _plane_scene(str(tmp_path), mats, textures,
                               extra_files={"ramp.exr": ramp})
    assert meta.has_perturb
    R = 4
    o = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (R, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (R, 3))
    frag = scn.intersect(scene, meta, o, d, jnp.full((R,), 1e-4),
                         jnp.full((R,), 1e30))
    ns = np.asarray(frag["ns"])
    assert bool(frag["hit"].all())
    assert (ns[:, 0] < -1e-3).all(), f"bump did not tilt -x: {ns[0]}"
    # dhdu = 1 -> n' = (-2, 4, 0)/sqrt(20) analytically
    np.testing.assert_allclose(ns[:, 0], -2 / np.sqrt(20), atol=0.05)
    np.testing.assert_allclose(ns[:, 1], 4 / np.sqrt(20), atol=0.05)
    np.testing.assert_allclose(np.linalg.norm(ns, axis=-1), 1.0, rtol=1e-5)


def test_normal_map_overrides_normal(tmp_path):
    """Constant tangent-space normal (0.5,0.5,1) decodes to (0,0,1) ==
    unperturbed; (1,0.5,0.5) decodes to +tangent."""
    textures = WHITE + [
        {"format": "color", "name": "flat_n", "type": "constant",
         "color": [1.0, 0.5, 0.5]},
    ]
    mats = [{"name": "mat", "type": "lambert", "Kd": "white",
             "normalmap": "flat_n"}]
    scene, meta = _plane_scene(str(tmp_path), mats, textures)
    R = 4
    o = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (R, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (R, 3))
    frag = scn.intersect(scene, meta, o, d, jnp.full((R,), 1e-4),
                         jnp.full((R,), 1e30))
    ns = np.asarray(frag["ns"])
    t = np.asarray(frag["dpdu"])
    t = t / np.linalg.norm(t, axis=-1, keepdims=True)
    # decoded (1,0,0) in tangent space -> shading normal == tangent
    np.testing.assert_allclose(ns, t, atol=1e-4)


def test_checker_filter_activates_from_duv(tmp_path):
    """The analytic box-filtered checkerboard (reference integrateChecker)
    must engage when duv is populated: a footprint spanning many cells
    returns ~0.5 mix instead of a hard cell value."""
    textures = [
        {"format": "color", "name": "black", "type": "constant",
         "color": [0, 0, 0]},
        {"format": "color", "name": "whitec", "type": "constant",
         "color": [1, 1, 1]},
        {"format": "color", "name": "check", "type": "checkerboard",
         "texture1": "whitec", "texture2": "black", "filter": True,
         "scale": [16, 16]},
    ]
    mats = [{"name": "mat", "type": "lambert", "Kd": "check"}]
    scene, meta = _plane_scene(str(tmp_path), mats, textures)
    ts = meta.texture_system
    uv = jnp.asarray([[0.26, 0.26]])
    wide = np.asarray(ts.eval_all(uv, duv=jnp.full((1, 2), 0.25),
                                  const=scene["tex_const"]))[3, 0, 0]
    assert abs(wide - 0.5) < 0.06
    narrow = np.asarray(ts.eval_all(uv, duv=jnp.full((1, 2), 1e-5),
                                    const=scene["tex_const"]))[3, 0, 0]
    assert narrow in (0.0, 1.0) or abs(narrow - round(narrow)) < 0.05


def test_loader_spherical_mapping(tmp_path):
    """`mapping: spherical` through the JSON API (reference
    getTextureMapping + SphericalMapping, src/GoblinTexture.cpp:600-613,
    339-347): the image lookup must key on the spherical coords of the
    world hit position, ignoring the mesh uv."""
    n = 64
    # s-ramp image: value = column/n  -> lookup returns ~s = phi/2pi
    ramp = np.broadcast_to(
        ((np.arange(n, dtype=np.float32) + 0.5) / n)[None, :, None],
        (n, n, 3),
    ).copy()
    textures = WHITE + [
        {"format": "color", "name": "sph", "type": "image",
         "file": "ramp.exr", "filter": "bilinear", "mapping": "spherical"},
    ]
    mats = [{"name": "mat", "type": "lambert", "Kd": "sph"}]
    scene, meta = _plane_scene(str(tmp_path), mats, textures,
                               extra_files={"ramp.exr": ramp})
    from goblin_tpu.shading.textures import MAP_SPHERICAL

    specs = meta.texture_system.specs
    assert any(s.mapping == MAP_SPHERICAL for s in specs), \
        "loader dropped mapping: spherical"
    # evaluate at world points of known phi: p=(1,0,1e-3) -> phi=0 ->
    # s~0; p=(-1,0,1e-3)... use arbitrary uv to prove it is ignored
    # (phi=0 sits on the bilinear repeat-wrap seam of the ramp; probe
    # interior angles)
    pts = np.asarray([[1.0, 1.0, 1e-3], [0.0, 1.0, 1e-3],
                      [-1.0, 0.0, 1e-3]], np.float32)
    exp_phi = np.asarray([np.pi / 4, np.pi / 2, np.pi]) / (2 * np.pi)
    uv = jnp.asarray(np.full((3, 2), 0.77, np.float32))
    stack = meta.texture_system.eval_all(
        uv, atlas=scene["tex_atlas"], const=scene["tex_const"],
        p=jnp.asarray(pts),
    )
    sph_id = [i for i, s in enumerate(specs)
              if s.mapping == MAP_SPHERICAL][0]
    got = np.asarray(stack)[sph_id, :, 0]
    np.testing.assert_allclose(got, exp_phi, atol=1.5 / n)


def test_loader_channel_selection(tmp_path):
    """image `channel` key (reference convertTexel,
    src/GoblinTexture.cpp:486-518): R/G/B replicate one channel, A with
    no alpha present reads 1, float-format All takes luminance."""
    img = np.zeros((4, 4, 3), np.float32)
    img[..., 0] = 0.2
    img[..., 1] = 0.5
    img[..., 2] = 0.8
    textures = WHITE + [
        {"format": "color", "name": f"ch{c}", "type": "image",
         "file": "rgb.exr", "filter": "nearest", "channel": c}
        for c in ("R", "G", "B", "A")
    ] + [
        {"format": "float", "name": "lum", "type": "image",
         "file": "rgb.exr", "filter": "nearest"},
    ]
    mats = [{"name": "mat", "type": "lambert", "Kd": "chR"}]
    scene, meta = _plane_scene(str(tmp_path), mats, textures,
                               extra_files={"rgb.exr": img})
    uv = jnp.asarray([[0.5, 0.5]])
    stack = np.asarray(meta.texture_system.eval_all(
        uv, atlas=scene["tex_atlas"], const=scene["tex_const"]))
    # color textures 1..4 are chR..chA (0 is error magenta, then WHITE)
    by_name = {}
    for i, s in enumerate(meta.texture_system.specs):
        if s.kind == TEX_IMAGE:
            by_name[len(by_name)] = i
    vals = {i: stack[by_name[i], 0] for i in range(4)}
    np.testing.assert_allclose(vals[0], 0.2, atol=1e-5)  # R
    np.testing.assert_allclose(vals[1], 0.5, atol=1e-5)  # G
    np.testing.assert_allclose(vals[2], 0.8, atol=1e-5)  # B
    np.testing.assert_allclose(vals[3], 1.0, atol=1e-5)  # A (absent -> 1)
    fstack = np.asarray(meta.float_texture_system.eval_all(
        uv, atlas=scene["ftex_atlas"], const=scene["ftex_const"]))
    fimg = [i for i, s in enumerate(meta.float_texture_system.specs)
            if s.kind == TEX_IMAGE][0]
    lum = 0.212671 * 0.2 + 0.715160 * 0.5 + 0.072169 * 0.8
    np.testing.assert_allclose(fstack[fimg, 0, 0], lum, atol=1e-4)
