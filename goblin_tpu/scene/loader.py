"""JSON scene loader — the public user API, schema-compatible with the
reference (src/GoblinContextLoader.cpp; keys/defaults per SURVEY.md §7
Appendix A). `examples/bunny.json`-style files load unchanged.

Sections: render_setting, camera{film, filter}, volume, geometries[],
textures[], materials[], primitives[], lights[].

Behavioral parity notes:
- unknown names resolve to error assets (magenta), like SceneCache
  (src/GoblinScene.cpp:112-128)
- area lights synthesize a black-Lambert model+instance so they are
  hittable (src/GoblinContextLoader.cpp:419-441)
- models must be wrapped in instances to enter the scene (:381-383)
- default output path is `<scene>.exr` (:473-484)
- lens_radius > 0 synthesizes a camera-lens disk instance (:148-175);
  flagged is_camera_lens and excluded from the main BVH
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..camera.camera import CameraSpec
from ..camera.film import FilmSpec, FilterSpec
from ..geometry.mesh import load_obj
from ..io.exr import read_exr
from ..lights.lights import (
    LIGHT_AREA,
    LIGHT_DIRECTIONAL,
    LIGHT_IBL,
    LIGHT_POINT,
    LIGHT_SPOT,
)
from ..shading.bsdf import (
    MAT_BLINN,
    MAT_LAMBERT,
    MAT_MASK,
    MAT_MIRROR,
    MAT_SUBSURFACE,
    MAT_TRANSPARENT,
)
from ..shading.textures import (
    ADDRESS_BORDER,
    ADDRESS_CLAMP,
    ADDRESS_REPEAT,
    FILTER_BILINEAR,
    FILTER_EWA,
    FILTER_NEAREST,
    FILTER_TRILINEAR,
    MAP_SPHERICAL,
    TEX_CHECKERBOARD,
    TEX_CONSTANT,
    TEX_IMAGE,
    TEX_SCALE,
    TexSpec,
)
from .bake import InstanceRecord, MatSpec, SceneBuilder
from .params import ParamSet, get_quaternion, get_transform


def _resolve_path(scene_dir, p):
    if os.path.isabs(p):
        return p
    return os.path.join(scene_dir, p)


def load_scene(path: str, overrides: dict | None = None):
    """Load a scene JSON -> (scene dict, SceneMeta). `overrides` patches
    render_setting keys (e.g. {"render_method": "path_tracing"})."""
    with open(path) as f:
        doc = json.load(f)
    scene_dir = os.path.dirname(os.path.abspath(path))
    builder = SceneBuilder()

    # --- render_setting
    settings = dict(doc.get("render_setting", {}))
    if overrides:
        settings.update(overrides)
    rs = ParamSet(settings)
    builder.settings = {
        "render_method": rs.get_string("render_method", "path_tracing"),
        "sample_per_pixel": rs.get_int("sample_per_pixel", 1),
        "max_ray_depth": rs.get_int("max_ray_depth", 5),
        "ao_sample_num": rs.get_int("ao_sample_num", 25),
        "bssrdf_sample_num": rs.get_int("bssrdf_sample_num", 4),
        "initial_radius": rs.get_float("initial_radius", -1.0),
        "debug_s": rs.get_int("debug_s", -1),
        "debug_t": rs.get_int("debug_t", -1),
        "debug_no_mis": rs.get_bool("debug_no_mis", False),
        # extension: light-tracer strategy toggle (t1 | t0 | s1), the
        # runtime analogue of the reference's compile-time splatFilm
        # alternates (src/GoblinLightTracer.h:30-46)
        "lt_strategy": rs.get_string("lt_strategy", "t1"),
        "seed": rs.get_int("seed", 0),
    }

    # --- camera (+ film + filter)
    cam_raw = doc.get("camera", {})
    cam_p = ParamSet(cam_raw)
    filt_raw = cam_raw.get("filter", {})
    filt_p = ParamSet(filt_raw)
    fkind = filt_p.get_string("type", "gaussian")
    fw = filt_p.get_vec2("width", (1.0, 1.0))
    filter_spec = FilterSpec(
        kind=fkind,
        x_width=float(fw[0]),
        y_width=float(fw[1]),
        falloff=filt_p.get_float("falloff", 2.0),
        b=filt_p.get_float("b", 2.0),
        c=filt_p.get_float("c", 2.0),
    )
    film_raw = cam_raw.get("film", {})
    film_p = ParamSet(film_raw)
    res = film_p.get_vec2("resolution", (512.0, 512.0))
    crop = film_p.get_vec4("crop", (0.0, 1.0, 0.0, 1.0))
    default_out = os.path.splitext(os.path.basename(path))[0] + ".exr"
    out_file = film_p.get_string("file", os.path.join(scene_dir, default_out))
    film_spec = FilmSpec(
        x_res=int(res[0]),
        y_res=int(res[1]),
        crop=tuple(float(c) for c in crop),
        filename=out_file,
        tone_mapping=film_p.get_bool("tone_mapping", False),
        bloom_radius=film_p.get_float("bloom_radius", 0.0),
        bloom_weight=film_p.get_float("bloom_weight", 0.0),
        filter=filter_spec,
    )
    builder.output_path = out_file

    ckind = cam_p.get_string("type", "perspective")
    q = get_quaternion(cam_p)
    builder.camera = CameraSpec(
        kind=ckind if ckind in ("perspective", "orthographic") else "perspective",
        position=tuple(float(v) for v in cam_p.get_vec3("position")),
        orientation=tuple(float(v) for v in q),
        fov=float(np.radians(cam_p.get_float("fov", 60.0))),
        z_near=cam_p.get_float("near_plane", 0.1),
        z_far=cam_p.get_float("far_plane", 1000.0),
        lens_radius=cam_p.get_float("lens_radius", 0.0),
        focal_distance=cam_p.get_float("focal_distance", 1.0),
        film_width=cam_p.get_float("film_width", 35.0),
        film=film_spec,
    )
    lens_r = cam_p.get_float("lens_radius", 0.0)
    if lens_r > 0.0:
        # synthesize the camera-lens disk instance (black lambert, at the
        # camera pose) so light particles can hit it — BDPT t=0 / LT
        # splatFilmT0 (reference GoblinContextLoader.cpp:148-175)
        lens_black = builder.add_material(
            MatSpec(kind=MAT_LAMBERT, tex_c0=builder.add_color_texture(
                TexSpec(value=np.zeros(3, np.float32))))
        )
        builder.add_instance(
            InstanceRecord(
                geometry=("disk", lens_r),
                material=lens_black,
                to_world=get_transform(cam_p),
                is_camera_lens=True,
            )
        )

    # --- volume
    vol_raw = doc.get("volume")
    if vol_raw:
        from ..integrators.volume import VolumeSpec, load_vol

        vp = ParamSet(vol_raw)
        vkind = vp.get_string("type", "homogeneous")
        m = get_transform(vp)
        m_inv = np.linalg.inv(m)
        if vkind == "heterogeneous":
            gpath = _resolve_path(scene_dir, vp.get_string("density_grid"))
            try:
                grid, gb = load_vol(gpath)
                box_min = tuple(float(v) for v in gb[:3])
                box_max = tuple(float(v) for v in gb[3:])
            except Exception as e:
                print(f"[loader] failed to load density grid {gpath}: {e}")
                grid = np.zeros((1, 1, 1), np.float32)
                box_min, box_max = (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)
            builder.vol_grid = grid
            builder.volume = VolumeSpec(
                kind="heterogeneous",
                to_world=tuple(m.reshape(-1).tolist()),
                to_local=tuple(m_inv.reshape(-1).tolist()),
                box_min=box_min,
                box_max=box_max,
                albedo=tuple(vp.get_vec3("albedo", (0.5, 0.5, 0.5))),
                g=vp.get_float("g", 0.0),
                sample_num=vp.get_int("sample_num", 5),
                step_size=vp.get_float("step_size", 0.1),
                grid_shape=tuple(int(x) for x in grid.shape),
            )
        else:
            builder.volume = VolumeSpec(
                kind="homogeneous",
                to_world=tuple(m.reshape(-1).tolist()),
                to_local=tuple(m_inv.reshape(-1).tolist()),
                box_min=tuple(vp.get_vec3("box_min", (0.0, 0.0, 0.0))),
                box_max=tuple(vp.get_vec3("box_max", (1.0, 1.0, 1.0))),
                attenuation=tuple(vp.get_vec3("attenuation", (0.0, 0.0, 0.0))),
                albedo=tuple(vp.get_vec3("albedo", (0.0, 0.0, 0.0))),
                emission=tuple(vp.get_vec3("emission", (0.0, 0.0, 0.0))),
                g=vp.get_float("g", 0.0),
                sample_num=vp.get_int("sample_num", 5),
                step_size=vp.get_float("step_size", 0.1),
            )

    # --- geometries
    geometries: dict[str, object] = {}
    for raw in doc.get("geometries", []) or []:
        p = ParamSet(raw)
        name = p.get_string("name")
        kind = p.get_string("type", "sphere")
        if kind == "mesh":
            fpath = _resolve_path(scene_dir, p.get_string("file"))
            try:
                geometries[name] = load_obj(fpath)
            except (OSError, ValueError) as e:
                print(f"[loader] failed to load mesh {fpath}: {e}; skipping")
                continue
        elif kind == "disk":
            geometries[name] = ("disk", p.get_float("radius", 1.0))
        else:
            geometries[name] = ("sphere", p.get_float("radius", 1.0))

    # --- textures (separate float / color namespaces, like SceneCache)
    color_tex: dict[str, int] = {}
    float_tex: dict[str, int] = {}

    def parse_texture(raw):
        p = ParamSet(raw)
        fmt = p.get_string("format", "color")
        kind = p.get_string("type", "constant")
        mapping = p.get_string("mapping", "uv")
        ms = p.get_vec2("scale", (1.0, 1.0)) if kind != "scale" else (1.0, 1.0)
        mo = p.get_vec2("offset", (0.0, 0.0))
        # spherical mapping: toTex transform built from the texture's own
        # position/orientation/scale params and applied FORWARD to the
        # world-space hit point (reference getTextureMapping +
        # SphericalMapping::pointToST, src/GoblinTexture.cpp:600-613,
        # 339-347). Applies to checkerboard AND image textures.
        map_kw = {}
        if mapping == "spherical":
            map_kw = {
                "mapping": MAP_SPHERICAL,
                "world_to_tex": get_transform(p),
            }
        elif mapping != "uv":
            print(f"[loader] undefined mapping type {mapping}")
        table = color_tex if fmt == "color" else float_tex
        add = (
            builder.add_color_texture if fmt == "color" else builder.add_float_texture
        )
        if kind == "constant":
            if fmt == "color":
                val = p.get_vec3("color", (0.5, 0.5, 0.5))
            else:
                val = np.full(3, p.get_float("float", 0.5), np.float32)
            tid = add(TexSpec(kind=TEX_CONSTANT, value=np.asarray(val, np.float32)))
        elif kind == "checkerboard":
            c0 = table.get(p.get_string("texture1"), 0)
            c1 = table.get(p.get_string("texture2"), 0)
            tid = add(
                TexSpec(
                    kind=TEX_CHECKERBOARD,
                    child0=c0,
                    child1=c1,
                    map_scale=(float(ms[0]), float(ms[1])),
                    map_offset=(float(mo[0]), float(mo[1])),
                    checker_filter=p.get_bool("filter", False),
                    **map_kw,
                )
            )
        elif kind == "scale":
            base = table.get(p.get_string("texture"), 0)
            sc = (
                p.get_vec3("scale", (1.0, 1.0, 1.0))
                if fmt == "color"
                else np.full(3, p.get_float("scale", 1.0), np.float32)
            )
            tid = add(TexSpec(kind=TEX_SCALE, child0=base,
                              scale=np.asarray(sc, np.float32)))
        elif kind == "image":
            fpath = _resolve_path(scene_dir, p.get_string("file"))
            try:
                img = read_exr(fpath)
            except Exception as e:  # error fallback: 1x1 magenta
                print(f"[loader] failed to load image {fpath}: {e}")
                img = np.full((1, 1, 3), [1.0, 0.0, 1.0], np.float32)
            # channel selection at load time (reference convertTexel,
            # src/GoblinTexture.cpp:486-518): R/G/B/A replicate that
            # channel; float-format "All" takes Rec.709 luminance; a
            # missing alpha channel reads as 1 (EXR default)
            channel = p.get_string("channel", "All")
            if img.ndim == 2:
                img = img[:, :, None]
            if channel in ("R", "G", "B"):
                c = {"R": 0, "G": 1, "B": 2}[channel]
                c = min(c, img.shape[2] - 1)
                img = np.repeat(img[:, :, c:c + 1], 3, axis=2)
            elif channel == "A":
                a = (img[:, :, 3:4] if img.shape[2] >= 4
                     else np.ones_like(img[:, :, :1]))
                img = np.repeat(a, 3, axis=2)
            elif channel != "All":
                print(f"[loader] unrecognized channel {channel}")
            elif fmt == "float" and img.shape[2] >= 3:
                lum = (0.212671 * img[:, :, 0:1]
                       + 0.715160 * img[:, :, 1:2]
                       + 0.072169 * img[:, :, 2:3])
                img = np.repeat(lum.astype(np.float32), 3, axis=2)
            filt = {
                "nearest": FILTER_NEAREST,
                "bilinear": FILTER_BILINEAR,
                "trilinear": FILTER_TRILINEAR,
                "EWA": FILTER_EWA,
            }.get(p.get_string("filter", "nearest"), FILTER_BILINEAR)
            addr = {
                "repeat": ADDRESS_REPEAT,
                "clamp": ADDRESS_CLAMP,
                "border": ADDRESS_BORDER,
            }.get(p.get_string("address", "repeat"), ADDRESS_REPEAT)
            tid = add(
                TexSpec(
                    kind=TEX_IMAGE,
                    image=img,
                    filter=filt,
                    address=addr,
                    gamma=p.get_float("gamma", 1.0),
                    max_anisotropy=p.get_float("max_anisotropy", 10.0),
                    map_scale=(float(ms[0]), float(ms[1])),
                    map_offset=(float(mo[0]), float(mo[1])),
                    **map_kw,
                )
            )
        else:
            tid = 0
        table[p.get_string("name")] = tid

    for raw in doc.get("textures", []) or []:
        parse_texture(raw)

    # --- materials
    materials: dict[str, int] = {}

    def color_tex_id(p: ParamSet, key, default=None):
        name = p.get_string(key, "")
        if name in color_tex:
            return color_tex[name]
        if default is not None:
            return builder.add_color_texture(
                TexSpec(value=np.asarray(default, np.float32))
            )
        return 0  # error magenta

    def float_tex_id(p: ParamSet, key, default=None):
        name = p.get_string(key, "")
        if name in float_tex:
            return float_tex[name]
        if default is not None:
            return builder.add_float_texture(
                TexSpec(value=np.full(3, float(default), np.float32))
            )
        return 0

    for raw in doc.get("materials", []) or []:
        p = ParamSet(raw)
        kind = p.get_string("type", "lambert")
        spec = MatSpec()
        if kind == "lambert":
            spec.kind = MAT_LAMBERT
            spec.tex_c0 = color_tex_id(p, "Kd")
        elif kind == "blinn":
            spec.kind = MAT_BLINN
            spec.tex_c0 = color_tex_id(p, "Kg")
            spec.tex_f0 = float_tex_id(p, "exponent", 10.0)
            spec.eta = p.get_float("index", 1.5)
            spec.k = p.get_float("k", -1.0)
        elif kind == "transparent":
            spec.kind = MAT_TRANSPARENT
            spec.tex_c0 = color_tex_id(p, "Kr")
            spec.tex_c1 = color_tex_id(p, "Kt")
            spec.eta = p.get_float("index", 1.5)
        elif kind == "mirror":
            spec.kind = MAT_MIRROR
            spec.tex_c0 = color_tex_id(p, "Kr", (1.0, 1.0, 1.0))
            spec.eta = p.get_float("index", 0.8)
            spec.k = p.get_float("k", 6.0)
        elif kind == "subsurface":
            spec.kind = MAT_SUBSURFACE
            spec.tex_c0 = color_tex_id(p, "Kr", (1.0, 1.0, 1.0))
            spec.eta = p.get_float("index", 1.5)
            spec.g = p.get_float("g", 0.0)
            if p.has("Kd"):
                # albedo + mean free path -> sigma_a/sigma_s' by bisection
                # (reference convertFromDiffuse,
                # src/GoblinMaterial.cpp:177-212, 884-902)
                from ..shading.bssrdf import convert_from_diffuse, fresnel_a

                sa, ssp = convert_from_diffuse(
                    p.get_vec3("Kd", (0.5, 0.5, 0.5)),
                    p.get_vec3("mean_free_path", (1.0, 1.0, 1.0)),
                    fresnel_a(spec.eta),
                )
                spec.absorb = tuple(float(v) for v in sa)
                spec.scatter_prime = tuple(float(v) for v in ssp)
            else:
                # marble defaults (src/GoblinMaterial.cpp:909,919);
                # texture-name refs resolve to their constant value
                def _sigma(key, default):
                    v = raw.get(key, None)
                    if isinstance(v, str):
                        tid = color_tex.get(v, -1)
                        if tid >= 0:
                            return tuple(
                                float(x)
                                for x in builder.color_textures[tid].value[:3]
                            )
                        return default
                    if v is None:
                        return default
                    return tuple(float(x) for x in v)

                spec.absorb = _sigma("absorb", (0.0021, 0.0041, 0.0071))
                spec.scatter_prime = _sigma(
                    "scatter_prime", (2.19, 2.62, 3.00)
                )
        elif kind == "mask":
            spec.kind = MAT_MASK
            spec.tex_f1 = float_tex_id(p, "alpha", 1.0)
            spec.tex_c1 = color_tex_id(p, "transparent_color", (1.0, 1.0, 1.0))
            spec.inner = materials.get(p.get_string("material"), 0)
        spec.bump_tex = float_tex_id(p, "bumpmap") if p.has("bumpmap") else -1
        spec.normal_tex = color_tex_id(p, "normalmap") if p.has("normalmap") else -1
        materials[p.get_string("name")] = builder.add_material(spec)

    # --- lights (before primitives: area lights registered by name order)
    # reference order: primitives section is parsed before lights; area
    # lights then synthesize their own instance. We parse lights first to
    # know light ids, then add the synthesized instances after primitives
    # (order in the tri soup doesn't matter — the BVH reorders anyway).
    area_light_geo: list[tuple[int, str, np.ndarray]] = []
    for raw in doc.get("lights", []) or []:
        p = ParamSet(raw)
        kind = p.get_string("type", "point")
        if kind == "point":
            builder.lights.add(
                LIGHT_POINT,
                p.get_vec3("intensity", (1, 1, 1)),
                position=p.get_vec3("position"),
            )
        elif kind == "directional":
            builder.lights.add(
                LIGHT_DIRECTIONAL,
                p.get_vec3("radiance", (1, 1, 1)),
                direction=p.get_vec3("direction", (0, 0, 1)),
            )
        elif kind == "spot":
            pos = p.get_vec3("position")
            if p.has("target"):
                d = p.get_vec3("target") - pos
            else:
                d = p.get_vec3("direction", (0, 0, 1))
            builder.lights.add(
                LIGHT_SPOT,
                p.get_vec3("intensity", (1, 1, 1)),
                position=pos,
                direction=d,
                cos_theta_max=float(np.cos(np.radians(p.get_float("theta_max", 30.0)))),
                cos_falloff_start=float(
                    np.cos(np.radians(p.get_float("falloff_start", 25.0)))
                ),
            )
        elif kind == "area":
            lid = builder.lights.add(
                LIGHT_AREA,
                p.get_vec3("radiance", (1, 1, 1)),
                sample_num=p.get_int("sample_num", 1),
            )
            area_light_geo.append((lid, p.get_string("geometry"), get_transform(p)))
        elif kind == "ibl":
            fpath = _resolve_path(scene_dir, p.get_string("file"))
            try:
                img = read_exr(fpath)
            except Exception as e:
                print(f"[loader] failed to load env map {fpath}: {e}")
                img = np.full((1, 1, 3), [1.0, 0.0, 1.0], np.float32)
            lid = builder.lights.add(
                LIGHT_IBL,
                p.get_vec3("filter", (1.0, 1.0, 1.0)),
                sample_num=p.get_int("sample_num", 1),
            )
            builder.env_light_id = lid
            builder.env_image = img
            builder.env_filter = p.get_vec3("filter", (1.0, 1.0, 1.0))
            builder.env_orientation = get_quaternion(p)

    # --- primitives: models (cached) + instances (enter the scene)
    models: dict[str, dict] = {}
    for raw in doc.get("primitives", []) or []:
        p = ParamSet(raw)
        kind = p.get_string("type", "model")
        name = p.get_string("name")
        if kind == "model":
            models[name] = {
                "geometry": p.get_string("geometry"),
                "material": p.get_string("material"),
                "is_camera_lens": p.get_bool("is_camera_lens", False),
            }
        else:  # instance
            model = models.get(p.get_string("model"), None)
            if model is None:
                print(f"[loader] unknown model {p.get_string('model')}")
                continue
            geo = geometries.get(model["geometry"])
            if geo is None:
                print(f"[loader] unknown geometry {model['geometry']}")
                continue
            builder.add_instance(
                InstanceRecord(
                    geometry=geo,
                    material=materials.get(model["material"], 0),
                    to_world=get_transform(p),
                    area_light=-1,
                    is_camera_lens=model["is_camera_lens"],
                )
            )

    # area lights: synthesize black-lambert instances so they're hittable
    black = builder.add_material(MatSpec(kind=MAT_LAMBERT, tex_c0=builder.
                                         add_color_texture(TexSpec(
                                             value=np.zeros(3, np.float32)))))
    for lid, geo_name, xform in area_light_geo:
        geo = geometries.get(geo_name)
        if geo is None:
            print(f"[loader] unknown area light geometry {geo_name}")
            continue
        builder.add_instance(
            InstanceRecord(
                geometry=geo, material=black, to_world=xform, area_light=lid
            )
        )

    return builder.bake()
