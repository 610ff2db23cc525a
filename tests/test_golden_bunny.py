"""Golden-image harness vs the compiled reference renderer.

Builds the reference (g++ -O2 src/*.cpp -pthread, cached at
~/.cache/g_ray), renders a reduced bunny.json with BOTH renderers at
equal spp for each method (PT, AO, Whitted, SPPM), and asserts
block-averaged agreement within Monte-Carlo noise. This is the
BASELINE.md image-correctness row; the two renderers use different RNGs,
so the comparison is on 8x8 block means rather than per-pixel equality.
"""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
G_RAY = os.path.expanduser("~/.cache/g_ray")
REF_SRC = "/root/reference/src"


def _build_reference():
    if os.path.exists(G_RAY):
        return G_RAY
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference sources unavailable")
    os.makedirs(os.path.dirname(G_RAY), exist_ok=True)
    import glob

    # forced prelude: the reference relies on transitive libstdc++
    # includes and C-style unqualified isinf/isnan that newer
    # toolchains no longer provide
    prelude = G_RAY + ".prelude.h"
    with open(prelude, "w") as f:
        f.write(
            "#include <cmath>\n#include <cstdio>\n"
            "#include <condition_variable>\n"
            "#include <mutex>\n#include <thread>\n#include <cstring>\n"
            "using std::isinf;\nusing std::isnan;\n"
            "typedef int errno_t;\n"
            "static inline errno_t fopen_s(FILE** f, const char* n,"
            " const char* m){*f=std::fopen(n,m);return *f?0:1;}\n"
        )
    res = subprocess.run(
        ["g++", "-O2", "-std=c++11", "-include", prelude,
         *sorted(glob.glob(f"{REF_SRC}/*.cpp")),
         "-pthread", "-o", G_RAY],
        capture_output=True, text=True, timeout=900,
    )
    if res.returncode != 0:
        pytest.skip(f"reference build failed: {res.stderr[-500:]}")
    return G_RAY


def _blocks(img, b=8):
    h, w = img.shape[:2]
    return img[: h // b * b, : w // b * b].reshape(
        h // b, b, w // b, b, 3
    ).mean(axis=(1, 3))


def _golden_compare(tmp_path, render_setting, render_ours,
                    mad_tol, energy_tol, res=(128, 96)):
    """Render a reduced bunny with the reference binary and with
    `render_ours(scene, meta) -> (H, W, 3)`; compare block means."""
    g_ray = _build_reference()
    from goblin_tpu.assets import ensure_bunny_obj
    from goblin_tpu.io.exr import read_exr
    from goblin_tpu.scene.loader import load_scene

    scene_dir = str(tmp_path)
    os.makedirs(os.path.join(scene_dir, "models"), exist_ok=True)
    ensure_bunny_obj(os.path.join(REPO, "examples", "models", "bunny.obj"))
    for mdl in ("bunny.obj", "plane.obj"):
        shutil.copy(os.path.join(REPO, "examples", "models", mdl),
                    os.path.join(scene_dir, "models", mdl))
    doc = json.load(open(os.path.join(REPO, "examples", "bunny.json")))
    doc["render_setting"] = dict(render_setting)
    doc["camera"]["film"]["resolution"] = list(res)
    ref_json = os.path.join(scene_dir, "bunny_ref.json")
    json.dump(doc, open(ref_json, "w"))

    r = subprocess.run([g_ray, ref_json], capture_output=True, text=True,
                       timeout=1800, cwd=scene_dir)
    assert r.returncode == 0, r.stderr[-800:]
    ref_exr = os.path.join(scene_dir, "bunny_ref.exr")
    assert os.path.exists(ref_exr), r.stdout[-500:]
    ref_img = read_exr(ref_exr)[..., :3]

    scene, meta = load_scene(ref_json)
    ours = np.asarray(render_ours(scene, meta))
    assert ref_img.shape == ours.shape, (ref_img.shape, ours.shape)
    assert np.isfinite(ours).all()

    rb = _blocks(ref_img)
    ob = _blocks(ours)
    scale = max(float(rb.mean()), 1e-6)
    mad = float(np.abs(rb - ob).mean()) / scale
    energy = abs(float(ob.mean()) - float(rb.mean())) / scale
    assert energy < energy_tol, f"global energy off: {energy:.3f}"
    assert mad < mad_tol, f"block mean abs diff too large: {mad:.3f}"
    return ref_img, ours


@pytest.mark.slow
def test_bunny_pt_matches_reference(tmp_path):
    from goblin_tpu.integrators import common
    from goblin_tpu.integrators.path import make_li

    _golden_compare(
        tmp_path,
        {"render_method": "path_tracing", "sample_per_pixel": 16,
         "max_ray_depth": 5},
        lambda scene, meta: common.render(scene, meta, make_li(meta),
                                          seed=3),
        mad_tol=0.25, energy_tol=0.05,
    )


@pytest.mark.slow
def test_bunny_pt_wavefront_matches_reference(tmp_path):
    """The regenerative production driver against the reference."""
    from goblin_tpu.integrators.wavefront import render_wavefront

    _golden_compare(
        tmp_path,
        {"render_method": "path_tracing", "sample_per_pixel": 16,
         "max_ray_depth": 5},
        lambda scene, meta: render_wavefront(scene, meta, seed=3,
                                             pool=1 << 14),
        mad_tol=0.25, energy_tol=0.05,
    )


@pytest.mark.slow
def test_bunny_ao_matches_reference(tmp_path):
    from goblin_tpu.integrators import common
    from goblin_tpu.render import make_li as make_any

    def ours(scene, meta):
        return common.render(scene, meta, make_any(meta), seed=3)

    # AO is bounded [0,1] and converges fast: tighter tolerances
    _golden_compare(
        tmp_path,
        {"render_method": "ao", "sample_per_pixel": 4,
         "ao_sample_num": 16},
        ours, mad_tol=0.10, energy_tol=0.03,
    )


@pytest.mark.slow
def test_bunny_whitted_matches_reference(tmp_path):
    from goblin_tpu.integrators import common
    from goblin_tpu.render import make_li as make_any

    def ours(scene, meta):
        return common.render(scene, meta, make_any(meta), seed=3)

    # glass bunny: same deterministic reflect+refract ray tree as the
    # reference (round-5; estimator-for-estimator parity) — tolerance
    # tightened vs round 4's stochastic one-branch pick (0.30 -> 0.22)
    _golden_compare(
        tmp_path,
        {"render_method": "whitted", "sample_per_pixel": 16,
         "max_ray_depth": 5},
        ours, mad_tol=0.22, energy_tol=0.06,
    )


@pytest.mark.slow
def test_bunny_sppm_matches_reference(tmp_path):
    from goblin_tpu.integrators.sppm import render_sppm

    def ours(scene, meta):
        return render_sppm(scene, meta, chunk_size=1 << 14)

    # progressive photon estimates carry radius bias at few iterations:
    # loosest tolerances of the suite
    _golden_compare(
        tmp_path,
        {"render_method": "sppm", "sample_per_pixel": 8,
         "max_ray_depth": 8, "initial_radius": 0.02},
        ours, mad_tol=0.35, energy_tol=0.12,
    )
