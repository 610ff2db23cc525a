"""Debug draw overlay (reference DebugData + drawDebugData,
src/GoblinRenderer.cpp:667-690, src/GoblinUtils.cpp:115-197)."""

import numpy as np

from goblin_tpu.camera.camera import CameraSpec
from goblin_tpu.camera.film import FilmSpec
from goblin_tpu.io.draw import DebugData, draw_overlay


def _cam():
    return CameraSpec(
        kind="perspective",
        position=(0.0, 0.0, -5.0),
        fov=np.deg2rad(60.0),
        film=FilmSpec(x_res=64, y_res=48),
    )


def test_line_rasterizes_center():
    cam = _cam()
    img = np.zeros((48, 64, 3), np.float32)
    dbg = DebugData()
    # horizontal segment through the view center, z=0 plane
    dbg.add_ray([-1.0, 0.0, 0.0], [1.0, 0.0, 0.0], color=(0, 1, 0))
    out = np.asarray(draw_overlay(img, cam, dbg))
    # center row must contain green pixels, corners untouched
    assert out[22:26, :, 1].max() == 1.0
    assert out[0, 0].sum() == 0.0
    assert out[-1, -1].sum() == 0.0


def test_point_splats_square():
    cam = _cam()
    img = np.zeros((48, 64, 3), np.float32)
    dbg = DebugData()
    dbg.add_point([0.0, 0.0, 0.0], color=(1, 0, 0))
    out = np.asarray(draw_overlay(img, cam, dbg))
    ys, xs = np.nonzero(out[..., 0])
    assert len(ys) == 9  # 3x3 splat
    assert abs(xs.mean() - 32) <= 1.5 and abs(ys.mean() - 24) <= 1.5


def test_behind_camera_clipped():
    cam = _cam()
    img = np.zeros((48, 64, 3), np.float32)
    dbg = DebugData()
    dbg.add_point([0.0, 0.0, -10.0], color=(1, 1, 1))  # behind the lens
    out = np.asarray(draw_overlay(img, cam, dbg))
    assert out.sum() == 0.0
