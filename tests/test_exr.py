import os

import numpy as np
import pytest

from goblin_tpu.io.exr import read_exr, write_exr, write_ppm


@pytest.mark.parametrize("half,compress", [(False, False), (False, True),
                                           (True, False), (True, True)])
def test_exr_roundtrip(tmp_path, half, compress):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 4, size=(37, 61, 3)).astype(np.float32)
    p = os.path.join(tmp_path, "t.exr")
    write_exr(p, img, half=half, compress=compress)
    back = read_exr(p)
    tol = 2e-3 if half else 1e-7
    np.testing.assert_allclose(back, img, rtol=tol, atol=tol * 4)


def test_exr_large_block_boundary(tmp_path):
    # height that is not a multiple of the 16-line zip block
    img = np.arange(50 * 20 * 3, dtype=np.float32).reshape(50, 20, 3) / 100
    p = os.path.join(tmp_path, "t.exr")
    write_exr(p, img)
    np.testing.assert_allclose(read_exr(p), img, atol=1e-7)


def test_ppm_write(tmp_path):
    img = np.ones((4, 5, 3), dtype=np.float32) * 0.5
    p = os.path.join(tmp_path, "t.ppm")
    write_ppm(p, img)
    with open(p, "rb") as f:
        data = f.read()
    assert data.startswith(b"P6\n5 4\n255\n")
    px = data.split(b"255\n", 1)[1]
    v = px[0]
    assert abs(v - int(0.5 ** (1 / 2.2) * 255 + 0.5)) <= 1
