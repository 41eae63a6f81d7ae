"""Native C++ data-path library vs NumPy reference implementations."""

import numpy as np
import pytest

from posecnn_tpu.data.native import (
    get_lib,
    splat_points_native,
    vertex_targets_native,
)
from posecnn_tpu.data.minibatch import generate_vertex_targets

needs_native = pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")


@needs_native
def test_native_splat_zbuffer(rng):
    h, w = 40, 50
    depth = np.full((h, w), np.inf, np.float32)
    label = np.zeros((h, w), np.int32)
    image = np.zeros((h, w, 3), np.float32)
    # two points on the same pixel: nearer one must win
    u = np.array([10, 10], np.int32)
    v = np.array([20, 20], np.int32)
    z = np.array([2.0, 1.0], np.float32)
    ok = splat_points_native(u, v, z, 3, 0, np.array([100.0, 50, 25], np.float32), 2.0,
                             depth, label, image)
    assert ok
    assert depth[20, 10] == 1.0
    assert label[20, 10] == 3
    # shading ramp at z=1.0, t_far=2.0 → 1.6 − 0.5 = 1.1
    np.testing.assert_allclose(image[20, 10], [110.0, 55.0, 27.5], rtol=1e-5)
    # radius splat fills the square
    depth2 = np.full((h, w), np.inf, np.float32)
    label2 = np.zeros((h, w), np.int32)
    image2 = np.zeros((h, w, 3), np.float32)
    splat_points_native(np.array([5], np.int32), np.array([5], np.int32),
                        np.array([1.0], np.float32), 1, 2,
                        np.array([10.0, 10, 10], np.float32), 2.0,
                        depth2, label2, image2)
    assert (label2[3:8, 3:8] == 1).all()
    assert (label2[:3] == 0).all()


@needs_native
def test_native_vertex_targets_match_numpy(rng):
    h, w, c = 30, 40, 5
    label = np.zeros((h, w), np.int32)
    label[5:15, 5:15] = 2
    label[18:28, 20:35] = 4
    cls_indexes = np.array([2, 4])
    centers = np.array([[10.0, 10.0], [27.0, 23.0]], np.float32)
    zs = np.array([1.2, 0.8], np.float32)

    t_np, w_np = generate_vertex_targets(label, cls_indexes, centers, zs, c)

    t_na = np.zeros((h, w, 3 * c), np.float32)
    w_na = np.zeros((h, w, 3 * c), np.float32)
    cbuf = np.full((c, 2), np.nan, np.float32)
    zbuf = np.zeros((c,), np.float32)
    for i, cl in enumerate(cls_indexes):
        cbuf[cl] = centers[i]
        zbuf[cl] = np.log(zs[i])
    ok = vertex_targets_native(label, cbuf, zbuf, 10.0, c, t_na, w_na)
    assert ok
    np.testing.assert_allclose(t_na, t_np, atol=1e-5)
    np.testing.assert_allclose(w_na, w_np, atol=1e-6)


@needs_native
def test_native_splat_speed_vs_numpy(rng):
    """The native splat exists for speed: sanity-check it handles a
    full-size object quickly and identically at the surface level."""
    import time

    h, w = 480, 640
    n = 2620
    u = rng.randint(0, w, n).astype(np.int32)
    v = rng.randint(0, h, n).astype(np.int32)
    z = rng.uniform(0.5, 2.0, n).astype(np.float32)
    depth = np.full((h, w), np.inf, np.float32)
    label = np.zeros((h, w), np.int32)
    image = np.zeros((h, w, 3), np.float32)
    t0 = time.perf_counter()
    for _ in range(10):
        splat_points_native(u, v, z, 1, 2, np.array([9.0, 9, 9], np.float32), 2.0,
                            depth, label, image)
    dt = (time.perf_counter() - t0) / 10
    assert dt < 0.05, f"native splat too slow: {dt * 1000:.1f} ms"
    assert (label == 1).sum() > n  # splats covered pixels
