"""Pallas Hough vote kernel vs the XLA reference path (interpret mode
on CPU — same code path that compiles on TPU)."""

import jax.numpy as jnp
import numpy as np

from tests.test_hough_voting import EXTENTS, make_scene, run_hough


def test_pallas_backend_matches_xla_end_to_end():
    cls, cx, cy, depth = 2, 100.0, 60.0, 1.2
    label, vert = make_scene([(cls, cx, cy, depth, 30, 25)])
    out_x = run_hough(label, vert, backend="xla")
    out_p = run_hough(label, vert, backend="pallas")
    np.testing.assert_allclose(
        np.asarray(out_x.rois), np.asarray(out_p.rois), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_x.poses_init), np.asarray(out_p.poses_init), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(out_x.valid), np.asarray(out_p.valid))


def test_pallas_backend_two_objects():
    label, vert = make_scene(
        [(1, 40.0, 40.0, 0.8, 22, 22), (3, 120.0, 80.0, 1.5, 25, 20)]
    )
    out_x = run_hough(label, vert, backend="xla")
    out_p = run_hough(label, vert, backend="pallas")
    vx = np.asarray(out_x.valid)
    vp = np.asarray(out_p.valid)
    np.testing.assert_array_equal(vx, vp)
    np.testing.assert_allclose(
        np.asarray(out_x.rois)[vx], np.asarray(out_p.rois)[vp], rtol=1e-4, atol=1e-3
    )


def test_pallas_backend_empty_scene():
    label = np.zeros((120, 160), np.int32)
    vert = np.zeros((120, 160, 3 * EXTENTS.shape[0]), np.float32)
    out_p = run_hough(label, vert, backend="pallas")
    assert np.asarray(out_p.valid).sum() == 0
