"""Tests for the procedural textured object library + textured splat.

The round-2 verdict traced the flat rotation learning to the synthetic
data itself: uniform random cube clouds painted a flat class color are
rotation-invariant in appearance. These tests pin the properties that
make rotation learnable: rotation-dependent appearance, honest
symmetry flags, and native/NumPy splat parity.
"""

import numpy as np
import pytest

from posecnn_tpu.data.procedural import (
    load_background_pool,
    make_procedural_objects,
    synthetic_class_library,
)
from posecnn_tpu.data.synthetic import SyntheticSceneGenerator
from posecnn_tpu.utils.quaternion import quat_to_mat_np

K = np.array([[500.0, 0, 160], [0, 500.0, 120], [0, 0, 1]], np.float32)


@pytest.fixture(scope="module")
def objects():
    return make_procedural_objects(8, 1500, seed=0)


def test_shapes_and_extents(objects):
    c, p = 8, 1500
    assert objects.points.shape == (c, p, 3)
    assert objects.colors.shape == (c, p, 3)
    assert objects.normals.shape == (c, p, 3)
    # class 0 is background: all zeros
    assert np.all(objects.points[0] == 0)
    # real classes have YCB-scale extents and centered points
    for cls in range(1, c):
        ext = objects.extents[cls]
        assert np.all(ext > 0.02) and np.all(ext < 0.5)
        span = objects.points[cls].max(0) + objects.points[cls].min(0)
        np.testing.assert_allclose(span, 0, atol=1e-5)  # bbox-centered
    # normals are unit
    n = np.linalg.norm(objects.normals[1:], axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)
    # colors in range
    assert objects.colors.min() >= 0 and objects.colors.max() <= 255


def test_symmetric_classes_flagged(objects):
    # every 5th class is a surface of revolution
    assert objects.symmetry[5] == 1.0
    assert objects.symmetry[1] == 0.0
    # the flag's claim: rendered appearance of the symmetric class is
    # (near-)invariant under rotation about z — while the asymmetric
    # class changes strongly under the same rotation. Use an overhead
    # light along -z so Lambertian shading is also z-rotation-invariant
    # (real-world symmetric-object supervision has arbitrary lighting;
    # the geometry+texture invariance is what the flag asserts).
    gen = SyntheticSceneGenerator(
        objects.points, objects.extents, K, width=320, height=240,
        point_colors=objects.colors, point_normals=objects.normals, seed=7,
    )
    q0 = np.array([1.0, 0, 0, 0], np.float32)
    qz = np.array([np.cos(0.8), 0, 0, np.sin(0.8)], np.float32)
    t = np.array([0, 0, 0.8], np.float32)
    light = np.array([0.0, 0.0, -1.0], np.float32)

    def render(cls, q):
        depth = np.full((240, 320), np.inf, np.float32)
        label = np.zeros((240, 320), np.int32)
        image = np.zeros((240, 320, 3), np.float32)
        gen._splat_object(cls, quat_to_mat_np(q), t, depth, label, image, light)
        return image, label

    deltas = {}
    for cls in (5, 1):
        i0, l0 = render(cls, q0)
        i1, l1 = render(cls, qz)
        ov = (l0 > 0) & (l1 > 0)
        assert ov.sum() > 300
        deltas[cls] = np.abs(i0[ov] - i1[ov]).mean()
    # the symmetric class changes only by splat-discretization noise;
    # the asymmetric one by genuinely moved texture — relative gap is
    # the honest check (sparse point splatting has a real noise floor)
    assert deltas[1] > 1.5 * deltas[5]


def _render_one(gen, cls, q, t):
    h, w = gen.height, gen.width
    depth = np.full((h, w), np.inf, np.float32)
    label = np.zeros((h, w), np.int32)
    image = np.zeros((h, w, 3), np.float32)
    light = np.array([0.3, -0.3, -0.9], np.float32)
    light /= np.linalg.norm(light)
    gen._splat_object(cls, quat_to_mat_np(q), t, depth, label, image, light)
    return image, label


def test_rotation_changes_appearance(objects):
    """The property the round-2 data lacked: a 90° rotation must change
    the on-object appearance far more than resampling noise (measured
    as the delta from a half-pixel translation jitter)."""
    q0 = np.array([1.0, 0, 0, 0], np.float32)
    q90 = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)], np.float32)
    t = np.array([0, 0, 0.8], np.float32)
    t_eps = np.array([0.0008, 0, 0.8], np.float32)  # ~half-pixel shift
    tex = SyntheticSceneGenerator(
        objects.points, objects.extents, K, width=320, height=240,
        point_colors=objects.colors, point_normals=objects.normals, seed=2,
    )
    for cls in (1, 2):
        it0, l0 = _render_one(tex, cls, q0, t)
        it90, l90 = _render_one(tex, cls, q90, t)
        itj, lj = _render_one(tex, cls, q0, t_eps)
        overlap = (l0 > 0) & (l90 > 0)
        ov_j = (l0 > 0) & (lj > 0)
        assert overlap.sum() > 300
        d_rot = np.abs(it0[overlap] - it90[overlap]).mean()
        d_noise = np.abs(it0[ov_j] - itj[ov_j]).mean()
        assert d_rot > 4 * d_noise
        assert d_rot > 20.0


def test_splat_rgb_native_numpy_parity(objects):
    """Native splat_points_rgb must agree with the NumPy fallback."""
    from posecnn_tpu.data import native as native_mod

    if native_mod.get_lib() is None:
        pytest.skip("no native lib")
    gen = SyntheticSceneGenerator(
        objects.points, objects.extents, K, width=160, height=120,
        point_colors=objects.colors, point_normals=objects.normals, seed=3,
    )
    q = np.array([0.9, 0.1, 0.3, -0.2], np.float32)
    q /= np.linalg.norm(q)
    t = np.array([0.02, -0.01, 0.7], np.float32)
    im_native, lab_native = _render_one(gen, 1, q, t)

    # force the NumPy fallback
    lib = native_mod._LIB
    native_mod._LIB = None
    native_mod._TRIED = True
    try:
        im_np, lab_np = _render_one(gen, 1, q, t)
    finally:
        native_mod._LIB = lib
        native_mod._TRIED = True
    # label maps must match exactly; images agree except at z-ties
    assert (lab_native != lab_np).mean() < 0.01
    same = lab_native == lab_np
    assert np.abs(im_native[same] - im_np[same]).max() < 60
    assert np.abs(im_native[same] - im_np[same]).mean() < 1.0


def test_library_cache_and_subsample():
    a = synthetic_class_library(6, 2620)
    b = synthetic_class_library(6, 512)
    assert b.points.shape == (6, 512, 3)
    np.testing.assert_allclose(a.extents, b.extents)
    # subsampled points are a subset of the full cloud
    assert any(np.allclose(a.points[1][i], b.points[1][0]) for i in range(2620))


def test_background_compositing(objects):
    bg = np.full((240, 320, 3), 200.0, np.float32)[None]
    gen = SyntheticSceneGenerator(
        objects.points, objects.extents, K, width=320, height=240,
        point_colors=objects.colors, point_normals=objects.normals,
        backgrounds=bg, background_prob=1.0, seed=4,
    )
    s = gen.render(dense_vertex_targets=False)
    img = s.image + gen.pixel_means  # undo mean subtraction
    bgm = s.label == 0
    # composited background is the pool image times a gain in [0.6, 1.1]
    vals = img[bgm]
    assert vals.min() > 200 * 0.55 and vals.max() < 200 * 1.15
    # objects still rendered on top
    assert (s.label > 0).sum() > 100


def test_load_background_pool_missing_paths():
    assert load_background_pool(["/nonexistent/x.png"]) is None


def test_colorize_point_cloud_properties():
    """Synthesized appearance for raw xyz clouds: colors in range,
    smooth over neighbors, normals unit + outward-leaning."""
    from posecnn_tpu.data.procedural import colorize_point_cloud

    rng = np.random.RandomState(0)
    # points on a sphere surface (radius 8cm)
    p = rng.randn(800, 3).astype(np.float32)
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    p *= 0.08
    colors, normals = colorize_point_cloud(p, seed=3)
    assert colors.shape == p.shape and normals.shape == p.shape
    assert colors.min() >= 0 and colors.max() <= 255
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-4)
    # outward orientation: normals align with radial direction
    radial = p / np.linalg.norm(p, axis=1, keepdims=True)
    assert (np.sum(normals * radial, axis=1) > 0).mean() > 0.95
    # smoothness: nearby points get nearby colors (wave period >> spacing)
    from scipy.spatial import cKDTree

    d, nn = cKDTree(p).query(p, k=2)
    dc = np.abs(colors - colors[nn[:, 1]]).mean()
    assert dc < 25.0
    # determinism
    c2, _ = colorize_point_cloud(p, seed=3)
    np.testing.assert_array_equal(colors, c2)


def test_colorize_model_library_real_geometry():
    from posecnn_tpu.data.procedural import colorize_model_library

    rng = np.random.RandomState(1)
    pts = np.zeros((4, 300, 3), np.float32)
    for c in (1, 2, 3):
        q = rng.randn(300, 3).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        pts[c] = q * (0.03 + 0.01 * c)
    cols, nrms = colorize_model_library(pts)
    assert np.all(cols[0] == 0) and np.all(nrms[0] == 0)
    for c in (1, 2, 3):
        assert cols[c].std() > 5.0  # actually textured
    # different classes get different paint
    assert np.abs(cols[1].mean(0) - cols[2].mean(0)).max() > 1.0


def test_fill_missing_points_scales_to_real_extents():
    from posecnn_tpu.data.procedural import fill_missing_points

    c, p = 4, 500
    pts = np.zeros((c, p, 3), np.float32)
    # class 2 has an on-disk cloud; 1 and 3 are missing
    rng = np.random.RandomState(2)
    sph = rng.randn(p, 3).astype(np.float32)
    sph /= np.linalg.norm(sph, axis=1, keepdims=True)
    pts[2] = sph * 0.05
    extents = np.array(
        [[0, 0, 0], [0.1, 0.2, 0.05], [0.1, 0.1, 0.1], [0.3, 0.05, 0.08]],
        np.float32,
    )
    filled, cols, nrms = fill_missing_points(pts, extents)
    # synthesized classes match the REAL extents exactly
    for cls in (1, 3):
        got = np.abs(filled[cls]).max(0) * 2
        np.testing.assert_allclose(got, extents[cls], rtol=1e-4)
        assert cols[cls].std() > 5.0
        np.testing.assert_allclose(
            np.linalg.norm(nrms[cls], axis=1), 1.0, atol=1e-3
        )
    # the existing cloud is untouched (only painted)
    np.testing.assert_array_equal(filled[2], pts[2])
    assert cols[2].std() > 5.0


def test_orient_detail_paint_breaks_rotational_ambiguity():
    """orient_detail paint v2 (r5 rotation diagnosis): the six
    ±axis-extreme caps must carry six FIXED, pairwise-distinct,
    fully-saturated hues, identical across classes (a shared
    orientation convention), so rotation rides in chromaticity — which
    the renderer's achromatic Lambertian shade preserves — rather than
    in brightness, which it destroys (probe_data_nn.py measured the
    r4 brightness paint at 113° NN-oracle vs 127° chance). The
    non-marker surface must keep the class paint for seg identity."""
    from posecnn_tpu.data.procedural import colorize_model_library

    rng = np.random.RandomState(7)
    pts = np.zeros((3, 800, 3), np.float32)
    for c in (1, 2):
        q = rng.randn(800, 3).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        pts[c] = q * 0.05
    a1, _ = colorize_model_library(pts, orient_detail=True)
    a2, _ = colorize_model_library(pts, orient_detail=True)
    plain, _ = colorize_model_library(pts, orient_detail=False)
    np.testing.assert_array_equal(a1, a2)  # deterministic
    assert np.isfinite(a1).all() and a1.min() >= 0 and a1.max() <= 255
    assert np.any(a1 != plain)

    marker_means = {c: [] for c in (1, 2)}
    for c in (1, 2):
        p = pts[c] - pts[c].mean(0, keepdims=True)
        half = np.abs(p).max(axis=0) + 1e-9
        pn = p / half[None, :]
        dom = np.argmax(np.abs(pn), axis=1)
        n = len(pn)
        for axis, sgn in [(0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)]:
            # strictly inside the marker: top 2% by axis score (the
            # paint takes the top ~7%)
            score = np.where(dom == axis, sgn * pn[:, axis], -np.inf)
            cap = np.argsort(-score)[: max(int(0.02 * n), 3)]
            cap_cols = a1[c][cap]
            # each cap is one flat color (zero spread)
            assert cap_cols.std(axis=0).max() < 1e-3
            marker_means[c].append(cap_cols.mean(axis=0))
        # class identity survives between the caps: the non-marker
        # surface blends the class two-tone with the position->RGB
        # field (v3), so it must still CORRELATE with the plain class
        # paint — and the blend must not be the plain paint verbatim
        # (the posmap component must be present)
        flat_v = a1[c].reshape(-1)
        flat_p = plain[c].reshape(-1)
        corr = np.corrcoef(flat_v, flat_p)[0, 1]
        assert corr > 0.2, corr
        assert np.any(a1[c] != plain[c])
        m = np.stack(marker_means[c])
        # six markers pairwise far apart in RGB (distinct hues)
        d = np.linalg.norm(m[:, None] - m[None, :], axis=-1)
        assert (d + np.eye(6) * 1e9 > 60).all(), d
    # the SAME six colors on every class: a canonical convention
    np.testing.assert_allclose(
        np.stack(marker_means[1]), np.stack(marker_means[2]), atol=1e-3
    )


def test_orient_markers_v4_full_face_coverage():
    """v4 paint (r6 laggard fix): every point carries its dominant
    face's marker hue, so any visible face identifies the orientation
    octant — unlike v3 whose ±axis caps cover only ~7% of points and
    hide for ~half of viewpoints (docs/artifacts/r6/rotation_laggards.md).
    Gated by cfg.train.paint_version; measured by the NN pixel-space
    data bound (experiments/probe_data_nn.py --paint_version)."""
    from posecnn_tpu.data.procedural import (
        apply_orient_markers,
        make_procedural_objects,
    )

    obj = make_procedural_objects(6, 600, seed=3)
    pts, col = obj.points[1], obj.colors[1]
    v3 = apply_orient_markers(pts, col.copy(), version=3)
    v4 = apply_orient_markers(pts, col.copy(), version=4)
    assert v3.shape == v4.shape == col.shape
    assert v4.min() >= 0.0 and v4.max() <= 255.0 + 1e-3
    # v4 changes most points (full-face blend), not only the caps
    changed = (np.abs(v4 - v3).max(axis=1) > 1.0).mean()
    assert changed > 0.5, f"v4 changed only {changed:.0%} of points"
    # opposite faces get separable paint under v4: mean color of the
    # +Z-dominant and -Z-dominant point sets must differ clearly
    ctr = pts.mean(0)
    qn = (pts - ctr) / (np.abs(pts - ctr).max(0) + 1e-9)
    dom = np.argmax(np.abs(qn), axis=1)
    plus = v4[(dom == 2) & (qn[:, 2] > 0)].mean(0)
    minus = v4[(dom == 2) & (qn[:, 2] < 0)].mean(0)
    assert np.abs(plus - minus).max() > 20.0


def test_data_flags_from_ckpt_adoption(tmp_path):
    """Eval/serve/demo must render the library with the PAINT the
    checkpoint was trained under (data-side analogue of the
    head-flags guard): the snapshot's recorded orient_paint /
    paint_version override the eval cfg."""
    from posecnn_tpu.cli.common import data_flags_from_ckpt
    from posecnn_tpu.core.checkpoint import save_params
    from posecnn_tpu.core.config import cfg_from_dict

    params = {"w": np.zeros((2, 2), np.float32)}
    path = str(tmp_path / "snap_iter_4.npz")
    save_params(path, params, step=4, meta={
        "orient_paint": True, "paint_version": 4,
    })
    cfg = cfg_from_dict({})  # defaults: orient_paint False, version 3
    flags = data_flags_from_ckpt(cfg, path)
    assert flags == {"orient_detail": True, "paint_version": 4}
    # pre-metadata checkpoint falls back to cfg
    legacy = str(tmp_path / "legacy_iter_2.npz")
    save_params(legacy, params, step=2)
    flags = data_flags_from_ckpt(cfg, legacy)
    assert flags["orient_detail"] is False
    assert flags["paint_version"] == 3
