"""Augmentation parity tests (ref: lib/utils/blob.py:74-131)."""

import colorsys

import numpy as np

from posecnn_tpu.data.augment import (
    add_noise,
    bgr_to_hls,
    chromatic_transform,
    hls_to_bgr,
)


def test_bgr_hls_matches_colorsys():
    rng = np.random.RandomState(0)
    bgr = rng.randint(0, 256, (64, 3)).astype(np.float32)
    hls = bgr_to_hls(bgr[None])[0]
    for i in range(len(bgr)):
        b, g, r = bgr[i] / 255.0
        h, l, s = colorsys.rgb_to_hls(r, g, b)
        dh = abs(hls[i, 0] - h * 180.0)
        assert min(dh, abs(dh - 180.0)) < 0.1
        assert abs(hls[i, 1] - l * 255.0) < 0.2
        assert abs(hls[i, 2] - s * 255.0) < 0.2


def test_hls_roundtrip():
    rng = np.random.RandomState(1)
    bgr = rng.randint(0, 256, (16, 24, 3)).astype(np.float32)
    back = hls_to_bgr(bgr_to_hls(bgr))
    np.testing.assert_allclose(back, bgr, atol=1e-3)


def test_chromatic_magnitudes_match_reference():
    """Hue jitter is ±0.01·180 H-units (±3.6°), L/S ±0.1·256
    (ref blob.py:79-83) — an explicit max-shift check."""
    rng = np.random.RandomState(2)
    im = rng.randint(30, 220, (32, 32, 3)).astype(np.float32)
    hls0 = bgr_to_hls(im)
    max_dh = 0.0
    for seed in range(20):
        out = chromatic_transform(im, np.random.RandomState(seed))
        hls1 = bgr_to_hls(out)
        dh = np.abs(hls1[..., 0] - hls0[..., 0])
        dh = np.minimum(dh, 180.0 - dh)
        # interior pixels (no clipping): hue shift bounded by the
        # reference's ±1.8 H-units (+ small conversion error)
        max_dh = max(max_dh, float(np.median(dh)))
    assert max_dh <= 1.8 + 0.1
    # and the transform actually does something
    assert np.abs(chromatic_transform(im, np.random.RandomState(3)) - im).mean() > 0.5


def test_add_noise_gaussian_shared_across_channels():
    im = np.full((24, 24, 3), 128.0, np.float32)
    # seed with rand()<0.9 → gaussian branch
    out = add_noise(im, np.random.RandomState(0))
    diff = out - im
    # shared across channels: all 3 channels shift identically
    np.testing.assert_allclose(diff[..., 0], diff[..., 1], atol=1e-5)
    np.testing.assert_allclose(diff[..., 0], diff[..., 2], atol=1e-5)
    assert np.abs(diff).mean() > 0.1


def test_add_noise_motion_blur_branch():
    rng_img = np.random.RandomState(1)
    im = rng_img.randint(0, 256, (24, 24, 3)).astype(np.float32)
    hit = False
    for seed in range(40):
        r = np.random.RandomState(seed)
        if r.rand() >= 0.9:
            out = add_noise(im, np.random.RandomState(seed))
            # blur: mean preserved (up to edges), variance reduced
            assert abs(out.mean() - im.mean()) < 3.0
            assert out.std() < im.std()
            hit = True
            break
    assert hit
