"""Recurrent fusion-cell family (ref: lib/networks/gru2d.py,
gru2d_original.py, vanilla2d.py, add2d.py, gru3d.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.models.recurrent import (
    FUSION_CELLS,
    Add2DCell,
    FusionCell,
    GRU3DCell,
    GRUOriginalCell,
    Vanilla2DCell,
)

B, H, W, U = 2, 6, 8, 4


def _run(cell):
    x = jnp.asarray(np.random.RandomState(0).randn(B, H, W, U), jnp.float32)
    h = jnp.asarray(np.random.RandomState(1).rand(B, H, W, U), jnp.float32)
    w = jnp.ones((B, H, W, U), jnp.float32)
    params = cell.init(jax.random.PRNGKey(0), x, h, w)
    new_h, new_w = cell.apply(params, x, h, w)
    assert new_h.shape == (B, H, W, U)
    assert new_w.shape == (B, H, W, U)
    return x, h, w, new_h, new_w


def test_registry_complete():
    assert set(FUSION_CELLS) == {"gru2d", "gru2d_original", "vanilla2d", "add2d"}


def test_gru2d_zero_init_is_half_gate():
    """Zero-init gate kernel+bias → u = 0.5 everywhere → running
    weighted average (w·h + 0.5·x)/(w + 0.5) (ref: gru2d.py:59-61)."""
    x, h, w, new_h, new_w = _run(FusionCell(U))
    expect = jax.nn.relu((w * h + 0.5 * x) / (w + 0.5))
    np.testing.assert_allclose(np.asarray(new_h), np.asarray(expect), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_w), np.asarray(w) + 0.5, atol=1e-6)


def test_gru_original_zero_init_keeps_state():
    """Zero gate kernel with bias 1 → u = σ(1) ≈ 0.731; candidate conv
    is random-init tanh; h' = u·h + (1−u)·c stays bounded and the
    weights map passes through untouched (ref: gru2d_original.py:58)."""
    x, h, w, new_h, new_w = _run(GRUOriginalCell(U))
    np.testing.assert_array_equal(np.asarray(new_w), np.asarray(w))
    assert np.abs(np.asarray(new_h)).max() <= 1.0 + 1e-5
    u = jax.nn.sigmoid(1.0)
    # with zero gate kernel, r = u = σ(1) exactly
    assert np.all(np.isfinite(np.asarray(new_h)))
    # h' − u·h = (1−u)·c must be within (1−u) of tanh bounds
    resid = np.asarray(new_h) - float(u) * np.asarray(h)
    assert np.abs(resid).max() <= float(1 - u) + 1e-5


def test_vanilla2d_tanh_bounded():
    x, h, w, new_h, new_w = _run(Vanilla2DCell(U))
    assert np.abs(np.asarray(new_h)).max() <= 1.0
    np.testing.assert_array_equal(np.asarray(new_w), np.asarray(w))


def test_add2d_running_mean():
    """Three frames through Add2D equal their arithmetic mean
    (ref: add2d.py:23: h' = (x + n·h)/(n+1))."""
    cell = Add2DCell(U)
    rng = np.random.RandomState(3)
    frames = [jnp.asarray(rng.randn(B, H, W, U), jnp.float32) for _ in range(3)]
    h = jnp.zeros((B, H, W, U), jnp.float32)
    w = jnp.zeros((B, H, W, U), jnp.float32)
    params = cell.init(jax.random.PRNGKey(0), frames[0], h, w)
    for f in frames:
        h, w = cell.apply(params, f, h, w)
    expect = np.mean([np.asarray(f) for f in frames], axis=0)
    np.testing.assert_allclose(np.asarray(h), expect, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), 3.0)


def test_gru3d_flag_gating():
    """flag=0 voxels keep the old state exactly; flag=1 voxels take
    relu(u·h + (1−u)·x) (ref: gru3d.py:60-62)."""
    g = 4
    cell = GRU3DCell(U)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(B, g, g, g, U), jnp.float32)
    h = jnp.asarray(rng.randn(B, g, g, g, U), jnp.float32)
    flag = jnp.asarray((rng.rand(B, g, g, g, 1) > 0.5), jnp.float32)
    params = cell.init(jax.random.PRNGKey(0), x, flag, h)
    out = cell.apply(params, x, flag, h)
    assert out.shape == (B, g, g, g, U)
    off = np.asarray(flag)[..., 0] == 0
    np.testing.assert_allclose(np.asarray(out)[off], np.asarray(h)[off], atol=1e-6)
    # zero-init gate → u = 0.5 → on-voxels are relu((h + x)/2)
    on = ~off
    expect_on = np.maximum(0.5 * (np.asarray(h) + np.asarray(x)), 0.0)
    np.testing.assert_allclose(np.asarray(out)[on], expect_on[on], atol=1e-5)


def test_recurrent_net_cell_variants():
    """RecurrentSegNet builds and runs with each 2D cell type."""
    from posecnn_tpu.models.recurrent import RecurrentSegNet

    t, b, hh, ww, c = 2, 1, 32, 32, 3
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(t, b, hh, ww, 3), jnp.float32)
    depths = jnp.ones((t, b, hh, ww), jnp.float32)
    metas = jnp.tile(
        jnp.asarray(
            np.concatenate(
                [
                    np.array([[50.0, 0, 16], [0, 50.0, 16], [0, 0, 1]]).flatten(),
                    np.linalg.inv(np.array([[50.0, 0, 16], [0, 50.0, 16], [0, 0, 1]])).flatten(),
                    np.eye(3, 4).flatten(),
                    np.eye(3, 4).flatten(),
                    np.zeros(6),
                ]
            ).astype(np.float32)
        )[None, None],
        (t, b, 1),
    )
    for cell_type in ("vanilla2d", "add2d"):
        model = RecurrentSegNet(num_classes=c, num_units=8, cell_type=cell_type)
        params = model.init(jax.random.PRNGKey(0), frames, depths, metas)
        log_probs, labels, final = model.apply(params, frames, depths, metas)
        assert log_probs.shape == (t, b, hh, ww, c)
        assert labels.shape == (t, b, hh, ww)
