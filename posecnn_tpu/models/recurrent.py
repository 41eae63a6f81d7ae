"""Recurrent multi-frame video segmentation network.

TPU-native re-design of the reference's `vgg16` video net
(ref: lib/networks/vgg16.py:41-166): per-frame VGG16 trunk + skip
seg features, hidden state warped into the current frame via
compute_flow (depth + relative camera pose), fused by the running
weighted-average cell GRU2D (ref: lib/networks/gru2d.py:25-61:
u = σ(conv1×1([x, h])), w' = w + u, h' = relu((w·h + u·x)/w')).

The reference unrolls NUM_STEPS=5 python-loop copies of the graph
with variable reuse; here the whole sequence is ONE `lax.scan` over
frames with naturally shared weights — compiled once, shardable over
batch.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from posecnn_tpu.models.vgg16 import VGG16Trunk, bilinear_upsample
from posecnn_tpu.ops.flow import compute_flow


class VideoState(NamedTuple):
    state: jnp.ndarray  # (B, H, W, U)
    weights: jnp.ndarray  # (B, H, W, U)
    points: jnp.ndarray  # (B, H, W, 3)


class FusionCell(nn.Module):
    """The reference's 'GRU2D' running weighted-average fusion
    (ref: gru2d.py:25-61)."""

    num_units: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, state, weights):
        xs = jnp.concatenate([inputs, state], axis=-1)
        u = nn.sigmoid(
            nn.Conv(
                self.num_units,
                (1, 1),
                kernel_init=nn.initializers.zeros,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name="gate",
            )(xs)
        )
        new_w = weights + u
        new_h = nn.relu((weights * state + u * inputs) / jnp.maximum(new_w, 1e-10))
        return new_h, new_w


class RecurrentSegNet(nn.Module):
    """Frame-recurrent semantic segmentation (ref: vgg16.py:41-166)."""

    num_classes: int
    num_units: int = 64
    flow_kernel_size: int = 3
    flow_threshold: float = 0.02
    flow_max_weight: float = 50.0
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.trunk = VGG16Trunk(compute_dtype=self.compute_dtype)
        self.score_conv5 = nn.Conv(self.num_units, (1, 1), dtype=self.compute_dtype, param_dtype=jnp.float32)
        self.score_conv4 = nn.Conv(self.num_units, (1, 1), dtype=self.compute_dtype, param_dtype=jnp.float32)
        self.fusion = FusionCell(self.num_units, compute_dtype=self.compute_dtype)
        self.score = nn.Conv(self.num_classes, (1, 1), dtype=self.compute_dtype, param_dtype=jnp.float32)

    def frame_features(self, data):
        conv4_3, conv5_3 = self.trunk(data)
        s5 = nn.relu(self.score_conv5(conv5_3))
        s5_up = bilinear_upsample(s5, 2)
        s4 = nn.relu(self.score_conv4(conv4_3))
        s5_up = s5_up[:, : s4.shape[1], : s4.shape[2], :]
        return bilinear_upsample(s4 + s5_up, 8).astype(jnp.float32)

    def step(self, carry: VideoState, data, depth, meta):
        """One video step: features + state warp + fusion."""
        feats = self.frame_features(data)
        warped_state, warped_weights, points = compute_flow(
            carry.state,
            carry.weights,
            carry.points,
            depth,
            meta,
            kernel_size=self.flow_kernel_size,
            threshold=self.flow_threshold,
            max_weight=self.flow_max_weight,
        )
        fused, new_w = self.fusion(feats, warped_state, warped_weights)
        logits = self.score(fused).astype(jnp.float32)
        log_prob = jax.nn.log_softmax(logits, axis=-1)
        label = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return VideoState(state=fused, weights=new_w, points=points), (log_prob, label)

    def __call__(self, frames, depths, metas, initial_state: VideoState | None = None):
        """frames (T, B, H, W, 3), depths (T, B, H, W), metas (T, B, 48).

        Returns (log_probs (T, B, H, W, C), labels (T, B, H, W),
        final VideoState). Scan over time — one compiled step reused
        (the reference builds NUM_STEPS graph copies instead).
        """
        t, b, h, w, _ = frames.shape
        if initial_state is None:
            initial_state = VideoState(
                state=jnp.zeros((b, h, w, self.num_units), jnp.float32),
                weights=jnp.zeros((b, h, w, self.num_units), jnp.float32),
                points=jnp.zeros((b, h, w, 3), jnp.float32),
            )

        # nn.scan shares module parameters across time steps
        def body(cell, carry, xs):
            data, depth, meta = xs
            return cell.step(carry, data, depth, meta)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        final, (log_probs, labels) = scan(self, initial_state, (frames, depths, metas))
        return log_probs, labels, final
