"""GAN experiment models.

Parity targets: the reference's `dcgan` (generator + discriminator,
ref: lib/networks/dcgan.py, 93 LoC) and `vgg16_gan` (adversarial
feature alignment on the segmentation net, ref: lib/networks/
vgg16_gan.py, 188 LoC). Compact flax equivalents with the same
architectural shape: strided-conv discriminator, transposed-conv
generator, and a PatchGAN-style feature discriminator pluggable onto
the PoseCNN trunk features for adversarial domain alignment.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class DCGANGenerator(nn.Module):
    """z → image (ref: dcgan.py generator: dense + 4 deconv stages)."""

    out_channels: int = 3
    base_features: int = 256
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        b = z.shape[0]
        f = self.base_features
        x = nn.Dense(4 * 4 * f, dtype=self.compute_dtype, name="project")(z)
        x = nn.relu(x.reshape(b, 4, 4, f))
        for i, feats in enumerate((f // 2, f // 4, f // 8)):
            x = nn.ConvTranspose(
                feats, (4, 4), strides=(2, 2), padding="SAME",
                dtype=self.compute_dtype, name=f"deconv{i + 1}",
            )(x)
            x = nn.relu(nn.GroupNorm(num_groups=8, name=f"norm{i + 1}")(x))
        x = nn.ConvTranspose(
            self.out_channels, (4, 4), strides=(2, 2), padding="SAME",
            dtype=self.compute_dtype, name="deconv_out",
        )(x)
        return jnp.tanh(x)  # 64×64 output


class DCGANDiscriminator(nn.Module):
    """image → real/fake logit (ref: dcgan.py discriminator)."""

    base_features: int = 64
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.base_features
        for i, feats in enumerate((f, f * 2, f * 4, f * 8)):
            x = nn.Conv(
                feats, (4, 4), strides=(2, 2), padding="SAME",
                dtype=self.compute_dtype, name=f"conv{i + 1}",
            )(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Dense(1, dtype=jnp.float32, name="logit")(
            x.reshape(x.shape[0], -1)
        )


class FeatureDiscriminator(nn.Module):
    """PatchGAN discriminator over trunk feature maps — the
    adversarial alignment head of vgg16_gan (ref: vgg16_gan.py)."""

    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        x = nn.leaky_relu(
            nn.Conv(256, (3, 3), strides=(2, 2), dtype=self.compute_dtype, name="conv1")(feats),
            0.2,
        )
        x = nn.leaky_relu(
            nn.Conv(128, (3, 3), strides=(2, 2), dtype=self.compute_dtype, name="conv2")(x),
            0.2,
        )
        return nn.Conv(1, (3, 3), dtype=jnp.float32, name="logit")(x)


def gan_losses(real_logits: jnp.ndarray, fake_logits: jnp.ndarray):
    """Non-saturating GAN losses (ref: dcgan.py sigmoid CE losses)."""
    import jax

    d_loss = jnp.mean(jax.nn.softplus(-real_logits)) + jnp.mean(
        jax.nn.softplus(fake_logits)
    )
    g_loss = jnp.mean(jax.nn.softplus(-fake_logits))
    return d_loss, g_loss
