"""GAN losses for vocoder training (LSGAN + feature matching).

The HiFi-GAN (arXiv 2010.05646) objective: least-squares adversarial losses,
L1 feature matching over discriminator activations, L1 mel reconstruction.
Pure functions over lists of (score, features) as returned by the
MPD/MSD modules.
"""

from typing import List, Tuple

import jax.numpy as jnp

DiscOut = List[Tuple[jnp.ndarray, List[jnp.ndarray]]]


def _f32(x: jnp.ndarray) -> jnp.ndarray:
    # critics may run in bf16 (mixed precision); reduce losses in f32
    return x.astype(jnp.float32)


def discriminator_loss(real_outs: DiscOut, fake_outs: DiscOut) -> jnp.ndarray:
    """LSGAN: sum over sub-discriminators of E[(1-D(y))^2] + E[D(y_hat)^2]."""
    loss = 0.0
    for (real_score, _), (fake_score, _) in zip(real_outs, fake_outs):
        loss = (loss + jnp.mean((1.0 - _f32(real_score)) ** 2)
                + jnp.mean(_f32(fake_score) ** 2))
    return loss


def generator_adversarial_loss(fake_outs: DiscOut) -> jnp.ndarray:
    """LSGAN generator term: sum of E[(1-D(y_hat))^2]."""
    loss = 0.0
    for fake_score, _ in fake_outs:
        loss = loss + jnp.mean((1.0 - _f32(fake_score)) ** 2)
    return loss


def feature_matching_loss(real_outs: DiscOut, fake_outs: DiscOut) -> jnp.ndarray:
    """L1 between real/fake discriminator feature maps, summed over layers."""
    loss = 0.0
    for (_, real_feats), (_, fake_feats) in zip(real_outs, fake_outs):
        for rf, ff in zip(real_feats, fake_feats):
            loss = loss + jnp.mean(jnp.abs(_f32(rf) - _f32(ff)))
    return loss
