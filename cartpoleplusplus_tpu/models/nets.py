"""Flax network definitions for every agent family.

Reference counterparts (SURVEY.md §2a; mount empty this session):
  * ActorMLP / CriticMLP  <- `ddpg_cartpole.py::{ActorNetwork, CriticNetwork}`
    (TF graphs: MLPs for low-dim obs, conv stacks for pixels, batch-norm,
    tanh-bounded actor output, critic takes action at a late layer).
  * QNetMLP               <- the keras Q-network in `dqn_cartpole.py`.
  * PolicyMLP             <- the softmax policy graph in `lrpg_cartpole.py`.
  * NafNet                <- `naf_cartpole.py` (shared torso with value head
    V, action head mu, and a lower-triangular L head forming the quadratic
    advantage A(s,a) = -1/2 (a-mu)^T L L^T (a-mu)).
  * PixelEncoder          <- the shared conv stack in `base_network.py`.

TPU-first choices: parameters live in fp32, compute can run in bf16 (MXU
native dtype) via the `dtype` attribute; LayerNorm instead of the
reference's batch-norm (batch-norm cross-batch statistics create a
collective dependency across sharded env batches for zero benefit at these
scales; LayerNorm is per-row and sharding-oblivious).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def polyak(target_params, online_params, tau: float):
    """theta' <- tau * theta + (1 - tau) * theta'.

    Reference counterpart: the target-network variable-copy ops built in
    `base_network.py` (TF assign graph). Here it is one tree_map.
    """
    return jax.tree.map(
        lambda t, o: (1.0 - tau) * t + tau * o, target_params, online_params)


class _Torso(nn.Module):
    """Shared MLP torso: Dense -> LayerNorm -> relu, repeated."""

    hidden: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for h in self.hidden:
            x = nn.Dense(h, dtype=self.dtype)(x)
            x = nn.LayerNorm(dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class ActorMLP(nn.Module):
    """Deterministic policy mu(s) in [-1, 1]^action_dim (DDPG actor)."""

    action_dim: int = 2
    hidden: Sequence[int] = (256, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        x = _Torso(self.hidden, self.dtype)(obs)
        # Small final init keeps initial actions near zero (standard DDPG).
        a = nn.Dense(self.action_dim, dtype=self.dtype,
                     kernel_init=nn.initializers.uniform(3e-3))(x)
        return jnp.tanh(a).astype(jnp.float32)


class CriticMLP(nn.Module):
    """Q(s, a): action enters after the first layer (DDPG critic shape)."""

    hidden: Sequence[int] = (256, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs, action):
        x = obs.astype(self.dtype)
        x = nn.Dense(self.hidden[0], dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.relu(x)
        x = jnp.concatenate([x, action.astype(self.dtype)], axis=-1)
        for h in self.hidden[1:]:
            x = nn.Dense(h, dtype=self.dtype)(x)
            x = nn.LayerNorm(dtype=self.dtype)(x)
            x = nn.relu(x)
        q = nn.Dense(1, dtype=self.dtype,
                     kernel_init=nn.initializers.uniform(3e-3))(x)
        return q.squeeze(-1).astype(jnp.float32)


class QNetMLP(nn.Module):
    """Q(s, .) over the 5 discrete actions (DQN)."""

    num_actions: int = 5
    hidden: Sequence[int] = (256, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        x = _Torso(self.hidden, self.dtype)(obs)
        return nn.Dense(self.num_actions, dtype=self.dtype)(x).astype(
            jnp.float32)


class PolicyMLP(nn.Module):
    """Softmax policy logits over discrete actions (LRPG / REINFORCE)."""

    num_actions: int = 5
    hidden: Sequence[int] = (64, 64)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        x = _Torso(self.hidden, self.dtype)(obs)
        return nn.Dense(self.num_actions, dtype=self.dtype)(x).astype(
            jnp.float32)


class NafNet(nn.Module):
    """Normalized Advantage Function: Q(s,a) = V(s) + A(s,a) with
    A = -1/2 (a-mu)^T P(s) (a-mu), P = L L^T, L lower-triangular with
    softplus diagonal. Returns (q, mu, v)."""

    action_dim: int = 2
    hidden: Sequence[int] = (256, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs, action=None):
        x = _Torso(self.hidden, self.dtype)(obs)
        v = nn.Dense(1, dtype=self.dtype)(x).squeeze(-1).astype(jnp.float32)
        mu = jnp.tanh(nn.Dense(self.action_dim, dtype=self.dtype,
                               kernel_init=nn.initializers.uniform(3e-3))(x)
                      ).astype(jnp.float32)
        if action is None:
            return v, mu
        d = self.action_dim
        n_l = d * (d + 1) // 2
        l_flat = nn.Dense(n_l, dtype=self.dtype)(x).astype(jnp.float32)
        rows, cols = jnp.tril_indices(d)
        l_mat = jnp.zeros(x.shape[:-1] + (d, d), jnp.float32)
        l_mat = l_mat.at[..., rows, cols].set(l_flat)
        diag = jax.nn.softplus(l_mat[..., jnp.arange(d), jnp.arange(d)])
        l_mat = l_mat.at[..., jnp.arange(d), jnp.arange(d)].set(diag)
        p_mat = l_mat @ jnp.swapaxes(l_mat, -1, -2)
        da = (action - mu)[..., None]
        adv = -0.5 * (jnp.swapaxes(da, -1, -2) @ p_mat @ da)[..., 0, 0]
        return v + adv, mu, v


class VisualActor(nn.Module):
    """PixelEncoder + ActorMLP: deterministic policy from raw frames.

    Reference counterpart: the conv-stack-into-actor graph used by the
    reference's pixel-observation DDPG variant (`base_network.py` conv
    helpers feeding `ddpg_cartpole.py`'s ActorNetwork)."""

    action_dim: int = 2
    hidden: Sequence[int] = (256, 256)
    features: Sequence[int] = (16, 32, 32)
    dtype: jnp.dtype = jnp.float32
    encoder: str = "conv"

    @nn.compact
    def __call__(self, img):
        x = _encoder(self.encoder, self.features, self.dtype)(img)
        return ActorMLP(self.action_dim, self.hidden, self.dtype)(x)


class VisualCritic(nn.Module):
    """PixelEncoder + CriticMLP: Q(frames, action)."""

    hidden: Sequence[int] = (256, 256)
    features: Sequence[int] = (16, 32, 32)
    dtype: jnp.dtype = jnp.float32
    encoder: str = "conv"

    @nn.compact
    def __call__(self, img, action):
        x = _encoder(self.encoder, self.features, self.dtype)(img)
        return CriticMLP(self.hidden, self.dtype)(x, action)


class VisualQNet(nn.Module):
    """PixelEncoder + QNetMLP: discrete Q-values from raw frames."""

    num_actions: int = 5
    hidden: Sequence[int] = (256, 256)
    features: Sequence[int] = (16, 32, 32)
    dtype: jnp.dtype = jnp.float32
    encoder: str = "conv"

    @nn.compact
    def __call__(self, img):
        x = _encoder(self.encoder, self.features, self.dtype)(img)
        return QNetMLP(self.num_actions, self.hidden, self.dtype)(x)


class VisualNafNet(nn.Module):
    """PixelEncoder + NafNet: quadratic-advantage Q from raw frames.

    Reference counterpart: the reference attempted conv-NAF — its shared
    conv stack (`base_network.py`) fed `naf_cartpole.py`'s heads for the
    pixel-observation variant (SURVEY.md §2a NAF row). Same contract as
    NafNet: returns (v, mu) without an action, (q, mu, v) with one."""

    action_dim: int = 2
    hidden: Sequence[int] = (256, 256)
    features: Sequence[int] = (16, 32, 32)
    dtype: jnp.dtype = jnp.float32
    encoder: str = "conv"

    @nn.compact
    def __call__(self, img, action=None):
        x = _encoder(self.encoder, self.features, self.dtype)(img)
        return NafNet(self.action_dim, self.hidden, self.dtype)(x, action)


class VisualPolicy(nn.Module):
    """PixelEncoder + PolicyMLP: softmax policy logits from raw frames
    (pixel-observation LRPG — the reference's conv stack in front of the
    softmax policy graph)."""

    num_actions: int = 5
    hidden: Sequence[int] = (64, 64)
    features: Sequence[int] = (16, 32, 32)
    dtype: jnp.dtype = jnp.float32
    encoder: str = "conv"

    @nn.compact
    def __call__(self, img):
        x = _encoder(self.encoder, self.features, self.dtype)(img)
        return PolicyMLP(self.num_actions, self.hidden, self.dtype)(x)


class PixelEncoder(nn.Module):
    """Small conv stack for pixel observations -> flat features.

    Reference counterpart: the conv layers in `base_network.py` applied to
    stacked rendered camera frames. Input: (..., H, W, C) float in [0, 1]
    (C = 3 * cameras * repeats after stacking).
    """

    features: Sequence[int] = (16, 32, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img):
        x = img.astype(self.dtype)
        if img.dtype == jnp.uint8:  # env's quantized-obs mode
            x = x * jnp.asarray(1.0 / 255.0, self.dtype)
        for f in self.features:
            x = nn.Conv(f, kernel_size=(3, 3), strides=(2, 2),
                        dtype=self.dtype)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[:-3] + (-1,))
        return x.astype(jnp.float32)


class PatchEncoder(nn.Module):
    """MXU-native pixel encoder: non-overlapping patch embedding + per-
    patch MLP; global mixing happens in the torso's first Dense over the
    flattened patch features.

    Motivation (measured, round 4): the conv encoder's channel widths
    (6 -> 16 -> 32) occupy 5-25% of the MXU's 128 lanes, so XLA's conv
    lowering runs the pixel-DDPG update phase at ~13% of f32 peak —
    insensitive to precision and batch shape (bf16 and 4x1024-batch A/Bs
    both within noise; BASELINE.md round-4 decomposition). Reshaping each
    frame into P x P non-overlapping patches turns the encoder into dense
    matmuls with >=128-wide contraction dims (patch dim = P*P*C = 216 at
    48x48x6), which XLA tiles onto the MXU at full lane width. Same
    capability as the conv stack (a learned local feature map), traded
    convolutional weight-sharing for MXU shape — the right trade on TPU
    for 48x48 frames with fixed cameras, validated by the round-4
    quality A/B (BASELINE.md).

    Input: (..., H, W, C) float in [0, 1] or uint8; H and W must divide
    by `patch`. Output: (..., (H/P)*(W/P)*features[-1]) float32.
    """

    patch: int = 6
    features: Sequence[int] = (128, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img):
        x = img.astype(self.dtype)
        if img.dtype == jnp.uint8:  # env's quantized-obs mode
            x = x * jnp.asarray(1.0 / 255.0, self.dtype)
        *lead, h, w, c = x.shape
        p = self.patch
        hp, wp = h // p, w // p
        x = x.reshape(*lead, hp, p, wp, p, c)
        x = jnp.moveaxis(x, -4, -3)          # (..., hp, wp, p, p, c)
        x = x.reshape(*lead, hp * wp, p * p * c)
        for f in self.features:
            x = nn.Dense(f, dtype=self.dtype)(x)
            x = nn.LayerNorm(dtype=self.dtype)(x)
            x = nn.relu(x)
        x = x.reshape(*lead, hp * wp * self.features[-1])
        return x.astype(jnp.float32)


def _encoder(encoder: str, conv_features, dtype):
    """Encoder factory shared by the Visual* nets ("conv" | "patch")."""
    if encoder == "patch":
        return PatchEncoder(dtype=dtype)
    if encoder != "conv":
        raise ValueError(f"encoder must be 'conv' or 'patch', got "
                         f"{encoder!r}")
    return PixelEncoder(conv_features, dtype)
