"""Student affinity network — sparse-conv stack on voxels.

TPU-native re-design of the reference's MinkowskiEngine student
(reference models/affinity_module.py:33-85): 3^3 conv (input_dim->hidden) +
BN + ReLU, four residual blocks of two 3^3 convs with BN, and a 1^3 projection
to the embedding dim. Convolutions run over a precomputed 27-neighbor table
(see ops/sparse_conv.py) shared by all layers — the whole forward is one jitted
gather/matmul pipeline with no host round-trips.

BatchNorm is mask-aware (moments over valid voxels only) and optionally
cross-device synchronized via psum over the data axis — the TPU equivalent of
the reference's double SyncBN conversion (run/train.py:212-213).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from geopurify_tpu.ops.sparse_conv import (
    masked_batch_stats,
    sparse_conv1,
    sparse_conv3,
)

KERNEL_VOLUME = 27


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid voxels with running stats; SyncBN via axis_name."""

    features: int
    momentum: float = 0.9          # decay of the running average
    eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, valid: jax.Array, train: bool) -> jax.Array:
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if train:
            axis = self.axis_name if not self.is_initializing() else None
            mean, var = masked_batch_stats(x, valid, axis_name=axis)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean[None, :]) * jax.lax.rsqrt(var[None, :] + self.eps)
        y = y * scale[None, :] + bias[None, :]
        return jnp.where(valid[:, None], y, 0).astype(x.dtype)


class SparseConv3Layer(nn.Module):
    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x, neighbor_idx, valid):
        w = self.param(
            "kernel",
            nn.initializers.he_normal(in_axis=(0, 1), out_axis=2),
            (KERNEL_VOLUME, self.in_dim, self.out_dim),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        # params stay f32; compute rides the input dtype (bf16 path)
        return sparse_conv3(x, neighbor_idx, w.astype(x.dtype), valid, bias=b)


class SparseConv1Layer(nn.Module):
    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x, valid):
        w = self.param(
            "kernel", nn.initializers.he_normal(), (self.in_dim, self.out_dim)
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return sparse_conv1(x, w.astype(x.dtype), valid, bias=b)


class ResBlock(nn.Module):
    """Two 3^3 convs with BN, identity skip, ReLU (affinity_module.py:33-49)."""

    channels: int
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, neighbor_idx, valid, train: bool):
        identity = x
        y = SparseConv3Layer(self.channels, self.channels, name="conv1")(
            x, neighbor_idx, valid
        )
        y = MaskedBatchNorm(
            self.channels, self.bn_momentum, axis_name=self.axis_name, name="norm1"
        )(y, valid, train)
        y = nn.relu(y)
        y = SparseConv3Layer(self.channels, self.channels, name="conv2")(
            y, neighbor_idx, valid
        )
        y = MaskedBatchNorm(
            self.channels, self.bn_momentum, axis_name=self.axis_name, name="norm2"
        )(y, valid, train)
        return nn.relu(y + identity)


class AffinityPredictor(nn.Module):
    """input 3^3 conv -> 4 res blocks -> 1^3 projection (affinity_module.py:51-85).

    ``compute_dtype="bfloat16"`` runs the conv gathers/matmuls in bf16 (params
    and BN statistics stay f32; taps accumulate f32 via preferred_element_type)
    — MXU 2x and half the gather HBM traffic. Embedding error vs f32 is
    bounded in tests against the downstream sharpened-softmax affinity
    weights, the only consumer (scripts/bench_pool.py measures the wall win).
    """

    input_dim: int = 518
    hidden_dim: int = 512
    embed_dim: int = 128
    num_res_blocks: int = 4
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self,
        features: jax.Array,      # [M, input_dim]
        neighbor_idx: jax.Array,  # [M, 27]
        valid: jax.Array,         # [M] bool
        train: bool = False,
    ) -> jax.Array:
        if self.compute_dtype == "bfloat16":
            features = features.astype(jnp.bfloat16)
        x = SparseConv3Layer(self.input_dim, self.hidden_dim, name="input_conv")(
            features, neighbor_idx, valid
        )
        x = MaskedBatchNorm(
            self.hidden_dim, self.bn_momentum, axis_name=self.axis_name,
            name="input_norm",
        )(x, valid, train)
        x = nn.relu(x)
        for i in range(self.num_res_blocks):
            x = ResBlock(
                self.hidden_dim, self.bn_momentum, self.axis_name, name=f"res{i}"
            )(x, neighbor_idx, valid, train)
        x = SparseConv1Layer(self.hidden_dim, self.embed_dim, name="output_conv")(
            x, valid
        )
        return x


def param_group_label(path: tuple) -> str:
    """3-tier differential-LR grouping (affinity_module.py:70-85):
    input adapter x0.1, middle res blocks x1, output projection x5."""
    top = path[0] if path else ""
    name = getattr(top, "key", str(top))
    if name.startswith("input"):
        return "input"
    if name.startswith("output"):
        return "output"
    return "middle"
