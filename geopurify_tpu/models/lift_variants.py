"""Alternative 2D-teacher lift backends — LSeg and APE.

The reference supports three 2D->3D lift backends (reference
models/affinity_module.py:348-453 LSeg, :736-993 APE, X-Decoder default);
the LSeg/APE model code is NOT vendored there either (external checkouts,
absent from the tree — SURVEY §2.1 #6). Here the same three-backend surface
exists: X-Decoder is the first-class implementation (models/lift.py), and
LSeg/APE are defined by this adapter protocol — any callable producing
per-view dense pixel features (LSeg-style) or instance masks+embeddings
(APE-style) plugs into the SAME consensus fusion and hole-fill path, so a
JAX port of either model drops in without touching the pipeline.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Protocol, Tuple

import jax
import jax.numpy as jnp

from geopurify_tpu.models.lift import ViewLift, fuse_views, fill_unseen_points
from geopurify_tpu.ops.knn import nearest_fill


class DensePixelLift(Protocol):
    """LSeg-style backend: dense per-pixel embedding map for one view."""

    def __call__(self, image: jax.Array) -> jax.Array:  # [H, W, C]
        ...


class InstanceMaskLift(Protocol):
    """APE-style backend: (masks [Q, H, W] logits, embeds [Q, C], scores [Q])."""

    def __call__(self, image: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        ...


def lift_view_dense(
    pixel_feats: jax.Array,     # [H, W, C] (already at mask_shape resolution)
    rows: jax.Array,            # [Pv]
    cols: jax.Array,
    pv_valid: jax.Array,
    view_coords: jax.Array,
    text_embeddings: jax.Array,  # [n_cls, C] L2-normalized
    logit_scale: jax.Array,
) -> ViewLift:
    """Dense-feature lift (LSeg path, affinity_module.py:348-453): per-point
    feature = the pixel's embedding; no mask assembly, no hole fill needed
    (every visible point lands on a real pixel)."""
    H, W, _ = pixel_feats.shape
    r = jnp.clip(rows, 0, H - 1)
    c = jnp.clip(cols, 0, W - 1)
    feats = pixel_feats[r, c].astype(jnp.float32)
    feats = jnp.where(pv_valid[:, None], feats, 0.0)
    norm = jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
    feats = feats / norm
    logits = logit_scale * feats @ text_embeddings.astype(jnp.float32).T
    return ViewLift(feats, logits)


def lift_view_instance(
    masks: jax.Array,           # [Q, H, W] logits at mask_shape resolution
    embeds: jax.Array,          # [Q, C]
    scores: jax.Array,          # [Q]
    rows: jax.Array,
    cols: jax.Array,
    pv_valid: jax.Array,
    view_coords: jax.Array,
    text_embeddings: jax.Array,
    logit_scale: jax.Array,
    mask_threshold: float = 0.5,
) -> ViewLift:
    """Instance-mask lift (APE path, affinity_module.py:736-993): same
    score-weighted argmax mask-id assignment + per-view nearest fill as the
    X-Decoder path, but masks/embeds come from the external detector."""
    Q, H, W = masks.shape
    sig = jax.nn.sigmoid(masks.astype(jnp.float32))
    prob = scores[:, None, None] * sig
    mask_ids = jnp.argmax(prob, axis=0)
    r = jnp.clip(rows, 0, H - 1)
    c = jnp.clip(cols, 0, W - 1)
    winner = mask_ids[r, c]
    covered = (sig[winner, r, c] >= mask_threshold) & pv_valid
    feats = jnp.where(covered[:, None], embeds.astype(jnp.float32)[winner], 0.0)
    feats = nearest_fill(feats, view_coords.astype(jnp.float32), covered, pv_valid)
    feats = jnp.where(pv_valid[:, None], feats, 0.0)
    norm = jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
    feats = feats / norm
    logits = logit_scale * feats @ text_embeddings.astype(jnp.float32).T
    return ViewLift(feats, logits)
