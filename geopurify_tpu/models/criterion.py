"""Set-prediction training criterion — Hungarian matching + mask losses.

Rebuild of the X-Decoder pretraining loss stack (reference
third_party/X-Decoder/xdecoder/modeling/modules/criterion.py SetCriterion:102,
matcher.py HungarianMatcher:78, point_features.py): bipartite matching between
predicted queries and ground-truth masks by a weighted (class, dice, mask-BCE)
cost, then point-sampled dice + sigmoid-CE mask losses and class CE on the
matched permutation. Not on GeoPurify's inference path (SURVEY §2.2) but part
of the full framework surface so the 2D teacher can be (re)trained on TPU.

TPU-first notes:
- the Hungarian assignment runs on host via scipy inside
  ``jax.pure_callback`` (O(Q^3) tiny; Q<=201) with a fixed output shape;
- mask losses sample a static number of points per mask (uniform here;
  reference uses importance sampling at train time) so everything jits;
- batching is by padding GT masks to ``max_targets`` with a validity mask.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _hungarian_host(cost: np.ndarray) -> np.ndarray:
    """cost [Q, T] -> assignment [Q] (col per row; -1 if unassigned)."""
    from scipy.optimize import linear_sum_assignment

    q, t = cost.shape
    rows, cols = linear_sum_assignment(cost)
    out = np.full(q, -1, np.int32)
    out[rows] = cols.astype(np.int32)
    return out


def hungarian_match(cost: jax.Array) -> jax.Array:
    """Batched Hungarian assignment via host callback. cost [B, Q, T] ->
    assignment [B, Q] int32 (−1 = unmatched)."""
    B, Q, T = cost.shape

    def batched(c):
        return np.stack([_hungarian_host(np.asarray(ci)) for ci in c])

    return jax.pure_callback(
        batched, jax.ShapeDtypeStruct((B, Q), jnp.int32), cost,
        vmap_method="sequential",
    )


def dice_loss(inputs: jax.Array, targets: jax.Array, valid: jax.Array) -> jax.Array:
    """inputs [N, P] logits, targets [N, P] in {0,1}; mean over valid rows."""
    probs = jax.nn.sigmoid(inputs)
    num = 2 * jnp.sum(probs * targets, axis=-1)
    den = jnp.sum(probs, axis=-1) + jnp.sum(targets, axis=-1)
    loss = 1 - (num + 1) / (den + 1)
    return jnp.sum(loss * valid) / jnp.maximum(jnp.sum(valid), 1)


def sigmoid_ce_loss(inputs: jax.Array, targets: jax.Array, valid: jax.Array) -> jax.Array:
    loss = jnp.maximum(inputs, 0) - inputs * targets + jnp.log1p(jnp.exp(-jnp.abs(inputs)))
    loss = jnp.mean(loss, axis=-1)
    return jnp.sum(loss * valid) / jnp.maximum(jnp.sum(valid), 1)


def _sample_mask_points(
    masks: jax.Array, rng: jax.Array, num_points: int
) -> Tuple[jax.Array, jax.Array]:
    """Sample the same uniform point set for all masks [*, H, W] ->
    ([num_points] rows, cols)."""
    H, W = masks.shape[-2:]
    kr, kc = jax.random.split(rng)
    rows = jax.random.randint(kr, (num_points,), 0, H)
    cols = jax.random.randint(kc, (num_points,), 0, W)
    return rows, cols


@functools.partial(jax.jit, static_argnames=("num_points",))
def set_criterion(
    pred_logits: jax.Array,   # [B, Q, n_cls+1] (last = no-object)
    pred_masks: jax.Array,    # [B, Q, H, W] logits (stride-4 grid)
    gt_classes: jax.Array,    # [B, T] int32
    gt_masks: jax.Array,      # [B, T, H, W] {0,1}
    gt_valid: jax.Array,      # [B, T] bool
    rng: jax.Array,
    num_points: int = 4096,
    cost_class: float = 2.0,
    cost_dice: float = 5.0,
    cost_mask: float = 5.0,
) -> Dict[str, jax.Array]:
    """Full matching + losses; returns {'loss_ce','loss_dice','loss_mask','loss'}."""
    B, Q, C1 = pred_logits.shape
    T = gt_classes.shape[1]
    n_cls = C1 - 1

    rows, cols = _sample_mask_points(pred_masks, rng, num_points)
    pm = pred_masks[..., rows, cols]                     # [B, Q, P]
    gm = gt_masks[..., rows, cols].astype(jnp.float32)   # [B, T, P]

    # ---- matching costs (no grad) -------------------------------------
    probs = jax.nn.softmax(jax.lax.stop_gradient(pred_logits), axis=-1)
    safe_cls = jnp.clip(gt_classes, 0, n_cls - 1)
    cost_cls = -jnp.take_along_axis(
        probs[..., :n_cls], safe_cls[:, None, :].repeat(Q, 1), axis=2
    )                                                     # [B, Q, T]
    pm_s = jax.lax.stop_gradient(pm)
    p = jax.nn.sigmoid(pm_s)
    num = 2 * jnp.einsum("bqp,btp->bqt", p, gm)
    den = p.sum(-1)[:, :, None] + gm.sum(-1)[:, None, :]
    cost_d = 1 - (num + 1) / (den + 1)
    # pointwise BCE cost, linearized (Mask2Former trick)
    pos = jnp.log1p(jnp.exp(-jnp.abs(pm_s))) + jnp.maximum(-pm_s, 0)  # -log sig
    neg = jnp.log1p(jnp.exp(-jnp.abs(pm_s))) + jnp.maximum(pm_s, 0)   # -log(1-sig)
    cost_m = (
        jnp.einsum("bqp,btp->bqt", pos, gm) + jnp.einsum("bqp,btp->bqt", neg, 1 - gm)
    ) / num_points
    cost = cost_class * cost_cls + cost_dice * cost_d + cost_mask * cost_m
    big = jnp.float32(1e6)
    cost = jnp.where(gt_valid[:, None, :], cost, big)

    assign = hungarian_match(cost)                        # [B, Q]
    assign = jax.lax.stop_gradient(assign)
    matched = (assign >= 0) & jnp.take_along_axis(
        gt_valid, jnp.maximum(assign, 0), axis=1
    )

    # ---- class CE over all queries (no-object for unmatched) ----------
    tgt_cls = jnp.where(
        matched,
        jnp.take_along_axis(gt_classes, jnp.maximum(assign, 0), axis=1),
        n_cls,
    )
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, tgt_cls[..., None], axis=-1)[..., 0]
    # down-weight the no-object class like the reference (eos_coef 0.1)
    w = jnp.where(tgt_cls == n_cls, 0.1, 1.0)
    loss_ce = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1)

    # ---- mask losses on matched pairs ----------------------------------
    tgt_masks = jnp.take_along_axis(
        gm, jnp.maximum(assign, 0)[..., None], axis=1
    )                                                    # [B, Q, P]
    mvalid = matched.astype(jnp.float32)
    loss_d = dice_loss(pm.reshape(B * Q, -1), tgt_masks.reshape(B * Q, -1),
                       mvalid.reshape(-1))
    loss_m = sigmoid_ce_loss(pm.reshape(B * Q, -1), tgt_masks.reshape(B * Q, -1),
                             mvalid.reshape(-1))
    total = cost_class * loss_ce + cost_dice * loss_d + cost_mask * loss_m
    return {"loss_ce": loss_ce, "loss_dice": loss_d, "loss_mask": loss_m,
            "loss": total}


# ---------------------------------------------------------------------------
# VLP (vision-language pretraining) losses
# ---------------------------------------------------------------------------

def captioning_loss(
    pred_captionings: jax.Array,   # [B, T, dim_proj] caption-slot outputs
    token_embedding: jax.Array,    # [V, dim_proj] (the lang tower's table @ proj... or raw)
    target_ids: jax.Array,         # [B, T] int token ids
    target_mask: jax.Array,        # [B, T] 1/0 attention mask
) -> jax.Array:
    """Next-token CE over the caption slots (reference criterion.py:234-254:
    logits = pred[:, :-1] @ token_embedding.T, targets/mask shifted by one,
    masked mean with +1 smoothing in the denominator)."""
    logits = pred_captionings[:, :-1] @ token_embedding.T          # [B,T-1,V]
    tgt = target_ids[:, 1:]
    mask = target_mask[:, 1:].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(ce * mask) / (jnp.sum(mask) + 1.0)


def image_text_contrastive_loss(
    v_emb: jax.Array,              # [B, D] image-side embeddings
    t_emb: jax.Array,              # [B, D] caption embeddings
    logit_scale: jax.Array,        # [] pre-exp (the lang tower's logit_scale)
) -> jax.Array:
    """In-batch symmetric InfoNCE (reference language/loss.py:216-232
    image_text_contrastive_loss_queue, single-process form): normalize both
    sides, scale by clamp(exp(logit_scale), max=100), CE against the diagonal
    both ways."""
    v = v_emb / (jnp.linalg.norm(v_emb, axis=-1, keepdims=True) + 1e-7)
    t = t_emb / (jnp.linalg.norm(t_emb, axis=-1, keepdims=True) + 1e-7)
    scale = jnp.minimum(jnp.exp(logit_scale), 100.0)
    logits = scale * (v @ t.T)
    gt = jnp.arange(logits.shape[0])
    lp1 = jax.nn.log_softmax(logits, axis=-1)
    lp2 = jax.nn.log_softmax(logits.T, axis=-1)
    l1 = -jnp.mean(jnp.take_along_axis(lp1, gt[:, None], axis=-1))
    l2 = -jnp.mean(jnp.take_along_axis(lp2, gt[:, None], axis=-1))
    return 0.5 * (l1 + l2)
