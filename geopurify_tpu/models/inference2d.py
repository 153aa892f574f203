"""Inference-time post-processing for the 2D X-Decoder task family.

Rebuilds the query-prediction -> task-output math behind the reference's
standalone inference scripts (infer_{semseg,panoseg,instseg,refseg,
captioning,region_retrieval}.py):

- ``semantic_inference``   ≙ xdecoder_model.py:947-954
- ``panoptic_inference``   ≙ xdecoder_model.py:956-1012
- ``instance_inference``   ≙ xdecoder_model.py:1013-1063
- ``grounding_inference``  ≙ evaluate_grounding_baseline / evaluate_grounding
                             (xdecoder_model.py:701-840, vl_similarity
                             language/loss.py:185-189)
- ``retrieval_scores``     ≙ evaluate_retrieval (xdecoder_model.py:613-656)
- ``caption_greedy_decode``≙ forward_captioning greedy loop
                             (interface/xdecoder.py:325-421)

TPU-first restructuring: the reference's per-query Python loops (panoptic
segment assembly, stuff merging, box extraction) become static-shape
vectorized ops — every output carries a ``valid`` mask instead of a dynamic
length, so the whole family jits. Semantics are pinned against direct
loop re-implementations in tests/test_inference2d.py.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp


def semantic_inference(
    mask_cls: jax.Array,   # [Q, n_cls+1] class logits (background last)
    mask_pred: jax.Array,  # [Q, h, w] mask logits
    keep_sem_bgd: bool = False,
) -> jax.Array:
    """Per-class probability maps [h, w, n_cls(+1)] (xdecoder_model.py:947-954:
    semseg = einsum(softmax(cls)[..., :-1], sigmoid(masks)))."""
    probs = jax.nn.softmax(mask_cls, axis=-1)
    if not keep_sem_bgd:
        probs = probs[:, :-1]
    masks = jax.nn.sigmoid(mask_pred)
    return jnp.einsum("qc,qhw->hwc", probs, masks)


class PanopticSegments(NamedTuple):
    """Static-shape segment table: row q describes the segment OWNED by query
    q (segment ids are 1-based; ``valid[q]`` marks owners). Stuff queries
    merged into an earlier segment own nothing (valid False)."""

    category_id: jax.Array  # [Q] int32
    isthing: jax.Array      # [Q] bool
    valid: jax.Array        # [Q] bool — query opened a segment
    seg_id: jax.Array       # [Q] int32 — this query's pixels' segment id


def panoptic_inference(
    mask_cls: jax.Array,   # [Q, n_cls+1] class logits (background last)
    mask_pred: jax.Array,  # [Q, h, w] mask logits
    is_thing: jax.Array,   # [n_cls] bool — thing (instance) classes
    object_mask_threshold: float = 0.8,
    overlap_threshold: float = 0.8,
) -> Tuple[jax.Array, PanopticSegments]:
    """Panoptic fusion (xdecoder_model.py:956-1012), vectorized.

    Reference semantics preserved exactly (pinned in tests against a literal
    loop re-implementation):
    - keep queries whose argmax class is non-background with score above
      ``object_mask_threshold``;
    - each pixel goes to the kept query maximizing score * sigmoid(mask)
      AND whose own mask is >= 0.5 there;
    - a query keeps its segment only if its won-pixel count is positive and
      covers >= ``overlap_threshold`` of its binarized mask area;
    - stuff queries of the same class merge into the first such segment;
      segment ids increment in query order.

    Returns (panoptic_seg [h, w] int32 with 0 = void, PanopticSegments).
    """
    Q, n_cls_p1 = mask_cls.shape
    n_cls = n_cls_p1 - 1
    probs = jax.nn.softmax(mask_cls, axis=-1)
    scores = jnp.max(probs, axis=-1)
    labels = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    masks = jax.nn.sigmoid(mask_pred)

    keep = (labels != n_cls) & (scores > object_mask_threshold)
    labels = jnp.minimum(labels, n_cls - 1)  # safe index for dropped rows

    prob_masks = jnp.where(keep[:, None, None], scores[:, None, None] * masks, -1.0)
    winner = jnp.argmax(prob_masks, axis=0).astype(jnp.int32)       # [h, w]
    binm = masks >= 0.5                                             # [Q, h, w]

    q_oh = jax.nn.one_hot(winner, Q, axis=0, dtype=jnp.float32)     # [Q, h, w]
    winner_area = jnp.sum(q_oh, axis=(1, 2))                        # == mask_area
    orig_area = jnp.sum(binm, axis=(1, 2)).astype(jnp.float32)
    assigned = jnp.sum(q_oh * binm, axis=(1, 2))                    # mask.sum()

    passed = (
        keep
        & (winner_area > 0)
        & (orig_area > 0)
        & (assigned > 0)
        & (winner_area / jnp.maximum(orig_area, 1.0) >= overlap_threshold)
    )

    thing_q = is_thing[labels]
    stuff_pass = passed & ~thing_q
    # first passing stuff query per class (stuff_memory_list merge)
    qi = jnp.arange(Q, dtype=jnp.int32)
    first_of_cls = (
        jnp.full((n_cls,), Q, jnp.int32)
        .at[labels]
        .min(jnp.where(stuff_pass, qi, Q))
    )
    rep = jnp.where(stuff_pass, first_of_cls[labels], qi)           # [Q]
    opens = passed & (rep == qi)
    seg_of_q = jnp.cumsum(opens.astype(jnp.int32))                  # 1-based
    seg_id = jnp.where(passed, seg_of_q[rep], 0).astype(jnp.int32)  # [Q]

    pix_pass = passed[winner]                                       # [h, w]
    pix_bin = jnp.take_along_axis(binm, winner[None], axis=0)[0]
    pan = jnp.where(pix_pass & pix_bin, seg_id[winner], 0)
    return pan, PanopticSegments(
        category_id=labels, isthing=thing_q, valid=opens, seg_id=seg_id
    )


class InstancePredictions(NamedTuple):
    masks: jax.Array    # [K, h, w] bool
    boxes: jax.Array    # [K, 4] f32 xyxy (x1/y1 exclusive; zeros if empty)
    scores: jax.Array   # [K] f32 — class prob * mean in-mask mask prob
    classes: jax.Array  # [K] int32
    valid: jax.Array    # [K] bool


def masks_to_boxes(masks: jax.Array) -> jax.Array:
    """[N, h, w] bool -> [N, 4] f32 [xmin, ymin, xmax+1, ymax+1]; zeros for
    empty masks (detectron2 BitMasks.get_bounding_boxes semantics, used by
    infer_instseg.py:87)."""
    n, h, w = masks.shape
    x_any = jnp.any(masks, axis=1)   # [N, w]
    y_any = jnp.any(masks, axis=2)   # [N, h]
    x0 = jnp.argmax(x_any, axis=1)
    x1 = w - jnp.argmax(x_any[:, ::-1], axis=1)
    y0 = jnp.argmax(y_any, axis=1)
    y1 = h - jnp.argmax(y_any[:, ::-1], axis=1)
    box = jnp.stack([x0, y0, x1, y1], axis=1).astype(jnp.float32)
    nonempty = jnp.any(x_any, axis=1)
    return jnp.where(nonempty[:, None], box, 0.0)


def instance_inference(
    mask_cls: jax.Array,   # [Q, n_cls+1] class logits (background last)
    mask_pred: jax.Array,  # [Q, h, w] mask logits
    topk: int = 10,
    thing_mask: jax.Array | None = None,  # [n_cls] bool — keep things only
) -> InstancePredictions:
    """Top-k instance extraction (xdecoder_model.py:1013-1063): flatten the
    [Q, n_cls] class probabilities, take the top ``topk`` (query, class)
    pairs (sorted here; the reference's sorted=False returns the same set),
    binarize masks at logit 0, score = class prob * mean in-mask sigmoid.
    ``thing_mask`` marks non-thing picks invalid (the panoptic_on branch)."""
    Q, n_cls_p1 = mask_cls.shape
    n_cls = n_cls_p1 - 1
    scores = jax.nn.softmax(mask_cls, axis=-1)[:, :-1]              # [Q, C]
    top_scores, top_idx = jax.lax.top_k(scores.reshape(-1), topk)
    classes = (top_idx % n_cls).astype(jnp.int32)
    qidx = top_idx // n_cls
    logits = mask_pred[qidx]                                        # [K, h, w]
    binm = logits > 0
    probs = jax.nn.sigmoid(logits)
    area = jnp.sum(binm, axis=(1, 2)).astype(jnp.float32)
    mask_score = jnp.sum(probs * binm, axis=(1, 2)) / (area + 1e-6)
    valid = jnp.ones((topk,), bool)
    if thing_mask is not None:
        valid = valid & thing_mask[classes]
    return InstancePredictions(
        masks=binm,
        boxes=masks_to_boxes(binm),
        scores=top_scores * mask_score,
        classes=classes,
        valid=valid,
    )


def grounding_inference(
    query_embeds: jax.Array,  # [Q, D] per-query class embeddings (mask_embed)
    text_embeds: jax.Array,   # [T, D] referring-phrase embeddings
    mask_pred: jax.Array,     # [Q, h, w] mask logits
    logit_scale: jax.Array | float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Referring segmentation by query-text matching: normalize both sides,
    vl_similarity (language/loss.py:185-189: clamp(exp-scale, 100) * cosine
    — the scale never moves the argmax), pick the best query per phrase
    (evaluate_grounding_baseline, xdecoder_model.py:701-751; the grounding-
    token variant :752-840 matches over dedicated slots — models/seem.py).

    Returns (matched mask logits [T, h, w], matched query ids [T])."""
    v = query_embeds / (jnp.linalg.norm(query_embeds, axis=-1, keepdims=True) + 1e-7)
    t = text_embeds / (jnp.linalg.norm(text_embeds, axis=-1, keepdims=True) + 1e-7)
    scale = jnp.minimum(jnp.exp(jnp.asarray(logit_scale, jnp.float32)), 100.0)
    sim = scale * (v @ t.T)                                          # [Q, T]
    matched = jnp.argmax(sim, axis=0).astype(jnp.int32)              # [T]
    return mask_pred[matched], matched


def retrieval_scores(
    image_embeds: jax.Array,  # [N, D] per-image class-token embeddings
    text_embeds: jax.Array,   # [T, D] query-text embeddings
) -> jax.Array:
    """Image-text similarity [T, N] for region/image retrieval ranking
    (evaluate_retrieval, xdecoder_model.py:613-656: v_emb_it is the class
    token ``pred_captions[:, -1]``; cosine against pooled text)."""
    v = image_embeds / (jnp.linalg.norm(image_embeds, axis=-1, keepdims=True) + 1e-7)
    t = text_embeds / (jnp.linalg.norm(text_embeds, axis=-1, keepdims=True) + 1e-7)
    return t @ v.T


def caption_greedy_decode(
    logits_fn: Callable[[jax.Array], jax.Array],
    steps: int,
    context_length: int = 77,
    bos_id: int = 49406,
    batch: int = 1,
) -> jax.Array:
    """Greedy autoregressive captioning (forward_captioning,
    interface/xdecoder.py:325-421): the token buffer starts as BOS
    everywhere (the reference's ``[[49406]*77]`` start_token), and step i
    writes ``argmax(logits[:, i])`` into slot i+1 — ``logits_fn(tokens)``
    must return next-token logits [B, >=steps, V] aligned like
    criterion.captioning_loss (row i predicts token i+1). The image encoding
    happens once inside the caller's closure; only the query decoder +
    lang-token embedding re-run per step. Returns the token ids [B, L]."""
    steps = min(steps, context_length - 1)
    tokens0 = jnp.full((batch, context_length), bos_id, jnp.int32)

    def body(i, tokens):
        logits = logits_fn(tokens)
        nxt = jnp.argmax(logits[:, i], axis=-1).astype(jnp.int32)
        return tokens.at[:, i + 1].set(nxt)

    return jax.lax.fori_loop(0, steps, body, tokens0)
