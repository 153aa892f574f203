"""2D task post-processing vs literal reference-loop oracles.

Each oracle re-implements the torch loop from xdecoder_model.py
(panoptic_inference:956-1012, instance_inference:1013-1063,
BitMasks.get_bounding_boxes) in straight numpy; the vectorized JAX versions
in models/inference2d.py must match exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geopurify_tpu.models.inference2d import (
    caption_greedy_decode,
    grounding_inference,
    instance_inference,
    masks_to_boxes,
    panoptic_inference,
    retrieval_scores,
    semantic_inference,
)


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def panoptic_oracle(mask_cls, mask_pred, is_thing, obj_t, ovl_t):
    """Literal re-implementation of xdecoder_model.py:956-1012."""
    Q, n_cls_p1 = mask_cls.shape
    n_cls = n_cls_p1 - 1
    probs = _softmax(mask_cls)
    scores, labels = probs.max(-1), probs.argmax(-1)
    masks = _sigmoid(mask_pred)
    keep = (labels != n_cls) & (scores > obj_t)
    kq = np.flatnonzero(keep)
    h, w = mask_pred.shape[1:]
    pan = np.zeros((h, w), np.int32)
    segs = []
    if len(kq) == 0:
        return pan, segs
    prob_masks = scores[kq, None, None] * masks[kq]
    ids = prob_masks.argmax(0)                      # index into kq
    cur_id = 0
    stuff_mem = {}
    for k in range(len(kq)):
        q = kq[k]
        cls = int(labels[q])
        thing = bool(is_thing[cls])
        mask_area = int((ids == k).sum())
        orig = int((masks[q] >= 0.5).sum())
        m = (ids == k) & (masks[q] >= 0.5)
        if mask_area > 0 and orig > 0 and m.sum() > 0:
            if mask_area / orig < ovl_t:
                continue
            if not thing and cls in stuff_mem:
                pan[m] = stuff_mem[cls]
                continue
            if not thing:
                stuff_mem[cls] = cur_id + 1
            cur_id += 1
            pan[m] = cur_id
            segs.append({"id": cur_id, "isthing": thing, "category_id": cls})
    return pan, segs


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_panoptic_matches_reference_loop(seed):
    rng = np.random.default_rng(seed)
    Q, n_cls, h, w = 12, 5, 24, 32
    # strong, spatially-separated masks so several queries pass; duplicated
    # stuff classes exercise the merge path
    mask_cls = rng.normal(0, 1, (Q, n_cls + 1)).astype(np.float32)
    mask_cls[: Q // 2] += 4.0 * np.eye(n_cls + 1)[rng.integers(0, n_cls, Q // 2)]
    mask_pred = rng.normal(-6, 1, (Q, h, w)).astype(np.float32)
    for q in range(Q):
        y, x = rng.integers(0, h - 8), rng.integers(0, w - 8)
        mask_pred[q, y : y + 8, x : x + 8] = rng.normal(6, 1, (8, 8))
    is_thing = np.asarray([True, False, True, False, True])

    pan_o, segs_o = panoptic_oracle(mask_cls, mask_pred, is_thing, 0.5, 0.6)
    pan, info = panoptic_inference(
        jnp.asarray(mask_cls), jnp.asarray(mask_pred), jnp.asarray(is_thing),
        object_mask_threshold=0.5, overlap_threshold=0.6,
    )
    np.testing.assert_array_equal(np.asarray(pan), pan_o)
    valid = np.asarray(info.valid)
    got = [
        {"id": int(np.asarray(info.seg_id)[q]),
         "isthing": bool(np.asarray(info.isthing)[q]),
         "category_id": int(np.asarray(info.category_id)[q])}
        for q in np.flatnonzero(valid)
    ]
    assert got == segs_o


def test_panoptic_no_detections():
    Q, n_cls, h, w = 4, 3, 8, 8
    mask_cls = np.zeros((Q, n_cls + 1), np.float32)
    mask_cls[:, -1] = 10.0  # everything background
    pan, info = panoptic_inference(
        jnp.asarray(mask_cls), jnp.zeros((Q, h, w), jnp.float32),
        jnp.ones(n_cls, bool),
    )
    assert np.asarray(pan).sum() == 0
    assert not np.asarray(info.valid).any()


def test_masks_to_boxes_bitmasks_semantics():
    m = np.zeros((3, 10, 12), bool)
    m[0, 2:5, 3:9] = True             # box [3, 2, 9, 5]
    m[1, 0, 11] = True                # box [11, 0, 12, 1]
    # mask 2 empty -> zeros
    b = np.asarray(masks_to_boxes(jnp.asarray(m)))
    np.testing.assert_array_equal(b[0], [3, 2, 9, 5])
    np.testing.assert_array_equal(b[1], [11, 0, 12, 1])
    np.testing.assert_array_equal(b[2], [0, 0, 0, 0])


def test_instance_inference_oracle():
    rng = np.random.default_rng(0)
    Q, n_cls, h, w = 6, 4, 16, 16
    mask_cls = rng.normal(0, 2, (Q, n_cls + 1)).astype(np.float32)
    mask_pred = rng.normal(0, 3, (Q, h, w)).astype(np.float32)
    topk = 5
    out = instance_inference(jnp.asarray(mask_cls), jnp.asarray(mask_pred), topk)

    # oracle: xdecoder_model.py:1013-1063
    scores = _softmax(mask_cls)[:, :-1].reshape(-1)
    order = np.argsort(-scores)[:topk]
    for i, flat in enumerate(order):
        q, c = flat // n_cls, flat % n_cls
        assert int(np.asarray(out.classes)[i]) == c
        binm = mask_pred[q] > 0
        np.testing.assert_array_equal(np.asarray(out.masks)[i], binm)
        ms = (_sigmoid(mask_pred[q]) * binm).sum() / (binm.sum() + 1e-6)
        assert np.asarray(out.scores)[i] == pytest.approx(scores[flat] * ms, rel=1e-5)
    # thing gating marks stuff picks invalid
    thing = jnp.asarray([True, False, True, False])
    out2 = instance_inference(
        jnp.asarray(mask_cls), jnp.asarray(mask_pred), topk, thing_mask=thing
    )
    cls2 = np.asarray(out2.classes)
    np.testing.assert_array_equal(
        np.asarray(out2.valid), np.asarray([True, False, True, False])[cls2]
    )


def test_grounding_picks_best_query():
    rng = np.random.default_rng(1)
    Q, D, h, w = 5, 8, 4, 4
    v = rng.normal(0, 1, (Q, D)).astype(np.float32)
    t = np.stack([3.0 * v[2], -v[0] + 2.5 * v[4]]).astype(np.float32)
    masks = rng.normal(0, 1, (Q, h, w)).astype(np.float32)
    got, matched = grounding_inference(
        jnp.asarray(v), jnp.asarray(t), jnp.asarray(masks), logit_scale=0.0
    )
    vn = v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-7)
    tn = t / (np.linalg.norm(t, axis=-1, keepdims=True) + 1e-7)
    exp = (vn @ tn.T).argmax(0)
    np.testing.assert_array_equal(np.asarray(matched), exp)
    np.testing.assert_array_equal(np.asarray(got), masks[exp])


def test_retrieval_ranks_matching_image_first():
    rng = np.random.default_rng(2)
    N, D = 6, 8
    imgs = rng.normal(0, 1, (N, D)).astype(np.float32)
    text = (2.0 * imgs[3] + 0.01 * rng.normal(0, 1, D)).astype(np.float32)[None]
    sim = np.asarray(retrieval_scores(jnp.asarray(imgs), jnp.asarray(text)))
    assert sim.shape == (1, N)
    assert sim[0].argmax() == 3


def test_caption_greedy_decode_sequence():
    """Deterministic fake next-token logits: token t+1 = (token t * 2) % V.
    The decode loop must reproduce the chain and leave later slots BOS."""
    V, L, B = 11, 9, 2
    bos = 3

    def logits_fn(tokens):
        nxt = (tokens * 2) % V                       # [B, L]
        return jax.nn.one_hot(nxt, V) * 10.0         # rows i predict slot i+1

    toks = np.asarray(caption_greedy_decode(logits_fn, steps=4, context_length=L,
                                            bos_id=bos, batch=B))
    want = [bos]
    for _ in range(4):
        want.append((want[-1] * 2) % V)
    np.testing.assert_array_equal(toks[0, :5], want)
    np.testing.assert_array_equal(toks[:, 5:], bos)
    np.testing.assert_array_equal(toks[0], toks[1])


def test_semantic_inference_background_drop():
    Q, C = 2, 3
    cls = np.zeros((Q, C + 1), np.float32)
    cls[0, 1] = 8.0
    cls[1, -1] = 8.0  # background query contributes ~nothing after drop
    masks = np.full((Q, 4, 4), 8.0, np.float32)
    sem = np.asarray(semantic_inference(jnp.asarray(cls), jnp.asarray(masks)))
    assert sem.shape == (4, 4, C)
    assert (sem.argmax(-1) == 1).all()


def test_encode_head_split_matches_full_model(rng):
    """encode_pixel_features + apply_head == XDecoderSegModel.apply —
    the decode-loop split cannot drift from the assembled teacher."""
    import dataclasses

    from geopurify_tpu.config import FocalNetConfig, XDecoderConfig
    from geopurify_tpu.models.xdecoder import (
        XDecoderSegModel, apply_head, encode_pixel_features,
    )

    xc = XDecoderConfig(
        hidden_dim=16, conv_dim=16, mask_dim=16, num_queries=5, nheads=2,
        dim_feedforward=32, dec_layers=1, enc_layers=1, dtype="float32",
        backbone=FocalNetConfig(embed_dim=8, depths=(1, 1, 1, 1),
                                focal_levels=(2, 2, 2, 2)),
    )
    m = XDecoderSegModel(xc)
    key = jax.random.key(0)
    img = jax.random.uniform(key, (1, 32, 48, 3)) * 255
    text = jax.random.normal(key, (4, 16))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    vars_ = m.init(key, img, text, jnp.float32(20.0))
    full = m.apply(vars_, img, text, jnp.float32(20.0))
    mf, ms = encode_pixel_features(xc, vars_, img)
    split = apply_head(xc, vars_, ms, mf, text, jnp.float32(20.0))
    for k in ("pred_logits", "pred_masks", "mask_embed"):
        np.testing.assert_allclose(
            np.asarray(full[k]), np.asarray(split[k]), rtol=1e-6, atol=1e-6
        )
