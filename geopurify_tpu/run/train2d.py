"""X-Decoder 2D pretraining loop — mask-classification training for the
2D teacher on TPU.

TPU-native rebuild of the reference's trainer stack
(reference third_party/X-Decoder/xdecoder/trainer/default_trainer.py:97-289,
utils_trainer.py:53-194, pipeline/XDecoderPipeline.py): the epoch loop with
gradient accumulation, grad clipping, LR warmup + step decay, periodic
checkpointing with per-rank RNG state, and items/sec + loss logging — driving
our XDecoderSegModel with the Hungarian mask criterion
(models/criterion.py ≙ modeling/modules/criterion.py + matcher.py).

Deviations by design:
- bf16 compute replaces the CUDA AMP GradScaler (utils_trainer.py:53-56):
  bf16 has fp32-range exponent so no loss scaling is needed on TPU;
- data parallelism is a shard_map over the `data` mesh axis with pmean'd
  grads (≙ the MPI/NCCL DDP wrap, distributed_trainer.py:43-67).

Classification logits are cosine(class_embed, text) like the eval path, with
one extra LEARNED no-object embedding appended for the criterion's
(n_cls+1)-way CE (the reference's non-object embedding in the matcher path).

Usage:
  python -m geopurify_tpu.run.train2d --synthetic --steps 10     # smoke
  python -m geopurify_tpu.run.train2d --preset scannet data.data_root=...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from geopurify_tpu.config import GeoPurifyConfig, load_config
from geopurify_tpu.models.criterion import set_criterion
from geopurify_tpu.models.xdecoder import XDecoderSegModel
from geopurify_tpu.parallel.mesh import make_mesh
from geopurify_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint_with_retry as save_checkpoint,  # 3-attempt retry (ref utils_trainer.py:125-140)
)

log = logging.getLogger("geopurify.train2d")


class Train2DState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def synthetic_batch(rng: np.random.Generator, batch: int, hw, n_cls: int,
                    max_targets: int = 8):
    """Random images with rectangle instances — CPU-runnable fixtures
    (SURVEY §4's tiny-synthetic strategy; no COCO in this environment)."""
    H, W = hw
    images = rng.uniform(0, 255, (batch, H, W, 3)).astype(np.float32)
    # criterion samples points on the stride-4 mask grid
    h, w = H // 4, W // 4
    gt_masks = np.zeros((batch, max_targets, h, w), np.float32)
    gt_classes = np.zeros((batch, max_targets), np.int32)
    gt_valid = np.zeros((batch, max_targets), bool)
    for b in range(batch):
        n_t = int(rng.integers(1, max_targets + 1))
        for t in range(n_t):
            y0, x0 = rng.integers(0, h // 2), rng.integers(0, w // 2)
            y1, x1 = y0 + rng.integers(2, h // 2), x0 + rng.integers(2, w // 2)
            gt_masks[b, t, y0:y1, x0:x1] = 1.0
            gt_classes[b, t] = rng.integers(0, n_cls)
            gt_valid[b, t] = True
    return (jnp.asarray(images), jnp.asarray(gt_classes),
            jnp.asarray(gt_masks), jnp.asarray(gt_valid))


def make_schedule(base_lr: float, warmup_steps: int, decay_steps, gamma: float = 0.1):
    """Linear warmup + multiplicative step decay (≙ WarmupMultiStepLR)."""
    def sched(step):
        warm = jnp.minimum(step / jnp.maximum(warmup_steps, 1), 1.0)
        decay = gamma ** jnp.sum(
            jnp.asarray([step >= d for d in decay_steps], jnp.float32)
        )
        return base_lr * warm * decay
    return sched


def synthetic_captions(rng: np.random.Generator, batch: int, cap_len: int,
                       vocab: int):
    """CLIP-layout random captions: BOS, tokens, EOT (= max id), zero pad."""
    ids = np.zeros((batch, cap_len), np.int64)
    mask = np.zeros((batch, cap_len), np.float32)
    for b in range(batch):
        L = int(rng.integers(3, cap_len - 2))
        ids[b, 0] = vocab - 2
        ids[b, 1 : 1 + L] = rng.integers(1, vocab - 2, L)
        ids[b, 1 + L] = vocab - 1
        mask[b, : 2 + L] = 1.0
    return jnp.asarray(ids), jnp.asarray(mask)


def make_vlp_step(model: XDecoderSegModel, lang, tx, mesh: Mesh, data_axis: str,
                  caption_weight: float = 2.0, retrieval_weight: float = 2.0):
    """VLP pretraining step (≙ forward_vlp, xdecoder_model.py:503-546):
    captions ride the decoder as extra query slots; losses are next-token
    captioning CE + in-batch symmetric image-text contrastive
    (criterion.py:234-254, language/loss.py:216-232)."""
    from geopurify_tpu.models.criterion import (
        captioning_loss,
        image_text_contrastive_loss,
    )

    def device_step(state: Train2DState, images, cap_ids, cap_mask, text,
                    logit_scale):
        images, cap_ids, cap_mask = images[0], cap_ids[0], cap_mask[0]

        def loss_fn(params):
            lvars = {"params": params["lang"]}
            tok_emb, pooled = lang.apply(
                lvars, cap_ids, method=lang.encode_tokens
            )
            out = model.apply(
                {"params": params["model"]}, images, text, logit_scale,
                caption_tokens=tok_emb,
            )
            token_table = params["lang"]["lang_encoder"]["token_embedding"]["embedding"]
            l_cap = captioning_loss(
                out["pred_captionings"], token_table, cap_ids, cap_mask
            )
            l_ret = image_text_contrastive_loss(
                out["pred_captions"][:, -1], pooled,
                params["lang"]["logit_scale"],
            )
            total = caption_weight * l_cap + retrieval_weight * l_ret
            return total, {"loss": total, "loss_captioning": l_cap,
                           "loss_retrieval": l_ret}

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, data_axis)
        losses = jax.lax.pmean(losses, data_axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return Train2DState(params, opt_state, state.step + 1), losses

    mapped = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis), P(data_axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def synthetic_interactive_scene(rng: np.random.Generator, hw, n_cls: int,
                                max_targets: int = 4):
    """One synthetic panoptic dataset dict (rectangular segments in a
    label-divisor raster) for the interactive mapper — the COCO-panoptic
    layout coco_panoptic_interactive_dataset_mapper.py consumes."""
    from geopurify_tpu.data.mappers import id2rgb

    H, W = hw
    pan_id = np.zeros((H, W), np.int32)
    segments = []
    n_t = int(rng.integers(1, max_targets + 1))
    for t in range(n_t):
        y0, x0 = int(rng.integers(0, H // 2)), int(rng.integers(0, W // 2))
        y1 = y0 + int(rng.integers(H // 4, H // 2))
        x1 = x0 + int(rng.integers(W // 4, W // 2))
        sid = t + 1
        pan_id[y0:y1, x0:x1] = sid
        segments.append({"id": sid, "category_id": int(rng.integers(n_cls)),
                         "iscrowd": 0})
    # only keep segments that survived occlusion by later rectangles
    segments = [s for s in segments if (pan_id == s["id"]).sum() >= 16]
    image = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
    return {"image_np": image, "pan_seg_np": id2rgb(pan_id),
            "segments_info": segments, "height": H, "width": W}


def synthetic_interactive_batch(rng: np.random.Generator, mapper, batch: int,
                                hw, n_cls: int, num_masks: int, budget: int):
    """Mapper-driven interactive fixtures: synthetic panoptic scenes ->
    InteractiveMapper (jitter + visual-sampler prompts) -> static-shape
    arrays for the SEEM head: prompt POINTS (normalized, +1 tags, mask ids)
    and stride-4 gt masks per prompt slot."""
    from geopurify_tpu.models.seem import points_from_masks

    H, W = hw
    h4, w4 = H // 4, W // 4
    images = np.zeros((batch, H, W, 3), np.float32)
    pts = np.zeros((batch, budget, 2), np.float32)
    valid = np.zeros((batch, budget), bool)
    mask_ids = np.zeros((batch, budget), np.int32)
    gt4 = np.zeros((batch, num_masks, h4, w4), np.float32)
    slot_valid = np.zeros((batch, num_masks), bool)
    per_slot = max(budget // num_masks, 1)
    for b in range(batch):
        dd = synthetic_interactive_scene(rng, hw, n_cls)
        out = mapper(dd, rng)
        images[b] = out["image"].astype(np.float32)
        sq = out["spatial_query"]
        shapes, gts, types = sq["rand_shape"], sq["gt_masks"], sq["types"]
        cursor = 0
        for s in range(min(len(shapes), num_masks)):
            if types[s] == "none" or not shapes[s].any():
                continue
            p, v, _ = points_from_masks(
                shapes[s], np.zeros_like(shapes[s]), per_slot, rng)
            n = int(v.sum())
            if n == 0:
                continue
            pts[b, cursor: cursor + n] = p[:n]
            valid[b, cursor: cursor + n] = True
            mask_ids[b, cursor: cursor + n] = s
            cursor += n
            gm = gts[s].astype(np.float32)
            gt4[b, s] = gm.reshape(h4, 4, w4, 4).max(axis=(1, 3))
            slot_valid[b, s] = True
    return (jnp.asarray(images), jnp.asarray(pts), jnp.asarray(valid),
            jnp.asarray(mask_ids), jnp.asarray(gt4), jnp.asarray(slot_valid))


def make_interactive_step(backbone, pixdec, head, tx, mesh: Mesh,
                          data_axis: str):
    """Interactive (SEEM) training step: visual-sampler prompt points drive
    the spatial-query groups; the loss is sigmoid-CE + dice between each
    prompt slot's predicted mask (the head's update_spatial_results output)
    and that instance's gt mask (≙ the reference's spatial losses,
    TRAIN.md COST_SPATIAL.{MASK,DICE}_WEIGHT 2.0/2.0)."""

    def device_step(state: Train2DState, images, pts, valid, mask_ids, gt4,
                    slot_valid, text, logit_scale, qidx):
        images, pts, valid = images[0], pts[0], valid[0]
        mask_ids, gt4, slot_valid = mask_ids[0], gt4[0], slot_valid[0]
        num_masks = gt4.shape[1]

        def loss_fn(params):
            feats = backbone.apply({"params": params["backbone"]},
                                   images / 127.5 - 1.0)
            mask_features, _, multi_scale = pixdec.apply(
                {"params": params["pixdec"]}, feats)
            out = head.apply(
                {"params": params["head"]}, list(multi_scale), mask_features,
                text, logit_scale, pts, valid, jnp.ones_like(mask_ids),
                mask_ids, qidx, num_masks=num_masks,
            )
            pred = out["prev_mask"]                    # [B, num_masks, h4, w4]
            p = pred.reshape(pred.shape[0], num_masks, -1)
            g = gt4.reshape(gt4.shape[0], num_masks, -1)
            ce = optax.sigmoid_binary_cross_entropy(p, g).mean(-1)
            prob = jax.nn.sigmoid(p)
            num = 2.0 * (prob * g).sum(-1)
            den = prob.sum(-1) + g.sum(-1)
            dice = 1.0 - (num + 1.0) / (den + 1.0)
            w = slot_valid.astype(jnp.float32)
            denom = jnp.maximum(w.sum(), 1.0)
            l_ce = (ce * w).sum() / denom
            l_dice = (dice * w).sum() / denom
            total = 2.0 * l_ce + 2.0 * l_dice
            return total, {"loss": total, "loss_spatial_ce": l_ce,
                           "loss_spatial_dice": l_dice}

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, data_axis)
        losses = jax.lax.pmean(losses, data_axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return Train2DState(params, opt_state, state.step + 1), losses

    mapped = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis), P(data_axis), P(data_axis),
                  P(data_axis), P(data_axis), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_train2d_step(model: XDecoderSegModel, tx, mesh: Mesh, data_axis: str,
                      num_points: int):
    def device_step(state: Train2DState, images, gt_cls, gt_masks, gt_valid,
                    text, logit_scale, rng):
        images, gt_cls = images[0], gt_cls[0]
        gt_masks, gt_valid = gt_masks[0], gt_valid[0]
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))

        def loss_fn(params):
            model_params = {"params": params["model"]}
            out = model.apply(model_params, images, text, logit_scale)
            # append the learned no-object logit: cosine vs a trainable
            # embedding, same scale as the text logits
            no_obj = params["no_object"]
            no_obj = no_obj / jnp.maximum(jnp.linalg.norm(no_obj), 1e-8)
            emb = out["mask_embed"]  # the 512-d projected query embeddings
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8
            )
            extra = logit_scale * emb @ no_obj
            logits = jnp.concatenate(
                [out["pred_logits"], extra[..., None]], axis=-1
            )
            losses = set_criterion(
                logits, out["pred_masks"], gt_cls, gt_masks, gt_valid,
                rng, num_points=num_points,
            )
            return losses["loss"], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, data_axis)
        losses = jax.lax.pmean(losses, data_axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return Train2DState(params, opt_state, state.step + 1), losses

    mapped = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis), P(data_axis), P(data_axis),
                  P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_joint_seg_step(model: XDecoderSegModel, lang, tx, mesh: Mesh,
                        data_axis: str, num_points: int):
    """Joint-mode seg step (≙ XDecoderPipeline task routing): identical to
    make_train2d_step except the class text embeddings come from the SHARED
    language tower applied to tokenized class prompts — the seg task trains
    the lang encoder too, as the reference's grounding path does. Params not
    touched by this task (the captioning glue) get zero grads."""

    def device_step(state: Train2DState, images, gt_cls, gt_masks, gt_valid,
                    class_ids, logit_scale, rng):
        images, gt_cls = images[0], gt_cls[0]
        gt_masks, gt_valid = gt_masks[0], gt_valid[0]
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))

        def loss_fn(params):
            pooled = lang.apply({"params": params["lang"]}, class_ids)
            text = jnp.concatenate(
                [pooled, jnp.zeros((1, pooled.shape[1]), pooled.dtype)], 0)
            out = model.apply({"params": params["model"]}, images, text,
                              logit_scale)
            no_obj = params["no_object"]
            no_obj = no_obj / jnp.maximum(jnp.linalg.norm(no_obj), 1e-8)
            emb = out["mask_embed"]
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8
            )
            extra = logit_scale * emb @ no_obj
            logits = jnp.concatenate(
                [out["pred_logits"], extra[..., None]], axis=-1
            )
            losses = set_criterion(
                logits, out["pred_masks"], gt_cls, gt_masks, gt_valid,
                rng, num_points=num_points,
            )
            return losses["loss"], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, data_axis)
        losses = jax.lax.pmean(losses, data_axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return Train2DState(params, opt_state, state.step + 1), losses

    mapped = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis), P(data_axis), P(data_axis),
                  P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_joint_zip_step(model: XDecoderSegModel, lang, tx, mesh: Mesh,
                        data_axis: str, num_points: int,
                        caption_weight: float = 2.0,
                        retrieval_weight: float = 2.0):
    """FAITHFUL joint step (≙ build.py JointLoader zip + the model forward
    summing per-task losses under ONE optimizer update): every step carries
    one seg batch AND one vlp batch; total loss = seg criterion + captioning
    CE + image-text contrastive, all through the shared trunk + lang tower."""
    from geopurify_tpu.models.criterion import (
        captioning_loss,
        image_text_contrastive_loss,
    )

    def device_step(state: Train2DState, images, gt_cls, gt_masks, gt_valid,
                    v_images, cap_ids, cap_mask, class_ids, logit_scale, rng):
        images, gt_cls = images[0], gt_cls[0]
        gt_masks, gt_valid = gt_masks[0], gt_valid[0]
        v_images, cap_ids, cap_mask = v_images[0], cap_ids[0], cap_mask[0]
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))

        def loss_fn(params):
            lvars = {"params": params["lang"]}
            # --- seg task: class text through the shared tower ---
            pooled = lang.apply(lvars, class_ids)
            text = jnp.concatenate(
                [pooled, jnp.zeros((1, pooled.shape[1]), pooled.dtype)], 0)
            out = model.apply({"params": params["model"]}, images, text,
                              logit_scale)
            no_obj = params["no_object"]
            no_obj = no_obj / jnp.maximum(jnp.linalg.norm(no_obj), 1e-8)
            emb = out["mask_embed"]
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
            logits = jnp.concatenate(
                [out["pred_logits"],
                 (logit_scale * emb @ no_obj)[..., None]], axis=-1)
            seg_losses = set_criterion(
                logits, out["pred_masks"], gt_cls, gt_masks, gt_valid,
                rng, num_points=num_points)
            # --- vlp task on ITS batch ---
            tok_emb, pooled_cap = lang.apply(
                lvars, cap_ids, method=lang.encode_tokens)
            vout = model.apply({"params": params["model"]}, v_images, text,
                               logit_scale, caption_tokens=tok_emb)
            token_table = params["lang"]["lang_encoder"]["token_embedding"]["embedding"]
            l_cap = captioning_loss(
                vout["pred_captionings"], token_table, cap_ids, cap_mask)
            l_ret = image_text_contrastive_loss(
                vout["pred_captions"][:, -1], pooled_cap,
                params["lang"]["logit_scale"])
            total = (seg_losses["loss"] + caption_weight * l_cap
                     + retrieval_weight * l_ret)
            return total, {**{k: v for k, v in seg_losses.items()
                              if k != "loss"},
                           "loss": total, "loss_captioning": l_cap,
                           "loss_retrieval": l_ret}

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, data_axis)
        losses = jax.lax.pmean(losses, data_axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return Train2DState(params, opt_state, state.step + 1), losses

    mapped = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis), P(data_axis), P(data_axis),
                  P(data_axis), P(data_axis), P(data_axis), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def run_joint(args, cfg, mesh, n_dp, key, model, logit_scale):
    """Joint task-switched 2D pretraining (VERDICT r4 next #6,
    ≙ pipeline/XDecoderPipeline.py:1-196 + the infinibatch multi-dataset
    loader): per-step task routing between seg (mask classification, class
    text from the shared lang tower) and vlp (captioning + retrieval)
    batches over ONE parameter tree and ONE optimizer."""
    from geopurify_tpu.models.lang import HashTokenizer, LanguageEncoder

    tc = cfg.text
    if not (tc.width == tc.dim_proj == cfg.xdecoder.hidden_dim):
        raise SystemExit(
            "joint task requires text.width == text.dim_proj == "
            "xdecoder.hidden_dim (the reference runs all three at 512)"
        )
    H, W = cfg.xdecoder.mask_shape
    n_cls = max(len(cfg.data.all_label), 2)
    cap_len = max(args.caption_len, 8)
    lang = LanguageEncoder(
        vocab_size=tc.vocab_size, width=tc.width, layers=tc.layers,
        heads=tc.heads, context_length=cap_len, dim_proj=tc.dim_proj,
    )
    # class prompt tokens through the shared tower (template 0; the eval
    # path averages all ~80 — run/train.py)
    tk = HashTokenizer(vocab_size=tc.vocab_size, context_length=cap_len)
    from geopurify_tpu.models.lang import PROMPT_TEMPLATES

    names = list(cfg.data.all_label) or [f"c{i}" for i in range(n_cls)]
    class_ids, _ = tk([PROMPT_TEMPLATES[0].format(n) for n in names[:n_cls]])
    class_ids = jnp.asarray(class_ids)

    rng_np = np.random.default_rng(cfg.train.manual_seed)
    cap0, _ = synthetic_captions(rng_np, args.batch_size, cap_len,
                                 tc.vocab_size)
    lvars = lang.init(key, cap0)
    tok0, _ = lang.apply(lvars, cap0, method=lang.encode_tokens)
    dummy = jnp.zeros((args.batch_size, H, W, 3))
    text0 = jax.random.normal(key, (n_cls + 1, cfg.xdecoder.hidden_dim))
    text0 = text0 / jnp.linalg.norm(text0, axis=-1, keepdims=True)
    # init WITH caption tokens: the superset of both tasks' params
    mvars = model.init(key, dummy, text0, logit_scale, caption_tokens=tok0)
    params = {
        "model": mvars["params"], "lang": lvars["params"],
        "no_object": jax.random.normal(key, (cfg.xdecoder.hidden_dim,)) * 0.02,
    }

    decay = (int(args.steps * 0.88), int(args.steps * 0.96))
    sched = make_schedule(args.lr, warmup_steps=10, decay_steps=decay)
    tx = optax.chain(
        optax.clip_by_global_norm(args.grad_clip) if args.grad_clip else optax.identity(),
        optax.adamw(sched, weight_decay=args.weight_decay),
    )
    if args.grad_accum > 1:
        tx = optax.MultiSteps(tx, args.grad_accum)
    state = Train2DState(params, tx.init(params), jnp.zeros((), jnp.int32))

    # --- per-task batch sources: on-disk (data/joint_loader ≙ the
    # reference's per-dataset loaders) or synthetic fixtures ---
    seg_iters = vlp_iters = None
    if args.data_root:
        from geopurify_tpu.data.seg2d import Seg2DDataset

        ds = Seg2DDataset(args.data_root)
        if ds.class_names:
            names = list(ds.class_names)
            n_cls_ds = len(names)
            class_ids = jnp.asarray(tk(
                [PROMPT_TEMPLATES[0].format(n) for n in names])[0])
        seg_iters = [ds.batches(args.batch_size, (H, W),
                                max_targets=args.max_targets,
                                seed=cfg.train.manual_seed + d)
                     for d in range(n_dp)]
    if args.vlp_data_root:
        from geopurify_tpu.data.joint_loader import CaptionDataset

        cds = CaptionDataset(args.vlp_data_root)
        vlp_iters = [cds.batches(args.batch_size, (H, H), tk, cap_len,
                                 seed=cfg.train.manual_seed + d)
                     for d in range(n_dp)]

    def seg_batches():
        if seg_iters is not None:
            bs = [next(it) for it in seg_iters]
        else:
            bs = [synthetic_batch(rng_np, args.batch_size, (H, W), n_cls)
                  for _ in range(n_dp)]
        return tuple(jnp.stack([jnp.asarray(b[j]) for b in bs])
                     for j in range(4))

    def vlp_batches():
        if vlp_iters is not None:
            bs = [next(it) for it in vlp_iters]
            imgs = jnp.stack([jnp.asarray(
                np.pad(b[0], ((0, 0), (0, max(W - b[0].shape[1], 0)),
                              (0, max(W - b[0].shape[2], 0)), (0, 0))
                       )[:, :H, :W] if b[0].shape[1:3] != (H, W) else b[0])
                for b in bs])
            caps = jnp.stack([jnp.asarray(b[1]) for b in bs])
            masks = jnp.stack([jnp.asarray(b[2]) for b in bs])
            return imgs, caps, masks
        imgs, caps, masks = [], [], []
        for _ in range(n_dp):
            imgs.append(jnp.asarray(rng_np.uniform(
                0, 255, (args.batch_size, H, W, 3)).astype(np.float32)))
            ci, cm = synthetic_captions(rng_np, args.batch_size, cap_len,
                                        tc.vocab_size)
            caps.append(ci)
            masks.append(cm)
        return jnp.stack(imgs), jnp.stack(caps), jnp.stack(masks)

    if args.joint_mode == "zip":
        zip_step = make_joint_zip_step(model, lang, tx, mesh,
                                       cfg.parallel.data_axis, args.num_points)
    else:
        seg_step = make_joint_seg_step(model, lang, tx, mesh,
                                       cfg.parallel.data_axis, args.num_points)
        vlp_step = make_vlp_step(model, lang, tx, mesh, cfg.parallel.data_axis)

    w_seg, w_vlp = (float(x) for x in args.task_weights.split(":"))
    p_seg = w_seg / max(w_seg + w_vlp, 1e-9)

    is_main = jax.process_index() == 0
    if is_main:
        os.makedirs(args.save_path, exist_ok=True)
    metrics_path = os.path.join(args.save_path, "metrics.jsonl")
    t0 = time.time()
    counts = {"seg": 0, "vlp": 0, "zip": 0}
    for it in range(args.steps):
        if args.joint_mode == "zip":
            # ≙ JointLoader zip: one batch per task, one summed update
            task = "zip"
            counts[task] += 1
            si, sc, sm, sv = seg_batches()
            vi, vc, vm = vlp_batches()
            key, sub = jax.random.split(key)
            state, losses = zip_step(
                state, si, sc, sm, sv, vi, vc, vm, class_ids, logit_scale, sub,
            )
            step = int(state.step)
            if step % args.print_every == 0 or it == args.steps - 1:
                rec = {"step": step, "task": task,
                       **{k: float(v) for k, v in losses.items()},
                       "lr": float(sched(step))}
                log.info("%s", rec)
                if is_main:
                    with open(metrics_path, "a") as f:
                        f.write(json.dumps(rec) + "\n")
            continue
        # switch mode: per-step weighted task routing; first two steps cover
        # both tasks deterministically so short smokes exercise both paths
        if it == 0:
            task = "seg"
        elif it == 1:
            task = "vlp"
        else:
            task = "seg" if rng_np.uniform() < p_seg else "vlp"
        counts[task] += 1
        if task == "seg":
            si, sc, sm, sv = seg_batches()
            key, sub = jax.random.split(key)
            state, losses = seg_step(
                state, si, sc, sm, sv, class_ids, logit_scale, sub,
            )
        else:
            vi, vc, vm = vlp_batches()
            state, losses = vlp_step(
                state, vi, vc, vm, text0, logit_scale,
            )
        step = int(state.step)
        if step % args.print_every == 0 or it == args.steps - 1:
            rec = {"step": step, "task": task,
                   **{k: float(v) for k, v in losses.items()},
                   "lr": float(sched(step))}
            log.info("%s", rec)
            if is_main:
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
    if not is_main:
        return 0
    save_checkpoint(
        os.path.join(args.save_path, "ckpt"),
        {**state._asdict(), "rng": jax.random.key_data(key)}, int(state.step),
    )
    log.info("joint done: %d steps (%s) in %.1fs", int(state.step), counts,
             time.time() - t0)


def run_interactive(args, cfg, mesh, n_dp, key, text, logit_scale):
    """Interactive SEEM pretraining (VERDICT r4 next #4): synthetic panoptic
    scenes -> InteractiveMapper (≙ coco_panoptic_interactive_dataset_mapper:
    jitter + visual-sampler spatial prompts) -> SEEMHeadV1 spatial-query
    training with mask+dice losses on the prompted instances."""
    from geopurify_tpu.data.mappers import InteractiveMapper
    from geopurify_tpu.data.visual_sampler import StrokeSamplerConfig
    from geopurify_tpu.models.focalnet import FocalNet
    from geopurify_tpu.models.pixel_decoder import TransformerEncoderPixelDecoder
    from geopurify_tpu.models.seem import SEEMHeadV1

    xc = cfg.xdecoder
    H, W = xc.mask_shape
    if H != W:
        raise SystemExit("interactive task needs square mask_shape (the "
                         "mapper's FixedSizeCrop is square, INPUT.IMAGE_SIZE)")
    num_masks = args.max_candidate
    budget = args.prompt_budget
    dtype = jnp.float32 if xc.dtype == "float32" else jnp.bfloat16

    backbone = FocalNet(
        embed_dim=xc.backbone.embed_dim, depths=tuple(xc.backbone.depths),
        focal_levels=tuple(xc.backbone.focal_levels),
        focal_windows=tuple(xc.backbone.focal_windows), dtype=dtype,
    )
    pixdec = TransformerEncoderPixelDecoder(
        conv_dim=xc.conv_dim, mask_dim=xc.mask_dim,
        num_enc_layers=xc.enc_layers, num_heads=xc.nheads,
        dim_feedforward=xc.dim_feedforward, dtype=dtype,
    )
    head = SEEMHeadV1(
        hidden_dim=xc.hidden_dim, dim_proj=xc.hidden_dim,
        num_queries=xc.num_queries, nheads=xc.nheads,
        dim_feedforward=xc.dim_feedforward, dec_layers=xc.dec_layers,
        mask_dim=xc.mask_dim, max_spatial_tokens=budget, dtype=dtype,
    )
    mapper = InteractiveMapper(
        image_size=H, min_scale=args.jitter_min, max_scale=args.jitter_max,
        sampler_cfg=StrokeSamplerConfig(max_candidate=num_masks),
        grounding=False,
    )

    rng_np = np.random.default_rng(cfg.train.manual_seed)
    b0 = synthetic_interactive_batch(
        rng_np, mapper, args.batch_size, (H, W),
        max(len(cfg.data.all_label), 2), num_masks, budget)
    x0 = b0[0] / 127.5 - 1.0
    bvars = backbone.init(key, x0)
    feats0 = backbone.apply(bvars, x0)
    pvars = pixdec.init(key, feats0)
    mf0, _, ms0 = pixdec.apply(pvars, feats0)
    qidx0 = jnp.zeros((head.sample_size * num_masks,), jnp.int32)
    hvars = head.init(
        key, list(ms0), mf0, text[:-1], logit_scale, b0[1], b0[2],
        jnp.ones_like(b0[3]), b0[3], qidx0, num_masks=num_masks,
    )
    params = {"backbone": bvars["params"], "pixdec": pvars["params"],
              "head": hvars["params"]}

    decay = (int(args.steps * 0.88), int(args.steps * 0.96))
    sched = make_schedule(args.lr, warmup_steps=10, decay_steps=decay)
    tx = optax.chain(
        optax.clip_by_global_norm(args.grad_clip) if args.grad_clip else optax.identity(),
        optax.adamw(sched, weight_decay=args.weight_decay),
    )
    if args.grad_accum > 1:
        tx = optax.MultiSteps(tx, args.grad_accum)
    state = Train2DState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step_fn = make_interactive_step(backbone, pixdec, head, tx, mesh,
                                    cfg.parallel.data_axis)

    is_main = jax.process_index() == 0
    if is_main:
        os.makedirs(args.save_path, exist_ok=True)
    metrics_path = os.path.join(args.save_path, "metrics.jsonl")
    t0 = time.time()
    n_cls = max(len(cfg.data.all_label), 2)
    for it in range(args.steps):
        shards = [synthetic_interactive_batch(
            rng_np, mapper, args.batch_size, (H, W), n_cls, num_masks, budget)
            for _ in range(n_dp)]
        stack = lambda j: jnp.stack([s[j] for s in shards])  # noqa: E731
        # the reference draws the spatial-query sample from torch RNG per
        # forward (seem_v1.py rand_sample); here the host rng supplies it
        qidx = jnp.asarray(
            rng_np.integers(0, xc.num_queries, head.sample_size * num_masks),
            jnp.int32)
        state, losses = step_fn(
            state, stack(0), stack(1), stack(2), stack(3), stack(4), stack(5),
            text[:-1], logit_scale, qidx,
        )
        step = int(state.step)
        if step % args.print_every == 0 or it == args.steps - 1:
            rec = {"step": step,
                   **{k: float(v) for k, v in losses.items()},
                   "lr": float(sched(step))}
            log.info("%s", rec)
            if is_main:
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
    if not is_main:
        return 0
    save_checkpoint(
        os.path.join(args.save_path, "ckpt"),
        {**state._asdict(), "rng": jax.random.key_data(key)}, int(state.step),
    )
    log.info("interactive done: %d steps in %.1fs", int(state.step),
             time.time() - t0)


def run_vlp(args, cfg, mesh, n_dp, key, model, text, logit_scale):
    """VLP pretraining loop (≙ forward_vlp + the trainer's epoch machinery).
    Synthetic captions (random CLIP-layout token ids) drive the smoke; the
    lang tower trains jointly with the decoder."""
    from geopurify_tpu.models.lang import LanguageEncoder

    tc = cfg.text
    if not (tc.width == tc.dim_proj == cfg.xdecoder.hidden_dim):
        raise SystemExit(
            "vlp task requires text.width == text.dim_proj == "
            "xdecoder.hidden_dim (the reference runs all three at 512)"
        )
    H, W = cfg.xdecoder.mask_shape
    lang = LanguageEncoder(
        vocab_size=tc.vocab_size, width=tc.width, layers=tc.layers,
        heads=tc.heads, context_length=max(args.caption_len, 8),
        dim_proj=tc.dim_proj,
    )
    rng_np = np.random.default_rng(cfg.train.manual_seed)
    cap0, _ = synthetic_captions(rng_np, args.batch_size, args.caption_len,
                                 tc.vocab_size)
    lvars = lang.init(key, cap0)
    tok0, _ = lang.apply(lvars, cap0, method=lang.encode_tokens)
    dummy = jnp.zeros((args.batch_size, H, W, 3))
    mvars = model.init(key, dummy, text, logit_scale, caption_tokens=tok0)
    params = {"model": mvars["params"], "lang": lvars["params"]}

    decay = (int(args.steps * 0.88), int(args.steps * 0.96))
    sched = make_schedule(args.lr, warmup_steps=10, decay_steps=decay)
    tx = optax.chain(
        optax.clip_by_global_norm(args.grad_clip) if args.grad_clip else optax.identity(),
        optax.adamw(sched, weight_decay=args.weight_decay),
    )
    if args.grad_accum > 1:
        tx = optax.MultiSteps(tx, args.grad_accum)
    state = Train2DState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step_fn = make_vlp_step(model, lang, tx, mesh, cfg.parallel.data_axis)

    is_main = jax.process_index() == 0      # rank-0-only writes (≙ the
    # reference's distributed_trainer folder barriers + rank-0 checkpoints,
    # distributed_trainer.py:51-52, :95-108)
    if is_main:
        os.makedirs(args.save_path, exist_ok=True)
    metrics_path = os.path.join(args.save_path, "metrics.jsonl")
    ckpt_dir = os.path.join(args.save_path, "ckpt")
    t0 = time.time()
    for it in range(args.steps):
        imgs, caps, masks = [], [], []
        for _ in range(n_dp):
            imgs.append(jnp.asarray(
                rng_np.uniform(0, 255, (args.batch_size, H, W, 3)).astype(np.float32)
            ))
            ci, cm = synthetic_captions(rng_np, args.batch_size,
                                        args.caption_len, tc.vocab_size)
            caps.append(ci)
            masks.append(cm)
        state, losses = step_fn(
            state, jnp.stack(imgs), jnp.stack(caps), jnp.stack(masks),
            text, logit_scale,
        )
        step = int(state.step)
        if step % args.print_every == 0 or it == args.steps - 1:
            rec = {"step": step,
                   **{k: float(v) for k, v in losses.items()},
                   "lr": float(sched(step))}
            log.info("%s", rec)
            if is_main:
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
    if not is_main:
        return 0
    save_checkpoint(
        ckpt_dir, {**state._asdict(), "rng": jax.random.key_data(key)},
        int(state.step),
    )
    log.info("vlp done: %d steps in %.1fs", int(state.step), time.time() - t0)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="scannet")
    parser.add_argument("--config", default=None)
    parser.add_argument("--task", default="seg",
                        choices=["seg", "vlp", "joint", "interactive"],
                        help="seg: mask-classification pretraining; vlp: "
                             "caption slots + captioning CE + image-text "
                             "contrastive (≙ forward_vlp); joint: per-step "
                             "task routing seg<->vlp over one param tree "
                             "(≙ XDecoderPipeline); interactive: SEEM "
                             "spatial-prompt training via the visual "
                             "sampler (≙ coco_panoptic_interactive mapper)")
    parser.add_argument("--task-weights", default="1:1",
                        help="joint(switch) task sampling weights seg:vlp")
    parser.add_argument("--joint-mode", default="zip",
                        choices=["zip", "switch"],
                        help="zip (default, ≙ the reference JointLoader): "
                             "every step carries one batch per task with "
                             "one summed update; switch: per-step weighted "
                             "task routing")
    parser.add_argument("--vlp-data-root", default=None,
                        help="joint: on-disk caption dataset (images/ + "
                             "captions.json — data/joint_loader.py)")
    parser.add_argument("--max-candidate", type=int, default=2,
                        help="interactive: prompt instances per image "
                             "(STROKE_SAMPLER.MAX_CANDIDATE)")
    parser.add_argument("--prompt-budget", type=int, default=64,
                        help="interactive: spatial prompt points per image "
                             "(MAX_SPATIAL_LEN)")
    parser.add_argument("--jitter-min", type=float, default=0.9)
    parser.add_argument("--jitter-max", type=float, default=1.1)
    parser.add_argument("--caption-len", type=int, default=32)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--data-root", default=None,
                        help="on-disk dataset (COCO annotations.json or the "
                             "images/+masks/ folder layout — data/seg2d.py)")
    parser.add_argument("--max-targets", type=int, default=8)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch-size", type=int, default=1,
                        help="images per device per step")
    parser.add_argument("--image-hw", default=None,
                        help="HxW override (e.g. 96x128 for smoke)")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--weight-decay", type=float, default=0.05)
    parser.add_argument("--grad-accum", type=int, default=1)
    parser.add_argument("--grad-clip", type=float, default=0.01,
                        help="grad norm clip (X-Decoder trainer default)")
    parser.add_argument("--num-points", type=int, default=4096)
    parser.add_argument("--save-path", default="runs/train2d")
    parser.add_argument("--save-every", type=int, default=500)
    parser.add_argument("--print-every", type=int, default=10)
    parser.add_argument("--resume", default=None)
    parser.add_argument("--distributed", action="store_true")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s %(filename)s:%(lineno)d] %(message)s")
    if args.distributed:
        jax.distributed.initialize()
        log.info("distributed: process %d/%d", jax.process_index(),
                 jax.process_count())
    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = load_config(args.preset, overrides=args.overrides, yaml_path=args.config)
    if args.image_hw:
        h, w = (int(x) for x in args.image_hw.split("x"))
        cfg = dataclasses.replace(
            cfg, xdecoder=dataclasses.replace(cfg.xdecoder, mask_shape=(h, w))
        )

    n_cls = max(len(cfg.data.all_label), 2)
    key = jax.random.key(cfg.train.manual_seed)
    mesh = make_mesh(dp=cfg.parallel.dp, tp=cfg.parallel.tp)
    n_dp = mesh.shape[cfg.parallel.data_axis]

    model = XDecoderSegModel(cfg.xdecoder)
    H, W = cfg.xdecoder.mask_shape
    # pretraining text matrix: random normalized class embeddings unless a
    # language tower is converted (lang + template averaging, run/train.py)
    key, tkey = jax.random.split(key)
    text = jax.random.normal(tkey, (n_cls + 1, cfg.xdecoder.hidden_dim))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    logit_scale = jnp.float32(np.exp(2.659260036932778))  # CLIP init, ln(1/0.07)

    dummy = jnp.zeros((args.batch_size, H, W, 3))
    if args.task == "vlp":
        return run_vlp(args, cfg, mesh, n_dp, key, model, text, logit_scale)
    if args.task == "joint":
        return run_joint(args, cfg, mesh, n_dp, key, model, logit_scale)
    if args.task == "interactive":
        return run_interactive(args, cfg, mesh, n_dp, key, text, logit_scale)
    mvars = model.init(key, dummy, text, logit_scale)
    params = {
        "model": mvars["params"],
        "no_object": jax.random.normal(key, (cfg.xdecoder.hidden_dim,)) * 0.02,
    }

    decay = (int(args.steps * 0.88), int(args.steps * 0.96))  # ≙ coco schedule
    sched = make_schedule(args.lr, warmup_steps=10, decay_steps=decay)
    tx = optax.chain(
        optax.clip_by_global_norm(args.grad_clip) if args.grad_clip else optax.identity(),
        optax.adamw(sched, weight_decay=args.weight_decay),
    )
    if args.grad_accum > 1:
        tx = optax.MultiSteps(tx, args.grad_accum)
    state = Train2DState(params, tx.init(params), jnp.zeros((), jnp.int32))

    ckpt_dir = os.path.join(args.save_path, "ckpt")
    if args.resume:
        restored, step0 = restore_checkpoint(
            args.resume, {**state._asdict(), "rng": jax.random.key_data(key)}
        )
        if restored is not None:
            key = jax.random.wrap_key_data(restored.pop("rng"))
            state = Train2DState(**restored)
            log.info("resumed from step %d", step0)

    step_fn = make_train2d_step(model, tx, mesh, cfg.parallel.data_axis,
                                args.num_points)
    is_main = jax.process_index() == 0      # rank-0-only writes (≙ the
    # reference's distributed_trainer folder barriers + rank-0 checkpoints,
    # distributed_trainer.py:51-52, :95-108)
    if is_main:
        os.makedirs(args.save_path, exist_ok=True)
    metrics_path = os.path.join(args.save_path, "metrics.jsonl")
    rng_np = np.random.default_rng(cfg.train.manual_seed)

    data_iter = None
    if args.data_root:
        # on-disk mapper (data/seg2d.py ≙ reference dataset_mappers/build.py)
        from geopurify_tpu.data.seg2d import Seg2DDataset

        ds = Seg2DDataset(args.data_root)
        if ds.class_names:
            n_cls = len(ds.class_names)
            key, tkey = jax.random.split(key)
            text = jax.random.normal(tkey, (n_cls + 1, cfg.xdecoder.hidden_dim))
            text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
        log.info("dataset: %d images, %d classes (%s layout)",
                 len(ds), n_cls, ds.mode)
        data_iter = ds.batches(
            args.batch_size, (H, W), max_targets=args.max_targets,
            seed=cfg.train.manual_seed,
        )
    elif not args.synthetic:
        parser.error("pass --synthetic or --data-root")

    t0 = time.time()
    for it in range(args.steps):
        if data_iter is not None:
            batches = [
                tuple(jnp.asarray(x) for x in next(data_iter))
                for _ in range(n_dp)
            ]
        else:
            batches = [synthetic_batch(rng_np, args.batch_size, (H, W), n_cls)
                       for _ in range(n_dp)]
        stack = lambda j: jnp.stack([b[j] for b in batches])  # noqa: E731
        key, sub = jax.random.split(key)
        state, losses = step_fn(
            state, stack(0), stack(1), stack(2), stack(3), text, logit_scale, sub
        )
        step = int(state.step)
        if step % args.print_every == 0 or it == args.steps - 1:
            rec = {
                "step": step,
                **{k: float(v) for k, v in losses.items()},
                "lr": float(sched(step)),
                "items_per_sec": step * n_dp * args.batch_size
                / max(time.time() - t0, 1e-9),
            }
            log.info("%s", rec)
            if is_main:
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
        if args.save_every and step % args.save_every == 0 and is_main:
            save_checkpoint(
                ckpt_dir, {**state._asdict(), "rng": jax.random.key_data(key)}, step
            )
    if not is_main:
        return 0
    save_checkpoint(
        ckpt_dir, {**state._asdict(), "rng": jax.random.key_data(key)},
        int(state.step),
    )
    log.info("done: %d steps in %.1fs", int(state.step), time.time() - t0)


if __name__ == "__main__":
    main()
