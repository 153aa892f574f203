"""2D open-vocabulary inference on single images — the X-Decoder task family.

Rebuild of the reference's standalone inference scripts
(reference third_party/X-Decoder/xdecoder/inference/xdecoder/
infer_{semseg,panoseg,instseg,refseg,captioning,region_retrieval}.py):
one CLI with a ``--task`` switch instead of seven copies of the load/
preprocess/draw scaffold. The per-task query-prediction math lives in
models/inference2d.py; drawing in utils/visualizer2d.py. Doubles as the
qualitative sanity check for converted teacher checkpoints (xdecoder.ckpt).

Usage:
  python -m geopurify_tpu.run.infer2d --image photo.jpg \
      --classes "wall,floor,chair" [--task semseg] [xdecoder.ckpt=...]
  ... --task panoseg --things "chair"         # thing/stuff split
  ... --task instseg --topk 5
  ... --task refseg --phrases "the red chair"
  ... --task captioning [--caption-steps 20]
  ... --task retrieval --gallery imgs_dir --phrases "a chair"
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

log = logging.getLogger("geopurify.infer2d")


def semseg_from_outputs(pred_logits, pred_masks, out_hw):
    """Per-pixel class map from query predictions (semantic_inference,
    xdecoder_model.py:947-954): softmax over ALL n_cls+1 columns, DROP the
    background column (slicing before the softmax renormalizes
    background-confident queries onto real classes — a real divergence),
    sem_map[c] = sum_q p_qc * sigmoid(mask)_q, argmax over classes.

    ``pred_logits`` must be the FULL [Q, n_cls+1] logits."""
    import jax.numpy as jnp

    from geopurify_tpu.models.inference2d import semantic_inference
    from geopurify_tpu.models.layers import resize_bicubic_antialias

    sem = semantic_inference(pred_logits, pred_masks, keep_sem_bgd=False)
    sem = resize_bicubic_antialias(sem[None], tuple(out_hw))[0]  # [H, W, n_cls]
    return jnp.argmax(sem, axis=-1)


def _load_work_image(path, mask_shape):
    """Load + nearest-resize to the model's working resolution (the overlay
    is emitted at working resolution)."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB")).astype(np.float32)
    H, W = img.shape[:2]
    mh, mw = mask_shape
    ri = (np.arange(mh) * (H / mh)).astype(np.int64)
    ci = (np.arange(mw) * (W / mw)).astype(np.int64)
    return img[ri][:, ci]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", default=None)
    parser.add_argument("--task", default="semseg",
                        choices=["semseg", "panoseg", "instseg", "refseg",
                                 "captioning", "retrieval"])
    parser.add_argument("--classes", default=None,
                        help="comma-separated open-vocab class names "
                             "(required for semseg/panoseg/instseg)")
    parser.add_argument("--things", default=None,
                        help="panoseg: comma-separated subset of --classes "
                             "treated as things (default: all)")
    parser.add_argument("--phrases", default=None,
                        help="refseg/retrieval: comma-separated referring "
                             "phrases / text queries")
    parser.add_argument("--gallery", default=None,
                        help="retrieval: directory of candidate images "
                             "(ranked against --phrases; --image joins them)")
    parser.add_argument("--topk", type=int, default=5,
                        help="instseg: instances to keep")
    parser.add_argument("--caption-steps", type=int, default=20,
                        help="captioning: greedy decode steps (ref STEP=50)")
    parser.add_argument("--object-threshold", type=float, default=0.8)
    parser.add_argument("--overlap-threshold", type=float, default=0.8)
    parser.add_argument("--preset", default="scannet")
    parser.add_argument("--out", default=None, help="overlay png (default: <image>_<task>.png)")
    parser.add_argument("--alpha", type=float, default=0.5)
    parser.add_argument("--rich-overlay", action="store_true",
                        help="detectron2-style drawing: boundaries + label "
                             "text at region centers (utils/visualizer2d.py)")
    parser.add_argument("--eval-list", default=None,
                        help="semseg batch evaluation (≙ infer_semseg_all.py): "
                             "file of '<image> <gt_label_png>' lines; per-image "
                             "predictions accumulate a confusion-matrix mIoU "
                             "(utils/eval2d.SemSeg2DEvaluator)")
    parser.add_argument("--label-map", default=None,
                        help="eval-list: 'raw:train' comma pairs remapping gt "
                             "label-png ids to contiguous train ids, unmapped "
                             "-> ignore (the ScanNet raw->train table, "
                             "infer_semseg_all.py:93-121); default identity")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s %(filename)s:%(lineno)d] %(message)s")

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from geopurify_tpu.config import load_config
    from geopurify_tpu.run.train import build_pipeline
    from geopurify_tpu.utils.visualization import overlay_2d_semantic
    from geopurify_tpu.utils.visualizer2d import Visualizer2D

    if args.task in ("semseg", "panoseg", "instseg") and not args.classes:
        parser.error(f"--task {args.task} requires --classes")
    if args.task in ("refseg", "retrieval") and not args.phrases:
        parser.error(f"--task {args.task} requires --phrases")
    if not args.image and not args.eval_list:
        parser.error("--image (or --eval-list for batch semseg) is required")

    classes = [c.strip() for c in (args.classes or "object").split(",") if c.strip()]
    cfg = load_config(args.preset, overrides=args.overrides)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, all_label=tuple(classes))
    )
    need_lang = args.task in ("refseg", "captioning", "retrieval")
    if need_lang:
        pipeline, _, (tk, lang, lang_vars) = build_pipeline(
            cfg, jax.random.key(0), require_teachers=True, return_lang=True
        )
    else:
        pipeline, _ = build_pipeline(
            cfg, jax.random.key(0), require_teachers=True
        )
    # one jitted teacher forward reused everywhere — eager apply dispatches
    # thousands of ops per image through the tunnel (CLAUDE.md), and params
    # ride as ARGUMENTS (closure capture bakes the teacher into the
    # executable: 10+ min constant-folds / HTTP 413 on the compile RPC)
    fwd = jax.jit(pipeline.xdecoder.apply)

    mh, mw = cfg.xdecoder.mask_shape
    if args.eval_list:
        # batch semseg evaluation over an on-disk list — the rebuild of
        # infer_semseg_all.py:30-225 (per-image forward, confusion-matrix
        # I/U accumulation, raw->train gt remap, final mIoU/pACC report)
        from geopurify_tpu.utils.eval2d import SemSeg2DEvaluator

        remap = np.full(256, 255, np.uint8)
        if args.label_map:
            for pair in args.label_map.split(","):
                raw, train = pair.split(":")
                remap[int(raw)] = int(train)
        else:
            remap[: len(classes)] = np.arange(len(classes), dtype=np.uint8)

        ev = SemSeg2DEvaluator(len(classes), class_names=classes,
                               ignore_label=255)
        pairs = [
            ln.split() for ln in open(args.eval_list).read().splitlines() if ln
        ]
        for img_path, gt_path in pairs:
            w2 = _load_work_image(img_path, cfg.xdecoder.mask_shape)
            o2 = fwd(
                pipeline.teacher_params, jnp.asarray(w2)[None],
                pipeline.text_embeddings, pipeline.logit_scale,
            )
            seg = np.asarray(semseg_from_outputs(
                o2["pred_logits"][0], o2["pred_masks"][0], (mh, mw),
            ))
            gt_raw = np.asarray(Image.open(gt_path))
            ri = (np.arange(mh) * (gt_raw.shape[0] / mh)).astype(np.int64)
            ci = (np.arange(mw) * (gt_raw.shape[1] / mw)).astype(np.int64)
            gt = remap[np.clip(gt_raw[ri][:, ci], 0, 255)]
            ev.process(seg, gt)
        res = ev.evaluate()
        log.info("2D eval over %d images: mIoU=%.2f pACC=%.2f", len(pairs),
                 res["mIoU"], res["pACC"])
        return res

    work = _load_work_image(args.image, cfg.xdecoder.mask_shape)

    out = fwd(
        pipeline.teacher_params, jnp.asarray(work)[None],
        pipeline.text_embeddings, pipeline.logit_scale,
    )
    dst = args.out or os.path.splitext(args.image)[0] + f"_{args.task}.png"
    base = work.astype(np.uint8)

    if args.task == "semseg":
        seg = semseg_from_outputs(
            out["pred_logits"][0], out["pred_masks"][0], (mh, mw),
        )
        seg_np = np.asarray(seg)
        if args.rich_overlay:
            overlay = (
                Visualizer2D(base, class_names=classes)
                .draw_sem_seg(seg_np, alpha=args.alpha)
                .get_image()
            )
        else:
            overlay = overlay_2d_semantic(work, seg_np, num_classes=len(classes),
                                          alpha=args.alpha)
        Image.fromarray(overlay).save(dst)
        counts = {classes[c]: int((seg_np == c).sum()) for c in range(len(classes))}
        log.info("class pixel counts: %s", counts)

    elif args.task == "panoseg":
        from geopurify_tpu.models.inference2d import panoptic_inference

        things = set(
            t.strip() for t in (args.things or args.classes).split(",") if t.strip()
        )
        is_thing = jnp.asarray([c in things for c in classes])
        pan, info = panoptic_inference(
            out["pred_logits"][0], out["pred_masks"][0], is_thing,
            object_mask_threshold=args.object_threshold,
            overlap_threshold=args.overlap_threshold,
        )
        pan_np = np.asarray(pan)
        # segment table ordered by segment id (1-based)
        valid = np.asarray(info.valid)
        owners = np.flatnonzero(valid)[np.argsort(np.asarray(info.seg_id)[valid])]
        cats = [int(np.asarray(info.category_id)[q]) for q in owners]
        isth = [bool(np.asarray(info.isthing)[q]) for q in owners]
        # upsample ids to the overlay resolution (nearest keeps ids intact)
        overlay = (
            Visualizer2D(base, class_names=classes)
            .draw_panoptic_seg(pan_np, cats, isth, alpha=args.alpha)
            .get_image()
        )
        Image.fromarray(overlay).save(dst)
        log.info("%d segments: %s", len(owners),
                 [(i + 1, classes[c], t) for i, (c, t) in enumerate(zip(cats, isth))])

    elif args.task == "instseg":
        from geopurify_tpu.models.inference2d import instance_inference

        inst = instance_inference(
            out["pred_logits"][0], out["pred_masks"][0], topk=args.topk
        )
        keep = np.asarray(inst.valid)
        overlay = (
            Visualizer2D(base, class_names=classes)
            .draw_instance_predictions(
                np.asarray(inst.masks)[keep],
                np.asarray(inst.classes)[keep],
                scores=np.asarray(inst.scores)[keep],
                boxes=np.asarray(inst.boxes)[keep],
                alpha=args.alpha,
            )
            .get_image()
        )
        Image.fromarray(overlay).save(dst)
        log.info("instances: %s", [
            (classes[int(c)], float(s))
            for c, s in zip(np.asarray(inst.classes)[keep],
                            np.asarray(inst.scores)[keep])
        ])

    elif args.task == "refseg":
        from geopurify_tpu.models.inference2d import grounding_inference
        from geopurify_tpu.models.lang import embed_class_names

        phrases = [p.strip() for p in args.phrases.split(",") if p.strip()]
        # grounding_refcoco mode: raw phrase, no templates, no background
        # (evaluate_grounding_baseline, xdecoder_model.py:738-741)
        t_emb = jnp.asarray(embed_class_names(
            lambda v, i: lang.apply(v, i), lang_vars, tk, phrases,
            use_templates=False, add_background=False,
        ))
        masks, matched = grounding_inference(
            out["mask_embed"][0], t_emb, out["pred_masks"][0],
            logit_scale=jnp.log(pipeline.logit_scale),
        )
        viz = Visualizer2D(base, class_names=phrases)
        for i, phrase in enumerate(phrases):
            viz.draw_binary_mask(
                np.asarray(masks[i] > 0), viz.palette[i % len(viz.palette)],
                alpha=args.alpha, text=phrase,
            )
        Image.fromarray(viz.get_image()).save(dst)
        log.info("matched query per phrase: %s",
                 dict(zip(phrases, np.asarray(matched).tolist())))

    elif args.task == "captioning":
        from geopurify_tpu.models.inference2d import caption_greedy_decode
        from geopurify_tpu.models.xdecoder import apply_head, encode_pixel_features

        # encode the image ONCE; the greedy loop re-runs only the query
        # decoder + lang token embedding (forward_captioning,
        # interface/xdecoder.py:325-421)
        teacher_params = pipeline.teacher_params
        pred = teacher_params["params"]["predictor"]
        if "caping_embed" not in pred:
            # pipelines built for seg-only never created the caption slots;
            # backfill zero stand-ins (converted real checkpoints carry them)
            import flax

            teacher_params = flax.core.unfreeze(teacher_params)
            C = cfg.xdecoder.hidden_dim
            teacher_params["params"]["predictor"]["caping_embed"] = (
                jnp.zeros((C, C), jnp.float32)
            )
            teacher_params["params"]["predictor"]["pos_embed_caping"] = (
                jnp.zeros((cfg.text.context_length, C), jnp.float32)
            )
        mask_features, multi_scale = encode_pixel_features(
            cfg.xdecoder, teacher_params, jnp.asarray(work)[None]
        )
        table = lang_vars["params"]["lang_encoder"]["token_embedding"]["embedding"]
        bos = getattr(tk, "sot", 49406)

        # jit the WHOLE decode with every array as an ARGUMENT — closure
        # capture (even one level up, in the fori_loop) bakes the teacher
        # into the executable (CLAUDE.md: 10+ min constant-folds / HTTP 413)
        def _decode(tp, lv, ms, mfeat, text, scale, tbl):
            def logits_fn(tokens):
                tok_emb, _ = lang.apply(lv, tokens, method=lang.encode_tokens)
                o = apply_head(cfg.xdecoder, tp, list(ms), mfeat, text, scale,
                               caption_tokens=tok_emb)
                return o["pred_captionings"][:, :-1] @ tbl.T

            return caption_greedy_decode(
                logits_fn, steps=args.caption_steps,
                context_length=cfg.text.context_length, bos_id=int(bos),
            )

        tokens = jax.jit(_decode)(
            teacher_params, lang_vars, tuple(multi_scale), mask_features,
            pipeline.text_embeddings, pipeline.logit_scale, table,
        )
        ids = np.asarray(tokens)[0]
        text = tk.decode(ids[1:])  # skip BOS slot; decode stops at EOT
        dst = os.path.splitext(dst)[0] + ".txt"
        with open(dst, "w") as f:
            f.write(text + "\n")
        log.info("caption: %r (token ids %s...)", text, ids[:8].tolist())

    elif args.task == "retrieval":
        from geopurify_tpu.models.inference2d import retrieval_scores
        from geopurify_tpu.models.lang import embed_class_names

        phrases = [p.strip() for p in args.phrases.split(",") if p.strip()]
        t_emb = jnp.asarray(embed_class_names(
            lambda v, i: lang.apply(v, i), lang_vars, tk, phrases,
            use_templates=False, add_background=False,
        ))
        paths = [args.image]
        if args.gallery:
            paths += sorted(
                os.path.join(args.gallery, p) for p in os.listdir(args.gallery)
                if p.lower().endswith((".png", ".jpg", ".jpeg"))
            )
        embeds = [np.asarray(out["cls_embed"][0])]
        for p in paths[1:]:
            w2 = _load_work_image(p, cfg.xdecoder.mask_shape)
            o2 = fwd(
                pipeline.teacher_params, jnp.asarray(w2)[None],
                pipeline.text_embeddings, pipeline.logit_scale,
            )
            embeds.append(np.asarray(o2["cls_embed"][0]))
        sim = np.asarray(retrieval_scores(jnp.asarray(np.stack(embeds)), t_emb))
        import json

        ranking = {}
        for t, phrase in enumerate(phrases):
            order = np.argsort(-sim[t])
            ranking[phrase] = [
                {"image": paths[i], "score": round(float(sim[t, i]), 4)}
                for i in order
            ]
            log.info("ranking for %r: %s", phrase,
                     [(r["image"], r["score"]) for r in ranking[phrase]])
        dst = os.path.splitext(dst)[0] + ".json"
        with open(dst, "w") as f:
            json.dump(ranking, f, indent=1)

    log.info("wrote %s", dst)
    return dst


if __name__ == "__main__":
    main()
