"""Interactive click -> mask segmentation demo (SEEM v1 loop).

Rebuild of the reference's SEEM interactive evaluation path
(reference third_party/X-Decoder/xdecoder/modeling/architectures/
seem_model_v1.py:439-516 evaluate_interactive + demo/seem/*): a click (or
several) seeds positive prompt masks; each round the SEEMHeadV1 decoder
predicts a mask from points resampled off the prompt masks, with the previous
round's mask as spatial memory; when a ground-truth mask is supplied the
next click is auto-placed at the deepest point of the error region
(prepare_next_spatial_mask).

Usage (synthetic image — no checkpoint needed, random weights):
  python -m geopurify_tpu.run.infer_interactive --synthetic \
      --clicks "24,32" --out mask.png
  python -m geopurify_tpu.run.infer_interactive --image photo.jpg \
      --clicks "120,200;90,210" [--neg-clicks "10,10"] --out overlay.png
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

log = logging.getLogger("geopurify.interactive")


def parse_clicks(spec: str):
    out = []
    for part in (spec or "").split(";"):
        part = part.strip()
        if part:
            y, x = part.split(",")
            out.append((int(y), int(x)))
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", default=None)
    parser.add_argument("--synthetic", action="store_true",
                        help="96x128 synthetic image with a bright square")
    parser.add_argument("--eval-noc", type=int, default=0,
                        help="run the NoC evaluation protocol over N "
                             "synthetic instances instead of the "
                             "overlay demo (interactive_evaluation"
                             ".py:39-77 + evaluate_interactive): "
                             "SimpleClick-placed first click -> "
                             "refinement -> NoC@{0.5,0.8,0.85,0.9}")
    parser.add_argument("--clicks", default="8,8",
                        help='"y,x;y,x" positive clicks (image coordinates)')
    parser.add_argument("--neg-clicks", default="")
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--budget", type=int, default=64)
    parser.add_argument("--preset", default="scannet")
    parser.add_argument("--task", default="v1", choices=("v1", "demo"),
                        help="v1 = click-refinement loop (SEEMHeadV1); demo = "
                             "one-shot composed-prompt head (SEEMHeadDemo, "
                             "≙ seem_model_demo.evaluate_demo)")
    parser.add_argument("--refimg", default=None,
                        help="[demo] reference image for a VISUAL prompt")
    parser.add_argument("--ref-clicks", default="",
                        help='[demo] "y,x;y,x" clicks on --refimg marking the '
                             "visual exemplar")
    parser.add_argument("--out", default=None)
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
    from geopurify_tpu.models.focalnet import FocalNet
    from geopurify_tpu.models.pixel_decoder import TransformerEncoderPixelDecoder
    from geopurify_tpu.models.seem import SEEMHeadV1, points_from_masks

    cfg = load_config(args.preset, overrides=args.overrides)
    xc = cfg.xdecoder

    if args.synthetic:
        rng = np.random.default_rng(0)
        H, W = 96, 128
        img = rng.uniform(40, 80, (H, W, 3)).astype(np.float32)
        img[20:70, 30:100] = rng.uniform(180, 230, (50, 70, 3))
    else:
        if not args.image:
            parser.error("--image or --synthetic required")
        img = np.asarray(Image.open(args.image).convert("RGB")).astype(np.float32)
        H, W = img.shape[:2]

    key = jax.random.key(0)
    dtype = jnp.float32
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
        mask_dim=xc.mask_dim, max_spatial_tokens=args.budget, dtype=dtype,
    )

    x = jnp.asarray(img)[None] / 127.5 - 1.0
    div = xc.size_divisibility
    Hp, Wp = -(-H // div) * div, -(-W // div) * div
    x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    bvars = backbone.init(key, x)
    feats = backbone.apply(bvars, x)
    pvars = pixdec.init(key, feats)
    mask_features, _, multi_scale = pixdec.apply(pvars, feats)
    Hm, Wm = mask_features.shape[1:3]

    n_cls = max(len(cfg.data.all_label), 2)
    text = jax.random.normal(key, (n_cls, xc.hidden_dim))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)

    if args.task == "demo":
        return _run_demo(args, cfg, backbone, bvars, pixdec, pvars,
                         multi_scale, mask_features, text, img, H, W, key)

    S = args.budget
    host_rng = np.random.default_rng(1)
    NS = head.sample_size  # single prompt mask -> num_masks=1
    L = head.dec_layers
    M = head.num_spatial_memories
    mids0 = jnp.zeros((1, S), jnp.int32)
    hvars = head.init(
        key, multi_scale, mask_features, text, jnp.float32(20.0),
        jnp.zeros((1, S, 2)), jnp.zeros((1, S), bool),
        jnp.ones((1, S), jnp.int32), mids0,
        jnp.zeros((NS,), jnp.int32),
    )
    # every array rides as a jit ARGUMENT — closure capture bakes the params
    # + feature maps into the executable (CLAUDE.md: blown compile time/size)
    jitted = jax.jit(
        lambda hv, ms, mfeat, txt, pts, valid, tags, qidx, prev, midx:
        head.apply(hv, list(ms), mfeat, txt, jnp.float32(20.0),
                   pts, valid, tags, mids0, qidx,
                   prev_mask=prev, memory_indices=midx)
    )
    jitted_nomem = jax.jit(
        lambda hv, ms, mfeat, txt, pts, valid, tags, qidx:
        head.apply(hv, list(ms), mfeat, txt, jnp.float32(20.0),
                   pts, valid, tags, mids0, qidx)
    )

    def head_apply(pts, valid, tags, prev):
        # the reference draws the spatial-query sample and the per-layer
        # memory-channel assignment from torch RNG each forward
        # (seem_v1.py:287-288, attention_data_struct_seemv1.py:185-190);
        # here the host draws them (single mask -> channel 0 always)
        qidx = jnp.asarray(
            host_rng.integers(0, head.num_queries, NS), jnp.int32
        )
        if prev is None:
            return jitted_nomem(hvars, tuple(multi_scale), mask_features,
                                text, pts, valid, tags, qidx)
        return jitted(hvars, tuple(multi_scale), mask_features, text,
                      pts, valid, tags, qidx, prev,
                      jnp.zeros((L, M), jnp.int32))

    if args.eval_noc:
        # NoC protocol end-to-end (≙ interactive_evaluation.py:39-77 over
        # the v1 evaluate_interactive loop): synthetic elliptical gt
        # instances, the FIRST click placed by the SimpleClick rule (the
        # deepest gt pixel via the conv distance transform), then the
        # refinement loop's error-driven clicks; per-click IoU arrays feed
        # the NoC@t / mIoU@iter evaluator.
        import json

        from geopurify_tpu.data.visual_sampler import _center_clicks
        from geopurify_tpu.models.seem import interactive_refine
        from geopurify_tpu.utils.eval2d_suite import InteractiveEvaluator

        max_clicks = args.rounds
        ev = InteractiveEvaluator(max_clicks=max_clicks, iou_iter=1)
        g = np.random.default_rng(3)
        yy, xx = np.mgrid[0:Hm, 0:Wm]
        per_sample = []

        def apply_np(p, v, t, prev):
            return head_apply(
                jnp.asarray(p)[None], jnp.asarray(v)[None],
                jnp.asarray(t)[None], prev,
            )

        for i in range(args.eval_noc):
            cy = int(g.integers(Hm // 4, 3 * Hm // 4))
            cx = int(g.integers(Wm // 4, 3 * Wm // 4))
            ry = int(g.integers(3, max(Hm // 3, 4)))
            rx = int(g.integers(3, max(Wm // 3, 4)))
            gt = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) <= 1.0
            click = int(_center_clicks(gt[None])[0])
            init = np.zeros((Hm, Wm), bool)
            init[divmod(click, Wm)] = True
            _, ious = interactive_refine(
                apply_np, gt, init, budget=S, iters=max_clicks, seed=i,
                iou_stop=0.99,
            )
            arr = np.asarray(ious + [ious[-1]] * (max_clicks - len(ious)))
            per_sample.append(arr)
            log.info("instance %d: IoU per click %s", i, np.round(arr, 3))
        ev.process(per_sample)
        metrics = ev.evaluate()
        log.info("NoC metrics: %s", metrics)
        print(json.dumps({k: round(v, 4) for k, v in metrics.items()}))
        return 0

    # seed prompt masks at stride 4 from the clicks
    pos = np.zeros((Hm, Wm), bool)
    neg = np.zeros((Hm, Wm), bool)
    for (y, x_) in parse_clicks(args.clicks):
        pos[min(y // 4, Hm - 1), min(x_ // 4, Wm - 1)] = True
    for (y, x_) in parse_clicks(args.neg_clicks):
        neg[min(y // 4, Hm - 1), min(x_ // 4, Wm - 1)] = True

    rng = np.random.default_rng(0)
    prev = None
    mask_logits = None
    for r in range(args.rounds):
        pts, valid, tags = points_from_masks(pos, neg, S, rng)
        out = head_apply(
            jnp.asarray(pts)[None], jnp.asarray(valid)[None],
            jnp.asarray(tags)[None], prev,
        )
        mask_logits = np.asarray(out["prev_mask"][0, 0])
        prev = out["prev_mask"]
        frac = float((1 / (1 + np.exp(-mask_logits)) > 0.5).mean())
        log.info("round %d: mask covers %.1f%% of the frame", r, 100 * frac)

    mask = 1 / (1 + np.exp(-mask_logits)) > 0.5
    # stride-4 mask -> image resolution (nearest) + overlay
    mask_full = mask[
        np.minimum((np.arange(H) // 4), Hm - 1)[:, None],
        np.minimum((np.arange(W) // 4), Wm - 1)[None, :],
    ]
    from geopurify_tpu.utils.visualizer2d import Visualizer2D

    overlay = (
        Visualizer2D(img.astype(np.uint8))
        .draw_binary_mask(mask_full, np.array([66, 135, 245]), text="object")
        .get_image()
    )
    dst = args.out or (
        os.path.splitext(args.image or "synthetic")[0] + "_interactive.png"
    )
    Image.fromarray(overlay).save(dst)
    log.info("wrote %s", dst)
    return dst


def _run_demo(args, cfg, backbone, bvars, pixdec, pvars, multi_scale,
              mask_features, text, img, H, W, key):
    """Headless demo-variant path (≙ seem_model_demo.evaluate_demo +
    demo/seem's task flow): one SEEMHeadDemo forward composing the click
    (stroke) prompt with an optional reference-image VISUAL prompt, winning
    object mask by pred_maskembs @ pred_pspatials (demo_select_mask)."""
    import os

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from geopurify_tpu.models.seem import SEEMHeadDemo, demo_select_mask

    xc = cfg.xdecoder
    S = args.budget
    head = SEEMHeadDemo(
        hidden_dim=xc.hidden_dim, dim_proj=xc.hidden_dim,
        num_queries=xc.num_queries, nheads=xc.nheads,
        dim_feedforward=xc.dim_feedforward, dec_layers=xc.dec_layers,
        mask_dim=xc.mask_dim, max_spatial_tokens=S, dtype=jnp.float32,
    )
    Hm, Wm = mask_features.shape[1:3]

    def clicks_to_prompt(clicks, neg_clicks, hm, wm):
        pts = np.zeros((1, S, 2), np.float32)
        valid = np.zeros((1, S), bool)
        tags = np.ones((1, S), np.int32)
        n = 0
        for tag, spec in ((1, clicks), (-1, neg_clicks)):
            for (y, x_) in parse_clicks(spec):
                if n >= S:
                    break
                pts[0, n, 0] = min(y // 4, hm - 1) / hm
                pts[0, n, 1] = min(x_ // 4, wm - 1) / wm
                tags[0, n] = tag
                valid[0, n] = True
                n += 1
        return jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(tags)

    pts, valid, tags = clicks_to_prompt(args.clicks, args.neg_clicks, Hm, Wm)
    hvars = head.init(
        key, list(multi_scale), mask_features, text, jnp.float32(20.0),
        spatial_points=pts, spatial_valid=valid, spatial_posneg=tags,
    )

    kwargs = dict(spatial_points=pts, spatial_valid=valid, spatial_posneg=tags)
    if args.refimg:
        rimg = np.asarray(Image.open(args.refimg).convert("RGB")).astype(np.float32)
        div = xc.size_divisibility
        rh, rw = rimg.shape[:2]
        rx = jnp.asarray(rimg)[None] / 127.5 - 1.0
        rx = jnp.pad(rx, ((0, 0), (0, -(-rh // div) * div - rh),
                          (0, -(-rw // div) * div - rw), (0, 0)))
        rfeats = backbone.apply(bvars, rx)
        rmask_features, _, rmulti = pixdec.apply(pvars, rfeats)
        rHm, rWm = rmask_features.shape[1:3]
        rpts, rvalid, rtags = clicks_to_prompt(args.ref_clicks, "", rHm, rWm)
        bundle = head.apply(
            hvars, list(rmulti), rmask_features, text, jnp.float32(20.0),
            spatial_points=rpts, spatial_valid=rvalid, spatial_posneg=rtags,
            task="refimg",
        )
        kwargs.update(
            visual_tokens_by_level=list(bundle["src_visual_queries"]),
            visual_valid=rvalid,
            visual_query_pos=bundle["visual_query_pos"],
            visual_query_neg=bundle["visual_query_neg"],
        )

    out = head.apply(
        hvars, list(multi_scale), mask_features, text, jnp.float32(20.0),
        task="demo", **kwargs,
    )
    best, mask = demo_select_mask(
        out, prompt="visual" if (args.refimg and not args.clicks) else "spatial"
    )
    log.info("demo: winning object query %d", int(best[0]))
    mask_logits = np.asarray(mask[0, 0])
    m = 1 / (1 + np.exp(-mask_logits)) > 0.5
    mask_full = m[
        np.minimum((np.arange(H) // 4), Hm - 1)[:, None],
        np.minimum((np.arange(W) // 4), Wm - 1)[None, :],
    ]
    from geopurify_tpu.utils.visualizer2d import Visualizer2D

    overlay = (
        Visualizer2D(img.astype(np.uint8))
        .draw_binary_mask(mask_full, np.array([245, 135, 66]), text="demo")
        .get_image()
    )
    dst = args.out or (
        os.path.splitext(args.image or "synthetic")[0] + "_demo.png"
    )
    Image.fromarray(overlay).save(dst)
    log.info("wrote %s", dst)
    return dst


if __name__ == "__main__":
    main()
