"""2D open-vocabulary semantic segmentation inference — single images.

Rebuild of the reference's standalone X-Decoder inference entry
(reference third_party/X-Decoder/xdecoder/inference/xdecoder/infer_semseg.py:
41-60): load an image, run the seg model, argmax per-pixel class from the
mask/class predictions, and write a palette overlay. Here it doubles as the
qualitative sanity check for converted teacher checkpoints (xdecoder.ckpt).

Usage:
  python -m geopurify_tpu.run.infer2d --image photo.jpg \
      --classes "wall,floor,chair" [xdecoder.ckpt=...] [--out overlay.png]
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

log = logging.getLogger("geopurify.infer2d")


def semseg_from_outputs(pred_logits, pred_masks, out_hw):
    """Per-pixel class map from query predictions (infer_semseg.py semantics):
    sem_map[c] = sum_q softmax(cls)_qc * sigmoid(mask)_q, argmax over classes."""
    import jax
    import jax.numpy as jnp

    from geopurify_tpu.models.layers import resize_bicubic_antialias

    probs = jax.nn.softmax(pred_logits, axis=-1)            # [Q, n_cls]
    masks = jax.nn.sigmoid(pred_masks)                      # [Q, h, w]
    sem = jnp.einsum("qc,qhw->chw", probs, masks)           # [n_cls, h, w]
    sem = resize_bicubic_antialias(
        sem.transpose(1, 2, 0)[None], tuple(out_hw)
    )[0]                                                    # [H, W, n_cls]
    return jnp.argmax(sem, axis=-1)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", required=True)
    parser.add_argument("--classes", required=True,
                        help="comma-separated open-vocab class names")
    parser.add_argument("--preset", default="scannet")
    parser.add_argument("--out", default=None, help="overlay png (default: <image>_seg.png)")
    parser.add_argument("--alpha", type=float, default=0.5)
    parser.add_argument("--rich-overlay", action="store_true",
                        help="detectron2-style drawing: boundaries + label "
                             "text at region centers (utils/visualizer2d.py)")
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

    classes = [c.strip() for c in args.classes.split(",") if c.strip()]
    cfg = load_config(args.preset, overrides=args.overrides)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, all_label=tuple(classes))
    )
    pipeline, _ = build_pipeline(
        cfg, jax.random.key(0), require_teachers=True
    )

    img = np.asarray(Image.open(args.image).convert("RGB")).astype(np.float32)
    H, W = img.shape[:2]
    mh, mw = cfg.xdecoder.mask_shape
    # resize to the model's working resolution (nearest keeps it simple;
    # the overlay is emitted at working resolution)
    ri = (np.arange(mh) * (H / mh)).astype(np.int64)
    ci = (np.arange(mw) * (W / mw)).astype(np.int64)
    work = img[ri][:, ci]

    out = pipeline.xdecoder.apply(
        pipeline.teacher_params, jnp.asarray(work)[None],
        pipeline.text_embeddings, pipeline.logit_scale,
    )
    # text includes a trailing background row — drop it like the lift does
    seg = semseg_from_outputs(
        out["pred_logits"][0][:, : len(classes)], out["pred_masks"][0], (mh, mw)
    )
    seg_np = np.asarray(seg)
    if args.rich_overlay:
        # detectron2-style drawing: region fills + boundaries + label text
        # (utils/visualizer2d.py ≙ reference utils/visualizer.py:447-482)
        from geopurify_tpu.utils.visualizer2d import Visualizer2D

        overlay = (
            Visualizer2D(work.astype(np.uint8), class_names=classes)
            .draw_sem_seg(seg_np, alpha=args.alpha)
            .get_image()
        )
    else:
        overlay = overlay_2d_semantic(work, seg_np, num_classes=len(classes),
                                      alpha=args.alpha)
    dst = args.out or os.path.splitext(args.image)[0] + "_seg.png"
    Image.fromarray(overlay).save(dst)
    counts = {classes[c]: int((seg_np == c).sum()) for c in range(len(classes))}
    log.info("class pixel counts: %s", counts)
    log.info("wrote %s", dst)
    return dst


if __name__ == "__main__":
    main()
