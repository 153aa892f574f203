"""Checkpoint-parity harness — torch reference vs converted JAX model.

SURVEY §7 names X-Decoder numerical parity the #2 project risk ("each
[resize/padding/threshold detail] is a silent mIoU killer; need per-stage
activation diffing against PyTorch"). This tool does that diffing once the
released checkpoints are available (they are not bundled in this repo or CI):

1. loads `xdecoder_focall_last.pt`, converts it (utils/convert_xdecoder.py),
   and runs OUR XDecoderSegModel on a fixed input;
2. if --reference-path points at a GeoPurify checkout with its dependencies
   installed, runs the torch model on the same input and reports per-stage
   max/mean absolute differences (backbone res2..res5, mask_features,
   pred_logits, pred_masks, text embeddings);
3. otherwise dumps OUR activations to .npz so a torch-side run elsewhere can
   produce the counterpart file, and compares two such dumps.

Usage:
  python -m geopurify_tpu.run.parity --ckpt xdecoder_focall_last.pt \
      [--reference-path /path/to/GeoPurify] [--dump ours.npz] [--compare theirs.npz]
"""

from __future__ import annotations

import argparse
import logging
import sys

import numpy as np

log = logging.getLogger("geopurify.parity")

STAGES = ["res2", "res3", "res4", "res5", "mask_features", "pred_logits",
          "pred_masks", "mask_embed"]


def run_ours(ckpt_path: str, image: np.ndarray, class_names):
    import jax
    import jax.numpy as jnp

    from geopurify_tpu.config import GeoPurifyConfig
    from geopurify_tpu.models.xdecoder import XDecoderSegModel
    from geopurify_tpu.utils.checkpoint import load_torch_state_dict
    from geopurify_tpu.utils.convert_xdecoder import convert_xdecoder_checkpoint

    cfg = GeoPurifyConfig()
    sd = load_torch_state_dict(ckpt_path)
    conv = convert_xdecoder_checkpoint(sd)
    model = XDecoderSegModel(cfg.xdecoder)

    # text embeddings through the converted language tower
    from geopurify_tpu.models.lang import (
        LanguageEncoder, build_tokenizer, embed_class_names,
    )

    tc = cfg.text
    lang = LanguageEncoder(vocab_size=tc.vocab_size, width=tc.width,
                           layers=tc.layers, heads=tc.heads,
                           context_length=tc.context_length, dim_proj=tc.dim_proj)
    tk = build_tokenizer(tc.tokenizer_vocab, tc.context_length)
    text = jnp.asarray(embed_class_names(
        lambda v, i: lang.apply(v, i), conv["lang"], tk, list(class_names),
        use_templates=cfg.text.prompt_eng, template=cfg.text.prompt_template,
    ))
    logit_scale = jnp.float32(conv["logit_scale"])

    out = model.apply(
        conv["xdecoder"], jnp.asarray(image)[None], text, logit_scale
    )
    acts = {
        "pred_logits": np.asarray(out["pred_logits"], np.float32),
        "pred_masks": np.asarray(out["pred_masks"], np.float32),
        "mask_embed": np.asarray(out["mask_embed"], np.float32),
        "text": np.asarray(text, np.float32),
    }
    return acts


def compare(ours: dict, theirs: dict) -> int:
    worst = 0.0
    for k in sorted(set(ours) & set(theirs)):
        a, b = np.asarray(ours[k]), np.asarray(theirs[k])
        if a.shape != b.shape:
            print(f"{k}: SHAPE MISMATCH {a.shape} vs {b.shape}")
            worst = np.inf
            continue
        d = np.abs(a - b)
        rel = d.max() / (np.abs(b).max() + 1e-9)
        print(f"{k}: max|d|={d.max():.3e} mean|d|={d.mean():.3e} rel={rel:.3e}")
        worst = max(worst, rel)
    status = 0 if worst < 5e-2 else 1
    print(f"parity: {'OK' if status == 0 else 'FAIL'} (worst rel {worst:.3e})")
    return status


def run_torch_oracle(size: str, stages=None, report_path=None) -> int:
    """Stagewise activation parity vs the mounted reference torch code with
    seeded random weights (no checkpoint needed) — see parity/compare.py."""
    from geopurify_tpu.parity.compare import run_all

    rows = run_all(size, stages)
    tol = 1e-4
    # composed-Stage-2 rows past the sharpen-x20 softmax carry its measured
    # amplification of honest fp32 rounding (see tests/test_torch_parity.py::
    # test_parity_stage2_end_to_end); pred_agree/knn_sets are exact-count
    # rows whose second element must be 0
    special_tol = {
        # mutation-calibrated (tests/test_torch_parity.py docstring):
        # honest fp noise rel ~1e-2, known mutants >= 3.3e-2
        "stage2/features": 2e-2, "stage2/logits": 2e-2,
        "stage2/pred_agree": 1e-12, "stage2/knn_sets": 1e-12,
    }
    # histogram rows are exact-count diffs bounded by the sub-noise-margin
    # row count (pred_agree's first element) — a real regression moves them
    # far beyond it (r4 review: an inf tolerance made these rows vacuous)
    n_tie = rows.get("stage2/pred_agree", (0.0, 0.0))[0]
    for h in ("stage2/hist_I", "stage2/hist_U", "stage2/hist_T"):
        special_tol[h] = None      # judged on max|d| vs n_tie below
    lines = [f"{'stage':40s} {'max|d|':>12s} {'rel':>12s}  verdict"]
    worst = 0.0
    any_fail = False
    for name, (mx, rel) in rows.items():
        t = special_tol.get(name, tol)
        if name not in special_tol:
            worst = max(worst, rel)
        ok = (mx <= n_tie) if t is None else (rel <= t)
        any_fail = any_fail or not ok
        lines.append(
            f"{name:40s} {mx:12.3e} {rel:12.3e}  {'OK' if ok else 'FAIL'}"
        )
    lines.append(f"worst rel: {worst:.3e}  (target < {tol:g} f32)")
    text = "\n".join(lines)
    print(text)
    if report_path:
        with open(report_path, "w") as f:
            f.write(
                f"# Torch-oracle activation parity ({size})\n\n"
                "Reference modules (mounted at /root/reference, seeded random\n"
                "weights, torch-2.x cpu) vs the flax rebuild through\n"
                "utils/convert_xdecoder.py. rel = max|a-b| / max|b|.\n\n"
                "```\n" + text + "\n```\n\n"
                "## Known amplifier: the 0.5 attention-mask binarization\n\n"
                "At full size the query decoder thresholds ~200x19602\n"
                "sigmoid(mask) values at 0.5 every round (xdecoder.py:459-463).\n"
                "With seeded RANDOM weights, borderline pixels flip on f32\n"
                "reduction-order noise (~1e-5 for 19602-wide contractions,\n"
                "jax-CPU vs torch-MKL), and each flip perturbs downstream\n"
                "rounds discretely. Measured (r3 probes, dec_layers=3 full\n"
                "width): a 1e-5 threshold shift INSIDE one implementation\n"
                "moves pred_logits by rel 3.5e-1 — 25x the torch-vs-jax gap\n"
                "(1.4e-2) — while the pre-binarization path (dec_layers=1) is\n"
                "at 2.5e-5, pure matmul noise. The head stages above the\n"
                "1e-4 bar at FULL size are this amplification, not layout\n"
                "errors: every stage is exact at small size, and mask/embed\n"
                "paths track to 1e-6 before binarization feedback.\n"
            )
        log.info("report written to %s", report_path)
    # any_fail covers the special_tol rows (composed Stage-2) which `worst`
    # deliberately excludes — previously those rows could print FAIL while
    # the command exited 0 (ADVICE r4), defeating the calibrated gates
    return 0 if (worst < tol and not any_fail) else 1


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--torch-oracle", default=None, choices=["small", "full"],
                        help="stagewise parity vs the mounted reference torch "
                             "code with seeded random weights (no ckpt needed)")
    parser.add_argument("--stages", default=None,
                        help="comma list: pad,resize,lang,focalnet,pixel_decoder,head,lift,stage2,visual_sampler,sonata,... (parity/compare.ALL_STAGES)")
    parser.add_argument("--report", default=None, help="write markdown report here")
    parser.add_argument("--image", default=None, help=".npy HxWx3 float 0..255")
    parser.add_argument("--classes", default="wall,floor,chair,table,door")
    parser.add_argument("--dump", default=None)
    parser.add_argument("--compare", default=None, help="torch-side .npz dump")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if args.torch_oracle:
        # activation parity is a LAYOUT/SEMANTICS check: run the jax side in
        # exact f32 on CPU. (The axon TPU plugin ignores JAX_PLATFORMS alone —
        # the config knob is authoritative; on TPU the default matmul
        # precision is bf16-class and every deep stage drifts to ~1e-2 rel.)
        import os

        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
        stages = args.stages.split(",") if args.stages else None
        sys.exit(run_torch_oracle(args.torch_oracle, stages, args.report))
    if not args.ckpt:
        parser.error("--ckpt is required unless --torch-oracle is given")

    if args.image:
        image = np.load(args.image).astype(np.float32)
    else:
        rng = np.random.default_rng(0)
        image = rng.uniform(0, 255, (484, 648, 3)).astype(np.float32)

    acts = run_ours(args.ckpt, image, args.classes.split(","))
    if args.dump:
        np.savez_compressed(args.dump, **acts)
        log.info("dumped %d activations to %s", len(acts), args.dump)
    if args.compare:
        theirs = dict(np.load(args.compare))
        sys.exit(compare(acts, theirs))


if __name__ == "__main__":
    main()
