"""Full-size checkpoint-drop drill (VERDICT r3 item #10).

Proves the checkpoint-drop path works at REAL scale, not just the
small-config converter tests: synthesize a full-size torch-layout state dict
(FocalNet-L backbone [2,2,18,2] + FPN pixel decoder + 201-query head + the
12-layer/512-wide CLIP text tower — the exact key layout
utils/convert_xdecoder.py documents from the reference's
xdecoder_focall_last.pt, reference modeling/BaseModel.py:25-29), convert it
through ``convert_xdecoder_checkpoint``, load the result into
``XDecoderSegModel`` + ``LanguageEncoder``, and run one 484x648 forward +
one text-embedding pass. Reports wall/memory per phase.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/drill_convert_fullsize.py
(or on the TPU chip without the env overrides; CPU forward takes ~1-2 min)
"""

from __future__ import annotations

import resource
import sys
import time


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> int:
    t_start = time.time()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from geopurify_tpu.config import GeoPurifyConfig
    from geopurify_tpu.models.lang import LanguageEncoder
    from geopurify_tpu.models.xdecoder import XDecoderSegModel
    from geopurify_tpu.utils.convert_xdecoder import (
        convert_xdecoder_checkpoint,
        synthesize_torch_state_dict,
    )

    cfg = GeoPurifyConfig()          # full-size defaults: FocalNet-L, 484x648
    xc = cfg.xdecoder
    model = XDecoderSegModel(xc)
    key = jax.random.key(0)
    n_cls = 19
    H, W = xc.mask_shape
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    text = jnp.zeros((n_cls + 1, xc.hidden_dim), jnp.float32)

    t0 = time.time()
    xshapes = jax.eval_shape(model.init, key, img, text, jnp.float32(1.0))
    lang = LanguageEncoder(
        vocab_size=49408, width=512, layers=12, heads=8,
        context_length=77, dim_proj=512,
    )
    lshapes = jax.eval_shape(lang.init, key, jnp.zeros((1, 77), jnp.int32))
    print(f"[shapes]   {time.time()-t0:6.1f}s  rss={rss_gb():.2f} GB", flush=True)

    t0 = time.time()
    sd = synthesize_torch_state_dict(xshapes["params"], lshapes["params"])
    n_params = sum(int(np.prod(v.shape)) for v in sd.values())
    print(f"[synth sd] {time.time()-t0:6.1f}s  {len(sd)} keys, "
          f"{n_params/1e6:.1f}M params, rss={rss_gb():.2f} GB", flush=True)

    t0 = time.time()
    out = convert_xdecoder_checkpoint(
        sd, depths=tuple(xc.backbone.depths),
        enc_layers=xc.enc_layers, dec_layers=xc.dec_layers,
    )
    print(f"[convert]  {time.time()-t0:6.1f}s  rss={rss_gb():.2f} GB", flush=True)

    # structural load check: converted tree must match the model's init
    # shapes EXACTLY (this is what BaseModel.from_pretrained's fuzzy
    # alignment guarantees on the reference side)
    t0 = time.time()
    import chex

    chex.assert_trees_all_equal_shapes(out["xdecoder"]["params"], xshapes["params"])
    chex.assert_trees_all_equal_shapes(out["lang"]["params"], lshapes["params"])
    print(f"[shape-chk]{time.time()-t0:6.1f}s  OK", flush=True)

    # one full-size forward with the CONVERTED weights
    t0 = time.time()
    rng = np.random.default_rng(0)
    real_img = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    fwd = jax.jit(lambda p, i, t: model.apply(p, i, t, jnp.float32(20.0)))
    outs = fwd({"params": out["xdecoder"]["params"]}, real_img, text)
    jax.block_until_ready(outs["pred_logits"])
    print(f"[forward]  {time.time()-t0:6.1f}s  "
          f"pred_masks {tuple(outs['pred_masks'].shape)}, "
          f"finite={bool(jnp.isfinite(outs['pred_logits']).all())}, "
          f"rss={rss_gb():.2f} GB", flush=True)

    # text tower with converted weights (prompt-template path)
    t0 = time.time()
    ids = jnp.asarray(rng.integers(0, 49408, (4, 77)), jnp.int32)
    emb = jax.jit(lang.apply)({"params": out["lang"]["params"]}, ids)
    jax.block_until_ready(emb)
    print(f"[lang fwd] {time.time()-t0:6.1f}s  emb {tuple(np.shape(emb))}, "
          f"rss={rss_gb():.2f} GB", flush=True)

    print(f"[total]    {time.time()-t_start:6.1f}s  rss={rss_gb():.2f} GB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
