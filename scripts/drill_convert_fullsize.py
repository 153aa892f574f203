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

    # ---- the other two converters at release scale ----
    # student: MinkowskiEngine AffinityPredictor 518->512->(4 res)->128
    t0 = time.time()
    from geopurify_tpu.models.student import AffinityPredictor
    from geopurify_tpu.utils.checkpoint import convert_student_checkpoint

    srng = np.random.default_rng(1)
    ssd = {}

    def conv3(p, cin, cout):
        ssd[f"{p}.kernel"] = srng.standard_normal((27, cin, cout)).astype(np.float32)

    def bn(p, c):
        for k, v in (("weight", np.ones(c)), ("bias", np.zeros(c)),
                     ("running_mean", np.zeros(c)), ("running_var", np.ones(c))):
            ssd[f"{p}.bn.{k}"] = v.astype(np.float32)

    conv3("input_layer.0", 518, 512)
    bn("input_layer.1", 512)
    for i in range(4):
        conv3(f"res_blocks.{i}.conv1", 512, 512)
        bn(f"res_blocks.{i}.norm1", 512)
        conv3(f"res_blocks.{i}.conv2", 512, 512)
        bn(f"res_blocks.{i}.norm2", 512)
    ssd["output_layer.kernel"] = srng.standard_normal((512, 128)).astype(np.float32)
    svars = convert_student_checkpoint(ssd)
    student = AffinityPredictor()
    si = jax.eval_shape(
        student.init, key, jnp.zeros((8, 518)),
        jnp.full((8, 27), 8, jnp.int32), jnp.ones(8, bool),
    )
    import chex

    chex.assert_trees_all_equal_shapes(svars["params"], si["params"])
    sout = student.apply(
        svars, jnp.asarray(srng.standard_normal((256, 518)).astype(np.float32)),
        jnp.full((256, 27), 256, jnp.int32), jnp.ones(256, bool), train=False,
    )
    assert bool(jnp.isfinite(sout).all())
    print(f"[student]  {time.time()-t0:6.1f}s  {len(ssd)} keys -> fwd OK, "
          f"rss={rss_gb():.2f} GB", flush=True)

    # sonata: PTv3 release-ish config through the layout-sniffing converter
    t0 = time.time()
    from geopurify_tpu.config import SonataConfig
    from geopurify_tpu.models.sonata import SonataTeacher
    from geopurify_tpu.utils.convert_sonata import (
        convert_sonata_checkpoint,
        fake_sonata_state_dict,
    )

    sc = SonataConfig()
    sosd = fake_sonata_state_dict(
        tuple(sc.enc_depths), tuple(sc.enc_channels),
        in_channels=sc.in_channels, stem_kernel=sc.stem_kernel,
    )
    sovars = convert_sonata_checkpoint(sosd, sc)
    teacher = SonataTeacher(
        in_channels=sc.in_channels, enc_depths=tuple(sc.enc_depths),
        enc_channels=tuple(sc.enc_channels), enc_num_head=tuple(sc.enc_num_head),
        enc_patch_size=tuple(sc.enc_patch_size),
        upcast_levels=sc.upcast_levels, stem_kernel=sc.stem_kernel,
        pool_reduce=sc.pool_reduce,
        aux_norm_affine_only=(sc.norm == "bn_folded"),
    )
    vox = np.unique(srng.integers(0, 40, (2000, 3)), axis=0).astype(np.int32)
    vox = vox[np.lexsort((vox[:, 2], vox[:, 1], vox[:, 0]))]
    m = len(vox)
    P = 2 * m
    oargs = (
        jnp.asarray(srng.standard_normal((P, 6)).astype(np.float32)),
        jnp.asarray(vox), jnp.ones(m, bool),
        jnp.asarray(srng.integers(0, m, P).astype(np.int32)), jnp.ones(P, bool),
    )
    ti = jax.eval_shape(teacher.init, key, *oargs)
    chex.assert_trees_all_equal_shapes(sovars["params"], ti["params"])
    tout = teacher.apply(sovars, *oargs)
    assert bool(jnp.isfinite(tout).all())
    n_so = sum(int(np.prod(np.shape(v))) for v in sosd.values())
    print(f"[sonata]   {time.time()-t0:6.1f}s  {len(sosd)} keys, "
          f"{n_so/1e6:.1f}M params -> fwd OK, rss={rss_gb():.2f} GB", flush=True)

    print(f"[total]    {time.time()-t_start:6.1f}s  rss={rss_gb():.2f} GB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
