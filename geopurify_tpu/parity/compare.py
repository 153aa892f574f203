"""Jax-side counterpart of parity.oracle: convert + run + diff per stage.

Each ``parity_<stage>`` runs the torch oracle (reference code, seeded random
weights), converts its state dict through utils/convert_xdecoder.py, applies
the flax rebuild to the SAME inputs, and returns {stage: (max_abs, rel)} rows.
rel = max|a-b| / max|b| — the VERDICT target is rel < 1e-4 in f32.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _diff(ours: np.ndarray, theirs: np.ndarray) -> Tuple[float, float]:
    a = np.asarray(ours, np.float32)
    b = np.asarray(theirs, np.float32)
    assert a.shape == b.shape, f"shape {a.shape} vs {b.shape}"
    d = float(np.max(np.abs(a - b))) if a.size else 0.0
    return d, d / (float(np.max(np.abs(b))) + 1e-12)


def parity_focalnet(size: str = "small") -> Dict[str, Tuple[float, float]]:
    import jax.numpy as jnp

    from geopurify_tpu.models.focalnet import FocalNet
    from geopurify_tpu.parity import oracle
    from geopurify_tpu.utils.convert_xdecoder import convert_focalnet

    kw = oracle.FOCAL_FULL if size == "full" else oracle.FOCAL_SMALL
    hw = (484, 648) if size == "full" else (64, 96)
    ref = oracle.focalnet_oracle(image_hw=hw, **kw)
    params = convert_focalnet(ref["sd"], "backbone", ref["depths"])
    model = FocalNet(
        embed_dim=kw["embed_dim"], depths=ref["depths"],
        focal_levels=(4, 4, 4, 4), focal_windows=(3, 3, 3, 3),
        dtype=jnp.float32,
    )
    outs = model.apply({"params": params}, jnp.asarray(ref["input_nhwc"]))
    return {
        f"focalnet/{k}": _diff(np.asarray(outs[k]), v)
        for k, v in ref["acts"].items()
    }


def parity_focalnet_dw(use_postln: bool = True) -> Dict[str, Tuple[float, float]]:
    """focal_dw variant (the SEEM-release FocalNet) — dw residual convs,
    post-residual norm placement, pre-norm downsample embeds."""
    import jax.numpy as jnp

    from geopurify_tpu.models.focalnet import FocalNet
    from geopurify_tpu.parity import oracle
    from geopurify_tpu.utils.convert_xdecoder import convert_focalnet

    kw = oracle.FOCAL_SMALL
    pre_norms = (False, True, True, False)
    ref = oracle.focalnet_dw_oracle(
        embed_dim=kw["embed_dim"], depths=kw["depths"],
        use_conv_embed=False, use_postln=use_postln, use_pre_norms=pre_norms,
    )
    params = convert_focalnet(ref["sd"], "backbone", ref["depths"])
    model = FocalNet(
        embed_dim=kw["embed_dim"], depths=ref["depths"],
        focal_levels=(3, 3, 3, 3), focal_windows=(9, 9, 9, 9),
        use_conv_embed=False, use_postln=use_postln,
        use_dw=True, use_pre_norms=pre_norms,
        dtype=jnp.float32,
    )
    outs = model.apply({"params": params}, jnp.asarray(ref["input_nhwc"]))
    tag = "postln" if use_postln else "preln"
    return {
        f"focalnet_dw_{tag}/{k}": _diff(np.asarray(outs[k]), v)
        for k, v in ref["acts"].items()
    }


def parity_davit(size: str = "small") -> Dict[str, Tuple[float, float]]:
    import jax.numpy as jnp

    from geopurify_tpu.models.davit import DaViT
    from geopurify_tpu.parity import oracle
    from geopurify_tpu.utils.convert_xdecoder import convert_davit

    ref = oracle.davit_oracle()
    params = convert_davit(ref["sd"], "backbone", ref["depths"])
    model = DaViT(
        embed_dims=(8, 16, 24, 32), depths=ref["depths"],
        num_heads=(2, 2, 2, 2), num_groups=(2, 2, 2, 2), window_size=4,
        dtype=jnp.float32,
    )
    outs = model.apply({"params": params}, jnp.asarray(ref["input_nhwc"]))
    return {
        f"davit/{k}": _diff(np.asarray(outs[k]), v)
        for k, v in ref["acts"].items()
    }


def parity_vit(size: str = "small") -> Dict[str, Tuple[float, float]]:
    import jax.numpy as jnp

    from geopurify_tpu.models.vit_backbone import ViTBackbone
    from geopurify_tpu.parity import oracle
    from geopurify_tpu.utils.convert_xdecoder import convert_vit

    ref = oracle.vit_oracle()
    params = convert_vit(ref["sd"], "backbone", ref["depth"])
    model = ViTBackbone(
        embed_dim=16, depth=ref["depth"], num_heads=2, patch_size=16,
        window_size=2, global_attn_indexes=(1, 3), out_dims=(8, 12, 16, 24),
        pretrain_grid=4, dtype=jnp.float32,
    )
    outs = model.apply({"params": params}, jnp.asarray(ref["input_nhwc"]))
    return {
        f"vit/{k}": _diff(np.asarray(outs[k]), v)
        for k, v in ref["acts"].items()
    }


def parity_pixel_decoder(size: str = "small") -> Dict[str, Tuple[float, float]]:
    import jax.numpy as jnp

    from geopurify_tpu.models.pixel_decoder import TransformerEncoderPixelDecoder
    from geopurify_tpu.parity import oracle
    from geopurify_tpu.utils.convert_xdecoder import convert_pixel_decoder

    if size == "full":
        kw = dict(base_hw=(121, 162), channels=(192, 384, 768, 1536),
                  conv_dim=512, mask_dim=512, enc_layers=6, nheads=8,
                  dim_feedforward=2048)
    else:
        kw = dict()
    ref = oracle.pixel_decoder_oracle(**kw)
    params = convert_pixel_decoder(
        ref["sd"], "sem_seg_head.pixel_decoder", ref["enc_layers"]
    )
    conv_dim = kw.get("conv_dim", 32)
    model = TransformerEncoderPixelDecoder(
        conv_dim=conv_dim, mask_dim=kw.get("mask_dim", 32),
        num_enc_layers=ref["enc_layers"], num_heads=kw.get("nheads", 8),
        dim_feedforward=kw.get("dim_feedforward", 64), dtype=jnp.float32,
    )
    feats = {k: jnp.asarray(v) for k, v in ref["inputs_nhwc"].items()}
    mask_features, transformer_features, multi_scale = model.apply(
        {"params": params}, feats
    )
    rows = {
        "pixel_decoder/mask_features": _diff(
            np.asarray(mask_features), ref["mask_features"]
        ),
        "pixel_decoder/transformer_features": _diff(
            np.asarray(transformer_features), ref["transformer_features"]
        ),
    }
    for i, (a, b) in enumerate(zip(multi_scale, ref["multi_scale"])):
        rows[f"pixel_decoder/multi_scale{i}"] = _diff(np.asarray(a), b)
    return rows


def parity_deform_pixel_decoder(size: str = "small") -> Dict[str, Tuple[float, float]]:
    import jax.numpy as jnp

    from geopurify_tpu.models.pixel_decoder_deform import MSDeformAttnPixelDecoder
    from geopurify_tpu.parity import oracle
    from geopurify_tpu.utils.convert_xdecoder import convert_deform_pixel_decoder

    ref = oracle.deform_pixel_decoder_oracle()
    params = convert_deform_pixel_decoder(ref["sd"], "pixdec", ref["enc_layers"])
    model = MSDeformAttnPixelDecoder(
        conv_dim=32, mask_dim=32, num_enc_layers=ref["enc_layers"],
        num_heads=2, dim_feedforward=64, dtype=jnp.float32,
    )
    feats = {k: jnp.asarray(v) for k, v in ref["inputs_nhwc"].items()}
    mf, tf, ms = model.apply({"params": params}, feats)
    ours = {"mask_features": mf, "transformer_features": tf,
            **{f"multi_scale{i}": v for i, v in enumerate(ms)}}
    return {
        f"deform_pixdec/{k}": _diff(np.asarray(ours[k]), v)
        for k, v in ref["acts"].items()
    }


def parity_head(size: str = "small") -> Dict[str, Tuple[float, float]]:
    import jax.numpy as jnp

    from geopurify_tpu.models.xdecoder import XDecoderHead
    from geopurify_tpu.parity import oracle
    from geopurify_tpu.utils.convert_xdecoder import convert_predictor

    if size == "full":
        kw = dict(base_hw=(121, 162), conv_dim=512, mask_dim=512,
                  hidden_dim=512, dim_proj=512, num_queries=201, nheads=8,
                  dim_feedforward=2048, dec_layers=9, n_text=8)
    else:
        kw = dict()
    ref = oracle.xdecoder_head_oracle(**kw)
    params = convert_predictor(
        ref["sd"], "sem_seg_head.predictor", ref["dec_layers"]
    )
    model = XDecoderHead(
        hidden_dim=kw.get("hidden_dim", 32), dim_proj=kw.get("dim_proj", 32),
        num_queries=kw.get("num_queries", 13), nheads=kw.get("nheads", 4),
        dim_feedforward=kw.get("dim_feedforward", 64),
        dec_layers=ref["dec_layers"], mask_dim=kw.get("mask_dim", 32),
        dtype=jnp.float32,
    )
    out = model.apply(
        {"params": params},
        [jnp.asarray(t) for t in ref["multi_scale_nhwc"]],
        jnp.asarray(ref["mask_features_nhwc"]),
        jnp.asarray(ref["text"]),
        jnp.float32(ref["logit_scale"]),
    )
    return {
        "head/pred_logits": _diff(np.asarray(out["pred_logits"]), ref["pred_logits"]),
        "head/cls_logits": _diff(np.asarray(out["cls_logits"]), ref["cls_logits"]),
        "head/pred_masks": _diff(np.asarray(out["pred_masks"]), ref["pred_masks"]),
        "head/mask_embed": _diff(np.asarray(out["mask_embed"]), ref["mask_embed"]),
    }


def parity_head_vlp(size: str = "small") -> Dict[str, Tuple[float, float]]:
    import jax.numpy as jnp

    from geopurify_tpu.models.xdecoder import XDecoderHead
    from geopurify_tpu.parity import oracle
    from geopurify_tpu.utils.convert_xdecoder import convert_predictor

    ref = oracle.xdecoder_vlp_oracle()
    params = convert_predictor(ref["sd"], "sem_seg_head.predictor",
                               ref["dec_layers"])
    model = XDecoderHead(
        hidden_dim=32, dim_proj=32, num_queries=13, nheads=4,
        dim_feedforward=64, dec_layers=ref["dec_layers"], mask_dim=32,
        dtype=jnp.float32,
    )
    out = model.apply(
        {"params": params},
        [jnp.asarray(t) for t in ref["multi_scale_nhwc"]],
        jnp.asarray(ref["mask_features_nhwc"]),
        jnp.asarray(ref["text"]),
        jnp.float32(ref["logit_scale"]),
        caption_tokens=jnp.asarray(ref["caption_tokens"]),
    )
    return {
        "head_vlp/pred_captionings": _diff(
            np.asarray(out["pred_captionings"]), ref["pred_captionings"]
        ),
        "head_vlp/pred_captions": _diff(
            np.asarray(out["pred_captions"]), ref["pred_captions"]
        ),
    }


def parity_head_fullsize() -> Dict[str, Tuple[float, float]]:
    """FULL-SIZE head parity despite the 0.5-threshold amplifier (VERDICT r3
    item #5): the real eval geometry (stride-4 = 121x162 of 484x648, 201
    queries, hidden 512, 9 rounds) compared PRE-threshold and with both
    implementations FORCED onto the same binarized attention masks.

    Rows:
      head_full/round{r}_masks   — per-round pre-threshold stride-4 mask
                                   logits (free-running; drift grows with r
                                   as mask-set differences compound)
      head_full/flip_frac        — (total flipped attn-mask bits, fraction)
      head_full/flip_margin      — (max, p99) of |sigmoid-0.5| of the
                                   reference's resized mask logits at flipped
                                   bits: divergence is threshold-marginal
      head_full/forced_*         — final outputs with OUR head forced onto
                                   the REFERENCE's binarized masks: the
                                   amplifier removed, full-size parity holds
    """
    import jax.numpy as jnp

    from geopurify_tpu.models.layers import resize_bicubic_antialias
    from geopurify_tpu.models.xdecoder import XDecoderHead
    from geopurify_tpu.parity import oracle
    from geopurify_tpu.utils.convert_xdecoder import convert_predictor

    kw = dict(base_hw=(121, 162), conv_dim=512, mask_dim=512,
              hidden_dim=512, dim_proj=512, num_queries=201, nheads=8,
              dim_feedforward=2048, dec_layers=9)
    ref = oracle.xdecoder_head_oracle(capture_aux=True, **kw)
    params = convert_predictor(
        ref["sd"], "sem_seg_head.predictor", ref["dec_layers"]
    )
    model = XDecoderHead(
        hidden_dim=kw["hidden_dim"], dim_proj=kw["dim_proj"],
        num_queries=kw["num_queries"], nheads=kw["nheads"],
        dim_feedforward=kw["dim_feedforward"], dec_layers=kw["dec_layers"],
        mask_dim=kw["mask_dim"], dtype=jnp.float32,
    )
    ms = [jnp.asarray(v) for v in ref["multi_scale_nhwc"]]
    mf = jnp.asarray(ref["mask_features_nhwc"])
    text = jnp.asarray(ref["text"])
    ls = jnp.float32(ref["logit_scale"])

    out = model.apply({"params": params}, ms, mf, text, ls, return_aux=True)

    rows: Dict[str, Tuple[float, float]] = {}
    L = ref["dec_layers"]
    for r in (0, 1, L // 2, L):
        rows[f"head_full/round{r}_masks"] = _diff(
            np.asarray(out["aux_masks"][r]), ref["aux_masks"][r]
        )

    # binarized attn-mask agreement + threshold-margin of flips
    h = ref["nheads"]
    tot_bits = 0
    tot_flips = 0
    flip_margins = []
    num_levels = 3
    for r in range(L):
        ref_mask = ref["attn_masks"][r]                 # [B*h, Q, HW] bool
        B = ref_mask.shape[0] // h
        ref_mask = ref_mask.reshape(B, h, *ref_mask.shape[1:])[:, 0]
        ours_mask = np.asarray(out["aux_attn"][r][:, 0])
        flips = ours_mask != ref_mask
        tot_bits += flips.size
        tot_flips += int(flips.sum())
        if flips.any():
            # reference's pre-threshold RESIZED logits at this round's level
            lvl = r % num_levels
            hsz, wsz = ref["multi_scale_nhwc"][lvl].shape[1:3]
            rl = np.asarray(resize_bicubic_antialias(
                jnp.asarray(ref["aux_masks"][r].transpose(0, 2, 3, 1)),
                (hsz, wsz),
            ).transpose(0, 3, 1, 2)).reshape(B, -1, hsz * wsz)
            margins = np.abs(1.0 / (1.0 + np.exp(-rl[flips])) - 0.5)
            flip_margins.append(margins)
    if flip_margins:
        fm = np.concatenate(flip_margins)
        rows["head_full/flip_margin"] = (
            float(fm.max()), float(np.quantile(fm, 0.99))
        )
    else:
        rows["head_full/flip_margin"] = (0.0, 0.0)
    rows["head_full/flip_frac"] = (float(tot_flips), tot_flips / tot_bits)

    # forced-mask run: our head on the REFERENCE's binarized masks
    override = []
    for r in range(L):
        m_ = ref["attn_masks"][r]
        B = m_.shape[0] // h
        override.append(jnp.asarray(m_.reshape(B, h, *m_.shape[1:])[:, 0]))
    forced = model.apply(
        {"params": params}, ms, mf, text, ls, attn_mask_override=override
    )
    Q = kw["num_queries"]
    rows["head_full/forced_pred_logits"] = _diff(
        np.asarray(forced["pred_logits"]), ref["pred_logits"]
    )
    rows["head_full/forced_pred_masks"] = _diff(
        np.asarray(forced["pred_masks"]), ref["pred_masks"]
    )
    rows["head_full/forced_mask_embed"] = _diff(
        np.asarray(forced["mask_embed"]), ref["mask_embed"]
    )
    rows["head_full/forced_cls_logits"] = _diff(
        np.asarray(forced["cls_logits"]), ref["cls_logits"]
    )
    return rows


def parity_seem(size: str = "small") -> Dict[str, Tuple[float, float]]:
    import jax.numpy as jnp

    from geopurify_tpu.models.seem import SEEMHead
    from geopurify_tpu.parity import oracle
    from geopurify_tpu.utils.convert_xdecoder import convert_seem

    ref = oracle.seem_oracle()
    params = convert_seem(ref["sd"], "seem", ref["dec_layers"])
    S = 32
    model = SEEMHead(
        hidden_dim=32, dim_proj=32, num_queries=7, nheads=4,
        dim_feedforward=64, dec_layers=ref["dec_layers"], mask_dim=32,
        max_spatial_tokens=S, num_spatial_memories=ref["num_memories"],
        max_grounding_tokens=ref["grounding_tokens"].shape[1],
        dtype=jnp.float32,
    )
    H, W = ref["pos_mask"].shape
    pts = np.zeros((1, S, 2), np.float32)
    valid = np.zeros((1, S), bool)
    tags = np.ones((1, S), np.int32)
    n = 0
    for mask, tag in ((ref["pos_mask"], 1), (ref["neg_mask"], -1)):
        ys, xs = np.nonzero(mask)
        k = len(ys)
        pts[0, n : n + k, 0] = ys / H            # nonzero/divisor convention
        pts[0, n : n + k, 1] = xs / W
        tags[0, n : n + k] = tag
        valid[0, n : n + k] = True
        n += k
    kwargs = dict(
        spatial_points=jnp.asarray(pts), spatial_valid=jnp.asarray(valid),
        spatial_posneg=jnp.asarray(tags),
        grounding_tokens=jnp.asarray(ref["grounding_tokens"]),
        grounding_valid=jnp.ones((1, ref["grounding_tokens"].shape[1]), bool),
    )
    if ref["prev_mask"] is not None:
        kwargs["prev_mask"] = jnp.asarray(ref["prev_mask"])
    out = model.apply(
        {"params": params},
        [jnp.asarray(v) for v in ref["multi_scale_nhwc"]],
        jnp.asarray(ref["mask_features_nhwc"]),
        jnp.asarray(ref["text"]),
        jnp.float32(ref["logit_scale"]),
        **kwargs,
    )
    rows = {}
    for k, v in ref["acts"].items():
        ours = np.asarray(out[k])
        if k in ("pred_pspatials", "pred_nspatials"):
            v = v.reshape(ours.shape)
        rows[f"seem/{k}"] = _diff(ours, v)
    return rows


def parity_seem_demo(size: str = "small") -> Dict[str, Tuple[float, float]]:
    """SEEM demo variant (VERDICT r3 item #8): refimg visual-prompt pass +
    the composed demo forward (stroke + grounding + audio + visual) vs the
    reference seem_demo.py under the demo ATTENTION_ARCH."""
    import jax.numpy as jnp

    from geopurify_tpu.models.seem import SEEMHeadDemo
    from geopurify_tpu.parity import oracle
    from geopurify_tpu.utils.convert_xdecoder import convert_seem

    ref = oracle.seem_demo_oracle()
    params = convert_seem(ref["sd"], "seem", ref["dec_layers"])
    S = 32
    model = SEEMHeadDemo(
        hidden_dim=32, dim_proj=32, num_queries=7, nheads=4,
        dim_feedforward=64, dec_layers=ref["dec_layers"], mask_dim=32,
        max_spatial_tokens=S,
        max_grounding_tokens=ref["grounding_tokens"].shape[1],
        max_audio_tokens=ref["audio_tokens"].shape[1],
        dtype=jnp.float32,
    )

    def prompt_arrays(pos, neg):
        H, W = pos.shape
        pts = np.zeros((1, S, 2), np.float32)
        valid = np.zeros((1, S), bool)
        tags = np.ones((1, S), np.int32)
        n = 0
        for mask, tag in ((pos, 1), (neg, -1)):
            ys, xs = np.nonzero(mask)
            k = len(ys)
            pts[0, n : n + k, 0] = ys / H
            pts[0, n : n + k, 1] = xs / W
            tags[0, n : n + k] = tag
            valid[0, n : n + k] = True
            n += k
        return jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(tags), n

    rows = {}

    # --- refimg pass: our visual bundle vs the reference's ---
    r_pts, r_valid, r_tags, r_n = prompt_arrays(ref["refimg_pos"], ref["refimg_neg"])
    bundle = model.apply(
        {"params": params},
        [jnp.asarray(v) for v in ref["multi_scale_ref_nhwc"]],
        jnp.asarray(ref["mask_features_ref_nhwc"]),
        jnp.asarray(ref["text"]), jnp.float32(ref["logit_scale"]),
        spatial_points=r_pts, spatial_valid=r_valid, spatial_posneg=r_tags,
        task="refimg",
    )
    rb = ref["visual_bundle"]
    ours_p = np.asarray(bundle["visual_query_pos"])
    ours_n = np.asarray(bundle["visual_query_neg"])
    rows["seem_demo/refimg_pos"] = _diff(ours_p, rb["visual_query_pos"].reshape(ours_p.shape))
    rows["seem_demo/refimg_neg"] = _diff(ours_n, rb["visual_query_neg"].reshape(ours_n.shape))
    for i, t in enumerate(rb["src_visual_queries"]):
        ours_t = np.asarray(bundle["src_visual_queries"][i])[:, : t.shape[1]]
        rows[f"seem_demo/refimg_tokens{i}"] = _diff(ours_t, t)

    # --- demo pass: composed prompts ---
    pts, valid, tags, _ = prompt_arrays(ref["pos_mask"], ref["neg_mask"])
    vis_valid = np.zeros((1, S), bool)
    vis_valid[0, :r_n] = True
    out = model.apply(
        {"params": params},
        [jnp.asarray(v) for v in ref["multi_scale_nhwc"]],
        jnp.asarray(ref["mask_features_nhwc"]),
        jnp.asarray(ref["text"]), jnp.float32(ref["logit_scale"]),
        spatial_points=pts, spatial_valid=valid, spatial_posneg=tags,
        grounding_tokens=jnp.asarray(ref["grounding_tokens"]),
        grounding_valid=jnp.ones((1, ref["grounding_tokens"].shape[1]), bool),
        audio_tokens=jnp.asarray(ref["audio_tokens"]),
        audio_valid=jnp.ones((1, ref["audio_tokens"].shape[1]), bool),
        visual_tokens_by_level=list(bundle["src_visual_queries"]),
        visual_valid=jnp.asarray(vis_valid),
        visual_query_pos=bundle["visual_query_pos"],
        visual_query_neg=bundle["visual_query_neg"],
        task="demo",
    )
    for k, v in ref["acts"].items():
        ours = np.asarray(out[k])
        if k in ("pred_pspatials", "pred_nspatials", "pred_pvisuals",
                 "pred_nvisuals"):
            v = v.reshape(ours.shape)
        rows[f"seem_demo/{k}"] = _diff(ours, v)
    return rows


def parity_seem_v1(size: str = "small") -> Dict[str, Tuple[float, float]]:
    rows = _parity_seem_v1_case(use_memory=True, tag="")
    # no-memory branch (different group offsets) — a regression there would
    # otherwise hide behind the memory run
    rows.update(_parity_seem_v1_case(use_memory=False, tag="nomem/"))
    return rows


def _parity_seem_v1_case(use_memory: bool, tag: str) -> Dict[str, Tuple[float, float]]:
    import jax.numpy as jnp

    from geopurify_tpu.models.seem import SEEMHeadV1
    from geopurify_tpu.parity import oracle
    from geopurify_tpu.utils.convert_xdecoder import convert_seem

    ref = oracle.seem_v1_oracle(use_memory=use_memory)
    params = convert_seem(ref["sd"], "seem", ref["dec_layers"])
    S = 32
    NM = ref["n_masks"]
    # one EXTRA padded grounding slot on the jax side: invalid-slot key
    # blocking must be output-invisible vs the unpadded reference
    G = ref["grounding_tokens"].shape[1]
    model = SEEMHeadV1(
        hidden_dim=32, dim_proj=32, num_queries=7, nheads=4,
        dim_feedforward=64, dec_layers=ref["dec_layers"], mask_dim=32,
        max_spatial_tokens=S, num_spatial_memories=ref["num_memories"],
        sample_size=ref["sample_size"],
        max_grounding_tokens=G + 1,
        dtype=jnp.float32,
    )
    H, W = ref["pos_mask"].shape[1:]
    pts = np.zeros((1, S, 2), np.float32)
    valid = np.zeros((1, S), bool)
    tags = np.ones((1, S), np.int32)
    mids = np.zeros((1, S), np.int32)
    n = 0
    for masks, tag in ((ref["pos_mask"], 1), (ref["neg_mask"], -1)):
        for mid in range(NM):
            ys, xs = np.nonzero(masks[mid])
            k = len(ys)
            pts[0, n : n + k, 0] = ys / H
            pts[0, n : n + k, 1] = xs / W
            tags[0, n : n + k] = tag
            mids[0, n : n + k] = mid
            valid[0, n : n + k] = True
            n += k
    gt_pad = np.concatenate(
        [ref["grounding_tokens"], np.ones((1, 1, 32), np.float32)], axis=1
    )
    gv_pad = np.concatenate([np.ones((1, G), bool), np.zeros((1, 1), bool)], 1)
    kwargs = dict(
        grounding_tokens=jnp.asarray(gt_pad),
        grounding_valid=jnp.asarray(gv_pad),
    )
    if ref["prev_mask"] is not None:
        kwargs["prev_mask"] = jnp.asarray(ref["prev_mask"])
        kwargs["memory_indices"] = jnp.asarray(ref["memory_indices"])
    out = model.apply(
        {"params": params},
        [jnp.asarray(v) for v in ref["multi_scale_nhwc"]],
        jnp.asarray(ref["mask_features_nhwc"]),
        jnp.asarray(ref["text"]),
        jnp.float32(ref["logit_scale"]),
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(tags),
        jnp.asarray(mids), jnp.asarray(ref["spatial_query_indices"]),
        num_masks=NM,
        **kwargs,
    )
    rows = {}
    for k, v in ref["acts"].items():
        if k not in out:  # oracle-only debug anchors (aux0_smasks)
            continue
        ours = np.asarray(out[k])
        if k in ("pred_pspatials", "pred_nspatials"):
            v = v.reshape(ours.shape)
        rows[f"seem_v1/{tag}{k}"] = _diff(ours, v)
    return rows


def parity_lang(size: str = "small") -> Dict[str, Tuple[float, float]]:
    import jax.numpy as jnp

    from geopurify_tpu.models.lang import LanguageEncoder
    from geopurify_tpu.parity import oracle
    from geopurify_tpu.utils.convert_xdecoder import convert_lang_encoder

    if size == "full":
        kw = dict(vocab_size=49408, width=512, layers=12, heads=8,
                  dim_proj=512, n_seq=8)
    else:
        kw = dict()
    ref = oracle.lang_transformer_oracle(**kw)
    params, _ = convert_lang_encoder(ref["sd"], "sem_seg_head.predictor.lang_encoder")
    model = LanguageEncoder(
        vocab_size=kw.get("vocab_size", 512), width=kw.get("width", 64),
        layers=ref["layers"], heads=kw.get("heads", 4),
        context_length=77, dim_proj=kw.get("dim_proj", 32),
    )
    emb = model.apply({"params": params}, jnp.asarray(ref["input_ids"]))
    return {"lang/emb": _diff(np.asarray(emb), ref["emb"])}


def parity_resize(size: str = "small") -> Dict[str, Tuple[float, float]]:
    import jax.numpy as jnp

    from geopurify_tpu.models.layers import resize_bicubic_antialias
    from geopurify_tpu.parity import oracle

    rows = {}
    # upscale (lift mask resize, affinity_module.py:527-533) and downscale
    # (attn-mask target resize, xdecoder.py:459 — antialias matters here)
    for name, in_hw, out_hw in [
        ("up", (17, 23), (64, 96)), ("down", (64, 96), (17, 23)),
    ]:
        ref = oracle.bicubic_resize_oracle(in_hw=in_hw, out_hw=out_hw)
        ours = resize_bicubic_antialias(jnp.asarray(ref["input_nhwc"]), out_hw)
        rows[f"resize/bicubic_aa_{name}"] = _diff(np.asarray(ours), ref["output_nhwc"])
    return rows


def parity_pad(size: str = "small") -> Dict[str, Tuple[float, float]]:
    import jax.numpy as jnp

    from geopurify_tpu.parity import oracle

    ref = oracle.imagelist_pad_oracle(hw=(37, 53))
    x = jnp.asarray(ref["input_hwc"])[None]
    H, W = x.shape[1:3]
    Hp, Wp = -(-H // 32) * 32, -(-W // 32) * 32
    ours = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    return {"pad/imagelist32": _diff(np.asarray(ours), ref["padded_nhwc"])}


def parity_lift(size: str = "small") -> Dict[str, Tuple[float, float]]:
    """Reference lift_xdecoder_features vs our lift_view_features + fuse_views
    + fill_unseen_points on identical stubbed teacher outputs."""
    import jax.numpy as jnp

    from geopurify_tpu.models.lift import (
        fill_unseen_points, fuse_views, lift_view_features,
    )
    from geopurify_tpu.parity import oracle

    kw = dict(num_points=200, num_views=4) if size == "full" else dict()
    ref = oracle.lift_oracle(**kw)
    N = ref["num_points"]
    V = len(ref["teacher"])
    text = ref["text"] / np.linalg.norm(ref["text"], axis=-1, keepdims=True)
    C = text.shape[1]
    n_cls = text.shape[0]
    Pv = max(int(ref["vis"][v].sum()) for v in range(V))

    vf = np.zeros((V, Pv, C), np.float32)
    vl = np.zeros((V, Pv, n_cls), np.float32)
    ids = np.full((V, Pv), N, np.int32)
    pvv = np.zeros((V, Pv), bool)
    for v in range(V):
        sel = np.where(ref["vis"][v])[0]
        t = ref["teacher"][v]
        out = lift_view_features(
            jnp.asarray(t["pred_masks"]), jnp.asarray(t["mask_embed"]),
            jnp.asarray(t["pred_logits"]),
            jnp.asarray(np.pad(ref["xl"][v, sel], (0, Pv - len(sel)))),
            jnp.asarray(np.pad(ref["yl"][v, sel], (0, Pv - len(sel)))),
            jnp.asarray(np.arange(Pv) < len(sel)),
            jnp.asarray(np.pad(ref["coords"][sel], ((0, Pv - len(sel)), (0, 0)))),
            jnp.asarray(text), jnp.float32(ref["logit_scale"]),
            tuple(ref["mask_hw"]),
        )
        vf[v] = np.asarray(out.features)
        vl[v] = np.asarray(out.logits)
        ids[v, : len(sel)] = sel
        pvv[v, : len(sel)] = True

    fused, count = fuse_views(
        jnp.asarray(vf), jnp.asarray(vl), jnp.asarray(ids), jnp.asarray(pvv), N
    )
    final = fill_unseen_points(
        fused, jnp.asarray(ref["coords"]), count, jnp.ones((N,), bool)
    )
    return {"lift/final_features": _diff(np.asarray(final), ref["final_features"])}


def _our_lift_from(ref, coords_key: str = "points"):
    """Run OUR full lift (per-view features + top-3 consensus fusion + unseen
    fill) on the oracle's recorded teacher outputs; returns [N, C] f32."""
    import jax.numpy as jnp

    from geopurify_tpu.models.lift import (
        fill_unseen_points, fuse_views, lift_view_features,
    )

    N = ref["num_points"]
    V = len(ref["teacher"])
    text = ref["text"] / np.linalg.norm(ref["text"], axis=-1, keepdims=True)
    C = text.shape[1]
    n_cls = text.shape[0]
    coords = ref[coords_key]
    Pv = max(int(ref["vis"][v].sum()) for v in range(V))

    vf = np.zeros((V, Pv, C), np.float32)
    vl = np.zeros((V, Pv, n_cls), np.float32)
    ids = np.full((V, Pv), N, np.int32)
    pvv = np.zeros((V, Pv), bool)
    for v in range(V):
        sel = np.where(ref["vis"][v])[0]
        t = ref["teacher"][v]
        out = lift_view_features(
            jnp.asarray(t["pred_masks"]), jnp.asarray(t["mask_embed"]),
            jnp.asarray(t["pred_logits"]),
            jnp.asarray(np.pad(ref["xl"][v, sel], (0, Pv - len(sel)))),
            jnp.asarray(np.pad(ref["yl"][v, sel], (0, Pv - len(sel)))),
            jnp.asarray(np.arange(Pv) < len(sel)),
            jnp.asarray(np.pad(coords[sel], ((0, Pv - len(sel)), (0, 0)))),
            jnp.asarray(text), jnp.float32(ref["logit_scale"]),
            tuple(ref["mask_hw"]),
        )
        vf[v] = np.asarray(out.features)
        vl[v] = np.asarray(out.logits)
        ids[v, : len(sel)] = sel
        pvv[v, : len(sel)] = True

    fused, count = fuse_views(
        jnp.asarray(vf), jnp.asarray(vl), jnp.asarray(ids), jnp.asarray(pvv), N
    )
    return fill_unseen_points(
        fused, jnp.asarray(coords), count, jnp.ones((N,), bool)
    )


# the Stage-2 oracle is deterministic (seeded) and ~the most expensive
# single fixture in the suite — cache it per size so mutation-sensitivity
# checks re-run only OUR pipeline against the cached reference scene
_STAGE2_ORACLE_CACHE: Dict[str, Dict] = {}


def _stage2_oracle(size: str) -> Dict:
    if size not in _STAGE2_ORACLE_CACHE:
        from geopurify_tpu.parity import oracle

        kw = dict(num_points=6000, num_views=4, box=16) if size == "full" else dict()
        _STAGE2_ORACLE_CACHE[size] = oracle.stage2_oracle(**kw)
    return _STAGE2_ORACLE_CACHE[size]


def parity_stage2(size: str = "small", mutate=None,
                  features_only: bool = False) -> Dict[str, Tuple[float, float]]:
    """COMPOSED Stage-2 parity (VERDICT r3 item #1): the reference's
    evaluate_scene + validate() prediction block (run on torch-cpu under
    runnable faiss/torch_scatter/MinkowskiEngine shims) vs OUR full pipeline
    (lift -> scatter -> student -> kNN-96 -> 19 smoothing rounds -> argmax ->
    I/U/T histograms) on the identical synthetic scene, stubbed teacher
    outputs, and converted student weights.

    Returns diff rows plus exact-match stats under special keys:
    ``stage2/pred_agree`` carries (n_disagree, frac_disagree_among_confident)
    where confident = ref logit margin > 1e-3.

    ``mutate`` (a dict of PoolingConfig overrides, e.g.
    ``{"num_iterations": 17}``) runs OUR pipeline with a deliberately wrong
    contract against the CACHED oracle scene — the mutation-sensitivity
    check that calibrated the feature tolerances
    (scripts/mutation_check_stage2.py). ``features_only`` skips everything
    but the feature-path diff (what a mutant check needs).
    """
    import dataclasses

    import jax.numpy as jnp

    from geopurify_tpu.config import GeoPurifyConfig, PoolingConfig, StudentConfig
    from geopurify_tpu.data.batch import SceneBatch
    from geopurify_tpu.models.pipeline import GeoPurifyPipeline
    from geopurify_tpu.utils.checkpoint import convert_student_checkpoint
    from geopurify_tpu.utils.metrics import intersection_and_union

    ref = _stage2_oracle(size)
    N, M = ref["num_points"], ref["num_voxels"]
    n_cls, n_ignore = ref["n_cls"], ref["n_ignore"]

    f2d = np.asarray(_our_lift_from(ref, "points"))          # [N, 512]

    student_vars = convert_student_checkpoint(ref["student_state"])
    hidden = ref["student_state"]["input_layer.0.kernel"].shape[-1]
    embed = ref["student_state"]["output_layer.kernel"].shape[-1]

    text_full = np.concatenate(
        [ref["text"], np.zeros((1, ref["text"].shape[1]), np.float32)], axis=0
    )

    def make_pipe(smooth_space: str) -> GeoPurifyPipeline:
        cfg = GeoPurifyConfig()
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(
                cfg.data, all_label=tuple(f"c{i}" for i in range(n_cls))
            ),
            student=StudentConfig(
                input_dim=512 + 6, hidden_dim=hidden, embed_dim=embed,
                num_res_blocks=4,
            ),
            pooling=PoolingConfig(**{
                **dict(knn_k=96, sharpen=20.0, num_iterations=19,
                       feature_dim=512, smooth_space=smooth_space),
                **(mutate or {}),
            }),
        )
        return GeoPurifyPipeline(
            cfg=cfg, teacher_params=None,
            text_embeddings=jnp.asarray(text_full),
            logit_scale=jnp.float32(ref["logit_scale"]),
        )

    batch = SceneBatch(
        points=jnp.asarray(ref["points"]),
        point_valid=jnp.ones((N,), bool),
        geom_feats=jnp.asarray(ref["geom"]),
        labels=jnp.asarray(ref["labels"].astype(np.int32)),
        voxel_coords=jnp.asarray(ref["voxel_coords"]),
        voxel_valid=jnp.ones((M,), bool),
        point2voxel=jnp.asarray(ref["inds_reconstruct"]),
        images=jnp.zeros((1, 8, 8, 3), jnp.uint8),
        view_valid=jnp.ones((1,), bool),
        view_point_ids=jnp.zeros((1, 8), jnp.int32),
        view_point_valid=jnp.zeros((1, 8), bool),
        view_rows=jnp.zeros((1, 8), jnp.int32),
        view_cols=jnp.zeros((1, 8), jnp.int32),
    )

    rows: Dict[str, Tuple[float, float]] = {}

    pipe_f = make_pipe("feature")
    if features_only:
        refined, _, logits_f, _ = pipe_f._pool_classify(
            student_vars, jnp.asarray(f2d), batch,
            pipe_f.text_embeddings, pipe_f.logit_scale, want_features=True,
        )
        rows["stage2/features"] = _diff(np.asarray(refined), ref["final_features"])
        rows["stage2/logits"] = _diff(np.asarray(logits_f), ref["logits"])
        return rows

    # --- pre-amplification intermediates at TIGHT tolerances ---
    voxel_in, emb, _ = pipe_f._voxel_embed(student_vars, jnp.asarray(f2d), batch)
    rows["stage2/voxel_in"] = _diff(np.asarray(voxel_in), ref["voxel_in"])
    emb_n = np.asarray(emb)
    emb_n = emb_n / np.maximum(np.linalg.norm(emb_n, axis=1, keepdims=True), 1e-12)
    rows["stage2/embed"] = _diff(emb_n, ref["embed"])

    from geopurify_tpu.ops.pooling import build_affinity_graph

    nbr, w = build_affinity_graph(
        emb, batch.voxel_coords, batch.voxel_valid, k=96, sharpen=20.0
    )
    nbr, w = np.asarray(nbr), np.asarray(w)
    o_sort = np.argsort(nbr, axis=1)
    r_sort = np.argsort(ref["knn_idx"], axis=1)
    ids_equal = np.array_equal(
        np.take_along_axis(nbr, o_sort, 1),
        np.take_along_axis(ref["knn_idx"], r_sort, 1),
    )
    # neighbor-set row carries (num_rows_differing, 0/1 flag)
    rows["stage2/knn_sets"] = (0.0 if ids_equal else float(M), 0.0 if ids_equal else 1.0)
    rows["stage2/affinity_w"] = _diff(
        np.take_along_axis(w, o_sort, 1),
        np.take_along_axis(ref["affinity_w"], r_sort, 1),
    )

    # --- feature-space path: smoothed per-point features + cosine logits ---
    refined, _, logits_f, pred_f = pipe_f._pool_classify(
        student_vars, jnp.asarray(f2d), batch,
        pipe_f.text_embeddings, pipe_f.logit_scale, want_features=True,
    )
    rows["stage2/features"] = _diff(np.asarray(refined), ref["final_features"])
    rows["stage2/logits"] = _diff(np.asarray(logits_f), ref["logits"])

    # --- logit-space path (production default): argmax predictions ---
    pipe_l = make_pipe("logit")
    _, _, logits_l, pred_l = pipe_l._pool_classify(
        student_vars, jnp.asarray(f2d), batch,
        pipe_l.text_embeddings, pipe_l.logit_scale, want_features=False,
    )
    pred_l = np.asarray(pred_l)
    pred_f = np.asarray(pred_f)

    # margin-aware argmax agreement, judged against the fp64 truth: rows
    # whose fp64 logit margin clears the measured fp32 noise must agree
    logits64 = ref["logits64"]
    part = np.partition(logits64, -2, axis=1)
    margin = part[:, -1] - part[:, -2]
    delta = max(
        float(np.max(np.abs(np.asarray(logits_f, np.float64) - logits64))),
        float(np.max(np.abs(ref["logits"].astype(np.float64) - logits64))),
    )
    confident = margin > 4.0 * delta
    nc = max(int(confident.sum()), 1)
    dis = 0
    for p in (pred_l, pred_f, ref["pred"]):
        dis = max(dis, int(((p != ref["pred64"]) & confident).sum()))
    n_tie = int((~confident).sum())
    rows["stage2/pred_agree"] = (float(n_tie), float(dis) / nc)

    i_o, u_o, t_o = intersection_and_union(
        jnp.asarray(pred_l), batch.labels, batch.point_valid,
        num_classes=n_cls,
        ignore_labels=tuple(range(n_cls, n_cls + n_ignore)),
    )
    ri, ru, rt = ref["iut"]
    rows["stage2/hist_I"] = _diff(np.asarray(i_o), ri)
    rows["stage2/hist_U"] = _diff(np.asarray(u_o), ru)
    rows["stage2/hist_T"] = _diff(np.asarray(t_o), rt)
    return rows


ALL_STAGES = {
    "pad": parity_pad,
    "resize": parity_resize,
    "lang": parity_lang,
    "focalnet": parity_focalnet,
    "focalnet_dw": parity_focalnet_dw,
    "davit": parity_davit,
    "vit": parity_vit,
    "pixel_decoder": parity_pixel_decoder,
    "deform_pixel_decoder": parity_deform_pixel_decoder,
    "head": parity_head,
    "head_vlp": parity_head_vlp,
    "seem": parity_seem,
    "seem_v1": parity_seem_v1,
    "seem_demo": parity_seem_demo,
    "lift": parity_lift,
    "stage2": parity_stage2,
}


def run_all(size: str = "small", stages=None) -> Dict[str, Tuple[float, float]]:
    rows: Dict[str, Tuple[float, float]] = {}
    for name, fn in ALL_STAGES.items():
        if stages and name not in stages:
            continue
        rows.update(fn(size))
    return rows


def parity_visual_sampler(size: str = "small") -> Dict[str, Tuple[float, float]]:
    """Visual-sampler family parity (VERDICT r4 next #4): every case from
    oracle.visual_sampler_oracle — ShapeSampler train (mixed + each shape
    forced), ShapeSampler eval (growing prompt stacks), SimpleClickSampler
    (all five modes) — replayed through data/visual_sampler.py in
    Draws.torch_compat mode after identical re-seeding. Masks must be
    BIT-EQUAL (the rng streams coincide call-for-call); rows carry
    (#mismatching cases-elements, 0/1 flag)."""
    import random as _random

    import torch

    from geopurify_tpu.data import visual_sampler as vs
    from geopurify_tpu.parity import oracle

    ref = oracle.visual_sampler_oracle()
    masks, boxes = ref["masks"], ref["boxes"]
    kw = ref["sampler_kwargs"]
    rows: Dict[str, Tuple[float, float]] = {}

    for name, case in ref["cases"].items():
        _random.seed(case["seed"])
        np.random.seed(case["seed"])
        torch.manual_seed(case["seed"])
        draws = vs.Draws.torch_compat()
        if case["kind"] == "shape_train":
            cfg = vs.StrokeSamplerConfig(
                candidate_probs=case["probs"], **kw)
            out = vs.ShapeSampler(cfg, is_train=True)(masks, boxes, draws)
        elif case["kind"] == "shape_eval":
            cfg = vs.StrokeSamplerConfig(**kw)
            out = vs.ShapeSampler(cfg, is_train=False,
                                  mode=case["mode"])(masks, boxes, draws)
        else:                                   # click
            cfg = vs.StrokeSamplerConfig(**kw)
            out = vs.SimpleClickSampler(cfg, is_train=False,
                                        mode=case["mode"])(
                masks, boxes, draws=draws)
        ok = (
            np.array_equal(out["rand_shape"].astype(bool),
                           case["rand_shape"].astype(bool))
            and np.array_equal(out["gt_masks"].astype(bool),
                               case["gt_masks"].astype(bool))
            and list(out["types"]) == list(case["types"])
        )
        n_bad = 0.0 if ok else float(
            np.sum(out["rand_shape"].astype(bool)
                   != case["rand_shape"].astype(bool))
            if out["rand_shape"].shape == case["rand_shape"].shape else -1.0
        )
        rows[f"vsampler/{name}"] = (n_bad, 0.0 if ok else 1.0)
    return rows


ALL_STAGES["visual_sampler"] = parity_visual_sampler


def parity_sonata(size: str = "small", mutate_naive=None) -> Dict[str, Tuple[float, float]]:
    """Independent Sonata cross-check (VERDICT r4 next #7): the flax
    SonataTeacher vs parity/sonata_oracle.py's de-novo naive-loop numpy
    forward (scalar Skilling Hilbert, hash-map sparse convs, per-patch
    attention loops, sorted-unique grid pooling) on IDENTICAL randomized
    parameters. Pins the attention/pooling/serialization math across
    implementations; converter layout assumptions stay real-weights-only
    (utils/convert_sonata.py docstring)."""
    import jax
    import jax.numpy as jnp

    from geopurify_tpu.models.sonata import SonataTeacher
    from geopurify_tpu.parity import sonata_oracle as so

    rng = np.random.default_rng(3)
    N, box = 400, 14
    pts = rng.integers(0, box, (N, 3)).astype(np.int32)
    valid = np.ones(N, bool)
    valid[-24:] = False

    # host voxelization (shared INPUT to both sides, not part of the check):
    # unique coords in ascending x-major lexicographic order, budget M0 = N
    M0 = N
    uniq = sorted({tuple(int(v) for v in p) for p, ok in zip(pts, valid) if ok})
    vid = {c: i for i, c in enumerate(uniq)}
    voxel_coords = np.zeros((M0, 3), np.int32)
    voxel_valid = np.zeros(M0, bool)
    for c, i in vid.items():
        voxel_coords[i] = c
        voxel_valid[i] = True
    point2voxel = np.array(
        [vid[tuple(int(v) for v in p)] if ok else M0
         for p, ok in zip(pts, valid)], np.int32)
    feats = rng.normal(0, 1, (N, 6)).astype(np.float32)

    cases = {
        # stage0 depth 4 cycles all four serialization orders; stem conv;
        # max pooling; full-concat upcast
        "maxpool_stem": dict(enc_depths=(4, 1, 1), enc_channels=(8, 12, 16),
                             enc_num_head=(2, 2, 2), enc_patch_size=(16, 16, 16),
                             stem_kernel=3, pool_reduce="max", upcast_levels=2,
                             aux_norm_affine_only=False),
        # dense embed; mean pooling; PROPAGATE upcast tail; folded-BN affine
        "meanpool_affine": dict(enc_depths=(2, 1, 1), enc_channels=(8, 12, 16),
                                enc_num_head=(2, 2, 2), enc_patch_size=(16, 16, 16),
                                stem_kernel=1, pool_reduce="mean",
                                upcast_levels=1, aux_norm_affine_only=True),
    }
    rows: Dict[str, Tuple[float, float]] = {}
    for name, kw in cases.items():
        teacher = SonataTeacher(in_channels=6, dtype=jnp.float32, **kw)
        variables = teacher.init(
            jax.random.key(0), jnp.asarray(feats), jnp.asarray(voxel_coords),
            jnp.asarray(voxel_valid), jnp.asarray(point2voxel),
            jnp.asarray(valid),
        )
        # randomize every leaf: default init leaves norms at identity, which
        # would hide scale/bias layout divergences
        prng = np.random.default_rng(11)
        params_np = jax.tree_util.tree_map(
            lambda a: prng.normal(0, 0.4, a.shape).astype(np.float32),
            jax.device_get(variables["params"]),
        )
        params = jax.tree_util.tree_map(jnp.asarray, params_np)
        ours = np.asarray(teacher.apply(
            {"params": params}, jnp.asarray(feats), jnp.asarray(voxel_coords),
            jnp.asarray(voxel_valid), jnp.asarray(point2voxel),
            jnp.asarray(valid),
        ))
        ref = so.sonata_forward_naive(
            params_np, feats, voxel_coords, voxel_valid, point2voxel, valid,
            **{**kw, **(mutate_naive or {})},
        )
        rows[f"sonata/{name}"] = _diff(ours[valid], ref[valid])
    return rows


ALL_STAGES["sonata"] = parity_sonata
