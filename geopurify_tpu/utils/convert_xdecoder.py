"""Released X-Decoder checkpoint (torch) -> flax variables.

Maps `xdecoder_focall_last.pt` (reference third_party/X-Decoder;
GeneralizedXdecoder state_dict) onto our XDecoderSegModel + LanguageEncoder
trees. Torch key structure pinned from the reference modules:

- backbone: D2FocalNet — ``backbone.patch_embed.*``,
  ``backbone.layers.{i}.blocks.{j}.{norm1,modulation.{f,h,focal_layers.{l}.0,
  proj[,ln]},norm2,mlp.{fc1,fc2},gamma_1,gamma_2}``,
  ``backbone.layers.{i}.downsample.proj/norm``, ``backbone.norm{i}``
  (modeling/vision/backbone/focal.py:31-330).
- pixel decoder: ``sem_seg_head.pixel_decoder.{input_proj,transformer.encoder.
  layers.{i}.*,adapter_{n},layer_{n},mask_features}``
  (modeling/vision/encoder/transformer_encoder_fpn.py:46-257).
- predictor: ``sem_seg_head.predictor.{query_feat,query_embed,level_embed,
  class_embed,mask_embed.layers.{i},decoder_norm,
  transformer_{self,cross}_attention_layers.{i},transformer_ffn_layers.{i}}``
  (modeling/interface/xdecoder.py:25-190).
- language: ``sem_seg_head.predictor.lang_encoder.{logit_scale,lang_proj,
  lang_encoder.{token_embedding,positional_embedding,resblocks.{i}.*,
  ln_final}}`` (modeling/language/vlpencoder.py:36-39,
  LangEncoder/transformer.py:81-210).

Tensor-layout transforms: torch Linear [out,in] -> flax kernel [in,out];
Conv2d OIHW -> HWIO; depthwise Conv2d [C,1,kh,kw] -> [kh,kw,1,C];
nn.MultiheadAttention packed in_proj [3C,C] -> split q/k/v kernels;
LayerNorm weight -> scale.

No released checkpoint ships in this environment; completeness of the mapping
is pinned structurally in tests (synthetic state dict with the exact torch key
set, converted tree must match our init tree shape-for-shape).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

Array = np.ndarray
SD = Dict[str, Array]


class MissingKeys(KeyError):
    pass


def _get(sd: SD, key: str) -> Array:
    if key not in sd:
        raise MissingKeys(key)
    return np.asarray(sd[key])


def _lin(sd: SD, prefix: str) -> Dict[str, Array]:
    out = {"kernel": _get(sd, f"{prefix}.weight").T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _get(sd, f"{prefix}.bias")
    return out


def _conv(sd: SD, prefix: str, depthwise: bool = False) -> Dict[str, Array]:
    w = _get(sd, f"{prefix}.weight")            # OIHW
    if depthwise:
        w = w.transpose(2, 3, 1, 0)             # [kh,kw,1,C]
    else:
        w = w.transpose(2, 3, 1, 0)             # HWIO
    out = {"kernel": w}
    if f"{prefix}.bias" in sd:
        out["bias"] = _get(sd, f"{prefix}.bias")
    return out


def _ln(sd: SD, prefix: str) -> Dict[str, Array]:
    return {"scale": _get(sd, f"{prefix}.weight"), "bias": _get(sd, f"{prefix}.bias")}


def _mha(sd: SD, prefix: str) -> Dict[str, Array]:
    """torch nn.MultiheadAttention -> our MultiHeadAttention(q/k/v/out_proj)."""
    w = _get(sd, f"{prefix}.in_proj_weight")    # [3C, C]
    b = _get(sd, f"{prefix}.in_proj_bias")      # [3C]
    C = w.shape[1]
    qw, kw, vw = w[:C], w[C: 2 * C], w[2 * C:]
    qb, kb, vb = b[:C], b[C: 2 * C], b[2 * C:]
    return {
        "q_proj": {"kernel": qw.T, "bias": qb},
        "k_proj": {"kernel": kw.T, "bias": kb},
        "v_proj": {"kernel": vw.T, "bias": vb},
        "out_proj": _lin(sd, f"{prefix}.out_proj"),
    }


def _conv_gn(sd: SD, prefix: str) -> Dict[str, Array]:
    """detectron2 Conv2d with GroupNorm child (adapter_/layer_ convs)."""
    out: Dict[str, Any] = {"conv": _conv(sd, prefix)}
    if f"{prefix}.norm.weight" in sd:
        out["norm"] = {
            "scale": _get(sd, f"{prefix}.norm.weight"),
            "bias": _get(sd, f"{prefix}.norm.bias"),
        }
    return out


# ---------------------------------------------------------------------------


def convert_focalnet(sd: SD, prefix: str, depths) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    p["patch_embed"] = {
        "proj": _conv(sd, f"{prefix}.patch_embed.proj"),
        "norm": _ln(sd, f"{prefix}.patch_embed.norm"),
    }
    import jax

    for i, depth in enumerate(depths):
        blocks = []
        for j in range(depth):
            bp = f"{prefix}.layers.{i}.blocks.{j}"
            blk: Dict[str, Any] = {
                "norm1": _ln(sd, f"{bp}.norm1"),
                "norm2": _ln(sd, f"{bp}.norm2"),
                "mlp": {"fc1": _lin(sd, f"{bp}.mlp.fc1"), "fc2": _lin(sd, f"{bp}.mlp.fc2")},
            }
            mod: Dict[str, Any] = {
                "f": _lin(sd, f"{bp}.modulation.f"),
                "h": _conv(sd, f"{bp}.modulation.h"),
                "proj": _lin(sd, f"{bp}.modulation.proj"),
            }
            level = 0
            while f"{bp}.modulation.focal_layers.{level}.0.weight" in sd:
                mod[f"focal_layers{level}"] = _conv(
                    sd, f"{bp}.modulation.focal_layers.{level}.0", depthwise=True
                )
                level += 1
            if f"{bp}.modulation.ln.weight" in sd:
                mod["ln"] = _ln(sd, f"{bp}.modulation.ln")
            blk["modulation"] = mod
            if f"{bp}.gamma_1" in sd:
                blk["gamma_1"] = _get(sd, f"{bp}.gamma_1")
                blk["gamma_2"] = _get(sd, f"{bp}.gamma_2")
            # focal_dw variant (vision/backbone/focal_dw.py): per-block
            # depthwise residual convs
            if f"{bp}.dw1.weight" in sd:
                blk["dw1"] = _conv(sd, f"{bp}.dw1", depthwise=True)
                blk["dw2"] = _conv(sd, f"{bp}.dw2", depthwise=True)
            blocks.append(blk)
        # stack per-block subtrees along a leading depth axis — the layout of
        # the scanned stage (models/focalnet.FocalNet: layers{i}_blocks/block)
        p[f"layers{i}_blocks"] = {
            "block": jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]), *blocks
            )
        }
        if f"{prefix}.layers.{i}.downsample.proj.weight" in sd:
            ds: Dict[str, Any] = {"proj": _conv(sd, f"{prefix}.layers.{i}.downsample.proj")}
            if f"{prefix}.layers.{i}.downsample.norm.weight" in sd:
                ds["norm"] = _ln(sd, f"{prefix}.layers.{i}.downsample.norm")
            p[f"layers{i}_downsample"] = ds
        if f"{prefix}.norm{i}.weight" in sd:
            p[f"norm{i}"] = _ln(sd, f"{prefix}.norm{i}")
    return p


def convert_davit(sd: SD, prefix: str, depths) -> Dict[str, Any]:
    """torch DaViT (vision/backbone/davit.py:320-560) -> models/davit.DaViT.

    Key map (the reference's own _try_remap_keys, davit.py:461-477, documents
    the canonical names): convs.{s} -> patch_embed{s}/embed_norm{s};
    blocks.{s}.{j}.{spatial,channel}_block.{conv1,conv2}.fn.dw -> the cpe
    depthwise convs; .{window,channel}_attn.{norm,fn.qkv,fn.proj} and
    .ffn.{norm,fn.net.fc1/fc2} -> the pre-norm attention/MLP pairs."""
    p: Dict[str, Any] = {}
    for s, depth in enumerate(depths):
        p[f"patch_embed{s}"] = _conv(sd, f"{prefix}.convs.{s}.proj")
        p[f"embed_norm{s}"] = _ln(sd, f"{prefix}.convs.{s}.norm")
        for j in range(depth):
            blk: Dict[str, Any] = {}
            for tag, ref in (("s", "spatial_block"), ("c", "channel_block")):
                bp = f"{prefix}.blocks.{s}.{j}.{ref}"
                attn = "window_attn" if ref == "spatial_block" else "channel_attn"
                blk[f"{tag}_cpe1"] = {"dw": _conv(sd, f"{bp}.conv1.fn.dw", depthwise=True)}
                blk[f"{tag}_norm1"] = _ln(sd, f"{bp}.{attn}.norm")
                blk[f"{tag}_attn"] = {
                    "qkv": _lin(sd, f"{bp}.{attn}.fn.qkv"),
                    "proj": _lin(sd, f"{bp}.{attn}.fn.proj"),
                }
                blk[f"{tag}_cpe2"] = {"dw": _conv(sd, f"{bp}.conv2.fn.dw", depthwise=True)}
                blk[f"{tag}_norm2"] = _ln(sd, f"{bp}.ffn.norm")
                blk[f"{tag}_mlp_fc1"] = _lin(sd, f"{bp}.ffn.fn.net.fc1")
                blk[f"{tag}_mlp_fc2"] = _lin(sd, f"{bp}.ffn.fn.net.fc2")
            p[f"stage{s}_block{j}"] = blk
    return p


def _convt(sd: SD, prefix: str) -> Dict[str, Array]:
    """torch ConvTranspose2d [in,out,kh,kw] -> flax ConvTranspose [kh,kw,in,out].

    torch's transposed conv is the GRADIENT of a conv (kernels spatially
    flipped relative to the fractionally-strided correlation flax computes) —
    the spatial flip below is required for value equality (A/B-tested; the
    unflipped layout is ~0.85 abs off on a random 2x2-stride-2 kernel)."""
    w = _get(sd, f"{prefix}.weight").transpose(2, 3, 0, 1)[::-1, ::-1]
    out = {"kernel": np.ascontiguousarray(w)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _get(sd, f"{prefix}.bias")
    return out


def _gn(sd: SD, prefix: str) -> Dict[str, Array]:
    return {"scale": _get(sd, f"{prefix}.weight"), "bias": _get(sd, f"{prefix}.bias")}


def convert_vit(sd: SD, prefix: str, depth: int) -> Dict[str, Any]:
    """torch D2ViT / ImageEncoderViT + SimpleFPN (vision/backbone/vit.py:
    26-577) -> models/vit_backbone.ViTBackbone. The SimpleFPN Sequential
    indices (vit.py:406-445) map onto the named flax convs/norms."""
    p: Dict[str, Any] = {
        "patch_embed": _conv(sd, f"{prefix}.patch_embed.proj"),
        "pos_embed": _get(sd, f"{prefix}.pos_embed")[0],   # [1,g,g,C] -> [g,g,C]
    }
    for i in range(depth):
        bp = f"{prefix}.blocks.{i}"
        blk: Dict[str, Any] = {
            "norm1": _ln(sd, f"{bp}.norm1"),
            "norm2": _ln(sd, f"{bp}.norm2"),
            "attn": {
                "qkv": _lin(sd, f"{bp}.attn.qkv"),
                "proj": _lin(sd, f"{bp}.attn.proj"),
            },
            "mlp_fc1": _lin(sd, f"{bp}.mlp.lin1"),
            "mlp_fc2": _lin(sd, f"{bp}.mlp.lin2"),
        }
        if f"{bp}.attn.rel_pos_h" in sd:
            blk["attn"]["rel_pos_h"] = _get(sd, f"{bp}.attn.rel_pos_h")
            blk["attn"]["rel_pos_w"] = _get(sd, f"{bp}.attn.rel_pos_w")
        p[f"block{i}"] = blk
    n = f"{prefix}.neck"
    p["neck"] = {
        "d4_up1": _convt(sd, f"{n}.down_4.0"), "d4_gn1": _gn(sd, f"{n}.down_4.1"),
        "d4_up2": _convt(sd, f"{n}.down_4.3"), "d4_gn2": _gn(sd, f"{n}.down_4.4"),
        "d4_out": _conv(sd, f"{n}.down_4.5"), "d4_gn3": _gn(sd, f"{n}.down_4.6"),
        "d8_up": _convt(sd, f"{n}.down_8.0"), "d8_gn1": _gn(sd, f"{n}.down_8.1"),
        "d8_out": _conv(sd, f"{n}.down_8.2"), "d8_gn2": _gn(sd, f"{n}.down_8.3"),
        "d16_out": _conv(sd, f"{n}.down_16.0"), "d16_gn": _gn(sd, f"{n}.down_16.1"),
        "d32_down": _conv(sd, f"{n}.down_32.0"), "d32_gn1": _gn(sd, f"{n}.down_32.1"),
        "d32_out": _conv(sd, f"{n}.down_32.2"), "d32_gn2": _gn(sd, f"{n}.down_32.3"),
    }
    return p


def convert_deform_pixel_decoder(sd: SD, prefix: str, enc_layers: int) -> Dict[str, Any]:
    """torch MSDeformAttnPixelDecoder (transformer_encoder_deform.py:164-368)
    -> models/pixel_decoder_deform.MSDeformAttnPixelDecoder. input_proj is a
    plain Conv2d(bias)+GN Sequential; adapter_1/layer_1 are detectron2
    norm-convs; the transformer carries level_embed + per-layer MSDeformAttn
    linears."""
    p: Dict[str, Any] = {
        "level_embed": _get(sd, f"{prefix}.transformer.level_embed"),
        "mask_features": _conv(sd, f"{prefix}.mask_features"),
        "adapter_1": _conv_gn(sd, f"{prefix}.adapter_1"),
        "layer_1": _conv_gn(sd, f"{prefix}.layer_1"),
    }
    i = 0
    while f"{prefix}.input_proj.{i}.0.weight" in sd:
        p[f"input_proj{i}"] = {
            "conv": _conv(sd, f"{prefix}.input_proj.{i}.0"),
            "norm": _gn(sd, f"{prefix}.input_proj.{i}.1"),
        }
        i += 1
    for j in range(enc_layers):
        lp = f"{prefix}.transformer.encoder.layers.{j}"
        p[f"encoder_layer{j}"] = {
            "value_proj": _lin(sd, f"{lp}.self_attn.value_proj"),
            "sampling_offsets": _lin(sd, f"{lp}.self_attn.sampling_offsets"),
            "attention_weights": _lin(sd, f"{lp}.self_attn.attention_weights"),
            "output_proj": _lin(sd, f"{lp}.self_attn.output_proj"),
            "norm1": _ln(sd, f"{lp}.norm1"),
            "linear1": _lin(sd, f"{lp}.linear1"),
            "linear2": _lin(sd, f"{lp}.linear2"),
            "norm2": _ln(sd, f"{lp}.norm2"),
        }
    return p


def convert_pixel_decoder(sd: SD, prefix: str, enc_layers: int,
                          num_fpn_levels: int = 3) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "input_proj": _conv(sd, f"{prefix}.input_proj"),
        "mask_features": _conv(sd, f"{prefix}.mask_features"),
    }
    for i in range(enc_layers):
        lp = f"{prefix}.transformer.encoder.layers.{i}"
        p[f"encoder_layer{i}"] = {
            "self_attn": _mha(sd, f"{lp}.self_attn"),
            "norm1": _ln(sd, f"{lp}.norm1"),
            "norm2": _ln(sd, f"{lp}.norm2"),
            "linear1": _lin(sd, f"{lp}.linear1"),
            "linear2": _lin(sd, f"{lp}.linear2"),
        }
    # adapters/output convs: reference registers adapter_{1..L-1}, layer_{1..L}
    n = 1
    while f"{prefix}.adapter_{n}.weight" in sd:
        p[f"adapter_{n}"] = _conv_gn(sd, f"{prefix}.adapter_{n}")
        n += 1
    n = 1
    while f"{prefix}.layer_{n}.weight" in sd:
        p[f"layer_{n}"] = _conv_gn(sd, f"{prefix}.layer_{n}")
        n += 1
    return p


def convert_predictor(sd: SD, prefix: str, dec_layers: int) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "query_feat": _get(sd, f"{prefix}.query_feat.weight"),
        "query_embed": _get(sd, f"{prefix}.query_embed.weight"),
        "level_embed": _get(sd, f"{prefix}.level_embed.weight"),
        "class_embed": _get(sd, f"{prefix}.class_embed"),
        "decoder_norm": _ln(sd, f"{prefix}.decoder_norm"),
    }
    mlp: Dict[str, Any] = {}
    i = 0
    while f"{prefix}.mask_embed.layers.{i}.weight" in sd:
        mlp[f"layers{i}"] = _lin(sd, f"{prefix}.mask_embed.layers.{i}")
        i += 1
    p["mask_embed"] = mlp
    # VLP caption slots (interface/xdecoder.py:140-144): present only in
    # captioning-enabled checkpoints
    if f"{prefix}.caping_embed" in sd:
        p["caping_embed"] = _get(sd, f"{prefix}.caping_embed")
    if f"{prefix}.pos_embed_caping.weight" in sd:
        p["pos_embed_caping"] = _get(sd, f"{prefix}.pos_embed_caping.weight")
    for i in range(dec_layers):
        p[f"cross_attn{i}"] = {
            "multihead_attn": _mha(
                sd, f"{prefix}.transformer_cross_attention_layers.{i}.multihead_attn"
            ),
            "norm": _ln(sd, f"{prefix}.transformer_cross_attention_layers.{i}.norm"),
        }
        p[f"self_attn{i}"] = {
            "self_attn": _mha(
                sd, f"{prefix}.transformer_self_attention_layers.{i}.self_attn"
            ),
            "norm": _ln(sd, f"{prefix}.transformer_self_attention_layers.{i}.norm"),
        }
        fp = f"{prefix}.transformer_ffn_layers.{i}"
        p[f"ffn{i}"] = {
            "linear1": _lin(sd, f"{fp}.linear1"),
            "linear2": _lin(sd, f"{fp}.linear2"),
            "norm": _ln(sd, f"{fp}.norm"),
        }
    return p


def convert_seem(sd: SD, prefix: str, dec_layers: int) -> Dict[str, Any]:
    """torch SEEMDecoder (interface/seem_v0.py:27-160) -> models/seem.SEEMHead.

    The decoder trunk (queries, attention layers, mask MLP, class proj) is the
    X-Decoder predictor layout; SEEM adds the per-level spatial projections
    (``mask_sptial_embed`` — the reference's own spelling), the spatial memory
    embeddings, and the ±1 point indicator."""
    p = convert_predictor(sd, prefix, dec_layers)
    for i in range(3):
        if f"{prefix}.mask_sptial_embed.{i}" in sd:
            p[f"mask_spatial_embed{i}"] = _get(sd, f"{prefix}.mask_sptial_embed.{i}")
    for ours, theirs in (
        ("spatial_embed", "spatial_embed.weight"),
        ("spatial_featured", "spatial_featured.weight"),
        ("pn_indicator", "pn_indicator.weight"),
    ):
        if f"{prefix}.{theirs}" in sd:
            p[ours] = _get(sd, f"{prefix}.{theirs}")
    return p


def convert_lang_encoder(sd: SD, prefix: str) -> Tuple[Dict[str, Any], Array]:
    """Returns (LanguageEncoder params, logit_scale value (pre-exp))."""
    tp = f"{prefix}.lang_encoder"           # the CLIP-style text transformer
    enc: Dict[str, Any] = {
        "token_embedding": {"embedding": _get(sd, f"{tp}.token_embedding.weight")},
        "positional_embedding": _get(sd, f"{tp}.positional_embedding"),
        "ln_final": _ln(sd, f"{tp}.ln_final"),
    }
    i = 0
    while f"{tp}.resblocks.{i}.ln_1.weight" in sd:
        rp = f"{tp}.resblocks.{i}"
        enc[f"resblocks{i}"] = {
            "ln_1": _ln(sd, f"{rp}.ln_1"),
            "ln_2": _ln(sd, f"{rp}.ln_2"),
            "attn": _mha(sd, f"{rp}.attn"),
            "mlp_c_fc": _lin(sd, f"{rp}.mlp.c_fc"),
            "mlp_c_proj": _lin(sd, f"{rp}.mlp.c_proj"),
        }
        i += 1
    params = {
        "lang_encoder": enc,
        "lang_proj": _get(sd, f"{prefix}.lang_proj"),
        "logit_scale": _get(sd, f"{prefix}.logit_scale"),
    }
    return params, _get(sd, f"{prefix}.logit_scale")


def convert_xdecoder_checkpoint(
    sd: SD,
    depths=(2, 2, 18, 2),
    enc_layers: int = 6,
    dec_layers: int = 9,
) -> Dict[str, Any]:
    """Full conversion. Returns a dict:
    {'xdecoder': {'params': {...}}, 'lang': {'params': {...}}, 'logit_scale': f}
    """
    bb = "backbone" if "backbone.patch_embed.proj.weight" in sd else "model.backbone"
    head = (
        "sem_seg_head" if f"sem_seg_head.pixel_decoder.input_proj.weight" in sd
        else "model.sem_seg_head"
    )
    xparams = {
        "backbone": convert_focalnet(sd, bb, depths),
        "pixel_decoder": convert_pixel_decoder(sd, f"{head}.pixel_decoder", enc_layers),
        "predictor": convert_predictor(sd, f"{head}.predictor", dec_layers),
    }
    lang_params, logit_scale = convert_lang_encoder(sd, f"{head}.predictor.lang_encoder")
    return {
        "xdecoder": {"params": xparams},
        "lang": {"params": lang_params},
        "logit_scale": float(np.exp(logit_scale)),
    }


# ---------------------------------------------------------------------------
# Inverse (flax shapes -> synthetic torch keys) — used by tests to pin the
# mapping's completeness without the released file.
# ---------------------------------------------------------------------------

def synthesize_torch_state_dict(
    xdecoder_shapes: Dict[str, Any],
    lang_shapes: Dict[str, Any],
    rng: Optional[np.random.Generator] = None,
) -> SD:
    """Create a torch-style state dict whose conversion must reproduce the
    given flax shape trees exactly."""
    rng = rng or np.random.default_rng(0)
    sd: SD = {}

    def rnd(shape):
        return rng.standard_normal(shape).astype(np.float32)

    def emit_lin(tkey: str, leaf: Dict[str, Any]):
        k = leaf["kernel"]
        sd[f"{tkey}.weight"] = rnd((k.shape[1], k.shape[0]))
        if "bias" in leaf:
            sd[f"{tkey}.bias"] = rnd((k.shape[1],))

    def emit_conv(tkey: str, leaf: Dict[str, Any]):
        k = leaf["kernel"]  # HWIO
        sd[f"{tkey}.weight"] = rnd((k.shape[3], k.shape[2], k.shape[0], k.shape[1]))
        if "bias" in leaf:
            sd[f"{tkey}.bias"] = rnd((k.shape[3],))

    def emit_ln(tkey: str, leaf: Dict[str, Any]):
        sd[f"{tkey}.weight"] = rnd(leaf["scale"].shape)
        sd[f"{tkey}.bias"] = rnd(leaf["bias"].shape)

    def emit_mha(tkey: str, leaf: Dict[str, Any]):
        C = leaf["q_proj"]["kernel"].shape[0]
        sd[f"{tkey}.in_proj_weight"] = rnd((3 * C, C))
        sd[f"{tkey}.in_proj_bias"] = rnd((3 * C,))
        emit_lin(f"{tkey}.out_proj", leaf["out_proj"])

    # ---- backbone
    bb = xdecoder_shapes["backbone"]
    emit_conv("backbone.patch_embed.proj", bb["patch_embed"]["proj"])
    emit_ln("backbone.patch_embed.norm", bb["patch_embed"]["norm"])
    for name, stage in bb.items():
        if name.endswith("_blocks"):
            # scanned stage: shapes live stacked under "block" with a leading
            # depth axis; emit per-block torch keys by stripping that axis
            import jax as _jax

            i = name.replace("layers", "").replace("_blocks", "")
            stacked = stage["block"]
            depth = _jax.tree_util.tree_leaves(stacked)[0].shape[0]
            blk = _jax.tree_util.tree_map(
                lambda s: _jax.ShapeDtypeStruct(s.shape[1:], s.dtype), stacked
            )
            for j in range(depth):
                bp = f"backbone.layers.{i}.blocks.{j}"
                emit_ln(f"{bp}.norm1", blk["norm1"])
                emit_ln(f"{bp}.norm2", blk["norm2"])
                emit_lin(f"{bp}.mlp.fc1", blk["mlp"]["fc1"])
                emit_lin(f"{bp}.mlp.fc2", blk["mlp"]["fc2"])
                mod = blk["modulation"]
                emit_lin(f"{bp}.modulation.f", mod["f"])
                emit_conv(f"{bp}.modulation.h", mod["h"])
                emit_lin(f"{bp}.modulation.proj", mod["proj"])
                for mk, mv in mod.items():
                    if mk.startswith("focal_layers"):
                        level = mk.replace("focal_layers", "")
                        k = mv["kernel"]  # [kh,kw,1,C]
                        sd[f"{bp}.modulation.focal_layers.{level}.0.weight"] = rnd(
                            (k.shape[3], 1, k.shape[0], k.shape[1])
                        )
                        if "bias" in mv:
                            sd[f"{bp}.modulation.focal_layers.{level}.0.bias"] = rnd(
                                (k.shape[3],)
                            )
                if "ln" in mod:
                    emit_ln(f"{bp}.modulation.ln", mod["ln"])
                if "gamma_1" in blk:
                    sd[f"{bp}.gamma_1"] = rnd(blk["gamma_1"].shape)
                    sd[f"{bp}.gamma_2"] = rnd(blk["gamma_2"].shape)
        elif "_downsample" in name:
            blk = stage
            i = name.replace("layers", "").replace("_downsample", "")
            emit_conv(f"backbone.layers.{i}.downsample.proj", blk["proj"])
            if "norm" in blk:
                emit_ln(f"backbone.layers.{i}.downsample.norm", blk["norm"])
        elif name.startswith("norm"):
            emit_ln(f"backbone.{name}", stage)

    # ---- pixel decoder
    pd = xdecoder_shapes["pixel_decoder"]
    pp = "sem_seg_head.pixel_decoder"
    emit_conv(f"{pp}.input_proj", pd["input_proj"])
    emit_conv(f"{pp}.mask_features", pd["mask_features"])
    for name, leaf in pd.items():
        if name.startswith("encoder_layer"):
            i = name.replace("encoder_layer", "")
            lp = f"{pp}.transformer.encoder.layers.{i}"
            emit_mha(f"{lp}.self_attn", leaf["self_attn"])
            emit_ln(f"{lp}.norm1", leaf["norm1"])
            emit_ln(f"{lp}.norm2", leaf["norm2"])
            emit_lin(f"{lp}.linear1", leaf["linear1"])
            emit_lin(f"{lp}.linear2", leaf["linear2"])
        elif name.startswith("adapter_") or name.startswith("layer_"):
            emit_conv(f"{pp}.{name}", leaf["conv"])
            if "norm" in leaf:
                sd[f"{pp}.{name}.norm.weight"] = rnd(leaf["norm"]["scale"].shape)
                sd[f"{pp}.{name}.norm.bias"] = rnd(leaf["norm"]["bias"].shape)

    # ---- predictor
    pr = xdecoder_shapes["predictor"]
    qp = "sem_seg_head.predictor"
    sd[f"{qp}.query_feat.weight"] = rnd(pr["query_feat"].shape)
    sd[f"{qp}.query_embed.weight"] = rnd(pr["query_embed"].shape)
    sd[f"{qp}.level_embed.weight"] = rnd(pr["level_embed"].shape)
    sd[f"{qp}.class_embed"] = rnd(pr["class_embed"].shape)
    emit_ln(f"{qp}.decoder_norm", pr["decoder_norm"])
    for name, leaf in pr["mask_embed"].items():
        i = name.replace("layers", "")
        emit_lin(f"{qp}.mask_embed.layers.{i}", leaf)
    for name, leaf in pr.items():
        if name.startswith("cross_attn"):
            i = name.replace("cross_attn", "")
            lp = f"{qp}.transformer_cross_attention_layers.{i}"
            emit_mha(f"{lp}.multihead_attn", leaf["multihead_attn"])
            emit_ln(f"{lp}.norm", leaf["norm"])
        elif name.startswith("self_attn"):
            i = name.replace("self_attn", "")
            lp = f"{qp}.transformer_self_attention_layers.{i}"
            emit_mha(f"{lp}.self_attn", leaf["self_attn"])
            emit_ln(f"{lp}.norm", leaf["norm"])
        elif name.startswith("ffn"):
            i = name.replace("ffn", "")
            lp = f"{qp}.transformer_ffn_layers.{i}"
            emit_lin(f"{lp}.linear1", leaf["linear1"])
            emit_lin(f"{lp}.linear2", leaf["linear2"])
            emit_ln(f"{lp}.norm", leaf["norm"])

    # ---- language
    lg = lang_shapes
    lp = f"{qp}.lang_encoder"
    sd[f"{lp}.logit_scale"] = np.asarray(0.0, np.float32).reshape(
        lg["logit_scale"].shape
    )
    sd[f"{lp}.lang_proj"] = rnd(lg["lang_proj"].shape)
    enc = lg["lang_encoder"]
    tp = f"{lp}.lang_encoder"
    sd[f"{tp}.token_embedding.weight"] = rnd(enc["token_embedding"]["embedding"].shape)
    sd[f"{tp}.positional_embedding"] = rnd(enc["positional_embedding"].shape)
    emit_ln(f"{tp}.ln_final", enc["ln_final"])
    for name, blk in enc.items():
        if name.startswith("resblocks"):
            i = name.replace("resblocks", "")
            rp = f"{tp}.resblocks.{i}"
            emit_ln(f"{rp}.ln_1", blk["ln_1"])
            emit_ln(f"{rp}.ln_2", blk["ln_2"])
            emit_mha(f"{rp}.attn", blk["attn"])
            emit_lin(f"{rp}.mlp.c_fc", blk["mlp_c_fc"])
            emit_lin(f"{rp}.mlp.c_proj", blk["mlp_c_proj"])
    return sd
