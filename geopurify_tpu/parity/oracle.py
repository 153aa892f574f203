"""Torch-side oracle builders over the mounted reference X-Decoder.

Each builder instantiates the actual reference module (focal.py /
transformer_encoder_fpn.py / interface/xdecoder.py / LangEncoder/transformer.py
— the code GeoPurify runs in production) with seeded random weights, runs it on
a seeded input, and returns (activations, prefixed state_dict) for the jax side
to convert (utils/convert_xdecoder.py) and diff against.

Everything here is torch-only — no jax imports — so it can run while a JAX
process owns the TPU tunnel, and so shim installation can't disturb jax.

Weight randomization replaces the reference's init on purpose: LayerScale
gammas init at 1e-4, which would scale any modulation-path converter bug below
the comparison threshold; randomize_module_ gives every parameter O(0.02..1)
magnitudes so layout bugs surface at full size.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from geopurify_tpu.parity.shims import add_reference_to_path, install


def _torch():
    install()
    add_reference_to_path()
    import torch

    return torch


def randomize_module_(m, seed: int) -> None:
    torch = _torch()
    import torch.nn as nn

    g = torch.Generator().manual_seed(seed)
    seen = set()

    def rnd_like(p, std):
        return torch.randn(p.shape, generator=g, dtype=p.dtype) * std

    for mod in m.modules():
        if isinstance(mod, (nn.LayerNorm, nn.GroupNorm, nn.BatchNorm2d)):
            if mod.weight is not None:
                mod.weight.data = 1.0 + rnd_like(mod.weight, 0.2)
                seen.add(id(mod.weight))
            if mod.bias is not None:
                mod.bias.data = rnd_like(mod.bias, 0.1)
                seen.add(id(mod.bias))
        elif isinstance(mod, (nn.Linear, nn.Conv2d)):
            mod.weight.data = rnd_like(mod.weight, 0.05)
            seen.add(id(mod.weight))
            if mod.bias is not None:
                mod.bias.data = rnd_like(mod.bias, 0.05)
                seen.add(id(mod.bias))
        elif isinstance(mod, nn.Embedding):
            mod.weight.data = rnd_like(mod.weight, 0.05)
            seen.add(id(mod.weight))
        elif isinstance(mod, nn.MultiheadAttention):
            for p in mod.parameters():
                p.data = rnd_like(p, 0.05)
                seen.add(id(p))
    # bare nn.Parameters: layerscale gammas, class_embed, positional embeddings
    for p in m.parameters():
        if id(p) not in seen:
            p.data = rnd_like(p, 0.5)


def _nchw_to_nhwc(t) -> np.ndarray:
    return np.ascontiguousarray(t.detach().numpy().transpose(0, 2, 3, 1))


# ---------------------------------------------------------------------------
# Stage oracles
# ---------------------------------------------------------------------------

FOCAL_SMALL = dict(embed_dim=16, depths=(1, 2, 2, 1))
FOCAL_FULL = dict(embed_dim=192, depths=(2, 2, 18, 2))


def focalnet_oracle(
    image_hw: Tuple[int, int] = (64, 96),
    embed_dim: int = 16,
    depths: Tuple[int, ...] = (1, 2, 2, 1),
    seed: int = 0,
) -> Dict:
    """Reference FocalNet (vision/backbone/focal.py:340-598, focall config:
    conv embed, postLN, layerscale, scaling modulator, focal level 4 window 3).
    """
    torch = _torch()
    from xdecoder.modeling.vision.backbone.focal import FocalNet

    torch.manual_seed(seed)
    m = FocalNet(
        patch_size=4,
        embed_dim=embed_dim,
        depths=list(depths),
        focal_levels=[4, 4, 4, 4],
        focal_windows=[3, 3, 3, 3],
        drop_path_rate=0.0,
        use_conv_embed=True,
        use_postln=True,
        use_postln_in_modulation=False,
        scaling_modulator=True,
        use_layerscale=True,
    )
    randomize_module_(m, seed)
    m.eval()
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.0, 1.0, (1, 3) + tuple(image_hw)).astype(np.float32)
    with torch.no_grad():
        outs = m(torch.from_numpy(x))
    return {
        "input_nhwc": np.ascontiguousarray(x.transpose(0, 2, 3, 1)),
        "acts": {k: _nchw_to_nhwc(v) for k, v in outs.items()},
        "sd": {f"backbone.{k}": v.numpy() for k, v in m.state_dict().items()},
        "depths": tuple(depths),
    }


def focalnet_dw_oracle(
    image_hw: Tuple[int, int] = (64, 96),
    embed_dim: int = 16,
    depths: Tuple[int, ...] = (1, 2, 2, 1),
    use_conv_embed: bool = False,
    use_postln: bool = True,
    use_pre_norms: Tuple[bool, ...] = (False, True, True, False),
    seed: int = 0,
) -> Dict:
    """Reference focal_dw FocalNet (vision/backbone/focal_dw.py:118-205,
    355-595 — the SEEM-release variant: per-block dw residual convs, postLN
    after the residual add, norm2 over the whole FFN residual stream,
    optional pre-norm downsample embeds). Pinned at both postLN settings by
    the test."""
    torch = _torch()
    from xdecoder.modeling.vision.backbone.focal_dw import FocalNet

    torch.manual_seed(seed)
    m = FocalNet(
        patch_size=4,
        embed_dim=embed_dim,
        depths=list(depths),
        focal_levels=[3, 3, 3, 3],
        focal_windows=[9, 9, 9, 9],
        drop_path_rate=0.0,
        use_conv_embed=use_conv_embed,
        use_postln=use_postln,
        use_postln_in_modulation=False,
        scaling_modulator=True,
        use_layerscale=True,
        use_pre_norms=list(use_pre_norms),
    )
    randomize_module_(m, seed)
    m.eval()
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.0, 1.0, (1, 3) + tuple(image_hw)).astype(np.float32)
    with torch.no_grad():
        outs = m(torch.from_numpy(x))
    return {
        "input_nhwc": np.ascontiguousarray(x.transpose(0, 2, 3, 1)),
        "acts": {k: _nchw_to_nhwc(v) for k, v in outs.items()},
        "sd": {f"backbone.{k}": v.numpy() for k, v in m.state_dict().items()},
        "depths": tuple(depths),
    }


def davit_oracle(
    image_hw: Tuple[int, int] = (64, 96),
    embed_dims: Tuple[int, ...] = (8, 16, 24, 32),
    depths: Tuple[int, ...] = (1, 1, 2, 1),
    num_heads: Tuple[int, ...] = (2, 2, 2, 2),
    num_groups: Tuple[int, ...] = (2, 2, 2, 2),
    window_size: int = 4,
    seed: int = 0,
) -> Dict:
    """Reference DaViT (vision/backbone/davit.py:320-560) at the release
    config geometry (davitd5_unicl_lang_v1.yaml:59-71: 7/4/3 stem, 3/2/1
    inter-stage convs, prenorm False,True,True,True, no output norms)."""
    torch = _torch()
    from xdecoder.modeling.vision.backbone.davit import DaViT

    torch.manual_seed(seed)
    m = DaViT(
        depths=list(depths),
        patch_size=[7, 3, 3, 3],
        patch_stride=[4, 2, 2, 2],
        patch_padding=[3, 1, 1, 1],
        patch_prenorm=[False, True, True, True],
        embed_dims=list(embed_dims),
        num_heads=list(num_heads),
        num_groups=list(num_groups),
        window_size=window_size,
        drop_path_rate=0.0,
        out_indices=[0, 1, 2, 3],
    )
    randomize_module_(m, seed)
    m.eval()
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.0, 1.0, (1, 3) + tuple(image_hw)).astype(np.float32)
    with torch.no_grad():
        outs = m(torch.from_numpy(x))
    return {
        "input_nhwc": np.ascontiguousarray(x.transpose(0, 2, 3, 1)),
        "acts": {k: _nchw_to_nhwc(v) for k, v in outs.items()},
        "sd": {f"backbone.{k}": v.numpy() for k, v in m.state_dict().items()},
        "depths": tuple(depths),
    }


def vit_oracle(
    image_size: int = 64,
    embed_dim: int = 16,
    depth: int = 4,
    num_heads: int = 2,
    window_size: int = 2,
    global_attn_indexes: Tuple[int, ...] = (1, 3),
    out_dims: Tuple[int, ...] = (8, 12, 16, 24),
    seed: int = 0,
) -> Dict:
    """Reference ViTDet/SAM encoder + SimpleFPN at D2ViT semantics
    (vision/backbone/vit.py:462-540: norm eps 1e-6, use_rel_pos, the
    SimpleFPN neck replacing the SAM neck). Square input — the reference
    adds the [1,g,g,C] pos_embed without resizing."""
    torch = _torch()
    from functools import partial

    import torch.nn as nn

    from xdecoder.modeling.vision.backbone.vit import ImageEncoderViT, SimpleFPN

    torch.manual_seed(seed)
    m = ImageEncoderViT(
        img_size=image_size,
        patch_size=16,
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        mlp_ratio=4.0,
        norm_layer=partial(nn.LayerNorm, eps=1e-6),
        qkv_bias=True,
        use_rel_pos=True,
        global_attn_indexes=list(global_attn_indexes),
        window_size=window_size,
        out_chans=8,
    )
    m.neck = SimpleFPN(in_dim=embed_dim, out_dims=list(out_dims))
    randomize_module_(m, seed)
    m.eval()
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.0, 1.0, (1, 3, image_size, image_size)).astype(np.float32)
    with torch.no_grad():
        outs = m(torch.from_numpy(x))
    return {
        "input_nhwc": np.ascontiguousarray(x.transpose(0, 2, 3, 1)),
        "acts": {k: _nchw_to_nhwc(v) for k, v in outs.items()},
        "sd": {f"backbone.{k}": v.numpy() for k, v in m.state_dict().items()},
        "depth": depth,
    }


def pixel_decoder_oracle(
    base_hw: Tuple[int, int] = (16, 24),
    channels: Tuple[int, ...] = (16, 32, 64, 128),
    conv_dim: int = 32,
    mask_dim: int = 32,
    enc_layers: int = 2,
    nheads: int = 8,
    dim_feedforward: int = 64,
    seed: int = 1,
) -> Dict:
    """Reference TransformerEncoderPixelDecoder (transformer_encoder_fpn.py:
    193-322): FPN + 6-layer encoder on res5 with sine PE, GN conv norms."""
    torch = _torch()
    from detectron2.layers import ShapeSpec
    from xdecoder.modeling.body.encoder.transformer_encoder_fpn import (
        TransformerEncoderPixelDecoder,
    )

    torch.manual_seed(seed)
    ishape = {
        f"res{i+2}": ShapeSpec(channels=channels[i], stride=4 * 2 ** i)
        for i in range(4)
    }
    m = TransformerEncoderPixelDecoder(
        input_shape=ishape,
        transformer_dropout=0.0,
        transformer_nheads=nheads,
        transformer_dim_feedforward=dim_feedforward,
        transformer_enc_layers=enc_layers,
        transformer_pre_norm=False,
        conv_dim=conv_dim,
        mask_dim=mask_dim,
        mask_on=True,
        norm="GN",
    )
    randomize_module_(m, seed)
    m.eval()
    rng = np.random.default_rng(seed)
    H, W = base_hw
    feats_np = {
        f"res{i+2}": rng.normal(
            0, 1, (1, channels[i], H // 2 ** i, W // 2 ** i)
        ).astype(np.float32)
        for i in range(4)
    }
    feats = {k: torch.from_numpy(v) for k, v in feats_np.items()}
    with torch.no_grad():
        mask_features, transformer_features, multi_scale = m.forward_features(feats)
    return {
        "inputs_nhwc": {
            k: np.ascontiguousarray(v.transpose(0, 2, 3, 1)) for k, v in feats_np.items()
        },
        "mask_features": _nchw_to_nhwc(mask_features),
        "transformer_features": _nchw_to_nhwc(transformer_features),
        "multi_scale": [_nchw_to_nhwc(t) for t in multi_scale],
        "sd": {
            f"sem_seg_head.pixel_decoder.{k}": v.numpy()
            for k, v in m.state_dict().items()
        },
        "enc_layers": enc_layers,
    }


def deform_pixel_decoder_oracle(
    base_hw: Tuple[int, int] = (16, 24),
    conv_dim: int = 32,
    mask_dim: int = 32,
    enc_layers: int = 2,
    nheads: int = 2,
    seed: int = 0,
) -> Dict:
    """Reference MSDeformAttnPixelDecoder (transformer_encoder_deform.py:
    164-368) on the CPU ms_deform_attn_core_pytorch fallback — the deformable
    encoder over res3..res5 + bilinear FPN merge of res2 + 1x1 mask conv."""
    torch = _torch()
    from detectron2.layers import ShapeSpec

    from xdecoder.modeling.vision.encoder.transformer_encoder_deform import (
        MSDeformAttnPixelDecoder,
    )

    chans = {"res2": 8, "res3": 12, "res4": 16, "res5": 24}
    input_shape = {
        k: ShapeSpec(channels=c, stride=s)
        for (k, c), s in zip(chans.items(), (4, 8, 16, 32))
    }
    torch.manual_seed(seed)
    m = MSDeformAttnPixelDecoder(
        input_shape=input_shape,
        transformer_dropout=0.0,
        transformer_nheads=nheads,
        transformer_dim_feedforward=64,
        transformer_enc_layers=enc_layers,
        conv_dim=conv_dim,
        mask_dim=mask_dim,
        norm="GN",
        transformer_in_features=["res3", "res4", "res5"],
        common_stride=4,
    )
    randomize_module_(m, seed)
    m.eval()
    rng = np.random.default_rng(seed)
    H, W = base_hw
    feats = {
        k: torch.from_numpy(
            rng.normal(0, 1, (1, c, H // (2 ** i), W // (2 ** i))).astype(np.float32)
        )
        for i, (k, c) in enumerate(chans.items())
    }
    with torch.no_grad():
        mask_features, trans_features, multi_scale = m.forward_features(feats)
    return {
        "inputs_nhwc": {k: _nchw_to_nhwc(v) for k, v in feats.items()},
        "acts": {
            "mask_features": _nchw_to_nhwc(mask_features),
            "transformer_features": _nchw_to_nhwc(trans_features),
            **{f"multi_scale{i}": _nchw_to_nhwc(v)
               for i, v in enumerate(multi_scale)},
        },
        "sd": {f"pixdec.{k}": v.numpy() for k, v in m.state_dict().items()},
        "enc_layers": enc_layers,
    }


def _lang_adapter(text_emb_np: np.ndarray, logit_scale_log: float):
    """Matches vlpencoder.compute_similarity (vlpencoder.py:177-183) so the
    XDecoder head can score class embeds without the full language tower."""
    torch = _torch()
    import torch.nn as nn

    class LangAdapter(nn.Module):
        def __init__(self):
            super().__init__()
            self.register_buffer(
                "default_text_embeddings", torch.from_numpy(text_emb_np)
            )
            self.logit_scale = nn.Parameter(
                torch.tensor(float(logit_scale_log))
            )

        def compute_similarity(self, v_emb, name="default", fake=False):
            if fake:
                return None
            v_emb = v_emb / (v_emb.norm(dim=-1, keepdim=True) + 1e-7)
            t_emb = getattr(self, f"{name}_text_embeddings")
            return self.logit_scale.exp() * v_emb @ t_emb.unsqueeze(0).transpose(1, 2)

    return LangAdapter()


def xdecoder_head_oracle(
    base_hw: Tuple[int, int] = (16, 24),
    conv_dim: int = 32,
    mask_dim: int = 32,
    hidden_dim: int = 32,
    dim_proj: int = 32,
    num_queries: int = 13,
    nheads: int = 4,
    dim_feedforward: int = 64,
    dec_layers: int = 3,
    n_text: int = 5,
    seed: int = 2,
    capture_aux: bool = False,
) -> Dict:
    """Reference XDecoder query decoder (interface/xdecoder.py:25-533), seg
    task: masked cross-attn over 3 rotating scales, structured self-attn mask,
    bicubic-antialias attn-mask resize thresholded at 0.5.

    ``capture_aux`` additionally exports the per-round PRE-threshold stride-4
    mask logits (aux_outputs) and the binarized per-round cross-attn masks
    (forward-pre-hooks on the cross-attention layers) — the full-size
    threshold-amplifier study (VERDICT r3 item #5)."""
    torch = _torch()
    from xdecoder.modeling.interface.xdecoder import XDecoder

    rng = np.random.default_rng(seed)
    text = rng.normal(0, 1, (n_text, dim_proj)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    logit_scale_log = 1.3

    torch.manual_seed(seed)
    m = XDecoder(
        lang_encoder=_lang_adapter(text, logit_scale_log),
        in_channels=conv_dim,
        mask_classification=True,
        hidden_dim=hidden_dim,
        dim_proj=dim_proj,
        num_queries=num_queries,
        contxt_len=77,
        nheads=nheads,
        dim_feedforward=dim_feedforward,
        dec_layers=dec_layers,
        pre_norm=False,
        mask_dim=mask_dim,
        task_switch={
            "mask": True, "bbox": False, "caption": False,
            "captioning": False, "grounding": False, "retrieval": False,
        },
        captioning_step=50,
        enforce_input_project=False,
    )
    randomize_module_(m, seed)
    # the lang adapter's logit_scale is a bare nn.Parameter and gets swept up
    # by randomize_module_ — restore the value the jax side is handed
    with torch.no_grad():
        m.lang_encoder.logit_scale.fill_(logit_scale_log)
    m.eval()

    H, W = base_hw
    # multi-scale: lowest resolution first (pixel decoder top-down order)
    ms_np = [
        rng.normal(0, 1, (1, conv_dim, H // 2 ** i, W // 2 ** i)).astype(np.float32)
        for i in (2, 1, 0)
    ]
    mf_np = rng.normal(0, 1, (1, mask_dim, H, W)).astype(np.float32)
    captured_attn = []
    hooks = []
    if capture_aux:
        def make_hook(idx):
            def hook(mod, hargs, hkwargs):
                mm = hkwargs.get("memory_mask")
                if mm is None and len(hargs) > 2:
                    mm = hargs[2]
                captured_attn.append((idx, mm.detach().clone()))
            return hook

        for idx, layer in enumerate(m.transformer_cross_attention_layers):
            hooks.append(layer.register_forward_pre_hook(
                make_hook(idx), with_kwargs=True
            ))
    with torch.no_grad():
        out = m(
            [torch.from_numpy(t) for t in ms_np],
            torch.from_numpy(mf_np),
            task="seg",
        )
    for h in hooks:
        h.remove()
    sd = {
        f"sem_seg_head.predictor.{k}": v.numpy()
        for k, v in m.state_dict().items()
        if not k.startswith("lang_encoder.")
    }
    Q = num_queries
    return {
        "multi_scale_nhwc": [np.ascontiguousarray(t.transpose(0, 2, 3, 1)) for t in ms_np],
        "mask_features_nhwc": np.ascontiguousarray(mf_np.transpose(0, 2, 3, 1)),
        "text": text,
        "logit_scale": float(np.exp(logit_scale_log)),
        "pred_logits": out["pred_logits"][:, : Q - 1].numpy(),
        "cls_logits": out["pred_logits"][:, Q - 1].numpy(),
        "pred_masks": out["pred_masks"][:, : Q - 1].numpy(),
        "mask_embed": out["mask_embed"][:, : Q - 1].numpy(),
        "sd": sd,
        "dec_layers": dec_layers,
        # per-round PRE-threshold stride-4 mask logits (all Q queries) and
        # the binarized cross-attn masks the reference actually used
        "aux_masks": (
            [a["pred_masks"].numpy() for a in out["aux_outputs"]]
            + [out["pred_masks"].numpy()] if capture_aux else None
        ),
        "attn_masks": (
            [mm.numpy() for _, mm in sorted(captured_attn, key=lambda t: t[0])]
            if capture_aux else None
        ),
        "nheads": nheads,
    }


def xdecoder_vlp_oracle(
    base_hw: Tuple[int, int] = (16, 24),
    conv_dim: int = 32,
    mask_dim: int = 32,
    hidden_dim: int = 32,
    dim_proj: int = 32,
    num_queries: int = 13,
    nheads: int = 4,
    dim_feedforward: int = 64,
    dec_layers: int = 3,
    n_text: int = 5,
    cap_len: int = 12,
    seed: int = 3,
) -> Dict:
    """Reference XDecoder head on the VLP task (interface/xdecoder.py:
    226-233, 265-267, 428-431: caption lang embeddings ride as extra query
    slots under the structured causal mask; outputs_captionting =
    caption-slot states @ caping_embed). Deterministic: dropout is 0
    everywhere, so train() mode (required by the vlp branch) is exact."""
    torch = _torch()
    from xdecoder.modeling.interface.xdecoder import XDecoder

    rng = np.random.default_rng(seed)
    text = rng.normal(0, 1, (n_text, dim_proj)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    logit_scale_log = 1.1

    torch.manual_seed(seed)
    m = XDecoder(
        lang_encoder=_lang_adapter(text, logit_scale_log),
        in_channels=conv_dim,
        mask_classification=True,
        hidden_dim=hidden_dim,
        dim_proj=dim_proj,
        num_queries=num_queries,
        contxt_len=cap_len,
        nheads=nheads,
        dim_feedforward=dim_feedforward,
        dec_layers=dec_layers,
        pre_norm=False,
        mask_dim=mask_dim,
        task_switch={
            "mask": True, "bbox": False, "caption": True,
            "captioning": True, "grounding": False, "retrieval": True,
        },
        captioning_step=50,
        enforce_input_project=False,
    )
    randomize_module_(m, seed)
    with torch.no_grad():
        m.lang_encoder.logit_scale.fill_(logit_scale_log)
    m.train()  # the vlp branch is train-gated; dropout is 0 -> deterministic

    H, W = base_hw
    ms_np = [
        rng.normal(0, 1, (1, conv_dim, H // 2 ** i, W // 2 ** i)).astype(np.float32)
        for i in (2, 1, 0)
    ]
    mf_np = rng.normal(0, 1, (1, mask_dim, H, W)).astype(np.float32)
    cap_np = rng.normal(0, 1, (1, cap_len, hidden_dim)).astype(np.float32)
    with torch.no_grad():
        out = m(
            [torch.from_numpy(t) for t in ms_np],
            torch.from_numpy(mf_np),
            task="vlp",
            target_vlp=[{"caption_tokens": torch.from_numpy(cap_np)}],
        )
    sd = {
        f"sem_seg_head.predictor.{k}": v.numpy()
        for k, v in m.state_dict().items()
        if not k.startswith("lang_encoder.")
    }
    return {
        "multi_scale_nhwc": [np.ascontiguousarray(t.transpose(0, 2, 3, 1)) for t in ms_np],
        "mask_features_nhwc": np.ascontiguousarray(mf_np.transpose(0, 2, 3, 1)),
        "text": text,
        "logit_scale": float(np.exp(logit_scale_log)),
        "caption_tokens": cap_np,
        "pred_captionings": out["pred_captionings"].detach().numpy(),
        "pred_captions": out["pred_captions"].detach().numpy(),
        "sd": sd,
        "dec_layers": dec_layers,
    }


SEEM_ATTN_ARCH = {
    # configs/seem/focall_unicl_lang_v0.yaml:191-221, verbatim semantics
    "VARIABLE": {
        "queries": ["object", "grounding", "spatial"],
        "tokens": ["grounding", "spatial"],
        "memories": ["spatial"],
    },
    "SELF_ATTENTION": {
        "queries": {
            "object": ["queries_object"],
            "grounding": ["queries_grounding", "tokens_grounding"],
            "spatial": ["queries_spatial", "tokens_spatial", "memories_spatial"],
        },
        "tokens": {
            "grounding": ["queries_grounding", "tokens_grounding"],
            "spatial": ["tokens_spatial"],
        },
        "memories": {"spatial": ["memories_spatial"]},
    },
    "CROSS_ATTENTION": {
        "queries": {"object": True, "grounding": True, "spatial": True},
        "memories": {"spatial": True},
        "tokens": {"grounding": False, "spatial": False},
    },
    "MASKING": ["tokens_spatial", "tokens_grounding"],
    "DUPLICATION": {
        "queries": {"grounding": "queries_object", "spatial": "queries_object"}
    },
    "SPATIAL_MEMORIES": 3,
}


def seem_oracle(
    base_hw: Tuple[int, int] = (16, 24),
    hidden_dim: int = 32,
    mask_dim: int = 32,
    dim_proj: int = 32,
    num_queries: int = 7,
    nheads: int = 4,
    dim_feedforward: int = 64,
    dec_layers: int = 3,
    n_text: int = 5,
    n_grounding: int = 3,
    use_memory: bool = True,
    seed: int = 4,
) -> Dict:
    """Reference SEEM v0 decoder (interface/seem_v0.py:27-392 +
    attention_data_struct_seemv0.py) on the seg task with spatial pos/neg
    prompts, grounding tokens, and a previous-mask memory. Prompt masks carry
    FEWER nonzero points than max_spatial_len so rand_sample is a no-op and
    the forward is deterministic."""
    torch = _torch()
    from xdecoder.modeling.interface.seem_v0 import SEEMDecoder

    rng = np.random.default_rng(seed)
    text = rng.normal(0, 1, (n_text, dim_proj)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    logit_scale_log = 0.7

    torch.manual_seed(seed)
    m = SEEMDecoder(
        lang_encoder=_lang_adapter(text, logit_scale_log),
        in_channels=hidden_dim,
        mask_classification=True,
        hidden_dim=hidden_dim,
        dim_proj=dim_proj,
        num_queries=num_queries,
        contxt_len=77,
        nheads=nheads,
        dim_feedforward=dim_feedforward,
        dec_layers=dec_layers,
        pre_norm=False,
        mask_dim=mask_dim,
        task_switch={"bbox": False, "mask": True, "spatial": True,
                     "grounding": True},
        enforce_input_project=False,
        max_spatial_len=[32, 32, 32, 32],
        attn_arch={k: v for k, v in SEEM_ATTN_ARCH.items()},
    )
    randomize_module_(m, seed)
    m.eval()

    H, W = base_hw
    ms_nchw = [
        rng.normal(0, 1, (1, hidden_dim, H // 4, W // 4)).astype(np.float32),
        rng.normal(0, 1, (1, hidden_dim, H // 2, W // 2)).astype(np.float32),
        rng.normal(0, 1, (1, hidden_dim, H, W)).astype(np.float32),
    ]
    mask_features = rng.normal(0, 1, (1, mask_dim, H, W)).astype(np.float32)

    pos_mask = np.zeros((1, H, W), bool)
    pos_mask[0, 3:6, 4:8] = True                          # 12 points < 32
    neg_mask = np.zeros((1, H, W), bool)
    neg_mask[0, 10:12, 2:5] = True                        # 6 points
    grd = rng.normal(0, 1, (n_grounding, 1, hidden_dim)).astype(np.float32)
    prev = rng.normal(0, 2, (1, 1, H, W)).astype(np.float32)

    extra = {
        "spatial_query_pos_mask": [torch.from_numpy(pos_mask)],
        "spatial_query_neg_mask": [torch.from_numpy(neg_mask)],
        "grounding_tokens": torch.from_numpy(grd),
        "grounding_nonzero_mask": torch.zeros(1, n_grounding, dtype=torch.bool),
    }
    if use_memory:
        extra["prev_mask"] = torch.from_numpy(prev)
    with torch.no_grad():
        outs = m(
            [torch.from_numpy(v) for v in ms_nchw],
            torch.from_numpy(mask_features),
            task="seg", extra=extra,
        )
    acts = {
        k: outs[k].numpy() for k in
        ("pred_logits", "pred_masks", "pred_gmasks", "pred_smasks",
         "pred_smaskembs", "pred_pspatials", "pred_nspatials")
        if k in outs
    }
    return {
        "multi_scale_nhwc": [np.ascontiguousarray(v.transpose(0, 2, 3, 1)) for v in ms_nchw],
        "mask_features_nhwc": np.ascontiguousarray(mask_features.transpose(0, 2, 3, 1)),
        "text": text,
        # randomize_module_ perturbs the adapter's logit_scale parameter —
        # export the value the forward actually used
        "logit_scale": float(m.lang_encoder.logit_scale.detach().exp()),
        "pos_mask": pos_mask[0],
        "neg_mask": neg_mask[0],
        "grounding_tokens": np.ascontiguousarray(grd.transpose(1, 0, 2)),
        "prev_mask": prev if use_memory else None,
        "acts": acts,
        "sd": {f"seem.{k}": v.numpy() for k, v in m.state_dict().items()},
        "dec_layers": dec_layers,
        "num_memories": SEEM_ATTN_ARCH["SPATIAL_MEMORIES"],
    }


def seem_v1_oracle(
    base_hw: Tuple[int, int] = (16, 24),
    hidden_dim: int = 32,
    mask_dim: int = 32,
    dim_proj: int = 32,
    num_queries: int = 7,
    nheads: int = 4,
    dim_feedforward: int = 64,
    dec_layers: int = 3,
    n_text: int = 5,
    n_grounding: int = 3,
    n_masks: int = 2,
    sample_size: int = 2,
    use_memory: bool = True,
    seed: int = 6,
) -> Dict:
    """Reference SEEM v1 decoder (interface/seem_v1.py + attention_data_
    struct_seemv1.py) with MULTI-MASK prompts. The forward draws torch RNG
    internally (queries_spatial randint; per-layer memory multinomial) —
    wrapped recorders export the drawn indices so the jax side can replay
    them as explicit inputs. Point rand_samples are full-set-sorted
    (deterministic) because the prompt masks carry < max_spatial_len points."""
    torch = _torch()
    from xdecoder.modeling.interface.seem_v1 import SEEMDecoder

    rng = np.random.default_rng(seed)
    text = rng.normal(0, 1, (n_text, dim_proj)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    logit_scale_log = 0.9

    attn_arch = {k: v for k, v in SEEM_ATTN_ARCH.items()}
    attn_arch["QUERY_NUMBER"] = sample_size

    torch.manual_seed(seed)
    m = SEEMDecoder(
        lang_encoder=_lang_adapter(text, logit_scale_log),
        in_channels=hidden_dim,
        mask_classification=True,
        hidden_dim=hidden_dim,
        dim_proj=dim_proj,
        num_queries=num_queries,
        contxt_len=77,
        nheads=nheads,
        dim_feedforward=dim_feedforward,
        dec_layers=dec_layers,
        pre_norm=False,
        mask_dim=mask_dim,
        task_switch={"bbox": False, "mask": True, "spatial": True,
                     "grounding": True},
        enforce_input_project=False,
        max_spatial_len=[32, 32, 32, 32],
        attn_arch=attn_arch,
    )
    randomize_module_(m, seed)
    logit_scale = float(m.lang_encoder.logit_scale.detach().exp())
    m.eval()

    H, W = base_hw
    ms_nchw = [
        rng.normal(0, 1, (1, hidden_dim, H // 4, W // 4)).astype(np.float32),
        rng.normal(0, 1, (1, hidden_dim, H // 2, W // 2)).astype(np.float32),
        rng.normal(0, 1, (1, hidden_dim, H, W)).astype(np.float32),
    ]
    mask_features = rng.normal(0, 1, (1, mask_dim, H, W)).astype(np.float32)

    pos_mask = np.zeros((n_masks, H, W), bool)
    pos_mask[0, 3:6, 4:8] = True
    pos_mask[1, 12:14, 14:19] = True
    neg_mask = np.zeros((n_masks, H, W), bool)
    neg_mask[0, 10:12, 2:5] = True
    # mask 1 has no negative points — exercises the -1 empty-mean fill
    grd = rng.normal(0, 1, (n_grounding, 1, hidden_dim)).astype(np.float32)
    prev = rng.normal(0, 2, (1, n_masks, H, W)).astype(np.float32)

    extra = {
        "spatial_query_pos_mask": [torch.from_numpy(pos_mask)],
        "spatial_query_neg_mask": [torch.from_numpy(neg_mask)],
        "grounding_tokens": torch.from_numpy(grd),
        "grounding_nonzero_mask": torch.zeros(1, n_grounding, dtype=torch.bool),
    }
    if use_memory:
        extra["prev_mask"] = torch.from_numpy(prev)

    recorded = {"randint": [], "multinomial": []}
    orig_randint, orig_mult = torch.randint, torch.multinomial

    def rec_randint(*a, **k):
        out = orig_randint(*a, **k)
        recorded["randint"].append(out.clone())
        return out

    def rec_mult(probs, num_samples, replacement=False, **k):
        out = orig_mult(probs, num_samples, replacement=replacement, **k)
        if replacement:  # only the per-layer memory draws use replacement
            recorded["multinomial"].append(out.clone())
        return out

    torch.randint, torch.multinomial = rec_randint, rec_mult
    try:
        with torch.no_grad():
            outs = m(
                [torch.from_numpy(v) for v in ms_nchw],
                torch.from_numpy(mask_features),
                task="seg", extra=extra,
            )
    finally:
        torch.randint, torch.multinomial = orig_randint, orig_mult

    acts = {
        k: outs[k].numpy() for k in
        ("pred_logits", "pred_masks", "pred_gmasks", "pred_smasks",
         "pred_smaskembs", "pred_stexts", "pred_pspatials", "pred_nspatials")
        if k in outs
    }
    # pre-loop (layer-0) spatial predictions — the debugging anchor for the
    # group-state initialization
    if outs.get("aux_outputs") and "pred_smasks" in outs["aux_outputs"][0]:
        acts["aux0_smasks"] = outs["aux_outputs"][0]["pred_smasks"].numpy()
    # the memory multinomial is .sort()[0]'d at use
    mem_idx = (
        np.stack([r.sort()[0].numpy() for r in recorded["multinomial"]])
        if recorded["multinomial"] else None
    )
    return {
        "multi_scale_nhwc": [np.ascontiguousarray(v.transpose(0, 2, 3, 1)) for v in ms_nchw],
        "mask_features_nhwc": np.ascontiguousarray(mask_features.transpose(0, 2, 3, 1)),
        "text": text,
        "logit_scale": logit_scale,
        "pos_mask": pos_mask,
        "neg_mask": neg_mask,
        "grounding_tokens": np.ascontiguousarray(grd.transpose(1, 0, 2)),
        "prev_mask": prev if use_memory else None,
        "spatial_query_indices": recorded["randint"][0].numpy(),
        "memory_indices": mem_idx,
        "n_masks": n_masks,
        "sample_size": sample_size,
        "acts": acts,
        "sd": {f"seem.{k}": v.numpy() for k, v in m.state_dict().items()},
        "dec_layers": dec_layers,
        "num_memories": SEEM_ATTN_ARCH["SPATIAL_MEMORIES"],
    }


def lang_transformer_oracle(
    vocab_size: int = 512,
    width: int = 64,
    layers: int = 2,
    heads: int = 4,
    context_length: int = 77,
    dim_proj: int = 32,
    n_seq: int = 6,
    seed: int = 3,
) -> Dict:
    """Reference CLIP-style causal text tower (LangEncoder/transformer.py:
    81-210) + the vlpencoder projection/selection recipe
    (vlpencoder.py:145-157): take the hidden state at argmax(input_ids)
    (EOT = highest token id), project by lang_proj, L2-normalize."""
    torch = _torch()
    from xdecoder.modeling.language.LangEncoder.transformer import Transformer

    torch.manual_seed(seed)
    m = Transformer(
        context_length=context_length,
        vocab_size=vocab_size,
        width=width,
        layers=layers,
        heads=heads,
        autogressive=True,
    )
    randomize_module_(m, seed)
    m.eval()
    rng = np.random.default_rng(seed)
    # CLIP layout: BOS, tokens, EOT(highest id), PAD(0)
    ids = np.zeros((n_seq, context_length), np.int64)
    for r in range(n_seq):
        L = int(rng.integers(3, 12))
        ids[r, 0] = vocab_size - 2
        ids[r, 1 : 1 + L] = rng.integers(1, vocab_size - 2, L)
        ids[r, 1 + L] = vocab_size - 1          # EOT
    lang_proj = (rng.normal(0, 0.02, (width, dim_proj))).astype(np.float32)
    with torch.no_grad():
        hidden = m(torch.from_numpy(ids))["last_hidden_state"]
        sel = hidden[torch.arange(n_seq), torch.from_numpy(ids).argmax(dim=-1)]
        emb = sel @ torch.from_numpy(lang_proj)
        emb = emb / (emb.norm(dim=-1, keepdim=True) + 1e-7)
    sd = {
        f"sem_seg_head.predictor.lang_encoder.lang_encoder.{k}": v.numpy()
        for k, v in m.state_dict().items()
    }
    sd["sem_seg_head.predictor.lang_encoder.lang_proj"] = lang_proj
    sd["sem_seg_head.predictor.lang_encoder.logit_scale"] = np.asarray(0.0, np.float32)
    return {
        "input_ids": ids,
        "hidden": hidden.numpy(),
        "emb": emb.numpy(),
        "sd": sd,
        "layers": layers,
    }


def bicubic_resize_oracle(
    in_hw: Tuple[int, int] = (17, 23),
    out_hw: Tuple[int, int] = (64, 96),
    channels: int = 3,
    antialias: bool = True,
    seed: int = 4,
) -> Dict:
    """torch F.interpolate(mode='bicubic', align_corners=False, antialias=·) —
    the exact op of the reference's mask upsampling (affinity_module.py:527-533
    up, xdecoder.py:459 down)."""
    torch = _torch()
    import torch.nn.functional as F

    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (1, channels) + tuple(in_hw)).astype(np.float32)
    with torch.no_grad():
        y = F.interpolate(
            torch.from_numpy(x), size=out_hw, mode="bicubic",
            align_corners=False, antialias=antialias,
        )
    return {
        "input_nhwc": np.ascontiguousarray(x.transpose(0, 2, 3, 1)),
        "output_nhwc": _nchw_to_nhwc(y),
    }


def lift_oracle(
    num_points: int = 80,
    num_views: int = 3,
    mask_hw: Tuple[int, int] = (24, 32),
    stride4_hw: Tuple[int, int] = (6, 8),
    num_queries: int = 7,
    feat_dim: int = 512,   # the reference lift hard-codes feature_dim=512
    n_cls: int = 5,
    seed: int = 6,
) -> Dict:
    """Run the reference lift_xdecoder_features (affinity_module.py:455-714)
    with a stubbed X-Decoder teacher on a tiny synthetic scene.

    The trainer is created via __new__ (its __init__ would build the real
    teachers); only the attributes the lift method touches are set. The stub
    returns seeded random (pred_masks, pred_logits, mask_embed) per view —
    recorded so the jax side can consume byte-identical teacher outputs.
    """
    torch = _torch()
    from geopurify_tpu.parity.shims import add_geopurify_to_path, install_geopurify

    install_geopurify()
    add_geopurify_to_path()
    import models.affinity_module as am

    rng = np.random.default_rng(seed)
    N, V = num_points, num_views
    H, W = mask_hw
    coords = rng.uniform(0, 10, (N, 3)).astype(np.float32)

    # per-view visibility + pixel coords; ensure >=1 covered point per view
    vis = rng.uniform(size=(V, N)) < 0.6
    vis[:, 0] = True
    xl = rng.integers(0, H, (V, N))            # row in mask_shape space
    yl = rng.integers(0, W, (V, N))

    # stubbed teacher outputs per view
    teacher = []
    for v in range(V):
        teacher.append({
            "pred_masks": rng.normal(0, 2, (num_queries,) + tuple(stride4_hw)).astype(np.float32),
            "pred_logits": rng.normal(0, 1, (num_queries, n_cls + 1)).astype(np.float32),
            "mask_embed": rng.normal(0, 1, (num_queries, feat_dim)).astype(np.float32),
        })
    text = rng.normal(0, 1, (n_cls, feat_dim)).astype(np.float32)
    logit_scale = 2.5

    class _Cfg:
        pass

    cfg = _Cfg()
    cfg.all_label = [f"c{i}" for i in range(n_cls)]
    cfg.mask_shape = [H, W]

    calls = {"v": 0}

    def forward_seg_all(batched_inputs):
        v = calls["v"]
        calls["v"] += 1
        t = teacher[v]
        out = {
            "pred_masks": torch.from_numpy(t["pred_masks"])[None],
            "pred_logits": torch.from_numpy(t["pred_logits"])[None],
            "mask_embed": torch.from_numpy(t["mask_embed"])[None],
            "text_embed": torch.from_numpy(text),
            "logit_scale": torch.tensor(logit_scale),
        }
        return None, out

    import types as _types

    trainer = am.SonataXAffinityTrainer.__new__(am.SonataXAffinityTrainer)
    trainer.cfg = cfg
    trainer.device = "cpu"
    trainer.xdecoder_teacher = _types.SimpleNamespace(
        model=_types.SimpleNamespace(forward_seg_all=forward_seg_all)
    )

    # 21-tuple batch (dataset/data_loader_ablation.py:373-394 layout); only the
    # fields the lift method touches are populated
    ori_rows = []
    x_rows, y_rows = [], []
    mask2d_rows = []
    for v in range(V):
        ids = np.where(vis[v])[0]
        ori = np.zeros((len(ids), 4), np.float32)
        ori[:, 0] = v
        ori[:, 1:] = coords[ids]
        ori_rows.append(ori)
        x_rows.append(xl[v, ids])
        y_rows.append(yl[v, ids])
        m = np.zeros((N, 2), np.int64)
        m[:, 0] = v
        m[:, 1] = vis[v]
        mask2d_rows.append(m)
    ori_coords_3ds = torch.from_numpy(np.concatenate(ori_rows))
    x_labels = torch.from_numpy(np.concatenate(x_rows))
    y_labels = torch.from_numpy(np.concatenate(y_rows))
    mask_2ds = torch.from_numpy(np.concatenate(mask2d_rows))
    sum_pv = ori_coords_3ds.shape[0]

    batch = (
        torch.from_numpy(coords),                 # scene_coords
        None,                                     # scene_coords_3d
        None,                                     # scene_inds_reconstruct
        torch.zeros(N, dtype=torch.long),         # scene_label
        ori_coords_3ds,
        None, None, None, None, None,             # coords/feat/gauss/labels/binary
        torch.zeros(V, H, W),                     # label_2ds
        torch.zeros(V, H, W, 3),                  # imgs
        x_labels, y_labels, mask_2ds,
        torch.zeros(sum_pv, dtype=torch.long),    # inds_reconstructs
        torch.zeros(V * N, dtype=torch.long),     # unique_maps
        torch.zeros(sum_pv, 4),                   # mappings
        None,                                     # captions
        None,                                     # scene_gauss_features
    )
    with torch.no_grad():
        feats, text_out, ls = trainer.lift_xdecoder_features(batch)
    return {
        "coords": coords,
        "vis": vis, "xl": xl, "yl": yl,
        "teacher": teacher, "text": text, "logit_scale": logit_scale,
        "mask_hw": mask_hw,
        "final_features": feats.numpy(),
        "num_points": N,
    }


def imagelist_pad_oracle(hw: Tuple[int, int] = (37, 53), seed: int = 5) -> Dict:
    """detectron2 ImageList./32 padding semantics via the faithful shim —
    bottom-right zero pad to ceil-multiples (xdecoder_model.py:375-377)."""
    torch = _torch()
    from detectron2.structures import ImageList

    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (3,) + tuple(hw)).astype(np.float32)
    il = ImageList.from_tensors([torch.from_numpy(x)], 32)
    return {
        "input_hwc": np.ascontiguousarray(x.transpose(1, 2, 0)),
        "padded_nhwc": _nchw_to_nhwc(il.tensor),
        "image_sizes": il.image_sizes,
    }


def stage2_oracle(
    num_points: int = 3000,
    num_views: int = 3,
    box: int = 12,
    mask_hw: Tuple[int, int] = (24, 32),
    stride4_hw: Tuple[int, int] = (6, 8),
    num_queries: int = 7,
    feat_dim: int = 512,      # the reference lift hard-codes feature_dim=512
    hidden_dim: int = 64,     # AffinityPredictor ctor params (518->hidden->embed);
    embed_dim: int = 32,      # 512/128 at release scale — semantics identical
    n_cls: int = 5,
    n_ignore: int = 2,        # extra ignore classes appended after n_cls
    seed: int = 11,
) -> Dict:
    """END-TO-END Stage-2 oracle (VERDICT r3 item #1): run the reference's
    composed ``evaluate_scene`` (models/affinity_module.py:1490-1608 — lift ->
    scatter_mean 512||6 -> ME student -> faiss kNN-96 -> sharpen-20 softmax ->
    1+18 sparse-mm rounds -> de-voxelize [:512]) plus the prediction/metric
    block of ``validate()`` (run/validation.py:414-439: normalize, cosine
    logits, argmax, KDTree unseen fill, intersectionAndUnionGPU) on torch-cpu
    under RUNNABLE shims (faiss = exact numpy L2, torch_scatter = exact
    segment mean, MinkowskiEngine = literal hash-map sparse conv — see
    shims.install_me_runnable), with a stubbed X-Decoder teacher whose
    outputs are recorded for the jax side to consume byte-identically.

    Returns everything the flax side needs to rebuild the identical scene:
    teacher outputs, visibility/pixels, voxelization (lex-sorted unique voxel
    coords + point->voxel inverse), geometric features, labels, the randomized
    student state_dict, and the reference outputs (final point features,
    logits, predictions, I/U/T histograms).
    """
    torch = _torch()
    from geopurify_tpu.parity.shims import (
        add_geopurify_to_path,
        install_geopurify,
        install_me_runnable,
    )

    install_geopurify()
    install_me_runnable()
    add_geopurify_to_path()
    import models.affinity_module as am

    rng = np.random.default_rng(seed)
    N, V = num_points, num_views
    H, W = mask_hw

    # ---- scene: continuous points, voxel_size=1 quantization ----
    points = rng.uniform(0, box, (N, 3)).astype(np.float32)
    vox = np.floor(points).astype(np.int32)
    voxel_coords, inds_reconstruct = np.unique(vox, axis=0, return_inverse=True)
    M = voxel_coords.shape[0]
    assert M > 97, f"need >K+1 voxels for kNN-96, got {M}"
    # rgb in [0,1] + unit normals — the 6 geometric channels (':1524-1536')
    rgb = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    nrm = rng.normal(size=(N, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    geom = np.concatenate([rgb, nrm], axis=1)
    labels = rng.integers(0, n_cls + n_ignore, N).astype(np.int64)

    # ---- per-view visibility + pixel coords ----
    vis = rng.uniform(size=(V, N)) < 0.55
    vis[:, 0] = True
    xl = rng.integers(0, H, (V, N))
    yl = rng.integers(0, W, (V, N))

    # ---- stubbed teacher (recorded) ----
    teacher = []
    for v in range(V):
        teacher.append({
            "pred_masks": rng.normal(0, 2, (num_queries,) + tuple(stride4_hw)).astype(np.float32),
            "pred_logits": rng.normal(0, 1, (num_queries, n_cls + 1)).astype(np.float32),
            "mask_embed": rng.normal(0, 1, (num_queries, feat_dim)).astype(np.float32),
        })
    text = rng.normal(0, 1, (n_cls, feat_dim)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)   # pre-normalized rows
    logit_scale = 2.5

    class _Cfg:
        pass

    cfg = _Cfg()
    cfg.all_label = [f"c{i}" for i in range(n_cls)]
    cfg.mask_shape = [H, W]

    calls = {"v": 0}

    def forward_seg_all(batched_inputs):
        t = teacher[calls["v"]]
        calls["v"] += 1
        out = {
            "pred_masks": torch.from_numpy(t["pred_masks"])[None],
            "pred_logits": torch.from_numpy(t["pred_logits"])[None],
            "mask_embed": torch.from_numpy(t["mask_embed"])[None],
            "text_embed": torch.from_numpy(text),
            "logit_scale": torch.tensor(logit_scale),
        }
        return None, out

    import types as _types

    trainer = am.SonataXAffinityTrainer.__new__(am.SonataXAffinityTrainer)
    torch.nn.Module.__init__(trainer)   # init module dicts; skip teacher builds
    trainer.cfg = cfg
    trainer.device = "cpu"
    trainer.use_lseg = False
    trainer.use_ape = False
    trainer.xdecoder_teacher = _types.SimpleNamespace(
        model=_types.SimpleNamespace(forward_seg_all=forward_seg_all)
    )
    # the REAL reference student class over the runnable ME shim
    student = am.AffinityPredictor(
        input_dim=feat_dim + 6, embed_dim=embed_dim, hidden_dim=hidden_dim
    )
    randomize_module_(student, seed + 1)
    # randomize running stats too so converted batch_stats are exercised
    g = torch.Generator().manual_seed(seed + 2)
    for mod in student.modules():
        if isinstance(mod, torch.nn.BatchNorm1d):
            mod.running_mean.data = torch.randn(mod.running_mean.shape, generator=g) * 0.1
            mod.running_var.data = 1.0 + 0.2 * torch.rand(mod.running_var.shape, generator=g)
    trainer.affinity_student = student

    # ---- 21-tuple batch (dataset/data_loader_ablation.py:373-394 layout) ----
    ori_rows, x_rows, y_rows, mask2d_rows = [], [], [], []
    for v in range(V):
        ids = np.where(vis[v])[0]
        ori = np.zeros((len(ids), 4), np.float32)
        ori[:, 0] = v
        ori[:, 1:] = points[ids]
        ori_rows.append(ori)
        x_rows.append(xl[v, ids])
        y_rows.append(yl[v, ids])
        m = np.zeros((N, 2), np.int64)
        m[:, 0] = v
        m[:, 1] = vis[v]
        mask2d_rows.append(m)
    ori_coords_3ds = torch.from_numpy(np.concatenate(ori_rows))
    sum_pv = ori_coords_3ds.shape[0]
    scene_coords = torch.from_numpy(
        np.concatenate([np.zeros((N, 1), np.float32), points], axis=1)
    )

    batch = (
        scene_coords,                                     # scene_coords [N,4]
        torch.from_numpy(voxel_coords.astype(np.int64)),  # scene_coords_3d
        torch.from_numpy(inds_reconstruct.astype(np.int64)),
        torch.from_numpy(labels),                         # scene_label
        ori_coords_3ds,
        None, None, None, None, None,
        torch.zeros(V, H, W),
        torch.zeros(V, H, W, 3),
        torch.from_numpy(np.concatenate(x_rows)),
        torch.from_numpy(np.concatenate(y_rows)),
        torch.from_numpy(np.concatenate(mask2d_rows)),
        torch.zeros(sum_pv, dtype=torch.long),
        torch.zeros(V * N, dtype=torch.long),
        torch.zeros(sum_pv, 4),
        None,
        torch.from_numpy(geom),                           # scene_gauss_features
    )

    # Run the composed chain TWICE: (a) straight fp32 — the reference's own
    # numerics; (b) an fp64 pass of the identical tail (same recorded lift
    # output, student+smoothing in double) as ground truth. The sharpen-x20
    # affinity softmax amplifies honest fp32 rounding (~1e-6 rel on the
    # student embeds -> ~3e-6 abs on weights -> ~19 rounds x |F| ≈ 4e-4 abs
    # on features — measured), so the meaningful pin is an ERROR-CLASS bound:
    # our divergence from fp64 must match the reference's own fp32 rounding,
    # not an absolute 1e-5-style tolerance no fp32 implementation can hit.
    real_lift = trainer.lift_xdecoder_features
    recorded = {}

    def recording_lift(bd):
        out = real_lift(bd)
        recorded["lift"] = out
        return out

    trainer.lift_xdecoder_features = recording_lift
    with torch.no_grad():
        student.eval()
        res = trainer.evaluate_scene(batch)

    def prediction_block(res_d, dtype):
        """validate() prediction block (run/validation.py:414-439, literal) +
        intersectionAndUnionGPU (util/util.py:161-177) minus the trailing
        .cuda() casts (no CUDA here); histogram semantics identical."""
        import torch.nn.functional as TF
        from sklearn.neighbors import KDTree

        scene_features_2d = TF.normalize(res_d["scene_features"].to(dtype), dim=-1)
        text_features = TF.normalize(res_d["text_features"].to(dtype), dim=-1)
        logits_pred_2d = res_d["logit_scale"] * (scene_features_2d @ text_features.t())
        scene_pred_2d = torch.max(logits_pred_2d, 1)[1]
        unseen_mask = torch.sum(scene_features_2d.abs(), dim=1) == 0
        if unseen_mask.any():
            seen_mask = ~unseen_mask
            seen_coords = scene_coords[seen_mask][:, 1:4]
            unseen_coords = scene_coords[unseen_mask][:, 1:4]
            if seen_coords.shape[0] > 0:
                kdtree = KDTree(seen_coords)
                _, indices = kdtree.query(unseen_coords, k=1)
                matched = torch.where(seen_mask)[0][indices.flatten()]
                scene_pred_2d[torch.where(unseen_mask)[0]] = scene_pred_2d[matched]

        output = scene_pred_2d.view(-1).clone()
        target = torch.from_numpy(labels).view(-1)
        for ignore_index in list(range(n_cls, n_cls + n_ignore)):
            output[target == ignore_index] = ignore_index
        intersection = output[output == target]
        area_i = torch.histc(intersection.float(), bins=n_cls, min=0, max=n_cls - 1)
        area_o = torch.histc(output.float(), bins=n_cls, min=0, max=n_cls - 1)
        area_t = torch.histc(target.float(), bins=n_cls, min=0, max=n_cls - 1)
        area_u = area_o + area_t - area_i
        return logits_pred_2d, scene_pred_2d, (area_i, area_u, area_t)

    logits32, pred32, iut32 = prediction_block(res, torch.float32)

    # fp64 ground-truth tail on the SAME fp32 lift output
    F_lift, text_t, ls_t = recorded["lift"]
    trainer.lift_xdecoder_features = lambda bd: (F_lift.double(), text_t, ls_t)
    student.double()
    with torch.no_grad():
        res64 = trainer.evaluate_scene(batch)
    logits64, pred64, iut64 = prediction_block(res64, torch.float64)
    student.float()
    trainer.lift_xdecoder_features = real_lift

    # Reference INTERMEDIATES, recomputed with the exact shim ops
    # evaluate_scene used internally (deterministic -> bit-identical): the
    # pre-amplification stages are where tight cross-implementation
    # tolerances are meaningful (the sharpen-x20 softmax amplifies fp32
    # noise beyond fixed tolerances downstream).
    import torch_scatter
    import faiss as _faiss
    import MinkowskiEngine as _ME
    import torch.nn.functional as TF

    inds_t = torch.from_numpy(inds_reconstruct.astype(np.int64))
    v_sem = torch_scatter.scatter_mean(F_lift, inds_t, dim=0)
    v_geom = torch_scatter.scatter_mean(
        torch.from_numpy(geom).float(), inds_t, dim=0
    )
    v_in = torch.cat([v_sem, v_geom], dim=1)
    with torch.no_grad():
        s_in = _ME.SparseTensor(
            features=v_in,
            coordinates=_ME.utils.batched_coordinates(
                [torch.from_numpy(voxel_coords.astype(np.int64))]
            ),
        )
        embed_ref = TF.normalize(student(s_in).F, p=2, dim=1)
    idx = _faiss.IndexFlatL2(3)
    cf = voxel_coords.astype(np.float32)
    idx.add(cf)
    _, ni = idx.search(cf, 97)
    ni = ni[:, 1:]
    aff = torch.einsum(
        "md,mkd->mk", embed_ref, embed_ref[torch.from_numpy(ni)]
    )
    w_ref = torch.softmax(aff * 20.0, dim=1)

    return {
        "voxel_in": v_in.numpy(),
        "embed": embed_ref.numpy(),
        "knn_idx": ni.astype(np.int32),
        "affinity_w": w_ref.numpy(),
        "points": points, "voxel_coords": voxel_coords,
        "inds_reconstruct": inds_reconstruct.astype(np.int32),
        "geom": geom, "labels": labels,
        "vis": vis, "xl": xl, "yl": yl,
        "teacher": teacher, "text": text, "logit_scale": logit_scale,
        "mask_hw": mask_hw, "num_points": N, "num_voxels": M,
        "n_cls": n_cls, "n_ignore": n_ignore,
        "student_state": {k: v.numpy() for k, v in student.state_dict().items()},
        "lift_features": F_lift.numpy(),
        "final_features": res["scene_features"].numpy(),
        "logits": logits32.numpy(),
        "pred": pred32.numpy(),
        "iut": tuple(a.numpy() for a in iut32),
        "final_features64": res64["scene_features"].numpy(),
        "logits64": logits64.numpy(),
        "pred64": pred64.numpy(),
        "iut64": tuple(a.numpy() for a in iut64),
    }


SEEM_DEMO_ATTN_ARCH = {
    # configs/seem/focall_unicl_lang_demo.yaml:168-193, verbatim semantics
    "VARIABLE": {
        "queries": ["object"],
        "tokens": ["grounding", "spatial", "visual", "audio"],
    },
    "SELF_ATTENTION": {
        "queries": {
            "object": ["queries_object", "tokens_grounding", "tokens_spatial",
                       "tokens_visual", "tokens_audio"],
        },
        "tokens": {
            "grounding": ["queries_object", "tokens_grounding"],
            "spatial": ["tokens_spatial"],
            "visual": ["tokens_visual"],
            "audio": ["queries_object", "tokens_audio"],
        },
    },
    "CROSS_ATTENTION": {
        "queries": {"object": True},
        "tokens": {"grounding": False, "spatial": False, "visual": False,
                   "audio": False},
    },
    "MASKING": ["tokens_spatial", "tokens_grounding", "tokens_visual",
                "tokens_audio"],
    "DUPLICATION": {
        "queries": {"grounding": "queries_object", "spatial": "queries_object"}
    },
    "SPATIAL_MEMORIES": 32,
}


def seem_demo_oracle(
    base_hw: Tuple[int, int] = (16, 24),
    hidden_dim: int = 32,
    mask_dim: int = 32,
    dim_proj: int = 32,
    num_queries: int = 7,
    nheads: int = 4,
    dim_feedforward: int = 64,
    dec_layers: int = 3,
    n_text: int = 5,
    n_grounding: int = 3,
    n_audio: int = 4,
    seed: int = 21,
) -> Dict:
    """Reference SEEM DEMO decoder (interface/seem_demo.py:27-396 +
    attention_data_struct_seemdemo.py + the demo yaml ATTENTION_ARCH) run
    TWICE: a ``refimg`` pass on a reference image extracting the visual
    prompt bundle (seem_demo.py:268-276), then the ``demo`` pass composing
    stroke (spatial) + text grounding + AUDIO + visual prompts in one
    forward. Prompt masks carry fewer nonzeros than max_spatial_len so
    rand_sample is a no-op and both passes are deterministic."""
    torch = _torch()
    from xdecoder.modeling.interface.seem_demo import SEEMDecoder

    rng = np.random.default_rng(seed)
    text = rng.normal(0, 1, (n_text, dim_proj)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    logit_scale_log = 0.7

    torch.manual_seed(seed)
    m = SEEMDecoder(
        lang_encoder=_lang_adapter(text, logit_scale_log),
        in_channels=hidden_dim,
        mask_classification=True,
        hidden_dim=hidden_dim,
        dim_proj=dim_proj,
        num_queries=num_queries,
        contxt_len=77,
        nheads=nheads,
        dim_feedforward=dim_feedforward,
        dec_layers=dec_layers,
        pre_norm=False,
        mask_dim=mask_dim,
        task_switch={"bbox": False, "mask": True, "spatial": True,
                     "grounding": True, "visual": True, "audio": True},
        enforce_input_project=False,
        max_spatial_len=[32, 32, 32, 32],
        attn_arch={k: v for k, v in SEEM_DEMO_ATTN_ARCH.items()},
    )
    randomize_module_(m, seed)
    m.eval()

    H, W = base_hw

    def feats(r):
        ms = [
            r.normal(0, 1, (1, hidden_dim, H // 4, W // 4)).astype(np.float32),
            r.normal(0, 1, (1, hidden_dim, H // 2, W // 2)).astype(np.float32),
            r.normal(0, 1, (1, hidden_dim, H, W)).astype(np.float32),
        ]
        mf = r.normal(0, 1, (1, mask_dim, H, W)).astype(np.float32)
        return ms, mf

    ms_ref, mf_ref = feats(rng)      # the reference image (visual prompt src)
    ms, mf = feats(rng)              # the target image

    # refimg prompts (on the reference image)
    rpos = np.zeros((1, H, W), bool)
    rpos[0, 2:5, 3:7] = True                              # 12 points < 32
    rneg = np.zeros((1, H, W), bool)
    rneg[0, 9:11, 12:14] = True                           # 4 points
    with torch.no_grad():
        visual = m(
            [torch.from_numpy(v) for v in ms_ref], torch.from_numpy(mf_ref),
            task="refimg",
            extra={
                "spatial_query_pos_mask": [torch.from_numpy(rpos)],
                "spatial_query_neg_mask": [torch.from_numpy(rneg)],
            },
        )

    # demo prompts (on the target image)
    pos_mask = np.zeros((1, H, W), bool)
    pos_mask[0, 3:6, 4:8] = True                          # 12 points
    neg_mask = np.zeros((1, H, W), bool)
    neg_mask[0, 10:12, 2:5] = True                        # 6 points
    grd = rng.normal(0, 1, (n_grounding, 1, hidden_dim)).astype(np.float32)
    aud = rng.normal(0, 1, (n_audio, 1, hidden_dim)).astype(np.float32)

    extra = {
        "spatial_query_pos_mask": [torch.from_numpy(pos_mask)],
        "spatial_query_neg_mask": [torch.from_numpy(neg_mask)],
        "grounding_tokens": torch.from_numpy(grd),
        "grounding_nonzero_mask": torch.zeros(1, n_grounding, dtype=torch.bool),
        "audio_tokens": torch.from_numpy(aud),
        "audio_nonzero_mask": torch.zeros(1, n_audio, dtype=torch.bool),
        "visual_query_pos": visual["visual_query_pos"],
        "visual_query_neg": visual["visual_query_neg"],
        "src_visual_queries": visual["src_visual_queries"],
        "src_visual_maskings": visual["src_visual_maskings"],
    }
    with torch.no_grad():
        outs = m(
            [torch.from_numpy(v) for v in ms], torch.from_numpy(mf),
            task="demo", extra=extra,
        )
    acts = {
        k: outs[k].numpy() for k in
        ("pred_logits", "pred_masks", "pred_maskembs", "pred_captions",
         "pred_pspatials", "pred_nspatials", "pred_pvisuals", "pred_nvisuals")
        if k in outs
    }
    return {
        "multi_scale_ref_nhwc": [np.ascontiguousarray(v.transpose(0, 2, 3, 1)) for v in ms_ref],
        "mask_features_ref_nhwc": np.ascontiguousarray(mf_ref.transpose(0, 2, 3, 1)),
        "multi_scale_nhwc": [np.ascontiguousarray(v.transpose(0, 2, 3, 1)) for v in ms],
        "mask_features_nhwc": np.ascontiguousarray(mf.transpose(0, 2, 3, 1)),
        "text": text,
        "logit_scale": float(m.lang_encoder.logit_scale.detach().exp()),
        "refimg_pos": rpos[0], "refimg_neg": rneg[0],
        "pos_mask": pos_mask[0], "neg_mask": neg_mask[0],
        "grounding_tokens": np.ascontiguousarray(grd.transpose(1, 0, 2)),
        "audio_tokens": np.ascontiguousarray(aud.transpose(1, 0, 2)),
        "visual_bundle": {
            "visual_query_pos": visual["visual_query_pos"].numpy(),
            "visual_query_neg": visual["visual_query_neg"].numpy(),
            "src_visual_queries": [
                np.ascontiguousarray(t.numpy().transpose(1, 0, 2))
                for t in visual["src_visual_queries"]
            ],
        },
        "acts": acts,
        "sd": {f"seem.{k}": v.numpy() for k, v in m.state_dict().items()},
        "dec_layers": dec_layers,
    }


def visual_sampler_oracle(h: int = 48, w: int = 64, n_inst: int = 3,
                          seed: int = 7) -> Dict:
    """Run the reference visual_sampler family (sampler.py / point.py /
    circle.py / scribble.py / polygon.py / simpleclick_sampler.py /
    mask_generators.py) on torch-cpu over synthetic elliptical instance
    masks, one seeded case per (sampler, mode). Each case records the seed
    and the sampler kwargs so the jax-side rebuild
    (data/visual_sampler.py) can re-seed and replay the identical rng
    stream in Draws.torch_compat mode — outputs then pin BIT-EXACTLY.

    The ellipses get a notch cut from one quadrant so the SimpleClick
    distance-transform argmax has a unique deepest pixel (symmetric blobs
    tie at the center, and the torch-vs-scipy conv noise could then flip
    the row-major tie-break)."""
    torch = _torch()
    from geopurify_tpu.parity.shims import add_xdecoder_inner_to_path

    add_xdecoder_inner_to_path()
    import importlib.util
    import random
    import sys

    # load visual_sampler as a STANDALONE package: importing it as
    # xdecoder.datasets.visual_sampler would execute datasets/__init__.py's
    # full registration cascade (refcoco/COCO/ADE registries) which needs
    # detectron2 machinery far beyond the shims' scope
    pkgdir = ("/root/reference/third_party/X-Decoder/xdecoder/datasets/"
              "visual_sampler")
    if "ref_visual_sampler" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "ref_visual_sampler", pkgdir + "/__init__.py",
            submodule_search_locations=[pkgdir])
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_visual_sampler"] = mod
        spec.loader.exec_module(mod)
    vsmod = sys.modules["ref_visual_sampler"]
    ShapeSampler = vsmod.ShapeSampler
    SimpleClickSampler = vsmod.SimpleClickSampler

    rng = np.random.default_rng(seed)
    masks = np.zeros((n_inst, h, w), bool)
    boxes = np.zeros((n_inst, 4), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n_inst):
        y0 = int(rng.integers(2, h - 22))
        x0 = int(rng.integers(2, w - 26))
        hh = int(rng.integers(14, 20))
        ww = int(rng.integers(16, 24))
        cy, cx = y0 + hh / 2, x0 + ww / 2
        ell = (((yy - cy) / (hh / 2)) ** 2 + ((xx - cx) / (ww / 2)) ** 2) <= 1.0
        # symmetry-breaking notch (see docstring)
        ell &= ~((yy < cy - hh // 4) & (xx < cx - 1) & (xx > cx - ww // 4))
        masks[i] = ell
        ys, xs = np.nonzero(ell)
        boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]

    names = ["Point", "Polygon", "Scribble", "Circle"]
    base = dict(
        max_candidate=2, point_num_points=20, polygon_max_points=9,
        circle_num_strokes=5, scribble_num_strokes=5, dilation=3,
        eval_max_iter=10,
    )

    def torch_cfg(probs):
        return {"STROKE_SAMPLER": {
            "MAX_CANDIDATE": base["max_candidate"],
            "CANDIDATE_PROBS": list(probs),
            "CANDIDATE_NAMES": names,
            "POINT": {"NUM_POINTS": base["point_num_points"]},
            "POLYGON": {"MAX_POINTS": base["polygon_max_points"]},
            "CIRCLE": {
                "NUM_STROKES": base["circle_num_strokes"],
                "STROKE_PRESET": [
                    "object_like", "object_like_middle", "object_like_small"],
                "STROKE_PROB": [0.33, 0.33, 0.33],
            },
            "SCRIBBLE": {
                "NUM_STROKES": base["scribble_num_strokes"],
                "STROKE_PRESET": ["rand_curve", "rand_curve_small"],
                "STROKE_PROB": [0.5, 0.5],
            },
            "DILATION": base["dilation"],
            "EVAL": {"MODE": "best", "NEGATIVE": False,
                     "MAX_ITER": base["eval_max_iter"]},
        }}

    class _T:
        def __init__(self, t):
            self.tensor = t

    class _Inst:
        def __init__(self, m, b):
            self.gt_masks = _T(m)
            self.gt_boxes = _T(b)

    def inst():
        # fresh clones per case: forward_box writes gt_masks IN-PLACE
        # (simpleclick_sampler.py:216-218) and .numpy() shares memory
        return _Inst(torch.from_numpy(masks).clone(),
                     torch.from_numpy(boxes).clone())

    cases: Dict[str, Dict] = {}

    def record(name, case_seed, out, **meta):
        cases[name] = dict(
            seed=case_seed,
            rand_shape=np.array(out["rand_shape"]),
            gt_masks=np.array(out["gt_masks"]),
            types=list(out["types"]), **meta,
        )

    def reseed(s):
        random.seed(s)
        np.random.seed(s)
        torch.manual_seed(s)

    # --- ShapeSampler, train: mixed + per-shape forced ---
    s = 1000
    reseed(s)
    out = ShapeSampler(torch_cfg([0.25, 0.25, 0.25, 0.25]), is_train=True)(inst())
    record("shape_train_mixed", s, out, kind="shape_train",
           probs=(0.25, 0.25, 0.25, 0.25))
    for j, nm in enumerate(names):
        probs = [0.0] * 4
        probs[j] = 1.0
        s = 1010 + j
        reseed(s)
        out = ShapeSampler(torch_cfg(probs), is_train=True)(inst())
        record(f"shape_train_{nm.lower()}", s, out, kind="shape_train",
               probs=tuple(probs))

    # --- ShapeSampler, eval (growing prompt sequences) ---
    for j, nm in enumerate(names):
        s = 1020 + j
        reseed(s)
        out = ShapeSampler(torch_cfg([0.25] * 4), is_train=False, mode=nm)(inst())
        record(f"shape_eval_{nm.lower()}", s, out, kind="shape_eval", mode=nm)

    # --- SimpleClickSampler, all modes, first-iteration click ---
    for j, nm in enumerate(["Point", "Circle", "Scribble", "Polygon", "Box"]):
        s = 1030 + j
        reseed(s)
        out = SimpleClickSampler(torch_cfg([0.25] * 4), is_train=False,
                                 mode=nm)(inst())
        record(f"click_{nm.lower()}", s, out, kind="click", mode=nm)

    return {
        "masks": masks, "boxes": boxes,
        "sampler_kwargs": dict(base), "cases": cases,
        "h": h, "w": w,
    }
