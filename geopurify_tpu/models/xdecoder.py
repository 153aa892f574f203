"""X-Decoder query decoder + assembled 2D teacher (seg inference path).

TPU-native rebuild of the reference's XDecoder interface and
GeneralizedXdecoder.forward_seg_all (reference third_party/X-Decoder/xdecoder/
modeling/interface/xdecoder.py:25-533, architectures/xdecoder_model.py:374-453):

- 201 learned queries (200 object + 1 latent class token), learned query PE,
  3-level memory with level embeddings and sine PE;
- 9 rounds of masked cross-attention (rotating scales) -> self-attention with a
  structured mask isolating the class token -> FFN;
- prediction heads each round: LayerNorm'd queries; class token re-aggregated as
  a similarity-weighted sum over object tokens; class embedding projected to the
  512-d joint space and scored against text embeddings by scaled cosine;
  mask embeddings via 3-layer MLP einsum'd with stride-4 mask features; the
  next round's attention mask is the bicubic-antialias-resized sigmoid mask
  thresholded at 0.5 (rows that mask everything are unmasked).

Everything is static-shape and jit-compiled once per image resolution.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from geopurify_tpu.config import XDecoderConfig
from geopurify_tpu.models.focalnet import FocalNet
from geopurify_tpu.models.layers import (
    CrossAttentionLayer,
    FFNLayer,
    MLPHead,
    SelfAttentionLayer,
    position_embedding_sine,
    resize_bicubic_antialias,
)
from geopurify_tpu.models.pixel_decoder import TransformerEncoderPixelDecoder

Dtype = Any


def _structured_self_attn_mask(num_queries: int, contxt_len: int = 0) -> np.ndarray:
    """[Q+T,Q+T] bool, True=blocked (interface/xdecoder.py:146-152): object
    queries and the class token are mutually isolated; with ``contxt_len``
    caption tokens appended (VLP task), queries don't attend captions,
    captions attend causally among themselves and CAN attend all queries."""
    Q, T = num_queries, contxt_len
    m = np.zeros((Q + T, Q + T), bool)
    m[:Q, Q:] = True                                   # queries never see captions
    m[Q:, Q:] = np.triu(np.ones((T, T), bool), 1)      # causal among captions
    m[: Q - 1, Q - 1 : Q] = True
    m[Q - 1 : Q, : Q - 1] = True
    return m


class XDecoderHead(nn.Module):
    """Query decoder over pixel-decoder outputs (seg task only)."""

    hidden_dim: int = 512
    dim_proj: int = 512
    num_queries: int = 201
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9
    mask_dim: int = 512
    pre_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        multi_scale: List[jax.Array],     # 3 NHWC maps, lowest-res first
        mask_features: jax.Array,         # [B, H4, W4, mask_dim]
        text_embeddings: jax.Array,       # [n_cls(+1), dim_proj] L2-normalized
        logit_scale: jax.Array,           # [] (already exp'd)
        caption_tokens: Optional[jax.Array] = None,  # [B, T, C] lang token
        # hiddens — VLP pretraining task (xdecoder.py:227-233): captions join
        # the queries through the structured mask's causal block
        return_aux: bool = False,
        # parity instrumentation (VERDICT r3 item #5): collect the per-round
        # PRE-threshold stride-4 mask logits + the binarized attn masks
        attn_mask_override: Optional[List[jax.Array]] = None,
        # parity instrumentation: force round i's cross-attn mask to the
        # given [B, Q(+T), HW_level] bool (True = block) — running both
        # implementations on the SAME binarized masks removes the
        # 0.5-threshold amplifier from the comparison
    ) -> Dict[str, jax.Array]:
        B = mask_features.shape[0]
        Q = self.num_queries
        C = self.hidden_dim
        num_levels = len(multi_scale)
        T = caption_tokens.shape[1] if caption_tokens is not None else 0

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (num_levels, C)
        )
        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (Q, C)
        )
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (Q, C)
        )
        class_proj = self.param(
            "class_embed", nn.initializers.truncated_normal(0.02),
            (C, self.dim_proj),
        )
        mask_mlp = MLPHead(C, self.mask_dim, 3, dtype=self.dtype, name="mask_embed")
        decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="decoder_norm")

        srcs, poss, sizes = [], [], []
        for i, x in enumerate(multi_scale):
            b, h, w, c = x.shape
            sizes.append((h, w))
            pe = position_embedding_sine(h, w, C // 2, dtype=self.dtype)
            poss.append(jnp.broadcast_to(pe[None], (b, h, w, C)).reshape(b, h * w, C))
            srcs.append(x.reshape(b, h * w, c) + level_embed[i][None, None].astype(self.dtype))

        self_mask = jnp.asarray(
            _structured_self_attn_mask(Q, T)
        )[None, None]                                   # [1,1,Q+T,Q+T]

        mf = mask_features.astype(jnp.float32)
        text_t = text_embeddings.astype(jnp.float32)
        if T:
            # caption projection to the joint space (xdecoder.py:140-144) and
            # the caption-slot positional embedding (pos_embed_caping)
            caping_embed = self.param(
                "caping_embed", nn.initializers.truncated_normal(0.02),
                (C, self.dim_proj),
            )
            pos_embed_caping = self.param(
                "pos_embed_caping", nn.initializers.normal(1.0), (T, C)
            )

        # INFERENCE fast path (return_aux=False): the bicubic attn-mask
        # resize and the mask einsum are BOTH linear, so they commute —
        # resize(m_emb @ mf) == m_emb @ resize(mf). mf is resized to the
        # three level sizes ONCE, and each round's attention mask is an
        # einsum at TARGET resolution ([B,Q,336..5376]) instead of the full
        # stride-4 [B,Q,19602] product + per-round resize (measured 6.55 +
        # 2.9 ms/round of the 18.8 ms round at B=64). fp-reassociation only;
        # the parity path (return_aux=True) keeps the reference-shaped
        # order so the oracle pins compare identical computations.
        fast_masks = not return_aux
        if fast_masks:
            mf_small = [
                resize_bicubic_antialias(mf, tuple(s)) for s in sizes
            ]

        def prediction_heads(output: jax.Array, target_size: Tuple[int, int],
                             level: int = 0, want_full: bool = True):
            dec_all = decoder_norm(output).astype(jnp.float32)      # [B,Q+T,C]
            capt = dec_all[:, Q:] @ caping_embed if T else None     # [B,T,dp]
            dec = dec_all[:, :Q]
            ndec = dec / (jnp.linalg.norm(dec, axis=-1, keepdims=True) + 1e-7)
            obj_tok = ndec[:, : Q - 1]
            cls_tok = ndec[:, Q - 1 : Q]
            sim = jax.nn.softmax(
                jnp.einsum("bic,bqc->biq", cls_tok, obj_tok), axis=-1
            )[:, 0, :, None]
            cls_re = jnp.sum(sim * dec[:, : Q - 1], axis=1, keepdims=True)
            dec_out = jnp.concatenate([dec[:, : Q - 1], cls_re], axis=1)  # [B,Q,C]

            class_embed = dec_out @ class_proj                        # [B,Q,dim_proj]
            v = class_embed / (jnp.linalg.norm(class_embed, axis=-1, keepdims=True) + 1e-7)
            outputs_class = logit_scale * jnp.einsum("bqd,nd->bqn", v, text_t)

            m_emb = mask_mlp(dec_out.astype(self.dtype)).astype(jnp.float32)
            outputs_mask = (
                jnp.einsum("bqc,bhwc->bqhw", m_emb, mf)   # stride-4 masks
                if (want_full or not fast_masks) else None
            )
            if fast_masks:
                # commuted form: einsum directly at the target scale
                am = jnp.einsum("bqc,bhwc->bqhw", m_emb, mf_small[level])
            else:
                # next-round attention mask at the target scale
                am = resize_bicubic_antialias(
                    outputs_mask.transpose(0, 2, 3, 1), target_size
                ).transpose(0, 3, 1, 2)                               # [B,Q,h,w]
            am = jax.nn.sigmoid(am).reshape(B, Q, -1) < 0.5           # True=block
            # unmask rows that block everything (xdecoder.py:262)
            all_blocked = jnp.all(am, axis=-1, keepdims=True)
            am = am & ~all_blocked
            # NOTE the reference's "fill False for cls token" (xdecoder.py:467,
            # attn_mask[:, num_queries:num_queries+1]) slices PAST the last row
            # — an empty slice, so the cls token is mask-gated like any object
            # query. Torch-oracle-pinned; an earlier unmask here shifted
            # cls_logits by ~7e-3.
            if T:
                # caption rows attend the full memory (xdecoder.py:265-267)
                am = jnp.concatenate(
                    [am, jnp.zeros((B, T, am.shape[-1]), bool)], axis=1
                )
            attn_mask = am[:, None]                               # [B,1,Q+T,HW]
            return outputs_class, outputs_mask, class_embed, capt, attn_mask

        output = jnp.broadcast_to(query_feat[None], (B, Q, C)).astype(self.dtype)
        qpe = jnp.broadcast_to(query_embed[None], (B, Q, C)).astype(self.dtype)
        if T:
            # queries see detached caption states; the caption QPE carries the
            # (live) lang embedding + pos_embed_caping (xdecoder.py:229-233)
            cap = caption_tokens.astype(self.dtype)
            output = jnp.concatenate([output, jax.lax.stop_gradient(cap)], axis=1)
            qpe = jnp.concatenate(
                [qpe, cap + pos_embed_caping[None].astype(self.dtype)], axis=1
            )

        outputs_class, outputs_mask, class_embed, capt, attn_mask = (
            prediction_heads(output, sizes[0], level=0,
                             want_full=(not fast_masks)
                             or self.dec_layers == 0)
        )
        aux_masks = [outputs_mask]
        aux_attn = [attn_mask]
        for i in range(self.dec_layers):
            level = i % num_levels
            if attn_mask_override is not None:
                attn_mask = attn_mask_override[i][:, None]
            output = CrossAttentionLayer(
                C, self.nheads, self.pre_norm, self.dtype,
                name=f"cross_attn{i}",
            )(output, srcs[level], memory_mask=attn_mask, pos=poss[level], query_pos=qpe)
            output = SelfAttentionLayer(
                C, self.nheads, self.pre_norm, self.dtype, name=f"self_attn{i}"
            )(output, query_pos=qpe, tgt_mask=self_mask)
            output = FFNLayer(
                C, self.dim_feedforward, self.pre_norm, dtype=self.dtype,
                name=f"ffn{i}",
            )(output)
            outputs_class, outputs_mask, class_embed, capt, attn_mask = (
                prediction_heads(
                    output, sizes[(i + 1) % num_levels],
                    level=(i + 1) % num_levels,
                    want_full=(not fast_masks) or i == self.dec_layers - 1,
                )
            )
            aux_masks.append(outputs_mask)
            aux_attn.append(attn_mask)

        # slice 201 -> 200 object queries (xdecoder_model.py:408-453)
        out = {
            "pred_logits": outputs_class[:, : Q - 1],
            "pred_masks": outputs_mask[:, : Q - 1],
            "mask_embed": class_embed[:, : Q - 1],
            "cls_logits": outputs_class[:, Q - 1],
            # class-token embedding — the retrieval image descriptor
            # (evaluate_retrieval, xdecoder_model.py:623: pred_captions[:,-1])
            "cls_embed": class_embed[:, Q - 1],
        }
        if T:
            out["pred_captionings"] = capt                        # [B,T,dim_proj]
            out["pred_captions"] = class_embed                    # incl cls row
        if return_aux:
            out["aux_masks"] = aux_masks        # dec_layers+1 x [B,Q,H4,W4]
            out["aux_attn"] = aux_attn          # binarized, [B,1,Q+T,HW_lvl]
        return out


def _model_dtype(cfg: XDecoderConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def _normalize_and_pad(cfg: XDecoderConfig, images: jax.Array) -> jax.Array:
    """Pixel normalization + /size_divisibility padding
    (ImageList.from_tensors, xdecoder_model.py:375-377)."""
    mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
    std = jnp.asarray(cfg.pixel_std, jnp.float32)
    x = (images.astype(jnp.float32) - mean) / std
    H, W = x.shape[1:3]
    div = cfg.size_divisibility
    Hp = -(-H // div) * div
    Wp = -(-W // div) * div
    return jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))


def _make_backbone(cfg: XDecoderConfig, name: Optional[str] = None) -> nn.Module:
    dtype = _model_dtype(cfg)
    if cfg.backbone_type == "davit":
        from geopurify_tpu.models.davit import DaViT

        return DaViT(dtype=dtype, name=name)
    if cfg.backbone_type == "vit":
        from geopurify_tpu.models.vit_backbone import ViTBackbone

        return ViTBackbone(dtype=dtype, name=name)
    return FocalNet(
        embed_dim=cfg.backbone.embed_dim,
        depths=tuple(cfg.backbone.depths),
        focal_levels=tuple(cfg.backbone.focal_levels),
        focal_windows=tuple(cfg.backbone.focal_windows),
        mlp_ratio=cfg.backbone.mlp_ratio,
        use_conv_embed=cfg.backbone.use_conv_embed,
        use_postln=cfg.backbone.use_postln,
        use_postln_in_modulation=cfg.backbone.use_postln_in_modulation,
        scaling_modulator=cfg.backbone.scaling_modulator,
        use_layerscale=cfg.backbone.use_layerscale,
        use_dw=(cfg.backbone.variant == "focal_dw"),
        use_pre_norms=tuple(cfg.backbone.use_pre_norms),
        # bf16 compute only: measured bf16-ulp-equivalent (+15% at V=64);
        # the f32 parity path keeps the exact erf regardless of the flag
        fast_gelu=cfg.backbone.fast_gelu and dtype == jnp.bfloat16,
        patch_size=cfg.backbone.patch_size,
        dtype=dtype,
        name=name,
    )


def _make_pixel_decoder(cfg: XDecoderConfig, name: Optional[str] = None) -> nn.Module:
    dtype = _model_dtype(cfg)
    if cfg.pixel_decoder == "deform":
        from geopurify_tpu.models.pixel_decoder_deform import (
            MSDeformAttnPixelDecoder,
        )

        return MSDeformAttnPixelDecoder(
            conv_dim=cfg.conv_dim,
            mask_dim=cfg.mask_dim,
            num_enc_layers=cfg.enc_layers,
            num_heads=cfg.nheads,
            dim_feedforward=cfg.dim_feedforward,
            dtype=dtype,
            name=name,
        )
    return TransformerEncoderPixelDecoder(
        conv_dim=cfg.conv_dim,
        mask_dim=cfg.mask_dim,
        num_enc_layers=cfg.enc_layers,
        num_heads=cfg.nheads,
        dim_feedforward=cfg.dim_feedforward,
        pre_norm=cfg.pre_norm,
        dtype=dtype,
        name=name,
    )


def _make_head(cfg: XDecoderConfig, name: Optional[str] = None) -> "XDecoderHead":
    return XDecoderHead(
        hidden_dim=cfg.hidden_dim,
        dim_proj=cfg.hidden_dim,
        num_queries=cfg.num_queries,
        nheads=cfg.nheads,
        dim_feedforward=cfg.dim_feedforward,
        dec_layers=cfg.dec_layers,
        mask_dim=cfg.mask_dim,
        pre_norm=cfg.pre_norm,
        dtype=_model_dtype(cfg),
        name=name,
    )


def encode_pixel_features(
    cfg: XDecoderConfig, variables, images: jax.Array
) -> Tuple[jax.Array, List[jax.Array]]:
    """The image-encoding half of ``XDecoderSegModel`` (normalize/pad +
    backbone + pixel decoder), driven standalone with the full model's param
    tree sliced by submodule name. Lets inference loops that re-run only the
    query decoder (captioning greedy decode, interactive refinement) pay for
    the backbone once — equivalence with the assembled model is test-pinned
    (tests/test_inference2d.py). Returns (mask_features, multi_scale)."""
    x = _normalize_and_pad(cfg, images)
    params = variables["params"]
    feats = _make_backbone(cfg).apply(
        {"params": params["backbone"]}, x.astype(_model_dtype(cfg))
    )
    mask_features, _, multi_scale = _make_pixel_decoder(cfg).apply(
        {"params": params["pixel_decoder"]}, feats
    )
    return mask_features, multi_scale


def apply_head(
    cfg: XDecoderConfig,
    variables,
    multi_scale: Sequence[jax.Array],
    mask_features: jax.Array,
    text_embeddings: jax.Array,
    logit_scale: jax.Array,
    caption_tokens: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """The query-decoder half of ``XDecoderSegModel``, standalone (see
    encode_pixel_features)."""
    return _make_head(cfg).apply(
        {"params": variables["params"]["predictor"]},
        list(multi_scale), mask_features, text_embeddings, logit_scale,
        caption_tokens=caption_tokens,
    )


class XDecoderSegModel(nn.Module):
    """Backbone + pixel decoder + query decoder — forward_seg_all equivalent.

    Text embeddings are precomputed offline (see models/lang.embed_class_names)
    and passed as an argument: the frozen text tower never rides the per-view
    hot loop, which is the TPU-friendly restructuring of the reference's cached
    ``default_text_embeddings`` buffer.
    """

    cfg: XDecoderConfig

    @nn.compact
    def __call__(
        self,
        images: jax.Array,            # [B,H,W,3] raw RGB (0..255 scale)
        text_embeddings: jax.Array,   # [n_cls+1, dim_proj], background last
        logit_scale: jax.Array,       # [] already exp'd
        caption_tokens: Optional[jax.Array] = None,  # [B,T,C] — VLP task
    ) -> Dict[str, jax.Array]:
        c = self.cfg
        dtype = _model_dtype(c)
        x = _normalize_and_pad(c, images)
        Hp, Wp = x.shape[1:3]

        feats = _make_backbone(c, name="backbone")(x.astype(dtype))
        mask_features, _, multi_scale = _make_pixel_decoder(
            c, name="pixel_decoder"
        )(feats)
        out = _make_head(c, name="predictor")(
            multi_scale, mask_features, text_embeddings, logit_scale,
            caption_tokens=caption_tokens,
        )
        out["padded_hw"] = jnp.asarray([Hp, Wp])
        return out
