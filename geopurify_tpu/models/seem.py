"""SEEM interactive segmentation heads (TPU-native).

``SEEMHead`` is the FAITHFUL v0 decoder — the reference's variable-group
dataflow (interface/seem_v0.py:27-392 + prototype/
attention_data_struct_seemv0.py + the v0 yaml ATTENTION_ARCH) rebuilt with
static shapes: duplicated grounding/spatial query sets, learned spatial
memories, per-level point-sampled prompt tokens, group-structured
self-attention, and per-group predicted-mask cross-attention masks.
Activation parity vs the mounted torch reference is pinned at rel ~1e-6
(tests/test_torch_parity.py::test_parity_seem) — see the class docstring
for the full semantics map.

``SEEMHeadV1`` is the FAITHFUL v1 decoder (interface/seem_v1.py +
attention_data_struct_seemv1.py): multi-mask prompts with per-mask means,
object queries rand-sampled into sample_size-per-mask spatial query groups
(the torch RNG draws ride as explicit inputs), per-mask block-diagonal
self-attention, and per-layer channel-matched prev-mask memories — also
oracle-pinned at rel ~1e-6. It backs the `geopurify-interactive` demo's
click-refinement loop.

Static shapes throughout: prompt budgets are config constants with validity
masks; everything jits.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from geopurify_tpu.models.layers import (
    CrossAttentionLayer,
    FFNLayer,
    MLPHead,
    SelfAttentionLayer,
    position_embedding_sine,
    resize_bilinear_torch,
)
from geopurify_tpu.ops.ms_deform_attn import bilinear_sample

Dtype = Any


def sample_mask_points(
    mask: np.ndarray, budget: int, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray]:
    """Click/mask prompt -> up to ``budget`` normalized (y, x) points + valid
    mask (≙ rand_sample over mask.nonzero(), seem_v0.py:226). Host-side."""
    ys, xs = np.nonzero(mask)
    H, W = mask.shape
    n = len(ys)
    pts = np.zeros((budget, 2), np.float32)
    valid = np.zeros(budget, bool)
    if n:
        take = min(n, budget)
        sel = rng.choice(n, take, replace=False) if n > budget else np.arange(n)
        pts[:take, 0] = ys[sel] / H
        pts[:take, 1] = xs[sel] / W
        valid[:take] = True
    return pts, valid


class SEEMHead(nn.Module):
    """SEEM v0 decoder — faithful AttentionDataStruct dataflow.

    Variable groups and their interactions mirror the reference exactly
    (seem_v0.py:27-392 + prototype/attention_data_struct_seemv0.py +
    configs/seem/focall_unicl_lang_v0.yaml ATTENTION_ARCH):

    - CROSS-ATTENTION participants, in order: ``queries_object`` [Q],
      ``queries_grounding`` [Q] and ``queries_spatial`` [Q] (both initialized
      as COPIES of the object queries — the DUPLICATION table), and
      ``memories_spatial`` [M] learned memory slots (participating only when
      ``prev_mask`` is given). Prompt TOKENS never cross-attend.
    - SELF-ATTENTION sequence order: [q_obj, q_grd, q_spa, tok_grd, tok_spa,
      mem]; interactions: object queries see only each other (semantic
      predictions identical with/without prompts — test-pinned); grounding
      queries see themselves + grounding tokens (bidirectionally); spatial
      queries see themselves + spatial tokens + memories; each token group
      sees itself; memories see themselves. Invalid (padded) prompt slots
      are blocked as keys.
    - Spatial tokens: per level, ``src`` (level-embedded flattened features)
      projected by ``mask_spatial_embed[i]`` and point-sampled at the prompt
      points with align_corners=True (point_sample, seem_v0.py:243-258);
      a learned ±1 ``pn_indicator`` row is added. The group is REFRESHED with
      the level's tokens every layer. Token positional embeddings are the
      (detached) token values themselves (seem_v0.py:306-309, :333-336).
    - ``pred_pspatials``/``pred_nspatials``: mean of mask_features sampled at
      the positive/negative points (seem_v0.py:225-237).
    - Prediction heads run on the cross-attention variables; the next-round
      attention masks are the groups' own predicted masks, BILINEARLY resized
      (align_corners=False — not the X-Decoder head's bicubic-antialias),
      thresholded at sigmoid 0.5, with all-blocked rows unmasked
      (cross_attn_mask, attention_data_struct_seemv0.py:163-175); the memory
      rows' mask comes from ``prev_mask`` instead.

    Outputs use the reference's organize_output names (pred_logits,
    pred_masks, pred_gmasks, pred_gtexts, pred_captions, pred_smasks,
    pred_smaskembs, pred_pspatials, pred_nspatials) plus ``prev_mask`` — the
    best spatial-query mask selected by pred_smaskembs @ pred_pspatials
    (update_spatial_results, attention_data_struct_seemv0.py:215-234).

    NOTE: initialize (``.init``) with every prompt kind you will use at apply
    time — flax creates the spatial/grounding parameters lazily.
    """

    hidden_dim: int = 512
    dim_proj: int = 512
    num_queries: int = 101
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9
    mask_dim: int = 512
    max_spatial_tokens: int = 512          # MAX_SPATIAL_LEN per level
    num_spatial_memories: int = 32         # SPATIAL_MEMORIES
    max_grounding_tokens: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        multi_scale: List[jax.Array],       # 3 NHWC maps, lowest-res first
        mask_features: jax.Array,           # [B, H4, W4, mask_dim]
        text_embeddings: jax.Array,         # [n_cls, dim_proj] L2-normalized
        logit_scale: jax.Array,
        spatial_points: Optional[jax.Array] = None,   # [B, S, 2] norm (y/H, x/W)
        spatial_valid: Optional[jax.Array] = None,    # [B, S] bool
        spatial_posneg: Optional[jax.Array] = None,   # [B, S] +1 / -1
        grounding_tokens: Optional[jax.Array] = None, # [B, G, C]
        grounding_valid: Optional[jax.Array] = None,  # [B, G] bool
        prev_mask: Optional[jax.Array] = None,        # [B, 1, H4, W4] logits
    ) -> Dict[str, jax.Array]:
        B = mask_features.shape[0]
        Q = self.num_queries
        C = self.hidden_dim
        S = self.max_spatial_tokens
        G = self.max_grounding_tokens
        M = self.num_spatial_memories
        num_levels = len(multi_scale)
        has_spatial = spatial_points is not None
        has_grounding = grounding_tokens is not None
        if has_grounding:
            assert grounding_valid is not None, "grounding_tokens needs grounding_valid"
        has_memory = has_spatial and prev_mask is not None

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (num_levels, C)
        )
        query_feat = self.param("query_feat", nn.initializers.normal(1.0), (Q, C))
        query_embed = self.param("query_embed", nn.initializers.normal(1.0), (Q, C))
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
            srcs.append(
                x.reshape(b, h * w, c) + level_embed[i][None, None].astype(self.dtype)
            )

        def samp_ac_true(fmap, pts, h, w):
            """point_sample(align_corners=True): pixel = p * (size - 1)."""
            return bilinear_sample(fmap, pts[:, 1] * (w - 1), pts[:, 0] * (h - 1))

        mf = mask_features.astype(jnp.float32)
        Hm, Wm = mf.shape[1:3]
        text_t = text_embeddings.astype(jnp.float32)

        spatial_tokens_by_level = []
        sq_pos = sq_neg = None
        if has_spatial:
            pn_indicator = self.param(
                "pn_indicator", nn.initializers.normal(0.02), (2, C)
            )
            pts = spatial_points.astype(jnp.float32)
            # mean pos / neg spatial queries from mask_features (seem_v0.py:
            # 225-237; empty sets nan_to_num to 0)
            mf_at = jax.vmap(lambda fb, p: samp_ac_true(fb, p, Hm, Wm))(mf, pts)
            for sign in (1, -1):
                wgt = (spatial_valid & (spatial_posneg * sign > 0)).astype(jnp.float32)
                mean = jnp.einsum("bs,bsd->bd", wgt, mf_at) / jnp.maximum(
                    jnp.sum(wgt, axis=1, keepdims=True), 1.0
                )
                if sign == 1:
                    sq_pos = mean
                else:
                    sq_neg = mean
            for i in range(num_levels):
                h, w = sizes[i]
                proj = self.param(
                    f"mask_spatial_embed{i}",
                    nn.initializers.truncated_normal(0.02), (C, C),
                )
                feat = srcs[i].astype(jnp.float32).reshape(B, h, w, C) @ proj
                tok = jax.vmap(lambda fb, p: samp_ac_true(fb, p, h, w))(feat, pts)
                tag = jnp.where(
                    (spatial_posneg > 0)[..., None],
                    pn_indicator[0][None, None], pn_indicator[1][None, None],
                )
                tok = jnp.where(spatial_valid[..., None], tok + tag, 0.0)
                spatial_tokens_by_level.append(tok.astype(self.dtype))

        if has_spatial:
            spatial_embed = self.param(
                "spatial_embed", nn.initializers.normal(1.0), (M, C)
            )
            spatial_featured = self.param(
                "spatial_featured", nn.initializers.normal(1.0), (M, C)
            )

        # ---- group bookkeeping -------------------------------------------
        # cross order: [q_obj, q_grd?, q_spa?, mem?]; self order appends the
        # token groups BEFORE the memories: [.., tok_grd?, tok_spa?, mem?]
        n_grd_q = Q if has_grounding else 0
        n_spa_q = Q if has_spatial else 0
        n_mem = M if has_memory else 0
        NX = Q + n_grd_q + n_spa_q + n_mem
        o_obj = 0
        o_grd = Q
        o_spa = Q + n_grd_q
        o_mem = Q + n_grd_q + n_spa_q

        obj0 = jnp.broadcast_to(query_feat[None], (B, Q, C))
        x_parts = [obj0]
        xp_parts = [jnp.broadcast_to(query_embed[None], (B, Q, C))]
        if has_grounding:
            x_parts.append(obj0)            # DUPLICATION: copy of object init
            xp_parts.append(xp_parts[0])
        if has_spatial:
            x_parts.append(obj0)
            xp_parts.append(xp_parts[0])
        if has_memory:
            x_parts.append(jnp.broadcast_to(spatial_featured[None], (B, M, C)))
            xp_parts.append(jnp.broadcast_to(spatial_embed[None], (B, M, C)))
        X = jnp.concatenate(x_parts, axis=1).astype(self.dtype)
        X_pos = jnp.concatenate(xp_parts, axis=1).astype(self.dtype)

        n_tok_grd = G if has_grounding else 0
        n_tok_spa = S if has_spatial else 0
        NY = Q + n_grd_q + n_spa_q + n_tok_grd + n_tok_spa + n_mem
        y_grd_t = Q + n_grd_q + n_spa_q
        y_spa_t = y_grd_t + n_tok_grd
        y_mem = y_spa_t + n_tok_spa

        # self-attention interaction mask (True = BLOCKED)
        base = np.ones((NY, NY), bool)
        base[o_obj:o_obj + Q, o_obj:o_obj + Q] = False
        if has_grounding:
            base[o_grd:o_grd + Q, o_grd:o_grd + Q] = False
            base[o_grd:o_grd + Q, y_grd_t:y_grd_t + G] = False
            base[y_grd_t:y_grd_t + G, o_grd:o_grd + Q] = False
            base[y_grd_t:y_grd_t + G, y_grd_t:y_grd_t + G] = False
        if has_spatial:
            base[o_spa:o_spa + Q, o_spa:o_spa + Q] = False
            base[o_spa:o_spa + Q, y_spa_t:y_spa_t + S] = False
            base[y_spa_t:y_spa_t + S, y_spa_t:y_spa_t + S] = False
        if has_memory:
            base[o_spa:o_spa + Q, y_mem:y_mem + M] = False
            base[y_mem:y_mem + M, y_mem:y_mem + M] = False
        base = jnp.asarray(base)[None, None]

        key_valid = [jnp.ones((B, Q + n_grd_q + n_spa_q), bool)]
        if has_grounding:
            key_valid.append(grounding_valid)
        if has_spatial:
            key_valid.append(spatial_valid)
        if has_memory:
            key_valid.append(jnp.ones((B, M), bool))
        key_valid = jnp.concatenate(key_valid, axis=1)
        self_mask = base | (~key_valid)[:, None, None, :]

        if has_memory:
            pm = prev_mask.astype(jnp.float32)                  # [B, 1, H, W]

        def prediction_heads(Xo, target_size):
            dec = decoder_norm(Xo).astype(jnp.float32)          # [B, NX, C]
            cls_emb = dec @ class_proj                          # [B, NX, dp]
            v = cls_emb / (jnp.linalg.norm(cls_emb, axis=-1, keepdims=True) + 1e-7)
            outputs_class = logit_scale * jnp.einsum("bqd,nd->bqn", v, text_t)
            m_emb = mask_mlp(dec.astype(self.dtype)).astype(jnp.float32)
            masks = jnp.einsum("blc,bhwc->blhw", m_emb, mf)     # [B, NX, H, W]

            # next-round attn masks: bilinear (align_corners=False) <0.5
            am = resize_bilinear_torch(
                masks.transpose(0, 2, 3, 1), target_size
            ).transpose(0, 3, 1, 2)
            am = jax.nn.sigmoid(am).reshape(B, NX, -1) < 0.5
            if has_memory:
                mm = resize_bilinear_torch(pm.transpose(0, 2, 3, 1), target_size)
                # transpose before flatten (single channel here, but keep the
                # layout honest — see the v1 head's NM>1 case)
                mm = jax.nn.sigmoid(mm.transpose(0, 3, 1, 2)).reshape(B, 1, -1) < 0.5
                am = am.at[:, o_mem:o_mem + M].set(
                    jnp.broadcast_to(mm, (B, M, mm.shape[-1]))
                )
            all_blocked = jnp.all(am, axis=-1, keepdims=True)
            am = am & ~all_blocked
            return outputs_class, masks, m_emb, cls_emb, am[:, None]

        oc, masks, m_emb, cls_emb, attn_mask = prediction_heads(X, sizes[0])
        tok_grd = grounding_tokens.astype(self.dtype) if has_grounding else None
        tok_grd_pos = (
            jax.lax.stop_gradient(tok_grd) if has_grounding else None
        )
        for i in range(self.dec_layers):
            level = i % num_levels
            X = CrossAttentionLayer(
                C, self.nheads, False, self.dtype, name=f"cross_attn{i}",
            )(X, srcs[level], memory_mask=attn_mask,
              pos=poss[level], query_pos=X_pos)

            # assemble the self-attn sequence (memories move AFTER the tokens)
            y_parts = [X[:, : Q + n_grd_q + n_spa_q]]
            yp_parts = [X_pos[:, : Q + n_grd_q + n_spa_q]]
            if has_grounding:
                y_parts.append(tok_grd)
                yp_parts.append(tok_grd_pos)
            if has_spatial:
                tok_spa = spatial_tokens_by_level[level]
                y_parts.append(tok_spa)
                yp_parts.append(jax.lax.stop_gradient(tok_spa))
            if has_memory:
                y_parts.append(X[:, o_mem:o_mem + M])
                yp_parts.append(X_pos[:, o_mem:o_mem + M])
            Y = jnp.concatenate(y_parts, axis=1)
            Y_pos = jnp.concatenate(yp_parts, axis=1)

            Y = SelfAttentionLayer(
                C, self.nheads, False, self.dtype, name=f"self_attn{i}"
            )(Y, query_pos=Y_pos, tgt_mask=self_mask)
            Y = FFNLayer(
                C, self.dim_feedforward, False, dtype=self.dtype, name=f"ffn{i}",
            )(Y)

            # write back: query groups + memories to X; grounding tokens
            # persist across layers, spatial tokens are refreshed per level
            x_parts = [Y[:, : Q + n_grd_q + n_spa_q]]
            if has_memory:
                x_parts.append(Y[:, y_mem:y_mem + M])
            X = jnp.concatenate(x_parts, axis=1)
            if has_grounding:
                tok_grd = Y[:, y_grd_t:y_grd_t + G]

            oc, masks, m_emb, cls_emb, attn_mask = prediction_heads(
                X, sizes[(i + 1) % num_levels]
            )

        out = {
            "pred_logits": oc[:, o_obj:o_obj + Q],
            "pred_masks": masks[:, o_obj:o_obj + Q],
            "pred_captions": cls_emb[:, o_obj:o_obj + Q],
        }
        if has_grounding:
            out["pred_gmasks"] = masks[:, o_grd:o_grd + Q]
            out["pred_gtexts"] = cls_emb[:, o_grd:o_grd + Q]
        if has_spatial:
            out["pred_smasks"] = masks[:, o_spa:o_spa + Q]
            out["pred_smaskembs"] = m_emb[:, o_spa:o_spa + Q]
            out["pred_pspatials"] = sq_pos[:, None]             # [B, 1, mask_dim]
            out["pred_nspatials"] = sq_neg[:, None]
            # update_spatial_results: best spatial query by maskemb-vs-pos
            # similarity (attention_data_struct_seemv0.py:215-234)
            sel_logits = jnp.einsum(
                "bqd,bd->bq", out["pred_smaskembs"], sq_pos
            )
            best = jnp.argmax(sel_logits, axis=1)
            out["prev_mask"] = jnp.take_along_axis(
                out["pred_smasks"], best[:, None, None, None], axis=1
            )                                                   # [B, 1, H, W]
        return out


class SEEMHeadV1(nn.Module):
    """SEEM v1 decoder — faithful dataflow (interface/seem_v1.py:27-389 +
    prototype/attention_data_struct_seemv1.py + the v1 yaml ATTENTION_ARCH).

    v1 extends the (pinned) v0 group structure to MULTI-MASK prompts:

    - prompt points carry a MASK ID; ``pred_pspatials``/``pred_nspatials``
      are per-mask means of mask_features at the pos/neg points (empty masks
      fill with -1, seem_v1.py:228-242);
    - ``queries_spatial`` is the object-query set RAND-SAMPLED to
      ``sample_size * num_masks`` rows (attention_data set(...,
      sample_size=...) -> Variable.rand_sample: torch.randint draws). The
      draws are NOT derivable deterministically across frameworks, so this
      head takes them as an explicit input (``spatial_query_indices``) —
      the host (or the parity oracle) supplies them;
    - the spatial-query self-attention block is BLOCK-DIAGONAL per mask,
      and spatial queries attend only tokens of THEIR mask
      (attention_data_struct_seemv1.py:237-247);
    - with ``prev_mask`` [B, num_masks, H, W], the memory rows' cross-attn
      masks come from prev_mask channels chosen by ``memory_indices``
      (the reference's multinomial repeat draws — also an explicit input,
      attention_data_struct_seemv1.py:185-190);
    - ``pred_stexts``: class embeddings of the spatial queries
      (predictions_caption includes queries_spatial in v1);
    - ``prev_mask`` output: per-mask best spatial query by diag-masked
      maskemb-vs-pspatial similarity (update_spatial_results,
      attention_data_struct_seemv1.py:215-234).

    Activation parity vs the mounted reference is pinned with the oracle
    exporting torch's drawn indices (tests/test_torch_parity.py).
    """

    hidden_dim: int = 512
    dim_proj: int = 512
    num_queries: int = 101
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9
    mask_dim: int = 512
    max_spatial_tokens: int = 512          # MAX_SPATIAL_LEN per level
    num_spatial_memories: int = 32         # SPATIAL_MEMORIES
    sample_size: int = 3                   # QUERY_NUMBER
    max_grounding_tokens: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        multi_scale: List[jax.Array],       # 3 NHWC maps, lowest-res first
        mask_features: jax.Array,           # [B, H4, W4, mask_dim]
        text_embeddings: jax.Array,         # [n_cls, dim_proj]
        logit_scale: jax.Array,
        spatial_points: jax.Array,          # [B, S, 2] norm (y/H, x/W)
        spatial_valid: jax.Array,           # [B, S] bool
        spatial_posneg: jax.Array,          # [B, S] +1 pos / -1 neg
        spatial_mask_id: jax.Array,         # [B, S] int32 prompt-mask index
        spatial_query_indices: jax.Array,   # [NS] int32 into the Q object queries
        num_masks: int = 1,
        grounding_tokens: Optional[jax.Array] = None,  # [B, G, C]
        grounding_valid: Optional[jax.Array] = None,   # [B, G] bool
        prev_mask: Optional[jax.Array] = None,     # [B, num_masks, H4, W4]
        memory_indices: Optional[jax.Array] = None,  # [dec_layers, M] int32
        #   into num_masks — the reference re-draws the multinomial memory
        #   channel assignment at EVERY layer's cross_attn_mask call
    ) -> Dict[str, jax.Array]:
        B = mask_features.shape[0]
        Q = self.num_queries
        C = self.hidden_dim
        S = self.max_spatial_tokens
        G = self.max_grounding_tokens
        M = self.num_spatial_memories
        K = self.sample_size
        NM = num_masks
        NS = K * NM
        num_levels = len(multi_scale)
        has_grounding = grounding_tokens is not None
        if has_grounding:
            assert grounding_valid is not None, "grounding_tokens needs grounding_valid"
        has_memory = prev_mask is not None
        if has_memory:
            assert memory_indices is not None, "prev_mask needs memory_indices"

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (num_levels, C)
        )
        query_feat = self.param("query_feat", nn.initializers.normal(1.0), (Q, C))
        query_embed = self.param("query_embed", nn.initializers.normal(1.0), (Q, C))
        class_proj = self.param(
            "class_embed", nn.initializers.truncated_normal(0.02),
            (C, self.dim_proj),
        )
        mask_mlp = MLPHead(C, self.mask_dim, 3, dtype=self.dtype, name="mask_embed")
        decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                    name="decoder_norm")
        pn_indicator = self.param(
            "pn_indicator", nn.initializers.normal(0.02), (2, C)
        )
        spatial_embed = self.param(
            "spatial_embed", nn.initializers.normal(1.0), (M, C)
        )
        spatial_featured = self.param(
            "spatial_featured", nn.initializers.normal(1.0), (M, C)
        )

        srcs, poss, sizes = [], [], []
        for i, x in enumerate(multi_scale):
            b, h, w, c = x.shape
            sizes.append((h, w))
            pe = position_embedding_sine(h, w, C // 2, dtype=self.dtype)
            poss.append(jnp.broadcast_to(pe[None], (b, h, w, C)).reshape(b, h * w, C))
            srcs.append(
                x.reshape(b, h * w, c) + level_embed[i][None, None].astype(self.dtype)
            )

        def samp_ac_true(fmap, pts, h, w):
            return bilinear_sample(fmap, pts[:, 1] * (w - 1), pts[:, 0] * (h - 1))

        mf = mask_features.astype(jnp.float32)
        Hm, Wm = mf.shape[1:3]
        text_t = text_embeddings.astype(jnp.float32)
        pts = spatial_points.astype(jnp.float32)

        # per-MASK pos/neg mean spatial queries; empty masks fill with -1
        # (seem_v1.py:228-242 pad_sequence(..., padding_value=-1))
        mf_at = jax.vmap(lambda fb, p: samp_ac_true(fb, p, Hm, Wm))(mf, pts)
        mid_oh = jax.nn.one_hot(spatial_mask_id, NM, dtype=jnp.float32)  # [B,S,NM]
        sq = {}
        for sign, key in ((1, "pos"), (-1, "neg")):
            wgt = (spatial_valid & (spatial_posneg * sign > 0)).astype(jnp.float32)
            w_m = wgt[..., None] * mid_oh                              # [B,S,NM]
            cnt = jnp.sum(w_m, axis=1)                                 # [B,NM]
            mean = jnp.einsum("bsm,bsd->bmd", w_m, mf_at) / jnp.maximum(
                cnt[..., None], 1.0
            )
            sq[key] = jnp.where(cnt[..., None] > 0, mean, -1.0)        # [B,NM,D]

        spatial_tokens_by_level = []
        for i in range(num_levels):
            h, w = sizes[i]
            proj = self.param(
                f"mask_spatial_embed{i}",
                nn.initializers.truncated_normal(0.02), (C, C),
            )
            feat = srcs[i].astype(jnp.float32).reshape(B, h, w, C) @ proj
            tok = jax.vmap(lambda fb, p: samp_ac_true(fb, p, h, w))(feat, pts)
            tag = jnp.where(
                (spatial_posneg > 0)[..., None],
                pn_indicator[0][None, None], pn_indicator[1][None, None],
            )
            tok = jnp.where(spatial_valid[..., None], tok + tag, 0.0)
            spatial_tokens_by_level.append(tok.astype(self.dtype))

        # ---- group bookkeeping (cross: [obj, grd?, spa, mem?]) ------------
        n_grd_q = Q if has_grounding else 0
        n_mem = M if has_memory else 0
        NX = Q + n_grd_q + NS + n_mem
        o_grd = Q
        o_spa = Q + n_grd_q
        o_mem = o_spa + NS

        obj0 = jnp.broadcast_to(query_feat[None], (B, Q, C))
        obj0_pe = jnp.broadcast_to(query_embed[None], (B, Q, C))
        sqi = spatial_query_indices.astype(jnp.int32)
        x_parts = [obj0]
        xp_parts = [obj0_pe]
        if has_grounding:
            x_parts.append(obj0)
            xp_parts.append(obj0_pe)
        x_parts.append(jnp.broadcast_to(query_feat[sqi][None], (B, NS, C)))
        xp_parts.append(jnp.broadcast_to(query_embed[sqi][None], (B, NS, C)))
        if has_memory:
            x_parts.append(jnp.broadcast_to(spatial_featured[None], (B, M, C)))
            xp_parts.append(jnp.broadcast_to(spatial_embed[None], (B, M, C)))
        X = jnp.concatenate(x_parts, axis=1).astype(self.dtype)
        X_pos = jnp.concatenate(xp_parts, axis=1).astype(self.dtype)

        n_tok_grd = G if has_grounding else 0
        NY = Q + n_grd_q + NS + n_tok_grd + S + n_mem
        y_grd_t = Q + n_grd_q + NS
        y_spa_t = y_grd_t + n_tok_grd
        y_mem = y_spa_t + S

        base = np.ones((NY, NY), bool)
        base[:Q, :Q] = False
        if has_grounding:
            base[o_grd:o_grd + Q, o_grd:o_grd + Q] = False
            base[o_grd:o_grd + Q, y_grd_t:y_grd_t + G] = False
            base[y_grd_t:y_grd_t + G, o_grd:o_grd + Q] = False
            base[y_grd_t:y_grd_t + G, y_grd_t:y_grd_t + G] = False
        # spatial queries: block-diagonal per mask
        # (attention_data_struct_seemv1.py:239-241)
        eye = np.eye(NM, dtype=bool).repeat(K, axis=0).repeat(K, axis=1)
        base[o_spa:o_spa + NS, o_spa:o_spa + NS] = ~eye
        base[y_spa_t:y_spa_t + S, y_spa_t:y_spa_t + S] = False
        # q_spa <-> memories and mem <-> mem are PER-LAYER channel-matched
        # (attention_data_struct_seemv1.py:249-258) — applied in the loop
        base = jnp.asarray(base)[None, None]

        # spatial query i (mask i//K) attends only ITS mask's tokens
        # (attention_data_struct_seemv1.py:242-247)
        q_mid = jnp.arange(NS, dtype=jnp.int32) // K                   # [NS]
        tok_match = q_mid[None, :, None] == spatial_mask_id[:, None, :]  # [B,NS,S]
        qs_block = ~(tok_match & spatial_valid[:, None, :])
        base = jnp.broadcast_to(base, (B, 1, NY, NY))
        base = base.at[:, 0, o_spa:o_spa + NS, y_spa_t:y_spa_t + S].set(qs_block)

        key_valid = [jnp.ones((B, Q + n_grd_q + NS), bool)]
        if has_grounding:
            key_valid.append(grounding_valid)
        key_valid.append(spatial_valid)
        if has_memory:
            key_valid.append(jnp.ones((B, M), bool))
        key_valid = jnp.concatenate(key_valid, axis=1)
        self_mask = base | (~key_valid)[:, None, None, :]

        if has_memory:
            pm = prev_mask.astype(jnp.float32)                  # [B, NM, H, W]
            mem_idx = memory_indices.astype(jnp.int32)          # [L, M]

        def prediction_heads(Xo, target_size):
            dec = decoder_norm(Xo).astype(jnp.float32)
            cls_emb = dec @ class_proj
            v = cls_emb / (jnp.linalg.norm(cls_emb, axis=-1, keepdims=True) + 1e-7)
            outputs_class = logit_scale * jnp.einsum("bqd,nd->bqn", v, text_t)
            m_emb = mask_mlp(dec.astype(self.dtype)).astype(jnp.float32)
            masks = jnp.einsum("blc,bhwc->blhw", m_emb, mf)

            am = resize_bilinear_torch(
                masks.transpose(0, 2, 3, 1), target_size
            ).transpose(0, 3, 1, 2)
            am = jax.nn.sigmoid(am).reshape(B, NX, -1) < 0.5
            # memory override + all-blocked unmask happen at USE time in the
            # loop (cross_attn_mask draws fresh memory indices per layer)
            return outputs_class, masks, m_emb, cls_emb, (am, target_size)

        def finalize_mask(am_ts, layer):
            am, target_size = am_ts
            if has_memory:
                mm = resize_bilinear_torch(pm.transpose(0, 2, 3, 1), target_size)
                # channels come back LAST from the NHWC resize — transpose
                # BEFORE flattening (reshape(B, NM, -1) on [B,h,w,NM]
                # scrambles; invisible at NM=1, caught by the v1 oracle)
                mm = jax.nn.sigmoid(mm.transpose(0, 3, 1, 2)).reshape(B, NM, -1) < 0.5
                am = am.at[:, o_mem:o_mem + M].set(mm[:, mem_idx[layer]])
            all_blocked = jnp.all(am, axis=-1, keepdims=True)
            am = am & ~all_blocked
            return am[:, None]

        oc, masks, m_emb, cls_emb, am_ts = prediction_heads(X, sizes[0])
        tok_grd = grounding_tokens.astype(self.dtype) if has_grounding else None
        tok_grd_pos = (
            jax.lax.stop_gradient(tok_grd) if has_grounding else None
        )
        for i in range(self.dec_layers):
            level = i % num_levels
            X = CrossAttentionLayer(
                C, self.nheads, False, self.dtype, name=f"cross_attn{i}",
            )(X, srcs[level], memory_mask=finalize_mask(am_ts, i),
              pos=poss[level], query_pos=X_pos)

            y_parts = [X[:, : Q + n_grd_q + NS]]
            yp_parts = [X_pos[:, : Q + n_grd_q + NS]]
            if has_grounding:
                y_parts.append(tok_grd)
                yp_parts.append(tok_grd_pos)
            tok_spa = spatial_tokens_by_level[level]
            y_parts.append(tok_spa)
            yp_parts.append(jax.lax.stop_gradient(tok_spa))
            if has_memory:
                y_parts.append(X[:, o_mem:o_mem + M])
                yp_parts.append(X_pos[:, o_mem:o_mem + M])
            Y = jnp.concatenate(y_parts, axis=1)
            Y_pos = jnp.concatenate(yp_parts, axis=1)

            sm = self_mask
            if has_memory:
                # per-layer channel matching with THIS layer's drawn memory
                # indices: spatial query of mask m attends only memories
                # assigned channel m; memories attend same-channel memories
                # (attention_data_struct_seemv1.py:249-258)
                mi = mem_idx[i]
                qs_mem = ~(q_mid[:, None] == mi[None, :])          # [NS, M]
                mem_mem = ~(mi[:, None] == mi[None, :])            # [M, M]
                sm = sm.at[:, :, o_spa:o_spa + NS, y_mem:y_mem + M].set(
                    qs_mem[None, None]
                )
                sm = sm.at[:, :, y_mem:y_mem + M, y_mem:y_mem + M].set(
                    mem_mem[None, None]
                )
            Y = SelfAttentionLayer(
                C, self.nheads, False, self.dtype, name=f"self_attn{i}"
            )(Y, query_pos=Y_pos, tgt_mask=sm)
            Y = FFNLayer(
                C, self.dim_feedforward, False, dtype=self.dtype, name=f"ffn{i}",
            )(Y)

            x_parts = [Y[:, : Q + n_grd_q + NS]]
            if has_memory:
                x_parts.append(Y[:, y_mem:y_mem + M])
            X = jnp.concatenate(x_parts, axis=1)
            if has_grounding:
                tok_grd = Y[:, y_grd_t:y_grd_t + G]

            oc, masks, m_emb, cls_emb, am_ts = prediction_heads(
                X, sizes[(i + 1) % num_levels]
            )

        out = {
            "pred_logits": oc[:, :Q],
            "pred_masks": masks[:, :Q],
            "pred_captions": cls_emb[:, :Q],
            "pred_smasks": masks[:, o_spa:o_spa + NS],
            "pred_smaskembs": m_emb[:, o_spa:o_spa + NS],
            "pred_stexts": cls_emb[:, o_spa:o_spa + NS],
            "pred_pspatials": sq["pos"],
            "pred_nspatials": sq["neg"],
        }
        if has_grounding:
            out["pred_gmasks"] = masks[:, o_grd:o_grd + Q]
            out["pred_gtexts"] = cls_emb[:, o_grd:o_grd + Q]
        # update_spatial_results (v1): per-mask best spatial query — the
        # similarity is diag-masked so mask m only considers ITS K queries
        sel = jnp.einsum("bqd,bmd->bqm", out["pred_smaskembs"], sq["pos"])
        diag = (q_mid[:, None] == jnp.arange(NM)[None, :])             # [NS,NM]
        sel = jnp.where(diag[None], sel, -jnp.inf)
        best = jnp.argmax(sel, axis=1)                                 # [B, NM]
        out["prev_mask"] = jnp.take_along_axis(
            out["pred_smasks"], best[..., None, None], axis=1
        )                                                              # [B,NM,H,W]
        return out


class SEEMHeadDemo(nn.Module):
    """SEEM demo-variant decoder — task-switchable prompt COMPOSITION
    (interface/seem_demo.py:27-396 + prototype/
    attention_data_struct_seemdemo.py + the demo yaml ATTENTION_ARCH,
    configs/seem/focall_unicl_lang_demo.yaml:168-193).

    The demo arch is structurally DIFFERENT from v0/v1: there is exactly ONE
    cross-attending query group (``queries_object``) and up to FOUR token
    groups composed freely in one forward — stroke/click spatial tokens,
    text grounding tokens, AUDIO tokens (same pathway as grounding), and
    VISUAL tokens precomputed from a reference image (``task='refimg'``
    returns the visual bundle the demo app feeds back, seem_demo.py:268-276).
    No duplicated grounding/spatial query groups and no spatial memories
    participate (task='demo' skips ``queries_spatial``, seem_demo.py:277).

    SELF_ATTENTION interactions (demo yaml): object queries attend
    themselves + every present token group; grounding and audio tokens
    attend themselves + the object queries; spatial and visual tokens attend
    only themselves. Padded token slots are blocked as keys (the reference
    additionally NaN-poisons fully-masked padded token ROWS — invisible in
    any output, see the v0 head's convention note).

    Outputs (organize_output with only queries_object registered):
    ``pred_logits``/``pred_masks``/``pred_maskembs``/``pred_captions`` from
    the object queries, ``pred_pspatials``/``pred_nspatials`` (spatial
    prompt means) and ``pred_pvisuals``/``pred_nvisuals`` (visual prompt
    means) — the demo app selects the winning object mask by
    ``pred_maskembs @ pred_pspatials`` (resp. ``pred_pvisuals``).
    """

    hidden_dim: int = 512
    dim_proj: int = 512
    num_queries: int = 101
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9
    mask_dim: int = 512
    max_spatial_tokens: int = 512          # MAX_SPATIAL_LEN per level
    max_grounding_tokens: int = 8
    max_audio_tokens: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        multi_scale: List[jax.Array],       # 3 NHWC maps, lowest-res first
        mask_features: jax.Array,           # [B, H4, W4, mask_dim]
        text_embeddings: jax.Array,         # [n_cls, dim_proj] L2-normalized
        logit_scale: jax.Array,
        spatial_points: Optional[jax.Array] = None,   # [B, S, 2] norm (y/H, x/W)
        spatial_valid: Optional[jax.Array] = None,    # [B, S] bool
        spatial_posneg: Optional[jax.Array] = None,   # [B, S] +1 / -1
        grounding_tokens: Optional[jax.Array] = None, # [B, G, C]
        grounding_valid: Optional[jax.Array] = None,  # [B, G] bool
        audio_tokens: Optional[jax.Array] = None,     # [B, A, C]
        audio_valid: Optional[jax.Array] = None,      # [B, A] bool
        visual_tokens_by_level: Optional[List[jax.Array]] = None,  # 3x [B, S, C]
        visual_valid: Optional[jax.Array] = None,     # [B, S] bool
        visual_query_pos: Optional[jax.Array] = None, # [B, mask_dim]
        visual_query_neg: Optional[jax.Array] = None, # [B, mask_dim]
        task: str = "demo",
    ):
        B = mask_features.shape[0]
        Q = self.num_queries
        C = self.hidden_dim
        S = self.max_spatial_tokens
        G = self.max_grounding_tokens
        A = self.max_audio_tokens
        num_levels = len(multi_scale)
        has_spatial = spatial_points is not None
        has_grounding = grounding_tokens is not None
        has_audio = audio_tokens is not None
        has_visual = visual_tokens_by_level is not None
        if task == "refimg":
            assert has_spatial, "refimg needs spatial prompts"

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (num_levels, C)
        )
        query_feat = self.param("query_feat", nn.initializers.normal(1.0), (Q, C))
        query_embed = self.param("query_embed", nn.initializers.normal(1.0), (Q, C))
        class_proj = self.param(
            "class_embed", nn.initializers.truncated_normal(0.02),
            (C, self.dim_proj),
        )
        # pn_indicator is UNCONDITIONAL in the demo decoder (seem_demo.py:118)
        pn_indicator = self.param(
            "pn_indicator", nn.initializers.normal(0.02), (2, C)
        )
        mask_mlp = MLPHead(C, self.mask_dim, 3, dtype=self.dtype, name="mask_embed")
        decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="decoder_norm")

        srcs, poss, sizes = [], [], []
        for i, x in enumerate(multi_scale):
            b, h, w, c = x.shape
            sizes.append((h, w))
            pe = position_embedding_sine(h, w, C // 2, dtype=self.dtype)
            poss.append(jnp.broadcast_to(pe[None], (b, h, w, C)).reshape(b, h * w, C))
            srcs.append(
                x.reshape(b, h * w, c) + level_embed[i][None, None].astype(self.dtype)
            )

        def samp_ac_true(fmap, pts, h, w):
            """point_sample(align_corners=True): pixel = p * (size - 1)."""
            return bilinear_sample(fmap, pts[:, 1] * (w - 1), pts[:, 0] * (h - 1))

        mf = mask_features.astype(jnp.float32)
        Hm, Wm = mf.shape[1:3]
        text_t = text_embeddings.astype(jnp.float32)

        spatial_tokens_by_level = []
        sq_pos = sq_neg = None
        if has_spatial:
            pts = spatial_points.astype(jnp.float32)
            # mean pos / neg spatial queries from mask_features
            # (seem_demo.py:225-238; empty sets nan_to_num to 0)
            mf_at = jax.vmap(lambda fb, p: samp_ac_true(fb, p, Hm, Wm))(mf, pts)
            for sign in (1, -1):
                wgt = (spatial_valid & (spatial_posneg * sign > 0)).astype(jnp.float32)
                mean = jnp.einsum("bs,bsd->bd", wgt, mf_at) / jnp.maximum(
                    jnp.sum(wgt, axis=1, keepdims=True), 1.0
                )
                if sign == 1:
                    sq_pos = mean
                else:
                    sq_neg = mean
            for i in range(num_levels):
                h, w = sizes[i]
                proj = self.param(
                    f"mask_spatial_embed{i}",
                    nn.initializers.truncated_normal(0.02), (C, C),
                )
                feat = srcs[i].astype(jnp.float32).reshape(B, h, w, C) @ proj
                tok = jax.vmap(lambda fb, p: samp_ac_true(fb, p, h, w))(feat, pts)
                tag = jnp.where(
                    (spatial_posneg > 0)[..., None],
                    pn_indicator[0][None, None], pn_indicator[1][None, None],
                )
                tok = jnp.where(spatial_valid[..., None], tok + tag, 0.0)
                spatial_tokens_by_level.append(tok.astype(self.dtype))

        if task == "refimg":
            # the reference-image pass: return the VISUAL prompt bundle
            # renamed from the spatial machinery (seem_demo.py:268-276)
            return {
                "visual_query_pos": sq_pos,
                "visual_query_neg": sq_neg,
                "src_visual_queries": spatial_tokens_by_level,
                "src_visual_maskings": spatial_valid,
            }

        # ---- sequence bookkeeping: [q_obj | tok_grd? | tok_spa? | tok_vis?
        # | tok_aud?] (self_attn_dict insertion order, demo yaml VARIABLE) --
        n_tok_grd = G if has_grounding else 0
        n_tok_spa = S if has_spatial else 0
        n_tok_vis = S if has_visual else 0
        n_tok_aud = A if has_audio else 0
        NY = Q + n_tok_grd + n_tok_spa + n_tok_vis + n_tok_aud
        y_grd = Q
        y_spa = y_grd + n_tok_grd
        y_vis = y_spa + n_tok_spa
        y_aud = y_vis + n_tok_vis

        X = jnp.broadcast_to(query_feat[None], (B, Q, C)).astype(self.dtype)
        X_pos = jnp.broadcast_to(query_embed[None], (B, Q, C)).astype(self.dtype)

        # self-attention interaction mask (True = BLOCKED), demo yaml
        # SELF_ATTENTION: object <-> object + every token group; grounding
        # and audio tokens also see the object queries; spatial and visual
        # tokens see only themselves
        base = np.ones((NY, NY), bool)
        base[:Q, :Q] = False
        if has_grounding:
            base[:Q, y_grd:y_grd + G] = False
            base[y_grd:y_grd + G, :Q] = False
            base[y_grd:y_grd + G, y_grd:y_grd + G] = False
        if has_spatial:
            base[:Q, y_spa:y_spa + S] = False
            base[y_spa:y_spa + S, y_spa:y_spa + S] = False
        if has_visual:
            base[:Q, y_vis:y_vis + S] = False
            base[y_vis:y_vis + S, y_vis:y_vis + S] = False
        if has_audio:
            base[:Q, y_aud:y_aud + A] = False
            base[y_aud:y_aud + A, :Q] = False
            base[y_aud:y_aud + A, y_aud:y_aud + A] = False
        base = jnp.asarray(base)[None, None]

        key_valid = [jnp.ones((B, Q), bool)]
        if has_grounding:
            key_valid.append(grounding_valid)
        if has_spatial:
            key_valid.append(spatial_valid)
        if has_visual:
            key_valid.append(visual_valid)
        if has_audio:
            key_valid.append(audio_valid)
        key_valid = jnp.concatenate(key_valid, axis=1)
        self_mask = base | (~key_valid)[:, None, None, :]

        def prediction_heads(Xo, target_size):
            dec = decoder_norm(Xo).astype(jnp.float32)          # [B, Q, C]
            cls_emb = dec @ class_proj
            v = cls_emb / (jnp.linalg.norm(cls_emb, axis=-1, keepdims=True) + 1e-7)
            outputs_class = logit_scale * jnp.einsum("bqd,nd->bqn", v, text_t)
            m_emb = mask_mlp(dec.astype(self.dtype)).astype(jnp.float32)
            masks = jnp.einsum("blc,bhwc->blhw", m_emb, mf)

            am = resize_bilinear_torch(
                masks.transpose(0, 2, 3, 1), target_size
            ).transpose(0, 3, 1, 2)
            am = jax.nn.sigmoid(am).reshape(B, Q, -1) < 0.5
            all_blocked = jnp.all(am, axis=-1, keepdims=True)
            am = am & ~all_blocked
            return outputs_class, masks, m_emb, cls_emb, am[:, None]

        oc, masks, m_emb, cls_emb, attn_mask = prediction_heads(X, sizes[0])
        tok_grd = grounding_tokens.astype(self.dtype) if has_grounding else None
        tok_grd_pos = jax.lax.stop_gradient(tok_grd) if has_grounding else None
        tok_aud = audio_tokens.astype(self.dtype) if has_audio else None
        tok_aud_pos = jax.lax.stop_gradient(tok_aud) if has_audio else None
        for i in range(self.dec_layers):
            level = i % num_levels
            X = CrossAttentionLayer(
                C, self.nheads, False, self.dtype, name=f"cross_attn{i}",
            )(X, srcs[level], memory_mask=attn_mask,
              pos=poss[level], query_pos=X_pos)

            y_parts, yp_parts = [X], [X_pos]
            if has_grounding:
                y_parts.append(tok_grd)
                yp_parts.append(tok_grd_pos)
            if has_spatial:
                tok_spa = spatial_tokens_by_level[level]
                y_parts.append(tok_spa)
                yp_parts.append(jax.lax.stop_gradient(tok_spa))
            if has_visual:
                tok_vis = visual_tokens_by_level[level].astype(self.dtype)
                y_parts.append(tok_vis)
                yp_parts.append(jax.lax.stop_gradient(tok_vis))
            if has_audio:
                y_parts.append(tok_aud)
                yp_parts.append(tok_aud_pos)
            Y = jnp.concatenate(y_parts, axis=1)
            Y_pos = jnp.concatenate(yp_parts, axis=1)

            Y = SelfAttentionLayer(
                C, self.nheads, False, self.dtype, name=f"self_attn{i}"
            )(Y, query_pos=Y_pos, tgt_mask=self_mask)
            Y = FFNLayer(
                C, self.dim_feedforward, False, dtype=self.dtype, name=f"ffn{i}",
            )(Y)

            # write back: object queries; grounding/audio tokens PERSIST
            # (update_variables over the self-attn set), spatial/visual
            # tokens are refreshed per level by the next set()
            X = Y[:, :Q]
            if has_grounding:
                tok_grd = Y[:, y_grd:y_grd + G]
            if has_audio:
                tok_aud = Y[:, y_aud:y_aud + A]

            oc, masks, m_emb, cls_emb, attn_mask = prediction_heads(
                X, sizes[(i + 1) % num_levels]
            )

        out = {
            "pred_logits": oc,
            "pred_masks": masks,
            "pred_maskembs": m_emb,
        }
        if has_grounding or has_audio:
            out["pred_captions"] = cls_emb
        if has_spatial:
            out["pred_pspatials"] = sq_pos[:, None]
            out["pred_nspatials"] = sq_neg[:, None]
        if has_visual:
            out["pred_pvisuals"] = visual_query_pos[:, None]
            out["pred_nvisuals"] = visual_query_neg[:, None]
        return out


def demo_select_mask(out: Dict[str, jax.Array], prompt: str = "spatial"):
    """The demo app's winning-mask selection: object query whose mask
    embedding best matches the positive prompt mean
    (pred_maskembs @ pred_pspatials / pred_pvisuals — the demo data struct's
    update_spatial_results pattern, attention_data_struct_seemdemo.py:239-251,
    applied to object queries as demo/seem's task flow does)."""
    s_emb = out["pred_pspatials" if prompt == "spatial" else "pred_pvisuals"]
    sel = jnp.einsum("bqd,bkd->bqk", out["pred_maskembs"], s_emb)[:, :, 0]
    best = jnp.argmax(sel, axis=1)
    mask = jnp.take_along_axis(
        out["pred_masks"], best[:, None, None, None], axis=1
    )
    return best, mask


# ---------------------------------------------------------------------------
# v1 interactive refinement (host loop)
# ---------------------------------------------------------------------------

def prepare_next_spatial_mask(
    pred_mask: np.ndarray,   # [H, W] sigmoid>0.5 bool prediction
    gt_mask: np.ndarray,     # [H, W] bool
    pos_mask: np.ndarray,    # [H, W] bool accumulated positive prompts
    neg_mask: np.ndarray,    # [H, W] bool accumulated negative prompts
    rng: Optional[np.random.Generator] = None,
    mode: str = "best",
    dilation: int = 3,
    iou_stop: float = 0.925,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Next-click selection (seem_model_v1.py:963-1013): pick the point
    deepest inside the larger error region (FN -> positive click, FP ->
    negative), via euclidean distance transform, dilate 3x3, OR into the
    prompt masks. Returns (pos_mask, neg_mask, iou)."""
    from scipy import ndimage

    prev = pos_mask | neg_mask
    fn = gt_mask & ~pred_mask & ~prev
    fp = ~gt_mask & pred_mask & ~prev
    inter = (gt_mask & pred_mask).sum()
    union = (gt_mask | pred_mask).sum()
    iou = float(inter) / (float(union) + 1e-8)
    is_positive = fn.sum() > fp.sum()
    select = fn if is_positive else fp
    if iou >= iou_stop or not select.any():
        return pos_mask, neg_mask, iou
    # distance INTO the selected error region (pad so borders count)
    dt = ndimage.distance_transform_edt(
        np.pad(select, 1, constant_values=False)
    )[1:-1, 1:-1].reshape(-1)
    if mode == "best":
        idx = int(np.argmax(dt))
    else:  # best_random
        cand = np.nonzero(dt > 0)[0]
        idx = int((rng or np.random.default_rng()).choice(cand))
    click = np.zeros(select.shape, bool).reshape(-1)
    click[idx] = True
    click = click.reshape(select.shape)
    click = ndimage.binary_dilation(click, np.ones((dilation, dilation), bool))
    if is_positive:
        pos_mask = pos_mask | click
    else:
        neg_mask = neg_mask | click
    return pos_mask, neg_mask, iou


def points_from_masks(
    pos_mask: np.ndarray, neg_mask: np.ndarray, budget: int,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side per-round resampling: up to ``budget`` normalized (y, x)
    points drawn from pos∪neg masks with ±1 tags (≙ rand_sample per forward,
    seem_v1.py:225-267)."""
    H, W = pos_mask.shape
    pts = np.zeros((budget, 2), np.float32)
    valid = np.zeros(budget, bool)
    tags = np.ones(budget, np.int32)
    entries = []
    for m, tag in ((pos_mask, 1), (neg_mask, -1)):
        ys, xs = np.nonzero(m)
        for y, x in zip(ys, xs):
            entries.append((y, x, tag))
    if entries:
        entries = np.asarray(entries)
        take = min(len(entries), budget)
        sel = (rng.choice(len(entries), take, replace=False)
               if len(entries) > budget else np.arange(len(entries)))
        chosen = entries[sel]
        pts[:take, 0] = (chosen[:, 0] + 0.5) / H
        pts[:take, 1] = (chosen[:, 1] + 0.5) / W
        tags[:take] = chosen[:, 2]
        valid[:take] = True
    return pts, valid, tags


def interactive_refine(
    apply_fn,                 # (points, valid, tags, prev_mask|None) -> out dict
    gt_mask: np.ndarray,      # [H4, W4] bool (mask-feature grid)
    init_pos: np.ndarray,     # [H4, W4] bool initial click/mask
    budget: int = 64,
    iters: int = 10,
    seed: int = 0,
    iou_stop: float = 0.9,
) -> Tuple[np.ndarray, List[float]]:
    """The v1 evaluate_interactive loop (seem_model_v1.py:439-516): forward ->
    IoU -> next click -> repeat, with the previous mask as spatial memory.
    Returns (final mask logits [H4, W4], per-round IoUs)."""
    rng = np.random.default_rng(seed)
    pos, neg = init_pos.copy(), np.zeros_like(init_pos)
    prev = None
    ious: List[float] = []
    last = None
    for _ in range(iters):
        pts, valid, tags = points_from_masks(pos, neg, budget, rng)
        out = apply_fn(pts, valid, tags, prev)
        last = np.asarray(out["prev_mask"][0]).reshape(
            out["prev_mask"].shape[-2:]
        )                                                          # [H4, W4]
        pred = 1.0 / (1.0 + np.exp(-last)) > 0.5
        pos, neg, iou = prepare_next_spatial_mask(
            pred, gt_mask, pos, neg, rng=rng, iou_stop=iou_stop
        )
        ious.append(iou)
        prev = out["prev_mask"]
        if iou >= iou_stop:
            break
    return last, ious
