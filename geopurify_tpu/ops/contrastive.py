"""Stage-1 contrastive pair sampling + InfoNCE.

TPU-native re-design of the reference's hybrid sampler
(reference models/affinity_module.py:1065-1136, loss :1226-1237):

- anchors: random valid points, statically padded to ``num_anchors`` with an
  anchor-validity mask standing in for the dynamic min(4096, N//3);
- positive: globally most-similar teacher feature (excluding self);
- negatives: 48 "macro" globally least-similar + 15 "micro" hardest among the
  anchor's 96 spatial kNN;
- InfoNCE at T=0.07 over [pos, negs] cosine logits.

The 4096xN similarity sweep is chunked over the point axis with a running
(argmax, bottom-k) merge — the device-side analogue of the reference's full
similarity matrix, without materializing it.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_NEG_INF = jnp.float32(-jnp.inf)


class ContrastivePairs(NamedTuple):
    anchor_idx: jax.Array     # [A] int32
    positive_idx: jax.Array   # [A] int32
    negative_idx: jax.Array   # [A, num_negatives] int32
    anchor_valid: jax.Array   # [A] bool


def _normalize(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


@partial(jax.jit, static_argnames=("num_anchors", "num_macro", "num_micro", "spatial_k", "db_chunk", "anchor_tile", "spatial_method", "spatial_radius"))
def sample_contrastive_pairs_hybrid(
    rng: jax.Array,
    teacher_feats: jax.Array,     # [N, D]
    valid: jax.Array,             # [N] bool
    neighbor_idx: Optional[jax.Array] = None,  # [N, K] spatial kNN (self excluded)
    coords: Optional[jax.Array] = None,        # [N, 3]; kNN computed for anchors only
    num_anchors: int = 4096,
    num_macro: int = 48,
    num_micro: int = 15,
    spatial_k: int = 96,
    db_chunk: int = 8192,
    anchor_tile: int = 512,
    spatial_method: str = "grid",
    spatial_radius: float = 0.3,
) -> ContrastivePairs:
    """Either pass a precomputed full-N ``neighbor_idx`` (the reference's faiss
    pattern, affinity_module.py:1159-1165) or raw ``coords`` — in which case the
    spatial kNN is computed for the anchors only, an O(A*N) instead of O(N^2)
    restructuring with identical sampling semantics."""
    N, D = teacher_feats.shape
    f = _normalize(teacher_feats.astype(jnp.float32))
    f = jnp.where(valid[:, None], f, 0.0)

    # --- anchor selection: random valid points, capped at floor(n_valid/3) ---
    n_valid = jnp.sum(valid.astype(jnp.int32))
    scores = jax.random.uniform(rng, (N,)) + (~valid).astype(jnp.float32) * 2.0
    order = jnp.argsort(scores)
    # scenes smaller than the anchor budget: pad the index list (padded slots
    # are masked off by anchor_valid, which is also capped at n_valid//3)
    take = min(num_anchors, N)
    anchor_idx = jnp.zeros((num_anchors,), jnp.int32).at[:take].set(
        order[:take].astype(jnp.int32)
    )
    cap = jnp.minimum(jnp.int32(take), n_valid // 3)
    anchor_valid = jnp.arange(num_anchors) < cap

    if neighbor_idx is None:
        if coords is None:
            raise ValueError("pass either neighbor_idx or coords")
        if spatial_method == "grid":
            # Hilbert-tiled pruning (certificate-exact; ~4x the chunked
            # brute at the 131k-point bench spec — ops/knn.knn_anchors_grid)
            from geopurify_tpu.ops.knn import knn_anchors_grid

            _, anchor_nbr_full = knn_anchors_grid(
                coords.astype(jnp.float32), valid, anchor_idx,
                k=spatial_k, radius=spatial_radius,
            )
        else:
            from geopurify_tpu.ops.knn import knn_search

            _, anchor_nbr_full = knn_search(
                coords.astype(jnp.float32)[anchor_idx],
                coords.astype(jnp.float32),
                valid, k=spatial_k, query_ids=anchor_idx,
                exclude_identical_index=True, db_chunk=db_chunk,
            )  # [A, K]
    else:
        anchor_nbr_full = neighbor_idx[anchor_idx]

    n_dc = -(-N // db_chunk)
    Np = n_dc * db_chunk
    f_pad = jnp.pad(f, ((0, Np - N), (0, 0)))
    valid_pad = jnp.pad(valid, (0, Np - N))

    n_at = -(-num_anchors // anchor_tile)
    Ap = n_at * anchor_tile
    aidx_pad = jnp.pad(anchor_idx, (0, Ap - num_anchors))
    anbr_pad = jnp.pad(anchor_nbr_full, ((0, Ap - num_anchors), (0, 0)))

    def one_tile(args):                      # ([T], [T, K])
        aidx, nb = args
        fa = f[aidx]                         # [T, D]
        # One full-row similarity block + chunked top-k: the old running
        # (argmax, bottom-49) merge issued n_dc sequential top_k calls of
        # width db_chunk+49 per tile — lax.top_k's slow regime (see
        # ops/knn._chunked_topk_min). [T, Np] f32 is ~268 MB at T=1024,
        # N=65536; lax.map keeps one tile live at a time.
        sims = jax.lax.dot_general(
            fa, f_pad, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )                                    # [T, Np]
        idx = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
        is_self = idx == aidx[:, None]
        dead = ~valid_pad[None, :]
        # positive: max excluding self (first index on exact ties, matching
        # the chunk-scan's earliest-chunk-wins merge)
        s_pos = jnp.where(is_self | dead, _NEG_INF, sims)
        pos_i = jnp.argmax(s_pos, axis=1).astype(jnp.int32)
        # macro negatives: bottom-k excluding self (positive excluded later)
        s_neg = jnp.where(is_self | dead, jnp.inf, sims)
        from geopurify_tpu.ops.knn import _chunked_topk_min

        _, worst_i = _chunked_topk_min(s_neg, num_macro + 1)
        # exclude the positive from the bottom set (it is the argmax so it can
        # only appear under exact-duplicate ties): stable-sort positives to the
        # back of the (num_macro+1)-candidate list, keep the first num_macro.
        is_pos_slot = worst_i == pos_i[:, None]
        perm = jnp.argsort(is_pos_slot, axis=1, stable=True)
        macro = jnp.take_along_axis(worst_i, perm, axis=1)[:, :num_macro]

        # micro negatives: hardest (least similar) among spatial kNN
        sims_local = jnp.einsum("td,tkd->tk", fa, f[nb])
        is_pos = nb == pos_i[:, None]
        is_self_nb = nb == aidx[:, None]
        sims_local = jnp.where(is_pos | is_self_nb, jnp.inf, sims_local)
        _, hard = jax.lax.top_k(-sims_local, num_micro)
        micro = jnp.take_along_axis(nb, hard, axis=1)
        return pos_i, jnp.concatenate([macro, micro], axis=1)

    pos_i, neg_i = jax.lax.map(
        one_tile,
        (aidx_pad.reshape(n_at, anchor_tile),
         anbr_pad.reshape(n_at, anchor_tile, -1)),
    )
    pos_i = pos_i.reshape(Ap)[:num_anchors]
    neg_i = neg_i.reshape(Ap, num_macro + num_micro)[:num_anchors]
    return ContrastivePairs(anchor_idx, pos_i, neg_i, anchor_valid)


def info_nce_loss(
    anchor_embed: jax.Array,    # [A, E]
    positive_embed: jax.Array,  # [A, E]
    negative_embed: jax.Array,  # [A, n_neg, E]
    anchor_valid: jax.Array,    # [A] bool
    temperature: float = 0.07,
) -> jax.Array:
    """InfoNCE over cosine logits, label 0 = positive (affinity_module.py:1226-1237)."""
    a = _normalize(anchor_embed.astype(jnp.float32))
    p = _normalize(positive_embed.astype(jnp.float32))
    n = _normalize(negative_embed.astype(jnp.float32))
    l_pos = jnp.einsum("ae,ae->a", a, p)[:, None]
    l_neg = jnp.einsum("ae,ane->an", a, n)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_anchor = -logp[:, 0]
    w = anchor_valid.astype(jnp.float32)
    return jnp.sum(per_anchor * w) / jnp.maximum(jnp.sum(w), 1.0)
