"""Multi-view 2D->3D feature lifting + cross-view consensus fusion.

TPU-native re-design of the reference's lift_xdecoder_features
(reference models/affinity_module.py:455-714). Key restructurings:

- The reference's per-query python loop over kept masks collapses to a single
  gather: because mask-id assignment is an argmax over queries, every pixel is
  covered by at most ONE query (affinity_module.py:560-593), so the per-point
  feature is ``mask_embed[mask_ids[px]]`` gated by its sigmoid >= 0.5. The
  mask_area/original_area keep-filters are implied (empty masks never win an
  argmax).
- The per-point python dict of view records (point_info) becomes two fixed
  passes over a [V, Pv, C] feature buffer: (1) scatter-add view logits into
  per-scene-point sums to get the consensus class, (2) a running top-3
  agreement merge producing softmax-weighted fused features — identical math
  to the reference's chunked padded fusion (affinity_module.py:647-685).
- KDTree hole-fills become on-device brute-force nearest_fill (ops/knn.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from geopurify_tpu.ops.knn import nearest_donor, nearest_fill, nearest_fill_grid
from geopurify_tpu.ops.segment import segment_sum
from geopurify_tpu.models.layers import _aa_resize_taps, resize_bicubic_antialias


class ViewLift(NamedTuple):
    features: jax.Array   # [Pv, C] L2-normalized per-point features (0 if unseen)
    logits: jax.Array     # [Pv, n_cls] scaled cosine logits vs text


class ViewLiftIds(NamedTuple):
    """Index-valued lift of one view (see ``lift_view_ids``): every per-point
    feature is a row of a Q+1-row table, so the view ships a [Pv] int32
    instead of [Pv, C] floats."""
    winner: jax.Array       # [Pv] int32 in [0, Q]; Q = the no-feature sentinel
    embed_table: jax.Array  # [Q+1, C] L2-normalized mask embeds, zero sentinel row
    logit_table: jax.Array  # [Q+1, n_cls] scaled cosine logits, zero sentinel row


@partial(jax.jit, static_argnames=("mask_shape", "mask_threshold"))
def lift_view_features(
    pred_masks: jax.Array,     # [Q, h, w] stride-4 mask logits (padded-image grid)
    mask_embed: jax.Array,     # [Q, C]
    pred_logits: jax.Array,    # [Q, n_cls+1]
    rows: jax.Array,           # [Pv] pixel row of each view point (mask_shape space)
    cols: jax.Array,           # [Pv]
    pv_valid: jax.Array,       # [Pv] bool
    view_coords: jax.Array,    # [Pv, 3] coords for the hole fill
    text_embeddings: jax.Array,  # [n_cls, C] L2-normalized (background excluded)
    logit_scale: jax.Array,    # []
    mask_shape: Tuple[int, int],  # (H, W)
    mask_threshold: float = 0.5,
) -> ViewLift:
    """Single-view mask assembly -> per-point features -> hole fill -> logits.

    Prefer ``lift_view_ids`` (the index-valued form) on the default pipeline
    path — same math, a [Pv] int32 output instead of [Pv, C] floats."""
    winner, covered = _view_winner(
        pred_masks, pred_logits, rows, cols, pv_valid, mask_shape, mask_threshold
    )
    feats = jnp.where(
        covered[:, None], mask_embed.astype(jnp.float32)[winner], 0.0
    )                                                         # [Pv, C]

    # per-view nearest fill for visible-but-uncovered points (ref :604-625):
    # both-compacted gated sweep — O(n_unseen * n_covered) pairs, which beats
    # the Hilbert-grid-pruned fill at every unseen fraction at view shapes
    # (47-59 vs 51-76 ms at Pv=65536 incl. ~28 ms dispatch; the random-
    # teacher bench views are ~90% uncovered, where donor compaction wins 8x)
    feats = nearest_fill(feats, view_coords.astype(jnp.float32), covered, pv_valid)
    feats = jnp.where(pv_valid[:, None], feats, 0.0)

    norm = jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
    feats = feats / norm
    logits = logit_scale * feats @ text_embeddings.astype(jnp.float32).T
    return ViewLift(feats, logits)


def _view_winner(
    pred_masks: jax.Array,     # [Q, h, w] stride-4 mask logits
    pred_logits: jax.Array,    # [Q, n_cls+1]
    rows: jax.Array,           # [Pv]
    cols: jax.Array,           # [Pv]
    pv_valid: jax.Array,       # [Pv] bool
    mask_shape: Tuple[int, int],
    mask_threshold: float,
) -> Tuple[jax.Array, jax.Array]:
    """Winning mask id + covered flag per view point (shared by the dense and
    index-valued lifts).

    The mask-id argmax grid is evaluated ONLY at the Pv point pixels when
    that is cheaper: the reference resizes pred_masks to the full [Q, H, W]
    grid, argmaxes every pixel, then reads the result at the visible points'
    (row, col) (affinity_module.py:527-593) — but nothing else consumes the
    grid, and the separable bicubic resample at one pixel is just a
    (taps_h x taps_w) weighted window of the stride-4 masks. Gathering those
    windows per point ([Pv, T, Q]) is the same math term-for-term (same
    clipped/renormalized tap weights, extracted from the same cached
    matrices — layers._aa_resize_taps). STATIC GATE: the point-evaluated
    form touches Pv*Ty*Tx*Q mask samples vs the grid's H*W*Q — at the
    driver spec (Pv=16384, T=16: 0.26M < 0.31M pixels) point-eval wins
    (bench 1.048 -> 1.074 scenes/s); at preset scale (Pv=65536 the gather
    is 843 MB/view, 3.3x the grid) the full-grid resize wins and lift_total
    regressed 1.74 -> 2.21 s/scene without the gate."""
    H, W = mask_shape
    Q, h, w = pred_masks.shape

    probs = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    scores = jnp.max(probs[..., :-1], axis=-1)                # [Q]

    r = jnp.clip(rows, 0, H - 1)
    c = jnp.clip(cols, 0, W - 1)
    lo_y, w_y = (jnp.asarray(a) for a in _aa_resize_taps(h, H))
    lo_x, w_x = (jnp.asarray(a) for a in _aa_resize_taps(w, W))
    Ty, Tx = w_y.shape[1], w_x.shape[1]
    Pv = rows.shape[0]
    if Pv * Ty * Tx <= H * W:
        py, wy = lo_y[r], w_y[r]                              # [Pv], [Pv, Ty]
        px, wx = lo_x[c], w_x[c]
        # flat pixel ids of each point's (Ty x Tx) source window
        pix = (
            (py[:, None, None]
             + jnp.arange(Ty, dtype=jnp.int32)[None, :, None]) * w
            + (px[:, None, None]
               + jnp.arange(Tx, dtype=jnp.int32)[None, None, :])
        ).reshape(-1, Ty * Tx)                                # [Pv, T]
        masks_flat = pred_masks.transpose(1, 2, 0).reshape(h * w, Q)
        g = masks_flat[pix].astype(jnp.float32)               # [Pv, T, Q]
        wts = (wy[:, :, None] * wx[:, None, :]).reshape(-1, Ty * Tx)
        vals = jnp.einsum(
            "pt,ptq->pq", wts, g, preferred_element_type=jnp.float32
        )                                                     # [Pv, Q] mask logits
        sig_pts = jax.nn.sigmoid(vals)
        winner = jnp.argmax(scores[None, :] * sig_pts, axis=-1)   # [Pv]
        sig_win = jnp.take_along_axis(sig_pts, winner[:, None], axis=-1)[:, 0]
    else:
        # full-grid resize path: dense [Q, H, W] via the same AA weight
        # matrices as matmuls (layers.resize_bicubic_antialias), per-pixel
        # argmax grid, read at the point pixels
        masks = resize_bicubic_antialias(
            pred_masks.transpose(1, 2, 0)[None], (H, W)
        )[0].transpose(2, 0, 1)                               # [Q, H, W] f32
        sig = jax.nn.sigmoid(masks)                           # [Q, H, W]
        prob_masks = scores[:, None, None] * sig
        mask_ids = jnp.argmax(prob_masks, axis=0)             # [H, W]
        winner = mask_ids[r, c]                               # [Pv]
        sig_win = sig[winner, r, c]
    covered = (sig_win >= mask_threshold) & pv_valid
    return winner, covered


@partial(jax.jit, static_argnames=("mask_shape", "mask_threshold"))
def lift_view_ids(
    pred_masks: jax.Array,     # [Q, h, w] stride-4 mask logits (padded-image grid)
    mask_embed: jax.Array,     # [Q, C]
    pred_logits: jax.Array,    # [Q, n_cls+1]
    rows: jax.Array,           # [Pv]
    cols: jax.Array,           # [Pv]
    pv_valid: jax.Array,       # [Pv] bool
    view_coords: jax.Array,    # [Pv, 3] coords for the hole fill
    text_embeddings: jax.Array,  # [n_cls, C] L2-normalized (background excluded)
    logit_scale: jax.Array,    # []
    mask_shape: Tuple[int, int],
    mask_threshold: float = 0.5,
) -> ViewLiftIds:
    """Index-valued single-view lift — ``lift_view_features`` restructured
    around the observation that EVERY per-point feature is one of only Q
    rows: covered points take ``mask_embed[winner]``, hole-filled points take
    their donor's (again a winner row, the donor being a covered point), and
    unseen points are zero (ref affinity_module.py:560-625 — the per-query
    assignment followed by the per-view KDTree fill). So the view's output is
    a [Pv] int32 ``winner`` into a [Q+1, C] normalized-embedding table (row Q
    = the zero no-feature sentinel) plus the matching [Q+1, n_cls] logits
    table: the [Pv, C] normalize + [Pv, C] @ [C, n_cls] logits matmul
    collapse to Q-row table ops, the hole fill fills an int instead of
    scattering C-wide rows, and downstream fusion never materializes a
    [V, Pv, C] feature buffer (2.1 GB bf16 at preset scale — the buffer that
    forced the old bf16 storage compromise). Gathering the tables at
    ``winner`` reproduces ``lift_view_features`` exactly (same winner, same
    donor ties, same normalize-then-project per row)."""
    winner, covered = _view_winner(
        pred_masks, pred_logits, rows, cols, pv_valid, mask_shape, mask_threshold
    )
    Q, C = mask_embed.shape

    emb = mask_embed.astype(jnp.float32)
    norm = jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    emb_n = emb / norm
    logits_q = logit_scale * emb_n @ text_embeddings.astype(jnp.float32).T
    embed_table = jnp.concatenate([emb_n, jnp.zeros((1, C), jnp.float32)])
    logit_table = jnp.concatenate(
        [logits_q, jnp.zeros((1, logits_q.shape[1]), jnp.float32)]
    )

    # per-view nearest fill on INDICES (ref :604-625): the donor search is
    # nearest_fill's exact core (shared — identical donors incl. ties); only
    # the payload changes from [Pv, C] features to the winner int
    donor, filled = nearest_donor(
        view_coords.astype(jnp.float32), covered, pv_valid
    )
    w = jnp.where(covered, winner, jnp.where(filled, winner[donor], Q))
    w = jnp.where(pv_valid, w, Q).astype(jnp.int32)
    return ViewLiftIds(w, embed_table, logit_table)


@partial(jax.jit, static_argnames=("num_points", "top_k"))
def fuse_views(
    view_feats: jax.Array,       # [V, Pv, C]
    view_logits: jax.Array,      # [V, Pv, n_cls]
    view_point_ids: jax.Array,   # [V, Pv] int32 scene-point id, == num_points pad
    view_point_valid: jax.Array, # [V, Pv] bool
    num_points: int,
    top_k: int = 3,
) -> Tuple[jax.Array, jax.Array]:
    """Cross-view consensus fusion (ref :647-685), dense-feature form.

    Used by the lseg/ape lift backends and the view-parallel path; the
    default xdecoder pipeline fuses through ``fuse_views_indexed``.
    """
    V, Pv, C = view_feats.shape
    ptrs = (
        jnp.arange(V, dtype=jnp.int32)[:, None] * Pv
        + jnp.arange(Pv, dtype=jnp.int32)[None, :]
    )
    return _fuse_core(
        view_logits, ptrs, view_feats.reshape(V * Pv, C),
        view_point_ids, view_point_valid, num_points, top_k,
    )


@partial(jax.jit, static_argnames=("num_points", "top_k"))
def fuse_views_indexed(
    winner: jax.Array,           # [V, Pv] int32 table rows (Q = sentinel)
    embed_tables: jax.Array,     # [V, Q+1, C] per-view normalized embeds
    logit_tables: jax.Array,     # [V, Q+1, n_cls]
    view_point_ids: jax.Array,   # [V, Pv] int32 scene-point id, == num_points pad
    view_point_valid: jax.Array, # [V, Pv] bool
    num_points: int,
    top_k: int = 3,
) -> Tuple[jax.Array, jax.Array]:
    """Cross-view consensus fusion over index-valued views (``ViewLiftIds``).

    Identical math to ``fuse_views`` on the gathered-dense equivalents
    (``embed_tables[v][winner[v]]`` / ``logit_tables[v][winner[v]]``): the
    top-k merge's pointers simply point INTO the flattened [V*(Q+1), C]
    embed table instead of a [V*Pv, C] feature buffer — built by arithmetic
    on ``winner`` (no extra gathers), so the only materialized per-point
    transient is the [V*Pv, n_cls] logits rows the consensus vote needs
    anyway. The final agreement-weighted feature mix gathers from the tiny
    table.
    """
    V, Pv = winner.shape
    Qe, C = embed_tables.shape[1:]
    n_cls = logit_tables.shape[-1]
    ptrs = jnp.arange(V, dtype=jnp.int32)[:, None] * Qe + winner     # [V, Pv]
    view_logits = (
        logit_tables.reshape(V * Qe, n_cls)
        .astype(jnp.float32)[ptrs.reshape(-1)]
        .reshape(V, Pv, n_cls)
    )
    return _fuse_core(
        view_logits, ptrs, embed_tables.reshape(V * Qe, C),
        view_point_ids, view_point_valid, num_points, top_k,
    )


def _fuse_core(
    view_logits: jax.Array,      # [V, Pv, n_cls]
    ptrs: jax.Array,             # [V, Pv] int32 row of `table` backing each slot
    table: jax.Array,            # [R, C] feature rows the pointers index
    view_point_ids: jax.Array,   # [V, Pv]
    view_point_valid: jax.Array, # [V, Pv] bool
    num_points: int,
    top_k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Shared consensus + top-k agreement merge (ref :647-685).

    The running top-k merge tracks POINTERS into ``table``, not features:
    features are selected by agreement score and only mixed at the very end,
    so the scan carries [P, k] scores + [P, k] i32 pointers instead of a
    [P, k, C] feature buffer — ~16x less fuse gather/scatter traffic per
    view, one final [P, k, C] gather, and no HBM-pressure buffer at preset
    scale (the old bf16 storage_dtype compromise is gone: the merge is
    exactly feature-preserving at every scale).

    Returns (fused_features [P, C] f32, view_count [P]).
    """
    V, Pv, n_cls = view_logits.shape
    C = table.shape[1]
    flat_ids = jnp.where(view_point_valid, view_point_ids, num_points).reshape(-1)

    sum_logits = segment_sum(
        view_logits.reshape(-1, n_cls).astype(jnp.float32), flat_ids, num_points,
        sorted_hint="never",
    )
    count = segment_sum(
        view_point_valid.reshape(-1, 1).astype(jnp.float32), flat_ids, num_points,
        sorted_hint="never",
    )[:, 0]
    consensus = jnp.argmax(sum_logits / jnp.maximum(count, 1.0)[:, None], axis=-1)

    top_scores0 = jnp.full((num_points + 1, top_k), -jnp.inf)
    top_ptr0 = jnp.zeros((num_points + 1, top_k), jnp.int32)
    consensus_pad = jnp.concatenate([consensus, jnp.zeros((1,), consensus.dtype)])

    def merge_view(carry, v):
        ts, tp = carry
        # invalid slots -> OUT-OF-BOUNDS (num_points + 1): dropped by the
        # scatter, and required for the unique_indices hint to be truthful
        # (many invalid slots pointing at one in-bounds row would collide)
        ids = jnp.where(view_point_valid[v], view_point_ids[v], num_points + 1)
        agree = view_logits[v][jnp.arange(Pv), consensus_pad[ids]]
        agree = jnp.where(view_point_valid[v], agree, -jnp.inf)     # [Pv]
        cur_s = ts[ids]                                             # [Pv, k]
        cur_p = tp[ids]                                             # [Pv, k]
        cat_s = jnp.concatenate([cur_s, agree[:, None]], axis=1)    # [Pv, k+1]
        cat_p = jnp.concatenate([cur_p, ptrs[v][:, None]], axis=1)
        new_s, arg = jax.lax.top_k(cat_s, top_k)
        new_p = jnp.take_along_axis(cat_p, arg, axis=1)
        # per-view point ids are unique (the loader samples visible points
        # without replacement); the hint lets XLA skip serialization
        ts = ts.at[ids].set(new_s, mode="drop", unique_indices=True)
        tp = tp.at[ids].set(new_p, mode="drop", unique_indices=True)
        return (ts, tp), None

    (top_scores, top_ptr), _ = jax.lax.scan(
        merge_view, (top_scores0, top_ptr0), jnp.arange(V)
    )
    top_scores = top_scores[:num_points]
    top_ptr = top_ptr[:num_points]

    w = jax.nn.softmax(
        jnp.where(jnp.isfinite(top_scores), top_scores, -jnp.inf), axis=-1
    )
    w = jnp.where(jnp.isfinite(top_scores), w, 0.0)
    # dead pointer slots default to table row 0: their weight is exactly
    # 0.0 (the where above), so the gathered garbage never contributes.
    # The gather+einsum is TILED over points: an unchunked [P, k, C] gather
    # plus its f32 cast materializes ~9.6 GB at preset scale (P=2^20) —
    # OOMed the 16 GB chip next to the dense-path [V, Pv, C] view buffer.
    vf = table
    PT = min(num_points, 1 << 17)
    n_pt = -(-num_points // PT)
    pad = n_pt * PT - num_points
    w_p = jnp.pad(w, ((0, pad), (0, 0)))
    ptr_p = jnp.pad(top_ptr, ((0, pad), (0, 0)))

    def fuse_tile(args):
        wp, pp = args                                               # [PT,k]
        tf = vf[pp]                                                 # [PT,k,C]
        return jnp.einsum(
            "pk,pkc->pc", wp, tf.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

    fused = jax.lax.map(
        fuse_tile, (w_p.reshape(n_pt, PT, top_k), ptr_p.reshape(n_pt, PT, top_k))
    ).reshape(-1, C)[:num_points]
    fused = jnp.where(count[:, None] > 0, fused, 0.0)
    return fused, count


def fill_unseen_points(
    fused: jax.Array,        # [P, C]
    points: jax.Array,       # [P, 3]
    count: jax.Array,        # [P] views per point
    point_valid: jax.Array,  # [P] bool
) -> jax.Array:
    """Global nearest fill for never-seen points (ref :687-696)."""
    # both-compacted gated sweep (ops/knn.nearest_fill): at P=131k it beats
    # the grid-pruned fill at the unseen fractions the fused bench scenes
    # actually produce (sweep 51/101 vs grid 66/181 ms at 5%/30% unseen,
    # scripts/bench_ab_fill.py)
    return nearest_fill(fused, points.astype(jnp.float32), count > 0, point_valid)


def fill_unseen_points_voxel(
    fused: jax.Array,         # [P, C]
    count: jax.Array,         # [P] views per point
    point_valid: jax.Array,   # [P] bool
    point2voxel: jax.Array,   # [P] -> voxel id (== M for padding)
    voxel_coords: jax.Array,  # [M, 3]
    voxel_valid: jax.Array,   # [M] bool
) -> jax.Array:
    """Voxel-resolution variant of the global unseen fill for HUGE scenes.

    The reference's KDTree fill is point-to-point (ref :687-696) — O(P^2) on
    device, which dominates preset-scale scenes (P=2^20). Here the donor is
    the nearest voxel that contains at least one SEEN point, and the filled
    feature is that voxel's mean fused feature — within one voxel size (2 cm)
    of the reference's donor choice. Used by lift_scene only above the
    point-count gate; the standard eval spec keeps the exact point fill.
    """
    M = voxel_coords.shape[0]
    seen = count > 0
    p2v = jnp.where(point_valid, point2voxel, M)
    from geopurify_tpu.ops.segment import segment_sum

    vox_seen_cnt = segment_sum(
        seen.astype(jnp.float32)[:, None], p2v, M
    )[:, 0]
    vox_seen = vox_seen_cnt > 0
    # mean fused feature over SEEN points per voxel
    masked = jnp.where(seen[:, None], fused, 0.0)
    vox_feat = segment_sum(masked, p2v, M) / jnp.maximum(vox_seen_cnt, 1.0)[:, None]

    # grid-pruned exact donor search (the full argmin_search sweep is O(M^2)
    # — ~7e10 distance pairs at M=2^18, several hundred ms of the preset
    # fuse/fill stage; the Hilbert-tiled fill prunes to ~10^3 candidates
    # per tile with the same result up to equal-distance donor ties)
    filled_vox = nearest_fill_grid(
        vox_feat, voxel_coords.astype(jnp.float32),
        vox_seen & voxel_valid, voxel_valid, num_candidates=4096,
    )                                                   # [M, C]
    filled_vox = jnp.concatenate(
        [filled_vox, jnp.zeros((1, fused.shape[1]), fused.dtype)]
    )
    donated = filled_vox[jnp.minimum(p2v, M)]
    return jnp.where(seen[:, None], fused, donated)
