"""Within-scene view parallelism — shard one scene's views over the mesh.

The reference's only parallelism is scene-level DP (SURVEY §2.4). For
latency-critical serving of a SINGLE scene, the per-view X-Decoder forwards
(the wall-clock majority) are embarrassingly parallel: this module shards the
VIEW axis over the mesh with `shard_map`, runs the forwards + per-view lifts
locally, and reproduces the exact cross-view consensus fusion
(models/lift.fuse_views ≙ reference affinity_module.py:647-696) with
collectives:

- mean-logit consensus: local segment-sums psum'd over the mesh axis;
- top-k agreement merge: each device merges its local views' (score, feature)
  candidates, then a HYPERCUBE TOURNAMENT (log2(n) ppermute rounds, merging
  top-k sets pairwise — top-k-of-union is associative and commutative) leaves
  every device with the global top-k, bit-identical to the sequential merge
  up to equal-score ties;
- the global nearest fill runs replicated on the fused result.

Requires n_devices to be a power of two dividing the view bucket.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from geopurify_tpu.models.lift import fill_unseen_points, lift_view_features
from geopurify_tpu.ops.segment import segment_sum


def _merge_topk(ts_a, tf_a, ts_b, tf_b, k: int):
    """Top-k of the union of two per-point top-k candidate sets."""
    cat_s = jnp.concatenate([ts_a, ts_b], axis=1)          # [P, 2k]
    cat_f = jnp.concatenate([tf_a, tf_b], axis=1)          # [P, 2k, C]
    new_s, arg = jax.lax.top_k(cat_s, k)
    new_f = jnp.take_along_axis(cat_f, arg[:, :, None], axis=1)
    return new_s, new_f


def sharded_lift_scene(
    pipeline,
    batch,
    mesh: Mesh,
    axis: str = "data",
) -> Tuple[jax.Array, jax.Array]:
    """Multi-device lift of ONE scene: views sharded over ``axis``.

    Returns (fused_features [P, C] f32, view_count [P]) — equal to
    ``pipeline.lift_scene(batch)`` up to equal-score tie order and fp
    reduction order.
    """
    cfg = pipeline.cfg
    V = batch.images.shape[0]
    n = mesh.shape[axis]
    if V % n or (n & (n - 1)):
        raise ValueError(f"views {V} must split over a power-of-two mesh axis, got {n}")
    P_pts = batch.points.shape[0]
    C = cfg.pooling.feature_dim
    top_k = cfg.xdecoder.fusion_top_k
    mask_shape = tuple(cfg.xdecoder.mask_shape)
    mask_threshold = cfg.xdecoder.mask_threshold
    xdecoder = pipeline.xdecoder

    def device_lift(tparams, text, logit_scale, points,
                    images, rows, cols, pv_valid, ids, view_valid):
        # local shard: leading dim V/n
        text_no_bg = text[:-1]

        def per_view(carry, xs):
            img, r, c, pv, idv, vv = xs
            out = xdecoder.apply(tparams, img[None], text, logit_scale)
            lift = lift_view_features(
                out["pred_masks"][0], out["mask_embed"][0], out["pred_logits"][0],
                r, c, pv & vv, points[idv % P_pts],
                text_no_bg, logit_scale, mask_shape,
                mask_threshold=mask_threshold,
            )
            return carry, (lift.features, lift.logits)

        _, (vfeats, vlogits) = jax.lax.scan(
            per_view, 0,
            (images, rows, cols, pv_valid, ids, view_valid),
        )                                   # [Vl, Pv, C], [Vl, Pv, n_cls]

        vv_pv = pv_valid & view_valid[:, None]
        flat_ids = jnp.where(vv_pv, ids, P_pts).reshape(-1)
        n_cls = vlogits.shape[-1]
        sum_logits = segment_sum(
            vlogits.reshape(-1, n_cls).astype(jnp.float32), flat_ids, P_pts,
            sorted_hint="never",
        )
        count = segment_sum(
            vv_pv.reshape(-1, 1).astype(jnp.float32), flat_ids, P_pts,
            sorted_hint="never",
        )[:, 0]
        # global consensus class: psum'd mean logits (≙ fuse_views:101-107)
        sum_logits = jax.lax.psum(sum_logits, axis)
        count = jax.lax.psum(count, axis)
        consensus = jnp.argmax(
            sum_logits / jnp.maximum(count, 1.0)[:, None], axis=-1
        )
        consensus_pad = jnp.concatenate(
            [consensus, jnp.zeros((1,), consensus.dtype)]
        )

        # local top-k agreement merge over this device's views (fuse_views:114-129)
        ts = jnp.full((P_pts + 1, top_k), -jnp.inf)
        tf = jnp.zeros((P_pts + 1, top_k, C), jnp.float32)

        def merge_view(carry, v):
            ts_, tf_ = carry
            # out-of-bounds padding keeps scatter indices unique (see
            # models/lift.fuse_views)
            idv = jnp.where(vv_pv[v], ids[v], P_pts + 1)
            agree = vlogits[v][jnp.arange(ids.shape[1]), consensus_pad[idv]]
            agree = jnp.where(vv_pv[v], agree, -jnp.inf)
            cur_s = ts_[idv]
            cur_f = tf_[idv]
            cat_s = jnp.concatenate([cur_s, agree[:, None]], axis=1)
            cat_f = jnp.concatenate(
                [cur_f, vfeats[v].astype(jnp.float32)[:, None]], axis=1
            )
            new_s, arg = jax.lax.top_k(cat_s, top_k)
            new_f = jnp.take_along_axis(cat_f, arg[:, :, None], axis=1)
            ts_ = ts_.at[idv].set(new_s, mode="drop", unique_indices=True)
            tf_ = tf_.at[idv].set(new_f, mode="drop", unique_indices=True)
            return (ts_, tf_), None

        (ts, tf), _ = jax.lax.scan(merge_view, (ts, tf), jnp.arange(vfeats.shape[0]))
        ts = ts[:P_pts]
        tf = tf[:P_pts]

        # hypercube tournament: after log2(n) pairwise merges every device
        # holds the GLOBAL top-k (top-k-of-union is associative/commutative)
        steps = int(np.log2(n))
        for s in range(steps):
            perm = [(i, i ^ (1 << s)) for i in range(n)]
            ts_o = jax.lax.ppermute(ts, axis, perm)
            tf_o = jax.lax.ppermute(tf, axis, perm)
            ts, tf = _merge_topk(ts, tf, ts_o, tf_o, top_k)

        w = jax.nn.softmax(
            jnp.where(jnp.isfinite(ts), ts, -jnp.inf), axis=-1
        )
        w = jnp.where(jnp.isfinite(ts), w, 0.0)
        fused = jnp.einsum("pk,pkc->pc", w, tf)
        fused = jnp.where(count[:, None] > 0, fused, 0.0)
        return fused, count

    mapped = shard_map(
        device_lift,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(),
                  P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    fused, count = jax.jit(mapped)(
        pipeline.teacher_params, pipeline.text_embeddings, pipeline.logit_scale,
        batch.points,
        batch.images, batch.view_rows, batch.view_cols,
        batch.view_point_valid, batch.view_point_ids, batch.view_valid,
    )
    fused = fill_unseen_points(fused, batch.points, count, batch.point_valid)
    return fused, count
