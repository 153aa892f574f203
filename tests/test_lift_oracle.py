"""Numpy oracles for the 2D->3D lift — pinning the reference algorithm's
semantics (mask assembly affinity_module.py:544-593, consensus fusion
:647-685) rather than just shapes."""

import numpy as np
import jax
import jax.numpy as jnp

from geopurify_tpu.models.lift import fuse_views, lift_view_features


def np_lift_oracle(pred_masks, mask_embed, pred_logits, rows, cols, pv_valid,
                   text, logit_scale, mask_shape):
    """Direct transcription of the reference per-view lift:
    bicubic-resized masks -> score-weighted argmax mask id per pixel ->
    per-point feature = winner's embed where sigmoid >= 0.5."""
    from scipy.ndimage import zoom

    Q, h, w = pred_masks.shape
    H, W = mask_shape
    masks = np.stack([
        zoom(pred_masks[q], (H / h, W / w), order=1)  # order-1: resize-kernel
        for q in range(Q)                              # differences don't move
    ])                                                 # the >=0.5 decision here
    probs = np.exp(pred_logits - pred_logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    scores = probs[:, :-1].max(-1)
    sig = 1 / (1 + np.exp(-masks))
    mask_ids = (scores[:, None, None] * sig).argmax(0)

    r = np.clip(rows, 0, H - 1)
    c = np.clip(cols, 0, W - 1)
    winner = mask_ids[r, c]
    covered = (sig[winner, r, c] >= 0.5) & pv_valid
    feats = np.where(covered[:, None], mask_embed[winner], 0.0)
    return feats, covered


def test_lift_matches_oracle_on_coarse_masks(rng):
    """With masks that are constant over large regions, resize-kernel detail
    is irrelevant and the jax lift must agree with the oracle exactly."""
    Q, h, w = 5, 12, 16
    H, W = 48, 64
    Pv = 200
    n_cls = 4
    # piecewise-constant mask logits: one query strongly claims each quadrant
    pred_masks = np.full((Q, h, w), -8.0, np.float32)
    pred_masks[0, : h // 2, : w // 2] = 8.0
    pred_masks[1, : h // 2, w // 2:] = 8.0
    pred_masks[2, h // 2:, : w // 2] = 8.0
    pred_masks[3, h // 2:, w // 2:] = 8.0
    # query 4 claims nothing
    mask_embed = rng.normal(size=(Q, 8)).astype(np.float32)
    pred_logits = rng.normal(size=(Q, n_cls + 1)).astype(np.float32)
    # keep points away from quadrant boundaries (resize transition bands)
    rows = rng.choice(np.r_[4:20, 28:44], Pv).astype(np.int32)
    cols = rng.choice(np.r_[4:28, 36:60], Pv).astype(np.int32)
    pv_valid = np.ones(Pv, bool)
    coords = rng.normal(size=(Pv, 3)).astype(np.float32)
    text = rng.normal(size=(n_cls, 8)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)

    ref_feats, covered = np_lift_oracle(
        pred_masks, mask_embed, pred_logits, rows, cols, pv_valid,
        text, 10.0, (H, W),
    )
    out = lift_view_features(
        jnp.asarray(pred_masks), jnp.asarray(mask_embed), jnp.asarray(pred_logits),
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(pv_valid),
        jnp.asarray(coords), jnp.asarray(text), jnp.float32(10.0), (H, W),
    )
    got = np.asarray(out.features)
    # covered points: normalized winner embed
    ref_n = ref_feats[covered]
    ref_n = ref_n / np.linalg.norm(ref_n, axis=1, keepdims=True)
    np.testing.assert_allclose(got[covered], ref_n, rtol=1e-4, atol=1e-5)
    assert covered.sum() > Pv * 0.8  # the quadrant masks cover most points


def test_fuse_views_oracle(rng):
    """Top-3 consensus fusion against a direct numpy transcription."""
    V, Pv, C, n_cls, P = 4, 8, 6, 3, 12
    feats = rng.normal(size=(V, Pv, C)).astype(np.float32)
    logits = rng.normal(size=(V, Pv, n_cls)).astype(np.float32)
    # a view sees each scene point at most once (the projection invariant)
    ids = np.stack([
        rng.choice(P, Pv, replace=False) for _ in range(V)
    ]).astype(np.int32)
    valid = rng.random((V, Pv)) < 0.8

    fused, count = fuse_views(
        jnp.asarray(feats), jnp.asarray(logits), jnp.asarray(ids),
        jnp.asarray(valid), num_points=P, top_k=3,
    )
    fused, count = np.asarray(fused), np.asarray(count)

    for p in range(P):
        recs = [(v, i) for v in range(V) for i in range(Pv)
                if valid[v, i] and ids[v, i] == p]
        assert count[p] == len(recs)
        if not recs:
            np.testing.assert_allclose(fused[p], 0.0)
            continue
        mean_logits = np.mean([logits[v, i] for v, i in recs], axis=0)
        consensus = int(mean_logits.argmax())
        agree = np.array([logits[v, i][consensus] for v, i in recs])
        order = np.argsort(-agree)[:3]
        w = np.exp(agree[order] - agree[order].max())
        w = w / w.sum()
        ref = sum(wi * feats[recs[j][0], recs[j][1]] for wi, j in zip(w, order))
        np.testing.assert_allclose(fused[p], ref, rtol=1e-3, atol=1e-4)


def test_voxel_resolution_fill_matches_point_fill(rng):
    """The huge-scene voxel-resolution fill must agree with the exact point
    fill up to within-voxel variation (the donor differs by at most one
    voxel; features here are constant per voxel so results match exactly)."""
    import jax.numpy as jnp

    from geopurify_tpu.models.lift import (
        fill_unseen_points,
        fill_unseen_points_voxel,
    )

    M, ppv, C = 40, 4, 6
    vox = np.unique(rng.integers(0, 12, (M * 2, 3)), axis=0)[:M].astype(np.int32)
    order = np.lexsort((vox[:, 2], vox[:, 1], vox[:, 0]))
    vox = vox[order]
    M = len(vox)
    P = M * ppv
    p2v = np.repeat(np.arange(M, dtype=np.int32), ppv)
    points = vox[p2v].astype(np.float32) + rng.uniform(0.1, 0.9, (P, 3)) * 0.0
    # per-voxel constant features; a third of voxels fully unseen
    vox_feat = rng.normal(size=(M, C)).astype(np.float32)
    fused = vox_feat[p2v].copy()
    count = np.ones(P, np.float32)
    unseen_vox = rng.choice(M, M // 3, replace=False)
    for v in unseen_vox:
        count[p2v == v] = 0
        fused[p2v == v] = 0
    valid = np.ones(P, bool)

    exact = np.asarray(fill_unseen_points(
        jnp.asarray(fused), jnp.asarray(points), jnp.asarray(count),
        jnp.asarray(valid),
    ))
    voxf = np.asarray(fill_unseen_points_voxel(
        jnp.asarray(fused), jnp.asarray(count), jnp.asarray(valid),
        jnp.asarray(p2v), jnp.asarray(vox), jnp.ones(M, bool),
    ))
    # seen points untouched by both
    seen = count > 0
    np.testing.assert_allclose(voxf[seen], fused[seen])
    np.testing.assert_allclose(exact[seen], fused[seen])
    # unseen points: both fills pick the nearest seen voxel's feature here
    # (points sit at voxel corners, features constant per voxel)
    np.testing.assert_allclose(voxf[~seen], exact[~seen], atol=1e-5)


def test_voxel_fill_approximation_bound(rng):
    """Quantify fill_unseen_points_voxel vs the exact point fill on per-point
    VARYING features (VERDICT r2 weak #5: the old oracle used per-voxel-
    constant features where the two fills agree trivially).

    Features follow a smooth spatial field + noise; with a 1-voxel-accurate
    donor the filled features must stay close to the exact fill's both in
    feature space and after cosine-argmax classification.
    """
    import jax.numpy as jnp

    from geopurify_tpu.models.lift import (
        fill_unseen_points,
        fill_unseen_points_voxel,
    )
    from geopurify_tpu.ops.voxelize import voxelize_points

    P, C = 4096, 16
    # clustered surface points at 2 cm voxels
    pts = rng.uniform(0, 1.0, (P, 3)).astype(np.float32)
    pts[:, 2] *= 0.1                       # a slab — realistic donor distances
    vox_int = np.floor(pts / 0.02).astype(np.int32)

    dv = voxelize_points(jnp.asarray(vox_int), jnp.ones(P, bool), max_voxels=P)
    # smooth field: feature channel c = sin(k_c . x) + small noise
    ks = rng.normal(0, 3, (C, 3)).astype(np.float32)
    feat = np.sin(pts @ ks.T) + 0.05 * rng.normal(0, 1, (P, C)).astype(np.float32)
    seen = rng.uniform(size=P) > 0.25      # 25% unseen
    count = jnp.asarray(seen.astype(np.float32))
    fused = jnp.asarray(np.where(seen[:, None], feat, 0.0).astype(np.float32))
    valid = jnp.ones(P, bool)

    exact = np.asarray(fill_unseen_points(fused, jnp.asarray(pts), count, valid))
    approx = np.asarray(fill_unseen_points_voxel(
        fused, count, valid, dv.point2voxel, dv.voxel_coords, dv.voxel_valid
    ))

    un = ~seen
    # cosine similarity between the two fills on the filled rows
    a, b = exact[un], approx[un]
    cos = (a * b).sum(1) / np.maximum(
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1), 1e-9
    )
    assert np.median(cos) > 0.95, f"median filled-feature cos {np.median(cos):.3f}"
    assert np.mean(cos > 0.8) > 0.9, f"{np.mean(cos > 0.8):.2%} rows above 0.8"

    # downstream decision agreement: argmax vs a random normalized text matrix
    text = rng.normal(0, 1, (5, C)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)

    def pred(f):
        fn = f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-9)
        return (fn @ text.T).argmax(1)

    agree = (pred(exact[un]) == pred(approx[un])).mean()
    assert agree > 0.9, f"argmax agreement on filled rows {agree:.2%}"


def test_lift_point_eval_and_grid_branches_agree(rng):
    """lift_view_features has two statically-gated implementations of the
    mask-id argmax (point-evaluated AA taps when Pv*Ty*Tx <= H*W, the dense
    [Q, H, W] resize grid otherwise). Same inputs through both branches must
    produce the same features — the gate is a perf decision, not a semantic
    one. Pv toggles the branch; padded rows are invalid so the common rows
    see identical donors/queries in the hole fill."""
    Q, h, w = 6, 12, 16
    H, W = 48, 64          # H*W = 3072; T = 4x4 taps at this upscale
    n_cls, C = 4, 8
    pred_masks = rng.normal(0, 3, (Q, h, w)).astype(np.float32)
    mask_embed = rng.normal(size=(Q, C)).astype(np.float32)
    pred_logits = rng.normal(size=(Q, n_cls + 1)).astype(np.float32)
    text = rng.normal(size=(n_cls, C)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)

    Pv_small, Pv_big = 64, 256   # 64*16=1024 <= 3072 < 4096=256*16
    rows = rng.integers(0, H, Pv_small).astype(np.int32)
    cols = rng.integers(0, W, Pv_small).astype(np.int32)
    coords = rng.normal(size=(Pv_small, 3)).astype(np.float32)

    def run(Pv):
        pad = Pv - Pv_small
        return lift_view_features(
            jnp.asarray(pred_masks), jnp.asarray(mask_embed),
            jnp.asarray(pred_logits),
            jnp.asarray(np.pad(rows, (0, pad))),
            jnp.asarray(np.pad(cols, (0, pad))),
            jnp.asarray(np.pad(np.ones(Pv_small, bool), (0, pad))),
            jnp.asarray(np.pad(coords, ((0, pad), (0, 0)))),
            jnp.asarray(text), jnp.float32(10.0), (H, W),
        )

    small = run(Pv_small)   # point-evaluated branch
    big = run(Pv_big)       # full-grid branch
    np.testing.assert_allclose(
        np.asarray(small.features),
        np.asarray(big.features)[:Pv_small], rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(small.logits),
        np.asarray(big.logits)[:Pv_small], rtol=2e-4, atol=2e-4,
    )
