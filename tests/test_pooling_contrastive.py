"""Geometry-guided pooling vs numpy oracle; contrastive sampler vs reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from geopurify_tpu.ops.contrastive import (
    info_nce_loss,
    sample_contrastive_pairs_hybrid,
)
from geopurify_tpu.ops.pooling import (
    build_affinity_graph,
    fixed_degree_spmm,
    geometry_guided_pooling,
)


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_affinity_graph_matches_oracle(rng):
    M, E = 80, 16
    coords = rng.uniform(size=(M, 3)).astype(np.float32)
    emb = rng.normal(size=(M, E)).astype(np.float32)
    k = 8
    nbr, w = build_affinity_graph(
        jnp.asarray(emb), jnp.asarray(coords), jnp.ones(M, bool),
        k=k, sharpen=20.0, query_tile=32, db_chunk=32,
    )
    nbr, w = np.asarray(nbr), np.asarray(w)
    # oracle
    d2 = ((coords[:, None] - coords[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    o_nbr = np.argsort(d2, axis=1, kind="stable")[:, :k]
    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    for i in range(M):
        assert set(nbr[i]) == set(o_nbr[i])
        aff = e[i] @ e[nbr[i]].T
        np.testing.assert_allclose(w[i], _softmax(aff * 20.0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(w.sum(1), 1.0, rtol=1e-5)


def test_fixed_degree_spmm(rng):
    M, K, C = 50, 4, 7
    w = rng.uniform(size=(M, K)).astype(np.float32)
    nbr = rng.integers(0, M, size=(M, K)).astype(np.int32)
    f = rng.normal(size=(M, C)).astype(np.float32)
    out = np.asarray(fixed_degree_spmm(jnp.asarray(w), jnp.asarray(nbr), jnp.asarray(f), row_tile=16))
    oracle = np.einsum("mk,mkc->mc", w, f[nbr])
    np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-5)


def test_geometry_guided_pooling_converges_to_smooth(rng):
    """Pooling over a two-cluster scene sharpens within-cluster agreement."""
    M = 64
    coords = np.concatenate([rng.uniform(0, 1, (32, 3)), rng.uniform(5, 6, (32, 3))]).astype(np.float32)
    emb = np.concatenate([np.tile([1.0, 0.0], (32, 1)), np.tile([0.0, 1.0], (32, 1))])
    emb += rng.normal(scale=0.01, size=emb.shape)
    feats = rng.normal(size=(M, 8)).astype(np.float32)
    out, overflow = geometry_guided_pooling(
        jnp.asarray(emb, jnp.float32), jnp.asarray(feats), jnp.asarray(coords),
        jnp.ones(M, bool), k=8, sharpen=20.0, num_iterations=19,
    )
    out = np.asarray(out)
    assert int(overflow) == 0
    # within-cluster variance shrinks dramatically
    for sl in (slice(0, 32), slice(32, 64)):
        assert out[sl].std(0).mean() < 0.25 * feats[sl].std(0).mean()


def test_contrastive_sampler_semantics(rng):
    N, D, K = 600, 12, 16
    feats = rng.normal(size=(N, D)).astype(np.float32)
    coords = rng.uniform(size=(N, 3)).astype(np.float32)
    valid = np.ones(N, bool)
    valid[-40:] = False
    d2 = ((coords[:, None] - coords[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    d2[:, ~valid] = np.inf
    nbr = np.argsort(d2, 1)[:, :K].astype(np.int32)

    A, n_macro, n_micro = 64, 6, 3
    pairs = sample_contrastive_pairs_hybrid(
        jax.random.key(0), jnp.asarray(feats), jnp.asarray(valid), jnp.asarray(nbr),
        num_anchors=A, num_macro=n_macro, num_micro=n_micro,
        db_chunk=128, anchor_tile=32,
    )
    ai = np.asarray(pairs.anchor_idx)
    pi = np.asarray(pairs.positive_idx)
    ni = np.asarray(pairs.negative_idx)
    av = np.asarray(pairs.anchor_valid)
    assert av.sum() == min(A, valid.sum() // 3)
    assert valid[ai[av]].all()
    f = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    sims = f @ f.T
    sims[:, ~valid] = -np.inf
    for j in np.where(av)[0][:16]:
        a = ai[j]
        s = sims[a].copy()
        s[a] = -np.inf
        assert pi[j] == np.argmax(s), "positive = globally most similar"
        # macro negatives are the globally least similar (excluding self/pos)
        s2 = sims[a].copy()
        s2[a] = np.inf
        s2[~valid] = np.inf
        want = set(np.argsort(s2, kind="stable")[:n_macro])
        got = set(ni[j][:n_macro])
        # ties can swap order; require large overlap and correct similarity range
        assert len(want & got) >= n_macro - 1
        # micro negatives come from the anchor's spatial neighborhood
        assert set(ni[j][n_macro:]) <= set(nbr[a])
        assert a not in set(ni[j]) and pi[j] not in set(ni[j])


def test_info_nce_matches_cross_entropy(rng):
    A, E, n_neg = 16, 8, 5
    a = rng.normal(size=(A, E)).astype(np.float32)
    p = rng.normal(size=(A, E)).astype(np.float32)
    n = rng.normal(size=(A, n_neg, E)).astype(np.float32)
    valid = np.ones(A, bool)
    loss = float(info_nce_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), jnp.asarray(valid), 0.07))

    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    an, pn, nn_ = norm(a), norm(p), norm(n)
    logits = np.concatenate(
        [np.einsum("ae,ae->a", an, pn)[:, None], np.einsum("ae,ane->an", an, nn_)], 1
    ) / 0.07
    ce = -(logits[:, 0] - np.log(np.exp(logits).sum(1))).mean()
    np.testing.assert_allclose(loss, ce, rtol=1e-5)

    # anchor validity masks the mean
    valid2 = valid.copy()
    valid2[8:] = False
    loss2 = float(info_nce_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), jnp.asarray(valid2), 0.07))
    ce2 = -(logits[:8, 0] - np.log(np.exp(logits[:8]).sum(1))).mean()
    np.testing.assert_allclose(loss2, ce2, rtol=1e-5)


def test_banded_spmm_matches_gather(rng):
    """Banded-dense MXU operator must equal the fixed-degree gather spmm."""
    import jax.numpy as jnp

    from geopurify_tpu.ops.pooling import (
        build_banded_operator,
        iterate_pooling,
        iterate_pooling_banded,
    )

    M, K, C = 512, 8, 24
    # spatially-sorted-ish neighbor structure with a few far edges
    nbr = (np.arange(M)[:, None] + rng.integers(-40, 40, (M, K))) % M
    w = rng.random((M, K)).astype(np.float32)
    w /= w.sum(1, keepdims=True)
    feats = rng.normal(size=(M, C)).astype(np.float32)

    ref = iterate_pooling(
        jnp.asarray(w), jnp.asarray(nbr.astype(np.int32)), jnp.asarray(feats),
        num_iterations=3, row_tile=128,
    )
    op = build_banded_operator(
        jnp.asarray(w), jnp.asarray(nbr.astype(np.int32)),
        band=128, row_tile=64, max_residual=M * K,
    )
    assert int(op.n_dropped) == 0
    out = iterate_pooling_banded(
        op, jnp.asarray(feats), num_iterations=3, band=128, row_tile=64,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0.1, atol=0.05)
    # and with full-width band (no residual) it's the same too
    op2 = build_banded_operator(
        jnp.asarray(w), jnp.asarray(nbr.astype(np.int32)),
        band=M, row_tile=64, max_residual=8,
    )
    assert float(jnp.sum(op2.res_w)) == 0.0  # nothing out of band
    assert int(op2.n_dropped) == 0
    out2 = iterate_pooling_banded(
        op2, jnp.asarray(feats), num_iterations=3, band=M, row_tile=64,
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), rtol=0.1, atol=0.05)
    # overflow counting: a tiny residual capacity under-counts edges and the
    # banded operator reports exactly how many were dropped (fixed tile-center
    # windows so the expected count is computable here)
    op3 = build_banded_operator(
        jnp.asarray(w), jnp.asarray(nbr.astype(np.int32)),
        band=64, row_tile=64, max_residual=4, adaptive_starts=False,
    )
    li = nbr - np.clip(
        (np.arange(M) // 64) * 64 + 32 - 32, 0, M - 64
    )[:, None]
    n_out = int((~((li >= 0) & (li < 64))).sum())
    assert int(op3.n_dropped) == max(n_out - 4, 0)
    # adaptive window starts stay exact (residual catches whatever the
    # mean-centered window misses)
    op3b = build_banded_operator(
        jnp.asarray(w), jnp.asarray(nbr.astype(np.int32)),
        band=64, row_tile=64, max_residual=M * K, adaptive_starts=True,
    )
    assert int(op3b.n_dropped) == 0
    out3b = iterate_pooling_banded(
        op3b, jnp.asarray(feats), num_iterations=3, band=64, row_tile=64,
    )
    ref3 = iterate_pooling(
        jnp.asarray(w), jnp.asarray(nbr.astype(np.int32)), jnp.asarray(feats),
        num_iterations=3, row_tile=64,
    )
    np.testing.assert_allclose(np.asarray(out3b), np.asarray(ref3),
                               rtol=0.1, atol=0.05)

    # unique-scatter fast path (exact-kNN rows have distinct neighbors):
    # must match the duplicate-safe build exactly
    nbr_u = np.stack([
        rng.choice(M, K, replace=False) for _ in range(M)
    ]).astype(np.int32)
    opu = build_banded_operator(
        jnp.asarray(w), jnp.asarray(nbr_u), band=128, row_tile=64,
        max_residual=M * K, assume_unique_neighbors=True,
    )
    opd = build_banded_operator(
        jnp.asarray(w), jnp.asarray(nbr_u), band=128, row_tile=64,
        max_residual=M * K,
    )
    np.testing.assert_allclose(np.asarray(opu.S), np.asarray(opd.S), atol=1e-3)
    np.testing.assert_allclose(np.asarray(opu.res_w), np.asarray(opd.res_w))
    assert int(opu.n_dropped) == int(opd.n_dropped) == 0

    # res_chunk is perf-only (preset override passes capacity = one call):
    # a small chunk (8 gated calls) must match the one-call result up to
    # f32 summation order
    out_rc = iterate_pooling_banded(
        op, jnp.asarray(feats), num_iterations=3, band=128, row_tile=64,
        res_chunk=512,
    )
    np.testing.assert_allclose(np.asarray(out_rc), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


def test_pallas_banded_window_matmul_matches_einsum(rng):
    """The Pallas windowed-matmul core (interpret mode on CPU) must equal the
    XLA einsum over the same gathered windows — including padded tail rows,
    non-aligned window starts, and the channel lane-padding path."""
    import jax.numpy as jnp

    from geopurify_tpu.ops.pallas_band import banded_window_matmul

    M, band, row_tile, row_sub, C = 700, 256, 128, 8, 128
    Mp = -(-M // row_tile) * row_tile
    n_t = Mp // row_tile
    S = jnp.asarray(
        rng.normal(size=(Mp, band)).astype(np.float32), jnp.bfloat16
    )
    starts = jnp.asarray(
        (rng.integers(0, M - band, size=(n_t,)) // 8 * 8).astype(np.int32)
    )   # multiples of 8 — the kernel's Mosaic sublane-offset contract
    f = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32), jnp.bfloat16)

    out = banded_window_matmul(
        S, starts, f, band=band, row_tile=row_tile, row_sub=row_sub,
        interpret=True,
    )
    win_idx = starts[:, None] + jnp.arange(band)[None]
    FW = f[win_idx]                                     # [n_t, band, C]
    ref = jnp.einsum(
        "trb,tbc->trc", S.reshape(n_t, row_tile, band), FW,
        preferred_element_type=jnp.float32,
    ).reshape(Mp, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_contrastive_sampler_small_scene(rng):
    """Anchor budget larger than the scene point count must not break."""
    import jax
    import jax.numpy as jnp

    from geopurify_tpu.ops.contrastive import sample_contrastive_pairs_hybrid

    N, D = 64, 8
    f = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    valid = jnp.asarray(rng.random(N) < 0.9)
    coords = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    pairs = sample_contrastive_pairs_hybrid(
        jax.random.key(0), f, valid, coords=coords,
        num_anchors=256, num_macro=5, num_micro=2, spatial_k=8,
    )
    assert pairs.anchor_idx.shape == (256,)
    av = np.asarray(pairs.anchor_valid)
    assert av.sum() <= int(np.asarray(valid).sum()) // 3
    assert av.sum() > 0
    # valid anchors point at valid scene points
    ai = np.asarray(pairs.anchor_idx)[av]
    assert np.asarray(valid)[ai].all()


def test_grouped_residual_fragmented_and_exact_capacity(rng):
    """r4 review regressions: (a) a fragmented residual (many degree-1 rows
    -> more groups than edges/8) must stay EXACT via the provable-capacity
    tail, with n_dropped == 0 (no silent gather fallback); (b) a residual at
    EXACT edge capacity must not double-count the last edge (the clamp bug)."""
    import jax.numpy as jnp

    from geopurify_tpu.ops.pooling import (
        build_banded_operator,
        iterate_pooling,
        iterate_pooling_banded,
    )

    M, K = 512, 6
    # neighbors FAR from the diagonal for most rows -> out-of-band, and at
    # most one or two per row -> heavy group fragmentation
    nbr = np.tile(np.arange(M, dtype=np.int32)[:, None], (1, K))
    nbr[:, 0] = (np.arange(M) + M // 2) % M          # 1 far edge per row
    w = rng.uniform(0.01, 1.0, (M, K)).astype(np.float32)
    w /= w.sum(1, keepdims=True)
    feats = rng.normal(size=(M, 16)).astype(np.float32)

    ref = iterate_pooling(
        jnp.asarray(w), jnp.asarray(nbr), jnp.asarray(feats),
        num_iterations=3, row_tile=64, compute_dtype=jnp.float32,
    )
    # band 64 keeps the diagonal taps in-band; the far edges (1/row = 512
    # edges, 512 groups > 512//8 head groups) all ride the residual tail
    op = build_banded_operator(
        jnp.asarray(w), jnp.asarray(nbr), band=64, row_tile=64,
        max_residual=1024, assume_unique_neighbors=False,
        adaptive_starts=False,    # deterministic windows: diagonal in-band
    )
    assert int(op.n_dropped) == 0, "provable group capacity must not drop"
    n_grp = int((np.asarray(op.grp_row) < M).sum())
    assert n_grp > 1024 // 8, "test must actually exercise the headroom tail"
    out = iterate_pooling_banded(
        op, jnp.asarray(feats), num_iterations=3, band=64, row_tile=64,
    )
    # bf16 operator tolerance (matches test_banded_spmm_matches_gather)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.1, atol=0.05)
    # EXACTNESS pin at the structure level: reconstructing the grouped
    # residual in numpy must equal the true out-of-band edge application
    grow, gcol, gw = map(np.asarray, (op.grp_row, op.grp_col, op.grp_w))
    acc = np.zeros((M, feats.shape[1]), np.float32)
    for g in range(len(grow)):
        if grow[g] < M:
            acc[grow[g]] += (gw[g][:, None] * feats[gcol[g]]).sum(0)
    expected = np.zeros_like(acc)
    np.add.at(expected, np.arange(M), w[:, :1] * feats[nbr[:, 0]])
    np.testing.assert_allclose(acc, expected, rtol=1e-5, atol=1e-6)

    # (b) exact capacity with a partial final group: rows 0..9 carry the far
    # edges; max_residual == n_out exactly
    nbr2 = np.tile(np.arange(M, dtype=np.int32)[:, None], (1, K))
    for j in range(3):
        nbr2[:10, j] = (np.arange(10) + M // 2 + j * 7) % M
    w2 = rng.uniform(0.01, 1.0, (M, K)).astype(np.float32)
    w2 /= w2.sum(1, keepdims=True)
    ref2 = iterate_pooling(
        jnp.asarray(w2), jnp.asarray(nbr2), jnp.asarray(feats),
        num_iterations=2, row_tile=64, compute_dtype=jnp.float32,
    )
    op2 = build_banded_operator(
        jnp.asarray(w2), jnp.asarray(nbr2), band=64, row_tile=64,
        max_residual=30, assume_unique_neighbors=False,   # exactly 10*3 edges
        adaptive_starts=False,
    )
    assert int(op2.n_dropped) == 0
    out2 = iterate_pooling_banded(
        op2, jnp.asarray(feats), num_iterations=2, band=64, row_tile=64,
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=0.1, atol=0.05)
    # the clamp-bug pin, exact: each of the 30 edges applied exactly once
    grow, gcol, gw = map(np.asarray, (op2.grp_row, op2.grp_col, op2.grp_w))
    acc = np.zeros((M, feats.shape[1]), np.float32)
    for g in range(len(grow)):
        if grow[g] < M:
            acc[grow[g]] += (gw[g][:, None] * feats[gcol[g]]).sum(0)
    expected = np.zeros_like(acc)
    for j in range(3):
        expected[:10] += w2[:10, j:j+1] * feats[nbr2[:10, j]]
    np.testing.assert_allclose(acc, expected, rtol=1e-5, atol=1e-6)
