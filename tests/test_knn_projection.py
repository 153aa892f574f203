"""kNN search vs scipy oracle; projection vs reference-mapper numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from geopurify_tpu.ops.knn import knn_search, nearest_fill
from geopurify_tpu.ops.projection import compute_point_image_mapping
from geopurify_tpu.ops.segment import segment_mean, segment_sum


def _brute_knn(q, db, k, exclude_self_ids=None):
    d2 = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    if exclude_self_ids is not None:
        d2[np.arange(len(q)), exclude_self_ids] = np.inf
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d2, idx, axis=1), idx


def test_knn_exact_small(rng):
    db = rng.uniform(size=(300, 3)).astype(np.float32)
    q = db[:50]
    d, i = knn_search(jnp.asarray(q), jnp.asarray(db), jnp.ones(300, bool), k=5,
                      query_tile=64, db_chunk=128)
    od, oi = _brute_knn(q, db, 5)
    np.testing.assert_allclose(np.asarray(d), od, atol=1e-4)
    # indices may differ on exact ties; distances must agree
    gathered = ((q[:, None, :] - db[np.asarray(i)]) ** 2).sum(-1)
    np.testing.assert_allclose(gathered, od, atol=1e-4)


def test_knn_excludes_self(rng):
    db = rng.uniform(size=(200, 3)).astype(np.float32)
    ids = jnp.arange(200, dtype=jnp.int32)
    d, i = knn_search(
        jnp.asarray(db), jnp.asarray(db), jnp.ones(200, bool), k=4,
        query_ids=ids, exclude_identical_index=True, query_tile=64, db_chunk=64,
    )
    assert not np.any(np.asarray(i) == np.arange(200)[:, None])
    assert np.all(np.asarray(d) > 0)


def test_knn_respects_db_validity(rng):
    db = rng.uniform(size=(100, 3)).astype(np.float32)
    valid = np.ones(100, bool)
    valid[50:] = False
    _, i = knn_search(jnp.asarray(db[:10]), jnp.asarray(db), jnp.asarray(valid), k=3,
                      query_tile=16, db_chunk=32)
    assert np.asarray(i).max() < 50


def _grid_scene(rng, kind, n=900):
    """Integer voxel scenes: 'surface' = dense walls/floor (certificate
    passes), 'sparse' = uniform scatter (forces the full-row fallback)."""
    if kind == "surface":
        m = n // 3
        w1 = np.stack([np.zeros(m), rng.integers(0, 30, m), rng.integers(0, 15, m)], 1)
        w2 = np.stack([rng.integers(0, 30, m), np.zeros(m), rng.integers(0, 15, m)], 1)
        fl = np.stack([rng.integers(0, 30, m), rng.integers(0, 30, m), np.zeros(m)], 1)
        c = np.concatenate([w1, w2, fl])
    else:
        c = rng.integers(0, 400, (n, 3))
    c = np.unique(c.astype(np.int32), axis=0)
    order = np.lexsort((c[:, 2], c[:, 1], c[:, 0]))
    return c[order]


@pytest.mark.parametrize("kind", ["surface", "sparse"])
@pytest.mark.parametrize("blk", [1, 8])
def test_knn_self_grid_matches_full(rng, kind, blk):
    """Morton-tiled bbox kNN == brute force up to equal-distance ties, on
    both the certificate-pass path and the fallback path, with per-element
    (blk=1) and block (blk=8) candidate compaction. The block path needs
    M % 8 == 0, so the scene is padded to a multiple of 8 under the valid
    mask (partially-full blocks can only fail certificates, never corrupt)."""
    from geopurify_tpu.ops.knn import knn_self_grid

    c = _grid_scene(rng, kind)
    M = len(c)
    pad = (-M) % 8
    cp = np.concatenate([c, np.zeros((pad, 3), c.dtype)])
    valid = np.zeros(M + pad, bool)
    valid[:M] = True
    k = 12
    d, i = knn_self_grid(
        jnp.asarray(cp), jnp.asarray(valid), k=k,
        radius=6, num_candidates=512, query_tile=128, compact_block=blk,
    )
    od, _ = _brute_knn(c.astype(np.float64), c.astype(np.float64), k,
                       exclude_self_ids=np.arange(M))
    d, i = np.asarray(d)[:M], np.asarray(i)[:M]
    np.testing.assert_allclose(d, od, atol=1e-3)
    # returned indices actually realize those distances and exclude self
    gathered = ((c[:, None, :] - c[i]) ** 2).sum(-1)
    np.testing.assert_allclose(gathered, od, atol=1e-3)
    assert not np.any(i == np.arange(M)[:, None])
    assert i.max() < M  # never padding


def test_nearest_fill_grid_matches_exact(rng):
    """Grid-pruned donor fill == brute-force nearest_fill up to donor ties:
    with features := coords, the donated feature IS the donor position, so
    donor-distance equality is directly checkable on the output."""
    from geopurify_tpu.ops.knn import nearest_fill, nearest_fill_grid

    N = 3000
    pts = rng.uniform(0, 8, (N, 3)).astype(np.float32)
    valid = np.ones(N, bool)
    valid[-150:] = False
    for cover in (0.6, 0.01):  # dense donors (certificate) / sparse (fallback)
        has = (rng.uniform(size=N) < cover) & valid
        has[np.flatnonzero(valid)[0]] = True  # at least one donor
        a = nearest_fill(jnp.asarray(pts), jnp.asarray(pts),
                         jnp.asarray(has), jnp.asarray(valid))
        b = nearest_fill_grid(jnp.asarray(pts), jnp.asarray(pts),
                              jnp.asarray(has), jnp.asarray(valid))
        da = np.linalg.norm(np.asarray(a) - pts, axis=1)
        db = np.linalg.norm(np.asarray(b) - pts, axis=1)
        np.testing.assert_allclose(db[valid], da[valid], atol=1e-3)
        # covered rows must be untouched
        np.testing.assert_array_equal(np.asarray(b)[has], pts[has])


def test_nearest_fill_grid_all_covered_noop(rng):
    from geopurify_tpu.ops.knn import nearest_fill_grid

    pts = rng.uniform(0, 4, (500, 3)).astype(np.float32)
    out = nearest_fill_grid(jnp.asarray(pts), jnp.asarray(pts),
                            jnp.ones(500, bool), jnp.ones(500, bool))
    np.testing.assert_array_equal(np.asarray(out), pts)


def test_selector_approx_is_distance_exact(rng):
    """approx_min_k at recall_target=1.0 (the default kNN selector) must
    match the sort-based selector's DISTANCES exactly on a tie-heavy integer
    grid — index sets may legally differ on equal-distance ties, but every
    returned index must realize its reported distance. (The r1 approx_min_k
    'recall 0.82' dead end was index-recall at recall_target=0.95.)"""
    from geopurify_tpu.ops.knn import _chunked_topk_min

    c = rng.integers(0, 6, (512, 3)).astype(np.float32)  # dense duplicates
    d2 = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    k = 16
    da, ia = _chunked_topk_min(jnp.asarray(d2), k, selector="approx")
    dt, _ = _chunked_topk_min(jnp.asarray(d2), k, selector="topk")
    np.testing.assert_array_equal(np.asarray(da), np.asarray(dt))
    g = np.take_along_axis(d2, np.asarray(ia), axis=1)
    np.testing.assert_array_equal(g, np.asarray(da))


def test_knn_self_grid_padding_and_small_scene(rng):
    from geopurify_tpu.ops.knn import knn_self_grid

    c = _grid_scene(rng, "surface", n=120)
    M = len(c)
    pad = 37
    cp = np.concatenate([c, np.zeros((pad, 3), np.int32)])
    valid = np.zeros(M + pad, bool)
    valid[:M] = True
    k = 8
    d, i = knn_self_grid(jnp.asarray(cp), jnp.asarray(valid), k=k,
                         radius=4, num_candidates=256, query_tile=64)
    od, _ = _brute_knn(c.astype(np.float64), c.astype(np.float64), k,
                       exclude_self_ids=np.arange(M))
    np.testing.assert_allclose(np.asarray(d)[:M], od, atol=1e-3)
    # neighbors never point at padding
    assert np.asarray(i)[:M].max() < M


def test_argmin_search_oracle(rng):
    from geopurify_tpu.ops.knn import argmin_search

    q = rng.uniform(size=(70, 3)).astype(np.float32)
    db = rng.uniform(size=(200, 3)).astype(np.float32)
    valid = np.ones(200, bool)
    valid[150:] = False
    idx = np.asarray(argmin_search(jnp.asarray(q), jnp.asarray(db),
                                   jnp.asarray(valid), query_tile=32, db_chunk=64))
    d2 = ((q[:, None] - db[None]) ** 2).sum(-1)
    d2[:, ~valid] = np.inf
    want = d2.argmin(1)
    # ties: compare distances, not indices
    np.testing.assert_allclose(
        d2[np.arange(70), idx], d2[np.arange(70), want], atol=1e-5
    )
    assert idx.max() < 150


def test_nearest_fill(rng):
    coords = rng.uniform(size=(64, 3)).astype(np.float32)
    feats = rng.uniform(size=(64, 8)).astype(np.float32)
    has = np.ones(64, bool)
    has[10:20] = False
    feats_in = feats.copy()
    feats_in[~has] = 0
    out = nearest_fill(jnp.asarray(feats_in), jnp.asarray(coords),
                       jnp.asarray(has), jnp.ones(64, bool),
                       query_tile=16, db_chunk=32)
    out = np.asarray(out)
    np.testing.assert_allclose(out[has], feats[has])
    # filled rows copy their nearest valid donor
    from scipy.spatial import cKDTree
    tree = cKDTree(coords[has])
    _, nn = tree.query(coords[~has], k=1)
    np.testing.assert_allclose(out[~has], feats[has][nn], atol=1e-6)


def _ref_mapping(world_to_camera, coords, depth, intrinsic, image_dim, cut_bound, vis_thres):
    """Numpy oracle transliterating fusion_util.py:99-147 semantics."""
    n = coords.shape[0]
    homo = np.concatenate([coords, np.ones((n, 1))], 1).T
    p = world_to_camera @ homo
    pi = np.round(np.stack([
        p[0] * intrinsic[0, 0] / p[2] + intrinsic[0, 2],
        p[1] * intrinsic[1, 1] / p[2] + intrinsic[1, 2],
    ])).astype(int)
    inside = ((pi[0] >= cut_bound) & (pi[1] >= cut_bound)
              & (pi[0] < image_dim[0] - cut_bound) & (pi[1] < image_dim[1] - cut_bound))
    mapping = np.zeros((3, n), int)
    d_cur = depth[np.clip(pi[1], 0, image_dim[1]-1), np.clip(pi[0], 0, image_dim[0]-1)]
    occl = (np.abs(d_cur - p[2]) <= vis_thres * d_cur) & (d_cur > 0)
    visible = inside & occl
    mapping[0][visible] = pi[1][visible]
    mapping[1][visible] = pi[0][visible]
    mapping[2][visible] = 1
    return mapping.T


def test_projection_matches_reference_oracle(rng):
    W, H = 64, 48
    pts = rng.uniform(-1, 1, size=(500, 3))
    pts[:, 2] += 3.0
    w2c = np.eye(4)
    K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]])
    depth = np.full((H, W), 3.0)
    ref = _ref_mapping(w2c, pts, depth, K, (W, H), cut_bound=2, vis_thres=0.05)
    out = compute_point_image_mapping(
        jnp.asarray(pts, jnp.float32), jnp.ones(500, bool),
        jnp.asarray(w2c, jnp.float32), jnp.asarray(K, jnp.float32),
        jnp.asarray(depth, jnp.float32), (W, H), cut_bound=2, vis_thres=0.05,
    )
    np.testing.assert_array_equal(np.asarray(out.visible), ref[:, 2].astype(bool))
    vis = ref[:, 2].astype(bool)
    np.testing.assert_array_equal(np.asarray(out.rows)[vis], ref[vis, 0])
    np.testing.assert_array_equal(np.asarray(out.cols)[vis], ref[vis, 1])


def test_segment_mean_drops_out_of_range(rng):
    data = rng.uniform(size=(20, 4)).astype(np.float32)
    ids = np.array([0] * 10 + [1] * 5 + [7] * 5)  # 7 == num_segments -> dropped
    m = segment_mean(jnp.asarray(data), jnp.asarray(ids), num_segments=7)
    np.testing.assert_allclose(np.asarray(m)[0], data[:10].mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m)[1], data[10:15].mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m)[2:], 0)
    s = segment_sum(jnp.asarray(data), jnp.asarray(ids), num_segments=7)
    np.testing.assert_allclose(np.asarray(s)[0], data[:10].sum(0), rtol=1e-5)


def test_segment_sum_sorted_hint_matches(rng):
    """The runtime-gated sorted fast path (ops/segment.segment_sum
    sorted_hint='auto') must be value-identical to the plain scatter on
    BOTH sorted and shuffled ids, above and below the size gate."""
    for n in (1000, 8192):
        data = rng.uniform(size=(n, 8)).astype(np.float32)
        ids_sorted = np.sort(rng.integers(0, 64, n)).astype(np.int32)
        ids_shuffled = rng.permutation(ids_sorted)
        for ids in (ids_sorted, ids_shuffled):
            ref = segment_sum(jnp.asarray(data), jnp.asarray(ids), 64,
                              sorted_hint="never")
            out = segment_sum(jnp.asarray(data), jnp.asarray(ids), 64,
                              sorted_hint="auto")
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-6, atol=1e-6)


def test_knn_tie_breaking_id_exact(rng):
    """On tie-heavy integer grids, knn_self_grid and knn_search(selector=
    'topk') must return the LEXICOGRAPHIC (d2, id) neighbor order — the
    faiss-stable-argsort tie semantics the composed Stage-2 oracle pins
    against. (The default 'approx' selector is distance-exact but not
    id-exact at ties — documented in knn_search.)"""
    import jax.numpy as jnp

    from geopurify_tpu.ops.knn import knn_search, knn_self_grid

    vox = np.unique(rng.integers(0, 10, (1500, 3)), axis=0).astype(np.int32)
    M = len(vox)
    cf = vox.astype(np.float32)
    k = 16
    d2 = ((cf[:, None] - cf[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    oracle = np.argsort(d2, axis=1, kind="stable")[:, :k]

    _, idx_g = knn_self_grid(jnp.asarray(vox), jnp.ones(M, bool), k=k)
    np.testing.assert_array_equal(np.asarray(idx_g), oracle)

    ids = jnp.arange(M, dtype=jnp.int32)
    _, idx_f = knn_search(
        jnp.asarray(cf), jnp.asarray(cf), jnp.ones(M, bool), k,
        query_ids=ids, exclude_identical_index=True, selector="topk",
    )
    np.testing.assert_array_equal(np.asarray(idx_f), oracle)


def test_knn_anchors_grid_matches_brute():
    """Anchors-only float-coords grid kNN (ops/knn.knn_anchors_grid, the
    Stage-1 sampler's spatial kNN) equals the chunked brute exactly —
    jittered float coords make ties measure-zero, so neighbor SETS must
    coincide. A deliberately tiny radius routes most queries through the
    certificate fallback and must stay exact."""
    import jax.numpy as jnp

    from geopurify_tpu.ops.knn import knn_anchors_grid, knn_search

    rng = np.random.default_rng(3)
    N, A, k = 12000, 384, 24
    vox = rng.integers(0, 50, (N, 3))
    pts = (vox * 0.02 + rng.uniform(0, 0.02, (N, 3))).astype(np.float32)
    valid = np.ones(N, bool)
    valid[-40:] = False
    aidx = rng.choice(N - 40, A, replace=False).astype(np.int32)
    d_ref, i_ref = knn_search(
        jnp.asarray(pts)[aidx], jnp.asarray(pts), jnp.asarray(valid), k=k,
        query_ids=jnp.asarray(aidx), exclude_identical_index=True)
    d_ref, i_ref = np.asarray(d_ref), np.asarray(i_ref)
    for radius in (0.25, 0.05):          # 0.05 fails most certificates
        d, i = knn_anchors_grid(
            jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(aidx), k=k,
            radius=radius)
        d, i = np.asarray(d), np.asarray(i)
        np.testing.assert_allclose(np.sort(d, 1), np.sort(d_ref, 1),
                                   atol=1e-5)
        assert all(set(i[r]) == set(i_ref[r]) for r in range(A)), radius


def test_sampler_grid_matches_brute():
    """The hybrid sampler produces IDENTICAL pairs under
    spatial_method='grid' and 'brute' (the micro negatives are selected
    from the same exact kNN sets)."""
    import jax
    import jax.numpy as jnp

    from geopurify_tpu.ops.contrastive import sample_contrastive_pairs_hybrid

    rng = np.random.default_rng(5)
    N = 6000
    vox = rng.integers(0, 40, (N, 3))
    pts = (vox * 0.02 + rng.uniform(0, 0.02, (N, 3))).astype(np.float32)
    feats = rng.normal(0, 1, (N, 32)).astype(np.float32)
    valid = np.ones(N, bool)
    valid[-30:] = False
    out = {}
    for method in ("grid", "brute"):
        out[method] = sample_contrastive_pairs_hybrid(
            jax.random.key(0), jnp.asarray(feats), jnp.asarray(valid),
            coords=jnp.asarray(pts), num_anchors=256, num_macro=12,
            num_micro=6, spatial_k=16, spatial_method=method,
            spatial_radius=0.3)
    g, b = out["grid"], out["brute"]
    assert np.array_equal(np.asarray(g.anchor_idx), np.asarray(b.anchor_idx))
    assert np.array_equal(np.asarray(g.positive_idx), np.asarray(b.positive_idx))
    # micro negatives ride the kNN sets; identical sets -> identical picks
    assert np.array_equal(np.asarray(g.negative_idx), np.asarray(b.negative_idx))
