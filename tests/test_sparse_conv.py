"""Sparse conv vs dense-grid conv oracle; neighbor table; student forward."""

import jax
import jax.numpy as jnp
import numpy as np

from geopurify_tpu.models.student import AffinityPredictor, param_group_label
from geopurify_tpu.ops.sparse_conv import (
    build_neighbor_table,
    kernel_offsets_3d,
    masked_batch_stats,
    sparse_conv3,
)
from geopurify_tpu.ops.voxelize import voxelize_points


def _make_voxels(rng, n_pts=400, extent=6, max_voxels=256):
    coords = rng.integers(0, extent, size=(n_pts, 3)).astype(np.int32)
    valid = np.ones(n_pts, bool)
    dv = voxelize_points(jnp.asarray(coords), jnp.asarray(valid), max_voxels=max_voxels)
    assert int(dv.num_voxels) <= max_voxels
    return dv


def test_neighbor_table_matches_bruteforce(rng):
    dv = _make_voxels(rng)
    M = dv.voxel_coords.shape[0]
    nbr = np.asarray(build_neighbor_table(dv.voxel_coords, dv.voxel_valid))
    coords = np.asarray(dv.voxel_coords)
    valid = np.asarray(dv.voxel_valid)
    lut = {tuple(c): i for i, c in enumerate(coords[valid])}
    offsets = kernel_offsets_3d(3)
    for i in np.where(valid)[0][:64]:
        for k, off in enumerate(offsets):
            want = lut.get(tuple(coords[i] + off), M)
            assert nbr[i, k] == want, (i, k, off)
    # padded rows have no neighbors
    assert np.all(nbr[~valid] == M)


def test_neighbor_table_k5_matches_bruteforce(rng):
    """The z-chain construction (only dz==0 offsets searched; dz=+-1/+-2
    positions derived from the insertion point by monotonic key steps) must
    match brute force for the Sonata k5 stem's 125-offset table too."""
    dv = _make_voxels(rng)
    M = dv.voxel_coords.shape[0]
    nbr = np.asarray(
        build_neighbor_table(dv.voxel_coords, dv.voxel_valid, kernel_size=5)
    )
    coords = np.asarray(dv.voxel_coords)
    valid = np.asarray(dv.voxel_valid)
    lut = {tuple(c): i for i, c in enumerate(coords[valid])}
    offsets = kernel_offsets_3d(5)
    for i in np.where(valid)[0][:48]:
        for k, off in enumerate(offsets):
            want = lut.get(tuple(coords[i] + off), M)
            assert nbr[i, k] == want, (i, k, off)
    assert np.all(nbr[~valid] == M)


def test_sparse_conv_matches_dense_conv(rng):
    dv = _make_voxels(rng, extent=5, max_voxels=128)
    M = dv.voxel_coords.shape[0]
    coords = np.asarray(dv.voxel_coords)
    valid = np.asarray(dv.voxel_valid)
    Cin, Cout = 4, 6
    feats = rng.normal(size=(M, Cin)).astype(np.float32) * valid[:, None]
    w = rng.normal(size=(27, Cin, Cout)).astype(np.float32)

    nbr = build_neighbor_table(dv.voxel_coords, dv.voxel_valid)
    out = np.asarray(sparse_conv3(jnp.asarray(feats), nbr, jnp.asarray(w), dv.voxel_valid))

    # dense oracle: scatter into grid, correlate, sample back
    G = 8
    grid = np.zeros((G, G, G, Cin), np.float32)
    for i in np.where(valid)[0]:
        grid[tuple(coords[i])] += feats[i]
    offsets = kernel_offsets_3d(3)
    dense_out = np.zeros((G, G, G, Cout), np.float32)
    for k, (dx, dy, dz) in enumerate(offsets):
        shifted = np.zeros_like(grid)
        xs = slice(max(0, -dx), G - max(0, dx))
        xd = slice(max(0, dx), G - max(0, -dx))
        ys = slice(max(0, -dy), G - max(0, dy))
        yd = slice(max(0, dy), G - max(0, -dy))
        zs = slice(max(0, -dz), G - max(0, dz))
        zd = slice(max(0, dz), G - max(0, -dz))
        shifted[xs, ys, zs] = grid[xd, yd, zd]
        dense_out += shifted @ w[k]
    # mask contributions from non-voxel grid cells: every occupied cell IS a voxel,
    # and empty cells are zero, so direct comparison at voxel sites is exact.
    for i in np.where(valid)[0]:
        np.testing.assert_allclose(out[i], dense_out[tuple(coords[i])], rtol=1e-4, atol=1e-4)


def test_sparse_conv_custom_vjp_matches_autodiff(rng):
    """The gather-based backward (symmetric-stencil transpose, custom_vjp)
    must equal XLA's automatic scatter-add transpose of the raw tap conv."""
    from geopurify_tpu.ops.sparse_conv import _conv_taps

    dv = _make_voxels(rng, extent=5, max_voxels=128)
    M = dv.voxel_coords.shape[0]
    nbr = build_neighbor_table(dv.voxel_coords, dv.voxel_valid)
    valid = dv.voxel_valid
    Cin, Cout = 6, 5
    f = jnp.asarray(rng.normal(size=(M, Cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, Cin, Cout)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(M, Cout)).astype(np.float32))

    def with_vjp(f, w, b):
        return jnp.vdot(sparse_conv3(f, nbr, w, valid, bias=b), cot)

    def reference(f, w, b):  # raw taps: XLA autodiff (scatter-add transpose)
        f_pad = jnp.concatenate([f, jnp.zeros((1, Cin), f.dtype)])
        out = _conv_taps(f_pad, nbr, w) + b[None, :]
        out = jnp.where(valid[:, None], out, 0)
        return jnp.vdot(out, cot)

    g1 = jax.grad(with_vjp, argnums=(0, 1, 2))(f, w, b)
    g2 = jax.grad(reference, argnums=(0, 1, 2))(f, w, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-5)


def test_masked_batch_stats(rng):
    x = rng.normal(size=(100, 8)).astype(np.float32)
    valid = np.zeros(100, bool)
    valid[:60] = True
    mean, var = masked_batch_stats(jnp.asarray(x), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(mean), x[:60].mean(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), x[:60].var(0), atol=1e-5)


def test_student_forward_shapes_and_masking(rng):
    dv = _make_voxels(rng, n_pts=300, extent=5, max_voxels=128)
    M = dv.voxel_coords.shape[0]
    feats = jnp.asarray(rng.normal(size=(M, 24)).astype(np.float32))
    nbr = build_neighbor_table(dv.voxel_coords, dv.voxel_valid)
    model = AffinityPredictor(input_dim=24, hidden_dim=32, embed_dim=16, num_res_blocks=2)
    variables = model.init(jax.random.key(0), feats, nbr, dv.voxel_valid, train=False)
    out, updates = model.apply(
        variables, feats, nbr, dv.voxel_valid, train=True, mutable=["batch_stats"]
    )
    assert out.shape == (M, 16)
    valid = np.asarray(dv.voxel_valid)
    np.testing.assert_allclose(np.asarray(out)[~valid], 0)
    assert np.abs(np.asarray(out)[valid]).sum() > 0
    # running stats moved away from init
    bs = updates["batch_stats"]
    assert float(jnp.abs(bs["input_norm"]["mean"]).sum()) > 0

    # eval mode uses running stats deterministically
    v2 = {"params": variables["params"], "batch_stats": bs}
    out_eval = model.apply(v2, feats, nbr, dv.voxel_valid, train=False)
    out_eval2 = model.apply(v2, feats, nbr, dv.voxel_valid, train=False)
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_eval2))


def test_param_group_labels():
    model = AffinityPredictor(input_dim=8, hidden_dim=8, embed_dim=4, num_res_blocks=1)
    rngk = jax.random.key(0)
    feats = jnp.zeros((16, 8))
    nbr = jnp.full((16, 27), 16, jnp.int32)
    valid = jnp.ones(16, bool)
    variables = model.init(rngk, feats, nbr, valid, train=False)
    labels = {
        path: param_group_label(path)
        for path, _ in jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    }
    got = set()
    for path, lab in labels.items():
        name = path[0].key
        if name.startswith("input"):
            assert lab == "input"
        elif name.startswith("output"):
            assert lab == "output"
        else:
            assert lab == "middle"
        got.add(lab)
    assert got == {"input", "middle", "output"}


def test_student_bf16_compute_affinity_bound(rng):
    """bf16 student inference vs f32: the downstream sharpened-softmax
    affinity weights (the embeddings' only consumer) stay within ~2%
    relative — the parity budget for enabling student.compute_dtype=bfloat16
    on the eval path."""
    import jax

    from geopurify_tpu.models.student import AffinityPredictor
    from geopurify_tpu.ops.sparse_conv import build_neighbor_table

    M, C = 512, 22
    coords = np.unique(rng.integers(0, 12, (2 * M, 3)), axis=0)
    coords = coords[np.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))][:M]
    M = coords.shape[0]
    valid = jnp.ones((M,), bool)
    feats = jnp.asarray(rng.normal(0, 1, (M, C)).astype(np.float32))
    nbr = build_neighbor_table(jnp.asarray(coords, jnp.int32), valid)

    kw = dict(input_dim=C, hidden_dim=32, embed_dim=16, num_res_blocks=2)
    f32 = AffinityPredictor(**kw)
    bf16 = AffinityPredictor(**kw, compute_dtype="bfloat16")
    vars_ = f32.init(jax.random.key(0), feats, nbr, valid, train=False)
    e32 = np.asarray(f32.apply(vars_, feats, nbr, valid, train=False))
    e16 = np.asarray(bf16.apply(vars_, feats, nbr, valid, train=False),
                     np.float32)
    assert e16.dtype == np.float32

    def weights(e):
        e = e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
        aff = e @ e.T
        z = 20.0 * aff
        z = z - z.max(1, keepdims=True)
        w = np.exp(z)
        return w / w.sum(1, keepdims=True)

    w32, w16 = weights(e32), weights(e16.astype(np.float64))
    rel = np.abs(w32 - w16).max() / np.abs(w32).max()
    assert rel < 0.05, f"affinity weight drift {rel:.3f}"


def test_zstack_conv_matches_tap_scan(rng):
    """The z-stacked fast path (ZStackTable) must equal the tap-scan conv on
    scenes WITH z-holes (middle voxel absent, z+-1 present — the residual
    path) — sparse random occupancy produces plenty of them."""
    from geopurify_tpu.ops.sparse_conv import build_zstack_table

    dv = _make_voxels(rng, n_pts=700, extent=7, max_voxels=512)
    M = dv.voxel_coords.shape[0]
    nbr = build_neighbor_table(dv.voxel_coords, dv.voxel_valid)
    zt = build_zstack_table(dv.voxel_coords, dv.voxel_valid, nbr,
                            res_budget=256)
    assert not bool(zt.overflow)
    assert int(jnp.sum(zt.res_cnt)) > 0, "scene has no z-holes; weak test"

    Cin, Cout = 12, 10
    f = jnp.asarray(rng.normal(size=(M, Cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, Cin, Cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32))

    ref = sparse_conv3(f, nbr, w, dv.voxel_valid, bias=b)
    got = sparse_conv3(f, zt, w, dv.voxel_valid, bias=b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_zstack_overflow_falls_back_exactly(rng):
    """A residual budget of 0 forces overflow; the runtime cond must route to
    the tap-scan conv and stay exact."""
    from geopurify_tpu.ops.sparse_conv import build_zstack_table

    dv = _make_voxels(rng, n_pts=700, extent=7, max_voxels=512)
    M = dv.voxel_coords.shape[0]
    nbr = build_neighbor_table(dv.voxel_coords, dv.voxel_valid)
    zt = build_zstack_table(dv.voxel_coords, dv.voxel_valid, nbr, res_budget=1)
    assert bool(zt.overflow)

    Cin, Cout = 8, 6
    f = jnp.asarray(rng.normal(size=(M, Cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, Cin, Cout)).astype(np.float32) * 0.1)
    ref = sparse_conv3(f, nbr, w, dv.voxel_valid)
    got = sparse_conv3(f, zt, w, dv.voxel_valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_student_forward_zstack_matches_table(rng):
    """AffinityPredictor with a ZStackTable neighbor arg equals the plain
    table forward (the pipeline's M-gated dispatch must be a no-op
    semantically)."""
    from geopurify_tpu.ops.sparse_conv import build_zstack_table

    dv = _make_voxels(rng, n_pts=500, extent=6, max_voxels=256)
    M = dv.voxel_coords.shape[0]
    nbr = build_neighbor_table(dv.voxel_coords, dv.voxel_valid)
    zt = build_zstack_table(dv.voxel_coords, dv.voxel_valid, nbr,
                            res_budget=256)
    model = AffinityPredictor(input_dim=14, hidden_dim=16, embed_dim=8,
                              num_res_blocks=2)
    f = jnp.asarray(rng.normal(size=(M, 14)).astype(np.float32))
    variables = model.init(jax.random.key(0), f, nbr, dv.voxel_valid,
                           train=False)
    ref = model.apply(variables, f, nbr, dv.voxel_valid, train=False)
    got = model.apply(variables, f, zt, dv.voxel_valid, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
