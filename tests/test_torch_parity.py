"""Torch-oracle activation parity: reference code (mounted, seeded random
weights) vs the flax rebuild through convert_xdecoder — VERDICT r2 item #1.

These tests settle the numerical-parity guesses (bicubic a=-0.5 vs torch,
antialias kernels, /32 padding, attn-mask thresholds, converter layouts)
without the unfetchable released checkpoints. Small configs keep them CPU-fast;
`geopurify-parity --torch-oracle full` runs the production-size variant.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from geopurify_tpu.parity import compare  # noqa: E402

TOL = 1e-4


def _check(rows):
    for name, (mx, rel) in rows.items():
        assert rel < TOL, f"{name}: rel={rel:.3e} max|d|={mx:.3e}"


def test_parity_pad_and_resize():
    _check(compare.parity_pad())
    _check(compare.parity_resize())


def test_parity_lang():
    _check(compare.parity_lang())


def test_parity_focalnet():
    _check(compare.parity_focalnet())


def test_parity_focalnet_dw():
    """focal_dw (SEEM-release FocalNet, vision/backbone/focal_dw.py): dw
    residual convs, post-residual norm1 under postLN, norm2 over the whole
    FFN residual, non-overlapping patch embeds with pre-norm — both postLN
    settings."""
    _check(compare.parity_focalnet_dw(use_postln=True))
    _check(compare.parity_focalnet_dw(use_postln=False))


def test_parity_pixel_decoder():
    _check(compare.parity_pixel_decoder())


def test_parity_head():
    _check(compare.parity_head())


def test_parity_lift():
    _check(compare.parity_lift())


def test_parity_davit():
    """DaViT vs the reference at release-config geometry; caught the 2x2
    inter-stage embeds / post-norm placement / phantom output norms in the
    r2 rebuild (models/davit.py docstring)."""
    _check(compare.parity_davit())


def test_parity_vit():
    """ViTDet/SAM backbone + SimpleFPN vs the reference; caught the scaled-q
    rel-pos bias, LN eps 1e-5 vs D2ViT's 1e-6, and the torch ConvTranspose
    kernel flip (convert_xdecoder._convt)."""
    _check(compare.parity_vit())


def test_parity_deform_pixel_decoder():
    """Deformable pixel decoder assembly vs the reference (CPU MSDeformAttn
    fallback); caught level_embed riding src instead of the positional
    stream, nearest-vs-bilinear FPN merge, 3x3-vs-1x1 mask conv, and the
    missing input_proj conv bias."""
    _check(compare.parity_deform_pixel_decoder())


def test_parity_matcher_costs():
    """Our Hungarian cost pieces == the reference's batch_dice_loss /
    batch_sigmoid_ce_loss (matcher.py:23-77) on identical logits/targets
    (point sampling bypassed — the costs themselves are deterministic)."""
    import jax.numpy as jnp

    from geopurify_tpu.parity.shims import add_reference_to_path, install

    install()
    add_reference_to_path()
    import torch

    from xdecoder.modeling.modules.matcher import (
        batch_dice_loss, batch_sigmoid_ce_loss,
    )

    rng = np.random.default_rng(0)
    Q, T, P = 7, 5, 64
    pm = rng.normal(0, 3, (Q, P)).astype(np.float32)
    gm = (rng.uniform(size=(T, P)) < 0.4).astype(np.float32)
    with torch.no_grad():
        ref_d = batch_dice_loss(torch.from_numpy(pm), torch.from_numpy(gm)).numpy()
        ref_m = batch_sigmoid_ce_loss(torch.from_numpy(pm), torch.from_numpy(gm)).numpy()

    # the cost blocks inside set_criterion (models/criterion.py:110-121),
    # batch dim added
    import jax

    pmj = jnp.asarray(pm)[None]
    gmj = jnp.asarray(gm)[None]
    sp = jax.nn.sigmoid(pmj)
    num = 2 * jnp.einsum("bqp,btp->bqt", sp, gmj)
    den = sp.sum(-1)[:, :, None] + gmj.sum(-1)[:, None, :]
    cost_d = 1 - (num + 1) / (den + 1)
    pos = jnp.log1p(jnp.exp(-jnp.abs(pmj))) + jnp.maximum(-pmj, 0)
    neg = jnp.log1p(jnp.exp(-jnp.abs(pmj))) + jnp.maximum(pmj, 0)
    cost_m = (
        jnp.einsum("bqp,btp->bqt", pos, gmj)
        + jnp.einsum("bqp,btp->bqt", neg, 1 - gmj)
    ) / P
    np.testing.assert_allclose(np.asarray(cost_d)[0], ref_d, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cost_m)[0], ref_m, rtol=1e-5, atol=1e-6)


def test_parity_seem():
    """Faithful SEEM v0 decoder vs the reference (spatial pos/neg prompts +
    grounding tokens + prev-mask memory, deterministic small prompt masks);
    the diff drove the faithful rewrite: duplicated query groups, memories,
    token-valued positional embeddings, and the non-antialiased bilinear
    attn-mask resize (resize_bilinear_torch)."""
    _check(compare.parity_seem())


def test_parity_head_vlp():
    """VLP caption path: caption slots under the structured causal mask,
    caption-slot states @ caping_embed, class_embed incl. the cls row —
    pinned against the reference task='vlp' forward (train-gated but
    dropout-0 deterministic)."""
    _check(compare.parity_head_vlp())


def test_parity_relpos_interpolation():
    """_rel_pos_bias table resize == torch get_rel_pos F.interpolate(linear,
    antialias=False) when the pretrain table length differs from the runtime
    grid's 2*size-1 — the branch the small-config vit parity never hits."""
    import jax.numpy as jnp
    import torch.nn.functional as F

    from geopurify_tpu.models.vit_backbone import _rel_pos_bias

    rng = np.random.default_rng(0)
    for L, q in ((127, 31), (7, 9)):          # down- and up-scale
        table = rng.normal(0, 1, (L, 6)).astype(np.float32)
        need = 2 * q - 1
        ref = F.interpolate(
            torch.from_numpy(table).reshape(1, L, -1).permute(0, 2, 1),
            size=need, mode="linear",
        ).reshape(-1, need).permute(1, 0).numpy()
        coords = np.arange(q)[:, None] - np.arange(q)[None, :] + (q - 1)
        ours = np.asarray(_rel_pos_bias(jnp.asarray(table), q, q))
        np.testing.assert_allclose(ours, ref[coords], rtol=1e-5, atol=1e-6)


def test_parity_seem_v1():
    """Faithful SEEM v1 decoder vs the reference with multi-mask prompts,
    grounding, and prev-mask memory. The forward's internal torch RNG draws
    (queries_spatial randint, per-layer memory multinomial) are recorded by
    the oracle and replayed as explicit inputs. The diff caught the
    channel-last reshape scramble in the memory-mask resize and the
    per-layer channel-matched q_spa<->memory self-attention."""
    _check(compare.parity_seem_v1())


def test_parity_stage2_end_to_end():
    """COMPOSED Stage-2 chain vs the reference (VERDICT r3 item #1): the
    reference's evaluate_scene (lift -> scatter_mean 512||6 -> ME student ->
    faiss kNN-96 -> sharpen-20 softmax -> 19 sparse-mm rounds -> de-voxelize)
    + validate()'s prediction/metric block, run on torch-cpu under RUNNABLE
    shims (faiss = exact numpy L2, torch_scatter = exact segment mean,
    MinkowskiEngine = literal hash-map sparse conv), vs our full pipeline on
    identical teacher outputs and converted student weights.

    Tolerance structure (measured decomposition in parity/compare.py): every
    PRE-amplification stage pins tight — voxel features rel < 1e-6, student
    embeds rel < 1e-5, kNN-96 neighbor SETS exact (integer-grid ties break
    by smallest id on both sides), affinity weights < 1e-5 — while the final
    features carry the sharpen-x20 softmax's amplification of honest
    cross-implementation fp32 rounding (weights ~3e-6 abs -> 19 rounds ->
    ~4e-4 abs, rel ~1e-2 against the smoothing-contracted scale), so they
    pin at the MUTATION-CALIBRATED band rel < 2e-2 plus abs < 8e-4
    (scripts/mutation_check_stage2.py: honest noise measures rel ~1.2e-2 /
    abs ~5e-4; the 19->17-round and sharpen 20->19 mutants measure rel
    >= 3.3e-2 / abs >= 1.28e-3 — the band separates them; the looser
    rel 5e-2 / abs 2e-3 pair this test originally shipped with let both
    mutants pass). Semantics pin exactly: argmax
    predictions identical (both smoothing spaces + the reference fp32 run
    vs the fp64 ground-truth tail) wherever the fp64 logit margin clears 4x
    the measured fp32 noise, and I/U/T histograms equal up to the
    sub-noise-margin rows."""
    rows = compare.parity_stage2()
    for name, tol in (("stage2/voxel_in", 1e-6), ("stage2/embed", 1e-5),
                      ("stage2/affinity_w", 1e-5)):
        mx, rel = rows[name]
        assert rel < tol, f"{name}: rel={rel:.3e} max|d|={mx:.3e}"
    assert rows["stage2/knn_sets"] == (0.0, 0.0), \
        f"kNN neighbor sets differ on {rows['stage2/knn_sets'][0]} rows"
    mx, rel = rows["stage2/features"]
    assert rel < 2e-2 and mx < 8e-4, f"stage2/features: rel={rel:.3e} abs={mx:.3e}"
    n_tie, frac_conf = rows["stage2/pred_agree"]
    assert frac_conf == 0.0, f"confident-margin prediction disagreements: {frac_conf}"
    for name in ("stage2/hist_I", "stage2/hist_U", "stage2/hist_T"):
        mx, _ = rows[name]
        assert mx <= n_tie, f"{name}: max|d|={mx} vs {n_tie} sub-margin rows"


def test_parity_stage2_mutation_sensitivity():
    """CI-runnable mutation check (VERDICT r4 weak #1): run the two
    documented contract mutants — 19->17 smoothing rounds
    (affinity_module.py:1586-1587's hard-coded 19) and sharpen 20->19
    (affinity_module.py:1569's x20) — through OUR pipeline against the
    CACHED oracle scene and assert the feature-parity row lands OUTSIDE the
    calibrated thresholds. This is what proves the tolerances in
    test_parity_stage2_end_to_end actually gate the 19x/x20 contract;
    scripts/mutation_check_stage2.py remains the calibration record.
    Cost: one extra feature-path pipeline eval per mutant, no oracle rerun."""
    for mutate in ({"num_iterations": 17}, {"sharpen": 19.0}):
        rows = compare.parity_stage2(mutate=mutate, features_only=True)
        mx, rel = rows["stage2/features"]
        assert rel >= 2e-2 or mx >= 8e-4, (
            f"mutant {mutate} INSIDE the calibrated band "
            f"(rel={rel:.3e} abs={mx:.3e}) — thresholds are mutant-blind"
        )


def test_parity_seem_demo():
    """SEEM demo variant (VERDICT r3 item #8): one cross-attending object
    query group composing stroke + text grounding + audio + reference-image
    visual prompts; refimg bundle and all demo outputs pinned."""
    _check(compare.parity_seem_demo())


@pytest.mark.skipif(
    os.environ.get("GEOPURIFY_FULLSIZE") != "1",
    reason="full-size head study (~8 min CPU); set GEOPURIFY_FULLSIZE=1",
)
def test_parity_head_fullsize():
    """Full-size (121x162 stride-4, 201 queries, 512-d, 9 rounds) head parity
    bounded despite the 0.5-threshold amplifier (VERDICT r3 item #5): round-0
    pre-threshold masks pin tight; attn-mask flips are rare (<1e-3) and
    threshold-marginal (p99 |sigmoid-0.5| < 0.1); with both implementations
    FORCED onto the reference's binarized masks the final outputs pin at
    rel < 2e-4 even at full size. Measured 2026-08-20: round0 rel 7.8e-7,
    flip_frac 4.0e-4, flip margin p99 0.048, forced finals rel <= 8.9e-5."""
    rows = compare.parity_head_fullsize()
    mx, rel = rows["head_full/round0_masks"]
    assert rel < 1e-5, f"round0: rel={rel:.3e}"
    _, frac = rows["head_full/flip_frac"]
    assert frac < 1e-3, f"attn-mask flip fraction {frac:.2e}"
    _, p99 = rows["head_full/flip_margin"]
    assert p99 < 0.1, f"flip margin p99 {p99:.3f} not threshold-marginal"
    for k in ("forced_pred_logits", "forced_pred_masks",
              "forced_mask_embed", "forced_cls_logits"):
        mx, rel = rows[f"head_full/{k}"]
        assert rel < 2e-4, f"{k}: rel={rel:.3e}"
