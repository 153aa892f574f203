"""Independent Sonata oracle (VERDICT r4 next #7): the flax SonataTeacher
vs a de-novo naive-loop numpy forward sharing zero code — scalar Skilling
Hilbert, hash-map sparse convs, per-patch attention loops, sorted-unique
grid pooling. ≙ the usage contract of reference
models/affinity_module.py:995-1063 over the Pointcept PTv3 layout."""

import numpy as np

from geopurify_tpu.parity import compare


def test_parity_sonata_cross_implementation():
    """Both contract cases (stem conv + max pool + all four serialization
    orders + concat upcast; dense embed + mean pool + propagate upcast +
    folded-BN affine) pin at rel ~1e-6 (target < 1e-5)."""
    rows = compare.parity_sonata()
    assert set(rows) == {"sonata/maxpool_stem", "sonata/meanpool_affine"}
    for k, (mx, rel) in rows.items():
        assert rel < 1e-5, f"{k}: rel={rel:.3e} max|d|={mx:.3e}"


def test_parity_sonata_has_teeth():
    """Contract mutations on the naive side (wrong pooling reduce) must
    blow the comparison up — the check is not vacuous."""
    rows = compare.parity_sonata(mutate_naive={"pool_reduce": "mean"})
    mx, rel = rows["sonata/maxpool_stem"]
    assert rel > 1e-2, f"max->mean pooling mutation invisible (rel={rel:.3e})"


def test_naive_curves_match_vectorized():
    """The scalar Skilling-transpose Hilbert and per-bit Morton codes equal
    the vectorized ops/morton.py implementations on a coordinate sweep —
    the serialization layer itself is cross-pinned, not just end-to-end."""
    import jax.numpy as jnp

    from geopurify_tpu.ops.morton import hilbert_code, morton_code
    from geopurify_tpu.parity.sonata_oracle import hilbert_naive, morton_naive

    rng = np.random.default_rng(0)
    coords = rng.integers(0, 1024, (500, 3)).astype(np.int32)
    for order in (0, 1):
        vec = np.asarray(morton_code(jnp.asarray(coords), order))
        naive = np.array([morton_naive(int(x), int(y), int(z), order)
                          for x, y, z in coords])
        assert np.array_equal(vec, naive)
    vec_h = np.asarray(hilbert_code(jnp.asarray(coords)))
    naive_h = np.array([hilbert_naive(int(x), int(y), int(z))
                        for x, y, z in coords])
    assert np.array_equal(vec_h, naive_h)
