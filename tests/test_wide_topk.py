"""wide_exact_topk: two-level exact top-k for very wide score rows.

Must match lax.top_k exactly (values AND a valid permutation of rows)
including -inf-masked lanes and max ties at sub-tile boundaries.
"""

import jax.numpy as jnp
import numpy as np

from myscaledb_tpu.ops.topk import wide_exact_topk


def _check(scores, k):
    s = jnp.asarray(scores)
    v, r = wide_exact_topk(s, k)
    v, r = np.asarray(v), np.asarray(r)
    ref = np.sort(scores, axis=1)[:, ::-1][:, :k]
    finite = np.isfinite(ref)
    np.testing.assert_array_equal(v[finite], ref[finite])
    # returned rows must actually score their returned values
    for qi in range(scores.shape[0]):
        for j in range(k):
            if np.isfinite(v[qi, j]):
                assert scores[qi, r[qi, j]] == v[qi, j]
            else:
                assert r[qi, j] == -1


def test_wide_exact_matches_sort(rng):
    s = rng.standard_normal((16, 4096)).astype(np.float32)
    _check(s, 10)


def test_wide_exact_with_masked_lanes(rng):
    s = rng.standard_normal((8, 4096)).astype(np.float32)
    s[:, 100:4000] = -np.inf  # heavy masking
    _check(s, 10)


def test_wide_exact_ties_across_subtiles(rng):
    s = rng.standard_normal((4, 4096)).astype(np.float32)
    # identical max planted in many sub-tiles: slack must still surface
    # k copies of the tied value
    s[:, ::128] = 7.5
    _check(s, 5)


def test_wide_exact_all_masked():
    s = np.full((4, 4096), -np.inf, np.float32)
    v, r = wide_exact_topk(jnp.asarray(s), 3)
    assert not np.isfinite(np.asarray(v)).any()
    assert (np.asarray(r) == -1).all()


def test_narrow_falls_back(rng):
    # width too small for pruning: must still be exact via the fallback
    s = rng.standard_normal((4, 256)).astype(np.float32)
    _check(s, 10)
