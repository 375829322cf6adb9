"""ops/gather.py: packed rank-class tables + enumerated Pallas gather.

Checks (CPU interpret mode, 8 virtual devices via conftest):
  * packing layout of class_table_from_mass
  * pallas_word_gather == words[idx] for random tables/indices
  * screening scores are a SOUND upper bound on true rank scores
    (the invariant the span pipeline's candidate discovery relies on)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kmer_spans_tpu.ops.gather import (
    CLASS_LEVELS,
    class_screen_scores,
    class_table_from_mass,
    pallas_word_gather,
    prerolled_table,
)


def _mass_from_counts(counts):
    order = np.argsort(counts, kind="stable")
    mass = np.zeros(counts.shape[0], np.int64)
    mass[order] = np.concatenate([[0], np.cumsum(counts[order])[:-1]])
    return mass


@pytest.mark.parametrize("k", [3, 4, 6, 8])
def test_word_gather_exact(k):
    rng = np.random.default_rng(7 + k)
    size = 1 << (2 * k)
    words = rng.integers(-(2**31), 2**31, size=max(size // 8, 1),
                         dtype=np.int64).astype(np.int32)
    tabR = prerolled_table(jnp.asarray(words))
    idx = rng.integers(0, words.shape[0], size=4096).astype(np.int32)
    got = np.asarray(pallas_word_gather(tabR, jnp.asarray(idx)))
    assert np.array_equal(got, words[idx])


@pytest.mark.parametrize("k", [4, 8])
def test_class_table_packing(k):
    rng = np.random.default_rng(k)
    size = 1 << (2 * k)
    counts = rng.integers(0, 50, size=size)
    mass = _mass_from_counts(counts)
    total = float(counts.sum())
    packed = np.asarray(class_table_from_mass(
        jnp.asarray(mass.astype(np.int32)), jnp.float32(total)))
    rank = mass.astype(np.float32) / np.float32(total)
    cls = np.clip((rank * CLASS_LEVELS).astype(np.int32), 0,
                  CLASS_LEVELS - 1)
    ref = (cls.reshape(-1, 8) << (np.arange(8) * 4)).sum(axis=1)
    assert np.array_equal(packed, ref.astype(np.int32))


@pytest.mark.parametrize("k,thr", [(4, 0.5), (6, 0.75), (8, 0.9)])
def test_screen_scores_sound_upper_bound(k, thr):
    rng = np.random.default_rng(17 + k)
    size = 1 << (2 * k)
    counts = rng.integers(0, 100, size=size)
    mass = _mass_from_counts(counts)
    total = float(counts.sum())
    tabR = prerolled_table(class_table_from_mass(
        jnp.asarray(mass.astype(np.int32)), jnp.float32(total)))
    codes = rng.integers(0, size, size=20000).astype(np.int32)
    s = np.asarray(class_screen_scores(
        tabR, jnp.asarray(codes), jnp.float32(thr)))
    true_s = mass[codes].astype(np.float64) / total - thr
    assert (s >= true_s - 1e-7).all()
    # and not uselessly loose: within one quantization level + slack
    assert (s - true_s <= 1.0 / CLASS_LEVELS + 1e-4).all()
