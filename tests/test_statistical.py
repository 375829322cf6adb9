"""Statistical-model validation (SURVEY §4.4, mirroring test.R:167-348).

On an i.i.d. random sequence the occurrence count of a fixed k-mer in a
window of w bases is approximately Binomial(w - k + 1, p) with p = 4^-k
(slot dependencies are negligible for non-overlapping-prone k-mers).  The
windowed engine's empirical distribution must match in mean and variance.
"""

import numpy as np
import pytest

from kmer_spans_tpu import api

from conftest import random_seq


def test_window_distribution_binomial_moments():
    rng = np.random.default_rng(123)
    seq = random_seq(rng, 300_000)
    window, k = 128, 2
    # "AC" cannot overlap itself -> clean binomial approximation
    res = api.window_kmer_dist(seq, ["AC"], window, freq=False,
                               backend="host")
    dist = res.dist[:, 0].astype(np.float64)
    n_windows = dist.sum()
    counts = np.arange(dist.shape[0])
    mean = (counts * dist).sum() / n_windows
    var = ((counts - mean) ** 2 * dist).sum() / n_windows
    slots = window - k + 1
    p = 1 / 16
    exp_mean = slots * p
    exp_var = slots * p * (1 - p)
    assert mean == pytest.approx(exp_mean, rel=0.05)
    assert var == pytest.approx(exp_var, rel=0.15)


def test_count_frequencies_uniform():
    # i.i.d. uniform bases: every k-mer frequency ~ 4^-k
    rng = np.random.default_rng(42)
    seq = random_seq(rng, 400_000)
    res = api.kmer_counts(seq, 3, backend="host")
    f = res.f
    assert f.mean() == pytest.approx(1 / 64, rel=1e-6)
    assert f.max() < 2.0 / 64 and f.min() > 0.5 / 64


def test_self_referential_repeat_suppression():
    # SURVEY A.2: a pure repeat's own mass keeps its rank low — spans only
    # appear when the repeat is embedded in diverse background
    pure = "AG" * 2000
    res_pure = api.kmer_low_comp_regions(pure, 2, 10, 5.0, thr=0.5,
                                         backend="host")
    assert len(res_pure.regions) == 0
    rng = np.random.default_rng(9)
    embedded = random_seq(rng, 20_000) + "AG" * 200 + random_seq(rng, 20_000)
    res_emb = api.kmer_low_comp_regions(embedded, 2, 10, 5.0, thr=0.5,
                                        backend="host")
    assert len(res_emb.regions) >= 1
    # the island's region dominates every background excursion's score
    island = [r for r in res_emb.regions
              if r["beg"] < 20_400 and r["end"] > 20_000]
    assert island and max(r["score"] for r in island) > 3 * max(
        r["score"] for r in res_emb.regions if r["end"] <= 20_000)
