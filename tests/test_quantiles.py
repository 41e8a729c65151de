"""Mergeable fixed-grid quantile sketch (operators/quantiles.py).

Contracts under test: (1) the sketch is a pure histogram — cells match a
hand count; (2) merge is associative/commutative and batch-split-
invariant (sketch(A ∪ B) == merge(sketch(A), sketch(B)) in any order);
(3) every estimate is within one bin width of the true quantile
(inverted-CDF definition) when the data fits the domain; (4) sparse
cells never shift an estimate (the dense-bin-id regression); (5)
out-of-domain values clamp to edge bins instead of corrupting cells.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.quantiles import (
    merge_quantile_sketches,
    quantile_estimates,
    quantile_sketch,
)


def _cells(df):
    return {tuple(r) for r in df.collect()}


def test_sketch_cells_match_hand_count(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in (0.5, 1.5, 1.6, 9.9, 5.0)], "v double"
    )
    sk = quantile_sketch(df, "v", lo=0.0, hi=10.0, n_bins=10)
    assert _cells(sk) == {(0, 1), (1, 2), (5, 1), (9, 1)}


def test_nulls_excluded(spark):
    df = spark.createDataFrame([(1.0,), (None,), (None,)], "v double")
    sk = quantile_sketch(df, "v", 0.0, 10.0, 10)
    assert _cells(sk) == {(1, 1)}


def test_out_of_domain_clamps_to_edge_bins(spark):
    df = spark.createDataFrame([(-5.0,), (99.0,), (10.0,)], "v double")
    sk = quantile_sketch(df, "v", 0.0, 10.0, 10)
    # -5 -> bin 0; 99 and 10 (== hi) -> bin 9
    assert _cells(sk) == {(0, 1), (9, 2)}


def test_merge_equals_whole_and_is_order_invariant(spark):
    rows = [(i % 3, float((i * 37) % 1000)) for i in range(300)]
    df = spark.createDataFrame(rows, "g int, v double")
    whole = quantile_sketch(df, "v", 0.0, 1000.0, 16, group_cols=("g",))
    parts = [
        quantile_sketch(
            df.filter(F.col("v") % 4 == i), "v", 0.0, 1000.0, 16, group_cols=("g",)
        )
        for i in range(4)
    ]
    merged = merge_quantile_sketches(*parts)
    reversed_merge = merge_quantile_sketches(*parts[::-1])
    # nested grouping: merge(merge(p0,p1), merge(p2,p3)) — associativity
    nested = merge_quantile_sketches(
        merge_quantile_sketches(parts[0], parts[1]),
        merge_quantile_sketches(parts[2], parts[3]),
    )
    want = _cells(whole)
    assert _cells(merged) == want
    assert _cells(reversed_merge) == want
    assert _cells(nested) == want


def test_estimate_within_one_bin_width(spark):
    rng = np.random.default_rng(13)
    vals = rng.uniform(0.0, 1000.0, 2000).tolist()
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    lo, hi, bins = 0.0, 1000.0, 50
    width = (hi - lo) / bins
    qs = (0.1, 0.5, 0.9, 0.99)
    sk = quantile_sketch(df, "v", lo, hi, bins)
    est = {r["q"]: r["est"] for r in quantile_estimates(sk, qs, lo, hi, bins).collect()}
    arr = np.sort(np.array(vals))
    for q in qs:
        # inverted-CDF true quantile: element at rank ceil(q*n)
        true = arr[int(np.ceil(q * len(arr))) - 1]
        assert true <= est[q] <= true + width, (q, true, est[q])


def test_sparse_bins_do_not_shift_estimates(spark):
    # two occupied bins far apart: 10 values in bin 0, 10 in bin 9.
    # p90 must be the upper edge of bin 9 (100.0), NOT bin 1's edge —
    # the bug a row-position (vs bin-id) cumulative scan would have.
    vals = [1.0] * 10 + [95.0] * 10
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    sk = quantile_sketch(df, "v", 0.0, 100.0, 10)
    est = {r["q"]: r["est"] for r in quantile_estimates(sk, (0.5, 0.9), 0.0, 100.0, 10).collect()}
    assert est[0.5] == pytest.approx(10.0)  # cum(bin 0) = 10 >= 0.5*20
    assert est[0.9] == pytest.approx(100.0)


def test_grouped_estimates_are_per_group(spark):
    rows = [("a", float(i)) for i in range(100)] + [
        ("b", float(i * 10)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    sk = quantile_sketch(df, "v", 0.0, 1000.0, 100, group_cols=("g",))
    est = {
        (r["g"], r["q"]): r["est"]
        for r in quantile_estimates(
            sk, (0.5,), 0.0, 1000.0, 100, group_cols=("g",)
        ).collect()
    }
    assert est[("a", 0.5)] == pytest.approx(50.0)
    assert est[("b", 0.5)] == pytest.approx(500.0)


def test_rejects_bad_grid(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        quantile_sketch(df, "v", 5.0, 5.0, 10)
    with pytest.raises(ValueError):
        quantile_sketch(df, "v", 0.0, 1.0, 0)
    with pytest.raises(ValueError):
        merge_quantile_sketches()


def test_registered_queries_bounded_output(spark, sf_dir):
    from udacity_data_engineering_spark.operators.quantiles import (
        q_quantile_estimates,
        q_quantile_sketch,
    )

    sk = q_quantile_sketch(spark, sf_dir)
    assert sk.count() <= 3 * 64  # statuses x bins
    est = q_quantile_estimates(spark, sf_dir).collect()
    assert len(est) == 3 * 3  # statuses x quantiles
    assert all(0.0 < r["est"] <= 512000.0 for r in est)


def test_derive_domain_and_saturation_repair_loop(spark):
    """ADVICE r13: out-of-domain values silently saturate into the edge
    bins. The repair loop: saturation_counts makes the mis-specified
    domain visible, derive_quantile_domain re-sizes it, the re-sketched
    estimates regain the one-bin-width error bound."""
    import pytest

    from udacity_data_engineering_spark.operators.quantiles import (
        derive_quantile_domain,
        quantile_estimates,
        quantile_sketch,
        saturation_counts,
    )

    vals = [float(v) for v in range(0, 1000, 3)] + [5000.0, 9000.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")

    # a narrow guess: [0, 100) — most values saturate above
    sat = saturation_counts(df, "x", 0.0, 100.0).collect()[0]
    assert sat["n_below"] == 0
    assert sat["n_above"] == sum(1 for v in vals if v >= 100.0)
    assert sat["n_total"] == len(vals)

    # derived domain covers everything: zero saturation by construction
    lo, hi = derive_quantile_domain(df, "x")
    assert lo == 0.0 and hi > 9000.0
    sat2 = saturation_counts(df, "x", lo, hi).collect()[0]
    assert sat2["n_below"] == 0 and sat2["n_above"] == 0

    # and the re-sketched estimates satisfy the one-bin-width bound
    n_bins = 64
    width = (hi - lo) / n_bins
    sk = quantile_sketch(df, "x", lo, hi, n_bins)
    got = {
        r["q"]: r["est"]
        for r in quantile_estimates(sk, (0.5, 0.9, 0.99), lo, hi, n_bins).collect()
    }
    svals = sorted(vals)
    for q, est in got.items():
        true = svals[min(len(svals) - 1, int(q * len(svals)))]
        assert abs(est - true) <= width + 1e-9, (q, est, true, width)

    # all-null input fails loudly, not with a NaN grid
    nulls = spark.createDataFrame([(None,)], "x double")
    with pytest.raises(ValueError, match="no\\s+non-null"):
        derive_quantile_domain(nulls, "x")


def test_weighted_sketch_matches_row_expansion(spark):
    """A weight-w row must contribute exactly like w copies of the row:
    the weighted sketch of (value, weight) equals the unweighted sketch
    of the expanded multiset, cell for cell — and zero/negative/null
    weights carry no mass."""
    from udacity_data_engineering_spark.operators.quantiles import (
        quantile_sketch,
    )

    rows = [(10.0, 3), (10.0, 2), (55.0, 1), (90.0, 4), (33.0, 0),
            (44.0, -2), (70.0, None)]
    df = spark.createDataFrame(rows, "x double, w int")
    expanded = spark.createDataFrame(
        [(x,) for x, w in rows if w and w > 0 for _ in range(w)], "x double"
    )
    lo, hi, nb = 0.0, 100.0, 10
    weighted = {
        (r["bin"],): r["cnt"]
        for r in quantile_sketch(df, "x", lo, hi, nb, weight_col="w").collect()
    }
    plain = {
        (r["bin"],): r["cnt"]
        for r in quantile_sketch(expanded, "x", lo, hi, nb).collect()
    }
    assert weighted == plain == {(1,): 5, (5,): 1, (9,): 4}


def test_drift_psi_zero_for_identical_and_grows_with_shift(spark):
    from udacity_data_engineering_spark.operators.quantiles import (
        quantile_sketch,
        sketch_drift_psi,
    )

    base = spark.createDataFrame(
        [(float(i % 100),) for i in range(5000)], "v double"
    )
    shifted = spark.createDataFrame(
        [(float(i % 100) + 40.0,) for i in range(5000)], "v double"
    )
    sk = lambda df: quantile_sketch(df, "v", 0.0, 160.0, 32)
    same = sketch_drift_psi(sk(base), sk(base), 32).first()["psi"]
    assert abs(same) < 1e-9  # identical distributions: PSI exactly 0
    drift = sketch_drift_psi(sk(base), sk(shifted), 32).first()["psi"]
    assert drift > 0.25  # a 40-unit shift is an action-level drift
    # symmetry of the statistic: PSI(a,b) == PSI(b,a) (the (p-q)ln(p/q)
    # form is symmetric under swap)
    rev = sketch_drift_psi(sk(shifted), sk(base), 32).first()["psi"]
    assert abs(drift - rev) < 1e-6


def test_drift_psi_grouped_and_empty_side(spark):
    from udacity_data_engineering_spark.operators.quantiles import (
        quantile_sketch,
        sketch_drift_psi,
    )

    df = spark.createDataFrame(
        [("a", float(i % 10)) for i in range(100)]
        + [("b", float(i % 10) + 5.0) for i in range(100)],
        "g string, v double",
    )
    sk = lambda d: quantile_sketch(d, "v", 0.0, 16.0, 16, group_cols=("g",))
    ref, cur = sk(df), sk(df.filter("g = 'a'"))
    out = {r["g"]: r["psi"] for r in sketch_drift_psi(ref, cur, 16, ("g",)).collect()}
    assert abs(out["a"]) < 1e-9  # unchanged group: zero drift
    # group b vanished from current: all its current mass is smoothing —
    # maximal drift, finite (never NaN/inf thanks to Laplace smoothing)
    import math
    assert out["b"] > 1.0 and math.isfinite(out["b"])
