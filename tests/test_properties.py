"""Property-based tests (SURVEY.md §5.4): dedup determinism under input
permutation, epoch<->timestamp round-trips, date-part consistency with
Python's datetime."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# round 16 driver-budget tier: property-based depth suite (~200 s): randomized identities over the
# same operators the example-based suites and the oracle gate cover
pytestmark = pytest.mark.slow

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key (collisions likely)
        st.integers(min_value=0, max_value=10**6),  # ordering value
        st.text("abc", min_size=0, max_size=4),  # payload
    ),
    min_size=1,
    max_size=40,
)


@given(rows=rows_strategy, seed=st.integers(0, 5))
@SLOW
def test_dedup_deterministic_under_permutation(spark, rows, seed):
    """dedup_by semantics: same survivor multiset for any input order."""
    import random

    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)
    out = []
    for data in (rows, shuffled):
        df = spark.createDataFrame(data, "k int, v long, payload string")
        w = Window.partitionBy("k").orderBy(
            F.col("v").desc(), F.col("payload").desc()
        )
        survivors = (
            df.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .drop("rn")
            .collect()
        )
        out.append(sorted(map(tuple, survivors)))
    assert out[0] == out[1]


@given(ms=st.integers(min_value=0, max_value=4102444800000))  # 1970..2100
@SLOW
def test_epoch_ms_roundtrip(spark, ms):
    """builtin + UDF agree with exact integer datetime arithmetic."""
    from udacity_data_engineering_spark.functions.datetime_fns import (
        epoch_ms_to_ts,
        epoch_ms_to_ts_udf,
    )

    df = spark.createDataFrame([(ms,)], "ms long").select(
        epoch_ms_to_ts(F.col("ms")).cast("timestamp_ntz").alias("b"),
        epoch_ms_to_ts_udf(F.col("ms")).cast("timestamp_ntz").alias("u"),
    )
    row = df.collect()[0]
    expected = datetime(1970, 1, 1) + timedelta(milliseconds=ms)
    assert row.b == expected
    assert row.u == expected


@given(
    ts=st.datetimes(
        min_value=datetime(1971, 1, 1), max_value=datetime(2099, 12, 31)
    )
)
@SLOW
def test_dateparts_match_python(spark, ts):
    ts = ts.replace(microsecond=0)
    df = spark.createDataFrame([(ts,)], "t timestamp_ntz").select(
        F.hour("t"), F.dayofmonth("t"), F.month("t"), F.year("t"),
        F.weekofyear("t"), F.dayofweek("t"),
    )
    h, d, m, y, w, dow = df.collect()[0]
    assert (h, d, m, y) == (ts.hour, ts.day, ts.month, ts.year)
    assert w == ts.isocalendar()[1]
    assert dow == (ts.isoweekday() % 7) + 1  # Spark: 1=Sunday..7=Saturday


def test_asof_right_tiebreak_deterministic(spark):
    """Duplicate right timestamps per key resolve to the greatest
    tiebreak value on every run (ADVICE r1)."""
    from udacity_data_engineering_spark.operators.asof import asof_join

    right_rows = [(1, 10, i) for i in range(50)]  # 50 ties at ts=10
    left = spark.createDataFrame([(1, 15)], "k long, ts long")
    for nparts in (1, 8):
        right = spark.createDataFrame(right_rows, "k long, ts long, rid long").repartition(nparts)
        out = asof_join(left, right, on="k", right_cols=("rid",), right_tiebreak="rid")
        assert [r.rid_matched for r in out.collect()] == [49]


def test_asof_forward_matches_bruteforce(spark):
    """Forward as-of: earliest right at-or-after each left ts, inclusive
    at equality, None when no later right exists."""
    from udacity_data_engineering_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 15), (1, 30), (2, 5)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 15, "a"), (1, 20, "b"), (2, 1, "c")], "k long, ts long, v string"
    )
    out = asof_join(
        left, right, on="k", right_cols=("v",), direction="forward"
    )
    got = {(r.k, r.ts): r.v_matched for r in out.collect()}
    assert got == {(1, 10): "a", (1, 15): "a", (1, 30): None, (2, 5): None}


def test_asof_direction_validated(spark):
    import pytest

    from udacity_data_engineering_spark.operators.asof import asof_join

    df = spark.createDataFrame([(1, 1)], "k long, ts long")
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(df, df, on="k", direction="sideways")


def test_top_tokens_per_group_deterministic_and_exact(spark):
    from udacity_data_engineering_spark.operators.corpus import (
        top_tokens_per_group,
    )

    df = spark.createDataFrame(
        [
            (1, "en", "a a a b b c"),
            (2, "en", "b c c"),
            (3, "de", "x y"),
        ],
        "doc_id long, lang string, text string",
    )
    got = {
        (r.lang, r.rk): (r.token, r.cnt)
        for r in top_tokens_per_group(df, k=2).collect()
    }
    # en: a=3, b=3 -> tiebreak token asc puts a first; c=3? c appears 1+2=3
    # counts: a=3, b=3, c=3 -> top2 = a, b
    assert got[("en", 1)] == ("a", 3)
    assert got[("en", 2)] == ("b", 3)
    assert got[("de", 1)] == ("x", 1)
    assert got[("de", 2)] == ("y", 1)


@given(
    ts_list=st.lists(
        st.datetimes(
            # pre-1970 included deliberately: integer DIV truncates toward
            # zero while unix_millis floors, so negative sub-millisecond
            # values are exactly where the two vintages can disagree.
            # (1900 stays inside pyarrow's timestamp[ns] range, ~1677+.)
            min_value=datetime(1900, 1, 1),
            max_value=datetime(2100, 1, 1),
        ),
        min_size=1,
        max_size=20,
    )
)
@SLOW
def test_events_ms_expr_vintage_equivalence(spark, tmp_path_factory, ts_list):
    """Property: for ANY microsecond-precision timestamp — including
    pre-1970 and sub-millisecond values — the int64-nanos and
    timestamp[us] vintages normalize to the identical (floored)
    epoch-millis through events_ms_expr. The driver's testdata
    regeneration silently broke the whole-ms version of this invariant
    in round 3; the pre-1970 half catches DIV-vs-floor divergence."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from udacity_data_engineering_spark.functions.datetime_fns import events_ms_expr

    base = tmp_path_factory.mktemp("vintage_prop")
    got = {}
    for unit, sub in (("ns", "n"), ("us", "u")):
        tbl = pa.table(
            {
                "event_id": pa.array(range(len(ts_list)), pa.int64()),
                "ts": pa.array(ts_list, pa.timestamp(unit)),
            }
        )
        d = base / sub
        d.mkdir(exist_ok=True)
        pq.write_table(tbl, str(d / "events.parquet"), version="2.6")
        raw = spark.read.parquet(str(d))
        got[unit] = sorted(
            (r.event_id, r.ms)
            for r in raw.select("event_id", events_ms_expr(raw).alias("ms")).collect()
        )
    import calendar

    expected = sorted(
        (i, calendar.timegm(t.timetuple()) * 1000 + t.microsecond // 1000)
        for i, t in enumerate(ts_list)
    )  # integer arithmetic: float timestamp()*1000 truncates at µs edges
    assert got["ns"] == got["us"] == expected


_asof_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # key (collisions likely)
        st.integers(min_value=0, max_value=40),  # ts (ties likely)
    ),
    min_size=0,
    max_size=25,
)


@given(
    left_rows=_asof_rows,
    right_rows=_asof_rows,
    direction=st.sampled_from(["backward", "forward"]),
)
@SLOW
def test_asof_matches_bruteforce_property(spark, left_rows, right_rows, direction):
    """Property: for ANY (key, ts) multisets on both sides and both
    directions, the union-merge as-of join matches a per-row brute-force
    reference — inclusive at equality, deterministic max-tiebreak among
    right ties, None when no candidate exists."""
    from udacity_data_engineering_spark.operators.asof import asof_join

    if not left_rows:
        return
    left = spark.createDataFrame(left_rows, "k long, ts long")
    right_tagged = [(k, t, i) for i, (k, t) in enumerate(right_rows)]
    right = spark.createDataFrame(
        right_tagged or [(0, 0, 0)], "k long, ts long, rid long"
    )
    if not right_tagged:
        right = right.filter(F.lit(False))
    out = asof_join(
        left, right, on="k", right_cols=("rid",),
        right_tiebreak="rid", direction=direction,
    )
    got = sorted((r.k, r.ts, r.rid_matched) for r in out.collect())

    def brute(k, lts):
        if direction == "backward":
            cands = [(t, i) for (rk, t, i) in right_tagged if rk == k and t <= lts]
            if not cands:
                return None
            mts = max(t for t, _ in cands)
        else:
            cands = [(t, i) for (rk, t, i) in right_tagged if rk == k and t >= lts]
            if not cands:
                return None
            mts = min(t for t, _ in cands)
        return max(i for t, i in cands if t == mts)

    want = sorted((k, t, brute(k, t)) for k, t in left_rows)
    assert got == want


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=30,
    )
)
@SLOW
def test_components_match_union_find_property(spark, edges):
    """Property: for ANY random edge list (self-loops, duplicates,
    multi-component, chains longer than near-dup stars), the iterative
    min-label propagation labels every vertex with its component minimum,
    exactly as a union-find reference does."""
    from udacity_data_engineering_spark.operators.components import (
        connected_components,
    )

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.comp for r in connected_components(df, max_iter=40).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    want_groups = {}
    for v in parent:
        want_groups.setdefault(find(v), []).append(v)
    want = {v: min(g) for g in want_groups.values() for v in g}
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=0,
        max_size=60,
    ),
    split=st.integers(min_value=0, max_value=59),
)
def test_bitmap_sketch_is_set_union_property(spark, ids, split):
    """For ANY id multiset and ANY 2-way split: merged slice sketches ==
    whole sketch, and the popcount == the true distinct count — the
    merge-is-set-union algebra on arbitrary int64s (sign bit included)."""
    from udacity_data_engineering_spark.operators.bitmap import (
        bitmap_distinct_counts,
        bitmap_distinct_sketch,
        merge_bitmap_sketches,
    )

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    whole = sorted(map(tuple, bitmap_distinct_sketch(df, "id").collect()))
    a = bitmap_distinct_sketch(
        spark.createDataFrame([(i,) for i in ids[:split]], "id long"), "id"
    )
    b = bitmap_distinct_sketch(
        spark.createDataFrame([(i,) for i in ids[split:]], "id long"), "id"
    )
    merged = sorted(map(tuple, merge_bitmap_sketches(a, b).collect()))
    assert merged == whole
    counts = bitmap_distinct_counts(merge_bitmap_sketches(a, b)).collect()
    got = counts[0]["n_distinct"] if counts else 0
    assert (got or 0) == len(set(ids))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=99.999, allow_nan=False),
        min_size=1, max_size=50,
    ),
    split=st.integers(min_value=0, max_value=49),
)
def test_quantile_sketch_merge_equals_concat_property(spark, vals, split):
    """Sketch(A) + Sketch(B) == Sketch(A ++ B) cell-for-cell for any
    values and any split — the additive-cells warehouse algebra."""
    from udacity_data_engineering_spark.operators.quantiles import (
        merge_quantile_sketches,
        quantile_sketch,
    )

    lo, hi, nb = 0.0, 100.0, 16
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    whole = sorted(map(tuple, quantile_sketch(df, "x", lo, hi, nb).collect()))
    a = quantile_sketch(
        spark.createDataFrame([(v,) for v in vals[:split]], "x double"),
        "x", lo, hi, nb,
    )
    b = quantile_sketch(
        spark.createDataFrame([(v,) for v in vals[split:]], "x double"),
        "x", lo, hi, nb,
    )
    merged = sorted(map(tuple, merge_quantile_sketches(a, b).collect()))
    assert merged == whole


# ---------------------------------------------------------------------------
# Round-15 algebra: bloom join invisibility, PSI identity/symmetry under
# arbitrary inputs, bloom sizing monotonicity
# ---------------------------------------------------------------------------


@given(
    fact_keys=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
    dim_keys=st.lists(st.integers(-1000, 1000), min_size=1, max_size=20),
)
@SLOW
def test_bloom_join_invisible_property(spark, fact_keys, dim_keys):
    """For ANY key multisets (negative keys, dupes, disjoint sets), the
    bloom-prefiltered join equals the plain join — the prefilter may only
    drop rows the join would drop anyway."""
    from udacity_data_engineering_spark.operators.joins import bloom_join

    fact = spark.createDataFrame(
        [(k, i) for i, k in enumerate(fact_keys)], "k long, rid long"
    )
    dim = spark.createDataFrame([(k,) for k in set(dim_keys)], "k long")
    got = sorted(map(tuple, bloom_join(fact, dim, "k").collect()))
    want = sorted(map(tuple, fact.join(dim, "k").collect()))
    assert got == want


@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=99.0, allow_nan=False),
        min_size=1,
        max_size=60,
    )
)
@SLOW
def test_psi_identity_and_symmetry_property(spark, vals):
    """PSI(s, s) == 0 for any sketch, and PSI(a, b) == PSI(b, a): the
    (p-q)ln(p/q) form is symmetric under swap, smoothing included."""
    from udacity_data_engineering_spark.operators.quantiles import (
        quantile_sketch,
        sketch_drift_psi,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    half_a = df.limit(max(1, len(vals) // 2))
    sk = quantile_sketch(df, "v", 0.0, 100.0, 16)
    sk_a = quantile_sketch(half_a, "v", 0.0, 100.0, 16)
    assert abs(sketch_drift_psi(sk, sk, 16).first()["psi"]) < 1e-9
    ab = sketch_drift_psi(sk, sk_a, 16).first()["psi"]
    ba = sketch_drift_psi(sk_a, sk, 16).first()["psi"]
    assert abs(ab - ba) < 1e-6
    import math

    assert math.isfinite(ab) and ab >= 0  # PSI is non-negative


@given(
    n_keys=st.integers(0, 10**9),
    n_files=st.integers(1, 4096),
)
@settings(max_examples=50, deadline=None)
def test_size_bloom_bits_properties(n_keys, n_files):
    """Word-aligned, floored at 8192, monotone in keys-per-file, and
    always >= 10 bits per expected key per file (the no-saturation
    bound)."""
    from udacity_data_engineering_spark.sources.skipping import size_bloom_bits

    m = size_bloom_bits(n_keys, n_files)
    assert m % 64 == 0 and m >= 8192
    per_file = max(1, -(-n_keys // n_files))
    assert m >= per_file * 10
    assert size_bloom_bits(n_keys * 2, n_files) >= m
