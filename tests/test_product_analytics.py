"""attribute_touches column contract (ADVICE r13: event_type/value were
hardcoded while key/ts/tiebreak were parametric — non-events schemas
couldn't attribute without renaming)."""

from __future__ import annotations

from udacity_data_engineering_spark.operators.product_analytics import (
    attribute_touches,
)


def _rows(df):
    vals = [
        (r["first_touch"], r["last_touch"], r["amount"])
        for r in df.select("first_touch", "last_touch", "amount").collect()
    ]
    return sorted(vals, key=lambda t: (t[0] or "", t[1] or "", t[2]))


def test_attribution_parametric_columns(spark):
    """A fully renamed schema (account/at/seq/channel/amount) must
    attribute identically to the canonical events schema."""
    rows = [
        # account 1: ad -> email -> ORDER(10) -> ORDER(5)
        (1, 1, "ad", 0.0),
        (1, 2, "email", 0.0),
        (1, 3, "order", 10.0),
        (1, 4, "order", 5.0),
        # account 2: ORDER with no prior touch -> NULL ('direct')
        (2, 1, "order", 7.0),
    ]
    df = spark.createDataFrame(
        [(acct, seq, float(seq), ch, amt) for acct, seq, ch, amt in rows],
        "account long, seq long, at double, channel string, amount double",
    )
    got = attribute_touches(
        df,
        conversion_type="order",
        key="account",
        ts="at",
        tiebreak="seq",
        type_col="channel",
        measure_col="amount",
    )
    assert _rows(got) == [
        (None, None, 7.0),
        # the first ORDER is not a touch: last_touch stays 'email' for
        # the second order too
        ("ad", "email", 5.0),
        ("ad", "email", 10.0),
    ]


def test_attribution_defaults_match_events_schema(spark, sf_dir):
    """Defaults still bind to the events schema the registered query
    uses — the parametrization must not have changed q_attribution."""
    from udacity_data_engineering_spark.session import table

    ev = table(spark, sf_dir, "events")
    out = attribute_touches(ev)
    assert set(out.columns) == {
        "user_id", "ts", "event_id", "event_type", "value",
        "first_touch", "last_touch",
    }
    assert out.filter(out.event_type != "purchase").count() == 0
