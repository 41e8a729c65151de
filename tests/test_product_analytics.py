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


def test_funnel_ordered_enforces_strict_order(spark):
    """purchase BEFORE the first view must NOT convert — the constraint
    a 'has all three types' check gets wrong."""
    from udacity_data_engineering_spark.operators.product_analytics import (
        funnel_ordered,
    )

    rows = [
        # user 1: full ordered funnel
        (1, 1.0, "view"), (1, 2.0, "click"), (1, 3.0, "purchase"),
        # user 2: purchase first — has all 3 types but must NOT convert
        (2, 1.0, "purchase"), (2, 2.0, "view"), (2, 3.0, "click"),
        # user 3: view+click only
        (3, 1.0, "view"), (3, 2.0, "click"),
        # user 4: click at the SAME ts as view: strict > excludes it
        (4, 1.0, "view"), (4, 1.0, "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts double, event_type string")
    got = {
        r["step"]: r["n_users"]
        for r in funnel_ordered(df, ["view", "click", "purchase"]).collect()
    }
    # 2_click: users 1, 2 (their click at 3.0 follows their view at 2.0
    # even though the purchase precedes both) and 3; user 4's same-ts
    # click is excluded by the strict ordering
    assert got == {"1_view": 4, "2_click": 3, "3_purchase": 1}

    import pytest

    with pytest.raises(ValueError, match="steps"):
        funnel_ordered(df, ["view"])


def test_event_paths_deterministic_order(spark):
    from udacity_data_engineering_spark.operators.product_analytics import (
        event_paths,
    )

    rows = [
        (1, 2.0, 20, "click"), (1, 1.0, 10, "view"), (1, 2.0, 15, "error"),
        (2, 5.0, 1, "signup"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts double, event_id long, event_type string"
    )
    got = {r["user_id"]: (r["n_events"], r["path"])
           for r in event_paths(df).collect()}
    # ties on ts break on event_id: error(15) before click(20)
    assert got == {1: (3, "view->error->click"), 2: (1, "signup")}
