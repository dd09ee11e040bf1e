"""As-of join + sessionization (operators/temporal.py)."""

import datetime

import pytest
from pyspark.sql import functions as F

from osm_pt_validator_spark.operators.temporal import (
    asof_join,
    session_stats,
    sessionize,
)


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m, 0)


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts(0)),   # before any right row -> null match
            (2, "k1", _ts(5)),   # matches snapshot at minute 5 (inclusive)
            (3, "k1", _ts(7)),   # still snapshot 5
            (4, "k1", _ts(12)),  # snapshot 10
            (5, "k2", _ts(30)),  # other key
            (6, "k3", _ts(9)),   # key with no right rows at all
        ],
        "event_id long, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts(5), 50),
            ("k1", _ts(10), 100),
            ("k2", _ts(1), 7),
        ],
        "key string, rts timestamp, payload int",
    )
    got = {
        r["event_id"]: (r["rts"], r["payload"])
        for r in asof_join(left, right, ["key"], "ts", "rts").collect()
    }
    assert got[1] == (None, None)
    assert got[2] == (_ts(5), 50)
    assert got[3] == (_ts(5), 50)
    assert got[4] == (_ts(10), 100)
    assert got[5] == (_ts(1), 7)
    assert got[6] == (None, None)


def test_asof_join_null_payload_still_matches(spark):
    # a right row whose payload is NULL must still win over an older
    # non-null snapshot (the struct wrapper prevents skip-over)
    left = spark.createDataFrame(
        [(1, "k", _ts(9))], "event_id long, key string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("k", _ts(1), 11), ("k", _ts(8), None)],
        "key string, rts timestamp, payload int",
    )
    row = asof_join(left, right, ["key"], "ts", "rts").collect()[0]
    assert row["rts"] == _ts(8) and row["payload"] is None


def test_asof_join_prefix_avoids_collisions(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts(2))], "event_id long, key string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("k", _ts(1), 5)], "key string, ts timestamp, event_id long"
    )
    row = asof_join(left, right, ["key"], "ts", "ts", right_prefix="r_").collect()[0]
    assert row["event_id"] == 1 and row["r_event_id"] == 5
    assert row["ts"] == _ts(2) and row["r_ts"] == _ts(1)


def test_sessionize(spark):
    rows = [
        (1, 7, _ts(0)),
        (2, 7, _ts(10)),   # 10 min gap, within 30-min session
        (3, 7, _ts(50)),   # 40 min idle -> new session
        (4, 7, _ts(55)),
        (5, 8, _ts(0)),    # other user
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    s = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(df, "user_id", "ts", 1800, ["event_id"]).collect()
    }
    assert s == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}

    stats = {
        (r["user_id"], r["session_idx"]): r
        for r in session_stats(df, gap_s=1800, tiebreak_cols=["event_id"]).collect()
    }
    assert stats[(7, 0)]["n_events"] == 2
    assert stats[(7, 1)]["n_events"] == 2
    assert stats[(8, 0)]["n_events"] == 1
    assert (
        stats[(7, 1)]["end_epoch"] - stats[(7, 1)]["start_epoch"] == 300
    )


def test_asof_single_exchange(spark):
    """The whole as-of plan must contain exactly ONE Exchange (the
    key shuffle) — the union side never shuffles separately."""
    left = spark.createDataFrame(
        [(1, "k", _ts(1))], "event_id long, key string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("k", _ts(0), 5)], "key string, rts timestamp, payload int"
    )
    out = asof_join(left, right, ["key"], "ts", "rts")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Union" in plan, plan


def test_trailing_anomalies_burst_and_guards(spark):
    from osm_pt_validator_spark.operators.temporal import trailing_anomalies

    rows = []
    # key "a": alternating 9/11 history (mean 10, var 1), then a burst
    for h in range(24):
        rows.append(("a", h, 9 if h % 2 else 11))
    rows.append(("a", 24, 100))
    # key "b": CONSTANT history (zero variance) then a jump — must not
    # flag (z undefined), z_ppm NULL
    for h in range(24):
        rows.append(("b", h, 10))
    rows.append(("b", 24, 100))
    df = spark.createDataFrame(rows, "k string, hour long, n long")
    out = trailing_anomalies(
        df, ["k"], "hour", "n", lookback=24, min_history=8, sigmas=3
    ).collect()
    by = {(r["k"], r["hour"]): r for r in out}

    burst = by[("a", 24)]
    # c=24, S=240, Q=2424 => d=2160, var'=576, z = 2160/24 = 90
    assert burst["is_anomaly"] == 1
    assert burst["z_ppm"] == 90_000_000
    assert burst["hist"] == 24

    flat_jump = by[("b", 24)]
    assert flat_jump["is_anomaly"] == 0
    assert flat_jump["z_ppm"] is None

    # first min_history hours can never flag, whatever the values
    assert all(by[("a", h)]["is_anomaly"] == 0 for h in range(8))
    # an ordinary in-band hour does not flag: n=11, d=24 -> z=1
    assert by[("a", 23)]["is_anomaly"] == 0


def test_funnel_stages_greedy_order(spark):
    from osm_pt_validator_spark.operators.temporal import funnel_stages

    rows = [
        # u1: full funnel in order
        (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "purchase", _ts(3)),
        # u2: purchase BEFORE click -> stuck at stage 2
        (2, "view", _ts(1)), (2, "purchase", _ts(2)), (2, "click", _ts(3)),
        # u3: never views; click/purchase present -> stage 0
        (3, "click", _ts(1)), (3, "purchase", _ts(2)),
        # u4: same-timestamp progression view/click at the same second
        (4, "view", _ts(5)), (4, "click", _ts(5)), (4, "purchase", _ts(6)),
        # u5: early click ignored, later one counts
        (5, "click", _ts(1)), (5, "view", _ts(2)), (5, "click", _ts(4)),
        # u6: only irrelevant events -> absent from output
        (6, "error", _ts(1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        r["user_id"]: (r["stage_reached"], r["completed_epoch"])
        for r in funnel_stages(df, ["user_id"], "ts", ["view", "click", "purchase"]).collect()
    }
    import calendar

    def ep(m):
        return calendar.timegm(_ts(m).timetuple())

    assert got[1] == (3, ep(3))
    assert got[2] == (2, None)
    assert got[3] == (0, None)
    assert got[4] == (3, ep(6))
    assert got[5] == (2, None)
    assert 6 not in got


def test_funnel_subsecond_order_not_a_tie(spark):
    """purchase 100ms BEFORE click (same whole second) must NOT count
    as a conversion: the fold sorts by the raw microsecond timestamp,
    not a second-truncated one."""
    import datetime

    from osm_pt_validator_spark.operators.temporal import funnel_stages

    base = datetime.datetime(2024, 1, 1, 12, 0, 5)
    rows = [
        (1, "view", base.replace(microsecond=0)),
        (1, "purchase", base.replace(microsecond=100000)),
        (1, "click", base.replace(microsecond=900000)),
        # u2: genuinely ordered within the same second -> converts
        (2, "view", base.replace(microsecond=100000)),
        (2, "click", base.replace(microsecond=200000)),
        (2, "purchase", base.replace(microsecond=300000)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        r["user_id"]: (r["stage_reached"], r["completed_epoch"])
        for r in funnel_stages(
            df, ["user_id"], "ts", ["view", "click", "purchase"]
        ).collect()
    }
    assert got[1][0] == 2
    assert got[1][1] is None
    assert got[2][0] == 3


def test_retention_cohorts_hand_case(spark):
    from datetime import datetime

    from osm_pt_validator_spark.operators.temporal import retention_cohorts

    rows = [
        (1, datetime(2026, 1, 1)), (1, datetime(2026, 1, 9)),
        (2, datetime(2026, 1, 2)), (2, datetime(2026, 1, 3)),  # same bucket twice
        (3, datetime(2026, 1, 9)), (3, datetime(2026, 1, 23)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_bucket, r.age_buckets): r.n_users
        for r in retention_cohorts(df).collect()
    }
    base = 2922  # floor(epoch_days/7) for 2026-01-01
    assert got == {
        (base, 0): 2,       # users 1 and 2 start in week 0
        (base, 1): 1,       # user 1 returns next week
        (base + 1, 0): 1,   # user 3 starts in week 1
        (base + 1, 2): 1,   # user 3 returns two weeks later
    }
    # within-bucket repeat activity never double-counts (user 2)
    assert got[(base, 0)] == 2


def test_time_weighted_avg_hand_case(spark):
    from datetime import datetime

    from osm_pt_validator_spark.operators.temporal import time_weighted_avg

    rows = [
        ("a", datetime(2026, 1, 1, 0, 0, 0), 10.0),
        ("a", datetime(2026, 1, 1, 0, 1, 30), 100.0),
        ("a", datetime(2026, 1, 1, 0, 1, 40), 7.0),  # terminal: no interval
        ("b", datetime(2026, 1, 1), 5.0),  # single reading: dropped
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {r.k: r for r in time_weighted_avg(df, ["k"]).collect()}
    # 10 held 90s + 100 held 10s over 100s -> 19.00; plain AVG = 39.0
    assert (out["a"].n_intervals, out["a"].span_s, out["a"].twa_x100) == (2, 100, 1900)
    assert "b" not in out
