"""Temporal operators Spark has no built-in for: as-of join and
gap-based sessionization.

Both are expressed as ONE shuffle on the key + a per-key window scan —
never a range join (whose candidate set is quadratic in rows-per-key)
and never Python. DuckDB replays both (native ASOF JOIN / identical
window algebra), so the driver oracle checks them value-for-value.

as-of join (backward): for each left row, the single right row with
the greatest right_ts <= left_ts for the same key — "the crawl
snapshot in force when this event happened". The union trick: tag and
interleave both inputs on (key, ts), then carry the latest right
payload forward with last(ignorenulls) over rows-unbounded-preceding.
Compared to the broadcast-range-join alternative this needs no
binning, handles unbounded staleness, and shuffles each input exactly
once; within-key work is a linear scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_R_STRUCT = "__asof_r"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_prefix: str = "",
) -> DataFrame:
    """Backward as-of LEFT join: left columns + the payload columns of
    the latest right row with right_ts <= left_ts per key (null when
    no right row precedes). right_ts is surfaced as
    `{right_prefix}{right_ts}` alongside the payload.

    Right rows must be unique per (keys, right_ts) — the standard
    as-of precondition (DuckDB's ASOF JOIN assumes the same).

    Plan: unionByName (no shuffle) -> window over (keys, ts, right
    rows first on ties) -> filter back to left rows. One exchange on
    keys total; the payload rides inside a single struct so
    last(ignorenulls) never confuses a legitimately-null right column
    with "no match yet".
    """
    payload_cols = [c for c in right.columns if c not in keys and c != right_ts]
    out_cols = [right_prefix + right_ts] + [right_prefix + c for c in payload_cols]

    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_r"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c) for c in payload_cols],
        ).alias(_R_STRUCT),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_r"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # right (1) sorts before left (0) at equal ts => backward-inclusive
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last(_R_STRUCT, ignorenulls=True).over(w))
    return matched.filter(F.col("__is_r") == 0).select(
        *left.columns,
        F.col(f"__m.__rts").alias(out_cols[0]),
        *[
            F.col(f"__m.{c}").alias(right_prefix + c)
            for c in payload_cols
        ],
    )


def sessionize(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_s: int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the key has been
    idle for more than gap_s seconds. Adds `session_idx` (0-based per
    key, in time order) — deterministic given tiebreak_cols that make
    (key, ts, *tiebreak) unique.

    One shuffle on the key; the lag + running-sum windows share the
    same sort, so Spark evaluates them in a single window pass.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.unix_timestamp(F.col(ts_col))).over(w)
    is_new = F.when(
        prev.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - prev) > gap_s),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # two steps: a window expression can't nest inside another window
    # fn's argument; both windows share (partition, sort) so Spark
    # evaluates them in one pass without a second exchange
    flagged = events.withColumn("__new", is_new)
    return flagged.withColumn(
        "session_idx", (F.sum(F.col("__new")).over(run) - 1).cast("long")
    ).drop("__new")


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-session rollup over sessionize(): bounds, event count —
    the classic web-analytics aggregation. Second shuffle is on
    (key, session_idx), i.e. a refinement of the first — AQE keeps it
    local."""
    s = sessionize(events, key_col, ts_col, gap_s, tiebreak_cols)
    return s.groupBy(key_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_timestamp(F.col(ts_col))).alias("start_epoch"),
        F.max(F.unix_timestamp(F.col(ts_col))).alias("end_epoch"),
    )


def trailing_anomalies(
    counts: DataFrame,
    key_cols: list[str],
    ts_col: str,
    n_col: str = "n",
    lookback: int = 24,
    min_history: int = 8,
    sigmas: int = 3,
) -> DataFrame:
    """Trailing-window anomaly detection over a (key, bucket, count)
    time series: flag buckets whose count exceeds the trailing mean by
    `sigmas` population standard deviations — the burst detector every
    crawl/telemetry pipeline runs over its per-hour volumes.

    The frame is ROWS BETWEEN `lookback` PRECEDING AND 1 PRECEDING per
    key (the current bucket never sees itself). All statistics are
    derived from INTEGER frame sums (count, sum, sum of squares), so
    the anomaly decision is exact integer algebra — no Welford-vs-
    two-pass float drift between engines:

        d     = n*c - S            (c = frame rows, S = frame sum)
        var'  = c*Q - S^2          (= c^2 * population variance)
        flag  = d > 0  AND  d^2 > sigmas^2 * var'
        z_ppm = round(d / sqrt(var') * 1e6)   (sqrt/div of exact ints
                                               — identical doubles)

    Buckets with under `min_history` trailing rows or zero variance get
    z_ppm = NULL and never flag. One shuffle on the key; the window is
    a linear per-key scan.

    Input contract: `counts` must be DENSE per key (one row per bucket,
    zero-count buckets included). A ROWS frame over sparse buckets
    silently spans quiet periods and biases the trailing mean upward —
    zero-fill against a bucket grid first (see q_event_anomalies).

    Output: key_cols + (ts bucket, n, hist, z_ppm, is_anomaly).
    """
    frame = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(-lookback, -1)
    )
    n = F.col(n_col).cast("long")
    c = F.count(F.lit(1)).over(frame)
    s = F.sum(n).over(frame)
    q = F.sum(n * n).over(frame)
    d = n * c - s
    var_c2 = c * q - s * s
    ok = (c >= min_history) & (var_c2 > 0)
    z = F.when(ok, F.round(d / F.sqrt(var_c2) * 1e6)).cast("long")
    flag = ok & (d > 0) & (d * d > sigmas * sigmas * var_c2)
    return counts.select(
        *key_cols,
        F.col(ts_col),
        n.alias("n"),
        c.alias("hist"),
        z.alias("z_ppm"),
        flag.cast("int").alias("is_anomaly"),
    )


def funnel_stages(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    steps: list[str],
    type_col: str = "event_type",
) -> DataFrame:
    """Greedy ordered-funnel analysis: per key, how far through the
    step sequence the event history gets (view -> click -> purchase),
    and when it completed — the conversion query every event pipeline
    runs.

    Greedy earliest matching is OPTIMAL for subsequence containment
    (taking the first qualifying event never forecloses a later
    stage), so the result is well-defined. Implementation: events that
    match any step collapse to slim (ts, step_idx) structs, ONE
    map-side-combined shuffle groups them per key, and a fold
    (F.aggregate) over the time-sorted array advances a stage counter —
    at most one stage per event, ties resolved by (ts, step_idx) sort
    order, so the fold is deterministic under any partitioning. The
    sort key is the RAW timestamp (microsecond precision) — truncating
    to seconds first would turn genuinely-ordered sub-second events
    into ties and count out-of-order funnels as conversions. No
    Python, no window: the per-key scan is a single codegen'd
    expression.

    Semantics note: one event advances at most one stage. With distinct
    step predicates this is the standard funnel; if two CONSECUTIVE
    steps share a predicate, a key needs two matching events (an
    earliest-timestamp chain would silently reuse one).

    Output: key_cols + (stage_reached INT, completed_epoch LONG —
    epoch seconds of the stage that completed the funnel, NULL if not
    completed).
    """
    n_steps = len(steps)
    step_idx = F.lit(None).cast("int")
    for i in range(n_steps - 1, -1, -1):
        step_idx = F.when(F.col(type_col) == steps[i], F.lit(i)).otherwise(
            step_idx
        )
    # the isin filter is implied by __step IS NOT NULL, but Catalyst
    # cannot derive pushable predicates from a derived CASE column —
    # stating it on the raw column sends it into the parquet scan
    # (PushedFilters), so non-funnel event types are never read
    slim = (
        events.filter(F.col(type_col).isin(list(steps)))
        .select(
            *key_cols,
            F.col(ts_col).alias("__ts"),
            step_idx.alias("__step"),
        )
        .filter(F.col("__step").isNotNull())
    )
    arr = slim.groupBy(*key_cols).agg(
        F.array_sort(F.collect_list(F.struct("__ts", "__step"))).alias("evs")
    )
    init = F.struct(
        F.lit(0).cast("int").alias("stage"),
        F.lit(None).cast("long").alias("done_ts"),
    )
    fold = F.aggregate(
        F.col("evs"),
        init,
        lambda acc, e: F.when(
            (e["__step"] == acc["stage"]) & (acc["stage"] < n_steps),
            F.struct(
                (acc["stage"] + 1).cast("int").alias("stage"),
                F.when(
                    acc["stage"] + 1 == n_steps, F.unix_timestamp(e["__ts"])
                )
                .otherwise(F.lit(None).cast("long"))
                .alias("done_ts"),
            ),
        ).otherwise(acc),
    )
    return arr.select(
        *key_cols,
        fold["stage"].alias("stage_reached"),
        fold["done_ts"].alias("completed_epoch"),
    )


def retention_cohorts(
    events: DataFrame,
    key_cols: list[str] | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-activity
    bucket (cohort), counted in every later bucket they return in —
    the canonical product-analytics rollup (row = cohort, column =
    buckets-since-start, value = distinct returning users).

    Buckets are integer day-epochs divided by ``bucket_days`` (UTC,
    engine-identical — no calendar arithmetic). Two shuffles: the
    (user -> first bucket) aggregation and the cohort rollup; the
    distinct-users count per cell is exact because (user, bucket) is
    deduplicated BEFORE the rollup, keeping the final agg a plain
    map-side-combining count.

    Output: key_cols + (cohort_bucket, age_buckets, n_users).
    age_buckets = 0 is the cohort size itself.
    """
    keys = list(key_cols or [])
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(86400)).cast("long")
        / F.lit(bucket_days)
    )
    bucket = F.floor(bucket).cast("long")
    slim = events.select(
        *keys, F.col(user_col).alias("__u"), bucket.alias("__b")
    ).distinct()
    first = slim.groupBy(*keys, "__u").agg(F.min("__b").alias("__cohort"))
    joined = slim.join(first, [*keys, "__u"])
    return (
        joined.groupBy(
            *keys,
            F.col("__cohort").alias("cohort_bucket"),
            (F.col("__b") - F.col("__cohort")).alias("age_buckets"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def time_weighted_avg(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Time-weighted average per key — the timeseries mean that is
    correct for IRREGULARLY sampled state (a sensor reading holds
    until the next one): each reading is weighted by how long it was
    current, i.e. sum(value_i * dt_i) / sum(dt_i) over last-point-
    carried-forward intervals. The plain AVG over-weights bursts.

    Integer contract: values quantize to cents, durations to whole
    seconds (epoch diffs), and the output is twa_x100 = the
    cent-weighted integer ratio rounded via half-up on an exact
    double division of two int64s — engine-identical. The final
    reading of each key has no successor and contributes no interval
    (standard TWA-until-last-sample semantics); keys with a single
    reading are dropped (zero observed duration).

    One shuffle (the per-key window); the final agg combines map-side.
    Output: key_cols + (n_intervals, span_s, twa_x100).
    """
    epoch = F.unix_timestamp(F.col(ts_col))
    v = _cents_local(F.col(value_col))
    slim = events.select(
        *key_cols, epoch.alias("__t"), v.alias("__v")
    ).withColumn("__nt", F.lead("__t").over(
        Window.partitionBy(*key_cols).orderBy(F.col("__t").asc(), F.col("__v").asc())
    ))
    iv = slim.filter(F.col("__nt").isNotNull()).select(
        *key_cols,
        (F.col("__nt") - F.col("__t")).alias("__dt"),
        F.col("__v"),
    )
    agg = iv.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("__dt").alias("span_s"),
        F.sum(F.col("__v") * F.col("__dt")).alias("__wsum"),
    ).filter(F.col("span_s") > 0)
    twa = F.round(
        F.col("__wsum").cast("double") / F.col("span_s").cast("double")
    ).cast("long")
    return agg.select(*key_cols, "n_intervals", "span_s", twa.alias("twa_x100"))


def _cents_local(c):
    return F.round(c * 100).cast("long")
