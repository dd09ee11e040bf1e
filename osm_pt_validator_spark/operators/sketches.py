"""Mergeable sketch operators for 100 TB-scale corpus profiling.

Three sketches, all hashed with ``functions.hashing.md5_i64`` so a SQL
oracle replays them bit-for-bit (same contract as minhash/simhash):

* **KMV (k-minimum-values) distinct count** — per group, the k smallest
  distinct 60-bit hashes of the value; estimate = (k-1) / (normalized
  kth hash). The per-group bound runs as a ``dense_rank() <= k`` window
  whose WindowGroupLimit prunes to ~k rows per map partition BEFORE the
  shuffle — the classic mergeable-sketch shape without a UDAF, so the
  shuffle carries O(k) rows per (group, partition) no matter how many
  input rows a group has.
* **Bloom digest + prune** — a fixed-width (``words`` x 63-bit) Bloom
  filter per group built with ``bit_or`` aggregation (map-side partial,
  digest is ``words`` BIGINTs per group); a probe table is then pruned
  by a BROADCAST membership test before any expensive shuffle join —
  the bloom-semi-join pattern Spark applies internally for runtime
  filters, here materialized as reusable data.
* **Inverted index** — token -> exact document frequency + a capped,
  sorted posting list. ONE shuffle on token (the window and the final
  aggregation share the partitioning, so Catalyst reuses the exchange);
  hot tokens (stopwords) cannot blow a reducer because postings are
  rank-capped while df stays an exact count.

Only bit 0..62 of each Bloom word is used: bit 63 is the sign bit, and
keeping it clear makes the two's-complement BIGINT digest trivially
identical between Spark and any replaying engine.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from osm_pt_validator_spark.functions.hashing import md5_i64

#: md5_i64 yields 60-bit hashes => values are uniform on [0, 2**60).
KMV_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame, group_cols: list[str], value: Column, k: int = 64
) -> DataFrame:
    """Approximate COUNT(DISTINCT value) per group via k minimum values.

    Output: group_cols + (k_actual, kth_hash, est_distinct). When a
    group has fewer than k distinct hashes the estimate is exact
    (= k_actual). The estimate is floored to BIGINT; the division is a
    single IEEE-double op on integer-valued operands, so it reproduces
    bit-for-bit in any IEEE engine.
    """
    hashed = df.select(*group_cols, md5_i64(value).alias("__h"))
    # dense_rank (not row_number): duplicate values hash equal, and
    # dense_rank keeps "k smallest DISTINCT hashes" in one pass with no
    # pre-dedup shuffle. InferWindowGroupLimit pushes the <=k bound
    # below the exchange for rank-like functions.
    w = Window.partitionBy(*group_cols).orderBy(F.col("__h").asc())
    topk = hashed.withColumn("__rk", F.dense_rank().over(w)).filter(
        F.col("__rk") <= k
    )
    agg = topk.groupBy(*group_cols).agg(
        F.countDistinct("__h").alias("k_actual"),
        F.max("__h").alias("kth_hash"),
    )
    est = F.when(
        F.col("k_actual") < k, F.col("k_actual").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_SPACE) / F.col("kth_hash").cast("double")
    )
    return agg.select(
        *group_cols,
        "k_actual",
        "kth_hash",
        F.floor(est).cast("long").alias("est_distinct"),
    )


def kmv_distinct_sql(
    table: str, group_expr: str, value_expr: str, k: int = 64
) -> str:
    """DuckDB replay of :func:`kmv_distinct` (oracle helper)."""
    return f"""
WITH h AS (SELECT {group_expr} AS g,
                  ('0x' || substr(md5({value_expr}), 1, 15))::BIGINT AS hv
           FROM {table}),
r AS (SELECT g, hv, dense_rank() OVER (PARTITION BY g ORDER BY hv) AS rk FROM h),
a AS (SELECT g, COUNT(DISTINCT hv) AS k_actual, MAX(hv) AS kth_hash
      FROM r WHERE rk <= {k} GROUP BY 1)
SELECT g AS {group_expr}, k_actual, kth_hash,
       CAST(floor(CASE WHEN k_actual < {k} THEN CAST(k_actual AS DOUBLE)
                       ELSE {float(k - 1)!r} * {KMV_SPACE!r} / CAST(kth_hash AS DOUBLE)
                  END) AS BIGINT) AS est_distinct
FROM a
"""


def _bloom_positions(value: Column, hashes: int, words: int):
    """(word_idx, bit) pairs for each of the `hashes` hash functions.

    Bit range is 0..62 — see module docstring on the sign bit. `words`
    must be a power of two: word selection is a mask and the bit
    derivation a shift, because Column `/` is FLOAT division and a
    double cannot hold a 60-bit integer exactly.
    """
    if words & (words - 1):
        raise ValueError("words must be a power of two")
    shift = words.bit_length() - 1
    out = []
    for i in range(hashes):
        h = md5_i64(value, salt=f"bf{i}|")
        bit = F.shiftright(h, shift) % 63
        # pyspark's shiftleft() only takes a literal shift; 2**bit via
        # pow() is exact for bit <= 62 (powers of two are exact doubles)
        mask = F.pow(F.lit(2.0), bit.cast("double")).cast("long")
        out.append((h.bitwiseAND(F.lit(words - 1)), mask))
    return out


def bloom_digest(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    words: int = 2,
    hashes: int = 2,
) -> DataFrame:
    """Per-group Bloom digest: `words` BIGINT columns w0..w{words-1}.

    bit_or partially aggregates map-side, so the shuffle carries one
    `words`-wide row per (group, partition) — a digest over any number
    of input rows costs a broadcast-sized result.
    """
    pos = _bloom_positions(value, hashes, words)
    row_words = []
    for j in range(words):
        contribs = [
            F.when(widx == j, mask).otherwise(F.lit(0).cast("long"))
            for widx, mask in pos
        ]
        row_words.append(
            reduce(lambda a, b: a.bitwiseOR(b), contribs).alias(f"__w{j}")
        )
    per_row = df.select(*group_cols, *row_words)
    return per_row.groupBy(*group_cols).agg(
        *[F.bit_or(F.col(f"__w{j}")).alias(f"w{j}") for j in range(words)]
    )


def bloom_prune(
    probe: DataFrame,
    digest: DataFrame,
    group_cols: list[str],
    value: Column,
    words: int = 2,
    hashes: int = 2,
) -> DataFrame:
    """Keep probe rows whose value is POSSIBLY in the group's digest.

    The digest side is explicitly broadcast (it is one row per group by
    construction); rows from groups absent in the digest are dropped
    (inner join), rows failing any bit test are dropped — only
    possibly-present rows survive to whatever expensive join follows.
    False positives pass (Bloom contract); false negatives never.
    """
    pos = _bloom_positions(value, hashes, words)
    joined = probe.join(F.broadcast(digest), group_cols, "inner")
    checks = []
    for widx, mask in pos:
        word = F.lit(None).cast("long")
        for j in range(words):
            word = F.when(widx == j, F.col(f"w{j}")).otherwise(word)
        checks.append(word.bitwiseAND(mask) == mask)
    return joined.filter(reduce(lambda a, b: a & b, checks)).drop(
        *[f"w{j}" for j in range(words)]
    )


def bloom_sql_fragments(value_expr: str, words: int = 2, hashes: int = 2):
    """DuckDB replay pieces: per-row word exprs (digest build) and the
    membership predicate (prune), for oracle queries."""
    pos = [
        (
            f"(('0x' || substr(md5('bf{i}|' || {value_expr}), 1, 15))::BIGINT % {words})",
            f"((('0x' || substr(md5('bf{i}|' || {value_expr}), 1, 15))::BIGINT // {words}) % 63)",
        )
        for i in range(hashes)
    ]
    word_exprs = []
    for j in range(words):
        parts = [
            f"(CASE WHEN {widx} = {j} THEN (1::BIGINT << CAST({bit} AS INT)) ELSE 0::BIGINT END)"
            for widx, bit in pos
        ]
        word_exprs.append(" | ".join(parts))
    membership_terms = []
    for widx, bit in pos:
        word_sel = (
            "CASE "
            + " ".join(f"WHEN {widx} = {j} THEN w{j}" for j in range(words))
            + " END"
        )
        membership_terms.append(
            f"((({word_sel}) >> CAST({bit} AS INT)) & 1) = 1"
        )
    return word_exprs, " AND ".join(membership_terms)


def log_binned_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    sub_bits: int = 3,
) -> DataFrame:
    """Deterministic approximate quantiles via a log-binned histogram.

    `value` must be a positive integer column (quantize floats to
    cents/millis first). Bins are (octave, 2**sub_bits sub-buckets) =>
    relative bin width <= 2**-sub_bits (12.5% at 3), and every bin edge
    is derived with INTEGER-EXACT ops — floor(log2) comes from the
    binary-digit count (`length(bin(n)) - 1`), the sub-bucket from
    division by an exact power of two — so the result replays
    bit-for-bit in SQL, unlike percentile_approx whose GK sketch is
    merge-order-dependent.

    Scale shape: ONE map-side-combining groupBy to the histogram
    (cardinality <= 64 octaves x 2**sub_bits per group), then windows
    over that tiny table. The reported quantile is the LOWER BOUND of
    the first bin whose cumulative count reaches ceil(q * total).
    """
    n = value.cast("long")
    exp = (F.length(F.bin(n)) - 1).cast("int")
    shift = F.greatest(exp - F.lit(sub_bits), F.lit(0))
    # n < 2**53, scale a power of two => the division is exact in a double
    scale = F.pow(F.lit(2.0), shift.cast("double"))
    low = (F.floor(n.cast("double") / scale).cast("long")
           * scale.cast("long")).alias("__low")
    hist = df.select(*group_cols, low).groupBy(*group_cols, "__low").agg(
        F.count(F.lit(1)).alias("__n")
    )
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("__low").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*group_cols)
    h = hist.select(
        *group_cols,
        "__low",
        F.sum("__n").over(wcum).alias("__cum"),
        F.sum("__n").over(wtot).alias("__tot"),
    )
    aggs = [
        F.min(
            F.when(
                F.col("__cum") >= F.ceil(F.lit(q) * F.col("__tot")),
                F.col("__low"),
            )
        ).alias(f"p{str(q)[2:]}")
        for q in quantiles
    ]
    return h.groupBy(*group_cols).agg(*aggs)


def log_binned_quantiles_sql(
    table: str,
    group_expr: str,
    value_expr: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    sub_bits: int = 3,
) -> str:
    """DuckDB replay of :func:`log_binned_quantiles` (oracle helper)."""
    q_cols = ",\n       ".join(
        f"MIN(CASE WHEN cum >= ceil({q!r} * tot) THEN low END) AS p{str(q)[2:]}"
        for q in quantiles
    )
    return f"""
WITH v AS (SELECT {group_expr} AS g, CAST({value_expr} AS BIGINT) AS n FROM {table}),
b AS (SELECT g,
             (n // CAST(power(2.0, greatest(length(bin(n)) - 1 - {sub_bits}, 0)) AS BIGINT))
             * CAST(power(2.0, greatest(length(bin(n)) - 1 - {sub_bits}, 0)) AS BIGINT) AS low
      FROM v),
hist AS (SELECT g, low, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
c AS (SELECT g, low,
             SUM(cnt) OVER (PARTITION BY g ORDER BY low
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY g) AS tot
      FROM hist)
SELECT g AS {group_expr},
       {q_cols}
FROM c GROUP BY 1
"""


def skew_profile(df: DataFrame, key_cols: list[str], top: int = 10) -> DataFrame:
    """Top-`top` hottest keys with their row share — the measurement you
    take BEFORE choosing a salt factor for a skewed join.

    Scale shape: map-side-combining groupBy to per-key counts, then
    TakeOrderedAndProject (orderBy+limit — fully parallel partial
    top-N, never a single-partition window) for the hot set, and a
    single-row global aggregate joined back by broadcast. share_ppm is
    integer arithmetic (exact, replayable).
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    hot = counts.orderBy(
        F.col("n").desc(), *[F.col(k).asc() for k in key_cols]
    ).limit(top)
    totals = counts.agg(
        F.sum("n").alias("__total"), F.count(F.lit(1)).alias("n_keys")
    )
    # global window is fine HERE: it runs over <= `top` rows post-limit
    w = Window.orderBy(F.col("n").desc(), *[F.col(k).asc() for k in key_cols])
    return (
        hot.join(F.broadcast(totals))
        .select(
            *key_cols,
            "n",
            F.row_number().over(w).alias("rank"),
            # `div` = exact integer division (double `/` loses ulps
            # once n * 1e6 passes 2**53)
            F.expr("n * 1000000 div __total").alias("share_ppm"),
            "n_keys",
        )
    )


def inverted_index(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 10,
    min_df: int = 1,
) -> DataFrame:
    """token -> (df exact, postings: first `max_postings` doc ids asc,
    comma-joined). One shuffle on token; postings capped per token so
    stopword-grade tokens stay O(max_postings) wide."""
    from osm_pt_validator_spark.operators.text import tokens

    tok = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token"),
    )
    w = Window.partitionBy("token").orderBy(F.col("doc_id").asc())
    ranked = tok.withColumn("__rn", F.row_number().over(w))
    # collect_list skips NULLs, so the when() caps postings while the
    # count stays exact df; window and groupBy share the token
    # partitioning => Catalyst reuses the exchange (single shuffle).
    return (
        ranked.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("__rn") <= max_postings, F.col("doc_id"))
                        )
                    ),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


def exact_group_median(
    df: DataFrame, key_cols: list[str], value: Column
) -> DataFrame:
    """Exact per-group median — the ground-truth counterpart of
    log_binned_quantiles, for when the answer must be exact (SLA
    percentiles, billing): rank-window selection of the middle row(s).

    Emits median_x2 = (middle value)*2 for odd groups, (sum of the two
    middle values) for even groups — the median doubled, kept in the
    integer domain so the result is engine-identical (every engine's
    median()/percentile_cont interpolates in its own float order;
    percentile_disc picks a different middle convention per engine).

    One shuffle on the keys; the rank window is a per-group linear
    scan. Ties in the value column are harmless: whichever tied rows
    row_number lands on, the summed values are equal. NULL values are
    excluded before ranking (SQL-standard aggregate semantics — ranked
    NULLs would sort first and shift the middle). At 100 TB use the
    sketch for exploration and this for the keys that matter — an
    exact median fundamentally requires the full group (no partial
    aggregation exists), which is WHY the sketch is the default path.

    Output: key_cols + (n non-null values, median_x2).
    """
    v = df.select(*key_cols, value.alias("v")).filter(
        F.col("v").isNotNull()
    )
    w = Window.partitionBy(*key_cols).orderBy(F.col("v").asc())
    wk = Window.partitionBy(*key_cols)
    ranked = (
        v.withColumn("__rn", F.row_number().over(w))
        .withColumn("__c", F.count(F.lit(1)).over(wk))
        .withColumn("__lo", F.expr("(__c + 1) div 2"))
        .withColumn("__hi", F.expr("(__c + 2) div 2"))
    )
    mid = ranked.filter(
        (F.col("__rn") == F.col("__lo")) | (F.col("__rn") == F.col("__hi"))
    )
    return mid.groupBy(*key_cols).agg(
        F.max("__c").alias("n"),
        F.sum(
            F.when(F.col("__lo") == F.col("__hi"), F.col("v") * 2).otherwise(
                F.col("v")
            )
        ).alias("median_x2"),
    )


# --- HyperLogLog ------------------------------------------------------------
#
# The industry-standard mergeable distinct sketch (Flajolet et al.),
# alongside KMV above: registers are (group, idx) -> max(rho) rows, so
# two sketches merge by a plain max-groupBy union — the property that
# lets per-partition / per-day sketches roll up without re-scanning.
#
# Determinism contract: rho comes from md5_i64 (engine-neutral), and
# the harmonic sum is computed as an EXACT INTEGER — sum of
# 2^(w+1-rho) with w = 60-p leading-value bits — so it is
# order-independent (a float 2^-rho sum would round differently under
# different aggregation orders once the mantissa span exceeds 53
# bits). The only float ops are the final alpha*m^2*2^(w+1)/S division
# and the small-range ln correction, each a single IEEE op on exact
# integer-valued operands.


def _hll_rho(rest: Column, w: int) -> Column:
    """rho = leading-zero count of the w-bit value + 1 =
    w - bit_length(rest) + 1 (rest=0 -> w+1), as a constant comparison
    chain — exact in any engine, no float log2."""
    bit_len = sum(
        [F.when(rest >= F.lit(1 << k), 1).otherwise(0) for k in range(w)],
        start=F.lit(0),
    )
    return (F.lit(w) - bit_len + 1).cast("int")


def hll_distinct(
    df: DataFrame, group_cols: list[str], value: Column, p: int = 10
) -> DataFrame:
    """Approximate COUNT(DISTINCT value) per group via HyperLogLog with
    2^p registers (standard error ~1.04/sqrt(2^p); ~3.3% at p=10).

    Output: group_cols + (n_zero INT, hll_est_x100 LONG). Includes the
    linear-counting small-range correction (est <= 2.5m and empty
    registers present). The register table (group, idx, rho) is the
    mergeable form; this operator folds it straight to the estimate.
    """
    m = 1 << p
    w = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    h = md5_i64(value)
    # COUNT(DISTINCT) semantics: NULL is not a value (a NULL hash
    # would otherwise occupy a register and inflate the estimate)
    hashed = df.filter(value.isNotNull()).select(
        *group_cols,
        F.shiftright(h, w).alias("__idx"),
        h.bitwiseAND(F.lit((1 << w) - 1)).alias("__rest"),
    )
    regs = hashed.groupBy(*group_cols, "__idx").agg(
        F.max(_hll_rho(F.col("__rest"), w)).alias("__rho")
    )
    # exact integer harmonic sum, scaled by 2^(w+1): present register
    # contributes 2^(w+1-rho); each of the (m - n_present) empty
    # registers contributes 2^(w+1). Max total m * 2^(w+1) < 2^63.
    # F.shiftleft only takes a literal shift; the SQL form accepts a
    # column expression
    scaled = F.expr(f"shiftleft(cast(1 as bigint), {w + 1} - __rho)")
    agg = regs.groupBy(*group_cols).agg(
        F.sum(scaled).alias("__s_present"),
        F.count(F.lit(1)).alias("__n_present"),
    )
    n_zero = (F.lit(m) - F.col("__n_present")).cast("int")
    s_total = F.col("__s_present") + (F.lit(m) - F.col("__n_present")) * F.lit(
        1 << (w + 1)
    )
    raw = F.lit(float(alpha * m * m * (1 << (w + 1)))) / s_total.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (n_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_zero.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        n_zero.alias("n_zero"),
        F.round(est * 100).cast("long").alias("hll_est_x100"),
    )


def hll_distinct_sql(
    table: str, group_expr: str, value_expr: str, p: int = 10
) -> str:
    """DuckDB replay of :func:`hll_distinct` (oracle helper)."""
    m = 1 << p
    w = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    bit_len = " + ".join(
        f"(CASE WHEN rest >= {1 << k} THEN 1 ELSE 0 END)" for k in range(w)
    )
    return f"""
WITH h AS (SELECT {group_expr} AS g,
                  ('0x' || substr(md5({value_expr}), 1, 15))::BIGINT AS hv
           FROM {table} WHERE {value_expr} IS NOT NULL),
split AS (SELECT g, hv >> {w} AS idx, hv & {(1 << w) - 1} AS rest FROM h),
rho_t AS (SELECT g, idx, CAST({w} - ({bit_len}) + 1 AS INT) AS rho FROM split),
regs AS (SELECT g, idx, MAX(rho) AS rho FROM rho_t GROUP BY 1, 2),
agg AS (SELECT g,
          CAST(SUM(CAST(1 AS BIGINT) << ({w + 1} - rho)) AS BIGINT) AS s_present,
          COUNT(*) AS n_present
        FROM regs GROUP BY 1),
est AS (SELECT g, CAST({m} - n_present AS INT) AS n_zero,
          {float(alpha * m * m * (1 << (w + 1)))!r}
            / CAST(s_present + ({m} - n_present) * {1 << (w + 1)} AS DOUBLE) AS raw,
          n_present
        FROM agg)
SELECT g AS {group_expr}, n_zero,
  CAST(round((CASE WHEN raw <= {2.5 * m!r} AND n_zero > 0
    THEN {float(m)!r} * ln({float(m)!r} / CAST(n_zero AS DOUBLE))
    ELSE raw END) * 100) AS BIGINT) AS hll_est_x100
FROM est
"""


# --- Count-Min sketch -------------------------------------------------------
#
# The mergeable FREQUENCY digest (Cormode-Muthukrishnan), completing
# the family: Bloom answers membership, KMV/HLL answer cardinality,
# CMS answers "how often" — with a one-sided guarantee (estimate >=
# truth; overshoot <= eps * total with prob 1 - delta for width =
# ceil(e/eps), depth = ceil(ln(1/delta))). Counters are exact integer
# sums over md5-derived row positions, so digests from different
# partitions / days merge by summing counters, and a DuckDB oracle
# replays them bit-for-bit.


def cms_digest(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Per-group Count-Min digest: one row per (group, d, idx) holding
    the exact counter — the sparse form (zero counters absent), which
    at corpus scale is ONE map-side-combining groupBy whose key space
    is bounded by depth * width per group, never by the data.
    """
    if width & (width - 1):
        raise ValueError("width must be a power of two")
    rows = []
    for d in range(depth):
        rows.append(
            F.struct(
                F.lit(d).alias("d"),
                md5_i64(value, salt=f"cms{d}|")
                .bitwiseAND(F.lit(width - 1))
                .alias("idx"),
            )
        )
    return (
        df.filter(value.isNotNull())  # NULL is not a countable value
        .select(*group_cols, F.explode(F.array(*rows)).alias("__p"))
        .groupBy(*group_cols, F.col("__p.d").alias("d"), F.col("__p.idx").alias("idx"))
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def cms_lookup(
    digest: DataFrame,
    probes: DataFrame,
    group_cols: list[str],
    probe_value: Column,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates: min over the depth counters at each
    probe's hashed positions. Estimates NEVER undercount; collisions
    only inflate. Missing counters read as 0 (sparse digest).

    Probes broadcast against the bounded digest; the min over d is a
    map-side partial aggregate. Output: probes' group_cols +
    (probe, est_count).
    """
    pos = []
    for d in range(depth):
        pos.append(
            F.struct(
                F.lit(d).alias("d"),
                md5_i64(probe_value, salt=f"cms{d}|")
                .bitwiseAND(F.lit(width - 1))
                .alias("idx"),
            )
        )
    p = (
        # mirror cms_digest's NULL exclusion: NULL is not a countable
        # value on either side, so a NULL probe is excluded rather than
        # surfaced as a misleading est_count=0 row
        probes.filter(probe_value.isNotNull())
        .select(
            *group_cols,
            probe_value.alias("probe"),
            F.explode(F.array(*pos)).alias("__p"),
        )
        .select(*group_cols, "probe", F.col("__p.d").alias("d"), F.col("__p.idx").alias("idx"))
    )
    joined = p.join(digest, [*group_cols, "d", "idx"], "left").select(
        *group_cols,
        "probe",
        F.coalesce(F.col("counter"), F.lit(0).cast("long")).alias("__c"),
    )
    return joined.groupBy(*group_cols, "probe").agg(
        F.min("__c").alias("est_count")
    )


def exact_group_mad(
    df: DataFrame, key_cols: list[str], value: Column
) -> DataFrame:
    """Exact per-group median absolute deviation — the robust spread
    estimate outlier detection wants where stddev is poisoned by the
    outliers themselves (trailing_anomalies' 3-sigma rule breaks on
    heavy tails; median +- k*MAD does not).

    Stays in the integer domain end to end: deviations are computed in
    the x2 domain (|2*v - median_x2| — no halving, no floats), so the
    emitted mad_x4 is (MAD * 4), exact and engine-identical. Composes
    :func:`exact_group_median` twice with a join between — like the
    exact median, this fundamentally requires the full group twice;
    the sketch family is the exploratory path at 100 TB.

    Output: key_cols + (n, median_x2, mad_x4).
    """
    med = exact_group_median(df, key_cols, value)
    v = df.select(*key_cols, value.alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    # null-safe joins: exact_group_median keeps NULL-key groups (SQL
    # GROUP BY semantics), so the rejoin must too — a plain equi-join
    # would silently drop their MAD
    m = med.select(
        *[F.col(k).alias(f"__mk_{k}") for k in key_cols], "median_x2"
    )
    mcond = [v[k].eqNullSafe(m[f"__mk_{k}"]) for k in key_cols]
    dev = v.join(m, mcond).select(
        *[v[k] for k in key_cols],
        F.abs(F.col("__v") * 2 - F.col("median_x2")).alias("__dev_x2"),
    )
    mad = exact_group_median(dev, key_cols, F.col("__dev_x2")).select(
        *[F.col(k).alias(f"__dk_{k}") for k in key_cols],
        F.col("median_x2").alias("mad_x4"),
    )
    fcond = [med[k].eqNullSafe(mad[f"__dk_{k}"]) for k in key_cols]
    return med.join(mad, fcond).select(
        *[med[k] for k in key_cols], "n", "median_x2", "mad_x4"
    )
