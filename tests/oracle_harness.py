"""Local replica of the driver's DuckDB oracle comparison.

Runs each `queries()` entry and its `oracle_sql()` twin on the same
sf dir, compares row count, column names, and the order-insensitive
multiset of stringified values (columns sorted by name) — the same
comparison shape the driver uses.
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark writes a table as a DIRECTORY of part files (the 10x
        # replica testdata_sf1/); the driver's testdata uses single
        # files. Glob the parts in the directory case.
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    # Type-sensitive on the int/float boundary: the driver's hasher
    # serializes a DuckDB HUGEINT-materialized-as-float64 (38017151.0)
    # differently from Spark's LongType (38017151), so an un-cast
    # SUM(BIGINT) must FAIL here too, not be papered over by %g.
    if v is None:
        return "\0"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v != int(v):
            return f"{v:.9g}"
        return f"float:{v!r}"
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def compare_query(spark, sf_dir: str, name: str, q_fn, sql: str):
    sdf = q_fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    res = con.sql(sql)
    # materialize through pandas like the driver does — this is what
    # turns DuckDB HUGEINT into float64 and exposes un-cast SUMs
    pdf = res.df()
    d_cols = [c.lower() for c in pdf.columns]
    d_rows = [
        tuple(None if isinstance(v, float) and math.isnan(v) else v for v in r)
        for r in pdf.itertuples(index=False, name=None)
    ]
    con.close()

    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    if not problems:
        a = canonical_rows(s_cols, s_rows)
        b = canonical_rows(d_cols, d_rows)
        if a != b:
            set_a, set_b = set(a), set(b)
            diff_a = [r for r in a if r not in set_b][:3]
            diff_b = [r for r in b if r not in set_a][:3]
            problems.append(f"values differ; spark-only={diff_a} duck-only={diff_b}")
    return problems, len(s_rows)
