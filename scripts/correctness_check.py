"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, sorted column names, and a value hash computed
over column-name-sorted, row-sorted stringified values (floats
rounded to 9 significant digits so JVM/DuckDB ulp noise does not
read as a mismatch — the driver hashes exact values, so a pass here
is necessary-but-slightly-weaker; a FAIL here is a real FAIL there).

Usage:  PYTHONPATH=/root/repo python scripts/correctness_check.py [sf_dir] [only...]
"""

import json
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        return format(v, ".9g")
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    return sorted(cols), out


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from osm_pt_validator_spark.session import get_spark

    spark = get_spark("correctness-check", cores=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    report, failed = {}, []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        entry = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
        try:
            sdf = fn(spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                entry.update(err="no_oracle", spark_rows=len(srows))
            else:
                res = con.execute(oracles[name])
                ocols = [d[0] for d in res.description]
                orows = res.fetchall()
                sc, sv = canon(scols, srows)
                oc, ov = canon(ocols, orows)
                entry["rows_match"] = len(srows) == len(orows)
                entry["schema_match"] = sc == oc
                entry["hash_match"] = sv == ov
                entry["spark_rows"], entry["oracle_rows"] = len(srows), len(orows)
                if not (entry["rows_match"] and entry["schema_match"] and entry["hash_match"]):
                    failed.append(name)
                    if sc != oc:
                        entry["schema_diff"] = {"spark": sc, "oracle": oc}
                    else:
                        diff = [
                            (a, b) for a, b in zip(sv, ov) if a != b
                        ][:3]
                        entry["first_value_diffs"] = diff
        except Exception as e:  # noqa: BLE001 — harness must keep going
            entry["err"] = f"{type(e).__name__}: {e}"[:400]
            failed.append(name)
        report[name] = entry
        status = "OK " if name not in failed else "FAIL"
        print(f"{status} {name}: {json.dumps({k: v for k, v in entry.items() if k not in ('schema_diff', 'first_value_diffs')})}",
              flush=True)

    print(f"\n{len(report) - len(failed)}/{len(report)} green")
    if failed:
        print("FAILED:", failed)
        for name in failed:
            e = report[name]
            for k in ("schema_diff", "first_value_diffs", "err"):
                if e.get(k):
                    print(f"  {name}.{k}: {str(e[k])[:500]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
