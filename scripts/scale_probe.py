"""Per-query scale probe: time contract queries at two sf dirs.

Evidence for the 100x-scale claims (VERDICT r3 item 2): run the most
expensive oracle legs at sf0.1 and the 10x replica (testdata_sf1) and
record wall + output rows at each, so per-leg growth can be judged
against the WORK each leg performs (join candidates grow quadratically
with point density on the replica by construction — the honest metric
is wall per unit of work, not wall per input row).

    python scripts/scale_probe.py [query ...]

Prints one JSON line: {query: {sf01_s, sf1_s, sf01_rows, sf1_rows}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

DEFAULT = [
    "jaccard_join",
    "cosine_pairs",
    "pip_contained",
    "near_dup_pairs",
    "simhash_pairs",
    "salted_cell_join",
    "knn_customers_suppliers",
    "ivf_ann_topk",
    "int8_ivf_topk",
    "page_rank_orders",
    "near_dup_clusters",
    "dedup_kept",
    "winnow_fps",
    "tfidf_top_terms",
    "session_stats_events",
    "validate_pipeline",
]

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(_REPO, "testdata_sf1")


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    import __spark_entry__ as entry
    from osm_pt_validator_spark.session import ensure_py_files, get_spark

    spark = get_spark("scale-probe", cores=32, shuffle_partitions=32)
    ensure_py_files(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()  # JVM warm

    qs = entry.queries()
    out: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            out[name] = {"error": "unknown query"}
            continue
        rec: dict[str, object] = {}
        for label, sf in (("sf01", SF01), ("sf1", SF1)):
            t0 = time.time()
            try:
                rec[f"{label}_rows"] = qs[name](spark, sf).count()
                rec[f"{label}_s"] = round(time.time() - t0, 2)
            except Exception as exc:  # noqa: BLE001 - record and continue
                rec[f"{label}_err"] = str(exc)[:300]
        if "sf01_s" in rec and "sf1_s" in rec:
            rec["wall_ratio"] = round(rec["sf1_s"] / max(rec["sf01_s"], 1e-9), 2)
            if rec["sf01_rows"]:
                rec["rows_ratio"] = round(rec["sf1_rows"] / rec["sf01_rows"], 2)
        out[name] = rec
        print(f"## {name}: {rec}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
