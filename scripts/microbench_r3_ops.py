"""Microbenchmark of the round-3 operator additions at sf0.1.

Runs each new operator on the sf0.1 tables (600k events / 5k docs /
40k embeddings / 15k customers) at local[$SPARK_GRAFT_CPUS], best-of-2,
with the same hostprobe stamps bench.py emits, and prints ONE JSON
line. Not part of bench.py: the headline suite stays comparable across
rounds; this is the scale evidence for the NEW operators.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/microbench_r3_ops.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from osm_pt_validator_spark.hostprobe import (
        cpu_times,
        parallel_probe,
        spin_probe,
        steal_pct,
    )
    from osm_pt_validator_spark.session import ensure_py_files, get_spark

    import __spark_entry__ as entry

    spark = get_spark("microbench-r3", cores=int(cpus))
    ensure_py_files(spark)
    spark.sparkContext.setLogLevel("ERROR")

    new_ops = [
        "polyfill_zones",
        "shared_segments_events",
        "trajectory_turns",
        "segment_intersections",
        "convex_hull_membership",
        "stop_geometry_order",
        "focal_heatmap",
        "pmi_collocations",
        "passage_windows",
        "blocklist_pages",
        "domain_link_graph",
        "diverse_sample",
        "weighted_sample",
        "hll_distinct_users",
        "cms_user_counts",
        "exact_mad",
        "events_cube",
        "transit_reach",
        "viterbi_match",
        "bpe_merges",
        "retention_cohorts",
        "od_flows_events",
        "time_weighted_avg",
        "jaccard_join",
    ]
    qs = entry.queries()
    spin_before = spin_probe()
    par_before = parallel_probe(int(cpus))
    t_cpu0 = cpu_times()
    results: dict[str, dict] = {}
    for name in new_ops:
        best, rows = None, 0
        for _ in range(2):
            t0 = time.monotonic()
            rows = qs[name](spark, sf).count()
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        results[name] = {"sec": round(best, 3), "rows": rows}
    spin_after = spin_probe()
    par_after = parallel_probe(int(cpus))
    steal = steal_pct(t_cpu0, cpu_times())
    print(
        json.dumps(
            {
                "metric": "round-3 new-operator microbench (best of 2)",
                "sf_dir": sf,
                "cpus": int(cpus),
                "value": round(sum(r["sec"] for r in results.values()), 3),
                "unit": "sec",
                "queries": results,
                "host": {
                    "spin_mops_before": spin_before,
                    "spin_mops_after": spin_after,
                    "par_mops_before": par_before,
                    "par_mops_after": par_after,
                    "steal_pct": steal,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
