"""Phase-level scaling profile of the validation leg.

The round-4 stable scaling pair showed extract at E=1.04 but
validation at E=0.60 (2 -> 8 cores) in the SAME calm window — a
structural, not host, effect. This pins a fresh JVM to N cores (like
scaling_bench) and times the leg's phases as separate actions to
localize which stage refuses to parallelize.

    python scripts/profile_validation.py <cores> [n_rels]

Prints one JSON line with per-phase seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    cores = int(sys.argv[1])
    n_rels = int(sys.argv[2]) if len(sys.argv) > 2 else 900_000
    os.sched_setaffinity(0, range(cores))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")

    from pyspark.sql import functions as F

    import bench
    from osm_pt_validator_spark.config import ValidationConfig
    from osm_pt_validator_spark.session import ensure_py_files, get_spark

    bench._N_RELS = n_rels
    spark = get_spark(f"profile-val-{cores}", cores=cores, shuffle_partitions=64)
    ensure_py_files(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).select(F.sum("id")).collect()

    # warmup at 1/8 (same as scaling_bench)
    bench._N_RELS = max(n_rels // 8, 10_000)
    bench.bench_validation(spark, "")
    bench._N_RELS = n_rels

    from osm_pt_validator_spark.functions.elements import is_ptv2
    from osm_pt_validator_spark.operators.pipeline import explode_members
    from osm_pt_validator_spark.operators.node_checks import (
        missing_node_errors,
        validate_relation_nodes,
    )
    from osm_pt_validator_spark.operators.set_stages import set_based_verdicts
    from osm_pt_validator_spark.operators.way_order import (
        route_detail,
        validate_way_and_stop_order,
    )

    cfg = ValidationConfig()
    t: dict[str, float] = {}

    def timed(name, thunk):
        t0 = time.time()
        out = thunk()
        t[name] = round(time.time() - t0, 2)
        return out

    nodes, ways, relations = bench._synth_osm(spark)
    timed("synth_count", lambda: (relations.count(), ways.count(), nodes.count()))
    timed("vset", lambda: set_based_verdicts(relations, cfg).count())
    members = explode_members(relations.filter(is_ptv2(F.col("tags"))))
    timed("members_explode", lambda: members.count())
    timed("node_errors", lambda: missing_node_errors(members, nodes).count())
    timed("v3_nodes", lambda: validate_relation_nodes(members, nodes, cfg.naptan_platform_tags).count())
    detail = route_detail(members, ways)
    timed("route_detail", lambda: detail.count())
    grouped = detail.groupBy("relation_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct("member_idx", "kind", "ref", "nodes", "oneway", "ignore_oneway")
            )
        ).alias("ms")
    )
    timed("grouped_agg", lambda: grouped.count())
    timed("v456_full", lambda: validate_way_and_stop_order(members, ways).count())
    timed("end_to_end", lambda: bench.bench_validation(spark, ""))

    print(json.dumps({"cores": cores, "n_rels": n_rels, "phases": t}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
