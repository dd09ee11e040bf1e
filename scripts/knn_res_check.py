"""Recall check for the bench kNN legs' grid resolution.

knn_join's contract (spatial/knn.py) is exact top-k *given* that the
k-ring covers the k-th-neighbour distance; `res` only controls the
candidate volume. This script proves, for the bench dims at a given
sf_dir, that a finer resolution returns the SAME rows as the coarser
baseline (full sorted-tuple compare, k=1 and k=2), then times both.

    python scripts/knn_res_check.py [sf_dir] [res_a] [res_b]
"""

from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    res_a = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    res_b = int(sys.argv[3]) if len(sys.argv) > 3 else 14

    from osm_pt_validator_spark.session import get_spark
    from osm_pt_validator_spark.spatial.knn import knn_join

    import bench

    spark = get_spark("knn-res-check")
    spark.sparkContext.setLogLevel("ERROR")

    def run(res: int, k: int):
        c, s = bench._knn_dims(spark, sf)
        df = knn_join(
            c, s, probe_key="c_custkey", build_key="stop_id", k=k, ring=1, res=res
        ).select("c_custkey", "stop_id", "knn_rank")
        t0 = time.time()
        rows = df.collect()
        dt = time.time() - t0
        return sorted((r.c_custkey, r.stop_id, r.knn_rank) for r in rows), dt

    ok = True
    for k in (1, 2):
        a, ta = run(res_a, k)
        b, tb = run(res_b, k)
        same = a == b
        ok = ok and same
        print(
            f"k={k} res{res_a}={len(a)} rows {ta:.2f}s | "
            f"res{res_b}={len(b)} rows {tb:.2f}s | identical={same}",
            flush=True,
        )
        if not same:
            diff = set(a) ^ set(b)
            print(f"  first diffs: {sorted(diff)[:10]}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
