"""hostprobe unit tests — pure python (no SparkSession): probe
arithmetic and the plan-fingerprint regex against canned formatted
plans."""

from __future__ import annotations

import re

from osm_pt_validator_spark.hostprobe import (
    _NODE_CLASSES,
    cpu_times,
    spin_probe,
    steal_pct,
)

_CANNED_PLAN = """== Physical Plan ==
AdaptiveSparkPlan (9)
+- Window (8)
   +- WindowGroupLimit (7)
      +- Sort (6)
         +- Exchange (5)
            +- WindowGroupLimit (4)
               +- Sort (3)
                  +- SortMergeJoin Inner (2)
                     +- Scan parquet  (1)

(1) Scan parquet
Output [2]: [doc_id#0L, text#1]

(2) SortMergeJoin
Left keys [1]: [fp#2]

(3) Sort
Input [3]: [fp#2]

(4) WindowGroupLimit
Input: x

(5) Exchange
Input [3]: [fp#2]

(6) Sort
Input: y

(7) WindowGroupLimit
Input: z

(8) Window
Input: w

(9) AdaptiveSparkPlan
"""


def _fp_from_string(s: str) -> dict[str, int]:
    fp = {}
    for name, pat in _NODE_CLASSES:
        n = len(re.findall(rf"^\(\d+\) {pat}", s, re.M))
        if n:
            fp[name] = n
    return fp


def test_fingerprint_distinguishes_sort_and_window_variants():
    fp = _fp_from_string(_CANNED_PLAN)
    # SortMergeJoin must NOT be counted as a Sort; WindowGroupLimit must
    # NOT be counted as a Window
    assert fp["sorts"] == 2
    assert fp["sort_merge_joins"] == 1
    assert fp["windows"] == 1
    assert fp["window_group_limits"] == 2
    assert fp["exchanges"] == 1
    assert fp["scans"] == 1


def test_steal_pct_arithmetic():
    t0 = {"user": 100, "system": 10, "idle": 800, "steal": 10}
    t1 = {"user": 160, "system": 20, "idle": 880, "steal": 40}
    # delta: total 180, steal 30 -> 16.67%
    assert steal_pct(t0, t1) == 16.67
    assert steal_pct(None, t1) is None
    assert steal_pct(t0, t0) is None  # zero-width window


def test_cpu_times_reads_proc_stat():
    t = cpu_times()
    assert t is not None and t["user"] > 0 and "steal" in t


def test_spin_probe_positive_and_bounded_duration():
    import time

    t0 = time.perf_counter()
    v = spin_probe(0.2)
    dt = time.perf_counter() - t0
    assert v > 0
    assert dt < 2.0
