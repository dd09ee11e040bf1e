"""Host-window telemetry for benchmark self-evidencing.

The sandbox host is a multi-tenant guest whose deliverable CPU swings
~2x between minutes (BASELINE.md). A bare wall-clock number therefore
cannot distinguish an engine regression from a bad host window — so
every emitted benchmark JSON carries:

  * a single-thread SPIN PROBE (ops/sec of a fixed float loop) sampled
    before and after the suite — the host-capacity yardstick; identical
    code across rounds, so probe ratios compare across records;
  * /proc/stat STEAL%% over the measured window — hypervisor-withheld
    cycles, the direct multi-tenancy signal;
  * per-query PLAN FINGERPRINTS (operator-class counts of the initial
    physical plan) — proof that a slower number ran the SAME plan, not
    a regressed one.
"""

from __future__ import annotations

import re
import time


def spin_probe(seconds: float = 1.5) -> float:
    """Single-thread float-loop throughput in Mops/sec. The workload is
    fixed, so values are comparable across runs and rounds on the same
    host class (this sandbox: ~good windows cluster high, degraded
    windows drop 25-45%)."""
    t0 = time.perf_counter()
    n = 0
    x = 1.0
    while time.perf_counter() - t0 < seconds:
        for _ in range(10_000):
            x = x * 1.0000001 + 1.0
        n += 10_000
    dt = time.perf_counter() - t0
    return round(n / dt / 1e6, 3)


def parallel_probe(nproc: int, seconds: float = 1.5) -> float:
    """Aggregate Mops/sec of `nproc` SIMULTANEOUS single-thread
    spinners — the multi-core capacity yardstick. Needed because the
    single-thread probe cannot see N-way capping: this sandbox host
    delivers a steady ~27 Mops to one thread while its 32-way
    deliverable capacity swings ~2x between minutes (measured round 3:
    identical plans, flat 1-thread probe, 4x swing on a 32-way Arrow
    stage)."""
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    q: "mp.Queue[float]" = ctx.Queue()

    def _w(q):
        q.put(spin_probe(seconds))

    ps = [ctx.Process(target=_w, args=(q,)) for _ in range(nproc)]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return round(sum(vals), 3)


def cpu_times() -> dict[str, int] | None:
    """Aggregate /proc/stat cpu line as named jiffy counters."""
    fields = (
        "user nice system idle iowait irq softirq steal guest guest_nice".split()
    )
    try:
        with open("/proc/stat") as f:
            for line in f:
                if line.startswith("cpu "):
                    vals = [int(v) for v in line.split()[1:]]
                    return dict(zip(fields, vals))
    except OSError:  # pragma: no cover - non-Linux
        return None
    return None


def steal_pct(t0: dict[str, int] | None, t1: dict[str, int] | None) -> float | None:
    """%% of jiffies the hypervisor withheld between two cpu_times()
    samples — double digits means a degraded multi-tenant window."""
    if not t0 or not t1:
        return None
    total = sum(t1.values()) - sum(t0.values())
    if total <= 0:
        return None
    return round(100.0 * (t1.get("steal", 0) - t0.get("steal", 0)) / total, 2)


_NODE_CLASSES = (
    ("scans", r"Scan parquet"),
    ("exchanges", r"Exchange"),
    ("sorts", r"Sort\b(?!MergeJoin)"),
    ("sort_merge_joins", r"SortMergeJoin"),
    ("shuffled_hash_joins", r"ShuffledHashJoin"),
    ("broadcast_hash_joins", r"BroadcastHashJoin"),
    ("broadcast_nested_loops", r"BroadcastNestedLoopJoin"),
    ("cartesian", r"CartesianProduct"),
    ("windows", r"Window\b(?!GroupLimit)"),
    ("window_group_limits", r"WindowGroupLimit"),
    ("python_arrow", r"(MapInPandas|FlatMapGroupsInPandas|ArrowEvalPython)"),
)


def plan_fingerprint(df) -> dict[str, int]:
    """Operator-class counts of the INITIAL physical plan (pre-AQE —
    AQE may still convert SMJ->SHJ at runtime, which only improves on
    this fingerprint). Stable across hosts; changes only when the plan
    itself changes."""
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    fp = {}
    for name, pat in _NODE_CLASSES:
        n = len(re.findall(rf"^\(\d+\) {pat}", s, re.M))
        if n:
            fp[name] = n
    return fp
