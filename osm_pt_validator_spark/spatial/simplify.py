"""Polyline simplification (Douglas-Peucker) over route geometries.

Route shapes assembled from OSM ways (stop_order.getAllNodesInOrder —
the reference's global node sequence, `pkg/validation/stop_order.go:
67-74`) carry every intermediate survey point; map rendering, corridor
PIP pre-filters, and shape-dedup fingerprints all want the simplified
ring. Douglas-Peucker keeps the minimal vertex subset whose maximum
perpendicular deviation from the original is <= epsilon.

Shape at scale: one polyline per row (ARRAY columns), simplified inside
an Arrow-batched `mapInPandas` — the recursion is per-polyline (numpy
deviation kernel per split, an explicit stack instead of recursion),
parallelism is across rows, and nothing shuffles: a pure map stage.
DP is not expressible as column algebra (each kept vertex depends on a
data-dependent recursive partition of the sequence), which puts it in
the same engine class as the frontier automaton (way_order.py) — Python
at the row level, numpy inside.

Determinism: planar equirectangular deviation in degrees^2 domain,
`>` comparisons only, ties keep the FIRST farthest vertex (argmax) —
identical output under any partitioning, replayed by the hand-derived
golden VALUES oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def dp_keep_mask(xs: np.ndarray, ys: np.ndarray, eps: float) -> np.ndarray:
    """Boolean keep-mask for one polyline. eps in coordinate units
    (degrees). Endpoints always kept; degenerate (anchor == head)
    segments fall back to point-to-point distance."""
    n = xs.shape[0]
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    eps2 = eps * eps
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ax, ay, bx, by = xs[a], ys[a], xs[b], ys[b]
        mx, my = xs[a + 1 : b], ys[a + 1 : b]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        if seg2 > 0.0:
            # perpendicular distance^2 via the cross product
            cross = (mx - ax) * dy - (my - ay) * dx
            d2 = cross * cross / seg2
        else:
            d2 = (mx - ax) ** 2 + (my - ay) ** 2
        i = int(np.argmax(d2))  # first max wins ties — deterministic
        if d2[i] > eps2:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep


def simplify_polylines(
    lines: DataFrame,
    eps_deg: float,
    line_id: str = "line_id",
    xs_col: str = "xs",
    ys_col: str = "ys",
) -> DataFrame:
    """(line_id, xs_col, ys_col) -> (line_id, n_in, n_out, xs_col,
    ys_col) with the Douglas-Peucker-kept vertices, order preserved.
    The id column keeps the caller's type (string shape ids are common)
    and the coordinate columns keep the caller's names. Pure map stage
    — zero shuffle; Arrow batches in and out."""
    from pyspark.sql import types as T

    id_type = lines.schema[line_id].dataType.simpleString()
    schema = T.StructType.fromDDL(
        f"{line_id} {id_type}, n_in int, n_out int, "
        f"{xs_col} array<double>, {ys_col} array<double>"
    )

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for r in pdf.itertuples(index=False):
                xs = np.asarray(getattr(r, xs_col), dtype=np.float64)
                ys = np.asarray(getattr(r, ys_col), dtype=np.float64)
                m = dp_keep_mask(xs, ys, eps_deg)
                out.append(
                    (
                        getattr(r, line_id),
                        int(xs.shape[0]),
                        int(m.sum()),
                        xs[m].tolist(),
                        ys[m].tolist(),
                    )
                )
            yield pd.DataFrame(
                out, columns=[line_id, "n_in", "n_out", xs_col, ys_col]
            )

    return lines.select(line_id, xs_col, ys_col).mapInPandas(run, schema=schema)
