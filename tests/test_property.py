"""Property-based tests (hypothesis) for the geometry-heavy operators
whose correctness is an invariant, not an example: compaction's exact
roundtrip and the radius join's candidate recall.

Spark round-trips are slow per example, so the Spark-backed properties
run few, highly-randomized examples; the pure parsers run many.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# -- pure parser: WARC scanner never loses a well-formed record --------------

_body = st.binary(min_size=0, max_size=200)
_url = st.from_regex(r"http://[a-z]{1,10}\.example/[a-z0-9]{0,8}", fullmatch=True)


@given(st.lists(st.tuples(_url, _body), min_size=0, max_size=8))
@settings(max_examples=60, deadline=None)
def test_warc_parser_roundtrip(records):
    from osm_pt_validator_spark.sources.warc import parse_warc_records

    buf = b"".join(
        (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Date: 2026-08-17T00:00:00Z\r\n"
            f"WARC-Target-URI: {u}\r\nContent-Length: {len(b)}\r\n\r\n"
        ).encode()
        + b
        + b"\r\n\r\n"
        for u, b in records
    )
    got = parse_warc_records(buf)
    # every record comes back, in order, with its exact block — even
    # when bodies contain CRLFs or the WARC/ magic itself
    assert [(f["warc-target-uri"], blk) for f, blk in got] == records


# -- compact/uncompact exact roundtrip ---------------------------------------

_cells = st.sets(
    st.tuples(st.integers(0, 31), st.integers(0, 31)).map(
        lambda ij: (ij[0] << 32) | ij[1]
    ),
    min_size=1,
    max_size=40,
)


@given(_cells)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_compact_roundtrip_property(spark, cells):
    from osm_pt_validator_spark.spatial.compact import (
        compact_cells,
        uncompact_cells,
    )

    df = spark.createDataFrame([(c,) for c in cells], "cell long")
    compacted = compact_cells(df, res=5, min_res=2)
    rows = compacted.collect()
    # no complete sibling quad survives above min_res
    by_res: dict[int, set[int]] = {}
    for r in rows:
        by_res.setdefault(r.res, set()).add(r.cell)
    for res, cs in by_res.items():
        if res <= 2:
            continue
        parents: dict[int, int] = {}
        for c in cs:
            p = (((c >> 33)) << 32) | ((c & 0xFFFFFFFF) >> 1)
            parents[p] = parents.get(p, 0) + 1
        assert all(n < 4 for n in parents.values()), (res, parents)
    # exact preimage
    back = {r.cell for r in uncompact_cells(compacted, res=5).collect()}
    assert back == cells


# -- radius join recall == brute force ---------------------------------------

_pts = st.lists(
    st.tuples(
        st.floats(-60.0, 84.5, allow_nan=False, allow_infinity=False),
        st.floats(-179.0, 179.0, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=12,
)


def _hav(lat1, lon1, lat2, lon2):
    r = math.radians
    a = (
        math.sin(r(lat2 - lat1) / 2) ** 2
        + math.cos(r(lat1)) * math.cos(r(lat2)) * math.sin(r(lon2 - lon1) / 2) ** 2
    )
    return 2.0 * 6371000.0 * math.asin(math.sqrt(a))


@given(_pts, _pts, st.sampled_from([500.0, 5000.0, 50000.0]))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_distance_join_recall_property(spark, left, right, d):
    from osm_pt_validator_spark.spatial.joins import distance_join

    ldf = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(left)],
        "lid long, lat double, lon double",
    )
    rdf = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(right)],
        "rid long, lat double, lon double",
    )
    got = {(r.lid, r.rid) for r in distance_join(ldf, rdf, d).collect()}
    want = {
        (i, j)
        for i, (la1, lo1) in enumerate(left)
        for j, (la2, lo2) in enumerate(right)
        if _hav(la1, lo1, la2, lo2) <= d
    }
    assert got == want
