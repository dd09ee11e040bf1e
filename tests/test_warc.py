"""WARC source: synthetic ISO 28500 archives -> canonical pages rows."""

from __future__ import annotations

import gzip
import os
from datetime import datetime

from osm_pt_validator_spark.sources.warc import (
    parse_warc_records,
    pages_from_warc,
    read_warc,
)


def _record(rtype: str, url: str | None, date: str, block: bytes) -> bytes:
    hdr = [f"WARC/1.0", f"WARC-Type: {rtype}", f"WARC-Date: {date}"]
    if url is not None:
        hdr.append(f"WARC-Target-URI: {url}")
    hdr.append(f"Content-Length: {len(block)}")
    return "\r\n".join(hdr).encode() + b"\r\n\r\n" + block + b"\r\n\r\n"


def _http(body: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    )


HTML_A = b"<html><p>STOP:7@55.95,-3.19 here</p><p>second</p></html>"
HTML_B = b"<html><p>plain page</p></html>"


def _archive() -> bytes:
    return (
        _record("warcinfo", None, "2026-08-17T00:00:00Z", b"software: test\r\n")
        + _record("request", "http://a.example/", "2026-08-17T01:02:03Z", b"GET / HTTP/1.1\r\n")
        + _record("response", "http://a.example/", "2026-08-17T01:02:03Z", _http(HTML_A))
        + _record("response", "http://b.example/x", "2026-08-17T02:00:00Z", _http(HTML_B))
    )


def test_parse_warc_records_pure():
    recs = parse_warc_records(_archive())
    assert [f["warc-type"] for f, _ in recs] == [
        "warcinfo", "request", "response", "response",
    ]
    assert recs[2][0]["warc-target-uri"] == "http://a.example/"
    assert recs[2][1].endswith(HTML_A)


def test_read_warc_plain_and_gzip(spark, tmp_path):
    plain = tmp_path / "a.warc"
    plain.write_bytes(_archive())
    # per-record gzip members concatenated, as .warc.gz ships
    gz = tmp_path / "b.warc.gz"
    gz.write_bytes(
        b"".join(gzip.compress(_record(
            "response", f"http://gz.example/{i}", "2026-08-17T03:00:00Z",
            _http(HTML_B),
        )) for i in range(2))
    )

    rows = {r.url: r for r in read_warc(spark, str(tmp_path)).collect()}
    assert set(rows) == {
        "http://a.example/", "http://b.example/x",
        "http://gz.example/0", "http://gz.example/1",
    }
    assert bytes(rows["http://a.example/"].html) == HTML_A
    assert rows["http://a.example/"].warc_ts == datetime(2026, 8, 17, 1, 2, 3)
    assert bytes(rows["http://gz.example/1"].html) == HTML_B


def test_pages_from_warc_text_invariant(spark, tmp_path):
    """G1 over WARC-ingested html is byte-identical to G1 over the
    same html from any other source (the north-rule invariant)."""
    (tmp_path / "c.warc").write_bytes(_archive())
    got = {
        r.url: r.text for r in pages_from_warc(spark, str(tmp_path)).collect()
    }
    assert got["http://a.example/"] == "STOP:7@55.95,-3.19 here\nsecond"
    assert got["http://b.example/x"] == "plain page"


def test_warc_to_heatmap_end_to_end(spark, tmp_path):
    """The full north-star path from raw archive bytes: WARC ->
    canonical pages -> G2 mention extraction -> kNN stop match ->
    failure-tile heatmap. Every stage is the production operator; only
    the input is synthetic."""
    from osm_pt_validator_spark.sources.pages import extract_mentions
    from osm_pt_validator_spark.spatial.knn import knn_join
    from osm_pt_validator_spark.spatial.tiles import failure_heatmap

    html = (
        b"<html><p>STOP:1@55.9500,-3.1900 and STOP:2@55.9510,-3.1890</p>"
        b"<p>ROUTE:77</p></html>"
    )
    rec = _record("response", "http://w.example/", "2026-08-17T04:00:00Z", _http(html))
    (tmp_path / "w.warc").write_bytes(rec)

    pages = pages_from_warc(spark, str(tmp_path))
    mentions = extract_mentions(pages).filter("kind = 'stop'")
    stops = spark.createDataFrame(
        [(10, 55.9501, -3.1901), (11, 55.9600, -3.2000)],
        "stop_id long, lat double, lon double",
    )
    matched = knn_join(
        mentions, stops, probe_key=["url", "mention_idx"],
        build_key="stop_id", k=1, ring=2, res=14,
    )
    got = {(r.entity_id, r.stop_id) for r in matched.collect()}
    assert got == {(1, 10), (2, 10)}  # both mentions nearest stop 10

    tiles = failure_heatmap(matched, z=12).collect()
    assert len(tiles) == 1 and tiles[0].n == 2
