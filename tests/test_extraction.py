"""G1/G2: byte-identical text extraction + mention parsing."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_pt_validator_spark.fixtures import node_coords, pages_df
from osm_pt_validator_spark.sources.pages import (
    extract_mentions,
    with_extracted_text,
)

SPECS = [(9001, [102, 104]), (9002, [100, 102, 105]), (9003, [])]


def test_text_extraction_byte_identical(spark):
    pages = pages_df(spark, SPECS)
    df = with_extracted_text(pages)
    rows = df.select("url", "text", "extracted_text").collect()
    assert len(rows) == 3
    for r in rows:
        assert r.extracted_text == r.text, r.url
        # byte-level, not just str equality
        assert r.extracted_text.encode("utf-8") == r.text.encode("utf-8")


def test_text_extraction_deterministic_across_runs(spark):
    pages = pages_df(spark, SPECS)
    a = {r.url: r.t for r in with_extracted_text(pages).select("url", F.col("extracted_text").alias("t")).collect()}
    b = {r.url: r.t for r in with_extracted_text(pages.repartition(7)).select("url", F.col("extracted_text").alias("t")).collect()}
    assert a == b


def test_mention_extraction(spark):
    pages = pages_df(spark, SPECS)
    m = extract_mentions(pages).orderBy("url", "mention_idx").collect()
    by_url: dict[str, list] = {}
    for r in m:
        by_url.setdefault(r.url, []).append(r)

    u1 = "https://transit.example.org/route/9001"
    got = by_url[u1]
    assert [(r.kind, r.entity_id) for r in got] == [
        ("route", 9001),
        ("stop", 102),
        ("stop", 104),
    ]
    # route mentions carry no coords; stop mentions carry rounded coords
    assert got[0].lat is None
    lat, lon = node_coords(102)
    assert abs(got[1].lat - round(lat, 4)) < 1e-9
    assert abs(got[1].lon - round(lon, 4)) < 1e-9
    # mention_idx is document order
    assert [r.mention_idx for r in got] == [0, 1, 2]
    # page with no stops: only the route mention
    assert len(by_url["https://transit.example.org/route/9003"]) == 1


def test_mentions_from_html_matches_stored_text(spark):
    pages = pages_df(spark, SPECS)
    a = sorted(
        (r.url, r.mention_idx, r.kind, r.entity_id)
        for r in extract_mentions(pages, from_html=False).collect()
    )
    b = sorted(
        (r.url, r.mention_idx, r.kind, r.entity_id)
        for r in extract_mentions(pages, from_html=True).collect()
    )
    assert a == b
