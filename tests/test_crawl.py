"""Crawl-level curation (operators/crawl.py) + repetition filters
(operators/text.py): recrawl collapse, change detection, url
normalization, domain rollups, Gopher-style repetition stats."""

import datetime

import pytest
from pyspark.sql import functions as F

from osm_pt_validator_spark.operators.crawl import (
    changed_pages,
    domain_stats,
    latest_crawl,
    normalize_url,
    url_domain,
)
from osm_pt_validator_spark.operators.text import (
    dup_line_fraction,
    dup_token_fraction,
    repetition_filter,
    repetition_stats,
)


def _ts(h):
    return datetime.datetime(2024, 1, 1, h, 0, 0)


@pytest.fixture()
def pages(spark):
    rows = [
        # url A: three crawls, text changed on the last one
        ("https://a.example.org/x", _ts(1), "one", "en"),
        ("https://a.example.org/x", _ts(2), "one", "en"),
        ("https://a.example.org/x", _ts(3), "two", "en"),
        # url B: two crawls, unchanged
        ("https://b.example.org/y", _ts(1), "same", "de"),
        ("https://b.example.org/y", _ts(2), "same", "de"),
        # url C: single crawl
        ("https://a.example.org/z", _ts(5), "only", "en"),
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, lang string"
    )


def test_latest_crawl_keeps_newest_per_url(pages):
    got = {
        r["url"]: (r["warc_ts"], r["text"])
        for r in latest_crawl(pages).collect()
    }
    assert got == {
        "https://a.example.org/x": (_ts(3), "two"),
        "https://b.example.org/y": (_ts(2), "same"),
        "https://a.example.org/z": (_ts(5), "only"),
    }


def test_latest_crawl_tie_breaks_on_text_hash(spark):
    # identical warc_ts: the md5(text)-smaller row wins, so the result
    # is deterministic under any partitioning
    df = spark.createDataFrame(
        [("u", _ts(1), "aaa", "en"), ("u", _ts(1), "bbb", "en")],
        "url string, warc_ts timestamp, text string, lang string",
    )
    import hashlib

    expect = min("aaa", "bbb", key=lambda t: hashlib.md5(t.encode()).hexdigest())
    assert latest_crawl(df).collect()[0]["text"] == expect


def test_changed_pages(pages):
    got = {r["url"]: r for r in changed_pages(pages).collect()}
    # single-crawl url C excluded entirely
    assert set(got) == {"https://a.example.org/x", "https://b.example.org/y"}
    a = got["https://a.example.org/x"]
    assert (a["warc_ts"], a["prev_ts"], a["changed"]) == (_ts(3), _ts(2), True)
    b = got["https://b.example.org/y"]
    assert (b["warc_ts"], b["prev_ts"], b["changed"]) == (_ts(2), _ts(1), False)


def test_normalize_url(spark):
    cases = [
        ("HTTPS://WWW.Example.ORG:443/Path/?q=UPPER#frag",
         "https://example.org/Path/?q=UPPER"),
        ("http://example.org:80/", "http://example.org"),
        ("http://example.org:8080/a", "http://example.org:8080/a"),
        ("https://www.example.org", "https://example.org"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(normalize_url(F.col("url"))).collect()]
    assert got == [want for _, want in cases]


def test_url_domain(spark):
    df = spark.createDataFrame(
        [("https://WWW.Host7.Example.org:8443/p/1",), ("not a url",)],
        "url string",
    )
    got = [r[0] for r in df.select(url_domain(F.col("url"))).collect()]
    assert got == ["host7.example.org", ""]


def test_domain_stats(pages):
    got = {r["domain"]: r for r in domain_stats(pages).collect()}
    a = got["a.example.org"]
    assert (a["n_pages"], a["n_urls"], a["n_langs"]) == (4, 2, 1)
    assert a["total_chars"] == len("one") * 2 + len("two") + len("only")
    b = got["b.example.org"]
    assert (b["n_pages"], b["n_urls"], b["n_langs"]) == (2, 1, 1)


def test_dup_fractions(spark):
    df = spark.createDataFrame(
        [
            (1, "a b\na b\nc d"),      # 3 lines, 2 distinct
            (2, "x y z"),               # no repeats
            (3, ""),                    # degenerate
            (4, "spam spam spam spam"),  # 4 tokens 1 distinct
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["dl"], r["dt"])
        for r in df.select(
            "doc_id",
            dup_line_fraction(F.col("text")).alias("dl"),
            dup_token_fraction(F.col("text")).alias("dt"),
        ).collect()
    }
    assert got[1][0] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert got[2] == (0.0, 0.0)
    assert got[3] == (0.0, 0.0)
    assert got[4][1] == 0.75


def test_repetition_stats_and_filter(spark):
    df = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now"),   # top bigram heavy
            (2, "the quick brown fox jumps over a lazy dog"),
            (3, "one two"),                            # single bigram
            (4, "solo"),                               # no bigram at all
        ],
        "doc_id long, text string",
    )
    stats = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    # doc 1 bigrams: [buy now, now buy]*: 'buy now' x4 of 7 total
    assert stats[1]["top_bigram_frac"] == pytest.approx(4 / 7, abs=1e-6)
    assert stats[2]["top_bigram_frac"] == pytest.approx(1 / 8, abs=1e-6)
    assert stats[3]["top_bigram_frac"] == 1.0
    assert stats[4]["top_bigram_frac"] == 0.0

    kept = sorted(
        r["doc_id"] for r in repetition_filter(df, max_top_bigram_frac=0.2).collect()
    )
    # doc 3's only bigram is 100% "top" but it's also token-duplicate-free;
    # the bigram rule still drops it — the documented contract
    assert kept == [2, 4]


def test_scrub_pii(spark):
    from osm_pt_validator_spark.operators.text import scrub_documents

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.co.uk or call +44 (0)20 7946-0958 now"),
            (2, "server at 192.168.0.1 served nothing personal"),
            (3, "clean text"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in scrub_documents(df).collect()}
    assert got[1]["scrubbed_text"] == "mail <EMAIL> or call <PHONE> now"
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ipv4"]) == (1, 1, 0)
    assert got[2]["scrubbed_text"] == "server at <IPV4> served nothing personal"
    assert got[2]["n_ipv4"] == 1
    assert got[3]["scrubbed_text"] == "clean text"
    assert (got[3]["n_email"], got[3]["n_phone"], got[3]["n_ipv4"]) == (0, 0, 0)


def test_snapshot_upsert_merge_semantics(spark):
    import datetime

    from osm_pt_validator_spark.operators.crawl import snapshot_upsert

    def t(m):
        return datetime.datetime(2024, 1, 1, 0, m)

    snap = spark.createDataFrame(
        [(1, t(5), 10), (2, t(5), 20), (4, t(5), 40)],
        "user_id long, ts timestamp, event_id long",
    )
    batch = spark.createDataFrame(
        [
            (1, t(6), 11),   # newer -> updated
            (3, t(4), 30),   # new key -> inserted
            (4, t(5), 41),   # equal ts -> batch wins (MERGE semantics)
            (5, t(5), 50),   # batch-internal dup, no snapshot row:
            (5, t(5), 51),   #   tiebreak keeps the max event_id
        ],
        "user_id long, ts timestamp, event_id long",
    )
    out = snapshot_upsert(snap, batch, ["user_id"], "ts", ["event_id"])
    got = {r["user_id"]: (r["event_id"], r["op"]) for r in out.collect()}
    assert got == {
        1: (11, "updated"),
        2: (20, "kept"),
        3: (30, "inserted"),
        4: (41, "updated"),
        5: (51, "inserted"),
    }
    # exactly one row per key, op never null
    assert out.count() == 5


def test_snapshot_upsert_single_exchange(spark):
    import datetime

    from osm_pt_validator_spark.operators.crawl import snapshot_upsert

    t0 = datetime.datetime(2024, 1, 1)
    snap = spark.createDataFrame([(1, t0, 1)], "user_id long, ts timestamp, event_id long")
    batch = spark.createDataFrame([(1, t0, 2)], "user_id long, ts timestamp, event_id long")
    plan = snapshot_upsert(snap, batch, ["user_id"], "ts", ["event_id"])._jdf.queryExecution().executedPlan().toString()
    # both windows share the key partitioning -> ONE shuffle, and the
    # union form never plans a join
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_blocklist_filter_suffix_semantics_both_modes(spark):
    from osm_pt_validator_spark.operators.crawl import blocklist_filter

    pages = spark.createDataFrame(
        [
            (1, "https://a.spam.example/x"),  # blocked via parent suffix
            (2, "https://spam.example/y"),  # blocked exactly
            (3, "https://notspam.example/z"),  # label boundary: kept
            (4, "https://www.ok.example:8080/w"),  # www+port stripped, kept
            (5, "http://deep.a.spam.example/u"),  # two levels down: blocked
            (6, "not a url at all"),  # no host -> kept (nothing to match)
        ],
        "id long, url string",
    )
    blocked = spark.createDataFrame([("spam.example",)], "domain string")
    for mode in ("broadcast", "join"):
        got = sorted(r.id for r in blocklist_filter(pages, blocked, mode=mode).collect())
        assert got == [3, 4, 6], mode
    # empty blocklist keeps everything (broadcast path: empty set row)
    empty = spark.createDataFrame([], "domain string")
    assert blocklist_filter(pages, empty).count() == 6


def test_blocklist_filter_broadcast_is_shuffle_free(spark):
    from osm_pt_validator_spark.operators.crawl import blocklist_filter

    pages = spark.createDataFrame([(1, "https://x.example/a")], "id long, url string")
    blocked = spark.createDataFrame([("spam.example",)], "domain string")
    plan = (
        blocklist_filter(pages, blocked)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus side must not shuffle: only the 1-row blocklist
    # aggregate exchanges (its partial/final agg pair)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    corpus_side = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in corpus_side


def test_extract_links_and_domain_graph(spark):
    from osm_pt_validator_spark.operators.crawl import (
        domain_link_graph,
        extract_links,
    )

    pages = spark.createDataFrame(
        [
            (
                "https://a.example/p",
                bytearray(
                    b'<p>x</p><a href="https://b.example/q">1</a>'
                    b'<a href="/rel">2</a><a href="https://a.example/self">3</a>'
                ),
            ),
            (
                "https://b.example/r",
                bytearray(
                    b'<a href="https://a.example/z">1</a>'
                    b'<a href="https://a.example/z2">2</a>'
                ),
            ),
            ("https://c.example/none", bytearray(b"<p>no links</p>")),
        ],
        "url string, html binary",
    )
    links = extract_links(pages).collect()
    # document order preserved per page
    a_links = sorted(
        (r.link_idx, r.href) for r in links if r.url == "https://a.example/p"
    )
    assert a_links == [
        (0, "https://b.example/q"),
        (1, "/rel"),
        (2, "https://a.example/self"),
    ]
    graph = {
        (r.src_domain, r.dst_domain): r.n_links
        for r in domain_link_graph(pages).collect()
    }
    # relative href ('' domain) and the self-loop are dropped
    assert graph == {("a.example", "b.example"): 1, ("b.example", "a.example"): 2}
    # map-only: extract_links must not shuffle
    plan = extract_links(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_blocklist_modes_agree_on_null_and_hostless_urls(spark):
    from osm_pt_validator_spark.operators.crawl import blocklist_filter

    pages = spark.createDataFrame(
        [(1, "https://ok.example/x"), (2, None), (3, "not a url")],
        "id long, url string",
    )
    blocked = spark.createDataFrame([("spam.example",)], "domain string")
    got = {
        mode: sorted(
            r.id for r in blocklist_filter(pages, blocked, mode=mode).collect()
        )
        for mode in ("broadcast", "join")
    }
    # nothing to match => kept, and the two physical modes agree
    assert got["broadcast"] == got["join"] == [1, 2, 3]
