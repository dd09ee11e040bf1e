"""WARC source — ingest Common-Crawl-style web archives into the
engine's canonical pages table (url, warc_ts, html[, text]).

WARC (ISO 28500) is the public format Common Crawl ships: a
concatenation of records, each a ``WARC/1.x`` header block (CRLF
key: value lines, including WARC-Type / WARC-Target-URI / WARC-Date /
Content-Length), a blank line, then a Content-Length-sized block —
for ``response`` records an HTTP response whose body is the page.

Distribution model (the one real CC pipelines use): ONE ARCHIVE FILE
PER TASK. WARC has no record index, so a byte-range split cannot find
a record boundary without scanning; crawl archives are written as many
~1 GiB files precisely so file-granular parallelism saturates a
cluster. ``spark.read.format("binaryFile")`` gives (path, content)
rows; a single ``mapInPandas`` explodes each archive into page rows.
Per-record gzip members in ``.warc.gz`` concatenate, which stdlib
gzip decodes in one pass (multi-member streams are part of RFC 1952).

Everything here is stdlib parsing inside an Arrow batch iterator — no
external warc library (none in-container), no row-at-a-time UDF.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
    ]
)


def parse_warc_records(buf: bytes) -> list[tuple[dict, bytes]]:
    """All (header-fields, block) records in one WARC buffer.

    Tolerant scanner: records are located by the ``WARC/`` magic and
    consumed by Content-Length, so a malformed record skips forward to
    the next magic instead of poisoning the file.
    """
    out: list[tuple[dict, bytes]] = []
    pos = 0
    while True:
        idx = buf.find(b"WARC/", pos)
        if idx < 0:
            break
        hdr_end = buf.find(b"\r\n\r\n", idx)
        if hdr_end < 0:
            break
        fields: dict[str, str] = {}
        for line in buf[idx:hdr_end].decode("utf-8", "replace").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get("content-length", "0"))
        except ValueError:
            pos = hdr_end + 4
            continue
        block = buf[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        out.append((fields, block))
    return out


def _http_body(block: bytes) -> bytes:
    """Body of an HTTP response block (after the header terminator);
    the whole block when it is not HTTP-framed."""
    if block[:5] in (b"HTTP/",):
        sep = block.find(b"\r\n\r\n")
        if sep >= 0:
            return block[sep + 4 :]
    return block


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Pages table (url, warc_ts, html) from WARC file(s) at ``path``
    (glob ok; ``.gz`` members handled). Only ``response`` records
    become rows — warcinfo/request/metadata records are skipped, as is
    any response without a target URI."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def explode_archives(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                buf = bytes(content)
                if path_.endswith(".gz"):
                    buf = gzip.decompress(buf)
                for fields, block in parse_warc_records(buf):
                    if fields.get("warc-type") != "response":
                        continue
                    url = fields.get("warc-target-uri")
                    if not url:
                        continue
                    rows.append(
                        (url, fields.get("warc-date"), _http_body(block))
                    )
            if not rows:
                continue
            out = pd.DataFrame(rows, columns=["url", "warc_ts", "html"])
            out["warc_ts"] = pd.to_datetime(
                out["warc_ts"], utc=True, errors="coerce"
            ).dt.tz_localize(None)
            yield out

    return files.mapInPandas(explode_archives, schema=WARC_SCHEMA)


def pages_from_warc(spark: SparkSession, path: str) -> DataFrame:
    """Full canonical pages table: WARC responses + extracted text
    (G1, byte-identical per url — the north-rule invariant applies to
    WARC-ingested pages exactly as to parquet/Iceberg ones)."""
    from osm_pt_validator_spark.sources.pages import extract_text_udf

    return read_warc(spark, path).withColumn(
        "text", extract_text_udf(F.col("html"))
    )
