"""WARC source: Common-Crawl-style archives -> the pages table.

The production corpus for this pipeline ships as WARC (ISO 28500)
response records — each record a block of WARC headers, an HTTP
response (status line, headers, HTML body), and a blank-line trailer.
This module reads them into the BASELINE.json input schema
(url, warc_ts, html, text, lang) with no external WARC library (the
image has none): a small, strict parser over the public record format.

Spark shape: ``spark.read.format("binaryFile")`` lists the archive
files (one task per file — WARC is a concatenation of records, and
Common Crawl ships ~1 GB member-gzipped files, a natural task size),
then one mapInPandas stage parses records, derives text from the html
body (operators.html.extract_text — byte-identity invariant preserved)
and fills lang via the n-gram language-ID. Everything downstream of the
scan is the ordinary pages pipeline.

Scale notes: file-granular parallelism matches how Common Crawl is
published (segments of ~1 GB .warc.gz); no shuffle is introduced — the
parse is map-only. Decompression is STREAMED record-by-record
(parse_warc_stream) and records leave the task in bounded Arrow chunks,
so task memory is ~compressed blob + one record, never the 3-5x-larger
decompressed archive. For pathological single-file inputs, split
upstream (the record format is not block-splittable when member-gzipped).
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"

# hard cap on a single WARC header line: real headers are well under
# 1 KB; anything longer is a corrupt stream trying to flow through
# readline, which must never buffer unbounded bytes
_MAX_HEADER_LINE = 64 * 1024

RAW_WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
    ]
)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
    return headers


def parse_warc_stream(f) -> Iterator[dict]:
    """Yield {url, warc_ts, html} for every WARC *response* record read
    INCREMENTALLY from a binary file-like of uncompressed WARC bytes.

    Streaming is the point: headers come via bounded ``readline`` calls
    and each body via one ``read(Content-Length)``, so peak memory is
    ~one record — never the decompressed archive (a ~1 GB member-gzipped
    Common Crawl file inflates to several GB; with 16 concurrent tasks a
    whole-blob ``gzip.decompress`` would pressure any real executor).

    Strict on the parts that carry data (Content-Length framing), lenient
    on the rest: non-response records (warcinfo, request, metadata) are
    skipped; a record with a malformed HTTP payload yields its raw
    payload as html rather than being dropped silently. A record
    truncated by EOF (header cut short, or body shorter than its
    Content-Length) is DROPPED — its framing is gone, so anything parsed
    from it would be garbage. Header lines are read with a hard size cap
    so a corrupt payload bleeding into header position cannot buffer
    unbounded bytes through ``readline`` (real WARC headers are < 1 KB).
    """
    while True:
        # skip inter-record blank-line trailers
        line = f.readline(_MAX_HEADER_LINE)
        while line in (b"\r\n", b"\n"):
            line = f.readline(_MAX_HEADER_LINE)
        if not line:
            return  # EOF
        if not line.startswith(b"WARC/"):
            raise ValueError(f"not a WARC record: {line[:40]!r}")
        head = [line]
        truncated = False
        while True:
            line = f.readline(_MAX_HEADER_LINE)
            if line in (b"\r\n", b"\n"):
                break
            if line == b"":
                truncated = True  # EOF inside the header block
                break
            if len(line) >= _MAX_HEADER_LINE and not line.endswith(b"\n"):
                raise ValueError(
                    f"WARC header line exceeds {_MAX_HEADER_LINE} bytes "
                    "(corrupt or non-WARC stream)"
                )
            head.append(line)
        if truncated:
            return  # drop the tail record: its framing is unrecoverable
        headers = _parse_headers(b"".join(head))
        length = int(headers.get("content-length", "0"))
        body = f.read(length)
        if len(body) < length:
            return  # truncated body at EOF: drop, framing is gone
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date", "")
        try:
            ts = dt.datetime.fromisoformat(ts_raw.replace("Z", "+00:00"))
        except ValueError:
            ts = None
        # payload = HTTP response; body follows the first blank line
        http_sep = body.find(_CRLF + _CRLF)
        html = body[http_sep + 4:] if (
            http_sep >= 0 and body[:5] == b"HTTP/"
        ) else body
        yield {"url": url, "warc_ts": ts, "html": html}


def parse_warc_bytes(blob: bytes) -> Iterator[dict]:
    """Streaming record iterator over an in-memory (possibly gzipped)
    WARC blob. Gzip archives are decompressed INCREMENTALLY through
    ``gzip.GzipFile`` — which transparently walks concatenated members,
    exactly how Common Crawl packages ~1 GB .warc.gz segments (one gzip
    member per record) — so decompressed bytes never accumulate beyond
    the record in flight. The compressed blob itself is whatever the
    caller holds (binaryFile hands us the file's bytes; that is the
    source's granularity, not this parser's)."""
    raw = io.BytesIO(blob)
    if bytes(blob[:2]) == b"\x1f\x8b":  # gzip magic (any member layout)
        with gzip.GzipFile(fileobj=raw) as gz:
            yield from parse_warc_stream(gz)
    else:
        yield from parse_warc_stream(raw)


def read_warc_raw(spark: SparkSession, path: str,
                  records_per_batch: int = 1000) -> DataFrame:
    """WARC file glob -> (url, warc_ts, html): binaryFile listing + one
    map-only parse stage (one task per archive file).

    Records stream out in ``records_per_batch`` Arrow chunks as the
    archive decompresses, so task memory is bounded by the COMPRESSED
    blob (binaryFile's granularity) + one output chunk — never the whole
    decompressed archive (3-5x larger on real Common Crawl segments)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    cols = ["url", "warc_ts", "html"]

    def run(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                chunk: list[dict] = []
                for rec in parse_warc_bytes(blob):
                    chunk.append(rec)
                    if len(chunk) >= records_per_batch:
                        yield pd.DataFrame(chunk, columns=cols)
                        chunk = []
                if chunk:
                    yield pd.DataFrame(chunk, columns=cols)

    return files.select("content").mapInPandas(run, schema=RAW_WARC_SCHEMA)


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC archives -> the full pages schema
    (url, warc_ts, html, text, lang): text extracted from the html body
    (byte-identity invariant), lang filled by the n-gram language-ID."""
    from prose_spark.operators.html import html_to_text
    from prose_spark.operators.textstats import detect_language

    raw = read_warc_raw(spark, path)
    with_text = raw.withColumn("text", html_to_text(F.col("html")))
    return with_text.withColumn(
        "lang", detect_language(F.col("text"))["lang_pred"]
    ).select("url", "warc_ts", "html", "text", "lang")


# -- synthetic archive writer (test fixture; deterministic) ----------------

def write_warc(rows, path: str, compress: bool | None = None,
               member_gzip: bool = False) -> None:
    """Serialize (url, warc_ts, html) rows as a WARC file — the test
    fixture twin of parse_warc_bytes (round-trip asserted in pytest).
    ``compress=None`` infers from a .gz suffix. ``member_gzip=True``
    writes ONE GZIP MEMBER PER RECORD (how Common Crawl packages
    .warc.gz segments) — the reader must walk concatenated members."""
    if compress is None:
        compress = path.endswith(".gz")
    if member_gzip:
        with open(path, "wb") as f:
            for row in rows:
                buf = io.BytesIO()
                _write_one(buf, *row)
                f.write(gzip.compress(buf.getvalue(), mtime=0))
        return
    buf = io.BytesIO()
    for url, ts, html in rows:
        _write_one(buf, url, ts, html)
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data, mtime=0)
    with open(path, "wb") as f:
        f.write(data)


def _write_one(buf, url, ts, html) -> None:
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Length: " + str(len(html)).encode() + _CRLF + _CRLF
        + html
    )
    ts_str = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + ts_str.encode() + _CRLF
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
    )
    buf.write(head + _CRLF + http + _CRLF + _CRLF)
