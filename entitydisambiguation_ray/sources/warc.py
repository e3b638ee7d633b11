"""WARC ingestion: raw Common-Crawl archives → the engine's page table.

The north star's input is "Common-Crawl-style Parquet pages" (input_hint
columns url / warc_ts / html / text / lang), but Common Crawl itself ships
WARC files (ISO 28500 — a public, self-describing record format: a
``WARC/1.x`` version line, CRLF-separated named headers including
``Content-Length``, a blank line, then exactly Content-Length payload
bytes, then two CRLFs).  This module converts WARC response records into
the input_hint table WITHOUT an external warc library:

- ``iter_warc_records(data)`` — pure-python record parser over one
  archive's bytes.  Handles plain concatenated records AND the
  per-record-gzip-member layout Common Crawl uses (each record its own
  gzip stream, concatenated — decompressed transparently by zlib's
  multi-member handling).
- ``warc_pages_batch`` — ``map_batches`` kernel over
  ``ray.data.read_binary_files`` rows: each archive parses in ONE task
  (archives are the natural partition unit — independently fetchable,
  independently retryable), emitting input_hint-schema rows.  HTTP
  response framing (status line + headers) is stripped so ``html`` holds
  the payload body only.
- ``read_warc_pages(paths)`` — the Dataset constructor:
  ``read_binary_files → map_batches(parse)``; the result feeds
  ``pipelines.kg.extract_stage`` unchanged (end-to-end pytest).

Scale shape: one task per archive file, no shuffle; a 100 TB crawl is
~100k archives, each a bounded independent parse.  Malformed records are
skipped with a counter (crawl archives contain truncated tails), never a
failed task.
"""
from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

PAGE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("ns")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the Common-Crawl layout:
    one member per record) into one plain byte string."""
    out = []
    d = zlib.decompressobj(wbits=31)
    rest = data
    while rest:
        out.append(d.decompress(rest))
        rest = d.unused_data
        if not d.eof:  # truncated trailing member: keep what we got
            break
        if rest:
            d = zlib.decompressobj(wbits=31)
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = \
                v.strip().decode("latin-1")
    return headers


def iter_warc_records(data: bytes):
    """Yield (headers: dict, payload: bytes) per WARC record.  Gzipped
    archives (magic 1f 8b) are decompressed first.  Malformed tails stop
    iteration silently (the caller counts records, not bytes)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # seek the version line
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(_CRLF2, start)
        if hdr_end < 0:
            return
        headers = _parse_headers(data[start:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + len(_CRLF2)
            continue
        body_start = hdr_end + len(_CRLF2)
        body_end = body_start + length
        if body_end > n:
            return  # truncated record
        yield headers, data[body_start:body_end]
        pos = body_end


def _strip_http_envelope(payload: bytes) -> bytes:
    """response records carry an HTTP message; the page body follows the
    first blank line.  Records without an HTTP status line pass through."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(_CRLF2)
        if sep >= 0:
            return payload[sep + len(_CRLF2):]
    return payload


def _warc_ts_to_ns(value: str) -> int | None:
    """WARC-Date (ISO-8601 'YYYY-MM-DDTHH:MM:SSZ') → epoch ns."""
    try:
        import datetime as dt

        ts = dt.datetime.fromisoformat(value.replace("Z", "+00:00"))
        return int(ts.timestamp() * 1_000_000_000)
    except ValueError:
        return None


def warc_pages_batch(batch: dict) -> pa.Table:
    """``read_binary_files`` batch {path, bytes} → input_hint page rows.

    Only ``response`` (and, leniently, ``resource``) records become pages;
    request/metadata/warcinfo records are skipped.  ``text``/``lang`` are
    emitted empty — they are DERIVED columns the extraction pipeline
    fills; a WARC carries only the raw capture."""
    import logging

    urls: list[str] = []
    tss: list[int | None] = []
    htmls: list[bytes] = []
    skipped = 0
    for blob in batch["bytes"]:
        try:
            records = iter_warc_records(bytes(blob))
            for headers, payload in records:
                rtype = headers.get("warc-type", "")
                if rtype not in ("response", "resource"):
                    continue
                url = headers.get("warc-target-uri")
                if not url:
                    skipped += 1
                    continue
                urls.append(url)
                tss.append(_warc_ts_to_ns(headers.get("warc-date", "")))
                htmls.append(_strip_http_envelope(payload))
        except zlib.error:
            skipped += 1  # undecodable archive member
    if skipped:
        logging.getLogger(__name__).warning(
            "warc parse skipped %d malformed records/members", skipped)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("ns")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array([""] * len(urls), pa.string()),
        "lang": pa.array([""] * len(urls), pa.string()),
    })


def read_warc_pages(paths, **read_kwargs):
    """WARC archive paths → input_hint page Dataset (one parse task per
    archive; no shuffle).  Feeds ``pipelines.kg.extract_stage`` /
    ``run_kg_pipeline`` directly."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True, **read_kwargs)
    return ds.map_batches(warc_pages_batch, batch_format="numpy",
                          zero_copy_batch=True)


def write_warc(path: str, pages: list[dict], gzip_members: bool = False):
    """Inverse (test fixture + export): page dicts (url, warc_ts, html) →
    a spec-conformant WARC file, optionally one gzip member per record
    (the Common-Crawl layout)."""
    import datetime as dt
    import gzip as _gzip
    import hashlib

    chunks = []
    for p in pages:
        ts = p.get("warc_ts")
        if hasattr(ts, "isoformat"):
            iso = ts.isoformat().split("+")[0].split(".")[0] + "Z"
        else:
            iso = dt.datetime(2024, 6, 1).isoformat() + "Z"
        body = p["html"] if isinstance(p["html"], bytes) \
            else str(p["html"]).encode()
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
        rid = hashlib.sha1(p["url"].encode()).hexdigest()
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"WARC-Date: {iso}\r\n"
            f"WARC-Target-URI: {p['url']}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        rec = hdr + http + b"\r\n\r\n"
        chunks.append(_gzip.compress(rec) if gzip_members else rec)
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
