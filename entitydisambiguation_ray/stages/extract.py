"""Stateless map_batches stages: HTML extraction and triple extraction.

Both are plain functions (stateless Ray tasks — cheap and elastic, per
SURVEY.md §7.2); the regex machinery they use is compiled once per worker
process at module import.  Batch format is pyarrow end-to-end (zero-copy from
the object store); the unavoidable per-document Python work (HTML parsing is
inherently per-string) happens over the batch's python string views with no
pandas round-trip.
"""
from __future__ import annotations

import pyarrow as pa

from ..functions.extract import extract_text
from ..functions.svo import extract_triples


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """pages(url, warc_ts, html, text, lang) → (url, warc_ts, lang, content).

    Drops the wide ``html``/``text`` columns immediately (project early —
    binary payloads must not travel through downstream shuffles).
    """
    content = [extract_text(h) for h in batch.column("html").to_pylist()]
    cols = {"url": batch.column("url")}
    # metadata columns pass through when present (a pruned read may supply
    # only url + html — the minimum the pipeline needs)
    for meta in ("warc_ts", "lang"):
        if meta in batch.column_names:
            cols[meta] = batch.column(meta)
    cols["content"] = pa.array(content, type=pa.string())
    return pa.table(cols)


def triples_batch(batch: pa.Table) -> pa.Table:
    """(url, content, ...) → triples (url, subj, pred, obj, sent_idx).

    Flat-map expressed as a map_batches (one input row → 0..n output rows)
    to stay vectorized at the batch level.
    """
    urls: list[str] = []
    subjs: list[str] = []
    preds: list[str] = []
    objs: list[str] = []
    sent_idxs: list[int] = []
    url_col = batch.column("url").to_pylist()
    content_col = batch.column("content").to_pylist()
    for url, content in zip(url_col, content_col):
        for subj, rel, obj, sent_idx in extract_triples(content):
            urls.append(url)
            subjs.append(subj)
            preds.append(rel)
            objs.append(obj)
            sent_idxs.append(sent_idx)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "subj": pa.array(subjs, type=pa.string()),
            "pred": pa.array(preds, type=pa.string()),
            "obj": pa.array(objs, type=pa.string()),
            "sent_idx": pa.array(sent_idxs, type=pa.int32()),
        }
    )
