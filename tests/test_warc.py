"""WARC ingestion (sources/warc.py): spec-conformant parse, Common-Crawl
per-record-gzip layout, HTTP envelope stripping, malformed-tail tolerance,
and end-to-end equivalence with the direct page-table pipeline."""
import numpy as np
import pandas as pd
import pytest

from entitydisambiguation_ray.sources.warc import (
    iter_warc_records,
    read_warc_pages,
    write_warc,
)


def _sample_pages(n=40, seed=11):
    """Deterministic pages via the engine's own synthetic corpus."""
    import pyarrow as pa

    from entitydisambiguation_ray.sources.pages import make_pages_batch

    t = make_pages_batch(np.arange(n), seed=seed)
    t = pa.table(t) if isinstance(t, dict) else t
    df = t.to_pandas()
    return [{"url": r.url, "warc_ts": pd.Timestamp("2024-06-01 12:00:00"),
             "html": (r.html if isinstance(r.html, bytes)
                      else str(r.html).encode())}
            for r in df.itertuples()]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(tmp_path, gz):
    pages = _sample_pages(25)
    p = str(tmp_path / ("x.warc.gz" if gz else "x.warc"))
    write_warc(p, pages, gzip_members=gz)
    with open(p, "rb") as f:
        recs = list(iter_warc_records(f.read()))
    assert len(recs) == 25
    for (hdr, payload), page in zip(recs, pages):
        assert hdr["warc-type"] == "response"
        assert hdr["warc-target-uri"] == page["url"]
        assert payload.startswith(b"HTTP/1.1 200 OK")
        assert payload.endswith(page["html"])


def test_warc_truncated_tail_and_garbage(tmp_path):
    pages = _sample_pages(5)
    p = str(tmp_path / "t.warc")
    write_warc(p, pages)
    raw = open(p, "rb").read()
    # truncate mid-record: parser must yield only complete records
    cut = raw[: int(len(raw) * 0.65)]
    n_complete = len(list(iter_warc_records(cut)))
    assert 0 < n_complete < 5
    # leading garbage before the first version line is skipped
    assert len(list(iter_warc_records(b"garbage\r\n" + raw))) == 5


def test_warc_non_response_records_skipped(tmp_path, ray_session):
    import pyarrow as pa

    from entitydisambiguation_ray.sources.warc import warc_pages_batch

    pages = _sample_pages(3)
    p = str(tmp_path / "m.warc")
    write_warc(p, pages)
    raw = open(p, "rb").read()
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: http://x/\r\n"
           b"WARC-Date: 2024-06-01T00:00:00Z\r\n"
           b"Content-Length: 2\r\n\r\nhi\r\n\r\n")
    out = warc_pages_batch({"path": np.array([p]),
                            "bytes": np.array([req + raw], dtype=object)})
    assert out.num_rows == 3  # request record skipped
    assert out.column("url").to_pylist() == [pg["url"] for pg in pages]
    # html is the BODY only (HTTP envelope stripped)
    assert bytes(out.column("html")[0].as_py()) == pages[0]["html"]
    assert out.schema.field("warc_ts").type == pa.timestamp("ns")


def test_warc_pipeline_equivalence(tmp_path, ray_session):
    """KG pipeline over WARC-ingested pages must equal the pipeline over
    the direct synthetic page table (the ingest adds no semantics)."""
    import pyarrow as pa

    from entitydisambiguation_ray.pipelines.kg import (
        run_kg_pipeline,
        synth_pages_dataset,
    )

    n = 120
    pages = _sample_pages(n, seed=42)
    # two archives → two parse tasks
    p1 = str(tmp_path / "a.warc.gz")
    p2 = str(tmp_path / "b.warc")
    write_warc(p1, pages[:60], gzip_members=True)
    write_warc(p2, pages[60:])
    ds = read_warc_pages([p1, p2])
    out_warc = run_kg_pipeline(ds)
    out_ref = run_kg_pipeline(synth_pages_dataset(n, seed=42))
    for key in ("edges",):
        a = out_warc[key].to_pandas()
        b = out_ref[key].to_pandas()
        a = a.sort_values(list(a.columns)).reset_index(drop=True)
        b = b.sort_values(list(b.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_checkpointed_from_warc_resumes(ray_session, tmp_path):
    """WARC-input checkpointed runner: identical output to the direct
    pipeline, committed partitions skipped on resume."""
    import ray.data as rd

    from entitydisambiguation_ray.pipelines import checkpointed as cp
    from entitydisambiguation_ray.pipelines.kg import (
        run_kg_pipeline,
        synth_pages_dataset,
    )
    from entitydisambiguation_ray.state.checkpoint import partition_files

    n = 80
    pages = _sample_pages(n, seed=42)
    wdir = tmp_path / "warcs"
    wdir.mkdir()
    for i in range(4):
        write_warc(str(wdir / f"{i}.warc.gz"), pages[i * 20:(i + 1) * 20],
                   gzip_members=True)
    run = cp.run_checkpointed_kg_from_warc(str(tmp_path / "run"),
                                           str(wdir), nparts=2)
    got = (rd.read_parquet(partition_files([run["edges_dir"]])).to_pandas()
           .sort_values(["src_id", "dst_id", "rel_type"])
           .reset_index(drop=True))
    ref = (run_kg_pipeline(synth_pages_dataset(n, seed=42))["edges"]
           .to_pandas().sort_values(["src_id", "dst_id", "rel_type"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref)
    # resume: everything committed → no re-run, same dirs
    run2 = cp.run_checkpointed_kg_from_warc(str(tmp_path / "run"),
                                            str(wdir), nparts=2)
    assert run2["triples_dirs"] == run["triples_dirs"]
