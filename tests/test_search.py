"""BM25 top-k (pipelines/search.py): frame-exact DuckDB oracle parity,
combiner correctness against a naive in-memory reference, and edge cases."""
import math

import numpy as np
import pandas as pd
import pytest

from entitydisambiguation_ray.pipelines.search import (
    bm25_oracle_sql,
    bm25_topk,
)


def _naive_bm25(docs, query, k=10, k1=1.2, b=0.75):
    terms = sorted(set(query.lower().split(" ")))
    toks = {d: t.lower().split(" ") for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfs = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    rows = []
    for d, tk in toks.items():
        s = 0.0
        for t in terms:
            f = tk.count(t)
            if f:
                idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
                s += idf * (f * (k1 + 1)) / (f + k1 * (1 - b + b * len(tk) / avgdl))
        if s > 0:
            rows.append((d, round(s, 6)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


def test_bm25_matches_naive_reference(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(60)] + ["data", "model", "training"]
    docs = {f"d{i:03d}": " ".join(
        vocab[int(x)] for x in rng.integers(0, len(vocab),
                                            size=rng.integers(3, 40)))
        for i in range(300)}
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in docs.items()])
    got = bm25_topk(ds, "doc_id", "text", "data model training", k=15)
    ref = _naive_bm25(docs, "data model training", k=15)
    assert list(zip(got["doc_id"], got["score"])) == ref
    assert got["rank"].tolist() == list(range(1, len(ref) + 1))


def test_bm25_sql_oracle_parity(ray_session):
    import duckdb
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                         columns=["doc_id", "text"])
    got = bm25_topk(ds, "doc_id", "text", "data model training", k=20)
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.01/documents.parquet'")
    oracle = con.sql(bm25_oracle_sql("data model training", k=20)).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        oracle.reset_index(drop=True)[list(got.columns)])


def test_bm25_no_match_and_validation(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"doc_id": "a", "text": "alpha beta"},
                        {"doc_id": "b", "text": "gamma"}])
    out = bm25_topk(ds, "doc_id", "text", "zzz qqq", k=5)
    assert len(out) == 0  # non-matching docs are not candidates
    with pytest.raises(ValueError):
        bm25_topk(ds, "doc_id", "text", "")


def test_bm25_batch_split_invariance(ray_session):
    """Partial top-k across many small blocks must equal one big block
    (the combiner is a pure per-batch candidate prefilter)."""
    import ray.data as rd

    rng = np.random.default_rng(4)
    vocab = ["data", "model", "x", "y", "z", "training", "deep"]
    items = [{"doc_id": f"d{i:03d}",
              "text": " ".join(vocab[int(v)] for v in
                               rng.integers(0, len(vocab), size=12))}
             for i in range(400)]
    one = bm25_topk(rd.from_items(items).repartition(1),
                    "doc_id", "text", "data training", k=12)
    many = bm25_topk(rd.from_items(items).repartition(37),
                     "doc_id", "text", "data training", k=12)
    pd.testing.assert_frame_equal(one, many)


def test_bm25_tied_scores_break_by_id(ray_session):
    """>k identical docs in ONE batch: the per-batch partial top-k must
    select by the final comparator (rounded score DESC, id ASC), keeping
    the id-smallest tied docs the SQL oracle ranks first (ADVICE r4)."""
    import duckdb
    import ray.data as rd

    items = [{"doc_id": f"d{i:03d}", "text": "data model training extra"}
             for i in range(30)]
    ds = rd.from_items(items).repartition(1)
    got = bm25_topk(ds, "doc_id", "text", "data model", k=5)
    assert got["doc_id"].tolist() == [f"d{i:03d}" for i in range(5)]

    con = duckdb.connect()
    con.register("docs_df", pd.DataFrame(items))
    con.sql("CREATE VIEW documents AS SELECT * FROM docs_df")
    ref = con.sql(bm25_oracle_sql("data model", k=5)).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), ref.reset_index(drop=True))


# ---------------------------------------------------------------------------
# decontamination (pipelines/dedup.decontaminate_flags)
# ---------------------------------------------------------------------------
def test_decontaminate_planted_and_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import (
        decontaminate_flags,
        decontaminate_oracle_sql,
    )

    items = [
        {"doc_id": "clean1", "text": "alpha beta gamma delta"},
        {"doc_id": "dirty1", "text": "the exam question is two plus two"},
        {"doc_id": "dirty2",
         "text": "prefix words exam question is two more text"},
        {"doc_id": "short", "text": "xy"},
        {"doc_id": "clean2", "text": "question is here but not enough"},
    ]
    ev = ["exam question is two plus two", "zz yy xx"]
    ds = rd.from_items(items)
    got = (decontaminate_flags(ds, "doc_id", "text", ev, n=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == ["dirty1", "dirty2"]
    # dirty1 contains all 4 eval 3-grams, dirty2 exactly 2
    assert got["n_hits"].tolist() == [4, 2]
    # SQL oracle agreement on the same corpus
    con = duckdb.connect()
    con.sql("CREATE TABLE documents AS SELECT * FROM (VALUES " + ", ".join(
        f"('{i['doc_id']}', '{i['text']}')" for i in items)
        + ") t(doc_id, text)")
    o = con.sql(decontaminate_oracle_sql(ev, n=3)).df()
    import pandas as pd

    pd.testing.assert_frame_equal(got, o[list(got.columns)])
    # an eval set of only-too-short items must refuse loudly
    with pytest.raises(ValueError):
        decontaminate_flags(ds, "doc_id", "text", ["a b"], n=3)
