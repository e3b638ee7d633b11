"""Round-3b operator additions: DuckDB-oracle parity for the below-cap
SQL-checkable queries (the driver's CORRECTNESS file records only the
first 50 ``queries()`` entries; these tests run the SAME SQL the driver
would, with exact frame equality — same rigor, self-run)."""
from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.execute(sql).df()


def _as_df(obj) -> pd.DataFrame:
    df = obj if isinstance(obj, pd.DataFrame) else obj.to_pandas()
    return df.reset_index(drop=True)


def _assert_matches(engine_df: pd.DataFrame, oracle_df: pd.DataFrame):
    """Column-name-sorted, dtype-harmonized exact compare (mirrors the
    driver: sort columns by name, hash values)."""
    assert sorted(engine_df.columns) == sorted(oracle_df.columns)
    e = engine_df[sorted(engine_df.columns)].reset_index(drop=True)
    o = oracle_df[sorted(oracle_df.columns)].reset_index(drop=True)
    assert len(e) == len(o)
    for c in e.columns:
        ec, oc = e[c], o[c]
        if ec.dtype != oc.dtype:
            ec = ec.astype(oc.dtype)
        pd.testing.assert_series_equal(ec, oc, check_names=False,
                                       check_exact=True)


@pytest.mark.parametrize("name", [
    "multi_join_chain", "pivot_counts", "moving_average",
    "dense_rank_topk", "ngram_jaccard_pairs",
    "doc_freq_vocab", "corr_by_group", "stratified_sample",
    "gopher_quality", "outer_join_full", "groupby_mode",
    "tfidf_top_terms", "copurchase_pairs", "token_count_bpe",
    "weighted_sample", "collect_segments", "funnel_counts",
    "source_stats", "prefix_jaccard_pairs", "price_histogram",
    "event_transitions", "centroid_by_label",
])
def test_oracle_parity(ray_session, name):
    import __ray_entry__ as entry

    q = entry.queries()[name]
    sql = entry.oracle_sql()[name]
    _assert_matches(_as_df(q(SF_DIR)), _oracle(sql))


def test_ngram_jaccard_bigrams_vs_naive(ray_session):
    """n=2 word shingles (no SQL oracle): exact agreement with a naive
    per-pair reference on a small planted corpus."""
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import ngram_jaccard_pairs

    rows = [
        {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog",
         "lang": "en"},
        {"doc_id": 1, "text": "the quick brown fox leaps over the lazy dog",
         "lang": "en"},
        {"doc_id": 2, "text": "the quick brown fox jumps over a lazy cat",
         "lang": "en"},
        {"doc_id": 3, "text": "completely unrelated words here now",
         "lang": "en"},
        {"doc_id": 4, "text": "the quick brown fox jumps over the lazy dog",
         "lang": "de"},  # other block: never pairs with en docs
    ]
    got = (ngram_jaccard_pairs(rd.from_items(rows), "doc_id", "text",
                               "lang", threshold=0.2, n=2)
           .to_pandas().sort_values(["doc_a", "doc_b"])
           .reset_index(drop=True))

    def shingles(t, n=2):
        toks = t.lower().split(" ")
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    want = []
    en = [r for r in rows if r["lang"] == "en"]
    for i in range(len(en)):
        for j in range(i + 1, len(en)):
            a, b = shingles(en[i]["text"]), shingles(en[j]["text"])
            jac = len(a & b) / len(a | b)
            if jac >= 0.2:
                want.append((en[i]["doc_id"], en[j]["doc_id"], round(jac, 4)))
    want_df = pd.DataFrame(want, columns=["doc_a", "doc_b", "jaccard"])
    pd.testing.assert_frame_equal(got, want_df, check_dtype=False)
    # cross-block pair must be absent
    assert not ((got["doc_a"] == 0) & (got["doc_b"] == 4)).any()


def test_dense_rank_keeps_ties(ray_session):
    """A balance tie at rank 3 keeps BOTH rows (dense_rank, not row_number):
    verified against the sf0.001 oracle's tie structure by construction in
    test_oracle_parity; here assert rank values are dense per segment."""
    from entitydisambiguation_ray.pipelines.relational import dense_rank_topk

    out = dense_rank_topk(SF_DIR)
    for _, g in out.groupby("c_mktsegment"):
        ranks = sorted(g["rnk"].unique())
        assert ranks == list(range(1, len(ranks) + 1))
        # ranks are dense over DISTINCT balances
        assert g.groupby("rnk")["c_acctbal"].nunique().max() == 1


# ------------------------------------------------------------- winnowing

def test_winnow_guarantee_and_locality(ray_session):
    """Winnowing guarantee: any shared substring >= w+k-1 yields a shared
    fingerprint — a copied paragraph inside otherwise-different pages is
    detected, where whole-doc overlap is tiny."""
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import winnow_pairs

    paragraph = ("copied paragraph that appears verbatim in two pages "
                 "with plenty of shared bytes to fingerprint") * 3
    rows = [
        {"doc_id": 0, "text": "first page intro. " + paragraph
         + " first page closing words entirely its own."},
        {"doc_id": 1, "text": "completely different opening here. "
         + paragraph + " and a different ending follows too."},
        {"doc_id": 2, "text": "this third page shares nothing with the "
         "others; its vocabulary and phrasing are distinct throughout, "
         "long enough to produce many fingerprints of its own accord."},
    ]
    out = winnow_pairs(rd.from_items(rows), "doc_id", "text",
                       min_shared=3).to_pandas()
    assert ((out["id_a"] == 0) & (out["id_b"] == 1)).any()
    assert not ((out["id_b"] == 2) | (out["id_a"] == 2)).any()
    got = out[(out["id_a"] == 0) & (out["id_b"] == 1)]["n_shared"].iloc[0]
    assert got >= 3


def test_winnow_identical_docs_share_all(ray_session):
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import winnow_pairs
    from entitydisambiguation_ray.stages.dedup import winnow

    text = "identical document body repeated across both ids " * 4
    ds = rd.from_items([{"doc_id": 10, "text": text},
                        {"doc_id": 11, "text": text}])
    out = winnow_pairs(ds, "doc_id", "text", min_shared=1).to_pandas()
    assert len(out) == 1
    assert out["n_shared"].iloc[0] == len(winnow(text))


def test_winnow_hot_bucket_cap(ray_session):
    """A fingerprint shared by hundreds of docs (boilerplate) is dropped
    as a pair generator under a small cap; distinct small overlaps
    survive."""
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import winnow_pairs

    boiler = "standard cookie banner text shown on every single page " * 2
    rows = [{"doc_id": i, "text": boiler} for i in range(300)]
    rows += [{"doc_id": 900, "text": "one unique pair of pages alpha beta "
              "gamma delta epsilon zeta eta theta"},
             {"doc_id": 901, "text": "one unique pair of pages alpha beta "
              "gamma delta epsilon zeta eta theta"}]
    out = winnow_pairs(rd.from_items(rows), "doc_id", "text",
                       min_shared=1, bucket_cap=50).to_pandas()
    clones = out[(out["id_a"] < 900) & (out["id_b"] < 900)]
    assert len(clones) == 0
    assert ((out["id_a"] == 900) & (out["id_b"] == 901)).any()


def test_funnel_counts_stage_cutoffs(ray_session, tmp_path):
    """The testdata funnel is degenerate (every user completes); this
    crafted corpus exercises the chain semantics — stage 2 counts only
    clicks at-or-after the FIRST view, stage 3 only purchases at-or-after
    the first qualifying click."""
    import pandas as pd
    from entitydisambiguation_ray.pipelines.relational import (
        funnel_counts, SQL_FUNNEL_COUNTS)

    rows = [
        # u1 completes in order
        ("u1", "view", 1), ("u1", "click", 2), ("u1", "purchase", 3),
        # u2: click BEFORE view only -> stage 1 only
        ("u2", "click", 1), ("u2", "view", 2),
        # u3: no click at all -> stage 1 only (purchase can't skip a stage)
        ("u3", "view", 1), ("u3", "purchase", 2),
        # u4: reversed order -> stage 1 only
        ("u4", "purchase", 1), ("u4", "click", 2), ("u4", "view", 3),
        # u5: click strictly before view -> stage 1 only
        ("u5", "view", 5), ("u5", "click", 4),
        # u6: never views -> counted nowhere
        ("u6", "click", 1), ("u6", "purchase", 2),
        # u7: purchase between view and click -> stage 2 only
        ("u7", "view", 1), ("u7", "purchase", 3), ("u7", "click", 5),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "t"])
    df["ts"] = pd.to_datetime(df["t"], unit="s")
    df[["user_id", "event_type", "ts"]].to_parquet(
        tmp_path / "events.parquet", index=False)

    got = funnel_counts(str(tmp_path))
    assert got.values.tolist() == [[6, 2, 1]]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path / 'events.parquet'}'")
    oracle = con.execute(SQL_FUNNEL_COUNTS).df()
    _assert_matches(got, oracle)


# ------------------------------------------------- prefix-filtered jaccard

def _prefix_corpus():
    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls on the quiet town square this evening").split()
    rows = []
    # cluster of near-identical docs (1-2 word edits)
    for i in range(6):
        words = list(base)
        words[i] = f"variant{i}"
        rows.append({"doc_id": i, "text": " ".join(words)})
    # second cluster, different vocabulary
    alt = ("many data pipelines shuffle large tables across machines "
           "every night to build training corpora at scale").split()
    for i in range(4):
        words = list(alt)
        words[-1 - i] = f"alt{i}"
        rows.append({"doc_id": 100 + i, "text": " ".join(words)})
    # unrelated docs sharing only stopwords with the clusters
    for i in range(8):
        rows.append({"doc_id": 200 + i,
                     "text": f"the unique document number {i} discusses "
                             f"topic{i} and nothing else of note here"})
    return rows


@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_prefix_jaccard_matches_bruteforce(ray_session, threshold):
    """Prefix filtering is EXACT: output identical (ids and jaccard
    floats) to naive all-pairs over the same shingle definition."""
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import prefix_jaccard_pairs
    from entitydisambiguation_ray.stages.dedup import jaccard, word_ngrams

    rows = _prefix_corpus()
    got = (prefix_jaccard_pairs(rd.from_items(rows), "doc_id", "text",
                                threshold=threshold, n=1)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    want = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            ja = jaccard(word_ngrams(rows[i]["text"], 1),
                         word_ngrams(rows[j]["text"], 1))
            if ja >= threshold:
                want.append((rows[i]["doc_id"], rows[j]["doc_id"], ja))
    want_df = pd.DataFrame(want, columns=["id_a", "id_b", "jaccard"]) \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(want_df) > 0  # the corpus must actually exercise recall
    pd.testing.assert_frame_equal(got, want_df, check_dtype=False)


def test_prefix_jaccard_no_pairs(ray_session):
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import prefix_jaccard_pairs

    rows = [{"doc_id": i, "text": f"utterly distinct text number{i} "
             f"about subject{i} only"} for i in range(10)]
    got = prefix_jaccard_pairs(rd.from_items(rows), "doc_id", "text",
                               threshold=0.9, n=1).to_pandas()
    assert len(got) == 0


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    seed=st.integers(0, 10**6),
    threshold=st.sampled_from([0.3, 0.5, 0.7, 0.9]),
)
def test_prefix_jaccard_property(ray_session, seed, threshold):
    """Property: for random corpora and thresholds, prefix filtering
    returns EXACTLY the brute-force answer (guards the prefix-length
    formula |s| - ceil(t*|s|) + 1 across set sizes and tie shapes)."""
    import numpy as np
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import prefix_jaccard_pairs
    from entitydisambiguation_ray.stages.dedup import jaccard, word_ngrams

    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(24):
        k = int(rng.integers(3, 14))
        words = rng.choice(vocab, size=k, replace=True)
        rows.append({"doc_id": i, "text": " ".join(words)})
    got = (prefix_jaccard_pairs(rd.from_items(rows), "doc_id", "text",
                                threshold=threshold, n=1)
           .to_pandas())
    got_set = (set() if "id_a" not in got.columns else
               {(a, b, round(j, 9))
                for a, b, j in zip(got["id_a"], got["id_b"],
                                   got["jaccard"])})
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            ja = jaccard(word_ngrams(rows[i]["text"], 1),
                         word_ngrams(rows[j]["text"], 1))
            if ja >= threshold:
                want.add((i, j, round(ja, 9)))
    assert got_set == want


def test_prefix_jaccard_ceil_boundary(ray_session):
    """Regression: float ceil overshoot (0.55*100 = 55.000000000000007 →
    ceil 56) used to shorten doc a's prefix by one token and miss this
    exactly-at-threshold pair."""
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import prefix_jaccard_pairs

    a_toks = [f"w{i}" for i in range(100)]
    b_toks = a_toks[45:]  # |a ∩ b| = 55, |a ∪ b| = 100 → J = 0.55 exactly
    rows = [{"doc_id": 1, "text": " ".join(a_toks)},
            {"doc_id": 2, "text": " ".join(b_toks)}]
    got = prefix_jaccard_pairs(rd.from_items(rows), "doc_id", "text",
                               threshold=0.55, n=1).to_pandas()
    assert len(got) == 1
    assert got["jaccard"].iloc[0] == 0.55
