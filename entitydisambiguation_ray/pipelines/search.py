"""Corpus text retrieval: distributed BM25 top-k.

The text-retrieval primitive an LLM-data pipeline uses for quality
filtering, dedup-aware sampling and eval-set mining (Robertson & Zaragoza
2009, "The Probabilistic Relevance Framework: BM25 and Beyond"; the idf
form is Lucene's ``ln(1 + (N - df + 0.5)/(df + 0.5))``).

Scale shape — two passes, no shuffle at all:

1. stats pass: a per-batch combiner emits ONE tiny row per batch — doc
   count, token-length sum, and per-QUERY-TERM document frequencies
   (only the query's terms are counted; the corpus vocabulary is never
   materialized).  The driver reduces the partials into (N, avgdl,
   idf-per-term) — a few floats — and broadcasts them in the task closure.
2. scoring pass: per batch, tokens explode ONCE (vectorized pandas
   split + explode), term frequencies come from a C-speed groupby over
   rows filtered to the query terms, the BM25 sum is a numpy expression,
   and a per-batch partial top-k keeps ``k`` candidate rows per batch
   (the ``brute_force_topk`` combiner discipline) — the driver merges
   tiny partials.

Tokenization matches the SQL oracle byte-for-byte (the
``ngram_jaccard_pairs`` precedent): ``lower().split(' ')`` with empty
tokens kept, document length = that token count.  The emitted score is
rounded with the DuckDB-compatible half-away rule and the ranking orders
by (rounded score DESC, doc id ASC), so the oracle comparison is exact.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _tokenize_series(texts: pd.Series) -> pd.Series:
    return texts.str.lower().str.split(" ")


def bm25_topk(
    ds: rd.Dataset, id_col: str, text_col: str, query: str,
    *, k: int = 10, k1: float = 1.2, b: float = 0.75,
) -> pd.DataFrame:
    """BM25 top-k over a documents Dataset → DataFrame
    (rank, doc id, score) — scores rounded half-away to 6 places, ranking
    deterministic (rounded score DESC, id ASC)."""
    from .dedup import _round_half_away

    terms = sorted({t for t in query.lower().split(" ") if t})
    if not terms:
        raise ValueError("empty query")

    # ---- pass 1: corpus stats combiner (one tiny row per batch) --------
    def stats_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "t": _tokenize_series(batch.column(text_col).to_pandas())})
        dl = df["t"].str.len()
        toksets = df["t"].map(set)
        cols = {"n_docs": [len(df)], "len_sum": [int(dl.sum())]}
        for i, t in enumerate(terms):
            cols[f"df{i}"] = [int(toksets.map(lambda s, t=t: t in s).sum())]
        return pa.table(cols)

    parts = ds.map_batches(stats_partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    n_docs = int(parts["n_docs"].sum())
    if n_docs == 0:
        return pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                             id_col: pd.Series([], dtype="object"),
                             "score": pd.Series([], dtype="float64")})
    avgdl = float(parts["len_sum"].sum()) / n_docs
    dfs = {t: int(parts[f"df{i}"].sum()) for i, t in enumerate(terms)}
    idf = {t: float(np.log(1.0 + (n_docs - dfs[t] + 0.5)
                           / (dfs[t] + 0.5))) for t in terms}

    # ---- pass 2: vectorized scoring + per-batch partial top-k ----------
    term_set = set(terms)

    def score_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pandas()
        toks = _tokenize_series(batch.column(text_col).to_pandas())
        dl = toks.str.len().to_numpy(dtype=np.float64)
        ex = toks.explode()
        hit = ex[ex.isin(term_set)]
        # (row, term) term frequencies, C-speed
        tf = (pd.DataFrame({"row": hit.index, "term": hit.to_numpy()})
              .groupby(["row", "term"]).size())
        score = np.zeros(len(ids), dtype=np.float64)
        denom_row = k1 * (1.0 - b + b * dl / avgdl)
        if len(tf):
            rows = tf.index.get_level_values("row").to_numpy(dtype=np.int64)
            tvals = tf.index.get_level_values("term").to_numpy()
            f = tf.to_numpy(dtype=np.float64)
            w = np.array([idf[t] for t in tvals])
            contrib = w * (f * (k1 + 1.0)) / (f + denom_row[rows])
            np.add.at(score, rows, contrib)
        # docs matching NO query term are not candidates (the oracle's tf
        # join semantics); any match gives score > 0 (idf = ln(1+x) > 0)
        cand = np.flatnonzero(score > 0)
        # The partial top-k MUST use the FINAL comparator — (score rounded
        # half-away to 6dp DESC, id ASC) — or ties/near-ties that round
        # equal straddling the batch-k boundary drop ids the global oracle
        # ranking would keep (e.g. >k identical docs in one batch).
        cand_ids = ids.to_numpy()[cand]
        cand_rounded = _round_half_away(score[cand], 6)
        order = np.lexsort((cand_ids, -cand_rounded))[: min(k, len(cand))]
        return pa.table({
            id_col: pa.array(cand_ids[order]),
            "score": pa.array(cand_rounded[order], pa.float64()),
        })

    partials = ds.map_batches(score_partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    if partials.empty or "score" not in partials.columns:
        return pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                             id_col: pd.Series([], dtype="object"),
                             "score": pd.Series([], dtype="float64")})
    partials["score"] = _round_half_away(
        partials["score"].to_numpy(dtype=np.float64), 6)
    out = (partials.sort_values(["score", id_col],
                                ascending=[False, True], kind="mergesort")
           .head(k).reset_index(drop=True))
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out[["rank", id_col, "score"]]


def bm25_oracle_sql(query: str, k: int = 10, k1: float = 1.2,
                    b: float = 0.75, id_col: str = "doc_id",
                    table: str = "documents",
                    text_col: str = "text") -> str:
    """DuckDB SQL computing the identical BM25 ranking (same tokenizer,
    same Lucene idf, same rounding/tie rules) — the driver oracle."""
    terms = sorted({t for t in query.lower().split(" ") if t})
    tvals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH toks AS (
  SELECT {id_col},
         string_split(lower({text_col}), ' ') AS tokens,
         len(string_split(lower({text_col}), ' ')) AS dl
  FROM {table}
), stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM toks
), terms(term) AS (VALUES {tvals}),
tf AS (
  SELECT t.{id_col}, t.dl, u.tok AS term, count(*) AS f
  FROM toks t, unnest(t.tokens) AS u(tok)
  WHERE u.tok IN (SELECT term FROM terms)
  GROUP BY t.{id_col}, t.dl, u.tok
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.{id_col},
         sum( ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tf.f * ({k1} + 1.0))
              / (tf.f + {k1} * (1.0 - {b} + {b} * tf.dl / s.avgdl)) )
           AS raw
  FROM tf JOIN df USING (term) CROSS JOIN stats s
  GROUP BY tf.{id_col}
)
SELECT CAST(row_number() OVER (ORDER BY round(raw, 6) DESC, {id_col})
            AS BIGINT) AS rank,
       {id_col},
       round(raw, 6) AS score
FROM scored
ORDER BY round(raw, 6) DESC, {id_col}
LIMIT {k}
"""
