"""Relational operator suite over the testdata tables, each paired with an
ANSI-SQL oracle (DuckDB) for the driver's correctness gate.

Every function maps a reference operator (SURVEY.md §2 ids in docstrings) to
its idiomatic Ray Data expression.  Conventions:

- reads prune columns at the source (``read_parquet(columns=[...])``);
- aggregations pre-aggregate inside ``map_batches`` where the key count is
  small (combiner), then run a tiny global ``groupby``;
- joins broadcast the small side (``ray.put`` → lookup per batch) instead of
  shuffling both sides;
- float aggregates are rounded to 2 decimals in BOTH engines (binary float
  sums are order-dependent in any engine; integer-valued sums like
  ``sum_qty`` are exact and left unrounded);
- computed columns carry the same names as the SQL oracle (driver hashes
  sort columns by name).
"""
from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _round_half_away(x: "np.ndarray", decimals: int = 2) -> "np.ndarray":
    """DuckDB-compatible ROUND: half away from zero on the scaled double
    (numpy/pandas round half-to-even, which diverges whenever the scaled
    value lands exactly on a representable .5 — common for 2-term means of
    2-decimal inputs).  Only needed where the unrounded doubles are already
    bit-identical across engines; sums/divisions by 3+ essentially never
    hit an exact half."""
    scale = 10.0 ** decimals
    s = x * scale
    return np.where(s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5)) / scale


def _pq(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                           columns=columns)


# --------------------------------------------------------------- S2/T5: scan+sort+limit

def scan_sort_limit(sf_dir: str):
    """Full scan ordered by a key, limited (reference: Neo4j entity scan
    ORDER BY create_time DESC — neo4j_database.py:203-229)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(100)


SQL_SCAN_SORT_LIMIT = """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id LIMIT 100
"""


# --------------------------------------------------------------- S4: substring search

def substring_search(sf_dir: str):
    """name CONTAINS q + order + limit (neo4j_database.py:231-273)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "lang", "text"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.match_substring(t.column("text"), "query")),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return ds.select_columns(["doc_id", "lang"]).sort("doc_id").limit(200)


SQL_SUBSTRING_SEARCH = """
SELECT doc_id, lang FROM documents
WHERE contains(text, 'query') ORDER BY doc_id LIMIT 200
"""


# --------------------------------------------------------------- S5: type scan

def type_scan(sf_dir: str):
    """Typed scan ordered by name (neo4j_database.py:275-301)."""
    ds = _pq(sf_dir, "part", ["p_partkey", "p_name", "p_type", "p_size"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("p_type"), "STANDARD")),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return ds.select_columns(["p_partkey", "p_name"]).sort(
        ["p_name", "p_partkey"])


SQL_TYPE_SCAN = """
SELECT p_partkey, p_name FROM part
WHERE p_type = 'STANDARD' ORDER BY p_name, p_partkey
"""


# --------------------------------------------------------------- S3/J5: keyed lookup via broadcast hash join

def point_lookup_join(sf_dir: str):
    """Batch equivalent of point lookups: hash join of an id-keyed probe
    set against the entity table, customer side broadcast
    (neo4j_database.py:179-201; SURVEY.md §2.4 broadcast join)."""
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas()
    cust_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))

    class Probe:
        def __init__(self):
            self.lookup = ray.get(cust_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(keys % 100 == 0))
            # vectorized map (C hashtable) instead of a per-row dict loop
            names = pd.Series(
                batch.column("o_custkey").to_numpy(zero_copy_only=False)
            ).map(self.lookup)
            batch = batch.append_column(
                "c_name", pa.array(names.to_numpy(), pa.string()))
            return batch.select(["o_orderkey", "o_totalprice", "c_name"])

    ds = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.map_batches(Probe, batch_format="pyarrow",
                          concurrency=(1, 2)).sort("o_orderkey")


SQL_POINT_LOOKUP_JOIN = """
SELECT o_orderkey, o_totalprice, c_name
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey
"""


# --------------------------------------------------------------- S6: upsert last-wins

# Per-key row count beyond which a key is routed to its own dedicated
# partition in the keyed-shuffle operators below (upsert / sessions / as-of
# / range join).  Isolation never changes results (stages/partition.py
# docstring); the pre-count is a one-column combiner pass.
HOT_KEY_ROWS = 250_000


_HOT_USERS_MEMO: dict[str, dict] = {}


def _hot_users(sf_dir: str) -> dict:
    """Memoized per input dir: eight keyed-shuffle operators share this
    identical pre-pass (same table, key, threshold) — without the memo a
    bench run scans the events table seven extra times for byte-identical
    results.  Driver-side cache, bounded by the number of input dirs."""
    hot = _HOT_USERS_MEMO.get(sf_dir)
    if hot is None:
        from ..stages.partition import hot_group_keys

        hot = hot_group_keys(_pq(sf_dir, "events", ["user_id"]),
                             "user_id", HOT_KEY_ROWS)
        _HOT_USERS_MEMO[sf_dir] = hot
    return hot


def upsert_last_wins(sf_dir: str):
    """MERGE-by-id last-write-wins (neo4j_database.py:130-177) over the
    events stream: last event per user by (ts, event_id).  Coarse
    hash-partitioned (stages/partition.py) — per-key ``map_groups`` costs
    one pandas call per user, catastrophic at web-scale key counts.
    Pathological users are isolated into dedicated partitions
    (``hot_group_keys``)."""
    from ..stages.partition import partitioned_groupby

    ds = _pq(sf_dir, "events", ["user_id", "event_id", "event_type", "ts"])

    def last_per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            ascending=[True, False, False],
                            kind="mergesort").drop_duplicates("user_id")
        return df.rename(columns={"event_id": "last_event_id",
                                  "event_type": "last_event_type"})[
            ["user_id", "last_event_id", "last_event_type"]]

    return partitioned_groupby(ds, "user_id", last_per_user, nparts=16,
                               isolate_hot=_hot_users(sf_dir)).sort("user_id")


SQL_UPSERT_LAST_WINS = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id
"""


# --------------------------------------------------------------- S9/G3: counts

def table_counts(sf_dir: str):
    """Entity counts per table (neo4j_database.py:386-400,
    database_factory.py:121-148)."""
    rows = []
    for t in ("documents", "orders", "lineitem", "events", "customer"):
        rows.append({"tbl": t, "n": _pq(sf_dir, t).count()})
    return pd.DataFrame(rows).sort_values("tbl").reset_index(drop=True)


SQL_TABLE_COUNTS = """
SELECT tbl, n FROM (
  SELECT 'customer' AS tbl, count(*) AS n FROM customer UNION ALL
  SELECT 'documents', count(*) FROM documents UNION ALL
  SELECT 'events', count(*) FROM events UNION ALL
  SELECT 'lineitem', count(*) FROM lineitem UNION ALL
  SELECT 'orders', count(*) FROM orders
) ORDER BY tbl
"""


# --------------------------------------------------------------- S11/T4: history top-N

def history_topn(sf_dir: str):
    """ORDER BY timestamp DESC LIMIT (database.py:81-115)."""
    ds = _pq(sf_dir, "events", ["event_id", "ts", "event_type"])
    return ds.sort(["ts", "event_id"], descending=[True, True]).limit(100)


SQL_HISTORY_TOPN = """
SELECT event_id, ts, event_type FROM events
ORDER BY ts DESC, event_id DESC LIMIT 100
"""


# --------------------------------------------------------------- G1/G2: grouped stats

def decision_stats(sf_dir: str):
    """decision → count (database.py:128-147), with per-batch combiner."""
    ds = _pq(sf_dir, "events", ["event_type"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        tbl = batch.group_by("event_type").aggregate([("event_type", "count")])
        return tbl.rename_columns(["event_type", "cnt"])

    partial = ds.map_batches(partial_counts, batch_format="pyarrow",
                             zero_copy_batch=True)
    from ray.data.aggregate import Sum

    out = partial.groupby("event_type").aggregate(Sum("cnt", alias_name="cnt"))
    return out.sort("event_type")


SQL_DECISION_STATS = """
SELECT event_type, count(*) AS cnt FROM events
GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------- T1/T3: top-k per group

def groupby_topk(sf_dir: str):
    """Per-group argmax (candidate top-1, disambiguation.py:146-149):
    highest-value event per user, via ONE vectorized sort+dedup per coarse
    partition instead of one pandas call per user."""
    from ..stages.partition import partitioned_groupby

    ds = _pq(sf_dir, "events", ["user_id", "event_id", "value"])

    def top1(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["user_id", "value", "event_id"],
                              ascending=[True, False, True],
                              kind="mergesort").drop_duplicates("user_id")

    return partitioned_groupby(ds, "user_id", top1, nparts=16).sort("user_id")


SQL_GROUPBY_TOPK = """
SELECT user_id, event_id, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY value DESC, event_id) = 1
ORDER BY user_id
"""


# --------------------------------------------------------------- broadcast join + agg

def broadcast_join_agg(sf_dir: str):
    """customer ⋈ nation ⋈ region → per-region stats; dimension tables
    broadcast via ray.put (SURVEY.md §2.4: broadcast hash join)."""
    nation = _pq(sf_dir, "nation").to_pandas()
    region = _pq(sf_dir, "region").to_pandas()
    n2r = dict(zip(nation["n_nationkey"],
                   nation["n_regionkey"].map(
                       dict(zip(region["r_regionkey"], region["r_name"])))))
    ref = ray.put(n2r)

    class Tag:
        def __init__(self):
            self.n2r = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            rnames = pd.Series(
                batch.column("c_nationkey").to_numpy(zero_copy_only=False)
            ).map(self.n2r)
            batch = batch.append_column(
                "r_name", pa.array(rnames.to_numpy(), pa.string()))
            # per-batch partial aggregation (combiner)
            df = batch.select(["r_name", "c_acctbal"]).to_pandas()
            agg = df.groupby("r_name", as_index=False).agg(
                n_cust=("c_acctbal", "size"), sum_bal=("c_acctbal", "sum"))
            return pa.Table.from_pandas(agg, preserve_index=False)

    ds = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    partial = ds.map_batches(Tag, batch_format="pyarrow", concurrency=(1, 2))
    from ray.data.aggregate import Sum

    out = partial.groupby("r_name").aggregate(
        Sum("n_cust", alias_name="n_cust"),
        Sum("sum_bal", alias_name="sum_bal"),
    ).to_pandas()
    out["sum_bal"] = out["sum_bal"].round(2)
    out["n_cust"] = out["n_cust"].astype("int64")
    return out.sort_values("r_name").reset_index(drop=True)


SQL_BROADCAST_JOIN_AGG = """
SELECT r_name, count(*) AS n_cust, ROUND(SUM(c_acctbal), 2) AS sum_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


# --------------------------------------------------------------- shuffle-scale join + agg

def shuffle_join_agg(sf_dir: str):
    """lineitem ⋈ orders revenue rollup via the co-partitioned shuffle hash
    join (stages/join.py): BOTH sides scale with the fact table, so neither
    is collected or broadcast (SURVEY.md §2.4 'both sides large'); the join
    output streams into a per-batch combiner + tiny global groupby."""
    from ..stages.join import shuffle_hash_join

    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = shuffle_hash_join(li, orders, on="l_orderkey",
                               right_on="o_orderkey", nparts=32)

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(1.0, batch.column("l_discount")))
        df = pd.DataFrame({
            "o_orderpriority": batch.column("o_orderpriority")
            .to_numpy(zero_copy_only=False),
            "revenue": rev.to_numpy(zero_copy_only=False)})
        agg = df.groupby("o_orderpriority", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("revenue", "size"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    from ray.data.aggregate import Sum

    out = joined.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    out = out.groupby("o_orderpriority").aggregate(
        Sum("revenue", alias_name="revenue"),
        Sum("n_items", alias_name="n_items"),
    ).to_pandas()
    out["revenue"] = out["revenue"].round(2)
    out["n_items"] = out["n_items"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_SHUFFLE_JOIN_AGG = """
SELECT o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --------------------------------------------------------------- large×large join, row output

def join_detail(sf_dir: str):
    """Row-level large×large equi-join (J5 id→entity resolution shape at a
    KB too big to broadcast — vectorization.py:636-645): every lineitem of
    every 97th order joined to its order row, via the shuffle hash join."""
    from ..stages.join import shuffle_hash_join

    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_linenumber", "l_quantity"])
    def every_97th(t: pa.Table) -> pa.Table:
        keys = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(keys % 97 == 0))

    li = li.map_batches(every_97th, batch_format="pyarrow",
                        zero_copy_batch=True)
    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_orderpriority", "o_totalprice"])
    joined = shuffle_hash_join(li, orders, on="l_orderkey",
                               right_on="o_orderkey", nparts=16)
    # (l_orderkey, l_linenumber) is NOT unique in this corpus — include
    # l_quantity so engine and oracle agree on a total row order
    return joined.sort(["l_orderkey", "l_linenumber", "l_quantity"])


SQL_JOIN_DETAIL = """
SELECT l_orderkey, l_linenumber, l_quantity, o_orderpriority, o_totalprice
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_orderkey % 97 = 0
ORDER BY l_orderkey, l_linenumber, l_quantity
"""


def semi_join_shuffle(sf_dir: str):
    """semi_join semantics via the co-partitioned shuffle join (how="semi")
    — the scale path when the key set outgrows a broadcast."""
    from ..stages.join import shuffle_hash_join

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _pq(sf_dir, "orders", ["o_custkey"])
    return shuffle_hash_join(cust, orders, on="c_custkey",
                             right_on="o_custkey", how="semi",
                             nparts=16).sort("c_custkey")


def semi_join_bloom(sf_dir: str):
    """Semi join at key-set sizes too large to broadcast exactly: a
    distributed Bloom filter of the right key set (per-batch filters =
    the combiner, OR-merged, fixed 128 KiB each) prunes the left side
    BEFORE the shuffle, then the exact shuffle semi join confirms the
    (few) Bloom false positives — exact result, shuffle volume reduced to
    matches + FP rate (guide: 'broadcast the key set (or a Bloom filter
    of it)')."""
    from ..stages.join import shuffle_hash_join
    from ..stages.sketches import BloomFilter

    orders = _pq(sf_dir, "orders", ["o_custkey"])

    def bloom_partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter().add_many(
            batch.column("o_custkey").to_numpy(zero_copy_only=False))
        return pa.table({"bf": pa.array([bf.serialize()], pa.binary())})

    parts = orders.map_batches(bloom_partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    acc = BloomFilter()
    for blob in parts["bf"]:
        acc.merge(BloomFilter.deserialize(blob))
    bf_ref = ray.put(acc.serialize())

    class BloomPrune:
        def __init__(self):
            self.bf = BloomFilter.deserialize(ray.get(bf_ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = self.bf.contains_many(
                batch.column("c_custkey").to_numpy(zero_copy_only=False))
            return batch.filter(pa.array(mask))

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name"])
    pruned = cust.map_batches(BloomPrune, batch_format="pyarrow",
                              concurrency=(1, 2))
    return shuffle_hash_join(pruned, orders, on="c_custkey",
                             right_on="o_custkey", how="semi",
                             nparts=16).sort("c_custkey")


def anti_join_shuffle(sf_dir: str):
    """anti_join semantics via the shuffle join (how="anti")."""
    from ..stages.join import shuffle_hash_join

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name"])
    urgent = _pq(sf_dir, "orders", ["o_custkey", "o_orderpriority"]) \
        .map_batches(
            lambda t: t.filter(pc.equal(t.column("o_orderpriority"),
                                        "1-URGENT")),
            batch_format="pyarrow", zero_copy_batch=True) \
        .select_columns(["o_custkey"])
    return shuffle_hash_join(cust, urgent, on="c_custkey",
                             right_on="o_custkey", how="anti",
                             nparts=16).sort("c_custkey")


# --------------------------------------------------------------- TPC-H Q1-style pricing summary

def pricing_summary(sf_dir: str):
    """Wide aggregation with filter pushdown at the read (SURVEY.md 'prune
    at the read'), per-batch partial agg, tiny global groupby."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") <= pc.scalar(
            pd.Timestamp("1998-09-02"))),
    )

    def partial(batch: pa.Table) -> pa.Table:
        disc = pc.multiply(batch.column("l_extendedprice"),
                           pc.subtract(1.0, batch.column("l_discount")))
        batch = batch.append_column("disc_price", disc)
        df = batch.select(["l_returnflag", "l_linestatus", "l_quantity",
                           "l_extendedprice", "disc_price"]).to_pandas()
        agg = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base=("l_extendedprice", "sum"),
            sum_disc=("disc_price", "sum"),
            n=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    part_ds = ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    from ray.data.aggregate import Sum

    out = part_ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base", alias_name="sum_base"),
        Sum("sum_disc", alias_name="sum_disc"),
        Sum("n", alias_name="n"),
    ).to_pandas()
    out["sum_base"] = out["sum_base"].round(2)
    out["sum_disc"] = out["sum_disc"].round(2)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
       count(*) AS n
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------- distinct

def distinct_values(sf_dir: str):
    """DISTINCT over two columns (set-op family, SURVEY.md §2.7): per-batch
    dedup combiner shrinks the exchange to ≤(distinct × blocks) rows, then
    one coarse partitioned dedup."""
    from ..stages.partition import partitioned_groupby

    ds = _pq(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    partial = ds.map_batches(
        lambda t: pa.Table.from_pandas(t.to_pandas().drop_duplicates(),
                                       preserve_index=False),
        batch_format="pyarrow", zero_copy_batch=True)
    out = partitioned_groupby(
        partial, "l_returnflag",
        lambda df: df.drop_duplicates(), nparts=8)
    return out.sort(["l_returnflag", "l_linestatus"])


SQL_DISTINCT_VALUES = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------- JSON attribute parse (M11)

def json_extract(sf_dir: str):
    """Defensive JSON attribute parsing (neo4j_database.py:490-534):
    extract props.k with a 0 fallback for malformed rows."""
    ds = _pq(sf_dir, "events", ["event_id", "props"])

    def parse(batch: pa.Table) -> pa.Table:
        ks = []
        for p in batch.column("props").to_pylist():
            try:
                ks.append(int(json.loads(p).get("k", 0)))
            except (ValueError, TypeError):
                ks.append(0)
        return pa.table({
            "event_id": batch.column("event_id"),
            "k": pa.array(ks, pa.int64()),
        })

    return ds.map_batches(parse, batch_format="pyarrow",
                          zero_copy_batch=True).sort("event_id").limit(1000)


SQL_JSON_EXTRACT = """
SELECT event_id, COALESCE(CAST(props->>'$.k' AS BIGINT), 0) AS k
FROM events ORDER BY event_id LIMIT 1000
"""


# --------------------------------------------------------------- streaming-shaped: tumbling window

def tumbling_window(sf_dir: str):
    """Tumbling 1-day event-time windows per event_type (the engine's
    windowed-aggregate shape: window id assigned in a vectorized
    map_batches, per-batch partial agg, tiny global groupby — Ray Data has
    no event-time runtime, so windows are plain grouped aggregation over an
    ordered log; ordering assumption: ts is event time, no late data)."""
    ds = _pq(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64())  # microseconds
        win = pc.divide(ts, 86_400_000_000)
        df = pa.table({
            "event_type": batch.column("event_type"),
            "window_id": pc.cast(win, pa.int64()),
            "value": batch.column("value"),
        }).to_pandas()
        agg = df.groupby(["event_type", "window_id"], as_index=False).agg(
            sum_value=("value", "sum"), n=("value", "size"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    from ray.data.aggregate import Sum

    out = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    out = out.groupby(["event_type", "window_id"]).aggregate(
        Sum("sum_value", alias_name="sum_value"),
        Sum("n", alias_name="n"),
    ).to_pandas()
    out["sum_value"] = out["sum_value"].round(2)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["event_type", "window_id"]).reset_index(drop=True)


SQL_TUMBLING_WINDOW = """
SELECT event_type,
       CAST(floor(epoch(ts) / 86400) AS BIGINT) AS window_id,
       ROUND(SUM(value), 2) AS sum_value,
       count(*) AS n
FROM events
GROUP BY event_type, window_id
ORDER BY event_type, window_id
"""


# --------------------------------------------------------------- streaming-shaped: session windows

SESSION_GAP_US = 1_800_000_000  # 30 min


def session_window(sf_dir: str):
    """Gap-based session windows per user (30-min inactivity gap): the
    per-key ordered-log pattern, run as ONE vectorized sessionization per
    coarse partition (sort by (user, ts), session breaks = user change OR
    gap, ids = per-user cumsum) — no per-user pandas call."""
    from ..stages.partition import partitioned_groupby

    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = df["ts"].astype("int64")
        new_user = df["user_id"].ne(df["user_id"].shift(1))
        gap = (ts - ts.shift(1)) > SESSION_GAP_US
        new = (new_user | gap)
        sid = new.groupby(df["user_id"].to_numpy()).cumsum()
        df = df.assign(session_id=sid.astype("int64"))
        out = df.groupby(["user_id", "session_id"], as_index=False).agg(
            n_events=("event_id", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            sum_value=("value", "sum"),
        )
        out["sum_value"] = out["sum_value"].round(2)
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return partitioned_groupby(
        ds, "user_id", sessions, nparts=16,
        isolate_hot=_hot_users(sf_dir)).sort(["user_id", "session_id"])


SQL_SESSION_WINDOW = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                   OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, event_id, ts, value,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       ROUND(SUM(value), 2) AS sum_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


# --------------------------------------------------------------- semi / anti join

def semi_join(sf_dir: str):
    """Customers that HAVE orders: broadcast the key set and filter inside
    map_batches (guide: 'semi/anti join — broadcast the key set (or a Bloom
    filter of it)')."""
    keys = set(_pq(sf_dir, "orders", ["o_custkey"]).unique("o_custkey"))
    ref = ray.put(keys)

    class Semi:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pd.Series(
                batch.column("c_custkey").to_numpy(zero_copy_only=False)
            ).isin(self.keys).to_numpy()
            return batch.filter(pa.array(mask))

    ds = _pq(sf_dir, "customer", ["c_custkey", "c_name"])
    return ds.map_batches(Semi, batch_format="pyarrow",
                          concurrency=(1, 2)).sort("c_custkey")


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
"""


def anti_join(sf_dir: str):
    """Customers without any URGENT order (anti join, broadcast key set of
    a filtered probe side)."""
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    urgent = orders.map_batches(
        lambda t: t.filter(pc.equal(t.column("o_orderpriority"),
                                    "1-URGENT")),
        batch_format="pyarrow", zero_copy_batch=True)
    keys = set(urgent.unique("o_custkey"))
    ref = ray.put(keys)

    class Anti:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = ~pd.Series(
                batch.column("c_custkey").to_numpy(zero_copy_only=False)
            ).isin(self.keys).to_numpy()
            return batch.filter(pa.array(mask))

    ds = _pq(sf_dir, "customer", ["c_custkey", "c_name"])
    return ds.map_batches(Anti, batch_format="pyarrow",
                          concurrency=(1, 2)).sort("c_custkey")


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


# --------------------------------------------------------------- exact count distinct

def count_distinct(sf_dir: str):
    """Exact COUNT(DISTINCT) per group: per-batch set-combiner, then a tiny
    union + count (the exact counterpart to the HLL sketch operator in
    stages/sketches.py, which pytest checks against this to ±2%)."""
    ds = _pq(sf_dir, "lineitem", ["l_returnflag", "l_partkey"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    dedup = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    from ..stages.partition import partitioned_groupby

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.drop_duplicates()
               .groupby("l_returnflag", as_index=False)["l_partkey"]
               .nunique())
        return out.rename(columns={"l_partkey": "n_parts"})

    # one coarse shuffle keyed on the group key (all rows of a flag land in
    # the same partition → nunique is exact)
    part = partitioned_groupby(dedup, "l_returnflag", per_part, nparts=8)
    out = part.to_pandas()
    out["n_parts"] = out["n_parts"].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


SQL_COUNT_DISTINCT = """
SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --------------------------------------------------------------- TPC-H Q3-style shipping priority

def shipping_priority(sf_dir: str):
    """Q3 shape: 3-way join (customer ⋈ orders ⋈ lineitem) + filters +
    grouped revenue + top-10.  The customer DIMENSION broadcasts its
    filtered key set; orders (a fact table) is never collected — it meets
    the per-batch pre-aggregated lineitem revenue in a co-partitioned
    shuffle hash join, per-partition group-sum + top-10, and only
    10 × nparts candidate rows ever reach the driver."""
    from ..stages.join import shuffle_hash_join
    from ..stages.partition import partitioned_groupby

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    seg_custs = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    seg_ref = ray.put(seg_custs)
    cutoff = pd.Timestamp("1998-01-01")

    class OrderFilter:
        def __init__(self):
            self.keys = ray.get(seg_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.less(batch.column("o_orderdate"),
                                         pa.scalar(cutoff)))
            mask = pd.Series(
                batch.column("o_custkey").to_numpy(zero_copy_only=False)
            ).isin(self.keys).to_numpy()
            return batch.filter(pa.array(mask)).select(
                ["o_orderkey", "o_orderdate"])

    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        OrderFilter, batch_format="pyarrow", concurrency=(1, 4))

    def li_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(
            batch.column("l_shipdate"),
            pa.scalar(pd.Timestamp("1997-01-01"))))
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(1.0, batch.column("l_discount")))
        df = pd.DataFrame({
            "l_orderkey": batch.column("l_orderkey")
            .to_numpy(zero_copy_only=False),
            "revenue": rev.to_numpy(zero_copy_only=False)})
        agg = df.groupby("l_orderkey", as_index=False)["revenue"].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"]).map_batches(
        li_partial, batch_format="pyarrow", zero_copy_batch=True)

    joined = shuffle_hash_join(li, orders, on="l_orderkey",
                               right_on="o_orderkey", nparts=32)

    def part_topk(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["l_orderkey", "o_orderdate"],
                         as_index=False)["revenue"].sum()
        # rank by the ROUNDED revenue (the oracle's ORDER BY key) with the
        # same o_orderkey tiebreak — pruning on unrounded values could drop
        # an order that rounds into a tie with the partition's 10th
        agg["revenue"] = agg["revenue"].round(2)
        agg = agg.sort_values(["revenue", "l_orderkey"],
                              ascending=[False, True], kind="mergesort")
        return agg.head(10)

    cand = partitioned_groupby(joined, "l_orderkey", part_topk,
                               nparts=16).to_pandas()
    if cand.empty:
        return pd.DataFrame(columns=["o_orderkey", "o_orderdate", "revenue"])
    cand = cand.rename(columns={"l_orderkey": "o_orderkey"})
    cand = cand.sort_values(["revenue", "o_orderkey"],
                            ascending=[False, True], kind="mergesort").head(10)
    return cand[["o_orderkey", "o_orderdate", "revenue"]].reset_index(drop=True)


SQL_SHIPPING_PRIORITY = """
SELECT o_orderkey, o_orderdate,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1998-01-01'
  AND l_shipdate  > DATE '1997-01-01'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


# --------------------------------------------------------------- as-of join

def asof_join(sf_dir: str):
    """AS-OF join (an operator Ray Data lacks): each event matched to the
    latest order of that customer placed at-or-before the event time.
    Expressed as a cogroup: pad-union events + orders tagged by side, ONE
    coarse shuffle on the customer key, then a vectorized
    ``pandas.merge_asof`` per partition (sorted on the time axis, ``by``
    the key).  Partitioning assumption: all rows of a key co-locate —
    guaranteed by the keyed shuffle; skewed customers salt like any hot
    join key.  Output keeps only deterministic columns (the as-of DATE,
    not an order id — ties on the date would make the id
    implementation-defined in both engines)."""
    from ..stages.join import pad_union
    from ..stages.partition import partitioned_groupby

    events = _pq(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def prep_orders(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("o_custkey").cast(pa.int64()),
            "o_orderdate": t.column("o_orderdate").cast(
                pa.timestamp("us")),
        })

    orders = orders.map_batches(prep_orders, batch_format="pyarrow",
                                zero_copy_batch=True)
    both = pad_union(
        events, orders,
        a_types={"event_id": pa.int64(), "user_id": pa.int64(),
                 "ts": pa.timestamp("us")},
        b_types={"user_id": pa.int64(), "o_orderdate": pa.timestamp("us")})

    def asof_part(df: pd.DataFrame) -> pd.DataFrame:
        ev = (df.loc[df["_side"] == 0, ["event_id", "user_id", "ts"]]
              .sort_values("ts", kind="mergesort"))
        od = (df.loc[df["_side"] == 1, ["user_id", "o_orderdate"]]
              .sort_values("o_orderdate", kind="mergesort"))
        m = pd.merge_asof(ev, od, left_on="ts", right_on="o_orderdate",
                          by="user_id", direction="backward")
        m = m.dropna(subset=["o_orderdate"])  # ASOF JOIN is inner
        m = m.rename(columns={"o_orderdate": "last_order_date"})
        return m[["event_id", "user_id", "ts", "last_order_date"]]

    # hot-USER isolation (counted on the dominant events side; isolation is
    # placement-only, so which keys are isolated never affects results)
    return partitioned_groupby(both, "user_id", asof_part, nparts=16,
                               isolate_hot=_hot_users(sf_dir)).sort("event_id")


SQL_ASOF_JOIN = """
SELECT e.event_id, e.user_id, e.ts,
       CAST(o.o_orderdate AS TIMESTAMP) AS last_order_date
FROM events e ASOF JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id
"""


# --------------------------------------------------------------- range join

RANGE_WINDOW_US = 3_600_000_000  # 1 hour


def range_join(sf_dir: str):
    """Range (interval) join — the second operator Ray Data lacks natively:
    for every event, the count of the SAME user's events in the preceding
    hour.  One keyed coarse shuffle on the user, then a fully vectorized
    per-partition kernel: sort by (user, ts) and two ``searchsorted``
    cursors per user give each row's window count without materializing
    any pair — O(n log n) per partition instead of the quadratic
    pair-explosion a naive join-then-filter would do."""
    import numpy as np

    from ..stages.partition import partitioned_groupby

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts"])

    def window_counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = df["ts"].astype("int64").to_numpy()
        n = len(df)
        out = np.empty(n, dtype=np.int64)
        uvals = df["user_id"].to_numpy()
        # vectorized segment boundaries (user changes) — no per-row scan
        bounds = np.flatnonzero(uvals[1:] != uvals[:-1]) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [n]))
        for s, e in zip(starts, ends):
            seg = ts[s:e]
            lo = np.searchsorted(seg, seg - RANGE_WINDOW_US, side="left")
            hi = np.searchsorted(seg, seg, side="left")
            out[s:e] = hi - lo
        return pd.DataFrame({"event_id": df["event_id"].to_numpy(),
                             "n_prior_1h": out})

    return partitioned_groupby(ds, "user_id", window_counts, nparts=16,
                               isolate_hot=_hot_users(sf_dir)).sort("event_id")


SQL_RANGE_JOIN = """
SELECT a.event_id, count(b.event_id) AS n_prior_1h
FROM events a LEFT JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts < a.ts
GROUP BY a.event_id ORDER BY a.event_id
"""


# --------------------------------------------------------------- grouped quantiles

def price_quantiles(sf_dir: str):
    """EXACT per-group quantiles (median / p90 of extended price per return
    flag) WITHOUT collecting any group: distributed sort on (flag, price),
    per-flag counts give each quantile's global rank, and
    ``split_at_indices`` + ``limit`` extracts only the two neighbor rows
    per rank — the driver sees a handful of boundary values, never a
    group.  Linear interpolation matches SQL percentile_cont
    bit-for-bit (no rounding: Python banker's round and SQL
    half-away-from-zero disagree at .5 boundaries)."""
    import math

    ds = _pq(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    from ray.data.aggregate import Count

    counts = (ds.groupby("l_returnflag").aggregate(Count(alias_name="n"))
              .to_pandas().sort_values("l_returnflag"))
    sorted_ds = ds.sort(["l_returnflag", "l_extendedprice"]).materialize()

    # global ranks of each (flag, quantile) lower/upper neighbor
    targets = []  # (flag, q, lower_rank, frac)
    offset = 0
    for flag, n in zip(counts["l_returnflag"], counts["n"]):
        for q in (0.5, 0.9):
            pos = q * (n - 1)
            lower = math.floor(pos)
            targets.append((flag, q, offset + lower, pos - lower))
        offset += int(n)

    total = int(counts["n"].sum())
    need = set()
    for _, _, rank, frac in targets:
        need.add(rank)
        if frac > 0 and rank + 1 < total:
            need.add(rank + 1)
    splits = sorted(need | {i + 1 for i in need})
    parts = sorted_ds.split_at_indices(splits)
    row_val: dict[int, float] = {}
    for i in sorted(need):
        seg = parts[splits.index(i) + 1]  # the [i, i+1) singleton segment
        row_val[i] = float(seg.limit(1).to_pandas()
                           ["l_extendedprice"].iloc[0])

    out = {}
    for flag, q, rank, frac in targets:
        a = row_val[rank]
        b = row_val.get(rank + 1, a) if frac > 0 else a
        out.setdefault(flag, {})[q] = a + (b - a) * frac
    res = pd.DataFrame({
        "l_returnflag": list(out),
        "p50": [out[f][0.5] for f in out],
        "p90": [out[f][0.9] for f in out],
    })
    return res.sort_values("l_returnflag").reset_index(drop=True)


SQL_PRICE_QUANTILES = """
SELECT l_returnflag,
       percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
       percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS p90
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --------------------------------------------------------------- deterministic train/test split

def dataset_split(sf_dir: str):
    """Deterministic hash-based train/test assignment (the standard
    training-data split: stable across runs, machines and partitioning —
    md5 of the id, first 4 hex digits < 0xCCCC ≈ 80% train).  Pure
    per-row map, no shuffle.  The id→string cast is a vectorized Arrow
    kernel and the per-id cost is one C-backed ``md5().digest()`` — the
    hexdigest/int-parse round trip this replaced tripled the per-row
    interpreter work."""
    import hashlib
    import numpy as np

    ds = _pq(sf_dir, "documents", ["doc_id"])

    def assign(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.string()).to_pylist()
        # first 4 hex digits == first 2 digest bytes, big-endian
        codes = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:2], "big")
             for s in ids),
            dtype=np.int64, count=len(ids))
        splits = np.where(codes < 0xCCCC, "train", "test")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "split": pa.array(splits, pa.string())})

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True).sort("doc_id")


SQL_DATASET_SPLIT = """
SELECT doc_id,
       CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                      AS INTEGER) < 52428
            THEN 'train' ELSE 'test' END AS split
FROM documents ORDER BY doc_id
"""


# --------------------------------------------------------------- corpus vocabulary heavy hitters

def token_freq(sf_dir: str):
    """Top-50 most frequent tokens across the corpus (training-data
    vocabulary stats): per-batch Counter combiner → keyed groupby sum →
    per-block partial top-k → tiny driver merge (only 50 × n_blocks
    candidate rows ever reach the driver)."""
    import re

    ds = _pq(sf_dir, "documents", ["text"])
    tok_re = re.compile(r"\S+")

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(tok_re.findall(t))
        return pa.table({"tok": pa.array(list(c.keys()), pa.string()),
                         "cnt": pa.array(list(c.values()), pa.int64())})

    from ray.data.aggregate import Sum

    counts = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
    agg = counts.groupby("tok").aggregate(Sum("cnt", alias_name="cnt"))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["cnt", "tok"], ascending=[False, True],
                              kind="mergesort").head(50)

    cand = agg.map_batches(block_topk, batch_format="pandas",
                           batch_size=None).to_pandas()
    top = cand.sort_values(["cnt", "tok"], ascending=[False, True],
                           kind="mergesort").head(50)
    top["cnt"] = top["cnt"].astype("int64")
    return top.reset_index(drop=True)


SQL_TOKEN_FREQ = r"""
SELECT tok, count(*) AS cnt
FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS tok FROM documents)
GROUP BY tok ORDER BY cnt DESC, tok LIMIT 50
"""


# --------------------------------------------------------------- per-segment stats

def segment_stats(sf_dir: str):
    """Grouped min/max/mean (mean = rounded sum/count so both engines do the
    same double division)."""
    ds = _pq(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        agg = df.groupby("c_mktsegment", as_index=False).agg(
            s=("c_acctbal", "sum"), n=("c_acctbal", "size"),
            mn=("c_acctbal", "min"), mx=("c_acctbal", "max"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    from ray.data.aggregate import Max, Min, Sum

    part = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    out = part.groupby("c_mktsegment").aggregate(
        Sum("s", alias_name="s"), Sum("n", alias_name="n"),
        Min("mn", alias_name="min_bal"), Max("mx", alias_name="max_bal"),
    ).to_pandas()
    out["avg_bal"] = (out["s"] / out["n"]).round(2)
    out["n"] = out["n"].astype("int64")
    out = out.drop(columns=["s"])
    return out[["c_mktsegment", "n", "min_bal", "max_bal", "avg_bal"]] \
        .sort_values("c_mktsegment").reset_index(drop=True)


SQL_SEGMENT_STATS = """
SELECT c_mktsegment, count(*) AS n,
       MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
       ROUND(SUM(c_acctbal) / count(*), 2) AS avg_bal
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# --------------------------------------------------------------- window: lag / delta

def event_deltas(sf_dir: str):
    """LAG window shape (an operator family Ray Data lacks natively): per
    user, each event's seconds-since-previous-event.  One keyed coarse
    shuffle, then a fully vectorized per-partition kernel: sort by
    (user, ts, event_id), shift, mask the per-user first row — no per-key
    pandas calls, no pair materialization."""
    from ..stages.partition import partitioned_groupby

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts"])

    def deltas(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = df["ts"].astype("int64")
        prev = ts.shift(1)
        same_user = df["user_id"].eq(df["user_id"].shift(1))
        delta = ((ts - prev) // 1_000_000).where(same_user)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "delta_s": delta.astype("Int64").to_numpy(),
        })

    return partitioned_groupby(ds, "user_id", deltas, nparts=16,
                               isolate_hot=_hot_users(sf_dir)).sort("event_id")


SQL_EVENT_DELTAS = """
SELECT event_id,
       CAST((epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)))
            // 1000000 AS BIGINT) AS delta_s
FROM events ORDER BY event_id
"""


# --------------------------------------------------------------- window: running sum

def running_total(sf_dir: str):
    """Cumulative-sum window per user (ROWS UNBOUNDED PRECEDING): sort
    within the partition, one vectorized groupby().cumsum() — the
    ordered-log pattern shared with session_window."""
    from ..stages.partition import partitioned_groupby

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def cumsum(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        run = df.groupby("user_id", sort=False)["value"].cumsum().round(2)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "running_value": run.to_numpy(),
        })

    return partitioned_groupby(ds, "user_id", cumsum, nparts=16,
                               isolate_hot=_hot_users(sf_dir)).sort("event_id")


SQL_RUNNING_TOTAL = """
SELECT event_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 2) AS running_value
FROM events ORDER BY event_id
"""


# --------------------------------------------------------------- grouped top-k (k > 1)

def groupby_top3(sf_dir: str):
    """Per-group top-k with k>1 and in-group ranks (T3 ranked-candidates
    shape): top-3 events per user by value, one vectorized
    sort + head-per-group per coarse partition."""
    from ..stages.partition import partitioned_groupby

    ds = _pq(sf_dir, "events", ["user_id", "event_id", "value"])

    def top3(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "value", "event_id"],
                            ascending=[True, False, True], kind="mergesort")
        g = df.groupby("user_id", sort=False)
        out = g.head(3).copy()
        out["rnk"] = out.groupby("user_id", sort=False).cumcount() + 1
        return out

    out = partitioned_groupby(ds, "user_id", top3, nparts=16,
                              isolate_hot=_hot_users(sf_dir))
    return out.sort(["user_id", "rnk"])


SQL_GROUPBY_TOP3 = """
SELECT user_id, event_id, value,
       CAST(row_number() OVER (PARTITION BY user_id
                               ORDER BY value DESC, event_id) AS BIGINT) AS rnk
FROM events
QUALIFY rnk <= 3
ORDER BY user_id, rnk
"""


# --------------------------------------------------------------- rollup (grouping sets)

def revenue_rollup(sf_dir: str):
    """ROLLUP(l_returnflag, l_linestatus): detail rows + per-flag
    subtotals + grand total, computed from ONE per-batch partial
    aggregation — the two coarser levels re-aggregate the (tiny) detail
    aggregate on the driver rather than re-scanning the fact table (the
    standard rollup-from-finest-level trick)."""
    ds = _pq(sf_dir, "lineitem", ["l_returnflag", "l_linestatus",
                                  "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(1.0, batch.column("l_discount")))
        df = pd.DataFrame({
            "l_returnflag": batch.column("l_returnflag")
            .to_numpy(zero_copy_only=False),
            "l_linestatus": batch.column("l_linestatus")
            .to_numpy(zero_copy_only=False),
            "revenue": rev.to_numpy(zero_copy_only=False)})
        agg = df.groupby(["l_returnflag", "l_linestatus"],
                         as_index=False)["revenue"].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    from ray.data.aggregate import Sum

    detail = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["l_returnflag", "l_linestatus"])
              .aggregate(Sum("revenue", alias_name="revenue")).to_pandas())
    flag = detail.groupby("l_returnflag", as_index=False)["revenue"].sum()
    flag["l_linestatus"] = None
    total = pd.DataFrame({"l_returnflag": [None], "l_linestatus": [None],
                          "revenue": [detail["revenue"].sum()]})
    out = pd.concat([detail, flag, total], ignore_index=True)
    out["revenue"] = out["revenue"].round(2)
    return (out[["l_returnflag", "l_linestatus", "revenue"]]
            .sort_values(["l_returnflag", "l_linestatus"], na_position="last")
            .reset_index(drop=True))


SQL_REVENUE_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
"""


# --------------------------------------------------------------- deterministic sample

def hash_sample(sf_dir: str):
    """Deterministic ~10% sample: keep rows whose md5(doc_id) prefix falls
    under the rate threshold — stable across runs, machines and
    partitioning (unlike random sampling, this is SQL-reproducible and
    resume-safe).  Same digest-prefix kernel as dataset_split."""
    import hashlib
    import numpy as np

    ds = _pq(sf_dir, "documents", ["doc_id", "n_chars"])

    def keep(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.string()).to_pylist()
        codes = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:2], "big")
             for s in ids),
            dtype=np.int64, count=len(ids))
        return batch.filter(pa.array(codes < 6554))  # 6554/65536 ≈ 10%

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True).sort("doc_id")


SQL_HASH_SAMPLE = """
SELECT doc_id, n_chars FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
      < 6554
ORDER BY doc_id
"""


# --------------------------------------------------------------- 3-hop join chain

def multi_join_chain(sf_dir: str):
    """TPC-H-Q5-shaped 3-hop join: revenue per nation through
    lineitem ⋈ orders ⋈ customer ⋈ nation.  Scale discipline on display:
    the two fact-sized hops are co-partitioned shuffle joins
    (stages/join.py), the revenue rollup is pushed BELOW the second
    shuffle (per-customer partial aggregate, so the custkey exchange moves
    one row per customer per block instead of one per lineitem), and the
    25-row nation dim is a ray.put broadcast — never a shuffle."""
    from ray.data.aggregate import Sum

    from ..stages.join import shuffle_hash_join

    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j1 = shuffle_hash_join(li, orders, on="l_orderkey",
                           right_on="o_orderkey", nparts=32)

    def per_cust(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(1.0, batch.column("l_discount")))
        df = pd.DataFrame({
            "o_custkey": batch.column("o_custkey")
            .to_numpy(zero_copy_only=False),
            "revenue": rev.to_numpy(zero_copy_only=False)})
        agg = df.groupby("o_custkey", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("revenue", "size"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    per_cust_ds = (j1.map_batches(per_cust, batch_format="pyarrow",
                                  zero_copy_batch=True)
                   .groupby("o_custkey").aggregate(
                       Sum("revenue", alias_name="revenue"),
                       Sum("n_items", alias_name="n_items")))

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j2 = shuffle_hash_join(per_cust_ds, cust, on="o_custkey",
                           right_on="c_custkey", nparts=16)

    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nmap_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    class AddNation:
        def __init__(self):
            self.nmap = ray.get(nmap_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            names = pd.Series(
                batch.column("c_nationkey").to_numpy(zero_copy_only=False)
            ).map(self.nmap)
            return batch.append_column(
                "n_name", pa.array(names.to_numpy(), pa.string()))

    out = (j2.map_batches(AddNation, batch_format="pyarrow",
                          concurrency=(1, 2))
           .groupby("n_name").aggregate(
               Sum("revenue", alias_name="revenue"),
               Sum("n_items", alias_name="n_items")).to_pandas())
    out["revenue"] = out["revenue"].round(2)
    out["n_items"] = out["n_items"].astype("int64")
    return out.sort_values("n_name").reset_index(drop=True)


SQL_MULTI_JOIN_CHAIN = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


# --------------------------------------------------------------- conditional-agg pivot

def pivot_counts(sf_dir: str):
    """Conditional aggregation / pivot: per-language document-length
    histogram as wide columns (COUNT FILTER shape).  One per-batch
    combiner (boolean-mask sums over the 5-key group) + tiny global sum —
    the fact table never shuffles row-level."""
    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "documents", ["lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        nc = df["n_chars"]
        g = pd.DataFrame({
            "lang": df["lang"],
            "n_docs": np.ones(len(df), dtype=np.int64),
            "n_short": (nc < 500).astype("int64"),
            "n_mid": ((nc >= 500) & (nc < 2000)).astype("int64"),
            "n_long": (nc >= 2000).astype("int64"),
            "chars": nc,
        }).groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("lang").aggregate(
               Sum("n_docs", alias_name="n_docs"),
               Sum("n_short", alias_name="n_short"),
               Sum("n_mid", alias_name="n_mid"),
               Sum("n_long", alias_name="n_long"),
               Sum("chars", alias_name="chars")).to_pandas())
    out["avg_chars"] = _round_half_away(
        (out["chars"] / out["n_docs"]).to_numpy(), 2)
    for c in ("n_docs", "n_short", "n_mid", "n_long"):
        out[c] = out[c].astype("int64")
    out = out.drop(columns=["chars"])
    return out.sort_values("lang").reset_index(drop=True)


SQL_PIVOT_COUNTS = """
SELECT lang, count(*) AS n_docs,
       count(*) FILTER (WHERE n_chars < 500) AS n_short,
       count(*) FILTER (WHERE n_chars >= 500 AND n_chars < 2000) AS n_mid,
       count(*) FILTER (WHERE n_chars >= 2000) AS n_long,
       ROUND(SUM(n_chars) / count(*), 2) AS avg_chars
FROM documents GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------- window: sliding mean

def moving_average(sf_dir: str):
    """Sliding-window mean (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW): per
    user trailing 3-row average, vectorized via masked shifts within the
    sorted partition (no per-key rolling calls).

    The oracle spells the frame as explicit ``lag()`` terms rather than
    ``AVG() OVER`` because windowed-aggregate engines accumulate the frame
    sum in engine-specific order (DuckDB's incremental frame sum differs
    from a fresh 3-term sum in the last ulp, which ROUND then amplifies at
    .xx5 boundaries ~0.1% of rows); the lag form pins the addition order
    to (v₋₂ + v₋₁) + v in BOTH engines, making the double bit-identical."""
    from ..stages.partition import partitioned_groupby

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def mov(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        v = df["value"].to_numpy()
        u = df["user_id"].to_numpy()
        same1 = np.zeros(len(df), dtype=bool)
        same1[1:] = u[1:] == u[:-1]
        same2 = np.zeros(len(df), dtype=bool)
        same2[1:] = same1[1:] & same1[:-1]       # contiguous after the sort
        v1 = np.empty_like(v)
        v1[1:] = v[:-1]
        v2 = np.empty_like(v)
        v2[2:] = v[:-2]
        s = np.where(same2, v2, 0.0) + np.where(same1, v1, 0.0) + v
        nterms = 1 + same1.astype(np.int64) + same2.astype(np.int64)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "avg3": _round_half_away(s / nterms, 2),
        })

    return partitioned_groupby(ds, "user_id", mov, nparts=16,
                               isolate_hot=_hot_users(sf_dir)).sort("event_id")


SQL_MOVING_AVERAGE = """
SELECT event_id,
       ROUND(((COALESCE(lag(value, 2) OVER w, 0)
               + COALESCE(lag(value, 1) OVER w, 0)) + value)
             / (1 + CASE WHEN lag(value, 1) OVER w IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN lag(value, 2) OVER w IS NULL THEN 0 ELSE 1 END),
             2) AS avg3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""


# --------------------------------------------------------------- dense-rank top-k

def dense_rank_topk(sf_dir: str):
    """DENSE_RANK window with ties kept: per market segment, every
    customer whose balance is among the segment's top-3 DISTINCT
    balances.  Scale shape: a per-batch prune keeps only rows in the
    batch's own top-3 distinct values (a guaranteed superset — a row's
    dense rank in any subset containing it is ≤ its global rank), then one
    driver-side finish over the tiny candidate set."""
    ds = _pq(sf_dir, "customer",
             ["c_mktsegment", "c_custkey", "c_name", "c_acctbal"])

    def prune(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        r = df.groupby("c_mktsegment")["c_acctbal"].rank(
            method="dense", ascending=False)
        return pa.Table.from_pandas(df[r <= 3], preserve_index=False)

    cand = ds.map_batches(prune, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    r = cand.groupby("c_mktsegment")["c_acctbal"].rank(
        method="dense", ascending=False)
    out = cand[r <= 3].copy()
    out["rnk"] = r[r <= 3].astype("int64")
    return (out[["c_mktsegment", "c_custkey", "c_name", "c_acctbal", "rnk"]]
            .sort_values(["c_mktsegment", "rnk", "c_custkey"])
            .reset_index(drop=True))


SQL_DENSE_RANK_TOPK = """
SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
       CAST(dense_rank() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC) AS BIGINT) AS rnk
FROM customer QUALIFY rnk <= 3
ORDER BY c_mktsegment, rnk, c_custkey
"""


# --------------------------------------------------------------- per-lang document-frequency vocabulary

def doc_freq_vocab(sf_dir: str):
    """Per-language document-frequency vocabulary (the expensive half of a
    TF-IDF pass over a training corpus): for every language, the 20 tokens
    that appear in the most documents.  Scale shape mirrors ``token_freq``:
    a per-batch combiner counts each token ONCE per document (set
    semantics, so a batch emits at most |vocab| rows regardless of token
    repetitions), a keyed groupby sums the partials, and a per-block top-k
    prune means only 20 × langs × blocks candidate rows ever reach the
    driver.  Output is integer-pure (df counts), so the SQL hash check is
    exact by construction."""
    import re
    from collections import Counter

    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "documents", ["lang", "text"])
    tok_re = re.compile(r"\S+")

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        langs = batch.column("lang").to_pylist()
        for lang, t in zip(langs, batch.column("text").to_pylist()):
            for tok in set(tok_re.findall(t)):
                c[(lang, tok)] += 1
        keys = list(c.keys())
        return pa.table({
            "lang": pa.array([k[0] for k in keys], pa.string()),
            "tok": pa.array([k[1] for k in keys], pa.string()),
            "df": pa.array(list(c.values()), pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .groupby(["lang", "tok"]).aggregate(Sum("df", alias_name="df"))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "df", "tok"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("lang", as_index=False).head(20)

    cand = agg.map_batches(block_topk, batch_format="pandas",
                           batch_size=None).to_pandas()
    cand = cand.sort_values(["lang", "df", "tok"],
                            ascending=[True, False, True], kind="mergesort")
    top = cand.groupby("lang", as_index=False).head(20).copy()
    top["df"] = top["df"].astype("int64")
    return top[["lang", "tok", "df"]].reset_index(drop=True)


SQL_DOC_FREQ_VOCAB = r"""
WITH t AS (
  SELECT lang, unnest(list_distinct(regexp_extract_all(text, '\S+'))) AS tok
  FROM documents
), d AS (
  SELECT lang, tok, count(*) AS df FROM t GROUP BY lang, tok
)
SELECT lang, tok, df FROM (
  SELECT lang, tok, df,
         row_number() OVER (PARTITION BY lang
                            ORDER BY df DESC, tok) AS rn
  FROM d) WHERE rn <= 20
ORDER BY lang, df DESC, tok
"""


# --------------------------------------------------------------- grouped Pearson correlation

def corr_by_group(sf_dir: str):
    """Pearson correlation of extended price vs quantity per return flag —
    the one-pass SUFFICIENT-STATISTICS pattern: each batch emits six
    numbers per group (n, Σx, Σy, Σxy, Σx², Σy²), a keyed groupby sums
    them, and the driver finishes with the closed-form correlation on a
    groups-sized frame.  No shuffle of fact rows, no second pass — the
    canonical way to do grouped statistics (corr/cov/var/stddev) over a
    corpus too large to sort or collect."""
    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "lineitem",
             ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": batch.column("l_returnflag").to_pandas(),
            "x": batch.column("l_quantity").to_numpy(zero_copy_only=False),
            "y": batch.column("l_extendedprice")
            .to_numpy(zero_copy_only=False)})
        df["xy"] = df["x"] * df["y"]
        df["xx"] = df["x"] * df["x"]
        df["yy"] = df["y"] * df["y"]
        agg = df.groupby("g", as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum"), syy=("yy", "sum"))
        # empty batches degrade pandas dtypes/schema; emit a typed empty
        return pa.Table.from_pandas(agg, preserve_index=False, schema=pa.schema([
            ("g", pa.string()), ("n", pa.int64()), ("sx", pa.float64()),
            ("sy", pa.float64()), ("sxy", pa.float64()),
            ("sxx", pa.float64()), ("syy", pa.float64())]))

    out = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .groupby("g").aggregate(
                Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
                Sum("sxx", alias_name="sxx"), Sum("syy", alias_name="syy")) \
            .to_pandas()
    n = out["n"].astype("float64")
    cov = n * out["sxy"] - out["sx"] * out["sy"]
    vx = n * out["sxx"] - out["sx"] ** 2
    vy = n * out["syy"] - out["sy"] ** 2
    out["corr_qty_price"] = _round_half_away(
        (cov / np.sqrt(vx * vy)).to_numpy(), 4)
    out["n"] = out["n"].astype("int64")
    out = out.rename(columns={"g": "l_returnflag"})
    return out[["l_returnflag", "n", "corr_qty_price"]] \
        .sort_values("l_returnflag").reset_index(drop=True)


SQL_CORR_BY_GROUP = """
SELECT l_returnflag, count(*) AS n,
       ROUND(corr(l_extendedprice, l_quantity), 4) AS corr_qty_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --------------------------------------------------------------- stratified deterministic sample

def stratified_sample(sf_dir: str):
    """Per-stratum deterministic sample: the 5 documents per language with
    the smallest md5(doc_id) digests — hash-ordered, so the sample is
    stable across runs, machines, partitioning and resumes (the property
    training-data pipelines need for reproducible eval splits).  Scale
    shape: per-block per-lang top-5 prune (a superset of the global
    answer by the same subset argument as dense_rank_topk), then a tiny
    driver merge of 5 × langs × blocks candidates."""
    import hashlib

    ds = _pq(sf_dir, "documents", ["doc_id", "lang"])

    def tag(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.string()).to_pylist()
        h = [hashlib.md5(s.encode()).hexdigest() for s in ids]
        df = pd.DataFrame({
            "lang": batch.column("lang").to_pandas(),
            "doc_id": batch.column("doc_id").to_numpy(zero_copy_only=False),
            "h": h})
        df = df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        return pa.Table.from_pandas(df.groupby("lang", as_index=False)
                                    .head(5), preserve_index=False)

    cand = ds.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    cand = cand.sort_values(["lang", "h", "doc_id"], kind="mergesort")
    out = cand.groupby("lang", as_index=False).head(5)
    return out[["lang", "doc_id"]].sort_values(["lang", "doc_id"]) \
        .reset_index(drop=True)


SQL_STRATIFIED_SAMPLE = """
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn
  FROM documents) WHERE rn <= 5
ORDER BY lang, doc_id
"""


# --------------------------------------------------------------- full outer shuffle join

def outer_join_full(sf_dir: str):
    """Per-customer revenue in 1994 vs 1995 via a FULL OUTER
    co-partitioned shuffle join (``shuffle_hash_join(how="outer")``) —
    customers active in only one of the years keep their row with a -1.0
    sentinel on the silent side (COALESCE parity with the SQL oracle).
    Scale shape: each year's side is a per-batch partial sum combiner
    over orders followed by a small keyed groupby (per-customer sums,
    never raw fact rows, enter the join shuffle); the outer join itself
    is the one wide exchange, and only the 200-row sorted head reaches
    the driver."""
    from ray.data.aggregate import Sum

    from ..stages.join import shuffle_hash_join

    orders = _pq(sf_dir, "orders",
                 ["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        # ONE scan feeds both join sides: year folded into the group key
        # (custkey·2 + year-bit) so the combiner + groupby stay single-
        # column; the sides split off the materialized (small) aggregate
        yr = pc.year(batch.column("o_orderdate"))
        sub = batch.filter(pc.is_in(yr, value_set=pa.array([1994, 1995])))
        yr = pc.year(sub.column("o_orderdate")).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({
            "key": sub.column("o_custkey").to_numpy(zero_copy_only=False)
            * 2 + (yr - 1994),
            "rev": sub.column("o_totalprice")
            .to_numpy(zero_copy_only=False)})
        agg = df.groupby("key", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(
            agg, preserve_index=False,
            schema=pa.schema([("key", pa.int64()), ("rev", pa.float64())]))

    agg = (orders.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("key").aggregate(Sum("rev", alias_name="rev"))
           .materialize())  # customer-year-sized; read by both sides

    def side(year_bit: int, name: str):
        def f(b: pa.Table) -> pa.Table:
            keep = pc.equal(pc.bit_wise_and(b.column("key"), 1), year_bit)
            sub = b.filter(keep)
            return pa.table({
                "custkey": pc.shift_right(sub.column("key"), 1),
                name: sub.column("rev")})
        return f

    a = agg.map_batches(side(0, "rev_1994"), batch_format="pyarrow",
                        zero_copy_batch=True)
    b = agg.map_batches(side(1, "rev_1995"), batch_format="pyarrow",
                        zero_copy_batch=True)
    j = shuffle_hash_join(
        a, b, on="custkey", how="outer", nparts=8,
        ltypes={"custkey": pa.int64(), "rev_1994": pa.float64()},
        rtypes={"custkey": pa.int64(), "rev_1995": pa.float64()})
    out = j.sort("custkey").limit(200).to_pandas()
    for c in ("rev_1994", "rev_1995"):
        vals = _round_half_away(out[c].to_numpy(dtype="float64"), 2)
        out[c] = np.where(np.isnan(vals), -1.0, vals)
    out["custkey"] = out["custkey"].astype("int64")
    return out[["custkey", "rev_1994", "rev_1995"]].reset_index(drop=True)


SQL_OUTER_JOIN_FULL = """
WITH a AS (
  SELECT o_custkey AS custkey, ROUND(SUM(o_totalprice), 2) AS rev_1994
  FROM orders WHERE year(o_orderdate) = 1994 GROUP BY 1),
b AS (
  SELECT o_custkey AS custkey, ROUND(SUM(o_totalprice), 2) AS rev_1995
  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1)
SELECT custkey,
       COALESCE(rev_1994, -1.0) AS rev_1994,
       COALESCE(rev_1995, -1.0) AS rev_1995
FROM a FULL OUTER JOIN b USING (custkey)
ORDER BY custkey LIMIT 200
"""


# --------------------------------------------------------------- grouped mode

def groupby_mode(sf_dir: str):
    """Modal market segment per nation — grouped MODE with a
    deterministic smallest-value tiebreak.  Scale shape: a per-batch
    (group, value) count combiner, one keyed groupby summing the counts
    (the only shuffle, |groups × values|-sized, not row-sized), then a
    per-block argmax prune — the global winner beats every same-group row
    in its own block, so block-top-1 → driver-top-1 is exact
    (max-of-maxes), and only groups × blocks candidate rows reach the
    driver."""
    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "c_nationkey": batch.column("c_nationkey")
            .to_numpy(zero_copy_only=False),
            "mode_segment": batch.column("c_mktsegment")
            .to_numpy(zero_copy_only=False)})
        agg = (df.groupby(["c_nationkey", "mode_segment"], as_index=False)
               .size().rename(columns={"size": "n"}))
        return pa.Table.from_pandas(
            agg, preserve_index=False,
            schema=pa.schema([("c_nationkey", pa.int64()),
                              ("mode_segment", pa.string()),
                              ("n", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["c_nationkey", "mode_segment"])
           .aggregate(Sum("n", alias_name="n")))

    def block_top1(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["c_nationkey", "n", "mode_segment"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("c_nationkey", as_index=False).head(1)

    cand = agg.map_batches(block_top1, batch_format="pandas",
                           batch_size=None).to_pandas()
    cand = cand.sort_values(["c_nationkey", "n", "mode_segment"],
                            ascending=[True, False, True], kind="mergesort")
    out = cand.groupby("c_nationkey", as_index=False).head(1).copy()
    out["c_nationkey"] = out["c_nationkey"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return (out[["c_nationkey", "mode_segment", "n"]]
            .sort_values("c_nationkey").reset_index(drop=True))


SQL_GROUPBY_MODE = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       c_mktsegment AS mode_segment, n FROM (
  SELECT c_nationkey, c_mktsegment, count(*) AS n,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY count(*) DESC, c_mktsegment) AS rn
  FROM customer GROUP BY c_nationkey, c_mktsegment) WHERE rn = 1
ORDER BY c_nationkey
"""


# --------------------------------------------------------------- per-doc TF-IDF top terms

def tfidf_top_terms(sf_dir: str):
    """Top-3 TF-IDF terms per document (vocabulary = tokens appearing in
    ≥2 documents — the standard min-df cut, stated in both engines).
    Scale shape: pass 1 builds the document-frequency map with the same
    set-semantics combiner as ``doc_freq_vocab`` (a batch emits at most
    |vocab| rows) and BROADCASTS it once via ``ray.put`` — vocabulary-
    sized, not corpus-sized; pass 2 is embarrassingly parallel: each
    batch scores its own documents against the broadcast map (tf from a
    per-doc token count, idf = ln(N/df)) and emits only 3 rows per doc.
    Token rows are never shuffled.  Scores stay unrounded through the
    ranking (both engines rank the same float64 bits) and are rounded to
    4 decimals only for display/hashing."""
    import math
    import re
    from collections import Counter

    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()
    tok_re = re.compile(r"\S+")

    def df_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            for tok in set(tok_re.findall(t)):
                c[tok] += 1
        return pa.table({"tok": pa.array(list(c.keys()), pa.string()),
                         "df": pa.array(list(c.values()), pa.int64())})

    dft = (ds.map_batches(df_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("tok").aggregate(Sum("df", alias_name="df"))
           .to_pandas())
    dfmap = {t: int(n) for t, n in zip(dft["tok"], dft["df"]) if n >= 2}
    ref = ray.put(dfmap)

    class Score:
        def __init__(self, df_ref, n):
            self.dfmap = ray.get(df_ref)   # once per actor
            self.n = float(n)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, toks_out, scores = [], [], []
            for did, t in zip(batch.column("doc_id").to_pylist(),
                              batch.column("text").to_pylist()):
                toks = tok_re.findall(t)
                if not toks:
                    continue
                length = float(len(toks))
                scored = [((c / length) * math.log(self.n / self.dfmap[tok]),
                           tok)
                          for tok, c in Counter(toks).items()
                          if tok in self.dfmap]
                scored.sort(key=lambda s: (-s[0], s[1]))
                for sc, tok in scored[:3]:
                    ids.append(did)
                    toks_out.append(tok)
                    scores.append(sc)
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "tok": pa.array(toks_out, pa.string()),
                             "tfidf": pa.array(scores, pa.float64())})

    out = (ds.map_batches(Score, fn_constructor_args=(ref, n_docs),
                          batch_format="pyarrow", zero_copy_batch=True,
                          concurrency=(2, 8))
           .to_pandas())
    out = out.sort_values(["doc_id", "tfidf", "tok"],
                          ascending=[True, False, True], kind="mergesort")
    out["tfidf"] = _round_half_away(out["tfidf"].to_numpy(), 4)
    return out[["doc_id", "tok", "tfidf"]].reset_index(drop=True)


SQL_TFIDF_TOP_TERMS = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS cnt FROM tok GROUP BY doc_id, tok
), dl AS (
  SELECT doc_id, count(*) AS len FROM tok GROUP BY doc_id
), df AS (
  SELECT tok, count(*) AS df FROM (
    SELECT DISTINCT doc_id, tok FROM tok) GROUP BY tok
  HAVING count(*) >= 2
), n AS (SELECT count(*) AS n FROM documents)
SELECT doc_id, tok, ROUND(score, 4) AS tfidf FROM (
  SELECT tf.doc_id, tf.tok,
         (CAST(cnt AS DOUBLE) / len) * ln(CAST(n.n AS DOUBLE) / df.df)
           AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY (CAST(cnt AS DOUBLE) / len)
                    * ln(CAST(n.n AS DOUBLE) / df.df) DESC, tf.tok) AS rn
  FROM tf
  JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN n) t
WHERE rn <= 3
ORDER BY doc_id, rn
"""


# --------------------------------------------------------------- weighted deterministic sample

def weighted_sample(sf_dir: str):
    """Deterministic weighted sample (Efraimidis–Spirakis A-Res, Inf.
    Proc. Lett. 2006): 30 documents drawn with probability proportional
    to length — the quality/length-weighted corpus subsampling every
    training-data pipeline needs, made reproducible by deriving each
    doc's uniform from md5(doc_id) instead of an RNG.  Key = ln(u)/w
    (monotone with the paper's u^(1/w)); top-30 keys win.  Scale shape:
    per-block top-30 prune (superset argument), driver merges 30 ×
    blocks candidates.  Zero-weight docs are excluded in both engines
    (ln(u)/0 undefined)."""
    import hashlib
    import math

    ds = _pq(sf_dir, "documents", ["doc_id", "n_chars"])

    def tag(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "doc_id": batch.column("doc_id").to_numpy(zero_copy_only=False),
            "n_chars": batch.column("n_chars")
            .to_numpy(zero_copy_only=False)})
        df = df[df["n_chars"] > 0]
        u = np.array([
            (int.from_bytes(hashlib.md5(str(i).encode()).digest()[:4],
                            "big") + 0.5) / 4294967296.0
            for i in df["doc_id"]])
        df["s"] = np.log(u) / df["n_chars"].to_numpy(dtype="float64")
        df = df.sort_values(["s", "doc_id"], ascending=[False, True],
                            kind="mergesort")
        return pa.Table.from_pandas(df.head(30), preserve_index=False)

    cand = ds.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    cand = cand.sort_values(["s", "doc_id"], ascending=[False, True],
                            kind="mergesort").head(30)
    out = cand[["doc_id", "n_chars"]].copy()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_chars"] = out["n_chars"].astype("int64")
    return out.reset_index(drop=True)


SQL_WEIGHTED_SAMPLE = """
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) + 0.5) / 4294967296.0) / n_chars AS s
  FROM documents WHERE n_chars > 0)
ORDER BY s DESC, doc_id LIMIT 30
"""


# --------------------------------------------------------------- grouped collect (string_agg)

def collect_segments(sf_dir: str):
    """Per-nation sorted distinct market-segment list as one string —
    grouped COLLECT/string_agg semantics.  Scale shape: per-batch
    (nation, segment) DISTINCT combiner (emits at most groups × values
    rows per batch), keyed coarse partitioned dedup+collect, driver sees
    only the groups-sized result.  The collected value is a bounded
    vocabulary (segments), not row data — the only regime where a
    collect is scale-sane, stated here as the operator's contract."""
    from ..stages.partition import partitioned_groupby

    ds = _pq(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])

    def distinct_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "c_nationkey": batch.column("c_nationkey")
            .to_numpy(zero_copy_only=False),
            "seg": batch.column("c_mktsegment")
            .to_numpy(zero_copy_only=False)}).drop_duplicates()
        return pa.Table.from_pandas(
            df, preserve_index=False,
            schema=pa.schema([("c_nationkey", pa.int64()),
                              ("seg", pa.string())]))

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates().sort_values(["c_nationkey", "seg"],
                                              kind="mergesort")
        return (df.groupby("c_nationkey", as_index=False)["seg"]
                .agg(lambda s: ",".join(s))
                .rename(columns={"seg": "segments"}))

    pre = ds.map_batches(distinct_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    out = partitioned_groupby(pre, "c_nationkey", collect,
                              nparts=8).to_pandas()
    out["c_nationkey"] = out["c_nationkey"].astype("int64")
    return (out[["c_nationkey", "segments"]]
            .sort_values("c_nationkey").reset_index(drop=True))


SQL_COLLECT_SEGMENTS = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
         AS segments
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
"""


# --------------------------------------------------------------- event funnel

def funnel_counts(sf_dir: str):
    """3-stage event funnel (view → click → purchase, each stage strictly
    at-or-after the previous stage's FIRST occurrence): how many users
    reach each stage.  The holistic per-user chain (stage-2's cutoff
    depends on stage-1's min) needs every event of a user together, so
    the shape is ONE hash shuffle on user_id (``partitioned_groupby``)
    with a fully vectorized per-partition kernel (three groupby-min
    passes joined through maps — no per-user Python loop), then each
    partition emits ONE row of stage counts and the driver sums a
    partitions-sized frame."""
    from ..stages.partition import partitioned_groupby

    ds = _pq(sf_dir, "events", ["user_id", "event_type", "ts"])

    def prefilter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(
            batch.column("event_type"),
            value_set=pa.array(["view", "click", "purchase"])))

    def funnel_partition(df: pd.DataFrame) -> pd.DataFrame:
        t1 = (df[df["event_type"] == "view"]
              .groupby("user_id")["ts"].min())
        c = df[df["event_type"] == "click"].copy()
        c = c[c["user_id"].isin(t1.index)]
        c = c[c["ts"] >= c["user_id"].map(t1)]
        t2 = c.groupby("user_id")["ts"].min()
        p = df[df["event_type"] == "purchase"].copy()
        p = p[p["user_id"].isin(t2.index)]
        p = p[p["ts"] >= p["user_id"].map(t2)]
        t3 = p.groupby("user_id")["ts"].min()
        return pd.DataFrame({"n_view": [int(len(t1))],
                             "n_view_click": [int(len(t2))],
                             "n_funnel_complete": [int(len(t3))]})

    part = partitioned_groupby(
        ds.map_batches(prefilter, batch_format="pyarrow",
                       zero_copy_batch=True),
        "user_id", funnel_partition, nparts=8).to_pandas()
    out = part.sum().to_frame().T.astype("int64")
    return out[["n_view", "n_view_click", "n_funnel_complete"]] \
        .reset_index(drop=True)


SQL_FUNNEL_COUNTS = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= t1.t1 GROUP BY e.user_id),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= t2.t2 GROUP BY e.user_id)
SELECT (SELECT count(*) FROM t1) AS n_view,
       (SELECT count(*) FROM t2) AS n_view_click,
       (SELECT count(*) FROM t3) AS n_funnel_complete
"""


# --------------------------------------------------------------- per-source corpus rollup

def source_stats(sf_dir: str):
    """Per-source corpus rollup (the per-domain aggregation every
    web-corpus pipeline runs before domain-level filtering): document
    count, total characters, total whitespace tokens.  Integer-pure by
    construction (counts and integer sums only — the hash check is exact
    with no rounding caveats).  Scale shape: Arrow kernels compute
    per-row token counts, a per-batch combiner collapses to one row per
    (source) per batch, and the keyed groupby moves only
    sources × batches rows."""
    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "documents", ["source", "text", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.cast(pc.count_substring_regex(batch.column("text"),
                                                r"\S+"), pa.int64())
        df = pd.DataFrame({
            "source": batch.column("source").to_numpy(zero_copy_only=False),
            "n_docs": np.ones(batch.num_rows, dtype="int64"),
            "total_chars": batch.column("n_chars")
            .to_numpy(zero_copy_only=False),
            "total_tokens": toks.to_numpy(zero_copy_only=False)})
        agg = df.groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(
            agg, preserve_index=False,
            schema=pa.schema([("source", pa.string()),
                              ("n_docs", pa.int64()),
                              ("total_chars", pa.int64()),
                              ("total_tokens", pa.int64())]))

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("source")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("total_chars", alias_name="total_chars"),
                      Sum("total_tokens", alias_name="total_tokens"))
           .to_pandas())
    for c in ("n_docs", "total_chars", "total_tokens"):
        out[c] = out[c].astype("int64")
    return (out[["source", "n_docs", "total_chars", "total_tokens"]]
            .sort_values("source").reset_index(drop=True))


SQL_SOURCE_STATS = r"""
SELECT source, count(*) AS n_docs, sum(n_chars) AS total_chars,
       sum(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT))
         AS total_tokens
FROM documents GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------- fixed-width histogram

def price_histogram(sf_dir: str):
    """Fixed-width histogram of lineitem extended price (20 buckets of
    width 5000) — the data-profiling primitive behind every schema/
    distribution report.  Integer-pure: bucket ids from floor division,
    counts from a per-batch bincount combiner, one tiny keyed groupby;
    the hash check is exact with no float caveats."""
    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "lineitem", ["l_extendedprice"])
    width = 5000.0

    def partial(batch: pa.Table) -> pa.Table:
        p = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        b = np.minimum(np.floor(p / width).astype("int64"), 19)
        counts = np.bincount(b, minlength=20)
        return pa.table({"bucket": pa.array(np.arange(20), pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bucket").aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    out = out[out["n"] > 0]
    out["bucket"] = out["bucket"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


SQL_PRICE_HISTOGRAM = """
SELECT bucket, count(*) AS n FROM (
  SELECT least(CAST(floor(l_extendedprice / 5000.0) AS BIGINT), 19)
    AS bucket FROM lineitem) t
GROUP BY bucket ORDER BY bucket
"""


# --------------------------------------------------------------- event transition matrix

def event_transitions(sf_dir: str):
    """Event-type transition matrix (Markov counts): for every user's
    event sequence ordered by (ts, event_id), count consecutive
    type→type transitions across all users.  The holistic per-user
    kernel shape again — ONE hash shuffle on user_id, a vectorized
    in-partition sort + shift (no per-user loop), per-partition
    (from, to) count combiner, then a tiny keyed groupby.  Integer-pure
    output."""
    from ray.data.aggregate import Sum

    from ..stages.partition import partitioned_groupby

    ds = _pq(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def transitions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        same_user = df["user_id"].to_numpy()[1:] == \
            df["user_id"].to_numpy()[:-1]
        frm = df["event_type"].to_numpy()[:-1][same_user]
        to = df["event_type"].to_numpy()[1:][same_user]
        out = (pd.DataFrame({"type_from": frm, "type_to": to})
               .groupby(["type_from", "type_to"], as_index=False)
               .size().rename(columns={"size": "n"}))
        return pd.DataFrame({
            "type_from": out["type_from"].astype(str),
            "type_to": out["type_to"].astype(str),
            "n": out["n"].astype("int64")})

    agg = (partitioned_groupby(ds, "user_id", transitions, nparts=8)
           .groupby(["type_from", "type_to"])
           .aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    agg["n"] = agg["n"].astype("int64")
    return (agg[["type_from", "type_to", "n"]]
            .sort_values(["type_from", "type_to"]).reset_index(drop=True))


SQL_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events)
SELECT event_type AS type_from, next_type AS type_to, count(*) AS n
FROM seq WHERE next_type IS NOT NULL
GROUP BY 1, 2 ORDER BY type_from, type_to
"""


# --------------------------------------------------------------- per-label embedding centroid

CENTROID_DIM_STRIDE = 4096  # packed key = label·stride + dim


def centroid_sum_partial(batch: pa.Table) -> pa.Table:
    """Per-batch centroid combiner shared by ``centroid_by_label`` and
    ``ann.nearest_centroid_accuracy``: float64 per-label sum-vector +
    count, the (label, dim) pair packed into one int64 key.  Empty-batch
    safe; raises loudly if dims outgrow the packing stride (silent key
    collisions would merge unrelated cells)."""
    n = batch.num_rows
    if n == 0:
        return pa.table({"key": pa.array([], pa.int64()),
                         "s": pa.array([], pa.float64()),
                         "cnt": pa.array([], pa.int64())})
    flat = pc.list_flatten(batch.column("embedding")) \
        .to_numpy(zero_copy_only=False).astype("float64")
    d = len(flat) // n
    if d > CENTROID_DIM_STRIDE:
        raise ValueError(f"embedding dim {d} exceeds the packed-key "
                         f"stride {CENTROID_DIM_STRIDE}; widen "
                         "CENTROID_DIM_STRIDE")
    m = flat.reshape(n, d)
    labels = batch.column("label").to_numpy(zero_copy_only=False)
    keys, sums, cnts = [], [], []
    for lab in np.unique(labels):
        rows = m[labels == lab]
        keys.append(int(lab) * CENTROID_DIM_STRIDE
                    + np.arange(d, dtype="int64"))
        sums.append(rows.sum(axis=0))
        cnts.append(np.full(d, rows.shape[0], dtype="int64"))
    return pa.table({"key": pa.array(np.concatenate(keys), pa.int64()),
                     "s": pa.array(np.concatenate(sums), pa.float64()),
                     "cnt": pa.array(np.concatenate(cnts), pa.int64())})


def centroid_by_label(sf_dir: str):
    """Per-label embedding centroid (the class-centroid primitive behind
    nearest-centroid classification, IVF coarse quantizers and cluster
    drift monitoring): mean vector per label over the embeddings table.
    Scale shape: per-batch float64 sum-vector + count per label (a batch
    emits labels × dims combiner rows, never raw vectors), the (label,
    dim) pair packed into ONE int64 key for the keyed groupby (the
    engine's measured rule: never shuffle-aggregate on multi-column
    keys), and a labels × dims driver finish.  Mean rounded to 6
    decimals in both engines (float sums are order-dependent)."""
    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "embeddings", ["label", "embedding"])

    agg = (ds.map_batches(centroid_sum_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("key").aggregate(Sum("s", alias_name="s"),
                                     Sum("cnt", alias_name="cnt"))
           .to_pandas())
    key = agg["key"].to_numpy(dtype="int64")
    out = pd.DataFrame({
        "label": key // CENTROID_DIM_STRIDE,
        "dim": key % CENTROID_DIM_STRIDE,
        "centroid": _round_half_away(
            (agg["s"] / agg["cnt"]).to_numpy(), 6)})
    out["label"] = out["label"].astype("int64")
    out["dim"] = out["dim"].astype("int64")
    return out.sort_values(["label", "dim"]).reset_index(drop=True)


SQL_CENTROID_BY_LABEL = """
SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS dim,
       ROUND(sum(v) / count(*), 6) AS centroid
FROM (SELECT label, unnest(embedding) AS v,
             unnest(range(len(embedding))) AS i
      FROM embeddings) t
GROUP BY label, i ORDER BY label, dim
"""
