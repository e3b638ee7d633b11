"""Co-partitioned shuffle hash join — BOTH sides large (SURVEY.md §2.4).

The broadcast joins elsewhere in the engine ship a driver-collected small
side to every worker; this primitive is the scale path when neither side
fits: the reference shape is the id→entity resolution J5
(services/vectorization.py:636-645) against a KB too large to broadcast.

Dataflow (the ONE wide shuffle):

    left  → map_batches: pad to the unified schema, tag _side=0,
            _part = hash(key) % nparts          (vectorized row hash)
    right → same with _side=1 (value columns renamed on collision)
    union → groupby(_part).map_groups           (the shuffle)
          → per partition: split sides (Arrow filter, so each side keeps
            its own dtypes), ONE vectorized pandas merge

Co-location invariant: equal keys hash to equal partitions, so every
per-partition merge is complete and their union is the exact join.  Skewed
keys concentrate in one partition — when a single key's rows exceed a
partition budget, salt upstream (replicate the small side of the hot key
across salt shards, the ``stages/candidates.py`` pattern).

Semantics notes (pandas merge semantics, documented not hidden):
- NULL keys: pandas matches NaN==NaN in merges, SQL does not — callers
  joining nullable keys must pre-filter nulls to get SQL semantics.
- how="left": right-side value columns contain NaN for unmatched rows
  (ints widen to float64, as in pandas).
- how="outer": FULL OUTER — unmatched rows from EITHER side survive with
  NaN on the silent side; key columns are coalesced (pandas fills the
  join key from whichever side has it).  Incompatible with ``salt_hot``
  (replicating hot right rows across salt shards would emit an unmatched
  right row once per shard).
- how="semi"/"anti": output is left rows only (no right columns).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .partition import hash_key_rows, hash_partition_ids

_HOW = ("inner", "left", "outer", "semi", "anti")
_SALT_MIX = np.uint64(0x9E3779B97F4A7C15)


def count_hot_keys(ds: rd.Dataset, key: str, threshold: int,
                   salt_max: int = 16) -> dict:
    """Pre-pass for ``shuffle_hash_join(salt_hot=...)``: per-batch count
    combiner → keyed sum → {key_value: n_salt} for keys whose LEFT-side row
    count exceeds ``threshold``.  The returned dict is hot-keys-only
    (bounded by skew, not cardinality) and rides in task closures.

    NULL keys: ``hash_key_rows`` sends every null row to ONE partition and
    pandas merge matches NaN==NaN, so a heavy null mass is a real skew
    hazard — but it cannot be salted through the value-keyed dict (NaN
    lookups don't hash stably).  Nulls are therefore COUNTED separately
    here and reported with a loud warning when they exceed the threshold,
    pointing at the documented pre-filter-nulls contract."""
    import math

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.select([key])  # drop_null must only see the key
        col = batch.column(key)
        n_null = col.null_count
        tbl = batch.drop_null().group_by(key).aggregate([([], "count_all")])
        # select by NAME — pyarrow's group_by output column order is an
        # implementation detail that has differed across versions
        out = pa.table({key: tbl.column(key),
                        "n": tbl.column("count_all"),
                        "n_null": pa.array(
                            np.zeros(tbl.num_rows, dtype=np.int64))})
        if n_null:
            marker = pa.table({
                key: _pad_array(1, col.type),
                "n": pa.array([0], pa.int64()),
                "n_null": pa.array([n_null], pa.int64())})
            out = pa.concat_tables([out, marker])
        return out

    from ray.data.aggregate import Sum

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(key).aggregate(Sum("n", alias_name="n"),
                                      Sum("n_null", alias_name="n_null"))
              .to_pandas())
    total_null = int(counts["n_null"].sum())
    if total_null > threshold:
        import logging

        logging.getLogger(__name__).warning(
            "count_hot_keys(%r): %d NULL-key rows exceed the hot threshold "
            "%d; null keys all hash to one partition and cannot be salted — "
            "pre-filter nulls (shuffle_hash_join's documented contract) or "
            "accept the skew", key, total_null, threshold)
    hot = counts.loc[counts["n"] > threshold]
    if salt_max == 0:  # raw counts requested (hot_group_keys ranks by mass)
        return {k: int(n) for k, n in zip(hot[key], hot["n"])}
    return {k: int(min(salt_max, math.ceil(n / threshold)))
            for k, n in zip(hot[key], hot["n"])}


def _pad_array(n: int, typ: pa.DataType) -> pa.Array:
    """Null-free filler for the other side's columns.  The padded cells are
    NEVER read (the merge splits sides before converting to pandas), but
    they MUST be null-free: Ray's sort shuffle may round-trip blocks
    through pandas, where an int64 column with nulls silently widens to
    float64 — corrupting ids above 2^53.  Zero values of the right type
    survive any pandas round-trip losslessly."""
    if pa.types.is_integer(typ) or pa.types.is_floating(typ):
        return pa.array(np.zeros(n, dtype=typ.to_pandas_dtype()), type=typ)
    if pa.types.is_boolean(typ):
        return pa.array(np.zeros(n, dtype=bool))
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return pa.array([""] * n, type=typ)
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return pa.array([b""] * n, type=typ)
    if pa.types.is_date32(typ):  # date32 only casts from int32, not int64
        return pa.array(np.zeros(n, dtype=np.int32)).cast(typ)
    if pa.types.is_timestamp(typ) or pa.types.is_date(typ) \
            or pa.types.is_time(typ) or pa.types.is_duration(typ):
        return pc.cast(pa.array(np.zeros(n, dtype=np.int64)), typ)
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        return pa.array([[]] * n, type=typ)
    # exotic types: nulls (documented caveat — a pandas round-trip may
    # widen them, but such columns are objects in pandas anyway)
    return pa.nulls(n, typ)


def _arrow_types(ds: rd.Dataset) -> dict[str, pa.DataType]:
    """name → pyarrow type, normalizing Ray's schema wrappers (pandas-backed
    blocks report numpy dtypes / Python classes instead of Arrow types)."""
    s = ds.schema()
    if s is None:
        raise ValueError("cannot join a schemaless (fully empty) Dataset")
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return dict(zip(base.names, base.types))
    out: dict[str, pa.DataType] = {}
    for n, t in zip(s.names, s.types):
        if isinstance(t, pa.DataType):
            out[n] = t
        elif t is str:
            out[n] = pa.string()
        else:
            dt = np.dtype(t)
            out[n] = (pa.string() if dt == np.dtype("O")
                      else pa.from_numpy_dtype(dt))
    return out


def pad_union(a: rd.Dataset, b: rd.Dataset,
              side_col: str = "_side",
              a_types: dict[str, pa.DataType] | None = None,
              b_types: dict[str, pa.DataType] | None = None) -> rd.Dataset:
    """Union two Datasets with different columns under the padded union
    schema, tagging every row with the side it came from (0=a, 1=b) — the
    cogroup building block: follow with a keyed coarse shuffle and split
    sides inside the per-partition kernel.  Columns present on both sides
    must have compatible types (cast to a's); missing cells are padded with
    zero values (never nulls — see ``_pad_array``).

    ``a_types`` / ``b_types``: optional explicit schemas.  IMPORTANT for
    lazy inputs: ``Dataset.schema()`` on an unexecuted lineage runs it (and
    the downstream union runs it AGAIN) — callers that know the schema
    statically should pass it."""
    at = a_types or _arrow_types(a)
    bt = b_types or _arrow_types(b)
    unified = list(at.items()) + [(n, t) for n, t in bt.items()
                                  if n not in at]

    def prep(side: int):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for name, typ in unified:
                if name in batch.column_names:
                    col = batch.column(name)
                    if col.type != typ:
                        col = col.cast(typ)
                    cols[name] = col
                else:
                    cols[name] = _pad_array(n, typ)
            out = pa.table(cols)
            return out.append_column(
                side_col, pa.array(np.full(n, side, dtype=np.int8)))

        return f

    return a.map_batches(prep(0), batch_format="pyarrow").union(
        b.map_batches(prep(1), batch_format="pyarrow"))


def shuffle_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str | list[str],
    *,
    right_on: str | list[str] | None = None,
    how: str = "inner",
    nparts: int = 64,
    rsuffix: str = "_r",
    ltypes: dict[str, pa.DataType] | None = None,
    rtypes: dict[str, pa.DataType] | None = None,
    salt_hot: dict | None = None,
) -> rd.Dataset:
    """Distributed equi-join of two Datasets on ``on`` (= ``right_on`` on
    the right side when the key columns are named differently).

    Output columns: all left columns, then right value columns (renamed
    with ``rsuffix`` on collision with a left name).  ``nparts`` bounds
    per-partition memory at ``(|L| + |R|) / nparts`` rows — scale it with
    input size, not cluster size.

    ``ltypes`` / ``rtypes``: optional explicit schemas (name → pyarrow
    type, insertion-ordered).  IMPORTANT for lazy inputs: when omitted they
    come from ``Dataset.schema()``, which EXECUTES an unexecuted lineage —
    and the join itself then executes it again.  Callers that know the
    schema statically (or chain joins) should always pass these.

    ``salt_hot``: explicit skew handling — {key_value: n_salt} from
    ``count_hot_keys``.  A hot key's LEFT rows spread over ``n_salt``
    sub-partitions while its RIGHT rows replicate into every sub-partition
    (the classic replicate-small-side skew-join treatment); results are
    identical, only placement changes.  Single-column keys only."""
    if how not in _HOW:
        raise ValueError(f"how must be one of {_HOW}, got {how!r}")
    if salt_hot and (not isinstance(on, str) or
                     (right_on is not None and not isinstance(right_on, str))):
        raise ValueError("salt_hot supports single-column keys only")
    if salt_hot and how == "outer":
        raise ValueError("salt_hot is incompatible with how='outer': "
                         "replicated hot right rows would duplicate "
                         "unmatched-right output rows")
    lkeys = [on] if isinstance(on, str) else list(on)
    rkeys = (lkeys if right_on is None
             else [right_on] if isinstance(right_on, str) else list(right_on))
    if len(lkeys) != len(rkeys):
        raise ValueError("on / right_on length mismatch")

    ltypes = ltypes or _arrow_types(left)
    rtypes = rtypes or _arrow_types(right)
    lnames, rnames = list(ltypes), list(rtypes)
    for k in lkeys:
        if k not in ltypes:
            raise KeyError(f"left key column {k!r} missing")
    for k in rkeys:
        if k not in rtypes:
            raise KeyError(f"right key column {k!r} missing")

    # right value columns, renamed on collision with ANY left column
    rvals = [c for c in rnames if c not in rkeys]
    rename = {c: (c + rsuffix if c in ltypes else c) for c in rvals}
    lcols = lnames
    rout = [rename[c] for c in rvals]
    if len(set(rout)) != len(rout) or set(rout) & set(lcols):
        raise ValueError(f"right value columns collide after rename: {rout}")
    for reserved in ("_side", "_part"):
        if reserved in lcols or reserved in rout:
            raise ValueError(f"column name {reserved!r} is reserved")
    for c in lcols + rout:
        if c.startswith("_kc"):
            raise ValueError(
                f"column name {c!r} is reserved (_kc* = key-code scratch)")
    # unified schema: left cols + right key cols (as left names/types) +
    # renamed right value cols
    unified: list[tuple[str, pa.DataType]] = [(c, ltypes[c]) for c in lcols]
    unified += [(rename[c], rtypes[c]) for c in rvals]
    key_type = {lk: ltypes[lk] for lk in lkeys}

    def prep(side: int):
        keys = lkeys if side == 0 else rkeys

        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            if side == 1:
                # key columns take the LEFT names (+ cast to the left key
                # type so both the partition hash and the merge agree)
                cols = {rename.get(c, c): batch.column(c) for c in rvals}
                for lk, rk in zip(lkeys, rkeys):
                    col = batch.column(rk)
                    if col.type != key_type[lk]:
                        col = col.cast(key_type[lk])
                    cols[lk] = col
                batch = pa.table(cols)
            arrays, names = [], []
            for name, typ in unified:
                names.append(name)
                if name in batch.column_names:
                    col = batch.column(name)
                    if col.type != typ:
                        # enforce the declared schema: upstream stages that
                        # emit EMPTY blocks with degraded dtypes (pandas
                        # gives empty frames float64/object columns) would
                        # otherwise poison Ray's schema unification and
                        # widen the whole join output
                        col = col.cast(typ)
                    arrays.append(col)
                else:
                    arrays.append(_pad_array(n, typ))
            out = pa.table(dict(zip(names, arrays)))
            if salt_hot:
                kvals = out.column(lkeys[0]).to_pandas()
                ksalt = kvals.map(salt_hot).fillna(1).to_numpy(dtype=np.int64)
                if side == 1 and (ksalt > 1).any():
                    # replicate hot-key right rows into every salt shard
                    idx = np.repeat(np.arange(n), ksalt)
                    out = out.take(pa.array(idx))
                    starts = np.repeat(np.cumsum(ksalt) - ksalt, ksalt)
                    salts = np.arange(len(idx)) - starts
                    n = len(idx)
                else:
                    # spread hot-key left rows across their salt shards
                    # (assignment is placement-only: any spread is correct)
                    salts = np.arange(n) % np.maximum(ksalt, 1)
                raw = hash_key_rows(out, lkeys)
                part = ((raw + salts.astype(np.uint64) * _SALT_MIX)
                        % nparts).astype("int32")
            else:
                part = hash_partition_ids(out, lkeys, nparts)
            out = out.append_column(
                "_side", pa.array(np.full(n, side, dtype=np.int8)))
            return out.append_column("_part", pa.array(part))

        return f

    tagged = left.map_batches(prep(0), batch_format="pyarrow").union(
        right.map_batches(prep(1), batch_format="pyarrow"))

    str_keys = [k for k in lkeys
                if pa.types.is_string(ltypes[k])
                or pa.types.is_large_string(ltypes[k])]

    def merge(tbl: pa.Table) -> pd.DataFrame:
        # String join keys: dictionary-encode ONCE across both sides (one
        # shared dictionary → comparable integer codes) and merge on the
        # int32 codes instead of Python-object strings — pandas hashes ints
        # ~an order of magnitude faster.  Equal strings get equal codes, so
        # the result is identical (nulls become NaN codes, matching pandas'
        # NaN==NaN merge semantics for object keys).
        mkeys = list(lkeys)
        # outer merges MUST join on the raw key columns: pandas coalesces
        # the join key from whichever side has it, which int32 code
        # columns would break (the left raw key stays NaN on
        # right-only rows).  Outer joins skip the code fast path.
        enc_keys = [] if how == "outer" else str_keys
        for i, k in enumerate(enc_keys):
            col = tbl.column(k)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()  # per-chunk dicts aren't comparable
            codes = col.dictionary_encode().indices
            tbl = tbl.append_column(f"_kc{i}", pc.cast(codes, pa.int32()))
            mkeys[lkeys.index(k)] = f"_kc{i}"
        code_cols = [c for c in mkeys if c.startswith("_kc")]
        side = tbl.column("_side")
        lmask = pc.equal(side, 0)
        # split FIRST, then convert: each side's pandas frame keeps its own
        # dtypes (the other side's padded null columns never reach pandas)
        ldf = tbl.filter(lmask).select(lcols + code_cols).to_pandas()
        rdf = tbl.filter(pc.invert(lmask)).select(
            [c for c in mkeys if c not in code_cols] + code_cols
            + rout).to_pandas()
        if how == "semi":
            out = ldf.merge(rdf[mkeys].drop_duplicates(), on=mkeys,
                            how="inner")
            return out.drop(columns=code_cols)
        if how == "anti":
            m = ldf.merge(rdf[mkeys].drop_duplicates(), on=mkeys,
                          how="left", indicator=True)
            return (m[m["_merge"] == "left_only"]
                    .drop(columns=["_merge"] + code_cols)
                    .reset_index(drop=True))
        out = ldf.merge(rdf, on=mkeys, how=how)
        return out.drop(columns=code_cols)

    return tagged.groupby("_part").map_groups(merge, batch_format="pyarrow")
