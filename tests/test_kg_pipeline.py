"""End-to-end KG pipeline: correctness vs the sequential oracle (P/R ≥ 0.95
per the north rule), parallelism invariance, and schema stability."""
import pandas as pd
import pytest

from entitydisambiguation_ray.pipelines.kg import run_kg_pipeline, synth_pages_dataset
from entitydisambiguation_ray.pipelines.oracle import OnlineOracle, precision_recall
from entitydisambiguation_ray.sources.pages import make_page

N_PAGES = 150


@pytest.fixture(scope="module")
def kg_result(ray_session):
    pages = synth_pages_dataset(N_PAGES, seed=42)
    return run_kg_pipeline(pages)


def test_pipeline_pr_vs_oracle(kg_result):
    edges = kg_result["edges"].to_pandas()
    pred = set(zip(edges["src_id"], edges["rel_type"], edges["dst_id"]))
    oracle = OnlineOracle()
    gold = set(oracle.run(make_page(i) for i in range(N_PAGES)))
    p, r = precision_recall(pred, gold)
    assert p >= 0.95, f"precision {p}"
    assert r >= 0.95, f"recall {r}"


def test_decisions_schema_and_bounds(kg_result):
    dec = kg_result["decisions_df"]
    assert set(dec["decision"]) <= {"merge", "create", "ambiguous"}
    for col in ("bge_score", "cross_encoder_score", "fuzz_score",
                "levenshtein_score"):
        assert dec[col].between(-1.0, 1.0001).all(), col
    # merges carry a match_id; creates never do (disambiguation.py:411-412)
    assert dec.loc[dec["decision"] == "merge", "match_id"].notna().all()
    assert dec.loc[dec["decision"] != "merge", "match_id"].isna().all()
    # canonical ids are deterministic sha-based (no wall clock, M12 fix)
    assert dec["canonical_id"].str.match(r"^[a-z]+_[0-9a-f]{12}$").all()


def test_edges_deduped(kg_result):
    edges = kg_result["edges"].to_pandas()
    assert not edges.duplicated(["src_id", "dst_id", "rel_type"]).any()
    assert (edges["src_id"] != "").all() and (edges["dst_id"] != "").all()


def test_entities_table_unique_ids(kg_result):
    ents = kg_result["entities_df"]
    assert ents["id"].is_unique
    # every edge endpoint resolves to an entity row (graph closure)
    edges = kg_result["edges"].to_pandas()
    ids = set(ents["id"])
    assert set(edges["src_id"]) <= ids
    assert set(edges["dst_id"]) <= ids


def test_parallelism_invariance(ray_session, kg_result):
    """Same triple set when the corpus is synthesized/processed with a
    different block structure (scale-invariance, SURVEY.md §5.5)."""
    pages = synth_pages_dataset(N_PAGES, seed=42, override_num_blocks=11)
    out2 = run_kg_pipeline(pages, concurrency=(1, 2))
    e1 = kg_result["edges"].to_pandas()
    e2 = out2["edges"].to_pandas()
    s1 = set(zip(e1["src_id"], e1["rel_type"], e1["dst_id"]))
    s2 = set(zip(e2["src_id"], e2["rel_type"], e2["dst_id"]))
    assert s1 == s2


def test_canonical_join_rewrite_matches_broadcast(ray_session, kg_result):
    """Forcing the sig→canonical shuffle-join fallback (broadcast_max=0)
    must yield byte-identical canonical edges to the broadcast rewriter."""
    from entitydisambiguation_ray.config import EngineConfig

    pages = synth_pages_dataset(N_PAGES, seed=42)
    out2 = run_kg_pipeline(pages,
                           cfg=EngineConfig(canonical_map_broadcast_max=0))
    e1 = (kg_result["edges"].to_pandas()
          .sort_values(["src_id", "dst_id", "rel_type"])
          .reset_index(drop=True))
    e2 = (out2["edges"].to_pandas()
          .sort_values(["src_id", "dst_id", "rel_type"])
          .reset_index(drop=True))
    pd.testing.assert_frame_equal(e1, e2)


def test_canonical_map_misses_fail_loudly(ray_session):
    """A triple surface missing from the canonical map must raise (both
    rewrite paths), not silently emit empty/null ids."""
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.kg import (
        EdgeRewriter,
        rewrite_edges_join,
    )

    rw = EdgeRewriter(canonical_map={})
    with pytest.raises(KeyError, match="canonical map"):
        rw._canon("糖尿病")

    triples = rd.from_items([{
        "url": "u", "subj": "糖尿病", "pred": "属于",
        "obj": "未知实体XYZ", "sent_idx": 0}])
    sig_map = rd.from_pandas(pd.DataFrame(
        {"sig": ["no-such-sig"], "canonical_id": ["x"]}))
    with pytest.raises(Exception, match="missing from the canonical map"):
        rewrite_edges_join(triples, sig_map, nparts=2).materialize()


def test_write_graph_outputs(ray_session, kg_result, tmp_path):
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.kg import write_graph_outputs
    from entitydisambiguation_ray.state.checkpoint import partition_files

    paths = write_graph_outputs(kg_result, str(tmp_path / "graph"))
    edges = rd.read_parquet(
        partition_files([paths["edges"]])).to_pandas()
    assert len(edges) == kg_result["edges"].count()
    ents = rd.read_parquet(partition_files([paths["entities"]])).to_pandas()
    assert ents["id"].is_unique
    dec = rd.read_parquet(partition_files([paths["decisions"]])).to_pandas()
    assert dec["sig"].is_unique


def test_export_neo4j_bulk(ray_session, tmp_path):
    """Bulk-import CSV export: headerless distributed parts + one header
    file per table; every entity/edge row survives and edge endpoints
    reference exported node ids."""
    import glob
    import os

    import pandas as pd

    from entitydisambiguation_ray.pipelines.kg import (
        export_neo4j_bulk,
        run_kg_pipeline,
        synth_pages_dataset,
    )

    out = run_kg_pipeline(synth_pages_dataset(40, seed=1))
    paths = export_neo4j_bulk(out, str(tmp_path / "neo4j"))

    nh = open(tmp_path / "neo4j" / "nodes.header.csv").read().strip()
    assert nh == "id:ID,name,type,:LABEL"
    node_parts = sorted(glob.glob(os.path.join(paths["nodes"], "*")))
    assert node_parts
    nodes = pd.concat([pd.read_csv(p, header=None,
                                   names=nh.split(","))
                       for p in node_parts], ignore_index=True)
    ents = (out["entities_df"] if "entities_df" in out
            else out["entities_ds"].to_pandas())
    assert len(nodes) == len(ents)
    assert set(nodes["id:ID"].astype(str)) == set(ents["id"].astype(str))
    assert (nodes[":LABEL"] == "Entity").all()

    rh = open(tmp_path / "neo4j" / "relationships.header.csv").read().strip()
    assert rh == ":START_ID,:END_ID,:TYPE"
    rel_parts = sorted(glob.glob(os.path.join(paths["relationships"], "*")))
    rels = pd.concat([pd.read_csv(p, header=None, names=rh.split(","))
                      for p in rel_parts], ignore_index=True)
    edges = out["edges"].to_pandas()
    assert len(rels) == len(edges)
    node_ids = set(nodes["id:ID"].astype(str))
    assert set(rels[":START_ID"].astype(str)) <= node_ids
    assert set(rels[":END_ID"].astype(str)) <= node_ids
    assert os.path.exists(tmp_path / "neo4j" / "IMPORT.txt")
