"""Text-analysis operators (token count, quality, langid, fingerprint)."""
import hashlib

import pyarrow as pa
import pytest

from entitydisambiguation_ray.stages.textops import (
    fingerprint_batch,
    langid_batch,
    quality_batch,
    token_count_batch,
)


def _tbl(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_token_count_whitespace_semantics():
    out = token_count_batch(_tbl(["a b  c", "", "  ", "单个", "a\tb\nc d"]))
    assert out.column("token_count").to_pylist() == [3, 0, 0, 1, 4]


def test_quality_ratios():
    out = quality_batch(_tbl(["ab, cd.", ""]))
    r = out.to_pylist()[0]
    assert r["n_chars_q"] == 7
    assert r["punct_ratio"] == pytest.approx(2 / 7)
    assert r["alpha_ratio"] == pytest.approx(4 / 7)
    empty = out.to_pylist()[1]
    assert empty["punct_ratio"] == 0.0 and empty["alpha_ratio"] == 0.0


def test_langid_heuristic():
    out = langid_batch(_tbl([
        "this is plainly english text",
        "这是一段完全中文的文本内容",
        "mixed 中文 and english 各占 half 左右的比例哦",
        "",
    ]))
    assert out.column("lang_pred").to_pylist()[:2] == ["en", "zh"]
    assert out.column("lang_pred").to_pylist()[3] == "en"


def test_fingerprint_md5_and_rolling():
    out = fingerprint_batch(_tbl(["hello", "hello", "world"]),
                            include_roll=True)
    md5s = out.column("fp_md5").to_pylist()
    assert md5s[0] == md5s[1] == hashlib.md5(b"hello").hexdigest()
    assert md5s[2] != md5s[0]
    rolls = out.column("fp_roll").to_pylist()
    assert rolls[0] == rolls[1] != rolls[2]
    # order sensitivity (unlike a bag hash)
    out2 = fingerprint_batch(_tbl(["ab", "ba"]), include_roll=True)
    r = out2.column("fp_roll").to_pylist()
    assert r[0] != r[1]
    # default: no rolling-hash column (opt-in, see docstring)
    assert "fp_roll" not in fingerprint_batch(_tbl(["x"])).column_names
