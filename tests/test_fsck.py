"""Index integrity checker (CheckIndex analogue) — clean indexes pass,
and every class of on-disk corruption is detected."""

from __future__ import annotations

import json
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def clean_idx(spark, index, tmp_path_factory):
    from clucene_spark.index.segments import build_segments

    d = str(tmp_path_factory.mktemp("fsck_idx"))
    build_segments(index.tokens, index.doc_lens, d, docs_per_segment=16)
    return d


def _report(spark, d, gen=None):
    from clucene_spark.index.fsck import check_index

    return {
        (r["segment"], r["check"]): (r["n_checked"], r["n_bad"], r["detail"])
        for r in check_index(spark, d, generation=gen).collect()
    }


def _corrupt_copy(clean_idx, tmp_path, mutate):
    """Copy the index and apply `mutate(seg_dir, table) -> table` to the
    first segment's postings file."""
    import os

    d = str(tmp_path / "bad")
    shutil.copytree(clean_idx, d)
    seg = sorted(os.listdir(os.path.join(d, "segments")))[0]
    p = os.path.join(d, "segments", seg, "postings.parquet")
    tab = pq.read_table(p)
    pq.write_table(mutate(os.path.join(d, "segments", seg), tab), p)
    return d


def test_clean_index_all_ok(spark, clean_idx):
    rep = _report(spark, clean_idx)
    assert rep and all(bad == 0 for (_, bad, _) in rep.values())
    checks = {c for (_, c) in rep}
    assert checks >= {"files", "term_order", "postings", "positions",
                      "doc_lens", "block_stats", "manifest", "orphans"}


def test_detects_term_disorder(spark, clean_idx, tmp_path):
    def swap_terms(_seg, tab):
        terms = tab["term"].to_pylist()
        terms[0], terms[1] = terms[1], terms[0]
        return tab.set_column(tab.schema.get_field_index("term"),
                              "term", pa.array(terms))

    d = _corrupt_copy(clean_idx, tmp_path, swap_terms)
    rep = _report(spark, d)
    assert any(c == "term_order" and bad > 0
               for (_, c), (_, bad, _) in rep.items())


def test_detects_posting_tampering(spark, clean_idx, tmp_path):
    def wrong_df(_seg, tab):
        dfs = tab["df"].to_pylist()
        dfs[0] += 1
        return tab.set_column(tab.schema.get_field_index("df"),
                              "df", pa.array(dfs, type=pa.int64()))

    d = _corrupt_copy(clean_idx, tmp_path, wrong_df)
    rep = _report(spark, d)
    seg_rows = [(bad, det) for (s, c), (_, bad, det) in rep.items()
                if c == "postings" and s != "_store"]
    assert sum(b for b, _ in seg_rows) > 0
    assert any("df" in det for _, det in seg_rows if det)


def test_detects_stale_block_max(spark, clean_idx, tmp_path):
    """A stale blk_max_tf is the WAND-killer: pruning would skip true
    hits. The recompute must flag it."""
    def stale_blockmax(_seg, tab):
        col = tab["blk_max_tf"].to_pylist()
        col[0] = [v + 5 for v in col[0]]
        return tab.set_column(tab.schema.get_field_index("blk_max_tf"),
                              "blk_max_tf",
                              pa.array(col, type=pa.list_(pa.int64())))

    d = _corrupt_copy(clean_idx, tmp_path, stale_blockmax)
    rep = _report(spark, d)
    assert any(c == "block_stats" and bad > 0
               for (_, c), (_, bad, _) in rep.items())


def test_detects_doclens_mismatch(spark, clean_idx, tmp_path):
    import os

    d = str(tmp_path / "bad_dl")
    shutil.copytree(clean_idx, d)
    seg = sorted(os.listdir(os.path.join(d, "segments")))[0]
    p = os.path.join(d, "segments", seg, "doc_lens.parquet")
    tab = pq.read_table(p)
    dls = tab["dl"].to_pylist()
    dls[0] += 3
    tab = tab.set_column(tab.schema.get_field_index("dl"), "dl",
                         pa.array(dls, type=pa.int64()))
    pq.write_table(tab, p)
    rep = _report(spark, d)
    bad_checks = {c for (s, c), (_, bad, _) in rep.items() if bad > 0}
    # sum(dl) drifts from the manifest AND the inline posting dl disagrees
    assert "doc_lens" in bad_checks and "postings" in bad_checks


def test_detects_missing_segment_dir(spark, clean_idx, tmp_path):
    import os

    d = str(tmp_path / "bad_dir")
    shutil.copytree(clean_idx, d)
    seg = sorted(os.listdir(os.path.join(d, "segments")))[0]
    os.remove(os.path.join(d, "segments", seg, "postings.parquet"))
    rep = _report(spark, d)
    assert any(c == "files" and bad > 0 for (_, c), (_, bad, _) in rep.items())


def test_flags_out_of_range_delete(spark, clean_idx, tmp_path):
    d = str(tmp_path / "bad_del")
    shutil.copytree(clean_idx, d)
    with open(f"{d}/deletes.json", "w") as f:
        json.dump([0, 10**9], f)  # 10^9 is outside every segment
    rep = _report(spark, d)
    n_checked, n_bad, _ = rep[("_store", "deletes")]
    assert n_checked == 2 and n_bad == 1


def test_reports_orphan_segments(spark, clean_idx, tmp_path):
    import os

    d = str(tmp_path / "orphan")
    shutil.copytree(clean_idx, d)
    os.makedirs(os.path.join(d, "segments", "seg_zzz_orphan"))
    rep = _report(spark, d)
    _, bad, detail = rep[("_store", "orphans")]
    assert bad == 0 and "seg_zzz_orphan" in detail  # informational, not corruption
