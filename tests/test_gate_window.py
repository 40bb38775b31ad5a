"""Guards against the round-2 gate-window regression (VERDICT r02 "What's
wrong #1"): the external driver oracle-checks only the FIRST 50 entries of
``queries()``.  Every high-risk / recently-rewritten operator must therefore
sit inside that window, and the window must stay consistent with the
registered query + oracle dicts.

Rotation policy (amended round 5 per VERDICT r04 "What's wrong #3"): with 145
registered queries and a 50-slot window, the old two-round invariant
(145 > 2x50) is arithmetically impossible.  The contract is now:

  * every registered query must be driver-green within the last THREE rounds
    (3x50 = 150 >= 145 slots, so the invariant is satisfiable);
  * window priority: never-driver-checked > code-changed-since-last-row >
    stalest driver row;
  * every out-of-window gate is still locally oracle-verified each round via
    ``python tools/check_oracle.py`` (checks ALL registered queries).

Round-5 instantiation: the 49 gates with full oracles but zero driver rows
(the r4-late wave) take 49 slots; ``wand_or_topk`` (the one r4 wall-time
regression, re-pinned for driver re-certification) takes the 50th.
"""

import importlib.util
from pathlib import Path

import pytest

ENTRY = Path(__file__).resolve().parent.parent / "__spark_entry__.py"

# Round-5 window: never-driver-checked first (all 49 of them), then the
# wand_or re-pin. These MUST be the driver's first 50 entries this round.
MUST_BE_IN_WINDOW = [
    # never driver-checked (registered r4-late with full oracles)
    "explain_bool_topk", "explain_phrase", "multimodal_jpeg_stats",
    "shard_assign", "embed_quantize_int8", "ann_cosine_int8_topk",
    "batch_term_topk", "corpus_shuffle", "span_boolean_topk",
    "span_fielded_topk", "decontaminate_fraction", "dedup_url",
    "dedup_url_hinted", "web_domain_stats", "dedup_lines", "dedup_spans",
    "sample_mixture", "sample_domain_cap", "sample_dsir", "term_page2_topk",
    "index_fsck_stats", "bm25f_topk", "mlt_topk", "text_ppl_buckets",
    "dedup_cluster_best", "suggest_term", "collapse_topk", "stream_url_dedup",
    "web_extract_text", "text_normalize", "pipeline_ingest_crawl",
    "pipeline_ingest_webtext", "web_anchor_text", "web_pagerank",
    "warc_roundtrip", "wet_records", "warc_index_stats", "robots_filter",
    "warc_charset", "sitemap_gap", "stream_warc_stats",
    "wand_anchor_field_topk", "static_rank_topk", "crawl_supersede",
    "web_main_content", "crawl_fetch_plan", "web_redirects", "url_blocklist",
    "time_travel_stats",
    # r4 wall-time regression re-pin
    "wand_or_topk",
]

DRIVER_WINDOW = 50

# Last driver-green round per gate, per GATES.md.  Used to assert the
# three-round staleness contract: at round R, every gate must have a driver
# row >= R-3 or be inside the current window (getting its row this round).
# All 50 r4-window gates are r4-green (CORRECTNESS_r04 50/50); the demoted
# set below is r3-green.  A gate absent from both maps is never-checked and
# must therefore be in the window.
LAST_GREEN_R3 = {
    "wand_or_topk", "multi_phrase_sloppy_topk", "phrase_sloppy_repeat_topk",
    "pipeline_clean_corpus", "dedup_cluster_canonical", "term_topk_bm25",
    "term_topk_classic", "bool_and_topk", "fuzzy_topk", "phrase_sloppy_topk",
    "chained_filter_topk", "span_near_topk", "wand_fielded_topk",
    "wand_sloppy_phrase_topk", "lang_dispatch_topk", "stream_ingest_topk",
    "parsed_sloppy_phrase_topk", "parsed_keyword_range_topk",
    "parsed_multifield_topk", "term_topk_bm25_std", "phrase_topk_std",
    "snowball_fr_topk", "corpus_stats", "top_df_terms", "dedup_exact",
    "dedup_chunk", "pipeline_decontaminate", "dedup_ngram_jaccard",
    "dedup_simhash", "dedup_embedding_cosine", "ann_cosine_topk",
    "ann_cosine_topk_pandas", "ann_ivf_topk", "ann_ivf_stored_topk",
    "multimodal_features", "multimodal_frame_sample", "text_lang_id",
    "text_quality", "text_token_counts", "text_fingerprint",
    "text_repetition", "sample_stratified", "sample_stratum_cap",
    "text_pii_redact", "pack_sequences", "multimodal_wav_stats",
    "text_lm_score",
}
CURRENT_ROUND = 5


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location("spark_entry_gatewin", ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_high_risk_queries_inside_driver_window(entry_mod):
    keys = list(entry_mod.queries().keys())
    window = keys[:DRIVER_WINDOW]
    missing = [k for k in MUST_BE_IN_WINDOW if k not in window]
    assert not missing, (
        f"gate-window regression: {missing} outside the driver's first "
        f"{DRIVER_WINDOW} entries"
    )


def test_gate_window_names_are_registered(entry_mod):
    keys = set(entry_mod.queries().keys())
    unknown = [k for k in entry_mod._GATE_WINDOW if k not in keys]
    assert not unknown, f"_GATE_WINDOW names not registered: {unknown}"
    assert len(entry_mod._GATE_WINDOW) == len(set(entry_mod._GATE_WINDOW))
    assert len(entry_mod._GATE_WINDOW) <= DRIVER_WINDOW


def test_three_round_staleness_contract(entry_mod):
    """Every registered gate is either in this round's window (gets a driver
    row now) or has a driver-green row within the last three rounds."""
    import json

    keys = set(entry_mod.queries().keys())
    window = set(entry_mod._GATE_WINDOW)
    r4_rows = set(
        json.loads((ENTRY.parent / "CORRECTNESS_r04.json").read_text())
    )
    stale = []
    for k in keys - window:
        last = 4 if k in r4_rows else (3 if k in LAST_GREEN_R3 else None)
        if last is None or CURRENT_ROUND - last > 3:
            stale.append((k, last))
    assert not stale, (
        f"gates violating the three-round staleness contract: {stale}"
    )


def test_oracles_cover_registered_queries(entry_mod):
    qs = set(entry_mod.queries().keys())
    oracles = set(entry_mod.oracle_sql().keys())
    assert oracles <= qs
    # every query is oracle-gated except the documented rows-only set
    rows_only = qs - oracles
    assert rows_only == set(), rows_only
