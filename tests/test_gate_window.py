"""Guards against the round-2 gate-window regression (VERDICT r02 "What's
wrong #1"): the external driver oracle-checks only the FIRST 50 entries of
``queries()``.  Every high-risk / recently-rewritten operator must therefore
sit inside that window, and the window must stay consistent with the
registered query + oracle dicts.
"""

import importlib.util
from pathlib import Path

import pytest

ENTRY = Path(__file__).resolve().parent.parent / "__spark_entry__.py"

# Round-4 rotation invariant: every registered query must be driver-green
# within the last TWO rounds. These MUST therefore be oracle-checked by the
# driver this round (first 50 entries): every gate that is new or whose code
# path changed since the r3 driver run, and every gate whose last driver-green
# row is round 2 (two rounds stale after r3 — VERDICT r03 "What's missing #2").
MUST_BE_IN_WINDOW = [
    # new / rewritten since the r3 driver run
    "highlight_fragments", "dedup_window_stats", "multimodal_png_stats",
    "multi_phrase_overlap_topk", "multi_phrase_overlap_repeat_topk",
    "ann_ivf_trained_topk", "stream_dedup_state", "stream_window_stats",
    "dedup_minhash_lsh",
    # in-session rewrite: index term order -> UTF-16 code units
    "term_dict_utf16", "range_utf16_topk",
    # last driver-green in round 2 — rotate back through
    "bool_or_topk", "bool_not_topk", "bool_minshould_topk",
    "phrase_exact_topk", "prefix_topk", "wildcard_topk",
    "fuzzy_prefix_topk", "range_topk", "multi_phrase_topk",
    "explain_term", "explain_term_classic", "phrase_sloppy3_topk",
    "boosted_or_topk", "matchall_topk", "constant_score_filter",
    "filtered_term_topk", "sort_by_field", "numeric_range_encoded",
    "span_first_topk", "span_or_topk", "span_not_topk",
    "wand_phrase_topk", "parsed_and_topk", "parsed_nested_topk",
    "parsed_boost_topk", "parsed_range_topk", "parsed_fielded_topk",
    "fielded_tf_topk", "parsed_fielded_tf_topk", "date_range_topk",
    "wand_and_topk", "wand_merged_topk", "wand_delete_topk",
    "term_dict", "term_dict_salted", "doc_lens",
]

DRIVER_WINDOW = 50


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


def test_oracles_cover_registered_queries(entry_mod):
    qs = set(entry_mod.queries().keys())
    oracles = set(entry_mod.oracle_sql().keys())
    assert oracles <= qs
    # every query is oracle-gated except the documented rows-only set
    rows_only = qs - oracles
    assert rows_only <= {"ann_ivf_trained_topk"}, rows_only
