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

# Ops rewritten in round 2/3 or never driver-verified before round 3 — these
# MUST be oracle-checked by the driver (first 50 entries).
MUST_BE_IN_WINDOW = [
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "pipeline_clean_corpus", "dedup_simhash", "dedup_embedding_cosine",
    "ann_cosine_topk", "ann_cosine_topk_pandas", "ann_ivf_topk",
    "ann_ivf_stored_topk", "ann_ivf_trained_topk",
    "multimodal_features", "multimodal_frame_sample",
    "text_lang_id", "text_quality", "text_token_counts", "text_fingerprint",
    "corpus_stats", "top_df_terms",
    # sloppy scorer rewritten round 3: the repeated-term gate is the
    # strongest variant; 3-term slop shares the identical walk code path
    "phrase_sloppy_topk", "phrase_sloppy_repeat_topk",
    "wand_sloppy_phrase_topk", "parsed_sloppy_phrase_topk",
    # first gated in round 3 — must stay in-window until twice green
    "dedup_cluster_canonical", "text_pii_redact", "pack_sequences",
    "stream_dedup_state", "multimodal_wav_stats", "text_lm_score",
    "text_repetition", "sample_stratified", "sample_stratum_cap",
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
