"""Single-process stage profiler for the crawl->index per-file kernel.

Times each stage of `warc_build.build_segments_from_warc`'s `_one_file`
over one real .warc.gz file, in isolation, single-core — the number the
32-way job multiplies. Run on an EXISTING generated crawl dir (e.g. the
one `tools/crawl_index_job.py --gen-docs` writes):

    python tools/profile_crawl_stage.py /dev/shm/crawl [file_idx]

Prints one JSON line of per-stage seconds + docs/sec, so optimization
targets the measured stage, not the guessed one.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import numpy as np

    from clucene_spark.data.warc import (
        decode_html,
        list_warc_paths,
        parse_warc_date,
        parse_warc_stream,
        split_http_payload,
    )
    from clucene_spark.index.segments import _analyze_docs, _invert_encode
    from clucene_spark.pipeline.extract import extract_text_py, normalize_text_py

    warc_dir = sys.argv[1]
    fi = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    path = list_warc_paths(warc_dir)[fi]

    # warm: tokenizer tables etc.
    _analyze_docs(np.asarray(["warm up text tokens"], dtype=object), "standard", None)

    t = {}
    t0 = time.perf_counter()
    recs = []
    with open(path, "rb") as fh:
        for rec in parse_warc_stream(fh):
            if rec["headers"].get("warc-type") == "response":
                recs.append(rec)
    t["parse_warc"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    split = [split_http_payload(r["payload"]) for r in recs]
    t["http_split"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    pages = [decode_html(body, hh.get("content-type")) for _s, hh, body in split]
    t["decode_html"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    texts = [extract_text_py(p) for p in pages]
    t["extract_text"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    texts = [normalize_text_py(x) for x in texts]
    t["normalize"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    _meta = [
        (r["headers"].get("warc-target-uri"),
         parse_warc_date(r["headers"].get("warc-date")))
        for r in recs
    ]
    t["headers_meta"] = time.perf_counter() - t0

    texts_a = np.asarray(texts, dtype=object)
    ids_a = np.arange(len(texts), dtype=np.int64)

    t0 = time.perf_counter()
    per_doc, p, counts = _analyze_docs(texts_a, "standard", None)
    t["tokenize"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    seg_tab, uniq_docs, dl_counts, n_tok, n_post = _invert_encode(
        ids_a, per_doc, p, counts, True
    )
    t["invert_encode"] = time.perf_counter() - t0

    total = sum(t.values())
    out = {
        "file": path,
        "n_docs": len(recs),
        "stage_sec": {k: round(v, 4) for k, v in t.items()},
        "stage_pct": {k: round(100 * v / total, 1) for k, v in t.items()},
        "total_sec": round(total, 4),
        "docs_per_sec_1core": round(len(recs) / total, 1),
        "n_tokens": int(n_tok),
        "n_postings": int(n_post),
        "n_terms": int(seg_tab.num_rows),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
