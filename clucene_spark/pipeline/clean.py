"""End-to-end training-corpus cleaning: quality gate -> exact dedup ->
near-dup removal, composed from the pipeline primitives the way a
production data-curation pass chains them.

Plan shape at 100 TB:
  1. quality gate     — map-only column math (textstats.quality_score);
  2. exact dedup      — one shuffle keyed by the 60-bit content hash; the
                        window min is per content-group (true duplicates),
                        so no skew beyond actual dup clusters;
  3. near-dup removal — MinHash+LSH candidates + candidate-only exact
                        verify (dedup.minhash_lsh_pairs — the scale-safe
                        form), run only over quality-passing, exact-unique
                        survivors. Survivor policy is selectable:
                        'pairwise' drops the higher doc_id of each
                        verified pair; 'cluster' runs connected components
                        over the pair graph and keeps one doc per
                        component (pipeline/graph.py).

Every decision is recorded, not destroyed: the output labels ALL input
docs with keep/drop + reason, so the cleaning pass is auditable and
re-runnable (the shape lineage-tracking curation jobs need).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from clucene_spark.pipeline.dedup import md5_60, minhash_lsh_pairs
from clucene_spark.pipeline.textstats import quality_score


def clean_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 32,
    bands: int | None = None,
    near_policy: str = "pairwise",
    min_shingles: int | None = None,
) -> DataFrame:
    """(doc_id, quality, reason) for every input doc; reason in
    {'kept', 'low_quality', 'exact_dup', 'near_dup'}.

    Order of gates matters and is part of the contract: a low-quality doc
    is never charged as a duplicate; an exact duplicate never reaches the
    near-dup pass (its keeper represents the group there).

    near_policy picks the near-dup survivor rule:
      'pairwise' — drop the higher doc_id of each verified pair (greedy;
                   a doc survives iff it has no lower-id near-dup partner);
      'cluster'  — connected components over the pair graph, keep one doc
                   (the min id) per component (pipeline/graph.py). The
                   production shape: transitive duplicates a~b~c collapse
                   to a single survivor even when a!~c directly."""
    from pyspark import StorageLevel

    # Narrow frames persist; text never does. The labeling join at the
    # end and the three dedup stages all reference the quality / keep-id
    # relations — without materialization each reference re-runs the
    # tokenize subtree (DataFrame subtree reuse is NOT caching), which at
    # 1M docs turned this composition from ~6 min of real work into a
    # timeout. Cached rows are ~16-24 B/doc (disk-spillable); text is
    # re-read from the source scan where a stage genuinely needs it.
    q = (
        quality_score(docs)
        .select("doc_id", "quality")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    d = docs.select("doc_id", "text").join(q, "doc_id")
    passq = d.filter(F.col("quality") >= min_quality)

    w = Window.partitionBy("h", "len")
    g = (
        passq.withColumn("h", md5_60(F.col("text")))
        .withColumn("len", F.length("text"))
        .withColumn("keep_id", F.min("doc_id").over(w))
    )
    keep_flags = (
        g.select(
            "doc_id", (F.col("doc_id") == F.col("keep_id")).alias("is_keeper")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    exact_dup = keep_flags.filter(~F.col("is_keeper")).select("doc_id")
    # MATERIALIZE the exact-unique survivors before the near-dup pass. A
    # production pipeline writes this intermediate corpus out between
    # stages; here the checkpoint is that table. It also matters for the
    # plan: the minhash pipeline over a join-lineage input loses all
    # cardinality stats and its one big query (state + banding +
    # self-join + verify) mis-plans into tens of GB of sort spill at 1M
    # docs, while the identical rows behind a leaf relation plan and run
    # cleanly (BENCH/large_corpus.json).
    rem = (
        docs.select("doc_id", "text")
        .join(keep_flags.filter(F.col("is_keeper")).select("doc_id"), "doc_id")
        .localCheckpoint(eager=True)
    )

    pairs = minhash_lsh_pairs(
        rem, n=n, num_hashes=num_hashes, bands=bands, threshold=threshold,
        min_shingles=min_shingles,
    )
    if near_policy == "cluster":
        from clucene_spark.pipeline.graph import connected_components

        comp = connected_components(pairs)
        near = comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
    elif near_policy == "pairwise":
        near = pairs.select(F.col("b").alias("doc_id")).distinct()
    else:
        raise ValueError(f"unknown near_policy: {near_policy!r}")

    out = (
        d.select("doc_id", "quality")
        .join(exact_dup.withColumn("is_exact", F.lit(True)), "doc_id", "left")
        .join(near.withColumn("is_near", F.lit(True)), "doc_id", "left")
        .withColumn(
            "reason",
            F.when(F.col("quality") < min_quality, F.lit("low_quality"))
            .when(F.col("is_exact"), F.lit("exact_dup"))
            .when(F.col("is_near"), F.lit("near_dup"))
            .otherwise(F.lit("kept")),
        )
        .select("doc_id", "quality", "reason")
    )
    return out


def ingest_webtext(
    pages: DataFrame,
    min_quality: float = 0.05,
    line_max_docs: int = 1,
    nfc: bool = True,
    html_col: str = "html",
    ts_col: str = "ts",
    url_col: str = "url",
) -> DataFrame:
    """Crawl-in, training-corpus-out: the composed webtext front door,
    every stage an individually-gated primitive, in production order:

      1. extract    — html -> text (extract.extract_text_col, map-only)
      2. normalize  — NFC + control/whitespace spec (normalize_text_col)
      3. URL dedup  — latest capture per canonical URL survives
      4. line dedup — corpus-duplicated (boilerplate) lines removed,
                      surviving docs rewritten
      5. quality    — textstats.quality_score over the CLEANED text

    Every INPUT row comes back labeled: (doc_id, fate, quality, n_lines,
    n_kept, text_clean), fate in {'kept', 'url_dup', 'all_boilerplate',
    'low_quality'}; sentinel stats (-1.0 / 0 / '') for rows that never
    reach a stage — auditable lineage, nothing silently destroyed.

    Plan shape at 100 TB: stages 1-2 fuse into the scan (one Arrow pass
    + Catalyst string math); stage 3 shuffles (canon, ts, id) triples
    and semi-joins survivors back by id; stage 4 is the hash-only
    line-dedup shape (text crosses the wire once); stage 5 is map-only.
    """
    from clucene_spark.pipeline.dedup import line_dedup
    from clucene_spark.pipeline.extract import (
        extract_text_col,
        normalize_text_col,
    )
    from clucene_spark.pipeline.urls import canonicalize_url

    ext = pages.select(
        "doc_id",
        F.col(ts_col).alias("ts"),
        canonicalize_url(F.col(url_col)).alias("canon_url"),
        normalize_text_col(
            extract_text_col(F.col(html_col)), nfc=nfc
        ).alias("text"),
    )
    keep = (
        ext.groupBy("canon_url")
        .agg(F.max(F.struct("ts", "doc_id"))["doc_id"].alias("doc_id"))
        .select("doc_id")
    )
    survivors = ext.join(keep, "doc_id", "left_semi")
    url_dups = ext.join(keep, "doc_id", "left_anti").select(
        "doc_id",
        F.lit("url_dup").alias("fate"),
        F.lit(-1.0).alias("quality"),
        F.lit(0).cast("long").alias("n_lines"),
        F.lit(0).cast("long").alias("n_kept"),
        F.lit("").alias("text_clean"),
    )
    ld = line_dedup(
        survivors.select("doc_id", "text"), max_docs=line_max_docs
    )
    q = quality_score(
        ld.select("doc_id", F.col("text_clean").alias("text"))
    ).select("doc_id", "quality")
    labeled = ld.join(q, "doc_id").select(
        "doc_id",
        F.when(F.col("n_kept") == 0, F.lit("all_boilerplate"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .otherwise(F.lit("kept"))
        .alias("fate"),
        "quality",
        "n_lines",
        "n_kept",
        F.when(
            (F.col("n_kept") > 0)
            & (F.col("quality") >= min_quality),
            F.col("text_clean"),
        ).otherwise(F.lit("")).alias("text_clean"),
    )
    return labeled.unionByName(url_dups)


def ingest_crawl(
    pages: DataFrame,
    robots: DataFrame,
    blocklist: DataFrame,
    agent: str = "cluceneSparkBot",
    max_host_labels: int = 10,
) -> DataFrame:
    """The crawl-side admission cascade composed end-to-end, every input
    page labeled with its fate:

        robots_denied   — the domain's robots.txt disallows the path
        blocked_domain  — domain (or a parent) is blocklisted
        no_content      — boilerplate removal leaves no main text
        url_dup         — an earlier capture of a canonical URL whose
                          latest capture also survived admission
        kept            — survives everything; text_out carries the
                          extracted main text

    Single-pass plan (this is the 100-TB shape — the naive per-fate
    branch-and-union recomputes the whole upstream cascade once per
    fate: 24 Python UDF evals, 44 exchanges, and a sort-merge join
    keyed on the raw html bytes at gate scale):

      1. robots decision  — one broadcast rules join + one Arrow batch
                            pass (robots_filter, keep_denied);
      2. blocklist        — suffix semantics via one broadcast hash
                            join PER HOST LABEL LEVEL (<= max_host_labels)
                            instead of explode+join-back, so the page
                            table neither explodes nor shuffles and the
                            html column never enters a join key;
      3. extraction       — ONE Arrow-batched main-text pass, html
                            masked to b'' for policy-dropped pages so
                            the expensive parse runs only on admitted
                            bytes (cheap-to-expensive crawl order);
      4. latest-wins      — the only shuffle: a window over the
                            canonical URL (policy-dropped rows get a
                            per-row key so they never contest), winner
                            = max(struct(warc_ts, doc_id)).

    Input: (doc_id, url, warc_ts, html). Output: (doc_id, fate,
    text_out) — text_out null except for kept rows. Hosts with more
    than ``max_host_labels`` labels only have their first
    ``max_host_labels`` suffix levels checked."""
    from clucene_spark.pipeline.extract import extract_main_text_col
    from clucene_spark.pipeline.robots import robots_filter
    from clucene_spark.pipeline.urls import canonicalize_url, domain_of

    src = pages.select("doc_id", "url", "warc_ts", "html")
    r = robots_filter(src, robots, agent=agent, keep_denied=True)

    labels = F.split(domain_of(F.col("url")), r"\.")
    n = F.size(labels)
    # distinct() once and materialize lazily: each of the <=10 per-level
    # broadcasts below re-plans its input, and without the checkpoint the
    # (small) blocklist would be re-scanned and re-shuffled per level.
    bl = (
        blocklist.select(F.lower(F.col("domain")).alias("_bld"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    marked = r
    hit_cols = []
    for i in range(max_host_labels):
        bli = F.broadcast(bl.select(F.col("_bld").alias(f"_bld{i}")))
        sfx = F.when(n > i, F.array_join(F.slice(labels, i + 1, n), "."))
        marked = marked.join(bli, sfx == F.col(f"_bld{i}"), "left")
        hit_cols.append(F.col(f"_bld{i}").isNotNull())
    blocked = hit_cols[0]
    for h in hit_cols[1:]:
        blocked = blocked | h

    policy_ok = F.col("robots_allowed") & ~blocked
    step = marked.select(
        "doc_id",
        "warc_ts",
        F.when(~F.col("robots_allowed"), F.lit("robots_denied"))
        .when(blocked, F.lit("blocked_domain"))
        .alias("policy_fate"),
        extract_main_text_col(
            F.when(policy_ok, F.col("html")).otherwise(F.lit(b""))
        ).alias("main_text"),
        canonicalize_url(F.col("url")).alias("canon"),
    )
    pre = step.select(
        "doc_id",
        "warc_ts",
        "main_text",
        F.coalesce(
            F.col("policy_fate"),
            F.when(F.col("main_text") == "", F.lit("no_content")),
        ).alias("pre_fate"),
        "canon",
    )
    # Admitted rows group by canonical URL; dropped rows get a per-row
    # key (canon never contains NUL) so each forms a singleton group.
    group_key = F.when(F.col("pre_fate").isNull(), F.col("canon")).otherwise(
        F.concat(F.lit("\x00drop\x00"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy(group_key)
    winner = F.max(F.struct("warc_ts", "doc_id")).over(w)
    is_kept = F.col("pre_fate").isNull() & (winner["doc_id"] == F.col("doc_id"))
    return pre.select(
        "doc_id",
        F.coalesce(
            F.col("pre_fate"),
            F.when(is_kept, F.lit("kept")).otherwise(F.lit("url_dup")),
        ).alias("fate"),
        F.when(is_kept, F.col("main_text")).alias("text_out"),
    )
