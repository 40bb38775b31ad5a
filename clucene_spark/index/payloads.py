"""Per-position token payloads (reference index/Payload.h:18-40).

The reference attaches an opaque byte[] to individual token positions
(Token::setPayload, stored in the .prx stream by DocumentsWriter; read back
via TermPositions::getPayload) — the classic consumer is a boosting term
query that folds payload bytes into the score.

Spark model: a token stream may carry a `payload` binary column; postings
then keep `payloads` ALIGNED with `positions` (payloads[i] rides with
positions[i], exactly the .prx pairing). Scoring folds a payload-derived
factor into BM25 — the AveragePayloadFunction shape, with the first
payload byte as the boost value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def build_postings_with_payloads(tokens: DataFrame) -> DataFrame:
    """tokens(doc_id, pos, term, payload:binary|null) ->
    (term, doc_id, tf, positions, payloads) with positional alignment.

    Sorting the (pos, payload) structs keeps the two arrays index-aligned
    after the aggregation — payloads[i] is the payload at positions[i]."""
    g = tokens.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"),
        F.sort_array(F.collect_list(F.struct("pos", "payload"))).alias("pp"),
    )
    return g.select(
        "term",
        "doc_id",
        "tf",
        F.col("pp.pos").alias("positions"),
        F.col("pp.payload").alias("payloads"),
    )


def first_byte(payload_col):
    """First payload byte as an int column (works for arbitrary binary:
    hex() then base-16 decode of the leading pair)."""
    return F.conv(F.substring(F.hex(payload_col), 1, 2), 16, 10).cast("double")


def avg_payload_boost(payloads_col):
    """AveragePayloadFunction over first bytes; empty/missing payloads
    score 1.0 (the reference's default when no payload is present)."""
    total = F.aggregate(
        payloads_col,
        F.lit(0.0),
        lambda acc, p: acc + F.coalesce(first_byte(p), F.lit(1.0)),
    )
    n = F.size(payloads_col)
    return F.when(n > 0, total / n).otherwise(F.lit(1.0))


def payload_term_scores(
    postings_p: DataFrame,
    doc_lens: DataFrame,
    term: str,
    n_docs: int,
    avgdl: float,
) -> DataFrame:
    """BoostingTermQuery analogue: BM25(term) x avg(first payload byte).
    postings_p must come from build_postings_with_payloads."""
    from clucene_spark.search import similarity as sim

    hits = postings_p.filter(F.col("term") == term)
    df_count = hits.count()
    if df_count == 0:
        return postings_p.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    idf = sim.bm25_idf_py(df_count, n_docs)
    p = hits.join(doc_lens, "doc_id")
    score = (
        F.lit(idf)
        * sim.bm25_tf(F.col("tf"), F.col("dl"), F.lit(avgdl))
        * avg_payload_boost(F.col("payloads"))
    )
    return p.select("doc_id", score.alias("score"))
