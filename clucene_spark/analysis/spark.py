"""Spark entry points for the analyzers — Arrow-batched, never per-row Python.

``tokenize_standard`` runs the StandardAnalyzer chain over a docs DataFrame
via mapInPandas: one Python worker call per Arrow batch, emitting the
exploded token table. This is the UDF slow path the architecture confines
to exactly one place (the DFA genuinely cannot be expressed as column ops);
everything downstream is JVM-side DataFrame algebra.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from clucene_spark.analysis.standard import standard_analyze

TOKEN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("pos", T.IntegerType(), False),
        T.StructField("start_off", T.IntegerType(), False),
        T.StructField("end_off", T.IntegerType(), False),
        T.StructField("type", T.StringType(), False),
    ]
)


def tokenize_standard(
    docs: DataFrame, text_col: str = "text", doc_id_col: str = "doc_id"
) -> DataFrame:
    """docs -> (doc_id, term, pos, start_off, end_off, type).

    Column-prunes to exactly (doc_id, text) before the Python stage so the
    Arrow transfer carries no dead columns (scan pruning survives into the
    mapInPandas input)."""
    src = docs.select(
        F.col(doc_id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )

    def analyze_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_term, out_pos, out_s, out_e, out_ty = [], [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
                if text is None:
                    continue
                for term, pos, s, e, ty in standard_analyze(text):
                    out_doc.append(doc_id)
                    out_term.append(term)
                    out_pos.append(pos)
                    out_s.append(s)
                    out_e.append(e)
                    out_ty.append(ty)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "term": pd.Series(out_term, dtype="object"),
                    "pos": pd.Series(out_pos, dtype="int32"),
                    "start_off": pd.Series(out_s, dtype="int32"),
                    "end_off": pd.Series(out_e, dtype="int32"),
                    "type": pd.Series(out_ty, dtype="object"),
                }
            )

    return src.mapInPandas(analyze_batches, schema=TOKEN_SCHEMA)
