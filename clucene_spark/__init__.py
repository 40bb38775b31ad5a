"""clucene_spark — a PySpark-native full-text index + search engine.

Brand-new implementation (NOT a port) with the query and data-processing
capabilities of CLucene (reference surveyed in SURVEY.md). Everything is
expressed Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
vectorized pandas/Arrow UDFs only where built-in operators cannot express
the semantics (tokenizer DFA, varbyte codecs, block-max WAND).

Layout:
  analysis/     tokenizers + token filters (StandardAnalyzer DFA parity)
  index/        postings build, codecs, segments, merge/compaction, checkpoints
  search/       similarity (Classic TF-IDF + BM25), query algebra, WAND top-k
  queryparser/  Lucene-grammar query parser -> AST -> DataFrame plans
  textops/      dedup (exact/minhash/simhash/jaccard), lang-id, quality, fingerprint
  vectors/      embedding similarity search (brute-force / LSH / IVF)
  data/         deterministic synthetic webtext generator (FIXTURES.md §A)
"""

__version__ = "0.1.0"
