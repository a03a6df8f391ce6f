"""meilibridge_spark — a PySpark-native full-text engine.

Re-expresses the capabilities of Ja7ad/meilibridge (a Go sync bridge
MongoDB/MySQL/Postgres → Meilisearch; see /root/reference) as a
from-scratch Spark engine: extraction → inverted-index build (term-
partitioned postings, delta-gap + varint block compression, salted-key
merge for hot-term skew) → BM25 top-k query with block-max WAND
pruning — over a table of multi-turn transcripts
(conv_id, turn_idx, role, text, tool, ts).

Layout:
  functions/   pure, Spark-free algorithm kernels (tokenizer, codec, BM25, WAND)
  operators/   DataFrame-level operators (doc assembly, postings, search, relational,
               dedup, similarity, textstats, multimodal)
  sources/     synthetic transcripts generator, table IO + snapshot manifest, CDC fixtures
  streaming/   Structured Streaming CDC maintenance
  plans/       build orchestration (full + incremental + resume)
  jobs/        spark-submit entry points
"""

__version__ = "0.1.0"
