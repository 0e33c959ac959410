"""knowledgegraph_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the query/data-processing capabilities of the
reference repo SirajuddinShaik/KnowledgeGraph (/root/reference, read-only) on
top of ray.data.Dataset: streaming Parquet reads, zero-copy Arrow map_batches
stages, actor pools for stateful extraction/embedding, and explicit
groupby-shuffle stages for entity canonicalization and edge dedup.

Layout:
  config/     entity-type schemas, field mappings, merge strategies, match rules
  functions/  pure functions (html→text, tuple-format grammar, ids, normalize)
  sources/    synthetic Common-Crawl-style page generator + readers
  stages/     Ray Data stages (extract, canonicalize, edges, embed, dedup, ...)
  pipelines/  end-to-end pipelines (kg_build, merge_extracted, query)
  state/      per-partition lineage manifests + checkpoint-resume

Nothing in this package calls ray.init()/ray.shutdown(); sessions are owned by
the caller (bench.py, CLI entry points, test fixtures, or the driver).
"""

__version__ = "0.1.0"
