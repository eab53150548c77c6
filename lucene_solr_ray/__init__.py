"""lucene_solr_ray — a Ray-Data-native inverted-index build + BM25 query engine.

A brand-new engine with the query/data-processing capabilities of Apache
Lucene/Solr (reference: nknize/lucene-solr, Lucene 8.0.0-SNAPSHOT), expressed
as idiomatic Ray Data pipelines: ``ray.data.Dataset`` -> ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages, ``groupby``/``sort``
/``repartition`` for wide steps.

Subpackages
-----------
- ``analysis``  — StandardAnalyzer-equivalent chain (UAX#29 tokenizer,
  lowercase, stop filter), SmallFloat norm encoding.
- ``index``     — segment build pipeline, manifests, merge policy.
- ``search``    — BM25 similarity (float32-exact), query algebra, scorers,
  top-k merge, query parser.
- ``stages``    — generic relational Dataset stages (the Solr streaming-
  expression algebra: joins, rollups, sorts, set ops...).
- ``functions`` — training-data-pipeline ops: dedup (exact/minhash/simhash),
  similarity search, text analysis, multimodal stubs.
- ``pipelines`` — end-to-end pipelines wired for the driver entry points.
"""

__version__ = "0.1.0"
