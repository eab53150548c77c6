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


def __getattr__(name):
    """Lazy top-level API: ``from lucene_solr_ray import build_index, Index``
    without importing Ray at package-import time."""
    if name == "build_index":
        from lucene_solr_ray.index.build import build_index

        return build_index
    if name == "Index":
        from lucene_solr_ray.search.searcher import Index

        return Index
    if name == "QueryEngine":
        from lucene_solr_ray.state.query_engine import QueryEngine

        return QueryEngine
    if name == "MemoryIndex":
        from lucene_solr_ray.search.memory import MemoryIndex

        return MemoryIndex
    if name == "StandardAnalyzer":
        from lucene_solr_ray.analysis.analyzer import StandardAnalyzer

        return StandardAnalyzer
    raise AttributeError(name)
