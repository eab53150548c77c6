"""Warm query engine: a persistent actor pool answering BM25 queries at
low latency.

The ``Index.search`` pipeline launches Ray Data jobs per call — right for
throughput batches, wrong for latency (hundreds of ms of scheduling per
call).  This is the resident form of the reference's hot searcher
(``IndexSearcher`` over a shared ``DirectoryReader`` with leaf slices on an
executor, ``lucene/core/src/java/org/apache/lucene/search/IndexSearcher
.java:183-209,564-593``; Solr's scatter-gather over shard replicas):

- N ``SegmentSearcher`` actors, each OWNING a static partition of the
  segments (round-robin by size), postings loaded once in the constructor
  and kept hot across queries;
- global collection/term stats resolved once per distinct term and cached
  engine-side (the ExactStatsCache role), so repeated query terms skip the
  stats round-trip entirely;
- ``search`` = one actor round-trip per query batch + driver TopDocs
  merge.  This is the only place the engine drops to raw ``@ray.remote``
  actors — the Dataset API cannot express a resident service.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from lucene_solr_ray.analysis.analyzer import StandardAnalyzer
from lucene_solr_ray.search.parser import QueryParser
from lucene_solr_ray.search.query import Query
from lucene_solr_ray.search.scorer import GlobalStats
from lucene_solr_ray.search.searcher import (
    Index,
    _collect_patterns,
    _merge_topk,
    rewrite_query,
)
from lucene_solr_ray.search.similarity import BM25Similarity

__all__ = ["QueryEngine"]


def _make_actor_cls():
    import ray

    @ray.remote
    class SegmentSearcherActor:
        def __init__(self, seg_dirs: List[str], seg_ords: List[int],
                     load_positions: bool):
            from collections import OrderedDict

            from lucene_solr_ray.search.reader import SegmentReader

            self.readers = [
                (SegmentReader(d, load_positions=load_positions), o)
                for d, o in zip(seg_dirs, seg_ords)
            ]
            # per-actor LRU of per-segment top-k results — the
            # LRUQueryCache role (reference ``search/LRUQueryCache.java``;
            # ours caches scored top-k rather than filter bitsets: global
            # stats are append-stable within one engine, so repeats are
            # bit-identical). 1024 entries ≈ a few MB.
            self._cache: "OrderedDict" = OrderedDict()
            self._cache_cap = 1024

        def term_stats(self, terms: List[str]) -> Dict[str, Tuple[int, int]]:
            out: Dict[str, Tuple[int, int]] = {}
            for reader, _ in self.readers:
                for t in terms:
                    st = reader.term_stats(t)
                    if st:
                        df, ttf = out.get(t, (0, 0))
                        out[t] = (df + st[0], ttf + st[1])
            return out

        def cold_meta(self, terms: List[str], patterns):
            """Everything a cold query needs in ONE round trip: this
            actor's (df, ttf) partials for the explicit terms, each
            pattern's expansion, AND the expanded terms' partials (so the
            blended-fuzzy rewrite needs no follow-up stats call).  The
            pattern scan runs Arrow kernels over the reader's term
            column, not a Python loop."""
            from lucene_solr_ray.search.searcher import match_terms_arrow

            stats: Dict[str, Tuple[int, int]] = {}
            expansions: List[set] = [set() for _ in patterns]

            def acc(t: str, reader) -> None:
                st = reader.term_stats(t)
                if st:
                    df, ttf = stats.get(t, (0, 0))
                    stats[t] = (df + st[0], ttf + st[1])

            for reader, _ in self.readers:
                counted = set(terms)
                for t in terms:
                    acc(t, reader)
                for pi, pat in enumerate(patterns):
                    ms = match_terms_arrow(pat, reader.terms_arrow)
                    expansions[pi].update(ms)
                    for t in ms:
                        if t not in counted:
                            counted.add(t)
                            acc(t, reader)
            return {
                "stats": stats,
                "expansions": [sorted(e) for e in expansions],
            }

        def prime(self) -> int:
            """firstSearcher warming (Solr's solrconfig warm-up queries):
            exercise the scoring + expansion code paths once so the first
            real query doesn't pay module-import and kernel-JIT costs."""
            from lucene_solr_ray.search.query import FuzzyQuery, TermQuery
            from lucene_solr_ray.search.scorer import (
                GlobalStats,
                topk_segment,
            )
            from lucene_solr_ray.search.searcher import match_terms_arrow

            n = 0
            for reader, _ in self.readers:
                ts = reader.terms
                if not ts:
                    continue
                t0 = ts[0]
                st = reader.term_stats(t0) or (1, 1)
                gs = GlobalStats(
                    doc_count=max(reader.stats["doc_count"], 1),
                    sum_total_term_freq=max(
                        reader.stats["sum_total_term_freq"], 1
                    ),
                )
                gs.df[t0], gs.ttf[t0] = st
                topk_segment(reader, TermQuery(t0), gs, 1)
                match_terms_arrow(
                    FuzzyQuery(t0[:3] or t0, max_edits=1),
                    reader.terms_arrow,
                )
                n += 1
            return n

        def search(self, parsed, stats: GlobalStats, sim) -> List[dict]:
            from lucene_solr_ray.search.scorer import topk_segment

            rows = []
            for reader, seg_ord in self.readers:
                for qid, q, k in parsed:
                    key = (seg_ord, repr(q), k, type(sim).__name__)
                    hit = self._cache.get(key)
                    if hit is not None:
                        self._cache.move_to_end(key)
                        ords, scores = hit
                    else:
                        ords, scores = topk_segment(reader, q, stats, k, sim)
                        self._cache[key] = (ords, scores)
                        if len(self._cache) > self._cache_cap:
                            self._cache.popitem(last=False)
                    dids = reader.doc_ids[ords]
                    for o, d, s in zip(ords, dids, scores):
                        rows.append(
                            {"qid": qid, "doc_id": int(d),
                             "score": float(s), "seg_ord": seg_ord,
                             "ord": int(o)}
                        )
            return rows

    return SegmentSearcherActor


class QueryEngine:
    """Resident searcher over a committed index; create once, query many."""

    def __init__(
        self,
        index: Index | str,
        num_actors: int = 4,
        load_positions: bool = True,
        analyzer: Optional[StandardAnalyzer] = None,
        similarity: Optional[BM25Similarity] = None,
        replicas: Optional[Sequence[str]] = None,
    ):
        import ray

        if isinstance(index, str):
            index = Index(index)
        self.index = index
        self.parser = index.make_parser(analyzer)
        self.sim = similarity or BM25Similarity()
        self._stats_cache: Dict[str, Tuple[int, int]] = {}
        self._expansion_cache: Dict[Query, Tuple[str, ...]] = {}
        self._load_positions = load_positions

        # replica-aware serving (reference ``lucene/replicator/.../
        # IndexRevision.java``: replicas exist to SERVE searches): actors
        # read their segments from caught-up replica directories,
        # spreading IO; a replica whose committed segment state does not
        # match the primary's (stale generation) is dropped — it would
        # serve a different commit point
        self._replica_roots = [
            r for r in (replicas or ())
            if self._replica_current(index, r)
        ]

        seg_dirs = index.seg_dirs
        n = min(num_actors, max(len(seg_dirs), 1))
        cls = _make_actor_cls()
        self._actor_cls = cls
        # round-robin assignment (by index — sizes are near-uniform by
        # construction; size-aware binpacking drops in trivially)
        parts: List[Tuple[List[str], List[int]]] = [([], []) for _ in range(n)]
        for i, d in enumerate(seg_dirs):
            parts[i % n][0].append(d)
            parts[i % n][1].append(i)
        self._parts = [(dirs, ords) for dirs, ords in parts if dirs]
        self.actors = [
            cls.remote(self._serve_dirs(ai, dirs), ords, load_positions)
            for ai, (dirs, ords) in enumerate(self._parts)
        ]

    @staticmethod
    def _replica_current(index: Index, replica_dir: str) -> bool:
        """True iff the replica's committed segment state (ids + delete /
        DV / soft generations) equals the primary's — the caught-up check
        the reference's replication handler performs before serving."""
        from lucene_solr_ray.index.manifest import read_latest_manifest

        rm = read_latest_manifest(replica_dir)
        if rm is None:
            return False

        def state(m):
            return sorted(
                (int(s["segment_id"]), int(s.get("del_gen", 0)),
                 int(s.get("soft_del_gen", 0)),
                 tuple(sorted((s.get("dv_gens") or {}).items())))
                for s in m["segments"]
            )

        return state(rm) == state(index.manifest)

    def _serve_dirs(self, actor_i: int, dirs: List[str]) -> List[str]:
        """Resolve an actor's segment dirs against its replica root
        (round-robin across replicas; primary serves when none)."""
        if not self._replica_roots:
            return dirs
        root = self._replica_roots[actor_i % len(self._replica_roots)]
        out = []
        for d in dirs:
            rd = os.path.join(root, os.path.basename(os.path.normpath(d)))
            out.append(rd if os.path.isdir(rd) else d)
        return out

    def _gather(self, method: str, *args) -> List:
        """Fan a call to every actor; on an actor death, FAIL OVER by
        rebuilding that actor's partition from the PRIMARY directories
        and retrying its call (the replication handler's
        fall-back-to-master behavior)."""
        import ray

        futs = [getattr(a, method).remote(*args) for a in self.actors]
        out: List = []
        for i, f in enumerate(futs):
            try:
                out.append(ray.get(f))
            except ray.exceptions.RayActorError:
                dirs, ords = self._parts[i]
                self.actors[i] = self._actor_cls.remote(
                    dirs, ords, self._load_positions
                )
                out.append(ray.get(
                    getattr(self.actors[i], method).remote(*args)
                ))
        return out

    def warm(self, queries: Optional[Sequence[str]] = None,
             k: int = 10) -> None:
        """Block until every actor has loaded its segments AND run the
        firstSearcher-style warm-up: one scoring + one expansion per
        reader, plus (optionally) a list of representative warm-up
        queries executed end-to-end with results discarded — the role of
        Solr's configured ``firstSearcher``/``newSearcher`` listener
        queries (``solr/core/src/java/org/apache/solr/core/
        QuerySenderListener.java``), which exist precisely so production
        latency never pays first-execution costs."""
        self._gather("prime")
        for q in queries or ():
            self.search({0: q}, k=k)

    def _stats_for(self, terms: Sequence[str],
                   patterns: List[Query]) -> Tuple[GlobalStats, Dict]:
        import ray

        missing = [t for t in terms if t not in self._stats_cache]
        new_patterns = [p for p in patterns if p not in self._expansion_cache]
        if missing or new_patterns:
            # ONE actor round trip covers missing-term stats, pattern
            # expansions, and the expanded terms' stats (cold queries
            # previously paid 2-3 sequential rounds — the warm-pool p99
            # tail)
            parts = self._gather("cold_meta", missing, new_patterns)
            # sum per-actor partials for keys we did NOT already have
            # (an actor re-reports a cached term only when a new pattern
            # matches it; adding that would double-count)
            known = set(self._stats_cache)
            fresh: Dict[str, Tuple[int, int]] = {}
            for part in parts:
                for t, (df, ttf) in part["stats"].items():
                    if t in known:
                        continue
                    df0, ttf0 = fresh.get(t, (0, 0))
                    fresh[t] = (df0 + df, ttf0 + ttf)
            self._stats_cache.update(fresh)
            for t in missing:
                self._stats_cache.setdefault(t, (0, 0))
            for pi, pat in enumerate(new_patterns):
                acc = set()
                for part in parts:
                    acc.update(part["expansions"][pi])
                self._expansion_cache[pat] = tuple(sorted(acc))
                # expansion terms' stats are now cached too — the blended
                # rewrite's top-up becomes a cache hit
                for t in self._expansion_cache[pat]:
                    self._stats_cache.setdefault(t, (0, 0))
        expansions = {p: self._expansion_cache[p] for p in patterns}
        m = self.index.manifest
        stats = GlobalStats(
            doc_count=m["doc_count"],
            sum_total_term_freq=m["sum_total_term_freq"],
            field_stats={
                f: (fs["doc_count"], fs["sum_total_term_freq"])
                for f, fs in m.get("fields", {}).items()
                if f != m.get("default_field")
            },
        )
        for t in terms:
            df, ttf = self._stats_cache.get(t, (0, 0))
            stats.df[t] = df
            stats.ttf[t] = ttf
        return stats, expansions

    def search(self, queries: Dict[int, str] | Sequence[str],
               k: int = 10) -> pa.Table:
        import ray

        items = (
            sorted(queries.items())
            if isinstance(queries, dict)
            else list(enumerate(queries))
        )
        parsed = [(qid, self.parser.parse(s), k) for qid, s in items]
        patterns: List[Query] = []
        for _, q, _ in parsed:
            _collect_patterns(q, patterns)
        terms = sorted({t for _, q, _ in parsed for t in q.terms()})
        stats, exp = self._stats_for(terms, patterns)
        if patterns:
            parsed = [(qid, rewrite_query(q, exp), kk)
                      for qid, q, kk in parsed]
            # blended rewrites (fuzzy) score with real stats — top up
            # ONLY their terms (constant-score expansions never read df,
            # and a broad wildcard would otherwise drag thousands of
            # stats fetches into the warm path)
            from lucene_solr_ray.search.query import BlendedTermQuery

            def _blended_terms(q):
                out = set()
                stack = [q]
                while stack:
                    node = stack.pop()
                    if isinstance(node, BlendedTermQuery):
                        out.update(node.bl_terms)
                    for attr in ("query", "disjuncts", "clauses"):
                        sub = getattr(node, attr, None)
                        if sub is None:
                            continue
                        if attr == "clauses":
                            stack.extend(c.query for c in sub)
                        elif attr == "disjuncts":
                            stack.extend(sub)
                        else:
                            stack.append(sub)
                return out

            extra = sorted(
                {t for _, q, _ in parsed for t in _blended_terms(q)}
                - set(stats.df)
            )
            if extra:
                more, _ = self._stats_for(extra, [])
                stats.df.update(more.df)
                stats.ttf.update(more.ttf)
        rows: List[dict] = []
        for part in self._gather("search", parsed, stats, self.sim):
            rows.extend(part)
        return _merge_topk(rows, parsed, self.sim.out_dtype)

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []
