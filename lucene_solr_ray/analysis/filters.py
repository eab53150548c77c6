"""Componentized analysis chain: tokenizer + token-filter factories.

The reference's analysis module is a registry of ~330 factories assembled
into per-field chains (``lucene/analysis/common/src/java/org/apache/
lucene/analysis/`` + ``util/TokenFilterFactory.java``; Solr's
``<analyzer>`` fieldType XML).  This module provides the same composition
model over this engine's token stream — a list of (term, position)
pairs — plus the most-used factories:

    CustomAnalyzer(filters=[
        LowerCaseFilter(), SynonymFilter({"fast": ["quick"]}),
        StopFilter({"the"}), ShingleFilter(2, 2),
    ])

Each filter maps a token stream to a token stream; position increments are
preserved through drops (StopFilter-style gap accumulation is built into
the stream representation — positions are absolute).  Every factory cites
its reference counterpart.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from lucene_solr_ray.analysis.analyzer import StandardAnalyzer, lowercase

__all__ = [
    "CustomAnalyzer",
    "TokenFilter",
    "LowerCaseFilter",
    "UpperCaseFilter",
    "StopFilter",
    "LengthFilter",
    "TrimFilter",
    "ASCIIFoldingFilter",
    "SynonymFilter",
    "SynonymGraphFilter",
    "FlattenGraphFilter",
    "ShingleFilter",
    "NGramFilter",
    "EdgeNGramFilter",
    "PorterStemFilter",
    "StemmerOverrideFilter",
    "KeywordMarkerFilter",
    "ReverseStringFilter",
    "TruncateFilter",
    "PatternReplaceFilter",
]

#: token stream = list of (term, absolute position)
Stream = List[Tuple[str, int]]


class TokenFilter:
    """Base: transform a token stream (reference ``TokenFilter.java``)."""

    def apply(self, stream: Stream) -> Stream:  # pragma: no cover
        raise NotImplementedError


class LowerCaseFilter(TokenFilter):
    """``LowerCaseFilterFactory`` (simple per-codepoint mapping)."""

    def apply(self, stream: Stream) -> Stream:
        return [(lowercase(t), p) for t, p in stream]


class UpperCaseFilter(TokenFilter):
    """``UpperCaseFilterFactory``."""

    def apply(self, stream: Stream) -> Stream:
        return [(t.upper(), p) for t, p in stream]


class StopFilter(TokenFilter):
    """``StopFilterFactory`` — drops terms, leaves position gaps."""

    def __init__(self, stop_words: Iterable[str]):
        self.stop = frozenset(stop_words)

    def apply(self, stream: Stream) -> Stream:
        return [(t, p) for t, p in stream if t not in self.stop]


class LengthFilter(TokenFilter):
    """``LengthFilterFactory`` — keep min ≤ len ≤ max."""

    def __init__(self, min_len: int = 0, max_len: int = 1 << 30):
        self.min = min_len
        self.max = max_len

    def apply(self, stream: Stream) -> Stream:
        return [
            (t, p) for t, p in stream if self.min <= len(t) <= self.max
        ]


class TrimFilter(TokenFilter):
    """``TrimFilterFactory``."""

    def apply(self, stream: Stream) -> Stream:
        return [(t.strip(), p) for t, p in stream if t.strip()]


def _build_fold_table():
    """Latin-range folding table built from Unicode decompositions (the
    accented-Latin subset of ASCIIFoldingFilter.java's hand-rolled table;
    the reference table also spans symbol blocks this corpus never has)."""
    import unicodedata

    manual = {"đ": "d", "ħ": "h", "ı": "i", "ł": "l", "ŀ": "l",
              "ø": "o", "ŧ": "t", "ß": "ss", "æ": "ae", "œ": "oe",
              "þ": "th", "ð": "d"}
    table = {}
    for cp in list(range(0x00C0, 0x0180)) + list(range(0x1E00, 0x1F00)):
        c = chr(cp)
        if c in manual:
            table[cp] = manual[c]
            continue
        d = unicodedata.normalize("NFD", c)
        base = "".join(ch for ch in d if not unicodedata.combining(ch))
        if base != c and base.isascii() and base:
            table[cp] = base
    for c, r in manual.items():
        table[ord(c)] = r
        up = c.upper()
        if len(up) == 1:
            table[ord(up)] = r.upper() if len(r) == 1 else r.title()
    return table


_FOLD = _build_fold_table()


class ASCIIFoldingFilter(TokenFilter):
    """``ASCIIFoldingFilterFactory`` (accented-Latin subset)."""

    def apply(self, stream: Stream) -> Stream:
        return [(t.translate(_FOLD), p) for t, p in stream]


class SynonymFilter(TokenFilter):
    """``SynonymGraphFilterFactory`` (single-token synonyms): each mapped
    term EMITS its synonyms at the same position (posIncr 0 — the classic
    index-time expansion)."""

    def __init__(self, synonyms: Dict[str, Sequence[str]],
                 keep_original: bool = True):
        self.synonyms = {k: tuple(v) for k, v in synonyms.items()}
        self.keep_original = keep_original

    def apply(self, stream: Stream) -> Stream:
        out: Stream = []
        for t, p in stream:
            syns = self.synonyms.get(t)
            if syns is None:
                out.append((t, p))
                continue
            if self.keep_original:
                out.append((t, p))
            for s in syns:
                out.append((s, p))
        return out


class SynonymGraphFilter(TokenFilter):
    """``SynonymGraphFilter`` + ``FlattenGraphFilter`` — MULTI-WORD
    synonyms with graph semantics, flattened to index positions
    (reference ``lucene/analysis/common/src/java/org/apache/lucene/
    analysis/synonym/SynonymGraphFilter.java:81`` and
    ``core/.../analysis/graph/... FlattenGraphFilter.java``; test vectors
    from ``TestSynonymGraphFilter.java``).

    Rules map a space-separated phrase to space-separated replacements:
    ``{"new york": ["nyc"], "dns": ["domain name service"]}``.  Matching
    is leftmost-longest and non-overlapping over consecutive stream
    entries (the FST longest-match the reference performs); each match
    inserts a side path into the token graph.  Because a Lucene INDEX
    stores only positions (posLength is discarded at index time), the
    flattened (term, position) stream this filter emits is exactly what
    the reference's index-time ``SynonymGraphFilter → FlattenGraphFilter``
    pair commits:

    - ``"dns is up"`` with dns → "domain name service" (keep_original):
      dns@0, domain@0, name@1, service@2, is@3, up@4 — the longest side
      path defines the span, later tokens shift.
    - ``"new york city"`` with "new york" → nyc: new@0, nyc@0, york@1,
      city@2 — the single-token synonym stacks at the span start.

    Stop-word position holes are preserved through flattening, as
    ``FlattenGraphFilter`` keeps incoming position increments where
    possible.  Use :meth:`expand_graph` to inspect the unflattened graph
    (with posLength) — the analogue of reading PositionLengthAttribute
    before flattening."""

    def __init__(self, synonyms: Dict[str, Sequence[str]],
                 keep_original: bool = True):
        self.rules: Dict[Tuple[str, ...], List[Tuple[str, ...]]] = {}
        for k, vals in synonyms.items():
            key = tuple(k.split())
            if not key:
                continue
            self.rules.setdefault(key, []).extend(
                tuple(v.split()) for v in vals
            )
        self.max_len = max((len(k) for k in self.rules), default=1)
        self.keep_original = keep_original

    # -- graph construction -------------------------------------------------

    def expand_graph(
        self, stream: Stream
    ) -> List[Tuple[str, Tuple[float, int], Tuple[float, int]]]:
        """Token graph as (term, start_node, end_node); node ids order
        topologically.  Input position p is node (p, -1); synthetic nodes
        inside a side path get fractional keys + a unique id."""
        by_pos: Dict[int, List[str]] = {}
        for t, p in stream:
            by_pos.setdefault(p, []).append(t)
        positions = sorted(by_pos)
        matched_at: Dict[int, Tuple[int, Tuple[str, ...]]] = {}
        consumed: set = set()
        i = 0
        while i < len(positions):
            hit = None
            for n in range(min(self.max_len, len(positions) - i), 0, -1):
                window = positions[i: i + n]
                # one token per entry must spell a rule key (stacked
                # tokens offer alternatives, tried in stream order)
                for key in self._spellings(by_pos, window):
                    if key in self.rules:
                        hit = (n, key)
                        break
                if hit:
                    break
            if hit and hit[0] >= 1 and self.rules.get(hit[1]):
                n, key = hit
                matched_at[i] = (n, key)
                if not self.keep_original:
                    for off, p in enumerate(positions[i: i + n]):
                        consumed.add((p, key[off]))
                i += n
            else:
                i += 1

        uid = [0]
        graph: List[Tuple[str, Tuple[float, int], Tuple[float, int]]] = []
        for t, p in stream:
            if (p, t) not in consumed:
                graph.append((t, (float(p), -1), (float(p) + 1.0, -1)))
        for i, (n, key) in matched_at.items():
            ps = positions[i]
            pe = positions[i + n - 1] + 1
            start: Tuple[float, int] = (float(ps), -1)
            end: Tuple[float, int] = (float(pe), -1)
            for rep in self.rules[key]:
                m = len(rep)
                prev = start
                for k, term in enumerate(rep):
                    if k == m - 1:
                        nxt = end
                    else:
                        uid[0] += 1
                        nxt = (
                            ps + (k + 1) * (pe - ps) / m,
                            uid[0],
                        )
                    graph.append((term, prev, nxt))
                    prev = nxt
        return graph

    def _spellings(self, by_pos, window):
        """Every way to pick one token per window entry (stream order)."""
        outs: List[Tuple[str, ...]] = [()]
        for p in window:
            outs = [o + (t,) for o in outs for t in by_pos[p]]
            if len(outs) > 64:  # stacked-token blowup guard
                outs = outs[:64]
        return outs

    def apply(self, stream: Stream) -> Stream:
        return FlattenGraphFilter.flatten(self.expand_graph(stream))


class FlattenGraphFilter(TokenFilter):
    """``FlattenGraphFilter`` (reference ``lucene/core/src/java/org/
    apache/lucene/analysis/graph`` — required after index-time
    SynonymGraphFilter).  :class:`SynonymGraphFilter`'s ``apply`` already
    fuses the flatten (the 2-tuple stream cannot carry an unflattened
    graph), so in a chain this filter is an identity marker; the class
    method :meth:`flatten` is the real algorithm, shared by both."""

    def apply(self, stream: Stream) -> Stream:
        return stream

    @staticmethod
    def flatten(graph) -> Stream:
        """Longest-path layering of the token graph: a node WITH incoming
        edges sits at max(source + 1) — side paths compress or stretch
        the layout, exactly like the reference's output-node frontier.  A
        node with NO incoming edges marks a true hole (stop-word gap): it
        keeps its distance from the nearest preceding graph node, so
        holes survive flattening but consumed spans (keep_original=False)
        legitimately compress."""
        if not graph:
            return []
        in_edges: Dict[Tuple[float, int], List[Tuple[float, int]]] = {}
        nodes = set()
        for t, s, e in graph:
            nodes.add(s)
            nodes.add(e)
            in_edges.setdefault(e, []).append(s)
        out: Dict[Tuple[float, int], int] = {}
        prev: Optional[Tuple[float, int]] = None
        for node in sorted(nodes):
            ins = in_edges.get(node)
            if ins:
                out[node] = max(out[s] + 1 for s in ins)
            elif prev is None:
                out[node] = int(node[0])  # leading hole preserved
            else:
                out[node] = out[prev] + max(1, round(node[0] - prev[0]))
            prev = node
        flat = [
            (t, out[s], out[e] - out[s]) for t, s, e in graph
        ]
        # stable order: position, longer paths (posLength) first — the
        # reference emits the spanning token before the tokens under it
        flat.sort(key=lambda x: (x[1], -x[2]))
        return [(t, p) for t, p, _ in flat]


class ShingleFilter(TokenFilter):
    """``ShingleFilterFactory`` — word n-grams joined by a separator,
    emitted at the first constituent's position (unigrams kept when
    ``output_unigrams``)."""

    def __init__(self, min_size: int = 2, max_size: int = 2,
                 separator: str = " ", output_unigrams: bool = True):
        if min_size < 2:
            raise ValueError("min shingle size is 2")
        self.min = min_size
        self.max = max_size
        self.sep = separator
        self.output_unigrams = output_unigrams

    #: cap on stacked-token combinations per shingle window (synonym
    #: graphs explode combinatorially; the reference's graph flattening
    #: bounds this similarly)
    MAX_COMBINATIONS = 16

    def apply(self, stream: Stream) -> Stream:
        import itertools

        out: Stream = []
        if self.output_unigrams:
            out.extend(stream)
        # POSITION-aware shingling: consecutive positions combine; stacked
        # tokens (posIncr 0 — synonyms) cross-product within the window
        by_pos: Dict[int, List[str]] = {}
        for t, p in stream:
            by_pos.setdefault(p, []).append(t)
        positions = sorted(by_pos)
        for i, p in enumerate(positions):
            for size in range(self.min, self.max + 1):
                if i + size > len(positions):
                    break
                # only CONSECUTIVE positions combine — a position hole
                # (stop-word gap) breaks the shingle, as the reference
                # ShingleFilter inserts filler tokens at holes and never
                # joins across them
                if positions[i + size - 1] != p + size - 1:
                    break
                window = [by_pos[positions[i + j]] for j in range(size)]
                for combo in itertools.islice(
                    itertools.product(*window), self.MAX_COMBINATIONS
                ):
                    out.append((self.sep.join(combo), p))
        return out


class NGramFilter(TokenFilter):
    """``NGramFilterFactory`` — character n-grams of each token."""

    def __init__(self, min_gram: int = 1, max_gram: int = 2):
        self.min = min_gram
        self.max = max_gram

    def apply(self, stream: Stream) -> Stream:
        out: Stream = []
        for t, p in stream:
            for size in range(self.min, self.max + 1):
                for i in range(0, len(t) - size + 1):
                    out.append((t[i: i + size], p))
        return out


class EdgeNGramFilter(TokenFilter):
    """``EdgeNGramFilterFactory`` — front-anchored grams (autocomplete)."""

    def __init__(self, min_gram: int = 1, max_gram: int = 8):
        self.min = min_gram
        self.max = max_gram

    def apply(self, stream: Stream) -> Stream:
        out: Stream = []
        for t, p in stream:
            for size in range(self.min, min(self.max, len(t)) + 1):
                out.append((t[:size], p))
        return out


class KeywordMarkerFilter(TokenFilter):
    """``KeywordMarkerFilterFactory`` — protect terms from stemming (the
    marker travels as membership in ``protected``; PorterStemFilter
    consults it)."""

    def __init__(self, protected: Iterable[str]):
        self.protected = frozenset(protected)

    def apply(self, stream: Stream) -> Stream:
        return stream  # marker only; see PorterStemFilter


class PorterStemFilter(TokenFilter):
    """``PorterStemFilterFactory`` (respects KeywordMarker protections
    earlier in the chain)."""

    def __init__(self, protected: Iterable[str] = ()):
        self.protected = frozenset(protected)

    def apply(self, stream: Stream) -> Stream:
        from lucene_solr_ray.analysis.en import porter_stem

        return [
            (t if t in self.protected else porter_stem(t), p)
            for t, p in stream
        ]


class StemmerOverrideFilter(TokenFilter):
    """``StemmerOverrideFilterFactory`` — dictionary stems win; terms it
    maps are emitted mapped (and later stemmers see the override)."""

    def __init__(self, overrides: Dict[str, str]):
        self.overrides = dict(overrides)

    def apply(self, stream: Stream) -> Stream:
        return [(self.overrides.get(t, t), p) for t, p in stream]


class ReverseStringFilter(TokenFilter):
    """``ReverseStringFilterFactory`` (leading-wildcard support)."""

    def apply(self, stream: Stream) -> Stream:
        return [(t[::-1], p) for t, p in stream]


class TruncateFilter(TokenFilter):
    """``TruncateTokenFilterFactory``."""

    def __init__(self, length: int):
        self.length = length

    def apply(self, stream: Stream) -> Stream:
        return [(t[: self.length], p) for t, p in stream]


class PatternReplaceFilter(TokenFilter):
    """``PatternReplaceFilterFactory``."""

    def __init__(self, pattern: str, replacement: str = ""):
        import re

        self.rx = re.compile(pattern)
        self.replacement = replacement

    def apply(self, stream: Stream) -> Stream:
        out = []
        for t, p in stream:
            t2 = self.rx.sub(self.replacement, t)
            if t2:
                out.append((t2, p))
        return out


class CustomAnalyzer(StandardAnalyzer):
    """StandardTokenizer + an ordered filter chain — the ``<analyzer>``
    fieldType assembly (Solr schema) / ``CustomAnalyzer.builder()``
    (reference ``lucene/analysis/common/.../custom/CustomAnalyzer.java``).

    Plugs into every index/search path that accepts an analyzer; field
    length for norms counts emitted tokens (posIncr-0 synonyms/shingles
    count, as the reference's FieldInvertState does for stacked tokens
    with default settings)."""

    def __init__(self, filters: Sequence[TokenFilter] = (),
                 max_token_length: Optional[int] = None,
                 char_filters: Sequence = (), tokenizer=None):
        super().__init__(
            max_token_length=max_token_length
            or StandardAnalyzer().max_token_length
        )
        self.filters = list(filters)
        #: pre-tokenizer CharFilters (``Analyzer.initReader`` slot):
        #: applied in order before tokenization; their OffsetMaps chain
        #: token offsets back to the ORIGINAL text
        self.char_filters = list(char_filters)
        #: None = UAX#29 StandardTokenizer; else a
        #: :class:`~lucene_solr_ray.analysis.tokenizers.TokenizerFactory`
        #: (Whitespace/Keyword/Letter/PathHierarchy/Pattern/NGram/...)
        self.tokenizer = tokenizer

    def _char_filter(self, text: str):
        """Run the CharFilter chain; returns (clean_text, maps) where
        maps apply outermost-last (compose corrections in reverse)."""
        maps = []
        for cf in self.char_filters:
            text, omap = cf.apply(text)
            maps.append(omap)
        return text, maps

    def _run(self, text: str) -> Stream:
        from lucene_solr_ray.analysis.tokenizer import (
            tokenize,
            tokenize_with_offsets,
        )

        if self.char_filters:
            text, _ = self._char_filter(text)

        if self.tokenizer is not None:
            stream = [
                (t, p) for t, p, _, _ in
                self.tokenizer.run(text, self.max_token_length)
            ]
            for f in self.filters:
                if getattr(f, "needs_offsets", False):
                    raise NotImplementedError(
                        f"{type(f).__name__} needs source offsets; use "
                        "the default StandardTokenizer"
                    )
                stream = f.apply(stream)
            return stream

        if any(getattr(f, "needs_offsets", False) for f in self.filters):
            # offset-consuming filters (CJKBigramFilter) see the source
            # spans; valid only while every preceding filter maps
            # position -> position (offset-safe)
            triples = tokenize_with_offsets(text, self.max_token_length)
            stream = [(t, p) for p, (t, _, _) in enumerate(triples)]
            spans: Optional[Dict[int, Tuple[int, int]]] = {
                p: (s, e) for p, (_, s, e) in enumerate(triples)
            }
            for f in self.filters:
                if getattr(f, "needs_offsets", False):
                    if spans is None:
                        raise NotImplementedError(
                            f"{type(f).__name__} needs source offsets but "
                            "follows a filter that invalidated them"
                        )
                    stream = f.apply_spans(stream, spans)
                    spans = None
                else:
                    if spans is not None and not (
                            isinstance(f, CustomAnalyzer._OFFSET_SAFE)
                            or getattr(f, "offset_safe", False)):
                        spans = None
                    stream = f.apply(stream)
            return stream

        stream = [
            (t, p)
            for p, t in enumerate(tokenize(text, self.max_token_length))
        ]
        for f in self.filters:
            stream = f.apply(stream)
        return stream

    def analyze(self, text: str) -> List[str]:
        return [t for t, _ in self._run(text)]

    def analyze_with_positions(self, text: str):
        stream = self._run(text)
        terms = [t for t, _ in stream]
        positions = [p for _, p in stream]
        return terms, positions, len(terms)

    #: filters that keep a 1:1 (or dropping) mapping from input tokens to
    #: output tokens — offsets into the ORIGINAL text stay valid through
    #: them (case/fold/stem rewrite the term, not the source span; stop/
    #: length/trim only drop).  Graph filters (synonym/shingle/ngram)
    #: create tokens with no single source span and cannot carry offsets.
    _OFFSET_SAFE = None  # set after class definitions below

    def analyze_with_offsets(self, text: str):
        from lucene_solr_ray.analysis.tokenizer import tokenize_with_offsets

        unsafe = [
            f for f in self.filters
            if not (isinstance(f, CustomAnalyzer._OFFSET_SAFE)
                    or getattr(f, "offset_safe", False))
        ]
        if unsafe:
            raise NotImplementedError(
                "offsets cannot pass through graph filters "
                f"({', '.join(type(f).__name__ for f in unsafe)}): "
                "their tokens have no single source span"
            )
        maps = []
        if self.char_filters:
            text, maps = self._char_filter(text)
        if self.tokenizer is not None:
            if getattr(self.tokenizer, "stacks_positions", False):
                raise NotImplementedError(
                    "offsets need unique positions; "
                    f"{type(self.tokenizer).__name__} stacks tokens"
                )
            quads = self.tokenizer.run(text, self.max_token_length)
            triples = [(t, s, e) for t, _, s, e in quads]
        else:
            triples = tokenize_with_offsets(text, self.max_token_length)
        # run the chain over (term, position) while carrying spans by
        # POSITION: every offset-safe filter maps position→position
        stream: Stream = [(t, p) for p, (t, _, _) in enumerate(triples)]
        for f in self.filters:
            stream = f.apply(stream)
        terms, positions, starts, ends = [], [], [], []
        for t, p in stream:
            terms.append(t)
            positions.append(p)
            s, e = triples[p][1], triples[p][2]
            # chain corrections back through the CharFilters, innermost
            # (last applied) first — CharFilter.correctOffset composition
            for omap in reversed(maps):
                s, e = omap.correct(s), omap.correct(e)
            starts.append(s)
            ends.append(e)
        return terms, positions, starts, ends, len(terms)

    def normalize(self, text: str) -> str:
        # apply only the char-level normalizing filters, as
        # Analyzer.normalize does (multi-term query contract)
        out = text
        for f in self.filters:
            if isinstance(f, (LowerCaseFilter, UpperCaseFilter,
                              ASCIIFoldingFilter, TrimFilter)):
                s = f.apply([(out, 0)])
                out = s[0][0] if s else out
        return out

    def spec(self):
        # chains are session objects: the manifest records the kind only;
        # pass the same CustomAnalyzer explicitly at query time
        return {"kind": "custom"}


#: see CustomAnalyzer.analyze_with_offsets
CustomAnalyzer._OFFSET_SAFE = (
    LowerCaseFilter, UpperCaseFilter, StopFilter, LengthFilter,
    TrimFilter, ASCIIFoldingFilter, PorterStemFilter,
    StemmerOverrideFilter, KeywordMarkerFilter, TruncateFilter,
    PatternReplaceFilter, ReverseStringFilter,
)


def parse_solr_synonyms(text: str, expand: bool = True
                        ) -> Dict[str, List[str]]:
    """The Solr ``synonyms.txt`` format (reference
    ``lucene/analysis/common/src/java/org/apache/lucene/analysis/synonym/
    SolrSynonymParser.java:49``) → the rule dict
    :class:`SynonymGraphFilter` consumes:

    - ``a, b, c`` — an equivalence set: ``expand=True`` maps every entry
      to every OTHER entry (the filter keeps the original token);
      ``expand=False`` maps every entry to the FIRST;
    - ``a, b => x, y`` — explicit mapping: each LHS alternative maps to
      every RHS term;
    - ``#`` comments, blank lines, ``\\,`` ``\\=>`` escapes, trimmed
      whitespace; multi-word entries keep interior spaces."""
    out: Dict[str, List[str]] = {}

    def _split(s: str) -> List[str]:
        parts, cur, i = [], [], 0
        while i < len(s):
            c = s[i]
            if c == "\\" and i + 1 < len(s):
                cur.append(s[i + 1])
                i += 2
                continue
            if c == ",":
                parts.append("".join(cur).strip())
                cur = []
            else:
                cur.append(c)
            i += 1
        parts.append("".join(cur).strip())
        return [p for p in parts if p]

    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        # find an unescaped "=>"
        arrow = -1
        i = 0
        while i < len(line) - 1:
            if line[i] == "\\":
                i += 2
                continue
            if line[i : i + 2] == "=>":
                arrow = i
                break
            i += 1
        if arrow >= 0:
            lhs = _split(line[:arrow])
            rhs = _split(line[arrow + 2:])
            for src in lhs:
                out.setdefault(src, []).extend(
                    t for t in rhs if t not in out.get(src, ())
                )
        else:
            group = _split(line)
            if len(group) < 2:
                continue
            if expand:
                for src in group:
                    out.setdefault(src, []).extend(
                        t for t in group if t not in out.get(src, ())
                    )
            else:
                first = group[0]
                for src in group:
                    if first not in out.setdefault(src, []):
                        out[src].append(first)
    return out


def parse_wordnet_synonyms(text: str, expand: bool = True
                           ) -> Dict[str, List[str]]:
    """WordNet prolog format (reference ``analysis/synonym/
    WordnetSynonymParser.java:40``): ``s(<synset-9-digits>,wordNo,
    'word',...)`` lines; consecutive lines sharing a synset id form one
    equivalence set (``''`` escapes a quote).  Returns the same rule
    dict shape as :func:`parse_solr_synonyms` (self-mappings included;
    pair with ``keep_original=False``)."""
    out: Dict[str, List[str]] = {}
    synset: List[str] = []
    last_id = ""

    def flush():
        if len(synset) <= 1:
            return
        if expand:
            for src in synset:
                out.setdefault(src, []).extend(
                    t for t in synset if t not in out.get(src, ())
                )
        else:
            first = synset[0]
            for src in synset:
                if first not in out.setdefault(src, []):
                    out[src].append(first)

    for line in text.splitlines():
        if not line.startswith("s("):
            continue
        sid = line[2:11]
        if sid != last_id:
            flush()
            synset = []
        start = line.index("'") + 1
        end = line.rindex("'")
        synset.append(line[start:end].replace("''", "'"))
        last_id = sid
    flush()
    return out


def parse_elevate_xml(text: str) -> Dict[str, Dict[str, list]]:
    """The ``elevate.xml`` config (reference ``solr/core/.../component/
    QueryElevationComponent.java`` + ``conf/elevate.xml``):
    ``<query text="..."><doc id="..." [exclude="true"]/></query>`` →
    the ``elevations`` dict :func:`~lucene_solr_ray.search.searcher
    .elevated_search` consumes (ids parsed as ints when numeric)."""
    import xml.etree.ElementTree as ET

    def _id(v: str):
        return int(v) if v.lstrip("-").isdigit() else v

    root = ET.fromstring(text)
    out: Dict[str, Dict[str, list]] = {}
    for q in root.findall("query"):
        entry = out.setdefault(q.get("text", ""),
                               {"elevate": [], "exclude": []})
        for d in q.findall("doc"):
            tgt = "exclude" if (d.get("exclude", "").lower()
                                in ("true", "1", "yes")) else "elevate"
            entry[tgt].append(_id(d.get("id")))
    return out


def parse_wordlist(text: str, snowball: bool = False) -> frozenset:
    """``WordlistLoader`` (reference ``lucene/core/.../analysis/
    WordlistLoader.java:127``): plain format = one word per line,
    ``#`` comments, trimmed; snowball format = multiple words per line,
    ``|`` starts a comment.  Feeds StopFilter / KeywordMarkerFilter /
    KeepWordFilter / compound dictionaries."""
    words = []
    for line in text.splitlines():
        if snowball:
            cut = line.find("|")
            if cut >= 0:
                line = line[:cut]
            words.extend(line.split())
        else:
            line = line.strip()
            if line and not line.startswith("#"):
                words.append(line)
    return frozenset(words)


def parse_mapping_rules(text: str):
    """The MappingCharFilter config format (reference
    ``analysis/charfilter/MappingCharFilterFactory.java:89``):
    ``"source" => "target"`` lines with ``\\"`` ``\\\\`` ``\\n`` ``\\t``
    ``\\r`` ``\\b`` ``\\f`` and ``\\uXXXX`` escapes; returns
    [(source, target), ...] for
    :class:`~lucene_solr_ray.analysis.charfilter.MappingCharFilter`."""
    import re as _re

    rule = _re.compile(r'"(.*)"\s*=>\s*"(.*)"\s*$')
    esc = {"\\": "\\", '"': '"', "n": "\n", "t": "\t", "r": "\r",
           "b": "\b", "f": "\f"}

    def unescape(s: str) -> str:
        out, i = [], 0
        while i < len(s):
            c = s[i]
            if c == "\\" and i + 1 < len(s):
                nxt = s[i + 1]
                if nxt == "u" and i + 5 < len(s):
                    out.append(chr(int(s[i + 2:i + 6], 16)))
                    i += 6
                    continue
                out.append(esc.get(nxt, nxt))
                i += 2
                continue
            out.append(c)
            i += 1
        return "".join(out)

    pairs = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = rule.match(line)
        if m:
            pairs.append((unescape(m.group(1)), unescape(m.group(2))))
    return pairs
