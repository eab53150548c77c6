"""Tokenizer factories (reference ``analysis/core/*Tokenizer.java``,
``path/PathHierarchyTokenizer.java``, ``pattern/PatternTokenizer.java``,
``ngram/{NGram,EdgeNGram}Tokenizer.java``)."""

import pytest

from lucene_solr_ray.analysis.filters import (
    CustomAnalyzer,
    LowerCaseFilter,
    StopFilter,
)
from lucene_solr_ray.analysis.tokenizers import (
    EdgeNGramTokenizer,
    KeywordTokenizer,
    LetterTokenizer,
    LowerCaseTokenizer,
    NGramTokenizer,
    PathHierarchyTokenizer,
    PatternTokenizer,
    WhitespaceTokenizer,
)


def _terms(tok, text, max_len=255):
    return [t for t, _, _, _ in tok.run(text, max_len)]


def test_whitespace_tokenizer():
    assert _terms(WhitespaceTokenizer(), "foo bar\t baz\n") == [
        "foo", "bar", "baz"]
    # Java Character.isWhitespace: NBSP is NOT whitespace
    assert _terms(WhitespaceTokenizer(), "a\u00a0b c") == ["a\u00a0b", "c"]
    # punctuation stays inside tokens
    assert _terms(WhitespaceTokenizer(), "a-b c.d") == ["a-b", "c.d"]
    # CharTokenizer chunking at maxTokenLen
    assert _terms(WhitespaceTokenizer(), "abcdefgh", max_len=3) == [
        "abc", "def", "gh"]
    quads = WhitespaceTokenizer().run("hi there", 255)
    assert quads == [("hi", 0, 0, 2), ("there", 1, 3, 8)]


def test_letter_and_lowercase_tokenizers():
    assert _terms(LetterTokenizer(), "ab3cd ef-gh") == [
        "ab", "cd", "ef", "gh"]
    assert _terms(LetterTokenizer(), "Héllo Wörld!") == ["Héllo", "Wörld"]
    assert _terms(LowerCaseTokenizer(), "Héllo Wörld!") == ["héllo", "wörld"]
    # digits and underscore are not letters
    assert _terms(LetterTokenizer(), "x_1y") == ["x", "y"]


def test_keyword_tokenizer():
    assert KeywordTokenizer().run("Hello, World", 255) == [
        ("Hello, World", 0, 0, 12)]
    assert KeywordTokenizer().run("", 255) == []


def test_path_hierarchy_tokenizer():
    tok = PathHierarchyTokenizer()
    quads = tok.run("/a/b/c", 255)
    assert [(t, p, s, e) for t, p, s, e in quads] == [
        ("/a", 0, 0, 2), ("/a/b", 0, 0, 4), ("/a/b/c", 0, 0, 6)]
    # no leading delimiter
    assert _terms(tok, "a/b/c") == ["a", "a/b", "a/b/c"]
    # replacement (the windows-path fixture from the reference tests)
    win = PathHierarchyTokenizer(delimiter="\\", replacement="/")
    assert _terms(win, "c:\\a\\b") == ["c:", "c:/a", "c:/a/b"]
    # skip drops leading parts
    assert _terms(PathHierarchyTokenizer(skip=1), "/a/b/c") == [
        "/a/b", "/a/b/c"]
    # reverse = ReversePathHierarchyTokenizer: suffix paths
    rev = PathHierarchyTokenizer(delimiter=".", reverse=True)
    assert _terms(rev, "www.site.co.uk") == [
        "www.site.co.uk", "site.co.uk", "co.uk", "uk"]
    assert _terms(PathHierarchyTokenizer(delimiter=".", reverse=True,
                                         skip=1), "www.site.co.uk") == [
        "www.site.co.uk", "site.co.uk", "co.uk"]


def test_pattern_tokenizer():
    # group=-1: split
    assert _terms(PatternTokenizer(r",\s*"), "a, b,c") == ["a", "b", "c"]
    # group=0: whole-match emission
    assert _terms(PatternTokenizer(r"[A-Z][a-z]+", group=0),
                  "Foo barBaz Qux") == ["Foo", "Baz", "Qux"]
    # group=1: capture
    assert _terms(PatternTokenizer(r"'([^']+)'", group=1),
                  "say 'hi' and 'bye'") == ["hi", "bye"]
    # offsets point at the group
    q = PatternTokenizer(r"'([^']+)'", group=1).run("'ab'", 255)
    assert q == [("ab", 0, 1, 3)]


def test_ngram_tokenizers():
    assert _terms(NGramTokenizer(1, 2), "abcde") == [
        "a", "ab", "b", "bc", "c", "cd", "d", "de", "e"]
    assert _terms(NGramTokenizer(2, 3), "abcd") == [
        "ab", "abc", "bc", "bcd", "cd"]
    assert _terms(NGramTokenizer(3, 3), "ab") == []
    assert _terms(EdgeNGramTokenizer(1, 3), "abcde") == ["a", "ab", "abc"]
    assert _terms(EdgeNGramTokenizer(2, 9), "abc") == ["ab", "abc"]
    with pytest.raises(ValueError):
        NGramTokenizer(3, 2)


def test_custom_analyzer_tokenizer_slot():
    a = CustomAnalyzer(tokenizer=WhitespaceTokenizer(),
                       filters=[LowerCaseFilter(), StopFilter({"the"})])
    assert a.analyze("The Quick-Brown FOX") == ["quick-brown", "fox"]
    terms, positions, n = a.analyze_with_positions("The Quick FOX")
    assert terms == ["quick", "fox"]
    assert positions == [1, 2] and n == 2  # stop gap preserved
    # offsets flow through the factory's spans
    t, p, s, e, n = a.analyze_with_offsets("A Big Dog")
    assert t == ["a", "big", "dog"]
    assert list(zip(s, e)) == [(0, 1), (2, 5), (6, 9)]
    # keyword tokenizer keeps the whole string as one term
    k = CustomAnalyzer(tokenizer=KeywordTokenizer(),
                       filters=[LowerCaseFilter()])
    assert k.analyze("Hello, World") == ["hello, world"]
    # stacked-position tokenizers refuse the offsets path
    ph = CustomAnalyzer(tokenizer=PathHierarchyTokenizer())
    assert ph.analyze("/a/b") == ["/a", "/a/b"]
    with pytest.raises(NotImplementedError):
        ph.analyze_with_offsets("/a/b")


def test_classic_tokenizer_vectors():
    from lucene_solr_ray.analysis.tokenizers import ClassicTokenizer

    t = ClassicTokenizer()

    def terms_types(s):
        return [(x[0], x[4]) for x in t.run_with_types(s, 255)]

    assert terms_types("O'Reilly's book") == [
        ("O'Reilly's", "<APOSTROPHE>"), ("book", "<ALPHANUM>")]
    # ACRONYM keeps its dots; ACRONYM_DEP → HOST minus the trailing dot
    assert terms_types("U.S.A. and I.B.M.8. deal") == [
        ("U.S.A.", "<ACRONYM>"), ("and", "<ALPHANUM>"),
        ("I.B.M.8", "<HOST>"), ("deal", "<ALPHANUM>")]
    assert terms_types("AT&T excite@home.com") == [
        ("AT&T", "<COMPANY>"), ("excite@home.com", "<EMAIL>")]
    assert terms_types("3.14 1-a-2 1,000") == [
        ("3.14", "<HOST>"), ("1-a-2", "<NUM>"), ("1,000", "<NUM>")]
    # CJ chars tokenize one-by-one; Korean stays ALPHANUM
    assert terms_types("東京 한글") == [
        ("東", "<CJ>"), ("京", "<CJ>"), ("한글", "<ALPHANUM>")]
    # over-long tokens are skipped with a position gap, not chunked
    quads = ClassicTokenizer().run("x" * 300 + " ok", 255)
    assert [(q[0], q[1]) for q in quads] == [("ok", 1)]


def test_classic_tokenizer_fuzz_vs_reference_dfa():
    """Fuzz-compare (term, start, end, type) against the reference
    ClassicTokenizerImpl DFA replayed from its packed jflex tables
    (tools/ref_dfa.RefClassicTokenizer, the same dev-only-oracle pattern
    the UAX#29 tokenizer was verified with)."""
    import random
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.ref_dfa import RefClassicTokenizer

    from lucene_solr_ray.analysis.tokenizers import ClassicTokenizer

    ref = RefClassicTokenizer()
    mine = ClassicTokenizer()
    alphabet = (
        "abcXYZ012.,-_/'&@  .."
        "éßαд"      # Unicode 1.x letters (inside the frozen ref tables)
        "ไ๑"        # Thai letter + digit (explicit THAI class)
        "東京ドあ"   # CJ
        "한"         # Korean: [:letter:], NOT CJ
        "\t$%(){}"
    )
    rng = random.Random(421)
    checked = 0
    for _ in range(2500):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 40)))
        want = ref.tokenize_with_types(s, 255)
        got = [(t, st, e, ty)
               for t, _, st, e, ty in mine.run_with_types(s, 255)]
        assert got == want, (s, got, want)
        checked += 1
    assert checked == 2500
