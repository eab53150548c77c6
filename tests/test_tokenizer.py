"""StandardTokenizer conformance: golden cases + fuzz vs the reference DFA.

The oracle (``tools/ref_dfa.py``) replays the generated JFlex tables of the
reference ``StandardTokenizerImpl.java`` with the StandardTokenizer
buffer-window (maxTokenLength) semantics.
"""

import random

import pytest

from lucene_solr_ray.analysis.tokenizer import tokenize, tokenize_with_offsets

GOLDEN = [
    ("foo bar baz", ["foo", "bar", "baz"]),
    ("fooBar camelCase", ["fooBar", "camelCase"]),
    ("foo.bar(baz)", ["foo.bar", "baz"]),
    ("3.14 0xFF 1,000 1_2.3", ["3.14", "0xFF", "1,000", "1_2.3"]),
    ("don't a:b std::foo", ["don't", "a:b", "std", "foo"]),
    ("foo_bar __init__ a__b", ["foo_bar", "__init__", "a__b"]),
    ("a.b.c a..b end.", ["a.b.c", "a", "b", "end"]),
    ("", []),
    ("   \t\n", []),
    ("self.value += 1", ["self.value", "1"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_golden(text, expected):
    assert tokenize(text) == expected


def test_overlong_token_window_split():
    # a 300-char run is emitted as longest-match windows, not dropped
    toks = tokenize("x" * 300)
    assert toks == ["x" * 255, "x" * 45]
    assert tokenize("x" * 255) == ["x" * 255]


def test_offsets():
    got = tokenize_with_offsets("ab cd.ef")
    assert got == [("ab", 0, 2), ("cd.ef", 3, 8)]


@pytest.fixture(scope="module")
def ref():
    from ref_dfa import RefTokenizer

    return RefTokenizer()


@pytest.mark.parametrize(
    "seed,alphabet",
    [
        (1, "abcXYZ019._',;- \t\n()[]{}<>:/\\\"#@!$%^&*+=|~`?"),
        (7, "abcXYZ019._', éüñ中文のカタ"
            "カナ한국어 דָוִa­"
            "‍"),
        (9, "ד'\"ו_9a ­‍ִ"),
    ],
)
def test_fuzz_vs_reference_dfa(ref, seed, alphabet):
    random.seed(seed)
    for _ in range(600):
        s = "".join(
            random.choice(alphabet) for _ in range(random.randint(0, 80))
        )
        assert tokenize(s) == ref.tokenize(s), repr(s)


def test_window_vs_reference_dfa(ref):
    for s in [
        "x" * 300,
        ("ab." * 120) + "cd",
        "_" * 300 + "abc",
        ("9," * 200) + "9",
        "_" * 255,
        "." * 300,
    ]:
        assert tokenize(s) == ref.tokenize(s)
