"""Hunspell affix engine + ICU folding + dictionary Viterbi segmenter
(reference ``lucene/analysis/common/.../hunspell/``, ``analysis/icu/``,
``analysis/kuromoji`` lattice shape).  The Hunspell dictionary below is
hand-written test data exercising SFX/PFX strip/affix/condition and
cross-product."""

from lucene_solr_ray.analysis.dictseg import ViterbiSegmenter
from lucene_solr_ray.analysis.hunspell import (
    HunspellDictionary,
    HunspellStemFilter,
)
from lucene_solr_ray.analysis.icu import (
    ICUFoldingFilter,
    ICUNormalizer2Filter,
    icu_fold,
)

AFF = """
# test affix grammar
SET UTF-8
FLAG UTF-8

SFX S Y 2
SFX S 0 s [^sxz]
SFX S 0 es [sxz]

SFX D Y 3
SFX D 0 d e
SFX D y ied [^aeiou]y
SFX D 0 ed [^ey]

PFX R Y 1
PFX R 0 re .

PFX U N 1
PFX U 0 un .
"""

DIC = """7
walk/SDR
box/S
carry/D
move/D
happy/U
cat/S
run
"""


def _dic():
    return HunspellDictionary(AFF, DIC)


def test_hunspell_parse():
    d = _dic()
    assert d.words["walk"] == frozenset("SDR")
    assert d.words["run"] == frozenset()
    assert len(d.sfx["S"]) == 2 and len(d.pfx["R"]) == 1


def test_hunspell_suffix_rules():
    d = _dic()
    assert d.stem("walks") == ["walk"]
    assert d.stem("boxes") == ["box"]      # [sxz] condition → es
    assert d.stem("boxs") == []            # condition rejects plain s
    assert d.stem("carried") == ["carry"]  # strip y, affix ied
    assert d.stem("walked") == ["walk"]
    assert d.stem("moved") == ["move"]     # 0/d rule on e-final stem
    assert d.stem("cats") == ["cat"]
    assert d.stem("runs") == []            # run lacks the S flag


def test_hunspell_prefix_and_cross_product():
    d = _dic()
    assert d.stem("rewalk") == ["walk"]
    # cross-product: prefix R (cross=Y) + suffix S (cross=Y)
    assert d.stem("rewalks") == ["walk"]
    # un has cross=N → no un+suffix derivation, but plain prefix works
    assert d.stem("unhappy") == ["happy"]
    assert d.stem("unhappys") == []


def test_hunspell_case_fallback_and_exact():
    d = _dic()
    assert d.stem("Walks") == ["walk"]
    assert d.stem("run") == ["run"]  # direct lookup


def test_hunspell_stem_filter():
    d = _dic()
    f = HunspellStemFilter(d)
    stream = [("walks", 0), ("quickly", 1), ("rewalks", 2)]
    out = f.apply(stream)
    # no-stem token passes through; stems replace at same position
    assert out == [("walk", 0), ("quickly", 1), ("walk", 2)]
    fl = HunspellStemFilter(d, longest_only=True)
    assert fl.apply([("carried", 5)]) == [("carry", 5)]


def test_icu_folding():
    f = ICUFoldingFilter()
    out = f.apply([("Ｈｅｌｌｏ", 0), ("Café", 1), ("STRASSE", 2)])
    assert out[0][0] == "hello"       # fullwidth → ascii + case fold
    assert out[1][0] == "cafe"        # diacritic stripped
    assert out[2][0] == "strasse"
    assert icu_fold("ＡＢＣ ǅungla Ångström") == "abc dzungla angstrom"
    n = ICUNormalizer2Filter()
    assert n.apply([("ﬁne", 0)]) == [("fine", 0)]  # NFKC ligature
    n2 = ICUNormalizer2Filter(case_fold=False)
    assert n2.apply([("Ｈi", 0)]) == [("Hi", 0)]


def test_viterbi_segmenter():
    lex = {
        "東京": 1.0, "東京都": 1.5, "都": 2.0, "京都": 1.0,
        "に": 0.5, "住む": 1.0,
    }
    seg = ViterbiSegmenter(lex, unk_cost=10.0)
    # 東京都: 東京都(1.5) beats 東京+都(3.0) and 東+京都(11.0)
    assert [w for w, _ in seg.segment("東京都")] == ["東京都"]
    toks = seg.segment("東京都に住む")
    assert [w for w, _ in toks] == ["東京都", "に", "住む"]
    assert [s for _, s in toks] == [0, 3, 4]
    # unknown chars fall back to single-char tokens
    assert [w for w, _ in seg.segment("X東京Y")] == ["X", "東京", "Y"]
    # ordinal positions for analyzer chains
    assert seg.tokens("東京都に住む") == [
        ("東京都", 0), ("に", 1), ("住む", 2)
    ]
    # ambiguity resolved by cost: 京都 cheaper than 京+都
    lex2 = {"京": 1.0, "都": 1.0, "京都": 1.5}
    seg2 = ViterbiSegmenter(lex2)
    assert [w for w, _ in seg2.segment("京都")] == ["京都"]  # tie → longer


def test_viterbi_fuzz_reconstruction():
    """Property: concatenated tokens always reconstruct the input, char
    starts are consistent, and total cost is <= the all-unknown cost."""
    import numpy as np

    rng = np.random.default_rng(41)
    lex = {"ab": 1.0, "abc": 1.4, "bc": 1.1, "cab": 0.9, "a": 3.0,
           "b": 3.0, "c": 3.0}
    seg = ViterbiSegmenter(lex, unk_cost=8.0)
    alphabet = list("abcxyz")
    for _ in range(300):
        n = int(rng.integers(0, 18))
        text = "".join(rng.choice(alphabet) for _ in range(n))
        toks = seg.segment(text)
        assert "".join(w for w, _ in toks) == text
        pos = 0
        cost = 0.0
        for w, s in toks:
            assert s == pos
            pos += len(w)
            cost += lex.get(w, 8.0)
        assert cost <= 8.0 * len(text) + 1e-9


def test_hunspell_stem_never_invents_words():
    """Property: every stem returned is an actual dictionary word."""
    import numpy as np

    d = HunspellDictionary(AFF, DIC)
    rng = np.random.default_rng(43)
    pieces = ["walk", "box", "carry", "run", "re", "un", "s", "es", "ed",
              "ied", "d", "happy", "cat", "xyz"]
    for _ in range(400):
        w = "".join(rng.choice(pieces, size=rng.integers(1, 4)))
        for s in d.stem(w):
            assert s in d.words
