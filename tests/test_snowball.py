"""Snowball English (Porter2) stemmer.

Reference: the public Snowball "english" script (generated form:
``org/tartarus/snowball/ext/EnglishStemmer.java``) via
``SnowballFilter.java:52``.  Vectors derived from the published
algorithm's rules (exceptional forms, special-R1 prefixes, step-wise
suffix tables) — each asserts one rule family.
"""

import pytest

from lucene_solr_ray.analysis.snowball import SnowballFilter, porter2_stem

VECTORS = {
    # exceptional forms (table a_10 / a_9 in the generated reference)
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl", "sky": "sky",
    "news": "news", "atlas": "atlas", "bias": "bias", "andes": "andes",
    "inning": "inning", "outing": "outing", "canning": "canning",
    "herring": "herring", "proceed": "proceed", "exceed": "exceed",
    "succeed": "succeed",
    # step 0 + 1a
    "it's": "it", "caresses": "caress", "ties": "tie", "cries": "cri",
    "gas": "gas", "gaps": "gap", "kiwis": "kiwi", "fuss": "fuss",
    # step 1b: eed in R1, doubles undoubled, short-word e-restore
    "agreed": "agre", "knitting": "knit", "hopping": "hop",
    "hoping": "hope", "hopped": "hop", "falling": "fall",
    "sing": "sing",
    # step 1c
    "cry": "cri", "by": "by", "say": "say", "happy": "happi",
    # steps 2-4
    "national": "nation", "rational": "ration",
    "conditional": "condit", "relational": "relat",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formality": "formal",
    "formalize": "formal", "electricity": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "activate": "activ",
    "angularity": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler",
    "generously": "generous",
    # special-R1 prefixes prevent over-stemming
    "generate": "generat", "communism": "communism",
    "communication": "communic",
    "conspicuous": "conspicu",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


@pytest.mark.parametrize("word,want", sorted(VECTORS.items()))
def test_porter2_vectors(word, want):
    assert porter2_stem(word) == want


def test_porter2_differs_from_porter1_where_it_should():
    from lucene_solr_ray.analysis.en import porter_stem

    # the valid-li rule and exceptional forms are Porter2-only
    assert porter2_stem("dying") == "die"
    assert porter_stem("dying") != "die"


def test_snowball_filter_in_chain():
    from lucene_solr_ray.analysis.filters import (
        CustomAnalyzer,
        LowerCaseFilter,
    )

    ana = CustomAnalyzer(filters=[LowerCaseFilter(), SnowballFilter()])
    assert ana.analyze("National KNITTING hopes") == [
        "nation", "knit", "hope"
    ]
    with pytest.raises(NotImplementedError):
        SnowballFilter(language="Finnish")


GERMAN_VECTORS = {
    # step 1: er/ern/em, e/en/es, valid-s-ending s
    "kinder": "kind", "bücher": "buch", "büchern": "buch",
    "aufgabe": "aufgab", "schönen": "schon", "abends": "abend",
    "aufeinander": "aufeinand", "kategorie": "kategori",
    # s after an INVALID s-ending survives
    "verständnis": "verstandnis",
    # the niss rule after an e/en/es deletion
    "verhältnisse": "verhaltnis", "bedürfnissen": "bedurfnis",
    # u/y between vowels marked consonant (drives R1)
    "treue": "treu", "bauen": "bau",
    # R1 adjusted to >= 3 letters
    "mädchen": "madch",
    # step 3: ung/heit/keit/ig with R2 + e-guards
    "zufriedenheit": "zufried", "ungeduldig": "ungeduld",
    "häufig": "haufig", "billig": "billig", "feinheit": "feinheit",
    "königin": "konigin",
    # ß → ss and umlaut folding
    "straße": "strass", "größe": "gross",
}


@pytest.mark.parametrize("word,want", sorted(GERMAN_VECTORS.items()))
def test_german_stem(word, want):
    from lucene_solr_ray.analysis.snowball import german_stem

    assert german_stem(word) == want


def test_snowball_filter_german():
    f = SnowballFilter("German")
    assert f.apply([("kinder", 0), ("bauen", 1)]) == [
        ("kind", 0), ("bau", 1)]
    with pytest.raises(NotImplementedError):
        SnowballFilter("Klingon")
