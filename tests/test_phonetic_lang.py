"""Phonetic encoders + language-specific filters vs published vectors.

Soundex vectors are the NARA examples (the reference PhoneticFilterFactory
delegates to commons-codec, whose tests carry the same set); Caverphone
2.0 vectors are from Hood's 2004 paper; Cologne vectors are Postel's
classic examples; stemmer fixtures trace the reference rule files.
"""

from __future__ import annotations

import pytest

from lucene_solr_ray.analysis.phonetic import (PhoneticFilter, caverphone2,
                                               cologne_phonetic, metaphone,
                                               nysiis, refined_soundex,
                                               soundex)


@pytest.mark.parametrize("name,code", [
    ("Robert", "R163"), ("Rupert", "R163"),
    ("Ashcraft", "A261"), ("Ashcroft", "A261"),   # the H/W rule
    ("Tymczak", "T522"), ("Pfister", "P236"),
    ("Washington", "W252"), ("Lee", "L000"),
    ("Gutierrez", "G362"), ("Jackson", "J250"),
])
def test_soundex_nara_vectors(name, code):
    assert soundex(name) == code


def test_refined_soundex():
    assert refined_soundex("testing") == "T6036084"
    assert refined_soundex("TESTING") == "T6036084"
    assert refined_soundex("The") == "T60"
    assert refined_soundex("quick") == "Q503"
    assert refined_soundex("") == ""


@pytest.mark.parametrize("word,code", [
    ("testing", "TSTN"), ("The", "0"), ("quick", "KK"),
    ("brown", "BRN"), ("fox", "FKS"), ("jumped", "JMPT"),
    ("over", "OFR"), ("lazy", "LS"), ("dogs", "TKS"),
    ("phone", "FN"), ("howl", "HL"), ("shoe", "X"),
    ("knight", "NT"), ("school", "SKL"), ("thompson", "0MPS"),
])
def test_metaphone_vectors(word, code):
    assert metaphone(word) == code


def test_caverphone2_published_vectors():
    # Hood (2004), Caverphone revisited
    assert caverphone2("Peter") == "PTA1111111"
    assert caverphone2("Stevenson") == "STFNSN1111"
    assert caverphone2("Thompson") == "TMPSN11111"
    # 10-char padding and case-insensitivity
    assert caverphone2("lee") == caverphone2("LEE")
    assert len(caverphone2("x")) == 10


def test_nysiis():
    assert nysiis("MACINTOSH") == "MCANT"
    assert nysiis("KNIGHT") == "NAGT"
    assert nysiis("PHILLIPS") == nysiis("FILLIPS")
    assert nysiis("") == ""


def test_cologne_phonetic():
    # Postel's canonical examples
    assert cologne_phonetic("Müller-Lüdenscheidt") == "65752682"
    assert cologne_phonetic("Breschnew") == "17863"
    assert cologne_phonetic("Wikipedia") == "3412"
    # same-sounding names converge
    assert cologne_phonetic("Meyer") == cologne_phonetic("Maier")


def test_phonetic_filter_inject_and_replace():
    stream = [("robert", 0), ("smith", 1)]
    inj = PhoneticFilter("Soundex", inject=True).apply(stream)
    assert inj == [("robert", 0), ("R163", 0), ("smith", 1), ("S530", 1)]
    rep = PhoneticFilter("Metaphone", inject=False).apply(stream)
    assert rep == [("RBRT", 0), ("SM0", 1)]


# -- language filters --------------------------------------------------------

def _one(filt, term):
    out = filt.apply([(term, 0)])
    return out[0][0] if out else None


def test_german_light_stemmer():
    from lucene_solr_ray.analysis.lang import GermanLightStemFilter

    f = GermanLightStemFilter()
    # häuser: umlaut fold + -er clip
    assert _one(f, "häuser") == "haus"
    assert _one(f, "häusern") == "haus"
    assert _one(f, "bücher") == "buch"
    # both plural forms of 'haus' converge
    assert _one(f, "haus") == _one(f, "häuser")


def test_spanish_light_stemmer():
    from lucene_solr_ray.analysis.lang import SpanishLightStemFilter

    f = SpanishLightStemFilter()
    assert _one(f, "casa") == "casa"          # < 5 chars: untouched
    assert _one(f, "casas") == "cas"
    assert _one(f, "libro") == "libr"
    assert _one(f, "libros") == "libr"
    assert _one(f, "veces") == "vez"          # -ces → -z
    assert _one(f, "intereses") == "interes"  # -eses → -es


def test_french_minimal_stemmer():
    from lucene_solr_ray.analysis.lang import FrenchMinimalStemFilter

    f = FrenchMinimalStemFilter()
    assert _one(f, "chevaux") == "cheval"     # -aux → -al
    assert _one(f, "chien") == "chien"        # < 6 chars
    assert _one(f, "baronnes") == "baron"     # -s, -e, double-letter
    assert _one(f, "chanter") == "chant"


def test_russian_light_stemmer():
    from lucene_solr_ray.analysis.lang import RussianLightStemFilter

    f = RussianLightStemFilter()
    # both case forms of 'journal' converge
    assert _one(f, "журналами") == _one(f, "журналы")
    assert _one(f, "журналами") == "журнал"


def test_arabic_persian_normalizers():
    from lucene_solr_ray.analysis.lang import (ArabicNormalizationFilter,
                                               PersianNormalizationFilter)

    ar = ArabicNormalizationFilter()
    # alef-hamza variants fold to bare alef; harakat stripped
    assert _one(ar, "أحمَد") == \
        "احمد"
    # teh marbuta → heh, tatweel removed
    assert _one(ar, "مـة") == "مه"
    fa = PersianNormalizationFilter()
    assert _one(fa, "یک") == "يك"


def test_greek_lowercase():
    from lucene_solr_ray.analysis.lang import GreekLowerCaseFilter

    f = GreekLowerCaseFilter()
    # final sigma standardizes; tonos strips
    assert _one(f, "ΜΆΘΗΜΑΣ") == "μαθημασ".replace("σ", "σ")
    assert _one(f, "σοφός") == "σοφοσ"
    assert _one(f, "ΣΟΦΌΣ") == "σοφοσ"


def test_scandinavian_folding():
    from lucene_solr_ray.analysis.lang import ScandinavianFoldingFilter

    f = ScandinavianFoldingFilter()
    assert _one(f, "räksmörgås") == "raksmorgas"
    assert _one(f, "bøen") == "boen"
    assert _one(f, "aalborg") == "alborg"     # aa collapses
    assert _one(f, "blåbærsyltetøj") == "blabarsyltetoj"


def test_elision():
    from lucene_solr_ray.analysis.lang import ElisionFilter

    f = ElisionFilter()
    assert _one(f, "l'avion") == "avion"
    assert _one(f, "d'avion") == "avion"
    assert _one(f, "qu'il") == "il"
    assert _one(f, "jusqu'à") == "à"
    assert _one(f, "l’avion") == "avion"      # curly apostrophe
    assert _one(f, "avion") == "avion"        # no apostrophe
    assert _one(f, "xyz'abc") == "xyz'abc"    # not an article


def test_filters_compose_in_custom_analyzer():
    from lucene_solr_ray.analysis.filters import (CustomAnalyzer,
                                                  LowerCaseFilter)
    from lucene_solr_ray.analysis.lang import (ElisionFilter,
                                               FrenchMinimalStemFilter)

    a = CustomAnalyzer([ElisionFilter(), LowerCaseFilter(),
                        FrenchMinimalStemFilter()])
    assert a.analyze("L'avion des chevaux") == ["avion", "des", "cheval"]


def test_german_normalization_filter():
    """de/GermanNormalizationFilter.java:41 — the 3-state FSM."""
    from lucene_solr_ray.analysis.lang import GermanNormalizationFilter

    f = GermanNormalizationFilter()
    vectors = {
        "schön": "schon", "grüße": "grusse", "häufig": "haufig",
        # ae/oe → a/o
        "schoen": "schon", "aepfel": "apfel",
        # ue → u only when not after vowel/q
        "mueller": "muller", "bauer": "bauer", "quelle": "quelle",
        "neue": "neue", "weißbier": "weissbier",
    }
    assert f.apply([(w, i) for i, w in enumerate(vectors)]) == [
        (v, i) for i, v in enumerate(vectors.values())]


def test_serbian_normalization_filter():
    """sr/SerbianNormalizationFilter.java:37 — Cyrillic + Latin to bald
    Latin, đ → dj."""
    from lucene_solr_ray.analysis.lang import SerbianNormalizationFilter

    f = SerbianNormalizationFilter()
    assert f._map("ђаче") == "djace"
    assert f._map("đurđevdan") == "djurdjevdan"
    assert f._map("чевапчићи") == "cevapcici"
    assert f._map("škola") == "skola"
    assert f._map("љубљана") == "ljubljana"
    assert f._map("њива") == "njiva"
    assert f._map("џеп") == "dzep"
    assert f._map("beograd") == "beograd"
