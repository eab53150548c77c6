"""ICU-role normalization filters on Python's unicodedata.

The reference's ICU module (``lucene/analysis/icu/src/java/org/apache/
lucene/analysis/icu/``) wraps ICU4J transforms.  The two high-traffic
filters re-expressed on the stdlib Unicode database:

- ``ICUNormalizer2Filter`` — Unicode normalization (NFKC by default,
  the reference's ``nfkc_cf`` normalizer adds the case fold).
- ``ICUFoldingFilter`` — the UTR#30-shaped folding pipeline: NFKC →
  case fold → strip combining marks (diacritic removal) → renormalize.
  ICU's foldings include a handful of bespoke mappings beyond this
  (e.g. дž digraph handling); the composition below covers the
  normalization/case/diacritic folds that dominate real corpora.
"""

from __future__ import annotations

import unicodedata

from lucene_solr_ray.analysis.filters import Stream, TokenFilter

__all__ = ["ICUNormalizer2Filter", "ICUFoldingFilter", "icu_fold"]


class ICUNormalizer2Filter(TokenFilter):
    """``ICUNormalizer2FilterFactory``: normalization form + optional
    case fold (the reference's default normalizer is ``nfkc_cf``)."""

    def __init__(self, form: str = "NFKC", case_fold: bool = True) -> None:
        if form not in ("NFC", "NFD", "NFKC", "NFKD"):
            raise ValueError(f"unknown normalization form {form!r}")
        self.form = form
        self.case_fold = case_fold

    def apply(self, stream: Stream) -> Stream:
        out: Stream = []
        for t, p in stream:
            t = unicodedata.normalize(self.form, t)
            if self.case_fold:
                t = unicodedata.normalize(self.form, t.casefold())
            if t:
                out.append((t, p))
        return out


def icu_fold(text: str) -> str:
    """One token through the folding pipeline."""
    t = unicodedata.normalize("NFKC", text).casefold()
    t = "".join(
        ch for ch in unicodedata.normalize("NFD", t)
        if unicodedata.category(ch) != "Mn"
    )
    return unicodedata.normalize("NFC", t)


class ICUFoldingFilter(TokenFilter):
    """``ICUFoldingFilterFactory``: NFKC + case fold + diacritic strip."""

    def apply(self, stream: Stream) -> Stream:
        out: Stream = []
        for t, p in stream:
            f = icu_fold(t)
            if f:
                out.append((f, p))
        return out
