"""Update-request-processor chain: per-field mutators before indexing.

The Solr URP factories re-expressed as composable vectorized
``map_batches`` stages (reference
``solr/core/src/java/org/apache/solr/update/processor/`` — ~60 factories;
implemented here: 20 of the text/value mutators a corpus-prep pipeline
uses):

=============================  ==========================================
reference factory               here
=============================  ==========================================
TrimFieldUpdateProcessor        :func:`trim_field`
RegexReplaceProcessorFactory    :func:`regex_replace`
ConcatFieldUpdateProcessor      :func:`concat_fields`
ParseDateFieldUpdateProcessor   :func:`parse_date`
ParseIntFieldUpdateProcessor/   :func:`parse_number`
ParseDoubleField...
DefaultValueUpdateProcessor     :func:`default_value`
UUIDUpdateProcessorFactory      :func:`uuid_field` (deterministic: content
                                hash, so reruns are idempotent)
HTMLStripFieldUpdateProcessor   :func:`html_strip`
FieldLengthUpdateProcessor      :func:`field_length`
CloneFieldUpdateProcessor       :func:`clone_field`
TruncateFieldUpdateProcessor    :func:`truncate_field`
=============================  ==========================================

``chain(ds, [stage, ...])`` applies them in order — the URP chain.  Each
stage compiles its pattern ONCE at construction; the returned closures are
pure batch transforms (stateless Ray tasks).
"""

from __future__ import annotations

import hashlib
import re
from typing import Callable, List, Optional

import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "chain",
    "trim_field",
    "regex_replace",
    "concat_fields",
    "parse_date",
    "parse_number",
    "default_value",
    "uuid_field",
    "html_strip",
    "field_length",
    "clone_field",
    "truncate_field",
    "ignore_field",
    "remove_blank",
    "lowercase_field",
    "uppercase_field",
    "timestamp_field",
    "count_values",
    "min_value",
    "max_value",
    "dedupe_values",
]

Stage = Callable[[pa.Table], pa.Table]


def chain(ds, stages: List[Stage]):
    """Apply a URP chain; one fused map_batches per pipeline."""

    def _apply(t: pa.Table) -> pa.Table:
        for s in stages:
            t = s(t)
        return t

    return ds.map_batches(_apply, batch_format="pyarrow")


def _set(t: pa.Table, col: str, arr) -> pa.Table:
    if col in t.column_names:
        return t.set_column(t.schema.get_field_index(col), col, arr)
    return t.append_column(col, arr)


def trim_field(col: str) -> Stage:
    def s(t: pa.Table) -> pa.Table:
        return _set(t, col, pc.utf8_trim_whitespace(t.column(col)))

    return s


def regex_replace(col: str, pattern: str, replacement: str) -> Stage:
    def s(t: pa.Table) -> pa.Table:
        return _set(
            t, col,
            pc.replace_substring_regex(
                t.column(col), pattern=pattern, replacement=replacement
            ),
        )

    return s


def concat_fields(out: str, cols: List[str], sep: str = " ") -> Stage:
    def s(t: pa.Table) -> pa.Table:
        arr = pc.binary_join_element_wise(
            *[t.column(c) for c in cols], sep
        )
        return _set(t, out, arr)

    return s


def parse_date(col: str, out: Optional[str] = None) -> Stage:
    def s(t: pa.Table) -> pa.Table:
        arr = pc.strptime(t.column(col), format="%Y-%m-%d", unit="us")
        return _set(t, out or col, arr)

    return s


def parse_number(col: str, out: Optional[str] = None,
                 type_: pa.DataType = None) -> Stage:
    ty = type_ or pa.float64()

    def s(t: pa.Table) -> pa.Table:
        return _set(t, out or col, pc.cast(t.column(col), ty))

    return s


def default_value(col: str, value) -> Stage:
    def s(t: pa.Table) -> pa.Table:
        c = t.column(col)
        return _set(t, col, pc.fill_null(c, value))

    return s


def uuid_field(out: str, from_cols: List[str]) -> Stage:
    """Deterministic doc id from content (idempotent across reruns —
    unlike random UUIDs, safe for resumable builds)."""

    def s(t: pa.Table) -> pa.Table:
        cols = [t.column(c).to_pylist() for c in from_cols]
        ids = [
            hashlib.sha1("|".join(str(v) for v in row).encode()).hexdigest()
            for row in zip(*cols)
        ]
        return _set(t, out, pa.array(ids, pa.string()))

    return s


_TAG_RE = r"<[^>]*>"


def html_strip(col: str) -> Stage:
    def s(t: pa.Table) -> pa.Table:
        return _set(
            t, col,
            pc.replace_substring_regex(
                t.column(col), pattern=_TAG_RE, replacement=""
            ),
        )

    return s


def field_length(col: str, out: str) -> Stage:
    def s(t: pa.Table) -> pa.Table:
        return _set(t, out, pc.utf8_length(t.column(col)))

    return s


def clone_field(src: str, dst: str) -> Stage:
    def s(t: pa.Table) -> pa.Table:
        return _set(t, dst, t.column(src))

    return s


def truncate_field(col: str, max_len: int) -> Stage:
    def s(t: pa.Table) -> pa.Table:
        return _set(t, col, pc.utf8_slice_codeunits(t.column(col), 0, max_len))

    return s


def ignore_field(col: str) -> Stage:
    """``IgnoreFieldUpdateProcessorFactory`` — drop the column."""
    def s(t: pa.Table) -> pa.Table:
        if col in t.column_names:
            return t.drop([col])
        return t
    return s


def remove_blank(col: str) -> Stage:
    """``RemoveBlankFieldUpdateProcessorFactory`` — empty string → null."""
    def s(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = t.column(col)
        blank = pc.equal(c, "")
        return _set(t, col, pc.if_else(blank, pa.nulls(len(t), c.type), c))
    return s


def lowercase_field(col: str) -> Stage:
    """``FieldMutating`` lowercase (Solr lowercase processor)."""
    def s(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return _set(t, col, pc.utf8_lower(t.column(col)))
    return s


def uppercase_field(col: str) -> Stage:
    def s(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return _set(t, col, pc.utf8_upper(t.column(col)))
    return s


def timestamp_field(out: str, value: str) -> Stage:
    """``TimestampUpdateProcessorFactory`` — a fixed ingest timestamp
    column (the caller supplies the commit time so reruns stay
    deterministic/resumable)."""
    import numpy as np

    ts = np.datetime64(value, "us")

    def s(t: pa.Table) -> pa.Table:
        return _set(
            t, out,
            pa.array([ts] * t.num_rows, pa.timestamp("us")),
        )
    return s


def count_values(col: str, out: str, sep: str = " ") -> Stage:
    """``CountFieldValuesUpdateProcessorFactory`` over a delimited field."""
    def s(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = pc.split_pattern(t.column(col), sep)
        return _set(t, out, pc.list_value_length(parts))
    return s


def min_value(cols: List[str], out: str) -> Stage:
    """``MinFieldValueUpdateProcessorFactory`` across columns."""
    def s(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        acc = t.column(cols[0])
        for c in cols[1:]:
            acc = pc.min_element_wise(acc, t.column(c))
        return _set(t, out, acc)
    return s


def max_value(cols: List[str], out: str) -> Stage:
    """``MaxFieldValueUpdateProcessorFactory`` across columns."""
    def s(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        acc = t.column(cols[0])
        for c in cols[1:]:
            acc = pc.max_element_wise(acc, t.column(c))
        return _set(t, out, acc)
    return s


def dedupe_values(col: str, sep: str = " ") -> Stage:
    """``UniqFieldsUpdateProcessorFactory`` — first-occurrence dedupe of a
    delimited field's values."""
    def s(t: pa.Table) -> pa.Table:
        vals = []
        for v in t.column(col).to_pylist():
            if v is None:
                vals.append(None)
                continue
            seen = dict.fromkeys(v.split(sep))
            vals.append(sep.join(seen))
        return _set(t, col, pa.array(vals, pa.string()))
    return s
