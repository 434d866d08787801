"""Text extraction / serialization — the byte-identity invariant.

The reference preprocesses each record into a single text string
(`/root/reference/src/datamodules/alidatamodule.py:119-134`):

1. strip attribute separators:  ``pv_pairs.replace("#;#", " ").replace("#:#", " ")``
2. null-safe space-join:        ``" ".join(str(x or "") for x in attrs)``

Step 2's semantics are subtle: any *falsy* value (None, "", 0, 0.0,
False) becomes "", but the join separator is still emitted, so doubled
and trailing spaces are preserved.  ``F.concat_ws`` SKIPS nulls and so
is NOT byte-identical — we build the join with ``concat`` +
``coalesce`` instead.  Property-tested against the pure-Python oracle
(`serialize_attrs_py`) in tests/test_text.py.

All functions here are native Column expressions (JVM codegen, no
Python on the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: literal (non-regex) attribute separators used by the reference corpus
SEPARATORS = ("#;#", "#:#")


# ----------------------------------------------------------------- python oracle
def strip_separators_py(s: str | None) -> str | None:
    """Pure-Python oracle for `strip_separators` (reference step 1)."""
    if s is None:
        return None
    for sep in SEPARATORS:
        s = s.replace(sep, " ")
    return s


def serialize_attrs_py(attrs: list) -> str:
    """Pure-Python oracle for `serialize_attrs` (reference step 2).

    Exactly ``" ".join(str(x or "") for x in attrs)``.
    """
    return " ".join(str(x or "") for x in attrs)


# ----------------------------------------------------------------- spark columns
def strip_separators(c: Column) -> Column:
    """Literal replace of '#;#' and '#:#' with ' ' (NOT regex)."""
    out = c
    for sep in SEPARATORS:
        out = F.replace(out, F.lit(sep), F.lit(" "))
    return out


def falsy_to_empty(c: Column, numeric: bool = False) -> Column:
    """``str(x or "")`` for a column: NULL -> '' (strings); for numeric
    columns 0/0.0/False also collapse to '' per Python truthiness.

    Known byte-identity caveat (numeric path only): Spark's
    cast-to-string renders doubles outside ~[1e-4, 1e16] and NaN
    differently from Python's str() ('1.0E20' vs '1e+20', 'NaN' vs
    'nan'). The reference serializes product ATTRIBUTE values (prices,
    counts — build_ali_corpus.py), which sit squarely in the common
    range where the two renderings agree; exotic magnitudes would need
    a format UDF, deliberately not paid on this hot path."""
    if numeric:
        return F.when(c.isNull() | (c == 0), F.lit("")).otherwise(c.cast("string"))
    return F.coalesce(c.cast("string"), F.lit(""))


def serialize_attrs(*cols: Column, numeric_flags: list[bool] | None = None) -> Column:
    """Byte-identical serialization: space-join with falsy->'' semantics.

    Unlike ``concat_ws`` the separator is emitted between every pair of
    fields even when a field is empty, so doubled/trailing spaces are
    preserved exactly as the reference produces them.
    """
    parts: list[Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(" "))
        num = bool(numeric_flags[i]) if numeric_flags else False
        parts.append(falsy_to_empty(c, numeric=num))
    return F.concat(*parts)


# ----------------------------------------------------------------- html -> text
#: entities produced by the fixture generator's html escaping
_HTML_UNESCAPES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def extract_text_from_html(html_bin: Column) -> Column:
    """Extract the text payload from a fixture-shaped html binary column.

    Fixture pages wrap the expected text in ``<main>...</main>`` with
    html-escaped content (FIXTURES.md §1). Extraction must reproduce the
    ``text`` column byte-identically per url. Pure native expressions:
    decode -> regexp_extract -> entity unescape (amp last, mirroring
    escape order).
    """
    s = F.decode(html_bin, "UTF-8")
    body = F.regexp_extract(s, r"(?s)<main>(.*?)</main>", 1)
    for ent, ch in _HTML_UNESCAPES:
        body = F.replace(body, F.lit(ent), F.lit(ch))
    return body


def normalize_text(c: Column) -> Column:
    """Lower + collapse runs of whitespace + trim (for fingerprints and
    blocking keys — NOT for the byte-identity path)."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
