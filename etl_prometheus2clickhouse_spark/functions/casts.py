"""Lenient Float64 cast — the Spark equivalent of Python ``float(str)``.

The reference parses sample values with Python's ``float()`` and treats
``"NaN"``/``"Inf"``/``"-Inf"`` as *valid data*, while unparseable strings
are skipped and counted (reference: etl_job.py:664-717; corpus pinned at
tests/test_etl_job.py:1449-1827, tests/test_etl_job_full_coverage.py:21-62).

A plain Spark ``try_cast(... AS DOUBLE)`` is NOT equivalent:

- it accepts only ``Infinity`` spellings, not Prometheus' ``Inf``;
- Java's ``Double.parseDouble`` underneath accepts hex floats
  (``0x1p3``) and type-suffixed literals (``1.5f``) that Python —
  and therefore the reference — rejects;
- Python accepts digit-group underscores (``1_000.5``).

So the recipe is: trim (the exact Py_UNICODE_ISSPACE set float()
strips) → special spellings (nan/inf/infinity, signed,
case-insensitive) → strict decimal-literal regex gate (with underscore
normalization) → ``cast``. All built-in expressions, fully
whole-stage-codegen'd; no UDF.

Remaining documented divergence: CPython float() also accepts
*unicode digits* ("١٢٣"); this recipe accepts ASCII digits only —
Prometheus wire data is ASCII, and silently normalizing unicode
numerals in an analytics engine is a misfeature, not parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Python float() literal grammar (after stripping whitespace and digit
# underscores): optional sign, digits with optional decimal point (at least
# one digit somewhere), optional exponent.
PY_FLOAT_REGEX = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"

# Digit-group underscores are legal in Python numeric literals only
# *between* digits: "1_000.5" parses, "_1"/"1_"/"1__0" do not.
_UNDERSCORE_BETWEEN_DIGITS = r"(?<=\d)_(?=\d)"
_ANY_UNDERSCORE = "_"

# CPython float() strips Py_UNICODE_ISSPACE characters — a superset of
# Java regex \s ([ \t\n\x0B\f\r]): NEL
# \x85, NBSP \xa0, and the Unicode space separators (empirically,
# CPython float() does NOT strip the C0 separators \x1c-\x1f even
# though str.isspace() is true for them — verified exhaustively over
# the BMP against float() itself; see the property test). Spelled as a
# literal character class so the JVM trim matches float() exactly
# (reference parser etl_job.py:664-717 inherits float()'s behavior).
_PY_SPACE_CLASS = (
    "[\t\n\x0b\x0c\r \x85\xa0 "
    " -     　]"
)


def lenient_double(col: Column | str) -> Column:
    """Parse a string column exactly like Python ``float()``.

    Returns DOUBLE; NULL when unparseable (callers distinguish "skipped"
    from structurally-missing via the pre-parse null mask — see
    operators/transform.py). NaN and ±Infinity come back as real DOUBLE
    specials, matching the reference's preserve-NaN/Inf contract
    (etl_job.py:664-683).
    """
    c = F.col(col) if isinstance(col, str) else col
    # Python float() strips *all* surrounding whitespace ("1\n", "\t2",
    # "\xa01" parse); F.trim strips only ASCII spaces and \s misses the
    # unicode spaces, so strip the exact Py_UNICODE_ISSPACE class.
    trimmed = F.regexp_replace(
        c, f"^{_PY_SPACE_CLASS}+|{_PY_SPACE_CLASS}+$", ""
    )
    lowered = F.lower(trimmed)
    # Normalize digit-group underscores, then reject any remaining ones.
    de_underscored = F.regexp_replace(trimmed, _UNDERSCORE_BETWEEN_DIGITS, "")
    is_numeric_literal = de_underscored.rlike(PY_FLOAT_REGEX) & ~de_underscored.contains(
        _ANY_UNDERSCORE
    )
    return (
        F.when(lowered.isin("nan", "+nan", "-nan"), F.lit(float("nan")))
        .when(
            lowered.isin("inf", "+inf", "infinity", "+infinity"),
            F.lit(float("inf")),
        )
        .when(lowered.isin("-inf", "-infinity"), F.lit(float("-inf")))
        .when(is_numeric_literal, de_underscored.cast("double"))
        .otherwise(F.lit(None).cast("double"))
    )
