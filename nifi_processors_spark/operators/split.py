"""Delimited-row split -> typed columns (the SplitToAttribute analogue).

The reference splits a CSV flow-file row on a separator and stores each
field as attribute ``<prefix><DecimalFormat(i)>`` (reference:
SplitToAttribute.java:144-210; naming :191; DecimalFormat :150-155).

Spark-native version: one ``select`` over ``split()`` — a narrow,
codegen-fused projection. Two entry points:

  * ``split_positional`` — the literal reference behavior: positional
    column names ``f"{prefix}{i:0{width}d}"``.
  * ``split_named`` — the ExecuteRuleEngine 'Field Names' mode
    (ExecuteRuleEngine.java:197-202): a configured name list, optionally
    typed via a DDL-ish mapping.

Intentional divergences (SURVEY.md §2.2 P1, kept as *fixes*): the
separator is a literal string (the reference passes it to String.split,
i.e. a regex, usually by accident), and empty fields become empty
strings/nulls instead of being silently skipped (the reference gaps the
positions: SplitToAttribute.java:184).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# literal separator -> escaped regex for split()
_REGEX_META = set("\\^$.|?*+()[]{}")


def _escape(sep: str) -> str:
    return "".join(f"\\{ch}" if ch in _REGEX_META else ch for ch in sep)


def scrub_line_separators(c: Column) -> Column:
    """The reference strips line separators from every value
    (SplitToAttribute.java:188, MergeTemplate.java:253)."""
    return F.regexp_replace(c, r"\r?\n", "")


def split_positional(
    df: DataFrame,
    content_col: str,
    separator: str,
    n_fields: int,
    prefix: str = "column_",
    width: int = 3,
    keep: bool = False,
) -> DataFrame:
    """content -> prefix000..prefixNNN string columns (reference naming:
    prefix + DecimalFormat, default width 3)."""
    parts = F.split(scrub_line_separators(F.col(content_col)), _escape(separator))
    # try_element_at: a short row (fewer fields than n_fields) yields null
    # columns instead of an ANSI out-of-bounds job failure
    cols = [
        F.try_element_at(parts, F.lit(i + 1)).alias(f"{prefix}{i:0{width}d}")
        for i in range(n_fields)
    ]
    base = [F.col(c) for c in df.columns] if keep else []
    return df.select(*base, *cols)


def split_named(
    df: DataFrame,
    content_col: str,
    separator: str,
    field_names: list[str],
    field_types: dict[str, str] | None = None,
    keep: bool = False,
) -> DataFrame:
    """content -> named (optionally typed) columns — the 'Field Names'
    header mode. Types are applied with explicit cast (invalid -> null,
    never a job failure)."""
    field_types = field_types or {}
    parts = F.split(scrub_line_separators(F.col(content_col)), _escape(separator))
    cols = []
    for i, name in enumerate(field_names):
        c = F.try_element_at(parts, F.lit(i + 1))
        if name in field_types:
            c = c.cast(field_types[name])
        cols.append(c.alias(name))
    base = [F.col(c) for c in df.columns] if keep else []
    return df.select(*base, *cols)


def join_row(df: DataFrame, field_names: list[str], separator: str, out_col: str = "content") -> DataFrame:
    """Inverse: re-serialize fields with the original separator — the
    reference's action-modified row rewrite (ExecuteRuleEngine.java:975-992)."""
    return df.withColumn(
        out_col,
        F.concat_ws(separator, *[F.coalesce(F.col(n).cast("string"), F.lit("")) for n in field_names]),
    )
