"""Template render — the MergeTemplate analogue, as pure expressions.

The reference renders an Apache Velocity template from the (regex-filtered)
attribute map and replaces flow-file content with the result (reference:
MergeTemplate.java:216-291; placeholder forms ``$name`` / ``${name}``,
README.md:49-66; attribute regex filter :149-155,243-257; value
line-separator scrub :253).

Spark-native: the template is parsed ONCE driver-side into literal/column
segments, and the render is a single ``concat`` projection — JVM-side,
whole-stage codegen, no UDF, no per-row template engine. (The reference
also parses the template once per schedule, MergeTemplate.java:167-191 —
same idea, but its merge still walks the context per row.)
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .split import scrub_line_separators

# $name or ${name} — Velocity's simple-reference forms
_PLACEHOLDER = re.compile(r"\$\{(\w+)\}|\$(\w+)")


def parse_template(template: str) -> list[str | tuple[str]]:
    """Split a template into literal strings and (column_name,) refs."""
    out: list[str | tuple[str]] = []
    pos = 0
    for m in _PLACEHOLDER.finditer(template):
        if m.start() > pos:
            out.append(template[pos : m.start()])
        out.append((m.group(1) or m.group(2),))
        pos = m.end()
    if pos < len(template):
        out.append(template[pos:])
    return out


def render_template(
    df: DataFrame,
    template: str,
    out_col: str = "content",
    attribute_filter: str | None = None,
    null_as: str = "",
) -> DataFrame:
    """Render ``template`` per row into ``out_col``.

    ``attribute_filter`` mirrors the reference's regex project: only
    matching columns may be referenced; a reference to a filtered-out or
    missing column renders as the literal placeholder (Velocity's default
    for unresolved references). Values are scrubbed of line separators
    (MergeTemplate.java:253) and nulls render as ``null_as``.
    """
    allowed = set(df.columns)
    if attribute_filter is not None:
        rx = re.compile(attribute_filter)
        allowed = {c for c in allowed if rx.match(c)}
    parts: list[Column] = []
    for seg in parse_template(template):
        if isinstance(seg, str):
            parts.append(F.lit(seg))
        else:
            (name,) = seg
            if name in allowed:
                parts.append(
                    F.coalesce(
                        scrub_line_separators(F.col(name).cast("string")), F.lit(null_as)
                    )
                )
            else:
                parts.append(F.lit(f"${name}"))
    return df.withColumn(out_col, F.concat(*parts) if parts else F.lit(""))


def render_json(df: DataFrame, fields: list[str], out_col: str = "content") -> DataFrame:
    """Structured shortcut for JSON targets: ``to_json(struct(...))`` —
    use this instead of a JSON-shaped text template when the output must
    be valid JSON (proper escaping)."""
    return df.withColumn(out_col, F.to_json(F.struct(*[F.col(c) for c in fields])))
