"""Corpus-level line operations — CCNet-style boilerplate removal.

Web/doc corpora repeat whole lines across documents (navigation chrome,
cookie banners, copyright footers, license headers). The CCNet recipe
drops a line when its normalized form recurs across the corpus; what
survives is the document-specific content. This is a CORPUS-level
operator (unlike operators/text.py's per-row projections): it must see
every document's lines to know what repeats.

Beyond-reference training-data surface (no analogue in the reference's
four processors — its unit is a CSV row, never a document).

Scale shape (100 TB): posexplode is narrow (no shuffle); the frequency
pass is distinct(doc, line) + count per line — two exchanges keyed on
the normalized LINE STRING, whose cardinality the distinct pass already
collapsed (the hottest line key carries one row per *document* that has
it, pre-aggregated map-side); the anti-join shuffles on the same key (a
high ``min_docs`` makes the boilerplate side tiny — AQE turns it into a
broadcast); reassembly is one groupBy on the document id. No driver-side
data, no UDF, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import normalize_text


def split_lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (document, line) with 0-based position and the
    dedup-normalized form (lowercase, whitespace-collapsed, trimmed)."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "line"),
    ).withColumn("_norm", normalize_text(F.col("line")))


def boilerplate_lines(
    df: DataFrame, id_col: str, text_col: str, min_docs: int = 2
) -> DataFrame:
    """Normalized lines occurring in >= ``min_docs`` DISTINCT documents,
    with their document counts. Distinct-document counting (not raw
    occurrence counting) keeps a document that internally repeats its own
    line from promoting that line to boilerplate. Empty lines are never
    boilerplate (paragraph structure survives)."""
    lines = split_lines(df, id_col, text_col)
    return (
        lines.filter(F.length("_norm") > 0)
        .select(id_col, "_norm")
        .distinct()
        .groupBy("_norm")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    out_col: str = "clean_text",
) -> DataFrame:
    """Remove every line whose normalized form appears in >= ``min_docs``
    distinct documents; return one row per input document with the
    surviving lines rejoined in original order (a document whose every
    line was boilerplate survives with ``out_col = ''`` — corpus
    cardinality is preserved for downstream joins). Matching is on the
    normalized form; the ORIGINAL line text is what is kept."""
    lines = split_lines(df, id_col, text_col)
    boiler = boilerplate_lines(df, id_col, text_col, min_docs).select("_norm")
    kept = lines.join(boiler, "_norm", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias(out_col)
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .fillna({out_col: ""})
    )
