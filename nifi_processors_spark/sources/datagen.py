"""Generic deterministic table generator — full GenerateData parity.

The reference's GenerateData processor builds synthetic CSV rows from an
XML row layout whose fields are one of three kinds (reference:
GenerateData.java:66-246, docs/com.datamelt.nifi.processors.GenerateData/
additionalDetails.html):

  * **category** — value drawn from a word list ("one of the words")
  * **regular expression** — value generated to match a pattern
  * **random** — random string of bounded length
  plus **date/time** fields bounded by min/max year (GenerateData.java:118-132)

This module re-expresses that layout as a list of field specs compiled to
pure seeded expressions over ``spark.range(n)`` — reproducible at any
parallelism (the reference's output is non-deterministic; determinism here
is required by FIXTURES.md).

Regex support is the practically-useful subset: literals, ``[a-z]``/
``[A-Z]``/``[0-9]`` classes and ``\\d``/``\\w``, each with an optional
``{n}`` repeat — compiled to hash-indexed character lookups.

Example layout::

    [{"name": "id", "kind": "sequence"},
     {"name": "lang", "kind": "category", "values": ["py", "go", "rs"]},
     {"name": "sku", "kind": "regex", "pattern": "[A-Z]{3}-[0-9]{4}"},
     {"name": "token", "kind": "random", "min_len": 8, "max_len": 20},
     {"name": "born", "kind": "date", "min_year": 2000, "max_year": 2099}]
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_CLASSES = {
    "a-z": "abcdefghijklmnopqrstuvwxyz",
    "A-Z": "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
    "0-9": "0123456789",
}

_TOKEN_RE = re.compile(r"\[(a-z|A-Z|0-9)\](\{(\d+)\})?|\\([dw])(\{(\d+)\})?|(.)")


def _h(seed: int, tag: str, eid: Column, i: int = 0) -> Column:
    return F.conv(
        F.substring(
            F.sha2(F.concat_ws(":", F.lit(str(seed)), F.lit(tag), eid.cast("string"), F.lit(str(i))), 256),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")


def _pick_char(alphabet: str, h: Column) -> Column:
    arr = F.array(*[F.lit(ch) for ch in alphabet])
    return F.element_at(arr, (h % len(alphabet) + 1).cast("int"))


def compile_regex_field(pattern: str, seed: int, tag: str, eid: Column) -> Column:
    """Compile the supported regex subset into a concat of char lookups."""
    parts: list[Column] = []
    pos = 0
    for i, m in enumerate(_TOKEN_RE.finditer(pattern)):
        cls, _, rep1, esc, _, rep2, lit_ch = m.groups()
        if lit_ch is not None:
            parts.append(F.lit(lit_ch))
            continue
        if cls is not None:
            alphabet, reps = _CLASSES[cls], int(rep1 or 1)
        else:  # escape class
            alphabet = _CLASSES["0-9"] if esc == "d" else (
                _CLASSES["a-z"] + _CLASSES["A-Z"] + _CLASSES["0-9"] + "_"
            )
            reps = int(rep2 or 1)
        for r in range(reps):
            parts.append(_pick_char(alphabet, _h(seed, f"{tag}:rx{i}:{r}", eid, pos)))
            pos += 1
    return F.concat(*parts) if parts else F.lit("")


def compile_field(spec: dict, seed: int, eid: Column) -> Column:
    kind = spec["kind"]
    name = spec["name"]
    if kind == "sequence":
        return eid
    if kind == "category":
        values = spec["values"]
        arr = F.array(*[F.lit(v) for v in values])
        return F.element_at(arr, (_h(seed, f"cat:{name}", eid) % len(values) + 1).cast("int"))
    if kind == "regex":
        return compile_regex_field(spec["pattern"], seed, f"re:{name}", eid)
    if kind == "random":
        lo, hi = spec.get("min_len", 8), spec.get("max_len", 24)
        n_blocks = hi // 64 + 1
        full = F.concat(*[
            F.sha2(F.concat_ws(":", F.lit(str(seed)), F.lit(f"rnd:{name}:{b}"), eid.cast("string")), 256)
            for b in range(n_blocks)
        ])
        length = (_h(seed, f"rndlen:{name}", eid) % (hi - lo + 1) + lo).cast("int")
        return F.substring(full, 1, 64 * n_blocks).substr(F.lit(1), length)
    if kind == "date":
        lo, hi = spec.get("min_year", 2000), spec.get("max_year", 2099)
        year = (_h(seed, f"dy:{name}", eid) % (hi - lo + 1) + lo).cast("int")
        month = (_h(seed, f"dm:{name}", eid) % 12 + 1).cast("int")
        day = (_h(seed, f"dd:{name}", eid) % 28 + 1).cast("int")
        return F.make_date(year, month, day)
    if kind == "int":
        lo, hi = spec.get("min", 0), spec.get("max", 1_000_000)
        return (_h(seed, f"int:{name}", eid) % (hi - lo + 1) + lo).cast("long")
    if kind == "double":
        lo, hi = spec.get("min", 0.0), spec.get("max", 1.0)
        frac = (_h(seed, f"dbl:{name}", eid) % 10**9).cast("double") / F.lit(10**9)
        return F.round(frac * (hi - lo) + lo, spec.get("decimals", 6))
    raise ValueError(f"unknown field kind {kind!r}")


def generate_table(spark: SparkSession, n_rows: int, layout: list[dict], seed: int = 42) -> DataFrame:
    """N rows with one column per layout field — a single narrow stage."""
    df = spark.range(n_rows)
    eid = F.col("id")
    return df.select(*[compile_field(s, seed, eid).alias(s["name"]) for s in layout])


def rows_to_csv(df: DataFrame, field_names: list[str], separator: str = ";") -> DataFrame:
    """The reference emits CSV text rows (content), not typed columns —
    provided for byte-level parity testing (GenerateData.java:197-216)."""
    return df.select(
        F.concat_ws(separator, *[F.col(c).cast("string") for c in field_names]).alias("content")
    )
