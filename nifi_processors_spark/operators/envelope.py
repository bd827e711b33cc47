"""Change-envelope parsing: payload_json -> typed struct columns.

The reference's SplitToAttribute turns an untyped CSV row into a bag of
stringly-typed attributes (reference: SplitToAttribute.java:144-210). The
Spark-native re-expression parses the JSON change payload into *typed
columns* with ``from_json`` against an explicit schema — corrupt payloads
yield a null struct and are routed to quarantine instead of aborting the
epoch (the reference's per-row failure relationship,
ExecuteRuleEngine.java:477-481,610-662, becomes a filter).

Intentional divergences from the reference's SplitToAttribute quirks
(documented in SURVEY.md §2.2 P1): separator-as-regex and silent
empty-field skipping are NOT replicated; nulls are kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAYLOAD_V1 = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

PAYLOAD_V2 = T.StructType(
    [
        T.StructField("language", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)


CORRUPT_COL = "_corrupt_record"


def parse_envelope(changes: DataFrame, payload_schema: T.StructType) -> DataFrame:
    """Parse payload_json into typed columns per ``payload_schema``.

    Output: envelope columns + one column per payload field + ``_corrupt``
    flag. Spark's PERMISSIVE from_json returns a null-FIELD struct (not a
    null struct) for malformed input, so corruption is detected the
    canonical way: a ``columnNameOfCorruptRecord`` field that is non-null
    exactly when the parse failed. Delete events carry a null payload and
    are not corrupt.
    """
    schema_with_cr = T.StructType(
        payload_schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = changes.withColumn(
        "_payload",
        F.from_json(
            F.col("payload_json"),
            schema_with_cr,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )
    corrupt = F.col("payload_json").isNotNull() & (
        F.col("_payload").isNull() | F.col(f"_payload.{CORRUPT_COL}").isNotNull()
    )
    out = parsed.withColumn("_corrupt", corrupt)
    for f in payload_schema.fields:
        out = out.withColumn(f.name, F.col(f"_payload.{f.name}"))
    return out.drop("_payload", "payload_json")


def malformed_json(payload_json):
    """Cheap schema-free corrupt check: a non-null payload that is not a
    parseable JSON OBJECT. One variant parse per row — used by the stats
    job so the epoch's payloads are parsed once there (the variant agg
    shares the parse), not twice (from_json + variant)."""
    head = F.substring(F.ltrim(payload_json), 1, 1)
    return payload_json.isNotNull() & (
        (head != "{") | F.try_parse_json(payload_json).isNull()
    )


def corrupt_flag(payload_json, payload_schema: T.StructType):
    """Boolean Column: true when payload_json is non-null but unparseable
    (for quarantining raw rows without going through parse_envelope)."""
    schema_with_cr = T.StructType(
        payload_schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    p = F.from_json(
        payload_json, schema_with_cr, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    )
    return payload_json.isNotNull() & (p.isNull() | p[CORRUPT_COL].isNotNull())


def quarantine_split(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) — the reference's 'failure' relationship."""
    return (
        parsed.filter(~F.col("_corrupt")).drop("_corrupt"),
        parsed.filter(F.col("_corrupt")).drop("_corrupt"),
    )
