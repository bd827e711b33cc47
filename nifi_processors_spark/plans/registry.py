"""Schema registry + drift detection for the change-payload.

The reference's schema is a header row or a configured field-name list,
re-read per flow file (reference: ExecuteRuleEngine.java:417-435,197-202)
— dynamic, stringly-typed, no evolution story. The target handles
mid-stream payload drift (FIXTURES.md §3: v1 {lang, content} ->
v2 {language, content, size_bytes}) with an explicit registry:

  * detect the payload schema of an epoch from a driver-side sample,
  * diff against the registered schema,
  * classify drift into RENAME (same type, one-for-one swap, or an
    explicit hint) vs ADD,
  * record a new registry version; the caller issues icelite ALTER
    (rename keeps field id, add backfills null) then merges.

Registry state is a JSON file (atomic replace), versions append-only:
``{"versions": [{"version", "from_epoch", "fields": [{name, type}],
"renames": {old: new}}]}``.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_JSON_TYPE = {str: "string", bool: "boolean", int: "long", float: "double"}
_SPARK_TYPE = {
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
}


def detect_payload_schema(epoch_df: DataFrame, sample: int = 50) -> list[tuple[str, str]]:
    """Sample payload_json rows driver-side; union their fields.

    Field order: first-seen order (JSON key order of the producer), which
    keeps rename detection stable. Types from JSON scalars; nested values
    fall back to string (kept as raw JSON).
    """
    rows = (
        epoch_df.select("payload_json")
        .filter("payload_json is not null")
        .limit(sample)
        .collect()
    )
    fields: dict[str, str] = {}
    for r in rows:
        try:
            obj = json.loads(r["payload_json"])
        except (json.JSONDecodeError, TypeError):
            continue
        if not isinstance(obj, dict):
            continue
        for k, v in obj.items():
            t = _JSON_TYPE.get(type(v), "string")
            if k not in fields or (fields[k] == "long" and t == "double"):
                fields[k] = t
    return list(fields.items())


def to_struct(fields: list[tuple[str, str]]) -> T.StructType:
    return T.StructType([T.StructField(n, _SPARK_TYPE[t], True) for n, t in fields])


def diff_schemas(
    old: list[tuple[str, str]],
    new: list[tuple[str, str]],
    rename_hints: dict[str, str] | None = None,
) -> tuple[dict[str, str], list[tuple[str, str]]]:
    """Return (renames {old_name: new_name}, adds [(name, type)]).

    Detection: explicit hints first; then each removed field whose type
    matches *exactly one* added field is treated as a rename (the common
    ALTER RENAME case — e.g. v1 {lang} -> v2 {language, size_bytes}
    renames lang->language because language is the only added string).
    Ambiguous cases (two same-typed candidates) fall back to ADD; removed
    fields without a partner are left in place (tolerant reader — older
    columns simply stop receiving values).
    """
    rename_hints = rename_hints or {}
    old_names = {n for n, _ in old}
    new_names = {n for n, _ in new}
    old_types = dict(old)
    new_types = dict(new)

    renames: dict[str, str] = {}
    removed = sorted(old_names - new_names)
    added = [n for n, _ in new if n not in old_names]  # keep producer order

    for new_name, old_name in rename_hints.items():
        if old_name in removed and new_name in added:
            renames[old_name] = new_name
            removed.remove(old_name)
            added.remove(new_name)
    for old_name in list(removed):
        candidates = [n for n in added if new_types[n] == old_types[old_name]]
        if len(candidates) == 1:
            renames[old_name] = candidates[0]
            removed.remove(old_name)
            added.remove(candidates[0])
    adds = [(n, new_types[n]) for n in added]
    return renames, adds


class SchemaRegistry:
    def __init__(self, path: str, rename_hints: dict[str, str] | None = None):
        self.path = path
        self.rename_hints = rename_hints or {}

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {"versions": []}
        with open(self.path) as f:
            return json.load(f)

    def _save(self, obj: dict) -> None:
        tmp = f"{self.path}.tmp.{uuid.uuid4().hex[:8]}"
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, self.path)

    def current(self) -> dict | None:
        vs = self._load()["versions"]
        return vs[-1] if vs else None

    def register(self, fields: list[tuple[str, str]], from_epoch: int) -> dict:
        """Register the initial schema (version 1)."""
        obj = self._load()
        ver = {
            "version": len(obj["versions"]) + 1,
            "from_epoch": from_epoch,
            "fields": [{"name": n, "type": t} for n, t in fields],
            "renames": {},
        }
        obj["versions"].append(ver)
        self._save(obj)
        return ver

    def observe(self, fields: list[tuple[str, str]], epoch: int) -> tuple[dict, dict[str, str], list[tuple[str, str]]]:
        """Compare an epoch's payload schema with the registered one.

        Returns (current_version, renames, adds); registers a new version
        when drift is found. No drift -> ([], []).
        """
        cur = self.current()
        if cur is None:
            return self.register(fields, epoch), {}, []
        old = [(f["name"], f["type"]) for f in cur["fields"]]
        renames, adds = diff_schemas(old, fields, self.rename_hints)
        if not renames and not adds:
            return cur, {}, []
        merged: list[dict] = []
        for f in cur["fields"]:
            nm = renames.get(f["name"], f["name"])
            merged.append({"name": nm, "type": f["type"]})
        for n, t in adds:
            merged.append({"name": n, "type": t})
        obj = self._load()
        ver = {
            "version": cur["version"] + 1,
            "from_epoch": epoch,
            "fields": merged,
            "renames": renames,
        }
        obj["versions"].append(ver)
        self._save(obj)
        return ver, renames, adds
