"""XML config loaders — ingest the reference's ACTUAL config artifacts.

The reference keeps business logic outside the pipeline in two XML
formats, both of which this module parses into the engine's native spec
dicts so "change the rules without changing the flow" (reference:
README.md:79-81) holds against the reference's own shipped files:

  * **JaRE rule project zip** — `ExecuteRuleEngine` loads a zip of group
    XMLs at schedule time (reference: ExecuteRuleEngine.java:330-336;
    shipped demo: nifi_test2_dev.zip -> 'Group 1.xml': one group, one
    OR-subgroup, four CheckIsEqual rules on feature_code).
    -> ``load_rule_project(zip_path)`` / ``parse_rule_group_xml(text)``
    produce the spec dict that ``operators.rules.evaluate`` compiles.

  * **rowlayout.xml** — `GenerateData` configures the external
    datagenerator with a row-layout XML plus a folder of ``.category``
    word-list files (reference: GenerateData.java:157-177, README.md:86,
    docs/...GenerateData/additionalDetails.html). The exact DTD lives in
    the (unshipped) datagenerator jar; this parser accepts the documented
    field surface — category / regex / random / date fields.
    -> ``parse_rowlayout(path, categories_dir)`` produces the layout list
    that ``sources.datagen.generate_table`` compiles.

Message placeholder mapping: JaRE's demo messages use $0 = expected
value, $1 = actual field value ('Field [feature_code] $1 incorrectly not
is equal to $0', Group 1.xml); the engine's renderer uses $0 = actual,
$1 = expected (operators/rules.py:_render_msg) — the loader swaps them.
"""

from __future__ import annotations

import os
import re
import zipfile
import xml.etree.ElementTree as ET
from typing import Any

# JaRE check-class surface (com.datamelt.rules.implementation.*, evidenced
# by Group 1.xml + the JaRE import list at ExecuteRuleEngine.java:63-67)
# -> engine predicate ops (operators/rules.py:_OPS)
_CHECK_OPS = {
    "CheckIsEqual": "eq",
    "CheckIsNotEqual": "ne",
    "CheckContains": "contains",
    "CheckNotContains": "not_contains",
    "CheckIsNull": "is_null",
    "CheckIsNotNull": "not_null",
    "CheckIsEmpty": "is_empty",
    "CheckStartsWith": "starts_with",
    "CheckEndsWith": "ends_with",
    "CheckMatchesRegularExpression": "matches",
    "CheckMatchesRegex": "matches",
    "CheckIsGreater": "gt",
    "CheckIsGreaterOrEqual": "ge",
    "CheckIsLess": "lt",
    "CheckIsLessOrEqual": "le",
    "CheckIsBetween": "between",
    "CheckIsInList": "in",
    "CheckIsIn": "in",
}

# JaRE operand types -> Spark cast targets (string = no cast)
_TYPE_MAP = {
    "string": "string",
    "integer": "long",
    "long": "long",
    "int": "long",
    "double": "double",
    "float": "double",
    "boolean": "boolean",
    "date": "date",
}


def _coerce(value: str | None, jare_type: str) -> Any:
    if value is None:
        return None
    t = _TYPE_MAP.get(jare_type, "string")
    if t == "long":
        return int(value)
    if t == "double":
        return float(value)
    if t == "boolean":
        return value.strip().lower() in ("true", "1", "yes")
    return value


def _swap_placeholders(text: str) -> str:
    """JaRE $0 (expected) / $1 (actual) -> engine $1 / $0."""
    return re.sub(r"\$([01])", lambda m: "$1" if m.group(1) == "0" else "$0", text)


def _parse_action(a: "ET.Element") -> dict[str, Any]:
    """One JaRE <action> -> an ``apply_actions`` spec. Supported: the
    set-value family (method/classname mentioning setValue, or no method at
    all with an explicit value) targeting a field named by <object
    parameter=...> (or a ``field`` attr), value from <parameter value
    type>/<expected value type>/``value`` attr, fired per ``executeif``
    (passed|failed|always, JaRE default: failed). Everything else raises."""
    method = (a.get("method") or "").strip()
    cls = (a.get("classname") or a.get("class") or "").strip()
    blob = f"{cls}.{method}".lower()
    if method or cls:
        if "setvalue" not in blob and "setfieldvalue" not in blob:
            raise ValueError(
                f"unsupported JaRE action {a.get('id')!r}: only set-value "
                f"actions are mapped (got classname={cls!r} method={method!r})"
            )
    obj = a.find("object")
    field = (obj.get("parameter") if obj is not None else None) or a.get("field")
    if not field:
        raise ValueError(
            f"JaRE action {a.get('id')!r}: no target field "
            "(<object parameter=...> or field= attr)"
        )
    param = a.find("parameter") if a.find("parameter") is not None else a.find("expected")
    if param is not None:
        value = _coerce(param.get("value"), (param.get("type") or "string").lower())
    elif a.get("value") is not None:
        value = a.get("value")
    else:
        raise ValueError(f"JaRE action {a.get('id')!r}: no value to set")
    when = (a.get("executeif") or a.get("execute") or "failed").strip().lower()
    if when not in ("passed", "failed", "always"):
        raise ValueError(f"JaRE action {a.get('id')!r}: executeif={when!r}")
    out: dict[str, Any] = {"field": field, "set_value": value, "when": when}
    if a.get("id"):
        out["id"] = a.get("id")
    return out


def parse_rule_group_xml(text: str) -> dict[str, Any]:
    """One JaRE group XML -> one engine group spec dict.

    Handles the shipped shape (Group 1.xml): <group> attrs id /
    dependentgroupid / dependentgroupexecuteif, <subgroup> attrs id /
    ruleoperator / intergroupoperator, and per <rule>: <object
    parameter=field type=...>, <expected value type>, <execute
    value=check-class>, <message type=passed|failed text>. Group-level
    <action> elements (set-value family) map to ``apply_actions`` specs;
    unsupported actions raise instead of silently dropping mutations.
    """
    root = ET.fromstring(text)
    g = root if root.tag == "group" else root.find(".//group")
    if g is None:
        raise ValueError("no <group> element found")

    group: dict[str, Any] = {"id": g.get("id"), "subgroups": []}
    dep = (g.get("dependentgroupid") or "").strip()
    if dep:
        execute_if = (g.get("dependentgroupexecuteif") or "passed").strip().lower()
        group["depends_on"] = {"group": dep, "passed": execute_if != "failed"}

    # JaRE rule ACTIONS (field mutation on group pass/fail — reference:
    # ExecuteRuleEngine.java:489-510 runs them via the engine's
    # getRuleExecutionCollection; the shipped demo zip contains none).
    # The common set-value action maps onto operators.rules.apply_actions
    # specs; anything else raises — a rule project whose mutations we
    # cannot honor must fail LOUDLY at load time, not silently skip them.
    actions = [_parse_action(a) for a in g.findall("action")]
    if actions:
        group["actions"] = actions
    stray = [a for sg_el in g.findall("subgroup") for a in sg_el.iter("action")]
    if stray:
        raise ValueError(
            "unsupported <action> placement: JaRE actions attach to the "
            "<group> (execute on group result), not inside <subgroup>"
        )

    for sg in g.findall("subgroup"):
        sub: dict[str, Any] = {
            "id": sg.get("id"),
            "rule_op": (sg.get("ruleoperator") or "and").strip().lower(),
            "inter_op": (sg.get("intergroupoperator") or "and").strip().lower(),
            "rules": [],
        }
        for r in sg.findall("rule"):
            obj = r.find("object")
            expected = r.find("expected")
            execute = r.find("execute")
            if obj is None or execute is None:
                raise ValueError(f"rule {r.get('id')!r}: missing <object> or <execute>")
            check_cls = execute.get("value", "").rsplit(".", 1)[-1]
            if check_cls not in _CHECK_OPS:
                raise ValueError(f"unsupported JaRE check class {check_cls!r}")
            op = _CHECK_OPS[check_cls]
            jare_type = (obj.get("type") or "string").lower()
            value = _coerce(expected.get("value") if expected is not None else None, jare_type)
            if op == "between" and isinstance(value, str):
                lo, hi = value.split(",", 1)
                value = [_coerce(lo.strip(), jare_type), _coerce(hi.strip(), jare_type)]
            elif op == "in" and isinstance(value, str):
                value = [v.strip() for v in value.split(",")]
            rule: dict[str, Any] = {
                "id": r.get("id"),
                "field": obj.get("parameter"),
                "op": op,
                "value": value,
            }
            cast = _TYPE_MAP.get(jare_type, "string")
            if cast != "string":
                rule["type"] = cast
            for msg in r.findall("message"):
                key = "message_passed" if msg.get("type") == "passed" else "message_failed"
                rule[key] = _swap_placeholders(msg.get("text", ""))
            sub["rules"].append(rule)
        group["subgroups"].append(sub)
    return group


def load_rule_project(zip_path: str) -> dict[str, Any]:
    """JaRE rule-project zip -> full engine spec ({'groups': [...]}),
    groups in zip-entry order (the reference parses the whole zip once per
    schedule, ExecuteRuleEngine.java:330-336)."""
    groups = []
    with zipfile.ZipFile(zip_path) as z:
        for name in z.namelist():
            if name.lower().endswith(".xml"):
                groups.append(parse_rule_group_xml(z.read(name).decode("utf-8")))
    if not groups:
        raise ValueError(f"no group XMLs in {zip_path!r}")
    return {"groups": groups}


# ---------------- rowlayout.xml (GenerateData) ----------------


def _read_category(categories_dir: str, category: str) -> list[str]:
    """A '<name>.category' word-list file: one word per line
    (docs/...GenerateData/additionalDetails.html)."""
    p = os.path.join(categories_dir, f"{category}.category")
    with open(p) as f:
        return [line.strip() for line in f if line.strip()]


def parse_rowlayout(
    path: str,
    categories_dir: str | None = None,
    min_year: int = 2000,
    max_year: int = 2099,
) -> list[dict[str, Any]]:
    """rowlayout.xml -> datagen layout list (sources/datagen.py).

    Field elements carry type=category|regex|random|date(time) plus
    type-specific attrs; category word lists load from ``categories_dir``
    (the processor's 'categories folder' property, GenerateData.java:86-98).
    min/max year mirror the processor-level date-bound properties
    (GenerateData.java:118-132).
    """
    root = ET.parse(path).getroot()
    fields = root.findall(".//field")
    if not fields:
        raise ValueError(f"no <field> elements in {path!r}")
    layout: list[dict[str, Any]] = []
    for i, f in enumerate(fields):
        name = f.get("name") or f.get("id") or f"field_{i:03d}"
        ftype = (f.get("type") or "random").lower()
        if ftype == "category":
            cat = f.get("category")
            if categories_dir is None or cat is None:
                raise ValueError(f"field {name!r}: category fields need a categories folder")
            layout.append({"name": name, "kind": "category", "values": _read_category(categories_dir, cat)})
        elif ftype in ("regex", "regularexpression"):
            layout.append({"name": name, "kind": "regex", "pattern": f.get("pattern", "")})
        elif ftype == "random":
            if f.get("length") is not None:
                lo = hi = int(f.get("length"))
            else:
                lo = int(f.get("minlength", 8))
                hi = int(f.get("maxlength", 24))
            layout.append({"name": name, "kind": "random", "min_len": lo, "max_len": hi})
        elif ftype in ("date", "datetime"):
            layout.append({
                "name": name, "kind": "date",
                "min_year": int(f.get("minyear", min_year)),
                "max_year": int(f.get("maxyear", max_year)),
            })
        else:
            raise ValueError(f"field {name!r}: unsupported rowlayout type {ftype!r}")
    return layout
