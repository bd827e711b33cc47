"""Declarative rule engine — the ExecuteRuleEngine analogue, fully vectorized.

The reference runs the external JaRE engine per row (reference:
ExecuteRuleEngine.java:462 `ruleEngine.run("flowfile", rowFieldCollection)`),
producing per-row pass/fail counters (:1002-1028), optional field-mutating
actions (:489-510), per-rule detail rows (:878-963) filtered by a 7-valued
output type (:161-167, 906-912), and routing (RouteOnAttribute on
`ruleengine.rulegroupsFailed`, ExecuteRuleEngine_Example.xml:21-22).

Here a JSON rule spec compiles to pyspark Column boolean trees — one
expression per rule, folded per subgroup (`ruleoperator` and/or) and per
group (`intergroupoperator` chaining, Group 1.xml:1) — so the whole rule
run is a single whole-stage-codegen'd projection: no UDF, no per-row
Python, no rule-engine object. Business logic still lives *outside* the
pipeline code (the reference's stated design goal, README.md:79-81):
change the spec dict, not the flow.

Spec shape (FIXTURES.md §4)::

    {"groups": [{"id": "g1",
                 "depends_on": {"group": "g0", "passed": true},   # optional
                 "actions": [{"field": "f", "set_value": v,
                              "when": "failed"|"passed"|"always"}],  # optional
                 "subgroups": [{"id": "sg1", "inter_op": "and", "rule_op": "or",
                                "rules": [{"id": "r1", "field": "lang", "op": "eq",
                                           "value": "py", "message": "..."}]}]}]}

Counter columns mirror the reference's written attributes
(ruleengine.rulegroupsCount etc., ExecuteRuleEngine.java:98-107).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---- predicate library: the JaRE check-class surface (SURVEY.md §2.2 P3) ----

_OPS = {
    "eq": lambda c, v: c == F.lit(v),
    "ne": lambda c, v: c != F.lit(v),
    "lt": lambda c, v: c < F.lit(v),
    "le": lambda c, v: c <= F.lit(v),
    "gt": lambda c, v: c > F.lit(v),
    "ge": lambda c, v: c >= F.lit(v),
    "between": lambda c, v: c.between(F.lit(v[0]), F.lit(v[1])),
    "in": lambda c, v: c.isin(*v),
    "contains": lambda c, v: c.contains(v),
    "not_contains": lambda c, v: ~c.contains(v),
    "starts_with": lambda c, v: c.startswith(v),
    "ends_with": lambda c, v: c.endswith(v),
    "matches": lambda c, v: c.rlike(v),
    "is_null": lambda c, v: c.isNull(),
    "not_null": lambda c, v: c.isNotNull(),
    "is_empty": lambda c, v: (c.isNull()) | (F.length(c) == 0),
}

OUTPUT_TYPES = {
    # (group_pred, rule_pred) applied to the exploded detail rows, mirroring
    # ExecuteRuleEngine.java:906-912 (group.getFailed()/rule.getFailed())
    "all groups - all rules": (None, None),
    "failed groups - failed rules only": (True, True),
    "failed groups - passed rules only": (True, False),
    "failed groups - all rules": (True, None),
    "passed groups - failed rules only": (False, True),
    "passed groups - passed rules only": (False, False),
    "passed groups - all rules": (False, None),
}

COUNTER_COLS = [
    "rulegroups_count",
    "rulegroups_passed",
    "rulegroups_failed",
    "rulegroups_skipped",
    "rules_count",
    "rules_passed",
    "rules_failed",
    "actions_count",
    "data_modified",
]

DETAIL_FIELDS = [
    "group_id",
    "group_failed",
    "subgroup_id",
    "subgroup_failed",
    "inter_op",
    "rule_op",
    "rule_id",
    "rule_failed",
    "message",
]


def compile_rule(rule: dict[str, Any]) -> Column:
    """One rule -> one boolean Column. Typed compare via explicit cast
    (the reference's per-operand ``type=`` declaration, Group 1.xml:1)."""
    c = F.col(rule["field"])
    if "type" in rule and rule["type"] not in (None, "string"):
        c = c.cast(rule["type"])
    op = rule["op"]
    if op not in _OPS:
        raise ValueError(f"unknown rule op {op!r}")
    passed = _OPS[op](c, rule.get("value"))
    # null field -> rule fails (JaRE checks fail on missing data)
    return F.coalesce(passed, F.lit(False))


def _fold(cols: list[Column], op: str) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = (out & c) if op == "and" else (out | c)
    return out


def _message(rule: dict[str, Any], passed: Column) -> Column:
    """Detail message with $0 -> actual field value, $1 -> expected value;
    separate passed/failed texts like the reference's
    ``<message type="passed|failed">`` (Group 1.xml)."""
    mp = rule.get("message_passed", rule.get("message"))
    mf = rule.get("message_failed", rule.get("message"))
    if mp is None and mf is None:
        return F.lit(None).cast("string")
    return F.when(passed, _render_msg(rule, mp)).otherwise(_render_msg(rule, mf))


def _render_msg(rule: dict[str, Any], tmpl: str | None) -> Column:
    if tmpl is None:
        return F.lit(None).cast("string")
    parts: list[Column] = []
    buf = ""
    i = 0
    while i < len(tmpl):
        if tmpl[i] == "$" and i + 1 < len(tmpl) and tmpl[i + 1] in "01":
            if buf:
                parts.append(F.lit(buf))
                buf = ""
            parts.append(
                F.col(rule["field"]).cast("string")
                if tmpl[i + 1] == "0"
                else F.lit(str(rule.get("value")))
            )
            i += 2
        else:
            buf += tmpl[i]
            i += 1
    if buf:
        parts.append(F.lit(buf))
    return F.concat(*parts) if parts else F.lit("")


class CompiledRules:
    """Holds the compiled Column trees for one spec."""

    def __init__(self, spec: dict[str, Any]):
        self.spec = spec
        self.group_passed: dict[str, Column] = {}
        self.group_skipped: dict[str, Column] = {}
        self.rule_passed: list[tuple[dict, dict, dict, Column]] = []  # (g, sg, r, col)
        self.subgroup_passed: dict[tuple[str, str], Column] = {}
        self.n_rules = 0
        self.n_actions = 0

        for g in spec["groups"]:
            sg_cols: list[Column] = []
            sg_ops: list[str] = []
            for sg in g["subgroups"]:
                rules = [compile_rule(r) for r in sg["rules"]]
                self.n_rules += len(sg["rules"])
                for r, rc in zip(sg["rules"], rules):
                    self.rule_passed.append((g, sg, r, rc))
                sgc = _fold(rules, sg.get("rule_op", "and"))
                self.subgroup_passed[(g["id"], sg["id"])] = sgc
                sg_cols.append(sgc)
                sg_ops.append(sg.get("inter_op", "and"))
            gp = sg_cols[0]
            for c, op in zip(sg_cols[1:], sg_ops[1:]):
                gp = (gp & c) if op == "and" else (gp | c)
            self.group_passed[g["id"]] = gp
            self.n_actions += len(g.get("actions", []))

        # dependency skips (ExecuteRuleEngine.java:102): a group is skipped
        # when its dependency group did not resolve to the expected outcome
        for g in spec["groups"]:
            dep = g.get("depends_on")
            if dep is None:
                self.group_skipped[g["id"]] = F.lit(False)
            else:
                want = F.lit(bool(dep.get("passed", True)))
                self.group_skipped[g["id"]] = (
                    self.group_passed[dep["group"]] != want
                ) | self.group_skipped.get(dep["group"], F.lit(False))


def evaluate(df: DataFrame, spec: dict[str, Any], with_details: bool = False) -> DataFrame:
    """Add counter columns (and optionally the detail array) to ``df``.

    All additions are pure expressions — Catalyst fuses them into the
    surrounding stage; the 'rule engine run' costs one projection.
    """
    cr = CompiledRules(spec)

    def b2i(c: Column) -> Column:
        return c.cast("int")

    g_passed = []
    g_failed = []
    g_skipped = []
    for g in spec["groups"]:
        sk = cr.group_skipped[g["id"]]
        gp = cr.group_passed[g["id"]]
        g_skipped.append(b2i(sk))
        g_passed.append(b2i(~sk & gp))
        g_failed.append(b2i(~sk & ~gp))

    r_passed = [b2i(rc) for (_, _, _, rc) in cr.rule_passed]

    out = (
        df.withColumn("rulegroups_count", F.lit(len(spec["groups"])))
        .withColumn("rulegroups_passed", sum(g_passed[1:], g_passed[0]))
        .withColumn("rulegroups_failed", sum(g_failed[1:], g_failed[0]))
        .withColumn("rulegroups_skipped", sum(g_skipped[1:], g_skipped[0]))
        .withColumn("rules_count", F.lit(cr.n_rules))
        .withColumn("rules_passed", sum(r_passed[1:], r_passed[0]))
        .withColumn("rules_failed", F.lit(cr.n_rules) - sum(r_passed[1:], r_passed[0]))
        .withColumn("actions_count", F.lit(cr.n_actions))
    )

    if with_details:
        details = []
        for g, sg, r, rc in cr.rule_passed:
            gp = cr.group_passed[g["id"]]
            sgp = cr.subgroup_passed[(g["id"], sg["id"])]
            details.append(
                F.struct(
                    F.lit(g["id"]).alias("group_id"),
                    b2i(~gp).alias("group_failed"),
                    F.lit(sg["id"]).alias("subgroup_id"),
                    b2i(~sgp).alias("subgroup_failed"),
                    F.lit(sg.get("inter_op", "and")).alias("inter_op"),
                    F.lit(sg.get("rule_op", "and")).alias("rule_op"),
                    F.lit(r["id"]).alias("rule_id"),
                    b2i(~rc).alias("rule_failed"),
                    _message(r, rc).alias("message"),
                )
            )
        out = out.withColumn("_details", F.array(*details))
    return out


def apply_actions(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    """Field-mutating rule actions (reference: ExecuteRuleEngine.java:489-510)
    as conditional column rewrites; adds boolean ``data_modified``."""
    cr = CompiledRules(spec)
    # Evaluate every action's firing condition BEFORE any mutation (the rule
    # run sees the original row; actions apply afterwards — matching the
    # reference's evaluate-then-write-back order, ExecuteRuleEngine.java:462,489-510).
    actions: list[tuple[dict, int]] = []
    out = df
    i = 0
    for g in spec["groups"]:
        gp = cr.group_passed[g["id"]]
        sk = cr.group_skipped[g["id"]]
        for a in g.get("actions", []):
            when = a.get("when", "failed")
            cond = (
                F.lit(True)
                if when == "always"
                else (~sk & gp) if when == "passed" else (~sk & ~gp)
            )
            out = out.withColumn(f"_cond_{i}", cond)
            actions.append((a, i))
            i += 1
    touched = {a["field"] for a, _ in actions}
    for f_name in touched:
        out = out.withColumn(f"_orig_{f_name}", F.col(f_name))
    modified = F.lit(False)
    for a, j in actions:
        cond = F.col(f"_cond_{j}")
        new_val = F.lit(a["set_value"]) if "set_value" in a else F.expr(a["set_expr"])
        out = out.withColumn(a["field"], F.when(cond, new_val).otherwise(F.col(a["field"])))
        modified = modified | (cond & ~new_val.eqNullSafe(F.col(f"_orig_{a['field']}")))
    out = out.withColumn("data_modified", modified)
    return out.drop(
        *[f"_cond_{j}" for _, j in actions], *[f"_orig_{f_name}" for f_name in touched]
    )


def explode_details(evaluated: DataFrame, output_type: str, keep_cols: list[str]) -> DataFrame:
    """1 row -> R rule-result rows (the reference's detailed-output UDTF shape,
    ExecuteRuleEngine.java:878-963), filtered by the 7-valued output type."""
    if output_type not in OUTPUT_TYPES:
        raise ValueError(f"unknown output type {output_type!r}")
    g_pred, r_pred = OUTPUT_TYPES[output_type]
    d = evaluated.select(*keep_cols, F.explode("_details").alias("d")).select(
        *keep_cols, *[F.col(f"d.{f}").alias(f) for f in DETAIL_FIELDS]
    )
    if g_pred is not None:
        d = d.filter(F.col("group_failed") == (1 if g_pred else 0))
    if r_pred is not None:
        d = d.filter(F.col("rule_failed") == (1 if r_pred else 0))
    return d


def route(evaluated: DataFrame) -> DataFrame:
    """RouteOnAttribute analogue: 'passed' when no rulegroup failed
    (ExecuteRuleEngine_Example.xml:21-22)."""
    return evaluated.withColumn(
        "route", F.when(F.col("rulegroups_failed") == 0, "passed").otherwise("failed")
    )
