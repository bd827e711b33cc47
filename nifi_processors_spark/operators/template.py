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


# ---------------- Velocity directive subset ----------------
#
# The reference's Velocity engine supports #set/#if/#foreach/#macro beyond
# simple references (its shipped examples use only $name, README.md:49-66,
# so this is surplus parity). The subset below compiles to PURE
# EXPRESSIONS: #if -> F.when over the raw column's truthiness, #foreach ->
# F.transform + array_join over an array column, #set -> driver-side
# literal binding, #macro -> driver-side AST expansion at the call site
# (recursion rejected). Still one projection, no per-row template engine.
# Remaining boundary (documented): method calls ($obj.method()) and
# #parse (file inclusion) are unsupported.

_KEYWORDS = {"set", "if", "foreach", "else", "end", "macro"}

# The generic call alternative excludes the STRUCTURAL keywords (#else /
# #end take no parens), so `#if($x)a#else (b)#end` and `#end (note)`
# parse as the directive + literal parenthesized text — Velocity's
# behavior — instead of a keyword-named call. Malformed #set/#if/
# #foreach/#macro (which DO take parens but missed their strict form
# above) still fall into the call branch and raise loudly.
_DIRECTIVE = re.compile(
    r"#set\s*\(\s*\$(\w+)\s*=\s*\"([^\"]*)\"\s*\)"            # 1: var, 2: literal
    r"|#if\s*\(\s*\$\{?(\w+)\}?\s*\)"                          # 3: cond ref
    r"|#foreach\s*\(\s*\$(\w+)\s+in\s+\$\{?(\w+)\}?\s*\)"      # 4: loop var, 5: list ref
    r"|#macro\s*\(\s*(\w+)((?:\s+\$\w+)*)\s*\)"                # 6: name, 7: params
    r"|#(?!else\b|end\b)(\w+)\s*\(([^)]*)\)"                   # 8: call name, 9: args
    r"|#else\b"
    r"|#end\b"
    r"|\$(\w+)\.(\w+)\(([^)]*)\)"                              # 10: ref, 11: method, 12: args
    r"|\$\{(\w+)\}|\$(\w+)"                                    # 13/14: simple ref
)

# $ref.method() subset — the common java.lang.String calls, compiled to
# the matching Spark built-ins. Anything else renders as the literal
# reference text (Velocity's quiet-reference rule for unresolvable calls).
_STRING_METHODS = {"toUpperCase", "toLowerCase", "trim", "length", "substring", "replace"}

_MACRO_ARG = re.compile(r"\$\{?(\w+)\}?|\"([^\"]*)\"|(-?\d+)")


def parse_velocity(template: str) -> list:
    """Template -> AST: ('text', s) | ('ref', name) |
    ('mref', name, method, argstr, raw) |
    ('if', cond, body, else_body) | ('foreach', var, list, body) |
    ('set', var, literal) | ('macro', name, params, body) |
    ('call', name, args, raw). Unbalanced #if/#foreach/#macro/#end raise."""
    root: list = []
    stack: list[tuple[str, list]] = [("root", root)]

    def top() -> list:
        return stack[-1][1]

    pos = 0
    for m in _DIRECTIVE.finditer(template):
        if m.start() > pos:
            top().append(("text", template[pos : m.start()]))
        pos = m.end()
        g = m.groups()
        if g[0] is not None:  # set
            top().append(("set", g[0], g[1]))
        elif g[2] is not None:  # if
            node = ["if", g[2], [], []]
            top().append(node)
            stack.append(("if", node[2]))
        elif g[3] is not None:  # foreach
            node = ["foreach", g[3], g[4], []]
            top().append(node)
            stack.append(("foreach", node[3]))
        elif g[5] is not None:  # macro definition
            params = re.findall(r"\$(\w+)", g[6] or "")
            node = ["macro", g[5], params, []]
            top().append(node)
            stack.append(("macro", node[3]))
        elif g[7] is not None:  # directive-call form #name(args)
            if g[7] == "parse":
                inc = re.fullmatch(r"\s*\"([^\"]*)\"\s*", g[8] or "")
                if inc is None:
                    raise ValueError(f"#parse needs one string literal: {m.group(0)!r}")
                top().append(("parse", inc.group(1), m.group(0)))
            elif g[7] in _KEYWORDS:
                raise ValueError(f"malformed #{g[7]} directive: {m.group(0)!r}")
            else:
                args = []
                for ref, slit, nlit in _MACRO_ARG.findall(g[8] or ""):
                    if ref:
                        args.append(("ref", ref))
                    elif nlit:
                        args.append(("lit", nlit))
                    else:
                        args.append(("lit", slit))
                top().append(("call", g[7], args, m.group(0)))
        elif m.group(0).startswith("#else"):
            if stack[-1][0] != "if":
                raise ValueError("#else outside #if")
            # switch the stack top to the else-branch of the innermost #if
            node = _innermost_if(stack)
            stack[-1] = ("if-else", node[3])
        elif m.group(0).startswith("#end"):
            if len(stack) == 1:
                raise ValueError("#end without #if/#foreach/#macro")
            stack.pop()
        elif g[9] is not None:  # $ref.method(args)
            top().append(("mref", g[9], g[10], g[11] or "", m.group(0)))
        else:  # simple ref
            top().append(("ref", g[12] or g[13]))
    if pos < len(template):
        top().append(("text", template[pos:]))
    if len(stack) != 1:
        raise ValueError("unclosed #if/#foreach/#macro")
    return root


def _innermost_if(stack):
    """Find the if-node whose then-branch is the current stack top."""
    cur = stack[-1][1]
    for _, parent in reversed(stack[:-1]):
        for item in parent:
            if isinstance(item, list) and item[0] == "if" and item[2] is cur:
                return item
    raise ValueError("#else outside #if")


def _truthy(c: Column) -> Column:
    """Velocity truth: non-null and not boolean false."""
    return c.isNotNull() & (c.cast("string") != F.lit("false"))


def render_velocity(
    df: DataFrame,
    template: str,
    out_col: str = "content",
    attribute_filter: str | None = None,
    null_as: str = "",
    includes: dict[str, str] | None = None,
) -> DataFrame:
    """Render a template with the Velocity directive subset (#set literal,
    #if/#else/#end, #foreach over an array column, #macro definition +
    invocation — expanded driver-side at the call site, non-recursive,
    and #parse("name") resolving against the ``includes`` dict of named
    sub-templates — Velocity's resource loader, made explicit). Same
    reference semantics as render_template for simple refs (filter,
    scrub, unresolved -> literal placeholder); an invocation of an
    undefined macro renders as its literal text, Velocity's behavior; a
    #parse of an unknown name raises (Velocity throws on a missing
    resource). Method calls: the java.lang.String subset
    ($ref.toUpperCase() / toLowerCase / trim / length / substring(a[,b])
    / replace(x,y)) compiles to the matching built-ins; any other method
    — or a call on an unresolvable reference — renders as its literal
    text (Velocity's quiet-reference rule)."""
    allowed = set(df.columns)
    if attribute_filter is not None:
        rx = re.compile(attribute_filter)
        allowed = {c for c in allowed if rx.match(c)}
    ast = parse_velocity(template)

    def ref_str(name: str, env: dict) -> Column:
        if name in env:
            return env[name]
        if name in allowed:
            return F.coalesce(
                scrub_line_separators(F.col(name).cast("string")), F.lit(null_as)
            )
        return F.lit(f"${name}")

    def ref_raw(name: str, env: dict) -> Column:
        if name in env:
            return env[name]
        if name in allowed:
            return F.col(name)
        return F.lit(None)

    def method_call(name: str, method: str, argstr: str, raw: str, env: dict) -> Column:
        """$ref.method(args): java.lang.String subset -> built-ins.
        Unknown method, unresolvable ref, or unparseable args -> the
        literal call text (Velocity's quiet-reference rule). substring is
        Java semantics (0-based, end-exclusive); args are int or
        double-quoted string literals (no nested commas)."""
        if method not in _STRING_METHODS or (name not in env and name not in allowed):
            return F.lit(raw)
        args: list = []
        if argstr.strip():
            for part in argstr.split(","):
                part = part.strip()
                if re.fullmatch(r"-?\d+", part):
                    args.append(int(part))
                elif re.fullmatch(r'"[^"]*"', part):
                    args.append(part[1:-1])
                else:
                    return F.lit(raw)
        base = ref_str(name, env)
        ints = all(isinstance(a, int) for a in args)
        strs = all(isinstance(a, str) for a in args)
        if method == "toUpperCase" and not args:
            return F.upper(base)
        if method == "toLowerCase" and not args:
            return F.lower(base)
        if method == "trim" and not args:
            return F.trim(base)
        if method == "length" and not args:
            return F.length(base).cast("string")
        if method == "substring" and args and len(args) <= 2 and ints and args[0] >= 0:
            if len(args) == 1:
                return F.substring(base, args[0] + 1, 2**31 - 1)
            return F.substring(base, args[0] + 1, max(args[1] - args[0], 0))
        if method == "replace" and len(args) == 2 and strs:
            return F.replace(base, F.lit(args[0]), F.lit(args[1]))
        return F.lit(raw)

    def mk_body(body: list, env: dict, var: str):
        def f(x):
            e2 = dict(env)
            e2[var] = F.coalesce(scrub_line_separators(x.cast("string")), F.lit(null_as))
            return render(body, e2)

        return f

    macros: dict[str, tuple[list[str], list]] = {}
    expanding: list[str] = []  # macro-call stack (recursion guard)
    includes = includes or {}
    inc_asts: dict[str, list] = {}  # parse each include once
    including: list[str] = []  # include stack (cycle guard)

    def render(nodes: list, env: dict) -> Column:
        env = dict(env)
        parts: list[Column] = []
        for n in nodes:
            kind = n[0]
            if kind == "text":
                parts.append(F.lit(n[1]))
            elif kind == "set":
                env[n[1]] = F.lit(n[2])
            elif kind == "ref":
                parts.append(ref_str(n[1], env))
            elif kind == "mref":
                parts.append(method_call(n[1], n[2], n[3], n[4], env))
            elif kind == "macro":
                # driver-side definition; renders to nothing (define-before-
                # use in document order, matching single-pass evaluation)
                macros[n[1]] = (n[2], n[3])
            elif kind == "parse":
                _, inc_name, raw = n
                if inc_name not in includes:
                    raise ValueError(f"#parse: unknown include {inc_name!r}")
                if inc_name in including:
                    raise ValueError(f"#parse cycle through {inc_name!r}")
                if inc_name not in inc_asts:
                    inc_asts[inc_name] = parse_velocity(includes[inc_name])
                including.append(inc_name)
                try:
                    # same env + macro registry: an include sees (and may
                    # define) macros, exactly like Velocity's #parse
                    parts.append(render(inc_asts[inc_name], env))
                finally:
                    including.pop()
            elif kind == "call":
                _, name, args, raw = n
                if name not in macros:
                    # Velocity renders an unknown directive as literal text
                    parts.append(F.lit(raw))
                    continue
                if name in expanding:
                    raise ValueError(f"recursive macro #{name} is unsupported")
                params, body = macros[name]
                e2 = dict(env)
                for p, a in zip(params, args):
                    e2[p] = F.lit(a[1]) if a[0] == "lit" else ref_str(a[1], env)
                for p in params[len(args):]:  # missing args -> empty
                    e2[p] = F.lit(null_as)
                expanding.append(name)
                try:
                    parts.append(render(body, e2))
                finally:
                    expanding.pop()
            elif kind == "if":
                parts.append(
                    F.when(_truthy(ref_raw(n[1], env)), render(n[2], env)).otherwise(
                        render(n[3], env)
                    )
                )
            elif kind == "foreach":
                _, var, lst, body = n
                if lst in allowed:
                    arr = F.col(lst)
                    parts.append(
                        F.when(
                            arr.isNotNull(),
                            F.array_join(F.transform(arr, mk_body(body, env, var)), ""),
                        ).otherwise(F.lit(""))
                    )
                else:
                    parts.append(F.lit(""))
        return F.concat(*parts) if parts else F.lit("")

    return df.withColumn(out_col, render(ast, {}))


def render_json(df: DataFrame, fields: list[str], out_col: str = "content") -> DataFrame:
    """Structured shortcut for JSON targets: ``to_json(struct(...))`` —
    use this instead of a JSON-shaped text template when the output must
    be valid JSON (proper escaping)."""
    return df.withColumn(out_col, F.to_json(F.struct(*[F.col(c) for c in fields])))
