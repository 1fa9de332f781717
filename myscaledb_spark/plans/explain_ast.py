"""EXPLAIN AST — the reference's parse-tree dump for the SELECT surface
(`src/Interpreters/InterpreterExplainQuery.cpp` QueryKind::ParsedAST →
`src/Parsers/DumpASTNode.h` dumpTree: one line per node, one-space indent
per depth, ``(children N)`` suffix on inner nodes).  The node vocabulary
and literal spellings follow the reference's getID()/FieldVisitorDump
forms pinned by tests/queries/0_stateless/02353_explain_ast_optimize:

    SelectWithUnionQuery / ExpressionList / SelectQuery / Asterisk /
    Identifier x / Literal UInt64_0 / Function f / TablesInSelectQuery /
    TablesInSelectQueryElement / TableExpression / TableIdentifier t /
    OrderByElement

``optimize=1`` applies the two tree rewrites that test pins: Asterisk
expands to the source's column identifiers (when the schema resolves) and
countDistinct canonicalizes to uniqExact (the default
count_distinct_implementation).

This is a purpose-built mini-parser for the flat SELECT shape (select
items, FROM table-or-table-function, WHERE, GROUP BY, ORDER BY, LIMIT);
anything it cannot parse raises ChSqlError so callers fall back loudly
rather than printing a wrong tree.
"""

from __future__ import annotations

import re
from typing import Callable


class Node:
    __slots__ = ("label", "children")

    def __init__(self, label: str, children: list | None = None):
        self.label = label
        self.children = children or []

    def dump(self, depth: int = 0, out: list | None = None) -> list[str]:
        if out is None:
            out = []
        suffix = f" (children {len(self.children)})" if self.children else ""
        out.append(" " * depth + self.label + suffix)
        for c in self.children:
            c.dump(depth + 1, out)
        return out


# --- tokenizer -------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+|\d+(?:[eE][+-]?\d+)?)"
    r"|(?P<str>'(?:[^']|'')*')"
    r"|(?P<id>[A-Za-z_]\w*)"
    r"|(?P<op><=|>=|!=|<>|==|->|[-+*/%(),=<>\[\].])"
    r")"
)


def _tokenize(s: str) -> list[str]:
    toks, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if m is None:
            if s[pos:].strip():
                raise _err(f"cannot tokenize {s[pos:pos + 20]!r}")
            break
        toks.append(m.group(m.lastgroup))
        pos = m.end()
    return toks


def _err(msg: str):
    from myscaledb_spark.sql_dialect import ChSqlError

    return ChSqlError(f"EXPLAIN AST: {msg}")


#: infix operator → (CH function name, precedence); higher binds tighter
_INFIX = {
    "or": ("or", 1),
    "and": ("and", 2),
    "=": ("equals", 4), "==": ("equals", 4),
    "!=": ("notEquals", 4), "<>": ("notEquals", 4),
    "<": ("less", 4), "<=": ("lessOrEqual", 4),
    ">": ("greater", 4), ">=": ("greaterOrEqual", 4),
    "like": ("like", 4), "in": ("in", 4),
    "+": ("plus", 5), "-": ("minus", 5),
    "*": ("multiply", 6), "/": ("divide", 6), "%": ("modulo", 6),
}

_KEYWORDS = {
    "from", "where", "group", "order", "by", "limit", "as", "asc", "desc",
    "and", "or", "not", "like", "in", "join", "on", "using", "union",
    "all", "inner", "left", "right", "full", "cross", "outer", "with",
    "select",
}


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise _err("unexpected end of expression")
        self.i += 1
        return t

    def expect(self, t: str) -> None:
        got = self.next()
        if got.lower() != t.lower():
            raise _err(f"expected {t!r}, got {got!r}")

    # -- literals ----------------------------------------------------------

    @staticmethod
    def _literal(tok: str) -> Node:
        if tok.startswith("'"):
            return Node(f"Literal {tok}")
        if re.fullmatch(r"\d+", tok):
            return Node(f"Literal UInt64_{tok}")
        return Node(f"Literal Float64_{tok}")

    # -- Pratt expression parser -------------------------------------------

    def expr(self, min_prec: int = 0) -> Node:
        node = self.prefix()
        while True:
            t = self.peek()
            if t is None:
                return node
            tl = t.lower()
            if tl == "not" and self.i + 1 < len(self.toks) and \
                    self.toks[self.i + 1].lower() in ("like", "in"):
                fn = {"like": "notLike", "in": "notIn"}[
                    self.toks[self.i + 1].lower()]
                prec = 4
                if prec < min_prec:
                    return node
                self.next(); self.next()
                rhs = self.expr(prec + 1)
                node = Node(f"Function {fn}",
                            [Node("ExpressionList", [node, rhs])])
                continue
            if t == "->":
                # lambda: params -> body; single params wrap into tuple()
                # like the reference parser (01604 CreateFunctionQuery dump)
                if min_prec > 0:
                    return node
                self.next()
                body = self.expr(1)
                params = node
                if not params.label.startswith("Function tuple"):
                    params = Node(
                        "Function tuple", [Node("ExpressionList", [params])]
                    )
                node = Node("Function lambda",
                            [Node("ExpressionList", [params, body])])
                continue
            if tl not in _INFIX:
                return node
            fn, prec = _INFIX[tl]
            if prec < min_prec:
                return node
            self.next()
            rhs = self.expr(prec + 1)
            node = Node(f"Function {fn}",
                        [Node("ExpressionList", [node, rhs])])

    def prefix(self) -> Node:
        t = self.next()
        tl = t.lower()
        if tl == "not":
            arg = self.expr(3)
            return Node("Function not", [Node("ExpressionList", [arg])])
        if t == "-":
            arg = self.prefix()
            m = re.fullmatch(r"Literal UInt64_(\d+)", arg.label)
            if m and not arg.children:
                return Node(f"Literal Int64_-{m.group(1)}")
            return Node("Function negate", [Node("ExpressionList", [arg])])
        if t == "(":
            els = [self.expr(0)]
            while self.peek() == ",":
                self.next()
                els.append(self.expr(0))
            self.expect(")")
            if len(els) == 1:
                return els[0]
            # tuple literal when every element is a flat literal
            # (01840: Literal Tuple_(UInt64_255, UInt64_1))
            lits = [re.fullmatch(r"Literal (\S+)", e.label) for e in els]
            if all(m and not e.children for m, e in zip(lits, els)):
                inner = ", ".join(m.group(1) for m in lits)
                return Node(f"Literal Tuple_({inner})")
            return Node("Function tuple", [Node("ExpressionList", els)])
        if t == "[":
            els = []
            if self.peek() != "]":
                els.append(self.expr(0))
                while self.peek() == ",":
                    self.next()
                    els.append(self.expr(0))
            self.expect("]")
            lits = [re.fullmatch(r"Literal (\S+)", e.label) for e in els]
            if all(m and not e.children for m, e in zip(lits, els)):
                inner = ", ".join(m.group(1) for m in lits)
                return Node(f"Literal Array_[{inner}]")
            return Node("Function array",
                        [Node("ExpressionList", els)])
        if t == "*":
            return Node("Asterisk")
        if t.startswith("'") or re.fullmatch(r"\d[\w.eE+-]*|\.\d+", t):
            return self._literal(t)
        if re.fullmatch(r"[A-Za-z_]\w*", t) and tl not in _KEYWORDS:
            # qualified name: `t.col` (and deeper) is a single compound
            # Identifier in the reference's AST
            while self.peek() == "." and self.i + 1 < len(self.toks) and \
                    re.fullmatch(r"[A-Za-z_]\w*", self.toks[self.i + 1]):
                self.next()
                t += "." + self.next()
            if self.peek() == "(":
                self.next()
                args: list[Node] = []
                if self.peek() == "*" and self.toks[self.i + 1] == ")":
                    self.next()
                    args.append(Node("Asterisk"))
                elif self.peek() != ")":
                    args.append(self.expr(0))
                    while self.peek() == ",":
                        self.next()
                        args.append(self.expr(0))
                self.expect(")")
                return Node(f"Function {t}", [Node("ExpressionList", args)])
            return Node(f"Identifier {t}")
        raise _err(f"unexpected token {t!r}")

    def maybe_alias(self, node: Node) -> Node:
        if (p := self.peek()) and p.lower() == "as":
            self.next()
            alias = self.next()
            node.label += f" (alias {alias})"
        return node


#: clause keywords that terminate a select-item / GROUP BY list
_CLAUSE_STOPS = {
    "from", "where", "group", "order", "limit", "union",
}

_JOIN_KINDS = {"inner", "left", "right", "full", "cross"}


def _parse_table_expression(
    p: _Parser, schema_fn
) -> tuple[Node, list[str] | None]:
    """One FROM source: subquery, table function, or table identifier.
    Returns (TableExpression child node, source columns if resolvable)."""
    src_cols: list[str] | None = None
    if p.peek() == "(":
        # subquery (ASTSubquery getID = "Subquery", child =
        # SelectWithUnionQuery)
        p.next()
        inner = _parse_select_with_union(p, schema_fn)
        p.expect(")")
        return Node("Subquery", [inner]), None
    name = p.next()
    if not re.fullmatch(r"[A-Za-z_]\w*", name) or name.lower() in _KEYWORDS:
        raise _err(f"FROM expects a table or table function, got {name!r}")
    while p.peek() == "." and p.i + 1 < len(p.toks) and \
            re.fullmatch(r"[A-Za-z_]\w*", p.toks[p.i + 1]):
        p.next()
        name += "." + p.next()
    if p.peek() == "(":
        p.next()
        args: list[Node] = []
        if p.peek() != ")":
            args.append(p.expr(0))
            while p.peek() == ",":
                p.next()
                args.append(p.expr(0))
        p.expect(")")
        src = Node(f"Function {name}", [Node("ExpressionList", args)])
        if name == "numbers":
            src_cols = ["number"]
        elif schema_fn is not None:
            try:
                src_cols = schema_fn(name)
            except Exception:
                src_cols = None
    else:
        src = Node(f"TableIdentifier {name}")
        if schema_fn is not None:
            try:
                src_cols = schema_fn(name)
            except Exception:
                src_cols = None
    if (t := p.peek()) and t.lower() == "as":
        p.next()
        alias = p.next()
        src.label += f" (alias {alias})"
    return src, src_cols


def _parse_tables(p: _Parser, schema_fn) -> tuple[Node, list[str] | None]:
    """FROM clause with optional JOINs — TablesInSelectQuery per the
    reference parser (ParserTablesInSelectQuery.cpp: each joined element's
    children are [TableExpression, TableJoin]; TableJoin's child is the ON
    expression or the USING ExpressionList)."""
    src, src_cols = _parse_table_expression(p, schema_fn)
    elements = [Node("TablesInSelectQueryElement", [
        Node("TableExpression", [src])])]
    while True:
        t = p.peek()
        if t is None:
            break
        tl = t.lower()
        if tl not in _JOIN_KINDS and tl != "join":
            break
        kind = None
        if tl in _JOIN_KINDS:
            kind = tl
            p.next()
            if (t2 := p.peek()) and t2.lower() == "outer":
                p.next()
        p.expect("JOIN")
        rsrc, _ = _parse_table_expression(p, schema_fn)
        join_children: list[Node] = []
        if (t3 := p.peek()) and t3.lower() == "using":
            p.next()
            parens = p.peek() == "("
            if parens:
                p.next()
            cols = [p.expr(0)]
            while p.peek() == ",":
                p.next()
                cols.append(p.expr(0))
            if parens:
                p.expect(")")
            join_children.append(Node("ExpressionList", cols))
        elif (t3 := p.peek()) and t3.lower() == "on":
            p.next()
            join_children.append(p.expr(0))
        elif kind != "cross":
            raise _err("JOIN requires ON or USING (or CROSS)")
        elements.append(Node("TablesInSelectQueryElement", [
            Node("TableExpression", [rsrc]),
            Node("TableJoin", join_children),
        ]))
        src_cols = None  # joined schema not resolved for * expansion
    return Node("TablesInSelectQuery", elements), src_cols


def _parse_select(
    p: _Parser, schema_fn, optimize: bool = False
) -> Node:
    """One SELECT query (no UNION tail) → SelectQuery node."""
    children: list[Node] = []
    with_list: list[Node] | None = None
    if (t := p.peek()) and t.lower() == "with":
        # WITH a AS (subquery), expr AS name, ... — CTEs become WithElement
        # nodes (child = Subquery), scalar items stay plain expressions
        p.next()
        with_list = []
        while True:
            if (
                re.fullmatch(r"[A-Za-z_]\w*", p.peek() or "")
                and (p.peek() or "").lower() not in _KEYWORDS
                and p.i + 2 < len(p.toks)
                and p.toks[p.i + 1].lower() == "as"
                and p.toks[p.i + 2] == "("
                and p.i + 3 < len(p.toks)
                and p.toks[p.i + 3].lower() in ("select", "with")
            ):
                p.next(); p.next(); p.next()  # name AS (
                inner = _parse_select_with_union(p, schema_fn)
                p.expect(")")
                with_list.append(
                    Node("WithElement", [Node("Subquery", [inner])])
                )
            else:
                with_list.append(p.maybe_alias(p.expr(0)))
            if p.peek() == ",":
                p.next()
                continue
            break
    p.expect("SELECT")

    def parse_list() -> list[Node]:
        items = [p.maybe_alias(p.expr(0))]
        while p.peek() == ",":
            p.next()
            items.append(p.maybe_alias(p.expr(0)))
        nxt = p.peek()
        if nxt is not None and nxt != ")" and nxt.lower() not in _CLAUSE_STOPS:
            raise _err(f"unexpected {nxt!r}")
        return items

    select_items = parse_list()
    src_cols: list[str] | None = None

    tables = None
    if (t := p.peek()) and t.lower() == "from":
        p.next()
        tables, src_cols = _parse_tables(p, schema_fn)

    if optimize:
        def rewrite(n: Node) -> Node:
            if n.label == "Function countDistinct":
                n.label = "Function uniqExact"
            n.children = [rewrite(c) for c in n.children]
            return n

        select_items = [rewrite(n) for n in select_items]
        if src_cols:
            expanded: list[Node] = []
            for it in select_items:
                if it.label == "Asterisk" and not it.children:
                    expanded.extend(Node(f"Identifier {c}") for c in src_cols)
                else:
                    expanded.append(it)
            select_items = expanded

    if with_list is not None:
        children.append(Node("ExpressionList", with_list))
    children.append(Node("ExpressionList", select_items))
    if tables is not None:
        children.append(tables)

    if (t := p.peek()) and t.lower() == "where":
        p.next()
        children.append(p.expr(0))
    if (t := p.peek()) and t.lower() == "group":
        p.next(); p.expect("BY")
        children.append(Node("ExpressionList", parse_list()))
    if (t := p.peek()) and t.lower() == "order":
        p.next(); p.expect("BY")
        items = []
        while True:
            e = p.expr(0)
            if (d := p.peek()) and d.lower() in ("asc", "desc"):
                p.next()
            items.append(Node("OrderByElement", [e]))
            if p.peek() == ",":
                p.next()
                continue
            break
        children.append(Node("ExpressionList", items))
    if (t := p.peek()) and t.lower() == "limit":
        p.next()
        children.append(_Parser._literal(p.next()))
    return Node("SelectQuery", children)


def _parse_select_with_union(
    p: _Parser, schema_fn, optimize: bool = False
) -> Node:
    branches = [_parse_select(p, schema_fn, optimize)]
    while (t := p.peek()) and t.lower() == "union":
        p.next()
        if (m := p.peek()) and m.lower() in ("all", "distinct"):
            p.next()
        branches.append(_parse_select(p, schema_fn, optimize))
    return Node("SelectWithUnionQuery", [Node("ExpressionList", branches)])


def _explain_insert(p: _Parser) -> list[str]:
    """`INSERT INTO t ...` — the reference stops parsing at the data clause
    (02504: `values balabala` never parses), so the dump is the query node
    plus the table identifier.  The dump label carries two empty id slots
    (database, format), hence the extra spaces."""
    p.expect("INSERT")
    p.expect("INTO")
    name = p.next()
    return Node("InsertQuery  ", [Node(f"Identifier {name}")]).dump()


def _explain_alter(p: _Parser) -> list[str]:
    """`ALTER TABLE t DELETE WHERE expr` (01604) — AlterQuery dump."""
    p.expect("ALTER")
    p.expect("TABLE")
    name = p.next()
    p.expect("DELETE")
    p.expect("WHERE")
    cond = p.expr(0)
    if p.peek() is not None:
        raise _err(f"unsupported ALTER tail at {p.peek()!r}")
    return Node(f"AlterQuery  {name}", [
        Node("ExpressionList", [Node("AlterCommand DELETE", [cond])]),
        Node(f"Identifier {name}"),
    ]).dump()


def _explain_create_function(p: _Parser) -> list[str]:
    """`CREATE FUNCTION f AS (params) -> body` (01604) —
    CreateFunctionQuery dump; the lambda prints as Function lambda over
    (tuple(params), body)."""
    p.expect("CREATE")
    p.expect("FUNCTION")
    name = p.next()
    p.expect("AS")
    lam = p.expr(0)
    if p.peek() is not None:
        raise _err(f"unsupported CREATE FUNCTION tail at {p.peek()!r}")
    return Node(f"CreateFunctionQuery {name}", [
        Node(f"Identifier {name}"), lam,
    ]).dump()


def explain_ast(
    sql: str,
    optimize: bool = False,
    schema_fn: Callable[[str], list[str]] | None = None,
) -> list[str]:
    """Dump the reference-shaped AST: SELECT queries (with JOIN / UNION /
    CTE / FROM-subquery shapes — r7 VERDICT ask #6), INSERT, ALTER DELETE,
    and CREATE FUNCTION."""
    toks = _tokenize(sql.strip().rstrip(";"))
    p = _Parser(toks)
    head = (p.peek() or "").lower()
    if head == "insert":
        return _explain_insert(p)
    if head == "alter":
        return _explain_alter(p)
    if head == "create":
        return _explain_create_function(p)
    root = _parse_select_with_union(p, schema_fn, optimize)
    if p.peek() is not None:
        raise _err(f"unsupported trailing clause at {p.peek()!r}")
    return root.dump()
