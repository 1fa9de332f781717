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
    "and", "or", "not", "like", "in",
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
            node = self.expr(0)
            self.expect(")")
            return node
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


def explain_ast(
    sql: str,
    optimize: bool = False,
    schema_fn: Callable[[str], list[str]] | None = None,
) -> list[str]:
    """Dump the reference-shaped AST for a flat SELECT query."""
    toks = _tokenize(sql.strip().rstrip(";"))
    p = _Parser(toks)
    p.expect("SELECT")

    def parse_list(stop: set[str]) -> list[Node]:
        items = [p.maybe_alias(p.expr(0))]
        while p.peek() == ",":
            p.next()
            items.append(p.maybe_alias(p.expr(0)))
        nxt = p.peek()
        if nxt is not None and nxt.lower() not in stop:
            raise _err(f"unexpected {nxt!r}")
        return items

    select_items = parse_list({"from"})
    children: list[Node] = []
    src_cols: list[str] | None = None

    tables = None
    if (t := p.peek()) and t.lower() == "from":
        p.next()
        name = p.next()
        if not re.fullmatch(r"[A-Za-z_]\w*", name):
            raise _err(f"FROM expects a table or table function, got {name!r}")
        if p.peek() == "(":
            p.i -= 1
            src = p.prefix()  # table function
            fn = src.label.removeprefix("Function ")
            if fn == "numbers":
                src_cols = ["number"]
            elif schema_fn is not None:
                try:
                    src_cols = schema_fn(fn)
                except Exception:
                    src_cols = None
        else:
            src = Node(f"TableIdentifier {name}")
            if schema_fn is not None:
                try:
                    src_cols = schema_fn(name)
                except Exception:
                    src_cols = None
        tables = Node("TablesInSelectQuery", [
            Node("TablesInSelectQueryElement", [
                Node("TableExpression", [src])])])

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

    children.append(Node("ExpressionList", select_items))
    if tables is not None:
        children.append(tables)

    if (t := p.peek()) and t.lower() == "where":
        p.next()
        children.append(p.expr(0))
    if (t := p.peek()) and t.lower() == "group":
        p.next(); p.expect("BY")
        children.append(Node("ExpressionList", parse_list(
            {"order", "limit"})))
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
    if p.peek() is not None:
        raise _err(f"unsupported trailing clause at {p.peek()!r}")

    root = Node("SelectWithUnionQuery", [
        Node("ExpressionList", [Node("SelectQuery", children)])])
    return root.dump()
