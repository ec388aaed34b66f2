"""SQL parser — a hand-written lexer/recursive-descent parser for the subset
of the reference dialect that lowers onto the PQL layer (reference:
sql3/parser/parser.go 3933 LoC hand-written parser; this grows toward it).

Supported:
  SELECT <list> FROM <table> [WHERE <expr>] [GROUP BY c, ...]
      [HAVING <expr>] [ORDER BY c [ASC|DESC], ...] [LIMIT n [OFFSET m]]
      list: *, _id, col, COUNT(*), COUNT(col), COUNT(DISTINCT col),
            SUM(col), MIN(col), MAX(col), AVG(col)
  CREATE TABLE t (_id ID | STRING, col TYPE [CACHETYPE ...], ...)
      types: ID, STRING, IDSET, STRINGSET, INT [MIN x MAX y],
             DECIMAL(scale), TIMESTAMP, BOOL
  DROP TABLE t; SHOW TABLES; SHOW COLUMNS FROM t
  INSERT INTO t (_id, col, ...) VALUES (...), (...)
  DELETE FROM t [WHERE expr]
"""
from __future__ import annotations

import re
from typing import Any, List, Optional, Tuple

_TOKEN_RX = re.compile(r"""
    \s*(?:
      (?P<num>-?\d+\.\d+|-?\d+)
    | (?P<str>'(?:[^']|'')*'|"(?:[^"]|"")*")
    | (?P<op><=|>=|<>|!=|=|<|>|\(|\)|,|\*|\[|\]|;)
    | (?P<word>[A-Za-z_][A-Za-z0-9_\-]*)
    )""", re.VERBOSE)

KEYWORDS = {"select", "from", "where", "group", "by", "having", "order",
            "limit", "offset", "and", "or", "not", "in", "between", "is",
            "null", "asc", "desc", "distinct", "create", "table", "drop",
            "insert", "into", "values", "delete", "show", "tables",
            "columns", "true", "false", "if", "exists", "with", "as", "top"}


class SQLError(Exception):
    pass


class Lexer:
    def __init__(self, src: str):
        self.tokens: List[Tuple[str, Any]] = []
        i = 0
        while i < len(src):
            m = _TOKEN_RX.match(src, i)
            if not m or m.end() == i:
                if src[i:].strip() == "":
                    break
                raise SQLError(f"bad token at {i}: {src[i:i+16]!r}")
            i = m.end()
            if m.group("num") is not None:
                t = m.group("num")
                self.tokens.append(("num", float(t) if "." in t else int(t)))
            elif m.group("str") is not None:
                s = m.group("str")
                q = s[0]
                self.tokens.append(("str", s[1:-1].replace(q + q, q)))
            elif m.group("op") is not None:
                self.tokens.append(("op", m.group("op")))
            else:
                w = m.group("word")
                self.tokens.append(("word", w))
        self.pos = 0

    def peek(self) -> Tuple[str, Any]:
        if self.pos < len(self.tokens):
            return self.tokens[self.pos]
        return ("eof", None)

    def next(self) -> Tuple[str, Any]:
        t = self.peek()
        self.pos += 1
        return t

    def try_kw(self, *words: str) -> bool:
        save = self.pos
        for w in words:
            k, v = self.next()
            if k != "word" or v.lower() != w:
                self.pos = save
                return False
        return True

    def expect_kw(self, *words: str):
        if not self.try_kw(*words):
            raise SQLError(f"expected {' '.join(words).upper()} near "
                           f"{self.peek()}")

    def try_op(self, op: str) -> bool:
        k, v = self.peek()
        if k == "op" and v == op:
            self.pos += 1
            return True
        return False

    def expect_op(self, op: str):
        if not self.try_op(op):
            raise SQLError(f"expected {op!r} near {self.peek()}")

    def ident(self) -> str:
        k, v = self.next()
        if k != "word":
            raise SQLError(f"expected identifier, got {v!r}")
        return v


# -- AST --------------------------------------------------------------------

class Select:
    def __init__(self):
        self.columns: List[Tuple[str, Optional[str], bool]] = []  # (kind, col, distinct) kind: star|col|count|sum|min|max|avg
        self.table = ""
        self.where = None
        self.group_by: List[str] = []
        self.having = None
        self.order_by: List[Tuple[str, bool]] = []  # (col, desc)
        self.limit: Optional[int] = None
        self.offset: int = 0


class CreateTable:
    def __init__(self, name, columns, if_not_exists=False):
        self.name = name
        self.columns = columns  # list of (name, type, opts dict)
        self.if_not_exists = if_not_exists


class DropTable:
    def __init__(self, name):
        self.name = name


class Insert:
    def __init__(self, table, columns, rows):
        self.table = table
        self.columns = columns
        self.rows = rows


class Delete:
    def __init__(self, table, where):
        self.table = table
        self.where = where


class Show:
    def __init__(self, what, table=None):
        self.what = what
        self.table = table


# where-expr nodes
class Cmp:
    def __init__(self, col, op, value):
        self.col, self.op, self.value = col, op, value


class Between:
    def __init__(self, col, lo, hi):
        self.col, self.lo, self.hi = col, lo, hi


class InList:
    def __init__(self, col, values):
        self.col, self.values = col, values


class IsNull:
    def __init__(self, col, negated):
        self.col, self.negated = col, negated


class Logical:
    def __init__(self, op, args):
        self.op, self.args = op, args  # 'and' | 'or' | 'not'


def parse_sql(src: str):
    lx = Lexer(src)
    stmts = []
    while lx.peek()[0] != "eof":
        stmts.append(_statement(lx))
        lx.try_op(";")
    if not stmts:
        raise SQLError("empty statement")
    return stmts


def _statement(lx: Lexer):
    k, v = lx.peek()
    if k != "word":
        raise SQLError(f"expected statement, got {v!r}")
    w = v.lower()
    if w == "select":
        return _select(lx)
    if w == "create":
        return _create(lx)
    if w == "drop":
        lx.next()
        lx.expect_kw("table")
        lx.try_kw("if", "exists")
        return DropTable(lx.ident())
    if w == "insert":
        return _insert(lx)
    if w == "delete":
        lx.next()
        lx.expect_kw("from")
        table = lx.ident()
        where = None
        if lx.try_kw("where"):
            where = _expr(lx)
        return Delete(table, where)
    if w == "show":
        lx.next()
        if lx.try_kw("tables"):
            return Show("tables")
        if lx.try_kw("columns"):
            lx.expect_kw("from")
            return Show("columns", lx.ident())
        if lx.try_kw("fields"):
            lx.expect_kw("from")
            return Show("columns", lx.ident())
        raise SQLError("expected TABLES or COLUMNS after SHOW")
    raise SQLError(f"unsupported statement: {v}")


def _select(lx: Lexer) -> Select:
    lx.expect_kw("select")
    sel = Select()
    if lx.try_kw("top"):
        k, n = lx.next()
        sel.limit = int(n)
    while True:
        if lx.try_op("*"):
            sel.columns.append(("star", None, False))
        else:
            k, v = lx.peek()
            if k != "word":
                raise SQLError(f"bad select list near {v!r}")
            w = v.lower()
            if w in ("count", "sum", "min", "max", "avg"):
                lx.next()
                lx.expect_op("(")
                distinct = lx.try_kw("distinct")
                if lx.try_op("*"):
                    col = None
                else:
                    col = lx.ident()
                lx.expect_op(")")
                lx.try_kw("as") and lx.ident()
                sel.columns.append((w, col, distinct))
            else:
                col = lx.ident()
                lx.try_kw("as") and lx.ident()
                sel.columns.append(("col", col, False))
        if not lx.try_op(","):
            break
    lx.expect_kw("from")
    sel.table = lx.ident()
    if lx.try_kw("where"):
        sel.where = _expr(lx)
    if lx.try_kw("group", "by"):
        sel.group_by.append(lx.ident())
        while lx.try_op(","):
            sel.group_by.append(lx.ident())
    if lx.try_kw("having"):
        sel.having = _expr(lx)
    if lx.try_kw("order", "by"):
        while True:
            c = lx.ident()
            desc = bool(lx.try_kw("desc"))
            if not desc:
                lx.try_kw("asc")
            sel.order_by.append((c, desc))
            if not lx.try_op(","):
                break
    if lx.try_kw("limit"):
        k, n = lx.next()
        sel.limit = int(n)
        if lx.try_kw("offset"):
            k, o = lx.next()
            sel.offset = int(o)
    return sel


_TYPES = {"id", "string", "idset", "stringset", "int", "decimal",
          "timestamp", "bool"}


def _create(lx: Lexer) -> CreateTable:
    lx.expect_kw("create")
    lx.expect_kw("table")
    ine = lx.try_kw("if", "not", "exists")
    name = lx.ident()
    lx.expect_op("(")
    cols = []
    while True:
        cname = lx.ident()
        k, t = lx.next()
        if k != "word" or t.lower() not in _TYPES:
            raise SQLError(f"bad column type {t!r}")
        t = t.lower()
        opts = {}
        if t == "decimal" and lx.try_op("("):
            k, s = lx.next()
            opts["scale"] = int(s)
            lx.expect_op(")")
        # optional constraints: MIN x MAX y, TIMEUNIT 's', CACHETYPE ranked
        while True:
            k2, w2 = lx.peek()
            if k2 == "word" and w2.lower() in ("min", "max", "timeunit",
                                               "cachetype", "timequantum",
                                               "ttl", "size"):
                lx.next()
                k3, v3 = lx.next()
                opts[w2.lower()] = v3
            else:
                break
        cols.append((cname, t, opts))
        if not lx.try_op(","):
            break
    lx.expect_op(")")
    return CreateTable(name, cols, ine)


def _insert(lx: Lexer) -> Insert:
    lx.expect_kw("insert")
    lx.expect_kw("into")
    table = lx.ident()
    cols = []
    if lx.try_op("("):
        while True:
            cols.append(lx.ident())
            if not lx.try_op(","):
                break
        lx.expect_op(")")
    lx.expect_kw("values")
    rows = []
    while True:
        lx.expect_op("(")
        vals = []
        while True:
            vals.append(_value(lx))
            if not lx.try_op(","):
                break
        lx.expect_op(")")
        rows.append(vals)
        if not lx.try_op(","):
            break
    return Insert(table, cols, rows)


def _value(lx: Lexer):
    if lx.try_op("["):
        out = []
        if not lx.try_op("]"):
            while True:
                out.append(_value(lx))
                if not lx.try_op(","):
                    break
            lx.expect_op("]")
        return out
    k, v = lx.next()
    if k == "num":
        return v
    if k == "str":
        return v
    if k == "word":
        if v.lower() == "null":
            return None
        if v.lower() == "true":
            return True
        if v.lower() == "false":
            return False
        return v
    raise SQLError(f"bad value {v!r}")


# -- where-expression parsing (precedence: OR < AND < NOT < cmp) ------------

def _expr(lx: Lexer):
    node = _and_expr(lx)
    while lx.try_kw("or"):
        rhs = _and_expr(lx)
        if isinstance(node, Logical) and node.op == "or":
            node.args.append(rhs)
        else:
            node = Logical("or", [node, rhs])
    return node


def _and_expr(lx: Lexer):
    node = _not_expr(lx)
    while lx.try_kw("and"):
        rhs = _not_expr(lx)
        if isinstance(node, Logical) and node.op == "and":
            node.args.append(rhs)
        else:
            node = Logical("and", [node, rhs])
    return node


def _not_expr(lx: Lexer):
    if lx.try_kw("not"):
        return Logical("not", [_not_expr(lx)])
    if lx.try_op("("):
        node = _expr(lx)
        lx.expect_op(")")
        return node
    return _predicate(lx)


def _predicate(lx: Lexer):
    col = lx.ident()
    if lx.try_kw("is"):
        neg = lx.try_kw("not")
        lx.expect_kw("null")
        return IsNull(col, neg)
    if lx.try_kw("between"):
        lo = _value(lx)
        lx.expect_kw("and")
        hi = _value(lx)
        return Between(col, lo, hi)
    if lx.try_kw("in"):
        lx.expect_op("(")
        vals = []
        while True:
            vals.append(_value(lx))
            if not lx.try_op(","):
                break
        lx.expect_op(")")
        return InList(col, vals)
    for op in ("<=", ">=", "<>", "!=", "=", "<", ">"):
        if lx.try_op(op):
            v = _value(lx)
            if op == "<>":
                op = "!="
            return Cmp(col, op, v)
    raise SQLError(f"bad predicate near {lx.peek()}")
