"""SPARQL SELECT front-end: compile a query-string subset onto the
relational operators this engine already has.

The reference library (0x51-dev/rdf) stops at programmatic
Find/FindAll (graph.go:17-39); real KG consumers speak SPARQL.  This
module parses a pragmatic SELECT subset and compiles it to ONE
declarative DataFrame plan — Catalyst owns join order, filter
pushdown, and partial aggregation exactly as if the user had written
the DataFrame calls by hand:

- basic graph patterns  -> :func:`graphops.bgp_match` (constant-
  filtered scans + shared-variable equi-joins; ``;`` and ``,``
  predicate/object lists; ``a`` = rdf:type),
- property paths in predicate position (``^ / | + * ? !()``)
  -> :func:`paths.eval_path` via bgp_match's path passthrough,
- FILTER             -> a Column expression (whole-stage codegen:
  comparisons, && || !, REGEX, STRSTARTS/STRENDS/CONTAINS, STRLEN,
  LCASE/UCASE, BOUND),
- OPTIONAL { ... }   -> left outer join on the shared variables,
- SELECT [DISTINCT] / ORDER BY [ASC|DESC] / LIMIT / OFFSET.

Semantics notes (documented contracts, mirrored by the test oracles):

- Literal comparison is LEXICAL-FORM equality, matching the
  reference's own lexical-only literal equality (node.go) and this
  repo's canonical triple table: ``"01"^^xsd:int`` != ``"1"``.
  Comparisons against a NUMERIC literal in FILTER cast both sides to
  double (so ``FILTER(?qty > 30)`` behaves arithmetically).
- OPTIONAL with no shared variable raises (implicit cross join —
  never at 10^12 rows), as does a disconnected BGP pattern.
- Unsupported SPARQL (GROUP BY, UNION, subqueries, VALUES, named
  graphs) raises :class:`SparqlSyntaxError` — never silently wrong.

Scale shape: the compiled plan is exactly the hand-written one — no
driver-side evaluation, no collect; LIMIT/ORDER push into Spark's
TakeOrderedAndProject when both are present.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class SparqlSyntaxError(ValueError):
    """Raised for malformed or out-of-subset SPARQL text."""


_TOKEN_RE = re.compile(
    r"""
      (?P<WS>\s+|\#[^\n]*)
    | (?P<IRI><[^<>\s]*>)
    | (?P<VAR>\?[A-Za-z_]\w*)
    | (?P<STRING>"(?:[^"\\]|\\.)*")
    | (?P<NUMBER>[+-]?\d+(?:\.\d+)?)
    | (?P<PNAME>[A-Za-z_][\w-]*:[A-Za-z_][\w.-]*)
    | (?P<KW>[A-Za-z_][\w]*)
    | (?P<PUNCT>&&|\|\||!=|<=|>=|[{}().,;:=<>!|/^*+?-])
    """,
    re.VERBOSE,
)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise SparqlSyntaxError(f"bad character at {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "WS":
            out.append((kind, m.group()))
    out.append(("EOF", ""))
    return out


def _unquote(tok: str) -> str:
    body, out, i = tok[1:-1], [], 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            out.append(_ESCAPES.get(body[i + 1], body[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}

    # -- token helpers ---------------------------------------------
    def peek(self, k: int = 0) -> tuple[str, str]:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def take(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_punct(self, p: str) -> None:
        kind, val = self.take()
        if kind != "PUNCT" or val != p:
            raise SparqlSyntaxError(f"expected {p!r}, got {val!r}")

    def kw(self, word: str) -> bool:
        kind, val = self.peek()
        if kind == "KW" and val.upper() == word:
            self.i += 1
            return True
        return False

    def expect_kw(self, word: str) -> None:
        if not self.kw(word):
            raise SparqlSyntaxError(
                f"expected {word}, got {self.peek()[1]!r}")

    # -- terms ------------------------------------------------------
    def _expand(self, pname: str) -> str:
        pfx, local = pname.split(":", 1)
        if pfx not in self.prefixes:
            raise SparqlSyntaxError(f"undeclared prefix {pfx!r}")
        return self.prefixes[pfx] + local

    def term(self):
        """Subject/object term -> bgp_match form (?var / constant)."""
        kind, val = self.take()
        if kind == "VAR":
            return val
        if kind == "IRI":
            return val[1:-1]
        if kind == "PNAME":
            return self._expand(val)
        if kind == "STRING":
            return _unquote(val)
        if kind == "NUMBER":
            return val
        if kind == "KW" and val in ("true", "false"):
            return val
        raise SparqlSyntaxError(f"unexpected term {val!r}")

    # -- property paths (predicate position) ------------------------
    # Reassembles the operators/paths.py string syntax; a bare IRI
    # stays a plain constant so bgp_match keeps the direct scan.
    def path(self) -> str:
        s = self.path_seq()
        while self.peek() == ("PUNCT", "|"):
            self.take()
            s = f"{s}|{self.path_seq()}"
        return s

    def path_seq(self) -> str:
        s = self.path_elt_or_inv()
        while self.peek() == ("PUNCT", "/"):
            self.take()
            s = f"{s}/{self.path_elt_or_inv()}"
        return s

    def path_elt_or_inv(self) -> str:
        if self.peek() == ("PUNCT", "^"):
            self.take()
            return "^" + self.path_elt()
        return self.path_elt()

    def path_elt(self) -> str:
        s = self.path_primary()
        kind, val = self.peek()
        if kind == "PUNCT" and val in ("+", "*", "?"):
            self.take()
            return s + val
        return s

    def path_primary(self) -> str:
        kind, val = self.peek()
        if kind == "IRI":
            self.take()
            return val
        if kind == "PNAME":
            self.take()
            return f"<{self._expand(val)}>"
        if kind == "KW" and val == "a":
            self.take()
            return f"<{RDF_TYPE}>"
        if kind == "PUNCT" and val == "!":
            self.take()
            self.expect_punct("(")
            inner = self.path()
            self.expect_punct(")")
            return f"!({inner})"
        if kind == "PUNCT" and val == "(":
            self.take()
            inner = self.path()
            self.expect_punct(")")
            return f"({inner})"
        raise SparqlSyntaxError(f"bad path element {val!r}")

    def predicate(self):
        """-> bgp_match predicate: '?var', a plain IRI constant, or a
        property-path string (recognized downstream by its 1st char)."""
        kind, val = self.peek()
        if kind == "VAR":
            self.take()
            return val
        p = self.path()
        plain = re.fullmatch(r"<([^<>]*)>", p)
        return plain.group(1) if plain else p

    # -- FILTER expressions -> pyspark Column ------------------------
    def filter_expr(self) -> Column:
        return self._or_expr()

    def _or_expr(self) -> Column:
        c = self._and_expr()
        while self.peek() == ("PUNCT", "||"):
            self.take()
            c = c | self._and_expr()
        return c

    def _and_expr(self) -> Column:
        c = self._unary()
        while self.peek() == ("PUNCT", "&&"):
            self.take()
            c = c & self._unary()
        return c

    def _unary(self) -> Column:
        if self.peek() == ("PUNCT", "!"):
            self.take()
            return ~self._unary()
        return self._relational()

    def _relational(self) -> Column:
        left, left_num = self._operand()
        kind, val = self.peek()
        if kind == "PUNCT" and val in ("=", "!=", "<", "<=", ">", ">="):
            self.take()
            right, right_num = self._operand()
            if left_num or right_num:
                left = left.cast("double") if isinstance(left, Column) else F.lit(float(left))
                right = right.cast("double") if isinstance(right, Column) else F.lit(float(right))
            else:
                left = left if isinstance(left, Column) else F.lit(left)
                right = right if isinstance(right, Column) else F.lit(right)
            return {
                "=": left == right, "!=": left != right,
                "<": left < right, "<=": left <= right,
                ">": left > right, ">=": left >= right,
            }[val]
        if not isinstance(left, Column):
            raise SparqlSyntaxError("literal is not a boolean filter")
        return left  # BOUND(?x) etc. used directly as a boolean

    def _operand(self):
        """-> (Column-or-python-literal, is_numeric)."""
        kind, val = self.peek()
        if kind == "PUNCT" and val == "(":
            self.take()
            c = self._or_expr()
            self.expect_punct(")")
            return c, False
        if kind == "VAR":
            self.take()
            return F.col(val[1:]), False
        if kind == "NUMBER":
            self.take()
            return val, True
        if kind == "STRING":
            self.take()
            return _unquote(val), False
        if kind == "IRI":
            self.take()
            return val[1:-1], False
        if kind == "PNAME":
            self.take()
            return self._expand(val), False
        if kind == "KW":
            return self._function(val.upper())
        raise SparqlSyntaxError(f"bad filter operand {val!r}")

    def _function(self, name: str):
        self.take()
        self.expect_punct("(")
        if name == "BOUND":
            kind, val = self.take()
            if kind != "VAR":
                raise SparqlSyntaxError("BOUND takes a variable")
            self.expect_punct(")")
            return F.col(val[1:]).isNotNull(), False
        args = [self._operand()[0]]
        while self.peek() == ("PUNCT", ","):
            self.take()
            args.append(self._operand()[0])
        self.expect_punct(")")
        cols = [a if isinstance(a, Column) else F.lit(a) for a in args]

        def _lit(i):
            if isinstance(args[i], Column):
                raise SparqlSyntaxError(f"{name} arg {i+1} must be a literal")
            return args[i]

        if name == "REGEX":
            pat = _lit(1)
            if len(args) > 2 and "i" in _lit(2):
                pat = "(?i)" + pat
            return cols[0].rlike(pat), False
        if name == "STRSTARTS":
            return cols[0].startswith(cols[1]), False
        if name == "STRENDS":
            return cols[0].endswith(cols[1]), False
        if name == "CONTAINS":
            return cols[0].contains(cols[1]), False
        if name == "STRLEN":
            return F.length(cols[0]), True
        if name == "LCASE":
            return F.lower(cols[0]), False
        if name == "UCASE":
            return F.upper(cols[0]), False
        raise SparqlSyntaxError(f"unsupported function {name}")

    # -- WHERE group --------------------------------------------------
    def group(self):
        """-> (patterns, filters, optionals); optionals are nested
        (patterns, filters) pairs."""
        self.expect_punct("{")
        patterns, filters, optionals = [], [], []
        while True:
            kind, val = self.peek()
            if (kind, val) == ("PUNCT", "}"):
                self.take()
                return patterns, filters, optionals
            if kind == "KW" and val.upper() == "FILTER":
                self.take()
                self.expect_punct("(")
                filters.append(self._or_expr())
                self.expect_punct(")")
                continue
            if kind == "KW" and val.upper() == "OPTIONAL":
                self.take()
                p, f, o = self.group()
                if o:
                    raise SparqlSyntaxError("nested OPTIONAL unsupported")
                optionals.append((p, f))
                continue
            if kind == "KW" and val.upper() in (
                    "UNION", "GRAPH", "MINUS", "VALUES", "BIND", "SERVICE"):
                raise SparqlSyntaxError(f"{val.upper()} not in subset")
            # triple block: subject (pred obj (, obj)* (; pred obj...)*) .
            subj = self.term()
            while True:
                pred = self.predicate()
                while True:
                    obj = self.term()
                    patterns.append((subj, pred, obj))
                    if self.peek() == ("PUNCT", ","):
                        self.take()
                        continue
                    break
                if self.peek() == ("PUNCT", ";"):
                    self.take()
                    if self.peek() == ("PUNCT", "."):  # dangling ;
                        break
                    continue
                break
            if self.peek() == ("PUNCT", "."):
                self.take()

    # -- full query ---------------------------------------------------
    def query(self):
        while self.kw("PREFIX"):
            kind, val = self.take()
            if kind != "KW":
                raise SparqlSyntaxError("bad PREFIX declaration")
            self.expect_punct(":")
            kind, iri = self.take()
            if kind != "IRI":
                raise SparqlSyntaxError("PREFIX needs an IRI")
            self.prefixes[val] = iri[1:-1]
        self.expect_kw("SELECT")
        distinct = self.kw("DISTINCT")
        select_vars = []
        if self.peek() == ("PUNCT", "*"):
            self.take()
        else:
            while self.peek()[0] == "VAR":
                select_vars.append(self.take()[1][1:])
            if not select_vars:
                raise SparqlSyntaxError("SELECT needs variables or *")
        self.expect_kw("WHERE")
        patterns, filters, optionals = self.group()
        order = []
        if self.kw("ORDER"):
            self.expect_kw("BY")
            while True:
                kind, val = self.peek()
                if kind == "KW" and val.upper() in ("ASC", "DESC"):
                    self.take()
                    self.expect_punct("(")
                    v = self.take()
                    self.expect_punct(")")
                    order.append((v[1][1:], val.upper() == "DESC"))
                elif kind == "VAR":
                    self.take()
                    order.append((val[1:], False))
                else:
                    break
        limit = offset = None
        # LIMIT/OFFSET in either order, each at most once
        for _ in range(2):
            if self.kw("LIMIT"):
                limit = int(self.take()[1])
            elif self.kw("OFFSET"):
                offset = int(self.take()[1])
        if self.peek()[0] != "EOF":
            raise SparqlSyntaxError(
                f"trailing input at {self.peek()[1]!r}")
        return (distinct, select_vars, patterns, filters, optionals,
                order, limit, offset)


def sparql_select(
    triples: DataFrame, query: str, path_max_rounds: int = 16
) -> DataFrame:
    """Run a SPARQL SELECT (see module docstring for the subset) over
    the canonical triple table -> one column per selected variable.

    The result is a lazy DataFrame; the plan is identical to the
    hand-composed bgp_match / filter / left-join / orderBy chain.
    """
    from .graphops import bgp_match

    (distinct, select_vars, patterns, filters, optionals, order,
     limit, offset) = _Parser(query).query()
    if not patterns:
        raise SparqlSyntaxError("empty WHERE group")
    out = bgp_match(triples, patterns, path_max_rounds=path_max_rounds)
    for opt_patterns, opt_filters in optionals:
        opt = bgp_match(triples, opt_patterns,
                        path_max_rounds=path_max_rounds)
        for f in opt_filters:
            opt = opt.where(f)
        shared = sorted(set(out.columns) & set(opt.columns))
        if not shared:
            raise SparqlSyntaxError(
                "OPTIONAL shares no variable with the outer group")
        out = out.join(opt, on=shared, how="left")
    # group-scope FILTERs apply over the whole group INCLUDING
    # optionals (SPARQL semantics — BOUND(?x) sees the join nulls);
    # Catalyst pushes outer-column-only predicates back below the
    # left joins, so evaluation order costs nothing.
    for f in filters:
        out = out.where(f)
    if select_vars:
        missing = [v for v in select_vars if v not in out.columns]
        if missing:
            raise SparqlSyntaxError(f"unbound SELECT variables {missing}")
        out = out.select(*select_vars)
    if distinct:
        out = out.distinct()
    if order:
        out = out.orderBy(*[
            F.col(v).desc() if desc else F.col(v).asc()
            for v, desc in order])
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out
