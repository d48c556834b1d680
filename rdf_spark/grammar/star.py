"""RDF-star N-Triples / N-Quads: quoted triples ``<< s p o >>`` in
subject/object position, recursive (reference star/ntriples/doc.go,
star/nquads/doc.go; grammars star/*/grammar/grammar.go).

Quoted triples become ("q", (s, p, o)) terms; at the Spark boundary
they are string-encoded with kind=3 (SURVEY.md §1.3) because the
grammar allows unbounded nesting, which a static struct type cannot.
"""

from __future__ import annotations

import re

from .chars import BNODE_LABEL, IRIREF_BODY, LANGTAG, STRING_CHAR_DQ, is_valid_iri
from .ntriples import BLANK_RE, RDFSyntaxError
from ..terms import sort_document, sort_quads

__all__ = ["parse_document", "parse_document_nq"]

_IRI_RE = re.compile(rf"<({IRIREF_BODY})>")
_BNODE_RE = re.compile(rf"_:({BNODE_LABEL})")
_LIT_RE = re.compile(
    rf"\"((?:{STRING_CHAR_DQ})*)\""
    rf"(?:\^\^<({IRIREF_BODY})>|@({LANGTAG}))?"
)
_OWS_RE = re.compile(r"[ \t]*")
_COMMENT_RE = re.compile(r"[ \t]*(?:#[^\n\r]*)?\Z")
_EOL_SPLIT = re.compile(r"\r\n|\r|\n")


class _LineParser:
    __slots__ = ("s", "i", "validate")

    def __init__(self, s: str, validate: bool):
        self.s = s
        self.i = 0
        self.validate = validate

    def ows(self):
        self.i = _OWS_RE.match(self.s, self.i).end()

    def fail(self, what):
        raise RDFSyntaxError(f"rdf-star: expected {what} at {self.i}: {self.s[self.i:self.i+24]!r}")

    def iri_checked(self, v):
        if self.validate and not is_valid_iri(v):
            raise RDFSyntaxError(f"invalid IRI <{v}>")
        return ("i", v)

    def subject(self):
        m = _IRI_RE.match(self.s, self.i)
        if m is not None:
            self.i = m.end()
            return self.iri_checked(m.group(1))
        m = _BNODE_RE.match(self.s, self.i)
        if m is not None:
            self.i = m.end()
            return ("b", m.group(1))
        return self.quoted_triple()

    def predicate(self):
        m = _IRI_RE.match(self.s, self.i)
        if m is None:
            self.fail("predicate IRI")
        self.i = m.end()
        return self.iri_checked(m.group(1))

    def object(self):
        m = _IRI_RE.match(self.s, self.i)
        if m is not None:
            self.i = m.end()
            return self.iri_checked(m.group(1))
        m = _BNODE_RE.match(self.s, self.i)
        if m is not None:
            self.i = m.end()
            return ("b", m.group(1))
        m = _LIT_RE.match(self.s, self.i)
        if m is not None:
            self.i = m.end()
            dt = m.group(2)
            if dt is not None:
                self.iri_checked(dt)
            return ("l", m.group(1), dt, m.group(3))
        return self.quoted_triple()

    def quoted_triple(self):
        if not self.s.startswith("<<", self.i):
            self.fail("term")
        self.i += 2
        self.ows()
        s = self.subject()
        self.ows()
        p = self.predicate()
        self.ows()
        o = self.object()
        self.ows()
        if not self.s.startswith(">>", self.i):
            self.fail("'>>'")
        self.i += 2
        return ("q", (s, p, o))

    def graph_label(self):
        m = _IRI_RE.match(self.s, self.i)
        if m is not None:
            self.i = m.end()
            return self.iri_checked(m.group(1))
        m = _BNODE_RE.match(self.s, self.i)
        if m is not None:
            self.i = m.end()
            return ("b", m.group(1))
        return None

    def triple(self, with_graph: bool):
        self.ows()
        s = self.subject()
        self.ows()
        p = self.predicate()
        self.ows()
        o = self.object()
        self.ows()
        g = None
        if with_graph and not self.s.startswith(".", self.i):
            g = self.graph_label()
            self.ows()
        if not self.s.startswith(".", self.i):
            self.fail("'.'")
        self.i += 1
        if _COMMENT_RE.match(self.s, self.i) is None:
            self.fail("end of line")
        return (s, p, o, g) if with_graph else (s, p, o)


def _parse(doc: str, with_graph: bool, validate: bool):
    if not doc:
        return []
    out = []
    for line in _EOL_SPLIT.split(doc):
        if BLANK_RE.match(line):
            continue
        out.append(_LineParser(line, validate).triple(with_graph))
    return out


def parse_document(doc: str, validate: bool = True):
    """RDF-star N-Triples -> sorted triples (star/ntriples/doc.go:28-59)."""
    return sort_document(_parse(doc, False, validate))


def parse_document_nq(doc: str, validate: bool = True):
    """RDF-star N-Quads -> sorted quads (star/nquads/doc.go:16-47)."""
    return sort_quads(_parse(doc, True, validate))
