"""N-Quads parser (W3C RDF 1.1 N-Quads EBNF).

Same regex-scanner design as :mod:`ntriples` with an optional graph
label (IRI or blank node) before the terminating dot.

Parity targets: reference nquads/grammar/grammar.go:9-33 (Statement),
nquads/doc.go:30-62 (ParseDocument: trailing newline, sort with default
graph first then serialized-string order, nquads/doc.go:97-104).
"""

from __future__ import annotations

import re

from .chars import BNODE_LABEL, IRIREF_BODY, LANGTAG, STRING_CHAR_DQ, is_valid_iri
from .ntriples import BLANK_RE, RDFSyntaxError

__all__ = ["parse_document", "parse_quad_line"]

_WS = r"[ \t]*"
_COMMENT = r"[ \t]*(?:#[^\n\r]*)?"
_SUBJECT = rf"(?:<(?P<si>{IRIREF_BODY})>|_:(?P<sb>{BNODE_LABEL}))"
_PREDICATE = rf"<(?P<p>{IRIREF_BODY})>"
_OBJECT = (
    rf"(?:<(?P<oi>{IRIREF_BODY})>"
    rf"|_:(?P<ob>{BNODE_LABEL})"
    rf"|\"(?P<ol>(?:{STRING_CHAR_DQ})*)\""
    rf"(?:\^\^<(?P<od>{IRIREF_BODY})>|@(?P<olang>{LANGTAG}))?)"
)
_GRAPH = rf"(?:<(?P<gi>{IRIREF_BODY})>|_:(?P<gb>{BNODE_LABEL}))"

QUAD_RE = re.compile(
    rf"{_WS}{_SUBJECT}{_WS}{_PREDICATE}{_WS}{_OBJECT}"
    rf"(?:{_WS}{_GRAPH})?{_WS}\.{_COMMENT}\Z"
)
_EOL_SPLIT = re.compile(r"\r\n|\r|\n")


def _check_iri(v: str, validate: bool, line_no: int):
    if validate and not is_valid_iri(v):
        raise RDFSyntaxError(f"line {line_no}: invalid IRI <{v}>")


def parse_quad_line(line: str, validate: bool = True, line_no: int = 0):
    """Parse one N-Quads line -> quad tuple (s,p,o,g|None), or None."""
    if BLANK_RE.match(line):
        return None
    m = QUAD_RE.match(line)
    if m is None:
        raise RDFSyntaxError(f"line {line_no}: not a valid N-Quads statement: {line!r}")
    si, sb = m.group("si"), m.group("sb")
    if si is not None:
        _check_iri(si, validate, line_no)
        subj = ("i", si)
    else:
        subj = ("b", sb)
    p = m.group("p")
    _check_iri(p, validate, line_no)
    pred = ("i", p)
    oi, ob, ol = m.group("oi"), m.group("ob"), m.group("ol")
    if oi is not None:
        _check_iri(oi, validate, line_no)
        obj = ("i", oi)
    elif ob is not None:
        obj = ("b", ob)
    else:
        od, olang = m.group("od"), m.group("olang")
        if od is not None:
            _check_iri(od, validate, line_no)
        obj = ("l", ol, od, olang)
    gi, gb = m.group("gi"), m.group("gb")
    if gi is not None:
        _check_iri(gi, validate, line_no)
        graph = ("i", gi)
    elif gb is not None:
        graph = ("b", gb)
    else:
        graph = None
    return (subj, pred, obj, graph)


def parse_document(doc: str, validate: bool = True):
    """Parse an N-Quads document -> sorted list of quads
    (default graph first, then serialized order; nquads/doc.go:97-104)."""
    from ..terms import sort_quads

    if not doc:
        return []
    quads = []
    for i, line in enumerate(_EOL_SPLIT.split(doc), start=1):
        q = parse_quad_line(line, validate=validate, line_no=i)
        if q is not None:
            quads.append(q)
    return sort_quads(quads)
