"""N-Triples parser (W3C RDF 1.1 N-Triples EBNF).

Line-oriented regex scanner: the whole grammar is regular, so each line
is matched by one compiled pattern (C-level speed — this runs inside
Arrow-batched UDFs over web-scale corpora, per-line Python loops would
dominate the profile).

Behavioral parity targets in the reference (0x51-dev/rdf):
- document/triple grammar: ntriples/grammar/grammar.go:8-156 and
  ntriples/grammar/ntriples.ebnf
- ParseDocument: trailing-newline append, empty input -> empty doc,
  canonical sort on parse (ntriples/doc.go:56-88)
- IRI validation (RFC 3987 absolute + fragment) toggleable; ON by
  default as in the reference (ntriples/doc.go:14-19, 192-208)
"""

from __future__ import annotations

import re

from .chars import (
    BNODE_LABEL,
    IRIREF_BODY,
    LANGTAG,
    STRING_CHAR_DQ,
    is_valid_iri,
)

__all__ = ["RDFSyntaxError", "parse_document", "parse_triple_line"]


class RDFSyntaxError(ValueError):
    """Raised when a document does not conform to the grammar."""


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

TRIPLE_RE = re.compile(
    rf"{_WS}{_SUBJECT}{_WS}{_PREDICATE}{_WS}{_OBJECT}{_WS}\.{_COMMENT}\Z"
)
BLANK_RE = re.compile(rf"{_WS}{_COMMENT}\Z")
_EOL_SPLIT = re.compile(r"\r\n|\r|\n")


def _check_iri(v: str, validate: bool, line_no: int):
    if validate and not is_valid_iri(v):
        raise RDFSyntaxError(f"line {line_no}: invalid IRI <{v}>")


def parse_triple_line(line: str, validate: bool = True, line_no: int = 0):
    """Parse one N-Triples line -> triple tuple, or None for blank/comment."""
    if BLANK_RE.match(line):
        return None
    m = TRIPLE_RE.match(line)
    if m is None:
        raise RDFSyntaxError(f"line {line_no}: not a valid N-Triples triple: {line!r}")
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
    return (subj, pred, obj)


def parse_document(doc: str, validate: bool = True):
    """Parse an N-Triples document -> sorted list of triples.

    Mirrors reference ParseDocument (ntriples/doc.go:56-88): empty input
    is an empty document; a missing trailing newline is tolerated; output
    is in canonical (serialized-string) order.
    """
    from ..terms import sort_document

    if not doc:
        return []
    triples = []
    for i, line in enumerate(_EOL_SPLIT.split(doc), start=1):
        t = parse_triple_line(line, validate=validate, line_no=i)
        if t is not None:
            triples.append(t)
    return sort_document(triples)
