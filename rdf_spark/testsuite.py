"""W3C conformance-suite manifest loading.

The reference dogfoods its own Turtle parser to read each suite's
``manifest.ttl`` (internal/testsuite/manifest.go:21-113). We do the
same once the Turtle parser is available (:func:`load_manifest`);
until then :func:`load_manifest_regex` extracts the same fields with
a regex fallback so the NT/NQ suites can gate early.

Suites are read in place from the read-only reference checkout
(``/root/reference/<suite>/testdata/suite``) — they are the vendored
public W3C test corpora (reference Makefile:19-24), not reference code.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

SUITE_DIRS = {
    "ntriples": "/root/reference/ntriples/testdata/suite",
    "nquads": "/root/reference/nquads/testdata/suite",
    "turtle": "/root/reference/turtle/testdata/suite",
    "trig": "/root/reference/trig/testdata/suite",
}

BASE_IRIS = {
    # base IRI per suite (reference turtle/doc_test.go:134, trig/doc_test.go:97)
    "turtle": "http://www.w3.org/2013/TurtleTests/",
    "trig": "http://www.w3.org/2013/TriGTests/",
    "ntriples": "http://www.w3.org/2013/N-TriplesTests/",
    "nquads": "http://www.w3.org/2013/N-QuadsTests/",
}


@dataclass
class SuiteTest:
    suite: str
    name: str
    test_type: str  # e.g. rdft:TestTurtleEval
    action_path: str
    result_path: str | None

    @property
    def base_iri(self) -> str:
        return BASE_IRIS[self.suite] + os.path.basename(self.action_path)

    def action_text(self) -> str:
        # newline="" preserves raw \r / \r\n (several suite docs embed
        # bare carriage returns inside literals)
        with open(self.action_path, encoding="utf-8", newline="") as f:
            return f.read()

    def result_text(self) -> str | None:
        if not self.result_path:
            return None
        with open(self.result_path, encoding="utf-8", newline="") as f:
            return f.read()


_ENTRY_RE = re.compile(
    r"<#(?P<id>[^>]+)>\s+(?:rdf:type|a)\s+rdft:(?P<type>\w+)\s*;"
    r"(?P<body>.*?)(?:\n\s*\.\s*\n|\.\s*\n\n)",
    re.DOTALL,
)
_FIELD_RE = {
    "name": re.compile(r'mf:name\s+"([^"]*)"'),
    "action": re.compile(r"mf:action\s+<([^>]*)>"),
    "result": re.compile(r"mf:result\s+<([^>]*)>"),
}


def load_manifest_regex(suite: str) -> list[SuiteTest]:
    d = SUITE_DIRS[suite]
    with open(os.path.join(d, "manifest.ttl"), encoding="utf-8") as f:
        text = f.read()
    tests = []
    for m in _ENTRY_RE.finditer(text):
        body = m.group("body")
        name_m = _FIELD_RE["name"].search(body)
        action_m = _FIELD_RE["action"].search(body)
        result_m = _FIELD_RE["result"].search(body)
        if not action_m:
            continue
        tests.append(
            SuiteTest(
                suite=suite,
                name=name_m.group(1) if name_m else m.group("id"),
                test_type="rdft:" + m.group("type"),
                action_path=os.path.join(d, action_m.group(1)),
                result_path=os.path.join(d, result_m.group(1)) if result_m else None,
            )
        )
    return tests


def load_manifest(suite: str) -> list[SuiteTest]:
    """Dogfooded manifest load via our own Turtle parser (mirrors
    reference internal/testsuite/manifest.go): parse manifest.ttl,
    follow the mf:entries rdf:first/rest collection, read per-entry
    rdf:type / mf:name / mf:action / mf:result."""
    from .grammar import turtle as ttl

    d = SUITE_DIRS[suite]
    with open(os.path.join(d, "manifest.ttl"), encoding="utf-8") as f:
        text = f.read()
    triples = ttl.evaluate_document(ttl.parse_document(text), base="", validate=False)

    MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    RDFT = "http://www.w3.org/ns/rdftest#"

    spo: dict = {}
    for s, p, o in triples:
        spo.setdefault(s, {}).setdefault(p[1], []).append(o)

    # find manifest root: subject with mf:entries
    head = None
    for s, props in spo.items():
        if MF + "entries" in props:
            head = props[MF + "entries"][0]
            break
    entries = []
    while head is not None and head != ("i", RDF + "nil"):
        props = spo.get(head, {})
        first = props.get(RDF + "first")
        if first:
            entries.append(first[0])
        rest = props.get(RDF + "rest")
        head = rest[0] if rest else None

    tests = []
    for e in entries:
        props = spo.get(e, {})
        ttype = next(
            (o[1] for o in props.get(RDF + "type", []) if o[1].startswith(RDFT)), None
        )
        name = next((o[1] for o in props.get(MF + "name", [])), None)
        action = next((o[1] for o in props.get(MF + "action", [])), None)
        result = next((o[1] for o in props.get(MF + "result", [])), None)
        if action is None or ttype is None:
            continue
        tests.append(
            SuiteTest(
                suite=suite,
                name=name or action,
                test_type="rdft:" + ttype[len(RDFT):],
                action_path=os.path.join(d, os.path.basename(action)),
                result_path=os.path.join(d, os.path.basename(result)) if result else None,
            )
        )
    return tests
