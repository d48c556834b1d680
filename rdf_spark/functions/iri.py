"""IRI validity as a Spark SQL expression (SURVEY.md §2.5 F1).

The reference validates IRIs against an RFC-3987 `AbsoluteIRI
('#' ifragment)?` grammar, toggleable via ToggleValidation
(/root/reference/ntriples/doc.go:14-19, 192-208) — and runs its
Turtle/TriG suites with validation OFF. We mirror that: the exact
grammar check lives in the Python parser (grammar/ntriples.py,
`validate=` flag); THIS module is the vectorized column-level
approximation for pipeline-side filtering/metrics at scale:

- absolute (a scheme `[A-Za-z][A-Za-z0-9+.-]*:` is present)
- no characters the NT IRIREF production forbids
  (controls, space, `<>"{}|^\\` and backtick)

Documented approximation: full RFC-3987 ipath/iauthority structure is
not re-checked here — the W3C suites pass through the exact parser
path; this expr is for 100TB-scan triage where a regex in whole-stage
codegen beats a Python UDF by orders of magnitude.
"""

from __future__ import annotations

from pyspark.sql import Column

_SCHEME = r"[A-Za-z][A-Za-z0-9+.\-]*"
_FORBIDDEN = r'\x00-\x20<>"{}|^`\\'
IRI_RE = rf"^{_SCHEME}:[^{_FORBIDDEN}]*$"


def iri_is_valid(col: Column) -> Column:
    """True iff the string is an absolute IRI by the vectorized
    approximation above."""
    return col.rlike(IRI_RE)
