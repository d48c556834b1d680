"""W3C N-Quads suite: 85/85 must pass (reference README.md:8)."""

import pytest

from rdf_spark.grammar.nquads import parse_document
from rdf_spark.grammar.ntriples import RDFSyntaxError
from rdf_spark.testsuite import load_manifest_regex

TESTS = load_manifest_regex("nquads")


@pytest.mark.parametrize("t", TESTS, ids=[t.name for t in TESTS])
def test_nquads_suite(t):
    text = t.action_text()
    if t.test_type == "rdft:TestNQuadsPositiveSyntax":
        parse_document(text)
    elif t.test_type == "rdft:TestNQuadsNegativeSyntax":
        with pytest.raises(RDFSyntaxError):
            parse_document(text)
    else:
        pytest.fail(f"unknown test type {t.test_type}")
