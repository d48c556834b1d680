"""Crash-freedom fuzz: at web scale, malformed input is data, not an
exception (SURVEY.md §2.3 E13). For ARBITRARY input text,
``doc_to_rows`` must return rows — either triples or a single error
row — and never raise, for every supported format."""

from hypothesis import given, settings, strategies as st

from rdf_spark.operators.parse import doc_to_rows

FORMATS = ["ntriples", "nquads", "turtle", "trig", "ntriples-star",
           "nquads-star", "jsonld", "rdfa", "microdata", "rdfxml"]

# adversarial alphabet: grammar metacharacters, quotes, escapes,
# unicode, control chars
_ALPHABET = st.characters(codec="utf-8", exclude_categories=["Cs"])
text_st = st.text(alphabet=_ALPHABET, max_size=200)
fmt_st = st.sampled_from(FORMATS)


@settings(max_examples=400, deadline=None)
@given(fmt_st, text_st)
def test_doc_to_rows_never_raises(fmt, text):
    rows = doc_to_rows("http://fuzz.example/doc", fmt, text)
    assert isinstance(rows, list)
    for r in rows:
        assert len(r) == 11
    # either all triples (error=None) or exactly one error row
    errs = [r for r in rows if r[-1] is not None]
    if errs:
        assert len(rows) == 1


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_doc_to_rows_deterministic(text):
    a = doc_to_rows("http://u/x", "turtle", text)
    b = doc_to_rows("http://u/x", "turtle", text)
    assert a == b


# targeted nasty payloads that fuzzing rarely hits
NASTY = [
    '<a> <b> "unterminated',
    "@prefix : <x>",
    "((((((((",
    "[" * 200,
    "<<" * 100,
    '"""' + "\\" * 50,
    "\x00\x01\x02",
    "@base <rel> . <a> <b> <c> .",
    "_:- <p> <o> .",
    "PREFIX : <http://x/> :a :b :c",
    "{" * 100 + "}" * 100,
    "\ud800" if False else "\\ud800 surrogate-escape text",
    "a" * 10_000,
]


def test_nasty_payloads_all_formats():
    for fmt in FORMATS:
        for text in NASTY:
            rows = doc_to_rows("http://u/n", fmt, text)
            assert isinstance(rows, list), (fmt, text[:30])
