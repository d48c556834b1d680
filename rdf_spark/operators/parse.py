"""Vectorized parse operators: pages -> triples DataFrame.

The per-document parser family (rdf_spark.grammar) runs inside
``mapInPandas`` — Arrow batches in, exploded triple batches out; only
flat columns cross the UDF boundary (SURVEY.md §1.3, §3.1-3.3). No
per-row Python UDFs anywhere (BASELINE.json input_hint).

Scale design:
- one Python parse call per document, batched via Arrow
  (spark.sql.execution.arrow.maxRecordsPerBatch sizes the batch);
- parse failures become rows with ``error`` set (bad documents at web
  scale are data, not exceptions — SURVEY.md §2.3 E13);
- the output is partition-preserving: no shuffle is introduced by
  parsing itself.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ByteType,
    StringType,
    StructField,
    StructType,
)

from ..terms import term_to_flat

TRIPLES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("subj_kind", ByteType()),
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj_kind", ByteType()),
        StructField("obj_lex", StringType()),
        StructField("obj_datatype", StringType()),
        StructField("obj_lang", StringType()),
        StructField("graph_kind", ByteType()),
        StructField("graph", StringType()),
        StructField("error", StringType()),
    ]
)

_COLS = [f.name for f in TRIPLES_SCHEMA.fields]


def parse_text(fmt: str, text: str, base: str):
    """Parse one document -> list of quads (graph None for triple
    syntaxes). Dispatch on media-type-ish format name."""
    if fmt in ("ntriples", "application/n-triples"):
        from ..grammar.ntriples import parse_document

        return [(s, p, o, None) for s, p, o in parse_document(text)]
    if fmt in ("nquads", "application/n-quads"):
        from ..grammar.nquads import parse_document

        return parse_document(text)
    if fmt in ("turtle", "text/turtle"):
        from ..grammar.turtle import parse_and_evaluate

        return [(s, p, o, None) for s, p, o in parse_and_evaluate(text, base)]
    if fmt in ("trig", "application/trig"):
        from ..grammar.trig import parse_and_evaluate

        return parse_and_evaluate(text)
    if fmt in ("ntriples-star", "application/n-triples-star"):
        from ..grammar.star import parse_document

        return [(s, p, o, None) for s, p, o in parse_document(text)]
    if fmt in ("nquads-star", "application/n-quads-star"):
        from ..grammar.star import parse_document_nq

        return parse_document_nq(text)
    if fmt in ("jsonld", "application/ld+json"):
        from ..sources.jsonld import parse_jsonld

        return parse_jsonld(text, base)
    if fmt in ("rdfxml", "application/rdf+xml"):
        from ..sources.rdfxml import parse_rdfxml

        return parse_rdfxml(text, base)
    if fmt == "rdfa":
        from ..sources.html_rdf import parse_rdfa

        return parse_rdfa(text, base)
    if fmt == "microdata":
        from ..sources.html_rdf import parse_microdata

        return parse_microdata(text, base)
    raise ValueError(f"unknown RDF format {fmt!r}")


def doc_to_rows(url: str, fmt: str, text: str, validate: bool = False):
    """One document -> list of flat triple rows (+1 error row on failure)."""
    try:
        quads = parse_text(fmt, text, base=url or "")
    except Exception as e:  # noqa: BLE001 — error class recorded in the row
        return [(url, None, None, None, None, None, None, None, None, None,
                 f"{type(e).__name__}: {e}")]
    rows = []
    for s, p, o, g in quads:
        sk, sv, _, _ = term_to_flat(s)
        ok_, ol, od, olang = term_to_flat(o)
        pv = p[1]
        if g is None:
            gk, gv = None, None
        else:
            gk, gv, _, _ = term_to_flat(g)
        rows.append((url, sk, sv, pv, ok_, ol, od, olang, gk, gv, None))
    return rows


def sniff_format(text: str) -> str:
    """Cheap syntactic format sniff for crawl pages whose content
    type is missing or wrong (at 10^12 documents, mislabeled bodies
    are data). Checks only the document head; biased toward the
    Turtle family because Turtle subsumes N-Triples and a wrong guess
    surfaces as an error ROW, never an exception (doc_to_rows)."""
    stripped = text.lstrip("﻿ \t\r\n")
    head = stripped[:256]
    if head.startswith(("{", "[")):
        return "jsonld"
    low = head.lower()
    # XHTML(+RDFa) pages conventionally open with an XML declaration —
    # check for HTML markers BEFORE routing XML to the RDF/XML parser;
    # match '<!doctype html' specifically, because legacy RDF/XML
    # routinely carries '<!DOCTYPE rdf:RDF [ <!ENTITY ...> ]>'
    if "<html" in low or re.search(r"<!doctype\s+html", low):
        return "rdfa"  # attribute markup; microdata pages go through
        # extract_pages, which probes both extractors
    if head.startswith("<?xml") or "<rdf:RDF" in head \
            or low.startswith("<!doctype"):
        return "rdfxml"
    if head.startswith("<<"):
        return "ntriples-star"
    if "@prefix" in head or "@base" in head or low.startswith(
            ("prefix ", "base ")):
        # directive syntax: trig iff a graph block opens in the head
        return "trig" if "{" in head else "turtle"
    if "{" in head:
        return "trig"  # graph block with no directives
    # N-Quads: first data line is term term term term '.' with an
    # IRI/bnode in graph position. A wider window than `head` so long
    # crawl IRIs don't cut the line mid-term; skip when a ';'
    # OUTSIDE IRI/literal spans marks a Turtle predicate list (a ', <o2>' object
    # list can still fool this — the error row names the misparse)
    first = next((ln for ln in stripped[:4096].splitlines()
                  if ln.strip() and not ln.lstrip().startswith("#")), "")
    bare = re.sub(r'<[^>]*>|"(?:[^"\\]|\\.)*"', "", first)
    if ";" not in bare and re.match(
            r"\s*(<[^>]*>|_:\S+)\s+<[^>]*>\s+\S.*"
            r"\s+(<[^>]*>|_:\S+)\s*\.\s*$", first):
        return "nquads"
    return "turtle"


def parse_pages(pages: DataFrame, default_format: str = "turtle") -> DataFrame:
    """pages(url, text[, format]) -> triples DataFrame.

    Runs the grammar kernels via mapInPandas (Arrow-batched). The page
    ``url`` seeds the base IRI for relative-IRI resolution (mirrors the
    ``cwd`` argument of the reference's EvaluateDocument,
    /root/reference/turtle/doc.go:13-15).

    ``default_format`` applies where no ``format`` column exists or
    its value is null; pass ``"auto"`` to sniff per document
    (:func:`sniff_format`) — the crawl-realistic mode for pages with
    missing or wrong content types.
    """
    has_fmt = "format" in pages.columns
    cols = ["url", "text"] + (["format"] if has_fmt else [])
    src = pages.select(*cols)

    def resolve(fmt, text):
        f = fmt if fmt is not None else default_format
        return sniff_format(text) if f == "auto" else f

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            fmts = pdf["format"] if has_fmt else None
            for i, (url, text) in enumerate(zip(pdf["url"], pdf["text"])):
                fmt = resolve(fmts.iloc[i] if fmts is not None else None,
                              text)
                out.extend(doc_to_rows(url, fmt, text))
            yield pd.DataFrame(out, columns=_COLS)

    return src.mapInPandas(run, schema=TRIPLES_SCHEMA)


def failed_docs(triples: DataFrame) -> DataFrame:
    """Parse-error side-channel: (url, error) rows."""
    return triples.where(triples.error.isNotNull()).select("url", "error")


def good_triples(triples: DataFrame) -> DataFrame:
    return triples.where(triples.error.isNull()).drop("error")
