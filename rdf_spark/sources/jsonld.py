"""JSON-LD-lite: the reference's node-object mapping
(/root/reference/node.go:24-101 ``toObject``, 112-165 ``fromObject``)
extended to a pragmatic flat-document triple extractor for embedded
``application/ld+json`` blocks.

Scope (documented subset — the reference itself has NO full JSON-LD
processor, only the node-level @id/@value/@language/@type mapping):
- a document is an object or an array of objects; ``@graph`` arrays
  are flattened;
- ``@id`` names the subject (``_:`` prefix -> blank node, as
  node.go:117-124); objects without ``@id`` get a fresh blank node;
- every other key is a predicate: absolute IRI keys kept verbatim,
  ``@vocab``-less relative keys are resolved against ``@context`` when
  it is a simple prefix map, else kept;
- values: node objects ({"@id"}/{"@value","@language","@type"}),
  plain strings/numbers/booleans (typed per XSD), arrays fan out,
  nested objects recurse.
"""

from __future__ import annotations

import json

from ..terms import (
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    escape_literal_lex,
)


class JsonLdError(ValueError):
    pass


def _node_term(v, ctx, counter):
    """Value -> term, mirroring node.go fromObject for node objects."""
    if isinstance(v, bool):
        return ("l", "true" if v else "false", XSD_BOOLEAN, None), []
    if isinstance(v, int):
        return ("l", str(v), XSD_INTEGER, None), []
    if isinstance(v, float):
        return ("l", repr(v), XSD_DOUBLE, None), []
    if isinstance(v, str):
        return ("l", escape_literal_lex(v), None, None), []
    if isinstance(v, dict):
        if "@value" in v:
            val = v["@value"]
            lex = (escape_literal_lex(val) if isinstance(val, str)
                   else json.dumps(val))
            lang = v.get("@language")
            dt = v.get("@type")
            if lang:
                return ("l", lex, None, lang), []
            return ("l", lex, dt, None), []
        if set(v) == {"@id"}:
            iid = v["@id"]
            if iid.startswith("_:"):
                return ("b", iid[2:]), []
            return ("i", _expand(iid, ctx)), []
        # nested node object -> recurse, return its subject
        subj, triples = _object_triples(v, ctx, counter)
        return subj, triples
    raise JsonLdError(f"unsupported JSON-LD value: {v!r}")


def _expand(key: str, ctx: dict) -> str:
    if ":" in key:
        pfx, local = key.split(":", 1)
        if pfx in ctx and isinstance(ctx[pfx], str):
            return ctx[pfx] + local
        return key
    if "@vocab" in ctx:
        return ctx["@vocab"] + key
    return key


def _object_triples(obj: dict, ctx: dict, counter: list):
    local_ctx = dict(ctx)
    raw_ctx = obj.get("@context")
    if isinstance(raw_ctx, dict):
        for k, v in raw_ctx.items():
            if isinstance(v, str):
                local_ctx[k] = v
    iid = obj.get("@id")
    if iid is None:
        counter[0] += 1
        subj = ("b", f"j{counter[0]}")
    elif iid.startswith("_:"):
        subj = ("b", iid[2:])
    else:
        subj = ("i", _expand(iid, local_ctx))
    triples = []
    for k, v in obj.items():
        if k.startswith("@"):
            if k == "@type":
                types = v if isinstance(v, list) else [v]
                for t in types:
                    triples.append(
                        (subj, ("i", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
                         ("i", _expand(t, local_ctx)))
                    )
            continue
        pred = ("i", _expand(k, local_ctx))
        vals = v if isinstance(v, list) else [v]
        for val in vals:
            term, extra = _node_term(val, local_ctx, counter)
            triples.extend(extra)
            triples.append((subj, pred, term))
    return subj, triples


def parse_jsonld(text: str):
    """JSON-LD-lite text -> list of quads (default graph)."""
    data = json.loads(text)
    counter = [0]
    out = []
    ctx: dict = {}
    if isinstance(data, dict) and "@graph" in data:
        raw_ctx = data.get("@context")
        if isinstance(raw_ctx, dict):
            ctx = {k: v for k, v in raw_ctx.items() if isinstance(v, str)}
        items = data["@graph"]
    elif isinstance(data, list):
        items = data
    else:
        items = [data]
    for obj in items:
        if not isinstance(obj, dict):
            raise JsonLdError(f"top-level JSON-LD item not an object: {obj!r}")
        _, triples = _object_triples(obj, ctx, counter)
        out.extend(triples)
    return [(s, p, o, None) for s, p, o in out]
