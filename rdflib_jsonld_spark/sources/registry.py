"""Offline JSON-LD context registry (replaces remote @context fetch).

The reference fetched remote contexts over HTTP with an in-process cache
([v0.5.0] context.py _fetch_context, util.py context_from_urlinputsource —
SURVEY.md §2.A7/C1). At 10^12-turn scale per-row network is a non-starter,
so contexts are pre-registered here, resolved ONCE on the driver, and the
resolved `Context` is broadcast to executors (SURVEY.md §1.2: '@context →
driver-side resolved dict, broadcast').
"""

from __future__ import annotations

from rdflib_jsonld_spark.jsonld.context import Context

#: Vocabulary IRI prefix for the KG-construction pipeline.
KG = "https://kg.example.org/"
VOCAB = KG + "vocab#"
CONTEXT_V1_IRI = KG + "context/v1"

OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
XSD = "http://www.w3.org/2001/XMLSchema#"

#: The pipeline's mention-document context. Deliberately exercises the
#: breadth of the term-definition surface (SURVEY.md §2.C2): @vocab, CURIE
#: prefix, @type:@id coercion, @container:@language, @container:@list,
#: keyword alias, datatype coercion.
CONTEXT_V1 = {
    "@context": {
        "kge": KG,
        "@vocab": VOCAB,
        "id": "@id",
        "about": {"@id": VOCAB + "about", "@type": "@id"},
        "turn": {"@id": VOCAB + "turn", "@type": "@id"},
        "label": {"@id": VOCAB + "label", "@container": "@language"},
        "tags": {"@id": VOCAB + "tags", "@container": "@list"},
        "confidence": {"@id": VOCAB + "confidence", "@type": XSD + "double"},
        "sameAs": {"@id": OWL_SAMEAS, "@type": "@id"},
    }
}

REGISTRY: dict[str, dict] = {
    CONTEXT_V1_IRI: CONTEXT_V1,
}


def resolved_context_v1() -> Context:
    """Driver-side resolution of the v1 context; picklable → broadcastable."""
    return Context(registry=REGISTRY).load(CONTEXT_V1_IRI)


def load_registry_dir(path: str) -> dict[str, dict]:
    """Load a directory of pre-fetched remote contexts into a registry
    mapping (the migration bridge for corpora whose documents reference
    remote @context IRIs — the reference fetched them over HTTP,
    [v0.5.0] context.py _fetch_context; at scale they are mirrored to a
    directory once, by hand or a one-off crawler, and resolved offline).

    Layout: ``<path>/manifest.json`` maps context IRI → relative filename;
    each file holds the context document (with or without the outer
    ``{"@context": ...}`` wrapper — Context.load handles both).
    """
    import json as _json
    import os as _os

    with open(_os.path.join(path, "manifest.json")) as f:
        manifest = _json.load(f)
    out: dict[str, dict] = {}
    for iri, fname in manifest.items():
        with open(_os.path.join(path, fname)) as f:
            out[iri] = _json.load(f)
    return out
