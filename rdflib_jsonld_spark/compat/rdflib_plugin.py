"""rdflib plugin-compatible Parser/Serializer adapter (SURVEY §2 "what's
missing" item 1): the reference's whole public face is
``Graph().parse(format='json-ld')`` registered via setuptools entry
points (``[checkout] /root/reference/setup.py:104-113``,
``docs/jsonld-parser.rst:33``). This module gives a migrating user the
same two plugin classes, backed by THIS package's pure JSON-LD core
(jsonld/tordf.py to_rdf, jsonld/fromrdf.py from_rdf) — same algorithms
the Spark stages vectorize, so ``Graph().parse`` and the distributed
pipeline emit identical triples.

rdflib is NOT a dependency of this package (and absent in the build
sandbox): everything is import-guarded. ``register_plugins()`` performs
the registration the reference did via entry points, under the same
names (``json-ld`` and ``application/ld+json``).

Usage (with rdflib installed)::

    from rdflib import Graph
    from rdflib_jsonld_spark.compat.rdflib_plugin import register_plugins
    register_plugins()
    g = Graph().parse(data=jsonld_text, format="json-ld")
    out = g.serialize(format="json-ld", indent=4)
"""

from __future__ import annotations

import json

from rdflib_jsonld_spark.jsonld import keys
from rdflib_jsonld_spark.jsonld.fromrdf import from_rdf
from rdflib_jsonld_spark.jsonld.tordf import BNODE, IRI, LIT, to_rdf

try:  # pragma: no cover - exercised via fake-module tests in-sandbox
    import rdflib  # noqa: F401
    from rdflib.parser import Parser as _ParserBase
    from rdflib.serializer import Serializer as _SerializerBase
    HAVE_RDFLIB = True
except ImportError:  # sandbox / rdflib-less installs
    HAVE_RDFLIB = False
    _ParserBase = object
    _SerializerBase = object


def _require_rdflib():
    if not HAVE_RDFLIB:
        raise ImportError(
            "rdflib is not installed; the rdflib_plugin adapter needs it "
            "(pip install rdflib). The Spark pipeline itself does not.")


def _read_source(source) -> str:
    """InputSource → text (rdflib hands parsers a SAX-ish source)."""
    stream = source.getCharacterStream()
    if stream is not None:
        return stream.read()
    data = source.getByteStream().read()
    return data.decode("utf-8") if isinstance(data, bytes) else data


def _term_to_rdflib(t, terms):
    """Tuple term → rdflib term. ``terms`` is the rdflib.term module
    (injected so the conversion is testable without real rdflib)."""
    kind = t[0]
    if kind == IRI:
        return terms.URIRef(t[1])
    if kind == BNODE:
        return terms.BNode(t[1])
    lex, dt, lang = t[1], t[2], t[3]
    if lang is not None:
        return terms.Literal(lex, lang=lang)
    if dt == keys.XSD_STRING:  # RDF 1.1: plain literal IS xsd:string
        return terms.Literal(lex)
    return terms.Literal(lex, datatype=terms.URIRef(dt))


def _term_from_rdflib(node, terms):
    """rdflib term → tuple term."""
    if isinstance(node, terms.URIRef):
        return (IRI, str(node))
    if isinstance(node, terms.BNode):
        return (BNODE, str(node))
    lang = getattr(node, "language", None)
    dt = getattr(node, "datatype", None)
    if lang:
        return (LIT, str(node), keys.RDF_LANGSTRING, lang)
    return (LIT, str(node), str(dt) if dt else keys.XSD_STRING, None)


class JsonLDParser(_ParserBase):
    """Plugin twin of the reference's ``rdflib_jsonld.parser:JsonLDParser``
    (``[checkout] setup.py:105-107``): parse JSON-LD into a Graph /
    ConjunctiveGraph. Named-graph quads go to ``sink.get_context(g)``
    when the sink is context-aware, else into the sink itself (the
    plain-Graph merge view)."""

    def parse(self, source, sink, **kwargs):
        _require_rdflib()
        import rdflib.term as terms
        data = json.loads(_read_source(source))
        quads = to_rdf(
            data,
            context_data=kwargs.get("context"),
            base=kwargs.get("base"),
            generalized_rdf=kwargs.get("generalized_rdf", False),
            version=kwargs.get("version"),
            rdf_direction=kwargs.get("rdf_direction"))
        ctx_aware = getattr(getattr(sink, "store", None),
                            "context_aware", False)
        for g, s, p, o in quads:
            triple = (_term_to_rdflib(s, terms), _term_to_rdflib(p, terms),
                      _term_to_rdflib(o, terms))
            if g is not None and ctx_aware:
                sink.get_context(_term_to_rdflib(g, terms)).add(triple)
            else:
                sink.add(triple)


class JsonLDSerializer(_SerializerBase):
    """Plugin twin of the reference's
    ``rdflib_jsonld.serializer:JsonLDSerializer`` (``[checkout]
    setup.py:108-111``). kwargs mirror the documented surface
    (``[checkout] docs/jsonld-serializer.rst:27,49``): ``context``,
    ``base``, ``use_native_types``, ``use_rdf_type``, ``auto_compact``,
    ``indent``."""

    def __init__(self, store):
        _require_rdflib()
        super().__init__(store)

    def serialize(self, stream, base=None, encoding=None, **kwargs):
        import rdflib.term as terms
        store = self.store
        quads = []
        if getattr(getattr(store, "store", None), "context_aware", False) \
                and hasattr(store, "quads"):
            for s, p, o, c in store.quads((None, None, None, None)):
                cid = getattr(c, "identifier", c)
                g = None
                if cid is not None and not _is_default_graph(store, cid):
                    g = _term_from_rdflib(cid, terms)
                quads.append((g, _term_from_rdflib(s, terms),
                              _term_from_rdflib(p, terms),
                              _term_from_rdflib(o, terms)))
        else:
            for s, p, o in store:
                quads.append((None, _term_from_rdflib(s, terms),
                              _term_from_rdflib(p, terms),
                              _term_from_rdflib(o, terms)))
        tree = from_rdf(
            quads,
            context_data=kwargs.get("context"),
            base=base or kwargs.get("base"),
            use_native_types=kwargs.get("use_native_types", False),
            use_rdf_type=kwargs.get("use_rdf_type", False),
            auto_compact=kwargs.get("auto_compact", False))
        text = json.dumps(tree, sort_keys=True, ensure_ascii=False,
                          indent=kwargs.get("indent"))
        stream.write(text.encode(encoding or "utf-8"))


def _is_default_graph(store, cid) -> bool:
    default = getattr(store, "default_context", None)
    if default is not None and cid == getattr(default, "identifier",
                                              default):
        return True
    return str(cid).startswith("urn:x-rdflib:default")


def register_plugins() -> None:
    """Register under the reference's entry-point names
    (``[checkout] setup.py:104-113``): format ``json-ld`` and media
    type ``application/ld+json`` for both parser and serializer."""
    _require_rdflib()
    from rdflib import plugin
    from rdflib.parser import Parser
    from rdflib.serializer import Serializer
    for name in ("json-ld", "application/ld+json"):
        plugin.register(name, Parser, __name__, "JsonLDParser")
        plugin.register(name, Serializer, __name__, "JsonLDSerializer")
