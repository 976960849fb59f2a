"""rdflib plugin adapter (compat/rdflib_plugin.py).

Two tiers: (1) in-sandbox coverage through a MINIMAL FAKE rdflib
injected into sys.modules — exercises the real adapter glue (term
conversion, sink dispatch, named-graph routing, serializer round-trip)
without the dependency; (2) importorskip-gated tests that run the same
assertions against real rdflib wherever it is installed (skip cleanly
here: the sandbox has no rdflib)."""

import importlib
import io
import json
import sys
import types

import pytest


# ---------------------------------------------------------------------------
# minimal fake rdflib
# ---------------------------------------------------------------------------

def _build_fake_rdflib():
    term = types.ModuleType("rdflib.term")

    class URIRef(str):
        pass

    class BNode(str):
        pass

    class Literal(str):
        def __new__(cls, lex, lang=None, datatype=None):
            o = super().__new__(cls, lex)
            o.language = lang
            o.datatype = URIRef(datatype) if datatype else None
            return o

    term.URIRef, term.BNode, term.Literal = URIRef, BNode, Literal

    parser_mod = types.ModuleType("rdflib.parser")

    class Parser:
        pass

    parser_mod.Parser = Parser

    ser_mod = types.ModuleType("rdflib.serializer")

    class Serializer:
        def __init__(self, store):
            self.store = store

    ser_mod.Serializer = Serializer

    plugin_mod = types.ModuleType("rdflib.plugin")
    plugin_mod.registered = []
    plugin_mod.register = (
        lambda *a: plugin_mod.registered.append(a))

    root = types.ModuleType("rdflib")
    root.term = term
    root.parser = parser_mod
    root.serializer = ser_mod
    root.plugin = plugin_mod
    for k in ("URIRef", "BNode", "Literal"):
        setattr(root, k, getattr(term, k))

    class _Store:
        context_aware = False

    class Graph:
        def __init__(self):
            self.store = _Store()
            self.triples_set = set()

        def add(self, triple):
            self.triples_set.add(triple)

        def __iter__(self):
            return iter(sorted(self.triples_set))

    class _CtxStore:
        context_aware = True

    class ConjunctiveGraph(Graph):
        def __init__(self):
            super().__init__()
            self.store = _CtxStore()
            self.contexts_map = {}
            self.default_context = types.SimpleNamespace(
                identifier=term.URIRef("urn:x-rdflib:default"))

        def get_context(self, gid):
            return self.contexts_map.setdefault(gid, Graph())

        def quads(self, _pattern):
            for t in self.triples_set:
                yield (*t, self.default_context)
            for gid, g in self.contexts_map.items():
                for t in g.triples_set:
                    yield (*t, types.SimpleNamespace(identifier=gid))

    root.Graph, root.ConjunctiveGraph = Graph, ConjunctiveGraph
    return {"rdflib": root, "rdflib.term": term,
            "rdflib.parser": parser_mod, "rdflib.serializer": ser_mod,
            "rdflib.plugin": plugin_mod}


class _FakeSource:
    def __init__(self, text):
        self._text = text

    def getCharacterStream(self):
        return io.StringIO(self._text)

    def getByteStream(self):
        return io.BytesIO(self._text.encode("utf-8"))


@pytest.fixture
def fake_rdflib():
    mods = _build_fake_rdflib()
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    import rdflib_jsonld_spark.compat.rdflib_plugin as plug
    plug = importlib.reload(plug)
    assert plug.HAVE_RDFLIB
    try:
        yield plug, mods["rdflib"]
    finally:
        for k, v in saved.items():
            if v is None:
                del sys.modules[k]
            else:
                sys.modules[k] = v
        importlib.reload(plug)


DOC = {
    "@context": {"name": "http://xmlns.com/foaf/0.1/name",
                 "age": {"@id": "http://ex.org/age",
                         "@type": "http://www.w3.org/2001/XMLSchema#integer"}},
    "@id": "http://example.org/alice",
    "name": {"@value": "Alice", "@language": "en"},
    "age": "7",
}


class TestFakeRdflibAdapter:
    def test_parse_into_plain_graph(self, fake_rdflib):
        plug, rdflib = fake_rdflib
        g = rdflib.Graph()
        plug.JsonLDParser().parse(_FakeSource(json.dumps(DOC)), g)
        trips = {(str(s), str(p), (str(o), getattr(o, "language", None),
                                   str(getattr(o, "datatype", None) or "")))
                 for s, p, o in g}
        assert ("http://example.org/alice",
                "http://xmlns.com/foaf/0.1/name",
                ("Alice", "en", "")) in trips
        assert ("http://example.org/alice", "http://ex.org/age",
                ("7", None,
                 "http://www.w3.org/2001/XMLSchema#integer")) in trips

    def test_parse_named_graph_routes_to_context(self, fake_rdflib):
        plug, rdflib = fake_rdflib
        doc = {"@id": "http://ex.org/g1",
               "@graph": [{"@id": "http://ex.org/s",
                           "http://ex.org/p": "v"}]}
        cg = rdflib.ConjunctiveGraph()
        plug.JsonLDParser().parse(_FakeSource(json.dumps(doc)), cg)
        assert not cg.triples_set  # nothing in the default graph
        (gid, sub), = cg.contexts_map.items()
        assert str(gid) == "http://ex.org/g1"
        assert len(sub.triples_set) == 1

    def test_parse_named_graph_merges_into_plain_graph(self, fake_rdflib):
        plug, rdflib = fake_rdflib
        doc = {"@id": "http://ex.org/g1",
               "@graph": [{"@id": "http://ex.org/s",
                           "http://ex.org/p": "v"}]}
        g = rdflib.Graph()
        plug.JsonLDParser().parse(_FakeSource(json.dumps(doc)), g)
        assert len(g.triples_set) == 1

    def test_serializer_roundtrip(self, fake_rdflib):
        plug, rdflib = fake_rdflib
        g = rdflib.Graph()
        plug.JsonLDParser().parse(_FakeSource(json.dumps(DOC)), g)
        buf = io.BytesIO()
        plug.JsonLDSerializer(g).serialize(buf, indent=2)
        tree = json.loads(buf.getvalue().decode("utf-8"))
        # re-parse the emitted document: identical triple set
        g2 = rdflib.Graph()
        plug.JsonLDParser().parse(_FakeSource(json.dumps(tree)), g2)
        assert g.triples_set == g2.triples_set
        assert b"\n  " in buf.getvalue()  # indent honored

    def test_register_plugins_uses_reference_names(self, fake_rdflib):
        # [checkout] setup.py:104-113
        plug, rdflib = fake_rdflib
        plug.register_plugins()
        names = {(a[0], a[1].__name__, a[3])
                 for a in rdflib.plugin.registered}
        assert names == {
            ("json-ld", "Parser", "JsonLDParser"),
            ("application/ld+json", "Parser", "JsonLDParser"),
            ("json-ld", "Serializer", "JsonLDSerializer"),
            ("application/ld+json", "Serializer", "JsonLDSerializer"),
        }


class TestWithoutRdflib:
    def test_module_imports_and_fails_loudly(self):
        import rdflib_jsonld_spark.compat.rdflib_plugin as plug
        if plug.HAVE_RDFLIB:  # real rdflib present: nothing to assert
            pytest.skip("rdflib installed")
        with pytest.raises(ImportError, match="rdflib is not installed"):
            plug.register_plugins()
        with pytest.raises(ImportError, match="rdflib is not installed"):
            plug.JsonLDParser().parse(_FakeSource("{}"), object())


class TestRealRdflib:
    """Runs only where rdflib is installed (skips in the sandbox)."""

    def test_graph_parse_and_serialize(self):
        rdflib = pytest.importorskip("rdflib")
        import rdflib_jsonld_spark.compat.rdflib_plugin as plug
        plug = importlib.reload(plug)
        plug.register_plugins()
        g = rdflib.Graph()
        g.parse(data=json.dumps(DOC), format="json-ld")
        assert len(g) == 2
        out = g.serialize(format="json-ld", indent=4)
        g2 = rdflib.Graph()
        g2.parse(data=out, format="json-ld")
        assert set(g) == set(g2)
