"""Unit tests on Context term resolution — parity with the reference's
test/test_context.py (SURVEY.md §5.1 layout)."""

import pytest

from rdflib_jsonld_spark.jsonld.context import Context, UNDEF
from rdflib_jsonld_spark.jsonld.errors import (
    ContextNotAvailable, ProtectedTermRedefinition)

EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def test_simple_term_and_curie():
    ctx = Context().load({"ex": EX, "title": f"{EX}title"})
    assert ctx.expand_iri("title", vocab=True) == f"{EX}title"
    assert ctx.expand_iri("ex:name", vocab=True) == f"{EX}name"
    assert ctx.expand_iri("ex:name", vocab=False) == f"{EX}name"


def test_vocab_and_base_separation():
    ctx = Context(base=f"{EX}doc/").load({"@vocab": f"{EX}v#"})
    assert ctx.expand_iri("p", vocab=True) == f"{EX}v#p"
    assert ctx.expand_iri("p", vocab=False) == f"{EX}doc/p"


def test_term_overrides_and_merge_order():
    ctx = Context().load([{"p": f"{EX}a"}, {"p": f"{EX}b"}])
    assert ctx.terms["p"].id == f"{EX}b"
    # load() never mutates the receiver
    base = Context().load({"p": f"{EX}a"})
    child = base.load({"p": f"{EX}c"})
    assert base.terms["p"].id == f"{EX}a"
    assert child.terms["p"].id == f"{EX}c"


def test_typed_and_container_terms():
    ctx = Context().load({
        "age": {"@id": f"{EX}age", "@type": f"{XSD}integer"},
        "friend": {"@id": f"{EX}friend", "@type": "@id"},
        "tags": {"@id": f"{EX}tags", "@container": "@list"},
    })
    assert ctx.terms["age"].type == f"{XSD}integer"
    assert ctx.terms["friend"].type == "@id"
    assert "@list" in ctx.terms["tags"].container


def test_keyword_alias_and_null_term():
    ctx = Context().load({"id": "@id", "@vocab": EX, "hidden": None})
    assert ctx.expand_key("id") == "@id"
    assert ctx.expand_iri("hidden", vocab=True) is None
    assert ctx.expand_iri("visible", vocab=True) == f"{EX}visible"


def test_language_defaults():
    ctx = Context().load({"@language": "EN",
                          "plain": {"@id": f"{EX}p", "@language": None}})
    assert ctx.language == "en"
    assert ctx.terms["plain"].language is None
    assert Context().load({EX: EX}).language is None


def test_registry_missing_context():
    with pytest.raises(ContextNotAvailable):
        Context(registry={}).load("http://nowhere.example/ctx")


def test_protected_blocks_override():
    ctx = Context().load({"@protected": True, "name": f"{EX}name"})
    with pytest.raises(ProtectedTermRedefinition):
        ctx.load({"name": f"{EX}other"})
    # identical re-declaration allowed
    ctx2 = ctx.load({"name": f"{EX}name"})
    assert ctx2.terms["name"].id == f"{EX}name"


def test_shrink_iri_prefers_terms_then_curie_then_vocab():
    ctx = Context().load({"ex": EX, "@vocab": f"{EX}v#",
                          "title": f"{EX}title"})
    assert ctx.shrink_iri(f"{EX}title") == "title"
    assert ctx.shrink_iri(f"{EX}other") == "ex:other"
    assert ctx.shrink_iri(f"{EX}v#loc") == "loc"
    assert ctx.shrink_iri("http://elsewhere.org/x") == "http://elsewhere.org/x"


def test_scoped_context_isolated():
    ctx = Context().load({
        "ex": EX,
        "friend": {"@id": f"{EX}friend",
                   "@context": {"name": f"{EX}fname"}}})
    sub = ctx.subcontext_for_term("friend")
    assert sub.expand_iri("name", vocab=True) == f"{EX}fname"
    assert ctx.expand_iri("name", vocab=True) is None


def test_memo_invalidated_across_loads():
    ctx = Context().load({"@vocab": f"{EX}v1#"})
    assert ctx.expand_iri("p", vocab=True) == f"{EX}v1#p"
    ctx2 = ctx.load({"@vocab": f"{EX}v2#"})
    assert ctx2.expand_iri("p", vocab=True) == f"{EX}v2#p"
    assert ctx.expand_iri("p", vocab=True) == f"{EX}v1#p"
