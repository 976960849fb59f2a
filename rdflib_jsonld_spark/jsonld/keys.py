"""JSON-LD keyword constants.

Parity: [v0.5.0] rdflib_jsonld/keys.py (~25 LoC of constants; SURVEY.md §1.1)
and [spec] JSON-LD 1.1 §1.7 (syntax tokens and keywords).
"""

BASE = "@base"
CONTAINER = "@container"
CONTEXT = "@context"
DIRECTION = "@direction"
GRAPH = "@graph"
ID = "@id"
IMPORT = "@import"
INCLUDED = "@included"
INDEX = "@index"
JSON = "@json"
LANG = "@language"
LIST = "@list"
NEST = "@nest"
NONE = "@none"
PREFIX = "@prefix"
PROPAGATE = "@propagate"
PROTECTED = "@protected"
REV = "@reverse"
SET = "@set"
TYPE = "@type"
VALUE = "@value"
#: JSON-LD-star draft (json-ld-star CG, "annotation objects") — no
#: reference counterpart (the checkout predates RDF-star entirely).
ANNOTATION = "@annotation"
VERSION = "@version"
VOCAB = "@vocab"

#: Every keyword recognized by the processor ([spec] JSON-LD 1.1 §1.7).
KEYWORDS = {
    ANNOTATION, BASE, CONTAINER, CONTEXT, DIRECTION, GRAPH, ID, IMPORT,
    INCLUDED, INDEX, JSON, LANG, LIST, NEST, NONE, PREFIX, PROPAGATE,
    PROTECTED, REV, SET, TYPE, VALUE, VERSION, VOCAB,
}

def key_survives(expanded_key) -> bool:
    """[spec] JLD-API §5.1 step 13.3: a key whose expanded property is
    null, or neither contains a colon nor is a keyword, is DROPPED
    before any value-object / set-or-list validation (ADVICE r03:
    erroring on dropped keys rejected spec-valid documents). Shared by
    both walks (expansion + to_rdf) so they agree by construction."""
    return expanded_key is not None and (
        expanded_key in KEYWORDS or ":" in expanded_key)


#: Keywords whose values MERGE when a keyword and its alias (or two
#: aliases) both appear on one node: @type/@included by the step 13.4.2
#: carve-out, @nest/@none by construction (processed per raw key),
#: @context because it is consumed before key expansion.
MERGEABLE_KEYWORDS = frozenset({TYPE, INCLUDED, NEST, NONE, CONTEXT})


def check_colliding_keywords(kmap: dict) -> None:
    """[spec] JLD-API §5.1 step 13.4.2: two distinct raw keys expanding
    to the same keyword (other than :data:`MERGEABLE_KEYWORDS`) are a
    ``colliding keywords`` error. Shared by both walks (sweep 9: the
    two engines silently resolved an @id/alias collision in OPPOSITE
    directions)."""
    seen = set()
    for expanded in kmap.values():
        if expanded in KEYWORDS and expanded not in MERGEABLE_KEYWORDS:
            if expanded in seen:
                from .errors import CollidingKeywords
                raise CollidingKeywords(expanded)
            seen.add(expanded)


# Well-known IRIs used by the to-rdf / from-rdf algorithms
# ([spec] RDF 1.1 Concepts §5, JLD-API §10).
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"

RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDF_JSON = RDF_NS + "JSON"
I18N_NS = "https://www.w3.org/ns/i18n#"  # rdfDirection=i18n-datatype
RDF_LANGSTRING = RDF_NS + "langString"

XSD_STRING = XSD_NS + "string"
XSD_BOOLEAN = XSD_NS + "boolean"
XSD_INTEGER = XSD_NS + "integer"
XSD_DOUBLE = XSD_NS + "double"
XSD_DECIMAL = XSD_NS + "decimal"
