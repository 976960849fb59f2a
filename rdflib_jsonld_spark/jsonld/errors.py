"""JSON-LD processing errors.

Parity: [v0.5.0] rdflib_jsonld/errors.py (~10 LoC; SURVEY.md §2.C1) and
[spec] JLD-API §8 (error codes). Only the codes the pipeline can actually
raise offline are modeled.
"""


class JsonLdError(Exception):
    """Base class; ``code`` mirrors the spec's error-code strings."""

    code = "processing error"


class RecursiveContextInclusion(JsonLdError):
    # [spec] JLD-API §6.1 step 3.2.2 ("recursive context inclusion");
    # reference raised the same condition from context loading
    # ([v0.5.0] errors.py RECURSIVE_CONTEXT_INCLUSION, SURVEY.md §2.C1).
    code = "recursive context inclusion"


class InvalidContext(JsonLdError):
    code = "invalid local context"


class InvalidImportValue(JsonLdError):
    """[spec] 1.1 §6.1 step 5.6.1: @import must be a string (sweep 35
    chaos: a list crashed context loading with a raw TypeError)."""
    code = "invalid @import value"


class ContextNotAvailable(JsonLdError):
    """Remote context IRI not found in the offline registry.

    Replaces the reference's HTTP fetch ([v0.5.0] context.py _fetch_context)
    — at 10^12-row scale there is no per-row network; contexts must be
    pre-registered (SURVEY.md §2.A7/C1).
    """

    code = "loading remote context failed"


class ProtectedTermRedefinition(JsonLdError):
    # [spec] JSON-LD 1.1 §6.1 create-term-definition step 5/9.1:
    # attempting to redefine a protected term fails.
    code = "protected term redefinition"


class InvalidContextNullification(JsonLdError):
    # [spec] 1.1 §6.1 step 5.1.1: null cannot clear protected terms.
    code = "invalid context nullification"


class InvalidValueObject(JsonLdError):
    # [spec] 1.1 expansion step 13.8.3.7.1: property-based indexing
    # requires node objects — a value object under such a map fails.
    code = "invalid value object"


class InvalidTermDefinition(JsonLdError):
    # [spec] 1.1 §6.1 create-term-definition step 20: @index in a term
    # definition must be a string and requires @container:@index.
    code = "invalid term definition"


class InvalidListOfLists(JsonLdError):
    # [v0.5.0] parser.py to_rdf(allow_lists_of_lists=...) gate; [spec]
    # JSON-LD 1.0 toRdf ("list of lists" error).
    code = "list of lists"


class InvalidIdValue(JsonLdError):
    # [spec] 1.1 API expansion step 13.4.3.1: @id value must be a string.
    code = "invalid @id value"


class InvalidTypeValue(JsonLdError):
    # [spec] 1.1 API expansion step 13.4.4: @type must be a string or an
    # array of strings (or a scoped-context map key set).
    code = "invalid type value"


class InvalidTypedValue(JsonLdError):
    # [spec] 1.1 API expansion step 13.4.4.4: inside a VALUE object,
    # @type must expand to an IRI (or blank node identifier) — keywords
    # other than @json and unexpandable strings are errors.
    code = "invalid typed value"


class InvalidValueObjectValue(JsonLdError):
    # [spec] 1.1 API expansion step 13.4.7.x: @value must be a scalar,
    # null, or (for @json) any JSON — never a non-@json list/dict.
    code = "invalid value object value"


class InvalidBaseDirection(JsonLdError):
    # [spec] 1.1 API context processing step 5.10.3: @direction must be
    # "ltr", "rtl", or null.
    code = "invalid base direction"


class InvalidIndexValue(JsonLdError):
    # [spec] 1.1 API expansion step 13.4.8: @index value must be a string.
    code = "invalid @index value"


class InvalidLanguageTaggedString(JsonLdError):
    # [spec] 1.1 API expansion step 13.4.5 / value expansion: @language
    # in a value object must be a string.
    code = "invalid language-tagged string"


class InvalidLanguageTaggedValue(JsonLdError):
    # [spec] 1.1 API expansion step 13.4.11: a number/boolean @value
    # carrying a language tag.
    code = "invalid language-tagged value"


class InvalidIncludedValue(JsonLdError):
    # [spec] 1.1 §9.13: @included takes node objects only.
    code = "invalid @included value"


class InvalidSetOrListObject(JsonLdError):
    # [spec] 1.1 API expansion steps 13.4.9.1/13.4.11: @set/@list admit
    # only @index beside them.
    code = "invalid set or list object"


class InvalidNestValue(JsonLdError):
    # [spec] 1.1 §9.10: @nest values must be node objects (no scalars,
    # no value objects).
    code = "invalid @nest value"


class InvalidReverseValue(JsonLdError):
    # [spec] 1.1 API expansion step 13.7.1: @reverse takes a map.
    code = "invalid @reverse value"


class InvalidReversePropertyMap(JsonLdError):
    # [spec] 1.1 API expansion step 13.7.2: a @reverse map may not
    # itself contain @reverse.
    code = "invalid reverse property map"


class InvalidReversePropertyValue(JsonLdError):
    # [spec] 1.1 API expansion step 13.4.9 / 14: values of properties
    # under @reverse must be node objects, never literals.
    code = "invalid reverse property value"


class InvalidVocabMapping(JsonLdError):
    # [spec] 1.1 API context processing step 5.8.2.
    code = "invalid vocab mapping"


class InvalidBaseIRI(JsonLdError):
    # [spec] 1.1 API context processing step 5.7.2.
    code = "invalid base IRI"


class InvalidContainerMapping(JsonLdError):
    # [spec] 1.1 API create term definition step 19.
    code = "invalid container mapping"


class InvalidReverseProperty(JsonLdError):
    # [spec] 1.1 API create term definition step 13.5: reverse terms
    # may carry only @set/@index containers.
    code = "invalid reverse property"


class InvalidIRIMapping(JsonLdError):
    # [spec] 1.1 API create term definition steps 13.2/14.1: @id /
    # @reverse in a term definition must be strings.
    code = "invalid IRI mapping"


class CyclicIRIMapping(JsonLdError):
    # [spec] 1.1 API create term definition step 4: a term definition
    # depending (transitively) on itself as a CURIE prefix.
    code = "cyclic IRI mapping"


class InvalidPropagateValue(JsonLdError):
    # [spec] 1.1 API context processing step 5.11.2.
    code = "invalid @propagate value"


class CollidingKeywords(JsonLdError):
    # [spec] 1.1 API expansion step 13.4.2: two raw keys (keyword +
    # alias, or two aliases) expanding to the same keyword — only
    # @type and @included merge (sweep 9: expansion kept the LAST @id
    # while to_rdf kept the FIRST, a silent divergence).
    code = "colliding keywords"


class InvalidTypeMapping(JsonLdError):
    # [spec] 1.1 API create-term-definition step 17.1: a term's @type
    # must be a string (sweep 36: a list crashed IRI expansion raw).
    code = "invalid type mapping"


class InvalidVersionValue(JsonLdError):
    # [spec] 1.1 API context processing step 5.5.1: @version must be
    # the number 1.1 exactly (sweep 9: any other value was silently
    # accepted).
    code = "invalid @version value"


class InvalidDefaultLanguage(JsonLdError):
    # [spec] 1.1 API context processing step 5.9.2: a non-string,
    # non-null default @language (sweep 9: was silently nulled).
    code = "invalid default language"


class InvalidLanguageMapping(JsonLdError):
    # [spec] 1.1 API create term definition step 16.1: a term's
    # @language must be a string or null (sweep 9: was silently nulled).
    code = "invalid language mapping"


class InvalidKeywordAlias(JsonLdError):
    # [spec] 1.1 API create term definition: aliasing @context is not
    # permitted (sweep 9: the alias was silently registered).
    code = "invalid keyword alias"


class InvalidPrefixValue(JsonLdError):
    # [spec] 1.1 API create term definition step 12.2: @prefix must be
    # a boolean (sweep 9: truthiness was silently coerced).
    code = "invalid @prefix value"


class InvalidEmbedValue(JsonLdError):
    # [spec] JSON-LD 1.1 Framing §2.2 / framing API: @embed takes
    # @always/@once/@never.
    code = "invalid @embed value"


class InvalidFrame(JsonLdError):
    # [spec] JSON-LD 1.1 Framing: the frame must be a map.
    code = "invalid frame"


class ConflictingIndexes(JsonLdError):
    """[spec] JLD-API expansion step 13.8.3.7.2: an item in an @index
    container map carries its own @index differing from the map key."""
    code = "conflicting indexes"


class InvalidAnnotation(JsonLdError):
    # [spec] JSON-LD-star draft ("invalid annotation"): @annotation is
    # only legal on an embedded value/node under a (non-reverse)
    # property — never top-level, in @graph/@included/@list position,
    # or carrying @id/@value/@list content.
    code = "invalid annotation"


class InvalidEmbeddedNode(JsonLdError):
    # [spec] JSON-LD-star draft ("invalid embedded node"): an embedded
    # node (@id whose value is a map) must describe exactly ONE triple:
    # one property (or @type) with one value, no @annotation inside.
    code = "invalid embedded node"
