"""Pure-Python JSON-LD core (no Spark, no rdflib, no I/O).

This package is the semantic kernel shared by the Spark UDF stages and the
test oracle. It mirrors the module layout of the reference
([v0.5.0] rdflib_jsonld/{keys,context,parser,serializer,util,errors}.py —
module names evidenced by /root/reference/setup.py:104-113 and
docs/jsonld-parser.rst:43-50; see SURVEY.md §0/§2) but every line here is a
fresh implementation of the W3C JSON-LD 1.0/1.1 Processing Algorithms.
"""

from .context import Context, Term, UNDEF
from .tordf import to_rdf
from .fromrdf import from_rdf
from .expansion import expand
from .flatten import flatten
from .compact import compact

__all__ = ["Context", "Term", "UNDEF", "to_rdf", "from_rdf",
           "expand", "flatten", "compact"]
