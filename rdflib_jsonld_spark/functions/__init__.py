"""Reusable column-level functions (SURVEY.md §2.H scalar families).

All JVM-side (`pyspark.sql.functions` compositions) so they stay inside
whole-stage codegen; the Python twins live in the pure core
(jsonld/context.py norm_url/split_iri) for UDF-side use.
"""

from .iri import (bnode_label, is_bnode, iri_local_name, iri_namespace,
                  quad_identity_hash)

__all__ = ["iri_namespace", "iri_local_name", "is_bnode", "bnode_label",
           "quad_identity_hash"]
