"""Driver-contract surface hygiene across the split contract modules
(rdflib_jsonld_spark/contract/{kg,relational,docs}.py + the thin
__spark_entry__.py): every `def q_*` is registered exactly once under
its un-prefixed name, nothing is shadowed by a duplicate def or a
duplicate dict key, and every oracle has a queries() twin. (VERDICT
r03: a duplicated q_lineitem_cube def was invisible for a round — this
pins the invariant.) No Spark session needed."""

import ast
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry
from rdflib_jsonld_spark.contract import docs, kg, relational

MODULES = [entry, kg, relational, docs]


def _q_defs(mod):
    tree = ast.parse(Path(mod.__file__).read_text())
    return [n.name for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            and n.name.startswith("q_")]


def _dict_keys(mod, dict_name):
    """Raw key list of a module-level dict literal (duplicates kept —
    the runtime dict silently drops them, which is the bug class)."""
    tree = ast.parse(Path(mod.__file__).read_text())
    for n in tree.body:
        if isinstance(n, ast.Assign) and any(
                getattr(t, "id", None) == dict_name for t in n.targets):
            return [k.value for k in n.value.keys if k is not None]
    return []


def test_no_shadowed_q_defs():
    for mod in MODULES:
        dupes = {n: c for n, c in Counter(_q_defs(mod)).items() if c > 1}
        assert not dupes, f"{mod.__name__}: shadowed q_* defs: {dupes}"
    # ... and across modules (a def in two modules = import-order lottery)
    alln = [n for mod in MODULES for n in _q_defs(mod)]
    dupes = {n: c for n, c in Counter(alln).items() if c > 1}
    assert not dupes, f"q_* defs duplicated across modules: {dupes}"


def test_no_duplicate_registry_keys():
    for mod in (kg, relational, docs):
        for dname in ("QUERIES", "ORACLES"):
            keys = _dict_keys(mod, dname)
            dupes = {k: c for k, c in Counter(keys).items() if c > 1}
            assert not dupes, f"{mod.__name__}.{dname}: {dupes}"


def test_queries_names_are_exactly_the_q_defs():
    registered = set(entry.queries().keys())
    defined = {n[2:] for mod in MODULES for n in _q_defs(mod)}
    assert registered == defined, (
        f"unregistered defs: {sorted(defined - registered)}; "
        f"registry keys without a q_ def: {sorted(registered - defined)}")


def test_module_registries_map_their_own_defs():
    for mod in (kg, relational, docs):
        own = set(_q_defs(mod))
        for name, fn in mod.QUERIES.items():
            assert fn.__name__ == f"q_{name}", (name, fn.__name__)
            assert fn.__name__ in own, (
                f"{mod.__name__}.QUERIES[{name!r}] maps a foreign def")


def test_every_oracle_has_a_query():
    orphan = set(entry.oracle_sql()) - set(entry.queries())
    assert not orphan, f"oracle_sql keys without a query: {sorted(orphan)}"


def test_first_50_round_robins_domains():
    """The driver's CORRECTNESS gate samples queries()[:50]; pin that
    every domain appears there (VERDICT r04 'What's wrong #1')."""
    first50 = list(entry.queries())[:50]
    domains = {n.split("_", 1)[0] for n in first50}
    domains = {d if d in ("kg", "doc", "emb") else "other" for d in domains}
    assert domains == {"kg", "doc", "emb", "other"}, domains
    # and in real proportion, not a token appearance
    from collections import Counter
    c = Counter(n.split("_", 1)[0] if n.split("_", 1)[0] in ("kg", "doc", "emb")
                else "other" for n in first50)
    assert min(c.values()) >= 10, c
    # flagship stays first (entry() and queries()[0] agree)
    assert list(entry.queries())[0] == "kg_entity_counts_documents"
    # ordering is a pure reorder: same key set as the module registries
    from rdflib_jsonld_spark.contract import docs as d, kg as k, relational as r
    assert set(entry.queries()) == set(k.QUERIES) | set(r.QUERIES) | set(d.QUERIES)
    assert list(entry.queries()) == list(entry.oracle_sql())
