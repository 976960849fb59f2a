"""Driver-contract surface hygiene: every `def q_*` in
__spark_entry__.py is registered in queries() under its un-prefixed
name, nothing is silently shadowed by a duplicate def, and every
oracle_sql() key has a queries() twin. (VERDICT r03: a duplicated
q_lineitem_cube def was invisible for a round — this pins the
invariant.) No Spark session needed: queries() returns plain
callables."""

import ast
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry

ENTRY_SRC = Path(entry.__file__).read_text()


def _q_defs():
    tree = ast.parse(ENTRY_SRC)
    return [n.name for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            and n.name.startswith("q_")]


def test_no_shadowed_q_defs():
    dupes = {n: c for n, c in Counter(_q_defs()).items() if c > 1}
    assert not dupes, f"duplicate q_* defs shadow each other: {dupes}"


def test_queries_names_are_exactly_the_q_defs():
    registered = set(entry.queries().keys())
    defined = {n[2:] for n in _q_defs()}
    assert registered == defined, (
        f"unregistered defs: {sorted(defined - registered)}; "
        f"registry keys without a q_ def: {sorted(registered - defined)}")


def test_queries_map_to_their_own_def():
    for name, fn in entry.queries().items():
        assert fn.__name__ == f"q_{name}", (name, fn.__name__)


def test_every_oracle_has_a_query():
    orphan = set(entry.oracle_sql()) - set(entry.queries())
    assert not orphan, f"oracle_sql keys without a query: {sorted(orphan)}"
