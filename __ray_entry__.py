"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in any library code these
callables use (``raykg`` never initialises Ray).

``entry()`` runs the flagship extract→link→canonicalize→materialize KG
pipeline over the deterministic synthetic source-code corpus derived from
sf0.001 (shape per BASELINE.json.input_hint) and returns the triples
Dataset.  ``queries()`` exposes one callable per implemented operator from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL over the same
deterministic parquet inputs.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


def entry() -> Any:
    """Flagship pipeline on sf0.001; returns the triples Dataset."""
    from raykg.pipelines import queries as Q
    return Q.q_kg_triples(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from raykg.pipelines import queries as Q
    return dict(Q.QUERY_FNS)


def oracle_sql() -> dict[str, str]:
    from raykg.pipelines import queries as Q
    from raykg.sources import synthetic_corpus as sc
    # the driver compares at sf0.01 — make sure the deterministic corpus
    # parquet the SQL reads exists before DuckDB runs
    sc.generate(SF_CORRECTNESS)
    out = {}
    for name in Q.QUERY_FNS:
        try:
            out[name] = Q.oracle_for(name, SF_CORRECTNESS)
        except KeyError:
            pass    # rows-only check for non-SQL-expressible ops
    return out
