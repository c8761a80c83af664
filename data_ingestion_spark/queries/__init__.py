"""Query battery for the driver contract (__spark_entry__.py).

Each module exposes a ``QUERIES`` registry: ``{name: (spark_fn, oracle_sql)}``
where ``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the
equivalent ANSI SQL for the DuckDB correctness oracle (or ``None`` for
non-SQL-expressible operators, which get a rows-only check).
"""

from __future__ import annotations


def merged_queries() -> dict:
    """All query registries merged — the single source for __spark_entry__."""
    from . import advanced, ingestion, relational, tpch, tpch2

    out: dict = {}
    out.update(relational.QUERIES)
    out.update(tpch.QUERIES)
    out.update(tpch2.QUERIES)
    out.update(advanced.QUERIES)
    out.update(ingestion.QUERIES)
    try:
        from ..operators import registry as ops_registry

        out.update(ops_registry.QUERIES)
    except ImportError:
        pass
    return out
