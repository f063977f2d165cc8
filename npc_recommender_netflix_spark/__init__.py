"""npc-recommender-netflix-spark: PySpark-native analytics engine.

Public API:

    from npc_recommender_netflix_spark import build_session, load_table, run, list_queries

    spark = build_session()
    df = run("a_groupby", spark, "/root/testdata/sf0.01")   # any SURVEY §2 key
    matrix = load_table(spark, sf_dir, "events")            # ns-ts recipe applied

See SURVEY.md §2 for the operator inventory and README.md for design notes.
"""

from __future__ import annotations

from .session import build_session, load_table, prepare, tables  # noqa: F401


def list_queries() -> dict[str, str]:
    """All registered query keys -> 'sql-oracle' | 'rows-only'."""
    from . import registry

    registry.load_all()
    return {
        k: ("sql-oracle" if k in registry.ORACLE else "rows-only")
        for k in sorted(registry.QUERIES)
    }


def run(key: str, spark, sf_dir: str):
    """Run one registered operator; returns its DataFrame (lazy)."""
    from . import registry

    registry.load_all()
    if key not in registry.QUERIES:
        import difflib

        hint = difflib.get_close_matches(key, registry.QUERIES, n=3)
        raise KeyError(f"unknown query {key!r}; did you mean {hint}?")
    return registry.QUERIES[key](spark, sf_dir)
