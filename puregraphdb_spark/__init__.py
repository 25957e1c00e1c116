"""puregraphdb_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference system ``doofin/pureGraphdb`` (a graph
database whose analytical side fits the GraphX model — see SURVEY.md §0:
the reference repo is unavailable in this environment, so the contract is
SURVEY.md §2's operator inventory, validated against a DuckDB oracle).

Design principles (SURVEY.md §4, §7.3):

- Everything is a DataFrame with an explicit schema; graphs are pairs of
  DataFrames (vertices, edges) — immutable values, like the reference's
  pure/functional store.
- Declare logical plans via the DataFrame/SQL API and let Catalyst pick
  physical strategies (pushdown, pruning, broadcast, AQE).
- No Python row-level UDFs in any hot path; vector math uses built-in
  higher-order functions; optional extensions use Arrow-batched pandas
  UDFs only.
- No ``collect()`` inside operators — only callers/tests materialize.
"""

from puregraphdb_spark.engine import Engine, get_session
from puregraphdb_spark.operators.graph import Graph

__all__ = ["Engine", "Graph", "get_session"]
__version__ = "0.1.0"
