"""sparketl — a PySpark-native analytics / data-integration engine.

A from-scratch rebuild of the query and data-processing capabilities of
``calimangto119/SQL_DATA_INTEGRATION_TOOL`` (a thin pyodbc client over
SQL Server; see /root/repo/SURVEY.md), re-expressed Spark-first:

- data plane is DataFrame + Spark SQL end-to-end (no RDDs),
- Catalyst/AQE provide the optimizer (pushdown, pruning, join selection),
- mutable "managed tables" are copy-on-write Parquet with a version
  pointer (Delta-style semantics without the Delta jars),
- the reference's T-SQL spellings are handled by a small dialect shim,
- [EXT] LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing) are built on the same DataFrame core.
"""

from sparketl.session import get_spark  # noqa: F401
from sparketl.io import load_tables, TABLE_NAMES  # noqa: F401

__version__ = "0.1.0"
