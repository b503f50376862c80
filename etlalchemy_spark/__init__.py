"""etlalchemy_spark — a PySpark-native ETL & analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
framework ``seanharr11/etlalchemy`` (schema reflection, rule-driven schema
transformation, data-driven type standardization, bulk extract/load,
index/FK DDL epilogues — see SURVEY.md Table A) on the Spark DataFrame
API, plus a full relational operator layer, Structured Streaming
operators, and LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns — SURVEY.md Table B).

Design rules (100 TB mandate):
- DataFrame/SQL only; no RDDs, no driver-side ``collect()`` in any data
  path. Catalyst/AQE own physical planning.
- Per-column statistics are computed in ONE aggregate pass per table.
- Small dimension tables are broadcast; big joins shuffle on their keys.
- Python appears only in Arrow-batched Pandas UDFs, never per-row.
"""

__version__ = "0.1.0"

from etlalchemy_spark.session import get_spark  # noqa: F401
from etlalchemy_spark.catalog import load_tables, TABLE_NAMES  # noqa: F401
