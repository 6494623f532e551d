"""linux_logs_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capability surface of the
reference log-analytics project (``CarlosVilleags/Linux-Logs``: system
log analyzer consolidating logs into a searchable database — see
SURVEY.md §0; the reference tree was empty this session, so the
capability inventory in SURVEY.md §2 is the authoritative contract),
extended with LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis).

Design principles (SURVEY.md §4):
- DataFrame / Spark SQL everywhere; no RDDs.
- Let Catalyst optimize: sargable filters, explicit broadcasts for
  small dims, AQE on, column pruning by construction.
- Python UDFs only where built-ins can't express the semantics, and
  then Arrow-vectorized (pandas_udf / applyInPandas / mapInPandas).
"""

from linux_logs_spark.registry import all_queries, get_query  # noqa: F401

__version__ = "0.1.0"
