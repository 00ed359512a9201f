"""shelf_spark — a PySpark-native personal ETL engine and data lake.

A from-scratch rebuild of the capabilities of ``larsyencken/shelf``
(reference: /root/reference) on Apache Spark:

- the *framework* layer (content-addressed snapshots, Merkle DAG of
  versioned steps, metadata sidecars, incremental rebuild) lives in
  :mod:`shelf_spark.framework` as driver-side Python;
- the *query* layer (the SQL surface shelf delegates to DuckDB —
  reference ``src/shelf/tables.py:155-181``, ``src/shelf/__init__.py:364-400``)
  is re-provided through Spark SQL / the DataFrame API in
  :mod:`shelf_spark.queries`, extended with event-window, dedup,
  text-analysis and vector-similarity operators designed for cluster scale.
"""

__version__ = "0.1.0"
