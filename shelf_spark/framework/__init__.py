"""The framework layer: shelf's *native* capability, rebuilt for Spark.

Content-addressed snapshots, a Merkle DAG of versioned steps with lazy
incremental rebuild, YAML metadata sidecars with inheritance/validation,
and derived tables materialized as Parquet. All of it is driver-side
Python orchestrating a SparkSession; none of it touches Catalyst
(reference architecture fact: SURVEY.md §0).

Module map (⇄ reference, /root/reference/src/shelf):
- types.py          ⇄ types.py          (StepURI, Dag, Manifest, Schema)
- utils.py          ⇄ utils.py          (checksums, YAML IO, gitignore)
- paths.py          ⇄ paths.py          (relative layout)
- core.py           ⇄ core.py           (shelf.yaml catalog)
- store.py          ⇄ snapshots.py:216-309 (content store + local cache)
- snapshots.py      ⇄ snapshots.py      (ingest/fetch/freshness)
- steps.py          ⇄ steps.py          (DAG pruning + execution)
- tables.py         ⇄ tables.py         (SQL/Python step builds — on Spark)
- table_metadata.py ⇄ table_metadata.py (sidecars, inheritance, validation)
- query.py          ⇄ __init__.py:364-489 (ad-hoc query, aliases)
- cli.py            ⇄ __init__.py:56-185 (subcommands)
"""
