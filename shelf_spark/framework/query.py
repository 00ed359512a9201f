"""Ad-hoc query layer: view naming, aliases, `db` queries and export
(⇄ reference src/shelf/__init__.py:285-489).

Every built table is exposed as a Spark temp view:
- **full name**: the step path with ``/`` → ``_``, ``-`` dropped,
  extension stripped (reference `_path_to_snake`, __init__.py:434-445);
- **short alias**: the shortest unique path suffix, preferring the
  unversioned form (``prices`` over ``prices_20240726``); conflicts
  extend leftward (reference `_table_aliases`, __init__.py:447-489).

Single-token query sugar: a query with no whitespace is shorthand for
``SELECT * FROM <token>`` (reference __init__.py:389-391).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from . import paths
from .core import Shelf
from .types import StepURI


def path_to_snake(path: str) -> str:
    """``ns/some-ds/2024-07-26`` → ``ns_someds_20240726``."""
    return path.replace("-", "").replace("/", "_").removesuffix(".parquet")


def _suffix_names(path: str) -> list[str]:
    """Candidate aliases: shortest path suffix first, then longer; each in
    unversioned form first, versioned second."""
    parts = path.split("/")
    version = parts[-1]
    dataset_parts = parts[:-1]
    out: list[str] = []
    for i in range(len(dataset_parts) - 1, -1, -1):
        base = "_".join(p.replace("-", "") for p in dataset_parts[i:])
        out.append(base)
        out.append(f"{base}_{version.replace('-', '')}")
    return out


def table_aliases(tables: list[str]) -> dict[str, str]:
    """alias → full snake name for every table path; each table gets its
    shortest candidate that no *other* table's candidate set claims."""
    cands = {t: _suffix_names(t) for t in tables}
    taken: dict[str, int] = {}
    for t, names in cands.items():
        for n in names:
            taken[n] = taken.get(n, 0) + 1
    aliases: dict[str, str] = {}
    for t, names in cands.items():
        full = path_to_snake(t)
        for n in names:
            if taken[n] == 1:
                if n != full:
                    aliases[n] = full
                break
    return aliases


def built_tables(shelf: Shelf) -> list[str]:
    """Paths of table steps whose parquet output exists."""
    return sorted(
        s.path for s in shelf.steps if s.scheme == "table" and paths.table_data_path(s.path).exists()
    )


def register_shelf_views(
    spark: SparkSession, shelf: Shelf, names: str = "both"
) -> dict[str, str]:
    """Create a temp view per built table (+ alias views per policy).
    Returns {view_name: table_path}."""
    tables = built_tables(shelf)
    views: dict[str, str] = {}
    full_names = {t: path_to_snake(t) for t in tables}
    for t, full in full_names.items():
        # resolve(): the Spark JVM's cwd does not follow Python os.chdir
        df = spark.read.parquet(str(paths.table_data_path(t).resolve()))
        if names in ("full", "both"):
            df.createOrReplaceTempView(full)
            views[full] = t
    if names in ("short", "both"):
        for alias, full in table_aliases(tables).items():
            t = next(p for p, f in full_names.items() if f == full)
            df = spark.read.parquet(str(paths.table_data_path(t).resolve()))
            df.createOrReplaceTempView(alias)
            views[alias] = t
    return views


def execute_query(
    spark: SparkSession,
    shelf: Shelf,
    query: str,
    names: str = "both",
    csv: bool = False,
    out=None,
) -> DataFrame:
    """Run SQL over the shelf's tables; emit JSON records (default) or CSV
    (reference execute_query, __init__.py:364-400)."""
    if out is None:
        out = sys.stdout  # bind at call time (pytest capsys swaps stdout)
    register_shelf_views(spark, shelf, names)
    if not any(ch.isspace() for ch in query.strip()):
        query = f"SELECT * FROM {query.strip()}"
    df = spark.sql(query)
    rows = df.toPandas()
    if csv:
        out.write(rows.to_csv(index=False))
    else:
        out.write(json.dumps(json.loads(rows.to_json(orient="records")), indent=2))
        out.write("\n")
    return df


def export_tables(
    spark: SparkSession, shelf: Shelf, dest: Path, short_names: bool = False
) -> list[str]:
    """Export every built table into a DuckDB database file — byte-level
    parity with the reference's `export-duckdb` (reference
    __init__.py:285-312); Spark-native deployments would `saveAsTable`
    into a warehouse instead."""
    import duckdb

    con = duckdb.connect(str(dest))
    exported = []
    tables = built_tables(shelf)
    aliases = {full: alias for alias, full in table_aliases(tables).items()}
    for t in tables:
        name = path_to_snake(t)
        if short_names and name in aliases:
            name = aliases[name]
        data = paths.table_data_path(t)
        src = str(data / "*.parquet") if data.is_dir() else str(data)
        con.execute(
            f'CREATE OR REPLACE TABLE "{name}" AS SELECT * FROM read_parquet(?)', [src]
        )
        exported.append(name)
    con.close()
    return exported
