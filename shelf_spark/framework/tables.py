"""Table builds: SQL steps on Spark SQL, Python steps as subprocesses
(⇄ reference src/shelf/tables.py).

The step-authoring contract:

- **SQL step** ``src/steps/tables/<path>.sql``: each dependency is
  registered as a *temp view* under its simplified name and the template
  variable ``{name}`` substitutes the view name (the reference substitutes
  a file path DuckDB reads as a table — same surface, different binding;
  documented divergence, SURVEY §7.3). The SELECT's result is written as
  the table's Parquet output by the engine.
- **Python step** ``src/steps/tables/<path>.py``: executed as
  ``python script dep_path... output_path`` — byte-compatible with the
  reference's argv contract (tables.py:142-152), so existing scripts run
  unchanged. The script writes the Parquet itself.

Script lookup tries the full step path first, then the dataset path
without the version segment (reference table_metadata.py:207-224), so one
script can serve every version of a dataset.

Output layout note (SURVEY §7.3): Spark writes a *directory* of part
files. The output checksum is therefore a **canonical logical checksum**
— order-insensitive over rows + schema — not a byte hash; see
:func:`logical_checksum`.
"""

from __future__ import annotations

import datetime as dt
import subprocess
import sys
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import paths
from .exceptions import StepDefinitionError
from .snapshots import Snapshot
from .types import StepURI
from .utils import checksum_file, load_yaml
from .table_metadata import TableMetadata, generate_input_manifest, load_config

# ---------------------------------------------------------------------------
# Paths & script discovery
# ---------------------------------------------------------------------------


def dependency_data_path(uri: StepURI) -> Path:
    if uri.scheme == "snapshot":
        return Snapshot.load(uri).data_path
    return paths.table_data_path(uri.path)


def find_script(uri: StepURI) -> Path:
    """``<path>.py|.sql`` else ``<dataset_path>.py|.sql`` (version-generic)."""
    for base in (
        paths.TABLE_SCRIPTS_DIR / uri.path,
        paths.TABLE_SCRIPTS_DIR / uri.dataset_path,
    ):
        for suffix in (".py", ".sql"):
            cand = base.with_suffix(suffix)
            if cand.exists():
                return cand
    raise StepDefinitionError(f"no build script found for {uri}")


def config_path(uri: StepURI) -> Path:
    """Optional per-dataset config sidecar next to the script."""
    return find_script(uri).with_suffix(".meta.yaml")


# ---------------------------------------------------------------------------
# Dependency name simplification (⇄ reference tables.py:184-225)
# ---------------------------------------------------------------------------


def _candidate_names(uri: StepURI) -> list[str]:
    """dataset name, then progressively namespace-qualified, then
    version-qualified as a final tiebreaker."""
    parts = uri.dataset_path.split("/")
    names = []
    name = parts[-1]
    names.append(name)
    for p in reversed(parts[:-1]):
        name = f"{p}_{name}"
        names.append(name)
    names.append(f"{name}_{uri.version.replace('-', '')}")
    return names


def simplify_dependency_names(deps: list[StepURI]) -> dict[str, StepURI]:
    """Map short template names → deps, extending colliding names leftward
    until unique (raises on irresolvable collisions, e.g. identical paths)."""
    if len(set(deps)) != len(deps):
        raise StepDefinitionError(f"duplicate dependencies: {deps}")
    level = {d: 0 for d in deps}
    cands = {d: _candidate_names(d) for d in deps}
    while True:
        frontier: dict[StepURI, str] = {
            d: cands[d][min(level[d], len(cands[d]) - 1)] for d in deps
        }
        counts: dict[str, int] = {}
        for name in frontier.values():
            counts[name] = counts.get(name, 0) + 1
        dups = {d for d, n in frontier.items() if counts[n] > 1}
        if not dups:
            return {name: d for d, name in frontier.items()}
        progressed = False
        for d in dups:
            if level[d] < len(cands[d]) - 1:
                level[d] += 1
                progressed = True
        if not progressed:
            raise StepDefinitionError(f"cannot disambiguate dependency names: {deps}")


# ---------------------------------------------------------------------------
# Canonical logical checksum (SURVEY §7.3 decision)
# ---------------------------------------------------------------------------


def logical_checksum(df: DataFrame) -> str:
    """Order-insensitive content hash of a DataFrame + its schema.

    sum over rows of the first 15 hex chars of
    sha2(to_json(struct(*cols)), 256) (as a 60-bit int, exact in
    decimal(38)), combined with the schema DDL and row count. Partition
    order and row order cannot affect it, so Spark's nondeterministic
    part-file layout doesn't break the Merkle dirty-check. One extra
    aggregate job per build — distributed, no driver materialization.
    """
    import hashlib

    cols = df.columns
    row_hash = F.conv(
        F.substring(F.sha2(F.to_json(F.struct(*[F.col(c) for c in cols])), 256), 1, 15),
        16,
        10,
    ).cast("decimal(38,0)")
    agg = df.agg(
        F.coalesce(F.sum(row_hash), F.lit(0)).alias("s"), F.count("*").alias("n")
    ).collect()[0]
    basis = f"{df.schema.simpleString()}|{agg['n']}|{agg['s']}"
    return hashlib.sha256(basis.encode()).hexdigest()


# ---------------------------------------------------------------------------
# Freshness (⇄ reference tables.py:21-48)
# ---------------------------------------------------------------------------


def is_completed(uri: StepURI, deps: list[StepURI]) -> bool:
    """Output + sidecar exist and every input_manifest entry rechecksums
    identically (script, config, dep sidecars — the Merkle edge set)."""
    out = paths.table_data_path(uri.path)
    meta = paths.table_metadata_path(uri.path)
    if not out.exists() or not meta.exists():
        return False
    try:
        recorded = load_yaml(meta).get("input_manifest", {})
        current = generate_input_manifest(uri, deps)
    except Exception:
        return False
    return recorded == current


# ---------------------------------------------------------------------------
# Build (⇄ reference tables.py:51-181)
# ---------------------------------------------------------------------------


def build_table(spark: SparkSession, uri: StepURI, deps: list[StepURI]) -> None:
    # Resolve to absolute: the Spark JVM's working directory does not follow
    # Python's os.chdir, so relative paths would resolve against the wrong dir.
    out = paths.table_data_path(uri.path).resolve()
    out.parent.mkdir(parents=True, exist_ok=True)
    script = find_script(uri)

    started = dt.datetime.now(dt.timezone.utc)
    t0 = time.monotonic()
    if script.suffix == ".sql":
        partition_state = _exec_sql_step(spark, uri, script, deps, out)
    else:
        _exec_python_step(script, deps, out)
        partition_state = None
    if not out.exists():
        raise StepDefinitionError(f"step produced no output at {out}")

    df = spark.read.parquet(str(out))
    runtime = {
        "started_at": started.isoformat(),
        "duration_seconds": round(time.monotonic() - t0, 2),
        "spark_version": spark.version,
    }
    meta = TableMetadata.for_step(uri, deps)
    result = meta.validate_df(df)
    if not result.ok:
        # failed validation unlinks the output so the step stays dirty
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        out.unlink(missing_ok=True)
        spark.sql(f"DROP TABLE IF EXISTS {catalog_table_name(uri)}")
        raise StepDefinitionError(
            f"validation failed for {uri}:\n" + "\n".join(result.errors)
        )
    meta.write_sidecar(
        uri, deps, df, logical_checksum(df), runtime, partition_state=partition_state
    )


def catalog_table_name(uri: StepURI) -> str:
    """Session-catalog name for a table step's output (bucketed tables must
    live in the catalog — bucket metadata has no parquet representation)."""
    return "shelf_" + uri.path.replace("/", "_").replace("-", "_").replace(".", "_")


def _dep_view_df(spark: SparkSession, dep: StepURI) -> DataFrame:
    """Prefer the catalog entry for table deps: when the dep opted into
    bucketing, reading it by name keeps the bucket layout visible to the
    planner (a path read would silently discard it and re-shuffle)."""
    if dep.scheme == "table":
        cname = catalog_table_name(dep)
        if spark.catalog.tableExists(cname):
            return spark.table(cname)
    return _read_any(spark, dependency_data_path(dep))


def _partition_fingerprints(df: DataFrame, part_col: str) -> dict[str, str]:
    """Order-insensitive content fingerprint per partition value: the same
    row-hash-sum construction as :func:`logical_checksum`, grouped by the
    partition column — one distributed aggregate over the dep, no driver
    materialization beyond |partitions| rows."""
    cols = df.columns
    row_hash = F.conv(
        F.substring(F.sha2(F.to_json(F.struct(*[F.col(c) for c in cols])), 256), 1, 15),
        16,
        10,
    ).cast("decimal(38,0)")
    rows = (
        df.groupBy(F.col(part_col).cast("string").alias("_p"))
        .agg(F.sum(row_hash).alias("s"), F.count("*").alias("n"))
        .collect()
    )
    return {r["_p"]: f"{r['s']}|{r['n']}" for r in rows}


def _exec_sql_step(
    spark: SparkSession, uri: StepURI, script: Path, deps: list[StepURI], out: Path
) -> dict[str, str] | None:
    # Temp views are session-global, and the DAG executor builds steps
    # concurrently on one session: a view named only after the dep's
    # simplified name (dep_data) would be overwritten by a concurrent build
    # whose dep simplifies identically (a/data vs b/data, or two versions of
    # one dataset), silently feeding this step the wrong input. A per-build
    # random suffix makes each registration private; the template only ever
    # sees `{name}`, so scripts are unaffected. Views are dropped afterwards
    # so they can't leak into later ad-hoc queries.
    import uuid

    cfg = load_config(uri)
    bucketing = cfg.get("bucketing")
    incremental = cfg.get("incremental")
    if bucketing and incremental:
        raise StepDefinitionError(
            f"{uri}: bucketing and incremental are mutually exclusive"
        )

    names = simplify_dependency_names(deps)
    build_id = uuid.uuid4().hex[:12]
    template_vars: dict[str, str] = {}
    views: list[str] = []
    partition_state: dict[str, str] | None = None
    try:
        dep_dfs = {name: _dep_view_df(spark, dep) for name, dep in names.items()}

        changed: list[str] | None = None  # None → full build
        if incremental:
            # Partition-wise incremental rebuild (the dbt-style contract:
            # when deps are filtered to a set of partitions, the SELECT must
            # produce exactly those partitions' output rows). The engine
            # fingerprints every dep partition, diffs against the sidecar's
            # recorded state, narrows the dep views to changed partitions,
            # and dynamic-partition-overwrites only those directories. A
            # 100 TB table with one new day rebuilds one day.
            part_col = incremental["partition_by"]
            partition_state = {}
            for ddf in dep_dfs.values():
                if part_col in ddf.columns:
                    for k, v in _partition_fingerprints(ddf, part_col).items():
                        partition_state[k] = (
                            partition_state[k] + "+" + v
                            if k in partition_state
                            else v
                        )
            prior: dict[str, str] = {}
            meta_path = paths.table_metadata_path(uri.path)
            if out.exists() and meta_path.exists():
                prior = (load_yaml(meta_path) or {}).get("partition_state", {})
            if prior:
                changed = sorted(
                    k for k, v in partition_state.items() if prior.get(k) != v
                )
                removed = sorted(k for k in prior if k not in partition_state)
                import shutil

                for k in removed:  # partitions gone from every dep
                    shutil.rmtree(out / f"{part_col}={k}", ignore_errors=True)
                if not changed:
                    return partition_state  # nothing to rebuild
                for name, ddf in dep_dfs.items():
                    if part_col in ddf.columns:
                        dep_dfs[name] = ddf.filter(
                            F.col(part_col).cast("string").isin(changed)
                        )

        for name in names:
            view = f"dep_{name}_{build_id}"
            dep_dfs[name].createOrReplaceTempView(view)
            views.append(view)
            template_vars[name] = view
        sql = script.read_text().format(**template_vars)
        df = spark.sql(sql)
        if bucketing:
            # Bucketed output: hash-partitioned files + catalog metadata, so
            # downstream joins/aggs on the bucket keys plan with zero
            # exchanges (see shelf_spark/optimize.py for the sizing notes).
            # saveAsTable with an explicit path keeps the data external at
            # the step's normal output location.
            writer = df.write.mode("overwrite").bucketBy(
                bucketing["num_buckets"], *bucketing["keys"]
            )
            if bucketing.get("sort"):
                writer = writer.sortBy(*bucketing["sort"])
            cname = catalog_table_name(uri)
            spark.sql(f"DROP TABLE IF EXISTS {cname}")
            writer.format("parquet").option("path", str(out)).saveAsTable(cname)
        elif incremental:
            part_col = incremental["partition_by"]
            if part_col not in df.columns:
                raise StepDefinitionError(
                    f"{uri}: incremental step output lacks partition column {part_col}"
                )
            # per-write option — no session-wide conf mutation, so concurrent
            # non-incremental builds are unaffected
            (
                df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(part_col)
                .parquet(str(out))
            )
        else:
            df.write.mode("overwrite").parquet(str(out))
        return partition_state
    finally:
        for view in views:
            spark.catalog.dropTempView(view)


def _exec_python_step(script: Path, deps: list[StepURI], out: Path) -> None:
    # reference argv contract: script dep1 … depN out (tables.py:142-152)
    argv = [sys.executable, str(script.resolve())]
    argv += [str(dependency_data_path(d).resolve()) for d in deps]
    argv.append(str(out.resolve()))
    subprocess.run(argv, check=True)


def _read_any(spark: SparkSession, path: Path) -> DataFrame:
    """Read a dependency: parquet tables, or csv/json/text snapshots."""
    path = path.resolve()  # Spark JVM cwd does not follow Python os.chdir
    suffix = path.suffix.lower()
    if suffix == ".orc":
        return spark.read.orc(str(path))
    if suffix in {".parquet", ""} or path.is_dir():
        return spark.read.parquet(str(path))
    if suffix == ".csv":
        return spark.read.csv(str(path), header=True, inferSchema=True)
    if suffix in {".json", ".jsonl", ".ndjson"}:
        return spark.read.json(str(path))
    return spark.read.text(str(path))
