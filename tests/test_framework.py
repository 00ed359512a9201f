"""Framework-layer tests: pure functions + end-to-end build cycle in a
tmp shelf (mirrors the reference's test strategy, SURVEY §5: e2e through
a real — here local-FS — object store)."""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import pytest

from shelf_spark.framework.core import Shelf
from shelf_spark.framework.exceptions import StepDefinitionError
from shelf_spark.framework.query import path_to_snake, table_aliases
from shelf_spark.framework.tables import simplify_dependency_names
from shelf_spark.framework.types import StepURI, is_valid_version
from shelf_spark.framework.utils import (
    checksum_file,
    checksum_folder,
    checksum_manifest,
)


# -- pure functions ----------------------------------------------------------


def test_step_uri_parse_and_order():
    a = StepURI.parse("snapshot://ns/ds/2024-01-01")
    assert (a.scheme, a.path) == ("snapshot", "ns/ds/2024-01-01")
    assert a.version == "2024-01-01"
    assert a.dataset_path == "ns/ds"
    assert str(a) == "snapshot://ns/ds/2024-01-01"
    # lexicographic order: later dates, then `latest`, sort last
    b = StepURI.parse("snapshot://ns/ds/2024-02-01")
    latest = StepURI.parse("snapshot://ns/ds/latest")
    assert a < b < latest
    with pytest.raises(StepDefinitionError):
        StepURI.parse("bogus://x/y")
    with pytest.raises(StepDefinitionError):
        StepURI.parse("not a uri")


def test_is_valid_version():
    assert is_valid_version("2024-07-26")
    assert is_valid_version("latest")
    assert not is_valid_version("v1")
    assert not is_valid_version("2024-7-6")


def test_checksums(tmp_path):
    f = tmp_path / "a.txt"
    f.write_bytes(b"hello world\n")
    assert checksum_file(f) == hashlib.sha256(b"hello world\n").hexdigest()

    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.txt").write_bytes(b"bbb")
    (tmp_path / ".DS_Store").write_bytes(b"junk")  # ignored
    manifest = checksum_folder(tmp_path)
    assert set(manifest) == {"a.txt", "sub/b.txt"}
    # digest is deterministic and order-insensitive over dict ordering
    d1 = checksum_manifest(manifest)
    d2 = checksum_manifest(dict(reversed(list(manifest.items()))))
    assert d1 == d2 and len(d1) == 64


def test_path_to_snake_and_aliases():
    assert path_to_snake("ns/some-ds/2024-07-26") == "ns_someds_20240726"
    # unique dataset gets its unversioned short alias
    aliases = table_aliases(["ns/prices/2024-07-26"])
    assert aliases == {"prices": "ns_prices_20240726"}
    # two versions of the same dataset: alias must qualify by version
    aliases = table_aliases(["ns/prices/2024-07-26", "ns/prices/2024-08-01"])
    assert aliases["prices_20240726"] == "ns_prices_20240726"
    assert aliases["prices_20240801"] == "ns_prices_20240801"
    assert "prices" not in aliases
    # same dataset name in two namespaces: alias extends leftward
    aliases = table_aliases(["a/prices/2024-07-26", "b/prices/2024-07-26"])
    assert aliases["a_prices"] == "a_prices_20240726"
    assert aliases["b_prices"] == "b_prices_20240726"


def test_simplify_dependency_names():
    deps = [StepURI.parse("table://ns/customers/2024-01-01")]
    assert simplify_dependency_names(deps) == {"customers": deps[0]}
    # collision on dataset name → qualify with namespace
    deps = [
        StepURI.parse("table://a/prices/2024-01-01"),
        StepURI.parse("table://b/prices/2024-01-01"),
    ]
    names = simplify_dependency_names(deps)
    assert names == {"a_prices": deps[0], "b_prices": deps[1]}
    # same path twice is irresolvable
    with pytest.raises(StepDefinitionError):
        simplify_dependency_names([deps[0], deps[0]])


def test_latest_resolution(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    shelf = Shelf.init()
    shelf.add_step(StepURI.parse("snapshot://ns/raw/2024-01-01"))
    shelf.add_step(StepURI.parse("snapshot://ns/raw/2024-03-01"))
    shelf.add_step(
        StepURI.parse("table://ns/out/2024-03-02"),
        [StepURI.parse("snapshot://ns/raw/latest")],
    )
    dag = shelf.resolve_latest()
    deps = dag[StepURI.parse("table://ns/out/2024-03-02")]
    assert deps == [StepURI.parse("snapshot://ns/raw/2024-03-01")]


# -- end-to-end build cycle --------------------------------------------------


@pytest.fixture()
def workspace(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("SHELF_STORE_DIR", str(tmp_path / ".store"))
    monkeypatch.setenv("SHELF_CACHE_DIR", str(tmp_path / ".cache"))
    return tmp_path


def test_snapshot_roundtrip(workspace):
    from shelf_spark.framework.snapshots import Snapshot

    raw = workspace / "input.csv"
    raw.write_text("x,y\n1,2\n3,4\n")
    snap = Snapshot.create(raw, "ns/raw/2024-01-01")
    assert snap.is_up_to_date()
    assert snap.metadata_path.exists()

    # delete the materialized copy; fetch() restores from the store
    snap.data_path.unlink()
    assert not snap.is_up_to_date()
    loaded = Snapshot.load(StepURI.parse("snapshot://ns/raw/2024-01-01"))
    loaded.fetch()
    assert loaded.is_up_to_date()
    assert loaded.data_path.read_text() == "x,y\n1,2\n3,4\n"


def test_directory_snapshot_roundtrip(workspace):
    from shelf_spark.framework.snapshots import Snapshot

    d = workspace / "rawdir"
    (d / "sub").mkdir(parents=True)
    (d / "a.txt").write_text("alpha")
    (d / "sub" / "b.txt").write_text("beta")
    snap = Snapshot.create(d, "ns/dir/2024-01-01")
    assert snap.snapshot_type == "directory"
    assert set(snap.manifest) == {"a.txt", "sub/b.txt"}

    # corrupt one file + add a stray; fetch restores manifest state
    (snap.data_path / "a.txt").write_text("corrupted")
    (snap.data_path / "stray.txt").write_text("stray")
    loaded = Snapshot.load(StepURI.parse("snapshot://ns/dir/2024-01-01"))
    assert not loaded.is_up_to_date()
    loaded.fetch()
    assert loaded.is_up_to_date()
    assert (loaded.data_path / "a.txt").read_text() == "alpha"
    assert not (loaded.data_path / "stray.txt").exists()


def test_build_cycle_sql_step(workspace, spark):
    """init → snapshot → sql table → run → incremental no-op → edit →
    rebuild (the reference's core loop, tests/test_shelf.py:320-358)."""
    from shelf_spark.framework.cli import main as cli
    from shelf_spark.framework.snapshots import Snapshot
    from shelf_spark.framework.steps import execute_dag, prune_completed
    from shelf_spark.framework import paths

    assert cli(["init"]) == 0
    raw = workspace / "numbers.csv"
    raw.write_text("n,label\n1,one\n2,two\n3,three\n")
    assert cli(["snapshot", str(raw), "ns/numbers/2024-01-01"]) == 0

    shelf = Shelf()
    shelf.new_table("ns/doubled/2024-01-02", ["snapshot://ns/numbers/2024-01-01"])
    shelf.save()
    script = paths.TABLE_SCRIPTS_DIR / "ns" / "doubled.sql"
    script.parent.mkdir(parents=True, exist_ok=True)
    script.write_text("SELECT n, n * 2 AS n2 FROM {numbers}")

    dag = prune_completed(Shelf().resolve_latest())
    assert dag, "table step should be dirty"
    execute_dag(spark, dag)

    out = paths.table_data_path("ns/doubled/2024-01-02")
    assert out.exists()
    rows = {tuple(r) for r in spark.read.parquet(str(out.resolve())).collect()}
    assert rows == {(1, 2), (2, 4), (3, 6)}
    sidecar = paths.table_metadata_path("ns/doubled/2024-01-02")
    assert sidecar.exists()

    # incremental: everything fresh → empty dag
    assert prune_completed(Shelf().resolve_latest()) == {}

    # editing the script dirties the step (Merkle edge via input_manifest)
    script.write_text("SELECT n, n * 3 AS n3 FROM {numbers}")
    dag = prune_completed(Shelf().resolve_latest())
    assert StepURI.parse("table://ns/doubled/2024-01-02") in dag
    execute_dag(spark, dag)
    rows = {tuple(r) for r in spark.read.parquet(str(out.resolve())).collect()}
    assert rows == {(1, 3), (2, 6), (3, 9)}


def test_build_cycle_python_step(workspace, spark):
    from shelf_spark.framework.steps import execute_dag, prune_completed
    from shelf_spark.framework import paths

    Shelf.init()
    raw = workspace / "vals.csv"
    raw.write_text("v\n10\n20\n")
    from shelf_spark.framework.snapshots import Snapshot

    Snapshot.create(raw, "ns/vals/2024-01-01")
    shelf = Shelf()
    shelf.add_step(StepURI.parse("snapshot://ns/vals/2024-01-01"))
    shelf.new_table("ns/squared/2024-01-02", ["snapshot://ns/vals/2024-01-01"])
    shelf.save()

    script = paths.TABLE_SCRIPTS_DIR / "ns" / "squared.py"
    script.parent.mkdir(parents=True, exist_ok=True)
    # reference argv contract: script dep1 … depN out
    script.write_text(
        "import sys, pandas as pd\n"
        "df = pd.read_csv(sys.argv[1])\n"
        "df['sq'] = df['v'] ** 2\n"
        "df.to_parquet(sys.argv[2])\n"
    )
    execute_dag(spark, prune_completed(Shelf().resolve_latest()))
    out = paths.table_data_path("ns/squared/2024-01-02")
    rows = {tuple(r) for r in spark.read.parquet(str(out.resolve())).collect()}
    assert rows == {(10, 100), (20, 400)}


def test_python_step_polars_style_parquet_interchange(workspace, spark):
    """E2E build whose step script writes Parquet with Polars' physical
    conventions — large_string / int64 / date32 / float64 (the reference's
    placeholder scripts write via Polars, README.md:77-91) — then a SQL
    step consumes that output. Pins interchange fidelity end-to-end: the
    argv contract (reference tables.py:142-152), Spark's read of the
    arrow-written file, dtype flow into the sidecar's simpleString schema
    vocabulary, and a golden frame through the downstream step. The script
    uses Polars when the interpreter has it and an identically-typed
    pyarrow writer otherwise (this container has no Polars)."""
    import yaml

    from shelf_spark.framework.steps import execute_dag, prune_completed
    from shelf_spark.framework import paths

    Shelf.init()
    shelf = Shelf()
    shelf.new_table("ns/catalog/2024-01-01", [])
    shelf.save()
    script = paths.TABLE_SCRIPTS_DIR / "ns" / "catalog.py"
    script.parent.mkdir(parents=True, exist_ok=True)
    script.write_text(
        "import sys\n"
        "rows = {'name': ['ash', 'birch', None],\n"
        "        'n': [1, 2, 3],\n"
        "        'price': [1.5, 2.25, 0.0]}\n"
        "days = [18262, 18263, None]  # 2020-01-01, 2020-01-02 as date32\n"
        "try:\n"
        "    import polars as pl\n"
        "    from datetime import date, timedelta\n"
        "    df = pl.DataFrame(rows).with_columns(\n"
        "        pl.Series('d', [date(1970, 1, 1) + timedelta(days=v)\n"
        "                        if v is not None else None for v in days]))\n"
        "    df.write_parquet(sys.argv[-1])\n"
        "except ModuleNotFoundError:\n"
        "    import pyarrow as pa, pyarrow.parquet as pq\n"
        "    # Polars' physical parquet types: Utf8→large_string,\n"
        "    # Int64→int64, Float64→double, Date→date32\n"
        "    t = pa.table({'name': pa.array(rows['name'], pa.large_string()),\n"
        "                  'n': pa.array(rows['n'], pa.int64()),\n"
        "                  'price': pa.array(rows['price'], pa.float64()),\n"
        "                  'd': pa.array(days, pa.date32())})\n"
        "    pq.write_table(t, sys.argv[-1])\n"
    )
    # downstream SQL step consumes the Python step's output via a temp view
    shelf = Shelf()
    shelf.new_table("ns/priced/2024-01-02", ["table://ns/catalog/2024-01-01"])
    shelf.save()
    sql = paths.TABLE_SCRIPTS_DIR / "ns" / "priced.sql"
    sql.write_text(
        "SELECT name, n * 2 AS n2, price, d FROM {catalog} WHERE name IS NOT NULL"
    )
    execute_dag(spark, prune_completed(Shelf().resolve_latest()))

    # dtype flow into the sidecar's schema vocabulary (N20)
    meta = yaml.safe_load(
        paths.table_metadata_path("ns/catalog/2024-01-01").read_text()
    )
    assert meta["schema"] == {
        "name": "string",
        "n": "bigint",
        "price": "double",
        "d": "date",
    }
    # golden frame through the downstream SQL step
    import datetime as dt

    out = paths.table_data_path("ns/priced/2024-01-02")
    got = {tuple(r) for r in spark.read.parquet(str(out.resolve())).collect()}
    assert got == {
        ("ash", 2, 1.5, dt.date(2020, 1, 1)),
        ("birch", 4, 2.25, dt.date(2020, 1, 2)),
    }


def test_sidecar_writes_empty_provenance_as_comments(workspace):
    """Unfilled provenance fields appear as '# key:' comment lines in the
    sidecar — the human-curation skeleton the reference writes (reference
    snapshots.py:131-139 + utils.py:76-94) — and YAML loaders skip them."""
    from shelf_spark.framework.snapshots import Snapshot

    raw = workspace / "input.csv"
    raw.write_text("x\n1\n")
    snap = Snapshot.create(raw, "ns/raw/2024-01-01", {"source_url": "http://example.com"})
    text = snap.metadata_path.read_text()
    assert "# description:" in text
    assert "# license:" in text
    # a provided field is written as real YAML, not a comment
    assert "source_url: http://example.com" in text
    assert "# source_url:" not in text
    loaded = Snapshot.load(StepURI.parse("snapshot://ns/raw/2024-01-01"))
    assert loaded.provenance.get("source_url") == "http://example.com"
    assert "description" not in loaded.provenance
    assert loaded.is_up_to_date()


def test_snapshot_edit_flag_opens_editor(workspace, monkeypatch):
    """--edit opens the written sidecar in $EDITOR (⇄ reference
    __init__.py:215-216's vim hook)."""
    from shelf_spark.framework.cli import main as cli
    from shelf_spark.framework import paths

    assert cli(["init"]) == 0
    raw = workspace / "e.csv"
    raw.write_text("x\n1\n")
    editor = workspace / "fake_editor.sh"
    log = workspace / "editor_calls.txt"
    editor.write_text(f'#!/bin/sh\necho "$1" >> {log}\n')
    editor.chmod(0o755)
    monkeypatch.setenv("EDITOR", str(editor))
    assert cli(["snapshot", str(raw), "ns/edited/2024-01-01", "--edit"]) == 0
    called_with = log.read_text().strip()
    assert called_with == str(paths.snapshot_metadata_path("ns/edited/2024-01-01"))
    # without --edit the editor is not invoked
    log.unlink()
    raw2 = workspace / "e2.csv"
    raw2.write_text("x\n2\n")
    assert cli(["snapshot", str(raw2), "ns/unedited/2024-01-01"]) == 0
    assert not log.exists()


def test_concurrent_sql_steps_colliding_dep_names(workspace, spark):
    """Two independent SQL steps whose deps simplify to the SAME short name
    ('data', from a/data and b/data) build concurrently on one session. Temp
    views are session-global, so without per-build unique view names one
    build would read the other's dependency. Each output must see only its
    own input, and no dep_* views may leak past the builds."""
    from shelf_spark.framework.snapshots import Snapshot
    from shelf_spark.framework.steps import execute_dag, prune_completed
    from shelf_spark.framework import paths

    Shelf.init()
    raw_a = workspace / "a.csv"
    raw_a.write_text("v\n1\n")
    raw_b = workspace / "b.csv"
    raw_b.write_text("v\n100\n")
    Snapshot.create(raw_a, "a/data/2024-01-01")
    Snapshot.create(raw_b, "b/data/2024-01-01")
    shelf = Shelf()
    shelf.add_step(StepURI.parse("snapshot://a/data/2024-01-01"))
    shelf.add_step(StepURI.parse("snapshot://b/data/2024-01-01"))
    shelf.new_table("a/out/2024-01-02", ["snapshot://a/data/2024-01-01"])
    shelf.new_table("b/out/2024-01-02", ["snapshot://b/data/2024-01-01"])
    shelf.save()
    for ns in ("a", "b"):
        script = paths.TABLE_SCRIPTS_DIR / ns / "out.sql"
        script.parent.mkdir(parents=True, exist_ok=True)
        script.write_text("SELECT v + 1 AS w FROM {data}")

    execute_dag(spark, prune_completed(Shelf().resolve_latest()), max_workers=4)

    rows_a = spark.read.parquet(
        str(paths.table_data_path("a/out/2024-01-02").resolve())
    ).collect()
    rows_b = spark.read.parquet(
        str(paths.table_data_path("b/out/2024-01-02").resolve())
    ).collect()
    assert [r.w for r in rows_a] == [2]
    assert [r.w for r in rows_b] == [101]
    leftover = [t.name for t in spark.catalog.listTables() if t.name.startswith("dep_")]
    assert leftover == []


def test_bucketed_table_steps_join_without_exchange(workspace, spark):
    """Table configs can opt into bucketing on a hot join key; two steps
    bucketed identically then join downstream with ZERO exchanges (the
    co-located-join contract from shelf_spark/optimize.py, exercised
    through the framework build path end-to-end)."""
    from shelf_spark.framework.snapshots import Snapshot
    from shelf_spark.framework.steps import execute_dag, prune_completed
    from shelf_spark.framework.tables import catalog_table_name
    from shelf_spark.framework import paths
    from shelf_spark.optimize import is_shuffle_free_join

    Shelf.init()
    raw_f = workspace / "facts.csv"
    raw_f.write_text("k,v\n" + "".join(f"{i % 10},{i}\n" for i in range(100)))
    raw_d = workspace / "dims.csv"
    raw_d.write_text("k,name\n" + "".join(f"{i},name{i}\n" for i in range(10)))
    Snapshot.create(raw_f, "ns/facts/2024-01-01")
    Snapshot.create(raw_d, "ns/dims/2024-01-01")
    shelf = Shelf()
    shelf.add_step(StepURI.parse("snapshot://ns/facts/2024-01-01"))
    shelf.add_step(StepURI.parse("snapshot://ns/dims/2024-01-01"))
    shelf.new_table("ns/fact_b/2024-01-02", ["snapshot://ns/facts/2024-01-01"])
    shelf.new_table("ns/dim_b/2024-01-02", ["snapshot://ns/dims/2024-01-01"])
    shelf.new_table(
        "ns/joined/2024-01-03",
        ["table://ns/fact_b/2024-01-02", "table://ns/dim_b/2024-01-02"],
    )
    shelf.save()

    scripts = paths.TABLE_SCRIPTS_DIR / "ns"
    scripts.mkdir(parents=True, exist_ok=True)
    bucket_cfg = "version: 1\nbucketing:\n  keys: [k]\n  num_buckets: 4\n  sort: [k]\n"
    (scripts / "fact_b.sql").write_text("SELECT k, v FROM {facts}")
    (scripts / "fact_b.meta.yaml").write_text(bucket_cfg)
    (scripts / "dim_b.sql").write_text("SELECT k, name FROM {dims}")
    (scripts / "dim_b.meta.yaml").write_text(
        "version: 1\ninherit: snapshot://ns/dims/2024-01-01\n" + bucket_cfg.split("\n", 1)[1]
    )
    (scripts / "joined.sql").write_text(
        "SELECT f.k, f.v, d.name FROM {fact_b} f JOIN {dim_b} d ON f.k = d.k"
    )

    execute_dag(spark, prune_completed(Shelf().resolve_latest()))

    out = paths.table_data_path("ns/joined/2024-01-03")
    joined = spark.read.parquet(str(out.resolve()))
    assert joined.count() == 100

    # the bucketing contract: same-keyed join of the two built tables plans
    # with no Exchange anywhere (broadcast disabled so the question is real)
    fact_name = catalog_table_name(StepURI.parse("table://ns/fact_b/2024-01-02"))
    dim_name = catalog_table_name(StepURI.parse("table://ns/dim_b/2024-01-02"))
    assert spark.catalog.tableExists(fact_name)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert is_shuffle_free_join(spark, fact_name, dim_name, ["k"])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql(f"DROP TABLE IF EXISTS {fact_name}")
    spark.sql(f"DROP TABLE IF EXISTS {dim_name}")


def test_db_query_and_export(workspace, spark, capsys):
    """End-to-end export parity with the reference's test_export_duckdb
    (reference tests/test_shelf.py:361-400): build two tables, export to a
    real DuckDB file, read it back, and assert exact CONTENTS under both
    the fully-qualified default naming and ``--short`` aliases."""
    from shelf_spark.framework.query import execute_query, export_tables
    from shelf_spark.framework.steps import execute_dag, prune_completed
    from shelf_spark.framework import paths

    Shelf.init()
    shelf = Shelf()
    shelf.new_table("ns/lit/2024-01-01", [])
    shelf.new_table("ns/pairs/2024-01-02", [])
    shelf.save()
    script = paths.TABLE_SCRIPTS_DIR / "ns" / "lit.sql"
    script.parent.mkdir(parents=True, exist_ok=True)
    script.write_text("SELECT 1 AS a, 'x' AS b UNION ALL SELECT 2, 'y'")
    script2 = paths.TABLE_SCRIPTS_DIR / "ns" / "pairs.sql"
    script2.write_text("SELECT 'k1' AS dim_key, 'v1' AS value")
    execute_dag(spark, prune_completed(Shelf().resolve_latest()))

    # single-token sugar + short alias
    df = execute_query(spark, Shelf(), "lit")
    assert df.count() == 2
    out = capsys.readouterr().out
    assert '"a": 1' in out

    import duckdb

    # default naming: fully-qualified namespace_table_version
    db_full = workspace / "out_full.duckdb"
    names = export_tables(spark, Shelf(), db_full)
    assert sorted(names) == ["ns_lit_20240101", "ns_pairs_20240102"]
    con = duckdb.connect(str(db_full))
    assert con.execute(
        "SELECT a, b FROM ns_lit_20240101 ORDER BY a"
    ).fetchall() == [(1, "x"), (2, "y")]
    assert con.execute(
        "SELECT dim_key, value FROM ns_pairs_20240102"
    ).fetchall() == [("k1", "v1")]
    con.close()

    # --short aliases
    db = workspace / "out.duckdb"
    names = export_tables(spark, Shelf(), db, short_names=True)
    assert sorted(names) == ["lit", "pairs"]
    con = duckdb.connect(str(db))
    assert con.execute("SELECT a, b FROM lit ORDER BY a").fetchall() == [
        (1, "x"),
        (2, "y"),
    ]
    assert con.execute("SELECT dim_key, value FROM pairs").fetchall() == [
        ("k1", "v1")
    ]
    con.close()


def test_validation_gate(workspace, spark):
    """Failed validation unlinks the output so the step stays dirty."""
    from shelf_spark.framework.steps import execute_dag, prune_completed
    from shelf_spark.framework import paths

    Shelf.init()
    shelf = Shelf()
    shelf.new_table("ns/bad/2024-01-01", [])
    shelf.save()
    script = paths.TABLE_SCRIPTS_DIR / "ns" / "bad.sql"
    script.parent.mkdir(parents=True, exist_ok=True)
    script.write_text("SELECT 1 AS a UNION ALL SELECT 1")
    script.with_suffix(".meta.yaml").write_text(
        "version: 1\nvalidation:\n  unique_columns: [a]\n"
    )
    with pytest.raises(Exception, match="validation failed"):
        execute_dag(spark, prune_completed(Shelf().resolve_latest()))
    assert not paths.table_data_path("ns/bad/2024-01-01").exists()
    # still dirty
    assert prune_completed(Shelf().resolve_latest())


def test_db_repl_scripted(workspace, spark, monkeypatch, capsys):
    """The `shelf db` REPL (no query arg) driven by scripted stdin: runs
    SQL lines against registered views, reports errors without dying, and
    exits on blank input (⇄ reference's interactive duckdb shell, N28)."""
    from shelf_spark.framework.cli import main as cli
    from shelf_spark.framework.steps import execute_dag, prune_completed
    from shelf_spark.framework import paths

    Shelf.init()
    shelf = Shelf()
    shelf.new_table("ns/lit/2024-01-01", [])
    shelf.save()
    script = paths.TABLE_SCRIPTS_DIR / "ns" / "lit.sql"
    script.parent.mkdir(parents=True, exist_ok=True)
    script.write_text("SELECT 41 AS a UNION ALL SELECT 1")
    execute_dag(spark, prune_completed(Shelf().resolve_latest()))

    lines = iter(["SELECT sum(a) AS total FROM lit", "not even sql", ""])
    monkeypatch.setattr("builtins.input", lambda prompt="": next(lines))
    assert cli(["db"]) == 0
    out, err = capsys.readouterr()
    assert "42" in out       # query result shown
    assert "error:" in err   # bad SQL reported, loop continued


def test_incremental_partition_rebuild(workspace, spark):
    """Partition-wise incremental build: after a dep gains one new day and
    changes another, ONLY those two output partitions are rewritten —
    untouched partitions keep their exact files (the 100 TB requirement:
    a table with one new day rebuilds one day, not the table)."""
    from shelf_spark.framework.snapshots import Snapshot
    from shelf_spark.framework.steps import execute_dag, prune_completed
    from shelf_spark.framework import paths
    from shelf_spark.framework.utils import load_yaml

    Shelf.init()
    raw = workspace / "days.csv"
    raw.write_text("day,v\n1,10\n1,20\n2,5\n")
    Snapshot.create(raw, "ns/days/2024-01-01")
    shelf = Shelf()
    shelf.add_step(StepURI.parse("snapshot://ns/days/2024-01-01"))
    shelf.new_table("ns/daily/2024-01-02", ["snapshot://ns/days/latest"])
    shelf.save()
    script = paths.TABLE_SCRIPTS_DIR / "ns" / "daily.sql"
    script.parent.mkdir(parents=True, exist_ok=True)
    script.write_text("SELECT day, CAST(sum(v) AS BIGINT) AS total FROM {days} GROUP BY day")
    script.with_suffix(".meta.yaml").write_text(
        "version: 1\nincremental:\n  partition_by: day\n"
    )

    execute_dag(spark, prune_completed(Shelf().resolve_latest()))
    out = paths.table_data_path("ns/daily/2024-01-02")
    rows = {(r.day, r.total) for r in spark.read.parquet(str(out.resolve())).collect()}
    assert rows == {(1, 30), (2, 5)}
    sidecar = load_yaml(paths.table_metadata_path("ns/daily/2024-01-02"))
    assert set(sidecar["partition_state"]) == {"1", "2"}

    def part_files(day):
        d = out / f"day={day}"
        return {f.name: f.stat().st_mtime_ns for f in d.iterdir() if f.suffix == ".parquet"}

    day1_before = part_files(1)

    # new snapshot version: day 1 unchanged, day 2 modified, day 3 new
    raw2 = workspace / "days2.csv"
    raw2.write_text("day,v\n1,10\n1,20\n2,7\n3,100\n")
    import time as _t
    _t.sleep(0.05)  # ensure mtime resolution can't mask a rewrite
    Snapshot.create(raw2, "ns/days/2024-02-01")
    shelf = Shelf()
    shelf.add_step(StepURI.parse("snapshot://ns/days/2024-02-01"))
    shelf.save()

    dag = prune_completed(Shelf().resolve_latest())
    assert StepURI.parse("table://ns/daily/2024-01-02") in dag
    execute_dag(spark, dag)

    rows = {(r.day, r.total) for r in spark.read.parquet(str(out.resolve())).collect()}
    assert rows == {(1, 30), (2, 7), (3, 100)}
    # day 1 files are byte-identical and untouched on disk
    assert part_files(1) == day1_before
    sidecar = load_yaml(paths.table_metadata_path("ns/daily/2024-01-02"))
    assert set(sidecar["partition_state"]) == {"1", "2", "3"}

    # everything fresh again
    assert prune_completed(Shelf().resolve_latest()) == {}


def test_sql_step_consumes_round2_dialect(workspace, spark):
    """A SQL build step may use any of the dialect surface the query tier
    pins (LATERAL subqueries, ordered listagg via array_sort) — the
    framework passes it to spark.sql untouched, like the reference hands
    its steps to DuckDB (reference src/shelf/tables.py:164-167)."""
    from shelf_spark.framework import paths
    from shelf_spark.framework.snapshots import Snapshot
    from shelf_spark.framework.steps import execute_dag, prune_completed

    Shelf.init()
    raw = workspace / "vals.csv"
    raw.write_text(
        "grp,name,score\n"
        + "\n".join(f"{i % 2},n{i},{i * 10}" for i in range(10))
        + "\n"
    )
    Snapshot.create(raw, "ns/vals/2024-01-01")
    shelf = Shelf()
    shelf.new_table("ns/top/2024-01-02", ["snapshot://ns/vals/2024-01-01"])
    shelf.save()
    script = paths.TABLE_SCRIPTS_DIR / "ns" / "top.sql"
    script.parent.mkdir(parents=True, exist_ok=True)
    script.write_text(
        """
        SELECT g.grp, c.name, c.score,
               array_join(array_sort(collect_list(c.name)
                 OVER (PARTITION BY g.grp)), ',') AS all_names
        FROM (SELECT DISTINCT grp FROM {vals}) g,
        LATERAL (
          SELECT name, score FROM {vals} v WHERE v.grp = g.grp
          ORDER BY score DESC, name LIMIT 2
        ) c
        """
    )
    execute_dag(spark, prune_completed(Shelf().resolve_latest()))
    out = paths.table_data_path("ns/top/2024-01-02")
    df = spark.read.parquet(str(out.resolve()))
    rows = {(r.grp, r.name) for r in df.collect()}
    assert rows == {(0, "n8"), (0, "n6"), (1, "n9"), (1, "n7")}
    assert {r.all_names for r in df.collect()} == {"n6,n8", "n7,n9"}
