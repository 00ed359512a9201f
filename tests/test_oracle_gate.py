"""Pre-driver replica of the CORRECTNESS gate, wired into pytest.

Deselected by default (see pytest.ini addopts) because it runs every
registered query on Spark AND its DuckDB oracle at sf0.01 (~2 min);
run explicitly with ``pytest -m oracle`` before handing a round to the
driver so oracle drift is caught locally first.
"""

from __future__ import annotations

import pytest


@pytest.mark.oracle
def test_oracle_result_types_match_spark(spark):
    """The driver's value-hash is TYPE-sensitive where our row-value gate
    is not: DuckDB quietly returns HUGEINT for bare integer sums and
    DECIMAL for un-cast decimal math, which hash differently from Spark's
    BIGINT/DOUBLE even when values are equal (round 1's only red row).
    Audit every oracle's concrete result types against the Spark schema."""
    import duckdb

    from shelf_spark.data import TABLES, table_path
    from shelf_spark.queries import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf, t)}')"
        )
    ok = {
        "BIGINT": {"bigint"},
        "INTEGER": {"int", "bigint"},
        "DOUBLE": {"double"},
        "VARCHAR": {"string"},
        "BOOLEAN": {"boolean"},
        "DATE": {"date"},
        "TIMESTAMP": {"timestamp", "timestamp_ntz"},
        "TIMESTAMP_NS": {"timestamp", "timestamp_ntz"},
        "BLOB": {"binary"},
        "FLOAT": {"float"},
    }
    problems = []
    for name, sql in ORACLES.items():
        rel = con.sql(sql)
        dtypes = dict(zip(rel.columns, [str(t) for t in rel.types]))
        stypes = {
            f.name: f.dataType.simpleString()
            for f in QUERIES[name](spark, sf).schema.fields
        }
        for col, dt in dtypes.items():
            st, base = stypes.get(col), dt.split("(")[0]
            if st is None:
                problems.append(f"{name}.{col}: missing on spark side")
            elif base.startswith("DECIMAL") and st == dt.lower():
                # matched exact decimals on BOTH sides are deliberate
                # (the r8 integer-exact aggregation idiom, e.g.
                # decimal(38,0) neighbor-degree sums): both engines
                # surface Decimal objects with identical digits, which
                # the driver's canonicalizer compares as equal (proved
                # by agg_abc_classification's green r08 driver row).
                continue
            elif base in ("HUGEINT", "UHUGEINT") or base.startswith("DECIMAL"):
                problems.append(f"{name}.{col}: DuckDB {dt} vs spark {st} (uncast agg)")
            elif base in ok and st not in ok[base]:
                problems.append(f"{name}.{col}: DuckDB {dt} vs spark {st}")
    assert not problems, "\n".join(problems)


@pytest.mark.oracle
def test_no_nested_columns_in_oracle_checked_outputs(spark):
    """The driver canonicalizes results via ``pandas.sort_values``, which
    cannot factorize numpy arrays: any array/map/struct column in an
    oracle-checked query's output errors the driver row even when values
    are exact (r05: ``vectors_quantize_int8`` was the lone offender —
    ``TypeError: unhashable type: 'numpy.ndarray'``). Reduce nested values
    to scalars (to_json / array_join / explode) before output."""
    from shelf_spark.queries import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    offenders = []
    for name in ORACLES:
        for f in QUERIES[name](spark, sf).schema.fields:
            kind = f.dataType.typeName()
            if kind in ("array", "map", "struct"):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, (
        "oracle-checked outputs must be flat (driver sort_values "
        "cannot canonicalize nested cells):\n" + "\n".join(offenders)
    )


@pytest.mark.oracle
def test_all_queries_match_oracles():
    from tools.check_correctness import main as gate
    import sys

    argv, sys.argv = sys.argv, ["check_correctness"]
    try:
        rc = gate()
    finally:
        sys.argv = argv
    assert rc == 0, "oracle gate reported failures (see stdout)"


def test_driver_window_names_valid():
    """The rotated driver window must hold exactly 50 registered names
    (the driver checks the FIRST 50 queries() entries) with no
    duplicates — a typo here silently drops a query's driver evidence."""
    import __spark_entry__ as entry_mod

    from shelf_spark.queries import QUERIES

    import re

    current = max(
        (v for v in vars(entry_mod) if re.match(r"_DRIVER_WINDOW_R\d+$", v)),
        key=lambda v: int(v.rsplit("R", 1)[1]),
    )
    w = getattr(entry_mod, current)
    assert len(w) == 50
    assert len(set(w)) == 50
    missing = [n for n in w if n not in QUERIES]
    assert not missing, missing
    assert list(entry_mod.queries())[:50] == w


def test_worker_summary_parser_tolerates_vacuous_suffix():
    """r14 regression pin: the fan-out merge must parse shard summaries
    both with and without the r13 "(N unexplained-vacuous)" suffix.
    Before the fix, a suffix-carrying shard was silently dropped from
    the merged totals (a 343-query hostile-corpus run merged to
    "0 ok ... of 0" because every shard carried the suffix)."""
    from tools.check_correctness import _SUMMARY_RE

    plain = _SUMMARY_RE.match("85 ok, 1 rows-only, 0 FAIL of 86")
    assert plain and plain.group(5) is None
    assert [int(plain.group(i)) for i in range(1, 5)] == [85, 1, 0, 86]

    suffixed = _SUMMARY_RE.match(
        "84 ok, 1 rows-only, 2 FAIL of 85 (9 unexplained-vacuous)"
    )
    assert suffixed and int(suffixed.group(5)) == 9
    assert [int(suffixed.group(i)) for i in range(1, 5)] == [84, 1, 2, 85]
