"""Property-based tests (hypothesis) over the framework's pure functions.

The reference pins these behaviors with a handful of golden cases
(reference ``tests/test_shelf.py:572-594``, ``:110-124``); properties
cover the whole input space. No Spark session involved — pure driver
logic, so these run in milliseconds.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from shelf_spark.framework.tables import simplify_dependency_names
from shelf_spark.framework.types import StepURI
from shelf_spark.framework.query import path_to_snake, table_aliases
from shelf_spark.framework.utils import checksum_manifest

_seg = st.text(string.ascii_lowercase + string.digits, min_size=1, max_size=8)
_version = st.dates().map(lambda d: d.isoformat())


@st.composite
def step_uris(draw, scheme=None):
    sch = scheme or draw(st.sampled_from(["snapshot", "table"]))
    parts = draw(st.lists(_seg, min_size=1, max_size=3))
    v = draw(_version)
    return StepURI(sch, "/".join(parts + [v]))


@given(step_uris())
def test_uri_roundtrip(uri):
    assert StepURI.parse(str(uri)) == uri
    assert str(uri).startswith(f"{uri.scheme}://")
    assert uri.with_version("latest").dataset_path == uri.dataset_path


@given(st.lists(step_uris(), min_size=1, max_size=6, unique_by=lambda u: u.path))
def test_simplified_names_unique_and_total(deps):
    # identical *paths* under different schemes are irresolvable by design
    # (names derive from the path alone) and raise — excluded by unique_by.
    names = simplify_dependency_names(deps)
    # every dep mapped exactly once, under a unique name
    assert sorted(names.values(), key=str) == sorted(deps, key=str)
    assert len(names) == len(deps)
    # deterministic
    assert simplify_dependency_names(deps) == names


@given(st.dictionaries(_seg, st.text(string.hexdigits, min_size=4, max_size=8), min_size=1, max_size=8))
def test_manifest_checksum_order_insensitive(manifest):
    items = list(manifest.items())
    reversed_manifest = dict(reversed(items))
    assert checksum_manifest(manifest) == checksum_manifest(reversed_manifest)


@given(
    st.lists(
        st.tuples(st.lists(_seg, min_size=1, max_size=3).map(tuple), _version),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
@settings(max_examples=50)
def test_aliases_unique_and_resolvable(paths_versions):
    tables = sorted({"/".join(list(parts) + [v]) for parts, v in paths_versions})
    aliases = table_aliases(tables)
    fulls = {path_to_snake(t) for t in tables}
    # alias names never collide with each other or with full names
    assert len(aliases) == len(set(aliases))
    for alias, full in aliases.items():
        assert full in fulls
        assert alias not in fulls


# ---------------------------------------------------------------------------
# r10: floor-to-seconds epoch extraction (num.epoch_seconds_floor)
# ---------------------------------------------------------------------------

#: Spark-representable micros range used by the r10 time corpus
#: (year 1 .. 9999 comfortably inside).
_MICROS = st.integers(min_value=-62_000_000_000_000_000,
                      max_value=253_402_300_799_999_999)


@given(st.lists(_MICROS, min_size=1, max_size=40, unique=True))
@settings(max_examples=20, deadline=None)
def test_epoch_seconds_floor_is_python_floordiv(micros):
    """For ANY microsecond epoch (sign included), the Spark expression
    equals Python's // 1_000_000 — true floor division, the contract
    that replaced unix_timestamp's truncate-toward-zero (r10 time
    corpus). Runs each batch through one DataFrame pass."""
    from pyspark.sql import functions as F

    from shelf_spark.queries.num import epoch_seconds_floor
    from shelf_spark.session import get_spark

    spark = get_spark("props")
    df = spark.createDataFrame([(m,) for m in micros], "us long")
    got = {
        r["us"]: r["s"]
        for r in df.select(
            "us",
            epoch_seconds_floor(F.timestamp_micros("us")).alias("s"),
        ).collect()
    }
    for m in micros:
        assert got[m] == m // 1_000_000, (m, got[m])
