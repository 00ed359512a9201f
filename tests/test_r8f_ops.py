"""Plain-Python reference pins for the r8 continuation operator tier.

Same discipline as test_r8e_ops.py: each test recomputes the operator's
result from raw parquet with math/Counter code that shares NOTHING with
either engine, and requires exact equality (after the operators' own
IEEE rounding).
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from conftest import SF_SMALL

from shelf_spark.queries import QUERIES


def _round_ieee_py(x: float, nd: int = 6) -> float:
    scale = float(10**nd)
    return math.floor(x * scale + 0.5) / scale


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in ("lineitem", "orders", "events", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


def test_kendall_tau_matches_python_reference(spark):
    rows = _duck(SF_SMALL, "SELECT l_quantity, l_extendedprice FROM lineitem")
    pts = [(int(math.floor(q + 0.5)), int(math.floor(p / 1000))) for q, p in rows]
    cells = Counter(pts)
    items = list(cells.items())
    conc = disc = 0
    for i, ((x1, y1), n1) in enumerate(items):
        for (x2, y2), n2 in items[i + 1 :]:
            if x1 == x2:
                continue
            # orient so x increases
            lo_y, hi_y = (y1, y2) if x1 < x2 else (y2, y1)
            if lo_y < hi_y:
                conc += n1 * n2
            elif lo_y > hi_y:
                disc += n1 * n2
    n = len(pts)
    tx = Counter(x for x, _ in pts)
    ty = Counter(y for _, y in pts)
    u1 = sum(t * (t - 1) for t in tx.values())
    u2 = sum(t * (t - 1) for t in ty.values())
    tau = 2.0 * (float(conc) - float(disc)) / math.sqrt(
        (float(n) * (float(n) - 1.0) - float(u1))
        * (float(n) * (float(n) - 1.0) - float(u2))
    )
    got = QUERIES["stats_kendall_tau"](spark, SF_SMALL).collect()[0]
    assert got.n == n
    assert int(got.conc) == conc
    assert int(got.disc) == disc
    assert got.tau_b == _round_ieee_py(tau)


def test_mann_kendall_matches_python_reference(spark):
    rows = _duck(
        SF_SMALL,
        "SELECT o_orderdate, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
        " FROM orders",
    )
    daily: Counter = Counter()
    for d, cents in rows:
        daily[d] += cents
    series = [rev for _, rev in sorted(daily.items())]
    n = len(series)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            if series[j] > series[i]:
                s += 1
            elif series[j] < series[i]:
                s -= 1
    ties = Counter(series)
    u = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var18 = (float(n) * (float(n) - 1.0) * (2.0 * float(n) + 5.0) - float(u)) / 18.0
    if s > 0:
        z = (float(s) - 1.0) / math.sqrt(var18)
    elif s < 0:
        z = (float(s) + 1.0) / math.sqrt(var18)
    else:
        z = 0.0
    got = QUERIES["ts_mann_kendall"](spark, SF_SMALL).collect()[0]
    assert got.n == n
    assert got.s_stat == s
    assert got.z_stat == _round_ieee_py(z)


def test_acf_matches_python_reference(spark):
    rows = _duck(
        SF_SMALL,
        "SELECT o_orderdate, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
        " FROM orders",
    )
    daily: Counter = Counter()
    for d, cents in rows:
        daily[d] += cents
    by_day = dict(daily)
    n = len(by_day)
    s = sum(by_day.values())
    q = sum(v * v for v in by_day.values())
    want = {}
    from datetime import timedelta

    for lag in (1, 2, 3, 7, 14):
        pk = hk = tk = n_terms = 0
        for d, v in by_day.items():
            d2 = d + timedelta(days=lag)
            if d2 in by_day:
                pk += v * by_day[d2]
                hk += v
                tk += by_day[d2]
                n_terms += 1
        num = (
            float(n) * float(n) * float(pk)
            - float(n) * float(s) * (float(hk) + float(tk))
            + (float(n) - float(lag)) * float(s) * float(s)
        )
        den = float(n) * float(n) * float(q) - float(n) * float(s) * float(s)
        want[lag] = (n_terms, _round_ieee_py(num / den))
    got = {
        r.lag: (r.n_terms, r.acf)
        for r in QUERIES["ts_acf"](spark, SF_SMALL).collect()
    }
    assert got == want
