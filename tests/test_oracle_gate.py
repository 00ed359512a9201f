"""Pre-driver replica of the CORRECTNESS gate, wired into pytest.

Deselected by default (see pytest.ini addopts) because it runs every
registered query on Spark AND its DuckDB oracle at sf0.01 (~2 min);
run explicitly with ``pytest -m oracle`` before handing a round to the
driver so oracle drift is caught locally first.
"""

from __future__ import annotations

import pytest


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
