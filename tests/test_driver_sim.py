"""Driver simulation — the single oracle-parity sweep.

Walks EVERY registered query against its DuckDB oracle exactly the way
the correctness driver does: sorted columns, sorted rows, TYPED exact
value comparison (no float tolerance — the driver hashes typed values,
which is what caught q50 in round 1 and q35 in round 2 while a
tolerance-based compare stayed green).

Also pins the contract surface: the driver verifies at most 50
queries, so the registry must not declare more — round 2 registered 55
and the five highest-numbered components silently received no
correctness row at all.

Runs at sf0.001 for speed; ``driver_sim.py`` at the repo root is the
same check at the driver's sf0.01 on a vanilla session — run it before
round end.
"""

from __future__ import annotations

import pytest

from example_kafkastreams_spark.queries import ORACLE_SQL, QUERIES
from tests.conftest import SMOKE
from tests.oracle_utils import assert_matches_oracle_typed

DRIVER_MAX_QUERIES = 50


def test_registry_fits_driver_window():
    assert len(QUERIES) <= DRIVER_MAX_QUERIES, (
        f"{len(QUERIES)} queries registered but the driver checks at "
        f"most {DRIVER_MAX_QUERIES} — entries past the window get NO "
        f"correctness row (round-2 lesson: q56–q60 went unchecked)"
    )


def test_every_query_declares_oracle():
    missing = sorted(set(QUERIES) - set(ORACLE_SQL))
    assert not missing, f"queries without oracle SQL: {missing}"


def test_entry_module_contract():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(qs) == set(QUERIES)
    assert set(osql) == set(ORACLE_SQL)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_driver_sim_typed(spark, name):
    assert_matches_oracle_typed(
        QUERIES[name](spark, SMOKE), ORACLE_SQL[name], SMOKE
    )


def test_bench_branch_lists_match_slot_modes(spark):
    """Every branch value bench.py's branch_timings registers must
    actually appear in that slot's discriminator column (and cover it,
    split_* modes aside) — a typo'd branch entry would silently time
    an empty-pruned sub-plan as 0 s forever."""
    import re

    src = open("/root/repo/bench.py").read()
    block = re.search(
        r"branch_timings: dict\[str, dict\] = \{\}\s*for qname, disc, "
        r"modes in \((.*?)\n    \):",
        src,
        re.S,
    ).group(1)
    declared = re.findall(
        r'\(\s*"(q\w+)",\s*"(\w+)",\s*\(([^)]*)\)', block
    )
    assert declared, "could not parse bench branch_timings list"
    for qname, disc, modes_src in declared:
        modes = set(re.findall(r'"([^"]+)"', modes_src))
        out = QUERIES[qname](spark, SMOKE)
        got = {
            r[0] for r in out.select(disc).distinct().collect()
        }
        missing = modes - got
        assert not missing, (
            f"{qname}: bench times branches {sorted(missing)} that the "
            f"query never emits (have {sorted(got)})"
        )
