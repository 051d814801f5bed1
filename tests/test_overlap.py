"""build_overlapped: the driver-thread overlap helper (guide §2.6)."""

import threading

import pytest

from example_kafkastreams_spark.operators.overlap import build_overlapped


def test_results_keyed_by_name():
    out = build_overlapped({"a": lambda: 1, "b": lambda: "x", "c": dict})
    assert out == {"a": 1, "b": "x", "c": {}}


def test_single_builder_runs_inline_no_thread():
    main = threading.get_ident()
    out = build_overlapped({"only": threading.get_ident})
    assert out == {"only": main}


def test_multiple_builders_run_on_worker_threads():
    main = threading.get_ident()
    out = build_overlapped({"a": threading.get_ident, "b": threading.get_ident})
    assert all(tid != main for tid in out.values())


def test_exception_propagates():
    def boom():
        raise ValueError("section failed")

    with pytest.raises(ValueError, match="section failed"):
        build_overlapped({"ok": lambda: 1, "bad": boom})


def test_sections_overlap_in_time():
    # Two sections that each block until the other has started can only
    # finish if they genuinely run concurrently.
    gate = threading.Barrier(2, timeout=10)

    def section():
        gate.wait()
        return True

    out = build_overlapped({"a": section, "b": section})
    assert out == {"a": True, "b": True}


def test_spark_actions_from_sections(spark):
    # Eager Spark jobs submitted from overlap threads return correct
    # results (inheritable_thread_target keeps JVM thread-locals sane).
    out = build_overlapped(
        {
            "sum": lambda: spark.range(100).groupBy().sum("id").collect()[0][0],
            "cnt": lambda: spark.range(50).count(),
        }
    )
    assert out == {"sum": 4950, "cnt": 50}
