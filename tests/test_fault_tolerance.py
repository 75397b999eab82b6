"""Crash-recovery parity (src/mrapps/crash.go + test-mr.sh:283-330): the
reference kills ~1/3 of workers mid-task and requires final output to
equal the no-fault golden run. Spark analog: deterministic task-failure
injection (first attempt of selected partitions raises), task retry
re-executes, output must equal the clean run.

Needs master local[8,4] (maxFailures=4), so this module manages its own
SparkSession lifecycle. Crash closures are defined inside the tests so
cloudpickle ships them by value (test modules aren't importable on
executors).
"""

from __future__ import annotations

import pytest
from pyspark import TaskContext
from pyspark.sql import SparkSession

from mit_6_5840_mapreduce_with_go_spark.mapreduce import (
    run_mapreduce,
    run_mapreduce_sequential,
)
from mit_6_5840_mapreduce_with_go_spark.mapreduce.apps import wc_map, wc_reduce

FILES = [(f"f{i}", ("alpha beta gamma delta " * (i + 1)).strip()) for i in range(9)]


@pytest.fixture(scope="module")
def retry_spark():
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = (
        SparkSession.builder.master("local[8,4]")
        .appName("fault_tolerance")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_output_unchanged_under_task_crashes(retry_spark):
    def crashing_wc_map(filename: str, contents: str):
        # ~1/3 of map tasks die on first attempt (crash.go:20-32 analog)
        ctx = TaskContext.get()
        if ctx is not None and ctx.attemptNumber() == 0 and sum(map(ord, filename)) % 3 == 0:
            raise RuntimeError(f"injected crash in map({filename})")
        return wc_map(filename, contents)

    golden = run_mapreduce_sequential(wc_map, wc_reduce, FILES)
    got = run_mapreduce(retry_spark, crashing_wc_map, wc_reduce, FILES)
    assert got == golden


def test_reduce_crash_recovery(retry_spark):
    def crashing_reduce(key: str, values: list[str]) -> str:
        ctx = TaskContext.get()
        if ctx is not None and ctx.attemptNumber() == 0 and sum(map(ord, key)) % 3 == 0:
            raise RuntimeError(f"injected crash in reduce({key})")
        return wc_reduce(key, values)

    golden = run_mapreduce_sequential(wc_map, wc_reduce, FILES)
    got = run_mapreduce(retry_spark, wc_map, crashing_reduce, FILES)
    assert got == golden
