"""Dataflow engine: ordering-free correctness, retries, failure surfacing."""
import threading
import time

import pytest

from falcon_unzip_tpu.parallel.dataflow import Pipeline, StageError, StageSpec


def test_pipeline_processes_all_items():
    p = Pipeline([
        StageSpec("double", lambda x: x * 2, workers=3),
        StageSpec("inc", lambda x: x + 1, workers=2),
    ])
    out = p.run(range(100))
    assert sorted(out) == sorted(x * 2 + 1 for x in range(100))


def test_pipeline_drop_items():
    p = Pipeline([
        StageSpec("filter", lambda x: x if x % 2 == 0 else None),
    ])
    out = p.run(range(10))
    assert sorted(out) == [0, 2, 4, 6, 8]


def test_pipeline_retries_flaky_stage():
    fails = {}
    lock = threading.Lock()

    def flaky(x):
        with lock:
            n = fails.get(x, 0)
            fails[x] = n + 1
        if n == 0 and x == 5:
            raise RuntimeError("transient")
        return x

    p = Pipeline([StageSpec("flaky", flaky, workers=2, max_retries=2)])
    out = p.run(range(10))
    assert sorted(out) == list(range(10))
    assert fails[5] == 2


def test_pipeline_surfaces_permanent_failure():
    def bad(x):
        if x == 3:
            raise ValueError("permanent")
        return x

    p = Pipeline([StageSpec("bad", bad, max_retries=1)])
    with pytest.raises(StageError) as ei:
        p.run(range(6))
    assert ei.value.stage == "bad"
    assert ei.value.item == 3
