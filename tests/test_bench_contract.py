"""Bench stdout contract: the driver records only the LAST ~2000 bytes
of stdout, so the one JSON result line must fit the tail budget at the
CURRENT bench suite size — with worst-case-width values, not the values
of a lucky run (BENCH_r04 lost its head exactly this way when the suite
grew). No Spark session needed: the line builder is pure."""

from __future__ import annotations

import json

import bench


def _worst_case_line() -> str:
    # every per-query value at the widest 3-dp rendering the suite
    # realistically emits (xx.xxx), total in the hundreds
    names = [q for q in bench.HEADLINE + bench.EXTENDED]
    per_query = {q: 88.888 for q in names}
    medallion = {"bronze": 88.888, "silver": 88.888, "gold": 88.888}
    return bench.build_stdout_line(names, per_query, 888.888, 0.1, medallion)


def test_stdout_line_fits_tail_budget():
    line = _worst_case_line()
    assert len(line) <= bench.TAIL_BYTE_BUDGET, (
        f"{len(line)} bytes > {bench.TAIL_BYTE_BUDGET} tail budget — "
        "the driver would truncate the head of the result line"
    )


def test_stdout_line_keeps_spec_shape_under_truncation():
    doc = json.loads(_worst_case_line())
    # spec keys survive truncation; only per-query entries are dropped
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in doc, f"spec key {key!r} lost to truncation"
    assert doc["value"] == 888.888
    assert doc["sf"] == 0.1
    # dropped ids must be accounted for, and the HEADLINE block (flagship
    # + TPC-H, the priority head of the ordering) must survive longest
    n_names = len(bench.HEADLINE) + len(bench.EXTENDED)
    if doc.get("queries_omitted"):
        assert doc["queries_omitted"] + len(doc["queries"]) == n_names
        assert doc["full_artifact"] == "BENCH_FULL.json"
        kept = list(doc["queries"])
        assert kept == [q for q in bench.HEADLINE + bench.EXTENDED][: len(kept)]
        assert "q_flagship" in doc["queries"]
    else:
        assert len(doc["queries"]) == n_names
