"""Manifest commit-protocol gates: corrupt/torn manifests read as
uncommitted; stage-name mismatch is not committed; commit is atomic
(no .tmp left behind)."""

import json
import os

from kgforge.io import tables


def test_corrupt_manifest_is_uncommitted(tmp_path):
    d = str(tmp_path / "t")
    os.makedirs(d)
    with open(tables.manifest_path(d), "w") as fh:
        fh.write('{"stage": "x", "status": "comm')  # torn write
    assert tables.is_committed(d) is False


def test_missing_and_wrong_stage(tmp_path):
    d = str(tmp_path / "t2")
    os.makedirs(d)
    assert tables.is_committed(d) is False
    with open(tables.manifest_path(d), "w") as fh:
        json.dump({"stage": "a", "status": "committed"}, fh)
    assert tables.is_committed(d, "a") is True
    assert tables.is_committed(d, "b") is False


def test_write_table_commit_atomic(spark, tmp_path):
    d = str(tmp_path / "t3")
    df = spark.range(10).selectExpr("id", "id * 2 as v")
    m = tables.write_table(df, d, "stage_x")
    assert m["status"] == "committed" and m["row_count"] == 10
    assert tables.is_committed(d, "stage_x")
    assert not os.path.exists(tables.manifest_path(d) + ".tmp")
    assert len(m["lineage"]) >= 1
    assert sum(e["output_rows"] for e in m["lineage"]) == 10
