"""export_shards: round-trip fidelity, shard directory layout, and
bounded file sizes for both parquet and JSONL."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from fhir2sql_spark.sinks.export import export_shards
from fhir2sql_spark.tables import load


@pytest.fixture()
def corpus(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", "text", F.pmod("doc_id", F.lit(4)).cast("int").alias("shard")
    )


@pytest.mark.parametrize("fmt", ["parquet", "json"])
def test_round_trip_and_layout(spark, corpus, tmp_path, fmt):
    path = str(tmp_path / f"export_{fmt}")
    export_shards(
        corpus, path, fmt=fmt, max_records_per_file=50, sort_cols=("doc_id",)
    )
    dirs = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(path, "shard=*"))
    )
    assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]

    back = getattr(spark.read, fmt)(path)
    want = sorted(
        (r.doc_id, r.lang, r.text, r.shard) for r in corpus.collect()
    )
    got = sorted(
        (r.doc_id, r.lang, r.text, int(r.shard)) for r in back.collect()
    )
    assert got == want


def test_max_records_per_file_enforced(spark, corpus, tmp_path):
    path = str(tmp_path / "export_bounded")
    export_shards(corpus, path, fmt="json", max_records_per_file=50)
    for shard_dir in glob.glob(os.path.join(path, "shard=*")):
        for f in glob.glob(os.path.join(shard_dir, "part-*")):
            with open(f) as fh:
                assert sum(1 for _ in fh) <= 50


def test_jsonl_is_one_object_per_line(spark, corpus, tmp_path):
    import json

    path = str(tmp_path / "export_jsonl")
    export_shards(corpus, path, fmt="json")
    files = glob.glob(os.path.join(path, "shard=*", "part-*"))
    assert files
    with open(files[0]) as fh:
        first = fh.readline().strip()
    obj = json.loads(first)
    assert {"doc_id", "lang", "text"} <= set(obj)


def test_rejects_unknown_format(corpus, tmp_path):
    with pytest.raises(ValueError):
        export_shards(corpus, str(tmp_path / "x"), fmt="csvish")
