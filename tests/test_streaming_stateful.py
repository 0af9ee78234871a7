"""Stateful streaming dedup: duplicates suppressed across
micro-batches via Spark-managed state."""

from __future__ import annotations

import json
import os

from xml_to_sqlite3_spark.streaming.stateful import streaming_exact_dedup


def _write_batch(d, name, rows):
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    _write_batch(src, "b1.json", [
        {"doc_id": 1, "text": "alpha beta gamma"},
        {"doc_id": 2, "text": "delta epsilon"},
        {"doc_id": 3, "text": "alpha beta gamma"},  # in-batch dup of 1
    ])

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    deduped = streaming_exact_dedup(stream)
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()

    first = {r["doc_id"] for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert 2 in first
    assert len(first & {1, 3}) == 1  # exactly one of the in-batch dups

    # second micro-batch: cross-batch duplicate + a fresh doc
    _write_batch(src, "b2.json", [
        {"doc_id": 4, "text": "alpha beta gamma"},  # dup of batch 1
        {"doc_id": 5, "text": "zeta eta theta"},
    ])
    q.processAllAvailable()
    q.stop()

    out = {r["doc_id"]: r["text_md5"] for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert 5 in out
    assert 4 not in out  # suppressed by state from the earlier batch
    assert len(out) == 3
