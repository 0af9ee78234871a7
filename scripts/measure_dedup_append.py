#!/usr/bin/env python3
"""Measure the DEDUP-store O(delta) append paths against their full
builds — the r12 evidence artifact for VERDICT r11 task 4 (the
MinHash + components analogue of measure_append.py / SURVEY §6.4).

Builds (or attaches) the MinHash store and the Jaccard-closure
components store for --base's documents, synthesizes a delta corpus
from --delta-src (same documents, doc_ids offset into a disjoint id
range — text distributions overlap the base's, so the append
exercises real NEW-OLD pairs and component merges, not a vacuous
disjoint-shingle case), times append_dedup_documents and
append_components, and prints ONE JSON line. Run with a COLD cache
(clear $SPARK_GRAFT_MINHASH_CACHE) to time the base builds in the
same session; warm runs report base_mode="attach" so the artifact is
honest about what was measured.

Usage:
  python scripts/measure_dedup_append.py --base /tmp/spark_graft_sf1 \
      --delta-src /root/testdata/sf0.1 --tag dd1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ID_OFFSET = 1_000_000_000  # above sf1's copy-offset ids (max ~9.0e8)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/tmp/spark_graft_sf1")
    ap.add_argument("--delta-src", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="dd1")
    ap.add_argument("--threshold", type=float, default=0.3)
    # sf1 (k=10) copy offsets reach 9.0e8, so 1e9 clears them; sf3
    # (k=30) reaches 2.9e9+ and needs --id-offset 10000000000
    ap.add_argument("--id-offset", type=int, default=_ID_OFFSET)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from xml_to_sqlite3_spark.cache_util import content_key
    from xml_to_sqlite3_spark.operators import dedup as D
    from xml_to_sqlite3_spark.session import get_spark

    spark = get_spark(app_name="measure_dedup_append")
    spark.sparkContext.setLogLevel("ERROR")

    doc_path = os.path.join(args.base, "documents.parquet")
    root = os.environ.get(
        "SPARK_GRAFT_MINHASH_CACHE",
        os.path.join(tempfile.gettempdir(), "spark_graft_minhash_cache"),
    )
    mh_ck = D._minhash_store_key(doc_path, 3, 64, "doc_id", "text")
    base_mode = (
        "attach"
        if os.path.exists(os.path.join(root, mh_ck, "_COMPLETE"))
        else "build"
    )
    t0 = time.perf_counter()
    tokens, _sigs = D.get_minhash_store(spark, doc_path)
    mh_base_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    comp = D.get_components_store(spark, doc_path, threshold=args.threshold)
    comp_base_s = time.perf_counter() - t0
    base_docs = spark.read.parquet(doc_path).count()
    base_comp_rows = comp.count()

    delta = spark.read.parquet(
        os.path.join(args.delta_src, "documents.parquet")
    ).withColumn("doc_id", F.col("doc_id") + F.lit(args.id_offset))
    delta_docs = delta.count()
    delta_key = content_key(
        "dd", args.delta_src, extra=f"offset|{args.tag}",
        code_files=(os.path.abspath(__file__),), suffixes=(".parquet",),
    )

    t0 = time.perf_counter()
    mh_entry = D.append_dedup_documents(spark, doc_path, delta, delta_key=delta_key)
    mh_append_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    comp_entry = D.append_components(
        spark, doc_path, delta, delta_key=delta_key, threshold=args.threshold
    )
    comp_append_s = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "dedup_store_append",
                "base": doc_path,
                "base_mode": base_mode,
                "mh_base_s": round(mh_base_s, 2),
                "comp_base_s": round(comp_base_s, 2),
                "mh_append_s": round(mh_append_s, 2),
                "comp_append_s": round(comp_append_s, 2),
                "base_docs": base_docs,
                "delta_docs": delta_docs,
                "delta_fraction": round(delta_docs / max(base_docs, 1), 4),
                "base_comp_rows": base_comp_rows,
                "appended_comp_rows": comp_entry["components"].count(),
                "appended_tokens": mh_entry["tokens"].count(),
                "unit": "sec",
            }
        )
    )


if __name__ == "__main__":
    main()
