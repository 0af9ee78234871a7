#!/usr/bin/env python3
"""Scale evidence for the IVF-PQ index O(delta) append (SURVEY #210,
r13 VERDICT task 7): at --base's embeddings (sf3 = 60k vectors), chain
TWO append waves onto the persistent cluster-partitioned index and
compare against the rebuild alternative — mirroring
BENCH_append_sf3_r13's shape for the dedup/components stores.

Identity is already pinned by tests (chained appends == one append ==
encode-the-union under base-trained models, per-row); this harness
adds the TIMING claim at a real scale point: the append costs O(wave)
(encode the wave + hard-link clone) while the rebuild alternative
re-encodes the whole corpus (and retraining the models on the union —
what a drift-triggered rebuild pays — dominates even that).

Usage:
  python scripts/measure_ivfpq_append.py --base /tmp/spark_graft_sf3 \
      --tag sf3_r14 [--wave 2000]
Writes BENCH_append_ivfpq_<tag>.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/tmp/spark_graft_sf3")
    ap.add_argument("--wave", type=int, default=2000)
    ap.add_argument("--id-offset", type=int, default=10_000_000_000)
    ap.add_argument("--n-centroids", type=int, default=16)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--ks", type=int, default=16)
    ap.add_argument("--n-iter", type=int, default=5)
    ap.add_argument("--scratch", default="/tmp/spark_graft_ivfpq_append")
    ap.add_argument("--tag", default="sf3_r14")
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from xml_to_sqlite3_spark.operators import similarity as S
    from xml_to_sqlite3_spark.session import get_spark

    spark = get_spark(app_name="measure_ivfpq_append")
    spark.sparkContext.setLogLevel("ERROR")

    path = os.path.join(args.base, "embeddings.parquet")
    emb = spark.read.parquet(path)
    n_vec = emb.count()
    dim = len(emb.select("embedding").head()["embedding"])
    kw = dict(
        n_centroids=args.n_centroids, m=args.m, ks=args.ks, n_iter=args.n_iter
    )

    def mkwave(tag: str, start: int):
        # zlib.crc32, NOT hash(): Python's str hash is salted per
        # process, which would give each run different vectors under
        # the SAME cache delta key — a warm re-run would attach the
        # previous run's entries while the rebuild path encodes this
        # run's data (apples-to-oranges timings)
        import zlib

        rng = np.random.default_rng(zlib.crc32(tag.encode()))
        X = rng.standard_normal((args.wave, dim))
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        return spark.createDataFrame(
            [
                (int(args.id_offset + start + i), [float(v) for v in X[i]])
                for i in range(args.wave)
            ],
            "vec_id long, embedding array<double>",
        )

    w1, w2 = mkwave("w1", 0), mkwave("w2", args.wave)

    # one-time base: models (content-cached) + partitioned index
    t0 = time.perf_counter()
    S.get_codebook(spark, path, k=args.n_centroids, n_iter=args.n_iter)
    S.get_pq_codebooks(spark, path, m=args.m, ks=args.ks, n_iter=args.n_iter)
    models_s = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    S.get_ivf_pq_index(spark, path, **kw)
    base_index_s = round(time.perf_counter() - t0, 2)

    # two chained O(wave) appends
    t0 = time.perf_counter()
    e1 = S.append_ivf_pq_index(spark, path, w1, delta_key=f"{args.tag}-n{args.wave}-w1", **kw)
    append1_s = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    e2 = S.append_ivf_pq_index(
        spark, path, w2, delta_key=f"{args.tag}-n{args.wave}-w2",
        base_append=e1["append_key"], **kw,
    )
    append2_s = round(time.perf_counter() - t0, 2)
    appended_rows = e2["index"].count()

    # rebuild alternative 1: re-ENCODE the union under the base models
    # (what appended == rebuilt is pinned against)
    union_path = os.path.join(args.scratch, "union_embeddings.parquet")
    # project base to the wave schema (testdata carries extra columns
    # like label; vector dtype may be float[] vs the waves' double[])
    emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(w1).unionByName(w2).write.mode("overwrite").parquet(
        union_path
    )
    cents = S.get_codebook(spark, path, k=args.n_centroids, n_iter=args.n_iter)
    books = S.get_pq_codebooks(
        spark, path, m=args.m, ks=args.ks, n_iter=args.n_iter
    )
    t0 = time.perf_counter()
    reenc = S.ivf_pq_index(spark.read.parquet(union_path), cents, books)
    reenc_rows = reenc.count()
    reencode_s = round(time.perf_counter() - t0, 2)

    # rebuild alternative 2: the drift-triggered FULL rebuild — retrain
    # models on the union, then build the persistent index
    t0 = time.perf_counter()
    S.get_codebook(spark, union_path, k=args.n_centroids, n_iter=args.n_iter)
    S.get_pq_codebooks(
        spark, union_path, m=args.m, ks=args.ks, n_iter=args.n_iter
    )
    S.get_ivf_pq_index(spark, union_path, **kw)
    full_rebuild_s = round(time.perf_counter() - t0, 2)

    out = {
        "metric": "ivfpq_index_append",
        "tag": args.tag,
        "base": path,
        "base_vectors": n_vec,
        "wave_vectors": args.wave,
        "models_s": models_s,
        "base_index_s": base_index_s,
        "append_wave1_s": append1_s,
        "append_wave2_s": append2_s,
        "reencode_union_base_models_s": reencode_s,
        "full_rebuild_retrain_s": full_rebuild_s,
        "appended_rows": appended_rows,
        "reencoded_rows": reenc_rows,
        "rows_match": appended_rows == reenc_rows,
        "unit": "sec",
    }
    line = json.dumps(out)
    print(line)
    with open(f"BENCH_append_ivfpq_{args.tag}.json", "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
