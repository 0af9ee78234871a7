#!/usr/bin/env python3
"""Scale evidence for the r13 IVF-PQ composition (SURVEY #205):
build the persistent cluster-partitioned code index for --base's
embeddings, then time the probed IVF-ADC query against the
exhaustive-probe (== flat pq_topk) query — the partition-pruning
claim measured, not asserted — and report probed-vs-exhaustive
recall@k plus recall vs the exact brute-force L2 top-k.

Usage:
  python scripts/measure_ivfpq.py --base /tmp/spark_graft_sf1 --tag sf1_r13
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
    ap.add_argument("--base", default="/tmp/spark_graft_sf1")
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--n-centroids", type=int, default=16)
    ap.add_argument("--n-probe", type=int, default=4)
    ap.add_argument("--tag", default="ivfpq")
    args = ap.parse_args()

    import numpy as np

    from pyspark.sql import functions as F

    from xml_to_sqlite3_spark.operators import similarity as S
    from xml_to_sqlite3_spark.session import get_spark

    spark = get_spark(app_name="measure_ivfpq")
    spark.sparkContext.setLogLevel("ERROR")

    path = os.path.join(args.base, "embeddings.parquet")
    emb = spark.read.parquet(path)
    n_vec = emb.count()

    t0 = time.perf_counter()
    cents = S.get_codebook(spark, path, k=args.n_centroids, n_iter=5)
    books = S.get_pq_codebooks(spark, path, m=8, ks=16, n_iter=5)
    models_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    index = S.get_ivf_pq_index(
        spark, path, n_centroids=args.n_centroids, m=8, ks=16, n_iter=5
    )
    index_s = time.perf_counter() - t0

    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]

    def best2(fn):
        runs = []
        for _ in range(2):
            t = time.perf_counter()
            out = fn()
            runs.append(time.perf_counter() - t)
        return out, round(min(runs), 3)

    probed, t_probed = best2(
        lambda: S.ivf_pq_topk(
            index, cents, books, q, k=args.k, n_probe=args.n_probe
        ).collect()
    )
    exhaust, t_exhaust = best2(
        lambda: S.ivf_pq_topk(
            index, cents, books, q, k=args.k, n_probe=args.n_centroids
        ).collect()
    )
    # exact brute-force L2 top-k over the raw vectors (the quality
    # referent; executor-side squared-L2 + TakeOrdered)
    qlit = F.array(*[F.lit(float(x)) for x in q])
    dist = F.aggregate(
        F.zip_with("embedding", qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    exact, t_exact = best2(
        lambda: emb.select("vec_id", dist.alias("d"))
        .orderBy(F.asc("d"), F.asc("vec_id"))
        .limit(args.k)
        .collect()
    )

    p_ids = {r["vec_id"] for r in probed}
    e_ids = {r["vec_id"] for r in exhaust}
    x_ids = {r["vec_id"] for r in exact}
    print(
        json.dumps(
            {
                "metric": "ivfpq_scale",
                "base": path,
                "n_vectors": n_vec,
                "n_centroids": args.n_centroids,
                "n_probe": args.n_probe,
                "k": args.k,
                "models_s": round(models_s, 2),
                "index_build_s": round(index_s, 2),
                "t_probed_s": t_probed,
                "t_exhaustive_s": t_exhaust,
                "t_exact_brute_s": t_exact,
                "recall_probed_vs_exhaustive": round(
                    len(p_ids & e_ids) / args.k, 3
                ),
                "recall_probed_vs_exact": round(len(p_ids & x_ids) / args.k, 3),
                "recall_exhaustive_vs_exact": round(
                    len(e_ids & x_ids) / args.k, 3
                ),
                "unit": "sec",
            }
        )
    )


if __name__ == "__main__":
    main()
