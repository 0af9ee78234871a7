#!/usr/bin/env python3
"""Vector-family recall on a PLANTED-CLUSTER fixture (r13 VERDICT
task 2): every prior ANN recall number was measured on make_sf's
deliberately cluster-DIFFUSING perturbation, which cannot demonstrate
the regime residual (Jégou) IVF-ADC exists for — there, raw beat
residual 0.55 vs 0.45 recall@20 because the corpus has no
between-cluster variance for the coarse quantizer to absorb. This
harness synthesizes a corpus that actually clusters (the shape of a
real embedding corpus) and measures recall@k raw-vs-residual at two
probe settings, plus IVF probe recall and flat-PQ recall, against the
exact brute-force L2 top-k.

Fixture: --n-clusters isotropic Gaussian clusters in d=64 — centers
N(0,1)-drawn then unit-normalized, points = center + N(0, --sigma)
(sigma 0.15 default: within-cluster spread ~2% of the between-cluster
variance, a strongly-clustered regime). Deterministic (seeded numpy),
written once to --fixture-dir and reused.

Usage:
  python scripts/measure_clustered_recall.py --tag r14 \
      [--n-vec 20000] [--n-clusters 32] [--sigma 0.15]
Writes BENCH_vecrecall_<tag>.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_fixture(out_dir: str, n_vec: int, n_clusters: int, dim: int,
                  sigma: float, seed: int, anisotropy: float = 0.0,
                  axis_aligned: bool = False) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, size=n_vec)
    X = centers[assign] + sigma * rng.standard_normal((n_vec, dim))
    if anisotropy > 0:
        # decaying per-dimension spectrum (scale_d ~ (d+1)^(-a/2)),
        # then (unless --axis-aligned) a fixed random rotation so the
        # principal directions are NOT axis-aligned — real embedding
        # spectra decay with arbitrary directions. --axis-aligned
        # keeps the decay on the raw coordinates (the dimension-
        # ordered shape of PCA-projected or Matryoshka-style
        # embeddings): there naive PQ slicing concentrates all the
        # variance in subspace 0, the textbook OPQ-win regime.
        # anisotropy=0 keeps the isotropic fixture bit-identical to
        # the r14 runs.
        scale = (np.arange(1, dim + 1)) ** (-anisotropy / 2.0)
        X = X * scale
        if not axis_aligned:
            Q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
            X = X @ Q.T
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_vec), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, row)) for row in X],
                    pa.list_(pa.float64()),
                ),
                "true_cluster": pa.array(assign.tolist(), pa.int32()),
            }
        ),
        os.path.join(out_dir, "embeddings.parquet"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture-dir", default="/tmp/spark_graft_clustered")
    ap.add_argument("--n-vec", type=int, default=20_000)
    ap.add_argument("--n-clusters", type=int, default=32)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--sigma", type=float, default=0.15)
    ap.add_argument("--anisotropy", type=float, default=0.0)
    ap.add_argument("--axis-aligned", action="store_true")
    ap.add_argument("--seed", type=int, default=14)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--n-queries", type=int, default=24)
    ap.add_argument("--n-centroids", type=int, default=16)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--ks", type=int, default=16)
    ap.add_argument("--tag", default="r14")
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from xml_to_sqlite3_spark.operators import similarity as S
    from xml_to_sqlite3_spark.session import get_spark

    fx = os.path.join(args.fixture_dir, "embeddings.parquet")
    if not os.path.exists(fx):
        _make_fixture(args.fixture_dir, args.n_vec, args.n_clusters,
                      args.dim, args.sigma, args.seed, args.anisotropy,
                      args.axis_aligned)

    spark = get_spark(app_name="measure_clustered_recall")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(fx).select("vec_id", "embedding")

    t0 = time.perf_counter()
    cents = S.spherical_kmeans(corpus, k=args.n_centroids, n_iter=5)
    books_raw = S.pq_train(corpus, m=args.m, ks=args.ks, n_iter=5)
    # residual books: train on x - centroid[assign(x)] (the
    # get_residual_pq_codebooks recipe, uncached for a fixture run)
    res = S._residual_udf(cents)
    res_path = os.path.join(args.fixture_dir, "residuals.parquet")
    corpus.select(
        "vec_id", res(F.col("embedding")).alias("embedding")
    ).write.mode("overwrite").parquet(res_path)
    books_res = S.pq_train(
        spark.read.parquet(res_path), m=args.m, ks=args.ks, n_iter=5
    )
    # OPQ rotation (r14 VERDICT task 4): rotation from the exact
    # covariance of the corpus; rotated books train on R x (raw arm)
    # and R (x - c) (residual arm)
    cov_rows = S.embedding_covariance(corpus).collect()
    R = S.opq_rotation(cov_rows, dim=args.dim, m=args.m)
    rotu = S._rotate_udf(R)
    rot_path = os.path.join(args.fixture_dir, "rotated.parquet")
    corpus.select(
        "vec_id", rotu(F.col("embedding")).alias("embedding")
    ).write.mode("overwrite").parquet(rot_path)
    books_raw_rot = S.pq_train(
        spark.read.parquet(rot_path), m=args.m, ks=args.ks, n_iter=5
    )
    resrot_path = os.path.join(args.fixture_dir, "residuals_rot.parquet")
    spark.read.parquet(res_path).select(
        "vec_id", rotu(F.col("embedding")).alias("embedding")
    ).write.mode("overwrite").parquet(resrot_path)
    books_res_rot = S.pq_train(
        spark.read.parquet(resrot_path), m=args.m, ks=args.ks, n_iter=5
    )
    models_s = round(time.perf_counter() - t0, 2)

    idx_raw = S.ivf_pq_index(corpus, cents, books_raw).localCheckpoint()
    idx_res = S.ivf_pq_index(
        corpus, cents, books_res, residual=True
    ).localCheckpoint()
    idx_raw_rot = S.ivf_pq_index(
        corpus, cents, books_raw_rot, rotation=R
    ).localCheckpoint()
    idx_res_rot = S.ivf_pq_index(
        corpus, cents, books_res_rot, residual=True, rotation=R
    ).localCheckpoint()

    # ground truth: exact L2 top-k, driver-side (model-sized corpus)
    rows = corpus.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows])
    rng = np.random.default_rng(args.seed + 1)
    q_ids = rng.choice(len(ids), size=args.n_queries, replace=False)

    def exact_topk(qv):
        d = ((X - qv) ** 2).sum(axis=1)
        return set(ids[np.argsort(d, kind="stable")[: args.k]])

    probes = sorted({2, 4, args.n_centroids})
    recalls: dict[str, list[float]] = {}

    def note(name, got, want):
        recalls.setdefault(name, []).append(len(got & want) / len(want))

    for qi in q_ids:
        qv = X[qi]
        want = exact_topk(qv)
        flat = {
            r["vec_id"]
            for r in S.pq_topk(
                idx_raw.select("vec_id", "codes"), books_raw, qv, k=args.k
            ).collect()
        }
        note("pq_flat_raw", flat, want)
        for np_ in probes:
            got_raw = {
                r["vec_id"]
                for r in S.ivf_pq_topk(
                    idx_raw, cents, books_raw, qv, k=args.k, n_probe=np_
                ).collect()
            }
            note(f"ivfpq_raw_probe{np_}", got_raw, want)
            got_res = {
                r["vec_id"]
                for r in S.ivf_pq_topk(
                    idx_res, cents, books_res, qv, k=args.k, n_probe=np_,
                    residual=True,
                ).collect()
            }
            note(f"ivfpq_residual_probe{np_}", got_res, want)
            got_raw_rot = {
                r["vec_id"]
                for r in S.ivf_pq_topk(
                    idx_raw_rot, cents, books_raw_rot, qv, k=args.k,
                    n_probe=np_, rotation=R,
                ).collect()
            }
            note(f"ivfpq_raw_opq_probe{np_}", got_raw_rot, want)
            got_res_rot = {
                r["vec_id"]
                for r in S.ivf_pq_topk(
                    idx_res_rot, cents, books_res_rot, qv, k=args.k,
                    n_probe=np_, residual=True, rotation=R,
                ).collect()
            }
            note(f"ivfpq_residual_opq_probe{np_}", got_res_rot, want)

    out = {
        "metric": "clustered_vector_recall",
        "tag": args.tag,
        "fixture": {
            "n_vec": args.n_vec,
            "n_clusters": args.n_clusters,
            "dim": args.dim,
            "sigma": args.sigma,
            "anisotropy": args.anisotropy,
            "axis_aligned": args.axis_aligned,
            "seed": args.seed,
        },
        "index": {
            "n_centroids": args.n_centroids,
            "m": args.m,
            "ks": args.ks,
        },
        "k": args.k,
        "n_queries": args.n_queries,
        "models_train_sec": models_s,
        "recall": {
            name: round(float(np.mean(v)), 4) for name, v in recalls.items()
        },
    }
    line = json.dumps(out)
    print(line)
    with open(f"BENCH_vecrecall_{args.tag}.json", "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
