#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing testdata dir by
deterministic k-fold replication with id-space offsets — the scaling
HARNESS for measuring how the engine's plans grow from sf0.1 to sf1
(SURVEY.md §6 records the exponents). NOT a TPC-H generator: row
distributions within each copy are identical to the source; what the
replication preserves is exactly what scaling measurements need —
foreign-key integrity (every id column of a table family shifts by
the same per-copy offset), per-copy join fan-outs, and group
cardinalities growing k-fold where they should.

Two columns must NOT be copied verbatim:

- documents.text: identical copies would make every cross-copy pair
  an exact/near duplicate — the dedup operators' pair count would
  grow k^2-fold BY CONSTRUCTION and any scaling measurement of them
  would be meaningless. Each copy i>0 suffixes every word with the
  copy tag, so every shingle differs across copies: within-copy
  near-dup structure is preserved k times, cross-copy similarity
  drops to ~0, and dedup work scales linearly like a real corpus.
- embeddings.embedding: identical vectors would likewise make
  cosine near-dup and ANN top-k degenerate. Each copy i>0 adds a
  deterministic pseudo-random (md5-seeded) perturbation and
  re-normalizes, keeping the distribution's shape.

Usage: python scripts/make_sf.py [--src /root/testdata/sf0.1]
                                 [--out /tmp/spark_graft_sf1] [--k 10]
"""

from __future__ import annotations

import argparse
import hashlib
import os

import numpy as np
import pandas as pd

# id-space offsets: far above any source max id so copies never collide
OFF = 100_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_sf1")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .appName("make_sf")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    def copies(name: str, id_cols: dict[str, int]):
        """Union of k copies with each id column shifted i*offset."""
        base = spark.read.parquet(f"{args.src}/{name}.parquet")
        parts = []
        for i in range(args.k):
            c = base
            for col, mult in id_cols.items():
                c = c.withColumn(col, (F.col(col) + F.lit(i * mult * OFF)).cast("long"))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # dimension constants: verbatim
    for name in ("region", "nation"):
        spark.read.parquet(f"{args.src}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{args.out}/{name}.parquet")

    copies("customer", {"c_custkey": 1}).write.mode("overwrite").parquet(
        f"{args.out}/customer.parquet"
    )
    copies("supplier", {"s_suppkey": 1}).write.mode("overwrite").parquet(
        f"{args.out}/supplier.parquet"
    )
    copies("part", {"p_partkey": 1}).write.mode("overwrite").parquet(
        f"{args.out}/part.parquet"
    )
    copies("orders", {"o_orderkey": 1, "o_custkey": 1}).write.mode(
        "overwrite"
    ).parquet(f"{args.out}/orders.parquet")
    copies(
        "lineitem", {"l_orderkey": 1, "l_partkey": 1, "l_suppkey": 1}
    ).write.mode("overwrite").parquet(f"{args.out}/lineitem.parquet")
    copies("events", {"event_id": 1, "user_id": 1}).write.mode(
        "overwrite"
    ).parquet(f"{args.out}/events.parquet")

    # documents: word-suffix perturbation per copy (see module doc)
    docs = spark.read.parquet(f"{args.src}/documents.parquet")
    parts = []
    for i in range(args.k):
        c = docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(i * OFF)).cast("long")
        )
        if i > 0:
            tag = f"x{i}"
            c = c.withColumn(
                "text",
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1{tag}"),
            ).withColumn("n_chars", F.length("text").cast("long"))
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{args.out}/documents.parquet")

    # embeddings: deterministic perturbation + renormalize per copy
    emb = spark.read.parquet(f"{args.src}/embeddings.parquet")
    k = args.k

    def perturb(batches):
        for pdf in batches:
            rows = []
            for vid, vec, label in zip(
                pdf["vec_id"], pdf["embedding"], pdf["label"]
            ):
                v = np.asarray(vec, dtype=np.float64)
                nrm = np.linalg.norm(v) or 1.0
                for i in range(k):
                    if i == 0:
                        w = v
                    else:
                        seed = int.from_bytes(
                            hashlib.md5(f"{int(vid)}|{i}".encode()).digest()[:8],
                            "big",
                        )
                        rng = np.random.default_rng(seed)
                        noise = rng.standard_normal(v.shape)
                        noise *= 0.5 * nrm / (np.linalg.norm(noise) or 1.0)
                        w = v + noise
                        wn = np.linalg.norm(w)
                        if wn > 0:
                            w = w * (nrm / wn)
                    rows.append(
                        (
                            int(vid) + i * OFF,
                            w.astype(np.float32).tolist(),
                            int(label),
                        )
                    )
            yield pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])

    emb.mapInPandas(
        perturb, schema="vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{args.out}/embeddings.parquet")

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        n = spark.read.parquet(f"{args.out}/{t}.parquet").count()
        print(t, n)
    spark.stop()


if __name__ == "__main__":
    main()
