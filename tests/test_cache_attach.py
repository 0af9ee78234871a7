"""Cold-attach contract for the two persistent content-keyed caches.

The graph store (plans/node_graph.get_graph) and the BM25 text index
(operators/search.get_text_index) are built once per CONTENT and
attached by every later session — the warm path bench, the driver
gate, and repeated dev sessions all depend on. This test pins that
contract end-to-end: publish from THIS session, then attach from a
genuinely NEW process/SparkSession and prove the attach ran ZERO
builds (the build callable never fires) while still serving data.
"""

from __future__ import annotations

import os
import subprocess
import sys

SF_DIR = "/root/testdata/sf0.001"

_ATTACH_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
import xml_to_sqlite3_spark.cache_util as cu

calls = []
_orig = cu.content_cached_dir

def counting(root, key, build, owned_dirs=None):
    def spy(tmp):
        calls.append(key)
        return build(tmp)
    return _orig(root, key, spy, owned_dirs=owned_dirs)

cu.content_cached_dir = counting

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from xml_to_sqlite3_spark.plans.node_graph import get_graph
from xml_to_sqlite3_spark.operators.search import get_text_index

nodes, props, xrefs = get_graph(spark, {sf!r})
n = nodes.count()
idx, n_docs, avgdl = get_text_index(
    spark, {sf!r} + "/documents.parquet"
)
i = idx.limit(1).count()
print(f"BUILDS={{len(calls)}} NODES={{n}} IDX={{i}} NDOCS={{n_docs}}")
spark.stop()
"""


def test_cold_attach_runs_zero_builds(spark):
    # publish (or refresh) both entries from THIS session first
    from xml_to_sqlite3_spark.operators.search import get_text_index
    from xml_to_sqlite3_spark.plans.node_graph import get_graph

    nodes, _, _ = get_graph(spark, SF_DIR)
    assert nodes.count() > 0
    _, n_docs, _ = get_text_index(spark, f"{SF_DIR}/documents.parquet")
    assert n_docs > 0

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _ATTACH_SCRIPT.format(repo=repo, sf=SF_DIR)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=repo,
    )
    out = proc.stdout.strip().splitlines()
    assert proc.returncode == 0, f"attach process failed:\n{proc.stderr[-2000:]}"
    marker = [line for line in out if line.startswith("BUILDS=")]
    assert marker, f"no attach marker in output: {out[-5:]}"
    fields = dict(kv.split("=") for kv in marker[0].split())
    assert fields["BUILDS"] == "0", (
        "a cold session re-BUILT a published cache entry instead of "
        f"attaching: {marker[0]} — the content key is unstable across "
        "processes (code-digest or input-stat drift)"
    )
    assert int(fields["NODES"]) > 0
    assert int(fields["IDX"]) > 0
