"""Auto-generated per-node-type views.

The reference stubs this out (main.rb:96-103 `create_views` iterates
DISTINCT node_type but the body is commented); the README roadmap
lists it as planned. Implemented both ways here:

- Spark: temp views `nodes_<type>` over the corpus (queryable via
  spark.sql immediately).
- SQLite sink: real `CREATE VIEW` statements in the output database.
"""

from __future__ import annotations

import re
import sqlite3

from pyspark.sql import DataFrame, SparkSession


def _safe(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", name)


def create_node_type_views(
    spark: SparkSession, nodes: DataFrame, max_types: int = 10_000
) -> list[str]:
    """Register a temp view per node_type. Returns the view names.

    The DISTINCT node_type collect below is driver-side by design:
    node types are a SCHEMA-sized vocabulary (tag names in the XML
    grammar — tens, not millions; one view must be issued per type
    from the driver regardless). ``max_types`` is the loud guard for
    the degenerate corpus whose "types" are data (e.g. ids leaked
    into tag names) — that would otherwise register millions of temp
    views one catalog call at a time.
    """
    types = [r["node_type"] for r in nodes.select("node_type").distinct().collect()]
    if len(types) > max_types:
        raise ValueError(
            f"create_node_type_views: {len(types)} distinct node types "
            f"exceed max_types={max_types}; node types should be a "
            "schema-sized vocabulary — the corpus likely leaks data "
            "into tag names, or raise max_types explicitly"
        )
    names = []
    nodes.createOrReplaceTempView("nodes")
    for t in sorted(types):
        view = f"nodes_{_safe(t)}"
        spark.sql(
            f"CREATE OR REPLACE TEMP VIEW {view} AS "
            f"SELECT * FROM nodes WHERE node_type = '{t.replace(chr(39), chr(39)*2)}'"
        )
        names.append(view)
    return names


def create_sqlite_node_type_views(db_path: str) -> list[str]:
    """Add per-type SQL views to a written SQLite database."""
    con = sqlite3.connect(db_path)
    types = [r[0] for r in con.execute("SELECT DISTINCT node_type FROM nodes")]
    names = []
    for t in sorted(types):
        view = f"nodes_{_safe(t)}"
        quoted = t.replace("'", "''")
        con.execute(f"DROP VIEW IF EXISTS {view}")
        con.execute(
            f"CREATE VIEW {view} AS SELECT * FROM nodes WHERE node_type = '{quoted}'"
        )
        names.append(view)
    con.commit()
    con.close()
    return names
