"""Query library.

Each module exposes:
    QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
    ORACLES: dict[str, str]   # ANSI SQL DuckDB equivalents (subset)

``__spark_entry__`` merges them for the driver's correctness gate.
Float aggregates are rounded in BOTH the Spark plan and the oracle so
that summation-order differences between engines cannot flip a value
hash.
"""
