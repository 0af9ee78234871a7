"""Sinks: parquet (canonical, distributed) and SQLite (compat)."""

from .parquet_sink import write_corpus_parquet  # noqa: F401
from .sqlite_sink import write_corpus_sqlite  # noqa: F401
