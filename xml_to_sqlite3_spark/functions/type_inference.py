"""Data-type inference for property values.

Reference: lib/document_parser.rb:62-77 (`infer_type`) — checked in
order integer, float, boolean, datetime, else string; date/time
patterns are PREFIX matches (Ruby `/^.../` without `$`), boolean is
case-insensitive full match; nil/empty => 'string'.

Implemented as a pure Column expression so inference runs inside
whole-stage codegen — no Python in the path, works at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def infer_type(value: Column) -> Column:
    """Infer the reference's data_type label for a string column."""
    return (
        F.when(value.isNull() | (value == ""), F.lit("string"))
        .when(value.rlike(r"^[0-9]+$"), F.lit("integer"))
        .when(value.rlike(r"^[0-9]+\.[0-9]+$"), F.lit("float"))
        .when(F.lower(value).rlike(r"^(true|false)$"), F.lit("boolean"))
        .when(
            value.rlike(r"^[0-9]{4}-[0-9]{2}-[0-9]{2}")
            | value.rlike(r"^[0-9]{2}:[0-9]{2}:[0-9]{2}"),
            F.lit("datetime"),
        )
        .otherwise(F.lit("string"))
    )
