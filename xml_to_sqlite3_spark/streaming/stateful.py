"""Custom stateful streaming operators (applyInPandasWithState).

`streaming_exact_dedup` is the streaming form of
operators/dedup.exact_duplicates: documents whose content hash was
seen in ANY earlier micro-batch are dropped, with the seen-set held
in Spark-managed per-key state (checkpointable, exactly-once with
the sink). This is the standard online-ingest guard for a training
pipeline — the corpus grows continuously and duplicates must be
suppressed at arrival time, not in a nightly batch.

State is one boolean per distinct hash, partitioned by the hash key;
a GroupStateTimeout can bound retention when upstream guarantees an
arrival horizon.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "doc_id long, text string, text_md5 string"
_STATE_SCHEMA = "seen boolean"


def _dedup_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        return
    # winner within a micro-batch = smallest doc_id (deterministic
    # regardless of shuffle arrival order — what makes the streaming
    # result value-comparable to the batch dedup oracle); across
    # batches the earliest batch wins via the state bit.
    best = None
    for pdf in pdfs:
        # a non-numeric upstream id casts to NULL (NaN here); those
        # rows cannot win deterministically and idxmin over all-NaN
        # raises — drop them rather than kill the query
        pdf = pdf[pdf["doc_id"].notna()]
        if len(pdf) == 0:
            continue
        cand = pdf.loc[pdf["doc_id"].idxmin()]
        if best is None or cand["doc_id"] < best["doc_id"]:
            best = cand
    if best is not None:
        state.update((True,))
        yield pd.DataFrame(
            {
                "doc_id": [int(best["doc_id"])],
                "text": [best["text"]],
                "text_md5": [best["text_md5"]],
            }
        )


def streaming_exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep only the first-ever occurrence of each document text
    across the life of the stream. Input: streaming DataFrame with
    (doc_id, text). Output: (doc_id, text, text_md5)."""
    hashed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
        F.md5(F.col(text_col)).alias("text_md5"),
    )
    return hashed.groupBy("text_md5").applyInPandasWithState(
        _dedup_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
