"""Distributed XML corpus ingestion.

Reference behavior (lib/document_parser.rb):
  - scan a directory tree for ``*.xml`` (main.rb:67)
  - document id = file basename sans extension (document_parser.rb:10)
  - extract ONLY elements carrying an ``id`` attribute
    (document_parser.rb:24 ``doc.xpath('//*[@id]')``)
  - node_type = element name; parent_id = the DIRECT parent's id (or
    NULL when the parent has no id); position = index among ALL
    element siblings; content = concatenated descendant text,
    stripped (nokogiri ``.text``); xpath = nokogiri-style node path
    (document_parser.rb:26-60)
  - every non-``id`` attribute becomes a property row
    (document_parser.rb:39-53)
  - files that fail to parse are skipped with a warning
    (lib/async_processor.rb:66-73)

Spark-first design: the directory scan is a ``binaryFile`` read (file
granularity == split granularity, embarrassingly parallel, no driver
involvement); parsing runs in ``mapInPandas`` so files travel to
Python as Arrow batches; the parser emits ONE narrow node table with
the attributes nested as an array column, and the relational
projections (documents / nodes / node_properties) are cheap
DataFrame selects on top. Type inference runs JVM-side afterwards
(functions/type_inference.py) — not in Python.

At 100 TB: millions of files spread across executors; parse cost is
per-file and independent; output is columnar immediately. Documents
too large for one task should be pre-chunked upstream — same
constraint as any whole-file format (the reference is also
whole-file: nokogiri DOM-parses each file in memory).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import NamedTuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.type_inference import infer_type

# One row per extracted node; attributes nested, exploded later.
_PARSE_SCHEMA = (
    "document_id string, filename string, file_size long, parse_error string, "
    "id string, node_type string, parent_id string, position int, "
    "content string, xpath string, ordinal long, "
    "attributes array<struct<property_name: string, property_value: string>>, "
    "file_hash string"
)


class XmlCorpus(NamedTuple):
    """The reference's relational model as three DataFrames."""

    documents: DataFrame
    nodes: DataFrame
    properties: DataFrame
    errors: DataFrame


def _local_name(tag: str) -> str:
    # ElementTree namespaces tags as '{uri}local'; the reference
    # (nokogiri element.name) reports the local name.
    return tag.rsplit("}", 1)[-1] if tag.startswith("{") else tag


def _parse_one(content: bytes, path: str, size: int) -> list[tuple]:
    """Parse one XML file to node rows. Pure function — no Spark."""
    import xml.etree.ElementTree as ET

    document_id = os.path.splitext(os.path.basename(path))[0]
    rows: list[tuple] = []
    try:
        root = ET.fromstring(content)
    except ET.ParseError as exc:
        return [(document_id, path, size, f"parse error: {exc}",
                 None, None, None, None, None, None, None, None)]

    # Preorder walk (document order): the reference's writer upserts
    # rows in parse order, so in-file duplicate ids resolve to the
    # LAST occurrence (test_edge_cases.rb test_xml_with_duplicate_ids);
    # ``ordinal`` records that order for deterministic distributed
    # last-writer-wins.
    stack = [(root, None, None)]  # (element, parent_element, xpath)
    ordinal = 0

    def xpath_for(el, parent, parent_path) -> str:
        name = _local_name(el.tag)
        if parent is None:
            return f"/{name}"
        siblings = [c for c in parent if isinstance(c.tag, str)]
        same_named = [c for c in siblings if _local_name(c.tag) == name]
        if len(same_named) > 1:
            idx = next(i for i, c in enumerate(same_named, 1) if c is el)
            return f"{parent_path}/{name}[{idx}]"
        return f"{parent_path}/{name}"

    while stack:
        el, parent, parent_path = stack.pop()
        if not isinstance(el.tag, str):  # comments / PIs
            continue
        my_path = xpath_for(el, parent, parent_path)

        el_id = el.get("id")
        if el_id is not None:
            if parent is not None:
                siblings = [c for c in parent if isinstance(c.tag, str)]
                position = next(i for i, c in enumerate(siblings) if c is el)
                parent_id = parent.get("id")
            else:
                position = 0
                parent_id = None
            content_text = "".join(el.itertext()).strip()
            attrs = [
                {"property_name": _local_name(k), "property_value": v}
                for k, v in el.attrib.items()
                if _local_name(k) != "id"
            ]
            rows.append(
                (
                    document_id,
                    path,
                    size,
                    None,
                    el_id,
                    _local_name(el.tag),
                    parent_id,
                    position,
                    content_text,
                    my_path,
                    ordinal,
                    attrs,
                )
            )
            ordinal += 1
        # push children reversed so the stack pops them in document order
        for child in reversed(list(el)):
            stack.append((child, el, my_path))

    if not rows:
        # Document with no id-bearing nodes still gets a documents row.
        rows.append((document_id, path, size, None,
                     None, None, None, None, None, None, None, None))
    return rows


# Files at or above this size parse via the expat streaming path —
# memory stays O(open-element stack + emitted rows + accumulated text
# of open id-bearing elements) instead of O(whole DOM). A 2 GB
# document with sparse ids parses in a few hundred MB of Python heap
# where the DOM path would need ~5-10x the file size.
STREAM_THRESHOLD_BYTES = 32 * 1024 * 1024


def _parse_one_stream(content: bytes, path: str, size: int) -> list[tuple]:
    """Streaming (expat/SAX) equivalent of _parse_one for large files.

    Row-for-row identical output (tests/test_xml_source.py parity
    suite). The only deferred decision is the nokogiri-style xpath
    index (``name[i]`` appears only when an element has 2+ same-named
    siblings — not knowable until the parent closes), so each row
    holds segment CELLS finalized at parent close and rendered at
    document end. Everything else — position among element siblings,
    preorder ordinal, descendant text — is computable forward-only.
    """
    from xml.parsers import expat

    document_id = os.path.splitext(os.path.basename(path))[0]

    # stack entry per open element:
    # [lname, el_id, cell, child_count, same_counts, texts|None,
    #  needed_cells, registered]
    # cell = [lname, ordinal_among_same_named, show_idx]
    stack: list[list] = []
    rows: list[list] = []
    ordinal = 0

    def on_start(name: str, attrs: dict) -> None:
        nonlocal ordinal
        lname = name.rsplit("}", 1)[-1]
        parent = stack[-1] if stack else None
        if parent is not None:
            position = parent[3]
            parent[3] += 1
            cnt = parent[4].get(lname, 0) + 1
            parent[4][lname] = cnt
        else:
            position = 0
            cnt = 1
        cell = [lname, cnt, False]
        el_id = None
        props = []
        for k, v in attrs.items():
            kl = k.rsplit("}", 1)[-1]
            if k == "id":
                # only the PLAIN unnamespaced attribute is the node id
                # (nokogiri element['id']; the DOM path's el.get("id")
                # likewise never matches '{uri}id') — expat with
                # namespace_separator='}' delivers namespaced ids as
                # 'uri}id', which must neither become the node id nor
                # a property (DOM parity: _local_name(k) == 'id' is
                # excluded from properties)
                el_id = v
            elif kl != "id":
                props.append({"property_name": kl, "property_value": v})
        entry = [lname, el_id, cell, 0, {}, None, [], False]
        if el_id is not None:
            entry[5] = []  # text accumulator — this element emits
            # register each un-registered ancestor cell with ITS
            # parent so the parent finalizes the [idx] decision at
            # close; stops at the first already-registered ancestor
            prev = entry
            for anc in reversed(stack):
                if prev[7]:
                    break
                anc[6].append(prev[2])
                prev[7] = True
                prev = anc
            rows.append(
                [
                    document_id,
                    path,
                    size,
                    None,
                    el_id,
                    lname,
                    parent[1] if parent is not None else None,
                    position,
                    None,  # content filled at close
                    [e[2] for e in stack] + [cell],  # path cells
                    ordinal,
                    props,
                ]
            )
            entry.append(rows[-1])  # back-ref for content fill
            ordinal += 1
        stack.append(entry)

    def on_chars(data: str) -> None:
        for e in stack:
            if e[5] is not None:
                e[5].append(data)

    def on_end(_name: str) -> None:
        e = stack.pop()
        for cell in e[6]:
            cell[2] = e[4][cell[0]] > 1
        if e[5] is not None:
            e[8][8] = "".join(e[5]).strip()

    parser = expat.ParserCreate(namespace_separator="}")
    parser.buffer_text = True
    parser.StartElementHandler = on_start
    parser.EndElementHandler = on_end
    parser.CharacterDataHandler = on_chars
    try:
        parser.Parse(content, True)
    except expat.ExpatError as exc:
        return [(document_id, path, size, f"parse error: {exc}",
                 None, None, None, None, None, None, None, None)]

    if not rows:
        return [(document_id, path, size, None,
                 None, None, None, None, None, None, None, None)]
    out = []
    for r in rows:
        xpath = "/" + "/".join(
            f"{c[0]}[{c[1]}]" if c[2] else c[0] for c in r[9]
        )
        out.append(
            (r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7], r[8], xpath,
             r[10], r[11])
        )
    return out


def _parse_dispatch(content: bytes, path: str, size: int) -> list[tuple]:
    if len(content) >= STREAM_THRESHOLD_BYTES:
        return _parse_one_stream(content, path, size)
    return _parse_one(content, path, size)


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [
        "document_id",
        "filename",
        "file_size",
        "parse_error",
        "id",
        "node_type",
        "parent_id",
        "position",
        "content",
        "xpath",
        "ordinal",
        "attributes",
        "file_hash",
    ]
    import hashlib

    for pdf in batches:
        out: list[tuple] = []
        for path, size, content in zip(pdf["path"], pdf["length"], pdf["content"]):
            if path.startswith("file:"):
                from urllib.parse import urlparse

                local = urlparse(path).path  # 'file:///a/b.xml' -> '/a/b.xml'
            else:
                local = path
            b = bytes(content)
            # documents.file_hash (001_create_base_schema.rb:14 —
            # declared by the reference schema; md5 of the raw bytes)
            fh = hashlib.md5(b).hexdigest()
            out.extend(r + (fh,) for r in _parse_dispatch(b, local, int(size)))
        yield pd.DataFrame(out, columns=cols)


def read_xml_corpus(
    spark: SparkSession,
    input_dir: str,
    glob: str = "*.xml",
    recursive: bool = True,
) -> XmlCorpus:
    """Scan a directory of XML files into the reference's relational
    model: (documents, nodes, properties, errors) DataFrames."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true" if recursive else "false")
        .load(input_dir)
        .select("path", "length", "content")
    )

    parsed = files.mapInPandas(_parse_batches, schema=_PARSE_SCHEMA)
    # The parse feeds three projections — materialize it once.
    # localCheckpoint, not persist: repeated calls in one session
    # (gate + bench both run xml_nodes_roundtrip) would otherwise
    # pin a cached copy per call with no release path; checkpoint
    # blocks are freed when the frames are garbage-collected.
    parsed = parsed.localCheckpoint(eager=True)
    return corpus_from_parsed(parsed)


def corpus_from_parsed(parsed: DataFrame) -> XmlCorpus:
    """Project raw parsed node rows (_PARSE_SCHEMA) into the
    reference's relational model — shared by the batch reader and the
    streaming foreachBatch sink, so both paths produce byte-identical
    tables from the same parse."""
    documents = (
        parsed.groupBy("document_id")
        .agg(
            F.first("filename").alias("filename"),
            F.first("file_size").alias("file_size"),
            F.first("file_hash").alias("file_hash"),
        )
        .withColumn("parsed_at", F.current_timestamp())
        .select(
            F.col("document_id").alias("id"),
            "filename",
            "file_size",
            "file_hash",
            "parsed_at",
        )
    )

    nodes = (
        parsed.filter(F.col("id").isNotNull())
        .select(
            "id",
            "node_type",
            "document_id",
            "parent_id",
            "position",
            "content",
            "xpath",
            "ordinal",
        )
        .withColumn("created_at", F.current_timestamp())
    )

    properties = (
        parsed.filter(F.col("id").isNotNull() & (F.size("attributes") > 0))
        .select(
            F.col("id").alias("node_id"),
            "ordinal",
            F.explode("attributes").alias("attr"),
        )
        .select(
            "node_id",
            F.col("attr.property_name").alias("property_name"),
            F.col("attr.property_value").alias("property_value"),
            "ordinal",
        )
        .withColumn("data_type", infer_type(F.col("property_value")))
    )

    errors = parsed.filter(F.col("parse_error").isNotNull()).select(
        "document_id", "filename", "parse_error"
    )

    return XmlCorpus(documents=documents, nodes=nodes, properties=properties, errors=errors)


def dedupe_last_writer(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """INSERT OR REPLACE semantics (lib/database_writer.rb:44-56):
    duplicate primary keys keep exactly one row. The reference's
    winner is arrival order (nondeterministic under its async
    producers); we make it deterministic: max(order_col) wins."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*key_cols).orderBy(F.desc(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
