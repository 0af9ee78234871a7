"""Large-document XML path: the expat streaming parser keeps task
memory bounded by emitted rows + open-element state, not by the DOM.

The reference DOM-parses each file whole (document_parser.rb: nokogiri
``Nokogiri::XML``), which is also our small-file path; files at or
above STREAM_THRESHOLD_BYTES route through _parse_one_stream so a
multi-GB document cannot blow a task's heap (SURVEY §4's large-file
concern). These tests generate a multi-MB document with SPARSE ids —
the shape where streaming wins — and assert (1) row parity with the
DOM path, (2) a measured Python-heap peak well under the DOM path's.
"""

from __future__ import annotations

import tracemalloc

from xml_to_sqlite3_spark.sources.xml_source import (
    STREAM_THRESHOLD_BYTES,
    _parse_dispatch,
    _parse_one,
    _parse_one_stream,
)


def _big_xml(target_mb: float = 6.0) -> bytes:
    """Deep/wide document, ~1 id-bearing element per 200 elements."""
    parts = [b"<corpus>"]
    i = 0
    size = 0
    while size < target_mb * 1024 * 1024:
        chunk = []
        chunk.append(f'<record id="r{i}" kind="batch">'.encode())
        for j in range(200):
            # id-less filler elements with text — pure DOM weight
            chunk.append(
                f"<field pos=\"{j}\">value text payload {i} {j} "
                f"lorem ipsum dolor sit amet</field>".encode()
            )
        chunk.append(b"</record>")
        blob = b"".join(chunk)
        parts.append(blob)
        size += len(blob)
        i += 1
    parts.append(b"</corpus>")
    return b"".join(parts)


def _peak_bytes(fn, *args) -> tuple[object, int]:
    tracemalloc.start()
    try:
        out = fn(*args)
        _, peak = tracemalloc.get_traced_memory()
    finally:
        tracemalloc.stop()
    return out, peak


def test_streaming_parity_and_memory_bound_on_big_file():
    data = _big_xml(6.0)
    dom_rows, dom_peak = _peak_bytes(_parse_one, data, "/tmp/big.xml", len(data))
    st_rows, st_peak = _peak_bytes(
        _parse_one_stream, data, "/tmp/big.xml", len(data)
    )
    assert st_rows == dom_rows
    assert len(st_rows) > 100
    # the DOM path materializes every element; the streaming path only
    # the emitted rows + open stack. On this id-sparse shape that is a
    # multiple — assert a conservative 2x so the test stays robust to
    # allocator noise, and assert an absolute bound relative to input.
    assert st_peak * 2 < dom_peak, (st_peak, dom_peak)
    assert st_peak < len(data) * 1.5, (st_peak, len(data))


def test_dispatch_routes_by_size():
    small = b'<r><a id="1">x</a></r>'
    assert _parse_dispatch(small, "s.xml", len(small)) == _parse_one(
        small, "s.xml", len(small)
    )
    # the dispatcher must route anything >= threshold to streaming:
    # build a just-over-threshold doc cheaply by padding text
    pad = b"<pad>" + b"x" * STREAM_THRESHOLD_BYTES + b"</pad>"
    big = b'<r><a id="1">y</a>' + pad + b"</r>"
    rows = _parse_dispatch(big, "b.xml", len(big))
    assert rows == _parse_one_stream(big, "b.xml", len(big))
    assert [r[4] for r in rows if r[4]] == ["1"]


def test_namespaced_id_parity_between_dom_and_stream():
    """A namespaced x:id is NOT a node id (nokogiri element['id'])
    and NOT a property, identically in both parse paths."""
    from xml_to_sqlite3_spark.sources.xml_source import (
        _parse_one,
        _parse_one_stream,
    )

    xml = (
        b'<root xmlns:x="u" id="r">'
        b'<item x:id="a" keep="1"/>'
        b'<item id="b" x:id="zzz"/>'
        b"</root>"
    )
    dom = _parse_one(xml, "/t.xml", len(xml))
    stream = _parse_one_stream(xml, "/t.xml", len(xml))

    def ids(rows):
        return sorted(r[4] for r in rows if r[4] is not None)

    def props(rows):
        return sorted(
            (r[4], a["property_name"])
            for r in rows
            if r[4] is not None and r[11]
            for a in r[11]
        )

    assert ids(dom) == ids(stream) == ["b", "r"]
    assert props(dom) == props(stream)
    # x:id never leaks into properties
    assert all(name != "id" for _, name in props(dom))
