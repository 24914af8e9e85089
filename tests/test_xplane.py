"""xplane trace-reader unit test against a hand-encoded protobuf."""

import struct

from uda_clr_tpu.utils.xplane import op_totals, read_xspace


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def _field(num: int, wire: int, payload) -> bytes:
    tag = _varint((num << 3) | wire)
    if wire == 0:
        return tag + _varint(payload)
    return tag + _varint(len(payload)) + payload


def test_read_xspace_roundtrip(tmp_path):
    # XEventMetadata{id=7, name="matmul"}
    meta = _field(1, 0, 7) + _field(2, 2, b"matmul")
    # map entry {key=7, value=meta}
    entry = _field(1, 0, 7) + _field(2, 2, meta)
    # XEvent{metadata_id=7, offset_ps=100, duration_ps=2_000_000_000}
    ev = _field(1, 0, 7) + _field(2, 0, 100) + _field(3, 0, 2_000_000_000)
    # XLine{name="XLA Ops", events=[ev, ev]}
    line = _field(2, 2, b"XLA Ops") + _field(4, 2, ev) + _field(4, 2, ev)
    # XPlane{name="/device:TPU:0", lines=[line], event_metadata={7: ...}}
    plane = _field(2, 2, b"/device:TPU:0") + _field(3, 2, line) + _field(4, 2, entry)
    space = _field(1, 2, plane)

    p = tmp_path / "test.xplane.pb"
    p.write_bytes(space)

    planes = read_xspace(str(p))
    assert len(planes) == 1
    assert planes[0]["name"] == "/device:TPU:0"
    assert planes[0]["event_names"] == {7: "matmul"}
    assert planes[0]["lines"][0]["events"] == [(7, 100, 2_000_000_000)] * 2

    totals = op_totals(str(p), plane_filter="TPU")
    assert totals == [("matmul", 4.0, 2)]  # 2 x 2ms
