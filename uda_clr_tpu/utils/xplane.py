"""Minimal XSpace/XPlane protobuf reader for jax.profiler traces.

The environment's tensorboard profile plugin is incompatible with its
protobuf runtime, so this decodes the xplane wire format directly (the
fields used are stable across TF/XLA versions):

  XSpace   { repeated XPlane planes = 1; }
  XPlane   { int64 id=1; string name=2; repeated XLine lines=3;
             map<int64,XEventMetadata> event_metadata=4; }
  XLine    { int64 id=1; string name=2; repeated XEvent events=4; }
  XEvent   { int64 metadata_id=1; int64 offset_ps=2; int64 duration_ps=3; }
  XEventMetadata { int64 id=1; string name=2; }

Usage:
    from uda_clr_tpu.utils.xplane import op_totals, read_xspace
    totals = op_totals("/tmp/trace/plugins/profile/<ts>/<host>.xplane.pb")
"""

from __future__ import annotations

import collections
import glob
import os


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = bytes(buf[pos : pos + 4])
            pos += 4
        elif wire == 1:  # 64-bit
            val = bytes(buf[pos : pos + 8])
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def read_xspace(path: str):
    """Parse an .xplane.pb into
    [{'name', 'event_names': {id: name}, 'lines': [{'name', 'events':
    [(metadata_id, offset_ps, duration_ps)]}]}]."""
    data = memoryview(open(path, "rb").read())
    planes = []
    for f, w, v in _fields(data):
        if f != 1 or w != 2:
            continue
        plane = {"name": "", "event_names": {}, "lines": []}
        for pf, pw, pv in _fields(v):
            if pf == 2 and pw == 2:
                plane["name"] = bytes(pv).decode("utf-8", "replace")
            elif pf == 3 and pw == 2:  # XLine
                line = {"name": "", "events": []}
                for lf, lw, lv in _fields(pv):
                    if lf == 2 and lw == 2:
                        line["name"] = bytes(lv).decode("utf-8", "replace")
                    elif lf == 4 and lw == 2:  # XEvent
                        mid = off = dur = 0
                        for ef, ew, ev in _fields(lv):
                            if ef == 1 and ew == 0:
                                mid = ev
                            elif ef == 2 and ew == 0:
                                off = ev
                            elif ef == 3 and ew == 0:
                                dur = ev
                        line["events"].append((mid, off, dur))
                plane["lines"].append(line)
            elif pf == 4 and pw == 2:  # map entry event_metadata
                key = None
                meta_name = ""
                for mf, mw, mv in _fields(pv):
                    if mf == 1 and mw == 0:
                        key = mv
                    elif mf == 2 and mw == 2:  # XEventMetadata
                        for ef, ew, ev in _fields(mv):
                            if ef == 2 and ew == 2:
                                meta_name = bytes(ev).decode("utf-8", "replace")
                            elif ef == 1 and ew == 0 and key is None:
                                key = ev
                if key is not None:
                    plane["event_names"][key] = meta_name
        planes.append(plane)
    return planes


def op_totals(path: str, plane_filter: str = "TPU", top: int = 30):
    """Aggregate per-op total duration (ms) on matching device planes."""
    tot = collections.Counter()
    cnt = collections.Counter()
    for plane in read_xspace(path):
        if plane_filter.lower() not in plane["name"].lower():
            continue
        names = plane["event_names"]
        for line in plane["lines"]:
            for mid, _off, dur in line["events"]:
                name = names.get(mid, f"#{mid}")
                tot[name] += dur / 1e9  # ps -> ms
                cnt[name] += 1
    return [(name, ms, cnt[name]) for name, ms in tot.most_common(top)]


def latest_trace(trace_dir: str) -> str:
    files = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    return max(files, key=os.path.getmtime)
