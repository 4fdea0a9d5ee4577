"""Lightweight XSpace/.xplane.pb reader — no tensorboard-plugin-profile needed.

`jax.profiler.trace` (wired into `audioldm-tpu train --profile-dir`, see
audioldm_tpu/utils/profiling.py) writes protobuf traces at
``<logdir>/plugins/profile/<run>/<host>.xplane.pb``. The usual viewer
(tensorboard-plugin-profile / xprof) is not installed in this image, so this
tool decodes the protobuf wire format directly and aggregates event durations
per plane — enough to see where a step's time goes without any UI.

Field numbers follow tsl/profiler/protobuf/xplane.proto:
  XSpace.planes=1; XPlane{id=1,name=2,lines=3,event_metadata=4}
  XLine{id=1,name=2,events=4}; XEvent{metadata_id=1,duration_ps=3}
  XEventMetadata{id=1,name=2,display_name=4} (map entries: key=1,value=2)

Usage:
  python tools/read_xplane.py <logdir-or-xplane.pb> [--top N] [--plane SUBSTR]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict


# ---------------------------------------------------------------- wire format

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one serialized message.

    Length-delimited values (wire type 2) are returned as raw bytes; varints
    as ints; fixed64/fixed32 as raw little-endian bytes (unused here).
    """
    pos, end = 0, len(buf)
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wtype = tag >> 3, tag & 7
        if wtype == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wtype == 1:  # fixed64
            val, pos = buf[pos:pos + 8], pos + 8
        elif wtype == 2:  # length-delimited
            n, pos = _read_varint(buf, pos)
            val, pos = buf[pos:pos + n], pos + n
        elif wtype == 5:  # fixed32
            val, pos = buf[pos:pos + 4], pos + 4
        else:
            raise ValueError(f"unsupported wire type {wtype} at {pos}")
        yield field, wtype, val


def _submessages(buf: bytes, field_no: int):
    for f, w, v in iter_fields(buf):
        if f == field_no and w == 2:
            yield v


def _first_varint(buf: bytes, field_no: int, default: int = 0) -> int:
    for f, w, v in iter_fields(buf):
        if f == field_no and w == 0:
            return v
    return default


def _first_str(buf: bytes, field_no: int, default: str = "") -> str:
    for f, w, v in iter_fields(buf):
        if f == field_no and w == 2:
            return v.decode("utf-8", "replace")
    return default


# ------------------------------------------------------------------- decoding

def parse_xspace(buf: bytes) -> list[dict]:
    """Decode an XSpace into [{name, lines, events: {name: (count, total_ps)}}]."""
    planes = []
    for plane_buf in _submessages(buf, 1):  # XSpace.planes
        # event_metadata: map<int64, XEventMetadata> — entry{key=1, value=2}
        meta_names: dict[int, str] = {}
        for entry in _submessages(plane_buf, 4):
            key = _first_varint(entry, 1)
            val = next(_submessages(entry, 2), b"")
            name = _first_str(val, 4) or _first_str(val, 2)  # display_name|name
            meta_names[key] = name
        events: dict[str, list[int]] = defaultdict(lambda: [0, 0])
        lines: list[dict] = []
        for line_buf in _submessages(plane_buf, 3):  # XPlane.lines
            lev: dict[str, list[int]] = defaultdict(lambda: [0, 0])
            for ev in _submessages(line_buf, 4):  # XLine.events
                mid = _first_varint(ev, 1)
                dur_ps = _first_varint(ev, 3)
                name = meta_names.get(mid, f"<meta:{mid}>")
                for slot in (events[name], lev[name]):
                    slot[0] += 1
                    slot[1] += dur_ps
            lines.append({
                "name": _first_str(line_buf, 11) or _first_str(line_buf, 2),
                "events": {k: tuple(v) for k, v in lev.items()},
            })
        planes.append({
            "name": _first_str(plane_buf, 2),
            "lines": len(lines),
            "line_details": lines,
            "events": {k: tuple(v) for k, v in events.items()},
        })
    return planes


def find_xplane_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    return hits


def summarize(path: str, top: int = 25, plane_filter: str = "",
              by_line: bool = False, out=sys.stdout) -> list[dict]:
    files = find_xplane_files(path)
    if not files:
        raise FileNotFoundError(f"no *.xplane.pb under {path}")
    all_planes = []
    for f in files:
        planes = parse_xspace(open(f, "rb").read())
        all_planes.extend(planes)
        print(f"# {f}", file=out)
        for p in planes:
            if plane_filter and plane_filter.lower() not in p["name"].lower():
                continue
            total_ps = sum(t for _, t in p["events"].values()) or 1
            print(f"\n== plane: {p['name']}  ({p['lines']} lines, "
                  f"{len(p['events'])} event types, "
                  f"{total_ps / 1e9:.3f} ms total)", file=out)
            ranked = sorted(p["events"].items(), key=lambda kv: -kv[1][1])
            for name, (cnt, ps) in ranked[:top]:
                print(f"  {ps / 1e9:9.3f} ms  {100 * ps / total_ps:5.1f}%  "
                      f"x{cnt:<6d} {name[:90]}", file=out)
            if by_line:
                for ln in p["line_details"]:
                    lt = sum(t for _, t in ln["events"].values())
                    if not lt:
                        continue
                    print(f"\n  -- line: {ln['name'] or '<unnamed>'}  "
                          f"({lt / 1e9:.3f} ms busy)", file=out)
                    lr = sorted(ln["events"].items(), key=lambda kv: -kv[1][1])
                    for name, (cnt, ps) in lr[:top]:
                        print(f"    {ps / 1e9:9.3f} ms  x{cnt:<6d} "
                              f"{name[:86]}", file=out)
    return all_planes


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("path", help="profile logdir or a single .xplane.pb file")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--plane", default="",
                    help="only show planes whose name contains this substring")
    ap.add_argument("--by-line", action="store_true",
                    help="also break events down per trace line (queue/thread)")
    args = ap.parse_args(argv)
    summarize(args.path, top=args.top, plane_filter=args.plane,
              by_line=args.by_line)


if __name__ == "__main__":
    main()
