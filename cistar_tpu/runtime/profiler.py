"""Per-op device-time table — the TRT layer-profiler, TPU-native.

The reference's engine driver registers a TensorRT ``IProfiler`` that
accumulates per-layer milliseconds over N iterations and prints a table with
a total (``p2pHD/run_engine.py:35-59,112-117``).  The XLA analogue built
here: capture an xprof trace with ``jax.profiler.trace``, parse the
serialized ``XSpace`` (``*.xplane.pb``) it writes, and aggregate the device
plane's ``"XLA Ops"`` line into per-op totals/percentages.

The XSpace wire format is decoded with a ~60-line protobuf varint reader so
the runtime depends on neither tensorflow nor the xprof pip packages (the
schema is the public ``tsl/profiler/protobuf/xplane.proto``; the subset of
field numbers used is validated round-trip in ``tests/test_profiler.py``).
"""

from __future__ import annotations

import glob
import os
import re
import tempfile
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

__all__ = [
    "parse_xspace",
    "load_xspace",
    "op_table",
    "format_op_table",
    "profile_op_table",
]


# ---------------------------------------------------------------------------
# Minimal protobuf wire-format reader (varint / length-delimited subset).
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf: bytes):
    """Yield ``(field_number, wire_type, value)`` for one message's bytes.

    Varints come back as ints; length-delimited fields as ``bytes`` slices;
    fixed32/fixed64 as raw bytes (unused by the XSpace subset we read).
    """
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:  # groups (3/4) never appear in xplane.proto
            raise ValueError(f"unsupported wire type {wt} at offset {i}")
        yield fno, wt, v


# ---------------------------------------------------------------------------
# XSpace subset model.
# ---------------------------------------------------------------------------

@dataclass
class XEvent:
    metadata_id: int
    offset_ps: int
    duration_ps: int


@dataclass
class XPlane:
    name: str = ""
    # metadata id -> (name, display_name)
    event_metadata: Dict[int, Tuple[str, str]] = field(default_factory=dict)
    # line name -> events
    lines: Dict[str, List[XEvent]] = field(default_factory=dict)


def _parse_event(buf: bytes) -> XEvent:
    mid = off = dur = 0
    for fno, _wt, v in _fields(buf):
        if fno == 1:
            mid = v
        elif fno == 2:
            off = v
        elif fno == 3:
            dur = v
    return XEvent(mid, off, dur)


def _parse_line(buf: bytes) -> Tuple[str, List[XEvent]]:
    name = ""
    display = ""
    events: List[XEvent] = []
    for fno, _wt, v in _fields(buf):
        if fno == 2:
            name = v.decode("utf-8", "replace")
        elif fno == 11:
            display = v.decode("utf-8", "replace")
        elif fno == 4:
            events.append(_parse_event(v))
    return (display or name), events


def _parse_event_metadata(buf: bytes) -> Tuple[int, str, str]:
    mid = 0
    name = ""
    display = ""
    for fno, _wt, v in _fields(buf):
        if fno == 1:
            mid = v
        elif fno == 2:
            name = v.decode("utf-8", "replace")
        elif fno == 4:
            display = v.decode("utf-8", "replace")
    return mid, name, display


def _parse_plane(buf: bytes) -> XPlane:
    plane = XPlane()
    for fno, _wt, v in _fields(buf):
        if fno == 2:
            plane.name = v.decode("utf-8", "replace")
        elif fno == 3:
            lname, events = _parse_line(v)
            plane.lines.setdefault(lname, []).extend(events)
        elif fno == 4:  # map<int64, XEventMetadata> entry {1: key, 2: value}
            key = None
            val = None
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    key = v2
                elif f2 == 2:
                    val = v2
            if val is not None:
                mid, name, display = _parse_event_metadata(val)
                plane.event_metadata[key if key is not None else mid] = (
                    name, display)
    return plane


def parse_xspace(data: bytes) -> List[XPlane]:
    """Parse serialized ``XSpace`` bytes into the plane subset we use."""
    return [_parse_plane(v) for fno, _wt, v in _fields(data) if fno == 1]


def load_xspace(logdir: str) -> List[XPlane]:
    """Find the newest ``*.xplane.pb`` under ``logdir`` and parse it."""
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {logdir}")
    path = max(paths, key=os.path.getmtime)
    with open(path, "rb") as f:
        return parse_xspace(f.read())


# ---------------------------------------------------------------------------
# Aggregation into the per-op table.
# ---------------------------------------------------------------------------

_HLO_NAME = re.compile(r"^%?([\w.\-]+)\s*=")


def _op_label(name: str, display: str) -> str:
    """A short label for one HLO instruction: the display name if the trace
    carries one, else the lhs of the instruction text (``%foo = ...``)."""
    if display:
        return display
    m = _HLO_NAME.match(name)
    return m.group(1) if m else (name[:60] or "<unnamed>")


def op_table(planes: Sequence[XPlane],
             plane_hint: str = "/device:") -> Tuple[List[Dict[str, Any]],
                                                    Dict[str, Any]]:
    """Aggregate a device plane's ``XLA Ops`` line into per-op rows.

    Returns ``(rows, totals)``: rows sorted by total time descending, each
    ``{op, count, total_ms, avg_us, pct}``; totals carry the device plane
    name, the summed device ms, the number of traced executable runs (from
    the ``XLA Modules`` line) and the derived per-run ms.
    """
    candidates = [p for p in planes if "XLA Ops" in p.lines]
    if not candidates:
        return [], {"plane": None, "total_ms": 0.0, "runs": 0,
                    "per_run_ms": 0.0}
    preferred = [p for p in candidates if plane_hint in p.name]
    plane = (preferred or candidates)[0]

    agg: Dict[str, Dict[str, Any]] = {}
    total_ps = 0
    for ev in plane.lines["XLA Ops"]:
        name, display = plane.event_metadata.get(ev.metadata_id, ("", ""))
        label = _op_label(name, display)
        row = agg.setdefault(label, {"op": label, "count": 0, "total_ps": 0})
        row["count"] += 1
        row["total_ps"] += ev.duration_ps
        total_ps += ev.duration_ps

    runs = len(plane.lines.get("XLA Modules", []))
    rows = []
    for row in sorted(agg.values(), key=lambda r: -r["total_ps"]):
        ms = row["total_ps"] / 1e9
        rows.append({
            "op": row["op"],
            "count": row["count"],
            "total_ms": ms,
            "avg_us": row["total_ps"] / row["count"] / 1e6,
            "pct": 100.0 * row["total_ps"] / total_ps if total_ps else 0.0,
        })
    totals = {
        "plane": plane.name,
        "total_ms": total_ps / 1e9,
        "runs": runs,
        "per_run_ms": total_ps / 1e9 / runs if runs else total_ps / 1e9,
    }
    return rows, totals


def format_op_table(rows: List[Dict[str, Any]], totals: Dict[str, Any],
                    top: Optional[int] = 30) -> str:
    """Render the TRT-profiler-style table (name, count, ms, avg µs, %)."""
    shown = rows if top is None else rows[:top]
    width = max([len(r["op"]) for r in shown] + [len("TOTAL (device)")])
    width = min(width, 64)
    lines = [
        f"per-op device time — plane {totals['plane']}"
        f" ({totals['runs']} traced runs)",
        f"{'op':<{width}}  {'count':>6}  {'total ms':>9}  "
        f"{'avg µs':>9}  {'%':>6}",
    ]
    for r in shown:
        lines.append(
            f"{r['op'][:width]:<{width}}  {r['count']:>6}  "
            f"{r['total_ms']:>9.3f}  {r['avg_us']:>9.1f}  {r['pct']:>6.2f}")
    if top is not None and len(rows) > top:
        rest_ms = sum(r["total_ms"] for r in rows[top:])
        rest_pct = sum(r["pct"] for r in rows[top:])
        lines.append(
            f"{f'... {len(rows) - top} more ops':<{width}}  {'':>6}  "
            f"{rest_ms:>9.3f}  {'':>9}  {rest_pct:>6.2f}")
    lines.append(
        f"{'TOTAL (device)':<{width}}  {'':>6}  "
        f"{totals['total_ms']:>9.3f}  {'':>9}  {100.0 if rows else 0.0:>6.2f}")
    if totals["runs"]:
        lines.append(f"per-run device time: {totals['per_run_ms']:.3f} ms")
    return "\n".join(lines)


def profile_op_table(fn: Callable, *example_args, iters: int = 10,
                     logdir: Optional[str] = None
                     ) -> Tuple[List[Dict[str, Any]], Dict[str, Any]]:
    """Trace ``iters`` executions of ``fn`` and return ``(rows, totals)``.

    The replacement for the reference's ``Profiler``-instrumented
    ``engine.run`` loop (``run_engine.py:112-117``): warm up (compile), trace
    steady-state iterations, aggregate per-op device time.
    """
    import jax
    import jax.numpy as jnp

    def _sync(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    out = fn(*example_args)
    _sync(out)
    logdir = logdir or tempfile.mkdtemp(prefix="cistar_opprof_")
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            out = fn(*example_args)
        _sync(out)
    return op_table(load_xspace(logdir))
