"""Per-op profiler: XSpace wire-format parsing + live-trace aggregation.

The parser's field-number assumptions (xplane.proto subset) are validated by
encoding a synthetic XSpace with a local protobuf writer and parsing it back;
the integration test drives a real ``jax.profiler.trace`` and checks that
whatever planes the backend emits parse cleanly and aggregate into a table —
the TPU stand-in for the reference's TRT layer profiler
(``p2pHD/run_engine.py:35-59``).
"""

import numpy as np

from cistar_tpu.runtime import profiler as prof


# ---------------------------------------------------------------------------
# Tiny protobuf writer (mirror of the reader, used only to build fixtures).
# ---------------------------------------------------------------------------

def _varint(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_varint(fno, v):
    return _varint((fno << 3) | 0) + _varint(v)


def _field_bytes(fno, data):
    if isinstance(data, str):
        data = data.encode()
    return _varint((fno << 3) | 2) + _varint(len(data)) + data


def _event(mid, offset_ps, dur_ps):
    return (_field_varint(1, mid) + _field_varint(2, offset_ps)
            + _field_varint(3, dur_ps))


def _line(name, events, display=None):
    msg = _field_bytes(2, name)
    if display:
        msg += _field_bytes(11, display)
    for ev in events:
        msg += _field_bytes(4, ev)
    return msg


def _event_metadata(mid, name, display=""):
    msg = _field_varint(1, mid) + _field_bytes(2, name)
    if display:
        msg += _field_bytes(4, display)
    return msg


def _plane(name, lines, metadata):
    msg = _field_bytes(2, name)
    for ln in lines:
        msg += _field_bytes(3, ln)
    for mid, meta in metadata:
        entry = _field_varint(1, mid) + _field_bytes(2, meta)
        msg += _field_bytes(4, entry)
    return msg


def _synthetic_xspace():
    """One device plane: 2 module runs, 3 ops (one appearing twice)."""
    meta = [
        (1, _event_metadata(1, "%conv.3 = f32[1,8,8,4] convolution(...)")),
        (2, _event_metadata(2, "%fusion.1 = f32[1,8,8,4] fusion(...)",
                            display="in_act_fusion")),
        (3, _event_metadata(3, "jit_step(123)")),
    ]
    ops = _line("XLA Ops", [
        _event(1, 0, 4_000_000),       # conv: 4 µs
        _event(2, 4_000_000, 1_000_000),
        _event(1, 10_000_000, 4_000_000),
        _event(2, 14_000_000, 1_000_000),
    ])
    modules = _line("XLA Modules", [
        _event(3, 0, 5_000_000), _event(3, 10_000_000, 5_000_000)])
    host = _plane("/host:CPU", [_line("python", [_event(1, 0, 7)])],
                  [(1, _event_metadata(1, "PjitFunction(step)"))])
    dev = _plane("/device:TPU:0", [ops, modules], meta)
    return _field_bytes(1, dev) + _field_bytes(1, host)


def test_xspace_roundtrip_and_aggregation():
    planes = prof.parse_xspace(_synthetic_xspace())
    assert {p.name for p in planes} == {"/device:TPU:0", "/host:CPU"}
    dev = next(p for p in planes if p.name == "/device:TPU:0")
    assert set(dev.lines) == {"XLA Ops", "XLA Modules"}
    assert len(dev.lines["XLA Ops"]) == 4
    assert dev.event_metadata[2] == ("%fusion.1 = f32[1,8,8,4] fusion(...)",
                                     "in_act_fusion")

    rows, totals = prof.op_table(planes)
    assert totals["plane"] == "/device:TPU:0"
    assert totals["runs"] == 2
    # conv: 8 µs total across 2 occurrences; fusion: 2 µs.
    assert rows[0]["op"] == "conv.3" and rows[0]["count"] == 2
    np.testing.assert_allclose(rows[0]["total_ms"], 8e-3)
    np.testing.assert_allclose(rows[0]["pct"], 80.0)
    assert rows[1]["op"] == "in_act_fusion"  # display name wins
    np.testing.assert_allclose(totals["per_run_ms"], 5e-3)

    text = prof.format_op_table(rows, totals)
    assert "conv.3" in text and "TOTAL (device)" in text
    assert "per-run device time" in text


def test_format_op_table_truncates():
    rows = [{"op": f"op{i}", "count": 1, "total_ms": 1.0, "avg_us": 1.0,
             "pct": 2.0} for i in range(50)]
    totals = {"plane": "/device:TPU:0", "total_ms": 50.0, "runs": 1,
              "per_run_ms": 50.0}
    text = prof.format_op_table(rows, totals, top=10)
    assert "... 40 more ops" in text


def test_live_trace_parses(tmp_path):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x, w):
        return jnp.tanh(x @ w)

    x = jnp.ones((128, 128))
    f(x, x).block_until_ready()
    logdir = str(tmp_path / "trace")
    with jax.profiler.trace(logdir):
        out = f(x, x)
        out.block_until_ready()
    planes = prof.load_xspace(logdir)
    assert planes, "trace produced no planes"
    # Whatever the backend, the host plane with python events must be there
    # and every plane must parse without error.
    names = {p.name for p in planes}
    assert any("CPU" in n or "device" in n for n in names), names
    rows, totals = prof.op_table(planes)
    # CPU backends may not emit an "XLA Ops" line; when one exists the
    # aggregate must be self-consistent.
    if rows:
        assert totals["total_ms"] > 0
        assert abs(sum(r["pct"] for r in rows) - 100.0) < 1e-6
