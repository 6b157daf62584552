"""Live dashboard: history parsing, HTTP endpoints, traversal guard."""

import json
import os
import urllib.request

from cistar_tpu.utils.dashboard import LiveDashboard, parse_history


import pytest

pytestmark = pytest.mark.fast

def _write_logs(d):
    with open(os.path.join(d, "live_log.jsonl"), "w") as f:
        for i in range(5):
            f.write(json.dumps({"epoch": 1, "batch": i + 1,
                                "g_gan": 1.0 - 0.1 * i,
                                "d_real": 0.5}) + "\n")
        f.write("{torn-tail")  # mid-write record must be skipped


def test_parse_history(tmp_path):
    _write_logs(str(tmp_path))
    h = parse_history(str(tmp_path))
    assert h["x"] == [0, 1, 2, 3, 4]
    assert set(h["series"]) == {"g_gan", "d_real"}
    assert h["series"]["g_gan"][0] == 1.0
    assert not h["per_epoch"]


def test_parse_history_epoch_fallback(tmp_path):
    with open(tmp_path / "loss_log.jsonl", "w") as f:
        f.write(json.dumps({"epoch": 1, "loss": 2.0}) + "\n")
    h = parse_history(str(tmp_path))
    assert h["per_epoch"] and h["series"]["loss"] == [2.0]


def test_http_endpoints(tmp_path):
    _write_logs(str(tmp_path))
    (tmp_path / "web").mkdir()
    (tmp_path / "web" / "fake.png").write_bytes(b"\x89PNG\r\n")
    dash = LiveDashboard(str(tmp_path), port=0, host="127.0.0.1").start()
    try:
        base = f"http://127.0.0.1:{dash.port}"
        page = urllib.request.urlopen(base + "/").read().decode()
        assert "loss curves" in page and tmp_path.name in page
        data = json.loads(urllib.request.urlopen(base + "/data").read())
        assert data["series"]["g_gan"] == [1.0, 0.9, 0.8, 0.7, 0.6]
        assert data["images"] == [os.path.join("web", "fake.png")]
        img = urllib.request.urlopen(base + "/images/web/fake.png").read()
        assert img.startswith(b"\x89PNG")
        # path traversal must 404
        req = urllib.request.Request(base + "/images/../../etc/passwd")
        try:
            resp = urllib.request.urlopen(req)
            assert resp.status == 404
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        dash.stop()


def test_metrics_logger_writes_live_log(tmp_path):
    from cistar_tpu.utils.metrics import MetricsLogger

    logger = MetricsLogger(str(tmp_path), n_epochs=1, batches_per_epoch=4,
                           log_every=2)
    for i in range(4):
        logger.log({"loss": float(i)}, n_images=1)
    h = parse_history(str(tmp_path))
    assert len(h["x"]) == 2  # every 2 batches
    assert "loss" in h["series"] and "img_per_s" in h["series"]
