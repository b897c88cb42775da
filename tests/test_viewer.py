"""Web viewer: frame rendering + HTTP handler (gui.py parity surface)."""

import threading
import urllib.request

import numpy as np

from envidr_tpu.config import load_options, network_config
from envidr_tpu.train.trainer import Trainer
from envidr_tpu.apps.viewer import ViewerState, make_handler
from tests.test_trainer import TinyDataset, tiny_opt


def _make_state():
    opt = tiny_opt()
    trainer = Trainer(opt, network_config(opt))
    trainer.update_extra_state()
    return ViewerState(trainer, opt, "scene", TinyDataset())


def test_frame_png_and_train_steps():
    state = _make_state()
    png, info = state.frame(35, -25, 3.2, 24, "image", 0, 0, 0)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    step0 = state.trainer.global_step
    png, info = state.frame(35, -25, 3.2, 24, "depth", 0, 30, 2)
    assert state.trainer.global_step == step0 + 2
    assert "loss" in info


def test_auto_budgets():
    """Dynamic resolution (200ms) + dynamic train steps (500ms), gui.py:109-161."""
    state = _make_state()
    state.auto_base = 32             # keep CPU renders tiny
    png, info = state.frame(35, -25, 3.2, "auto", "image", 0, 0, -1)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert "(auto)" in info and "loss" in info
    assert 0.25 <= state.downscale <= 1.0
    assert 4 <= state.auto_train_steps <= 16
    # CPU render of a tiny frame is slow relative to 200ms -> downscale should
    # move toward the floor after a couple of frames (hysteresis permitting)
    d0 = state.downscale
    state.frame(35, -25, 3.2, "auto", "image", 0, 0, 0)
    assert 0.25 <= state.downscale <= max(d0, 1.0)


def test_http_roundtrip():
    from http.server import HTTPServer
    state = _make_state()
    srv = HTTPServer(("127.0.0.1", 0), make_handler(state))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        page = urllib.request.urlopen(base + "/", timeout=30).read()
        assert b"envidr_tpu" in page
        png = urllib.request.urlopen(
            base + "/render?size=24&mode=normal_image", timeout=120).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        srv.shutdown()
