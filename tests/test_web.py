"""Web server tests: the reference's HTTP surface (web.py:250-444) driven
end-to-end against a live server with a tiny random model."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from alphazero_tpu.config import tiny_config


@pytest.fixture(scope="module")
def server():
    from alphazero_tpu.web.server import GameSession, make_handler

    cfg = tiny_config(num_blocks=2, num_filters=8, num_simulations=4)
    session = GameSession(cfg)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(session, cfg))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def call(base, path, body=None):
    if body is None:
        req = urllib.request.Request(base + path)
    else:
        req = urllib.request.Request(
            base + path, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_config_and_models(server):
    cfg = call(server, "/api/config")
    assert cfg == {"board_size": 8, "num_actions": 192}
    models = call(server, "/api/models")
    assert models["current"] == "random"


def test_new_game_human_vs_alphazero(server):
    r = call(server, "/api/new",
             {"white_type": "human", "black_type": "alphazero"})
    assert r["turn"] == "white"
    assert len(r["legal_moves"]) == 22
    board = np.asarray(r["board"])
    assert (board[0:2] == 1).all() and (board[6:8] == -1).all()


def test_human_move_triggers_bot_reply(server):
    call(server, "/api/new",
         {"white_type": "human", "black_type": "alphazero"})
    r = call(server, "/api/move", {"move": [1, 3, 2, 3]})
    assert r["moved_player"] == "white"
    assert "bot_move" in r and "evaluation" in r
    assert r["turn"] == "white"          # bot (black) already replied
    assert -1.0 <= r["evaluation"] <= 1.0


def test_illegal_move_rejected(server):
    call(server, "/api/new",
         {"white_type": "human", "black_type": "alphazero"})
    with pytest.raises(urllib.error.HTTPError) as e:
        call(server, "/api/move", {"move": [0, 0, 4, 4]})
    assert e.value.code == 400


def test_bot_vs_bot_move_and_state(server):
    call(server, "/api/new",
         {"white_type": "alphazero", "black_type": "baseline"})
    r = call(server, "/api/state")
    assert r["turn"] == "black"          # white bot moved on /api/new
    r2 = call(server, "/api/bot_move", {})
    assert "bot_move" in r2 and "engine" in r2  # baseline reports depth/nps
    assert r2["engine"]["nodes"] > 0
