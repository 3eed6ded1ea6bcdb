"""HTTP pose server: routing, batch predict, streaming sessions."""

import json
import sys
import threading
from http.client import HTTPConnection
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from manipose_tpu.config import load_config
from manipose_tpu.serving import Predictor

OVERRIDES = [
    "data.seq_len=9",
    "model.layers=2", "model.channels=32", "model.nheads=4",
    "model.layers_seg=2", "model.channels_seg=16", "model.nheads_seg=4",
    "multi_hyp.n_hyp=2",
]


@pytest.fixture(scope="module")
def server():
    from serve import PoseServer

    cfg = load_config("config", overrides=OVERRIDES)
    return PoseServer(Predictor(cfg=cfg, batch_size=2, tta=True))


class TestRouting:
    def test_healthz(self, server):
        status, out = server.handle("GET", "/healthz", {})
        assert status == 200
        assert out["status"] == "ok"
        assert out["seq_len"] == 9 and out["joints"] == 17

    def test_predict_matches_predictor(self, server):
        rng = np.random.default_rng(0)
        kps = rng.normal(size=(13, 17, 2)).astype(np.float32)
        status, out = server.handle(
            "POST", "/predict", {"keypoints": kps.tolist()}
        )
        assert status == 200
        poses = np.asarray(out["poses"], np.float32)
        np.testing.assert_allclose(
            poses, server.predictor.predict_video(kps), atol=1e-6
        )

    def test_predict_hypotheses(self, server):
        rng = np.random.default_rng(1)
        kps = rng.normal(size=(9, 17, 2)).astype(np.float32)
        status, out = server.handle(
            "POST", "/predict", {"keypoints": kps.tolist(),
                                 "hypotheses": True}
        )
        assert status == 200
        hyps = np.asarray(out["hypotheses"])
        assert hyps.shape == (1, 2, 9, 17, 3)  # (W, K, L, J, 3)
        scores = np.asarray(out["scores"])
        np.testing.assert_allclose(scores.sum(axis=1), 1.0, atol=1e-5)

    def test_predict_window_stride(self, server):
        rng = np.random.default_rng(3)
        kps = rng.normal(size=(12, 17, 2)).astype(np.float32)
        status, out = server.handle(
            "POST", "/predict",
            {"keypoints": kps.tolist(), "window_stride": 3},
        )
        assert status == 200
        np.testing.assert_allclose(
            np.asarray(out["poses"], np.float32),
            server.predictor.predict_video(kps, window_stride=3),
            atol=1e-6,
        )
        status, out = server.handle(
            "POST", "/predict",
            {"keypoints": kps.tolist(), "window_stride": 99},
        )
        assert status == 400 and "window_stride" in out["error"]

    def test_predict_bad_shape_is_400(self, server):
        status, out = server.handle(
            "POST", "/predict", {"keypoints": [[[0.0, 0.0]] * 5] * 3}
        )
        assert status == 400 and "keypoints" in out["error"]

    def test_unknown_route_is_404(self, server):
        status, _ = server.handle("POST", "/nope", {})
        assert status == 404

    def test_stream_lifecycle_matches_direct_session(self, server):
        rng = np.random.default_rng(2)
        video = rng.normal(size=(20, 17, 2)).astype(np.float32)
        status, opened = server.handle(
            "POST", "/stream/open", {"stride": 3, "lookahead": 2}
        )
        assert status == 200
        sid = opened["session"]
        assert opened["latency_frames"] == 4
        got = []
        for i in range(0, 20, 5):
            status, out = server.handle(
                "POST", f"/stream/{sid}/push",
                {"frames": video[i : i + 5].tolist()},
            )
            assert status == 200
            got.append(np.asarray(out["poses"], np.float32))
        status, out = server.handle("POST", f"/stream/{sid}/flush", {})
        assert status == 200
        got.append(np.asarray(out["poses"], np.float32))
        got = np.concatenate([g.reshape(-1, 17, 3) for g in got], axis=0)

        ref_sess = server.predictor.stream(stride=3, lookahead=2)
        ref = np.concatenate(
            [ref_sess.push(video), ref_sess.flush()], axis=0
        )
        np.testing.assert_allclose(got, ref, atol=1e-6)
        # flush closed it
        status, _ = server.handle("POST", f"/stream/{sid}/push",
                                  {"frames": video[:1].tolist()})
        assert status == 404

    def test_unknown_session_is_404(self, server):
        status, _ = server.handle("POST", "/stream/deadbeef/push",
                                  {"frames": []})
        assert status == 404

    def test_missing_fields_are_400(self, server):
        status, out = server.handle("POST", "/predict", {})
        assert status == 400 and "keypoints" in out["error"]
        _, opened = server.handle("POST", "/stream/open", {})
        sid = opened["session"]
        status, out = server.handle("POST", f"/stream/{sid}/push", {})
        assert status == 400 and "frames" in out["error"]
        server.handle("POST", f"/stream/{sid}/close", {})

    def test_bad_value_types_are_400(self, server):
        status, _ = server.handle("POST", "/stream/open", {"stride": None})
        assert status == 400
        status, _ = server.handle(
            "POST", "/predict",
            {"keypoints": np.zeros((9, 17, 2)).tolist(),
             "window_stride": [3]},
        )
        assert status == 400

    def test_session_cap_and_close(self, server):
        server.max_sessions = len(server.sessions) + 2
        try:
            sids = []
            for _ in range(2):
                status, out = server.handle("POST", "/stream/open", {})
                assert status == 200
                sids.append(out["session"])
            status, out = server.handle("POST", "/stream/open", {})
            assert status == 400 and "too many" in out["error"]
            status, out = server.handle(
                "POST", f"/stream/{sids[0]}/close", {}
            )
            assert status == 200 and out["closed"] == sids[0]
            status, _ = server.handle("POST", "/stream/open", {})
            assert status == 200
        finally:
            server.max_sessions = 64
            server.sessions.clear()


class TestHTTP:
    def test_end_to_end_over_http(self, server):
        from serve import make_http_server

        httpd = make_http_server(server, "127.0.0.1", 0)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            conn = HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("GET", "/healthz")
            r = conn.getresponse()
            assert r.status == 200
            assert json.loads(r.read())["status"] == "ok"

            kps = np.zeros((5, 17, 2), np.float32)
            conn.request(
                "POST", "/predict",
                body=json.dumps({"keypoints": kps.tolist()}),
                headers={"Content-Type": "application/json"},
            )
            r = conn.getresponse()
            assert r.status == 200
            poses = np.asarray(json.loads(r.read())["poses"])
            assert poses.shape == (5, 17, 3)

            conn.request("POST", "/predict", body="not json",
                         headers={"Content-Type": "application/json"})
            r = conn.getresponse()
            assert r.status == 400
            assert "JSON" in json.loads(r.read())["error"]
        finally:
            httpd.shutdown()
            httpd.server_close()

    def test_oversized_body_is_rejected_without_reading(self, server):
        """A huge Content-Length must 400 immediately — not buffer the
        body (one bogus header would otherwise OOM the process)."""
        from serve import make_http_server

        httpd = make_http_server(server, "127.0.0.1", 0)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            # declare 8 GiB but send no body: with the cap the server
            # answers without reading; without it, read() would hang
            conn = HTTPConnection("127.0.0.1", port, timeout=30)
            conn.putrequest("POST", "/predict")
            conn.putheader("Content-Type", "application/json")
            conn.putheader("Content-Length", str(8 << 30))
            conn.endheaders()
            r = conn.getresponse()
            assert r.status == 400
            assert "oversized" in json.loads(r.read())["error"]
        finally:
            httpd.shutdown()
            httpd.server_close()
