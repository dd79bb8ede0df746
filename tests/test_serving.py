"""HTTP serving daemon (bin_tpu/serving/server.py).

Drives the real ThreadingHTTPServer over a socket with http.client: the
frames delivered over HTTP must equal the frames a directly-driven
StreamingSession produces for the same weights and inputs (u8, CPU —
bit-exact)."""

import dataclasses
import http.client
import json
import threading

import jax
import numpy as np
import pytest

from bin_tpu.config import get_config
from bin_tpu.evaluation.streaming import StreamingSession
from bin_tpu.registry import build_model
from bin_tpu.serving.server import FrameServer, make_http_server

H = W = 32
NUM_KEYS = 7


def _tiny_model():
    cfg = get_config("config2_pyramid")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, base_features=8,
                                       num_res_blocks=1))
    model = build_model(cfg)
    params = model.init(jax.random.key(0), batch=1, height=H, width=W)
    return model, params


def _frames(n=NUM_KEYS):
    rng = np.random.default_rng(3)
    return [rng.integers(0, 255, (H, W, 3), np.uint8) for _ in range(n)]


@pytest.fixture(scope="module")
def served():
    model, params = _tiny_model()
    server = FrameServer(model, params, max_streams=2)
    httpd = make_http_server(server, "127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield model, params, httpd.server_address[1]
    httpd.shutdown()


def _parse_frames(resp):
    n = int(resp.getheader("X-Frame-Count"))
    times = resp.getheader("X-Times")
    h, w = int(resp.getheader("X-Height")), int(resp.getheader("X-Width"))
    body = resp.read()
    frames = np.frombuffer(body, np.uint8).reshape(n, h, w, 3) if n else \
        np.zeros((0, h, w, 3), np.uint8)
    ts = [int(x) for x in times.split(",")] if times else []
    return list(zip(ts, frames))


def test_http_stream_matches_direct_session(served):
    """Through the supported client (StreamClient, TCP_NODELAY both ends —
    the transport config the round-4 latency fix requires)."""
    from bin_tpu.serving.client import StreamClient

    model, params, port = served
    frames = _frames()

    # reference: direct session, identical mode flags to the server's
    ref = StreamingSession(model, params, batch=1, height=H, width=W,
                           emit_u8=True, async_drain=True)
    for f in frames:
        ref.push(f[None])
    ref.flush()
    want = {t: f[0] for t, f in ref.drain()}
    ref.close()  # stop its fetch thread (leak hygiene, see close test)
    assert len(want) >= NUM_KEYS  # 2x rate minus window latency

    with StreamClient("127.0.0.1", port, timeout=120) as client:
        sid = client.open(H, W)
        got = {}
        for f in frames:
            got.update({t: fr for t, fr in client.push(sid, f)})
        got.update({t: fr for t, fr in client.close(sid)})

    assert sorted(got) == sorted(want)
    for t in want:
        np.testing.assert_array_equal(got[t], want[t])


def test_stream_client_validates_and_errors(served):
    """Client-side shape gate + server errors surfaced as exceptions."""
    from bin_tpu.serving.client import StreamClient

    _, _, port = served
    with StreamClient("127.0.0.1", port, timeout=60) as client:
        assert client.health()["status"] == "ok"
        sid = client.open(H, W)
        with pytest.raises(ValueError, match="expected"):
            client.push(sid, np.zeros((H, W + 4, 3), np.uint8))
        with pytest.raises(ValueError, match="uint8"):
            client.push(sid, np.zeros((H, W, 3), np.float32))
        client.close(sid)
        with pytest.raises(RuntimeError, match="404"):
            client.push(sid, np.zeros((H, W, 3), np.uint8))  # closed stream
        with pytest.raises(RuntimeError, match="400"):
            client.open(30, 30)  # not divisible by the model factor
        # connection must survive drained error responses (keep-alive)
        sid = client.open(H, W)
        client.close(sid)


def test_http_errors_and_health(served):
    _, _, port = served
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)

    conn.request("GET", "/healthz")
    health = json.loads(conn.getresponse().read())
    assert health["status"] == "ok" and health["platform"] == "cpu"

    conn.request("POST", "/v1/streams/doesnotexist/frames", body=b"x")
    resp = conn.getresponse()
    assert resp.status == 404
    resp.read()

    conn.request("POST", "/v1/streams",
                 body=json.dumps({"height": H, "width": W}))
    sid = json.loads(conn.getresponse().read())["id"]
    conn.request("POST", f"/v1/streams/{sid}/frames", body=b"short")
    resp = conn.getresponse()
    assert resp.status == 400
    assert "expected" in json.loads(resp.read())["error"]

    # size not divisible by the model's downsampling factor
    conn.request("POST", "/v1/streams",
                 body=json.dumps({"height": 30, "width": 30}))
    resp = conn.getresponse()
    assert resp.status == 400
    resp.read()

    conn.request("POST", f"/v1/streams/{sid}/close")
    resp = conn.getresponse()
    assert resp.status == 200
    resp.read()
    conn.close()


def test_stream_limit(served):
    _, _, port = served
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    sids = []
    for _ in range(2):
        conn.request("POST", "/v1/streams",
                     body=json.dumps({"height": H, "width": W}))
        resp = conn.getresponse()
        assert resp.status == 201
        sids.append(json.loads(resp.read())["id"])
    conn.request("POST", "/v1/streams",
                 body=json.dumps({"height": H, "width": W}))
    resp = conn.getresponse()
    assert resp.status == 400
    assert "limit" in json.loads(resp.read())["error"]
    for sid in sids:
        conn.request("POST", f"/v1/streams/{sid}/close")
        conn.getresponse().read()
    conn.close()


def test_close_stops_fetch_thread_and_rejects_late_push(served):
    """FrameServer.close must stop the session's async fetch thread (no
    per-stream thread/device-buffer leak) and late pushes must 404."""
    import threading as _threading

    def _fetchers():
        return sum(t.name == "bin-tpu-stream-fetch"
                   for t in _threading.enumerate())

    model, params, port = served
    baseline = _fetchers()  # earlier tests may hold their own sessions
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/v1/streams",
                 body=json.dumps({"height": H, "width": W}))
    sid = json.loads(conn.getresponse().read())["id"]
    assert _fetchers() == baseline + 1  # this stream's fetcher is alive
    conn.request("POST", f"/v1/streams/{sid}/close")
    conn.getresponse().read()
    # fetcher must exit promptly after close (no per-stream thread leak)
    import time
    for _ in range(100):
        if _fetchers() == baseline:
            break
        time.sleep(0.1)
    assert _fetchers() == baseline, "fetch thread leaked after close"
    conn.request("POST", f"/v1/streams/{sid}/frames",
                 body=np.zeros((H, W, 3), np.uint8).tobytes())
    resp = conn.getresponse()
    assert resp.status == 404
    resp.read()
    # malformed create bodies are 400s, not 404s
    conn.request("POST", "/v1/streams", body=json.dumps({"height": H}))
    resp = conn.getresponse()
    assert resp.status == 400
    resp.read()
    conn.request("POST", "/v1/streams", body=b"not json")
    resp = conn.getresponse()
    assert resp.status == 400
    resp.read()
    conn.close()


def test_spatial_sharded_server_matches_plain():
    """FrameServer(spatial=4): each stream's height sharded over 4 fake
    devices must deliver the same frames as the unsharded server."""
    model, params = _tiny_model()
    frames = _frames()

    plain = FrameServer(model, params)
    sharded = FrameServer(model, params, spatial=4)
    outs = []
    for server in (plain, sharded):
        sid = server.create_stream(H, W)
        got = {}
        for f in frames:
            got.update({t: fr for t, fr in server.push(sid, f)[0]})
        got.update({t: fr for t, fr in server.close(sid)})
        outs.append(got)
    a, b = outs
    assert sorted(a) == sorted(b)
    for t in a:
        np.testing.assert_array_equal(a[t], b[t])


def test_apply_model_overrides_deployment_knobs():
    # Serving entry points layer deployment knobs (--set) over the card's
    # stored TRAINING config (bin-tpu-serve / tools/bench_serving_http.py);
    # both the "model."-prefixed spelling and the bare field name apply.
    from bin_tpu.config import ModelConfig, apply_model_overrides

    mc = ModelConfig(dtype="float32", conv_int8=False)
    out = apply_model_overrides(
        mc, ["model.dtype=bfloat16", "model.conv_int8=true",
             "conv_int8_min_cin=256"])
    assert (out.dtype, out.conv_int8, out.conv_int8_min_cin) == \
        ("bfloat16", True, 256)
    assert (mc.dtype, mc.conv_int8) == ("float32", False)  # input untouched
    with pytest.raises(ValueError):
        apply_model_overrides(mc, ["model.dtype"])
    with pytest.raises(KeyError):
        apply_model_overrides(mc, ["model.no_such_field=1"])
