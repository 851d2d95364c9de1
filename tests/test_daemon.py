"""Serving daemon: protocol framing, window + pair-cached stream endpoints.

Equivalence anchor: the stream endpoint must produce the SAME window output
as the monolithic /v1/window for the same 3 frames (the pair-cached
decomposition equality pinned at tensor level in tests/test_video_fused.py,
re-checked here through the full HTTP + PNG round trip).
"""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from fisr_tpu.infer.daemon import (FISRService, MultiChipService, make_server,
                                   pack_frames, unpack_frames)
from fisr_tpu.models import fisrnet, pwcnet

H = W = 64  # 32-multiple and PWC 64-multiple


def test_frame_protocol_roundtrip():
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (H, W, 3), np.uint8) for _ in range(3)]
    got = unpack_frames(pack_frames(frames))
    assert len(got) == 3
    for a, b in zip(frames, got):
        np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError):
        unpack_frames(b"\x03\x00\x00\x00junk")


@pytest.fixture(scope="module")
def params():
    fisr = fisrnet.init_params(jax.random.PRNGKey(0))
    pwc = pwcnet.init_params(jax.random.PRNGKey(1))
    return fisr, pwc


@pytest.fixture(scope="module")
def service(params):
    return FISRService(*params, H, W, warmup=False)


@pytest.fixture(scope="module")
def url(service):
    server = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _post(url, payload, ctype="application/x-fisr-frames"):
    req = urllib.request.Request(url, data=payload,
                                 headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.headers.get("Content-Type"), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def _frames(n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 255, (H, W, 3), np.uint8) for _ in range(n)]


def test_metrics_endpoint(url, service):
    with urllib.request.urlopen(url + "/metrics") as r:
        assert r.headers.get("Content-Type", "").startswith("text/plain")
        text = r.read().decode()
    assert "# TYPE fisr_windows_total counter" in text
    assert f"fisr_windows_total {service.stats['windows']}" in text
    assert "fisr_active_streams" in text


def test_health_and_info(url):
    with urllib.request.urlopen(url + "/healthz") as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(url + "/v1/info") as r:
        info = json.loads(r.read())
    assert info["model"] == "FISRnet"
    assert info["frame"] == [H, W]


@pytest.mark.slow
def test_window_endpoint(url):
    code, ctype, body = _post(url + "/v1/window", pack_frames(_frames(3)))
    assert code == 200 and ctype == "application/x-fisr-frames"
    out = unpack_frames(body)
    assert len(out) == 3
    assert all(f.shape == (2 * H, 2 * W, 3) for f in out)


def test_window_wrong_count_is_400(url):
    code, _, body = _post(url + "/v1/window", pack_frames(_frames(2)))
    assert code == 400 and b"3 frames" in body


def test_wrong_frame_size_is_400(url):
    bad = [np.zeros((H // 2, W, 3), np.uint8)] * 3
    code, _, body = _post(url + "/v1/window", pack_frames(bad))
    assert code == 400 and b"compiled for" in body


@pytest.mark.slow
def test_stream_matches_monolithic_window(url, service):
    frames = _frames(4, seed=7)
    pair0 = service.stats["pair_programs"]

    # priming: first two frames return 202
    for k in range(2):
        code, _, _ = _post(url + "/v1/stream/s1/frame",
                           pack_frames(frames[k : k + 1]))
        assert code == 202
    # frame 3 completes window (f0, f1, f2)
    code, _, body = _post(url + "/v1/stream/s1/frame",
                          pack_frames(frames[2:3]))
    assert code == 200
    stream_out = unpack_frames(body)

    code, _, body = _post(url + "/v1/window", pack_frames(frames[:3]))
    mono_out = unpack_frames(body)
    for a, b in zip(stream_out, mono_out):
        # same math, different program decomposition + u8 rounding
        assert np.mean(np.abs(a.astype(int) - b.astype(int))) < 0.02
        assert np.max(np.abs(a.astype(int) - b.astype(int))) <= 1

    # frame 4: steady state must run exactly ONE new pair program
    pairs_before = service.stats["pair_programs"]
    code, _, _ = _post(url + "/v1/stream/s1/frame", pack_frames(frames[3:4]))
    assert code == 200
    assert service.stats["pair_programs"] == pairs_before + 1
    assert service.stats["pair_programs"] - pair0 == 3  # 4 frames -> 3 pairs

    # drop the stream
    req = urllib.request.Request(url + "/v1/stream/s1", method="DELETE")
    with urllib.request.urlopen(req) as r:
        assert json.loads(r.read())["dropped"] is True


def test_stream_lru_eviction(service):
    service.max_streams = 2
    f = _frames(1, seed=9)[0]
    for sid in ("a", "b", "c"):        # c evicts a (LRU, cap 2)
        service.stream_frame(sid, f)
    assert "a" not in service._streams and len(service._streams) == 2
    # touching b then adding d evicts c, not b
    service.stream_frame("b", f)
    service.stream_frame("d", f)
    assert set(service._streams) == {"b", "d"}
    for sid in ("b", "d"):
        service.drop_stream(sid)


def test_concurrent_clients(url, service):
    """4 threads x (window + stream) posts: the device lock must serialize
    without deadlock and every request must complete."""
    import concurrent.futures as cf

    service.max_streams = 64  # the eviction test above shrank the cap

    def worker(k):
        f = _frames(3, seed=100 + k)
        code, _, body = _post(url + "/v1/window", pack_frames(f))
        assert code == 200 and len(unpack_frames(body)) == 3
        codes = []
        for i in range(3):
            code, _, _ = _post(f"{url}/v1/stream/conc{k}/frame",
                               pack_frames(f[i : i + 1]))
            codes.append(code)
        assert codes == [202, 202, 200]
        return k

    with cf.ThreadPoolExecutor(4) as ex:
        assert sorted(ex.map(worker, range(4))) == [0, 1, 2, 3]
    for k in range(4):
        service.drop_stream(f"conc{k}")


def test_rgb_colorspace_roundtrip(url):
    code, _, body = _post(url + "/v1/window?colorspace=rgb",
                          pack_frames(_frames(3, seed=3)))
    assert code == 200
    out = unpack_frames(body)
    assert all(f.shape == (2 * H, 2 * W, 3) for f in out)


# --------------------------------------------------------------------------
# Hardening: bearer auth + request size limit
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def auth_url(service):
    server = make_server(service, "127.0.0.1", 0, auth_token="sekrit",
                         max_request_bytes=4096)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _get(url, token=None):
    headers = {} if token is None else {"Authorization": f"Bearer {token}"}
    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_auth_required(auth_url):
    # /healthz stays open for load-balancer probes
    code, body = _get(auth_url + "/healthz")
    assert code == 200 and json.loads(body)["status"] == "ok"
    # everything else: 401 without / with a wrong token, 200 with the right one
    assert _get(auth_url + "/v1/info")[0] == 401
    assert _get(auth_url + "/v1/info", token="wrong")[0] == 401
    assert _get(auth_url + "/metrics")[0] == 401
    code, body = _get(auth_url + "/v1/info", token="sekrit")
    assert code == 200 and json.loads(body)["model"] == "FISRnet"
    # POST without the token never reaches the model
    code, _, body = _post(auth_url + "/v1/window", pack_frames(_frames(3)))
    assert code == 401 and b"unauthorized" in body


def test_denied_post_closes_connection(auth_url):
    """A 401'd POST never drains its body; keeping the keep-alive socket
    open would parse the stale body bytes as the next request line."""
    import socket
    host, port = auth_url[len("http://"):].split(":")
    body = b"\x89PNGgarbagebody" * 10
    req = (f"POST /v1/window HTTP/1.1\r\nHost: {host}\r\n"
           f"Content-Length: {len(body)}\r\n\r\n").encode() + body
    with socket.create_connection((host, int(port)), timeout=5) as s:
        s.sendall(req)
        s.settimeout(5)
        data = b""
        while b"unauthorized" not in data:
            chunk = s.recv(4096)
            if not chunk:
                break
            data += chunk
        assert data.startswith(b"HTTP/1.1 401")
        # server must close: EOF, not a garbage parse of the body bytes
        while True:
            tail = s.recv(4096)
            if not tail:
                break
            data += tail
        assert b"400" not in data.split(b"unauthorized")[-1]


def test_non_ascii_auth_header_is_401(auth_url):
    """compare_digest raises TypeError on non-ASCII str; attacker-supplied
    headers must get a clean 401, not a dropped connection."""
    import socket
    host, port = auth_url[len("http://"):].split(":")
    req = (b"GET /v1/info HTTP/1.1\r\nHost: x\r\n"
           b"Authorization: Bearer s\xe9cret\r\n\r\n")
    with socket.create_connection((host, int(port)), timeout=5) as s:
        s.sendall(req)
        s.settimeout(5)
        data = s.recv(4096)
        assert data.startswith(b"HTTP/1.1 401"), data[:100]


def test_oversized_request_is_413(auth_url):
    payload = pack_frames(_frames(3))  # PNG of 64x64 noise ≫ 4096 bytes
    assert len(payload) > 4096
    req = urllib.request.Request(
        auth_url + "/v1/window", data=payload,
        headers={"Authorization": "Bearer sekrit"})
    try:
        with urllib.request.urlopen(req) as r:
            code, body = r.status, r.read()
    except urllib.error.HTTPError as e:
        code, body = e.code, e.read()
    assert code == 413 and b"exceeds limit" in body


# --------------------------------------------------------------------------
# MultiChipService: per-device services in one process
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def multi(params):
    return MultiChipService(*params, H, W, warmup=False,
                            devices=jax.devices()[:2])


@pytest.mark.slow
def test_multichip_routing_and_carry(multi, service):
    """Streams pin to one chip; output equals the single-chip service's."""
    frames = _frames(3, seed=21)
    svc = multi._for_stream("pinned")
    assert svc is multi._for_stream("pinned")  # deterministic routing
    out = None
    for f in frames:
        out = multi.stream_frame("pinned", f)
    assert out is not None and len(out) == 3
    # the carry (and its cached pair) lives only on the routed chip
    assert "pinned" in svc._streams
    assert all("pinned" not in s._streams
               for s in multi.services if s is not svc)
    ref = service.window(frames)
    for a, b in zip(out, ref):
        assert np.max(np.abs(a.astype(int) - b.astype(int))) <= 1
    assert multi.drop_stream("pinned") is True


@pytest.mark.slow
def test_multichip_window_round_robin(multi):
    frames = _frames(3, seed=22)
    before = [s.stats["windows"] for s in multi.services]
    for _ in range(2 * len(multi.services)):
        out = multi.window(frames)
        assert len(out) == 3
    after = [s.stats["windows"] for s in multi.services]
    assert all(b - a == 2 for a, b in zip(before, after))


def test_multichip_info_and_metrics(multi):
    info = multi.info()
    assert info["chips"] == 2
    assert info["stats"]["windows"] == sum(
        s.stats["windows"] for s in multi.services)
    text = multi.metrics_text()
    assert '# TYPE fisr_windows_total counter' in text
    for i in range(2):
        assert f'fisr_windows_total{{chip="{i}"}}' in text
        assert f'fisr_active_streams{{chip="{i}"}}' in text


def test_multichip_behind_http(multi):
    """The same HTTP layer serves a MultiChipService unchanged."""
    server = make_server(multi, "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with urllib.request.urlopen(url + "/v1/info") as r:
            info = json.loads(r.read())
        assert info["chips"] == 2
        code, _, body = _post(url + "/v1/window", pack_frames(_frames(3)))
        assert code == 200 and len(unpack_frames(body)) == 3
        with urllib.request.urlopen(url + "/metrics") as r:
            assert 'chip="1"' in r.read().decode()
    finally:
        server.shutdown()
