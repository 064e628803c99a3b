"""Serving daemon (pipeline/serve.py): warm-engine HTTP service.

Starts the real server on a loopback port (background thread), drives it
with urllib, and checks the response bytes decode to the same result the
engine produces directly. The single-dispatcher queue is exercised with
concurrent requests.
"""

import json
import threading
import urllib.parse
import urllib.request

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from nind_denoise_tpu.models import params_io
from nind_denoise_tpu.models.utnet import UtNet
from nind_denoise_tpu.pipeline import serve as serve_mod


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("srv")
    ckpt = str(d / "generator_1.npz")
    params_io.save(UtNet.init(jax.random.PRNGKey(0), funit=8), ckpt)
    svc = serve_mod.DenoiseService("UtNet", ckpt, cs=104, ucs=88,
                                   compute_dtype="float32", devices=1)
    httpd = serve_mod.serve(svc, "127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield svc, f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    svc.close()


def _png_bytes(img_u16):
    import cv2

    ok, buf = cv2.imencode(".png", img_u16[..., ::-1])
    assert ok
    return buf.tobytes()


def test_healthz_and_stats(server):
    svc, base = server
    h = json.loads(urllib.request.urlopen(base + "/healthz").read())
    assert h["status"] == "ok" and h["devices"] == 1 and h["cs"] == 104
    s = json.loads(urllib.request.urlopen(base + "/stats").read())
    assert {"requests", "errors", "megapixels"} <= set(s)


def test_denoise_roundtrip_matches_engine(server):
    svc, base = server
    import cv2

    rng = np.random.default_rng(0)
    img = rng.integers(0, 65536, (120, 150, 3), dtype=np.uint16)
    req = urllib.request.Request(
        base + "/denoise?output=png&rl=0", data=_png_bytes(img),
        method="POST")
    body = urllib.request.urlopen(req).read()
    got = cv2.imdecode(np.frombuffer(body, np.uint8),
                       cv2.IMREAD_UNCHANGED)[..., ::-1]
    # direct engine result through the same service internals
    want_f = svc._denoise01(img.astype(np.float32) / 65535.0)
    want = np.round(np.clip(want_f, 0, 1) * 255).astype(np.uint8)
    assert got.shape == want.shape
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1


def test_stats_latency_percentiles(server):
    """/stats grows a latency_ms block once requests have flowed: a
    sliding-window p50/p95/p99/mean/max in milliseconds, measured from
    decode to fetched result (queue wait included) — the operator alert
    surface documented in docs/OPERATIONS.md."""
    svc, base = server
    rng = np.random.default_rng(7)
    img = rng.integers(0, 65536, (96, 96, 3), dtype=np.uint16)
    for _ in range(2):
        req = urllib.request.Request(base + "/denoise?output=png&rl=0",
                                     data=_png_bytes(img), method="POST")
        urllib.request.urlopen(req).read()
    s = json.loads(urllib.request.urlopen(base + "/stats").read())
    lat = s["latency_ms"]
    assert lat["window"] >= 2
    assert 0 < lat["p50"] <= lat["p95"] <= lat["p99"] <= lat["max"]
    # ordering invariants only — absolute values are host-dependent
    assert lat["mean"] <= lat["max"]


def test_stage_breakdown_accumulates(server):
    """stage_s decomposes request wall time (decode/queue/denoise/post/
    encode); after a request flows every stage must be populated and the
    sum must not exceed total observed wall time by more than rounding."""
    svc, base = server
    before = svc.snapshot_stats()["stage_s"]
    img = np.random.default_rng(11).integers(0, 65536, (96, 96, 3),
                                             dtype=np.uint16)
    req = urllib.request.Request(base + "/denoise?output=png&rl=0",
                                 data=_png_bytes(img), method="POST")
    urllib.request.urlopen(req).read()
    after = svc.snapshot_stats()["stage_s"]
    deltas = {k: after[k] - before[k] for k in after}
    assert set(deltas) == {"decode", "queue", "denoise", "post", "encode"}
    for k in ("decode", "denoise", "post", "encode"):
        assert deltas[k] > 0, (k, deltas)
    assert deltas["queue"] >= 0


def test_fresh_service_stats_have_latency_block(tmp_path):
    """The latency_ms block is documented as unconditional (docs/API.md):
    a dashboard scraping an idle daemon must see window 0 + null
    percentiles, not a KeyError (ADVICE r3)."""
    ckpt = str(tmp_path / "generator_1.npz")
    params_io.save(UtNet.init(jax.random.PRNGKey(0), funit=8), ckpt)
    svc = serve_mod.DenoiseService("UtNet", ckpt, cs=104, ucs=88,
                                   compute_dtype="float32", devices=1)
    try:
        lat = svc.snapshot_stats()["latency_ms"]
        assert lat == {"window": 0, "mean": None, "p50": None,
                       "p95": None, "p99": None, "max": None}
    finally:
        svc.close()


def test_failed_dispatch_still_records_latency(server):
    """A request that errors after its queue wait must still enter the
    latency window — otherwise slow-then-failing traffic is invisible to
    the p95/p99 operators alert on (ADVICE r3)."""
    svc, base = server
    before = svc.snapshot_stats()["latency_ms"]["window"]
    img = np.random.default_rng(3).integers(0, 65536, (96, 96, 3),
                                            dtype=np.uint16)
    data = _png_bytes(img)
    orig = svc._dispatch_denoise

    def boom(*a, **k):
        raise RuntimeError("engine blew up")

    svc._dispatch_denoise = boom
    try:
        with pytest.raises(RuntimeError):
            svc.denoise_bytes(data, output="png")
    finally:
        svc._dispatch_denoise = orig
    assert svc.snapshot_stats()["latency_ms"]["window"] == before + 1


def test_denoise_with_rl(server):
    svc, base = server
    import cv2

    rng = np.random.default_rng(1)
    img = rng.integers(0, 65536, (104, 120, 3), dtype=np.uint16)
    req = urllib.request.Request(
        base + "/denoise?output=jpg&iterations=2&quality=95",
        data=_png_bytes(img), method="POST")
    body = urllib.request.urlopen(req).read()
    out = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_UNCHANGED)
    assert out is not None and out.shape == (104, 120, 3)


def test_concurrent_requests_serialize(server):
    """N handler threads funnel through the one dispatcher; all succeed."""
    svc, base = server
    rng = np.random.default_rng(2)
    payload = _png_bytes(rng.integers(0, 65536, (104, 104, 3),
                                      dtype=np.uint16))
    results = []

    def hit():
        req = urllib.request.Request(base + "/denoise?output=png&rl=0",
                                     data=payload, method="POST")
        results.append(urllib.request.urlopen(req).status)

    threads = [threading.Thread(target=hit) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == [200, 200, 200, 200]


# -- cross-request coalescing (single mode) -----------------------------------


def test_single_mode_coalesces_concurrent_requests(server):
    """Concurrent same-shape requests queued behind a busy dispatcher must
    run as ONE coalesced engine dispatch (continuous batching,
    DenoiseService._run_group) and still each return the exact per-request
    result."""
    svc, base = server
    import cv2

    rng = np.random.default_rng(41)
    imgs = [rng.integers(0, 65536, (120, 150, 3), dtype=np.uint16)
            for _ in range(3)]
    before = svc.snapshot_stats()["coalesced_requests"]

    gate, release = threading.Event(), threading.Event()

    def blocker():
        gate.set()
        assert release.wait(30)
        return True

    bt = threading.Thread(target=lambda: svc.submit(blocker))
    bt.start()
    assert gate.wait(10)  # dispatcher is now parked inside blocker

    bodies = [None] * len(imgs)

    def hit(i):
        req = urllib.request.Request(base + "/denoise?output=png&rl=0",
                                     data=_png_bytes(imgs[i]), method="POST")
        bodies[i] = urllib.request.urlopen(req).read()

    threads = [threading.Thread(target=hit, args=(i,))
               for i in range(len(imgs))]
    for t in threads:
        t.start()
    # wait until all three typed jobs are queued, then release: they are
    # consecutive and same-key, so the drain groups all of them
    for _ in range(200):
        if svc._q.qsize() >= len(imgs):
            break
        threading.Event().wait(0.05)
    assert svc._q.qsize() >= len(imgs)
    release.set()
    for t in threads:
        t.join()
    bt.join()

    assert svc.snapshot_stats()["coalesced_requests"] == before + len(imgs)
    for img, body in zip(imgs, bodies):
        got = cv2.imdecode(np.frombuffer(body, np.uint8),
                           cv2.IMREAD_UNCHANGED)[..., ::-1]
        want_f = svc._denoise01(img.astype(np.float32) / 65535.0)
        want = np.round(np.clip(want_f, 0, 1) * 255).astype(np.uint8)
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1


def test_coalesced_rl_group_matches_serial_request(server):
    """Coalesced same-RL-param requests ride ONE batched RL dispatch +
    one fetch (_post_u8_batch, round 4); each response must byte-match a
    lone serial request of the same image (the batched pallas RL is
    bit-identical per plane; the XLA fallback path is elementwise-equal
    over the batch dim)."""
    svc, base = server
    rng = np.random.default_rng(47)
    imgs = [rng.integers(0, 65536, (104, 112, 3), dtype=np.uint16)
            for _ in range(3)]
    url = base + "/denoise?output=png&iterations=3"

    def fetch(i):
        req = urllib.request.Request(url, data=_png_bytes(imgs[i]),
                                     method="POST")
        return urllib.request.urlopen(req).read()

    serial = [fetch(i) for i in range(3)]

    gate, release = threading.Event(), threading.Event()

    def blocker():
        gate.set()
        assert release.wait(30)
        return True

    bt = threading.Thread(target=lambda: svc.submit(blocker))
    bt.start()
    assert gate.wait(10)
    bodies = [None] * 3

    def hit(i):
        bodies[i] = fetch(i)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for _ in range(200):
        if svc._q.qsize() >= 3:
            break
        threading.Event().wait(0.05)
    assert svc._q.qsize() >= 3
    release.set()
    for t in threads:
        t.join()
    bt.join()
    for a, b in zip(bodies, serial):
        assert a == b  # byte-identical PNG responses


def test_bad_body_is_400(server):
    svc, base = server
    req = urllib.request.Request(base + "/denoise", data=b"not an image",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_bad_output_format_rejected_before_denoise(server):
    """An unsupported ``output`` query param must 400 WITHOUT burning device
    time: the megapixels counter (bumped inside the denoise work fn) must
    not move."""
    svc, base = server
    rng = np.random.default_rng(3)
    img = rng.integers(0, 65536, (64, 64, 3), dtype=np.uint16)
    mp_before = svc.snapshot_stats()["megapixels"]
    req = urllib.request.Request(base + "/denoise?output=exe",
                                 data=_png_bytes(img), method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    assert svc.snapshot_stats()["megapixels"] == mp_before


def test_small_image_served(server):
    """A request smaller than the tile size must still succeed (single-tile
    plan; the per-request adapt_cs_ucs guard keeps even the 504/480
    production default from raising — that path is asserted against the
    real CLI defaults in test_cli_multidevice.py)."""
    svc, base = server
    import cv2

    rng = np.random.default_rng(5)
    img = rng.integers(0, 65536, (64, 72, 3), dtype=np.uint16)
    req = urllib.request.Request(base + "/denoise?output=png&rl=0",
                                 data=_png_bytes(img), method="POST")
    body = urllib.request.urlopen(req).read()
    out = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_UNCHANGED)
    assert out is not None and out.shape == (64, 72, 3)


def test_tiny_image_served(server):
    """A request below the MINIMUM tiling (adapt_cs_ucs fails even at the
    smallest arch-valid tile) takes the pad-to-valid single-forward path
    (TileEngine.denoise_tiny) instead of erroring — the reference aborts
    on such inputs (denoise_image.py:151-170)."""
    svc, base = server
    import cv2

    rng = np.random.default_rng(6)
    img = rng.integers(0, 65536, (33, 47, 3), dtype=np.uint16)
    req = urllib.request.Request(base + "/denoise?output=png&rl=0",
                                 data=_png_bytes(img), method="POST")
    body = urllib.request.urlopen(req).read()
    out = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_UNCHANGED)
    assert out is not None and out.shape == (33, 47, 3)


def test_reload_rolls_weights_without_dropping(server, tmp_path):
    """POST /reload must swap to the new checkpoint (output changes and
    matches the service's own post-reload direct result) and bump the
    reloads stat; requests keep succeeding around it."""
    svc, base = server
    import cv2

    rng = np.random.default_rng(9)
    img = rng.integers(0, 65536, (104, 120, 3), dtype=np.uint16)
    payload = _png_bytes(img)

    def denoise_via_http():
        req = urllib.request.Request(base + "/denoise?output=png&rl=0",
                                     data=payload, method="POST")
        body = urllib.request.urlopen(req).read()
        return cv2.imdecode(np.frombuffer(body, np.uint8),
                            cv2.IMREAD_UNCHANGED)[..., ::-1]

    before = denoise_via_http()
    ckpt2 = str(tmp_path / "generator_2.npz")
    params_io.save(UtNet.init(jax.random.PRNGKey(42), funit=8), ckpt2)
    req = urllib.request.Request(
        base + "/reload?" + urllib.parse.urlencode({"model_path": ckpt2}),
        data=b"", method="POST")
    resp = json.loads(urllib.request.urlopen(req).read())
    assert resp["status"] == "reloaded" and resp["mode"] == svc.mode
    assert svc.snapshot_stats()["reloads"] >= 1
    after = denoise_via_http()
    assert not np.array_equal(before, after), "reload did not swap weights"
    want_f = svc._denoise01(img.astype(np.float32) / 65535.0)
    want = np.round(np.clip(want_f, 0, 1) * 255).astype(np.uint8)
    diff = np.abs(after.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1


def test_reload_bad_requests_are_4xx(server):
    """Missing model_path -> 400; nonexistent checkpoint -> 400 (and the
    service keeps serving on the old weights)."""
    svc, base = server
    req = urllib.request.Request(base + "/reload", data=b"", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    req = urllib.request.Request(
        base + "/reload?model_path=/nonexistent/ckpt.npz", data=b"",
        method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    # still healthy
    h = json.loads(urllib.request.urlopen(base + "/healthz").read())
    assert h["status"] == "ok"


def test_bad_content_length_is_4xx(server):
    """Malformed Content-Length must get a JSON error response, not a
    dropped socket (review r3); absent/zero gets 411."""
    import http.client

    svc, base = server
    host, port = base.replace("http://", "").split(":")
    conn = http.client.HTTPConnection(host, int(port))
    conn.putrequest("POST", "/denoise")
    conn.putheader("Content-Length", "abc")
    conn.endheaders()
    r = conn.getresponse()
    assert r.status == 400
    assert "Content-Length" in json.loads(r.read())["error"]
    conn.close()

    conn = http.client.HTTPConnection(host, int(port))
    conn.putrequest("POST", "/denoise")
    conn.putheader("Content-Length", "0")
    conn.endheaders()
    r = conn.getresponse()
    assert r.status == 411
    conn.close()

    # negative: header IS present, just malformed -> 400, not 411
    conn = http.client.HTTPConnection(host, int(port))
    conn.putrequest("POST", "/denoise")
    conn.putheader("Content-Length", "-5")
    conn.endheaders()
    r = conn.getresponse()
    assert r.status == 400
    assert "Content-Length" in json.loads(r.read())["error"]
    conn.close()


def test_queue_full_raises_service_busy(server):
    """submit() sheds load with ServiceBusy beyond the queue bound (-> 503)
    instead of buffering decoded images without limit (review r3)."""
    svc, _ = server
    gate = threading.Event()
    started = threading.Event()

    def blocker():
        started.set()
        gate.wait(10)
        return None

    t = threading.Thread(target=lambda: svc.submit(blocker), daemon=True)
    t.start()
    started.wait(5)  # dispatcher is now busy inside blocker
    try:
        for _ in range(svc._q.maxsize):  # fill every queue slot
            svc._q.put_nowait((lambda: None, {"event": threading.Event()}))
        with pytest.raises(serve_mod.ServiceBusy):
            svc.submit(lambda: None)
    finally:
        gate.set()
        t.join(5)
        # drain the filler jobs so later tests see an idle queue
        deadline = 50
        while not svc._q.empty() and deadline:
            import time as _t
            _t.sleep(0.1)
            deadline -= 1
    assert svc._q.empty()


def test_dispatcher_survives_base_exception(server):
    """A non-Exception raise inside a job must release the waiter AND keep
    the dispatcher alive for later requests (review r3)."""
    svc, _ = server

    def fatal():
        raise SystemExit(3)

    with pytest.raises(RuntimeError, match="fatal dispatcher error"):
        svc.submit(fatal)
    assert svc.submit(lambda: 41 + 1) == 42  # still serving


def test_prewarm_single_mode(server):
    """prewarm compiles the group-size buckets without error and leaves the
    service fully functional (byte-identical request results after). Must
    run before test_close_never_blocks_on_full_queue (which retires the
    shared service)."""
    svc, base = server
    import cv2

    info = svc.prewarm(104, 120, dtype="uint16", rl=False)
    assert info["mode"] == "single"
    assert info["sizes"][0] == 1 and info["sizes"][-1] == svc.MAX_COALESCE
    rng = np.random.default_rng(21)
    img = rng.integers(0, 65536, (104, 120, 3), dtype=np.uint16)
    req = urllib.request.Request(base + "/denoise?output=png&rl=0",
                                 data=_png_bytes(img), method="POST")
    body = urllib.request.urlopen(req).read()
    got = cv2.imdecode(np.frombuffer(body, np.uint8),
                       cv2.IMREAD_UNCHANGED)[..., ::-1]
    want = np.asarray(svc._denoise01(img.astype(np.float32) / 65535.0))
    want = np.round(np.clip(want, 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_close_never_blocks_on_full_queue(server):
    """close() must return promptly even when the bounded queue is full
    (review r3: a blocking put(None) would hang shutdown behind a wedged
    dispatcher). Runs LAST in this module: it closes the shared service."""
    svc, _ = server
    gate = threading.Event()
    started = threading.Event()

    def blocker():
        started.set()
        gate.wait(10)
        return None

    t = threading.Thread(target=lambda: svc.submit(blocker), daemon=True)
    t.start()
    started.wait(5)
    for _ in range(svc._q.maxsize):  # fill every queue slot
        svc._q.put_nowait((lambda: None, {"event": threading.Event()}))
    t0 = __import__("time").monotonic()
    svc.close()  # queue is full: must not block on the sentinel
    assert __import__("time").monotonic() - t0 < 1.0
    gate.set()
    t.join(5)
    svc._worker.join(10)  # drains the fillers, sees _closing, exits
    assert not svc._worker.is_alive()


# -- request-per-device pool mode (--parallel images) -------------------------


@pytest.fixture(scope="module")
def server_images(tmp_path_factory):
    """Service in pool mode over 4 of the virtual CPU devices."""
    d = tmp_path_factory.mktemp("srv_pool")
    ckpt = str(d / "generator_1.npz")
    params_io.save(UtNet.init(jax.random.PRNGKey(0), funit=8), ckpt)
    svc = serve_mod.DenoiseService("UtNet", ckpt, cs=104, ucs=88,
                                   compute_dtype="float32", devices=4,
                                   parallel="images")
    httpd = serve_mod.serve(svc, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield svc, f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    svc.close()


def test_pool_healthz_reports_mode(server_images):
    svc, base = server_images
    h = json.loads(urllib.request.urlopen(base + "/healthz").read())
    assert h["devices"] == 4 and h["mode"] == "images"


def test_pool_concurrent_requests_all_succeed_and_match(server_images):
    """Concurrent mixed-shape requests through the device pool: every
    response must decode AND bit-match the service's own direct result
    (request-per-device replicas may not drift from each other)."""
    svc, base = server_images
    import cv2

    rng = np.random.default_rng(3)
    shapes = [(104, 104), (120, 150), (96, 130), (104, 104), (33, 47),
              (120, 150)]
    imgs = [rng.integers(0, 65536, s + (3,), dtype=np.uint16)
            for s in shapes]
    results = [None] * len(imgs)

    def hit(i):
        req = urllib.request.Request(base + "/denoise?output=png&rl=0",
                                     data=_png_bytes(imgs[i]), method="POST")
        body = urllib.request.urlopen(req).read()
        results[i] = cv2.imdecode(np.frombuffer(body, np.uint8),
                                  cv2.IMREAD_UNCHANGED)[..., ::-1]

    threads = [threading.Thread(target=hit, args=(i,))
               for i in range(len(imgs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive()
    for i, img in enumerate(imgs):
        want_f = svc._denoise01(img.astype(np.float32) / 65535.0)
        want = np.round(np.clip(want_f, 0, 1) * 255).astype(np.uint8)
        assert results[i] is not None and results[i].shape == want.shape
        diff = np.abs(results[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1, f"request {i} drifted: max diff {diff.max()}"
    stats = json.loads(urllib.request.urlopen(base + "/stats").read())
    assert sum(stats["per_device"].values()) == len(imgs)


def test_pool_rl_runs_on_worker_device(server_images):
    """RL post-op path through the pool (the whole request stays on one
    chip: denoise -> RL -> quantize -> fetch)."""
    svc, base = server_images
    import cv2

    rng = np.random.default_rng(4)
    img = rng.integers(0, 65536, (104, 120, 3), dtype=np.uint16)
    req = urllib.request.Request(
        base + "/denoise?output=png&iterations=2", data=_png_bytes(img),
        method="POST")
    out = cv2.imdecode(np.frombuffer(urllib.request.urlopen(req).read(),
                                     np.uint8), cv2.IMREAD_UNCHANGED)
    assert out is not None and out.shape == (104, 120, 3)


def test_prewarm_pool_mode(server_images):
    svc, base = server_images
    info = svc.prewarm(104, 120, dtype="uint16", rl=False)
    assert info["mode"] == "images"
    # the pool still serves correctly afterwards
    rng = np.random.default_rng(22)
    img = rng.integers(0, 65536, (104, 120, 3), dtype=np.uint16)
    out = np.asarray(svc._pool.denoise_raw(img, 65535.0,
                                           out_dtype="float32"))
    assert out.shape == img.shape and np.isfinite(out).all()


def test_pool_mode_coalesces_queued_requests(server_images):
    """Pool mode: same-shape requests queued behind parked workers must
    ride shared dispatches (fair-share bounded per worker) and still each
    return the exact serial result."""
    svc, base = server_images
    import cv2

    rng = np.random.default_rng(44)
    img = rng.integers(0, 65536, (104, 120, 3), dtype=np.uint16)
    payload = _png_bytes(img)
    before = svc.snapshot_stats()["coalesced_requests"]
    ndev = len(svc._pool.devices)

    gate = threading.Event()
    release = threading.Event()
    parked = []

    def blocker(engine):
        parked.append(engine)
        if len(parked) == ndev:
            gate.set()
        assert release.wait(30)
        return True

    bts = [threading.Thread(target=lambda: svc._pool.submit(blocker))
           for _ in range(ndev)]
    for t in bts:
        t.start()
    assert gate.wait(10)  # every worker parked

    n = 2 * ndev  # backlog deep enough that fair share coalesces pairs
    bodies = [None] * n

    def hit(i):
        req = urllib.request.Request(base + "/denoise?output=png&rl=0",
                                     data=payload, method="POST")
        bodies[i] = urllib.request.urlopen(req).read()

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    # generous window: each request crosses HTTP handling + PNG decode on
    # this 1-core host before it enqueues; 10 s flaked under a loaded
    # session (observed r4)
    for _ in range(600):
        if svc._pool._q.qsize() >= n:
            break
        threading.Event().wait(0.05)
    assert svc._pool._q.qsize() >= n
    release.set()
    for t in threads:
        t.join()
    for t in bts:
        t.join()

    # the first worker to wake sees a backlog of 2*ndev and takes its fair
    # share (>= 2): at least one shared dispatch must have happened
    assert svc.snapshot_stats()["coalesced_requests"] > before
    want = np.asarray(svc._pool.denoise_raw(img, 65535.0,
                                            out_dtype="float32"))
    want = np.round(np.clip(want, 0, 1) * 255).astype(np.uint8)
    for body in bodies:
        got = cv2.imdecode(np.frombuffer(body, np.uint8),
                           cv2.IMREAD_UNCHANGED)[..., ::-1]
        np.testing.assert_array_equal(got, want)


def test_pool_reload_all_replicas_roll(server_images, tmp_path):
    """POST /reload in ``images`` mode must leave every device replica on
    the new checkpoint: concurrent post-reload requests (spread across
    workers) all bit-match the service's own direct result."""
    svc, base = server_images
    import cv2

    ckpt2 = str(tmp_path / "generator_2.npz")
    params_io.save(UtNet.init(jax.random.PRNGKey(43), funit=8), ckpt2)
    req = urllib.request.Request(
        base + "/reload?" + urllib.parse.urlencode({"model_path": ckpt2}),
        data=b"", method="POST")
    resp = json.loads(urllib.request.urlopen(req).read())
    assert resp["status"] == "reloaded" and resp["mode"] == "images"

    rng = np.random.default_rng(10)
    img = rng.integers(0, 65536, (104, 120, 3), dtype=np.uint16)
    payload = _png_bytes(img)
    want_f = svc._denoise01(img.astype(np.float32) / 65535.0)
    want = np.round(np.clip(want_f, 0, 1) * 255).astype(np.uint8)
    results = [None] * 4

    def hit(i):
        r = urllib.request.Request(base + "/denoise?output=png&rl=0",
                                   data=payload, method="POST")
        body = urllib.request.urlopen(r).read()
        results[i] = cv2.imdecode(np.frombuffer(body, np.uint8),
                                  cv2.IMREAD_UNCHANGED)[..., ::-1]

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive()
    for i in range(4):
        diff = np.abs(results[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1, f"replica served request {i} on old weights"


@pytest.mark.slow  # builds a sharded engine stack twice (GSPMD compiles)
def test_shard_mode_reload_direct(tmp_path, monkeypatch):
    """reload() in ``shard`` mode rebuilds the resolved forward, the
    sharded denoiser cache, and the tiny-image fallback — post-reload
    output must match a fresh shard-mode service built on the new
    checkpoint. A FAILED rollover must be atomic: both the tiled and the
    tiny request paths stay on the old checkpoint together (no torn
    old-tiled/new-tiny mix)."""
    ckpt1 = str(tmp_path / "g1.npz")
    ckpt2 = str(tmp_path / "g2.npz")
    params_io.save(UtNet.init(jax.random.PRNGKey(0), funit=8), ckpt1)
    params_io.save(UtNet.init(jax.random.PRNGKey(7), funit=8), ckpt2)
    svc = serve_mod.DenoiseService("UtNet", ckpt1, cs=104, ucs=88,
                                   compute_dtype="float32", devices=4,
                                   parallel="shard")
    fresh = serve_mod.DenoiseService("UtNet", ckpt2, cs=104, ucs=88,
                                     compute_dtype="float32", devices=4,
                                     parallel="shard")
    try:
        assert svc.mode == "shard"
        rng = np.random.default_rng(13)
        img01 = rng.random((416, 208, 3), dtype=np.float32)
        tiny_img = rng.random((33, 47, 3), dtype=np.float32)
        before = svc._denoise01(img01)
        tiny_before = svc._denoise01(tiny_img)

        # failed rollover: the tiny-engine build (the LAST stack component,
        # constructed after the resolved forward and the sharded denoiser)
        # raises — the swap must not happen at all
        import nind_denoise_tpu.engine.tile_engine as te
        real_engine = te.AdaptiveEngine

        def boom(*a, **kw):
            raise RuntimeError("simulated OOM during rollover")

        monkeypatch.setattr(te, "AdaptiveEngine", boom)
        with pytest.raises(RuntimeError, match="simulated OOM"):
            svc.reload(ckpt2)
        monkeypatch.setattr(te, "AdaptiveEngine", real_engine)
        np.testing.assert_array_equal(svc._denoise01(img01), before)
        np.testing.assert_array_equal(svc._denoise01(tiny_img), tiny_before)
        assert svc.snapshot_stats()["reloads"] == 0

        resp = svc.reload(ckpt2)
        assert resp["mode"] == "shard"
        after = svc._denoise01(img01)
        assert not np.array_equal(before, after)
        np.testing.assert_array_equal(after, fresh._denoise01(img01))
        # tiny-image fallback engine also rolled
        tiny = rng.random((33, 47, 3), dtype=np.float32)
        np.testing.assert_array_equal(svc._denoise01(tiny),
                                      fresh._denoise01(tiny))
    finally:
        svc.close()
        fresh.close()


def test_submit_after_close_raises_not_hangs(tmp_path_factory):
    """Same shutdown race as EnginePool: a request thread whose submit()
    passed the flag check while close() retired the dispatcher must get
    ServiceBusy from the liveness loop, never hang on its event."""
    d = tmp_path_factory.mktemp("srv_close")
    ckpt = str(d / "generator_1.npz")
    params_io.save(UtNet.init(jax.random.PRNGKey(0), funit=4), ckpt)
    svc = serve_mod.DenoiseService("UtNet", ckpt, cs=104, ucs=88,
                                   compute_dtype="float32", devices=1)
    svc.close()
    assert not svc._worker.is_alive() or svc._worker.join(5) is None
    svc._closing.clear()  # the race window: submitter sees flag unset
    err = []

    def racer():
        try:
            svc.submit(lambda: "never")
        except serve_mod.ServiceBusy as e:
            err.append(e)

    t = threading.Thread(target=racer)
    t.start()
    while svc._q.empty() and t.is_alive():
        pass
    svc._closing.set()
    t.join(timeout=10)
    assert not t.is_alive(), "submit hung on a consumerless queue"
    assert err and "closed" in str(err[0])
    # eager rejection once the flag is visible
    with pytest.raises(serve_mod.ServiceBusy, match="shutting down"):
        svc.submit(lambda: None)


@pytest.mark.slow  # subprocess pays its own jax import + engine build
def test_sigterm_drains_and_exits_cleanly(tmp_path):
    """The daemon must treat SIGTERM as graceful stop (the k8s/systemd stop
    signal): stop accepting, drain, close the service, exit 0 — and with
    --port 0 it must report the BOUND port so orchestrators can probe it."""
    import os
    import re
    import signal
    import subprocess
    import sys
    import time

    ckpt = str(tmp_path / "generator_1.npz")
    params_io.save(UtNet.init(jax.random.PRNGKey(0), funit=4), ckpt)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    p = subprocess.Popen(
        [sys.executable, "-m", "nind_denoise_tpu.pipeline.serve",
         "--model_path", ckpt, "--network", "UtNet", "--cs", "104",
         "--ucs", "88", "--devices", "1", "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
    try:
        line = ""
        deadline = time.time() + 240
        while "listening on" not in line:
            assert time.time() < deadline, "server never came up"
            line = p.stdout.readline()
        port = int(re.search(r"http://[^:]+:(\d+)", line).group(1))
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
        p.send_signal(signal.SIGTERM)
        out = p.communicate(timeout=60)[0]
        assert p.returncode == 0, (p.returncode, out)
        assert "draining" in out and "shut down cleanly" in out, out
    finally:
        if p.poll() is None:
            p.kill()


def test_fuzz_requests_never_hang_server(server):
    """Adversarial request soup — random binary bodies, bogus query params,
    wrong methods, huge declared lengths — must all produce an HTTP
    response (4xx/5xx fine) and leave the service healthy. No request may
    hang the single-dispatcher queue."""
    import http.client
    import random as _random

    svc, url = server
    host, port = url.rsplit(":", 1)[0].replace("http://", ""), int(url.rsplit(":", 1)[1])
    rng = _random.Random(0)
    for i in range(12):
        conn = http.client.HTTPConnection(host, port, timeout=30)
        try:
            kind = i % 4
            if kind == 0:  # random junk body
                body = bytes(rng.getrandbits(8) for _ in range(rng.randint(0, 2048)))
                conn.request("POST", "/denoise?output=jpg", body=body)
            elif kind == 1:  # bogus query params
                conn.request("POST", "/denoise?output=exe&quality=-3&sigma=zz",
                             body=b"\x89PNG\r\n\x1a\nnot-actually-png")
            elif kind == 2:  # wrong method / path
                conn.request("PUT" if i % 2 else "DELETE",
                             "/" + "x" * rng.randint(1, 64))
            else:  # declared length larger than the sent body (short body)
                conn.putrequest("POST", "/denoise")
                conn.putheader("Content-Length", "64")
                conn.endheaders()
                conn.send(b"short")
            r = conn.getresponse()
            assert 200 <= r.status < 600
            r.read()
        except (http.client.HTTPException, OSError):
            pass  # connection-level rejection is acceptable; hanging is not
        finally:
            conn.close()
    # service still healthy afterwards
    with urllib.request.urlopen(f"{url}/healthz", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


@pytest.mark.slow  # builds two single-mode engine stacks (compiles)
def test_coalesce_preserves_reload_order(tmp_path):
    """A reload queued BETWEEN two denoise requests must split them: the
    drain stops at the non-matching (generic) swap job, so the earlier
    request runs on the old checkpoint and the later one on the new —
    coalescing never reorders traffic around a rollover."""
    ckpt1, ckpt2 = str(tmp_path / "g1.npz"), str(tmp_path / "g2.npz")
    params_io.save(UtNet.init(jax.random.PRNGKey(0), funit=8), ckpt1)
    params_io.save(UtNet.init(jax.random.PRNGKey(9), funit=8), ckpt2)
    svc = serve_mod.DenoiseService("UtNet", ckpt1, cs=104, ucs=88,
                                   compute_dtype="float32", devices=1)
    try:
        rng = np.random.default_rng(43)
        img = rng.integers(0, 65536, (120, 150, 3), dtype=np.uint16)
        # references computed on warm engines, outside the queue
        ref_old = np.asarray(svc._adaptive.denoise_raw(img, 65535.0,
                                                       out_dtype="uint8"))

        gate, release = threading.Event(), threading.Event()

        def blocker():
            gate.set()
            assert release.wait(30)
            return True

        bt = threading.Thread(target=lambda: svc.submit(blocker))
        bt.start()
        assert gate.wait(10)

        results = {}

        def den(tag):
            results[tag] = svc.submit_denoise(img, 65535.0, rl=False,
                                              sigma=1.0, iterations=1,
                                              psf="gaussian")

        ta = threading.Thread(target=den, args=("a",))
        ta.start()
        while svc._q.qsize() < 1:
            threading.Event().wait(0.02)
        tr = threading.Thread(target=lambda: svc.reload(ckpt2))
        tr.start()
        while svc._q.qsize() < 2:
            threading.Event().wait(0.02)
        tb = threading.Thread(target=den, args=("b",))
        tb.start()
        while svc._q.qsize() < 3:
            threading.Event().wait(0.02)

        release.set()
        for t in (ta, tr, tb, bt):
            t.join()

        ref_new = np.asarray(svc._adaptive.denoise_raw(img, 65535.0,
                                                       out_dtype="uint8"))
        assert not np.array_equal(ref_old, ref_new)  # reload changed weights
        np.testing.assert_array_equal(results["a"], ref_old)
        np.testing.assert_array_equal(results["b"], ref_new)
    finally:
        svc.close()
