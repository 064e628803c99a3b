"""Request-level device pool (parallel/engine_pool + engine device pinning).

Runs on the virtual 8-device CPU mesh (conftest). The pool is the third
multi-device strategy (after row-band sharding and same-shape batching):
one AdaptiveEngine replica pinned per device, shared work queue. Checks
here: true concurrency across DISTINCT devices (barrier test — 4 jobs can
only rendezvous if 4 workers run them simultaneously), bitwise parity of
every replica against an unpinned single-device engine across mixed
request shapes (incl. the tiny-image fallback), ordered map, error
propagation, and queue backpressure.
"""

import queue
import threading

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from nind_denoise_tpu.engine.tile_engine import AdaptiveEngine, make_engine
from nind_denoise_tpu.models.utnet import UtNet
from nind_denoise_tpu.parallel.engine_pool import EnginePool

pytestmark = pytest.mark.skipif(jax.local_device_count() < 4,
                                reason="needs >=4 devices")


@pytest.fixture(scope="module")
def params():
    return UtNet.init(jax.random.PRNGKey(0), funit=8)


@pytest.fixture(scope="module")
def pool(params):
    p = EnginePool("UtNet", params, jax.local_devices()[:4],
                   cs=104, ucs=88, compute_dtype="float32")
    yield p
    p.close()


def test_jobs_run_on_distinct_devices_concurrently(pool):
    """4 jobs that rendezvous on a Barrier(4) can only all arrive if 4
    workers execute them at the same time — and each worker owns exactly
    one device, so the reported devices must be 4 distinct chips. A
    sequential or device-sharing pool deadlocks the barrier (-> Broken
    BarrierError, test failure) instead of hanging (timeout below)."""
    barrier = threading.Barrier(4)
    devices, lock = [], threading.Lock()

    def job(worker):
        barrier.wait(timeout=60)
        with lock:
            devices.append(worker.device)
        return worker.device.id

    threads = [threading.Thread(target=pool.submit, args=(job,))
               for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive(), "pool job never completed"
    assert len({d.id for d in devices}) == 4


def test_pool_matches_single_engine_bitwise(pool, params):
    """Every replica must produce the single-device engine's exact bytes:
    same forward, same compiled program, different chip. Mixed request
    shapes exercise the per-size engine cache and the tiny fallback
    (24x30 is below the minimum 104/88 tiling)."""
    ref_adaptive = AdaptiveEngine("UtNet", params, cs=104, ucs=88,
                                  compute_dtype="float32")
    rng = np.random.default_rng(7)
    shapes = [(120, 150), (96, 130), (104, 104), (24, 30)]
    imgs = [rng.random((h, w, 3), dtype=np.float32) for h, w in shapes]

    got = pool.map(imgs, lambda w, im: (str(w.device),
                                        w.denoise_raw(im, 1.0,
                                                      out_dtype="float32")))
    used = set()
    for im, (dev, out) in zip(imgs, got):
        want = ref_adaptive.denoise_raw(im, 1.0, out_dtype="float32")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
        used.add(dev)
    assert len(used) >= 2, f"map never spread across devices: {used}"


def test_map_preserves_item_order(pool):
    out = pool.map(list(range(10)), lambda w, i: i * i)
    assert out == [i * i for i in range(10)]


def test_error_propagates_to_submitter(pool):
    with pytest.raises(ValueError, match="boom"):
        pool.submit(lambda w: (_ for _ in ()).throw(ValueError("boom")))
    # pool still alive afterwards
    assert pool.submit(lambda w: 41) == 41


def test_nonblocking_submit_backpressure(params):
    """One worker + max_pending=1: while a job occupies the worker and a
    second fills the queue, a non-blocking submit must raise queue.Full
    (pipeline/serve maps this to HTTP 503)."""
    p = EnginePool("UtNet", params, jax.local_devices()[:1],
                   cs=104, ucs=88, compute_dtype="float32", max_pending=1)
    try:
        started, release = threading.Event(), threading.Event()

        def blocker(worker):
            started.set()
            assert release.wait(timeout=60)
            return "done"

        t1 = threading.Thread(target=p.submit, args=(blocker,))
        t1.start()
        assert started.wait(timeout=30)
        # worker busy; this one parks in the (size-1) queue
        t2 = threading.Thread(target=p.submit, args=(lambda w: None,))
        t2.start()
        deadline = threading.Event()
        for _ in range(200):  # wait for t2's job to actually occupy the queue
            if p._q.full():
                break
            deadline.wait(0.01)
        assert p._q.full()
        with pytest.raises(queue.Full):
            p.submit(lambda w: None, block=False)
        release.set()
        t1.join(timeout=30)
        t2.join(timeout=30)
        assert not t1.is_alive() and not t2.is_alive()
    finally:
        release.set()
        p.close()


def test_pinned_engine_commits_to_device(params):
    """The device= pin on make_engine commits params and outputs to that
    chip (the pool's zero-cross-device-traffic claim, checked directly)."""
    dev = jax.local_devices()[2]
    eng = make_engine("UtNet", params, cs=104, ucs=88,
                      compute_dtype="float32", device=dev)
    leaf = jax.tree_util.tree_leaves(eng.params)[0]
    assert leaf.devices() == {dev}
    out = eng.denoise_raw(
        np.random.default_rng(0).random((104, 104, 3), dtype=np.float32),
        1.0, out_dtype="device")
    assert out.devices() == {dev}


def test_submit_after_close_raises_not_hangs(params):
    """A submit racing close() must error out, never hang: once the flag
    check in submit() has passed, close() can retire every worker before
    the job is enqueued. Simulated deterministically by clearing the flag
    on an already-retired pool (the submitter's view during the race
    window), submitting, then restoring the flag."""
    p = EnginePool("UtNet", params, jax.local_devices()[:2],
                   cs=104, ucs=88, compute_dtype="float32")
    p.close()  # workers retired
    p._closing.clear()  # the race window: submitter sees flag unset
    err = []

    def racer():
        try:
            p.submit(lambda w: "never")
        except RuntimeError as e:
            err.append(e)

    t = threading.Thread(target=racer)
    t.start()
    while p._q.empty() and t.is_alive():
        pass  # job reaches the consumerless queue
    p._closing.set()  # close() completes from the submitter's view
    t.join(timeout=10)
    assert not t.is_alive(), "submit hung on a consumerless queue"
    assert err and "closed" in str(err[0])
    # and the public path errors eagerly once the flag is visible
    with pytest.raises(RuntimeError, match="closed"):
        p.submit(lambda w: w)


def test_reload_swaps_every_replica_to_new_weights(params):
    """reload(params_B) must leave EVERY replica serving params_B exactly
    (bit-match vs a fresh engine built on B), not a mix of old and new —
    the barrier hand-off guarantees each worker rebuilds its own replica
    once. Serving-side of checkpoint rollover (POST /reload)."""
    params_b = UtNet.init(jax.random.PRNGKey(1), funit=8)
    p = EnginePool("UtNet", params, jax.local_devices()[:2],
                   cs=104, ucs=88, compute_dtype="float32")
    try:
        img = np.random.default_rng(11).random((104, 104, 3),
                                               dtype=np.float32)
        before = np.asarray(p.denoise_raw(img, 1.0))
        p.reload(params_b)
        ref = np.asarray(AdaptiveEngine(
            "UtNet", params_b, cs=104, ucs=88, compute_dtype="float32"
        ).denoise_raw(img, 1.0))
        assert not np.array_equal(before, ref), "weights A == weights B?"
        # check each replica directly, not via the queue (which could land
        # both probes on one worker)
        for r in p._replicas:
            np.testing.assert_array_equal(
                np.asarray(r.denoise_raw(img, 1.0, out_dtype="float32")),
                ref)
        # and the pool still serves
        np.testing.assert_array_equal(np.asarray(p.denoise_raw(img, 1.0)),
                                      ref)
    finally:
        p.close()


def test_reload_under_concurrent_traffic_never_drops(params):
    """Denoise requests racing a rollover must ALL succeed (served by the
    old or the new engines — never dropped, never deadlocked on the
    quiesce barrier) and requests issued after reload() returns must be on
    the new weights."""
    params_b = UtNet.init(jax.random.PRNGKey(2), funit=8)
    p = EnginePool("UtNet", params, jax.local_devices()[:2],
                   cs=104, ucs=88, compute_dtype="float32")
    try:
        img = np.random.default_rng(12).random((104, 104, 3),
                                               dtype=np.float32)
        p.denoise_raw(img, 1.0)  # warm compiles before the race
        errs, outs = [], []
        lock = threading.Lock()

        def traffic():
            try:
                o = np.asarray(p.denoise_raw(img, 1.0))
                with lock:
                    outs.append(o)
            except Exception as e:  # noqa: BLE001 — recorded for the assert
                with lock:
                    errs.append(e)

        threads = [threading.Thread(target=traffic) for _ in range(6)]
        for t in threads[:3]:
            t.start()
        p.reload(params_b)
        for t in threads[3:]:
            t.start()
        for t in threads:
            t.join(timeout=300)
            assert not t.is_alive(), "request hung across the rollover"
        assert not errs, errs
        assert len(outs) == 6
        ref = np.asarray(AdaptiveEngine(
            "UtNet", params_b, cs=104, ucs=88, compute_dtype="float32"
        ).denoise_raw(img, 1.0))
        np.testing.assert_array_equal(np.asarray(p.denoise_raw(img, 1.0)),
                                      ref)
    finally:
        p.close()


def test_close_releases_pending_waiters(params):
    """Jobs sitting on the queue after the workers have retired must have
    their waiters released with an error by close()'s drain (not left
    blocked forever). close() is idempotent, so the drain can be driven
    deterministically: retire the pool, plant a job on the consumerless
    queue, close again."""
    p = EnginePool("UtNet", params, jax.local_devices()[:2],
                   cs=104, ucs=88, compute_dtype="float32")
    p.close()
    done = {"event": threading.Event()}
    p._q.put((lambda w: "never", done))
    p.close()  # drain pass
    assert done["event"].is_set()
    assert isinstance(done.get("error"), RuntimeError)


def test_close_releases_pending_typed_waiters(params):
    """Same as above but with a TYPED ("den", key, payload, done) 4-tuple
    job: the done-dict is the LAST element, not job[1] — a drain that
    assumed the generic layout raised TypeError on the key tuple and died,
    stranding every job behind it (regression, round 3)."""
    p = EnginePool("UtNet", params, jax.local_devices()[:2],
                   cs=104, ucs=88, compute_dtype="float32")
    p.close()
    typed_done = {"event": threading.Event()}
    generic_done = {"event": threading.Event()}
    key = ((8, 8, 3), "<f4", 1.0)
    p._q.put(("den", key, {"raw": None, "scale": 1.0, "post": None},
              typed_done))
    p._q.put((lambda w: "never", generic_done))  # behind the typed job
    p.close()  # drain pass must survive the 4-tuple and reach this one
    for done in (typed_done, generic_done):
        assert done["event"].is_set()
        assert isinstance(done.get("error"), RuntimeError)


def test_reload_failure_is_atomic(params, monkeypatch):
    """A per-device rebuild failure mid-rollover must leave EVERY replica
    on the OLD checkpoint (all-or-nothing swap via the second barrier
    phase) and raise — never a pool serving MIXED checkpoints where which
    weights a request gets is load-balancer luck."""
    import nind_denoise_tpu.engine.tile_engine as te

    params_b = UtNet.init(jax.random.PRNGKey(3), funit=8)
    p = EnginePool("UtNet", params, jax.local_devices()[:2],
                   cs=104, ucs=88, compute_dtype="float32")
    try:
        img = np.random.default_rng(21).random((104, 104, 3),
                                               dtype=np.float32)
        ref_old = np.asarray(p._replicas[0].denoise_raw(
            img, 1.0, out_dtype="float32"))

        real = te.AdaptiveEngine
        fail_dev = p.devices[1]

        class Flaky(real):
            """Build succeeds on device 0, raises on device 1 — the
            partial-failure scenario (OOM / transient backend error)."""

            def __init__(self, *a, device=None, **kw):
                if device == fail_dev:
                    raise RuntimeError("simulated device OOM")
                super().__init__(*a, device=device, **kw)

        monkeypatch.setattr(te, "AdaptiveEngine", Flaky)
        with pytest.raises(RuntimeError, match="previous checkpoint"):
            p.reload(params_b)
        monkeypatch.setattr(te, "AdaptiveEngine", real)

        # EVERY replica (including device 0, whose build succeeded) must
        # still serve the old weights, and the pool must keep serving
        for r in p._replicas:
            np.testing.assert_array_equal(
                np.asarray(r.denoise_raw(img, 1.0, out_dtype="float32")),
                ref_old)
        np.testing.assert_array_equal(np.asarray(p.denoise_raw(img, 1.0)),
                                      ref_old)
        # and a subsequent (unbroken) rollover still works
        p.reload(params_b)
        ref_new = np.asarray(AdaptiveEngine(
            "UtNet", params_b, cs=104, ucs=88, compute_dtype="float32"
        ).denoise_raw(img, 1.0))
        np.testing.assert_array_equal(np.asarray(p.denoise_raw(img, 1.0)),
                                      ref_new)
    finally:
        p.close()


# -- typed coalescing (continuous batching per worker) -------------------------


def test_typed_denoise_coalesces_on_one_worker(params):
    """4 same-key typed requests queued behind a parked 1-worker pool must
    run as ONE coalesced dispatch (share = whole backlog when there is one
    worker), each result exactly matching the serial engine."""
    p = EnginePool("UtNet", params, jax.local_devices()[:1],
                   cs=104, ucs=88, compute_dtype="float32")
    try:
        rng = np.random.default_rng(31)
        imgs = [rng.random((104, 104, 3), dtype=np.float32)
                for _ in range(4)]
        refs = [np.asarray(p._replicas[0].denoise_raw(
            im, 1.0, out_dtype="float32")) for im in imgs]

        gate, release = threading.Event(), threading.Event()

        def blocker(_engine):
            gate.set()
            assert release.wait(30)
            return True

        bt = threading.Thread(target=lambda: p.submit(blocker))
        bt.start()
        assert gate.wait(10)

        results = [None] * 4

        def post(engine, out01, meta):
            return np.asarray(out01), meta["group"], str(meta["device"])

        def den(i):
            results[i] = p.submit_denoise(imgs[i], 1.0, post)

        threads = [threading.Thread(target=den, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for _ in range(200):
            if p._q.qsize() >= 4:
                break
            threading.Event().wait(0.05)
        assert p._q.qsize() >= 4
        release.set()
        for t in threads:
            t.join()
        bt.join()

        assert p.coalesced == 4
        for (arr, group, dev), ref in zip(results, refs):
            assert group == 4
            np.testing.assert_array_equal(arr, ref)
    finally:
        p.close()


def test_typed_denoise_fair_share_across_workers(params):
    """A 2-worker pool with an 8-deep same-key backlog must NOT let one
    worker hog the whole queue: the fair-share bound caps any group at
    ceil(backlog/workers) = 4, so both devices participate. All results
    stay exact."""
    p = EnginePool("UtNet", params, jax.local_devices()[:2],
                   cs=104, ucs=88, compute_dtype="float32")
    try:
        rng = np.random.default_rng(32)
        imgs = [rng.random((104, 104, 3), dtype=np.float32)
                for _ in range(8)]
        refs = [np.asarray(p._replicas[0].denoise_raw(
            im, 1.0, out_dtype="float32")) for im in imgs]

        gate = threading.Event()
        release = threading.Event()
        parked = []

        def blocker(engine):
            parked.append(engine)
            if len(parked) == 2:
                gate.set()
            assert release.wait(30)
            return True

        bts = [threading.Thread(target=lambda: p.submit(blocker))
               for _ in range(2)]
        for t in bts:
            t.start()
        assert gate.wait(10)  # both workers parked

        results = [None] * 8

        def post(engine, out01, meta):
            return np.asarray(out01), meta["group"]

        def den(i):
            results[i] = p.submit_denoise(imgs[i], 1.0, post)

        threads = [threading.Thread(target=den, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for _ in range(200):
            if p._q.qsize() >= 8:
                break
            threading.Event().wait(0.05)
        assert p._q.qsize() >= 8
        release.set()
        for t in threads:
            t.join()
        for t in bts:
            t.join()

        for (arr, group), ref in zip(results, refs):
            assert group <= 4, "fair-share cap violated (device starvation)"
            np.testing.assert_array_equal(arr, ref)
    finally:
        p.close()


def test_typed_mixed_with_generic_preserves_order(params):
    """A generic job queued between typed requests stops the drain and runs
    on the same worker AFTER the group — FIFO order is never violated."""
    p = EnginePool("UtNet", params, jax.local_devices()[:1],
                   cs=104, ucs=88, compute_dtype="float32")
    try:
        rng = np.random.default_rng(33)
        img = rng.random((104, 104, 3), dtype=np.float32)
        order = []
        olock = threading.Lock()

        gate, release = threading.Event(), threading.Event()

        def blocker(_engine):
            gate.set()
            assert release.wait(30)
            return True

        bt = threading.Thread(target=lambda: p.submit(blocker))
        bt.start()
        assert gate.wait(10)

        def post(engine, out01, meta):
            with olock:
                order.append("den")
            return meta["group"]

        def generic(_engine):
            with olock:
                order.append("gen")
            return True

        ts = [threading.Thread(target=lambda: p.submit_denoise(img, 1.0,
                                                               post))]
        ts[0].start()
        while p._q.qsize() < 1:
            threading.Event().wait(0.02)
        ts.append(threading.Thread(target=lambda: p.submit(generic)))
        ts[1].start()
        while p._q.qsize() < 2:
            threading.Event().wait(0.02)
        ts.append(threading.Thread(target=lambda: p.submit_denoise(img, 1.0,
                                                                   post)))
        ts[2].start()
        while p._q.qsize() < 3:
            threading.Event().wait(0.02)

        release.set()
        for t in ts:
            t.join()
        bt.join()
        assert order == ["den", "gen", "den"]
    finally:
        p.close()


def test_lockstep_wakeup_guarantees_coalescing(pool):
    """THE r4 red-flag race, tested at the pool level deterministically:
    park every worker, queue a 2N-deep typed backlog, release — the
    fair-share denominator counts OUTSTANDING jobs (not residual qsize),
    so the first worker reaching its drain is GUARANTEED a partner and
    coalesced > 0 every run (engine_pool._run spells out the race)."""
    ndev = len(pool.devices)
    gate = threading.Event()
    release = threading.Event()
    parked = []

    def blocker(engine):
        parked.append(engine)
        if len(parked) == ndev:
            gate.set()
        assert release.wait(30)
        return True

    bts = [threading.Thread(target=lambda: pool.submit(blocker))
           for _ in range(ndev)]
    for t in bts:
        t.start()
    assert gate.wait(10)

    rng = np.random.default_rng(3)
    img = rng.random((104, 120, 3), dtype=np.float32)
    before = pool.coalesced
    results = [None] * (2 * ndev)

    def post(engine, out01, meta):
        return np.asarray(out01)

    def hit(i):
        results[i] = pool.submit_denoise(img, 1.0, post)

    threads = [threading.Thread(target=hit, args=(i,))
               for i in range(2 * ndev)]
    for t in threads:
        t.start()
    for _ in range(600):
        if pool._q.qsize() >= 2 * ndev:
            break
        threading.Event().wait(0.05)
    assert pool._q.qsize() >= 2 * ndev
    assert pool._typed_pending == 2 * ndev  # the fair-share numerator
    release.set()
    for t in threads:
        t.join()
    for t in bts:
        t.join()
    assert pool.coalesced > before
    # accounting hygiene: every typed job was claimed exactly once
    assert pool._typed_pending == 0
    for r in results[1:]:
        np.testing.assert_array_equal(r, results[0])


def test_typed_pending_rolls_back_on_queue_full(params):
    """A queue.Full rejection must un-count its job (the fair-share
    numerator would otherwise drift up forever under load shedding)."""
    p = EnginePool("UtNet", params, jax.local_devices()[:2],
                   cs=104, ucs=88, compute_dtype="float32", max_pending=1)
    try:
        gate = threading.Event()
        release = threading.Event()

        def blocker(engine):
            gate.set()
            release.wait(20)
            return True

        ts = [threading.Thread(target=lambda: p.submit(blocker))
              for _ in range(2)]
        for t in ts:
            t.start()
        assert gate.wait(10)
        img = np.zeros((104, 120, 3), np.float32)
        filler = threading.Thread(
            target=lambda: p.submit_denoise(img, 1.0,
                                            lambda e, o, m: True))
        filler.start()
        for _ in range(100):  # wait until the queue slot is taken
            if p._q.qsize() >= 1:
                break
            threading.Event().wait(0.05)
        with pytest.raises(queue.Full):
            p.submit_denoise(img, 1.0, lambda e, o, m: True, block=False)
        pending_after_reject = p._typed_pending
        release.set()
        filler.join()
        ts_join = [t.join() for t in ts]
        assert pending_after_reject <= 1  # the rejected job was un-counted
        assert p._typed_pending == 0
    finally:
        release.set()
        p.close()
