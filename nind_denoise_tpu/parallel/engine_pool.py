"""Request-level device parallelism: one independent engine replica per
device, a shared work queue, zero cross-device collectives.

The third multi-device strategy next to row-band tile sharding
(parallel/sharded_engine — minimizes single-request LATENCY) and same-shape
image batching (parallel/batch_engine — lockstep directory batches): the
pool maximizes aggregate THROUGHPUT for concurrent, independently-sized
requests. Each request runs start-to-finish on one chip — its uploads,
tile programs, RL post-ops, and quantize never leave that device — so N
chips serve N requests at exactly single-chip speed (embarrassingly
parallel; no sharding losses, no collectives, no shape coupling between
requests). Under backlogs DEEPER than the device count, typed submissions
(``submit_denoise``) additionally coalesce per worker: consecutive
same-(shape, dtype, scale) requests run as one engine dispatch
(TileEngine.denoise_many continuous batching), bounded to each worker's
fair share of the backlog so sibling devices never starve.

The reference has no analog: its only invocation model is a fresh process
per image (/root/reference/src/denoise.py __main__), so concurrent serving
does not exist there at all.

Thread/device discipline: each worker thread owns its device outright
(params committed there, every array creation under that thread's
jax.default_device scope — see TileEngine._placement). Local backends
accept concurrent dispatch from multiple threads to DISTINCT devices; the
dev-tunnel single-dispatcher rule (CLAUDE.md) is a remote-tunnel
constraint and moot here because tunneled hosts expose one device, giving
a one-worker pool — the same serialization the rule demands.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, List, Optional

import numpy as np


class EnginePool:
    """N device-pinned AdaptiveEngine replicas consuming one bounded queue.

    ``submit(fn)`` blocks until some worker has run ``fn(worker_engine)``
    and returns its result; with ``block=False`` a full queue raises
    ``queue.Full`` immediately (callers map this to backpressure, e.g.
    HTTP 503 in pipeline/serve). Jobs receive the worker's AdaptiveEngine
    so device-side post-ops (the RL stage) run on the same chip as the
    denoise that produced their input.
    """

    def __init__(self, network: str, params, devices=None, *,
                 cs: Optional[int] = None, ucs: Optional[int] = None,
                 activation: str = "PReLU", batch_size: int = 8,
                 compute_dtype: str = "bfloat16", precision: str = "default",
                 max_subpixels: Optional[int] = None, max_pending: int = 0):
        import jax

        from ..engine.tile_engine import AdaptiveEngine

        devices = list(jax.local_devices() if devices is None else devices)
        if not devices:
            raise ValueError("EnginePool needs at least one device")
        # the single source of replica config: __init__ and reload() both
        # build from this dict, so boot-time and rolled-over replicas can
        # never drift in configuration
        self._build_kw = dict(network=network, cs=cs, ucs=ucs,
                              activation=activation, batch_size=batch_size,
                              compute_dtype=compute_dtype,
                              precision=precision,
                              max_subpixels=max_subpixels)
        kw = dict(self._build_kw)
        net = kw.pop("network")
        # replicas build serially here (not in the worker threads) so
        # constructor errors surface eagerly and later replicas reuse the
        # first one's compile-cache entries
        self._replicas: List[AdaptiveEngine] = [
            AdaptiveEngine(net, params, device=d, **kw) for d in devices]
        self.devices = devices
        self.cs, self.ucs = self._replicas[0].cs, self._replicas[0].ucs
        self._q: queue.Queue = queue.Queue(maxsize=max_pending)
        self._closing = threading.Event()
        self._reload_lock = threading.Lock()
        self.coalesced = 0  # requests that rode a shared dispatch
        self._coalesce_lock = threading.Lock()
        # typed denoise jobs submitted but not yet claimed by a group —
        # the fair-share denominator's NUMERATOR. It must NOT be
        # ``q.qsize()``: see the lockstep-race note in ``_run``.
        self._typed_pending = 0
        # workers look their replica up PER JOB (not a captured object) so
        # reload() can swap checkpoints under live traffic
        self._workers = [threading.Thread(target=self._run, args=(i,),
                                          daemon=True)
                         for i in range(len(self._replicas))]
        for t in self._workers:
            t.start()

    # -- worker loop -----------------------------------------------------

    # max typed requests one worker coalesces into a single engine dispatch
    MAX_COALESCE = 8

    def _run(self, idx: int):
        # per-device consumer over generic jobs + typed denoise jobs
        # (shared drain machinery: utils/workqueue.consume). Unlike serve's
        # single dispatcher, greedy draining here would STARVE sibling
        # devices — with 8 queued requests and 8 idle chips the right
        # answer is one request per chip, not one chip doing all 8 — so
        # each worker's drain limit is its fair share of the current
        # backlog (the job in hand counts toward it).
        #
        # THE LOCKSTEP RACE (why the share reads _typed_pending and not
        # q.qsize()): when N parked workers wake simultaneously over a
        # backlog of 2N, each pops ONE job from the queue before any of
        # them computes its share. By the time the first worker asks, the
        # queue holds only ~N jobs — qsize-based share = (N+1)//N = 1 —
        # so every worker forms a singleton group, finishes, pops another
        # singleton, and the 2N-deep backlog drains with ZERO coalescing
        # (observed intermittently in r3/r4 as
        # test_pool_mode_coalesces_queued_requests failures). The fix:
        # count OUTSTANDING typed work — incremented at submit, decremented
        # only when a group CLAIMS its members (_run_group entry) — so
        # in-hand-but-unclaimed jobs still count. In the wake-up storm
        # every worker sees pending=2N and takes ceil(2N/N)=2: the first
        # worker to reach its drain is GUARANTEED a partner (at most N of
        # the 2N jobs are in hand, so the queue is non-empty).
        from ..utils import workqueue

        def fair_share() -> int:
            nw = max(1, len(self._workers))
            with self._coalesce_lock:
                pending = self._typed_pending
            share = max(1, -(-pending // nw))  # ceil
            return min(self.MAX_COALESCE, share)

        workqueue.consume(self._q, self._closing,
                          lambda job: self._run_one(idx, job),
                          lambda group: self._run_group(idx, group),
                          fair_share, get_timeout=0.25)

    @staticmethod
    def _fail(done, e: BaseException, what: str = "pool") -> None:
        # the waiter must always be released (same rationale as serve's
        # dispatcher)
        done["error"] = (e if isinstance(e, Exception) else
                         RuntimeError(f"fatal {what} error: {e!r}"))

    def _run_one(self, idx: int, job):
        fn, done = job
        try:
            done["result"] = fn(self._replicas[idx])
        except BaseException as e:  # noqa: BLE001 — see _fail
            self._fail(done, e)
        finally:
            done["event"].set()

    def _run_group(self, idx: int, group):
        """One coalesced dispatch for N same-key typed requests on THIS
        worker's replica, then each request's ``post`` (RL/quantize/fetch —
        params may differ per request) runs individually on the same
        device."""
        import time as _time

        replica = self._replicas[idx]
        payloads = [j[2] for j in group]
        dones = [j[3] for j in group]
        with self._coalesce_lock:  # these jobs are now claimed, not pending
            self._typed_pending -= len(group)
            for d in dones:
                d["claimed"] = True
        t0 = _time.perf_counter()
        try:
            outs = replica.denoise_many([p["raw"] for p in payloads],
                                        payloads[0]["scale"],
                                        out_dtype="device")
        except BaseException as e:  # noqa: BLE001 — see _fail
            for d in dones:
                self._fail(d, e)
                d["event"].set()
            return
        meta = {"device": replica.device, "group": len(group),
                "elapsed": _time.perf_counter() - t0}
        if len(group) > 1:
            with self._coalesce_lock:
                self.coalesced += len(group)
        for p, out01, d in zip(payloads, outs, dones):
            try:
                d["result"] = p["post"](replica, out01, meta)
            except BaseException as e:  # noqa: BLE001 — see _fail
                self._fail(d, e)
            finally:
                d["event"].set()

    # -- checkpoint rollover ----------------------------------------------

    def reload(self, params, quiesce_timeout: float = 3600.0) -> None:
        """Swap every replica to ``params`` (same network/config) as a
        drain-and-swap rollover: N jobs park their workers at a barrier (a
        worker runs one job at a time, so the barrier releasing proves all
        N workers are simultaneously idle — in-flight requests finished),
        then each worker rebuilds ITS OWN replica on the thread that owns
        the device. Requests enqueued behind the rollover jobs are served
        by the new engines. NOTE: engine params are immutable by design
        (derived kernels are jit closure constants), so a rollover builds
        fresh engines — the first request per tile-shape bucket afterwards
        pays a (persistently cached) compile. Raises BrokenBarrierError if
        the pool cannot quiesce within ``quiesce_timeout`` (the pool keeps
        serving on the old checkpoint).

        The swap is ALL-OR-NOTHING: builds happen into a side table, a
        second barrier proves every build finished, and only if all N
        succeeded does any worker swap. A per-device build failure (OOM,
        transient backend error) therefore leaves every replica on the old
        checkpoint — never a pool serving mixed checkpoints — and reload
        raises with the build error chained."""
        from ..engine.tile_engine import AdaptiveEngine

        kw = dict(self._build_kw)
        network = kw.pop("network")
        n = len(self._workers)
        barrier = threading.Barrier(n)  # cyclic: reused for phase 2
        built: List[Optional[AdaptiveEngine]] = [None] * n
        errors: List[BaseException] = []
        err_lock = threading.Lock()

        def rebuild(replica):
            try:
                barrier.wait(timeout=quiesce_timeout)
            except threading.BrokenBarrierError:
                barrier.abort()  # release any workers still parked
                raise
            # identify the worker by the (pre-swap, distinct) replica it
            # holds; the barrier guarantees no swap happened yet
            i = self._replicas.index(replica)
            try:
                built[i] = AdaptiveEngine(network, params,
                                          device=replica.device, **kw)
            except BaseException as e:  # noqa: BLE001 — must reach phase 2
                with err_lock:
                    errors.append(e)
            # phase 2: every build has finished (success or not) before any
            # worker decides; all swap or none does
            try:
                barrier.wait(timeout=quiesce_timeout)
            except threading.BrokenBarrierError:
                barrier.abort()
                raise
            if not errors:
                self._replicas[i] = built[i]
            return i

        # serialize rollovers: two interleaved barrier-job sets could park
        # the workers across DIFFERENT barriers and neither would release
        with self._reload_lock:
            done = self.map(range(len(self._workers)),
                            lambda w, _i: rebuild(w))
        assert sorted(done) == list(range(len(self._workers)))
        if errors:
            raise RuntimeError(
                "checkpoint rollover aborted: a replica rebuild failed; "
                "ALL devices keep serving the previous checkpoint"
            ) from errors[0]

    # -- submission ------------------------------------------------------

    def _enqueue_and_wait(self, item, done, block: bool):
        if self._closing.is_set():
            raise RuntimeError("EnginePool is closed")
        if block:
            self._q.put(item)
        else:
            self._q.put_nowait(item)
        # liveness loop, not a bare wait: a close() racing this submit can
        # retire every worker between the flag check above and the put, and
        # the job would then sit on a consumerless queue forever
        while not done["event"].wait(timeout=0.25):
            if self._closing.is_set() and \
                    not any(t.is_alive() for t in self._workers):
                raise RuntimeError("EnginePool closed while the job was "
                                   "pending")
        if "error" in done:
            raise done["error"]
        return done["result"]

    def submit(self, fn: Callable, block: bool = True):
        """Run ``fn(worker_engine)`` on some device's worker; returns its
        result (re-raising its exception). block=False raises queue.Full
        instead of waiting for queue space."""
        done = {"event": threading.Event()}
        return self._enqueue_and_wait((fn, done), done, block)

    def submit_denoise(self, raw: np.ndarray, scale: float, post: Callable,
                       block: bool = True):
        """Typed submission a worker may COALESCE with consecutive queued
        requests of the same (shape, dtype, scale) into one engine dispatch
        (fair-share bounded — see _run). ``post(engine, out01_device, meta)``
        runs per request on the owning worker afterwards (RL/quantize/fetch;
        ``meta`` = {device, group, elapsed}); its return value is this
        call's result."""
        done = {"event": threading.Event()}
        key = (raw.shape, raw.dtype.str, float(scale))
        payload = {"raw": raw, "scale": scale, "post": post}
        # count the job as outstanding BEFORE it can be popped (fair-share
        # numerator — see the lockstep-race note in _run); roll back if the
        # enqueue itself fails (queue.Full / closed pool)
        with self._coalesce_lock:
            self._typed_pending += 1
        try:
            return self._enqueue_and_wait(("den", key, payload, done), done,
                                          block)
        except BaseException:
            # un-count the job unless a worker's _run_group claimed it
            # (which already decremented). Unclaimed paths: queue.Full,
            # closed-pool raises before the put, and close() draining the
            # job without running it.
            with self._coalesce_lock:
                if not done.get("claimed"):
                    self._typed_pending -= 1
                    done["claimed"] = True  # idempotence vs late close()
            raise

    def denoise_raw(self, raw_hwc: np.ndarray, scale: float,
                    out_dtype: str = "float32"):
        """Blocking convenience: tiling-adaptive denoise on some device."""
        return self.submit(lambda w: w.denoise_raw(raw_hwc, scale,
                                                   out_dtype=out_dtype))

    def map(self, items, fn: Callable):
        """Run ``fn(worker_engine, item)`` for every item across the pool;
        results in item order. Feeding happens from caller threads (one per
        in-flight item) so a bounded queue still provides backpressure."""
        import concurrent.futures as fut

        with fut.ThreadPoolExecutor(max_workers=max(1, len(self._workers))) \
                as feeders:
            futures = [feeders.submit(self.submit,
                                      lambda w, it=item: fn(w, it))
                       for item in items]
            return [f.result() for f in futures]

    def close(self):
        self._closing.set()
        for _ in self._workers:
            try:
                self._q.put_nowait(None)
            except queue.Full:
                break
        for t in self._workers:
            t.join(timeout=5.0)
        # release waiters whose jobs the retired workers will never run
        # (submit's liveness loop also catches these; this is the fast path)
        while True:
            try:
                job = self._q.get_nowait()
            except queue.Empty:
                return
            if job is not None:
                # done-dict is the LAST element in both job layouts:
                # generic (fn, done) and typed ("den", key, payload, done)
                done = job[-1]
                done["error"] = RuntimeError(
                    "EnginePool closed before the job ran")
                done["event"].set()
