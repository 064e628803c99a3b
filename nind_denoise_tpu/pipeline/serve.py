"""denoise-serve — a persistent HTTP serving daemon around the warm engine.

The reference's only invocation model is a fresh process per image
(/root/reference/src/denoise.py __main__ and the Lua plugin shelling
``python3 denoise.py`` per export, lua-scripts/nind_denoise_rl.lua:330-465),
which pays interpreter start, model load, and XLA compile every time. For
production serving the engine wants to stay warm: compiled tile programs
are reusable across requests (engine/tile_engine bucketing), parameters
stay device-resident, and the persistent compile cache covers restarts.

Design:

* stdlib ``http.server`` — zero new dependencies.
* Single-device hosts: ALL device work runs on ONE dispatcher thread
  consuming a request queue (HTTP handler threads enqueue and wait). This
  is correct under the dev tunnel's single-dispatcher discipline
  (CLAUDE.md transfers rule) and the sane serialization for one
  accelerator in production.
* Continuous batching: in single mode, consecutive queued requests with
  the same (shape, dtype, scale) coalesce into ONE engine dispatch
  (engine/tile_engine.denoise_many — tile batches fill across image
  boundaries, so small images stop running the batch program mostly
  empty). Per-request RL params still apply individually, results are
  bit-identical to the serial path, and a queued reload is never
  reordered (the drain stops at any non-matching job). The
  ``coalesced_requests`` stat counts requests that rode a shared
  dispatch.
* Multi-device hosts pick a parallelism strategy (``--parallel``):
  - ``shard`` (default): each request row-band sharded across all devices
    (parallel/sharded_engine) — minimizes single-request latency.
  - ``images``: one engine replica per device, requests load-balance
    across them (parallel/engine_pool) — maximizes aggregate throughput
    under concurrent traffic; each request runs whole on one chip.

Endpoints:

* ``GET  /healthz``            -> {"status": "ok", "devices": N, ...}
* ``GET  /stats``              -> request counters + timing, incl. a
  ``latency_ms`` block (p50/p95/p99/mean/max over the last 1024 requests,
  measured decode -> fetched result so queue wait counts)
* ``POST /denoise``            -> body: encoded image (png/jpg/tiff bytes);
  query params: ``output`` (jpg|png|tiff, default jpg), ``quality`` (jpeg,
  default 90), ``rl`` (1|0, default 1 — RL-deblur like the pipeline),
  ``sigma``, ``iterations``, ``psf``. Response: encoded output bytes.

egrun:
    python -m nind_denoise_tpu.pipeline.serve --model_path ckpt.npz \
        --network UtNet --port 8601
    curl -X POST --data-binary @noisy.png \
        'http://localhost:8601/denoise?output=png' > out.png
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class ServiceBusy(RuntimeError):
    """Request queue at capacity — mapped to HTTP 503 (shed, don't buffer)."""


class DenoiseService:
    """Warm engine(s) + dispatch; thread-safe submit().

    ``parallel``: 'auto' (shard when >1 device), 'shard' (row-band split
    every request over all devices), 'images' (request-per-device pool),
    or 'single' (force one device).
    """

    def __init__(self, network: str, model_path: str, cs=None, ucs=None,
                 activation: str = "PReLU", batch_size: int = 8,
                 compute_dtype: str = "bfloat16", devices=None,
                 max_pending: int = 8, parallel: str = "auto"):
        import jax

        from ..models import params_io

        self.ndev = devices or jax.local_device_count()
        params, state = params_io.load_generator(model_path, network)
        if network == "UNet":
            params = (params, state)
        self._network, self._params = network, params
        self._activation, self._batch_size = activation, batch_size
        self._compute_dtype = compute_dtype
        if parallel == "auto":
            parallel = "shard" if self.ndev > 1 else "single"
        if parallel != "images" and self.ndev <= 1:
            parallel = "single"
        self.mode = parallel
        self.stats = {"requests": 0, "errors": 0, "megapixels": 0.0,
                      "busy_s": 0.0, "reloads": 0, "per_device": {},
                      "coalesced_requests": 0,
                      # queue-full 503s — kept OUT of latency_ms so the
                      # percentiles reflect only admitted requests
                      "rejected_busy": 0,
                      # coalesced-dispatch size histogram {size: count}
                      "group_sizes": {},
                      # cumulative per-stage wall seconds across requests
                      # (divide by `requests` for means): decode = body ->
                      # RGB array, queue = enqueue -> dispatcher pickup,
                      # denoise = engine dispatch, post = RL/quantize +
                      # fetch, encode = u8 -> response bytes. The stage
                      # breakdown that localizes an HTTP-vs-CLI gap.
                      "stage_s": {"decode": 0.0, "queue": 0.0,
                                  "denoise": 0.0, "post": 0.0,
                                  "encode": 0.0}}
        self._stats_lock = threading.Lock()
        # per-request wall latency (decode -> fetched result, i.e. queue
        # wait + denoise + post), last LATENCY_WINDOW requests — the /stats
        # p50/p95/p99 an operator alerts on. Bounded so a long-lived daemon
        # never grows it.
        import collections

        self._latencies = collections.deque(maxlen=self.LATENCY_WINDOW)

        self._pool = None
        self._q = None
        if parallel == "images":
            from ..parallel.engine_pool import EnginePool

            self._pool = EnginePool(
                network, params, jax.local_devices()[:self.ndev],
                cs=cs, ucs=ucs, activation=activation,
                batch_size=batch_size, compute_dtype=compute_dtype,
                max_pending=max_pending)
            self.cs, self.ucs = self._pool.cs, self._pool.ucs
            return

        if parallel == "shard":
            from ..core.tiles import default_cs_ucs

            if cs is None or ucs is None:
                cs, ucs = default_cs_ucs(network)
            self.cs, self.ucs = cs, ucs
            from ..models import get_network

            self._check_cs = getattr(get_network(network), "check_cs", None)
            self.__dict__.update(self._build_stack(params, cs, ucs))
        else:  # single
            self.__dict__.update(self._build_stack(params, cs, ucs))
            self.cs, self.ucs = self._adaptive.cs, self._adaptive.ucs

        # bounded queue = backpressure: each queued job closes over a
        # decoded image, so an unbounded queue lets concurrent uploads pin
        # arbitrary host RAM; beyond the bound submit() raises ServiceBusy
        # (-> HTTP 503) instead of buffering
        self._q = queue.Queue(maxsize=max_pending)
        self._closing = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _build_stack(self, params, cs, ucs) -> dict:
        """Construct the COMPLETE engine stack for the current mode into a
        plain dict of attributes. Nothing observable mutates until the
        caller applies the dict (``self.__dict__.update``), so __init__ and
        reload() share one construction recipe and a mid-build failure
        (device OOM, transient backend error) leaves the service wholly on
        the previous stack — never a torn mix of old tiled / new tiny
        engines."""
        from ..engine.tile_engine import AdaptiveEngine, resolve_apply_fn

        if self.mode == "shard":
            # resolve the forward ONCE; every per-tile-size sharded
            # denoiser reuses it
            resolved = resolve_apply_fn(self._network, params,
                                        self._activation,
                                        compute_dtype=self._compute_dtype)
            # warm the default tile size eagerly
            sharded = {(cs, ucs): self._make_sharded(resolved, cs, ucs)}
            tiny = AdaptiveEngine(self._network, params, cs=cs, ucs=ucs,
                                  activation=self._activation,
                                  batch_size=self._batch_size,
                                  compute_dtype=self._compute_dtype,
                                  resolved=resolved)
            return {"_resolved": resolved, "_sharded": sharded,
                    "_tiny": tiny}
        adaptive = AdaptiveEngine(self._network, params, cs=cs, ucs=ucs,
                                  activation=self._activation,
                                  batch_size=self._batch_size,
                                  compute_dtype=self._compute_dtype)
        adaptive._engine_for(adaptive.cs, adaptive.ucs)  # warm eagerly
        return {"_adaptive": adaptive}

    def _make_sharded(self, resolved, cs: int, ucs: int):
        from ..engine.tile_engine import make_sharded_denoiser

        sharded = make_sharded_denoiser(
            self._network, None, self.ndev, cs=cs, ucs=ucs,
            batch_size=self._batch_size,
            compute_dtype=self._compute_dtype, resolved=resolved)
        # multi-chip hosts have fast PCIe + many cores: host fp32 is fine
        return lambda raw, scale: sharded.denoise_hwc(
            raw.astype(np.float32) / scale)

    def _sharded_for_cs(self, cs: int, ucs: int):
        """Row-band sharded denoiser per tile size, cached — small requests
        get an adapted tiling instead of a TilePlan error."""
        key = (cs, ucs)
        if key not in self._sharded:
            self._sharded[key] = self._make_sharded(self._resolved, cs, ucs)
        return self._sharded[key]

    def _denoise_raw(self, raw: np.ndarray, scale: float):
        """Dispatcher-thread denoise for the single/shard modes (the pool
        mode routes through its worker replicas instead)."""
        if self.mode == "single":
            return self._adaptive.denoise_raw(raw, scale, out_dtype="device")
        from ..core import tiles as tiles_mod

        try:
            cs, ucs = tiles_mod.adapt_cs_ucs(raw.shape[0], raw.shape[1],
                                             self.cs, self.ucs,
                                             check=self._check_cs)
        except tiles_mod.TilingError:
            # below the minimum tiling: pad-to-valid single forward
            # (single-device; sharding a tiny request is pointless)
            return self._tiny.denoise_raw(raw, scale, out_dtype="device")
        return self._sharded_for_cs(cs, ucs)(raw, scale)

    # backwards-compat hook used by tests
    def _denoise01(self, img01: np.ndarray) -> np.ndarray:
        raw = np.ascontiguousarray(img01, np.float32)
        if self.mode == "images":
            return np.asarray(self._pool.denoise_raw(raw, 1.0,
                                                     out_dtype="device"))
        return np.asarray(self._denoise_raw(raw, 1.0))

    # -- dispatcher ----------------------------------------------------------

    # max requests per coalesced dispatch group (single mode): bounds the
    # stacked-band HBM footprint and the worst-case latency a request adds
    # to the ones coalesced behind it
    MAX_COALESCE = 8

    def _run(self):
        # one dispatcher over generic jobs + typed denoise jobs, the latter
        # coalesced per drain (shared machinery: utils/workqueue.consume)
        from ..utils import workqueue

        workqueue.consume(self._q, self._closing, self._run_one,
                          self._run_group, lambda: self.MAX_COALESCE)

    @staticmethod
    def _fail(done, e: BaseException) -> None:
        # the waiter must ALWAYS be released: a SystemExit/native
        # BaseException that escaped here would otherwise hang the
        # submitting request and every later one (the dispatcher is the
        # only consumer)
        done["error"] = (e if isinstance(e, Exception) else
                         RuntimeError(f"fatal dispatcher error: {e!r}"))

    def _run_one(self, job):
        fn, done = job
        try:
            done["result"] = fn()
        except BaseException as e:  # noqa: BLE001 — see _fail
            self._fail(done, e)
        finally:
            done["event"].set()

    def _run_group(self, group):
        """One coalesced denoise dispatch for N queued same-key requests:
        the engine runs them as a single tile stream
        (AdaptiveEngine.denoise_many — batches fill across image
        boundaries), then each request's RL/quantize/fetch runs
        individually (RL params may differ per request)."""
        payloads = [j[2] for j in group]
        dones = [j[3] for j in group]
        t0 = time.perf_counter()
        queue_s = sum(t0 - p["t_enq"] for p in payloads
                      if p.get("t_enq") is not None)
        try:
            outs = self._adaptive.denoise_many(
                [p["raw"] for p in payloads], payloads[0]["scale"],
                out_dtype="device")
        except BaseException as e:  # noqa: BLE001 — see _fail
            for d in dones:
                self._fail(d, e)
                d["event"].set()
            return
        t1 = time.perf_counter()
        mp = 0.0
        # Batch the per-request post for sub-groups with identical RL
        # params: ONE stacked RL dispatch + ONE fetch per sub-group
        # instead of per request. On the ~25 ms/RPC tunnel the per-request
        # posts were the concurrency bottleneck (bench serve_concurrent);
        # identical numerics — the batched pallas RL runs each plane as
        # its own grid cell, bit-identical to the single-image call, and
        # the quantize-only path is elementwise.
        subgroups: dict = {}
        for idx, p in enumerate(payloads):
            key = (bool(p["rl"]), float(p["sigma"]), int(p["iterations"]),
                   p["psf"])
            subgroups.setdefault(key, []).append(idx)
        for idxs in subgroups.values():
            try:
                if len(idxs) == 1:
                    res = [self._post_u8(outs[idxs[0]], payloads[idxs[0]])]
                else:
                    res = self._post_u8_batch([outs[i] for i in idxs],
                                              payloads[idxs[0]])
            except BaseException as e:  # noqa: BLE001 — see _fail
                for i in idxs:
                    self._fail(dones[i], e)
                    dones[i]["event"].set()
                continue
            for i, u8 in zip(idxs, res):
                dones[i]["result"] = u8
                p = payloads[i]
                mp += p["raw"].shape[0] * p["raw"].shape[1] / 1e6
                dones[i]["event"].set()
        t2 = time.perf_counter()
        with self._stats_lock:
            self.stats["busy_s"] += t2 - t0
            self.stats["megapixels"] += mp
            st = self.stats["stage_s"]
            st["queue"] += queue_s
            st["denoise"] += t1 - t0
            st["post"] += t2 - t1
            # dispatch-group size histogram: fragmentation (many small
            # groups) multiplies the fixed per-group wire/RPC cost — the
            # first thing to check when concurrent throughput sags
            gs = self.stats["group_sizes"]
            gs[str(len(group))] = gs.get(str(len(group)), 0) + 1
            if len(group) > 1:
                self.stats["coalesced_requests"] += len(group)

    @staticmethod
    def _post_u8_batch(outs01, p) -> list:
        """Batched per-request post for a coalesced sub-group with shared
        RL params: stack (device-side), one RL/quantize dispatch over the
        batch, ONE fetch, split on host. Group sizes pad to powers of two
        (repeating the first member) so compiled programs stay bounded at
        log2(MAX_COALESCE) per shape; only the real rows are fetched."""
        import jax.numpy as jnp

        from ..engine import transfer

        g = len(outs01)
        stacked = jnp.stack(outs01)
        gp = 1 << (g - 1).bit_length()
        if gp != g:
            stacked = jnp.concatenate(
                [stacked, jnp.broadcast_to(stacked[:1],
                                           (gp - g,) + stacked.shape[1:])])
        if p["rl"]:
            from ..ops import rl_deblur

            dev = rl_deblur.rl_to_u8_device(
                stacked, float(p["sigma"]), int(p["iterations"]),
                psf=p["psf"])
        else:
            dev = jnp.round(jnp.clip(stacked, 0, 1) * 255
                            ).astype(jnp.uint8)
        host = transfer.fast_get(dev[:g])
        return [host[i] for i in range(g)]

    @staticmethod
    def _post_u8(out01, p) -> np.ndarray:
        """Per-request post: on-device RL (or plain quantize) + fetch.
        ``out01`` is a device fp32 HWC array; ``p`` the request payload."""
        import jax.numpy as jnp

        from ..engine import transfer

        if p["rl"]:
            from ..ops import rl_deblur

            dev_u8 = rl_deblur.rl_to_u8_device(
                out01, float(p["sigma"]), int(p["iterations"]), psf=p["psf"])
        else:
            dev_u8 = jnp.round(jnp.clip(jnp.asarray(out01), 0, 1) * 255
                               ).astype(jnp.uint8)
        return transfer.fast_get(dev_u8)

    def _enqueue_and_wait(self, item, done):
        if self._closing.is_set():
            raise ServiceBusy("service is shutting down")
        try:
            self._q.put_nowait(item)
        except queue.Full:
            raise ServiceBusy(
                f"request queue full ({self._q.maxsize} pending)") from None
        # liveness loop, not a bare wait: close() racing this submit can
        # retire the dispatcher between the flag check and the put, leaving
        # the job on a consumerless queue and this request hung forever
        while not done["event"].wait(timeout=0.5):
            if self._closing.is_set() and not self._worker.is_alive():
                raise ServiceBusy("service closed before the request ran")
        if "error" in done:
            raise done["error"]
        return done["result"]

    def submit(self, fn):
        done = {"event": threading.Event()}
        return self._enqueue_and_wait((fn, done), done)

    def submit_denoise(self, raw: np.ndarray, scale: float, rl: bool,
                       sigma: float, iterations: int, psf: str,
                       t_enq: float | None = None) -> np.ndarray:
        """Single-mode typed submission: the dispatcher may coalesce
        CONSECUTIVE queued requests with the same (shape, dtype, scale)
        into one engine dispatch (_run_group). RL params ride the payload —
        they apply per request after the shared denoise."""
        done = {"event": threading.Event()}
        key = (raw.shape, raw.dtype.str, float(scale))
        payload = {"raw": raw, "scale": scale, "rl": rl, "sigma": sigma,
                   "iterations": iterations, "psf": psf,
                   "t_enq": time.perf_counter() if t_enq is None else t_enq}
        return self._enqueue_and_wait(("den", key, payload, done), done)

    def bump(self, key: str) -> None:
        with self._stats_lock:
            self.stats[key] += 1

    def _stage(self, key: str, dt: float) -> None:
        with self._stats_lock:
            self.stats["stage_s"][key] += dt

    # sliding-window size for the latency percentiles in /stats
    LATENCY_WINDOW = 1024

    def snapshot_stats(self) -> dict:
        with self._stats_lock:
            s = dict(self.stats)
            s["per_device"] = dict(s["per_device"])
            s["group_sizes"] = dict(s["group_sizes"])
            s["stage_s"] = {k: round(v, 6)  # µs precision: sub-ms stages
                            for k, v in s["stage_s"].items()}  # must not read 0
            lat = np.asarray(self._latencies, np.float64)
        if lat.size:
            p50, p95, p99 = np.percentile(lat, [50, 95, 99])
            s["latency_ms"] = {"window": int(lat.size),
                               "mean": round(float(lat.mean()) * 1e3, 2),
                               "p50": round(float(p50) * 1e3, 2),
                               "p95": round(float(p95) * 1e3, 2),
                               "p99": round(float(p99) * 1e3, 2),
                               "max": round(float(lat.max()) * 1e3, 2)}
        else:
            # Always present (docs/API.md documents it unconditionally): a
            # dashboard scraping a fresh/idle daemon must not KeyError on
            # latency_ms.p95 — it reads null percentiles over window 0.
            s["latency_ms"] = {"window": 0, "mean": None, "p50": None,
                               "p95": None, "p99": None, "max": None}
        return s

    def prewarm(self, height: int, width: int, dtype: str = "uint16",
                rl: bool = True, sigma: float = 1.0, iterations: int = 10,
                psf: str = "gaussian") -> dict:
        """Compile every program concurrent traffic at (height, width) can
        hit — the coalesced-group power-of-two size buckets (1, 2, 4, ...,
        MAX_COALESCE) for both the denoise dispatch and the batched RL
        post — BEFORE the first request arrives.

        Without this, early traffic pays the bucket compiles one by one as
        racing arrival patterns happen to form new group sizes: measured on
        the tunnel, the first serve_concurrent pass ran 0.12 MP/s against
        1.35 warm on identical code (PERF.md r5). The persistent compile
        cache makes prewarming one-time per host. Runs on the engine
        path's owning thread(s) (dispatcher / pool workers); single and
        images modes only (shard mode's banded program is warmed at
        construction). Returns {"mode", "sizes", "seconds"}."""
        t0 = time.perf_counter()
        np_dtype = np.dtype(dtype)
        scale = {np.uint8: 255.0, np.uint16: 65535.0}.get(np_dtype.type, 1.0)
        rl_p = {"rl": rl, "sigma": sigma, "iterations": iterations,
                "psf": psf}
        sizes = []
        g = 1
        while g <= self.MAX_COALESCE:
            sizes.append(g)
            g *= 2

        def warm_on(engine):
            raw = np.zeros((height, width, 3), np_dtype)
            for n in sizes:
                try:
                    outs = engine.denoise_many([raw] * n, scale,
                                               out_dtype="device")
                except ValueError:
                    # stacked band over budget at this size: real traffic
                    # would fall back per-image too — nothing to warm
                    continue
                if n == 1:
                    self._post_u8(outs[0], rl_p)
                else:
                    self._post_u8_batch(outs, rl_p)
            return True

        if self.mode == "images":
            # every replica warms on its own worker thread/device
            self._pool.map(range(len(self._pool.devices)),
                           lambda w, _i: warm_on(w))
        elif self.mode == "single":
            self.submit(lambda: warm_on(self._adaptive))
        return {"mode": self.mode, "sizes": sizes,
                "seconds": round(time.perf_counter() - t0, 2)}

    def reload(self, model_path: str) -> dict:
        """Hot checkpoint rollover (``POST /reload?model_path=...``): load
        the new weights (host-side IO on the caller thread), rebuild the
        engine stack, and swap it in BETWEEN requests — in-flight requests
        finish on the old checkpoint, later ones run the new one, traffic
        is never dropped. Engines are immutable by design (derived kernels
        are jit closure constants), so this builds fresh engines: the first
        request per tile-shape bucket afterwards pays a (persistently
        cached) compile. The network/tile/batch config is fixed at service
        start; only the weights roll."""
        from ..models import params_io

        params, state = params_io.load_generator(model_path, self._network)
        if self._network == "UNet":
            params = (params, state)

        if self.mode == "images":
            self._pool.reload(params)
        else:
            def swap():
                # runs ON the dispatcher thread: construction dispatches
                # device work (device_put, precompute jits), and the swap
                # must serialize with request denoises anyway. The stack
                # builds FULLY into a local dict before the one-line
                # update, so a mid-build failure leaves every engine on
                # the old checkpoint (no torn tiled/tiny mix).
                stack = self._build_stack(params, self.cs, self.ucs)
                self.__dict__.update(stack)
                return True

            self.submit(swap)
        self._params = params
        with self._stats_lock:
            self.stats["reloads"] += 1
        return {"status": "reloaded", "model_path": model_path,
                "mode": self.mode}

    def close(self):
        if self._pool is not None:
            self._pool.close()
        if self._q is None:
            return
        # Never block: the queue is bounded, so a wedged dispatcher (long
        # remote compile) plus a full queue would hang a blocking put(None)
        # forever. The flag lets _run exit once the queue drains even when
        # the sentinel could not be enqueued.
        self._closing.set()
        try:
            self._q.put_nowait(None)
        except queue.Full:
            pass

    # -- request body --------------------------------------------------------

    def denoise_bytes(self, data: bytes, output: str = "jpg",
                      quality: int = 90, rl: bool = True, sigma: float = 1.0,
                      iterations: int = 10, psf: str = "gaussian") -> bytes:
        import cv2

        if output not in ("jpg", "jpeg", "png", "tiff"):
            # reject BEFORE the denoise: a bad query param must not burn
            # seconds of device time on work whose encode will 400 anyway
            raise ValueError(f"unsupported output format {output!r}")
        t_req = time.perf_counter()
        arr = cv2.imdecode(np.frombuffer(data, np.uint8),
                           cv2.IMREAD_COLOR + cv2.IMREAD_ANYDEPTH)
        if arr is None:
            raise ValueError("could not decode request body as an image")
        scale = {np.uint8: 255.0, np.uint16: 65535.0}.get(arr.dtype.type, 1.0)
        raw = np.ascontiguousarray(arr[..., ::-1])
        t_dec = time.perf_counter()
        self._stage("decode", t_dec - t_req)

        rl_p = {"rl": rl, "sigma": sigma, "iterations": iterations,
                "psf": psf, "t_enq": t_dec}

        def work(denoise):
            """Denoise + the shared post recipe (_post_u8) on the
            dispatcher thread — the shard-mode path."""
            t0 = time.perf_counter()
            self._stage("queue", t0 - rl_p["t_enq"])
            out01 = denoise(raw, scale)
            t1 = time.perf_counter()
            u8 = self._post_u8(out01, rl_p)
            t2 = time.perf_counter()
            with self._stats_lock:
                self.stats["busy_s"] += t2 - t0
                self.stats["megapixels"] += raw.shape[0] * raw.shape[1] / 1e6
                self.stats["stage_s"]["denoise"] += t1 - t0
                self.stats["stage_s"]["post"] += t2 - t1
            return u8

        try:
            u8 = self._dispatch_denoise(raw, scale, rl_p, rl, sigma,
                                        iterations, psf, work)
        except BaseException as e:
            if isinstance(e, ServiceBusy):
                # Instant queue-full rejections must NOT enter the latency
                # window: under overload a flood of ~decode-time 503s
                # would drag p50/p95 DOWN exactly when operators alert on
                # them (ADVICE r4). They are visible as the rejected_busy
                # counter (+ the 503 rate the HTTP layer returns).
                with self._stats_lock:
                    self.stats["rejected_busy"] += 1
            else:
                # Admitted failures count: a request that errors after
                # its queue wait (engine/dispatch raise) must still enter
                # the latency window, or slow-then-failing traffic is
                # invisible to the p95/p99 an operator alerts on
                # (ADVICE r3).
                with self._stats_lock:
                    self._latencies.append(time.perf_counter() - t_req)
            raise
        with self._stats_lock:
            self._latencies.append(time.perf_counter() - t_req)
        t_enc = time.perf_counter()
        bgr = u8[..., ::-1]
        if output in ("jpg", "jpeg"):
            ok, buf = cv2.imencode(".jpg", bgr,
                                   [cv2.IMWRITE_JPEG_QUALITY, int(quality)])
        elif output == "png":
            ok, buf = cv2.imencode(".png", bgr)
        elif output == "tiff":
            ok, buf = cv2.imencode(".tiff", bgr)
        else:
            raise ValueError(f"unsupported output format {output!r}")
        if not ok:
            raise RuntimeError(f"encode to {output} failed")
        out = buf.tobytes()
        self._stage("encode", time.perf_counter() - t_enc)
        return out

    def _dispatch_denoise(self, raw, scale, rl_p, rl, sigma, iterations,
                          psf, work):
        """Route one decoded request to the mode's engine path; returns the
        post-processed uint8 HWC image."""
        if self.mode == "images":

            def post(engine, out01, meta):
                # runs on the owning worker thread, same device as the
                # denoise; meta["elapsed"] is the group dispatch time,
                # attributed per request as an equal share
                t0 = time.perf_counter()
                u8 = self._post_u8(out01, rl_p)
                t1 = time.perf_counter()
                with self._stats_lock:
                    self.stats["busy_s"] += (meta["elapsed"] / meta["group"]
                                             + t1 - t0)
                    self.stats["megapixels"] += \
                        raw.shape[0] * raw.shape[1] / 1e6
                    st = self.stats["stage_s"]
                    st["queue"] += max(0.0, t0 - rl_p["t_enq"]
                                       - meta["elapsed"])
                    st["denoise"] += meta["elapsed"] / meta["group"]
                    st["post"] += t1 - t0
                    k = str(meta["device"])
                    self.stats["per_device"][k] = \
                        self.stats["per_device"].get(k, 0) + 1
                    if meta["group"] > 1:
                        self.stats["coalesced_requests"] += 1
                return u8

            try:
                u8 = self._pool.submit_denoise(raw, scale, post, block=False)
            except queue.Full:
                raise ServiceBusy("request queue full") from None
        elif self.mode == "single":
            # typed path: concurrent same-shape requests coalesce into one
            # engine dispatch (continuous batching — see _run_group)
            u8 = self.submit_denoise(raw, scale, rl, float(sigma),
                                     int(iterations), psf,
                                     t_enq=rl_p["t_enq"])
        else:
            u8 = self.submit(lambda: work(self._denoise_raw))
        return u8


def make_handler(svc: DenoiseService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            path = urllib.parse.urlparse(self.path).path
            if path == "/healthz":
                self._json(200, {"status": "ok", "devices": svc.ndev,
                                 "mode": svc.mode,
                                 "cs": svc.cs, "ucs": svc.ucs})
            elif path == "/stats":
                self._json(200, svc.snapshot_stats())
            else:
                self._json(404, {"error": "unknown endpoint"})

        MAX_BODY = 512 * 1024 * 1024  # 512 MB: beyond any supported image

        def _do_reload(self, parsed):
            """``POST /reload?model_path=...`` — hot checkpoint rollover.
            No body; the path names a checkpoint on the SERVER's disk (the
            service is a localhost/cluster-internal daemon; weights travel
            by filesystem, not by upload)."""
            q = urllib.parse.parse_qs(parsed.query)
            model_path = q.get("model_path", [None])[0]
            if not model_path:
                return self._json(400,
                                  {"error": "model_path query param required"})
            # drain any (unexpected) body so the connection stays usable
            try:
                length = int(self.headers.get("Content-Length") or 0)
            except ValueError:
                length = 0
            if 0 < length <= self.MAX_BODY:
                self.rfile.read(length)
            try:
                return self._json(200, svc.reload(model_path))
            except Exception as e:
                svc.bump("errors")
                code = (503 if isinstance(e, (ServiceBusy,
                                              threading.BrokenBarrierError))
                        else 400 if isinstance(e, (ValueError, OSError))
                        else 500)
                return self._json(code, {"error": f"{type(e).__name__}: {e}"})

        def do_POST(self):
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path == "/reload":
                return self._do_reload(parsed)
            if parsed.path != "/denoise":
                return self._json(404, {"error": "unknown endpoint"})
            q = urllib.parse.parse_qs(parsed.query)
            get = lambda k, d: q.get(k, [d])[0]
            try:
                length = int(self.headers.get("Content-Length") or 0)
            except ValueError:
                return self._json(400, {"error": "bad Content-Length header"})
            if length < 0:  # header present but malformed -> client error
                return self._json(400, {"error": "bad Content-Length header"})
            if length == 0:  # absent/zero (chunked uploads unsupported)
                return self._json(411, {"error": "Content-Length required"})
            if length > self.MAX_BODY:
                return self._json(413, {"error": f"body size {length} "
                                                 f"exceeds {self.MAX_BODY}"})
            data = self.rfile.read(length)
            svc.bump("requests")
            try:
                out = svc.denoise_bytes(
                    data, output=get("output", "jpg"),
                    quality=int(get("quality", "90")),
                    rl=get("rl", "1") not in ("0", "false"),
                    sigma=float(get("sigma", "1")),
                    iterations=int(get("iterations", "10")),
                    psf=get("psf", "gaussian"))
            except Exception as e:
                svc.bump("errors")
                # client errors (bad image / bad params) -> 400; queue at
                # capacity -> 503 (retryable); anything else -> 500
                code = (503 if isinstance(e, ServiceBusy)
                        else 400 if isinstance(e, ValueError) else 500)
                return self._json(code, {"error": f"{type(e).__name__}: {e}"})
            ctype = {"jpg": "image/jpeg", "jpeg": "image/jpeg",
                     "png": "image/png", "tiff": "image/tiff"}[
                         get("output", "jpg")]
            self._send(200, out, ctype)

    return Handler


def serve(svc: DenoiseService, host: str = "127.0.0.1", port: int = 8601):
    httpd = ThreadingHTTPServer((host, port), make_handler(svc))
    return httpd


def main(argv=None):
    from ..utils import jaxcache
    jaxcache.enable()

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--network", default="UtNet")
    ap.add_argument("--cs", type=int)
    ap.add_argument("--ucs", type=int)
    ap.add_argument("--activation", default="PReLU")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["bfloat16", "float32", "int8", "int8_static"],
                    help="int8/int8_static (UtNet only): quantized MXU "
                         "forward; int8_static = calibrated static scales, "
                         "the fast variant (PERF.md 'int8 engine mode')")
    ap.add_argument("--devices", type=int)
    ap.add_argument("--parallel", default="auto",
                    choices=["auto", "shard", "images", "single"],
                    help="multi-device strategy: shard = row-band split "
                         "each request over all devices (lowest latency); "
                         "images = request-per-device pool (highest "
                         "aggregate throughput under concurrent load)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8601)
    ap.add_argument("--max_pending", type=int, default=8,
                    help="queued-request bound; beyond it requests get 503")
    ap.add_argument("--prewarm", action="append", default=[],
                    metavar="HxW[:dtype]",
                    help="compile the coalesced-group program buckets for "
                         "this request shape before accepting traffic "
                         "(repeatable; e.g. --prewarm 480x480:uint16). "
                         "First-traffic latency otherwise pays each "
                         "group-size compile as it first forms")
    args = ap.parse_args(argv)

    svc = DenoiseService(args.network, args.model_path, cs=args.cs,
                         ucs=args.ucs, activation=args.activation,
                         batch_size=args.batch_size,
                         compute_dtype=args.compute_dtype,
                         devices=args.devices, max_pending=args.max_pending,
                         parallel=args.parallel)
    for spec in args.prewarm:
        shape, _, dt = spec.partition(":")
        h, _, w = shape.lower().partition("x")
        info = svc.prewarm(int(h), int(w), dtype=dt or "uint16")
        print(f"denoise-serve: prewarmed {spec}: {info}", flush=True)
    httpd = serve(svc, args.host, args.port)
    # report the BOUND port (--port 0 = ephemeral, used by tests/orchestrators)
    print(f"denoise-serve: listening on "
          f"http://{args.host}:{httpd.server_address[1]} "
          f"({svc.ndev} device(s), mode={svc.mode}, "
          f"cs={svc.cs}/ucs={svc.ucs})", flush=True)

    # SIGTERM = the orchestrator stop signal (k8s/systemd): stop accepting,
    # drain in-flight requests, exit 0. shutdown() must run off the serving
    # thread (it blocks until serve_forever returns), and server_close()
    # joins the in-flight handler threads (ThreadingHTTPServer
    # block_on_close) before the service retires its dispatcher.
    import signal

    def _term(signum, frame):
        print("denoise-serve: SIGTERM — draining in-flight requests",
              flush=True)
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    try:
        signal.signal(signal.SIGTERM, _term)
    except ValueError:
        pass  # non-main thread (embedded use): caller owns signal handling
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        svc.close()
    print("denoise-serve: shut down cleanly", flush=True)


if __name__ == "__main__":
    main()
