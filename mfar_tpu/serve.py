"""Online serving daemon: HTTP frontend + micro-batching dispatcher.

The reference has no serving story at all (retrieval exists only inside its
Lightning test loop, SURVEY.md section 1); the batch `retrieve` CLI covers
offline runs.  This module adds the ONLINE path a production deployment
needs, built around how a TPU actually serves:

- **Micro-batching**: concurrent requests are coalesced into one
  fixed-shape engine batch (first request opens a window of
  ``max_wait_ms``; the batch dispatches when ``max_batch`` queries are
  waiting or the window closes).  One request = one device program would
  waste the MXU (the [B, FE] x [FE, N] scan amortizes over the query
  batch) and pay a dispatch round-trip per query.
- **Fixed compiled shapes**: every dispatch pads to ``max_batch``, so the
  whole serving life runs ONE compiled program per mode (~20-40 s to
  compile on TPU -- :meth:`RetrievalServer.warmup` pays it before the
  port opens, not on the first user request).
- **Single dispatcher thread**: only one thread touches the engine/device;
  HTTP threads hand queries over a queue and block on a per-request event.

- **Multi-host**: when the corpus needs more than one host's chips, the
  SAME daemon serves the global mesh: process 0 owns the HTTP port and
  wraps its engine in :class:`MultihostEngineProxy`, which broadcasts each
  fixed-shape micro-batch (one compiled ``broadcast_one_to_all`` program)
  to every other process; followers sit in :func:`follower_loop` running
  the identical engine program in lockstep, so the distributed top-k
  collectives line up.  Results come back replicated; only process 0
  answers traffic.  (The reference has no serving daemon at all, and its
  DDP eval loop's closest analogue is per-rank qres files merged on rank
  0, reference mfar/modeling/contrastive.py:516-551.)

Endpoints:
  POST /retrieve  {"queries": [...], "top_k"?: int}  ->
                  {"results": [[[doc_key, score], ...], ...]}
  GET  /healthz   liveness + device info
  GET  /stats     request/query counters, batch fill, latency percentiles
"""

from __future__ import annotations

import json
import queue
import threading
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


_PAYLOAD_BYTES = 1 << 20  # fixed broadcast buffer: ONE compiled program

_IDLE = object()  # _collect(block=False): no request queued right now


def _broadcast_msg(msg: Optional[Dict[str, Any]], payload_bytes: int = _PAYLOAD_BYTES):
    """One lockstep control message across all processes.

    Process 0 passes the message; followers pass None (their buffer content
    is ignored -- ``broadcast_one_to_all`` takes the source's).  The buffer
    is FIXED-SIZE (length-prefixed JSON in a [payload_bytes] uint8 array) so
    the underlying psum compiles once for the daemon's lifetime.
    """
    from jax.experimental import multihost_utils

    buf = np.zeros(payload_bytes, np.uint8)
    if msg is not None:
        raw = json.dumps(msg).encode()
        if len(raw) + 8 > payload_bytes:
            raise ValueError(
                f"control message ({len(raw)} B) exceeds the broadcast "
                f"payload ({payload_bytes} B); raise payload_bytes"
            )
        buf[:8] = np.frombuffer(len(raw).to_bytes(8, "big"), np.uint8)
        buf[8 : 8 + len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    n = int.from_bytes(out[:8].tobytes(), "big")
    return json.loads(out[8 : 8 + n].tobytes())


class MultihostEngineProxy:
    """Engine wrapper for process 0 of a multi-process serving deployment.

    Presents the engine surface the :class:`MicroBatcher` uses (``retrieve``
    / ``retrieve_many`` / ``n_docs``) but broadcasts every batch to the
    follower processes FIRST, so each process issues the engine's
    distributed collectives against the global mesh in the same order.
    A heartbeat thread broadcasts a no-op when the daemon sits idle longer
    than ``heartbeat_s`` -- followers are always blocked inside the
    broadcast collective, and cross-host collectives should not dangle for
    unbounded wall-clock on quiet services.

    Every broadcast pads the query list to ``max_batch`` (the MicroBatcher
    already dispatches that shape), keeping the follower-side engine on the
    single compiled serving program.
    """

    def __init__(
        self,
        engine,
        max_batch: int = 64,
        heartbeat_s: float = 15.0,
        payload_bytes: int = _PAYLOAD_BYTES,
    ):
        self.engine = engine
        self.max_batch = int(max_batch)
        self.payload_bytes = int(payload_bytes)
        self.heartbeat_s = float(heartbeat_s)
        self._lock = threading.Lock()  # serializes broadcasts (batch vs heartbeat)
        self._last = time.perf_counter()
        self._stopped = False
        self._hb_stop = threading.Event()
        self._hb = threading.Thread(target=self._heartbeat, daemon=True)
        self._hb.start()

    @property
    def n_docs(self) -> int:
        return self.engine.n_docs

    def retrieve(self, queries, top_k: int = 100, mode: Optional[str] = None):
        return self.finish(self.dispatch(queries, top_k=top_k, mode=mode))

    def dispatch(self, queries, top_k: int = 100, mode: Optional[str] = None):
        """Broadcast + dispatch (no fetch): the pipelined daemon's half.

        The broadcast is a collective, so it returns only when every
        follower has come back for its next control message -- followers
        therefore ALSO split dispatch/finish (window in
        :func:`follower_loop`), otherwise their in-line fetch of batch i
        would stall process 0's dispatch of batch i+1 and collapse the
        pipeline to depth 1."""
        queries = [str(q) for q in queries]
        real = len(queries)
        if real == 0:
            return None  # nothing to broadcast (padding would index queries[-1])
        if real < self.max_batch:
            queries = queries + [queries[-1]] * (self.max_batch - real)
        with self._lock:
            if self._stopped:
                raise RuntimeError("serving bridge already stopped")
            self._bcast({"t": "batch", "q": queries, "k": int(top_k), "m": mode})
            if hasattr(self.engine, "dispatch"):
                return (self.engine.dispatch(queries, top_k=top_k, mode=mode),
                        real)
            return (self.engine.retrieve(queries, top_k=top_k, mode=mode),
                    real)

    def finish(self, handle):
        if handle is None:
            return []
        inner, real = handle
        if hasattr(self.engine, "finish"):
            return self.engine.finish(inner)[:real]
        return inner[:real]  # engine without the split: already finished

    def retrieve_many(self, queries, top_k: int = 100, mode: Optional[str] = None,
                      batch_size: Optional[int] = None):
        # One broadcast per max_batch chunk; the MicroBatcher only lands
        # here for single requests larger than max_batch.
        out = []
        for i in range(0, len(queries), self.max_batch):
            out.extend(self.retrieve(queries[i : i + self.max_batch],
                                     top_k=top_k, mode=mode))
        return out

    def stop(self) -> None:
        """Release the followers (they return from follower_loop)."""
        self._hb_stop.set()
        with self._lock:
            if not self._stopped:
                self._stopped = True
                self._bcast({"t": "stop"})

    def _heartbeat(self) -> None:
        while not self._hb_stop.wait(1.0):
            with self._lock:
                if self._stopped:
                    return
                if time.perf_counter() - self._last >= self.heartbeat_s:
                    self._bcast({"t": "noop"})

    def _bcast(self, msg: Dict[str, Any]) -> None:
        _broadcast_msg(msg, self.payload_bytes)
        self._last = time.perf_counter()


def follower_loop(engine, payload_bytes: int = _PAYLOAD_BYTES,
                  window: int = 2) -> None:
    """Non-primary processes' half of the multi-host serving daemon: block
    on the next control broadcast, DISPATCH the identical engine batch
    (results are discarded -- they are replicated, and process 0 answers
    the HTTP request), repeat until process 0 broadcasts stop.

    Dispatch/finish split with a ``window``-deep pending queue: the
    control broadcast is a collective, so an in-line fetch here would
    hold process 0's next dispatch hostage to this process's fetch
    round-trip and serialize the whole deployment to one batch in
    flight.  Finishing (with a fetch) still happens -- ``window`` batches
    late -- to bound in-flight buffers and surface device errors."""
    from collections import deque

    can_split = hasattr(engine, "dispatch") and hasattr(engine, "finish")
    pending: "deque" = deque()

    def _finish_oldest() -> None:
        try:
            engine.finish(pending.popleft())
        except Exception as e:  # noqa: BLE001 -- mirror process 0's behavior:
            # identical inputs raise identically there, where the batcher
            # reports the error to the waiting requests and keeps serving.
            print(f"[serve-follower] batch failed: {type(e).__name__}: {e}",
                  flush=True)

    while True:
        msg = _broadcast_msg(None, payload_bytes)
        if msg["t"] == "stop":
            while pending:
                _finish_oldest()
            return
        if msg["t"] == "noop":
            continue
        try:
            if can_split:
                pending.append(
                    engine.dispatch(msg["q"], top_k=msg["k"], mode=msg["m"])
                )
            else:
                engine.retrieve(msg["q"], top_k=msg["k"], mode=msg["m"])
        except Exception as e:  # noqa: BLE001 -- see _finish_oldest
            print(f"[serve-follower] batch failed: {type(e).__name__}: {e}",
                  flush=True)
        while len(pending) > window:
            _finish_oldest()


class _Pending:
    __slots__ = ("queries", "top_k", "done", "results", "error", "t0")

    def __init__(self, queries: List[str], top_k: Optional[int]):
        self.queries = queries
        self.top_k = top_k
        self.done = threading.Event()
        self.results: Optional[List[List[Tuple[str, float]]]] = None
        self.error: Optional[str] = None
        self.t0 = time.perf_counter()


class MicroBatcher:
    """Coalesce concurrent retrieve requests into fixed-shape engine batches.

    ``top_k`` is the SERVED depth (one compiled program); per-request
    ``top_k`` values <= it are sliced from the shared result.

    The dispatcher PIPELINES: when the engine exposes the dispatch/finish
    split (``RetrievalEngine.dispatch``/``finish``), up to
    ``pipeline_depth`` micro-batches are dispatched (host tokenize + BM25
    postings + async device program) before the oldest result is fetched,
    so batch i+1's host prep and H2D overlap batch i's in-flight device
    scan -- the same restructuring that took batch mode 3,212 -> 4,823 QPS
    (BENCH_NOTES round 4).  An idle queue drains the pipeline immediately
    (no request waits on a later batch to arrive), so unloaded latency is
    unchanged; under load the device never sits idle waiting for host prep.
    Engines without the split fall back to the sequential path.
    """

    def __init__(
        self,
        engine,
        max_batch: int = 64,
        max_wait_ms: float = 5.0,
        top_k: int = 100,
        mode: Optional[str] = None,
        pipeline_depth: int = 2,
    ):
        self.engine = engine
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self.top_k = int(top_k)
        self.mode = mode
        self.pipeline_depth = max(int(pipeline_depth), 1)
        self._can_split = hasattr(engine, "dispatch") and hasattr(engine, "finish")
        self._q: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._carry: Optional[_Pending] = None  # overflow from _collect
        self._lock = threading.Lock()
        self._stats = dict(requests=0, queries=0, batches=0, padded=0, errors=0)
        self._phase_s = dict(collect=0.0, dispatch=0.0, finish=0.0)
        self._latencies: List[float] = []  # ring buffer, seconds
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._started = False

    # -- client side -----------------------------------------------------

    def submit(
        self, queries: Sequence[str], top_k: Optional[int] = None,
        timeout: float = 120.0,
    ) -> List[List[Tuple[str, float]]]:
        """Block until the micro-batch containing these queries returns."""
        if len(queries) == 0:
            raise ValueError("queries must be a non-empty list")
        if top_k is not None:
            if not isinstance(top_k, int) or isinstance(top_k, bool) or top_k < 1:
                raise ValueError(f"top_k must be a positive int, got {top_k!r}")
            if top_k > self.top_k:
                raise ValueError(
                    f"per-request top_k {top_k} exceeds the served depth "
                    f"{self.top_k} (one compiled program serves all requests)"
                )
        item = _Pending([str(q) for q in queries], top_k)
        self._q.put(item)
        if not item.done.wait(timeout):
            raise TimeoutError("retrieve timed out")
        if item.error is not None:
            raise RuntimeError(item.error)
        with self._lock:
            self._stats["requests"] += 1
            self._latencies.append(time.perf_counter() - item.t0)
            if len(self._latencies) > 1000:
                del self._latencies[: -1000]
        return item.results

    # -- dispatcher ------------------------------------------------------

    def start(self) -> "MicroBatcher":
        if not self._started:
            self._started = True
            self._thread.start()
        return self

    def stop(self) -> None:
        if self._started:
            self._q.put(None)
            self._thread.join(timeout=30)
            self._started = False

    def warmup(self, sample_queries: Optional[Sequence[str]] = None) -> float:
        """Compile + run the serving program at the dispatch shape before
        traffic arrives; returns seconds spent.

        Pass ``sample_queries`` (e.g. a few real queries from the dataset)
        for hybrid corpora: postings widths bucket geometrically
        (``native.bucket_width``), and real traffic landing in a bigger
        bucket than the synthetic warmup's would otherwise pay that
        bucket's compile on a user request."""
        t0 = time.perf_counter()
        self.engine.retrieve(
            ["warmup"] * self.max_batch, top_k=self.top_k, mode=self.mode
        )
        if sample_queries is not None and len(sample_queries) > 0:
            sample = list(sample_queries)[: self.max_batch]
            sample += [sample[-1]] * (self.max_batch - len(sample))
            self.engine.retrieve(sample, top_k=self.top_k, mode=self.mode)
        return time.perf_counter() - t0

    def _collect(self, block: bool = True):
        """One micro-batch: wait for the first request (``block=False``
        returns ``_IDLE`` immediately when none is queued -- the pipelined
        loop then finishes an in-flight batch instead of stalling it), then
        drain until max_batch queries are assembled or the wait window
        closes.  Returns None on shutdown.

        A request that would push the batch PAST max_batch is carried to
        the next batch instead of coalesced (coalescing would split the
        combined list into a second, nearly-empty padded device dispatch
        that delays everyone).  Only a single request larger than
        max_batch ever overflows, as the first item of its own batch."""
        first = self._carry
        if first is None:
            try:
                first = self._q.get(block=block)
            except queue.Empty:
                return _IDLE
        self._carry = None
        if first is None:
            return None
        batch, n = [first], len(first.queries)
        deadline = time.perf_counter() + self.max_wait_s
        while n < self.max_batch:
            left = deadline - time.perf_counter()
            if left <= 0:
                break
            try:
                nxt = self._q.get(timeout=left)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-deliver shutdown after this batch
                break
            if n + len(nxt.queries) > self.max_batch:
                self._carry = nxt  # opens the next batch immediately
                break
            batch.append(nxt)
            n += len(nxt.queries)
        return batch

    def _deliver(self, batch: List[_Pending], results) -> None:
        pos = 0
        for item in batch:
            sub = results[pos : pos + len(item.queries)]
            if item.top_k is not None:
                sub = [hits[: item.top_k] for hits in sub]
            item.results = sub
            pos += len(item.queries)
            item.done.set()

    def _fail(self, batch: List[_Pending], e: BaseException) -> None:
        with self._lock:
            self._stats["errors"] += 1
        for item in batch:
            item.error = f"{type(e).__name__}: {e}"
            item.done.set()

    def _dispatch_batch(self, batch: List[_Pending]):
        """Host prep + async device dispatch for one collected micro-batch.
        Returns an in-flight (batch, real, handle) entry for _finish_batch,
        or None if the batch was fully handled here (errors; the sequential
        fallbacks for oversized requests and engines without the split)."""
        texts: List[str] = []
        for item in batch:
            texts.extend(item.queries)
        real = len(texts)
        if real == 0:
            self._deliver(batch, [])
            return None
        # Oversized single requests fall through to retrieve_many
        # (which itself pads its tail chunk and pipelines internally);
        # normal batches pad to the ONE compiled shape.
        padded = texts
        if real < self.max_batch:
            padded = texts + [texts[-1]] * (self.max_batch - real)
        t0 = time.perf_counter()
        try:
            if len(padded) > self.max_batch:
                results = self.engine.retrieve_many(
                    padded, top_k=self.top_k, mode=self.mode,
                    batch_size=self.max_batch,
                )[:real]
            elif self._can_split:
                handle = self.engine.dispatch(
                    padded, top_k=self.top_k, mode=self.mode
                )
                with self._lock:
                    self._stats["batches"] += 1
                    self._stats["queries"] += real
                    self._stats["padded"] += len(padded) - real
                    self._phase_s["dispatch"] += time.perf_counter() - t0
                return (batch, real, handle)
            else:
                results = self.engine.retrieve(
                    padded, top_k=self.top_k, mode=self.mode
                )[:real]
        except Exception as e:  # noqa: BLE001 -- report to every waiter
            self._fail(batch, e)
            return None
        with self._lock:
            self._stats["batches"] += 1
            self._stats["queries"] += real
            self._stats["padded"] += max(len(padded) - real, 0)
            self._phase_s["dispatch"] += time.perf_counter() - t0
        self._deliver(batch, results)
        return None

    def _finish_batch(self, entry) -> None:
        batch, real, handle = entry
        t0 = time.perf_counter()
        try:
            results = self.engine.finish(handle)[:real]
        except Exception as e:  # noqa: BLE001 -- report to every waiter
            self._fail(batch, e)
            return
        with self._lock:
            self._phase_s["finish"] += time.perf_counter() - t0
        self._deliver(batch, results)

    def _run(self) -> None:
        # In-flight dispatched micro-batches, oldest first.  Invariant:
        # len(pending) <= pipeline_depth; pending is non-empty only while
        # the engine supports the dispatch/finish split.
        pending: List[Any] = []
        while True:
            t0 = time.perf_counter()
            # Block for work only when nothing is in flight; otherwise poll,
            # and spend idle time finishing the oldest in-flight batch (its
            # waiters get their results at the same moment they would have
            # under the sequential loop).
            batch = self._collect(block=not pending)
            with self._lock:
                self._phase_s["collect"] += time.perf_counter() - t0
            if batch is None:  # shutdown: drain in-flight work first
                for entry in pending:
                    self._finish_batch(entry)
                return
            if batch is _IDLE:
                self._finish_batch(pending.pop(0))
                continue
            entry = self._dispatch_batch(batch)
            if entry is not None:
                pending.append(entry)
                if len(pending) >= self.pipeline_depth:
                    self._finish_batch(pending.pop(0))

    # -- introspection ---------------------------------------------------

    def stats(self) -> Dict[str, Any]:
        with self._lock:
            out: Dict[str, Any] = dict(self._stats)
            lat = np.asarray(self._latencies, np.float64)
        out["served_top_k"] = self.top_k
        out["max_batch"] = self.max_batch
        out["pipeline_depth"] = self.pipeline_depth if self._can_split else 1
        with self._lock:
            # Dispatcher-thread seconds per phase: collect = waiting for /
            # coalescing requests, dispatch = host prep + async device
            # dispatch, finish = blocked on device results + id mapping.
            # Under load, finish >> dispatch means the device (or its fetch
            # path) is the bottleneck; collect >> rest means traffic is.
            out["phase_s"] = {k: round(v, 2) for k, v in self._phase_s.items()}
        if out["queries"] + out["padded"] > 0:
            out["mean_batch_fill"] = round(
                out["queries"] / (out["queries"] + out["padded"]), 4
            )
        if lat.size:
            out["latency_ms_p50"] = round(float(np.percentile(lat, 50)) * 1000, 2)
            out["latency_ms_p95"] = round(float(np.percentile(lat, 95)) * 1000, 2)
        return out


class RetrievalServer:
    """ThreadingHTTPServer frontend over a :class:`MicroBatcher`."""

    def __init__(
        self,
        engine,
        host: str = "127.0.0.1",
        port: int = 8080,
        max_batch: int = 64,
        max_wait_ms: float = 5.0,
        top_k: int = 100,
        mode: Optional[str] = None,
        pipeline_depth: int = 2,
    ):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self.batcher = MicroBatcher(
            engine, max_batch=max_batch, max_wait_ms=max_wait_ms,
            top_k=top_k, mode=mode, pipeline_depth=pipeline_depth,
        )
        batcher = self.batcher
        started = time.time()

        class Handler(BaseHTTPRequestHandler):
            # HTTP/1.1 keep-alive: every response carries Content-Length, so
            # persistent connections are safe -- a closed-loop client then
            # costs one TCP connect + one server thread for its LIFETIME
            # instead of per request (per-request threads + connects measurably
            # eat the 1-vCPU serving host's budget at >1K QPS).
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *a):  # quiet per-request stderr lines
                pass

            def _send(self, code: int, payload: Dict[str, Any]) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    import jax

                    self._send(200, {
                        "status": "ok",
                        "uptime_s": round(time.time() - started, 1),
                        "backend": jax.default_backend(),
                        "n_devices": jax.device_count(),
                        "n_docs": batcher.engine.n_docs,
                    })
                elif self.path == "/stats":
                    self._send(200, batcher.stats())
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})

            def do_POST(self):
                if self.path != "/retrieve":
                    self._send(404, {"error": f"unknown path {self.path}"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    queries = req["queries"]
                    if not isinstance(queries, list) or not queries:
                        raise ValueError("queries must be a non-empty list")
                    results = batcher.submit(queries, top_k=req.get("top_k"))
                except (ValueError, KeyError) as e:
                    self._send(400, {"error": str(e)})
                    return
                except Exception as e:  # noqa: BLE001
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})
                    return
                self._send(200, {
                    "results": [
                        [[k, float(s)] for k, s in hits] for hits in results
                    ],
                })

        class _Server(ThreadingHTTPServer):
            daemon_threads = True

            def handle_error(self, request, client_address):
                import sys

                etype = sys.exc_info()[0]
                if etype is not None and issubclass(
                    etype, (BrokenPipeError, ConnectionResetError)
                ):
                    return  # client went away (timeout/cancel): not an error
                super().handle_error(request, client_address)

        # Bind DEFERRED to serve time: a load balancer TCP-probing between
        # construction and warmup would see the port open and route traffic
        # that then stalls in the listen backlog through the 20-40 s
        # compile -- the port must not exist until the program is warm.
        self.httpd = _Server((host, port), Handler, bind_and_activate=False)
        self.host: Optional[str] = None
        self.port: Optional[int] = None

    def bind(self) -> None:
        """Bind + activate the listening socket (idempotent); called by
        serve_forever/start_background after warmup has had its chance."""
        if self.port is None:
            self.httpd.server_bind()
            self.httpd.server_activate()
            self.host, self.port = self.httpd.server_address[:2]

    def warmup(self, sample_queries: Optional[Sequence[str]] = None) -> float:
        return self.batcher.warmup(sample_queries)

    def serve_forever(self) -> None:
        self.batcher.start()
        self.bind()
        try:
            self.httpd.serve_forever()
        finally:
            self.batcher.stop()

    def start_background(self) -> threading.Thread:
        """Run the server on a daemon thread (tests / embedding); binds the
        port, so ``host``/``port`` are resolved after this returns."""
        self.batcher.start()
        self.bind()
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        self.batcher.stop()
