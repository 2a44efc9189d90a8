"""Batched inference engine + serving frontends for production deployment.

The reference's only inference surface is matplotlib plotting inside
evaluate.py.  This module provides the deployment-grade path:

- ``InferenceEngine``: an AOT-compiled (jit -> lower -> compile) generator
  for one fixed batch shape, fed by the device-side preprocessing
  pipeline — compilation happens once at startup, requests pay none.
- ``BatchingFrontend``: a dynamic micro-batcher.  Any number of client
  threads submit single images; one worker thread owns the chip, groups
  requests into the engine's fixed AOT batch shape (padding stragglers),
  and answers through futures.  TPU-friendly by construction: one process
  per chip, one static shape, no per-request dispatch.
- ``ModelRepository`` + ``serve_http``: multi-model serving over a
  stdlib ThreadingHTTPServer speaking raw ``.npy`` bodies.

    engine = InferenceEngine.from_checkpoint("model.ckpt", batch_size=8,
                                             image_size=512)
    outputs = engine.predict(stacks_uint_or_float_01)   # (B,H,W,3) in [0,1]

    fe = BatchingFrontend(engine)
    img = fe.predict(stack)                              # thread-safe
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import os

from floodgan_tpu.ckpt import load_checkpoint
from floodgan_tpu.core.config import TOPOGRAPHY_CHANNELS
from floodgan_tpu.core.rng import RngStreams
from floodgan_tpu.data.transforms import apply_transformations_batch, denormalize
from flax import serialization


class InferenceEngine:
    def __init__(
        self,
        model: str,
        gen_params,
        topography: Optional[str],
        batch_size: int = 1,
        image_size: int = 512,
        seed: int = 47,
        compute_dtype: str = "bfloat16",
        aot: bool = True,
        wire_dtype: str = "float32",
    ):
        from floodgan_tpu.train.paired import PairedTrainer
        from floodgan_tpu.train.cycle import CycleTrainer
        from floodgan_tpu.core.config import model_is_cycle

        self.model = model
        self.topography = topography
        self.batch_size = batch_size
        self.image_size = image_size
        self.channels = TOPOGRAPHY_CHANNELS[topography]
        self.gen_params = gen_params
        self._key = RngStreams(seed).inference()
        # Host->device transfer dtype for inputs.  The serving wall on
        # thin links is wire bytes (a 512² batch-8 stack is 75 MB f32 —
        # BENCH_NOTES round 5: 64x the device compute on the dev tunnel),
        # so ``wire_dtype="bfloat16"`` halves them, quantizing the
        # normalized [-1,1] inputs to 8 mantissa bits — the same opt-in
        # tradeoff as the training loader's FLOODGAN_WIRE_DTYPE.  Inputs
        # are upcast to f32 on device before the model's own
        # compute-dtype policy applies, so only the wire is quantized.
        self.wire_dtype = jnp.dtype(wire_dtype)

        # NB: the engine owns the top-level jit below, so it must call the
        # trainers' UNJITTED `_generate` bodies — their jitted `generate`
        # wrappers carry backend compiler options, which JAX rejects on a
        # nested jit (and nesting would add dispatch overhead for nothing).
        if model_is_cycle(model):
            trainer = CycleTrainer(model, self.channels, compute_dtype=compute_dtype)

            def forward(params, x):
                out, _ = trainer._generate(params, x.astype(jnp.float32), "ab")
                return denormalize(out)
        else:
            trainer = PairedTrainer(model, self.channels, compute_dtype=compute_dtype)
            key = self._key

            def forward(params, x):
                out, _ = trainer._generate(params, x.astype(jnp.float32), key)
                return denormalize(out)

        # The train steps' scoped-VMEM compiler default was measured on the
        # serving forward too (tools/serve_bench.py, v5e 512²: batch-1
        # latency 10.42 → 10.35 ms, batch-8 throughput 141.2 → 138.4
        # imgs/s — a wash; the option's win is the train step's deeper
        # backward fusions, which inference doesn't have).  So serving jits
        # option-free unless FLOODGAN_XLA_OPTIONS is set explicitly, which
        # applies here as everywhere (BENCH_NOTES round 3).
        from floodgan_tpu.core.flags import step_compiler_options

        opts = (
            step_compiler_options()
            if os.environ.get("FLOODGAN_XLA_OPTIONS")
            else None
        )
        self._fn = jax.jit(forward, compiler_options=opts or None)
        if aot:
            # Ahead-of-time compile for the fixed serving shape so the
            # first request pays zero compilation latency.
            shape = jax.ShapeDtypeStruct(
                (batch_size, image_size, image_size, self.channels),
                self.wire_dtype,
            )
            params_shapes = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
                gen_params,
            )
            self._compiled = self._fn.lower(params_shapes, shape).compile()
        else:
            self._compiled = None

    @classmethod
    def from_checkpoint(
        cls, ckpt_path: str, batch_size: int = 1, image_size: int = 512, **kwargs
    ) -> "InferenceEngine":
        from floodgan_tpu.train.paired import PairedTrainer
        from floodgan_tpu.train.cycle import CycleTrainer
        from floodgan_tpu.core.config import model_is_cycle

        meta, raw = load_checkpoint(ckpt_path)
        model = meta["model"]
        topography = meta["topography"]
        channels = TOPOGRAPHY_CHANNELS[topography]
        trainer_cls = CycleTrainer if model_is_cycle(model) else PairedTrainer
        trainer = trainer_cls(model, channels)
        template = trainer.init(
            jax.random.key(0),
            jnp.zeros((1, 64, 64, channels)),
            jnp.zeros((1, 64, 64, 3)),
        )
        state = serialization.from_state_dict(template, raw)
        return cls(
            model, state.gen_params, topography,
            batch_size=batch_size, image_size=image_size, **kwargs,
        )

    def preprocess(self, stacks: np.ndarray, resize: Optional[int] = None) -> jax.Array:
        """Raw [0,1] 9-channel stacks -> normalized, sliced, resized model
        input (same device transforms as training)."""
        b = stacks.shape[0]
        x, _ = apply_transformations_batch(
            stacks,
            np.zeros((b, stacks.shape[1], stacks.shape[2], 3), np.float32),
            np.zeros(b, bool),
            np.zeros(b, np.int32),
            topography=self.topography,
            resize=resize or self.image_size,
            crop=None,
        )
        return x

    def predict(self, inputs) -> jax.Array:
        """Normalized (B, S, S, C) inputs -> (B, S, S, 3) images in [0,1].

        The host->device cast to ``wire_dtype`` happens here (numpy-side,
        before the transfer), so thin links ship the quantized bytes."""
        inputs = jnp.asarray(inputs, self.wire_dtype)
        if self._compiled is not None and inputs.shape == (
            self.batch_size, self.image_size, self.image_size, self.channels
        ):
            return self._compiled(self.gen_params, inputs)
        return self._fn(self.gen_params, inputs)

    @property
    def input_shape(self):
        return (self.image_size, self.image_size, self.channels)

    def benchmark(self, iters: int = 20) -> dict:
        x = jnp.zeros(
            (self.batch_size, self.image_size, self.image_size, self.channels),
            jnp.float32,
        )
        out = self.predict(x)
        float(jnp.sum(out))  # sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = self.predict(x)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / iters
        return {
            "latency_ms": dt * 1e3,
            "images_per_sec": self.batch_size / dt,
        }


# ===================================================== dynamic micro-batching

class FrontendOverloaded(RuntimeError):
    """Raised by BatchingFrontend.submit when the pending backlog is at
    ``max_pending`` — the caller should shed load or retry later."""


def _fut_deliver(fut: Future, result=None, exc=None) -> None:
    """Deliver a result/exception to a waiter's Future, tolerating futures
    a client CANCELLED after submit (legal Future API: cancel() on a
    never-running future succeeds) — set_result on a cancelled future
    raises InvalidStateError, and an uncaught exception here would kill
    the batcher's worker thread and hang every later request forever."""
    try:
        if exc is not None:
            fut.set_exception(exc)
        else:
            fut.set_result(result)
    except Exception:
        pass  # cancelled (or already resolved) waiter: nothing to deliver


class BatchingFrontend:
    """Groups concurrent single-image requests into fixed-shape batches.

    One worker thread owns the engine (and therefore the chip — the
    one-process-one-client TPU rule holds even under many request
    threads).  A request waits at most ``max_delay_ms`` for the batch to
    fill; partial batches are zero-padded to the engine's AOT shape so
    every device call compiles exactly once.  Results come back through
    futures in submission order.
    """

    def __init__(
        self,
        engine: "InferenceEngine",
        max_delay_ms: float = 5.0,
        max_pending: Optional[int] = None,
    ):
        self.engine = engine
        self.max_delay = max_delay_ms / 1e3
        # Admission control: with no bound, sustained oversubscription
        # queues without limit (measured: 32 clients on a batch-8 engine
        # ran p50 to 3 service periods and p99 to 17.5 s — BENCH_NOTES
        # round 5).  ``max_pending`` caps the QUEUED backlog (requests
        # not yet dequeued into a batch); submits beyond it fail fast
        # with ``FrontendOverloaded`` so callers can shed or retry
        # instead of silently stacking latency.  Requests already
        # dispatched to the device stop counting, so at-capacity load
        # pipelines (the next batch forms while one executes) and total
        # outstanding is bounded by max_pending + batch_size.
        self.max_pending = max_pending
        self._pending = 0
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = False
        self._lock = threading.Lock()
        self.requests = 0
        self.batches = 0
        self.batched_slots = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -------------------------------------------------------------- client
    def submit(self, stack: np.ndarray) -> Future:
        """Enqueue one (S, S, C) normalized input; returns a Future whose
        result is the (S, S, 3) prediction in [0, 1]."""
        stack = np.asarray(stack, np.float32)
        if stack.shape != self.engine.input_shape:
            raise ValueError(
                f"expected {self.engine.input_shape}, got {stack.shape}"
            )
        fut: Future = Future()
        # The closed-check and the enqueue are one atomic section, and
        # close() enqueues its sentinel inside the same lock — so the
        # sentinel is strictly the LAST item the worker ever sees and no
        # accepted request can be left unflushed behind it.
        with self._lock:
            if self._closed:
                raise RuntimeError("frontend is closed")
            if self.max_pending is not None and self._pending >= self.max_pending:
                raise FrontendOverloaded(
                    f"{self._pending} requests pending (max_pending="
                    f"{self.max_pending})"
                )
            self._pending += 1
            self._queue.put((stack, fut))
            self.requests += 1
        return fut

    def submit_many(self, stacks) -> list:
        """Atomically admit a list of (S, S, C) inputs: either EVERY one
        is enqueued (returned as futures, in order) or none is and
        ``FrontendOverloaded`` raises.  Multi-image callers (the HTTP
        batch endpoint) need the all-or-nothing form — admitting a prefix
        and then failing would compute-and-discard the admitted images
        while their slots 503 other clients."""
        stacks = [np.asarray(s, np.float32) for s in stacks]
        for s in stacks:
            if s.shape != self.engine.input_shape:
                raise ValueError(
                    f"expected {self.engine.input_shape}, got {s.shape}"
                )
        futs = [Future() for _ in stacks]
        with self._lock:
            if self._closed:
                raise RuntimeError("frontend is closed")
            if (
                self.max_pending is not None
                and self._pending + len(stacks) > self.max_pending
            ):
                raise FrontendOverloaded(
                    f"{self._pending} requests pending + {len(stacks)} "
                    f"submitted > max_pending={self.max_pending}"
                )
            for s, fut in zip(stacks, futs):
                self._queue.put((s, fut))
            self._pending += len(stacks)
            self.requests += len(stacks)
        return futs

    def predict(self, stack: np.ndarray, timeout: Optional[float] = None) -> np.ndarray:
        """Blocking single-image predict (thread-safe)."""
        return self.submit(stack).result(timeout=timeout)

    def stats(self) -> dict:
        with self._lock:
            b = max(self.batches, 1)
            return {
                "requests": self.requests,
                "batches": self.batches,
                "batch_size": self.engine.batch_size,
                "pending": self._pending,
                "mean_occupancy": self.batched_slots / (b * self.engine.batch_size),
            }

    def close(self) -> None:
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(None)  # strictly the last item (see submit)
        self._worker.join(timeout=60)

    # -------------------------------------------------------------- worker
    def _run(self) -> None:
        bs = self.engine.batch_size
        while True:
            head = self._queue.get()
            if head is None:
                return
            group = [head]
            deadline = time.monotonic() + self.max_delay
            while len(group) < bs:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    item = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:
                    self._flush(group)
                    return
                group.append(item)
            self._flush(group)

    def _flush(self, group) -> None:
        bs = self.engine.batch_size
        # The group has left the queue: admission reopens NOW, so the
        # next batch forms while this one executes (pipelining; see
        # max_pending semantics in __init__).
        with self._lock:
            self._pending -= len(group)
        stacks = np.stack([g[0] for g in group])
        if len(group) < bs:
            pad = np.zeros((bs - len(group),) + self.engine.input_shape, np.float32)
            stacks = np.concatenate([stacks, pad])
        try:
            out = np.asarray(self.engine.predict(stacks))
        except Exception as e:  # surface device errors to every waiter
            for _, fut in group:
                _fut_deliver(fut, exc=e)
            return
        with self._lock:
            self.batches += 1
            self.batched_slots += len(group)
        for i, (_, fut) in enumerate(group):
            _fut_deliver(fut, result=out[i])


# ========================================================== multi-model serving

class ModelRepository:
    """Named set of engines, each behind its own BatchingFrontend.

    Engines share the process (and the chip); their frontends serialize
    device access through their worker threads, so a repository is safe to
    expose to concurrent request handlers.
    """

    def __init__(self):
        self._frontends: dict = {}

    def add(
        self,
        name: str,
        engine: "InferenceEngine",
        max_delay_ms: float = 5.0,
        max_pending: Optional[int] = None,
    ) -> None:
        if name in self._frontends:
            raise ValueError(f"model {name!r} already registered")
        self._frontends[name] = BatchingFrontend(
            engine, max_delay_ms=max_delay_ms, max_pending=max_pending
        )

    def add_checkpoint(self, name: str, ckpt_path: str, **engine_kwargs) -> None:
        self.add(name, InferenceEngine.from_checkpoint(ckpt_path, **engine_kwargs))

    def frontend(self, name: str) -> BatchingFrontend:
        try:
            return self._frontends[name]
        except KeyError:
            raise KeyError(f"unknown model {name!r}; have {sorted(self._frontends)}")

    def predict(self, name: str, stack: np.ndarray) -> np.ndarray:
        return self.frontend(name).predict(stack)

    def models(self) -> dict:
        return {
            name: {
                "input_shape": fe.engine.input_shape,
                "model": fe.engine.model,
                "topography": fe.engine.topography,
                **fe.stats(),
            }
            for name, fe in self._frontends.items()
        }

    def close(self) -> None:
        for fe in self._frontends.values():
            fe.close()


def serve_http(repo: ModelRepository, host: str = "127.0.0.1", port: int = 8000):
    """Expose a ModelRepository over HTTP (stdlib, no dependencies).

    - ``POST /v1/models/<name>:predict``  body: one ``.npy`` array, either
      (S, S, C) or (N, S, S, C); response: ``.npy`` predictions.
    - ``GET /v1/models``  JSON model list + per-model batching stats.
    - ``GET /healthz``

    Returns the started ``ThreadingHTTPServer`` (serve in the caller's
    thread via ``serve_forever()``, or in the background — tests use
    ``threading.Thread(target=server.serve_forever)``).
    """
    import io
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default (serving hot path)
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok"})
            elif self.path == "/v1/models":
                self._json(200, repo.models())
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if not (self.path.startswith("/v1/models/") and self.path.endswith(":predict")):
                return self._json(404, {"error": f"no route {self.path}"})
            name = self.path[len("/v1/models/"):-len(":predict")]
            try:
                fe = repo.frontend(name)
            except KeyError as e:
                return self._json(404, {"error": str(e)})
            try:
                length = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                return self._json(400, {"error": "bad Content-Length header"})
            if length < 0:
                # -1 would make rfile.read block until client EOF (a
                # handler thread hung forever); other negatives raise.
                return self._json(400, {"error": "negative Content-Length"})
            # Bound the body before reading: N_max batches of the engine's
            # input shape (f64 worst case) plus npy header slack.  An
            # unbounded read would let one oversized request OOM the server
            # (the batcher additionally pads partial batches to full AOT
            # shape, compounding per-request memory).
            max_body = 8 * int(
                os.environ.get("FLOODGAN_SERVE_MAX_BATCH", "64")
            ) * int(np.prod(fe.engine.input_shape)) + 4096
            if length > max_body:
                return self._json(413, {
                    "error": f"body {length} bytes exceeds limit {max_body}"
                })
            try:
                arr = np.load(io.BytesIO(self.rfile.read(length)), allow_pickle=False)
            except Exception as e:
                return self._json(400, {"error": f"bad .npy body: {e}"})
            single = arr.ndim == 3
            batch = arr[None] if single else arr
            if batch.ndim != 4 or batch.shape[1:] != fe.engine.input_shape:
                return self._json(400, {
                    "error": f"expected (N,)+{fe.engine.input_shape}, got {arr.shape}"
                })
            try:
                futs = fe.submit_many(list(batch))
                out = np.stack([f.result(timeout=120) for f in futs])
            except FrontendOverloaded as e:
                # Admission-control rejection is the client's signal to
                # back off, not a server fault.
                return self._json(503, {"error": str(e), "retry": True})
            except Exception as e:
                return self._json(500, {"error": str(e)})
            buf = io.BytesIO()
            np.save(buf, out[0] if single else out)
            self._send(200, buf.getvalue(), "application/octet-stream")

    return ThreadingHTTPServer((host, port), Handler)
