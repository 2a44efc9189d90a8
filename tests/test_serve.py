"""Serving path: AOT-compiled inference engine + predict CLI."""

import glob
import os

import numpy as np
import pytest

import jax

from fixtures import make_flood_fixture


@pytest.mark.slow
def test_inference_engine_and_predict_cli(tmp_path, rng):
    from floodgan_tpu.api import Model
    from floodgan_tpu.serve import InferenceEngine
    from predict import main as predict_main

    data_path, meta_dir = make_flood_fixture(tmp_path / "data", size=32)
    m = Model(
        model="PairedAttention", dataset_subset="usa", dataset_dem="same",
        data_path=data_path, num_epochs=1, topography="all", resize=None,
        save_model_interval=1, metadata_dir=meta_dir,
    )
    m.train_paired()
    ckpt = glob.glob(f"{data_path}/models/PairedAttention_*.ckpt")[0]

    engine = InferenceEngine.from_checkpoint(ckpt, batch_size=2, image_size=32)
    stacks = rng.random((2, 32, 32, 9), dtype=np.float32)
    x = engine.preprocess(stacks, resize=32)
    out = np.asarray(engine.predict(x))
    assert out.shape == (2, 32, 32, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # AOT path is deterministic
    out2 = np.asarray(engine.predict(x))
    np.testing.assert_array_equal(out, out2)
    stats = engine.benchmark(iters=3)
    assert stats["images_per_sec"] > 0

    # CLI over real fixture TIFFs
    inputs = sorted(glob.glob(f"{data_path}/dataset_input/*.tif"))[:2]
    out_dir = str(tmp_path / "preds")
    predict_main([
        f"--pretrained_model_path={ckpt}",
        "--inputs", *inputs,
        f"--output_dir={out_dir}",
        "--resize=32",
    ])
    assert len(glob.glob(f"{out_dir}/*_prediction.png")) == 2


@pytest.fixture(scope="module")
def tiny_engine():
    """AOT engine over a freshly-initialized PairedAttention at 32^2 —
    no checkpoint/training needed for the frontend-layer tests."""
    from floodgan_tpu.serve import InferenceEngine
    from floodgan_tpu.train.paired import PairedTrainer

    trainer = PairedTrainer("pairedattention", 9)
    state = trainer.init(
        jax.random.key(0), jax.numpy.zeros((1, 32, 32, 9)), jax.numpy.zeros((1, 32, 32, 3))
    )
    return InferenceEngine(
        "pairedattention", state.gen_params, "all", batch_size=4, image_size=32,
        compute_dtype="float32",
    )


def test_batching_frontend_groups_and_matches_engine(tiny_engine, rng):
    """Submissions from one producer fill a batch; results equal the
    engine's own batched predict, element for element."""
    from floodgan_tpu.serve import BatchingFrontend

    fe = BatchingFrontend(tiny_engine, max_delay_ms=200.0)
    stacks = rng.random((4, 32, 32, 9), dtype=np.float32)
    want = np.asarray(tiny_engine.predict(stacks))

    futs = [fe.submit(s) for s in stacks]
    got = np.stack([f.result(timeout=60) for f in futs])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    stats = fe.stats()
    assert stats["requests"] == 4
    assert stats["batches"] >= 1
    fe.close()


def test_batching_frontend_partial_batch_padding(tiny_engine, rng):
    """A lone request rides a zero-padded batch; its slot matches the
    engine run on the identically-padded batch."""
    from floodgan_tpu.serve import BatchingFrontend

    fe = BatchingFrontend(tiny_engine, max_delay_ms=1.0)
    stack = rng.random((32, 32, 9), dtype=np.float32)
    padded = np.concatenate([stack[None], np.zeros((3, 32, 32, 9), np.float32)])
    want = np.asarray(tiny_engine.predict(padded))[0]
    got = fe.predict(stack, timeout=60)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert fe.stats()["mean_occupancy"] <= 0.5
    fe.close()


def test_batching_frontend_rejects_bad_shape(tiny_engine):
    from floodgan_tpu.serve import BatchingFrontend

    fe = BatchingFrontend(tiny_engine)
    with pytest.raises(ValueError):
        fe.submit(np.zeros((16, 16, 9), np.float32))
    fe.close()


def test_model_repository_and_http_server(tiny_engine, rng):
    """Multi-model routing + the .npy-over-HTTP protocol end to end."""
    import io
    import json
    import threading
    import urllib.request

    from floodgan_tpu.serve import ModelRepository, serve_http

    repo = ModelRepository()
    repo.add("flood", tiny_engine, max_delay_ms=1.0)
    with pytest.raises(ValueError):
        repo.add("flood", tiny_engine)
    with pytest.raises(KeyError):
        repo.frontend("nope")

    server = serve_http(repo, host="127.0.0.1", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r)["status"] == "ok"

        stack = rng.random((32, 32, 9), dtype=np.float32)
        buf = io.BytesIO(); np.save(buf, stack)
        req = urllib.request.Request(
            f"{base}/v1/models/flood:predict", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = np.load(io.BytesIO(r.read()))
        assert out.shape == (32, 32, 3)
        np.testing.assert_allclose(out, repo.predict("flood", stack), rtol=1e-5, atol=1e-6)

        # batched body
        stacks = rng.random((2, 32, 32, 9), dtype=np.float32)
        buf = io.BytesIO(); np.save(buf, stacks)
        req = urllib.request.Request(
            f"{base}/v1/models/flood:predict", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = np.load(io.BytesIO(r.read()))
        assert out.shape == (2, 32, 32, 3)

        # model listing carries stats
        with urllib.request.urlopen(f"{base}/v1/models", timeout=30) as r:
            models = json.load(r)
        assert models["flood"]["requests"] >= 3

        # error routes
        bad = urllib.request.Request(
            f"{base}/v1/models/nope:predict", data=buf.getvalue(), method="POST"
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404

        # oversized bodies are rejected before reading (ADVICE r2: no
        # unbounded read -> OOM).  Raw socket so we can claim a 64GB
        # Content-Length without sending it; the server must answer 413
        # without waiting for the body.
        import socket as sk

        conn = sk.create_connection(
            ("127.0.0.1", server.server_address[1]), timeout=30
        )
        conn.sendall(
            b"POST /v1/models/flood:predict HTTP/1.1\r\nHost: t\r\n"
            b"Content-Length: 68719476736\r\n\r\n"
        )
        status = conn.recv(1024).decode(errors="replace").splitlines()[0]
        conn.close()
        assert " 413 " in status, status
    finally:
        server.shutdown()
        repo.close()


def test_batching_frontend_close_drains_queue(tiny_engine, rng):
    """Every request accepted before close() must resolve — the shutdown
    sentinel is strictly the last queued item, so nothing is abandoned."""
    from floodgan_tpu.serve import BatchingFrontend

    fe = BatchingFrontend(tiny_engine, max_delay_ms=50.0)
    stacks = rng.random((6, 32, 32, 9), dtype=np.float32)
    futs = [fe.submit(s) for s in stacks]
    fe.close()
    for f in futs:
        assert f.result(timeout=60).shape == (32, 32, 3)
    with pytest.raises(RuntimeError):
        fe.submit(stacks[0])
    fe.close()  # idempotent


def test_batching_frontend_survives_cancelled_future(tiny_engine, rng):
    """A waiter that cancels its Future after submit must not kill the
    worker thread (set_result on a cancelled future raises
    InvalidStateError) — later requests still resolve."""
    from floodgan_tpu.serve import BatchingFrontend

    fe = BatchingFrontend(tiny_engine, max_delay_ms=20.0)
    doomed = fe.submit(rng.random((32, 32, 9), dtype=np.float32))
    assert doomed.cancel()  # never-running future: cancel succeeds
    ok = fe.submit(rng.random((32, 32, 9), dtype=np.float32))
    assert ok.result(timeout=60).shape == (32, 32, 3)
    fe.close()


def test_http_negative_content_length_rejected(tiny_engine):
    """'Content-Length: -1' must get a 400, not an unbounded rfile.read
    that hangs the handler thread until client EOF."""
    import socket as sk
    import threading

    from floodgan_tpu.serve import ModelRepository, serve_http

    repo = ModelRepository()
    repo.add("flood", tiny_engine)
    server = serve_http(repo, host="127.0.0.1", port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = sk.create_connection(
            ("127.0.0.1", server.server_address[1]), timeout=30
        )
        conn.sendall(
            b"POST /v1/models/flood:predict HTTP/1.1\r\nHost: t\r\n"
            b"Content-Length: -1\r\n\r\n"
        )
        status = conn.recv(1024).decode(errors="replace").splitlines()[0]
        conn.close()
        assert " 400 " in status, status
    finally:
        server.shutdown()
        repo.close()


def test_wire_dtype_bf16_quantizes_only_the_wire(tiny_engine, rng):
    """wire_dtype="bfloat16" halves H2D bytes (BENCH_NOTES round 5); the
    compiled signature takes bf16 inputs, outputs stay within the input
    quantization error of the f32-wire engine, and the AOT path is hit."""
    from floodgan_tpu.serve import InferenceEngine

    bf16 = InferenceEngine(
        "pairedattention", tiny_engine.gen_params, "all", batch_size=4,
        image_size=32, compute_dtype="float32", wire_dtype="bfloat16",
    )
    x = rng.standard_normal((4, 32, 32, 9)).astype(np.float32)
    ref = np.asarray(tiny_engine.predict(x), np.float32)
    out = np.asarray(bf16.predict(x), np.float32)
    assert out.shape == ref.shape
    # bf16 wire quantizes inputs to 8 mantissa bits; through a tanh-headed
    # generator the output error stays small but nonzero.
    np.testing.assert_allclose(out, ref, atol=5e-2)
    assert not np.array_equal(out, ref) or np.allclose(x, np.asarray(
        np.asarray(x, dtype=jax.numpy.bfloat16), np.float32))
    # deterministic AOT path (same compiled executable both calls)
    np.testing.assert_array_equal(out, np.asarray(bf16.predict(x), np.float32))


def test_frontend_admission_control(tiny_engine):
    """max_pending bounds the backlog (BENCH_NOTES round 5: unbounded
    oversubscription queued 3 service periods deep): submits beyond the
    cap fail fast with FrontendOverloaded, and admission recovers once
    the backlog drains."""
    import time

    from floodgan_tpu.serve import BatchingFrontend, FrontendOverloaded

    fe = BatchingFrontend(tiny_engine, max_delay_ms=200.0, max_pending=2)
    x = np.zeros(tiny_engine.input_shape, np.float32)
    f1 = fe.submit(x)
    f2 = fe.submit(x)
    with pytest.raises(FrontendOverloaded):
        fe.submit(x)
    assert fe.stats()["pending"] == 2
    # the two admitted requests complete (batch flushes at max_delay)
    f1.result(timeout=60)
    f2.result(timeout=60)
    # backlog drained -> admission recovers
    deadline = time.monotonic() + 60
    while True:
        try:
            f3 = fe.submit(x)
            break
        except FrontendOverloaded:
            assert time.monotonic() < deadline
            time.sleep(0.01)
    f3.result(timeout=60)
    assert fe.stats()["pending"] == 0
    fe.close()


def test_http_overload_returns_503(tiny_engine):
    """The HTTP layer maps FrontendOverloaded to 503 + retry hint."""
    import io
    import threading
    import urllib.request
    import urllib.error

    from floodgan_tpu.serve import ModelRepository, serve_http

    repo = ModelRepository()
    repo.add("flood", tiny_engine, max_delay_ms=5000.0, max_pending=1)
    server = serve_http(repo, host="127.0.0.1", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        url = f"http://127.0.0.1:{port}/v1/models/flood:predict"
        x = np.zeros(tiny_engine.input_shape, np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        body = buf.getvalue()

        # Occupy the single pending slot (worker waits out max_delay).
        fut = repo.frontend("flood").submit(x)
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                urllib.request.Request(url, data=body, method="POST"),
                timeout=30,
            )
        assert ei.value.code == 503
        fut.result(timeout=60)
    finally:
        server.shutdown()
        repo.close()


def test_submit_many_all_or_nothing(tiny_engine):
    """Multi-image admission is atomic: when the batch doesn't fit under
    max_pending, NO prefix is admitted (an admitted prefix would be
    computed and discarded while occupying slots — HTTP finding, round 5)."""
    from floodgan_tpu.serve import BatchingFrontend, FrontendOverloaded

    fe = BatchingFrontend(tiny_engine, max_delay_ms=200.0, max_pending=3)
    x = np.zeros(tiny_engine.input_shape, np.float32)
    with pytest.raises(FrontendOverloaded):
        fe.submit_many([x] * 4)
    assert fe.stats()["pending"] == 0  # nothing admitted
    futs = fe.submit_many([x, x, x])
    with pytest.raises(FrontendOverloaded):
        fe.submit(x)
    for f in futs:
        f.result(timeout=60)
    with pytest.raises(ValueError):
        fe.submit_many([np.zeros((8, 8, 9), np.float32)])
    fe.close()
