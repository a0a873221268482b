"""MicroBatcher: cross-request coalescing, splitting, error propagation."""

import threading
import time

import numpy as np

from pevit_tpu.serve import InferencePipeline, MicroBatcher


def _fn_counting(calls):
    def fn(x):
        calls.append(np.asarray(x).shape[0])
        # logits = per-row sum so each row's output identifies the input row
        return np.asarray(x, np.float32).reshape(x.shape[0], -1).sum(1, keepdims=True)
    return fn


def _img(n, v):
    return np.full((n, 4, 4, 3), v, np.uint8)


def test_single_request_passthrough():
    calls = []
    mb = MicroBatcher(InferencePipeline(_fn_counting(calls), max_batch=8, min_bucket=1),
                      window_ms=1.0)
    out = mb.infer(_img(3, 7))
    assert out.shape == (3, 1)
    np.testing.assert_allclose(out, 7 * 4 * 4 * 3)
    mb.close()


def test_concurrent_requests_share_batches_and_split_correctly():
    calls = []
    pipe = InferencePipeline(_fn_counting(calls), max_batch=64, min_bucket=1)
    mb = MicroBatcher(pipe, window_ms=50.0)
    n_clients = 8
    results = [None] * n_clients

    def client(i):
        results[i] = mb.infer(_img(2, i + 1))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(n_clients):
        np.testing.assert_allclose(results[i], (i + 1) * 48.0,
                                   err_msg=f"client {i} got another client's rows")
    # 16 images arrived within one 50ms window -> far fewer pipeline calls
    # than requests (usually 1-2 groups)
    assert mb.stats["groups"] < n_clients
    assert mb.stats["requests"] == n_clients
    mb.close()


def test_max_group_caps_wait():
    calls = []
    pipe = InferencePipeline(_fn_counting(calls), max_batch=4, min_bucket=1)
    mb = MicroBatcher(pipe, window_ms=10_000.0, max_group=4)  # absurd window
    t0 = time.perf_counter()
    results = [None] * 4

    def client(i):
        results[i] = mb.infer(_img(1, i + 1))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # the 4-image max_group fired LONG before the 10s window
    assert time.perf_counter() - t0 < 5.0
    for i in range(4):
        np.testing.assert_allclose(results[i], (i + 1) * 48.0)
    mb.close()


def test_error_propagates_and_worker_survives():
    def fn(x):
        if x.shape[0] >= 4:  # poison: big groups fail
            raise RuntimeError("boom")
        return np.zeros((x.shape[0], 1), np.float32)

    mb = MicroBatcher(InferencePipeline(fn, max_batch=8, min_bucket=1), window_ms=0.0)
    try:
        mb.infer(_img(5, 1))
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "boom" in str(e)
    # worker is still alive and serves the next request
    out = mb.infer(_img(2, 1))
    assert out.shape == (2, 1)
    mb.close()


def test_mismatched_shapes_do_not_share_a_group():
    calls = []
    mb = MicroBatcher(InferencePipeline(_fn_counting(calls), max_batch=64, min_bucket=1),
                      window_ms=100.0)
    results = {}

    def client(key, arr):
        results[key] = mb.infer(arr)

    a = np.full((2, 4, 4, 3), 1, np.uint8)
    b = np.full((2, 8, 8, 3), 2, np.uint8)
    t1 = threading.Thread(target=client, args=("a", a))
    t2 = threading.Thread(target=client, args=("b", b))
    t1.start(); t2.start(); t1.join(); t2.join()
    np.testing.assert_allclose(results["a"], 48.0)
    np.testing.assert_allclose(results["b"], 2 * 8 * 8 * 3)
    mb.close()


def test_latency_stats_populated():
    """Per-request latency percentiles accumulate (enqueue -> logits ready)
    and survive coalesced groups."""
    import threading

    import numpy as np

    from pevit_tpu.serve import InferencePipeline, MicroBatcher

    def call(x):
        return np.asarray(x, np.float32).reshape(x.shape[0], -1)[:, :4]

    pipe = InferencePipeline(call, max_batch=32, min_bucket=4, depth=2)
    mb = MicroBatcher(pipe, window_ms=5.0)
    try:
        assert mb.latency_stats() == {"count": 0}
        threads = [threading.Thread(
            target=lambda: mb.infer(np.zeros((2, 4, 4, 3), np.uint8)))
            for _ in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        st = mb.latency_stats()
        assert st["count"] == 6
        for k in ("mean_ms", "p50_ms", "p95_ms", "p99_ms"):
            assert st[k] >= 0.0
        assert st["p99_ms"] >= st["p50_ms"]
    finally:
        mb.close()
