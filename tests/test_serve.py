"""Serving daemon: protocol, dynamic batching, concurrency, parity with
direct engine calls."""

import json
import socket
import threading

import pytest

from improving_learned_index_tpu.index.inverted import InvertedIndexData
from improving_learned_index_tpu.search.engine import InvertedIndex
from improving_learned_index_tpu.serve import RetrievalServer

DOCS = [
    {"apple": 200, "banana": 100},
    {"apple": 150, "cherry": 50},
    {"banana": 250, "cherry": 10, "apple": 5},
    {"date": 77},
]


class _FakeTokenizer:
    def process_query(self, q):
        return set(q.split())


def _index():
    return InvertedIndexData.build(enumerate(DOCS), num_docs=len(DOCS))


class _Client:
    # 60s socket timeout: these tests are event-driven (every recv waits on
    # a response the server owes), so the timeout only fires when the host
    # is pathologically starved — 10s proved too tight under a full
    # parallel-suite load (r3 flake of test_concurrent_clients_batch_and_agree)
    def __init__(self, port, timeout=60):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=timeout)
        self.f = self.sock.makefile("rb")

    def call(self, req):
        self.sock.sendall((json.dumps(req) + "\n").encode())
        return json.loads(self.f.readline())

    def send_raw(self, data: bytes):
        self.sock.sendall(data)

    def recv(self):
        return json.loads(self.f.readline())

    def close(self):
        self.sock.close()


@pytest.fixture()
def server():
    engine = InvertedIndex(_index())
    srv = RetrievalServer(
        engine, tokenizer=_FakeTokenizer(), top_k=10, max_batch=4,
        max_wait_ms=10.0, allow_shutdown=True,
    )
    srv.start()
    yield srv, engine
    srv.stop()


def test_terms_query_ping_stats(server):
    srv, engine = server
    c = _Client(srv.port)
    assert c.call({"op": "ping"}) == {"op": "pong"}

    r = c.call({"id": 1, "terms": ["apple", "banana"]})
    expect = engine.score_batch([{"apple", "banana"}], 10)[0]
    assert r["id"] == 1
    assert r["results"] == [[int(d), float(s)] for d, s in expect]

    r = c.call({"id": "q2", "query": "cherry date"})
    expect = engine.score_batch([{"cherry", "date"}], 10)[0]
    assert r["id"] == "q2" and r["results"] == [[int(d), float(s)] for d, s in expect]

    st = c.call({"op": "stats"})
    assert st["queries"] == 2 and st["batches"] >= 1
    assert st["latency_ms"]["p50"] is not None
    c.close()


def test_k_override_and_unknown_terms(server):
    srv, _ = server
    c = _Client(srv.port)
    r = c.call({"id": 5, "terms": ["apple"], "k": 1})
    assert len(r["results"]) == 1 and r["results"][0][0] == 0
    r = c.call({"id": 6, "terms": ["nosuchterm"]})
    assert r["results"] == []
    c.close()


def test_errors(server):
    srv, _ = server
    c = _Client(srv.port)
    c.send_raw(b"this is not json\n")
    assert "bad json" in c.recv()["error"]
    r = c.call({"id": 9})
    assert "need 'terms' or 'query'" in r["error"]
    c.close()


def test_concurrent_clients_batch_and_agree(server):
    srv, engine = server
    n = 24
    results, errors = {}, {}
    lock = threading.Lock()

    def worker(i):
        try:
            c = _Client(srv.port)
            r = c.call({"id": i, "terms": ["apple", "cherry"]})
            with lock:
                results[i] = r
            c.close()
        except Exception as e:  # surface, don't silently drop the slot
            with lock:
                errors[i] = repr(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)  # generous: the CI box is one contended core
    stuck = [i for i, t in enumerate(threads) if t.is_alive()]
    assert not stuck and not errors, f"stuck={stuck} errors={errors}"
    expect = [[int(d), float(s)] for d, s in engine.score_batch([{"apple", "cherry"}], 10)[0]]
    assert len(results) == n
    for i in range(n):
        assert results[i]["id"] == i and results[i]["results"] == expect
    # 24 queries through max_batch=4 must have coalesced into >1 per batch
    st = srv.stats.snapshot()
    assert st["queries"] >= n
    assert st["batches"] <= st["queries"]


def test_pairwise_expansion():
    idx = InvertedIndexData.build(
        enumerate([{"a": 1, "a|b": 7, "b": 2}]), num_docs=1
    )
    srv = RetrievalServer(InvertedIndex(idx), top_k=5, pairwise=True, max_wait_ms=1.0)
    srv.start()
    try:
        c = _Client(srv.port)
        r = c.call({"id": 0, "terms": ["a", "b"]})
        assert r["results"] == [[0, 10.0]]  # 1 + 2 + composite 7
        c.close()
    finally:
        srv.stop()


def test_client_disconnect_mid_batch(server):
    """A client that vanishes before its response must not break the batch
    for other clients."""
    srv, engine = server
    ghost = _Client(srv.port)
    ghost.send_raw(b'{"id": "ghost", "terms": ["apple"]}\n')
    ghost.close()  # gone before the batch dispatches
    c = _Client(srv.port)
    r = c.call({"id": "live", "terms": ["apple"]})
    assert r["id"] == "live" and r["results"]
    c.close()


def test_overload_shedding():
    import time as _time

    class SlowEngine:
        def __init__(self, inner):
            self.inner = inner

        def score_batch(self, term_sets, k):
            _time.sleep(0.2)
            return self.inner.score_batch(term_sets, k)

    srv = RetrievalServer(
        SlowEngine(InvertedIndex(_index())), top_k=5, max_batch=1,
        max_wait_ms=0.0, max_queue=2,
    )
    srv.start()
    try:
        clients = [_Client(srv.port) for _ in range(8)]
        for i, c in enumerate(clients):
            c.send_raw(json.dumps({"id": i, "terms": ["apple"]}).encode() + b"\n")
        replies = [c.recv() for c in clients]
        shed = [r for r in replies if r.get("error") == "overloaded"]
        served = [r for r in replies if "results" in r]
        assert shed, "queue bound never tripped"
        assert served, "nothing served"
        assert len(shed) + len(served) == 8
        for c in clients:
            c.close()
    finally:
        srv.stop()


def test_shutdown_op(server):
    srv, _ = server
    c = _Client(srv.port)
    assert c.call({"op": "shutdown"}) == {"op": "bye"}
    c.close()


def test_hot_swap_engine(server):
    """Live index update: swap in an engine over a merged index; the next
    request sees the new corpus, no restart."""
    srv, _ = server
    c = _Client(srv.port)
    assert c.call({"id": 1, "terms": ["newterm"]})["results"] == []
    bigger = InvertedIndexData.merge(
        [_index(), InvertedIndexData.build(enumerate([{"newterm": 42}]), num_docs=1)]
    )
    srv.swap_engine(InvertedIndex(bigger))
    r = c.call({"id": 2, "terms": ["newterm"]})
    assert r["results"] == [[len(DOCS), 42.0]]
    c.close()


def test_cli_serve_subprocess(tmp_path):
    """cli.serve end-to-end in a real process: index + vocab from disk,
    warmup, query over TCP, remote shutdown."""
    import os
    import subprocess
    import sys
    import time

    _index().save(tmp_path / "inv")
    (tmp_path / "vocab.txt").write_text(
        "[PAD]\n[UNK]\n[CLS]\n[SEP]\n[MASK]\napple\nbanana\ncherry\ndate\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "improving_learned_index_tpu.cli.serve",
            "--index_path", str(tmp_path / "inv"),
            "--vocab_path", str(tmp_path / "vocab.txt"),
            "--engine", "host", "--port", "0", "--top_k", "5",
            "--max_wait_ms", "1", "--allow_remote_shutdown",
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        port = None
        deadline = time.time() + 120
        for line in proc.stdout:
            if "serving" in line and ":" in line:
                port = int(line.rsplit(":", 1)[1])
                break
            assert time.time() < deadline, "server never came up"
        assert port, "no port line"
        c = _Client(port)
        r = c.call({"id": 1, "terms": ["apple", "banana"]})
        assert r["results"] and r["results"][0][0] == 0
        assert c.call({"op": "shutdown"}) == {"op": "bye"}
        c.close()
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


def test_shutdown_refused_by_default():
    srv = RetrievalServer(InvertedIndex(_index()), max_wait_ms=1.0)
    srv.start()
    try:
        c = _Client(srv.port)
        assert "not allowed" in c.call({"op": "shutdown"})["error"]
        c.close()
    finally:
        srv.stop()


def test_malformed_k_does_not_kill_batch_loop(server):
    """A non-integer 'k' must produce an error reply and the daemon must
    keep serving: before the fix, int(req['k']) raised OUTSIDE the guarded
    per-request block and killed the batch thread (every later query hung
    while ping/stats still answered — a one-request DoS)."""
    srv, engine = server
    c = _Client(srv.port)
    r = c.call({"id": 1, "terms": ["apple"], "k": "abc"})
    assert "error" in r and r["id"] == 1
    # the batch loop must still dispatch:
    r = c.call({"id": 2, "terms": ["apple"]})
    assert r["id"] == 2 and "results" in r
    c.close()


def test_non_object_json_and_string_terms_rejected(server):
    srv, _ = server
    c = _Client(srv.port)
    c.send_raw(b"[1, 2]\n")
    assert "error" in c.recv()  # not an AttributeError that kills the conn
    c.send_raw(b"5\n")
    assert "error" in c.recv()
    # a bare string would be iterated character-by-character: reject
    r = c.call({"id": 3, "terms": "apple"})
    assert "error" in r and r["id"] == 3
    # connection still alive after all three
    assert c.call({"op": "ping"}) == {"op": "pong"}
    c.close()


def test_stop_drains_queue_with_explicit_errors():
    """Requests still queued at stop() get a 'shutting down' error reply,
    not a silent drop (pipelined clients would read a bare FIN as a
    transport failure and retry work the operator meant to drain)."""
    engine = InvertedIndex(_index())
    srv = RetrievalServer(engine, top_k=10)
    sent = []

    class _FakeConn:
        def sendall(self, data):
            sent.append(json.loads(data))

    srv._stop.set()
    srv._queue.append((_FakeConn(), threading.Lock(), {"id": 9, "terms": ["apple"]}, 0.0))
    srv._batch_loop()  # sees stop, drains the queue with explicit errors
    assert sent == [{"id": 9, "error": "shutting down"}]
    assert not srv._queue and srv.stats.errors == 1


def test_pipelined_batches_overlap_and_stay_correct():
    """With an async-capable engine, the daemon dispatches batch i+1 before
    finalizing batch i (pipeline_depth=2).  The overlap must be real
    (concurrent dispatches observed) and every reply must still be exact
    and correctly routed."""
    import time as _time

    inner = InvertedIndex(_index())
    events = []  # (op, t) — appended under lock
    elock = threading.Lock()

    class AsyncEngine:
        def score_batch_async(self, term_sets, k):
            with elock:
                events.append(("dispatch", _time.time()))
            done = threading.Event()
            out = {}

            def work():
                _time.sleep(0.05)  # device latency the loop should hide
                out["r"] = inner.score_batch(term_sets, k)
                done.set()

            threading.Thread(target=work, daemon=True).start()

            def finalize():
                done.wait()
                with elock:
                    events.append(("finalize", _time.time()))
                return out["r"]

            return finalize

        def score_batch(self, term_sets, k):
            return self.score_batch_async(term_sets, k)()

    srv = RetrievalServer(AsyncEngine(), top_k=5, max_batch=2, max_wait_ms=0.0)
    assert srv.pipeline_depth == 2
    srv.start()
    try:
        n, results = 12, {}
        lock = threading.Lock()

        def worker(i):
            c = _Client(srv.port)
            r = c.call({"id": i, "terms": ["apple", "cherry"]})
            with lock:
                results[i] = r
            c.close()

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == n
        expect = [[int(d), float(s)]
                  for d, s in inner.score_batch([{"apple", "cherry"}], 5)[0]]
        for i in range(n):
            assert results[i]["id"] == i and results[i]["results"] == expect
        # overlap: some dispatch happened while an earlier batch was still
        # unfinalized (strictly sequential would alternate d,f,d,f,...)
        seq = [op for op, _ in events]
        in_flight = mx = 0
        for op in seq:
            in_flight += 1 if op == "dispatch" else -1
            mx = max(mx, in_flight)
        assert mx >= 2, f"no overlap observed: {seq}"
    finally:
        srv.stop()
