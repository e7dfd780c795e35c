#!/usr/bin/env python
"""Service-level benchmark: QPS + latency THROUGH the REST surface.

Every other BASELINE row is library-level; the reference's actual
serving shape is an HTTP handler in front of the engine
(NeuronAgent/cmd/agent-server/main.go:97-120). This drives
POST /api/v1/search on a real index with concurrent keep-alive clients
in SEPARATE PROCESSES (so client-side CPU does not share the server's
GIL) and reports served QPS and p50/p99 request latency, with the
MicroBatcher (service/batcher.py) collapsing concurrent requests into
one device dispatch per window.

Env: NDB_BENCH_N (corpus rows, default 1M), NDB_REST_CLIENTS (default
64), NDB_REST_PROCS (client processes, default 8), NDB_REST_SECONDS
(default 10), NDB_REST_WINDOW_MS (default 10), NDB_REST_NPROBE
(default 8), NDB_REST_BATCHING=0 to measure the unbatched path,
NDB_REST_WIRE=bin to drive /api/v1/search.bin (raw f32 body + packed
binary response — r5: float-list JSON parse/encode was the measured
wall at 479 QPS on one core).
"""

import http.client
import json
import multiprocessing as mp
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _client_proc(port, qfile, threads, seconds, seed, out_q,
                 binwire=False):
    """One client process: `threads` keep-alive connections issuing
    sequential searches for `seconds` from ITS OWN start (spawn +
    numpy import cost several seconds; a parent-fixed deadline would
    eat the window). No jax import — pure stdlib."""
    q = np.load(qfile)["q"]
    nq = len(q)
    stop_at = time.time() + seconds
    t_first = time.time()
    lats, counts = [], [0] * threads
    lock = threading.Lock()

    def run(ti):
        conn = http.client.HTTPConnection("127.0.0.1", port)
        rng = np.random.default_rng(seed * 1000 + ti)
        my = []
        done = 0
        while time.time() < stop_at:
            if binwire:
                payload = q[int(rng.integers(0, nq))].tobytes()
                path, ctype = ("/api/v1/search.bin?k=10",
                               "application/octet-stream")
            else:
                payload = json.dumps(
                    {"vector": q[int(rng.integers(0, nq))].tolist(),
                     "k": 10}).encode()
                path, ctype = "/api/v1/search", "application/json"
            t1 = time.time()
            try:
                conn.request("POST", path, payload,
                             {"Content-Type": ctype})
                r = conn.getresponse()
                body = r.read()
                assert r.status == 200, body[:200]
            except (ConnectionError, http.client.HTTPException):
                conn.close()
                conn = http.client.HTTPConnection("127.0.0.1", port)
                continue
            my.append(time.time() - t1)
            done += 1
        conn.close()
        with lock:
            lats.extend(my)
            counts[ti] = done

    ts = [threading.Thread(target=run, args=(i,)) for i in range(threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    out_q.put((lats, sum(counts), t_first, time.time()))


def main():
    from bench import make_corpus
    from neurondb_tpu.index import IVFFlatIndex
    from neurondb_tpu.service.rest import RESTServer

    n = int(os.environ.get("NDB_BENCH_N", 1_000_000))
    d = 128
    nlists = int(os.environ.get("NDB_BENCH_NLISTS", min(1024, n)))
    nprobe = int(os.environ.get("NDB_REST_NPROBE", 8))
    clients = int(os.environ.get("NDB_REST_CLIENTS", 64))
    procs = int(os.environ.get("NDB_REST_PROCS", 8))
    seconds = float(os.environ.get("NDB_REST_SECONDS", 10))
    window_ms = float(os.environ.get("NDB_REST_WINDOW_MS", 10))
    batching = os.environ.get("NDB_REST_BATCHING", "1") != "0"
    binwire = os.environ.get("NDB_REST_WIRE", "json") == "bin"

    x = make_corpus(n, d)
    rng = np.random.default_rng(1)
    nq = 4096
    q = x[rng.choice(n, nq, replace=False)] + \
        0.02 * rng.standard_normal((nq, d)).astype(np.float32)
    qfile = f"/tmp/ndb_rest_q_{os.getpid()}.npz"
    np.savez(qfile, q=q)

    t0 = time.time()
    idx = IVFFlatIndex(x, nlists=nlists, metric="l2", seed=0)
    build_s = time.time() - t0
    print(f"# build {build_s:.1f}s", file=sys.stderr, flush=True)

    srv = RESTServer(port=0)
    srv.add_collection("default", idx)
    if batching:
        srv.enable_batching(
            "default", window_ms=window_ms, max_batch=4096, wire="int8",
            pad_floor=max(64, 1 << (clients - 1).bit_length()),
            nprobe=nprobe)
    port = srv.start()

    # warm the dispatch shape (pad_floor rows) before timing
    payload0 = json.dumps({"vector": q[0].tolist(), "k": 10}).encode()
    conn = http.client.HTTPConnection("127.0.0.1", port)
    for _ in range(8):
        conn.request("POST", "/api/v1/search", payload0,
                     {"Content-Type": "application/json"})
        conn.getresponse().read()
    conn.close()

    ctx = mp.get_context("spawn")      # no jax state in the children
    out_q = ctx.Queue()
    per = max(1, clients // procs)
    ps = [ctx.Process(target=_client_proc,
                      args=(port, qfile, per, seconds, i, out_q,
                            binwire))
          for i in range(procs)]
    for p in ps:
        p.start()
    lats: list = []
    total = 0
    t_first, t_last = float("inf"), 0.0
    for _ in ps:
        la, cnt, tf, tl = out_q.get()
        lats.extend(la)
        total += cnt
        t_first = min(t_first, tf)
        t_last = max(t_last, tl)
    for p in ps:
        p.join()
    wall = t_last - t_first
    bstats = (dict(srv.batchers["default"].stats) if batching else None)
    srv.stop()
    os.unlink(qfile)

    la = np.sort(np.array(lats))
    out = {
        "metric": "rest_served_qps", "value": round(total / wall, 1),
        "unit": "qps", "n": n, "clients": per * procs,
        "client_procs": procs, "batching": batching,
        "window_ms": window_ms, "nprobe": nprobe,
        "wire": "bin" if binwire else "json",
        "p50_ms": round(float(la[len(la) // 2]) * 1000, 2),
        "p99_ms": round(float(la[int(len(la) * 0.99)]) * 1000, 2),
        "requests": total, "build_seconds": round(build_s, 1),
    }
    if bstats:
        out["avg_batch_rows"] = round(
            bstats["requests"] / max(bstats["batches"], 1), 1)
        out["max_batch_rows"] = bstats["max_rows"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
