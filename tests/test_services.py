"""Service layer: LLM router, embeddings, agent runtime, REST, MCP, metrics."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from neurondb_tpu.service.agent import AgentRuntime, APIKeyAuth, ToolRegistry
from neurondb_tpu.service.embeddings import EmbeddingService
from neurondb_tpu.service.llm import (BaseProvider, LLMCache, LLMRouter,
                                      LocalProvider, OpenAIProvider,
                                      ProviderError)
from neurondb_tpu.service.mcp import MCPServer
from neurondb_tpu.service.metrics import MetricsRegistry, PrometheusExporter
from neurondb_tpu.service.rest import RESTServer


class ScriptedProvider(BaseProvider):
    name = "scripted"

    def __init__(self, responses=None, fail=False):
        self.responses = list(responses or [])
        self.fail = fail
        self.calls = 0

    def complete(self, prompt, **kw):
        self.calls += 1
        if self.fail:
            raise ProviderError("scripted failure")
        return self.responses.pop(0) if self.responses else "ok"

    def embed(self, texts):
        self.calls += 1
        if self.fail:
            raise ProviderError("scripted failure")
        return np.ones((len(texts), 4), np.float32)

    def rerank(self, query, docs):
        return np.arange(len(docs), 0, -1).astype(np.float32)


# ---- router ----

def test_router_fail_open():
    bad = ScriptedProvider(fail=True)
    good = ScriptedProvider(["fallback"])
    r = LLMRouter([bad, good], fail_open=True)
    assert r.complete("hi") == "fallback"


def test_router_fail_closed():
    bad = ScriptedProvider(fail=True)
    r = LLMRouter([bad, ScriptedProvider()], fail_open=False)
    with pytest.raises(ProviderError):
        r.complete("hi")


def test_router_cache():
    p = ScriptedProvider(["a", "b"])
    r = LLMRouter([p])
    assert r.complete("q") == "a"
    assert r.complete("q") == "a"          # cached
    assert p.calls == 1


def test_cache_ttl():
    c = LLMCache(ttl_s=0.05)
    c.put("op", "x", 42)
    assert c.get("op", "x") == 42
    time.sleep(0.08)
    assert c.get("op", "x") is None


def test_router_jobs():
    r = LLMRouter([ScriptedProvider(["async-result"])])
    jid = r.enqueue("complete", {"prompt": "hello"})
    for _ in range(100):
        if r.job_status(jid).status == "done":
            break
        time.sleep(0.02)
    assert r.job_status(jid).status == "done"
    assert r.job_status(jid).result == "async-result"
    r.shutdown()


def test_local_provider_embed_rerank():
    p = LocalProvider(dim=64)
    e = p.embed(["hello world", "goodbye"])
    assert e.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, rtol=1e-4)
    s = p.rerank("hello", ["hello world", "unrelated"])
    assert s.shape == (2,)


def test_openai_provider_mock_transport():
    def transport(path, payload):
        if path == "/chat/completions":
            return {"choices": [{"message": {"content": "mocked"}}]}
        return {"data": [{"embedding": [1.0, 2.0]}
                         for _ in payload["input"]]}
    p = OpenAIProvider(api_key="k", transport=transport)
    assert p.complete("x") == "mocked"
    assert p.embed(["a", "b"]).shape == (2, 2)


# ---- embeddings ----

def test_embedding_service():
    svc = EmbeddingService(LLMRouter([ScriptedProvider()]))
    out = svc.embed_batch(["a", "b"])
    assert out.shape == (2, 4)
    v1 = svc.embed_cached("same")
    v2 = svc.embed_cached("same")
    np.testing.assert_array_equal(v1, v2)
    img = svc.embed_image(b"\x00\x01\x02" * 100)
    assert img.shape == (256,)
    with pytest.raises(ValueError):
        svc.delete_model("default")


# ---- agent ----

def test_agent_execute_with_tool():
    script = ['{"tool": "calc", "input": {"expression": "6*7"}}',
              "The answer is 42."]
    rt = AgentRuntime(LLMRouter([ScriptedProvider(script)]),
                      ToolRegistry())
    a = rt.create_agent("calc-bot", "You compute.", tools=["calc"])
    s = rt.create_session(a.agent_id)
    msg = rt.execute(s.session_id, "what is 6*7?")
    assert msg.role == "assistant"
    assert msg.tool_calls[0]["result"] == "42"
    roles = [m.role for m in rt.history(s.session_id)]
    assert roles == ["user", "tool", "assistant"]


def test_agent_calc_tool_rejects_code():
    t = ToolRegistry()
    out = t.call("calc", {"expression": "__import__('os')"})
    assert out.startswith("error")


def test_auth():
    auth = APIKeyAuth()
    assert auth.check(None) == "anonymous"   # no keys issued yet
    key = auth.issue("admin")
    assert auth.check(key) == "admin"
    assert auth.check("wrong") is None
    assert auth.check(None) is None


# ---- REST ----

@pytest.fixture()
def rest_server():
    script = ["hello there"]
    rt = AgentRuntime(LLMRouter([ScriptedProvider(script)]))
    srv = RESTServer(rt, port=0)
    port = srv.start()
    yield srv, port
    srv.stop()


def _req(port, path, payload=None, method=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, json.loads(r.read().decode())


def test_rest_health_and_agent_flow(rest_server):
    srv, port = rest_server
    code, out = _req(port, "/health")
    assert out == {"status": "ok"}
    code, agent = _req(port, "/api/v1/agents", {"name": "bot"})
    assert code == 201
    code, sess = _req(port, "/api/v1/sessions",
                      {"agent_id": agent["agent_id"]})
    assert code == 201
    code, msg = _req(port,
                     f"/api/v1/sessions/{sess['session_id']}/messages",
                     {"content": "hi"})
    assert msg["role"] == "assistant"
    assert "hello there" in msg["content"]


def test_rest_search_endpoint(rest_server, rng):
    srv, port = rest_server
    from neurondb_tpu.index import FlatIndex
    x = rng.standard_normal((50, 8)).astype(np.float32)
    srv.add_collection("default", FlatIndex(x))
    code, out = _req(port, "/api/v1/search",
                     {"vector": x[7].tolist(), "k": 1})
    assert out["ids"][0] == 7
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/api/v1/search",
             {"vector": [0.0] * 8, "collection": "nope"})
    assert ei.value.code == 404


def test_rest_search_binary_wire(rest_server, rng):
    """/api/v1/search.bin: raw f32 body in, packed int64 ids + f32
    distances out (r5 serving wire — JSON float-list parse/encode was
    the measured REST wall)."""
    srv, port = rest_server
    from neurondb_tpu.index import FlatIndex
    x = rng.standard_normal((50, 8)).astype(np.float32)
    srv.add_collection("default", FlatIndex(x))
    url = f"http://127.0.0.1:{port}/api/v1/search.bin?k=3"
    req = urllib.request.Request(url, data=x[7].tobytes())
    req.add_header("Content-Type", "application/octet-stream")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 200
        k = int(r.headers["X-NDB-K"])
        raw = r.read()
    ids = np.frombuffer(raw[:8 * k], np.int64)
    dist = np.frombuffer(raw[8 * k:], np.float32)
    assert ids[0] == 7 and len(dist) == k
    assert dist[0] <= dist[1] <= dist[2]


def test_rest_metrics(rest_server):
    srv, port = rest_server
    _req(port, "/health")
    url = f"http://127.0.0.1:{port}/metrics"
    with urllib.request.urlopen(url, timeout=10) as r:
        text = r.read().decode()
    assert "http_requests_total" in text


# ---- MCP ----

def _rpc(srv, method, params=None, rid=1):
    out = srv.handle(json.dumps({"jsonrpc": "2.0", "id": rid,
                                 "method": method,
                                 "params": params or {}}))
    return json.loads(out) if out else None


def test_mcp_initialize_and_tools():
    srv = MCPServer()
    out = _rpc(srv, "initialize")
    assert out["result"]["serverInfo"]["name"] == "neurondb-tpu-mcp"
    tools = _rpc(srv, "tools/list")["result"]["tools"]
    names = {t["name"] for t in tools}
    assert {"vector_search", "create_index", "ml_train", "ml_predict",
            "embed_text", "reciprocal_rank_fusion", "config"} <= names


def test_mcp_bad_requests():
    srv = MCPServer()
    out = json.loads(srv.handle("not json"))
    assert out["error"]["code"] == -32700
    out = json.loads(srv.handle(json.dumps({"jsonrpc": "1.0", "id": 1,
                                            "method": "x"})))
    assert out["error"]["code"] == -32600
    out = _rpc(srv, "tools/call", {"name": "nope"})
    assert out["error"]["code"] == -32601


def test_mcp_index_and_search(rng):
    srv = MCPServer()
    x = rng.standard_normal((40, 8)).astype(np.float32)
    out = _rpc(srv, "tools/call", {
        "name": "create_index",
        "arguments": {"vectors": x.tolist(), "kind": "flat"}})
    assert "error" not in out
    out = _rpc(srv, "tools/call", {
        "name": "vector_search",
        "arguments": {"vector": x[5].tolist(), "k": 1}})
    payload = json.loads(out["result"]["content"][0]["text"])
    ids = np.asarray(payload["ids"]).ravel()
    assert ids[0] == 5


def test_mcp_ml_roundtrip(rng):
    srv = MCPServer()
    X = rng.standard_normal((60, 3)).astype(np.float32)
    y = (X[:, 0] > 0).astype(int)
    out = _rpc(srv, "tools/call", {
        "name": "ml_train",
        "arguments": {"algorithm": "logistic_regression",
                      "X": X.tolist(), "y": y.tolist()}})
    mid = json.loads(out["result"]["content"][0]["text"])["model_id"]
    out = _rpc(srv, "tools/call", {
        "name": "ml_predict",
        "arguments": {"model_id": mid, "X": X[:5].tolist()}})
    preds = json.loads(out["result"]["content"][0]["text"])["predictions"]
    assert len(preds) == 5


def test_mcp_config_tool():
    srv = MCPServer()
    out = _rpc(srv, "tools/call", {
        "name": "config", "arguments": {"show": "hnsw_ef_search"}})
    val = json.loads(out["result"]["content"][0]["text"])
    assert "hnsw_ef_search" in val


# ---- metrics ----

def test_metrics_registry():
    m = MetricsRegistry()
    m.counter("c").inc(3)
    with m.timer("t"):
        time.sleep(0.01)
    text = m.prometheus_text()
    assert "neurondb_tpu_c 3.0" in text
    assert 'le="+Inf"' in text
    view = m.stat_view()
    assert any(r["metric"] == "t" and r["calls"] == 1 for r in view)


def test_prometheus_exporter():
    m = MetricsRegistry()
    m.counter("hits").inc()
    exp = PrometheusExporter(m, port=0)
    port = exp.start()
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics",
                                timeout=10) as r:
        assert "hits" in r.read().decode()
    exp.stop()


# ---- SDK ----

def test_client_sdk(rng):
    from neurondb_tpu.client import Client
    c = Client()
    col = c.create_collection("docs", 8, metric="cosine")
    x = rng.standard_normal((30, 8)).astype(np.float32)
    ids = col.add(x, documents=[f"doc number {i}" for i in range(30)])
    res = col.search(x[3], k=2)
    assert res[0]["id"] == 3
    assert res[0]["document"] == "doc number 3"
    hy = col.hybrid_search(x[3], "number 3", k=3)
    assert any(r["id"] == 3 for r in hy)
    col.delete([3])
    res = col.search(x[3], k=1)
    assert res[0]["id"] != 3
    assert "docs" in c.list_collections()


def test_client_delete_last_docs_clears_bm25(rng):
    """Deleting the final documents must clear the BM25 postings —
    a stale index previously kept returning the deleted ids."""
    from neurondb_tpu.client import Client
    c = Client()
    col = c.create_collection("docs2", dim=4)
    v = rng.standard_normal((3, 4)).astype(np.float32)
    col.add(v, documents=["alpha one", "beta two", "gamma three"])
    col.search(v[0], k=1)                    # builds index + bm25
    col.delete(list(col._ids))
    assert col._bm25 is None


def test_mcp_validation_rejects_bool_for_number():
    from neurondb_tpu.service.mcp_middleware import (ValidationMiddleware,
                                                     build_chain)
    vm = ValidationMiddleware({"t": {
        "type": "object",
        "properties": {"x": {"type": "number"}}, "required": ["x"]}})
    chain = build_chain([vm], lambda n, a: "ok")
    assert chain("t", {"x": 1.5}) == "ok"
    import pytest as _p
    with _p.raises(ValueError, match="numeric"):
        chain("t", {"x": True})


# ---- MCP resources (resource_handlers.go + internal/resources parity) ----

def test_mcp_resources_list():
    srv = MCPServer()
    out = _rpc(srv, "initialize")
    assert "resources" in out["result"]["capabilities"]
    res = _rpc(srv, "resources/list")["result"]["resources"]
    uris = {r["uri"] for r in res}
    assert uris == {"neurondb://config", "neurondb://indexes",
                    "neurondb://models", "neurondb://schema",
                    "neurondb://vector_stats", "neurondb://workers",
                    "neurondb://index_health"}
    for r in res:
        assert r["name"] and r["description"]
        assert r["mimeType"] == "application/json"
        assert "getter" not in r


def test_mcp_resources_read_roundtrip(rng):
    srv = MCPServer()
    x = rng.standard_normal((40, 8)).astype(np.float32)
    _rpc(srv, "tools/call", {
        "name": "create_index",
        "arguments": {"vectors": x.tolist(), "kind": "flat",
                      "collection": "demo"}})
    out = _rpc(srv, "resources/read", {"uri": "neurondb://indexes"})
    content = out["result"]["contents"][0]
    assert content["uri"] == "neurondb://indexes"
    assert content["mimeType"] == "application/json"
    rows = json.loads(content["text"])["indexes"]
    assert rows and rows[0]["collection"] == "demo" and rows[0]["n"] == 40
    # config resource returns the live GUC dict
    cfg = json.loads(_rpc(srv, "resources/read",
                          {"uri": "neurondb://config"}
                          )["result"]["contents"][0]["text"])
    assert "hnsw_ef_search" in cfg
    # vector_stats aggregates
    st = json.loads(_rpc(srv, "resources/read",
                         {"uri": "neurondb://vector_stats"}
                         )["result"]["contents"][0]["text"])
    assert st["total_vectors"] == 40 and st["collections"] == 1
    # index_health runs the validator
    h = json.loads(_rpc(srv, "resources/read",
                        {"uri": "neurondb://index_health"}
                        )["result"]["contents"][0]["text"])
    assert h["health"][0]["collection"] == "demo"
    # schema + models + workers parse as JSON
    for uri in ("neurondb://schema", "neurondb://models",
                "neurondb://workers"):
        json.loads(_rpc(srv, "resources/read", {"uri": uri}
                        )["result"]["contents"][0]["text"])


def test_mcp_resources_errors():
    srv = MCPServer()
    # MCP spec: -32002 (resource not found) for unknown URIs, NOT
    # -32601 which clients read as "method unsupported"
    out = _rpc(srv, "resources/read", {"uri": "neurondb://nope"})
    assert out["error"]["code"] == -32002
    out = _rpc(srv, "resources/read", {})
    assert out["error"]["code"] == -32602

def test_rest_sse_streaming(rest_server):
    """stream: true -> text/event-stream chunk/done framing
    (NeuronAgent/internal/api/streaming.go:12-75)."""
    srv, port = rest_server
    _, agent = _req(port, "/api/v1/agents", {"name": "bot"})
    _, sess = _req(port, "/api/v1/sessions", {"agent_id": agent["agent_id"]})
    url = (f"http://127.0.0.1:{port}/api/v1/sessions/"
           f"{sess['session_id']}/messages")
    req = urllib.request.Request(
        url, data=json.dumps({"content": "hi", "stream": True}).encode())
    req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.headers["Content-Type"] == "text/event-stream"
        raw = r.read().decode()
    events = []
    for block in raw.strip().split("\n\n"):
        lines = dict(ln.split(": ", 1) for ln in block.split("\n"))
        events.append((lines["event"], json.loads(lines["data"])))
    kinds = [e for e, _ in events]
    assert kinds[-1] == "done" and all(e == "chunk" for e in kinds[:-1])
    text = "".join(d["content"] for e, d in events if e == "chunk")
    assert "hello there" in text
    assert "message_id" in events[-1][1]


def test_rest_sse_error_event(rest_server):
    """Execute failures surface as an `error` SSE event, not an HTTP
    status (streaming.go:38-42)."""
    srv, port = rest_server
    url = f"http://127.0.0.1:{port}/api/v1/sessions/nonexistent/messages"
    req = urllib.request.Request(
        url, data=json.dumps({"content": "hi", "stream": True}).encode())
    req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 200
        raw = r.read().decode()
    assert raw.startswith("event: error\n")


def test_rest_microbatched_search(rest_server, rng):
    """enable_batching routes concurrent single-vector searches through
    ONE device dispatch per window (service/batcher.py); results must
    match the direct per-request path exactly."""
    import concurrent.futures as cf

    srv, port = rest_server
    from neurondb_tpu.index import FlatIndex
    x = rng.standard_normal((200, 16)).astype(np.float32)
    idx = FlatIndex(x)
    srv.add_collection("default", idx)
    srv.enable_batching("default", window_ms=20.0, max_batch=64)

    qis = rng.integers(0, 200, 32)

    def one(qi):
        _, out = _req(port, "/api/v1/search",
                      {"vector": x[int(qi)].tolist(), "k": 3})
        return out["ids"]

    with cf.ThreadPoolExecutor(16) as ex:
        results = list(ex.map(one, qis))
    for qi, ids in zip(qis, results):
        assert ids[0] == int(qi)
        d_ref, i_ref = idx.search(x[int(qi)], k=3)
        assert list(np.asarray(i_ref).reshape(-1)) == list(ids)
    bat = srv.batchers["default"]
    assert bat.stats["requests"] == 32
    assert bat.stats["batches"] < 32        # actually batched
    assert bat.stats["max_rows"] > 1


def test_microbatcher_error_fanout(rng):
    from neurondb_tpu.service.batcher import MicroBatcher

    class Boom:
        def search(self, q, k=10, **kw):
            raise ValueError("boom")

    bat = MicroBatcher(Boom(), window_ms=1.0)
    with pytest.raises(ValueError, match="boom"):
        bat.search(np.zeros(4, np.float32), k=2)
    bat.close()
