"""Sandboxed evaluator + agent tool hardening (ADVICE r1 items)."""

import json

import pytest

from neurondb_tpu.utils.safeeval import SafeEvalError, safe_eval, safe_exec


def test_arithmetic():
    assert safe_eval("2 + 3 * 4") == 14
    assert safe_eval("(1 + 2) / 4") == 0.75
    assert safe_eval("10 % 3") == 1
    assert safe_eval("-5 + +2") == -3
    assert safe_eval("2 ** 10") == 1024


def test_pow_bomb_rejected():
    # ADVICE r1: '9**9**9**9' must not pin the CPU / allocate unbounded ints
    with pytest.raises(SafeEvalError):
        safe_eval("9**9**9**9")
    with pytest.raises(SafeEvalError):
        safe_eval("2**100000")
    with pytest.raises(SafeEvalError):
        safe_eval("(10**60) * (10**60) * (10**60) * (10**60) * "
                  "(10**60) * (10**60) * (10**60) * (10**60) * (10**60)")


def test_no_code_execution():
    for evil in ("__import__('os').system('id')",
                 "().__class__.__bases__",
                 "open('/etc/passwd')",
                 "exec('1')",
                 "lambda: 1",
                 "[x for x in ().__class__.__mro__]"):
        with pytest.raises(SafeEvalError):
            safe_eval(evil)


def test_step_budget():
    with pytest.raises(SafeEvalError):
        safe_exec("i = 0\nwhile 1 < 2:\n    i = i + 1")
    with pytest.raises(SafeEvalError):
        safe_eval("sum([1 for a in range(5000) for b in range(5000)])")


def test_whitelisted_functions_and_comprehensions():
    assert safe_eval("sum([x*x for x in range(10)])") == 285
    assert safe_eval("max(3, 1, 2)") == 3
    assert safe_eval("sorted([3, 1, 2])") == [1, 2, 3]
    assert safe_eval("abs(sqrt(16) - 4) < 1e-12") is True
    assert safe_eval("len('hello')") == 5
    assert safe_eval("[x for x in range(10) if x % 2 == 0]") == \
        [0, 2, 4, 6, 8]


def test_safe_exec_programs():
    assert safe_exec("a = 3\nb = 4\n(a*a + b*b) ** 0.5") == 5.0
    assert safe_exec("""
total = 0
for i in range(1, 11):
    total += i
total
""") == 55
    assert safe_exec("x = 10\nif x > 5:\n    y = 'big'\nelse:\n"
                     "    y = 'small'\ny") == "big"


def test_env_variables():
    assert safe_eval("n * 2", {"n": 21}) == 42


# ---- agent tool integration ----

def test_calc_tool_uses_sandbox():
    from neurondb_tpu.service.agent import ToolRegistry
    reg = ToolRegistry()
    assert reg.call("calc", {"expression": "6*7"}) == "42"
    out = reg.call("calc", {"expression": "9**9**9**9"})
    assert out.startswith("error:")
    out = reg.call("calc", {"expression": "__import__('os')"})
    assert out.startswith("error:")


def test_code_tool():
    from neurondb_tpu.service.agent import ToolRegistry
    reg = ToolRegistry()
    assert reg.call("code", {"code": "s = 0\nfor i in range(5):\n"
                                     "    s += i\ns"}) == "10"
    assert reg.call("code", {"code": "open('/etc/passwd')"}).startswith(
        "error:")


def test_http_tool_mockable_with_allowlist():
    from neurondb_tpu.service.agent import ToolRegistry

    def fake_fetch(method, url, body, headers):
        return 200, json.dumps({"method": method, "url": url}).encode()

    reg = ToolRegistry(http_fetcher=fake_fetch,
                       http_allowed_hosts=["api.example.com"])
    out = reg.call("http", {"url": "https://api.example.com/v1/x"})
    assert out.startswith("200\n")
    assert "api.example.com" in out
    # host not in allowlist
    assert reg.call("http", {"url": "https://evil.example.org/"}).startswith(
        "error:")
    # non-http scheme
    assert reg.call("http", {"url": "file:///etc/passwd"}).startswith(
        "error:")


def test_http_tool_absent_without_fetcher_or_allowlist():
    from neurondb_tpu.service.agent import ToolRegistry
    reg = ToolRegistry()
    assert "http" not in reg.names()


def test_tool_validator():
    from neurondb_tpu.service.agent import ToolRegistry
    reg = ToolRegistry()
    # missing required field
    assert reg.call("calc", {}).startswith("error:")
    # wrong type
    assert reg.call("calc", {"expression": 42}).startswith("error:")
    # too large
    assert reg.call("calc", {"expression": "1" * 2000}).startswith("error:")


def test_multi_step_tool_session():
    """Agent session that exercises code + http tools through the
    execute loop (VERDICT r1 item 7 'done' criterion)."""
    import numpy as np
    from neurondb_tpu.service.agent import AgentRuntime, ToolRegistry
    from neurondb_tpu.service.llm import BaseProvider, LLMRouter

    class ToolCallingProvider(BaseProvider):
        name = "scripted"

        def __init__(self):
            self.turn = 0

        def complete(self, prompt, **kw):
            self.turn += 1
            if self.turn == 1:
                return ('first compute: {"tool": "code", "input": '
                        '{"code": "sum([x for x in range(10)])"}} and '
                        'fetch {"tool": "http", "input": '
                        '{"url": "https://api.example.com/data"}}')
            return "final answer: 45"

        def embed(self, texts):
            return np.ones((len(texts), 4), np.float32)

    def fake_fetch(method, url, body, headers):
        return 200, b"payload"

    tools = ToolRegistry(http_fetcher=fake_fetch,
                         http_allowed_hosts=["api.example.com"])
    rt = AgentRuntime(LLMRouter([ToolCallingProvider()]), tools=tools)
    agent = rt.create_agent("worker", tools=["code", "http"])
    sess = rt.create_session(agent.agent_id)
    msg = rt.execute(sess.session_id, "compute and fetch")
    assert msg.content == "final answer: 45"
    results = {c["tool"]: c["result"] for c in msg.tool_calls}
    assert results["code"] == "45"
    assert results["http"].startswith("200")
