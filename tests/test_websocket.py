"""WebSocket endpoint: handshake, framing, agent message roundtrip."""

import base64
import hashlib
import json
import socket

import numpy as np
import pytest

from neurondb_tpu.service.agent import AgentRuntime
from neurondb_tpu.service.llm import BaseProvider, LLMRouter
from neurondb_tpu.service.rest import RESTServer
from neurondb_tpu.service.websocket import (OP_CLOSE, OP_TEXT, accept_key,
                                            decode_frame, encode_frame)


class EchoProvider(BaseProvider):
    name = "echo"

    def complete(self, prompt, **kw):
        return "ws-reply"

    def embed(self, texts):
        return np.ones((len(texts), 4), np.float32)


def test_accept_key_rfc_example():
    # RFC 6455 §1.3 worked example
    assert accept_key("dGhlIHNhbXBsZSBub25jZQ==") == \
        "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="


def test_frame_roundtrip_via_socketpair():
    a, b = socket.socketpair()
    try:
        a.sendall(encode_frame(b"hello"))
        # server frames are unmasked; a client read skips the mask check
        op, payload = decode_frame(b, require_mask=False)
        assert op == OP_TEXT and payload == b"hello"
        big = b"x" * 70000      # forces the 64-bit length path
        a.sendall(encode_frame(big))
        op, payload = decode_frame(b, require_mask=False)
        assert payload == big
    finally:
        a.close()
        b.close()


def test_unmasked_client_frame_fails_connection():
    from neurondb_tpu.service.websocket import WSProtocolError
    a, b = socket.socketpair()
    try:
        a.sendall(encode_frame(b"hello"))       # unmasked
        with pytest.raises(WSProtocolError):
            decode_frame(b)                     # server-side read
    finally:
        a.close()
        b.close()


def test_oversize_frame_rejected_before_buffering():
    from neurondb_tpu.service.websocket import (CLOSE_TOO_BIG,
                                                WSProtocolError)
    import struct
    a, b = socket.socketpair()
    try:
        # header claiming an 8 GiB masked payload — must be rejected from
        # the length field alone, no payload ever sent
        hdr = bytes([0x80 | OP_TEXT, 0x80 | 127]) + \
            struct.pack(">Q", 8 << 30) + b"\x00" * 4
        a.sendall(hdr)
        with pytest.raises(WSProtocolError) as ei:
            decode_frame(b)
        assert ei.value.code == CLOSE_TOO_BIG
    finally:
        a.close()
        b.close()


def _mask(payload: bytes, mask: bytes) -> bytes:
    return bytes(c ^ mask[i % 4] for i, c in enumerate(payload))


def _client_frame(payload: bytes) -> bytes:
    mask = b"\x01\x02\x03\x04"
    head = bytes([0x80 | OP_TEXT])
    n = len(payload)
    assert n < 126
    head += bytes([0x80 | n]) + mask
    return head + _mask(payload, mask)


def test_ws_agent_roundtrip():
    rt = AgentRuntime(LLMRouter([EchoProvider()]))
    agent = rt.create_agent("ws-bot")
    sess = rt.create_session(agent.agent_id)
    srv = RESTServer(rt, port=0)
    port = srv.start()
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=10)
        key = base64.b64encode(b"0123456789abcdef").decode()
        s.sendall((f"GET /ws HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                   f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
                   f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
        # read the 101 response headers
        buf = b""
        while b"\r\n\r\n" not in buf:
            buf += s.recv(1024)
        assert b"101" in buf.split(b"\r\n")[0]
        assert accept_key(key).encode() in buf
        # send a message, expect assistant reply + done
        s.sendall(_client_frame(json.dumps(
            {"session_id": sess.session_id, "content": "hi"}).encode()))
        op, payload = decode_frame(s, require_mask=False)
        msg = json.loads(payload.decode())
        assert msg["type"] == "message"
        assert msg["content"] == "ws-reply"
        op, payload = decode_frame(s, require_mask=False)
        assert json.loads(payload.decode())["type"] == "done"
        # close handshake
        s.sendall(bytes([0x80 | OP_CLOSE, 0x80]) + b"\x00\x00\x00\x00")
        op, _ = decode_frame(s, require_mask=False)
        assert op == OP_CLOSE
        s.close()
    finally:
        srv.stop()


def test_ws_requires_auth_when_keys_configured():
    """/ws must be behind the API-key check (NeuronAgent mounts /ws under
    AuthMiddleware, cmd/agent-server/main.go:94). Header or ?key= works;
    no key -> 401 before any upgrade."""
    from neurondb_tpu.service.agent import APIKeyAuth
    rt = AgentRuntime(LLMRouter([EchoProvider()]))
    agent = rt.create_agent("ws-bot")
    sess = rt.create_session(agent.agent_id)
    auth = APIKeyAuth()
    api_key = auth.issue("user")
    srv = RESTServer(rt, port=0, auth=auth)
    port = srv.start()
    try:
        # no key -> 401, no 101 upgrade
        s = socket.create_connection(("127.0.0.1", port), timeout=10)
        key = base64.b64encode(b"0123456789abcdef").decode()
        s.sendall((f"GET /ws HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                   f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
                   f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
        buf = b""
        while b"\r\n\r\n" not in buf:
            buf += s.recv(1024)
        assert b"401" in buf.split(b"\r\n")[0]
        s.close()
        # key as query param (browser WS clients can't set headers) -> 101
        s = socket.create_connection(("127.0.0.1", port), timeout=10)
        s.sendall((f"GET /ws?key={api_key} HTTP/1.1\r\nHost: x\r\n"
                   f"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                   f"Sec-WebSocket-Key: {key}\r\n"
                   f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
        buf = b""
        while b"\r\n\r\n" not in buf:
            buf += s.recv(1024)
        assert b"101" in buf.split(b"\r\n")[0]
        s.sendall(_client_frame(json.dumps(
            {"session_id": sess.session_id, "content": "hi"}).encode()))
        op, payload = decode_frame(s, require_mask=False)
        assert json.loads(payload.decode())["type"] == "message"
        s.close()
    finally:
        srv.stop()
