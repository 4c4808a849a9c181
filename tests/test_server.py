"""OpenAI-compatible server tests (in-process HTTP over a tiny model)."""

import http.client
import json
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
from vllm_hymeta_tpu.models import gla_swa
from vllm_hymeta_tpu.server.openai_server import (ServingEngine,
                                                  make_handler)
from tests.test_models import tiny_glaswa


@pytest.fixture(scope="module")
def server():
    from http.server import ThreadingHTTPServer
    cfg = tiny_glaswa()
    params = gla_swa.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.float32)
    eng = Engine(cfg, params, EngineConfig(
        max_num_seqs=2, max_model_len=128, prefill_chunk=16,
        prefill_buckets=(16,), decode_block=4))
    serving = ServingEngine(eng, tokenizer=None, model_name="tiny")
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(serving))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port
    httpd.shutdown()
    serving.shutdown()


def _post(port, path, body):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request("POST", path, json.dumps(body),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    return r.status, json.loads(r.read())


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", path)
    r = conn.getresponse()
    return r.status, json.loads(r.read())


class TestServer:
    def test_health_and_models(self, server):
        st, body = _get(server, "/health")
        assert st == 200 and body["status"] == "ok"
        st, body = _get(server, "/v1/models")
        assert st == 200 and body["data"][0]["id"] == "tiny"

    def test_completion_with_token_ids(self, server):
        st, body = _post(server, "/v1/completions", {
            "prompt_token_ids": [1, 2, 3, 4, 5],
            "max_tokens": 4, "temperature": 0.0, "ignore_eos": True})
        assert st == 200, body
        ch = body["choices"][0]
        assert len(ch["token_ids"]) == 4
        assert body["usage"]["completion_tokens"] == 4

    def test_concurrent_requests(self, server):
        results = []

        def hit(seed):
            st, body = _post(server, "/v1/completions", {
                "prompt_token_ids": list(range(1 + seed, 8 + seed)),
                "max_tokens": 3, "temperature": 0.0, "ignore_eos": True})
            results.append((st, body))

        ts = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        assert len(results) == 3
        for st, body in results:
            assert st == 200
            assert len(body["choices"][0]["token_ids"]) == 3

    def test_string_prompt_without_tokenizer_errors(self, server):
        st, body = _post(server, "/v1/completions", {
            "prompt": "hello", "max_tokens": 2})
        assert st == 500 and "tokenizer" in body["error"]

    def test_streaming_completion(self, server):
        conn = http.client.HTTPConnection("127.0.0.1", server, timeout=300)
        conn.request("POST", "/v1/completions", json.dumps({
            "prompt_token_ids": [1, 2, 3, 4, 5], "max_tokens": 5,
            "temperature": 0.0, "ignore_eos": True, "stream": True}),
            {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        assert r.getheader("Content-Type") == "text/event-stream"
        chunks, done = [], False
        for raw in r.read().decode().split("\n\n"):
            raw = raw.strip()
            if not raw.startswith("data: "):
                continue
            payload = raw[len("data: "):]
            if payload == "[DONE]":
                done = True
                break
            chunks.append(json.loads(payload))
        assert done
        toks = [c["choices"][0]["token_ids"][0] for c in chunks
                if c["choices"][0].get("token_ids")]
        assert len(toks) == 5
        assert chunks[-1]["choices"][0]["finish_reason"] == "length"


class _CharTok:
    """Deterministic toy tokenizer: token t <-> letter chr(97 + t % 26)."""

    def encode(self, s):
        return [ord(c) % 256 for c in s]

    def decode(self, ids):
        return "".join(chr(97 + (t % 26)) for t in ids)


@pytest.fixture(scope="module")
def server_tok():
    from http.server import ThreadingHTTPServer
    cfg = tiny_glaswa()
    params = gla_swa.init_params(cfg, jax.random.PRNGKey(5),
                                 dtype=jnp.float32)
    eng = Engine(cfg, params, EngineConfig(
        max_num_seqs=2, max_model_len=128, prefill_chunk=16,
        prefill_buckets=(16,), decode_block=4, logprobs_topk=4))
    serving = ServingEngine(eng, tokenizer=_CharTok(), model_name="tiny")
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(serving))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port
    httpd.shutdown()
    serving.shutdown()


class TestStopStringsAndLogprobs:
    def test_logprobs_in_response(self, server_tok):
        st, body = _post(server_tok, "/v1/completions", {
            "prompt_token_ids": [3, 4, 5], "max_tokens": 4,
            "temperature": 0.0, "ignore_eos": True, "logprobs": 2})
        assert st == 200, body
        ch = body["choices"][0]
        lp = ch["logprobs"]
        assert len(lp["token_logprobs"]) == 4
        assert all(v <= 0 for v in lp["token_logprobs"])
        # greedy: emitted token is its own top-1
        for tok, top in zip(ch["token_ids"], lp["top_logprobs"]):
            assert str(tok) in top
            assert len(top) == 2

    def test_stop_string_truncates(self, server_tok):
        # probe: full greedy text
        st, probe = _post(server_tok, "/v1/completions", {
            "prompt_token_ids": [7, 8, 9], "max_tokens": 10,
            "temperature": 0.0, "ignore_eos": True})
        assert st == 200
        text = probe["choices"][0]["text"]
        assert len(text) == 10
        stop = text[3]          # single letter appearing at index 3
        first = text.find(stop)
        st, body = _post(server_tok, "/v1/completions", {
            "prompt_token_ids": [7, 8, 9], "max_tokens": 10,
            "temperature": 0.0, "ignore_eos": True, "stop": stop})
        assert st == 200
        ch = body["choices"][0]
        assert ch["finish_reason"] == "stop"
        assert ch["text"] == text[:first]
        assert stop not in ch["text"]

    def test_stop_token_ids_api(self, server_tok):
        st, probe = _post(server_tok, "/v1/completions", {
            "prompt_token_ids": [2, 3], "max_tokens": 6,
            "temperature": 0.0, "ignore_eos": True})
        tok = probe["choices"][0]["token_ids"][2]
        st, body = _post(server_tok, "/v1/completions", {
            "prompt_token_ids": [2, 3], "max_tokens": 16,
            "temperature": 0.0, "ignore_eos": True,
            "stop_token_ids": [tok]})
        assert st == 200
        ch = body["choices"][0]
        assert ch["finish_reason"] == "stop"
        assert ch["token_ids"][-1] == tok


class TestParallelSampling:
    def test_n_choices(self, server_tok):
        st, body = _post(server_tok, "/v1/completions", {
            "prompt_token_ids": [11, 12, 13], "max_tokens": 4,
            "temperature": 0.8, "seed": 0, "ignore_eos": True, "n": 3})
        assert st == 200, body
        ch = body["choices"]
        assert len(ch) == 3
        assert [c["index"] for c in ch] == [0, 1, 2]
        assert all(len(c["token_ids"]) == 4 for c in ch)

    def test_best_of_ranks_by_logprob(self, server_tok):
        st, body = _post(server_tok, "/v1/completions", {
            "prompt_token_ids": [21, 22], "max_tokens": 4,
            "temperature": 1.0, "ignore_eos": True,
            "n": 2, "best_of": 4, "logprobs": 1})
        assert st == 200, body
        ch = body["choices"]
        assert len(ch) == 2
        means = [sum(c["logprobs"]["token_logprobs"]) /
                 len(c["logprobs"]["token_logprobs"]) for c in ch]
        assert means[0] >= means[1]


class TestReviewFixes:
    def test_stop_string_in_final_block_truncates(self, server_tok):
        """A stop match landing in the same step the request finishes
        (max_tokens in this case) must still truncate the text and report
        finish_reason=stop."""
        st, probe = _post(server_tok, "/v1/completions", {
            "prompt_token_ids": [31, 32, 33], "max_tokens": 3,
            "temperature": 0.0, "ignore_eos": True})
        text = probe["choices"][0]["text"]
        stop = text[1]          # inside the single decode block
        st, body = _post(server_tok, "/v1/completions", {
            "prompt_token_ids": [31, 32, 33], "max_tokens": 3,
            "temperature": 0.0, "ignore_eos": True, "stop": stop})
        ch = body["choices"][0]
        assert ch["finish_reason"] == "stop"
        assert ch["text"] == text[:text.find(stop)]

    def test_chat_n_choices(self, server_tok):
        st, body = _post(server_tok, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "abc"}],
            "max_tokens": 3, "temperature": 0.9, "ignore_eos": True,
            "n": 2})
        assert st == 200, body
        assert len(body["choices"]) == 2

    def test_best_of_less_than_n_rejected(self, server_tok):
        st, body = _post(server_tok, "/v1/completions", {
            "prompt_token_ids": [1, 2], "max_tokens": 2,
            "n": 3, "best_of": 2})
        assert st == 400

    def test_logprobs_tokens_decoded(self, server_tok):
        st, body = _post(server_tok, "/v1/completions", {
            "prompt_token_ids": [3, 4, 5], "max_tokens": 3,
            "temperature": 0.0, "ignore_eos": True, "logprobs": 1})
        lp = body["choices"][0]["logprobs"]
        ids = body["choices"][0]["token_ids"]
        # _CharTok decodes token t to chr(97 + t % 26)
        assert lp["tokens"] == [chr(97 + (t % 26)) for t in ids]


class TestRound4ServerHardening:
    def test_stream_n2(self, server_tok):
        """`stream` with n > 1: choice-indexed chunks, one finish each."""
        conn = http.client.HTTPConnection("127.0.0.1", server_tok,
                                          timeout=300)
        conn.request("POST", "/v1/completions", json.dumps({
            "prompt_token_ids": [5, 6, 7], "max_tokens": 3,
            "temperature": 0.7, "ignore_eos": True, "stream": True,
            "n": 2}), {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        finishes, toks = {}, {0: [], 1: []}
        for raw in r.read().decode().split("\n\n"):
            raw = raw.strip()
            if not raw.startswith("data: ") or raw == "data: [DONE]":
                continue
            c = json.loads(raw[len("data: "):])["choices"][0]
            if c["finish_reason"]:
                finishes[c["index"]] = c["finish_reason"]
            elif c.get("token_ids"):
                toks[c["index"]].extend(c["token_ids"])
        assert finishes == {0: "length", 1: "length"}
        assert len(toks[0]) == 3 and len(toks[1]) == 3

    def test_stream_stop_string_holdback(self, server_tok):
        """Streaming with a stop string never emits the stop string or
        text past it (vLLM-style holdback)."""
        st, probe = _post(server_tok, "/v1/completions", {
            "prompt_token_ids": [41, 42, 43], "max_tokens": 8,
            "temperature": 0.0, "ignore_eos": True})
        text = probe["choices"][0]["text"]
        stop = text[4]
        conn = http.client.HTTPConnection("127.0.0.1", server_tok,
                                          timeout=300)
        conn.request("POST", "/v1/completions", json.dumps({
            "prompt_token_ids": [41, 42, 43], "max_tokens": 8,
            "temperature": 0.0, "ignore_eos": True, "stream": True,
            "stop": stop}), {"Content-Type": "application/json"})
        r = conn.getresponse()
        got = ""
        finish = None
        for raw in r.read().decode().split("\n\n"):
            raw = raw.strip()
            if not raw.startswith("data: ") or raw == "data: [DONE]":
                continue
            c = json.loads(raw[len("data: "):])["choices"][0]
            got += c.get("text", "")
            if c["finish_reason"]:
                finish = c["finish_reason"]
        assert finish == "stop"
        assert got == text[:text.find(stop)]
        assert stop not in got

    def test_stream_disconnect_frees_slot(self):
        """Dropping the SSE connection cancels the request: the engine
        slot frees long before max_tokens (VERDICT r3: a dead client
        must not hold a slot)."""
        import socket as _socket
        import time as _time
        from http.server import ThreadingHTTPServer
        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(7),
                                     dtype=jnp.float32)
        eng = Engine(cfg, params, EngineConfig(
            max_num_seqs=2, max_model_len=100100, prefill_chunk=16,
            prefill_buckets=(16,), decode_block=4))
        serving = ServingEngine(eng, tokenizer=_CharTok())
        httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                    make_handler(serving))
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            body = json.dumps({
                "prompt_token_ids": [9, 8, 7], "max_tokens": 100000,
                "temperature": 0.0, "ignore_eos": True,
                "stream": True}).encode()
            sock = _socket.create_connection(("127.0.0.1", port),
                                             timeout=300)
            sock.sendall(
                b"POST /v1/completions HTTP/1.1\r\n"
                b"Host: x\r\nContent-Type: application/json\r\n"
                b"Content-Length: " + str(len(body)).encode()
                + b"\r\n\r\n" + body)
            sock.recv(256)        # receive a chunk, then drop the socket
            sock.shutdown(_socket.SHUT_RDWR)
            sock.close()
            # the serving loop hits the broken pipe on a later write and
            # cancels; the slot must free well before 100k tokens
            deadline = _time.time() + 120
            while _time.time() < deadline:
                with serving.lock:
                    busy = bool(eng.slot_req) or bool(eng.waiting)
                if not busy:
                    break
                _time.sleep(0.25)
            else:
                raise AssertionError("slot still busy after disconnect")
        finally:
            httpd.shutdown()
            serving.shutdown()

    def test_best_of_without_logprob_capture_rejected(self):
        """A server without logprob capture must reject best_of > n."""
        from http.server import ThreadingHTTPServer
        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(6),
                                     dtype=jnp.float32)
        eng = Engine(cfg, params, EngineConfig(
            max_num_seqs=2, max_model_len=64, prefill_chunk=16,
            prefill_buckets=(16,), decode_block=4, logprobs_topk=0))
        serving = ServingEngine(eng, tokenizer=_CharTok())
        httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                    make_handler(serving))
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            st, body = _post(port, "/v1/completions", {
                "prompt_token_ids": [1, 2], "max_tokens": 2,
                "n": 1, "best_of": 3})
            assert st == 400 and "logprob" in body["error"]
        finally:
            httpd.shutdown()
            serving.shutdown()
