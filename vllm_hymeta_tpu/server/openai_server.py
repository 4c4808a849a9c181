"""OpenAI-compatible HTTP server (stdlib-only; no extra deps).

Mirrors the endpoint surface the reference serves through vLLM
(`readme.md:144-152`, `test_vllm/call_api.py:33-46`):
  POST /v1/completions        {model, prompt, max_tokens, temperature, ...}
  POST /v1/chat/completions   {model, messages, ...}
  GET  /v1/models
  GET  /health

A background scheduler thread drives Engine.step() continuously
(continuous batching across concurrent HTTP requests); handler threads
enqueue requests and wait on per-request events.
"""

from __future__ import annotations

import json
import queue
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict

from vllm_hymeta_tpu.engine.sampler import SamplingParams


class ServingEngine:
    """Thread-safe wrapper: one engine-stepping thread, many submitters."""

    def __init__(self, engine, tokenizer=None, model_name: str = "hymeta"):
        from vllm_hymeta_tpu.engine.metrics import EngineMetrics
        self.engine = engine
        self.metrics = EngineMetrics(engine)
        self.tokenizer = tokenizer
        self.model_name = model_name
        self.lock = threading.Lock()
        self.events: Dict[int, threading.Event] = {}
        self.results: Dict[int, object] = {}
        # rid -> [request_obj, queue, n_tokens_already_pushed]
        self.streams: Dict[int, list] = {}
        # rid -> request_obj for requests with stop strings (checked by
        # incremental decode each loop; needs a tokenizer)
        self.stop_watch: Dict[int, object] = {}
        self.running = True
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def _check_stop_strings(self):
        """Stop-string enforcement (vLLM `stop`): scan each watched
        request for the first match; generation is cancelled and the
        response text truncated before the match.  Requests that finished
        THIS step (eos/length landing in the same decode block) are still
        scanned so a stop string inside the final block truncates.
        Caller holds the lock."""
        if not self.stop_watch:
            return []
        hit = []
        for rid, req in list(self.stop_watch.items()):
            if self.tokenizer is None:
                # token-id-only server: stop strings can't be checked —
                # drop the watch entry (no leak); stop_token_ids still
                # apply in the engine
                if req.finished:
                    self.stop_watch.pop(rid, None)
                continue
            if not req.output:
                if req.finished:
                    self.stop_watch.pop(rid, None)
                continue
            # bounded tail decode: a stop string of L chars spans at most
            # L tokens, so scanning the last (L + 8)-token tail each step
            # is O(1) per step instead of O(n) full re-decodes; the full
            # decode only runs on a hit to compute the truncation point
            max_len = max(len(x) for x in (req.params.stop or [""]))
            tail_ids = req.output[-(max_len + 8):]
            tail = self.tokenizer.decode(tail_ids)
            matched = next((x for x in (req.params.stop or ())
                            if x in tail), None)
            if matched is not None:
                text = self.tokenizer.decode(req.output)
                i = text.find(matched)
                if i >= 0:
                    was_finished = req.finished
                    if not was_finished:
                        self.engine.cancel_request(rid, "stop")
                    req.finish_reason = "stop"
                    req.stop_text = text[:i]
                    self.stop_watch.pop(rid, None)
                    if not was_finished:
                        # finished here, not by step(): deliver it
                        hit.append(req)
                    continue
            if req.finished:
                self.stop_watch.pop(rid, None)
        return hit

    def _loop(self):
        while self.running:
            with self.lock:
                has_work = self.engine.has_work()
                finished = self.engine.step() if has_work else []
                finished = list(finished) + self._check_stop_strings()
                stream_items = list(self.streams.items())
            for rid, st in stream_items:
                req, q, sent = st
                out = list(req.output)
                for tok in out[sent:]:
                    q.put(("token", tok))
                st[2] = len(out)
                if req.finished:
                    q.put(("done", req))
                    with self.lock:
                        self.streams.pop(rid, None)
            for req in finished:
                if req.req_id in self.results or req.req_id in self.events:
                    self.results[req.req_id] = req
                    ev = self.events.pop(req.req_id, None)
                    if ev:
                        ev.set()
            if not has_work:
                time.sleep(0.005)

    def submit(self, prompt_tokens, params: SamplingParams, timeout=600.0):
        return self.submit_many(prompt_tokens, params, 1, timeout)[0]

    def submit_many(self, prompt_tokens, params: SamplingParams,
                    count: int, timeout=600.0):
        """Enqueue `count` copies of one prompt (vLLM n/best_of parallel
        sampling — they batch through the engine, sharing the prompt via
        the prefix cache when enabled) and wait for all."""
        evs = []
        with self.lock:
            for _ in range(count):
                rid = self.engine.add_request(list(prompt_tokens), params)
                if params.stop:
                    self.stop_watch[rid] = self.engine.waiting[-1]
                ev = threading.Event()
                self.events[rid] = ev
                evs.append((rid, ev))
        out = []
        for rid, ev in evs:
            if not ev.wait(timeout):
                raise TimeoutError(f"request {rid} timed out")
            out.append(self.results.pop(rid))
        return out

    def submit_stream(self, prompt_tokens, params: SamplingParams):
        """Enqueue a request and return a queue of ("token", id) items
        followed by one ("done", request)."""
        q: "queue.Queue" = queue.Queue()
        with self.lock:
            rid = self.engine.add_request(prompt_tokens, params)
            req = self.engine.waiting[-1]
            assert req.req_id == rid
            if params.stop:
                self.stop_watch[rid] = req
            self.streams[rid] = [req, q, 0]
        return q

    def shutdown(self):
        self.running = False
        self.thread.join(timeout=5)


def _select_best_of(reqs, params):
    """Keep the n best candidates by mean token logprob when
    best_of > n (falls back to arrival order without logprobs)."""
    if params.best_of and params.best_of > params.n:
        def score(r):
            return (sum(r.logprobs) / max(len(r.logprobs), 1)
                    if r.logprobs else 0.0)
        return sorted(reqs, key=score, reverse=True)[:params.n]
    return reqs


def _params_from_body(body: dict) -> SamplingParams:
    stop = body.get("stop")
    if isinstance(stop, str):
        stop = [stop]
    lp = body.get("logprobs")
    return SamplingParams(
        n=int(body.get("n", 1)),
        best_of=int(body["best_of"]) if body.get("best_of") else None,
        temperature=float(body.get("temperature", 1.0)),
        top_p=float(body.get("top_p", 1.0)),
        top_k=int(body.get("top_k", 0)),
        repetition_penalty=float(body.get("repetition_penalty", 1.0)),
        max_tokens=int(body.get("max_tokens", 128)),
        ignore_eos=bool(body.get("ignore_eos", False)),
        stop=stop,
        stop_token_ids=body.get("stop_token_ids"),
        logprobs=int(lp) if lp else 0,
    )


def make_handler(serving: ServingEngine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj: dict):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok"})
            elif self.path == "/metrics":
                self._json(200, serving.metrics.to_dict())
            elif self.path == "/v1/models":
                self._json(200, {"object": "list", "data": [{
                    "id": serving.model_name, "object": "model",
                    "owned_by": "vllm-hymeta-tpu"}]})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/v1/completions":
                    self._completions(body)
                elif self.path == "/v1/chat/completions":
                    self._chat(body)
                else:
                    self._json(404, {"error": "not found"})
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": str(e)})

        def _encode(self, text):
            tok = serving.tokenizer
            if tok is None:
                raise ValueError("no tokenizer loaded; pass token ids "
                                 "via 'prompt_token_ids'")
            return tok.encode(text)

        def _decode(self, ids):
            tok = serving.tokenizer
            return tok.decode(ids) if tok is not None else None

        def _sse_start(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()

        def _sse_send(self, obj):
            self.wfile.write(b"data: " + json.dumps(obj).encode() + b"\n\n")
            self.wfile.flush()

        def _stream(self, ids, body: dict, chat: bool):
            """SSE streaming for completions/chat (OpenAI `stream: true`)."""
            q = serving.submit_stream(ids, _params_from_body(body))
            self._sse_start()
            rid = (f"chatcmpl-{uuid.uuid4().hex[:24]}" if chat
                   else f"cmpl-{uuid.uuid4().hex[:24]}")
            created = int(time.time())
            out_ids, prev_text = [], ""
            while True:
                kind, val = q.get()
                if kind == "done":
                    finish = val.finish_reason
                    delta = ({"delta": {}} if chat else {"text": ""})
                    self._sse_send({
                        "id": rid, "created": created,
                        "object": ("chat.completion.chunk" if chat
                                   else "text_completion"),
                        "model": serving.model_name,
                        "choices": [{"index": 0, **delta,
                                     "finish_reason": finish}]})
                    self.wfile.write(b"data: [DONE]\n\n")
                    self.wfile.flush()
                    return
                out_ids.append(val)
                text = self._decode(out_ids)
                piece = (text[len(prev_text):] if text is not None else "")
                if text is not None:
                    prev_text = text
                if chat:
                    delta = {"delta": {"role": "assistant",
                                       "content": piece,
                                       "token_ids": [val]}}
                else:
                    delta = {"text": piece, "token_ids": [val]}
                self._sse_send({
                    "id": rid, "created": created,
                    "object": ("chat.completion.chunk" if chat
                               else "text_completion"),
                    "model": serving.model_name,
                    "choices": [{"index": 0, **delta,
                                 "finish_reason": None}]})

        def _completions(self, body: dict):
            if "prompt_token_ids" in body:
                ids = list(body["prompt_token_ids"])
            else:
                prompt = body.get("prompt", "")
                if isinstance(prompt, list):
                    prompt = prompt[0]
                ids = self._encode(prompt)
            params = _params_from_body(body)
            if body.get("stream"):
                if max(params.n, params.best_of or 1) > 1:
                    return self._json(400, {
                        "error": "stream with n/best_of > 1 unsupported"})
                return self._stream(ids, body, chat=False)
            if params.best_of and params.best_of < params.n:
                return self._json(400, {
                    "error": "best_of must be >= n"})
            count = max(params.n, params.best_of or 1)
            all_reqs = serving.submit_many(ids, params, count)
            reqs = _select_best_of(all_reqs, params)
            choices = []
            for i, req in enumerate(reqs):
                text = getattr(req, "stop_text", None)
                if text is None:
                    text = self._decode(req.output)
                choice = {
                    "index": i,
                    "text": text if text is not None else "",
                    "token_ids": req.output,
                    "finish_reason": req.finish_reason,
                }
                if req.logprobs:
                    tok = serving.tokenizer
                    choice["logprobs"] = {
                        "token_logprobs": req.logprobs,
                        "top_logprobs": [
                            {str(k): v for k, v in d.items()}
                            for d in req.top_logprobs],
                        # decoded token pieces when a tokenizer exists
                        # (OpenAI schema), id strings otherwise
                        "tokens": ([tok.decode([t]) for t in req.output]
                                   if tok is not None
                                   else [str(t) for t in req.output]),
                    }
                choices.append(choice)
            req = reqs[0]
            self._json(200, {
                "id": f"cmpl-{uuid.uuid4().hex[:24]}",
                "object": "text_completion",
                "created": int(time.time()),
                "model": serving.model_name,
                "choices": choices,
                "usage": {
                    # all generated candidates count, incl. best_of
                    # discards (OpenAI bills the discarded completions)
                    "prompt_tokens": len(ids),
                    "completion_tokens": sum(
                        len(r.output) for r in all_reqs),
                    "total_tokens": len(ids) + sum(
                        len(r.output) for r in all_reqs),
                },
            })

        def _chat(self, body: dict):
            msgs = body.get("messages", [])
            tok = serving.tokenizer
            if tok is not None and hasattr(tok, "apply_chat_template"):
                ids = tok.apply_chat_template(msgs,
                                              add_generation_prompt=True)
            else:
                text = "\n".join(f"{m.get('role')}: {m.get('content')}"
                                 for m in msgs) + "\nassistant:"
                ids = self._encode(text)
            params = _params_from_body(body)
            if body.get("stream"):
                if max(params.n, params.best_of or 1) > 1:
                    return self._json(400, {
                        "error": "stream with n/best_of > 1 unsupported"})
                return self._stream(list(ids), body, chat=True)
            count = max(params.n, params.best_of or 1)
            reqs = serving.submit_many(list(ids), params, count)
            reqs = _select_best_of(reqs, params)
            choices = []
            for i, req in enumerate(reqs):
                text = getattr(req, "stop_text", None)
                if text is None:
                    text = self._decode(req.output)
                choices.append({
                    "index": i,
                    "message": {"role": "assistant",
                                "content": text if text is not None else "",
                                "token_ids": req.output},
                    "finish_reason": req.finish_reason,
                })
            self._json(200, {
                "id": f"chatcmpl-{uuid.uuid4().hex[:24]}",
                "object": "chat.completion",
                "created": int(time.time()),
                "model": serving.model_name,
                "choices": choices,
            })

    return Handler


def serve(engine, tokenizer=None, host: str = "0.0.0.0", port: int = 8000,
          model_name: str = "hymeta"):
    serving = ServingEngine(engine, tokenizer, model_name)
    httpd = ThreadingHTTPServer((host, port), make_handler(serving))
    try:
        httpd.serve_forever()
    finally:
        serving.shutdown()
