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
        Uses the shared char-bounded scanner (engine.api.scan_stop_strings)
        so matches can't slip past decode blocks or empty-decoding tokens.
        Caller holds the lock."""
        if not self.stop_watch:
            return []
        from vllm_hymeta_tpu.engine.api import scan_stop_strings
        hit = []
        for rid, st in list(self.stop_watch.items()):
            req, scanned = st
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
            new = len(req.output) - scanned
            st[1] = len(req.output)
            matched, prefix = scan_stop_strings(
                self.tokenizer, req.output, req.params.stop or (), new)
            if matched is not None:
                was_finished = req.finished
                if not was_finished:
                    self.engine.cancel_request(rid, "stop")
                req.finish_reason = "stop"
                req.stop_text = prefix
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
                req, q, sent, idx = st
                out = list(req.output)
                for tok in out[sent:]:
                    q.put((idx, "token", tok))
                st[2] = len(out)
                if req.finished:
                    q.put((idx, "done", req))
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
                    self.stop_watch[rid] = [self.engine.waiting[-1], 0]
                ev = threading.Event()
                self.events[rid] = ev
                evs.append((rid, ev))
        out = []
        for rid, ev in evs:
            if not ev.wait(timeout):
                raise TimeoutError(f"request {rid} timed out")
            out.append(self.results.pop(rid))
        return out

    def submit_stream(self, prompt_tokens, params: SamplingParams,
                      count: int = 1):
        """Enqueue `count` requests for one prompt and return a single
        queue of (choice_idx, "token", id) items, with one
        (choice_idx, "done", request) per choice (`stream` + n > 1)."""
        q: "queue.Queue" = queue.Queue()
        rids = []
        with self.lock:
            for i in range(count):
                rid = self.engine.add_request(list(prompt_tokens), params)
                req = self.engine.waiting[-1]
                assert req.req_id == rid
                if params.stop:
                    self.stop_watch[rid] = [req, 0]
                self.streams[rid] = [req, q, 0, i]
                rids.append(rid)
        return q, rids

    def cancel(self, rids):
        """Abort in-flight requests (client disconnect): frees the slots
        within one engine step instead of generating to max_tokens."""
        with self.lock:
            for rid in rids:
                self.engine.cancel_request(rid, "abort")
                self.streams.pop(rid, None)
                self.stop_watch.pop(rid, None)
                self.events.pop(rid, None)

    def shutdown(self):
        self.running = False
        self.thread.join(timeout=5)


def _select_best_of(reqs, params):
    """Keep the n best candidates by CUMULATIVE logprob when best_of > n
    (vLLM ranking semantics).  Callers guarantee logprob capture — the
    handlers reject best_of > n when the engine can't score candidates
    (ADVICE r3: silent arrival-order selection returned arbitrary
    completions)."""
    if params.best_of and params.best_of > params.n:
        def score(r):
            return sum(r.logprobs) if r.logprobs else 0.0
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


def _validate_params(serving, params, body):
    """Request validation shared by completions/chat; returns an error
    string or None."""
    if params.best_of and params.best_of < params.n:
        return "best_of must be >= n"
    if (params.best_of and params.best_of > params.n
            and serving.engine.ecfg.logprobs_topk <= 0):
        return ("best_of > n requires the server to capture logprobs "
                "(start with logprobs_topk >= 1)")
    return None


def _maybe_force_logprobs(params):
    """best_of ranking needs per-token logprobs even when the client
    didn't ask for them."""
    if params.best_of and params.best_of > params.n and params.logprobs <= 0:
        import dataclasses
        return dataclasses.replace(params, logprobs=1)
    return params


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
            """SSE streaming for completions/chat (OpenAI `stream: true`).

            Supports n > 1 (choice-indexed chunks from one multiplexed
            queue).  With stop strings, text is emitted with a
            (max_stop_len - 1)-char holdback so clients never see a stop
            string or text past it (vLLM-style); the holdback flushes on
            finish, truncated at the match.  A failed socket write cancels
            the engine requests (a dead client must not hold slots to
            max_tokens)."""
            params = _params_from_body(body)
            n = max(params.n, params.best_of or 1)
            q, rids = serving.submit_stream(ids, params, n)
            self._sse_start()
            rid = (f"chatcmpl-{uuid.uuid4().hex[:24]}" if chat
                   else f"cmpl-{uuid.uuid4().hex[:24]}")
            created = int(time.time())
            obj = "chat.completion.chunk" if chat else "text_completion"
            stops = params.stop or []
            hold = max((len(s) for s in stops), default=1) - 1
            out_ids = [[] for _ in range(n)]
            emitted = [0] * n          # chars already sent per choice
            done = 0

            def chunk(i, piece, tok_list, finish):
                if chat:
                    delta = {"delta": ({"role": "assistant",
                                        "content": piece,
                                        "token_ids": tok_list}
                                       if finish is None else {})}
                else:
                    delta = {"text": piece, "token_ids": tok_list}
                return {"id": rid, "created": created, "object": obj,
                        "model": serving.model_name,
                        "choices": [{"index": i, **delta,
                                     "finish_reason": finish}]}

            finished = set()
            try:
                while done < n:
                    i, kind, val = q.get()
                    if i in finished:
                        continue
                    if kind == "done":
                        done += 1
                        finished.add(i)
                        text = getattr(val, "stop_text", None)
                        if text is None:
                            text = self._decode(out_ids[i]) or ""
                        piece = text[emitted[i]:]
                        self._sse_send(chunk(i, piece, [],
                                             val.finish_reason))
                        continue
                    out_ids[i].append(val)
                    text = self._decode(out_ids[i])
                    if text is None:
                        self._sse_send(chunk(i, "", [val], None))
                        continue
                    if stops:
                        # handler-side stop detection: the serving loop's
                        # scanner is asynchronous, so the handler must
                        # not emit past a match itself
                        m = min((text.find(s) for s in stops
                                 if s in text), default=-1)
                        if m >= 0:
                            done += 1
                            finished.add(i)
                            serving.cancel([rids[i]])
                            self._sse_send(chunk(i, text[emitted[i]:m],
                                                 [], "stop"))
                            continue
                    # holdback: never emit the trailing chars a stop
                    # string could still complete into
                    safe = len(text) - hold if stops else len(text)
                    if safe > emitted[i]:
                        piece = text[emitted[i]:safe]
                        emitted[i] = safe
                        self._sse_send(chunk(i, piece, [val], None))
                    elif not stops:
                        self._sse_send(chunk(i, "", [val], None))
                self.wfile.write(b"data: [DONE]\n\n")
                self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError, OSError):
                serving.cancel(rids)

        def _completions(self, body: dict):
            if "prompt_token_ids" in body:
                ids = list(body["prompt_token_ids"])
            else:
                prompt = body.get("prompt", "")
                if isinstance(prompt, list):
                    prompt = prompt[0]
                ids = self._encode(prompt)
            params = _params_from_body(body)
            err = _validate_params(serving, params, body)
            if err is not None:
                return self._json(400, {"error": err})
            if body.get("stream"):
                if params.best_of and params.best_of > params.n:
                    return self._json(400, {
                        "error": "stream with best_of > n unsupported"})
                return self._stream(ids, body, chat=False)
            lp_requested = params.logprobs > 0
            params = _maybe_force_logprobs(params)
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
                if req.logprobs and lp_requested:
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
            err = _validate_params(serving, params, body)
            if err is not None:
                return self._json(400, {"error": err})
            if body.get("stream"):
                if params.best_of and params.best_of > params.n:
                    return self._json(400, {
                        "error": "stream with best_of > n unsupported"})
                return self._stream(list(ids), body, chat=True)
            params = _maybe_force_logprobs(params)
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
