"""Engine observability: step timing, token counters, throughput — the
metrics layer the reference left to vLLM's logging (SURVEY.md §5 lists
none in-repo; timing there is manual time.time() in bench scripts)."""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Deque, Dict


@dataclasses.dataclass
class Snapshot:
    requests_completed: int = 0
    prompt_tokens: int = 0
    generated_tokens: int = 0
    prefill_steps: int = 0
    decode_steps: int = 0
    prefill_time_s: float = 0.0
    decode_time_s: float = 0.0
    ttft_sum_s: float = 0.0
    ttft_count: int = 0
    e2e_sum_s: float = 0.0

    def to_dict(self) -> Dict:
        d = dataclasses.asdict(self)
        d["prefill_tokens_per_s"] = (
            self.prompt_tokens / self.prefill_time_s
            if self.prefill_time_s > 0 else 0.0)
        d["decode_tokens_per_s"] = (
            self.generated_tokens / self.decode_time_s
            if self.decode_time_s > 0 else 0.0)
        d["mean_ttft_s"] = (self.ttft_sum_s / self.ttft_count
                            if self.ttft_count else 0.0)
        d["mean_e2e_s"] = (self.e2e_sum_s / self.requests_completed
                           if self.requests_completed else 0.0)
        return d


class EngineMetrics:
    """Attach to an Engine: wraps step() to time prefill/decode phases and
    tally tokens.  Window keeps the last N step durations for p50/p99."""

    def __init__(self, engine, window: int = 512):
        self.engine = engine
        self.snap = Snapshot()
        self.recent_decode_ms: Deque[float] = deque(maxlen=window)
        self.recent_prefill_ms: Deque[float] = deque(maxlen=window)
        self._orig_step = engine.step
        engine.step = self._timed_step

    def _timed_step(self):
        eng = self.engine
        pre_pending = any(r.prefill_done < len(r.prompt)
                          for r in eng.slot_req.values()) or bool(eng.waiting)
        t0 = time.perf_counter()
        finished = self._orig_step()
        dt = time.perf_counter() - t0
        if pre_pending:
            self.snap.prefill_steps += 1
            self.snap.prefill_time_s += dt
            self.recent_prefill_ms.append(dt * 1000)
        else:
            self.snap.decode_steps += 1
            self.snap.decode_time_s += dt
            self.recent_decode_ms.append(dt * 1000)
        for req in finished:
            self.snap.requests_completed += 1
            self.snap.prompt_tokens += len(req.prompt)
            self.snap.generated_tokens += len(req.output)
            if req.t_first_token is not None:
                self.snap.ttft_sum_s += req.t_first_token - req.t_arrival
                self.snap.ttft_count += 1
            self.snap.e2e_sum_s += time.time() - req.t_arrival
        return finished

    def to_dict(self) -> Dict:
        d = self.snap.to_dict()
        for name, buf in (("decode_step_ms", self.recent_decode_ms),
                          ("prefill_step_ms", self.recent_prefill_ms)):
            if buf:
                xs = sorted(buf)
                d[f"{name}_p50"] = xs[len(xs) // 2]
                d[f"{name}_p99"] = xs[min(len(xs) - 1,
                                          int(len(xs) * 0.99))]
        return d
