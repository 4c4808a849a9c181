"""Generative evaluation: engine-driven generation + answer matching —
the mechanism behind the reference's "gen" opencompass variants
(GSM8K/NQ/TriviaQA/IFEval in `bench/eval*.py`, SURVEY.md §4.4).

Each item: {"prompt": str|token list, "answer": str|[str, ...]}.
Metrics: exact-match or contains, with optional GSM8K-style final-number
extraction.
"""

from __future__ import annotations

import re
from typing import List, Optional

from vllm_hymeta_tpu.engine.sampler import SamplingParams

_NUM_RE = re.compile(r"-?\d[\d,]*(?:\.\d+)?")


def extract_final_number(text: str) -> Optional[str]:
    """GSM8K-style: the last number in the generation."""
    hits = _NUM_RE.findall(text)
    if not hits:
        return None
    return hits[-1].replace(",", "")


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.strip().lower())


def _match_ifeval(pred: str, item: dict) -> bool:
    """Strict IFEval scoring via the rule checker; falls back to keyword
    containment for rows without instruction ids."""
    from vllm_hymeta_tpu.evals import ifeval_rules
    ids = item.get("instruction_id_list") or []
    if not ids:
        return _match(pred, item.get("answer", []), "contains")
    ok, _ = ifeval_rules.check(pred, ids, item.get("instruction_kwargs"))
    return ok


def _match(pred: str, answers, mode: str) -> bool:
    if not isinstance(answers, (list, tuple)):
        answers = [answers]
    if mode == "number":
        p = extract_final_number(pred)
        return p is not None and any(
            extract_final_number(str(a)) == p for a in answers)
    p = _norm(pred)
    if mode == "contains":
        return any(_norm(str(a)) in p for a in answers)
    return any(_norm(str(a)) == p for a in answers)  # exact


def gen_accuracy(engine, items: List[dict], tokenizer,
                 max_tokens: int = 256, temperature: float = 0.0,
                 match: str = "contains",
                 stop_at_newline: bool = False) -> dict:
    """Generate with the serving engine (continuous batching across the
    whole item set) and score against reference answers.

    match: "exact" | "contains" | "number" (GSM8K final-number)."""
    sp = SamplingParams(temperature=temperature, max_tokens=max_tokens)

    def enc(p):
        if isinstance(p, str):
            if tokenizer is None:
                raise ValueError("string prompts need a tokenizer")
            return tokenizer.encode(p)
        return list(p)

    def dec(ids):
        if tokenizer is None:
            return " ".join(str(i) for i in ids)  # id-space matching
        return tokenizer.decode(ids)

    prompts = [enc(item["prompt"]) for item in items]
    reqs = engine.generate(prompts, sp)
    correct = 0
    preds = []
    for item, req in zip(items, reqs):
        text = dec(req.output)
        if stop_at_newline:
            text = text.split("\n", 1)[0]
        if match == "ifeval":
            ok = _match_ifeval(text, item)
        else:
            ok = _match(text, item["answer"], match)
        correct += int(ok)
        preds.append({"pred": text, "ok": ok})
    n = len(items)
    return {"accuracy": correct / max(n, 1), "n": n, "correct": correct,
            "predictions": preds}
