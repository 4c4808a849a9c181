"""Per-suite adapters: raw dataset rows -> harness items.

The reference evaluates through opencompass config files
(`/root/reference/bench/eval.py:31-106`, `eval_mmlu.py`, `eval_trq.py`,
`eval_sft.py` and the `eval_*_base.py` comparison configs), covering
MMLU / CMMLU / C-Eval / ARC-c / HellaSwag (ppl & gen variants), NQ /
TriviaQA / GSM8K / IFEval / QuALITY.  This module reproduces those
suites' prompt formats on top of the in-tree mechanisms
(`tasks.mc_accuracy` for log-likelihood "ppl" variants, `gen.gen_accuracy`
for generative variants) so any locally available copy of the datasets
(jsonl, one row per example in the suite's canonical field names)
evaluates without opencompass.

Each SUITES entry:
  mode       — "mc" (choice log-likelihood) or "gen"
  format     — row dict -> harness item
  match      — gen-mode answer matching ("exact"|"contains"|"number")
  fewshot    — default shot count (matches the reference configs)
"""

from __future__ import annotations

from typing import Callable, Dict, List

_LETTERS = "ABCDEFGH"


def _mmlu_style(question_key: str, choices_key: str, answer_key: str,
                subject_line: str):
    def fmt(row: dict, shots: List[dict]) -> dict:
        def one(r, with_answer: bool) -> str:
            ch = r[choices_key]
            body = "".join(f"{_LETTERS[i]}. {c}\n" for i, c in enumerate(ch))
            ans = r[answer_key]
            if isinstance(ans, str):
                ans = _LETTERS.index(ans.strip().upper()[0])
            out = f"{r[question_key].strip()}\n{body}Answer:"
            if with_answer:
                out += f" {_LETTERS[ans]}\n\n"
            return out

        prefix = subject_line + "\n\n" if subject_line else ""
        prompt = prefix + "".join(one(s, True) for s in shots) \
            + one(row, False)
        ans = row[answer_key]
        if isinstance(ans, str):
            ans = _LETTERS.index(ans.strip().upper()[0])
        return {"prompt": prompt,
                "choices": [f" {_LETTERS[i]}"
                            for i in range(len(row[choices_key]))],
                "answer": int(ans)}
    return fmt


def _hellaswag(row: dict, shots: List[dict]) -> dict:
    # continuation scoring: ctx + each ending, length-normalized
    return {"prompt": row["ctx"].strip() + " ",
            "choices": [e for e in row["endings"]],
            "answer": int(row["label"])}


def _arc(row: dict, shots: List[dict]) -> dict:
    ch = row["choices"]
    texts = ch["text"] if isinstance(ch, dict) else ch
    labels = ch.get("label") if isinstance(ch, dict) else None
    ans = row["answerKey"]
    if labels is not None and ans in labels:
        idx = labels.index(ans)
    else:
        idx = _LETTERS.index(str(ans).strip().upper()[0])
    return {"prompt": f"Question: {row['question'].strip()}\nAnswer:",
            "choices": [f" {t}" for t in texts],
            "answer": int(idx)}


def _gsm8k(row: dict, shots: List[dict]) -> dict:
    body = "".join(
        f"Question: {s['question'].strip()}\nAnswer: "
        f"{s['answer'].strip()}\n\n" for s in shots)
    ans = row["answer"]
    if isinstance(ans, str) and "####" in ans:
        ans = ans.split("####")[-1].strip()
    return {"prompt": body + f"Question: {row['question'].strip()}\n"
                             "Answer:",
            "answer": str(ans)}


def _qa(question_key: str, answer_key: str):
    def fmt(row: dict, shots: List[dict]) -> dict:
        body = "".join(
            f"Q: {s[question_key].strip()}\nA: "
            f"{(s[answer_key][0] if isinstance(s[answer_key], list) else s[answer_key])}\n\n"
            for s in shots)
        return {"prompt": body + f"Q: {row[question_key].strip()}\nA:",
                "answer": row[answer_key]}
    return fmt


def _quality(row: dict, shots: List[dict]) -> dict:
    # long-article multiple choice (the reference's long-context suite)
    q = row["question"].strip()
    art = row["article"]
    body = "".join(f"{_LETTERS[i]}. {c}\n"
                   for i, c in enumerate(row["options"]))
    ans = int(row["gold_label"]) - 1 if "gold_label" in row \
        else int(row["answer"])
    return {"prompt": f"{art}\n\nQuestion: {q}\n{body}Answer:",
            "choices": [f" {_LETTERS[i]}"
                        for i in range(len(row["options"]))],
            "answer": ans}


def _ifeval(row: dict, shots: List[dict]) -> dict:
    # instruction following: scored by the in-tree rule checker
    # (evals/ifeval_rules.py; strict protocol — every instruction must
    # be followed).  Rows without instruction ids fall back to keyword
    # containment.
    return {"prompt": row["prompt"],
            "instruction_id_list": row.get("instruction_id_list", []),
            "instruction_kwargs": row.get("kwargs", []),
            "answer": row.get("answer", row.get("keywords", []))}


SUITES: Dict[str, dict] = {
    "mmlu": {"mode": "mc", "fewshot": 5,
             "format": _mmlu_style(
                 "question", "choices", "answer",
                 "The following are multiple choice questions (with "
                 "answers).")},
    "cmmlu": {"mode": "mc", "fewshot": 5,
              "format": _mmlu_style(
                  "question", "choices", "answer",
                  "以下是单项选择题，请直接给出正确答案的选项。")},
    "ceval": {"mode": "mc", "fewshot": 5,
              "format": _mmlu_style(
                  "question", "choices", "answer",
                  "以下是中国关于考试的单项选择题，请选出其中的正确答案。")},
    "arc_c": {"mode": "mc", "fewshot": 0, "format": _arc},
    "hellaswag": {"mode": "mc", "fewshot": 0, "format": _hellaswag,
                  "length_normalize": True},
    "gsm8k": {"mode": "gen", "fewshot": 4, "format": _gsm8k,
              "match": "number", "max_tokens": 512},
    "nq": {"mode": "gen", "fewshot": 5,
           "format": _qa("question", "answer"), "match": "contains",
           "max_tokens": 48, "stop_at_newline": True},
    "triviaqa": {"mode": "gen", "fewshot": 5,
                 "format": _qa("question", "answer"), "match": "contains",
                 "max_tokens": 48, "stop_at_newline": True},
    "quality": {"mode": "mc", "fewshot": 0, "format": _quality},
    "ifeval": {"mode": "gen", "fewshot": 0, "format": _ifeval,
               "match": "ifeval", "max_tokens": 512},
}


def build_items(suite: str, rows: List[dict],
                fewshot_rows: List[dict] | None = None,
                fewshot: int | None = None) -> List[dict]:
    """Format raw rows into harness items.  Few-shot examples are drawn
    from `fewshot_rows` (or the head of `rows`, excluded from scoring)."""
    spec = SUITES[suite]
    k = spec["fewshot"] if fewshot is None else fewshot
    if k and fewshot_rows is None:
        fewshot_rows, rows = rows[:k], rows[k:]
    shots = (fewshot_rows or [])[:k]
    fmt: Callable = spec["format"]
    return [fmt(r, shots) for r in rows]
