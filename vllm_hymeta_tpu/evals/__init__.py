"""Accuracy evaluation harnesses — the in-tree replacement for the
reference's opencompass configs (`bench/eval*.py`, SURVEY.md §2 L7/§4.4):
perplexity and multiple-choice (MMLU-style) log-likelihood scoring against
the engine, so quantized-vs-bf16 deltas can be measured without external
eval infra."""

from vllm_hymeta_tpu.evals.gen import gen_accuracy  # noqa: F401
from vllm_hymeta_tpu.evals.ppl import perplexity  # noqa: F401
from vllm_hymeta_tpu.evals.tasks import mc_accuracy  # noqa: F401
