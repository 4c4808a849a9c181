"""Eval harness sanity tests on tiny models."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_hymeta_tpu.evals import mc_accuracy, perplexity
from vllm_hymeta_tpu.models import gla_swa
from tests.test_models import tiny_glaswa


class TestEvals:
    def test_perplexity_finite_and_window_consistent(self):
        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.float32)
        toks = list(np.random.RandomState(0).randint(0, 256, size=96))
        p1 = perplexity(cfg, params, toks, window=96)
        assert np.isfinite(p1) and p1 > 1.0
        # strided windows approximate the single-window value
        p2 = perplexity(cfg, params, toks, window=48, stride=24)
        assert np.isfinite(p2) and p2 > 1.0

    def test_ppl_detects_repetition(self):
        """A periodic stream must have much lower PPL than random under a
        model that can see the period (sanity of the scoring math: compare
        a stream the model predicts well vs pure noise — here we cheat by
        comparing PPL of the same stream under 'right' vs shuffled
        targets)."""
        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(1),
                                     dtype=jnp.float32)
        toks = list(np.random.RandomState(1).randint(0, 256, size=64))
        base = perplexity(cfg, params, toks, window=64)
        assert base < cfg.vocab_size * 2  # bounded by ~uniform

    def test_mc_accuracy_prefers_likely_choice(self):
        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(2),
                                     dtype=jnp.float32)
        prompt = [1, 2, 3, 4]
        # find the model's own greedy continuation => that choice should
        # score highest
        logits = gla_swa.forward_full(
            cfg, params, jnp.asarray([prompt], jnp.int32))[0, -1]
        best = int(jnp.argmax(logits))
        worst = int(jnp.argmin(logits))
        items = [{"prompt": prompt, "choices": [[best], [worst]],
                  "answer": 0}]
        res = mc_accuracy(cfg, params, items)
        assert res["accuracy"] == 1.0

    def test_gen_accuracy_matching_modes(self):
        """Engine-driven generative eval: scoring modes + continuous
        batching across items."""
        from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
        from vllm_hymeta_tpu.evals import gen_accuracy
        from vllm_hymeta_tpu.evals.gen import extract_final_number

        assert extract_final_number("so the answer is 1,234.5") == "1234.5"
        assert extract_final_number("no digits") is None

        class ByteTok:
            def encode(self, s):
                return [ord(c) % 256 for c in s]

            def decode(self, ids):
                return "".join(chr(i % 128) for i in ids)

        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(3),
                                     dtype=jnp.float32)
        eng = Engine(cfg, params, EngineConfig(
            max_num_seqs=2, max_model_len=128,
            prefill_chunk=32, prefill_buckets=(32,), decode_block=4))
        tok = ByteTok()
        items = [
            {"prompt": [1, 2, 3], "answer": "zzz-will-not-match"},
            {"prompt": [4, 5, 6], "answer": ""},   # empty: contains-match
        ]
        res = gen_accuracy(eng, items, tok, max_tokens=8,
                           match="contains")
        assert res["n"] == 2
        assert res["correct"] == 1  # only the empty-string item matches
        assert len(res["predictions"]) == 2


class TestSuites:
    """Suite adapters reproduce the reference's opencompass prompt
    formats (`bench/eval*.py`) over the in-tree mechanisms."""

    def test_mmlu_format(self):
        from vllm_hymeta_tpu.evals.suites import build_items
        rows = [
            {"question": f"Q{i}?", "choices": ["a", "b", "c", "d"],
             "answer": "B"} for i in range(7)
        ]
        items = build_items("mmlu", rows)
        # 5 few-shot rows consumed from the head
        assert len(items) == 2
        it = items[0]
        assert it["answer"] == 1
        assert it["choices"] == [" A", " B", " C", " D"]
        assert it["prompt"].count("Answer: B") == 5    # shots carry answers
        assert it["prompt"].rstrip().endswith("Answer:")

    def test_gsm8k_format_and_number_match(self):
        from vllm_hymeta_tpu.evals.gen import _match
        from vllm_hymeta_tpu.evals.suites import build_items
        rows = [{"question": f"add {i}+{i}",
                 "answer": f"thinking... #### {2 * i}"} for i in range(6)]
        items = build_items("gsm8k", rows)
        assert len(items) == 2
        assert items[0]["answer"] == "8"
        assert _match("the result is 8.", items[0]["answer"], "number")
        assert not _match("the result is 9.", items[0]["answer"], "number")

    def test_arc_and_hellaswag_and_quality(self):
        from vllm_hymeta_tpu.evals.suites import build_items
        [arc] = build_items("arc_c", [{
            "question": "why?",
            "choices": {"text": ["x", "y"], "label": ["A", "B"]},
            "answerKey": "B"}])
        assert arc["answer"] == 1 and arc["choices"] == [" x", " y"]
        [hs] = build_items("hellaswag", [{
            "ctx": "A man", "endings": ["runs", "swims"], "label": 1}])
        assert hs["answer"] == 1
        [q] = build_items("quality", [{
            "article": "long text", "question": "q?",
            "options": ["o1", "o2", "o3", "o4"], "gold_label": 3}])
        assert q["answer"] == 2

    def test_mc_suite_end_to_end_tiny(self):
        from vllm_hymeta_tpu.evals.suites import build_items

        class IdTok:
            def encode(self, s):
                return [ord(c) % 251 for c in s]

        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.float32)
        rows = [{"question": "pick", "choices": ["aa", "bb"], "answer": 0}]
        items = build_items("arc_c", [{
            "question": "pick", "choices": {"text": ["aa", "bb"],
                                            "label": ["A", "B"]},
            "answerKey": "A"}])
        res = mc_accuracy(cfg, params, items, tokenizer=IdTok())
        assert res["n"] == 1 and res["accuracy"] in (0.0, 1.0)


class TestIFEvalRules:
    def test_individual_rules(self):
        from vllm_hymeta_tpu.evals import ifeval_rules as R
        assert R.keywords_existence("the cat sat", keywords=["cat", "sat"])
        assert not R.keywords_existence("the cat", keywords=["dog"])
        assert R.keywords_frequency("go go go", keyword="go", frequency=3,
                                    relation="at least")
        assert not R.keywords_frequency("go", keyword="go", frequency=3,
                                        relation="at least")
        assert R.keywords_forbidden("all fine here",
                                    forbidden_words=["bad"])
        assert R.letter_frequency("banana", letter="a", let_frequency=3,
                                  let_relation="at least")
        assert R.number_words("one two three", num_words=3,
                              relation="at least")
        assert R.number_words("one two", num_words=3, relation="less than")
        assert R.number_sentences("Hi. There. Ok.", num_sentences=3,
                                  relation="at least")
        assert R.number_paragraphs("a\n***\nb\n***\nc", num_paragraphs=3)
        assert R.nth_paragraph_first_word(
            "alpha text\n\nbravo text", num_paragraphs=2, nth_paragraph=2,
            first_word="bravo")
        assert R.number_placeholders("fill [name] and [date]",
                                     num_placeholders=2)
        assert R.postscript("bye\nP.S. remember",
                            postscript_marker="P.S.")
        assert R.number_bullets("* a\n* b\n", num_bullets=2)
        assert R.constrained_response("Well, My answer is yes.")
        assert R.number_highlights("see *this* and *that*",
                                   num_highlights=2)
        assert R.multiple_sections("Section 1 intro Section 2 body",
                                   section_spliter="Section",
                                   num_sections=2)
        assert R.json_format('{"a": 1}')
        assert not R.json_format("not json")
        assert R.title_format("<<My Title>>\nbody")
        assert R.two_responses("first answer\n******\nsecond answer")
        assert R.repeat_prompt("Repeat me please, then more",
                               prompt_to_repeat="Repeat me please")
        assert R.end_checker("all done now", end_phrase="done now")
        assert R.quotation('"quoted fully"')
        assert R.capital_word_frequency("the BIG RED dog",
                                        capital_frequency=2,
                                        capital_relation="at least")
        assert R.english_capital("ALL CAPS HERE!")
        assert R.english_lowercase("all lower here.")
        assert R.no_comma("no commas here")
        assert not R.no_comma("one, two")

    def test_check_strict_protocol(self):
        from vllm_hymeta_tpu.evals.ifeval_rules import check
        ok, v = check("THE QUICK FOX", ["change_case:english_capital",
                                        "punctuation:no_comma"], [{}, {}])
        assert ok and v == [True, True]
        ok, v = check("The quick fox", ["change_case:english_capital",
                                        "punctuation:no_comma"], [{}, {}])
        assert not ok and v == [False, True]
        # unknown ids -> None verdict, scored NOT-followed in strict_all
        # (conservative vs the official checker; ADVICE r3)
        ok, v = check("x", ["not:a_rule"], [{}])
        assert not ok and v == [None]

    def test_gen_accuracy_ifeval_mode(self):
        """End-to-end: the gen scorer applies the rule checker when the
        suite declares match='ifeval'."""
        from vllm_hymeta_tpu.evals.gen import _match_ifeval
        item = {"instruction_id_list": ["punctuation:no_comma",
                                       "detectable_format:title"],
                "instruction_kwargs": [{}, {}]}
        assert _match_ifeval("<<T>> clean text", item)
        assert not _match_ifeval("<<T>> has, comma", item)
