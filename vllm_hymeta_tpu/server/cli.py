"""CLI: `python -m vllm_hymeta_tpu.server.cli serve|bench ...`

Mirrors the reference's deployment surface (`readme.md:110-173`):
  serve MODEL --max-model-len 32768 --max-num-seqs 8 --port 8000
        [--quantization w8a8|gptq4] [--kv-cache-dtype int8]
  bench MODEL --prompt-len 32768 --gen 128 [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import time


def _load_params(args):
    import jax
    import jax.numpy as jnp
    from vllm_hymeta_tpu.config import load_config
    from vllm_hymeta_tpu import weights as weights_lib
    from vllm_hymeta_tpu.models import get_model

    cfg = load_config(args.model)
    if args.random_weights:
        model = get_model(cfg)
        params = model.init_params(cfg, jax.random.PRNGKey(0),
                                   dtype=jnp.bfloat16)
    else:
        from vllm_hymeta_tpu.quant import io as quant_io
        if quant_io.is_compressed_tensors_checkpoint(args.model):
            params = quant_io.load_compressed_w8a8_checkpoint(
                cfg, args.model)
        elif quant_io.is_gptq_checkpoint(args.model):
            params = quant_io.load_gptq_checkpoint(cfg, args.model)
        else:
            params = weights_lib.load_checkpoint(cfg, args.model)
    if args.quantization == "w8a8":
        from vllm_hymeta_tpu.quant import quantize_params_w8a8
        params = quantize_params_w8a8(params)
    elif args.quantization == "gptq4":
        from vllm_hymeta_tpu.quant import (attach_prefill_int8,
                                           quantize_params_gptq)
        params = attach_prefill_int8(quantize_params_gptq(params))
    return cfg, params


def _load(args):
    from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig

    cfg, params = _load_params(args)
    ecfg = EngineConfig(max_num_seqs=args.max_num_seqs,
                        max_model_len=args.max_model_len,
                        kv_dtype=args.kv_cache_dtype,
                        logprobs_topk=getattr(args, "logprobs_topk", 0))
    mesh = None
    if args.tensor_parallel_size * args.data_parallel_size > 1:
        from vllm_hymeta_tpu.parallel import make_mesh
        mesh = make_mesh(tp=args.tensor_parallel_size,
                         dp=args.data_parallel_size)
    return cfg, Engine(cfg, params, ecfg, mesh=mesh)


def main(argv=None):
    p = argparse.ArgumentParser(prog="vllm-hymeta-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("model")
        sp.add_argument("--max-model-len", type=int, default=32768)
        sp.add_argument("--max-num-seqs", type=int, default=8)
        sp.add_argument("--quantization", default=None,
                        choices=[None, "w8a8", "gptq4"])
        sp.add_argument("--kv-cache-dtype", default="bfloat16",
                        choices=["bfloat16", "int8"])
        sp.add_argument("--random-weights", action="store_true",
                        help="skip checkpoint load (benchmarking)")
        sp.add_argument("--tensor-parallel-size", type=int, default=1)
        sp.add_argument("--data-parallel-size", type=int, default=1)
        sp.add_argument("--logprobs-topk", type=int, default=0,
                        help="top-N logprob alternatives compiled into the "
                             "step programs (0 disables the logprobs API)")

    ps = sub.add_parser("serve")
    common(ps)
    ps.add_argument("--host", default="0.0.0.0")
    ps.add_argument("--port", type=int, default=8000)

    pb = sub.add_parser("bench")
    common(pb)
    pb.add_argument("--prompt-len", type=int, default=32768)
    pb.add_argument("--gen", type=int, default=128)
    pb.add_argument("--runs", type=int, default=3)

    pt = sub.add_parser("throughput",
                        help="sonnet-style continuous-batching throughput "
                             "(readme.md:160-173 protocol)")
    common(pt)
    pt.add_argument("--num-prompts", type=int, default=64)
    pt.add_argument("--input-len", type=int, default=1024)
    pt.add_argument("--output-len", type=int, default=128)

    pe = sub.add_parser("eval",
                        help="accuracy evals (in-tree opencompass "
                             "replacement: ppl | mc | gen over jsonl)")
    common(pe)
    pe.add_argument("--task", choices=["ppl", "mc", "gen"],
                    help="raw mechanism (or use --suite)")
    pe.add_argument("--suite",
                    help="named suite with the reference's prompt format: "
                         "mmlu|cmmlu|ceval|arc_c|hellaswag|gsm8k|nq|"
                         "triviaqa|quality|ifeval (evals/suites.py)")
    pe.add_argument("--data", required=True,
                    help="jsonl items (mc/gen/suite) or token-id json "
                         "list (ppl)")
    pe.add_argument("--fewshot", type=int, default=None)
    pe.add_argument("--max-tokens", type=int, default=256)
    pe.add_argument("--match", default="contains",
                    choices=["exact", "contains", "number"])
    pe.add_argument("--length-normalize", action="store_true")

    args = p.parse_args(argv)

    if args.cmd == "serve":
        from vllm_hymeta_tpu.engine.api import _try_load_tokenizer
        from vllm_hymeta_tpu.server.openai_server import serve
        cfg, eng = _load(args)
        tok = _try_load_tokenizer(args.model)
        print(f"serving {args.model} on {args.host}:{args.port}")
        serve(eng, tok, args.host, args.port)
    elif args.cmd == "bench":
        import numpy as np
        from vllm_hymeta_tpu.engine.sampler import SamplingParams
        cfg, eng = _load(args)
        rs = np.random.RandomState(0)
        prompt = list(rs.randint(0, cfg.vocab_size, size=args.prompt_len))
        sp = SamplingParams(temperature=0.0, max_tokens=args.gen,
                            ignore_eos=True)
        eng.generate([prompt], sp)  # warmup/compile
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            eng.generate([prompt], sp)
            times.append((time.perf_counter() - t0) * 1000)
        print(json.dumps({
            "prompt_len": args.prompt_len, "gen": args.gen,
            "mean_ms": sum(times) / len(times),
            "runs_ms": [round(t, 1) for t in times]}))
    elif args.cmd == "throughput":
        import numpy as np
        from vllm_hymeta_tpu.engine.metrics import EngineMetrics
        from vllm_hymeta_tpu.engine.sampler import SamplingParams
        cfg, eng = _load(args)
        metrics = EngineMetrics(eng)
        rs = np.random.RandomState(0)
        prompts = [list(rs.randint(0, cfg.vocab_size,
                                   size=args.input_len))
                   for _ in range(args.num_prompts)]
        sp = SamplingParams(temperature=0.0, max_tokens=args.output_len,
                            ignore_eos=True)
        # warmup on one prompt
        eng.generate([prompts[0]], sp)
        t0 = time.perf_counter()
        eng.generate(prompts, sp)
        dt = time.perf_counter() - t0
        total = args.num_prompts * (args.input_len + args.output_len)
        print(json.dumps({
            "num_prompts": args.num_prompts,
            "elapsed_s": round(dt, 2),
            "total_tokens_per_s": round(total / dt, 1),
            "output_tokens_per_s": round(
                args.num_prompts * args.output_len / dt, 1),
            "metrics": metrics.to_dict()}))
    elif args.cmd == "eval":
        from vllm_hymeta_tpu import evals
        from vllm_hymeta_tpu.engine.api import _try_load_tokenizer
        from vllm_hymeta_tpu.evals.tasks import load_jsonl
        if not args.task and not args.suite:
            p.error("eval needs --task or --suite")
        tok = _try_load_tokenizer(args.model)
        if args.suite:
            from vllm_hymeta_tpu.evals.suites import SUITES, build_items
            spec = SUITES[args.suite]
            items = build_items(args.suite, load_jsonl(args.data),
                                fewshot=args.fewshot)
            if spec["mode"] == "mc":
                cfg, params = _load_params(args)
                res = evals.mc_accuracy(
                    cfg, params, items, tokenizer=tok,
                    length_normalize=spec.get("length_normalize", False))
            else:
                cfg, eng = _load(args)
                res = evals.gen_accuracy(
                    eng, items, tok,
                    max_tokens=spec.get("max_tokens", args.max_tokens),
                    match=spec.get("match", args.match),
                    stop_at_newline=spec.get("stop_at_newline", False))
                res.pop("predictions")
            print(json.dumps({"task": args.suite, **res}))
        elif args.task == "ppl":
            cfg, params = _load_params(args)
            with open(args.data) as f:
                tokens = json.load(f)
            ppl = evals.perplexity(cfg, params, tokens)
            print(json.dumps({"task": "ppl", "perplexity": ppl,
                              "n_tokens": len(tokens)}))
        elif args.task == "mc":
            cfg, params = _load_params(args)
            items = load_jsonl(args.data)
            res = evals.mc_accuracy(
                cfg, params, items, tokenizer=tok,
                length_normalize=args.length_normalize)
            print(json.dumps({"task": "mc", **res}))
        else:
            cfg, eng = _load(args)
            items = load_jsonl(args.data)
            res = evals.gen_accuracy(eng, items, tok,
                                     max_tokens=args.max_tokens,
                                     match=args.match)
            res.pop("predictions")
            print(json.dumps({"task": "gen", **res}))


if __name__ == "__main__":
    main()
