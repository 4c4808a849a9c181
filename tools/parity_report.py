"""Quantization-parity report: the accuracy axis of the north star
("MMLU/ppl delta vs bf16 ~ 0", BASELINE.json) measured WITHOUT a real
checkpoint — real 7B dims, shared seeded weights, bf16 vs each quantized
scheme (the role of the reference's eval apparatus,
`/root/reference/bench/eval.py:31-106`, which it also never committed
numbers from).

Two measurements per scheme, on the real chip:
  * free-running greedy: 32 prompts x 128 tokens through the serving
    engine; exact-match prefix length and per-token agreement vs bf16;
  * teacher-forced: argmax agreement, mean |delta logit|, and
    log-ppl delta over a fixed 4096-token stream via forward_full.

Memory forces one scheme per process: `python tools/parity_report.py
<scheme>` dumps /tmp/parity_<scheme>.npz; `python tools/parity_report.py
report` compares the dumps and prints the markdown table + JSON lines.

Env: PARITY_PROMPTS (32), PARITY_GEN (128), PARITY_STREAM (4096),
     PARITY_SMALL=1 (reduced dims, CI smoke).
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCHEMES = ("bf16", "w8a8", "gptq4", "gptq4cal")


def _cfg():
    from vllm_hymeta_tpu.config import GLAswaConfig
    if os.environ.get("PARITY_SMALL") == "1":
        return GLAswaConfig(hidden_size=512, num_hidden_layers=4,
                            num_attention_heads=4, num_key_value_heads=2,
                            intermediate_size=1024, vocab_size=2048)
    return GLAswaConfig()


def run_scheme(scheme: str):
    import jax
    import jax.numpy as jnp
    from bench import build_params
    from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
    from vllm_hymeta_tpu.engine.sampler import SamplingParams
    from vllm_hymeta_tpu.models import get_model

    cfg = _cfg()
    n_prompts = int(os.environ.get("PARITY_PROMPTS", 32))
    gen = int(os.environ.get("PARITY_GEN", 128))
    stream_len = int(os.environ.get("PARITY_STREAM", 4096))
    rs = np.random.RandomState(7)
    prompts = [list(rs.randint(0, cfg.vocab_size, size=64))
               for _ in range(n_prompts)]
    stream = rs.randint(0, cfg.vocab_size, size=stream_len + 1)

    params = build_params(cfg, scheme)
    model = get_model(cfg)

    # teacher-forced pass over the fixed stream, processed in independent
    # SEGMENTS (identical segmentation for every scheme, so deltas are
    # apples-to-apples): one [T, V] fp32 logit buffer at the 7B vocab is
    # 2.5 GB and OOMs beside the bf16 weights, a 512-token segment is
    # 311 MB.  Reductions happen on-device; one mid-segment logit row per
    # segment crosses the wire for the |dlogit| stat.
    seg = int(os.environ.get("PARITY_TF_SEG", 512))
    n_seg = max(1, stream_len // seg)
    rows = np.asarray([s * seg + seg // 2 for s in range(n_seg)])

    @jax.jit
    def tf_seg(params, tokens, targets):
        lg = model.forward_full(cfg, params, tokens[None])[0]  # [seg, V]
        top2 = jax.lax.top_k(lg, 2)[0]                  # [seg, 2]
        arg = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        logz = jax.nn.logsumexp(lg, axis=-1)
        nll = jnp.mean(logz - jnp.take_along_axis(
            lg, targets[:, None], axis=-1)[:, 0])
        return arg, top2[:, 0] - top2[:, 1], nll, lg[seg // 2]

    args_, margins_, nlls, lrows = [], [], [], []
    for s in range(n_seg):
        a, m_, n_, r_ = tf_seg(
            params, jnp.asarray(stream[s * seg:(s + 1) * seg], jnp.int32),
            jnp.asarray(stream[s * seg + 1:(s + 1) * seg + 1], jnp.int32))
        args_.append(np.asarray(a))
        margins_.append(np.asarray(m_, np.float32))
        nlls.append(float(n_))
        lrows.append(np.asarray(r_, np.float32))
    arg = np.concatenate(args_)
    margin = np.concatenate(margins_)
    nll = float(np.mean(nlls))
    logit_rows = np.stack(lrows)

    # free-running greedy through the engine (serving path: the real
    # kernels incl. the int4 grouped decode)
    # small slot count: the bf16 7B barely fits HBM (13 GB weights), and
    # ring buffers scale with max_num_seqs
    n_seqs = int(os.environ.get("PARITY_SEQS", 2))
    ecfg = EngineConfig(max_num_seqs=n_seqs, max_model_len=64 + gen + 32,
                        prefill_chunk=512, prefill_buckets=(512,),
                        decode_block=16)
    eng = Engine(cfg, params, ecfg)
    sp = SamplingParams(temperature=0.0, max_tokens=gen, ignore_eos=True)
    reqs = []
    for j in range(0, len(prompts), n_seqs):
        reqs += eng.generate(prompts[j:j + n_seqs], sp)
    outs = np.asarray([r.output for r in reqs], np.int32)

    np.savez(f"/tmp/parity_{scheme}.npz", greedy=outs, tf_argmax=arg,
             margin=margin, nll=np.float32(nll), logit_rows=logit_rows,
             rows=rows)
    print(json.dumps({"scheme": scheme, "nll": round(nll, 5),
                      "greedy_shape": list(outs.shape)}), flush=True)


def report():
    """Compare the scheme dumps against bf16.

    CAVEAT that shapes the metrics: with SEEDED RANDOM weights the output
    distribution is near-uniform over the 152k vocab (nll ~ 12.6 vs
    log V = 11.93), so raw argmax agreement is a near-tie coin flip — any
    |dlogit| perturbation flips it.  The meaningful axes are dlog-ppl
    (the north-star "ppl delta vs bf16 ~ 0") and MARGIN-CONDITIONED
    argmax agreement: among positions where bf16's top-1 beats top-2 by
    more than m, does the quantized model pick the same token?  A real
    checkpoint's distributions are sharp (typical margins >> 1), so the
    m-conditioned columns are the transferable statement."""
    base = np.load("/tmp/parity_bf16.npz")
    lines = []
    has_margin = "margin" in base
    mcols = ("| agree@m>0.5 | agree@m>1 | agree@m>2 "
             if has_margin else "")
    print("| scheme | greedy agree | tf argmax agree "
          f"{mcols}| mean\\|dlogit\\| | dlog-ppl |")
    print("|---|---|---|" + ("---|---|---|" if has_margin else "")
          + "---|---|")
    for scheme in SCHEMES:
        if not os.path.exists(f"/tmp/parity_{scheme}.npz"):
            continue
        d = np.load(f"/tmp/parity_{scheme}.npz")
        ga = float((d["greedy"] == base["greedy"]).mean())
        neq = d["greedy"] != base["greedy"]
        first = np.where(neq.any(1), neq.argmax(1), d["greedy"].shape[1])
        ta = float((d["tf_argmax"] == base["tf_argmax"]).mean())
        dl = float(np.abs(d["logit_rows"] - base["logit_rows"]).mean())
        dnll = float(d["nll"] - base["nll"])
        row = {"scheme": scheme, "greedy_token_agreement": round(ga, 4),
               "mean_exact_prefix": round(float(first.mean()), 1),
               "tf_argmax_agreement": round(ta, 4),
               "mean_abs_dlogit": round(dl, 4),
               "dlog_ppl_vs_bf16": round(dnll, 5)}
        mtxt = ""
        if has_margin:
            eq = d["tf_argmax"] == base["tf_argmax"]
            for m in (0.5, 1.0, 2.0):
                sel = base["margin"] > m
                a = float(eq[sel].mean()) if sel.any() else float("nan")
                row[f"tf_agree_margin_gt_{m}"] = round(a, 4)
                row[f"frac_margin_gt_{m}"] = round(float(sel.mean()), 4)
                mtxt += f"| {a:.4f} "
        lines.append(row)
        print(f"| {scheme} | {row['greedy_token_agreement']:.4f} "
              f"| {row['tf_argmax_agreement']:.4f} "
              f"{mtxt}| {row['mean_abs_dlogit']:.4f} "
              f"| {row['dlog_ppl_vs_bf16']:+.5f} |")
    print()
    for row in lines:
        print(json.dumps(row))


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "report"
    if arg == "report":
        report()
    else:
        run_scheme(arg)
