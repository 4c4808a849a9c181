"""Engine metrics wrapper tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
from vllm_hymeta_tpu.engine.metrics import EngineMetrics
from vllm_hymeta_tpu.engine.sampler import SamplingParams
from vllm_hymeta_tpu.models import gla_swa
from tests.test_models import tiny_glaswa


class TestMetrics:
    def test_counters_and_throughput(self):
        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.float32)
        eng = Engine(cfg, params, EngineConfig(
            max_num_seqs=2, max_model_len=128, prefill_chunk=16,
            prefill_buckets=(16,), decode_block=4))
        metrics = EngineMetrics(eng)
        prompts = [list(np.random.RandomState(i).randint(0, 256, size=10))
                   for i in range(2)]
        sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
        eng.generate(prompts, sp)
        d = metrics.to_dict()
        assert d["requests_completed"] == 2
        assert d["prompt_tokens"] == 20
        assert d["generated_tokens"] == 8
        # batched multi-request prefill may fold both prompts into one step
        assert d["prefill_steps"] >= 1
        assert d["decode_steps"] >= 1
        assert d["decode_tokens_per_s"] > 0
        assert d["mean_ttft_s"] > 0
        assert "decode_step_ms_p50" in d
