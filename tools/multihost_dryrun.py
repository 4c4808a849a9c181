"""Two-process multi-host dryrun of the mesh serving path (SURVEY.md §2.7
comm backend / N15; VERDICT r3 item 5).

The reference launches one worker per GPU with ray + NCCL
(`/root/reference/readme.md:48-56`); the TPU-native equivalent is one
process per host under `jax.distributed.initialize` with the mesh
spanning all processes and XLA collectives riding DCN.  Real multi-host
hardware isn't available here, so this exercises that exact code path on
CPU: 2 processes x 4 virtual devices = one (data=2, model=4) mesh whose
"data" axis spans the process boundary, running one prefill chunk + one
decode step through parallel/step's shard_map programs and checking
logits against a single-process run.

Usage:  python tools/multihost_dryrun.py            # orchestrates all
        python tools/multihost_dryrun.py single     # (internal) reference
        python tools/multihost_dryrun.py worker I   # (internal) process I
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("DRYRUN_PORT", 17621))
NPROC = 2
LOCAL_DEVICES = 4
REF = "/tmp/multihost_ref.npz"
OUT = "/tmp/multihost_out_{}.npz"


def _build(np_, jnp, jax, tp: int):
    """Tiny GLAswa engine pieces shared by both modes (seeded)."""
    from vllm_hymeta_tpu import cache as cache_lib
    from vllm_hymeta_tpu.config import GLAswaConfig
    from vllm_hymeta_tpu.models import common, gla_swa

    cfg = GLAswaConfig(hidden_size=256, num_hidden_layers=4,
                       num_attention_heads=8, num_key_value_heads=4,
                       intermediate_size=512, vocab_size=1024,
                       sliding_window=64, max_position_embeddings=512)
    params = gla_swa.init_params(cfg, jax.random.PRNGKey(3),
                                 dtype=jnp.float32)
    params = common.fuse_params(cfg, params, tp=tp)
    cc = cache_lib.CacheConfig(max_num_seqs=4, max_model_len=256,
                               kv_dtype="bfloat16")
    cache = gla_swa.init_cache(cfg, cc)
    rs = np_.random.RandomState(0)
    tokens = rs.randint(0, cfg.vocab_size, size=64).astype(np_.int32)
    return cfg, params, cache, tokens


def run_single():
    import jax
    # the environment pins JAX_PLATFORMS=axon via sitecustomize; override
    # post-import (same workaround as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from vllm_hymeta_tpu.models import gla_swa

    cfg, params, cache, tokens = _build(np, jnp, jax, tp=1)
    logits, cache = jax.jit(
        lambda p, c, t: gla_swa.prefill(
            cfg, p, c, t, jnp.int32(0), jnp.int32(0), jnp.int32(64)))(
        params, cache, jnp.asarray(tokens))
    dl, cache = jax.jit(
        lambda p, c: gla_swa.decode(
            cfg, p, c, jnp.asarray([7, 0, 0, 0], jnp.int32),
            jnp.asarray([64, 0, 0, 0], jnp.int32),
            jnp.asarray([True, False, False, False])))(params, cache)
    np.savez(REF, prefill=np.asarray(logits, np.float32),
             decode=np.asarray(dl, np.float32))
    print("single-process reference written", flush=True)


def run_worker(pid: int):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count="
                               f"{LOCAL_DEVICES}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                               num_processes=NPROC, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from vllm_hymeta_tpu.parallel import step as pstep

    assert len(jax.devices()) == NPROC * LOCAL_DEVICES
    cfg, params, cache, tokens = _build(np, jnp, jax, tp=4)
    devs = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("data", "model"))
    # the "data" axis spans the two processes: every data-parallel
    # collective (logit owner-broadcast psum, dp-grouped combines)
    # crosses the process boundary — the DCN path of SURVEY §2.7
    params, cache, _ = pstep.place_all(cfg, mesh, params, cache, None)

    def repl(x):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))

    prefill = jax.jit(pstep.make_local_prefill(cfg, mesh, params, cache,
                                               None))
    logits, cache = prefill(params, None, cache, repl(tokens),
                            repl(jnp.int32(0)), repl(jnp.int32(0)),
                            repl(jnp.int32(64)))
    decode = jax.jit(pstep.make_local_decode(cfg, mesh, params, cache,
                                             None))
    dl, cache = decode(params, None, cache,
                       repl(jnp.asarray([7, 0, 0, 0], jnp.int32)),
                       repl(jnp.asarray([64, 0, 0, 0], jnp.int32)),
                       repl(jnp.asarray([True, False, False, False])))
    # arrays span both processes: gather global values for the check
    from jax.experimental import multihost_utils
    lg = np.asarray(multihost_utils.process_allgather(logits, tiled=True),
                    np.float32)
    dlg = np.asarray(multihost_utils.process_allgather(dl, tiled=True),
                     np.float32)
    np.savez(OUT.format(pid), prefill=lg, decode=dlg)
    print(f"process {pid}: prefill/decode done over "
          f"{NPROC}x{LOCAL_DEVICES} devices", flush=True)
    jax.distributed.shutdown()


def orchestrate():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    subprocess.run([sys.executable, __file__, "single"], check=True,
                   env=env, cwd=REPO)
    procs = [subprocess.Popen([sys.executable, __file__, "worker", str(i)],
                              env=env, cwd=REPO) for i in range(NPROC)]
    for p in procs:
        assert p.wait(timeout=900) == 0, "worker failed"
    import numpy as np
    ref = np.load(REF)
    for i in range(NPROC):
        out = np.load(OUT.format(i))
        for key in ("prefill", "decode"):
            a, b = out[key], ref[key]
            rms = float(np.sqrt(np.mean((a - b) ** 2))
                        / (np.sqrt(np.mean(b ** 2)) + 1e-9))
            assert rms < 2e-2, (key, i, rms)
    print(json.dumps({
        "multihost_dryrun": "ok", "processes": NPROC,
        "devices_per_process": LOCAL_DEVICES,
        "mesh": "data=2 (cross-process) x model=4",
        "checks": "prefill+decode logits match single-process (rms<2e-2)",
    }))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "orchestrate"
    if mode == "single":
        run_single()
    elif mode == "worker":
        run_worker(int(sys.argv[2]))
    else:
        orchestrate()
