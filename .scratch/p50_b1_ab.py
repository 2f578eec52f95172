"""int8 B=1 latency attack (VERDICT r4 weak #5 / next #6): the int8 B=1
path measured 6.0 ms vs bf16's 3.7 — launch/VPU-bound (per-kernel quant
overhead at M=Lp rows, no batch to amortize). Sweep the megakernel
schedule (hpc) and pipe mode at B=1 on the median bucket, int8 vs bf16,
plus B=2/4 to locate where int8 starts winning (the serving tier's
precision-per-batch-regime crossover).

Run: PYTHONPATH=/root/repo:/root/.axon_site python .scratch/p50_b1_ab.py
"""
import json, os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hriemo_xla_cache")
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench

jax.config.update("jax_compilation_cache_dir", "/tmp/hriemo_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

SR = bench.SR
SEC = 3.75  # the p50/median bucket of the lognormal mix
ITERS, REPEATS = 20, 5

def log(m):
    print(f"# [{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

wavlm, bert, fusion, P16, P = bench.build_serving_models()
rng = np.random.default_rng(0)

def run(b, params, env=()):
    os.environ.pop("HRIEMO_PIPE", None)
    for k, v in env:
        os.environ[k] = v
    t = int(SEC * SR)
    lt = bench.BUCKET_LT[SEC]
    wavs = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    wmask = jnp.ones((b, t), jnp.int32)
    ids = jnp.asarray(rng.integers(0, 30000, size=(b, lt)).astype(np.int32))
    tmask = jnp.ones((b, lt), jnp.int32)

    @jax.jit
    def fn(P, wavs, wmask, ids, tmask):
        def body(c, _):
            ids_v = ids + (c > jnp.asarray(9e9, c.dtype)).astype(ids.dtype)
            h_a, fmask = wavlm.apply(P["w"], wavs + c, wmask)
            h_t, _ = bert.apply(P["b"], ids_v, tmask)
            logits, _beta, _ = fusion.apply(
                P["f"], h_a, h_t.astype(h_a.dtype), fmask == 0, tmask == 0)
            return (jnp.mean(logits.astype(jnp.float32)) * 1e-12).astype(wavs.dtype), None
        c, _ = jax.lax.scan(body, jnp.zeros((), wavs.dtype), None, length=ITERS)
        return c

    a = (params, wavs, wmask, ids, tmask)
    float(fn(*a))
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(fn(*a))
        times.append((time.perf_counter() - t0) / ITERS)
    return min(times) * 1000

res = {}
CONFIGS = [
    ("b1/bf16", 1, "bf16", ()),
    ("b1/int8", 1, "int8", ()),
    ("b1/int8_pipe0", 1, "int8", (("HRIEMO_PIPE", "0"),)),
    ("b2/bf16", 2, "bf16", ()),
    ("b2/int8", 2, "int8", ()),
    ("b4/bf16", 4, "bf16", ()),
    ("b4/int8", 4, "int8", ()),
    ("b8/bf16", 8, "bf16", ()),
    ("b8/int8", 8, "int8", ()),
]
for name, b, prec, env in CONFIGS:
    try:
        ms = run(b, P16 if prec == "bf16" else P, env)
        res[name] = round(ms, 3)
        log(f"{name}: {ms:.3f} ms/batch ({ms/b:.3f} ms/clip)")
    except Exception as e:
        res[name] = f"ERROR: {type(e).__name__}: {str(e)[:200]}"
        log(f"{name}: FAILED {str(e)[:200]}")
print(json.dumps(res, indent=1), flush=True)
