"""Whole-model A/B: int8 attention-core modes vs the bf16-core default
(VERDICT r4 next #2). Same harness as every routing decision: jitted
lax.scan e2e (wavlm+bert+fusion) closed by a scalar fetch, best-of-5,
real chip, product batches/text buckets.

Run: PYTHONPATH=/root/repo:/root/.axon_site python .scratch/int8core_ab.py
Modes are trace-time env reads; each mode gets a fresh trace here.
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
ITERS, REPEATS = 10, 5
BUCKETS = [1.25, 2.5, 5.0, 10.0]   # Lp=128 packed-text, 128, 256, 512
MODES = ["", "score", "pv", "both"]

def log(m):
    print(f"# [{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

wavlm, bert, fusion, P16, P = bench.build_serving_models()
rng = np.random.default_rng(0)

def run(sec, mode):
    os.environ.pop("HRIEMO_INT8_CORE", None)
    if mode:
        os.environ["HRIEMO_INT8_CORE"] = mode
    b = bench.BUCKET_B[sec]
    t = int(sec * SR)
    lt = bench.BUCKET_LT[sec]
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

    a = (P, wavs, wmask, ids, tmask)
    float(fn(*a))  # compile+warm
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(fn(*a))
        times.append((time.perf_counter() - t0) / ITERS)
    return min(times) * 1000, b

results = {}
for sec in BUCKETS:
    for mode in MODES:
        label = mode or "bf16core"
        try:
            ms, b = run(sec, mode)
            results[f"{sec}s/{label}"] = round(ms, 2)
            log(f"{sec}s B={b} {label}: {ms:.2f} ms/batch")
        except Exception as e:
            results[f"{sec}s/{label}"] = f"ERROR: {type(e).__name__}: {str(e)[:200]}"
            log(f"{sec}s {label}: FAILED {type(e).__name__}: {str(e)[:200]}")
    base = results.get(f"{sec}s/bf16core")
    if isinstance(base, float):
        for mode in MODES[1:]:
            v = results.get(f"{sec}s/{mode}")
            if isinstance(v, float):
                log(f"  {sec}s {mode}: {100*(v/base-1):+.2f}% vs bf16core")
print(json.dumps(results, indent=1), flush=True)
