"""Whole-model A/B: software-pipelined head loop in the GENERIC MHA
kernel (HRIEMO_MHA_PIPE=1) vs the unpipelined default — the WavLM
kernel's round-3d pipe (-1.3/-1.6% e2e) ported to the BERT/fusion/
decoder sublayers (round 5). Same harness as every routing decision:
jitted lax.scan e2e, best-of-5, real chip.

Run: PYTHONPATH=/root/repo:/root/.axon_site python .scratch/mha_pipe_ab.py
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
BUCKETS = [2.5, 1.25, 7.5, 10.0]
MODES = ["", "1"]                  # default (off) vs pipe

def log(m):
    print(f"# [{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

wavlm, bert, fusion, P16, P = bench.build_serving_models()
rng = np.random.default_rng(0)

def run(sec, mode):
    os.environ.pop("HRIEMO_MHA_PIPE", None)
    if mode:
        os.environ["HRIEMO_MHA_PIPE"] = mode
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
        label = "pipe" if mode else "nopipe"
        try:
            ms, b = run(sec, mode)
            results[f"{sec}s/{label}"] = round(ms, 2)
            log(f"{sec}s B={b} {label}: {ms:.2f} ms/batch")
        except Exception as e:
            results[f"{sec}s/{label}"] = f"ERROR: {type(e).__name__}: {str(e)[:200]}"
            log(f"{sec}s {label}: FAILED {type(e).__name__}: {str(e)[:200]}")
    base = results.get(f"{sec}s/nopipe")
    v = results.get(f"{sec}s/pipe")
    if isinstance(base, float) and isinstance(v, float):
        log(f"  {sec}s pipe: {100*(v/base-1):+.2f}% vs nopipe")
print(json.dumps(results, indent=1), flush=True)
