"""Train-step dropout-RNG A/B (round 5, follow-on to the flash A/B):
the flash A/B measured dropout=0.4 costing +62% ms/step over dropout=0
at BOTH batch sizes — threefry bit generation is ALU-bound on the TPU
VPU. The RNG impl is semantically free for dropout (any valid stream is
a correct dropout mask; torch's stream differs from JAX's anyway), so
A/B the train step with threefry (default) vs rbg vs unsafe_rbg keys.

Run: PYTHONPATH=/root/repo:/root/.axon_site python .scratch/train_rng_ab.py
"""
import json, os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hriemo_xla_cache")
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/hriemo_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from hriemo.models import MoseiFusionWithEmotionDecoder
from hriemo.parallel.train_step import TrainConfig, create_train_state, make_train_step

LA, LT = 300, 128
N_STEPS, REPEATS = 20, 3

def log(m):
    print(f"# [{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

def measure(bt, impl):
    model = MoseiFusionWithEmotionDecoder(
        d_audio=74, d_text=300, d_model=256, num_emotions=6, n_heads=4,
        num_layers_fusion=1, num_layers_decoder=2, beta_hidden=64,
        dropout=0.4)
    cfg = TrainConfig(
        loss_type="multi_label",
        pos_weight=[0.87, 2.82, 3.63, 8.94, 4.53, 11.27],
        beta_entropy=1e-3, normalize_labels=True,
        lr=5e-5, weight_decay=0.05, grad_accum=1,
        warmup_steps=100, total_steps=10_000,
        compute_dtype=jnp.bfloat16)
    state = create_train_state(model, cfg, rng=jax.random.key(0))
    step = make_train_step(model, cfg, donate=False)

    rs = np.random.default_rng(3)
    batch = {
        "h_a": jnp.asarray(rs.standard_normal((bt, LA, 74)).astype(np.float32)),
        "h_t": jnp.asarray(rs.standard_normal((bt, LT, 300)).astype(np.float32)),
        "mask_a": jnp.asarray(np.arange(LA)[None, :]
                              >= rs.integers(LA // 2, LA + 1, size=(bt,))[:, None]),
        "mask_t": jnp.asarray(np.arange(LT)[None, :]
                              >= rs.integers(LT // 2, LT + 1, size=(bt,))[:, None]),
        "y": jnp.asarray(rs.uniform(0, 3, size=(bt, 6)).astype(np.float32)),
    }
    key = jax.random.key(1, impl=impl) if impl else jax.random.key(1)

    @jax.jit
    def many(state, batch, k):
        def body(s, i):
            s2, m = step(s, batch, jax.random.fold_in(k, i))
            return s2, m["loss"]
        s, losses = jax.lax.scan(body, state, jnp.arange(N_STEPS))
        return losses[-1]

    float(many(state, batch, key))  # compile+warm
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(many(state, batch, key))
        best = min(best, (time.perf_counter() - t0) / N_STEPS)
    return best * 1000

res = {}
for bt in (32, 512):
    for impl in (None, "rbg", "unsafe_rbg"):
        name = impl or "threefry"
        try:
            ms = measure(bt, impl)
            res[f"B{bt}/{name}"] = round(ms, 3)
            log(f"B={bt} {name}: {ms:.3f} ms/step ({bt/ms*1000:.0f} ex/s)")
        except Exception as e:
            res[f"B{bt}/{name}"] = f"ERROR: {type(e).__name__}: {str(e)[:200]}"
            log(f"B={bt} {name}: FAILED {str(e)[:200]}")
print(json.dumps(res, indent=1), flush=True)
