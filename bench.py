#!/usr/bin/env python3
"""Benchmark harness — prints ONE JSON line.

Round-1 scope: steady-state inference throughput of the flagship fusion
stack (TACFN cross-modal transformer + vector β-gate + emotion decoder) at
IEMOCAP sequence-level shapes (WavLM 10 s ≈ 499 audio frames × BERT 128
text tokens, d=768), bf16 compute, Pallas flash attention on the hot path.

The metric is utterances/sec/chip. ``vs_baseline`` is measured against the
driver's north-star target of 5,000 IEMOCAP utterances/sec/chip
(BASELINE.json — the reference publishes no wall-clock numbers, SURVEY.md §6).
Frontends (WavLM/BERT) will be folded in once they land on-device.

Methodology note: the remote TPU tunnel used here defers execution until a
device→host fetch, so the timed region is a single jitted ``lax.scan`` of
ITERS forwards with a serial data dependency, closed by a scalar fetch.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

NORTH_STAR = 5000.0  # utterances/sec/chip, end-to-end target
ITERS = 50


def main():
    from hriemo.models import FusionWithEmotionDecoder

    model = FusionWithEmotionDecoder(
        d_model=768, num_emotions=4, n_heads=8,
        num_layers_fusion=2, num_layers_decoder=2, beta_hidden=256, dropout=0.1,
    )
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), model.params)

    b, la, lt = 64, 499, 128
    rng = np.random.default_rng(0)
    h_a = jnp.asarray(rng.standard_normal((b, la, 768)).astype(np.float32)).astype(jnp.bfloat16)
    h_t = jnp.asarray(rng.standard_normal((b, lt, 768)).astype(np.float32)).astype(jnp.bfloat16)
    # realistic ragged padding
    lens_a = rng.integers(la // 2, la + 1, size=b)
    lens_t = rng.integers(lt // 2, lt + 1, size=b)
    mask_a = jnp.asarray(np.arange(la)[None, :] >= lens_a[:, None])
    mask_t = jnp.asarray(np.arange(lt)[None, :] >= lens_t[:, None])

    @jax.jit
    def bench_fn(params, h_a, h_t, mask_a, mask_t):
        def body(carry, _):
            logits, beta, _z = model.apply(
                params, h_a + carry, h_t, mask_a, mask_t
            )
            # tiny serial dependency so the scan can't be parallelised/DCE'd
            return (jnp.mean(logits) * jnp.asarray(1e-12, logits.dtype)).astype(h_a.dtype), None

        carry, _ = jax.lax.scan(body, jnp.zeros((), h_a.dtype), None, length=ITERS)
        return carry

    # warmup / compile, forced by fetch
    float(bench_fn(params, h_a, h_t, mask_a, mask_t))

    t0 = time.perf_counter()
    val = float(bench_fn(params, h_a, h_t, mask_a, mask_t))
    dt = time.perf_counter() - t0
    assert np.isfinite(val)

    utt_per_sec = b * ITERS / dt
    print(json.dumps({
        "metric": "iemocap_seq_fusion_inference_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 1),
        "unit": "utterances/sec/chip",
        "vs_baseline": round(utt_per_sec / NORTH_STAR, 3),
    }))


if __name__ == "__main__":
    main()
