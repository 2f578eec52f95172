#!/usr/bin/env python3
"""Benchmark harness — prints ONE JSON line.

Headline metric = the BASELINE.json north star: **end-to-end IEMOCAP
utterances/sec/chip including the WavLM + BERT frontends** (waveform +
tokens → WavLM-base-plus → BERT-base → TACFN fusion → emotion decoder),
bf16, one compiled graph per length bucket. Throughput is weight-
independent, so the frontends run with random init (no pretrained weights
are downloadable in this environment); real weights change nothing about
the timing.

Method:
  * utterance durations are drawn from an IEMOCAP-like distribution
    (lognormal, mean ≈ 4.5 s, capped at 10 s — the reference's own cap);
  * clips are bucketed to {2.5, 5, 10} s — the framework's serving
    strategy (hriemo.infer.streaming bucket_seconds) — and each bucket's
    steady-state ms/batch is measured with a jitted lax.scan closed by a
    scalar fetch (the remote TPU tunnel defers execution until a host
    fetch, so naive timing lies);
  * the reported throughput is the duration-distribution-weighted mix;
  * ``p50_ms_per_clip`` is the single-clip (B=1) end-to-end latency at the
    median-duration bucket;
  * ``fusion_only_utt_per_sec`` tracks the fusion-stack-only number from
    earlier rounds for continuity.

``vs_baseline`` is value / 5000 (the driver's north-star target; the
reference publishes no wall-clock numbers, SURVEY.md §6).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

NORTH_STAR = 5000.0
SR = 16_000
# measured on v5e: a 7.5 s bucket costs MORE per utterance than the 10 s
# bucket (2.97 vs 2.77 ms/utt at B=64) — conv/attention padding lands on
# the same tiles — so the serving config uses three buckets
BUCKETS_S = (2.5, 5.0, 10.0)
B = 64
LT = 128
ITERS = 10


def _duration_mix(n=4096, seed=0):
    """IEMOCAP-like clip durations (s), capped at 10 s."""
    rng = np.random.default_rng(seed)
    d = rng.lognormal(mean=np.log(4.0), sigma=0.5, size=n)
    return np.clip(d, 0.6, 10.0)


def main():
    from hriemo.frontends import BertConfig, BertEncoder, WavLMConfig, WavLMEncoder
    from hriemo.models import FusionWithEmotionDecoder

    import dataclasses

    # tanh GELU: 22% faster e2e (177->139 ms at the 10s bucket); its fp32
    # delta (max 0.03) is under the bf16 compute noise floor (0.08) this
    # serving path already accepts
    wavlm = WavLMEncoder(dataclasses.replace(WavLMConfig.base_plus(), fast_gelu=True))
    bert_cfg = dataclasses.replace(BertConfig.base_uncased(), fast_gelu=True)
    bert = BertEncoder(bert_cfg)
    fusion = FusionWithEmotionDecoder(
        d_model=768, num_emotions=4, n_heads=8,
        num_layers_fusion=2, num_layers_decoder=2, beta_hidden=256, dropout=0.1,
    )
    cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), t)
    P = {"w": cast(wavlm.params), "b": cast(bert.params), "f": cast(fusion.params)}
    rng = np.random.default_rng(0)

    def e2e_fn(iters):
        @jax.jit
        def fn(P, wavs, wmask, ids, tmask):
            def body(c, _):
                # make EVERY branch loop-variant or XLA hoists it out of the
                # scan and the timing under-counts (verified: invariant work
                # is amortised across iterations). (c > 9e9) is always 0.
                ids_v = ids + (c > jnp.asarray(9e9, c.dtype)).astype(ids.dtype)
                h_a, fmask = wavlm.apply(P["w"], wavs + c, wmask)
                h_t, _ = bert.apply(P["b"], ids_v, tmask)
                logits, _beta, _ = fusion.apply(
                    P["f"], h_a, h_t.astype(h_a.dtype), fmask == 0, tmask == 0)
                return (jnp.mean(logits.astype(jnp.float32)) * 1e-12).astype(wavs.dtype), None
            c, _ = jax.lax.scan(body, jnp.zeros((), wavs.dtype), None, length=iters)
            return c
        return fn

    def measure(batch, seconds, iters=ITERS):
        t = int(seconds * SR)
        fn = e2e_fn(iters)
        wavs = jnp.asarray(rng.standard_normal((batch, t)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
        wmask = jnp.ones((batch, t), jnp.int32)
        ids = jnp.asarray(rng.integers(0, 30000, size=(batch, LT)).astype(np.int32))
        tmask = jnp.ones((batch, LT), jnp.int32)
        float(fn(P, wavs, wmask, ids, tmask))  # compile
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(fn(P, wavs, wmask, ids, tmask))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best  # seconds per batch

    # per-bucket steady-state cost
    per_batch_s = {sec: measure(B, sec) for sec in BUCKETS_S}

    # weight by the realistic duration mix
    durations = _duration_mix()
    bucket_of = np.searchsorted(np.asarray(BUCKETS_S), durations)
    total_time = sum(
        (bucket_of == i).sum() / B * per_batch_s[sec]
        for i, sec in enumerate(BUCKETS_S)
    )
    e2e_utt_per_sec = len(durations) / total_time

    # p50 per-clip latency: single clip at the median bucket
    median_bucket = BUCKETS_S[int(np.searchsorted(BUCKETS_S, np.median(durations)))]
    p50_latency_ms = measure(1, median_bucket, iters=20) * 1000

    # fusion-only continuity metric (precomputed features path)
    la = 499
    h_a = jnp.asarray(rng.standard_normal((B, la, 768)).astype(np.float32)).astype(jnp.bfloat16)
    h_t = jnp.asarray(rng.standard_normal((B, LT, 768)).astype(np.float32)).astype(jnp.bfloat16)
    mask_a = jnp.asarray(np.arange(la)[None, :] >= rng.integers(la // 2, la + 1, size=B)[:, None])
    mask_t = jnp.asarray(np.arange(LT)[None, :] >= rng.integers(LT // 2, LT + 1, size=B)[:, None])

    @jax.jit
    def fusion_fn(p, h_a, h_t, mask_a, mask_t):
        def body(c, _):
            # both modalities loop-variant (anti-hoisting, see e2e body)
            logits, _b, _ = fusion.apply(p, h_a + c, h_t + c, mask_a, mask_t)
            return (jnp.mean(logits.astype(jnp.float32)) * 1e-12).astype(h_a.dtype), None
        c, _ = jax.lax.scan(body, jnp.zeros((), h_a.dtype), None, length=30)
        return c

    float(fusion_fn(P["f"], h_a, h_t, mask_a, mask_t))
    best = float("inf")
    for _ in range(2):  # best-of-N over the flaky tunnel (CLAUDE.md)
        t0 = time.perf_counter()
        float(fusion_fn(P["f"], h_a, h_t, mask_a, mask_t))
        best = min(best, time.perf_counter() - t0)
    fusion_utt_per_sec = B * 30 / best

    print(json.dumps({
        "metric": "iemocap_e2e_utterances_per_sec_per_chip_incl_frontends",
        "value": round(e2e_utt_per_sec, 1),
        "unit": "utterances/sec/chip",
        "vs_baseline": round(e2e_utt_per_sec / NORTH_STAR, 3),
        "p50_ms_per_clip": round(p50_latency_ms, 1),
        "fusion_only_utt_per_sec": round(fusion_utt_per_sec, 1),
        "bucket_ms_per_batch64": {str(k): round(v * 1000, 1) for k, v in per_batch_s.items()},
    }))


if __name__ == "__main__":
    main()
