#!/usr/bin/env python3
"""Per-kernel on-TPU numerics A/B (VERDICT r2 next #7).

Runs each Pallas serving kernel against its XLA reference **on the real
chip at product shapes** and prints max deltas. Until now, per-kernel
equivalence was proven only in interpret mode (tests/test_*) — on actual
TPU the only numerics gate was the whole-model ``int8_prob_delta`` in
bench.py, which smears any Mosaic-compilation drift across the stack.
This tool localises it: one command, one line per (kernel, shape).

Method: each comparison evaluates the SAME quantized param tree through
(a) the megakernel route and (b) the per-op XLA route (router forced
off), so the only difference is the kernel compilation itself. Both
sides run jitted on the default backend. The per-op route recomputes
activation quantization at different points (e.g. the kernel keeps fp32
chains in VMEM where XLA round-trips bf16), so small deltas are
expected; the pass thresholds mirror the interpret-mode tests.

Usage:  python tools/kernel_numerics.py [--json out.json]

Numbers are recorded in PERF.md ("Kernel numerics on real TPU").
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

# product serving shapes: {bucket seconds: WavLM frame count} — derived
# from bench.py's BUCKETS_S (the serving-config single source of truth)
# so a bucket change here can't silently under-cover; the committed
# kernel_numerics.json is drift-guarded by tests/test_kernel_numerics_
# drift.py against the same derivation.
def _bucket_frames():
    import bench
    from hriemo.frontends import WavLMConfig

    cfg = WavLMConfig.base_plus()

    def frames(sec):
        t = int(sec * 16_000)
        for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
            t = (t - k) // s + 1
        return t

    return {sec: frames(sec) for sec in bench.BUCKETS_S}


BUCKET_L = _bucket_frames()
B = 8  # batch for numerics (product batches only repeat the grid)
THRESH = {  # pass thresholds, mirroring the interpret-mode tests
    "wavlm_attention_block": 0.05,   # bf16 ctx concat vs fp32 chain
    "mha_block": 0.05,
    "ffn_block": 0.05,
    "mlp2": 0.05,
    "flash_mha": 0.02,
    "groupnorm_stats": 1e-3,
}

log = lambda *a: (print(*a), sys.stdout.flush())


def _delta(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.abs(a - b).max())


def check_wavlm_attention_block(rng, results):
    import hriemo.ops.attention_block as AB
    from hriemo.frontends import WavLMConfig, WavLMEncoder
    from hriemo.frontends.wavlm import relative_position_buckets
    from hriemo.ops.quant import quantize_tree_for_serving

    cfg = dataclasses.replace(WavLMConfig.base_plus(), fast_gelu=True)
    wavlm = WavLMEncoder(cfg)
    P = quantize_tree_for_serving(
        jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), wavlm.params))
    lp = P["encoder"]["layers"]["0"]
    for sec, l in BUCKET_L.items():
        x = jnp.asarray(rng.standard_normal((B, l, 768)).astype(np.float32)
                        * 0.3).astype(jnp.bfloat16)
        buckets = relative_position_buckets(cfg, l)
        pos = lp["attention"]["rel_attn_embed"]["weight"][buckets] \
            .transpose(2, 0, 1).astype(jnp.float32)
        kpb = jnp.where(
            jnp.arange(l)[None, :] >= jnp.asarray(
                rng.integers(l // 2, l + 1, size=B))[:, None],
            -1e9, 0.0).astype(jnp.float32)

        @jax.jit
        def kernel_fn(x):
            return AB.attention_block_int8(
                lp["attention"], lp["layer_norm"], x, pos, kpb,
                cfg.layer_norm_eps)

        @jax.jit
        def ref_fn(x):
            # WavLMEncoder._attention IS the per-op XLA route (the layer
            # loop routes to the megakernel separately), so no patching;
            # it takes the padding bias in [B,1,1,L] broadcast form
            attn = wavlm._attention(lp["attention"], x,
                                    kpb[:, None, None, :], pos)
            from hriemo.nn.layers import layer_norm_apply
            return layer_norm_apply(lp["layer_norm"], x + attn,
                                    cfg.layer_norm_eps)

        d = _delta(kernel_fn(x), ref_fn(x))
        results.append(("wavlm_attention_block", f"L={l} (bucket {sec}s)", d))


def check_mha_block(rng, results):
    import hriemo.nn.attention as NA
    from hriemo.ops.quant import quantize_tree_for_serving

    d_model, h = 768, 8
    p = NA.mha_init(jax.random.key(0), d_model)
    p = jax.tree_util.tree_map(
        lambda x: (x * 0.3).astype(jnp.bfloat16), p)
    q = quantize_tree_for_serving(p)
    import bench
    shapes = [(499, 499, "self L=499"), (499, 128, "cross 499x128"),
              (128, 128, "self L=128")]
    # serving text buckets, derived from bench.py (the serving-config
    # single source of truth) so a bucket change cannot leave this tool
    # stale: BERT/fusion text-side self-attention at every bucket plus
    # cross-modal a<->t at the max frame count x every bucket in BOTH
    # directions (tests/test_kernel_numerics_drift.py requires all of
    # these rows).
    for lt in bench.TEXT_BUCKETS:
        shapes += [(lt, lt, f"self L={lt}"),
                   (499, lt, f"cross 499x{lt}"),
                   (lt, 499, f"cross {lt}x499")]
    for (lq, lk, tag) in shapes:
        xq = jnp.asarray(rng.standard_normal((B, lq, d_model)).astype(np.float32)
                         * 0.5).astype(jnp.bfloat16)
        xkv = xq if lq == lk else jnp.asarray(
            rng.standard_normal((B, lk, d_model)).astype(np.float32)
            * 0.5).astype(jnp.bfloat16)
        kpm = jnp.asarray(
            np.arange(lk)[None, :] >= rng.integers(lk // 2, lk + 1, size=B)[:, None])

        @jax.jit
        def kfn(xq, xkv, kpm):
            out, _ = NA.mha_apply(q, xq, xkv, xkv, h, key_padding_mask=kpm)
            return out

        @jax.jit
        def rfn(xq, xkv, kpm):
            # use_kernel=False forces the per-op einsum route on the SAME
            # quantized tree (the escape hatch re-enabled this round)
            out, _ = NA.mha_apply(q, xq, xkv, xkv, h, key_padding_mask=kpm,
                                  use_kernel=False)
            return out

        d = _delta(kfn(xq, xkv, kpm), rfn(xq, xkv, kpm))
        results.append(("mha_block", tag, d))


def check_ffn_block(rng, results):
    from hriemo.ops import fused_ffn as FF
    from hriemo.ops.quant import quantize_linear_params

    d, f = 768, 3072
    w1 = jnp.asarray(rng.standard_normal((f, d)).astype(np.float32)) * 0.03
    b1 = jnp.asarray(rng.standard_normal((f,)).astype(np.float32)) * 0.02
    w2 = jnp.asarray(rng.standard_normal((d, f)).astype(np.float32)) * 0.03
    b2 = jnp.asarray(rng.standard_normal((d,)).astype(np.float32)) * 0.02
    g = jnp.ones((d,)) * 0.9
    be = jnp.zeros((d,)) + 0.05
    p_in = quantize_linear_params({"weight": w1, "bias": b1})
    p_out = quantize_linear_params({"weight": w2, "bias": b2})
    for l in (min(BUCKET_L.values()), max(BUCKET_L.values())):
        x = jnp.asarray(rng.standard_normal((B * l, d)).astype(np.float32)
                        * 0.5).astype(jnp.bfloat16)
        qp = dict(w1_q=p_in["w_int8"].T, w1_s=p_in["w_scale"].T,
                  b1=b1.astype(jnp.float32)[None, :],
                  w2_q=p_out["w_int8"].T, w2_s=p_out["w_scale"].T,
                  b2=b2.astype(jnp.float32)[None, :])

        @jax.jit
        def kfn(x):
            return FF.ffn_block_int8(x, qp, g, be, 1e-5, True)

        @jax.jit
        def rfn(x):
            # per-op int8 route: same quantized weights, XLA ops
            from hriemo.nn.layers import layer_norm_apply, linear_apply
            h = jax.nn.gelu(linear_apply(p_in, x), approximate=True)
            y = x + linear_apply(p_out, h)
            return layer_norm_apply({"weight": g, "bias": be}, y, 1e-5)

        d_ = _delta(kfn(x), rfn(x))
        results.append(("ffn_block", f"M={B * l}", d_))


def check_mlp2(rng, results):
    from hriemo.ops import fused_ffn as FF
    from hriemo.ops.quant import quantize_linear_params

    din, f, dout = 3072, 256, 768  # the TACFN β-gate rectangle
    p0 = quantize_linear_params({
        "weight": jnp.asarray(rng.standard_normal((f, din)).astype(np.float32)) * 0.02,
        "bias": jnp.zeros((f,), jnp.float32)})
    p2 = quantize_linear_params({
        "weight": jnp.asarray(rng.standard_normal((dout, f)).astype(np.float32)) * 0.05,
        "bias": jnp.zeros((dout,), jnp.float32)})
    x = jnp.asarray(rng.standard_normal((64, din)).astype(np.float32)
                    * 0.5).astype(jnp.bfloat16)

    @jax.jit
    def kfn(x):
        return FF.mlp2_int8(p0, p2, x)

    @jax.jit
    def rfn(x):
        from hriemo.nn.layers import linear_apply
        return linear_apply(p2, jax.nn.relu(linear_apply(p0, x)))

    results.append(("mlp2", f"{din}->{f}->{dout}", _delta(kfn(x), rfn(x))))


def check_flash_mha(rng, results):
    from hriemo.ops.flash_attention import flash_mha

    b, h, hd = B, 8, 96
    for (lq, lk) in [(499, 499), (499, 128)]:
        q = jnp.asarray(rng.standard_normal((b, h, lq, hd)).astype(np.float32)
                        * 0.3).astype(jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, lk, hd)).astype(np.float32)
                        * 0.3).astype(jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, lk, hd)).astype(np.float32)
                        * 0.3).astype(jnp.bfloat16)
        kpm = jnp.asarray(
            np.arange(lk)[None, :] >= rng.integers(lk // 2, lk + 1, size=b)[:, None])

        @jax.jit
        def kfn(q, k, v, kpm):
            return flash_mha(q, k, v, kpm)

        @jax.jit
        def rfn(q, k, v, kpm):
            import math
            s = jnp.einsum("bhqd,bhkd->bhqk", q * (1.0 / math.sqrt(hd)), k,
                           preferred_element_type=jnp.float32)
            s = jnp.where(kpm[:, None, None, :], -1e9, s)
            p = jax.nn.softmax(s, -1).astype(q.dtype)
            return jnp.einsum("bhqk,bhkd->bhqd", p, v)

        d = _delta(kfn(q, k, v, kpm), rfn(q, k, v, kpm))
        results.append(("flash_mha", f"Lq={lq} Lk={lk}", d))


def check_groupnorm_stats(rng, results):
    from hriemo.ops.conv_stack import group_norm_stats_from_waveform

    wave = jnp.asarray(rng.standard_normal((B, 80000)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.standard_normal((512, 1, 10)).astype(np.float32) * 0.2)

    @jax.jit
    def kfn(wave):
        return group_norm_stats_from_waveform(wave, w)

    @jax.jit
    def rfn(wave):
        from hriemo.frontends.wavlm import conv1d
        y = conv1d(wave[:, None, :], w, None, stride=5)  # [B, C, T']
        return jnp.mean(y, -1), jnp.var(y, -1)

    km, kv = kfn(wave)
    rm, rv = rfn(wave)
    results.append(("groupnorm_stats", "mean", _delta(km, rm)))
    results.append(("groupnorm_stats", "var", _delta(kv, rv)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    log(f"backend: {jax.default_backend()} "
        f"({'REAL kernel compile' if jax.default_backend() == 'tpu' else 'interpret mode'})")
    rng = np.random.default_rng(0)
    results = []
    done = 0
    for fn in (check_wavlm_attention_block, check_mha_block, check_ffn_block,
               check_mlp2, check_flash_mha, check_groupnorm_stats):
        fn(rng, results)
        for name, tag, d in results[done:]:  # print incrementally
            log(f"{name:24s} {tag:20s} max|Δ| = {d:.3e}  "
                f"[{'ok' if d <= THRESH[name] else 'FAIL > ' + str(THRESH[name])}]")
        done = len(results)

    fails = sum(d > THRESH[name] for name, _, d in results)
    if args.json:
        with open(args.json, "w") as f:
            json.dump([{"kernel": n, "shape": t, "max_delta": d,
                        "threshold": THRESH[n]} for n, t, d in results],
                      f, indent=2)
        log(f"written to {args.json}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
