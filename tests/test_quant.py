"""int8 serving-quantization numerics (hriemo.ops.quant).

Gates the int8 path on measured deltas vs the fp32/bf16 reference
(VERDICT.md round 1 next-step #2: "gate on measured logit delta"), at
tiny configs on the CPU mesh; bench.py re-measures at the product config
on real TPU.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hriemo.nn.layers import linear_apply
from hriemo.ops.quant import (
    count_quantized,
    int8_linear,
    quantize_linear_params,
    quantize_rowwise,
    quantize_tree_for_serving,
)


def test_quantize_rowwise_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 384)).astype(np.float32))
    q, s = quantize_rowwise(x)
    assert q.dtype == jnp.int8
    x_hat = q.astype(jnp.float32) * s
    # symmetric int8: per-row max error <= scale/2 = amax/254
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    assert np.abs(np.asarray(x_hat) - np.asarray(x)).max() <= (amax / 254 + 1e-6).max()


def test_quantize_rowwise_zero_row_is_finite():
    x = jnp.zeros((4, 128), jnp.float32)
    q, s = quantize_rowwise(x)
    assert np.isfinite(np.asarray(s)).all()
    assert (np.asarray(q) == 0).all()


def test_int8_linear_matches_fp32():
    rng = np.random.default_rng(1)
    p = {
        "weight": jnp.asarray(rng.standard_normal((512, 384)).astype(np.float32) * 0.05),
        "bias": jnp.asarray(rng.standard_normal((512,)).astype(np.float32) * 0.1),
    }
    x = jnp.asarray(rng.standard_normal((8, 33, 384)).astype(np.float32))
    ref = linear_apply(p, x)
    got = int8_linear(quantize_linear_params(p), x)
    # W8A8 relative error budget: ~1% of the output RMS
    rms = float(jnp.sqrt(jnp.mean(ref**2)))
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 0.05 * rms * np.sqrt(384 / 16), (err, rms)
    # aggregate check: W8A8 on N(0,1) data lands at ~1.05% rel RMS
    rel = float(jnp.sqrt(jnp.mean((got - ref) ** 2))) / rms
    assert rel < 0.015, rel


def test_linear_apply_dispatches_on_quantized_tree():
    rng = np.random.default_rng(2)
    p = {"weight": jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32) * 0.05)}
    x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
    qp = quantize_linear_params(p)
    out = linear_apply(qp, x)
    ref = linear_apply(p, x)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=0.06)


def test_quantize_tree_respects_min_dim_and_skip():
    tree = {
        "embeddings": {"word_embeddings": {"weight": jnp.ones((300, 300))}},
        "big": {"weight": jnp.ones((300, 300)), "bias": jnp.zeros((300,))},
        "small": {"weight": jnp.ones((8, 300)), "bias": jnp.zeros((8,))},
        "norm": {"weight": jnp.ones((300,)), "bias": jnp.zeros((300,))},
    }
    q = quantize_tree_for_serving(tree, min_dim=256)
    assert "w_int8" in q["big"]
    assert "weight" in q["small"] and "w_int8" not in q["small"]
    assert "weight" in q["embeddings"]["word_embeddings"]
    assert "weight" in q["norm"]
    assert count_quantized(q) == 1


@pytest.mark.parametrize("frontend", ["wavlm", "bert"])
def test_frontend_int8_logit_delta(frontend):
    """End-to-end int8 vs fp32 on tiny frontends: bounded hidden-state
    delta and identical masks. min_dim lowered so the tiny GEMMs qualify."""
    rng = np.random.default_rng(3)
    if frontend == "wavlm":
        from hriemo.frontends import WavLMConfig, WavLMEncoder

        enc = WavLMEncoder(WavLMConfig.tiny())
        wav = jnp.asarray(rng.standard_normal((2, 1600)).astype(np.float32) * 0.1)
        mask = jnp.ones((2, 1600), jnp.int32)
        ref, ref_mask = enc.apply(enc.params, wav, mask)
        qp = quantize_tree_for_serving(enc.params, min_dim=16)
        assert count_quantized(qp) > 0
        got, got_mask = enc.apply(qp, wav, mask)
        assert np.array_equal(np.asarray(ref_mask), np.asarray(got_mask))
    else:
        from hriemo.frontends import BertConfig, BertEncoder

        enc = BertEncoder(BertConfig.tiny())
        ids = jnp.asarray(rng.integers(0, 99, size=(2, 12)).astype(np.int32))
        mask = jnp.ones((2, 12), jnp.int32)
        ref, _ = enc.apply(enc.params, ids, mask)
        qp = quantize_tree_for_serving(enc.params, min_dim=16)
        assert count_quantized(qp) > 0
        got, _ = enc.apply(qp, ids, mask)
    rms = float(jnp.sqrt(jnp.mean(jnp.asarray(ref, jnp.float32) ** 2)))
    rel = float(jnp.sqrt(jnp.mean((jnp.asarray(got, jnp.float32) - ref) ** 2))) / rms
    # residual-stream error accumulates over layers; 5% rel RMS is the gate
    assert rel < 0.05, rel


def test_int8_linear_packed_matches_separate():
    from hriemo.ops.quant import int8_linear_packed

    rng = np.random.default_rng(5)
    ps = [quantize_linear_params({
        "weight": jnp.asarray(rng.standard_normal((o, 128)).astype(np.float32) * 0.05),
        "bias": jnp.asarray(rng.standard_normal((o,)).astype(np.float32) * 0.1),
    }) for o in (128, 256, 384)]
    x = jnp.asarray(rng.standard_normal((4, 9, 128)).astype(np.float32))
    packed = int8_linear_packed(ps, x)
    for p, got in zip(ps, packed):
        ref = int8_linear(p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_int8_linear_bf16_input_dtype_roundtrip():
    rng = np.random.default_rng(4)
    p = {"weight": jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32) * 0.05)}
    x = jnp.asarray(rng.standard_normal((4, 256))).astype(jnp.bfloat16)
    out = int8_linear(quantize_linear_params(p), x)
    assert out.dtype == jnp.bfloat16


def test_mha_int8_dispatch_matches_bf16():
    """Quantized packed-MHA params: logits close to the fp path."""
    from hriemo.nn.attention import mha_apply, mha_init
    from hriemo.ops.quant import count_quantized, quantize_tree_for_serving

    d, h = 256, 4
    params = mha_init(jax.random.key(0), d)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 9, d)).astype(np.float32) * 0.5)
    kv = jnp.asarray(rng.standard_normal((2, 7, d)).astype(np.float32) * 0.5)
    mask = jnp.asarray(np.array([[False] * 7, [False] * 5 + [True] * 2]))

    ref, _ = mha_apply(params, q, kv, kv, h, key_padding_mask=mask)
    pq = quantize_tree_for_serving(params, min_dim=128)
    assert count_quantized(pq) == 2  # in_proj + out_proj
    got, _ = mha_apply(pq, q, kv, kv, h, key_padding_mask=mask)
    err = np.abs(np.asarray(ref) - np.asarray(got))
    rel = err.max() / (np.abs(np.asarray(ref)).max() + 1e-9)
    assert rel < 0.05, rel


def test_mlp2_int8_fused_matches_per_op():
    """Fused W8A8 mlp2 kernel == per-op int8 Linear-ReLU-Linear."""
    from hriemo.nn.layers import linear_apply, mlp2_init, relu
    from hriemo.ops.fused_ffn import mlp2_int8
    from hriemo.ops.quant import quantize_tree_for_serving

    # square (the cross-modal FFN shape class) AND rectangular (the TACFN
    # beta-gate is 3072->256->768 — caught a square-only kernel bug)
    for din, f, dout in [(256, 512, 256), (384, 128, 256)]:
        p = quantize_tree_for_serving(
            mlp2_init(jax.random.key(0), din, f, dout), min_dim=128)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((3, 17, din)).astype(np.float32) * 0.5)
        ref = linear_apply(p["2"], relu(linear_apply(p["0"], x)))
        got = mlp2_int8(p["0"], p["2"], x, block_m=64)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)
        med = np.median(np.abs(np.asarray(got) - np.asarray(ref)))
        assert med < 2e-3, med


def test_int8_report_outlier_mitigation():
    """CI for the pretrained int8 runbook (VERDICT r2 next #4): inject a
    dominating activation channel (the classic W8A8 failure — one huge
    channel inflates every row's dynamic scale and crushes the others)
    and assert int8_numerics_report (a) sees the blown envelope, (b)
    identifies the offending layer via the crest statistic, and (c) the
    selective-bf16 mitigation brings the output back inside the envelope.
    """
    from hriemo.ops.quant import int8_numerics_report

    rng = np.random.default_rng(0)
    d = 64
    lin = lambda o, i, s=0.3: {
        "weight": jnp.asarray(rng.standard_normal((o, i)).astype(np.float32)) * s / np.sqrt(i),
        "bias": jnp.zeros((o,), jnp.float32),
    }
    params = {"l1": lin(d, d, 4.0), "l2": lin(d, d, 4.0), "head": lin(8, d, 4.0)}
    # inject: l1's output channel 3 is ~100x the rest -> l2 sees one
    # dominating input channel in every row
    params["l1"]["weight"] = params["l1"]["weight"].at[3].mul(300.0)

    x = jnp.asarray(rng.standard_normal((32, d)).astype(np.float32))

    def apply_fn(p, x):
        h = jax.nn.relu(linear_apply(p["l1"], x))
        h = jax.nn.relu(linear_apply(p["l2"], h))
        logits = linear_apply(p["head"], h).astype(jnp.float32)
        return {"probs": jax.nn.softmax(logits, -1)}

    rep = int8_numerics_report(apply_fn, params, (x,), envelope=0.01,
                               min_dim=8, max_reverts=3)

    assert rep["n_quantized_layers"] == 3
    assert rep["deltas_full_int8"]["probs"] > 0.01, (
        "outlier injection should blow the envelope")
    # the layer downstream of the dominating channel has the huge crest
    assert rep["activation_amax"]["l2"]["crest_p90"] > \
        1.5 * rep["activation_amax"]["l1"]["crest_p90"]
    assert rep["reverted_layers"], "mitigation must engage"
    assert rep["reverted_layers"][0] == "l2", (
        "crest ranking should revert the poisoned layer first: "
        f"{rep['reverted_layers']}")
    assert rep["within_envelope"], rep["deltas_final"]
    assert rep["deltas_final"]["probs"] <= 0.01


def test_int8_report_clean_weights_within_envelope():
    """Clean (non-outlier) weights pass the report without mitigation."""
    from hriemo.ops.quant import int8_numerics_report

    rng = np.random.default_rng(1)
    d = 64
    lin = lambda o, i: {
        "weight": jnp.asarray(rng.standard_normal((o, i)).astype(np.float32)) / np.sqrt(i),
        "bias": jnp.zeros((o,), jnp.float32),
    }
    params = {"l1": lin(d, d), "head": lin(8, d)}
    x = jnp.asarray(rng.standard_normal((16, d)).astype(np.float32))

    def apply_fn(p, x):
        h = jax.nn.relu(linear_apply(p["l1"], x))
        return {"probs": jax.nn.softmax(
            linear_apply(p["head"], h).astype(jnp.float32), -1)}

    rep = int8_numerics_report(apply_fn, params, (x,), envelope=0.02,
                               min_dim=8)
    assert rep["within_envelope"]
    assert rep["reverted_layers"] == []
    assert set(rep["activation_amax"]) == {"l1", "head"}
