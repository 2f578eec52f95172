"""Correctness of the WavLM attention-sublayer megakernel (interpret mode).

Contract: ops/attention_block.attention_block_int8 == the per-op int8
route (int8_linear projections + XLA gated-bias attention + LayerNorm)
to within bf16-cast tolerance; padded/masked keys must not influence
valid outputs; the apply-level routing must agree end-to-end.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hriemo.core.masking import NEG_INF
from hriemo.frontends import WavLMConfig, WavLMEncoder
from hriemo.nn.layers import layer_norm_apply
from hriemo.ops.attention_block import attention_block_int8
from hriemo.ops.quant import quantize_tree_for_serving

D, H, L, B = 256, 4, 96, 3
EPS = 1e-5


def _layer_params(key, d=D, h=H):
    keys = iter(jax.random.split(key, 16))
    lin = lambda din, dout: {
        "weight": jax.random.normal(next(keys), (dout, din)) * 0.05,
        "bias": jax.random.normal(next(keys), (dout,)) * 0.02,
    }
    ap = {
        "q_proj": lin(d, d), "k_proj": lin(d, d),
        "v_proj": lin(d, d), "out_proj": lin(d, d),
        "gru_rel_pos_const": jnp.ones((1, h, 1, 1)) * 1.3,
        "gru_rel_pos_linear": lin(d // h, 8),
    }
    p_ln = {"weight": jnp.ones((d,)) * 0.9, "bias": jnp.zeros((d,)) + 0.05}
    return ap, p_ln


def _reference(ap, p_ln, x, pos, kpb):
    """Per-op int8 route: int8_linear + XLA gated attention + LN."""
    import math

    from hriemo.nn.layers import linear_apply

    b, l, d = x.shape
    h = ap["gru_rel_pos_const"].shape[1]
    hd = d // h
    ghs = x.reshape(b, l, h, hd)
    proj = linear_apply(
        {"weight": ap["gru_rel_pos_linear"]["weight"].astype(jnp.bfloat16),
         "bias": ap["gru_rel_pos_linear"]["bias"]}, ghs.astype(jnp.bfloat16))
    proj = proj.reshape(b, l, h, 2, 4).sum(-1).astype(jnp.float32)
    gates = jax.nn.sigmoid(proj)
    const = ap["gru_rel_pos_const"].reshape(1, 1, h, 1)
    gate = (gates[..., 0:1] * (gates[..., 1:2] * const - 1.0) + 2.0)
    gate = gate.transpose(0, 2, 1, 3)  # [B,H,L,1]

    mk = lambda n: quantize_tree_for_serving({"p": ap[n]}, min_dim=1)["p"]
    q = linear_apply(mk("q_proj"), x).reshape(b, l, h, hd).transpose(0, 2, 1, 3)
    k = linear_apply(mk("k_proj"), x).reshape(b, l, h, hd).transpose(0, 2, 1, 3)
    v = linear_apply(mk("v_proj"), x).reshape(b, l, h, hd).transpose(0, 2, 1, 3)
    q = q.astype(jnp.bfloat16)
    k = k.astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    s = s + gate * pos[None] + kpb[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    ctx = ctx.astype(jnp.bfloat16).transpose(0, 2, 1, 3).reshape(b, l, d)
    y = linear_apply(mk("out_proj"), ctx.astype(x.dtype)).astype(jnp.float32)
    return layer_norm_apply(p_ln, (y + x.astype(jnp.float32)).astype(x.dtype), EPS)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.key(0)
    ap, p_ln = _layer_params(key)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32) * 0.5)
    pos = jnp.asarray(rng.standard_normal((H, L, L)).astype(np.float32) * 0.3)
    lens = np.array([L, L - 17, L // 2])
    kpb = jnp.where(np.arange(L)[None, :] < lens[:, None], 0.0, NEG_INF
                    ).astype(jnp.float32)
    apq = quantize_tree_for_serving(ap, min_dim=64)
    return apq, p_ln, x, pos, kpb, lens


@pytest.mark.parametrize("pipe", ["0", "1", "2", "3"])
@pytest.mark.parametrize("scalefold", [None, "1"])
def test_matches_per_op_int8_route(setup, monkeypatch, pipe, scalefold):
    """All kernel routing variants (advisor r3 / VERDICT r3 next #4):
    HRIEMO_PIPE off/full/chunk x HRIEMO_NO_SCALEFOLD unset/1. The default
    route differs by Lp (full-pipe at Lp<=384, non-pipe at Lp=512), so
    every variant must stay pinned to the per-op reference."""
    monkeypatch.setenv("HRIEMO_PIPE", pipe)
    if scalefold is None:
        monkeypatch.delenv("HRIEMO_NO_SCALEFOLD", raising=False)
    else:
        monkeypatch.setenv("HRIEMO_NO_SCALEFOLD", scalefold)
    apq, p_ln, x, pos, kpb, lens = setup
    got = attention_block_int8(apq, p_ln, x, pos, kpb, EPS)
    ref = _reference(apq, p_ln, x, pos, kpb)
    for i, n in enumerate(lens):
        np.testing.assert_allclose(
            np.asarray(got[i, :n], np.float32),
            np.asarray(ref[i, :n], np.float32), atol=5e-2, rtol=5e-2)
    # tight agreement in the bulk: both paths share the exact same int8
    # quantization math, so only bf16 cast order differs
    diff = np.abs(np.asarray(got[0], np.float32) - np.asarray(ref[0], np.float32))
    assert np.median(diff) < 5e-3, np.median(diff)


def test_pipe_variants_agree_across_lp(monkeypatch):
    """pipe=off == pipe=full == pipe=chunk, at an Lp<=384 shape AND an
    Lp=512 shape (the 10 s bucket's tile, where the default route is
    non-pipe and a refactor could silently break the fallback —
    VERDICT r3 weak #2). The four modes (off/full/chunk/full2) compute
    identical per-head math in a different issue order, so outputs must
    agree bitwise."""
    key = jax.random.key(3)
    ap, p_ln = _layer_params(key)
    apq = quantize_tree_for_serving(ap, min_dim=64)
    rng = np.random.default_rng(11)
    for l in (96, 400):  # lp = 128 and 512
        x = jnp.asarray(rng.standard_normal((1, l, D)).astype(np.float32) * 0.5)
        pos = jnp.asarray(rng.standard_normal((H, l, l)).astype(np.float32) * 0.3)
        kpb = jnp.where(np.arange(l)[None, :] < l - 9, 0.0, NEG_INF
                        ).astype(jnp.float32)
        outs = {}
        for mode in ("0", "1", "2", "3"):
            monkeypatch.setenv("HRIEMO_PIPE", mode)
            outs[mode] = np.asarray(
                attention_block_int8(apq, p_ln, x, pos, kpb, EPS), np.float32)
        np.testing.assert_array_equal(outs["0"], outs["1"])
        np.testing.assert_array_equal(outs["0"], outs["2"])
        np.testing.assert_array_equal(outs["0"], outs["3"])


def test_scale_fold_bit_exact_at_hd64(setup, monkeypatch):
    """The folded 1/sqrt(hd) is claimed bit-exact at hd=64 (0.125 is a
    power of two: it commutes through the bf16 cast of q and through
    every fp32 rounding). Pin the claim: folded == unfolded bitwise on
    the hd=64 WavLM kernel; the mha kernel likewise at hd=64."""
    from hriemo.nn.attention import mha_init
    from hriemo.ops.attention_block import mha_block_int8

    apq, p_ln, x, pos, kpb, lens = setup  # D=256, H=4 -> hd=64
    monkeypatch.delenv("HRIEMO_NO_SCALEFOLD", raising=False)
    folded = np.asarray(attention_block_int8(apq, p_ln, x, pos, kpb, EPS))
    monkeypatch.setenv("HRIEMO_NO_SCALEFOLD", "1")
    unfolded = np.asarray(attention_block_int8(apq, p_ln, x, pos, kpb, EPS))
    np.testing.assert_array_equal(folded, unfolded)

    d, h = 256, 4  # hd=64
    params = quantize_tree_for_serving(mha_init(jax.random.key(6), d),
                                       min_dim=128)
    rng = np.random.default_rng(13)
    xq = jnp.asarray(rng.standard_normal((2, 96, d)).astype(np.float32) * 0.5)
    monkeypatch.setenv("HRIEMO_NO_SCALEFOLD", "1")
    m_unf = np.asarray(mha_block_int8(params, xq, xq, None, h))
    monkeypatch.delenv("HRIEMO_NO_SCALEFOLD", raising=False)
    m_fold = np.asarray(mha_block_int8(params, xq, xq, None, h))
    np.testing.assert_array_equal(m_fold, m_unf)


def test_scale_fold_hd96_within_bf16_rounding(monkeypatch):
    """At hd!=64 the fold crosses the bf16 cast of q (advisor r3): the
    difference must be bf16-rounding-level, not larger."""
    from hriemo.nn.attention import mha_init
    from hriemo.ops.attention_block import mha_block_int8

    d, h = 384, 4  # hd=96 — the fusion stack's head width
    params = quantize_tree_for_serving(mha_init(jax.random.key(7), d),
                                       min_dim=128)
    rng = np.random.default_rng(17)
    xq = jnp.asarray(rng.standard_normal((2, 50, d)).astype(np.float32) * 0.5)
    monkeypatch.setenv("HRIEMO_NO_SCALEFOLD", "1")
    unf = np.asarray(mha_block_int8(params, xq, xq, None, h), np.float32)
    monkeypatch.delenv("HRIEMO_NO_SCALEFOLD", raising=False)
    fold = np.asarray(mha_block_int8(params, xq, xq, None, h), np.float32)
    np.testing.assert_allclose(fold, unf, atol=2e-2, rtol=2e-2)
    assert np.median(np.abs(fold - unf)) < 2e-3


def test_masked_keys_do_not_leak(setup):
    apq, p_ln, x, pos, kpb, lens = setup
    got = attention_block_int8(apq, p_ln, x, pos, kpb, EPS)
    # scribble on masked positions of clip 2; valid outputs must not move
    x2 = x.at[2, lens[2]:].set(37.0)
    got2 = attention_block_int8(apq, p_ln, x2, pos, kpb, EPS)
    np.testing.assert_allclose(
        np.asarray(got[2, :lens[2]]), np.asarray(got2[2, :lens[2]]),
        atol=1e-6, rtol=1e-6)


def test_apply_level_routing_agrees(monkeypatch):
    """wavlm.apply with the megakernel routed == the per-op route."""
    import hriemo.ops.attention_block as AB

    cfg = WavLMConfig.tiny(hidden_size=128, num_attention_heads=2,
                           num_hidden_layers=2)
    enc = WavLMEncoder(cfg)
    params = quantize_tree_for_serving(enc.params, min_dim=64)
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32) * 0.1)
    mask = jnp.asarray((np.arange(4000)[None, :]
                        < np.array([[4000], [2500]])).astype(np.int32))

    out_ref, fm_ref = enc.apply(params, wav, mask)

    monkeypatch.setattr(AB, "use_attention_block", lambda *a, **k: True)
    out_krn, fm_krn = enc.apply(params, wav, mask)

    assert out_krn.shape == out_ref.shape
    np.testing.assert_array_equal(np.asarray(fm_ref), np.asarray(fm_krn))
    valid = np.asarray(fm_ref).astype(bool)
    a = np.asarray(out_ref, np.float32)[valid]
    b = np.asarray(out_krn, np.float32)[valid]
    np.testing.assert_allclose(a, b, atol=8e-2, rtol=8e-2)
    assert np.median(np.abs(a - b)) < 1e-2


def test_mha_block_matches_per_op_route():
    """Fused int8 MHA sublayer == mha_apply's per-op int8 path (self and
    cross shapes, padded keys)."""
    from hriemo.nn.attention import mha_apply, mha_init
    from hriemo.ops.attention_block import mha_block_int8
    from hriemo.ops.quant import quantize_tree_for_serving

    d, h = 256, 2  # hd=128
    params = quantize_tree_for_serving(mha_init(jax.random.key(1), d),
                                       min_dim=128)
    rng = np.random.default_rng(2)
    for lq, lk in [(96, 96), (96, 40), (9, 96)]:
        xq = jnp.asarray(rng.standard_normal((2, lq, d)).astype(np.float32) * 0.5)
        xkv = jnp.asarray(rng.standard_normal((2, lk, d)).astype(np.float32) * 0.5)
        lens = np.array([lk, lk - 5])
        mask = jnp.asarray(np.arange(lk)[None, :] >= lens[:, None])
        ref, _ = mha_apply(params, xq, xkv, xkv, h, key_padding_mask=mask,
                           use_kernel=False)
        got = mha_block_int8(params, xq, xkv, mask, h)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=5e-2, rtol=5e-2)
        med = np.median(np.abs(np.asarray(got, np.float32)
                               - np.asarray(ref, np.float32)))
        assert med < 5e-3, med


def test_mha_block_hd96():
    """hd=96 (the fusion stack's 8x96 heads): misaligned head slices."""
    from hriemo.nn.attention import mha_apply, mha_init
    from hriemo.ops.attention_block import mha_block_int8
    from hriemo.ops.quant import quantize_tree_for_serving

    d, h = 384, 4  # hd=96, chunk = lcm(96,128)=384 -> hpc=4
    params = quantize_tree_for_serving(mha_init(jax.random.key(2), d),
                                       min_dim=128)
    rng = np.random.default_rng(3)
    xq = jnp.asarray(rng.standard_normal((2, 50, d)).astype(np.float32) * 0.5)
    ref, _ = mha_apply(params, xq, xq, xq, h, use_kernel=False)
    got = mha_block_int8(params, xq, xq, None, h)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_mha_block_packed_short_rows(monkeypatch):
    """Packed-short-row mode (L<=64, d%128==0): 128//sub elements share one
    128-lane tile with a block-diagonal mask. Must match the einsum route
    exactly as the unpacked kernel does — incl. odd batch (element pad),
    cross-attention with lq != lk, and per-element key padding. The
    q-pack cases (short queries, long keys) exercise the routed-OFF
    HRIEMO_QPACK mode — measured losing on-chip but kept exact."""
    from hriemo.nn.attention import mha_apply, mha_init
    from hriemo.ops.attention_block import mha_block_int8
    from hriemo.ops.quant import quantize_tree_for_serving

    monkeypatch.setenv("HRIEMO_QPACK", "1")

    d, h = 256, 2
    params = quantize_tree_for_serving(mha_init(jax.random.key(5), d),
                                       min_dim=128)
    rng = np.random.default_rng(7)
    for b, lq, lk in [(3, 20, 20),    # sub=32, g=4, batch pad 3->4
                      (5, 10, 50),    # sub=64, g=2, cross lq != lk
                      (8, 64, 64),    # sub=64 exact fit
                      (2, 32, 17),    # sub=32, short keys
                      (9, 16, 16),    # sub=16, g=8, batch pad 9->16
                      (3, 11, 14),    # sub=16, cross lq != lk
                      (3, 6, 6),      # decoder self-attn shape (sub=8)
                      (9, 8, 8),      # sub=8 exact fit, g=16, pad 9->16
                      (2, 5, 8),      # sub=8, cross lq != lk
                      # q-pack mode (round 3c): short queries, long keys
                      (5, 16, 124),   # subq=16, g=8 (cross t->a, 2.5 s)
                      (3, 6, 100),    # subq=16, decoder-style 6 queries
                      (2, 33, 80),    # subq=64 via lq>32
                      (4, 16, 600)]:  # VMEM cap: (128//16)*600>2048 -> subq=64
        xq = jnp.asarray(rng.standard_normal((b, lq, d)).astype(np.float32) * 0.5)
        xkv = jnp.asarray(rng.standard_normal((b, lk, d)).astype(np.float32) * 0.5)
        lens = rng.integers(1, lk + 1, size=b)
        mask = jnp.asarray(np.arange(lk)[None, :] >= lens[:, None])
        ref, _ = mha_apply(params, xq, xkv, xkv, h, key_padding_mask=mask,
                           use_kernel=False)
        got = mha_block_int8(params, xq, xkv, mask, h)
        assert got.shape == (b, lq, d), got.shape
        a = np.asarray(got, np.float32)
        r = np.asarray(ref, np.float32)
        np.testing.assert_allclose(a, r, atol=5e-2, rtol=5e-2)
        assert np.median(np.abs(a - r)) < 5e-3
        assert np.all(np.isfinite(a))


@pytest.mark.parametrize("mode", ["score", "pv", "both"])
def test_int8_core_modes_within_envelope(setup, monkeypatch, mode):
    """HRIEMO_INT8_CORE quantizes the attention-core score/PV GEMMs to
    int8 inside the WavLM megakernel (VERDICT r4 next #2 — the one
    precision lever the speed-of-light claim had not measured). The
    routing decision is perf-driven (PERF.md); numerics must stay well
    inside the int8 serving envelope either way: int8-core vs the
    default bf16 core on the SAME quantized params, plus the per-op
    reference bound the default route already meets."""
    apq, p_ln, x, pos, kpb, lens = setup
    monkeypatch.delenv("HRIEMO_INT8_CORE", raising=False)
    base = np.asarray(attention_block_int8(apq, p_ln, x, pos, kpb, EPS),
                      np.float32)
    monkeypatch.setenv("HRIEMO_INT8_CORE", mode)
    got = np.asarray(attention_block_int8(apq, p_ln, x, pos, kpb, EPS),
                     np.float32)
    for i, n in enumerate(lens):
        np.testing.assert_allclose(got[i, :n], base[i, :n],
                                   atol=8e-2, rtol=8e-2)
    assert np.median(np.abs(got[0] - base[0])) < 8e-3
    # and the per-op fp-ish reference bound still holds
    ref = np.asarray(_reference(apq, p_ln, x, pos, kpb), np.float32)
    for i, n in enumerate(lens):
        np.testing.assert_allclose(got[i, :n], ref[i, :n],
                                   atol=8e-2, rtol=8e-2)


@pytest.mark.parametrize("mode", ["score", "pv", "both"])
def test_int8_core_modes_mha(monkeypatch, mode):
    """Same envelope contract for the generic MHA kernel — self, cross,
    hd=96 (fusion-stack head width), and packed-short-row shapes."""
    from hriemo.nn.attention import mha_apply, mha_init
    from hriemo.ops.attention_block import mha_block_int8
    from hriemo.ops.quant import quantize_tree_for_serving

    rng = np.random.default_rng(23)
    for d, h, b, lq, lk in [(256, 2, 2, 96, 40),   # cross, hd=128
                            (384, 4, 2, 50, 50),   # hd=96 fusion width
                            (256, 2, 3, 20, 20)]:  # packed sub=32
        params = quantize_tree_for_serving(mha_init(jax.random.key(d), d),
                                           min_dim=128)
        xq = jnp.asarray(rng.standard_normal((b, lq, d)).astype(np.float32) * 0.5)
        xkv = jnp.asarray(rng.standard_normal((b, lk, d)).astype(np.float32) * 0.5)
        lens = np.array([lk] + [max(1, lk - 5)] * (b - 1))
        mask = jnp.asarray(np.arange(lk)[None, :] >= lens[:, None])
        monkeypatch.delenv("HRIEMO_INT8_CORE", raising=False)
        base = np.asarray(mha_block_int8(params, xq, xkv, mask, h), np.float32)
        monkeypatch.setenv("HRIEMO_INT8_CORE", mode)
        got = np.asarray(mha_block_int8(params, xq, xkv, mask, h), np.float32)
        np.testing.assert_allclose(got, base, atol=8e-2, rtol=8e-2)
        assert np.median(np.abs(got - base)) < 8e-3
        assert np.all(np.isfinite(got))
        ref, _ = mha_apply(params, xq, xkv, xkv, h, key_padding_mask=mask,
                           use_kernel=False)
        np.testing.assert_allclose(got, np.asarray(ref, np.float32),
                                   atol=8e-2, rtol=8e-2)


def test_mha_pipe_bitwise(monkeypatch):
    """HRIEMO_MHA_PIPE on == off bitwise (round 5: the WavLM kernel's
    software-pipelined head loop ported to the generic MHA kernel). The
    two modes compute identical per-head math in a different issue
    order — self, cross, hd=96, and packed-short-row shapes."""
    from hriemo.nn.attention import mha_init
    from hriemo.ops.attention_block import mha_block_int8
    from hriemo.ops.quant import quantize_tree_for_serving

    rng = np.random.default_rng(31)
    for d, h, b, lq, lk in [(256, 2, 2, 96, 40),   # cross, hd=128
                            (384, 4, 2, 50, 50),   # hd=96 fusion width
                            (256, 2, 3, 20, 20),   # packed sub=32
                            (256, 2, 3, 10, 50)]:  # packed cross
        params = quantize_tree_for_serving(mha_init(jax.random.key(d), d),
                                           min_dim=128)
        xq = jnp.asarray(rng.standard_normal((b, lq, d)).astype(np.float32) * 0.5)
        xkv = jnp.asarray(rng.standard_normal((b, lk, d)).astype(np.float32) * 0.5)
        lens = np.array([lk] + [max(1, lk - 5)] * (b - 1))
        mask = jnp.asarray(np.arange(lk)[None, :] >= lens[:, None])
        outs = {}
        for mode in ("0", "1"):
            monkeypatch.setenv("HRIEMO_MHA_PIPE", mode)
            outs[mode] = np.asarray(
                mha_block_int8(params, xq, xkv, mask, h), np.float32)
        np.testing.assert_array_equal(outs["0"], outs["1"])
