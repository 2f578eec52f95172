"""Fused WavLM feature-encoder conv stack (Pallas TPU).

The reference consumes HF ``WavLMFeatureEncoder`` (7 Conv1d layers,
kernels 10/3/3/3/3/2/2, strides 5/2/2/2/2/2/2, 512 channels, per-channel
GroupNorm after conv0, GELU after every conv — torch runs them as 15
separate CUDA ops). The XLA route (frontends/wavlm.py _feature_encoder)
is already decent, but at the product shape (B=64, 10 s) it spends
~27 ms, ~2.5x its roofline: every layer round-trips its activation
through HBM ([B,512,32000] alone is 2.1 GB bf16) and the GroupNorm adds
two more full passes over the conv0 output.

Three kernels, each gridded over (batch, time-tile):

  stats: accumulate the per-channel sum/sumsq GroupNorm needs over the
     full sequence (GN is per-channel over time — a global reduction
     must precede any normalisation). conv0 is ~21 GFLOP total, so
     recomputing it in K1 is far cheaper than writing the 2.1 GB conv0
     activation to HBM and reading it back.
  K1: per 128-conv3-frame tile — recompute conv0, apply GN (precomputed
     stats) + GELU, then conv1..3, all in VMEM; write only the conv3
     activation (262 MB at the 10 s bucket, ~0.7 ms of HBM, vs the
     4+ GB the XLA route moves).
  K2: per 128-final-frame tile — conv4..6 over the conv3 activation.

The split at conv3 is a VMEM-budget decision: a single kernel's
resident set (7 weight panels + the fp32 conv0 tile + inter-layer
buffers + double-buffered IO) exceeds the ~16 MB VMEM; splitting where
the activation is smallest-but-still-early keeps each kernel under
~9 MB and adds only one cheap round-trip.

Halo handling: conv windows overlap tile boundaries by a few rows
(conv0 rows: 8 per K1 tile; conv3 rows: 1 per K2 tile), which
BlockSpecs cannot express. Each kernel therefore receives the SAME
input array twice — the tile block and the *next* tile block — and
concatenates the handful of halo rows in VMEM. Tail tiles read
neighbouring garbage that only ever flows into frames beyond the true
length (each layer reads strictly fewer rows than the previous layer's
valid count), which the caller's final slice discards.

Conv-as-GEMM layout: activations are [time, channels] (channels on the
128-lane axis). A stride-2 kernel-3 conv is three [T/2, C] x [C, C]
GEMMs over the even/odd phase views of the input (a [T, C] -> [T/2, 2C]
reshape) plus a one-row shift for the third tap — no im2col
materialisation (the XLA-level im2col variant was measured LOSING to
XLA conv; in-VMEM the phase views are just relayouts). Stride-2
kernel-2 convs are a single [T/2, 2C] x [2C, C] GEMM. conv0 (k=10,
s=5, 1 input channel) takes a host-side [T0, 16] phase view of the
waveform (zero-padded K 10->16) prepared by cheap XLA ops.

Numerics: fp32 GEMM accumulation, fp32 GN statistics, GELU in fp32,
inter-layer activations in the input dtype (bf16 in serving; fp32
inputs reproduce the XLA route bit-comparably — tests/test_conv_stack.py
checks both in interpret mode).

Forward-only serving path: the XLA route keeps training semantics.
Reference behavior: HF WavLMFeatureEncoder, consumed by the reference's
extract_audio_feats_wavlm*.py; parity vs torch in tests/test_frontends.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FT = 128                  # frames produced per tile (both K1 and K2)
R0 = 1024                 # conv0 rows consumed per K1 tile (8*FT; +8 halo)
R3 = 1024                 # conv3 rows consumed per K2 tile (8*FT; +2 halo)


def _gelu(x, fast: bool):
    if fast:
        return 0.5 * x * (1.0 + jnp.tanh(0.7978845608028654
                                         * (x + 0.044715 * x * x * x)))
    return 0.5 * x * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def _gemm(x, w):
    return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _shift_up(x):
    """Rows t -> t+1 (last row zero-filled garbage, never consumed)."""
    return jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)


def _conv_k3s2(x, w0, w1, w2, fast_gelu):
    """x [T, C] (T even) -> gelu(conv k=3 s=2) [T/2, C] in x.dtype."""
    t, c = x.shape
    y = x.reshape(t // 2, 2 * c)
    y1, y2 = y[:, :c], y[:, c:]
    out = _gemm(y1, w0) + _gemm(y2, w1) + _gemm(_shift_up(y1), w2)
    return _gelu(out, fast_gelu).astype(x.dtype)


def _conv_k2s2(x, w, fast_gelu):
    """x [T, C] (T even) -> gelu(conv k=2 s=2) [T/2, C] in x.dtype."""
    t, c = x.shape
    out = _gemm(x.reshape(t // 2, 2 * c), w)
    return _gelu(out, fast_gelu).astype(x.dtype)


def _stats_kernel(z0_ref, w0_ref, o_ref, *, n_valid):
    """Accumulate per-channel sum/sumsq of conv0 over the true length.

    Output block is per-batch (constant across the tile axis), so it
    stays VMEM-resident and accumulates across tiles.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    out = _gemm(z0_ref[0], w0_ref[:])              # [R0, C] fp32
    row = jax.lax.broadcasted_iota(jnp.int32, (out.shape[0], 1), 0)
    out = jnp.where(row + j * R0 < n_valid, out, 0.0)
    o_ref[0] += jnp.concatenate(
        [jnp.sum(out, axis=0, keepdims=True),
         jnp.sum(out * out, axis=0, keepdims=True)], axis=0)


def _k1_kernel(zm_ref, zn_ref, stats_ref, w0_ref, gnw_ref, gnb_ref,
               w1_ref, w2_ref, w3_ref, o_ref, *, n_valid, eps, fast_gelu):
    """conv0 + GN + GELU + conv1..3 for one 128-conv3-frame tile."""
    s = stats_ref[0]                               # [2, C] fp32
    mean = s[0:1] * (1.0 / n_valid)
    var = s[1:2] * (1.0 / n_valid) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    gnw, gnb = gnw_ref[:], gnb_ref[:]              # [1, C] fp32
    z = jnp.concatenate([zm_ref[0], zn_ref[0][:8]], axis=0)  # [R0+8, 16]

    def conv0_gn(zpart):
        # half-tile chunks cap the fp32 conv0 intermediate at ~1 MB
        x0 = _gemm(zpart, w0_ref[:])
        x0 = (x0 - mean) * rstd * gnw + gnb
        return _gelu(x0, fast_gelu).astype(o_ref.dtype)

    h = (R0 + 8) // 2
    x = jnp.concatenate([conv0_gn(z[:h]), conv0_gn(z[h:])], axis=0)
    x = _conv_k3s2(x, w1_ref[0], w1_ref[1], w1_ref[2], fast_gelu)
    x = _conv_k3s2(x, w2_ref[0], w2_ref[1], w2_ref[2], fast_gelu)
    x = _conv_k3s2(x, w3_ref[0], w3_ref[1], w3_ref[2], fast_gelu)
    o_ref[0] = x[:FT].astype(o_ref.dtype)


def _k2_kernel(xm_ref, xn_ref, w4_ref, w5_ref, w6_ref, o_ref, *, fast_gelu):
    """conv4..6 for one 128-final-frame tile (needs 8*FT+1 conv3 rows)."""
    x = jnp.concatenate([xm_ref[0], xn_ref[0][:2]], axis=0)  # [R3+2, C]
    x = _conv_k3s2(x, w4_ref[0], w4_ref[1], w4_ref[2], fast_gelu)
    x = _conv_k2s2(x[:R3 // 2], w5_ref[:], fast_gelu)
    x = _conv_k2s2(x, w6_ref[:], fast_gelu)                  # [FT, C]
    o_ref[0] = x.astype(o_ref.dtype)


def _phase_view(wave, t0g):
    """[B, Tw] waveform -> [B, t0g, 16] conv0 phase view (cheap XLA).

    Row r holds samples [5r, 5r+10) zero-padded to 16 — the conv0
    receptive fields on a stride-5 grid.
    """
    b, tw = wave.shape
    need = 5 * t0g + 5          # row t0g-1 reads samples up to 5*(t0g-1)+10
    wave = jnp.pad(wave, ((0, 0), (0, max(0, need - tw))))
    v = wave[:, :5 * t0g].reshape(b, t0g, 5)
    vn = wave[:, 5:5 * t0g + 5].reshape(b, t0g, 5)
    zeros = jnp.zeros((b, t0g, 6), wave.dtype)
    return jnp.concatenate([v, vn, zeros], axis=-1)  # [B, t0g, 16]


def conv_stack_fused(params, wave, cfg):
    """Full WavLM feature encoder: wave [B, Tw] -> features [B, T', C].

    ``params``: the ``feature_extractor`` dict (torch-layout weights
    [O, I, K]); ``cfg``: WavLMConfig (must match the base 7-layer
    pattern — see use_conv_stack).
    """
    b, tw = wave.shape
    c = cfg.conv_dim[0]
    lens = [(tw - 10) // 5 + 1]                    # conv0..6 true lengths
    for k, s in zip(cfg.conv_kernel[1:], cfg.conv_stride[1:]):
        lens.append((lens[-1] - k) // s + 1)
    n_valid0, t3, t_out = lens[0], lens[3], lens[6]
    n1 = -(-t3 // FT)                              # K1 tiles
    n2 = -(-t_out // FT)                           # K2 tiles
    # z0 gets one extra tile so K1's next-block halo never walks off the
    # array (the extra rows are real zero-padding, not garbage)
    t0g = (n1 + 1) * R0
    # conv3 buffer must cover K2's main+halo blocks; K1 only writes its
    # n1 tiles — the tail blocks stay uninitialised and feed only frames
    # beyond t_out (discarded by the final slice)
    t3p = max(n1, 8 * (n2 + 1)) * FT

    # compute dtype follows the input: bf16 in serving; fp32 inputs
    # reproduce the XLA route bit-comparably (tests rely on this)
    dt = wave.dtype
    z0 = _phase_view(wave, t0g)

    lp = params["conv_layers"]
    w0 = jnp.pad(lp["0"]["conv"]["weight"][:, 0, :].T, ((0, 6), (0, 0))
                 ).astype(dt)                                   # [16, C]
    gnw = lp["0"]["layer_norm"]["weight"].astype(jnp.float32)[None, :]
    gnb = lp["0"]["layer_norm"]["bias"].astype(jnp.float32)[None, :]

    def taps(i):  # [K, C_in, C_out] in compute dtype, from torch [O, I, K]
        return lp[str(i)]["conv"]["weight"].transpose(2, 1, 0).astype(dt)

    w13 = [taps(i) for i in range(1, 4)]                        # [3, C, C]
    w4 = taps(4)
    # k=2 convs as one [2C, C] panel: rows [even-phase; odd-phase]
    w5 = taps(5).reshape(2 * c, c)
    w6 = taps(6).reshape(2 * c, c)

    whole = lambda *shape: pl.BlockSpec(
        shape, lambda i, j: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    perb = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda i, j: (i,) + tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    tile = lambda rows, cols: pl.BlockSpec(
        (1, rows, cols), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    interp = jax.default_backend() != "tpu"

    stats = pl.pallas_call(
        functools.partial(_stats_kernel, n_valid=n_valid0),
        grid=(b, t0g // R0),
        in_specs=[tile(R0, 16), whole(16, c)],
        out_specs=perb(2, c),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interp,
    )(z0, w0)

    nextblk = lambda rows, cols, nmax: pl.BlockSpec(
        (1, rows, cols), lambda i, j: (i, jnp.minimum(j + 1, nmax), 0),
        memory_space=pltpu.VMEM)

    x3 = pl.pallas_call(
        functools.partial(_k1_kernel, n_valid=n_valid0,
                          eps=cfg.layer_norm_eps, fast_gelu=cfg.fast_gelu),
        grid=(b, n1),
        in_specs=[tile(R0, 16), nextblk(R0, 16, n1), perb(2, c),
                  whole(16, c), whole(1, c), whole(1, c),
                  whole(3, c, c), whole(3, c, c), whole(3, c, c)],
        out_specs=tile(FT, c),
        out_shape=jax.ShapeDtypeStruct((b, t3p, c), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_valid0 * c * 16 + 2 * b * lens[1] * c * c * 3 * 3,
            bytes_accessed=2 * z0.size * z0.dtype.itemsize
            + b * t3p * c * jnp.dtype(dt).itemsize,
            transcendentals=b * (n_valid0 + lens[1] + lens[2] + lens[3]) * c,
        ),
        interpret=interp,
    )(z0, z0, stats, w0, gnw, gnb, *w13)

    out = pl.pallas_call(
        functools.partial(_k2_kernel, fast_gelu=cfg.fast_gelu),
        grid=(b, n2),
        in_specs=[tile(R3, c), nextblk(R3, c, t3p // R3 - 1),
                  whole(3, c, c), whole(2 * c, c), whole(2 * c, c)],
        out_specs=tile(FT, c),
        out_shape=jax.ShapeDtypeStruct((b, n2 * FT, c), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interp,
    )(x3, x3, w4, w5, w6)
    return out[:, :t_out]


def use_conv_stack(cfg, params) -> bool:
    """Routing: OFF — the fused stack LOST the whole-model A/B on v5e.

    Measured (B=64, bf16, best-of-5): conv-only 32.5 vs XLA 27.2 ms at
    the 10 s bucket (17.9 vs 15.2 at 5 s, 10.7 vs 9.1 at 2.5 s). The
    per-part breakdown: K1 26.2 ms (~58% MXU on its GEMMs — the phase
    reshapes/shifts eat the rest), stats 5.9 ms, phase view 3.6 ms.
    XLA's conv pipeline is already at ~60% of the bf16 GEMM roofline
    (~16 ms), leaving too little headroom for this kernel's overheads;
    int8 taps would move the floor to ~8 ms but the surrounding VPU work
    keeps the projected total at XLA parity. Kept (with tests) as the
    measured record + a base for a future int8-conv attempt; the
    shipped conv-path win is the Gram-matrix GroupNorm in
    frontends/wavlm.py (group_norm_stats_from_waveform) which removes
    the GN passes from the XLA route instead.

    Round-3 int8-conv attempt (measured, do not retry): a per-layer W8A8
    Pallas kernel in a paired [T/2, 2C] layout (stride-2 conv == dense
    GEMM; k=3 adds a one-row-halo second dot; the layout itself is a
    free bitcast given even-padded T, and conv0 can emit NHC at zero
    cost — 15.72 vs 15.79 ms NCH) LOSES at every layer:
    0.67x/0.68x/0.71x/0.76x/0.80x/0.87x vs XLA bf16 for conv1..6 at the
    10 s bucket, B=128 (kernel ~109 TF/s vs XLA 164 at conv1). Root
    cause is structural, sharper than round 2's rate argument: at
    C_out=512 the per-row quantize+dequant+GELU VPU work (~20
    cycles/row) matches the int8 MXU work (~24 cycles/row), so the
    kernel is VPU-bound at ~55% of the demonstrated 190 TF/s int8 rate —
    the fused FFN kernel escapes this only because N=3072 gives 6x more
    MXU work per quantized row. A hybrid (XLA conv0-3 + this file's K2
    tail kernel for conv4-6) also can't win: the tail needs a pad copy
    of the conv3 activation plus the K2 kernel's ~58% MXU rate, while
    in-graph XLA runs the whole stack at 48.7 ms vs the 65.7 ms
    standalone per-layer sum — XLA's cross-layer fusion already
    recovers the small-T tail overhead the kernel would target.
    (Drill: .scratch/conv_int8_drill.py, v5e, 2026-08.)
    """
    return False


def _gram_phase_views(wave):
    """[B, Tw] -> (A, Ar): [B, T0, 5] fp32 stride-5 phase views.

    A[t] = samples [5t, 5t+5); Ar[t] = samples [5t+5, 5t+10) — together
    the conv0 receptive field [5t, 5t+10). Built by free reshapes/slices
    (a direct [B, T0, 10] concat was measured at 3.6 ms — lane-interleave
    copies; this form avoids it).
    """
    b, tw = wave.shape
    t0 = (tw - 10) // 5 + 1
    need = 5 * t0 + 5
    wave = jnp.pad(wave, ((0, 0), (0, max(0, need - tw)))).astype(jnp.float32)
    a = wave[:, :5 * t0].reshape(b, t0, 5)
    ar = wave[:, 5:5 * t0 + 5].reshape(b, t0, 5)
    return a, ar


def group_norm_stats_from_waveform(wave, conv0_weight):
    """Per-channel GroupNorm stats of the conv0 output, WITHOUT conv0.

    conv0 is linear in the waveform, so the per-channel first/second
    moments of its output over time reduce to the 10x10 Gram matrix of
    the waveform's conv0 phase view:

        mean_c = (sum_t z_t) . w_c / n
        E[x^2]_c = w_c^T (sum_t z_t z_t^T) w_c / n

    This replaces GroupNorm's reduction passes over the [B, C, T'] conv0
    activation with ~100 MFLOP of waveform-sized einsums; the
    normalise+GELU then fuse into conv0's output pass. Measured win is
    modest — 27.2 -> 26.7 ms on the 10 s bucket conv stack (XLA had
    already fused most of the GN cost) — but it is strictly positive and
    fp32 throughout, statistically *more* accurate than the reference's
    bf16-activation reduction. Equivalence tested in
    tests/test_conv_stack.py.

    ``conv0_weight``: torch-layout [C, 1, 10]. Returns (mean, var) each
    [B, C] fp32.
    """
    a, ar = _gram_phase_views(wave)
    n = a.shape[1]
    w = conv0_weight[:, 0, :].astype(jnp.float32).T        # [10, C]
    w1, w2 = w[:5], w[5:]                                  # [5, C] each

    sa = jnp.sum(a, axis=1)                                # [B, 5]
    sar = jnp.sum(ar, axis=1)
    mean = (sa @ w1 + sar @ w2) / n                        # [B, C]

    gaa = jnp.einsum("bti,btj->bij", a, a)                 # [B, 5, 5]
    gar = jnp.einsum("bti,btj->bij", a, ar)
    grr = jnp.einsum("bti,btj->bij", ar, ar)
    # E[x^2]*n = w1'Gaa w1 + 2 w1'Gar w2 + w2'Grr w2, per channel
    ex2 = (jnp.einsum("bij,ic,jc->bc", gaa, w1, w1)
           + 2.0 * jnp.einsum("bij,ic,jc->bc", gar, w1, w2)
           + jnp.einsum("bij,ic,jc->bc", grr, w2, w2)) / n
    # E[x^2]-mean^2 cancels catastrophically for near-constant conv0
    # outputs (DC-offset/silence clips); clamp so rstd never sees a
    # tiny-negative variance (advisor finding, round 2)
    return mean, jnp.maximum(ex2 - mean * mean, 0.0)
