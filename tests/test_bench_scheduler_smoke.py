"""CI smoke of ``bench.bench_scheduler`` — the serving-scheduler bench
block (incl. the round-5 device-resident validation run) end-to-end on
the CPU backend with tiny frontends and a 2-short-bucket config.

This block previously had NO test and shipped two config-coupling bugs
caught only by a manual smoke (a hardcoded 2.5 s link-probe bucket and a
stale bucket_stats key); this pins the whole path: stream_bucketed with
the int8 tree, recorded-flush prep re-timing, link probe, pure-device
budget arithmetic, and the device-resident sustained re-run + its
``device_resident_vs_budget`` field.

Interpret-mode kernels on CPU are O(L^2)-slow, hence the sub-second
buckets (real-duration clips would take many minutes here).
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_bench_scheduler_smoke(monkeypatch):
    import bench
    import hriemo.infer.streaming as streaming
    from hriemo.frontends import (BertConfig, BertEncoder, WavLMConfig,
                                  WavLMEncoder)
    from hriemo.models import FusionWithEmotionDecoder

    tiny_b = {0.5: 8, 1.0: 8}
    monkeypatch.setattr(bench, "BUCKETS_S", (0.5, 1.0))
    monkeypatch.setattr(bench, "BUCKET_B", tiny_b)
    monkeypatch.setattr(streaming, "MEASURED_BUCKET_BATCH", tiny_b)
    monkeypatch.setattr(bench, "LT", 64)  # tiny BERT has 64 positions
    real_mix = bench._duration_mix
    monkeypatch.setattr(
        bench, "_duration_mix",
        lambda n, seed: np.clip(real_mix(n, seed) / 10.0, 0.05, 1.0))

    wavlm = WavLMEncoder(WavLMConfig.tiny())
    bert = BertEncoder(BertConfig.tiny(vocab_size=30522))
    fusion = FusionWithEmotionDecoder(
        d_model=32, num_emotions=4, n_heads=4, num_layers_fusion=1,
        num_layers_decoder=1, beta_hidden=16, dropout=0.0)

    out = bench.bench_scheduler(
        wavlm, bert, fusion, bucket_stats={0.5: (0.05,), 1.0: (0.2,)},
        rng=np.random.default_rng(0), n_clips=48)

    for k in ("utt_per_sec_sustained", "host_stall_pct", "device_budget_ms",
              "host_prep_standalone_ms", "h2d_mb", "link_mb_per_s_measured",
              "utt_per_sec_projected_pcie", "utt_per_sec_device_resident",
              "device_resident_wall_ms", "device_resident_vs_budget",
              "device_resident_note"):
        assert k in out, f"missing scheduler field {k}"
    assert out["utt_per_sec_sustained"] > 0
    assert out["utt_per_sec_device_resident"] > 0
    assert out["device_resident_vs_budget"] > 0
    # n_clips accounting is asserted inside bench_scheduler; spot-check
    # the budget arithmetic saw both buckets
    assert out["device_budget_ms"] > 0
