"""Driver-capture contract for bench.py (VERDICT r4 missing #1 / next #1).

The driver keeps only a bounded (~2000-char) tail of bench stdout, so the
LAST line printed must be a complete JSON object small enough to survive
tail truncation. BENCH_r03.json lost the round's number to a timeout;
BENCH_r04.json lost it to tail truncation of the multi-KB enriched line.
These tests pin the compact-summary trailer: <=1.5 KB, valid JSON, carries
the headline + every scalar the judge needs (VERDICT r4 #1 field list).
"""

import json

import bench


def _fake_enriched_out():
    """A representative fully-enriched artifact, deliberately verbose (14
    buckets, long notes) so the size bound is tested at realistic scale."""
    out = {
        "metric": "iemocap_e2e_utterances_per_sec_per_chip_incl_frontends",
        "value": 1803.7,
        "unit": "utterances/sec/chip",
        "vs_baseline": 0.361,
        "bucket_cfg": {str(s): {"batch": bench.BUCKET_B[s],
                                "ms_per_batch": 123.4,
                                "ms_per_batch_median": 123.5,
                                "ms_per_utt": 0.456}
                       for s in bench.BUCKETS_S},
        "serving_precision": "int8 W8A8 end-to-end " + "x" * 120,
        "spread": {str(s): 0.01 for s in bench.BUCKETS_S},
        "timing": "best-of-5, 10 iters per sample " + "y" * 120,
        "duration_mix": bench.DURATION_MIX_NOTE,
        "text_mix": bench.TEXT_MIX_NOTE,
        "text_buckets": {str(s): bench.BUCKET_LT[s] for s in bench.BUCKETS_S},
        "attainable_headroom_pct": 3.0,
        "attainable_utt_per_sec": 1857.8,
        "attainable_headroom_note": "z" * 300,
        "regression_vs_last_round": 0.0021,
        "regression_vs_last_round_note": "vs 1800.0 utt/s (BENCH_SELF_r04.json);"
                                         " warn-only (tunnel variance)",
        "mfu": {str(s): 0.85 for s in bench.BUCKETS_S},
        "mfu_note": "compiled-HLO FLOPs / time / v5e bf16 peak (197 TF/s)",
        "int8_prob_delta": 0.0039,
        "int8_prob_delta_note": "gated <= 0.006 " + "n" * 150,
        "train": {"config": "MOSEI v2 flagship " + "c" * 100,
                  "ms_per_step": 6.88, "examples_per_sec": 4654.0,
                  "tokens_per_sec": 1991000.0, "mfu": 0.098,
                  "throughput": {"ms_per_step": 86.8,
                                 "examples_per_sec": 5898.2, "mfu": 0.125}},
        "scheduler": {"utt_per_sec_sustained": 134.3,
                      "utt_per_sec_projected_pcie": 1121.6,
                      "utt_per_sec_device_resident": 1500.0,
                      "device_budget_ms": 2651.2, "note": "s" * 700},
        "bf16_ms_per_batch64_5s": 72.2,
        "p50_ms_per_clip": 2.4,
        "p50_config": "bf16 B=1 at the median-duration bucket (int8 B=1 is "
                      "launch-bound and slower; see PARITY.md)",
        "fusion_only_utt_per_sec": 5864.7,
    }
    return out


def test_compact_summary_fits_tail_and_round_trips():
    out = _fake_enriched_out()
    s = bench._compact_summary(out)
    line = json.dumps(s)
    assert len(line) <= 1500, f"compact line {len(line)} bytes > 1500"
    back = json.loads(line)
    # the judge's required field list (VERDICT r4 next #1)
    for k in ("metric", "value", "unit", "vs_baseline", "mfu_min", "mfu_max",
              "int8_prob_delta", "train_examples_per_sec", "p50_ms_per_clip",
              "p50_config", "attainable_headroom_pct", "attainable_utt_per_sec",
              "aux_blocks_completed"):
        assert k in back, k
    assert back["value"] == 1803.7
    assert back["mfu_min"] == back["mfu_max"] == 0.85
    assert back["scheduler_utt_per_sec_sustained"] == 134.3
    assert back["scheduler_utt_per_sec_device_resident"] == 1500.0
    assert back["regression_vs_last_round"] == 0.0021


def test_compact_summary_headline_only():
    """Before any aux block completes, the compact line must still be a
    valid complete object with the headline four."""
    out = {"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 0.1}
    s = bench._compact_summary(out)
    line = json.dumps(s)
    assert len(line) <= 1500
    back = json.loads(line)
    assert back["value"] == 1.0 and back["aux_blocks_completed"] == []


def test_compact_summary_reads_int8_from_aux_dict():
    """Mid-run the int8 gate lives at out['int8'] (flattened only at
    exit); the compact line must find it either way."""
    out = {"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 0.1,
           "int8": {"int8_prob_delta": 0.004, "int8_prob_delta_note": "n"}}
    assert bench._compact_summary(out)["int8_prob_delta"] == 0.004


def test_last_round_value_reads_committed_self_bench():
    val, fname = bench._last_round_value()
    assert fname.startswith("BENCH_SELF_r")
    # must pick the HIGHEST committed round and read its headline value
    # (assert the mechanism, not a hardcoded number — each round commits
    # a new artifact)
    import glob
    import os
    root = os.path.dirname(os.path.abspath(bench.__file__))
    latest = max(glob.glob(os.path.join(root, "BENCH_SELF_r*.json")))
    assert fname == os.path.basename(latest)
    with open(latest) as f:
        assert val == json.load(f)["value"]
    assert isinstance(val, float) and val > 0
