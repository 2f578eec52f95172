"""Drift guard for the committed on-TPU kernel-numerics artifact.

``kernel_numerics.json`` (written by ``tools/kernel_numerics.py`` on the
real chip) is the per-kernel numerics record the serving claims rest on.
VERDICT r3 weak #3: a stale artifact — serving config moved, kernels
re-routed, JSON not regenerated — must fail loudly. This test derives
the *currently routed* kernel/shape set from the serving config in
``bench.py`` (the single source of truth for buckets and text buckets)
and asserts the artifact covers every one of them and that every
recorded delta passes its threshold.

If this fails after a config or kernel change: re-run
``python tools/kernel_numerics.py --json kernel_numerics.json`` on the
TPU and commit the artifact IN THE SAME COMMIT as the change.
"""

import json
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def artifact():
    with open(ROOT / "kernel_numerics.json") as f:
        entries = json.load(f)
    return {(e["kernel"], e["shape"]): e for e in entries}


@pytest.fixture(scope="module")
def serving_cfg():
    import bench  # repo-root bench.py: serving-config single source of truth

    return bench


def _frames(seconds: float) -> int:
    """WavLM conv-stack output frames for a waveform of ``seconds``."""
    from hriemo.frontends import WavLMConfig

    cfg = WavLMConfig.base_plus()
    t = int(seconds * 16_000)
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        t = (t - k) // s + 1
    return t


def test_all_recorded_deltas_pass(artifact):
    for (kernel, shape), e in artifact.items():
        assert e["max_delta"] <= e["threshold"], (kernel, shape, e)


def test_covers_routed_wavlm_buckets(artifact, serving_cfg):
    """Every audio serving bucket's frame count must have a WavLM
    megakernel numerics row."""
    for sec in serving_cfg.BUCKETS_S:
        key = ("wavlm_attention_block", f"L={_frames(sec)} (bucket {sec}s)")
        assert key in artifact, (key, sorted(
            s for k, s in artifact if k == "wavlm_attention_block"))


def test_covers_routed_mha_shapes(artifact, serving_cfg):
    """Every text bucket must have self-attention numerics plus BOTH
    cross-modal directions against the max audio frame count (the fusion
    stack's a->t / t->a sublayers at the worst-case shape)."""
    la_max = _frames(max(serving_cfg.BUCKETS_S))
    need = [("mha_block", f"self L={la_max}")]
    for lt in serving_cfg.TEXT_BUCKETS:
        need += [("mha_block", f"self L={lt}"),
                 ("mha_block", f"cross {la_max}x{lt}"),
                 ("mha_block", f"cross {lt}x{la_max}")]
    missing = [k for k in need if k not in artifact]
    assert not missing, missing


def test_covers_ffn_and_decoder_kernels(artifact, serving_cfg):
    """The fused FFN kernel at the min/max bucket row counts and the
    beta-gate mlp2 rectangle must be recorded."""
    b = 8  # kernel_numerics measurement batch
    lo = _frames(min(serving_cfg.BUCKETS_S))
    hi = _frames(max(serving_cfg.BUCKETS_S))
    for key in [("ffn_block", f"M={b * lo}"), ("ffn_block", f"M={b * hi}"),
                ("mlp2", "3072->256->768")]:
        assert key in artifact, key
    assert any(k == "flash_mha" for k, _ in artifact)
    assert any(k == "groupnorm_stats" for k, _ in artifact)


def test_serving_config_consistent_across_sites(serving_cfg):
    """The serving bucket list lives in three places a user can reach:
    bench.py (the measured source of truth), the streaming scheduler's
    MEASURED_BUCKET_BATCH, and the e2e_infer CLI defaults. They were
    hand-edited together in round 4 — pin them so they cannot drift."""
    from hriemo.infer.e2e_infer import parse_args
    from hriemo.infer.streaming import MEASURED_BUCKET_BATCH

    assert MEASURED_BUCKET_BATCH == serving_cfg.BUCKET_B
    assert tuple(sorted(MEASURED_BUCKET_BATCH)) == serving_cfg.BUCKETS_S

    args = parse_args(["--index_csv", "unused.csv"])
    assert tuple(args.bucket_seconds) == serving_cfg.BUCKETS_S
    assert tuple(args.text_bucket_tokens) == tuple(serving_cfg.TEXT_BUCKETS)


def test_bucket_flops_covers_serving_config(serving_cfg):
    """bench.py's mfu block reads committed per-bucket FLOPs
    (bucket_flops.json, tools/bucket_flops.py) instead of paying one
    remote compile per bucket. A config change without a regeneration
    must fail here, not silently fall back to 14 live compiles."""
    with open(ROOT / "bucket_flops.json") as f:
        art = json.load(f)
    buckets = art["buckets"]
    for sec in serving_cfg.BUCKETS_S:
        e = buckets.get(str(sec))
        assert e is not None, f"bucket_flops.json missing bucket {sec}s"
        assert e["batch"] == serving_cfg.BUCKET_B[sec], (sec, e)
        assert e["lt"] == serving_cfg.BUCKET_LT.get(sec, serving_cfg.LT), (sec, e)
        assert e["flops"] > 0, (sec, e)
