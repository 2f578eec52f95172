#!/usr/bin/env python3
"""Benchmark harness — prints the headline JSON line as soon as it is
measured, then an enriched JSON line when the auxiliary blocks finish.

Driver-capture contract (VERDICT r3 #1): stdout carries a SEQUENCE of
JSON lines, each a complete valid artifact. Line 1 is the headline
(metric/value/unit/vs_baseline + per-bucket config/spread), flushed
immediately after the bucket measurements so a driver timeout can never
erase the round's number. Every completed time-boxed aux block (int8
gate, MFU, scheduler-as-served, train, continuity metrics) re-emits the
enriched JSON — so a kill mid-aux loses at most the one in-flight block.
After every full artifact line a COMPACT summary line (<1.5 KB, complete
JSON) is printed — so the LAST stdout line is always a small, complete,
parseable object even for a driver that keeps only a bounded tail of
stdout (VERDICT r4 missing #1: BENCH_r04.json captured a 2000-char tail
whose one enriched line was beheaded mid-object). The compact line
carries {metric, value, unit, vs_baseline, mfu_min/max, int8_prob_delta,
train_examples_per_sec, scheduler numbers, p50_ms_per_clip + p50_config,
attainable_headroom_pct, attainable_utt_per_sec,
regression_vs_last_round, aux_blocks_completed}. The full enriched
artifact is the second-to-last JSON line.

Headline metric = the BASELINE.json north star: **end-to-end IEMOCAP
utterances/sec/chip including the WavLM + BERT frontends** (waveform +
tokens → WavLM-base-plus → BERT-base → TACFN fusion → emotion decoder),
served int8 W8A8 end-to-end (Pallas attention-sublayer megakernels +
fused FFN kernels; numerics gated — max softmax-prob delta vs bf16 is
measured and reported as ``int8_prob_delta``), one compiled graph per
length bucket. ``bf16_ms_per_batch64_5s`` tracks the bf16 path at the
median bucket for continuity. Throughput is weight-
independent, so the frontends run with random init (no pretrained weights
are downloadable in this environment); real weights change nothing about
the timing.

Method:
  * utterance durations are drawn from a lognormal fit to **published
    IEMOCAP statistics** — 12 h 26 min of audio over 10,039 turns gives a
    mean of 4.46 s; the commonly cited spread is ±3.06 s (Busso et al.
    2008, "IEMOCAP: interactive emotional dyadic motion capture
    database"). Moment-matching a lognormal to (mean 4.46, sd 3.06) gives
    μ=1.302, σ=0.621; clips are capped at 10 s (the reference's own cap,
    extract_audio_feats_wavlm_seq.py:26-27). Provenance is recorded in
    the JSON (``duration_mix``);
  * clips are bucketed to {2.5, 5, 7.5, 10} s — the framework's serving
    strategy (hriemo.infer.streaming bucket_seconds) — and each bucket's
    steady-state ms/batch is measured with a jitted lax.scan closed by a
    scalar fetch (the remote TPU tunnel defers execution until a host
    fetch, so naive timing lies);
  * text is padded to the serving text bucket (16 tokens at the 2.5 s
    audio bucket, 32 at 5/7.5 s, 64 at 10 s), not the reference's fixed
    max_length=128 — an
    output-EXACT optimisation (``TEXT_BUCKETS``/``BUCKET_LT``; realism
    provenance in ``text_mix``, exactness contract in
    hriemo/infer/streaming.py and tests/test_streaming.py);
  * timing is **best-of-5** (the tunnel has ~40 s transients; CLAUDE.md)
    and the relative spread (max−min)/best across repeats is reported;
  * per-bucket **MFU** = XLA's compiled-HLO FLOP count ÷ measured time ÷
    v5e bf16 peak (197 TFLOP/s), so perf progress is auditable;
  * the reported throughput is the duration-distribution-weighted mix;
  * ``p50_ms_per_clip`` is the single-clip (B=1) end-to-end latency at the
    median-duration bucket;
  * ``fusion_only_utt_per_sec`` tracks the fusion-stack-only number from
    earlier rounds for continuity.

``vs_baseline`` is value / 5000 (the driver's north-star target; the
reference publishes no wall-clock numbers, SURVEY.md §6).
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

T0 = time.perf_counter()  # process-lifetime clock for the time boxes
NORTH_STAR = 5000.0
SR = 16_000
# Round-2 grid search on the int8 path: a 3.75 s bucket costs the same
# per batch as 5 s (62.6 vs 63.3 ms — both pad to the same 256-frame
# tile). Batches are re-searched after every kernel-schedule change
# (.scratch/batch_sweep_r3.py). Round-3 (full-width qkv schedules):
# 2.5 s prefers B=256 (0.388 vs 0.397@128 vs 0.400@384 ms/utt);
# 5 s ALSO prefers B=256 (0.645 vs 0.652@192, 0.659@384, 0.680@128,
# 0.684@64 ms/utt — the round-3 sweep stopped at 128 and its "compile
# failure" at 96/128 was a tunnel transient); 10 s stays B=128 (1.207
# vs 1.240@96, 1.247@192).
# Round-3 re-test of the 7.5 s bucket (Lp=384 tile — the one 128-frame
# tile the config skipped): the round-2 "costs MORE per-utt than 10 s"
# result is obsolete under the full-width (1,12) schedules — 0.948
# ms/utt at B=128 (0.956@96, 0.945@256: a tie, so 128 wins batch-fill
# latency) vs 1.207 at the 10 s bucket, a 21% saving for the ~19% of
# clips in (5, 7.5] (.scratch/bucket75_r3.py, bucket_batch_r3b.py).
# Round-3c (16-token text bucket live, .scratch/text16_ab.py): 2.5 s
# re-sweeps to B=384 (0.2859 ms/utt vs 0.2909@256, 0.2941@128,
# 0.2911@512) — BERT got ~2x cheaper at lt=16, shifting the optimum up.
# Round-3d re-sweep of the other buckets post-packed-kernels
# (.scratch/batch_sweep_r3d.py): 5 s stays 256 (0.5530 vs 0.5549@384,
# 0.5615@512), 7.5 s stays 128 (0.8518 vs 0.8720@192, 0.8633@256),
# 10 s stays 128 (1.1416 vs 1.1868@192, 1.1494@256).
# Round-4 conv sub-bucketing (VERDICT r3 #3, .scratch/convlen_ab.py):
# the conv stack (~30% of e2e) runs on waveforms padded to the bucket's
# seconds while the ENCODER cost quantizes at 128-frame tiles, so each
# coarse bucket is split in two at the half-bucket duration — the fine
# bucket shares its sibling's Lp tile and batch and saves only conv
# time, which measured decisive per-utt on the real chip:
#   1.25 s 0.2160 vs 2.5 s 0.2840 ms/utt (-24%)   [Lp=128, B=384, lt=16]
#   3.75 s 0.4678 vs 5.0 s 0.5480       (-14.6%)  [Lp=256, B=256, lt=16]
#   6.25 s 0.7623 vs 7.5 s 0.8444       (-9.7%)   [Lp=384, B=128]
#   8.75 s 1.0733 vs 10 s  1.1341       (-5.4%)   [Lp=512, B=128]
# Mix-weighted: +6.1% headline (1661.9 -> 1763.3 at the same-session
# coarse numbers). Batches inherited from the tile sibling (the optimum
# is set by the encoder tile, which is identical).
# Round-4b quarter-step sweep (.scratch/convlen_q_ab.py, same method):
# midpoint durations of every half-bucket range, measured per-utt
#   1.875 0.2580 (-9.2% vs 2.5)   3.125 0.4595 (-1.8% vs 3.75)
#   4.375 0.5245 (-4.3% vs 5)     5.625 0.7543 (-1.0% vs 6.25)
#   6.875 0.8039 (-4.8% vs 7.5)   8.125 1.0082 (-6.1% vs 8.75)
#   9.375 1.1259 (-0.7% vs 10 — DROPPED: +0.3 utt/s at the mix, noise)
# Shipping the other six: mix-weighted +1.7% on top of the half-bucket
# split (1763.3 -> 1792.4 at the same-session numbers). Quantized conv
# tiling makes the gains uneven (3.125/5.625 save little — XLA conv time
# itself quantizes on T tiles), so eighth-steps are not worth graphs.
BUCKETS_S = (1.25, 1.875, 2.5, 3.125, 3.75, 4.375, 5.0, 5.625,
             6.25, 6.875, 7.5, 8.125, 8.75, 10.0)
# Round-4c per-fine-bucket batch re-search (.scratch/batch_sweep_r4b.py,
# whole-model e2e best-of-5 on the real chip): the sub-buckets inherited
# their coarse sibling's batch, but their smaller conv share moves the
# amortization point. Winners: 1.25 s B=768 0.2129 vs 0.2153 ms/utt
# (-1.1%), 1.875 s B=512 0.2561 vs 0.2584 (-0.9%), 3.125 s B=384 0.4508
# vs 0.4588 (-1.7%; B=512 tied at 0.4503 — kept 384 for flush latency +
# memory). Every other bucket re-measured best at its current batch
# (2.5/3.75/4.375 s: next size up worse; 5.625-8.75 s: 192/256 worse or
# tied).
BUCKET_B = {1.25: 768, 1.875: 512, 2.5: 384, 3.125: 384, 3.75: 256,
            4.375: 256, 5.0: 256, 5.625: 128, 6.25: 128, 6.875: 128,
            7.5: 128, 8.125: 128, 8.75: 128, 10.0: 128}
# Text-length buckets (hriemo.infer.streaming text_bucket_tokens):
# output-EXACT unlike audio buckets (see streaming.py __init__ — BERT is
# mask-exact and the fused mask ORs the text mask, so rows past the true
# text length are never read). Realistic serving text length per audio
# bucket: conversational English ~150 wpm (2.5 words/s) x ~1.3 BERT
# wordpieces/word + [CLS]/[SEP] => tokens(d) = 2 + ceil(3.25*d), so the
# 2.5 s bucket rides the 16-token bucket (sub=16 packed-short-row MHA:
# 8 elements per 128-lane tile), 5/7.5 s ride 32, and 10 s rides 64 (the
# reference instead pads every text to max_length=128,
# extract_text_feats_bert.py:37-38). lt=16 vs 32 at the 2.5 s bucket:
# 74.47 vs 78.21 ms/batch at B=256 (.scratch/text16_ab.py). Round 4c:
# the 1.25 s bucket needs only 2+ceil(3.25*1.25)=7 tokens, so it rides
# an 8-token bucket (sub=8: 16 elements/tile; BERT + fusion text-side
# row counts halve) — measured 0.2040 vs 0.2132 ms/utt at B=768
# (-4.3%; B=1024 0.2052, B=512 0.2074 — 768 stays the batch optimum;
# .scratch/text8_ab.py).
# Round-4d: text buckets need NOT be powers of two — the packed MHA
# picks its sub-block from {8,16,32,64} >= max length, so within a sub
# class the attention tile cost is fixed and only the BERT FFN/LN/embed
# and fusion text-side GEMM rows scale with lt. Whole-model A/B per
# affected bucket (.scratch/textlt_ab.py, best-of-5, real chip) shipped
# three intermediate buckets:
#   lt=12 (sub=16): 1.875 s 0.2552 vs 0.2565 ms/utt (-0.5%),
#                   2.5 s 0.2825 vs 0.2834 (-0.3%)
#   lt=20 (sub=32): 4.375 s 0.5184 vs 0.5237 (-1.0%),
#                   5 s 0.5416 vs 0.5464 (-0.9%)
#   lt=24 (sub=32): 5.625 s 0.7497 vs 0.7537 (-0.5%),
#                   6.25 s 0.7555 vs 0.7598 (-0.6%)
# Measured NOISE-LEVEL and dropped: lt=28 at 6.875/7.5 s (+0.05/-0.07%)
# and lt=36/40 at 10 s (1.1337/1.1340 vs 1.1336 — the B=128/lt=64 BERT
# rows are already a small slice of the 145 ms batch). Mix-weighted:
# +0.29% headline.
TEXT_BUCKETS = (8, 12, 16, 20, 24, 32, 64)
TOKENS_PER_SEC = 3.25  # 150 wpm x ~1.3 wordpieces/word
BUCKET_LT = {
    sec: next(tb for tb in (*TEXT_BUCKETS, 128)
              if 2 + int(np.ceil(TOKENS_PER_SEC * sec)) <= tb)
    for sec in BUCKETS_S
}
TEXT_MIX_NOTE = (
    "text length tied to audio duration at ~150 wpm conversational "
    "English x ~1.3 BERT wordpieces/word (+2 specials); flushes ride the "
    f"output-exact text buckets {TEXT_BUCKETS} instead of the reference's "
    "fixed max_length=128 padding"
)
B = 64  # FLOP-accounting / latency reference batch
LT = 128
ITERS = 10
REPEATS = 5  # best-of-5 over the flaky tunnel (VERDICT r1 weak #5)
SPREAD_TOL = 0.05  # re-sample harder above this; annotate if still above
# int8 numerics gate (advisor r2, medium): measured 0.00405 at the product
# config in BENCH_r02; fail the bench loudly if the serving path drifts.
# Caveat: random-init weights — the real-weight outlier check is
# tools/validate_pretrained_bridges.py --int8-report.
INT8_PROB_DELTA_MAX = 0.006
V5E_BF16_PEAK = 197e12  # TFLOP/s, bf16 MXU peak per v5e chip

# --- driver-capture hardening (VERDICT r3 missing #1 / weak #1) ---
# BENCH_r03.json was rc=124/parsed:null: the script printed its single
# JSON line only after the scheduler+train blocks and the driver's
# timeout killed it mid-train, erasing EVERY number measured before.
# Two fixes: (1) a complete, valid headline JSON line is printed —
# flushed — the moment the bucket measurements are in; the enriched
# JSON (mfu/scheduler/train/...) follows as a second stdout line when
# the aux blocks finish, so the driver's "last JSON line" is the richest
# one available at kill time. (2) every aux block is time-boxed against
# BUDGET_S: blocks whose estimated cost exceeds the remaining budget are
# skipped with a note instead of risking the whole artifact.
BUDGET_S = float(os.environ.get("HRIEMO_BENCH_BUDGET_S", "2600"))  # ~43 min
# Default raised 1500 -> 2600 in round 5: the warm bucket phase alone is
# ~1000-1200 s over the tunnel, which at 1500 starved train/scheduler out
# of the driver artifact. Evidence the driver's own kill window allows
# this: the r4c driver run survived a 25-min tunnel outage plus the full
# bucket phase at rc 0 (>= ~50 min wall). Worst case here is bounded:
# estimates gate block STARTS, so the last block can begin no later than
# budget-minus-its-estimate, and every block's completion re-emits the
# full artifact + compact trailer, so a kill loses at most one block.
# estimated aux-block costs over the dev tunnel (stderr timestamps of the
# r03 run + per-block compile counts); deliberately pessimistic. Keys ==
# the _timebox output-field names in main().
AUX_EST_S = {"mfu": 30, "int8": 240, "scheduler": 900, "train": 330,
             "bf16_ms_per_batch64_5s": 120, "p50_ms_per_clip": 90,
             "fusion_only_utt_per_sec": 60}
# mfu reads committed bucket_flops.json (no per-bucket compiles);
# scheduler's estimate reflects its round-5 measurements: ~20 min with
# cold compiles for new graphs, ~6-8 min warm (incl. the device-resident
# validation run) — 900 keeps a near-budget start from overrunning far.


def _remaining_s() -> float:
    return BUDGET_S - (time.perf_counter() - T0)


_AUX_DONE = []  # names of aux blocks that completed (for the compact line)


def _last_round_value():
    """Previous round's committed headline (BENCH_SELF_r*.json) for the
    regression gate (VERDICT r4 next #8). Warn-only: tunnel variance is
    a few %, so the field flags a drop without failing the bench."""
    import glob
    try:
        files = sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_SELF_r*.json")))
        if not files:
            return None, None
        with open(files[-1]) as f:
            prev = json.load(f)
        return float(prev["value"]), os.path.basename(files[-1])
    except Exception:  # noqa: BLE001 — the gate is best-effort
        return None, None


def _compact_summary(out: dict) -> dict:
    """The <=1.5 KB summary object printed as the LAST stdout line after
    every artifact emission (driver-capture contract, VERDICT r4 #1).
    Pulls scalars out of the enriched artifact; every field optional
    except the headline four."""
    s = {"metric": out["metric"], "value": out["value"], "unit": out["unit"],
         "vs_baseline": out["vs_baseline"], "line": "compact_summary"}
    mfu = out.get("mfu")
    if isinstance(mfu, dict):
        vals = [v for v in mfu.values() if isinstance(v, (int, float))]
        if vals:
            s["mfu_min"], s["mfu_max"] = min(vals), max(vals)
    # int8_prob_delta lives in out["int8"] during aux, top-level at exit
    delta = out.get("int8_prob_delta",
                    (out.get("int8") or {}).get("int8_prob_delta")
                    if isinstance(out.get("int8"), dict) else None)
    if delta is not None:
        s["int8_prob_delta"] = delta
    tr = out.get("train")
    if isinstance(tr, dict) and "examples_per_sec" in tr:
        s["train_ms_per_step"] = tr["ms_per_step"]
        s["train_examples_per_sec"] = tr["examples_per_sec"]
        thr = tr.get("throughput", {})
        if isinstance(thr, dict) and "examples_per_sec" in thr:
            s["train_examples_per_sec_b512"] = thr["examples_per_sec"]
    sch = out.get("scheduler")
    if isinstance(sch, dict) and "utt_per_sec_sustained" in sch:
        s["scheduler_utt_per_sec_sustained"] = sch["utt_per_sec_sustained"]
        for k in ("utt_per_sec_projected_pcie", "utt_per_sec_device_resident"):
            if k in sch:
                s["scheduler_" + k] = sch[k]
    for k in ("p50_ms_per_clip", "p50_config", "bf16_ms_per_batch64_5s",
              "fusion_only_utt_per_sec", "attainable_headroom_pct",
              "attainable_utt_per_sec", "regression_vs_last_round",
              "regression_vs_last_round_note", "int8_gate_failed"):
        v = out.get(k)
        if v is not None and not isinstance(v, dict):
            s[k] = v
    s["aux_blocks_completed"] = list(_AUX_DONE)
    line = json.dumps(s)
    if len(line) > 1500:  # hard contract: the last line must fit a tail
        for k in ("regression_vs_last_round_note", "p50_config",
                  "aux_blocks_completed"):
            s.pop(k, None)
    return s


def _emit(out: dict) -> None:
    """Print the full artifact line, then the compact summary line, both
    flushed — the last stdout line is always a complete small JSON."""
    print(json.dumps(out), flush=True)
    print(json.dumps(_compact_summary(out)), flush=True)


def _timebox(out: dict, key: str, fn):
    """Run aux block ``fn`` if its estimate fits the remaining budget;
    otherwise record a skip note. Exceptions annotate instead of killing
    the run (the headline line is already out by the time these run)."""
    rem = _remaining_s()
    est = AUX_EST_S.get(key, 120)
    if rem < est:
        out[key] = {"skipped": f"time budget: {rem:.0f}s left < ~{est}s est"}
        _progress(f"{key} block skipped ({rem:.0f}s left < ~{est}s est)")
        return
    _progress(f"starting {key} block ({rem:.0f}s budget left)")
    try:
        out[key] = fn()
        _AUX_DONE.append(key)
    except Exception as e:  # noqa: BLE001 — annotate, keep the artifact
        out[key] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
    _progress(f"{key} block done")
    # Persist incrementally: re-emit the enriched JSON (+ compact summary
    # trailer) after every completed aux block so a driver kill mid-aux
    # loses at most ONE block, not all of them, and the last stdout line
    # is always a small complete JSON object.
    _emit(out)


def _enable_compile_cache():
    """Persistent XLA compilation cache: bench wall time over the tunnel
    is dominated by remote compiles (~2-3 min per e2e bucket graph, r03
    stderr timeline); a warm cache turns repeat runs (and the driver's
    end-of-round run on the same host) into cache hits."""
    try:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   "/tmp/hriemo_xla_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        print(f"# compile cache unavailable: {e}", file=sys.stderr)


def _attainable_headroom():
    """Surface tools/perf_budget.py's attainable-headroom statement in the
    driver artifact (VERDICT r3 next #8) so the gap to the 5,000 north
    star is self-documenting. Read from the committed perf_budget.json
    (regenerated on-TPU whenever kernels/routing change; tests guard
    drift) rather than re-measured here — the budget run is ~15 min."""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "perf_budget.json")) as f:
            pb = json.load(f)
        return pb.get("attainable_headroom_pct")
    except Exception:  # noqa: BLE001
        return None

# Published IEMOCAP duration statistics (Busso et al. 2008): 12h26m over
# 10,039 turns -> mean 4.46 s; spread ±3.06 s. Lognormal moment match.
IEMOCAP_MEAN_S = 4.46
IEMOCAP_SD_S = 3.06
DURATION_MIX_NOTE = (
    "lognormal moment-matched to published IEMOCAP stats "
    f"(mean {IEMOCAP_MEAN_S} s = 12h26m/10039 turns, sd {IEMOCAP_SD_S} s; "
    "Busso et al. 2008), capped at 10 s (reference's WavLM cap)"
)


def _duration_mix(n=4096, seed=0):
    """IEMOCAP clip durations (s) from the published-stat lognormal fit."""
    rng = np.random.default_rng(seed)
    cv2 = (IEMOCAP_SD_S / IEMOCAP_MEAN_S) ** 2
    sigma = np.sqrt(np.log1p(cv2))
    mu = np.log(IEMOCAP_MEAN_S) - 0.5 * sigma**2
    d = rng.lognormal(mean=mu, sigma=sigma, size=n)
    return np.clip(d, 0.6, 10.0)


def bench_scheduler(wavlm, bert, fusion, bucket_stats, rng,
                    n_clips: int = 3072):
    """The serving path AS SERVED (VERDICT r2 missing #4 / next #2).

    n_clips doubled with the round-4 14-bucket config so per-queue fills
    stay a reasonable fraction of each batch — otherwise the final
    padded flushes dominate the device budget and the sustained number
    reads artificially low.

    Drives the product scheduler — ``StreamingPipeline.stream_bucketed``
    (int8 tree, per-bucket queues at the measured-optimal batches,
    overlapped host/device via the one-deep pending queue, pad_flush
    static shapes) — over a realistic clip stream with REAL host work
    per batch (wav pad/bucket + tokenisation), and reports sustained
    utterances/sec plus the host-stall fraction vs the pure device-scan
    budget (``bucket_stats``). Compile time is excluded (each bucket
    shape is warmed first): this measures steady-state serving, matching
    the reference's 3-stage offline pipeline boundary (SURVEY.md §3.5).
    """
    from hriemo.dataprep.extract_iemocap import _HashTokenizer
    from hriemo.infer.streaming import MEASURED_BUCKET_BATCH, StreamingPipeline

    # BUCKET_B (this file), MEASURED_BUCKET_BATCH (streaming defaults) and
    # perf_budget's copy are hand-synced serving config; the scheduler
    # block counts flushes with one and prices them with bucket_stats
    # measured at the other — fail loudly if they ever drift (they did
    # once: the 2.5 s 256->384 move; review finding, round 3c)
    assert MEASURED_BUCKET_BATCH == BUCKET_B, (MEASURED_BUCKET_BATCH, BUCKET_B)

    pipe = StreamingPipeline(
        wavlm, bert, fusion, tokenizer=_HashTokenizer(30522),
        max_seconds=10.0, max_tokens=LT, multi_label=False,
        bucket_seconds=tuple(s for s in BUCKETS_S if s < 10.0),
        int8_frontends=True,
        wav_transport="pcm16", text_bucket_tokens=TEXT_BUCKETS)

    # instrument host work + shipped bytes (prep runs inside the stream
    # loop, overlapped with device compute by the one-deep pending queue);
    # flush args are recorded so prep can be re-timed standalone below —
    # the in-situ number is inflated by CPU contention with the tunnel's
    # transfer/serialization threads (a cost PCIe DMA doesn't have)
    prep = {"s": 0.0, "bytes": 0, "calls": []}
    orig_prep = pipe.preprocess

    def timed_prep(*a, **k):
        t = time.perf_counter()
        out = orig_prep(*a, **k)
        prep["s"] += time.perf_counter() - t
        prep["bytes"] += sum(x.nbytes for x in out)
        prep["calls"].append((a, k))
        return out

    pipe.preprocess = timed_prep

    durations = _duration_mix(n=n_clips, seed=7)
    words = np.array("happy sad angry neutral really very today fine so not"
                     .split())
    rs = np.random.default_rng(7)
    # clips arrive as int16 PCM — what real decoded .wav data is (the
    # reference's soundfile loads 16-bit linear PCM) and what a serving
    # host receives off the wire; the pcm16 transport forwards it
    # bit-exactly and the host pad loop is a pure memcpy. Word counts
    # scale with duration (TEXT_MIX_NOTE) so each flush rides the same
    # text bucket the device budget was measured at (BUCKET_LT).
    n_words = lambda d: max(3, int(round(TOKENS_PER_SEC * d)))
    clips = [
        ((rs.standard_normal(int(d * SR)) * 0.1 * 32768)
         .clip(-32768, 32767).astype(np.int16),
         " ".join(rs.choice(words, size=n_words(d))), i)
        for i, d in enumerate(durations)
    ]

    # warm each bucket's compiled shape (one full batch per bucket, at
    # the bucket's expected text bucket)
    for sec in BUCKETS_S:
        b = MEASURED_BUCKET_BATCH[sec]
        warm = [(np.zeros(int(sec * SR) - 1, np.float32),
                 " ".join(["warm"] * n_words(sec)), -1)] * b
        for _ in pipe.stream_bucketed(iter(warm), bucket_batch=MEASURED_BUCKET_BATCH):
            pass

    n_done = 0
    prep["s"], prep["bytes"], prep["calls"] = 0.0, 0, []  # exclude warmup
    t0 = time.perf_counter()
    for probs, _beta, uids in pipe.stream_bucketed(
            iter(clips), bucket_batch=MEASURED_BUCKET_BATCH, pad_flush=True):
        n_done += len(uids)
    wall = time.perf_counter() - t0
    assert n_done == n_clips, (n_done, n_clips)

    # measure the host->device link directly (one flush-sized buffer) so
    # the stall can be attributed: this dev environment reaches the TPU
    # over a network tunnel at ~30-50 MB/s vs ~10+ GB/s host PCIe.
    probe_sec = 2.5 if 2.5 in MEASURED_BUCKET_BATCH else BUCKETS_S[len(BUCKETS_S) // 2]
    buf = np.zeros((MEASURED_BUCKET_BATCH[probe_sec], int(probe_sec * SR)), np.int16)
    reduce = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    float(reduce(jnp.asarray(buf)))  # warm the reduction's compile
    link = []
    for _ in range(3):
        t = time.perf_counter()
        float(reduce(jnp.asarray(buf)))  # scalar fetch forces the H2D
        link.append(time.perf_counter() - t)
    link_mbps = buf.nbytes / 1e6 / min(link)

    # re-time the exact same prep calls standalone (no device activity):
    # the in-situ prep number above is inflated by CPU contention with
    # the tunnel client's transfer threads, which a PCIe host doesn't pay.
    # Best-of-3: one bench run measured 1419 ms here vs 106 ms on the
    # same mix idle — the tunnel client keeps stealing CPU after the
    # stream loop when the link is degraded; the min is the honest
    # PCIe-host estimate (idle-machine profile: .scratch/prep_profile_r3)
    prep_alone_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for a, k in prep["calls"]:
            orig_prep(*a, **k)
        prep_alone_s = min(prep_alone_s, time.perf_counter() - t0)

    # pure-device budget for the same flush schedule (full + padded-final)
    bucket_of = np.searchsorted(np.asarray(BUCKETS_S), durations)
    device_s = 0.0
    for i, sec in enumerate(BUCKETS_S):
        n = int((bucket_of == i).sum())
        flushes = -(-n // MEASURED_BUCKET_BATCH[sec])
        device_s += flushes * bucket_stats[sec][0]
    h2d_mb = prep["bytes"] / 1e6

    # VERDICT r4 weak #3 / next #4: validate the projection's DEVICE term
    # with an actual sustained run. Re-run the exact recorded flush
    # schedule through the real dispatch path (pipe._forward — the same
    # compiled graphs the stream loop used) with every flush's arrays
    # pre-staged on device, fetching results one flush behind (the
    # scheduler's own overlap discipline): wall = device compute + the
    # non-overlapped dispatch/fetch overhead only — no host prep, no H2D.
    staged = []
    for a, k in prep["calls"]:
        staged.append(tuple(jax.device_put(jnp.asarray(x))
                            for x in orig_prep(*a, **k)))
    # one untimed pass first: forces every staged transfer to complete
    # and every result fetched (block_until_ready does not force
    # execution over the dev tunnel; a data fetch does) — the timed
    # passes then run fully device-resident with warm graphs
    for arrs in staged:
        np.asarray(pipe._forward(pipe._params, *arrs)[0])
    dev_wall = float("inf")
    for _ in range(3):
        pending_probs = None
        t0 = time.perf_counter()
        for arrs in staged:
            probs_d, _beta_d = pipe._forward(pipe._params, *arrs)
            if pending_probs is not None:
                np.asarray(pending_probs)  # fetch flush i-1 (blocks)
            pending_probs = probs_d
        np.asarray(pending_probs)
        dev_wall = min(dev_wall, time.perf_counter() - t0)
    # With host prep overlapped (one-deep pending queue), sustained wall =
    # max(device, host prep, H2D). On a PCIe-attached host (>= 8 GB/s) the
    # H2D term is ~h2d_mb/8000 s; project the scheduler's throughput there.
    pcie_wall = max(device_s, prep_alone_s) + h2d_mb / 8000.0
    return {
        "utt_per_sec_sustained": round(n_done / wall, 1),
        "host_stall_pct": round(max(0.0, wall - device_s) / wall * 100, 1),
        "device_budget_ms": round(device_s * 1000, 1),
        "host_prep_ms": round(prep["s"] * 1000, 1),
        "host_prep_standalone_ms": round(prep_alone_s * 1000, 1),
        "h2d_mb": round(h2d_mb, 1),
        "link_mb_per_s_measured": round(link_mbps, 1),
        "wall_ms": round(wall * 1000, 1),
        "n_clips": n_clips,
        "utt_per_sec_projected_pcie": round(n_done / pcie_wall, 1),
        "utt_per_sec_device_resident": round(n_done / dev_wall, 1),
        "device_resident_wall_ms": round(dev_wall * 1000, 1),
        "device_resident_vs_budget": round(dev_wall / device_s, 3),
        "device_resident_note": (
            "measured sustained run of the recorded flush schedule through "
            "the real dispatch path with all inputs pre-staged on device "
            "(one-deep pending fetch, best-of-3) — validates the "
            "projection's device term: device_resident_vs_budget is "
            "measured wall / bucket-stat arithmetic (1.0 = exact; the "
            "excess is non-overlapped dispatch overhead, tunnel-inflated "
            "in this dev environment)."),
        "note": ("stream_bucketed as served: int16 PCM source clips (what "
                 "decoded .wav data is) + pcm16 transport (bit-exact, 4x "
                 "fewer H2D bytes than f32+mask), host wav-prep + "
                 "tokenisation overlapped with device compute (one-deep "
                 "pending queue), pad_flush static shapes; compile excluded. "
                 "The residual stall is the dev environment's network tunnel "
                 "to the TPU (link_mb_per_s_measured vs >=8 GB/s host PCIe), "
                 "which also inflates in-situ host_prep_ms via CPU "
                 "contention with the tunnel's transfer threads "
                 "(host_prep_standalone_ms re-times the identical calls "
                 "quiesced); utt_per_sec_projected_pcie = "
                 "n/(max(device, host_prep_standalone) + h2d at 8 GB/s) — "
                 "device-bound on real serving hosts."),
    }


def bench_train(n_steps: int = 20, repeats: int = 3, BT: int = 16, ACC: int = 2):
    """One measured training number (VERDICT r2 missing #5 / next #6).

    The flagship MOSEI v2 config (scripts/fusion/README.md v2:
    d_model=256, 4 heads, 1 fusion + 2 decoder layers, beta_hidden=64,
    dropout=0.4, lr 5e-5, wd 0.05, batch 16 x grad-accum 2, pos_weight
    BCE + β-entropy 1e-3, label normalisation), bf16 compute / fp32
    params, real sequence caps La=300/Lt=128. ms/step is a full
    forward+backward+AdamW update including the grad-accum lax.scan.
    The reference's batch 16 leaves the chip latency-bound (the whole
    model is d_model=256), so the train block also carries a
    ``throughput`` row at batch 512 x accum 1 — same model, same update
    — showing what the train step sustains when the input pipeline can
    feed it.
    """
    from hriemo.models import MoseiFusionWithEmotionDecoder
    from hriemo.parallel.train_step import (TrainConfig, create_train_state,
                                            make_train_step)

    LA, LTT = 300, 128
    model = MoseiFusionWithEmotionDecoder(
        d_audio=74, d_text=300, d_model=256, num_emotions=6, n_heads=4,
        num_layers_fusion=1, num_layers_decoder=2, beta_hidden=64,
        dropout=0.4)
    cfg = TrainConfig(
        loss_type="multi_label",
        pos_weight=[0.87, 2.82, 3.63, 8.94, 4.53, 11.27],  # README v2 table
        beta_entropy=1e-3, normalize_labels=True,
        lr=5e-5, weight_decay=0.05, grad_accum=ACC,
        warmup_steps=100, total_steps=10_000,
        compute_dtype=jnp.bfloat16)
    state = create_train_state(model, cfg, rng=jax.random.key(0))
    step = make_train_step(model, cfg, donate=False)

    rs = np.random.default_rng(3)
    batch = {
        "h_a": jnp.asarray(rs.standard_normal((ACC, BT, LA, 74)).astype(np.float32)),
        "h_t": jnp.asarray(rs.standard_normal((ACC, BT, LTT, 300)).astype(np.float32)),
        "mask_a": jnp.asarray(np.arange(LA)[None, None, :]
                              >= rs.integers(LA // 2, LA + 1, size=(ACC, BT))[..., None]),
        "mask_t": jnp.asarray(np.arange(LTT)[None, None, :]
                              >= rs.integers(LTT // 2, LTT + 1, size=(ACC, BT))[..., None]),
        "y": jnp.asarray(rs.uniform(0, 3, size=(ACC, BT, 6)).astype(np.float32)),
    }
    if ACC == 1:
        # make_train_step contract: no leading accum dim at grad_accum=1
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
    # rbg dropout stream — the shipped trainer default (round 5,
    # hriemo/train/common.py dropout_key: threefry bit-gen is VPU-bound,
    # rbg measured -31%/-21% ms/step at B=32/512)
    key = jax.random.key(1, impl="rbg")

    flops = None
    try:
        if ACC > 1:
            # cost_analysis counts a lax.scan body ONCE, so lowering the
            # accum step under-counts fwd/bwd by the trip count (the same
            # pitfall _single_forward documents). Price a grad_accum=1
            # step at the micro-batch and scale: flops ≈ ACC * f1 (this
            # over-counts the once-per-step AdamW by ACC-1, which is
            # negligible next to fwd/bwd).
            import dataclasses as _dc
            cfg1 = _dc.replace(cfg, grad_accum=1)
            step1 = make_train_step(model, cfg1, donate=False)
            batch1 = jax.tree_util.tree_map(lambda x: x[0], batch)
            ca = step1.lower(state, batch1, key).compile().cost_analysis()
        else:
            ca = step.lower(state, batch, key).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"]) * (ACC if ACC > 1 else 1)
    except Exception:
        pass

    @jax.jit
    def many(state, batch, k):
        def body(s, i):
            s2, m = step(s, batch, jax.random.fold_in(k, i))
            return s2, m["loss"]
        s, losses = jax.lax.scan(body, state, jnp.arange(n_steps))
        return losses[-1]

    float(many(state, batch, key))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(many(state, batch, key))
        best = min(best, (time.perf_counter() - t0) / n_steps)

    out = {
        "config": ("MOSEI v2 flagship: d_model=256 h4 1xfusion+2xdecoder, "
                   f"bf16 compute/fp32 params, batch {BT} x accum {ACC}, "
                   "La=300 Lt=128, pos_weight BCE + beta-entropy, AdamW, "
                   "rbg dropout stream"),
        "ms_per_step": round(best * 1000, 2),
        "examples_per_sec": round(BT * ACC / best, 1),
        "tokens_per_sec": round(BT * ACC * (LA + LTT) / best, 0),
        "timing": f"best-of-{repeats}, {n_steps} steps per jitted scan",
    }
    if flops:
        out["mfu"] = round(flops / best / V5E_BF16_PEAK, 3)
        out["mfu_note"] = "compiled-HLO FLOPs of one full update / ms_per_step / bf16 peak"
    if BT == 16 and ACC == 2:
        thr = bench_train(n_steps=n_steps, repeats=repeats, BT=512, ACC=1)
        out["throughput"] = {k: thr[k] for k in
                             ("config", "ms_per_step", "examples_per_sec",
                              "tokens_per_sec", "mfu") if k in thr}
    return out


def _progress(msg: str) -> None:
    """Stderr progress marker (stdout stays the driver's one JSON line).

    Bench runs over the tunnel can take 15+ min; without these a stalled
    tunnel is indistinguishable from a long compile."""
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _wait_for_backend(attempts: int = 4, sleep_s: float = 120.0):
    """Retry backend init: the axon tunnel intermittently reports
    UNAVAILABLE (observed outages of ~1h; each failed init itself takes
    ~25-30 min to surface), and a single flake must not zero the round's
    headline. Bounded so a hard outage still fails loudly."""
    for i in range(attempts):
        try:
            dev = jax.devices()
            jnp.zeros((8, 8)).block_until_ready()
            float(jnp.sum(jnp.ones((8, 8))))  # tunnel defers until a fetch
            return dev
        except RuntimeError as e:  # jax backend init raises RuntimeError
            if i == attempts - 1:
                raise
            print(f"# backend unavailable (attempt {i + 1}/{attempts}): "
                  f"{str(e).splitlines()[0][:120]} — retrying in {sleep_s:.0f}s",
                  file=sys.stderr, flush=True)
            time.sleep(sleep_s)


def build_serving_models():
    """The headline serving stack: models + bf16/int8 param trees.

    Shared by main() and tools/bucket_flops.py so the committed FLOPs
    artifact is computed on EXACTLY the graphs the bench times.
    """
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
    P16 = {"w": cast(wavlm.params), "b": cast(bert.params), "f": cast(fusion.params)}
    # headline serving config: W8A8 int8 end-to-end through the Pallas
    # attention-sublayer megakernels (WavLM gated variant + the generic
    # MHA variant in the fusion stack and BERT) and the fused FFN kernel
    # (whole-model A/B at the 2.5/5/10 s buckets: 31.6/49.6/91.9 ms with
    # bf16 fusion; fusion-stack int8+kernel 19.0 -> 13.7 ms on top; bf16
    # baseline 40.1/73.4/135.8). Numerics are gated: max probability
    # delta vs the all-bf16 path is reported in the JSON
    # (int8_prob_delta); the quality-critical β moved < 1e-4 in the
    # routing A/B (beta delta 7e-5).
    from hriemo.ops.quant import quantize_tree_for_serving

    P = {"w": quantize_tree_for_serving(P16["w"]),
         "b": quantize_tree_for_serving(P16["b"]),
         "f": quantize_tree_for_serving(P16["f"])}
    return wavlm, bert, fusion, P16, P


def main():
    _enable_compile_cache()
    _progress("waiting for backend (a silent stall here = tunnel outage; "
              "init retries are bounded, see _wait_for_backend)")
    _wait_for_backend()
    _progress("backend up")

    wavlm, bert, fusion, P16, P = build_serving_models()
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

    @jax.jit
    def _single_forward(P, wavs, wmask, ids, tmask):
        # one un-scanned forward, used ONLY for FLOP accounting (XLA's cost
        # analysis counts a while-loop body once, so analysing the timed
        # scan version would under-count by the trip count — verified 8.7x)
        h_a, fmask = wavlm.apply(P["w"], wavs, wmask)
        h_t, _ = bert.apply(P["b"], ids, tmask)
        logits, _beta, _ = fusion.apply(
            P["f"], h_a, h_t.astype(h_a.dtype), fmask == 0, tmask == 0)
        return jnp.mean(logits.astype(jnp.float32))

    def _cost_flops(args):
        """FLOPs per batch from the compiled single-forward HLO."""
        try:
            ca = _single_forward.lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca["flops"])
        except Exception:
            return None

    def measure(batch, seconds, iters=ITERS, params=None, want_flops=False):
        """Returns (best_s, median_s, spread, flops) per batch.

        Spread hardening (VERDICT r2 weak #2): when (max-min)/best across
        repeats exceeds SPREAD_TOL the sample doubles (more repeats at
        more iters each) and the spread is recomputed over the longer-iter
        sample only — the 5 s bucket showed 16.5% spread at 5x10 in
        BENCH_r02; transients over the remote tunnel average out with
        more iters per timed call.
        """
        t = int(seconds * SR)
        lt = BUCKET_LT.get(seconds, LT)  # serving text bucket (exact)
        wavs = jnp.asarray(rng.standard_normal((batch, t)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
        wmask = jnp.ones((batch, t), jnp.int32)
        ids = jnp.asarray(rng.integers(0, 30000, size=(batch, lt)).astype(np.int32))
        tmask = jnp.ones((batch, lt), jnp.int32)
        p = P if params is None else params

        def sample(n_repeats, n_iters):
            fn = e2e_fn(n_iters)
            a = (p, wavs, wmask, ids, tmask)
            float(fn(*a))  # compile + warm
            times = []
            for _ in range(n_repeats):
                t0 = time.perf_counter()
                float(fn(*a))
                times.append((time.perf_counter() - t0) / n_iters)
            return times, a

        times, args = sample(REPEATS, iters)
        spread = (max(times) - min(times)) / min(times)
        if spread > SPREAD_TOL:
            times, args = sample(2 * REPEATS, 2 * iters)
            spread = (max(times) - min(times)) / min(times)
        flops = _cost_flops(args) if want_flops else None
        return min(times), float(np.median(times)), spread, flops

    # per-bucket steady-state cost at each bucket's measured-optimal batch
    bucket_stats = {}
    for sec in BUCKETS_S:
        bucket_stats[sec] = measure(BUCKET_B[sec], sec)
        _progress(f"bucket {sec}s B={BUCKET_B[sec]}: "
                  f"{bucket_stats[sec][0] * 1000:.1f} ms/batch")
    per_utt_s = {sec: s[0] / BUCKET_B[sec] for sec, s in bucket_stats.items()}

    # weight by the realistic duration mix
    durations = _duration_mix()
    bucket_of = np.searchsorted(np.asarray(BUCKETS_S), durations)
    total_time = sum(
        (bucket_of == i).sum() * per_utt_s[sec]
        for i, sec in enumerate(BUCKETS_S)
    )
    e2e_utt_per_sec = len(durations) / total_time

    spreads = {str(sec): round(s[2], 3) for sec, s in bucket_stats.items()}
    out = {
        "metric": "iemocap_e2e_utterances_per_sec_per_chip_incl_frontends",
        "value": round(e2e_utt_per_sec, 1),
        "unit": "utterances/sec/chip",
        "vs_baseline": round(e2e_utt_per_sec / NORTH_STAR, 3),
        "bucket_cfg": {str(sec): {
            "batch": BUCKET_B[sec],
            "ms_per_batch": round(bucket_stats[sec][0] * 1000, 1),
            "ms_per_batch_median": round(bucket_stats[sec][1] * 1000, 1),
            "ms_per_utt": round(per_utt_s[sec] * 1000, 3),
        } for sec in BUCKETS_S},
        "serving_precision": ("int8 W8A8 end-to-end: Pallas attention-sublayer "
                              "megakernels (WavLM gated + generic MHA) + fused "
                              "FFN; bf16 LN/softmax/residuals"),
        "spread": spreads,
        "timing": (f"best-of-{REPEATS}, {ITERS} iters per sample inside one "
                   f"jitted scan; buckets over {SPREAD_TOL:.0%} spread re-run "
                   f"at {2*REPEATS}x{2*ITERS}; median reported alongside best"),
        "duration_mix": DURATION_MIX_NOTE,
        "text_mix": TEXT_MIX_NOTE,
        "text_buckets": {str(sec): BUCKET_LT[sec] for sec in BUCKETS_S},
    }
    headroom = _attainable_headroom()
    if headroom is not None:
        out["attainable_headroom_pct"] = headroom
        # VERDICT r4 next #3: publish the speed-of-light throughput at the
        # MEASURED toolchain ceilings (int8-in-kernel ~1.35x bf16, XLA conv
        # ~100% MXU, softmax-VPU floor — priced in perf_budget.json) so
        # this artifact alone says whether the 5,000 north star is
        # attainable on this toolchain. It is not: the rest of the gap is
        # toolchain/hardware, not routing — see PERF.md.
        out["attainable_utt_per_sec"] = round(
            e2e_utt_per_sec * (1 + headroom / 100), 1)
        out["attainable_headroom_note"] = (
            "from tools/perf_budget.py (committed perf_budget.json): e2e gap "
            "vs GEMM ideal net of priced structural floors — see PERF.md; "
            "attainable_utt_per_sec = value * (1 + headroom) is the "
            "max-attainable e2e throughput at measured toolchain ceilings")
    prev_val, prev_file = _last_round_value()
    if prev_val:
        out["regression_vs_last_round"] = round(e2e_utt_per_sec / prev_val - 1, 4)
        note = f"vs {prev_val} utt/s ({prev_file}); warn-only (tunnel variance)"
        if e2e_utt_per_sec < 0.95 * prev_val:
            note += " — REGRESSION >5%: check tunnel health, then routing"
        out["regression_vs_last_round_note"] = note
    warn = {k: v for k, v in spreads.items() if v > SPREAD_TOL}
    if warn:
        out["spread_warning"] = warn

    # The headline is complete here — print it NOW (flushed) so a driver
    # timeout during the aux blocks can never erase the round's number
    # again (BENCH_r03 was rc=124/parsed:null). The enriched JSON follows
    # as later lines; each emission appends a compact summary trailer so
    # the LAST stdout line is always a small complete JSON object.
    _emit(out)
    _progress(f"headline {out['value']} utt/s — JSON line 1 emitted "
              f"({_remaining_s():.0f}s budget left); starting aux blocks")

    # --- time-boxed auxiliary blocks (most valuable first) ---

    def _aux_int8_gate():
        # int8 numerics gate: one un-scanned forward per precision path
        t5 = int(5.0 * SR)
        lt5 = BUCKET_LT[5.0]  # serving text bucket at the 5 s config
        wavs5 = jnp.asarray(rng.standard_normal((B, t5)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
        ids5 = jnp.asarray(rng.integers(0, 30000, size=(B, lt5)).astype(np.int32))
        ones = lambda n: jnp.ones((B, n), jnp.int32)

        @jax.jit
        def _probs(P_, wavs, wmask, ids, tmask):
            h_a, fmask = wavlm.apply(P_["w"], wavs, wmask)
            h_t, _ = bert.apply(P_["b"], ids, tmask)
            logits, _b, _ = fusion.apply(
                P_["f"], h_a, h_t.astype(h_a.dtype), fmask == 0, tmask == 0)
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        p_int8 = np.asarray(_probs(P, wavs5, ones(t5), ids5, ones(lt5)))
        p_bf16 = np.asarray(_probs(P16, wavs5, ones(t5), ids5, ones(lt5)))
        delta = float(np.abs(p_int8 - p_bf16).max())
        return {
            "int8_prob_delta": round(delta, 5),
            "int8_prob_delta_note": (
                f"gated <= {INT8_PROB_DELTA_MAX} (bench fails if exceeded); "
                "measured on random-init weights — real-weight outlier check: "
                "tools/validate_pretrained_bridges.py --int8-report"),
        }

    def _aux_mfu():
        # per-bucket MFU = FLOPs / measured time / peak. FLOPs are
        # deterministic per (batch, seconds, lt, model config), so they
        # come from the committed bucket_flops.json (tools/bucket_flops.py,
        # regenerated on config changes — drift-guarded by
        # tests/test_kernel_numerics_drift.py). The previous live version
        # paid one remote single-forward compile per bucket: 10 min cold
        # at 14 buckets (BENCH r4 first run), which starved the train
        # block out of the time budget.
        cached = {}
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "bucket_flops.json")) as f:
                art = json.load(f)
            cached = art.get("buckets", {})
        except Exception:
            pass
        mfu = {}
        for sec in BUCKETS_S:
            batch, lt = BUCKET_B[sec], BUCKET_LT.get(sec, LT)
            e = cached.get(str(sec))
            if e and e.get("batch") == batch and e.get("lt") == lt:
                flops = e["flops"]
            else:  # artifact stale/missing for this bucket: live compile
                t = int(sec * SR)
                wavs = jnp.asarray(rng.standard_normal((batch, t)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
                ids = jnp.asarray(rng.integers(0, 30000, size=(batch, lt)).astype(np.int32))
                flops = _cost_flops((P, wavs, jnp.ones((batch, t), jnp.int32),
                                     ids, jnp.ones((batch, lt), jnp.int32)))
            if flops:
                mfu[str(sec)] = round(flops / bucket_stats[sec][0] / V5E_BF16_PEAK, 3)
        return mfu

    def _aux_bf16():
        # bf16 continuity metric: keep LT=128 (the rounds-1/2 measurement
        # condition) so the key stays comparable across rounds — the
        # serving text buckets would otherwise fold a 4x-shorter BERT into
        # what reads as a bf16-path change (review finding, round 3c)
        t5 = int(5.0 * SR)
        wavs5 = jnp.asarray(rng.standard_normal((B, t5)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
        ids128 = jnp.asarray(rng.integers(0, 30000, size=(B, LT)).astype(np.int32))
        ones = lambda n: jnp.ones((B, n), jnp.int32)
        fn5 = e2e_fn(ITERS)
        args5 = (P16, wavs5, ones(t5), ids128, ones(LT))
        float(fn5(*args5))
        bf16_best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            float(fn5(*args5))
            bf16_best = min(bf16_best, (time.perf_counter() - t0) / ITERS)
        return round(bf16_best * 1000, 1)

    def _aux_p50():
        # p50 per-clip latency: single clip at the median bucket, served
        # int8 — the SAME precision as the throughput tier. The round-3
        # "int8 B=1 is launch-bound and slower" result (6.0 vs 3.7 ms)
        # is obsolete under the round-4 schedules/packing: re-measured
        # round 5 (.scratch/p50_b1_ab.py, 3.75 s bucket) int8 wins at
        # every small batch — B=1 3.06 vs 3.31 bf16 (-8%), B=2 -11%,
        # B=4 -13%, B=8 -18%. One serving precision for both regimes.
        median_bucket = BUCKETS_S[int(np.searchsorted(BUCKETS_S, np.median(durations)))]
        return round(measure(1, median_bucket, iters=20, params=P)[0] * 1000, 1)

    def _aux_fusion_only():
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
        for _ in range(REPEATS):  # best-of-N over the flaky tunnel
            t0 = time.perf_counter()
            float(fusion_fn(P["f"], h_a, h_t, mask_a, mask_t))
            best = min(best, time.perf_counter() - t0)
        return round(B * 30 / best, 1)

    # Order: cheap gates first, then train BEFORE scheduler — the
    # scheduler block is the most overrun-prone (9.5 min in BENCH r4's
    # first full run) and must not starve the train row out of the
    # driver artifact (it did exactly that once).
    _timebox(out, "int8", _aux_int8_gate)
    _timebox(out, "mfu", _aux_mfu)
    _timebox(out, "train", bench_train)
    _timebox(out, "scheduler",
             lambda: bench_scheduler(wavlm, bert, fusion, bucket_stats, rng))
    _timebox(out, "bf16_ms_per_batch64_5s", _aux_bf16)
    _timebox(out, "p50_ms_per_clip", _aux_p50)
    if isinstance(out.get("p50_ms_per_clip"), (int, float)):
        # VERDICT r4 weak #5: the p50 number's serving precision must be
        # in the artifact itself. Round 5 re-measured B=1: int8 now WINS
        # (3.06 vs 3.31 ms at the median bucket; the round-3 launch-bound
        # 6.0 ms result is obsolete under the round-4 schedules/packing —
        # .scratch/p50_b1_ab.py), so the latency tier serves int8 too.
        out["p50_config"] = ("int8 B=1 at the median-duration bucket — "
                             "same precision as the throughput tier "
                             "(int8 B=1 launch-bound penalty measured "
                             "GONE in round 5: 3.06 int8 vs 3.31 bf16)")
    _timebox(out, "fusion_only_utt_per_sec", _aux_fusion_only)

    # flatten the int8-gate fields to their historical top-level names
    gate_failed = None
    int8_res = out.pop("int8", None)
    if isinstance(int8_res, dict) and "int8_prob_delta" in int8_res:
        out.update(int8_res)
        if out["int8_prob_delta"] > INT8_PROB_DELTA_MAX:
            gate_failed = (
                f"int8 serving numerics regression: prob delta "
                f"{out['int8_prob_delta']:.5f} > {INT8_PROB_DELTA_MAX} vs "
                f"bf16 (random-init weights)")
            out["int8_gate_failed"] = gate_failed
    elif int8_res is not None:
        out["int8_gate"] = int8_res  # skip/error note
    if "mfu" in out and isinstance(out["mfu"], dict) and \
            "skipped" not in out["mfu"] and "error" not in out["mfu"]:
        out["mfu_note"] = (f"compiled-HLO FLOPs / time / v5e bf16 peak "
                           f"({V5E_BF16_PEAK/1e12:.0f} TF/s)")

    _emit(out)
    if gate_failed:  # fail loudly AFTER the artifact is out (advisor r2)
        raise AssertionError(gate_failed)


if __name__ == "__main__":
    main()
