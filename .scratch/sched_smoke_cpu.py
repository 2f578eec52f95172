"""CPU smoke of bench.bench_scheduler incl. the new device-resident
validation block (VERDICT r4 #4): tiny frontends, 2 buckets, batch 8.
Drives the REAL code path (StreamingPipeline int8 tree, recorded flush
schedule, staged device-resident re-run) end-to-end on the CPU backend.

Run: PYTHONPATH=/root/repo:/root/.axon_site python .scratch/sched_smoke_cpu.py
"""
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
import hriemo.infer.streaming as streaming  # noqa: E402
from hriemo.frontends import (BertConfig, BertEncoder, WavLMConfig,  # noqa: E402
                              WavLMEncoder)
from hriemo.models import FusionWithEmotionDecoder  # noqa: E402

# shrink the serving config: 2 SHORT buckets (interpret-mode kernels on
# CPU are O(L^2)-slow at real durations), batch 8, 48 clips
tiny_b = {0.5: 8, 1.0: 8}
bench.BUCKETS_S = (0.5, 1.0)
bench.BUCKET_B = tiny_b
streaming.MEASURED_BUCKET_BATCH = tiny_b
bench.LT = 64  # tiny BERT has 64 positions
_mix = bench._duration_mix
bench._duration_mix = lambda n, seed: np.clip(_mix(n, seed) / 10.0, 0.05, 1.0)

wavlm = WavLMEncoder(WavLMConfig.tiny())
bert = BertEncoder(BertConfig.tiny(vocab_size=30522))
fusion = FusionWithEmotionDecoder(
    d_model=32, num_emotions=4, n_heads=4, num_layers_fusion=1,
    num_layers_decoder=1, beta_hidden=16, dropout=0.0)

bucket_stats = {0.5: (0.05,), 1.0: (0.2,)}
rng = np.random.default_rng(0)
out = bench.bench_scheduler(wavlm, bert, fusion, bucket_stats, rng,
                            n_clips=48)
for k in ("utt_per_sec_sustained", "utt_per_sec_device_resident",
          "device_resident_wall_ms", "device_resident_vs_budget",
          "device_resident_note"):
    assert k in out, f"missing {k}"
assert out["utt_per_sec_device_resident"] > 0
print(json.dumps({k: v for k, v in out.items() if "note" not in k},
                 indent=1))
print("SMOKE_OK")
