#!/usr/bin/env python3
"""Regenerate ``bucket_flops.json`` — per-bucket single-forward FLOPs.

The bench's per-bucket MFU needs the compiled-HLO FLOP count of one
un-scanned serving forward at each (batch, seconds, text-bucket) shape.
FLOPs are deterministic per config, but computing them live costs one
remote compile per bucket (~10 min cold at the 14-bucket config — it
starved the train block out of BENCH r4's first run). This tool pays
that cost ONCE, on the real chip, and commits the result; bench.py's
mfu block reads the artifact and only falls back to a live compile for
buckets whose (batch, lt) no longer match.

Drift guard: tests/test_kernel_numerics_drift.py asserts the artifact
covers the current serving config, so a config change without a
regeneration fails the suite.

Usage (repo root, real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/bucket_flops.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402  — serving-config single source of truth


def main():
    bench._enable_compile_cache()
    wavlm, bert, fusion, _P16, P = bench.build_serving_models()
    rng = np.random.default_rng(0)

    @jax.jit
    def fwd(P, wavs, wmask, ids, tmask):
        # identical body to bench.main()'s _single_forward: the un-scanned
        # forward (XLA's cost analysis counts a while-loop body once, so
        # analysing the timed scan graph would under-count by the trip
        # count — verified 8.7x in round 3)
        h_a, fmask = wavlm.apply(P["w"], wavs, wmask)
        h_t, _ = bert.apply(P["b"], ids, tmask)
        logits, _beta, _ = fusion.apply(
            P["f"], h_a, h_t.astype(h_a.dtype), fmask == 0, tmask == 0)
        return jnp.mean(logits.astype(jnp.float32))

    buckets = {}
    for sec in bench.BUCKETS_S:
        batch = bench.BUCKET_B[sec]
        lt = bench.BUCKET_LT.get(sec, bench.LT)
        t = int(sec * bench.SR)
        wavs = jnp.asarray(
            rng.standard_normal((batch, t)).astype(np.float32) * 0.1
        ).astype(jnp.bfloat16)
        ids = jnp.asarray(rng.integers(0, 30000, size=(batch, lt)).astype(np.int32))
        ca = fwd.lower(P, wavs, jnp.ones((batch, t), jnp.int32),
                       ids, jnp.ones((batch, lt), jnp.int32)).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
        buckets[str(sec)] = {"batch": batch, "lt": lt, "flops": flops}
        print(f"# {sec}s B={batch} lt={lt}: {flops/1e12:.3f} TFLOP/batch",
              file=sys.stderr)

    out = {
        "note": ("compiled-HLO FLOPs of one un-scanned int8-serving forward "
                 "per bucket (tools/bucket_flops.py on the real chip); "
                 "consumed by bench.py's mfu block"),
        "serving_model": ("WavLM base_plus fast_gelu + BERT base_uncased "
                          "fast_gelu + FusionWithEmotionDecoder(768/4/8/2/2/256), "
                          "int8 W8A8 serving params"),
        "buckets": buckets,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "bucket_flops.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
