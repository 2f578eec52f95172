#!/usr/bin/env python3
"""Pretrained-weight golden validation for the WavLM / BERT bridges.

The reference's behavior is defined on real ``microsoft/wavlm-base-plus``
and ``bert-base-uncased`` weights (reference:
scripts/iemocap_feature_extraction_utter_level/extract_audio_feats_wavlm.py:22,
extract_text_feats_bert.py model name). This environment has zero egress,
so the bridges are CI-proven against random-init HF-config oracles
(tests/test_frontends.py); **this tool is the "press play when weights
exist" runbook** (VERDICT.md round 1, next-step #8): point it at on-disk
HF state dicts and it

  1. loads each state dict through the framework bridge
     (``from_torch_state_dict`` — including weight-norm handling for the
     WavLM positional conv, both naming schemes),
  2. runs deterministic probe inputs through the JAX frontend,
  3. cross-checks against the HF torch forward to ``--atol`` (default
     2e-4, the repo-wide oracle tolerance) on valid positions, and
  4. writes a golden file recording probe spec + output fingerprints, so
     later refactors can be regression-checked with ``--check-golden``
     without torch in the loop.

Usage (the moment weights are mountable):

    python tools/validate_pretrained_bridges.py \
        --wavlm /weights/wavlm-base-plus/pytorch_model.bin \
        --bert  /weights/bert-base-uncased/pytorch_model.bin \
        --out   goldens/pretrained_golden.json

    # later, regression-check a refactor against the recorded goldens:
    python tools/validate_pretrained_bridges.py \
        --wavlm ... --bert ... --check-golden goldens/pretrained_golden.json

State dict formats: torch.load-able (.bin/.pt) or .safetensors.
CI coverage: tests/test_pretrained_golden.py drives this exact flow with
synthetic random-init state dicts at tiny configs, exercising BOTH
weight-norm naming schemes (old ``weight_g``/``weight_v`` and new
``parametrizations.weight.original0/1``).
"""

from __future__ import annotations

import argparse
import dataclasses
import hashlib
import json
import sys

import numpy as np

ATOL_DEFAULT = 2e-4


def _load_state_dict(path: str):
    if path.endswith(".safetensors"):
        from safetensors.torch import load_file

        return load_file(path)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    # accept both a bare state dict and a {"state_dict": ...} wrapper
    if isinstance(obj, dict) and "state_dict" in obj and all(
        hasattr(v, "shape") for v in obj["state_dict"].values()
    ):
        return obj["state_dict"]
    return obj


def _fingerprint(arr: np.ndarray) -> dict:
    """Stable summary of an activation tensor for the golden file."""
    a = np.asarray(arr, np.float64)
    return {
        "shape": list(a.shape),
        "mean": float(a.mean()),
        "std": float(a.std()),
        "absmax": float(np.abs(a).max()),
        "first8": [float(v) for v in a.ravel()[:8]],
        # hash of the fp32 values rounded to 1e-3 — loose enough to survive
        # benign compiler/version drift, tight enough to catch real bugs
        "sha256_r3": hashlib.sha256(
            np.round(a, 3).astype(np.float32).tobytes()
        ).hexdigest(),
    }


def _probe_inputs(kind: str, seed: int = 0):
    rng = np.random.default_rng(seed)
    if kind == "wavlm":
        wav = (rng.standard_normal((3, 16000)) * 0.1).astype(np.float32)
        mask = np.ones((3, 16000), np.int64)
        mask[1, 11000:] = 0
        mask[2, 7000:] = 0
        return wav, mask
    ids = rng.integers(0, 1000, size=(3, 24))
    mask = np.ones((3, 24), np.int64)
    mask[1, 16:] = 0
    mask[2, 9:] = 0
    return ids, mask


def validate_wavlm(sd, config_overrides: dict, atol: float, hf_compare: bool):
    import jax.numpy as jnp

    from hriemo.frontends import WavLMConfig, WavLMEncoder

    cfg = (dataclasses.replace(WavLMConfig.base_plus(), **config_overrides)
           if config_overrides else WavLMConfig.base_plus())
    enc = WavLMEncoder(cfg).from_torch_state_dict(sd)
    wav, mask = _probe_inputs("wavlm")
    jseq, jmask = enc.apply(enc.params, jnp.asarray(wav), jnp.asarray(mask))
    jseq, jmask = np.asarray(jseq), np.asarray(jmask)

    report = {"fingerprint": _fingerprint(jseq),
              "frame_mask_sums": [int(s) for s in jmask.sum(-1)]}
    if hf_compare:
        import torch
        from transformers import WavLMConfig as HFWavLMConfig, WavLMModel

        hf_cfg = HFWavLMConfig(
            hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size, conv_dim=list(cfg.conv_dim),
            conv_kernel=list(cfg.conv_kernel), conv_stride=list(cfg.conv_stride),
            num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
            num_buckets=cfg.num_buckets, max_bucket_distance=cfg.max_bucket_distance,
            conv_bias=cfg.conv_bias, feat_extract_norm="group",
            do_stable_layer_norm=False, hidden_dropout=0.0, activation_dropout=0.0,
            attention_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
            mask_time_prob=0.0, mask_feature_prob=0.0,
        )
        tmodel = WavLMModel(hf_cfg).eval()
        tmodel.load_state_dict(
            {k[len("wavlm."):] if k.startswith("wavlm.") else k: torch.as_tensor(np.asarray(v))
             for k, v in sd.items() if "adapter" not in k})
        with torch.no_grad():
            tout = tmodel(input_values=torch.tensor(wav),
                          attention_mask=torch.tensor(mask))
        t_seq = tout.last_hidden_state.numpy()
        max_delta = 0.0
        for b in range(wav.shape[0]):
            n = int(jmask[b].sum())
            max_delta = max(max_delta, float(np.abs(jseq[b, :n] - t_seq[b, :n]).max()))
        report["hf_max_delta_valid"] = max_delta
        if max_delta > atol:
            raise AssertionError(
                f"WavLM bridge mismatch vs HF torch: max|Δ|={max_delta:.2e} > atol={atol:g}")
    return report


def validate_bert(sd, config_overrides: dict, atol: float, hf_compare: bool):
    import jax.numpy as jnp

    from hriemo.frontends import BertConfig, BertEncoder

    cfg = (dataclasses.replace(BertConfig.base_uncased(), **config_overrides)
           if config_overrides else BertConfig.base_uncased())
    enc = BertEncoder(cfg).from_torch_state_dict(sd)
    ids, mask = _probe_inputs("bert")
    ids = ids % cfg.vocab_size
    jseq, jpool = enc.apply(enc.params, jnp.asarray(ids), jnp.asarray(mask))
    jseq, jpool = np.asarray(jseq), np.asarray(jpool)

    report = {"fingerprint": _fingerprint(jseq), "pooled": _fingerprint(jpool)}
    if hf_compare:
        import torch
        from transformers import BertConfig as HFBertConfig, BertModel

        hf_cfg = HFBertConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            max_position_embeddings=cfg.max_position_embeddings,
            type_vocab_size=cfg.type_vocab_size, hidden_act="gelu",
            attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        )
        tmodel = BertModel(hf_cfg).eval()
        tmodel.load_state_dict(
            {k[len("bert."):] if k.startswith("bert.") else k: torch.as_tensor(np.asarray(v))
             for k, v in sd.items() if not k.startswith("cls.")},
            strict=False)  # HF adds pooler.* we intentionally don't carry
        with torch.no_grad():
            tout = tmodel(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
        t_seq = tout.last_hidden_state.numpy()
        max_delta = 0.0
        for b in range(ids.shape[0]):
            n = int(mask[b].sum())
            max_delta = max(max_delta, float(np.abs(jseq[b, :n] - t_seq[b, :n]).max()))
        report["hf_max_delta_valid"] = max_delta
        if max_delta > atol:
            raise AssertionError(
                f"BERT bridge mismatch vs HF torch: max|Δ|={max_delta:.2e} > atol={atol:g}")
    return report


def int8_report(wavlm_sd, bert_sd, fusion_ckpt: str | None,
                envelope: float, wavlm_overrides: dict, bert_overrides: dict,
                num_emotions: int = 4, multi_label: bool = True) -> dict:
    """int8 W8A8 numerics on REAL weights (VERDICT r2 next #4).

    Quantizes the bridged state dicts with the product recipe
    (ops.quant.quantize_tree_for_serving), runs the full serving stack
    (WavLM + BERT + fusion) to probabilities/β EAGERLY, and reports

      * per-layer activation-amax distributions (p50/p99/max +
        outlier_ratio — the classic W8A8 failure indicator: a few
        high-magnitude channels inflating per-row scales),
      * max prob/β deltas vs the full-precision reference,
      * the mitigation trace: when the prob delta exceeds ``envelope``,
        layers are greedily reverted to bf16 (worst crest_p90 first,
        outlier_ratio as tie-break)
        until the delta is back inside the envelope — the reverted list
        IS the serving config change to ship
        (``quantize_tree_for_serving(exclude=...)``).

    The fusion stack comes from ``--fusion-ckpt`` (reference-layout
    best_*.pt) when given, else random-init at product dims (deltas then
    cover the frontends' real weights only — noted in the report).
    CI: tests/test_quant.py::test_int8_report_outlier_mitigation injects
    synthetic outlier weights and asserts the mitigation engages.
    """
    import jax.numpy as jnp

    from hriemo.frontends import BertConfig, BertEncoder, WavLMConfig, WavLMEncoder
    from hriemo.models import FusionWithEmotionDecoder
    from hriemo.ops.quant import int8_numerics_report
    from hriemo.utils import checkpoint as C

    wcfg = (dataclasses.replace(WavLMConfig.base_plus(), **wavlm_overrides)
            if wavlm_overrides else WavLMConfig.base_plus())
    bcfg = (dataclasses.replace(BertConfig.base_uncased(), **bert_overrides)
            if bert_overrides else BertConfig.base_uncased())
    wavlm = WavLMEncoder(wcfg).from_torch_state_dict(wavlm_sd)
    bert = BertEncoder(bcfg).from_torch_state_dict(bert_sd)

    fusion_note = "fusion: random-init at product dims (no --fusion-ckpt)"
    fusion = FusionWithEmotionDecoder(
        d_model=wcfg.hidden_size, num_emotions=num_emotions, n_heads=8,
        num_layers_fusion=2, num_layers_decoder=2,
        beta_hidden=max(16, wcfg.hidden_size // 3), dropout=0.1)
    if fusion_ckpt:
        ckpt = C.load_torch_checkpoint(fusion_ckpt)
        ck = ckpt.get("args", {})
        fusion = FusionWithEmotionDecoder(
            d_model=ck.get("d_model", wcfg.hidden_size),
            num_emotions=len(ckpt.get("emo_cols", [])) or num_emotions,
            n_heads=ck.get("n_heads", 8),
            num_layers_fusion=ck.get("num_layers_fusion", 2),
            num_layers_decoder=ck.get("num_layers_decoder", 2),
            beta_hidden=ck.get("beta_hidden", 256),
            dropout=ck.get("dropout", 0.1))
        fusion.params = C.params_from_state_dict(
            ckpt["model_state_dict"], like=fusion.params)
        fusion_note = f"fusion: {fusion_ckpt}"

    wav, wmask = _probe_inputs("wavlm")
    ids, tmask = _probe_inputs("bert")
    ids = ids % bcfg.vocab_size
    params = {"w": wavlm.params, "b": bert.params, "f": fusion.params}

    def apply_fn(p, wav, wmask, ids, tmask):
        h_a, fmask = wavlm.apply(p["w"], wav, wmask)
        h_t, _ = bert.apply(p["b"], ids, tmask)
        logits, beta, _ = fusion.apply(
            p["f"], h_a, h_t.astype(h_a.dtype), fmask == 0, tmask == 0)
        import jax

        probs = (jax.nn.sigmoid(logits) if multi_label
                 else jax.nn.softmax(logits, -1))
        return {"probs": probs, "beta": beta}

    args = (jnp.asarray(wav), jnp.asarray(wmask),
            jnp.asarray(ids), jnp.asarray(tmask))
    report = int8_numerics_report(apply_fn, params, args, envelope=envelope)
    report["fusion_source"] = fusion_note
    return report


def _check_against_golden(golden_path: str, results: dict, atol: float):
    with open(golden_path) as f:
        golden = json.load(f)
    for name, rep in results.items():
        if name not in golden.get("results", {}):
            continue
        want = golden["results"][name]["fingerprint"]
        got = rep["fingerprint"]
        if want["shape"] != got["shape"]:
            raise AssertionError(f"{name}: golden shape {want['shape']} != {got['shape']}")
        for field in ("mean", "std", "absmax"):
            if abs(want[field] - got[field]) > max(atol, 1e-3 * abs(want[field])):
                raise AssertionError(
                    f"{name}: golden {field} {want[field]:.6g} != {got[field]:.6g}")
        d = np.abs(np.asarray(want["first8"]) - np.asarray(got["first8"])).max()
        if d > 10 * atol:
            raise AssertionError(f"{name}: golden first8 max|Δ|={d:.2e}")
    print(f"golden check OK vs {golden_path}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--wavlm", help="path to a WavLM HF state dict (.bin/.pt/.safetensors)")
    ap.add_argument("--bert", help="path to a BERT HF state dict")
    ap.add_argument("--wavlm-config", default=None,
                    help="JSON dict of WavLMConfig overrides (default: base-plus)")
    ap.add_argument("--bert-config", default=None,
                    help="JSON dict of BertConfig overrides (default: base-uncased)")
    ap.add_argument("--atol", type=float, default=ATOL_DEFAULT)
    ap.add_argument("--out", default=None, help="write golden JSON here")
    ap.add_argument("--check-golden", default=None,
                    help="compare fingerprints against an existing golden file")
    ap.add_argument("--no-hf-compare", action="store_true",
                    help="skip the torch cross-check (fingerprints/golden only)")
    ap.add_argument("--int8-report", default=None, metavar="OUT_JSON",
                    help="run the int8 W8A8 numerics report on the real "
                         "weights (per-layer activation amax, prob/β deltas "
                         "vs full precision, selective-bf16 outlier "
                         "mitigation) and write it here; needs --wavlm AND "
                         "--bert")
    ap.add_argument("--int8-envelope", type=float, default=0.005,
                    help="max allowed |Δprob| for the int8 serving path "
                         "(bench.py gates the random-weight config at 0.006)")
    ap.add_argument("--fusion-ckpt", default=None,
                    help="reference-layout best_*.pt for the fusion stack "
                         "in the int8 report (else random-init)")
    args = ap.parse_args(argv)
    if not args.wavlm and not args.bert:
        ap.error("provide --wavlm and/or --bert")
    if args.int8_report and not (args.wavlm and args.bert):
        ap.error("--int8-report needs both --wavlm and --bert")

    # fp32 parity needs full-precision matmuls (TPU defaults to bf16 inputs)
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

    results = {}
    if args.wavlm:
        sd = _load_state_dict(args.wavlm)
        results["wavlm"] = validate_wavlm(
            sd, json.loads(args.wavlm_config) if args.wavlm_config else {},
            args.atol, not args.no_hf_compare)
        print(f"wavlm: bridge OK"
              + (f", max|Δ| vs HF = {results['wavlm']['hf_max_delta_valid']:.2e}"
                 if "hf_max_delta_valid" in results["wavlm"] else ""))
    if args.bert:
        sd = _load_state_dict(args.bert)
        results["bert"] = validate_bert(
            sd, json.loads(args.bert_config) if args.bert_config else {},
            args.atol, not args.no_hf_compare)
        print(f"bert: bridge OK"
              + (f", max|Δ| vs HF = {results['bert']['hf_max_delta_valid']:.2e}"
                 if "hf_max_delta_valid" in results["bert"] else ""))

    if args.int8_report:
        rep = int8_report(
            _load_state_dict(args.wavlm), _load_state_dict(args.bert),
            args.fusion_ckpt, args.int8_envelope,
            json.loads(args.wavlm_config) if args.wavlm_config else {},
            json.loads(args.bert_config) if args.bert_config else {})
        with open(args.int8_report, "w") as f:
            json.dump(rep, f, indent=2)
        d0 = rep["deltas_full_int8"]["probs"]
        d1 = rep["deltas_final"]["probs"]
        print(f"int8 report: full-int8 |Δprob|={d0:.5f}; "
              f"{len(rep['reverted_layers'])} layer(s) reverted to bf16 -> "
              f"|Δprob|={d1:.5f} "
              f"({'WITHIN' if rep['within_envelope'] else 'EXCEEDS'} "
              f"envelope {args.int8_envelope}); written to {args.int8_report}")
        if not rep["within_envelope"]:
            raise AssertionError(
                "int8 numerics exceed the envelope even after mitigation — "
                "do not ship int8 serving with these weights; see the "
                "report's activation_amax for the offending layers")

    if args.check_golden:
        _check_against_golden(args.check_golden, results, args.atol)
    if args.out:
        golden = {
            "probe": "deterministic seed-0 inputs (see _probe_inputs)",
            "atol": args.atol,
            "results": results,
        }
        with open(args.out, "w") as f:
            json.dump(golden, f, indent=2)
        print(f"golden written to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
