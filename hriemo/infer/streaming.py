#!/usr/bin/env python3
"""End-to-end streaming inference: raw inputs → emotion probabilities.

BASELINE.json configs[4]: on-device WavLM + BERT feature extraction →
cross-modal fusion → emotion decoder, as ONE compiled XLA graph per batch,
with host preprocessing (wav decode/resample, tokenisation) overlapped
with device compute via a double-buffered feed. This is the north-star
path the reference runs as three separate offline stages
(extract → save .pt → train/infer; SURVEY.md §3.5).

Usage (library):

    pipe = StreamingPipeline(wavlm, bert, fusion_model, compute_dtype=jnp.bfloat16)
    probs, beta = pipe.infer(waveforms, texts)          # single batch
    for probs, beta, uids in pipe.stream(batch_iter):   # double-buffered
        ...
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Measured-optimal serving batch per length bucket (v5e, int8 path,
# re-searched after every kernel-schedule change — bench.py BUCKET_B;
# round 3: 2.5 s AND 5 s moved to B=256 with the full-width qkv
# schedules, and the 7.5 s bucket JOINED the config — the round-2
# "same tiles" result is obsolete under those schedules (0.948 vs
# 1.207 ms/utt at 10 s). Round 4: each coarse bucket split in two at
# the half-bucket duration (conv sub-bucketing: the fine bucket shares
# its sibling's encoder tile AND batch, pays half-bucket conv —
# -5..-24% per-utt measured, +6.1% at the serving mix; bench.py
# BUCKETS_S comment has the per-bucket A/B numbers).
# Round 4b adds the quarter-step midpoints (minus 9.375 s — measured
# within noise of 10 s): 14 buckets total. Round 4c re-searched the
# per-fine-bucket batch (the sub-buckets had inherited their coarse
# sibling's optimum, but their conv share is smaller so the fixed-cost
# amortization point moved): 1.25 s -> 768 (-1.1% per-utt), 1.875 s ->
# 512 (-0.9%), 3.125 s -> 384 (-1.7%; 512 tied within 0.1%, kept the
# smaller batch for flush latency). All other buckets re-measured at
# their current optimum (.scratch/batch_sweep_r4b.py, real chip).
MEASURED_BUCKET_BATCH = {1.25: 768, 1.875: 512, 2.5: 384, 3.125: 384,
                         3.75: 256, 4.375: 256, 5.0: 256, 5.625: 128,
                         6.25: 128, 6.875: 128, 7.5: 128, 8.125: 128,
                         8.75: 128, 10.0: 128}


class StreamingPipeline:
    """Fused frontends + fusion-stack inference.

    Args:
        wavlm:   hriemo.frontends.WavLMEncoder (params loaded)
        bert:    hriemo.frontends.BertEncoder (params loaded)
        fusion:  a fusion model taking (h_a, h_t, mask_a, mask_t) and
                 returning (logits, beta, z) — e.g. FusionWithEmotionDecoder.
                 Its d_model must match the frontends' hidden size, or pass
                 ``audio_proj``/``text_proj``-style wrapper models.
        tokenizer: callable(texts, max_length, ...) -> input_ids/attention_mask
                 (HF tokenizer or compatible).
    """

    def __init__(self, wavlm, bert, fusion, tokenizer=None,
                 max_seconds: float = 10.0, max_tokens: int = 128,
                 compute_dtype=jnp.bfloat16, multi_label: bool = True,
                 bucket_seconds: tuple = (), int8_frontends: bool = False,
                 int8_fusion: bool | None = None,
                 wav_transport: str = "f32",
                 text_bucket_tokens: tuple = ()):
        self.wavlm = wavlm
        self.bert = bert
        self.fusion = fusion
        self.tokenizer = tokenizer
        self.max_seconds = max_seconds
        self.max_tokens = max_tokens
        self.multi_label = multi_label
        # length bucketing: pad each batch to the smallest bucket that fits
        # its longest clip instead of always max_seconds — WavLM compute
        # scales ~linearly with audio length, so this is the single biggest
        # serving-throughput lever (measured on v5e: 305 utt/s at a flat
        # 10 s pad vs 1546 utt/s at 2.5 s). One XLA compile per bucket.
        # Numerics caveat (inherent to WavLM, identical in HF): the layer-0
        # GroupNorm normalises over the full padded length, so a clip's
        # features shift slightly with the bucket it lands in. The reference
        # sidesteps this by always padding to 10 s; pass
        # bucket_seconds=() to reproduce that exactly.
        # union with max_seconds so clips between the largest bucket and the
        # cap are padded to the cap rather than silently truncated
        self.bucket_seconds = tuple(sorted(set(bucket_seconds) | {max_seconds}))
        # Text-length bucketing: pad each flush's tokens to the smallest
        # bucket that covers the batch's longest REAL text instead of
        # always max_tokens. Unlike audio bucketing this is output-EXACT:
        # BERT is mask-exact (additive -inf attention; absolute position
        # embeddings of the valid prefix don't move), both β-gate pools
        # are masked means, and the fused sequence's rows at and past the
        # true text length are PAD in the OR-combined fused mask (the
        # reference's text-length alignment rule), so the decoder never
        # reads them. Measured logits delta LT=64 vs 32: 3.6e-7 (fp32
        # reduction-order noise); β bit-exact. The reference instead pads
        # every text to a fixed max_length
        # (extract_text_feats_bert.py:37-38) — pass () to reproduce that.
        self.text_buckets = tuple(sorted(
            {int(t) for t in text_bucket_tokens if int(t) < max_tokens}
            | {max_tokens}))
        dt = compute_dtype
        cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(dt), t)
        params = {
            "wavlm": cast(wavlm.params),
            "bert": cast(bert.params),
            "fusion": cast(fusion.params),
        }
        if int8_fusion is None:
            int8_fusion = int8_frontends
        if int8_frontends or int8_fusion:
            # W8A8 serving through the Pallas megakernels (attention
            # sublayer + fused FFN/mlp2). The fusion stack's β moved
            # < 1e-4 in the routing A/B and the e2e softmax-prob delta
            # is gated by bench.py (≤ 0.005 at the product config), so
            # int8 covers the full serving tree by default; pass
            # ``int8_fusion=False`` to keep the fusion stack in
            # compute_dtype (round-1 behavior).
            from ..ops.quant import quantize_tree_for_serving

            if int8_frontends:
                params["wavlm"] = quantize_tree_for_serving(params["wavlm"])
                params["bert"] = quantize_tree_for_serving(params["bert"])
            if int8_fusion:
                params["fusion"] = quantize_tree_for_serving(params["fusion"])
        self._params = params
        self._dt = dt
        # Host->device wav transport. "f32": float32 waveform + int32 mask
        # (reference-exact). "pcm16": int16 PCM + per-clip lengths — 4x
        # fewer H2D bytes (the serving default in bench.py). Real audio IS
        # 16-bit linear PCM (the reference decodes .wav via soundfile:
        # scripts/iemocap_feature_extraction_utter_level/
        # extract_audio_feats_wavlm.py:44), so for file-sourced clips the
        # int16 round-trip is bit-exact; synthetic float inputs quantize
        # with |err| <= 2^-15 (prob delta ~1e-5, gated by
        # tests/test_streaming.py::test_pcm16_transport_close_to_f32).
        # wavlm.apply consumes only attention_mask.sum(-1) (wavlm.py:314),
        # so the device-built iota<length mask is exactly equivalent.
        if wav_transport not in ("f32", "pcm16"):
            raise ValueError(f"wav_transport must be 'f32' or 'pcm16', got {wav_transport!r}")
        self.wav_transport = wav_transport

        @jax.jit
        def forward(p, wavs, wav_arg, ids, tok_mask):
            if wav_transport == "pcm16":
                wav_mask = (jnp.arange(wavs.shape[1], dtype=jnp.int32)[None, :]
                            < wav_arg[:, None]).astype(jnp.int32)
                wavs = wavs.astype(dt) * jnp.asarray(1.0 / 32768.0, dt)
            else:
                wav_mask = wav_arg
            h_a, frame_mask = self.wavlm.apply(p["wavlm"], wavs.astype(dt), wav_mask)
            h_t, _ = self.bert.apply(p["bert"], ids, tok_mask)
            mask_a = frame_mask == 0  # True = PAD
            mask_t = tok_mask == 0
            logits, beta, _ = self.fusion.apply(
                p["fusion"], h_a, h_t.astype(dt), mask_a, mask_t
            )
            logits = logits.astype(jnp.float32)
            probs = jax.nn.sigmoid(logits) if self.multi_label else jax.nn.softmax(logits, -1)
            return probs, beta.astype(jnp.float32)

        self._forward = forward

    # ---------------------------------------------------------------- host

    def _bucket_for(self, waveforms, sample_rate: int) -> float:
        longest = max(len(w) for w in waveforms) / sample_rate
        for sec in self.bucket_seconds:
            if longest <= sec:
                return sec
        return self.bucket_seconds[-1]

    def preprocess(self, waveforms: list[np.ndarray], texts: list[str],
                   sample_rate: int = 16_000):
        """Pad/tokenise a host batch into device-ready arrays (bucketed).

        Returns ``(wavs, wav_arg, ids, tmask)`` where ``(wavs, wav_arg)``
        is ``(float32 [B,T], int32 mask [B,T])`` under the ``"f32"``
        transport or ``(int16 PCM [B,T], int32 lengths [B])`` under
        ``"pcm16"`` (see ``wav_transport`` in ``__init__``).
        """
        b = len(waveforms)
        t_max = int(self._bucket_for(waveforms, sample_rate) * sample_rate)
        if self.wav_transport == "pcm16":
            wavs = np.zeros((b, t_max), np.int16)
            wmask = np.empty((b,), np.int32)  # lengths
            for i, w in enumerate(waveforms):
                n = min(len(w), t_max)
                if w.dtype == np.int16:
                    wavs[i, :n] = w[:n]  # file-sourced PCM: bit-exact
                else:
                    wavs[i, :n] = np.clip(w[:n] * 32768.0, -32768, 32767
                                          ).astype(np.int16)
                wmask[i] = n
        else:
            wavs = np.zeros((b, t_max), np.float32)
            wmask = np.zeros((b, t_max), np.int32)
            for i, w in enumerate(waveforms):
                n = min(len(w), t_max)
                if w.dtype == np.int16:
                    # int16 PCM source (the pcm16 transport's native
                    # input): scale to [-1, 1) so both transports share
                    # one input contract — without this an int16 clip
                    # would silently enter the model 32768x too large
                    wavs[i, :n] = w[:n].astype(np.float32) * (1.0 / 32768.0)
                else:
                    wavs[i, :n] = w[:n]
                wmask[i, :n] = 1

        if self.tokenizer is not None:
            enc = self.tokenizer(texts, max_length=self.max_tokens,
                                 padding="max_length", truncation=True,
                                 return_tensors="np")
            ids = np.asarray(enc["input_ids"], np.int32)
            tmask = np.asarray(enc["attention_mask"], np.int32)
            # slice to the smallest text bucket covering the batch's
            # longest real text (output-exact; see __init__)
            longest = int(tmask.sum(axis=1).max()) if len(texts) else 1
            for tb in self.text_buckets:
                if longest <= tb:
                    ids, tmask = ids[:, :tb], tmask[:, :tb]
                    break
        else:
            raise ValueError("StreamingPipeline needs a tokenizer for text input")
        return wavs, wmask, ids, tmask

    # -------------------------------------------------------------- device

    def infer(self, waveforms, texts, sample_rate: int = 16_000):
        arrs = self.preprocess(waveforms, texts, sample_rate)
        probs, beta = self._forward(self._params, *map(jnp.asarray, arrs))
        return np.asarray(probs), np.asarray(beta)

    def stream_bucketed(self, clips, sample_rate: int = 16_000,
                        bucket_batch: dict | None = None,
                        default_batch: int = 64,
                        pad_flush: bool = False):
        """Bucket-queue scheduler: regroup clips by length bucket and flush
        each bucket at its measured-optimal batch size.

        ``stream`` pads every host batch to its LONGEST clip's bucket, so
        one 10 s clip drags a batch of 2.5 s clips to 4x their compute.
        This scheduler instead maintains one queue per bucket and flushes
        a queue when it reaches that bucket's batch size (defaults:
        :data:`MEASURED_BUCKET_BATCH`, the per-bucket optima measured by
        bench.py; unlisted buckets use ``default_batch``). Remaining
        partial batches flush at end of stream. A clip's result depends
        only on its own bucket (padding is masked; the layer-0 GroupNorm
        caveat above is per-bucket, same as ``stream``), so regrouping is
        numerics-neutral vs running the same clip in any other batch of
        its bucket.

        ``clips`` yields ``(waveform, text[, uid])`` triples. Yields
        ``(probs, beta, uids)`` per flushed batch — NOT in arrival order;
        join on uids.

        ``pad_flush=True`` pads partial (end-of-stream) batches to the
        bucket's configured batch size with silent filler clips and drops
        their outputs — every flush then reuses the bucket's one compiled
        XLA shape instead of triggering a fresh ~20-40 s compile per
        remainder size (static shapes are the TPU serving contract).
        """
        if bucket_batch is None:
            bucket_batch = MEASURED_BUCKET_BATCH
        queues: dict[float, list] = {sec: [] for sec in self.bucket_seconds}
        # one-deep pending queue: a flush only DISPATCHES (jax dispatch is
        # async — the host returns before the device finishes); the
        # np.asarray conversion that blocks on the device happens one
        # flush later, so host preprocessing of the next batch overlaps
        # the previous batch's device compute (same double-buffering as
        # stream(); round-2 advisor/judge finding — the old version
        # converted inside flush and serialized host and device).
        pending = None

        def dispatch(sec):
            q = queues[sec]
            if not q:
                return None
            queues[sec] = []
            n = len(q)
            target = bucket_batch.get(sec, default_batch)
            if pad_flush and n < target:
                # silent 10 ms filler clips keep the batch at the bucket's
                # compiled shape; their rows are sliced off below (the
                # slice is an async device op — no extra host sync)
                filler = (np.zeros(sample_rate // 100, np.float32), "", None)
                q = q + [filler] * (target - n)
            wavs = [c[0] for c in q]
            texts = [c[1] for c in q]
            uids = [c[2] for c in q[:n]]
            # preprocess pads to the queue's own bucket by construction
            # (filler clips are shorter than every real clip in the queue)
            arrs = self.preprocess(wavs, texts, sample_rate)
            probs, beta = self._forward(self._params, *map(jnp.asarray, arrs))
            return (probs[:n], beta[:n]), uids

        for i, clip in enumerate(clips):
            wav = clip[0]
            text = clip[1]
            uid = clip[2] if len(clip) > 2 else i
            sec = self._bucket_for([wav], sample_rate)
            queues[sec].append((wav, text, uid))
            if len(queues[sec]) >= bucket_batch.get(sec, default_batch):
                out = dispatch(sec)
                if out is not None:
                    if pending is not None:
                        (p_probs, p_beta), p_uids = pending
                        yield np.asarray(p_probs), np.asarray(p_beta), p_uids
                    pending = out
        for sec in self.bucket_seconds:
            out = dispatch(sec)
            if out is not None:
                if pending is not None:
                    (p_probs, p_beta), p_uids = pending
                    yield np.asarray(p_probs), np.asarray(p_beta), p_uids
                pending = out
        if pending is not None:
            (p_probs, p_beta), p_uids = pending
            yield np.asarray(p_probs), np.asarray(p_beta), p_uids

    def stream(self, batches, sample_rate: int = 16_000):
        """Double-buffered streaming: ``batches`` yields
        ``(waveforms, texts[, uids])``; host preprocessing and the previous
        batch's device compute overlap (async dispatch)."""
        pending = None
        for batch in batches:
            wavs, texts = batch[0], batch[1]
            uids = batch[2] if len(batch) > 2 else None
            arrs = self.preprocess(wavs, texts, sample_rate)
            result = self._forward(self._params, *map(jnp.asarray, arrs))
            if pending is not None:
                (p_probs, p_beta), p_uids = pending
                yield np.asarray(p_probs), np.asarray(p_beta), p_uids
            pending = (result, uids)
        if pending is not None:
            (p_probs, p_beta), p_uids = pending
            yield np.asarray(p_probs), np.asarray(p_beta), p_uids
