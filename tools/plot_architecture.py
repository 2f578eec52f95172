#!/usr/bin/env python3
"""Generate the architecture figure
(reference ships a static tools/beta_decoder_architecture.png; this
regenerates the equivalent diagram programmatically)."""

import argparse
from pathlib import Path


def main(argv=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import FancyArrowPatch, FancyBboxPatch

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tools/beta_decoder_architecture.png")
    args = ap.parse_args(argv)

    fig, ax = plt.subplots(figsize=(11, 7))
    ax.set_xlim(0, 11)
    ax.set_ylim(0, 10)
    ax.axis("off")

    def box(x, y, w, h, label, color):
        ax.add_patch(FancyBboxPatch((x, y), w, h, boxstyle="round,pad=0.08",
                                    facecolor=color, edgecolor="#333", linewidth=1.2))
        ax.text(x + w / 2, y + h / 2, label, ha="center", va="center", fontsize=9)

    def arrow(x0, y0, x1, y1):
        ax.add_patch(FancyArrowPatch((x0, y0), (x1, y1), arrowstyle="-|>",
                                     mutation_scale=14, color="#333", linewidth=1.2))

    a, t, f, d = "#cfe3f7", "#d9f2d0", "#fbe3b5", "#ecd5f2"
    box(0.5, 8.6, 4.4, 0.9, "waveform → WavLM (JAX)\n[B, L_a, 768]", a)
    box(6.1, 8.6, 4.4, 0.9, "tokens → BERT (JAX)\n[B, L_t, 768]", t)
    box(0.5, 7.1, 4.4, 0.9, "intra-modal self-attention (audio)", a)
    box(6.1, 7.1, 4.4, 0.9, "intra-modal self-attention (text)", t)
    box(0.5, 5.6, 4.4, 0.9, "cross-attention: audio queries text\n→ alignment map [B, L_a, L_t]", a)
    box(6.1, 5.6, 4.4, 0.9, "cross-attention: text queries audio", t)
    ax.text(5.5, 7.0, "× N fusion layers", ha="center", fontsize=8, style="italic")
    box(3.0, 4.0, 5.0, 0.9,
        "vector β-gate:  w = σ(MLP[a, t, |a−t|, a⊙t]) ∈ [0,1]^d\n"
        "h = w ⊙ h_a + (1−w) ⊙ h_t   (β = mean w)", f)
    box(3.0, 2.5, 5.0, 0.9,
        "emotion-query decoder (E learnable queries)\n"
        "cross-attn → attribution map [B, E, L]", d)
    box(3.8, 1.0, 3.4, 0.8, "per-emotion logits [B, E]", "#f7d4cc")

    arrow(2.7, 8.6, 2.7, 8.0)
    arrow(8.3, 8.6, 8.3, 8.0)
    arrow(2.7, 7.1, 2.7, 6.5)
    arrow(8.3, 7.1, 8.3, 6.5)
    arrow(4.9, 7.55, 6.1, 6.3)  # audio self → text-queries-audio kv
    arrow(6.1, 7.55, 4.9, 6.3)  # text self → audio-queries-text kv
    arrow(2.7, 5.6, 4.2, 4.9)
    arrow(8.3, 5.6, 6.8, 4.9)
    arrow(5.5, 4.0, 5.5, 3.4)
    arrow(5.5, 2.5, 5.5, 1.8)

    ax.set_title("β-gated cross-modal fusion with emotion-query decoder (hriemo)",
                 fontsize=11)
    fig.tight_layout()
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=150)
    print(f"[Saved] {out}")
    return out


if __name__ == "__main__":
    main()
