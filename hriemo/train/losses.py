"""Loss functions and regularizers (reference-semantics, pure JAX).

Note the two β regularizers pull in **opposite** directions and both are
part of the behavioral contract:
  * IEMOCAP decoder trainer *rewards* β≈0.5 (anti-degeneracy):
    ``loss − 0.01·mean(β(1−β))``
    (reference: scripts/fusion/train_fusion_seq_level_decoder.py:324-326);
  * MOSEI trainer *penalises* indecision via gate entropy:
    ``loss + λ·mean(H(β))``
    (reference: scripts/fusion/train_mosei_fusion_seq_level_decoder.py:341-348).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pos_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean BCE-with-logits, matching ``nn.BCEWithLogitsLoss(pos_weight=…)``.

    Stable formulation: ``max(x,0) − x·y + log(1+exp(−|x|))`` with the
    positive term scaled by pos_weight when given.
    """
    x, y = logits, targets
    log_sig = jax.nn.log_sigmoid(x)        # log σ(x)
    log_sig_neg = jax.nn.log_sigmoid(-x)   # log (1−σ(x))
    if pos_weight is not None:
        loss = -(pos_weight * y * log_sig + (1.0 - y) * log_sig_neg)
    else:
        loss = -(y * log_sig + (1.0 - y) * log_sig_neg)
    return jnp.mean(loss)


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over integer labels, matching ``nn.CrossEntropyLoss``."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def beta_entropy_loss(beta: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Binary entropy of the gate — *added* to encourage decisive gates (MOSEI)."""
    b = jnp.clip(beta, eps, 1.0 - eps)
    ent = -(b * jnp.log(b) + (1.0 - b) * jnp.log(1.0 - b))
    return jnp.mean(ent)


def beta_degeneracy_reward(beta: jnp.ndarray) -> jnp.ndarray:
    """``mean(β(1−β))`` — *subtracted* (×0.01) to keep β away from 0/1 (IEMOCAP)."""
    return jnp.mean(beta * (1.0 - beta))


def normalize_mosei_emotions(y: jnp.ndarray) -> jnp.ndarray:
    """clamp(y, 0, 3) / 3 → soft targets in [0,1]
    (reference: train_mosei_fusion_seq_level_decoder.py:354-361)."""
    return jnp.clip(y, 0.0, 3.0) / 3.0
