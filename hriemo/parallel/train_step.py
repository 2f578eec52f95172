"""pjit-sharded train / eval steps.

One compiled function covers all four reference training pipelines
(SURVEY.md §2.3): the behavioral knobs (loss type, β regularizers, label
normalisation, pos_weight, grad accumulation, clipping, schedule) are all
config, so every pipeline is a thin CLI over this step.

TPU-native design points:
  * the whole update — forward, backward, accumulation, clip, AdamW — is
    one XLA program; gradient all-reduce over the mesh ``data`` axis is
    inserted by the partitioner (no NCCL-style calls to port);
  * grad accumulation is a ``lax.scan`` over a leading microbatch axis
    (static shapes, single compilation) — replaces the reference's
    scaler/accum Python loop (train_mosei_...py:396-402);
  * bf16 compute with fp32 master params replaces AMP+GradScaler (bf16
    needs no loss scaling on TPU);
  * non-finite batches are skipped inside the graph (optax.apply_if_finite
    — the reference's NaN-skip, train_mosei_...py:390-393);
  * sharding: params/opt-state are laid out at state-creation time
    (TP rules from hriemo.parallel.mesh) and propagate through the jitted
    step via GSPMD; only the batch/rng input shardings are pinned here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..train.losses import (
    bce_with_logits,
    beta_degeneracy_reward,
    beta_entropy_loss,
    normalize_mosei_emotions,
    softmax_cross_entropy,
)
from .mesh import batch_shardings, param_shardings, replicated


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


@dataclasses.dataclass
class TrainConfig:
    # loss
    loss_type: str = "multi_label"  # single_label | multi_label
    pos_weight: Any = None          # [C] or None
    beta_entropy: float = 0.0       # MOSEI: + λ·H(β)
    beta_degeneracy: float = 0.0    # IEMOCAP decoder: − λ·mean(β(1−β))
    normalize_labels: bool = False  # MOSEI clamp(y,0,3)/3
    # optimisation
    lr: float = 1e-4
    weight_decay: float = 1e-2
    grad_clip: float = 5.0
    grad_accum: int = 1
    warmup_steps: int = 0
    total_steps: int = 10_000
    schedule: str = "warmup_cosine"  # warmup_cosine | constant
    # numerics
    compute_dtype: Any = jnp.float32  # jnp.bfloat16 on TPU
    # memory: rematerialise the forward in backward (trades FLOPs for HBM —
    # activations of the L_a x L_t attention stack dominate at long L)
    remat: bool = False


def make_schedule(cfg: TrainConfig):
    if cfg.schedule == "constant":
        return optax.constant_schedule(cfg.lr)
    # linear warmup → cosine to 0, the reference's LambdaLR
    # (train_mosei_...py:578-584)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.lr,
        warmup_steps=max(1, cfg.warmup_steps),
        decay_steps=max(2, cfg.total_steps),
        end_value=0.0,
    )


def make_optimizer(cfg: TrainConfig):
    sched = make_schedule(cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=cfg.weight_decay),
    )
    # skip non-finite updates in-graph (reference's NaN-batch skip)
    return optax.apply_if_finite(tx, max_consecutive_errors=1_000_000), sched


def create_train_state(model, cfg: TrainConfig, rng=None, params=None, mesh=None) -> TrainState:
    if params is None:
        params = model.init(rng if rng is not None else jax.random.key(0))
    tx, _ = make_optimizer(cfg)
    if mesh is not None:
        params = jax.device_put(params, param_shardings(mesh, params))
        # opt-state layout (mu/nu mirror params) is inferred by GSPMD
        opt_state = jax.jit(tx.init)(params)
    else:
        opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state)


def _compute_loss(model, cfg: TrainConfig, params, batch, rng, train: bool):
    h_a, h_t = batch["h_a"], batch["h_t"]
    mask_a, mask_t = batch["mask_a"], batch["mask_t"]
    y = batch["y"]

    dt = cfg.compute_dtype
    if dt != jnp.float32:
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating) else x, t
        )
        params, h_a, h_t = cast(params), cast(h_a), cast(h_t)

    def fwd(params, h_a, h_t, mask_a, mask_t):
        return model.apply(params, h_a, h_t, mask_a, mask_t, train=train, rng=rng)

    if cfg.remat and train:
        fwd = jax.checkpoint(fwd)
    logits, beta, _ = fwd(params, h_a, h_t, mask_a, mask_t)
    logits = logits.astype(jnp.float32)
    beta = beta.astype(jnp.float32)

    if cfg.loss_type == "single_label":
        loss = softmax_cross_entropy(logits, y)
    else:
        targets = y.astype(jnp.float32)
        if cfg.normalize_labels:
            targets = normalize_mosei_emotions(targets)
        pw = None if cfg.pos_weight is None else jnp.asarray(cfg.pos_weight, jnp.float32)
        loss = bce_with_logits(logits, targets, pos_weight=pw)

    if cfg.beta_entropy > 0:
        loss = loss + cfg.beta_entropy * beta_entropy_loss(beta)
    if cfg.beta_degeneracy > 0:
        loss = loss - cfg.beta_degeneracy * beta_degeneracy_reward(beta)

    return loss, (logits, beta)


BATCH_KEYS = ("h_a", "h_t", "mask_a", "mask_t", "y")


def make_train_step(model, cfg: TrainConfig, mesh=None, donate: bool = True):
    """Returns ``step(state, batch, rng) -> (state, metrics)``, jitted.

    ``batch`` leaves have layout ``[grad_accum, micro_batch, ...]`` when
    ``cfg.grad_accum > 1``, else ``[batch, ...]``.
    """
    tx, sched = make_optimizer(cfg)

    def single_grads(params, micro, rng):
        (loss, (_, beta)), grads = jax.value_and_grad(
            lambda p: _compute_loss(model, cfg, p, micro, rng, train=True),
            has_aux=True,
        )(params)
        return loss, grads, beta

    def step_fn(state: TrainState, batch, rng):
        if cfg.grad_accum > 1:
            def scan_body(carry, inp):
                acc_grads, acc_loss, acc_beta = carry
                micro, i = inp
                loss, grads, beta = single_grads(
                    state.params, micro, jax.random.fold_in(rng, i)
                )
                acc = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                return (acc, acc_loss + loss, acc_beta + jnp.mean(beta)), None

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            idx = jnp.arange(cfg.grad_accum)
            (grads, loss_sum, beta_sum), _ = jax.lax.scan(
                scan_body, (zeros, 0.0, 0.0), (batch, idx)
            )
            inv = 1.0 / cfg.grad_accum
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            loss = loss_sum * inv
            mean_beta = beta_sum * inv
        else:
            loss, grads, beta = single_grads(state.params, batch, rng)
            mean_beta = jnp.mean(beta)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, new_params, new_opt)
        # the schedule is driven by the INNER optimizer count, which does
        # not advance on NaN-skipped batches — report the lr actually
        # applied, not sched(step) (review finding)
        notfinite = getattr(state.opt_state, "total_notfinite", None)
        lr_pos = state.step if notfinite is None else state.step - notfinite
        metrics = {
            "loss": loss,
            "mean_beta": mean_beta,
            "grad_norm": optax.global_norm(grads),
            "lr": sched(lr_pos),
        }
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    return jax.jit(
        step_fn,
        in_shardings=(None, batch_shardings(mesh, BATCH_KEYS, cfg.grad_accum), replicated(mesh)),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, cfg: TrainConfig, mesh=None):
    """Returns ``eval(params, batch) -> (loss, logits, beta)``, jitted."""

    def eval_fn(params, batch):
        loss, (logits, beta) = _compute_loss(
            model, cfg, params, batch, rng=None, train=False
        )
        return loss, logits, beta

    if mesh is None:
        return jax.jit(eval_fn)
    return jax.jit(eval_fn, in_shardings=(None, batch_shardings(mesh, BATCH_KEYS)))
