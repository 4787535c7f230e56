"""Contrastive fine-tuning of the E5 encoder (InfoNCE, in-batch negatives).

New capability over the reference (which treats the embedder as a frozen
download): domain-adapt the encoder on (query, passage) pairs mined from
the course corpus. The training step is fully SPMD over a ("data", "model")
mesh — batch data-parallel, attention-heads/FFN tensor-parallel — with XLA
inserting the collectives from sharding annotations (in-batch negatives
imply an implicit allgather of passage embeddings for the [B, B] logit
matrix; gradients reduce over "data").
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from classmate_rag_tpu.embeddings.model import EncoderConfig, Params, encode


def encoder_param_specs(config: EncoderConfig) -> Params:
    """PartitionSpec pytree for the encoder params on a (data, model) mesh.

    Megatron-style: QKV and FFN-in are column-parallel (output features on
    "model"), attention-out and FFN-out are row-parallel (input features on
    "model"); embeddings and norms replicate.
    """
    col = P(None, None, "model")   # [L, in, out] sharded on out
    row = P(None, "model", None)   # [L, in, out] sharded on in
    vec_col = P(None, "model")     # [L, features]
    rep2 = P(None, None)
    rep1 = P(None)
    return {
        "word_emb": rep2,
        "pos_emb": rep2,
        "type_emb": rep2,
        "emb_ln_g": rep1,
        "emb_ln_b": rep1,
        "layers": {
            "q_w": col, "q_b": vec_col,
            "k_w": col, "k_b": vec_col,
            "v_w": col, "v_b": vec_col,
            "o_w": row, "o_b": P(None, None),
            "attn_ln_g": P(None, None), "attn_ln_b": P(None, None),
            "ff_in_w": col, "ff_in_b": vec_col,
            "ff_out_w": row, "ff_out_b": P(None, None),
            "ff_ln_g": P(None, None), "ff_ln_b": P(None, None),
        },
    }


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jnp.ndarray


def make_train_step(
    config: EncoderConfig,
    mesh: Mesh,
    learning_rate: float = 2e-5,
    temperature: float = 0.05,
    weight_decay: float = 1e-4,
    max_grad_norm: float = 1.0,
    warmup_steps: int = 0,
    total_steps: int = 0,
    accum_steps: int = 1,
):
    """Returns (init_state_fn, jitted train_step) for the given mesh.

    train_step(state, q_ids, q_mask, p_ids, p_mask) → (state, loss).
    Batch arrays shard on "data"; params per ``encoder_param_specs``.

    Optimizer: AdamW behind global-norm gradient clipping; with
    ``total_steps`` the learning rate follows linear-warmup + cosine
    decay (``warmup_steps`` alone gives linear warmup to a constant);
    ``accum_steps`` > 1 accumulates gradients over that many micro-steps
    before applying one update (optax.MultiSteps).
    """
    if total_steps:
        # optax requires decay_steps > warmup_steps; short runs (smoke
        # tests, tiny corpora) may ask for fewer total steps than warmup.
        warmup_eff = min(max(warmup_steps, 1), max(total_steps - 1, 1))
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=learning_rate,
            warmup_steps=warmup_eff,
            decay_steps=max(total_steps, warmup_eff + 1),
        )
    elif warmup_steps:
        schedule = optax.linear_schedule(
            init_value=0.0, end_value=learning_rate,
            transition_steps=warmup_steps,
        )
    else:
        schedule = learning_rate
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, weight_decay=weight_decay),
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    p_specs = encoder_param_specs(config)

    def shard_params(params: Params) -> Params:
        return jax.tree.map(
            lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)),
            params, p_specs,
        )

    replicated = NamedSharding(mesh, P())

    def init_state(params: Params) -> TrainState:
        params = shard_params(params)
        opt_state = tx.init(params)
        # mu/nu inherit the param shardings via zeros_like; scalar leaves
        # (adam count, step) must be explicitly replicated over the mesh or
        # later jit calls see mixed committed placements.
        opt_state = jax.tree.map(
            lambda x: jax.device_put(x, replicated) if x.ndim == 0 else x,
            opt_state,
        )
        step0 = jax.device_put(jnp.zeros((), jnp.int32), replicated)
        return TrainState(params, opt_state, step0)

    def loss_fn(params, q_ids, q_mask, p_ids, p_mask):
        q = encode(params, q_ids, q_mask, config)          # [B, D], L2'd
        p = encode(params, p_ids, p_mask, config)
        logits = (q @ p.T) / temperature                   # [B, B]
        labels = jnp.arange(q.shape[0])
        loss_qp = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        loss_pq = optax.softmax_cross_entropy_with_integer_labels(
            logits.T, labels
        ).mean()
        return 0.5 * (loss_qp + loss_pq)

    batch_sharding = NamedSharding(mesh, P("data", None))
    param_shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), p_specs)

    @functools.partial(
        jax.jit,
        in_shardings=(
            TrainState(param_shardings, None, None),
            batch_sharding, batch_sharding, batch_sharding, batch_sharding,
        ),
        out_shardings=(TrainState(param_shardings, None, None), None),
        donate_argnums=(0,),
    )
    def train_step(state: TrainState, q_ids, q_mask, p_ids, p_mask):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, q_ids, q_mask, p_ids, p_mask
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return init_state, train_step


def make_eval_step(
    config: EncoderConfig,
    mesh: Mesh,
    temperature: float = 0.05,
):
    """Jitted eval_step(params, q_ids, q_mask, p_ids, p_mask) →
    (loss, in_batch_accuracy): the InfoNCE objective plus the fraction of
    queries whose own passage wins the in-batch ranking — the cheap
    retrieval-quality proxy to watch during fine-tuning."""
    p_specs = encoder_param_specs(config)
    batch_sharding = NamedSharding(mesh, P("data", None))
    param_shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), p_specs)

    @functools.partial(
        jax.jit,
        in_shardings=(
            param_shardings,
            batch_sharding, batch_sharding, batch_sharding, batch_sharding,
        ),
    )
    def eval_step(params, q_ids, q_mask, p_ids, p_mask):
        q = encode(params, q_ids, q_mask, config)
        p = encode(params, p_ids, p_mask, config)
        logits = (q @ p.T) / temperature
        labels = jnp.arange(q.shape[0])
        loss_qp = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        loss_pq = optax.softmax_cross_entropy_with_integer_labels(
            logits.T, labels
        ).mean()
        acc = jnp.mean(jnp.argmax(logits, axis=1) == labels)
        return 0.5 * (loss_qp + loss_pq), acc

    return eval_step
