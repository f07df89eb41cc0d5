"""LR schedules + optimizer factory (parity: masr/optimizer/scheduler.py and
trainer.py:215-241). Schedules are pure step→lr functions (optax style),
replacing the reference's stateful torch LRScheduler classes; `set_step`
semantics come free since the step is an argument.
"""

import jax.numpy as jnp
import optax


def warmup_lr(learning_rate, warmup_steps=25000, min_lr=1e-5):
    """lr * warmup^0.5 * min(step^-0.5, step*warmup^-1.5); floor min_lr only
    after warmup (scheduler.py:46-62). Step is 1-indexed."""

    def schedule(step):
        step_num = jnp.maximum(step + 1, 1).astype(jnp.float32)
        if warmup_steps == 0:
            lr = learning_rate * step_num ** -0.5
            return jnp.maximum(lr, min_lr)
        lr = learning_rate * warmup_steps ** 0.5 * jnp.minimum(
            step_num ** -0.5, step_num * warmup_steps ** -1.5)
        return jnp.where((lr < min_lr) & (step_num > warmup_steps),
                         min_lr, lr)

    return schedule


def noam_hold_annealing(learning_rate, max_steps=175680, warmup_steps=None,
                        warmup_ratio=0.2, hold_steps=None, hold_ratio=0.3,
                        decay_rate=1.0, min_lr=1e-5):
    """Linear warmup → hold at peak → polynomial decay (Squeezeformer
    schedule, scheduler.py:68-191)."""
    if warmup_steps is None:
        warmup_steps = int((warmup_ratio or 0.0) * max_steps)
    if hold_steps is None:
        hold_steps = int((hold_ratio or 0.0) * max_steps)
    hold_end = hold_steps + warmup_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = learning_rate * (step + 1) / (warmup_steps + 1)
        t_warm = max(1.0, warmup_steps ** decay_rate)
        t_hold = jnp.maximum(1.0, jnp.maximum(step - hold_steps, 1.0)
                             ** decay_rate)
        decay = jnp.maximum(learning_rate * t_warm / t_hold, min_lr)
        lr = jnp.where(step <= warmup_steps, warm,
                       jnp.where(step < hold_end, learning_rate, decay))
        return jnp.where(step > max_steps, min_lr, lr)

    return schedule


def cosine_with_warmup(learning_rate, T_max, eta_min=0.0, warmup_steps=None,
                       warmup_ratio=0.2):
    """Linear warmup → cosine annealing (scheduler.py:194-249)."""
    if warmup_steps is None:
        warmup_steps = int((warmup_ratio or 0.0) * T_max)
    T = max(T_max - warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = learning_rate * (step + 1) / (warmup_steps + 1)
        s = jnp.maximum(step - warmup_steps, 0.0)
        cos = eta_min + (learning_rate - eta_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * jnp.minimum(s / T, 1.0)))
        return jnp.where(step <= warmup_steps, warm, cos)

    return schedule


def build_lr_schedule(scheduler: str, learning_rate: float, scheduler_conf):
    scheduler_conf = dict(scheduler_conf or {})
    if scheduler == "WarmupLR":
        return warmup_lr(learning_rate, **scheduler_conf)
    if scheduler == "NoamHoldAnnealing":
        return noam_hold_annealing(learning_rate, **scheduler_conf)
    if scheduler == "CosineWithWarmup":
        return cosine_with_warmup(learning_rate, **scheduler_conf)
    raise ValueError(f"unsupported scheduler: {scheduler}")


def build_optimizer(optimizer_conf, grad_clip=5.0, accum_grad=1):
    """Adam/AdamW/SGD + grad clip + schedule, with gradient accumulation via
    optax.MultiSteps (replicating trainer.py accum_grad + no_sync semantics
    — grads average across micro-steps, one optimizer step per boundary)."""
    conf = dict(optimizer_conf)
    name = conf.get("optimizer", "Adam")
    lr = float(conf.get("learning_rate", 1e-3))
    wd = float(conf.get("weight_decay", 0.0))
    schedule = build_lr_schedule(conf.get("scheduler", "WarmupLR"), lr,
                                 conf.get("scheduler_conf"))
    if name in ("Adam", "AdamW") and conf.get("fused", False):
        # single-pass fused update (optimizer/fused.py): same numbers as
        # the optax chain below with fewer materialized intermediates.
        # Measured NEUTRAL on v5e inside the jitted train step, twice:
        # 23.3 vs 22.9 ms/step at B=16, and 34.77 vs 34.72 at B=32 with
        # frozen-grad probes 3.33 vs 3.64 ms (docs/train_roofline.md) —
        # XLA already fuses the chain; the optimizer's ~3.3 ms is
        # moment/param HBM traffic, which both forms pay. Kept opt-in
        # for the activation-memory headroom.
        from masr_tpu.optimizer.fused import fused_adam
        tx = fused_adam(schedule, weight_decay=wd,
                        decoupled=(name == "AdamW"),
                        grad_clip=grad_clip if grad_clip else None)
        if accum_grad and accum_grad > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum_grad)
        return tx, schedule
    if name == "Adam":
        # torch Adam's weight_decay is L2 added to the gradient pre-moments
        base = optax.chain(optax.add_decayed_weights(wd),
                           optax.adam(schedule)) if wd else \
            optax.adam(schedule)
    elif name == "AdamW":
        base = optax.adamw(schedule, weight_decay=wd)
    elif name == "SGD":
        base = optax.sgd(schedule, momentum=conf.get("momentum", 0.9))
    else:
        raise ValueError(f"unsupported optimizer: {name}")
    tx = optax.chain(optax.clip_by_global_norm(grad_clip), base) \
        if grad_clip else base
    if accum_grad and accum_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_grad)
    return tx, schedule
