#!/usr/bin/env python3
"""Scheduled curriculum masking — warmup → ramp, one compilation.

The reference documents mask-prob scheduling as a subclass that mutates
``base_mask_prob`` per step on the Python side (reference README.md:341-351,
``CustomCurriculumMasking``).  Under jit that pattern would either bake the
prob into the trace or recompile per value; the TPU-native equivalent is the
``schedule=`` hook: a ``step -> prob`` callable evaluated on a *traced* step
scalar inside the compiled train step.

This example trains a fusion pool for 3 "epochs" with masking held near zero
(warmup), then ramps ``base_mask_prob`` linearly to 0.5 — the curriculum
activation of the X-ray experiment, expressed as a schedule instead of a
toggle — and asserts the whole run used ONE compilation of the train step.

Run:  python examples/mask_prob_schedule.py [--steps-per-epoch 20]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--steps-per-epoch", type=int, default=20)
    ap.add_argument("--warmup-epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import optax

    from aecf_tpu import CurriculumMasking, MultimodalAttentionPool
    from aecf_tpu.core.init import init_fusion_query

    E, M = 64, 3
    warmup_steps = args.warmup_epochs * args.steps_per_epoch
    total_steps = args.epochs * args.steps_per_epoch

    # Warmup at ~0, then linear ramp to 0.5 over the remaining epochs —
    # any optax schedule (or plain lambda) drops in here.
    schedule = optax.join_schedules(
        [
            optax.constant_schedule(1e-3),
            optax.linear_schedule(
                init_value=1e-3,
                end_value=0.5,
                transition_steps=total_steps - warmup_steps,
            ),
        ],
        boundaries=[warmup_steps],
    )

    pool = MultimodalAttentionPool(
        E,
        curriculum_masking=CurriculumMasking(schedule=schedule),
        key=jax.random.key(0),
    ).train()
    query = init_fusion_query(jax.random.key(1), E)

    kv = jax.random.normal(jax.random.key(2), (args.batch, M, E))
    target = jax.random.normal(jax.random.key(3), (args.batch, 1, E))
    opt = optax.adamw(1e-3)

    def loss_fn(params, rng, step):
        q = jnp.broadcast_to(query, (args.batch, 1, E))
        out, info = pool(
            q, kv, return_info=True, rng=rng, params=params, step=step
        )
        return jnp.mean((out - target) ** 2), info

    @jax.jit
    def train_step(params, opt_state, rng, step):
        (loss, info), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, rng, step
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        return (
            optax.apply_updates(params, updates),
            opt_state,
            loss,
            info["mask_rate"].mean(),
            info["entropy"].mean(),
        )

    params, opt_state = pool.params, opt.init(pool.params)
    step = 0
    for epoch in range(args.epochs):
        rates, ents = [], []
        for _ in range(args.steps_per_epoch):
            params, opt_state, loss, rate, ent = train_step(
                params, opt_state, jax.random.key(step), jnp.asarray(step)
            )
            rates.append(float(rate))
            ents.append(float(ent))
            step += 1
        phase = "warmup" if epoch < args.warmup_epochs else "curriculum"
        print(
            f"epoch {epoch} [{phase:>10}]  loss {float(loss):.4f}  "
            f"mask_rate {sum(rates)/len(rates):.3f}  "
            f"entropy {sum(ents)/len(ents):.3f}  "
            f"mask_prob {float(schedule(step - 1)):.3f}"
        )

    n_compiles = train_step._cache_size()
    assert n_compiles == 1, f"schedule retriggered compilation: {n_compiles}"
    print(f"ok: {total_steps} steps across the full schedule, "
          f"{n_compiles} compilation")


if __name__ == "__main__":
    main()
