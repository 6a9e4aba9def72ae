#!/usr/bin/env python
"""Measure the early-exit greedy decode (backend="xla_early") envelope.

The early-exit backend (models/fast_decode.py:_greedy_early_exit) wraps the
per-row decode step in a ``lax.while_loop`` that stops once EVERY row in the
batch has emitted EOS. The reference always runs all 12 steps (reference
sa_m4c.py:285-302). With random bench params EOS never argmaxes, so a plain
bench run only shows the worst case; this tool brackets the envelope per
batch size:

  * ``xla``        — the fixed-step unrolled production path (baseline)
  * ``early/full`` — xla_early with random params: all 12 steps run; the
                     delta vs ``xla`` is the while_loop's dynamic-trip-count
                     + rolled-body cost (the price of admission)
  * ``early/exit1``— xla_early with classifier_bias[EOS] += 1e4: every row
                     emits EOS at step 0, the loop runs ONCE; the delta vs
                     ``xla`` is the best-case win (encoder + 1 step)

time(k) for an exit at step k interpolates linearly between the two early
rows (setup + k * per_step). Because the exit is batch-global (max row
length), the win concentrates at SERVING batch sizes: a batch-96 offline
eval almost always contains one long answer, a batch-1/8 online request
usually finishes in 2-4 steps (TextVQA answers average ~1.6 words).

Usage:  python tools/bench_early_exit.py            # real TPU
        BENCH_EE_BATCHES=1,8,96 BENCH_EE_STEPS=30 python tools/bench_early_exit.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = tuple(
    int(b) for b in os.environ.get("BENCH_EE_BATCHES", "1,8,96").split(",")
)
STEPS = int(os.environ.get("BENCH_EE_STEPS", "30"))
WARMUP = 3
BOS, EOS = 1, 2


def main():
    import jax
    import jax.numpy as jnp

    from sam_textvqa_tpu.config import load_task_config
    from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
    from sam_textvqa_tpu.models.fast_decode import greedy_decode_fast
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams

    cfg = load_task_config(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs/train-tvqa-eval-tvqa-c3.yml")
    )
    num_answers = 5000
    model = SAM4C(
        params_cfg=SAM4CParams(cfg.mmt, cfg.text_bert, num_answers),
        dtype=jnp.bfloat16,
    )

    for batch_size in BATCHES:
        batch = {
            k: jnp.asarray(v)
            for k, v in device_batch(
                make_batch(cfg, batch_size, num_answers_vocab=num_answers)
            ).items()
        }
        params = jax.jit(
            lambda b=batch: model.init(
                {"params": jax.random.PRNGKey(0)}, b, deterministic=True
            )["params"]
        )()
        biased = dict(params)
        biased["classifier_bias"] = params["classifier_bias"].at[EOS].add(1e4)

        variants = {
            "xla": (params, "xla"),
            "early/full12": (params, "xla_early"),
            "early/exit1": (biased, "xla_early"),
        }
        row = {"batch": batch_size, "decode_steps": cfg.mmt.num_decoding_steps}
        for name, (p, backend) in variants.items():
            @jax.jit
            def chained(p_, b, carry, backend=backend):
                b = dict(b)
                b["question_indices"] = b["question_indices"] + jnp.int32(
                    jnp.sum(carry) * 0
                )
                _, pred = greedy_decode_fast(
                    model, p_, b, BOS, backend=backend, eos_idx=EOS
                )
                return pred

            carry = jnp.zeros(
                (batch_size, cfg.mmt.num_decoding_steps), jnp.int32
            )
            for _ in range(WARMUP):
                carry = chained(p, batch, carry)
            int(jnp.sum(carry))
            t0 = time.time()
            for _ in range(STEPS):
                carry = chained(p, batch, carry)
            int(jnp.sum(carry))
            dt = time.time() - t0
            row[name] = {
                "ms_per_batch": round(1000.0 * dt / STEPS, 3),
                "samples_per_sec": round(batch_size * STEPS / dt, 1),
            }
        full = row["early/full12"]["ms_per_batch"]
        one = row["early/exit1"]["ms_per_batch"]
        # per-decode-step cost of the while_loop body (linear model)
        row["early_ms_per_step"] = round(
            (full - one) / (cfg.mmt.num_decoding_steps - 1), 3
        )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
