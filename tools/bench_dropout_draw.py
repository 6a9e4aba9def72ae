#!/usr/bin/env python
"""Microbenchmark: dropout-bit generation strategies for the 6 MMT layers'
attention-probs dropout — the dominant RNG cost in the train step
(SCALING.md: no-drop ceiling 1832 vs 1442 samples/s at batch 96).

Candidates (all iid Bernoulli keep masks over (B, H, L, L) per layer):
  sep6      six separate bernoulli draws (the production path today)
  fused1    ONE draw of shape (6, B, H, L, L), sliced per layer
            (VERDICT round-2 item 2's untried idea)
  fusedflat ONE flat draw reshaped -- tests whether the reshape relayout
            eats the win
  bits6     six separate uint32 draws compared against a threshold
            (skips bernoulli's bits->uniform float conversion)
  bits1     one fused uint32 draw + threshold

Each candidate multiplies a dummy probs tensor by its keep masks so XLA
cannot elide the generation; timing is steady-state over jitted calls.

VERDICT (v5e, measured): fused1 wins this microbenchmark 26x (1.0 ms vs
26.8 ms for sep6) — but wired into the real train step
(MMTConfig.dropout_fused_draw, BENCH_FUSED_DRAW=1) it is 26% SLOWER
end-to-end (1069 vs 1437 samples/s): the isolated sep6 number charges the
draws for HBM round-trips they never pay in context, where XLA fuses each
per-site threefry bit-gen into the consuming elementwise op. The fused
page instead forces ~390 MB/step of bool masks to materialize in HBM, be
re-read per layer, and be saved as bwd residuals. Kept as an opt-in A/B.
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_threefry_partitionable", False)

B, H, L, LAYERS = 96, 12, 182, 6
P_KEEP = 0.9
SHAPE = (B, H, L, L)
STEPS, WARMUP = 20, 3


def sep6(rng, probs):
    out = probs
    for i in range(LAYERS):
        keep = jax.random.bernoulli(jax.random.fold_in(rng, i), P_KEEP, SHAPE)
        out = out * keep.astype(probs.dtype)
    return out


def fused1(rng, probs):
    keep = jax.random.bernoulli(rng, P_KEEP, (LAYERS,) + SHAPE)
    out = probs
    for i in range(LAYERS):
        out = out * keep[i].astype(probs.dtype)
    return out


def fusedflat(rng, probs):
    n = LAYERS * B * H * L * L
    keep = jax.random.bernoulli(rng, P_KEEP, (n,)).reshape((LAYERS,) + SHAPE)
    out = probs
    for i in range(LAYERS):
        out = out * keep[i].astype(probs.dtype)
    return out


THRESH = jnp.uint32(int(P_KEEP * (1 << 32)))


def bits6(rng, probs):
    out = probs
    for i in range(LAYERS):
        bits = jax.random.bits(jax.random.fold_in(rng, i), SHAPE, jnp.uint32)
        out = out * (bits < THRESH).astype(probs.dtype)
    return out


def bits1(rng, probs):
    bits = jax.random.bits(rng, (LAYERS,) + SHAPE, jnp.uint32)
    out = probs
    for i in range(LAYERS):
        out = out * (bits[i] < THRESH).astype(probs.dtype)
    return out


def main():
    probs = jnp.ones(SHAPE, jnp.bfloat16)
    for name, fn in [("sep6", sep6), ("fused1", fused1),
                     ("fusedflat", fusedflat), ("bits6", bits6),
                     ("bits1", bits1)]:
        f = jax.jit(lambda r, p, fn=fn: jnp.sum(fn(r, p)))
        rng = jax.random.PRNGKey(0)
        for _ in range(WARMUP):
            f(rng, probs).block_until_ready()
        t0 = time.time()
        for i in range(STEPS):
            f(jax.random.fold_in(rng, i), probs).block_until_ready()
        dt = (time.time() - t0) / STEPS
        print(f"{name:10s} {dt * 1e3:7.2f} ms/step")


if __name__ == "__main__":
    main()
