"""Pallas TPU kernel: fused spatially-masked multi-head attention.

The jnp reference path (models/spatial.py) materializes a combined boolean
mask of shape (B, H, L, L) in HBM and streams it through the softmax. This
kernel instead rebuilds the additive bias ON THE FLY inside VMEM from:

  * the int8 relation-class matrix (B, N, N)      — 150x150 bytes/sample
  * the (H, 13) relation->head LUT                 — constant
  * the joint column mask (B, L)                   — padding/prefix-LM
  * static layout facts (q_len, dec_len, quadrant masking, causal block)

cutting the attention's HBM traffic for masks by ~H*L*L/ (N*N) ≈ 17x and
removing the mask-materialization pass entirely.

Numerics match the jnp reference exactly at fp32: the bias is the same
0/-10000 additive convention (partially-masked keys keep their tiny
exp(-10000) contributions, reference sam/sa_m4c.py:551-584), fully-masked
rows are zeroed like ``entity_probs_mask``.

Deterministic (eval/decode) forward only. A fused fwd+bwd training variant
with in-kernel dropout existed through round 1 but was measured 5% SLOWER
than the XLA path on a real v5e (1074 vs 1128 samples/s, bf16 batch 64, c3)
— XLA already fuses the mask+softmax chain well — so it was deleted;
training always uses the XLA path (models/mmt.py gates on ``deterministic``).

Layout: grid over (batch, head); one program handles a full (L_pad, L_pad)
attention for one (b, h) — L=182 pads to 256, comfortably inside VMEM
(~1 MB/program).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_BIAS = -10000.0
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _combined_mask(
    classes_ref, lut_ref, colmask_ref, h, l_pad,
    *, q_len, n_ctx, length, mask_q1, mask_q2, mask_q4, mask_q7, mask_q8,
    mask_q9, spatial_head,
):
    """Rebuild the combined attention permission in VMEM as a 0/1 float32
    (Mosaic rejects vector bool selects, so the mask algebra stays in f32:
    AND = *, OR via max, NOT = 1-x)."""
    one = jnp.ones((l_pad, l_pad), dtype=jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (l_pad, l_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (l_pad, l_pad), 1)

    def f(pred):  # i1 predicate -> 0/1 f32
        return jnp.where(pred, one, 0.0)

    # base prefix-LM mask: everything may attend to unpadded encoder cols;
    # dec x dec block is causal
    base_ok = jnp.broadcast_to(colmask_ref[0, :][None, :], (l_pad, l_pad))
    dec0 = q_len + n_ctx
    in_dec_block = (rows >= dec0) & (rows < length) & (cols >= dec0) & (
        cols < length
    )
    causal_ok = f(cols - dec0 <= rows - dec0)
    base_ok = jnp.where(in_dec_block, causal_ok, base_ok)

    if spatial_head:
        # spatial permission for this head: LUT over the class matrix,
        # expressed as a max of 12 compares (no gather needed on TPU)
        cls = classes_ref[:, :]
        q0, q1 = q_len, q_len + n_ctx
        in_ctx = (rows >= q0) & (rows < q1) & (cols >= q0) & (cols < q1)
        cshift = jnp.where(in_ctx, cls, 0)
        ctx_allowed = jnp.zeros((l_pad, l_pad), dtype=jnp.float32)
        for c in range(1, 13):
            ctx_allowed = jnp.maximum(
                ctx_allowed, f(cshift == c) * lut_ref[h, c]
            )
        allowed = jnp.where(in_ctx, ctx_allowed, one)

        # quadrant masking for spatial heads (reference sa_m4c.py:504-549)
        if mask_q1:
            allowed = allowed * (1.0 - f((rows < q0) & (cols < q0)))
        if mask_q2:
            allowed = allowed * (
                1.0 - f((rows < q0) & (cols >= q0) & (cols < q1))
            )
        if mask_q4:
            allowed = allowed * (
                1.0 - f((rows >= q0) & (rows < q1) & (cols < q0))
            )
        if mask_q7:
            allowed = allowed * (1.0 - f((rows >= q1) & (cols < q0)))
        if mask_q8:
            allowed = allowed * (
                1.0 - f((rows >= q1) & (cols >= q0) & (cols < q1))
            )
        if mask_q9:
            allowed = allowed * (1.0 - f((rows >= q1) & (cols >= q1)))
        combined_ok = base_ok * allowed
    else:
        combined_ok = base_ok

    in_range = f((rows < length) & (cols < length))
    return combined_ok * in_range


def _softmax_probs(scores, combined_ok):
    """Biased fp32 softmax + fully-masked-row zeroing (reference :551-584).
    ``combined_ok`` is a 0/1 float32 mask."""
    scores = scores + jnp.where(combined_ok > 0, 0.0, MASK_BIAS)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    row_alive = jnp.max(combined_ok, axis=-1, keepdims=True)
    return probs * row_alive


def _attention_kernel(
    q_ref,        # (L_pad, D) f32
    k_ref,        # (L_pad, D)
    v_ref,        # (L_pad, D)
    classes_ref,  # (L_pad, L_pad) int32 frame (0 = no relation)
    lut_ref,      # (H, 16) f32 — relation->head LUT row per head
    colmask_ref,  # (1, L_pad) f32 — 1 on attendable encoder cols
    out_ref,      # (L_pad, D)
    *,
    q_len: int,
    n_ctx: int,
    dec_len: int,
    length: int,
    scale: float,
    mask_q1: bool,
    mask_q2: bool,
    mask_q4: bool,
    mask_q7: bool,
    mask_q8: bool,
    mask_q9: bool,
    spatial_head: bool,
):
    l_pad = q_ref.shape[0]
    h = pl.program_id(1)

    scores = jax.lax.dot_general(
        q_ref[:], k_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    combined_ok = _combined_mask(
        classes_ref, lut_ref, colmask_ref, h, l_pad,
        q_len=q_len, n_ctx=n_ctx, length=length,
        mask_q1=mask_q1, mask_q2=mask_q2, mask_q4=mask_q4,
        mask_q7=mask_q7, mask_q8=mask_q8, mask_q9=mask_q9,
        spatial_head=spatial_head,
    )
    probs = _softmax_probs(scores, combined_ok)

    out_ref[:] = jax.lax.dot_general(
        probs, v_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _classes_block_spec(n_pad):
    return pl.BlockSpec(
        (None, n_pad, n_pad), lambda b, h: (b, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _prepare_inputs(q, k, v, classes, lut, col_mask, q_len, n_ctx, length):
    b, h, _, d = q.shape
    l_pad = _round_up(length, LANE)
    d_pad = _round_up(d, LANE)
    pad = lambda t: jnp.pad(
        t, ((0, 0), (0, 0), (0, l_pad - length), (0, d_pad - d))
    )
    # classes padded into an (l_pad, l_pad) frame aligned with the joint
    # sequence: block [q_len : q_len+n_ctx) in both dims
    cls_frame = jnp.zeros((b, l_pad, l_pad), dtype=jnp.int32)
    cls_frame = cls_frame.at[
        :, q_len : q_len + n_ctx, q_len : q_len + n_ctx
    ].set(classes.astype(jnp.int32))
    # LUT transposed to (H, 16) so each program reads its own row
    lut_h = jnp.zeros((h, 16), dtype=jnp.float32)
    lut_h = lut_h.at[:, :13].set(jnp.asarray(lut, jnp.float32).T)
    cm = jnp.pad(
        col_mask.astype(jnp.float32), ((0, 0), (0, l_pad - length))
    )[:, None, :]
    return pad(q), pad(k), pad(v), cls_frame, lut_h, cm, l_pad, d_pad


def _qkv_spec(l_pad, d_pad):
    return pl.BlockSpec(
        (None, None, l_pad, d_pad), lambda bi, hi: (bi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _in_specs(l_pad, d_pad):
    return [
        _qkv_spec(l_pad, d_pad),
        _qkv_spec(l_pad, d_pad),
        _qkv_spec(l_pad, d_pad),
        pl.BlockSpec((None, l_pad, l_pad), lambda bi, hi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((None, 1, l_pad), lambda bi, hi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _kernel_statics(d, q_len, n_ctx, dec_len, length, mask_quadrants,
                    spatial):
    quad = set(mask_quadrants)
    return dict(
        q_len=q_len, n_ctx=n_ctx, dec_len=dec_len, length=length,
        scale=1.0 / float(np.sqrt(d)),
        mask_q1=1 in quad, mask_q2=2 in quad, mask_q4=4 in quad,
        mask_q7=7 in quad, mask_q8=8 in quad, mask_q9=9 in quad,
        spatial_head=spatial,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "q_len", "n_ctx", "dec_len", "mask_quadrants", "spatial",
        "interpret",
    ),
)
def spatial_attention_fwd(
    q, k, v, classes, lut, col_mask,
    *, q_len: int, n_ctx: int, dec_len: int,
    mask_quadrants: Tuple[int, ...] = (1, 2),
    spatial: bool = True,
    interpret: bool = False,
):
    """Fused deterministic forward. q/k/v: (B, H, L, D) f32;
    classes: (B, N, N) int; lut: (13, H); col_mask: (B, L).
    Returns (B, H, L, D)."""
    b, h, length, d = q.shape
    assert length == q_len + n_ctx + dec_len
    qp, kp, vp, cls_frame, lut_h, cm, l_pad, d_pad = _prepare_inputs(
        q, k, v, classes, lut, col_mask, q_len, n_ctx, length
    )
    kernel = functools.partial(
        _attention_kernel,
        **_kernel_statics(d, q_len, n_ctx, dec_len, length, mask_quadrants,
                          spatial),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=_in_specs(l_pad, d_pad),
        out_specs=_qkv_spec(l_pad, d_pad),
        out_shape=jax.ShapeDtypeStruct((b, h, l_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, cls_frame, lut_h, cm)
    return out[:, :, :length, :d]
