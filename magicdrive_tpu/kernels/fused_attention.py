"""Fused QKV-projection + flash-attention kernel.

Motivation (PERFORMANCE.md round 2): with lane-padded projection weights
the attention cores run at the aligned-depth speed, but the padded q/k/v
projections cost ~3.2x their logical FLOPs and a full HBM round trip of
the padded (…, H, 128) tensors per core. This kernel moves the three
projections INSIDE the attention kernel: per (batch, q-block, head) grid
step it computes

    q = x_q_block @ Wq_h          (VMEM, fp32 accum, cast to bf16)
    k = x_kv      @ Wk_h
    v = x_kv      @ Wv_h
    o = softmax(q k^T * scale) v  ->  (…, Lq, H*Dp) lane-blocked output

so q/k/v never exist in HBM at all, the lane-padding cost is VMEM-only,
no transposes are needed (the output is written head-lane-blocked,
directly consumable by the padded ``to_out``), and no kv-length masking
is needed (k has exactly Lk rows in VMEM).

k/v are recomputed per q-block (2*Lk*C*Dp MACs per step — ~0.45 ms/core
at the flagship nq=2); ``fused_is_efficient`` routes shapes where the
recompute would outweigh the HBM savings back to the projected path.

Scope: no qkv bias (SD-1.5's UNet attentions have none — the biased VAE
attention stays on the XLA path), no attention bias/mask.

Backward (custom_vjp): recompute q/k/v with plain XLA matmuls, run the
existing flash fwd(+lse)/bwd pair for the core, then standard matmul
grads for the projection weights. Training remats transformer blocks
anyway, so the recompute mirrors what the XLA path already does.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .flash_attention import (_ceil_to, _flash_bwd, _flash_fwd,
                              _interpret_default, _pick_block, _VMEM_BUDGET)


def _core_with_q(q, xkv_ref, wk_ref, wv_ref):
    """Softmax attention of a pre-projected (bq, Dp) q against k/v projected
    in-kernel from ``xkv_ref``. q must already carry the softmax scale."""
    xkv = xkv_ref[0]          # (Lk, C)
    k = jax.lax.dot(xkv, wk_ref[...],
                    preferred_element_type=jnp.float32)   # (Lk, Dp)
    v = jax.lax.dot(xkv, wv_ref[...],
                    preferred_element_type=jnp.float32)
    k = k.astype(q.dtype)
    v = v.astype(q.dtype)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (bq, Lk)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    return jax.lax.dot(p.astype(q.dtype), v,
                       preferred_element_type=jnp.float32) / l


def _project_q(xq_ref, wq_ref, scale):
    xq = xq_ref[0]            # (bq, C)
    q = jax.lax.dot(xq, wq_ref[...],
                    preferred_element_type=jnp.float32)   # (bq, Dp)
    return (q * scale).astype(xq.dtype)


def _attend_one_head(xq_ref, xkv_ref, wq_ref, wk_ref, wv_ref, scale):
    return _core_with_q(_project_q(xq_ref, wq_ref, scale),
                        xkv_ref, wk_ref, wv_ref)


def _fused_kernel(xq_ref, xkv_ref, wq_ref, wk_ref, wv_ref, o_ref, *,
                  scale: float, out_dtype):
    o = _attend_one_head(xq_ref, xkv_ref, wq_ref, wk_ref, wv_ref, scale)
    o_ref[0] = o.astype(out_dtype)


def _fused_kernel_out(xq_ref, xkv_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                      o_ref, acc_scr, *, scale: float, out_dtype):
    """Out-projection fused on top: each head's attention output is
    contracted with its slice of Wout and accumulated in an fp32 scratch;
    the (bq, H*Dp) padded intermediate never exists, even in VMEM."""
    h = pl.program_id(2)
    nh = pl.num_programs(2)

    @pl.when(h == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    o = _attend_one_head(xq_ref, xkv_ref, wq_ref, wk_ref, wv_ref, scale)
    acc_scr[:] += jax.lax.dot(o.astype(xq_ref.dtype), wo_ref[...],
                              preferred_element_type=jnp.float32)

    @pl.when(h == nh - 1)
    def _():
        o_ref[0] = acc_scr[:].astype(out_dtype)


def _fused_kernel_out2(xq_ref, xkv1_ref, xkv2_ref, wq_ref, wk_ref, wv_ref,
                       wo_ref, o_ref, acc_scr, *, scale: float, out_dtype):
    """Paired-neighbor variant (cross-view "add" mode, 2 neighbors): BOTH
    neighbor attentions of one q-block run in a single grid step sharing
    one q projection, one xq load, one set of resident weights, and one
    fp32 out-accumulator — the sum of the two out-projected branches is
    what leaves VMEM. Separate softmaxes per neighbor (add-mode semantics,
    ref:blocks.py:190-222), NOT a concat attention."""
    h = pl.program_id(2)
    nh = pl.num_programs(2)

    @pl.when(h == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = _project_q(xq_ref, wq_ref, scale)
    o = (_core_with_q(q, xkv1_ref, wk_ref, wv_ref)
         + _core_with_q(q, xkv2_ref, wk_ref, wv_ref))
    acc_scr[:] += jax.lax.dot(o.astype(xq_ref.dtype), wo_ref[...],
                              preferred_element_type=jnp.float32)

    @pl.when(h == nh - 1)
    def _():
        o_ref[0] = acc_scr[:].astype(out_dtype)


_KV_CHUNK = 512  # rows per k/v projection chunk (bounds the fp32 temp)

# Sub-tile count for the kv-stationary kernels' q-block chain. The
# monolithic chain serializes MXU (q-proj, qk, pv dots) against VPU
# (softmax) per grid step; splitting the q rows into N independent
# sub-chains lets Mosaic's scheduler overlap one sub-tile's softmax with
# another's dots. Same math (softmax is per-row), bit-exact partition.
# Captured from the environment ONCE at import (a trace-time global, like
# the other MAGICDRIVE_* knobs) — tests/benches patch the module attribute.
def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


_KV_SUBTILE = _env_int("MAGICDRIVE_KV_SUBTILE", 1)

# Heads resident per kv-stationary grid step. With the (B, H, nq) grid the
# same x_q block is DMA'd once per head (8x its size in HBM traffic at the
# flagship level-0: ~344 MB/call) and every projection is a narrow
# (…, C) @ (C, 128) dot. A head GROUP of gh shares one x_q fetch per
# (group, q-block), projects q/k/v through (C, gh*128) weight blocks (wider
# MXU passes), and keeps gh heads' k/v resident in VMEM scratch — identical
# math, per-head softmax unchanged. gh is clamped to the largest divisor of
# `heads` whose scratch fits the VMEM budget, so 1 (the original kernel) is
# always a valid fallback. Default 2, measured on chip (B=4 flagship
# denoise step, PERFORMANCE.md round 4d): gh=2 runs 186.4 ms vs 197.6 at
# gh=1 (one full-length q block per two heads), while gh=4 (196.3) and
# gh=8 (212.3) give the DMA savings back to VMEM pressure.
_KV_HEADGROUP = _env_int("MAGICDRIVE_KV_HEADGROUP", 2)
# Shape-aware demotion (round 5h): the gh winner is empirical per shape —
# the grouped kernel (112 MiB raised scope, wide unrolled body) wins at
# the 224x400 (L=1400) and 424x800 (L=5300) level-0 rows, but at
# 272x736 (L=3128) the one-head-per-grid-step kernel under Mosaic's
# default 16 MiB scope runs the whole B=1 step 11.5 ms faster
# (bench_matrix GX 155.21 vs Y 166.88/166.71 — PERFORMANCE.md round 5h).
# When MAGICDRIVE_KV_HEADGROUP is NOT explicitly set, calls whose Lq AND
# Lk both fall in the measured 272x736 band are capped at gh=1; an
# explicit env (or a bench arm pinning kv_headgroup) disables the auto
# rule entirely. BOTH lengths are required: the 224x400 TRAINING step's
# concat-neighbor cross-view call is (Lq=1400, Lk=2800), and demoting it
# tripled the train step (1563 vs 556 ms/step, chip-measured — the
# round-5h initial Lk-only rule did exactly that); the 272x736 rows this
# rule is FOR are square (Lq = Lk = 3128).
_KV_HEADGROUP_AUTO = "MAGICDRIVE_KV_HEADGROUP" not in os.environ


def _headgroup_cap(Lq: int, Lk: int) -> int:
    if _KV_HEADGROUP_AUTO and 2000 <= Lq < 4100 and 2000 <= Lk < 4100:
        return 1
    return _KV_HEADGROUP
# A "small-shape escalation" (gh=8 for shapes whose full-bq working set is
# tiny — level-1 self/pair, the level-0 text cross — while level-0 keeps
# gh=2) was built and measured on chip in round 4e: 188.32 ms/step vs the
# HG2 bracket 186.64/186.91 — the modeled x_q-refetch saving (~2 ms) does
# NOT materialize at small Lk (the wider 8-head unrolled body costs more
# pipelining room than the DMA it saves). Removed per measure-or-delete;
# PERFORMANCE.md round 4e is the record.

# The round-4 headroom list's last pair-kernel idea — "q-chain pipelining
# across the two attends" (a staged schedule issuing every (branch, head)
# s-dot first, then every softmax, then every o-dot, so Mosaic could
# overlap one branch's VPU softmax with the other's MXU dots) — was built
# and chip-measured in round 5f: 186.72 ms/step vs the OP bracket
# 185.12/184.43 (+2 ms). Mosaic's own scheduling of the chained form
# already overlaps better than the hand-staged order, which pays the
# widened fp32 live set in pipelining room. Removed per measure-or-delete;
# PERFORMANCE.md round 5f is the record.


def _sub_ranges(bq: int):
    """(start, size) sub-row tiles of a q block: _KV_SUBTILE even pieces
    when they divide cleanly into sublane-aligned rows, else one tile."""
    t = _KV_SUBTILE
    if t <= 1 or bq % t or (bq // t) % 8:
        return [(0, bq)]
    sb = bq // t
    return [(j * sb, sb) for j in range(t)]


def _fused_kvstat_kernel(xq_ref, xkv_ref, wq_ref, wk_ref, wv_ref, o_ref,
                         k_scr, v_scr, *, scale: float, out_dtype,
                         d_out: Optional[int] = None):
    """KV-stationary variant: grid (B, H, nq) with the q-block axis
    innermost, so k/v for the current (batch, head) are projected ONCE into
    VMEM scratch (at q-block 0) and stay resident across all nq q-blocks —
    removing the per-q-block k/v recompute that makes the (B, nq, H) kernel
    uneconomical for nq > 2 (272x736/424x800 level-0, L in the thousands).
    The projection runs in _KV_CHUNK-row chunks (static unroll) so the fp32
    matmul temporary is chunk-sized — at 424x800 level-0 (Lk=5300) a
    full-length fp32 k/v would alone blow the VMEM budget."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        Lk = xkv_ref.shape[1]
        for start in range(0, Lk, _KV_CHUNK):
            size = min(_KV_CHUNK, Lk - start)
            xkv = xkv_ref[0, pl.dslice(start, size)]     # (size, C)
            k = jax.lax.dot(xkv, wk_ref[...],
                            preferred_element_type=jnp.float32)
            v = jax.lax.dot(xkv, wv_ref[...],
                            preferred_element_type=jnp.float32)
            k_scr[pl.dslice(start, size), :] = k.astype(k_scr.dtype)
            v_scr[pl.dslice(start, size), :] = v.astype(v_scr.dtype)

    for start, size in _sub_ranges(xq_ref.shape[1]):
        xq = xq_ref[0, pl.dslice(start, size)]            # (sb, C)
        q = jax.lax.dot(xq, wq_ref[...],
                        preferred_element_type=jnp.float32)   # (sb, Dp)
        q = (q * scale).astype(xq.dtype)
        s = jax.lax.dot_general(q, k_scr[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(p.astype(xq.dtype), v_scr[...],
                        preferred_element_type=jnp.float32) / l
        if d_out is not None:
            # VMEM-side head pack (drop the lane padding; 4D group-major out)
            o_ref[0, 0, pl.dslice(start, size)] = \
                o[:, :d_out].astype(out_dtype)
        else:
            o_ref[0, pl.dslice(start, size)] = o.astype(out_dtype)


def _project_kv_into(xkv_ref, wk_ref, wv_ref, k_scr, v_scr):
    """Chunked k/v projection into resident scratch (fp32 temporaries are
    _KV_CHUNK rows; the weight block width sets the head-group width)."""
    Lk = xkv_ref.shape[1]
    for start in range(0, Lk, _KV_CHUNK):
        size = min(_KV_CHUNK, Lk - start)
        xkv = xkv_ref[0, pl.dslice(start, size)]
        k = jax.lax.dot(xkv, wk_ref[...],
                        preferred_element_type=jnp.float32)
        v = jax.lax.dot(xkv, wv_ref[...],
                        preferred_element_type=jnp.float32)
        k_scr[pl.dslice(start, size), :] = k.astype(k_scr.dtype)
        v_scr[pl.dslice(start, size), :] = v.astype(v_scr.dtype)


def _group_attend(q, k_scr, v_scr, gh: int, d_pad: int, out_dtype,
                  d_out: Optional[int] = None):
    """Per-head softmax attention of a group-projected q (bq, gh*d_pad)
    against resident group k/v scratch; returns the (bq, gh*d_pad)
    head-lane-blocked output — or (bq, gh*d_out) with each head's lane
    padding dropped IN VMEM when ``d_out`` < d_pad (the head-pack output:
    downstream ``to_out`` then contracts the logical depth with no
    zero-row-padded weights and the padded o never reaches HBM)."""
    outs = []
    for hh in range(gh):
        sl = slice(hh * d_pad, (hh + 1) * d_pad)
        s = jax.lax.dot_general(q[:, sl], k_scr[:, sl],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(p.astype(q.dtype), v_scr[:, sl],
                        preferred_element_type=jnp.float32) / l
        if d_out is not None and d_out < d_pad:
            o = o[:, :d_out]
        outs.append(o.astype(out_dtype))
    return outs[0] if gh == 1 else jnp.concatenate(outs, axis=1)


def _fused_kvstat_group_kernel(xq_ref, xkv_ref, wq_ref, wk_ref, wv_ref,
                               o_ref, k_scr, v_scr, *, scale: float,
                               gh: int, d_pad: int, out_dtype,
                               d_out: Optional[int] = None):
    """Head-grouped kv-stationary kernel: grid (B, H/gh, nq) with gh heads'
    k/v resident per group — one x_q fetch serves gh heads (the (B, H, nq)
    grid re-DMAs it per head) and the q/k/v projections run as single
    (…, C) @ (C, gh*d_pad) MXU passes. Math identical to
    :func:`_fused_kvstat_kernel` (softmax is per-head)."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        _project_kv_into(xkv_ref, wk_ref, wv_ref, k_scr, v_scr)

    xq = xq_ref[0]
    q = jax.lax.dot(xq, wq_ref[...],
                    preferred_element_type=jnp.float32)  # (bq, gh*Dp)
    q = (q * scale).astype(xq.dtype)
    o = _group_attend(q, k_scr, v_scr, gh, d_pad, out_dtype, d_out=d_out)
    if d_out is not None:
        o_ref[0, 0] = o  # 4D group-major packed layout
    else:
        o_ref[0] = o


def _fused_kvstat_pair_group_kernel(xq_ref, xkv1_ref, xkv2_ref, wq_ref,
                                    wk_ref, wv_ref, o_ref, k1_scr, v1_scr,
                                    k2_scr, v2_scr, *, scale: float,
                                    gh: int, d_pad: int, out_dtype,
                                    d_out: Optional[int] = None):
    """Head-grouped paired-neighbor kv-stationary kernel (see
    :func:`_fused_kvstat_pair_kernel` for the pair semantics and
    :func:`_fused_kvstat_group_kernel` for the grouping)."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        _project_kv_into(xkv1_ref, wk_ref, wv_ref, k1_scr, v1_scr)
        _project_kv_into(xkv2_ref, wk_ref, wv_ref, k2_scr, v2_scr)

    xq = xq_ref[0]
    q = jax.lax.dot(xq, wq_ref[...],
                    preferred_element_type=jnp.float32)
    q = (q * scale).astype(xq.dtype)
    o1 = _group_attend(q, k1_scr, v1_scr, gh, d_pad, jnp.float32,
                       d_out=d_out)
    o2 = _group_attend(q, k2_scr, v2_scr, gh, d_pad, jnp.float32,
                       d_out=d_out)
    if d_out is not None:
        o_ref[0, 0] = (o1 + o2).astype(out_dtype)
    else:
        o_ref[0] = (o1 + o2).astype(out_dtype)


def _auto_bq(Lq: int, Lk: int, C: int, d_pad: int, esize: int,
             n_kv: int = 1) -> int:
    """Largest q block whose working set fits VMEM: fp32 (bq, Lk) logits
    tile + x_q block + full x_kv (``n_kv`` of them for the paired-neighbor
    kernel) + k/v/q fp32 intermediates."""
    lk_pad = _ceil_to(Lk, 128)
    fixed = (n_kv * Lk * C * esize     # x_kv
             + 2 * (lk_pad * d_pad * 4)  # k, v fp32
             + 3 * C * d_pad * esize)    # weights
    for bq in (_ceil_to(Lq, 16), 1024, 768, 512, 384, 256, 128):
        if bq > _ceil_to(Lq, 16):
            continue
        var = (bq * lk_pad * 4          # logits tile
               + bq * C * esize         # x_q
               + 2 * bq * d_pad * 4     # q fp32 + acc
               + bq * C * 4)            # out-projection fp32 scratch
        if fixed + var <= _VMEM_BUDGET:
            return bq
    return 128


def _auto_bq_kvstat(Lq: int, Lk: int, C: int, d_pad: int,
                    esize: int, n_kv: int = 1) -> Optional[int]:
    """Largest q block fitting VMEM for the kv-stationary kernel: the fixed
    set adds the resident k/v scratch (input dtype); the i==0 projection's
    fp32 temporaries are only _KV_CHUNK rows (chunked unroll). ``n_kv=2``
    sizes the paired-neighbor variant (two x_kv + two k/v scratch sets).
    None if even bq=128 does not fit."""
    lk_pad = _ceil_to(Lk, 16)
    ck = min(lk_pad, _KV_CHUNK)
    fixed = (n_kv * Lk * C * esize        # x_kv
             + n_kv * 2 * (lk_pad * d_pad * esize)  # k/v scratch, resident
             + 2 * (ck * d_pad * 4)       # chunked k/v fp32 projection temp
             + 3 * C * d_pad * esize)     # weights
    for bq in (_ceil_to(Lq, 16), 1024, 768, 512, 384, 256, 128):
        if bq > _ceil_to(Lq, 16):
            continue
        var = (bq * lk_pad * 4            # logits tile
               + bq * lk_pad * esize      # p cast
               + bq * C * esize           # x_q
               + 2 * bq * d_pad * 4)      # q fp32 + o fp32
        if fixed + var <= _VMEM_BUDGET:
            return bq
    return None


# Physical VMEM on v5e is 128 MiB; Mosaic's default *scoped* limit is
# 16 MiB. The grouped kernels size their working set against this budget
# and raise the per-kernel limit via CompilerParams — TPU cores run one
# kernel at a time, so a large working set only trades against the
# kernel's own pipelining room. The estimate is PESSIMISTIC: Mosaic
# software-pipelines the unrolled per-head loop, so each head's fp32
# logits/p/o temporaries get their own live range (measured: 81.87 MiB
# actual at gh=8/bq=512 pair vs 38 MiB modeled with buffer reuse).
_GROUP_VMEM_BUDGET = 112 << 20


def _group_vmem_estimate(Lk: int, C: int, d_pad: int, esize: int,
                         n_kv: int, gh: int, bq: int) -> int:
    """Pessimistic VMEM bytes for the head-grouped kv-stationary kernel:
    double-buffered operand/output blocks plus NO temporary reuse across
    the unrolled gh-head (and, for the pair, per-branch) attention loop."""
    lk_pad = _ceil_to(Lk, 16)
    ck = min(lk_pad, _KV_CHUNK)
    gd = gh * d_pad
    per_head = (bq * lk_pad * (4 + esize)    # logits fp32 + p cast
                + bq * d_pad * 4)            # per-head o fp32
    return (2 * n_kv * Lk * C * esize        # x_kv blocks, double-buffered
            + n_kv * 2 * lk_pad * gd * esize  # resident k/v scratch
            + 2 * 2 * ck * gd * 4             # chunked projection fp32 temps
            + 2 * 3 * C * gd * esize          # weight blocks, double-buffered
            + 2 * bq * C * esize              # x_q block, double-buffered
            + bq * gd * (4 + esize)           # q fp32 + bf16 cast
            + gh * n_kv * per_head            # unrolled attends, no reuse
            + bq * gd * esize                 # per-group o concat
            + 2 * bq * gd * esize)            # output block, double-buffered


def _group_choice(heads: int, Lq: int, Lk: int, C: int, d_pad: int,
                  esize: int, n_kv: int = 1):
    """(gh, bq) for the kv-stationary kernels: the largest head group
    gh <= the shape-aware cap (see _headgroup_cap) dividing ``heads``
    whose pessimistic working set fits _GROUP_VMEM_BUDGET (the raised
    per-kernel scoped limit). Falls back to (1, bq) — the original
    one-head-per-grid-step kernel under Mosaic's default scoped limit."""
    cap = _headgroup_cap(Lq, Lk)
    for gh in sorted({g for g in (8, 4, 2) if g <= cap
                      and heads % g == 0}, reverse=True):
        for bq in (_ceil_to(Lq, 16), 1024, 768, 512, 384, 256, 128):
            if bq > _ceil_to(Lq, 16):
                continue
            if (_group_vmem_estimate(Lk, C, d_pad, esize, n_kv, gh, bq)
                    <= _GROUP_VMEM_BUDGET):
                return gh, bq
    return 1, _auto_bq_kvstat(Lq, Lk, C, d_pad, esize, n_kv)


def _group_compiler_params(Lk: int, C: int, d_pad: int, esize: int,
                           n_kv: int, gh: int, bq: int):
    """Per-kernel Mosaic params raising the scoped-VMEM limit to the
    pessimistic estimate (capped at 112 MiB, leaving 16 MiB of the 128 MiB
    physical VMEM for the runtime)."""
    from jax.experimental.pallas import tpu as pltpu

    est = _group_vmem_estimate(Lk, C, d_pad, esize, n_kv, gh, bq)
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(est + (4 << 20), _GROUP_VMEM_BUDGET))


def kvstat_pair_fits(Lq: int, Lk: int, C: int, dim_head: int,
                     esize: int = 2) -> bool:
    d_pad = _ceil_to(max(dim_head, 128), 128)
    return _auto_bq_kvstat(Lq, Lk, C, d_pad, esize, n_kv=2) is not None


def _fused_kvstat_pair_kernel(xq_ref, xkv1_ref, xkv2_ref, wq_ref, wk_ref,
                              wv_ref, o_ref, k1_scr, v1_scr, k2_scr, v2_scr,
                              *, scale: float, out_dtype,
                              d_out: Optional[int] = None):
    """Paired-neighbor kv-stationary kernel: both neighbors' k/v projected
    once per (batch, head) into scratch, each q block projected once and
    attended against both, the SUM of the two per-head outputs written —
    one launch, half the padded-output traffic of two kvstat calls."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        for xkv_ref, k_scr, v_scr in ((xkv1_ref, k1_scr, v1_scr),
                                      (xkv2_ref, k2_scr, v2_scr)):
            Lk = xkv_ref.shape[1]
            for start in range(0, Lk, _KV_CHUNK):
                size = min(_KV_CHUNK, Lk - start)
                xkv = xkv_ref[0, pl.dslice(start, size)]
                k = jax.lax.dot(xkv, wk_ref[...],
                                preferred_element_type=jnp.float32)
                v = jax.lax.dot(xkv, wv_ref[...],
                                preferred_element_type=jnp.float32)
                k_scr[pl.dslice(start, size), :] = k.astype(k_scr.dtype)
                v_scr[pl.dslice(start, size), :] = v.astype(v_scr.dtype)

    def attend(q, k_scr, v_scr):
        s = jax.lax.dot_general(q, k_scr[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        return jax.lax.dot(p.astype(q.dtype), v_scr[...],
                           preferred_element_type=jnp.float32) / l

    for start, size in _sub_ranges(xq_ref.shape[1]):
        xq = xq_ref[0, pl.dslice(start, size)]
        q = jax.lax.dot(xq, wq_ref[...],
                        preferred_element_type=jnp.float32)
        q = (q * scale).astype(xq.dtype)
        o = attend(q, k1_scr, v1_scr) + attend(q, k2_scr, v2_scr)
        if d_out is not None:
            o_ref[0, 0, pl.dslice(start, size)] = \
                o[:, :d_out].astype(out_dtype)  # VMEM-side head pack
        else:
            o_ref[0, pl.dslice(start, size)] = o.astype(out_dtype)


def _shift_views(x, s, n):
    """shifted[(b, v)] = x[(b, (v+s) % n)] on a flattened (B*n, L, C) batch."""
    B, L, C = x.shape
    return jnp.roll(x.reshape(B // n, n, L, C), -s, axis=1).reshape(B, L, C)


def _unshift_views(g, s, n):
    """Adjoint of _shift_views (the inverse ring permutation)."""
    B, L, C = g.shape
    return jnp.roll(g.reshape(B // n, n, L, C), s, axis=1).reshape(B, L, C)


def _kv_index_map(shift):
    """BlockSpec index map for a neighbor k/v operand: identity when
    ``shift`` is None, else the ring permutation (b, v) -> (b, (v+s) % n)
    applied IN the grid on the flattened batch axis — the rolled HBM copy
    of the hidden states never exists (the round-4 HLO census attributed
    ~1.9 GB/step of pad/copy traffic to exactly these jnp.roll gathers)."""
    if shift is None:
        return lambda b, *_: (b, 0, 0)
    s, n = shift
    return lambda b, *_: ((b // n) * n + (b % n + s) % n, 0, 0)


def kvstat_is_efficient(Lq: int, Lk: int, C: int, dim_head: int,
                        esize: int = 2) -> bool:
    """Whether the kv-stationary fused kernel applies: k/v are projected
    once per (batch, head) regardless of nq, so the only constraint is that
    the full k/v (plus a q block's working set) fit VMEM."""
    d_pad = _ceil_to(max(dim_head, 128), 128)
    return _auto_bq_kvstat(Lq, Lk, C, d_pad, esize) is not None


def pair_is_efficient(Lq: int, Lk: int, C: int, dim_head: int,
                      esize: int = 2) -> bool:
    """Whether the paired-neighbor kernel keeps the nq <= 2 economics with
    both neighbors' x_kv resident."""
    d_pad = _ceil_to(max(dim_head, 128), 128)
    bq = _auto_bq(Lq, Lk, C, d_pad, esize, n_kv=2)
    return pl.cdiv(Lq, bq) <= 2


def _pair_fwd_impl(x_q, x_kv1, x_kv2, wq, wk, wv, wout, scale, heads, d_pad,
                   interpret, shifts=None):
    B, Lq, C = x_q.shape
    Lk, Ck = x_kv1.shape[1], x_kv1.shape[2]
    bq = _auto_bq(Lq, Lk, max(C, Ck), d_pad, x_q.dtype.itemsize, n_kv=2)
    nq = pl.cdiv(Lq, bq)
    C_out = wout.shape[1]
    from jax.experimental.pallas import tpu as pltpu

    sh1, sh2 = ((shifts[0], shifts[2]), (shifts[1], shifts[2])) \
        if shifts else (None, None)
    kernel = functools.partial(_fused_kernel_out2, scale=scale,
                               out_dtype=x_q.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, nq, heads),
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, i, h: (b, i, 0)),
            pl.BlockSpec((1, Lk, Ck), _kv_index_map(sh1)),
            pl.BlockSpec((1, Lk, Ck), _kv_index_map(sh2)),
            pl.BlockSpec((C, d_pad), lambda b, i, h: (0, h)),
            pl.BlockSpec((Ck, d_pad), lambda b, i, h: (0, h)),
            pl.BlockSpec((Ck, d_pad), lambda b, i, h: (0, h)),
            pl.BlockSpec((d_pad, C_out), lambda b, i, h: (h, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, C_out), lambda b, i, h: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Lq, C_out), x_q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, C_out), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * (Lq * C + 4 * nq * Lk * Ck) * d_pad
            + 8 * B * heads * Lq * Lk * d_pad,
            bytes_accessed=2 * B * (2 * nq * Lk * Ck + Lq * C + Lq * C_out),
            transcendentals=2 * B * heads * Lq * Lk,
        ),
    )(x_q, x_kv1, x_kv2, wq, wk, wv, wout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _pair_core_out(x_q, x_kv1, x_kv2, wq, wk, wv, wout, scale, heads, d_pad,
                   interpret, shifts):
    return _pair_fwd_impl(x_q, x_kv1, x_kv2, wq, wk, wv, wout, scale, heads,
                          d_pad, interpret, shifts)


def _pair_out_fwd(x_q, x_kv1, x_kv2, wq, wk, wv, wout, scale, heads, d_pad,
                  interpret, shifts):
    y = _pair_fwd_impl(x_q, x_kv1, x_kv2, wq, wk, wv, wout, scale, heads,
                       d_pad, interpret, shifts)
    return y, (x_q, x_kv1, x_kv2, wq, wk, wv, wout)


def _pair_out_bwd(scale, heads, d_pad, interpret, shifts, res, dy):
    # two independent out-fused branches sharing x_q and the weights — run
    # the single-branch vjp per neighbor and sum the shared cotangents
    # (optionally serialized — see _pair_bwd_serial). With in-grid shifts
    # the rolled copies exist only here in the backward; their cotangents
    # go back through the inverse permutation.
    x_q, x_kv1, x_kv2, wq, wk, wv, wout = res
    if shifts is not None:
        s1, s2, n = shifts
        x_kv1 = _shift_views(x_kv1, s1, n)
        x_kv2 = _shift_views(x_kv2, s2, n)

    def branch(xq, xkv, a, b, c, w):
        return _fused_core_out(xq, xkv, a, b, c, w, scale, heads, d_pad,
                               interpret)

    g = _sum_pair_grads(branch, (x_q, x_kv1, wq, wk, wv, wout),
                        (x_q, x_kv2, wq, wk, wv, wout), dy)
    if shifts is not None:
        g = (g[0], _unshift_views(g[1], s1, n),
             _unshift_views(g[2], s2, n)) + tuple(g[3:])
    return g


_pair_core_out.defvjp(_pair_out_fwd, _pair_out_bwd)


def fused_qkv_out_attention_pair(
    x_q: jnp.ndarray,
    x_kv1: jnp.ndarray,
    x_kv2: jnp.ndarray,
    wq: jnp.ndarray,
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    wout: jnp.ndarray,
    heads: int,
    scale: float,
    interpret: Optional[bool] = None,
    shifts: Optional[tuple] = None,
) -> jnp.ndarray:
    """Sum of two out-fused attention branches sharing q (the cross-view
    "add"-mode pair) in ONE kernel: separate softmaxes per neighbor, one q
    projection, one out-accumulator. Out bias NOT applied (callers add
    ``n_nb * bias``). Returns (B, Lq, C_out).

    shifts=(s1, s2, n_views): x_kv1/x_kv2 are the UNROLLED hidden states
    (typically x_q itself) and each branch reads view (v + s) % n_views
    via the kv BlockSpec index map — no rolled HBM copies."""
    if interpret is None:
        interpret = _interpret_default()
    d_pad = wq.shape[1] // heads
    return _pair_core_out(x_q, x_kv1, x_kv2, wq, wk, wv, wout, scale, heads,
                          d_pad, interpret, shifts)


def fused_is_efficient(Lq: int, Lk: int, C: int, dim_head: int,
                       esize: int = 2) -> bool:
    """The kernel recomputes k/v per q-block (nq blocks), so it pays off
    only while the recompute FLOPs stay small next to the HBM round trips
    it eliminates — nq <= 2 covers the 224x400 UNet levels (nq=2 costs
    ~0.45 ms/core vs ~1.5 ms saved); the 272x736 level-0 (L=3128, nq~9)
    falls back to the projected path."""
    d_pad = _ceil_to(max(dim_head, 128), 128)
    bq = _auto_bq(Lq, Lk, C, d_pad, esize)
    return pl.cdiv(Lq, bq) <= 2


def _fused_fwd_impl(x_q, x_kv, wq, wk, wv, scale, heads, d_pad, interpret,
                    wout=None):
    B, Lq, C = x_q.shape
    Lk = x_kv.shape[1]
    Ck = x_kv.shape[2]
    bq = _auto_bq(Lq, Lk, max(C, Ck), d_pad, x_q.dtype.itemsize)
    nq = pl.cdiv(Lq, bq)

    in_specs = [
        pl.BlockSpec((1, bq, C), lambda b, i, h: (b, i, 0)),
        pl.BlockSpec((1, Lk, Ck), lambda b, i, h: (b, 0, 0)),
        pl.BlockSpec((C, d_pad), lambda b, i, h: (0, h)),
        pl.BlockSpec((Ck, d_pad), lambda b, i, h: (0, h)),
        pl.BlockSpec((Ck, d_pad), lambda b, i, h: (0, h)),
    ]
    args = [x_q, x_kv, wq, wk, wv]
    cost = pl.CostEstimate(
        flops=2 * B * heads * (Lq * C + 2 * nq * Lk * Ck) * d_pad
        + 4 * B * heads * Lq * Lk * d_pad,
        bytes_accessed=2 * B * (nq * Lk * Ck + Lq * C
                                + Lq * heads * d_pad),
        transcendentals=B * heads * Lq * Lk,
    )
    if wout is None:
        kernel = functools.partial(_fused_kernel, scale=scale,
                                   out_dtype=x_q.dtype)
        return pl.pallas_call(
            kernel,
            grid=(B, nq, heads),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bq, d_pad), lambda b, i, h: (b, i, h)),
            out_shape=jax.ShapeDtypeStruct((B, Lq, heads * d_pad),
                                           x_q.dtype),
            interpret=interpret,
            cost_estimate=cost,
        )(*args)

    C_out = wout.shape[1]
    kernel = functools.partial(_fused_kernel_out, scale=scale,
                               out_dtype=x_q.dtype)
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        kernel,
        grid=(B, nq, heads),
        in_specs=in_specs + [
            pl.BlockSpec((d_pad, C_out), lambda b, i, h: (h, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, C_out), lambda b, i, h: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Lq, C_out), x_q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, C_out), jnp.float32)],
        interpret=interpret,
        cost_estimate=cost,
    )(*args, wout)


def _kvstat_fwd_impl(x_q, x_kv, wq, wk, wv, scale, heads, d_pad, interpret,
                     bq: Optional[int] = None,
                     d_out: Optional[int] = None):
    from jax.experimental.pallas import tpu as pltpu

    B, Lq, C = x_q.shape
    Lk, Ck = x_kv.shape[1], x_kv.shape[2]
    gh = 1
    if bq is None:
        gh, bq = _group_choice(heads, Lq, Lk, max(C, Ck), d_pad,
                               x_q.dtype.itemsize)
        assert bq is not None, "caller must check kvstat_is_efficient"
    nq = pl.cdiv(Lq, bq)
    do = d_out or d_pad

    extra = {}
    if gh > 1:
        kernel = functools.partial(_fused_kvstat_group_kernel, scale=scale,
                                   gh=gh, d_pad=d_pad, out_dtype=x_q.dtype,
                                   d_out=d_out)
        extra["compiler_params"] = _group_compiler_params(
            Lk, max(C, Ck), d_pad, x_q.dtype.itemsize, 1, gh, bq)
    else:
        kernel = functools.partial(_fused_kvstat_kernel, scale=scale,
                                   out_dtype=x_q.dtype, d_out=d_out)
    gd = gh * d_pad
    if d_out is not None:
        # head-packed outputs: gh*d_out lanes are not 128-divisible, so the
        # output is GROUP-MAJOR 4D — (B, H/gh, Lq, gh*d_out) with the lane
        # dim equal to the full array dim (always a legal block). Consumed
        # by OutProjection.grouped (per-group einsum at logical depth).
        out_specs = pl.BlockSpec((1, 1, bq, gh * do),
                                 lambda b, h, i: (b, h, i, 0))
        out_shape = jax.ShapeDtypeStruct((B, heads // gh, Lq, gh * do),
                                         x_q.dtype)
    else:
        out_specs = pl.BlockSpec((1, bq, gd), lambda b, h, i: (b, i, h))
        out_shape = jax.ShapeDtypeStruct((B, Lq, heads * d_pad), x_q.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, heads // gh, nq),
        **extra,
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, h, i: (b, i, 0)),
            pl.BlockSpec((1, Lk, Ck), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((C, gd), lambda b, h, i: (0, h)),
            pl.BlockSpec((Ck, gd), lambda b, h, i: (0, h)),
            pl.BlockSpec((Ck, gd), lambda b, h, i: (0, h)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((Lk, gd), x_q.dtype),
                        pltpu.VMEM((Lk, gd), x_q.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * (Lq * C + 2 * Lk * Ck) * d_pad
            + 4 * B * heads * Lq * Lk * d_pad,
            bytes_accessed=2 * B * (Lk * Ck + Lq * C + Lq * heads * do),
            transcendentals=B * heads * Lq * Lk,
        ),
    )(x_q, x_kv, wq, wk, wv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_core(x_q, x_kv, wq, wk, wv, scale, heads, d_pad, interpret):
    return _fused_fwd_impl(x_q, x_kv, wq, wk, wv, scale, heads, d_pad,
                           interpret)


def _fused_fwd(x_q, x_kv, wq, wk, wv, scale, heads, d_pad, interpret):
    y = _fused_fwd_impl(x_q, x_kv, wq, wk, wv, scale, heads, d_pad,
                        interpret)
    return y, (x_q, x_kv, wq, wk, wv)


def _project(x, w, heads, d_pad):
    y = (x @ w).reshape(*x.shape[:-1], heads, d_pad)
    return y


def _fused_bwd(scale, heads, d_pad, interpret, res, dy):
    from .flash_attention import _auto_blocks

    x_q, x_kv, wq, wk, wv = res
    B, Lq, C = x_q.shape
    Lk, Ck = x_kv.shape[1], x_kv.shape[2]

    # recompute projections (XLA): (B, L, H, Dp) -> (B*H, L, Dp)
    def to_bh(t, L):
        return t.transpose(0, 2, 1, 3).reshape(B * heads, L, d_pad)

    q = to_bh(_project(x_q, wq, heads, d_pad).astype(x_q.dtype), Lq)
    k = to_bh(_project(x_kv, wk, heads, d_pad).astype(x_q.dtype), Lk)
    v = to_bh(_project(x_kv, wv, heads, d_pad).astype(x_q.dtype), Lk)
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)

    bq, bk = _auto_blocks(Lq, Lk, max(d_pad, 128), q.dtype.itemsize)
    bq, bk = _pick_block(Lq, bq), _pick_block(Lk, bk)
    o, lse = _flash_fwd(qs, k, v, 1.0, Lk, bq, bk, interpret, with_lse=True)

    # dy may arrive in the head-packed layout (heads * d_out < heads *
    # d_pad, the kvstat d_out path): re-pad each head's lanes with zeros —
    # the padded q/k/v lanes carry zeros, so their cotangents are zero.
    d_in = dy.shape[-1] // heads
    dy4 = dy.reshape(B, Lq, heads, d_in)
    if d_in < d_pad:
        dy4 = jnp.pad(dy4, ((0, 0), (0, 0), (0, 0), (0, d_pad - d_in)))
    dy_bh = to_bh(dy4, Lq)
    dq_s, dk, dv = _flash_bwd(qs, k, v, o, lse, dy_bh, 1.0, Lk, bq, bk,
                              interpret)
    dq = (dq_s.astype(jnp.float32) * scale).astype(q.dtype)

    def from_bh(t, L):
        return t.reshape(B, heads, L, d_pad).transpose(0, 2, 1, 3)

    dq4 = from_bh(dq, Lq).reshape(B, Lq, heads * d_pad)
    dk4 = from_bh(dk, Lk).reshape(B, Lk, heads * d_pad)
    dv4 = from_bh(dv, Lk).reshape(B, Lk, heads * d_pad)

    dx_q = dq4 @ wq.T
    dx_kv = dk4 @ wk.T + dv4 @ wv.T
    x_q2 = x_q.reshape(B * Lq, C)
    x_kv2 = x_kv.reshape(B * Lk, Ck)
    dwq = x_q2.T @ dq4.reshape(B * Lq, -1)
    dwk = x_kv2.T @ dk4.reshape(B * Lk, -1)
    dwv = x_kv2.T @ dv4.reshape(B * Lk, -1)
    return (dx_q.astype(x_q.dtype), dx_kv.astype(x_kv.dtype),
            dwq.astype(wq.dtype), dwk.astype(wk.dtype), dwv.astype(wv.dtype))


_fused_core.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _fused_kvstat_core(x_q, x_kv, wq, wk, wv, scale, heads, d_pad,
                       interpret, d_out=None):
    return _kvstat_fwd_impl(x_q, x_kv, wq, wk, wv, scale, heads, d_pad,
                            interpret, d_out=d_out)


def _fused_kvstat_fwd(x_q, x_kv, wq, wk, wv, scale, heads, d_pad, interpret,
                      d_out=None):
    y = _kvstat_fwd_impl(x_q, x_kv, wq, wk, wv, scale, heads, d_pad,
                         interpret, d_out=d_out)
    return y, (x_q, x_kv, wq, wk, wv)


# the backward recomputes q/k/v with XLA matmuls and reuses the flash
# fwd(+lse)/bwd pair — identical output layout (modulo the optional d_out
# head-pack, whose group-major 4D cotangent is restored to the flat padded
# layout here), so the (B, nq, H) kernel's backward serves the
# kv-stationary forward unchanged.
def _unpack_dy(dy, heads, d_pad, d_out):
    """(B, H/gh, Lq, gh*d_out) packed cotangent -> (B, Lq, H*d_pad) padded
    (zero lanes ⇒ zero cotangents there)."""
    B, G, Lq, P = dy.shape
    gh = heads // G
    dy5 = dy.reshape(B, G, Lq, gh, d_out)
    dy5 = jnp.moveaxis(dy5, 1, 2).reshape(B, Lq, heads, d_out)
    dy5 = jnp.pad(dy5, ((0, 0), (0, 0), (0, 0), (0, d_pad - d_out)))
    return dy5.reshape(B, Lq, heads * d_pad)


def _fused_kvstat_bwd(scale, heads, d_pad, interpret, d_out, res, dy):
    if d_out is not None:
        dy = _unpack_dy(dy, heads, d_pad, d_out)
    return _fused_bwd(scale, heads, d_pad, interpret, res, dy)


_fused_kvstat_core.defvjp(_fused_kvstat_fwd, _fused_kvstat_bwd)


def _kvstat_pair_fwd_impl(x_q, x_kv1, x_kv2, wq, wk, wv, scale, heads,
                          d_pad, interpret, shifts=None, d_out=None):
    from jax.experimental.pallas import tpu as pltpu

    B, Lq, C = x_q.shape
    Lk, Ck = x_kv1.shape[1], x_kv1.shape[2]
    gh, bq = _group_choice(heads, Lq, Lk, max(C, Ck), d_pad,
                           x_q.dtype.itemsize, n_kv=2)
    assert bq is not None, "caller must check kvstat_pair_fits"
    nq = pl.cdiv(Lq, bq)
    do = d_out or d_pad

    sh1, sh2 = ((shifts[0], shifts[2]), (shifts[1], shifts[2])) \
        if shifts else (None, None)
    extra = {}
    if gh > 1:
        kernel = functools.partial(_fused_kvstat_pair_group_kernel,
                                   scale=scale, gh=gh, d_pad=d_pad,
                                   out_dtype=x_q.dtype, d_out=d_out)
        extra["compiler_params"] = _group_compiler_params(
            Lk, max(C, Ck), d_pad, x_q.dtype.itemsize, 2, gh, bq)
    else:
        kernel = functools.partial(_fused_kvstat_pair_kernel, scale=scale,
                                   out_dtype=x_q.dtype, d_out=d_out)
    gd = gh * d_pad
    scr = lambda: pltpu.VMEM((Lk, gd), x_q.dtype)
    if d_out is not None:
        out_specs = pl.BlockSpec((1, 1, bq, gh * do),
                                 lambda b, h, i: (b, h, i, 0))
        out_shape = jax.ShapeDtypeStruct((B, heads // gh, Lq, gh * do),
                                         x_q.dtype)
    else:
        out_specs = pl.BlockSpec((1, bq, gd), lambda b, h, i: (b, i, h))
        out_shape = jax.ShapeDtypeStruct((B, Lq, heads * d_pad), x_q.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, heads // gh, nq),
        **extra,
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, h, i: (b, i, 0)),
            pl.BlockSpec((1, Lk, Ck), _kv_index_map(sh1)),
            pl.BlockSpec((1, Lk, Ck), _kv_index_map(sh2)),
            pl.BlockSpec((C, gd), lambda b, h, i: (0, h)),
            pl.BlockSpec((Ck, gd), lambda b, h, i: (0, h)),
            pl.BlockSpec((Ck, gd), lambda b, h, i: (0, h)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[scr(), scr(), scr(), scr()],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * (Lq * C + 4 * Lk * Ck) * d_pad
            + 8 * B * heads * Lq * Lk * d_pad,
            bytes_accessed=2 * B * (2 * Lk * Ck + Lq * C
                                    + Lq * heads * do),
            transcendentals=2 * B * heads * Lq * Lk,
        ),
    )(x_q, x_kv1, x_kv2, wq, wk, wv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _kvstat_pair_core(x_q, x_kv1, x_kv2, wq, wk, wv, scale, heads, d_pad,
                      interpret, shifts, d_out=None):
    return _kvstat_pair_fwd_impl(x_q, x_kv1, x_kv2, wq, wk, wv, scale,
                                 heads, d_pad, interpret, shifts, d_out)


def _kvstat_pair_fwd(x_q, x_kv1, x_kv2, wq, wk, wv, scale, heads, d_pad,
                     interpret, shifts, d_out=None):
    y = _kvstat_pair_fwd_impl(x_q, x_kv1, x_kv2, wq, wk, wv, scale, heads,
                              d_pad, interpret, shifts, d_out)
    return y, (x_q, x_kv1, x_kv2, wq, wk, wv)


def _pair_bwd_serial() -> bool:
    """Whether the pair backward serializes its second branch behind the
    first via an optimization_barrier. Measured on chip (bs=3 224x400
    'dots' training): serial 511 ms/step vs free 526 — but the barrier
    pins its operands live across the remat boundary, so at the 60-frame
    t-shard scale it EXPLODES memory (16.33 -> 23.09 GiB, an OOM).
    Default off; flip via MAGICDRIVE_PAIR_BWD=serial for memory-
    comfortable image training."""
    import os

    return os.environ.get("MAGICDRIVE_PAIR_BWD", "free") == "serial"


def _sum_pair_grads(branch, args1, args2, dy):
    _, vjp1 = jax.vjp(branch, *args1)
    g1 = vjp1(dy)
    if _pair_bwd_serial():
        gate = jax.lax.optimization_barrier((g1[0], *args2))
        g1 = (gate[0],) + tuple(g1[1:])
        args2 = gate[1:]
    _, vjp2 = jax.vjp(branch, *args2)
    g2 = vjp2(dy)
    # args layout: (x_q, x_kv, *weights) — x_q and weights are shared
    # (cotangents sum); each branch owns its x_kv cotangent.
    return (g1[0] + g2[0], g1[1], g2[1]) + tuple(
        a + b for a, b in zip(g1[2:], g2[2:]))


def _kvstat_pair_bwd(scale, heads, d_pad, interpret, shifts, d_out, res, dy):
    x_q, x_kv1, x_kv2, wq, wk, wv = res
    if d_out is not None:
        dy = _unpack_dy(dy, heads, d_pad, d_out)
    if shifts is not None:
        # in-grid shift mode: the rolled copies exist only here in the
        # backward; cotangents return through the inverse permutation
        s1, s2, n = shifts
        x_kv1 = _shift_views(x_kv1, s1, n)
        x_kv2 = _shift_views(x_kv2, s2, n)

    def branch(xq, xkv, a, b, c):
        return _fused_core(xq, xkv, a, b, c, scale, heads, d_pad, interpret)

    g = _sum_pair_grads(branch, (x_q, x_kv1, wq, wk, wv),
                        (x_q, x_kv2, wq, wk, wv), dy)
    if shifts is not None:
        g = (g[0], _unshift_views(g[1], s1, n),
             _unshift_views(g[2], s2, n)) + tuple(g[3:])
    return g


_kvstat_pair_core.defvjp(_kvstat_pair_fwd, _kvstat_pair_bwd)


def fused_kvstat_attention_pair(
    x_q: jnp.ndarray,
    x_kv1: jnp.ndarray,
    x_kv2: jnp.ndarray,
    wq: jnp.ndarray,
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    heads: int,
    scale: float,
    interpret: Optional[bool] = None,
    shifts: Optional[tuple] = None,
    d_out: Optional[int] = None,
) -> jnp.ndarray:
    """SUM of two kv-stationary attention branches sharing q (cross-view
    "add"-mode pair) in one kernel. Returns (B, Lq, H, Dp) in the padded-
    head layout — callers out-project the sum once (``n_summed=2``).

    shifts=(s1, s2, n_views): x_kv1/x_kv2 are the UNROLLED hidden states
    (typically x_q itself) and each branch reads view (v + s) % n_views
    via the kv BlockSpec index map — no rolled HBM copies.

    d_out: write each head's output at this LOGICAL depth (< the padded
    d_pad) — the VMEM-side head pack; returns the group-major
    (B, H/gh, Lq, gh*d_out) layout ``_OutProj.grouped`` consumes."""
    if interpret is None:
        interpret = _interpret_default()
    d_pad = wq.shape[1] // heads
    B, Lq, _ = x_q.shape
    out = _kvstat_pair_core(x_q, x_kv1, x_kv2, wq, wk, wv, scale, heads,
                            d_pad, interpret, shifts, d_out)
    if d_out is not None:
        return out
    return out.reshape(B, Lq, heads, d_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _fused_core_out(x_q, x_kv, wq, wk, wv, wout, scale, heads, d_pad,
                    interpret):
    return _fused_fwd_impl(x_q, x_kv, wq, wk, wv, scale, heads, d_pad,
                           interpret, wout=wout)


def _fused_out_fwd(x_q, x_kv, wq, wk, wv, wout, scale, heads, d_pad,
                   interpret):
    y = _fused_fwd_impl(x_q, x_kv, wq, wk, wv, scale, heads, d_pad,
                        interpret, wout=wout)
    return y, (x_q, x_kv, wq, wk, wv, wout)


def _fused_out_bwd(scale, heads, d_pad, interpret, res, dy):
    x_q, x_kv, wq, wk, wv, wout = res
    B, Lq, _ = x_q.shape
    # dy: (B, Lq, C_out). Per-head core cotangent = dy @ Wout_h^T; recompute
    # the per-head attention output for dWout via the unfused core's vjp.
    o_heads, core_vjp = jax.vjp(
        lambda xq, xkv, a, b, c: _fused_core(xq, xkv, a, b, c, scale, heads,
                                             d_pad, interpret),
        x_q, x_kv, wq, wk, wv)
    dy_heads = (dy @ wout.T.astype(dy.dtype))  # (B, Lq, H*Dp)
    dx_q, dx_kv, dwq, dwk, dwv = core_vjp(dy_heads.astype(o_heads.dtype))
    dwout = (o_heads.reshape(B * Lq, -1).T @ dy.reshape(B * Lq, -1))
    return (dx_q, dx_kv, dwq, dwk, dwv, dwout.astype(wout.dtype))


_fused_core_out.defvjp(_fused_out_fwd, _fused_out_bwd)


def fused_qkv_attention(
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    wq: jnp.ndarray,
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    heads: int,
    scale: float,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Projection-fused attention.

    x_q: (B, Lq, C); x_kv: (B, Lk, Ck); wq: (C, H*Dp); wk/wv: (Ck, H*Dp)
    with Dp the (lane-padded) head depth. Returns (B, Lq, H, Dp) — the
    padded-head layout ``Attention.project_out`` consumes.
    """
    if interpret is None:
        interpret = _interpret_default()
    d_pad = wq.shape[1] // heads
    B, Lq, _ = x_q.shape
    out = _fused_core(x_q, x_kv, wq, wk, wv, scale, heads, d_pad, interpret)
    return out.reshape(B, Lq, heads, d_pad)


def fused_kvstat_attention(
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    wq: jnp.ndarray,
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    heads: int,
    scale: float,
    interpret: Optional[bool] = None,
    d_out: Optional[int] = None,
) -> jnp.ndarray:
    """Projection-fused attention with VMEM-resident k/v (one projection
    per (batch, head) regardless of the q-block count) — the fused path for
    shapes where nq > 2 makes the recomputing kernel uneconomical.

    Same contract as :func:`fused_qkv_attention`: returns (B, Lq, H, Dp) in
    the padded-head layout ``Attention.project_out`` consumes — or, when
    ``d_out`` (= dim_head) is given, the GROUP-MAJOR packed layout
    (B, H/gh, Lq, gh*d_out) with each head's lane padding dropped in VMEM;
    ``_OutProj.grouped`` consumes that at logical depth."""
    if interpret is None:
        interpret = _interpret_default()
    d_pad = wq.shape[1] // heads
    B, Lq, _ = x_q.shape
    out = _fused_kvstat_core(x_q, x_kv, wq, wk, wv, scale, heads, d_pad,
                             interpret, d_out)
    if d_out is not None:
        return out
    return out.reshape(B, Lq, heads, d_pad)


def fused_qkv_out_attention(
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    wq: jnp.ndarray,
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    wout: jnp.ndarray,
    heads: int,
    scale: float,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fully-fused attention: projections + core + out-projection in one
    kernel; neither q/k/v nor the (…, H*Dp) attention output touch HBM.
    ``wout``: (H*Dp, C_out). The out bias is NOT applied (add it outside —
    callers summing k attention branches need bias * k once).
    Returns (B, Lq, C_out)."""
    if interpret is None:
        interpret = _interpret_default()
    d_pad = wq.shape[1] // heads
    return _fused_core_out(x_q, x_kv, wq, wk, wv, wout, scale, heads, d_pad,
                           interpret)
