"""Fused flash attention (fwd + bwd) as Pallas TPU kernels.

TPU-native replacement for the reference's xformers CUDA FMHA
(ref:third_party/xformers/xformers/csrc/attention/cuda/fmha/, dispatched via
diffusers XFormersAttnProcessor and enabled at
ref:magicdrive/runner/base_runner.py:155-170). One kernel serves all three
attention uses (self, text-cross, cross-view): O(L) memory online-softmax
tiling, fp32 accumulation, bf16 MXU matmuls.

Layout: the public entry takes diffusers-style (..., L, H, D) tensors, maps
them to (BH, L, D) internally and pads L/Lk to block multiples; the depth
stays at its logical size (Mosaic lane-pads VMEM tiles internally — no
padded HBM copies). Per-row logsumexp is stored for the backward pass. The
backward is the standard two-kernel FlashAttention-2 scheme: a dq pass
(grid over q blocks, reduce over k blocks) and a dk/dv pass (grid over k
blocks, reduce over q blocks), with delta = rowsum(dO * O) precomputed.

All shapes are static under jit; padded key positions are masked with -inf
logits inside the kernel.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _clean_v(v, row_offset, kv_len):
    """Zero out-of-bounds value rows (partial edge blocks read unspecified
    memory; 0 * garbage in the PV matmul would poison every output row —
    masked p columns are zero, but 0 * NaN = NaN). A (bk, D)-sized select,
    ~bq/D times cheaper than masking the logits tile."""
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) + row_offset
    return jnp.where(row < kv_len, v, jnp.zeros_like(v))


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_block(length: int, target: int) -> int:
    """Largest block <= target that is a multiple of 16 covering length
    (16 = bf16 sublane tile)."""
    if length <= target:
        return _ceil_to(length, 16)
    return target


def on_tpu_by_default() -> bool:
    """True when ops run on TPU by default — honors ``jax.default_device``
    contexts (host-side init under ``default_device(cpu)`` must NOT take
    the TPU kernel path even though the global backend is TPU)."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return getattr(dd, "platform", "") in ("tpu", "axon")
    return jax.default_backend() == "tpu"


def _interpret_default() -> bool:
    return not on_tpu_by_default()


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale: float, kv_len: int,
                block_k: int):
    """lse_ref is None in the inference-only variant (no backward)."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (bq, bk)

    # mask padded keys
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:]                       # (bq, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                  # (bq, bk) fp32
    l_new = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    vv = v_ref[0] if kv_len % block_k == 0 \
        else _clean_v(v_ref[0], j * block_k, kv_len)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot(
        p.astype(v_ref.dtype), vv, preferred_element_type=jnp.float32)
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(j == nk - 1)
    def _():
        l = l_scr[:]
        # guard fully-masked (padded-q) rows
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        if lse_ref is not None:
            lse_ref[0] = m_scr[:] + jnp.log(l_safe)  # (bq, 1)


def _fwd_kernel_nk1(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                    kv_len: int):
    """Single-k-block specialization: the whole key range is in VMEM, so the
    softmax is computed inline — no m/l scratch state, no cross-step
    rescaling. Measured 4.4 ms vs 7.5 ms for the streaming kernel at the
    224x400 UNet shape (BH=384, L=1408, D=128), where every auto block
    choice has nk == 1."""
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # (bq, bk)
    vv = v_ref[0]
    if kv_len < s.shape[1]:  # mask padded keys (static condition)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
        vv = _clean_v(vv, 0, kv_len)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o_ref[0] = (jax.lax.dot(
        p.astype(v_ref.dtype), vv,
        preferred_element_type=jnp.float32) / l).astype(o_ref.dtype)
    if lse_ref is not None:
        lse_ref[0] = m + jnp.log(l)


def _flash_fwd(q, k, v, scale, kv_len, block_q, block_k, interpret,
               with_lse: bool = True):
    """q: (BH, Lq, D); k/v: (BH, Lk, D); kv_len = true Lk.

    Lq/Lk need NOT be multiples of the block sizes: the grid is ceil-divided
    and the edge blocks are partially out-of-bounds — OOB key columns are
    masked to -inf via ``kv_len`` inside the kernels, OOB query rows produce
    garbage that stays row-local (softmax is per-row) and their writes are
    dropped. This avoids materializing padded q/k/v copies in HBM (a full
    tensor copy per pad at 0.6% extra rows — see PERFORMANCE.md).

    ``with_lse=False`` (inference) omits the logsumexp output entirely — its
    (BH, Lq, 1) layout pads the unit lane dim to 128 in HBM, a 128x blowup
    that matters at video batch sizes; it is only needed for the backward.
    """
    BH, Lq, D = q.shape
    Lk = k.shape[1]
    nq, nk = pl.cdiv(Lq, block_q), pl.cdiv(Lk, block_k)

    if nk == 1:
        kernel = functools.partial(_fwd_kernel_nk1, scale=scale,
                                   kv_len=kv_len)
        if not with_lse:
            def kernel(q_ref, k_ref, v_ref, o_ref, *, _k=_fwd_kernel_nk1):
                _k(q_ref, k_ref, v_ref, o_ref, None, scale=scale,
                   kv_len=kv_len)
        scratch = []
    else:
        def kernel_no_lse(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
            _fwd_kernel(q_ref, k_ref, v_ref, o_ref, None, m_scr, l_scr,
                        acc_scr, scale=scale, kv_len=kv_len, block_k=block_k)

        kernel = functools.partial(_fwd_kernel, scale=scale, kv_len=kv_len,
                                   block_k=block_k) if with_lse \
            else kernel_no_lse
        scratch = [
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ]

    out_shape = [jax.ShapeDtypeStruct((BH, Lq, D), q.dtype)]
    out_specs = [pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0))]
    if with_lse:
        out_shape.append(jax.ShapeDtypeStruct((BH, Lq, 1), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)))

    out = pl.pallas_call(
        kernel,
        grid=(BH, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=tuple(out_specs) if with_lse else out_specs[0],
        scratch_shapes=scratch,
        out_shape=tuple(out_shape) if with_lse else out_shape[0],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Lq * Lk * D,
            bytes_accessed=2 * BH * (Lq + 2 * Lk) * D * 2,
            transcendentals=BH * Lq * Lk,
        ),
    )(q, k, v)
    return out if with_lse else (out, None)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, o_ref, dq_ref,
                   acc_scr, *, scale: float, kv_len: int, block_k: int):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q, kk, vv, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    s = jax.lax.dot_general(q, kk, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0])                              # (bq, bk)
    # delta = rowsum(do * o) computed in-kernel: a (BH, Lq, 1) fp32 HBM
    # tensor would be tile-padded 128x (360 MB at train level-0 shapes)
    delta = jnp.sum(do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
                    axis=-1, keepdims=True)                  # (bq, 1)
    dp = jax.lax.dot_general(do, vv, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale                            # (bq, bk)
    acc_scr[:] += jax.lax.dot(ds.astype(kk.dtype), kk,
                              preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = acc_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, o_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr,
                    *, scale: float, kv_len: int, block_k: int):
    i = pl.program_id(2)   # q block index (reduction axis)
    nq = pl.num_programs(2)
    j = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q, kk, vv, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    s = jax.lax.dot_general(q, kk, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0])                              # (bq, bk)
    delta = jnp.sum(do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
                    axis=-1, keepdims=True)                  # (bq, 1)
    # dV_j += P^T dO  — contract over the q axis
    dv_scr[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, vv, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (bq, bk)
    ds = p * (dp - delta) * scale
    # dK_j += dS^T Q
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, o, lse, do, scale, kv_len, block_q, block_k,
               interpret):
    BH, Lq_in, D = q.shape
    Lk_in = k.shape[1]

    # The backward working set (two live fp32 logits tiles + four operand
    # blocks + fp32 scratch) is larger than the forward's; pick its own
    # VMEM-safe blocks and re-pad. Zero-padded q rows are harmless: dO=0
    # there makes their dK/dV contributions vanish, and their dq rows are
    # sliced off; padded k columns are masked by kv_len inside the kernels.
    block_q, block_k = _auto_blocks_bwd(Lq_in, Lk_in,
                                        max(_ceil_to(D, 128), 128),
                                        q.dtype.itemsize)
    block_q = _pick_block(Lq_in, block_q)
    block_k = _pick_block(Lk_in, block_k)
    Lq, Lk = _ceil_to(Lq_in, block_q), _ceil_to(Lk_in, block_k)

    def pad_rows(t, L_target):
        if t.shape[1] == L_target:
            return t
        return jnp.pad(t, ((0, 0), (0, L_target - t.shape[1]), (0, 0)))

    q, do, lse, o = (pad_rows(t, Lq) for t in (q, do, lse, o))
    k, v = pad_rows(k, Lk), pad_rows(v, Lk)
    nq, nk = Lq // block_q, Lk // block_k

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=kv_len,
                          block_k=block_k),
        grid=(BH, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((BH, Lq, D), q.dtype),
        interpret=interpret,
    )(q, k, v, do, lse, o)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, kv_len=kv_len,
                          block_k=block_k),
        grid=(BH, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, D), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, D), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((BH, Lk, D), k.dtype),
            jax.ShapeDtypeStruct((BH, Lk, D), v.dtype),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, o)
    # slice re-padding back to the caller's (fwd-padded) lengths
    return dq[:, :Lq_in], dk[:, :Lk_in], dv[:, :Lk_in]


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_core(q, k, v, scale, kv_len, block_q, block_k, interpret):
    o, _ = _flash_fwd(q, k, v, scale, kv_len, block_q, block_k, interpret,
                      with_lse=False)
    return o


def _flash_core_fwd(q, k, v, scale, kv_len, block_q, block_k, interpret):
    o, lse = _flash_fwd(q, k, v, scale, kv_len, block_q, block_k, interpret)
    return o, (q, k, v, o, lse)


def _flash_core_bwd(scale, kv_len, block_q, block_k, interpret, res, do):
    q, k, v, o, lse = res
    return _flash_bwd(q, k, v, o, lse, do, scale, kv_len, block_q, block_k,
                      interpret)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


_VMEM_BUDGET = 11 << 20  # leave headroom in the ~16 MiB VMEM


def _search_blocks(Lq: int, Lk: int, fits) -> Tuple[int, int]:
    bq_full, bk_full = _ceil_to(Lq, 16), _ceil_to(Lk, 16)
    if fits(bq_full, bk_full):
        return bq_full, bk_full
    for bq in (1024, 768, 512, 384, 256, 128):
        if bq < bq_full and fits(bq, bk_full):
            return bq, bk_full
    for bk in (1024, 512, 256):
        for bq in (512, 256, 128):
            if fits(bq, bk):
                return bq, bk
    return 256, 128


def _auto_blocks(Lq: int, Lk: int, d_pad: int, esize: int) -> Tuple[int, int]:
    """Largest forward blocks that fit VMEM — measured fastest at SD shapes.

    At L=1400, D=40 (the 224x400 UNet): full-extent blocks run 7.5 ms vs
    18.3 ms with the 256x256 default and 10.7 ms for XLA's fused attention
    (tools/bench_attention.py) — and the nk==1 specialization takes the
    same shape to 4.4 ms. Grid-step overhead and re-streaming of k/v
    dominate small blocks at these sizes, so prefer one whole-sequence k
    block, then shrink the q block until the fp32 (bq, bk) logits tile and
    the k/v/q/acc buffers fit. ``esize`` = q/k/v element size in bytes.
    """

    def fits(bq, bk):
        s = bq * bk * 4                      # logits tile, fp32
        kv = 2 * bk * d_pad * esize * 2      # k + v, double-buffered
        qa = bq * d_pad * (esize + 4)        # q + fp32 accumulator
        return s + kv + qa <= _VMEM_BUDGET

    return _search_blocks(Lq, Lk, fits)


def _auto_blocks_bwd(Lq: int, Lk: int, d_pad: int,
                     esize: int) -> Tuple[int, int]:
    """Backward blocks: the dq/dkv kernels hold two live (bq, bk) fp32
    tiles (p and ds/dp), five operand blocks (q, k, v, dO, O — delta is
    computed in-kernel from dO/O so the tile-padded (BH, Lq, 1) HBM tensor
    never exists) and fp32 scratch accumulators — a much larger working
    set than the forward, so they get their own (smaller) choice. Caught
    on-chip: fwd-sized blocks OOM scoped VMEM for the fp32 tiny-model
    train step."""

    def fits(bq, bk):
        tiles = 2 * bq * bk * 4
        ops = (3 * bq + 2 * bk) * d_pad * esize * 2
        scr = (2 * bk + bq) * d_pad * 4 + bq * 4
        return tiles + ops + scr <= _VMEM_BUDGET

    return _search_blocks(Lq, Lk, fits)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Flash attention over diffusers-layout tensors.

    q: (..., Lq, H, D); k/v: (..., Lk, H, D). Returns (..., Lq, H, D).
    Full (non-causal, unmasked) attention with 1/sqrt(D) scaling — matching
    :func:`magicdrive_tpu.core.attention.dot_product_attention`. Callers
    feeding lane-padded heads (depth padded beyond the logical dim_head,
    see core.attention head padding) must pass the logical scale.
    Block sizes default to the VMEM-filling auto choice (``_auto_blocks``).
    """
    if interpret is None:
        interpret = _interpret_default()
    orig_dtype = q.dtype
    *lead, Lq, H, D = q.shape
    Lk = k.shape[-3]
    if scale is None:
        scale = float(D) ** -0.5
    B = int(np.prod(lead)) if lead else 1

    def to_bh(t, L):
        t = t.reshape(B, L, H, D).transpose(0, 2, 1, 3)
        return t.reshape(B * H, L, D)

    qf, kf, vf = to_bh(q, Lq), to_bh(k, Lk), to_bh(v, Lk)

    # VMEM block budgeting uses the LANE-padded depth (Mosaic pads the last
    # dim of every VMEM tile to 128), but the HBM tensors stay at D: blocks
    # of logical depth 40 avoid materializing 3.2x-inflated padded q/k/v
    # copies in HBM (the round-1 kernel's jnp.pad to D=128 cost ~0.4 s of
    # pad+slice traffic per 224x400 pipeline call — see PERFORMANCE.md).
    d_pad = max(_ceil_to(D, 128), 128)
    if block_q is None or block_k is None:
        auto_q, auto_k = _auto_blocks(Lq, Lk, d_pad, q.dtype.itemsize)
        block_q = block_q if block_q is not None else auto_q
        block_k = block_k if block_k is not None else auto_k
    bq = _pick_block(Lq, block_q)
    bk = _pick_block(Lk, block_k)

    # Fold the softmax scale into q outside the kernel: a (BH, L, D) multiply
    # XLA fuses into the projection epilogue, replacing a per-(bq, bk)-tile
    # VPU multiply inside the kernel (35x more elements at L=1400, D=40).
    # The outer autodiff of this multiply also keeps the backward exact with
    # scale=1.0 inside the custom_vjp.
    qf = (qf.astype(jnp.float32) * scale).astype(qf.dtype)
    o = _flash_core(qf, kf, vf, 1.0, Lk, bq, bk, interpret)
    o = o.reshape(B, H, Lq, D).transpose(0, 2, 1, 3)
    return o.reshape(*lead, Lq, H, D).astype(orig_dtype)
