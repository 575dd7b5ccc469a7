"""Microbench: XLA fused attention vs the Pallas flash kernel at the exact
shapes the 224x400 UNet runs (B*views*CFG = 48, 8 heads of D=40, L=1400).

Each variant is one small jit — seconds to compile — so this is the fast
iteration loop for kernel tuning (block sizes, dispatch thresholds).

Usage: python tools/bench_attention.py [L] [D] [BH]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/magicdrive_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def timeit(fn, *args, iters=20, name=""):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:4])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:4])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    from magicdrive_tpu.core.attention import dot_product_attention
    from magicdrive_tpu.kernels.flash_attention import flash_attention

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 1400
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    H = 8
    k = jax.random.PRNGKey(0)
    q = jax.random.normal(k, (B, L, H, D), jnp.bfloat16)
    kk = jax.random.normal(k, (B, L, H, D), jnp.bfloat16)
    v = jax.random.normal(k, (B, L, H, D), jnp.bfloat16)

    print(f"B={B} L={L} H={H} D={D}  "
          f"useful flops/call={4 * B * H * L * L * D / 1e9:.1f} GF")
    t = timeit(jax.jit(lambda a, b, c: dot_product_attention(
        a, b, c, backend="xla")), q, kk, v, name="xla einsum+softmax")
    print(f"  -> {4 * B * H * L * L * D / t / 1e12:.1f} TF/s useful")
    for bq, bk in ((256, 256), (512, 512), (256, 512), (512, 1024),
                   (1536, 1536)):
        try:
            f = jax.jit(lambda a, b, c, bq=bq, bk=bk: flash_attention(
                a, b, c, block_q=bq, block_k=bk))
            t = timeit(f, q, kk, v, name=f"pallas flash bq={bq} bk={bk}")
            print(f"  -> {4 * B * H * L * L * D / t / 1e12:.1f} TF/s useful")
        except Exception as e:  # noqa: BLE001
            print(f"pallas bq={bq} bk={bk}: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
