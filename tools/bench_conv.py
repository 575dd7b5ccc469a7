"""Standalone chip A/B of UNet conv-row formulations (conv floor record).

Times each target UNet conv row shape (the N=320 level-0 rows where XLA's
conv measures 142-151 GFLOP/s in-graph — round-4 per-op profile) under:

  xla      conv_general_dilated on the materialized concat (+bias +temb)
  split    part-wise convs summed (the shipped SKIP_CONCAT=split path)
  xla-act  GroupNorm-affine + SiLU + conv as separate XLA ops (shows XLA
           fuses the activation into the conv: +0.04-0.16 ms only)
  dot-probe  pure transposed (O, 9C) @ (9C, nimg*F) dot — the would-be
           ceiling of a channels-on-sublanes implicit-GEMM formulation
           (measured 3.9-5.5 GFLOP/s: pathological on the MXU)

A pallas transposed implicit-GEMM kernel (+ fused GN/SiLU) was measured
against these arms round 5 and REMOVED after losing on every row —
PERFORMANCE.md round 5b is the record; the kernel is at the commit
preceding its removal.

Usage: python tools/bench_conv.py [--iters 20] [--rows all]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.path.isdir("/root/.axon_site"):
    sys.path.append("/root/.axon_site")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/magicdrive_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def conv3x3_ref(parts, kernel, bias, *, temb=None, mul=None, shift=None,
                silu=False):
    """conv3x3 SAME on concat(parts) + bias (+temb), optional affine+SiLU."""
    x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    if mul is not None:
        x = x * mul[:, None, None, :] + shift[:, None, None, :]
    if silu:
        x = jax.nn.silu(x)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bias.astype(x.dtype)
    if temb is not None:
        y = y + temb.astype(x.dtype)[:, None, None, :]
    return y


def fetch(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:4])


def timeit(fn, *args, iters=20, name=""):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / iters
    return dt


# (name, B, H, W, parts, O) at the B=4 flagship (48 = 4*2cfg*6views)
ROWS = [
    ("up3_r0_conv1", 48, 28, 50, (320, 640), 320),
    ("up3_r12_conv1", 48, 28, 50, (320, 320), 320),
    ("l0_conv2", 48, 28, 50, (320,), 320),
    ("up2_r0_conv1", 48, 14, 25, (640, 1280), 640),
    ("up0_r0_conv1", 48, 4, 7, (1280, 1280), 1280),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rows", default="all")
    ap.add_argument("--nimg", type=int, default=2)
    args = ap.parse_args()

    dtype = jnp.bfloat16
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)

    for name, B, H, W, cs, O in ROWS:
        if args.rows != "all" and name not in args.rows.split(","):
            continue
        C = sum(cs)
        flops = 2 * B * H * W * 9 * C * O
        zeros = jax.jit(lambda: (
            [jnp.zeros((B, H, W, c), dtype) for c in cs],
            jnp.zeros((3, 3, C, O), jnp.float32),
            jnp.zeros((O,), jnp.float32),
            jnp.zeros((B, C), jnp.float32),   # mul
            jnp.zeros((B, C), jnp.float32),   # shift
            jnp.zeros((B, O), jnp.float32),   # temb
        ))
        parts, k, b, mul, shift, temb = jax.device_put(zeros(), dev)

        arms = {}

        def run(label, fn):
            f = jax.jit(fn)
            dt = timeit(f, iters=args.iters)
            arms[label] = dt
            rate = flops / dt / 1e9
            print(f"{name:16s} {label:10s} {dt * 1e3:8.3f} ms "
                  f"{rate:8.0f} GFLOP/s", flush=True)

        run("xla", lambda p=parts: conv3x3_ref(p, k, b, temb=temb))

        if len(cs) > 1:
            def split(p=parts):
                y, off = None, 0
                for part in p:
                    ci = part.shape[-1]
                    w = jax.lax.slice_in_dim(k, off, off + ci, axis=2)
                    t = jax.lax.conv_general_dilated(
                        part, w.astype(dtype), (1, 1), ((1, 1), (1, 1)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    y = t if y is None else y + t
                    off += ci
                return y + b.astype(dtype) + temb.astype(dtype)[:, None, None]
            run("split", split)
        # activation-inclusive arm: GroupNorm apply + SiLU before the conv
        run("xla-act", lambda p=parts: conv3x3_ref(
            p, k, b, temb=temb, mul=mul, shift=shift, silu=True))

        # pure-dot ceiling probe at this row's transposed dims
        F = (H + 2) * (W + 2)
        A = jnp.zeros((O, 9 * C), dtype)
        Bm = jnp.zeros((9 * C, args.nimg * F), dtype)
        probe = jax.jit(lambda: jax.lax.dot_general(
            A, Bm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dt = timeit(probe, iters=args.iters)
        rate = 2 * O * 9 * C * args.nimg * F / dt / 1e9
        eq = dt * (B / args.nimg)
        print(f"{name:16s} {'dot-probe':10s} {eq * 1e3:8.3f} ms "
              f"{rate:8.0f} GFLOP/s (frame-padded)", flush=True)


if __name__ == "__main__":
    main()
