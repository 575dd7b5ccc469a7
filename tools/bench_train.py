"""Full-size train-step throughput on the attached TPU, graded vs A800.

Times the jitted diffusion train step at the reference's per-GPU batch
(bs=3, 224x400, ref:configs/exp/224x400.yaml + runner/8gpus.yaml) with the
production memory policy: per-block gradient remat + bf16 frozen partition.
Zero params materialized on device (timing is data-independent on the MXU)
skip host init and the multi-GB tunnel transfer.

Baseline (VERDICT r4 weak #2): derived with the same method as bench.py's
0.27 f/s inference estimate — FLOPs/step from XLA's own cost analysis of
our step (forward + backward + remat recompute; the torch reference also
trains with per-block gradient checkpointing, ref:unet_2d_condition_
multiview.py:273-292, so the recompute FLOPs are comparable), divided by
A800 312 TFLOP/s fp16 at 15-25% torch MFU. vs_baseline uses the 20%
midpoint; the JSON carries the full range.

Usage: python tools/bench_train.py [batch] [remat_policy] [--json]
       python tools/bench_train.py --matrix   # policy x pair_bwd sweep
       python tools/bench_train.py 4 dots serial --scan  # lax.scan(8) —
         device-sustained steps/s with zero per-step host dispatch (what a
         colocated host sees; the tunnel adds ~100+ ms/step of dispatch
         the production TPU host does not pay)
  remat_policy: full (default 'dots' for matrix) | attn | dots | none
MAGICDRIVE_BENCH_SYNC: host-sync cadence for the per-step loop
(default 10; 1 reproduces the pre-round-5g blocking loop).
"""
from __future__ import annotations

import dataclasses
import json
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

A800_PEAK = 312e12          # fp16 dense
TORCH_MFU = (0.15, 0.20, 0.25)   # low / mid / high; mid is the verdict
V5E_PEAK = 197e12           # bf16


def build_step(B: int, policy: str, pair_bwd: str, scan_len: int = 0):
    from magicdrive_tpu.config.presets import (
        sd15mv_rawbox_224x400, init_params)
    from magicdrive_tpu.data.collate import CollateConfig, collate_fn
    from magicdrive_tpu.data.fixtures import make_dataset
    from magicdrive_tpu.train.train_step import make_train_step
    from magicdrive_tpu.train.state import create_train_state, TrainConfig

    os.environ["MAGICDRIVE_PAIR_BWD"] = pair_bwd
    pname = os.environ.get("MAGICDRIVE_BENCH_PRESET", "224x400")
    if pname == "424x800":
        from magicdrive_tpu.config.presets import sd15mv_rawbox_424x800
        preset = sd15mv_rawbox_424x800()
    elif pname == "272x736":
        from magicdrive_tpu.config.presets import sd15mv_rawbox_272x736
        preset = sd15mv_rawbox_272x736()
    else:
        preset = sd15mv_rawbox_224x400()
    preset = dataclasses.replace(
        preset,
        unet=dataclasses.replace(
            preset.unet, gradient_checkpointing=policy != "none",
            remat_policy=None if policy in ("full", "none") else policy))
    modules = preset.modules(dtype=jnp.bfloat16)
    tcfg = TrainConfig()

    state_shapes = jax.eval_shape(lambda: create_train_state(
        init_params(preset, modules, jax.random.PRNGKey(0)), tcfg,
        frozen_dtype=jnp.bfloat16))
    state = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), state_shapes))()

    ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                         canvas_hw=preset.image_size, is_train=True)
    batch = {k: jnp.asarray(v) for k, v in
             collate_fn(make_dataset(B, image_hw=preset.image_size,
                                     map_hw=preset.map_hw), ccfg).items()}
    # fresh function object per config: jit's trace cache would otherwise
    # reuse the previous config's executable (same trick as bench_matrix)
    raw = make_train_step(modules, tcfg)
    if scan_len:
        def scanned(s, b, keys):
            def body(carry, k):
                ns, m = raw(carry, b, k)
                return ns, m["loss"]
            return jax.lax.scan(body, s, keys)

        step = jax.jit(scanned, donate_argnums=0)
    else:
        step = jax.jit(lambda s, b, r: raw(s, b, r), donate_argnums=0)
    return step, state, batch


def step_flops(step, state, batch) -> float:
    """XLA cost analysis of the optimized step (includes remat recompute)."""
    try:
        compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)
        return 0.0


def measure(B: int, policy: str, pair_bwd: str = "free", iters: int = 10,
            sync_every: int | None = None):
    """sync_every: host-sync cadence. 1 = block on every step (the
    pre-round-5f behavior); k > 1 lets the host run k steps ahead so
    device execution pipelines across the tunnel RTT (the Runner's
    deferred NaN guard does the same in production). Default: the
    MAGICDRIVE_BENCH_SYNC env or 10 (= one sync per measurement window;
    donated state buffers chain through the queued executions without
    duplicating HBM — chip-validated at bs=4/dots/serial, round 5g)."""
    if sync_every is None:
        sync_every = int(os.environ.get("MAGICDRIVE_BENCH_SYNC", "10"))
    step, state, batch = build_step(B, policy, pair_bwd)
    flops = step_flops(step, state, batch)

    def sync(s):
        return np.asarray(jax.tree.leaves(s.trainable)[0].ravel()[:2])

    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    sync(state)
    print(f"# compile+first step: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.fold_in(
            jax.random.PRNGKey(2), i))
        if (i + 1) % sync_every == 0:
            sync(state)
    sync(state)
    dt = (time.perf_counter() - t0) / iters
    return dt, flops


def measure_scan(B: int, policy: str, pair_bwd: str = "serial",
                 K: int = 8, reps: int = 2):
    """Device-sustained ms/step: K train steps inside one lax.scan, so the
    host dispatches ONCE per K steps — isolates device throughput from the
    tunnel's per-dispatch latency (a colocated production host pays
    neither)."""
    # per-step FLOPs from the SINGLE-step program (XLA's cost analysis
    # reports a scan body once, not times the trip count); built and freed
    # before the scan state materializes so HBM holds one state at a time
    step1, state1, batch1 = build_step(B, policy, pair_bwd)
    flops = step_flops(step1, state1, batch1)
    del step1, state1, batch1

    step, state, batch = build_step(B, policy, pair_bwd, scan_len=K)

    def sync(s):
        return np.asarray(jax.tree.leaves(s.trainable)[0].ravel()[:2])

    keys = jax.random.split(jax.random.PRNGKey(2), K)

    t0 = time.time()
    state, losses = step(state, batch, keys)
    sync(state)
    print(f"# compile+first scan({K}): {time.time() - t0:.1f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(reps):
        state, losses = step(state, batch, keys)
        sync(state)
    dt = (time.perf_counter() - t0) / (reps * K)
    return dt, flops


def report(B, policy, pair_bwd, dt, flops, as_json):
    samples = B / dt
    mfu = flops / dt / V5E_PEAK if flops else None
    # A800 estimate at the same per-GPU batch
    base = [flops / (A800_PEAK * m) for m in TORCH_MFU] if flops else None
    row = {
        "metric": "train_samples_per_s_per_chip", "value": round(samples, 3),
        "unit": "samples/s/chip",
        "steps_per_s": round(1 / dt, 3), "ms_per_step": round(dt * 1e3, 1),
        "batch": B, "remat_policy": policy, "pair_bwd": pair_bwd,
        "flops_per_step": flops, "mfu_v5e": round(mfu, 3) if mfu else None,
    }
    if base:
        a800_mid = B / base[1]
        row["vs_baseline"] = round(samples / a800_mid, 2)
        row["baseline_a800_samples_per_s"] = {
            "mfu_15pct": round(B / base[0], 2),
            "mfu_20pct": round(B / base[1], 2),
            "mfu_25pct": round(B / base[2], 2)}
    if as_json:
        print(json.dumps(row))
    else:
        print(f"B={B} policy={policy} pair_bwd={pair_bwd}: "
              f"{dt * 1e3:.1f} ms/step = {1 / dt:.2f} steps/s = "
              f"{samples:.2f} samples/s/chip"
              + (f"  (MFU {mfu * 100:.0f}%, vs A800@20%: "
                 f"{row.get('vs_baseline')}x)" if mfu else ""), flush=True)
    return row


def main():
    as_json = "--json" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--matrix" in sys.argv:
        cfgs = [(3, "dots", "free"), (3, "dots", "serial"),
                (3, "full", "serial"), (2, "none", "serial"),
                (1, "none", "serial"), (4, "dots", "serial")]
        for B, policy, pb in cfgs:
            try:
                dt, fl = measure(B, policy, pb)
                report(B, policy, pb, dt, fl, as_json)
            except Exception as e:
                print(f"B={B} {policy}/{pb}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
        return
    B = int(argv[0]) if argv else 3
    policy = argv[1] if len(argv) > 1 else "dots"
    pair_bwd = argv[2] if len(argv) > 2 else \
        os.environ.get("MAGICDRIVE_PAIR_BWD", "free")
    if "--scan" in sys.argv:
        dt, fl = measure_scan(B, policy, pair_bwd)
    else:
        dt, fl = measure(B, policy, pair_bwd)
    report(B, policy, pair_bwd, dt, fl, as_json)


if __name__ == "__main__":
    main()
