"""Full-size train-step throughput on the attached TPU.

Times the jitted diffusion train step at the reference's per-GPU batch
(bs=3, 224x400, ref:configs/exp/224x400.yaml + runner/8gpus.yaml) with the
production memory policy: per-block gradient remat + bf16 frozen partition.
Zero params materialized on device (timing is data-independent on the MXU)
skip host init and the multi-GB tunnel transfer.

Usage: python tools/bench_train.py [batch] [remat_policy]
  remat_policy: full (default) | attn (keep attention outputs resident,
  recompute convs/norms/FF only) | dots (keep all matmul outputs) | none
  (no remat — OOMs at bs3, fits smaller batches)
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/magicdrive_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    from magicdrive_tpu.config.presets import (
        sd15mv_rawbox_224x400, init_params)
    from magicdrive_tpu.data.collate import CollateConfig, collate_fn
    from magicdrive_tpu.data.fixtures import make_dataset
    from magicdrive_tpu.train.train_step import make_train_step
    from magicdrive_tpu.train.state import create_train_state, TrainConfig

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    policy = sys.argv[2] if len(sys.argv) > 2 else "full"

    preset = sd15mv_rawbox_224x400()
    preset = dataclasses.replace(
        preset,
        unet=dataclasses.replace(
            preset.unet, gradient_checkpointing=policy != "none",
            remat_policy=None if policy in ("full", "none") else policy))
    print(f"batch={B} remat_policy={policy}", flush=True)
    modules = preset.modules(dtype=jnp.bfloat16)
    tcfg = TrainConfig()

    # zero state, frozen partition bf16, materialized directly on device
    state_shapes = jax.eval_shape(lambda: create_train_state(
        init_params(preset, modules, jax.random.PRNGKey(0)), tcfg,
        frozen_dtype=jnp.bfloat16))
    state = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), state_shapes))()

    ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                         canvas_hw=preset.image_size, is_train=True)
    batch = {k: jnp.asarray(v) for k, v in
             collate_fn(make_dataset(B), ccfg).items()}

    step = jax.jit(make_train_step(modules, tcfg), donate_argnums=0)

    def sync(s):
        return np.asarray(jax.tree.leaves(s.trainable)[0].ravel()[:2])

    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    sync(state)
    print(f"compile+first step: {time.time() - t0:.1f}s", flush=True)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.fold_in(
            jax.random.PRNGKey(2), i))
        sync(state)  # sync every step: pipelined donated states hold 2x HBM
    dt = (time.perf_counter() - t0) / iters
    print(f"B={B} 224x400: {dt * 1e3:.1f} ms/step = {1 / dt:.2f} steps/s "
          f"= {B / dt:.2f} samples/s/chip", flush=True)


if __name__ == "__main__":
    main()
