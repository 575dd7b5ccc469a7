"""60-frame video model: SPMD compile proof + HBM budget (VERDICT r2 item 4).

The released 60-frame MagicDrive-t model (ref:README.MD:33-36) cannot fit a
single chip; the designed path is frame-axis (dp x t) sharding
(SURVEY.md §5.7, tests/test_video_sharding.py). Round 2 only eval_shape-
validated the 60-frame graph — shapes, not SPMD lowering. This tool does the
real thing on a virtual CPU mesh:

  * builds the FULL-SHAPE model (224x400, F=60, 6 views, bf16 frozen
    partition — exactly the on-chip train configuration),
  * jits the training step and the 20-step sampler over a (dp=1, t=T) mesh
    with the batch's (clip*frame) axis sharded over t,
  * compiles both (XLA SPMD partitioning + buffer assignment run for real),
  * prints each executable's per-device memory analysis -> the HBM budget.

T defaults to 6 (60 frames divide as 10/device; a v5e host has 4 or 8 chips
but the t axis only needs to divide F — t=4 with 15 frames/device also
compiles, pass --t 4). Compile-only: nothing executes, so the numbers are
XLA's buffer assignment, not a run.

Usage: python tools/budget_video60.py [--t 6] [--frames 60] [--train-only]
       [--optimize]  (full XLA optimization; default skips the expensive
                      passes — buffer sizes are still assigned either way)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--t", type=int, default=6, help="frame-axis mesh size")
parser.add_argument("--frames", type=int, default=60)
parser.add_argument("--train-only", action="store_true")
parser.add_argument("--sample-only", action="store_true")
parser.add_argument("--optimize", action="store_true",
                    help="full XLA optimization passes (slower compile)")
parser.add_argument(
    "--adam8bit", action="store_true",
    help="use the block-wise 8-bit Adam state (train/adam8bit.py) in the "
    "budget — saves ~6 bytes/trainable-param of optimizer HBM")
parser.add_argument(
    "--device-proxy", action="store_true",
    help="compile the PER-DEVICE subproblem (frames/t frames, unsharded) "
    "on the attached real TPU, compile-only, and print ITS buffer "
    "assignment. The CPU backend's memory_analysis has no buffer-liveness "
    "reuse (optimized and unoptimized compiles report identical totals), "
    "so the virtual-mesh numbers above are allocation sums, not peak HBM; "
    "the real chip's assignment for one t-shard's workload is the honest "
    "per-device budget (the dp x t step adds only the temporal-attention "
    "all-to-alls, whose buffers are activation-sized).")
args = parser.parse_args()

if not args.device_proxy:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") +
        f" --xla_force_host_platform_device_count={args.t}").strip()
elif os.path.isdir("/root/.axon_site"):
    sys.path.append("/root/.axon_site")

import jax

if args.device_proxy:
    jax.config.update("jax_compilation_cache_dir", "/tmp/magicdrive_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
else:
    jax.config.update("jax_platforms", "cpu")
    if not args.optimize:
        jax.config.update("jax_disable_most_optimizations", True)

import dataclasses
import time

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from magicdrive_tpu.config.presets import (init_params, sd15mv_rawbox_224x400)
from magicdrive_tpu.data.collate import CollateConfig, collate_fn
from magicdrive_tpu.data.fixtures import make_dataset
from magicdrive_tpu.parallel.mesh import make_mesh, replicated
from magicdrive_tpu.pipeline.video import VideoPipeline
from magicdrive_tpu.train.state import TrainConfig, create_train_state
from magicdrive_tpu.train.train_step import make_train_step
from magicdrive_tpu.utils.params import cast_floating

GIB = 1024 ** 3


def report(tag, compiled, n_dev):
    ma = compiled.memory_analysis()
    rows = [
        ("arguments (params+opt+batch)", ma.argument_size_in_bytes),
        ("outputs", ma.output_size_in_bytes),
        ("temps (activations/workspace)", ma.temp_size_in_bytes),
        ("aliases (donated, not extra)", ma.alias_size_in_bytes),
    ]
    print(f"\n[{tag}] per-device memory (mesh of {n_dev}):")
    total = 0
    for name, b in rows:
        print(f"  {name:32s} {b / GIB:8.3f} GiB")
        if "alias" not in name:
            total += b
    live = (ma.argument_size_in_bytes + ma.output_size_in_bytes +
            ma.temp_size_in_bytes - ma.alias_size_in_bytes)
    print(f"  {'peak live (args+out+temp-alias)':32s} {live / GIB:8.3f} GiB"
          f"   (v5e HBM: 16 GiB)")
    return live


def device_proxy():
    """Compile the per-device t-shard workload on the real TPU (compile
    only — nothing executes) and print its buffer assignment. F_local
    frames with temporal_frames=F_local; the true F=60 temporal attention
    holds (rows/T, H, 60, 60) fp32 logits per device vs the proxy's
    (rows, H, F_local, F_local) — 6x more at T=6 — so the printed budget
    adds that correction analytically per level."""
    F, T = args.frames, args.t
    FL = F // T
    t0 = time.time()
    base = sd15mv_rawbox_224x400()
    preset = dataclasses.replace(
        base, name=f"video{F}-proxy",
        unet=dataclasses.replace(base.unet, temporal_frames=FL,
                                 gradient_checkpointing=True))
    modules = preset.modules(dtype=jnp.bfloat16)
    B = FL
    ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                         canvas_hw=preset.image_size, is_train=True)
    host = collate_fn(make_dataset(2), ccfg, rng=np.random.default_rng(0))

    def batch_shapes(drop_pixels):
        out = {}
        for k, v in host.items():
            if k == "pixel_values" and drop_pixels:
                continue
            shape = v.shape if k == "uncond_ids" else (B, *v.shape[1:])
            out[k] = jax.ShapeDtypeStruct(shape, v.dtype)
        return out

    params_shapes = jax.eval_shape(
        lambda: init_params(preset, modules, jax.random.PRNGKey(0)))

    if not args.sample_only:
        tcfg = TrainConfig(lr_warmup_steps=1, frames_per_clip=FL,
                           use_8bit_adam=args.adam8bit)
        state_shapes = jax.eval_shape(
            lambda p: create_train_state(p, tcfg, frozen_dtype=jnp.bfloat16),
            params_shapes)
        step = jax.jit(make_train_step(modules, tcfg), donate_argnums=(0,))
        print(f"lowering+compiling train step on "
              f"{jax.devices()[0].platform} (F_local={FL}) ...", flush=True)
        compiled = step.lower(state_shapes, batch_shapes(False),
                              jax.random.PRNGKey(1)).compile()
        print(f"compiled at {time.time()-t0:.0f}s", flush=True)
        report(f"train step t-shard proxy F_local={FL}", compiled, T)

    if not args.train_only:
        t1 = time.time()
        infer_shapes = jax.eval_shape(
            lambda p: cast_floating(p, jnp.bfloat16), params_shapes)
        pcfg = preset.pipeline
        pipe = VideoPipeline(modules, infer_shapes, pcfg, n_frames=FL)
        lat = jax.ShapeDtypeStruct(
            (B, pcfg.n_cam, pcfg.latent_height, pcfg.latent_width, 4),
            jnp.float32)
        print(f"lowering+compiling sampler (F_local={FL}) ...", flush=True)
        compiled = pipe._pipe._generate.lower(
            infer_shapes, lat, batch_shapes(True), None).compile()
        print(f"sampler compiled at {time.time()-t1:.0f}s", flush=True)
        report(f"sampler t-shard proxy F_local={FL}", compiled, T)

    # analytic temporal-logit correction: the F=60 run's per-device
    # temporal attentions hold T x the proxy's logits
    l0 = 28 * 50
    rows = 6 * l0  # one clip's views x level-0 tokens, CFG doubles for infer
    extra = rows / T * 8 * F * F * 4 / GIB
    print(f"\n(correction: true F={F} temporal logits at level-0 are "
          f"~{extra:.2f} GiB/device transient vs the proxy's "
          f"{rows * 8 * FL * FL * 4 / GIB:.2f} — XLA frees them "
          f"block-to-block; deeper levels are 4x/16x smaller)")


def main():
    F = args.frames
    T = args.t
    assert F % T == 0, (F, T)
    if args.device_proxy:
        device_proxy()
        return
    t0 = time.time()

    base = sd15mv_rawbox_224x400()
    preset = dataclasses.replace(
        base, name=f"video{F}-budget",
        unet=dataclasses.replace(base.unet, temporal_frames=F))
    # training uses the production memory policy: per-block remat
    # (tools/bench_train.py) + bf16 frozen partition
    train_preset = dataclasses.replace(
        preset, unet=dataclasses.replace(preset.unet,
                                         gradient_checkpointing=True))
    modules = preset.modules(dtype=jnp.bfloat16)
    train_modules = train_preset.modules(dtype=jnp.bfloat16)

    mesh = make_mesh((1, T), axis_names=("dp", "t"))
    B = F  # one clip; leading axis = (clip*frame)
    ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                         canvas_hw=preset.image_size, is_train=True)
    host = collate_fn(make_dataset(2), ccfg, rng=np.random.default_rng(0))

    def frame_batch(drop_pixels: bool):
        out = {}
        for k, v in host.items():
            if k == "uncond_ids":
                out[k] = jax.ShapeDtypeStruct(
                    v.shape, v.dtype, sharding=replicated(mesh))
                continue
            if k == "pixel_values" and drop_pixels:
                continue
            shape = (B, *v.shape[1:])
            out[k] = jax.ShapeDtypeStruct(
                np.zeros(shape, v.dtype).shape, v.dtype,
                sharding=NamedSharding(mesh, P(("dp", "t"))))
        return out

    # abstract params/state: lower() accepts ShapeDtypeStructs, so the full-
    # size pytrees never materialize on host
    params_shapes = jax.eval_shape(
        lambda: init_params(preset, modules, jax.random.PRNGKey(0)))

    if not args.sample_only:
        tcfg = TrainConfig(lr_warmup_steps=1, frames_per_clip=F,
                           use_8bit_adam=args.adam8bit)
        # production memory policy: trainable fp32 + frozen bf16
        state_shapes = jax.eval_shape(
            lambda p: create_train_state(p, tcfg,
                                         frozen_dtype=jnp.bfloat16),
            params_shapes)
        state_shapes = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                           sharding=replicated(mesh)),
            state_shapes)
        step = jax.jit(make_train_step(train_modules, tcfg),
                       donate_argnums=(0,))
        print(f"lowering train step (F={F}, t={T}) ...", flush=True)
        lowered = step.lower(state_shapes, frame_batch(drop_pixels=False),
                             jax.random.PRNGKey(1))
        print(f"lowered in {time.time()-t0:.0f}s; compiling ...", flush=True)
        compiled = lowered.compile()
        print(f"train step compiled at {time.time()-t0:.0f}s", flush=True)
        report(f"train step F={F} bs=1clip", compiled, T)

    if not args.train_only:
        t1 = time.time()
        pcfg = preset.pipeline  # 20 UniPC steps, CFG
        infer_shapes = jax.eval_shape(
            lambda p: cast_floating(p, jnp.bfloat16), params_shapes)
        pparams = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                           sharding=replicated(mesh)),
            infer_shapes)
        pipe = VideoPipeline(
            modules,
            pparams,
            pcfg,
            n_frames=F)
        lat = jax.ShapeDtypeStruct(
            (B, pcfg.n_cam, pcfg.latent_height, pcfg.latent_width, 4),
            jnp.float32, sharding=NamedSharding(mesh, P(("dp", "t"))))
        print(f"lowering sampler (20 steps, F={F}, t={T}) ...", flush=True)
        # _generate is the pipeline's jitted entry (params, latents, batch, key)
        lowered = pipe._pipe._generate.lower(
            pparams, lat, frame_batch(drop_pixels=True), None)
        print(f"lowered in {time.time()-t1:.0f}s; compiling ...", flush=True)
        compiled = lowered.compile()
        print(f"sampler compiled at {time.time()-t1:.0f}s", flush=True)
        report(f"sampler F={F} 20-step CFG + VAE decode", compiled, T)

    print(f"\ntotal wall {time.time()-t0:.0f}s — 60-frame dp x t graph "
          f"partitions, compiles, and buffer-assigns under SPMD.")


if __name__ == "__main__":
    main()
