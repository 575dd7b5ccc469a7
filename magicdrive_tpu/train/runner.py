"""Training runtime: the TPU-native re-design of the reference runner stack
(ref:magicdrive/runner/base_runner.py BaseRunner.run/_train_one_stop +
ref:magicdrive/runner/multiview_runner.py MultiviewRunner).

Differences by design (SURVEY.md §7.1):
* one jitted, mesh-sharded train step (grads all-reduced by XLA from the
  sharding) replaces accelerate DDP + ControlnetUnetWrapper;
* orbax async checkpointing with automatic latest-resume replaces
  accelerator.save_state + dir-name parsing (ref:base_runner.py:275-314);
* bf16 compute over fp32 params replaces the fp16 autocast gymnastics
  (ref:multiview_runner.py:191-217);
* explicit PRNG key chain: reproducible regardless of host count.

Observability: scalar metrics to JSONL + optional tensorboard
(ref:base_runner.py:365-369); validation image grids like
ref:base_validator.py:160-180.
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from magicdrive_tpu.data.collate import CollateConfig
from magicdrive_tpu.data.loader import DataLoader
from magicdrive_tpu.parallel.mesh import make_mesh, replicated
from magicdrive_tpu.pipeline.pipeline import MagicDrivePipeline
from .state import TrainConfig, TrainState, create_train_state
from .train_step import make_train_step

log = logging.getLogger(__name__)


def train_config_from_cfg(rc) -> TrainConfig:
    """runner-group YAML -> TrainConfig."""
    return TrainConfig(
        learning_rate=rc["learning_rate"], adam_beta1=rc["adam_beta1"],
        adam_beta2=rc["adam_beta2"], adam_weight_decay=rc["adam_weight_decay"],
        adam_epsilon=rc["adam_epsilon"], max_grad_norm=rc["max_grad_norm"],
        lr_warmup_steps=rc["lr_warmup_steps"], lr_schedule=rc["lr_schedule"],
        max_train_steps=rc["max_train_steps"] or 100000,
        gradient_accumulation_steps=rc["gradient_accumulation_steps"],
        prediction_type=rc["prediction_type"],
        train_with_same_t=rc["train_with_same_t"],
        train_with_same_noise=rc["train_with_same_noise"],
        noise_offset=rc["noise_offset"],
        use_8bit_adam=bool(rc.get("use_8bit_adam", False)),
        frames_per_clip=rc.get("frames_per_clip"))


class CheckpointManager:
    """Orbax-backed trainer-state checkpoints with latest-resume + retention
    (SURVEY.md §5.4: the upgrade over accelerate save_state)."""

    def __init__(self, ckpt_dir: str, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.mngr = ocp.CheckpointManager(
            os.path.abspath(ckpt_dir),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True))

    def save(self, step: int, state: TrainState) -> None:
        payload = {"trainable": state.trainable, "frozen": state.frozen,
                   "opt_state": state.opt_state,
                   "step": np.asarray(state.step)}
        self.mngr.save(step, args=self._ocp.args.StandardSave(payload))

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, state: TrainState,
                step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self.mngr.latest_step()
        template = {"trainable": state.trainable, "frozen": state.frozen,
                    "opt_state": state.opt_state,
                    "step": np.asarray(state.step)}
        restored = self.mngr.restore(
            step, args=self._ocp.args.StandardRestore(template))
        return state.replace(
            step=jnp.asarray(restored["step"]),
            trainable=restored["trainable"], frozen=restored["frozen"],
            opt_state=restored["opt_state"])

    def wait(self):
        self.mngr.wait_until_finished()


class MetricsLogger:
    """JSONL scalars + optional tensorboard (torch SummaryWriter)."""

    def __init__(self, run_dir: str, use_tensorboard: bool = True):
        os.makedirs(run_dir, exist_ok=True)
        self.f = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(os.path.join(run_dir, "tb"))
            except Exception:
                pass

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": int(step), **{k: float(v) for k, v in scalars.items()}}
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()
        if self.tb:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), int(step))

    def log_images(self, step: int, tag: str, grid: np.ndarray) -> None:
        """grid: (H, W, 3) in [0, 1]."""
        if self.tb:
            self.tb.add_image(tag, grid, int(step), dataformats="HWC")

    def close(self):
        self.f.close()
        if self.tb:
            self.tb.close()


class Validator:
    """Periodic in-training generation on fixed val indices
    (ref:magicdrive/runner/base_validator.py:55-204)."""

    def __init__(self, modules, preset, val_dataset, ccfg: CollateConfig,
                 indices, times: int = 1, pipeline_cfg=None):
        from magicdrive_tpu.data.collate import collate_fn

        self._collate = collate_fn
        self.modules = modules
        self.preset = preset
        self.dataset = val_dataset
        self.ccfg = dataclasses.replace(ccfg, is_train=False)
        self.indices = [i for i in indices if i < len(val_dataset)]
        self.times = times
        self.pipeline_cfg = pipeline_cfg or preset.pipeline
        # One pipeline for the life of the run: params are an argument of
        # the jitted generate fn, so periodic validation swaps them in
        # WITHOUT recompiling (the flagship pipeline compile is ~25 min on
        # TPU; a fresh jit cache per validation would be unusable —
        # ref behavior: base_validator.py:55-204 rebuilds the torch pipe,
        # which is cheap there but not under XLA).
        self.pipe = MagicDrivePipeline(self.modules, None, self.pipeline_cfg)

    def validate(self, params, logger: MetricsLogger, step: int,
                 run_dir: Optional[str] = None) -> None:
        if not self.indices:
            return
        pipe = self.pipe
        pipe.params = params
        samples = [self.dataset[i] for i in self.indices]
        batch = self._collate(samples, self.ccfg)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        gt = batch.pop("pixel_values", None)
        for rep in range(self.times):
            imgs = np.asarray(pipe(batch, key=jax.random.PRNGKey(1000 + rep)))
            for b in range(imgs.shape[0]):
                grid = np.concatenate(list(imgs[b]), axis=1)  # 6 views wide
                if gt is not None:
                    gt_row = np.concatenate(
                        list(np.asarray(gt[b]) / 2 + 0.5), axis=1)
                    grid = np.concatenate([gt_row, grid], axis=0)
                logger.log_images(step, f"val/{self.indices[b]}_{rep}", grid)
                if run_dir is not None:
                    from PIL import Image

                    out = os.path.join(run_dir, "val_images")
                    os.makedirs(out, exist_ok=True)
                    Image.fromarray(
                        (np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(
                        os.path.join(
                            out,
                            f"step{step}_idx{self.indices[b]}_{rep}.png"))


class Runner:
    """End-to-end training driver (ref BaseRunner.run, base_runner.py:253-389).

    Usage::

        runner = Runner(cfg, preset, modules, train_ds, val_ds, run_dir)
        runner.run()
    """

    def __init__(self, cfg, preset, modules, train_dataset,
                 val_dataset=None, run_dir: str = "runs/dev",
                 tokenizer=None):
        rc = cfg["runner"]
        self.cfg = cfg
        self.rc = rc
        self.preset = preset
        self.modules = modules
        self.run_dir = run_dir
        self.tcfg = train_config_from_cfg(rc)
        # backward schedule knob (trace-time env; PERFORMANCE.md round 5c):
        # image configs default serial (+22% steps/s), video configs MUST
        # run free (the serialization pins operands across the remat
        # boundary — +7 GiB at the 60-frame t-shard). Explicit env wins.
        if (rc.get("pair_bwd") and "MAGICDRIVE_PAIR_BWD" not in os.environ
                and not (self.tcfg.frames_per_clip or 0) > 1):
            os.environ["MAGICDRIVE_PAIR_BWD"] = str(rc["pair_bwd"])

        pc = cfg.get("parallel", {})
        shape = pc.get("mesh_shape")
        self.mesh = make_mesh(tuple(shape) if shape else None,
                              tuple(pc.get("axis_names", ("dp", "view"))))
        self.dp = self.mesh.shape["dp"]

        self.ccfg = CollateConfig(
            template=cfg["dataset"]["template"],
            bbox_mode=cfg["model"]["bbox_mode"],
            bbox_max_len=rc["bbox_max_length"],
            bbox_view_shared=cfg["model"]["bbox_view_shared"],
            canvas_hw=tuple(cfg["dataset"]["image_size"]),
            bbox_drop_ratio=rc["bbox_drop_ratio"],
            bbox_add_ratio=rc["bbox_add_ratio"],
            bbox_add_num=rc["bbox_add_num"])
        self.loader = DataLoader(
            train_dataset, batch_size=rc["train_batch_size"] * self.dp,
            cfg=self.ccfg, shuffle=True, seed=cfg.get("seed", 42),
            num_workers=rc["num_workers"], tokenizer=tokenizer)
        self.validator = None
        if val_dataset is not None:
            self.validator = Validator(
                modules, preset, val_dataset, self.ccfg,
                rc["validation_index"], rc["validation_times"],
                pipeline_cfg=preset.pipeline)

        self.ckpt = CheckpointManager(
            os.path.join(run_dir, "checkpoints"),
            max_to_keep=rc.get("checkpoints_total_limit") or 5)
        self.logger = MetricsLogger(run_dir)

    # ------------------------------------------------------------------
    def init_state(self, key: Optional[jax.Array] = None,
                   params: Optional[Dict[str, Any]] = None) -> TrainState:
        from magicdrive_tpu.config.presets import init_params

        key = key if key is not None else jax.random.PRNGKey(
            self.cfg.get("seed", 42))
        frozen_dtype = jnp.bfloat16 \
            if self.rc.get("mixed_precision") == "bf16" else None
        # build on host so the accelerator never holds both the fp32
        # originals and the state copies at once
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            if params is None:
                params = init_params(self.preset, self.modules, key)
            state = create_train_state(params, self.tcfg,
                                       frozen_dtype=frozen_dtype)
        del params
        return jax.device_put(state, replicated(self.mesh))

    def shard_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        out = {}
        for k, v in batch.items():
            if k == "uncond_ids":
                out[k] = jax.device_put(jnp.asarray(v), replicated(self.mesh))
            else:
                out[k] = jax.device_put(jnp.asarray(v),
                                        NamedSharding(self.mesh, P("dp")))
        return out

    def run(self, state: Optional[TrainState] = None,
            resume: bool = True) -> TrainState:
        rc = self.rc
        state = state if state is not None else self.init_state()
        resume_path = self.cfg.get("resume_from_checkpoint")
        own_ckpts = os.path.abspath(os.path.join(self.run_dir, "checkpoints"))
        if resume and isinstance(resume_path, str) and \
                os.path.isdir(resume_path) and \
                os.path.abspath(resume_path) != own_ckpts:
            # warm-start from another run's checkpoint dir
            # (ref:base_runner.py:275-284 resume_from_checkpoint path)
            src = CheckpointManager(resume_path)
            state = src.restore(state)
            log.info("resumed from external %s step %d", resume_path,
                     int(state.step))
        elif resume and self.ckpt.latest_step() is not None:
            state = self.ckpt.restore(state)
            log.info("resumed from step %d", int(state.step))
            if self.cfg.get("resume_reset_scheduler"):
                from .state import reset_lr_schedule

                state = reset_lr_schedule(state)
                log.info("LR schedule progress reset")

        step_fn = jax.jit(make_train_step(self.modules, self.tcfg),
                          donate_argnums=(0,))
        key = jax.random.PRNGKey(self.cfg.get("seed", 42) + 1)
        max_steps = self.tcfg.max_train_steps
        step = int(state.step)
        t_last = time.perf_counter()
        samples_per_step = self.loader.batch_size

        if rc.get("validation_before_run") and self.validator:
            self.validator.validate(state.params, self.logger, step,
                                    self.run_dir)

        # optional profiler window (SURVEY.md §5.1): +runner.profile_steps=[a,b]
        profile_window = rc.get("profile_steps") or None
        done = False
        # Deferred metrics fetch (round 5g): blocking on float(loss) right
        # after dispatch stalls the chip for a host round-trip EVERY step
        # (the round-5 train-step profile measured the sync gap at ~120 ms
        # of a 536 ms step through the tunnel). Instead, fetch step i-1's
        # loss AFTER dispatching step i — its buffer is already (or about
        # to be) materialized, so the fetch overlaps device execution of
        # step i and the device pipeline never drains. The NaN guard
        # (ref:base_runner.py:344) fires one step late, which still halts
        # training immediately after the first bad update.
        prev = None  # (step, metrics, epoch) of the not-yet-checked step

        def check(entry):
            p_step, p_metrics, p_epoch = entry
            loss = float(p_metrics["loss"])
            if not np.isfinite(loss):
                raise RuntimeError(f"NaN/inf loss at step {p_step}")
            if p_step % 10 == 0 or p_step <= 3:
                nonlocal t_last
                dt = time.perf_counter() - t_last
                n = 10 if p_step % 10 == 0 else 1
                self.logger.log(p_step, {
                    "loss": loss,
                    "steps_per_sec": n / dt,
                    "samples_per_sec": n * samples_per_step / dt,
                    "epoch": p_epoch})
                t_last = time.perf_counter()

        for epoch in range(rc["num_train_epochs"]):
            if done:
                break
            for batch in self.loader:
                if profile_window and step == profile_window[0]:
                    jax.profiler.start_trace(
                        os.path.join(self.run_dir, "profile"))
                batch = self.shard_batch(batch)
                state, metrics = step_fn(state, batch,
                                         jax.random.fold_in(key, step))
                step += 1
                if profile_window and step == profile_window[1]:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                if prev is not None:
                    check(prev)
                prev = (step, metrics, epoch)
                at_ckpt = step % rc["checkpointing_steps"] == 0
                at_val = (self.validator
                          and step % rc["validation_steps"] == 0)
                if at_ckpt or at_val:
                    # drain the pending check BEFORE persisting/validating:
                    # the deferred guard must never let a NaN state become
                    # the latest checkpoint (the old blocking guard's
                    # property; the sync cost is paid only at checkpoint
                    # cadence)
                    check(prev)
                    prev = None
                if at_ckpt:
                    self.ckpt.save(step, state)
                if at_val:
                    self.validator.validate(state.params, self.logger, step,
                                            self.run_dir)
                if step >= max_steps:
                    done = True
                    break
        if prev is not None:
            check(prev)
        self.ckpt.save(step, state)
        self.ckpt.wait()
        self.save_deployable(state)
        return state

    def save_deployable(self, state: TrainState) -> None:
        """End-of-training weight export, the counterpart of diffusers
        save_pretrained dirs (ref:multiview_runner.py:233-242)."""
        from magicdrive_tpu.utils.serialization import save_params

        save_params(state.params, os.path.join(self.run_dir, "weights"))
