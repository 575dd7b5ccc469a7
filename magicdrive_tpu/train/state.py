"""Training state: frozen/trainable partition + optimizer.

Mirrors the reference's trainable set — the whole ControlNet plus only the
new cross-view modules of the UNet (norm4/attn4/connector)
(ref:magicdrive/runner/multiview_runner.py:147-152,
ref:magicdrive/networks/unet_2d_condition_multiview.py:237-271) — expressed
here as a pure path predicate over one flat param tree instead of module
bookkeeping and custom ``train()`` overrides.

Optimizer: AdamW with constant-with-warmup LR
(ref:configs/runner/default.yaml:24-41).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct, traverse_util

UNET_TRAINABLE_SUBMODULES = ("norm4", "attn4", "connector",
                             "norm_temp", "attn_temp", "connector_temp")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 8e-5
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    # int8 block-quantized Adam moments (train/adam8bit.py) — the reference's
    # bitsandbytes AdamW8bit knob (ref:base_runner.py:181-216). With the
    # frozen partition already stored bf16, optimizer state is the next
    # largest training allocation (2x fp32 moments over ~380M trainable
    # params = 3.0 GB -> 0.8 GB quantized).
    use_8bit_adam: bool = False
    max_grad_norm: float = 1.0
    lr_warmup_steps: int = 3000
    lr_schedule: str = "constant_with_warmup"  # | cosine
    max_train_steps: int = 100000
    gradient_accumulation_steps: int = 1
    prediction_type: str = "epsilon"
    train_with_same_t: bool = True
    train_with_same_noise: bool = False
    # video training: batch is (B*frames_per_clip) pre-folded per-frame
    # samples; one timestep per clip (shared across its frames)
    frames_per_clip: Optional[int] = None
    noise_offset: float = 0.0
    drop_cond_ratio: float = 0.25
    drop_cam_num: int = 6
    bbox_view_shared: bool = False


def is_trainable(path: Tuple[str, ...]) -> bool:
    """path over the joint tree {"unet": {...}, "controlnet": {...}, ...}."""
    top = path[0]
    if top == "controlnet":
        return "params" in path  # exclude buffers (class_tokens)
    if top == "unet":
        return any(p in UNET_TRAINABLE_SUBMODULES for p in path)
    return False  # vae / clip frozen


def split_params(params: Dict[str, Any]):
    """-> (trainable, frozen) flat dicts with '/'-joined keys."""
    flat = traverse_util.flatten_dict(params, sep="/")
    trainable = {k: v for k, v in flat.items()
                 if is_trainable(tuple(k.split("/")))}
    frozen = {k: v for k, v in flat.items() if k not in trainable}
    return trainable, frozen


def merge_params(trainable: Dict[str, Any], frozen: Dict[str, Any]):
    return traverse_util.unflatten_dict({**frozen, **trainable}, sep="/")


def make_lr_schedule(cfg: TrainConfig):
    if cfg.lr_schedule == "constant_with_warmup":
        return optax.join_schedules([
            optax.linear_schedule(0.0, cfg.learning_rate, cfg.lr_warmup_steps),
            optax.constant_schedule(cfg.learning_rate),
        ], [cfg.lr_warmup_steps])
    if cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.lr_warmup_steps, cfg.max_train_steps)
    raise ValueError(cfg.lr_schedule)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.use_8bit_adam:
        from magicdrive_tpu.train.adam8bit import adamw_8bit

        adam = adamw_8bit(
            make_lr_schedule(cfg), b1=cfg.adam_beta1, b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon, weight_decay=cfg.adam_weight_decay)
    else:
        adam = optax.adamw(
            make_lr_schedule(cfg), b1=cfg.adam_beta1, b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon, weight_decay=cfg.adam_weight_decay)
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), adam)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    trainable: Dict[str, Any]
    frozen: Dict[str, Any]
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @property
    def params(self):
        return merge_params(self.trainable, self.frozen)

    def apply_gradients(self, grads):
        updates, opt_state = self.tx.update(grads, self.opt_state,
                                            self.trainable)
        trainable = optax.apply_updates(self.trainable, updates)
        return self.replace(step=self.step + 1, trainable=trainable,
                            opt_state=opt_state)


def reset_lr_schedule(state: "TrainState") -> "TrainState":
    """Reset the LR schedule progress while keeping optimizer moments —
    the reference's resume_reset_scheduler, which surgically restores only
    last_epoch/_step_count (ref:magicdrive/runner/utils.py:18-26,
    ref:base_runner.py:301-310). In optax the schedule progress is the
    ScaleByScheduleState count inside the chain."""
    import optax

    def walk(node):
        if isinstance(node, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(
                count=jnp.zeros_like(node.count))
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*[walk(v) for v in node])
        if isinstance(node, (tuple, list)):
            return type(node)(walk(v) for v in node)
        return node

    return state.replace(opt_state=walk(state.opt_state))


def create_train_state(params: Dict[str, Any], cfg: TrainConfig,
                       frozen_dtype=None) -> TrainState:
    """``frozen_dtype=jnp.bfloat16`` stores the frozen partition (SD UNet /
    VAE / CLIP) in bf16 — the reference's frozen-fp16 policy
    (ref:multiview_runner.py:191-217) — halving their HBM footprint; compute
    already runs in the module dtype."""
    trainable, frozen = split_params(params)
    if frozen_dtype is not None:
        frozen = {k: (jnp.asarray(v, frozen_dtype)
                      if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)
                      else v)
                  for k, v in frozen.items()}
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32), trainable=trainable, frozen=frozen,
        opt_state=tx.init(trainable), tx=tx)
