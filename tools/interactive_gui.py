#!/usr/bin/env python
"""Interactive editing GUI (ref:demo/interactive_gui.py).

Scene editing + generation: move/rotate/delete 3D boxes, toggle map
channels, re-generate. The session logic (model load, box editing, one-click
generation) lives in :class:`InteractiveSession` and is fully usable from a
notebook/REPL; the gradio UI wraps it when gradio is installed:

    python tools/interactive_gui.py [--weights W] [--tiny]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
from typing import Optional

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class InteractiveSession:
    """Editable scene state + generation (ref:interactive_gui.py:22-103)."""

    def __init__(self, weights: Optional[str] = None, tiny: bool = False,
                 steps: Optional[int] = None):
        import jax
        import jax.numpy as jnp

        from magicdrive_tpu.config.presets import (
            init_params, sd15mv_rawbox_224x400, tiny_debug,
        )
        from magicdrive_tpu.data.collate import CollateConfig
        from magicdrive_tpu.data.fixtures import make_sample
        from magicdrive_tpu.pipeline.pipeline import MagicDrivePipeline
        from magicdrive_tpu.utils.serialization import load_params

        self.jnp = jnp
        self.jax = jax
        preset = tiny_debug() if tiny else sd15mv_rawbox_224x400()
        if steps:
            preset = dataclasses.replace(
                preset, pipeline=dataclasses.replace(
                    preset.pipeline, num_inference_steps=steps))
        self.preset = preset
        modules = preset.modules(
            dtype=jnp.float32 if tiny else jnp.bfloat16)
        params = load_params(weights) if weights else init_params(
            preset, modules, jax.random.PRNGKey(0))
        self.pipe = MagicDrivePipeline(modules, params, preset.pipeline)
        self.ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                                  canvas_hw=preset.image_size,
                                  is_train=False)
        self.sample = make_sample(0, image_hw=preset.image_size,
                                  map_hw=preset.map_hw,
                                  map_channels=preset.map_channels)

    # ---- box edits ----
    def move_box(self, idx: int, dx: float = 0.0, dy: float = 0.0,
                 dyaw: float = 0.0):
        b = np.asarray(self.sample["boxes"]).copy()
        b[idx, 0] += dx
        b[idx, 1] += dy
        b[idx, 6] += dyaw
        self.sample["boxes"] = b

    def delete_box(self, idx: int):
        keep = np.arange(len(self.sample["boxes"])) != idx
        self.sample["boxes"] = np.asarray(self.sample["boxes"])[keep]
        self.sample["labels"] = np.asarray(self.sample["labels"])[keep]

    def add_box(self, x, y, yaw=0.0, cls=0, dims=(1.9, 4.5, 1.7)):
        b = np.concatenate([np.asarray(self.sample["boxes"]).reshape(-1, 7),
                            [[x, y, -1.5, *dims, yaw]]])
        self.sample["boxes"] = b
        self.sample["labels"] = np.concatenate(
            [np.asarray(self.sample["labels"]), [cls]])

    def set_caption(self, location: str, description: str):
        self.sample["metas"] = {"location": location,
                                "description": description}

    # ---- render ----
    def map_image(self) -> np.ndarray:
        from magicdrive_tpu.data.fixtures import MAP_CLASSES, OBJECT_CLASSES
        from magicdrive_tpu.viz import visualize_map

        return visualize_map(self.sample["bev_map"], MAP_CLASSES,
                             OBJECT_CLASSES)

    def generate(self, seed: int = 42) -> np.ndarray:
        from magicdrive_tpu.data.collate import collate_fn

        batch_np = collate_fn([self.sample], self.ccfg)
        batch = {k: self.jnp.asarray(v) for k, v in batch_np.items()
                 if k != "pixel_values"}
        imgs = self.pipe(batch, key=self.jax.random.PRNGKey(seed))
        return np.asarray(imgs[0])  # (6, H, W, 3)


def launch_gui(session: InteractiveSession):
    try:
        import gradio as gr
    except ImportError:
        raise SystemExit(
            "gradio is not installed in this environment; use "
            "InteractiveSession from a notebook instead "
            "(move_box/add_box/delete_box/generate)")

    from magicdrive_tpu.viz import concat_6_views

    with gr.Blocks(title="MagicDrive-TPU") as ui:
        out = gr.Image(label="6-view generation")
        map_img = gr.Image(label="BEV map")
        seed = gr.Number(value=42, label="seed")
        btn = gr.Button("Generate")

        def run(seed):
            imgs = session.generate(int(seed))
            return concat_6_views(imgs), session.map_image()

        btn.click(run, inputs=[seed], outputs=[out, map_img])
    ui.launch()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--steps", type=int, default=None)
    args = p.parse_args()
    launch_gui(InteractiveSession(args.weights, args.tiny, args.steps))
