#!/usr/bin/env python
"""Convert released torch checkpoints into this framework's weight format.

    # Stable Diffusion v1.5 (diffusers layout: unet/ vae/ text_encoder/)
    python tools/convert_weights.py sd15 --src /path/to/sd15 --out weights/sd15

    # MagicDrive release (controlnet/ + unet/ dirs from save_pretrained)
    python tools/convert_weights.py magicdrive --src /path/to/ckpt \
        --sd15 weights/sd15 --out weights/magicdrive-224x400

Covers SURVEY.md §7.4 #2 (conversion fidelity): every tensor is mapped
explicitly; unconsumed keys abort unless --allow-missing.
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["sd15", "magicdrive"])
    p.add_argument("--src", required=True)
    p.add_argument("--sd15", default=None,
                   help="converted SD-v1.5 dir (for frozen vae/clip reuse)")
    p.add_argument("--out", required=True)
    p.add_argument("--image_size", type=int, nargs=2, default=(224, 400))
    p.add_argument("--arch", choices=["auto", "small-test"], default="auto",
                   help="'small-test' = narrow full-depth architecture for "
                        "the converter self-test (tests/test_convert_cli.py)")
    p.add_argument("--allow-missing", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from magicdrive_tpu.config.presets import (
        init_params, sd15mv_rawbox_224x400, sd15mv_rawbox_272x736,
        small_parity,
    )
    from magicdrive_tpu.convert.torch_weights import (
        convert_clip, convert_module, find_weights_file,
        load_torch_state_dict, normalize_vae_attention_keys,
    )
    from magicdrive_tpu.utils.serialization import load_params, save_params

    if args.arch == "small-test":
        preset = small_parity()
    elif tuple(args.image_size) == (224, 400):
        preset = sd15mv_rawbox_224x400()
    else:
        preset = sd15mv_rawbox_272x736()
    modules = preset.modules(dtype=jnp.float32)
    params = init_params(preset, modules, jax.random.PRNGKey(0))
    strict = not args.allow_missing

    if args.mode == "sd15":
        unet_sd = load_torch_state_dict(
            find_weights_file(os.path.join(args.src, "unet")))
        vae_sd = normalize_vae_attention_keys(load_torch_state_dict(
            find_weights_file(os.path.join(args.src, "vae"))))
        clip_sd = load_torch_state_dict(
            find_weights_file(os.path.join(args.src, "text_encoder")))
        params["unet"], miss = convert_module(params["unet"], unet_sd,
                                              strict=False)
        # the multiview additions (norm4/attn4/connector) stay at init
        real_miss = [m for m in miss
                     if not any(s in m for s in
                                ("norm4", "attn4", "connector"))]
        if strict and real_miss:
            raise SystemExit(f"unet conversion missing: {real_miss[:8]}")
        params["vae"], _ = convert_module(params["vae"], vae_sd,
                                          strict=strict)
        params["clip"] = convert_clip(params["clip"], clip_sd, strict=strict)
    else:
        if args.sd15:
            base = load_params(os.path.join(args.sd15, "params.npz")
                               and args.sd15)
            params["vae"], params["clip"] = base["vae"], base["clip"]
        cn_sd = load_torch_state_dict(
            find_weights_file(os.path.join(args.src, "controlnet")))
        unet_sd = load_torch_state_dict(
            find_weights_file(os.path.join(args.src, "unet")))
        params["controlnet"], _ = convert_module(params["controlnet"], cn_sd,
                                                 strict=strict)
        params["unet"], _ = convert_module(params["unet"], unet_sd,
                                           strict=strict)

    save_params(params, args.out)
    print(f"converted -> {args.out}")


if __name__ == "__main__":
    main()
