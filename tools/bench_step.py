"""One full denoise step (cn + unet + CFG + UniPC update) as its own jitted
function with params as runtime ARGUMENTS — the honest per-step cost of the
pipeline (the components bench bakes zeros-params as executable constants
and pipelines its timing iterations, which measured ~13% optimistic).

20 x this step + VAE decode reproduces the headline bench within ~2%
(PERFORMANCE.md round 2). Usage: python tools/bench_step.py
"""
import sys, os, time
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
if os.path.isdir("/root/.axon_site"): sys.path.append("/root/.axon_site")
import numpy as np
import jax, jax.numpy as jnp
from einops import rearrange, repeat

jax.config.update("jax_compilation_cache_dir", "/tmp/magicdrive_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from magicdrive_tpu.config.presets import sd15mv_rawbox_224x400, init_params
from magicdrive_tpu.pipeline.pipeline import MagicDrivePipeline
from magicdrive_tpu.data.collate import CollateConfig, collate_fn
from magicdrive_tpu.data.fixtures import make_dataset
from magicdrive_tpu.utils.params import cast_floating
from magicdrive_tpu.diffusion.samplers import make_sampler_coeffs

B, N = 4, 6
preset = sd15mv_rawbox_224x400()
modules = preset.modules(dtype=jnp.bfloat16)
with jax.default_device(jax.devices("cpu")[0]):
    params = cast_floating(init_params(preset, modules, jax.random.PRNGKey(0)),
                           jnp.bfloat16)
params = jax.device_put(params, jax.devices()[0])
pipe = MagicDrivePipeline(modules, params, preset.pipeline)
m, cfg = pipe.m, pipe.cfg
coeffs = make_sampler_coeffs(modules.schedule, 20, "unipc")

ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                     canvas_hw=preset.image_size, is_train=False)
batch = {k: jnp.asarray(v) for k, v in collate_fn(make_dataset(B), ccfg).items()}
batch.pop("pixel_values", None)

# loop-invariant conditioning (host-side mirror of _generate_fn's prelude)
cn_vars = params["controlnet"]
from magicdrive_tpu.models.controlnet import BEVControlNet

@jax.jit
def prelude(params, batch):
    text, _ = m.clip.apply(params["clip"], batch["input_ids"])
    uncond_text, _ = m.clip.apply(params["clip"], batch["uncond_ids"])
    cnv = params["controlnet"]
    bev = batch["bev_map"]
    tokens_c = m.controlnet.apply(cnv, batch["camera_param"], text,
                                  batch["bboxes"], batch["classes"],
                                  batch["masks"],
                                  method=BEVControlNet.assemble_tokens)
    uncond_cam = cnv["params"]["uncond_cam"].reshape(
        m.controlnet.cfg.uncond_cam_in_dim)
    camera2 = jnp.concatenate([
        jnp.broadcast_to(uncond_cam[None, None], batch["camera_param"].shape),
        batch["camera_param"]])
    text2 = jnp.concatenate([
        jnp.broadcast_to(uncond_text, (B, *uncond_text.shape[1:])), text])
    bboxes2 = jnp.concatenate([jnp.zeros_like(batch["bboxes"]), batch["bboxes"]])
    classes2 = jnp.concatenate([jnp.zeros_like(batch["classes"]), batch["classes"]])
    masks2 = jnp.concatenate([jnp.zeros_like(batch["masks"]), batch["masks"]])
    map2 = jnp.concatenate([bev, bev])
    tokens_u = m.controlnet.apply(cnv, camera2[:B], text2[:B], bboxes2[:B],
                                  classes2[:B], masks2[:B],
                                  method=BEVControlNet.assemble_tokens)
    tokens2 = jnp.concatenate([tokens_u, tokens_c])
    cond_feat2 = m.controlnet.apply(cnv, map2, method=BEVControlNet.embed_map)
    return camera2, text2, map2, bboxes2, classes2, masks2, tokens2, cond_feat2

inv = prelude(params, batch)
np.asarray(jax.tree.leaves(inv)[0].ravel()[:2])
print("prelude ready", flush=True)

x0 = jnp.zeros((B, N, 28, 50, 4), jnp.float32)
state0 = coeffs.init_state(x0.shape, jnp.float32)
timesteps = jnp.asarray(coeffs.timesteps)

def one_step(params, x, state, inv, i):
    camera2, text2, map2, bboxes2, classes2, masks2, tokens2, cond_feat2 = inv
    t = timesteps[i]
    lat2 = jnp.concatenate([x, x]).astype(cfg.dtype)
    t2 = jnp.broadcast_to(t[None], (2 * B,))
    down_res, mid_res, _ = m.controlnet.apply(
        params["controlnet"], lat2, t2, camera2, text2, map2, bboxes2,
        classes2, masks2, conditioning_scale=1.0,
        tokens=tokens2, cond_feat=cond_feat2)
    eps = m.unet.apply(
        params["unet"], rearrange(lat2, "b n h w c -> (b n) h w c"),
        repeat(t2, "b -> (b n)", n=N),
        rearrange(tokens2, "b n l c -> (b n) l c"),
        down_block_additional_residuals=down_res,
        mid_block_additional_residual=mid_res)
    eps = rearrange(eps, "(b n) h w c -> b n h w c", n=N)
    eps_u, eps_c = jnp.split(eps, 2)
    eps = eps_u + cfg.guidance_scale * (eps_c - eps_u)
    x, state = coeffs.step(i, x, eps, state)
    return x, state

def timeit(jf, args, name, iters=10):
    out = jf(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:2])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.2f} ms/call", flush=True)

# params as runtime arguments (pipeline-like)
f_arg = jax.jit(one_step)
timeit(f_arg, (params, x0, state0, inv, 5), "step, params as arguments")

# NOTE: do NOT jit with params captured as constants - the >2GB constant
# payload crashed the tunnel's remote-compile service (verify SKILL.md).
