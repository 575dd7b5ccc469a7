"""On-chip measurement matrix for the perf knobs (VERDICT r2 items 1-2).

Measures the honest per-step pipeline cost (one full denoise step — CN +
UNet + CFG + UniPC update — as its own jitted function with params as
runtime ARGUMENTS, exactly tools/bench_step.py) under each knob config:

  A  qkv=fused     attn=projected  ff=xla    (HEAD default)
  B  qkv=separate  attn=projected  ff=xla    (pre-0b760d8: the config that
                                              measured 234 ms / 0.854 f/s)
  C  qkv=fused     attn=fused      ff=xla    (projection-fused megakernel)
  D  qkv=fused     attn=projected  ff=fused  (fused GEGLU)
  E  qkv=fused     attn=fused      ff=fused
  A' repeat of A                              (bounds tunnel variance)

plus one VAE-decode timing, so each row reports implied frames/s
(B / (20*step + vae)).

Params/activations are ZEROS materialized directly on device via a jitted
fill — TPU matmul/softmax timing is data-independent and params remain
runtime arguments, so this measures the same program as bench_step.py while
skipping the ~30 min of full-size host-side init the 1-core host pays
(verify SKILL.md notes). The knobs are module globals read at trace time,
so each config re-jits in-process; the persistent compile cache makes
repeat runs cheap.

Usage: python tools/bench_matrix.py [configs...]   (default: A B C D E A)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.path.isdir("/root/.axon_site"):
    sys.path.append("/root/.axon_site")

import numpy as np
import jax
import jax.numpy as jnp
from einops import rearrange, repeat

jax.config.update("jax_compilation_cache_dir", "/tmp/magicdrive_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from magicdrive_tpu.config.presets import (init_params, sd15mv_rawbox_224x400,
                                            sd15mv_rawbox_272x736)
from magicdrive_tpu.diffusion.samplers import make_sampler_coeffs
from magicdrive_tpu.core import attention as attn_mod
import magicdrive_tpu.core.resnet  # noqa: F401  (knob modules importable)

# MAGICDRIVE_BENCH_PRESET=272x736|424x800 measures the hi-res / released
# visualization models (kvstat kernel territory: L=3128 / L=5300 level-0);
# default is the flagship 224x400.
_PRESET_NAME = os.environ.get("MAGICDRIVE_BENCH_PRESET", "224x400")
_HIRES = _PRESET_NAME != "224x400"
B = int(os.environ.get("MAGICDRIVE_BENCH_BATCH", "1" if _HIRES else "4"))
N = 6
if _PRESET_NAME == "424x800":
    from magicdrive_tpu.config.presets import sd15mv_rawbox_424x800

    preset = sd15mv_rawbox_424x800()
elif _PRESET_NAME == "272x736":
    preset = sd15mv_rawbox_272x736()
else:
    preset = sd15mv_rawbox_224x400()
modules = preset.modules(dtype=jnp.bfloat16)
m = modules
pcfg = preset.pipeline
coeffs = make_sampler_coeffs(modules.schedule, 20, "unipc")

CONFIGS = {
    "A": dict(qkv="fused", attn="projected", ff="xla"),
    "B": dict(qkv="separate", attn="projected", ff="xla"),
    "C": dict(qkv="fused", attn="fused", ff="xla"),
    "D": dict(qkv="fused", attn="projected", ff="fused"),
    "E": dict(qkv="fused", attn="fused", ff="fused"),
    # round-3 additions: whole-FF fusion (stage-2 in-kernel), the subpixel
    # upsample-conv decomposition, kv-stationary mode at nq<=2, and the
    # level-1 (L=350) attentions routed to the fused pallas kernel
    "F": dict(qkv="fused", attn="fused", ff="fused2"),
    "G": dict(qkv="fused", attn="fused", ff="fused", upsample="subpixel"),
    "H": dict(qkv="fused", attn="fused", ff="fused2", upsample="subpixel"),
    "K": dict(qkv="fused", attn="fused", ff="fused", mode="kvstat"),
    "P": dict(qkv="fused", attn="fused", ff="fused", min_logits=90_000),
    "V": dict(qkv="fused", attn="fused", ff="fused", cv_pair="pair"),
    # compositions of the round-3 winners (K=224.5, P=244.8, G=249.6+vae
    # 112.6, vs E=252.4)
    "Q": dict(qkv="fused", attn="fused", ff="fused", mode="kvstat",
              min_logits=90_000),
    "Z": dict(qkv="fused", attn="fused", ff="fused", mode="kvstat",
              min_logits=90_000, upsample="subpixel"),
    "Z2": dict(qkv="fused", attn="fused", ff="fused2", mode="kvstat",
               min_logits=90_000, upsample="subpixel"),
    # Z2 + paired-neighbor kvstat cross-view kernel
    "Y": dict(qkv="fused", attn="fused", ff="fused2", mode="kvstat",
              min_logits=90_000, upsample="subpixel", cv_pair="pair"),
    # Y + level-2 (L=98) attentions also routed to pallas
    "Y2": dict(qkv="fused", attn="fused", ff="fused2", mode="kvstat",
               min_logits=9_000, upsample="subpixel", cv_pair="pair"),
    # Y + level-1 TEXT-CROSS attns (Lq=350, Lk=238, logits 83k) also routed
    # to pallas — the per-op profile localizes ~10 ms/step of BW-bound
    # softmax traffic (fp32 (48,8,350,238) logits) to exactly these blocks
    "P2": dict(qkv="fused", attn="fused", ff="fused2", mode="kvstat",
               min_logits=80_000, upsample="subpixel", cv_pair="pair"),
    # Y + kv-stationary q-chain sub-tiling (VERDICT r3 weak #4: the shipped
    # MAGICDRIVE_KV_SUBTILE knob, measured)
    "S2": dict(qkv="fused", attn="fused", ff="fused2", mode="kvstat",
               min_logits=90_000, upsample="subpixel", cv_pair="pair",
               kv_subtile=2),
    "S4": dict(qkv="fused", attn="fused", ff="fused2", mode="kvstat",
               min_logits=90_000, upsample="subpixel", cv_pair="pair",
               kv_subtile=4),
    # Y + head-grouped kv-stationary kernels (gh heads resident per grid
    # step, clamped per-shape by VMEM: lvl0 self gh=4 / pair gh=2 at 224x400)
    "HG": dict(qkv="fused", attn="fused", ff="fused2", mode="kvstat",
               min_logits=90_000, upsample="subpixel", cv_pair="pair",
               kv_headgroup=8),
    "HG2": dict(qkv="fused", attn="fused", ff="fused2", mode="kvstat",
                min_logits=90_000, upsample="subpixel", cv_pair="pair",
                kv_headgroup=2),
    # HG2 compositions (HG2 measured -11.5 ms/step vs Y; it is now the
    # shipped default — GX below is the gh=1 revert arm)
    "GX": dict(qkv="fused", attn="fused", ff="fused2", mode="kvstat",
               min_logits=90_000, upsample="subpixel", cv_pair="pair",
               kv_headgroup=1),
    "HG4": dict(qkv="fused", attn="fused", ff="fused2", mode="kvstat",
                min_logits=90_000, upsample="subpixel", cv_pair="pair",
                kv_headgroup=4),
    # HG2 + VMEM-side head-packed kvstat outputs (to_out runs UNPADDED;
    # round-5 take on the r4d OS arm, relayout moved from HBM to VMEM) —
    # measured 184.60 vs Y 186.92/186.67 -> now the DEFAULT; OX reverts
    "OP": dict(qkv="fused", attn="fused", ff="fused2", mode="kvstat",
               min_logits=90_000, upsample="subpixel", cv_pair="pair",
               kv_headgroup=2, kv_outpack=True),
    "OX": dict(qkv="fused", attn="fused", ff="fused2", mode="kvstat",
               min_logits=90_000, upsample="subpixel", cv_pair="pair",
               kv_headgroup=2, kv_outpack=False),
    # Y + rolled-copy cross-view gathers (round 4: the in-grid kv index-map
    # permutation is the new default; RX is the revert arm)
    "RX": dict(qkv="fused", attn="fused", ff="fused2", mode="kvstat",
               min_logits=90_000, upsample="subpixel", cv_pair="pair",
               cv_gather="roll"),
    # Y + materialized up-block skip concats (round 4: part-wise
    # norm/conv split is the new default; CX is the revert arm)
    "CX": dict(qkv="fused", attn="fused", ff="fused2", mode="kvstat",
               min_logits=90_000, upsample="subpixel", cv_pair="pair",
               skip_concat="concat"),
}
# Arms measured and REMOVED (measure-or-delete; results in PERFORMANCE.md):
# - PS (round 5f): staged pair attend schedule (all (branch, head) s-dots,
#   then softmaxes, then o-dots — the round-4 "q-chain pipelining" idea).
#   186.72 ms/step vs the OP bracket 185.12/184.43.
# - SG8 (round 4e): small-shape head-group escalation — level-1 self/pair +
#   level-0-text kvstat kernels at gh=8, level-0 self/pair at gh=2 (level-2
#   attns never reach kvstat; min_logits routes them to the XLA dot path).
#   188.32 ms/step vs the HG2 bracket 186.64/186.91.
# - FB / HF / H2F (round 4d): whole-FF kernel at an explicit 2048-row block
#   under a raised scoped-VMEM limit (MAGICDRIVE_FF_BM), alone and composed
#   with gh=8/gh=2. FB measured a wash (197.48 ms vs Y); the knob itself was
#   deleted from kernels/geglu.py in round 5 (VERDICT r4 weak #7).


def set_knobs(cfg):
    import magicdrive_tpu.core.resnet as resnet_mod
    import magicdrive_tpu.core.transformer as tfm_mod
    import magicdrive_tpu.kernels.fused_attention as fa_mod

    tfm_mod._CV_GATHER = cfg.get("cv_gather", "kernel")
    resnet_mod.SKIP_CONCAT = cfg.get("skip_concat", "split")
    attn_mod._QKV_PROJ = cfg["qkv"]
    attn_mod._ATTN_IMPL = cfg["attn"]
    os.environ["MAGICDRIVE_FF_IMPL"] = cfg["ff"]
    resnet_mod.UPSAMPLE_IMPL = cfg.get("upsample", "repeat")
    attn_mod._FUSED_MODE = cfg.get("mode", "auto")
    attn_mod._AUTO_PALLAS_MIN_LOGITS = cfg.get("min_logits", 512 * 512)
    attn_mod._CV_PAIR = cfg.get("cv_pair", "split")
    fa_mod._KV_SUBTILE = cfg.get("kv_subtile", 1)
    fa_mod._KV_HEADGROUP = cfg.get("kv_headgroup", 2)
    # an arm that PINS kv_headgroup disables the shape-aware auto demotion
    # (fused_attention._headgroup_cap); unpinned arms measure the shipped
    # auto behavior
    fa_mod._KV_HEADGROUP_AUTO = "kv_headgroup" not in cfg
    attn_mod._KV_OUTPACK = cfg.get("kv_outpack", True)


def fetch(tree):
    x = jax.tree.leaves(tree)[0]
    return np.asarray(x.ravel()[:2])


# ---- zeros params/operands ON DEVICE (no host init, no transfer) ----
t0 = time.time()
shapes = jax.eval_shape(lambda: init_params(preset, modules,
                                            jax.random.PRNGKey(0)))


def _zeros():
    def z(s):
        dt = (jnp.bfloat16 if jnp.issubdtype(s.dtype, jnp.floating)
              else s.dtype)
        return jnp.zeros(s.shape, dt)
    return jax.tree.map(z, shapes)


params = jax.jit(_zeros)()
fetch(params)
print(f"device zeros params ready in {time.time()-t0:.0f}s", flush=True)

L = preset.bbox_max_len
h, w = pcfg.latent_height, pcfg.latent_width
inv = dict(
    camera2=jnp.zeros((2 * B, N, 3, 7), jnp.bfloat16),
    map2=jnp.zeros((2 * B, *preset.map_hw, preset.map_channels),
                   jnp.bfloat16),
    bboxes2=jnp.zeros((2 * B, N, L, 8, 3), jnp.bfloat16),
    classes2=jnp.zeros((2 * B, N, L), jnp.int32),
    masks2=jnp.zeros((2 * B, N, L), jnp.bfloat16),
    tokens2=jnp.zeros((2 * B, N, 1 + 77 + L, 768), jnp.bfloat16),
    cond_feat2=None,  # set below
)
# cond_feat shape: run embed_map once jitted on zeros map
from magicdrive_tpu.models.controlnet import BEVControlNet

cond_feat2 = jax.jit(lambda p, mp: m.controlnet.apply(
    p["controlnet"], mp, method=BEVControlNet.embed_map))(params, inv["map2"])
inv["cond_feat2"] = cond_feat2
fetch(cond_feat2)

x0 = jnp.zeros((B, N, h, w, 4), jnp.float32)
state0 = coeffs.init_state(x0.shape, jnp.float32)
timesteps = jnp.asarray(coeffs.timesteps)


def one_step(params, x, state, inv, i):
    t = timesteps[i]
    lat2 = jnp.concatenate([x, x]).astype(pcfg.dtype)
    t2 = jnp.broadcast_to(t[None], (2 * B,))
    down_res, mid_res, _ = m.controlnet.apply(
        params["controlnet"], lat2, t2, inv["camera2"],
        jnp.zeros((2 * B, 77, 768), jnp.bfloat16), inv["map2"],
        inv["bboxes2"], inv["classes2"], inv["masks2"],
        conditioning_scale=1.0, tokens=inv["tokens2"],
        cond_feat=inv["cond_feat2"])
    eps = m.unet.apply(
        params["unet"], rearrange(lat2, "b n h w c -> (b n) h w c"),
        repeat(t2, "b -> (b n)", n=N),
        rearrange(inv["tokens2"], "b n l c -> (b n) l c"),
        down_block_additional_residuals=down_res,
        mid_block_additional_residual=mid_res)
    eps = rearrange(eps, "(b n) h w c -> b n h w c", n=N)
    eps_u, eps_c = jnp.split(eps, 2)
    eps = eps_u + pcfg.guidance_scale * (eps_c - eps_u)
    x, state = coeffs.step(i, x, eps, state)
    return x, state


def vae_decode(params, lat):
    from magicdrive_tpu.models.vae import AutoencoderKL

    img = m.vae.apply(params["vae"], lat, method=AutoencoderKL.decode)
    return img


def timeit(jf, args, iters=10):
    out = jf(*args)  # compile + warm
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    order = sys.argv[1:] or ["A", "B", "C", "D", "E", "A"]
    lat_flat = jnp.zeros((B * N, h, w, 4), jnp.bfloat16)
    vae_ms = None
    results = []
    if "cost" in order:
        # XLA's own cost model for the compiled step executable — the
        # roofline denominator (includes lane-padding waste and pallas
        # CostEstimates, i.e. EXECUTED flops, not logical ones).
        order.remove("cost")
        for name in (order or ["E"])[:1]:
            set_knobs(CONFIGS[name])
            f = jax.jit(lambda *a: one_step(*a))
            comp = f.lower(params, x0, state0, inv, 5).compile()
            ca = comp.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = ca.get("flops", 0.0)
            bytes_ = ca.get("bytes accessed", 0.0)
            print(f"[{name}] step cost analysis: {flops/1e12:.2f} TFLOP, "
                  f"{bytes_/1e9:.1f} GB accessed", flush=True)
            cv = jax.jit(lambda *a: vae_decode(*a)).lower(
                params, lat_flat).compile().cost_analysis()
            cv = cv[0] if isinstance(cv, (list, tuple)) else cv
            print(f"[vae] cost analysis: {cv.get('flops', 0)/1e12:.2f} TFLOP,"
                  f" {cv.get('bytes accessed', 0)/1e9:.1f} GB", flush=True)
        return
    if "vae" in order:  # VAE-decode norm-apply A/B (129 ms, 40% MFU suspect)
        order.remove("vae")
        import magicdrive_tpu.core.resnet as resnet_mod

        for apply_mode in ("fp32", "compute"):
            resnet_mod.NORM_APPLY = apply_mode
            ms = timeit(jax.jit(lambda *a: vae_decode(*a)),
                        (params, lat_flat)) * 1e3
            print(f"vae decode ({B*N} imgs) NORM_APPLY={apply_mode}: "
                  f"{ms:.1f} ms", flush=True)
        resnet_mod.NORM_APPLY = "fp32"
    for name in order:
        cfg = CONFIGS[name]
        set_knobs(cfg)
        try:
            t0 = time.time()
            # fresh function object per config: jit's trace cache keys on
            # callable identity, so jit(one_step) again would silently reuse
            # the previous config's trace (the knobs are trace-time globals)
            f = jax.jit(lambda *a: one_step(*a))
            dt = timeit(f, (params, x0, state0, inv, 5))
            if vae_ms is None or "upsample" in cfg:
                cur_vae = timeit(jax.jit(lambda *a: vae_decode(*a)),
                                 (params, lat_flat)) * 1e3
                if "upsample" not in cfg:
                    vae_ms = cur_vae
                print(f"vae decode ({B*N} imgs, upsample="
                      f"{cfg.get('upsample', 'repeat')}): {cur_vae:.1f} ms",
                      flush=True)
            else:
                cur_vae = vae_ms
            fps = B / (20 * dt + cur_vae / 1e3)
            results.append((name, cfg, dt * 1e3, fps))
            print(f"{name} {cfg}: step {dt*1e3:7.2f} ms  "
                  f"implied {fps:.4f} frames/s  "
                  f"(compile+measure {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — keep the matrix going
            print(f"{name} {cfg}: FAILED {type(e).__name__}: {e}",
                  flush=True)
    print("\nsummary:")
    for name, cfg, ms, fps in results:
        print(f"  {name} qkv={cfg['qkv']:8s} attn={cfg['attn']:9s} "
              f"ff={cfg['ff']:5s} {ms:7.2f} ms/step  {fps:.4f} f/s")


if __name__ == "__main__":
    main()
