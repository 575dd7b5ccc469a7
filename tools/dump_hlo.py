"""Dump the optimized HLO of the denoise step (and VAE decode) for conv
halo-pad/copy forensics (VERDICT r3 next-round #1a).

Compiles the same jitted one-step function as tools/bench_matrix.py under a
named knob config and writes the optimized HLO text to /tmp, then prints a
per-opcode census (pad / copy / convolution / fusion counts) plus every
`pad(` line's shapes so the halo pattern is greppable.

Usage: python tools/dump_hlo.py [CONFIG] [step|vae]   (default: Y step)
"""
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.path.isdir("/root/.axon_site"):
    sys.path.append("/root/.axon_site")

import jax

from bench_matrix import (CONFIGS, inv, one_step, params, set_knobs, state0,
                          vae_decode, x0, B, N, h, w)
import jax.numpy as jnp


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "Y"
    what = sys.argv[2] if len(sys.argv) > 2 else "step"
    set_knobs(CONFIGS[name])
    if what == "vae":
        lat_flat = jnp.zeros((B * N, h, w, 4), jnp.bfloat16)
        comp = jax.jit(lambda *a: vae_decode(*a)).lower(
            params, lat_flat).compile()
    else:
        comp = jax.jit(lambda *a: one_step(*a)).lower(
            params, x0, state0, inv, 5).compile()
    txt = comp.as_text()
    out = f"/tmp/hlo_{name}_{what}.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB to {out}")

    ops = collections.Counter()
    for m0 in re.finditer(r"= \S+ (\w+)\(", txt):
        ops[m0.group(1)] += 1
    for k, v in ops.most_common(25):
        print(f"  {k:30s} {v}")
    pads = [ln.strip() for ln in txt.splitlines()
            if re.search(r"= \S+ pad\(", ln)]
    print(f"\n{len(pads)} pad ops; first 20:")
    for ln in pads[:20]:
        print("  " + ln[:240])
    copies = [ln.strip() for ln in txt.splitlines()
              if re.search(r"= \S+ copy\(", ln)]
    print(f"\n{len(copies)} copy ops; first 10:")
    for ln in copies[:10]:
        print("  " + ln[:240])


if __name__ == "__main__":
    main()
