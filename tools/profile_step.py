"""Per-op device profile of the full denoise step (VERDICT r2 item 3).

Captures a jax.profiler device trace of several bench_matrix one_step calls
through the tunnel and prints the top HLO ops by self time (xprof's
framework_op_stats over the captured xplane). This is the round-3 look at
where the ~260 ms step actually goes, now that the kernel knobs are proven
to move it <1%.

Usage: python tools/profile_step.py [trace_dir] [--pipeline|--train]
(imports tools/bench_matrix.py, which builds zeros params on device;
--pipeline traces ONE full MagicDrivePipeline call instead — the 20-step
scan + VAE + conditioning — to expose cost outside the bare step;
--train traces 3 full-size train steps via tools/bench_train.py's
build_step at the shipped default bs=4 / dots / pair_bwd=serial)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.path.isdir("/root/.axon_site"):
    sys.path.append("/root/.axon_site")


def main():
    args_cli = [a for a in sys.argv[1:] if not a.startswith("--")]
    pipeline_mode = "--pipeline" in sys.argv
    train_mode = "--train" in sys.argv
    trace_dir = args_cli[0] if args_cli else "/tmp/magicdrive_prof"
    import importlib.util

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/magicdrive_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    if train_mode:
        # bench_matrix is NOT loaded (its device-resident inference params
        # would contend with the train step's near-full HBM footprint)
        import numpy as np

        spec = importlib.util.spec_from_file_location(
            "bench_train", os.path.join(os.path.dirname(__file__),
                                        "bench_train.py"))
        bt = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bt)
        step, state, batch = bt.build_step(4, "dots", "serial")

        def sync(s):
            return np.asarray(jax.tree.leaves(s.trainable)[0].ravel()[:2])

        state, _ = step(state, batch, jax.random.PRNGKey(1))
        sync(state)
        print("warm; tracing 3 train steps ...", flush=True)
        with jax.profiler.trace(trace_dir):
            for i in range(3):
                state, _ = step(state, batch, jax.random.fold_in(
                    jax.random.PRNGKey(2), i))
                sync(state)
        _analyze(trace_dir, n_calls=3)
        return

    spec = importlib.util.spec_from_file_location(
        "bench_matrix", os.path.join(os.path.dirname(__file__),
                                     "bench_matrix.py"))
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)

    if "--vae" in sys.argv:
        import jax.numpy as jnp

        lat = jnp.zeros((bm.B * bm.N, bm.h, bm.w, 4), jnp.bfloat16)
        f = jax.jit(lambda *a: bm.vae_decode(*a))
        out = f(bm.params, lat)
        bm.fetch(out)
        print("warm; tracing 3 vae decodes ...", flush=True)
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                out = f(bm.params, lat)
            bm.fetch(out)
    elif pipeline_mode:
        import jax.numpy as jnp

        from magicdrive_tpu.data.collate import CollateConfig, collate_fn
        from magicdrive_tpu.data.fixtures import make_dataset
        from magicdrive_tpu.pipeline.pipeline import MagicDrivePipeline

        pipe = MagicDrivePipeline(bm.modules, bm.params, bm.preset.pipeline)
        ccfg = CollateConfig(bbox_max_len=bm.preset.bbox_max_len,
                             canvas_hw=bm.preset.image_size, is_train=False)
        batch = {k: jnp.asarray(v) for k, v in
                 collate_fn(make_dataset(bm.B), ccfg).items()}
        batch.pop("pixel_values", None)
        key = jax.random.PRNGKey(0)
        f = lambda: pipe(batch, key=key)
        out = f()
        bm.fetch(out)
        print("warm; tracing 1 pipeline call ...", flush=True)
        with jax.profiler.trace(trace_dir):
            out = f()
            bm.fetch(out)
    else:
        f = jax.jit(lambda *a: bm.one_step(*a))
        args = (bm.params, bm.x0, bm.state0, bm.inv, 5)
        out = f(*args)
        bm.fetch(out)
        print("warm; tracing 3 calls ...", flush=True)
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                out = f(*args)
            bm.fetch(out)

    _analyze(trace_dir, n_calls=1 if pipeline_mode else 3)


def _analyze(trace_dir, n_calls):
    # locate the xplane file
    import glob

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    assert paths, f"no xplane under {trace_dir}"
    xplane = paths[-1]
    print(f"trace: {xplane}", flush=True)

    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    with open("/tmp/op_stats.json", "w") as fh:
        json.dump(obj, fh)
    # gviz table format: {.., 'cols': [...], 'rows': [...]}
    try:
        tables = obj if isinstance(obj, list) else [obj]
        tbl = tables[0]
        cols = [c.get("label") or c.get("id") for c in tbl["cols"]]
        print("columns:", cols)
        rows = []
        for r in tbl["rows"]:
            rows.append([c.get("v") for c in r["c"]])
        # find self-time column
        cand = [i for i, c in enumerate(cols)
                if c and "self" in c.lower() and "time" in c.lower()]
        key = cand[0] if cand else 2
        rows.sort(key=lambda r: -(r[key] or 0))
        name_i = next((i for i, c in enumerate(cols)
                       if c and ("operation" in c.lower()
                                 or "name" in c.lower())), 1)
        type_i = next((i for i, c in enumerate(cols)
                       if c and "type" in c.lower()), 0)
        print(f"\ntop 40 by {cols[key]}:")
        for r in rows[:40]:
            print(f"  {str(r[type_i])[:28]:28s} {str(r[name_i])[:64]:64s} "
                  f"{r[key]}")

        # per-type aggregation over ALL device rows (the top-40 cutoff
        # hides the long tail of small ops)
        from collections import defaultdict

        hd_i = next((i for i, c in enumerate(cols)
                     if c and "host/device" in c.lower()), None)
        occ_i = next((i for i, c in enumerate(cols)
                      if c and "occurrence" in c.lower()), None)
        tot, cnt = defaultdict(float), defaultdict(int)
        dev_total = 0.0
        for r in rows:
            if hd_i is not None and r[hd_i] != "Device":
                continue
            tot[r[type_i]] += r[key] or 0
            cnt[r[type_i]] += (r[occ_i] or 0) if occ_i is not None else 0
            dev_total += r[key] or 0
        print(f"\ndevice total: {dev_total/n_calls/1000:.1f} ms/call "
              f"({n_calls} traced call(s))")
        for t, v in sorted(tot.items(), key=lambda kv: -kv[1]):
            print(f"  {t:32s} {v/n_calls/1000:8.2f} ms/call  (x{cnt[t]})")
    except Exception as e:  # noqa: BLE001
        print(f"table parse failed ({e}); raw JSON at /tmp/op_stats.json")


if __name__ == "__main__":
    main()
