"""Training runtime: loop, metrics, orbax checkpoint/resume, weight export."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdrive_tpu.config.loader import compose
from magicdrive_tpu.config.presets import tiny_debug
from magicdrive_tpu.data.fixtures import make_dataset
from magicdrive_tpu.train.runner import Runner
from magicdrive_tpu.utils.serialization import load_params, save_params

pytestmark = pytest.mark.slow  # full train-loop runs


CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.fixture(scope="module")
def tiny_setup():
    preset = tiny_debug()
    modules = preset.modules(dtype=jnp.float32)
    return preset, modules


def _cfg(tmp_path, steps=2):
    return compose(CONFIG_DIR, overrides=[
        "runner=debug", f"runner.max_train_steps={steps}",
        "runner.checkpointing_steps=2", "runner.validation_steps=1000",
        "runner.validation_before_run=false", "runner.num_workers=1",
        "runner.train_batch_size=1", "runner.bbox_max_length=8",
        "parallel.mesh_shape=[1,1]",
    ])


def test_train_loop_checkpoint_resume(tmp_path, tiny_setup):
    preset, modules = tiny_setup
    ds = make_dataset(3)
    cfg = _cfg(tmp_path)
    run_dir = str(tmp_path / "run")
    runner = Runner(cfg, preset, modules, ds, val_dataset=None,
                    run_dir=run_dir)
    state = runner.run(resume=False)
    assert int(state.step) == 2
    # metrics written
    lines = [json.loads(l) for l in
             open(os.path.join(run_dir, "metrics.jsonl"))]
    assert any("loss" in l for l in lines)
    assert np.isfinite(lines[-1]["loss"])
    # deployable weights exported
    params = load_params(os.path.join(run_dir, "weights"))
    assert "unet" in params and "controlnet" in params

    # resume continues from the saved step
    runner2 = Runner(_cfg(tmp_path, steps=3), preset, modules, ds,
                     run_dir=run_dir)
    state2 = runner2.run(resume=True)
    assert int(state2.step) == 3


def test_pair_bwd_config_guard(tmp_path, tiny_setup):
    """The pair_bwd config default applies to IMAGE training only: a video
    config (frames_per_clip > 1) must NOT get MAGICDRIVE_PAIR_BWD=serial
    (the serialization blows the 60-frame t-shard budget — round-5 review
    finding: frames_per_clip was not plumbed from YAML, making the guard
    dead code). Explicit env always wins."""
    preset, modules = tiny_setup
    ds = make_dataset(2)

    def build(extra):
        cfg = compose(CONFIG_DIR, overrides=[
            "runner=debug", "runner.max_train_steps=1",
            "runner.checkpointing_steps=10", "runner.validation_steps=1000",
            "runner.validation_before_run=false", "runner.num_workers=1",
            "runner.train_batch_size=1", "runner.bbox_max_length=8",
            "parallel.mesh_shape=[1,1]",
        ] + extra)
        return Runner(cfg, preset, modules, ds, val_dataset=None,
                      run_dir=str(tmp_path / "guard"))

    old = os.environ.pop("MAGICDRIVE_PAIR_BWD", None)
    try:
        r = build(["+runner.pair_bwd=serial"])
        assert os.environ.get("MAGICDRIVE_PAIR_BWD") == "serial"
        assert r.tcfg.frames_per_clip is None
        os.environ.pop("MAGICDRIVE_PAIR_BWD", None)

        r = build(["+runner.pair_bwd=serial", "+runner.frames_per_clip=4"])
        assert "MAGICDRIVE_PAIR_BWD" not in os.environ, \
            "video config must not serialize the pair backward"
        assert r.tcfg.frames_per_clip == 4

        os.environ["MAGICDRIVE_PAIR_BWD"] = "free"
        build(["+runner.pair_bwd=serial"])
        assert os.environ["MAGICDRIVE_PAIR_BWD"] == "free", \
            "explicit env must win over the config"
    finally:
        os.environ.pop("MAGICDRIVE_PAIR_BWD", None)
        if old is not None:
            os.environ["MAGICDRIVE_PAIR_BWD"] = old


def test_nan_guard_blocks_checkpoint(tmp_path, tiny_setup, monkeypatch):
    """A NaN loss must abort training BEFORE the state is persisted: the
    deferred guard (round 5g) drains its pending check ahead of every
    ckpt.save, so the latest checkpoint is always finite (round-5 review
    finding)."""
    import magicdrive_tpu.train.runner as runner_mod

    preset, modules = tiny_setup

    def poisoned_make_train_step(mods, tcfg):
        from magicdrive_tpu.train.train_step import make_train_step as mk
        real_step = mk(mods, tcfg)

        def step(state, batch, rng):
            state, metrics = real_step(state, batch, rng)
            metrics = dict(metrics, loss=metrics["loss"] * jnp.nan)
            return state, metrics

        return step

    monkeypatch.setattr(runner_mod, "make_train_step",
                        poisoned_make_train_step)
    ds = make_dataset(6)
    cfg = compose(CONFIG_DIR, overrides=[
        "runner=debug", "runner.max_train_steps=6",
        "runner.checkpointing_steps=1", "runner.validation_steps=1000",
        "runner.validation_before_run=false", "runner.num_workers=1",
        "runner.train_batch_size=1", "runner.bbox_max_length=8",
        "parallel.mesh_shape=[1,1]",
    ])
    run_dir = str(tmp_path / "nanrun")
    runner = Runner(cfg, preset, modules, ds, val_dataset=None,
                    run_dir=run_dir)
    with pytest.raises(RuntimeError, match="NaN/inf loss"):
        runner.run(resume=False)
    # every step checkpoints (checkpointing_steps=1), but the drain check
    # raised before the first save could persist a poisoned state
    assert runner.ckpt.latest_step() is None


def test_serialization_roundtrip(tmp_path):
    import ml_dtypes

    tree = {"a": {"b": np.arange(6).reshape(2, 3).astype(np.float32)},
            "c": np.ones((4,), np.int32),
            "d": np.full((3,), 1.5, ml_dtypes.bfloat16)}
    save_params(tree, str(tmp_path / "w"))
    back = load_params(str(tmp_path / "w"))
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["c"], tree["c"])
    # bf16 leaves survive the npz round trip with their dtype
    assert back["d"].dtype == tree["d"].dtype
    np.testing.assert_array_equal(back["d"].astype(np.float32),
                                  tree["d"].astype(np.float32))
    assert os.path.isfile(tmp_path / "w" / "manifest.json")


def test_validator_reuses_compiled_pipeline(tmp_path):
    """Periodic validation must not recompile the generation pipeline: the
    jitted fn takes params as an argument, so a second validate() with new
    params reuses the single cache entry (VERDICT r1: the flagship compile
    is ~25 min on TPU — one cache entry per validation is unusable)."""
    import dataclasses

    from magicdrive_tpu.config.presets import init_params, micro_debug
    from magicdrive_tpu.data.collate import CollateConfig
    from magicdrive_tpu.train.runner import MetricsLogger, Validator

    preset = micro_debug()
    modules = preset.modules(dtype=jnp.float32)
    params = init_params(preset, modules, jax.random.PRNGKey(0))
    ds = make_dataset(2, image_hw=preset.image_size, map_hw=preset.map_hw)
    ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                         canvas_hw=preset.image_size)
    pcfg = dataclasses.replace(preset.pipeline, num_inference_steps=2)
    v = Validator(modules, preset, ds, ccfg, indices=[0], times=1,
                  pipeline_cfg=pcfg)
    logger = MetricsLogger(str(tmp_path), use_tensorboard=False)
    v.validate(params, logger, step=1, run_dir=None)
    assert v.pipe._generate._cache_size() == 1
    params2 = jax.tree.map(lambda x: x + 0.01 if x.dtype == jnp.float32 else x,
                           params)
    v.validate(params2, logger, step=2, run_dir=None)
    assert v.pipe._generate._cache_size() == 1  # no retrace, no recompile
    logger.close()
