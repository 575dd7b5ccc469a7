"""conv3x3_tc (transposed implicit-GEMM conv kernel) vs the XLA reference."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from magicdrive_tpu.kernels.conv3x3 import conv3x3_ref, conv3x3_tc


def _mk(B, H, W, cs, O, seed=0, dtype=np.float32):
    rs = np.random.RandomState(seed)
    parts = [jnp.asarray(rs.randn(B, H, W, c).astype(dtype)) for c in cs]
    k = jnp.asarray(rs.randn(3, 3, sum(cs), O).astype(np.float32) * 0.05)
    b = jnp.asarray(rs.randn(O).astype(np.float32) * 0.1)
    return parts, k, b


@pytest.mark.parametrize("B,H,W,cs,O,nimg", [
    (2, 6, 10, (16,), 24, 1),       # single part, odd spatial
    (4, 5, 7, (8, 16), 16, 2),      # two parts (skip concat), 2-img block
    (3, 4, 4, (8, 8, 8), 8, 3),     # three parts, block=whole batch
])
def test_conv3x3_tc_matches_ref(B, H, W, cs, O, nimg):
    parts, k, b = _mk(B, H, W, cs, O)
    got = conv3x3_tc(parts, k, b, imgs_per_block=nimg, interpret=True)
    want = conv3x3_ref(parts, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_tc_fused_gn_silu_temb():
    B, H, W, cs, O = 2, 6, 10, (8, 16), 16
    parts, k, b = _mk(B, H, W, cs, O, seed=1)
    rs = np.random.RandomState(2)
    mul = jnp.asarray(rs.rand(B, sum(cs)).astype(np.float32) + 0.5)
    shift = jnp.asarray(rs.randn(B, sum(cs)).astype(np.float32) * 0.1)
    temb = jnp.asarray(rs.randn(B, O).astype(np.float32))
    got = conv3x3_tc(parts, k, b, mul=mul, shift=shift, silu=True,
                     temb=temb, imgs_per_block=2, interpret=True)
    want = conv3x3_ref(parts, k, b, mul=mul, shift=shift, silu=True,
                       temb=temb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_tc_bf16():
    B, H, W, cs, O = 2, 4, 6, (16,), 8
    parts, k, b = _mk(B, H, W, cs, O, seed=3, dtype=np.float32)
    parts = [p.astype(jnp.bfloat16) for p in parts]
    got = conv3x3_tc(parts, k, b, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = conv3x3_ref([p for p in parts], k, b)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.15, rtol=0.1)


def test_resnet_tc_route_matches_xla(monkeypatch):
    """ResnetBlock2D with CONV_IMPL=tc (fused GN+SiLU+conv kernel, interpret
    mode) must match the default XLA path — params and outputs."""
    import sys

    import magicdrive_tpu.core.resnet as resnet
    import magicdrive_tpu.kernels.flash_attention  # noqa: F401
    from magicdrive_tpu.core.resnet import ResnetBlock2D

    # the kernels package re-exports a flash_attention FUNCTION that shadows
    # the submodule on attribute access — fetch the module itself
    fa = sys.modules["magicdrive_tpu.kernels.flash_attention"]

    rs = np.random.RandomState(0)
    # two parts (skip concat) with 128-multiple channels so _use_tc fires
    parts = [jnp.asarray(rs.randn(2, 6, 10, c).astype(np.float32))
             for c in (128, 256)]
    temb = jnp.asarray(rs.randn(2, 64).astype(np.float32))
    block = ResnetBlock2D(out_channels=128, groups=8, dtype=jnp.bfloat16)
    v = block.init(jax.random.PRNGKey(0),
                   [p.astype(jnp.bfloat16) for p in parts], temb)
    want = block.apply(v, [p.astype(jnp.bfloat16) for p in parts], temb)

    import functools

    monkeypatch.setattr(resnet, "CONV_IMPL", "tc")
    monkeypatch.setattr(fa, "on_tpu_by_default", lambda: True)
    monkeypatch.setattr(resnet, "conv3x3_tc",
                        functools.partial(conv3x3_tc, interpret=True))
    v2 = block.init(jax.random.PRNGKey(0),
                    [p.astype(jnp.bfloat16) for p in parts], temb)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(v)
    got = block.apply(v, [p.astype(jnp.bfloat16) for p in parts], temb)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.08, rtol=0.08)
