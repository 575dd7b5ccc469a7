import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdrive_tpu.core.transformer import (
    BasicTransformerBlock, Transformer2DModel,
)
from magicdrive_tpu.core.attention import Attention, dot_product_attention
from magicdrive_tpu.models.unet import NUSCENES_NEIGHBORS

N_CAM = 6


def test_dot_product_attention_matches_naive():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 5, 3, 8)).astype(np.float32)
    k = rng.normal(size=(2, 7, 3, 8)).astype(np.float32)
    v = rng.normal(size=(2, 7, 3, 8)).astype(np.float32)
    got = np.asarray(dot_product_attention(*map(jnp.asarray, (q, k, v))))
    # naive per-head
    scale = 8 ** -0.5
    want = np.empty_like(got)
    for b in range(2):
        for h in range(3):
            logits = q[b, :, h] @ k[b, :, h].T * scale
            w = np.exp(logits - logits.max(-1, keepdims=True))
            w /= w.sum(-1, keepdims=True)
            want[b, :, h] = w @ v[b, :, h]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lane_padded_projections_exact():
    """Lane-padded head projections (weight-level zero pad to D=128) must
    reproduce the unpadded attention bit-near-exactly: padded q/k/v lanes
    carry zeros through QK/PV and the zero out-projection rows annihilate
    them. The flash kernel consumes the padded layout with the logical
    scale passed explicitly."""
    attn = Attention(64, heads=4, dim_head=16, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 64))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 64))
    params = attn.init(jax.random.PRNGKey(1), x)
    ref = attn.apply(params, x, ctx)

    def padded(mdl, x, ctx, backend):
        q = mdl.project_q(x, 128)
        k, v = mdl.project_kv(ctx, 128)
        o = dot_product_attention(q, k, v, scale=mdl.scale, backend=backend)
        return mdl.project_out(o)

    for backend in ("xla", "pallas"):  # pallas falls back to interpret on CPU
        got = attn.apply(params, x, ctx, backend, method=padded)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)


def test_fused_qkv_projection_exact():
    """project_qkv (one concatenated-kernel matmul) must equal the three
    separate projections bit-for-bit, padded and unpadded."""
    attn = Attention(64, heads=4, dim_head=16, use_bias=True,
                     dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 64))
    params = attn.init(jax.random.PRNGKey(1), x)

    for d_pad in (None, 128):
        def fused(mdl, x):
            return mdl.project_qkv(x, d_pad)

        def separate(mdl, x):
            q = mdl.project_q(x, d_pad)
            k, v = mdl.project_kv(x, d_pad)
            return q, k, v

        got = attn.apply(params, x, method=fused)
        want = attn.apply(params, x, method=separate)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=1e-6)


def test_flash_attention_explicit_scale():
    from magicdrive_tpu.kernels.flash_attention import flash_attention

    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 36, 2, 16)).astype(np.float32))
               for _ in range(3))
    want = dot_product_attention(q, k, v, backend="xla", scale=0.5)
    got = flash_attention(q, k, v, interpret=True, scale=0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("attn_type", ["add", "concat", "self"])
def test_multiview_block_zero_init_is_identity(attn_type):
    """A freshly-initialized multiview block must equal the stock block:
    the zero-linear connector kills the cross-view contribution
    (SURVEY.md §7.2 step 4 invariant; ref:blocks.py:81-90)."""
    dim, heads, d_head, L = 32, 4, 8, 10
    B = 2
    x = jax.random.normal(jax.random.PRNGKey(0), (B * N_CAM, L, dim))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B * N_CAM, 7, 16))

    mv = BasicTransformerBlock(
        dim, heads, d_head, cross_attention_dim=16,
        neighboring_view_pair=NUSCENES_NEIGHBORS,
        neighboring_attn_type=attn_type, zero_module_type="zero_linear")
    params = mv.init(jax.random.PRNGKey(2), x, ctx)["params"]
    out_mv = mv.apply({"params": params}, x, ctx)

    stock = BasicTransformerBlock(dim, heads, d_head, cross_attention_dim=16)
    stock_params = {k: v for k, v in params.items()
                    if k not in ("norm4", "attn4", "connector")}
    out_stock = stock.apply({"params": stock_params}, x, ctx)
    np.testing.assert_allclose(np.asarray(out_mv), np.asarray(out_stock),
                               atol=1e-5)


def _ln(x, p, eps=1e-5):
    h = (x - x.mean(-1, keepdims=True)) / jnp.sqrt(x.var(-1, keepdims=True) + eps)
    return h * p["scale"] + p["bias"]


def test_multiview_add_mode_matches_per_camera_loop():
    """The batched gather+sum cross-view path must equal the reference's
    per-camera loop semantics (ref:blocks.py:106-121, 213-217): replicate the
    whole block step-by-step with a Python per-camera loop and compare."""
    dim, heads, d_head, L, B = 16, 2, 8, 6, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (B * N_CAM, L, dim))

    mv = BasicTransformerBlock(
        dim, heads, d_head, cross_attention_dim=None,
        neighboring_view_pair=NUSCENES_NEIGHBORS,
        neighboring_attn_type="add", zero_module_type="none")
    params = mv.init(jax.random.PRNGKey(2), x)["params"]
    got = mv.apply({"params": params}, x)

    attn = Attention(dim, heads, d_head, cross_attention_dim=dim)
    # 1. self-attention
    h = _ln(x, params["norm1"]["LayerNorm_0"])
    x1 = x + attn.apply({"params": params["attn1"]}, h)
    # 2. cross-view, reference per-camera loop
    h = _ln(x1, params["norm4"]["LayerNorm_0"]).reshape(B, N_CAM, L, dim)
    cv = np.zeros((B, N_CAM, L, dim), np.float32)
    for cam, (nb1, nb2) in enumerate(NUSCENES_NEIGHBORS):
        for nb in (nb1, nb2):
            out = attn.apply({"params": params["attn4"]}, h[:, cam], h[:, nb])
            cv[:, cam] += np.asarray(out)
    x2 = x1 + cv.reshape(B * N_CAM, L, dim)
    # 3. feed-forward (GEGLU)
    h = _ln(x2, params["norm3"]["LayerNorm_0"])
    ffp = params["ff"]
    h = h @ ffp["net_0_proj"]["kernel"] + ffp["net_0_proj"]["bias"]
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * jax.nn.gelu(gate, approximate=False)
    want = x2 + (h @ ffp["net_2"]["kernel"] + ffp["net_2"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_transformer2d_shapes():
    model = Transformer2DModel(n_heads=2, d_head=8, cross_attention_dim=16,
                               norm_num_groups=4)
    x = jnp.ones((2, 4, 6, 16))
    ctx = jnp.ones((2, 7, 16))
    params = model.init(jax.random.PRNGKey(0), x, ctx)["params"]
    out = model.apply({"params": params}, x, ctx)
    assert out.shape == x.shape


def test_neighbor_batched_matches_sequential():
    """``neighbor_batched=True`` (one attention call over stacked neighbors)
    must produce the same output as the sequential two-call path — same
    params, same math, different launch layout."""
    dim, heads, d_head, L, B = 16, 2, 8, 6, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (B * N_CAM, L, dim))
    kw = dict(cross_attention_dim=None,
              neighboring_view_pair=NUSCENES_NEIGHBORS,
              neighboring_attn_type="add", zero_module_type="gated")
    seq = BasicTransformerBlock(dim, heads, d_head, neighbor_batched=False, **kw)
    bat = BasicTransformerBlock(dim, heads, d_head, neighbor_batched=True, **kw)
    params = seq.init(jax.random.PRNGKey(2), x)
    # force a non-zero cross-view contribution through the gated connector
    params = jax.tree.map(
        lambda p: jnp.full_like(p, 0.5) if p.ndim == 1 and p.shape == (dim,)
        else p, params)
    a = seq.apply(params, x)
    b = bat.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_attention_impl_matches_projected():
    """MAGICDRIVE_ATTN_IMPL=fused (projection-fused megakernel) must match
    the projected path through a full cross-view transformer block."""
    import magicdrive_tpu.core.attention as attn_mod

    kw = dict(cross_attention_dim=32,
              neighboring_view_pair=tuple((i, ((i - 1) % N_CAM,
                                               (i + 1) % N_CAM))
                                          for i in range(N_CAM)))
    kw["neighboring_view_pair"] = tuple(v for _, v in sorted(
        dict(kw["neighboring_view_pair"]).items()))
    blk = BasicTransformerBlock(32, 2, 16, cross_attention_dim=32,
                                neighboring_view_pair=kw["neighboring_view_pair"],
                                zero_module_type="none")
    x = jax.random.normal(jax.random.PRNGKey(0), (2 * N_CAM, 40, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2 * N_CAM, 7, 32))
    params = blk.init(jax.random.PRNGKey(2), x, ctx)
    ref = blk.apply(params, x, ctx)

    real_route = attn_mod._pallas_route
    real_impl = attn_mod._ATTN_IMPL
    real_mode = attn_mod._FUSED_MODE
    try:
        attn_mod._pallas_route = lambda *a: True
        attn_mod._ATTN_IMPL = "fused"
        got = blk.apply(params, x, ctx)
        # forced kv-stationary routing (MAGICDRIVE_FUSED_MODE=kvstat) must
        # agree too — incl. the cross-view per-neighbor path
        attn_mod._FUSED_MODE = "kvstat"
        got_kv = blk.apply(params, x, ctx)
    finally:
        attn_mod._pallas_route = real_route
        attn_mod._ATTN_IMPL = real_impl
        attn_mod._FUSED_MODE = real_mode
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_kv), np.asarray(ref), atol=3e-5)


def test_subpixel_upsample_conv_matches_repeat():
    """UPSAMPLE_IMPL=subpixel: the four folded 2x2 parity convs reproduce
    nearest-2x-upsample + 3x3 'SAME' conv exactly (up to fp32 fold
    rounding), for Upsample2D and the VAE decoder upsamplers."""
    from magicdrive_tpu.core import resnet as rn
    from magicdrive_tpu.core.resnet import Upsample2D

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 7, 13, 16)).astype(np.float32))
    up = Upsample2D(24, dtype=jnp.float32)
    params = up.init(jax.random.PRNGKey(0), x)
    old = rn.UPSAMPLE_IMPL
    try:
        rn.UPSAMPLE_IMPL = "repeat"
        want = up.apply(params, x)
        rn.UPSAMPLE_IMPL = "subpixel"
        got = up.apply(params, x)
        # non-2x target sizes fall back to the repeat path
        want_odd = up.apply(params, x, out_hw=(14, 25))
        rn.UPSAMPLE_IMPL = "repeat"
        ref_odd = up.apply(params, x, out_hw=(14, 25))
    finally:
        rn.UPSAMPLE_IMPL = old
    assert got.shape == (2, 14, 26, 24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(want_odd), np.asarray(ref_odd),
                               atol=0, rtol=0)


def test_vae_decoder_subpixel_matches_repeat():
    from magicdrive_tpu.core import resnet as rn
    from magicdrive_tpu.models.vae import AutoencoderKL, VAEConfig

    cfg = VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4)
    vae = AutoencoderKL(cfg, dtype=jnp.float32)
    z = jnp.asarray(np.random.default_rng(4).normal(
        size=(1, 4, 5, 4)).astype(np.float32))
    params = vae.init(jax.random.PRNGKey(1), z, method=AutoencoderKL.decode)
    old = rn.UPSAMPLE_IMPL
    try:
        rn.UPSAMPLE_IMPL = "repeat"
        want = vae.apply(params, z, method=AutoencoderKL.decode)
        rn.UPSAMPLE_IMPL = "subpixel"
        got = vae.apply(params, z, method=AutoencoderKL.decode)
    finally:
        rn.UPSAMPLE_IMPL = old
    assert got.shape == (1, 32, 40, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


def test_skip_concat_split_matches_concat():
    """SKIP_CONCAT=split (part-wise norm1 + input-channel-split conv1 and
    conv_shortcut, no materialized concat) must match the concat path —
    same params, values, and grads; the up-block channel counts straddle
    a GroupNorm group boundary (640+320 at 30 ch/group) on purpose."""
    import magicdrive_tpu.core.resnet as rn
    from magicdrive_tpu.core.resnet import ResnetBlock2D

    rng = np.random.default_rng(7)
    B, H, W = 2, 6, 5
    x = jnp.asarray(rng.normal(size=(B, H, W, 640)).astype(np.float32))
    skip = jnp.asarray(rng.normal(size=(B, H, W, 320)).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(B, 96)).astype(np.float32))
    blk = ResnetBlock2D(320, groups=32)

    saved = rn.SKIP_CONCAT
    try:
        rn.SKIP_CONCAT = "concat"
        params = blk.init(jax.random.PRNGKey(0), (x, skip), temb)

        def loss_concat(p, a, b):
            return (blk.apply(p, jnp.concatenate([a, b], -1), temb) ** 2).mean()

        ref, (gx, gs) = jax.value_and_grad(loss_concat, argnums=(1, 2))(
            params, x, skip)

        rn.SKIP_CONCAT = "split"
        # identical param tree from a tuple init in split mode
        params_s = blk.init(jax.random.PRNGKey(0), (x, skip), temb)
        assert (jax.tree.map(jnp.shape, params_s)
                == jax.tree.map(jnp.shape, params))

        def loss_split(p, a, b):
            return (blk.apply(p, (a, b), temb) ** 2).mean()

        got, (hx, hs) = jax.value_and_grad(loss_split, argnums=(1, 2))(
            params, x, skip)
    finally:
        rn.SKIP_CONCAT = saved
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hx), np.asarray(gx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(gs), atol=1e-6)
