import numpy as np
import jax.numpy as jnp

from magicdrive_tpu.core.embeddings import (
    fourier_embed, fourier_out_dim, get_timestep_embedding,
)


def ref_fourier(x, num_freqs, include_input=True, log_sampling=True):
    """Direct numpy port of the reference embedder semantics
    (ref:magicdrive/networks/embedder.py): concat of [x] + per-frequency
    [sin, cos] applied to x * freq."""
    max_freq = num_freqs - 1
    if log_sampling:
        freqs = 2.0 ** np.linspace(0.0, max_freq, num_freqs)
    else:
        freqs = np.linspace(1.0, 2.0 ** max_freq, num_freqs)
    outs = [x] if include_input else []
    for f in freqs:
        outs.append(np.sin(x * f))
        outs.append(np.cos(x * f))
    return np.concatenate(outs, axis=-1)


def test_fourier_matches_reference_order():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 7, 3)).astype(np.float32)
    got = np.asarray(fourier_embed(jnp.asarray(x), num_freqs=4))
    want = ref_fourier(x, 4)
    assert got.shape == (5, 7, 27)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fourier_out_dim():
    assert fourier_out_dim(3, 4) == 27
    assert fourier_out_dim(3, 4) * 7 == 189  # camera embedding dim
    assert fourier_out_dim(3, 4) * 8 == 216  # bbox embedding dim


def test_fourier_no_include_input():
    x = np.ones((2, 3), np.float32)
    got = fourier_embed(jnp.asarray(x), num_freqs=2, include_input=False)
    assert got.shape == (2, 12)


def test_timestep_embedding_flip():
    t = jnp.asarray([0.0, 10.0, 999.0])
    emb = get_timestep_embedding(t, 320)
    assert emb.shape == (3, 320)
    # t=0: sin half -> 0, cos half -> 1. flip_sin_to_cos puts cos first.
    np.testing.assert_allclose(np.asarray(emb[0, :160]), np.ones(160), atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 160:]), np.zeros(160), atol=1e-6)


def test_timestep_embedding_matches_closed_form():
    t = jnp.asarray([37.0])
    emb = np.asarray(get_timestep_embedding(t, 8))
    half = 4
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    want = np.concatenate([np.cos(37.0 * freqs), np.sin(37.0 * freqs)])
    np.testing.assert_allclose(emb[0], want, atol=1e-5)
