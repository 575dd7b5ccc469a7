"""CLIP ViT-L/14 text encoder (the frozen SD-v1.5 text backbone).

Re-design of the transformers ``CLIPTextModel`` used by the reference
(ref:magicdrive/runner/base_runner.py:82-89). Provides both the last hidden
state (prompt conditioning) and the pooled EOS embedding (used to initialize
bbox class tokens, ref:magicdrive/networks/bbox_embedder.py:122-135).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.cfg
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                      param_dtype=jnp.float32, name=name)
        q, k, v = dense("q_proj")(x), dense("k_proj")(x), dense("v_proj")(x)

        def split(t):
            return t.reshape(*t.shape[:-1], cfg.num_heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits * (head_dim ** -0.5) + causal_mask
        weights = nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out.reshape(*x.shape)
        return dense("out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=jnp.float32,
                                       param_dtype=jnp.float32, name=name)
        h = ln("layer_norm1")(x.astype(jnp.float32)).astype(self.dtype)
        x = x + CLIPAttention(cfg, dtype=self.dtype, name="self_attn")(h, causal_mask)
        h = ln("layer_norm2")(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray):
        """input_ids: (B, L) int32. Returns (last_hidden_state, pooled)."""
        cfg = self.cfg
        B, L = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                       param_dtype=jnp.float32, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (cfg.max_position_embeddings, cfg.hidden_size),
                         jnp.float32)
        x = tok + pos[None, :L].astype(self.dtype)

        causal = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
        causal = causal[None, None]
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(
                x, causal)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="final_layer_norm")(
            x.astype(jnp.float32)).astype(self.dtype)
        # pooled = hidden state at the first EOS token, matching transformers'
        # CLIP pooler (for SD-v1.5's tokenizer, EOS = 49407 = highest id, so
        # this coincides with the legacy argmax-over-ids behavior).
        eos_idx = jnp.argmax(
            (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(B), eos_idx]
        return x, pooled
