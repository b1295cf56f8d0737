"""PETR decoder-only DETR transformer (flax.linen, batch-first).

Behavioral reference: `models/utils/petr_transformer.py` (sty61010/PETR):
post-norm decoder layers with op order self_attn -> norm -> cross_attn ->
norm -> ffn -> norm; a shared post-LN applied to every intermediate output;
zero-initialized query target; additive query/key positional embeddings.

TPU-first deltas:
  * batch-first `(B, L, C)` tokens (no seq-first permutes).
  * `nn.remat` per decoder layer (mirrors the reference's `with_cp`,
    `petr_transformer.py:201-212`) — rematerialize activations in backward.
  * fp32 attention softmax inside bf16 compute.

``deterministic`` (dropout off) is a module attribute, not a call arg, so the
layer body stays remat-friendly with array-only call signatures.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from petr_tpu.models.layers import FFN, MultiheadAttention
from petr_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, constrain

Dtype = Any


class PETRDecoderLayer(nn.Module):
    """One post-norm decoder layer: self-attn, cross-attn, FFN."""

    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout_rate: float = 0.1
    deterministic: bool = True
    use_flash: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, Q, C)
        memory: jax.Array,  # (B, L, C)
        query_pos: jax.Array,  # (B, Q, C)
        key_pos: jax.Array,  # (B, L, C)
        key_padding_mask: Optional[jax.Array],  # (B, L) True = pad
    ) -> jax.Array:
        det = self.deterministic
        drop = lambda name: nn.Dropout(self.dropout_rate, deterministic=det, name=name)

        # self-attention over queries (PE added to q and k, value without PE)
        q_in = query + query_pos
        sa = MultiheadAttention(
            self.embed_dim, self.num_heads, self.dropout_rate, self.dtype, name="self_attn"
        )(q_in, q_in, query, deterministic=det)
        query = query + drop("drop_sa")(sa)
        query = nn.LayerNorm(dtype=self.dtype, name="norm1")(query)

        # cross-attention: queries x multi-view tokens
        ca = MultiheadAttention(
            self.embed_dim, self.num_heads, self.dropout_rate, self.dtype,
            use_flash=self.use_flash, name="cross_attn"
        )(
            query + query_pos,
            memory + key_pos,
            memory,
            key_padding_mask=key_padding_mask,
            deterministic=det,
        )
        query = query + drop("drop_ca")(ca)
        query = nn.LayerNorm(dtype=self.dtype, name="norm2")(query)

        ffn_out = FFN(self.ffn_dim, self.embed_dim, self.dropout_rate, self.dtype, name="ffn")(
            query, deterministic=det
        )
        query = query + ffn_out
        query = nn.LayerNorm(dtype=self.dtype, name="norm3")(query)
        return query


class PETREncoderLayer(nn.Module):
    """Post-norm encoder layer (self_attn -> norm -> ffn -> norm); the
    reference registers an encoder (`petr_transformer.py:370-397`) though no
    shipped config uses one."""

    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout_rate: float = 0.1
    deterministic: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,  # (B, L, C)
        pos: jax.Array,  # (B, L, C)
        key_padding_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        det = self.deterministic
        q_in = tokens + pos
        sa = MultiheadAttention(
            self.embed_dim, self.num_heads, self.dropout_rate, self.dtype, name="self_attn"
        )(q_in, q_in, tokens, key_padding_mask=key_padding_mask, deterministic=det)
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm1")(tokens + sa)
        ffn_out = FFN(self.ffn_dim, self.embed_dim, self.dropout_rate, self.dtype, name="ffn")(
            tokens, deterministic=det
        )
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm2")(tokens + ffn_out)
        return tokens


class PETRTransformerEncoder(nn.Module):
    """Stack of encoder layers over flattened tokens."""

    num_layers: int = 3
    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout_rate: float = 0.1
    deterministic: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, pos, key_padding_mask=None):
        for i in range(self.num_layers):
            tokens = PETREncoderLayer(
                self.embed_dim, self.num_heads, self.ffn_dim, self.dropout_rate,
                self.deterministic, self.dtype, name=f"layer{i}",
            )(tokens, pos, key_padding_mask)
        return tokens


class PETRTransformerDecoder(nn.Module):
    """Stack of decoder layers returning all intermediate outputs.

    Output: (num_layers, B, Q, C); each intermediate is post-normed by a
    shared final LayerNorm (reference `petr_transformer.py:439-447`) while the
    raw (un-post-normed) query feeds the next layer.
    """

    num_layers: int = 6
    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout_rate: float = 0.1
    deterministic: bool = True
    remat: bool = True
    use_flash: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        memory: jax.Array,
        query_pos: jax.Array,
        key_pos: jax.Array,
        key_padding_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        Layer = nn.remat(PETRDecoderLayer) if self.remat else PETRDecoderLayer
        post_norm = nn.LayerNorm(dtype=self.dtype, name="post_norm")
        outs = []
        for i in range(self.num_layers):
            query = Layer(
                self.embed_dim,
                self.num_heads,
                self.ffn_dim,
                self.dropout_rate,
                self.deterministic,
                self.use_flash,
                self.dtype,
                name=f"layer{i}",
            )(query, memory, query_pos, key_pos, key_padding_mask)
            outs.append(post_norm(query))
        return jnp.stack(outs, axis=0)


class PETRTransformer(nn.Module):
    """Flatten multi-view features to tokens and run the decoder.

    Equivalent to `petr_transformer.py:34-109` but batch-first: memory tokens
    are `(B, N*H*W, C)`; the returned stack is (L, B, Q, C).
    """

    num_layers: int = 6
    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout_rate: float = 0.1
    deterministic: bool = True
    remat: bool = True
    use_flash: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jax.Array,  # (B, N, H, W, C)
        masks: jax.Array,  # (B, N, H, W) True = pad
        query_embed: jax.Array,  # (Q, C)
        pos_embed: jax.Array,  # (B, N, H, W, C)
    ) -> jax.Array:
        B, N, H, W, C = feats.shape
        # Token-axis sharding: K/V tokens split over the model axis, queries
        # replicated — XLA inserts the partial-softmax psum over ICI.
        memory = constrain(feats.reshape(B, N * H * W, C), (DATA_AXIS, MODEL_AXIS, None))
        key_pos = constrain(
            pos_embed.reshape(B, N * H * W, C).astype(self.dtype),
            (DATA_AXIS, MODEL_AXIS, None),
        )
        key_padding_mask = constrain(masks.reshape(B, N * H * W), (DATA_AXIS, MODEL_AXIS))
        Q = query_embed.shape[0]
        query_pos = jnp.broadcast_to(query_embed[None], (B, Q, C)).astype(self.dtype)
        target = constrain(jnp.zeros((B, Q, C), self.dtype), (DATA_AXIS, None, None))
        return PETRTransformerDecoder(
            self.num_layers,
            self.embed_dim,
            self.num_heads,
            self.ffn_dim,
            self.dropout_rate,
            self.deterministic,
            self.remat,
            self.use_flash,
            self.dtype,
            name="decoder",
        )(target, memory, query_pos, key_pos, key_padding_mask)
