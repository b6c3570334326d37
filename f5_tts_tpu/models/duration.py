"""Transformer duration predictor.

Behavioral parity with reference: duration.py. Same TPU-first construction as
the DiT: stacked per-layer params under `lax.scan`, pure functions, explicit
PRNG keys. The blocks are plain pre-LN residual transformer blocks (no AdaLN),
and the head is masked-mean pooling -> Linear -> Softplus, in seconds.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.audio.mel import MelSpec
from f5_tts_tpu.config import AudioConfig, DurationConfig
from f5_tts_tpu.models import blocks as B
from f5_tts_tpu.models.dit import stack_block_params
from f5_tts_tpu.models.rope import rotary_freqs
from f5_tts_tpu.utils.masks import lens_to_mask, maybe_masked_mean
from f5_tts_tpu.utils.modules import (
    Params,
    layer_norm,
    linear,
    linear_init,
    rms_norm,
    rms_norm_init,
)
from f5_tts_tpu.utils.tokenizer import list_str_to_idx, list_str_to_tensor


def duration_block_init(key, dim: int, heads: int, dim_head: int, ff_mult: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "attn": B.attention_init(k1, dim, heads, dim_head),
        "ff": B.feed_forward_init(k2, dim, mult=ff_mult),
    }


def duration_block(
    p: Params,
    x: jax.Array,
    heads: int,
    mask: jax.Array | None = None,
    rope_freqs: jax.Array | None = None,
    use_flash: bool = True,
    dropout_rate: float = 0.0,
    dropout_key: jax.Array | None = None,
) -> jax.Array:
    """Pre-LN residual block (reference: duration.py:64-94)."""
    if dropout_key is not None:
        k_attn, k_ff = jax.random.split(dropout_key)
    else:
        k_attn = k_ff = None
    norm = layer_norm(x, None, eps=1e-6)
    x = x + B.attention(
        p["attn"], norm, heads, mask=mask, rope_freqs=rope_freqs, use_flash=use_flash,
        dropout_rate=dropout_rate, dropout_key=k_attn,
    )
    norm = layer_norm(x, None, eps=1e-6)
    return x + B.feed_forward(p["ff"], norm, dropout_rate=dropout_rate, dropout_key=k_ff)


def init_duration_transformer(key: jax.Array, cfg: DurationConfig) -> Params:
    keys = jax.random.split(key, cfg.depth + 4)
    block_list = [
        duration_block_init(keys[i], cfg.dim, cfg.heads, cfg.dim_head, cfg.ff_mult)
        for i in range(cfg.depth)
    ]
    return {
        "text_embed": B.text_embedding_init(
            keys[-4], cfg.text_num_embeds, cfg.text_dim,
            conv_layers=cfg.conv_layers, max_pos=cfg.max_pos,
        ),
        "input_embed": {
            "proj": linear_init(keys[-3], cfg.mel_dim + cfg.text_dim, cfg.dim),
            "conv_pos_embed": B.conv_position_embedding_init(keys[-2], cfg.dim),
        },
        "blocks": stack_block_params(block_list),
        "norm_out": rms_norm_init(cfg.dim),
        "to_pred": linear_init(keys[-1], cfg.dim, 1, bias=False),
    }


def duration_transformer_forward(
    params: Params,
    cfg: DurationConfig,
    x: jax.Array,  # [b, n, mel]
    text: jax.Array,  # [b, nt]
    dropout_key: jax.Array | None = None,  # training-only
) -> jax.Array:
    """Backbone forward -> [b, n, dim] (reference: duration.py:97-158).

    note: TextEmbedding here runs with mask_padding=False
    (reference: duration.py:116-118) and the transformer receives no attention
    mask (reference: duration.py:245 passes only text) — both kept for parity.
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    seq_len = x.shape[1]
    x = x.astype(dtype)

    text_embed = B.text_embedding(
        params["text_embed"], text, seq_len,
        drop_text=False, mask_padding=False, max_pos=cfg.max_pos, dtype=dtype,
    )
    # DurationInputEmbedding: concat(mel, text) -> proj -> conv pos residual
    # (reference: duration.py:45-58)
    h = linear(params["input_embed"]["proj"], jnp.concatenate([x, text_embed], axis=-1))
    h = B.conv_position_embedding(params["input_embed"]["conv_pos_embed"], h) + h

    freqs = rotary_freqs(seq_len, cfg.dim_head)
    use_dropout = dropout_key is not None and cfg.dropout > 0.0

    if use_dropout:
        layer_keys = jax.random.split(dropout_key, cfg.depth)

        def body(carry, xs):
            block_p, layer_key = xs
            return duration_block(
                block_p, carry, cfg.heads, mask=None, rope_freqs=freqs,
                use_flash=cfg.use_flash_attention,
                dropout_rate=cfg.dropout, dropout_key=layer_key,
            ), None

        h, _ = jax.lax.scan(body, h, (params["blocks"], layer_keys))
    else:

        def body(carry, block_p):
            return duration_block(
                block_p, carry, cfg.heads, mask=None, rope_freqs=freqs,
                use_flash=cfg.use_flash_attention,
            ), None

        h, _ = jax.lax.scan(body, h, params["blocks"])
    return rms_norm(h, params["norm_out"])


@partial(jax.jit, static_argnames=("cfg", "return_loss"))
def duration_forward(
    params: Params,
    cfg: DurationConfig,
    inp: jax.Array,  # [b, n, mel]
    text: jax.Array,  # [b, nt]
    lens: jax.Array,  # [b]
    key: jax.Array | None = None,
    return_loss: bool = False,
    frames_per_second: float = 93.75,
):
    """Predict duration in seconds, or the L1 training loss
    (reference: duration.py:192-260)."""
    batch, seq_len = inp.shape[0], inp.shape[1]
    mask = lens_to_mask(lens, seq_len)

    dropout_key = None
    if return_loss:
        # mask out from a random prefix index so the model predicts the full
        # duration from a partial clip (reference: duration.py:232-237)
        k_mask, k_dropout = jax.random.split(key)
        rand_frac = jax.random.uniform(k_mask, (batch,))
        rand_index = (rand_frac * lens).astype(jnp.int32)
        seq = jnp.arange(seq_len)
        mask = mask & (seq[None, :] < rand_index[:, None])
        if cfg.dropout > 0.0:
            dropout_key = k_dropout

    inp = jnp.where(mask[..., None], inp, jnp.zeros_like(inp))
    x = duration_transformer_forward(params, cfg, inp, text, dropout_key=dropout_key)
    x = maybe_masked_mean(x, mask)
    pred = jax.nn.softplus(linear(params["to_pred"], x.astype(jnp.float32)))[..., 0]

    if not return_loss:
        return pred
    duration_sec = lens.astype(pred.dtype) / frames_per_second
    return jnp.abs(pred - duration_sec).mean()


class DurationPredictor:
    """Seconds-scale duration predictor (reference API: duration.py:161-260)."""

    def __init__(
        self,
        params: Params,
        cfg: DurationConfig = DurationConfig(),
        audio_cfg: AudioConfig = AudioConfig(),
        vocab_char_map: dict[str, int] | None = None,
    ):
        self.params = params
        self.cfg = cfg
        self.audio_cfg = audio_cfg
        self._mel_spec = MelSpec.from_config(audio_cfg)
        self.num_channels = audio_cfg.n_mels
        self._vocab_char_map = vocab_char_map

    @classmethod
    def init(cls, key: jax.Array, cfg: DurationConfig = DurationConfig(), **kw) -> "DurationPredictor":
        return cls(init_duration_transformer(key, cfg), cfg, **kw)

    def __call__(
        self,
        inp: jax.Array,  # [b, n, d] mel or [b, nw] raw wave
        text: jax.Array | list[str],
        *,
        lens: jax.Array | None = None,
        return_loss: bool = False,
        key: jax.Array | None = None,
    ):
        inp = jnp.asarray(inp)
        if inp.ndim == 2:
            inp = self._mel_spec(inp)
        assert inp.shape[-1] == self.num_channels

        batch, seq_len = inp.shape[0], inp.shape[1]

        if isinstance(text, list):
            if self._vocab_char_map is not None:
                text = list_str_to_idx(text, self._vocab_char_map)
            else:
                text = list_str_to_tensor(text)
            assert text.shape[0] == batch
        text = jnp.asarray(text)

        # pad mel up to the text length if text is longer
        # (reference: duration.py:216-218)
        if seq_len < text.shape[1]:
            seq_len = text.shape[1]
            inp = jnp.pad(inp, ((0, 0), (0, seq_len - inp.shape[1]), (0, 0)))

        if lens is None:
            lens = jnp.full((batch,), seq_len, dtype=jnp.int32)
        lens = jnp.asarray(lens, dtype=jnp.int32)

        if return_loss and key is None:
            key = jax.random.key(np.random.randint(0, 2**31 - 1))

        fps = self.audio_cfg.sample_rate / self.audio_cfg.hop_length
        return duration_forward(
            self.params, self.cfg, inp, text, lens,
            key=key, return_loss=return_loss, frames_per_second=fps,
        )
