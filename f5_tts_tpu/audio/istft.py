"""Inverse STFT via irfft + vectorized overlap-add.

XLA-native replacement for the ISTFT inside the external Vocos vocoder the
reference depends on (vocos_mlx, reference: cfm.py:19,446). torch.istft
semantics with center=True: per-frame irfft, synthesis window, overlap-add,
divide by the summed squared-window envelope, trim n_fft//2 from both ends.

The overlap-add is expressed as a static sum of n_fft//hop shifted block
arrays (no scatter), which XLA fuses into a handful of adds — TPU-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def istft(
    spec: jax.Array,  # complex [b, frames, n_fft//2 + 1]
    window: jax.Array,  # [n_fft]
    n_fft: int,
    hop_length: int,
    valid_frames: jax.Array | None = None,  # dynamic scalar <= frames
) -> jax.Array:
    """Returns waveform [b, (frames - 1) * hop_length] (center-trimmed).

    `valid_frames` (a traced scalar) makes the result over the first
    `(valid_frames - 1) * hop_length` samples EXACTLY equal to
    `istft(spec[:, :valid_frames])`: frames past it are zeroed out of the
    overlap-add AND excluded from the window-envelope normalization, so a
    bucket-padded batch reproduces the trimmed computation bitwise. This is
    what lets the sampling pipeline vocode at a static bucket length (one jit
    cache entry per bucket) while callers trim host-side (see
    models/cfm.cfm_sample_e2e)."""
    if n_fft % hop_length != 0:
        raise ValueError("n_fft must be a multiple of hop_length")
    ratio = n_fft // hop_length
    b, frames = spec.shape[0], spec.shape[1]

    if valid_frames is not None:
        valid = (jnp.arange(frames) < valid_frames)
        spec = spec * valid[None, :, None].astype(spec.dtype)

    frames_time = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # [b, frames, n_fft]
    ywin = frames_time * window[None, None, :].astype(frames_time.dtype)

    # overlap-add: frame i covers blocks [i, i + ratio); block m sums chunk j
    # of frame m - j for j in [0, ratio)
    chunks = ywin.reshape(b, frames, ratio, hop_length)
    out_blocks = jnp.zeros((b, frames + ratio - 1, hop_length), dtype=frames_time.dtype)
    for j in range(ratio):
        out_blocks = out_blocks.at[:, j : j + frames].add(chunks[:, :, j])
    y = out_blocks.reshape(b, -1)  # [(frames - 1) * hop + n_fft]

    # window-square envelope, same overlap-add (shared across batch)
    w2 = jnp.square(window)
    w2_chunks = w2.reshape(ratio, hop_length)
    env_blocks = jnp.zeros((frames + ratio - 1, hop_length), dtype=w2.dtype)
    if valid_frames is None:
        for j in range(ratio):
            env_blocks = env_blocks.at[j : j + frames].add(
                jnp.broadcast_to(w2_chunks[j], (frames, hop_length))
            )
    else:
        valid_f = valid.astype(w2.dtype)[:, None]
        for j in range(ratio):
            env_blocks = env_blocks.at[j : j + frames].add(w2_chunks[j][None, :] * valid_f)
    env = env_blocks.reshape(-1)

    y = y / jnp.maximum(env, 1e-11)

    pad = n_fft // 2
    return y[:, pad:-pad]
