"""Centralized, hashable model/audio configuration.

The reference scatters these constants across four files
(reference: generate.py:21-24, duration.py:31-33, trainer.py:45-49, data.py:22
and hard-coded constructor kwargs at cfm.py:460-469, cfm.py:430-438,
train_libritts_small.py:17-25). Here they are frozen dataclasses so they can be
closed over by ``jax.jit`` as static arguments.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class AudioConfig:
    """Log-mel front-end parameters (reference: audio.py:162-230)."""

    sample_rate: int = 24_000
    n_fft: int = 1024
    hop_length: int = 256
    n_mels: int = 100

    @property
    def frames_per_second(self) -> float:
        return self.sample_rate / self.hop_length


@dataclass(frozen=True)
class DiTConfig:
    """Diffusion-transformer backbone hyperparameters (reference: dit.py:331-372).

    Base pretrained config (reference: cfm.py:460-469): dim=1024, depth=22,
    heads=16, ff_mult=2, text_dim=512, conv_layers=4.
    """

    dim: int = 1024
    depth: int = 22
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 2
    mel_dim: int = 100
    text_num_embeds: int = 256
    text_dim: int = 512
    text_mask_padding: bool = True
    conv_layers: int = 4
    conv_mult: int = 2
    dropout: float = 0.0
    # ~44s of 24kHz audio; absolute positional table size for the text branch
    # (reference: dit.py:190-191).
    max_pos: int = 4096
    # "bfloat16" for the TPU fast path, "float32" for parity testing.
    compute_dtype: str = "float32"
    # Use the Pallas flash-attention kernel when True; jnp fallback otherwise.
    use_flash_attention: bool = True
    # Opt-in int8-COMPUTE inference (W8A8): the blocks' attention/FF linears
    # run as symmetric int8 MXU matmuls with dynamic per-token activation
    # quantization (~2x matmul throughput on v5e; small quantization
    # distortion — see models/quant.py and docs/PERFORMANCE.md). Training
    # and the default path are unaffected.
    int8_compute: bool = False
    # Rematerialize each block in the backward pass (jax.checkpoint): trades
    # ~30% more FLOPs for O(depth) -> O(1) activation memory, enabling much
    # larger training batches per chip.
    remat: bool = False

    def replace(self, **kw) -> "DiTConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class DurationConfig:
    """Duration-predictor transformer (reference: duration.py:97-158, cfm.py:430-438)."""

    dim: int = 512
    depth: int = 8
    heads: int = 8
    dim_head: int = 64
    ff_mult: int = 2
    mel_dim: int = 100
    text_num_embeds: int = 256
    text_dim: int = 512
    conv_layers: int = 2
    dropout: float = 0.0
    max_pos: int = 4096
    compute_dtype: str = "float32"
    use_flash_attention: bool = True

    def replace(self, **kw) -> "DurationConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class CFMConfig:
    """Conditional flow-matching wrapper config (reference: cfm.py:128-167)."""

    audio_drop_prob: float = 0.3
    cond_drop_prob: float = 0.2
    frac_lengths_mask: tuple[float, float] = (0.7, 1.0)
    max_duration: int = 4096
    # Sequence-length bucket (frames) used to keep jit shape variants bounded;
    # mirrors the reference training pipeline's pad-to-multiple-of-256
    # (reference: train_libritts_small.py:51). Padded tails are masked out.
    duration_bucket: int = 256


@dataclass(frozen=True)
class VocosConfig:
    """Vocos mel-24khz vocoder (external `vocos_mlx.Vocos` in the reference,
    cfm.py:19,446; re-implemented natively here)."""

    input_channels: int = 100
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    compute_dtype: str = "float32"


# Pretrained "v1" base model configuration (reference: cfm.py:459-473).
F5TTS_V1_BASE = DiTConfig()

# Pretrained duration model configuration (reference: cfm.py:429-438).
DURATION_V2 = DurationConfig()

# Small training example config (reference: train_libritts_small.py:14-28).
F5TTS_SMALL = DiTConfig(
    dim=768,
    depth=16,
    heads=8,
    ff_mult=2,
    text_dim=384,
    conv_layers=4,
    text_num_embeds=256,
)
