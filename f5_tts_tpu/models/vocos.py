"""Vocos mel-spectrogram vocoder, re-implemented natively in JAX.

The reference imports this whole model from an external pip package
(`vocos_mlx.Vocos`, reference: cfm.py:19,446, pyproject.toml:42). Here it is a
first-class component: a ConvNeXt (v1) backbone + ISTFT head matching the
`charactr/vocos-mel-24khz` architecture (dim=512, intermediate=1536, 8 layers,
n_fft=1024, hop=256), loading the same HuggingFace weights via
models/convert.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.audio.istft import istft
from f5_tts_tpu.audio.mel import hanning
from f5_tts_tpu.config import VocosConfig
from f5_tts_tpu.utils.modules import (
    Params,
    conv1d,
    conv1d_init,
    gelu,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)


def vocos_convnext_block_init(key, dim: int, intermediate_dim: int, layer_scale: float) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dwconv": conv1d_init(k1, dim, dim, 7, groups=dim),
        "norm": layer_norm_init(dim),
        "pwconv1": linear_init(k2, dim, intermediate_dim),
        "pwconv2": linear_init(k3, intermediate_dim, dim),
        "gamma": jnp.full((dim,), layer_scale),
    }


def vocos_convnext_block(p: Params, x: jax.Array) -> jax.Array:
    """ConvNeXt v1 block with layer scale (no GRN, unlike the DiT's v2 blocks)."""
    residual = x
    x = conv1d(p["dwconv"], x, groups=x.shape[-1], padding=3)
    x = layer_norm(x, p["norm"], eps=1e-6)
    x = linear(p["pwconv1"], x)
    x = gelu(x, approximate=False)
    x = linear(p["pwconv2"], x)
    return residual + p["gamma"].astype(x.dtype) * x


def init_vocos(key: jax.Array, cfg: VocosConfig = VocosConfig()) -> Params:
    keys = jax.random.split(key, cfg.num_layers + 4)
    layer_scale = 1.0 / cfg.num_layers
    return {
        "embed": conv1d_init(keys[0], cfg.input_channels, cfg.dim, 7),
        "norm": layer_norm_init(cfg.dim),
        "convnext": [
            vocos_convnext_block_init(keys[i + 1], cfg.dim, cfg.intermediate_dim, layer_scale)
            for i in range(cfg.num_layers)
        ],
        "final_layer_norm": layer_norm_init(cfg.dim),
        "head": linear_init(keys[-1], cfg.dim, cfg.n_fft + 2),
    }


@partial(jax.jit, static_argnames=("cfg",))
def vocos_decode(
    params: Params, cfg: VocosConfig, mel: jax.Array, valid_frames: jax.Array | None = None
) -> jax.Array:
    """mel [b, n, n_mels] -> waveform [b, (n - 1) * hop_length].

    With `valid_frames` (a traced scalar), a mel whose frames past it are
    zero decodes — over the first (valid_frames - 1) * hop samples — exactly
    as the trimmed mel[:, :valid_frames] would: the backbone convs see the
    same zeros SAME-padding would supply, and the ISTFT masks invalid frames
    out of both the overlap-add and the envelope (audio/istft.py)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    x = mel.astype(dtype)

    # re-zero invalid positions at every conv boundary: a zero mel row does
    # NOT stay zero through biased blocks, and the next dwconv would leak the
    # tail into valid frames within its receptive field — masking here makes
    # each conv see exactly the zeros SAME padding supplies in the trimmed
    # computation
    vmask = None
    if valid_frames is not None:
        vmask = (jnp.arange(x.shape[1]) < valid_frames)[None, :, None].astype(dtype)

    x = conv1d(params["embed"], x, padding=3)
    x = layer_norm(x, params["norm"], eps=1e-6)
    # mask AFTER the layer norm: its affine bias would otherwise turn the
    # zeroed tail rows back into `bias` and the first block's dwconv would
    # mix them into the last valid frames (only the dwconvs mix positions —
    # in-block norms/pwconvs are pointwise, so per-block re-masking suffices)
    if vmask is not None:
        x = x * vmask
    for block_p in params["convnext"]:
        x = vocos_convnext_block(block_p, x)
        if vmask is not None:
            x = x * vmask
    x = layer_norm(x, params["final_layer_norm"], eps=1e-6)

    x = linear(params["head"], x).astype(jnp.float32)  # [b, n, n_fft + 2]
    mag, phase = jnp.split(x, 2, axis=-1)
    mag = jnp.exp(mag)
    mag = jnp.clip(mag, max=1e2)  # safety clip, matching vocos
    spec = mag * (jnp.cos(phase) + 1j * jnp.sin(phase))

    window = jnp.asarray(hanning_periodic(cfg.n_fft))
    return istft(spec, window, cfg.n_fft, cfg.hop_length, valid_frames=valid_frames)


def hanning_periodic(n: int) -> np.ndarray:
    """torch.hann_window(periodic=True) equivalent (same as the mel window)."""
    return hanning(n)


class Vocos:
    """Vocoder wrapper exposing `decode` (the callable the CFM model wires in,
    reference: cfm.py:471)."""

    def __init__(self, params: Params, cfg: VocosConfig = VocosConfig()):
        self.params = params
        self.cfg = cfg

    @classmethod
    def init(cls, key: jax.Array, cfg: VocosConfig = VocosConfig()) -> "Vocos":
        return cls(init_vocos(key, cfg), cfg)

    @classmethod
    def from_pretrained(cls, repo_id: str = "lucasnewman/vocos-mel-24khz") -> "Vocos":
        from f5_tts_tpu.models.convert import load_vocos_pretrained

        return load_vocos_pretrained(repo_id)

    def decode(self, mel: jax.Array, valid_frames: jax.Array | None = None) -> jax.Array:
        return vocos_decode(self.params, self.cfg, mel, valid_frames=valid_frames)

    def decode_params(
        self, params: Params, mel: jax.Array, valid_frames: jax.Array | None = None
    ) -> jax.Array:
        """decode() with the params EXPLICIT — the form the fused sampling jit
        uses (models/cfm.cfm_sample_e2e): a closure over device-array params
        would bake them into the outer jaxpr as constants, forcing a
        device->host readback of the whole vocoder per trace (minutes through
        the axon tunnel) and re-embedding them in every bucket's executable."""
        return vocos_decode(params, self.cfg, mel, valid_frames=valid_frames)

    def __call__(self, mel: jax.Array, valid_frames: jax.Array | None = None) -> jax.Array:
        return self.decode(mel, valid_frames=valid_frames)
