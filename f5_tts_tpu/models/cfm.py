"""Conditional flow matching: training loss, ODE sampling, and the F5TTS API.

Behavioral parity with reference: cfm.py:128-520, re-designed TPU-first:

  - The ODE integration is one `lax.scan` inside one jit region (vs. the
    reference's Python loop over an `mx.compile`d step, cfm.py:38-122,392).
  - Classifier-free guidance runs cond+uncond as ONE 2B-batch forward via
    per-sample drop flags (vs. two transformer calls, cfm.py:342-363) — this
    doubles MXU utilization per step.
  - Durations are padded to a static bucket (multiples of 256 frames by
    default) so jit caches a handful of shape variants instead of recompiling
    per utterance length; padded tails are masked in attention and trimmed.
  - RNG is explicit `jax.random` key threading (vs. MLX global state).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Literal

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.audio.mel import MelSpec
from f5_tts_tpu.config import AudioConfig, CFMConfig, DiTConfig
from f5_tts_tpu.models.dit import (
    dit_forward,
    dit_forward_precomputed,
    dit_text_embed,
    dit_time_mods,
    init_dit,
)
from f5_tts_tpu.models.ode import odeint
from f5_tts_tpu.utils.masks import lens_to_mask, mask_from_frac_lengths
from f5_tts_tpu.utils.modules import Params
from f5_tts_tpu.utils.tokenizer import list_str_to_idx, list_str_to_tensor


# ------------------------------------------------------------------ training


@partial(jax.jit, static_argnames=("dit_cfg", "cfm_cfg"))
def cfm_loss(
    params: Params,
    dit_cfg: DiTConfig,
    cfm_cfg: CFMConfig,
    key: jax.Array,
    inp: jax.Array,  # [b, n, d] mel
    text: jax.Array,  # [b, nt] int ids padded with -1
    lens: jax.Array,  # [b] int
) -> jax.Array:
    """Masked-infill flow-matching MSE (reference: cfm.py:169-251).

    Semantics preserved: random span fraction U(0.7, 1.0), per-sample time
    U(0,1), straight-line probe phi = (1-t) x0 + t x1, CFG drops decided PER
    BATCH (shape (1,), reference: cfm.py:228-232), loss averaged over masked
    elements only, and no attention mask during training (the reference's
    training forward passes none, cfm.py:234-241).
    """
    batch, seq_len = inp.shape[0], inp.shape[1]
    k_frac, k_span, k_x0, k_time, k_adrop, k_tdrop, k_dropout = jax.random.split(key, 7)

    mask = lens_to_mask(lens, seq_len)

    lo, hi = cfm_cfg.frac_lengths_mask
    frac_lengths = jax.random.uniform(k_frac, (batch,), minval=lo, maxval=hi)
    rand_span_mask = mask_from_frac_lengths(k_span, lens, frac_lengths, seq_len) & mask

    x1 = inp
    x0 = jax.random.normal(k_x0, x1.shape, dtype=x1.dtype)
    time = jax.random.uniform(k_time, (batch,), dtype=x1.dtype)

    t = time[:, None, None]
    phi = (1 - t) * x0 + t * x1
    flow = x1 - x0

    cond = jnp.where(rand_span_mask[..., None], jnp.zeros_like(x1), x1)

    # per-batch (not per-sample) CFG drop decision, kept for parity
    drop_audio = jax.random.uniform(k_adrop, (1,)) < cfm_cfg.audio_drop_prob
    drop_text = jax.random.uniform(k_tdrop, (1,)) < cfm_cfg.cond_drop_prob
    drop_audio = drop_audio | drop_text

    pred = dit_forward(
        params, dit_cfg, phi, cond, text, time,
        drop_audio_cond=drop_audio[0], drop_text=drop_text[0],
        # honor DiTConfig.dropout in training (reference: dit.py:89-96,111-125);
        # the gate is static (cfg.dropout == 0.0 compiles to the same graph as
        # before), inference paths never pass a key
        dropout_key=k_dropout if dit_cfg.dropout > 0.0 else None,
    )

    se = jnp.square(pred - flow.astype(jnp.float32))
    span = rand_span_mask[..., None]
    num = jnp.sum(jnp.where(span, se, 0.0))
    den = jnp.maximum(jnp.sum(span) * se.shape[-1], 1e-6)
    return num / den


# ------------------------------------------------------------------ sampling


@partial(jax.jit, static_argnames=("dit_cfg", "method", "cfg_strength", "has_mask", "return_trajectory"))
def cfm_sample_mel(
    params: Params,
    dit_cfg: DiTConfig,
    y0: jax.Array,  # [b, n, d] noise (zeroed past each item's duration)
    step_cond: jax.Array,  # [b, n, d] fixed conditioning
    text: jax.Array,  # [b, n] int ids padded with -1
    mask: jax.Array | None,  # [b, n] bool duration mask (or None)
    ts: jax.Array,  # [steps] sway-warped time grid
    method: str = "rk4",
    cfg_strength: float = 2.0,
    has_mask: bool = True,
    return_trajectory: bool = True,
) -> jax.Array:
    """Integrate the flow ODE; returns trajectory [steps, b, n, d], or just
    [1, b, n, d] (the final state) when return_trajectory=False
    (reference: cfm.py:338-393)."""
    del has_mask  # only disambiguates the jit cache when mask is None
    b, n = y0.shape[0], y0.shape[1]

    # every sampling evaluation shares one scalar flow time across the (CFG-
    # doubled) batch and the grid is fixed, so the whole AdaLN time-
    # conditioning schedule is precomputed outside the step scan (see
    # dit_time_mods / odeint's schedule_fn)
    def schedule_fn(times):
        return dit_time_mods(params, dit_cfg, times)

    if cfg_strength < 1e-5:
        # the text embedding is ODE-step invariant: compute once, not per step
        text_embed = dit_text_embed(params, dit_cfg, text, n, drop_text=False)

        def fn(t, x, mods):
            return dit_forward_precomputed(
                params, dit_cfg, x, step_cond, text_embed, t,
                drop_audio_cond=False, mask=mask, time_mods=mods,
            )
    else:
        # Batched CFG: cond+uncond in one 2B forward; both streams' (constant)
        # text embeddings hoisted out of the scan.
        step_cond2 = jnp.concatenate([step_cond, step_cond])
        mask2 = jnp.concatenate([mask, mask]) if mask is not None else None
        drop = jnp.concatenate([jnp.zeros((b,), bool), jnp.ones((b,), bool)])
        text_embed2 = jnp.concatenate(
            [
                dit_text_embed(params, dit_cfg, text, n, drop_text=False),
                dit_text_embed(params, dit_cfg, text, n, drop_text=True),
            ]
        )

        def fn(t, x, mods):
            pred2 = dit_forward_precomputed(
                params, dit_cfg, jnp.concatenate([x, x]), step_cond2, text_embed2, t,
                drop_audio_cond=drop, mask=mask2, time_mods=mods,
            )
            pred, null_pred = pred2[:b], pred2[b:]
            return pred + (pred - null_pred) * cfg_strength

    return odeint(fn, y0.astype(jnp.float32), ts.astype(jnp.float32), method,
                  return_trajectory=return_trajectory, schedule_fn=schedule_fn)


@partial(
    jax.jit,
    static_argnames=(
        "dit_cfg",
        "method",
        "cfg_strength",
        "return_trajectory",
        "shared_noise",
        "vocoder_apply",
    ),
)
def cfm_sample_e2e(
    params: Params,
    dit_cfg: DiTConfig,
    cond: jax.Array,  # [b, padded_len, d] mel, pre-padded to the bucket
    lens: jax.Array,  # [b] i32 reference lengths in frames
    duration: jax.Array,  # [b] i32 total durations in frames
    max_dur: jax.Array,  # scalar i32 = duration.max() (DYNAMIC; see below)
    text: jax.Array,  # [b, padded_len] int ids padded with -1
    ts: jax.Array,  # [steps] sway-warped time grid
    y0: jax.Array | None,  # [b, n, d] noise override, or None to draw from seed
    seed: jax.Array,  # scalar int; ignored when y0 is given
    vocoder_params: Params | None = None,  # pytree ARG (not a closure constant)
    *,
    method: str,
    cfg_strength: float,
    return_trajectory: bool,
    shared_noise: bool,
    vocoder_apply=None,  # static: (vocoder_params, mel, valid_frames) -> wave
):
    """The whole serving pipeline in ONE jit: masks/conditioning prep -> ODE
    integration -> composite with the reference -> vocoder (optional).

    Functionally identical to the step-by-step path `sample()` uses for
    segmented-CFG runs (same helpers, same trim-before-vocoder semantics);
    fusing it means one device dispatch per request instead of ~10, which
    matters doubly behind dispatch-latency-bound transports (each dependent
    round trip costs ~30 ms on the axon tunnel, docs/PERFORMANCE.md) and lets
    XLA overlap the prep elementwise work with weight prefetch.

    Every shape the jit keys on is bucketed: `cond`/`text` arrive pre-padded
    to the duration bucket, and the true max duration is the DYNAMIC scalar
    `max_dur`, so predictor-resolved durations (arbitrary ints) all hit the
    same per-bucket executable instead of recompiling the pipeline per
    distinct duration. The mel is zeroed past `max_dur` and the vocoder runs
    at the bucket length with `valid_frames=max_dur`, which reproduces the
    trimmed-mel decode exactly (envelope-masked ISTFT, audio/istft.py);
    callers trim the returned full-bucket mel/wave host-side.

    Returns (mel_out [b, padded_len, d] zeroed past max_dur, trajectory,
    wave [b, (padded_len - 1) * hop] | None).
    """
    cond = cond.astype(jnp.float32)
    b, padded_len, d = cond.shape
    cond_mask = lens_to_mask(lens, padded_len)[..., None]
    step_cond = jnp.where(cond_mask, cond, jnp.zeros_like(cond))
    dur_mask = lens_to_mask(duration, padded_len)

    if y0 is None:
        if shared_noise:
            # fixed-seed quirk: the SAME noise for every batch item
            # (reference: cfm.py:369-375)
            noise = jax.random.normal(jax.random.key(seed), (padded_len, d))
            y0 = jnp.broadcast_to(noise, (b, padded_len, d))
        else:
            y0 = jax.random.normal(jax.random.key(seed), (b, padded_len, d))
    else:
        y0 = y0.astype(jnp.float32)
        y0 = jnp.pad(y0, ((0, 0), (0, padded_len - y0.shape[1]), (0, 0)))
    y0 = y0 * dur_mask[..., None]

    trajectory = cfm_sample_mel(
        params,
        dit_cfg,
        y0,
        step_cond,
        text,
        dur_mask,
        ts.astype(jnp.float32),
        method=method,
        cfg_strength=cfg_strength,
        has_mask=True,
        return_trajectory=return_trajectory,
    )
    frame_valid = (jnp.arange(padded_len) < max_dur)[None, :, None]
    out = jnp.where(cond_mask, cond, trajectory[-1])
    out = jnp.where(frame_valid, out, jnp.zeros_like(out))
    wave = (
        vocoder_apply(vocoder_params, out, max_dur) if vocoder_apply is not None else None
    )
    return out, trajectory, wave


def clamp_duration(
    duration: np.ndarray, lens: np.ndarray, text_lens: np.ndarray, max_duration: int
) -> np.ndarray:
    """The canonical duration clamp (reference: cfm.py:301-318): durations are
    at least max(text_lens, ref_lens) + 1 frames and at most max_duration.
    Shared by sample(), generate(), and the serving batcher so per-item wave
    trimming always agrees with what was generated."""
    eff_lens = np.maximum(np.asarray(text_lens, np.int32), np.asarray(lens, np.int32))
    duration = np.maximum(eff_lens + 1, np.asarray(duration, np.int32))
    return np.clip(duration, 0, max_duration)


def sway_time_grid(steps: int, sway_sampling_coef: float | None, t_start: float = 0.0) -> np.ndarray:
    """linspace warped by sway sampling t += s*(cos(pi/2 t) - 1 + t)
    (reference: cfm.py:379-381)."""
    t = np.linspace(t_start, 1.0, steps, dtype=np.float32)
    if sway_sampling_coef is not None:
        t = t + sway_sampling_coef * (np.cos(np.pi / 2 * t) - 1 + t)
    return t


# ------------------------------------------------------------------ F5TTS API


class F5TTS:
    """Conditional flow-matching TTS model (reference API: cfm.py:128-520).

    Holds the DiT parameter pytree plus host-side wiring (tokenizer vocab,
    mel front-end, optional vocoder and duration predictor). All compute is in
    pure jitted functions; this class only marshals data.
    """

    def __init__(
        self,
        dit_params: Params,
        dit_cfg: DiTConfig,
        cfm_cfg: CFMConfig = CFMConfig(),
        audio_cfg: AudioConfig = AudioConfig(),
        vocab_char_map: dict[str, int] | None = None,
        vocoder: Callable[[jax.Array], jax.Array] | None = None,
        duration_predictor=None,
    ):
        self.params = dit_params
        self.dit_cfg = dit_cfg
        self.cfm_cfg = cfm_cfg
        self.audio_cfg = audio_cfg
        self._mel_spec = MelSpec.from_config(audio_cfg)
        self.num_channels = audio_cfg.n_mels
        self._vocab_char_map = vocab_char_map
        self._vocoder = vocoder
        self._duration_predictor = duration_predictor
        self._cast_cache: tuple | None = None
        self._mesh = None

    # -- construction ------------------------------------------------------

    @classmethod
    def init(cls, key: jax.Array, dit_cfg: DiTConfig = DiTConfig(), **kwargs) -> "F5TTS":
        return cls(init_dit(key, dit_cfg), dit_cfg, **kwargs)

    @classmethod
    def from_pretrained(
        cls,
        hf_model_name_or_path: str = "lucasnewman/f5-tts-mlx",
        quantization_bits: int | None = None,
        revision: str | None = None,
        expected_sha256: dict[str, str] | None = None,
    ) -> "F5TTS":
        """Load converted pretrained weights from HuggingFace
        (reference: cfm.py:404-520). See models/convert.py for the mapping.

        `revision` pins the Hub ref; `expected_sha256` (relative filename ->
        digest) fails loudly if the snapshot's artifacts drift
        (utils/hub.verify_artifacts)."""
        from f5_tts_tpu.models.convert import load_f5tts_pretrained

        return load_f5tts_pretrained(
            hf_model_name_or_path,
            quantization_bits=quantization_bits,
            revision=revision,
            expected_sha256=expected_sha256,
        )

    def save_pretrained(self, path, quantization_bits: int | None = None) -> None:
        """Write a snapshot directory loadable by from_pretrained: weights in
        the published naming convention (+ optional quantized variant), the
        vocab, the duration model, and the vocoder weights when available.

        Closes the train -> publish -> load loop the reference only covers in
        the download direction."""
        import os
        from pathlib import Path

        from safetensors.numpy import save_file

        from f5_tts_tpu.models.convert import (
            export_dit_state,
            export_duration_state,
            rotary_inv_freq,
            to_mlx_model_naming,
            to_torch_ema_naming,
        )

        path = Path(path)
        os.makedirs(path, exist_ok=True)

        if quantization_bits is None:
            # published float convention: torch-EMA naming + torch conv
            # layouts, exactly what the reference's rename pass expects
            # (reference: cfm.py:477-508)
            flat = to_torch_ema_naming(export_dit_state(self.params), self.dit_cfg.dim_head)
            save_file({k: np.ascontiguousarray(v) for k, v in flat.items()},
                      path / "model_v1.safetensors")
        else:
            from f5_tts_tpu.models.quant import quantize_flat_mlx

            # published quantized convention: MLX naming with a "transformer."
            # prefix, loaded by the reference WITHOUT the rename pass
            # (reference: cfm.py:450-455 sets convert_weights=False)
            flat = to_mlx_model_naming(export_dit_state(self.params), self.dit_cfg.dim_head)
            qflat = quantize_flat_mlx(flat, quantization_bits)
            save_file({k: np.ascontiguousarray(v) for k, v in qflat.items()},
                      path / f"model_v1_{quantization_bits}b.safetensors")

        if self._vocab_char_map is not None:
            entries = sorted(self._vocab_char_map, key=self._vocab_char_map.get)
            (path / "vocab.txt").write_text("\n".join(entries))

        if self._duration_predictor is not None:
            dur_flat = {k: np.ascontiguousarray(np.asarray(v))
                        for k, v in export_duration_state(self._duration_predictor.params).items()}
            # the MLX duration model's strict load needs its rotary param too
            dur_flat["transformer.rotary_embed.inv_freq"] = rotary_inv_freq(
                self._duration_predictor.cfg.dim_head
            )
            save_file(dur_flat, path / "duration_v2.safetensors")

        # config.json (beyond the reference, whose loader hardcodes the base
        # config): lets from_pretrained round-trip ANY model size, and makes
        # the snapshot fully offline when the vocoder is recoverable
        import dataclasses
        import json

        from f5_tts_tpu.models.vocos import Vocos

        cfg_blob: dict = {
            "dit": dataclasses.asdict(self.dit_cfg),
            "audio": dataclasses.asdict(self.audio_cfg),
            "cfm": dataclasses.asdict(self.cfm_cfg),
        }
        if self._duration_predictor is not None:
            cfg_blob["duration"] = dataclasses.asdict(self._duration_predictor.cfg)

        vocos = self._vocoder if isinstance(self._vocoder, Vocos) else getattr(
            self._vocoder, "__self__", None
        )
        if isinstance(vocos, Vocos):
            from f5_tts_tpu.models.convert import export_vocos_state

            cfg_blob["vocos"] = dataclasses.asdict(vocos.cfg)
            os.makedirs(path / "vocos", exist_ok=True)
            save_file(
                {k: np.ascontiguousarray(np.asarray(v))
                 for k, v in export_vocos_state(vocos.params).items()},
                path / "vocos" / "model.safetensors",
            )

        (path / "config.json").write_text(json.dumps(cfg_blob, indent=2))

    # -- helpers -----------------------------------------------------------

    def _tokenize(self, text: list[str]) -> np.ndarray:
        if self._vocab_char_map is not None:
            return list_str_to_idx(text, self._vocab_char_map)
        return list_str_to_tensor(text)

    def _validate_text_ids(self, text_np: np.ndarray) -> None:
        """Host-side vocab check: ids must be in [-1, text_num_embeds - 1].
        The device-side gather clips (no NaN), but a vocab/config mismatch
        should fail loudly here rather than silently alias embeddings."""
        if text_np.size and int(text_np.max()) >= self.dit_cfg.text_num_embeds:
            raise ValueError(
                f"text id {int(text_np.max())} out of range for "
                f"text_num_embeds={self.dit_cfg.text_num_embeds}; the vocab "
                "used for tokenization does not match the model config"
            )

    def _inference_params(self) -> Params:
        """Params pre-transformed for inference, cached per params object:
        cast to the compute dtype and, with DiTConfig.int8_compute, the
        blocks' attention/FF kernels re-quantized to the W8A8 int8-MXU layout
        (models/quant.w8a8_blocks).

        With bf16 compute, reading fp32 master weights doubles the weight HBM
        traffic of every ODE step; the sampler uses a bf16 copy instead
        (numerically identical to the per-use astype it replaces).

        The cache key is the identity of every leaf of `self.params` (plus
        the cfg knobs that shape the transform): rebinding the attribute OR
        swapping any leaf under the same tree object invalidates it (JAX
        arrays are immutable, so a changed array is a changed leaf id).
        Keying costs one tree_leaves + id() sweep (~300 leaves, microseconds)
        per sample() call."""
        dtype = jnp.dtype(self.dit_cfg.compute_dtype)
        int8 = self.dit_cfg.int8_compute
        if dtype == jnp.float32 and not int8:
            return self.params
        key = (tuple(map(id, jax.tree.leaves(self.params))), dtype, int8)
        if self._cast_cache is None or self._cast_cache[0] != key:
            # one jitted call: per-leaf astype dispatches serialize terribly
            # through the axon tunnel (hundreds of seconds for the base tree)
            def prep(t):
                if dtype != jnp.float32:
                    t = jax.tree.map(
                        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, t
                    )
                if int8:
                    from f5_tts_tpu.models.quant import w8a8_blocks

                    t = w8a8_blocks(t)
                return t

            self._cast_cache = (key, jax.jit(prep)(self.params))
            # pin the exact leaf objects whose ids form the key: otherwise a
            # swapped-out leaf could be collected and a new array could reuse
            # its id, aliasing the key back onto a stale entry
            self._cast_params_ref = jax.tree.leaves(self.params)
        return self._cast_cache[1]

    def use_mesh(self, mesh) -> "F5TTS":
        """Turn on mesh-parallel inference (product surface for
        parallel/mesh.py; SURVEY §2c idiomatic-TPU scale-out — the reference
        is strictly single-device).

        Params are re-placed with the TP layout (attention heads / FF hidden
        sharded over the "model" axis, everything else replicated) and every
        fused `sample()` call DP-shards its batch over the "data" axis,
        padding the batch up to a multiple of it (padded rows replicate row 0
        and are trimmed from the outputs). Returns self."""
        from f5_tts_tpu.parallel.mesh import shard_model_for_inference

        shard_model_for_inference(self, mesh)
        self._mesh = mesh
        self._cast_cache = None
        return self

    def _fused_vocoder(self):
        """(vocoder_apply, vocoder_params) for the fused sampling jit, or
        (None, None).

        Only the in-repo Vocos fuses: the fused pipeline vocodes at the
        bucket length and needs `valid_frames` masking (models/vocos.py) to
        match a trimmed-mel decode, and its params must enter the jit as an
        ARGUMENT — a closure would embed them as jaxpr constants, which costs
        a device->host readback of the whole vocoder at every trace (minutes
        through the axon tunnel) and bloats each bucket's executable. Any
        other vocoder callable is applied outside the jit on the trimmed mel
        (exact, one extra dispatch)."""
        from f5_tts_tpu.models.vocos import Vocos

        vocos = getattr(self._vocoder, "__self__", None)
        if isinstance(vocos, Vocos):
            # one-time device commit: loaders keep params host-side (numpy),
            # and a numpy pytree argument would re-upload the whole vocoder
            # on EVERY sample call (~54 MB/call for the base vocoder)
            cached = getattr(self, "_vocoder_params_dev", None)
            if cached is None or cached[0] is not vocos.params:
                self._vocoder_params_dev = (vocos.params, jax.device_put(vocos.params))
            return vocos.decode_params, self._vocoder_params_dev[1]
        return None, None

    def _prepare_mel(self, inp: jax.Array) -> jax.Array:
        """Raw wave [b, nw] -> mel [b, n, d]; mel passes through.

        note: the reference's raw-wave branch transposes to [b, d, n]
        (cfm.py:177-180) which contradicts every downstream consumer and is
        never exercised (the trainer precomputes mel, trainer.py:242); here the
        correct [b, n, d] layout is produced directly.
        """
        if inp.ndim == 2:
            inp = self._mel_spec(inp)
        assert inp.shape[-1] == self.num_channels
        return inp

    # -- training loss (parity API; trainers call cfm_loss directly) --------

    def __call__(
        self,
        inp: jax.Array,
        text: jax.Array | list[str],
        *,
        lens: jax.Array | None = None,
        key: jax.Array | None = None,
    ) -> jax.Array:
        """CFM training loss (reference: cfm.py:169-251)."""
        inp = self._prepare_mel(jnp.asarray(inp))
        batch, seq_len = inp.shape[0], inp.shape[1]
        if isinstance(text, list):
            text = self._tokenize(text)
            assert text.shape[0] == batch
        self._validate_text_ids(np.asarray(text))
        text = jnp.asarray(text)
        if lens is None:
            lens = jnp.full((batch,), seq_len, dtype=jnp.int32)
        if key is None:
            key = jax.random.key(np.random.randint(0, 2**31 - 1))
        return cfm_loss(self.params, self.dit_cfg, self.cfm_cfg, key, inp, text, lens)

    # -- duration ----------------------------------------------------------

    def predict_duration(
        self,
        cond: jax.Array,
        text: jax.Array,
        speed: float = 1.0,
        *,
        lens: jax.Array | None = None,
    ) -> jax.Array:
        """Predicted duration in frames (reference: cfm.py:253-262).

        `lens` masks per-item reference length when `cond` is padded to a
        fixed window (the serving path; the reference API has no equivalent
        because it never batches mixed-length references)."""
        duration_in_sec = self._duration_predictor(cond, text, lens=lens)
        frame_rate = self.audio_cfg.sample_rate // self.audio_cfg.hop_length
        return (np.asarray(duration_in_sec) * frame_rate / speed).astype(np.int32)

    # -- sampling ----------------------------------------------------------

    def sample(
        self,
        cond: jax.Array,  # [b, n, d] mel or [1, nw] raw wave
        text: jax.Array | list[str],
        duration: int | jax.Array | None = None,
        *,
        lens: jax.Array | None = None,
        steps: int = 8,
        method: Literal["euler", "midpoint", "rk4"] = "rk4",
        cfg_strength: float = 2.0,
        speed: float = 1.0,
        sway_sampling_coef: float | None = -1.0,
        seed: int | None = None,
        max_duration: int | None = None,
        y0: jax.Array | None = None,
        cfg_interval: tuple[float, float] | None = None,
        return_trajectory: bool = True,
    ) -> tuple[jax.Array, jax.Array]:
        """Zero-shot synthesis (reference: cfm.py:264-402).

        Returns (waveform or mel, trajectory). The mel is trimmed to the true
        max duration; the trajectory is [steps, b, n, d]. `y0` overrides the
        initial noise (e.g. noise exported from the MLX reference for
        bit-level trajectory parity, since the PRNGs differ).

        `cfg_interval=(lo, hi)` is an OPT-IN accelerator beyond the reference:
        classifier-free guidance runs only for flow times t in [lo, hi]; steps
        outside integrate the conditional stream alone (half the compute per
        such step). Interval guidance is known to preserve or improve quality
        in diffusion samplers; default None matches the reference exactly.
        """
        max_duration = max_duration or self.cfm_cfg.max_duration
        cond = jnp.asarray(cond)
        is_wave = cond.ndim == 2
        if is_wave:
            # raw-wave input is single-item only, like the reference's
            # "1 n -> n" rearrange (cfm.py:283-284); batched callers pass mel
            if cond.shape[0] != 1:
                raise ValueError(
                    f"raw-wave cond must have batch 1, got {cond.shape[0]}; "
                    "pass precomputed mel [b, n, d] for batched sampling"
                )
            # the mel itself is computed inside the fused sampling jit; only
            # its frame count is needed host-side (frames == samples // hop,
            # reference: audio.py:202 drop-last-frame arithmetic)
            batch = 1
            cond_seq_len = cond.shape[1] // self.audio_cfg.hop_length
        else:
            assert cond.shape[-1] == self.num_channels
            cond = cond.astype(jnp.float32)
            batch, cond_seq_len = cond.shape[0], cond.shape[1]
        lens_np = (
            np.full((batch,), cond_seq_len, dtype=np.int32)
            if lens is None
            else np.asarray(lens, dtype=np.int32)
        )

        if isinstance(text, list):
            text = self._tokenize(text)
            assert text.shape[0] == batch
        text_np = np.asarray(text, dtype=np.int32)
        self._validate_text_ids(text_np)
        text_lens = (text_np != -1).sum(axis=-1).astype(np.int32)
        lens_np = np.maximum(text_lens, lens_np)

        if duration is None:
            if self._duration_predictor is None:
                raise ValueError(
                    "Duration must be provided or a duration predictor must be set."
                )
            if is_wave:
                cond = self._mel_spec(cond.reshape(-1))
                is_wave = False
            duration = self.predict_duration(cond, jnp.asarray(text_np), speed)
        if isinstance(duration, (int, np.integer)):
            duration = np.full((batch,), duration, dtype=np.int32)
        duration = clamp_duration(duration, lens_np, text_lens, max_duration)
        max_dur = int(duration.max())

        # static-shape bucketing: pad to a multiple of duration_bucket frames
        bucket = self.cfm_cfg.duration_bucket
        padded_len = max(bucket, math.ceil(max_dur / bucket) * bucket)
        if int(lens_np.max()) >= padded_len:
            # a reference longer than the max_duration-clamped window cannot
            # be conditioned on: silently truncating it would leave zero
            # generated frames (duration <= lens), and the segmented-CFG
            # path's negative pad would crash mid-jit with a shape error
            raise ValueError(
                f"reference audio ({int(lens_np.max())} frames) does not fit "
                f"the max_duration window ({max_duration} frames, "
                f"{max_duration / self.audio_cfg.frames_per_second:.1f}s "
                "including the generated region); pass a shorter reference "
                "clip or raise max_duration"
            )

        # pad text ids to the padded mel length host-side so jit sees one shape
        text_ids = np.full((batch, padded_len), -1, dtype=np.int32)
        ncopy = min(text_np.shape[1], padded_len)
        text_ids[:, :ncopy] = text_np[:, :ncopy]

        ts_np = sway_time_grid(steps, sway_sampling_coef)

        if cfg_interval is None or len(ts_np) < 2:
            # the hot serving path: prep + ODE + composite + vocoder in ONE
            # jit whose cache is keyed only on the duration BUCKET — the true
            # max duration is passed as a dynamic scalar, so predictor-
            # resolved durations (arbitrary ints) never trigger a pipeline
            # recompile (~1 min/shape on a cold chip)
            if is_wave:
                # the reference mel runs in its own small jit (keyed per
                # ref-clip length — a seconds-scale compile, vs the full
                # pipeline's); everything downstream sees bucketed shapes
                cond = self._mel_spec(cond.reshape(-1))
            cond = cond.astype(jnp.float32)
            if cond.shape[1] < padded_len:
                cond = jnp.pad(cond, ((0, 0), (0, padded_len - cond.shape[1]), (0, 0)))
            else:
                cond = cond[:, :padded_len]
            seed_val = int(seed) if seed is not None else np.random.randint(0, 2**31 - 1)
            lens_dev = jnp.asarray(lens_np)
            dur_dev = jnp.asarray(duration)
            text_dev = jnp.asarray(text_ids)
            y0_dev = None if y0 is None else jnp.asarray(y0)
            if self._mesh is not None:
                # DP over the mesh's data axis: pad the batch to a multiple of
                # it (padded rows replicate row 0; trimmed below) and place
                # batched inputs with the data sharding — jit then partitions
                # the whole fused pipeline over the mesh
                from f5_tts_tpu.parallel.mesh import batch_sharding

                dp = self._mesh.shape["data"]
                pad_b = -batch % dp
                if pad_b:
                    def _rep(a):
                        return jnp.concatenate(
                            [a, jnp.broadcast_to(a[:1], (pad_b,) + a.shape[1:])]
                        )

                    cond, lens_dev, dur_dev, text_dev = map(
                        _rep, (cond, lens_dev, dur_dev, text_dev)
                    )
                    if y0_dev is not None:
                        y0_dev = _rep(y0_dev)
                sh = batch_sharding(self._mesh)
                cond, lens_dev, dur_dev, text_dev = (
                    jax.device_put(a, sh) for a in (cond, lens_dev, dur_dev, text_dev)
                )
                if y0_dev is not None:
                    y0_dev = jax.device_put(y0_dev, sh)
            vocoder_apply, vocoder_params = self._fused_vocoder()
            out, trajectory, wave = cfm_sample_e2e(
                self._inference_params(),
                self.dit_cfg,
                cond,
                lens_dev,
                dur_dev,
                jnp.int32(max_dur),
                text_dev,
                jnp.asarray(ts_np),
                y0_dev,
                jnp.int32(seed_val),
                vocoder_params,
                method=method,
                cfg_strength=float(cfg_strength),
                return_trajectory=return_trajectory,
                shared_noise=seed is not None,
                vocoder_apply=vocoder_apply,
            )
            if out.shape[0] != batch:  # drop DP padding rows
                out = out[:batch]
                trajectory = trajectory[:, :batch]
                if wave is not None:
                    wave = wave[:batch]
            out = out[:, :max_dur]
            trajectory = trajectory[:, :, :max_dur]
            if wave is not None:
                wave = wave[:, : (max_dur - 1) * self.audio_cfg.hop_length]
            elif self._vocoder is not None:
                # vocoder callable without valid_frames support: decode the
                # trimmed mel outside the fused jit (one extra dispatch; its
                # compile is keyed per max_dur, but only this legacy path
                # pays it — the in-repo Vocos always fuses)
                wave = self._vocoder(out)
            if wave is not None:
                if batch == 1:
                    wave = wave.reshape(-1)
                return wave, trajectory
            return out, trajectory

        # segmented-CFG path (opt-in cfg_interval): step-by-step prep so the
        # integration can be split into host-scheduled CFG-on/off pieces
        if is_wave:
            cond = self._mel_spec(cond.reshape(-1))
        cond = jnp.pad(cond, ((0, 0), (0, padded_len - cond_seq_len), (0, 0)))
        cond_mask = lens_to_mask(jnp.asarray(lens_np), padded_len)[..., None]
        step_cond = jnp.where(cond_mask, cond, jnp.zeros_like(cond))

        dur_mask = lens_to_mask(jnp.asarray(duration), padded_len)

        # noise; per the reference's quirk, a fixed seed reuses the SAME noise
        # for every batch item (cfm.py:369-375)
        d = self.num_channels
        if y0 is not None:
            y0 = jnp.asarray(y0, dtype=jnp.float32)
            y0 = jnp.pad(y0, ((0, 0), (0, padded_len - y0.shape[1]), (0, 0)))
        elif seed is not None:
            noise = jax.random.normal(jax.random.key(seed), (padded_len, d))
            y0 = jnp.broadcast_to(noise, (batch, padded_len, d))
        else:
            y0 = jax.random.normal(
                jax.random.key(np.random.randint(0, 2**31 - 1)), (batch, padded_len, d)
            )
        y0 = y0 * dur_mask[..., None]

        text_dev = jnp.asarray(text_ids)
        if self._mesh is not None:
            # same DP treatment as the fused path above: pad the batch to a
            # multiple of the data axis (replicating row 0; trimmed below) and
            # place every batched input with the data sharding, so the
            # segmented integration partitions over the mesh instead of
            # silently running unsharded (round-3 finding).
            from f5_tts_tpu.parallel.mesh import batch_sharding

            dp = self._mesh.shape["data"]
            pad_b = -batch % dp
            arrays = [step_cond, cond, cond_mask, dur_mask, text_dev, y0]
            if pad_b:
                arrays = [
                    jnp.concatenate(
                        [a, jnp.broadcast_to(a[:1], (pad_b,) + a.shape[1:])]
                    )
                    for a in arrays
                ]
            sh = batch_sharding(self._mesh)
            step_cond, cond, cond_mask, dur_mask, text_dev, y0 = (
                jax.device_put(a, sh) for a in arrays
            )

        def integrate(y_start, ts_seg, cfg):
            return cfm_sample_mel(
                self._inference_params(),
                self.dit_cfg,
                y_start,
                step_cond,
                text_dev,
                dur_mask,
                jnp.asarray(ts_seg),
                method=method,
                cfg_strength=cfg,
                has_mask=True,
                return_trajectory=return_trajectory,
            )

        lo, hi = cfg_interval
        # contiguous host-side segments: CFG on where t in [lo, hi]
        active = (ts_np[:-1] >= lo) & (ts_np[:-1] <= hi)
        pieces = []
        y_cur = y0
        i = 0
        while i < len(ts_np) - 1:
            j = i
            while j < len(ts_np) - 1 and active[j] == active[i]:
                j += 1
            seg = integrate(y_cur, ts_np[i : j + 1],
                            float(cfg_strength) if active[i] else 0.0)
            pieces.append(seg if not pieces else seg[1:])  # drop dup boundary
            y_cur = seg[-1]
            i = j
        # y_cur is the final integration state in BOTH trajectory modes; with
        # return_trajectory=False each segment yields only its end state
        # ([1, b, n, d]), so concatenating `seg[1:]` pieces would reduce to
        # the FIRST segment's end state — never read the concat for the result
        sampled = y_cur
        trajectory = (
            jnp.concatenate(pieces, axis=0) if return_trajectory else y_cur[None]
        )
        out = jnp.where(cond_mask, cond, sampled)

        # trim DP padding rows and bucket padding away
        if out.shape[0] != batch:
            out = out[:batch]
            trajectory = trajectory[:, :batch]
        out = out[:, :max_dur]
        trajectory = trajectory[:, :, :max_dur]

        if self._vocoder is not None:
            wave = self._vocoder(out)
            if batch == 1:
                wave = wave.reshape(-1)
            return wave, trajectory

        return out, trajectory
