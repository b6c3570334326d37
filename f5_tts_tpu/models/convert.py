"""Checkpoint conversion: PyTorch-EMA / MLX safetensors -> JAX param pytrees.

The published F5-TTS weights (`lucasnewman/f5-tts-mlx`) are PyTorch-EMA
flat dicts; the duration model and the MLX vocos weights use MLX module
naming. The reference documents the torch->MLX mapping at cfm.py:477-508;
this module re-derives the mapping for the JAX tree defined in
models/dit.py / models/duration.py / models/vocos.py.

Key normalization trick: MLX inserts ".layers." into Sequential paths where
torch uses bare indices (reference: cfm.py:486-496); stripping ".layers."
makes both naming schemes identical, so one mapping handles either source.

Layout conversions:
  - linear:  [out, in]            -> kernel [in, out]        (transpose)
  - conv1d:  torch [out, in/g, k] -> kernel [k, in/g, out]
             MLX   [out, k, in/g] -> kernel [k, in/g, out]
    (disambiguated per-tensor by the known kernel size)
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from f5_tts_tpu.config import (
    DURATION_V2,
    F5TTS_V1_BASE,
    AudioConfig,
    CFMConfig,
    DiTConfig,
    DurationConfig,
    VocosConfig,
)
from f5_tts_tpu.utils.hub import fetch_from_hub
from f5_tts_tpu.utils.modules import Params


def _stack_blocks_np(block_list: list[Params]) -> Params:
    """Host-side counterpart of dit.stack_block_params: stack per-layer dicts
    into a leading depth axis with numpy. Loading stays free of device ops —
    hundreds of tiny device puts serialize catastrophically through the axon
    TPU tunnel; the whole tree instead moves to the device in one batch at the
    first jit call (or the jitted inference cast)."""
    return jax.tree.map(lambda *xs: np.stack(xs), *block_list)


# ----------------------------------------------------------------- primitives


class _State:
    """A consumable view of a flat checkpoint dict with normalized keys."""

    def __init__(
        self,
        raw: dict[str, np.ndarray],
        strip_prefixes: tuple[str, ...] = (),
        quant_bits: int | None = None,
    ):
        self.quant_bits = quant_bits
        self.d: dict[str, np.ndarray] = {}
        for k, v in raw.items():
            for p in strip_prefixes:
                k = k.removeprefix(p)
            k = k.replace(".layers.", ".")
            self.d[k] = np.asarray(v)

    def take(self, key: str) -> np.ndarray:
        if key not in self.d:
            raise KeyError(f"checkpoint is missing '{key}'; available near-misses: "
                           f"{[k for k in self.d if k.split('.')[-1] == key.split('.')[-1]][:5]}")
        return self.d.pop(key)

    def linear(self, key: str, bias: bool = True) -> Params:
        if f"{key}.scales" in self.d:
            # MLX-quantized linear: packed uint32 weight + group scales/biases
            from f5_tts_tpu.models.quant import unpack_mlx_uint32

            codes = unpack_mlx_uint32(self.take(f"{key}.weight"), self.quant_bits)  # [out, in] uint8
            offset = 1 << (self.quant_bits - 1)
            scales = self.take(f"{key}.scales")  # [out, in/64]
            biases = self.take(f"{key}.biases") + offset * scales  # absorb code offset
            p: Params = {
                "q": np.ascontiguousarray((codes.astype(np.int16) - offset).astype(np.int8).T),
                "scales": np.ascontiguousarray(scales.T),  # [in/64, out]
                "biases": np.ascontiguousarray(biases.T),
            }
        else:
            p = {"kernel": np.ascontiguousarray(self.take(f"{key}.weight").T)}
        if bias and f"{key}.bias" in self.d:
            p["bias"] = np.asarray(self.take(f"{key}.bias"))
        return p

    def norm(self, key: str) -> Params:
        return {
            "scale": np.asarray(self.take(f"{key}.weight")),
            "bias": np.asarray(self.take(f"{key}.bias")),
        }

    def conv1d(self, key: str, kernel_size: int) -> Params:
        w = self.take(f"{key}.weight")
        if w.shape[-1] == kernel_size:  # torch [out, in/g, k]
            kernel = np.transpose(w, (2, 1, 0))
        elif w.shape[1] == kernel_size:  # MLX [out, k, in/g]
            kernel = np.transpose(w, (1, 2, 0))
        else:
            raise ValueError(f"cannot infer conv layout for '{key}' with shape {w.shape}")
        p = {"kernel": np.ascontiguousarray(kernel)}
        if f"{key}.bias" in self.d:
            p["bias"] = np.asarray(self.take(f"{key}.bias"))
        return p

    def remaining(self) -> list[str]:
        return sorted(self.d)


def _convnext_v2_block(s: _State, prefix: str) -> Params:
    return {
        "dwconv": s.conv1d(f"{prefix}.dwconv", 7),
        "norm": s.norm(f"{prefix}.norm"),
        "pwconv1": s.linear(f"{prefix}.pwconv1"),
        "grn": {
            "gamma": np.asarray(s.take(f"{prefix}.grn.gamma")).reshape(1, 1, -1),
            "beta": np.asarray(s.take(f"{prefix}.grn.beta")).reshape(1, 1, -1),
        },
        "pwconv2": s.linear(f"{prefix}.pwconv2"),
    }


def _text_embedding(s: _State, prefix: str, conv_layers: int, text_dim: int, max_pos: int) -> Params:
    del text_dim, max_pos  # positional table is a static constant, not a leaf
    p: Params = {"embed": {"embedding": np.asarray(s.take(f"{prefix}.text_embed.weight"))}}
    if conv_layers > 0:
        p["blocks"] = [
            _convnext_v2_block(s, f"{prefix}.text_blocks.{i}") for i in range(conv_layers)
        ]
    return p


def _conv_pos_embed(s: _State, prefix: str) -> Params:
    return {
        "conv1": s.conv1d(f"{prefix}.conv1d.0", 31),
        "conv2": s.conv1d(f"{prefix}.conv1d.2", 31),
    }


def _attention(s: _State, prefix: str) -> Params:
    return {
        "to_q": s.linear(f"{prefix}.to_q"),
        "to_k": s.linear(f"{prefix}.to_k"),
        "to_v": s.linear(f"{prefix}.to_v"),
        "to_out": s.linear(f"{prefix}.to_out.0"),
    }


def _feed_forward(s: _State, prefix: str) -> Params:
    return {
        "w1": s.linear(f"{prefix}.ff.0.0"),
        "w2": s.linear(f"{prefix}.ff.2"),
    }


# ----------------------------------------------------------------- DiT / CFM


def convert_dit_state(
    raw: dict[str, np.ndarray], cfg: DiTConfig, quant_bits: int | None = None
) -> Params:
    """Full F5TTS DiT checkpoint -> param pytree (reference mapping:
    cfm.py:477-508). Accepts torch-EMA or MLX naming, float or MLX-quantized."""
    filtered = {
        k: v
        for k, v in raw.items()
        if k.removeprefix("ema_model.")
        and not k.removeprefix("ema_model.").startswith("mel_spec.")
        and k.removeprefix("ema_model.") not in ("initted", "step")
    }
    s = _State(filtered, strip_prefixes=("ema_model.", "transformer."), quant_bits=quant_bits)

    blocks = [
        {
            "attn_norm": {"linear": s.linear(f"transformer_blocks.{i}.attn_norm.linear")},
            "attn": _attention(s, f"transformer_blocks.{i}.attn"),
            "ff": _feed_forward(s, f"transformer_blocks.{i}.ff"),
        }
        for i in range(cfg.depth)
    ]

    params = {
        "time_embed": {
            "mlp1": s.linear("time_embed.time_mlp.0"),
            "mlp2": s.linear("time_embed.time_mlp.2"),
        },
        "text_embed": _text_embedding(s, "text_embed", cfg.conv_layers, cfg.text_dim, cfg.max_pos),
        "input_embed": {
            "proj": s.linear("input_embed.proj"),
            "conv_pos_embed": _conv_pos_embed(s, "input_embed.conv_pos_embed"),
        },
        "blocks": _stack_blocks_np(blocks),
        "norm_out": {"linear": s.linear("norm_out.linear")},
        "proj_out": s.linear("proj_out"),
    }
    leftovers = [k for k in s.remaining() if not k.startswith("rotary_embed.")]
    if leftovers:
        raise ValueError(f"unconsumed checkpoint keys: {leftovers[:10]}")
    return params


# ----------------------------------------------------------------- duration


def convert_duration_state(raw: dict[str, np.ndarray], cfg: DurationConfig) -> Params:
    """duration_v2.safetensors (MLX naming) -> param pytree
    (reference model structure: duration.py:97-190)."""
    s = _State(raw, strip_prefixes=())

    blocks = [
        {
            "attn": _attention(s, f"transformer.transformer_blocks.{i}.attn"),
            "ff": _feed_forward(s, f"transformer.transformer_blocks.{i}.ff"),
        }
        for i in range(cfg.depth)
    ]

    params = {
        "text_embed": _text_embedding(
            s, "transformer.text_embed", cfg.conv_layers, cfg.text_dim, cfg.max_pos
        ),
        "input_embed": {
            "proj": s.linear("transformer.input_embed.proj"),
            "conv_pos_embed": _conv_pos_embed(s, "transformer.input_embed.conv_pos_embed"),
        },
        "blocks": _stack_blocks_np(blocks),
        "norm_out": {"scale": np.asarray(s.take("transformer.norm_out.weight"))},
        "to_pred": s.linear("to_pred.0", bias=False),
    }
    leftovers = [k for k in s.remaining() if not k.startswith("transformer.rotary_embed.")]
    if leftovers:
        raise ValueError(f"unconsumed checkpoint keys: {leftovers[:10]}")
    return params


# ----------------------------------------------------------------- vocos


def convert_vocos_state(raw: dict[str, np.ndarray], cfg: VocosConfig) -> Params:
    """Vocos mel-24khz checkpoint (torch or MLX naming) -> param pytree."""
    filtered = {
        k: v
        for k, v in raw.items()
        if not k.startswith("feature_extractor.") and "istft.window" not in k
    }
    s = _State(filtered, strip_prefixes=())

    params = {
        "embed": s.conv1d("backbone.embed", 7),
        "norm": s.norm("backbone.norm"),
        "convnext": [
            {
                "dwconv": s.conv1d(f"backbone.convnext.{i}.dwconv", 7),
                "norm": s.norm(f"backbone.convnext.{i}.norm"),
                "pwconv1": s.linear(f"backbone.convnext.{i}.pwconv1"),
                "pwconv2": s.linear(f"backbone.convnext.{i}.pwconv2"),
                "gamma": np.asarray(s.take(f"backbone.convnext.{i}.gamma")).reshape(-1),
            }
            for i in range(cfg.num_layers)
        ],
        "final_layer_norm": s.norm("backbone.final_layer_norm"),
        "head": s.linear("head.out"),
    }
    if s.remaining():
        raise ValueError(f"unconsumed checkpoint keys: {s.remaining()[:10]}")
    return params


# ----------------------------------------------------------------- export

# Export param pytrees to MLX-style flat dicts (with ".layers." Sequential
# segments and MLX conv layout [out, k, in/g]). Checkpoints written this way
# load in the MLX reference and round-trip through convert_dit_state, which is
# also how the mapping is unit-tested.


def _export_linear(out: dict, key: str, p: Params) -> None:
    # ascontiguousarray: safetensors silently serializes the BASE buffer of
    # non-contiguous views, corrupting transposed kernels on disk
    out[f"{key}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
    if "bias" in p:
        out[f"{key}.bias"] = np.asarray(p["bias"])


def _export_norm(out: dict, key: str, p: Params) -> None:
    out[f"{key}.weight"] = np.asarray(p["scale"])
    out[f"{key}.bias"] = np.asarray(p["bias"])


def _export_conv1d(out: dict, key: str, p: Params) -> None:
    out[f"{key}.weight"] = np.ascontiguousarray(
        np.transpose(np.asarray(p["kernel"]), (2, 0, 1))
    )  # -> [out, k, in/g]
    if "bias" in p:
        out[f"{key}.bias"] = np.asarray(p["bias"])


def _export_convnext_v2(out: dict, key: str, p: Params) -> None:
    _export_conv1d(out, f"{key}.dwconv", p["dwconv"])
    _export_norm(out, f"{key}.norm", p["norm"])
    _export_linear(out, f"{key}.pwconv1", p["pwconv1"])
    out[f"{key}.grn.gamma"] = np.asarray(p["grn"]["gamma"])
    out[f"{key}.grn.beta"] = np.asarray(p["grn"]["beta"])
    _export_linear(out, f"{key}.pwconv2", p["pwconv2"])


def _export_text_embedding(out: dict, key: str, p: Params) -> None:
    out[f"{key}.text_embed.weight"] = np.asarray(p["embed"]["embedding"])
    for i, bp in enumerate(p.get("blocks", [])):
        _export_convnext_v2(out, f"{key}.text_blocks.layers.{i}", bp)


def _export_input_embed(out: dict, key: str, p: Params) -> None:
    _export_linear(out, f"{key}.proj", p["proj"])
    _export_conv1d(out, f"{key}.conv_pos_embed.conv1d.layers.0", p["conv_pos_embed"]["conv1"])
    _export_conv1d(out, f"{key}.conv_pos_embed.conv1d.layers.2", p["conv_pos_embed"]["conv2"])


def _export_attention(out: dict, key: str, p: Params) -> None:
    for name in ("to_q", "to_k", "to_v"):
        _export_linear(out, f"{key}.{name}", p[name])
    _export_linear(out, f"{key}.to_out.layers.0", p["to_out"])


def _export_feed_forward(out: dict, key: str, p: Params) -> None:
    _export_linear(out, f"{key}.ff.layers.0.layers.0", p["w1"])
    _export_linear(out, f"{key}.ff.layers.2", p["w2"])


def _unstack_blocks(stacked: Params) -> list[Params]:
    depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    return [jax.tree.map(lambda x, i=i: np.asarray(x[i]), stacked) for i in range(depth)]


def _to_host(params: Params) -> Params:
    """One bulk device->host pull of the whole tree (async copies pipelined by
    jax.device_get). Exporting leaf-by-leaf instead issues hundreds of tiny
    blocking slice+transfer round-trips, which serialize catastrophically
    through the axon TPU tunnel (measured: ~600 s for the base model vs
    seconds in bulk). No-op on trees that are already numpy."""
    return jax.device_get(params)


def export_dit_state(params: Params) -> dict[str, np.ndarray]:
    """DiT param pytree -> MLX-named flat dict (inverse of convert_dit_state)."""
    params = _to_host(params)
    out: dict[str, np.ndarray] = {}
    _export_linear(out, "time_embed.time_mlp.layers.0", params["time_embed"]["mlp1"])
    _export_linear(out, "time_embed.time_mlp.layers.2", params["time_embed"]["mlp2"])
    _export_text_embedding(out, "text_embed", params["text_embed"])
    _export_input_embed(out, "input_embed", params["input_embed"])
    for i, bp in enumerate(_unstack_blocks(params["blocks"])):
        key = f"transformer_blocks.{i}"
        _export_linear(out, f"{key}.attn_norm.linear", bp["attn_norm"]["linear"])
        _export_attention(out, f"{key}.attn", bp["attn"])
        _export_feed_forward(out, f"{key}.ff", bp["ff"])
    _export_linear(out, "norm_out.linear", params["norm_out"]["linear"])
    _export_linear(out, "proj_out", params["proj_out"])
    return out


def export_duration_state(params: Params) -> dict[str, np.ndarray]:
    """Duration param pytree -> MLX-named flat dict (inverse of
    convert_duration_state)."""
    params = _to_host(params)
    out: dict[str, np.ndarray] = {}
    _export_text_embedding(out, "transformer.text_embed", params["text_embed"])
    _export_input_embed(out, "transformer.input_embed", params["input_embed"])
    for i, bp in enumerate(_unstack_blocks(params["blocks"])):
        key = f"transformer.transformer_blocks.{i}"
        _export_attention(out, f"{key}.attn", bp["attn"])
        _export_feed_forward(out, f"{key}.ff", bp["ff"])
    out["transformer.norm_out.weight"] = np.asarray(params["norm_out"]["scale"])
    _export_linear(out, "to_pred.layers.0", params["to_pred"])
    return out


# ------------------------------------------------- published-artifact naming

# The published model_v1.safetensors uses raw torch-EMA naming: bare
# Sequential indices (no MLX ".layers."), torch conv layouts, and an
# "ema_model." prefix. The reference's loader renames/reshapes those into MLX
# form (reference: cfm.py:477-508); these helpers are the exact inverse, so
# files we write are loadable by the reference's from_pretrained.
_MLX_RENAMES = (
    # (torch fragment, MLX fragment) — forward direction per cfm.py:486-496
    (".to_out", ".to_out.layers"),
    (".text_blocks", ".text_blocks.layers"),
    (".ff.ff.0.0", ".ff.ff.layers.0.layers.0"),
    (".ff.ff.2", ".ff.ff.layers.2"),
    (".time_mlp", ".time_mlp.layers"),
    (".conv1d", ".conv1d.layers"),
)

# keys whose values the reference transposes torch->MLX (cfm.py:499-504),
# in torch naming
_TORCH_CONV_SUFFIXES = (".dwconv.weight", ".conv1d.0.weight", ".conv1d.2.weight")


def export_vocos_state(params: Params) -> dict[str, np.ndarray]:
    """Vocos param pytree -> flat checkpoint in the published naming
    (inverse of convert_vocos_state; round-trip tested)."""
    params = _to_host(params)
    out: dict[str, np.ndarray] = {}
    _export_conv1d(out, "backbone.embed", params["embed"])
    _export_norm(out, "backbone.norm", params["norm"])
    for i, blk in enumerate(params["convnext"]):
        _export_conv1d(out, f"backbone.convnext.{i}.dwconv", blk["dwconv"])
        _export_norm(out, f"backbone.convnext.{i}.norm", blk["norm"])
        _export_linear(out, f"backbone.convnext.{i}.pwconv1", blk["pwconv1"])
        _export_linear(out, f"backbone.convnext.{i}.pwconv2", blk["pwconv2"])
        out[f"backbone.convnext.{i}.gamma"] = np.asarray(blk["gamma"])
    _export_norm(out, "backbone.final_layer_norm", params["final_layer_norm"])
    _export_linear(out, "head.out", params["head"])
    return out


def rotary_inv_freq(dim_head: int) -> np.ndarray:
    """The RotaryEmbedding.inv_freq parameter of the reference model
    (reference: rope.py:24). Our functional tree derives RoPE tables on the
    fly, but the MLX model's strict load_weights requires this key, so
    exporters reconstruct it."""
    return (1.0 / (10000.0 ** (np.arange(0, dim_head, 2, dtype=np.float32) / dim_head))).astype(
        np.float32
    )


def to_torch_ema_naming(flat: dict[str, np.ndarray], dim_head: int) -> dict[str, np.ndarray]:
    """MLX-named DiT export -> the published model_v1.safetensors convention
    (torch-EMA naming + torch conv layouts + rotary inv_freq)."""
    out: dict[str, np.ndarray] = {}
    for k, v in flat.items():
        for torch_frag, mlx_frag in _MLX_RENAMES:
            k = k.replace(mlx_frag, torch_frag)
        v = np.asarray(v)
        if k.endswith(_TORCH_CONV_SUFFIXES):
            v = np.ascontiguousarray(np.swapaxes(v, 1, 2))  # MLX [o,k,i/g] -> torch [o,i/g,k]
        out[f"ema_model.transformer.{k}"] = v
    out["ema_model.transformer.rotary_embed.inv_freq"] = rotary_inv_freq(dim_head)
    return out


def to_mlx_model_naming(flat: dict[str, np.ndarray], dim_head: int) -> dict[str, np.ndarray]:
    """MLX-named DiT export -> full-model MLX naming ("transformer." prefix +
    rotary inv_freq), the convention of the published quantized artifacts and
    of checkpoints the reference trainer writes/loads (trainer.py:67-79)."""
    out = {f"transformer.{k}": np.asarray(v) for k, v in flat.items()}
    out["transformer.rotary_embed.inv_freq"] = rotary_inv_freq(dim_head)
    return out


# ----------------------------------------------------------------- loading


def _load_flat_checkpoint(path: Path) -> dict[str, np.ndarray]:
    if path.suffix in (".safetensors", ".saftensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    # torch .bin/.pt fallback (e.g. charactr/vocos-mel-24khz)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def load_f5tts_pretrained(
    hf_model_name_or_path: str = "lucasnewman/f5-tts-mlx",
    quantization_bits: int | None = None,
    revision: str | None = None,
    expected_sha256: dict[str, str] | None = None,
):
    """Build a ready-to-sample F5TTS from the published checkpoint
    (reference: cfm.py:404-520): vocab, optional duration predictor, vocoder,
    DiT weights, optional int4/int8 weight-only quantization.

    The published artifacts carry no config file, so configs default to the
    reference's hardcoded base (cfm.py:425-442,460-469); a snapshot written
    by save_pretrained additionally carries a config.json, which takes
    precedence — enabling round-trips at ANY model size."""
    import json as _json

    from f5_tts_tpu.models.cfm import F5TTS
    from f5_tts_tpu.models.duration import DurationPredictor
    from f5_tts_tpu.models.vocos import Vocos

    path = fetch_from_hub(
        hf_model_name_or_path,
        quantization_bits=quantization_bits,
        revision=revision,
        expected_sha256=expected_sha256,
    )

    from f5_tts_tpu.utils.tokenizer import load_vocab

    # a snapshot written from a byte-tokenizer model carries no vocab.txt;
    # vocab=None selects the UTF-8 byte tokenizer on load as well
    vocab_path = path / "vocab.txt"
    vocab = load_vocab(vocab_path) if vocab_path.exists() else None

    cfg_blob: dict = {}
    cfg_path = path / "config.json"
    if cfg_path.exists():
        cfg_blob = _json.loads(cfg_path.read_text())
    audio_cfg = AudioConfig(**cfg_blob.get("audio", {}))

    duration_predictor = None
    duration_model_path = path / "duration_v2.safetensors"
    if duration_model_path.exists():
        if "duration" in cfg_blob:
            dur_cfg = DurationConfig(**cfg_blob["duration"])
        elif vocab is not None:
            dur_cfg = DurationConfig(text_num_embeds=len(vocab) - 1)
        else:
            dur_cfg = DurationConfig()
        duration_predictor = DurationPredictor(
            convert_duration_state(_load_flat_checkpoint(duration_model_path), dur_cfg),
            dur_cfg,
            audio_cfg=audio_cfg,
            vocab_char_map=vocab,
        )

    # a "vocos" subdirectory inside the snapshot takes precedence, enabling
    # fully offline loading; otherwise fetch the published vocoder repo
    vocos_local = path / "vocos"
    vocos_cfg = VocosConfig(**cfg_blob["vocos"]) if "vocos" in cfg_blob else None
    vocoder = load_vocos_pretrained(
        str(vocos_local) if vocos_local.exists() else "lucasnewman/vocos-mel-24khz",
        cfg=vocos_cfg,
    )

    model_filename = "model_v1.safetensors"
    if quantization_bits is not None:
        model_filename = f"model_v1_{quantization_bits}b.safetensors"

    if "dit" in cfg_blob:
        dit_cfg = DiTConfig(**cfg_blob["dit"])
    elif vocab is not None:
        dit_cfg = F5TTS_V1_BASE.replace(text_num_embeds=len(vocab) - 1)
    else:
        dit_cfg = F5TTS_V1_BASE
    raw = _load_flat_checkpoint(path / model_filename)

    if quantization_bits is not None:
        from f5_tts_tpu.models.quant import convert_quantized_dit_state

        params = convert_quantized_dit_state(raw, dit_cfg, bits=quantization_bits)
    else:
        params = convert_dit_state(raw, dit_cfg)

    cfm_blob = dict(cfg_blob.get("cfm", {}))
    if "frac_lengths_mask" in cfm_blob:  # JSON stores the tuple as a list
        cfm_blob["frac_lengths_mask"] = tuple(cfm_blob["frac_lengths_mask"])

    return F5TTS(
        params,
        dit_cfg,
        cfm_cfg=CFMConfig(**cfm_blob),
        audio_cfg=audio_cfg,
        vocab_char_map=vocab,
        vocoder=vocoder.decode,
        duration_predictor=duration_predictor,
    )


def load_vocos_pretrained(
    repo_id: str = "lucasnewman/vocos-mel-24khz", cfg: VocosConfig | None = None
):
    """Fetch + convert the Vocos vocoder weights."""
    from f5_tts_tpu.models.vocos import Vocos

    local = Path(repo_id)
    if not local.exists():
        from huggingface_hub import snapshot_download

        local = Path(snapshot_download(repo_id=repo_id))

    cfg = cfg or VocosConfig()
    for name in ("model.safetensors", "pytorch_model.bin", "weights.safetensors"):
        ckpt = local / name
        if ckpt.exists():
            return Vocos(convert_vocos_state(_load_flat_checkpoint(ckpt), cfg), cfg)
    raise FileNotFoundError(f"no vocos checkpoint found under {local}")
