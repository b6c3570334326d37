"""AOT deployment artifacts: serialize the fused sampling pipeline with
`jax.export` (StableHLO).

`F5TTS.sample` dispatches the whole serving pipeline (conditioning prep ->
ODE integration -> composite -> vocoder) as ONE jitted computation
(`models/cfm.cfm_sample_e2e`). This module exports that computation — with
the model AND vocoder weights baked in as constants — to a single
self-contained StableHLO artifact that `jax.export.deserialize` can reload
and run **without any Python model code, checkpoint files, or tokenizer
assets on the serving host**. That is the production deployment story the
reference cannot offer: its inference path needs the full MLX Python stack
and HF checkpoint downloads at startup (reference: cfm.py:404-520,
generate.py:113-244), while an `Exported` artifact needs only jax + the
target runtime, and its compilation environment is pinned at export time.

Shapes are baked per artifact exactly like the live jit cache is keyed: one
(batch, padded_len, steps) bucket per export (see cfm_sample_e2e's bucketing
contract — the true max duration stays a DYNAMIC scalar input, so one
artifact serves every utterance that fits its bucket). Export several
buckets for a production fleet, the same way `serve.py --warmup` pre-compiles
them.

Portability notes:
- An artifact lowered on TPU embeds the Pallas/Mosaic flash-attention kernel
  and runs on TPUs of the same generation family; pass `use_flash=False` to
  lower the pure-XLA attention path instead, which also enables
  cross-platform export (`platforms=("cpu", "tpu")`) from a CPU host.
  Flash-embedded artifacts execute on the AOT (chipless Mosaic) path too:
  the additive-f32 masking kernel (ops/flash_attention.py) removed the i1
  mask relayout that AOT Mosaic used to reject, and tools/export_verify.py
  confirms a deserialized flash artifact runs on-chip and matches the live
  flash path within the known bf16 spread (measured 2026-08-18; history in
  docs/SERVING.md).
- With `embed_weights=True` (default) weights are embedded at the model's
  inference dtype (bf16 by default), so the artifact — and the StableHLO
  program a remote AOT compiler must ingest — is roughly checkpoint-sized.
  Remote-compile services with request-size caps (e.g. the axon dev
  tunnel's HTTP body limit, measured: base-scale embedded artifacts get
  413) need `embed_weights=False`: the program stays kilobytes and the
  weights ride beside it in the same file as a payload `load_sampler`
  re-binds.

reference: no counterpart (SURVEY.md §5 lists no deployment/serialization
subsystem in the reference; this is TPU-idiomatic scope beyond parity).
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from f5_tts_tpu.models.cfm import F5TTS, cfm_sample_e2e, clamp_duration, sway_time_grid


def export_sampler(
    model: F5TTS,
    *,
    batch: int,
    padded_len: int | None = None,
    steps: int = 8,
    method: str = "rk4",
    cfg_strength: float = 2.0,
    shared_noise: bool = True,
    with_vocoder: bool = True,
    use_flash: bool | None = None,
    platforms: tuple[str, ...] | None = None,
    embed_weights: bool = True,
) -> jexport.Exported:
    """Serialize one (batch, padded_len, steps) sampling bucket.

    The exported computation has the signature

        (cond f32[b, L, d], lens i32[b], duration i32[b], max_dur i32[],
         text i32[b, L], ts f32[steps], seed i32[])
            -> (mel f32[b, L, d], wave f32[b, (L-1)*hop])   # or mel only

    i.e. exactly the device-side inputs `F5TTS.sample`'s fused path feeds
    (models/cfm.py:cfm_sample_e2e); `prep_inputs` below reproduces the
    host-side prep. `shared_noise=True` bakes the reference's fixed-seed
    quirk (the same noise for every batch item, reference: cfm.py:369-375),
    matching `sample(seed=...)`.

    `embed_weights=False` exports with the weight pytree as a LEADING
    argument instead of baked constants: the call signature gains a
    `weights` pytree up front, the StableHLO stays small (fast AOT compiles,
    one weights payload shared by a fleet's many bucket artifacts), and
    `save_sampler` stores the weights beside the program in the same file —
    `load_sampler` then returns a bound sampler whose `.call` takes only the
    device args above, so serving code is identical either way.

    `padded_len` defaults to one duration bucket (`cfm_cfg.duration_bucket`).
    Returns the `jax.export.Exported`; call `.serialize()` for bytes, or use
    `save_sampler` / `load_sampler`.
    """
    cfg = model.dit_cfg
    if use_flash is not None:
        cfg = cfg.replace(use_flash_attention=use_flash)
    bucket = model.cfm_cfg.duration_bucket
    if padded_len is None:
        padded_len = bucket
    if padded_len % bucket:
        padded_len = math.ceil(padded_len / bucket) * bucket
    d = model.num_channels

    params = model._inference_params()
    vocoder_apply, vocoder_params = (
        model._fused_vocoder() if with_vocoder else (None, None)
    )

    def run(params, vocoder_params, cond, lens, duration, max_dur, text, ts, seed):
        out, _, wave = cfm_sample_e2e(
            params,
            cfg,
            cond,
            lens,
            duration,
            max_dur,
            text,
            ts,
            None,
            seed,
            vocoder_params,
            method=method,
            cfg_strength=float(cfg_strength),
            return_trajectory=False,
            shared_noise=shared_noise,
            vocoder_apply=vocoder_apply,
        )
        return (out, wave) if wave is not None else out

    args = (
        jax.ShapeDtypeStruct((batch, padded_len, d), jnp.float32),  # cond
        jax.ShapeDtypeStruct((batch,), jnp.int32),  # lens
        jax.ShapeDtypeStruct((batch,), jnp.int32),  # duration
        jax.ShapeDtypeStruct((), jnp.int32),  # max_dur
        jax.ShapeDtypeStruct((batch, padded_len), jnp.int32),  # text
        jax.ShapeDtypeStruct((steps,), jnp.float32),  # ts
        jax.ShapeDtypeStruct((), jnp.int32),  # seed
    )
    kwargs = {} if platforms is None else {"platforms": platforms}

    if embed_weights:
        def fn(cond, lens, duration, max_dur, text, ts, seed):
            return run(params, vocoder_params, cond, lens, duration, max_dur,
                       text, ts, seed)

        return jexport.export(jax.jit(fn), **kwargs)(*args)

    # weights-as-arguments: the program stays kilobytes of StableHLO instead
    # of embedding hundreds of MB of constants — compiles fast everywhere
    # (base-scale embedded artifacts exceed e.g. the axon dev tunnel's
    # remote-compile body cap), and a fleet serving several (batch, bucket)
    # artifacts ships ONE weights payload, not one per bucket
    weights = {"model": params}
    if vocoder_params is not None:
        weights["vocoder"] = vocoder_params

    def fn(weights, cond, lens, duration, max_dur, text, ts, seed):
        return run(weights["model"], weights.get("vocoder"), cond, lens,
                   duration, max_dur, text, ts, seed)

    w_avals = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype), weights
    )
    return jexport.export(jax.jit(fn), **kwargs)(w_avals, *args)


_MAGIC = b"F5X1"

# fixed device-arg signature of every exported sampler:
# (cond, lens, duration, max_dur, text, ts, seed)
_N_CALL_ARGS = 7

# fixed device-arg signature of every exported duration predictor:
# (cond, text, lens)
_N_DURATION_ARGS = 3

# SamplerSpec fields load_sampler fills from the program's input avals, never
# from the header — header copies would collide as duplicate kwargs
_DERIVED_SPEC_FIELDS = {"batch", "padded_len", "steps", "mel_dim"}


def _leaf_dtype(name: str) -> np.dtype:
    """Resolve a recorded leaf dtype, including the ml_dtypes families
    (bfloat16, float8_*) numpy itself does not name."""
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


def _weights_pytree(model: F5TTS, exported: jexport.Exported):
    """Rebuild the weights pytree an `embed_weights=False` export consumed.

    The Exported carries only the weight AVALS (shapes/dtypes), never the
    arrays, so saving needs the model to materialize them; the rebuilt tree
    is validated leaf-by-leaf against the program's leading input avals so a
    mismatched model fails loudly here instead of garbling audio on a
    serving host."""
    n_w = len(exported.in_avals) - _N_CALL_ARGS
    params = model._inference_params()
    candidates = [{"model": params}]
    _, vocoder_params = model._fused_vocoder()
    if vocoder_params is not None:
        candidates.insert(0, {"model": params, "vocoder": vocoder_params})
    for weights in candidates:
        leaves = jax.tree.leaves(weights)
        if len(leaves) != n_w:
            continue
        if all(
            jnp.shape(leaf) == aval.shape and jnp.asarray(leaf).dtype == aval.dtype
            for leaf, aval in zip(leaves, exported.in_avals[:n_w])
        ):
            return weights
    raise ValueError(
        "model weights do not match the artifact's weight inputs "
        f"({n_w} leading avals); was the artifact exported from this model?"
    )


def save_sampler(
    exported: jexport.Exported, path, *, model: F5TTS | None = None,
    extra_meta: dict | None = None,
) -> None:
    """Write an artifact file: a tiny JSON header (the model's audio-domain
    constants, so a non-default AudioConfig deployment trims waves with the
    right hop — the constants cannot live inside the StableHLO), then, for
    `embed_weights=False` exports, the weights payload (raw little-endian
    leaf bytes, layout recorded in the header — safetensors' numpy loader
    cannot read BF16), then the serialized Exported. Pass the model so the
    header records its true constants; omitting it assumes the 24 kHz
    defaults at load time, which is WRONG for any non-default AudioConfig —
    a warning is emitted because that mistake is invisible until
    deployment-side wave trimming garbles audio. Weights-as-args exports
    REQUIRE the model (the Exported carries only the weight avals).

    `extra_meta` records informational fields in the header (e.g.
    {"method": "rk4", "cfg_strength": 2.0} — the ODE/CFG settings are baked
    into the program and otherwise not introspectable); fields matching
    SamplerSpec names surface on load, unknown ones are ignored. Keys the
    loader derives from the program/file itself (batch, padded_len, steps,
    mel_dim, format, weights) are reserved and rejected here — a header
    carrying them would make the artifact unloadable."""
    import json
    import warnings

    meta = dict(extra_meta or {})
    reserved = _DERIVED_SPEC_FIELDS | {"format", "weights", "kind"}
    bad = reserved & meta.keys()
    if bad:
        raise ValueError(
            f"extra_meta keys {sorted(bad)} are reserved: load_sampler derives "
            "them from the program's input shapes / the file format"
        )
    if model is not None:
        meta.update(
            hop_length=model.audio_cfg.hop_length,
            sample_rate=model.audio_cfg.sample_rate,
            max_duration=model.cfm_cfg.max_duration,
            text_num_embeds=model.dit_cfg.text_num_embeds,
        )
    else:
        warnings.warn(
            "save_sampler called without model=: the artifact header will carry "
            "no audio constants or vocab size, so loaders assume 24 kHz / hop 256 "
            "defaults and skip text-id range validation. Pass the model unless "
            "it uses the default AudioConfig.",
            stacklevel=2,
        )

    weight_blobs: list[bytes] = []
    if len(exported.in_avals) > _N_CALL_ARGS:
        if model is None:
            raise ValueError(
                "this artifact was exported with embed_weights=False; "
                "save_sampler needs model= to store the weights payload"
            )
        leaves = jax.tree.leaves(_weights_pytree(model, exported))
        wmeta = []
        for leaf in leaves:
            arr = np.ascontiguousarray(np.asarray(leaf))
            wmeta.append({"dtype": str(arr.dtype), "shape": list(arr.shape)})
            weight_blobs.append(arr.tobytes())
        meta["weights"] = wmeta

    _write_container(path, meta, weight_blobs, exported)


def _write_container(path, meta: dict, weight_blobs: list, exported) -> None:
    """Shared on-disk container: MAGIC, length-prefixed JSON header, raw
    weight blobs (layout in the header), serialized Exported."""
    import json

    header = json.dumps({"format": 1, **meta}).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC + len(header).to_bytes(4, "little") + header)
        for blob in weight_blobs:
            f.write(blob)
        f.write(exported.serialize())


def _read_container(path):
    """Inverse of `_write_container`; also accepts raw `Exported.serialize()`
    bytes (empty meta). Returns (meta, weight_leaves | None, exported) —
    `format` and `weights` are consumed here, everything else (including
    `kind`) is left in `meta` for the caller."""
    import json

    with open(path, "rb") as f:
        blob = f.read()
    meta = {}
    wmeta = None
    pos = 0
    if blob[:4] == _MAGIC:
        hlen = int.from_bytes(blob[4:8], "little")
        meta = json.loads(blob[8 : 8 + hlen].decode())
        fmt = meta.pop("format", None)
        if fmt != 1:
            raise ValueError(
                f"unsupported sampler-artifact header format {fmt!r} "
                "(this loader understands format 1)"
            )
        wmeta = meta.pop("weights", None)
        pos = 8 + hlen

    # offset-based reads, never blob slices: a slice would copy the whole
    # remaining payload (weights + program), transiently doubling memory for
    # base-scale external-weights artifacts (~650 MB)
    weight_leaves = None
    if wmeta:
        weight_leaves = []
        for entry in wmeta:
            dt = _leaf_dtype(entry["dtype"])
            count = int(np.prod(entry["shape"], dtype=np.int64)) if entry["shape"] else 1
            weight_leaves.append(
                np.frombuffer(blob, dtype=dt, count=count, offset=pos).reshape(
                    entry["shape"]
                )
            )
            pos += dt.itemsize * count

    exported = jexport.deserialize(memoryview(blob)[pos:])
    return meta, weight_leaves, exported


@dataclass(frozen=True)
class SamplerSpec:
    """The host-side knowledge a deployment needs next to the artifact —
    recovered from the Exported's input shapes plus the header's audio
    constants (24 kHz defaults when the artifact has no header)."""

    batch: int
    padded_len: int
    steps: int
    mel_dim: int
    hop_length: int = 256
    sample_rate: int = 24_000
    max_duration: int = 4096
    # Vocab size for host-side text-id range validation (None = header
    # predates the field / was written without model=; validation is skipped).
    text_num_embeds: int | None = None
    # Informational: the ODE method / CFG strength baked into the program
    # (recorded via save_sampler's extra_meta; None when absent).
    method: str | None = None
    cfg_strength: float | None = None


class BoundSampler:
    """A weights-as-args artifact re-bound to its stored weights payload:
    `.call` takes the same 7 device args as an embedded-weights Exported, so
    serving code is identical for both artifact flavors. The weight leaves
    are prepended in the program's own flatten order via its `in_tree`.

    The first `.call` moves the weights onto the device as UNCOMMITTED
    arrays (and keeps them there — re-transferring a base-scale payload
    per request would cost ~650 MB of PCIe/host traffic each call);
    uncommitted placement lets a sharded caller re-place them, or call
    `place_weights(sharding)` once to pin an explicit layout (e.g.
    replicated on a serving mesh)."""

    def __init__(self, exported: jexport.Exported, weight_leaves: list):
        self.exported = exported
        self._weight_leaves = list(weight_leaves)
        self._on_device = False

    @property
    def in_avals(self):
        return self.exported.in_avals[len(self._weight_leaves) :]

    @property
    def platforms(self):
        return self.exported.platforms

    def place_weights(self, sharding) -> "BoundSampler":
        """device_put every weight leaf with `sharding` (a Sharding or a
        Device); returns self."""
        self._weight_leaves = [
            jax.device_put(w, sharding) for w in self._weight_leaves
        ]
        self._on_device = True
        return self

    def call(self, *args):
        if not self._on_device:
            self._weight_leaves = [jnp.asarray(w) for w in self._weight_leaves]
            self._on_device = True
        full_args, kwargs = jax.tree.unflatten(
            self.exported.in_tree, self._weight_leaves + list(args)
        )
        return self.exported.call(*full_args, **kwargs)


def load_sampler(path) -> tuple[jexport.Exported | BoundSampler, SamplerSpec]:
    """Reload an artifact; returns (sampler, spec). Run via
    `sampler.call(*prep_inputs(spec, ...))` — `.call` re-traces into the
    current runtime, so it composes with jit/sharding on the serving host.
    Weights-as-args artifacts come back as a `BoundSampler` (same `.call`
    contract). Accepts both headered files (save_sampler) and raw
    `Exported.serialize()` bytes."""
    meta, weight_leaves, exported = _read_container(path)
    kind = meta.pop("kind", None)
    if kind is not None:
        raise ValueError(
            f"{path} is a {kind!r} artifact, not a sampling artifact "
            "(duration-predictor artifacts load via load_duration)"
        )
    # ignore unknown header keys so format-1 headers may gain fields
    # without breaking older loaders; drop program-derived fields too (a
    # header should never carry them, but a stale one must not collide
    # with the positional kwargs below)
    known = {f.name for f in dataclasses.fields(SamplerSpec)} - _DERIVED_SPEC_FIELDS
    meta = {k: v for k, v in meta.items() if k in known}

    sampler: jexport.Exported | BoundSampler = exported
    if weight_leaves is not None:
        n_w = len(exported.in_avals) - _N_CALL_ARGS
        if n_w != len(weight_leaves):
            raise ValueError(
                f"artifact stores {len(weight_leaves)} weight leaves but the "
                f"program expects {n_w}"
            )
        sampler = BoundSampler(exported, weight_leaves)
    cond_aval, ts_aval = exported.in_avals[-7], exported.in_avals[-2]
    b, L, d = cond_aval.shape
    return sampler, SamplerSpec(
        batch=b, padded_len=L, steps=ts_aval.shape[0], mel_dim=d, **meta
    )


def prep_inputs(
    spec: SamplerSpec,
    cond_mel: np.ndarray,  # [b, n, d] float mel (<= padded_len frames)
    text_ids: np.ndarray,  # [b, nt] int ids padded with -1
    duration: np.ndarray | int,  # [b] or scalar total frames
    *,
    lens: np.ndarray | None = None,
    sway_sampling_coef: float | None = -1.0,
    seed: int = 0,
):
    """Host-side prep mirroring `F5TTS.sample`'s fused path (bucketing, the
    duration clamp, the sway time grid) for a loaded artifact. Returns the
    positional argument tuple for `Exported.call`, plus nothing host-state —
    tokenization happens upstream (`utils/tokenizer.py`; ids, not strings,
    are the device contract)."""
    on_device = isinstance(cond_mel, jax.Array)
    if not on_device:
        cond_mel = np.asarray(cond_mel, np.float32)
    b, n, d = cond_mel.shape
    if (b, d) != (spec.batch, spec.mel_dim) or n > spec.padded_len:
        raise ValueError(
            f"cond {cond_mel.shape} does not fit artifact bucket "
            f"[{spec.batch}, {spec.padded_len}, {spec.mel_dim}]"
        )
    text_np = np.asarray(text_ids, np.int32)
    # host-side vocab check mirroring the live path (F5TTS._validate_text_ids):
    # the baked embedding gather clips, so an out-of-vocab id would silently
    # alias the last embedding on a serving host without this.
    if spec.text_num_embeds is not None and text_np.size:
        if int(text_np.max()) >= spec.text_num_embeds:
            raise ValueError(
                f"text id {int(text_np.max())} out of range for the artifact's "
                f"text_num_embeds={spec.text_num_embeds}; the tokenizer vocab "
                "does not match the exported model"
            )
    lens_np = (
        np.full((b,), n, np.int32) if lens is None else np.asarray(lens, np.int32)
    )
    text_lens = (text_np != -1).sum(axis=-1).astype(np.int32)
    lens_np = np.maximum(text_lens, lens_np)
    if isinstance(duration, (int, np.integer)):
        duration = np.full((b,), duration, np.int32)
    duration = clamp_duration(duration, lens_np, text_lens, spec.max_duration)
    max_dur = int(duration.max())
    if max_dur > spec.padded_len:
        raise ValueError(
            f"max duration {max_dur} exceeds artifact bucket {spec.padded_len}"
        )

    if on_device:
        # a mel that is ALREADY a device array (artifact_serve computes it on
        # the accelerator) stays there: padding via one device op instead of
        # a host readback + re-upload (~2x the cond bytes through the tunnel
        # per group, measured as part of the 2026-08-19 artifact-bench gap)
        cond = jnp.pad(cond_mel.astype(jnp.float32),
                       ((0, 0), (0, spec.padded_len - n), (0, 0)))
    else:
        cond = np.zeros((b, spec.padded_len, d), np.float32)
        cond[:, :n] = cond_mel
    text = np.full((b, spec.padded_len), -1, np.int32)
    ncopy = min(text_np.shape[1], spec.padded_len)
    text[:, :ncopy] = text_np[:, :ncopy]
    ts = sway_time_grid(spec.steps, sway_sampling_coef).astype(np.float32)
    return (
        cond,
        lens_np,
        duration.astype(np.int32),
        np.int32(max_dur),
        text,
        ts,
        np.int32(seed),
    )


# ---------------------------------------------------------------------------
# Duration-predictor artifacts
#
# The live server resolves missing durations with the trained duration
# predictor (serve.py:_predict_durations, reference semantics: cfm.py:253-262
# + generate.py's predictor-by-default behavior); an artifact-only deployment
# host previously had to fall back to the byte-length heuristic. These export
# the predictor the same way the sampler is exported: one fixed
# (batch, padded_len) window per artifact, weights embedded or stored beside
# the program, loadable with zero model code.


def export_duration(
    predictor,
    *,
    batch: int = 1,
    padded_len: int,
    use_flash: bool | None = None,
    platforms: tuple[str, ...] | None = None,
    embed_weights: bool = True,
) -> jexport.Exported:
    """Serialize the duration predictor over one fixed mel window.

    The exported computation has the signature

        (cond f32[b, L, mel], text i32[b, L], lens i32[b]) -> seconds f32[b]

    — the same padded-window contract the live serving path uses
    (serve.py:_predict_durations feeds a bucket-rounded window with per-item
    `lens`; models/duration.duration_forward masks frames past `lens` and
    mean-pools over the mask). Truncating a longer reference to the window is
    in-distribution: the predictor is trained to predict the FULL duration
    from a random prefix (reference: duration.py:232-237).

    `embed_weights=False` works exactly like `export_sampler`'s: the weight
    pytree becomes a leading argument and `save_duration` stores it beside
    the program."""
    from f5_tts_tpu.models.duration import duration_forward

    cfg = predictor.cfg
    if use_flash is not None:
        cfg = cfg.replace(use_flash_attention=use_flash)

    def run(params, cond, text, lens):
        return duration_forward(params, cfg, cond, text, lens)

    args = (
        jax.ShapeDtypeStruct((batch, padded_len, cfg.mel_dim), jnp.float32),
        jax.ShapeDtypeStruct((batch, padded_len), jnp.int32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
    )
    kwargs = {} if platforms is None else {"platforms": platforms}

    if embed_weights:
        params = predictor.params

        def fn(cond, text, lens):
            return run(params, cond, text, lens)

        return jexport.export(jax.jit(fn), **kwargs)(*args)

    w_avals = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        predictor.params,
    )

    def fn(weights, cond, text, lens):
        return run(weights, cond, text, lens)

    return jexport.export(jax.jit(fn), **kwargs)(w_avals, *args)


@dataclass(frozen=True)
class DurationSpec:
    """Host-side knowledge for a duration artifact — window shape from the
    program's input avals, audio constants + vocab size from the header."""

    batch: int
    padded_len: int
    mel_dim: int
    hop_length: int = 256
    sample_rate: int = 24_000
    text_num_embeds: int | None = None


_DERIVED_DURATION_FIELDS = {"batch", "padded_len", "mel_dim"}


def save_duration(exported: jexport.Exported, path, *, predictor) -> None:
    """Write a duration artifact (same container as `save_sampler`, header
    `kind: "duration"`). The predictor is required: the header records its
    audio constants (seconds -> frames conversion on the serving host) and
    vocab size, and `embed_weights=False` exports need its weights to store
    as the payload."""
    meta = {
        "kind": "duration",
        "hop_length": predictor.audio_cfg.hop_length,
        "sample_rate": predictor.audio_cfg.sample_rate,
        "text_num_embeds": predictor.cfg.text_num_embeds,
    }
    weight_blobs: list[bytes] = []
    n_w = len(exported.in_avals) - _N_DURATION_ARGS
    if n_w:
        leaves = jax.tree.leaves(predictor.params)
        if len(leaves) != n_w or not all(
            jnp.shape(leaf) == aval.shape and jnp.asarray(leaf).dtype == aval.dtype
            for leaf, aval in zip(leaves, exported.in_avals[:n_w])
        ):
            raise ValueError(
                "predictor weights do not match the artifact's weight inputs "
                f"({n_w} leading avals); was the artifact exported from this "
                "predictor?"
            )
        wmeta = []
        for leaf in leaves:
            arr = np.ascontiguousarray(np.asarray(leaf))
            wmeta.append({"dtype": str(arr.dtype), "shape": list(arr.shape)})
            weight_blobs.append(arr.tobytes())
        meta["weights"] = wmeta
    _write_container(path, meta, weight_blobs, exported)


def load_duration(path) -> tuple[jexport.Exported | BoundSampler, DurationSpec]:
    """Reload a duration artifact; returns (predictor, spec). Run via
    `predictor.call(*prep_duration_inputs(spec, ...))` -> seconds f32[b].
    Weights-as-args artifacts come back as a `BoundSampler` (the binding is
    signature-agnostic)."""
    meta, weight_leaves, exported = _read_container(path)
    kind = meta.pop("kind", None)
    if kind != "duration":
        raise ValueError(
            f"{path} is not a duration artifact "
            "(sampling artifacts load via load_sampler)"
        )
    known = {f.name for f in dataclasses.fields(DurationSpec)} - _DERIVED_DURATION_FIELDS
    meta = {k: v for k, v in meta.items() if k in known}

    sampler: jexport.Exported | BoundSampler = exported
    if weight_leaves is not None:
        n_w = len(exported.in_avals) - _N_DURATION_ARGS
        if n_w != len(weight_leaves):
            raise ValueError(
                f"artifact stores {len(weight_leaves)} weight leaves but the "
                f"program expects {n_w}"
            )
        sampler = BoundSampler(exported, weight_leaves)
    cond_aval = exported.in_avals[-3]
    b, L, d = cond_aval.shape
    return sampler, DurationSpec(batch=b, padded_len=L, mel_dim=d, **meta)


def prep_duration_inputs(
    spec: DurationSpec,
    cond_mel: np.ndarray,  # [b, n, mel] reference mel (prefix-truncated to fit)
    text_ids: np.ndarray,  # [b, nt] int ids padded with -1
    *,
    lens: np.ndarray | None = None,
) -> tuple:
    """Host-side prep for a loaded duration artifact: zero-pad the mel window
    and the text to `padded_len`, default `lens` to each item's frame count.
    A reference longer than the window must be truncated by the CALLER
    (predicting from a prefix is the predictor's training task); text longer
    than the window cannot be truncated meaningfully and raises."""
    on_device = isinstance(cond_mel, jax.Array)
    if not on_device:
        cond_mel = np.asarray(cond_mel, np.float32)
    b, n, d = cond_mel.shape
    if (b, d) != (spec.batch, spec.mel_dim) or n > spec.padded_len:
        raise ValueError(
            f"cond {cond_mel.shape} does not fit duration-artifact window "
            f"[{spec.batch}, {spec.padded_len}, {spec.mel_dim}]"
        )
    text_np = np.asarray(text_ids, np.int32)
    if spec.text_num_embeds is not None and text_np.size:
        if int(text_np.max()) >= spec.text_num_embeds:
            raise ValueError(
                f"text id {int(text_np.max())} out of range for the artifact's "
                f"text_num_embeds={spec.text_num_embeds}; the tokenizer vocab "
                "does not match the exported predictor"
            )
    text_lens = (text_np != -1).sum(axis=-1)
    if text_np.shape[1] > spec.padded_len and int(text_lens.max()) > spec.padded_len:
        raise ValueError(
            f"text length {int(text_lens.max())} exceeds the duration "
            f"artifact's window ({spec.padded_len}); pass an explicit "
            "duration or export a larger --padded-len"
        )
    if on_device:
        # same device-resident path as prep_inputs: no host round trip
        cond = jnp.pad(cond_mel.astype(jnp.float32),
                       ((0, 0), (0, spec.padded_len - n), (0, 0)))
    else:
        cond = np.zeros((b, spec.padded_len, d), np.float32)
        cond[:, :n] = cond_mel
    text = np.full((b, spec.padded_len), -1, np.int32)
    ncopy = min(text_np.shape[1], spec.padded_len)
    text[:, :ncopy] = text_np[:, :ncopy]
    lens_np = (
        np.full((b,), n, np.int32) if lens is None else np.asarray(lens, np.int32)
    )
    return cond, text, np.clip(lens_np, 1, spec.padded_len).astype(np.int32)


def main(argv=None) -> None:
    """Build a deployment artifact from a local snapshot directory:

        python -m f5_tts_tpu.export --model SNAPSHOT_DIR --out sampler.bin \
            --batch 8 --padded-len 1024 --steps 8 --method rk4

    The snapshot is a `save_pretrained` directory (weights + vocab + vocoder
    + config.json). Pass --w8a8 to bake the int8-MXU compute path into the
    artifact, --mel-only to leave the vocoder out, --duration to export the
    snapshot's trained duration predictor instead of a sampler."""
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--model", required=True, help="local snapshot dir (save_pretrained)")
    ap.add_argument("--out", required=True, help="output artifact path")
    ap.add_argument("--duration", action="store_true",
                    help="export the snapshot's duration predictor (duration_v2) "
                         "instead of a sampling artifact; --padded-len is the "
                         "reference-mel window in frames (default 1024)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--padded-len", type=int, default=None,
                    help="duration bucket in frames (default: one bucket)")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--method", default="rk4", choices=("euler", "midpoint", "rk4"))
    ap.add_argument("--cfg", type=float, default=2.0, dest="cfg_strength")
    ap.add_argument("--w8a8", action="store_true", help="bake int8-MXU compute")
    ap.add_argument("--mel-only", action="store_true", help="exclude the vocoder")
    ap.add_argument("--no-flash", action="store_true",
                    help="lower pure-XLA attention (cross-platform artifacts)")
    ap.add_argument("--external-weights", action="store_true",
                    help="export weights as program ARGUMENTS stored beside the "
                         "StableHLO in the same file: the program stays small "
                         "(kilobytes vs checkpoint-sized), which remote AOT "
                         "compilers with request-size caps require at base scale")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms, e.g. cpu,tpu")
    args = ap.parse_args(argv)

    model = F5TTS.from_pretrained(args.model)
    if args.duration:
        for flag, name in ((args.w8a8, "--w8a8"), (args.mel_only, "--mel-only")):
            if flag:
                ap.error(f"{name} does not apply to --duration exports")
        predictor = model._duration_predictor
        if predictor is None:
            ap.error(f"{args.model} has no duration_v2.safetensors; "
                     "--duration needs a snapshot with a trained predictor")
        exported = export_duration(
            predictor,
            batch=args.batch,
            padded_len=args.padded_len or 1024,
            use_flash=False if args.no_flash else None,
            platforms=tuple(args.platforms.split(",")) if args.platforms else None,
            embed_weights=not args.external_weights,
        )
        save_duration(exported, args.out, predictor=predictor)
        cond_aval = exported.in_avals[-3]
        print(
            f"wrote {args.out}: duration predictor, window "
            f"[{cond_aval.shape[0]}, {cond_aval.shape[1]}, {cond_aval.shape[2]}], "
            f"platforms={exported.platforms}"
            + (" (external weights)" if args.external_weights else "")
        )
        return
    if args.w8a8:
        model.dit_cfg = model.dit_cfg.replace(int8_compute=True)
    exported = export_sampler(
        model,
        batch=args.batch,
        padded_len=args.padded_len,
        steps=args.steps,
        method=args.method,
        cfg_strength=args.cfg_strength,
        with_vocoder=not args.mel_only,
        use_flash=False if args.no_flash else None,
        platforms=tuple(args.platforms.split(",")) if args.platforms else None,
        embed_weights=not args.external_weights,
    )
    save_sampler(
        exported, args.out, model=model,
        extra_meta={"method": args.method, "cfg_strength": args.cfg_strength},
    )
    cond_aval = exported.in_avals[-7]
    print(
        f"wrote {args.out}: bucket [{cond_aval.shape[0]}, {cond_aval.shape[1]}, "
        f"{cond_aval.shape[2]}], {args.steps} {args.method} steps, "
        f"platforms={exported.platforms}"
        + (" (external weights)" if args.external_weights else "")
    )


if __name__ == "__main__":
    main()
