"""AOT export artifacts (f5_tts_tpu/export.py): the serialized StableHLO
sampler must reproduce the live fused path exactly and honor the bucketing
contract (dynamic max_dur inside one baked shape)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5_tts_tpu import export as E
from f5_tts_tpu.config import CFMConfig, DiTConfig, VocosConfig
from f5_tts_tpu.models.cfm import F5TTS
from f5_tts_tpu.models.vocos import Vocos


@pytest.fixture(scope="module")
def tiny_model():
    cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
        text_num_embeds=256, text_dim=32, conv_layers=1, use_flash_attention=False,
    )
    voc = Vocos.init(
        jax.random.key(1), VocosConfig(dim=64, intermediate_dim=128, num_layers=2)
    )
    return F5TTS.init(
        jax.random.key(0), cfg, cfm_cfg=CFMConfig(duration_bucket=64),
        vocab_char_map=None, vocoder=voc.decode,
    )


def _inputs(batch=2, frames=20, text_len=12):
    rng = np.random.RandomState(0)
    cond = (rng.randn(batch, frames, 100) * 0.1).astype(np.float32)
    text = np.full((batch, text_len), -1, np.int32)
    text[0, :5] = [5, 6, 7, 8, 9]
    if batch > 1:
        text[1, :3] = [1, 2, 3]
    return cond, text


def test_export_roundtrip_matches_live_sample(tiny_model, tmp_path):
    exp = E.export_sampler(tiny_model, batch=2, steps=4, method="euler")
    path = tmp_path / "sampler.bin"
    E.save_sampler(exp, path, model=tiny_model)
    exp2, spec = E.load_sampler(path)
    assert (spec.batch, spec.padded_len, spec.steps, spec.mel_dim) == (2, 64, 4, 100)

    cond, text = _inputs()
    args = E.prep_inputs(spec, cond, text, 48, seed=7)
    mel_e, wave_e = exp2.call(*args)

    wave_m, _ = tiny_model.sample(
        jnp.asarray(cond), jnp.asarray(text), duration=48, steps=4, method="euler",
        cfg_strength=2.0, seed=7, sway_sampling_coef=-1.0, return_trajectory=False,
    )
    max_dur = int(args[3])
    hop = spec.hop_length
    np.testing.assert_allclose(
        np.asarray(wave_m), np.asarray(wave_e)[:, : (max_dur - 1) * hop],
        atol=1e-6, rtol=0,
    )
    # mel zeroed past max_dur per the fused contract
    assert np.abs(np.asarray(mel_e)[:, max_dur:]).max() == 0.0


def test_dynamic_max_dur_one_artifact_many_durations(tiny_model):
    """One artifact (one baked bucket) must serve different durations — the
    same dynamic-scalar contract the live jit cache relies on."""
    exp = E.export_sampler(tiny_model, batch=2, steps=2, method="euler")
    exp2 = jax.export.deserialize(exp.serialize())
    spec = E.SamplerSpec(batch=2, padded_len=64, steps=2, mel_dim=100)
    cond, text = _inputs()
    for dur in (40, 56):
        args = E.prep_inputs(spec, cond, text, dur, seed=3)
        _, wave_e = exp2.call(*args)
        wave_m, _ = tiny_model.sample(
            jnp.asarray(cond), jnp.asarray(text), duration=dur, steps=2,
            method="euler", seed=3, return_trajectory=False,
        )
        np.testing.assert_allclose(
            np.asarray(wave_m), np.asarray(wave_e)[:, : (int(args[3]) - 1) * 256],
            atol=1e-6, rtol=0,
        )


def test_export_mel_only(tiny_model):
    exp = E.export_sampler(tiny_model, batch=1, steps=2, method="midpoint",
                           with_vocoder=False)
    exp2 = jax.export.deserialize(exp.serialize())
    spec = E.SamplerSpec(batch=1, padded_len=64, steps=2, mel_dim=100)
    cond, text = _inputs(batch=1)
    text = text[:1]
    args = E.prep_inputs(spec, cond, text, 32, seed=0)
    mel_e = exp2.call(*args)
    mel_m, _ = tiny_model.sample(
        jnp.asarray(cond), jnp.asarray(text), duration=32, steps=2,
        method="midpoint", seed=0, return_trajectory=False,
    )
    # mel-only model.sample returns the vocoded wave when a vocoder is set;
    # compare against the exported mel trimmed to max_dur via the live mel
    # path instead: rerun the live model without its vocoder
    novoc = F5TTS(
        tiny_model.params, tiny_model.dit_cfg,
        cfm_cfg=tiny_model.cfm_cfg, audio_cfg=tiny_model.audio_cfg,
        vocab_char_map=None, vocoder=None,
    )
    mel_live, _ = novoc.sample(
        jnp.asarray(cond), jnp.asarray(text), duration=32, steps=2,
        method="midpoint", seed=0, return_trajectory=False,
    )
    # with_vocoder toggles the fused program, so XLA reassociates a few
    # reductions differently: bit-noise-level tolerance, not exact equality
    np.testing.assert_allclose(
        np.asarray(mel_live), np.asarray(mel_e)[:, : int(args[3])], atol=1e-5, rtol=0
    )


def test_w8a8_export_matches_live_w8a8(tiny_model):
    """int8-MXU compute bakes into the artifact (quantization happens at
    export time inside _inference_params) and matches the live w8a8 path."""
    m8 = F5TTS(
        tiny_model.params, tiny_model.dit_cfg.replace(int8_compute=True),
        cfm_cfg=tiny_model.cfm_cfg, audio_cfg=tiny_model.audio_cfg,
        vocab_char_map=None, vocoder=tiny_model._vocoder,
    )
    exp = E.export_sampler(m8, batch=2, steps=2, method="euler")
    exp2 = jax.export.deserialize(exp.serialize())
    spec = E.SamplerSpec(batch=2, padded_len=64, steps=2, mel_dim=100)
    cond, text = _inputs()
    args = E.prep_inputs(spec, cond, text, 48, seed=11)
    _, wave_e = exp2.call(*args)
    wave_m, _ = m8.sample(
        jnp.asarray(cond), jnp.asarray(text), duration=48, steps=2,
        method="euler", seed=11, return_trajectory=False,
    )
    np.testing.assert_allclose(
        np.asarray(wave_m), np.asarray(wave_e)[:, : (int(args[3]) - 1) * 256],
        atol=1e-6, rtol=0,
    )


def test_export_cli_from_snapshot(tiny_model, tmp_path):
    """python -m f5_tts_tpu.export --model SNAPSHOT --out ... builds a
    loadable artifact from a save_pretrained directory."""
    snap = tmp_path / "snap"
    tiny_model.save_pretrained(snap)
    out = tmp_path / "sampler.bin"
    E.main([
        "--model", str(snap), "--out", str(out),
        "--batch", "1", "--steps", "2", "--method", "euler",
    ])
    exported, spec = E.load_sampler(out)
    assert (spec.batch, spec.padded_len, spec.steps) == (1, 64, 2)
    cond, text = _inputs(batch=1)
    mel_e, wave_e = exported.call(*E.prep_inputs(spec, cond, text, 48, seed=5))
    assert np.isfinite(np.asarray(wave_e)).all()


def test_header_carries_audio_constants(tmp_path):
    """Non-default AudioConfig models record their audio-domain constants in
    the artifact header, so deployment-side wave trimming uses the right hop
    (the round-2 hardcoded-constants bug class, kept out of this surface)."""
    from f5_tts_tpu.config import AudioConfig

    cfg = DiTConfig(
        dim=32, depth=1, heads=2, dim_head=16, ff_mult=2, mel_dim=80,
        text_num_embeds=64, text_dim=16, conv_layers=1, use_flash_attention=False,
    )
    model = F5TTS.init(
        jax.random.key(0), cfg,
        cfm_cfg=CFMConfig(duration_bucket=32, max_duration=2048),
        audio_cfg=AudioConfig(sample_rate=22_050, hop_length=240, n_mels=80),
        vocab_char_map=None,
    )
    exp = E.export_sampler(model, batch=1, steps=2, method="euler",
                           with_vocoder=False)
    path = tmp_path / "s.bin"
    E.save_sampler(exp, path, model=model)
    _, spec = E.load_sampler(path)
    assert (spec.hop_length, spec.sample_rate, spec.max_duration) == (240, 22_050, 2048)
    assert (spec.padded_len, spec.mel_dim) == (32, 80)


def test_prep_inputs_validation(tiny_model):
    spec = E.SamplerSpec(batch=2, padded_len=64, steps=2, mel_dim=100)
    cond, text = _inputs()
    with pytest.raises(ValueError, match="does not fit"):
        E.prep_inputs(spec, cond[:1], text, 48)  # wrong batch
    with pytest.raises(ValueError, match="exceeds artifact bucket"):
        E.prep_inputs(spec, cond, text, 200)  # duration past the bucket
    big = np.zeros((2, 100, 100), np.float32)
    with pytest.raises(ValueError, match="does not fit"):
        E.prep_inputs(spec, big, text, 48)  # cond longer than the bucket


def test_prep_inputs_vocab_range_check(tiny_model, tmp_path):
    """The header records text_num_embeds and prep_inputs range-checks ids
    against it, mirroring the live path's F5TTS._validate_text_ids — an
    out-of-vocab id must fail loudly on the serving host, not silently clip
    to the last embedding."""
    exp = E.export_sampler(tiny_model, batch=2, steps=2, method="euler")
    path = tmp_path / "s.bin"
    E.save_sampler(exp, path, model=tiny_model)
    _, spec = E.load_sampler(path)
    assert spec.text_num_embeds == 256

    cond, text = _inputs()
    E.prep_inputs(spec, cond, text, 48)  # in-range ids pass
    bad = text.copy()
    bad[0, 0] = 999  # >= text_num_embeds
    with pytest.raises(ValueError, match="out of range"):
        E.prep_inputs(spec, cond, bad, 48)
    # headerless specs (older artifacts / raw serialize bytes) skip the check
    E.prep_inputs(E.SamplerSpec(batch=2, padded_len=64, steps=2, mel_dim=100),
                  cond, bad, 48)


def test_save_sampler_without_model_warns(tiny_model, tmp_path):
    """Omitting model= bakes 24 kHz defaults into the header — legal but
    loud, since a non-default AudioConfig deployment would trim with the
    wrong hop (ADVICE r3)."""
    exp = E.export_sampler(tiny_model, batch=1, steps=2, method="euler",
                           with_vocoder=False)
    path = tmp_path / "s.bin"
    with pytest.warns(UserWarning, match="without model="):
        E.save_sampler(exp, path)
    _, spec = E.load_sampler(path)
    assert spec.text_num_embeds is None  # nothing recorded to validate against


def test_external_weights_roundtrip_matches_embedded(tiny_model, tmp_path):
    """embed_weights=False stores the weight pytree as a payload beside a
    small StableHLO program; the loaded BoundSampler must reproduce the
    embedded-weights artifact exactly, and the program portion must actually
    be small (the point: base-scale embedded programs exceed remote AOT
    compilers' request caps)."""
    emb = E.export_sampler(tiny_model, batch=2, steps=2, method="euler")
    ext = E.export_sampler(tiny_model, batch=2, steps=2, method="euler",
                           embed_weights=False)
    assert len(ext.in_avals) > len(emb.in_avals)  # weights became inputs
    # the weights-as-args PROGRAM is a fraction of the embedded one
    assert len(ext.serialize()) < 0.5 * len(emb.serialize())

    p_emb, p_ext = tmp_path / "emb.bin", tmp_path / "ext.bin"
    E.save_sampler(emb, p_emb, model=tiny_model)
    E.save_sampler(ext, p_ext, model=tiny_model)

    s_emb, spec_emb = E.load_sampler(p_emb)
    s_ext, spec_ext = E.load_sampler(p_ext)
    assert isinstance(s_ext, E.BoundSampler)
    assert spec_ext == spec_emb  # same device-arg spec either way

    cond, text = _inputs()
    args = E.prep_inputs(spec_ext, cond, text, 48, seed=7)
    mel_a, wave_a = s_emb.call(*args)
    mel_b, wave_b = s_ext.call(*args)
    # weights as ARGUMENTS vs CONSTANTS changes XLA's bf16 constant folding /
    # fusion choices, so outputs match to bf16 reassociation noise, not bits
    np.testing.assert_allclose(np.asarray(wave_a), np.asarray(wave_b),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(mel_a), np.asarray(mel_b),
                               atol=2e-4, rtol=2e-4)


def test_external_weights_composes_with_w8a8(tiny_model, tmp_path):
    """int8-COMPUTE weights (dicts of {q int8, scales, biases}) round-trip
    through the external-weights payload (every leaf dtype/shape recorded,
    including int8) and match the embedded w8a8 artifact."""
    m8 = F5TTS(
        tiny_model.params, tiny_model.dit_cfg.replace(int8_compute=True),
        cfm_cfg=tiny_model.cfm_cfg, audio_cfg=tiny_model.audio_cfg,
        vocab_char_map=None, vocoder=tiny_model._vocoder,
    )
    emb = E.export_sampler(m8, batch=2, steps=2, method="euler")
    ext = E.export_sampler(m8, batch=2, steps=2, method="euler",
                           embed_weights=False)
    p_emb, p_ext = tmp_path / "emb8.bin", tmp_path / "ext8.bin"
    E.save_sampler(emb, p_emb, model=m8)
    E.save_sampler(ext, p_ext, model=m8)
    s_emb, spec = E.load_sampler(p_emb)
    s_ext, _ = E.load_sampler(p_ext)

    cond, text = _inputs()
    args = E.prep_inputs(spec, cond, text, 48, seed=11)
    _, wave_a = s_emb.call(*args)
    _, wave_b = s_ext.call(*args)
    np.testing.assert_allclose(np.asarray(wave_a), np.asarray(wave_b),
                               atol=2e-4, rtol=2e-4)

    # explicit placement (the serving-mesh hook) is output-invariant
    s_ext.place_weights(jax.devices()[0])
    _, wave_c = s_ext.call(*args)
    np.testing.assert_allclose(np.asarray(wave_b), np.asarray(wave_c),
                               atol=0, rtol=0)


def test_external_weights_save_requires_model(tiny_model, tmp_path):
    """A weights-as-args Exported carries only the weight AVALS; saving it
    without the model (the arrays) must fail loudly."""
    ext = E.export_sampler(tiny_model, batch=1, steps=2, method="euler",
                           with_vocoder=False, embed_weights=False)
    with pytest.raises(ValueError, match="embed_weights=False"):
        with pytest.warns(UserWarning, match="without model="):
            E.save_sampler(ext, tmp_path / "x.bin")


def test_external_weights_mel_only_and_cli(tiny_model, tmp_path):
    """--external-weights over the CLI, mel-only flavor: the vocoder-less
    weights pytree round-trips and the loaded sampler runs."""
    snap = tmp_path / "snap"
    tiny_model.save_pretrained(snap)
    out = tmp_path / "ext.bin"
    E.main([
        "--model", str(snap), "--out", str(out),
        "--batch", "1", "--steps", "2", "--method", "euler",
        "--mel-only", "--external-weights",
    ])
    sampler, spec = E.load_sampler(out)
    assert isinstance(sampler, E.BoundSampler)
    cond, text = _inputs(batch=1)
    mel = sampler.call(*E.prep_inputs(spec, cond, text, 48, seed=5))
    assert np.isfinite(np.asarray(mel)).all()


def test_artifact_composes_with_mesh_dp(tiny_model, tmp_path):
    """A deserialized artifact's .call re-traces into the CURRENT runtime, so
    it must compose with a data-parallel mesh on the serving host: running it
    on DP-sharded inputs over the 8-virtual-device mesh equals the
    single-device artifact output (round-3 task #7 — closing the loop between
    the export and mesh-serving surfaces)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    exp = E.export_sampler(tiny_model, batch=8, steps=2, method="euler")
    path = tmp_path / "dp.bin"
    E.save_sampler(exp, path, model=tiny_model)
    sampler, spec = E.load_sampler(path)

    rng = np.random.RandomState(3)
    cond = (rng.randn(8, 20, 100) * 0.1).astype(np.float32)
    text = np.full((8, 12), -1, np.int32)
    for i in range(8):
        text[i, : 2 + i % 4] = np.arange(2 + i % 4) + 1
    args = E.prep_inputs(spec, cond, text, 48, seed=9)

    _, wave_single = sampler.call(*args)

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    sharded_args = [
        jax.device_put(a, dp if np.ndim(a) >= 1 and np.shape(a)[0] == 8 else rep)
        for a in args
    ]
    _, wave_dp = sampler.call(*sharded_args)
    # GSPMD partitioning re-tiles the bf16 matmuls: same tolerance class as
    # tests/test_mesh_serving.py's live-path DP equality pins
    np.testing.assert_allclose(
        np.asarray(wave_single), np.asarray(wave_dp), atol=2e-4, rtol=2e-4
    )


def test_load_sampler_header_versioning(tiny_model, tmp_path):
    """A future header format must raise a clear version error, and unknown
    extra keys in a format-1 header are ignored rather than crashing
    SamplerSpec (ADVICE r3)."""
    import json

    exp = E.export_sampler(tiny_model, batch=1, steps=2, method="euler",
                           with_vocoder=False)
    blob = exp.serialize()

    def write(path, header: dict):
        enc = json.dumps(header).encode()
        with open(path, "wb") as f:
            f.write(b"F5X1" + len(enc).to_bytes(4, "little") + enc + blob)

    v2 = tmp_path / "v2.bin"
    write(v2, {"format": 2, "hop_length": 256})
    with pytest.raises(ValueError, match="format 2"):
        E.load_sampler(v2)

    extra = tmp_path / "extra.bin"
    write(extra, {"format": 1, "hop_length": 128, "some_future_key": [1, 2]})
    _, spec = E.load_sampler(extra)
    assert spec.hop_length == 128


def test_header_extra_meta_records_sampler_config(tiny_model, tmp_path):
    """save_sampler's extra_meta surfaces known SamplerSpec fields (the
    baked ODE method / CFG strength are otherwise not introspectable from
    the program) and ignores unknown ones."""
    exp = E.export_sampler(tiny_model, batch=1, steps=2, method="euler",
                           with_vocoder=False)
    p = tmp_path / "m.bin"
    E.save_sampler(exp, p, model=tiny_model,
                   extra_meta={"method": "euler", "cfg_strength": 1.5,
                               "some_future_field": [1]})
    _, spec = E.load_sampler(p)
    assert (spec.method, spec.cfg_strength) == ("euler", 1.5)


def test_reserved_extra_meta_rejected(tiny_model, tmp_path):
    """extra_meta keys the loader derives from the program's input avals
    (batch, padded_len, steps, mel_dim) are rejected at save time — a header
    carrying them would crash SamplerSpec with duplicate kwargs on load,
    making the artifact permanently unloadable."""
    exp = E.export_sampler(tiny_model, batch=1, steps=2, method="euler")
    with pytest.raises(ValueError, match="reserved"):
        E.save_sampler(exp, tmp_path / "x.bin", model=tiny_model,
                       extra_meta={"steps": 2})
    with pytest.raises(ValueError, match="reserved"):
        E.save_sampler(exp, tmp_path / "x.bin", model=tiny_model,
                       extra_meta={"weights": []})


def test_prep_inputs_device_array_cond_matches_numpy(tiny_model, tmp_path):
    """A cond mel that is already a jax device array takes the no-host-round-
    trip path in prep_inputs (device-side pad) and must produce bit-identical
    outputs to the numpy path — artifact_serve feeds the device mel directly
    since the 2026-08-19 artifact-bench fix."""
    exp = E.export_sampler(tiny_model, batch=2, steps=2, method="euler")
    path = tmp_path / "s.bin"
    E.save_sampler(exp, path, model=tiny_model)
    s, spec = E.load_sampler(path)

    cond, text = _inputs()
    args_np = E.prep_inputs(spec, cond, text, 48, seed=3)
    args_dev = E.prep_inputs(spec, jnp.asarray(cond), text, 48, seed=3)
    assert isinstance(args_dev[0], jax.Array)
    np.testing.assert_array_equal(np.asarray(args_dev[0]), args_np[0])

    out_np = s.call(*args_np)
    out_dev = s.call(*args_dev)
    np.testing.assert_array_equal(np.asarray(out_np[1]), np.asarray(out_dev[1]))
