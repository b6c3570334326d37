"""Dry run of the turnkey real-weight validation command
(tools/mel_parity.py --snapshot ...) against a synthetic snapshot: the real
published artifacts are unreachable from this offline environment, so this
pins the mechanics — snapshot resolution, the paste-ready PINNED_ARTIFACTS
digest entry, the 32-step comparison, and the pass/fail exit — with a
self-generated "reference" mel whose MAE is exactly 0 (round-3 task #8).

reference: cfm.py:404-520 (the published-weight path the command validates)."""

import importlib.util
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f5_tts_tpu.config import CFMConfig, DiTConfig, VocosConfig
from f5_tts_tpu.models.cfm import F5TTS
from f5_tts_tpu.models.vocos import Vocos
from f5_tts_tpu.utils.hub import sha256_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mel_parity():
    spec = importlib.util.spec_from_file_location(
        "mel_parity", os.path.join(REPO, "tools", "mel_parity.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    """A save_pretrained snapshot of a tiny model + a 'reference' mel that the
    SAME model generated, so the comparison's true MAE is 0."""
    tmp = tmp_path_factory.mktemp("parity")
    cfg = DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
                    text_num_embeds=256, text_dim=32, conv_layers=1,
                    use_flash_attention=False)
    voc = Vocos.init(jax.random.key(1),
                     VocosConfig(dim=64, intermediate_dim=128, num_layers=2))
    model = F5TTS.init(jax.random.key(0), cfg, cfm_cfg=CFMConfig(duration_bucket=64),
                       vocab_char_map=None, vocoder=voc.decode)
    snap = tmp / "snap"
    model.save_pretrained(snap)

    from f5_tts_tpu.audio.io import write_wav
    from f5_tts_tpu.utils.tokenizer import convert_char_to_pinyin

    rng = np.random.default_rng(0)
    ref_audio = (0.1 * rng.standard_normal(12 * 256)).astype(np.float32)
    wav = tmp / "ref.wav"
    write_wav(wav, ref_audio, 24_000)

    ref_model = F5TTS.from_pretrained(str(snap))
    ref_model._vocoder = None
    mel, _ = ref_model.sample(
        jnp.asarray(ref_audio)[None, :],
        text=convert_char_to_pinyin(["hello there. general kenobi."]),
        duration=48, steps=4, method="euler", cfg_strength=2.0,
        sway_sampling_coef=-1.0, seed=5,
    )
    ref_npy = tmp / "ref_mel.npy"
    np.save(ref_npy, np.asarray(mel))
    return {"snap": snap, "wav": wav, "ref": ref_npy}


def test_turnkey_pass(mel_parity, snapshot, capsys):
    rc = mel_parity.main([
        "--snapshot", str(snapshot["snap"]),
        "--ref", str(snapshot["ref"]),
        "--ref-audio", str(snapshot["wav"]),
        "--ref-text", "hello there.", "--text", "general kenobi.",
        "--duration", "48", "--steps", "4", "--method", "euler", "--seed", "5",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "PASS" in out
    # the digest block is paste-ready and correct for the snapshot's weights
    assert 'PINNED_ARTIFACTS["' in out
    entry = out[out.index("PINNED_ARTIFACTS") :]
    digests = json.loads(entry[entry.index("{") : entry.rindex("}") + 1])
    want = sha256_file(snapshot["snap"] / "model_v1.safetensors")
    assert digests["model_v1.safetensors"] == want


def test_turnkey_fail_exit(mel_parity, snapshot, tmp_path, capsys):
    """A reference mel that genuinely disagrees must fail with exit 1 — the
    command is a gate, not a report."""
    bad = tmp_path / "bad.npy"
    ref = np.load(snapshot["ref"])
    np.save(bad, ref + 0.5)
    rc = mel_parity.main([
        "--snapshot", str(snapshot["snap"]),
        "--ref", str(bad),
        "--ref-audio", str(snapshot["wav"]),
        "--ref-text", "hello there.", "--text", "general kenobi.",
        "--duration", "48", "--steps", "4", "--method", "euler", "--seed", "5",
    ])
    assert rc == 1
    assert "FAIL" in capsys.readouterr().out


def test_turnkey_digest_only(mel_parity, snapshot, capsys):
    """Without --ref the command still resolves the snapshot, prints the pin
    entry, and smoke-loads the model (what a deployment runs FIRST, before the
    Apple-silicon half of the comparison exists)."""
    rc = mel_parity.main(["--snapshot", str(snapshot["snap"])])
    out = capsys.readouterr().out
    assert rc == 0
    assert "model loaded OK" in out and "PINNED_ARTIFACTS" in out
