"""Pin the exact flat-key contract of the published checkpoint artifacts.

The manifests under tests/manifests/ are derived from the reference's module
structure + rename spec (cfm.py:477-508,510-515,425-442) independently of the
converter code; these tests assert that (a) the checked-in manifests are
current, (b) our exporters emit exactly those key/shape sets, and (c) the
converters consume synthetic checkpoints with exactly those keys — so a wrong
key name is a test failure here, not a load-time surprise on real hardware.
"""

from pathlib import Path

import jax
import numpy as np
import pytest

from f5_tts_tpu.config import DURATION_V2, F5TTS_V1_BASE
from f5_tts_tpu.models.convert import (
    convert_dit_state,
    convert_duration_state,
    export_dit_state,
    export_duration_state,
    rotary_inv_freq,
    to_mlx_model_naming,
    to_torch_ema_naming,
)
from f5_tts_tpu.models.dit import init_dit
from f5_tts_tpu.models.duration import init_duration_transformer
from f5_tts_tpu.models.quant import (
    convert_quantized_dit_state,
    quantize_flat_mlx,
    quantize_tree,
)

from manifests.gen_manifests import MANIFESTS, parse, render

MANIFEST_DIR = Path(__file__).parent / "manifests"

TEXT_NUM_EMBEDS = 2545  # len(vocab) - 1 (reference: cfm.py:466)
BASE_CFG = F5TTS_V1_BASE.replace(text_num_embeds=TEXT_NUM_EMBEDS)
DUR_CFG = DURATION_V2.replace(text_num_embeds=TEXT_NUM_EMBEDS)

_DTYPES = {"f4": np.float32, "u4": np.uint32}


def _load_manifest(name: str) -> dict:
    return parse((MANIFEST_DIR / name).read_text())


def _shapes(flat: dict) -> dict:
    return {k: tuple(np.asarray(v).shape) for k, v in flat.items()}


def _manifest_shapes(manifest: dict) -> dict:
    return {k: shape for k, (shape, _) in manifest.items()}


def _synthetic(manifest: dict) -> dict:
    rng = np.random.default_rng(0)
    out = {}
    for k, (shape, kind) in manifest.items():
        if kind == "u4":
            out[k] = rng.integers(0, 2**32, size=shape, dtype=np.uint32)
        else:
            out[k] = rng.standard_normal(shape).astype(np.float32)
    return out


def _tree_shapes(tree) -> dict:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): tuple(np.shape(leaf)) for path, leaf in flat}


def _zeros_like_shapes(shape_tree):
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shape_tree)


@pytest.fixture(scope="module")
def base_params():
    # Every consumer below checks key names and SHAPES only, so build the tree
    # from eval_shape (trace-only) + zeros: a real init_dit of the 335M-param
    # base tree costs minutes of single-core threefry on the CPU test runner.
    return _zeros_like_shapes(jax.eval_shape(lambda k: init_dit(k, BASE_CFG), jax.random.key(0)))


@pytest.fixture(scope="module")
def dur_params():
    return _zeros_like_shapes(
        jax.eval_shape(lambda k: init_duration_transformer(k, DUR_CFG), jax.random.key(0))
    )


def test_manifests_are_current():
    for name, fn in MANIFESTS.items():
        assert (MANIFEST_DIR / name).read_text() == render(fn()), (
            f"{name} is stale; run python tests/manifests/gen_manifests.py"
        )


def test_export_matches_model_v1_manifest(base_params):
    flat = to_torch_ema_naming(export_dit_state(base_params), BASE_CFG.dim_head)
    assert _shapes(flat) == _manifest_shapes(_load_manifest("model_v1.txt"))


@pytest.mark.parametrize("bits", [4, 8])
def test_quantized_export_matches_manifest(base_params, bits):
    flat = to_mlx_model_naming(export_dit_state(base_params), BASE_CFG.dim_head)
    qflat = quantize_flat_mlx(flat, bits)
    assert _shapes(qflat) == _manifest_shapes(_load_manifest(f"model_v1_{bits}b.txt"))


def test_duration_export_matches_manifest(dur_params):
    flat = {k: np.asarray(v) for k, v in export_duration_state(dur_params).items()}
    flat["transformer.rotary_embed.inv_freq"] = rotary_inv_freq(DUR_CFG.dim_head)
    assert _shapes(flat) == _manifest_shapes(_load_manifest("duration_v2.txt"))


def test_synthetic_model_v1_converts(base_params):
    raw = _synthetic(_load_manifest("model_v1.txt"))
    params = convert_dit_state(raw, BASE_CFG)
    assert _tree_shapes(params) == _tree_shapes(base_params)


@pytest.mark.parametrize("bits", [4, 8])
def test_synthetic_quantized_converts(base_params, bits):
    raw = _synthetic(_load_manifest(f"model_v1_{bits}b.txt"))
    params = convert_quantized_dit_state(raw, BASE_CFG, bits=bits)
    expected = quantize_tree(base_params, bits)
    assert _tree_shapes(params) == _tree_shapes(expected)


def test_synthetic_duration_converts(dur_params):
    raw = _synthetic(_load_manifest("duration_v2.txt"))
    params = convert_duration_state(raw, DUR_CFG)
    assert _tree_shapes(params) == _tree_shapes(dur_params)


def test_extra_key_rejected():
    raw = _synthetic(_load_manifest("model_v1.txt"))
    raw["ema_model.transformer.transformer_blocks.0.attn.to_q.bogus"] = np.zeros((4,), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_dit_state(raw, BASE_CFG)


def test_missing_key_rejected():
    raw = _synthetic(_load_manifest("model_v1.txt"))
    del raw["ema_model.transformer.proj_out.weight"]
    with pytest.raises(KeyError):
        convert_dit_state(raw, BASE_CFG)
