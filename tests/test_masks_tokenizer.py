"""Mask utilities and tokenizer semantics (reference: utils.py:39-173)."""

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.utils.masks import (
    lens_to_mask,
    mask_from_frac_lengths,
    mask_from_start_end_indices,
    maybe_masked_mean,
    pad_sequence,
    pad_to_length,
)
from f5_tts_tpu.utils.tokenizer import list_str_to_idx, list_str_to_tensor


def test_lens_to_mask():
    m = lens_to_mask(jnp.array([2, 4]), length=5)
    expect = np.array([[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]], dtype=bool)
    np.testing.assert_array_equal(np.asarray(m), expect)
    # default length = max(lens)
    m2 = lens_to_mask(jnp.array([2, 4]))
    assert m2.shape == (2, 4)


def test_mask_from_start_end():
    m = mask_from_start_end_indices(jnp.array([1]), jnp.array([3]), max_length=5)
    np.testing.assert_array_equal(np.asarray(m), [[0, 1, 1, 0, 0]])


def test_mask_from_frac_lengths_span_properties():
    key = jax.random.key(0)
    lens = jnp.array([100, 50, 10])
    frac = jnp.array([0.7, 1.0, 0.9])
    m = mask_from_frac_lengths(key, lens, frac, max_length=128)
    counts = np.asarray(m.sum(axis=-1))
    # float32 product, matching the implementation (and MLX) arithmetic
    np.testing.assert_array_equal(counts, np.asarray((frac * lens).astype(jnp.int32)))
    # spans are contiguous and inside [0, len)
    for i, row in enumerate(np.asarray(m)):
        idx = np.nonzero(row)[0]
        if len(idx):
            assert idx[-1] - idx[0] + 1 == len(idx)
            assert idx[-1] < int(lens[i])


def test_maybe_masked_mean():
    t = jnp.arange(12, dtype=jnp.float32).reshape(1, 4, 3)
    mask = jnp.array([[True, True, False, False]])
    out = maybe_masked_mean(t, mask)
    np.testing.assert_allclose(np.asarray(out), [[1.5, 2.5, 3.5]])
    # no mask = plain mean
    np.testing.assert_allclose(np.asarray(maybe_masked_mean(t)), np.asarray(t.mean(axis=1)))


def test_pad_helpers():
    t = jnp.ones((2, 3))
    p = pad_to_length(t, 5, value=7)
    assert p.shape == (2, 5)
    assert float(p[0, 4]) == 7
    assert pad_to_length(t, 2).shape == (2, 2)

    s = pad_sequence([jnp.array([1, 2]), jnp.array([3])], padding_value=-1)
    np.testing.assert_array_equal(np.asarray(s), [[1, 2], [3, -1]])


def test_byte_tokenizer():
    out = list_str_to_tensor(["ab", "a"])
    np.testing.assert_array_equal(out, [[97, 98], [97, -1]])


def test_vocab_tokenizer_oov_and_padding():
    vocab = {"a": 5, "b": 7}
    out = list_str_to_idx(["ab", "ax"], vocab)
    np.testing.assert_array_equal(out, [[5, 7], [5, 0]])  # OOV -> 0
    # bare string accepted (data pipeline convention, reference: data.py:65)
    out2 = list_str_to_idx("ba", vocab)
    np.testing.assert_array_equal(out2, [[7, 5]])


def test_pinyin_ascii_path():
    from f5_tts_tpu.utils.tokenizer import convert_char_to_pinyin

    out = convert_char_to_pinyin(["Hello world; “q”"])
    s = "".join(out[0])
    assert "Hello world" in s
    assert ";" not in s  # custom translation ; -> ,
    assert "“" not in s  # curly quotes normalized
