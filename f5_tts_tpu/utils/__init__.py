from f5_tts_tpu.utils.masks import (
    lens_to_mask,
    mask_from_start_end_indices,
    mask_from_frac_lengths,
    maybe_masked_mean,
    pad_to_length,
    pad_sequence,
)
from f5_tts_tpu.utils.tokenizer import (
    list_str_to_tensor,
    list_str_to_idx,
    convert_char_to_pinyin,
    load_vocab,
)

__all__ = [
    "lens_to_mask",
    "mask_from_start_end_indices",
    "mask_from_frac_lengths",
    "maybe_masked_mean",
    "pad_to_length",
    "pad_sequence",
    "list_str_to_tensor",
    "list_str_to_idx",
    "convert_char_to_pinyin",
    "load_vocab",
]
