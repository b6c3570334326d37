"""Host-side text processing: byte/char tokenizers and pinyin conversion.

Behavioral parity with reference: utils.py:112-173. Token semantics that the
pretrained weights depend on: OOV chars map to 0, batch padding is -1, and the
embedding layer shifts ids by +1 so -1 becomes the filler token 0
(reference: utils.py:124-133, dit.py:200).

jieba/pypinyin are imported lazily so that English-only usage works without the
Chinese text stack installed.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def list_str_to_tensor(text: list[str], padding_value: int = -1) -> np.ndarray:
    """UTF-8 byte fallback tokenizer -> int array [b, nt]
    (reference: utils.py:115-118). Token-list inputs (the pinyin converter's
    output) are joined back to a string first."""
    seqs = [list(bytes(t if isinstance(t, str) else "".join(t), "UTF-8")) for t in text]
    return _pad_int_sequences(seqs, padding_value)


def list_str_to_idx(
    text: list[str] | str,
    vocab_char_map: dict[str, int],
    padding_value: int = -1,
) -> np.ndarray:
    """Char/pinyin vocab tokenizer -> int array [b, nt]; OOV -> 0
    (reference: utils.py:124-133). Also accepts a bare string (the reference
    data pipeline calls it that way, data.py:65)."""
    if isinstance(text, str):
        text = [text]
    seqs = [[vocab_char_map.get(c, 0) for c in t] for t in text]
    return _pad_int_sequences(seqs, padding_value)


def _pad_int_sequences(seqs: list[list[int]], padding_value: int) -> np.ndarray:
    max_len = max((len(s) for s in seqs), default=0)
    out = np.full((len(seqs), max_len), padding_value, dtype=np.int32)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out


def load_vocab(path: str | Path) -> dict[str, int]:
    """Load a newline-separated vocab file into {char: idx}
    (reference: cfm.py:418-421)."""
    vocab = {v: i for i, v in enumerate(Path(path).read_text().split("\n"))}
    if len(vocab) == 0:
        raise ValueError(f"Could not load vocab from {path}")
    return vocab


_ZH_PUNCT = "。，、；：？！《》【】—…"


def convert_char_to_pinyin(text_list: list[str], polyphone: bool = True) -> list[list[str]]:
    """Segment mixed ZH/EN text into the char/pinyin token stream the
    pretrained vocab expects (reference: utils.py:139-173).

    Pure-ASCII text only needs jieba for word segmentation; pypinyin is
    imported lazily when CJK characters are present.
    """
    import jieba

    jieba.setLogLevel(20)

    quote_trans = str.maketrans({"“": '"', "”": '"', "‘": "'", "’": "'"})
    custom_trans = str.maketrans({";": ","})

    final_text_list = []
    for text in text_list:
        char_list: list[str] = []
        text = text.translate(quote_trans).translate(custom_trans)
        for seg in jieba.cut(text):
            seg_byte_len = len(bytes(seg, "UTF-8"))
            if seg_byte_len == len(seg):  # pure alphabets and symbols
                if char_list and seg_byte_len > 1 and char_list[-1] not in " :'\"":
                    char_list.append(" ")
                char_list.extend(seg)
            elif polyphone and seg_byte_len == 3 * len(seg):  # pure CJK
                for c in _lazy_pinyin(seg):
                    if c not in _ZH_PUNCT:
                        char_list.append(" ")
                    char_list.append(c)
            else:  # mixed
                for c in seg:
                    if ord(c) < 256:
                        char_list.extend(c)
                    elif c not in _ZH_PUNCT:
                        char_list.append(" ")
                        char_list.extend(_lazy_pinyin(c))
                    else:
                        char_list.append(c)
        final_text_list.append(char_list)
    return final_text_list


def _is_han(c: str) -> bool:
    o = ord(c)
    return (
        # CJK Unified + Ext-A, minus the Yijing hexagram symbols embedded in
        # the range (U+4DC0-U+4DFF are not Han; they must pass through
        # without requiring pypinyin)
        (0x3400 <= o <= 0x9FFF and not 0x4DC0 <= o <= 0x4DFF)
        or o in (0x3005, 0x3007)    # iteration mark, ideographic zero
        or 0xF900 <= o <= 0xFAFF    # compatibility ideographs
        # assigned supplementary blocks only (Ext-B..H + compat supplement,
        # ending at Ext-H U+323AF); the planes beyond are unassigned
        or 0x20000 <= o <= 0x323AF
    )


def _lazy_pinyin(seg: str) -> list[str]:
    """pypinyin's lazy_pinyin, imported lazily.

    The reference's byte-length heuristic (utils.py:150-164) routes EVERY
    3-byte UTF-8 character here — em-dashes, ellipses, math symbols — not
    just Chinese; pypinyin passes non-Han input through as one unchanged
    group. Without pypinyin installed we reproduce that pass-through and
    raise the install hint only when the segment actually contains Han
    characters (plain English with an em-dash must not require pypinyin)."""
    try:
        from pypinyin import Style, lazy_pinyin
    except ImportError as e:  # pragma: no cover - environment dependent
        if any(_is_han(c) for c in seg):
            raise ImportError(
                "pypinyin is required for Chinese text; install f5-tts-tpu[zh]"
            ) from e
        return [seg]
    return lazy_pinyin(seg, style=Style.TONE3, tone_sandhi=True)
