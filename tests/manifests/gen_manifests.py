"""Generate the expected flat-key manifests of the published checkpoints.

Derived from first principles out of the reference's module structure and
rename spec — NOT from this repo's converter code — so the checked-in files
pin the loader contract independently:

- model_v1.safetensors        torch-EMA naming (bare Sequential indices, torch
                              conv layouts, "ema_model." prefix); the reference
                              renames/reshapes it at cfm.py:477-508
- model_v1_{4,8}b.safetensors MLX full-model naming (".layers." Sequential
                              segments, MLX conv layouts, "transformer."
                              prefix); loaded WITHOUT the rename pass
                              (cfm.py:450-455) after nn.quantize of every
                              nn.Linear with in_features % 64 == 0
                              (cfm.py:510-515)
- duration_v2.safetensors     MLX naming of DurationPredictor
                              (cfm.py:425-442, duration.py:97-190)

Structure sources: DiT modules dit.py:29-401, ConvNeXt-V2 convnext_v2.py:9-54,
RotaryEmbedding rope.py:12-36, duration model duration.py:36-190. The vocab
has 2546 entries including the trailing empty line (cfm.py:418-421), so
text_num_embeds = 2545 and the text embedding has 2546 rows (+1 filler shift
happens at call time, dit.py:200).

Run `python tests/manifests/gen_manifests.py` to (re)write the *.txt files;
tests/test_key_manifest.py asserts they are current and that the converters /
exporters agree with them exactly.

Line format: <key>\t<comma-separated shape>\t<dtype-kind>  (f4 = float32,
u4 = packed uint32 codes). Float dtypes in the wild may be narrower; the
shape/key set is the contract.
"""

from __future__ import annotations

from pathlib import Path

# base DiT config (reference: cfm.py:460-469)
DIM = 1024
DEPTH = 22
HEADS = 16
DIM_HEAD = 64
FF_MULT = 2
TEXT_DIM = 512
CONV_LAYERS = 4
MEL = 100
FREQ_EMBED = 256  # reference: dit.py:61-67

VOCAB_ROWS = 2546  # len(vocab) incl. trailing empty line (cfm.py:418-421)

# duration model config (reference: cfm.py:429-438)
D_DIM = 512
D_DEPTH = 8
D_HEADS = 8
D_DIM_HEAD = 64
D_FF_MULT = 2
D_TEXT_DIM = 512
D_CONV_LAYERS = 2

GROUP = 64  # MLX quantization group size (reference: nn.quantize default)


def _linear(key: str, out_d: int, in_d: int, bias: bool = True):
    yield key + ".weight", (out_d, in_d), "f4"
    if bias:
        yield key + ".bias", (out_d,), "f4"


def _qlinear(key: str, out_d: int, in_d: int, bits: int):
    """MLX QuantizedLinear: packed uint32 codes + per-group scales/biases +
    the original layer bias."""
    yield key + ".weight", (out_d, in_d * bits // 32), "u4"
    yield key + ".scales", (out_d, in_d // GROUP), "f4"
    yield key + ".biases", (out_d, in_d // GROUP), "f4"
    yield key + ".bias", (out_d,), "f4"


def _maybe_qlinear(key: str, out_d: int, in_d: int, bits: int | None):
    """nn.quantize eligibility: in_features % 64 == 0 (cfm.py:510-515)."""
    if bits is not None and in_d % GROUP == 0:
        yield from _qlinear(key, out_d, in_d, bits)
    else:
        yield from _linear(key, out_d, in_d)


def _norm(key: str, d: int):
    yield key + ".weight", (d,), "f4"
    yield key + ".bias", (d,), "f4"


def _convnext_block(key: str, d: int, inner: int, mlx_layout: bool, bits: int | None):
    # depthwise conv k=7, groups=dim -> in/g = 1 (convnext_v2.py:35-37)
    yield key + ".dwconv.weight", (d, 7, 1) if mlx_layout else (d, 1, 7), "f4"
    yield key + ".dwconv.bias", (d,), "f4"
    yield from _norm(key + ".norm", d)
    yield from _maybe_qlinear(key + ".pwconv1", inner, d, bits)
    yield key + ".grn.gamma", (1, 1, inner), "f4"
    yield key + ".grn.beta", (1, 1, inner), "f4"
    yield from _maybe_qlinear(key + ".pwconv2", d, inner, bits)


def _conv_pos_embed(key: str, d: int, mlx_layout: bool):
    # grouped conv k=31, groups=16 (dit.py:29-50)
    in_g = d // 16
    sep = ".conv1d.layers." if mlx_layout else ".conv1d."
    for idx in (0, 2):
        yield f"{key}{sep}{idx}.weight", (d, 31, in_g) if mlx_layout else (d, in_g, 31), "f4"
        yield f"{key}{sep}{idx}.bias", (d,), "f4"


def _attention(key: str, dim: int, inner: int, mlx_layout: bool, bits: int | None):
    for name in ("to_q", "to_k", "to_v"):
        yield from _maybe_qlinear(f"{key}.{name}", inner, dim, bits)
    out_key = f"{key}.to_out.layers.0" if mlx_layout else f"{key}.to_out.0"
    yield from _maybe_qlinear(out_key, dim, inner, bits)


def _feed_forward(key: str, dim: int, mult: int, mlx_layout: bool, bits: int | None):
    inner = dim * mult
    w1 = f"{key}.ff.layers.0.layers.0" if mlx_layout else f"{key}.ff.0.0"
    w2 = f"{key}.ff.layers.2" if mlx_layout else f"{key}.ff.2"
    yield from _maybe_qlinear(w1, inner, dim, bits)
    yield from _maybe_qlinear(w2, dim, inner, bits)


def dit_entries(mlx_layout: bool, bits: int | None):
    """All DiT keys, unprefixed, in either naming convention."""
    tm = ".time_mlp.layers." if mlx_layout else ".time_mlp."
    yield from _maybe_qlinear(f"time_embed{tm}0", DIM, FREQ_EMBED, bits)
    yield from _maybe_qlinear(f"time_embed{tm}2", DIM, DIM, bits)

    yield "text_embed.text_embed.weight", (VOCAB_ROWS, TEXT_DIM), "f4"
    tb = ".text_blocks.layers." if mlx_layout else ".text_blocks."
    for i in range(CONV_LAYERS):
        yield from _convnext_block(f"text_embed{tb}{i}", TEXT_DIM, TEXT_DIM * 2, mlx_layout, bits)

    # proj in = 2*mel + text = 712, NOT divisible by 64 -> never quantized
    yield from _maybe_qlinear("input_embed.proj", DIM, 2 * MEL + TEXT_DIM, bits)
    yield from _conv_pos_embed("input_embed.conv_pos_embed", DIM, mlx_layout)

    yield "rotary_embed.inv_freq", (DIM_HEAD // 2,), "f4"

    inner = HEADS * DIM_HEAD
    for i in range(DEPTH):
        key = f"transformer_blocks.{i}"
        yield from _maybe_qlinear(f"{key}.attn_norm.linear", DIM * 6, DIM, bits)
        yield from _attention(f"{key}.attn", DIM, inner, mlx_layout, bits)
        yield from _feed_forward(f"{key}.ff", DIM, FF_MULT, mlx_layout, bits)

    yield from _maybe_qlinear("norm_out.linear", DIM * 2, DIM, bits)
    yield from _maybe_qlinear("proj_out", MEL, DIM, bits)


def model_v1_manifest() -> dict[str, tuple[tuple[int, ...], str]]:
    return {
        f"ema_model.transformer.{k}": (shape, kind)
        for k, shape, kind in dit_entries(mlx_layout=False, bits=None)
    }


def model_v1_quant_manifest(bits: int) -> dict[str, tuple[tuple[int, ...], str]]:
    return {
        f"transformer.{k}": (shape, kind)
        for k, shape, kind in dit_entries(mlx_layout=True, bits=bits)
    }


def duration_v2_manifest() -> dict[str, tuple[tuple[int, ...], str]]:
    out = {}

    def add(entries, prefix="transformer."):
        for k, shape, kind in entries:
            out[prefix + k] = (shape, kind)

    add([("text_embed.text_embed.weight", (VOCAB_ROWS, D_TEXT_DIM), "f4")])
    for i in range(D_CONV_LAYERS):
        add(_convnext_block(f"text_embed.text_blocks.layers.{i}", D_TEXT_DIM,
                            D_TEXT_DIM * 2, mlx_layout=True, bits=None))
    # proj in = mel + text (duration.py:48)
    add(_linear("input_embed.proj", D_DIM, MEL + D_TEXT_DIM))
    add(_conv_pos_embed("input_embed.conv_pos_embed", D_DIM, mlx_layout=True))
    add([("rotary_embed.inv_freq", (D_DIM_HEAD // 2,), "f4")])
    inner = D_HEADS * D_DIM_HEAD
    for i in range(D_DEPTH):
        key = f"transformer_blocks.{i}"
        # DurationBlock norms are affine=False -> no parameters (duration.py:68,76)
        add(_attention(f"{key}.attn", D_DIM, inner, mlx_layout=True, bits=None))
        add(_feed_forward(f"{key}.ff", D_DIM, D_FF_MULT, mlx_layout=True, bits=None))
    add([("norm_out.weight", (D_DIM,), "f4")])  # RMSNorm (duration.py:137)
    # head: Sequential(Linear(dim,1,bias=False), Softplus, Rearrange) (duration.py:188-190)
    add(_linear("to_pred.layers.0", 1, D_DIM, bias=False), prefix="")
    return out


MANIFESTS = {
    "model_v1.txt": model_v1_manifest,
    "model_v1_4b.txt": lambda: model_v1_quant_manifest(4),
    "model_v1_8b.txt": lambda: model_v1_quant_manifest(8),
    "duration_v2.txt": duration_v2_manifest,
}


def render(manifest: dict[str, tuple[tuple[int, ...], str]]) -> str:
    lines = [
        f"{k}\t{','.join(map(str, shape))}\t{kind}"
        for k, (shape, kind) in sorted(manifest.items())
    ]
    return "\n".join(lines) + "\n"


def parse(text: str) -> dict[str, tuple[tuple[int, ...], str]]:
    out = {}
    for line in text.splitlines():
        if not line.strip():
            continue
        k, shape, kind = line.split("\t")
        out[k] = (tuple(int(s) for s in shape.split(",")), kind)
    return out


def main() -> None:
    here = Path(__file__).parent
    for name, fn in MANIFESTS.items():
        (here / name).write_text(render(fn()))
        print(f"wrote {name}: {len(fn())} keys")


if __name__ == "__main__":
    main()
