"""HuggingFace Hub fetching (reference: utils.py:179-192)."""

from __future__ import annotations

from pathlib import Path


def fetch_from_hub(hf_repo: str, quantization_bits: int | None = None) -> Path:
    """Download the model snapshot (model_v1[_{q}b].safetensors, the duration
    model, and vocab/*.txt). Accepts a local directory path as well, so
    pre-downloaded snapshots work offline."""
    local = Path(hf_repo)
    if local.exists():
        return local

    from huggingface_hub import snapshot_download

    model_filename = "model_v1.safetensors"
    if quantization_bits is not None:
        model_filename = f"model_v1_{quantization_bits}b.safetensors"

    return Path(
        snapshot_download(
            repo_id=hf_repo,
            # config.json + vocos/* exist only in save_pretrained snapshots
            # (not the published artifact) but must download when present, or
            # the config-honoring loader silently falls back to base config
            allow_patterns=[model_filename, "duration_v2.safetensors", "*.txt",
                            "config.json", "vocos/*"],
        )
    )
