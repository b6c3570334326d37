"""HuggingFace Hub fetching (reference: utils.py:179-192).

Beyond the reference (which always downloads the repo HEAD): snapshots can be
pinned to a `revision` (branch/tag/commit) and artifact files can be verified
against expected sha256 digests, so a force-push to the published repo fails
loudly instead of silently changing what from_pretrained loads.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

# Known-good digests per repo, filled in by deployments once computed from a
# trusted download (`python -m f5_tts_tpu.utils.hub <snapshot-dir>` prints
# them). This build environment has no network access to the published
# artifacts, so none ship by default; pass expected_sha256= to pin ad hoc.
PINNED_ARTIFACTS: dict[str, dict[str, str]] = {}


def sha256_file(path: Path, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def verify_artifacts(root: Path, expected_sha256: dict[str, str]) -> None:
    """Check each (relative filename -> sha256 hex digest) entry; a missing
    file or digest mismatch raises ValueError naming the offender."""
    for rel, want in expected_sha256.items():
        p = root / rel
        if not p.exists():
            raise ValueError(f"pinned artifact missing from snapshot: {rel}")
        got = sha256_file(p)
        if got != want.lower():
            raise ValueError(
                f"artifact digest mismatch for {rel}: expected {want}, got {got} "
                "— the upstream repo contents changed (or the pin is stale)"
            )


def fetch_from_hub(
    hf_repo: str,
    quantization_bits: int | None = None,
    revision: str | None = None,
    expected_sha256: dict[str, str] | None = None,
) -> Path:
    """Download the model snapshot (model_v1[_{q}b].safetensors, the duration
    model, and vocab/*.txt). Accepts a local directory path as well, so
    pre-downloaded snapshots work offline. `revision` pins the Hub ref;
    `expected_sha256` (relative path -> digest) is verified after download
    (defaults to PINNED_ARTIFACTS[hf_repo] when registered)."""
    if expected_sha256 is None:
        expected_sha256 = PINNED_ARTIFACTS.get(hf_repo)

    local = Path(hf_repo)
    if local.exists():
        if expected_sha256:
            verify_artifacts(local, expected_sha256)
        return local

    from huggingface_hub import snapshot_download

    model_filename = "model_v1.safetensors"
    if quantization_bits is not None:
        model_filename = f"model_v1_{quantization_bits}b.safetensors"

    path = Path(
        snapshot_download(
            repo_id=hf_repo,
            revision=revision,
            # config.json + vocos/* exist only in save_pretrained snapshots
            # (not the published artifact) but must download when present, or
            # the config-honoring loader silently falls back to base config
            allow_patterns=[model_filename, "duration_v2.safetensors", "*.txt",
                            "config.json", "vocos/*"],
        )
    )
    if expected_sha256:
        verify_artifacts(path, expected_sha256)
    return path


def main(argv: list[str] | None = None) -> None:
    """Print sha256 digests of a local snapshot dir in PINNED_ARTIFACTS form."""
    import argparse
    import json

    ap = argparse.ArgumentParser(description="print snapshot artifact digests")
    ap.add_argument("snapshot", help="local snapshot directory")
    args = ap.parse_args(argv)
    root = Path(args.snapshot)
    digests = {
        str(p.relative_to(root)): sha256_file(p)
        for p in sorted(root.rglob("*"))
        if p.is_file()
    }
    print(json.dumps(digests, indent=2))


if __name__ == "__main__":
    main()
