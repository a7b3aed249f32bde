"""Checkpoint downloader (reference download.py:1-30).

Thin snapshot_download wrapper with token handling; network-gated — this
environment has no egress, so the function exists for API surface parity and
fails with a clear message when huggingface_hub is unavailable or offline.
"""

from __future__ import annotations

import os


def hf_download(repo_id: str, local_dir: str | None = None,
                hf_token: str | None = None) -> str:
    """Download a HF checkpoint snapshot (reference download.py hf_download):
    returns the local directory, ready for checkpoint.convert_hf.
    """
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:                               # pragma: no cover
        raise RuntimeError(
            "hf_download requires huggingface_hub (no network in this "
            "environment); pass a local checkpoint directory to "
            "checkpoint.convert_hf.load_hf_checkpoint instead") from e
    local_dir = local_dir or os.path.join(
        "checkpoints", repo_id.replace("/", "--"))
    return snapshot_download(repo_id, local_dir=local_dir,
                             token=hf_token or os.environ.get("HF_TOKEN"))
