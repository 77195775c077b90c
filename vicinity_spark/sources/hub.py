"""HuggingFace Hub source/sink — parity surface for the reference's
`push_to_hub` / `load_from_hub` (vicinity/vicinity.py:285-326,
vicinity/integrations/huggingface.py:28-132).

The store's on-disk layout (parquet + JSON sidecar, store.py) is
already datasets-compatible: a Hub dataset repo holding the parquet
shards plus `_vicinity_meta.json` round-trips through these two
functions. The `huggingface_hub` client is an optional dependency —
not installed in this environment — so both functions are gated behind
an import-try and raise a clear OptionalDependencyError otherwise
(mirroring the reference's optional-extra errors,
vicinity/backends/__init__.py:8-19).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession


class OptionalDependencyError(ImportError):
    pass


def _require_hub():
    try:
        import huggingface_hub  # noqa: F401

        return huggingface_hub
    except ImportError as e:
        raise OptionalDependencyError(
            "push_to_hub/load_from_hub require the 'huggingface_hub' package"
        ) from e


def push_to_hub(store, repo_id: str, token: Optional[str] = None, private: bool = False):
    """Publish a saved VectorStore folder as a Hub dataset repo."""
    import tempfile

    hub = _require_hub()
    api = hub.HfApi(token=token)
    api.create_repo(repo_id, repo_type="dataset", private=private, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        store.save(tmp, overwrite=True)
        api.upload_folder(repo_id=repo_id, repo_type="dataset", folder_path=tmp)
    return f"https://huggingface.co/datasets/{repo_id}"


def load_from_hub(repo_id: str, spark: SparkSession, token: Optional[str] = None):
    """Download a Hub dataset repo and load it as a VectorStore."""
    from vicinity_spark.store import VectorStore

    hub = _require_hub()
    path = hub.snapshot_download(repo_id=repo_id, repo_type="dataset", token=token)
    return VectorStore.load(path, spark)
