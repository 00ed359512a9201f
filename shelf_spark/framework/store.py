"""Content-addressed object store (⇄ reference src/shelf/snapshots.py:216-309).

Objects are keyed by their SHA-256, sharded ``{sha[:2]}/{sha[2:4]}/{sha}``
— identical bytes are stored once regardless of how many snapshots
reference them. Two backends behind one interface:

- **local-FS** (default): a directory acting as the bucket. Hermetic — no
  network, used by tests; mirrors the reference's MinIO-backed layout.
- **S3** via boto3, selected when the reference's env contract is present
  (S3_ACCESS_KEY / S3_SECRET_KEY / S3_BUCKET_NAME / S3_ENDPOINT_URL,
  reference snapshots.py:216-226, .env.example). boto3 is imported lazily
  so the engine works without it.

A local cache at ``~/.cache/shelf-spark`` fronts either backend
(reference snapshots.py:281-309).
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path


def _shard(checksum: str) -> str:
    return f"{checksum[:2]}/{checksum[2:4]}/{checksum}"


class LocalStore:
    """Filesystem-backed content store (bucket = a directory)."""

    def __init__(self, root: Path | str):
        self.root = Path(root)

    def upload(self, local: Path, checksum: str) -> None:
        dest = self.root / _shard(checksum)
        if dest.exists():
            return  # content-addressed: identical bytes already stored
        dest.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(local, dest)

    def download(self, checksum: str, dest: Path) -> bool:
        src = self.root / _shard(checksum)
        if not src.exists():
            return False
        dest.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, dest)
        return True

    def exists(self, checksum: str) -> bool:
        return (self.root / _shard(checksum)).exists()


class S3Store:
    """S3-compatible content store (same env contract as the reference)."""

    def __init__(self) -> None:
        import boto3  # lazy: optional dependency

        self.bucket = os.environ["S3_BUCKET_NAME"]
        self.client = boto3.client(
            "s3",
            aws_access_key_id=os.environ["S3_ACCESS_KEY"],
            aws_secret_access_key=os.environ["S3_SECRET_KEY"],
            endpoint_url=os.environ.get("S3_ENDPOINT_URL"),
        )

    def upload(self, local: Path, checksum: str) -> None:
        self.client.upload_file(str(local), self.bucket, _shard(checksum))

    def download(self, checksum: str, dest: Path) -> bool:
        dest.parent.mkdir(parents=True, exist_ok=True)
        try:
            self.client.download_file(self.bucket, _shard(checksum), str(dest))
            return True
        except Exception:
            return False

    def exists(self, checksum: str) -> bool:
        try:
            self.client.head_object(Bucket=self.bucket, Key=_shard(checksum))
            return True
        except Exception:
            return False


class CachedStore:
    """Local cache in front of a backend (reference snapshots.py:281-309)."""

    def __init__(self, backend, cache_dir: Path | None = None):
        self.backend = backend
        self.cache = LocalStore(
            cache_dir
            or Path(os.environ.get("SHELF_CACHE_DIR", Path.home() / ".cache" / "shelf-spark"))
        )

    def upload(self, local: Path, checksum: str) -> None:
        self.cache.upload(local, checksum)
        self.backend.upload(local, checksum)

    def download(self, checksum: str, dest: Path) -> bool:
        if self.cache.download(checksum, dest):
            return True
        if self.backend.download(checksum, dest):
            # populate the cache for next time
            self.cache.upload(dest, checksum)
            return True
        return False

    def exists(self, checksum: str) -> bool:
        return self.cache.exists(checksum) or self.backend.exists(checksum)


def get_store():
    """Backend selection: S3 when the env contract is complete, else a
    local-FS bucket at $SHELF_STORE_DIR (default .shelf-store)."""
    s3_vars = ("S3_ACCESS_KEY", "S3_SECRET_KEY", "S3_BUCKET_NAME")
    if all(v in os.environ for v in s3_vars):
        return CachedStore(S3Store())
    return CachedStore(LocalStore(Path(os.environ.get("SHELF_STORE_DIR", ".shelf-store"))))
