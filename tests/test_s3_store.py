"""S3 integration tests for the content-addressed store.

The reference's own test suite runs end-to-end through a real object
store (reference tests/test_shelf.py:22-42, MinIO). These mirror that
loop. Backend selection:

- When the reference's S3 env contract is present (S3_ENDPOINT_URL +
  credentials), they run against that endpoint, e.g. a local MinIO:

    S3_ENDPOINT_URL=http://localhost:9000 S3_ACCESS_KEY=minioadmin \
    S3_SECRET_KEY=minioadmin S3_BUCKET_NAME=shelf-test pytest tests/test_s3_store.py

- Otherwise they fall back to moto's in-process S3 mock (same boto3
  client API surface), so the S3 code path has CI evidence without any
  external service.
"""

from __future__ import annotations

import os
import uuid
from pathlib import Path

import pytest

_REQUIRED = ("S3_ENDPOINT_URL", "S3_ACCESS_KEY", "S3_SECRET_KEY", "S3_BUCKET_NAME")
_REAL_S3 = all(v in os.environ for v in _REQUIRED)


@pytest.fixture()
def s3_store(monkeypatch):
    boto3 = pytest.importorskip("boto3")
    from shelf_spark.framework.store import S3Store

    if _REAL_S3:
        client = boto3.client(
            "s3",
            aws_access_key_id=os.environ["S3_ACCESS_KEY"],
            aws_secret_access_key=os.environ["S3_SECRET_KEY"],
            endpoint_url=os.environ["S3_ENDPOINT_URL"],
        )
        bucket = os.environ["S3_BUCKET_NAME"]
        try:
            client.head_bucket(Bucket=bucket)
        except Exception:
            client.create_bucket(Bucket=bucket)
        yield S3Store()
        return

    moto = pytest.importorskip("moto")
    with moto.mock_aws():
        bucket = f"shelf-test-{uuid.uuid4().hex[:8]}"
        monkeypatch.setenv("S3_ACCESS_KEY", "testing")
        monkeypatch.setenv("S3_SECRET_KEY", "testing")
        monkeypatch.setenv("S3_BUCKET_NAME", bucket)
        monkeypatch.delenv("S3_ENDPOINT_URL", raising=False)
        boto3.client("s3", region_name="us-east-1").create_bucket(Bucket=bucket)
        yield S3Store()


def test_s3_upload_download_roundtrip(s3_store, tmp_path):
    payload = f"s3 roundtrip {uuid.uuid4()}".encode()
    src = tmp_path / "obj.bin"
    src.write_bytes(payload)
    from shelf_spark.framework.utils import checksum_file

    sha = checksum_file(src)
    assert not s3_store.exists(sha)
    s3_store.upload(src, sha)
    assert s3_store.exists(sha)
    dest = tmp_path / "restored.bin"
    assert s3_store.download(sha, dest)
    assert dest.read_bytes() == payload
    assert not s3_store.download("0" * 64, tmp_path / "missing.bin")


def test_cached_store_hit_and_miss(s3_store, tmp_path, monkeypatch):
    """Miss populates the cache from the backend; a later hit never touches
    the backend (proven by swapping in a backend that refuses all calls)."""
    from shelf_spark.framework.store import CachedStore
    from shelf_spark.framework.utils import checksum_file

    cache_dir = tmp_path / "cache"
    store = CachedStore(s3_store, cache_dir=cache_dir)
    src = tmp_path / "obj.bin"
    src.write_bytes(f"cached {uuid.uuid4()}".encode())
    sha = checksum_file(src)
    s3_store.upload(src, sha)  # backend only; cache is cold

    dest1 = tmp_path / "d1.bin"
    assert store.download(sha, dest1)  # miss → backend → cache populated
    assert (cache_dir / sha[:2] / sha[2:4] / sha).exists()

    class _DeadBackend:
        def download(self, checksum, dest):
            raise AssertionError("cache hit must not reach the backend")

        def upload(self, local, checksum):
            raise AssertionError("cache hit must not reach the backend")

        def exists(self, checksum):
            raise AssertionError("cache hit must not reach the backend")

    hot = CachedStore(_DeadBackend(), cache_dir=cache_dir)
    dest2 = tmp_path / "d2.bin"
    assert hot.download(sha, dest2)
    assert dest2.read_bytes() == src.read_bytes()


def test_snapshot_fetch_through_s3(s3_store, tmp_path, monkeypatch):
    """The reference e2e loop: snapshot → wipe local copy → fetch restores
    bytes through the object store."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("SHELF_CACHE_DIR", str(tmp_path / ".cache"))
    from shelf_spark.framework.snapshots import Snapshot
    from shelf_spark.framework.types import StepURI

    raw = tmp_path / "input.csv"
    raw.write_text(f"x,y\n{uuid.uuid4().int % 100},2\n")
    snap = Snapshot.create(raw, "ns/s3raw/2024-01-01")
    snap.data_path.unlink()
    # cold cache forces the fetch through S3 itself
    monkeypatch.setenv("SHELF_CACHE_DIR", str(tmp_path / ".cache2"))
    loaded = Snapshot.load(StepURI.parse("snapshot://ns/s3raw/2024-01-01"))
    loaded.fetch()
    assert loaded.is_up_to_date()
    assert loaded.data_path.read_text() == raw.read_text()
