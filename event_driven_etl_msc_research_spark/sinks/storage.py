"""TableStorage — the narrow storage contract ``ManifestTable`` commits through.

The reference's warehouse ran on a real object store (its loader wrote
straight to S3, ``Phase3-DataLoad.py:92-97``); a 100 TB table lives on a
store with no rename, no hard link, and no recursive mtime walk.  This
module pins the engine to that reality: every metadata operation the table
needs is expressed as one of five object-store verbs —

* ``put_if_absent(key, data)``  — atomic conditional PUT (S3
  ``If-None-Match: *`` / GCS ``ifGenerationMatch=0``): the commit point;
* ``get(key)``                  — GET object;
* ``list(prefix)``              — LIST with per-object metadata (size,
  last_modified), exactly what ``ListObjectsV2`` returns in one page —
  callers never stat individual objects;
* ``list_dirs(prefix)``         — LIST with ``delimiter='/'`` (common
  prefixes only), for top-level staging-dir enumeration;
* ``delete_prefix(prefix)``     — batched DELETE of a key range (GC).

plus ``open_input(key)`` (ranged-GET reader for parquet footers) and
``spark_path(key)`` (the URI Spark's own committers read/write through —
``file://`` here, ``s3a://`` on a cluster).

Two implementations:

* ``LocalFSStorage`` — POSIX backend (the default): conditional PUT via
  tmp-file + fsync + ``os.link`` (atomic claim; EEXIST = lost race),
  listings via ``os.walk``/``os.scandir``.
* ``FakeObjectStorage`` — in-process object-store semantics over the same
  local directory: conditional PUT is a lock-guarded insert into a
  process-wide object registry (NO rename, NO link anywhere on the commit
  path) with write-through to disk so data survives the process and Spark
  jobs see the same files; listings surface per-object metadata captured
  at PUT time (disk-resident objects Spark wrote directly — parquet task
  outputs — are merged in, their ``last_modified`` standing in for the
  LastModified an object store assigns at upload completion).

The concurrency, chaos, and vacuum test suites run parameterized over BOTH
backends, so the table's commit protocol is proven to depend on nothing
beyond the five verbs — the property that makes an s3a/S3 client
implementation a drop-in.
"""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass


@dataclass(frozen=True)
class ObjectInfo:
    key: str  # '/'-separated path relative to the storage root
    size: int
    last_modified: float  # epoch seconds (PUT completion time)


class TableStorage:
    """Abstract base — see module docstring for the contract."""

    root: str

    def ensure_root(self) -> None:
        raise NotImplementedError

    def spark_path(self, key: str = "") -> str:
        """Path/URI Spark reads and writes data files through."""
        raise NotImplementedError

    def put_if_absent(self, key: str, data: bytes) -> bool:
        """Atomically create ``key`` with ``data``; False if it already
        exists (the caller lost the race).  Never overwrites."""
        raise NotImplementedError

    def get(self, key: str) -> bytes:
        raise NotImplementedError

    def list(self, prefix: str = "") -> list[ObjectInfo]:
        """All objects under ``prefix``, sorted by key, with per-object
        metadata — one call, no per-object stats by the caller."""
        raise NotImplementedError

    def list_dirs(self, prefix: str = "") -> list[str]:
        """Immediate child 'directories' (common prefixes) under ``prefix``."""
        raise NotImplementedError

    def open_input(self, key: str):
        """Seekable binary reader for ``key`` (parquet footer access)."""
        raise NotImplementedError

    def delete_prefix(self, prefix: str) -> int:
        """Delete every object under ``prefix``; returns count removed."""
        raise NotImplementedError

    def delete(self, key: str) -> bool:
        """DELETE one object; False if it did not exist (idempotent —
        concurrent expiry of the same snapshot is a harmless no-op)."""
        raise NotImplementedError


class LocalFSStorage(TableStorage):
    """POSIX filesystem backend (single-node / NFS / tests).

    The conditional PUT is tmp-file + fsync + ``os.link``: the link either
    claims the key atomically or fails EEXIST — a check-then-rename would be
    TOCTOU (POSIX rename silently overwrites)."""

    def __init__(self, root: str):
        self.root = root

    def ensure_root(self) -> None:
        os.makedirs(self.root, exist_ok=True)

    def spark_path(self, key: str = "") -> str:
        return os.path.join(self.root, key) if key else self.root

    def put_if_absent(self, key: str, data: bytes) -> bool:
        final = os.path.join(self.root, key)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        tmp = f"{final}.{os.getpid():x}-{time.monotonic_ns():x}.tmp"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        return True

    def get(self, key: str) -> bytes:
        with open(os.path.join(self.root, key), "rb") as f:
            return f.read()

    def list(self, prefix: str = "") -> list[ObjectInfo]:
        base = os.path.join(self.root, prefix) if prefix else self.root
        out: list[ObjectInfo] = []
        for dirpath, _dirs, files in os.walk(base):
            for f in files:
                fp = os.path.join(dirpath, f)
                try:
                    st = os.stat(fp)
                except OSError:
                    continue  # raced with a concurrent delete
                out.append(
                    ObjectInfo(
                        os.path.relpath(fp, self.root), st.st_size, st.st_mtime
                    )
                )
        out.sort(key=lambda o: o.key)
        return out

    def list_dirs(self, prefix: str = "") -> list[str]:
        base = os.path.join(self.root, prefix) if prefix else self.root
        try:
            with os.scandir(base) as it:
                return sorted(e.name for e in it if e.is_dir())
        except FileNotFoundError:
            return []

    def open_input(self, key: str):
        return open(os.path.join(self.root, key), "rb")

    def delete_prefix(self, prefix: str) -> int:
        import shutil

        path = os.path.join(self.root, prefix)
        n = sum(len(files) for _, _, files in os.walk(path))
        shutil.rmtree(path, ignore_errors=True)
        return n

    def delete(self, key: str) -> bool:
        try:
            os.unlink(os.path.join(self.root, key))
            return True
        except FileNotFoundError:
            return False


# process-wide object registries, keyed by absolute root — every
# FakeObjectStorage handle on the same root shares one registry, so
# concurrent writers in one process observe each other's conditional PUTs
# (the in-process stand-in for the store's strong read-after-write listing).
# The registry holds the object BYTES: a PUT is visible to same-process GETs
# atomically at registry insert, with no window where a reader could see the
# disk write-through half-finished.  Only metadata objects (manifests) go
# through PUT — Spark writes the data plane directly — so this stays tiny.
_FAKE_REGISTRIES: dict[str, dict[str, tuple[float, bytes]]] = {}
_FAKE_LOCK = threading.Lock()


class FakeObjectStorage(TableStorage):
    """In-process fake object store over a local directory.

    Commit semantics, not POSIX semantics: ``put_if_absent`` is a
    lock-guarded conditional insert into the process-wide registry — no
    rename, no link, no tmp-file dance on the commit path — followed by a
    write-through of the object bytes to disk (so Spark jobs and later
    processes read the same data).  ``list`` merges registry entries
    (metadata captured at PUT time, as a real store's LastModified is) with
    disk-resident files Spark wrote directly through ``spark_path``.

    Mapping to a real client: ``put_if_absent`` → S3 PUT with
    ``If-None-Match: *`` (or DynamoDB-conditioned commit pre-2024), ``list``
    → ``ListObjectsV2``, ``list_dirs`` → ``delimiter='/'`` common prefixes,
    ``delete_prefix`` → batched ``DeleteObjects``.
    """

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        with _FAKE_LOCK:
            self._registry = _FAKE_REGISTRIES.setdefault(self.root, {})

    def ensure_root(self) -> None:
        os.makedirs(self.root, exist_ok=True)

    def spark_path(self, key: str = "") -> str:
        return os.path.join(self.root, key) if key else self.root

    def put_if_absent(self, key: str, data: bytes) -> bool:
        path = os.path.join(self.root, key)
        with _FAKE_LOCK:
            if key in self._registry or os.path.exists(path):
                return False
            self._registry[key] = (time.time(), data)
        # write-through outside the lock: the registry entry IS the commit
        # point for every handle sharing this process; the disk copy serves
        # Spark and later processes
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        return True

    def get(self, key: str) -> bytes:
        with _FAKE_LOCK:
            hit = self._registry.get(key)
        if hit is not None:
            return hit[1]
        with open(os.path.join(self.root, key), "rb") as f:
            return f.read()

    def list(self, prefix: str = "") -> list[ObjectInfo]:
        norm = prefix.rstrip("/")
        base = os.path.join(self.root, norm) if norm else self.root
        seen: dict[str, ObjectInfo] = {}
        for dirpath, _dirs, files in os.walk(base):
            for f in files:
                fp = os.path.join(dirpath, f)
                try:
                    st = os.stat(fp)
                except OSError:
                    continue
                key = os.path.relpath(fp, self.root)
                seen[key] = ObjectInfo(key, st.st_size, st.st_mtime)
        with _FAKE_LOCK:
            for key, (ts, data) in self._registry.items():
                if norm and not key.startswith(norm + "/"):
                    continue
                # registry metadata (captured at PUT) wins over disk stat
                seen[key] = ObjectInfo(key, len(data), ts)
        return [seen[k] for k in sorted(seen)]

    def list_dirs(self, prefix: str = "") -> list[str]:
        norm = prefix.rstrip("/")
        names: set[str] = set()
        base = os.path.join(self.root, norm) if norm else self.root
        try:
            with os.scandir(base) as it:
                names.update(e.name for e in it if e.is_dir())
        except FileNotFoundError:
            pass
        with _FAKE_LOCK:
            for key in self._registry:
                if norm and not key.startswith(norm + "/"):
                    continue
                rest = key[len(norm) + 1 :] if norm else key
                if "/" in rest:
                    names.add(rest.split("/", 1)[0])
        return sorted(names)

    def open_input(self, key: str):
        return open(os.path.join(self.root, key), "rb")

    def delete_prefix(self, prefix: str) -> int:
        import shutil

        norm = prefix.rstrip("/")
        path = os.path.join(self.root, norm)
        n = sum(len(files) for _, _, files in os.walk(path))
        shutil.rmtree(path, ignore_errors=True)
        with _FAKE_LOCK:
            doomed = [
                k for k in self._registry if k == norm or k.startswith(norm + "/")
            ]
            for k in doomed:
                n += 1 if not os.path.exists(os.path.join(self.root, k)) else 0
                del self._registry[k]
        return n

    def delete(self, key: str) -> bool:
        with _FAKE_LOCK:
            existed = self._registry.pop(key, None) is not None
        path = os.path.join(self.root, key)
        try:
            os.unlink(path)
            return True
        except FileNotFoundError:
            return existed
