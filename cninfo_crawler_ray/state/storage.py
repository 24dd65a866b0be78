"""Checkpoint/rounds storage abstraction (VERDICT r03 item 5, ADVICE r02 #4).

The scheduler's durability protocol — per-round parquet written by WORKERS,
driver-side commit markers, state.pkl flushes, partial-round GC on resume —
previously assumed a POSIX filesystem shared by every node (os.listdir +
atomic ``os.replace`` dir rename). That is true on an NFS mount but not on
an object-store mount (S3/GCS have no atomic directory rename). This module
makes the storage contract a code path instead of a docstring caveat:

- :class:`LocalStorage` — os/shutil; commit = atomic ``os.replace`` of the
  round's ``.tmp`` staging dir onto its final name (the exact protocol the
  kill/resume byte-identity tests have pinned since round 2).
- :class:`FsspecStorage` — any ``fsspec`` URL (``s3://…``, ``gs://…``,
  ``file://…``). Object stores cannot rename a directory atomically, so the
  commit protocol changes shape: workers write parquet straight into the
  final round directory and the commit marker is a zero-byte
  ``_COMMITTED`` object written AFTER every round file has landed (the
  classic Hadoop/Spark output-committer marker). Resume garbage-collects
  any round directory missing its marker. state.pkl is staged to
  ``state.pkl.tmp`` then moved — best-effort on stores without atomic
  rename, which is safe here because a torn state file only loses the LAST
  round's mark and the resume recomputes that round deterministically
  (same argument as the local rename/flush gap, scheduler._write_round).

``storage_for(path)`` picks the backend from the URL scheme; bare paths
stay on :class:`LocalStorage`, so every existing caller and test is
untouched. ``ray_path()`` translates a storage URL into the path Ray Data
workers should read/write (``file://`` strips to a plain shared-FS path;
object-store URLs pass through — Ray's parquet IO speaks fsspec natively).
"""

from __future__ import annotations

import os
import shutil

__all__ = ["LocalStorage", "FsspecStorage", "storage_for"]


class LocalStorage:
    """POSIX shared-FS backend — atomic dir-rename commits."""

    scheme = "local"

    # --- generic small-object ops ---
    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def write_bytes_atomic(self, path: str, blob: bytes) -> None:
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    # --- round commit protocol ---
    def begin_round(self, rounds_dir: str, round_no: int) -> str:
        """→ staging path the round's parquet is written into."""
        tmp = os.path.join(rounds_dir, f"round_{round_no:05d}.tmp")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        return tmp

    def commit_round(self, rounds_dir: str, round_no: int) -> None:
        final = os.path.join(rounds_dir, f"round_{round_no:05d}")
        tmp = final + ".tmp"
        # an all-invalid wave yields zero long rows and write_parquet
        # creates nothing — commit an empty staging dir so numbering stays
        # dense
        os.makedirs(tmp, exist_ok=True)
        # a kill between this rename and the state flush leaves the round
        # committed while state says N-1; resume recomputes the round
        # (deterministic), so clear the stale dir rather than ENOTEMPTY
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)

    def gc_partial_rounds(self, rounds_dir: str) -> None:
        for name in os.listdir(rounds_dir):
            if name.endswith(".tmp"):
                shutil.rmtree(os.path.join(rounds_dir, name))

    def round_files(self, rounds_dir: str, upto: int) -> list[str]:
        """Committed parquet files of rounds 1..upto, in round order
        (read_parquet treats list entries as files — expand each dir)."""
        files: list[str] = []
        for r in range(1, upto + 1):
            d = os.path.join(rounds_dir, f"round_{r:05d}")
            files.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
        return files

    def ray_path(self, path: str) -> str:
        return path


class FsspecStorage:
    """fsspec backend — marker-file commits (no atomic dir rename)."""

    MARKER = "_COMMITTED"

    def __init__(self, url_prefix: str):
        import fsspec

        self.fs, _ = fsspec.core.url_to_fs(url_prefix)
        self.scheme = url_prefix.split("://", 1)[0]

    def _strip(self, path: str) -> str:
        """fsspec fs methods take scheme-less paths."""
        return path.split("://", 1)[1] if "://" in path else path

    def join(self, *parts: str) -> str:
        return "/".join(p.rstrip("/") for p in parts)

    def makedirs(self, path: str) -> None:
        self.fs.makedirs(self._strip(path), exist_ok=True)

    def exists(self, path: str) -> bool:
        return self.fs.exists(self._strip(path))

    def read_bytes(self, path: str) -> bytes:
        with self.fs.open(self._strip(path), "rb") as f:
            return f.read()

    def write_bytes_atomic(self, path: str, blob: bytes) -> None:
        p = self._strip(path)
        tmp = p + ".tmp"
        with self.fs.open(tmp, "wb") as f:
            f.write(blob)
        # atomic on file://; copy+delete on object stores — safe because a
        # torn state file only loses the latest round's mark (see module doc)
        self.fs.mv(tmp, p)

    def rmtree(self, path: str) -> None:
        p = self._strip(path)
        if self.fs.exists(p):
            self.fs.rm(p, recursive=True)

    def begin_round(self, rounds_dir: str, round_no: int) -> str:
        # no rename on object stores: write straight into the final dir; an
        # uncommitted leftover from a prior failed attempt is cleared first
        final = self.join(rounds_dir, f"round_{round_no:05d}")
        if self.exists(final) and not self.exists(self.join(final, self.MARKER)):
            self.rmtree(final)
        return final

    def commit_round(self, rounds_dir: str, round_no: int) -> None:
        final = self.join(rounds_dir, f"round_{round_no:05d}")
        self.makedirs(final)  # empty round (all-invalid wave) still commits
        self.fs.touch(self._strip(self.join(final, self.MARKER)))

    def gc_partial_rounds(self, rounds_dir: str) -> None:
        base = self._strip(rounds_dir)
        for entry in self.fs.ls(base, detail=False):
            name = entry.rstrip("/").rsplit("/", 1)[-1]
            if name.startswith("round_") and not self.fs.exists(
                    f"{entry.rstrip('/')}/{self.MARKER}"):
                self.fs.rm(entry, recursive=True)

    def round_files(self, rounds_dir: str, upto: int) -> list[str]:
        files: list[str] = []
        for r in range(1, upto + 1):
            d = self.join(rounds_dir, f"round_{r:05d}")
            entries = sorted(self.fs.ls(self._strip(d), detail=False))
            sep = "://"
            prefix = (self.scheme + sep) if self.scheme != "file" else ""
            for e in entries:
                if e.endswith(".parquet"):
                    files.append(self.ray_path(prefix + e if sep not in e else e))
        return files

    def ray_path(self, path: str) -> str:
        """Path Ray Data workers read/write. ``file://`` is a shared-FS
        mount → plain local path (Ray would otherwise route it through a
        slower fsspec shim); object-store URLs pass through untouched."""
        if path.startswith("file://"):
            return path[len("file://"):]
        return path


def storage_for(path: str):
    """Pick a backend from the URL scheme; bare paths → LocalStorage."""
    if "://" in path:
        return FsspecStorage(path)
    return LocalStorage()
