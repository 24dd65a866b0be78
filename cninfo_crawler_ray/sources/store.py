"""Corpus-backed fetch store — the sandbox stand-in for HTTP (T1).

On a real cluster the fetch stage holds an HTTP client per actor
(cninfo_report_crawler.py:414 shares one requests.Session across threads; we
give each actor its own). Here the "remote server" is the corpus table itself:

- ``head(urls)``  = the HEAD probe (cninfo_report_crawler.py:129-135): returns
  per-URL (status, content_type, content_length) from *metadata columns only*
  — no payload bytes move, like a real HEAD.
- ``get(urls)``   = the GET fetch (report_info_collection.py:250-261): returns
  payload bytes.

Selective reads: the store builds a row-group index (min/max image_id per
parquet row group) once per actor at ``__init__``, then serves each batch by
reading only the row groups its keys fall in — the columnar analog of HTTP
range requests. This keeps per-batch cost proportional to the batch, not the
corpus, which is what makes the pattern hold at 100 TB.
"""

from __future__ import annotations

import bisect

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _in_ray_worker() -> bool:
    try:
        import ray

        if not ray.is_initialized():
            return False
        return ray.get_runtime_context().worker.mode == ray.WORKER_MODE
    except Exception:
        return False


def image_id_of_url(urls) -> list[str]:
    """URL tail → image_id (layout per FIXTURES.md F1)."""
    return [str(u).rsplit("/", 1)[-1].rsplit(".", 1)[0] for u in urls]


def ext_of_url(urls) -> list[str]:
    return [str(u).rsplit(".", 1)[-1] for u in urls]


class CorpusStore:
    """Open once per actor (__init__ of the fetch/probe stage classes)."""

    def __init__(self, corpus_path: str):
        import os

        # Many store clients share one node: without this every actor spins
        # up a full-width Arrow thread pool (num_cpus threads) for its
        # parquet reads and N actors × N threads thrash the node (observed
        # 50× per-row slowdown at 16 actors). One thread per actor — the
        # pool-level parallelism is Ray's job, not Arrow's. Only applied
        # inside Ray workers so driver-side/test use keeps full-width Arrow.
        if _in_ray_worker():
            pa.set_cpu_count(1)
            pa.set_io_thread_count(1)
        self.path = corpus_path
        f = pq.ParquetFile(corpus_path)
        self.num_row_groups = f.metadata.num_row_groups
        mins, maxs = [], []
        for rg in range(self.num_row_groups):
            col = f.metadata.row_group(rg).column(0)  # image_id is column 0
            st = col.statistics
            mins.append(st.min)
            maxs.append(st.max)
        self._mins = mins
        self._maxs = maxs
        self._file = f
        self._rg_cache: dict[tuple, pa.Table] = {}
        # HEAD index: (fmt, content_length) per id — the "server's" metadata.
        # Loaded from the sidecar written at fixture-gen time; at real scale
        # this would stay on disk and be row-group-pruned like the payloads.
        sidecar = os.path.join(os.path.dirname(corpus_path), "corpus_head.parquet")
        if os.path.exists(sidecar):
            t = pq.read_table(sidecar)
        else:
            t = f.read(columns=["image_id", "fmt", "bytes"])
            t = pa.table(
                {
                    "image_id": t["image_id"],
                    "fmt": t["fmt"],
                    "content_length": pc.binary_length(t["bytes"]).cast(pa.int64()),
                }
            )
        self._head_idx: dict[str, tuple[str, int]] = {
            i: (fmt, n)
            for i, fmt, n in zip(
                t["image_id"].to_pylist(), t["fmt"].to_pylist(), t["content_length"].to_pylist()
            )
        }

    def _row_groups_for(self, ids: list[str]) -> list[int]:
        hit = set()
        for i in set(ids):
            # row groups hold disjoint sorted id ranges → at most one match
            lo = bisect.bisect_left(self._maxs, i)
            if lo < self.num_row_groups and self._mins[lo] <= i <= self._maxs[lo]:
                hit.add(lo)
        return sorted(hit)

    _RG_CACHE_SIZE = 2

    def _read(self, ids: list[str], columns: list[str]) -> pa.Table:
        """Read the row groups covering ``ids`` (NO per-id filtering — callers
        align with ``index_in``/``take``). A tiny per-actor LRU of decoded row
        groups turns the sequential, locality-sorted fetch walk into ~one
        physical read per row group instead of one per batch (the client-side
        analog of HTTP keep-alive + range caching)."""
        groups = self._row_groups_for(ids)
        if not groups:
            # typed from the parquet schema — a hardcoded string type would
            # silently corrupt int columns (w/h/content_length) on concat
            sch = self._file.schema_arrow
            return pa.table({c: pa.array([], sch.field(c).type) for c in columns})
        key_cols = tuple(columns)
        tabs = []
        for g in groups:
            k = (g, key_cols)
            t = self._rg_cache.get(k)
            if t is None:
                t = self._file.read_row_groups([g], columns=list(columns))
                self._rg_cache[k] = t
                if len(self._rg_cache) > self._RG_CACHE_SIZE:
                    self._rg_cache.pop(next(iter(self._rg_cache)))
            else:
                self._rg_cache[k] = self._rg_cache.pop(k)  # refresh LRU order
            tabs.append(t)
        return pa.concat_tables(tabs)

    def head(self, urls: list[str]) -> pa.Table:
        """HEAD analog: (url, status, content_type, content_length). Missing
        id → 404; zero-byte payload → 404 (dead link); content_type comes
        from the fmt *column* (server metadata — may lie; the GET magic check
        is the authoritative gate, like %PDF at cninfo_report_crawler.py:149)."""
        ids = image_id_of_url(urls)
        status, ctype, clen = [], [], []
        for iid in ids:
            fmt, n = self._head_idx.get(iid, ("", 0))
            if n == 0:
                status.append(404)
                ctype.append("")
                clen.append(0)
            else:
                status.append(200)
                ctype.append("image/" + fmt)
                clen.append(n)
        return pa.table(
            {
                "url": pa.array([str(u) for u in urls], pa.string()),
                "status": pa.array(status, pa.int32()),
                "content_type": pa.array(ctype, pa.string()),
                "content_length": pa.array(clen, pa.int64()),
            }
        )

    def get_prefix(self, urls: list[str], n: int = 1024) -> list[bytes]:
        """GET-first-N-bytes analog (cninfo_report_crawler.py:146-150 reads
        1024 B to check the %PDF magic). A real HTTP client issues a ranged /
        streamed request; the columnar analog still reads the row group but
        returns only the prefix, keeping the probe's output tiny."""
        ids = image_id_of_url(urls)
        t = self._read(ids, ["image_id", "bytes"])
        pos = pc.index_in(pa.array(ids, pa.string()), value_set=t["image_id"])
        blobs = pc.take(t["bytes"], pos)
        return [b.as_py()[:n] if b.is_valid else b"" for b in blobs]

    def get(self, urls: list[str]) -> pa.Table:
        """GET analog: (url, status, content_type, bytes). Alignment is pure
        Arrow (``index_in`` + ``take``) — payload bytes never round-trip
        through Python objects."""
        ids = image_id_of_url(urls)
        t = self._read(ids, ["image_id", "fmt", "bytes"])
        ids_arr = pa.array(ids, pa.string())
        pos = pc.index_in(ids_arr, value_set=t["image_id"])
        blobs = pc.take(t["bytes"], pos)          # null where id missing
        fmt = pc.fill_null(pc.take(t["fmt"], pos), "")
        blen = pc.fill_null(pc.binary_length(blobs), 0)
        ok = pc.greater(blen, 0)                  # missing OR zero-byte → 404
        status = pc.if_else(ok, pa.scalar(200, pa.int32()), pa.scalar(404, pa.int32()))
        ctype = pc.if_else(
            ok,
            pc.binary_join_element_wise(pa.array(["image/"] * len(ids)), fmt, ""),
            pa.scalar("", pa.string()),
        )
        empty_blob = pa.scalar(b"", pa.large_binary())
        return pa.table(
            {
                "url": pa.array([str(u) for u in urls], pa.string()),
                "status": status,
                "content_type": ctype,
                "bytes": pc.if_else(ok, blobs, empty_blob),
            }
        )
