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


def binary_views_at(col, indices) -> list:
    """Zero-copy payload access: memoryview slices into the Arrow binary
    column's data buffers at the given row positions (None where the
    position is null/None). The payload bytes are never copied into Python
    ``bytes`` objects — at web-image sizes (~90 KB/row) the old
    ``to_pylist``/``as_py`` path was one full memcpy + allocation per row,
    which is pure memory-bandwidth burn at high core counts (the 32-CPU
    scaling ceiling measured in BASELINE.md). Callers must keep the source
    table/column alive while the views are in use."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    metas = []
    base = 0
    for ch in chunks:
        bufs = ch.buffers()
        odt = np.int64 if pa.types.is_large_binary(ch.type) else np.int32
        offs = np.frombuffer(bufs[1], dtype=odt, count=len(ch) + 1,
                             offset=ch.offset * odt(0).itemsize)
        mv = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
        valid = (ch.is_valid().to_numpy(zero_copy_only=False)
                 if ch.null_count else None)
        metas.append((base, base + len(ch), offs, mv, valid))
        base += len(ch)
    out = []
    for gi in indices:
        if gi is None:
            out.append(None)
            continue
        for lo, hi, offs, mv, valid in metas:
            if lo <= gi < hi:
                j = gi - lo
                if valid is not None and not valid[j]:
                    out.append(None)
                else:
                    out.append(mv[offs[j]:offs[j + 1]])
                break
    return out


def binary_views(col) -> list:
    """Zero-copy views over every row of a binary column, in order."""
    n = col.length() if hasattr(col, "length") else len(col)
    return binary_views_at(col, range(n))


def _rg_stats(f) -> tuple[list, list]:
    """(min, max) of the leading id column per row group — the prune index."""
    mins, maxs = [], []
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(0).statistics
        mins.append(st.min)
        maxs.append(st.max)
    return mins, maxs


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
        self._mins, self._maxs = _rg_stats(f)
        self._file = f
        self._rg_cache: dict[tuple, pa.Table] = {}
        # HEAD index: the "server's" cheap metadata sidecar. Served by
        # row-group-pruned reads exactly like the payload path — per-actor
        # memory stays O(LRU row groups), never O(corpus) (the previous
        # whole-corpus dict would be a per-actor memory wall at scale).
        sidecar = os.path.join(os.path.dirname(corpus_path), "corpus_head.parquet")
        if not os.path.exists(sidecar):
            # degraded fallback (no sidecar): derive it once from the corpus
            # file into a temp sidecar next to it in /tmp, then prune-read it
            import tempfile

            t = f.read(columns=["image_id", "fmt", "bytes"])
            t = pa.table(
                {
                    "image_id": t["image_id"],
                    "fmt": t["fmt"],
                    "content_length": pc.binary_length(t["bytes"]).cast(pa.int64()),
                }
            )
            tmp = tempfile.NamedTemporaryFile(suffix=".parquet", delete=False)
            pq.write_table(t, tmp.name, row_group_size=8192)
            sidecar = tmp.name
        self._head_file = pq.ParquetFile(sidecar)
        self._head_mins, self._head_maxs = _rg_stats(self._head_file)
        self._head_cache: dict[int, pa.Table] = {}

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

    def _read_head(self, ids: list[str]) -> pa.Table:
        """Sidecar row groups covering ``ids`` (same bisect + LRU pattern as
        the payload ``_read``)."""
        hit = set()
        for i in set(ids):
            lo = bisect.bisect_left(self._head_maxs, i)
            if lo < len(self._head_maxs) and self._head_mins[lo] <= i <= self._head_maxs[lo]:
                hit.add(lo)
        if not hit:
            sch = self._head_file.schema_arrow
            return pa.table({f.name: pa.array([], f.type) for f in sch})
        tabs = []
        for g in sorted(hit):
            t = self._head_cache.get(g)
            if t is None:
                t = self._head_file.read_row_groups([g])
                self._head_cache[g] = t
                if len(self._head_cache) > self._RG_CACHE_SIZE:
                    self._head_cache.pop(next(iter(self._head_cache)))
            else:
                self._head_cache[g] = self._head_cache.pop(g)  # LRU refresh
            tabs.append(t)
        return pa.concat_tables(tabs)

    def head(self, urls: list[str]) -> pa.Table:
        """HEAD analog: (url, status, content_type, content_length). Missing
        id → 404; zero-byte payload → 404 (dead link); content_type comes
        from the fmt *column* (server metadata — may lie; the GET magic check
        is the authoritative gate, like %PDF at cninfo_report_crawler.py:149).
        Pure-Arrow alignment over the pruned sidecar read — no per-row loop,
        no whole-corpus index."""
        ids = image_id_of_url(urls)
        t = self._read_head(ids)
        ids_arr = pa.array(ids, pa.string())
        pos = pc.index_in(ids_arr, value_set=t["image_id"])
        fmt = pc.fill_null(pc.take(t["fmt"], pos), "")
        clen = pc.fill_null(pc.take(t["content_length"], pos), 0)
        ok = pc.greater(clen, 0)
        status = pc.if_else(ok, pa.scalar(200, pa.int32()), pa.scalar(404, pa.int32()))
        ctype = pc.if_else(
            ok,
            pc.binary_join_element_wise(pa.array(["image/"] * len(ids)), fmt, ""),
            pa.scalar("", pa.string()),
        )
        return pa.table(
            {
                "url": pa.array([str(u) for u in urls], pa.string()),
                "status": status,
                "content_type": ctype,
                "content_length": clen.cast(pa.int64()),
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
        views = binary_views_at(t["bytes"], pos.to_pylist())
        return [bytes(v[:n]) if v is not None else b"" for v in views]

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

    def get_views(self, urls: list[str]):
        """GET analog for the fused fetch+decode path: returns
        ``(status int32 ndarray, content_type list[str], views, keepalive)``
        where ``views`` are zero-copy memoryview slices into the LRU-cached
        row-group tables (``binary_views_at``) — the payload is never
        copied out of the read buffer at all; the decoder parses it in
        place. ``keepalive`` must stay referenced while views are in use
        (the LRU may evict the backing table on the NEXT read)."""
        ids = image_id_of_url(urls)
        t = self._read(ids, ["image_id", "fmt", "bytes"])
        pos = pc.index_in(pa.array(ids, pa.string()), value_set=t["image_id"])
        idx = pos.to_pylist()
        views = binary_views_at(t["bytes"], idx)
        fmt = pc.fill_null(pc.take(t["fmt"], pos), "").to_pylist()
        status = np.fromiter(
            ((200 if v is not None and len(v) > 0 else 404) for v in views),
            dtype=np.int32, count=len(views))
        ctype = [f"image/{f}" if s == 200 else ""
                 for f, s in zip(fmt, status)]
        views = [v if s == 200 else b"" for v, s in zip(views, status)]
        return status, ctype, views, t
