"""Listing-enumeration stage (S1): seeds → announcement rows.

The reference walks (exchange × date × category × page) sequentially with an
inline 0.3 s sleep (cninfo_report_crawler.py:185-331, :450-469). Here each
*stream* (one seed row = one (exchange, date, category)) is the parallel
unit: streams are independent in the reference — the in-flight seen set
resets per stream (C:183) and the novelty-based stop conditions only read
within-stream state — so a ``map_batches`` over the seeds table runs
thousands of streams concurrently while each stream's page loop stays
faithfully sequential inside one actor call.

Emits one row per surviving (post in-stream dedup) announcement, stamped
with the canonical order key (SURVEY.md §3.4) at ADMISSION time, so no
downstream parallelism can perturb crawl order.
"""

from __future__ import annotations

from datetime import date

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads

from ..config import CrawlConfig
from ..schemas import EXCHANGE_RANK, encode_order_key


class ListingEnumerator:
    """Actor-pool callable for ``map_batches`` over the seeds table.

    __init__ opens the announcements fixture once per actor (T5-style state);
    __call__ replays each stream's page loop against it, applying the
    reference's stop rules:
      - empty page → stream ends (C:283-288)
      - page > totalpages + 3 → stop (C:249-252)
      - page > totalpages and ≥2 consecutive zero-novelty pages (C:254-257)
      - 3 consecutive zero-novelty pages anywhere (C:317-326)
      - hard cap 500 (C:263-267)
    Politeness: the listing budget (1 page / 0.3 s / stream) is accounted in
    virtual ticks and reported per stream; it shapes timing, never results.
    """

    def __init__(self, announcements_path: str, config: CrawlConfig | None = None,
                 politeness_handle=None):
        self.cfg = config or CrawlConfig()
        self.ds = pads.dataset(announcements_path)
        self.politeness = politeness_handle

    def _stream_table(self, exchange: str, d) -> pa.Table | None:
        """One predicate-pushdown scan per STREAM: only row groups whose
        stats intersect (exchange, date) leave storage, so actor memory is
        bounded by one stream regardless of listing-store size. This stands
        in for the listing API's server-side index; on a real cluster each
        actor would hold a connection, not a table — the per-stream page
        loop is unchanged."""
        import pyarrow.compute as pc

        t = self.ds.to_table(
            filter=(pc.field("exchange") == exchange) & (pc.field("date") == d))
        if t.num_rows == 0:
            return None
        return t.sort_by([("page_num", "ascending"), ("index_in_page", "ascending")])

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        out_tables = []
        ticks_spent = 0
        for seed in batch.to_pylist():
            exchange, d = seed["exchange"], seed["date"]
            erank = EXCHANGE_RANK[exchange]
            days = (d - date(1970, 1, 1)).days
            stream = self._stream_table(exchange, d)
            if stream is None or stream.num_rows == 0:
                continue
            # Vectorized in-stream dedup (C:183, :294-306): the stream table
            # is sorted by (page, index), and first-occurrence-wins over the
            # consumed page PREFIX equals the prefix of first-wins over the
            # whole stream — so one duplicated() pass replaces the per-row
            # seen-set loop, and the page walk below only consults counts.
            keys = pd.DataFrame({
                k: stream[k].to_pylist()
                for k in ("secCode", "announcementTitle", "announcementTime", "adjunctUrl")
            })
            novel = ~keys.duplicated(keep="first").to_numpy()
            page_col = stream["page_num"].to_numpy()
            pages_present, row_counts = np.unique(page_col, return_counts=True)
            rows_per_page = dict(zip(pages_present.tolist(), row_counts.tolist()))
            np_pages, np_counts = np.unique(page_col[novel], return_counts=True)
            novel_per_page = dict(zip(np_pages.tolist(), np_counts.tolist()))
            total_pages = int(pages_present.max(initial=0))
            empty_count = 0
            page = 1
            budget = min(seed.get("page_budget") or cfg.max_pages_limit, cfg.max_pages_limit)
            consumed_through = 0  # last page whose novel rows are admitted
            while True:
                if total_pages and page > total_pages + cfg.overrun_pages:
                    break
                if total_pages and page > total_pages and empty_count >= cfg.overrun_empty_stop:
                    break
                if page > budget:
                    break
                if rows_per_page.get(page, 0) == 0:
                    break
                ticks_spent += cfg.listing_page_ticks
                if novel_per_page.get(page, 0) == 0:
                    empty_count += 1
                    if empty_count >= cfg.max_empty_pages:
                        break
                else:
                    empty_count = 0
                    consumed_through = page
                page += 1
            if consumed_through:
                keep = novel & (page_col <= consumed_through)
                t = stream.filter(pa.array(keep))
                okeys = encode_order_key(
                    np.full(t.num_rows, erank),
                    np.full(t.num_rows, days),
                    t["page_num"].to_numpy(),
                    t["index_in_page"].to_numpy(),
                )
                t = t.append_column("order_key", pa.array(okeys, pa.int64()))
                out_tables.append(t)
        if self.politeness is not None and ticks_spent:
            # account the listing budget against the listing host (async; the
            # grant schedule is reported, it cannot reorder admissions)
            self.politeness.advance.remote(ticks_spent)
        if not out_tables:
            from ..schemas import ANNOUNCEMENTS_SCHEMA

            empty = {f.name: pa.array([], f.type) for f in ANNOUNCEMENTS_SCHEMA}
            empty["order_key"] = pa.array([], pa.int64())
            return pa.table(empty)
        return pa.concat_tables(out_tables)
