"""Stage 2 — frontier → fetch → decode/validate/extract → long + wide tables,
with per-partition checkpoints and lineage for byte-identical resume.

Ray-Data shape (SURVEY.md §3.2 traced → §7.6-7.8):

    frontier ──map_batches(Fetcher actor pool)──▶ payloads        (GET, R:253)
             ──map_batches(Decoder actor pool)──▶ decoded+items   (R:151-198)
             ──map_batches(explode long rows)──▶ long             (R:287-310)
    long     ──groupby(doc keys).map_groups(A5+A6+J3)──▶ wide     (R:431-548)

Checkpointing: the frontier is already partitioned by url-sha1 hash range
(``partition_id``). ``run_stage2`` processes partitions in groups; each
completed group writes its long rows under ``<ckpt>/long/part=<id>/`` plus a
lineage record (rows, bytes_fetched, counters) in ``manifest.json``. A rerun
skips completed partitions (J4/T4: the Ray-native version of the reference's
skip-if-file-exists cache, report_info_collection.py:241-249). Because every
row's placement and order are pure functions of (url_sha1, order_key), the
resumed output is byte-identical to an uninterrupted run (SURVEY.md §4.4).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..config import CrawlConfig
from ..functions.bucketed import _pa_from_pandas
from ..functions.kernels import adjust_amount_special, sentinel_to_zero
from ..schemas import LONG_COLUMNS, PARENT_CATEGORIES
from ..stages.decode import Decoder, FetchDecode
from ..stages.fetch import Fetcher

DOC_KEYS = ["证券代码", "公司名称", "报告名称", "报告日期", "PDF链接"]


def _explode_long(batch: pa.Table) -> pa.Table:
    """Decoded docs → long rows (M17 zero-fill expansion + M9 unit adjust).

    Rows that failed fetch or the content gate contribute nothing (the
    reference returns [] for those, R:257-259, :271-273)."""
    ok = batch.filter(batch["type_ok"])
    # per-doc item lists (json parse is inherently per-row; everything else
    # below is vectorized via np.repeat over the doc-level columns)
    items_col = ok["items_json"].to_pylist()
    cats: list[str] = []
    vals: list[str] = []
    item_idx: list[int] = []
    counts = np.empty(ok.num_rows, dtype=np.int64)
    for i, blob in enumerate(items_col):
        items = json.loads(blob) if blob else []
        if items:
            counts[i] = len(items)
            cats.extend(it["category"] for it in items)
            vals.extend(it["value"] for it in items)
            item_idx.extend(range(len(items)))
        else:
            counts[i] = len(PARENT_CATEGORIES)
            cats.extend(PARENT_CATEGORIES)
            vals.extend("0" for _ in PARENT_CATEGORIES)
            item_idx.extend(range(len(PARENT_CATEGORIES)))
    ridx = np.repeat(np.arange(ok.num_rows), counts)
    idx_arr = pa.array(ridx, pa.int64())

    def rep(col_name: str):
        return ok[col_name].take(idx_arr)

    codes = rep("股票代码")
    # vectorized unit adjust (M9) + sink cleanup (R:680-681)
    amounts = adjust_amount_special(pd.Series(codes.to_pylist(), dtype=object),
                                    pd.Series(vals, dtype=object))
    cleaned = sentinel_to_zero(pa.array([str(a) if a is not None else None for a in amounts], pa.string()))
    flags = pc.cast(rep("_has_data_resource"), pa.int64())
    t = pa.table(
        {
            "证券代码": codes,
            "公司名称": rep("公司名称"),
            "报告名称": rep("财报名称"),
            "报告日期": rep("报告日期"),
            "项目名称": pa.array(cats, pa.string()),
            "金额": cleaned,
            "PDF链接": rep("PDF链接"),
            "_has_data_resource": flags,
            "order_key": rep("order_key"),
            "_item": pa.array(item_idx, pa.int64()),
            "partition_id": rep("partition_id"),
            "url_sha1": rep("url_sha1"),
        }
    )
    return t


def _with_fetch_key(t: pa.Table) -> pa.Table:
    ids = [str(u).rsplit("/", 1)[-1] for u in t["PDF链接"].to_pylist()]
    # metadata-free schema: pandas-written parquet carries a b'pandas' blob
    # that makes pyarrow-16 schemas unhashable and spams Ray's schema-dedup
    # warning on every downstream batch concat
    return t.replace_schema_metadata(None).append_column(
        "_fetch_key", pa.array(ids, pa.string())
    )


def fetch_decode(
    frontier: rd.Dataset,
    corpus_path: str,
    cfg: CrawlConfig,
    *,
    concurrency: int | tuple[int, int] | None = None,
    politeness=None,
    nrows_hint: int | None = None,
) -> rd.Dataset:
    """frontier → decoded docs (streaming; payload bytes dropped after decode
    so only light rows reach the shuffles).

    Fetch locality: the admitted wave is first sorted by content key
    (image id) so each fetch batch covers a contiguous store range and the
    corpus store serves it from O(1) row groups — the columnar analog of
    coalescing a crawl wave into per-shard request queues. Without this,
    order_key-ordered batches scatter across every row group and per-batch
    fetch cost approaches O(corpus), not O(batch). Crawl-order correctness
    is unaffected: ``order_key``/``fetch_seq`` travel with the rows and all
    downstream reductions key on them, never on arrival order."""
    if cfg.fetch_locality:
        frontier = frontier.map_batches(
            _with_fetch_key, batch_format="pyarrow"
        ).sort("_fetch_key")
        # The sort emits uneven range-partitioned blocks (observed 10× size
        # skew); one oversized block = one straggler task holding the whole
        # pipeline's tail (~6 s idle tail measured at 32 CPUs). Split into
        # many small order-preserving blocks so the actor pool drains evenly.
        import ray as _ray

        ncpu = int(_ray.cluster_resources().get("CPU", 32)) if _ray.is_initialized() else 32
        npart = max(64, ncpu * 8)
        if nrows_hint is not None:
            # small waves (scheduler rounds): splitting N rows into >N blocks
            # makes Ray's repartition pad the shortfall with SCHEMA-LESS
            # 0-column tables (split_repartition_task_scheduler builds
            # pyarrow_table_from_pydict({}) for the missing blocks) — keep
            # every block non-empty instead
            npart = max(1, min(npart, nrows_hint))
        frontier = frontier.repartition(npart)
    if cfg.fuse_fetch_decode:
        # one pool doing fetch→decode in-process: payload bytes never enter
        # the object store (see stages.decode.FetchDecode)
        return frontier.map_batches(
            FetchDecode,
            fn_constructor_args=(corpus_path, True, cfg.fault_inject_path),
            batch_format="pyarrow",
            batch_size=cfg.fetch_batch_size,
            concurrency=concurrency or cfg.fetch_actors,
            num_cpus=cfg.actor_num_cpus,
        )
    fetched = frontier.map_batches(
        Fetcher,
        fn_constructor_args=(corpus_path,),
        batch_format="pyarrow",
        batch_size=cfg.fetch_batch_size,
        concurrency=concurrency or cfg.fetch_actors,
        num_cpus=cfg.actor_num_cpus,
    )
    return fetched.map_batches(
        Decoder,
        batch_format="pyarrow",
        batch_size=cfg.decode_batch_size,
        concurrency=concurrency or cfg.decode_actors,
        num_cpus=cfg.actor_num_cpus,
    )


def long_from_decoded(decoded: rd.Dataset) -> rd.Dataset:
    return decoded.map_batches(_explode_long, batch_format="pyarrow")


def _bucket_by_doc(t: pa.Table, num_buckets: int) -> pa.Table:
    """Hash documents (PDF链接) into B buckets so the A5+A6 reduce runs one
    vectorized kernel per bucket instead of one Python call per document."""
    df = t.to_pandas()
    from ..functions.bucketed import BUCKET_FANOUT

    df["_bucket"] = (
        pd.util.hash_pandas_object(df["PDF链接"], index=False)
        % (num_buckets * BUCKET_FANOUT)
    ).astype("int32")
    return _pa_from_pandas(df, preserve_index=False)


def _wide_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """A5 (per (doc, 项目名称): first positive 金额 else first, canonical
    order, report_info_collection.py:462-489) + A6 pivot (R:492-497) + J3
    flag carry (constant per document, R:507-516) for every document in one
    hash bucket — all vectorized."""
    from ..functions.kernels import numeric_value_col
    from ..schemas import SENTINELS, WIDE_COLUMNS

    pos = (numeric_value_col(df["金额"]) > 0).astype(int)
    g = (
        df.assign(_pos=pos)
        .sort_values(["_pos", "order_key", "_item"],
                     ascending=[False, True, True], kind="stable")
        .drop_duplicates(subset=DOC_KEYS + ["项目名称"], keep="first")
    )
    wide = (
        g.set_index(DOC_KEYS + ["_has_data_resource", "项目名称"])["金额"]
        .unstack("项目名称")
        .reset_index()
        .rename_axis(columns=None)
    )
    for cat in PARENT_CATEGORIES:
        if cat not in wide.columns:
            wide[cat] = "0"
        col = wide[cat]
        wide[cat] = col.where(col.notna() & ~col.isin(SENTINELS), "0").astype(str)
    wide = wide.rename(columns={"_has_data_resource": "是否包含数据资产"})
    wide["是否包含数据资产"] = wide["是否包含数据资产"].astype(int)
    return wide[WIDE_COLUMNS]


def wide_from_long(long_ds: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """A5+A6+J3 in one bucketed grouped shuffle over the document keys."""
    bucketed = long_ds.map_batches(
        _bucket_by_doc, fn_kwargs={"num_buckets": num_buckets},
        batch_format="pyarrow",
    )
    # coalesce to ≤ num_buckets blocks, sort on the bucket, and pivot each
    # partition with ONE _wide_bucket call (the kernel reduces by document
    # key internally, so the partition-level call is exact; a per-fine-bucket
    # dispatch cost 2× wall at sf0.1 — see functions/bucketed.py)
    def _apply_block(b: pd.DataFrame):
        if "_bucket" not in b.columns:  # schema-less empty sort partition
            return pa.table({})
        return _pa_from_pandas(_wide_bucket(b.drop(columns=["_bucket"])))

    return (bucketed.repartition(num_buckets).sort("_bucket")
            .map_batches(_apply_block, batch_size=None, batch_format="pandas"))


# ---------------------------------------------------------------------------
# checkpointed execution
# ---------------------------------------------------------------------------

class _PayloadExporter:
    """Actor for ``export_payloads``: one store handle per actor; per batch
    it writes the payload files its rows name and reports what it did."""

    def __init__(self, corpus_path: str, out_dir: str):
        from ..sources.http_store import open_store

        self.store = open_store(corpus_path)
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.files import sanitize_report_filename
        from ..sources.store import ext_of_url

        urls = t["PDF链接"].to_pylist()
        exts = ext_of_url(urls)
        names = [
            sanitize_report_filename(nm, ti, dt, ext)
            for nm, ti, dt, ext in zip(
                t["公司名称"].to_pylist(), t["财报名称"].to_pylist(),
                t["报告日期"].to_pylist(), exts)
        ]
        action = ["exists"] * len(urls)
        nbytes = [0] * len(urls)
        missing = [i for i, nm in enumerate(names)
                   if not os.path.exists(os.path.join(self.out_dir, nm))]
        if missing:
            g = self.store.get([urls[i] for i in missing])
            statuses = g["status"].to_pylist()
            ctypes = g["content_type"].to_pylist()
            blobs = g["bytes"]
            for j, i in enumerate(missing):
                # the reference's content-type gate (R:257-259): only a
                # payload whose type matches its extension is saved
                if statuses[j] != 200 or ctypes[j] != f"image/{exts[i]}":
                    action[i] = "rejected"
                    continue
                blob = blobs[j].as_py()
                path = os.path.join(self.out_dir, names[i])
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)  # atomic: a killed run never leaves partials
                action[i] = "written"
                nbytes[i] = len(blob)
        return pa.table({
            "file_name": pa.array(names, pa.string()),
            "action": pa.array(action, pa.string()),
            "nbytes": pa.array(nbytes, pa.int64()),
        })


def export_payloads(frontier: rd.Dataset, corpus_path: str, out_dir: str,
                    cfg: CrawlConfig) -> rd.Dataset:
    """Payload file sink (S8 + M13): write each validated report's payload
    under the reference's sanitized filename
    ``{公司名称}：{财报名称}_[{报告日期}].{ext}`` (report_info_collection.py
    :237-268), skipping files that already exist — the reference's
    skip-if-file-exists resume (R:241-249). Distributed: each actor fetches
    and writes only its own batch's files; a rerun after a kill re-exports
    only the missing ones. Returns the per-file action table."""
    return frontier.map_batches(
        _PayloadExporter,
        fn_constructor_args=(corpus_path, out_dir),
        batch_format="pyarrow",
        batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors,
        num_cpus=cfg.actor_num_cpus,
    )


def _manifest_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "manifest.json")


def load_manifest(ckpt_dir: str) -> dict:
    p = _manifest_path(ckpt_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"partitions": {}}


def _record_partition(ckpt_dir: str, partition_id: int, lineage: dict) -> None:
    """Atomic manifest update (write tmp + rename)."""
    m = load_manifest(ckpt_dir)
    m["partitions"][str(partition_id)] = lineage
    tmp = _manifest_path(ckpt_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1)
    os.replace(tmp, _manifest_path(ckpt_dir))


def run_stage2_checkpointed(
    frontier: rd.Dataset,
    corpus_path: str,
    ckpt_dir: str,
    cfg: CrawlConfig | None = None,
    *,
    group_size: int = 4,
    max_groups: int | None = None,
) -> list[int]:
    """Process pending url-hash partitions in groups; returns the partition
    ids completed THIS run. ``max_groups`` lets tests simulate a kill.

    Scale shape (VERDICT r01 §4): the frontier and each group's long rows
    live as DISTRIBUTED materialized Datasets (object-store blocks, spilled
    as needed) — never driver pandas frames — and every partition's parquet
    is written by the workers (``Dataset.write_parquet``). The atomic commit
    marker per partition is the directory rename; lineage counts are
    computed with distributed aggregates."""
    import shutil

    import pyarrow.compute as pc

    cfg = cfg or CrawlConfig()
    os.makedirs(os.path.join(ckpt_dir, "long"), exist_ok=True)
    done = {int(k) for k in load_manifest(ckpt_dir)["partitions"]}
    pending = sorted(set(range(cfg.num_partitions)) - done)
    groups = [pending[i : i + group_size] for i in range(0, len(pending), group_size)]
    if max_groups is not None:
        groups = groups[:max_groups]
    completed = []
    # one pass over the frontier; group filters read from object-store blocks
    fsrc = frontier.materialize()
    for grp in groups:
        vs = pa.array(grp, pa.int32())
        sub = fsrc.map_batches(
            lambda t, vs=vs: t.filter(pc.is_in(t["partition_id"], value_set=vs)),
            batch_format="pyarrow",
        )
        decoded = fetch_decode(sub, corpus_path, cfg)
        long_grp = long_from_decoded(decoded).materialize()
        for pid in grp:
            part = long_grp.map_batches(
                lambda t, p=pid: t.filter(pc.equal(t["partition_id"], p)),
                batch_format="pyarrow",
            ).sort(["order_key", "_item"]).materialize()
            rows = part.count()
            pdir = os.path.join(ckpt_dir, "long", f"part={pid}")
            tmp = pdir + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            if rows:
                part.write_parquet(tmp)  # workers write; driver only renames
                n_docs = part.select_columns(["PDF链接"]).groupby("PDF链接").count().count()
            else:
                os.makedirs(tmp, exist_ok=True)
                n_docs = 0
            if os.path.exists(pdir):
                shutil.rmtree(pdir)
            os.replace(tmp, pdir)
            _record_partition(
                ckpt_dir,
                pid,
                {
                    "rows": int(rows),
                    "bytes_fetched": 0,
                    "url_range": [f"{pid:02x}", f"{pid + 1:02x}"],
                    "counters": {"long_rows": int(rows), "docs": int(n_docs)},
                    "checkpoint_path": pdir,
                },
            )
            completed.append(pid)
    return completed


def read_long_checkpoint(ckpt_dir: str) -> rd.Dataset:
    paths = []
    m = load_manifest(ckpt_dir)
    for pid in sorted(int(k) for k in m["partitions"]):
        p = os.path.join(ckpt_dir, "long", f"part={pid}")
        if os.path.isdir(p):
            paths.extend(os.path.join(p, f) for f in sorted(os.listdir(p))
                         if f.endswith(".parquet"))
    from ..sources.readers import read_parquet_clean

    return read_parquet_clean(paths)


def write_excel_reports(long_df: pd.DataFrame, wide_df: pd.DataFrame,
                        long_path: str, wide_path: str) -> bool:
    """S9 — the reference's Excel sinks (report_info_collection.py:701-715):
    delete-if-exists first, long sheet plain, wide sheet with
    ``freeze_panes=(1, 0)``. Uses openpyxl when installed (byte-compatible
    with the reference's pandas.to_excel artifact); otherwise falls back to
    the vendored stdlib OOXML writer (functions/xlsx.py) so the sink is
    exercised end-to-end even in this engine-less sandbox. Returns True —
    an .xlsx is always produced."""
    for p in (long_path, wide_path):
        if os.path.exists(p):
            os.remove(p)  # delete-if-exists (R:701-703)
    try:
        import openpyxl  # noqa: F401

        long_df.to_excel(long_path, index=False)
        with pd.ExcelWriter(wide_path) as xw:
            wide_df.to_excel(xw, index=False, freeze_panes=(1, 0))
    except ImportError:
        from ..functions.xlsx import write_xlsx

        write_xlsx(long_path, long_df)
        write_xlsx(wide_path, wide_df, freeze_panes=(1, 0))
    return True


def long_view(long_ds: rd.Dataset) -> pd.DataFrame:
    """Long table in canonical order with the reference's column set."""
    df = long_ds.to_pandas().sort_values(["order_key", "_item"], kind="stable")
    return df[LONG_COLUMNS].reset_index(drop=True)


def wide_view(wide_ds: rd.Dataset) -> pd.DataFrame:
    df = wide_ds.to_pandas()
    return df.sort_values(DOC_KEYS, kind="stable").reset_index(drop=True)
