"""Analytics operator families beyond the crawl core: window ranks, running
totals, exact distributed quantiles, rollup aggregates, deterministic
sampling, wordcount/TF-IDF text aggregation, chained distributed hash joins,
connected-component dup clustering, and a HyperLogLog distinct sketch.

Same conventions as ``pipelines/queries.py``: Ray-Data-first, pruned reads,
vectorized per-batch kernels, keyed shuffles only where semantics require
co-location, money reduced to integer cents before any sum, and every output
column named identically to its oracle twin.

Reference parity note: the reference has no analytics beyond §2's A/O rows
(``report_info_collection.py:431-548`` is its widest reduction); these are
the training-data-pipeline extensions the driver grades as first-class.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _qpool(lo_div: int = 8, hi_div: int = 4):
    """Cluster-derived actor-pool sizing (see queries._actor_pool)."""
    from .queries import _actor_pool

    return _actor_pool(lo_div, hi_div)
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions import bucketed as B
from ..functions.bucketed import _pa_from_pandas
from .queries import _cents, _read


# ---------------------------------------------------------------------------
# Window rank — top-k per group (ROW_NUMBER analog)
# ---------------------------------------------------------------------------

def q_topk_orders_per_customer(sf_dir: str, k: int = 3):
    """Top-k orders per customer by (total_cents desc, o_orderkey asc), with
    the rank column. Per-batch partial top-k shrinks the shuffle to
    ≤ k rows/key/batch before the bucketed exact reduce."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["total_cents"] = _cents(df["o_totalprice"])
        df = df.drop(columns=["o_totalprice"])
        df = df.sort_values(["o_custkey", "total_cents", "o_orderkey"],
                            ascending=[True, False, True], kind="stable")
        return _pa_from_pandas(df.groupby("o_custkey", sort=False).head(k))

    def topk_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["o_custkey", "total_cents", "o_orderkey"],
                          ascending=[True, False, True], kind="stable")
        b = b.groupby("o_custkey", sort=False).head(k).copy()
        b["rk"] = b.groupby("o_custkey", sort=False).cumcount().astype("int64") + 1
        return b

    return B.bucketed_map_groups(
        ds.map_batches(partial, batch_format="pyarrow"), ["o_custkey"], topk_bucket)


# ---------------------------------------------------------------------------
# Running total per key (SUM OVER PARTITION ... ROWS UNBOUNDED PRECEDING)
# ---------------------------------------------------------------------------

def q_cumulative_spend(sf_dir: str):
    """Per-customer running total of order value in admission order
    (o_orderdate, o_orderkey). One keyed shuffle co-locates each customer's
    history; the per-bucket kernel is a vectorized sort + grouped cumsum —
    no partial aggregation exists for running totals, so this is the minimal
    data movement for exact semantics."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["cents"] = _cents(df["o_totalprice"])
        return _pa_from_pandas(df[["o_custkey", "o_orderkey", "o_orderdate", "cents"]])

    def cum_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="stable")
        b["cum_cents"] = b.groupby("o_custkey", sort=False)["cents"].cumsum().astype("int64")
        return b[["o_custkey", "o_orderkey", "cum_cents"]]

    return B.bucketed_map_groups(
        ds.map_batches(prep, batch_format="pyarrow"), ["o_custkey"], cum_bucket)


# ---------------------------------------------------------------------------
# Exact distributed quantiles — two-phase bin-select (no global sort)
# ---------------------------------------------------------------------------

def _group_quantile_disc(ds, value_fn, qs: tuple[float, ...],
                         bin_width: int = 10_000) -> pd.DataFrame:
    """Generic exact per-group discrete quantile (two-phase binned select —
    the q_group_quantiles shape, factored so derived-value quantiles like
    MAD can reuse it). ``value_fn(df) -> int64 ndarray`` produces the value
    column from an orders batch; groups are o_orderpriority. Index rule
    matches DuckDB quantile_disc: idx = ceil(q*n) - 1 clamped to [0, n-1]."""

    def binned(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["v"] = value_fn(df)
        df["bin"] = df["v"] // bin_width
        g = df.groupby(["o_orderpriority", "bin"], as_index=False).agg(
            n=("v", "size"))
        return _pa_from_pandas(g)

    hist = (ds.map_batches(binned, batch_format="pyarrow")
            .groupby(["o_orderpriority", "bin"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas()  # O(groups × bins)
            .sort_values(["o_orderpriority", "bin"]))

    targets: list[tuple[str, float, int, int]] = []
    for prio, g in hist.groupby("o_orderpriority"):
        n = int(g["n"].sum())
        cum = g["n"].cumsum()
        for q in qs:
            idx = min(max(math.ceil(q * n) - 1, 0), n - 1)
            pos = int(np.searchsorted(cum.to_numpy(), idx + 1, side="left"))
            bin_id = int(g["bin"].iloc[pos])
            before = int(cum.iloc[pos - 1]) if pos > 0 else 0
            targets.append((str(prio), q, bin_id, idx - before))

    need: dict[tuple[str, int], list[tuple[float, int]]] = {}
    for prio, q, bin_id, off in targets:
        need.setdefault((prio, bin_id), []).append((q, off))

    def in_target_bins(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["v"] = value_fn(df)
        df["bin"] = df["v"] // bin_width
        key = list(zip(df["o_orderpriority"], df["bin"]))
        mask = pd.Series(key, index=df.index).isin(need)
        return _pa_from_pandas(df.loc[mask, ["o_orderpriority", "bin", "v"]])

    hits = ds.map_batches(in_target_bins, batch_format="pyarrow").to_pandas()
    rows = []
    for (prio, bin_id), wants in need.items():
        vals = np.sort(hits.loc[(hits["o_orderpriority"] == prio)
                                & (hits["bin"] == bin_id), "v"].to_numpy())
        for q, off in wants:
            rows.append((prio, q, int(vals[off])))
    return pd.DataFrame(rows, columns=["o_orderpriority", "q", "value"])


def q_mad_prices(sf_dir: str):
    """Median absolute deviation per priority — the robust-statistics spread
    measure (pairs with q_winsorize_prices). Two chained exact two-phase
    quantile selects: the group medians (O(groups) driver rows, broadcast in
    the second pass's closure), then the median of |cents - med| — four
    cheap scans total, no global sort, phase-B volume bounded by bin
    occupancy."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    med = _group_quantile_disc(
        ds, lambda df: _cents(df["o_totalprice"]), (0.5,))
    med_map = dict(zip(med["o_orderpriority"], med["value"].astype("int64")))

    def dev(df: pd.DataFrame) -> np.ndarray:
        m = df["o_orderpriority"].map(med_map).to_numpy(dtype=np.int64)
        return np.abs(_cents(df["o_totalprice"]) - m)

    mad = _group_quantile_disc(ds, dev, (0.5,))
    out = pd.DataFrame({
        "o_orderpriority": mad["o_orderpriority"],
        "med_cents": mad["o_orderpriority"].map(med_map).astype("int64"),
        "mad_cents": mad["value"].astype("int64"),
    })
    return out.sort_values("o_orderpriority", kind="stable").reset_index(drop=True)


def q_group_quantiles(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99)):
    """Exact per-group quantiles without a global sort: phase A aggregates
    per-(group, coarse-bin) counts (bins are $100 wide, so the aggregate is
    O(groups × price-range/100) — small and bounded regardless of row
    count); the driver walks the tiny cumulative histogram to locate the
    target bin + offset for each quantile; phase B re-reads ONLY the rows in
    target bins (a vectorized mask per batch) and selects positionally.
    Phase-B volume is one bin's occupancy per (group, q) — bounded by the
    value distribution, not the dataset. Index rule matches DuckDB
    quantile_disc: idx = ceil(q*n) - 1 in IEEE double, clamped to [0, n-1]."""
    BIN = 10_000  # cents per coarse bin
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def binned(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["cents"] = _cents(df["o_totalprice"])
        df["bin"] = df["cents"] // BIN
        g = df.groupby(["o_orderpriority", "bin"], as_index=False).agg(
            n=("cents", "size"))
        return _pa_from_pandas(g)

    hist = (
        ds.map_batches(binned, batch_format="pyarrow")
        .groupby(["o_orderpriority", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(groups × bins) — small by construction
        .sort_values(["o_orderpriority", "bin"])
    )

    # driver-side walk of the tiny histogram: find (bin, offset) per (group, q)
    targets: list[tuple[str, str, int, int]] = []  # (prio, label, bin, offset)
    for prio, g in hist.groupby("o_orderpriority"):
        n = int(g["n"].sum())
        cum = g["n"].cumsum()
        for q in qs:
            idx = min(max(math.ceil(q * n) - 1, 0), n - 1)  # 0-based target
            pos = int(np.searchsorted(cum.to_numpy(), idx + 1, side="left"))
            bin_id = int(g["bin"].iloc[pos])
            before = int(cum.iloc[pos - 1]) if pos > 0 else 0
            targets.append((str(prio), f"p{int(q * 100)}", bin_id, idx - before))

    need = {}  # (prio, bin) -> [(label, offset)]
    for prio, label, bin_id, off in targets:
        need.setdefault((prio, bin_id), []).append((label, off))

    def in_target_bins(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["cents"] = _cents(df["o_totalprice"])
        df["bin"] = df["cents"] // BIN
        key = list(zip(df["o_orderpriority"], df["bin"]))
        mask = pd.Series(key, index=df.index).isin(need)
        return _pa_from_pandas(df.loc[mask, ["o_orderpriority", "bin", "cents"]])

    hits = ds.map_batches(in_target_bins, batch_format="pyarrow").to_pandas()

    rows = []
    for (prio, bin_id), wants in need.items():
        vals = np.sort(hits.loc[(hits["o_orderpriority"] == prio)
                                & (hits["bin"] == bin_id), "cents"].to_numpy())
        for label, off in wants:
            rows.append((prio, label, int(vals[off])))
    out = pd.DataFrame(rows, columns=["o_orderpriority", "q", "value_cents"])
    out["value_cents"] = out["value_cents"].astype("int64")
    return out.sort_values(["o_orderpriority", "q"]).reset_index(drop=True)


def q_group_quantiles_cont(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9)):
    """Interpolated per-group quantiles (PERCENTILE_CONT / quantile_cont
    analog) with the same two-phase binned select as q_group_quantiles — no
    global sort. The continuous rule needs the TWO order statistics
    straddling idx = (n-1)·q; phase A's (group, $100-bin) histogram locates
    both positions, phase B re-reads only the target bins, and the driver
    interpolates v_lo + (v_hi − v_lo)·frac in float64 (bit-identical to
    DuckDB's formula on integer cents; rounded to 1e-6 for hash safety)."""
    BIN = 10_000  # cents per coarse bin
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def binned(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["cents"] = _cents(df["o_totalprice"])
        df["bin"] = df["cents"] // BIN
        g = df.groupby(["o_orderpriority", "bin"], as_index=False).agg(
            n=("cents", "size"))
        return _pa_from_pandas(g)

    hist = (
        ds.map_batches(binned, batch_format="pyarrow")
        .groupby(["o_orderpriority", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(groups × bins) — small by construction
        .sort_values(["o_orderpriority", "bin"])
    )

    def locate(g: pd.DataFrame, cum: np.ndarray, pos: int) -> tuple[int, int]:
        """0-based order statistic `pos` → (bin, offset within bin)."""
        p = int(np.searchsorted(cum, pos + 1, side="left"))
        before = int(cum[p - 1]) if p > 0 else 0
        return int(g["bin"].iloc[p]), pos - before

    # (prio, label) → (lo_bin, lo_off, hi_bin, hi_off, frac)
    plan: dict[tuple[str, str], tuple[int, int, int, int, float]] = {}
    need: dict[tuple[str, int], bool] = {}
    for prio, g in hist.groupby("o_orderpriority"):
        n = int(g["n"].sum())
        cum = g["n"].cumsum().to_numpy()
        for q in qs:
            idx = (n - 1) * q
            lo_i, hi_i = int(math.floor(idx)), int(math.ceil(idx))
            lb, lo_off = locate(g, cum, lo_i)
            hb, hi_off = locate(g, cum, hi_i)
            plan[(str(prio), f"p{int(q * 100)}")] = (lb, lo_off, hb, hi_off, idx - lo_i)
            need[(str(prio), lb)] = True
            need[(str(prio), hb)] = True

    def in_target_bins(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["cents"] = _cents(df["o_totalprice"])
        df["bin"] = df["cents"] // BIN
        key = list(zip(df["o_orderpriority"], df["bin"]))
        mask = pd.Series(key, index=df.index).isin(need)
        return _pa_from_pandas(df.loc[mask, ["o_orderpriority", "bin", "cents"]])

    hits = ds.map_batches(in_target_bins, batch_format="pyarrow").to_pandas()
    sorted_bins = {
        k: np.sort(v["cents"].to_numpy())
        for k, v in hits.groupby(["o_orderpriority", "bin"])
    }

    rows = []
    for (prio, label), (lb, lo_off, hb, hi_off, frac) in plan.items():
        v_lo = float(sorted_bins[(prio, lb)][lo_off])
        v_hi = float(sorted_bins[(prio, hb)][hi_off])
        rows.append((prio, label, round(v_lo + (v_hi - v_lo) * frac, 6)))
    out = pd.DataFrame(rows, columns=["o_orderpriority", "q", "value"])
    return out.sort_values(["o_orderpriority", "q"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Rollup aggregate (GROUP BY ROLLUP analog)
# ---------------------------------------------------------------------------

def q_rollup_revenue(sf_dir: str):
    """Order revenue by (region, nation) with ROLLUP totals. The fact-side
    join (orders → customer, both large at scale) is the adaptive hash join
    (broadcast at small SF, bucketed shuffle once customer outgrows the
    broadcast limit); nation→region (25/5 rows, fixed) is a closure map.
    Rollup levels are derived from the nation-level aggregate — a ≤25-row
    table — so subtotals cost nothing extra at any scale."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nk_to_nation = dict(zip(nation["n_nationkey"], nation["n_name"]))
    rk_by_nk = dict(zip(nation["n_nationkey"],
                        nation["n_regionkey"].map(dict(zip(region["r_regionkey"],
                                                           region["r_name"])))))

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = B.attach(orders, "o_custkey", customer, "c_custkey",
                      "c_nationkey", "nationkey")

    def partial(df: pd.DataFrame) -> pa.Table:
        df = df.copy()
        df["revenue_cents"] = _cents(df["o_totalprice"])
        df["nation"] = df["nationkey"].map(nk_to_nation)
        df["region"] = df["nationkey"].map(rk_by_nk)
        g = df.groupby(["region", "nation"], as_index=False)["revenue_cents"].sum()
        return _pa_from_pandas(g)

    base = B.grouped_aggregate_small(
        joined.map_batches(partial, batch_format="pandas"),
        ["region", "nation"],
        [Sum("revenue_cents", alias_name="revenue_cents")],
        key_domain=32).to_pandas()  # ≤ #nations rows
    sub = base.groupby("region", as_index=False)["revenue_cents"].sum()
    sub["nation"] = "ALL"
    total = pd.DataFrame({"region": ["ALL"], "nation": ["ALL"],
                          "revenue_cents": [base["revenue_cents"].sum()]})
    out = pd.concat([base, sub, total], ignore_index=True)[
        ["region", "nation", "revenue_cents"]]
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out.sort_values(["region", "nation"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Deterministic hash sampling (reproducible, SQL-checkable)
# ---------------------------------------------------------------------------

def q_hash_sample_docs(sf_dir: str, pct: int = 10):
    """Deterministic 10% sample via a Knuth multiplicative hash on doc_id —
    reproducible across runs/cluster sizes and expressible in exact integer
    SQL (unlike random_shuffle/random_sample). Purely per-batch: no shuffle,
    no state. Arithmetic stays exact while doc_id < 2^32 (the int64 product
    never wraps); beyond that, widen to uint64 wrap on both sides."""
    threshold = (pct * (1 << 32)) // 100
    ds = _read(sf_dir, "documents", ["doc_id"])

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        # uint64: never wraps for doc_id >= ~3.5e9 (ADVICE r02)
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        return _pa_from_pandas(pd.DataFrame({"doc_id": ids[h < threshold]}))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Wordcount — canonical two-level aggregation with top-k
# ---------------------------------------------------------------------------

def q_word_count_top100(sf_dir: str, k: int = 100):
    """Global token frequencies, top-k by (count desc, token asc). Per-batch
    value_counts is the combiner (shuffle moves O(vocab/batch) partials, not
    O(tokens)); the final sort is over vocabulary-sized data only."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = (t["text"].to_pandas().str.lower()
                .str.findall(r"[a-z0-9]+").explode().dropna())
        vc = toks.value_counts()
        return _pa_from_pandas(pd.DataFrame(
            {"tok": vc.index.astype(str), "n": vc.to_numpy().astype(np.int64)}))

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
    )
    return counts.sort(["n", "tok"], descending=[True, False]).limit(k)


_MG_DECR = "\x00__mg_decr__"  # sentinel row carrying the summed MG decrements


def q_heavy_hitters(sf_dir: str, k: int = 10, capacity: int = 64,
                    batch_size: int | None = None):
    """Misra-Gries heavy hitters over the global token stream — the
    mergeable frequent-items sketch (the other classic sketch family next
    to HyperLogLog). Per batch: an exact value_counts truncated by the MG
    rule (subtract the (capacity+1)-th largest count from all, keep
    positive — the summary is ≤ capacity rows regardless of batch size, so
    the shuffle is O(capacity × batches), never O(tokens)); summaries merge
    associatively by a keyed Sum; one final MG-truncate + top-k runs on the
    driver over ≤ vocabulary rows. Every estimate underestimates by at most
    the total subtracted mass, carried through the same Sum on a sentinel
    row — so ``est ≤ true ≤ est + decr`` and any token with true count
    > decr survives (test_analytics asserts both at capacity 4).

    With ``capacity`` ≥ vocabulary nothing is ever truncated and the
    result is EXACTLY the top-k token counts — which is what the SQL
    oracle checks (the fixture vocabulary is ~30 tokens < 64)."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = (t["text"].to_pandas().str.lower()
                .str.findall(r"[a-z0-9]+").explode().dropna())
        vc = toks.value_counts()
        est = vc.to_numpy().astype(np.int64)
        decr = np.int64(0)
        if len(vc) > capacity:
            cut = est[capacity]  # (capacity+1)-th largest
            keep = est > cut
            decr = np.int64(est.sum() - (est[keep] - cut).sum())
            vc = vc[keep]
            est = est[keep] - cut
        out = pd.DataFrame({"tok": vc.index.astype(str), "est": est})
        return _pa_from_pandas(pd.concat(
            [out, pd.DataFrame({"tok": [_MG_DECR], "est": [decr]})],
            ignore_index=True))

    kw = {"batch_size": batch_size} if batch_size else {}
    merged = (ds.map_batches(partial, batch_format="pyarrow", **kw)
              .groupby("tok").aggregate(Sum("est", alias_name="est"))
              .to_pandas())  # ≤ vocabulary + 1 rows
    decr = int(merged.loc[merged["tok"] == _MG_DECR, "est"].sum())
    cand = merged[merged["tok"] != _MG_DECR].copy()
    if len(cand) > capacity:  # final MG pass over the merged summary
        cand = cand.sort_values(["est", "tok"], ascending=[False, True])
        cut = int(cand["est"].iloc[capacity])
        decr += int(cand["est"].sum() - (cand["est"].head(capacity) - cut).clip(lower=0).sum())
        cand["est"] = cand["est"] - cut
        cand = cand[cand["est"] > 0]
    out = (cand.sort_values(["est", "tok"], ascending=[False, True]).head(k)
           .astype({"est": "int64"}).reset_index(drop=True))
    out["decr_bound"] = np.int64(decr)
    return out[["tok", "est", "decr_bound"]]


# ---------------------------------------------------------------------------
# TF-IDF — per-doc top term (two aggregations + a distributed join)
# ---------------------------------------------------------------------------

def q_tfidf_top_term(sf_dir: str):
    """Per-document argmax TF-IDF term: tf from an in-batch groupby (a doc's
    text lives in one row, so per-doc term counts are complete per batch), df
    via a token-keyed aggregate, joined back with the bucketed hash join, and
    the per-doc argmax via a doc-keyed bucketed reduce. Scores are rounded to
    1e-6 before ranking so the float argmax is libm-independent; ties break
    on token asc."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tf_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        toks = df.assign(tok=df["text"].str.lower().str.findall(r"[a-z0-9]+"))[
            ["doc_id", "tok"]].explode("tok").dropna(subset=["tok"])
        g = toks.groupby(["doc_id", "tok"], as_index=False).agg(tf=("tok", "size"))
        g["tf"] = g["tf"].astype("int64")
        return _pa_from_pandas(g)

    tf = ds.map_batches(tf_partial, batch_format="pyarrow").materialize()
    df_counts = B.grouped_aggregate_auto(tf, "tok", [Count(alias_name="df")])
    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()

    scored = B.bucketed_attach(tf, "tok", df_counts, "tok", "df", "df",
                               auto_parallelism=True)

    def argmax_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["s"] = np.round(b["tf"].to_numpy(np.float64)
                          * np.log(float(n_docs) / b["df"].to_numpy(np.float64)), 6)
        b = b.sort_values(["doc_id", "s", "tok"],
                          ascending=[True, False, True], kind="stable")
        top = b.drop_duplicates("doc_id")
        return pd.DataFrame({"doc_id": top["doc_id"].astype("int64"),
                             "top_term": top["tok"].astype(str)})

    return B.bucketed_map_groups(scored, ["doc_id"], argmax_bucket,
                                 auto_parallelism=True)


# ---------------------------------------------------------------------------
# Chained distributed hash joins + broadcast dims (multi-table revenue)
# ---------------------------------------------------------------------------

def q_brand_region_revenue(sf_dir: str):
    """Lineitem revenue by (part brand, supplier region): two chained
    adaptive joins for the scale-growing sides (part, supplier grow with
    SF — broadcast below ~2M rows, bucketed shuffle above) and a closure
    broadcast for the fixed-size dims (nation/region, 25/5 rows). Per-batch
    partial aggregation shrinks the final shuffle to O(brands × regions)
    per batch."""
    import pyarrow.parquet as pq

    # fixed-cardinality dimension tables (25 nations / 5 regions at ANY
    # scale): a direct footer read costs ~1 ms where spinning up a Ray
    # pipeline per table costs ~0.3 s of scheduler latency each
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"]).to_pandas()
    region_by_nk = dict(zip(nation["n_nationkey"],
                            nation["n_regionkey"].map(dict(zip(region["r_regionkey"],
                                                               region["r_name"])))))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    j1 = B.attach(li, "l_partkey", part, "p_partkey", "p_brand", "brand")
    j2 = B.attach(j1, "l_suppkey", supp, "s_suppkey", "s_nationkey", "nationkey")

    def partial(df: pd.DataFrame) -> pa.Table:
        df = df.copy()
        df["revenue_cents"] = _cents(df["l_extendedprice"] * (1.0 - df["l_discount"]))
        df["region"] = df["nationkey"].map(region_by_nk)
        g = df.groupby(["brand", "region"], as_index=False)["revenue_cents"].sum()
        return _pa_from_pandas(g)

    return B.grouped_aggregate_small(
        j2.map_batches(partial, batch_format="pandas"),
        ["brand", "region"],
        [Sum("revenue_cents", alias_name="revenue_cents")],
        key_domain=128)


# ---------------------------------------------------------------------------
# Connected components — near-dup pair graph → dup clusters
# ---------------------------------------------------------------------------

def connected_components(nodes: rd.Dataset, pairs,
                         max_iters: int = 30) -> rd.Dataset:
    """Connected components by iterative min-label propagation over
    Datasets: ``nodes`` has one int64 ``node`` column, ``pairs`` is an edge
    list (int64 columns ``a``/``b``) — a **Dataset** (the scale path: the
    verified near-dup pair graph can be billions of edges, VERDICT r02 §2)
    or a pandas frame (tests / tiny graphs). Per round, one bucketed hash
    join pulls each neighbor's label across edges and one keyed groupby
    takes the min; the driver sees only a convergence checksum (sum of
    labels, strictly decreasing until fixpoint). Rounds = graph diameter,
    which for near-dup clusters is tiny; for adversarial long-chain graphs
    swap the propagation step for large-star/small-star to get O(log n)
    rounds — the data layout (edge + label Datasets keyed by node) is
    unchanged. Returns ``(node, cluster_id)``; singletons label themselves."""
    labels = nodes.map_batches(
        lambda t: _pa_from_pandas(pd.DataFrame(
            {"node": t["node"].to_numpy().astype(np.int64),
             "label": t["node"].to_numpy().astype(np.int64)})),
        batch_format="pyarrow").materialize()

    def _singletons():
        return labels.map_batches(
            lambda df: df.rename(columns={"label": "cluster_id"}),
            batch_format="pandas")

    if isinstance(pairs, pd.DataFrame):
        if len(pairs) == 0:
            return _singletons()
        sym = pd.DataFrame({
            "node": pd.concat([pairs["a"], pairs["b"]]).astype("int64"),
            "nbr": pd.concat([pairs["b"], pairs["a"]]).astype("int64"),
        }).reset_index(drop=True)
        edges = rd.from_pandas(sym).map_batches(
            lambda t: t.replace_schema_metadata(None),
            batch_format="pyarrow", zero_copy_batch=True)
    else:
        # Dataset edge list: symmetrize per batch (a,b)→{(a,b),(b,a)} and
        # pin the blocks — the edge table is re-joined every round, and the
        # object store spills it if it outgrows memory. The driver never
        # holds a row of it.
        def sym_batch(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy().astype(np.int64)
            b = t["b"].to_numpy().astype(np.int64)
            return pa.table({"node": np.concatenate([a, b]),
                             "nbr": np.concatenate([b, a])})

        edges = pairs.map_batches(sym_batch, batch_format="pyarrow").materialize()
        if edges.count() == 0:
            return _singletons()

    prev_sum = None
    for _ in range(max_iters):
        # each node's neighbors' labels, via the distributed hash join
        nbr_labels = B.bucketed_attach(edges, "nbr", labels, "node",
                                       "label", "nbr_label",
                                       auto_parallelism=True)
        cand = nbr_labels.map_batches(
            lambda df: _pa_from_pandas(pd.DataFrame(
                {"node": df["node"].astype("int64"),
                 "label": df["nbr_label"].astype("int64")})),
            batch_format="pandas")
        labels = B.grouped_aggregate_auto(
            labels.union(cand), "node",
            [Min("label", alias_name="label")]).materialize()
        cur_sum = labels.aggregate(Sum("label"))["sum(label)"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.map_batches(
        lambda df: pd.DataFrame({"node": df["node"].astype("int64"),
                                 "cluster_id": df["label"].astype("int64")}),
        batch_format="pandas")


def q_dup_clusters(sf_dir: str, max_iters: int = 30,
                   pairs: pd.DataFrame | None = None):
    """Duplicate clusters over the verified MinHash near-dup pair graph:
    every document is labeled with the minimum doc_id reachable through
    near-dup edges (connected_components above does the propagation).

    ``pairs`` (doc_a/doc_b frame) can be injected for testing adversarial
    graph shapes; by default the verified MinHash pair list flows in AS A
    DATASET (minhash_lsh_pairs_ds) — the edge list never touches the
    driver (VERDICT r02 §2)."""
    if pairs is None:
        from .queries import minhash_lsh_pairs_ds

        edge = minhash_lsh_pairs_ds(sf_dir).map_batches(
            lambda df: pd.DataFrame({"a": df["doc_a"].astype("int64"),
                                     "b": df["doc_b"].astype("int64")}),
            batch_format="pandas")
    else:
        edge = (pd.DataFrame({"a": pairs["doc_a"], "b": pairs["doc_b"]})
                if len(pairs) else pd.DataFrame({"a": [], "b": []}))
    nodes = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        lambda t: _pa_from_pandas(pd.DataFrame(
            {"node": t["doc_id"].to_numpy().astype(np.int64)})),
        batch_format="pyarrow")
    return connected_components(nodes, edge, max_iters).map_batches(
        lambda df: df.rename(columns={"node": "doc_id"}),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# HyperLogLog — approximate distinct count sketch
# ---------------------------------------------------------------------------

_HLL_P = 12  # 4096 registers → ~1.6% standard error


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 constants), vectorized
    with uint64 wraparound."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_partial(ids: np.ndarray, p: int = _HLL_P) -> pd.DataFrame:
    """Per-batch HLL combiner: (register, max rank) pairs — ≤ 2^p rows per
    batch regardless of batch size, so the shuffle is O(registers)."""
    h = _splitmix64(ids)
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    rem = (h << np.uint64(p)) >> np.uint64(p)  # low 64-p bits, as uint64
    width = 64 - p
    # rank = leading-zeros-within-width + 1; exact for ints < 2^53
    bits = np.zeros(len(rem), dtype=np.int64)
    nz = rem > 0
    bits[nz] = np.floor(np.log2(rem[nz].astype(np.float64))).astype(np.int64) + 1
    rank = width - bits + 1
    df = pd.DataFrame({"reg": reg, "rank": rank})
    return df.groupby("reg", as_index=False)["rank"].max()


def hll_estimate(regs: pd.DataFrame, p: int = _HLL_P) -> int:
    """Standard HLL estimator with the small-range linear-counting
    correction (deterministic given the hash)."""
    m = 1 << p
    M = np.zeros(m, dtype=np.int64)
    M[regs["reg"].to_numpy()] = regs["rank"].to_numpy()
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -M.astype(np.float64)))
    zeros = int(np.sum(M == 0))
    if e <= 2.5 * m and zeros > 0:
        e = m * math.log(m / zeros)
    return int(round(e))


def q_approx_distinct_users(sf_dir: str):
    """Approximate distinct users over events via a distributed HyperLogLog
    sketch (p=12): per-batch register partials → groupby max → a 4096-row
    table on the driver → estimate. The exact count runs alongside (groupby
    user_id → count of groups) for calibration. Deterministic (splitmix64,
    no seeds), so golden-checkable."""
    ds = _read(sf_dir, "events", ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        return _pa_from_pandas(hll_partial(t["user_id"].to_numpy()))

    regs = B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pyarrow"), "reg",
        [Max("rank", alias_name="rank")], key_domain=2048).to_pandas()
    approx = hll_estimate(regs)
    exact = (ds.groupby("user_id").aggregate(Count(alias_name="_n"))).count()
    return pd.DataFrame({"n_users_approx": pd.Series([approx], dtype="int64"),
                         "n_users_exact": pd.Series([exact], dtype="int64")})


def q_approx_distinct_by_type(sf_dir: str):
    """Per-group approximate distinct: one HyperLogLog sketch per event_type,
    built as per-batch (group, register, max-rank) partials → a keyed
    groupby-max over (group, reg). The shuffle is O(groups × 2^p) rows no
    matter how many events flow through — at 100 TB a thousand groups is
    still a ≤4M-row sketch table. Exact per-group counts run alongside
    (two-level groupby, no driver set) for calibration; both columns are in
    the output so the oracle pins the sketch itself, not just the exact
    path. Deterministic (splitmix64), so golden-checkable."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if len(df) == 0:
            return _pa_from_pandas(pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "reg": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int64")}))
        parts = []
        for et, g in df.groupby("event_type", sort=False):
            p = hll_partial(g["user_id"].to_numpy())
            p.insert(0, "event_type", et)
            parts.append(p)
        return _pa_from_pandas(pd.concat(parts, ignore_index=True))

    regs = B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "reg"], [Max("rank", alias_name="rank")],
        key_domain=8192).to_pandas()  # groups × ≤4096 rows
    exact = B.grouped_aggregate_small(
        ds.groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_n")),
        "event_type", [Count(alias_name="n_users_exact")],
        key_domain=8).to_pandas()
    rows = []
    for et, g in regs.groupby("event_type", sort=True):
        rows.append((et, hll_estimate(g[["reg", "rank"]])))
    approx = pd.DataFrame(rows, columns=["event_type", "n_users_approx"])
    out = approx.merge(exact, on="event_type").sort_values("event_type")
    out["n_users_approx"] = out["n_users_approx"].astype("int64")
    out["n_users_exact"] = out["n_users_exact"].astype("int64")
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# Stratified sampling — fixed-k per stratum by deterministic hash rank
# ---------------------------------------------------------------------------

def q_stratified_sample_events(sf_dir: str, k: int = 50):
    """Stratified sample: the k events with the smallest Knuth-hash rank in
    each event_type stratum — the curation primitive for balanced training
    subsets from skewed corpora, deterministic across runs AND cluster sizes
    (which random_sample is not). Per-batch partial top-k caps the shuffle
    at ≤ k rows/stratum/batch; the bucketed reduce takes the exact global
    k. Ties are impossible below 2^32 ids (h is a bijection mod 2^32) but
    event_id breaks them anyway for belt-and-braces determinism."""
    ds = _read(sf_dir, "events", ["event_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ids = df["event_id"].to_numpy()
        # uint64: never wraps for event_id >= ~3.5e9 (ADVICE r02)
        df["h"] = ((ids.astype(np.uint64) * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)).astype(np.int64)
        df = df.sort_values(["event_type", "h", "event_id"], kind="stable")
        return _pa_from_pandas(df.groupby("event_type", sort=False).head(k))

    def strat_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["event_type", "h", "event_id"], kind="stable")
        b = b.groupby("event_type", sort=False).head(k)
        return b[["event_type", "event_id"]]

    return B.bucketed_map_groups(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], strat_bucket, key_domain=8)


# ---------------------------------------------------------------------------
# Set operations — INTERSECT / EXCEPT as one keyed flag aggregate
# ---------------------------------------------------------------------------

def _custkey_year_flags(sf_dir: str, year_a: int, year_b: int) -> rd.Dataset:
    """Per-customer membership flags for two order-year subsets, computed as
    per-batch flag-max partials → ONE keyed aggregate. Both INTERSECT and
    EXCEPT fall out of the same aggregate by filtering the flags — half the
    shuffles of the naive distinct-each-side-then-join plan."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        yr = df["o_orderdate"].dt.year
        g = pd.DataFrame({
            "o_custkey": df["o_custkey"],
            "in_a": (yr == year_a).astype("int64"),
            "in_b": (yr == year_b).astype("int64"),
        })
        return _pa_from_pandas(g.groupby("o_custkey", as_index=False).max())

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Max("in_a", alias_name="in_a"), Max("in_b", alias_name="in_b"))
    )


def q_custkeys_intersect(sf_dir: str):
    """INTERSECT: customers who ordered in both 1995 and 1996."""
    flags = _custkey_year_flags(sf_dir, 1995, 1996)

    def keep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.loc[(df["in_a"] == 1) & (df["in_b"] == 1), ["o_custkey"]]
        return _pa_from_pandas(out.astype({"o_custkey": "int64"}))

    return flags.map_batches(keep, batch_format="pyarrow")


def q_custkeys_except(sf_dir: str):
    """EXCEPT: customers who ordered in 1995 but not in 1996."""
    flags = _custkey_year_flags(sf_dir, 1995, 1996)

    def keep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.loc[(df["in_a"] == 1) & (df["in_b"] == 0), ["o_custkey"]]
        return _pa_from_pandas(out.astype({"o_custkey": "int64"}))

    return flags.map_batches(keep, batch_format="pyarrow")


def q_percent_rank_orders(sf_dir: str):
    """Full-window rank: every order's PERCENT_RANK within its priority
    group under a total order (cents, orderkey — unique, so rank ==
    row_number and DuckDB's tie semantics can't diverge). One keyed
    shuffle of (group, cents, key) triplets; each bucket holds whole
    groups, so the rank and the (n-1) divisor are exact per bucket and
    the double-precision quotient is bit-identical to SQL's. Payload
    columns never move — at scale the rank joins back by key."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _pa_from_pandas(pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"],
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "cents": _cents(df["o_totalprice"]),
        }))

    prepped = ds.map_batches(prep, batch_format="pyarrow")

    def rank_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["o_orderpriority", "cents", "o_orderkey"],
                          kind="stable")
        rk = b.groupby("o_orderpriority", sort=False).cumcount().to_numpy()
        n = (b.groupby("o_orderpriority", sort=False)["cents"]
             .transform("size").to_numpy())
        pct = np.where(n > 1, rk / np.maximum(n - 1, 1), 0.0)
        return pd.DataFrame({"o_orderkey": b["o_orderkey"].to_numpy(),
                             "o_orderpriority": b["o_orderpriority"].to_numpy(),
                             "pct_rank": pct})

    return B.bucketed_map_groups(prepped, ["o_orderpriority"], rank_bucket,
                                 key_domain=5)


# ---------------------------------------------------------------------------
# Windowed aggregates over ordered per-key frames (ROWS-frame family).
# Ray Data has no window primitive; the engine's shape for all of these is
# ONE bucketed keyed shuffle (whole keys co-located) + a vectorized in-bucket
# kernel over the contiguous sorted groups — rank/lag/rolling/cumulative all
# reduce to cumsum/cummax/shift arithmetic on group-contiguous arrays, so
# per-group Python overhead is O(buckets), never O(keys).
# ---------------------------------------------------------------------------

def _orders_cust_cents(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _pa_from_pandas(pd.DataFrame({
            "o_custkey": df["o_custkey"].astype("int64"),
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "o_orderdate": df["o_orderdate"].astype(str),
            "cents": _cents(df["o_totalprice"]),
        }))

    return ds.map_batches(prep, batch_format="pyarrow")


def _sort_cust(b: pd.DataFrame) -> pd.DataFrame:
    return b.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                         kind="stable")


def q_rolling_sum_orders(sf_dir: str, window: int = 3):
    """Per-customer rolling-window aggregate — SUM over ROWS BETWEEN
    ``window-1`` PRECEDING AND CURRENT ROW ordered by (date, key). The
    in-bucket kernel is pure cumsum arithmetic: rows of a key are contiguous
    after the sort, so the window sum is cumsum[i] - cumsum[i-window]
    guarded by the within-group position — no per-key loop, no pandas
    .rolling multi-index."""

    def roll(b: pd.DataFrame) -> pd.DataFrame:
        b = _sort_cust(b)
        g = b.groupby("o_custkey", sort=False)
        cs = g["cents"].cumsum().to_numpy()
        pos = g.cumcount().to_numpy()
        prev = np.zeros_like(cs)
        if len(cs) > window:
            prev[window:] = cs[:-window]
        out = np.where(pos >= window, cs - prev, cs)
        return pd.DataFrame({"o_orderkey": b["o_orderkey"].to_numpy(),
                             "roll_cents": out.astype(np.int64)})

    return B.bucketed_map_groups(_orders_cust_cents(sf_dir), ["o_custkey"], roll)


def q_lag_delta_orders(sf_dir: str):
    """Per-customer LAG delta: cents - LAG(cents) over (date, key) order —
    the change between a customer's consecutive orders. First order per
    customer has no predecessor and is dropped (keeps the column exact
    int64 on both engines). Kernel = one shift on group-contiguous arrays."""

    def lag(b: pd.DataFrame) -> pd.DataFrame:
        b = _sort_cust(b)
        c = b["cents"].to_numpy()
        pos = b.groupby("o_custkey", sort=False).cumcount().to_numpy()
        prev = np.empty_like(c)
        prev[1:] = c[:-1]
        keep = pos >= 1
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy()[keep],
            "delta_cents": (c - prev)[keep].astype(np.int64)})

    return B.bucketed_map_groups(_orders_cust_cents(sf_dir), ["o_custkey"], lag)


def q_running_max_orders(sf_dir: str):
    """Per-customer running maximum (MAX OVER ROWS UNBOUNDED PRECEDING) —
    the 'record high so far' window. Kernel = grouped cummax (vectorized)."""

    def runmax(b: pd.DataFrame) -> pd.DataFrame:
        b = _sort_cust(b)
        rm = b.groupby("o_custkey", sort=False)["cents"].cummax()
        return pd.DataFrame({"o_orderkey": b["o_orderkey"].to_numpy(),
                             "run_max_cents": rm.to_numpy().astype(np.int64)})

    return B.bucketed_map_groups(_orders_cust_cents(sf_dir), ["o_custkey"], runmax)


def q_ntile_orders(sf_dir: str, n: int = 4):
    """NTILE(n) within each order priority, ordered by (cents, key) — the
    quantile-bucketing window (exact SQL semantics: the first N mod n tiles
    take the extra row). Buckets hold whole priority groups, so the rank and
    group size are exact; the tile index is closed-form integer arithmetic
    on the within-group rank."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _pa_from_pandas(pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"],
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "cents": _cents(df["o_totalprice"]),
        }))

    def tile(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["o_orderpriority", "cents", "o_orderkey"],
                          kind="stable")
        g = b.groupby("o_orderpriority", sort=False)
        r = g.cumcount().to_numpy()
        size = g["cents"].transform("size").to_numpy()
        base, rem = size // n, size % n
        split = rem * (base + 1)  # ranks below this sit in the big tiles
        t_ = np.where(r < split, r // np.maximum(base + 1, 1),
                      rem + (r - split) // np.maximum(base, 1))
        return pd.DataFrame({"o_orderkey": b["o_orderkey"].to_numpy(),
                             "tile": (t_ + 1).astype(np.int64)})

    return B.bucketed_map_groups(
        ds.map_batches(prep, batch_format="pyarrow"), ["o_orderpriority"],
        tile, key_domain=5)


def q_mode_quantity_by_flag(sf_dir: str):
    """Grouped MODE: the most frequent l_quantity per l_returnflag (count
    desc, value asc on ties — deterministic). Per-batch partial counts shrink
    the shuffle to O(distinct pairs)/batch; the keyed aggregate and the
    arg-max both run over the tiny (flag × quantity) table."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.assign(l_quantity=df["l_quantity"].astype("int64"))
             .groupby(["l_returnflag", "l_quantity"], as_index=False)
             .size().rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        return g

    counts = B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_returnflag", "l_quantity"], [Sum("n", alias_name="n")],
        key_domain=256)

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["l_returnflag", "n", "l_quantity"],
                          ascending=[True, False, True], kind="stable")
        top = b.drop_duplicates("l_returnflag", keep="first")
        return pd.DataFrame({"l_returnflag": top["l_returnflag"].to_numpy(),
                             "l_quantity": top["l_quantity"].to_numpy().astype(np.int64),
                             "n": top["n"].to_numpy().astype(np.int64)})

    return B.bucketed_map_groups(counts, ["l_returnflag"], pick,
                                 num_buckets=4, key_domain=3)


def q_dense_rank_orders(sf_dir: str):
    """DENSE_RANK within each priority over cents descending — unlike
    percent_rank's unique total order, ties are real here and must share a
    rank with no gaps. Kernel: sort, then the rank is a cumsum of
    value-change flags over the group-contiguous array."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _pa_from_pandas(pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"],
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "cents": _cents(df["o_totalprice"]),
        }))

    def rank(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["o_orderpriority", "cents"],
                          ascending=[True, False], kind="stable")
        grp = b["o_orderpriority"].to_numpy()
        c = b["cents"].to_numpy()
        new_grp = np.empty(len(b), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = grp[1:] != grp[:-1]
        changed = np.empty(len(b), dtype=np.int64)
        changed[0] = 1
        changed[1:] = (c[1:] != c[:-1]).astype(np.int64)
        changed[new_grp] = 1
        # per-group running count of distinct values: global cumsum minus
        # the cumsum at each group's start (groups are contiguous)
        cum = np.cumsum(changed)
        start = np.maximum.accumulate(np.where(new_grp, cum - 1, 0))
        return pd.DataFrame({"o_orderkey": b["o_orderkey"].to_numpy(),
                             "dense_rank": cum - start})

    return B.bucketed_map_groups(
        ds.map_batches(prep, batch_format="pyarrow"), ["o_orderpriority"],
        rank, key_domain=5)


def q_first_last_order(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE per customer over (date, key) order — the
    'first and latest purchase' reduction. Per-batch partial: each batch
    keeps only its own first+last row per key (≤2 rows/key/batch), so the
    keyed shuffle moves a bounded fraction of the table."""
    base = _orders_cust_cents(sf_dir)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = _sort_cust(b)
        first = b.drop_duplicates("o_custkey", keep="first")
        last = b.drop_duplicates("o_custkey", keep="last")
        return pd.concat([first, last], ignore_index=True)

    def reduce_(b: pd.DataFrame) -> pd.DataFrame:
        b = _sort_cust(b)
        first = b.drop_duplicates("o_custkey", keep="first")
        last = b.drop_duplicates("o_custkey", keep="last")
        out = first[["o_custkey", "cents"]].rename(columns={"cents": "first_cents"})
        out = out.merge(
            last[["o_custkey", "cents"]].rename(columns={"cents": "last_cents"}),
            on="o_custkey")
        out["o_custkey"] = out["o_custkey"].astype("int64")
        return out

    pruned = base.map_batches(partial, batch_format="pandas")
    return B.bucketed_map_groups(pruned, ["o_custkey"], reduce_)


def q_new_users_daily(sf_dir: str):
    """Cumulative distinct users by day — running COUNT(DISTINCT) done
    scale-right: per-batch (user → min day) partials → ONE keyed min
    aggregate (each user's first-seen day) → O(days) counts → prefix sum
    over the tiny day table. The running-distinct never shuffles raw
    events, only user keys."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # integer day key without per-row strftime (the string format was
        # measured at ~5 s per pass at sf0.1): same YYYYMMDD values
        dt = df["ts"].dt
        day = (dt.year * 10000 + dt.month * 100 + dt.day).astype("int64")
        g = (pd.DataFrame({"user_id": df["user_id"].astype("int64"), "day": day})
             .groupby("user_id", as_index=False)["day"].min())
        return g

    firsts = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pandas"),
        "user_id", [Min("day", alias_name="day")])

    def day_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day", as_index=False).size()
        return pd.DataFrame({"day": g["day"].astype("int64"),
                             "new_users": g["size"].astype("int64")})

    days = day_counts(firsts.to_pandas()).sort_values("day", kind="stable")
    days["cum_users"] = days["new_users"].cumsum().astype("int64")
    return days.reset_index(drop=True)


def q_corr_price_qty(sf_dir: str):
    """Pearson correlation of extendedprice vs quantity per returnflag —
    mergeable-moments form: per-batch exact int64 partials (n, Σx, Σy, Σxx,
    Σyy, Σxy over cents/quantity) → one keyed Sum → the SAME closed-form
    double expression on both engines (the SQL oracle recomputes from the
    identical integer sums rather than calling corr(), so the doubles are
    bit-identical — the q_group_variance recipe)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = _cents(df["l_extendedprice"])
        y = df["l_quantity"].astype("int64").to_numpy()
        t = pd.DataFrame({"l_returnflag": df["l_returnflag"], "x": x, "y": y})
        g = t.groupby("l_returnflag", as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"))
        g2 = (t.assign(xx=x * x, yy=y * y, xy=x * y)
              .groupby("l_returnflag", as_index=False)
              .agg(sxx=("xx", "sum"), syy=("yy", "sum"), sxy=("xy", "sum")))
        return g.merge(g2, on="l_returnflag")

    sums = B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pandas"), "l_returnflag",
        [Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
         Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
         Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy")],
        key_domain=4).to_pandas()
    n = sums["n"].to_numpy(dtype=np.float64)
    sx = sums["sx"].to_numpy(dtype=np.float64)
    sy = sums["sy"].to_numpy(dtype=np.float64)
    num = n * sums["sxy"].to_numpy(dtype=np.float64) - sx * sy
    den = np.sqrt((n * sums["sxx"].to_numpy(dtype=np.float64) - sx * sx)
                  * (n * sums["syy"].to_numpy(dtype=np.float64) - sy * sy))
    out = pd.DataFrame({"l_returnflag": sums["l_returnflag"],
                        "corr_px_qty": num / den})
    return out.sort_values("l_returnflag", kind="stable").reset_index(drop=True)


def q_doc_length_histogram(sf_dir: str, bucket: int = 100):
    """Corpus length profile: document counts per n_chars bucket — the
    first thing you plot before setting curation thresholds. Per-batch
    value_counts partials → one tiny keyed Sum (O(buckets) rows move)."""
    ds = _read(sf_dir, "documents", ["n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = (df["n_chars"].astype("int64") // bucket) * bucket
        g = b.value_counts().rename_axis("bucket_lo").reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return g

    return B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pandas"), "bucket_lo",
        [Sum("n", alias_name="n")], key_domain=16)


def q_source_quota_sample(sf_dir: str, k: int = 10):
    """Per-source quota sampling — cap every source at its k lowest doc_ids
    (the deterministic variant of source-mixing for a training run). Each
    batch pre-trims to its own top-k per source (≤ k rows/source/batch
    shuffle), then one bucketed exact rank-filter."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["doc_id"] = df["doc_id"].astype("int64")
        df["n_chars"] = df["n_chars"].astype("int64")
        return (df.sort_values(["source", "doc_id"], kind="stable")
                .groupby("source", sort=False).head(k))

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["source", "doc_id"], kind="stable")
        return b.groupby("source", sort=False).head(k).reset_index(drop=True)

    pruned = ds.map_batches(partial, batch_format="pandas")
    return B.bucketed_map_groups(pruned, ["source"], pick, num_buckets=8,
                                 key_domain=20)


def q_bigram_repetition(sf_dir: str):
    """Gopher-style repetition quality signal: per document, how many word
    bigrams are repeats of an earlier bigram (n_bigrams - n_distinct). A
    pure per-document map — no shuffle at all; the kernel is one explode +
    shifted pairing over the batch (doc boundaries masked), a
    drop_duplicates and two grouped counts, all vectorized."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids = df["doc_id"].astype("int64").to_numpy()
        toks = df["text"].str.strip().str.split(r"\s+")
        lens = toks.str.len().fillna(0).astype("int64").to_numpy()
        n_big = np.maximum(lens - 1, 0)
        ex = toks.explode()
        pos = ex.index.to_numpy()  # positional batch row index per token
        tok_arr = ex.to_numpy()
        if len(tok_arr) > 1:
            same = pos[:-1] == pos[1:]
            rows = pos[:-1][same]
            bg = pd.Series(tok_arr[:-1][same]).str.cat(
                pd.Series(tok_arr[1:][same]), sep="\x1f")
            nd = (pd.DataFrame({"row": rows, "bg": bg.to_numpy()})
                  .drop_duplicates()
                  .groupby("row").size())
            distinct = np.zeros(len(df), dtype=np.int64)
            distinct[nd.index.to_numpy()] = nd.to_numpy()
        else:
            distinct = np.zeros(len(df), dtype=np.int64)
        return pd.DataFrame({"doc_id": doc_ids,
                             "n_bigrams": n_big,
                             "n_dup": n_big - distinct})

    def stats_reset(df: pd.DataFrame) -> pd.DataFrame:
        return stats(df.reset_index(drop=True))

    return ds.map_batches(stats_reset, batch_format="pandas")


def q_winsorize_prices(sf_dir: str, lo: float = 0.05, hi: float = 0.95):
    """Per-group winsorization — the robust-statistics cleaning step (clip
    outliers to the group's [p5, p95]): bounds come from the exact
    two-phase binned quantile select (q_group_quantiles — no global sort,
    O(groups × bins) driver state), are collected as O(groups) rows and
    broadcast in the clip closure; the clip itself is one stateless
    vectorized pass, so the whole operator adds zero shuffles beyond the
    tiny bound histogram."""
    b = q_group_quantiles(sf_dir, qs=(lo, hi))
    bdf = b.to_pandas() if hasattr(b, "to_pandas") else b
    lo_lab, hi_lab = f"p{int(lo * 100)}", f"p{int(hi * 100)}"
    lo_map = dict(zip(bdf.loc[bdf["q"] == lo_lab, "o_orderpriority"],
                      bdf.loc[bdf["q"] == lo_lab, "value_cents"].astype("int64")))
    hi_map = dict(zip(bdf.loc[bdf["q"] == hi_lab, "o_orderpriority"],
                      bdf.loc[bdf["q"] == hi_lab, "value_cents"].astype("int64")))

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def clip(df: pd.DataFrame) -> pd.DataFrame:
        c = _cents(df["o_totalprice"])
        lo_v = df["o_orderpriority"].map(lo_map).to_numpy(dtype=np.int64)
        hi_v = df["o_orderpriority"].map(hi_map).to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64").to_numpy(),
            "clipped_cents": np.clip(c, lo_v, hi_v).astype(np.int64),
        })

    return ds.map_batches(clip, batch_format="pandas")


def q_parts_with_lineitems(sf_dir: str, min_qty: int = 50):
    """SEMI join (EXISTS): parts with at least one high-quantity lineitem —
    completes the join matrix (inner/left/full/anti/as-of/range/semi); the
    quantity predicate keeps the join selective (~45-55%% of parts) so the
    oracle actually discriminates. The fact side never moves whole:
    per-batch filter + unique-key partials shrink it to a distinct-key
    Dataset (shuffle is O(unique partials), not O(lineitem)); the dimension
    then keeps matching rows via the adaptive attach (broadcast sorted-key
    probe while the key set is small, bucketed hash join past ~2M keys).
    A semi join IS an inner join against distinct keys, so no new join
    kernel is needed."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])

    def uniq(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        k = np.unique(df.loc[df["l_quantity"] >= min_qty, "l_partkey"]
                      .to_numpy().astype(np.int64))
        return _pa_from_pandas(pd.DataFrame({"l_partkey": k}))

    keys = (li.map_batches(uniq, batch_format="pyarrow")
            .groupby("l_partkey").aggregate(Count(alias_name="_n"))
            .map_batches(lambda df: pd.DataFrame(
                {"l_partkey": df["l_partkey"].astype("int64"),
                 "one": np.ones(len(df), dtype=np.int64)}),
                batch_format="pandas")
            .materialize())

    out = B.attach(part, "p_partkey", keys, "l_partkey", "one", "_m")
    return out.map_batches(
        lambda df: df[["p_partkey", "p_brand"]].astype({"p_partkey": "int64"}),
        batch_format="pandas")


def q_full_outer_activity(sf_dir: str):
    """FULL OUTER join of two per-key aggregates (urgent-order counts vs
    event counts per customer key; both sides have orphan keys). Same
    union-tag shape as the left-outer join: each side emits per-batch
    partial counts into ONE schema with the other side's column zeroed,
    union, one keyed Sum reduce. Full-outer totality falls out of the
    union — every key from either side reaches the reduce — so the cost
    is one shuffle of pre-aggregated partials, no null-handling join pass."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    events = _read(sf_dir, "events", ["user_id"])

    def o_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (df.loc[df["o_orderpriority"] == "1-URGENT"]
             .groupby("o_custkey", as_index=False).size())
        return _pa_from_pandas(pd.DataFrame({
            "custkey": g["o_custkey"].astype("int64"),
            "n_orders": g["size"].astype("int64"),
            "n_events": np.zeros(len(g), dtype=np.int64)}))

    def e_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("user_id", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "custkey": g["user_id"].astype("int64"),
            "n_orders": np.zeros(len(g), dtype=np.int64),
            "n_events": g["size"].astype("int64")}))

    both = (orders.map_batches(o_partial, batch_format="pyarrow")
            .union(events.map_batches(e_partial, batch_format="pyarrow")))
    return both.groupby("custkey").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("n_events", alias_name="n_events"))


def q_group_variance(sf_dir: str):
    """Per-group sample variance via EXACT integer sufficient statistics:
    each batch contributes (n, Σx, Σx²) partials in int64 (x = floor
    dollars, so Σx² stays within int64 beyond sf1), one keyed Sum reduce
    combines them, and the driver evaluates (n·Σx² − (Σx)²)/(n(n−1)) per
    group with arbitrary-precision Python ints before ONE float64 divide —
    the same exact-integer→double rounding DuckDB performs on its HUGEINT
    sums, so the doubles agree bit-for-bit with no epsilon. Streaming
    float variance (Welford) would NOT hash-match across engines; exact
    sufficient statistics are also the only formulation whose partials
    merge associatively across any partitioning."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        d = np.floor(df["o_totalprice"].to_numpy()).astype(np.int64)
        g = pd.DataFrame({"o_orderpriority": df["o_orderpriority"],
                          "n": 1, "sd": d, "sdd": d * d})
        out = g.groupby("o_orderpriority", as_index=False).sum()
        return _pa_from_pandas(out.astype({"n": "int64", "sd": "int64",
                                           "sdd": "int64"}))

    stats = B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pyarrow"), "o_orderpriority",
        [Sum("n", alias_name="n"), Sum("sd", alias_name="sd"),
         Sum("sdd", alias_name="sdd")], key_domain=5).to_pandas()  # O(groups)

    rows = []
    for _, r in stats.iterrows():
        n, sd, sdd = int(r["n"]), int(r["sd"]), int(r["sdd"])  # exact ints
        if n < 2:  # sample variance undefined; mirror the oracle's n>1 gate
            continue
        var = float(n * sdd - sd * sd) / (n * (n - 1))
        rows.append((r["o_orderpriority"], n, var))
    out = pd.DataFrame(rows, columns=["o_orderpriority", "n", "var_dollars"])
    out["n"] = out["n"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Distributed ordered prefix scan — systematic PPS sampling
# ---------------------------------------------------------------------------

def q_pps_sample_orders(sf_dir: str, interval: int = 1_000_000_000,
                        bucket_width: int = 8192):
    """Systematic probability-proportional-to-size sample: walk orders in
    o_orderkey order accumulating price cents; keep every row whose
    [cum-cents, cum) interval crosses a multiple of ``interval``. Exact
    integer math, so selection is identical on any cluster size.

    This is the distributed ORDERED PREFIX SCAN pattern (running totals over
    a global order, unlike q_cumulative_spend's per-key scan): rows bucket by
    key RANGE (order-preserving, not hashed), a tiny per-bucket Sum aggregate
    reaches the driver, the driver exclusive-scans the O(buckets) sums into
    per-bucket offsets (the only driver state — ~1 row per 8k keyspace), and
    a second pass computes within-bucket cumsums + offset and filters, all
    vectorized. Data crosses the wire once (the bucket shuffle); the scan
    itself never moves rows."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["cents"] = _cents(df["o_totalprice"])
        df["kbucket"] = (df["o_orderkey"] // bucket_width).astype("int64")
        return _pa_from_pandas(df[["kbucket", "o_orderkey", "cents"]])

    prepped = ds.map_batches(prep, batch_format="pyarrow")

    def _sum_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("kbucket", as_index=False)["cents"].sum()
        return g.rename(columns={"cents": "s"}).astype({"s": "int64"})

    sums = (B.grouped_aggregate_auto(
                prepped.map_batches(_sum_partial, batch_format="pandas"),
                "kbucket", [Sum("s", alias_name="s")])
            .to_pandas().sort_values("kbucket"))  # O(key-range/8192) rows
    offsets = dict(zip(
        sums["kbucket"],
        np.concatenate([[0], np.cumsum(sums["s"].to_numpy())[:-1]]),
    ))

    def scan_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["kbucket", "o_orderkey"], kind="stable")
        within = b.groupby("kbucket", sort=False)["cents"].cumsum().to_numpy()
        base = b["kbucket"].map(offsets).to_numpy(dtype=np.int64)
        cum = base + within
        keep = (cum // interval) > ((cum - b["cents"].to_numpy()) // interval)
        out = b.loc[keep, ["o_orderkey", "cents"]].astype("int64")
        return out

    # kbucket = key // 8192, so DISTINCT buckets grow 8192× slower than
    # rows — keep partitions ≤ distinct/4 with a matching coarse block
    return B.bucketed_map_groups(prepped, ["kbucket"], scan_bucket,
                                 auto_parallelism=True,
                                 rows_per_block=65536)


def q_pack_sequences(sf_dir: str, budget: int = 2048, bucket_width: int = 8192):
    """Sequence packing for training-data export: lay documents end-to-end
    in doc_id order and cut fixed-token-budget bins — each doc's bin_id /
    bin_offset say exactly where it starts in the packed token stream
    (bin = exclusive-prefix // budget, offset = exclusive-prefix % budget),
    so writers can emit packed training sequences independently per bin.

    Same distributed ordered-prefix-scan shape as q_pps_sample_orders:
    range-bucket by doc_id, O(buckets) per-bucket token sums to the driver,
    exclusive scan of the tiny sums vector, then a vectorized second pass
    computes within-bucket cumsums + offsets. Token counts use the
    whitespace-token definition (separator count + 1), exactly
    len(string_split(text, ' ')) in the SQL oracle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        n = df["text"].fillna("").str.count(" ").to_numpy() + 1
        return _pa_from_pandas(pd.DataFrame({
            "kbucket": (df["doc_id"] // bucket_width).astype("int64"),
            "doc_id": df["doc_id"].astype("int64"),
            "n_tokens": n.astype("int64"),
        }))

    prepped = ds.map_batches(prep, batch_format="pyarrow")

    def _sum_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("kbucket", as_index=False)["n_tokens"].sum()
        return g.rename(columns={"n_tokens": "s"}).astype({"s": "int64"})

    sums = (B.grouped_aggregate_auto(
                prepped.map_batches(_sum_partial, batch_format="pandas"),
                "kbucket", [Sum("s", alias_name="s")])
            .to_pandas().sort_values("kbucket"))  # O(key-range/8192) rows
    offsets = dict(zip(
        sums["kbucket"],
        np.concatenate([[0], np.cumsum(sums["s"].to_numpy())[:-1]]),
    ))

    def scan_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["kbucket", "doc_id"], kind="stable")
        within = b.groupby("kbucket", sort=False)["n_tokens"].cumsum().to_numpy()
        prev = (b["kbucket"].map(offsets).to_numpy(dtype=np.int64)
                + within - b["n_tokens"].to_numpy())
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "n_tokens": b["n_tokens"].to_numpy(),
            "bin_id": prev // budget,
            "bin_offset": prev % budget,
        }).astype("int64")

    # kbucket = key // 8192, so DISTINCT buckets grow 8192× slower than
    # rows — keep partitions ≤ distinct/4 with a matching coarse block
    return B.bucketed_map_groups(prepped, ["kbucket"], scan_bucket,
                                 auto_parallelism=True,
                                 rows_per_block=65536)


# ---------------------------------------------------------------------------
# Ordered grouped collect — string_agg of the top-k keys per group
# ---------------------------------------------------------------------------

def q_source_doc_concat(sf_dir: str, k: int = 3):
    """Per source: the k smallest doc_ids joined into one ordered string
    (collect_list/string_agg analog). Per-batch partial top-k caps the
    shuffle at k rows per (source, batch); the bucketed reduce takes the
    exact global top-k and joins — the collected list is bounded by
    construction (k), which is the only way an ordered-collect stays safe
    at 100 TB (unbounded string_agg of a hot group OOMs any engine)."""
    ds = _read(sf_dir, "documents", ["source", "doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["source", "doc_id"], kind="stable")
        return _pa_from_pandas(df.groupby("source", sort=False).head(k))

    def concat_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["source", "doc_id"], kind="stable")
        b = b.groupby("source", sort=False).head(k)
        g = b.groupby("source", sort=False)["doc_id"].agg(
            top_docs=lambda s: ",".join(str(v) for v in s),
            n_listed="size",
        ).reset_index()
        g["n_listed"] = g["n_listed"].astype("int64")
        return g

    return B.bucketed_map_groups(
        ds.map_batches(partial, batch_format="pyarrow"), ["source"],
        concat_bucket, key_domain=20)


# ---------------------------------------------------------------------------
# CUME_DIST — tie-aware cumulative distribution (vs percent_rank's unique
# order, this one deliberately orders by a NON-unique key so peer-row
# semantics are exercised)
# ---------------------------------------------------------------------------

def q_cume_dist_orders(sf_dir: str):
    """Every order's CUME_DIST within its priority group ordered by cents
    alone (ties are peers and share a value — rank(method='max')/n, exactly
    SQL's peer-inclusive count). One keyed shuffle of (group, cents, key);
    whole groups per bucket make n and the max-rank exact, and the double
    quotient of two int64s is bit-identical to DuckDB's."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _pa_from_pandas(pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"],
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "cents": _cents(df["o_totalprice"]),
        }))

    def cd_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_orderpriority", sort=False)
        rk = g["cents"].rank(method="max").to_numpy()  # peers count together
        n = g["cents"].transform("size").to_numpy()
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy(),
            "o_orderpriority": b["o_orderpriority"].to_numpy(),
            "cume_dist": rk / n,
        })

    return B.bucketed_map_groups(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["o_orderpriority"], cd_bucket, key_domain=5)


# ---------------------------------------------------------------------------
# CUBE — all four groupings of (mktsegment, region) from ONE base aggregate
# ---------------------------------------------------------------------------

def q_cube_revenue(sf_dir: str):
    """Revenue by CUBE(mktsegment, region): the finest grouping is the
    already-shuffled ``q_region_segment_revenue`` aggregate (≤ segments ×
    regions rows — O(25) at any data scale), and every coarser grouping is
    derived from it driver-side for free. NULL grouping slots surface as
    'ALL' so the output is one flat string-keyed table."""
    from .queries import q_region_segment_revenue

    base = q_region_segment_revenue(sf_dir).to_pandas()
    by_seg = base.groupby("mktsegment", as_index=False)["revenue_cents"].sum()
    by_seg["region"] = "ALL"
    by_reg = base.groupby("region", as_index=False)["revenue_cents"].sum()
    by_reg["mktsegment"] = "ALL"
    total = pd.DataFrame({"mktsegment": ["ALL"], "region": ["ALL"],
                          "revenue_cents": [base["revenue_cents"].sum()]})
    out = pd.concat([base, by_seg, by_reg, total], ignore_index=True)[
        ["mktsegment", "region", "revenue_cents"]]
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out.sort_values(["mktsegment", "region"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Weighted average — ratio-of-sums as int64 partials + one exact division
# ---------------------------------------------------------------------------

def q_weighted_avg_disc(sf_dir: str):
    """Quantity-weighted mean discount per return flag. The distributed part
    is two int64 partial sums (numerator bps×qty, denominator qty) — order-
    free and overflow-safe — and the floating division happens exactly once
    on the final per-group row, so the double is bit-identical to SQL's
    regardless of how batches were split."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_discount", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        qty = df["l_quantity"].to_numpy().astype("int64")
        bps = np.floor(df["l_discount"].to_numpy() * 10_000 + 0.5).astype("int64")
        g = pd.DataFrame({"l_returnflag": df["l_returnflag"],
                          "sum_qty": qty, "disc_qty_bps": bps * qty})
        return _pa_from_pandas(g.groupby("l_returnflag", as_index=False).sum())

    agg = B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pyarrow"), ["l_returnflag"],
        [Sum("sum_qty", alias_name="sum_qty"),
         Sum("disc_qty_bps", alias_name="disc_qty_bps")], key_domain=3)

    def ratio(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["sum_qty"] = df["sum_qty"].astype("int64")
        df["disc_qty_bps"] = df["disc_qty_bps"].astype("int64")
        df["wavg_disc_bps"] = (df["disc_qty_bps"].to_numpy().astype("float64")
                               / df["sum_qty"].to_numpy().astype("float64"))
        return df
    return agg.map_batches(ratio, batch_format="pandas")


# ---------------------------------------------------------------------------
# Systematic sampling — exact global ROW_NUMBER without a global sort
# ---------------------------------------------------------------------------

def q_systematic_sample_orders(sf_dir: str, every: int = 97):
    """Every ``every``-th order by global o_orderkey order (systematic
    sampling — complements the hash/PPS/stratified/quota samplers). The
    global ROW_NUMBER is computed WITHOUT a global sort: phase 1 histograms
    fixed-width key bins (per-batch partials → one small aggregate; the
    driver holds O(bins) ≈ keyspace/8192 and broadcasts exclusive prefix
    offsets), phase 2 shuffles once on the bin and ranks within each bin
    locally — rank = bin offset + local index. Both phases are
    key-partitioned, so the operator scales as ordinary keyed reduction."""
    import ray

    BIN = 8192
    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def binc(t: pa.Table) -> pa.Table:
        b, c = np.unique(t["o_orderkey"].to_numpy() // BIN, return_counts=True)
        return _pa_from_pandas(pd.DataFrame({"bin": b, "n": c}))

    hist = (B.grouped_aggregate_auto(
        ds.map_batches(binc, batch_format="pyarrow"),
        "bin", [Sum("n", alias_name="n")]).to_pandas()
        .sort_values("bin"))  # O(bins) — keyspace/8192
    bins = hist["bin"].to_numpy().astype("int64")
    offs = np.concatenate([[0], hist["n"].to_numpy().astype("int64").cumsum()[:-1]])
    side = ray.put((bins, offs))

    def prep(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy().astype("int64")
        return _pa_from_pandas(pd.DataFrame({"o_orderkey": k, "bin": k // BIN}))

    def rank_bucket(b: pd.DataFrame) -> pd.DataFrame:
        bs, os_ = ray.get(side)  # local zero-copy after first node fetch
        b = b.sort_values(["bin", "o_orderkey"], kind="stable")
        local = b.groupby("bin", sort=False).cumcount().to_numpy()
        off = os_[np.searchsorted(bs, b["bin"].to_numpy())]
        rn = off + local + 1
        keep = (rn - 1) % every == 0
        return pd.DataFrame({"rn": rn[keep],
                             "o_orderkey": b["o_orderkey"].to_numpy()[keep]})

    return B.bucketed_map_groups(
        ds.map_batches(prep, batch_format="pyarrow"), ["bin"], rank_bucket,
        auto_parallelism=True)


# ---------------------------------------------------------------------------
# Skyline (pareto frontier) — Ray Data has no such primitive; local-skyline
# partials + one tiny reduce (skyline(∪ local skylines) == skyline(all))
# ---------------------------------------------------------------------------

def _skyline_kernel(df: pd.DataFrame) -> pd.DataFrame:
    """2-D skyline minimizing dd (days), maximizing cents. A row is dominated
    iff some row has an earlier-or-equal date and a higher-or-equal price
    with at least one strict — i.e. keep rows beating the strictly-earlier
    running max AND matching their own day's max."""
    df = df.sort_values(["dd", "cents"], ascending=[True, False], kind="stable")
    per_day = df.groupby("dd", sort=False)["cents"].max()  # appearance order = dd asc
    prior = per_day.cummax().shift(1, fill_value=np.int64(-1))
    pm = df["dd"].map(prior).to_numpy()
    sm = df["dd"].map(per_day).to_numpy()
    c = df["cents"].to_numpy()
    return df.loc[(c > pm) & (c == sm), ["o_orderkey", "dd", "cents"]]


def q_skyline_orders(sf_dir: str):
    """Pareto-optimal orders over (earliest date, highest value). Each batch
    reduces to its local skyline (expected O(log n) survivors); survivors —
    a provably dominance-closed superset of the answer — meet in one final
    kernel. No global sort, no all-pairs comparison anywhere."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])

    def local(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        d = pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "dd": (df["o_orderdate"].values.astype("datetime64[D]")
                   .astype("int64")),
            "cents": _cents(df["o_totalprice"]),
        })
        return _pa_from_pandas(_skyline_kernel(d))

    survivors = ds.map_batches(local, batch_format="pyarrow")

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_one", pa.array(np.zeros(t.num_rows, dtype="int64")))

    return B.bucketed_map_groups(survivors.map_batches(tag, batch_format="pyarrow"),
                                 ["_one"], lambda b: _skyline_kernel(b),
                                 key_domain=1)


# ---------------------------------------------------------------------------
# Bloom-prefiltered semi-join — exact result, sketch-sized broadcast
# ---------------------------------------------------------------------------

_BLOOM_BITS = 1 << 20  # 128 KB packed — fixed-size broadcast at any scale
_BLOOM_K = 4


def _bloom_probe_idx(keys: np.ndarray, j: int) -> np.ndarray:
    """j-th double-hash probe position for each key (Kirsch–Mitzenmacher:
    h1 + j·h2 covers k independent probes from two mixes)."""
    h1 = _splitmix64(keys)
    h2 = _splitmix64(keys ^ np.uint64(0xA076_1D64_78BD_642F))
    return ((h1 + np.uint64(j) * h2) % np.uint64(_BLOOM_BITS)).astype(np.int64)


def q_bloom_semi_join_orders(sf_dir: str, segment: str = "BUILDING"):
    """Orders belonging to customers of one market segment — a semi-join
    where the big side is PREFILTERED by a Bloom filter of the small side's
    keys before the exact join. The filter is a fixed 128 KB bitmap (OR of
    per-batch partial bitmaps, broadcast once via ray.put), so at 100 TB the
    orders scan drops every non-member row for free and only the ~f.p. rate
    of survivors pays the exact adaptive join that removes false positives.
    Result is EXACT — the bloom only prunes, membership is re-verified."""
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_mktsegment"])

    def seg_keys(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        k = df.loc[df["c_mktsegment"] == segment, "c_custkey"].to_numpy()
        return _pa_from_pandas(pd.DataFrame({"c_custkey": k.astype("int64"),
                                             "one": np.ones(len(k), dtype="int64")}))

    # materialized once: consumed twice (bitmap build + exact verify join)
    members = cust.map_batches(seg_keys, batch_format="pyarrow").materialize()

    def partial_bitmap(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy().astype(np.uint64)
        bits = np.zeros(_BLOOM_BITS // 64, dtype=np.uint64)
        for j in range(_BLOOM_K):
            idx = _bloom_probe_idx(k, j)
            np.bitwise_or.at(bits, idx >> 6,
                             np.uint64(1) << (idx & 63).astype(np.uint64))
        nz = np.nonzero(bits)[0]
        return _pa_from_pandas(pd.DataFrame({"word": nz.astype("int64"),
                                             "val": bits[nz].astype("int64")}))

    # OR-combine sparse partials: driver holds the FIXED-SIZE bitmap only
    # (128 KB however big the corpus), never the key list.
    parts = members.map_batches(partial_bitmap, batch_format="pyarrow").to_pandas()
    bloom = np.zeros(_BLOOM_BITS // 64, dtype=np.uint64)
    if len(parts):
        ors = parts.groupby("word")["val"].agg(
            lambda s: np.bitwise_or.reduce(s.to_numpy().astype(np.uint64)))
        bloom[ors.index.to_numpy()] = ors.to_numpy().astype(np.uint64)
    bloom_ref = ray.put(bloom)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def prefilter(t: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)  # node-local zero-copy after first fetch
        k = t["o_custkey"].to_numpy().astype(np.uint64)
        ok = np.ones(len(k), dtype=bool)
        for j in range(_BLOOM_K):
            idx = _bloom_probe_idx(k, j)
            ok &= (bits[idx >> 6] >> (idx & 63).astype(np.uint64)) & np.uint64(1) != 0
        df = pd.DataFrame({"o_orderkey": t["o_orderkey"].to_numpy().astype("int64")[ok],
                           "o_custkey": k[ok].astype("int64")})
        return _pa_from_pandas(df)

    survivors = orders.map_batches(prefilter, batch_format="pyarrow")
    # exact verification: inner join against the true member set kills the
    # bloom's false positives (adaptive: broadcast small, shuffle large)
    exact = B.attach(survivors, "o_custkey", members, "c_custkey",
                     "one", "_ck")
    return exact.map_batches(
        lambda df: df[["o_orderkey", "o_custkey"]], batch_format="pandas")


# ---------------------------------------------------------------------------
# LEAD — days until the customer's next order
# ---------------------------------------------------------------------------

def q_lead_next_order(sf_dir: str):
    """Per order: days until the same customer's next order (LEAD over the
    per-customer date order; last orders emit nothing). Same single-shuffle
    window shape as lag/rolling: co-locate each customer, sort group-
    contiguously, vectorized shift."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _pa_from_pandas(pd.DataFrame({
            "o_custkey": df["o_custkey"].astype("int64"),
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "dd": df["o_orderdate"].values.astype("datetime64[D]").astype("int64"),
        }))

    def lead_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["o_custkey", "dd", "o_orderkey"], kind="stable")
        nxt = b.groupby("o_custkey", sort=False)["dd"].shift(-1)
        keep = nxt.notna()
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy()[keep],
            "days_to_next": (nxt.to_numpy()[keep] - b["dd"].to_numpy()[keep])
            .astype("int64")})

    return B.bucketed_map_groups(
        ds.map_batches(prep, batch_format="pyarrow"), ["o_custkey"],
        lead_bucket)


# ---------------------------------------------------------------------------
# Interval union — total days covered by overlapping per-order windows
# ---------------------------------------------------------------------------

def q_interval_union_days(sf_dir: str, span: int = 7):
    """Per customer: how many distinct calendar days fall inside the union
    of that customer's order windows [orderdate, orderdate+span). The
    classic sweep: sort each customer's intervals, clip every window at the
    running max end of its predecessors, sum the positive remainders — an
    exact interval-union without materializing per-day rows (the naive
    explode is span× the data). One keyed shuffle, vectorized cummax/shift
    kernel."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _pa_from_pandas(pd.DataFrame({
            "o_custkey": df["o_custkey"].astype("int64"),
            "s": df["o_orderdate"].values.astype("datetime64[D]").astype("int64"),
        }))

    def union_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["o_custkey", "s"], kind="stable").copy()
        e = b["s"] + span
        cm = e.groupby(b["o_custkey"]).cummax()
        pme = cm.groupby(b["o_custkey"]).shift(1)
        start = np.maximum(b["s"].to_numpy(),
                           pme.fillna(b["s"]).to_numpy().astype("int64"))
        covered = np.maximum(e.to_numpy() - start, 0)
        out = pd.DataFrame({"o_custkey": b["o_custkey"].to_numpy(),
                            "covered_days": covered})
        g = out.groupby("o_custkey", as_index=False).sum()
        return g.astype({"covered_days": "int64"})

    return B.bucketed_map_groups(
        ds.map_batches(prep, batch_format="pyarrow"), ["o_custkey"],
        union_bucket)


# ---------------------------------------------------------------------------
# Join + grouped COUNT DISTINCT — attach a dimension, dedup, count
# ---------------------------------------------------------------------------

def q_supplier_brand_diversity(sf_dir: str):
    """Distinct part brands shipped per supplier. Brand attaches to each
    lineitem through the adaptive hash join (broadcast while part is small,
    bucketed shuffle at scale); the count-distinct is per-batch (supplier,
    brand) dedup partials → one keyed reduce that dedups exactly and
    counts — the shuffle carries at most |suppliers|×|brands| rows per
    batch, not the lineitem stream."""
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    j = B.attach(li, "l_partkey", part, "p_partkey", "p_brand", "brand")

    def partial(df: pd.DataFrame) -> pa.Table:
        g = df[["l_suppkey", "brand"]].drop_duplicates()
        return _pa_from_pandas(g.astype({"l_suppkey": "int64"}))

    def count_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates()
        g = b.groupby("l_suppkey", as_index=False).size()
        return pd.DataFrame({"l_suppkey": g["l_suppkey"].astype("int64"),
                             "n_brands": g["size"].astype("int64")})

    return B.bucketed_map_groups(
        j.map_batches(partial, batch_format="pandas"), ["l_suppkey"],
        count_bucket, auto_parallelism=True)  # supplier domain is data-dependent


# ---------------------------------------------------------------------------
# Join + date arithmetic — late-shipment counts per ship month
# ---------------------------------------------------------------------------

def q_late_shipments_monthly(sf_dir: str, grace_days: int = 60):
    """Lineitems shipped more than ``grace_days`` after their order date,
    counted per ship month. The order date attaches to each lineitem as an
    int day through ONE adaptive join keyed on the fact table's natural key;
    the filter and month floor are stateless vectorized maps and the final
    aggregate is O(months)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def oprep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _pa_from_pandas(pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "odd": df["o_orderdate"].values.astype("datetime64[D]").astype("int64"),
        }))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    j = B.attach(li, "l_orderkey", orders.map_batches(oprep, batch_format="pyarrow"),
                 "o_orderkey", "odd", "odd")

    def late(df: pd.DataFrame) -> pa.Table:
        sd = df["l_shipdate"].values.astype("datetime64[D]")
        keep = sd.astype("int64") - df["odd"].to_numpy() > grace_days
        ym = sd[keep].astype("datetime64[M]").astype(str)  # 'YYYY-MM'
        g = (pd.Series(ym).groupby(ym).size())
        return _pa_from_pandas(pd.DataFrame({
            "ship_month": g.index.to_numpy(),
            "n_late": g.to_numpy().astype("int64")}))

    return B.grouped_aggregate_auto(
        j.map_batches(late, batch_format="pandas"),
        "ship_month", [Sum("n_late", alias_name="n_late")])


# ---------------------------------------------------------------------------
# Semi-structured extraction — JSON field stats per event type
# ---------------------------------------------------------------------------

def q_json_extract_stats(sf_dir: str):
    """Pull the integer ``k`` out of the events' JSON ``props`` column and
    aggregate (sum, min, max, count) per event type. Extraction is one
    vectorized compiled-regex pass per batch (no per-row json.loads — the
    schema-on-read fast path for flat fields); the aggregate is the usual
    per-batch partial → small keyed reduce."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        k = (df["props"].str.extract(r'"k":\s*(-?\d+)', expand=False)
             .astype("float64"))
        g = (pd.DataFrame({"event_type": df["event_type"], "k": k})
             .dropna(subset=["k"]))
        g["k"] = g["k"].astype("int64")
        agg = g.groupby("event_type").agg(
            sum_k=("k", "sum"), min_k=("k", "min"), max_k=("k", "max"),
            n=("k", "size")).reset_index()
        return _pa_from_pandas(agg.astype(
            {"sum_k": "int64", "min_k": "int64", "max_k": "int64", "n": "int64"}))

    agg = B.grouped_aggregate_small(
        ds.map_batches(extract, batch_format="pyarrow"), ["event_type"],
        [Sum("sum_k", alias_name="sum_k"), Min("min_k", alias_name="min_k"),
         Max("max_k", alias_name="max_k"), Sum("n", alias_name="n")],
        key_domain=8)

    def fix(df: pd.DataFrame) -> pd.DataFrame:
        return df.astype({"sum_k": "int64", "min_k": "int64",
                          "max_k": "int64", "n": "int64"})
    return agg.map_batches(fix, batch_format="pandas")


# ---------------------------------------------------------------------------
# Type-token ratio — per-document lexical diversity (no shuffle at all)
# ---------------------------------------------------------------------------

def q_type_token_ratio_docs(sf_dir: str):
    """Per document: token count and distinct-token (type) count — the
    classic lexical-diversity pair, emitted as exact integers (the ratio is
    the consumer's division). Documents never split across batches, so this
    is embarrassingly parallel: one vectorized explode + two grouped sizes
    per batch, zero shuffles."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def ttr(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ex = df["text"].fillna("").str.split(" ").explode()
        ids = df["doc_id"].to_numpy()[ex.index.to_numpy()]
        g = pd.DataFrame({"doc_id": ids, "tok": ex.to_numpy()})
        n_tok = g.groupby("doc_id").size()
        n_typ = g.drop_duplicates().groupby("doc_id").size()
        out = pd.DataFrame({"doc_id": n_tok.index.to_numpy().astype("int64"),
                            "n_tokens": n_tok.to_numpy().astype("int64"),
                            "n_types": n_typ.reindex(n_tok.index).to_numpy()
                            .astype("int64")})
        return _pa_from_pandas(out)

    return ds.map_batches(ttr, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Global quantile binning — decile label per row without a global sort
# ---------------------------------------------------------------------------

def q_decile_docs(sf_dir: str):
    """Assign every document the decile of its length under the GLOBAL
    n_chars distribution. Phase 1 reuses the binned-histogram trick (unit
    bins here — n_chars is small-domain) to derive the nine exact
    quantile_disc boundaries from O(bins) driver state; phase 2 is a
    stateless broadcast searchsorted — no global sort, no shuffle. Decile =
    number of boundaries strictly below the value, matching the SQL twin
    row-for-row including ties ON a boundary."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def binc(t: pa.Table) -> pa.Table:
        b, c = np.unique(t["n_chars"].to_numpy(), return_counts=True)
        return _pa_from_pandas(pd.DataFrame({"bin": b.astype("int64"),
                                             "n": c.astype("int64")}))

    hist = (B.grouped_aggregate_auto(
        ds.map_batches(binc, batch_format="pyarrow"),
        "bin", [Sum("n", alias_name="n")]).to_pandas().sort_values("bin"))
    n = int(hist["n"].sum())
    cum = hist["n"].cumsum().to_numpy()
    vals = hist["bin"].to_numpy()
    qs = [i / 10 for i in range(1, 10)]
    # quantile_disc: value at idx = ceil(q*n) - 1 (clamped)
    bounds = np.array([vals[np.searchsorted(cum, min(max(math.ceil(q * n) - 1, 0), n - 1) + 1,
                                            side="left")] for q in qs], dtype="int64")

    def label(t: pa.Table) -> pa.Table:
        v = t["n_chars"].to_numpy()
        decile = np.searchsorted(bounds, v, side="left").astype("int64") + 1
        return _pa_from_pandas(pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy().astype("int64"),
            "decile": decile}))

    return ds.map_batches(label, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Tie-inclusive top-k — RANK() ≤ k keeps ALL peers of the k-th value
# ---------------------------------------------------------------------------

def q_top_parts_with_ties(sf_dir: str, k: int = 3):
    """Per brand: every part whose RANK() by (retail cents desc) is ≤ k —
    ties at the boundary are all kept (WITH TIES semantics, vs
    topk_orders_per_customer's ROW_NUMBER cut). The per-batch partial is
    still valid under ties: a row with ≤ k-1 strictly-higher rows globally
    has ≤ k-1 strictly-higher rows in its own batch, so batch-rank ≤ k is a
    superset of the survivors and the shuffle stays ≈ k rows per
    (brand, batch) plus boundary peers."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_retailprice"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        d = pd.DataFrame({"p_brand": df["p_brand"],
                          "p_partkey": df["p_partkey"].astype("int64"),
                          "cents": _cents(df["p_retailprice"])})
        rk = d.groupby("p_brand")["cents"].rank(method="min", ascending=False)
        return _pa_from_pandas(d[rk <= k])

    def rank_bucket(b: pd.DataFrame) -> pd.DataFrame:
        rk = b.groupby("p_brand")["cents"].rank(method="min", ascending=False)
        out = b[rk <= k].copy()
        out["rk"] = rk[rk <= k].astype("int64")
        return out

    return B.bucketed_map_groups(
        ds.map_batches(prep, batch_format="pyarrow"), ["p_brand"],
        rank_bucket, auto_parallelism=True)


# ---------------------------------------------------------------------------
# Exact COUNT DISTINCT per day — dedup partials, never raw streams
# ---------------------------------------------------------------------------

def q_daily_active_users(sf_dir: str):
    """Exact distinct users per calendar day (the companion to
    approx_distinct_users' HLL and new_users_daily's first-seen). Per-batch
    (day, user) dedup caps the shuffle at distinct observations; the
    user-dedup then counts inside one keyed reduce."""
    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def ud(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        day = df["ts"].values.astype("datetime64[D]").astype(str)
        g = pd.DataFrame({"day": day,
                          "user_id": df["user_id"].astype("int64")}).drop_duplicates()
        return _pa_from_pandas(g)

    def count_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.drop_duplicates().groupby("day", as_index=False).size()
        return pd.DataFrame({"day": g["day"],
                             "n_users": g["size"].astype("int64")})

    return B.bucketed_map_groups(
        ds.map_batches(ud, batch_format="pyarrow"), ["day"], count_bucket,
        auto_parallelism=True)


# ---------------------------------------------------------------------------
# Global cumulative share — ordered prefix sum over a small key domain
# ---------------------------------------------------------------------------

def q_orders_running_share(sf_dir: str):
    """Per order day: that day's revenue, the running total through that
    day, and the cumulative share in basis points (int floor). Per-day
    partial sums shrink the stream to O(days); the prefix scan over the
    day-ordered totals is O(days) driver state — the same bounded-state
    shape as pack_sequences' offset scan, legitimate at any corpus size
    because days grow with TIME, not data volume."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def daysum(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = pd.DataFrame({
            "day": df["o_orderdate"].values.astype("datetime64[D]").astype(str),
            "day_cents": _cents(df["o_totalprice"]),
        }).groupby("day", as_index=False).sum()
        return _pa_from_pandas(g.astype({"day_cents": "int64"}))

    per_day = (B.grouped_aggregate_auto(
        ds.map_batches(daysum, batch_format="pyarrow"),
        "day", [Sum("day_cents", alias_name="day_cents")])
        .to_pandas().sort_values("day").reset_index(drop=True))  # O(days)
    per_day["day_cents"] = per_day["day_cents"].astype("int64")
    cum = per_day["day_cents"].cumsum().astype("int64")
    total = int(per_day["day_cents"].sum())
    per_day["cum_cents"] = cum
    per_day["share_bps"] = (cum * 10_000 // max(total, 1)).astype("int64")
    return per_day


# ---------------------------------------------------------------------------
# Signed equi-width histogram — floored bucketing below zero
# ---------------------------------------------------------------------------

def q_acctbal_histogram_signed(sf_dir: str, width_cents: int = 50_000):
    """Customer account balances histogrammed in fixed-width buckets where
    negative balances FLOOR (bucket −1 covers [−width, 0)) — the edge the
    truncating integer division of most engines gets wrong. Pure per-batch
    partials + one tiny keyed aggregate."""
    ds = _read(sf_dir, "customer", ["c_acctbal"])

    def binc(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"].to_numpy())
        b, c = np.unique(cents // width_cents, return_counts=True)  # floors
        return _pa_from_pandas(pd.DataFrame({"bucket": b.astype("int64"),
                                             "n": c.astype("int64")}))

    return B.grouped_aggregate_auto(
        ds.map_batches(binc, batch_format="pyarrow"),
        "bucket", [Sum("n", alias_name="n")])


# ---------------------------------------------------------------------------
# Bottom-k priority sample — coordination-free uniform sample of fixed size
# ---------------------------------------------------------------------------

def q_bottomk_hash_sample(sf_dir: str, k: int = 100):
    """The k documents with the smallest Knuth-hash priority — a bottom-k
    sketch, i.e. a uniform fixed-SIZE sample (vs hash_sample_docs' fixed
    RATE) that needs no coordination: every batch keeps its local bottom-k,
    one tiny reduce keeps the global bottom-k. The shuffle is ≤ k rows per
    batch no matter the corpus size, and the same hash on a second table
    yields a coordinated sample (the classic bottom-k join trick)."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        h = ((ids.astype(np.uint64) * np.uint64(2654435761))
             & np.uint64(0xFFFFFFFF)).astype("int64")
        d = pd.DataFrame({"doc_id": ids.astype("int64"), "h": h})
        d = d.sort_values(["h", "doc_id"], kind="stable").head(k)
        d["_one"] = np.int64(0)
        return _pa_from_pandas(d)

    def bottom_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["h", "doc_id"], kind="stable").head(k)
        return b[["doc_id", "h"]]

    return B.bucketed_map_groups(
        ds.map_batches(partial, batch_format="pyarrow"), ["_one"],
        bottom_bucket, key_domain=1)


# ---------------------------------------------------------------------------
# Global exact quantiles of a float measure — cents-binned two-phase select
# ---------------------------------------------------------------------------

def q_event_value_quantiles(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99)):
    """Exact global p50/p90/p99 of the events' value measure (reduced to
    integer cents). Same two-phase shape as the per-group quantiles: unit
    cent bins → one keyed aggregate → O(bins) driver cumsum picks the exact
    quantile_disc values. No sort, no sampling, exact at any scale whose
    value domain is bounded (cents here: ~50k bins); for genuinely unbounded
    domains see q_kll_quantiles_value."""
    ds = _read(sf_dir, "events", ["value"])

    def binc(t: pa.Table) -> pa.Table:
        cents = np.floor(t["value"].to_numpy() * 100 + 0.5).astype("int64")
        b, c = np.unique(cents, return_counts=True)
        return _pa_from_pandas(pd.DataFrame({"bin": b, "n": c.astype("int64")}))

    hist = (B.grouped_aggregate_auto(
        ds.map_batches(binc, batch_format="pyarrow"),
        "bin", [Sum("n", alias_name="n")]).to_pandas().sort_values("bin"))
    n = int(hist["n"].sum())
    cum = hist["n"].cumsum().to_numpy()
    vals = hist["bin"].to_numpy()
    rows = []
    for q in qs:
        idx = min(max(math.ceil(q * n) - 1, 0), n - 1)
        rows.append((int(q * 100), int(vals[np.searchsorted(cum, idx + 1, side="left")])))
    return pd.DataFrame({"pct": pd.Series([r[0] for r in rows], dtype="int64"),
                         "value_cents": pd.Series([r[1] for r in rows], dtype="int64")})


# ---------------------------------------------------------------------------
# KLL-style mergeable quantile sketch — for UNBOUNDED value domains where
# the exact binned two-phase can't fix a bin width
# ---------------------------------------------------------------------------

_KLL_K = 512


def kll_partial(vals: np.ndarray, k: int = _KLL_K) -> pd.DataFrame:
    """One batch → a (level, value) summary where a level-L row represents
    2^L original rows. Deterministic compaction (sorted, alternating parity
    by level) instead of KLL's coin flip — reproducible across runs; the
    parity alternation cancels the systematic rank bias of always keeping
    evens."""
    levels: dict[int, np.ndarray] = {0: np.asarray(vals, dtype="float64")}
    return _kll_compact(levels, k)


def _kll_compact(levels: dict[int, np.ndarray], k: int) -> pd.DataFrame:
    lv = 0
    while lv <= max(levels):
        arr = levels.get(lv)
        if arr is not None and len(arr) > 2 * k:
            arr = np.sort(arr)
            promoted = arr[(lv & 1)::2]  # half the items, double the weight
            levels[lv] = np.empty(0, dtype="float64")
            levels[lv + 1] = np.concatenate(
                [levels.get(lv + 1, np.empty(0, dtype="float64")), promoted])
        lv += 1
    out = [(l, v) for l, a in levels.items() for v in a]
    df = pd.DataFrame(out, columns=["level", "value"])
    return df.astype({"level": "int64", "value": "float64"})


def kll_merge(parts: pd.DataFrame, k: int = _KLL_K) -> pd.DataFrame:
    """Merge any number of partial summaries: concat by level, re-compact.
    Associative up to the deterministic compaction order — rank error stays
    O(levels/k) regardless of how the stream was split."""
    levels = {int(l): g["value"].to_numpy(dtype="float64")
              for l, g in parts.groupby("level")}
    return _kll_compact(levels, k)


def kll_quantile(summary: pd.DataFrame, q: float) -> float:
    """Weighted quantile over the summary (weight 2^level per row)."""
    v = summary["value"].to_numpy()
    w = np.power(2.0, summary["level"].to_numpy())
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cw = np.cumsum(w)
    total = cw[-1]
    idx = int(np.searchsorted(cw, q * total, side="left"))
    return float(v[min(idx, len(v) - 1)])


def q_kll_quantiles_value(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99)):
    """Approximate global quantiles of events.value via the mergeable KLL
    summary: per-batch partials (≤ 2k·levels rows each — constant-size
    shuffle), one small reduce, weighted quantile at the end. This is the
    scale path for CONTINUOUS/unbounded measures where no bin width works;
    rank error is property-tested ≤ ~1% at k=512 (tests/test_analytics.py).
    No SQL oracle — the estimate is definitionally approximate; the driver
    records the rows-only check and the error bound lives in the tests."""
    ds = _read(sf_dir, "events", ["value"])

    def partial(t: pa.Table) -> pa.Table:
        return _pa_from_pandas(kll_partial(t["value"].to_numpy()))

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    summary = kll_merge(parts)  # O(k·levels) driver state
    return pd.DataFrame({
        "pct": pd.Series([int(q * 100) for q in qs], dtype="int64"),
        "value_est": pd.Series([kll_quantile(summary, q) for q in qs],
                               dtype="float64")})


# ---------------------------------------------------------------------------
# Streaming watermark — late-event accounting under arrival order
# ---------------------------------------------------------------------------

def q_late_events_watermark(sf_dir: str, lateness_us: int = 3_600_000_000):
    """Per event type: how many events arrived LATE — event time more than
    one hour behind the watermark (the running max event-time over the
    arrival order, event_id, at the moment just before the event). This is
    the allowed-lateness accounting every streaming engine needs; the
    watermark is a global ordered prefix-MAX, computed with the same
    sortless binned-offset machinery as systematic_sample_orders' prefix
    count: per-bin max partials → O(bins) driver prefix-max (exclusive
    carry-in per bin, broadcast) → one bin-keyed shuffle where each bin
    resolves its strictly-before running max locally. Works for any monoid
    (sum → row numbers, max → watermarks)."""
    import ray

    BIN = 8192
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type"])

    def binmax(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = pd.DataFrame({"bin": df["event_id"].to_numpy().astype("int64") // BIN,
                          "mx": df["ts"].values.astype("datetime64[us]").astype("int64")})
        return _pa_from_pandas(g.groupby("bin", as_index=False).max())

    hist = (B.grouped_aggregate_auto(
        ds.map_batches(binmax, batch_format="pyarrow"),
        "bin", [Max("mx", alias_name="mx")]).to_pandas().sort_values("bin"))
    bins = hist["bin"].to_numpy().astype("int64")
    # exclusive carry-in: max over all STRICTLY EARLIER bins
    carry = np.concatenate([[np.int64(np.iinfo("int64").min)],
                            np.maximum.accumulate(hist["mx"].to_numpy().astype("int64"))[:-1]])
    side = ray.put((bins, carry))

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _pa_from_pandas(pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "tsu": df["ts"].values.astype("datetime64[us]").astype("int64"),
            "event_type": df["event_type"],
            "bin": df["event_id"].to_numpy().astype("int64") // BIN,
        }))

    def late_bucket(b: pd.DataFrame) -> pd.DataFrame:
        bs, cs = ray.get(side)
        b = b.sort_values(["bin", "event_id"], kind="stable")
        ts = b["tsu"].to_numpy()
        # strictly-before running max within the bin, then carry-in
        g = b.groupby("bin", sort=False)["tsu"]
        run = g.cummax().to_numpy()
        prev = g.shift(1)  # NaN on each bin's first row
        local_before = np.where(prev.notna(), np.roll(run, 1), np.iinfo("int64").min)
        wm = np.maximum(local_before, cs[np.searchsorted(bs, b["bin"].to_numpy())])
        # compare without subtracting: the int64-min "no watermark yet"
        # sentinel would underflow in (wm - ts) and wrap positive
        late = wm > ts + lateness_us
        out = pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                            "late": late.astype("int64")})
        g2 = out.groupby("event_type", as_index=False).agg(
            n_late=("late", "sum"), n_total=("late", "size"))
        return g2.astype({"n_late": "int64", "n_total": "int64"})

    part = B.bucketed_map_groups(
        ds.map_batches(prep, batch_format="pyarrow"), ["bin"], late_bucket,
        auto_parallelism=True)
    return B.grouped_aggregate_small(
        part, ["event_type"],
        [Sum("n_late", alias_name="n_late"), Sum("n_total", alias_name="n_total")],
        key_domain=8).map_batches(
            lambda df: df.astype({"n_late": "int64", "n_total": "int64"}),
            batch_format="pandas")


# ---------------------------------------------------------------------------
# Cross-document duplicated n-grams (C4/RefinedWeb-style near-dup signal)
# ---------------------------------------------------------------------------

def q_dup_ngram_docs(sf_dir: str, n: int = 3):
    """Per document: distinct word trigrams, and how many of them appear in
    at least one OTHER document. Stage 1 shingles each batch vectorized
    (``text.word_grams`` — one explode + shifted str.cat) and dedups within
    the doc; stage 2 shuffles once on the gram and, since every holder of a
    gram is co-located, emits (doc, is_cross_dup) rows directly — no
    join-back; stage 3 is an ordinary doc-keyed count/sum. At corpus scale
    the gram key would be hashed to uint64 to cut shuffle width (collision
    odds are the birthday bound); kept as the literal string here so the
    oracle comparison stays exact."""
    from ..functions import text as T

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def shingle(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = T.word_grams(df["text"], n=n)
        g["doc_id"] = df["doc_id"].to_numpy()[g["row"].to_numpy()]
        out = g[["doc_id", "gram"]].drop_duplicates()  # docs never split across batches
        return _pa_from_pandas(out)

    def gram_bucket(b: pd.DataFrame) -> pd.DataFrame:
        nd = b.groupby("gram", sort=False)["doc_id"].transform("size").to_numpy()
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(),
                             "dup": (nd >= 2).astype("int64")})

    flagged = B.bucketed_map_groups(
        ds.map_batches(shingle, batch_format="pyarrow"), ["gram"],
        gram_bucket, auto_parallelism=True)

    def doc_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("doc_id", as_index=False).agg(
            n_grams=("dup", "size"), n_cross_dup=("dup", "sum"))
        g["n_grams"] = g["n_grams"].astype("int64")
        g["n_cross_dup"] = g["n_cross_dup"].astype("int64")
        return g

    return B.bucketed_map_groups(flagged, ["doc_id"], doc_bucket,
                                 auto_parallelism=True)


# ---------------------------------------------------------------------------
# Embedding-column statistics (list<float> → zero-copy matrix kernels)
# ---------------------------------------------------------------------------

def q_embedding_norm_stats(sf_dir: str):
    """Per-label L2-norm statistics over the embedding column, exact: each
    element is quantized to milli-units (two float64 ops — widen, then
    FLOOR(x·1000+0.5) — performed identically by numpy and the SQL oracle,
    so the int64 results are bit-equal), squared norms are exact integer
    sums (order-independent), and the label rollup is Sum/Min/Max of
    integers. The batch kernel flattens the Arrow list column once
    (zero-copy values buffer) and reduces with ``np.add.reduceat`` over the
    list offsets — no per-row Python, ragged-safe, and the canonical shape
    for embedding-column profiling at corpus scale (norm distributions are
    the standard pre-filter before ANN indexing / cosine dedup)."""

    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype("float64")
        milli = np.floor(flat * 1000.0 + 0.5).astype("int64")
        offs = col.offsets.to_numpy()
        offs = offs - offs[0]  # slice-relative
        sq = np.add.reduceat(milli * milli, offs[:-1]) if len(milli) else \
            np.zeros(0, dtype="int64")
        g = pd.DataFrame({"label": t["label"].to_numpy().astype("int64"),
                          "sq": sq})
        a = g.groupby("label", as_index=False).agg(
            n=("sq", "size"), sum_sq=("sq", "sum"),
            min_sq=("sq", "min"), max_sq=("sq", "max"))
        return _pa_from_pandas(a.astype({"n": "int64"}))

    out = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pyarrow"),
        "label", [Sum("n", alias_name="n"), Sum("sum_sq", alias_name="sum_sq"),
                  Min("min_sq", alias_name="min_sq"),
                  Max("max_sq", alias_name="max_sq")])
    return out.map_batches(
        lambda df: df.astype({c: "int64" for c in
                              ("n", "sum_sq", "min_sq", "max_sq")}),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# TPC-H Q5-style same-nation revenue (the 6-table join shape)
# ---------------------------------------------------------------------------

def q_local_supplier_volume(sf_dir: str):
    """Revenue per nation counting only lineitems whose SUPPLIER and the
    order's CUSTOMER share a nation — the TPC-H Q5 join shape
    (lineitem⋈supplier⋈orders⋈customer⋈nation with a cross-side equality).
    Scale plan: the two dimension maps (supplier→nation, customer→nation)
    go through the adaptive ``attach`` (broadcast while they fit, bucketed
    shuffle past the limit — parquet-read counts are metadata-cheap); the
    one always-large⋈large edge — lineitem⋈orders on orderkey — goes
    through the bucketed hash join directly (the right side is a derived
    pipeline whose count() would execute it, and orders never stays
    broadcast-small at cluster scale). Revenue is the exact integer
    cents·(10000−discount_bps) so sums are order-independent."""

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    li = B.attach(li, "l_suppkey", sup, "s_suppkey",
                  "s_nationkey", "supp_nation")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    o2 = B.attach(orders, "o_custkey", cust, "c_custkey",
                  "c_nationkey", "cust_nation")

    def to_rev(df: pd.DataFrame) -> pa.Table:
        cents = _cents(df["l_extendedprice"])
        bps = np.floor(df["l_discount"].to_numpy(dtype="float64") * 10000.0
                       + 0.5).astype("int64")
        out = pd.DataFrame({"l_orderkey": df["l_orderkey"].astype("int64"),
                            "supp_nation": df["supp_nation"].astype("int64"),
                            "rev": cents * (10000 - bps)})
        return _pa_from_pandas(out)

    # strategy from the ORDERS PARQUET count (metadata-cheap — counting the
    # derived o2 would execute it): broadcast while orders fit the envelope,
    # bucketed shuffle past it (the only plan at cluster scale)
    n_orders = _read(sf_dir, "orders", ["o_orderkey"]).count()
    rev = li.map_batches(to_rev, batch_format="pandas")
    if n_orders <= B.BROADCAST_ROW_LIMIT:
        joined = B.broadcast_attach(rev, "l_orderkey", o2, "o_orderkey",
                                    "cust_nation", "cust_nation")
    else:
        joined = B.bucketed_attach(rev, "l_orderkey", o2, "o_orderkey",
                                   "cust_nation", "cust_nation",
                                   auto_parallelism=True)

    def partial(df: pd.DataFrame) -> pa.Table:
        df = df[df["supp_nation"] == df["cust_nation"]]
        g = (df.groupby("supp_nation", as_index=False)["rev"].sum()
             .rename(columns={"supp_nation": "nk", "rev": "revenue_units"}))
        return _pa_from_pandas(g.astype({"nk": "int64",
                                         "revenue_units": "int64"}))

    agg = B.grouped_aggregate_small(
        joined.map_batches(partial, batch_format="pandas"),
        "nk", [Sum("revenue_units", alias_name="revenue_units")],
        key_domain=25)

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    name_by_key = dict(zip(nat["n_nationkey"], nat["n_name"]))
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "n_name": df["nk"].map(name_by_key),
            "revenue_units": df["revenue_units"].astype("int64")}),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# Funnel conversion timing (first view → first subsequent purchase)
# ---------------------------------------------------------------------------

def q_conversion_time_stats(sf_dir: str):
    """Across all users who PURCHASED at or after their first VIEW: count,
    and the exact integer sum/min/max of (first qualifying purchase − first
    view) in microseconds. One user-keyed bucketed reduce computes both
    firsts locally (all of a user's events co-locate), emitting one
    O(1)-row partial per bucket; a tiny constant-key aggregate folds the
    partials. The global extrema/sum are integers, so the fold is exact
    and order-independent."""

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        m = df["event_type"].isin(["view", "purchase"])
        df = df.loc[m]
        return _pa_from_pandas(pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "tsu": df["ts"].values.astype("datetime64[us]").astype("int64"),
            "is_view": (df["event_type"] == "view").to_numpy()}))

    def conv_bucket(b: pd.DataFrame) -> pd.DataFrame:
        v = (b[b["is_view"]].groupby("user_id")["tsu"].min()
             .rename("t0").reset_index())
        p = b[~b["is_view"]].merge(v, on="user_id")
        p = p[p["tsu"] >= p["t0"]]
        if len(p) == 0:
            return pd.DataFrame({"_g": pd.Series([], dtype="int64"),
                                 "n_converted": pd.Series([], dtype="int64"),
                                 "sum_delta_us": pd.Series([], dtype="int64"),
                                 "min_delta_us": pd.Series([], dtype="int64"),
                                 "max_delta_us": pd.Series([], dtype="int64")})
        d = p.groupby("user_id", as_index=False).agg(t1=("tsu", "min"),
                                                     t0=("t0", "first"))
        delta = (d["t1"] - d["t0"]).to_numpy()
        return pd.DataFrame({"_g": [np.int64(0)],
                             "n_converted": [np.int64(len(delta))],
                             "sum_delta_us": [np.int64(delta.sum())],
                             "min_delta_us": [np.int64(delta.min())],
                             "max_delta_us": [np.int64(delta.max())]})

    part = B.bucketed_map_groups(
        ds.map_batches(prep, batch_format="pyarrow"), ["user_id"],
        conv_bucket, auto_parallelism=True)
    out = B.grouped_aggregate_small(
        part, "_g",
        [Sum("n_converted", alias_name="n_converted"),
         Sum("sum_delta_us", alias_name="sum_delta_us"),
         Min("min_delta_us", alias_name="min_delta_us"),
         Max("max_delta_us", alias_name="max_delta_us")],
        key_domain=1)
    return out.map_batches(
        lambda df: df.drop(columns=["_g"]).astype(
            {c: "int64" for c in ("n_converted", "sum_delta_us",
                                  "min_delta_us", "max_delta_us")}),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# Triangle counting over the co-purchase graph
# ---------------------------------------------------------------------------

def q_copurchase_triangles(sf_dir: str):
    """Number of triangles in the undirected co-purchase graph (parts that
    co-occur in an order are connected). Degree-ordered orientation, then
    wedge generation with IN-BUCKET closure against a broadcast edge set —
    the standard distributed triangle plan with both classic guards:
    (1) every edge is oriented from its lower-(degree,id) endpoint to the
    higher, bounding out-degrees at O(√E) (arboricity argument; the
    id-only orientation wedge-exploded at hubs); (2) while the oriented
    edge set fits the broadcast envelope it ships once per node as a
    sorted packed-int64 array and each source bucket membership-tests its
    own out-neighbor pairs with one searchsorted — wedges NEVER
    materialize into a shuffle (the keyed wedge-aggregate + closure-join
    plan, kept as the past-broadcast fallback, measured 84 s at sf0.1
    against 15 s for this shape on 1.2M edges / 41M wedges — of which
    ~6 s is the shared pair base itself). Only edges shuffle — never the
    lineitems, never the wedges."""
    import ray

    from .queries import _copurchase_pair_counts

    # the pair base is consumed three times (degrees, orientation, closure)
    # and is already reduced to O(edges) — materialize it once rather than
    # re-running the lineitem pair explosion per consumer
    edges_base = (_copurchase_pair_counts(sf_dir)
                  .select_columns(["part_a", "part_b"]).materialize())

    # vertex degrees → broadcast (deg, id) rank; rank = deg·2³² + id packs
    # the orientation key into one int64 (assumes ids < 2³², the engine's
    # documented key-width envelope)
    def deg_partial(t: pa.Table) -> pa.Table:
        v, d = np.unique(np.concatenate([t.column("part_a").to_numpy(),
                                         t.column("part_b").to_numpy()]),
                         return_counts=True)
        return pa.table({"v": pa.array(v.astype(np.int64)),
                         "d": pa.array(d.astype(np.int64))})

    n_base = edges_base.count()  # materialized → metadata read
    deg = B.grouped_aggregate_auto(
        edges_base.map_batches(deg_partial, batch_format="pyarrow"),
        "v", [Sum("d", alias_name="d")],
        nrows_hint=2 * n_base, rows_per_block=65536).to_pandas()
    vs = deg["v"].to_numpy().astype("int64")
    order = np.argsort(vs, kind="stable")
    vs_sorted = vs[order]
    rank_sorted = (deg["d"].to_numpy().astype("int64")[order] << np.int64(32)) | vs_sorted
    side = ray.put((vs_sorted, rank_sorted))

    def orient(t: pa.Table) -> pa.Table:
        # fused orient + edge-key pack: one pass emits the oriented wedge
        # columns AND the packed src·2³²|dst membership key the broadcast
        # closure needs (the former separate pack_edge map re-read every
        # edge block just to pack two columns it already had in cache)
        vv, rr = ray.get(side)
        a = t.column("part_a").to_numpy()
        b = t.column("part_b").to_numpy()
        ra = rr[np.searchsorted(vv, a)]
        rb = rr[np.searchsorted(vv, b)]
        fwd = ra < rb
        src = np.where(fwd, a, b).astype(np.int64)
        x = np.where(fwd, b, a).astype(np.int64)
        return pa.table({
            "src": pa.array(src),
            "x": pa.array(x),
            "xr": pa.array(np.where(fwd, rb, ra).astype(np.int64)),
            "k": pa.array((src << np.int64(32)) | x)})

    edges = edges_base.map_batches(orient, batch_format="pyarrow").materialize()

    n_edges = edges.count()
    if n_edges <= B.BROADCAST_ROW_LIMIT:
        # broadcast closure: the oriented edge set packs into one sorted
        # int64 array (src·2³² | dst, ~8 B/edge — 1.2M edges ≈ 10 MB at
        # sf0.1, shipped once per node). Each wedge bucket generates its
        # out-neighbor pairs and membership-tests them with ONE
        # searchsorted — the 41M-row wedge aggregate + closure join that
        # dominated the keyed plan (measured 84 s) never materializes.
        ekeys = np.sort(
            edges.select_columns(["k"]).to_pandas()["k"].to_numpy())
        eref = ray.put(ekeys)

        def wedge_close_bucket(b: pa.Table) -> pa.Table:
            # out-neighbor pairs by direct index arithmetic (i<j within
            # each src group, rank-sorted) — a pandas self-merge builds the
            # full d² cross product first (2× the rows, 6 columns); this
            # builds exactly the Σd(d-1)/2 pairs as two int index arrays
            ek = ray.get(eref)
            zero = pa.table({"_g": pa.array([0], pa.int64()),
                             "n": pa.array([0], pa.int64())})
            if b.num_rows == 0 or len(ek) == 0:
                return zero
            src0 = b.column("src").to_numpy()
            order = np.lexsort((b.column("xr").to_numpy(), src0))
            src = src0[order]
            x = b.column("x").to_numpy()[order].astype(np.int64)
            change = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
            sizes = np.diff(np.r_[change, len(src)])
            within = np.arange(len(src)) - np.repeat(change, sizes)
            rep = np.repeat(sizes, sizes) - 1 - within
            total = int(rep.sum())
            if total == 0:
                return zero
            li = np.repeat(np.arange(len(src)), rep)
            starts = np.cumsum(rep) - rep
            ri = np.arange(total) - np.repeat(starts, rep) + li + 1
            cand = (x[li] << np.int64(32)) | x[ri]
            pos = np.clip(np.searchsorted(ek, cand), 0, len(ek) - 1)
            n = int((ek[pos] == cand).sum())
            return pa.table({"_g": pa.array([0], pa.int64()),
                             "n": pa.array([n], pa.int64())})

        part = B.bucketed_map_groups(
            edges.select_columns(["src", "x", "xr"]), ["src"],
            wedge_close_bucket, arrow_fn=True,
            nrows_hint=n_edges, rows_per_block=65536)
    else:
        # cluster-scale fallback: keyed wedge aggregate + bucketed closure
        # join on the rank-ordered pair (the all-shuffle plan)
        def wedge_bucket(b: pd.DataFrame) -> pd.DataFrame:
            m = b.merge(b, on="src")
            m = m[m["xr_x"] < m["xr_y"]]
            g = (m.groupby(["x_x", "x_y"], as_index=False).size()
                 .rename(columns={"x_x": "a", "x_y": "c",
                                  "size": "n_wedges"}))
            return g.astype({"a": "int64", "c": "int64", "n_wedges": "int64"})

        wedges = B.bucketed_map_groups(
            edges.select_columns(["src", "x", "xr"]), ["src"], wedge_bucket,
            nrows_hint=n_edges, rows_per_block=65536)
        oedges = edges.map_batches(
            lambda df: pd.DataFrame({"part_a": df["src"].astype("int64"),
                                     "part_b": df["x"].astype("int64")}),
            batch_format="pandas")

        def tag_wedge(df: pd.DataFrame) -> pa.Table:
            return _pa_from_pandas(pd.DataFrame({
                "a": df["a"], "c": df["c"], "n": df["n_wedges"],
                "_side": np.repeat(np.int8(0), len(df))}))

        def tag_edge(df: pd.DataFrame) -> pa.Table:
            return _pa_from_pandas(pd.DataFrame({
                "a": df["part_a"], "c": df["part_b"],
                "n": np.zeros(len(df), dtype="int64"),
                "_side": np.repeat(np.int8(1), len(df))}))

        u2 = wedges.map_batches(tag_wedge, batch_format="pandas").union(
            oedges.map_batches(tag_edge, batch_format="pandas"))

        def close_bucket(b: pd.DataFrame) -> pd.DataFrame:
            w = b.loc[b["_side"] == 0]
            e = b.loc[b["_side"] == 1, ["a", "c"]]
            m = w.merge(e, on=["a", "c"])
            return pd.DataFrame({"_g": [np.int64(0)],
                                 "n": [np.int64(m["n"].sum())]})

        part = B.bucketed_map_groups(u2, ["a", "c"], close_bucket,
                                     auto_parallelism=True)
    out = B.grouped_aggregate_small(
        part, "_g", [Sum("n", alias_name="n_triangles")], key_domain=1)
    return out.map_batches(
        lambda df: df.drop(columns=["_g"]).astype({"n_triangles": "int64"}),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# Fuzzy string-similarity join (banded Levenshtein inside brand blocks)
# ---------------------------------------------------------------------------

def _levenshtein_band(s: str, t: str, k: int) -> int:
    """Exact Levenshtein distance if ≤ k, else k+1 — classic banded DP
    (O(max(len)·(2k+1)) instead of O(len²)); matches the unrestricted DP
    (DuckDB ``levenshtein``) wherever the true distance is within the
    band."""
    if abs(len(s) - len(t)) > k:
        return k + 1
    if len(s) > len(t):
        s, t = t, s
    prev = list(range(len(s) + 1))
    for j in range(1, len(t) + 1):
        cur = [j] + [k + 1] * len(s)
        lo, hi = max(1, j - k), min(len(s), j + k)
        for i in range(lo, hi + 1):
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1,
                         prev[i - 1] + (s[i - 1] != t[j - 1]))
        if min(cur) > k:
            return k + 1
        prev = cur
    return prev[len(s)]


def q_fuzzy_name_pairs(sf_dir: str, max_dist: int = 2):
    """Near-duplicate part-name pairs: within each brand block, every
    partkey pair whose names are within Levenshtein distance ``max_dist``.
    The blocked fuzzy self-join every entity-resolution pipeline needs —
    the blocking key (brand) bounds the candidate space, the banded DP
    with a length-difference prefilter bounds each comparison, and the DP
    runs only on DISTINCT name pairs (catalog string domains are tiny
    next to row counts, so the row-level expansion is a vectorized merge
    against the close-name-pair table — measured 37.7 s → ~1 s at sf0.1
    where 20k parts share ~200 names). Partitioning assumption: block
    sizes stay worker-sized (brands are a fixed domain); production
    blocking on higher-cardinality keys (sorted-neighborhood, q-gram LSH)
    drops in at the same seam."""

    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_name"])

    def pair_bucket(b: pd.DataFrame) -> pd.DataFrame:
        # the DP runs once per DISTINCT (name, name) pair — catalog-style
        # string domains are tiny relative to row counts (duplicate names
        # dominate), so the quadratic Python DP collapses to O(|names|²)
        # while the row-level pair expansion is a vectorized merge
        dcache: dict[tuple[str, str], int] = {}
        frames = []
        for _, blk in b.groupby("p_brand", sort=False):
            names = sorted(set(blk["p_name"]))
            close = []  # (name_u, name_v, dist), u <= v
            for i, u in enumerate(names):
                close.append((u, u, 0))  # equal names: distance 0
                for v in names[i + 1:]:
                    d = dcache.get((u, v))
                    if d is None:
                        d = _levenshtein_band(u, v, max_dist)
                        dcache[(u, v)] = d
                    if d <= max_dist:
                        close.append((u, v, d))
            if not close:
                continue
            np_pairs = pd.DataFrame(close, columns=["nu", "nv", "dist"])
            grp = blk[["p_partkey", "p_name"]]
            pu = grp.rename(columns={"p_partkey": "pk_u", "p_name": "nu"})
            pv = grp.rename(columns={"p_partkey": "pk_v", "p_name": "nv"})
            m = np_pairs.merge(pu, on="nu").merge(pv, on="nv")
            a = np.minimum(m["pk_u"].to_numpy(), m["pk_v"].to_numpy())
            bb = np.maximum(m["pk_u"].to_numpy(), m["pk_v"].to_numpy())
            keep = a != bb  # drop self-pairs from the nu==nv cross product
            f = pd.DataFrame({"part_a": a[keep], "part_b": bb[keep],
                              "dist": m["dist"].to_numpy()[keep]})
            # nu==nv cross products emit each unordered pair twice (x,y)
            # and (y,x) → one dedup; nu<nv combos arrive exactly once
            frames.append(f.drop_duplicates())
        if not frames:
            return pd.DataFrame({
                "part_a": pd.Series([], dtype="int64"),
                "part_b": pd.Series([], dtype="int64"),
                "dist": pd.Series([], dtype="int64")})
        out = pd.concat(frames, ignore_index=True)
        return out.astype({"part_a": "int64", "part_b": "int64",
                           "dist": "int64"})

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _pa_from_pandas(pd.DataFrame({
            "p_partkey": df["p_partkey"].astype("int64"),
            "p_brand": df["p_brand"], "p_name": df["p_name"]}))

    return B.bucketed_map_groups(
        ds.map_batches(prep, batch_format="pyarrow"), ["p_brand"],
        pair_bucket, auto_parallelism=True)


# ---------------------------------------------------------------------------
# Weighted median (quantity-weighted price) — binned two-phase, exact
# ---------------------------------------------------------------------------

def q_weighted_median_price(sf_dir: str):
    """Quantity-weighted median of lineitem price (integer cents): the
    smallest cents value whose cumulative weight reaches half the total
    (2·cw ≥ tot — the ceil-free form). Same two-phase shape as the exact
    quantiles: per-batch (cents → Σweight) partials, ONE keyed aggregate
    over the bounded cents domain, then an O(bins) driver cumsum picks the
    answer. Exact at any scale whose value domain is bounded; weights ride
    the same histogram the unweighted quantile uses for counts."""
    ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"])

    def binw(t: pa.Table) -> pa.Table:
        cents = _cents(t["l_extendedprice"].to_numpy())
        w = t["l_quantity"].to_numpy().astype("int64")
        g = pd.DataFrame({"bin": cents, "w": w}).groupby(
            "bin", as_index=False).sum()
        return _pa_from_pandas(g.astype({"w": "int64"}))

    hist = (B.grouped_aggregate_auto(
        ds.map_batches(binw, batch_format="pyarrow"),
        "bin", [Sum("w", alias_name="w")]).to_pandas().sort_values("bin"))
    tot = int(hist["w"].sum())
    cum = hist["w"].cumsum().to_numpy()
    vals = hist["bin"].to_numpy()
    ans = int(vals[np.searchsorted(2 * cum, tot, side="left")])
    return pd.DataFrame({"wmedian_cents": pd.Series([ans], dtype="int64")})


# ---------------------------------------------------------------------------
# Grouped least-squares slope — exact integer numerator/denominator
# ---------------------------------------------------------------------------

def q_brand_price_qty_slope(sf_dir: str):
    """Per-brand OLS slope of price (cents) on quantity, in parts-per-
    million: slope_ppm = (n·Σxy − Σx·Σy)·10⁶ // (n·Σx² − (Σx)²). The five
    sufficient statistics (n, Σx, Σy, Σxy, Σx²) are exact int64 partial
    sums — the classic one-pass distributed regression — and the final
    25-row division runs in arbitrary-precision Python ints so the ·10⁶
    numerator can't wrap (the SQL side computes the same in HUGEINT).
    Groups with zero x-variance emit no row (slope undefined)."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity",
                                    "l_extendedprice"])
    part_t = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    ds = B.attach(li, "l_partkey", part_t, "p_partkey", "p_brand", "brand")

    def partial(df: pd.DataFrame) -> pa.Table:
        x = df["l_quantity"].to_numpy().astype("int64")
        y = _cents(df["l_extendedprice"])
        g = pd.DataFrame({"brand": df["brand"], "n": np.int64(1),
                          "sx": x, "sy": y, "sxy": x * y, "sxx": x * x})
        out = g.groupby("brand", as_index=False).sum()
        return _pa_from_pandas(out.astype(
            {c: "int64" for c in ("n", "sx", "sy", "sxy", "sxx")}))

    agg = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pandas"), "brand",
        [Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
         Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
         Sum("sxx", alias_name="sxx")]).to_pandas()

    rows = []
    for _, r in agg.iterrows():
        n, sx, sy, sxy, sxx = (int(r["n"]), int(r["sx"]), int(r["sy"]),
                               int(r["sxy"]), int(r["sxx"]))
        den = n * sxx - sx * sx
        if den == 0:
            continue
        num = (n * sxy - sx * sy) * 1_000_000
        # DuckDB's // truncates toward zero; Python's floors — align on
        # truncation (den = n·Var(x)·n > 0 always)
        mag = abs(num) // den
        rows.append((r["brand"], -mag if num < 0 else mag))
    rows.sort()
    return pd.DataFrame({"p_brand": [b for b, _ in rows],
                         "slope_ppm": pd.Series([s for _, s in rows],
                                                dtype="int64")})


# ---------------------------------------------------------------------------
# Referential-integrity / data-quality audit
# ---------------------------------------------------------------------------

def q_quality_audit(sf_dir: str):
    """The dbt-style audit table every ingest pipeline runs before
    training: one row per check with its violation count. Checks: orphan
    lineitems (orderkey absent from orders), orphan orders (custkey absent
    from customer), non-positive lineitem prices, lineitem discount outside
    [0,1], empty documents. Each check is an independent streaming
    aggregate; the two referential checks broadcast the key side as a
    sorted array and probe with searchsorted (orders/customer keys — at
    cluster scale the orphan check becomes the bucketed anti-join
    `resume anti-join` already implements; this operator keeps the
    broadcast shape to stay one-pass)."""
    import ray

    okeys = np.sort(_read(sf_dir, "orders", ["o_orderkey"])
                    .to_pandas()["o_orderkey"].to_numpy().astype("int64"))
    ckeys = np.sort(_read(sf_dir, "customer", ["c_custkey"])
                    .to_pandas()["c_custkey"].to_numpy().astype("int64"))
    oref, cref = ray.put(okeys), ray.put(ckeys)

    def _absent(keys: np.ndarray, sorted_ref: np.ndarray) -> int:
        if len(sorted_ref) == 0:
            return len(keys)
        pos = np.clip(np.searchsorted(sorted_ref, keys), 0,
                      len(sorted_ref) - 1)
        return int((sorted_ref[pos] != keys).sum())

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        ok = ray.get(oref)
        lk = df["l_orderkey"].to_numpy().astype("int64")
        price = df["l_extendedprice"].to_numpy()
        disc = df["l_discount"].to_numpy()
        return pd.DataFrame({
            "check": ["orphan_lineitems", "nonpositive_price",
                      "discount_out_of_range"],
            "n_bad": pd.Series([_absent(lk, ok), int((price <= 0).sum()),
                                int(((disc < 0) | (disc > 1)).sum())],
                               dtype="int64")})

    def ord_partial(df: pd.DataFrame) -> pd.DataFrame:
        ck = ray.get(cref)
        return pd.DataFrame({
            "check": ["orphan_orders"],
            "n_bad": pd.Series([_absent(
                df["o_custkey"].to_numpy().astype("int64"), ck)],
                dtype="int64")})

    def doc_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "check": ["empty_documents"],
            "n_bad": pd.Series([int((df["text"].str.len() == 0).sum())],
                               dtype="int64")})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        li_partial, batch_format="pandas")
    orders = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        ord_partial, batch_format="pandas")
    docs = _read(sf_dir, "documents", ["text"]).map_batches(
        doc_partial, batch_format="pandas")

    out = B.grouped_aggregate_small(
        li.union(orders).union(docs), "check",
        [Sum("n_bad", alias_name="n_bad")], key_domain=5)
    return out.map_batches(lambda df: df.astype({"n_bad": "int64"}),
                           batch_format="pandas")


# ---------------------------------------------------------------------------
# Token entropy per source — Shannon entropy with exact integer micro-nats
# ---------------------------------------------------------------------------

def q_token_entropy_by_source(sf_dir: str):
    """Shannon entropy of each source's token distribution, in integer
    micro-nats: H = ln(N) − (Σ c·ln c)/N over per-(source,word) counts c.
    The inner sum is made order-independent by quantizing EACH TERM to an
    int64 (FLOOR(c·ln(c)·10⁶ + 0.5)) before summing — both sides perform
    the identical float64 op sequence on identical integers, so the hash
    matches bit-for-bit (the same trick the norm/watermark operators use;
    ln comes from libm via ``math.log``, matching DuckDB's std::log, where
    numpy's SIMD log can drift an ulp). Distribution plan: per-batch word
    explode → keyed count reduce → one source-keyed reduce emitting
    (N, Σterm) — vocabulary never leaves the reducers."""
    ds = _read(sf_dir, "documents", ["source", "text"])

    def explode(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        words = df["text"].str.split(" ")
        lens = words.str.len().to_numpy()
        g = pd.DataFrame({
            "source": np.repeat(df["source"].to_numpy(), lens),
            "word": np.concatenate(words.to_numpy()),
        }).groupby(["source", "word"], as_index=False).size()
        return _pa_from_pandas(g.rename(columns={"size": "c"})
                               .astype({"c": "int64"}))

    counts = B.grouped_aggregate_auto(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["source", "word"], [Sum("c", alias_name="c")])

    def source_bucket(b: pd.DataFrame) -> pd.DataFrame:
        import math as _m

        out = []
        for src, g in b.groupby("source", sort=False):
            c = g["c"].to_numpy().astype("int64")
            uniq, inv = np.unique(c, return_inverse=True)
            lnu = np.array([_m.log(int(v)) for v in uniq], dtype="float64")
            term = np.floor((c.astype("float64") * lnu[inv]) * 1_000_000.0
                            + 0.5).astype("int64")
            out.append((src, int(c.sum()), int(term.sum())))
        return pd.DataFrame({"source": [o[0] for o in out],
                             "n_tokens": pd.Series([o[1] for o in out],
                                                   dtype="int64"),
                             "s_int": pd.Series([o[2] for o in out],
                                                dtype="int64")})

    part = B.bucketed_map_groups(counts, ["source"], source_bucket,
                                 auto_parallelism=True)
    agg = B.grouped_aggregate_small(
        part, "source",
        [Sum("n_tokens", alias_name="n_tokens"),
         Sum("s_int", alias_name="s_int")], key_domain=8).to_pandas()

    import math as _m
    ent = [int(_m.floor(_m.log(int(n)) * 1_000_000.0 - s / n + 0.5))
           for n, s in zip(agg["n_tokens"], agg["s_int"])]
    out = pd.DataFrame({"source": agg["source"],
                        "n_tokens": agg["n_tokens"].astype("int64"),
                        "entropy_micronats": pd.Series(ent, dtype="int64")})
    return out.sort_values("source").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Zero-filled dimension grid (cross join + left join + COALESCE)
# ---------------------------------------------------------------------------

def q_priority_region_grid(sf_dir: str):
    """Order counts on the full region × order-priority grid, zero-filled:
    every (region, priority) cell appears even when no order hits it — the
    dimensional-completeness contract reports need (the relational shape is
    CROSS JOIN + LEFT JOIN + COALESCE). The fact side streams once through
    a broadcast custkey→region map into keyed partials; the grid fill runs
    on the O(regions × priorities) result."""
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    n2r = dict(zip(nat["n_nationkey"], nat["n_regionkey"]))
    c2r = {c: n2r[n] for c, n in zip(cust["c_custkey"], cust["c_nationkey"])}
    cref = ray.put(c2r)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(cref)
        g = pd.DataFrame({
            "rk": df["o_custkey"].map(m).astype("int64"),
            "o_orderpriority": df["o_orderpriority"]}).groupby(
            ["rk", "o_orderpriority"], as_index=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": "int64"})

    counts = B.grouped_aggregate_small(
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .map_batches(partial, batch_format="pandas"),
        ["rk", "o_orderpriority"], [Sum("n", alias_name="n")],
        key_domain=25).to_pandas()

    prios = sorted(counts["o_orderpriority"].unique())
    grid = reg.merge(pd.DataFrame({"o_orderpriority": prios}), how="cross")
    out = grid.merge(counts, left_on=["r_regionkey", "o_orderpriority"],
                     right_on=["rk", "o_orderpriority"], how="left")
    out["n_orders"] = out["n"].fillna(0).astype("int64")
    out = out[["r_name", "o_orderpriority", "n_orders"]]
    return out.sort_values(["r_name", "o_orderpriority"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Forward as-of join with tolerance (first event AT/AFTER each order)
# ---------------------------------------------------------------------------

def q_asof_next_event(sf_dir: str, tolerance_days: int | None = None):
    """For every order, the FIRST same-customer event at or after the
    order date — the forward as-of join (the backward variant is
    q_asof_latest_order; Ray Data has neither as a primitive), with an
    optional tolerance window (``tolerance_days``; the testdata's order
    dates and event times live decades apart, so the conformance check
    runs unbounded — the tolerance path shares every line but the final
    mask). Distributed shape: union-tag → hash-bucket on
    the customer key → ONE vectorized lexsort-merge per bucket (orders
    sort before events at equal (key, ts), events tie-break by event_id;
    a reverse running-min finds each order's next event position) — no
    per-order Python loop, no per-pair expansion; a hot customer costs
    O((E+O) log(E+O))."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"]).map_batches(
        lambda df: pd.DataFrame({
            "key": df["user_id"].astype("int64"),
            "t": df["ts"].values.astype("datetime64[us]").astype("int64"),
            "eid": df["event_id"].astype("int64"),
            "o_orderkey": np.int64(-1), "side": np.int8(0)}),
        batch_format="pandas")
    od = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda df: pd.DataFrame({
            "key": df["o_custkey"].astype("int64"),
            "t": (df["o_orderdate"].values.astype("datetime64[us]")
                  .astype("int64")),
            "eid": np.int64(-1),
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "side": np.int8(1)}),
        batch_format="pandas")
    tol_us = (np.int64(tolerance_days) * 86_400_000_000
              if tolerance_days is not None else None)

    def asof_bucket(b: pd.DataFrame) -> pd.DataFrame:
        key = b["key"].to_numpy()
        t = b["t"].to_numpy()
        eid = b["eid"].to_numpy()
        tag = b["side"].to_numpy()  # 0 = event, 1 = order
        okey = b["o_orderkey"].to_numpy()
        # orders before events at equal (key, t) → ts >= odate is inclusive;
        # events tie-break by event_id (lexsort: last key is primary)
        order = np.lexsort((eid, tag ^ 1, t, key))
        key, t, eid, tag, okey = (key[order], t[order], eid[order],
                                  tag[order], okey[order])
        n = len(b)
        idx = np.arange(n)
        evt_pos = np.where(tag == 0, idx, n)
        nxt = np.minimum.accumulate(evt_pos[::-1])[::-1]
        op = idx[tag == 1]
        q = nxt[op]
        ok = q < n
        ok[ok] &= key[q[ok]] == key[op[ok]]
        if tol_us is not None:
            ok[ok] &= t[q[ok]] < t[op[ok]] + tol_us
        return pd.DataFrame({
            "o_orderkey": okey[op[ok]].astype("int64"),
            "event_id": eid[q[ok]].astype("int64")})

    return B.bucketed_map_groups(ev.union(od), ["key"], asof_bucket,
                                 auto_parallelism=True)


# ---------------------------------------------------------------------------
# Gini coefficient of the per-customer order-count distribution
# ---------------------------------------------------------------------------

def q_order_count_gini(sf_dir: str):
    """Inequality profile of crawl/order activity: the Gini coefficient of
    per-customer order counts, in exact integer ppm —
    G = (2·Σᵢ i·xᵢ − (n+1)·Σx) · 10⁶ // (n·Σx) with x ascending, i 1-based
    (tie order is immaterial: equal x over a run of consecutive i's gives
    the same Σ i·xᵢ). Distribution plan: one keyed count aggregate →
    an O(distinct-count) histogram → the driver evaluates the formula over
    histogram RUNS with arbitrary-precision ints (Σ i·xᵢ for a run of m
    customers at count v starting at rank s is v·(m·s + m(m−1)/2) — no
    per-customer expansion anywhere)."""
    counts = B.grouped_aggregate_auto(
        _read(sf_dir, "orders", ["o_custkey"]).map_batches(
            lambda df: pd.DataFrame({"o_custkey":
                                     df["o_custkey"].astype("int64"),
                                     "n": np.int64(1)}),
            batch_format="pandas").map_batches(
            lambda df: df.groupby("o_custkey", as_index=False).sum(),
            batch_format="pandas"),
        "o_custkey", [Sum("n", alias_name="n")])

    hist = B.grouped_aggregate_auto(
        counts.map_batches(
            lambda df: (df.groupby("n", as_index=False).size()
                        .rename(columns={"n": "x", "size": "m"})
                        .astype({"m": "int64"})),
            batch_format="pandas"),
        "x", [Sum("m", alias_name="m")]).to_pandas().sort_values("x")

    n_tot = int(hist["m"].sum())
    sx = int((hist["x"] * hist["m"]).sum())
    s_ix = 0
    rank = 1  # 1-based rank of the first customer in the current run
    for x, m in zip(hist["x"], hist["m"]):
        x, m = int(x), int(m)
        s_ix += x * (m * rank + m * (m - 1) // 2)
        rank += m
    gini_ppm = (2 * s_ix - (n_tot + 1) * sx) * 1_000_000 // (n_tot * sx)
    return pd.DataFrame({"gini_ppm": pd.Series([gini_ppm], dtype="int64"),
                         "n_customers": pd.Series([n_tot], dtype="int64")})


# ---------------------------------------------------------------------------
# Min-max feature scaling (per-group normalization to ppm)
# ---------------------------------------------------------------------------

def q_minmax_scaled_values(sf_dir: str):
    """Per-event-type min-max normalization — the feature-scaling pass
    every ML dataset build runs: each event value (integer cents) is
    scaled to (cents − min)·10⁶ // (max − min) within its type, reported
    as the per-type (n, sum of scaled ppm) so the result stays
    O(types). Two passes over the stream, both streaming: a per-type
    extrema aggregate (broadcast back as O(types) arrays), then one
    stateless scaling map + partial sums. All integer arithmetic — exact
    at any scale. Degenerate types (min == max) scale to 0 by
    convention."""
    import ray

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def cents_partial(t: pa.Table) -> pa.Table:
        c = np.floor(t["value"].to_numpy() * 100 + 0.5).astype("int64")
        g = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                          "mn": c, "mx": c}).groupby(
            "event_type", as_index=False).agg(mn=("mn", "min"),
                                              mx=("mx", "max"))
        return _pa_from_pandas(g)

    ext = B.grouped_aggregate_small(
        ds.map_batches(cents_partial, batch_format="pyarrow"),
        "event_type", [Min("mn", alias_name="mn"),
                       Max("mx", alias_name="mx")], key_domain=8).to_pandas()
    side = ray.put({r["event_type"]: (int(r["mn"]), int(r["mx"]))
                    for _, r in ext.iterrows()})

    def scale(t: pa.Table) -> pa.Table:
        m = ray.get(side)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas()})
        c = np.floor(t["value"].to_numpy() * 100 + 0.5).astype("int64")
        mn = df["event_type"].map({k: v[0] for k, v in m.items()}).to_numpy()
        mx = df["event_type"].map({k: v[1] for k, v in m.items()}).to_numpy()
        rng = mx - mn
        scaled = np.where(rng > 0, (c - mn) * 1_000_000 // np.maximum(rng, 1),
                          np.int64(0))
        g = pd.DataFrame({"event_type": df["event_type"], "n": np.int64(1),
                          "sum_scaled_ppm": scaled}).groupby(
            "event_type", as_index=False).sum()
        return _pa_from_pandas(g.astype({"n": "int64",
                                         "sum_scaled_ppm": "int64"}))

    out = B.grouped_aggregate_small(
        ds.map_batches(scale, batch_format="pyarrow"),
        "event_type", [Sum("n", alias_name="n"),
                       Sum("sum_scaled_ppm", alias_name="sum_scaled_ppm")],
        key_domain=8)
    return out.map_batches(
        lambda df: df.astype({"n": "int64", "sum_scaled_ppm": "int64"}),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# Language-ID confusion matrix (predicted vs stored label)
# ---------------------------------------------------------------------------

def q_langid_confusion(sf_dir: str):
    """Confusion matrix of the n-gram language-ID heuristic against the
    corpus's stored ``lang`` labels: (lang, pred_lang) → count — the
    eval table any classifier-driven curation gate reports before its
    threshold is trusted. One stateless map (the shared vectorized
    lang_id kernel) + one tiny keyed aggregate; O(langs²) output."""
    from ..functions import text as T

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(df: pd.DataFrame) -> pa.Table:
        g = pd.DataFrame({"lang": df["lang"],
                          "pred_lang": T.lang_id(df["text"]),
                          "n": np.int64(1)}).groupby(
            ["lang", "pred_lang"], as_index=False).sum()
        return _pa_from_pandas(g.astype({"n": "int64"}))

    out = B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang", "pred_lang"], [Sum("n", alias_name="n")], key_domain=16)
    return out.map_batches(lambda df: df.astype({"n": "int64"}),
                           batch_format="pandas")


# ---------------------------------------------------------------------------
# Pareto concentration (how many customers cover 80% of revenue)
# ---------------------------------------------------------------------------

def q_pareto_customers(sf_dir: str):
    """The 80/20 concentration metric: the smallest number of customers
    (taken in revenue-descending order, custkey tiebreak) whose cumulative
    revenue reaches 80% of the total — 5·cum ≥ 4·total in exact integers.
    One keyed revenue aggregate; the ordered scan runs on the O(customers)
    reduced frame (inside the engine's documented broadcast envelope; past
    it, the same binned-offset prefix trick the weighted median uses
    applies to revenue-bucket histograms)."""
    counts = B.grouped_aggregate_auto(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            lambda df: pd.DataFrame({
                "o_custkey": df["o_custkey"].astype("int64"),
                "rev": _cents(df["o_totalprice"])}).groupby(
                "o_custkey", as_index=False).sum(),
            batch_format="pandas"),
        "o_custkey", [Sum("rev", alias_name="rev")]).to_pandas()
    counts = counts.sort_values(["rev", "o_custkey"],
                                ascending=[False, True]).reset_index(drop=True)
    total = int(counts["rev"].sum())
    cum = counts["rev"].cumsum().to_numpy()
    k = int(np.searchsorted(5 * cum, 4 * total, side="left")) + 1
    return pd.DataFrame({
        "n_customers_80pct": pd.Series([k], dtype="int64"),
        "n_customers_total": pd.Series([len(counts)], dtype="int64"),
        "total_cents": pd.Series([total], dtype="int64")})


# ---------------------------------------------------------------------------
# Inter-arrival burstiness (CV² of the event stream's gaps, exact ppm)
# ---------------------------------------------------------------------------

def q_interarrival_burstiness(sf_dir: str):
    """Squared coefficient of variation of the global event stream's
    inter-arrival gaps (whole seconds, arrival order = event_id):
    cv²_ppm = (n·Σd² − (Σd)²)·10⁶ // (Σd)² — 10⁶ = Poisson, above = bursty.
    Consecutive diffs are computed WITHOUT a global sort: per-bin internal
    diffs (event_id // 8192 bins, vectorized) plus O(bins) driver-side
    boundary gaps from each bin's (first, last) timestamps — the same
    binned-offset machinery as the watermark/systematic operators. The
    final arithmetic runs in arbitrary-precision Python ints (the ·10⁶
    product exceeds int64 by design)."""
    BIN = 8192
    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _pa_from_pandas(pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "tsu": df["ts"].values.astype("datetime64[us]").astype("int64"),
            "bin": df["event_id"].to_numpy().astype("int64") // BIN}))

    def bin_bucket(b: pd.DataFrame) -> pd.DataFrame:
        # all rows of a bin co-locate here (bucketed reduce), so internal
        # gaps are exact even when upstream batches split a bin; gaps may
        # be NEGATIVE (late events) — numpy // is true floor division
        out = []
        b = b.sort_values(["bin", "event_id"], kind="stable")
        for bb, g in b.groupby("bin", sort=False):
            ts_b = g["tsu"].to_numpy()
            d = np.diff(ts_b) // 1_000_000
            out.append((int(bb), len(d), int(d.sum()), int((d * d).sum()),
                        int(ts_b[0]), int(ts_b[-1])))
        return pd.DataFrame(out, columns=["bin", "n_d", "sd", "sd2",
                                          "first_ts", "last_ts"]
                            ).astype("int64")

    agg = (B.bucketed_map_groups(
        ds.map_batches(prep, batch_format="pyarrow"), ["bin"], bin_bucket,
        auto_parallelism=True).to_pandas()
        .sort_values("bin").reset_index(drop=True))
    n = int(agg["n_d"].sum())
    sd = int(agg["sd"].sum())
    sd2 = int(agg["sd2"].sum())
    # boundary gaps between consecutive bins (driver, O(bins))
    lt = agg["last_ts"].to_numpy()
    ft = agg["first_ts"].to_numpy()
    for i in range(1, len(agg)):
        d = int((ft[i] - lt[i - 1]) // 1_000_000)
        n += 1
        sd += d
        sd2 += d * d
    cv2_ppm = (n * sd2 - sd * sd) * 1_000_000 // (sd * sd)
    return pd.DataFrame({"n_gaps": pd.Series([n], dtype="int64"),
                         "sum_gap_s": pd.Series([sd], dtype="int64"),
                         "cv2_ppm": pd.Series([cv2_ppm], dtype="int64")})


# ---------------------------------------------------------------------------
# Z-score anomaly counts (|z| > 2 without ever computing a square root)
# ---------------------------------------------------------------------------

def q_value_outliers_by_type(sf_dir: str):
    """Per event type: how many values sit more than 2 standard deviations
    from the type mean — the σ-threshold anomaly gate, computed WITHOUT
    sqrt or division: |x−μ| > kσ ⟺ (x·n − s)² > k²·n·(n·s2 − s²). The
    moment partials (n, Σx, Σx²) are exact int64; the per-row comparison
    squares (x·n − s) — int64-exact, then widened — against a per-type
    float64 right side computed with the IDENTICAL operation sequence on
    both engine and oracle, so the boundary decisions agree bit-for-bit.
    Two streaming passes: a 5-row moment aggregate broadcast back, then a
    stateless flag-and-count map."""
    import ray

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def mom(t: pa.Table) -> pa.Table:
        c = np.floor(t["value"].to_numpy() * 100 + 0.5).astype("int64")
        g = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                          "n": np.int64(1), "s": c, "s2": c * c}).groupby(
            "event_type", as_index=False).sum()
        return _pa_from_pandas(g.astype({"n": "int64", "s": "int64",
                                         "s2": "int64"}))

    agg = B.grouped_aggregate_small(
        ds.map_batches(mom, batch_format="pyarrow"),
        "event_type", [Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                       Sum("s2", alias_name="s2")], key_domain=8).to_pandas()
    rhs = {}
    for _, r in agg.iterrows():
        nf, sf_, s2f = float(r["n"]), float(r["s"]), float(r["s2"])
        # op order mirrors the SQL text exactly: (4.0·n)·(n·s2 − s·s)
        rhs[r["event_type"]] = (4.0 * nf) * (nf * s2f - sf_ * sf_)
    stats = ray.put((rhs, {r["event_type"]: (int(r["n"]), int(r["s"]))
                           for _, r in agg.iterrows()}))

    def flag(t: pa.Table) -> pa.Table:
        rh, ns = ray.get(stats)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas()})
        c = np.floor(t["value"].to_numpy() * 100 + 0.5).astype("int64")
        n_arr = df["event_type"].map({k: v[0] for k, v in ns.items()}).to_numpy()
        s_arr = df["event_type"].map({k: v[1] for k, v in ns.items()}).to_numpy()
        d = (c * n_arr - s_arr).astype("float64")
        lhs = d * d
        rh_arr = df["event_type"].map(rh).to_numpy(dtype="float64")
        g = pd.DataFrame({"event_type": df["event_type"],
                          "n_outliers": (lhs > rh_arr).astype("int64"),
                          "n_total": np.int64(1)}).groupby(
            "event_type", as_index=False).sum()
        return _pa_from_pandas(g.astype({"n_outliers": "int64",
                                         "n_total": "int64"}))

    out = B.grouped_aggregate_small(
        ds.map_batches(flag, batch_format="pyarrow"),
        "event_type", [Sum("n_outliers", alias_name="n_outliers"),
                       Sum("n_total", alias_name="n_total")], key_domain=8)
    return out.map_batches(
        lambda df: df.astype({"n_outliers": "int64", "n_total": "int64"}),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# Benford first-digit audit over order totals
# ---------------------------------------------------------------------------

def q_benford_first_digit(sf_dir: str):
    """First-significant-digit distribution of order totals (integer
    cents) — the Benford's-law audit every financial-data QA pass runs.
    Stateless per-batch digit extraction + one 9-row aggregate."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["o_totalprice"].to_numpy())
        digit = pd.Series(c).astype(str).str[0].astype("int64")
        g = (pd.DataFrame({"digit": digit, "n": np.int64(1)})
             .groupby("digit", as_index=False).sum())
        return _pa_from_pandas(g.astype({"n": "int64"}))

    out = B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pyarrow"),
        "digit", [Sum("n", alias_name="n")], key_domain=9)
    return out.map_batches(lambda df: df.astype({"n": "int64"}),
                           batch_format="pandas")


# ---------------------------------------------------------------------------
# Weekday × hour activity heatmap (2-D time histogram)
# ---------------------------------------------------------------------------

def q_weekday_hour_heatmap(sf_dir: str):
    """Event count and exact value sum (cents) on the weekday × hour grid
    — the 2-D time histogram behind every activity heatmap. ISO weekday
    (Mon=1..Sun=7) to match SQL's isodow; one per-batch partial groupby
    into ≤168 cells, one tiny keyed aggregate."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        dt = pd.to_datetime(df["ts"])
        g = pd.DataFrame({
            "weekday": (dt.dt.dayofweek + 1).astype("int64"),  # ISO Mon=1
            "hour": dt.dt.hour.astype("int64"),
            "n": np.int64(1),
            "value_cents": np.floor(df["value"].to_numpy() * 100
                                    + 0.5).astype("int64"),
        }).groupby(["weekday", "hour"], as_index=False).sum()
        return _pa_from_pandas(g.astype({"n": "int64",
                                         "value_cents": "int64"}))

    out = B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["weekday", "hour"],
        [Sum("n", alias_name="n"),
         Sum("value_cents", alias_name="value_cents")], key_domain=168)
    return out.map_batches(
        lambda df: df.astype({"n": "int64", "value_cents": "int64"}),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# Deterministic train/val/test split (hash-bucketed ratios)
# ---------------------------------------------------------------------------

def q_train_val_test_split(sf_dir: str):
    """Deterministic 80/10/10 train/val/test assignment by Knuth hash on
    doc_id, reported as per-(source, split) document and token counts —
    the one dataset-prep operator every training run starts with.
    Purely per-batch (no shuffle, no state, same assignment at any
    cluster size); hash arithmetic is the engine's uint64 idiom so it
    never wraps. Counts reduce under one tiny keyed aggregate."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ids = df["doc_id"].to_numpy()
        h = ((ids.astype(np.uint64) * np.uint64(2654435761))
             & np.uint64(0xFFFFFFFF)) % np.uint64(100)
        split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
        ntok = df["text"].str.split(" ").str.len().astype("int64")
        g = pd.DataFrame({"source": df["source"], "split": split,
                          "n_docs": np.int64(1), "n_tokens": ntok}).groupby(
            ["source", "split"], as_index=False).sum()
        return _pa_from_pandas(g.astype({"n_docs": "int64",
                                         "n_tokens": "int64"}))

    out = B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "split"],
        [Sum("n_docs", alias_name="n_docs"),
         Sum("n_tokens", alias_name="n_tokens")], key_domain=16)
    return out.map_batches(
        lambda df: df.astype({"n_docs": "int64", "n_tokens": "int64"}),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# Seasonality index (calendar-month revenue vs uniform expectation)
# ---------------------------------------------------------------------------

def q_order_seasonality(sf_dir: str):
    """Calendar-month seasonality of order revenue: each month-of-year's
    share of total revenue scaled against the uniform 1/12 expectation,
    in integer basis points — idx_bps = month_cents·12·10⁴ // total_cents
    (10000 = exactly average). One keyed partial aggregate to 12 rows;
    the index arithmetic is O(12) and exact."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pa.Table:
        m = pd.to_datetime(df["o_orderdate"]).dt.month.astype("int64")
        g = pd.DataFrame({"month": m, "cents": _cents(df["o_totalprice"])}
                         ).groupby("month", as_index=False).sum()
        return _pa_from_pandas(g.astype({"cents": "int64"}))

    agg = B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pandas"),
        "month", [Sum("cents", alias_name="cents")],
        key_domain=12).to_pandas().sort_values("month")
    total = int(agg["cents"].sum())
    idx = [int(c) * 12 * 10_000 // total for c in agg["cents"]]
    return pd.DataFrame({"month": agg["month"].astype("int64").to_numpy(),
                         "month_cents": agg["cents"].astype("int64").to_numpy(),
                         "idx_bps": pd.Series(idx, dtype="int64")
                         }).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Period-over-period rank movement (brand revenue rank shift)
# ---------------------------------------------------------------------------

def q_brand_rank_shift(sf_dir: str):
    """Brand revenue ranks in the latest order-year vs the year before,
    with the movement (prev_rank − last_rank; positive = climbed) — the
    period-over-period leaderboard every BI layer ships. ONE distributed
    (brand, year) keyed aggregate (lineitem joined to part via the
    adaptive attach, revenue in exact cents); the O(brands) two-period
    rank/join runs on the reduced frame. Brands absent from a period are
    dropped (inner join of the two leaderboards). Rank = dense ORDER BY
    revenue DESC, brand ASC — deterministic under ties."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_shipdate",
                                    "l_extendedprice"])
    part_t = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    ds = B.attach(li, "l_partkey", part_t, "p_partkey", "p_brand", "brand")

    def partial(df: pd.DataFrame) -> pa.Table:
        yr = pd.to_datetime(df["l_shipdate"]).dt.year.astype("int64")
        g = pd.DataFrame({"brand": df["brand"], "yr": yr,
                          "rev": _cents(df["l_extendedprice"])}).groupby(
            ["brand", "yr"], as_index=False).sum()
        return _pa_from_pandas(g.astype({"rev": "int64"}))

    agg = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pandas"),
        ["brand", "yr"], [Sum("rev", alias_name="rev")]).to_pandas()

    last = int(agg["yr"].max())
    prev = last - 1

    def ranked(year: int, col: str) -> pd.DataFrame:
        sub = (agg[agg["yr"] == year]
               .sort_values(["rev", "brand"], ascending=[False, True])
               .reset_index(drop=True))
        sub[col] = np.arange(1, len(sub) + 1, dtype="int64")
        return sub[["brand", col]]

    out = ranked(prev, "rank_prev").merge(ranked(last, "rank_last"),
                                          on="brand")
    out["shift"] = (out["rank_prev"] - out["rank_last"]).astype("int64")
    return (out.rename(columns={"brand": "p_brand"})
            .sort_values("p_brand").reset_index(drop=True))


# ---------------------------------------------------------------------------
# Market-basket lift over the co-purchase pair base
# ---------------------------------------------------------------------------

def q_copurchase_lift(sf_dir: str, min_orders: int = 3, k: int = 20):
    """Top-k co-purchased part pairs by LIFT — P(ab)/(P(a)·P(b)) in exact
    integer ppm: lift_ppm = n_ab·N·10⁶ // (n_a·n_b) over distinct-order
    frequencies (N = distinct orders). The association-rule score on top
    of the shared pair base: per-part frequencies broadcast as sorted
    arrays, lift computed vectorized per pair batch, and the top-k folds
    as per-batch partials (keep k) before one driver-side head — the
    full scored pair list never lands anywhere. Ties break on
    (part_a, part_b) for determinism."""
    import ray

    from .queries import _grouped_order_part, _pair_counts_from_grouped

    # ONE order-keyed exchange feeds everything: pair counts, per-part
    # frequencies AND the distinct-order count all derive from the shared
    # grouped-distinct base (the former plan ran a second full lineitem
    # exchange just for the frequency side)
    grouped, nrows_li = _grouped_order_part(sf_dir)
    distinct = grouped.materialize()  # consumed by three derivations

    def part_freq_partial(t: pa.Table) -> pa.Table:
        pk, n = np.unique(t.column("l_partkey").to_numpy(),
                          return_counts=True)
        return pa.table({"l_partkey": pa.array(pk.astype(np.int64)),
                         "n_p": pa.array(n.astype(np.int64))})

    def order_count_partial(t: pa.Table) -> pa.Table:
        # blocks hold whole orders (one block per order-bucket partition),
        # so per-block distinct orderkey counts are disjoint — the global
        # distinct-order count is their plain sum, NO keyed exchange
        c = int(len(np.unique(t.column("l_orderkey").to_numpy())))
        return pa.table({"c": pa.array([c], pa.int64())})

    pf = B.grouped_aggregate_auto(
        distinct.map_batches(part_freq_partial, batch_format="pyarrow"),
        "l_partkey", [Sum("n_p", alias_name="n_p")],
        nrows_hint=nrows_li, rows_per_block=65536).to_pandas()
    n_orders = int(distinct.map_batches(
        order_count_partial, batch_size=None,
        batch_format="pyarrow").sum("c"))

    keys = pf["l_partkey"].to_numpy().astype("int64")
    order = np.argsort(keys, kind="stable")
    side = ray.put((keys[order],
                    pf["n_p"].to_numpy().astype("int64")[order]))

    def lift_partial(df: pd.DataFrame) -> pd.DataFrame:
        ks, ns = ray.get(side)
        df = df[df["n_orders"] >= min_orders]
        if len(df) == 0:
            return pd.DataFrame({
                "part_a": pd.Series([], dtype="int64"),
                "part_b": pd.Series([], dtype="int64"),
                "n_ab": pd.Series([], dtype="int64"),
                "lift_ppm": pd.Series([], dtype="int64")})
        na = ns[np.searchsorted(ks, df["part_a"].to_numpy())]
        nb = ns[np.searchsorted(ks, df["part_b"].to_numpy())]
        nab = df["n_orders"].to_numpy().astype("int64")
        lift = nab * np.int64(n_orders) * np.int64(1_000_000) // (na * nb)
        out = pd.DataFrame({"part_a": df["part_a"].astype("int64"),
                            "part_b": df["part_b"].astype("int64"),
                            "n_ab": nab, "lift_ppm": lift})
        return out.sort_values(["lift_ppm", "part_a", "part_b"],
                               ascending=[False, True, True]).head(k)

    part = _pair_counts_from_grouped(distinct, nrows_li).map_batches(
        lift_partial, batch_format="pandas").to_pandas()
    return (part.sort_values(["lift_ppm", "part_a", "part_b"],
                             ascending=[False, True, True]).head(k)
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# RANGE-frame window: per-customer trailing 7-day spend
# ---------------------------------------------------------------------------

def q_trailing_7d_spend(sf_dir: str):
    """Per order: the customer's total spend (integer cents) over the
    trailing 7-day VALUE window [o_orderdate − 6 days, o_orderdate] — the
    RANGE window frame (peers included by value, not by row position),
    the one frame type the ROWS-based rolling operators can't express.
    One customer-keyed bucketed reduce; inside each bucket the trailing
    sum is two vectorized searchsorted probes into the per-customer
    date-sorted prefix-sum array (ties share one answer by construction —
    RANGE semantics exactly). O(rows log rows) per bucket, one shuffle."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        day = (df["o_orderdate"].values.astype("datetime64[D]")
               .astype("int64"))
        return _pa_from_pandas(pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "o_custkey": df["o_custkey"].astype("int64"),
            "day": day, "cents": _cents(df["o_totalprice"])}))

    def trail_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["o_custkey", "day", "o_orderkey"], kind="stable")
        ck = b["o_custkey"].to_numpy()
        day = b["day"].to_numpy()
        cents = b["cents"].to_numpy()
        csum = np.concatenate([[np.int64(0)], np.cumsum(cents)])
        # frame = rows of the SAME customer with day in [day-6, day]
        # (RANGE peers: equal days share the frame end = last peer). The
        # (custkey, day) pair packs into one int64 (days ≪ 2³²), so the
        # window bounds are two searchsorted probes and day−6 can never
        # underflow into the previous customer's key block.
        comp = ck.astype("int64") * (1 << 32) + day
        lo = np.searchsorted(comp, comp - 6, side="left")
        hi = np.searchsorted(comp, comp, side="right")
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy(),
            "trailing_cents": (csum[hi] - csum[lo]).astype("int64")})

    return B.bucketed_map_groups(
        ds.map_batches(prep, batch_format="pyarrow"), ["o_custkey"],
        trail_bucket, auto_parallelism=True)


# ---------------------------------------------------------------------------
# Entity resolution end-to-end: fuzzy name pairs → connected components
# ---------------------------------------------------------------------------

def q_name_dup_clusters(sf_dir: str):
    """Entity-resolution composition — the full dedup-by-similarity chain:
    blocked fuzzy candidate pairs (q_fuzzy_name_pairs) feed the
    Dataset-native connected components, labeling every part with the
    minimum partkey reachable through ≤2-edit name edges. The canonical
    record-linkage pipeline (candidate generation → clustering →
    canonical id), with the edge list flowing as a Dataset end-to-end.
    Oracle: union-find golden over DuckDB-levenshtein pairs — independent
    candidate generation AND independent clustering algorithm."""
    pairs = q_fuzzy_name_pairs(sf_dir).map_batches(
        lambda df: pd.DataFrame({"a": df["part_a"].astype("int64"),
                                 "b": df["part_b"].astype("int64")}),
        batch_format="pandas")
    nodes = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        lambda df: pd.DataFrame({"node": df["p_partkey"].astype("int64")}),
        batch_format="pandas")
    out = connected_components(nodes, pairs)
    return out.map_batches(
        lambda df: df.rename(columns={"node": "p_partkey"}),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# Correlated-subquery decorrelation (orders above their customer's average)
# ---------------------------------------------------------------------------

def q_orders_above_cust_avg(sf_dir: str):
    """Orders priced above their own customer's average — the canonical
    correlated subquery, decorrelated the way every engine must: ONE
    per-customer (Σcents, n) aggregate joined back to the fact stream,
    with the comparison cross-multiplied into exact integers
    (cents·n > Σcents — no float division anywhere, so the oracle hashes
    bit-equal). The aggregate side is O(customers) and rides a broadcast
    here (sorted arrays + searchsorted); past the broadcast envelope the
    join-back is `bucketed_attach` on the same key."""
    import ray

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pa.Table:
        g = pd.DataFrame({"o_custkey": df["o_custkey"].astype("int64"),
                          "s": _cents(df["o_totalprice"]),
                          "n": np.int64(1)}).groupby(
            "o_custkey", as_index=False).sum()
        return _pa_from_pandas(g.astype({"s": "int64", "n": "int64"}))

    agg = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pandas"),
        "o_custkey", [Sum("s", alias_name="s"),
                      Sum("n", alias_name="n")]).to_pandas()
    keys = agg["o_custkey"].to_numpy().astype("int64")
    order = np.argsort(keys, kind="stable")
    side = ray.put((keys[order], agg["s"].to_numpy().astype("int64")[order],
                    agg["n"].to_numpy().astype("int64")[order]))

    def above(df: pd.DataFrame) -> pa.Table:
        ks, ss, ns = ray.get(side)
        ck = df["o_custkey"].to_numpy().astype("int64")
        pos = np.searchsorted(ks, ck)
        cents = _cents(df["o_totalprice"])
        keep = cents * ns[pos] > ss[pos]
        out = pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy()[keep].astype("int64"),
            "o_custkey": ck[keep], "cents": cents[keep]})
        return _pa_from_pandas(out)

    return ds.map_batches(above, batch_format="pandas")


# ---------------------------------------------------------------------------
# Herfindahl–Hirschman supplier concentration per nation (exact ppm)
# ---------------------------------------------------------------------------

def q_supplier_hhi_by_nation(sf_dir: str):
    """Market-concentration audit: per nation, the HHI of its suppliers'
    revenue shares in exact integer ppm — HHI = Σᵢ rᵢ²·10⁶ // (Σr)² over
    per-supplier revenue (exact cents). 10⁶/k = perfectly even k-way split,
    10⁶ = monopoly. Distribution plan: one keyed per-supplier revenue
    reduce (per-batch combiner first), supplier→nation resolved by a
    broadcast probe (supplier × nation is dimension-small by schema), then
    a nation-bucketed kernel evaluating the squares in arbitrary-precision
    Python ints (rᵢ² exceeds int64 by design; HUGEINT on the SQL side)."""
    import ray

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    sn = sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    keys = sn["s_suppkey"].to_numpy().astype("int64")
    order = np.argsort(keys, kind="stable")
    side = ray.put((keys[order], sn["n_name"].to_numpy()[order]))

    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pa.Table:
        g = pd.DataFrame({"l_suppkey": df["l_suppkey"].astype("int64"),
                          "rev": _cents(df["l_extendedprice"])}).groupby(
            "l_suppkey", as_index=False).sum()
        return _pa_from_pandas(g.astype({"rev": "int64"}))

    rev = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pandas"),
        "l_suppkey", [Sum("rev", alias_name="rev")])

    def tag(df: pd.DataFrame) -> pa.Table:
        ks, nm = ray.get(side)
        pos = np.searchsorted(ks, df["l_suppkey"].to_numpy().astype("int64"))
        return _pa_from_pandas(pd.DataFrame(
            {"n_name": nm[pos], "rev": df["rev"].astype("int64")}))

    def hhi_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        for name, g in b.groupby("n_name", sort=False):
            rs = [int(v) for v in g["rev"]]
            s = sum(rs)
            out.append((name, len(rs),
                        sum(r * r for r in rs) * 1_000_000 // (s * s)))
        return pd.DataFrame({
            "n_name": [o[0] for o in out],
            "n_suppliers": pd.Series([o[1] for o in out], dtype="int64"),
            "hhi_ppm": pd.Series([o[2] for o in out], dtype="int64")})

    # auto-sized reduce: the tagged input is O(suppliers) rows over an
    # O(nations) key domain — any fixed partition count would leave empty
    # schema-less sort partitions at small scale
    return B.bucketed_map_groups(rev.map_batches(tag, batch_format="pandas"),
                                 ["n_name"], hhi_bucket,
                                 auto_parallelism=True)


# ---------------------------------------------------------------------------
# Max drop from the running peak of daily revenue (drawdown-style monitor)
# ---------------------------------------------------------------------------

def q_daily_peak_drop(sf_dir: str):
    """Largest decline from the historical peak of DAILY revenue — the
    drawdown-style health metric a crawl/ingest monitor alerts on: with the
    per-day revenue series in date order, max over days of (running peak −
    today). One keyed daily reduce (per-batch combiner first) shrinks the
    stream to O(days); the prefix-max scan runs on that O(days) result
    (same bounded-driver-state contract as the other prefix operators)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pa.Table:
        g = pd.DataFrame({"day": df["o_orderdate"].astype(str),
                          "rev": _cents(df["o_totalprice"])}).groupby(
            "day", as_index=False).sum()
        return _pa_from_pandas(g.astype({"rev": "int64"}))

    daily = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pandas"),
        "day", [Sum("rev", alias_name="rev")]).to_pandas()
    daily = daily.sort_values("day").reset_index(drop=True)
    rev = daily["rev"].to_numpy().astype("int64")
    peak = np.maximum.accumulate(rev)
    return pd.DataFrame({
        "n_days": pd.Series([len(rev)], dtype="int64"),
        "peak_day_cents": pd.Series([int(peak.max())], dtype="int64"),
        "max_peak_drop_cents": pd.Series([int((peak - rev).max())],
                                         dtype="int64")})


# ---------------------------------------------------------------------------
# Theil T inequality index of per-customer spend (exact milli-nats)
# ---------------------------------------------------------------------------

def q_theil_index_spend(sf_dir: str):
    """Theil T index of per-customer total spend, in integer milli-nats:
    T = (Σ xᵢ·ln xᵢ)/S + ln N − ln S with x in exact cents, S = Σx, over
    customers with ≥1 order. Each xᵢ·ln(xᵢ) term is quantized to an int64
    (FLOOR(·10³ + 0.5)) BEFORE summing so the sum is order-independent and
    both sides perform the identical float64 op sequence (ln via libm
    ``math.log`` = DuckDB's std::log — the token-entropy recipe; 10³ keeps
    batch-level term sums inside int64 at any batch size). Distribution
    plan: keyed per-customer spend reduce → stateless per-batch term
    quantization emitting 3-integer partials → O(batches) driver total in
    arbitrary-precision ints."""
    import math as _m

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pa.Table:
        g = pd.DataFrame({"o_custkey": df["o_custkey"].astype("int64"),
                          "x": _cents(df["o_totalprice"])}).groupby(
            "o_custkey", as_index=False).sum()
        return _pa_from_pandas(g.astype({"x": "int64"}))

    spend = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pandas"),
        "o_custkey", [Sum("x", alias_name="x")])

    def term_partial(df: pd.DataFrame) -> pa.Table:
        x = df["x"].to_numpy().astype("int64")
        uniq, inv = np.unique(x, return_inverse=True)
        lnu = np.array([_m.log(int(v)) for v in uniq], dtype="float64")
        term = np.floor((x.astype("float64") * lnu[inv]) * 1000.0
                        + 0.5).astype("int64")
        return _pa_from_pandas(pd.DataFrame({
            "n": pd.Series([len(x)], dtype="int64"),
            "sx": pd.Series([int(x.sum())], dtype="int64"),
            "st": pd.Series([int(term.sum())], dtype="int64")}))

    parts = spend.map_batches(term_partial, batch_format="pandas").to_pandas()
    n = sum(int(v) for v in parts["n"])
    sx = sum(int(v) for v in parts["sx"])
    st = sum(int(v) for v in parts["st"])
    theil = int(_m.floor(st / sx + (_m.log(n) - _m.log(sx)) * 1000.0 + 0.5))
    return pd.DataFrame({
        "n_customers": pd.Series([n], dtype="int64"),
        "total_cents": pd.Series([sx], dtype="int64"),
        "theil_millinats": pd.Series([theil], dtype="int64")})


# ---------------------------------------------------------------------------
# TPC-H Q6 shape — predicate pushdown at the parquet read
# ---------------------------------------------------------------------------

def q_q6_forecast_revenue(sf_dir: str):
    """The canonical pushdown scan (TPC-H Q6): potential revenue from
    lineitems shipped in 1996 with discount in [0.05, 0.07] and quantity
    < 24. The THREE row predicates are a pyarrow dataset expression pushed
    into the fragment scan (``_read(filter_expr=...)``) — row groups whose
    stats exclude the window never leave storage, and the filter columns
    (shipdate, quantity) aren't even in the projection. Revenue term =
    cents(extendedprice) · bps(discount), exact int64 per row; one
    streaming pass, O(1) result."""
    from datetime import datetime

    import pyarrow.compute as pc

    expr = ((pc.field("l_shipdate") >= pa.scalar(datetime(1996, 1, 1)))
            & (pc.field("l_shipdate") < pa.scalar(datetime(1997, 1, 1)))
            & (pc.field("l_discount") >= pa.scalar(0.05))
            & (pc.field("l_discount") <= pa.scalar(0.07))
            & (pc.field("l_quantity") < pa.scalar(24.0)))
    # the filter columns must be in the projection: Ray binds the pushed
    # expression against the projected schema (row groups are still pruned
    # by the predicate before any column leaves storage)
    ds = _read(sf_dir, "lineitem",
               ["l_extendedprice", "l_discount", "l_shipdate", "l_quantity"],
               filter_expr=expr)

    def partial(t: pa.Table) -> pa.Table:
        price = _cents(t["l_extendedprice"].to_numpy())
        bps = np.floor(t["l_discount"].to_numpy()
                       * 10_000.0 + 0.5).astype("int64")
        return pa.table({
            "n": pa.array([len(price)], pa.int64()),
            "rev": pa.array([int((price * bps).sum())], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "n_items": pd.Series([int(parts["n"].sum())], dtype="int64"),
        "revenue_cents_bps": pd.Series([sum(int(v) for v in parts["rev"])],
                                       dtype="int64")})


# ---------------------------------------------------------------------------
# Chi-square independence audit (region × order priority, exact integer ppm)
# ---------------------------------------------------------------------------

def q_chi2_priority_by_region(sf_dir: str):
    """Integerized chi-square independence statistic between customer region
    and order priority — the drift/bias audit a dataset card reports: with
    N orders, row sums rᵢ, column sums cⱼ and observed counts oᵢⱼ on the
    ZERO-FILLED grid, chi2_ppm = Σᵢⱼ (oᵢⱼ·N − rᵢ·cⱼ)²·10⁶ // (N·rᵢ·cⱼ),
    each cell floor-divided in arbitrary-precision ints (HUGEINT in SQL)
    then summed — exact at any scale, no floats anywhere. Distribution
    plan: fact stream × broadcast custkey→region map → keyed count partials
    → one O(regions×priorities) reduce; the formula runs on that grid."""
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    cr = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey").merge(
        reg, left_on="n_regionkey", right_on="r_regionkey")
    keys = cr["c_custkey"].to_numpy().astype("int64")
    order = np.argsort(keys, kind="stable")
    side = ray.put((keys[order], cr["r_name"].to_numpy()[order]))

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        ks, rn = ray.get(side)
        ck = t["o_custkey"].to_numpy().astype("int64")
        pos = np.searchsorted(ks, ck)
        g = pd.DataFrame({"r_name": rn[pos],
                          "pr": t["o_orderpriority"].to_pandas(),
                          "o_ij": np.int64(1)}).groupby(
            ["r_name", "pr"], as_index=False).sum()
        return _pa_from_pandas(g.astype({"o_ij": "int64"}))

    grid = B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["r_name", "pr"], [Sum("o_ij", alias_name="o_ij")],
        key_domain=32).to_pandas()

    # zero-fill the full region × priority grid (absent cells still
    # contribute (0·N − r·c)²/(N·r·c) to the statistic)
    rows = sorted(grid["r_name"].unique())
    cols = sorted(grid["pr"].unique())
    full = pd.MultiIndex.from_product([rows, cols], names=["r_name", "pr"]
                                      ).to_frame(index=False)
    grid = full.merge(grid, on=["r_name", "pr"], how="left").fillna({"o_ij": 0})
    grid["o_ij"] = grid["o_ij"].astype("int64")
    ri = grid.groupby("r_name")["o_ij"].sum()
    cj = grid.groupby("pr")["o_ij"].sum()
    n_tot = int(grid["o_ij"].sum())
    chi2 = 0
    for _, row in grid.iterrows():
        r, c, o = int(ri[row["r_name"]]), int(cj[row["pr"]]), int(row["o_ij"])
        d = o * n_tot - r * c
        chi2 += d * d * 1_000_000 // (n_tot * r * c)
    return pd.DataFrame({"n_orders": pd.Series([n_tot], dtype="int64"),
                         "chi2_ppm": pd.Series([chi2], dtype="int64")})


# ---------------------------------------------------------------------------
# Per-source top-k bigrams (grouped rank over exploded text)
# ---------------------------------------------------------------------------

def q_top_bigrams_per_source(sf_dir: str, k: int = 3):
    """Top-k word bigrams PER SOURCE by (count desc, bigram asc), with the
    rank — the per-domain phrase profile a corpus card reports. Per-batch
    bigram value_counts per source is the combiner (adjacency resolved by a
    same-row shift over the exploded token frame, same trick as the global
    bigram_top50); one keyed count reduce; the top-k rank runs inside a
    source-bucketed reduce, so only O(sources × k) rows leave it."""
    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        toks = df["text"].str.lower().str.findall(r"[a-z0-9]+").explode().dropna()
        row = toks.index.to_numpy()
        tok = toks.to_numpy()
        m = row[1:] == row[:-1]
        g = pd.DataFrame({
            "source": df["source"].to_numpy()[row[:-1][m]],
            "bigram": tok[:-1][m] + " " + tok[1:][m],
        }).groupby(["source", "bigram"], as_index=False).size()
        return _pa_from_pandas(g.rename(columns={"size": "n"})
                               .astype({"n": "int64"}))

    counts = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "bigram"], [Sum("n", alias_name="n")])

    def topk_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["source", "n", "bigram"],
                          ascending=[True, False, True], kind="stable")
        b = b.groupby("source", sort=False).head(k).copy()
        b["rk"] = b.groupby("source", sort=False).cumcount().astype("int64") + 1
        return b

    return B.bucketed_map_groups(counts, ["source"], topk_bucket,
                                 auto_parallelism=True)


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov distance (exact integer numerator)
# ---------------------------------------------------------------------------

def q_ks_click_vs_purchase(sf_dir: str):
    """Two-sample KS distance between the click and purchase value
    distributions — the distribution-drift test an event-pipeline monitor
    runs — kept EXACT by reporting the integer numerator: D·n_a·n_b =
    max over distinct cent values of |cum_a·n_b − cum_b·n_a|. The event
    stream is filtered at the parquet scan (type pushdown), reduced to
    per-value counts by one keyed reduce; the cumulative max runs over the
    O(distinct cents) frame (bounded driver state, the gini contract)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", ["event_type", "value"],
               filter_expr=pc.field("event_type").isin(["click", "purchase"]))

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        v = np.floor(df["value"].to_numpy() * 100 + 0.5).astype("int64")
        a = (df["event_type"] == "click").to_numpy()
        g = pd.DataFrame({"v": v, "da": a.astype("int64"),
                          "db": (~a).astype("int64")}).groupby(
            "v", as_index=False).sum()
        return _pa_from_pandas(g.astype({"da": "int64", "db": "int64"}))

    counts = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pyarrow"),
        "v", [Sum("da", alias_name="da"), Sum("db", alias_name="db")]
    ).to_pandas().sort_values("v")
    na = int(counts["da"].sum())
    nb = int(counts["db"].sum())
    ca = counts["da"].to_numpy().cumsum()
    cb = counts["db"].to_numpy().cumsum()
    d_num = int(np.abs(ca * nb - cb * na).max())
    return pd.DataFrame({"n_click": pd.Series([na], dtype="int64"),
                         "n_purchase": pd.Series([nb], dtype="int64"),
                         "d_num": pd.Series([d_num], dtype="int64")})


# ---------------------------------------------------------------------------
# TPC-H Q3 shape — filtered 3-table join + keyed revenue + top-k
# ---------------------------------------------------------------------------

def q_q3_shipping_priority(sf_dir: str, k: int = 10):
    """TPC-H Q3 shape: top-k open-order revenue — BUILDING-segment
    customers, orders placed before 1996-07-01, lineitems shipped after it;
    revenue = Σ cents(extendedprice·(1−discount)) per order, ranked by
    (revenue desc, o_orderdate asc, o_orderkey asc). Plan: the segment's
    custkey set broadcasts (dimension-small); BOTH fact scans carry their
    date predicate pushed into the parquet read; lineitem reduces to
    per-order revenue partials before ONE keyed reduce; eligible orders
    attach their orderdate via the adaptive join; top-k is a distributed
    sort + limit over the O(open orders) frame."""
    from datetime import datetime

    import pyarrow.compute as pc
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    ck = np.sort(cust.loc[cust["c_mktsegment"] == "BUILDING",
                          "c_custkey"].to_numpy().astype("int64"))
    side = ray.put(ck)

    cut = datetime(1996, 7, 1)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
                   filter_expr=pc.field("o_orderdate") < pa.scalar(cut))

    def eligible(t: pa.Table) -> pa.Table:
        ks = ray.get(side)
        df = t.to_pandas()
        c = df["o_custkey"].to_numpy().astype("int64")
        pos = np.clip(np.searchsorted(ks, c), 0, max(len(ks) - 1, 0))
        keep = (ks[pos] == c) if len(ks) else np.zeros(len(c), dtype=bool)
        out = df.loc[keep, ["o_orderkey", "o_orderdate"]].copy()
        out["o_orderkey"] = out["o_orderkey"].astype("int64")
        out["o_orderdate"] = out["o_orderdate"].astype(str)
        return _pa_from_pandas(out)

    # materialize: attach() sizes its broadcast-vs-shuffle choice by
    # right.count(), which would otherwise execute this derived plan twice
    elig = orders.map_batches(eligible, batch_format="pyarrow").materialize()

    # l_shipdate rides in the projection because Ray binds the pushed
    # filter against the projected schema (row groups still prune)
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
                 filter_expr=pc.field("l_shipdate") > pa.scalar(cut))

    def rev_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        cents = np.floor(df["l_extendedprice"].to_numpy()
                         * (1.0 - df["l_discount"].to_numpy())
                         * 100.0 + 0.5).astype("int64")
        g = pd.DataFrame({"o_orderkey": df["l_orderkey"].astype("int64"),
                          "revenue_cents": cents}).groupby(
            "o_orderkey", as_index=False).sum()
        return _pa_from_pandas(g.astype({"revenue_cents": "int64"}))

    rev = B.grouped_aggregate_auto(
        line.map_batches(rev_partial, batch_format="pyarrow"),
        "o_orderkey", [Sum("revenue_cents", alias_name="revenue_cents")])

    joined = B.attach(rev, "o_orderkey", elig, "o_orderkey",
                      "o_orderdate", "o_orderdate")
    out = joined.sort(["revenue_cents", "o_orderdate", "o_orderkey"],
                      descending=[True, False, False]).limit(k).to_pandas()
    return out[["o_orderkey", "o_orderdate", "revenue_cents"]].astype(
        {"o_orderkey": "int64", "revenue_cents": "int64"})


# ---------------------------------------------------------------------------
# Mutual information (region × priority, exact milli-nat quantization)
# ---------------------------------------------------------------------------

def q_mutual_info_priority_region(sf_dir: str):
    """Mutual information between customer region and order priority in
    integer milli-nats — the dependence audit that complements chi2 (MI is
    the quantity a feature-selection pass ranks by): over the OBSERVED
    cells, MI·N = Σ o·(ln o + ln N − ln r − ln c). Each cell's term is
    quantized to an int64 (FLOOR(·10³ + 0.5), libm log on both sides — the
    token-entropy recipe; terms may be negative, floor is toward −∞ on
    both sides), summed exactly, then mi_millinats = FLOOR(Σt/N + 0.5).
    Same contingency machinery as chi2_priority_by_region: broadcast
    custkey→region, keyed count partials, O(grid) driver formula."""
    import math as _m

    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    cr = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey").merge(
        reg, left_on="n_regionkey", right_on="r_regionkey")
    keys = cr["c_custkey"].to_numpy().astype("int64")
    order = np.argsort(keys, kind="stable")
    side = ray.put((keys[order], cr["r_name"].to_numpy()[order]))

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        ks, rn = ray.get(side)
        ck = t["o_custkey"].to_numpy().astype("int64")
        pos = np.searchsorted(ks, ck)
        g = pd.DataFrame({"r_name": rn[pos],
                          "pr": t["o_orderpriority"].to_pandas(),
                          "o_ij": np.int64(1)}).groupby(
            ["r_name", "pr"], as_index=False).sum()
        return _pa_from_pandas(g.astype({"o_ij": "int64"}))

    grid = B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["r_name", "pr"], [Sum("o_ij", alias_name="o_ij")],
        key_domain=32).to_pandas()
    ri = grid.groupby("r_name")["o_ij"].sum()
    cj = grid.groupby("pr")["o_ij"].sum()
    n_tot = int(grid["o_ij"].sum())
    ln_n = _m.log(n_tot)
    st = 0
    for _, row in grid.iterrows():
        o = int(row["o_ij"])
        r, c = int(ri[row["r_name"]]), int(cj[row["pr"]])
        term = o * (_m.log(o) + ln_n - _m.log(r) - _m.log(c))
        st += int(_m.floor(term * 1000.0 + 0.5))
    mi = int(_m.floor(st / n_tot + 0.5))
    return pd.DataFrame({"n_orders": pd.Series([n_tot], dtype="int64"),
                         "mi_millinats": pd.Series([mi], dtype="int64")})


# ---------------------------------------------------------------------------
# TPC-H Q10 shape — returned-item revenue per customer, top-k
# ---------------------------------------------------------------------------

def q_q10_returned_items(sf_dir: str, k: int = 20):
    """TPC-H Q10 shape: the top-k customers by revenue LOST to returns in
    1996Q1 — orders in the quarter (date pushdown), lineitems with
    l_returnflag = 'R' (string-equality pushdown), revenue =
    Σ cents(extendedprice·(1−discount)). Plan: the quarter's orderkey→
    custkey map broadcasts (quarter-bounded, dimension-small at any scale
    ONLY if the window is; documented), lineitem partials reduce per
    custkey, c_name attaches via the adaptive join, top-k by (revenue
    desc, custkey asc)."""
    from datetime import datetime

    import pyarrow.compute as pc
    import ray

    lo, hi = datetime(1996, 1, 1), datetime(1996, 4, 1)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"],
                   filter_expr=((pc.field("o_orderdate") >= pa.scalar(lo))
                                & (pc.field("o_orderdate") < pa.scalar(hi)))
                   ).to_pandas()
    ok = orders["o_orderkey"].to_numpy().astype("int64")
    order = np.argsort(ok, kind="stable")
    side = ray.put((ok[order],
                    orders["o_custkey"].to_numpy().astype("int64")[order]))

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_extendedprice", "l_discount",
                  "l_returnflag"],
                 filter_expr=pc.field("l_returnflag") == pa.scalar("R"))

    def partial(t: pa.Table) -> pa.Table:
        ks, cks = ray.get(side)
        df = t.to_pandas()
        lk = df["l_orderkey"].to_numpy().astype("int64")
        pos = np.clip(np.searchsorted(ks, lk), 0, max(len(ks) - 1, 0))
        keep = (ks[pos] == lk) if len(ks) else np.zeros(len(lk), dtype=bool)
        if not keep.any():
            # sentinel partial instead of a 0-row output (Ray packs those
            # as schema-less blocks); custkey −1 never joins a real
            # customer, so the attach below drops it with no extra stage
            return pa.table({"o_custkey": pa.array([-1], pa.int64()),
                             "revenue_cents": pa.array([0], pa.int64())})
        cents = np.floor(df["l_extendedprice"].to_numpy()[keep]
                         * (1.0 - df["l_discount"].to_numpy()[keep])
                         * 100.0 + 0.5).astype("int64")
        g = pd.DataFrame({"o_custkey": cks[pos[keep]],
                          "revenue_cents": cents}).groupby(
            "o_custkey", as_index=False).sum()
        return _pa_from_pandas(g.astype({"revenue_cents": "int64"}))

    rev = B.grouped_aggregate_auto(
        line.map_batches(partial, batch_format="pyarrow"),
        "o_custkey", [Sum("revenue_cents", alias_name="revenue_cents")])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    joined = B.attach(rev, "o_custkey", cust, "c_custkey", "c_name", "c_name")
    out = joined.sort(["revenue_cents", "o_custkey"],
                      descending=[True, False]).limit(k).to_pandas()
    return out[["o_custkey", "c_name", "revenue_cents"]].astype(
        {"o_custkey": "int64", "revenue_cents": "int64"})


# ---------------------------------------------------------------------------
# Decile transition matrix (two-period NTILE + full-outer self-join)
# ---------------------------------------------------------------------------

def q_decile_transition_matrix(sf_dir: str):
    """Customer-spend decile migration 1996 → 1997 — the cohort-mobility
    matrix a retention analysis reports: NTILE(10) of per-customer spend
    within each year (exact SQL semantics via the ntile_orders closed
    form), FULL-OUTER self-joined on customer with decile 0 meaning
    'inactive that year' (entry/churn rows), counted into the ≤121-cell
    matrix. Plan: date-pushdown scan → keyed (customer, year) spend reduce
    → year-bucketed exact NTILE (each year co-locates, the ntile_orders
    contract) → customer-bucketed pairing emitting per-partition matrix
    partials → O(cells) reduce."""
    from datetime import datetime

    import pyarrow.compute as pc

    lo, hi = datetime(1996, 1, 1), datetime(1998, 1, 1)
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderdate"],
               filter_expr=((pc.field("o_orderdate") >= pa.scalar(lo))
                            & (pc.field("o_orderdate") < pa.scalar(hi))))

    def spend_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        y = pd.to_datetime(df["o_orderdate"]).dt.year.astype("int64")
        g = pd.DataFrame({"o_custkey": df["o_custkey"].astype("int64"),
                          "y": y, "spend": _cents(df["o_totalprice"])
                          }).groupby(["o_custkey", "y"], as_index=False).sum()
        return _pa_from_pandas(g.astype({"spend": "int64"}))

    spend = B.grouped_aggregate_auto(
        ds.map_batches(spend_partial, batch_format="pyarrow"),
        ["o_custkey", "y"], [Sum("spend", alias_name="spend")])

    def tile(b: pd.DataFrame, n: int = 10) -> pd.DataFrame:
        b = b.sort_values(["y", "spend", "o_custkey"], kind="stable")
        g = b.groupby("y", sort=False)
        r = g.cumcount().to_numpy()
        size = g["spend"].transform("size").to_numpy()
        base, rem = size // n, size % n
        split = rem * (base + 1)
        t_ = np.where(r < split, r // np.maximum(base + 1, 1),
                      rem + (r - split) // np.maximum(base, 1))
        return pd.DataFrame({"o_custkey": b["o_custkey"].to_numpy(),
                             "y": b["y"].to_numpy(),
                             "tile": (t_ + 1).astype(np.int64)})

    tiles = B.bucketed_map_groups(spend, ["y"], tile, key_domain=2)

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        w = b.pivot_table(index="o_custkey", columns="y", values="tile",
                          aggfunc="first", fill_value=0)
        d96 = w[1996].to_numpy() if 1996 in w.columns else np.zeros(len(w), dtype=np.int64)
        d97 = w[1997].to_numpy() if 1997 in w.columns else np.zeros(len(w), dtype=np.int64)
        g = pd.DataFrame({"d96": d96.astype("int64"),
                          "d97": d97.astype("int64"),
                          "n": np.int64(1)}).groupby(
            ["d96", "d97"], as_index=False).sum()
        return g.astype({"n": "int64"})

    return B.grouped_aggregate_small(
        B.bucketed_map_groups(tiles, ["o_custkey"], pair_partial,
                              auto_parallelism=True),
        ["d96", "d97"], [Sum("n", alias_name="n")], key_domain=121)


# ---------------------------------------------------------------------------
# Per-dimension embedding stats (vector-column profiling for quantization)
# ---------------------------------------------------------------------------

def q_embedding_dim_stats(sf_dir: str):
    """Per-dimension profile of the embedding column — the table an int8
    quantization / PCA-whitening pass starts from: for every dimension,
    (n, min, max, sum) of the element values in exact integer micro-units
    (FLOOR(v·10⁶ + 0.5); float32 → float64 widening is exact on both
    sides). The list column flattens to one contiguous numpy matrix per
    batch (zero row-wise Python); partials are O(dims) rows per batch and
    the reduce is keyed on the dimension index."""
    ds = _read(sf_dir, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        n_rows = len(col)
        dim = len(flat) // max(n_rows, 1)
        m = np.floor(flat.astype(np.float64) * 1_000_000.0
                     + 0.5).astype("int64").reshape(n_rows, dim)
        return pa.table({
            "dim": pa.array(np.arange(dim, dtype=np.int64)),
            "n": pa.array(np.full(dim, n_rows, dtype=np.int64)),
            "min_micro": pa.array(m.min(axis=0)),
            "max_micro": pa.array(m.max(axis=0)),
            "sum_micro": pa.array(m.sum(axis=0, dtype=np.int64)),
        })

    return B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pyarrow"), "dim",
        [Sum("n", alias_name="n"), Min("min_micro", alias_name="min_micro"),
         Max("max_micro", alias_name="max_micro"),
         Sum("sum_micro", alias_name="sum_micro")], key_domain=64)


# ---------------------------------------------------------------------------
# TPC-H join suite (Q4/Q7/Q8/Q13/Q14 shapes over the trimmed schema)
# ---------------------------------------------------------------------------

def _day_i64(s: pd.Series) -> np.ndarray:
    """Timestamps → integer epoch days (exact; all corpus dates are midnight)."""
    return pd.to_datetime(s).to_numpy().astype("datetime64[D]").astype("int64")


def q_q4_priority_semijoin(sf_dir: str):
    """TPC-H Q4 shape (adapted — this corpus has no l_commitdate, so "late"
    is l_shipdate > o_orderdate + 60 days): 1996Q1 orders counted per
    priority when AT LEAST ONE lineitem shipped late. EXISTS is a dup-safe
    semi-join: the quarter's (orderkey, epoch-day, priority) broadcasts
    once (window-bounded small side), lineitem batches emit per-batch
    DISTINCT late orderkeys, a keyed distinct reduce collapses across
    batches, and the final count is a ≤5-key grouped reduce. No lineitem
    row is ever shuffled — only candidate orderkeys move."""
    from datetime import datetime

    import pyarrow.compute as pc
    import ray

    lo, hi = datetime(1996, 1, 1), datetime(1996, 4, 1)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"],
                   filter_expr=((pc.field("o_orderdate") >= pa.scalar(lo))
                                & (pc.field("o_orderdate") < pa.scalar(hi)))
                   ).to_pandas()
    ok = orders["o_orderkey"].to_numpy().astype("int64")
    order = np.argsort(ok, kind="stable")
    ok = ok[order]
    odays = _day_i64(orders["o_orderdate"])[order]
    prio = orders["o_orderpriority"].to_numpy()[order]
    side = ray.put((ok, odays))

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def late_keys(t: pa.Table) -> pa.Table:
        ks, ds_ = ray.get(side)
        df = t.to_pandas()
        lk = df["l_orderkey"].to_numpy().astype("int64")
        sd = _day_i64(df["l_shipdate"])
        if len(ks):
            pos = np.clip(np.searchsorted(ks, lk), 0, len(ks) - 1)
            keep = (ks[pos] == lk) & (sd > ds_[pos] + 60)
        else:
            keep = np.zeros(len(lk), dtype=bool)
        u = np.unique(lk[keep])
        if not len(u):
            u = np.array([-1], dtype=np.int64)  # typed sentinel, never joins
        return pa.table({"o_orderkey": pa.array(u, pa.int64())})

    distinct = B.bucketed_map_groups(
        line.map_batches(late_keys, batch_format="pyarrow"),
        ["o_orderkey"],
        lambda b: b.drop_duplicates("o_orderkey"),
        auto_parallelism=True)

    def count_prio(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ok, k), 0, max(len(ok) - 1, 0))
        keep = (ok[pos] == k) if len(ok) else np.zeros(len(k), dtype=bool)
        g = pd.Series(prio[pos[keep]]).value_counts()
        return pa.table({"o_orderpriority": pa.array(g.index.to_numpy()),
                         "order_count": pa.array(
                             g.to_numpy().astype("int64"), pa.int64())})

    out = B.grouped_aggregate_small(
        distinct.map_batches(count_prio, batch_format="pyarrow"),
        "o_orderpriority", [Sum("order_count", alias_name="order_count")],
        key_domain=8).to_pandas()
    return out.sort_values("o_orderpriority").reset_index(drop=True).astype(
        {"order_count": "int64"})


def q_q7_volume_shipping(sf_dir: str):
    """TPC-H Q7 shape generalized to the full nation×nation grid: revenue
    cents between (supplier nation, customer nation) per ship year,
    1996–1997. Plan: lineitem batches attach s_nationkey from a broadcast
    sorted supplier array and pre-reduce to (orderkey, supp nation, year)
    partials — the shuffle then moves ~|orders| rows, not ~|lineitem|;
    o_custkey and c_nationkey attach via the adaptive join (broadcast at
    test SF, bucketed shuffle at scale); 25-row nation names broadcast;
    final grouped reduce is ≤ 25·25·2 keys."""
    from datetime import datetime

    import pyarrow.compute as pc
    import ray

    lo, hi = datetime(1996, 1, 1), datetime(1998, 1, 1)
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sk = sup["s_suppkey"].to_numpy().astype("int64")
    so = np.argsort(sk, kind="stable")
    sup_side = ray.put((sk[so],
                        sup["s_nationkey"].to_numpy().astype("int64")[so]))

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                  "l_shipdate"],
                 filter_expr=((pc.field("l_shipdate") >= pa.scalar(lo))
                              & (pc.field("l_shipdate") < pa.scalar(hi))))

    def partial(t: pa.Table) -> pa.Table:
        ks, nat = ray.get(sup_side)
        df = t.to_pandas()
        lsk = df["l_suppkey"].to_numpy().astype("int64")
        pos = np.clip(np.searchsorted(ks, lsk), 0, max(len(ks) - 1, 0))
        cents = np.floor(df["l_extendedprice"].to_numpy()
                         * (1.0 - df["l_discount"].to_numpy())
                         * 100.0 + 0.5).astype("int64")
        y = pd.to_datetime(df["l_shipdate"]).dt.year.to_numpy().astype("int64")
        g = pd.DataFrame({"l_orderkey": df["l_orderkey"].astype("int64"),
                          "supp_nat": nat[pos], "l_year": y,
                          "revenue_cents": cents}).groupby(
            ["l_orderkey", "supp_nat", "l_year"], as_index=False).sum()
        return _pa_from_pandas(g.astype({"revenue_cents": "int64"}))

    part_ds = B.grouped_aggregate_auto(
        line.map_batches(partial, batch_format="pyarrow"),
        ["l_orderkey", "supp_nat", "l_year"],
        [Sum("revenue_cents", alias_name="revenue_cents")])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    with_cust = B.attach(part_ds, "l_orderkey", orders, "o_orderkey",
                         "o_custkey", "o_custkey")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    with_nat = B.attach(with_cust, "o_custkey", cust, "c_custkey",
                        "c_nationkey", "cust_nat")

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nk = nation["n_nationkey"].to_numpy().astype("int64")
    no = np.argsort(nk, kind="stable")
    nk, nname = nk[no], nation["n_name"].to_numpy()[no]

    def name_pair(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        sn = np.searchsorted(nk, df["supp_nat"].to_numpy().astype("int64"))
        cn = np.searchsorted(nk, df["cust_nat"].to_numpy().astype("int64"))
        g = pd.DataFrame({"supp_nation": nname[sn], "cust_nation": nname[cn],
                          "l_year": df["l_year"].astype("int64"),
                          "revenue_cents": df["revenue_cents"].astype("int64")
                          }).groupby(["supp_nation", "cust_nation", "l_year"],
                                     as_index=False).sum()
        return _pa_from_pandas(g.astype({"revenue_cents": "int64"}))

    out = B.grouped_aggregate_small(
        with_nat.map_batches(name_pair, batch_format="pyarrow"),
        ["supp_nation", "cust_nation", "l_year"],
        [Sum("revenue_cents", alias_name="revenue_cents")],
        key_domain=25 * 25 * 2).to_pandas()
    return out.sort_values(["supp_nation", "cust_nation", "l_year"]
                           ).reset_index(drop=True).astype(
        {"l_year": "int64", "revenue_cents": "int64"})


def q_q8_market_share(sf_dir: str):
    """TPC-H Q8 shape: NATION_1 suppliers' share (bps) of PROMO-part revenue
    sold to AMERICA-region customers, per order year 1996–1997. Plan: the
    PROMO partkey set and the supplier→nation array broadcast once;
    lineitem batches filter on partkey membership, flag target-nation
    suppliers and pre-reduce to (orderkey, flag) partials; order year and
    customer nation attach adaptively; region filter via the 25-row
    nation map; 2-key final reduce computes the share in integer bps."""
    import pyarrow.compute as pc
    import ray

    part = _read(sf_dir, "part", ["p_partkey", "p_type"],
                 filter_expr=pc.field("p_type") == pa.scalar("PROMO")
                 ).to_pandas()
    promo = np.sort(part["p_partkey"].to_numpy().astype("int64"))
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sk = sup["s_suppkey"].to_numpy().astype("int64")
    so = np.argsort(sk, kind="stable")
    side = ray.put((promo, sk[so],
                    sup["s_nationkey"].to_numpy().astype("int64")[so]))

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_partkey", "l_suppkey",
                  "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        pm, ks, nat = ray.get(side)
        df = t.to_pandas()
        lp = df["l_partkey"].to_numpy().astype("int64")
        pos = np.clip(np.searchsorted(pm, lp), 0, max(len(pm) - 1, 0))
        keep = (pm[pos] == lp) if len(pm) else np.zeros(len(lp), dtype=bool)
        if not keep.any():
            return pa.table({"l_orderkey": pa.array([-1], pa.int64()),
                             "nation_cents": pa.array([0], pa.int64()),
                             "total_cents": pa.array([0], pa.int64())})
        df = df.loc[keep]
        cents = np.floor(df["l_extendedprice"].to_numpy()
                         * (1.0 - df["l_discount"].to_numpy())
                         * 100.0 + 0.5).astype("int64")
        spos = np.clip(np.searchsorted(ks, df["l_suppkey"].to_numpy()
                                       .astype("int64")), 0, len(ks) - 1)
        is_target = (nat[spos] == 1).astype("int64")
        g = pd.DataFrame({"l_orderkey": df["l_orderkey"].astype("int64"),
                          "nation_cents": is_target * cents,
                          "total_cents": cents}).groupby(
            "l_orderkey", as_index=False).sum()
        return _pa_from_pandas(g.astype({"nation_cents": "int64",
                                         "total_cents": "int64"}))

    part_ds = B.grouped_aggregate_auto(
        line.map_batches(partial, batch_format="pyarrow"), "l_orderkey",
        [Sum("nation_cents", alias_name="nation_cents"),
         Sum("total_cents", alias_name="total_cents")])

    from datetime import datetime
    lo, hi = datetime(1996, 1, 1), datetime(1998, 1, 1)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"],
                   filter_expr=((pc.field("o_orderdate") >= pa.scalar(lo))
                                & (pc.field("o_orderdate") < pa.scalar(hi))))

    def with_year(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["o_year"] = pd.to_datetime(df["o_orderdate"]).dt.year.astype("int64")
        return _pa_from_pandas(df[["o_orderkey", "o_custkey", "o_year"]])

    ody = orders.map_batches(with_year, batch_format="pyarrow")
    j1 = B.attach(part_ds, "l_orderkey", ody, "o_orderkey",
                  "o_custkey", "o_custkey")
    j2 = B.attach(j1, "l_orderkey", ody, "o_orderkey", "o_year", "o_year")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j3 = B.attach(j2, "o_custkey", cust, "c_custkey", "c_nationkey",
                  "cust_nat")

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]
                   ).to_pandas()
    nk = nation["n_nationkey"].to_numpy().astype("int64")
    no = np.argsort(nk, kind="stable")
    nk, nreg = nk[no], nation["n_regionkey"].to_numpy().astype("int64")[no]

    def america_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        cn = df["cust_nat"].to_numpy().astype("int64")
        keep = nreg[np.searchsorted(nk, cn)] == 1  # AMERICA
        if not keep.any():
            return pa.table({"o_year": pa.array([-1], pa.int64()),
                             "nation_cents": pa.array([0], pa.int64()),
                             "total_cents": pa.array([0], pa.int64())})
        g = df.loc[keep].groupby("o_year", as_index=False)[
            ["nation_cents", "total_cents"]].sum()
        return _pa_from_pandas(g.astype({"o_year": "int64",
                                         "nation_cents": "int64",
                                         "total_cents": "int64"}))

    out = B.grouped_aggregate_small(
        j3.map_batches(america_partial, batch_format="pyarrow"), "o_year",
        [Sum("nation_cents", alias_name="nation_cents"),
         Sum("total_cents", alias_name="total_cents")],
        key_domain=8).to_pandas()
    out = out.loc[out["o_year"] >= 0].sort_values("o_year").reset_index(
        drop=True)
    out["share_bps"] = np.floor(
        out["nation_cents"].to_numpy().astype(np.float64) * 10000.0
        / out["total_cents"].to_numpy().astype(np.float64) + 0.5
    ).astype("int64")
    return out.astype({"o_year": "int64", "nation_cents": "int64",
                       "total_cents": "int64"})


def q_q13_custdist(sf_dir: str):
    """TPC-H Q13 shape: the distribution of customers by order count,
    INCLUDING the zero-order bucket (the LEFT-JOIN semantics). Plan:
    per-custkey counts via batch partials + keyed reduce, a second tiny
    reduce histograms the counts, and the zero bucket is total customers
    (parquet footer count — no scan) minus customers seen in orders.
    Nothing wider than |customers| rows ever shuffles."""
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        v = pd.Series(t.column("o_custkey").to_numpy(zero_copy_only=False)
                      ).value_counts()
        return pa.table({"o_custkey": pa.array(
            v.index.to_numpy().astype("int64"), pa.int64()),
            "c_count": pa.array(v.to_numpy().astype("int64"), pa.int64())})

    per_cust = B.grouped_aggregate_auto(
        orders.map_batches(partial, batch_format="pyarrow"), "o_custkey",
        [Sum("c_count", alias_name="c_count")])

    def hist_partial(t: pa.Table) -> pa.Table:
        v = pd.Series(t.column("c_count").to_numpy(zero_copy_only=False)
                      ).value_counts()
        return pa.table({"c_count": pa.array(
            v.index.to_numpy().astype("int64"), pa.int64()),
            "custdist": pa.array(v.to_numpy().astype("int64"), pa.int64())})

    hist = B.grouped_aggregate_auto(
        per_cust.map_batches(hist_partial, batch_format="pyarrow"), "c_count",
        [Sum("custdist", alias_name="custdist")]).to_pandas()
    n_cust = _read(sf_dir, "customer", ["c_custkey"]).count()
    zero = int(n_cust) - int(hist["custdist"].sum())
    if zero > 0:
        hist = pd.concat([hist, pd.DataFrame(
            {"c_count": [0], "custdist": [zero]})], ignore_index=True)
    return hist.sort_values(["custdist", "c_count"], ascending=[False, False]
                            ).reset_index(drop=True).astype(
        {"c_count": "int64", "custdist": "int64"})


def q_q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape per month of 1996: PROMO-part revenue share in
    integer bps. The PROMO partkey set broadcasts once (sorted array,
    membership via searchsorted — never re-shipped per batch); lineitem
    batches pre-reduce to ≤12 (month, sums) partials so the final reduce
    is a 12-key grouped aggregate."""
    from datetime import datetime

    import pyarrow.compute as pc
    import ray

    part = _read(sf_dir, "part", ["p_partkey", "p_type"],
                 filter_expr=pc.field("p_type") == pa.scalar("PROMO")
                 ).to_pandas()
    promo_ref = ray.put(np.sort(part["p_partkey"].to_numpy().astype("int64")))

    lo, hi = datetime(1996, 1, 1), datetime(1997, 1, 1)
    line = _read(sf_dir, "lineitem",
                 ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
                 filter_expr=((pc.field("l_shipdate") >= pa.scalar(lo))
                              & (pc.field("l_shipdate") < pa.scalar(hi))))

    def partial(t: pa.Table) -> pa.Table:
        pm = ray.get(promo_ref)
        df = t.to_pandas()
        cents = np.floor(df["l_extendedprice"].to_numpy()
                         * (1.0 - df["l_discount"].to_numpy())
                         * 100.0 + 0.5).astype("int64")
        lp = df["l_partkey"].to_numpy().astype("int64")
        pos = np.clip(np.searchsorted(pm, lp), 0, max(len(pm) - 1, 0))
        is_promo = ((pm[pos] == lp) if len(pm)
                    else np.zeros(len(lp), dtype=bool)).astype("int64")
        m = pd.to_datetime(df["l_shipdate"]).dt.month.to_numpy().astype(
            "int64")
        g = pd.DataFrame({"l_month": m, "promo_cents": is_promo * cents,
                          "total_cents": cents}).groupby(
            "l_month", as_index=False).sum()
        return _pa_from_pandas(g.astype({"promo_cents": "int64",
                                         "total_cents": "int64"}))

    out = B.grouped_aggregate_small(
        line.map_batches(partial, batch_format="pyarrow"), "l_month",
        [Sum("promo_cents", alias_name="promo_cents"),
         Sum("total_cents", alias_name="total_cents")],
        key_domain=12).to_pandas().sort_values("l_month").reset_index(
        drop=True)
    out["promo_bps"] = np.floor(
        out["promo_cents"].to_numpy().astype(np.float64) * 10000.0
        / out["total_cents"].to_numpy().astype(np.float64) + 0.5
    ).astype("int64")
    return out.astype({"l_month": "int64", "promo_cents": "int64",
                       "total_cents": "int64"})


def q_q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape: the top supplier(s) by 1996Q1 ship revenue, ties
    included (the view + MAX correlated filter). Plan: date-pushdown
    lineitem scan → per-batch suppkey partials → keyed reduce to
    |suppliers| rows (dimension-sized: ~10k/SF100 — safe to collect), max
    + tie filter + s_name merge on the reduced frame."""
    from datetime import datetime

    import pyarrow.compute as pc

    lo, hi = datetime(1996, 1, 1), datetime(1996, 4, 1)
    line = _read(sf_dir, "lineitem",
                 ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
                 filter_expr=((pc.field("l_shipdate") >= pa.scalar(lo))
                              & (pc.field("l_shipdate") < pa.scalar(hi))))

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        cents = np.floor(df["l_extendedprice"].to_numpy()
                         * (1.0 - df["l_discount"].to_numpy())
                         * 100.0 + 0.5).astype("int64")
        g = pd.DataFrame({"s_suppkey": df["l_suppkey"].astype("int64"),
                          "total_cents": cents}).groupby(
            "s_suppkey", as_index=False).sum()
        return _pa_from_pandas(g.astype({"total_cents": "int64"}))

    rev = B.grouped_aggregate_auto(
        line.map_batches(partial, batch_format="pyarrow"), "s_suppkey",
        [Sum("total_cents", alias_name="total_cents")]).to_pandas()
    top = rev.loc[rev["total_cents"] == rev["total_cents"].max()]
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = top.merge(sup, on="s_suppkey").sort_values("s_suppkey")
    return out[["s_suppkey", "s_name", "total_cents"]].reset_index(
        drop=True).astype({"s_suppkey": "int64", "total_cents": "int64"})


def q_q17_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape: revenue locked in small-quantity orders — lineitems
    with l_quantity < 0.2 × that part's average quantity. The per-part
    threshold is float-EXACT on both sides (quantities are integral ≤ 50,
    so the float64 sum is exact at any order; 0.2·(sum/count) is one
    deterministic op sequence mirrored in the SQL). Plan: per-part
    (sum, count) partials → keyed reduce → threshold column → adaptive
    attach back onto lineitem (broadcast at test SF, bucketed at scale) →
    filtered partial sums → 1-key reduce."""
    line1 = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])

    def qty_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = pd.DataFrame({"l_partkey": df["l_partkey"].astype("int64"),
                          "sq": df["l_quantity"].astype("float64"),
                          "cnt": np.ones(len(df), dtype=np.int64)}).groupby(
            "l_partkey", as_index=False).sum()
        return _pa_from_pandas(g.astype({"cnt": "int64"}))

    per_part = B.grouped_aggregate_auto(
        line1.map_batches(qty_partial, batch_format="pyarrow"), "l_partkey",
        [Sum("sq", alias_name="sq"), Sum("cnt", alias_name="cnt")])

    def thr_col(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        thr = 0.2 * (df["sq"].to_numpy()
                     / df["cnt"].to_numpy().astype(np.float64))
        return pa.table({"l_partkey": pa.array(
            df["l_partkey"].to_numpy().astype("int64"), pa.int64()),
            "thr": pa.array(thr, pa.float64())})

    thr_ds = per_part.map_batches(thr_col, batch_format="pyarrow")
    line2 = _read(sf_dir, "lineitem",
                  ["l_partkey", "l_quantity", "l_extendedprice"])
    joined = B.attach(line2, "l_partkey", thr_ds, "l_partkey", "thr", "thr")

    def small_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        keep = df["l_quantity"].to_numpy() < df["thr"].to_numpy()
        cents = np.floor(df["l_extendedprice"].to_numpy()[keep] * 100.0
                         + 0.5).astype("int64")
        return pa.table({"k": pa.array([0], pa.int64()),
                         "n_small": pa.array([int(keep.sum())], pa.int64()),
                         "total_cents": pa.array([int(cents.sum())],
                                                 pa.int64())})

    out = B.grouped_aggregate_small(
        joined.map_batches(small_partial, batch_format="pyarrow"), "k",
        [Sum("n_small", alias_name="n_small"),
         Sum("total_cents", alias_name="total_cents")],
        key_domain=1).to_pandas().drop(columns=["k"])
    out["avg_yearly_cents"] = np.floor(
        out["total_cents"].to_numpy().astype(np.float64) / 7.0 + 0.5
    ).astype("int64")
    return out.astype({"n_small": "int64", "total_cents": "int64"})


def q_q18_large_orders(sf_dir: str, min_qty: float = 250.0):
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds 250,
    with customer name — the HAVING tail. Plan: per-orderkey quantity
    partials → keyed reduce → tail filter (O(SF) survivors) → order
    attributes and c_name attach via the adaptive join chain (each
    broadcast at test SF, bucketed shuffle at scale — survivors GROW with
    SF, so no driver-side collection happens before the final result)."""
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = pd.DataFrame({"o_orderkey": df["l_orderkey"].astype("int64"),
                          "sum_qty": df["l_quantity"].astype("float64")
                          }).groupby("o_orderkey", as_index=False).sum()
        return _pa_from_pandas(g)

    sums = B.grouped_aggregate_auto(
        line.map_batches(partial, batch_format="pyarrow"), "o_orderkey",
        [Sum("sum_qty", alias_name="sum_qty")])

    def tail(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.loc[df["sum_qty"].to_numpy() > min_qty]
        if not len(df):
            df = pd.DataFrame({"o_orderkey": np.array([-1], dtype=np.int64),
                               "sum_qty": np.array([0.0])})
        return _pa_from_pandas(df.astype({"o_orderkey": "int64"}))

    surv = sums.map_batches(tail, batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    j = B.attach(surv, "o_orderkey", orders, "o_orderkey",
                 "o_custkey", "o_custkey")
    j = B.attach(j, "o_orderkey", orders, "o_orderkey",
                 "o_orderdate", "o_orderdate")
    j = B.attach(j, "o_orderkey", orders, "o_orderkey",
                 "o_totalprice", "o_totalprice")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    j = B.attach(j, "o_custkey", cust, "c_custkey", "c_name", "c_name")
    out = j.to_pandas()
    out["total_cents"] = _cents(out["o_totalprice"].to_numpy())
    out["sum_qty"] = out["sum_qty"].to_numpy().astype("int64")
    out = out.sort_values(["sum_qty", "o_orderkey"],
                          ascending=[False, True]).reset_index(drop=True)
    return out[["c_name", "o_custkey", "o_orderkey", "o_orderdate",
                "total_cents", "sum_qty"]].astype(
        {"o_custkey": "int64", "o_orderkey": "int64",
         "total_cents": "int64", "sum_qty": "int64"})


def q_q19_disjunctive_pred(sf_dir: str):
    """TPC-H Q19 shape: revenue under a 3-way disjunction of correlated
    (brand, size-range, quantity-range) predicates — the classic
    OR-of-ANDs that defeats naive pushdown. Plan: the part side of each
    disjunct pre-evaluates driver-side into three partkey bitmasks over a
    sorted key array (broadcast once); lineitem batches evaluate the
    quantity windows vectorized and OR the three masks; 1-key reduce."""
    import ray

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]
                 ).to_pandas()
    pk = part["p_partkey"].to_numpy().astype("int64")
    po = np.argsort(pk, kind="stable")
    pk = pk[po]
    brand = part["p_brand"].to_numpy()[po]
    size = part["p_size"].to_numpy().astype("int64")[po]
    b1 = (brand == "Brand#12") & (size >= 1) & (size <= 15)
    b2 = (brand == "Brand#23") & (size >= 1) & (size <= 25)
    b3 = (brand == "Brand#3") & (size >= 1) & (size <= 35)
    side = ray.put((pk, b1, b2, b3))

    line = _read(sf_dir, "lineitem",
                 ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        ks, m1, m2, m3 = ray.get(side)
        df = t.to_pandas()
        lp = df["l_partkey"].to_numpy().astype("int64")
        q = df["l_quantity"].to_numpy()
        pos = np.clip(np.searchsorted(ks, lp), 0, max(len(ks) - 1, 0))
        hit = (ks[pos] == lp) if len(ks) else np.zeros(len(lp), dtype=bool)
        keep = hit & ((m1[pos] & (q >= 1) & (q <= 11))
                      | (m2[pos] & (q >= 10) & (q <= 20))
                      | (m3[pos] & (q >= 20) & (q <= 30)))
        cents = np.floor(df["l_extendedprice"].to_numpy()[keep]
                         * (1.0 - df["l_discount"].to_numpy()[keep])
                         * 100.0 + 0.5).astype("int64")
        return pa.table({"k": pa.array([0], pa.int64()),
                         "n_matched": pa.array([int(keep.sum())], pa.int64()),
                         "revenue_cents": pa.array([int(cents.sum())],
                                                   pa.int64())})

    return B.grouped_aggregate_small(
        line.map_batches(partial, batch_format="pyarrow"), "k",
        [Sum("n_matched", alias_name="n_matched"),
         Sum("revenue_cents", alias_name="revenue_cents")],
        key_domain=1).to_pandas().drop(columns=["k"]).astype(
        {"n_matched": "int64", "revenue_cents": "int64"})


# ---------------------------------------------------------------------------
# TPC-H adapted shapes round 2: Q9 profit, Q12 late-line priority classes,
# Q16 supplier count-distinct, Q21 lone-late supplier, Q22 idle-rich audit.
# (Adapted because the synthetic schema has no partsupp / l_shipmode /
# l_commitdate / c_phone; each docstring states the substitution.)
# ---------------------------------------------------------------------------

def q_q9_profit(sf_dir: str):
    """TPC-H Q9 shape (adapted: no partsupp table, so per-unit part cost is
    proxied as 10% of p_retailprice): profit by supplier nation × ship year
    over parts whose name contains 'widget'. Plan: the name-filtered part
    side reduces to (partkey → retailprice) and attaches adaptively
    (broadcast at test SF, bucketed shuffle at scale); suppkey→nation is a
    broadcast dimension map; per-batch (nation, year) partials reduce under
    an auto-sized keyed aggregate. Profit is exact int64 cents: the revenue
    and cost terms are floored per row with the same float64 op sequence as
    the SQL oracle."""
    import ray

    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])

    def part_prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["p_name"].str.contains("widget", regex=False)]
        return pa.table({
            "p_partkey": pa.array(df["p_partkey"].to_numpy().astype("int64"),
                                  pa.int64()),
            "p_retail": pa.array(df["p_retailprice"].to_numpy(),
                                 pa.float64())})

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    sup = sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    sk = sup["s_suppkey"].to_numpy().astype("int64")
    order = np.argsort(sk, kind="stable")
    nation_names = sorted(nat["n_name"].tolist())
    name_idx = {n: i for i, n in enumerate(nation_names)}
    side = ray.put((sk[order],
                    sup["n_name"].map(name_idx).to_numpy().astype("int64")[order]))

    line = _read(sf_dir, "lineitem",
                 ["l_partkey", "l_suppkey", "l_quantity",
                  "l_extendedprice", "l_discount", "l_shipdate"])
    joined = B.attach(line, "l_partkey",
                      part.map_batches(part_prep, batch_format="pyarrow"),
                      "p_partkey", "p_retail", "p_retail")

    def partial(df: pd.DataFrame) -> pa.Table:
        ks, nidx = ray.get(side)
        rev = np.floor(df["l_extendedprice"].to_numpy()
                       * (1.0 - df["l_discount"].to_numpy())
                       * 100.0 + 0.5).astype("int64")
        cost = np.floor(df["l_quantity"].to_numpy()
                        * df["p_retail"].to_numpy() * 10.0 + 0.5).astype("int64")
        lsk = df["l_suppkey"].to_numpy().astype("int64")
        pos = np.clip(np.searchsorted(ks, lsk), 0, max(len(ks) - 1, 0))
        year = pd.to_datetime(df["l_shipdate"]).dt.year.to_numpy().astype("int64")
        g = pd.DataFrame({"nidx": nidx[pos], "o_year": year,
                          "profit_cents": rev - cost}).groupby(
            ["nidx", "o_year"], as_index=False).sum()
        return _pa_from_pandas(g.astype({"profit_cents": "int64"}))

    agg = B.grouped_aggregate_auto(
        joined.map_batches(partial, batch_format="pandas"),
        ["nidx", "o_year"],
        [Sum("profit_cents", alias_name="profit_cents")]).to_pandas()
    agg["n_name"] = agg["nidx"].map(dict(enumerate(nation_names)))
    out = agg[["n_name", "o_year", "profit_cents"]].sort_values(
        ["n_name", "o_year"]).reset_index(drop=True)
    return out.astype({"o_year": "int64", "profit_cents": "int64"})


def q_q12_late_lines(sf_dir: str):
    """TPC-H Q12 shape (adapted: no l_shipmode/l_commitdate — 'mode' is
    l_returnflag and 'late' means shipped >90 days after the order date):
    per returnflag, 1996-shipped late-line counts split by order priority
    class (1-URGENT/2-HIGH vs the rest). One adaptive attach carries BOTH
    order columns as a single packed int64 payload (epoch_day·2 + is_high)
    so lineitem is shuffled at most once; the year bound is pushed into the
    parquet fragment scan."""
    from datetime import datetime

    import pyarrow.compute as pc

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def pack(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        day = df["o_orderdate"].to_numpy().astype("datetime64[D]").astype("int64")
        high = df["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).to_numpy()
        return pa.table({
            "o_orderkey": pa.array(df["o_orderkey"].to_numpy().astype("int64"),
                                   pa.int64()),
            "packed": pa.array(day * 2 + high.astype("int64"), pa.int64())})

    lo, hi = datetime(1996, 1, 1), datetime(1997, 1, 1)
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_returnflag", "l_shipdate"],
                 filter_expr=((pc.field("l_shipdate") >= pa.scalar(lo))
                              & (pc.field("l_shipdate") < pa.scalar(hi))))
    joined = B.attach(line, "l_orderkey",
                      orders.map_batches(pack, batch_format="pyarrow"),
                      "o_orderkey", "packed", "packed")

    def partial(df: pd.DataFrame) -> pa.Table:
        packed = df["packed"].to_numpy()
        oday = packed >> 1
        high = (packed & 1).astype("int64")
        sday = df["l_shipdate"].to_numpy().astype("datetime64[D]").astype("int64")
        late = sday > oday + 90
        g = pd.DataFrame({"l_returnflag": df["l_returnflag"].to_numpy()[late],
                          "high_line_count": high[late],
                          "low_line_count": (1 - high)[late]}).groupby(
            "l_returnflag", as_index=False).sum()
        return _pa_from_pandas(g.astype({"high_line_count": "int64",
                                         "low_line_count": "int64"}))

    return B.grouped_aggregate_auto(
        joined.map_batches(partial, batch_format="pandas"), "l_returnflag",
        [Sum("high_line_count", alias_name="high_line_count"),
         Sum("low_line_count", alias_name="low_line_count")])


def q_q16_supplier_cnt(sf_dir: str):
    """TPC-H Q16 shape (adapted: supplier↔part relation comes from lineitem
    instead of the absent partsupp; the 'complaints' exclusion is suppliers
    with negative account balance): distinct supplier count per
    (p_brand, p_type, p_size) with brand/type/size predicates. Plan:
    bucketed dedup of (partkey, suppkey) pairs → one adaptive attach of the
    pipe-packed part attribute string (predicate-filtered part side, so
    non-qualifying lineitems drop at the join) → excluded-supplier
    broadcast filter → second bucketed dedup on (attrs, suppkey) → keyed
    count. The pair dedup shuffles at most |distinct pairs| rows — never
    raw lineitem."""
    supf = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).to_pandas()
    excl = set(supf.loc[supf["s_acctbal"] < 0, "s_suppkey"].astype("int64"))

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
    sizes = {1, 4, 7, 10, 13, 16, 19, 22}

    def part_prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        keep = ((df["p_brand"] != "Brand#13") & (df["p_type"] != "ECONOMY")
                & df["p_size"].isin(sizes))
        df = df[keep]
        attrs = (df["p_brand"] + "|" + df["p_type"] + "|"
                 + df["p_size"].astype(str))
        return pa.table({
            "p_partkey": pa.array(df["p_partkey"].to_numpy().astype("int64"),
                                  pa.int64()),
            "attrs": pa.array(attrs.to_numpy(), pa.string())})

    line = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pair_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        return _pa_from_pandas(df.astype({"l_partkey": "int64",
                                          "l_suppkey": "int64"}))

    pairs = B.bucketed_map_groups(
        line.map_batches(pair_partial, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"], lambda b: b.drop_duplicates())
    joined = B.attach(pairs, "l_partkey",
                      part.map_batches(part_prep, batch_format="pyarrow"),
                      "p_partkey", "attrs", "attrs")

    def drop_excl(df: pd.DataFrame) -> pd.DataFrame:
        out = df[~df["l_suppkey"].isin(excl)][["attrs", "l_suppkey"]]
        return out.astype({"l_suppkey": "int64"})

    dedup2 = B.bucketed_map_groups(
        joined.map_batches(drop_excl, batch_format="pandas"),
        ["attrs", "l_suppkey"], lambda b: b.drop_duplicates())

    def count_partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("attrs", as_index=False).size().rename(
            columns={"size": "supplier_cnt"})
        return _pa_from_pandas(g.astype({"supplier_cnt": "int64"}))

    agg = B.grouped_aggregate_auto(
        dedup2.map_batches(count_partial, batch_format="pandas"), "attrs",
        [Sum("supplier_cnt", alias_name="supplier_cnt")]).to_pandas()
    split = agg["attrs"].str.split("|", expand=True)
    out = pd.DataFrame({"p_brand": split[0], "p_type": split[1],
                        "p_size": split[2].astype("int64"),
                        "supplier_cnt": agg["supplier_cnt"].astype("int64")})
    return out.sort_values(["p_brand", "p_type", "p_size"]).reset_index(drop=True)


def q_q21_waiting_supplier(sf_dir: str):
    """TPC-H Q21 shape (adapted: no l_commitdate/l_receiptdate — 'late'
    means shipped >60 days after the order date): suppliers who were the
    ONLY late supplier on a finished ('F') multi-supplier order, counted.
    Plan: orders pre-filtered to status F at the fragment scan, order date
    attaches as epoch-day int64; per-batch partial dedup of (orderkey,
    suppkey, late-any); ONE orderkey-bucketed reduce does both levels in
    pandas (pair max(late), then the ≥2-suppliers ∧ exactly-1-late gate),
    emitting the lone late suppkey; auto-sized count per supplier; s_name
    via the adaptive attach."""
    import pyarrow.compute as pc

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderstatus"],
                   filter_expr=pc.field("o_orderstatus") == pa.scalar("F"))

    def pack(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        day = df["o_orderdate"].to_numpy().astype("datetime64[D]").astype("int64")
        return pa.table({
            "o_orderkey": pa.array(df["o_orderkey"].to_numpy().astype("int64"),
                                   pa.int64()),
            "oday": pa.array(day, pa.int64())})

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    joined = B.attach(line, "l_orderkey",
                      orders.map_batches(pack, batch_format="pyarrow"),
                      "o_orderkey", "oday", "oday")

    def partial(df: pd.DataFrame) -> pa.Table:
        sday = df["l_shipdate"].to_numpy().astype("datetime64[D]").astype("int64")
        late = (sday > df["oday"].to_numpy() + 60).astype("int64")
        g = pd.DataFrame({"l_orderkey": df["l_orderkey"].astype("int64"),
                          "l_suppkey": df["l_suppkey"].astype("int64"),
                          "late": late}).groupby(
            ["l_orderkey", "l_suppkey"], as_index=False).max()
        return _pa_from_pandas(g.astype({"late": "int64"}))

    def lone_late(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["l_orderkey", "l_suppkey"], as_index=False)["late"].max()
        st = g.groupby("l_orderkey").agg(nsup=("l_suppkey", "size"),
                                         nlate=("late", "sum"))
        ok = st[(st["nsup"] >= 2) & (st["nlate"] == 1)].index
        out = g[g["l_orderkey"].isin(ok) & (g["late"] == 1)][["l_suppkey"]].copy()
        out["one"] = np.int64(1)
        return out.astype({"l_suppkey": "int64", "one": "int64"})

    hits = B.bucketed_map_groups(
        joined.map_batches(partial, batch_format="pandas"),
        ["l_orderkey"], lone_late)
    counts = B.grouped_aggregate_auto(
        hits, "l_suppkey", [Sum("one", alias_name="numwait")])
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    named = B.attach(counts, "l_suppkey", sup, "s_suppkey", "s_name", "s_name")
    out = named.to_pandas()[["s_name", "numwait"]]
    return out.sort_values("s_name").reset_index(drop=True).astype(
        {"numwait": "int64"})


def q_q22_idle_rich(sf_dir: str):
    """TPC-H Q22 shape (adapted: no c_phone — 'country code' is
    c_nationkey mod 5 in {0,2,3}; in this corpus every customer has orders,
    so the anti-join is against URGENT-priority orders): customers richer
    than the positive-balance average of their code group with no urgent
    order, counted + summed per code. The average threshold never becomes a
    float: the comparison cross-multiplies exact int64 cents
    (bal·cnt > total), mirrored verbatim in the SQL. The urgent-custkey
    side broadcasts as an exact sorted array (a Bloom filter at 100 TB, as
    q_customers_without_orders documents)."""
    import pyarrow.compute as pc
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        cc = (df["c_nationkey"].to_numpy().astype("int64") % 5)
        keep = np.isin(cc, (0, 2, 3))
        bal = np.floor(df["c_acctbal"].to_numpy() * 100.0 + 0.5).astype("int64")
        return pa.table({
            "c_custkey": pa.array(df["c_custkey"].to_numpy().astype("int64")[keep],
                                  pa.int64()),
            "cntrycode": pa.array(cc[keep], pa.int64()),
            "bal_cents": pa.array(bal[keep], pa.int64())})

    coded = cust.map_batches(prep, batch_format="pyarrow")

    def thr_partial(t: pa.Table) -> pa.Table:
        bal = t["bal_cents"].to_numpy()
        pos = bal[bal > 0]
        return pa.table({"k": pa.array([0], pa.int64()),
                         "tot": pa.array([int(pos.sum())], pa.int64()),
                         "cnt": pa.array([len(pos)], pa.int64())})

    thr = B.grouped_aggregate_small(
        coded.map_batches(thr_partial, batch_format="pyarrow"), "k",
        [Sum("tot", alias_name="tot"), Sum("cnt", alias_name="cnt")],
        key_domain=1).to_pandas()
    tot, cnt = int(thr["tot"].iloc[0]), int(thr["cnt"].iloc[0])

    urgent = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"],
              filter_expr=pc.field("o_orderpriority") == pa.scalar("1-URGENT"))
        .map_batches(lambda t: t.select(["o_custkey"]), batch_format="pyarrow")
        .unique("o_custkey"))
    keys_ref = ray.put(pa.array(sorted(urgent), pa.int64()))

    class Filter:
        def __init__(self):
            self.value_set = ray.get(keys_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            rich = pc.greater(pc.multiply(t["bal_cents"], pa.scalar(cnt, pa.int64())),
                              pa.scalar(tot, pa.int64()))
            no_urgent = pc.invert(pc.is_in(t["c_custkey"],
                                           value_set=self.value_set))
            kept = t.filter(pc.and_(rich, no_urgent))
            df = kept.to_pandas()
            g = df.groupby("cntrycode", as_index=False).agg(
                numcust=("c_custkey", "size"),
                totacctbal_cents=("bal_cents", "sum"))
            return _pa_from_pandas(g.astype({"numcust": "int64",
                                             "totacctbal_cents": "int64"}))

    return B.grouped_aggregate_auto(
        coded.map_batches(Filter, batch_format="pyarrow",
                          concurrency=_qpool(), num_cpus=0.5),
        "cntrycode",
        [Sum("numcust", alias_name="numcust"),
         Sum("totacctbal_cents", alias_name="totacctbal_cents")])


# ---------------------------------------------------------------------------
# Sequential / iterative shapes: integer EWMA + CUSUM recurrences over the
# calendar-bounded daily series, and unrolled integer PageRank / two-hop
# reach over the co-purchase graph. The recurrences reduce distributed to
# O(days) rows first (the driver scan is over a bounded calendar domain, not
# the data); the graph passes shuffle edge-sized frames only.
# ---------------------------------------------------------------------------

def q_ewma_daily_revenue(sf_dir: str):
    """Integer EWMA (α=1/2) over daily order revenue: e₀=r₀,
    e_t=(e_{t-1}+r_t)//2 in exact int64 cents. The distributed part reduces
    orders to one row per calendar day (auto-sized keyed aggregate); the
    recurrence itself is inherently sequential and runs on the driver over
    the O(days) frame — bounded by the calendar, not the data. Oracle is a
    recursive CTE with the same floor-halving recurrence."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        day = df["o_orderdate"].values.astype("datetime64[D]").astype(str)
        g = pd.DataFrame({"day": day,
                          "rev_cents": _cents(df["o_totalprice"])}).groupby(
            "day", as_index=False).sum()
        return _pa_from_pandas(g.astype({"rev_cents": "int64"}))

    daily = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pyarrow"), "day",
        [Sum("rev_cents", alias_name="rev_cents")]).to_pandas()
    daily = daily.sort_values("day").reset_index(drop=True)
    rev = daily["rev_cents"].to_numpy()
    ewma = np.empty(len(rev), dtype=np.int64)
    acc = 0
    for i, r in enumerate(rev):
        acc = int(r) if i == 0 else (acc + int(r)) // 2
        ewma[i] = acc
    daily["ewma_cents"] = ewma
    return daily.astype({"rev_cents": "int64", "ewma_cents": "int64"})


def q_cusum_daily_orders(sf_dir: str):
    """One-sided integer CUSUM changepoint score over daily order counts:
    s_t = max(0, s_{t-1} + x_t·1000 − k) with reference k = ⌊total·1000 /
    n_days⌋ (the global daily mean in milli-orders). Same structure as the
    EWMA: distributed day reduce, driver recurrence over the calendar-
    bounded frame, recursive-CTE oracle with GREATEST/// mirrored ops."""
    ds = _read(sf_dir, "orders", ["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        day = df["o_orderdate"].values.astype("datetime64[D]").astype(str)
        g = pd.DataFrame({"day": day}).groupby("day", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame(
            {"day": g["day"], "n_orders": g["size"].astype("int64")}))

    daily = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pyarrow"), "day",
        [Sum("n_orders", alias_name="n_orders")]).to_pandas()
    daily = daily.sort_values("day").reset_index(drop=True)
    x = daily["n_orders"].to_numpy().astype(np.int64)
    k = (int(x.sum()) * 1000) // len(x)
    cusum = np.empty(len(x), dtype=np.int64)
    s = 0
    for i, v in enumerate(x):
        s = max(0, s + int(v) * 1000 - k)
        cusum[i] = s
    daily["cusum_milli"] = cusum
    return daily.astype({"n_orders": "int64", "cusum_milli": "int64"})


def _copurchase_edges(sf_dir: str):
    """Directed edge list of the undirected co-purchase graph (each distinct
    part pair emitted both ways), materialized once — the pair base is
    bounded (≤21 pairs/order) and ≪ lineitem, and three consumers
    (degrees, rank iterations, hop expansions) re-read it."""
    from .queries import _copurchase_pair_counts

    pairs = _copurchase_pair_counts(sf_dir)

    def explode(df: pd.DataFrame) -> pa.Table:
        src = np.concatenate([df["part_a"].to_numpy(), df["part_b"].to_numpy()])
        dst = np.concatenate([df["part_b"].to_numpy(), df["part_a"].to_numpy()])
        return pa.table({"src": pa.array(src.astype("int64"), pa.int64()),
                         "dst": pa.array(dst.astype("int64"), pa.int64())})

    return pairs.map_batches(explode, batch_format="pandas").materialize()


def q_pagerank_2iter(sf_dir: str):
    """Two unrolled PageRank iterations over the co-purchase graph in exact
    integer ppm (d=0.85 as ·85//100, uniform s₀=10⁶): the canonical
    iterative-graph pattern as pure Ray Data — each iteration is ONE
    adaptive attach of the packed (score, degree) int64 onto edge sources
    plus one keyed sum by destination; nothing but node- and edge-sized
    frames ever shuffles. Packing bound: score·2²⁰+deg stays < 2⁶³ up to
    ~10⁶-degree hubs (documented here, asserted below)."""
    edges = _copurchase_edges(sf_dir)

    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("src", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame(
            {"src": g["src"].astype("int64"),
             "deg": g["size"].astype("int64")}))

    # the degree frame is node-sized and consumed twice (attach counts the
    # right side, then reads it) — materialize so no pass re-runs upstream
    deg = B.grouped_aggregate_auto(
        edges.map_batches(deg_partial, batch_format="pyarrow",
                          batch_size=None), "src",
        [Sum("deg", alias_name="deg")]).materialize()

    # deg_u rides along on every edge from here on: ONE adaptive attach
    # (broadcast at dimension size, bucketed beyond), instead of re-joining
    # per iteration
    edges2 = B.attach(edges, "src", deg, "src", "deg", "deg_u").materialize()

    def agg_score(partials) -> "rd.Dataset":
        sums = B.grouped_aggregate_auto(partials, "dst",
                                        [Sum("c", alias_name="c")])

        def score(df: pd.DataFrame) -> pa.Table:
            s = 150_000 + (85 * df["c"].to_numpy().astype("int64")) // 100
            return pa.table({"node": pa.array(df["dst"].to_numpy().astype("int64"),
                                              pa.int64()),
                             "s": pa.array(s, pa.int64())})

        return sums.map_batches(score, batch_format="pandas")

    def contrib0(df: pd.DataFrame) -> pa.Table:
        c = 1_000_000 // df["deg_u"].to_numpy().astype("int64")
        g = pd.DataFrame({"dst": df["dst"].astype("int64"),
                          "c": c}).groupby("dst", as_index=False).sum()
        return _pa_from_pandas(g.astype({"c": "int64"}))

    s1 = agg_score(edges2.map_batches(contrib0, batch_format="pandas",
                                      batch_size=None))
    att = B.attach(edges2, "src", s1.materialize(), "node", "s", "s_u")

    def contrib1(df: pd.DataFrame) -> pa.Table:
        c = (df["s_u"].to_numpy().astype("int64")
             // df["deg_u"].to_numpy().astype("int64"))
        g = pd.DataFrame({"dst": df["dst"].astype("int64"),
                          "c": c}).groupby("dst", as_index=False).sum()
        return _pa_from_pandas(g.astype({"c": "int64"}))

    s2 = agg_score(att.map_batches(contrib1, batch_format="pandas",
                                   batch_size=None))
    out = s2.to_pandas().rename(columns={"node": "part", "s": "pr_ppm"})
    return out.sort_values("part").reset_index(drop=True).astype(
        {"part": "int64", "pr_ppm": "int64"})


def q_two_hop_reach(sf_dir: str, n_seeds: int = 20):
    """Distinct nodes within ≤2 hops of each of the top-``n_seeds``
    highest-degree parts in the co-purchase graph (ties at the cut broken
    by part asc — the ORDER BY is total, so the LIMIT is deterministic).
    Plan: distributed degree reduce → distributed top-k for the seed set →
    hop-1 adjacency collected (bounded by Σdeg(seeds); at extreme hub
    degrees this frame would bucket by neighbor instead) and broadcast →
    hop-2 is a per-batch merge of edges against the broadcast hop-1 frame →
    bucketed (seed, nb) dedup → keyed count."""
    import ray

    edges = _copurchase_edges(sf_dir)

    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("src", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame(
            {"src": g["src"].astype("int64"),
             "deg": g["size"].astype("int64")}))

    deg = B.grouped_aggregate_auto(
        edges.map_batches(deg_partial, batch_format="pyarrow",
                          batch_size=None), "src",
        [Sum("deg", alias_name="deg")])
    seeds = (deg.sort(["deg", "src"], descending=[True, False])
             .limit(n_seeds).to_pandas())
    seed_set = set(seeds["src"].astype("int64"))

    hop1 = edges.map_batches(
        lambda df: pd.DataFrame(
            {"seed": df.loc[df["src"].isin(seed_set), "src"].astype("int64"),
             "nb": df.loc[df["src"].isin(seed_set), "dst"].astype("int64")}),
        batch_format="pandas").to_pandas()
    h1_ref = ray.put(hop1)

    def hop2(df: pd.DataFrame) -> pd.DataFrame:
        h1 = ray.get(h1_ref)
        m = df.merge(h1, left_on="src", right_on="nb")
        out = pd.DataFrame({"seed": m["seed"].astype("int64"),
                            "nb": m["dst"].astype("int64")}).drop_duplicates()
        return out

    reach = edges.map_batches(hop2, batch_format="pandas").union(
        rd.from_arrow(_pa_from_pandas(hop1)))

    def count_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates()
        b = b[b["nb"] != b["seed"]]
        g = b.groupby("seed", as_index=False).size()
        return pd.DataFrame({"part": g["seed"].astype("int64"),
                             "n_within_2": g["size"].astype("int64")})

    counted = B.bucketed_map_groups(reach, ["seed"], count_bucket,
                                    auto_parallelism=True)
    out = counted.to_pandas()
    return out.sort_values("part").reset_index(drop=True).astype(
        {"part": "int64", "n_within_2": "int64"})


# ---------------------------------------------------------------------------
# Embedding quantization / pair-distance + text hapax profiles
# ---------------------------------------------------------------------------

def q_embedding_quantize_error(sf_dir: str):
    """Symmetric int8 quantization error audit per label: each vector is
    quantized with its own scale 127/max|v| (round-half-up, clipped to
    ±127), reconstructed, and the per-element |v − q/scale| errors reduce
    to exact integer micro-units BEFORE any cross-row sum (floor per
    element → int64 Σ is order-independent). Zero vectors are skipped (no
    scale). Every float64 op (scale division, v·scale, clip on floats,
    q/scale, |diff|·10⁶) is one deterministic per-element sequence mirrored
    verbatim in the SQL. Batches flatten the list column to one numpy
    matrix — no per-row Python."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n_rows = len(col)
        dim = len(flat) // max(n_rows, 1)
        v = flat.reshape(n_rows, dim)
        mx = np.abs(v).max(axis=1)
        keep = mx > 0
        v = v[keep]
        scale = 127.0 / mx[keep]
        q = np.maximum(-127.0, np.minimum(127.0,
                                          np.floor(v * scale[:, None] + 0.5)))
        err = np.floor(np.abs(v - q / scale[:, None]) * 1_000_000.0
                       + 0.5).astype("int64")
        lab = t["label"].to_numpy(zero_copy_only=False).astype("int64")[keep]
        g = pd.DataFrame({"label": lab,
                          "n_vecs": np.ones(len(lab), dtype=np.int64),
                          "sum_err_micro": err.sum(axis=1),
                          "max_err_micro": err.max(axis=1)
                          if len(lab) else np.array([], dtype=np.int64)})
        g = g.groupby("label", as_index=False).agg(
            n_vecs=("n_vecs", "sum"), sum_err_micro=("sum_err_micro", "sum"),
            max_err_micro=("max_err_micro", "max"))
        return _pa_from_pandas(g.astype({c: "int64" for c in g.columns}))

    return B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pyarrow"), "label",
        [Sum("n_vecs", alias_name="n_vecs"),
         Sum("sum_err_micro", alias_name="sum_err_micro"),
         Max("max_err_micro", alias_name="max_err_micro")], key_domain=64)


def q_embedding_l2_pair_hist(sf_dir: str, offset: int = 100):
    """Histogram of exact squared L2 distances between vector i and vector
    i+offset (a deterministic pairing that probes embedding-space drift
    across the id axis). Elements quantize to int64 micro-units per element
    (exact both sides), so Σ(Δ²) is pure integer and the histogram bucket
    is d² // 10¹². The pairing is a keyed bucketed join: both sides ship
    (join_key, role, int64-blob) rows — never the whole table to one node —
    and each bucket pairs its keys vectorized via frombuffer+stack."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def sides(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n_rows = len(col)
        dim = len(flat) // max(n_rows, 1)
        q = np.floor(flat * 1_000_000.0 + 0.5).astype("int64").reshape(
            n_rows, dim)
        vid = t["vec_id"].to_numpy().astype("int64")
        blobs = [q[i].tobytes() for i in range(n_rows)]
        return pa.table({
            "k": pa.array(np.concatenate([vid, vid - offset]), pa.int64()),
            "role": pa.array(np.concatenate(
                [np.zeros(n_rows, np.int8), np.ones(n_rows, np.int8)])),
            "blob": pa.array(blobs + blobs, pa.binary())})

    def pair_bucket(b: pd.DataFrame) -> pd.DataFrame:
        a = b[b["role"] == 0][["k", "blob"]]
        c = b[b["role"] == 1][["k", "blob"]]
        m = a.merge(c, on="k", suffixes=("_a", "_b"))
        if not len(m):
            return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                 "n_pairs": pd.Series([], dtype="int64")})
        qa = np.stack([np.frombuffer(x, dtype=np.int64)
                       for x in m["blob_a"]])
        qb = np.stack([np.frombuffer(x, dtype=np.int64)
                       for x in m["blob_b"]])
        d2 = ((qa - qb) ** 2).sum(axis=1)
        g = pd.DataFrame({"bucket": d2 // 10 ** 12}).groupby(
            "bucket", as_index=False).size()
        return pd.DataFrame({"bucket": g["bucket"].astype("int64"),
                             "n_pairs": g["size"].astype("int64")})

    hist = B.bucketed_map_groups(
        ds.map_batches(sides, batch_format="pyarrow"), ["k"], pair_bucket,
        auto_parallelism=True)
    return B.grouped_aggregate_auto(
        hist, "bucket", [Sum("n_pairs", alias_name="n_pairs")])


def q_hapax_ratio_by_source(sf_dir: str):
    """Hapax-legomenon profile per source: vocabulary size, number of
    tokens occurring exactly once, and their ratio in integer basis points
    (hapax·10⁴ // vocab). Token frequency reduces per (source, token) with
    per-batch partials; the bucket shuffle caps at distinct (source,
    token) rows. Tokenizer matches the engine-wide [a-z0-9]+ convention."""
    ds = _read(sf_dir, "documents", ["source", "text"])

    def tok_partial(df: pd.DataFrame) -> pa.Table:
        toks = (df.assign(tok=df["text"].str.lower().str.findall(r"[a-z0-9]+"))
                [["source", "tok"]].explode("tok").dropna())
        g = toks.groupby(["source", "tok"], as_index=False).size().rename(
            columns={"size": "n"})
        return _pa_from_pandas(g.astype({"n": "int64"}))

    freq = B.grouped_aggregate_auto(
        ds.map_batches(tok_partial, batch_format="pandas"),
        ["source", "tok"], [Sum("n", alias_name="n")])

    def vocab_partial(df: pd.DataFrame) -> pa.Table:
        hap = (df["n"] == 1).to_numpy().astype("int64")
        g = pd.DataFrame({"source": df["source"],
                          "vocab": np.ones(len(df), dtype=np.int64),
                          "hapax": hap}).groupby("source", as_index=False).sum()
        return _pa_from_pandas(g.astype({"vocab": "int64", "hapax": "int64"}))

    agg = B.grouped_aggregate_small(
        freq.map_batches(vocab_partial, batch_format="pandas"), "source",
        [Sum("vocab", alias_name="vocab"), Sum("hapax", alias_name="hapax")],
        key_domain=32).to_pandas()
    agg["hapax_bps"] = (agg["hapax"] * 10_000) // agg["vocab"]
    return agg.astype({"vocab": "int64", "hapax": "int64",
                       "hapax_bps": "int64"})


# ---------------------------------------------------------------------------
# GROUPING SETS, exact trimmed mean, centered rolling median
# ---------------------------------------------------------------------------

def q_grouping_sets_revenue(sf_dir: str):
    """GROUPING SETS ((priority), (status), ()) over orders in one input
    pass: every batch emits partials for all three groupings (the rolled-up
    key coalesced to 'ALL'), and a single keyed reduce finishes all sets —
    the multi-set analog of the cube/rollup operators, with no per-set
    re-scan."""
    ds = _read(sf_dir, "orders",
               ["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pa.Table:
        cents = _cents(df["o_totalprice"])
        base = pd.DataFrame({"pri": df["o_orderpriority"],
                             "st": df["o_orderstatus"],
                             "n_orders": np.ones(len(df), dtype=np.int64),
                             "rev_cents": cents})
        by_pri = base.assign(st="ALL").groupby(["pri", "st"],
                                               as_index=False).sum()
        by_st = base.assign(pri="ALL").groupby(["pri", "st"],
                                               as_index=False).sum()
        total = base.assign(pri="ALL", st="ALL").groupby(
            ["pri", "st"], as_index=False).sum()
        out = pd.concat([by_pri, by_st, total], ignore_index=True)
        return _pa_from_pandas(out.astype({"n_orders": "int64",
                                           "rev_cents": "int64"}))

    return B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pandas"), ["pri", "st"],
        [Sum("n_orders", alias_name="n_orders"),
         Sum("rev_cents", alias_name="rev_cents")], key_domain=16)


def q_trimmed_mean_qty(sf_dir: str):
    """10%-trimmed mean of l_quantity per returnflag in exact integers.
    Quantities are integral with a tiny domain (1..50), so the distributed
    reduce is a counting sort — (flag, qty) partial counts, never raw rows —
    and the trim (drop the ⌊n/10⌋ smallest and largest BY VALUE; ties make
    the trimmed sum order-invariant) finishes on the O(flags·50) count
    frame. trimmed_mean_milli = trimmed_sum·1000 // kept."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(df: pd.DataFrame) -> pa.Table:
        g = pd.DataFrame({"l_returnflag": df["l_returnflag"],
                          "qty": df["l_quantity"].to_numpy().astype("int64")
                          }).groupby(["l_returnflag", "qty"],
                                     as_index=False).size()
        return _pa_from_pandas(pd.DataFrame(
            {"l_returnflag": g["l_returnflag"], "qty": g["qty"],
             "cnt": g["size"].astype("int64")}))

    counts = B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_returnflag", "qty"], [Sum("cnt", alias_name="cnt")],
        key_domain=256).to_pandas()

    rows = []
    for flag, grp in counts.groupby("l_returnflag"):
        grp = grp.sort_values("qty")
        c = grp["cnt"].to_numpy()
        q = grp["qty"].to_numpy()
        n = int(c.sum())
        k = n // 10
        cum = np.cumsum(c)
        # ranks 1..n ascending by value; keep ranks (k, n-k]
        kept = np.maximum(0, np.minimum(cum, n - k)
                          - np.maximum(np.concatenate(([0], cum[:-1])), k))
        tsum = int((q * kept).sum())
        rows.append({"l_returnflag": flag, "n": n, "trimmed_sum": tsum,
                     "trimmed_mean_milli": tsum * 1000 // (n - 2 * k)})
    out = pd.DataFrame(rows).sort_values("l_returnflag").reset_index(drop=True)
    return out.astype({"n": "int64", "trimmed_sum": "int64",
                       "trimmed_mean_milli": "int64"})


def q_rolling_median_daily_orders(sf_dir: str):
    """Centered 3-day rolling median (lower median, sorted[(n−1)//2] —
    QUANTILE_DISC parity) over the daily order-count series. Distributed
    day reduce first; the window scan runs on the driver over the
    calendar-bounded frame, like the EWMA/CUSUM recurrences."""
    ds = _read(sf_dir, "orders", ["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        day = df["o_orderdate"].values.astype("datetime64[D]").astype(str)
        g = pd.DataFrame({"day": day}).groupby("day", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame(
            {"day": g["day"], "n_orders": g["size"].astype("int64")}))

    daily = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pyarrow"), "day",
        [Sum("n_orders", alias_name="n_orders")]).to_pandas()
    daily = daily.sort_values("day").reset_index(drop=True)
    x = daily["n_orders"].to_numpy()
    med = np.empty(len(x), dtype=np.int64)
    for i in range(len(x)):
        w = np.sort(x[max(0, i - 1):i + 2])
        med[i] = w[(len(w) - 1) // 2]
    daily["med3"] = med
    return daily.astype({"n_orders": "int64", "med3": "int64"})


def q_q11_part_value(sf_dir: str):
    """TPC-H Q11 shape (adapted: part↔supplier value comes from lineitem
    extendedprice instead of the absent partsupp ps_supplycost·ps_availqty;
    the nation filter keeps suppliers of NATION_3): per-part summed value
    in cents for lines supplied by the nation's suppliers, keeping parts
    whose value exceeds 1/1000 of the nation total. Plan: the supplier set
    for one nation is tiny → broadcast membership filter inside the scan
    batches; per-batch partial sums by partkey; keyed reduce; the HAVING
    threshold needs the GLOBAL total, which is the sum of the already
    per-part-reduced frame — computed from the reduced (small) side, never
    a second pass over lineitem."""
    supf = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nat_sup = set(supf.loc[supf["s_nationkey"] == 3, "s_suppkey"].astype("int64"))

    line = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["l_suppkey"].isin(nat_sup)]
        df["value_cents"] = _cents(df["l_extendedprice"])
        g = df.groupby("l_partkey", as_index=False)["value_cents"].sum()
        return _pa_from_pandas(g.astype({"l_partkey": "int64",
                                         "value_cents": "int64"}))

    per_part = B.grouped_aggregate_auto(
        line.map_batches(partial, batch_format="pyarrow"), "l_partkey",
        [Sum("value_cents", alias_name="value_cents")]).to_pandas()
    total = int(per_part["value_cents"].sum())
    out = per_part[per_part["value_cents"] * 1000 > total]
    out = out.rename(columns={"l_partkey": "p_partkey"})
    return (out.astype({"p_partkey": "int64", "value_cents": "int64"})
            .sort_values("p_partkey").reset_index(drop=True))


def q_spearman_d2_brand(sf_dir: str):
    """Spearman rank-correlation numerator per brand over (price, qty),
    tie-robust: ranks are AVERAGE ranks doubled to stay integer
    (2·avg_rank = 2·RANK + tiecount − 1), so Σd² is independent of any
    tie-break order — the synthetic lineitem has duplicate
    (orderkey, linenumber) pairs, which makes ROW_NUMBER ranks
    nondeterministic across engines. ``sum_d2x4`` = Σ(2·Δavg_rank)² =
    4·Σd²; the caller derives ρ = 1 − 6·(sum_d2x4/4)/(n(n²−1)) without
    any float leaving the engine. Plan: part→brand is the small dimension
    side (adaptive attach); ranking needs every row of a brand co-located,
    so ONE keyed shuffle by brand with the ranks computed vectorized per
    sort partition. Partitioning assumption: rows-per-brand fits a reduce
    task (25 brands — salt-free); Σ(2d)² < 4n³ keeps int64 safe to ~1M
    rows/brand."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    line = _read(sf_dir, "lineitem",
                 ["l_partkey", "l_extendedprice", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.table({
            "l_partkey": pa.array(df["l_partkey"].to_numpy().astype("int64")),
            "price_cents": pa.array(_cents(df["l_extendedprice"])),
            "qty": pa.array(df["l_quantity"].to_numpy().astype("int64"))})

    tagged = B.attach(line.map_batches(prep, batch_format="pyarrow"),
                      "l_partkey", part, "p_partkey", "p_brand", "p_brand")

    def rank_d2(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        for brand, g in b.groupby("p_brand", sort=False):
            n = len(g)
            # average ranks ×2: multiples of 0.5 are exact in float64 up to
            # 2^52, so the doubled values round-trip to int64 exactly
            rp = (g["price_cents"].rank(method="average").to_numpy() * 2.0)
            rq = (g["qty"].rank(method="average").to_numpy() * 2.0)
            d = rp.astype(np.int64) - rq.astype(np.int64)
            out.append((brand, n, int(np.dot(d, d))))
        return pd.DataFrame(out, columns=["p_brand", "n", "sum_d2x4"]).astype(
            {"n": "int64", "sum_d2x4": "int64"})

    return B.bucketed_map_groups(tagged, ["p_brand"], rank_d2)


def q_hoover_index_spend(sf_dir: str):
    """Hoover (Robin Hood) inequality index of customer spend per nation,
    in exact ppm: Σ|n·xᵢ − S| · 10⁶ // (2·n·S) over per-customer cents
    totals xᵢ. Plan: distributed per-customer spend reduce → broadcast
    nationkey attach → small per-nation (n, S) aggregate broadcast back →
    one more pass computing the |n·x − S| partial sums per nation. The
    final ·10⁶ division runs in Python ints on the 25-row frame (the
    numerator·10⁶ exceeds int64 at bench scale; per-batch partials stay
    int64-safe to ~10⁹ customers/nation)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat_of = dict(zip(cust["c_custkey"].astype("int64"),
                      cust["c_nationkey"].astype("int64")))

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["spend_cents"] = _cents(df["o_totalprice"])
        g = df.groupby("o_custkey", as_index=False)["spend_cents"].sum()
        return _pa_from_pandas(g.astype({"o_custkey": "int64",
                                         "spend_cents": "int64"}))

    spend = B.grouped_aggregate_auto(
        orders.map_batches(partial, batch_format="pyarrow"), "o_custkey",
        [Sum("spend_cents", alias_name="spend_cents")])

    def tag_nation(df: pd.DataFrame) -> pd.DataFrame:
        df["nationkey"] = df["o_custkey"].map(nat_of).astype("int64")
        return df

    tagged = spend.map_batches(tag_nation, batch_format="pandas")
    ns = B.grouped_aggregate_auto(
        tagged, "nationkey",
        [Count(alias_name="n"), Sum("spend_cents", alias_name="s")]).to_pandas()
    n_of = dict(zip(ns["nationkey"].astype("int64"), ns["n"].astype("int64")))
    s_of = dict(zip(ns["nationkey"].astype("int64"), ns["s"].astype("int64")))

    def dev_partial(df: pd.DataFrame) -> pd.DataFrame:
        nk = df["nationkey"].to_numpy()
        x = df["spend_cents"].to_numpy()
        n = np.array([n_of[k] for k in nk], dtype=np.int64)
        s = np.array([s_of[k] for k in nk], dtype=np.int64)
        dev = np.abs(n * x - s)
        g = (pd.DataFrame({"nationkey": nk, "dev": dev})
             .groupby("nationkey", as_index=False)["dev"].sum())
        return g.astype({"nationkey": "int64", "dev": "int64"})

    dev = B.grouped_aggregate_auto(
        tagged.map_batches(dev_partial, batch_format="pandas"), "nationkey",
        [Sum("dev", alias_name="dev")]).to_pandas()
    dev = dev.sort_values("nationkey").reset_index(drop=True)
    ppm = [int(d) * 1_000_000 // (2 * n_of[int(k)] * s_of[int(k)])
           for k, d in zip(dev["nationkey"], dev["dev"])]
    return pd.DataFrame({
        "nationkey": dev["nationkey"].astype("int64"),
        "n": [n_of[int(k)] for k in dev["nationkey"]],
        "spend_cents": [s_of[int(k)] for k in dev["nationkey"]],
        "hoover_ppm": ppm}).astype({"n": "int64", "spend_cents": "int64",
                                    "hoover_ppm": "int64"})


def q_second_third_order(sf_dir: str):
    """nth_value window shape: for customers with ≥3 orders, the cents
    totalprice of their 2nd and 3rd orders in (o_orderdate, o_orderkey)
    order. Per-batch partial keeps ≤3 earliest rows per customer, so the
    keyed shuffle moves ≤3·batches rows per key, never the raw table."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice",
                                  "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["cents"] = _cents(df["o_totalprice"])
        df["day"] = df["o_orderdate"].values.astype("datetime64[D]").astype(str)
        df = df[["o_custkey", "o_orderkey", "day", "cents"]]
        df = df.sort_values(["o_custkey", "day", "o_orderkey"], kind="stable")
        # keep 3 per (customer, batch) — enough to reconstruct global 2nd/3rd
        # ONLY after the keyed reduce sees all batches' survivors
        return _pa_from_pandas(df.groupby("o_custkey", sort=False).head(3)
                               .astype({"o_custkey": "int64",
                                        "o_orderkey": "int64",
                                        "cents": "int64"}))

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["o_custkey", "day", "o_orderkey"], kind="stable")
        g = b.groupby("o_custkey", sort=False)
        b = b[g.cumcount() < 3]
        cnt = b.groupby("o_custkey", sort=False).size()
        full = cnt[cnt >= 3].index
        b = b[b["o_custkey"].isin(full)]
        rn = b.groupby("o_custkey", sort=False).cumcount()
        second = b[rn == 1][["o_custkey", "cents"]].rename(
            columns={"cents": "second_cents"})
        third = b[rn == 2][["o_custkey", "cents"]].rename(
            columns={"cents": "third_cents"})
        return second.merge(third, on="o_custkey").astype(
            {"o_custkey": "int64", "second_cents": "int64",
             "third_cents": "int64"})

    return B.bucketed_map_groups(
        ds.map_batches(partial, batch_format="pyarrow"), ["o_custkey"], pick)


def q_brand_top3_names(sf_dir: str):
    """Ordered list-concat aggregate (STRING_AGG … ORDER BY parity): per
    brand, the '|'-joined top-3 part names by (retail cents desc,
    p_partkey asc). Per-batch partial top-3 bounds the shuffle at
    3 rows/brand/batch; the reduce re-sorts survivors and joins in rank
    order — an order-sensitive aggregate Ray's Sum/Min/Max can't express."""
    ds = _read(sf_dir, "part", ["p_brand", "p_name", "p_partkey",
                                "p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["retail_cents"] = _cents(df["p_retailprice"])
        df = df.sort_values(["p_brand", "retail_cents", "p_partkey"],
                            ascending=[True, False, True], kind="stable")
        return _pa_from_pandas(
            df.groupby("p_brand", sort=False).head(3)
            [["p_brand", "p_name", "p_partkey", "retail_cents"]]
            .astype({"p_partkey": "int64", "retail_cents": "int64"}))

    def join3(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["p_brand", "retail_cents", "p_partkey"],
                          ascending=[True, False, True], kind="stable")
        b = b[b.groupby("p_brand", sort=False).cumcount() < 3]
        g = b.groupby("p_brand", sort=False)["p_name"].agg("|".join)
        return g.reset_index().rename(columns={"p_name": "top3_names"})

    return B.bucketed_map_groups(
        ds.map_batches(partial, batch_format="pyarrow"), ["p_brand"], join3)


def q_q2_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape (adapted: no partsupp, so per-(part, supplier) cost
    is the summed lineitem extendedprice; region filter keeps REGION_1's
    suppliers, part filter 10 ≤ p_size ≤ 20): for each qualifying part,
    the cheapest regional supplier — the correlated-MIN-then-join-back
    shape. Plan: supplier∪nation is the tiny dimension side → broadcast
    both the regional-supplier set (scan filter) and the name lookups
    (final decorate); ONE distributed keyed reduce builds (part, supp) →
    cents, then a part-keyed bucketed argmin picks the winner — the
    correlated subquery never re-scans the fact table."""
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name",
                                   "n_regionkey"]).to_pandas()
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name",
                                     "s_nationkey"]).to_pandas()
    reg_nations = set(nat.loc[nat["n_regionkey"] == 1,
                              "n_nationkey"].astype("int64"))
    sup = sup[sup["s_nationkey"].astype("int64").isin(reg_nations)]
    reg_sups = set(sup["s_suppkey"].astype("int64"))
    s_name = dict(zip(sup["s_suppkey"].astype("int64"), sup["s_name"]))
    n_of_s = dict(zip(sup["s_suppkey"].astype("int64"),
                      sup["s_nationkey"].astype("int64")))
    n_name = dict(zip(nat["n_nationkey"].astype("int64"), nat["n_name"]))

    part = _read(sf_dir, "part", ["p_partkey", "p_size"]).to_pandas()
    ok_parts = set(part.loc[(part["p_size"] >= 10) & (part["p_size"] <= 20),
                            "p_partkey"].astype("int64"))

    line = _read(sf_dir, "lineitem",
                 ["l_partkey", "l_suppkey", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["l_suppkey"].isin(reg_sups)
                & df["l_partkey"].isin(ok_parts)]
        df["cents"] = _cents(df["l_extendedprice"])
        g = df.groupby(["l_partkey", "l_suppkey"], as_index=False)[
            "cents"].sum()
        return _pa_from_pandas(g.astype({"l_partkey": "int64",
                                         "l_suppkey": "int64",
                                         "cents": "int64"}))

    ps = B.grouped_aggregate_auto(
        line.map_batches(partial, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"], [Sum("cents", alias_name="cents")])

    def argmin_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["l_partkey", "cents", "l_suppkey"], kind="stable")
        w = b.groupby("l_partkey", sort=False).head(1).copy()
        w["s_name"] = w["l_suppkey"].map(s_name)
        w["n_name"] = w["l_suppkey"].map(n_of_s).map(n_name)
        w = w.rename(columns={"l_partkey": "p_partkey",
                              "l_suppkey": "s_suppkey",
                              "cents": "min_cents"})
        return w[["p_partkey", "s_suppkey", "s_name", "n_name", "min_cents"]]

    return B.bucketed_map_groups(ps, ["l_partkey"], argmin_bucket)


def q_q20_excess_suppliers(sf_dir: str):
    """TPC-H Q20 shape (adapted: "availqty > half of shipped qty" becomes
    "this supplier alone shipped MORE than an eighth of the part's total
    quantity" — the synthetic data spreads each part over ~9-100 suppliers
    as sf grows, so half/quarter dominance selects nothing beyond the
    smallest sf): suppliers dominating ≥1 'red' part.
    Plan: part-name filter broadcast into the scan; keyed reduce to
    (part, supp) → qty; the per-part total is a SECOND reduce over the
    already-shrunk frame (never a second fact-table pass); the total
    re-attaches by part key (auto broadcast/shuffle); the survivor
    supplier set is distinct-reduced and name-decorated from the
    broadcast dimension."""
    part = _read(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()
    red_parts = set(
        part.loc[part["p_name"].str.contains("red", regex=False),
                 "p_partkey"].astype("int64"))
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    s_name = dict(zip(sup["s_suppkey"].astype("int64"), sup["s_name"]))

    line = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["l_partkey"].isin(red_parts)]
        df["qty"] = df["l_quantity"].to_numpy().astype("int64")
        g = df.groupby(["l_partkey", "l_suppkey"], as_index=False)[
            "qty"].sum()
        return _pa_from_pandas(g.astype({"l_partkey": "int64",
                                         "l_suppkey": "int64",
                                         "qty": "int64"}))

    ps = B.grouped_aggregate_auto(
        line.map_batches(partial, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"], [Sum("qty", alias_name="qty")]
    ).materialize()
    tot = B.grouped_aggregate_auto(ps, "l_partkey",
                                   [Sum("qty", alias_name="total_qty")])
    joined = B.attach(ps, "l_partkey", tot, "l_partkey",
                      "total_qty", "total_qty")

    def survivors(df: pd.DataFrame) -> pd.DataFrame:
        # (part, supp) rows are already globally distinct post-reduce, so
        # one output row == one dominated part; Count() then counts parts
        w = df[8 * df["qty"] > df["total_qty"]]
        return pd.DataFrame({"s_suppkey": w["l_suppkey"].to_numpy()
                             .astype("int64")})

    dominant = B.grouped_aggregate_auto(
        joined.map_batches(survivors, batch_format="pandas"),
        "s_suppkey", [Count(alias_name="n_parts_dominated")]).to_pandas()
    dominant["s_name"] = dominant["s_suppkey"].map(s_name)
    return (dominant[["s_suppkey", "s_name", "n_parts_dominated"]]
            .astype({"s_suppkey": "int64", "n_parts_dominated": "int64"})
            .sort_values("s_suppkey").reset_index(drop=True))


def _strict_inversions(a: np.ndarray) -> int:
    """Exact strict-inversion count (#pairs i<j with a[i] > a[j]) via
    vectorized divide-and-conquer: leaves count by an O(k²) dominance
    matrix (k ≤ 256), cross terms by ``searchsorted`` of the sorted right
    half against the sorted left half — O(n log² n), no per-row Python."""
    n = a.size
    if n <= 256:
        if n < 2:
            return 0
        return int(np.triu(a[:, None] > a[None, :], k=1).sum())
    mid = n // 2
    left, right = a[:mid], a[mid:]
    inv = _strict_inversions(left) + _strict_inversions(right)
    sl, sr = np.sort(left), np.sort(right)
    inv += int((sl.size - np.searchsorted(sl, sr, side="right")).sum())
    return inv


def q_inversion_count_brand(sf_dir: str):
    """Kendall-discordance per brand: the number of unordered line pairs
    where price and quantity rank in OPPOSITE directions (strictly), which
    is tie-robust and order-independent — after sorting by (price asc,
    qty asc) it equals the strict inversion count of the qty sequence
    (equal-price pairs sort qty-ascending and so contribute zero). Engine
    counts inversions in O(n log² n) via :func:`_strict_inversions`; the
    oracle pays the O(n²) self-join — the point of the operator. ONE
    brand-keyed shuffle; partitioning assumption: one brand's lines fit a
    reduce task (25 brands, ~n/25 rows each; salt-free)."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    line = _read(sf_dir, "lineitem",
                 ["l_partkey", "l_extendedprice", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.table({
            "l_partkey": pa.array(df["l_partkey"].to_numpy().astype("int64")),
            "price_cents": pa.array(_cents(df["l_extendedprice"])),
            "qty": pa.array(df["l_quantity"].to_numpy().astype("int64"))})

    tagged = B.attach(line.map_batches(prep, batch_format="pyarrow"),
                      "l_partkey", part, "p_partkey", "p_brand", "p_brand")

    def per_brand(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        for brand, g in b.groupby("p_brand", sort=False):
            g = g.sort_values(["price_cents", "qty"], kind="stable")
            out.append((brand, len(g),
                        _strict_inversions(g["qty"].to_numpy())))
        return pd.DataFrame(out, columns=["p_brand", "n_rows", "discordant"]
                            ).astype({"n_rows": "int64",
                                      "discordant": "int64"})

    return B.bucketed_map_groups(tagged, ["p_brand"], per_brand)


def q_mannwhitney_u_value(sf_dir: str):
    """Mann–Whitney U between 'click' and 'purchase' event values,
    tie-corrected and integer-exact: with doubled average ranks
    (2·avgrank(v) = 2·count_less(v) + count_eq(v) + 1 over the pooled
    sample), ``r1_x2`` = Σ 2·avgrank over clicks and ``u1_x2`` =
    2·U₁ = r1_x2 − n₁(n₁+1). Plan: ONE keyed reduce collapses the fact
    stream to the distinct-value histogram (value_cents → per-type
    counts); the rank arithmetic runs on that value-domain frame — a
    cumulative sum over ~|distinct values| rows, never over events.
    Partitioning assumption: the distinct value domain (bounded by the
    cents range) fits one node; at a wider domain the cumsum becomes a
    prefix-scan over sorted blocks."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["event_type"].isin(("click", "purchase"))]
        v = _cents(df["value"])
        is_click = (df["event_type"].to_numpy() == "click")
        g = pd.DataFrame({"v": v,
                          "n_click": is_click.astype("int64"),
                          "n_purch": (~is_click).astype("int64")})
        g = g.groupby("v", as_index=False).sum()
        return _pa_from_pandas(g.astype({"v": "int64", "n_click": "int64",
                                         "n_purch": "int64"}))

    hist = B.grouped_aggregate_auto(
        ev.map_batches(partial, batch_format="pyarrow"), "v",
        [Sum("n_click", alias_name="n_click"),
         Sum("n_purch", alias_name="n_purch")]).to_pandas()
    hist = hist.sort_values("v").reset_index(drop=True)
    ce = hist["n_click"].to_numpy() + hist["n_purch"].to_numpy()
    cl = np.concatenate(([0], np.cumsum(ce)[:-1]))
    rank2 = 2 * cl + ce + 1
    n1 = int(hist["n_click"].sum())
    n2 = int(hist["n_purch"].sum())
    r1_x2 = int(np.dot(hist["n_click"].to_numpy(), rank2))
    return pd.DataFrame({"n_click": [n1], "n_purchase": [n2],
                         "r1_x2": [r1_x2],
                         "u1_x2": [r1_x2 - n1 * (n1 + 1)]}).astype("int64")


# ---------------------------------------------------------------------------
# Calendar arithmetic — business-day delay (closed-form weekday count)
# ---------------------------------------------------------------------------

def _weekday_prefix(m: np.ndarray) -> np.ndarray:
    """W(m) = number of Mon–Fri days in [origin, origin+m] where the origin
    is 1969-12-29 (a Monday) and m >= 0. Closed form — no calendar tables,
    so the per-line kernel is three vector ops and the SQL oracle is the
    literal same integer formula (no generate_series blowup)."""
    return 5 * (m // 7) + np.minimum(m % 7 + 1, 5)


def q_bizday_ship_delay_hist(sf_dir: str):
    """Business-day ship latency histogram: for every lineitem, the count of
    Mon–Fri days in (o_orderdate, l_shipdate] — the SLA metric an ops
    dashboard buckets (calendar-day delays overstate latency across
    weekends). Plan: orders' (orderkey → epoch-day) is attached to lineitem
    with the adaptive broadcast/bucketed join; the weekday count is the
    closed-form prefix difference W(ship) − W(order) (exact int64,
    vectorized), and only O(distinct delays) partial counts leave each
    batch."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def okey_days(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _pa_from_pandas(pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            # +3: epoch day 0 is a Thursday; shift so day 0 is the Monday
            # origin 1969-12-29 (dates here are all >= 1992 so m >= 0)
            "ma": df["o_orderdate"].values.astype("datetime64[D]")
                  .astype("int64") + 3,
        }))

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def ship_days(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _pa_from_pandas(pd.DataFrame({
            "l_orderkey": df["l_orderkey"].astype("int64"),
            "mb": df["l_shipdate"].values.astype("datetime64[D]")
                  .astype("int64") + 3,
        }))

    joined = B.attach(
        line.map_batches(ship_days, batch_format="pyarrow"), "l_orderkey",
        orders.map_batches(okey_days, batch_format="pyarrow"), "o_orderkey",
        "ma", "ma")

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        biz = (_weekday_prefix(df["mb"].to_numpy())
               - _weekday_prefix(df["ma"].to_numpy()))
        g = pd.DataFrame({"bizdays": biz}).groupby(
            "bizdays", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "bizdays": g["bizdays"].astype("int64"),
            "n_lines": g["size"].astype("int64")}))

    return B.grouped_aggregate_auto(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["bizdays"], [Sum("n_lines", alias_name="n_lines")])


# ---------------------------------------------------------------------------
# Sweep line — peak concurrent active-customer intervals
# ---------------------------------------------------------------------------

def q_peak_active_customers(sf_dir: str):
    """Peak concurrency of customer activity intervals: each customer is
    'active' from their first to their last order date (inclusive); the
    answer is the max number of simultaneously active customers and the
    FIRST day that peak is reached — the classic sweep-line / interval
    overlap operator. Plan: keyed (custkey) min/max reduce builds the
    intervals; each interval emits two boundary deltas (+1 at start, −1 the
    day after end) that a second keyed reduce collapses to O(distinct days)
    rows; only that day-indexed delta series reaches the driver for the
    inherently sequential prefix-sum scan (≈2.5k rows regardless of order
    count)."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def span_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["d"] = df["o_orderdate"].values.astype("datetime64[D]").astype("int64")
        g = df.groupby("o_custkey", as_index=False).agg(
            a=("d", "min"), b=("d", "max"))
        return _pa_from_pandas(g.astype("int64"))

    iv = B.grouped_aggregate_auto(
        ds.map_batches(span_partial, batch_format="pyarrow"), ["o_custkey"],
        [Min("a", alias_name="a"), Max("b", alias_name="b")])

    def deltas(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        day = np.concatenate([df["a"].to_numpy(), df["b"].to_numpy() + 1])
        delta = np.concatenate([np.ones(len(df), dtype=np.int64),
                                -np.ones(len(df), dtype=np.int64)])
        g = pd.DataFrame({"day": day, "delta": delta}).groupby(
            "day", as_index=False)["delta"].sum()
        return _pa_from_pandas(g.astype("int64"))

    s = B.grouped_aggregate_auto(
        iv.map_batches(deltas, batch_format="pyarrow"), ["day"],
        [Sum("delta", alias_name="delta")]).to_pandas()
    s = s.sort_values("day").reset_index(drop=True)
    conc = s["delta"].to_numpy().cumsum()
    peak = int(conc.max())
    first = int(s["day"].to_numpy()[int(np.argmax(conc == peak))])
    day_str = str(np.int64(first).astype("datetime64[D]"))
    return pd.DataFrame({"peak": pd.Series([peak], dtype="int64"),
                         "peak_day": [day_str]})


# ---------------------------------------------------------------------------
# Gaps-and-islands — longest strictly-increasing spend run per customer
# ---------------------------------------------------------------------------

def q_increasing_run_hist(sf_dir: str):
    """Histogram (over customers) of the longest strictly-increasing run of
    order totals in each customer's order sequence ordered by
    (o_orderdate, o_orderkey) — the gaps-and-islands window pattern (LAG →
    break flag → running island id → island length). Plan: the sequence
    semantics need all of a customer's orders co-located, so one bucketed
    shuffle by custkey; inside each bucket the island arithmetic is fully
    vectorized across ALL customers at once (cross-customer boundaries are
    just forced breaks); only one (custkey, max_run) row per customer
    leaves, and the final histogram reduce is O(distinct run lengths)."""
    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _pa_from_pandas(pd.DataFrame({
            "o_custkey": df["o_custkey"].astype("int64"),
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "d": df["o_orderdate"].values.astype("datetime64[D]").astype("int64"),
            "cents": _cents(df["o_totalprice"]),
        }))

    def runs_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["o_custkey", "d", "o_orderkey"], kind="stable")
        cust = b["o_custkey"].to_numpy()
        cents = b["cents"].to_numpy()
        same = np.concatenate(([False], cust[1:] == cust[:-1]))
        inc = np.concatenate(([False], cents[1:] > cents[:-1])) & same
        rid = np.cumsum(~inc)
        rl = pd.DataFrame({"cust": cust, "rid": rid}).groupby(
            "rid", sort=False).agg(cust=("cust", "first"), n=("cust", "size"))
        mx = rl.groupby("cust", sort=False)["n"].max()
        return pd.DataFrame({"max_run": mx.to_numpy().astype("int64")})

    per_cust = B.bucketed_map_groups(
        ds.map_batches(prep, batch_format="pyarrow"), ["o_custkey"],
        runs_bucket)

    def hist_partial(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("max_run", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "max_run": g["max_run"].astype("int64"),
            "n_customers": g["size"].astype("int64")}))

    return B.grouped_aggregate_auto(
        per_cust.map_batches(hist_partial, batch_format="pyarrow"),
        ["max_run"], [Sum("n_customers", alias_name="n_customers")])


# ---------------------------------------------------------------------------
# Pointwise mutual information — top bigram collocations (exact rational)
# ---------------------------------------------------------------------------

def q_token_pmi_top(sf_dir: str, k: int = 20, min_support: int = 5):
    """Top-k bigram collocations over the document corpus by pointwise
    mutual information, as the EXACT scaled rational
    pmi_ppm = ⌊c_xy · N_uni² · 10⁶ / (N_bi · c_x · c_y)⌋ (the PMI ratio
    before the log — monotone in PMI, so the ranking is identical and the
    arithmetic is exact integers on both sides; Python ints here, HUGEINT
    in the oracle). Plan: two distributed count reduces (unigrams, bigrams)
    with per-batch combiners; the min-support filter shrinks bigrams to the
    collocation candidates BEFORE anything reaches the driver, and only
    unigram rows for tokens appearing in a surviving candidate are
    collected (broadcast membership filter — at corpus scale the candidate
    set, not the vocabulary, bounds driver memory)."""
    import ray

    ds = _read(sf_dir, "documents", ["text"])

    def uni_partial(t: pa.Table) -> pa.Table:
        toks = (t.to_pandas()["text"].str.lower()
                .str.findall(r"[a-z0-9]+").explode().dropna())
        g = toks.value_counts()
        return _pa_from_pandas(pd.DataFrame({
            "tok": g.index.to_numpy(), "cn": g.to_numpy().astype("int64")}))

    uni = B.grouped_aggregate_auto(
        ds.map_batches(uni_partial, batch_format="pyarrow"), ["tok"],
        [Sum("cn", alias_name="cn")])

    def bi_partial(t: pa.Table) -> pa.Table:
        toks = (t.to_pandas()["text"].str.lower()
                .str.findall(r"[a-z0-9]+").explode().dropna())
        row = toks.index.to_numpy()
        tok = toks.to_numpy()
        m = row[1:] == row[:-1]
        g = pd.DataFrame({"bigram": tok[:-1][m] + " " + tok[1:][m]}) \
            .groupby("bigram", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "bigram": g["bigram"], "n": g["size"].astype("int64")}))

    big = B.grouped_aggregate_auto(
        ds.map_batches(bi_partial, batch_format="pyarrow"), ["bigram"],
        [Sum("n", alias_name="n")])

    # materialize the two REDUCED frames (vocab-sized, not corpus-sized) so
    # the totals + filters below don't re-execute the corpus scan per use
    uni = uni.materialize()
    big = big.materialize()
    n_uni = int(uni.sum("cn"))
    n_bi = int(big.sum("n"))

    import pyarrow.compute as pc

    cand = big.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], min_support)),
        batch_format="pyarrow").to_pandas()

    need = set()
    for bg in cand["bigram"]:
        x, y = bg.split(" ")
        need.add(x)
        need.add(y)
    need_ref = ray.put(need)

    def keep_needed(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        wanted = ray.get(need_ref)
        return _pa_from_pandas(df[df["tok"].isin(wanted)])

    cn = (uni.map_batches(keep_needed, batch_format="pyarrow")
          .to_pandas().set_index("tok")["cn"].to_dict())

    scores = []
    for bg, n in zip(cand["bigram"], cand["n"]):
        x, y = bg.split(" ")
        ppm = (int(n) * n_uni * n_uni * 10**6) // (n_bi * cn[x] * cn[y])
        scores.append((bg, int(n), ppm))
    scores.sort(key=lambda r: (-r[2], r[0]))
    top = scores[:k]
    return pd.DataFrame({
        "bigram": [r[0] for r in top],
        "n": pd.Series([r[1] for r in top], dtype="int64"),
        "pmi_ppm": pd.Series([r[2] for r in top], dtype="int64"),
        "rk": pd.Series(range(1, len(top) + 1), dtype="int64")})


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation of the daily order series (exact integer form)
# ---------------------------------------------------------------------------

def q_autocorr_daily_orders(sf_dir: str):
    """Lag-1 autocorrelation of the daily order-count series in exact
    integers: with x the per-day counts (observed days, ascending), S = Σx,
    n = #days, report ⌊10⁶ · Σ_{t≥2}(n·x_t−S)(n·x_{t−1}−S) /
    Σ_t(n·x_t−S)²⌋ — the n²-scaled centered products make every term an
    integer, so both sides agree bit-for-bit (Python ints here; HUGEINT +
    a floor-consistent remainder trick in the oracle, since DuckDB's ``//``
    truncates while Python floors and the numerator can be negative).
    Plan: the only distributed work is the day-count reduce; the O(n_days)
    recurrence-free scan runs on the driver like the EWMA/CUSUM family."""
    ds = _read(sf_dir, "orders", ["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        day = (t.to_pandas()["o_orderdate"].values
               .astype("datetime64[D]").astype("int64"))
        g = pd.DataFrame({"day": day}).groupby("day", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "day": g["day"].astype("int64"),
            "x": g["size"].astype("int64")}))

    daily = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pyarrow"), ["day"],
        [Sum("x", alias_name="x")]).to_pandas()
    daily = daily.sort_values("day").reset_index(drop=True)
    x = [int(v) for v in daily["x"]]
    n = len(x)
    s = sum(x)
    c = [n * v - s for v in x]
    num = sum(c[t] * c[t - 1] for t in range(1, n))
    den = sum(v * v for v in c)
    return pd.DataFrame({
        "n_days": pd.Series([n], dtype="int64"),
        "autocorr_ppm": pd.Series([(num * 10**6) // den], dtype="int64")})


def q_moment3_qty_by_flag(sf_dir: str):
    """Exact third central moment of l_quantity per return flag, reported as
    the integer numerator n²·Σ(x−μ)³·n = n²Σx³ − 3nΣxΣx² + 2(Σx)³ (VARCHAR —
    it exceeds int64 at warehouse scale; the oracle computes the same value
    in HUGEINT). The distributed shape is the moment-sketch pattern every
    higher-moment statistic uses at 100 TB: each batch emits one
    (n, Σx, Σx², Σx³) partial per key, the keyed reduce adds them, and the
    closed-form combination runs once on O(#flags) rows — no re-scan, no
    sort, exactly one small shuffle."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        x = df["l_quantity"].astype("int64")
        g = pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "n": 1, "s1": x, "s2": x * x, "s3": x * x * x,
        }).groupby("l_returnflag", as_index=False).sum()
        return _pa_from_pandas(g)

    agg = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pyarrow"), ["l_returnflag"],
        [Sum("n", alias_name="n"), Sum("s1", alias_name="s1"),
         Sum("s2", alias_name="s2"), Sum("s3", alias_name="s3")]).to_pandas()
    agg = agg.sort_values("l_returnflag").reset_index(drop=True)
    m3 = [
        str(n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3)
        for n, s1, s2, s3 in zip(
            (int(v) for v in agg["n"]), (int(v) for v in agg["s1"]),
            (int(v) for v in agg["s2"]), (int(v) for v in agg["s3"]))
    ]
    return pd.DataFrame({
        "l_returnflag": agg["l_returnflag"],
        "n": agg["n"].astype("int64"),
        "m3_num": pd.Series(m3, dtype="object"),
    })


def q_price_point_islands(sf_dir: str):
    """Gaps-and-islands over the SET of observed floor-dollar order price
    points (cents // 100): how many contiguous dollar runs the order book
    covers, and how many interior dollar points are missing. The islands
    count never sorts: a point k starts an island iff k−1 is absent, so the
    engine unions (k → has_self) with (k+1 → has_pred) tagged rows, reduces
    per point with one keyed shuffle, and counts heads — the shifted
    semi-join trick that replaces LAG-over-ordered-stream at any scale.
    Per-batch distinct shrinks the exchange to unique points first."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def tag(t: pa.Table) -> pa.Table:
        pts = np.unique(_cents(t.to_pandas()["o_totalprice"]) // 100)
        return _pa_from_pandas(pd.DataFrame({
            "point": np.concatenate([pts, pts + 1]),
            "has_self": np.concatenate(
                [np.ones(len(pts), "int64"), np.zeros(len(pts), "int64")]),
            "has_pred": np.concatenate(
                [np.zeros(len(pts), "int64"), np.ones(len(pts), "int64")]),
        }))

    agg = B.grouped_aggregate_auto(
        ds.map_batches(tag, batch_format="pyarrow"), ["point"],
        [Sum("has_self", alias_name="has_self"),
         Sum("has_pred", alias_name="has_pred")])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        real = df[df["has_self"] > 0]
        if not len(real):
            return pd.DataFrame({"n_points": pd.Series([], dtype="int64"),
                                 "n_islands": pd.Series([], dtype="int64"),
                                 "min_point": pd.Series([], dtype="int64"),
                                 "max_point": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "n_points": pd.Series([len(real)], dtype="int64"),
            "n_islands": pd.Series(
                [int((real["has_pred"] == 0).sum())], dtype="int64"),
            "min_point": pd.Series([int(real["point"].min())], dtype="int64"),
            "max_point": pd.Series([int(real["point"].max())], dtype="int64"),
        })

    parts = agg.map_batches(fold, batch_format="pandas").to_pandas()
    return pd.DataFrame({
        "n_points": pd.Series([int(parts["n_points"].sum())], dtype="int64"),
        "n_islands": pd.Series([int(parts["n_islands"].sum())], dtype="int64"),
        "n_missing": pd.Series(
            [int(parts["max_point"].max() - parts["min_point"].min() + 1
                 - parts["n_points"].sum())], dtype="int64"),
        "min_point": pd.Series([int(parts["min_point"].min())], dtype="int64"),
        "max_point": pd.Series([int(parts["max_point"].max())], dtype="int64"),
    })


def q_token_first_position(sf_dir: str):
    """Histogram of the 1-based token index where 'the' first appears in
    each document (split on single spaces, empty tokens counted — DuckDB
    ``list_position(string_split(text,' '),'the')`` semantics), bucketed by
    10; −1 collects documents without the token. The kernel is fully
    vectorized despite the variable-length prefix: replace the FIRST
    `` the `` occurrence with a sentinel, take the pre-sentinel prefix, and
    count its spaces — three pandas str kernels, no per-row Python."""
    ds = _read(sf_dir, "documents", ["text"])

    def pos_hist(t: pa.Table) -> pa.Table:
        s = " " + t.to_pandas()["text"].astype(str) + " "
        found = s.str.contains(" the ", regex=False)
        pre = s.str.replace(" the ", "\x00", n=1, regex=False) \
            .str.split("\x00").str[0]
        p = np.where(found, pre.str.count(" ").to_numpy() + 1, 0)
        bucket = np.where(p == 0, -1, p // 10)
        g = pd.DataFrame({"bucket": bucket.astype("int64")}) \
            .groupby("bucket", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "bucket": g["bucket"], "n": g["size"].astype("int64")}))

    return B.grouped_aggregate_auto(
        ds.map_batches(pos_hist, batch_format="pyarrow"), ["bucket"],
        [Sum("n", alias_name="n")])


def q_locf_gapfill_daily(sf_dir: str):
    """Dense daily spine over [min, max] order date with the urgent-order
    count per day and the last-observation-carried-forward maximum urgent
    order value (cents): the gap-fill + LOCF imputation shape every
    time-series feature store needs. Distributed work is one keyed day
    reduce over the URGENT subset plus a global min/max over all orders;
    the spine + carry-forward runs on the O(n_days) aggregate — vectorized
    np.maximum.accumulate indexing, no recurrence loop."""
    ds = _read(sf_dir, "orders",
               ["o_orderdate", "o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        day = df["o_orderdate"].values.astype("datetime64[D]").astype("int64")
        urgent = df["o_orderpriority"].to_numpy() == "1-URGENT"
        g = pd.DataFrame({
            "day": day[urgent],
            "n": 1,
            "mx": _cents(df["o_totalprice"][urgent]),
        }).groupby("day", as_index=False).agg(n=("n", "sum"), mx=("mx", "max"))
        g["lo"] = day.min()
        g["hi"] = day.max()
        if not len(g):  # batch with no urgent rows still reports its bounds
            g = pd.DataFrame({"day": [day.min()], "n": [0],
                              "mx": [-1], "lo": [day.min()],
                              "hi": [day.max()]})
        return _pa_from_pandas(g.astype("int64"))

    agg = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pyarrow"), ["day"],
        [Sum("n", alias_name="n"), Max("mx", alias_name="mx"),
         Min("lo", alias_name="lo"), Max("hi", alias_name="hi")]).to_pandas()
    lo, hi = int(agg["lo"].min()), int(agg["hi"].max())
    days = np.arange(lo, hi + 1, dtype="int64")
    n = np.zeros(len(days), dtype="int64")
    mx = np.full(len(days), -1, dtype="int64")
    observed = agg[agg["n"] > 0]
    idx = observed["day"].to_numpy() - lo
    n[idx] = observed["n"].to_numpy()
    mx[idx] = observed["mx"].to_numpy()
    # LOCF: index of the latest observed day at-or-before each spine day
    carry = np.maximum.accumulate(
        np.where(mx >= 0, np.arange(len(days)), -1))
    locf = np.where(carry >= 0, mx[np.maximum(carry, 0)], 0)
    return pd.DataFrame({
        "day": pd.Series(days.astype("datetime64[D]")).dt.strftime("%Y-%m-%d"),
        "n_urgent": n,
        "locf_cents": locf.astype("int64"),
    })


def q_partition_balance_audit(sf_dir: str):
    """Range-partitioning balance audit: split order price cents into 32
    equi-width integer ranges between the global min and max, and report
    per-range row count and share in basis points — the skew report a
    planner consults before choosing range-shuffle boundaries. Two passes:
    a global (min, max, count) reduce, then the bucket histogram with the
    bounds broadcast into the second map — never a sort, never a sample."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "orders", ["o_totalprice"])
    bounds = ds.aggregate(Min("o_totalprice", alias_name="lo"),
                          Max("o_totalprice", alias_name="hi"),
                          Count(alias_name="tot"))
    # exact integer bounds: replicate _cents on the min/max scalars
    lo = int(np.floor(bounds["lo"] * 100 + 0.5))
    hi = int(np.floor(bounds["hi"] * 100 + 0.5))
    tot = int(bounds["tot"])
    span = hi - lo + 1

    def hist(t: pa.Table) -> pa.Table:
        c = _cents(t.to_pandas()["o_totalprice"])
        b = np.minimum((c - lo) * 32 // span, 31)
        g = pd.DataFrame({"bucket": b.astype("int64")}) \
            .groupby("bucket", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "bucket": g["bucket"], "n": g["size"].astype("int64")}))

    out = B.grouped_aggregate_auto(
        ds.map_batches(hist, batch_format="pyarrow"), ["bucket"],
        [Sum("n", alias_name="n")]).to_pandas()
    out["share_bps"] = (out["n"] * 10000 // tot).astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


def q_kmv_distinct_users(sf_dir: str, k: int = 64):
    """K-minimum-values distinct sketch over event users, fully
    oracle-exact: h(u) = (u·2654435761) mod 2³² (odd multiplier — injective
    below 2³², so distinct users ↔ distinct hashes) and the estimate is
    (k−1)·2³² // h₍ₖ₎ with h₍ₖ₎ the k-th smallest distinct hash. The
    distributed shape is the canonical mergeable-sketch reduce: every batch
    emits its ≤k smallest distinct hashes (O(k) rows, never the users), the
    driver merges the tiny partials, and the SQL oracle reproduces the SAME
    integer estimate with ORDER BY hash LIMIT k — no approximation gap to
    explain away. Falls back to the exact count below k distinct."""
    ds = _read(sf_dir, "events", ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        u = t.to_pandas()["user_id"].to_numpy(dtype="int64")
        h = np.unique((u.astype(np.uint64) * np.uint64(2654435761))
                      & np.uint64(0xFFFFFFFF)).astype(np.int64)
        return _pa_from_pandas(pd.DataFrame({"hh": h[:k]}))

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    hs = np.unique(parts["hh"].to_numpy())
    if len(hs) < k:
        kth, est = int(hs[-1]) if len(hs) else 0, len(hs)
    else:
        kth = int(hs[k - 1])
        est = (k - 1) * (1 << 32) // kth
    return pd.DataFrame({
        "k": pd.Series([k], dtype="int64"),
        "kth_hash": pd.Series([kth], dtype="int64"),
        "est_distinct": pd.Series([est], dtype="int64"),
    })


def q_loo_target_encoding(sf_dir: str):
    """Leave-one-out target encoding of order priority by order value: for
    every order, ⌊1000·(S_g − cᵢ)/(n_g − 1)⌋ milli-cents where S_g/n_g are
    its priority group's total and count — the leakage-free categorical
    feature a tabular-ML pipeline derives before training. Shape: one
    O(#groups) aggregate broadcast into a stateless vectorized map — the
    encode pass itself never shuffles, so it streams at input bandwidth.
    int64-safe to ~sf100 (numerator ≤ 1000·ΣcentsPerGroup)."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = pd.DataFrame({"o_orderpriority": df["o_orderpriority"],
                          "s": _cents(df["o_totalprice"]), "n": 1}) \
            .groupby("o_orderpriority", as_index=False).sum()
        return _pa_from_pandas(g)

    groups = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pyarrow"), ["o_orderpriority"],
        [Sum("s", alias_name="s"), Sum("n", alias_name="n")]).to_pandas()
    s_by = dict(zip(groups["o_orderpriority"], groups["s"].astype("int64")))
    n_by = dict(zip(groups["o_orderpriority"], groups["n"].astype("int64")))

    def encode(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        c = _cents(df["o_totalprice"])
        s = df["o_orderpriority"].map(s_by).to_numpy(dtype="int64")
        n = df["o_orderpriority"].map(n_by).to_numpy(dtype="int64")
        # singleton groups have no leave-one-out peers: skip them (mirrored
        # by WHERE g.n > 1 in the oracle) instead of dividing by zero
        keep = n > 1
        return _pa_from_pandas(pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(dtype="int64")[keep],
            "loo_milli": (1000 * (s[keep] - c[keep])) // (n[keep] - 1),
        }))

    return ds.map_batches(encode, batch_format="pyarrow")


def q_integrity_audit(sf_dir: str):
    """Referential/constraint audit as one (check_name, n_bad) report — the
    pre-ingest data-quality gate: lineitem rows whose order is missing,
    lineitems shipped before their order date, negative extended prices,
    orders whose customer is missing, duplicate order keys, and null
    document texts. Join checks ride the adaptive attach (broadcast under
    the row limit, bucketed shuffle above), so orphan counts are
    total − matched with no driver-side key set; the duplicate check is a
    keyed count reduce (Σcnt − #keys)."""
    from ..functions.bucketed import attach

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_shipdate", "l_extendedprice"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                      "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    docs = _read(sf_dir, "documents", ["text"])

    def li_base(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _pa_from_pandas(pd.DataFrame({
            "one": [1], "n": [len(df)],
            "neg": [int((df["l_extendedprice"].to_numpy() < 0).sum())]}))

    li_tot = B.grouped_aggregate_auto(
        li.map_batches(li_base, batch_format="pyarrow"),
        ["one"], [Sum("n", alias_name="n"), Sum("neg", alias_name="neg")]) \
        .to_pandas()
    n_li, n_neg = int(li_tot["n"][0]), int(li_tot["neg"][0])

    joined = attach(li, "l_orderkey", orders, "o_orderkey", "o_orderdate",
                    "o_date")

    def ship_check(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ship = df["l_shipdate"].values.astype("datetime64[D]").astype("int64")
        odate = df["o_date"].values.astype("datetime64[D]").astype("int64")
        return _pa_from_pandas(pd.DataFrame({
            "one": [1], "m": [len(df)],
            "viol": [int((ship < odate).sum())]}))

    j = B.grouped_aggregate_auto(
        joined.map_batches(ship_check, batch_format="pyarrow"), ["one"],
        [Sum("m", alias_name="m"), Sum("viol", alias_name="viol")]) \
        .to_pandas()
    n_matched, n_viol = int(j["m"][0]), int(j["viol"][0])

    o_matched = attach(orders, "o_custkey", cust, "c_custkey", "c_nationkey",
                       "ck")
    n_orders = orders.count()
    n_o_matched = o_matched.count()

    def keycnt(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("o_orderkey", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "o_orderkey": g["o_orderkey"].astype("int64"),
            "cnt": g["size"].astype("int64")}))

    keys = B.grouped_aggregate_auto(
        orders.select_columns(["o_orderkey"]).map_batches(
            keycnt, batch_format="pyarrow"),
        ["o_orderkey"], [Sum("cnt", alias_name="cnt")])
    n_keys = keys.count()

    def null_cnt(t: pa.Table) -> pa.Table:
        return _pa_from_pandas(pd.DataFrame({
            "one": [1], "c": [int(t.column("text").null_count)]}))

    n_null_text = int(B.grouped_aggregate_auto(
        docs.map_batches(null_cnt, batch_format="pyarrow"), ["one"],
        [Sum("c", alias_name="c")]).to_pandas()["c"][0])

    return pd.DataFrame({
        "check_name": ["dup_orderkeys", "lineitem_orphans", "negative_price",
                       "null_text_docs", "orders_orphan_cust",
                       "ship_before_order"],
        "n_bad": pd.Series([n_orders - n_keys, n_li - n_matched, n_neg,
                            n_null_text, n_orders - n_o_matched, n_viol],
                           dtype="int64"),
    })


def q_iso_week_revenue(sf_dir: str):
    """Order revenue (cents) and order count per ISO-8601 (year, week) —
    the calendar rollup where both sides must agree on the ISO year
    boundary rule (Jan 1 can belong to week 52/53 of the PREVIOUS iso
    year): pandas isocalendar() vs DuckDB isoyear()/week(). One partial
    aggregate per batch, one small keyed reduce."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        iso = df["o_orderdate"].dt.isocalendar()
        g = pd.DataFrame({
            "iso_year": iso["year"].astype("int64"),
            "iso_week": iso["week"].astype("int64"),
            "cents": _cents(df["o_totalprice"]),
            "n": 1,
        }).groupby(["iso_year", "iso_week"], as_index=False).sum()
        return _pa_from_pandas(g)

    return B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["iso_year", "iso_week"],
        [Sum("cents", alias_name="cents"), Sum("n", alias_name="n")])


def q_bag_except_partkeys(sf_dir: str):
    """Multiset EXCEPT ALL: part keys with MORE 1997 shipments than 1998
    ones, and the excess multiplicity — the bag-semantics set operation
    (EXCEPT ALL keeps max(a−b, 0) copies) that dedup-based set ops can't
    express. One conditional partial per batch, one keyed reduce, then a
    stateless filter — the excess never materializes row copies."""
    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        yr = df["l_shipdate"].dt.year
        m = yr.isin((1997, 1998))
        g = pd.DataFrame({
            "l_partkey": df["l_partkey"][m],
            "c97": (yr[m] == 1997).astype("int64"),
            "c98": (yr[m] == 1998).astype("int64"),
        }).groupby("l_partkey", as_index=False).sum()
        return _pa_from_pandas(g)

    agg = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pyarrow"), ["l_partkey"],
        [Sum("c97", alias_name="c97"), Sum("c98", alias_name="c98")])

    def excess(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["c97"] > df["c98"]]
        return pd.DataFrame({
            "l_partkey": keep["l_partkey"].astype("int64"),
            "excess": (keep["c97"] - keep["c98"]).astype("int64")})

    return agg.map_batches(excess, batch_format="pandas")


def q_equidepth_boundaries(sf_dir: str):
    """The 31 equi-depth (1/32-quantile) cut points of order price cents —
    the boundaries a range-shuffle planner would pick so every partition
    holds the same row count (the equi-DEPTH complement of
    partition_balance_audit's equi-WIDTH report). PERCENTILE_DISC
    semantics: boundary k = the ⌈k·n/32⌉-th smallest value (1-based) —
    dyadic quantiles make DuckDB's float q·n product exact, so both sides
    agree bit-for-bit. Distributed shape: one value-count reduce (O(distinct
    cents) rows — bounded by the price domain, not the row count), then a
    cumulative scan over the sorted counts on the driver."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def vc(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({"cents": _cents(t.to_pandas()["o_totalprice"])}) \
            .groupby("cents", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "cents": g["cents"], "cnt": g["size"].astype("int64")}))

    counts = B.grouped_aggregate_auto(
        ds.map_batches(vc, batch_format="pyarrow"), ["cents"],
        [Sum("cnt", alias_name="cnt")]).to_pandas() \
        .sort_values("cents").reset_index(drop=True)
    cum = counts["cnt"].to_numpy().cumsum()
    n = int(cum[-1])
    ks = np.arange(1, 32, dtype=np.int64)
    targets = (ks * n + 31) // 32  # ceil(k·n/32)
    idx = np.searchsorted(cum, targets, side="left")
    return pd.DataFrame({
        "k": ks,
        "boundary": counts["cents"].to_numpy()[idx].astype("int64"),
    })


def q_bloom_fp_audit(sf_dir: str):
    """End-to-end Bloom-filter quality audit, fully oracle-exact: build a
    65536-bit / 2-hash filter over the 1997 deep-discount part keys, probe
    it with every 1998 part key, and report build size, probe size, set
    bits, filter passes, true members and false positives. Both hash
    functions are plain integer arithmetic ((k·c) mod 65536), so the SQL
    oracle reproduces the exact bit array — the sketch itself is under
    test, not just its answers. Distributed shape: ONE keyed reduce tags
    every part key (in_build, in_probe); build-side bits then flow as
    ≤65536 distinct bit rows to the driver, broadcast back into a
    vectorized probe map. int64-exact for partkey < 2⁶³/2654435761
    (≈3.47e9 — k·2654435761 must not overflow int64; numpy would wrap
    silently while DuckDB BIGINT raises). FP rate here is
    the real thing: bits ≈ 2·|build| set of 65536."""
    ds = _read(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_discount"])

    def tag(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        yr = df["l_shipdate"].dt.year
        bld = (yr == 1997) & (df["l_discount"].to_numpy() > 0.08)
        prb = yr == 1998
        m = bld | prb
        g = pd.DataFrame({
            "k": df["l_partkey"][m],
            "in_build": bld[m].astype("int64"),
            "in_probe": prb[m].astype("int64"),
        }).groupby("k", as_index=False).max()
        return _pa_from_pandas(g)

    keys = B.grouped_aggregate_auto(
        ds.map_batches(tag, batch_format="pyarrow"), ["k"],
        [Max("in_build", alias_name="in_build"),
         Max("in_probe", alias_name="in_probe")])

    def build_bits(df: pd.DataFrame) -> pd.DataFrame:
        k = df["k"][df["in_build"] > 0].to_numpy(dtype="int64")
        bits = np.unique(np.concatenate(
            [(k * 2654435761) % 65536, (k * 2246822519 + 11) % 65536]))
        return pd.DataFrame({"b": bits.astype("int64")})

    bitset = np.zeros(65536, dtype=bool)
    bit_rows = B.grouped_aggregate_auto(
        keys.map_batches(build_bits, batch_format="pandas"), ["b"],
        [Count(alias_name="c")]).to_pandas()
    bitset[bit_rows["b"].to_numpy()] = True

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        k = df["k"].to_numpy(dtype="int64")
        in_b = df["in_build"].to_numpy() > 0
        in_p = df["in_probe"].to_numpy() > 0
        passed = bitset[(k * 2654435761) % 65536] \
            & bitset[(k * 2246822519 + 11) % 65536]
        return pd.DataFrame({
            "one": [1],
            "n_build": [int(in_b.sum())],
            "n_probe": [int(in_p.sum())],
            "n_pass": [int((passed & in_p).sum())],
            "n_true": [int((in_b & in_p).sum())],
            "n_false_pos": [int((passed & in_p & ~in_b).sum())],
        })

    tot = B.grouped_aggregate_auto(
        keys.map_batches(probe, batch_format="pandas"), ["one"],
        [Sum(c, alias_name=c) for c in
         ("n_build", "n_probe", "n_pass", "n_true", "n_false_pos")]) \
        .to_pandas()
    return pd.DataFrame({
        "n_build": tot["n_build"].astype("int64"),
        "n_probe": tot["n_probe"].astype("int64"),
        "n_bits_set": pd.Series([len(bit_rows)], dtype="int64"),
        "n_pass": tot["n_pass"].astype("int64"),
        "n_true": tot["n_true"].astype("int64"),
        "n_false_pos": tot["n_false_pos"].astype("int64"),
    })


def q_pct_of_parent_revenue(sf_dir: str):
    """Percent-of-parent hierarchical rollup: order revenue cents per
    customer nation, each nation's share of its REGION total in basis
    points — the drill-down ratio a reporting layer computes at every
    hierarchy level. The fact scan carries only a broadcast custkey→nation
    map (dimension tables are tiny by design); one keyed reduce per
    nation; the 25-row parent join runs on the driver."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    c2n = dict(zip(cust["c_custkey"].astype("int64"),
                   cust["c_nationkey"].astype("int64")))

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = pd.DataFrame({
            "nk": df["o_custkey"].map(c2n).astype("int64"),
            "cents": _cents(df["o_totalprice"]),
        }).groupby("nk", as_index=False).sum()
        return _pa_from_pandas(g)

    per_nation = B.grouped_aggregate_auto(
        orders.map_batches(partial, batch_format="pyarrow"), ["nk"],
        [Sum("cents", alias_name="cents")]).to_pandas()
    out = per_nation.merge(
        nation.rename(columns={"n_nationkey": "nk"}), on="nk") \
        .merge(region.rename(columns={"r_regionkey": "n_regionkey"}),
               on="n_regionkey")
    reg_tot = out.groupby("n_regionkey")["cents"].transform("sum")
    return pd.DataFrame({
        "region_name": out["r_name"],
        "nation_name": out["n_name"],
        "cents": out["cents"].astype("int64"),
        "share_bps": (out["cents"].astype("int64") * 10000
                      // reg_tot.astype("int64")).astype("int64"),
    }).sort_values(["region_name", "nation_name"]).reset_index(drop=True)


def q_cms_estimate_audit(sf_dir: str):
    """Count-Min-sketch quality audit, fully oracle-exact: build a 2×1024
    CMS over every lineitem part-key occurrence (plain integer hashes, so
    the SQL oracle rebuilds the identical cell array), then report — for
    the 10 heaviest keys (true count desc, key asc) — true count, CMS
    estimate (min over the two rows) and the overestimate. Distributed
    shape: keyed count reduce → per-batch partial CELL sums (O(2048) rows
    per batch, never per key) → tiny cell reduce broadcast into the
    estimate map; the top-10 flows as mergeable per-batch partial top-10s,
    so no stage materializes the key domain. int64-exact for
    partkey < 2⁶³/2654435761 (≈3.47e9 — the hash product must not
    overflow int64 on either side)."""
    ds = _read(sf_dir, "lineitem", ["l_partkey"])

    def kc(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("l_partkey", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "k": g["l_partkey"].astype("int64"),
            "c": g["size"].astype("int64")}))

    cnt = B.grouped_aggregate_auto(
        ds.map_batches(kc, batch_format="pyarrow"), ["k"],
        [Sum("c", alias_name="c")])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        k = df["k"].to_numpy(dtype="int64")
        c = df["c"].to_numpy(dtype="int64")
        out = []
        for row, cell in ((0, (k * 2654435761) % 1024),
                          (1, (k * 2246822519 + 11) % 1024)):
            g = pd.DataFrame({"cell": row * 1024 + cell, "s": c}) \
                .groupby("cell", as_index=False).sum()
            out.append(g)
        return pd.concat(out, ignore_index=True)

    cell_tbl = B.grouped_aggregate_auto(
        cnt.map_batches(cells, batch_format="pandas"), ["cell"],
        [Sum("s", alias_name="s")]).to_pandas()
    sketch = np.zeros(2048, dtype=np.int64)
    sketch[cell_tbl["cell"].to_numpy()] = cell_tbl["s"].to_numpy()

    def top_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["c", "k"], ascending=[False, True]).head(10)

    top = cnt.map_batches(top_partial, batch_format="pandas").to_pandas() \
        .sort_values(["c", "k"], ascending=[False, True]).head(10)
    k = top["k"].to_numpy(dtype="int64")
    est = np.minimum(sketch[(k * 2654435761) % 1024],
                     sketch[1024 + (k * 2246822519 + 11) % 1024])
    return pd.DataFrame({
        "l_partkey": k,
        "true_cnt": top["c"].to_numpy(dtype="int64"),
        "cms_est": est.astype("int64"),
        "overest": (est - top["c"].to_numpy()).astype("int64"),
    })


def q_ams_f2_audit(sf_dir: str):
    """AMS (Alon–Matias–Szegedy) second-frequency-moment sketch audit,
    fully oracle-exact: four ±1-hash counters X_j = Σ_k sign_j(k)·c_k over
    the part-key frequency vector, each estimating F₂ = Σ c² as X_j² —
    report the exact F₂ next to the four-estimate mean/min/max, all in
    integers (sign_j(k) = 1 − 2·((k·a_j >> 7) & 1) is plain arithmetic on
    both sides). Distributed shape: keyed count reduce, then an O(1)-wide
    partial (x0..x3, f2) per batch and one scalar reduce — the sketch
    state is four integers no matter the key domain."""
    ds = _read(sf_dir, "lineitem", ["l_partkey"])

    def kc(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("l_partkey", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "k": g["l_partkey"].astype("int64"),
            "c": g["size"].astype("int64")}))

    cnt = B.grouped_aggregate_auto(
        ds.map_batches(kc, batch_format="pyarrow"), ["k"],
        [Sum("c", alias_name="c")])
    mults = (2654435761, 2246822519, 3266489917, 668265263)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["k"].to_numpy(dtype="int64")
        c = df["c"].to_numpy(dtype="int64")
        row = {"one": [1], "f2": [int((c * c).sum())]}
        for j, a in enumerate(mults):
            sign = 1 - 2 * (((k * a) >> 7) & 1)
            row[f"x{j}"] = [int((sign * c).sum())]
        return pd.DataFrame(row)

    agg = B.grouped_aggregate_auto(
        cnt.map_batches(partial, batch_format="pandas"), ["one"],
        [Sum("f2", alias_name="f2")]
        + [Sum(f"x{j}", alias_name=f"x{j}") for j in range(4)]).to_pandas()
    ests = [int(agg[f"x{j}"][0]) ** 2 for j in range(4)]
    return pd.DataFrame({
        "f2_exact": pd.Series([int(agg["f2"][0])], dtype="int64"),
        "ams_mean": pd.Series([sum(ests) // 4], dtype="int64"),
        "ams_min": pd.Series([min(ests)], dtype="int64"),
        "ams_max": pd.Series([max(ests)], dtype="int64"),
    })


def q_div_customers_all_years(sf_dir: str):
    """Relational division: customers with at least one order in EVERY
    year 1995–2000 — the 'for all' join (suppliers-supplying-all-parts
    shape) that EXISTS/IN can't express without double negation. Shape:
    per-batch distinct (customer, year) pairs, one keyed reduce to
    de-duplicate pairs globally, a second tiny reduce counting distinct
    years per customer, then a stateless == 6 filter."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        yr = df["o_orderdate"].dt.year
        m = (yr >= 1995) & (yr <= 2000)
        g = pd.DataFrame({"o_custkey": df["o_custkey"][m],
                          "yr": yr[m]}).drop_duplicates()
        g["c"] = 1
        return _pa_from_pandas(g.astype("int64"))

    dedup = B.grouped_aggregate_auto(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["o_custkey", "yr"], [Max("c", alias_name="c")])

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False)["c"].sum()
        return g.rename(columns={"c": "ny"})

    per = B.grouped_aggregate_auto(
        dedup.map_batches(per_cust, batch_format="pandas"), ["o_custkey"],
        [Sum("ny", alias_name="ny")])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": df["o_custkey"][df["ny"] == 6].astype("int64")})

    return per.map_batches(keep, batch_format="pandas")


def q_median_via_bisection(sf_dir: str):
    """Exact PERCENTILE_DISC(0.5) of l_extendedprice cents WITHOUT a global
    sort: iterative distributed selection — pass 1 histograms the full
    integer range into 1024 equi-width buckets, locates the bucket holding
    rank ⌈n/2⌉, and each further pass re-scans with a narrowed [lo, hi]
    filter until the candidate range is small enough for an exact value
    count. Three O(n) scans with O(1024) shuffle rows each replace the
    all-to-all sort a naive median needs — the selection trick that makes
    exact order statistics feasible at 100 TB. Output: the median value,
    its rank target and the number of scan passes used."""
    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    from ray.data.aggregate import Count

    bounds = ds.aggregate(Min("l_extendedprice", alias_name="lo"),
                          Max("l_extendedprice", alias_name="hi"),
                          Count(alias_name="n"))
    lo = int(np.floor(bounds["lo"] * 100 + 0.5))
    hi = int(np.floor(bounds["hi"] * 100 + 0.5))
    n = int(bounds["n"])
    target = (n + 1) // 2  # ceil(n/2): PERCENTILE_DISC(0.5), 1-based
    passes = 0

    while hi - lo + 1 > 4096:
        passes += 1
        span = hi - lo + 1
        cur_lo, cur_hi = lo, hi

        def hist(t: pa.Table, _lo=cur_lo, _hi=cur_hi, _span=span) -> pa.Table:
            c = _cents(t.to_pandas()["l_extendedprice"])
            c = c[(c >= _lo) & (c <= _hi)]
            b = (c - _lo) * 1024 // _span
            g = pd.DataFrame({"b": b}).groupby("b", as_index=False).size()
            return _pa_from_pandas(pd.DataFrame({
                "b": g["b"].astype("int64"),
                "cnt": g["size"].astype("int64")}))

        bt = B.grouped_aggregate_auto(
            ds.map_batches(hist, batch_format="pyarrow"), ["b"],
            [Sum("cnt", alias_name="cnt")]).to_pandas().sort_values("b")
        cum = bt["cnt"].to_numpy().cumsum()
        i = int(np.searchsorted(cum, target, side="left"))
        bsel = int(bt["b"].to_numpy()[i])
        target -= int(cum[i - 1]) if i else 0
        # integer bucket value range: b = (c−lo)·1024 // span
        lo, hi = (cur_lo + (bsel * span + 1023) // 1024,
                  cur_lo + ((bsel + 1) * span - 1) // 1024)

    cur_lo, cur_hi = lo, hi

    def vc(t: pa.Table, _lo=cur_lo, _hi=cur_hi) -> pa.Table:
        c = _cents(t.to_pandas()["l_extendedprice"])
        c = c[(c >= _lo) & (c <= _hi)]
        g = pd.DataFrame({"v": c}).groupby("v", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "v": g["v"].astype("int64"),
            "cnt": g["size"].astype("int64")}))

    vt = B.grouped_aggregate_auto(
        ds.map_batches(vc, batch_format="pyarrow"), ["v"],
        [Sum("cnt", alias_name="cnt")]).to_pandas().sort_values("v")
    cum = vt["cnt"].to_numpy().cumsum()
    median = int(vt["v"].to_numpy()[np.searchsorted(cum, target, "left")])
    del passes  # data-dependent pass count is diagnostic-only, not output
    return pd.DataFrame({
        "median_cents": pd.Series([median], dtype="int64"),
        "rank_target": pd.Series([(n + 1) // 2], dtype="int64"),
    })


def _morton8(x: "np.ndarray", y: "np.ndarray") -> "np.ndarray":
    """Interleave the low 8 bits of x (even positions) and y (odd): the
    16-bit Morton/Z-order code, magic-shift spread."""
    def spread(v):
        v = (v | (v << 4)) & 0x0F0F
        v = (v | (v << 2)) & 0x3333
        v = (v | (v << 1)) & 0x5555
        return v
    return spread(x & 0xFF) | (spread(y & 0xFF) << 1)


def q_zorder_bucket_hist(sf_dir: str):
    """Z-order (Morton space-filling-curve) locality bucketing over
    (l_partkey & 255, l_suppkey & 255): rows per 16→6-bit Z-bucket — the
    multi-dimensional clustering audit behind Delta/Iceberg Z-ORDER BY,
    where one sort key must preserve locality in BOTH dimensions. Engine:
    vectorized magic-shift bit spreading; oracle: the bit-by-bit
    Σ((x>>i)&1)·4^i reconstruction — disjoint formulations of the same
    interleave. One partial histogram per batch, one tiny keyed reduce."""
    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def hist(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        z = _morton8(df["l_partkey"].to_numpy(dtype="int64"),
                     df["l_suppkey"].to_numpy(dtype="int64"))
        g = pd.DataFrame({"bucket": z >> 10}).groupby(
            "bucket", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "bucket": g["bucket"].astype("int64"),
            "n": g["size"].astype("int64")}))

    return B.grouped_aggregate_auto(
        ds.map_batches(hist, batch_format="pyarrow"), ["bucket"],
        [Sum("n", alias_name="n")])


def q_boilerplate_prefix_families(sf_dir: str):
    """Boilerplate detection by shared leading tokens: group documents on
    their first-5-token prefix and report every family with ≥ 2 members —
    the header/template sweep a text-curation pass runs before dedup
    (boilerplate shares prefixes long before it shares full hashes).
    Vectorized prefix assembly: ONE str.split(expand) into 6 columns plus
    a 4-step column fold — no per-row Python. One keyed reduce on the
    prefix string."""
    ds = _read(sf_dir, "documents", ["text"])

    def prefix_counts(t: pa.Table) -> pa.Table:
        s = t.to_pandas()["text"].astype(str)
        cols = s.str.split(" ", n=5, expand=True)
        prefix = cols[0].fillna("")
        for i in range(1, min(5, cols.shape[1])):
            nxt = cols[i]
            prefix = prefix.where(nxt.isna(), prefix + " " + nxt.fillna(""))
        g = pd.DataFrame({"prefix": prefix}).groupby(
            "prefix", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "prefix": g["prefix"], "n_docs": g["size"].astype("int64")}))

    agg = B.grouped_aggregate_auto(
        ds.map_batches(prefix_counts, batch_format="pyarrow"), ["prefix"],
        [Sum("n_docs", alias_name="n_docs")])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["n_docs"] >= 2].reset_index(drop=True)

    return agg.map_batches(keep, batch_format="pandas")


def q_event_hourly_dedup_counts(sf_dir: str):
    """Windowed stream deduplication: keep one event per (user, type,
    hour bucket) and count survivors per type — the at-most-once-per-window
    throttle an ingestion layer applies to telemetry. Per-batch distinct
    shrinks the exchange; one keyed reduce de-duplicates globally; the
    per-type rollup rides a second tiny reduce."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def triples(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        hour = df["ts"].values.astype("datetime64[h]").astype("int64")
        g = pd.DataFrame({"user_id": df["user_id"].astype("int64"),
                          "event_type": df["event_type"],
                          "hour": hour}).drop_duplicates()
        g["c"] = 1
        return _pa_from_pandas(g)

    dedup = B.grouped_aggregate_auto(
        ds.map_batches(triples, batch_format="pyarrow"),
        ["user_id", "event_type", "hour"], [Max("c", alias_name="c")])

    def per_type(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", as_index=False)["c"].sum()
        return g.rename(columns={"c": "n_kept"})

    return B.grouped_aggregate_auto(
        dedup.map_batches(per_type, batch_format="pandas"), ["event_type"],
        [Sum("n_kept", alias_name="n_kept")])


def q_table_checksum_orders(sf_dir: str):
    """Order-independent table checksum: Σ over rows of
    (o_orderkey·2654435761 + o_custkey·2246822519 + cents·3266489917)
    mod 2³¹, plus the row count — the migration-validation fingerprint
    two engines can compare without agreeing on row order, partitioning
    or file layout (this engine vs DuckDB is exactly that comparison).
    Commutative + associative by construction, so it reduces with plain
    Sum partials; per-row terms stay < 2³¹, per-batch partials < 2⁴⁷."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        h = (df["o_orderkey"].to_numpy(dtype="int64") * 2654435761
             + df["o_custkey"].to_numpy(dtype="int64") * 2246822519
             + _cents(df["o_totalprice"]) * 3266489917) % (1 << 31)
        return _pa_from_pandas(pd.DataFrame({
            "one": [1], "s": [int(h.sum())], "n": [len(df)]}))

    agg = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pyarrow"), ["one"],
        [Sum("s", alias_name="s"), Sum("n", alias_name="n")]).to_pandas()
    return pd.DataFrame({
        "n_rows": agg["n"].astype("int64"),
        "checksum": (agg["s"].astype("int64") % (1 << 31)).astype("int64"),
    })


def q_type_user_bitmap_overlap(sf_dir: str):
    """Pairwise audience overlap between all event types via bitmap
    aggregation: one keyed reduce OR-folds each user's 5-bit type mask,
    a 32-bin bincount collapses the user dimension entirely, and every
    (type_a, type_b, n_users_both) pair falls out of the mask counts —
    the roaring-bitmap trick that answers all O(T²) overlap questions
    from O(2^T) counters instead of T² semi-joins. Output ordered pairs
    a < b over the type names."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    types = ["click", "error", "purchase", "signup", "view"]
    t2b = {t: 1 << i for i, t in enumerate(types)}

    def bit_pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "bit": df["event_type"].map(t2b).astype("int64"),
        }).drop_duplicates()
        return _pa_from_pandas(g)

    # bitwise OR of DISTINCT single-bit masks == their sum, so the whole
    # fold stays vectorized: dedup (user, bit) pairs, then sum per user
    parts = ds.map_batches(bit_pairs, batch_format="pyarrow")

    def or_fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates().groupby("user_id", as_index=False)["bit"] \
            .sum().rename(columns={"bit": "mask"})
        cnt = np.bincount(g["mask"].to_numpy(), minlength=32)
        return pd.DataFrame({"mask": np.arange(32, dtype="int64"),
                             "n": cnt.astype("int64")})

    folded = B.bucketed_map_groups(parts, ["user_id"], or_fold)
    mc = folded.to_pandas().groupby("mask", as_index=False)["n"].sum()
    counts = np.zeros(32, dtype=np.int64)
    counts[mc["mask"].to_numpy()] = mc["n"].to_numpy()

    rows = []
    for i, ta in enumerate(types):
        for j in range(i + 1, len(types)):
            both = sum(int(c) for m, c in enumerate(counts)
                       if (m >> i) & 1 and (m >> j) & 1)
            rows.append((ta, types[j], both))
    return pd.DataFrame({
        "type_a": [r[0] for r in rows],
        "type_b": [r[1] for r in rows],
        "n_users_both": pd.Series([r[2] for r in rows], dtype="int64"),
    })


def q_log2_price_hist(sf_dir: str):
    """Log-scale (power-of-two) histogram of order price cents: bucket =
    ⌊log₂ cents⌋ taken EXACTLY via the float64 frexp exponent (ints below
    2⁵³ are represented exactly, so the exponent is never off-by-one at
    bucket edges — no log2 rounding hazard); the oracle reads the same
    bucket as the binary-string length minus one. The doubling-bucket
    profile that spots magnitude outliers equi-width histograms hide."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def hist(t: pa.Table) -> pa.Table:
        c = _cents(t.to_pandas()["o_totalprice"])
        c = c[c > 0]
        b = np.frexp(c.astype(np.float64))[1] - 1
        g = pd.DataFrame({"bucket": b.astype("int64")}).groupby(
            "bucket", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "bucket": g["bucket"], "n": g["size"].astype("int64")}))

    return B.grouped_aggregate_auto(
        ds.map_batches(hist, batch_format="pyarrow"), ["bucket"],
        [Sum("n", alias_name="n")])


def q_hamilton_apportionment(sf_dir: str):
    """Largest-remainder (Hamilton) apportionment: allocate 1000 sample
    slots across customer nations proportionally to their customer counts,
    integer base = ⌊count·1000/total⌋ plus one bonus slot to the largest
    remainders (ties: remainder desc, nation key asc) — the exact-quota
    allocation a stratified exporter uses so per-stratum outputs sum to the
    target. One keyed count reduce; the 25-row closed form runs on the
    driver; the oracle replays it with window ranks."""
    ds = _read(sf_dir, "customer", ["c_nationkey"])

    def cnt(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("c_nationkey", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "c_nationkey": g["c_nationkey"].astype("int64"),
            "n": g["size"].astype("int64")}))

    per = B.grouped_aggregate_auto(
        ds.map_batches(cnt, batch_format="pyarrow"), ["c_nationkey"],
        [Sum("n", alias_name="n")]).to_pandas() \
        .sort_values("c_nationkey").reset_index(drop=True)
    total = int(per["n"].sum())
    quota = per["n"].astype("int64") * 1000
    base = quota // total
    rem = quota % total
    bonus = 1000 - int(base.sum())
    order = np.lexsort((per["c_nationkey"].to_numpy(), -rem.to_numpy()))
    extra = np.zeros(len(per), dtype="int64")
    extra[order[:bonus]] = 1
    return pd.DataFrame({
        "c_nationkey": per["c_nationkey"].astype("int64"),
        "n_customers": per["n"].astype("int64"),
        "seats": (base + extra).astype("int64"),
    })


def q_global_row_numbering(sf_dir: str):
    """Distributed zipWithIndex: assign global consecutive 1-based row
    numbers to orders in o_orderkey order WITHOUT collecting. ONE pass
    (ADVICE r03 — the old two-pass variant assumed Ray re-chunks the
    materialized sorted dataset identically between passes): sort into
    range partitions, then each block emits a 4-number summary
    (min_key, cnt, Σw mod 2³¹, Σ(local_rank·w) mod 2³¹) with
    w = (key mod 2²⁰)+1 and local_rank 1-based within the block. Because
    Σ(rn·w) = Σ_blocks (offset·Σw + Σ(local_rank·w)) and sort makes block
    key ranges disjoint, the driver prefix-sums the tiny per-block meta
    table (one row per block, ordered by min_key) and combines the modular
    partials in exact Python ints — the data is never touched again, so no
    block-boundary identity assumption exists. Output: the row count and
    the order-sensitive checksum Σ(rn·w) mod 2³¹ — any off-by-one or block
    misorder changes it; the oracle recomputes via ROW_NUMBER()."""
    M = 1 << 31
    ds = _read(sf_dir, "orders", ["o_orderkey"]).sort("o_orderkey")

    def block_part(t: pa.Table) -> pa.Table:
        k = np.sort(t.to_pandas()["o_orderkey"].to_numpy(dtype="int64"))
        if not len(k):
            return _pa_from_pandas(pd.DataFrame(
                {"min_key": pd.Series([], dtype="int64"),
                 "cnt": pd.Series([], dtype="int64"),
                 "sum_w": pd.Series([], dtype="int64"),
                 "local_part": pd.Series([], dtype="int64")}))
        w = (k % (1 << 20)) + 1
        # chunked modular accumulation keeps every intermediate < 2⁶³ for
        # arbitrarily large blocks (rank·w ≤ chunk ceiling · 2²⁰ per row)
        local = 0
        for lo in range(0, len(k), 1 << 20):
            hi = min(lo + (1 << 20), len(k))
            ranks = np.arange(lo + 1, hi + 1, dtype="int64")
            local = (local + int(((ranks % M) * w[lo:hi]).sum())) % M
        return _pa_from_pandas(pd.DataFrame({
            "min_key": [int(k[0])], "cnt": [len(k)],
            "sum_w": [int(w.sum()) % M], "local_part": [local]}))

    meta = ds.map_batches(block_part, batch_size=None,
                          batch_format="pyarrow").to_pandas() \
        .sort_values("min_key").reset_index(drop=True)
    offsets = np.concatenate(
        [[0], meta["cnt"].to_numpy().cumsum()[:-1]]).astype("int64")
    total = 0
    for off, sw, lp in zip(offsets, meta["sum_w"], meta["local_part"]):
        total = (total + int(off) % M * int(sw) + int(lp)) % M
    return pd.DataFrame({
        "n_rows": pd.Series([int(meta["cnt"].sum())], dtype="int64"),
        "checksum": pd.Series([total], dtype="int64"),
    })


def q_source_hist_intersection(sf_dir: str):
    """Histogram-intersection similarity between every pair of document
    sources: per-mille-normalize each source's doc-length histogram
    (n_chars // 100 buckets, share = n_b·1000 // total_s) and report
    Σ_b min(share_a, share_b) per pair — the cheap distribution-overlap
    score a corpus-mixing planner uses before reweighting sources. One
    keyed reduce builds all histograms; the O(sources²·buckets) compare
    runs on the driver."""
    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def hist(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = pd.DataFrame({
            "source": df["source"],
            "bucket": df["n_chars"].to_numpy(dtype="int64") // 100,
            "n": 1}).groupby(["source", "bucket"], as_index=False).sum()
        return _pa_from_pandas(g)

    h = B.grouped_aggregate_auto(
        ds.map_batches(hist, batch_format="pyarrow"), ["source", "bucket"],
        [Sum("n", alias_name="n")]).to_pandas()
    tot = h.groupby("source")["n"].transform("sum")
    h["share"] = h["n"].astype("int64") * 1000 // tot.astype("int64")
    sources = sorted(h["source"].unique())
    piv = h.pivot_table(index="bucket", columns="source", values="share",
                        fill_value=0, aggfunc="sum")
    rows = []
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            rows.append((a, b, int(np.minimum(
                piv[a].to_numpy(), piv[b].to_numpy()).sum())))
    return pd.DataFrame({
        "source_a": [r[0] for r in rows],
        "source_b": [r[1] for r in rows],
        "intersection_pm": pd.Series([r[2] for r in rows], dtype="int64"),
    })


def q_schema_evolution_union(sf_dir: str):
    """Schema-evolution reader: two 'generations' of the same table (the
    even-key half projected WITHOUT o_orderpriority — the old schema — and
    the odd-key half WITH it) unioned BY NAME, missing columns typed-null
    filled — the mixed-generation scan every long-lived lakehouse table
    needs (Ray's Dataset.union requires aligned schemas, so the alignment
    map IS the operator). Output: per-generation row count, null/non-null
    priority counts, and the total revenue across both — proving no rows
    or values were lost in the alignment."""
    import ray.data as _rd

    gen1 = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    gen2 = _read(sf_dir, "orders",
                 ["o_orderkey", "o_totalprice", "o_orderpriority"])

    def old_gen(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["o_orderkey"] % 2 == 0].reset_index(drop=True)
        # the alignment map: add the column the old files never had
        df["o_orderpriority"] = pd.Series([None] * len(df), dtype="object")
        df["gen"] = 1
        return _pa_from_pandas(df)

    def new_gen(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["o_orderkey"] % 2 == 1].reset_index(drop=True)
        df["gen"] = 2
        return _pa_from_pandas(df)

    unioned = gen1.map_batches(old_gen, batch_format="pyarrow").union(
        gen2.map_batches(new_gen, batch_format="pyarrow"))

    def stats(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _pa_from_pandas(pd.DataFrame({
            "one": [1],
            "n_gen1": [int((df["gen"] == 1).sum())],
            "n_gen2": [int((df["gen"] == 2).sum())],
            "n_null_priority": [int(df["o_orderpriority"].isna().sum())],
            "n_with_priority": [int(df["o_orderpriority"].notna().sum())],
            "cents": [int(_cents(df["o_totalprice"]).sum())]}))

    agg = B.grouped_aggregate_auto(
        unioned.map_batches(stats, batch_format="pyarrow"), ["one"],
        [Sum(c, alias_name=c) for c in
         ("n_gen1", "n_gen2", "n_null_priority", "n_with_priority",
          "cents")]).to_pandas()
    return agg[["n_gen1", "n_gen2", "n_null_priority", "n_with_priority",
                "cents"]].astype("int64")


def q_linear_interp_gapfill(sf_dir: str):
    """Linear-interpolation gap-fill (the imputation complement of
    locf_gapfill_daily): on the dense daily spine, gap days between two
    observed urgent-max values take the exact integer interpolation
    (v₀·(b−t) + v₁·(t−a)) // (b−a); days outside the observed range take 0.
    Same distributed shape as LOCF — one keyed day reduce + a global
    min/max — with the O(n_days) interpolation vectorized via searchsorted
    on the observed-day array (no recurrence loop)."""
    ds = _read(sf_dir, "orders",
               ["o_orderdate", "o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        day = df["o_orderdate"].values.astype("datetime64[D]").astype("int64")
        urgent = df["o_orderpriority"].to_numpy() == "1-URGENT"
        g = pd.DataFrame({
            "day": day[urgent], "n": 1,
            "mx": _cents(df["o_totalprice"][urgent]),
        }).groupby("day", as_index=False).agg(n=("n", "sum"), mx=("mx", "max"))
        g["lo"] = day.min()
        g["hi"] = day.max()
        if not len(g):
            g = pd.DataFrame({"day": [day.min()], "n": [0], "mx": [-1],
                              "lo": [day.min()], "hi": [day.max()]})
        return _pa_from_pandas(g.astype("int64"))

    agg = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pyarrow"), ["day"],
        [Sum("n", alias_name="n"), Max("mx", alias_name="mx"),
         Min("lo", alias_name="lo"), Max("hi", alias_name="hi")]).to_pandas()
    lo, hi = int(agg["lo"].min()), int(agg["hi"].max())
    obs = agg[agg["n"] > 0].sort_values("day")
    od = obs["day"].to_numpy(dtype="int64")
    ov = obs["mx"].to_numpy(dtype="int64")
    days = np.arange(lo, hi + 1, dtype="int64")
    # index of the observed day at-or-before / strictly-after each spine day
    right = np.searchsorted(od, days, side="left")
    left = np.searchsorted(od, days, side="right") - 1
    inside = (left >= 0) & (right < len(od))
    a = od[np.clip(left, 0, len(od) - 1)]
    b = od[np.clip(right, 0, len(od) - 1)]
    v0 = ov[np.clip(left, 0, len(od) - 1)]
    v1 = ov[np.clip(right, 0, len(od) - 1)]
    observed_mask = inside & (a == days)
    span = np.where(b > a, b - a, 1)
    interp = (v0 * (b - days) + v1 * (days - a)) // span
    val = np.where(observed_mask, v0, np.where(inside, interp, 0))
    return pd.DataFrame({
        "day": pd.Series(days.astype("datetime64[D]")).dt.strftime("%Y-%m-%d"),
        "interp_cents": val.astype("int64"),
    })


def q_session_bounce_rate(sf_dir: str):
    """Sessionized bounce rate: sessions split on a strictly-greater-than-
    30-minute idle gap per user; a bounce is a single-event session.
    Output: global session count, bounce count, bounce share in bps.
    Equal-timestamp events can never split a session (their gap is 0), so
    no tiebreak column is needed — the segmentation is a pure function of
    each user's sorted timestamp multiset. One keyed shuffle co-locates
    each user's events; the per-bucket kernel is one sort + one cumsum —
    vectorized across ALL users in the bucket, no per-user Python."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def sess(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"one": pd.Series([], dtype="int64"),
                                 "n_sessions": pd.Series([], dtype="int64"),
                                 "n_bounce": pd.Series([], dtype="int64")})
        df = df.sort_values(["user_id", "ts"], kind="stable")
        us = df["user_id"].to_numpy(dtype="int64")
        t = df["ts"].values.astype("datetime64[s]").astype("int64")
        new_user = np.empty(len(df), dtype=bool)
        new_user[0] = True
        new_user[1:] = us[1:] != us[:-1]
        gap = np.empty(len(df), dtype="int64")
        gap[0] = 0
        gap[1:] = t[1:] - t[:-1]
        start = new_user | (gap > 1800)
        sid = np.cumsum(start)  # global session ids across the bucket
        per = pd.DataFrame({"sid": sid}).groupby("sid").size()
        return pd.DataFrame({
            "one": [1],
            "n_sessions": [int(len(per))],
            "n_bounce": [int((per == 1).sum())]})

    parts = B.bucketed_map_groups(ds, ["user_id"], sess)
    agg = B.grouped_aggregate_auto(
        parts, ["one"],
        [Sum("n_sessions", alias_name="n_sessions"),
         Sum("n_bounce", alias_name="n_bounce")]).to_pandas()
    ns, nb = int(agg["n_sessions"][0]), int(agg["n_bounce"][0])
    return pd.DataFrame({
        "n_sessions": pd.Series([ns], dtype="int64"),
        "n_bounce": pd.Series([nb], dtype="int64"),
        "bounce_bps": pd.Series([nb * 10000 // ns], dtype="int64"),
    })


def q_peak_sliding_60min(sf_dir: str):
    """Busiest 60-minute sliding window over the event stream: maximum
    event count in any closed window [m−59, m] (60 minutes, matching the
    oracle's RANGE 59 PRECEDING frame) ending at an observed minute,
    plus that window's end minute (ties → earliest). The max over ALL real
    windows equals the max over windows ending at observed minutes, so the
    engine reduces events to per-minute counts (one keyed reduce, O(active
    minutes) rows) and runs a vectorized searchsorted prefix-sum
    two-pointer on the driver — the oracle uses a RANGE 59 PRECEDING
    window frame."""
    ds = _read(sf_dir, "events", ["ts"])

    def minutes(t: pa.Table) -> pa.Table:
        m = t.to_pandas()["ts"].values.astype("datetime64[m]") \
            .astype("int64")
        g = pd.DataFrame({"minute": m}).groupby("minute",
                                                as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "minute": g["minute"], "c": g["size"].astype("int64")}))

    mt = B.grouped_aggregate_auto(
        ds.map_batches(minutes, batch_format="pyarrow"), ["minute"],
        [Sum("c", alias_name="c")]).to_pandas().sort_values("minute")
    ms = mt["minute"].to_numpy(dtype="int64")
    cs = mt["c"].to_numpy(dtype="int64")
    prefix = np.concatenate([[0], cs.cumsum()])
    j = np.searchsorted(ms, ms - 59, side="left")
    wc = prefix[1 + np.arange(len(ms))] - prefix[j]
    best = int(wc.max())
    end_minute = int(ms[wc == best].min())
    return pd.DataFrame({
        "n_events_max": pd.Series([best], dtype="int64"),
        "window_end_minute": pd.Series([end_minute], dtype="int64"),
    })


def q_theilsen_slope_daily(sf_dir: str):
    """Theil–Sen robust trend of the daily order-count series: the median
    of all pairwise slopes (xⱼ−xᵢ)/(dⱼ−dᵢ), reported as the exact integer
    ⌊dy·10⁶/dx⌋ of the median PAIR (PERCENTILE_DISC pick over slopes
    ordered by (value, dy, dx)). Ordering by the float64 ratio is exact
    here: distinct small-integer fractions differ by ≥ 1/(dx_max²) ≈ 2e-7,
    nine orders above double rounding — and the OUTPUT is computed from
    the chosen pair's integers, never from the float. Distributed work is
    the day-count reduce; the O(n_days²) pair median runs vectorized on
    the driver (the daily series is calendar-bounded, not data-bounded)."""
    ds = _read(sf_dir, "orders", ["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        day = (t.to_pandas()["o_orderdate"].values
               .astype("datetime64[D]").astype("int64"))
        g = pd.DataFrame({"day": day}).groupby("day", as_index=False).size()
        return _pa_from_pandas(pd.DataFrame({
            "day": g["day"].astype("int64"),
            "x": g["size"].astype("int64")}))

    daily = B.grouped_aggregate_auto(
        ds.map_batches(partial, batch_format="pyarrow"), ["day"],
        [Sum("x", alias_name="x")]).to_pandas().sort_values("day")
    d = daily["day"].to_numpy(dtype="int64")
    x = daily["x"].to_numpy(dtype="int64")
    i, j = np.triu_indices(len(d), k=1)
    dy = x[j] - x[i]
    dx = d[j] - d[i]
    ratio = dy / dx
    order = np.lexsort((dx, dy, ratio))
    n_pairs = len(dy)
    sel = order[(n_pairs + 1) // 2 - 1]  # ceil(n/2)-th smallest, 0-based
    slope_micro = int(dy[sel]) * 10**6 // int(dx[sel])
    return pd.DataFrame({
        "slope_micro": pd.Series([slope_micro], dtype="int64"),
        "n_pairs": pd.Series([n_pairs], dtype="int64"),
    })


def q_kmv_jaccard_click_purchase(sf_dir: str):
    """Set-similarity from mergeable sketches: estimate the Jaccard overlap
    of click-users vs purchase-users from their KMV k-minimum-value
    sketches (k = 64, same injective Knuth hash as kmv_distinct_users) —
    Ĵ = |U ∩ A ∩ B| / k with U the k smallest hashes of A ∪ B — next to
    the EXACT Jaccard, both in bps. Fully oracle-exact: the SQL rebuilds
    the same hash sets with ORDER BY/LIMIT. Distributed shape: per-batch
    distinct (user, is_click, is_purchase) partials, one keyed reduce, and
    O(k) driver math — at 100 TB each side's sketch is 64 integers no
    matter the user count."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    k = 64

    def tag(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        m = df["event_type"].isin(("click", "purchase"))
        g = pd.DataFrame({
            "user_id": df["user_id"][m].astype("int64"),
            "a": (df["event_type"][m] == "click").astype("int64"),
            "b": (df["event_type"][m] == "purchase").astype("int64"),
        }).groupby("user_id", as_index=False).max()
        return _pa_from_pandas(g)

    users = B.grouped_aggregate_auto(
        ds.map_batches(tag, batch_format="pyarrow"), ["user_id"],
        [Max("a", alias_name="a"), Max("b", alias_name="b")]).to_pandas()
    h = ((users["user_id"].to_numpy(dtype="int64").astype(np.uint64)
          * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)).astype(np.int64)
    in_a = users["a"].to_numpy() > 0
    in_b = users["b"].to_numpy() > 0
    ha = np.unique(h[in_a])
    hb = np.unique(h[in_b])
    union = np.unique(np.concatenate([ha, hb]))[:k]
    both = np.intersect1d(ha, hb)
    j_est = len(np.intersect1d(union, both)) * 10000 // min(k, len(union))
    inter_exact = len(both)
    union_exact = len(ha) + len(hb) - inter_exact
    return pd.DataFrame({
        "j_est_bps": pd.Series([j_est], dtype="int64"),
        "j_exact_bps": pd.Series([inter_exact * 10000 // union_exact],
                                 dtype="int64"),
        "n_click_users": pd.Series([len(ha)], dtype="int64"),
        "n_purchase_users": pd.Series([len(hb)], dtype="int64"),
    })


def q_equidepth_by_type(sf_dir: str):
    """Per-group equi-depth boundaries: the quartile cut points
    (PERCENTILE_DISC at 1/4, 2/4, 3/4 — boundary k = the ⌈k·n/4⌉-th
    smallest) of the event value per event type, in exact micro-units.
    The grouped variant of equidepth_boundaries: one (type, value)
    count reduce, then an O(distinct values) cumulative scan per group —
    never a per-group sort of raw rows."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def vc(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        v = np.floor(df["value"].to_numpy(dtype="float64") * 1e6 + 0.5) \
            .astype("int64")
        g = pd.DataFrame({"event_type": df["event_type"], "v": v,
                          "cnt": 1}).groupby(["event_type", "v"],
                                             as_index=False).sum()
        return _pa_from_pandas(g)

    counts = B.grouped_aggregate_auto(
        ds.map_batches(vc, batch_format="pyarrow"), ["event_type", "v"],
        [Sum("cnt", alias_name="cnt")]).to_pandas() \
        .sort_values(["event_type", "v"])
    rows = []
    for etype, grp in counts.groupby("event_type", sort=True):
        cum = grp["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        vals = grp["v"].to_numpy()
        for k in (1, 2, 3):
            target = (k * n + 3) // 4
            rows.append((etype, k,
                         int(vals[np.searchsorted(cum, target, "left")])))
    return pd.DataFrame({
        "event_type": [r[0] for r in rows],
        "k": pd.Series([r[1] for r in rows], dtype="int64"),
        "boundary_micro": pd.Series([r[2] for r in rows], dtype="int64"),
    })


def q_parts_per_order_hist(sf_dir: str):
    """Histogram of per-order DISTINCT part counts — the basket-width
    profile behind every market-basket operator's cost model. Two-level
    exact distinct: per-batch (order, part) dedup, one keyed pair reduce,
    a per-order count reduce, then the O(widths) histogram."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pairs(t: pa.Table) -> pa.Table:
        g = t.to_pandas()[["l_orderkey", "l_partkey"]].drop_duplicates()
        g["c"] = 1
        return _pa_from_pandas(g.astype("int64"))

    dedup = B.grouped_aggregate_auto(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["l_orderkey", "l_partkey"], [Max("c", alias_name="c")])

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", as_index=False)["c"].sum()
        h = g.groupby("c", as_index=False).size()
        return pd.DataFrame({"n_parts": h["c"].astype("int64"),
                             "n_orders": h["size"].astype("int64")})

    return B.grouped_aggregate_auto(
        B.bucketed_map_groups(dedup, ["l_orderkey"], per_order),
        ["n_parts"], [Sum("n_orders", alias_name="n_orders")])


# ---------------------------------------------------------------------------
# DuckDB oracles (column names match 1:1; counts/sums cast to BIGINT)
# ---------------------------------------------------------------------------

ANALYTICS_ORACLE_SQL: dict[str, str] = {
    "q2_min_cost_supplier": """
        WITH rs AS (SELECT s_suppkey, s_name, n_name
                    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    WHERE n_regionkey = 1),
        ps AS (SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
                      CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS cents
               FROM lineitem
               JOIN rs ON l_suppkey = rs.s_suppkey
               JOIN part ON l_partkey = p_partkey
               WHERE p_size BETWEEN 10 AND 20
               GROUP BY 1, 2),
        m AS (SELECT p_partkey, s_suppkey, cents,
                     ROW_NUMBER() OVER (PARTITION BY p_partkey
                         ORDER BY cents, s_suppkey) AS rn
              FROM ps)
        SELECT p_partkey, m.s_suppkey, s_name, n_name,
               cents AS min_cents
        FROM m JOIN rs ON m.s_suppkey = rs.s_suppkey
        WHERE rn = 1
    """,
    "q20_excess_suppliers": """
        WITH ps AS (SELECT l_partkey, l_suppkey,
                           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                               AS qty
                    FROM lineitem JOIN part ON l_partkey = p_partkey
                    WHERE p_name LIKE '%red%'
                    GROUP BY 1, 2),
        t AS (SELECT l_partkey,
                     CAST(SUM(qty) AS BIGINT) AS total_qty
              FROM ps GROUP BY 1)
        SELECT s_suppkey, s_name,
               CAST(COUNT(*) AS BIGINT) AS n_parts_dominated
        FROM ps
        JOIN t USING (l_partkey)
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE 8 * qty > total_qty
        GROUP BY 1, 2
        ORDER BY 1
    """,
    "inversion_count_brand": """
        WITH l AS (SELECT p_brand,
                          CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
                              AS price_cents,
                          CAST(l_quantity AS BIGINT) AS qty
                   FROM lineitem JOIN part ON l_partkey = p_partkey),
        n AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_rows
              FROM l GROUP BY 1),
        d AS (SELECT a.p_brand,
                     CAST(COUNT(*) FILTER (a.price_cents < b.price_cents
                                           AND a.qty > b.qty) AS BIGINT)
                         AS discordant
              FROM l a JOIN l b ON a.p_brand = b.p_brand
              GROUP BY 1)
        SELECT p_brand, n_rows, discordant FROM n JOIN d USING (p_brand)
    """,
    "mannwhitney_u_value": """
        WITH e AS (SELECT event_type,
                          CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS v
                   FROM events
                   WHERE event_type IN ('click', 'purchase')),
        r AS (SELECT event_type,
                     2 * RANK() OVER (ORDER BY v)
                       + COUNT(*) OVER (PARTITION BY v) - 1 AS r2
              FROM e),
        s AS (SELECT CAST(COUNT(*) FILTER (event_type = 'click')
                          AS BIGINT) AS n_click,
                     CAST(COUNT(*) FILTER (event_type = 'purchase')
                          AS BIGINT) AS n_purchase,
                     CAST(SUM(r2) FILTER (event_type = 'click')
                          AS BIGINT) AS r1_x2
              FROM r)
        SELECT n_click, n_purchase, r1_x2,
               CAST(r1_x2 - n_click * (n_click + 1) AS BIGINT) AS u1_x2
        FROM s
    """,
    "cume_dist_orders": """
        SELECT o_orderkey, o_orderpriority,
               CUME_DIST() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                   AS cume_dist
        FROM orders
    """,
    "cube_revenue": """
        WITH j AS (
            SELECT c.c_mktsegment AS seg, r.r_name AS reg,
                   CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey)
        SELECT COALESCE(seg, 'ALL') AS mktsegment,
               COALESCE(reg, 'ALL') AS region,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM j GROUP BY CUBE (seg, reg)
    """,
    "weighted_avg_disc": """
        WITH l AS (SELECT l_returnflag,
                          CAST(l_quantity AS BIGINT) AS qty,
                          CAST(FLOOR(l_discount*10000 + 0.5) AS BIGINT) AS bps
                   FROM lineitem)
        SELECT l_returnflag,
               CAST(SUM(qty) AS BIGINT) AS sum_qty,
               CAST(SUM(bps * qty) AS BIGINT) AS disc_qty_bps,
               CAST(SUM(bps * qty) AS DOUBLE) / CAST(SUM(qty) AS DOUBLE)
                   AS wavg_disc_bps
        FROM l GROUP BY 1
    """,
    "systematic_sample_orders": """
        SELECT rn, o_orderkey FROM (
            SELECT o_orderkey,
                   CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS BIGINT)
                       AS rn
            FROM orders)
        WHERE (rn - 1) % 97 = 0
    """,
    "skyline_orders": """
        WITH o AS (SELECT o_orderkey,
                          date_diff('day', DATE '1970-01-01', o_orderdate)
                              AS dd,
                          CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                              AS cents
                   FROM orders),
             m AS (SELECT o_orderkey, dd, cents,
                          MAX(cents) OVER (
                              ORDER BY dd
                              RANGE BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS pm,
                          MAX(cents) OVER (PARTITION BY dd) AS sm
                   FROM o)
        SELECT o_orderkey, CAST(dd AS BIGINT) AS dd, cents
        FROM m WHERE (pm IS NULL OR cents > pm) AND cents = sm
    """,
    "dup_ngram_docs": """
        WITH l AS (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents),
             t AS (SELECT doc_id,
                          ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
                   FROM l, UNNEST(range(1, len(ws) - 1)) AS u(i)),
             g AS (SELECT DISTINCT doc_id, gram FROM t),
             c AS (SELECT gram, COUNT(*) AS nd FROM g GROUP BY 1)
        SELECT g.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_cross_dup
        FROM g JOIN c USING (gram) GROUP BY 1
    """,
    "bottomk_hash_sample": """
        SELECT doc_id, h FROM (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST((doc_id * 2654435761) % 4294967296 AS BIGINT) AS h
            FROM documents)
        ORDER BY h, doc_id LIMIT 100
    """,
    "event_value_quantiles": """
        WITH c AS (SELECT CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
                   FROM events)
        SELECT CAST(50 AS BIGINT) AS pct,
               CAST(quantile_disc(cents, 0.5) AS BIGINT) AS value_cents FROM c
        UNION ALL
        SELECT CAST(90 AS BIGINT),
               CAST(quantile_disc(cents, 0.9) AS BIGINT) FROM c
        UNION ALL
        SELECT CAST(99 AS BIGINT),
               CAST(quantile_disc(cents, 0.99) AS BIGINT) FROM c
    """,
    "pareto_customers": """
        WITH r AS (SELECT o_custkey,
                          SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                              AS rev
                   FROM orders GROUP BY 1),
             c AS (SELECT rev,
                          SUM(rev) OVER (ORDER BY rev DESC, o_custkey) AS cum,
                          SUM(rev) OVER () AS total,
                          COUNT(*) OVER () AS n
                   FROM r)
        SELECT CAST(MIN(rn) AS BIGINT) AS n_customers_80pct,
               CAST(MIN(n) AS BIGINT) AS n_customers_total,
               CAST(MIN(total) AS BIGINT) AS total_cents
        FROM (SELECT cum, total, n,
                     ROW_NUMBER() OVER (ORDER BY cum) AS rn
              FROM c)
        WHERE 5*cum >= 4*total
    """,
    "interarrival_burstiness": """
        WITH w AS (SELECT epoch_us(ts)
                          - LAG(epoch_us(ts)) OVER (ORDER BY event_id)
                              AS du
                   FROM events),
             g AS (SELECT CAST((du - (((du % 1000000) + 1000000) % 1000000))
                               / 1000000 AS BIGINT) AS d
                   FROM w WHERE du IS NOT NULL),
             s AS (SELECT COUNT(*) AS n, SUM(d) AS sd, SUM(d*d) AS sd2
                   FROM g)
        SELECT CAST(n AS BIGINT) AS n_gaps, CAST(sd AS BIGINT) AS sum_gap_s,
               CAST((n * sd2 - sd * sd) * 1000000 // (sd * sd) AS BIGINT)
                   AS cv2_ppm
        FROM s
    """,
    "value_outliers_by_type": """
        WITH c AS (SELECT event_type,
                          CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS x
                   FROM events),
             a AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS s,
                          SUM(x*x) AS s2
                   FROM c GROUP BY 1)
        SELECT c.event_type,
               CAST(SUM(CASE WHEN CAST(c.x * a.n - a.s AS DOUBLE)
                                  * CAST(c.x * a.n - a.s AS DOUBLE)
                             > (4.0 * CAST(a.n AS DOUBLE))
                               * (CAST(a.n AS DOUBLE)
                                  * CAST(a.s2 AS DOUBLE)
                                  - CAST(a.s AS DOUBLE)
                                    * CAST(a.s AS DOUBLE))
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               CAST(COUNT(*) AS BIGINT) AS n_total
        FROM c JOIN a USING (event_type) GROUP BY 1
    """,
    "benford_first_digit": """
        WITH c AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                       AS cents FROM orders)
        SELECT CAST(LEFT(CAST(cents AS VARCHAR), 1) AS BIGINT) AS digit,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM c GROUP BY 1
    """,
    "weekday_hour_heatmap": """
        SELECT CAST(isodow(ts) AS BIGINT) AS weekday,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM events GROUP BY 1, 2
    """,
    "train_val_test_split": """
        WITH s AS (SELECT source,
                          CASE WHEN (doc_id * 2654435761) % 4294967296 % 100
                                    < 80 THEN 'train'
                               WHEN (doc_id * 2654435761) % 4294967296 % 100
                                    < 90 THEN 'val'
                               ELSE 'test' END AS split,
                          len(string_split(text, ' ')) AS n_tokens
                   FROM documents)
        SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM s GROUP BY 1, 2
    """,
    "order_seasonality": """
        WITH m AS (SELECT EXTRACT(month FROM o_orderdate) AS month,
                          SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                              AS month_cents
                   FROM orders GROUP BY 1),
             t AS (SELECT SUM(month_cents) AS total FROM m)
        SELECT CAST(month AS BIGINT) AS month,
               CAST(month_cents AS BIGINT) AS month_cents,
               CAST(month_cents * 12 * 10000 // total AS BIGINT) AS idx_bps
        FROM m, t
    """,
    "brand_rank_shift": """
        WITH j AS (SELECT p_brand, EXTRACT(year FROM l_shipdate) AS yr,
                          CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
                              AS rev
                   FROM lineitem JOIN part ON l_partkey = p_partkey),
             a AS (SELECT p_brand, yr, SUM(rev) AS rev FROM j GROUP BY 1, 2),
             mx AS (SELECT MAX(yr) AS ly FROM a),
             rp AS (SELECT p_brand, ROW_NUMBER() OVER (
                        ORDER BY rev DESC, p_brand) AS rank_prev
                    FROM a, mx WHERE yr = ly - 1),
             rl AS (SELECT p_brand, ROW_NUMBER() OVER (
                        ORDER BY rev DESC, p_brand) AS rank_last
                    FROM a, mx WHERE yr = ly)
        SELECT p_brand, CAST(rank_prev AS BIGINT) AS rank_prev,
               CAST(rank_last AS BIGINT) AS rank_last,
               CAST(rank_prev - rank_last AS BIGINT) AS shift
        FROM rp JOIN rl USING (p_brand)
    """,
    "copurchase_lift": """
        WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM d),
             pf AS (SELECT l_partkey, COUNT(*) AS n_p FROM d GROUP BY 1),
             pr AS (SELECT l1.l_partkey AS part_a, l2.l_partkey AS part_b,
                           COUNT(*) AS n_ab
                    FROM d l1 JOIN d l2 USING (l_orderkey)
                    WHERE l1.l_partkey < l2.l_partkey GROUP BY 1, 2),
             lf AS (SELECT part_a, part_b, n_ab,
                           n_ab * tot.n * 1000000 // (pa.n_p * pb.n_p)
                               AS lift_ppm
                    FROM pr
                    JOIN pf pa ON pr.part_a = pa.l_partkey
                    JOIN pf pb ON pr.part_b = pb.l_partkey
                    CROSS JOIN tot
                    WHERE n_ab >= 3)
        SELECT CAST(part_a AS BIGINT) AS part_a,
               CAST(part_b AS BIGINT) AS part_b,
               CAST(n_ab AS BIGINT) AS n_ab,
               CAST(lift_ppm AS BIGINT) AS lift_ppm
        FROM lf ORDER BY lift_ppm DESC, part_a, part_b LIMIT 20
    """,
    "trailing_7d_spend": """
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS trailing_cents
        FROM orders
    """,
    "orders_above_cust_avg": """
        WITH c AS (SELECT o_orderkey, o_custkey,
                          CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                              AS cents
                   FROM orders),
             a AS (SELECT o_custkey, SUM(cents) AS s, COUNT(*) AS n
                   FROM c GROUP BY 1)
        SELECT c.o_orderkey, c.o_custkey, c.cents
        FROM c JOIN a USING (o_custkey)
        WHERE c.cents * a.n > a.s
    """,
    "minmax_scaled_values": """
        WITH c AS (SELECT event_type,
                          CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
                   FROM events),
             e AS (SELECT event_type, MIN(cents) AS mn, MAX(cents) AS mx
                   FROM c GROUP BY 1)
        SELECT c.event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN e.mx > e.mn
                             THEN (c.cents - e.mn) * 1000000
                                  // (e.mx - e.mn)
                             ELSE 0 END) AS BIGINT) AS sum_scaled_ppm
        FROM c JOIN e USING (event_type) GROUP BY 1
    """,
    "langid_confusion": """
        SELECT lang,
               CASE WHEN (length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g'))) * 5
                         > GREATEST(length(text), 1) THEN 'zh'
                    WHEN (length(text) - length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g'))) * 5
                         > GREATEST(length(text), 1) THEN 'ru'
                    WHEN (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) * 5
                         > GREATEST(length(text), 1) * 2 THEN 'en'
                    ELSE 'unknown' END AS pred_lang,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    """,
    "order_count_gini": """
        WITH c AS (SELECT o_custkey, COUNT(*) AS x FROM orders GROUP BY 1),
             r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS i FROM c),
             s AS (SELECT SUM(i*x) AS six, SUM(x) AS sx, COUNT(*) AS n
                   FROM r)
        SELECT CAST((2*six - (n+1)*sx) * 1000000 // (n*sx) AS BIGINT)
                   AS gini_ppm,
               CAST(n AS BIGINT) AS n_customers
        FROM s
    """,
    "asof_next_event": """
        WITH j AS (SELECT o_orderkey, e.event_id,
                          ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                             ORDER BY e.ts, e.event_id) AS rk
                   FROM orders o JOIN events e
                     ON e.user_id = o.o_custkey
                    AND e.ts >= o.o_orderdate)
        SELECT o_orderkey, event_id FROM j WHERE rk = 1
    """,
    "token_entropy_by_source": """
        WITH w AS (SELECT source, UNNEST(string_split(text, ' ')) AS word
                   FROM documents),
             c AS (SELECT source, word, COUNT(*) AS c FROM w GROUP BY 1, 2),
             s AS (SELECT source, SUM(c) AS n,
                          SUM(CAST(FLOOR(CAST(c AS DOUBLE)
                                         * ln(CAST(c AS DOUBLE))
                                         * 1000000.0 + 0.5) AS BIGINT))
                              AS s_int
                   FROM c GROUP BY 1)
        SELECT source, CAST(n AS BIGINT) AS n_tokens,
               CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1000000.0
                          - CAST(s_int AS DOUBLE) / CAST(n AS DOUBLE)
                          + 0.5) AS BIGINT) AS entropy_micronats
        FROM s
    """,
    "priority_region_grid": """
        WITH p AS (SELECT DISTINCT o_orderpriority FROM orders),
             f AS (SELECT n_regionkey AS rk, o_orderpriority,
                          COUNT(*) AS n
                   FROM orders JOIN customer ON o_custkey = c_custkey
                               JOIN nation ON c_nationkey = n_nationkey
                   GROUP BY 1, 2)
        SELECT r_name, p.o_orderpriority,
               CAST(COALESCE(f.n, 0) AS BIGINT) AS n_orders
        FROM region CROSS JOIN p
        LEFT JOIN f ON f.rk = region.r_regionkey
                   AND f.o_orderpriority = p.o_orderpriority
    """,
    "weighted_median_price": """
        WITH c AS (SELECT CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
                              AS cents,
                          CAST(l_quantity AS BIGINT) AS w FROM lineitem),
             s AS (SELECT cents, SUM(w) AS wv FROM c GROUP BY 1),
             t AS (SELECT cents, SUM(wv) OVER (ORDER BY cents) AS cw,
                          SUM(wv) OVER () AS tot FROM s)
        SELECT CAST(MIN(cents) AS BIGINT) AS wmedian_cents
        FROM t WHERE 2*cw >= tot
    """,
    "brand_price_qty_slope": """
        WITH j AS (SELECT p_brand, CAST(l_quantity AS BIGINT) AS x,
                          CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
                              AS y
                   FROM lineitem JOIN part ON l_partkey = p_partkey),
             a AS (SELECT p_brand, COUNT(*) AS n, SUM(x) AS sx,
                          SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx
                   FROM j GROUP BY 1)
        SELECT p_brand,
               CAST(((n*sxy - sx*sy) * 1000000) // (n*sxx - sx*sx)
                    AS BIGINT) AS slope_ppm
        FROM a WHERE n*sxx - sx*sx <> 0
    """,
    "quality_audit": """
        SELECT 'orphan_lineitems' AS "check", CAST(COUNT(*) AS BIGINT) AS n_bad
        FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'orphan_orders', CAST(COUNT(*) AS BIGINT)
        FROM orders o WHERE NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'nonpositive_price', CAST(COUNT(*) AS BIGINT)
        FROM lineitem WHERE l_extendedprice <= 0
        UNION ALL
        SELECT 'discount_out_of_range', CAST(COUNT(*) AS BIGINT)
        FROM lineitem WHERE l_discount < 0 OR l_discount > 1
        UNION ALL
        SELECT 'empty_documents', CAST(COUNT(*) AS BIGINT)
        FROM documents WHERE length(text) = 0
    """,
    "embedding_norm_stats": """
        WITH m AS (SELECT CAST(label AS BIGINT) AS label,
                          CAST(list_sum(list_transform(embedding,
                               x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000 + 0.5)
                                         AS BIGINT)
                                  * CAST(FLOOR(CAST(x AS DOUBLE)*1000 + 0.5)
                                         AS BIGINT)))
                               AS BIGINT) AS sq
                   FROM embeddings)
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(sq) AS BIGINT) AS sum_sq,
               CAST(MIN(sq) AS BIGINT) AS min_sq,
               CAST(MAX(sq) AS BIGINT) AS max_sq
        FROM m GROUP BY 1
    """,
    "local_supplier_volume": """
        WITH l AS (SELECT l_orderkey, l_suppkey,
                          CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
                          * (10000 - CAST(FLOOR(l_discount*10000 + 0.5)
                                          AS BIGINT)) AS rev
                   FROM lineitem)
        SELECT n_name, CAST(SUM(rev) AS BIGINT) AS revenue_units
        FROM l JOIN supplier ON l_suppkey = s_suppkey
               JOIN orders   ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
                            AND c_nationkey = s_nationkey
               JOIN nation   ON s_nationkey = n_nationkey
        GROUP BY 1
    """,
    "conversion_time_stats": """
        WITH v AS (SELECT user_id, MIN(ts) AS t0 FROM events
                   WHERE event_type = 'view' GROUP BY 1),
             p AS (SELECT e.user_id,
                          MIN(epoch_us(e.ts)) - MIN(epoch_us(v.t0)) AS delta_us
                   FROM events e JOIN v USING (user_id)
                   WHERE e.event_type = 'purchase'
                     AND e.ts >= v.t0
                   GROUP BY 1)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
               CAST(SUM(delta_us) AS BIGINT) AS sum_delta_us,
               CAST(MIN(delta_us) AS BIGINT) AS min_delta_us,
               CAST(MAX(delta_us) AS BIGINT) AS max_delta_us
        FROM p
    """,
    "copurchase_triangles": """
        WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             e AS (SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
                   FROM d l1 JOIN d l2 USING (l_orderkey)
                   WHERE l1.l_partkey < l2.l_partkey)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM e e1 JOIN e e2 ON e2.a = e1.b
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
    "fuzzy_name_pairs": """
        SELECT CAST(a.p_partkey AS BIGINT) AS part_a,
               CAST(b.p_partkey AS BIGINT) AS part_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
    "late_events_watermark": """
        WITH w AS (SELECT event_type, ts,
                          MAX(ts) OVER (ORDER BY event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS wm
                   FROM events)
        SELECT event_type,
               CAST(SUM(CASE WHEN wm IS NOT NULL
                             AND epoch_us(wm) - epoch_us(ts) > 3600000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
               CAST(COUNT(*) AS BIGINT) AS n_total
        FROM w GROUP BY 1
    """,
    "top_parts_with_ties": """
        SELECT p_brand, p_partkey, cents, rk FROM (
            SELECT p_brand, CAST(p_partkey AS BIGINT) AS p_partkey,
                   CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT) AS cents,
                   CAST(RANK() OVER (
                       PARTITION BY p_brand
                       ORDER BY CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT)
                           DESC) AS BIGINT) AS rk
            FROM part)
        WHERE rk <= 3
    """,
    "daily_active_users": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1
    """,
    "orders_running_share": """
        WITH d AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                          SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                              AS day_cents
                   FROM orders GROUP BY 1),
             c AS (SELECT day, day_cents,
                          SUM(day_cents) OVER (ORDER BY day) AS cum_cents,
                          SUM(day_cents) OVER () AS total
                   FROM d)
        SELECT day, CAST(day_cents AS BIGINT) AS day_cents,
               CAST(cum_cents AS BIGINT) AS cum_cents,
               CAST(cum_cents * 10000 // total AS BIGINT) AS share_bps
        FROM c
    """,
    "acctbal_histogram_signed": """
        WITH b AS (SELECT CAST(FLOOR(
                       CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) / 50000.0)
                       AS BIGINT) AS bucket
                   FROM customer)
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1
    """,
    "supplier_brand_diversity": """
        WITH sb AS (SELECT DISTINCT l_suppkey, p_brand
                    FROM lineitem JOIN part ON l_partkey = p_partkey)
        SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey,
               CAST(COUNT(*) AS BIGINT) AS n_brands
        FROM sb GROUP BY 1
    """,
    "late_shipments_monthly": """
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               CAST(COUNT(*) AS BIGINT) AS n_late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE date_diff('day', o_orderdate, l_shipdate) > 60
        GROUP BY 1
    """,
    "json_extract_stats": """
        WITH e AS (SELECT event_type,
                          CAST(NULLIF(regexp_extract(props,
                               '"k":\\s*(-?\\d+)', 1), '') AS BIGINT) AS k
                   FROM events)
        SELECT event_type,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               CAST(MIN(k) AS BIGINT) AS min_k,
               CAST(MAX(k) AS BIGINT) AS max_k,
               CAST(COUNT(k) AS BIGINT) AS n
        FROM e WHERE k IS NOT NULL GROUP BY 1
    """,
    "type_token_ratio_docs": """
        WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                   FROM documents)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types
        FROM t GROUP BY 1
    """,
    "decile_docs": """
        WITH b AS (SELECT unnest([
                       quantile_disc(n_chars, 0.1), quantile_disc(n_chars, 0.2),
                       quantile_disc(n_chars, 0.3), quantile_disc(n_chars, 0.4),
                       quantile_disc(n_chars, 0.5), quantile_disc(n_chars, 0.6),
                       quantile_disc(n_chars, 0.7), quantile_disc(n_chars, 0.8),
                       quantile_disc(n_chars, 0.9)]) AS q
                   FROM documents)
        SELECT d.doc_id,
               CAST(1 + SUM(CASE WHEN b.q < d.n_chars THEN 1 ELSE 0 END)
                    AS BIGINT) AS decile
        FROM documents d CROSS JOIN b GROUP BY 1
    """,
    "bloom_semi_join_orders": """
        SELECT o.o_orderkey, o.o_custkey
        FROM orders o
        WHERE o.o_custkey IN (SELECT c_custkey FROM customer
                              WHERE c_mktsegment = 'BUILDING')
    """,
    "lead_next_order": """
        WITH d AS (
            SELECT o_orderkey,
                   date_diff('day', o_orderdate,
                             LEAD(o_orderdate) OVER (
                                 PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey))
                       AS days_to_next
            FROM orders)
        SELECT o_orderkey, CAST(days_to_next AS BIGINT) AS days_to_next
        FROM d WHERE days_to_next IS NOT NULL
    """,
    "interval_union_days": """
        WITH o AS (SELECT o_custkey,
                          date_diff('day', DATE '1970-01-01', o_orderdate)
                              AS s
                   FROM orders),
             w AS (SELECT o_custkey, s, s + 7 AS e,
                          MAX(s + 7) OVER (
                              PARTITION BY o_custkey ORDER BY s
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS pme
                   FROM o)
        SELECT o_custkey,
               CAST(SUM(GREATEST(0, e - GREATEST(s, COALESCE(pme, s))))
                    AS BIGINT) AS covered_days
        FROM w GROUP BY 1
    """,
    "rolling_sum_orders": """
        SELECT o_orderkey,
               CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(o_orderdate AS VARCHAR), o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS roll_cents
        FROM orders
    """,
    "lag_delta_orders": """
        WITH d AS (
            SELECT o_orderkey,
                   CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                   - LAG(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) OVER (
                       PARTITION BY o_custkey
                       ORDER BY CAST(o_orderdate AS VARCHAR), o_orderkey)
                       AS delta_cents
            FROM orders)
        SELECT o_orderkey, delta_cents FROM d WHERE delta_cents IS NOT NULL
    """,
    "running_max_orders": """
        SELECT o_orderkey,
               MAX(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(o_orderdate AS VARCHAR), o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS run_max_cents
        FROM orders
    """,
    "ntile_orders": """
        SELECT o_orderkey,
               CAST(NTILE(4) OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT),
                            o_orderkey) AS BIGINT) AS tile
        FROM orders
    """,
    "doc_length_histogram": """
        SELECT CAST((n_chars // 100) * 100 AS BIGINT) AS bucket_lo,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1
    """,
    "source_quota_sample": """
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars FROM (
            SELECT doc_id, source, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
                       AS rn
            FROM documents)
        WHERE rn <= 10
    """,
    "mad_prices": """
        WITH c AS (SELECT o_orderpriority,
                          CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
                   FROM orders),
             m AS (SELECT o_orderpriority, quantile_disc(cents, 0.5) AS med
                   FROM c GROUP BY 1)
        SELECT c.o_orderpriority,
               CAST(ANY_VALUE(m.med) AS BIGINT) AS med_cents,
               CAST(quantile_disc(abs(c.cents - m.med), 0.5) AS BIGINT)
                   AS mad_cents
        FROM c JOIN m USING (o_orderpriority) GROUP BY 1
    """,
    "bigram_repetition": """
        WITH l AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
                   FROM documents),
             t AS (SELECT doc_id, unnest(toks) AS tok,
                          generate_subscripts(toks, 1) AS i
                   FROM l),
             b AS (SELECT a.doc_id, a.tok || chr(31) || c.tok AS bg
                   FROM t a JOIN t c ON c.doc_id = a.doc_id AND c.i = a.i + 1),
             s AS (SELECT doc_id, COUNT(*) AS nb, COUNT(DISTINCT bg) AS nd
                   FROM b GROUP BY 1)
        SELECT l.doc_id,
               CAST(COALESCE(s.nb, 0) AS BIGINT) AS n_bigrams,
               CAST(COALESCE(s.nb - s.nd, 0) AS BIGINT) AS n_dup
        FROM l LEFT JOIN s USING (doc_id)
    """,
    "dense_rank_orders": """
        SELECT o_orderkey,
               DENSE_RANK() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) DESC)
                   AS dense_rank
        FROM orders
    """,
    "first_last_order": """
        WITH c AS (SELECT o_custkey,
                          CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents,
                          CAST(o_orderdate AS VARCHAR) AS d, o_orderkey AS k
                   FROM orders)
        SELECT DISTINCT o_custkey,
               FIRST_VALUE(cents) OVER (PARTITION BY o_custkey ORDER BY d, k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS first_cents,
               LAST_VALUE(cents) OVER (PARTITION BY o_custkey ORDER BY d, k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS last_cents
        FROM c
    """,
    "new_users_daily": """
        WITH f AS (SELECT user_id,
                          MIN(CAST(strftime(ts, '%Y%m%d') AS BIGINT)) AS day
                   FROM events GROUP BY 1),
             d AS (SELECT day, COUNT(*) AS new_users FROM f GROUP BY 1)
        SELECT day, CAST(new_users AS BIGINT) AS new_users,
               CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
        FROM d
    """,
    "corr_price_qty": """
        WITH b AS (SELECT l_returnflag,
                          CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS x,
                          CAST(l_quantity AS BIGINT) AS y
                   FROM lineitem),
             s AS (SELECT l_returnflag, COUNT(*) AS n, SUM(x) AS sx,
                          SUM(y) AS sy, SUM(x*x) AS sxx, SUM(y*y) AS syy,
                          SUM(x*y) AS sxy
                   FROM b GROUP BY 1)
        SELECT l_returnflag,
               (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
               / SQRT((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
                   AS corr_px_qty
        FROM s
    """,
    "mode_quantity_by_flag": """
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS l_quantity,
               CAST(n AS BIGINT) AS n FROM (
            SELECT l_returnflag, l_quantity, COUNT(*) AS n,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                      ORDER BY COUNT(*) DESC, l_quantity)
                       AS rn
            FROM lineitem GROUP BY 1, 2)
        WHERE rn = 1
    """,
    "group_variance": """
        WITH s AS (SELECT o_orderpriority, COUNT(*) AS n,
                          SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS sd,
                          SUM(CAST(FLOOR(o_totalprice) AS BIGINT)
                              * CAST(FLOOR(o_totalprice) AS BIGINT)) AS sdd
                   FROM orders GROUP BY 1)
        SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
               CAST(n*sdd - sd*sd AS DOUBLE) / (n*(n-1)) AS var_dollars
        FROM s WHERE n > 1
    """,
    "percent_rank_orders": """
        SELECT o_orderkey, o_orderpriority,
               PERCENT_RANK() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT),
                            o_orderkey) AS pct_rank
        FROM orders
    """,
    "winsorize_prices": """
        WITH c AS (SELECT o_orderkey, o_orderpriority,
                          CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
                   FROM orders),
        b AS (SELECT o_orderpriority,
                     quantile_disc(cents, 0.05) AS lo,
                     quantile_disc(cents, 0.95) AS hi
              FROM c GROUP BY o_orderpriority)
        SELECT c.o_orderkey,
               CAST(LEAST(GREATEST(c.cents, b.lo), b.hi) AS BIGINT) AS clipped_cents
        FROM c JOIN b USING (o_orderpriority)
    """,
    "heavy_hitters": """
        WITH c AS (
            SELECT lower(tok) AS tok, COUNT(*) AS est
            FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
                  FROM documents)
            GROUP BY 1)
        SELECT tok, CAST(est AS BIGINT) AS est, CAST(0 AS BIGINT) AS decr_bound
        FROM c ORDER BY est DESC, tok ASC LIMIT 10
    """,
    "parts_with_lineitems": """
        SELECT p_partkey, p_brand FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                            WHERE l_quantity >= 50)
    """,
    "full_outer_activity": """
        WITH o AS (SELECT o_custkey AS k, COUNT(*) AS n FROM orders
                   WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
             e AS (SELECT user_id AS k, COUNT(*) AS n FROM events GROUP BY 1)
        SELECT COALESCE(o.k, e.k) AS custkey,
               CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders,
               CAST(COALESCE(e.n, 0) AS BIGINT) AS n_events
        FROM o FULL OUTER JOIN e ON o.k = e.k
    """,
    "group_quantiles_cont": """
        WITH c AS (SELECT o_orderpriority,
                          CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
                   FROM orders)
        SELECT o_orderpriority, 'p50' AS q,
               ROUND(quantile_cont(cents, 0.5), 6) AS value
        FROM c GROUP BY o_orderpriority
        UNION ALL
        SELECT o_orderpriority, 'p90' AS q,
               ROUND(quantile_cont(cents, 0.9), 6) AS value
        FROM c GROUP BY o_orderpriority
    """,
    "pps_sample_orders": """
        WITH c AS (
            SELECT o_orderkey,
                   CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents,
                   SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       OVER (ORDER BY o_orderkey) AS cum
            FROM orders)
        SELECT o_orderkey, cents FROM c
        WHERE cum // 1000000000 > (cum - cents) // 1000000000
    """,
    "source_doc_concat": """
        WITH r AS (SELECT source, doc_id,
                          ROW_NUMBER() OVER (PARTITION BY source
                                             ORDER BY doc_id) AS rn
                   FROM documents)
        SELECT source,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS top_docs,
               COUNT(*) AS n_listed
        FROM r WHERE rn <= 3 GROUP BY source
    """,
    "topk_orders_per_customer": """
        SELECT o_custkey, o_orderkey, total_cents, rk FROM (
            SELECT o_custkey, o_orderkey,
                   CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS total_cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) DESC,
                                o_orderkey ASC) AS rk
            FROM orders)
        WHERE rk <= 3
    """,
    "cumulative_spend": """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
        FROM orders
    """,
    "group_quantiles": """
        SELECT o_orderpriority, q, value_cents FROM (
            SELECT o_orderpriority, 'p50' AS q,
                   CAST(quantile_disc(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT), 0.5) AS BIGINT) AS value_cents
            FROM orders GROUP BY o_orderpriority
            UNION ALL
            SELECT o_orderpriority, 'p90' AS q,
                   CAST(quantile_disc(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT), 0.9) AS BIGINT) AS value_cents
            FROM orders GROUP BY o_orderpriority
            UNION ALL
            SELECT o_orderpriority, 'p99' AS q,
                   CAST(quantile_disc(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT), 0.99) AS BIGINT) AS value_cents
            FROM orders GROUP BY o_orderpriority)
    """,
    "rollup_revenue": """
        SELECT COALESCE(r.r_name, 'ALL') AS region,
               COALESCE(n.n_name, 'ALL') AS nation,
               CAST(SUM(CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
    "hash_sample_docs": """
        SELECT doc_id FROM documents
        WHERE (doc_id * 2654435761) % 4294967296 < 429496729
    """,
    "pack_sequences": """
        WITH c AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
                   FROM documents),
        s AS (SELECT doc_id, n_tokens,
                     SUM(n_tokens) OVER (ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) - n_tokens AS prev
              FROM c)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(prev // 2048 AS BIGINT) AS bin_id,
               CAST(prev % 2048 AS BIGINT) AS bin_offset
        FROM s
    """,
    "stratified_sample_events": """
        SELECT event_type, event_id FROM (
            SELECT event_type, event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY (event_id * 2654435761) % 4294967296 ASC,
                                event_id ASC) AS rk
            FROM events)
        WHERE rk <= 50
    """,
    "custkeys_intersect": """
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    "custkeys_except": """
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    "word_count_top100": """
        WITH t AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
                   FROM documents)
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
        FROM t GROUP BY tok
        ORDER BY n DESC, tok ASC LIMIT 100
    """,
    "tfidf_top_term": """
        WITH toks AS (
            SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
            FROM documents),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        n AS (SELECT COUNT(*) AS n FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.tok,
                   ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 6) AS s
            FROM tf JOIN dfreq USING (tok) CROSS JOIN n)
        SELECT doc_id, tok AS top_term FROM (
            SELECT doc_id, tok,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY s DESC, tok ASC) AS rn
            FROM scored)
        WHERE rn = 1
    """,
    "brand_region_revenue": """
        SELECT p.p_brand AS brand, r.r_name AS region,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1 - l.l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    """,
    "supplier_hhi_by_nation": """
        WITH rev AS (SELECT l_suppkey,
                            SUM(CAST(FLOOR(l_extendedprice*100 + 0.5)
                                     AS BIGINT)) AS r
                     FROM lineitem GROUP BY 1),
             j AS (SELECT n.n_name, CAST(rev.r AS HUGEINT) AS r
                   FROM rev
                   JOIN supplier s ON s.s_suppkey = rev.l_suppkey
                   JOIN nation n ON n.n_nationkey = s.s_nationkey)
        SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(SUM(r*r) * 1000000 // (SUM(r) * SUM(r)) AS BIGINT)
                   AS hhi_ppm
        FROM j GROUP BY 1
    """,
    "daily_peak_drop": """
        WITH d AS (SELECT CAST(o_orderdate AS VARCHAR) AS day,
                          SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                              AS rev
                   FROM orders GROUP BY 1),
             m AS (SELECT rev, MAX(rev) OVER (ORDER BY day) AS peak FROM d)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(MAX(peak) AS BIGINT) AS peak_day_cents,
               CAST(MAX(peak - rev) AS BIGINT) AS max_peak_drop_cents
        FROM m
    """,
    "embedding_dim_stats": """
        WITH u AS (SELECT unnest(embedding) AS v,
                          generate_subscripts(embedding, 1) AS d
                   FROM embeddings),
             q AS (SELECT CAST(d - 1 AS BIGINT) AS dim,
                          CAST(FLOOR(CAST(v AS DOUBLE) * 1000000.0 + 0.5)
                               AS BIGINT) AS m
                   FROM u)
        SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(m) AS BIGINT) AS min_micro,
               CAST(MAX(m) AS BIGINT) AS max_micro,
               CAST(SUM(m) AS BIGINT) AS sum_micro
        FROM q GROUP BY 1
    """,
    "decile_transition_matrix": """
        WITH s AS (SELECT o_custkey,
                          CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
                          SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                              AS spend
                   FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                     AND o_orderdate <  TIMESTAMP '1998-01-01'
                   GROUP BY 1, 2),
             t AS (SELECT o_custkey, y,
                          NTILE(10) OVER (PARTITION BY y
                                          ORDER BY spend, o_custkey) AS tile
                   FROM s),
             p AS (SELECT COALESCE(a.tile, 0) AS d96,
                          COALESCE(b.tile, 0) AS d97
                   FROM (SELECT o_custkey, tile FROM t WHERE y = 1996) a
                   FULL OUTER JOIN
                        (SELECT o_custkey, tile FROM t WHERE y = 1997) b
                   USING (o_custkey))
        SELECT CAST(d96 AS BIGINT) AS d96, CAST(d97 AS BIGINT) AS d97,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM p GROUP BY 1, 2
    """,
    "mutual_info_priority_region": """
        WITH cr AS (SELECT c_custkey, r_name
                    FROM customer
                    JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey),
             o AS (SELECT r_name, o_orderpriority AS pr,
                          CAST(COUNT(*) AS BIGINT) AS o_ij
                   FROM orders JOIN cr ON o_custkey = c_custkey
                   GROUP BY 1, 2),
             rr AS (SELECT r_name, SUM(o_ij) AS ri FROM o GROUP BY 1),
             cc AS (SELECT pr, SUM(o_ij) AS cj FROM o GROUP BY 1),
             m AS (SELECT SUM(o_ij) AS n_tot FROM o),
             t AS (SELECT CAST(FLOOR(CAST(o_ij AS DOUBLE)
                                     * (LN(CAST(o_ij AS DOUBLE))
                                        + LN(CAST(m.n_tot AS DOUBLE))
                                        - LN(CAST(rr.ri AS DOUBLE))
                                        - LN(CAST(cc.cj AS DOUBLE)))
                                     * 1000.0 + 0.5) AS BIGINT) AS term,
                          m.n_tot
                   FROM o JOIN rr USING (r_name) JOIN cc USING (pr), m)
        SELECT CAST(n_tot AS BIGINT) AS n_orders,
               CAST(FLOOR(CAST(SUM(term) AS DOUBLE)
                          / CAST(n_tot AS DOUBLE) + 0.5) AS BIGINT)
                   AS mi_millinats
        FROM t GROUP BY n_tot
    """,
    "q10_returned_items": """
        WITH o AS (SELECT o_orderkey, o_custkey FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                     AND o_orderdate <  TIMESTAMP '1996-04-01'),
             r AS (SELECT o.o_custkey,
                          SUM(CAST(FLOOR(l_extendedprice*(1 - l_discount)*100
                                         + 0.5) AS BIGINT)) AS revenue_cents
                   FROM lineitem JOIN o ON l_orderkey = o.o_orderkey
                   WHERE l_returnflag = 'R'
                   GROUP BY 1)
        SELECT r.o_custkey, c.c_name,
               CAST(r.revenue_cents AS BIGINT) AS revenue_cents
        FROM r JOIN customer c ON c.c_custkey = r.o_custkey
        ORDER BY revenue_cents DESC, o_custkey ASC
        LIMIT 20
    """,
    "ks_click_vs_purchase": """
        WITH c AS (SELECT event_type,
                          CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS v
                   FROM events
                   WHERE event_type IN ('click', 'purchase')),
             g AS (SELECT v,
                          SUM(CASE WHEN event_type = 'click'
                                   THEN 1 ELSE 0 END) AS da,
                          SUM(CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END) AS db
                   FROM c GROUP BY 1),
             s AS (SELECT SUM(da) OVER (ORDER BY v) AS ca,
                          SUM(db) OVER (ORDER BY v) AS cb
                   FROM g),
             n AS (SELECT SUM(da) AS na, SUM(db) AS nb FROM g)
        SELECT CAST(n.na AS BIGINT) AS n_click,
               CAST(n.nb AS BIGINT) AS n_purchase,
               CAST(MAX(ABS(s.ca * n.nb - s.cb * n.na)) AS BIGINT) AS d_num
        FROM s, n GROUP BY n.na, n.nb
    """,
    "q3_shipping_priority": """
        WITH e AS (SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d')
                              AS o_orderdate
                   FROM orders JOIN customer ON o_custkey = c_custkey
                   WHERE c_mktsegment = 'BUILDING'
                     AND o_orderdate < TIMESTAMP '1996-07-01'),
             r AS (SELECT l_orderkey AS o_orderkey,
                          SUM(CAST(FLOOR(l_extendedprice*(1 - l_discount)*100
                                         + 0.5) AS BIGINT)) AS revenue_cents
                   FROM lineitem
                   WHERE l_shipdate > TIMESTAMP '1996-07-01'
                   GROUP BY 1)
        SELECT e.o_orderkey, e.o_orderdate,
               CAST(r.revenue_cents AS BIGINT) AS revenue_cents
        FROM r JOIN e USING (o_orderkey)
        ORDER BY revenue_cents DESC, o_orderdate ASC, o_orderkey ASC
        LIMIT 10
    """,
    "q6_forecast_revenue": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
                        * CAST(FLOOR(l_discount*10000 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_cents_bps
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "chi2_priority_by_region": """
        WITH cr AS (SELECT c_custkey, r_name
                    FROM customer
                    JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey),
             o AS (SELECT r_name, o_orderpriority AS pr,
                          CAST(COUNT(*) AS BIGINT) AS o_ij
                   FROM orders JOIN cr ON o_custkey = c_custkey
                   GROUP BY 1, 2),
             rr AS (SELECT r_name, SUM(o_ij) AS ri FROM o GROUP BY 1),
             cc AS (SELECT pr, SUM(o_ij) AS cj FROM o GROUP BY 1),
             grid AS (SELECT rr.r_name, cc.pr, rr.ri, cc.cj,
                             COALESCE(o.o_ij, 0) AS o_ij
                      FROM rr CROSS JOIN cc
                      LEFT JOIN o ON o.r_name = rr.r_name AND o.pr = cc.pr),
             m AS (SELECT SUM(o_ij) AS n_tot FROM grid)
        SELECT CAST(m.n_tot AS BIGINT) AS n_orders,
               CAST(SUM((CAST(o_ij AS HUGEINT) * m.n_tot
                         - CAST(ri AS HUGEINT) * cj)
                        * (CAST(o_ij AS HUGEINT) * m.n_tot
                           - CAST(ri AS HUGEINT) * cj)
                        * 1000000
                        // (CAST(m.n_tot AS HUGEINT) * ri * cj))
                    AS BIGINT) AS chi2_ppm
        FROM grid, m GROUP BY m.n_tot
    """,
    "top_bigrams_per_source": """
        WITH w AS (SELECT source,
                          regexp_extract_all(lower(text), '[a-z0-9]+') AS arr,
                          doc_id
                   FROM documents),
             t AS (SELECT source, doc_id, unnest(arr) AS tok,
                          generate_subscripts(arr, 1) AS pos FROM w),
             b AS (SELECT source, tok,
                          LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos)
                              AS nxt
                   FROM t),
             c AS (SELECT source, tok || ' ' || nxt AS bigram,
                          CAST(COUNT(*) AS BIGINT) AS n
                   FROM b WHERE nxt IS NOT NULL GROUP BY 1, 2),
             r AS (SELECT source, bigram, n,
                          ROW_NUMBER() OVER (PARTITION BY source
                                             ORDER BY n DESC, bigram ASC)
                              AS rk
                   FROM c)
        SELECT source, bigram, n, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= 3
    """,
    "theil_index_spend": """
        WITH r AS (SELECT o_custkey,
                          SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                              AS x
                   FROM orders GROUP BY 1),
             t AS (SELECT x,
                          CAST(FLOOR(CAST(x AS DOUBLE)
                                     * LN(CAST(x AS DOUBLE)) * 1000.0 + 0.5)
                               AS BIGINT) AS term
                   FROM r),
             s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(term) AS st FROM t)
        SELECT CAST(n AS BIGINT) AS n_customers,
               CAST(sx AS BIGINT) AS total_cents,
               CAST(FLOOR(CAST(st AS DOUBLE) / CAST(sx AS DOUBLE)
                          + (LN(CAST(n AS DOUBLE))
                             - LN(CAST(sx AS DOUBLE))) * 1000.0
                          + 0.5) AS BIGINT) AS theil_millinats
        FROM s
    """,
    "q4_priority_semijoin": """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o.o_orderkey
                        AND l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1 ORDER BY 1
    """,
    "q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM(CAST(FLOOR(l_extendedprice*(1 - l_discount)*100
                                   + 0.5) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "q8_market_share": """
        WITH l AS (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
                              AS o_year,
                          CAST(FLOOR(l_extendedprice*(1 - l_discount)*100
                                     + 0.5) AS BIGINT) AS cents,
                          CASE WHEN s_nationkey = 1 THEN 1 ELSE 0 END AS tgt
                   FROM lineitem
                   JOIN part     ON l_partkey = p_partkey
                   JOIN supplier ON l_suppkey = s_suppkey
                   JOIN orders   ON l_orderkey = o_orderkey
                   JOIN customer ON o_custkey = c_custkey
                   JOIN nation   ON c_nationkey = n_nationkey
                   JOIN region   ON n_regionkey = r_regionkey
                   WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
                     AND o_orderdate >= TIMESTAMP '1996-01-01'
                     AND o_orderdate <  TIMESTAMP '1998-01-01')
        SELECT o_year,
               CAST(SUM(tgt * cents) AS BIGINT) AS nation_cents,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(FLOOR(CAST(SUM(tgt * cents) AS DOUBLE) * 10000.0
                          / CAST(SUM(cents) AS DOUBLE) + 0.5) AS BIGINT)
                   AS share_bps
        FROM l GROUP BY 1 ORDER BY 1
    """,
    "q13_custdist": """
        WITH c AS (SELECT c_custkey, COUNT(o_orderkey) AS c_count
                   FROM customer LEFT JOIN orders ON o_custkey = c_custkey
                   GROUP BY 1)
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(COUNT(*) AS BIGINT) AS custdist
        FROM c GROUP BY 1 ORDER BY custdist DESC, c_count DESC
    """,
    "q14_promo_revenue": """
        WITH l AS (SELECT CAST(EXTRACT(month FROM l_shipdate) AS BIGINT)
                              AS l_month,
                          CAST(FLOOR(l_extendedprice*(1 - l_discount)*100
                                     + 0.5) AS BIGINT) AS cents,
                          CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END
                              AS promo
                   FROM lineitem JOIN part ON l_partkey = p_partkey
                   WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                     AND l_shipdate <  TIMESTAMP '1997-01-01')
        SELECT l_month,
               CAST(SUM(promo * cents) AS BIGINT) AS promo_cents,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(FLOOR(CAST(SUM(promo * cents) AS DOUBLE) * 10000.0
                          / CAST(SUM(cents) AS DOUBLE) + 0.5) AS BIGINT)
                   AS promo_bps
        FROM l GROUP BY 1 ORDER BY 1
    """,
    "q15_top_supplier": """
        WITH r AS (SELECT l_suppkey AS s_suppkey,
                          SUM(CAST(FLOOR(l_extendedprice*(1 - l_discount)*100
                                         + 0.5) AS BIGINT)) AS total_cents
                   FROM lineitem
                   WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                     AND l_shipdate <  TIMESTAMP '1996-04-01'
                   GROUP BY 1)
        SELECT r.s_suppkey, s.s_name,
               CAST(r.total_cents AS BIGINT) AS total_cents
        FROM r JOIN supplier s USING (s_suppkey)
        WHERE r.total_cents = (SELECT MAX(total_cents) FROM r)
        ORDER BY r.s_suppkey
    """,
    "q17_small_qty_revenue": """
        WITH t AS (SELECT l_partkey,
                          0.2 * (SUM(l_quantity) / COUNT(*)) AS thr
                   FROM lineitem GROUP BY 1),
             s AS (SELECT l_extendedprice
                   FROM lineitem JOIN t USING (l_partkey)
                   WHERE l_quantity < thr)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
               CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents,
               CAST(FLOOR(CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5)
                                        AS BIGINT)) AS DOUBLE) / 7.0 + 0.5)
                    AS BIGINT) AS avg_yearly_cents
        FROM s
    """,
    "q18_large_orders": """
        WITH q AS (SELECT l_orderkey, SUM(l_quantity) AS sq
                   FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 250)
        SELECT c_name, o_custkey, o_orderkey, o_orderdate,
               CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS total_cents,
               CAST(sq AS BIGINT) AS sum_qty
        FROM orders JOIN q ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY sum_qty DESC, o_orderkey
    """,
    "q19_disjunctive_pred": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_matched,
               CAST(SUM(CAST(FLOOR(l_extendedprice*(1 - l_discount)*100
                                   + 0.5) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q9_profit": """
        SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(FLOOR(l_extendedprice*(1 - l_discount)*100
                                   + 0.5) AS BIGINT)
                        - CAST(FLOOR(l_quantity*p_retailprice*10
                                     + 0.5) AS BIGINT)) AS BIGINT)
                   AS profit_cents
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q12_late_lines": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY 1
    """,
    "q16_supplier_cnt": """
        SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#13' AND p_type <> 'ECONOMY'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "q21_waiting_supplier": """
        WITH l AS (SELECT l_orderkey, l_suppkey,
                          MAX(CASE WHEN l_shipdate > o_orderdate
                                        + INTERVAL 60 DAY
                                   THEN 1 ELSE 0 END) AS late
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                   WHERE o_orderstatus = 'F'
                   GROUP BY 1, 2),
        w AS (SELECT l_orderkey FROM l GROUP BY 1
              HAVING COUNT(*) >= 2 AND SUM(late) = 1)
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM l JOIN w USING (l_orderkey)
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE late = 1 GROUP BY 1 ORDER BY 1
    """,
    "q22_idle_rich": """
        WITH c AS (SELECT c_custkey,
                          CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
                          CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT)
                              AS bal_cents
                   FROM customer WHERE c_nationkey % 5 IN (0, 2, 3)),
        t AS (SELECT CAST(SUM(bal_cents) AS BIGINT) AS tot,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM c WHERE bal_cents > 0)
        SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(bal_cents) AS BIGINT) AS totacctbal_cents
        FROM c, t
        WHERE bal_cents * cnt > tot
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY 1
    """,
    "ewma_daily_revenue": """
        WITH RECURSIVE d AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                          CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5)
                                        AS BIGINT)) AS BIGINT) AS rev_cents
                   FROM orders GROUP BY 1),
        o AS (SELECT day, rev_cents,
                     ROW_NUMBER() OVER (ORDER BY day) AS rn FROM d),
        r AS (
            SELECT day, rev_cents, rn, rev_cents AS ewma_cents
            FROM o WHERE rn = 1
            UNION ALL
            SELECT o.day, o.rev_cents, o.rn,
                   (r.ewma_cents + o.rev_cents) // 2
            FROM o JOIN r ON o.rn = r.rn + 1)
        SELECT day, rev_cents, CAST(ewma_cents AS BIGINT) AS ewma_cents
        FROM r
    """,
    "cusum_daily_orders": """
        WITH RECURSIVE d AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                          CAST(COUNT(*) AS BIGINT) AS n_orders
                   FROM orders GROUP BY 1),
        k AS (SELECT (SUM(n_orders) * 1000) // COUNT(*) AS k FROM d),
        o AS (SELECT day, n_orders,
                     ROW_NUMBER() OVER (ORDER BY day) AS rn FROM d),
        r AS (
            SELECT o.day, o.n_orders, o.rn,
                   GREATEST(0, o.n_orders * 1000 - k.k) AS cusum_milli
            FROM o, k WHERE rn = 1
            UNION ALL
            SELECT o.day, o.n_orders, o.rn,
                   GREATEST(0, r.cusum_milli + o.n_orders * 1000 - k.k)
            FROM o JOIN r ON o.rn = r.rn + 1, k)
        SELECT day, n_orders, CAST(cusum_milli AS BIGINT) AS cusum_milli
        FROM r
    """,
    "pagerank_2iter": """
        WITH l AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pairs AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
                  FROM l a JOIN l b USING (l_orderkey)
                  WHERE a.l_partkey < b.l_partkey),
        e AS (SELECT pa AS src, pb AS dst FROM pairs
              UNION ALL SELECT pb, pa FROM pairs),
        deg AS (SELECT src AS node, COUNT(*) AS d FROM e GROUP BY 1),
        s1 AS (SELECT e.dst AS node,
                      150000 + (85 * SUM(1000000 // d.d)) // 100 AS s
               FROM e JOIN deg d ON e.src = d.node GROUP BY e.dst),
        s2 AS (SELECT e.dst AS node,
                      150000 + (85 * SUM(s1.s // d.d)) // 100 AS s
               FROM e JOIN s1 ON e.src = s1.node
               JOIN deg d ON e.src = d.node GROUP BY e.dst)
        SELECT CAST(node AS BIGINT) AS part, CAST(s AS BIGINT) AS pr_ppm
        FROM s2 ORDER BY 1
    """,
    "two_hop_reach": """
        WITH l AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pairs AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
                  FROM l a JOIN l b USING (l_orderkey)
                  WHERE a.l_partkey < b.l_partkey),
        e AS (SELECT pa AS src, pb AS dst FROM pairs
              UNION ALL SELECT pb, pa FROM pairs),
        deg AS (SELECT src AS node, COUNT(*) AS d FROM e GROUP BY 1),
        seeds AS (SELECT node FROM deg ORDER BY d DESC, node ASC LIMIT 20),
        hop1 AS (SELECT s.node AS seed, e.dst AS nb
                 FROM seeds s JOIN e ON e.src = s.node),
        reach AS (SELECT seed, nb FROM hop1
                  UNION
                  SELECT h.seed, e.dst FROM hop1 h JOIN e ON e.src = h.nb)
        SELECT CAST(seed AS BIGINT) AS part,
               CAST(COUNT(DISTINCT nb) AS BIGINT) AS n_within_2
        FROM reach WHERE nb <> seed GROUP BY 1 ORDER BY 1
    """,
    "embedding_quantize_error": """
        WITH u AS (SELECT vec_id, label,
                          CAST(unnest(embedding) AS DOUBLE) AS v
                   FROM embeddings),
        m AS (SELECT vec_id, MAX(ABS(v)) AS mx FROM u GROUP BY 1),
        e AS (SELECT u.vec_id, u.label,
                     CAST(FLOOR(ABS(u.v
                          - GREATEST(-127.0, LEAST(127.0,
                                FLOOR(u.v * (127.0 / m.mx) + 0.5)))
                            / (127.0 / m.mx)) * 1000000.0 + 0.5) AS BIGINT)
                         AS err
              FROM u JOIN m USING (vec_id) WHERE m.mx > 0)
        SELECT CAST(label AS BIGINT) AS label,
               CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_vecs,
               CAST(SUM(err) AS BIGINT) AS sum_err_micro,
               CAST(MAX(err) AS BIGINT) AS max_err_micro
        FROM e GROUP BY 1
    """,
    "embedding_l2_pair_hist": """
        WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                          CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)
                                     * 1000000.0 + 0.5) AS BIGINT) AS q
                   FROM embeddings),
        p AS (SELECT a.vec_id,
                     SUM((a.q - b.q) * (a.q - b.q)) AS d2
              FROM u a JOIN u b ON b.vec_id = a.vec_id + 100 AND b.i = a.i
              GROUP BY 1)
        SELECT CAST(d2 // 1000000000000 AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM p GROUP BY 1
    """,
    "hapax_ratio_by_source": """
        WITH t AS (SELECT source,
                          unnest(regexp_extract_all(lower(text),
                                                    '[a-z0-9]+')) AS tok
                   FROM documents),
        f AS (SELECT source, tok, COUNT(*) AS n FROM t GROUP BY 1, 2)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hapax,
               CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 10000
                    // COUNT(*) AS BIGINT) AS hapax_bps
        FROM f GROUP BY 1
    """,
    "grouping_sets_revenue": """
        SELECT COALESCE(o_orderpriority, 'ALL') AS pri,
               COALESCE(o_orderstatus, 'ALL') AS st,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
    "trimmed_mean_qty": """
        WITH r AS (SELECT l_returnflag,
                          CAST(l_quantity AS BIGINT) AS q,
                          ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                             ORDER BY l_quantity) AS rn,
                          COUNT(*) OVER (PARTITION BY l_returnflag) AS n
                   FROM lineitem)
        SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                             THEN q ELSE 0 END) AS BIGINT) AS trimmed_sum,
               CAST(SUM(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                             THEN q ELSE 0 END) * 1000
                    // (MAX(n) - 2 * (MAX(n) // 10)) AS BIGINT)
                   AS trimmed_mean_milli
        FROM r GROUP BY 1
    """,
    "rolling_median_daily_orders": """
        WITH d AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                          CAST(COUNT(*) AS BIGINT) AS n_orders
                   FROM orders GROUP BY 1)
        SELECT day, n_orders,
               CAST(QUANTILE_DISC(n_orders, 0.5) OVER (
                        ORDER BY day
                        ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
                    AS BIGINT) AS med3
        FROM d
    """,
    "q11_part_value": """
        WITH v AS (SELECT l_partkey AS p_partkey,
                          CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5)
                                        AS BIGINT)) AS BIGINT) AS value_cents
                   FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                   WHERE s_nationkey = 3 GROUP BY 1)
        SELECT p_partkey, value_cents FROM v
        WHERE value_cents * 1000 > (SELECT CAST(SUM(value_cents) AS BIGINT)
                                    FROM v)
        ORDER BY 1
    """,
    "spearman_d2_brand": """
        WITH l AS (SELECT p_brand, l_orderkey, l_linenumber,
                          CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
                              AS price_cents,
                          CAST(l_quantity AS BIGINT) AS qty
                   FROM lineitem JOIN part ON l_partkey = p_partkey),
        r AS (SELECT p_brand,
                     -- doubled AVERAGE rank = 2*RANK + tiecount - 1 (integer)
                     2 * RANK() OVER (PARTITION BY p_brand
                             ORDER BY price_cents)
                       + COUNT(*) OVER (PARTITION BY p_brand, price_cents)
                       - 1 AS rp2,
                     2 * RANK() OVER (PARTITION BY p_brand
                             ORDER BY qty)
                       + COUNT(*) OVER (PARTITION BY p_brand, qty)
                       - 1 AS rq2
              FROM l)
        SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM((rp2 - rq2) * (rp2 - rq2)) AS BIGINT) AS sum_d2x4
        FROM r GROUP BY 1
    """,
    "hoover_index_spend": """
        WITH spend AS (SELECT o_custkey,
                              CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5)
                                            AS BIGINT)) AS BIGINT) AS x
                       FROM orders GROUP BY 1),
        tagged AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey, x
                   FROM spend JOIN customer ON o_custkey = c_custkey),
        ns AS (SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(x) AS BIGINT) AS s
               FROM tagged GROUP BY 1)
        SELECT t.nationkey, MAX(ns.n) AS n,
               MAX(ns.s) AS spend_cents,
               CAST(SUM(ABS(ns.n * t.x - ns.s)) * 1000000
                    // (2 * MAX(ns.n) * MAX(ns.s)) AS BIGINT) AS hoover_ppm
        FROM tagged t JOIN ns USING (nationkey)
        GROUP BY 1
    """,
    "second_third_order": """
        WITH r AS (SELECT o_custkey,
                          CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                              AS cents,
                          ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rn,
                          COUNT(*) OVER (PARTITION BY o_custkey) AS n
                   FROM orders)
        SELECT o_custkey,
               CAST(MAX(CASE WHEN rn = 2 THEN cents END) AS BIGINT)
                   AS second_cents,
               CAST(MAX(CASE WHEN rn = 3 THEN cents END) AS BIGINT)
                   AS third_cents
        FROM r WHERE n >= 3 GROUP BY 1
    """,
    "brand_top3_names": """
        WITH r AS (SELECT p_brand, p_name,
                          ROW_NUMBER() OVER (PARTITION BY p_brand
                              ORDER BY CAST(FLOOR(p_retailprice*100 + 0.5)
                                            AS BIGINT) DESC,
                                       p_partkey) AS rn
                   FROM part)
        SELECT p_brand, STRING_AGG(p_name, '|' ORDER BY rn) AS top3_names
        FROM r WHERE rn <= 3 GROUP BY 1
    """,
    # business days in (order, ship]: W(m) = 5*(m//7) + least(m%7+1, 5) with
    # m = days since Monday 1969-12-29 — the identical closed form the engine
    # evaluates (m >= 0 for all dates here, so // truncation == floor)
    "bizday_ship_delay_hist": """
        WITH d AS (SELECT datediff('day', DATE '1969-12-29',
                                   CAST(o.o_orderdate AS DATE)) AS ma,
                          datediff('day', DATE '1969-12-29',
                                   CAST(l.l_shipdate AS DATE)) AS mb
                   FROM lineitem l JOIN orders o
                        ON l.l_orderkey = o.o_orderkey),
             w AS (SELECT (5*(mb//7) + LEAST(mb%7 + 1, 5))
                        - (5*(ma//7) + LEAST(ma%7 + 1, 5)) AS bizdays
                   FROM d)
        SELECT CAST(bizdays AS BIGINT) AS bizdays,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM w GROUP BY 1
    """,
    "peak_active_customers": """
        WITH iv AS (SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS a,
                           MAX(CAST(o_orderdate AS DATE)) AS b
                    FROM orders GROUP BY 1),
             d AS (SELECT a AS day, 1 AS delta FROM iv
                   UNION ALL SELECT b + 1, -1 FROM iv),
             s AS (SELECT day, CAST(SUM(delta) AS BIGINT) AS dd
                   FROM d GROUP BY 1),
             c AS (SELECT day, SUM(dd) OVER (ORDER BY day) AS conc FROM s)
        SELECT CAST(conc AS BIGINT) AS peak,
               CAST(MIN(day) AS VARCHAR) AS peak_day
        FROM c WHERE conc = (SELECT MAX(conc) FROM c) GROUP BY conc
    """,
    "increasing_run_hist": """
        WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
                          CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                              AS cents
                   FROM orders),
             l AS (SELECT *, CASE WHEN cents > LAG(cents) OVER w
                                  THEN 0 ELSE 1 END AS brk
                   FROM o WINDOW w AS (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey)),
             g AS (SELECT *, SUM(brk) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey
                                            ROWS UNBOUNDED PRECEDING) AS grp
                   FROM l),
             r AS (SELECT o_custkey, grp, COUNT(*) AS run_len
                   FROM g GROUP BY 1, 2),
             m AS (SELECT o_custkey, MAX(run_len) AS max_run
                   FROM r GROUP BY 1)
        SELECT CAST(max_run AS BIGINT) AS max_run,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM m GROUP BY 1
    """,
    # PMI ratio as the exact scaled rational c_xy*N_uni^2*1e6 //
    # (N_bi*c_x*c_y) — HUGEINT keeps every product exact; numerator and
    # divisor are positive so // truncation == floor
    "token_pmi_top": """
        WITH w AS (SELECT doc_id,
                          regexp_extract_all(lower(text), '[a-z0-9]+') AS arr
                   FROM documents),
             t AS (SELECT doc_id, unnest(arr) AS tok,
                          generate_subscripts(arr, 1) AS pos FROM w),
             u AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cn
                   FROM t GROUP BY 1),
             nu AS (SELECT CAST(SUM(cn) AS BIGINT) AS n_uni FROM u),
             b AS (SELECT doc_id, tok,
                          LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos)
                              AS nxt
                   FROM t),
             c AS (SELECT tok || ' ' || nxt AS bigram, tok AS x, nxt AS y,
                          CAST(COUNT(*) AS BIGINT) AS n
                   FROM b WHERE nxt IS NOT NULL GROUP BY 1, 2, 3),
             nb AS (SELECT CAST(SUM(n) AS BIGINT) AS n_bi FROM c),
             s AS (SELECT c.bigram, c.n,
                          CAST((CAST(c.n AS HUGEINT) * nu.n_uni * nu.n_uni
                                * 1000000)
                               // (CAST(nb.n_bi AS HUGEINT) * ux.cn * uy.cn)
                               AS BIGINT) AS pmi_ppm
                   FROM c
                   CROSS JOIN nu CROSS JOIN nb
                   JOIN u ux ON ux.tok = c.x
                   JOIN u uy ON uy.tok = c.y
                   WHERE c.n >= 5),
             r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY pmi_ppm DESC,
                                                bigram ASC) AS rk
                   FROM s)
        SELECT bigram, n, pmi_ppm, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= 20
    """,
    # centered-product autocorrelation in n^2-scaled integers; the final
    # floor division emulates Python's // for a possibly-negative numerator
    # via (a - ((a % b + b) % b)) / b (DuckDB // truncates toward zero)
    "autocorr_daily_orders": """
        WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                          CAST(COUNT(*) AS BIGINT) AS x
                   FROM orders GROUP BY 1),
             t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                          CAST(SUM(x) AS HUGEINT) AS s
                   FROM d),
             p AS (SELECT day, x, LAG(x) OVER (ORDER BY day) AS px FROM d),
             num AS (SELECT CAST(SUM((t.n*p.x - t.s) * (t.n*p.px - t.s))
                                 AS HUGEINT) AS v
                     FROM p CROSS JOIN t WHERE p.px IS NOT NULL),
             den AS (SELECT CAST(SUM((t.n*d.x - t.s) * (t.n*d.x - t.s))
                                 AS HUGEINT) AS v
                     FROM d CROSS JOIN t)
        SELECT (SELECT CAST(n AS BIGINT) FROM t) AS n_days,
               CAST((num.v*1000000
                     - (((num.v*1000000 % den.v) + den.v) % den.v))
                    // den.v AS BIGINT) AS autocorr_ppm
        FROM num CROSS JOIN den
    """,
    # exact third-central-moment numerator in HUGEINT; VARCHAR so both
    # sides stringify identically beyond int64
    "moment3_qty_by_flag": """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(COUNT(*) AS HUGEINT) * COUNT(*)
                        * SUM(CAST(l_quantity AS BIGINT)
                              * CAST(l_quantity AS BIGINT)
                              * CAST(l_quantity AS BIGINT))
                    - 3 * CAST(COUNT(*) AS HUGEINT)
                        * SUM(CAST(l_quantity AS BIGINT))
                        * SUM(CAST(l_quantity AS BIGINT)
                              * CAST(l_quantity AS BIGINT))
                    + 2 * CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT)
                        * SUM(CAST(l_quantity AS BIGINT))
                        * SUM(CAST(l_quantity AS BIGINT))
                    AS VARCHAR) AS m3_num
        FROM lineitem GROUP BY l_returnflag
    """,
    # islands via LEFT JOIN on the shifted key — the LAG-free formulation
    # the engine's tagged-union reduce mirrors
    "price_point_islands": """
        WITH k AS (SELECT DISTINCT
                          CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) // 100
                              AS kk
                   FROM orders)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(CASE WHEN b.kk IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_islands,
               CAST(MAX(a.kk) - MIN(a.kk) + 1 - COUNT(*)
                    AS BIGINT) AS n_missing,
               CAST(MIN(a.kk) AS BIGINT) AS min_point,
               CAST(MAX(a.kk) AS BIGINT) AS max_point
        FROM k a LEFT JOIN k b ON b.kk = a.kk - 1
    """,
    "token_first_position": """
        SELECT CAST(CASE WHEN p = 0 THEN -1 ELSE p // 10 END
                    AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT COALESCE(list_position(string_split(text, ' '), 'the'),
                              0) AS p
              FROM documents)
        GROUP BY 1
    """,
    "locf_gapfill_daily": """
        WITH bounds AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
                               CAST(MAX(o_orderdate) AS DATE) AS hi
                        FROM orders),
        spine AS (SELECT CAST(UNNEST(generate_series(lo, hi,
                                                     INTERVAL 1 DAY))
                              AS DATE) AS d
                  FROM bounds),
        urgent AS (SELECT CAST(o_orderdate AS DATE) AS d,
                          CAST(COUNT(*) AS BIGINT) AS n,
                          MAX(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                              AS mx
                   FROM orders WHERE o_orderpriority = '1-URGENT'
                   GROUP BY 1)
        SELECT strftime(s.d, '%Y-%m-%d') AS day,
               COALESCE(u.n, 0) AS n_urgent,
               COALESCE(LAST_VALUE(u.mx IGNORE NULLS)
                            OVER (ORDER BY s.d ROWS UNBOUNDED PRECEDING),
                        0) AS locf_cents
        FROM spine s LEFT JOIN urgent u ON u.d = s.d
    """,
    "partition_balance_audit": """
        WITH c AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                          AS cents
                   FROM orders),
        b AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi,
                     COUNT(*) AS tot
              FROM c)
        SELECT CAST(LEAST((cents - lo) * 32 // (hi - lo + 1), 31)
                    AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) * 10000 // MAX(tot) AS BIGINT) AS share_bps
        FROM c CROSS JOIN b
        GROUP BY 1
    """,
    # KMV sketch: ORDER BY hash LIMIT k reproduces the engine's mergeable
    # k-smallest reduce exactly (odd Knuth multiplier is injective < 2^32)
    "kmv_distinct_users": """
        WITH h AS (SELECT DISTINCT (user_id * 2654435761) % 4294967296 AS hh
                   FROM events),
        k AS (SELECT hh FROM h ORDER BY hh LIMIT 64),
        nd AS (SELECT COUNT(*) AS n FROM h)
        SELECT CAST(64 AS BIGINT) AS k,
               CAST(MAX(hh) AS BIGINT) AS kth_hash,
               CAST(CASE WHEN (SELECT n FROM nd) < 64 THEN (SELECT n FROM nd)
                         ELSE 63 * 4294967296 // MAX(hh) END
                    AS BIGINT) AS est_distinct
        FROM k
    """,
    "loo_target_encoding": """
        WITH g AS (SELECT o_orderpriority,
                          SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                              AS s,
                          COUNT(*) AS n
                   FROM orders GROUP BY 1)
        SELECT o_orderkey,
               CAST((1000 * (g.s - CAST(FLOOR(o_totalprice*100 + 0.5)
                                        AS BIGINT))) // (g.n - 1)
                    AS BIGINT) AS loo_milli
        FROM orders JOIN g USING (o_orderpriority)
        WHERE g.n > 1
    """,
    "integrity_audit": """
        SELECT * FROM (
            SELECT 'dup_orderkeys' AS check_name,
                   CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                       AS n_bad
            FROM orders
            UNION ALL
            SELECT 'lineitem_orphans', CAST(COUNT(*) AS BIGINT)
            FROM lineitem l LEFT JOIN orders o ON l_orderkey = o_orderkey
            WHERE o_orderkey IS NULL
            UNION ALL
            SELECT 'negative_price', CAST(COUNT(*) AS BIGINT)
            FROM lineitem WHERE l_extendedprice < 0
            UNION ALL
            SELECT 'null_text_docs', CAST(COUNT(*) AS BIGINT)
            FROM documents WHERE text IS NULL
            UNION ALL
            SELECT 'orders_orphan_cust', CAST(COUNT(*) AS BIGINT)
            FROM orders o LEFT JOIN customer c ON o_custkey = c_custkey
            WHERE c_custkey IS NULL
            UNION ALL
            SELECT 'ship_before_order', CAST(COUNT(*) AS BIGINT)
            FROM lineitem l JOIN orders o ON l_orderkey = o_orderkey
            WHERE l_shipdate < o_orderdate
        )
    """,
    "iso_week_revenue": """
        SELECT CAST(isoyear(o_orderdate) AS BIGINT) AS iso_year,
               CAST(week(o_orderdate) AS BIGINT) AS iso_week,
               CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1, 2
    """,
    "bag_except_partkeys": """
        WITH c AS (SELECT l_partkey,
                          COUNT(*) FILTER (year(l_shipdate) = 1997) AS c97,
                          COUNT(*) FILTER (year(l_shipdate) = 1998) AS c98
                   FROM lineitem
                   WHERE year(l_shipdate) IN (1997, 1998)
                   GROUP BY 1)
        SELECT l_partkey, CAST(c97 - c98 AS BIGINT) AS excess
        FROM c WHERE c97 > c98
    """,
    # PERCENTILE_DISC at dyadic quantiles — ceil(k·n/32) is float-exact
    "equidepth_boundaries": """
        WITH c AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                          AS cents
                   FROM orders),
        q AS (SELECT quantile_disc(cents,
                         list_transform(range(1, 32), x -> x/32.0)) AS qs
              FROM c)
        SELECT CAST(k AS BIGINT) AS k,
               CAST(qs[CAST(k AS INTEGER)] AS BIGINT) AS boundary
        FROM q CROSS JOIN (SELECT UNNEST(range(1, 32)) AS k) ks
    """,
    # the SQL rebuilds the SAME 65536-bit 2-hash Bloom filter from plain
    # integer arithmetic — the sketch itself is under test
    "bloom_fp_audit": """
        WITH build AS (SELECT DISTINCT l_partkey AS k FROM lineitem
                       WHERE year(l_shipdate) = 1997 AND l_discount > 0.08),
        probe AS (SELECT DISTINCT l_partkey AS k FROM lineitem
                  WHERE year(l_shipdate) = 1998),
        bits AS (SELECT DISTINCT b FROM (
                     SELECT (k * 2654435761) % 65536 AS b FROM build
                     UNION ALL
                     SELECT (k * 2246822519 + 11) % 65536 FROM build)),
        p AS (SELECT k,
                     (k * 2654435761) % 65536 IN (SELECT b FROM bits)
                         AND (k * 2246822519 + 11) % 65536
                                 IN (SELECT b FROM bits) AS pass,
                     k IN (SELECT k FROM build) AS tru
              FROM probe)
        SELECT CAST((SELECT COUNT(*) FROM build) AS BIGINT) AS n_build,
               CAST(COUNT(*) AS BIGINT) AS n_probe,
               CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS n_bits_set,
               CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pass,
               CAST(SUM(CASE WHEN tru THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_true,
               CAST(SUM(CASE WHEN pass AND NOT tru THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_false_pos
        FROM p
    """,
    "pct_of_parent_revenue": """
        WITH nat AS (SELECT n_regionkey, n_name,
                            CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5)
                                          AS BIGINT)) AS BIGINT) AS cents
                     FROM orders
                     JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
                     GROUP BY 1, 2)
        SELECT r_name AS region_name, n_name AS nation_name, cents,
               CAST(cents * 10000 // SUM(cents) OVER (PARTITION BY
                                                      n_regionkey)
                    AS BIGINT) AS share_bps
        FROM nat JOIN region ON n_regionkey = r_regionkey
    """,
    # the SQL rebuilds the SAME 2×1024 Count-Min cell array from plain
    # integer hashes — sketch under test, not just its answers
    "cms_estimate_audit": """
        WITH cnt AS (SELECT l_partkey AS k, COUNT(*) AS c
                     FROM lineitem GROUP BY 1),
        r1 AS (SELECT (k * 2654435761) % 1024 AS cell, SUM(c) AS s
               FROM cnt GROUP BY 1),
        r2 AS (SELECT (k * 2246822519 + 11) % 1024 AS cell, SUM(c) AS s
               FROM cnt GROUP BY 1),
        top AS (SELECT k, c FROM cnt ORDER BY c DESC, k LIMIT 10)
        SELECT k AS l_partkey,
               CAST(c AS BIGINT) AS true_cnt,
               CAST(LEAST(r1.s, r2.s) AS BIGINT) AS cms_est,
               CAST(LEAST(r1.s, r2.s) - c AS BIGINT) AS overest
        FROM top
        JOIN r1 ON (k * 2654435761) % 1024 = r1.cell
        JOIN r2 ON (k * 2246822519 + 11) % 1024 = r2.cell
    """,
    "ams_f2_audit": """
        WITH cnt AS (SELECT l_partkey AS k, COUNT(*) AS c
                     FROM lineitem GROUP BY 1),
        x AS (SELECT
                  SUM(c * c) AS f2,
                  SUM((1 - 2 * ((k * 2654435761 >> 7) & 1)) * c) AS x0,
                  SUM((1 - 2 * ((k * 2246822519 >> 7) & 1)) * c) AS x1,
                  SUM((1 - 2 * ((k * 3266489917 >> 7) & 1)) * c) AS x2,
                  SUM((1 - 2 * ((k * 668265263 >> 7) & 1)) * c) AS x3
              FROM cnt)
        SELECT CAST(f2 AS BIGINT) AS f2_exact,
               CAST((x0*x0 + x1*x1 + x2*x2 + x3*x3) // 4 AS BIGINT)
                   AS ams_mean,
               CAST(LEAST(x0*x0, x1*x1, x2*x2, x3*x3) AS BIGINT) AS ams_min,
               CAST(GREATEST(x0*x0, x1*x1, x2*x2, x3*x3) AS BIGINT)
                   AS ams_max
        FROM x
    """,
    "div_customers_all_years": """
        SELECT o_custkey FROM (
            SELECT o_custkey,
                   COUNT(DISTINCT year(o_orderdate)) AS ny
            FROM orders
            WHERE year(o_orderdate) BETWEEN 1995 AND 2000
            GROUP BY 1)
        WHERE ny = 6
    """,
    "median_via_bisection": """
        SELECT CAST(quantile_disc(CAST(FLOOR(l_extendedprice*100 + 0.5)
                                       AS BIGINT), 0.5) AS BIGINT)
                   AS median_cents,
               CAST((COUNT(*) + 1) // 2 AS BIGINT) AS rank_target
        FROM lineitem
    """,
    # bit-by-bit Σ((x>>i)&1)·4^i reconstruction — disjoint from the
    # engine's magic-shift spread
    "zorder_bucket_hist": """
        WITH z AS (SELECT (
              ((l_partkey >> 0) & 1) * 1 + ((l_partkey >> 1) & 1) * 4
            + ((l_partkey >> 2) & 1) * 16 + ((l_partkey >> 3) & 1) * 64
            + ((l_partkey >> 4) & 1) * 256 + ((l_partkey >> 5) & 1) * 1024
            + ((l_partkey >> 6) & 1) * 4096
            + ((l_partkey >> 7) & 1) * 16384
            + 2 * (((l_suppkey >> 0) & 1) * 1 + ((l_suppkey >> 1) & 1) * 4
                 + ((l_suppkey >> 2) & 1) * 16 + ((l_suppkey >> 3) & 1) * 64
                 + ((l_suppkey >> 4) & 1) * 256
                 + ((l_suppkey >> 5) & 1) * 1024
                 + ((l_suppkey >> 6) & 1) * 4096
                 + ((l_suppkey >> 7) & 1) * 16384)) AS zz
               FROM lineitem)
        SELECT CAST(zz // 1024 AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM z GROUP BY 1
    """,
    "boilerplate_prefix_families": """
        WITH p AS (SELECT array_to_string(
                       list_slice(string_split(text, ' '), 1, 5), ' ')
                       AS prefix
                   FROM documents)
        SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM p GROUP BY 1 HAVING COUNT(*) >= 2
    """,
    "event_hourly_dedup_counts": """
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM (SELECT DISTINCT user_id, event_type,
                              date_trunc('hour', ts) AS h
              FROM events)
        GROUP BY 1
    """,
    "table_checksum_orders": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM((o_orderkey * 2654435761
                         + o_custkey * 2246822519
                         + CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                           * 3266489917) % 2147483648)
                    % 2147483648 AS BIGINT) AS checksum
        FROM orders
    """,
    "type_user_bitmap_overlap": """
        WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
        pairs AS (SELECT t1.t AS type_a, t2.t AS type_b
                  FROM (VALUES ('click'), ('error'), ('purchase'),
                               ('signup'), ('view')) t1(t),
                       (VALUES ('click'), ('error'), ('purchase'),
                               ('signup'), ('view')) t2(t)
                  WHERE t1.t < t2.t),
        j AS (SELECT a.event_type AS ta, b.event_type AS tb,
                     COUNT(*) AS c
              FROM d a JOIN d b ON a.user_id = b.user_id
                   AND a.event_type < b.event_type
              GROUP BY 1, 2)
        SELECT type_a, type_b,
               CAST(COALESCE(c, 0) AS BIGINT) AS n_users_both
        FROM pairs LEFT JOIN j ON ta = type_a AND tb = type_b
    """,
    # binary-string length minus one == ⌊log2⌋, no float rounding hazard
    "log2_price_hist": """
        SELECT CAST(length(printf('%b',
                        CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)))
                    - 1 AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        WHERE FLOOR(o_totalprice*100 + 0.5) > 0
        GROUP BY 1
    """,
    "hamilton_apportionment": """
        WITH c AS (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n
                   FROM customer GROUP BY 1),
        q AS (SELECT c_nationkey, n, n * 1000 AS quota,
                     (SELECT SUM(n) FROM c) AS tot
              FROM c),
        b AS (SELECT c_nationkey, n, quota // tot AS base,
                     quota % tot AS rem
              FROM q),
        r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, c_nationkey)
                            AS rk,
                     1000 - SUM(base) OVER () AS bonus
              FROM b)
        SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
               n AS n_customers,
               CAST(base + CASE WHEN rk <= bonus THEN 1 ELSE 0 END
                    AS BIGINT) AS seats
        FROM r
    """,
    "global_row_numbering": """
        WITH r AS (SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn,
                          o_orderkey AS k
                   FROM orders)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM((rn * ((k % 1048576) + 1)) % 2147483648)
                    % 2147483648 AS BIGINT) AS checksum
        FROM r
    """,
    "source_hist_intersection": """
        WITH h AS (SELECT source, n_chars // 100 AS bucket,
                          CAST(COUNT(*) AS BIGINT) AS n
                   FROM documents GROUP BY 1, 2),
        s AS (SELECT source, bucket,
                     n * 1000 // SUM(n) OVER (PARTITION BY source) AS share
              FROM h),
        p AS (SELECT a.source AS sa, b.source AS sb,
                     SUM(LEAST(a.share, b.share)) AS ipm
              FROM s a JOIN s b ON a.bucket = b.bucket
                   AND a.source < b.source
              GROUP BY 1, 2),
        pairs AS (SELECT a.source AS source_a, b.source AS source_b
                  FROM (SELECT DISTINCT source FROM documents) a,
                       (SELECT DISTINCT source FROM documents) b
                  WHERE a.source < b.source)
        SELECT source_a, source_b,
               CAST(COALESCE(ipm, 0) AS BIGINT) AS intersection_pm
        FROM pairs LEFT JOIN p ON sa = source_a AND sb = source_b
    """,
    "schema_evolution_union": """
        WITH u AS (
            SELECT o_orderkey, o_totalprice,
                   CAST(NULL AS VARCHAR) AS o_orderpriority, 1 AS gen
            FROM orders WHERE o_orderkey % 2 = 0
            UNION ALL BY NAME
            SELECT o_orderkey, o_totalprice, o_orderpriority, 2 AS gen
            FROM orders WHERE o_orderkey % 2 = 1)
        SELECT CAST(SUM(CASE WHEN gen = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_gen1,
               CAST(SUM(CASE WHEN gen = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_gen2,
               CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null_priority,
               CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_with_priority,
               CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM u
    """,
    "linear_interp_gapfill": """
        WITH bounds AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
                               CAST(MAX(o_orderdate) AS DATE) AS hi
                        FROM orders),
        spine AS (SELECT CAST(UNNEST(generate_series(lo, hi,
                                                     INTERVAL 1 DAY))
                              AS DATE) AS d
                  FROM bounds),
        urgent AS (SELECT CAST(o_orderdate AS DATE) AS d,
                          MAX(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                              AS mx
                   FROM orders WHERE o_orderpriority = '1-URGENT'
                   GROUP BY 1),
        j AS (SELECT s.d, u.mx,
                     datediff('day', DATE '1970-01-01', s.d) AS t,
                     LAST_VALUE(CASE WHEN u.mx IS NOT NULL THEN
                             datediff('day', DATE '1970-01-01', s.d) END
                         IGNORE NULLS) OVER (ORDER BY s.d
                             ROWS UNBOUNDED PRECEDING) AS a,
                     LAST_VALUE(u.mx IGNORE NULLS) OVER (ORDER BY s.d
                             ROWS UNBOUNDED PRECEDING) AS v0,
                     FIRST_VALUE(CASE WHEN u.mx IS NOT NULL THEN
                             datediff('day', DATE '1970-01-01', s.d) END
                         IGNORE NULLS) OVER (ORDER BY s.d
                             ROWS BETWEEN CURRENT ROW AND
                                          UNBOUNDED FOLLOWING) AS b,
                     FIRST_VALUE(u.mx IGNORE NULLS) OVER (ORDER BY s.d
                             ROWS BETWEEN CURRENT ROW AND
                                          UNBOUNDED FOLLOWING) AS v1
              FROM spine s LEFT JOIN urgent u ON u.d = s.d)
        SELECT strftime(d, '%Y-%m-%d') AS day,
               CAST(CASE WHEN mx IS NOT NULL THEN mx
                         WHEN a IS NULL OR b IS NULL THEN 0
                         ELSE (v0*(b - t) + v1*(t - a)) // (b - a)
                    END AS BIGINT) AS interp_cents
        FROM j
    """,
    "session_bounce_rate": """
        WITH s AS (SELECT user_id, ts,
                          CASE WHEN LAG(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts) IS NULL
                               OR datediff('second',
                                      LAG(ts) OVER (PARTITION BY user_id
                                                    ORDER BY ts), ts) > 1800
                               THEN 1 ELSE 0 END AS st
                   FROM events),
        sid AS (SELECT user_id,
                       SUM(st) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
                FROM s),
        g AS (SELECT user_id, sid, COUNT(*) AS c FROM sid GROUP BY 1, 2)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bounce,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 10000
                    // COUNT(*) AS BIGINT) AS bounce_bps
        FROM g
    """,
    "peak_sliding_60min": """
        WITH m AS (SELECT CAST(datediff('minute',
                                        TIMESTAMP '1970-01-01', ts)
                               AS BIGINT) AS minute,
                          CAST(COUNT(*) AS BIGINT) AS c
                   FROM events GROUP BY 1),
        w AS (SELECT minute,
                     SUM(c) OVER (ORDER BY minute
                                  RANGE BETWEEN 59 PRECEDING
                                        AND CURRENT ROW) AS wc
              FROM m),
        r AS (SELECT wc, minute,
                     ROW_NUMBER() OVER (ORDER BY wc DESC, minute) AS rn
              FROM w)
        SELECT CAST(wc AS BIGINT) AS n_events_max,
               minute AS window_end_minute
        FROM r WHERE rn = 1
    """,
    # median pairwise slope; floor-consistent remainder trick because
    # DuckDB // truncates toward zero while Python floors and dy can be
    # negative (same device as autocorr_daily_orders)
    "theilsen_slope_daily": """
        WITH daily AS (SELECT CAST(datediff('day', DATE '1970-01-01',
                                            CAST(o_orderdate AS DATE))
                                   AS BIGINT) AS d,
                              CAST(COUNT(*) AS BIGINT) AS x
                       FROM orders GROUP BY 1),
        p AS (SELECT b.x - a.x AS dy, b.d - a.d AS dx
              FROM daily a JOIN daily b ON b.d > a.d),
        r AS (SELECT dy, dx,
                     ROW_NUMBER() OVER (ORDER BY CAST(dy AS DOUBLE)/dx,
                                        dy, dx) AS rn,
                     COUNT(*) OVER () AS n
              FROM p)
        SELECT CAST((dy*1000000 - (((dy*1000000 % dx) + dx) % dx)) // dx
                    AS BIGINT) AS slope_micro,
               CAST(n AS BIGINT) AS n_pairs
        FROM r WHERE rn = (n + 1) // 2
    """,
    "kmv_jaccard_click_purchase": """
        WITH a AS (SELECT DISTINCT (user_id*2654435761) % 4294967296 AS h
                   FROM events WHERE event_type = 'click'),
        b AS (SELECT DISTINCT (user_id*2654435761) % 4294967296 AS h
              FROM events WHERE event_type = 'purchase'),
        uni AS (SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b)
                ORDER BY h LIMIT 64),
        bo AS (SELECT h FROM a INTERSECT SELECT h FROM b),
        c AS (SELECT
                  (SELECT COUNT(*) FROM uni JOIN bo USING (h)) AS m,
                  (SELECT LEAST(64, COUNT(*)) FROM
                      (SELECT h FROM a UNION SELECT h FROM b)) AS kk,
                  (SELECT COUNT(*) FROM a) AS na,
                  (SELECT COUNT(*) FROM b) AS nb,
                  (SELECT COUNT(*) FROM bo) AS ib)
        SELECT CAST(m*10000 // kk AS BIGINT) AS j_est_bps,
               CAST(ib*10000 // (na + nb - ib) AS BIGINT) AS j_exact_bps,
               CAST(na AS BIGINT) AS n_click_users,
               CAST(nb AS BIGINT) AS n_purchase_users
        FROM c
    """,
    "equidepth_by_type": """
        WITH v AS (SELECT event_type,
                          CAST(FLOOR(value*1000000 + 0.5) AS BIGINT) AS mv
                   FROM events),
        q AS (SELECT event_type,
                     quantile_disc(mv, [0.25, 0.5, 0.75]) AS qs
              FROM v GROUP BY 1),
        ks AS (SELECT UNNEST(range(1, 4)) AS k)
        SELECT event_type, CAST(k AS BIGINT) AS k,
               CAST(qs[CAST(k AS INTEGER)] AS BIGINT) AS boundary_micro
        FROM q CROSS JOIN ks
    """,
    "parts_per_order_hist": """
        WITH d AS (SELECT l_orderkey,
                          COUNT(DISTINCT l_partkey) AS n_parts
                   FROM lineitem GROUP BY 1)
        SELECT CAST(n_parts AS BIGINT) AS n_parts,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM d GROUP BY 1
    """,
}
