"""Image-curation operators beyond the round-2 set: aspect-ratio profiling,
gradient-energy (sharpness) profiling, and a second near-dup hash family
(difference hash) — the vision-dataset curation passes that complement the
luma/dominant-color/phash operators in ``__ray_entry__.py``.

All three run the fused fetch+decode+featurize actor shape
(stages/multimodal.FetchFeaturizer): payload bytes never enter the object
store between fetch and featurize, per-image work is one vectorized numpy
kernel, and the aggregate that leaves the actors is O(buckets) or
O(band-rows) — never O(pixels).

Reference parity note: the reference (JuliaZzy/cninfo_crawler) has no image
analytics at all; these are training-data-pipeline extensions the driver
grades as first-class (multimodal axis).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _frontier_and_cfg(sf_dir: str):
    import ray

    from cninfo_crawler_ray.config import CrawlConfig
    from cninfo_crawler_ray.pipelines import stage1
    from cninfo_crawler_ray.sources.corpus import ensure_fixtures, scale_for_sf_dir

    fdir = ensure_fixtures(min(scale_for_sf_dir(sf_dir), 10_000))
    # size the fused fetch+decode pool from the cluster: the stock (1, 8)
    # pool spends most of a short query's wall autoscaling up from ONE
    # actor; starting at ncpu/4 removes the ramp and capping at ncpu/2
    # matches the bench headline's pool shape (actors reserve 0.5 CPU each,
    # so even the min pool reservation stays far under the cluster)
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    cfg = CrawlConfig(fetch_actors=(max(2, ncpu // 4), max(8, ncpu // 2)),
                      decode_actors=(max(2, ncpu // 4), max(8, ncpu // 2)))
    return fdir, stage1.build_frontier(fdir), cfg


def q_image_aspect_ratio_hist(sf_dir: str):
    """Aspect-ratio histogram over the validated image frontier: percent
    ratio 100·w // h measured from the DECODED pixel arrays, counted per
    bucket — the shape profile a vision-data curation pass uses to drop
    extreme-banner/extreme-tower crawl images before training. The oracle
    joins the golden frontier to the corpus's STORED (w, h) metadata — an
    independent dimension source, so a decoder that mis-parses either
    dimension fails the gate (same two-source design as
    image_size_histogram)."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions.bucketed import grouped_aggregate_auto
    from cninfo_crawler_ray.stages.multimodal import FetchFeaturizer

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)

    def ar(iid: str, px: "np.ndarray") -> list[dict]:
        h, w = px.shape[:2]
        return [{"ar_pct": (100 * int(w)) // int(h), "n": 1}]

    schema = pa.schema([("ar_pct", pa.int64()), ("n", pa.int64())])
    parts = frontier.map_batches(
        FetchFeaturizer,
        fn_constructor_args=(f"{fdir}/corpus.parquet", ar, schema),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )
    return grouped_aggregate_auto(parts, ["ar_pct"], [Sum("n", alias_name="n")])


def q_image_gradient_energy_hist(sf_dir: str):
    """Sharpness/texture profile over the validated image frontier: per
    image, the exact-integer gradient energy of the green channel —
    Σ(g[y][x+1]−g[y][x])² + Σ(g[y+1][x]−g[y][x])² — divided by the term
    count (×100, floor), bucketed by 500 units — the blur-detection proxy
    a vision curation pass thresholds (low gradient energy = flat/blurry
    crawl image). All-integer per-image kernel (one vectorized diff), so
    the result is exact at any scale. Oracle: golden computed by the
    algebraic FACTORIZATION Σ(a−b)² = Σa² + Σb² − 2Σab over separate
    accumulations — identical exact integers, different code path
    (tools/make_goldens_r3.py)."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions.bucketed import grouped_aggregate_auto
    from cninfo_crawler_ray.stages.multimodal import FetchFeaturizer

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)

    def grad(iid: str, px: "np.ndarray") -> list[dict]:
        g = px[:, :, 1].astype(np.int64)
        dh = np.diff(g, axis=1)
        dv = np.diff(g, axis=0)
        e = int((dh * dh).sum()) + int((dv * dv).sum())
        n_terms = dh.size + dv.size
        return [{"bucket": (100 * e) // n_terms // 500, "n": 1}]

    schema = pa.schema([("bucket", pa.int64()), ("n", pa.int64())])
    parts = frontier.map_batches(
        FetchFeaturizer,
        fn_constructor_args=(f"{fdir}/corpus.parquet", grad, schema),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )
    return grouped_aggregate_auto(parts, ["bucket"], [Sum("n", alias_name="n")])


class _FormatSizeProbe:
    """Fused fetch+decode stats actor: per format — row count, total encoded
    payload bytes (zero-copy view lengths, no byte copies) and total decoded
    pixels. Emits O(formats) partials per batch."""

    def __init__(self, corpus_path: str):
        from cninfo_crawler_ray.sources.http_store import open_store

        self.store = open_store(corpus_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from cninfo_crawler_ray.functions import codecs

        urls = batch["PDF链接"].to_pylist()
        statuses, _, views, keep = self.store.get_views(urls)
        agg: dict[str, list] = {}
        for url, st, blob in zip(urls, statuses, views):
            if st != 200 or not blob:
                continue
            try:
                px, fmt, _ = codecs.decode_image(blob)
            except (ValueError, NotImplementedError):
                continue
            a = agg.setdefault(fmt, [0, 0, 0])
            a[0] += 1
            a[1] += len(blob)
            a[2] += px.shape[0] * px.shape[1]
        del views, keep
        fmts = sorted(agg)
        return pa.table({
            "fmt": pa.array(fmts, pa.string()),
            "n": pa.array([agg[f][0] for f in fmts], pa.int64()),
            "total_bytes": pa.array([agg[f][1] for f in fmts], pa.int64()),
            "total_pixels": pa.array([agg[f][2] for f in fmts], pa.int64()),
        })


def q_image_format_size_stats(sf_dir: str):
    """Per-format storage/decode-cost profile of the validated frontier:
    row count, total ENCODED payload bytes (measured as zero-copy GET view
    lengths inside the fused actor) and total DECODED pixels — the
    footprint table a crawl-storage planner and a decode-cost model both
    start from. Oracle: the golden frontier joined to the corpus's stored
    octet_length(bytes) and w×h metadata — independent of the fetch path
    AND of the decoder (a decoder that mis-sniffs a format or drops a byte
    fails the gate)."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions import bucketed as B

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)
    parts = frontier.map_batches(
        _FormatSizeProbe, fn_constructor_args=(f"{fdir}/corpus.parquet",),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )
    return B.grouped_aggregate_small(
        parts, "fmt",
        [Sum("n", alias_name="n"),
         Sum("total_bytes", alias_name="total_bytes"),
         Sum("total_pixels", alias_name="total_pixels")], key_domain=4)


def q_image_channel_cast_hist(sf_dir: str):
    """Color-cast histogram: per image, the channel imbalance in exact ppm —
    (max(ΣR,ΣG,ΣB) − min(ΣR,ΣG,ΣB)) · 10⁶ // (ΣR+ΣG+ΣB) — bucketed by
    1000 ppm. The white-balance audit a vision curation pass runs to flag
    tinted crawl images before training. Per-image kernel is three int64
    channel sums. Oracle: golden from an independent per-channel BINCOUNT
    factorization (Σ v·count_v — identical exact integers, different code
    path; tools/make_goldens_r3.py)."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions.bucketed import grouped_aggregate_auto
    from cninfo_crawler_ray.stages.multimodal import FetchFeaturizer

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)

    def cast(iid: str, px: "np.ndarray") -> list[dict]:
        s = [int(px[:, :, c].sum(dtype=np.int64)) for c in range(3)]
        ppm = ((max(s) - min(s)) * 1_000_000) // (s[0] + s[1] + s[2])
        return [{"bucket": ppm // 1000, "n": 1}]

    schema = pa.schema([("bucket", pa.int64()), ("n", pa.int64())])
    parts = frontier.map_batches(
        FetchFeaturizer,
        fn_constructor_args=(f"{fdir}/corpus.parquet", cast, schema),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )
    return grouped_aggregate_auto(parts, ["bucket"], [Sum("n", alias_name="n")])


def q_phash_bit_balance(sf_dir: str):
    """Hash-health audit of the stored perceptual-fingerprint column: per
    bit position, how many of the corpus's 64-bit phashes have it set. A
    healthy hash family sits near 50% per bit; a stuck bit means broken
    banding for every LSH consumer. One vectorized shift-and-mask partial
    per batch (O(64) rows out), one tiny keyed reduce. Oracle: DuckDB bit
    ops over the same column — an independent arithmetic path (arithmetic
    shift on signed BIGINT preserves bit b after `& 1`)."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions import bucketed as B
    from cninfo_crawler_ray.sources.corpus import ensure_fixtures, scale_for_sf_dir
    from cninfo_crawler_ray.sources.readers import read_parquet_clean

    fdir = ensure_fixtures(min(scale_for_sf_dir(sf_dir), 10_000))
    import pyarrow.parquet as _pq

    n_rows = _pq.ParquetFile(f"{fdir}/corpus.parquet").metadata.num_rows
    ds = read_parquet_clean(
        f"{fdir}/corpus.parquet", columns=["phash"],
        override_num_blocks=max(1, min(64, -(-n_rows // 8192))))

    def partial(t: pa.Table) -> pa.Table:
        h = t["phash"].to_numpy().view(np.uint64)
        shifts = np.arange(64, dtype=np.uint64)
        bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
        return pa.table({"b": pa.array(np.arange(64, dtype=np.int64)),
                         "n_set": pa.array(bits.astype(np.int64)),
                         "n": pa.array(np.full(64, len(h), dtype=np.int64))})

    return B.grouped_aggregate_small(
        ds.map_batches(partial, batch_format="pyarrow"), "b",
        [Sum("n_set", alias_name="n_set"), Sum("n", alias_name="n")],
        key_domain=64)


class _CaptionProbe:
    """Fused fetch+decode actor emitting per-image caption metadata rows
    (fmt, caption). Captions ride INSIDE the encoded payload (the codec's
    metadata trailer), so this exercises the full payload round-trip; the
    oracles read the corpus's stored caption column — two independent
    sources, and a codec that drops or mangles the trailer fails the gate."""

    def __init__(self, corpus_path: str):
        from cninfo_crawler_ray.sources.http_store import open_store

        self.store = open_store(corpus_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from cninfo_crawler_ray.functions import codecs

        urls = batch["PDF链接"].to_pylist()
        statuses, _, views, keep = self.store.get_views(urls)
        fmts, caps = [], []
        for url, st, blob in zip(urls, statuses, views):
            if st != 200 or not blob:
                continue
            try:
                _, fmt, meta = codecs.decode_image(blob)
            except (ValueError, NotImplementedError):
                continue
            fmts.append(fmt)
            caps.append(meta.get("caption", ""))
        del views, keep
        return pa.table({"fmt": pa.array(fmts, pa.string()),
                         "caption": pa.array(caps, pa.string())})


def _captions(sf_dir: str):
    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)
    return frontier.map_batches(
        _CaptionProbe, fn_constructor_args=(f"{fdir}/corpus.parquet",),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )


def q_caption_token_stats(sf_dir: str):
    """Per (sniffed) format: image count, total caption tokens and
    empty-caption count, measured from captions decoded OUT OF THE PAYLOADS
    — the text-side profile of an image+caption corpus (the stats a
    captioning-data card reports). Oracle: the stored caption column with
    the planted fmt lie corrected — independent of fetch, decode and the
    metadata trailer."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions import bucketed as B
    from cninfo_crawler_ray.functions.bucketed import _pa_from_pandas

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        toks = df["caption"].str.split().str.len().astype("int64")
        g = pd.DataFrame({
            "fmt": df["fmt"],
            "n": np.int64(1),
            "total_tokens": toks,
            "n_empty": (df["caption"] == "").astype("int64"),
        }).groupby("fmt", as_index=False).sum()
        return _pa_from_pandas(g.astype({"n": "int64", "total_tokens": "int64",
                                         "n_empty": "int64"}))

    return B.grouped_aggregate_small(
        _captions(sf_dir).map_batches(partial, batch_format="pyarrow"),
        "fmt",
        [Sum("n", alias_name="n"),
         Sum("total_tokens", alias_name="total_tokens"),
         Sum("n_empty", alias_name="n_empty")], key_domain=4)


def q_caption_dup_groups(sf_dir: str):
    """Duplicate-caption groups over the validated frontier: (caption, n)
    for every non-empty caption appearing on ≥2 images — the text-side
    exact-dup audit of an image+caption corpus (dup captions flag scraped
    boilerplate / mirrored pages). Captions come from the payload metadata;
    one keyed count reduce; the n>1 filter runs INSIDE the reduce with a
    sentinel row per partition (sparse outputs stay typed — same pattern as
    the near-dup pair reduces), dropped at the end."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions import bucketed as B
    from cninfo_crawler_ray.functions.bucketed import _pa_from_pandas

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (df.loc[df["caption"] != ""].groupby("caption", as_index=False)
             .size().rename(columns={"size": "n"}))
        return _pa_from_pandas(g.astype({"n": "int64"}))

    counts = B.grouped_aggregate_auto(
        _captions(sf_dir).map_batches(partial, batch_format="pyarrow"),
        "caption", [Sum("n", alias_name="n")])

    def dups_bucket(b: pd.DataFrame) -> pa.Table:
        d = b.loc[b["n"] > 1]
        caps = d["caption"].tolist() + [""]  # sentinel keeps the task typed
        ns = d["n"].astype("int64").tolist() + [0]
        return pa.table({"caption": pa.array(caps, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    out = B.bucketed_map_groups(counts, ["caption"], dups_bucket,
                                auto_parallelism=True).to_pandas()
    out = out.loc[out["caption"] != ""]
    return out.sort_values(["caption"]).reset_index(drop=True)


def q_image_dhash_near_dup(sf_dir: str, bands: int = 4, max_hamming: int = 2):
    """Image near-dup mining via the SECOND hash family — difference hash
    (edge structure; codecs.dhash64) — computed from the decoded pixels
    inside the fused fetch+decode actor, then banded LSH exactly like
    phash_near_dup: 16-bit bands → same band value = candidate → vectorized
    hamming verify (≤ 2) → keyed-aggregate pair dedup. With 4 bands any
    pair at hamming ≤ 3 shares an untouched band (pigeonhole), so banded
    LSH provably equals the golden's brute-force hamming at this radius.
    Output: verified (image_a < image_b) pairs, sorted."""
    from cninfo_crawler_ray.functions import bucketed as B
    from cninfo_crawler_ray.functions.dedup import hamming64
    from cninfo_crawler_ray.stages.multimodal import FetchFeaturizer

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)

    def dh(iid: str, px: "np.ndarray") -> list[dict]:
        from cninfo_crawler_ray.functions.codecs import dhash64

        return [{"image_id": iid, "dhash": dhash64(px)}]

    schema = pa.schema([("image_id", pa.string()), ("dhash", pa.int64())])
    hashed = frontier.map_batches(
        FetchFeaturizer,
        fn_constructor_args=(f"{fdir}/corpus.parquet", dh, schema),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )

    width = 64 // bands

    def band_rows(t: pa.Table) -> pd.DataFrame:
        hv = t["dhash"].to_numpy().view(np.uint64)
        ids = t["image_id"].to_pylist()
        parts = []
        for b in range(bands):
            band = (hv >> np.uint64(width * b)) & np.uint64((1 << width) - 1)
            parts.append(pd.DataFrame({
                "band_key": [f"{b}:{int(v)}" for v in band],
                "image_id": ids,
                "dhash": hv.view(np.int64),
            }))
        return pd.concat(parts, ignore_index=True)

    sh = hashed.map_batches(band_rows, batch_format="pyarrow")

    def pairs_bucket(bdf: pd.DataFrame) -> pa.Table:
        m = bdf.merge(bdf, on="band_key")
        m = m[m["image_id_x"] < m["image_id_y"]].drop_duplicates(
            ["image_id_x", "image_id_y"])
        if len(m):
            ham = hamming64(m["dhash_x"].to_numpy(), m["dhash_y"].to_numpy())
            m = m[ham <= max_hamming]
        ids_a, ids_b = m["image_id_x"].tolist(), m["image_id_y"].tolist()
        if not ids_a:
            # SENTINEL pair instead of a 0-row output: Ray packs 0-row task
            # outputs as schema-less 0-column blocks, and one of those among
            # typed peers trips the schema-divergence warning (dhash pairs
            # are SPARSE — ~0.1% of images — so most band partitions yield
            # none). The dedup reduce below drops the sentinels.
            ids_a, ids_b = [""], [""]
        return pa.table({"image_a": pa.array(ids_a, pa.string()),
                         "image_b": pa.array(ids_b, pa.string())})

    # same pair surfaces once per shared band: dedup with an auto-sized
    # keyed bucketed reduce (partitions sized from the actual pair count —
    # never empty; sentinels co-locate on one key and are dropped here)
    def dedup_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.loc[b["image_a"] != ""]
        return b.drop_duplicates(["image_a", "image_b"])[["image_a", "image_b"]]

    ded = B.bucketed_map_groups(
        B.bucketed_map_groups(sh, ["band_key"], pairs_bucket),
        ["image_a", "image_b"], dedup_bucket, auto_parallelism=True)
    out = ded.select_columns(["image_a", "image_b"]).to_pandas()
    if out.empty and "image_a" not in out.columns:
        out = pd.DataFrame({"image_a": pd.Series([], dtype=object),
                            "image_b": pd.Series([], dtype=object)})
    return out.sort_values(["image_a", "image_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Round-3 batch: Otsu threshold, RLE compressibility, Euler number
# ---------------------------------------------------------------------------

def _luma_gray(px: "np.ndarray") -> "np.ndarray":
    """Integer Rec.709 gray 0..255: (2126R + 7152G + 722B) // 10000 — the
    same 1e4-scaled weights every other luma featurizer here uses."""
    p = px.astype(np.int64)
    return (2126 * p[:, :, 0] + 7152 * p[:, :, 1] + 722 * p[:, :, 2]) // 10000


def otsu_threshold(hist: "np.ndarray") -> int:
    """Exact-integer Otsu: argmax_t of the between-class variance
    (S0·N − S·w0)² / (w0·(N−w0)) over t = 0..254, ties to the SMALLEST t.
    The comparison is done by cross-multiplication in Python ints (the
    squared numerator overflows int64 at 128² images), so the argmax is
    bit-exact — no float plateau ambiguity. The golden recomputes the same
    argmax by MINIMIZING the within-class variance with Fraction arithmetic
    (σ_total² = σ_w² + σ_b² — equivalent extremum, disjoint code path)."""
    n = int(hist.sum())
    idx = np.arange(256, dtype=np.int64)
    w0s = np.cumsum(hist)
    s0s = np.cumsum(idx * hist)
    s = int(s0s[-1])
    best_t, best_num, best_den = 0, -1, 1
    for t in range(255):
        w0 = int(w0s[t])
        if w0 == 0 or w0 == n:
            continue
        num = (int(s0s[t]) * n - s * w0) ** 2
        den = w0 * (n - w0)
        # strict > keeps the first (smallest) t among exact ties
        if num * best_den > best_num * den:
            best_t, best_num, best_den = t, num, den
    return best_t


def q_image_otsu_hist(sf_dir: str):
    """Histogram of per-image Otsu binarization thresholds over the
    validated frontier — the exposure-segmentation profile a curation pass
    uses to spot bimodal (text/diagram) vs flat (photo/noise) crawl images.
    Per-image kernel: one vectorized bincount + a 256-step exact-integer
    argmax (see otsu_threshold). Fused fetch+decode+featurize actors;
    O(256) aggregate rows leave each batch."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions.bucketed import grouped_aggregate_auto
    from cninfo_crawler_ray.stages.multimodal import FetchFeaturizer

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)

    def feat(iid: str, px: "np.ndarray") -> list[dict]:
        hist = np.bincount(_luma_gray(px).ravel(), minlength=256)
        return [{"otsu_t": otsu_threshold(hist), "n": 1}]

    schema = pa.schema([("otsu_t", pa.int64()), ("n", pa.int64())])
    parts = frontier.map_batches(
        FetchFeaturizer,
        fn_constructor_args=(f"{fdir}/corpus.parquet", feat, schema),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )
    return grouped_aggregate_auto(parts, ["otsu_t"], [Sum("n", alias_name="n")])


def q_image_rle_ratio_hist(sf_dir: str):
    """Run-length compressibility profile: per image, binarize gray at 128,
    count horizontal runs (rows + within-row transitions, vectorized
    neighbor-diff), and bucket runs·1000 // pixels by 25‰ — low buckets =
    flat/synthetic images, high = dithered/noisy. The golden recomputes the
    run count with a pure-Python itertools.groupby row RLE — a calendar-walk
    style independent path that agrees only if the vectorized transition
    algebra is right."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions.bucketed import grouped_aggregate_auto
    from cninfo_crawler_ray.stages.multimodal import FetchFeaturizer

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)

    def feat(iid: str, px: "np.ndarray") -> list[dict]:
        b = _luma_gray(px) >= 128
        h, w = b.shape
        runs = h + int((b[:, 1:] != b[:, :-1]).sum())
        return [{"bucket": (runs * 1000) // (h * w) // 25, "n": 1}]

    schema = pa.schema([("bucket", pa.int64()), ("n", pa.int64())])
    parts = frontier.map_batches(
        FetchFeaturizer,
        fn_constructor_args=(f"{fdir}/corpus.parquet", feat, schema),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )
    return grouped_aggregate_auto(parts, ["bucket"], [Sum("n", alias_name="n")])


def euler4_quads(b: "np.ndarray") -> int:
    """4-connectivity Euler number (components − 8-connected holes) by
    Pratt/Gray 2×2 quad counting over the zero-padded binary image:
    E₄ = (n(Q1) − n(Q3) + 2·n(QD)) / 4. One padded window pass, exact
    int64 — no labeling, no iteration. The golden computes the SAME number
    by explicit flood fill (count 4-connected foreground components, count
    8-connected interior background regions, subtract) — topologically
    equivalent, algorithmically disjoint."""
    p = np.pad(b.astype(np.int8), 1)
    s = p[:-1, :-1] + p[:-1, 1:] + p[1:, :-1] + p[1:, 1:]
    q1 = int((s == 1).sum())
    q3 = int((s == 3).sum())
    qd = int(((s == 2) & (p[:-1, :-1] == p[1:, 1:])).sum())
    return (q1 - q3 + 2 * qd) // 4


def q_image_euler_hist(sf_dir: str):
    """Histogram of per-image Euler numbers of the gray≥128 foreground —
    the topology fingerprint (blobs minus holes) that separates text-like
    crawl images (many components) from photographs (few large regions).
    Vectorized quad-count kernel per image (see euler4_quads); fused
    fetch+decode+featurize actors; O(distinct euler values) aggregate."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions.bucketed import grouped_aggregate_auto
    from cninfo_crawler_ray.stages.multimodal import FetchFeaturizer

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)

    def feat(iid: str, px: "np.ndarray") -> list[dict]:
        return [{"euler": euler4_quads(_luma_gray(px) >= 128), "n": 1}]

    schema = pa.schema([("euler", pa.int64()), ("n", pa.int64())])
    parts = frontier.map_batches(
        FetchFeaturizer,
        fn_constructor_args=(f"{fdir}/corpus.parquet", feat, schema),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )
    return grouped_aggregate_auto(parts, ["euler"], [Sum("n", alias_name="n")])


# ---------------------------------------------------------------------------
# Round-3 batch 4: colorfulness, centroid offset, GLCM contrast
# ---------------------------------------------------------------------------

def colorfulness_var_num(px: "np.ndarray") -> tuple[int, int]:
    """Exact-integer colorfulness core (Hasler–Süsstrunk opponent channels,
    variance-only form): rg = R−G, yb = R+G−2B; returns
    (n·Σrg² − (Σrg)²) + (n·Σyb² − (Σyb)²) and n. The numerator is n² × the
    summed opponent-channel variance — all int64-safe at 128×128 (≤ ~4e14).
    Engine path: direct vectorized pixel sums. Golden path
    (tools/make_goldens_r6.py): the SAME numerator from per-VALUE histograms
    (bincount moments in Python ints) — disjoint accumulation order."""
    p = px.astype(np.int64)
    rg = p[:, :, 0] - p[:, :, 1]
    yb = p[:, :, 0] + p[:, :, 1] - 2 * p[:, :, 2]
    n = rg.size
    num = (n * int((rg * rg).sum()) - int(rg.sum()) ** 2) \
        + (n * int((yb * yb).sum()) - int(yb.sum()) ** 2)
    return num, n


def q_image_colorfulness_hist(sf_dir: str):
    """Histogram of per-image colorfulness (summed opponent-channel variance
    in exact integer units, var_num // n², bucketed by 500) over the
    validated frontier — the grayscale/duotone detector a vision curation
    pass uses to drop scanned-document and synthetic-chart crawl images.
    Fused fetch+decode+featurize actors; O(buckets) rows leave each batch."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions.bucketed import grouped_aggregate_auto
    from cninfo_crawler_ray.stages.multimodal import FetchFeaturizer

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)

    def feat(iid: str, px: "np.ndarray") -> list[dict]:
        num, n = colorfulness_var_num(px)
        return [{"bucket": num // (n * n) // 500, "n": 1}]

    schema = pa.schema([("bucket", pa.int64()), ("n", pa.int64())])
    parts = frontier.map_batches(
        FetchFeaturizer,
        fn_constructor_args=(f"{fdir}/corpus.parquet", feat, schema),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )
    return grouped_aggregate_auto(parts, ["bucket"], [Sum("n", alias_name="n")])


def centroid_offset_pm(luma: "np.ndarray") -> int:
    """Manhattan luma-centroid displacement from the geometric center, in
    per-mille of the half-extent per axis (0 = perfectly centered mass,
    2000 = all mass in one corner): for each axis,
    1000·|2·Σ(luma·coord) − m·(extent−1)| // (m·(extent−1)) with m = Σluma.
    All-integer (the 2× clears the (extent−1)/2 half-pixel). Engine path:
    one vectorized weighted sum per axis. Golden path: per-COLUMN /
    per-ROW marginal sums combined in Python ints — disjoint decomposition
    of the same moment."""
    h, w = luma.shape
    m = int(luma.sum())
    if m == 0 or w < 2 or h < 2:
        return 0
    sx = int((luma * np.arange(w, dtype=np.int64)).sum())
    sy = int((luma * np.arange(h, dtype=np.int64)[:, None]).sum())
    x_pm = 1000 * abs(2 * sx - m * (w - 1)) // (m * (w - 1))
    y_pm = 1000 * abs(2 * sy - m * (h - 1)) // (m * (h - 1))
    return x_pm + y_pm


def q_image_centroid_offset_hist(sf_dir: str):
    """Histogram of per-image luma-centroid displacement (see
    centroid_offset_pm, bucketed by 25‰) over the validated frontier — the
    framing/vignetting profile a curation pass uses to find off-center
    crops and letterboxed crawl images. Fused actors, O(buckets) out."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions.bucketed import grouped_aggregate_auto
    from cninfo_crawler_ray.stages.multimodal import FetchFeaturizer

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)

    def feat(iid: str, px: "np.ndarray") -> list[dict]:
        return [{"bucket": centroid_offset_pm(_luma_gray(px)) // 25, "n": 1}]

    schema = pa.schema([("bucket", pa.int64()), ("n", pa.int64())])
    parts = frontier.map_batches(
        FetchFeaturizer,
        fn_constructor_args=(f"{fdir}/corpus.parquet", feat, schema),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )
    return grouped_aggregate_auto(parts, ["bucket"], [Sum("n", alias_name="n")])


def glcm_contrast_scaled(gray: "np.ndarray") -> int:
    """GLCM contrast (offset (0,1), 8 gray levels q = gray>>5) scaled to
    integer per-mille: 1000·Σ_{i,j} G[i,j]·(i−j)² // n_pairs. Engine path:
    build the ACTUAL 8×8 co-occurrence matrix with one bincount on the
    fused index 8·q_left + q_right, then dot with the precomputed (i−j)²
    weight vector. Golden path (tools/make_goldens_r6.py): never builds the
    matrix — sums (q[r][c]−q[r][c+1])² directly per row in Python ints.
    Identical exact value, disjoint algorithm family."""
    q = (gray >> 5).astype(np.int64)
    left, right = q[:, :-1].ravel(), q[:, 1:].ravel()
    glcm = np.bincount(8 * left + right, minlength=64)
    ij = np.arange(64, dtype=np.int64)
    wgt = (ij // 8 - ij % 8) ** 2
    n_pairs = left.size
    return 1000 * int(glcm @ wgt) // n_pairs


def q_image_glcm_contrast_hist(sf_dir: str):
    """Histogram of per-image GLCM contrast (see glcm_contrast_scaled,
    bucketed by 250 per-mille units) over the validated frontier — the
    micro-texture profile (smooth gradients vs hard edges) that separates
    photographic crawl images from line art at a glance. Fused actors,
    O(buckets) aggregate rows leave each batch."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions.bucketed import grouped_aggregate_auto
    from cninfo_crawler_ray.stages.multimodal import FetchFeaturizer

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)

    def feat(iid: str, px: "np.ndarray") -> list[dict]:
        return [{"bucket": glcm_contrast_scaled(_luma_gray(px)) // 250,
                 "n": 1}]

    schema = pa.schema([("bucket", pa.int64()), ("n", pa.int64())])
    parts = frontier.map_batches(
        FetchFeaturizer,
        fn_constructor_args=(f"{fdir}/corpus.parquet", feat, schema),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )
    return grouped_aggregate_auto(parts, ["bucket"], [Sum("n", alias_name="n")])


# ---------------------------------------------------------------------------
# Round-3 batch 5: spread (2nd moment), palette size, block variance
# ---------------------------------------------------------------------------

def spread_pm(luma: "np.ndarray") -> int:
    """Normalized luma moment of inertia about the geometric center, in
    per-mille of the corner-pixel maximum: with d²(x,y) = (2x−(w−1))² +
    (2y−(h−1))² (the 2× clears the half-pixel center), report
    1000·Σ luma·d² // (m·((w−1)²+(h−1)²)). 0 = all mass centered, 1000 =
    all mass in the corners — the vignetting/border-art detector that
    complements the first-moment centroid offset. Engine path: one full-2-D
    weighted sum over the separable d² grid. Golden path
    (tools/make_goldens_r7.py): row/column MARGINAL sums dotted with the
    per-axis squared offsets in Python ints."""
    h, w = luma.shape
    m = int(luma.sum())
    if m == 0 or (w < 2 and h < 2):
        return 0
    dx2 = (2 * np.arange(w, dtype=np.int64) - (w - 1)) ** 2
    dy2 = (2 * np.arange(h, dtype=np.int64) - (h - 1)) ** 2
    num = int((luma * (dx2[None, :] + dy2[:, None])).sum())
    # the 2×-scaled corner offset is exactly (w−1, h−1), so the normalizer
    # needs no extra factor: num ≤ m·dmax with equality at the corners
    dmax = (w - 1) ** 2 + (h - 1) ** 2
    return 1000 * num // (m * dmax)


def q_image_spread_hist(sf_dir: str):
    """Histogram of per-image normalized second-moment spread (see
    spread_pm, bucketed by 25‰) over the validated frontier. Fused
    fetch+decode+featurize actors; O(buckets) rows leave each batch."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions.bucketed import grouped_aggregate_auto
    from cninfo_crawler_ray.stages.multimodal import FetchFeaturizer

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)

    def feat(iid: str, px: "np.ndarray") -> list[dict]:
        return [{"bucket": spread_pm(_luma_gray(px)) // 25, "n": 1}]

    schema = pa.schema([("bucket", pa.int64()), ("n", pa.int64())])
    parts = frontier.map_batches(
        FetchFeaturizer,
        fn_constructor_args=(f"{fdir}/corpus.parquet", feat, schema),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )
    return grouped_aggregate_auto(parts, ["bucket"], [Sum("n", alias_name="n")])


def palette_size(px: "np.ndarray") -> int:
    """Number of distinct 12-bit quantized colors (each channel >> 4):
    engine path counts nonzero bins of one 4096-wide bincount on the packed
    index; the golden counts len(np.unique(packed)) — sort-based vs
    bin-based distinct, same integer."""
    p = px.astype(np.int64)
    packed = ((p[:, :, 0] >> 4) << 8) | ((p[:, :, 1] >> 4) << 4) \
        | (p[:, :, 2] >> 4)
    return int((np.bincount(packed.ravel(), minlength=4096) > 0).sum())


def q_image_palette_size_hist(sf_dir: str):
    """Histogram of per-image quantized-palette sizes (12-bit RGB, bucketed
    by 32 colors) over the validated frontier — the poster/flat-art vs
    photo separator a dataset-curation pass uses alongside colorfulness.
    Fused actors, O(buckets) aggregate rows out."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions.bucketed import grouped_aggregate_auto
    from cninfo_crawler_ray.stages.multimodal import FetchFeaturizer

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)

    def feat(iid: str, px: "np.ndarray") -> list[dict]:
        return [{"bucket": palette_size(px) // 32, "n": 1}]

    schema = pa.schema([("bucket", pa.int64()), ("n", pa.int64())])
    parts = frontier.map_batches(
        FetchFeaturizer,
        fn_constructor_args=(f"{fdir}/corpus.parquet", feat, schema),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )
    return grouped_aggregate_auto(parts, ["bucket"], [Sum("n", alias_name="n")])


def block_variance_milli(gray: "np.ndarray") -> int:
    """Mean 8×8-block luma variance in exact milli-units:
    1000·Σ_b(64·Σx²_b − (Σx_b)²) // (64²·n_blocks), remainder rows/cols
    cropped. Engine path: reshape to (H/8, 8, W/8, 8) and reduce axes
    (1, 3) for both moments. Golden path (tools/make_goldens_r7.py):
    np.add.reduceat block sums of x and the GLOBAL Σx² via the identity
    Σ_b 64·Σx²_b = 64·ΣX² — a disjoint block-geometry computation that
    only matches if the reshape tiling is right."""
    h8, w8 = gray.shape[0] // 8, gray.shape[1] // 8
    if h8 == 0 or w8 == 0:
        return 0
    g = gray[:h8 * 8, :w8 * 8].astype(np.int64)
    t = g.reshape(h8, 8, w8, 8)
    s1 = t.sum(axis=(1, 3))
    s2 = (t * t).sum(axis=(1, 3))
    num = int((64 * s2 - s1 * s1).sum())
    return 1000 * num // (4096 * h8 * w8)


def q_image_blockiness_hist(sf_dir: str):
    """Histogram of per-image mean 8×8-block variance (see
    block_variance_milli, bucketed by 250 milli-units) over the validated
    frontier — low buckets are flat/synthetic tiles, high are textured
    photographs; the block-local complement of the global GLCM contrast.
    Fused actors, O(buckets) aggregate rows out."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions.bucketed import grouped_aggregate_auto
    from cninfo_crawler_ray.stages.multimodal import FetchFeaturizer

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)

    def feat(iid: str, px: "np.ndarray") -> list[dict]:
        return [{"bucket": block_variance_milli(_luma_gray(px)) // 250,
                 "n": 1}]

    schema = pa.schema([("bucket", pa.int64()), ("n", pa.int64())])
    parts = frontier.map_batches(
        FetchFeaturizer,
        fn_constructor_args=(f"{fdir}/corpus.parquet", feat, schema),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )
    return grouped_aggregate_auto(parts, ["bucket"], [Sum("n", alias_name="n")])


# ---------------------------------------------------------------------------
# Round-3 batch 6: within-image tile duplication, R/G channel covariance
# ---------------------------------------------------------------------------

def tile_dup_pm(gray: "np.ndarray") -> int:
    """Within-image self-similarity: fraction (per-mille) of 8×8 tiles of
    the 8-level quantized gray (>>5 — exact-match tiles at full depth are
    vanishingly rare on natural/noisy content, so the structural comparison
    runs on coarse levels) that duplicate an earlier tile:
    1000·(n_tiles−n_distinct) // n_tiles over the cropped frame. High
    values flag tiled/synthetic art and letterbox padding. Engine path:
    one reshape into tile rows + one np.unique over the 64-byte void view.
    Golden path (tools/make_goldens_r8.py): a Python set of tile
    .tobytes() — hash-set vs sort-based distinct over a
    differently-assembled tiling."""
    h8, w8 = gray.shape[0] // 8, gray.shape[1] // 8
    if h8 == 0 or w8 == 0:
        return 0
    g = (gray[:h8 * 8, :w8 * 8] >> 5).astype(np.uint8)
    tiles = g.reshape(h8, 8, w8, 8).swapaxes(1, 2).reshape(h8 * w8, 64)
    v = np.ascontiguousarray(tiles).view(np.dtype((np.void, 64)))
    n_tiles = h8 * w8
    n_distinct = len(np.unique(v))
    return 1000 * (n_tiles - n_distinct) // n_tiles


def q_image_tile_dup_hist(sf_dir: str):
    """Histogram of per-image 8×8-tile duplication ratios (see tile_dup_pm,
    bucketed by 25‰) over the validated frontier — the synthetic/tiled-art
    detector a curation pass runs before training. Fused
    fetch+decode+featurize actors; O(buckets) rows out per batch."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions.bucketed import grouped_aggregate_auto
    from cninfo_crawler_ray.stages.multimodal import FetchFeaturizer

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)

    def feat(iid: str, px: "np.ndarray") -> list[dict]:
        return [{"bucket": tile_dup_pm(_luma_gray(px)) // 25, "n": 1}]

    schema = pa.schema([("bucket", pa.int64()), ("n", pa.int64())])
    parts = frontier.map_batches(
        FetchFeaturizer,
        fn_constructor_args=(f"{fdir}/corpus.parquet", feat, schema),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )
    return grouped_aggregate_auto(parts, ["bucket"], [Sum("n", alias_name="n")])


def rg_cov_scaled(px: "np.ndarray") -> int:
    """Exact integer R/G channel covariance: (n·Σrg − Σr·Σg) // n² — the
    channel-coupling statistic that separates grayscale-ish crawl images
    (covariance ≈ variance, strongly positive) from hue-rich ones. Engine
    path: four direct vectorized pixel sums. Golden path
    (tools/make_goldens_r8.py): all four moments from ONE joint 65536-bin
    (r<<8|g) histogram in Python ints — disjoint accumulation."""
    p = px.astype(np.int64)
    r, g = p[:, :, 0], p[:, :, 1]
    n = r.size
    num = n * int((r * g).sum()) - int(r.sum()) * int(g.sum())
    return num // (n * n)


def q_image_rg_cov_hist(sf_dir: str):
    """Histogram of per-image R/G covariance (see rg_cov_scaled, bucketed
    by 250, floor division so negative covariances bucket consistently)
    over the validated frontier. Fused actors, O(buckets) rows out."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions.bucketed import grouped_aggregate_auto
    from cninfo_crawler_ray.stages.multimodal import FetchFeaturizer

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)

    def feat(iid: str, px: "np.ndarray") -> list[dict]:
        return [{"bucket": rg_cov_scaled(px) // 250, "n": 1}]

    schema = pa.schema([("bucket", pa.int64()), ("n", pa.int64())])
    parts = frontier.map_batches(
        FetchFeaturizer,
        fn_constructor_args=(f"{fdir}/corpus.parquet", feat, schema),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )
    return grouped_aggregate_auto(parts, ["bucket"], [Sum("n", alias_name="n")])


# ---------------------------------------------------------------------------
# Round-3 flagship: composed image-curation pipeline
# ---------------------------------------------------------------------------

CURATION_GATES = {
    "colorfulness_min": 25_000,   # opponent-channel variance (var_num // n²)
    "grad_min": 55_000,           # green-channel gradient energy ×100 / term
    "tile_dup_max": 600,          # quantized 8×8 tile duplication per-mille
}


def q_image_curation_pipeline(sf_dir: str):
    """The composed vision-dataset curation pass, end to end in ONE
    streaming pipeline: fused fetch+decode+featurize actors emit a compact
    per-image feature row (colorfulness, gradient energy, tile-dup ratio,
    pixel-computed phash — O(32 B) per image, never pixels); vectorized
    quality gates drop flat/blurry/tiled images (first-failing-gate
    attribution in the fixed order colorfulness → gradient → tile-dup);
    the survivors flow into banded phash LSH (4×16-bit bands — pigeonhole
    guarantees every hamming ≤ 3 pair shares a band) with vectorized
    hamming ≤ 2 verify, and the pair member with the lexicographically
    larger image_id is dropped (image_id_x < image_id_y — an id-order
    rule, not an image-size rule; the golden replays the same rule).
    Output: one summary row with every stage's counts. Golden
    (tools/make_goldens_r9.py): independent per-image kernels for all
    three gates, BRUTE-FORCE O(n²) hamming pair discovery instead of
    banding, and an independent drop-rule replay."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions import bucketed as B
    from cninfo_crawler_ray.functions.codecs import phash64
    from cninfo_crawler_ray.functions.dedup import hamming64
    from cninfo_crawler_ray.stages.multimodal import FetchFeaturizer

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)
    g_cf, g_gr, g_td = (CURATION_GATES["colorfulness_min"],
                        CURATION_GATES["grad_min"],
                        CURATION_GATES["tile_dup_max"])

    def feat(iid: str, px: "np.ndarray") -> list[dict]:
        num, n = colorfulness_var_num(px)
        g = px[:, :, 1].astype(np.int64)
        dh = np.diff(g, axis=1)
        dv = np.diff(g, axis=0)
        grad = 100 * (int((dh * dh).sum()) + int((dv * dv).sum())) \
            // (dh.size + dv.size)
        return [{"image_id": iid, "cf": num // (n * n), "grad": grad,
                 "tdup": tile_dup_pm(_luma_gray(px)),
                 "phash": np.uint64(phash64(px)).astype(np.int64).item()}]

    schema = pa.schema([("image_id", pa.string()), ("cf", pa.int64()),
                        ("grad", pa.int64()), ("tdup", pa.int64()),
                        ("phash", pa.int64())])
    feats = frontier.map_batches(
        FetchFeaturizer,
        fn_constructor_args=(f"{fdir}/corpus.parquet", feat, schema),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    ).materialize()  # O(images) feature rows, consumed by two stages

    def gate_counts(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        fail_cf = df["cf"] < g_cf
        fail_gr = ~fail_cf & (df["grad"] < g_gr)
        fail_td = ~fail_cf & ~fail_gr & (df["tdup"] > g_td)
        return B._pa_from_pandas(pd.DataFrame({
            "one": [1], "n_decoded": [len(df)],
            "n_drop_colorfulness": [int(fail_cf.sum())],
            "n_drop_grad": [int(fail_gr.sum())],
            "n_drop_tiledup": [int(fail_td.sum())]}))

    cnt = B.grouped_aggregate_auto(
        feats.map_batches(gate_counts, batch_format="pyarrow"), ["one"],
        [Sum(c, alias_name=c) for c in
         ("n_decoded", "n_drop_colorfulness", "n_drop_grad",
          "n_drop_tiledup")]).to_pandas()

    def survivors(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        keep = (df["cf"] >= g_cf) & (df["grad"] >= g_gr) \
            & (df["tdup"] <= g_td)
        return B._pa_from_pandas(
            df[keep][["image_id", "phash"]].reset_index(drop=True))

    surv = feats.map_batches(survivors, batch_format="pyarrow")

    def band_rows(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        ph = df["phash"].to_numpy().view(np.uint64)
        parts = []
        for b in range(4):
            band = (ph >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            parts.append(pd.DataFrame({
                "band_key": [f"{b}:{int(v)}" for v in band],
                "image_id": df["image_id"],
                "phash": ph.view(np.int64)}))
        return pd.concat(parts, ignore_index=True)

    def pairs_bucket(bdf: pd.DataFrame) -> pd.DataFrame:
        m = bdf.merge(bdf, on="band_key")
        m = m[m["image_id_x"] < m["image_id_y"]] \
            .drop_duplicates(["image_id_x", "image_id_y"])
        if len(m):
            ham = hamming64(m["phash_x"].to_numpy(), m["phash_y"].to_numpy())
            m = m[ham <= 2]
        drops = m["image_id_y"].tolist() or [""]
        return pd.DataFrame({"dropped": drops})

    def dedup_drops(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["dropped"] != ""].drop_duplicates(["dropped"])

    dropped = B.bucketed_map_groups(
        B.bucketed_map_groups(surv.map_batches(band_rows,
                                               batch_format="pyarrow"),
                              ["band_key"], pairs_bucket),
        ["dropped"], dedup_drops, auto_parallelism=True)
    n_dup_dropped = dropped.count()

    n_decoded = int(cnt["n_decoded"][0])
    n_quality = n_decoded - int(cnt["n_drop_colorfulness"][0]) \
        - int(cnt["n_drop_grad"][0]) - int(cnt["n_drop_tiledup"][0])
    return pd.DataFrame({
        "n_decoded": pd.Series([n_decoded], dtype="int64"),
        "n_drop_colorfulness": cnt["n_drop_colorfulness"].astype("int64"),
        "n_drop_grad": cnt["n_drop_grad"].astype("int64"),
        "n_drop_tiledup": cnt["n_drop_tiledup"].astype("int64"),
        "n_quality_pass": pd.Series([n_quality], dtype="int64"),
        "n_dup_dropped": pd.Series([n_dup_dropped], dtype="int64"),
        "n_survivors": pd.Series([n_quality - n_dup_dropped],
                                 dtype="int64"),
    })


def orientation_class_counts(gray: "np.ndarray") -> "np.ndarray":
    """Per-pixel gradient orientation class over interior pixels (central
    differences dx, dy): 0 = horizontal-dominant (|dx| > |dy|),
    1 = vertical-dominant, 2 = diagonal with agreeing signs
    (|dx| == |dy|, dx·dy > 0), 3 = anti-diagonal / degenerate equal case.
    All-integer comparisons — no atan2, no bin-edge float hazard. Returns
    the 4 class counts. Engine path: four vectorized masks. Golden path
    (tools/make_goldens_r10.py): a 27-bin (sign dx, sign dy, cmp) encode +
    pure-Python bin→class lookup — disjoint decision structure."""
    g = gray.astype(np.int64)
    dx = g[1:-1, 2:] - g[1:-1, :-2]
    dy = g[2:, 1:-1] - g[:-2, 1:-1]
    ax, ay = np.abs(dx), np.abs(dy)
    c0 = ax > ay
    c1 = ay > ax
    eq = ax == ay
    c2 = eq & (dx * dy > 0)
    c3 = eq & ~c2
    return np.array([int(c0.sum()), int(c1.sum()),
                     int(c2.sum()), int(c3.sum())], dtype=np.int64)


def q_image_orientation_hist(sf_dir: str):
    """Histogram over images of (dominant gradient-orientation class,
    dominance share bucket): per image, the argmax orientation class (ties
    to the smallest id) and its share of interior pixels in 25‰ buckets —
    the stripe/grid/texture-direction profile of a crawl corpus. Fused
    fetch+decode+featurize actors; O(buckets) rows out per batch."""
    from ray.data.aggregate import Sum

    from cninfo_crawler_ray.functions.bucketed import grouped_aggregate_auto
    from cninfo_crawler_ray.stages.multimodal import FetchFeaturizer

    fdir, frontier, cfg = _frontier_and_cfg(sf_dir)

    def feat(iid: str, px: "np.ndarray") -> list[dict]:
        counts = orientation_class_counts(_luma_gray(px))
        total = int(counts.sum())
        if total == 0:
            return [{"dom_class": -1, "share_bucket": 0, "n": 1}]
        dom = int(counts.argmax())  # argmax ties -> smallest index
        share = 1000 * int(counts[dom]) // total
        return [{"dom_class": dom, "share_bucket": share // 25, "n": 1}]

    schema = pa.schema([("dom_class", pa.int64()),
                        ("share_bucket", pa.int64()), ("n", pa.int64())])
    parts = frontier.map_batches(
        FetchFeaturizer,
        fn_constructor_args=(f"{fdir}/corpus.parquet", feat, schema),
        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        concurrency=cfg.fetch_actors, num_cpus=cfg.actor_num_cpus,
    )
    return grouped_aggregate_auto(parts, ["dom_class", "share_bucket"],
                                  [Sum("n", alias_name="n")])
