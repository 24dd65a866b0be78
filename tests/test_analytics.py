"""Unit/property tests for the analytics operators that SQL can't pin down:
the HyperLogLog sketch internals (merge associativity, accuracy envelope)
and connected-component label propagation on adversarial graph shapes.
The SQL-expressible analytics are conformance-tested in test_queries.py."""

import numpy as np
import pandas as pd
import pytest

from cninfo_crawler_ray.pipelines import analytics as A

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def _merge_regs(parts: list[pd.DataFrame]) -> pd.DataFrame:
    return (pd.concat(parts, ignore_index=True)
            .groupby("reg", as_index=False)["rank"].max())


def test_hll_partial_merge_associative():
    """Register partials must combine by max regardless of how the id stream
    is split into batches — the property the distributed groupby relies on."""
    rng = np.random.default_rng(7)
    ids = rng.integers(0, 50_000, size=30_000, dtype=np.int64)
    whole = A.hll_partial(ids)
    split3 = _merge_regs([A.hll_partial(c) for c in np.array_split(ids, 3)])
    split17 = _merge_regs([A.hll_partial(c) for c in np.array_split(ids, 17)])
    for other in (split3, split17):
        pd.testing.assert_frame_equal(
            whole.sort_values("reg").reset_index(drop=True),
            other.sort_values("reg").reset_index(drop=True))


@pytest.mark.parametrize("n", [100, 5_000, 200_000])
def test_hll_accuracy_envelope(n):
    """p=12 gives ~1.6% standard error; assert within 5 sigma (8%) across
    three cardinality regimes (linear-counting, transition, raw estimator)."""
    ids = np.arange(n, dtype=np.int64) * 7919 + 13  # distinct, non-contiguous
    est = A.hll_estimate(A.hll_partial(ids))
    assert abs(est - n) / n < 0.08


def test_hll_rank_matches_bit_definition():
    """Vectorized log2 rank == position of the first 1-bit in the low 52
    bits, per-int python reference (the float path is exact below 2^53)."""
    rng = np.random.default_rng(11)
    ids = rng.integers(0, 1 << 62, size=2_000, dtype=np.int64)
    h = A._splitmix64(ids)
    p = A._HLL_P
    width = 64 - p
    rem = (h << np.uint64(p)) >> np.uint64(p)
    got = A.hll_partial(ids, p)
    # reference: python ints, exact bit_length
    ref_rank = np.array([width - int(r).bit_length() + 1 for r in rem],
                        dtype=np.int64)
    reg = (h >> np.uint64(width)).astype(np.int64)
    ref = (pd.DataFrame({"reg": reg, "rank": ref_rank})
           .groupby("reg", as_index=False)["rank"].max())
    pd.testing.assert_frame_equal(
        got.sort_values("reg").reset_index(drop=True),
        ref.sort_values("reg").reset_index(drop=True))


# ---------------------------------------------------------------------------
# Connected components (label propagation over Datasets)
# ---------------------------------------------------------------------------

def _uf_clusters(doc_ids: list[int], pairs: pd.DataFrame) -> pd.DataFrame:
    """Independent union-find reference (mirrors the golden generator)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return pd.DataFrame({"doc_id": pd.Series(doc_ids, dtype="int64"),
                         "cluster_id": pd.Series([find(i) for i in doc_ids],
                                                 dtype="int64")})


def _run_cc(pairs: pd.DataFrame) -> pd.DataFrame:
    out = A.q_dup_clusters(SF, pairs=pairs)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    return (df.sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "cluster_id"]].astype("int64"))


def _doc_ids() -> list[int]:
    import pyarrow.parquet as pq

    return sorted(pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
                  .column("doc_id").to_pylist())


@pytest.mark.usefixtures("ray_session")
def test_cc_long_chain_reverse_orientation():
    """Worst case for min-label propagation: a chain whose edges point away
    from the minimum, so the label must walk the full diameter (exercises
    the multi-iteration fixpoint loop, not just one hop)."""
    ids = _doc_ids()
    chain = ids[:9]
    pairs = pd.DataFrame({"doc_a": chain[1:], "doc_b": chain[:-1]})
    got = _run_cc(pairs)
    want = (_uf_clusters(ids, pairs)
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert (got.set_index("doc_id").loc[chain, "cluster_id"] == chain[0]).all()


@pytest.mark.usefixtures("ray_session")
def test_cc_multiple_components_and_singletons():
    ids = _doc_ids()
    pairs = pd.DataFrame({
        "doc_a": [ids[0], ids[1], ids[10], ids[20], ids[21]],
        "doc_b": [ids[1], ids[2], ids[11], ids[21], ids[22]],
    })
    got = _run_cc(pairs)
    want = (_uf_clusters(ids, pairs)
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # untouched docs are singletons labeled by themselves
    touched = set(pairs["doc_a"]) | set(pairs["doc_b"])
    single = got[~got["doc_id"].isin(touched)]
    assert (single["doc_id"] == single["cluster_id"]).all()


@pytest.mark.usefixtures("ray_session")
def test_cc_empty_pairs_all_singletons():
    got = _run_cc(pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                "doc_b": pd.Series([], dtype="int64")}))
    assert (got["doc_id"] == got["cluster_id"]).all()


# ---------------------------------------------------------------------------
# Quantile index rule
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_group_quantiles_match_numpy_rule():
    """The two-phase binned select must land on exactly the element DuckDB's
    quantile_disc picks: idx = ceil(q*n) - 1 over the sorted group."""
    import pyarrow.parquet as pq
    import math

    out = A.q_group_quantiles(SF)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderpriority", "o_totalprice"]).to_pandas()
    orders["cents"] = np.floor(orders["o_totalprice"] * 100 + 0.5).astype("int64")
    for (prio, qlab), row in df.set_index(["o_orderpriority", "q"]).iterrows():
        q = int(qlab[1:]) / 100
        vals = np.sort(orders.loc[orders["o_orderpriority"] == prio, "cents"].to_numpy())
        idx = min(max(math.ceil(q * len(vals)) - 1, 0), len(vals) - 1)
        assert row["value_cents"] == vals[idx], (prio, qlab)


@pytest.mark.usefixtures("ray_session")
def test_pps_sample_matches_sequential_scan():
    """The distributed range-bucketed prefix scan must select exactly the
    rows a single sequential walk in o_orderkey order selects, at more than
    one bucket width (partitioning must never change the sample)."""
    import pyarrow.parquet as pq

    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderkey", "o_totalprice"]).to_pandas()
    orders = orders.sort_values("o_orderkey")
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    cum = np.cumsum(cents)
    W = 1_000_000_000
    keep = (cum // W) > ((cum - cents) // W)
    want = set(orders.loc[keep, "o_orderkey"])
    assert want, "fixture too small for the sampling interval"
    for width in (512, 8192):
        out = A.q_pps_sample_orders(SF, bucket_width=width)
        got = set((out.to_pandas() if hasattr(out, "to_pandas") else out)["o_orderkey"])
        assert got == want, f"bucket_width={width}"


# ---------------------------------------------------------------------------
# Stratified sampling, set ops, grouped HLL
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_exact_per_stratum():
    """Engine sample == the k smallest Knuth-hash events per stratum,
    computed independently with a driver-side pandas pass."""
    import pyarrow.parquet as pq

    k = 50
    got = A.q_stratified_sample_events(SF, k=k).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "event_type"]).to_pandas()
    ev["h"] = (ev["event_id"].astype("int64") * 2654435761) % (1 << 32)
    want = (ev.sort_values(["event_type", "h", "event_id"], kind="stable")
            .groupby("event_type", sort=False).head(k)[["event_type", "event_id"]])
    key = ["event_type", "event_id"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True))
    # every stratum filled to min(k, stratum size)
    sizes = ev.groupby("event_type").size()
    got_sizes = got.groupby("event_type").size()
    for et, n in sizes.items():
        assert got_sizes.get(et, 0) == min(k, n)


@pytest.mark.usefixtures("ray_session")
def test_custkey_set_ops_match_pandas():
    import pyarrow.parquet as pq

    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_custkey", "o_orderdate"]).to_pandas()
    yr = orders["o_orderdate"].dt.year
    a = set(orders.loc[yr == 1995, "o_custkey"])
    b = set(orders.loc[yr == 1996, "o_custkey"])

    inter = sorted(A.q_custkeys_intersect(SF).to_pandas()["o_custkey"])
    exc = sorted(A.q_custkeys_except(SF).to_pandas()["o_custkey"])
    assert inter == sorted(a & b)
    assert exc == sorted(a - b)


@pytest.mark.usefixtures("ray_session")
def test_grouped_hll_exact_and_envelope():
    """Exact per-group counts must equal pandas nunique; the sketch estimate
    stays inside the 5-sigma HLL envelope (sigma = 1.04/sqrt(4096))."""
    import pyarrow.parquet as pq

    out = A.q_approx_distinct_by_type(SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    want = ev.groupby("event_type")["user_id"].nunique()
    for _, row in out.iterrows():
        exact = want[row["event_type"]]
        assert row["n_users_exact"] == exact
        sigma = 1.04 / np.sqrt(1 << 12)
        assert abs(row["n_users_approx"] - exact) <= max(5 * sigma * exact, 3)


@pytest.mark.usefixtures("ray_session")
def test_embed_clusters_match_independent_kmeans():
    """Engine k-means labeling == an independent numpy recomputation of the
    deterministic quantizer spec (seeded sample sorted by id, PCG64(13)
    init, 3 spherical Lloyd rounds, argmax assignment)."""
    import pyarrow.parquet as pq

    from cninfo_crawler_ray.pipelines import queries as Q

    got = Q.q_embed_clusters(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)

    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas()
    sample = np.stack(emb.head(2048).sort_values("vec_id", kind="stable")
                      ["embedding"].to_numpy()).astype(np.float64)
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rng = np.random.Generator(np.random.PCG64(13))
    C = sample[rng.choice(len(sample), size=min(16, len(sample)), replace=False)]
    for _ in range(3):
        assign = np.argmax(sample @ C.T, axis=1)
        for c in range(len(C)):
            m = sample[assign == c]
            if len(m):
                v = m.mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    mn = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mn = mn / np.maximum(np.linalg.norm(mn, axis=1, keepdims=True), 1e-12)
    want = pd.DataFrame({"vec_id": emb["vec_id"].astype("int64"),
                         "cluster_id": np.argmax(mn @ C.T, axis=1).astype("int64")})
    pd.testing.assert_frame_equal(
        got, want.sort_values("vec_id").reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_curation_pipeline_matches_pandas_chain():
    """The composed curation chain == an independent pandas recomputation:
    same integer gates, md5 keep-min exact dedup, and the doc_b-of-
    surviving-doc_a near-dup drop over the engine's verified pair list."""
    import hashlib
    import pyarrow.parquet as pq

    from cninfo_crawler_ray.functions import text as T
    from cninfo_crawler_ray.pipelines import queries as Q

    got = Q.q_curation_pipeline(SF)

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "source"]).to_pandas()
    feats = T.quality_features(docs["text"])
    lang = T.lang_id(docs["text"])
    keep = (lang == "en") & (feats["n_tokens"] >= 30) & (2 * feats["n_alpha"] >= feats["n_chars"])
    filt = docs.loc[keep.to_numpy()].copy()
    filt["n_tokens"] = feats.loc[keep.to_numpy(), "n_tokens"].to_numpy()
    filt["md5"] = [hashlib.md5(x.encode()).hexdigest() for x in filt["text"]]
    surv = filt.sort_values("doc_id").groupby("md5", sort=False).head(1)

    pairs = Q.q_minhash_lsh_dedup(SF)
    sset = set(surv["doc_id"])
    drops = set(pairs.loc[pairs["doc_a"].isin(sset), "doc_b"])
    final = surv[~surv["doc_id"].isin(drops)]
    want = (final.groupby("source", as_index=False)
            .agg(n_docs=("doc_id", "size"), total_tokens=("n_tokens", "sum"))
            .astype({"n_docs": "int64", "total_tokens": "int64"})
            .sort_values("source").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert len(final) < keep.sum() <= len(docs)  # each stage actually bit


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

def test_heavy_hitters_mg_bounds(ray_session):
    """At a deliberately tiny capacity (4 << vocabulary) the MG guarantees
    must hold: est ≤ true ≤ est + decr_bound for every surviving token, and
    every token whose true count exceeds the bound must survive."""
    import pyarrow.parquet as pq

    out = A.q_heavy_hitters(SF, k=50, capacity=4)
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"]).to_pandas()["text"]
    true = texts.str.lower().str.findall(r"[a-z0-9]+").explode().value_counts()
    decr = int(out["decr_bound"].iloc[0])
    assert decr > 0  # capacity 4 must actually truncate on this corpus
    for tok, est in zip(out["tok"], out["est"]):
        t = int(true.get(tok, 0))
        assert est <= t <= est + decr, (tok, est, t, decr)
    surviving = set(out["tok"])
    for tok, t in true.items():
        if int(t) > decr:
            assert tok in surviving, (tok, t, decr)


def test_heavy_hitters_final_truncate_branch(ray_session):
    """Forcing many small batches at tiny capacity makes the MERGED summary
    exceed capacity, exercising the driver-side final MG truncate; the same
    bounds must still hold, and the summary must end ≤ capacity rows."""
    import pyarrow.parquet as pq

    out = A.q_heavy_hitters(SF, k=50, capacity=4, batch_size=40)
    assert len(out) <= 4
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"]).to_pandas()["text"]
    true = texts.str.lower().str.findall(r"[a-z0-9]+").explode().value_counts()
    decr = int(out["decr_bound"].iloc[0])
    for tok, est in zip(out["tok"], out["est"]):
        assert est <= int(true.get(tok, 0)) <= est + decr


# ---------------------------------------------------------------------------
# word_grams property (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["a", "bb", "c", "dd", "e"]),
                         max_size=14), max_size=8),
       st.integers(min_value=1, max_value=6))
def test_word_grams_property(rows, n):
    """Vectorized word_grams must equal the per-row naive derivation for
    arbitrary token rows and gram sizes (incl. empty rows and n=1)."""
    from cninfo_crawler_ray.functions import text as T

    texts = pd.Series([" ".join(r) for r in rows], dtype=object)
    got = sorted(map(tuple, T.word_grams(texts, n).itertuples(index=False)))
    want = []
    for i, t in enumerate(texts):
        toks = t.split(" ")
        for j in range(len(toks) - n + 1):
            want.append((i, " ".join(toks[j:j + n])))
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# attach strategy parity on null join keys (ADVICE r02)
# ---------------------------------------------------------------------------

def test_attach_null_keys_strategy_parity(ray_session):
    """broadcast_attach and bucketed_attach must agree on float keys with
    NaN: both drop null-key rows, so attach()'s size-based strategy switch
    can never alter output."""
    import numpy as np
    import ray.data as rd

    from cninfo_crawler_ray.functions import bucketed as B

    left = pd.DataFrame({"k": [1.0, np.nan, 2.0, np.nan, 3.0],
                         "v": ["a", "b", "c", "d", "e"]})
    right = pd.DataFrame({"k": [1.0, 2.0, np.nan], "p": [10, 20, 99]})

    def run(fn):
        out = fn(rd.from_pandas(left), "k", rd.from_pandas(right),
                 "k", "p", "pay").to_pandas()
        return out.sort_values(["k", "v"]).reset_index(drop=True)[
            ["k", "v", "pay"]].astype({"pay": "int64"})

    bc = run(B.broadcast_attach)
    bk = run(B.bucketed_attach)
    pd.testing.assert_frame_equal(bc, bk)
    # NaN-keyed rows (either side) joined nothing
    assert len(bc) == 2 and set(bc["pay"]) == {10, 20}


# ---------------------------------------------------------------------------
# bloom prefilter internals (q_bloom_semi_join_orders)
# ---------------------------------------------------------------------------

def test_bloom_bitmap_no_false_negatives_and_low_fp():
    """The packed double-hash bitmap must admit EVERY inserted key (the
    exactness of the semi-join rests on zero false negatives; false
    positives are removed by the verify join) and should prune almost all
    non-members at the sized load factor."""
    rng = np.random.default_rng(3)
    members = rng.choice(10_000_000, size=20_000, replace=False).astype(np.uint64)
    others = (rng.choice(10_000_000, size=50_000, replace=False) + 10_000_000).astype(np.uint64)

    bits = np.zeros(A._BLOOM_BITS // 64, dtype=np.uint64)
    for j in range(A._BLOOM_K):
        idx = A._bloom_probe_idx(members, j)
        np.bitwise_or.at(bits, idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64))

    def probe(keys):
        ok = np.ones(len(keys), dtype=bool)
        for j in range(A._BLOOM_K):
            idx = A._bloom_probe_idx(keys, j)
            ok &= (bits[idx >> 6] >> (idx & 63).astype(np.uint64)) & np.uint64(1) != 0
        return ok

    assert probe(members).all()  # zero false negatives, unconditionally
    fp = probe(others).mean()
    # 20k keys in 2^20 bits, k=4 → theoretical fp ≈ (1-e^(-4*20000/2^20))^4 ≈ 3e-5
    assert fp < 0.01


# ---------------------------------------------------------------------------
# KLL quantile sketch (q_kll_quantiles_value)
# ---------------------------------------------------------------------------

def _kll_rank_error(vals, est, q):
    return abs(np.searchsorted(np.sort(vals), est, side="right") / len(vals) - q)


@pytest.mark.parametrize("nsplit", [1, 7, 64])
def test_kll_rank_error_bound(nsplit):
    """Rank error of the merged sketch stays ≤ ~1.5% at k=512 however the
    stream is split into partial summaries (the mergeability property the
    distributed reduce relies on)."""
    rng = np.random.default_rng(5)
    vals = rng.lognormal(3.0, 1.5, size=200_000)  # heavy-tailed, continuous
    parts = pd.concat([A.kll_partial(c) for c in np.array_split(vals, nsplit)],
                      ignore_index=True)
    summary = A.kll_merge(parts)
    # summary is bounded: ≤ 2k rows per level, ~log2(n/k) levels
    assert len(summary) <= 2 * A._KLL_K * 12
    for q in (0.1, 0.5, 0.9, 0.99):
        est = A.kll_quantile(summary, q)
        assert _kll_rank_error(vals, est, q) < 0.015, (q, est)


def test_kll_exact_when_under_capacity():
    """Below 2k items no compaction ever fires, so the sketch is EXACT —
    the property that makes small-scale results reproducible."""
    vals = np.arange(1000, dtype="float64")[::-1].copy()
    s = A.kll_partial(vals)
    assert (s["level"] == 0).all() and len(s) == 1000
    assert A.kll_quantile(s, 0.5) == 499.0


# ---------------------------------------------------------------------------
# banded Levenshtein (hypothesis) — the fuzzy-join kernel must agree with
# the unrestricted DP (the DuckDB `levenshtein` semantics) inside the band
# ---------------------------------------------------------------------------

def _lev_full(s: str, t: str) -> int:
    prev = list(range(len(t) + 1))
    for i in range(1, len(s) + 1):
        cur = [i] + [0] * len(t)
        for j in range(1, len(t) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (s[i - 1] != t[j - 1]))
        prev = cur
    return prev[len(t)]


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcde ", max_size=12),
       st.text(alphabet="abcde ", max_size=12),
       st.integers(min_value=0, max_value=4))
def test_levenshtein_band_matches_full_dp(s, t, k):
    d_true = _lev_full(s, t)
    d_band = A._levenshtein_band(s, t, k)
    if d_true <= k:
        assert d_band == d_true
    else:
        assert d_band > k


# ---------------------------------------------------------------------------
# Business-day closed form
# ---------------------------------------------------------------------------

def test_weekday_prefix_matches_busday_count():
    """The closed-form W(b)−W(a) must equal numpy's calendar-walking
    busday_count over (a, b] for arbitrary date pairs (different algorithm
    family: arithmetic vs per-day weekday mask)."""
    rng = np.random.default_rng(11)
    a = rng.integers(8035, 12000, size=500)  # epoch days, 1992..2002-ish
    b = a + rng.integers(0, 200, size=500)
    mine = A._weekday_prefix(b + 3) - A._weekday_prefix(a + 3)
    ref = np.busday_count(a.astype("datetime64[D]") + 1,
                          (b + 1).astype("datetime64[D]"))
    assert (mine == ref).all()


# ---------------------------------------------------------------------------
# Strictly-increasing runs (gaps-and-islands)
# ---------------------------------------------------------------------------

def test_increasing_runs_hand_case():
    """Vectorized island arithmetic vs a per-customer Python scan on a frame
    with cross-customer boundaries, ties (not increasing), and singletons."""
    df = pd.DataFrame({
        "o_custkey": [1, 1, 1, 1, 2, 2, 3],
        "o_orderkey": [1, 2, 3, 4, 1, 2, 1],
        "d": [10, 11, 12, 13, 10, 11, 10],
        "cents": [5, 7, 7, 9, 4, 2, 8],
    })
    cust = df["o_custkey"].to_numpy()
    cents = df["cents"].to_numpy()
    same = np.concatenate(([False], cust[1:] == cust[:-1]))
    inc = np.concatenate(([False], cents[1:] > cents[:-1])) & same
    rid = np.cumsum(~inc)
    rl = pd.DataFrame({"cust": cust, "rid": rid}).groupby(
        "rid", sort=False).agg(cust=("cust", "first"), n=("cust", "size"))
    mx = rl.groupby("cust", sort=False)["n"].max()
    # customer 1: 5,7 | 7,9 -> max run 2; customer 2: 4 | 2 -> 1; cust 3: 1
    assert mx.to_dict() == {1: 2, 2: 1, 3: 1}


# ---------------------------------------------------------------------------
# Exact integer autocorrelation
# ---------------------------------------------------------------------------

def test_autocorr_integer_form_matches_float_formula():
    """⌊1e6·Σc_t·c_{t−1}/Σc_t²⌋ with c = n·x−S must track the float centered
    autocorrelation to within the 1-ulp floor window."""
    rng = np.random.default_rng(5)
    x = rng.integers(1, 100, size=400).tolist()
    n, s = len(x), sum(x)
    c = [n * v - s for v in x]
    num = sum(c[t] * c[t - 1] for t in range(1, n))
    den = sum(v * v for v in c)
    mine = (num * 10**6) // den
    xf = np.asarray(x, dtype=np.float64)
    cf = xf - xf.mean()
    ref = float((cf[1:] * cf[:-1]).sum() / (cf * cf).sum())
    assert abs(mine / 1e6 - ref) < 2e-6


# ---------------------------------------------------------------------------
# Round-3 batch: moments, islands, token position, LOCF, partition audit
# ---------------------------------------------------------------------------

def test_moment3_closed_form_matches_scipy_style_float():
    """n²Σx³ − 3nΣxΣx² + 2(Σx)³ must equal n³·m3 (float check within ulp)."""
    rng = np.random.default_rng(11)
    x = rng.integers(1, 51, size=500).tolist()
    n = len(x)
    s1, s2, s3 = sum(x), sum(v * v for v in x), sum(v ** 3 for v in x)
    num = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
    xf = np.asarray(x, dtype=np.float64)
    m3 = float(((xf - xf.mean()) ** 3).mean())
    assert abs(num / n ** 3 - m3) < 1e-6 * max(1.0, abs(m3))


def test_islands_tagged_union_hand_case():
    """Points {3,4,5, 9, 12,13}: 3 islands, span 11, 5 missing."""
    pts = np.array([3, 4, 5, 9, 12, 13], dtype=np.int64)
    present = set(pts.tolist())
    islands = sum(1 for p in present if p - 1 not in present)
    assert islands == 3
    assert int(pts.max() - pts.min() + 1 - len(present)) == 5


def test_token_first_position_sentinel_kernel():
    """The replace-first/split/count-spaces kernel must equal DuckDB
    list_position(string_split(text,' '),'the') on tricky layouts."""
    import duckdb
    texts = ["the cat", "a the b", "a  the b", "nothing here", "thethe x",
             "x the the y", "", "the", "a b c the"]
    s = pd.Series(texts)
    padded = " " + s.astype(str) + " "
    found = padded.str.contains(" the ", regex=False)
    pre = padded.str.replace(" the ", "\x00", n=1, regex=False) \
        .str.split("\x00").str[0]
    p = np.where(found, pre.str.count(" ").to_numpy() + 1, 0)
    expect = [duckdb.sql(
        "SELECT COALESCE(list_position(string_split(?, ' '), 'the'), 0)",
        params=[t]).fetchone()[0] for t in texts]
    assert p.tolist() == expect


def test_locf_vectorized_carry_forward():
    """np.maximum.accumulate carry must equal the scalar LOCF recurrence."""
    mx = np.array([-1, -1, 5, -1, -1, 7, -1], dtype=np.int64)
    carry = np.maximum.accumulate(np.where(mx >= 0, np.arange(len(mx)), -1))
    locf = np.where(carry >= 0, mx[np.maximum(carry, 0)], 0)
    assert locf.tolist() == [0, 0, 5, 5, 5, 7, 7]


def test_partition_balance_bucket_edges():
    """Integer equi-width bucketing: min lands in 0, max in 31, and the
    bucket function is monotone with no value escaping [0, 31]."""
    lo, hi = 1000, 99999
    span = hi - lo + 1
    c = np.array([lo, lo + 1, (lo + hi) // 2, hi - 1, hi], dtype=np.int64)
    b = np.minimum((c - lo) * 32 // span, 31)
    assert b[0] == 0 and b[-1] == 31
    assert (np.diff(b) >= 0).all()
    # degenerate one-point domain: everything in bucket 0
    assert int(np.minimum((np.int64(5) - 5) * 32 // 1, 31)) == 0


def test_kmv_merge_property_and_exact_fallback():
    """k-smallest of the union of per-batch k-smallest == k-smallest of the
    whole set (mergeability), and <k distinct falls back to exact count."""
    k = 8
    rng = np.random.default_rng(3)
    users = rng.integers(0, 500, size=2000)
    h = ((users.astype(np.uint64) * np.uint64(2654435761))
         & np.uint64(0xFFFFFFFF)).astype(np.int64)
    whole = np.unique(h)[:k]
    batches = np.array_split(h, 7)
    merged = np.unique(np.concatenate(
        [np.unique(b)[:k] for b in batches]))[:k]
    assert whole.tolist() == merged.tolist()
    # estimate is within 50% of truth for this seed (sanity, not precision)
    kth = int(whole[k - 1])
    est = (k - 1) * (1 << 32) // kth
    truth = len(np.unique(users))
    assert 0.3 * truth < est < 3 * truth


def test_loo_encoding_hand_case():
    """Group values [10,20,30] cents: LOO milli = 1000·(S−x)/(n−1)."""
    s, n = 60, 3
    assert [(1000 * (s - x)) // (n - 1) for x in (10, 20, 30)] \
        == [25000, 20000, 15000]


def test_iso_week_parity_on_year_boundaries():
    """pandas isocalendar must agree with DuckDB isoyear()/week() on the
    awkward Jan-1/Dec-31 dates (the whole point of the operator)."""
    import duckdb
    dates = ["1995-01-01", "1996-01-01", "1996-12-31", "1998-12-31",
             "2000-01-03", "2001-01-01"]
    s = pd.Series(pd.to_datetime(dates))
    iso = s.dt.isocalendar()
    for d, y, w in zip(dates, iso["year"], iso["week"]):
        dy, dw = duckdb.sql(
            f"SELECT isoyear(DATE '{d}'), week(DATE '{d}')").fetchone()
        assert (int(y), int(w)) == (dy, dw), d


def test_bag_except_multiset_hand_case():
    """EXCEPT ALL semantics: key kept with max(c97−c98, 0) multiplicity."""
    df = pd.DataFrame({"k": [1, 1, 1, 2, 2, 3],
                       "y": [97, 97, 98, 98, 98, 97]})
    g = df.assign(c97=(df.y == 97).astype(int),
                  c98=(df.y == 98).astype(int)) \
        .groupby("k", as_index=False)[["c97", "c98"]].sum()
    keep = g[g.c97 > g.c98]
    assert dict(zip(keep.k, keep.c97 - keep.c98)) == {1: 1, 3: 1}


def test_equidepth_percentile_disc_rule():
    """boundary k = ceil(k·n/32)-th smallest (1-based) must match DuckDB
    quantile_disc at dyadic quantiles on a known multiset."""
    import duckdb
    vals = [5, 5, 7, 9, 9, 9, 12, 20, 20, 31]
    n = len(vals)
    srt = sorted(vals)
    for k in (1, 8, 16, 24, 31):
        target = (k * n + 31) // 32
        mine = srt[target - 1]
        ref = duckdb.sql(
            f"SELECT quantile_disc(x, {k}/32.0) FROM "
            f"(SELECT UNNEST({vals}) AS x)").fetchone()[0]
        assert mine == ref, (k, mine, ref)


def test_bloom_bitset_pass_implies_member_superset():
    """Every true member must pass the filter (no false negatives), and
    the bit array built from index unions equals the classic set-bits."""
    k_build = np.array([3, 17, 999, 123456], dtype=np.int64)
    k_probe = np.array([3, 17, 999, 123456, 42, 7, 100001], dtype=np.int64)
    bits = np.zeros(65536, dtype=bool)
    bits[(k_build * 2654435761) % 65536] = True
    bits[(k_build * 2246822519 + 11) % 65536] = True
    passed = bits[(k_probe * 2654435761) % 65536] \
        & bits[(k_probe * 2246822519 + 11) % 65536]
    member = np.isin(k_probe, k_build)
    assert (passed | ~member).all()  # no false negatives
    assert passed[:4].all()


def test_pct_of_parent_shares_sum_close_to_10000():
    """Floor-divided child shares sum to ≤ 10000 and within #children."""
    cents = pd.Series([333, 333, 334], dtype="int64")
    tot = int(cents.sum())
    bps = (cents * 10000 // tot)
    assert bps.sum() <= 10000 and 10000 - bps.sum() < len(cents)


def test_cms_estimate_never_underestimates():
    """CMS property: estimate ≥ true count for every key, with equality
    when a key collides with nothing in at least one row."""
    rng = np.random.default_rng(9)
    keys = rng.choice(np.arange(500, dtype=np.int64), size=3000)
    uniq, c = np.unique(keys, return_counts=True)
    sketch = np.zeros(2048, dtype=np.int64)
    np.add.at(sketch, (uniq * 2654435761) % 1024, c)
    np.add.at(sketch, 1024 + (uniq * 2246822519 + 11) % 1024, c)
    est = np.minimum(sketch[(uniq * 2654435761) % 1024],
                     sketch[1024 + (uniq * 2246822519 + 11) % 1024])
    assert (est >= c).all()


def test_ams_estimates_bracket_f2_on_average():
    """X_j² is an unbiased F₂ estimator: the 4-counter mean should land
    within a loose factor of the exact F₂ for a spread-out vector."""
    rng = np.random.default_rng(21)
    k = np.arange(1000, dtype=np.int64)
    c = rng.integers(1, 60, size=1000).astype(np.int64)
    f2 = int((c * c).sum())
    ests = []
    for a in (2654435761, 2246822519, 3266489917, 668265263):
        sign = 1 - 2 * (((k * a) >> 7) & 1)
        ests.append(int((sign * c).sum()) ** 2)
    mean = sum(ests) // 4
    assert f2 // 5 < mean < f2 * 5


def test_bisection_bucket_range_is_tight():
    """The integer bucket inversion must cover exactly the values mapping
    to bucket b: lo + ceil(b·span/1024) .. lo + floor(((b+1)·span−1)/1024)."""
    lo, hi = 1000, 987654
    span = hi - lo + 1
    vals = np.arange(lo, hi + 1, 97, dtype=np.int64)
    b = (vals - lo) * 1024 // span
    for bucket in np.unique(b)[:5]:
        sel = vals[b == bucket]
        blo = lo + (int(bucket) * span + 1023) // 1024
        bhi = lo + ((int(bucket) + 1) * span - 1) // 1024
        assert sel.min() >= blo and sel.max() <= bhi


def test_median_selection_equals_sorted_rank():
    """Iterative narrowing must land on the ceil(n/2)-th smallest value."""
    rng = np.random.default_rng(13)
    vals = rng.integers(0, 10**7, size=9999).astype(np.int64)
    n = len(vals)
    target = (n + 1) // 2
    lo, hi = int(vals.min()), int(vals.max())
    t = target
    while hi - lo + 1 > 4096:
        span = hi - lo + 1
        sel = vals[(vals >= lo) & (vals <= hi)]
        b = (sel - lo) * 1024 // span
        cnt = np.bincount(b, minlength=1024)
        cum = cnt.cumsum()
        i = int(np.searchsorted(cum, t, side="left"))
        t -= int(cum[i - 1]) if i else 0
        lo, hi = lo + (i * span + 1023) // 1024, lo + ((i + 1) * span - 1) // 1024
    sel = np.sort(vals[(vals >= lo) & (vals <= hi)])
    assert sel[t - 1] == np.sort(vals)[target - 1]


def test_morton_spread_matches_bitwise_sum():
    from cninfo_crawler_ray.pipelines.analytics import _morton8

    rng = np.random.default_rng(2)
    x = rng.integers(0, 2048, 500).astype(np.int64)
    y = rng.integers(0, 2048, 500).astype(np.int64)
    z = _morton8(x, y)
    ref = np.zeros_like(x)
    for i in range(8):
        ref += ((x >> i) & 1) * 4**i + 2 * (((y >> i) & 1) * 4**i)
    assert (z == ref).all()
    # locality sanity: neighbors in x differ in low z bits only
    assert _morton8(np.array([4]), np.array([4]))[0] == 0b110000


def test_prefix_fold_matches_duckdb_list_slice():
    """The split(expand)+fold prefix must equal DuckDB's
    array_to_string(list_slice(string_split(text,' '),1,5),' ')."""
    import duckdb
    texts = ["a b c d e f g", "one two", "", "x  y z", "t1 t2 t3 t4 t5",
             "solo", "a b c d e"]
    s = pd.Series(texts)
    cols = s.str.split(" ", n=5, expand=True)
    prefix = cols[0].fillna("")
    for i in range(1, min(5, cols.shape[1])):
        nxt = cols[i]
        prefix = prefix.where(nxt.isna(), prefix + " " + nxt.fillna(""))
    for t, mine in zip(texts, prefix):
        ref = duckdb.sql(
            "SELECT array_to_string(list_slice(string_split(?, ' '), 1, 5)"
            ", ' ')", params=[t]).fetchone()[0]
        assert mine == ref, (t, mine, ref)


def test_checksum_is_order_and_partition_independent():
    """Permuting rows or re-batching must not change the checksum."""
    rng = np.random.default_rng(4)
    ok = rng.integers(0, 10**6, 1000).astype(np.int64)
    ck = rng.integers(0, 10**4, 1000).astype(np.int64)
    cents = rng.integers(0, 10**7, 1000).astype(np.int64)
    h = (ok * 2654435761 + ck * 2246822519 + cents * 3266489917) % (1 << 31)
    whole = int(h.sum()) % (1 << 31)
    perm = rng.permutation(1000)
    parts = np.array_split(h[perm], 7)
    rebatched = sum(int(p.sum()) for p in parts) % (1 << 31)
    assert whole == rebatched


def test_bitmap_mask_counts_answer_pair_overlaps():
    """Pair overlap from 2^T mask counters must equal direct set
    intersection counts."""
    rng = np.random.default_rng(8)
    users = {}
    for u in range(200):
        users[u] = set(rng.choice(5, size=rng.integers(1, 5),
                                  replace=False).tolist())
    counts = np.zeros(32, dtype=np.int64)
    for bits in users.values():
        counts[sum(1 << b for b in bits)] += 1
    for i in range(5):
        for j in range(i + 1, 5):
            via_mask = sum(int(c) for m, c in enumerate(counts)
                           if (m >> i) & 1 and (m >> j) & 1)
            direct = sum(1 for s in users.values() if i in s and j in s)
            assert via_mask == direct


def test_frexp_exponent_is_exact_log2_floor():
    """frexp exponent − 1 == ⌊log2⌋ including exact powers of two."""
    vals = np.array([1, 2, 3, 4, 7, 8, 1023, 1024, 1025,
                     (1 << 40) - 1, 1 << 40], dtype=np.int64)
    b = np.frexp(vals.astype(np.float64))[1] - 1
    expect = [v.bit_length() - 1 for v in vals.tolist()]
    assert b.tolist() == expect


def test_hamilton_seats_sum_to_target_and_respect_quota():
    """Largest-remainder allocation: seats sum exactly to 1000 and every
    stratum gets ⌊quota⌋ or ⌈quota⌉ (quota property)."""
    counts = np.array([17, 5, 3, 3, 2], dtype=np.int64)
    total = int(counts.sum())
    quota = counts * 1000
    base = quota // total
    rem = quota % total
    bonus = 1000 - int(base.sum())
    order = np.lexsort((np.arange(len(counts)), -rem))
    extra = np.zeros(len(counts), dtype=np.int64)
    extra[order[:bonus]] = 1
    seats = base + extra
    assert int(seats.sum()) == 1000
    assert ((seats == base) | (seats == base + 1)).all()


def test_zipwithindex_offsets_reconstruct_global_ranks():
    """Per-block prefix-sum offsets + local arange must equal the global
    sorted row number."""
    rng = np.random.default_rng(6)
    keys = rng.permutation(10000).astype(np.int64)
    blocks = np.array_split(np.sort(keys), 7)  # range-partitioned blocks
    metas = sorted((int(b.min()), len(b)) for b in blocks if len(b))
    offs = {}
    acc = 0
    for mk, c in metas:
        offs[mk] = acc
        acc += c
    rn = {}
    for b in blocks:
        s = np.sort(b)
        for i, k in enumerate(s.tolist()):
            rn[k] = offs[int(s.min())] + 1 + i
    expect = {int(k): i + 1 for i, k in enumerate(np.sort(keys).tolist())}
    assert rn == expect


def test_hist_intersection_bounds_and_self_similarity():
    """Σ min of per-mille shares is ≤ 1000 and exactly ≤ either side's
    total share; identical histograms intersect at their own share sum."""
    a = np.array([400, 300, 200, 100], dtype=np.int64)
    assert int(np.minimum(a, a).sum()) == 1000
    b = np.array([100, 200, 300, 400], dtype=np.int64)
    inter = int(np.minimum(a, b).sum())
    assert inter <= 1000 and inter == 100 + 200 + 200 + 100


def test_linear_interp_exact_hand_case():
    """Gap days between (day 10, v 100) and (day 14, v 300) interpolate to
    150/200/250; outside days are 0; observed days keep their value."""
    od = np.array([10, 14], dtype=np.int64)
    ov = np.array([100, 300], dtype=np.int64)
    days = np.arange(8, 17, dtype=np.int64)
    right = np.searchsorted(od, days, side="left")
    left = np.searchsorted(od, days, side="right") - 1
    inside = (left >= 0) & (right < len(od))
    a = od[np.clip(left, 0, len(od) - 1)]
    b = od[np.clip(right, 0, len(od) - 1)]
    v0 = ov[np.clip(left, 0, len(od) - 1)]
    v1 = ov[np.clip(right, 0, len(od) - 1)]
    observed = inside & (a == days)
    span = np.where(b > a, b - a, 1)
    interp = (v0 * (b - days) + v1 * (days - a)) // span
    val = np.where(observed, v0, np.where(inside, interp, 0))
    assert val.tolist() == [0, 0, 100, 150, 200, 250, 300, 0, 0]


def test_session_segmentation_hand_case():
    """Gaps of exactly 1800 s stay in-session; 1801 s splits; equal
    timestamps never split; bounce = single-event session."""
    t = np.array([0, 1800, 3601, 3601, 9999], dtype=np.int64)
    gap = np.diff(t, prepend=t[0])
    start = np.concatenate([[True], gap[1:] > 1800])
    sid = np.cumsum(start)
    sizes = pd.Series(sid).groupby(sid).size()
    assert len(sizes) == 3           # {0,1800}, {3601,3601}, {9999}
    assert int((sizes == 1).sum()) == 1


def test_sliding_window_sparse_two_pointer():
    """Prefix-sum searchsorted window counts must equal brute force, and
    the max over observed end-minutes is the true max."""
    rng = np.random.default_rng(17)
    ms = np.unique(rng.integers(0, 500, 60)).astype(np.int64)
    cs = rng.integers(1, 9, len(ms)).astype(np.int64)
    prefix = np.concatenate([[0], cs.cumsum()])
    j = np.searchsorted(ms, ms - 59, side="left")
    wc = prefix[1 + np.arange(len(ms))] - prefix[j]
    for i, m in enumerate(ms.tolist()):
        brute = int(cs[(ms > m - 60) & (ms <= m)].sum())
        assert brute == int(wc[i])
    # any window ending between observed minutes counts a subset of the
    # window ending at the PREVIOUS observed minute + nothing new
    assert int(wc.max()) == max(
        int(cs[(ms > m - 60) & (ms <= m)].sum()) for m in range(501))


def test_theilsen_float_ordering_is_exact_for_small_fractions():
    """Distinct fractions dy/dx with |dy| < 2^20, 0 < dx < 4096 can never
    collide in float64, so the sort is exact."""
    rng = np.random.default_rng(31)
    dy = rng.integers(-1000, 1000, 5000).astype(np.int64)
    dx = rng.integers(1, 4096, 5000).astype(np.int64)
    r = dy / dx
    order = np.lexsort((dx, dy, r))
    rs = r[order]
    # equal floats must be equal fractions (cross-multiplication check)
    eq = np.nonzero(np.diff(rs) == 0)[0]
    a, b = order[eq], order[eq + 1]
    assert (dy[a] * dx[b] == dy[b] * dx[a]).all()
    # Theil-Sen on a clean line recovers the slope exactly
    d = np.arange(50, dtype=np.int64)
    x = 3 * d + 7
    i, j = np.triu_indices(50, k=1)
    s = (x[j] - x[i]) * 10**6 // (d[j] - d[i])
    assert int(np.median(s)) == 3_000_000


def test_kmv_jaccard_estimator_on_known_sets():
    """Ĵ = |U ∩ A ∩ B| / k is exact when both sets fit inside k."""
    a = np.arange(0, 40, dtype=np.int64)
    b = np.arange(20, 60, dtype=np.int64)
    h = lambda v: ((v.astype(np.uint64) * np.uint64(2654435761))
                   & np.uint64(0xFFFFFFFF)).astype(np.int64)
    ha, hb = np.unique(h(a)), np.unique(h(b))
    union = np.unique(np.concatenate([ha, hb]))[:64]
    both = np.intersect1d(ha, hb)
    k_eff = min(64, len(union))
    j_est = len(np.intersect1d(union, both)) * 10000 // k_eff
    j_exact = len(both) * 10000 // (len(ha) + len(hb) - len(both))
    assert j_est == j_exact == 20 * 10000 // 60


def test_grouped_equidepth_quartiles_hand_case():
    """Per-group ceil(k·n/4) cut must match sorted-rank selection."""
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    srt = sorted(vals)
    n = len(vals)
    cuts = [srt[(k * n + 3) // 4 - 1] for k in (1, 2, 3)]
    assert cuts == [1, 3, 5]


def test_two_level_distinct_count_survives_rebatching():
    """Per-batch dedup + keyed Max + per-key Sum equals COUNT(DISTINCT)."""
    rng = np.random.default_rng(12)
    ok = rng.integers(0, 50, 400).astype(np.int64)
    pk = rng.integers(0, 30, 400).astype(np.int64)
    df = pd.DataFrame({"o": ok, "p": pk})
    truth = df.groupby("o")["p"].nunique()
    batches = np.array_split(np.arange(400), 5)
    pairs = pd.concat([df.iloc[b].drop_duplicates() for b in batches])
    dedup = pairs.drop_duplicates()
    mine = dedup.groupby("o")["p"].size()
    assert mine.to_dict() == truth.to_dict()
