"""Smoke for the driver contract: entry() and the crawl-specific rows-only
queries run under an existing Ray session without calling ray.init."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as E

    return E


def test_entry_runs(entrymod):
    wide = entrymod.entry()
    assert len(wide) > 10
    assert "是否包含数据资产" in wide.columns


@pytest.mark.parametrize("name", ["crawl_frontier", "fetch_decode_stats", "wide_report",
                                  "image_features", "scheduled_crawl", "phash_near_dup",
                                  "image_dup_clusters"])
def test_crawl_queries_run(entrymod, name):
    res = entrymod.queries()[name](SF)
    import ray.data as rd

    df = res.to_pandas() if isinstance(res, rd.Dataset) else res
    assert len(df) > 0
    assert len(df.columns) > 0


def test_phash_near_dup_finds_planted_clones(entrymod):
    """The fixture clones pixels of row i-1 at every i % 211 == 0 (i > 0) —
    identical pixels ⇒ identical phash ⇒ the LSH must surface the pair."""
    pairs = entrymod.queries()["phash_near_dup"](SF)
    got = set(zip(pairs["image_a"], pairs["image_b"]))
    for i in (211, 422, 633, 844):
        want = (f"img_{i - 1:08d}", f"img_{i:08d}")
        assert want in got, f"planted clone pair {want} not found"


def test_image_dup_clusters_planted_clones(entrymod):
    """Planted pixel clones (i-1, i) at i % 211 == 0 must share a cluster
    labeled by the smaller image number, and a clean image far from any
    clone must be a singleton labeling itself."""
    cc = entrymod.queries()["image_dup_clusters"](SF).to_pandas()
    lab = dict(zip(cc["image_id"], cc["cluster_id"]))
    for i in (211, 422, 633):
        assert lab[f"img_{i:08d}"] == lab[f"img_{i - 1:08d}"] <= i - 1
    assert lab["img_00000100"] == 100 or lab["img_00000100"] < 100


def test_image_dhash_near_dup_finds_planted_clones(entrymod):
    """Pixel clones have identical dhash (hamming 0), so every planted
    clone pair whose BOTH sides survive frontier validation must be in the
    output (dhash runs over the validated frontier, not the raw corpus);
    all pairs must be canonically ordered a < b."""
    fr = entrymod.queries()["crawl_frontier"](SF).to_pandas()
    iids = {u.rsplit("/", 1)[-1].rsplit(".", 1)[0] for u in fr["PDF链接"]}
    pairs = entrymod.queries()["image_dhash_near_dup"](SF)
    got = set(zip(pairs["image_a"], pairs["image_b"]))
    expected = [(f"img_{i - 1:08d}", f"img_{i:08d}") for i in (211, 422, 633, 844)
                if f"img_{i - 1:08d}" in iids and f"img_{i:08d}" in iids]
    assert expected, "fixture lost every planted clone pair from the frontier"
    for want in expected:
        assert want in got, f"planted clone pair {want} not found"
    for a, b in got:
        assert a < b


def test_image_hist_queries_cover_decoded_frontier(entrymod):
    """Aspect-ratio and gradient-energy histograms both count each decoded
    frontier image exactly once — their totals must equal the decoded-image
    count (image_features rows, same fused actor path)."""
    n_decoded = len(entrymod.queries()["image_features"](SF).to_pandas())
    assert n_decoded > 0
    for name in ("image_aspect_ratio_hist", "image_gradient_energy_hist",
                 "image_channel_cast_hist"):
        out = entrymod.queries()[name](SF).to_pandas()
        assert int(out["n"].sum()) == n_decoded, name
        assert (out["n"] > 0).all()


def test_image_format_size_stats_sniffs_the_lie(entrymod):
    """Per-format counts must follow the SNIFFED container, not the lying
    fmt metadata: planted rows (i % 103 == 0) store raw payloads under
    fmt='qlossy', so any such frontier row must be counted as raw. Totals
    must cover every decoded frontier image."""
    out = entrymod.queries()["image_format_size_stats"](SF).to_pandas()
    n_decoded = len(entrymod.queries()["image_features"](SF).to_pandas())
    assert int(out["n"].sum()) == n_decoded
    assert (out["total_bytes"] > out["n"]).all()  # every payload is >1 byte
    import pyarrow.parquet as pq

    from cninfo_crawler_ray.sources.corpus import ensure_fixtures

    fdir = ensure_fixtures(1000)
    corpus = pq.read_table(f"{fdir}/corpus.parquet",
                           columns=["image_id", "fmt"]).to_pandas()
    n_qlossy_meta = int((corpus["fmt"] == "qlossy").sum())
    n_qlossy_got = int(out.set_index("fmt")["n"].get("qlossy", 0))
    # the frontier is a subset, so sniffed qlossy < metadata qlossy is the
    # weak bound; the exact check is the sf0.01 oracle gate
    assert n_qlossy_got < n_qlossy_meta


def test_caption_ops_match_stored_column(entrymod):
    """Captions decoded out of the payload metadata trailer must agree with
    the corpus's stored caption column over the validated frontier — token
    totals and duplicate groups both (independent pandas recomputation)."""
    import pyarrow.parquet as pq

    from cninfo_crawler_ray.sources.corpus import ensure_fixtures

    fr = entrymod.queries()["crawl_frontier"](SF).to_pandas()
    iids = {u.rsplit("/", 1)[-1].rsplit(".", 1)[0] for u in fr["PDF链接"]}
    fdir = ensure_fixtures(1000)
    corpus = pq.read_table(f"{fdir}/corpus.parquet",
                           columns=["image_id", "caption"]).to_pandas()
    sub = corpus[corpus["image_id"].isin(iids)]

    stats = entrymod.queries()["caption_token_stats"](SF).to_pandas()
    assert int(stats["n"].sum()) == len(sub)
    assert int(stats["total_tokens"].sum()) == sum(
        len(c.split()) for c in sub["caption"])
    assert int(stats["n_empty"].sum()) == int((sub["caption"] == "").sum())

    dups = entrymod.queries()["caption_dup_groups"](SF)
    vc = sub.loc[sub["caption"] != "", "caption"].value_counts()
    want = {(c, int(n)) for c, n in vc[vc > 1].items()}
    got = set(zip(dups["caption"], (int(v) for v in dups["n"])))
    assert got == want


def test_phash_bit_balance_matches_numpy(entrymod):
    """Per-bit set counts over the stored phash column must equal a direct
    numpy recomputation at the 1k fixture, and n must equal the corpus row
    count for every bit."""
    import numpy as np
    import pyarrow.parquet as pq

    from cninfo_crawler_ray.sources.corpus import ensure_fixtures

    out = entrymod.queries()["phash_bit_balance"](SF).to_pandas()
    fdir = ensure_fixtures(1000)
    h = pq.read_table(f"{fdir}/corpus.parquet", columns=["phash"]
                      )["phash"].to_numpy().view(np.uint64)
    assert len(out) == 64
    assert (out["n"] == len(h)).all()
    got = out.sort_values("b")["n_set"].to_numpy()
    want = np.array([int(((h >> np.uint64(b)) & np.uint64(1)).sum())
                     for b in range(64)])
    assert (got == want).all()


def test_image_region_near_dup_clones_score_four(entrymod):
    """Planted pixel clones share every quadrant, so any clone pair in the
    output must score n_quads == 4; at least one must be present, and no
    pair may score more than 4."""
    out = entrymod.queries()["image_region_near_dup"](SF)
    assert (out["n_quads"] <= 4).all()
    clones = out[[abs(int(a[4:]) - int(b[4:])) == 1
                  for a, b in zip(out["image_a"], out["image_b"])]]
    fours = clones[clones["n_quads"] == 4]
    assert len(fours) >= 1
    pair_max = out.groupby(["image_a", "image_b"])["n_quads"].max()
    for (a, b), n in fours.set_index(["image_a", "image_b"])["n_quads"].items():
        assert pair_max[(a, b)] == 4


def test_decode_psnr_invariant(entrymod):
    """North-rule per-row invariant as a pipeline: every decoded payload
    meets the PSNR ≥ 40 dB bar (lossless formats exact → 999.0 clamp)."""
    df = entrymod.queries()["decode_psnr_stats"]("/root/testdata/sf0.001").to_pandas()
    assert set(df["fmt"]) == {"raw", "ppm", "qlossy"}
    assert (df["n"] == df["n_psnr_ge_40"]).all()
    assert (df["min_psnr_db"] >= 40.0).all()
    lossless = df[df["fmt"].isin(["raw", "ppm"])]
    assert (lossless["min_psnr_db"] == 999.0).all()
    assert float(df.loc[df["fmt"] == "qlossy", "min_psnr_db"].iloc[0]) < 999.0
