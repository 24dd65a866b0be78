"""Round-3 flagship golden: the composed image-curation pipeline summary —
independent-decomposition oracle for pipelines/images.q_image_curation_pipeline.

Provenance contract as tools/make_goldens{,_r3..r8}.py. Independence:

- quality gates replayed with the INDEPENDENT per-image kernels from the
  earlier golden batches (histogram-moment colorfulness from
  make_goldens_r6, Σa²+Σb²−2Σab gradient factorization from the r3 family,
  hash-set tile dup from make_goldens_r8) — the engine uses direct sums /
  diff squares / void-view unique;
- near-dup pairs found by BRUTE-FORCE O(n²) blocked hamming over all
  survivor phashes — the engine uses 4×16-bit banded LSH, which pigeonhole
  guarantees to surface every hamming ≤ 3 pair; brute force would expose a
  banding bug immediately;
- the drop-the-larger-of-each-verified-pair rule replayed from the pair
  list in plain Python sets.

phash64 itself is the shared kernel on both sides (its bit health is
independently gated by phash_bit_balance against DuckDB bit arithmetic).

Regenerate with:
    PYTHONPATH=/root/repo python tools/make_goldens_r9.py
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

GOLDEN_DIR = "/root/repo/goldens/sf0.01"
N_IMAGES = 10_000


def grad_factorized(px: np.ndarray) -> int:
    g = px[:, :, 1].astype(np.int64)
    a, b = g[:, :-1], g[:, 1:]
    e = int((a * a).sum()) + int((b * b).sum()) - 2 * int((a * b).sum())
    c, d = g[:-1, :], g[1:, :]
    e += int((c * c).sum()) + int((d * d).sum()) - 2 * int((c * d).sum())
    n_terms = a.size + c.size
    return 100 * e // n_terms


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 log_to_driver=False)

    from make_goldens_r6 import colorfulness_from_histograms
    from make_goldens_r8 import tile_dup_from_set

    from cninfo_crawler_ray.functions import codecs as CC
    from cninfo_crawler_ray.pipelines.images import (
        CURATION_GATES, _luma_gray, colorfulness_var_num, tile_dup_pm)
    from cninfo_crawler_ray.sources import corpus as C

    fdir = C.ensure_fixtures(N_IMAGES)
    corpus = pq.read_table(f"{fdir}/corpus.parquet").to_pandas()
    store = corpus.set_index("image_id")
    frontier = pq.read_table(f"{GOLDEN_DIR}/crawl_frontier.parquet").to_pandas()

    g_cf = CURATION_GATES["colorfulness_min"]
    g_gr = CURATION_GATES["grad_min"]
    g_td = CURATION_GATES["tile_dup_max"]

    n_decoded = n_cf = n_gr = n_td = 0
    surv_ids: list[str] = []
    surv_ph: list[int] = []
    for url in frontier["PDF链接"]:
        iid = url.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        blob = bytes(store.loc[iid]["bytes"])
        if not blob:
            continue
        try:
            px, _, _ = CC.decode_image(blob)
        except (ValueError, NotImplementedError):
            continue
        n_decoded += 1
        num, n = colorfulness_from_histograms(px)
        cf = num // (n * n)
        num_e, n_e = colorfulness_var_num(px)
        assert cf == num_e // (n_e * n_e), iid
        grad = grad_factorized(px)
        td = tile_dup_from_set(_luma_gray(px))
        assert td == tile_dup_pm(_luma_gray(px)), iid
        if cf < g_cf:
            n_cf += 1
        elif grad < g_gr:
            n_gr += 1
        elif td > g_td:
            n_td += 1
        else:
            surv_ids.append(iid)
            surv_ph.append(CC.phash64(px))
        if n_decoded % 1000 == 0:
            print(f"  {n_decoded} images", flush=True)

    # brute-force hamming<=2 pairs over ALL survivor pairs (blocked numpy)
    ph = np.array(surv_ph, dtype=np.uint64)
    ids = np.array(surv_ids)
    order = np.argsort(ids)  # pair rule uses lexicographic id order
    ph, ids = ph[order], ids[order]
    dropped: set[str] = set()
    m = len(ph)
    popcnt = np.array([bin(i).count("1") for i in range(65536)],
                      dtype=np.int64)

    def ham(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        x = a ^ b
        return (popcnt[(x & np.uint64(0xFFFF)).astype(np.int64)]
                + popcnt[((x >> np.uint64(16)) & np.uint64(0xFFFF))
                         .astype(np.int64)]
                + popcnt[((x >> np.uint64(32)) & np.uint64(0xFFFF))
                         .astype(np.int64)]
                + popcnt[((x >> np.uint64(48)) & np.uint64(0xFFFF))
                         .astype(np.int64)])

    for i in range(m):
        d = ham(ph[i + 1:], ph[i])
        for j in np.nonzero(d <= 2)[0]:
            dropped.add(ids[i + 1 + int(j)])  # ids sorted: later id larger

    n_quality = len(surv_ids)
    out = pd.DataFrame({
        "n_decoded": [n_decoded],
        "n_drop_colorfulness": [n_cf],
        "n_drop_grad": [n_gr],
        "n_drop_tiledup": [n_td],
        "n_quality_pass": [n_quality],
        "n_dup_dropped": [len(dropped)],
        "n_survivors": [n_quality - len(dropped)],
    }).astype("int64")
    out.to_parquet(f"{GOLDEN_DIR}/image_curation_pipeline.parquet",
                   index=False)
    print(out.to_string(index=False))

    ray.shutdown()


if __name__ == "__main__":
    main()
