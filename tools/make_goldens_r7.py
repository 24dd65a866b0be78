"""Round-3 supplementary goldens, batch 5: spread (second moment), palette
size and block-variance histograms — independent-decomposition oracles for
the three new image featurizers in pipelines/images.py.

Same provenance contract as tools/make_goldens{,_r3..r6}.py: goldens come
from an algorithm family INDEPENDENT of the engine's hot path, at the
driver's correctness scale (sf0.01 ↔ 10k-image fixture), cross-checked
against the engine kernel per image before being written, and committed
under goldens/sf0.01/.

- image_spread_hist: the engine takes one full-2-D weighted sum over the
  separable d² grid; the golden reduces to row/column MARGINALS and dots
  them with the per-axis squared offsets in Python ints (the separability
  identity Σ luma·(dx²+dy²) = Σ_x colsum·dx² + Σ_y rowsum·dy²).
- image_palette_size_hist: the engine counts nonzero bins of a 4096-wide
  bincount on the packed 12-bit color; the golden counts
  len(np.unique(packed)) — sort-based vs bin-based distinct.
- image_blockiness_hist: the engine reshapes to (H/8, 8, W/8, 8) and
  reduces both moments per block; the golden computes block FIRST moments
  with np.add.reduceat along each axis and takes the second moment
  globally via the identity Σ_b 64·Σx²_b = 64·ΣX² over the cropped frame —
  a disjoint block geometry that only agrees if the tiling is right.

Regenerate with:
    PYTHONPATH=/root/repo python tools/make_goldens_r7.py
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

GOLDEN_DIR = "/root/repo/goldens/sf0.01"
N_IMAGES = 10_000  # scale_for_sf_dir("sf0.01")


def spread_from_marginals(luma: np.ndarray) -> int:
    h, w = luma.shape
    m = int(luma.sum())
    if m == 0 or (w < 2 and h < 2):
        return 0
    col = [int(v) for v in luma.sum(axis=0)]
    row = [int(v) for v in luma.sum(axis=1)]
    num = sum(c * (2 * x - (w - 1)) ** 2 for x, c in enumerate(col)) \
        + sum(r * (2 * y - (h - 1)) ** 2 for y, r in enumerate(row))
    dmax = (w - 1) ** 2 + (h - 1) ** 2
    return 1000 * num // (m * dmax)


def palette_size_unique(px: np.ndarray) -> int:
    p = px.astype(np.int64)
    packed = ((p[:, :, 0] >> 4) << 8) | ((p[:, :, 1] >> 4) << 4) \
        | (p[:, :, 2] >> 4)
    return len(np.unique(packed))


def block_variance_reduceat(gray: np.ndarray) -> int:
    h8, w8 = gray.shape[0] // 8, gray.shape[1] // 8
    if h8 == 0 or w8 == 0:
        return 0
    g = gray[:h8 * 8, :w8 * 8].astype(np.int64)
    rows = np.add.reduceat(g, np.arange(0, h8 * 8, 8), axis=0)
    s1 = np.add.reduceat(rows, np.arange(0, w8 * 8, 8), axis=1)
    total_s2 = int((g * g).sum())  # Σ_b Σx²_b — block-independent identity
    num = 64 * total_s2 - int((s1 * s1).sum())
    return 1000 * num // (4096 * h8 * w8)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 log_to_driver=False)

    from cninfo_crawler_ray.functions import codecs as CC
    from cninfo_crawler_ray.pipelines.images import (
        _luma_gray, block_variance_milli, palette_size, spread_pm)
    from cninfo_crawler_ray.sources import corpus as C

    fdir = C.ensure_fixtures(N_IMAGES)
    corpus = pq.read_table(f"{fdir}/corpus.parquet").to_pandas()
    store = corpus.set_index("image_id")
    frontier = pq.read_table(f"{GOLDEN_DIR}/crawl_frontier.parquet").to_pandas()

    spread_counts: dict[int, int] = {}
    pal_counts: dict[int, int] = {}
    blk_counts: dict[int, int] = {}
    n_done = 0
    for url in frontier["PDF链接"]:
        iid = url.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        blob = bytes(store.loc[iid]["bytes"])
        if not blob:
            continue
        try:
            px, _, _ = CC.decode_image(blob)
        except (ValueError, NotImplementedError):
            continue

        g = _luma_gray(px)
        s_gold, s_eng = spread_from_marginals(g), spread_pm(g)
        assert s_gold == s_eng, (iid, s_gold, s_eng)
        spread_counts[s_gold // 25] = spread_counts.get(s_gold // 25, 0) + 1

        p_gold, p_eng = palette_size_unique(px), palette_size(px)
        assert p_gold == p_eng, (iid, p_gold, p_eng)
        pal_counts[p_gold // 32] = pal_counts.get(p_gold // 32, 0) + 1

        b_gold, b_eng = block_variance_reduceat(g), block_variance_milli(g)
        assert b_gold == b_eng, (iid, b_gold, b_eng)
        blk_counts[b_gold // 250] = blk_counts.get(b_gold // 250, 0) + 1

        n_done += 1
        if n_done % 1000 == 0:
            print(f"  {n_done} images", flush=True)

    for name, counts in [
        ("image_spread_hist", spread_counts),
        ("image_palette_size_hist", pal_counts),
        ("image_blockiness_hist", blk_counts),
    ]:
        df = pd.DataFrame({"bucket": sorted(counts),
                           "n": [counts[k] for k in sorted(counts)]}) \
            .astype("int64")
        df.to_parquet(f"{GOLDEN_DIR}/{name}.parquet", index=False)
        print(f"{name}: {len(df)} rows over {n_done} images")

    ray.shutdown()


if __name__ == "__main__":
    main()
