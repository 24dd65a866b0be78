"""Round-3 supplementary goldens, batch 4: colorfulness, centroid-offset and
GLCM-contrast histograms — independent-decomposition oracles for the three
new image featurizers in pipelines/images.py.

Same provenance contract as tools/make_goldens{,_r3,_r4,_r5}.py: goldens come
from an algorithm family INDEPENDENT of the engine's hot path, at the
driver's correctness scale (sf0.01 ↔ 10k-image fixture), cross-checked
against the engine kernel per image before being written, and committed
under goldens/sf0.01/.

- image_colorfulness_hist: the engine sums opponent-channel pixels directly
  (vectorized Σx, Σx²); the golden derives the SAME variance numerator from
  per-VALUE histograms (bincount moments combined in Python ints) — a
  disjoint accumulation order that only agrees if both moment pipelines are
  exact.
- image_centroid_offset_hist: the engine takes one full-2-D weighted sum
  per axis; the golden reduces to per-column / per-row MARGINALS first and
  dots them with the coordinate vector in Python ints.
- image_glcm_contrast_hist: the engine builds the actual 8×8 co-occurrence
  matrix (bincount on the fused index) and dots it with the (i−j)² weight
  table; the golden never builds a matrix — it uses the algebraic
  factorization Σ(a−b)² = Σa² + Σb² − 2Σab over the left/right slices.

Regenerate with:
    PYTHONPATH=/root/repo python tools/make_goldens_r6.py
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

GOLDEN_DIR = "/root/repo/goldens/sf0.01"
N_IMAGES = 10_000  # scale_for_sf_dir("sf0.01")


def colorfulness_from_histograms(px: np.ndarray) -> tuple[int, int]:
    """(n·Σrg² − (Σrg)²) + (n·Σyb² − (Σyb)²) from per-value bincounts."""
    p = px.astype(np.int64)
    rg = (p[:, :, 0] - p[:, :, 1]).ravel()
    yb = (p[:, :, 0] + p[:, :, 1] - 2 * p[:, :, 2]).ravel()
    n = rg.size
    total = 0
    for vals, lo in ((rg, 255), (yb, 510)):
        counts = np.bincount(vals + lo, minlength=2 * lo + 1)
        s1 = sum(int(c) * (v - lo) for v, c in enumerate(counts) if c)
        s2 = sum(int(c) * (v - lo) ** 2 for v, c in enumerate(counts) if c)
        total += n * s2 - s1 * s1
    return total, n


def centroid_from_marginals(luma: np.ndarray) -> int:
    h, w = luma.shape
    m = int(luma.sum())
    if m == 0 or w < 2 or h < 2:
        return 0
    col = [int(v) for v in luma.sum(axis=0)]
    row = [int(v) for v in luma.sum(axis=1)]
    sx = sum(x * c for x, c in enumerate(col))
    sy = sum(y * c for y, c in enumerate(row))
    x_pm = 1000 * abs(2 * sx - m * (w - 1)) // (m * (w - 1))
    y_pm = 1000 * abs(2 * sy - m * (h - 1)) // (m * (h - 1))
    return x_pm + y_pm


def glcm_contrast_factorized(gray: np.ndarray) -> int:
    q = (gray >> 5).astype(np.int64)
    a, b = q[:, :-1], q[:, 1:]
    total = int((a * a).sum()) + int((b * b).sum()) - 2 * int((a * b).sum())
    return 1000 * total // a.size


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 log_to_driver=False)

    from cninfo_crawler_ray.functions import codecs as CC
    from cninfo_crawler_ray.pipelines.images import (
        _luma_gray, centroid_offset_pm, colorfulness_var_num,
        glcm_contrast_scaled)
    from cninfo_crawler_ray.sources import corpus as C

    fdir = C.ensure_fixtures(N_IMAGES)
    corpus = pq.read_table(f"{fdir}/corpus.parquet").to_pandas()
    store = corpus.set_index("image_id")
    frontier = pq.read_table(f"{GOLDEN_DIR}/crawl_frontier.parquet").to_pandas()

    color_counts: dict[int, int] = {}
    cent_counts: dict[int, int] = {}
    glcm_counts: dict[int, int] = {}
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

        num_g, n_g = colorfulness_from_histograms(px)
        num_e, n_e = colorfulness_var_num(px)
        assert (num_g, n_g) == (num_e, n_e), (iid, num_g, num_e)
        b = num_g // (n_g * n_g) // 500
        color_counts[b] = color_counts.get(b, 0) + 1

        g = _luma_gray(px)
        c_gold = centroid_from_marginals(g)
        c_eng = centroid_offset_pm(g)
        assert c_gold == c_eng, (iid, c_gold, c_eng)
        cent_counts[c_gold // 25] = cent_counts.get(c_gold // 25, 0) + 1

        t_gold = glcm_contrast_factorized(g)
        t_eng = glcm_contrast_scaled(g)
        assert t_gold == t_eng, (iid, t_gold, t_eng)
        glcm_counts[t_gold // 250] = glcm_counts.get(t_gold // 250, 0) + 1

        n_done += 1
        if n_done % 1000 == 0:
            print(f"  {n_done} images", flush=True)

    for name, counts in [
        ("image_colorfulness_hist", color_counts),
        ("image_centroid_offset_hist", cent_counts),
        ("image_glcm_contrast_hist", glcm_counts),
    ]:
        df = pd.DataFrame({"bucket": sorted(counts),
                           "n": [counts[k] for k in sorted(counts)]}) \
            .astype("int64")
        df.to_parquet(f"{GOLDEN_DIR}/{name}.parquet", index=False)
        print(f"{name}: {len(df)} rows over {n_done} images")

    ray.shutdown()


if __name__ == "__main__":
    main()
