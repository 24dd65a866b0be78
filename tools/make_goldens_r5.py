"""Round-3 supplementary goldens, batch 3: Otsu-threshold, RLE-ratio and
Euler-number histograms — independent-decomposition oracles for the three
new image featurizers in pipelines/images.py.

Same provenance contract as tools/make_goldens{,_r3,_r4}.py: goldens come
from an algorithm family INDEPENDENT of the engine's hot path, at the
driver's correctness scale (sf0.01 ↔ 10k-image fixture), cross-checked
against the engine kernel per image before being written, and committed
under goldens/sf0.01/.

- image_otsu_hist: the engine MAXIMIZES between-class variance by integer
  cross-multiplication; the golden MINIMIZES within-class variance with
  exact Fraction arithmetic (σ_total² = σ_w² + σ_b² makes the extrema
  coincide — equivalent math, disjoint code).
- image_rle_ratio_hist: the engine counts runs as rows + vectorized
  neighbor transitions; the golden run-length-encodes every row with
  itertools.groupby.
- image_euler_hist: the engine uses the Pratt/Gray 2×2 quad-count formula;
  the golden flood-fills (numpy min-label propagation): 4-connected
  foreground components minus 8-connected interior background regions.

Regenerate with:
    PYTHONPATH=/root/repo python tools/make_goldens_r5.py
"""

from __future__ import annotations

import itertools
import sys
from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

GOLDEN_DIR = "/root/repo/goldens/sf0.01"
N_IMAGES = 10_000  # scale_for_sf_dir("sf0.01")

_BIG = np.iinfo(np.int64).max


def otsu_within_class(hist: np.ndarray) -> int:
    """argmin_t of the within-class variance numerator
    (Q0 − S0²/w0) + (Q1 − S1²/w1), exact Fractions, ties to smallest t."""
    idx = list(range(256))
    n = int(sum(hist))
    q_tot = sum(i * i * int(h) for i, h in zip(idx, hist))
    s_tot = sum(i * int(h) for i, h in zip(idx, hist))
    best_t, best_v = 0, None
    w0 = s0 = q0 = 0
    for t in range(255):
        w0 += int(hist[t])
        s0 += t * int(hist[t])
        q0 += t * t * int(hist[t])
        if w0 == 0 or w0 == n:
            continue
        v = (Fraction(q0) - Fraction(s0 * s0, w0)) \
            + (Fraction(q_tot - q0) - Fraction((s_tot - s0) ** 2, n - w0))
        if best_v is None or v < best_v:
            best_t, best_v = t, v
    return best_t


def rle_runs_groupby(b: np.ndarray) -> int:
    return sum(len(list(itertools.groupby(row))) for row in b.tolist())


def _label_components(mask: np.ndarray, diag: bool) -> int:
    """Connected-component count by iterative min-label propagation."""
    if not mask.any():
        return 0
    lab = np.where(mask,
                   np.arange(mask.size, dtype=np.int64).reshape(mask.shape),
                   _BIG)
    shifts = [(0, 1), (0, -1), (1, 0), (-1, 0)]
    if diag:
        shifts += [(1, 1), (1, -1), (-1, 1), (-1, -1)]
    while True:
        new = lab.copy()
        for dy, dx in shifts:
            sh = np.full_like(lab, _BIG)
            ys = slice(max(dy, 0), lab.shape[0] + min(dy, 0))
            yd = slice(max(-dy, 0), lab.shape[0] + min(-dy, 0))
            xs = slice(max(dx, 0), lab.shape[1] + min(dx, 0))
            xd = slice(max(-dx, 0), lab.shape[1] + min(-dx, 0))
            sh[yd, xd] = lab[ys, xs]
            new = np.minimum(new, sh)
        new[~mask] = _BIG
        if (new == lab).all():
            break
        lab = new
    return len(np.unique(lab[mask]))


def euler_flood(b: np.ndarray) -> int:
    """Components(4-conn fg) − holes(8-conn bg not touching the border)."""
    comps = _label_components(b, diag=False)
    # pad with a background ring so the outside is ONE border region
    bg = ~np.pad(b, 1, constant_values=False)
    regions = _label_components(bg, diag=True)
    return comps - (regions - 1)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 log_to_driver=False)

    from cninfo_crawler_ray.functions import codecs as CC
    from cninfo_crawler_ray.pipelines.images import (
        _luma_gray, euler4_quads, otsu_threshold)
    from cninfo_crawler_ray.sources import corpus as C

    fdir = C.ensure_fixtures(N_IMAGES)
    corpus = pq.read_table(f"{fdir}/corpus.parquet").to_pandas()
    store = corpus.set_index("image_id")
    frontier = pq.read_table(f"{GOLDEN_DIR}/crawl_frontier.parquet").to_pandas()

    otsu_counts: dict[int, int] = {}
    rle_counts: dict[int, int] = {}
    euler_counts: dict[int, int] = {}
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
        hist = np.bincount(g.ravel(), minlength=256)

        t_gold = otsu_within_class(hist)
        t_eng = otsu_threshold(hist)
        assert t_gold == t_eng, (iid, t_gold, t_eng)
        otsu_counts[t_gold] = otsu_counts.get(t_gold, 0) + 1

        b = g >= 128
        runs_gold = rle_runs_groupby(b)
        h, w = b.shape
        runs_eng = h + int((b[:, 1:] != b[:, :-1]).sum())
        assert runs_gold == runs_eng, (iid, runs_gold, runs_eng)
        bucket = (runs_gold * 1000) // (h * w) // 25
        rle_counts[bucket] = rle_counts.get(bucket, 0) + 1

        e_gold = euler_flood(b)
        e_eng = euler4_quads(b)
        assert e_gold == e_eng, (iid, e_gold, e_eng)
        euler_counts[e_gold] = euler_counts.get(e_gold, 0) + 1
        n_done += 1
        if n_done % 1000 == 0:
            print(f"  {n_done} images", flush=True)

    for name, key, counts in [
        ("image_otsu_hist", "otsu_t", otsu_counts),
        ("image_rle_ratio_hist", "bucket", rle_counts),
        ("image_euler_hist", "euler", euler_counts),
    ]:
        df = pd.DataFrame({key: sorted(counts),
                           "n": [counts[k] for k in sorted(counts)]}) \
            .astype("int64")
        df.to_parquet(f"{GOLDEN_DIR}/{name}.parquet", index=False)
        print(f"{name}: {len(df)} rows over {n_done} images")

    ray.shutdown()


if __name__ == "__main__":
    main()
