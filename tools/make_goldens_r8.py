"""Round-3 supplementary goldens, batch 6: tile-duplication and R/G
covariance histograms — independent-decomposition oracles for the two new
image featurizers in pipelines/images.py.

Same provenance contract as tools/make_goldens{,_r3..r7}.py: goldens come
from an algorithm family INDEPENDENT of the engine's hot path, cross-checked
against the engine kernel per image before being written, and committed
under goldens/sf0.01/.

- image_tile_dup_hist: the engine reshape/swapaxes-packs 8×8 tiles into
  64-byte voids and counts sort-based uniques; the golden slices each tile
  with explicit [y:y+8, x:x+8] indexing and counts a Python hash-set of
  .tobytes() — disjoint tiling assembly AND disjoint distinct algorithm.
- image_rg_cov_hist: the engine takes four direct pixel sums; the golden
  derives all four moments from ONE joint 65536-bin (r<<8|g) histogram in
  Python ints.

Regenerate with:
    PYTHONPATH=/root/repo python tools/make_goldens_r8.py
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

GOLDEN_DIR = "/root/repo/goldens/sf0.01"
N_IMAGES = 10_000  # scale_for_sf_dir("sf0.01")


def tile_dup_from_set(gray: np.ndarray) -> int:
    h8, w8 = gray.shape[0] // 8, gray.shape[1] // 8
    if h8 == 0 or w8 == 0:
        return 0
    g = (gray >> 5).astype(np.uint8)
    seen = set()
    for ty in range(h8):
        for tx in range(w8):
            seen.add(g[ty * 8:ty * 8 + 8, tx * 8:tx * 8 + 8].tobytes())
    n_tiles = h8 * w8
    return 1000 * (n_tiles - len(seen)) // n_tiles


def rg_cov_from_joint_hist(px: np.ndarray) -> int:
    p = px.astype(np.int64)
    joint = ((p[:, :, 0] << 8) | p[:, :, 1]).ravel()
    counts = np.bincount(joint, minlength=65536)
    nz = np.nonzero(counts)[0]
    n = joint.size
    s_r = sum(int(c) * (v >> 8) for v, c in zip(nz, counts[nz]))
    s_g = sum(int(c) * (v & 255) for v, c in zip(nz, counts[nz]))
    s_rg = sum(int(c) * (v >> 8) * (v & 255) for v, c in zip(nz, counts[nz]))
    return (n * s_rg - s_r * s_g) // (n * n)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 log_to_driver=False)

    from cninfo_crawler_ray.functions import codecs as CC
    from cninfo_crawler_ray.pipelines.images import (
        _luma_gray, rg_cov_scaled, tile_dup_pm)
    from cninfo_crawler_ray.sources import corpus as C

    fdir = C.ensure_fixtures(N_IMAGES)
    corpus = pq.read_table(f"{fdir}/corpus.parquet").to_pandas()
    store = corpus.set_index("image_id")
    frontier = pq.read_table(f"{GOLDEN_DIR}/crawl_frontier.parquet").to_pandas()

    tile_counts: dict[int, int] = {}
    cov_counts: dict[int, int] = {}
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
        t_gold, t_eng = tile_dup_from_set(g), tile_dup_pm(g)
        assert t_gold == t_eng, (iid, t_gold, t_eng)
        tile_counts[t_gold // 25] = tile_counts.get(t_gold // 25, 0) + 1

        c_gold, c_eng = rg_cov_from_joint_hist(px), rg_cov_scaled(px)
        assert c_gold == c_eng, (iid, c_gold, c_eng)
        cov_counts[c_gold // 250] = cov_counts.get(c_gold // 250, 0) + 1

        n_done += 1
        if n_done % 1000 == 0:
            print(f"  {n_done} images", flush=True)

    for name, counts in [
        ("image_tile_dup_hist", tile_counts),
        ("image_rg_cov_hist", cov_counts),
    ]:
        df = pd.DataFrame({"bucket": sorted(counts),
                           "n": [counts[k] for k in sorted(counts)]}) \
            .astype("int64")
        df.to_parquet(f"{GOLDEN_DIR}/{name}.parquet", index=False)
        print(f"{name}: {len(df)} rows over {n_done} images")

    ray.shutdown()


if __name__ == "__main__":
    main()
