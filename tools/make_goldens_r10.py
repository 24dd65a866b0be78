"""Round-3 supplementary golden, batch 7: gradient-orientation histogram —
independent-decomposition oracle for pipelines/images.q_image_orientation_hist.

Provenance contract as tools/make_goldens{,_r3..r9}.py. Independence: the
engine classifies each interior pixel with four vectorized boolean masks;
the golden ENCODES every pixel as a 27-bin (sign dx, sign dy, cmp(|dx|,|dy|))
index, bincounts once, and maps bins to classes with a pure-Python lookup —
a disjoint decision structure that only agrees if both class definitions
are exactly the stated one.

Regenerate with:
    PYTHONPATH=/root/repo python tools/make_goldens_r10.py
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

GOLDEN_DIR = "/root/repo/goldens/sf0.01"
N_IMAGES = 10_000


def class_counts_from_bins(gray: np.ndarray) -> np.ndarray:
    g = gray.astype(np.int64)
    dx = g[1:-1, 2:] - g[1:-1, :-2]
    dy = g[2:, 1:-1] - g[:-2, 1:-1]
    sx = np.sign(dx) + 1
    sy = np.sign(dy) + 1
    cmp = np.sign(np.abs(dx) - np.abs(dy)) + 1
    e = (sx * 9 + sy * 3 + cmp).ravel()
    bins = np.bincount(e, minlength=27)
    out = np.zeros(4, dtype=np.int64)
    for sxv in (0, 1, 2):
        for syv in (0, 1, 2):
            for cv in (0, 1, 2):
                b = sxv * 9 + syv * 3 + cv
                if cv == 2:
                    cls = 0            # |dx| > |dy|
                elif cv == 0:
                    cls = 1            # |dy| > |dx|
                else:                  # equal magnitudes
                    dxs, dys = sxv - 1, syv - 1
                    cls = 2 if dxs * dys > 0 else 3
                out[cls] += int(bins[b])
    return out


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 log_to_driver=False)

    from cninfo_crawler_ray.functions import codecs as CC
    from cninfo_crawler_ray.pipelines.images import (
        _luma_gray, orientation_class_counts)
    from cninfo_crawler_ray.sources import corpus as C

    fdir = C.ensure_fixtures(N_IMAGES)
    corpus = pq.read_table(f"{fdir}/corpus.parquet").to_pandas()
    store = corpus.set_index("image_id")
    frontier = pq.read_table(f"{GOLDEN_DIR}/crawl_frontier.parquet").to_pandas()

    counts: dict[tuple[int, int], int] = {}
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
        gold = class_counts_from_bins(g)
        eng = orientation_class_counts(g)
        assert gold.tolist() == eng.tolist(), (iid, gold, eng)
        total = int(gold.sum())
        if total == 0:
            key = (-1, 0)
        else:
            dom = int(gold.argmax())
            key = (dom, 1000 * int(gold[dom]) // total // 25)
        counts[key] = counts.get(key, 0) + 1
        n_done += 1
        if n_done % 1000 == 0:
            print(f"  {n_done} images", flush=True)

    ks = sorted(counts)
    df = pd.DataFrame({
        "dom_class": [k[0] for k in ks],
        "share_bucket": [k[1] for k in ks],
        "n": [counts[k] for k in ks]}).astype("int64")
    df.to_parquet(f"{GOLDEN_DIR}/image_orientation_hist.parquet",
                  index=False)
    print(f"image_orientation_hist: {len(df)} rows over {n_done} images")

    ray.shutdown()


if __name__ == "__main__":
    main()
