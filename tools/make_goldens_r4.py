"""Round-3 supplementary goldens, batch 2: border-contrast, quadrant-range
and mirror-asymmetry histograms — independent-decomposition oracles for the
three new image featurizers.

Same provenance contract as tools/make_goldens{,_r3}.py: goldens come from
an algorithm family INDEPENDENT of the engine's hot path, at the driver's
correctness scale (sf0.01 ↔ 10k-image fixture), cross-checked against the
engine before being written, and committed under goldens/sf0.01/.

- image_border_contrast: the engine sums the 4-pixel border ring as four
  explicit slabs; the golden derives ring = whole − interior. The two
  decompositions agree exactly iff the slab indexing is right.
- image_quadrant_range: the engine slices the four quadrants directly; the
  golden reads the same sums off a 2-D summed-area table (corner
  arithmetic).
- image_mirror_asymmetry: the engine evaluates Σ(g − flip g)² directly; the
  golden evaluates 2Σg² − 2Σ(g·flip g).

Regenerate with:
    PYTHONPATH=/root/repo python tools/make_goldens_r4.py
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

GOLDEN_DIR = "/root/repo/goldens/sf0.01"
N_IMAGES = 10_000  # scale_for_sf_dir("sf0.01")


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 log_to_driver=False)

    from cninfo_crawler_ray.functions import codecs as CC
    from cninfo_crawler_ray.sources import corpus as C

    fdir = C.ensure_fixtures(N_IMAGES)
    corpus = pq.read_table(f"{fdir}/corpus.parquet").to_pandas()
    store = corpus.set_index("image_id")
    frontier = pq.read_table(f"{GOLDEN_DIR}/crawl_frontier.parquet").to_pandas()

    border_counts: dict[int, int] = {}
    quad_counts: dict[int, int] = {}
    asym_counts: dict[int, int] = {}
    for url in frontier["PDF链接"]:
        iid = url.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        blob = bytes(store.loc[iid]["bytes"])
        if not blob:
            continue
        try:
            px, _, _ = CC.decode_image(blob)
        except Exception:
            continue
        p = px.astype(np.int64)
        h, w = p.shape[:2]
        lum = 2126 * p[:, :, 0] + 7152 * p[:, :, 1] + 722 * p[:, :, 2]

        # border contrast: ring = whole − interior (engine: four slabs)
        if h > 8 and w > 8:
            whole = int(lum.sum())
            int_sum = int(lum[4:-4, 4:-4].sum())
            int_n = (h - 8) * (w - 8)
            ring_sum = whole - int_sum
            ring_n = h * w - int_n
            diff = ring_sum // ring_n - int_sum // int_n
            b = diff // 100_000
            border_counts[b] = border_counts.get(b, 0) + 1

        # quadrant range via a summed-area table (engine: direct slices)
        hh, ww = h // 2, w // 2
        if hh and ww:
            sat = lum.cumsum(axis=0).cumsum(axis=1)

            def rect(r0: int, r1: int, c0: int, c1: int) -> int:
                # sum over rows [r0, r1), cols [c0, c1) from SAT corners
                s = int(sat[r1 - 1, c1 - 1])
                if r0:
                    s -= int(sat[r0 - 1, c1 - 1])
                if c0:
                    s -= int(sat[r1 - 1, c0 - 1])
                if r0 and c0:
                    s += int(sat[r0 - 1, c0 - 1])
                return s

            q = [rect(0, hh, 0, ww), rect(0, hh, ww, w),
                 rect(hh, h, 0, ww), rect(hh, h, ww, w)]
            tot = sum(q)
            if tot > 0:
                b = (max(q) - min(q)) * 1000 // tot
                quad_counts[b] = quad_counts.get(b, 0) + 1

        # mirror asymmetry via 2Σg² − 2Σ(g·flip) (engine: direct Σ(a−b)²)
        g = p[:, :, 1]
        gf = g[:, ::-1]
        a = 2 * int((g * g).sum()) - 2 * int((g * gf).sum())
        per_px = a // g.size
        b = per_px.bit_length()
        asym_counts[b] = asym_counts.get(b, 0) + 1

    def hist_df(d: dict[int, int]) -> pd.DataFrame:
        return (pd.DataFrame(sorted(d.items()), columns=["bucket", "n"])
                .astype({"bucket": "int64", "n": "int64"}))

    goldens = {"image_border_contrast": hist_df(border_counts),
               "image_quadrant_range": hist_df(quad_counts),
               "image_mirror_asymmetry": hist_df(asym_counts)}

    # cross-check against the ENGINE before committing
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    q = m.queries()
    sf = "/root/testdata/sf0.01"

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].reset_index(drop=True)
        return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)

    for name, want in goldens.items():
        got = q[name](sf).to_pandas()
        gc, wc = canon(got), canon(want)
        assert gc.equals(wc), (name, gc.head(), wc.head())
        want.to_parquet(f"{GOLDEN_DIR}/{name}.parquet", index=False)
        print(f"golden {name}: {len(want)} rows written (engine cross-check OK)")

    ray.shutdown()


if __name__ == "__main__":
    main()
