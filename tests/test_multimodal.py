"""Multimodal stage plumbing: resize kernel, video frame-sampling, audio
features — real code paths over the deterministic synthetic containers, with
the real-codec hooks gated behind NotImplementedError."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from cninfo_crawler_ray.functions import codecs
from cninfo_crawler_ray.stages import multimodal as M


def _img(seed: int, h: int = 24, w: int = 32) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# --- resize_area ---------------------------------------------------------------

def test_resize_integer_downscale_is_block_mean():
    px = _img(1, 16, 16)
    got = codecs.resize_area(px, 4, 4)
    want = np.round(
        px.reshape(4, 4, 4, 4, 3).transpose(0, 2, 1, 3, 4)
        .reshape(4, 4, 16, 3).astype(np.float64).mean(axis=2)).astype(np.uint8)
    assert np.array_equal(got, want)


def test_resize_non_integer_and_upscale_dims():
    px = _img(2, 10, 7)
    assert codecs.resize_area(px, 3, 5).shape == (3, 5, 3)
    up = codecs.resize_area(px, 20, 14)  # upscale → nearest-neighbor boxes
    assert up.shape == (20, 14, 3)
    assert np.array_equal(up[::2, ::2], px)


def test_resize_to_1x1_is_global_mean():
    px = _img(3)
    got = codecs.resize_area(px, 1, 1)[0, 0]
    want = np.round(px.reshape(-1, 3).astype(np.float64).mean(axis=0))
    assert np.array_equal(got, want.astype(np.uint8))


# --- video container + FrameSampler --------------------------------------------

def test_video_roundtrip_and_selective_decode():
    frames = [_img(i) for i in range(7)]
    blob = M.encode_video(frames, fps=12.5, frame_fmt="raw")
    got, fps, n = M.decode_video(blob)
    assert fps == 12.5 and n == 7
    assert all(np.array_equal(a, b) for a, b in zip(got, frames))
    some, _, _ = M.decode_video(blob, frame_indices=[2, 5])
    assert np.array_equal(some[0], frames[2])
    assert np.array_equal(some[1], frames[5])


def test_video_unknown_magic_raises():
    with pytest.raises(NotImplementedError):
        M.decode_video(b"MOOVsomething")


def test_frame_sampler_stage(ray_session):
    vids = {f"v{i}": [_img(100 * i + j) for j in range(6 + i)] for i in range(3)}
    t = pa.table({
        "video_id": pa.array(list(vids), pa.string()),
        "bytes": pa.array([M.encode_video(f, fps=10.0, frame_fmt="raw")
                           for f in vids.values()], pa.large_binary()),
    })
    out = (rd.from_arrow(t)
           .map_batches(M.FrameSampler, fn_constructor_args=(5,),
                        batch_format="pyarrow", concurrency=1)
           .to_pandas().sort_values(["video_id", "frame_index"]))
    # stride 5 plus the last frame: v0 (6 frames) → {0, 5}; v1 (7) → {0, 5, 6};
    # v2 (8) → {0, 5, 7}
    got = {v: g["frame_index"].tolist() for v, g in out.groupby("video_id")}
    assert got == {"v0": [0, 5], "v1": [0, 5, 6], "v2": [0, 5, 7]}
    # per-frame phash matches a direct computation on the source frame
    row = out[(out["video_id"] == "v1") & (out["frame_index"] == 5)].iloc[0]
    assert row["frame_phash"] == codecs.phash64(vids["v1"][5])
    assert (out["fps"] == 10.0).all()


# --- audio container + AudioFeaturizer ------------------------------------------

def test_audio_roundtrip_and_features(ray_session):
    rate = 8000
    tsec = np.arange(rate, dtype=np.float64) / rate  # 1 s
    sine = (0.5 * np.sin(2 * np.pi * 100 * tsec) * 32767).astype(np.int16)
    silent = np.zeros(rate // 2, dtype=np.int16)
    t = pa.table({
        "audio_id": pa.array(["sine", "silence"], pa.string()),
        "bytes": pa.array([M.encode_audio(sine, rate), M.encode_audio(silent, rate)],
                          pa.large_binary()),
    })
    out = (rd.from_arrow(t)
           .map_batches(M.AudioFeaturizer, batch_format="pyarrow", concurrency=1)
           .to_pandas().set_index("audio_id"))
    assert out.loc["sine", "duration_sec"] == pytest.approx(1.0)
    assert out.loc["sine", "rms"] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    # 100 Hz sine crosses zero 200 times per second → zcr ≈ 200/8000
    assert out.loc["sine", "zcr"] == pytest.approx(200 / rate, rel=0.02)
    assert out.loc["silence", "duration_sec"] == pytest.approx(0.5)
    assert out.loc["silence", "rms"] == 0.0


def test_audio_unknown_magic_raises():
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"RIFFxxxx")


# --- property tests ---------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(st.integers(0, 2**32), st.integers(1, 40), st.integers(1, 40),
       st.integers(1, 12), st.integers(1, 12))
@settings(max_examples=60, deadline=None)
def test_resize_matches_naive_box_mean(seed, h, w, oh, ow):
    """resize_area (summed-area table) ≡ the naive per-box slicing mean for
    ANY input/output geometry, including upscale and degenerate boxes."""
    rng = np.random.Generator(np.random.PCG64(seed))
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    got = codecs.resize_area(px, oh, ow)
    want = np.empty((oh, ow, 3), dtype=np.uint8)
    for i in range(oh):
        r0, r1 = (i * h) // oh, max(((i + 1) * h) // oh, (i * h) // oh + 1)
        for j in range(ow):
            c0, c1 = (j * w) // ow, max(((j + 1) * w) // ow, (j * w) // ow + 1)
            want[i, j] = np.round(
                px[r0:r1, c0:c1].astype(np.float64).mean(axis=(0, 1)))
    assert np.array_equal(got, want)


@given(st.lists(st.text(alphabet="abcdefgh0123 ", min_size=0, max_size=60),
                min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_simhash_matches_per_row_bit_votes(texts):
    """Vectorized simhash64 ≡ per-row Python integer bit votes — the class
    of bug this guards is silent unsigned wraparound in the numpy path."""
    import pandas as pd

    from cninfo_crawler_ray.functions import dedup as D

    got = D.simhash64(pd.Series(texts)).tolist()
    for t, g in zip(texts, got):
        toks = D._WORD_RE.findall(t.lower())
        if not toks:
            assert g == 0
            continue
        votes = [0] * 64
        for wd in toks:
            hv = D._hash64(wd)
            for j in range(64):
                votes[j] += 1 if (hv >> j) & 1 else -1
        val = sum(1 << j for j in range(64) if votes[j] > 0)
        if val >= 1 << 63:
            val -= 1 << 64
        assert g == val


# ---------------------------------------------------------------------------
# Round-3 batch-3 kernels: Otsu, RLE, Euler
# ---------------------------------------------------------------------------

def test_otsu_bimodal_and_ties():
    import numpy as np
    from cninfo_crawler_ray.pipelines.images import otsu_threshold

    # clean bimodal mass at 10 and 200 -> threshold lands between the modes
    h = np.zeros(256, dtype=np.int64)
    h[10], h[200] = 50, 50
    t = otsu_threshold(h)
    assert 10 <= t < 200
    # all-one-level image: every split has w0==0 or w0==n except none valid
    h2 = np.zeros(256, dtype=np.int64)
    h2[128] = 77
    assert otsu_threshold(h2) == 0  # degenerate: keeps initial t=0
    # symmetric histogram: the argmax tie must resolve to the SMALLEST t
    h3 = np.zeros(256, dtype=np.int64)
    h3[0], h3[255] = 10, 10
    t3 = otsu_threshold(h3)
    # every t in 0..254 separates the two spikes identically; smallest wins
    assert t3 == 0


def test_euler_quads_known_topologies():
    import numpy as np
    from cninfo_crawler_ray.pipelines.images import euler4_quads

    # solid square: 1 component, 0 holes
    b = np.zeros((8, 8), dtype=bool)
    b[2:6, 2:6] = True
    assert euler4_quads(b) == 1
    # ring (donut): 1 component, 1 hole -> 0
    b2 = b.copy()
    b2[3:5, 3:5] = False
    assert euler4_quads(b2) == 0
    # two separate dots: 2
    b3 = np.zeros((8, 8), dtype=bool)
    b3[1, 1] = b3[5, 5] = True
    assert euler4_quads(b3) == 2
    # diagonal pair: 4-connectivity sees TWO components
    b4 = np.zeros((4, 4), dtype=bool)
    b4[1, 1] = b4[2, 2] = True
    assert euler4_quads(b4) == 2
    # empty / full
    assert euler4_quads(np.zeros((5, 5), dtype=bool)) == 0
    assert euler4_quads(np.ones((5, 5), dtype=bool)) == 1


def test_rle_transition_count_matches_groupby():
    import itertools
    import numpy as np

    rng = np.random.default_rng(3)
    for _ in range(20):
        b = rng.random((rng.integers(2, 30), rng.integers(2, 30))) < 0.5
        runs_vec = b.shape[0] + int((b[:, 1:] != b[:, :-1]).sum())
        runs_py = sum(len(list(itertools.groupby(r))) for r in b.tolist())
        assert runs_vec == runs_py


# ---------------------------------------------------------------------------
# Round-3 batch-4 kernels: colorfulness, centroid offset, GLCM contrast
# ---------------------------------------------------------------------------

def test_colorfulness_var_num_known_values():
    import numpy as np
    from cninfo_crawler_ray.pipelines.images import colorfulness_var_num

    # uniform gray: rg == yb == 0 everywhere -> zero variance
    px = np.full((4, 4, 3), 77, dtype=np.uint8)
    assert colorfulness_var_num(px) == (0, 16)
    # half pure red, half pure green: rg = ±255, yb = +255 constant
    px2 = np.zeros((2, 2, 3), dtype=np.uint8)
    px2[:, 0, 0] = 255  # red column: rg=255, yb=255
    px2[:, 1, 1] = 255  # green column: rg=-255, yb=255
    # rg: n*Σx²−(Σx)² = 4*(4*255²)−0 = 16*255²; yb constant -> 0
    num, n = colorfulness_var_num(px2)
    assert n == 4 and num == 16 * 255 * 255
    # brute-force parity on a random image: n²·var via float check
    rng = np.random.default_rng(7)
    px3 = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    num3, n3 = colorfulness_var_num(px3)
    p = px3.astype(np.int64)
    rg = (p[:, :, 0] - p[:, :, 1]).ravel()
    yb = (p[:, :, 0] + p[:, :, 1] - 2 * p[:, :, 2]).ravel()
    expect = int(round((rg.var() + yb.var()) * n3 * n3))
    assert num3 == expect


def test_centroid_offset_known_values():
    import numpy as np
    from cninfo_crawler_ray.pipelines.images import centroid_offset_pm

    # symmetric mass -> perfectly centered -> 0 per-mille on both axes
    luma = np.zeros((5, 5), dtype=np.int64)
    luma[2, 2] = 100
    assert centroid_offset_pm(luma) == 0
    # all mass in one corner -> 1000 + 1000
    luma2 = np.zeros((4, 6), dtype=np.int64)
    luma2[0, 0] = 9
    assert centroid_offset_pm(luma2) == 2000
    # all mass in the x-center column, top row -> y axis only
    luma3 = np.zeros((3, 3), dtype=np.int64)
    luma3[0, 1] = 5
    assert centroid_offset_pm(luma3) == 1000
    # zero mass guard
    assert centroid_offset_pm(np.zeros((4, 4), dtype=np.int64)) == 0


def test_glcm_contrast_known_values():
    import numpy as np
    from cninfo_crawler_ray.pipelines.images import glcm_contrast_scaled

    # flat image: all pairs in the same level -> contrast 0
    assert glcm_contrast_scaled(np.full((4, 4), 200, dtype=np.int64)) == 0
    # alternating 0/255 columns: every pair jumps 7 levels -> 49 per pair
    g = np.zeros((2, 4), dtype=np.int64)
    g[:, 1::2] = 255
    assert glcm_contrast_scaled(g) == 49_000
    # half/half split: one transition row-pair among (w-1) pairs
    g2 = np.zeros((1, 4), dtype=np.int64)
    g2[0, 2:] = 255  # pairs: (0,0) (0,7) (7,7) -> 49 of 3 pairs
    assert glcm_contrast_scaled(g2) == 1000 * 49 // 3


def test_spread_pm_known_geometries():
    import numpy as np
    from cninfo_crawler_ray.pipelines.images import spread_pm

    # all mass at the exact center of an odd grid -> 0
    luma = np.zeros((5, 5), dtype=np.int64)
    luma[2, 2] = 7
    assert spread_pm(luma) == 0
    # all mass at one corner -> exactly the normalizer -> 1000
    luma2 = np.zeros((4, 6), dtype=np.int64)
    luma2[0, 0] = 3
    assert spread_pm(luma2) == 1000
    # uniform mass: spread is strictly between 0 and 1000
    s = spread_pm(np.ones((8, 8), dtype=np.int64))
    assert 0 < s < 1000
    assert spread_pm(np.zeros((4, 4), dtype=np.int64)) == 0


def test_palette_size_counts_quantized_colors():
    import numpy as np
    from cninfo_crawler_ray.pipelines.images import palette_size

    # one flat color -> 1
    px = np.full((4, 4, 3), 200, dtype=np.uint8)
    assert palette_size(px) == 1
    # two colors differing only below the 4-bit quantizer -> still 1
    px2 = px.copy(); px2[0, 0] = (200, 200, 207)
    assert palette_size(px2) == 1
    # a color differing in the high nibble -> 2
    px3 = px.copy(); px3[0, 0] = (216, 200, 200)
    assert palette_size(px3) == 2


def test_block_variance_known_values():
    import numpy as np
    from cninfo_crawler_ray.pipelines.images import block_variance_milli

    # flat frame: zero variance in every block
    assert block_variance_milli(np.full((16, 16), 9, dtype=np.int64)) == 0
    # checkerboard 0/2 inside each 8x8 block: per-pixel var = 1 -> milli 1000
    g = np.indices((16, 16)).sum(axis=0) % 2 * 2
    assert block_variance_milli(g.astype(np.int64)) == 1000
    # remainder rows/cols are cropped, not averaged in
    g2 = np.zeros((17, 19), dtype=np.int64)
    g2[16, :] = 255  # lives entirely in the cropped remainder
    assert block_variance_milli(g2) == 0


def test_tile_dup_pm_known_patterns():
    import numpy as np
    from cninfo_crawler_ray.pipelines.images import tile_dup_pm

    # perfectly tiled frame: every 8x8 tile identical -> (n-1)/n duplicated
    base = np.arange(64, dtype=np.int64).reshape(8, 8) * 4
    g = np.tile(base, (4, 4))  # 16 tiles, 1 distinct
    assert tile_dup_pm(g) == 1000 * 15 // 16
    # all-distinct tiles AFTER >>5 quantization -> 0
    g2 = np.zeros((16, 16), dtype=np.int64)
    g2[:8, :8] = 0; g2[:8, 8:] = 64; g2[8:, :8] = 128; g2[8:, 8:] = 192
    assert tile_dup_pm(g2) == 0
    # values differing only below the quantizer collide into dup tiles
    g3 = np.zeros((8, 16), dtype=np.int64)
    g3[:, 8:] = 31  # same level as 0 after >>5
    assert tile_dup_pm(g3) == 500


def test_rg_cov_sign_and_exactness():
    import numpy as np
    from cninfo_crawler_ray.pipelines.images import rg_cov_scaled

    # g == r -> covariance == variance (known for a two-point mass)
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[0, :, 0] = px[0, :, 1] = 200  # two pixels at (200,200), two at (0,0)
    # var of {200,200,0,0} = 10000 -> cov = 10000
    assert rg_cov_scaled(px) == 10000
    # anti-correlated channels -> negative
    px2 = np.zeros((2, 2, 3), dtype=np.uint8)
    px2[0, :, 0] = 200; px2[1, :, 1] = 200
    assert rg_cov_scaled(px2) < 0
    # constant channel -> zero covariance
    px3 = np.full((4, 4, 3), 99, dtype=np.uint8)
    assert rg_cov_scaled(px3) == 0


def test_curation_pipeline_counts_consistent(ray_session):
    """End-to-end at the 531-URL fixture: stage counts must telescope
    (decoded = drops + quality_pass; survivors = quality − dup_dropped)
    and every count is non-negative."""
    from cninfo_crawler_ray.pipelines.images import q_image_curation_pipeline

    out = q_image_curation_pipeline("/root/testdata/sf0.001")
    r = out.iloc[0]
    assert r["n_decoded"] == (r["n_drop_colorfulness"] + r["n_drop_grad"]
                              + r["n_drop_tiledup"] + r["n_quality_pass"])
    assert r["n_survivors"] == r["n_quality_pass"] - r["n_dup_dropped"]
    assert (out.iloc[0] >= 0).all()
    assert r["n_decoded"] > 400  # the sf0.001 fixture decodes ~500 images


def test_orientation_classes_known_gradients():
    import numpy as np
    from cninfo_crawler_ray.pipelines.images import orientation_class_counts

    # pure horizontal ramp: dx > 0, dy == 0 everywhere -> class 0 only
    g = np.tile(np.arange(8, dtype=np.int64) * 10, (8, 1))
    c = orientation_class_counts(g)
    assert c[0] == 36 and c[1:].sum() == 0
    # pure vertical ramp -> class 1 only
    c2 = orientation_class_counts(g.T.copy())
    assert c2[1] == 36 and c2[0] == 0
    # perfect diagonal ramp: |dx| == |dy|, same sign -> class 2
    d = (np.arange(8)[:, None] + np.arange(8)[None, :]).astype(np.int64)
    c3 = orientation_class_counts(d * 5)
    assert c3[2] == 36 and c3[0] == c3[1] == 0
    # flat: dx == dy == 0 -> equal magnitudes, product 0 -> class 3
    c4 = orientation_class_counts(np.full((8, 8), 7, dtype=np.int64))
    assert c4[3] == 36
