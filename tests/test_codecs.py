"""Codec + corpus fixture invariants (the per-row invariant of
BASELINE.json input_hint: decoded-pixel PSNR ≥ 40 dB for lossy formats,
exact caption equality)."""

import numpy as np
import pyarrow.compute as pc

from cninfo_crawler_ray.functions import codecs
from cninfo_crawler_ray.sources import corpus as C


def test_roundtrip_lossless():
    px = C.gen_pixels("img_x", 64, 32)
    for fmt in ("raw", "ppm"):
        blob = codecs.encode_image(px, fmt, {"caption": "c", "pages": []})
        dec, f, meta = codecs.decode_image(blob)
        assert f == fmt
        assert np.array_equal(dec, px)
        assert meta["caption"] == "c"


def test_qlossy_psnr_above_40():
    for i in range(20):
        px = C.gen_pixels(f"img_{i}", 128, 64)
        blob = codecs.encode_image(px, "qlossy", {"caption": "x", "pages": []})
        dec, f, _ = codecs.decode_image(blob)
        assert f == "qlossy"
        p = codecs.psnr(px, dec)
        assert p >= 40.0, p


def test_sniff_and_malformed():
    assert codecs.sniff_fmt(b"garbage") is None
    try:
        codecs.decode_image(b"notanimage")
        raise AssertionError("should have raised")
    except ValueError:
        pass


def test_meta_marker_collision_safe():
    # payload bytes containing 'META' must not break meta parsing
    px = np.full((8, 8, 3), ord("M"), dtype=np.uint8)
    px[0, 0:4, 0] = [ord(c) for c in "META"]
    blob = codecs.encode_image(px, "raw", {"caption": "META inside", "pages": []})
    dec, _, meta = codecs.decode_image(blob)
    assert np.array_equal(dec, px)
    assert meta["caption"] == "META inside"


def test_corpus_table_invariants():
    t = C.corpus_rows(0, 500, 500)
    assert t.schema.names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    # caption equality + PSNR invariant on every decodable row
    n_checked = 0
    for i in range(t.num_rows):
        blob = t["bytes"][i].as_py()
        if not blob:
            continue
        fmt_col = t["fmt"][i].as_py()
        dec, fmt, meta = codecs.decode_image(blob)
        assert meta["caption"] == t["caption"][i].as_py()
        if fmt == fmt_col:  # mismatch rows are the adversarial validation bait
            iid = t["image_id"][i].as_py()
            src = f"img_{i - 1:08d}" if (i % 211 == 0 and i > 0) else iid
            orig = C.gen_pixels(src, t["w"][i].as_py(), t["h"][i].as_py())
            p = codecs.psnr(orig, dec)
            assert p >= 40.0 or p == float("inf")
            n_checked += 1
    assert n_checked > 400


def test_near_dup_rows_share_phash():
    t = C.corpus_rows(210, 212, 1000)
    # row 211 clones row 210's pixels AT THE SOURCE'S dims → identical phash
    assert t["phash"][0].as_py() == t["phash"][1].as_py()
    t2 = C.corpus_rows(210, 212, 1000)
    assert t.equals(t2)


def test_fixture_cache(tmp_path, monkeypatch):
    monkeypatch.setattr(C, "FIXTURE_ROOT", str(tmp_path))
    d1 = C.ensure_fixtures(120, n_days=2, use_ray=False)
    d2 = C.ensure_fixtures(120, n_days=2, use_ray=False)
    assert d1 == d2
    import os

    assert os.path.exists(os.path.join(d1, "corpus.parquet"))
    assert os.path.exists(os.path.join(d1, "announcements.parquet"))
    assert os.path.exists(os.path.join(d1, "seeds.parquet"))
