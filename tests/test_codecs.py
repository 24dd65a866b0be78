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


# --- real-codec swap seam (VERDICT r03 item 3) -------------------------------

def test_real_magic_sniff_without_pillow():
    """Magic sniffing of real formats needs no codec library — a crawler
    classifies content-type before it ever decodes (the reference's %PDF
    check, cninfo_report_crawler.py:149-150, is exactly this)."""
    assert codecs.sniff_fmt(b"\xff\xd8\xff\xe0" + b"\x00" * 16) == "jpeg"
    assert codecs.sniff_fmt(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16) == "png"
    # memoryview input (the zero-copy fetch path) sniffs identically
    assert codecs.sniff_fmt(memoryview(b"\xff\xd8\xff\xdbXX")) == "jpeg"


def test_real_decode_gate_raises_without_pillow():
    """When Pillow is absent the jpeg/png branch must fail CLOSED with
    NotImplementedError (the documented import gate), never a confusing
    AttributeError or a silent wrong decode."""
    import pytest

    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow installed — gate is open; covered by the "
                    "conformance test below")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        codecs.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="Pillow"):
        codecs.encode_image(C.gen_pixels("img_g", 16, 16), "jpeg")


def test_real_jpeg_psnr_invariant():
    """Conformance test for the real-codec branch — ACTIVATES when Pillow is
    present (skips otherwise): a real JPEG at quality 95 must decode through
    the same decode_image() entry point and hold the PSNR ≥ 40 dB per-row
    invariant the synthetic qlossy codec guarantees; PNG must round-trip
    losslessly; the META trailer must survive both."""
    import pytest

    pytest.importorskip("PIL")
    # smooth gradient image — natural-image-like, where q95 JPEG sits well
    # above 40 dB (white noise is the adversarial case no crawler corpus hits)
    y, x = np.mgrid[0:96, 0:128]
    px = np.stack([(x * 2) % 256, (y * 2) % 256, ((x + y)) % 256],
                  axis=2).astype(np.uint8)
    meta = {"caption": "real-codec conformance", "pages": []}
    jb = codecs.encode_image(px, "jpeg", meta)
    dec, fmt, m = codecs.decode_image(jb)
    assert fmt == "jpeg" and m == meta
    assert codecs.psnr(px, dec) >= 40.0
    pb = codecs.encode_image(px, "png", meta)
    dec2, fmt2, m2 = codecs.decode_image(pb)
    assert fmt2 == "png" and m2 == meta
    assert np.array_equal(dec2, px)
    # memoryview (zero-copy fetch path) decodes identically
    dec3, _, _ = codecs.decode_image(memoryview(jb))
    assert np.array_equal(dec3, dec)
