"""Pure-numpy image codecs for the corpus payloads.

The sandbox has no Pillow / image libraries (SURVEY.md §7), so the corpus
``bytes`` column uses three self-describing container formats:

- ``raw``    — lossless: magic ``RAW0`` + u32 w + u32 h + RGB24 pixels.
- ``ppm``    — lossless: standard binary P6 header + RGB24 pixels.
- ``qlossy`` — deterministic lossy: magic ``QL01`` + u32 w + u32 h +
  zlib-compressed 6-bit-quantized pixels. Reconstruction error ≤ 2/channel →
  PSNR ≈ 47 dB, comfortably above the ≥ 40 dB per-row invariant from
  BASELINE.json's ``input_hint`` (the analog of the reference's ``%PDF`` magic
  + content-type gate, cninfo_report_crawler.py:134-135, :149-150).

Every container carries a trailing metadata section ``META`` + u32 length +
UTF-8 JSON holding the caption and the synthetic "document pages" (the analog
of pdfplumber's per-page text/tables, report_info_collection.py:151-198), so
fetch → decode → extract operates on the fetched payload alone.

These functions are per-image (not vectorized) by nature; they run inside
``map_batches`` actor pools (stages/decode.py) where the batch loop amortizes
actor state.
"""

from __future__ import annotations

import json
import struct
import zlib

import numpy as np

MAGIC_RAW = b"RAW0"
MAGIC_QLOSSY = b"QL01"
MAGIC_PPM = b"P6\n"
META_MARK = b"META"

MAGIC_JPEG = b"\xff\xd8\xff"
MAGIC_PNG = b"\x89PNG\r\n\x1a\n"

LOSSLESS_FMTS = {"raw", "ppm"}
ALL_FMTS = ("raw", "ppm", "qlossy")
#: real-world formats behind the import-gated Pillow branch (VERDICT r03
#: item 3). Deliberately NOT in ALL_FMTS: fixture generation and the
#: synthetic-codec goldens never emit them, so adding the branch cannot
#: perturb any existing oracle or golden.
REAL_FMTS = ("jpeg", "png")

#: fmt → leading magic bytes (the "content-type" of the payload).
FMT_MAGIC = {"raw": MAGIC_RAW, "ppm": MAGIC_PPM, "qlossy": MAGIC_QLOSSY,
             "jpeg": MAGIC_JPEG, "png": MAGIC_PNG}


def _meta_trailer(meta: dict | None) -> bytes:
    blob = json.dumps(meta or {}, ensure_ascii=False, sort_keys=True).encode("utf-8")
    return META_MARK + struct.pack("<I", len(blob)) + blob


def _split_meta_tail(data) -> dict:
    """Meta trailer for real-format payloads, located from the END of the
    buffer (a JPEG/PNG decoder gives no body_end offset; decoders stop at
    EOI/IEND so trailing bytes are ignored by Pillow). Accepts the trailer
    only when its length field lands exactly on the buffer end — a META
    byte sequence inside the compressed stream cannot false-positive."""
    buf = data if isinstance(data, bytes) else bytes(data)
    m = buf.rfind(META_MARK)
    if m < 0 or m + 8 > len(buf):
        return {}
    (n,) = struct.unpack_from("<I", buf, m + 4)
    if m + 8 + n != len(buf):
        return {}
    return json.loads(buf[m + 8 : m + 8 + n].decode("utf-8"))


def _pillow(fmt: str):
    """Import-gated real-codec hook (VERDICT r03 item 3; the reference's
    analog is the pdfplumber decode, report_info_collection.py:151). The
    sandbox ships no Pillow wheel, so this raises NotImplementedError there;
    when the wheel exists the jpeg/png branches below are fully live and
    tests/test_codecs.py::test_real_jpeg_psnr_invariant activates."""
    try:
        from PIL import Image  # noqa: PLC0415 — the import IS the gate
    except ImportError as exc:
        raise NotImplementedError(
            f"real {fmt} payload but Pillow is not installed; the synthetic "
            "containers (raw/ppm/qlossy) carry the test corpus — install "
            "Pillow to activate the real-codec branch") from exc
    return Image


def _split_meta(data, body_end: int) -> dict:
    if bytes(data[body_end : body_end + 4]) != META_MARK:
        return {}
    (n,) = struct.unpack_from("<I", data, body_end + 4)
    return json.loads(str(data[body_end + 8 : body_end + 8 + n], "utf-8")
                      if not isinstance(data, bytes)
                      else data[body_end + 8 : body_end + 8 + n].decode("utf-8"))


def encode_image(pixels: np.ndarray, fmt: str, meta: dict | None = None) -> bytes:
    """Encode an (h, w, 3) uint8 array into the given container format."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    if fmt == "raw":
        body = MAGIC_RAW + struct.pack("<II", w, h) + pixels.tobytes()
    elif fmt == "ppm":
        body = MAGIC_PPM + f"{w} {h}\n255\n".encode("ascii") + pixels.tobytes()
    elif fmt == "qlossy":
        quant = (pixels >> 2).astype(np.uint8)  # keep top 6 bits
        comp = zlib.compress(quant.tobytes(), level=1)
        body = MAGIC_QLOSSY + struct.pack("<III", w, h, len(comp)) + comp
    elif fmt in REAL_FMTS:
        import io

        Image = _pillow(fmt)
        buf = io.BytesIO()
        im = Image.fromarray(pixels, mode="RGB")
        if fmt == "jpeg":
            # quality 95 keeps PSNR comfortably above the ≥ 40 dB gate on
            # natural images (the same invariant qlossy guarantees at ~47 dB)
            im.save(buf, format="JPEG", quality=95, subsampling=0)
        else:
            im.save(buf, format="PNG")
        body = buf.getvalue()
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    return body + _meta_trailer(meta)


def sniff_fmt(data) -> str | None:
    """Magic-byte sniff — the validation gate's GET-fallback analog
    (cninfo_report_crawler.py:149-150 ``chunk.startswith(b'%PDF')``).
    Accepts bytes or any buffer (memoryview of an Arrow payload slice)."""
    head = data[:8] if isinstance(data, bytes) else bytes(data[:8])
    if head[:4] == MAGIC_RAW:
        return "raw"
    if head[:4] == MAGIC_QLOSSY:
        return "qlossy"
    if head[:3] == MAGIC_PPM:
        return "ppm"
    if head[:3] == MAGIC_JPEG:
        return "jpeg"
    if head == MAGIC_PNG:
        return "png"
    return None


def decode_image(data) -> tuple[np.ndarray, str, dict]:
    """Decode a container payload → (pixels (h,w,3) uint8, fmt, meta).

    Accepts bytes or any buffer-protocol object (memoryview slice of an
    Arrow payload column — the zero-copy fetch path); pixels are parsed in
    place with np.frombuffer, so lossless formats return read-only views
    over the source buffer rather than copies.

    Raises ValueError on malformed payloads (the per-row analog of
    pdfplumber failing to open a non-PDF body).
    """
    fmt = sniff_fmt(data)
    if fmt == "raw":
        w, h = struct.unpack_from("<II", data, 4)
        n = w * h * 3
        body_end = 12 + n
        px = np.frombuffer(data, dtype=np.uint8, count=n, offset=12).reshape(h, w, 3)
    elif fmt == "ppm":
        # P6\n{w} {h}\n255\n — the header is tiny; parse it from a small
        # bytes copy so buffer inputs (no .index) work
        hdr = data[:64] if isinstance(data, bytes) else bytes(data[:64])
        i = hdr.index(b"\n", 3)
        dims = hdr[3:i].split()
        w, h = int(dims[0]), int(dims[1])
        j = hdr.index(b"\n", i + 1)
        n = w * h * 3
        body_end = j + 1 + n
        px = np.frombuffer(data, dtype=np.uint8, count=n, offset=j + 1).reshape(h, w, 3)
    elif fmt == "qlossy":
        w, h, clen = struct.unpack_from("<III", data, 4)
        body_end = 16 + clen
        quant = np.frombuffer(zlib.decompress(data[16:body_end]), dtype=np.uint8).reshape(h, w, 3)
        # quant is 6-bit (≤63), so (q<<2)+2 ≤ 254 fits uint8 directly — one
        # pass, no uint16 temporary, no clip (same values as the widened
        # form; decode is memory-bandwidth-sensitive at high core counts).
        # << allocates the one writable output; += runs in place on it.
        px = quant << 2
        px += 2
    elif fmt in REAL_FMTS:
        import io

        Image = _pillow(fmt)
        buf = data if isinstance(data, bytes) else bytes(data)
        with Image.open(io.BytesIO(buf)) as im:
            px = np.asarray(im.convert("RGB"), dtype=np.uint8)
        # a real decoder gives no body_end offset — the meta trailer is
        # located from the buffer tail instead (decoders stop at EOI/IEND)
        return px, fmt, _split_meta_tail(data)
    else:
        raise ValueError("unrecognized payload magic")
    return px, fmt, _split_meta(data, body_end)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images; inf if equal."""
    if a.shape != b.shape:
        return float("-inf")
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def resize_area(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area-average resize of an (h, w, 3) uint8 image.

    Output pixel (i, j) is the mean of the integer pixel box
    rows [floor(i*h/oh), floor((i+1)*h/oh)) × cols [floor(j*w/ow), ...)
    (a degenerate box falls back to its single nearest row/col, so upscale
    degrades to nearest-neighbor). Pure integer boundaries → bit-identical
    on every platform; vectorized via a float64 summed-area table."""
    if out_h < 1 or out_w < 1:
        raise ValueError("output dims must be >= 1")
    h, w = pixels.shape[:2]
    # integral image with a zero border: S[i, j] = sum of pixels[:i, :j]
    S = np.zeros((h + 1, w + 1, 3), dtype=np.float64)
    np.cumsum(np.cumsum(pixels, axis=0, dtype=np.float64), axis=1, out=S[1:, 1:])
    r0 = (np.arange(out_h) * h) // out_h
    r1 = np.maximum((np.arange(1, out_h + 1) * h) // out_h, r0 + 1)
    c0 = (np.arange(out_w) * w) // out_w
    c1 = np.maximum((np.arange(1, out_w + 1) * w) // out_w, c0 + 1)
    box = (S[r1][:, c1] - S[r1][:, c0] - S[r0][:, c1] + S[r0][:, c0])
    area = ((r1 - r0)[:, None] * (c1 - c0)[None, :]).astype(np.float64)
    return np.round(box / area[:, :, None]).astype(np.uint8)


def dhash64(pixels: np.ndarray) -> int:
    """Difference-hash perceptual fingerprint: 8×9 block-mean grayscale
    grid, bit (r, c) = grid[r, c+1] > grid[r, c] — 64 bits of horizontal
    gradient structure (sign-cast to int64 like :func:`phash64`).

    A second hash FAMILY for near-dup mining: phash64 thresholds each cell
    against the global mean (brightness structure), dhash64 compares
    adjacent cells (edge structure) — the pair catches duplicates a single
    family misses (global-brightness shifts flip phash cells but preserve
    gradients)."""
    gray = np.mean(pixels, axis=2, dtype=np.float32)
    h, w = gray.shape
    bh, bw = max(h // 8, 1), max(w // 9, 1)
    g = gray[: bh * 8, : bw * 9].reshape(8, bh, 9, bw).mean(axis=(1, 3))
    bits = (g[:, 1:] > g[:, :-1]).flatten()
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return val - (1 << 64) if val >= (1 << 63) else val


def phash64(pixels: np.ndarray) -> int:
    """Average-hash perceptual fingerprint: 8×8 block-mean grayscale → 64 bits
    (sign-cast to int64 for the ``phash`` corpus column)."""
    # bit-identical to pixels.astype(float32).mean(axis=2) — same per-pixel
    # float32 accumulation — without materializing the h×w×3 float32 copy
    # (3 payload-sized writes+reads saved; decode is memory-bandwidth-bound
    # at high core counts)
    gray = np.mean(pixels, axis=2, dtype=np.float32)
    h, w = gray.shape
    # Block-mean downsample to 8×8 (pad to a multiple of 8 by edge-cropping).
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    g = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (g > g.mean()).flatten()
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return val - (1 << 64) if val >= (1 << 63) else val
