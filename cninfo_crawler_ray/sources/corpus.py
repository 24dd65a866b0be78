"""Deterministic synthetic fixture generation (FIXTURES.md F1-F3, F5).

Everything derives from (seed=42, image_id); no wall-clock, no network. The
corpus stands in for the remote PDF store (static.cninfo.com.cn,
cninfo_report_crawler.py:69); the announcements table stands in for the
listing API's JSON pages (:192-331).

Generation is Ray-parallel when a Ray session exists (map_batches over an id
range); otherwise a plain loop. Output is cached per (n_images, seed) under
``/tmp/ray_frontier_fixtures`` with atomic directory rename so reruns skip.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from datetime import date, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import ANNOUNCEMENTS_SCHEMA, CORPUS_SCHEMA, EXCHANGES, SEEDS_SCHEMA
from ..functions import codecs

FIXTURE_ROOT = "/tmp/ray_frontier_fixtures"
SEED = 42

#: caption vocabulary — includes the CJK trigger substrings the reference's
#: predicates key on (title-year filter cninfo_report_crawler.py:111-122,
#: 摘要/英文版 exclusion :124-126) so caption/title kernels are exercised.
_WORDS = (
    "aerial view of river delta mountain sunset city skyline harbor forest "
    "portrait macro shot long exposure night sky reflection snow field"
).split()
_CJK_SNIPPETS = ["年度报告", "半年度报告", "第一季度报告", "第三季度报告"]
_SIZES = np.array([16, 32, 64, 128], dtype=np.int32)
_SIZE_P = np.array([0.25, 0.40, 0.30, 0.05])  # skewed; 128 rare (bytes budget)

#: image-size presets. "default" keeps fixtures tiny (fast unit/conformance
#: runs); "web" matches realistic crawled-image dimensions so the benchmark
#: workload is decode-compute-bound like a real image crawl (tiny images
#: leave fetch+decode scheduling-bound at any cluster size).
SIZE_PRESETS: dict[str, tuple[np.ndarray, np.ndarray]] = {
    "default": (_SIZES, _SIZE_P),
    "web": (np.array([64, 128, 256, 512], dtype=np.int32),
            np.array([0.30, 0.40, 0.25, 0.05])),
}
_FMT_P = {"raw": 0.25, "ppm": 0.25, "qlossy": 0.50}


def _rng_for(image_id: str) -> np.random.Generator:
    h = hashlib.sha1(f"{SEED}:{image_id}".encode()).digest()
    return np.random.Generator(np.random.PCG64(int.from_bytes(h[:8], "little")))


def gen_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Reference pixels for an image_id — regenerable anywhere (tests compare
    the engine's decoded pixels against these; PSNR ≥ 40 dB invariant)."""
    rng = _rng_for(image_id)
    # Smooth-ish image (random low-res upsampled + noise) so qlossy zlib
    # actually compresses and phash is non-degenerate.
    base = rng.integers(0, 256, size=(max(h // 8, 1), max(w // 8, 1), 3), dtype=np.uint8)
    img = np.kron(base, np.ones((8, 8, 1), dtype=np.uint8))[:h, :w, :]
    noise = rng.integers(-6, 7, size=img.shape, dtype=np.int16)
    return (img.astype(np.int16) + noise).clip(0, 255).astype(np.uint8)


def _make_caption(rng: np.random.Generator, i: int) -> str:
    words = [str(w) for w in rng.choice(_WORDS, size=int(rng.integers(3, 8)))]
    cap = " ".join(words)
    if i % 7 == 0:
        cap += " " + _CJK_SNIPPETS[int(rng.integers(0, len(_CJK_SNIPPETS)))]
    if i % 31 == 0:
        cap += " 摘要"
    if i % 37 == 0:
        cap += " 英文版"
    if i % 11 == 0:
        cap += f" {2022 + int(rng.integers(0, 4))}"
    if i % 97 == 0:
        return ""  # adversarial: empty caption
    return cap


# ---------------------------------------------------------------------------
# F5-style synthetic document pages (the pdfplumber-page analog)
# ---------------------------------------------------------------------------

_NUM_CASES = [
    "1,234,567.89", "12,345.678", "-5.00", "0.00", "987", "3.14159",
    "12,345.67", "约 2,000 万元", "N/A", "", "8,8,8", "42.5",
]


def synth_pages(image_id: str, caption: str) -> list[dict]:
    """Deterministic per-document pages: text + pdfplumber-shaped tables
    (list of rows of nullable string cells). Embeds the extraction cases of
    FIXTURES.md F5 (keyword variants, number formats, parent-category
    placements) keyed off a stable per-id counter."""
    rng = _rng_for("pages:" + image_id)
    case = int(rng.integers(0, 10))
    kw_variants = ["其中：数据资源", "其中:数据资源", "其 中：数据\n资源", "其中： 数据资源"]
    kw = kw_variants[int(rng.integers(0, len(kw_variants)))]
    num = _NUM_CASES[int(rng.integers(0, len(_NUM_CASES)))]
    cat = ["存货", "无形资产", "开发支出"][int(rng.integers(0, 3))]

    pages: list[dict] = []
    text = f"第1页 {caption}"
    if case < 6:
        text += " 数据资源"
    if case == 0:  # keyword row with number in later column, category directly above
        table = [[cat, None, ""], [kw, "", num], ["合计", "1.00", "2.00"]]
    elif case == 1:  # number embedded in the keyword cell itself (R:179)
        table = [[cat, ""], [f"{kw}{num}", None]]
    elif case == 2:  # blank row between category and keyword row
        table = [[cat, "100.00"], [None, None], [kw, num]]
    elif case == 3:  # wrong text above → stop rule → no item (R:137-138)
        table = [["其他项目", "5.00"], [kw, num]]
    elif case == 4:  # no parent at all → dropped (R:189-190)
        table = [[kw, num]]
    elif case == 5:  # multiple hits in one doc (A5 prefer-positive dedup)
        table = [[cat, ""], [kw, "0.00"], [cat, ""], [kw, "77.50"]]
    else:  # cases 6-9: no keyword in tables (zero-fill ×3 path, R:298-310)
        table = [["项目", "金额"], ["存货", "123.45"]]
    pages.append({"text": text, "tables": [table] if case < 8 else []})
    if case == 5:  # second page, second hit
        pages.append({"text": "第2页 数据资源", "tables": [[[cat, ""], [kw, "88.00"]]]})
    return pages


# ---------------------------------------------------------------------------
# F1 corpus
# ---------------------------------------------------------------------------

def image_fmt(image_id: str) -> str:
    """Pure function of image_id — the announcements generator and the corpus
    generator must agree on it (the URL extension is derived from it)."""
    r = _rng_for("fmt:" + image_id).random()
    return "raw" if r < 0.25 else ("ppm" if r < 0.5 else "qlossy")


def corpus_rows(lo: int, hi: int, n_total: int, sizes: str = "default") -> pa.Table:
    """Build corpus rows for ids in [lo, hi) — the unit of parallel generation."""
    size_vals, size_p = SIZE_PRESETS[sizes]
    ids, blobs, ws, hs, fmts, caps, phs = [], [], [], [], [], [], []
    for i in range(lo, hi):
        image_id = f"img_{i:08d}"
        rng = _rng_for("meta:" + image_id)
        w = int(size_vals[rng.choice(len(size_vals), p=size_p)])
        h = int(size_vals[rng.choice(len(size_vals), p=size_p)])
        fmt = image_fmt(image_id)
        caption = _make_caption(rng, i)
        # ~0.5% near-dup pairs: row i clones pixels of i-1 (shared phash
        # hook). The clone must use the SOURCE row's dims — gen_pixels is
        # deterministic on (id, w, h), so cloning at this row's own dims
        # produced unrelated pixels (and unrelated phash), silently breaking
        # the near-dup hook.
        if i % 211 == 0 and i > 0:
            src_id = f"img_{i - 1:08d}"
            srng = _rng_for("meta:" + src_id)
            w = int(size_vals[srng.choice(len(size_vals), p=size_p)])
            h = int(size_vals[srng.choice(len(size_vals), p=size_p)])
        else:
            src_id = image_id
        px = gen_pixels(src_id, w, h)
        meta = {"caption": caption, "pages": synth_pages(image_id, caption)}
        if i % 101 == 0 and i > 0:
            blob = b""  # adversarial: zero-byte payload (fetch yields nothing)
        elif i % 103 == 0 and i > 0:
            # adversarial: fmt column says qlossy but payload is raw (magic
            # mismatch → validation gate must drop, like a non-PDF body).
            blob = codecs.encode_image(px, "raw", meta)
            fmt = "qlossy"
        else:
            blob = codecs.encode_image(px, fmt, meta)
        ids.append(image_id)
        blobs.append(blob)
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        caps.append(caption)
        phs.append(codecs.phash64(px))
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.large_binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(phs, pa.int64()),
        },
        schema=CORPUS_SCHEMA,
    )


def url_for(image_id: str, fmt: str, num_hosts: int = 8) -> str:
    """URL layout per FIXTURES.md F1; host assignment is skewed (host 0 takes
    ~50% — the hot-host case the salted shuffle must absorb, SURVEY.md §4.1)."""
    hv = int.from_bytes(hashlib.sha1(image_id.encode()).digest()[:4], "little")
    k = 0 if hv % 10 < 5 else 1 + hv % max(num_hosts - 1, 1)
    return f"https://img{k}.example.test/{image_id}.{fmt}"


# ---------------------------------------------------------------------------
# F2 announcements + F3 seeds
# ---------------------------------------------------------------------------

_COMPANIES = ["中国移动", "上海机电", "云赛智联", "恒生电子", "拓尔思", "海天瑞声", "每日互动", "久远银海"]


def _sec_code_for(i: int, rng: np.random.Generator) -> str:
    """secCode universe exercising every M3 branch (cninfo_report_crawler.py:85-109):
    6-digit with each suffix family, short digits needing zfill, junk, empty."""
    r = int(rng.integers(0, 20))
    if r == 0:
        return str(int(rng.integers(1, 99)))  # zfill case → 0000xx → .SZ
    if r == 1:
        return "ABC" + str(int(rng.integers(10, 99)))  # non-digit junk → bare
    if r == 2:
        return ""  # missing → 未知代码 default path
    if r == 3:
        return "600941"  # special-unit code (report_info_collection.py:36-39)
    if r == 4:
        return "601727"
    prefix = ["60", "68", "00", "30", "83", "87", "92", "43", "51", "12"][int(rng.integers(0, 10))]
    return prefix + f"{int(rng.integers(0, 9999)):04d}"


def _title_for(i: int, rng: np.random.Generator, year: int) -> str:
    """``year`` is the stream date's year — inside the −3-month-shifted
    target-year window (cninfo_report_crawler.py:384-400), so base titles
    pass M4; kinds 0/1/3 are the filtered cases."""
    kind = int(rng.integers(0, 10))
    base = f"{year}年年度报告"
    if kind == 0:
        return base + "摘要"  # excluded (M5)
    if kind == 1:
        return base + "（英文版）"  # excluded
    if kind == 2:
        return "关于公司治理的公告"  # no digits → kept by M4
    if kind == 3:
        return f"{year - 3}年年度报告"  # wrong year + has digits → dropped
    return base


def announcements_rows(n_images: int, dates: list[date], category: str) -> pa.Table:
    """Enumerate listing streams (exchange × date × category) whose pages
    reference corpus image_ids. Includes exact-duplicate rows within and
    across pages (A1 in-flight dedup, cninfo_report_crawler.py:294-306) and
    cross-stream repeats that survive to A2/A3."""
    cols: dict[str, list] = {k.name: [] for k in ANNOUNCEMENTS_SCHEMA}
    n_streams = len(EXCHANGES) * len(dates)
    per_stream = max(n_images // max(n_streams, 1), 4)
    next_img = 0
    for exch in EXCHANGES:
        for d in dates:
            rng = _rng_for(f"stream:{exch}:{d.isoformat()}")
            n_anns = int(per_stream * (0.5 + rng.random()))
            rows = []
            for j in range(n_anns):
                i = next_img % n_images
                next_img += 1
                image_id = f"img_{i:08d}"
                fmt = image_fmt(image_id)
                year = d.year
                arng = _rng_for(f"ann:{exch}:{d}:{j}")
                t_kind = int(arng.integers(0, 3))
                if t_kind == 0:
                    tstr = str(int(_ms_at(d, j)))
                elif t_kind == 1:
                    tstr = f"{d.isoformat()} 0{j % 10}:3{j % 6}"
                else:
                    tstr = ""
                rows.append(
                    {
                        "secCode": _sec_code_for(i, arng),
                        "secName": _COMPANIES[i % len(_COMPANIES)],
                        "announcementTitle": _title_for(i, arng, year),
                        "announcementTime": tstr,
                        "adjunctUrl": url_for(image_id, fmt).removeprefix("https://"),
                        "exchange": exch,
                        "date": d,
                        "category": category,
                    }
                )
                if j % 13 == 0:  # in-stream exact duplicate (A1 must drop)
                    rows.append(dict(rows[-1]))
            # paginate: 30 per page (cninfo_report_crawler.py:197); append a
            # tail of duplicate-only pages to exercise the novelty stop rule.
            if rows and len(rows) >= 30:
                rows.extend(dict(r) for r in rows[:70])
            for idx, r in enumerate(rows):
                r["page_num"] = idx // 30 + 1
                r["index_in_page"] = idx % 30
                for k, v in r.items():
                    cols[k].append(v)
    return pa.table(
        {f.name: pa.array(cols[f.name], f.type) for f in ANNOUNCEMENTS_SCHEMA},
        schema=ANNOUNCEMENTS_SCHEMA,
    )


def _ms_at(d: date, j: int) -> int:
    epoch = (d - date(1970, 1, 1)).days
    return (epoch * 86400 + 3600 * 9 + 60 * (j % 50)) * 1000


def seeds_rows(dates: list[date], category: str, page_budget: int = 500) -> pa.Table:
    cols: dict[str, list] = {k.name: [] for k in SEEDS_SCHEMA}
    for rank, exch in enumerate(EXCHANGES):
        for d in dates:
            cols["seed_url"].append(f"https://listing.example.test/{exch}/{d.isoformat()}/{category}")
            cols["host"].append("listing.example.test")
            cols["rank"].append(rank)
            cols["exchange"].append(exch)
            cols["date"].append(d)
            cols["category"].append(category)
            cols["page_budget"].append(page_budget)
    return pa.table({f.name: pa.array(cols[f.name], f.type) for f in SEEDS_SCHEMA}, schema=SEEDS_SCHEMA)


# ---------------------------------------------------------------------------
# cached build
# ---------------------------------------------------------------------------

def default_dates(n_days: int = 4) -> list[date]:
    # Includes a month-end start so the −3-month clamp path is live
    # (2025-05-31 → Feb 31 crash in the reference, SURVEY.md §0.1.2).
    start = date(2025, 5, 29)
    return [start + timedelta(days=i) for i in range(n_days)]


FIXTURE_VERSION = 5  # bump when generation logic changes → new cache dirs


def fixture_dir(n_images: int, sizes: str = "default") -> str:
    suffix = "" if sizes == "default" else f"_{sizes}"
    return os.path.join(FIXTURE_ROOT, f"v{FIXTURE_VERSION}_n{n_images}_seed{SEED}{suffix}")


def ensure_fixtures(n_images: int, n_days: int = 4, use_ray: bool | None = None,
                    sizes: str = "default") -> str:
    """Build (or reuse cached) corpus + announcements + seeds parquet under
    /tmp. Returns the fixture directory. Atomic: builds into a tmp dir and
    renames, so concurrent/killed builds never expose partial fixtures."""
    out = fixture_dir(n_images, sizes)
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    tmp = out + ".building"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    import ray

    if use_ray is None:
        use_ray = ray.is_initialized() and n_images >= 20_000
    chunk = 2000
    bounds = [(lo, min(lo + chunk, n_images)) for lo in range(0, n_images, chunk)]
    if use_ray:
        @ray.remote(num_cpus=1)
        def _gen(lo: int, hi: int) -> pa.Table:
            return corpus_rows(lo, hi, n_images, sizes)

        tables = ray.get([_gen.remote(lo, hi) for lo, hi in bounds])
    else:
        tables = [corpus_rows(lo, hi, n_images, sizes) for lo, hi in bounds]
    corpus = pa.concat_tables(tables)
    # Sorted by image_id (generation order is already sorted); row groups
    # sized so the fetch stage's row-group index gives selective reads of
    # ~10-20 MB per group regardless of the image-size preset.
    rg_rows = 2048 if sizes == "default" else 256
    pq.write_table(corpus, os.path.join(tmp, "corpus.parquet"), row_group_size=rg_rows)
    # HEAD sidecar — the "server's" cheap metadata index (store.py).
    import pyarrow.compute as _pc

    pq.write_table(
        pa.table(
            {
                "image_id": corpus["image_id"],
                "fmt": corpus["fmt"],
                "content_length": _pc.binary_length(corpus["bytes"]).cast(pa.int64()),
            }
        ),
        os.path.join(tmp, "corpus_head.parquet"),
        # pruned HEAD reads: ids are sorted, so small row groups give the
        # probe stage O(batch-range) sidecar reads (store._read_head)
        row_group_size=8192,
    )

    dates = default_dates(n_days)
    category = "category_ndbg_szsh"
    anns = announcements_rows(n_images, dates, category)
    # store layout for predicate pushdown: sorted by stream key with row
    # groups ≈ one (exchange, date) stream, so the listing enumerator's
    # filtered scans prune to O(stream) row groups instead of decompressing
    # the whole store (same rows — layout only)
    anns = anns.sort_by([("exchange", "ascending"), ("date", "ascending"),
                         ("page_num", "ascending"), ("index_in_page", "ascending")])
    n_streams = max(len(dates) * 5, 1)  # ≈ exchanges × dates
    rg = max(1024, anns.num_rows // n_streams)
    pq.write_table(anns, os.path.join(tmp, "announcements.parquet"), row_group_size=rg)
    pq.write_table(seeds_rows(dates, category), os.path.join(tmp, "seeds.parquet"))
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"n_images": n_images, "seed": SEED, "n_days": n_days, "sizes": sizes,
                   "dates": [d.isoformat() for d in dates], "category": category}, f)
    open(os.path.join(tmp, "_DONE"), "w").close()
    if os.path.exists(out):
        shutil.rmtree(tmp, ignore_errors=True)  # lost a build race; reuse winner
    else:
        os.replace(tmp, out)
    return out


def scale_for_sf_dir(sf_dir: str) -> int:
    """Map a driver sf dir to a corpus size (FIXTURES.md: ~1k smoke, ~10k
    correctness, ~100k bench)."""
    if "0.001" in sf_dir:
        return 1_000
    if "0.01" in sf_dir:
        return 10_000
    return 100_000
