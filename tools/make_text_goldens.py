"""Generate golden parquet oracles for the deterministic-but-not-SQL text /
embedding queries (rolling_fingerprint, simhash, minhash_lsh_dedup,
ann_lsh_topk, ann_ivf_topk) at the driver's correctness scale (sf0.01).

These operators ARE their algorithm — the algorithm is the spec — so the
oracle re-derives each one from the spec as a SINGLE-PROCESS, ROW-AT-A-TIME
implementation (plain-Python loops and int bit ops wherever feasible),
sharing none of the engine's vectorized / distributed execution path:

- rolling_fingerprint: per-row polynomial rolling hash, pure-Python ints
- simhash: per-row bit-vote with Python integer shifts (no numpy unpackbits)
- minhash_lsh_dedup: per-row signatures + a dict-of-band-key bucket index +
  set-based Jaccard verify (no shuffle, no self-join)
- ann_lsh_topk / ann_ivf_topk: single full-corpus numpy pass on the driver
  (the engine streams per-batch partial top-k through an actor pool)

Shared SPEC constants (hash seeds, permutation seeds, band/plane/cell
counts) are re-derived from the documented parameters, not imported from the
engine. Every golden is cross-checked against the live engine before being
written; a mismatch aborts generation.

Regenerate with:
    PYTHONPATH=/root/repo python tools/make_text_goldens.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

GOLDEN_DIR = "/root/repo/goldens/sf0.01"
SF_DIR = "/root/testdata/sf0.01"

_WORD_RE_PATTERN = r"[a-z0-9]+"
_MERSENNE = (1 << 61) - 1
_ROLL_BASE = 1_000_003


def _hash64(s: str) -> int:
    # spec: blake2b(digest_size=8, salt=0) little-endian (functions/dedup.py:28)
    h = hashlib.blake2b(s.encode("utf-8"), digest_size=8,
                        salt=(0).to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def _tokens(text: str) -> list[str]:
    import re

    return re.findall(_WORD_RE_PATTERN, str(text).lower())


def _shingle_set(text: str, k: int = 3) -> set[str]:
    toks = _tokens(text)
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


# --- rolling fingerprint (pure-Python ints) ---------------------------------

def oracle_rolling(docs: pd.DataFrame, window: int = 16) -> pd.DataFrame:
    fps = []
    for t in docs["text"].fillna(""):
        b = t.encode("utf-8")
        if len(b) < window:
            h = 0
            for ch in b:
                h = (h * _ROLL_BASE + ch) % _MERSENNE
            fps.append(h)
            continue
        pw = pow(_ROLL_BASE, window - 1, _MERSENNE)
        h = 0
        for ch in b[:window]:
            h = (h * _ROLL_BASE + ch) % _MERSENNE
        best = h
        for j in range(window, len(b)):
            h = ((h - b[j - window] * pw) * _ROLL_BASE + b[j]) % _MERSENNE
            best = min(best, h)
        fps.append(best)
    return pd.DataFrame({"doc_id": docs["doc_id"].astype("int64"),
                         "fp64": pd.Series(fps, dtype="int64")})


# --- simhash (Python integer bit votes) --------------------------------------

def oracle_simhash(docs: pd.DataFrame) -> pd.DataFrame:
    out = []
    for t in docs["text"].fillna(""):
        toks = _tokens(t)
        if not toks:
            out.append(0)
            continue
        votes = [0] * 64
        for w in toks:
            h = _hash64(w)
            for j in range(64):
                votes[j] += 1 if (h >> j) & 1 else -1
        val = 0
        for j in range(64):
            if votes[j] > 0:
                val |= 1 << j
        if val >= 1 << 63:
            val -= 1 << 64
        out.append(val)
    return pd.DataFrame({"doc_id": docs["doc_id"].astype("int64"),
                         "simhash64": pd.Series(out, dtype="int64")})


def oracle_simhash_near_dup(sim: pd.DataFrame, max_hamming: int = 3) -> pd.DataFrame:
    """Brute-force hamming over the (independently recomputed) simhashes —
    exact oracle for the engine's banded LSH at max_hamming ≤ 3/4-bands."""
    h = sim["simhash64"].to_numpy().view(np.uint64)
    ids = sim["doc_id"].to_numpy()
    x = h[:, None] ^ h[None, :]
    ham = np.unpackbits(x.view(np.uint8).reshape(len(h), len(h), 8), axis=2).sum(axis=2)
    ii, jj = np.nonzero(ham <= max_hamming)
    keep = ii < jj
    return (pd.DataFrame({"doc_a": ids[ii[keep]], "doc_b": ids[jj[keep]]})
            .astype({"doc_a": "int64", "doc_b": "int64"})
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))


# --- minhash + LSH + Jaccard verify (dict bucket index) ----------------------

def oracle_minhash_pairs(docs: pd.DataFrame, num_perm: int = 64,
                         bands: int = 16, threshold: float = 0.7) -> pd.DataFrame:
    # spec permutation table: PCG64(42) universal hashes (functions/dedup.py:54)
    rng = np.random.Generator(np.random.PCG64(42))
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    rows = num_perm // bands

    shingles: dict[int, set[str]] = {}
    buckets: dict[str, list[int]] = {}
    for did, text in zip(docs["doc_id"].astype(int), docs["text"].fillna("")):
        sh = _shingle_set(text)
        shingles[did] = sh
        if not sh:
            sig = np.full(num_perm, _MERSENNE, dtype=np.uint64)
        else:
            base = np.array([_hash64(s) for s in sorted(sh)], dtype=np.uint64)
            sig = ((base[:, None] * a[None, :] + b[None, :])
                   % np.uint64(_MERSENNE)).min(axis=0)
        for bi in range(bands):
            key = hashlib.blake2b(sig[bi * rows:(bi + 1) * rows].tobytes(),
                                  digest_size=8).hexdigest()
            buckets.setdefault(f"{bi}:{key}", []).append(did)

    cand: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))

    keep = []
    for x, y in sorted(cand):
        sa, sb = shingles[x], shingles[y]
        if not sa and not sb:
            jac = 1.0
        else:
            u = len(sa | sb)
            jac = len(sa & sb) / u if u else 0.0
        if jac >= threshold:
            keep.append((x, y))
    return pd.DataFrame(keep, columns=["doc_a", "doc_b"]).astype(
        {"doc_a": "int64", "doc_b": "int64"})


# --- ANN variants (single numpy pass) ----------------------------------------

def _emb_matrix(emb: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    return emb["vec_id"].to_numpy().astype(np.int64), m


def oracle_ann_lsh(emb: pd.DataFrame, k: int = 10, planes: int = 12) -> pd.DataFrame:
    ids, mn = _emb_matrix(emb)
    H = np.random.Generator(np.random.PCG64(7)).standard_normal((64, planes))
    qv = mn[ids == 0][0]
    qsig = (qv @ H > 0)
    sig = mn @ H > 0
    mask = ((sig != qsig[None, :]).sum(axis=1) <= 2) & (ids != 0)
    s = mn[mask] @ qv
    top = np.argsort(-s, kind="stable")[:k]
    if len(s) > k:
        assert s[top[-1]] > np.sort(s)[::-1][k], "cos tie at the k boundary"
    return pd.DataFrame({"vec_id": ids[mask][top].astype("int64")})


def _spec_centroids(emb: pd.DataFrame, n_cells: int = 16,
                    sample_n: int = 2048) -> np.ndarray:
    """Spec coarse quantizer: spherical k-means, PCG64(13) init, 3 Lloyd
    iterations, over the first sample_n rows canonicalized by id order."""
    sample = np.stack(emb.head(sample_n).sort_values("vec_id", kind="stable")
                      ["embedding"].to_numpy()).astype(np.float64)
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rng = np.random.Generator(np.random.PCG64(13))
    C = sample[rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)]
    for _ in range(3):
        assign = np.argmax(sample @ C.T, axis=1)
        for c in range(len(C)):
            memb = sample[assign == c]
            if len(memb):
                v = memb.mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return C


def oracle_embed_clusters(emb: pd.DataFrame, n_cells: int = 16) -> pd.DataFrame:
    """k-means labeling spec: every vector → nearest spec centroid."""
    ids, mn = _emb_matrix(emb)
    cell = np.argmax(mn @ _spec_centroids(emb, n_cells).T, axis=1)
    return pd.DataFrame({"vec_id": pd.Series(ids, dtype="int64"),
                         "cluster_id": pd.Series(cell, dtype="int64")})


def oracle_ann_ivf(emb: pd.DataFrame, k: int = 10, n_cells: int = 16,
                   n_probe: int = 4, sample_n: int = 2048) -> pd.DataFrame:
    ids, mn = _emb_matrix(emb)
    C = _spec_centroids(emb, n_cells, sample_n)
    qv = mn[ids == 0][0]
    probe = np.argsort(-(C @ qv))[:n_probe]
    cell = np.argmax(mn @ C.T, axis=1)
    mask = np.isin(cell, probe) & (ids != 0)
    s = mn[mask] @ qv
    top = np.argsort(-s, kind="stable")[:k]
    if len(s) > k:
        assert s[top[-1]] > np.sort(s)[::-1][k], "cos tie at the k boundary"
    return pd.DataFrame({"vec_id": ids[mask][top].astype("int64")})


# --- connected components (union-find over the spec minhash pairs) ----------

def oracle_dup_clusters(docs: pd.DataFrame, pairs: pd.DataFrame) -> pd.DataFrame:
    """Plain union-find (path compression) over the spec-derived near-dup
    pair list; cluster id = min doc_id of the component. Independent of the
    engine's iterative label-propagation-over-Datasets execution."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    ids = docs["doc_id"].astype(int).tolist()
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                         "cluster_id": pd.Series([find(i) for i in ids],
                                                 dtype="int64")})


# --- part-name fuzzy clusters (DuckDB levenshtein + union-find) ---------------

def oracle_name_dup_clusters(sf_dir: str, max_dist: int = 2) -> pd.DataFrame:
    """Independent end-to-end path for the entity-resolution composition:
    candidate pairs from DuckDB's levenshtein (not the engine's banded
    DP), clustered by plain union-find (not label propagation); cluster
    id = min partkey of the component."""
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM "
                f"read_parquet('{sf_dir}/part.parquet')")
    pairs = con.execute(f"""
        SELECT a.p_partkey AS pa, b.p_partkey AS pb
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= {max_dist}
    """).df()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["pa"].astype(int), pairs["pb"].astype(int)):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ids = con.execute("SELECT p_partkey FROM part").df()["p_partkey"].astype(int)
    return pd.DataFrame({"p_partkey": pd.Series(ids.tolist(), dtype="int64"),
                         "cluster_id": pd.Series([find(i) for i in ids],
                                                 dtype="int64")})


# --- HyperLogLog (pure-Python ints, one id at a time) -------------------------

def oracle_approx_distinct_users(sf_dir: str, p: int = 12) -> pd.DataFrame:
    import math

    users = pq.read_table(f"{sf_dir}/events.parquet",
                          columns=["user_id"]).to_pandas()["user_id"]
    m = 1 << p
    M = [0] * m

    def splitmix64(x: int) -> int:
        mask = (1 << 64) - 1
        z = (x + 0x9E3779B97F4A7C15) & mask
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
        return z ^ (z >> 31)

    for u in users:
        h = splitmix64(int(u))
        reg = h >> (64 - p)
        rem = h & ((1 << (64 - p)) - 1)
        rank = (64 - p) - rem.bit_length() + 1
        M[reg] = max(M[reg], rank)

    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / sum(2.0 ** -r for r in M)
    zeros = M.count(0)
    if e <= 2.5 * m and zeros > 0:
        e = m * math.log(m / zeros)
    return pd.DataFrame({"n_users_approx": pd.Series([int(round(e))], dtype="int64"),
                         "n_users_exact": pd.Series([users.nunique()], dtype="int64")})


def oracle_approx_distinct_by_type(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """Grouped HLL spec: one pure-Python sketch per event_type (same
    splitmix64/rank/linear-counting rules as the ungrouped oracle)."""
    import math

    df = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    m = 1 << p

    def splitmix64(x: int) -> int:
        mask = (1 << 64) - 1
        z = (x + 0x9E3779B97F4A7C15) & mask
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
        return z ^ (z >> 31)

    rows = []
    for et in sorted(df["event_type"].unique()):
        users = df.loc[df["event_type"] == et, "user_id"]
        M = [0] * m
        for u in users:
            h = splitmix64(int(u))
            reg = h >> (64 - p)
            rem = h & ((1 << (64 - p)) - 1)
            rank = (64 - p) - rem.bit_length() + 1
            M[reg] = max(M[reg], rank)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / sum(2.0 ** -r for r in M)
        zeros = M.count(0)
        if e <= 2.5 * m and zeros > 0:
            e = m * math.log(m / zeros)
        rows.append((et, int(round(e)), int(users.nunique())))
    return pd.DataFrame(rows, columns=["event_type", "n_users_approx",
                                       "n_users_exact"]).astype(
        {"n_users_approx": "int64", "n_users_exact": "int64"})


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 log_to_driver=False)

    only = set(sys.argv[1:]) or None

    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas()

    g_simhash = oracle_simhash(docs)
    g_minhash = oracle_minhash_pairs(docs)
    goldens = {
        "rolling_fingerprint": oracle_rolling(docs),
        "simhash": g_simhash,
        "simhash_near_dup": oracle_simhash_near_dup(g_simhash),
        "minhash_lsh_dedup": g_minhash,
        "dup_clusters": oracle_dup_clusters(docs, g_minhash),
        "name_dup_clusters": oracle_name_dup_clusters(SF_DIR),
        "approx_distinct_users": oracle_approx_distinct_users(SF_DIR),
        "approx_distinct_by_type": oracle_approx_distinct_by_type(SF_DIR),
        "ann_lsh_topk": oracle_ann_lsh(emb),
        "ann_ivf_topk": oracle_ann_ivf(emb),
        "embed_clusters": oracle_embed_clusters(emb),
    }
    if only:
        goldens = {k: v for k, v in goldens.items() if k in only}

    # cross-check against the live engine before writing anything
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    q = m.queries()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].reset_index(drop=True)
        return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)

    for name, want in goldens.items():
        got = q[name](SF_DIR)
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=True)
        print(f"engine == spec oracle: {name} ({len(want)} rows)")

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, want in goldens.items():
        pq.write_table(pa.Table.from_pandas(want, preserve_index=False),
                       f"{GOLDEN_DIR}/{name}.parquet")
    print(f"goldens written to {GOLDEN_DIR}")
    ray.shutdown()


if __name__ == "__main__":
    main()
