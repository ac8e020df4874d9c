"""Mergeable sketches: HyperLogLog distinct counting, Bloom-filter
membership.

Sketches are THE scale pattern for aggregations whose exact form
shuffles too much (Ray guide: emit one serialized sketch per batch,
merge in a tiny second stage).  Both are deterministic (blake2b-based
hashing — identical across workers/runs).

* :class:`HyperLogLog` — standard HLL (Flajolet et al. 2007) with the
  small-range linear-counting correction; ``2^p`` registers;
  numpy-vectorized add/merge.  ``approx_distinct`` runs it as
  per-batch partial sketches → single driver merge: the shuffle moves
  ``#batches`` byte arrays instead of every value.
* :class:`BloomFilter` — k-hash bitset built from double hashing;
  ``bloom_semi_join`` broadcasts the filter and drops non-members
  inside ``map_batches`` (a pre-filter for big-side semi joins — false
  positives possible, no false negatives, so follow with an exact join
  when exactness matters).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions.hashing import _mix64


def _hash64_batch(values) -> np.ndarray:
    """Deterministic 64-bit hashes of a value array — ONE vectorized C
    siphash call per batch (the engine token-hash contract; the old
    per-row blake2b loop was the last Python row loop in a sketch hot
    path).

    Agreement contract (ADVICE r4): numeric producers of the same
    logical values agree ACROSS WIDTHS — ints are widened to int64,
    unsigned to uint64, floats to float64, bools to int64 before the
    raw-bits hash — but numeric and string representations of the
    same value (int64 42 vs ``"42"``) do NOT agree: the fast numeric
    path hashes bit patterns while non-numerics are stringified once
    (vectorized).  Feed a sketch one representation per logical
    column; partials built from the same Arrow column always satisfy
    this because blocks share a schema."""
    from ..functions.hashing import TOKEN_HASH_KEY

    from pandas.util import hash_array

    a = np.asarray(values)
    if len(a) == 0:
        return np.empty(0, dtype=np.uint64)
    kind = a.dtype.kind
    if kind in "iufb":
        # width-normalize so int32(-1) and int64(-1), or float32 and
        # float64 of the same value, land in the same register
        if kind == "u":
            a = a.astype(np.uint64, copy=False)
        elif kind == "f":
            a = a.astype(np.float64, copy=False)
        else:  # i, b
            a = a.astype(np.int64, copy=False)
        return hash_array(a, hash_key=TOKEN_HASH_KEY)
    s = pd.Series(a).astype(str).to_numpy(dtype=object)
    return hash_array(s, categorize=False, hash_key=TOKEN_HASH_KEY)


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if p == 12:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        else:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)

    def add_hashes(self, h: np.ndarray) -> None:
        w = 64 - self.p
        idx = (h >> np.uint64(w)).astype(np.int64)
        v = h & np.uint64((1 << w) - 1)  # low w bits
        # rank = leading zeros within the w-bit window + 1
        #      = w - bitlength(v) + 1;  v == 0 → w + 1
        rank = np.full(len(h), w + 1, dtype=np.uint8)
        nz = v != 0
        bitlen = np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64) + 1
        rank[nz] = (w - bitlen + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def add(self, values) -> None:
        self.add_hashes(_hash64_batch(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        E = self.alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if E <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                E = m * np.log(m / zeros)
        return float(E)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return h


def approx_distinct(ds: rd.Dataset, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): per-batch HLL partials (one
    bytes row per batch through the exchange), merged on the driver."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = HyperLogLog(p)
        h.add(batch[col].to_numpy())
        return pd.DataFrame({"sketch": [h.to_bytes()]})

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=None).to_pandas()
    merged = HyperLogLog(p)
    for b in parts["sketch"]:
        merged.merge(HyperLogLog.from_bytes(b, p))
    return merged.estimate()


def _bucket_hash(values: np.ndarray, n_buckets: int) -> np.ndarray:
    """Vectorized bucket assignment for any value dtype (int64 via the
    splitmix64 mixer, everything else via the engine token-hash).
    Only partitioning matters here — the bucket function never leaks
    into results, so it is free to differ from persisted-hash
    contracts."""
    if np.issubdtype(values.dtype, np.integer):
        h = _mix64(values.astype(np.int64).view(np.uint64))
    else:
        from ..functions.hashing import hash_tokens

        h = hash_tokens(values)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def grouped_exact_distinct(ds: rd.Dataset, group_col: str, value_col: str,
                           alias: str = "n_distinct",
                           n_buckets: int | None = None) -> rd.Dataset:
    """Exact COUNT(DISTINCT value) PER GROUP, with a bounded reduce.

    ``groupby([group, value])`` would create one reduce group per
    distinct (group, value) PAIR — the 218k-group trap (Ray's sort
    shuffle cost scales with group count).  Instead: per-batch local
    pair-dedup (combiner) → hash-bucket the VALUE into ``n_buckets``
    reduce groups (cluster-derived by default) → per-bucket vectorized
    ``groupby(group).nunique()`` → small final sum over
    ≤ ``n_buckets × n_groups`` partial rows.  Buckets partition the
    value space, so each (group, value) pair is counted in exactly one
    bucket and the per-group sums are exact.

    Measured trade (sf0.1 events, 100k rows / 7.5k pairs, 32 CPUs):
    the raw pair-groupby runs 4.2–4.8 s, this shape 5.7–6.3 s — the
    ~1.5 s is fixed per-stage overhead, NOT data volume; at the 218k+
    pair cardinalities where the raw shape collapses (31 s measured),
    the bounded reduce is the only shape that survives."""
    from ray.data.aggregate import Sum

    from .dedup import _shuffle_width

    if n_buckets is None:
        n_buckets = _shuffle_width(2.0, floor=16)

    def local_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        u = batch[[group_col, value_col]].drop_duplicates()
        bk = _bucket_hash(u[value_col].to_numpy(), n_buckets)
        return u.assign(bk=bk)

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        n = g.groupby(group_col, sort=False)[value_col].nunique()
        return pd.DataFrame({group_col: n.index, alias: n.to_numpy()})

    partials = (
        ds.map_batches(local_pairs, batch_format="pandas", batch_size=None)
        .groupby("bk")
        .map_groups(bucket_counts, batch_format="pandas")
    )
    return partials.groupby(group_col).aggregate(Sum(alias, alias_name=alias))


def exact_distinct(ds: rd.Dataset, col: str, n_buckets: int = 1024) -> int:
    """Exact COUNT(DISTINCT col), distributed and bounded.

    Per-batch local unique → hash-bucket column (bounded group count —
    a groupby on the raw value would create one reduce group per
    distinct value) → per-bucket nunique → tiny per-bucket counts
    summed on the driver.  Buckets partition the value space, so the
    sum of per-bucket distinct counts is exact."""

    def local_unique(batch: pd.DataFrame) -> pd.DataFrame:
        u = batch[col].drop_duplicates()
        h = _hash64_batch(u.to_numpy()) % np.uint64(n_buckets)
        return pd.DataFrame({col: u.to_numpy(), "bk": h.astype(np.int64)})

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [g[col].nunique()]})

    parts = (
        ds.map_batches(local_unique, batch_format="pandas",
                       batch_size=None)
        .groupby("bk")
        .map_groups(bucket_count, batch_format="pandas")
        .to_pandas()
    )
    return int(parts["n"].sum())


class BloomFilter:
    def __init__(self, n_bits: int = 1 << 20, k: int = 5):
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits // 8 + 1, dtype=np.uint8)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        # double hashing: g_i(x) = h1 + i*h2 mod n_bits
        h1 = h % np.uint64(self.n_bits)
        h2 = _mix64(h) % np.uint64(self.n_bits - 1) + np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.n_bits)).astype(np.int64)

    def add(self, values) -> None:
        pos = self._positions(_hash64_batch(values)).ravel()
        np.bitwise_or.at(self.bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))

    def contains(self, values) -> np.ndarray:
        pos = self._positions(_hash64_batch(values))
        hit = (self.bits[pos // 8] >> (pos % 8)) & 1
        return hit.all(axis=0).astype(bool)


def bloom_semi_join(ds: rd.Dataset, keys, on: str, n_bits: int = 1 << 20,
                    k: int = 5) -> rd.Dataset:
    """Semi-join pre-filter: broadcast a Bloom filter of ``keys``, keep
    rows whose ``on`` value is (probably) a member.  False positives
    pass; follow with an exact join for exactness."""
    bf = BloomFilter(n_bits, k)
    bf.add(np.asarray(list(keys)))
    ref = ray.put(bf)

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        f = ray.get(ref)
        return batch[f.contains(batch[on].to_numpy())]

    return ds.map_batches(filt, batch_format="pandas")


class CountMinSketch:
    """Count-min sketch (Cormode & Muthukrishnan 2005): a (depth ×
    width) counter matrix; point estimates overcount only (never
    under), with error ≤ e/width · N at confidence 1 − e^-depth.
    Mergeable by elementwise sum — THE shape for streaming frequency
    estimation over a corpus too wide for exact counting (the exact
    bounded-bucket ``top_tokens`` stays the exactness path).

    Hashing: one vectorized :func:`~..functions.hashing.hash_tokens`
    call per value array, then ``depth`` odd-multiplier universal
    hashes of the 64-bit value — no per-row Python."""

    # odd 64-bit multipliers (splitmix64-derived), one per row
    _MULT = np.array([0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9,
                      0x94D049BB133111EB, 0xD6E8FEB86659FD93,
                      0xA5A5A5A5A5A5A5A5 | 1, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x27D4EB2F165667C5],
                     dtype=np.uint64)

    def __init__(self, width: int = 2048, depth: int = 4):
        if depth > len(self._MULT):
            raise ValueError(f"depth must be <= {len(self._MULT)}")
        self.width, self.depth = int(width), int(depth)
        self.counts = np.zeros((depth, width), dtype=np.int64)

    def _idx(self, h: np.ndarray) -> np.ndarray:
        """(depth, n) column indices for pre-hashed uint64 values."""
        with np.errstate(over="ignore"):
            m = h[None, :] * self._MULT[:self.depth, None]
        return ((m >> np.uint64(33)) % np.uint64(self.width)).astype(np.int64)

    def add_hashes(self, h: np.ndarray, weights=None) -> None:
        idx = self._idx(h)
        w = np.ones(len(h), dtype=np.int64) if weights is None \
            else np.asarray(weights, dtype=np.int64)
        for d in range(self.depth):  # depth is 4-8: a bounded loop
            np.add.at(self.counts[d], idx[d], w)

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        idx = self._idx(h)
        return self.counts[np.arange(self.depth)[:, None], idx].min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.width, self.depth) == (other.width, other.depth)
        self.counts += other.counts
        return self

    def to_bytes(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, width: int, depth: int) -> "CountMinSketch":
        s = cls(width, depth)
        s.counts = np.frombuffer(b, dtype=np.int64).reshape(depth, width).copy()
        return s


def count_min(ds: rd.Dataset, col: str, width: int = 2048,
              depth: int = 4) -> CountMinSketch:
    """Distributed count-min sketch of a column: one partial sketch
    per block (``batch_size=None``), merged on the driver — the driver
    sees ``#blocks`` byte blobs of ``depth × width × 8`` bytes
    (4×2048 = 64 KiB), never the values.  Token hashing is the
    engine's one-C-call-per-batch contract."""
    from ..functions.hashing import hash_tokens

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        s = CountMinSketch(width, depth)
        s.add_hashes(hash_tokens(b[col].astype(str).to_numpy()))
        return pd.DataFrame({"m": [s.to_bytes()]})

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=None).to_pandas()
    out = CountMinSketch(width, depth)
    for blob in parts["m"]:
        out.merge(CountMinSketch.from_bytes(blob, width, depth))
    return out


def cms_heavy_hitters(ds: rd.Dataset, text_col: str, k: int = 20,
                      width: int = 8192, depth: int = 4,
                      candidates_per_block: int | None = None,
                      verify: bool = True) -> pd.DataFrame:
    """Heavy hitters over a token stream — the candidates-then-verify
    composition a 100 TB vocabulary needs (round-4 verdict #7).

    Exact counting of every token is a vocabulary-sized shuffle; this
    pipeline never shuffles at all:

    1. ONE fused streaming pass: each block emits its CMS partial
       (``depth × width × 8`` byte blob, weighted adds — one add call
       per distinct local token) AND its local top-``m`` tokens
       (``m = candidates_per_block``, default 4k) as candidate rows.
       The driver merges ≤ #blocks sketches and ≤ #blocks×m candidate
       rows — a global heavy hitter is a local heavy hitter in some
       block for any skewed distribution; the failure mode (a token
       spread thinly under every local cutoff) is bounded by raising
       ``candidates_per_block``.
    2. The merged sketch point-estimates every distinct candidate;
       top-k by (estimate desc, token asc) are the winners.
    3. VERIFY (``verify=True``): one more streaming pass counts
       EXACTLY the ≤k winning tokens (a broadcast membership filter —
       no vocabulary shuffle), so the output carries both the
       estimate and the exact count.

    Returns (token, est_count[, exact_count], envelope) where
    ``envelope = ceil(e/width · N)`` (N = total token occurrences) is
    the CMS error bound at confidence ``1 − e^-depth``; the sketch
    never undercounts, so ``est_count ≥ exact_count`` always and
    ``est_count − exact_count ≤ envelope`` w.h.p. — both asserted by
    tests/test_sketch.py against the exact bounded-bucket
    :func:`~.sample.top_tokens`."""
    from ..functions.hashing import hash_tokens

    m = 4 * k if candidates_per_block is None else int(candidates_per_block)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.split().explode().dropna()
        counts = toks.value_counts()  # sorted desc
        s = CountMinSketch(width, depth)
        if len(counts):
            s.add_hashes(hash_tokens(counts.index.to_numpy()),
                         weights=counts.to_numpy())
        cand = counts.head(m)
        # row 0 carries the sketch blob + the block's token total
        # (token "" is unreachable: str.split never yields empty)
        return pd.DataFrame({
            "m": [s.to_bytes()] + [b""] * len(cand),
            "token": [""] + list(cand.index),
            "n": np.concatenate(
                [[len(toks)], cand.to_numpy()]).astype(np.int64),
        })

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=None).to_pandas()
    cols = ["token", "est_count"] + (["exact_count"] if verify else []) \
        + ["envelope"]
    if not len(parts):
        return pd.DataFrame({c: [] for c in cols})
    blob_rows = parts["token"] == ""
    sk = CountMinSketch(width, depth)
    for blob in parts.loc[blob_rows, "m"]:
        sk.merge(CountMinSketch.from_bytes(blob, width, depth))
    n_total = int(parts.loc[blob_rows, "n"].sum())
    cand = parts.loc[~blob_rows, "token"].drop_duplicates().to_numpy()
    if not len(cand):
        return pd.DataFrame({c: [] for c in cols})
    est = sk.estimate_hashes(hash_tokens(cand))
    order = np.lexsort((cand, -est))[:k]
    top, top_est = cand[order], est[order]

    out = pd.DataFrame({"token": top, "est_count": top_est.astype("int64")})
    if verify:
        want = set(top)  # ≤ k strings: closure-broadcast, no shuffle

        def count_exact(b: pd.DataFrame) -> pd.DataFrame:
            toks = b[text_col].fillna("").str.split().explode().dropna()
            sub = toks[toks.isin(want)].value_counts()
            return pd.DataFrame({"token": sub.index.to_numpy(),
                                 "n": sub.to_numpy().astype(np.int64)})

        ex = ds.map_batches(count_exact, batch_format="pandas",
                            batch_size=None).to_pandas()
        exact = ex.groupby("token")["n"].sum() if len(ex) else pd.Series(
            dtype="int64")
        out["exact_count"] = exact.reindex(top).fillna(0).astype(
            "int64").to_numpy()
    out["envelope"] = np.int64(np.ceil(np.e / width * n_total))
    return out.reset_index(drop=True)


def cms_estimate(sketch: CountMinSketch, values) -> np.ndarray:
    """Point-frequency estimates for ``values`` (over-estimates only)."""
    from ..functions.hashing import hash_tokens

    return sketch.estimate_hashes(
        hash_tokens(np.asarray([str(v) for v in values], dtype=object)))
