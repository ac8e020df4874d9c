"""Deterministic, process-stable hashing primitives.

Everything here must be reproducible across workers, processes and
runs (Python's builtin ``hash`` is salted — never used).  md5 is used
where a DuckDB-matching oracle exists (``md5(text)``); blake2b for
internal 64-bit keys; numpy vectorized multiply-shift mixing for
MinHash / SimHash at batch scale.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAX64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def stable_hash64(s: str) -> int:
    """64-bit blake2b of a UTF-8 string (unsigned)."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def stable_bucket(s: str, n_buckets: int) -> int:
    return stable_hash64(s) % n_buckets


def md5_hex_batch(texts) -> np.ndarray:
    """Vector of md5 hex digests (object array) for an iterable of str."""
    return np.array([hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts], dtype=object)


def char_shingles(text: str, k: int = 5) -> set[int]:
    """Set of 64-bit hashes of the k-char shingles of ``text``."""
    t = " ".join(text.split()).lower()
    if len(t) < k:
        return {stable_hash64(t)} if t else set()
    out = set()
    for i in range(len(t) - k + 1):
        out.add(stable_hash64(t[i : i + k]))
    return out


def word_ngrams(text: str, n: int = 3) -> set[str]:
    toks = text.lower().split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


class MinHasher:
    """num_perm-permutation MinHash over 64-bit shingle hashes.

    Universal-hash family h_i(x) = (a_i * x + b_i) mod p (p = 2^61-1),
    seeded — identical signatures on every worker.  Vectorized: one
    ``(num_perm, n_shingles)`` numpy op per document.
    """

    def __init__(self, num_perm: int = 64, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)

    def signature(self, shingle_hashes: set[int]) -> np.ndarray:
        if not shingle_hashes:
            return np.zeros(self.num_perm, dtype=np.uint64)
        x = np.fromiter(shingle_hashes, dtype=np.uint64)
        # (a*x + b) mod p, computed in python-int-free uint64 with a
        # 128-bit-safe split: do it in object-free float-free manner via
        # modular arithmetic on uint64 (p < 2^61 so a*x can overflow;
        # use modmul via splitting x into hi/lo 32-bit halves).
        lo = x & np.uint64(0xFFFFFFFF)
        hi = x >> np.uint64(32)
        p = np.uint64(_MERSENNE)
        # a*x mod p = (a*hi mod p * 2^32 mod p + a*lo mod p) mod p
        a = self.a[:, None]
        ah = (a * hi[None, :]) % p
        ah = (ah << np.uint64(32)) % p
        al = (a * lo[None, :]) % p
        v = (ah + al + self.b[:, None]) % p
        return v.min(axis=1)

    def bands(self, sig: np.ndarray, num_bands: int) -> list[int]:
        """LSH band keys: 64-bit hash per band of the signature."""
        rows = self.num_perm // num_bands
        keys = []
        for b in range(num_bands):
            chunk = sig[b * rows : (b + 1) * rows]
            keys.append(stable_hash64(f"{b}:" + ",".join(map(str, chunk.tolist()))))
        return keys


def simhash64(token_hashes: "list[int] | np.ndarray", weights=None) -> int:
    """64-bit SimHash over token hashes (optionally weighted)."""
    if len(token_hashes) == 0:
        return 0
    arr = np.asarray(token_hashes, dtype=np.uint64)
    bits = ((arr[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    signed = bits * 2 - 1
    if weights is not None:
        signed = signed * np.asarray(weights, dtype=np.int64)[:, None]
    v = signed.sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if v[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
