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


# The engine token-hash key, pinned EXPLICITLY (pandas' documented
# 16-byte default).  Relying on the library default would silently
# shift every persisted signature if a pandas upgrade or a
# mixed-version cluster changed it; passing it makes the contract
# ours.  TOKEN_HASH_SENTINEL is hash_tokens(["a"])[0] under this key —
# persisted store/index manifests record it and verify at read time.
TOKEN_HASH_KEY = "0123456789123456"
TOKEN_HASH_SENTINEL = 13950350942979735504


def hash_tokens(tokens) -> np.ndarray:
    """Vectorized 64-bit hashes of a sequence of token strings.

    pandas' C siphash over the object array with the EXPLICIT
    :data:`TOKEN_HASH_KEY` (deterministic across processes, workers
    and pandas versions; measured ~4× faster than per-token blake2b
    and free of per-call Python overhead).  This IS the engine's
    token-hash contract for the hashing embedder, SimHash and
    word-n-gram kernels (round 3 switched them from per-token
    ``stable_hash64``; embeddings / signatures changed once,
    expectations regenerated with it).
    """
    if len(tokens) == 0:
        return np.empty(0, dtype=np.uint64)
    from pandas.util import hash_array

    return hash_array(np.asarray(tokens, dtype=object), categorize=False,
                      hash_key=TOKEN_HASH_KEY)


def token_hash_fingerprint() -> int:
    """The sentinel value persisted alongside stores/indexes so a
    reader on a different installation detects token-hash drift
    instead of silently mis-bucketing queries."""
    return int(hash_tokens(["a"])[0])


def md5_hex_batch(texts) -> np.ndarray:
    """Vector of md5 hex digests (object array) for an iterable of str."""
    return np.array([hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts], dtype=object)


_SHINGLE_BASE = np.uint64(1099511628211)  # FNV-64 prime


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized uint64 (wraparound arithmetic)."""
    with np.errstate(over="ignore"):
        h = h.copy()
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """UNIQUE 64-bit hashes of the k-byte shingles of normalized text,
    as a sorted uint64 array.

    Vectorized: one numpy rolling polynomial hash + splitmix64 mix per
    document (no per-shingle digest calls) — deterministic across
    workers/processes.  Returns ``np.unique(h)`` directly: the old
    ``set(h.tolist())`` round-trip (and the ``np.fromiter`` re-pack in
    the signature stage) was pure Python overhead in the #1 bench
    pipeline; the hash VALUES are unchanged.
    """
    t = " ".join(text.split()).lower()
    if not t:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(b) < k:
        return np.array([stable_hash64(t)], dtype=np.uint64)
    with np.errstate(over="ignore"):
        weights = np.empty(k, dtype=np.uint64)
        weights[0] = 1
        for i in range(1, k):
            weights[i] = weights[i - 1] * _SHINGLE_BASE  # wraps mod 2^64
        windows = np.lib.stride_tricks.sliding_window_view(b, k)
        h = _mix64((windows * weights[None, ::-1]).sum(axis=1, dtype=np.uint64))
    return np.unique(h)


def word_ngrams(text: str, n: int = 3) -> set[str]:
    toks = text.lower().split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


class MinHasher:
    """num_perm-permutation MinHash over 64-bit shingle hashes.

    Permutation family h_i(x) = mix(a_i·x + b_i) in uint64 wraparound
    arithmetic (multiply–shift–xor; division-free — uint64 ``%`` is an
    integer divide and dominates at batch scale), seeded — identical
    signatures on every worker.  Vectorized: one
    ``(num_perm, n_shingles)`` numpy pass per chunk.
    """

    def __init__(self, num_perm: int = 64, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        # odd multipliers → bijective multiply mod 2^64
        self.a = (rng.randint(0, 2**62, size=num_perm, dtype=np.int64).astype(np.uint64)
                  << np.uint64(1)) | np.uint64(1)
        self.b = rng.randint(0, 2**62, size=num_perm, dtype=np.int64).astype(np.uint64)

    def _hash_matrix(self, x: np.ndarray) -> np.ndarray:
        """(num_perm, len(x)) permuted values, uint64 wraparound."""
        with np.errstate(over="ignore"):
            v = self.a[:, None] * x[None, :]
            v += self.b[:, None]
            v ^= v >> np.uint64(29)
            v *= np.uint64(0xFF51AFD7ED558CCD)
            v ^= v >> np.uint64(32)
        return v

    def signature(self, shingle_hashes) -> np.ndarray:
        """Signature of one doc's shingle hashes (uint64 array or any
        iterable of ints)."""
        if isinstance(shingle_hashes, np.ndarray):
            x = shingle_hashes.astype(np.uint64, copy=False)
        else:
            x = np.fromiter(shingle_hashes, dtype=np.uint64)
        if not len(x):
            return np.zeros(self.num_perm, dtype=np.uint64)
        return self._hash_matrix(x).min(axis=1)

    def signatures_concat(self, all_hashes: np.ndarray, starts: np.ndarray) -> np.ndarray:
        """Signatures for MANY docs at once: ``all_hashes`` is the
        concatenation of every doc's shingle hashes, ``starts`` the
        per-doc start offsets.  One hash matrix +
        ``np.minimum.reduceat`` → (n_docs, num_perm).  Empty docs must
        be filtered by the caller."""
        v = self._hash_matrix(all_hashes)
        return np.minimum.reduceat(v, starts, axis=1).T

    def band_keys_matrix(self, sigs: np.ndarray, num_bands: int) -> np.ndarray:
        """Band keys for a (n_docs, num_perm) signature matrix →
        (n_docs, num_bands) uint64."""
        rows = self.num_perm // num_bands
        with np.errstate(over="ignore"):
            chunks = sigs[:, : num_bands * rows].reshape(len(sigs), num_bands, rows)
            weights = np.empty(rows, dtype=np.uint64)
            weights[0] = 1
            for i in range(1, rows):
                weights[i] = weights[i - 1] * _SHINGLE_BASE
            combined = (chunks * weights[None, None, :]).sum(axis=2, dtype=np.uint64)
            combined += (np.arange(num_bands, dtype=np.uint64)
                         * np.uint64(0x9E3779B97F4A7C15))[None, :]
        return _mix64(combined)

    def bands(self, sig: np.ndarray, num_bands: int) -> list[int]:
        """LSH band keys: mixed polynomial combine per band (vectorized,
        no string building)."""
        rows = self.num_perm // num_bands
        with np.errstate(over="ignore"):
            chunks = sig[: num_bands * rows].reshape(num_bands, rows)
            weights = np.empty(rows, dtype=np.uint64)
            weights[0] = 1
            for i in range(1, rows):
                weights[i] = weights[i - 1] * _SHINGLE_BASE
            combined = (chunks * weights[None, :]).sum(axis=1, dtype=np.uint64)
            combined += np.arange(num_bands, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return _mix64(combined).tolist()


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


def jaccard(a, b) -> float:
    """Jaccard similarity of two collections of unique hashables
    (sets, or the unique uint64 arrays :func:`char_shingles` returns).

    Mixed/unsorted/non-unique inputs are normalized on the array
    branch: ``np.asarray(set)`` yields a useless 0-d object array and
    ``intersect1d(assume_unique=True)`` miscounts duplicates, so
    anything that is not already an ndarray goes through
    ``np.fromiter`` and both sides through ``np.unique`` unless they
    came from char_shingles (already unique-sorted uint64)."""
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        def _norm(x):
            if isinstance(x, np.ndarray):
                # char_shingles returns unique-sorted uint64; anything
                # else (caller-built array) gets deduped defensively
                return x if x.dtype == np.uint64 else np.unique(x)
            return np.unique(np.fromiter(x, dtype=np.uint64, count=len(x)))
        a, b = _norm(a), _norm(b)
        if not len(a) and not len(b):
            return 1.0
        if not len(a) or not len(b):
            return 0.0
        inter = len(np.intersect1d(a, b, assume_unique=True))
        return inter / (len(a) + len(b) - inter)
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
