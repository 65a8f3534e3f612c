"""Driver-side micro-batch resolution kernels — byte-identical to the
distributed path, zero Spark jobs for the compute.

A micro-batch's restricted entity space is tiny (hundreds of names),
but the distributed `incremental_resolve` pays ~8 driver-synchronous
Spark jobs of pure scheduling latency to process it — the dominant
per-batch fixed cost (round-3/4 profiles). When the batch and its
collided neighborhood fit configured caps, the SAME pipeline — LSH
banding, candidate pairs, Jaro-Winkler + trigram-cosine scoring,
union-find components, canonical pick, deltas — runs as plain Python
over the collected rows, leaving only the bounded index/neighborhood
lookups as Spark jobs.

Byte-identical by construction, pinned by tests:
- hashes: :mod:`..functions.xxh64` is bit-exact with ``F.xxhash64``
  (tests/test_xxh64.py) — minhash band keys, kpart and upart buckets
  reproduce the stored index's values exactly;
- shingles / representative pick: Python string ops mirror the
  Catalyst expressions (UTF-8 byte order == code-point order, so
  Python ``<`` on str equals Spark's binary string comparison;
  ``len`` == ``F.length`` in code points);
- scoring: the pandas kernels (``jaro_winkler``, ``_embed_batch``)
  ARE the Python functions the Spark UDFs call, and the cosine is the
  same left-fold over float32→float64 casts as the ``F.aggregate``
  column expression (same order, same IEEE ops);
- components: the same min-root union-find the distributed
  ``connected_components`` uses on its driver fast path.

Reference semantics being preserved: bulk node dedup
(graphiti_core/utils/bulk_utils.py:291-375) and uuid-map compression
(bulk_utils.py:400-409), restricted to the batch neighborhood.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from itertools import combinations

from ..functions.minhash import BAND_SIZE, NUM_HASHES, SHINGLE_K
from ..functions.xxh64 import xxh64_chain, xxh64_string

# Caps above which incremental_resolve falls back to the distributed
# path. Sized so the worst-case driver compute (minhash over unique
# shingles) stays well under one Spark job's scheduling latency.
DRIVER_RESOLVE_NAMES_CAP = 2_000     # distinct batch surface forms
DRIVER_NEIGHBORHOOD_CAP = 5_000      # stored neighborhood rows
DRIVER_PAIR_CAP = 100_000            # LSH candidate pairs


class FallbackToSpark(Exception):
    """Raised when a cap is exceeded mid-path; the caller re-runs the
    distributed implementation."""


def entity_uuid_py(group_id: str, name: str) -> str:
    """Python mirror of ``schemas.entity_uuid``:
    sha2('entity|' group '|' lower(name))."""
    return hashlib.sha256(
        f"entity|{group_id}|{name.lower()}".encode("utf-8")
    ).hexdigest()


def upart_py(uuid: str, n_parts: int = 64) -> int:
    """Python mirror of ``incremental.upart_col`` (pmod(xxhash64, n))."""
    return xxh64_string(uuid) % n_parts


def shingles_py(name: str, k: int = SHINGLE_K) -> frozenset[str]:
    """Python mirror of ``minhash.shingles``: distinct lowercase
    character k-grams of ' '||name||' ' (substr is code-point based and
    tolerates short tails, exactly like Catalyst substr)."""
    padded = f" {name.lower()} "
    upper = max(len(padded) - (k - 1), 1)
    return frozenset(padded[i : i + k] for i in range(upper))


class _MinhashMemo:
    """Per-call memo: each unique shingle hashes once per seed."""

    def __init__(self, num_hashes: int = NUM_HASHES) -> None:
        self.num_hashes = num_hashes
        self._memo: dict[str, list[int]] = {}

    def hashes(self, shingle: str) -> list[int]:
        h = self._memo.get(shingle)
        if h is None:
            h = [
                xxh64_string(f"{seed}|{shingle}")
                for seed in range(self.num_hashes)
            ]
            self._memo[shingle] = h
        return h


def band_rows_py(
    name: str,
    memo: _MinhashMemo,
    num_hashes: int = NUM_HASHES,
    band_size: int = BAND_SIZE,
) -> list[tuple[int, int, int]]:
    """Python mirror of ``incremental.entity_band_rows`` for one name:
    [(band, key, kpart)]. Signature mins are SIGNED int64 like Spark's
    LongType min; the band key chains the band's minhashes through
    ``xxhash64`` exactly as the generated SQL does; kpart =
    pmod(xxhash64(band:int, key:long), 64)."""
    sh = shingles_py(name)
    per_seed = [memo.hashes(g) for g in sh]
    sig = [min(h[s] for h in per_seed) for s in range(num_hashes)]
    out = []
    for b in range(num_hashes // band_size):
        key = xxh64_chain(
            [("long", sig[b * band_size + j]) for j in range(band_size)]
        )
        kpart = xxh64_chain([("int", b), ("long", key)]) % 64
        out.append((b, key, kpart))
    return out


def local_distinct_entities(
    rows: list[tuple[str, str]],
) -> list[tuple[str, str, str]]:
    """Python mirror of ``resolve.distinct_entities``: one vertex per
    (group_id, lower(name)); representative = min by (length, name)
    (Python tuple order == Spark struct order: code-point string
    comparison equals UTF-8 binary comparison). Returns
    [(group_id, uuid, name)]."""
    best: dict[tuple[str, str], tuple[int, str]] = {}
    for g, name in rows:
        k = (g, name.lower())
        cand = (len(name), name)
        if k not in best or cand < best[k]:
            best[k] = cand
    return [
        (g, entity_uuid_py(g, name), name)
        for (g, _k), (_l, name) in sorted(best.items())
    ]


def _dot_fold(va, vb) -> float:
    """Same left-fold the ``similarity.dot`` column expression runs:
    per-element float32→float64 cast, multiply, sequential add."""
    acc = 0.0
    for x, y in zip(va, vb):
        acc += float(x) * float(y)
    return acc


def local_duplicate_pairs(
    vertices: list[tuple[str, str, str]],
    memo: _MinhashMemo,
    jw_threshold: float,
    cos_threshold: float,
    pair_cap: int = DRIVER_PAIR_CAP,
) -> list[tuple[str, str, str]]:
    """Python mirror of ``resolve.duplicate_pairs``: LSH bucket
    blocking → distinct unordered candidate pairs → Jaro-Winkler +
    trigram-cosine thresholds. vertices: [(group_id, uuid, name)];
    returns [(group_id, id_a, id_b)] with id_a < id_b."""
    from ..functions.similarity import EMBED_DIM, _embed_batch, jaro_winkler

    buckets: dict[tuple[str, int, int], list[int]] = defaultdict(list)
    for i, (g, _uuid, name) in enumerate(vertices):
        for band, key, _kp in band_rows_py(name, memo):
            buckets[(g, band, key)].append(i)

    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        for i, j in combinations(members, 2):
            a, b = (
                (i, j) if vertices[i][1] < vertices[j][1] else (j, i)
            )
            cand.add((a, b))
            if len(cand) > pair_cap:
                raise FallbackToSpark("candidate pairs over cap")

    if not cand:
        return []
    import pandas as pd

    names = [v[2] for v in vertices]
    # cheap JW gate first; embed ONLY the pair members that survive it
    # (the same don't-carry-vectors-you-don't-need rule as the
    # distributed hyperplane paths)
    jw_pass = [
        (a, b)
        for a, b in cand
        if jaro_winkler(names[a].lower(), names[b].lower()) >= jw_threshold
    ]
    if not jw_pass:
        return []
    need = sorted({i for ab in jw_pass for i in ab})
    embs = dict(
        zip(need, _embed_batch(pd.Series([names[i] for i in need]), EMBED_DIM))
    )
    return [
        (vertices[a][0], vertices[a][1], vertices[b][1])
        for a, b in jw_pass
        if _dot_fold(embs[a], embs[b]) >= cos_threshold
    ]


def local_components(
    vertex_uuids: list[str], pairs: list[tuple[str, str]]
) -> dict[str, str]:
    """Python mirror of ``resolve.connected_components``' driver
    union-find: component = min uuid of the connected component
    (min-root unions keep the tree root at the component minimum)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {u: find(u) for u in vertex_uuids}


def local_build_uuid_map(
    vertices: list[tuple[str, str, str]], comp: dict[str, str]
) -> list[tuple[str, str, str, str, str]]:
    """Python mirror of ``resolve.build_uuid_map``: canonical = min by
    (length, name) member of each component. Returns
    [(group_id, uuid, name, canonical_uuid, canonical_name)]."""
    canon: dict[str, tuple[tuple[int, str], str, str]] = {}
    for g, uuid, name in vertices:
        c = comp[uuid]
        cand = ((len(name), name), uuid, name)
        if c not in canon or cand[0] < canon[c][0]:
            canon[c] = cand
    return [
        (g, uuid, name, canon[comp[uuid]][1], canon[comp[uuid]][2])
        for g, uuid, name in vertices
    ]
