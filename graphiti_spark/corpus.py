"""Deterministic synthetic-corpus constants.

The BASELINE.json input is an Iceberg-shaped table
``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)`` of
interleaved text+media documents. Per FIXTURES.md §1 we synthesize it
deterministically from ``documents.parquet``'s ``doc_id`` (seed is the
arithmetic itself — no RNG), with templated sentences so triple
extraction has an exact oracle:

    "<Speaker>: <EntityA> <predicate-phrase> <EntityB> since <year>."

Every constant here is shared by BOTH derivation paths:

1. ``synth.synthesize_episodes`` — Spark column expressions building the
   spans table;
2. ``oracle.py`` — DuckDB SQL strings regenerating the expected output
   of each pipeline stage independently.

The entity pool contains deliberate near-duplicates ("Acme Corp" /
"Acme Corporation", "J. Smith" / "John Smith" — FIXTURES.md §1) that the
resolver must merge WITHOUT being told the mapping (it only gets
similarity scoring + LSH + connected components), and one hot entity
(index 0, ~20%% of docs — exercises skew handling).

Mirrors the reference's test corpora: tests/test_graphiti_int.py:83-122
(Alice-likes-Bob), tests/utils/maintenance/test_temporal_operations_int.py
(LIKES vs DISLIKES, WORKS_FOR vs LEFT_JOB contradiction matrix).
"""

from __future__ import annotations

# Speakers (message-source episodes render "Speaker: body" lines,
# reference graphiti_core/nodes.py:63-67). Speaker-first extraction rule:
# the speaker is always an extracted entity (prompts/extract_nodes.py).
SPEAKERS = ["Alice", "Bob", "Carol", "Dave", "Erin", "Frank"]

# Entity pool. Index 0 is the hot key. (1,2), (3,4), (5,6) are
# near-duplicate pairs the resolver must merge.
ENTITIES = [
    "Globex",              # 0 — hot entity, ~20% of all facts
    "Acme Corp",           # 1 ┐ near-dup pair
    "Acme Corporation",    # 2 ┘
    "John Smith",          # 3 ┐ near-dup pair
    "J. Smith",            # 4 ┘
    "Initech",             # 5 ┐ near-dup pair
    "Initech Inc",         # 6 ┘
    "Umbrella",
    "Stark Industries",
    "Wayne Enterprises",
    "Hooli",
    "Pied Piper",
    "Vandelay",
    "Wonka Works",
    "Tyrell",
    "Cyberdyne",
    "Soylent",
    "Massive Dynamic",
    "Aperture Labs",
    "Black Mesa",
]
N_ENTITIES = len(ENTITIES)

# Canonical member of each duplicate cluster = min by (len(name), name).
# This is the ground truth the resolver must REDISCOVER via scoring.
CANONICAL = {
    "Acme Corporation": "Acme Corp",
    "John Smith": "J. Smith",
    "Initech Inc": "Initech",
}

# (PREDICATE, surface phrase). SCREAMING_SNAKE_CASE predicates per the
# reference's extract_edges contract (prompts/extract_edges.py:26,111).
# Ordering note: contradicting pairs sit 4 apart (0↔4, 1↔5) so the
# pred = (3d+5j) % 8 arithmetic (which fixes pred mod 4 per endpoint
# pair) can actually emit BOTH members of a pair for the same endpoints
# — otherwise the corpus would never exercise cross-predicate
# invalidation (T1/T2).
PREDICATES = [
    ("WORKS_FOR", "works for"),
    ("LIKES", "likes"),
    ("LOCATED_IN", "is located in"),
    ("PARTNERED_WITH", "partnered with"),
    ("LEFT_JOB", "left"),
    ("DISLIKES", "dislikes"),
    ("ACQUIRED", "acquired"),
    ("CEO_OF", "is the CEO of"),
]
N_PREDICATES = len(PREDICATES)

# Contradiction pairs (symmetric): a newer fact with predicate P between
# the same endpoint pair invalidates an older fact with predicate Q.
# Mirrors the scenario matrix of test_temporal_operations_int.py:94-264
# (LIKES vs DISLIKES; WORKS_FOR vs LEFT_JOB) — there decided by LLM,
# here a deterministic relation. Same-predicate facts with different
# valid_at also contradict (a fact supersedes its own older version).
CONTRADICTS = [
    ("LIKES", "DISLIKES"),
    ("DISLIKES", "LIKES"),
    ("WORKS_FOR", "LEFT_JOB"),
    ("LEFT_JOB", "WORKS_FOR"),
]

N_GROUPS = 4               # group_id = 'g' || (doc_id % 4)
BASE_YEAR = 2015           # fact years span BASE_YEAR .. BASE_YEAR+9
HOT_EVERY = 5              # (doc_id + j) % 5 == 0 → subject is ENTITIES[0]
MEDIA_K = [2, 3, 5]        # media after every k-th text span, k = MEDIA_K[(doc_id // 3) % 3]
MEDIA_TRAILER_EVERY = 7    # doc_id % 7 == 0 → one trailing media span

# Fixed batch/system time (never now(): determinism + replay, SURVEY §7).
BATCH_TIME = "2025-01-01 00:00:00"
EPISODE_EPOCH = "2024-01-01 00:00:00"  # episode valid_at = epoch + doc_id minutes


def fact_params(doc_id: int, j: int) -> dict:
    """Pure-Python mirror of the synthesis arithmetic (used by tests).

    The same formulas are written as Spark column expressions in
    ``synth.py`` and as SQL in ``oracle.py`` — keep all three in sync.
    """
    subj = 0 if (doc_id + j) % HOT_EVERY == 0 else (doc_id * 7 + j * 13) % N_ENTITIES
    obj = (doc_id * 11 + j * 17 + 1) % N_ENTITIES
    if obj == subj:
        obj = (obj + 1) % N_ENTITIES
    pred = (doc_id * 3 + j * 5) % N_PREDICATES
    # year uses doc_id // 16 so it varies WITHIN the residue class that
    # fixes the triple identity (everything else is mod-20/mod-8 of
    # (d, j)) — otherwise every repeated triple would share one year and
    # no contradiction would ever fire.
    year = BASE_YEAR + (doc_id // 16 + 3 * j) % 10
    speaker = (doc_id + j) % len(SPEAKERS)
    return {
        "subj_idx": subj,
        "obj_idx": obj,
        "pred_idx": pred,
        "year": year,
        "speaker_idx": speaker,
    }


def n_facts(doc_id: int) -> int:
    return 1 + doc_id % 3


def sentence(doc_id: int, j: int) -> str:
    p = fact_params(doc_id, j)
    return (
        f"{SPEAKERS[p['speaker_idx']]}: {ENTITIES[p['subj_idx']]} "
        f"{PREDICATES[p['pred_idx']][1]} {ENTITIES[p['obj_idx']]} since {p['year']}."
    )


def doc_id_str(doc_id: int) -> str:
    return f"doc-{doc_id:06d}"


def spans_for_doc(doc_id: int) -> list[dict]:
    """Pure-Python ground truth for the span sequence of one doc —
    the test-side mirror of ``synth.synthesize_episodes``."""
    import hashlib

    k = MEDIA_K[(doc_id // 3) % len(MEDIA_K)]
    seq: list[dict] = []
    for i in range(1, n_facts(doc_id) + 1):
        seq.append({"kind": "text", "text": sentence(doc_id, i - 1)})
        if i % k == 0:
            seq.append({"kind": "media", "text": ""})
    if doc_id % MEDIA_TRAILER_EVERY == 0:
        seq.append({"kind": "media", "text": ""})
    out = []
    for off, s in enumerate(seq):
        ref = ""
        if s["kind"] == "media":
            h = hashlib.md5(f"{doc_id_str(doc_id)}:{off}".encode()).hexdigest()
            ref = "img://" + h[:12]
        out.append(
            {"kind": s["kind"], "text": s["text"], "media_ref": ref, "offset": off}
        )
    return out
