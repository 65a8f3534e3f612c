"""DuckDB oracle SQL — independent re-derivation of every stage.

Each function returns ANSI SQL (DuckDB dialect) that recomputes a
pipeline stage's expected output directly from ``documents`` (the
pre-registered parquet view), using the same corpus arithmetic as
``synth.py``/``corpus.py`` but NONE of the engine code paths: the
engine parses sentences with a regex extractor, scores names with
JW+cosine, propagates components, and window-merges intervals — the
oracle just *generates* the ground truth. Agreement between the two is
therefore a real end-to-end check, not a tautology.

Keep the arithmetic in sync with ``corpus.fact_params`` /
``synth._sentence`` (three mirrors: python, Spark columns, SQL).
"""

from __future__ import annotations

from . import corpus
from .operators.temporal import predicate_class_map


def _sql_list(values: list[str]) -> str:
    inner = ", ".join("'" + v.replace("'", "''") + "'" for v in values)
    return f"[{inner}]"


ENTITIES = _sql_list(corpus.ENTITIES)
PHRASES = _sql_list([p for _, p in corpus.PREDICATES])
PREDS = _sql_list([n for n, _ in corpus.PREDICATES])
SPEAKERS = _sql_list(corpus.SPEAKERS)

N_E = corpus.N_ENTITIES
N_P = corpus.N_PREDICATES
N_S = len(corpus.SPEAKERS)


def _canon_values() -> str:
    rows = ", ".join(f"('{k}', '{v}')" for k, v in corpus.CANONICAL.items())
    return f"(VALUES {rows}) AS cm(src, tgt)"


# Group-local canonicalization: a surface form maps to its cluster
# canonical ONLY if that canonical form is itself mentioned in the same
# group — otherwise the lone variant is its own canonical (the engine
# discovers components from observed mentions; a singleton component
# canonicalizes to itself).
CANON_CTE = f"""
present AS (
  SELECT DISTINCT group_id, name FROM (
    SELECT group_id, speaker AS name FROM facts WHERE subj_name <> obj_name
    UNION ALL SELECT group_id, subj_name FROM facts WHERE subj_name <> obj_name
    UNION ALL SELECT group_id, obj_name FROM facts WHERE subj_name <> obj_name
  )
),
canon_map AS (
  SELECT p.group_id, p.name,
    CASE WHEN cm.tgt IS NOT NULL
          AND EXISTS (SELECT 1 FROM present q
                      WHERE q.group_id = p.group_id AND q.name = cm.tgt)
         THEN cm.tgt ELSE p.name END AS canonical_name
  FROM present p LEFT JOIN {_canon_values()} ON p.name = cm.src
)"""


def _class_case(col: str) -> str:
    whens = "".join(
        f" WHEN '{p}' THEN '{c}'" for p, c in predicate_class_map().items()
    )
    return f"(CASE {col}{whens} ELSE {col} END)"


# Raw fact parameters per (doc, j) — the shared root CTE.
FACTS_CTE = f"""
docs AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
jj AS (
  SELECT d, CAST(u.j AS BIGINT) AS j
  FROM docs, UNNEST(generate_series(0, CAST(d % 3 AS INT))) AS u(j)
),
params AS (
  SELECT d, j,
    CASE WHEN (d + j) % {corpus.HOT_EVERY} = 0 THEN 0
         ELSE (d*7 + j*13) % {N_E} END AS subj0,
    (d*11 + j*17 + 1) % {N_E} AS obj00,
    (d*3 + j*5) % {N_P} AS pred_i,
    {corpus.BASE_YEAR} + (d // 16 + 3*j) % 10 AS yr,
    (d + j) % {N_S} AS spk
  FROM jj
),
p2 AS (
  SELECT *, CASE WHEN obj00 = subj0 THEN (obj00 + 1) % {N_E} ELSE obj00 END AS obj0
  FROM params
),
facts AS (
  SELECT
    'doc-' || lpad(CAST(d AS VARCHAR), 6, '0') AS doc_id,
    'g' || CAST(d % {corpus.N_GROUPS} AS VARCHAR) AS group_id,
    d, j,
    list_extract({SPEAKERS}, CAST(spk AS INT) + 1) AS speaker,
    list_extract({ENTITIES}, CAST(subj0 AS INT) + 1) AS subj_name,
    list_extract({PREDS}, CAST(pred_i AS INT) + 1) AS predicate,
    list_extract({PHRASES}, CAST(pred_i AS INT) + 1) AS phrase,
    list_extract({ENTITIES}, CAST(obj0 AS INT) + 1) AS obj_name,
    make_timestamp(CAST(yr AS INT), 1, 1, 0, 0, 0) AS valid_at
  FROM p2
)"""

# Canonicalized + deduped edges with provenance counts.
EDGES_CTE = f"""{FACTS_CTE},
{CANON_CTE},
canon AS (
  SELECT f.doc_id, f.group_id,
    cs.canonical_name AS subj_name,
    f.predicate, f.phrase,
    co.canonical_name AS obj_name,
    f.valid_at
  FROM facts f
  JOIN canon_map cs ON cs.group_id = f.group_id AND cs.name = f.subj_name
  JOIN canon_map co ON co.group_id = f.group_id AND co.name = f.obj_name
  WHERE cs.canonical_name <> co.canonical_name
),
dedup AS (
  SELECT group_id, subj_name, predicate, obj_name, valid_at,
    MIN(phrase) AS phrase,
    COUNT(DISTINCT doc_id) AS n_episodes,
    COUNT(*) AS n_mentions
  FROM canon
  GROUP BY 1, 2, 3, 4, 5
),
classed AS (
  SELECT *,
    {_class_case('predicate')} AS pred_class,
    least(subj_name, obj_name) || '~' || greatest(subj_name, obj_name) AS pair
  FROM dedup
),
nxt AS (
  SELECT group_id, pair, pred_class, valid_at,
    lead(valid_at) OVER (PARTITION BY group_id, pair, pred_class ORDER BY valid_at)
      AS next_valid_at
  FROM (SELECT DISTINCT group_id, pair, pred_class, valid_at FROM classed)
),
edges AS (
  SELECT c.group_id, c.subj_name, c.predicate, c.obj_name, c.valid_at,
    n.next_valid_at AS invalid_at,
    CASE WHEN n.next_valid_at IS NOT NULL
         THEN TIMESTAMP '{corpus.BATCH_TIME}' END AS expired_at,
    c.subj_name || ' ' || c.phrase || ' ' || c.obj_name || ' since ' ||
      CAST(year(c.valid_at) AS VARCHAR) || '.' AS fact,
    c.n_episodes, c.n_mentions
  FROM classed c
  JOIN nxt n USING (group_id, pair, pred_class, valid_at)
)"""


# Expected interleaved span sequence, reusable by every span-level
# oracle: defines all_spans(doc_id, "offset", kind, text, media_ref).
# Text span i (1-based) sits at offset (i-1) + (i-1)//k; the media
# span following text span i (k | i) at offset i + (i-1)//k; the
# trailer (d % 7 == 0) after all base spans.
SPANS_CTE = f"""{FACTS_CTE},
cfg AS (
  SELECT d, 1 + d % 3 AS n,
    list_extract({_sql_list([str(k) for k in corpus.MEDIA_K])},
                 CAST((d // 3) % {len(corpus.MEDIA_K)} AS INT) + 1)::INT AS k,
    'doc-' || lpad(CAST(d AS VARCHAR), 6, '0') AS doc_id
  FROM docs
),
tj AS (
  SELECT cfg.*, CAST(u.i AS INT) AS i
  FROM cfg, UNNEST(generate_series(1, CAST(n AS INT))) AS u(i)
),
text_spans AS (
  SELECT tj.doc_id, 'text' AS kind, (i - 1) + (i - 1) // k AS "offset",
    f.speaker || ': ' || f.subj_name || ' ' || f.phrase || ' ' || f.obj_name ||
      ' since ' || CAST(year(f.valid_at) AS VARCHAR) || '.' AS text
  FROM tj JOIN facts f ON f.d = tj.d AND f.j = tj.i - 1
),
media_spans AS (
  SELECT doc_id, 'media' AS kind, i + (i - 1) // k AS "offset", '' AS text
  FROM tj WHERE i % k = 0
),
trailer AS (
  SELECT doc_id, 'media' AS kind, CAST(n + n // k AS INT) AS "offset", '' AS text
  FROM cfg WHERE d % {corpus.MEDIA_TRAILER_EVERY} = 0
),
span_union AS (
  SELECT * FROM text_spans UNION ALL SELECT * FROM media_spans
  UNION ALL SELECT * FROM trailer
),
all_spans AS (
  SELECT doc_id, CAST("offset" AS INT) AS "offset", kind, text,
    CASE WHEN kind = 'media'
         THEN 'img://' || substr(md5(doc_id || ':' || CAST("offset" AS VARCHAR)), 1, 12)
         ELSE '' END AS media_ref
  FROM span_union
)"""


def q_spans() -> str:
    """Expected exploded span sequence (the input invariant surface)."""
    return f"""
WITH {SPANS_CTE}
SELECT doc_id, "offset", kind, text, media_ref FROM all_spans
"""


def q_triples_raw() -> str:
    return f"""
WITH {FACTS_CTE}
SELECT doc_id, group_id, speaker, subj_name, predicate, obj_name,
  subj_name || ' ' || phrase || ' ' || obj_name || ' since ' ||
    CAST(year(valid_at) AS VARCHAR) || '.' AS fact,
  valid_at
FROM facts
WHERE subj_name <> obj_name
"""


def q_mentions_raw() -> str:
    """Per-name raw mention doc counts (speaker-first + endpoints)."""
    return f"""
WITH {FACTS_CTE},
m AS (
  SELECT doc_id, group_id, speaker AS name FROM facts WHERE subj_name <> obj_name
  UNION ALL
  SELECT doc_id, group_id, subj_name FROM facts WHERE subj_name <> obj_name
  UNION ALL
  SELECT doc_id, group_id, obj_name FROM facts WHERE subj_name <> obj_name
)
SELECT group_id, name, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_mentions
FROM m GROUP BY 1, 2
"""


def q_uuid_map() -> str:
    """Expected canonicalization of every mentioned surface form."""
    return f"""
WITH {FACTS_CTE},
{CANON_CTE}
SELECT group_id, name, canonical_name FROM canon_map
"""


def q_nodes() -> str:
    return f"""
WITH {FACTS_CTE},
{CANON_CTE}
SELECT DISTINCT group_id, canonical_name AS name,
  sha256('entity|' || group_id || '|' || lower(canonical_name)) AS uuid
FROM canon_map
"""


def q_edges_resolved() -> str:
    """The flagship: canonical bi-temporal triples."""
    return f"""
WITH {EDGES_CTE}
SELECT group_id, subj_name, predicate, obj_name, fact, valid_at,
  invalid_at, expired_at, n_episodes
FROM edges
"""


def q_edge_invalidation_counts() -> str:
    """Aggregate view of the temporal stage (quick drift detector)."""
    return f"""
WITH {EDGES_CTE}
SELECT group_id,
  COUNT(*) AS n_edges,
  CAST(SUM(CASE WHEN invalid_at IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_invalidated
FROM edges GROUP BY 1
"""


def q_mentions_table() -> str:
    """Episode × canonical entity distinct pairs (MENTIONS edges)."""
    return f"""
WITH {FACTS_CTE},
{CANON_CTE},
m AS (
  SELECT DISTINCT r.doc_id, r.group_id, c.canonical_name AS name FROM (
    SELECT doc_id, group_id, speaker AS name FROM facts WHERE subj_name <> obj_name
    UNION ALL SELECT doc_id, group_id, subj_name FROM facts WHERE subj_name <> obj_name
    UNION ALL SELECT doc_id, group_id, obj_name FROM facts WHERE subj_name <> obj_name
  ) r
  JOIN canon_map c ON c.group_id = r.group_id AND c.name = r.name
)
SELECT doc_id, group_id, name,
  sha256('entity|' || group_id || '|' || lower(name)) AS entity_uuid
FROM m
"""


def q_episode_edges() -> str:
    """Forward pointers (episode → evidenced edge): one row per
    (doc, canonical triple) — the content of the materialized
    episode_edges index, projected onto oracle-comparable columns."""
    return f"""
WITH {EDGES_CTE}
SELECT DISTINCT c.doc_id, c.group_id, c.subj_name, c.predicate,
  c.obj_name, c.valid_at
FROM canon c
"""


def q_communities(max_iters: int = 20) -> str:
    """C1/C2 oracle: synchronous label propagation, fully unrolled.

    Exactly equivalent to ``operators.community.label_propagation``
    (community_operations.py:79-124 semantics): rounds past convergence
    are no-ops (labels are a deterministic function of labels), and an
    oscillating instance is cut at the same ``max_iters`` cap — so
    unrolling the loop as ``max_iters`` chained CTEs reproduces the
    Spark fixpoint bit-for-bit, including the (weight, label) max_by
    tie-break and the final min-member canonical id.
    """
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    # round references the previous one three times -> a 3^max_iters
    # plan explosion without it.
    rounds = []
    for i in range(1, max_iters + 1):
        rounds.append(f"""
n{i} AS (
  SELECT a.group_id, a.src, l.community AS nbr_comm, SUM(a.weight) AS w
  FROM adj a JOIN l{i - 1} l ON l.uuid = a.dst
  GROUP BY 1, 2, 3
),
b{i} AS (
  SELECT group_id, src AS uuid, nbr_comm AS new_comm FROM (
    SELECT *, row_number() OVER (
      PARTITION BY group_id, src ORDER BY w DESC, nbr_comm DESC) AS rn
    FROM n{i})
  WHERE rn = 1
),
l{i} AS MATERIALIZED (
  SELECT l.group_id, l.uuid, COALESCE(b.new_comm, l.community) AS community
  FROM l{i - 1} l LEFT JOIN b{i} b ON b.uuid = l.uuid
)""")
    return f"""
WITH {EDGES_CTE},
enodes AS (
  SELECT DISTINCT group_id, canonical_name AS name,
    sha256('entity|' || group_id || '|' || lower(canonical_name)) AS uuid
  FROM canon_map
),
pairs AS (
  SELECT group_id,
    sha256('entity|' || group_id || '|' || lower(subj_name)) AS src,
    sha256('entity|' || group_id || '|' || lower(obj_name)) AS dst
  FROM edges
),
adj AS MATERIALIZED (
  SELECT group_id, src, dst, COUNT(*) AS weight FROM (
    SELECT group_id, src, dst FROM pairs
    UNION ALL SELECT group_id, dst AS src, src AS dst FROM pairs
  ) GROUP BY 1, 2, 3
),
l0 AS MATERIALIZED (SELECT group_id, uuid, uuid AS community FROM enodes),
{", ".join(rounds)},
canon_comm AS (
  SELECT group_id, community, MIN(uuid) AS community_id
  FROM l{max_iters} GROUP BY 1, 2
)
SELECT l.group_id, l.uuid, c.community_id AS community
FROM l{max_iters} l
JOIN canon_comm c ON c.group_id = l.group_id AND c.community = l.community
"""


def q_triple_prf() -> str:
    """Per-group extraction P/R/F1 in integer micro-units — the SQL
    twin of operators/evaluate.py::triple_prf over the expected-triple
    arithmetic (FACTS_CTE). Both the "extracted" and "expected" sides
    are re-derived from the corpus arithmetic (the extracted side with
    the extractor's self-loop filter applied), so a hash match against
    the Spark side — whose extracted set comes from the REAL span-text
    extraction path — verifies extraction fidelity AND the metric
    arithmetic end to end. DuckDB ``//`` = Spark ``DIV`` (both floor),
    and every count is CAST to BIGINT before the final projection so
    no HUGEINT surfaces."""
    ks = _sql_list([str(k) for k in corpus.MEDIA_K])
    return f"""
WITH {FACTS_CTE},
cfgk AS (
  SELECT d,
    CAST(list_extract({ks}, CAST((d // 3) % {len(corpus.MEDIA_K)} AS INT) + 1) AS BIGINT) AS k
  FROM docs
),
gold AS (
  SELECT DISTINCT f.group_id, f.doc_id,
    CAST(f.j + f.j // c.k AS INT) AS off,
    f.speaker, f.subj_name, f.predicate, f.obj_name,
    CAST(year(f.valid_at) AS INT) AS yr
  FROM facts f JOIN cfgk c ON c.d = f.d
),
ext AS (SELECT * FROM gold WHERE subj_name <> obj_name),
ne AS (SELECT group_id, CAST(COUNT(*) AS BIGINT) AS n_extracted FROM ext GROUP BY 1),
ng AS (SELECT group_id, CAST(COUNT(*) AS BIGINT) AS n_expected FROM gold GROUP BY 1),
tp AS (
  SELECT e.group_id, CAST(COUNT(*) AS BIGINT) AS n_tp
  FROM ext e JOIN gold g
    ON g.group_id = e.group_id AND g.doc_id = e.doc_id AND g.off = e.off
   AND g.speaker = e.speaker AND g.subj_name = e.subj_name
   AND g.predicate = e.predicate AND g.obj_name = e.obj_name AND g.yr = e.yr
  GROUP BY 1
),
counts AS (
  SELECT COALESCE(ne.group_id, ng.group_id) AS group_id,
    CAST(COALESCE(ne.n_extracted, 0) AS BIGINT) AS n_extracted,
    CAST(COALESCE(ng.n_expected, 0) AS BIGINT) AS n_expected,
    CAST(COALESCE(tp.n_tp, 0) AS BIGINT) AS n_tp
  FROM ne
  FULL JOIN ng ON ng.group_id = ne.group_id
  LEFT JOIN tp ON tp.group_id = COALESCE(ne.group_id, ng.group_id)
)
SELECT group_id, n_extracted, n_expected, n_tp,
  CAST(CASE WHEN n_extracted > 0 THEN 1000000 * n_tp // n_extracted ELSE 0 END AS BIGINT)
    AS precision_micro,
  CAST(CASE WHEN n_expected > 0 THEN 1000000 * n_tp // n_expected ELSE 0 END AS BIGINT)
    AS recall_micro,
  CAST(CASE WHEN n_extracted + n_expected > 0
       THEN 2000000 * n_tp // (n_extracted + n_expected) ELSE 0 END AS BIGINT)
    AS f1_micro
FROM counts
"""
