"""DuckDB oracle SQL for the docops / search / maintenance operators.

Same contract as ``oracle.py`` (independent re-derivation; column names
and arithmetic mirrored exactly), covering:
- text analysis: token stats, quality score, language id
- dedup: exact hash, MinHash-LSH + n-gram Jaccard, SimHash, fingerprint
- similarity: BM25 over documents, brute-force cosine top-k
- rank fusion: RRF over two deterministic lanes
- graph: BFS reachability over the canonical edge graph
- maintenance: point-in-time episodes, context window, keyset
  pagination, remove-episode cascade counts

Cross-engine determinism rules used throughout:
- doubles rounded to 6 decimals AFTER identical-formula computation;
- hashes via md5 (hex digits / md5_number_lower — both engines agree);
- ties broken by id columns, never by floats alone.
"""

from __future__ import annotations

from . import corpus
from .oracle import CANON_CTE, EDGES_CTE, FACTS_CTE, _canon_values
from .operators.docops import STOPWORDS

# tokenizer macro (mirror of operators/search.py::tokenize)
def _toks(col: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), x -> x <> '')"
    )


def _sql_strlist(values: list[str]) -> str:
    return "[" + ", ".join("'" + v + "'" for v in values) + "]"


def q_token_stats() -> str:
    return f"""
WITH t AS (SELECT doc_id, text, {_toks('text')} AS toks FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
  CAST(length(text) AS BIGINT) AS n_chars,
  round(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0)
        / greatest(len(toks), 1), 6) AS avg_token_len,
  CAST(len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+')) AS BIGINT)
    AS n_bpe_tokens
FROM t
"""


def q_quality() -> str:
    en = _sql_strlist(STOPWORDS["en"])
    return f"""
WITH t AS (SELECT doc_id, text, {_toks('text')} AS toks FROM documents),
m AS (
  SELECT doc_id,
    len(list_distinct(toks)) / greatest(len(toks), 1) AS dr,
    len(list_filter(toks, t -> list_contains({en}, t)))
      / greatest(len(toks), 1) AS sr,
    len(toks) BETWEEN 10 AND 100000 AS length_ok
  FROM t
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(floor(dr * 1000000 + 0.5) AS BIGINT) AS distinct_ratio_micro,
  CAST(floor(sr * 1000000 + 0.5) AS BIGINT) AS stopword_ratio_micro,
  length_ok,
  CAST(floor((0.5 * dr + 0.3 * least(sr * 5, 1.0)
        + 0.2 * (CASE WHEN length_ok THEN 1.0 ELSE 0.0 END)) * 1000000 + 0.5)
    AS BIGINT) AS quality_micro
FROM m
"""


def q_language_id() -> str:
    langs = sorted(STOPWORDS)
    score_exprs = ",\n    ".join(
        f"len(list_filter(toks, t -> list_contains({_sql_strlist(STOPWORDS[l])}, t)))"
        f" / greatest(len(toks), 1) AS score_{l}"
        for l in langs
    )
    greatest = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN score_{l} = {greatest} THEN '{l}'" for l in langs
    ) + " END"
    rounded = ", ".join(f"round(score_{l}, 6) AS score_{l}" for l in langs)
    return f"""
WITH t AS (SELECT doc_id, {_toks('text')} AS toks FROM documents),
s AS (SELECT doc_id, {score_exprs} FROM t)
SELECT CAST(doc_id AS BIGINT) AS doc_id, {rounded}, {pred} AS lang_pred
FROM s
"""


def _gram_sql(n: int) -> str:
    """SQL mirror of docops._word_ngrams: space-joined word n-grams of
    the token list (DuckDB lists are 1-based, same as element_at)."""
    joined = " || ' ' || ".join(f"toks[i + {off}]" for off in range(n))
    return (
        f"list_transform(range(1, greatest(len(toks) - {n - 1}, 0) + 1), "
        f"i -> {joined})"
    )


def q_repetition_stats() -> str:
    micro = "CAST(floor({expr} * 1000000 + 0.5) AS BIGINT)"
    parts = []
    for n, col in ((2, "top_bigram_frac_micro"), (3, "top_trigram_frac_micro")):
        parts.append(
            f"""g{n} AS (
  SELECT doc_id, unnest({_gram_sql(n)}) AS gram FROM t),
c{n} AS (SELECT doc_id, gram, count(*) AS cnt FROM g{n} GROUP BY 1, 2),
m{n} AS (SELECT doc_id,
  {micro.format(expr='max(cnt) * 1.0 / sum(cnt)')} AS {col}
  FROM c{n} GROUP BY 1)"""
        )
    dup = micro.format(
        expr="(len(toks) - len(list_distinct(toks))) * 1.0 / greatest(len(toks), 1)"
    )
    return f"""
WITH t AS (SELECT doc_id, {_toks('text')} AS toks FROM documents),
{", ".join(parts)}
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
  {dup} AS dup_token_frac_micro,
  COALESCE(m2.top_bigram_frac_micro, 0) AS top_bigram_frac_micro,
  COALESCE(m3.top_trigram_frac_micro, 0) AS top_trigram_frac_micro
FROM t LEFT JOIN m2 USING (doc_id) LEFT JOIN m3 USING (doc_id)
"""


def q_boilerplate_ngrams(n: int = 5, k: int = 20) -> str:
    return f"""
WITH t AS (SELECT doc_id, {_toks('text')} AS toks FROM documents),
g AS (SELECT doc_id, unnest(list_distinct({_gram_sql(n)})) AS gram FROM t)
SELECT gram, CAST(count(*) AS BIGINT) AS df
FROM g GROUP BY gram
ORDER BY df DESC, gram ASC LIMIT {k}
"""


def q_pagerank(n_iter: int = 10, scale: int = 10**9) -> str:
    """Unrolled integer PageRank — the SQL twin of
    operators/centrality.py::pagerank (same micro-unit floor-division
    arithmetic, DuckDB ``//`` = Spark ``DIV``), one CTE per iteration
    (the LPA-unroll pattern of oracle_ops.q_communities)."""
    iters = []
    for k in range(n_iter):
        iters.append(
            f"""r{k + 1} AS (
  SELECT b.group_id, b.name,
    (3 * CAST({scale} AS BIGINT)) // (20 * b.n) + COALESCE(s.c, 0) AS r
  FROM base b LEFT JOIN (
    SELECT ed.group_id, ed.dst AS name, SUM((17 * r.r) // (20 * ed.outdeg)) AS c
    FROM r{k} r JOIN e_deg ed ON ed.group_id = r.group_id AND ed.src = r.name
    GROUP BY 1, 2
  ) s ON s.group_id = b.group_id AND s.name = b.name
)"""
        )
    return f"""
WITH {EDGES_CTE},
pr_nodes AS (SELECT DISTINCT group_id, canonical_name AS name FROM canon_map),
ng AS (SELECT group_id, COUNT(*) AS n FROM pr_nodes GROUP BY 1),
e AS (SELECT DISTINCT group_id, subj_name AS src, obj_name AS dst FROM dedup),
outdeg AS (SELECT group_id, src, COUNT(*) AS outdeg FROM e GROUP BY 1, 2),
e_deg AS (SELECT e.*, o.outdeg FROM e JOIN outdeg o USING (group_id, src)),
base AS (SELECT n.group_id, n.name, ng.n FROM pr_nodes n JOIN ng USING (group_id)),
r0 AS (SELECT group_id, name, CAST({scale} AS BIGINT) // n AS r FROM base),
{",".join(iters)}
SELECT group_id, name, CAST(r AS BIGINT) AS pr_scaled FROM r{n_iter}
"""


def q_exact_duplicates() -> str:
    return """
SELECT md5(text) AS content_hash,
  COUNT(*) AS n_docs,
  MIN(CAST(doc_id AS VARCHAR)) AS keep_doc_id
FROM documents GROUP BY 1 HAVING COUNT(*) > 1
"""


# perturbed corpus used by the near-dup check: every 5th doc gets a
# shifted twin so the operator provably finds known pairs.
_PERTURBED = """
corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS id, text FROM documents
  UNION ALL
  SELECT CAST(doc_id + 1000000 AS VARCHAR), text || ' extra tail tokens'
  FROM documents WHERE doc_id % 5 = 0
)"""


def _shingle_sql(toks: str, n: int = 3) -> str:
    return (
        f"list_distinct(list_filter(list_transform("
        f"generate_series(1, greatest(len({toks}) - {n - 1}, 1)), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' ')), s -> s <> ''))"
    )


def q_near_duplicates(threshold: float = 0.5) -> str:
    return f"""
WITH {_PERTURBED},
sh AS (
  SELECT id, {_shingle_sql(_toks('text'))} AS s FROM corpus
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
    len(list_intersect(a.s, b.s))
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
  FROM sh a JOIN sh b ON a.id < b.id
)
SELECT id_a, id_b, round(j, 6) AS jaccard
FROM pairs WHERE round(j, 6) >= {threshold}
"""


def q_dedup_keep_list(threshold: float = 0.5) -> str:
    """Expected keep decisions on the perturbed corpus: each twin pair
    (d, d+1000000) is its own component; keep = lexicographically
    smaller id (the original, since '1...' > digits of d for d<1e6 is
    not guaranteed — computed as least())."""
    return f"""
WITH {_PERTURBED},
sh AS (SELECT id, {_shingle_sql(_toks('text'))} AS s FROM corpus),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM sh a JOIN sh b ON a.id < b.id
  WHERE round(len(list_intersect(a.s, b.s))
    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= {threshold}
),
members AS (
  SELECT id_a AS doc_id, least(id_a, id_b) AS keep FROM pairs
  UNION ALL SELECT id_b, least(id_a, id_b) FROM pairs
),
resolved AS (SELECT doc_id, MIN(keep) AS keep_doc_id FROM members GROUP BY 1)
SELECT doc_id, keep_doc_id, doc_id = keep_doc_id AS is_kept FROM resolved
"""


def q_simhash(bits: int = 16) -> str:
    terms = []
    for j in range(bits):
        digit = j // 4 + 1
        shift = 3 - (j % 4)
        contrib = (
            f"COALESCE(list_sum(list_transform(toks, t -> CASE WHEN "
            f"((strpos('0123456789abcdef', substr(md5(t), {digit}, 1)) - 1) "
            f">> {shift}) & 1 = 1 THEN 1 ELSE -1 END)), 0)"
        )
        terms.append(f"(CASE WHEN {contrib} > 0 THEN {1 << (bits - 1 - j)} ELSE 0 END)")
    sig = " + ".join(terms)
    return f"""
WITH t AS (SELECT doc_id, {_toks('text')} AS toks FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST({sig} AS BIGINT) AS simhash
FROM t
"""


def q_fingerprint(n: int = 3, mod: int = 8) -> str:
    return f"""
WITH t AS (SELECT doc_id, {_toks('text')} AS toks FROM documents),
sh AS (SELECT doc_id, {_shingle_sql('toks', n)} AS s FROM t),
h AS (
  SELECT doc_id,
    list_filter(
      list_transform(s, x -> CAST(md5_number_lower(x) % 4294967296 AS BIGINT)),
      v -> v % {mod} = 0
    ) AS sampled
  FROM sh
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(len(sampled) AS BIGINT) AS n_sampled,
  list_min(sampled) AS min_hash
FROM h
"""


BM25_QUERY = "spark join merge window customer"


def q_bm25_docs(k1: float = 1.2, b: float = 0.75) -> str:
    terms = _sql_strlist(BM25_QUERY.split())
    return f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS id, UNNEST({_toks('text')}) AS term
  FROM documents
),
dl AS (SELECT id, COUNT(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
),
tf AS (SELECT id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
matched AS (
  SELECT tf.id, tf.term, tf.tf, dl.dl FROM tf JOIN dl USING (id)
  WHERE list_contains({terms}, tf.term)
),
dfreq AS (SELECT term, COUNT(DISTINCT id) AS df FROM matched GROUP BY 1),
scored AS (
  SELECT m.id,
    ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
      * (m.tf * ({k1} + 1))
      / (m.tf + {k1} * (1 - {b} + {b} * m.dl / s.avgdl)) AS w
  FROM matched m JOIN dfreq d USING (term) CROSS JOIN stats s
)
SELECT id, round(SUM(w), 6) AS score FROM scored GROUP BY 1
"""


def q_cosine_topk(k: int = 10) -> str:
    return f"""
WITH emb AS (
  -- cast to double BEFORE the dot product: the column is FLOAT[] and
  -- DuckDB accumulates float32 (error ~1e-7), while the engine
  -- computes in double — the cast aligns the arithmetic.
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM emb WHERE vec_id < 4
),
scored AS (
  SELECT q.query_id, e.vec_id AS id,
    round(list_dot_product(e.embedding, q.qv)
      / (sqrt(list_dot_product(e.embedding, e.embedding))
         * sqrt(list_dot_product(q.qv, q.qv))), 6) AS score
  FROM emb e CROSS JOIN q
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank
  FROM scored
)
SELECT query_id, id, score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def q_ann_lsh(k: int = 10, n_planes: int = 12, n_tables: int = 1,
              dim: int = 64, seed: int = 42) -> str:
    """Full-value oracle for the LSH-bucketed ANN path (plane_fn="md5"):
    regenerates the engine's ±1 hyperplanes from md5(f"{seed}-{t}-{j}-{d}")
    (docops.md5_planes — a hex digit ≤ '7' means +1), replays the
    per-table sign-bit bucketing, the bucket-collision candidate join,
    and the exact cosine verify with the same round-6 / (score DESC,
    id) ranking as the engine. This closes the round-3 gap where the
    approximate ANN path was the one driver row without independent
    verification: approximate ≠ unverifiable once the randomness is a
    cross-engine-reproducible function."""
    return f"""
WITH pl AS (
  SELECT t, j,
         list(CASE WHEN substr(md5(concat('{seed}-', t, '-', j, '-', d)), 1, 1)
                   <= '7' THEN 1.0 ELSE -1.0 END ORDER BY d) AS plane
  FROM range({n_tables}) AS rt(t), range({n_planes}) AS rj(j),
       range({dim}) AS rd(d)
  GROUP BY t, j
),
emb AS (
  -- cast to double BEFORE the dot product (same rationale as
  -- q_cosine_topk: the engine computes in float64)
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
eb AS (
  SELECT e.vec_id, p.t,
         CAST(SUM(CASE WHEN list_dot_product(e.v, p.plane) >= 0
                       THEN (CAST(1 AS BIGINT) << p.j) ELSE 0 END) AS BIGINT)
           AS bucket
  FROM emb e CROSS JOIN pl p GROUP BY 1, 2
),
qb AS (SELECT vec_id AS query_id, t, bucket FROM eb WHERE vec_id < 4),
cand AS (
  SELECT DISTINCT q.query_id, e.vec_id AS id
  FROM eb e JOIN qb q ON e.t = q.t AND e.bucket = q.bucket
),
scored AS (
  SELECT c.query_id, c.id,
    round(list_dot_product(e.v, q.v)
      / (sqrt(list_dot_product(e.v, e.v))
         * sqrt(list_dot_product(q.v, q.v))), 6) AS score
  FROM cand c
  JOIN emb e ON e.vec_id = c.id
  JOIN emb q ON q.vec_id = c.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id)
    AS rank
  FROM scored
)
SELECT query_id, id, score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def q_ann_ivf(k: int = 10, n_centroids: int = 16, n_probe: int = 4,
              dim: int = 64) -> str:
    """Full-value oracle for the APPROXIMATE IVF path (the md5-sample
    quantizer, docops.md5_sample_centroids): centroids = the
    n_centroids corpus vectors with the smallest md5(decimal id),
    indexed in hash order; corpus rows bucket to their nearest centroid
    (squared-L2 elementwise fold, ties by centroid index — the same
    left-to-right double arithmetic as the engine's zip_with/aggregate);
    each query probes its n_probe nearest centroids; candidates are
    cosine-scored exactly with the engine's round-6 / (score DESC, id)
    ranking. Together with q_ann_lsh this makes BOTH approximate ANN
    paths independently verifiable — approximate ≠ unverifiable once
    the randomness is a cross-engine-reproducible function."""
    return f"""
WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cent AS (
  SELECT row_number() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), CAST(vec_id AS VARCHAR)
         ) - 1 AS centroid, v AS cv
  FROM emb
  QUALIFY centroid < {n_centroids}
),
dists AS (
  SELECT e.vec_id, c.centroid,
         list_sum(list_transform(generate_series(1, {dim}),
           d -> (e.v[d] - c.cv[d]) * (e.v[d] - c.cv[d]))) AS dist
  FROM emb e CROSS JOIN cent c
),
eb AS (
  SELECT vec_id, centroid AS bucket FROM dists
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid) <= 1
),
qb AS (
  SELECT vec_id AS query_id, centroid AS bucket FROM dists WHERE vec_id < 4
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid)
    <= {n_probe}
),
scored AS (
  SELECT q.query_id, e.vec_id AS id,
    round(list_dot_product(ev.v, qv.v)
      / (sqrt(list_dot_product(ev.v, ev.v))
         * sqrt(list_dot_product(qv.v, qv.v))), 6) AS score
  FROM eb e JOIN qb q ON e.bucket = q.bucket
  JOIN emb ev ON ev.vec_id = e.vec_id
  JOIN emb qv ON qv.vec_id = q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id)
    AS rank
  FROM scored
)
SELECT query_id, id, score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def q_rrf_docs() -> str:
    """RRF of two deterministic lanes over documents: lane1 = n_chars
    desc, lane2 = (doc_id*37) % 101 asc; top-20 each; fused score."""
    return """
WITH l1 AS (
  SELECT CAST(doc_id AS VARCHAR) AS id,
    row_number() OVER (ORDER BY n_chars DESC, CAST(doc_id AS VARCHAR)) - 1 AS rank
  FROM documents QUALIFY rank < 20
),
l2 AS (
  SELECT CAST(doc_id AS VARCHAR) AS id,
    row_number() OVER (ORDER BY (doc_id * 37) % 101, CAST(doc_id AS VARCHAR)) - 1 AS rank
  FROM documents QUALIFY rank < 20
),
u AS (
  SELECT id, 1.0 / (rank + 1) AS contrib FROM l1
  UNION ALL
  SELECT id, 1.0 / (rank + 1) FROM l2
)
SELECT id, round(SUM(contrib), 6) AS score FROM u GROUP BY 1
"""


def q_bfs_globex() -> str:
    """Min-depth BFS (≤3 hops, undirected) from 'Globex' in group g0
    over the canonical edge graph."""
    return f"""
WITH RECURSIVE {EDGES_CTE},
adj AS (
  SELECT subj_name AS a, obj_name AS b FROM edges WHERE group_id = 'g0'
  UNION
  SELECT obj_name, subj_name FROM edges WHERE group_id = 'g0'
),
reach(name, depth) AS (
  SELECT 'Globex', 0
  UNION
  SELECT adj.b, reach.depth + 1 FROM reach JOIN adj ON adj.a = reach.name
  WHERE reach.depth < 3
)
SELECT name, CAST(MIN(depth) AS INT) AS depth FROM reach GROUP BY 1
"""


def q_point_in_time(reference_time: str, last_n: int = 10) -> str:
    return f"""
WITH {FACTS_CTE},
eps AS (
  SELECT DISTINCT doc_id, d,
    'g' || CAST(d % {corpus.N_GROUPS} AS VARCHAR) AS group_id,
    TIMESTAMP '{corpus.EPISODE_EPOCH}' + INTERVAL (d) MINUTE AS valid_at
  FROM facts
),
newest AS (
  SELECT doc_id, group_id, valid_at FROM eps
  WHERE valid_at <= TIMESTAMP '{reference_time}'
  ORDER BY valid_at DESC, doc_id DESC LIMIT {last_n}
)
SELECT doc_id, group_id, valid_at FROM newest
"""


def q_context_window(window_len: int = 3) -> str:
    return f"""
WITH {FACTS_CTE},
eps AS (
  SELECT DISTINCT doc_id, d,
    'g' || CAST(d % {corpus.N_GROUPS} AS VARCHAR) AS group_id,
    TIMESTAMP '{corpus.EPISODE_EPOCH}' + INTERVAL (d) MINUTE AS valid_at
  FROM facts
)
SELECT doc_id, group_id,
  COALESCE(
    string_agg(doc_id, ',') OVER (
      PARTITION BY group_id ORDER BY valid_at, doc_id
      ROWS BETWEEN {window_len} PRECEDING AND 1 PRECEDING
    ), ''
  ) AS prev_ids
FROM eps
"""


def q_pagination(cursor: str = "8", limit: int = 20) -> str:
    return f"""
WITH {FACTS_CTE},
{CANON_CTE},
nodes AS (
  SELECT DISTINCT group_id, canonical_name AS name,
    sha256('entity|' || group_id || '|' || lower(canonical_name)) AS uuid
  FROM canon_map
)
SELECT group_id, name, uuid FROM nodes
WHERE uuid < '{cursor}' ORDER BY uuid DESC LIMIT {limit}
"""


def q_remove_episode_counts(doc_id: str = "doc-000000") -> str:
    """Cascade counts after removing one episode: surviving mentions,
    entities (those mentioned by some other episode), and edges (those
    with provenance beyond the removed episode)."""
    return f"""
WITH {FACTS_CTE},
{CANON_CTE},
m AS (
  SELECT DISTINCT r.doc_id, r.group_id, c.canonical_name AS name FROM (
    SELECT doc_id, group_id, speaker AS name FROM facts WHERE subj_name <> obj_name
    UNION ALL SELECT doc_id, group_id, subj_name FROM facts WHERE subj_name <> obj_name
    UNION ALL SELECT doc_id, group_id, obj_name FROM facts WHERE subj_name <> obj_name
  ) r JOIN canon_map c ON c.group_id = r.group_id AND c.name = r.name
),
canon AS (
  SELECT f.doc_id, f.group_id, cs.canonical_name AS subj_name, f.predicate,
    co.canonical_name AS obj_name, f.valid_at
  FROM facts f
  JOIN canon_map cs ON cs.group_id = f.group_id AND cs.name = f.subj_name
  JOIN canon_map co ON co.group_id = f.group_id AND co.name = f.obj_name
  WHERE cs.canonical_name <> co.canonical_name
)
SELECT
  (SELECT COUNT(*) FROM m WHERE doc_id <> '{doc_id}') AS n_mentions,
  (SELECT COUNT(*) FROM (
     SELECT group_id, name FROM m GROUP BY 1, 2
     HAVING COUNT(CASE WHEN doc_id <> '{doc_id}' THEN 1 END) > 0
   )) AS n_nodes,
  (SELECT COUNT(*) FROM (
     SELECT group_id, subj_name, predicate, obj_name, valid_at FROM canon
     GROUP BY 1, 2, 3, 4, 5
     HAVING COUNT(DISTINCT CASE WHEN doc_id <> '{doc_id}' THEN doc_id END) > 0
   )) AS n_edges
"""


def q_duplicate_pairs() -> str:
    """Expected IS_DUPLICATE_OF pairs: both variants of a designed
    near-dup cluster mentioned in the same group."""
    canon = _canon_values()
    return f"""
WITH {FACTS_CTE},
{CANON_CTE}
SELECT p.group_id,
  least(cm.src, cm.tgt) AS name_a,
  greatest(cm.src, cm.tgt) AS name_b,
  'IS_DUPLICATE_OF' AS name
FROM {canon}
JOIN present p ON p.name = cm.src
WHERE EXISTS (SELECT 1 FROM present q
              WHERE q.group_id = p.group_id AND q.name = cm.tgt)
"""


def q_facts_as_of(t: str = "2019-06-01 00:00:00") -> str:
    """Event-time slice of the bi-temporal edge table."""
    return f"""
WITH {EDGES_CTE}
SELECT group_id, subj_name, predicate, obj_name, valid_at, invalid_at
FROM edges
WHERE valid_at <= TIMESTAMP '{t}'
  AND (invalid_at IS NULL OR invalid_at > TIMESTAMP '{t}')
"""


def q_episode_subgraph(doc_id: str = "doc-000010") -> str:
    """Edges evidenced by one episode (distinct canonical triples that
    doc contributed to)."""
    return f"""
WITH {EDGES_CTE},
docs_edges AS (
  SELECT DISTINCT group_id, subj_name, predicate, obj_name, valid_at
  FROM canon WHERE doc_id = '{doc_id}'
)
SELECT e.group_id, e.subj_name, e.predicate, e.obj_name, e.valid_at, e.invalid_at
FROM edges e JOIN docs_edges USING (group_id, subj_name, predicate, obj_name, valid_at)
"""


# shared probe set for the as-of join check (engine + oracle build from
# the same literals)
ASOF_PROBES = [
    ("g0", "Globex", "Acme Corp", "2016-06-01 00:00:00"),
    ("g0", "Globex", "Acme Corp", "2019-06-01 00:00:00"),
    ("g0", "Globex", "Acme Corp", "2023-06-01 00:00:00"),
    ("g1", "Globex", "Acme Corp", "2019-06-01 00:00:00"),
    ("g2", "J. Smith", "Globex", "2020-06-01 00:00:00"),
    ("g3", "Globex", "Initech Inc", "2021-06-01 00:00:00"),
]


def q_as_of_join() -> str:
    values = ", ".join(
        f"('{g}', '{a}', '{b}', TIMESTAMP '{t}')" for g, a, b, t in ASOF_PROBES
    )
    return f"""
WITH {EDGES_CTE},
probes(group_id, name_a, name_b, t) AS (VALUES {values}),
j AS (
  SELECT e.group_id, p.t, e.subj_name, e.predicate, e.obj_name,
    e.valid_at, e.invalid_at, e.fact,
    row_number() OVER (
      PARTITION BY e.group_id, least(p.name_a, p.name_b), p.t, e.predicate
      ORDER BY e.valid_at DESC
    ) AS rn
  FROM edges e
  JOIN probes p ON p.group_id = e.group_id
   AND least(e.subj_name, e.obj_name) = least(p.name_a, p.name_b)
   AND greatest(e.subj_name, e.obj_name) = greatest(p.name_a, p.name_b)
   AND e.valid_at <= p.t
)
SELECT group_id, t, subj_name, predicate, obj_name, valid_at, invalid_at, fact
FROM j WHERE rn = 1
"""


def q_interval_join() -> str:
    values = ", ".join(
        f"('{g}', '{a}', '{b}', TIMESTAMP '{t}')" for g, a, b, t in ASOF_PROBES
    )
    return f"""
WITH {EDGES_CTE},
probes(group_id, name_a, name_b, t) AS (VALUES {values})
SELECT e.group_id, p.t, e.subj_name, e.predicate, e.obj_name,
  e.valid_at, e.invalid_at, e.fact
FROM edges e
JOIN probes p ON p.group_id = e.group_id
 AND least(e.subj_name, e.obj_name) = least(p.name_a, p.name_b)
 AND greatest(e.subj_name, e.obj_name) = greatest(p.name_a, p.name_b)
 AND e.valid_at <= p.t
 AND (e.invalid_at IS NULL OR e.invalid_at > p.t)
"""


def q_media_catalog() -> str:
    from .oracle import q_spans

    spans_sql = q_spans().strip()
    return f"""
WITH spans_q AS ({spans_sql})
SELECT doc_id, media_ref, 'img' AS media_type, CAST(32 AS INT) AS content_len,
  CAST("offset" AS INT) AS "offset"
FROM spans_q WHERE kind = 'media'
"""


def q_media_features() -> str:
    """Integer byte-histogram per media span: the exact surface of the
    decode stage (payload = sha256(media_ref) bytes; bin i = byte[i] +
    byte[i+16]) — float-drift-free across DuckDB/Spark."""
    from .oracle import q_spans

    spans_sql = q_spans().strip()
    return f"""
WITH spans_q AS ({spans_sql}),
media AS (
  SELECT media_ref, sha256(media_ref) AS h
  FROM spans_q WHERE kind = 'media'
),
hexmap AS (
  SELECT CAST(i AS BIGINT) AS v, printf('%02x', CAST(i AS INT)) AS p
  FROM generate_series(0, 255) t(i)
),
idxs AS (SELECT CAST(i AS INT) AS idx FROM generate_series(0, 15) t(i))
SELECT m.media_ref, 'img' AS media_type, idx,
  h1.v + h2.v AS v
FROM media m CROSS JOIN idxs
JOIN hexmap h1 ON h1.p = substr(m.h, 2 * idx + 1, 2)
JOIN hexmap h2 ON h2.p = substr(m.h, 2 * idx + 33, 2)
"""


BM25_MANY_QUERIES = [
    ("q1", BM25_QUERY),
    ("q2", "vector hash stream batch"),
    ("q3", "filter sort table scan"),
]


def q_bm25_many(k1: float = 1.2, b: float = 0.75) -> str:
    """Batched BM25 (one pass, many queries): same math as q_bm25_docs
    with a (query_id, term) VALUES relation joined in at the end —
    mirrors bm25_score_many's single-aggregation shape."""
    import re

    vals = []
    for qid, text in BM25_MANY_QUERIES:
        seen = []
        for t in re.split(r"[^a-z0-9]+", text.lower()):
            if t and t not in seen:
                seen.append(t)
        vals.extend(f"('{qid}', '{t}')" for t in seen)
    values = ", ".join(vals)
    return f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS id, UNNEST({_toks('text')}) AS term
  FROM documents
),
dl AS (SELECT id, COUNT(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
),
tf AS (SELECT id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
qterms(query_id, term) AS (VALUES {values}),
matched AS (
  SELECT tf.id, tf.term, tf.tf, dl.dl FROM tf JOIN dl USING (id)
  WHERE tf.term IN (SELECT DISTINCT term FROM qterms)
),
dfreq AS (SELECT term, COUNT(DISTINCT id) AS df FROM matched GROUP BY 1),
w AS (
  SELECT m.id, m.term,
    ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
      * (m.tf * ({k1} + 1))
      / (m.tf + {k1} * (1 - {b} + {b} * m.dl / s.avgdl)) AS w
  FROM matched m JOIN dfreq d USING (term) CROSS JOIN stats s
)
SELECT q.query_id, w.id, round(SUM(w.w), 6) AS score
FROM w JOIN qterms q USING (term)
GROUP BY 1, 2
"""


def q_embedding_near_dup(threshold: float = 0.9, every: int = 50) -> str:
    """Exact all-pairs oracle for the embedding-cosine near-dup query:
    the corpus is embeddings ∪ planted collinear copies (×1.07 scaled,
    id + 100000 for every `every`-th vector). The Spark side uses
    multi-table hyperplane blocking; collinear pairs collide in every
    table deterministically and all non-planted pairs sit far below the
    threshold (max pairwise cosine ≈ 0.48 in this corpus), so the
    INDEPENDENT exact oracle must agree — a stronger check than
    mirroring the blocking."""
    return f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
planted AS (
  SELECT vec_id + 100000 AS vec_id,
    list_transform(v, x -> x * 1.07) AS v
  FROM base WHERE vec_id % {every} = 0
),
allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    round(
      list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
      6
    ) AS score
  FROM allv a JOIN allv b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, score FROM pairs WHERE score >= {threshold}
"""


def q_media_frames(max_frames: int = 6, interval_ms: int = 1000) -> str:
    """Frame-sampling oracle: per media span, 1 + (md5_u32(ref) %
    max_frames) frames; frame content is sha256(ref|idx) — both
    reproducible exactly in DuckDB (md5_number_lower / sha256)."""
    from .oracle import q_spans

    spans_sql = q_spans().strip()
    return f"""
WITH spans_q AS ({spans_sql}),
media AS (SELECT media_ref FROM spans_q WHERE kind = 'media'),
counted AS (
  SELECT media_ref,
    1 + CAST(md5_number_lower(media_ref) % 4294967296 AS BIGINT) % {max_frames} AS n
  FROM media
),
frames AS (
  SELECT media_ref, CAST(u.i AS INT) AS frame_idx
  FROM counted, UNNEST(generate_series(0, CAST(n - 1 AS INT))) AS u(i)
)
SELECT media_ref, frame_idx,
  CAST(frame_idx AS BIGINT) * {interval_ms} AS ts_ms,
  sha256(media_ref || '|' || CAST(frame_idx AS VARCHAR)) AS content_sha
FROM frames
"""


def q_near_dup_facts() -> str:
    """Oracle for the near-duplicate fact merge (D8 near-dup lane,
    operators/resolve.merge_near_duplicate_facts): the fixture plants,
    per document, a base fact, a paraphrase variant sharing its
    valid_at ('... indeed.', trigram cosine ≈ 0.9 — far above the 0.6
    reference cutoff) on even docs, and a differently-dated restatement
    on docs % 3 == 0. Expected merge is known by construction: the
    paraphrase folds into the earliest edge (provenance unioned), the
    differently-dated fact survives untouched — the oracle GENERATES
    that outcome; Spark has to reach it through embedding cosine +
    union-find inside the pair group."""
    return """
WITH docs AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
base AS (
  SELECT d,
    2000 + d % 20 AS y,
    'S' || CAST(d AS VARCHAR) || ' partners with O' || CAST(d AS VARCHAR)
      || ' since ' AS stem
  FROM docs
),
merged AS (
  SELECT
    stem || CAST(y AS VARCHAR) || '.' AS fact,
    CAST(y AS VARCHAR) || '-06-01' AS valid_on,
    'ep-' || CAST(d AS VARCHAR) || '-a'
      || CASE WHEN d % 2 = 0 THEN ',ep-' || CAST(d AS VARCHAR) || '-b'
              ELSE '' END AS episodes_csv
  FROM base
),
dated AS (
  SELECT
    stem || CAST(y + 1 AS VARCHAR) || '.' AS fact,
    CAST(y + 1 AS VARCHAR) || '-06-01' AS valid_on,
    'ep-' || CAST(d AS VARCHAR) || '-c' AS episodes_csv
  FROM base WHERE d % 3 = 0
)
SELECT * FROM merged UNION ALL SELECT * FROM dated
"""


def _md5_u32_sql(expr: str) -> str:
    """SQL twin of docops._md5_u32 (see that docstring)."""
    return f"CAST(md5_number_lower({expr}) % 4294967296 AS BIGINT)"


def q_decontaminate(n: int = 4) -> str:
    """Train docs = doc_id % 10 <> 7; eval set = doc_id % 10 = 7."""
    return f"""
WITH t AS (SELECT doc_id, {_toks('text')} AS toks FROM documents),
g AS (SELECT doc_id, list_distinct({_gram_sql(n)}) AS grams FROM t),
ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 10 = 7),
tr AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 10 <> 7),
hit AS (SELECT doc_id, count(*) AS c FROM tr JOIN ev USING (gram) GROUP BY 1)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
  CAST(COALESCE(hit.c, 0) AS BIGINT) AS n_shared_ngrams,
  COALESCE(hit.c, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 7) d
LEFT JOIN hit USING (doc_id)
"""


def q_split_summary() -> str:
    bucket = _md5_u32_sql("'split|' || CAST(doc_id AS VARCHAR)") + " % 100"
    return f"""
WITH t AS (SELECT doc_id, lang, {_toks('text')} AS toks, {bucket} AS bucket
           FROM documents),
s AS (SELECT *, CASE WHEN bucket < 80 THEN 'train'
                     WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
      FROM t)
SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(len(toks)) AS BIGINT) AS n_tokens
FROM s GROUP BY 1, 2
"""


def q_pack_documents(budget: int = 256, n_streams: int = 8) -> str:
    stream = _md5_u32_sql("'pack|' || CAST(doc_id AS VARCHAR)") + f" % {n_streams}"
    ordk = _md5_u32_sql("'ord|' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH t AS (SELECT doc_id, CAST(len({_toks('text')}) AS BIGINT) AS n_tokens,
  CAST({stream} AS INT) AS stream, {ordk} AS ord FROM documents),
c AS (SELECT doc_id, stream, n_tokens,
  sum(n_tokens) OVER (PARTITION BY stream ORDER BY ord, doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
  FROM t)
SELECT CAST(doc_id AS BIGINT) AS doc_id, stream, n_tokens,
  CAST(cum_end - n_tokens AS BIGINT) AS start_off,
  CAST(floor((cum_end - n_tokens) / {budget}) AS BIGINT) AS first_chunk,
  CAST(greatest(floor((cum_end - n_tokens) / {budget}),
                floor((cum_end - 1) / {budget})) AS BIGINT) AS last_chunk
FROM c
"""


PII_TAILS = (
    " contact alice.smith@example.com for access",
    " mirror at https://data.example.org/v1/dump",
    " hotline +14155550123 anytime",
)


def q_pii_scrub() -> str:
    from .operators.docops import PII_EMAIL_RE, PII_PHONE_RE, PII_URL_RE

    tails = " ".join(
        f"WHEN {i} THEN '{t}'" for i, t in enumerate(PII_TAILS)
    )
    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace(lower(text), "
        f"'{PII_EMAIL_RE}', '<email>', 'g'), "
        f"'{PII_URL_RE}', '<url>', 'g'), "
        f"'{PII_PHONE_RE}', '<phone>', 'g')"
    )
    return f"""
WITH corpus AS (
  SELECT doc_id, text || CASE doc_id % 7 {tails} ELSE '' END AS text
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(len(regexp_extract_all(lower(text), '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(lower(text), '{PII_URL_RE}')) AS BIGINT) AS n_urls,
  CAST(len(regexp_extract_all(lower(text), '{PII_PHONE_RE}')) AS BIGINT) AS n_phones,
  md5({scrub}) AS scrubbed_md5,
  CAST(length({scrub}) AS BIGINT) AS scrubbed_len
FROM corpus
"""


MIXTURE_WEIGHTS = {"en": 1.0, "de": 2.5, "fr": 0.4}


def q_mixture_sample(grain: int = 1_000_000) -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN {int(w)} + "
        f"CASE WHEN b < {int(round((w - int(w)) * grain))} THEN 1 ELSE 0 END"
        for lang, w in sorted(MIXTURE_WEIGHTS.items())
    )
    return f"""
WITH d AS (
  SELECT doc_id, lang,
    {_md5_u32_sql("'mix|' || CAST(doc_id AS VARCHAR)")} % {grain} AS b
  FROM documents),
n AS (SELECT doc_id, lang,
  CASE lang {cases} ELSE 0 END AS n_copies FROM d)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
  CAST(unnest(range(1, n_copies + 1)) AS INT) AS copy
FROM n WHERE n_copies >= 1
"""


_TRIANGLE_CTES = f"""
WITH {EDGES_CTE},
tnodes AS (SELECT DISTINCT group_id, canonical_name AS name FROM canon_map),
und AS (
  SELECT DISTINCT group_id, least(subj_name, obj_name) AS a,
         greatest(subj_name, obj_name) AS b
  FROM dedup WHERE subj_name <> obj_name),
deg AS (
  SELECT group_id, name, COUNT(*) AS deg FROM (
    SELECT group_id, a AS name FROM und
    UNION ALL SELECT group_id, b AS name FROM und)
  GROUP BY 1, 2),
e AS (
  SELECT u.group_id,
    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
         THEN u.a ELSE u.b END AS lo,
    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
         THEN u.b ELSE u.a END AS hi,
    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
         THEN db.deg ELSE da.deg END AS hi_deg
  FROM und u
  JOIN deg da ON da.group_id = u.group_id AND da.name = u.a
  JOIN deg db ON db.group_id = u.group_id AND db.name = u.b),
tri AS (
  SELECT e1.group_id, e1.u, e1.v, e2.w
  FROM (SELECT group_id, lo AS u, hi AS v, hi_deg AS dv FROM e) e1
  JOIN (SELECT group_id, lo AS u, hi AS w, hi_deg AS dw FROM e) e2
    ON e1.group_id = e2.group_id AND e1.u = e2.u
   AND (e1.dv < e2.dw OR (e1.dv = e2.dw AND e1.v < e2.w))
  WHERE EXISTS (SELECT 1 FROM e c WHERE c.group_id = e1.group_id
                AND c.lo = e1.v AND c.hi = e2.w)),
per_node AS (
  SELECT group_id, name, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
    SELECT group_id, u AS name FROM tri
    UNION ALL SELECT group_id, v FROM tri
    UNION ALL SELECT group_id, w FROM tri)
  GROUP BY 1, 2)"""


def q_triangle_count() -> str:
    """SQL twin of operators/centrality.py::triangle_count — identical
    degree-ordered wedge enumeration over the canonical edge set."""
    return f"""{_TRIANGLE_CTES}
SELECT n.group_id, n.name,
  CAST(COALESCE(p.n_triangles, 0) AS BIGINT) AS n_triangles
FROM tnodes n LEFT JOIN per_node p USING (group_id, name)
"""


def q_clustering_coefficient() -> str:
    """Triangle CTEs + degree join + integer-micro local clustering
    coefficient (2T // (deg·(deg−1)), DuckDB // = Spark DIV)."""
    return f"""{_TRIANGLE_CTES}
SELECT n.group_id, n.name,
  CAST(COALESCE(d.deg, 0) AS BIGINT) AS deg,
  CAST(COALESCE(p.n_triangles, 0) AS BIGINT) AS n_triangles,
  CAST(CASE WHEN COALESCE(d.deg, 0) >= 2
       THEN (2 * COALESCE(p.n_triangles, 0) * 1000000) // (d.deg * (d.deg - 1))
       ELSE 0 END AS BIGINT) AS cc_micro
FROM tnodes n
LEFT JOIN per_node p USING (group_id, name)
LEFT JOIN deg d USING (group_id, name)
"""



def q_sessionize(gap_minutes: int = 30) -> str:
    """SQL twin of operators/events.py::sessionize — same epoch-second
    gap rule, first-event-id session key, integer-cents sums."""
    return f"""
WITH o AS (
  SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS secs,
    lag(CAST(floor(epoch(ts)) AS BIGINT))
      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
flagged AS (
  SELECT *, CASE WHEN prev IS NULL OR secs - prev > {gap_minutes * 60}
                 THEN 1 ELSE 0 END AS is_new
  FROM o),
sess AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx
  FROM flagged)
SELECT user_id,
  CAST(MIN(event_id) AS BIGINT) AS session_id,
  MIN(ts) AS session_start,
  MAX(ts) AS session_end,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
  MAX(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)) AS max_k
FROM sess GROUP BY user_id, sess_idx
"""


def q_funnel(steps: tuple = ("view", "click", "signup", "purchase")) -> str:
    """SQL twin of operators/events.py::funnel — chained min-after
    CTEs, one per step."""
    ctes = [
        f"s1 AS (SELECT user_id, MIN(ts) AS ts FROM events "
        f"WHERE event_type = '{steps[0]}' GROUP BY 1)"
    ]
    for i, step in enumerate(steps[1:], start=2):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, MIN(e.ts) AS ts FROM events e "
            f"JOIN s{i - 1} p ON p.user_id = e.user_id AND e.ts > p.ts "
            f"WHERE e.event_type = '{step}' GROUP BY 1)"
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({i + 1} AS INT) AS step_idx, '{s}' AS step_name, "
        f"CAST(COUNT(*) AS BIGINT) AS n_users FROM s{i + 1}"
        for i, s in enumerate(steps)
    )
    return f"WITH {', '.join(ctes)} {selects}"


# Query-node batch for the J2 hybrid candidate-gen driver query: the
# query VECTOR is the document's own embedding (vec_id = query_id); the
# fulltext query string is a short literal, like the reference's node
# NAME (get_relevant_nodes feeds node.fulltext_query, a name string —
# search_utils.py:718).
RELEVANT_NODE_QUERIES = [
    ("0", "spark join merge window"),
    ("1", "batch data column order"),
    ("2", "filter value table scan"),
    ("3", "big join batch merge"),
]


def q_relevant_nodes(min_score: float = 0.25, limit: int = 10,
                     k1: float = 1.2, b: float = 0.75) -> str:
    """Full-value oracle for the J2 hybrid candidate generator
    (resolve.get_relevant_nodes): per query, vector-lane cosine
    top-limit strictly above min_score UNION fulltext-lane BM25
    top-limit, both scoped to the query's group (lang), with BM25
    idf/avgdl CORPUS-wide and the group filter applied after scoring —
    the reference's semantics (global Lucene index, then
    ``WHERE m.group_id = $group_id``). A candidate in both lanes
    surfaces once, as lane='vector'."""
    import re

    vals = []
    for qid, text in RELEVANT_NODE_QUERIES:
        seen = []
        for t in re.split(r"[^a-z0-9]+", text.lower()):
            if t and t not in seen:
                seen.append(t)
        vals.extend(f"('{qid}', '{t}')" for t in seen)
    values = ", ".join(vals)
    qids = ", ".join(f"('{qid}')" for qid, _ in RELEVANT_NODE_QUERIES)
    return f"""
WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
corpus AS (
  SELECT CAST(d.doc_id AS VARCHAR) AS id, d.lang, e.v
  FROM documents d JOIN emb e ON e.vec_id = d.doc_id
),
qmeta(query_id) AS (VALUES {qids}),
q AS (
  SELECT m.query_id, c.lang AS qlang, c.v AS qv
  FROM qmeta m JOIN corpus c ON c.id = m.query_id
),
vecscored AS (
  SELECT q.query_id, c.id,
    round(list_dot_product(c.v, q.qv)
      / (sqrt(list_dot_product(c.v, c.v))
         * sqrt(list_dot_product(q.qv, q.qv))), 6) AS score
  FROM corpus c JOIN q ON c.lang = q.qlang
),
vec AS (
  SELECT query_id, id, 'vector' AS lane, score FROM vecscored
  WHERE score > {min_score}
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id)
    <= {limit}
),
toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS id, UNNEST({_toks('text')}) AS term
  FROM documents
),
dl AS (SELECT id, COUNT(*) AS dl FROM toks GROUP BY 1),
stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
tf AS (SELECT id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
qterms(query_id, term) AS (VALUES {values}),
matched AS (
  SELECT tf.id, tf.term, tf.tf, dl.dl FROM tf JOIN dl USING (id)
  WHERE tf.term IN (SELECT DISTINCT term FROM qterms)
),
dfreq AS (SELECT term, COUNT(DISTINCT id) AS df FROM matched GROUP BY 1),
w AS (
  SELECT m.id, m.term,
    ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
      * (m.tf * ({k1} + 1))
      / (m.tf + {k1} * (1 - {b} + {b} * m.dl / s.avgdl)) AS w
  FROM matched m JOIN dfreq d USING (term) CROSS JOIN stats s
),
ftscored AS (
  SELECT qt.query_id, w.id, round(SUM(w.w), 6) AS score
  FROM w JOIN qterms qt USING (term)
  GROUP BY 1, 2
),
ft AS (
  SELECT f.query_id, f.id, 'fulltext' AS lane, f.score
  FROM ftscored f
  JOIN q ON q.query_id = f.query_id
  JOIN corpus c ON c.id = f.id
  WHERE c.lang = q.qlang
  QUALIFY row_number() OVER (PARTITION BY f.query_id ORDER BY f.score DESC, f.id)
    <= {limit}
)
SELECT * FROM vec
UNION ALL
SELECT f.* FROM ft f
WHERE NOT EXISTS (
  SELECT 1 FROM vec v WHERE v.query_id = f.query_id AND v.id = f.id
)
"""


def q_line_dedup(line_words: int = 8) -> str:
    """Oracle for CCNet-style line dedup: identical fixed-window
    chunking, first-occurrence keep rule (smallest (doc_id, pos) per
    distinct line), per-doc rebuild in position order."""
    w = line_words
    return f"""
WITH toks AS (
  SELECT doc_id, {_toks('text')} AS tk FROM documents
),
lines AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
    array_to_string(tk[CAST(u.i * {w} + 1 AS BIGINT) : CAST(u.i * {w} + {w} AS BIGINT)], ' ') AS line
  FROM toks,
    UNNEST(generate_series(0,
      CAST(ceil(CAST(len(tk) AS DOUBLE) / {w}) AS BIGINT) - 1)) AS u(i)
  WHERE len(tk) > 0
),
marked AS (
  SELECT *,
    row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) = 1 AS kept
  FROM lines
)
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
  COUNT(*) AS n_lines,
  CAST(COUNT(*) FILTER (WHERE kept) AS BIGINT) AS n_kept,
  COALESCE(string_agg(line, ' ' ORDER BY pos) FILTER (WHERE kept), '')
    AS text_clean
FROM marked GROUP BY doc_id
"""


def q_tfidf_topk(k: int = 5) -> str:
    """Oracle for per-doc top-k TF-IDF: same smooth idf
    (ln((N+1)/(df+1)) + 1), round-6 score, (score DESC, term) ties."""
    return f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, UNNEST({_toks('text')}) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
SELECT doc_id, term,
  round(tf * (ln((n.n_docs + 1.0) / (d.df + 1.0)) + 1.0), 6) AS score,
  CAST(row_number() OVER (
    PARTITION BY doc_id
    ORDER BY round(tf * (ln((n.n_docs + 1.0) / (d.df + 1.0)) + 1.0), 6) DESC,
             term
  ) AS INT) AS rank
FROM tf JOIN dfreq d USING (term) CROSS JOIN n
QUALIFY rank <= {k}
"""


def _unroll_min_label(prefix: str, vsrc: str, esrc: str, rounds: int) -> list:
    """Connected components as min-label propagation unrolled into
    chained CTEs — exact while component diameter <= rounds (the same
    argument as the communities oracle: post-convergence rounds are
    no-ops). MATERIALIZED is load-bearing: each round references the
    previous one twice, so plain CTE inlining would duplicate the whole
    subtree per round — 2^rounds parquet scans."""
    ctes = [f"{prefix}0 AS MATERIALIZED (SELECT id, id AS lbl FROM {vsrc})"]
    for k in range(rounds):
        ctes.append(
            f"""{prefix}{k + 1} AS MATERIALIZED (
  SELECT v.id, least(v.lbl, COALESCE(MIN(n.lbl), v.lbl)) AS lbl
  FROM {prefix}{k} v
  LEFT JOIN {esrc} e ON e.x = v.id
  LEFT JOIN {prefix}{k} n ON n.id = e.y
  GROUP BY v.id, v.lbl)"""
        )
    return ctes


def q_incremental_dedup(threshold: float = 0.5, rounds: int = 6) -> str:
    """Oracle for the incremental corpus-dedup index driver query
    (operators/dedup_index.DedupIndex over the perturbed corpus in two
    batches: originals, then twins). Replays both batches in SQL:

    - batch 1 (empty index): connected components over the brute-force
      J>=t pair graph among originals — min-label propagation unrolled
      ``rounds`` times as chained CTEs (exact while component diameter
      <= rounds; the fixture's max component size is 4, and, as with
      the communities oracle, post-convergence rounds are no-ops) —
      keep = lexicographic min id per component.
    - batch 2: twins match STORED KEEPERS only (dropped batch-1 docs
      are not indexed), plus twin-twin pairs; anchored components where
      any stored member makes every twin a dup of the lexicographic
      min stored member, else the min twin is kept.
    """

    def unroll(prefix: str, vsrc: str, esrc: str) -> list:
        return _unroll_min_label(prefix, vsrc, esrc, rounds)

    head = f"""{_PERTURBED},
t AS (SELECT id, {_toks('text')} AS toks FROM corpus),
sh AS MATERIALIZED (SELECT id, {_shingle_sql('toks')} AS s FROM t),
pairs AS MATERIALIZED (
  SELECT a.id AS id_a, b.id AS id_b
  FROM sh a JOIN sh b ON a.id < b.id
  WHERE round(len(list_intersect(a.s, b.s))
    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= {threshold}
),
b1 AS MATERIALIZED (SELECT id FROM corpus WHERE CAST(id AS BIGINT) < 1000000),
b2 AS MATERIALIZED (SELECT id FROM corpus WHERE CAST(id AS BIGINT) >= 1000000),
g1 AS (
  SELECT p.id_a, p.id_b FROM pairs p
  JOIN b1 x ON x.id = p.id_a JOIN b1 y ON y.id = p.id_b
),
e1 AS MATERIALIZED (
  SELECT id_a AS x, id_b AS y FROM g1
  UNION ALL SELECT id_b, id_a FROM g1
),
vx1 AS (SELECT DISTINCT x AS id FROM e1)"""
    a_ctes = unroll("av", "vx1", "e1")
    mid = f"""dec1 AS MATERIALIZED (
  SELECT b1.id AS doc_id,
    CASE WHEN l.lbl IS NOT NULL AND l.lbl <> b1.id THEN l.lbl END AS dup_of
  FROM b1 LEFT JOIN av{rounds} l ON l.id = b1.id
),
keep1 AS MATERIALIZED (SELECT doc_id AS id FROM dec1 WHERE dup_of IS NULL),
cross2 AS MATERIALIZED (
  SELECT p.id_a AS id_new, p.id_b AS id_old FROM pairs p
  JOIN b2 ON b2.id = p.id_a JOIN keep1 k ON k.id = p.id_b
  UNION ALL
  SELECT p.id_b, p.id_a FROM pairs p
  JOIN b2 ON b2.id = p.id_b JOIN keep1 k ON k.id = p.id_a
),
g2 AS (
  SELECT p.id_a, p.id_b FROM pairs p
  JOIN b2 x ON x.id = p.id_a JOIN b2 y ON y.id = p.id_b
  UNION ALL SELECT id_new, id_old FROM cross2
),
e2 AS MATERIALIZED (
  SELECT id_a AS x, id_b AS y FROM g2
  UNION ALL SELECT id_b, id_a FROM g2
),
vx2 AS (SELECT DISTINCT x AS id FROM e2)"""
    b_ctes = unroll("bv", "vx2", "e2")
    tail = f"""stored2 AS (SELECT DISTINCT id_old AS id FROM cross2),
tgt AS (
  SELECT l.lbl,
    MIN(CASE WHEN s.id IS NOT NULL THEN l.id END) AS t_stored,
    MIN(CASE WHEN s.id IS NULL THEN l.id END) AS t_new
  FROM bv{rounds} l LEFT JOIN stored2 s ON s.id = l.id
  GROUP BY l.lbl
),
dec2 AS (
  SELECT b2.id AS doc_id,
    CASE WHEN l.lbl IS NULL THEN NULL
         WHEN t.t_stored IS NOT NULL THEN t.t_stored
         WHEN t.t_new <> b2.id THEN t.t_new END AS dup_of
  FROM b2
  LEFT JOIN bv{rounds} l ON l.id = b2.id
  LEFT JOIN tgt t ON t.lbl = l.lbl
)
SELECT doc_id, dup_of, dup_of IS NULL AS is_kept, CAST(1 AS INT) AS batch
FROM dec1
UNION ALL
SELECT doc_id, dup_of, dup_of IS NULL, CAST(2 AS INT) FROM dec2"""
    return "WITH " + ",\n".join([head] + a_ctes + [mid] + b_ctes) + ",\n" + tail


def q_chunk_documents(chunk_tokens: int = 32, overlap: int = 8) -> str:
    """Oracle for overlapping token chunking: chunk i = tokens
    [i*stride, i*stride+chunk); n_chunks = max(1, ceil((n-overlap)/stride))."""
    stride = chunk_tokens - overlap
    return f"""
WITH t AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {_toks('text')} AS toks
  FROM documents
),
c AS (
  SELECT doc_id, CAST(u.i AS INT) AS chunk_idx,
    toks[CAST(u.i * {stride} + 1 AS BIGINT)
         : CAST(u.i * {stride} + {chunk_tokens} AS BIGINT)] AS ct
  FROM t, UNNEST(generate_series(0,
    CAST(greatest(1, ceil((len(toks) - {overlap}) / {stride}.0)) AS BIGINT) - 1
  )) AS u(i)
  WHERE len(toks) > 0
)
SELECT doc_id, chunk_idx, CAST(len(ct) AS BIGINT) AS n_tokens,
  array_to_string(ct, ' ') AS chunk_text
FROM c
"""


def q_leakage_safe_split(threshold: float = 0.5) -> str:
    """Oracle for the leakage-guarded split over the perturbed corpus:
    split key = near-dup component representative (the one-hop min of
    q_dedup_keep_list — exact on this fixture's star components), then
    the same md5 cumulative-percent assignment as q_split_summary."""
    bucket = _md5_u32_sql("'split|' || split_key") + " % 100"
    return f"""
WITH {_PERTURBED},
t AS (SELECT id, {_toks('text')} AS toks FROM corpus),
sh AS (SELECT id, {_shingle_sql('toks')} AS s FROM t),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM sh a JOIN sh b ON a.id < b.id
  WHERE round(len(list_intersect(a.s, b.s))
    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= {threshold}
),
members AS (
  SELECT id_a AS doc_id, least(id_a, id_b) AS keep FROM pairs
  UNION ALL SELECT id_b, least(id_a, id_b) FROM pairs
),
resolved AS (SELECT doc_id, MIN(keep) AS keep_doc_id FROM members GROUP BY 1),
keyed AS (
  SELECT c.id AS doc_id, COALESCE(r.keep_doc_id, c.id) AS split_key
  FROM corpus c LEFT JOIN resolved r ON r.doc_id = c.id
)
SELECT doc_id, split_key,
  CASE WHEN {bucket} < 80 THEN 'train'
       WHEN {bucket} < 90 THEN 'val' ELSE 'test' END AS split
FROM keyed
"""


def q_curate(min_quality_micro: int = 500_000, threshold: float = 0.5,
             rounds: int = 6) -> str:
    """Oracle for the curate() facade over the perturbed corpus: the
    same four stages composed in SQL — language argmax (q_language_id's
    expressions), quality micro-score (q_quality's), exact content-hash
    dedup among filter survivors, near-dup components among exact-kept
    survivors (min-label unroll, exact at fixture diameters). Reason =
    first failing stage; kept = no reason."""
    langs = sorted(STOPWORDS)
    score_exprs = ",\n    ".join(
        f"len(list_filter(toks, t -> list_contains({_sql_strlist(STOPWORDS[l])}, t)))"
        f" / greatest(len(toks), 1) AS score_{l}"
        for l in langs
    )
    greatest = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN score_{l} = {greatest} THEN '{l}'" for l in langs
    ) + " END"
    en = _sql_strlist(STOPWORDS["en"])
    comp = _unroll_min_label("cv", "vx", "e2", rounds)
    return f"""
WITH {_PERTURBED},
t AS MATERIALIZED (SELECT id, text, {_toks('text')} AS toks FROM corpus),
lp AS (
  SELECT id, {pred} AS lang_pred FROM (SELECT id, {score_exprs} FROM t)
),
qm AS (
  SELECT id,
    CAST(floor((0.5 * (len(list_distinct(toks)) / greatest(len(toks), 1))
      + 0.3 * least((len(list_filter(toks, t -> list_contains({en}, t)))
          / greatest(len(toks), 1)) * 5, 1.0)
      + 0.2 * (CASE WHEN len(toks) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
    ) * 1000000 + 0.5) AS BIGINT) AS quality_micro
  FROM t
),
base AS MATERIALIZED (
  SELECT t.id, t.text, lp.lang_pred, qm.quality_micro,
    lp.lang_pred IN ('en') AS lang_ok,
    qm.quality_micro >= {min_quality_micro} AS q_ok
  FROM t JOIN lp USING (id) JOIN qm USING (id)
),
flt AS (SELECT * FROM base WHERE lang_ok AND q_ok),
eh AS (SELECT id, md5(text) AS h FROM flt),
ek AS (SELECT h, MIN(id) AS ek FROM eh GROUP BY 1),
ex AS MATERIALIZED (
  SELECT eh.id, eh.id <> ek.ek AS exact_dup FROM eh JOIN ek USING (h)
),
shk AS MATERIALIZED (
  SELECT t.id, {_shingle_sql('toks')} AS s
  FROM t JOIN (SELECT id FROM ex WHERE NOT exact_dup) k USING (id)
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM shk a JOIN shk b ON a.id < b.id
  WHERE round(len(list_intersect(a.s, b.s))
    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= {threshold}
),
e2 AS MATERIALIZED (
  SELECT id_a AS x, id_b AS y FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
vx AS (SELECT DISTINCT x AS id FROM e2),
{",".join(comp)},
dec AS (
  SELECT b.id AS doc_id, b.lang_pred, b.quality_micro,
    CASE WHEN NOT b.lang_ok THEN 'language'
         WHEN NOT b.q_ok THEN 'quality'
         WHEN COALESCE(ex.exact_dup, FALSE) THEN 'exact_dup'
         WHEN n.lbl IS NOT NULL AND n.lbl <> b.id THEN 'near_dup'
    END AS reject_reason
  FROM base b
  LEFT JOIN ex ON ex.id = b.id
  LEFT JOIN cv{rounds} n ON n.id = b.id
)
SELECT doc_id, lang_pred, quality_micro, reject_reason,
  reject_reason IS NULL AS kept
FROM dec
"""


def q_duplicate_spans(k: int = 8) -> str:
    """SQL twin of docops.duplicate_spans: identical k-gram md5
    anchoring, >1-occurrence dup rule, and gaps-and-islands merge of
    overlapping/adjacent anchored regions into maximal spans."""
    return f"""
WITH t AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, {_toks('text')} AS tk
           FROM documents),
grams AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
    md5(array_to_string(
      tk[CAST(u.i AS BIGINT) : CAST(u.i + {k} - 1 AS BIGINT)], ' ')) AS h
  FROM t, UNNEST(generate_series(1, len(tk) - {k} + 1)) AS u(i)
  WHERE len(tk) >= {k}
),
dup AS (SELECT h FROM grams GROUP BY h HAVING COUNT(*) > 1),
hits AS (
  SELECT g.doc_id, g.pos, g.pos + {k} - 1 AS e
  FROM grams g SEMI JOIN dup d ON g.h = d.h),
isl AS (
  SELECT doc_id, pos, e,
    CASE WHEN pos > COALESCE(MAX(e) OVER (
        PARTITION BY doc_id ORDER BY pos
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      -1000000000) + 1 THEN 1 ELSE 0 END AS brk
  FROM hits),
isl2 AS (
  SELECT *, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl)
SELECT doc_id,
  CAST(MIN(pos) AS BIGINT) AS span_start,
  CAST(MAX(e) AS BIGINT) AS span_end,
  CAST(MAX(e) - MIN(pos) + 1 AS BIGINT) AS n_tokens
FROM isl2 GROUP BY doc_id, island
"""


def q_source_cap(cap: int = 10) -> str:
    """SQL twin of docops.source_cap — the single-window form; the
    Spark side's two-phase salted rank is provably equivalent (the
    global top-cap per source is a subset of the per-salt top-caps)."""
    return f"""
WITH b AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
  FROM b)
SELECT doc_id, source,
  CASE WHEN rn <= {cap} THEN CAST(rn AS BIGINT) END AS src_rank,
  rn <= {cap} AS kept
FROM r
"""


def q_kcore(k: int = 2, rounds: int = 6) -> str:
    """SQL twin of centrality.kcore — peeling unrolled to the same
    fixed round count (the pagerank/LPA unroll pattern): per round,
    degree over the surviving undirected edge set, keep nodes with
    deg >= k, filter edges to kept-x-kept."""
    steps = []
    for r in range(rounds):
        # MATERIALIZED is load-bearing: every round references the
        # previous round's edge set multiple times; inlined CTEs would
        # re-expand the whole chain exponentially (the LPA-unroll
        # lesson, q_communities)
        steps.append(f"""d{r} AS MATERIALIZED (
  SELECT group_id, name, COUNT(*) AS deg FROM (
    SELECT group_id, a AS name FROM e{r}
    UNION ALL SELECT group_id, b FROM e{r})
  GROUP BY 1, 2),
k{r} AS MATERIALIZED (SELECT group_id, name FROM d{r} WHERE deg >= {k}),
e{r + 1} AS MATERIALIZED (
  SELECT e.* FROM e{r} e
  SEMI JOIN k{r} ka ON ka.group_id = e.group_id AND ka.name = e.a
  SEMI JOIN k{r} kb ON kb.group_id = e.group_id AND kb.name = e.b)""")
    return f"""
WITH {EDGES_CTE},
tnodes AS (SELECT DISTINCT group_id, canonical_name AS name FROM canon_map),
e0 AS MATERIALIZED (
  SELECT DISTINCT group_id, least(subj_name, obj_name) AS a,
         greatest(subj_name, obj_name) AS b
  FROM dedup WHERE subj_name <> obj_name),
{",".join(steps)},
cd AS (
  SELECT group_id, name, CAST(COUNT(*) AS BIGINT) AS core_deg FROM (
    SELECT group_id, a AS name FROM e{rounds}
    UNION ALL SELECT group_id, b FROM e{rounds})
  GROUP BY 1, 2)
SELECT n.group_id, n.name,
  CAST(COALESCE(cd.core_deg, 0) AS BIGINT) AS core_deg,
  COALESCE(cd.core_deg, 0) >= {k} AS in_kcore
FROM tnodes n LEFT JOIN cd USING (group_id, name)
"""


def q_quantized_topk(k: int = 10) -> str:
    """SQL twin of docops.quantized_topk: per-vector symmetric int8
    scalar quantization (q_i = floor(127 * x_i / max|x| + 0.5) —
    round-half-up via floor, which both engines compute identically)
    followed by exact cosine over the QUANTIZED vectors. Symmetric
    scales cancel in cosine, so both engines evaluate an integer dot
    over integer norms: |q| <= 127 and dim = 64 keep every partial sum
    far below 2^53, making the arithmetic exact in doubles with no
    float-summation-order ambiguity — which is what lets a lossy
    compression path be value-hashed cross-engine at all."""
    return f"""
WITH emb AS (
  -- cast to double BEFORE any arithmetic (same rationale as
  -- q_cosine_topk: the engine quantizes from float64)
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
mx AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS m FROM emb
),
q AS (
  SELECT vec_id,
    CASE WHEN m > 0
      THEN list_transform(v, x -> CAST(floor(x * 127.0 / m + 0.5) AS DOUBLE))
      ELSE list_transform(v, x -> CAST(0 AS DOUBLE)) END AS qv
  FROM mx
),
qq AS (SELECT vec_id AS query_id, qv AS qqv FROM q WHERE vec_id < 4),
scored AS (
  SELECT qq.query_id, e.vec_id AS id,
    round(list_dot_product(e.qv, qq.qqv)
      / (sqrt(list_dot_product(e.qv, e.qv))
         * sqrt(list_dot_product(qq.qqv, qq.qqv))), 6) AS score
  FROM q e CROSS JOIN qq
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id)
    AS rank
  FROM scored
)
SELECT query_id, id, score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def q_personalized_pagerank(
    seeds: list[tuple[str, str]], n_iter: int = 10, scale: int = 10**9
) -> str:
    """Unrolled integer personalized PageRank — SQL twin of
    operators/centrality.py::personalized_pagerank (teleport mass goes
    only to the seed entities; same micro-unit floor-division
    arithmetic as q_pagerank, one CTE per iteration)."""
    seed_rows = ", ".join(f"('{g}', '{n}')" for g, n in seeds)
    iters = []
    for k in range(n_iter):
        iters.append(
            f"""r{k + 1} AS (
  SELECT b.group_id, b.name,
    b.is_seed * ((3 * CAST({scale} AS BIGINT)) // (20 * b.s))
      + COALESCE(s.c, 0) AS r
  FROM base b LEFT JOIN (
    SELECT ed.group_id, ed.dst AS name, SUM((17 * r.r) // (20 * ed.outdeg)) AS c
    FROM r{k} r JOIN e_deg ed ON ed.group_id = r.group_id AND ed.src = r.name
    GROUP BY 1, 2
  ) s ON s.group_id = b.group_id AND s.name = b.name
)"""
        )
    return f"""
WITH {EDGES_CTE},
pr_nodes AS (SELECT DISTINCT group_id, canonical_name AS name FROM canon_map),
seeds(group_id, name) AS (VALUES {seed_rows}),
sg AS (SELECT group_id, COUNT(*) AS s FROM seeds GROUP BY 1),
e AS (SELECT DISTINCT group_id, subj_name AS src, obj_name AS dst FROM dedup),
outdeg AS (SELECT group_id, src, COUNT(*) AS outdeg FROM e GROUP BY 1, 2),
e_deg AS (SELECT e.*, o.outdeg FROM e JOIN outdeg o USING (group_id, src)),
base AS (
  SELECT n.group_id, n.name,
    CASE WHEN sd.name IS NULL THEN 0 ELSE 1 END AS is_seed,
    COALESCE(sg.s, 1) AS s
  FROM pr_nodes n
  LEFT JOIN seeds sd ON sd.group_id = n.group_id AND sd.name = n.name
  LEFT JOIN sg ON sg.group_id = n.group_id
),
r0 AS (
  SELECT group_id, name,
    is_seed * (CAST({scale} AS BIGINT) // s) AS r
  FROM base
),
{",".join(iters)}
SELECT group_id, name, CAST(r AS BIGINT) AS ppr_scaled FROM r{n_iter}
"""


def q_link_prediction_ra(
    k: int = 20, max_deg: int | None = None, scale: int = 10**6
) -> str:
    """SQL twin of operators/centrality.py::link_prediction_ra —
    resource-allocation link prediction in integer micro-units
    (floor-division determinism, CAST the summed micro-score back to
    BIGINT: DuckDB SUM(BIGINT) surfaces HUGEINT — the pagerank
    round-3 lesson)."""
    cap = f"WHERE deg <= {max_deg}" if max_deg is not None else ""
    return f"""
WITH {EDGES_CTE},
und AS (
  SELECT DISTINCT group_id,
    LEAST(subj_name, obj_name) AS a,
    GREATEST(subj_name, obj_name) AS b
  FROM dedup WHERE subj_name <> obj_name
),
deg AS (
  SELECT group_id, name, COUNT(*) AS deg FROM (
    SELECT group_id, a AS name FROM und
    UNION ALL SELECT group_id, b FROM und
  ) GROUP BY 1, 2
),
adj AS (
  SELECT * FROM (
    SELECT u.group_id, u.a AS z, u.b AS n, d.deg
    FROM und u JOIN deg d ON d.group_id = u.group_id AND d.name = u.a
    UNION ALL
    SELECT u.group_id, u.b, u.a, d.deg
    FROM und u JOIN deg d ON d.group_id = u.group_id AND d.name = u.b
  ) {cap}
),
pairs AS (
  SELECT l.group_id, l.n AS a, r.n AS b,
    COUNT(*) AS n_common,
    SUM(CAST({scale} AS BIGINT) // l.deg) AS ra_micro
  FROM adj l JOIN adj r ON r.group_id = l.group_id AND r.z = l.z
  WHERE l.n < r.n
  GROUP BY 1, 2, 3
),
missing AS (
  SELECT p.* FROM pairs p
  LEFT JOIN und u ON u.group_id = p.group_id AND u.a = p.a AND u.b = p.b
  WHERE u.a IS NULL
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY group_id
    ORDER BY ra_micro DESC, n_common DESC, a, b
  ) AS rank FROM missing
)
SELECT group_id, a, b, CAST(n_common AS BIGINT) AS n_common,
  CAST(ra_micro AS BIGINT) AS ra_micro, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def q_graph_stats() -> str:
    """SQL twin of operators/centrality.py::graph_stats — per-group
    structural summary (sizes, reciprocity, hub degree, micro-unit
    mean degree). Summed/counted BIGINTs are cast back in the final
    projection (DuckDB SUM/COUNT -> HUGEINT/BIGINT drift guard)."""
    return f"""
WITH {EDGES_CTE},
gnodes AS (SELECT DISTINCT group_id, canonical_name AS name FROM canon_map),
e AS (SELECT DISTINCT group_id, subj_name AS src, obj_name AS dst FROM dedup),
und AS (
  SELECT DISTINCT group_id,
    LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e WHERE src <> dst
),
deg AS (
  SELECT group_id, name, COUNT(*) AS deg FROM (
    SELECT group_id, a AS name FROM und
    UNION ALL SELECT group_id, b FROM und
  ) GROUP BY 1, 2
),
nn AS (SELECT group_id, COUNT(*) AS n_nodes FROM gnodes GROUP BY 1),
ne AS (SELECT group_id, COUNT(*) AS n_edges FROM e GROUP BY 1),
nu AS (SELECT group_id, COUNT(*) AS n_und_pairs FROM und GROUP BY 1),
rec AS (
  SELECT x.group_id, COUNT(*) AS n_reciprocal
  FROM e x JOIN e y
    ON y.group_id = x.group_id AND y.src = x.dst AND y.dst = x.src
  WHERE x.src < x.dst
  GROUP BY 1
),
od AS (
  SELECT group_id, MAX(c) AS max_out_deg FROM (
    SELECT group_id, src, COUNT(*) AS c FROM e GROUP BY 1, 2
  ) GROUP BY 1
),
dd AS (
  SELECT group_id, MAX(deg) AS max_deg, SUM(deg) AS sum_deg
  FROM deg GROUP BY 1
)
SELECT nn.group_id,
  CAST(nn.n_nodes AS BIGINT) AS n_nodes,
  CAST(COALESCE(ne.n_edges, 0) AS BIGINT) AS n_edges,
  CAST(COALESCE(nu.n_und_pairs, 0) AS BIGINT) AS n_und_pairs,
  CAST(COALESCE(rec.n_reciprocal, 0) AS BIGINT) AS n_reciprocal,
  CAST(COALESCE(od.max_out_deg, 0) AS BIGINT) AS max_out_deg,
  CAST(COALESCE(dd.max_deg, 0) AS BIGINT) AS max_deg,
  CAST(COALESCE(dd.sum_deg, 0) * 1000000 // nn.n_nodes AS BIGINT)
    AS avg_deg_micro
FROM nn
LEFT JOIN ne USING (group_id)
LEFT JOIN nu USING (group_id)
LEFT JOIN rec USING (group_id)
LEFT JOIN od USING (group_id)
LEFT JOIN dd USING (group_id)
"""


def q_fact_churn() -> str:
    """SQL twin of operators/temporal.py::fact_churn — monthly
    started/invalidated/expired lifecycle counts over the bi-temporal
    edge ledger ('yyyy-MM' keys on UTC timestamps)."""
    return f"""
WITH {EDGES_CTE},
ev AS (
  SELECT group_id, strftime(valid_at, '%Y-%m') AS month, 'started' AS kind
  FROM edges WHERE valid_at IS NOT NULL
  UNION ALL
  SELECT group_id, strftime(invalid_at, '%Y-%m'), 'invalidated'
  FROM edges WHERE invalid_at IS NOT NULL
  UNION ALL
  SELECT group_id, strftime(expired_at, '%Y-%m'), 'expired'
  FROM edges WHERE expired_at IS NOT NULL
)
SELECT group_id, month,
  CAST(SUM(CASE WHEN kind = 'started' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_started,
  CAST(SUM(CASE WHEN kind = 'invalidated' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_invalidated,
  CAST(SUM(CASE WHEN kind = 'expired' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_expired
FROM ev GROUP BY 1, 2
"""


def q_semantic_dedup_keep_list(
    threshold: float = 0.9, every: int = 50, rounds: int = 4
) -> str:
    """SQL twin of docops.semantic_dedup_keep_list on the planted
    corpus of q_embedding_near_dup: pairs come from an INDEPENDENT
    exact all-pairs cosine (stronger than mirroring the hyperplane
    blocking), components from min-label propagation unrolled a fixed
    ``rounds`` iterations (covers any component of diameter ≤ rounds;
    the planted clusters are twin pairs, diameter 1 — pinned by the
    n-distinct check in pytest). Keep = numeric-min vec_id."""
    iters = []
    for k in range(rounds):
        iters.append(
            f"""m{k + 1} AS (
  SELECT m.id, LEAST(m.lbl, COALESCE(MIN(n.lbl), m.lbl)) AS lbl
  FROM m{k} m
  LEFT JOIN adj a ON a.u = m.id
  LEFT JOIN m{k} n ON n.id = a.v
  GROUP BY m.id, m.lbl
)"""
        )
    return f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
planted AS (
  SELECT vec_id + 100000 AS vec_id,
    list_transform(v, x -> x * 1.07) AS v
  FROM base WHERE vec_id % {every} = 0
),
allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM allv a JOIN allv b ON a.vec_id < b.vec_id
  WHERE round(
    list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
    6) >= {threshold}
),
adj AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
verts AS (SELECT DISTINCT u AS id FROM adj),
m0 AS (SELECT id, id AS lbl FROM verts),
{",".join(iters)}
SELECT CAST(id AS BIGINT) AS vec_id,
  CAST(lbl AS BIGINT) AS keep_vec_id,
  id = lbl AS is_kept
FROM m{rounds}
"""


def q_lm_perplexity(alpha: float = 1.0) -> str:
    """SQL twin of docops.lm_perplexity (self-scoring configuration):
    add-alpha bigram LM trained on documents, integer micro-nat
    logprobs floored once per distinct LM bigram, pure-BIGINT per-doc
    sums, all-integer tercile cut. SUM(BIGINT) results are cast back
    to BIGINT (DuckDB widens to HUGEINT — the round-3 pagerank
    lesson)."""
    return f"""
WITH t AS (SELECT doc_id, {_toks('text')} AS toks FROM documents),
bg AS (SELECT doc_id, unnest({_gram_sql(2)}) AS bigram FROM t),
dbg AS (SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2),
c2 AS (SELECT bigram, CAST(SUM(cnt) AS BIGINT) AS c2 FROM dbg GROUP BY 1),
c1 AS (
  SELECT string_split(bigram, ' ')[1] AS prev, CAST(SUM(c2) AS BIGINT) AS c1
  FROM c2 GROUP BY 1
),
v AS (
  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
  FROM (SELECT unnest(toks) AS tok FROM t)
),
lp AS (
  SELECT dbg.doc_id, dbg.cnt,
    CAST(floor(ln(
      (COALESCE(c2.c2, 0) + {alpha})
        / (COALESCE(c1.c1, 0) + {alpha} * v.v)
    ) * 1000000 + 0.5) AS BIGINT) AS lp_micro
  FROM dbg
  LEFT JOIN c2 USING (bigram)
  LEFT JOIN c1 ON c1.prev = string_split(dbg.bigram, ' ')[1]
  CROSS JOIN v
),
perdoc AS (
  SELECT doc_id,
    CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
    CAST(-SUM(cnt * lp_micro) AS BIGINT) AS nll_micro
  FROM lp GROUP BY 1
),
scored AS (
  SELECT doc_id, n_bigrams, nll_micro,
    CAST(floor(nll_micro * 1.0 / n_bigrams) AS BIGINT) AS ce_micro
  FROM perdoc
),
ranked AS (
  SELECT *,
    row_number() OVER (ORDER BY ce_micro, doc_id) AS rn,
    count(*) OVER () AS nd
  FROM scored
),
empties AS (
  SELECT doc_id FROM t WHERE len(toks) < 2
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_bigrams, nll_micro, ce_micro,
  CASE WHEN rn * 3 <= nd THEN 'head'
       WHEN rn * 3 <= nd * 2 THEN 'middle'
       ELSE 'tail' END AS ppl_bucket
FROM ranked
UNION ALL
SELECT CAST(doc_id AS BIGINT), CAST(0 AS BIGINT), NULL, NULL, NULL
FROM empties
"""


def _kmeans_cte_chain(pfx: str, src: str, k: int, iters: int) -> str:
    """CTE chain fitting one deterministic integer k-means codebook
    from source CTE ``src`` (vec_id, qv) — maximin seeding unrolled
    per seed, ``iters`` unrolled Lloyd's iterations, every table name
    prefixed with ``pfx`` so product quantization can instantiate one
    chain per subspace. Final centroids: ``{pfx}c{iters}`` (cid,
    cvec). With pfx='' and src='q' this reproduces the pre-refactor
    q_kmeans_clusters body up to a harmless self-alias (``FROM q q``)
    — verified RESULT-identical against the stored pre-refactor SQL,
    and the green kmeans driver parity is the generator's standing
    regression test."""
    seed_steps = []
    for j in range(1, k):
        seed_steps.append(
            f"""{pfx}d{j} AS MATERIALIZED (
  SELECT q.vec_id,
    MIN(list_sum(list_transform(range(1, len(q.qv) + 1),
      i -> (q.qv[i] - g.cvec[i]) * (q.qv[i] - g.cvec[i])))) AS mind
  FROM {src} q CROSS JOIN {pfx}g{j} g GROUP BY q.vec_id
),
{pfx}s{j} AS MATERIALIZED (
  SELECT {j} AS cid, q.qv AS cvec
  FROM {src} q JOIN (
    SELECT vec_id FROM {pfx}d{j} ORDER BY mind DESC, vec_id LIMIT 1
  ) t USING (vec_id)
),
{pfx}g{j + 1} AS MATERIALIZED (SELECT * FROM {pfx}g{j} UNION ALL SELECT * FROM {pfx}s{j})"""
        )
    steps = []
    for t in range(iters):
        steps.append(
            f"""{pfx}a{t} AS MATERIALIZED (
  SELECT vec_id, qv, cid,
    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM (
    SELECT q.vec_id, q.qv, c.cid,
      list_sum(list_transform(range(1, len(q.qv) + 1),
        i -> (q.qv[i] - c.cvec[i]) * (q.qv[i] - c.cvec[i]))) AS dist
    FROM {src} q CROSS JOIN {pfx}c{t} c
  )
),
{pfx}e{t} AS MATERIALIZED (
  SELECT cid,
    unnest(list_transform(range(1, len(qv) + 1),
      i -> {{'pos': i, 'val': qv[i]}})) AS u
  FROM {pfx}a{t} WHERE rn = 1
),
{pfx}n{t} AS MATERIALIZED (
  SELECT cid, list(cv ORDER BY pos) AS cvec
  FROM (
    SELECT cid, u.pos AS pos,
      floor(SUM(u.val) * 1.0 / COUNT(*)) AS cv
    FROM {pfx}e{t} GROUP BY 1, 2
  ) GROUP BY cid
),
{pfx}c{t + 1} AS MATERIALIZED (
  SELECT p.cid, COALESCE(n.cvec, p.cvec) AS cvec
  FROM {pfx}c{t} p LEFT JOIN {pfx}n{t} n USING (cid)
)"""
        )
    g1 = f"""{pfx}g1 AS MATERIALIZED (
  SELECT 0 AS cid, qv AS cvec
  FROM {src}
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT 1
)"""
    c0 = (
        f"{pfx}c0 AS MATERIALIZED "
        f"(SELECT CAST(cid AS INT) AS cid, cvec FROM {pfx}g{k})"
    )
    # list-compose so k=1 (no seed steps) and iters=0 (no Lloyd steps)
    # emit parseable SQL instead of dangling commas
    return ",\n".join([g1, *seed_steps, c0, *steps])


_QUANT_CTES = """emb AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
mx AS MATERIALIZED (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS m FROM emb
),
q AS MATERIALIZED (
  SELECT vec_id,
    CASE WHEN m > 0
      THEN list_transform(v, x -> CAST(floor(x * 127.0 / m + 0.5) AS DOUBLE))
      ELSE list_transform(v, x -> CAST(0 AS DOUBLE)) END AS qv
  FROM mx
)"""


def q_kmeans_clusters(k: int = 8, iters: int = 4) -> str:
    """SQL twin of docops.kmeans_clusters: symmetric-int8 quantization
    (the q_quantized_topk CTE), deterministic MAXIMIN seeding (seed 0 =
    lowest md5(vec_id); each next seed maximizes min-distance to the
    chosen set, ties -> lowest vec_id) unrolled per seed, and ``iters``
    unrolled Lloyd's iterations — chain generated by
    :func:`_kmeans_cte_chain`. All arithmetic is integer (distances =
    integer sums of squares, centroid dims = floor(sum/count)), so the
    trajectory is bit-identical to Spark's. Empty clusters keep their
    previous centroid (LEFT JOIN + COALESCE)."""
    return f"""
WITH {_QUANT_CTES},
{_kmeans_cte_chain("", "q", k, iters)},
final AS MATERIALIZED (
  SELECT q.vec_id, c.cid,
    list_sum(list_transform(range(1, len(q.qv) + 1),
      i -> (q.qv[i] - c.cvec[i]) * (q.qv[i] - c.cvec[i]))) AS dist
  FROM q CROSS JOIN c{iters} c
),
best AS MATERIALIZED (
  SELECT vec_id, cid, dist,
    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM final
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cid AS INT) AS cluster,
  CAST(dist AS BIGINT) AS dist
FROM best WHERE rn = 1
"""


def q_corpus_profile(quantiles: tuple = (25, 50, 75, 95)) -> str:
    """SQL twin of docops.corpus_profile: exact discrete lower-quantile
    ranks over the per-source length histogram — DuckDB ``//`` mirrors
    the Spark side's floor, every aggregate CAST to BIGINT."""
    qcols = ",\n  ".join(
        f"CAST(MIN(CASE WHEN cum >= (n_docs - 1) * {q} // 100 + 1 "
        f"THEN n_chars END) AS BIGINT) AS p{q}_chars"
        for q in quantiles
    )
    return f"""
WITH hist AS (
  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents GROUP BY 1, 2
),
ranked AS (
  SELECT source, n_chars, cnt,
    SUM(cnt) OVER (PARTITION BY source ORDER BY n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    SUM(cnt) OVER (PARTITION BY source) AS n_docs
  FROM hist
),
prof AS (
  SELECT source,
    CAST(MAX(n_docs) AS BIGINT) AS n_docs,
    CAST(SUM(n_chars * cnt) AS BIGINT) AS total_chars,
    {qcols}
  FROM ranked GROUP BY 1
),
langs AS (
  SELECT source, CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
  FROM documents GROUP BY 1
)
SELECT p.source, p.n_docs, p.total_chars, l.n_langs,
  {", ".join(f"p.p{q}_chars" for q in quantiles)}
FROM prof p JOIN langs l ON l.source = p.source
"""


def q_contamination_overlap(
    n: int = 4, dirty_threshold_micro: int = 100_000
) -> str:
    """SQL twin of docops.contamination_overlap (train = doc_id % 10
    <> 7, eval = doc_id % 10 = 7, matching q_decontaminate's split).
    Micro fraction via DuckDB ``//`` = Spark ``DIV``."""
    return f"""
WITH t AS (SELECT doc_id, {_toks('text')} AS toks FROM documents),
g AS (SELECT doc_id, list_distinct({_gram_sql(n)}) AS grams FROM t),
ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 10 = 7),
tr AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 10 <> 7),
hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c FROM tr JOIN ev USING (gram) GROUP BY 1),
scored AS (
  SELECT CAST(g.doc_id AS BIGINT) AS doc_id,
    CAST(len(g.grams) AS BIGINT) AS n_grams,
    CAST(COALESCE(hit.c, 0) AS BIGINT) AS n_hit
  FROM g LEFT JOIN hit USING (doc_id)
  WHERE g.doc_id % 10 <> 7
),
m AS (
  SELECT doc_id, n_grams, n_hit,
    CAST(CASE WHEN n_grams > 0 THEN 1000000 * n_hit // n_grams ELSE 0 END AS BIGINT)
      AS overlap_micro
  FROM scored
)
SELECT doc_id, n_grams, n_hit, overlap_micro,
  CASE WHEN overlap_micro >= {dirty_threshold_micro} THEN 'dirty'
       WHEN overlap_micro > 0 THEN 'partial'
       ELSE 'clean' END AS bucket
FROM m
"""


def q_dsir_weights(n_buckets: int = 1024, alpha: float = 1.0) -> str:
    """SQL twin of docops.dsir_weights (raw = doc_id % 10 <> 7, target
    = doc_id % 10 = 7, matching the decontaminate split). One ln per
    distinct bucket floored to micro-nats; per-doc sums are BIGINT."""
    a = float(alpha)
    ab = a * n_buckets
    bucket = _md5_u32_sql("'dsir|' || tok") + f" % {n_buckets}"
    return f"""
WITH t AS (SELECT doc_id, {_toks('text')} AS toks FROM documents),
tokens AS (SELECT doc_id, unnest(toks) AS tok FROM t),
b AS (SELECT doc_id, {bucket} AS bucket FROM tokens),
raw AS (SELECT * FROM b WHERE doc_id % 10 <> 7),
tgt AS (SELECT * FROM b WHERE doc_id % 10 = 7),
cr AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c FROM raw GROUP BY 1),
ct AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c FROM tgt GROUP BY 1),
tot AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM raw) AS tr,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM tgt) AS tt
),
grid AS (SELECT CAST(unnest(range({n_buckets})) AS BIGINT) AS bucket),
buckets AS (
  SELECT g.bucket,
    CAST(floor(ln(
      ((COALESCE(ct.c, 0) + {a}) * (tot.tr + {ab}))
      / ((COALESCE(cr.c, 0) + {a}) * (tot.tt + {ab}))
    ) * 1000000 + 0.5) AS BIGINT) AS lr_micro
  FROM grid g
  LEFT JOIN cr ON cr.bucket = g.bucket
  LEFT JOIN ct ON ct.bucket = g.bucket
  CROSS JOIN tot
),
pdb AS (
  SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM raw GROUP BY 1, 2
),
scored AS (
  SELECT doc_id,
    CAST(SUM(cnt) AS BIGINT) AS n_tokens,
    CAST(SUM(cnt * lr_micro) AS BIGINT) AS dsir_micro
  FROM pdb JOIN buckets USING (bucket)
  GROUP BY 1
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
  CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
  CAST(s.dsir_micro AS BIGINT) AS dsir_micro
FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 7) d
LEFT JOIN scored s ON s.doc_id = d.doc_id
"""


def q_interleave_profile() -> str:
    """SQL twin of interleave.interleave_profile — INDEPENDENT
    formulation: the Spark side scans the spans ARRAY with per-row
    higher-order functions (no explode, no windows); this oracle
    explodes the expected span sequence and rebuilds runs with
    lag/partition windows. Agreement checks semantics, not code."""
    from .oracle import SPANS_CTE
    from . import corpus

    return f"""
WITH {SPANS_CTE},
g AS (
  SELECT doc_id, "offset", kind, text, media_ref,
    row_number() OVER w AS rn,
    CASE WHEN lag(kind) OVER w IS DISTINCT FROM kind THEN 1 ELSE 0 END AS newrun
  FROM all_spans
  WINDOW w AS (PARTITION BY doc_id ORDER BY "offset")
),
r AS (
  SELECT *, sum(newrun) OVER (PARTITION BY doc_id ORDER BY "offset"
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM g
),
runs AS (
  SELECT doc_id, run_id, any_value(kind) AS kind, count(*) AS run_len
  FROM r GROUP BY doc_id, run_id
),
per_run AS (
  SELECT doc_id, max(run_id) AS n_runs,
    max(CASE WHEN kind = 'text' THEN run_len ELSE 0 END) AS max_text_run
  FROM runs GROUP BY doc_id
),
per_doc AS (
  SELECT doc_id,
    count(*) AS n_spans,
    sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS n_text,
    sum(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS n_media,
    sum(CASE WHEN kind = 'text' THEN len({_toks('text')}) ELSE 0 END) AS text_tokens,
    bool_and(COALESCE("offset" = rn - 1, false)) AS offsets_ok,
    bool_and(COALESCE((COALESCE(kind = 'media', false)) = (COALESCE(media_ref, '') <> ''), false)) AS refs_ok,
    bool_and(COALESCE(kind IN ('text', 'media'), false)) AS kinds_ok,
    arg_min(kind, "offset") AS first_kind,
    arg_max(kind, "offset") AS last_kind
  FROM r GROUP BY doc_id
)
SELECT p.doc_id,
  'g' || CAST(c.d % {corpus.N_GROUPS} AS VARCHAR) AS group_id,
  CAST(p.n_spans AS BIGINT) AS n_spans,
  CAST(p.n_text AS BIGINT) AS n_text,
  CAST(p.n_media AS BIGINT) AS n_media,
  CAST(pr.n_runs AS BIGINT) AS n_runs,
  CAST(pr.max_text_run AS BIGINT) AS max_text_run,
  CAST(p.text_tokens AS BIGINT) AS text_tokens,
  CAST(p.n_media * 1000000 // p.n_spans AS BIGINT) AS media_fraction_micro,
  p.first_kind, p.last_kind, p.offsets_ok, p.refs_ok, p.kinds_ok
FROM per_doc p
JOIN per_run pr USING (doc_id)
JOIN cfg c ON c.doc_id = p.doc_id
"""


def q_pack_interleaved(
    budget: int = 512, n_streams: int = 8, media_tokens: int = 64
) -> str:
    """SQL twin of interleave.pack_interleaved: per-episode cost from
    the expected span sequence (text spans tokenized, media spans a
    fixed charge), then the identical md5 stream-deal + cumulative-sum
    chunk arithmetic as q_pack_documents."""
    from .oracle import SPANS_CTE

    stream = _md5_u32_sql("'ipack|' || doc_id") + f" % {n_streams}"
    ordk = _md5_u32_sql("'iord|' || doc_id")
    return f"""
WITH {SPANS_CTE},
cost AS (
  SELECT doc_id,
    CAST(sum(CASE WHEN kind = 'text' THEN len({_toks('text')})
             ELSE {media_tokens} END) AS BIGINT) AS n_tokens,
    CAST(sum(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS BIGINT) AS n_media
  FROM all_spans GROUP BY doc_id
),
t AS (
  SELECT doc_id, n_tokens, n_media,
    CAST({stream} AS INT) AS stream, {ordk} AS ord
  FROM cost
),
c AS (
  SELECT doc_id, stream, n_tokens, n_media,
    sum(n_tokens) OVER (PARTITION BY stream ORDER BY ord, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
  FROM t
)
SELECT doc_id, stream, n_tokens, n_media,
  CAST(cum_end - n_tokens AS BIGINT) AS start_off,
  CAST(floor((cum_end - n_tokens) / {budget}) AS BIGINT) AS first_chunk,
  CAST(greatest(floor((cum_end - n_tokens) / {budget}),
                floor((cum_end - 1) / {budget})) AS BIGINT) AS last_chunk
FROM c
"""


def q_token_cardinality(k: int = 128) -> str:
    """SQL twin of docops.token_cardinality (KMV distinct sketch):
    identical u32 hashing, per-group bottom-k, and BIGINT-floor
    estimate — every bit of the sketch arithmetic reproduced."""
    h = _md5_u32_sql("'kmv|' || token")
    return f"""
WITH tok AS (
  SELECT source, unnest({_toks('text')}) AS token FROM documents
),
h AS (SELECT DISTINCT source, {h} AS h FROM tok),
r AS (
  SELECT source, h,
    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM h
),
sk AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
    CAST(max(h) AS BIGINT) AS kth_hash
  FROM r WHERE rn <= {k} GROUP BY source
)
SELECT source, n_kept, kth_hash,
  CAST(CASE WHEN n_kept < {k} THEN n_kept
       ELSE CAST({k - 1} AS BIGINT) * 4294967296 // greatest(kth_hash, 1)
       END AS BIGINT) AS est_distinct
FROM sk
"""


def q_dedup_keep_best(threshold: float = 0.5) -> str:
    """SQL twin of docops.dedup_keep_best on the planted perturbed
    corpus: same components as q_dedup_keep_list, keep = longest text
    (ties → min doc_id). On this corpus every perturbed twin is longer
    than its original, so best flips from the min-id choice — the
    oracle verifies the quality rule is actually exercised."""
    return f"""
WITH {_PERTURBED},
sh AS (SELECT id, {_shingle_sql(_toks('text'))} AS s FROM corpus),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM sh a JOIN sh b ON a.id < b.id
  WHERE round(len(list_intersect(a.s, b.s))
    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= {threshold}
),
members0 AS (
  SELECT id_a AS doc_id, least(id_a, id_b) AS keep FROM pairs
  UNION ALL SELECT id_b, least(id_a, id_b) FROM pairs
),
resolved AS (SELECT doc_id, MIN(keep) AS cluster_id FROM members0 GROUP BY 1),
lens AS (SELECT id, CAST(length(text) AS BIGINT) AS n_chars FROM corpus),
members AS (
  SELECT r.doc_id, r.cluster_id, l.n_chars
  FROM resolved r JOIN lens l ON l.id = r.doc_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM members
),
best AS (SELECT cluster_id, doc_id AS best_doc_id FROM ranked WHERE rn = 1)
SELECT m.doc_id, m.cluster_id, b.best_doc_id,
  m.doc_id = b.best_doc_id AS is_kept
FROM members m JOIN best b USING (cluster_id)
"""


def q_containment_pairs(threshold: float = 0.8) -> str:
    """Brute-force ALL-PAIRS directional containment on the planted
    perturbed corpus — independent of the Spark side's prefix-filtered
    candidate generation, so the prefix lemma's exact-recall claim is
    what the parity check verifies."""
    return f"""
WITH {_PERTURBED},
sh AS (SELECT id, {_shingle_sql(_toks('text'))} AS s FROM corpus),
pairs AS (
  SELECT a.id AS id_contained, b.id AS id_container,
    round(len(list_intersect(a.s, b.s)) / len(a.s), 6) AS containment
  FROM sh a JOIN sh b ON a.id <> b.id
  WHERE len(a.s) > 0
)
SELECT id_contained, id_container, containment
FROM pairs WHERE containment >= {threshold}
"""


def q_pq_topk(m: int = 4, k_codes: int = 8, iters: int = 2, k: int = 10) -> str:
    """SQL twin of docops.pq_topk: the SAME int8 quantization, one
    :func:`_kmeans_cte_chain` per subspace over list_slice'd
    sub-vectors, argmin code assignment, and ADC cosine scoring —
    numerators/denominator-squares integer end to end, the final
    sqrt/division computed from identical integers in both engines
    (both norms floored at 1, matching the Spark guard) and rounded to
    6 places. Sub-vector bounds derive from ``len(qv) // m`` IN SQL —
    no hardcoded dimension to drift from the data (a stale dim would
    make list_slice silently clamp and score garbage). Queries =
    corpus vectors vec_id < 4 (the driver convention shared with
    cosine/quantized_topk)."""
    sub = f"(len(qv) // {m})"
    chains, cent_unions, src_ctes = [], [], []
    for j in range(m):
        src_ctes.append(
            f"p{j}src AS MATERIALIZED (SELECT vec_id, "
            f"list_slice(qv, {j} * {sub} + 1, ({j} + 1) * {sub}) AS qv FROM q)"
        )
        chains.append(_kmeans_cte_chain(f"p{j}", f"p{j}src", k_codes, iters))
        cent_unions.append(f"SELECT {j} AS sub, cid, cvec FROM p{j}c{iters}")
    return f"""
WITH {_QUANT_CTES},
{",".join(src_ctes)},
{",".join(chains)},
cents AS MATERIALIZED ({" UNION ALL ".join(cent_unions)}),
subrows AS MATERIALIZED (
  SELECT vec_id, CAST(u.s AS INT) AS sub,
    list_slice(qv, u.s * (len(qv) // {m}) + 1, (u.s + 1) * (len(qv) // {m})) AS subvec
  FROM q, UNNEST(generate_series(0, {m - 1})) AS u(s)
),
assign AS MATERIALIZED (
  SELECT vec_id, sub, cid,
    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
  FROM (
    SELECT r.vec_id, r.sub, c.cid,
      list_sum(list_transform(range(1, len(r.subvec) + 1),
        i -> (r.subvec[i] - c.cvec[i]) * (r.subvec[i] - c.cvec[i]))) AS dist
    FROM subrows r JOIN cents c USING (sub)
  )
),
codes AS MATERIALIZED (SELECT vec_id, sub, cid FROM assign WHERE rn = 1),
qq AS MATERIALIZED (
  SELECT vec_id AS query_id, qv AS qqv,
    CAST(list_dot_product(qv, qv) AS BIGINT) AS qn2
  FROM q WHERE vec_id < 4
),
qtab AS MATERIALIZED (
  SELECT qq.query_id, c.sub, c.cid,
    CAST(list_dot_product(
      list_slice(qq.qqv, c.sub * (len(qq.qqv) // {m}) + 1,
                 (c.sub + 1) * (len(qq.qqv) // {m})), c.cvec
    ) AS BIGINT) AS dotv,
    CAST(list_dot_product(c.cvec, c.cvec) AS BIGINT) AS cn2,
    qq.qn2
  FROM qq CROSS JOIN cents c
),
scored AS MATERIALIZED (
  SELECT t.query_id, co.vec_id AS id,
    round(SUM(t.dotv)
      / (sqrt(greatest(MAX(t.qn2), 1)) * sqrt(greatest(SUM(t.cn2), 1))), 6) AS score
  FROM codes co JOIN qtab t USING (sub, cid)
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id)
    AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(id AS BIGINT) AS id,
  score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def q_interleave_summary() -> str:
    """SQL twin of interleave.interleave_summary: wraps the profile
    oracle (itself an independent explode+window formulation) in the
    per-group rollup."""
    return f"""
WITH prof AS ({q_interleave_profile()})
SELECT group_id,
  CAST(count(*) AS BIGINT) AS n_episodes,
  CAST(sum(n_spans) AS BIGINT) AS n_spans,
  CAST(sum(n_media) AS BIGINT) AS n_media,
  CAST(sum(text_tokens) AS BIGINT) AS text_tokens,
  CAST(CASE WHEN sum(n_spans) > 0
       THEN sum(n_media) * 1000000 // sum(n_spans) ELSE 0 END AS BIGINT)
    AS media_fraction_micro,
  CAST(max(max_text_run) AS BIGINT) AS max_text_run,
  CAST(sum(CASE WHEN offsets_ok AND refs_ok AND kinds_ok THEN 0 ELSE 1 END)
    AS BIGINT) AS n_contract_violations
FROM prof GROUP BY group_id
"""


# ---------------------------------------------------------------------------
# GNN training-data export (operators/gnn.py)
# ---------------------------------------------------------------------------

_GNN_IDX_CTES = """
gnodes AS (SELECT DISTINCT group_id, canonical_name AS name FROM canon_map),
idx AS (
  SELECT group_id, name,
    CAST(row_number() OVER (PARTITION BY group_id ORDER BY name) - 1 AS BIGINT)
      AS node_idx
  FROM gnodes
)"""


def q_gnn_nodes() -> str:
    """SQL twin of gnn.node_index — contiguous per-group node ids."""
    return f"""
WITH {EDGES_CTE},
{_GNN_IDX_CTES}
SELECT group_id, name, node_idx FROM idx
"""


def q_gnn_edges() -> str:
    """SQL twin of gnn.edge_index — COO edge index + dense relation
    vocabulary over the distinct canonical triples."""
    return f"""
WITH {EDGES_CTE},
{_GNN_IDX_CTES},
rel AS (
  SELECT predicate,
    CAST(row_number() OVER (ORDER BY predicate) - 1 AS BIGINT) AS rel_idx
  FROM (SELECT DISTINCT predicate FROM edges)
),
e AS (SELECT DISTINCT group_id, subj_name, predicate, obj_name FROM edges)
SELECT e.group_id, si.node_idx AS src_idx, rel.rel_idx, oi.node_idx AS dst_idx,
  e.subj_name, e.predicate, e.obj_name
FROM e
JOIN idx si ON si.group_id = e.group_id AND si.name = e.subj_name
JOIN idx oi ON oi.group_id = e.group_id AND oi.name = e.obj_name
JOIN rel USING (predicate)
"""


def q_gnn_negatives(n_neg: int = 3) -> str:
    """SQL twin of gnn.negative_edges — md5-ranked filtered negative
    sampling (drop-on-collision, no redraw)."""
    h = _md5_u32_sql(
        "'neg|' || p.group_id || '|' || p.src_name || '|' || p.dst_name "
        "|| '|' || CAST(d.j AS VARCHAR)"
    )
    return f"""
WITH {EDGES_CTE},
{_GNN_IDX_CTES},
pos AS (
  SELECT DISTINCT group_id, subj_name AS src_name, obj_name AS dst_name FROM edges
),
ngc AS (SELECT group_id, MAX(node_idx) AS max_idx FROM idx GROUP BY 1),
draws AS (
  SELECT p.group_id, p.src_name, p.dst_name, CAST(d.j AS INT) AS j,
    {h} % (ngc.max_idx + 1) AS neg_idx
  FROM pos p
  JOIN ngc USING (group_id),
  UNNEST(generate_series(0, {n_neg - 1})) AS d(j)
),
cand AS (
  SELECT dr.group_id, dr.src_name, dr.dst_name, dr.j, i.name AS neg_name,
    dr.neg_idx
  FROM draws dr
  JOIN idx i ON i.group_id = dr.group_id AND i.node_idx = dr.neg_idx
  WHERE i.name <> dr.src_name AND i.name <> dr.dst_name
)
SELECT group_id, src_name, dst_name, j, neg_name, neg_idx
FROM cand c
WHERE NOT EXISTS (
  SELECT 1 FROM pos p
  WHERE p.group_id = c.group_id AND p.src_name = c.src_name
    AND p.dst_name = c.neg_name
)
"""


def q_temporal_split(
    train_end: str = "2019-01-01 00:00:00",
    valid_end: str = "2022-01-01 00:00:00",
) -> str:
    """SQL twin of gnn.temporal_edge_split — event-time split with
    inductive (unseen-endpoint) flags."""
    return f"""
WITH {EDGES_CTE},
e AS (
  SELECT DISTINCT group_id, subj_name, predicate, obj_name, valid_at FROM edges
),
s AS (
  SELECT *,
    CASE WHEN valid_at IS NULL OR valid_at < TIMESTAMP '{train_end}' THEN 'train'
         WHEN valid_at < TIMESTAMP '{valid_end}' THEN 'valid'
         ELSE 'test' END AS split
  FROM e
),
tn AS (
  SELECT DISTINCT group_id, name FROM (
    SELECT group_id, subj_name AS name FROM s WHERE split = 'train'
    UNION ALL SELECT group_id, obj_name FROM s WHERE split = 'train'
  )
)
SELECT s.group_id, s.subj_name, s.predicate, s.obj_name, s.valid_at, s.split,
  (s.split <> 'train' AND sn.name IS NULL) AS src_unseen,
  (s.split <> 'train' AND od.name IS NULL) AS dst_unseen
FROM s
LEFT JOIN tn sn ON sn.group_id = s.group_id AND sn.name = s.subj_name
LEFT JOIN tn od ON od.group_id = s.group_id AND od.name = s.obj_name
"""


def q_fact_diff(
    t1: str = "2017-06-01 00:00:00",
    t2: str = "2022-06-01 00:00:00",
) -> str:
    """SQL twin of temporal.fact_diff — assertions visible at t2 but
    not t1 ('added') and vice versa ('removed')."""
    def vis(name: str, t: str) -> str:
        return f"""{name} AS (
  SELECT DISTINCT group_id, subj_name, predicate, obj_name, valid_at
  FROM edges
  WHERE valid_at <= TIMESTAMP '{t}'
    AND (invalid_at IS NULL OR invalid_at > TIMESTAMP '{t}')
)"""

    return f"""
WITH {EDGES_CTE},
{vis('v1', t1)},
{vis('v2', t2)}
SELECT group_id, subj_name, predicate, obj_name, valid_at, 'added' AS status
FROM v2 b
WHERE NOT EXISTS (
  SELECT 1 FROM v1 a
  WHERE a.group_id = b.group_id AND a.subj_name = b.subj_name
    AND a.predicate = b.predicate AND a.obj_name = b.obj_name
    AND a.valid_at = b.valid_at
)
UNION ALL
SELECT group_id, subj_name, predicate, obj_name, valid_at, 'removed' AS status
FROM v1 a
WHERE NOT EXISTS (
  SELECT 1 FROM v2 b
  WHERE b.group_id = a.group_id AND b.subj_name = a.subj_name
    AND b.predicate = a.predicate AND b.obj_name = a.obj_name
    AND b.valid_at = a.valid_at
)
"""


# ---------------------------------------------------------------------------
# URL provenance ops (operators/urls.py)
# ---------------------------------------------------------------------------

def _url_ctes() -> str:
    """Synthetic-URL construction (mirror of __spark_entry__._with_urls)
    + canonicalization (mirror of urls.canonical_urls), shared by the
    three URL oracles. Defines u(doc_id, url) and
    c(doc_id, url, host, canonical_url)."""
    from .operators.urls import TRACKING_PARAMS

    tracked = _sql_strlist(TRACKING_PARAMS)
    e3 = "(doc_id // 3)"
    return f"""
u AS (
  SELECT doc_id,
    CASE WHEN {e3} % 5 = 0 THEN 'HTTPS' ELSE 'https' END
    || '://'
    || list_extract(['', 'www.', 'news.'], CAST(doc_id % 3 AS INT) + 1)
    || CASE WHEN {e3} % 7 = 0
            THEN upper('site' || CAST({e3} % 20 AS VARCHAR))
            ELSE 'site' || CAST({e3} % 20 AS VARCHAR) END
    || '.example.'
    || CASE WHEN {e3} % 2 = 0 THEN 'com' ELSE 'org' END
    || list_extract([':443', ':8080', '', ''], CAST({e3} % 4 AS INT) + 1)
    || '/p/' || CAST({e3} % 40 AS VARCHAR)
    || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
    || list_extract(['?utm_source=feed&id=' || CAST({e3} % 9 AS VARCHAR),
                     '?id=' || CAST({e3} % 9 AS VARCHAR) || '&fbclid=xyz',
                     ''], CAST(doc_id % 3 AS INT) + 1)
    || CASE WHEN doc_id % 6 = 0 THEN '#sec2' ELSE '' END AS url
  FROM documents
),
p1 AS (
  SELECT doc_id, url,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    regexp_replace(
      lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
      '^www\\.', '') AS host1,
    regexp_replace(
      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
      '/+$', '') AS path,
    regexp_extract(url, '^[^#?]*\\?([^#]*)', 1) AS query
  FROM u
),
p2 AS (
  SELECT doc_id, url, scheme,
    CASE WHEN (scheme = 'http' AND host1 LIKE '%:80')
           OR (scheme = 'https' AND host1 LIKE '%:443')
         THEN regexp_replace(host1, ':[0-9]+$', '') ELSE host1 END AS host,
    path,
    array_to_string(list_filter(string_split(query, '&'),
      kv -> kv <> ''
        AND NOT starts_with(lower(split_part(kv, '=', 1)), 'utm_')
        AND NOT list_contains({tracked}, lower(split_part(kv, '=', 1)))),
      '&') AS q
  FROM p1
),
c AS (
  SELECT doc_id, url, host,
    CASE WHEN scheme <> '' AND host <> '' THEN
      scheme || '://' || host || path
        || CASE WHEN q <> '' THEN '?' || q ELSE '' END
    END AS canonical_url
  FROM p2
)"""


def q_url_canonical() -> str:
    """SQL twin of urls.canonical_urls over the synthetic URL column."""
    return f"""
WITH {_url_ctes()}
SELECT CAST(doc_id AS BIGINT) AS doc_id, url, host, canonical_url FROM c
"""


def q_url_dedup() -> str:
    """SQL twin of urls.url_dedup — keep-first per canonical URL."""
    return f"""
WITH {_url_ctes()}
SELECT canonical_url, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
  CAST(COUNT(*) AS BIGINT) AS n_urls
FROM c WHERE canonical_url IS NOT NULL GROUP BY 1
"""


def q_domain_blocklist(blocked: list[str]) -> str:
    """SQL twin of urls.domain_blocklist — longest matching host
    suffix from the blocklist, label-boundary semantics."""
    bl = _sql_strlist(sorted({b.lower() for b in blocked}))
    return f"""
WITH {_url_ctes()},
sfx AS (
  SELECT doc_id, host, unnest(
    list_transform(
      range(1, len(string_split(regexp_replace(host, ':[0-9]+$', ''), '.')) + 1),
      i -> array_to_string(
        list_slice(string_split(regexp_replace(host, ':[0-9]+$', ''), '.'), i,
                   len(string_split(regexp_replace(host, ':[0-9]+$', ''), '.'))),
        '.'))
  ) AS sfx
  FROM c
),
best AS (
  SELECT doc_id, host, max_by(sfx, length(sfx)) AS blocked_domain
  FROM sfx WHERE list_contains({bl}, sfx)
  GROUP BY 1, 2
)
SELECT CAST(c.doc_id AS BIGINT) AS doc_id, c.host, b.blocked_domain,
  b.blocked_domain IS NULL AS keep
FROM c LEFT JOIN best b ON b.doc_id = c.doc_id AND b.host = c.host
"""


def q_cohort_retention() -> str:
    """SQL twin of events.cohort_retention."""
    return """
WITH um AS (
  SELECT DISTINCT user_id, strftime(ts, '%Y-%m') AS activity_month FROM events
),
f AS (SELECT user_id, MIN(activity_month) AS cohort_month FROM um GROUP BY 1)
SELECT cohort_month, activity_month, CAST(COUNT(*) AS BIGINT) AS n_users
FROM um JOIN f USING (user_id)
GROUP BY 1, 2
"""


def q_rolling_active(window_days: int = 7) -> str:
    """SQL twin of events.rolling_active_users — integer epoch-day
    arithmetic, trailing window clamped to the data's max day."""
    return f"""
WITH ud AS (
  SELECT DISTINCT user_id,
    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
  FROM events
),
b AS (SELECT MAX(d) AS dmax FROM ud),
contrib AS (
  SELECT user_id, d, CAST(u.od AS BIGINT) AS od
  FROM ud, b,
  UNNEST(generate_series(d, least(d + {window_days - 1}, b.dmax))) AS u(od)
)
SELECT DATE '1970-01-01' + CAST(od AS INT) AS day,
  CAST(COUNT(DISTINCT CASE WHEN od = d THEN user_id END) AS BIGINT)
    AS n_active_1d,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_wd
FROM contrib GROUP BY 1
"""


def q_hamming_topk(k: int = 10) -> str:
    """SQL twin of docops.hamming_topk over docops.binary_quantize —
    integer xor/popcount arithmetic, bit-exact cross-engine."""
    pow2 = "[" + ", ".join(str(1 << b) for b in range(32)) + "]"
    pack = f"""
  SELECT vec_id,
    list_transform(range(0, CAST(ceil(len(embedding) / 32.0) AS INT)),
      w -> CAST(list_sum(list_transform(range(0, 32),
        b -> CASE WHEN w * 32 + b < len(embedding)
                   AND embedding[w * 32 + b + 1] > 0
                  THEN {pow2}[b + 1] ELSE 0 END)) AS BIGINT)) AS bvec
  FROM embeddings"""
    return f"""
WITH c AS ({pack}),
q AS (SELECT vec_id AS query_id, bvec AS qvec FROM c WHERE vec_id < 4),
scored AS (
  SELECT q.query_id, c.vec_id AS id,
    CAST(list_sum(list_transform(range(1, len(c.bvec) + 1),
      i -> bit_count(xor(c.bvec[i], q.qvec[i])))) AS BIGINT) AS hamming
  FROM c CROSS JOIN q
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY hamming, id)
    AS rank
  FROM scored
)
SELECT query_id, id, hamming, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def q_c4_filters(
    line_words: int = 8,
    min_words_per_line: int = 5,
    min_lines: int = 2,
    require_terminal_punct: bool = False,
    banned: list[str] | None = None,
) -> str:
    """SQL twin of docops.c4_filters (fixed-window line notion shared
    with line_dedup)."""
    from .operators.docops import C4_BANNED

    banned = C4_BANNED if banned is None else banned
    lw = line_words
    punct = " AND regexp_matches(l, '[.!?\"]$')" if require_terminal_punct else ""
    banned_expr = " OR ".join(
        f"contains(lower(text), '{b.lower()}')" for b in banned
    ) or "FALSE"
    return f"""
WITH t AS (SELECT doc_id, text, {_toks('text')} AS toks FROM documents),
l AS (
  SELECT doc_id, text, toks,
    CASE WHEN len(toks) > 0 THEN
      list_transform(range(1, CAST(ceil(len(toks) / {lw}.0) AS INT) + 1),
        i -> array_to_string(
          list_slice(toks, (i - 1) * {lw} + 1,
                     least((i - 1) * {lw} + {lw}, len(toks))), ' '))
    ELSE [] END AS lines
  FROM t
),
m AS (
  SELECT doc_id, text,
    CAST(CASE WHEN len(toks) > 0
         THEN ceil(len(toks) / {lw}.0) ELSE 0 END AS BIGINT) AS n_lines,
    CAST(len(list_filter(lines,
      l -> len(string_split(l, ' ')) >= {min_words_per_line}{punct}))
      AS BIGINT) AS n_kept_lines,
    contains(lower(text), '{{') AS has_brace,
    ({banned_expr}) AS has_banned
  FROM l
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_lines, n_kept_lines, has_brace,
  has_banned,
  (NOT has_brace AND NOT has_banned AND n_kept_lines >= {min_lines}) AS keep,
  CASE WHEN has_brace THEN 'brace'
       WHEN has_banned THEN 'banned'
       WHEN n_kept_lines < {min_lines} THEN 'too_few_lines'
       ELSE 'kept' END AS reason
FROM m
"""


def q_stratified_sample(n_per_stratum: int = 40) -> str:
    """SQL twin of docops.stratified_sample (strata = lang)."""
    h = _md5_u32_sql("'strat|' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH t AS (SELECT doc_id, lang, {h} AS h FROM documents),
r AS (
  SELECT lang, doc_id,
    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
  FROM t
)
SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, CAST(rk AS BIGINT) AS draw_rank
FROM r WHERE rk <= {n_per_stratum}
"""


def q_entity_timeline() -> str:
    """SQL twin of temporal.entity_timeline — every assertion on both
    endpoints' chronologies with a dense per-entity seq."""
    return f"""
WITH {EDGES_CTE},
sides AS (
  SELECT group_id, subj_name AS name, 'subject' AS role, predicate,
    obj_name AS other, fact, valid_at, invalid_at
  FROM edges
  UNION ALL
  SELECT group_id, obj_name, 'object', predicate, subj_name, fact,
    valid_at, invalid_at
  FROM edges
)
SELECT group_id, name,
  CAST(row_number() OVER (
    PARTITION BY group_id, name
    ORDER BY valid_at ASC NULLS LAST, predicate, other, role, fact,
             invalid_at ASC NULLS LAST
  ) AS BIGINT) AS seq,
  role, predicate, other, fact, valid_at, invalid_at
FROM sides
"""


def q_random_walks(walk_len: int = 4, n_walks: int = 2) -> str:
    """SQL twin of gnn.random_walks — the walk loop unrolled to one
    CTE per step, each replaying the md5-derived neighbor pick."""
    steps = []
    selects = ["SELECT group_id, start, CAST(walk AS INT) AS walk, "
               "0 AS step, cur AS name FROM w0"]
    for t in range(1, walk_len + 1):
        h = _md5_u32_sql(
            "'walk|' || p.group_id || '|' || p.start || '|' "
            "|| CAST(p.walk AS VARCHAR) || '|' || '" + str(t) + "'"
        )
        steps.append(f"""w{t} AS (
  SELECT p.group_id, p.start, p.walk, n.dst AS cur
  FROM w{t - 1} p
  JOIN deg d ON d.group_id = p.group_id AND d.src = p.cur
  JOIN nbr n ON n.group_id = p.group_id AND n.src = p.cur
    AND n.rk = {h} % d.deg
)""")
        selects.append(
            f"SELECT group_id, start, CAST(walk AS INT) AS walk, "
            f"{t} AS step, cur AS name FROM w{t}"
        )
    chain = ",\n".join(steps)
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH {EDGES_CTE},
e AS (
  SELECT DISTINCT group_id, subj_name AS a, obj_name AS b FROM edges
  WHERE subj_name <> obj_name
),
und AS (
  SELECT DISTINCT group_id, src, dst FROM (
    SELECT group_id, a AS src, b AS dst FROM e
    UNION ALL SELECT group_id, b, a FROM e
  )
),
nbr AS (
  SELECT group_id, src, dst,
    CAST(row_number() OVER (PARTITION BY group_id, src ORDER BY dst) - 1
      AS BIGINT) AS rk
  FROM und
),
deg AS (SELECT group_id, src, CAST(COUNT(*) AS BIGINT) AS deg
        FROM und GROUP BY 1, 2),
w0 AS (
  SELECT d.group_id, d.src AS start, CAST(u.w AS BIGINT) AS walk,
    d.src AS cur
  FROM deg d, UNNEST(generate_series(0, {n_walks - 1})) AS u(w)
),
{chain}
SELECT * FROM ({union})
"""


def q_skipgram_pairs(walk_len: int = 4, n_walks: int = 2, window: int = 2) -> str:
    """SQL twin of gnn.skipgram_pairs over q_random_walks' corpus."""
    walks = q_random_walks(walk_len=walk_len, n_walks=n_walks).strip()
    return f"""
WITH wk AS ({walks})
SELECT a.group_id, a.name AS center, b.name AS context,
  CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM wk a
JOIN wk b ON b.group_id = a.group_id AND b.start = a.start
  AND b.walk = a.walk AND b.step <> a.step
  AND abs(b.step - a.step) <= {window}
GROUP BY 1, 2, 3
"""


def q_degree_histogram() -> str:
    """SQL twin of centrality.degree_histogram (undirected degrees,
    zero-degree nodes included)."""
    return f"""
WITH {EDGES_CTE},
gnodes AS (SELECT DISTINCT group_id, canonical_name AS name FROM canon_map),
e AS (
  SELECT DISTINCT group_id,
    LEAST(subj_name, obj_name) AS x, GREATEST(subj_name, obj_name) AS y
  FROM edges WHERE subj_name <> obj_name
),
deg AS (
  SELECT group_id, name, CAST(COUNT(*) AS BIGINT) AS degree FROM (
    SELECT group_id, x AS name FROM e
    UNION ALL SELECT group_id, y FROM e
  ) GROUP BY 1, 2
)
SELECT g.group_id, COALESCE(d.degree, 0) AS degree,
  CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM gnodes g
LEFT JOIN deg d ON d.group_id = g.group_id AND d.name = g.name
GROUP BY 1, 2
"""


def q_biased_walks(
    walk_len: int = 3,
    n_walks: int = 1,
    w_return: int = 1,
    w_near: int = 4,
    w_far: int = 1,
    max_deg: int | None = 64,
) -> str:
    """SQL twin of gnn.biased_walks — the node2vec second-order loop
    unrolled, each step replaying the integer cumulative-weight pick.
    ``max_deg`` composes gnn.capped_neighbors' hub cap: sources above
    the cap get an md5-re-ranked (dst tie-break) first-max_deg subset
    as their biased-step candidate list; sources at/below keep their
    exact ranked list, so the SQL is byte-identical to the uncapped
    twin on hub-free graphs. Step 1 and the w_near membership test
    use the full adjacency, exactly as the Spark side does."""
    chain = []
    selects = [
        "SELECT group_id, start, CAST(walk AS INT) AS walk, 0 AS step, "
        "start AS name FROM w0",
        "SELECT group_id, start, CAST(walk AS INT) AS walk, 1 AS step, "
        "cur AS name FROM f1",
    ]
    for t in range(2, walk_len + 1):
        h = _md5_u32_sql(
            "'n2v|' || group_id || '|' || start || '|' "
            "|| CAST(walk AS VARCHAR) || '|' || '" + str(t) + "'"
        )
        chain.append(f"""c{t} AS (
  SELECT f.group_id, f.start, f.walk, f.prev, f.cur, n.rk, n.dst,
    CAST(CASE WHEN n.dst = f.prev THEN {w_return}
         WHEN EXISTS (SELECT 1 FROM und u
                      WHERE u.group_id = f.group_id AND u.src = n.dst
                        AND u.dst = f.prev) THEN {w_near}
         ELSE {w_far} END AS BIGINT) AS w
  FROM f{t - 1} f
  JOIN nbrcap n ON n.group_id = f.group_id AND n.src = f.cur
),
bp{t} AS (
  SELECT *,
    SUM(w) OVER (PARTITION BY group_id, start, walk ORDER BY rk
                 ROWS UNBOUNDED PRECEDING) AS cum,
    SUM(w) OVER (PARTITION BY group_id, start, walk) AS total
  FROM c{t}
),
f{t} AS (
  SELECT group_id, start, walk, cur AS prev, dst AS cur
  FROM bp{t}
  WHERE {h} % total >= cum - w AND {h} % total < cum
)""")
        selects.append(
            f"SELECT group_id, start, CAST(walk AS INT) AS walk, {t} AS step, "
            f"cur AS name FROM f{t}"
        )
    h1 = _md5_u32_sql(
        "'n2v|' || s.group_id || '|' || s.start || '|' "
        "|| CAST(s.walk AS VARCHAR) || '|' || '1'"
    )
    if max_deg is None:
        capped = "SELECT group_id, src, dst, rk FROM nbr"
    else:
        hcap = _md5_u32_sql(
            "'cap|' || n.group_id || '|' || n.src || '|' || n.dst"
        )
        capped = f"""
  SELECT n.group_id, n.src, n.dst, n.rk
  FROM nbr n JOIN deg d ON d.group_id = n.group_id AND d.src = n.src
  WHERE d.deg <= {max_deg}
  UNION ALL
  SELECT group_id, src, dst, rk FROM (
    SELECT n.group_id, n.src, n.dst,
      CAST(row_number() OVER (PARTITION BY n.group_id, n.src
        ORDER BY {hcap}, n.dst) - 1 AS BIGINT) AS rk
    FROM nbr n JOIN deg d ON d.group_id = n.group_id AND d.src = n.src
    WHERE d.deg > {max_deg}
  ) WHERE rk < {max_deg}
"""
    chain_sql = ",\n".join(chain)
    if chain_sql:
        chain_sql = ",\n" + chain_sql
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH {EDGES_CTE},
e AS (
  SELECT DISTINCT group_id, subj_name AS a, obj_name AS b FROM edges
  WHERE subj_name <> obj_name
),
und AS (
  SELECT DISTINCT group_id, src, dst FROM (
    SELECT group_id, a AS src, b AS dst FROM e
    UNION ALL SELECT group_id, b, a FROM e
  )
),
nbr AS (
  SELECT group_id, src, dst,
    CAST(row_number() OVER (PARTITION BY group_id, src ORDER BY dst) - 1
      AS BIGINT) AS rk
  FROM und
),
deg AS (SELECT group_id, src, CAST(COUNT(*) AS BIGINT) AS deg
        FROM und GROUP BY 1, 2),
nbrcap AS ({capped}),
w0 AS (
  SELECT d.group_id, d.src AS start, CAST(u.w AS BIGINT) AS walk
  FROM deg d, UNNEST(generate_series(0, {n_walks - 1})) AS u(w)
),
f1 AS (
  SELECT s.group_id, s.start, s.walk, s.start AS prev, n.dst AS cur
  FROM w0 s
  JOIN deg d ON d.group_id = s.group_id AND d.src = s.start
  JOIN nbr n ON n.group_id = s.group_id AND n.src = s.start
    AND n.rk = {h1} % d.deg
){chain_sql}
SELECT * FROM ({union})
"""


def q_link_pred_eval(
    train_end: str = "2019-01-01 00:00:00",
    k_cand: int = 50,
    k: int = 10,
    scale: int = 10**6,
) -> str:
    """SQL twin of the link_pred_eval driver query: RA proposer fitted
    on the pre-cutoff train graph, filtered MRR/Hits@k against the
    post-cutoff new undirected pairs (gnn.ranking_metrics
    arithmetic, integer micro-units throughout)."""
    return f"""
WITH {EDGES_CTE},
tr AS (SELECT * FROM edges
       WHERE valid_at IS NULL OR valid_at < TIMESTAMP '{train_end}'),
und AS (
  SELECT DISTINCT group_id,
    LEAST(subj_name, obj_name) AS a, GREATEST(subj_name, obj_name) AS b
  FROM tr WHERE subj_name <> obj_name
),
deg AS (
  SELECT group_id, name, COUNT(*) AS deg FROM (
    SELECT group_id, a AS name FROM und
    UNION ALL SELECT group_id, b FROM und
  ) GROUP BY 1, 2
),
adj AS (
  SELECT u.group_id, u.a AS z, u.b AS n, d.deg
  FROM und u JOIN deg d ON d.group_id = u.group_id AND d.name = u.a
  UNION ALL
  SELECT u.group_id, u.b, u.a, d.deg
  FROM und u JOIN deg d ON d.group_id = u.group_id AND d.name = u.b
),
rap AS (
  SELECT l.group_id, l.n AS a, r.n AS b,
    COUNT(*) AS n_common,
    SUM(CAST({scale} AS BIGINT) // l.deg) AS ra_micro
  FROM adj l JOIN adj r ON r.group_id = l.group_id AND r.z = l.z
  WHERE l.n < r.n
  GROUP BY 1, 2, 3
),
missing AS (
  SELECT p.* FROM rap p
  LEFT JOIN und u ON u.group_id = p.group_id AND u.a = p.a AND u.b = p.b
  WHERE u.a IS NULL
),
cand AS (
  SELECT group_id, a AS src, b AS dst,
    CAST(ra_micro AS BIGINT) AS score
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY group_id ORDER BY ra_micro DESC, n_common DESC, a, b
    ) AS rk FROM missing
  ) WHERE rk <= {k_cand}
),
test AS (
  SELECT DISTINCT e.group_id,
    LEAST(e.subj_name, e.obj_name) AS src,
    GREATEST(e.subj_name, e.obj_name) AS dst
  FROM edges e
  LEFT JOIN und u ON u.group_id = e.group_id
    AND u.a = LEAST(e.subj_name, e.obj_name)
    AND u.b = GREATEST(e.subj_name, e.obj_name)
  WHERE e.valid_at >= TIMESTAMP '{train_end}'
    AND e.subj_name <> e.obj_name AND u.a IS NULL
),
truth AS (
  SELECT t.group_id, t.src, t.dst, c.score AS s_true
  FROM test t
  JOIN cand c ON c.group_id = t.group_id AND c.src = t.src AND c.dst = t.dst
),
ranks AS (
  SELECT tr2.group_id, tr2.src, tr2.dst,
    CAST(1 + SUM(CASE WHEN c.score > tr2.s_true
          OR (c.score = tr2.s_true AND c.dst < tr2.dst) THEN 1 ELSE 0 END)
      AS BIGINT) AS rank
  FROM truth tr2
  JOIN cand c ON c.group_id = tr2.group_id AND c.src = tr2.src
  GROUP BY 1, 2, 3
),
pg AS (
  SELECT group_id, CAST(COUNT(*) AS BIGINT) AS n_ranked,
    CAST(SUM(1000000 // rank) AS BIGINT) AS rr_sum,
    CAST(SUM(CASE WHEN rank <= {k} THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_k
  FROM ranks GROUP BY 1
),
tot AS (SELECT group_id, CAST(COUNT(*) AS BIGINT) AS n_test FROM test GROUP BY 1)
SELECT t.group_id, t.n_test,
  CAST(COALESCE(p.n_ranked, 0) AS BIGINT) AS n_ranked,
  CAST(CASE WHEN p.n_ranked IS NULL THEN 0
       ELSE p.rr_sum // p.n_ranked END AS BIGINT) AS mrr_micro,
  CAST(COALESCE(p.hits_at_k, 0) AS BIGINT) AS hits_at_k
FROM tot t LEFT JOIN pg p ON p.group_id = t.group_id
"""


def q_sampled_neighborhood(
    seeds: list,
    fanouts: tuple = (3, 2),
) -> str:
    """SQL twin of gnn.sampled_neighborhood — per-hop md5-ranked
    fanout sampling, one unrolled CTE pair per hop. ``seeds`` is
    required; names are quote-escaped into the VALUES list (entity
    names are free text)."""
    if not seeds or not fanouts:
        raise ValueError("seeds and fanouts must be non-empty")

    def q(x: str) -> str:
        return x.replace("'", "''")

    values = ", ".join(f"('{q(g)}', '{q(n)}')" for g, n in seeds)
    chain = []
    selects = []
    prev_frontier = "sf0"
    for hop, s in enumerate(fanouts, 1):
        h = _md5_u32_sql(
            "'sage|' || f.group_id || '|' || f.seed || '|' || '"
            + str(hop) + "' || '|' || n.src || '|' || n.dst"
        )
        chain.append(f"""sh{hop} AS (
  SELECT f.group_id, f.seed, n.src, n.dst,
    row_number() OVER (
      PARTITION BY f.group_id, f.seed, n.src
      ORDER BY {h}, n.dst
    ) AS rn
  FROM {prev_frontier} f
  JOIN nbr n ON n.group_id = f.group_id AND n.src = f.src
),
sk{hop} AS (SELECT group_id, seed, src, dst FROM sh{hop} WHERE rn <= {s}),
sf{hop} AS (SELECT DISTINCT group_id, seed, dst AS src FROM sk{hop})""")
        selects.append(
            f"SELECT group_id, seed, {hop} AS hop, src, dst FROM sk{hop}"
        )
        prev_frontier = f"sf{hop}"
    chain_sql = ",\n".join(chain)
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH {EDGES_CTE},
e AS (
  SELECT DISTINCT group_id, subj_name AS a, obj_name AS b FROM edges
  WHERE subj_name <> obj_name
),
und AS (
  SELECT DISTINCT group_id, src, dst FROM (
    SELECT group_id, a AS src, b AS dst FROM e
    UNION ALL SELECT group_id, b, a FROM e
  )
),
nbr AS (SELECT group_id, src, dst FROM und),
sf0 AS (
  SELECT DISTINCT v.g AS group_id, v.n AS seed, v.n AS src
  FROM (VALUES {values}) AS v(g, n)
),
{chain_sql}
SELECT * FROM ({union})
"""


def q_graph_eval(
    f1_thr: int = 800_000, ov_thr: int = 800_000
) -> str:
    """SQL twin of the graph_eval driver query: candidate-vs-baseline
    per-episode grading (evaluate.compare_graphs default judge). The
    baseline is the fixture triple set per doc; the candidate is the
    same set deterministically damaged — md5-dropped edges (1 in 5),
    md5-dropped nodes (1 in 11), md5-drifted summaries (1 in 3) — so
    the whole harness, damage included, replays bit-for-bit."""
    tok = (
        "list_filter(list_distinct(string_split_regex(lower({s}), "
        "'[^a-z0-9]+')), x -> x <> '')"
    )
    h_ev = _md5_u32_sql(
        "'ev|' || group_id || '|' || doc_id || '|' || subj_name || '|' "
        "|| predicate || '|' || obj_name"
    )
    h_evn = _md5_u32_sql("'evn|' || group_id || '|' || doc_id || '|' || name")
    h_evs = _md5_u32_sql("'evs|' || group_id || '|' || doc_id || '|' || name")
    tb = tok.format(s="b.summary")
    tc = tok.format(s="c.summary")
    return f"""
WITH {FACTS_CTE},
ev_be AS (
  SELECT DISTINCT group_id, doc_id, subj_name, predicate, obj_name FROM facts
),
ev_bn AS (
  SELECT group_id, doc_id, name,
    name || ' appears in ' || doc_id AS summary
  FROM (SELECT DISTINCT group_id, doc_id, subj_name AS name FROM ev_be
        UNION SELECT DISTINCT group_id, doc_id, obj_name FROM ev_be)
),
ev_ce AS (SELECT * FROM ev_be WHERE {h_ev} % 5 <> 0),
ev_cn AS (
  SELECT group_id, doc_id, name,
    CASE WHEN {h_evs} % 3 = 0
         THEN name || ' drifted entirely ' || doc_id
         ELSE name || ' appears in ' || doc_id END AS summary
  FROM ev_bn WHERE {h_evn} % 11 <> 0
),
ev_ng AS (SELECT group_id, doc_id, COUNT(*) AS n_g FROM ev_be GROUP BY 1, 2),
ev_ne AS (SELECT group_id, doc_id, COUNT(*) AS n_e FROM ev_ce GROUP BY 1, 2),
ev_tp AS (
  SELECT group_id, doc_id, COUNT(*) AS n_tp
  FROM ev_ce JOIN ev_be USING (group_id, doc_id, subj_name, predicate, obj_name)
  GROUP BY 1, 2
),
ev_prf AS (
  SELECT g.group_id, g.doc_id,
    CAST(2000000 * COALESCE(t.n_tp, 0)
         // (COALESCE(e.n_e, 0) + g.n_g) AS BIGINT) AS edge_f1_micro
  FROM ev_ng g
  LEFT JOIN ev_ne e USING (group_id, doc_id)
  LEFT JOIN ev_tp t USING (group_id, doc_id)
),
ev_matched AS (
  SELECT b.group_id, b.doc_id, 1 AS n_base,
    CASE WHEN c.name IS NOT NULL THEN 1 ELSE 0 END AS n_hit,
    CASE WHEN c.name IS NULL THEN NULL
         WHEN len({tb}) = 0 THEN 1000000
         ELSE CAST(FLOOR(1000000.0 * len(list_intersect({tc}, {tb}))
                         / len({tb})) AS BIGINT)
    END AS ov
  FROM ev_bn b
  LEFT JOIN ev_cn c USING (group_id, doc_id, name)
),
ev_nsc AS (
  SELECT group_id, doc_id,
    CAST(1000000 * SUM(n_hit) // SUM(n_base) AS BIGINT) AS node_recall_micro,
    CAST(COALESCE(FLOOR(AVG(ov)), 0) AS BIGINT) AS summary_overlap_micro
  FROM ev_matched GROUP BY 1, 2
)
SELECT p.group_id, p.doc_id,
  COALESCE(p.edge_f1_micro, 0) AS edge_f1_micro,
  COALESCE(n.node_recall_micro, 1000000) AS node_recall_micro,
  COALESCE(n.summary_overlap_micro, 1000000) AS summary_overlap_micro,
  (COALESCE(p.edge_f1_micro, 0) < {f1_thr}
   OR COALESCE(n.node_recall_micro, 1000000) < {ov_thr}
   OR COALESCE(n.summary_overlap_micro, 1000000) < {ov_thr})
  AS candidate_is_worse
FROM ev_prf p
FULL JOIN ev_nsc n USING (group_id, doc_id)
"""


def q_graph_eval_score(
    f1_thr: int = 800_000, ov_thr: int = 800_000
) -> str:
    """SQL twin of graph_eval_score over q_graph_eval's per-episode
    frame (the reference's mean-not-worse aggregate)."""
    inner = q_graph_eval(f1_thr=f1_thr, ov_thr=ov_thr).strip()
    return f"""
WITH ev_per_ep AS ({inner})
SELECT group_id,
  CAST(COUNT(*) AS BIGINT) AS n_episodes,
  CAST(SUM(CASE WHEN candidate_is_worse THEN 0 ELSE 1 END) AS BIGINT)
    AS n_not_worse,
  CAST(1000000 * SUM(CASE WHEN candidate_is_worse THEN 0 ELSE 1 END)
       // COUNT(*) AS BIGINT) AS score_micro
FROM ev_per_ep
GROUP BY group_id
"""


def q_gopher_rules(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mwl: int = 3_000_000,
    max_mwl: int = 10_000_000,
    max_sym: int = 100_000,
    max_bullet: int = 900_000,
    max_ellipsis: int = 300_000,
    min_alpha: int = 800_000,
    min_stops: int = 2,
) -> str:
    """SQL twin of docops.gopher_rules — the Gopher Appendix-A rule
    set in exact integer micro-units (whitespace words; # and
    ellipsis symbol counts; bullet/ellipsis line fractions; required
    stop-word test)."""
    return f"""
WITH gp_w AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(text, '[ 	
]+'), x -> x <> '') AS words,
    list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines
  FROM documents
),
gp_c AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    CAST(len(words) AS BIGINT) AS n_words,
    CAST(COALESCE(list_sum(list_transform(words, w -> len(w))), 0)
      AS BIGINT) AS sum_len,
    CAST(len(text) - len(replace(text, '#', ''))
      + (len(text) - len(replace(text, '...', ''))) // 3
      + (len(text) - len(replace(text, '…', ''))) AS BIGINT) AS n_sym,
    CAST(len(lines) AS BIGINT) AS n_lines,
    CAST(len(list_filter(lines, l ->
      starts_with(ltrim(l), '-') OR starts_with(ltrim(l), '*')
      OR starts_with(ltrim(l), '•'))) AS BIGINT) AS n_bullet,
    CAST(len(list_filter(lines, l ->
      ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…')))
      AS BIGINT) AS n_ell_line,
    CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))
      AS BIGINT) AS n_alpha,
    CAST((CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'and') THEN 1 ELSE 0 END)
       + (CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'be') THEN 1 ELSE 0 END)
       + (CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'have') THEN 1 ELSE 0 END)
       + (CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'of') THEN 1 ELSE 0 END)
       + (CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'that') THEN 1 ELSE 0 END)
       + (CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'the') THEN 1 ELSE 0 END)
       + (CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'to') THEN 1 ELSE 0 END)
       + (CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'with') THEN 1 ELSE 0 END)
      AS BIGINT) AS n_required_stops
  FROM gp_w
),
gp_m AS (
  SELECT doc_id, n_words,
    CAST(CASE WHEN n_words > 0 THEN 1000000 * sum_len // n_words
         ELSE 0 END AS BIGINT) AS mean_word_len_micro,
    CAST(CASE WHEN n_words > 0 THEN 1000000 * n_sym // n_words
         ELSE 0 END AS BIGINT) AS symbol_ratio_micro,
    CAST(CASE WHEN n_lines > 0 THEN 1000000 * n_bullet // n_lines
         ELSE 0 END AS BIGINT) AS bullet_frac_micro,
    CAST(CASE WHEN n_lines > 0 THEN 1000000 * n_ell_line // n_lines
         ELSE 0 END AS BIGINT) AS ellipsis_frac_micro,
    CAST(CASE WHEN n_words > 0 THEN 1000000 * n_alpha // n_words
         ELSE 0 END AS BIGINT) AS alpha_frac_micro,
    n_required_stops
  FROM gp_c
)
SELECT *,
  (n_words >= {min_words} AND n_words <= {max_words}
   AND mean_word_len_micro >= {min_mwl}
   AND mean_word_len_micro <= {max_mwl}
   AND symbol_ratio_micro <= {max_sym}
   AND bullet_frac_micro <= {max_bullet}
   AND ellipsis_frac_micro <= {max_ellipsis}
   AND alpha_frac_micro >= {min_alpha}
   AND n_required_stops >= {min_stops}) AS keep
FROM gp_m
"""
