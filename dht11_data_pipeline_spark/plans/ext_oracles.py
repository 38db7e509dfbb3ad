"""DuckDB oracle SQL for the extension queries — generated
programmatically so algorithm constants (seeds, planes, bit widths)
stay in one place and provably match the DataFrame side.
"""

from __future__ import annotations

from dht11_data_pipeline_spark.functions.text import LANG_MARKERS, STOPWORDS
from dht11_data_pipeline_spark.functions.vectors import make_planes
from dht11_data_pipeline_spark.operators.dedup import (
    CDC_DIVISOR, CDC_GEAR, CDC_WINDOW, MAX_SHINGLE_DF, MINHASH_A,
    MINHASH_B, MINHASH_P, _cdc_masks)
from dht11_data_pipeline_spark.operators.graph import MAX_CENTER_DEGREE
from dht11_data_pipeline_spark.operators.sketches import (
    CM_A, CM_B, CM_ROWS, CM_WIDTH, HASH_P, KMV_A, KMV_B, KMV_K)

# Mirror of the operators' skew caps (join side only; sizes/degrees in
# the output stay exact) so the oracle computes the SAME capped
# semantics as the DataFrame side at every scale factor — not just at
# test SFs where nothing crosses the cap.
_SHINGLE_DF_CAP = f"""
, hot AS (
  SELECT shingle FROM inv GROUP BY shingle HAVING COUNT(*) > {MAX_SHINGLE_DF}
)
, joinable AS (
  SELECT i.* FROM inv i ANTI JOIN hot h USING (shingle)
)
"""

# word-3-gram distinct shingle set per doc (mirrors functions/text.shingles)
_SHINGLES = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                        for i in range(1, len(t)-1)]) AS shingle_set
  FROM toks WHERE len(t) >= 3
)
"""

_JACCARD_CORE = _SHINGLES + """
, sizes AS (SELECT doc_id, len(shingle_set) AS set_size FROM sh)
, inv AS (SELECT doc_id, unnest(shingle_set) AS shingle FROM sh)
""" + _SHINGLE_DF_CAP + """
, common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM joinable a JOIN joinable b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
, pairs AS (
  SELECT doc_a, doc_b, n_common,
         CAST(sa.set_size AS INTEGER) AS size_a,
         CAST(sb.set_size AS INTEGER) AS size_b,
         n_common / (sa.set_size + sb.set_size - n_common) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)
"""


def _shingles_from(src: str) -> str:
    """The _SHINGLES CTE chain over an arbitrary relation (must expose
    doc_id, text)."""
    return _SHINGLES.replace("FROM documents", f"FROM {src}")


def _minhash_sql(num_hashes: int = 8, band_size: int = 2,
                 threshold: float = 0.5, src: str = "documents") -> str:
    # one sha256 per shingle reduced mod P, then k multiply-mod seeded
    # hashes — mirrors operators/dedup.minhash_signature exactly
    # (MINHASH_* constants are the single source of truth)
    sig_items = ", ".join(
        "list_aggregate(list_transform(bv, "
        f"v -> (v * {MINHASH_A[s]} + {MINHASH_B[s]}) % {MINHASH_P}), 'min')"
        for s in range(num_hashes)
    )
    n_bands = num_hashes // band_size
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        + " || '|' || ".join(
            f"signature[{b * band_size + r + 1}]::VARCHAR"
            for r in range(band_size))
        + " AS band_key FROM sigs"
        for b in range(n_bands)
    )
    return (_shingles_from(src) + f"""
, bases AS (
  SELECT doc_id, shingle_set,
         list_transform(shingle_set,
           x -> ('0x' || substr(sha256(x), 1, 15))::BIGINT
                % {MINHASH_P}) AS bv
  FROM sh
)
, sigs AS (SELECT doc_id, [{sig_items}] AS signature FROM bases)
, bands AS ({band_selects})
, cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       len(list_intersect(sa.shingle_set, sb.shingle_set))
         / (len(sa.shingle_set) + len(sb.shingle_set)
            - len(list_intersect(sa.shingle_set, sb.shingle_set))) AS jaccard
FROM cands c
JOIN sh sa ON sa.doc_id = c.doc_a
JOIN sh sb ON sb.doc_id = c.doc_b
WHERE len(list_intersect(sa.shingle_set, sb.shingle_set))
        / (len(sa.shingle_set) + len(sb.shingle_set)
           - len(list_intersect(sa.shingle_set, sb.shingle_set))) >= {threshold}
""")


def _simhash_sql(max_hamming: int = 3) -> str:
    # sha256 recomputed per nibble: DuckDB forbids subqueries inside
    # lambdas, and 4 extra hashes/token is nothing at oracle scale
    nib = "(instr('0123456789abcdef', substr(sha256(tk), {pos}, 1)) - 1)"
    hv = " + ".join(
        f"{nib.format(pos=p + 1)} * {16 ** (3 - p)}" for p in range(4)
    )
    bit_sums = ", ".join(
        f"list_sum(list_transform(hashes, h2 -> CASE WHEN (h2 >> {b}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) AS s{b}"
        for b in range(16)
    )
    sketch = " + ".join(f"CASE WHEN s{b} >= 0 THEN {1 << b} ELSE 0 END" for b in range(16))
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
hashed AS (
  SELECT doc_id, list_transform(t, tk -> {hv}) AS hashes
  FROM toks
),
bitsums AS (SELECT doc_id, {bit_sums} FROM hashed),
sk AS (SELECT doc_id, CAST({sketch} AS INTEGER) AS simhash FROM bitsums)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sk a JOIN sk b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def _lang_id_sql() -> str:
    langs = list(LANG_MARKERS)
    score_exprs = ", ".join(
        "CAST(len(list_filter(string_split(text, ' '), "
        f"tk -> list_contains({LANG_MARKERS[lang]!r}, tk))) AS INTEGER) AS score_{lang}"
        .replace("'", "'").replace("[", "[").replace("]", "]")
        for lang in langs
    )
    # python list repr uses single quotes — valid DuckDB list literal
    m = "greatest(" + ", ".join(f"score_{x}" for x in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN score_{x} = {m} THEN '{x}'" for x in langs) + " END"
    return f"""
WITH scored AS (SELECT doc_id, {score_exprs} FROM documents)
SELECT doc_id, {', '.join('score_' + x for x in langs)},
       {pred} AS predicted_lang,
       CAST({m} AS INTEGER) AS predicted_score
FROM scored
"""


def _lsh_ann_sql(k: int = 5, n_planes: int = 4, dim: int = 64) -> str:
    planes = make_planes(n_planes, dim)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], "
        f"{[float(v) for v in plane]}::DOUBLE[]) >= 0 THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(planes)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  CAST({bucket} AS INTEGER) AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id % 50 = 0),
s AS (
  SELECT q.query_id, q.bucket, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.qv, e.v), 4) AS sim
  FROM q JOIN e ON q.bucket = e.bucket AND q.query_id <> e.vec_id
),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk FROM s)
SELECT query_id, bucket, neighbor_id, sim, CAST(rk AS INTEGER) AS rank
FROM r WHERE rk <= {k}
"""


def _bucketed_near_dup_sql(threshold: float = 0.4, n_planes: int = 4,
                           dim: int = 64) -> str:
    planes = make_planes(n_planes, dim)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], "
        f"{[float(v) for v in plane]}::DOUBLE[]) >= 0 THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(planes)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  CAST({bucket} AS INTEGER) AS bucket FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.bucket,
       round(list_cosine_similarity(a.v, b.v), 4) AS sim
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 4) >= {threshold}
"""


def _multiprobe_near_dup_sql(threshold: float = 0.4, n_planes: int = 4,
                             n_tables: int = 3, dim: int = 64) -> str:
    """Mirror of similarity.embedding_near_duplicates_multiprobe: per
    plane table a bucket self-join, UNION ALL, DISTINCT — identical
    seeded plane literals, so candidate sets match bit-for-bit."""
    branches = []
    for t in range(n_tables):
        planes = make_planes(n_planes, dim, seed=123456789 + t)
        bucket = " + ".join(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], "
            f"{[float(v) for v in plane]}::DOUBLE[]) >= 0 THEN {1 << p} ELSE 0 END)"
            for p, plane in enumerate(planes)
        )
        branches.append(f"""
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_cosine_similarity(a.v, b.v), 4) AS sim
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v,
               CAST({bucket} AS INTEGER) AS bucket FROM embeddings) a
  JOIN (SELECT vec_id, embedding::DOUBLE[] AS v,
               CAST({bucket} AS INTEGER) AS bucket FROM embeddings) b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= {threshold}""")
    union = "\n  UNION ALL\n".join(branches)
    return f"SELECT DISTINCT id_a, id_b, sim FROM (\n{union}\n)"


# aHash bits replayed from the image-synthesis rule (text_to_ppm width
# 32 → 8x8 NN sample → integer grayscale → mean threshold), shared by
# the mm_image_phash grouping and the mm_phash_near_dup Hamming join
_PHASH_BITS = """
WITH g AS (
  SELECT doc_id, text, len(text) AS L,
         GREATEST(1, (len(text) + 95) // 96) AS h
  FROM documents
),
gs AS (
  SELECT doc_id, L, h,
    list_transform(range(0, 64), k ->
      ( (CASE WHEN 3*(((k//8)*h//8)*32 + (k%8)*4) < L
              THEN unicode(substring(text, CAST(3*(((k//8)*h//8)*32 + (k%8)*4) + 1 AS INTEGER), 1)) ELSE 0 END)
      + (CASE WHEN 3*(((k//8)*h//8)*32 + (k%8)*4) + 1 < L
              THEN unicode(substring(text, CAST(3*(((k//8)*h//8)*32 + (k%8)*4) + 2 AS INTEGER), 1)) ELSE 0 END)
      + (CASE WHEN 3*(((k//8)*h//8)*32 + (k%8)*4) + 2 < L
              THEN unicode(substring(text, CAST(3*(((k//8)*h//8)*32 + (k%8)*4) + 3 AS INTEGER), 1)) ELSE 0 END)
      ) // 3) AS gvals
  FROM g
),
m AS (SELECT doc_id, h, gvals,
             list_sum(gvals) // 64 AS mean FROM gs),
bits AS (
  SELECT doc_id, CAST(32 AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
    CAST(list_sum(list_transform(range(0, 32), k ->
      CASE WHEN gvals[CAST(k + 1 AS INTEGER)] >= mean
           THEN (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) ELSE 0 END))
      AS BIGINT) AS phash_hi,
    CAST(list_sum(list_transform(range(32, 64), k ->
      CASE WHEN gvals[CAST(k + 1 AS INTEGER)] >= mean
           THEN (CAST(1 AS BIGINT) << CAST(k - 32 AS INTEGER)) ELSE 0 END))
      AS BIGINT) AS phash_lo
  FROM m
)
"""

# full phash near-dup pair query (shared by the mm_phash_near_dup
# entry and the cross-modal audit below)
_PHASH_PAIRS_SQL = _PHASH_BITS + """
, ch AS (
  SELECT doc_id, phash_hi, phash_lo, j,
         CASE j WHEN 0 THEN (phash_hi >> 0) & 65535
                WHEN 1 THEN (phash_hi >> 16) & 65535
                WHEN 2 THEN (phash_lo >> 0) & 65535
                ELSE (phash_lo >> 16) & 65535 END AS v
  FROM bits, (SELECT unnest(range(0, 4)) AS j)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.phash_hi AS ha, b.phash_hi AS hb,
         a.phash_lo AS la, b.phash_lo AS lb
  FROM ch a JOIN ch b ON a.j = b.j AND a.v = b.v AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS INTEGER)
         AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3
"""



def _profile_sql(table: str, cols: list[tuple[str, str]]) -> str:
    """Mirror of operators/profile: per-column stats UNION ALL, same
    post-aggregation normalization (num → DECIMAL(18,2) → VARCHAR)."""
    norm = {
        "num": "CAST(CAST({m} AS DECIMAL(18,2)) AS VARCHAR)",
        "other": "CAST({m} AS VARCHAR)",
    }
    parts = []
    for c, kind in cols:
        mn = norm[kind].format(m=f"MIN({c})")
        mx = norm[kind].format(m=f"MAX({c})")
        parts.append(f"""
SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {mn} AS min_value, {mx} AS max_value
FROM {table}""")
    return " UNION ALL ".join(parts)


def _cascade_sql(threshold: float = 0.5) -> str:
    """Exact + minhash-LSH kill lists → per-doc keep verdict (mirrors
    operators/dedup.cascade_keep_decision)."""
    return f"""
WITH pairs AS (SELECT * FROM ({_minhash_sql(threshold=threshold)})),
hashed AS (SELECT doc_id, sha256(text) AS content_hash FROM documents),
canon AS (SELECT content_hash, MIN(doc_id) AS canonical_id FROM hashed GROUP BY 1),
exact_kill AS (
  SELECT h.doc_id FROM hashed h JOIN canon c USING (content_hash)
  WHERE h.doc_id <> c.canonical_id),
near_kill AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
SELECT d.doc_id,
       CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
            WHEN n.doc_id IS NOT NULL THEN 'near_dup'
            ELSE 'kept' END AS reason,
       CASE WHEN e.doc_id IS NULL AND n.doc_id IS NULL THEN 'Y' ELSE 'N' END AS keep_flag
FROM documents d
LEFT JOIN exact_kill e ON d.doc_id = e.doc_id
LEFT JOIN near_kill n ON d.doc_id = n.doc_id
"""


def _clusters_sql(threshold: float = 0.5) -> str:
    """Connected components over the minhash pair graph as a recursive
    CTE fixpoint — the declarative twin of graph.connected_components'
    iterative min-label propagation."""
    return f"""
WITH RECURSIVE
pairs AS (SELECT doc_a, doc_b FROM ({_minhash_sql(threshold=threshold)})),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT a AS n FROM edges),
reach(node, origin) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.b, r.origin FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (SELECT node, MIN(origin) AS comp_id FROM reach GROUP BY node)
SELECT d.doc_id,
       COALESCE(c.comp_id, d.doc_id) AS cluster_id,
       CASE WHEN COALESCE(c.comp_id, d.doc_id) = d.doc_id THEN 'Y' ELSE 'N' END AS is_canonical
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
"""


def _survivorship_sql(threshold: float = 0.5) -> str:
    """Quality-ranked survivorship: the _clusters_sql component
    fixpoint, joined to integer doc features, ranked per cluster by
    (n_unique_tokens DESC, n_chars DESC, doc_id ASC)."""
    return f"""
WITH RECURSIVE
pairs AS (SELECT doc_a, doc_b FROM ({_minhash_sql(threshold=threshold)})),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT a AS n FROM edges),
reach(node, origin) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.b, r.origin FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (SELECT node, MIN(origin) AS comp_id FROM reach GROUP BY node),
labeled AS (
  SELECT d.doc_id, COALESCE(c.comp_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
),
feats AS (
  SELECT doc_id,
         CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)
           AS n_unique_tokens,
         CAST(length(text) AS INTEGER) AS n_chars
  FROM documents
)
SELECT l.doc_id, l.cluster_id, f.n_unique_tokens, f.n_chars,
       CASE WHEN ROW_NUMBER() OVER (
              PARTITION BY l.cluster_id
              ORDER BY f.n_unique_tokens DESC, f.n_chars DESC,
                       l.doc_id ASC) = 1
            THEN 'Y' ELSE 'N' END AS is_survivor
FROM labeled l JOIN feats f USING (doc_id)
"""


def _semantic_clusters_sql(threshold: float = 0.4) -> str:
    """Connected components over the multiprobe embedding near-dup
    pairs — the semantic twin of _clusters_sql, on vec_ids."""
    return f"""
WITH RECURSIVE
pairs AS (SELECT id_a, id_b FROM ({_multiprobe_near_dup_sql(threshold=threshold)})),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
nodes AS (SELECT DISTINCT a AS n FROM edges),
reach(node, origin) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.b, r.origin FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (SELECT node, MIN(origin) AS comp_id FROM reach GROUP BY node)
SELECT v.vec_id,
       COALESCE(c.comp_id, v.vec_id) AS cluster_id,
       CASE WHEN COALESCE(c.comp_id, v.vec_id) = v.vec_id THEN 'Y' ELSE 'N' END AS is_canonical
FROM embeddings v LEFT JOIN comp c ON c.node = v.vec_id
"""


def _pagerank_sql(threshold: float = 0.4, iters: int = 5) -> str:
    """Mirror of graph.pagerank_integer over the multiprobe near-dup
    graph: unrolled fixed-point-integer iterations (all `//` integer
    division on positive BIGINTs — bit-identical to Spark's DIV)."""
    its = ""
    prev = "p0"
    for k in range(1, iters + 1):
        its += f""",
c{k} AS (SELECT ed.dst AS node, SUM(p.p // ed.deg) AS c
         FROM ed JOIN {prev} p ON p.node = ed.src GROUP BY ed.dst),
p{k} AS (SELECT b.node,
                CAST(150000 + (850 * COALESCE(c.c, 0)) // 1000 AS BIGINT) AS p
         FROM p0 b LEFT JOIN c{k} c USING (node))"""
        prev = f"p{k}"
    return f"""
WITH pairs AS ({_multiprobe_near_dup_sql(threshold=threshold)}),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
p0 AS (SELECT vec_id AS node, CAST(1000000 AS BIGINT) AS p FROM embeddings){its}
SELECT b.node AS vec_id,
       CAST(COALESCE(d.deg, 0) AS INTEGER) AS degree,
       p.p AS rank_ppm
FROM p0 b JOIN {prev} p USING (node) LEFT JOIN deg d ON d.src = b.node
"""


def _kcore_sql(threshold: float = 0.25, k: int = 3, rounds: int = 30) -> str:
    """Mirror of graph.kcore_peel: the SAME fixed number of peel
    rounds unrolled as MATERIALIZED CTEs (each round restricts the edge
    list to the previous survivor set and drops nodes under degree k).
    The Spark side exits early once the survivor set is stable — every
    skipped round is an exact no-op, and in the not-yet-converged case
    both engines stop at the same identical ``rounds``-round state, so
    results match either way. The pytest convergence pin makes the
    output also be the true k-core at fixture scale."""
    its = ""
    prev = "s0"
    for r in range(1, rounds + 1):
        # every per-round CTE is MATERIALIZED: each references the
        # previous round 2-4 times, so default inlining would expand
        # the plan EXPONENTIALLY in the round count (observed as DuckDB
        # re-opening the parquet hundreds of times)
        its += f""",
e{r} AS MATERIALIZED (SELECT u.x, u.y FROM und u
         JOIN {prev} a ON a.node = u.x JOIN {prev} b ON b.node = u.y),
s{r} AS MATERIALIZED (SELECT node FROM (
           SELECT node, COUNT(*) AS deg FROM (
             SELECT x AS node FROM e{r} UNION ALL SELECT y AS node FROM e{r})
           GROUP BY node) WHERE deg >= {k})"""
        prev = f"s{r}"
    return f"""
WITH pairs AS MATERIALIZED ({_multiprobe_near_dup_sql(threshold=threshold)}),
und AS MATERIALIZED (SELECT id_a AS x, id_b AS y FROM pairs),
nodes AS (SELECT x AS node FROM und UNION SELECT y AS node FROM und),
s0 AS (SELECT node FROM nodes){its},
ef AS (SELECT u.x, u.y FROM und u JOIN {prev} a ON a.node = u.x
       JOIN {prev} b ON b.node = u.y),
df AS (SELECT node, COUNT(*) AS deg FROM (
         SELECT x AS node FROM ef UNION ALL SELECT y AS node FROM ef)
       GROUP BY node)
SELECT n.node AS vec_id,
       CASE WHEN s.node IS NOT NULL THEN 'Y' ELSE 'N' END AS in_kcore,
       CAST(COALESCE(df.deg, 0) AS INTEGER) AS core_degree
FROM nodes n LEFT JOIN {prev} s ON s.node = n.node
LEFT JOIN df ON df.node = n.node
"""


def _incremental_sql(threshold: float = 0.5, mod: int = 4) -> str:
    """A pair is emitted by the incremental run iff the full run emits
    it and at least one side is in the new batch (id % mod == 0) —
    signatures are per-doc, so the band collisions are identical."""
    return f"""
SELECT doc_a, doc_b, jaccard FROM ({_minhash_sql(threshold=threshold)})
WHERE doc_a % {mod} = 0 OR doc_b % {mod} = 0
"""


# regexes shared with operators/curation._PII_PATTERNS (RE2-safe)
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?\d[\d() .-]{7,}\d"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _cm_bucket_case(key_expr: str) -> str:
    """CASE over the j index applying the count-min multiply-mod hash —
    identical arithmetic to sketches._mmhash (keys are non-negative, so
    plain % == pmod)."""
    whens = "\n".join(
        f"    WHEN {j} THEN CAST(({key_expr} % {HASH_P} * {CM_A[j]} "
        f"+ {CM_B[j]}) % {HASH_P} % {CM_WIDTH} AS INTEGER)"
        for j in range(CM_ROWS))
    return f"CASE j\n{whens}\n  END"


# audio energy-delta fingerprint replayed from the synthesis rule:
# sample i = (ascii(char i) - 128) * 256, 8-sample frames (full frames
# only), bit k set iff E(k+1) > E(k), k < 64; hi = bits 0..31.
_AUDIO_FP = """
WITH chars AS (
  SELECT doc_id, text,
         unnest(range(1, octet_length(encode(text)) + 1)) AS i
  FROM documents
),
s AS (
  SELECT doc_id, (ascii(substr(text, i, 1)) - 128) * 256 AS smp,
         CAST((i - 1) // 8 AS INTEGER) AS f
  FROM chars
),
nfr AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) // 8 AS INTEGER) AS n_frames
  FROM documents
),
fe AS (
  SELECT s.doc_id, f, SUM(smp * smp) AS e
  FROM s JOIN nfr USING (doc_id)
  WHERE f < n_frames
  GROUP BY 1, 2
),
bits AS (
  SELECT a.doc_id, a.f - 1 AS k
  FROM fe a JOIN fe b ON b.doc_id = a.doc_id AND b.f = a.f - 1
  WHERE a.e > b.e AND a.f - 1 < 64
),
fpx AS (
  SELECT doc_id,
         SUM(CASE WHEN k < 32
                  THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER) END) AS hi,
         SUM(CASE WHEN k >= 32
                  THEN CAST(1 AS BIGINT) << CAST(k - 32 AS INTEGER) END) AS lo
  FROM bits GROUP BY doc_id
),
fp AS (
  SELECT n.doc_id, n.n_frames,
         CAST(COALESCE(hi, 0) AS BIGINT) AS fp_hi,
         CAST(COALESCE(lo, 0) AS BIGINT) AS fp_lo
  FROM nfr n LEFT JOIN fpx USING (doc_id)
)
"""


def _quality_weight_values() -> str:
    """The v1 declared weight table as a VALUES list — generated from
    the SAME dict the Spark query folds (textops.declared_weight_
    buckets), so the two sides cannot drift."""
    from dht11_data_pipeline_spark.operators.textops import (
        QUALITY_WORD_WEIGHTS_V1, declared_weight_buckets)
    w = declared_weight_buckets(QUALITY_WORD_WEIGHTS_V1)
    return ", ".join(f"({b}, {wt})" for b, wt in sorted(w.items()))


def _bpe_chain(k: int) -> str:
    """Unrolled k-round BPE merge chain (shared by the vocab and
    encode oracles). Every CTE is MATERIALIZED: DuckDB inlines plain
    CTEs, and w{r} references w{r-1} plus m{r} three times — inlined,
    the chain re-derives the whole prefix per reference (exponential);
    materialized, each round is evaluated once, mirroring the Spark
    side's per-round localCheckpoint. ``word`` is carried through so
    the encode oracle can map the final symbolization back onto the
    corpus."""
    parts = ["""WITH w0 AS MATERIALIZED (
  SELECT word, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS syms,
         freq FROM (
    SELECT word, COUNT(*) AS freq FROM (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> '' GROUP BY word))"""]
    for r in range(1, k + 1):
        parts.append(f"""p{r} AS MATERIALIZED (
  SELECT tok[i] || ' ' || tok[i + 1] AS pair, SUM(freq) AS cnt
  FROM (SELECT tok, freq, unnest(range(1, len(tok))) AS i
        FROM (SELECT string_split(trim(syms), ' ') AS tok, freq
              FROM w{r - 1})
        WHERE len(tok) >= 2)
  GROUP BY pair),
m{r} AS MATERIALIZED (
  SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair LIMIT 1),
w{r} AS MATERIALIZED (
  SELECT word,
         CASE WHEN (SELECT COUNT(*) FROM m{r}) = 0 THEN syms
         ELSE replace(syms, ' ' || (SELECT pair FROM m{r}) || ' ',
                      ' ' || (SELECT replace(pair, ' ', '') FROM m{r})
                          || ' ')
         END AS syms, freq
  FROM w{r - 1})""")
    return ",\n".join(parts)


def _bpe_oracle_sql(k: int) -> str:
    unions = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS INTEGER) AS merge_rank, pair, "
        f"replace(pair, ' ', '') AS merged, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM m{r}"
        for r in range(1, k + 1))
    return _bpe_chain(k) + "\n" + unions


def _bpe_encode_oracle_sql(k: int) -> str:
    return _bpe_chain(k) + f""",
enc AS (
  SELECT word, length(word) AS n_chars_w,
         len(string_split(trim(syms), ' ')) AS n_syms_w
  FROM w{k}),
tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
SELECT doc_id,
       CAST(COUNT(*) AS INTEGER) AS n_tokens,
       CAST(SUM(n_chars_w) AS BIGINT) AS n_chars,
       CAST(SUM(n_syms_w) AS BIGINT) AS n_symbols,
       CAST(CASE WHEN SUM(n_chars_w) = 0 THEN 1000000
                 ELSE SUM(n_syms_w) * 1000000 // SUM(n_chars_w)
            END AS BIGINT) AS compression_ppm
FROM tk JOIN enc USING (word)
WHERE word <> ''
GROUP BY doc_id"""


def _bpe_pack_oracle_sql(k: int, budget: int) -> str:
    """bpe_encode's per-doc n_symbols feeding the budget-exact
    concat-then-split packer: cumulative symbol offsets per source in
    doc_id order, packs = consecutive ``budget``-sized windows of the
    stream, docs split across the packs their span touches (mirrors
    curation.pack_budgeted; range() unrolls the per-doc pack list the
    Spark side builds with sequence+explode)."""
    return _bpe_chain(k) + f""",
enc AS (
  SELECT word, len(string_split(trim(syms), ' ')) AS n_syms_w
  FROM w{k}),
tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
ds AS (
  SELECT doc_id, CAST(SUM(n_syms_w) AS BIGINT) AS n_symbols
  FROM tk JOIN enc USING (word)
  WHERE word <> ''
  GROUP BY doc_id),
sd AS (
  SELECT d.source, ds.doc_id, ds.n_symbols,
         CAST(COALESCE(SUM(ds.n_symbols) OVER (
             PARTITION BY d.source ORDER BY ds.doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS start_off
  FROM ds JOIN documents d USING (doc_id)),
b AS (
  SELECT source, doc_id, n_symbols, start_off,
         unnest(range(start_off // {budget},
                      (start_off + n_symbols - 1) // {budget} + 1))
           AS bin_id
  FROM sd)
SELECT source, CAST(bin_id AS INTEGER) AS bin_id, doc_id,
       CAST(n_symbols AS BIGINT) AS n_symbols,
       CAST(LEAST((bin_id + 1) * {budget}, start_off + n_symbols)
            - GREATEST(bin_id * {budget}, start_off) AS BIGINT)
         AS sym_in_bin
FROM b"""


def _bpe_fertility_oracle_sql(k: int) -> str:
    """Per-source fertility under the same k-merge chain: one corpus
    token pass joined to the per-word symbolization, source-keyed
    integer aggregates (HUGEINT intermediates cast to BIGINT at the
    edge, the oracle-dtype discipline)."""
    return _bpe_chain(k) + f""",
enc AS (
  SELECT word, length(word) AS n_chars_w,
         len(string_split(trim(syms), ' ')) AS n_syms_w
  FROM w{k}),
tk AS (
  SELECT source, doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents)
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(n_syms_w) AS BIGINT) AS n_symbols,
       CAST(SUM(n_syms_w) * 1000000 // COUNT(*) AS BIGINT)
         AS fertility_ppm,
       CAST(CASE WHEN SUM(n_chars_w) = 0 THEN 1000000
                 ELSE SUM(n_syms_w) * 1000000 // SUM(n_chars_w)
            END AS BIGINT) AS compression_ppm
FROM tk JOIN enc USING (word)
WHERE word <> ''
GROUP BY source"""


def _epoch_plan_fertility_oracle_sql(k: int, budget_ppm: int = 1_500_000,
                                     max_epochs_ppm: int = 4_000_000) -> str:
    """Fertility-aware epoch plan: per-source sizes are SYMBOL counts
    under the k-merge chain (the fertility oracle's aggregate), fed
    through the same integer water-filling SQL as cur_epoch_plan —
    only the sizes CTE and the output column names differ, so the two
    oracles cannot drift in plan semantics."""
    return _bpe_chain(k) + f""",
enc AS (
  SELECT word, len(string_split(trim(syms), ' ')) AS n_syms_w
  FROM w{k}),
tk AS (
  SELECT source, doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents),
sizes AS (
  SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(SUM(n_syms_w) AS BIGINT) AS tokens
  FROM tk JOIN enc USING (word)
  WHERE word <> '' GROUP BY source),
caps AS (
  SELECT *, ({max_epochs_ppm} * tokens) // 1000000 AS absorb_cap
  FROM sizes),
st AS (
  SELECT *,
         CAST(SUM(tokens) OVER () AS BIGINT) AS t_tot,
         CAST(COUNT(*) OVER () AS BIGINT) AS k,
         CAST(ROW_NUMBER() OVER (ORDER BY absorb_cap, source)
              AS BIGINT) AS i,
         CAST(COALESCE(SUM(absorb_cap) OVER (
              ORDER BY absorb_cap, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_a
  FROM caps),
cp AS (
  SELECT *,
         ({budget_ppm} * t_tot) // 1000000 AS b,
         (({budget_ppm} * t_tot) // 1000000 >= cum_a
          AND absorb_cap <=
              (({budget_ppm} * t_tot) // 1000000 - cum_a) // (k - i + 1))
           AS capped
  FROM st),
agg AS (
  SELECT *,
         CAST(SUM(CASE WHEN capped THEN absorb_cap ELSE 0 END) OVER ()
              AS BIGINT) AS cap_a,
         CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER ()
              AS BIGINT) AS n_cap,
         CAST(SUM(CASE WHEN capped THEN 0 ELSE 1 END) OVER (
              ORDER BY absorb_cap, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS uncap_rank
  FROM cp),
alloc AS (
  SELECT source, n_docs, tokens, absorb_cap, capped,
         CASE WHEN capped THEN absorb_cap
              ELSE (b - cap_a) // (k - n_cap)
                   + CASE WHEN uncap_rank <= (b - cap_a) % (k - n_cap)
                          THEN 1 ELSE 0 END
         END AS alloc_tokens
  FROM agg)
SELECT source, n_docs, tokens AS n_symbols, absorb_cap,
       CAST(alloc_tokens AS BIGINT) AS alloc_symbols,
       CAST(CASE WHEN tokens > 0
                 THEN (alloc_tokens * 1000000) // tokens
                 ELSE 0 END AS BIGINT) AS epochs_ppm,
       CASE WHEN capped THEN 'Y' ELSE 'N' END AS capped_flag
FROM alloc"""


def _reference_profile_values() -> str:
    """The v1 declared reference unigram profile as a VALUES list —
    generated from the SAME dict the Spark query folds into its map
    literal (textops.REFERENCE_UNIGRAM_PPM_V1), so the two sides
    cannot drift."""
    from dht11_data_pipeline_spark.operators.textops import (
        REFERENCE_UNIGRAM_PPM_V1)
    return ", ".join(f"('{w}', {int(p)})"
                     for w, p in sorted(REFERENCE_UNIGRAM_PPM_V1.items()))


def _reference_profile_qtot() -> int:
    from dht11_data_pipeline_spark.operators.textops import (
        REFERENCE_UNIGRAM_PPM_V1)
    return sum(int(p) for p in REFERENCE_UNIGRAM_PPM_V1.values())


EXT_ORACLES: dict[str, str] = {
    # declared-weights linear quality classifier: hashed-unigram
    # buckets (same sha256 first-8-hex arithmetic as every curation
    # gate) joined to the generated weight VALUES, summed per doc;
    # the threshold is a multiply-compare (never a division — scores
    # are legitimately negative, where Spark DIV and DuckDB // differ)
    "text_quality_classifier": f"""
WITH w(bucket, wt) AS (
  SELECT * FROM (VALUES {_quality_weight_values()}) AS v(bucket, wt)),
t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS tok
      FROM documents),
b AS (
  SELECT doc_id,
         CAST(('0x' || substr(sha256('qcls1' || chr(31) || token), 1, 8))
              ::BIGINT % 128 AS INTEGER) AS bucket
  FROM (SELECT doc_id, unnest(tok) AS token FROM t)),
per AS (
  SELECT doc_id, SUM(COALESCE(wt, 0)) AS s
  FROM b LEFT JOIN w USING (bucket) GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(tok) AS INTEGER) AS n_tokens,
       CAST(COALESCE(s, 0) AS BIGINT) AS score_sum,
       CASE WHEN COALESCE(s, 0) * 1000 >= 25 * len(tok)
            THEN 'Y' ELSE 'N' END AS keep_flag
FROM t LEFT JOIN per USING (doc_id)
""",

    # the classifier verdict feeding the weighted_keep gate — same
    # gate SQL shape as cur_dsir_resample (// == DIV on the Y-flagged
    # subset, whose scores are positive by the threshold)
    "cur_quality_gate": f"""
WITH w(bucket, wt) AS (
  SELECT * FROM (VALUES {_quality_weight_values()}) AS v(bucket, wt)),
t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS tok
      FROM documents),
b AS (
  SELECT doc_id,
         CAST(('0x' || substr(sha256('qcls1' || chr(31) || token), 1, 8))
              ::BIGINT % 128 AS INTEGER) AS bucket
  FROM (SELECT doc_id, unnest(tok) AS token FROM t)),
per AS (
  SELECT doc_id, SUM(COALESCE(wt, 0)) AS s
  FROM b LEFT JOIN w USING (bucket) GROUP BY doc_id),
kept AS (
  SELECT t.doc_id, CAST(COALESCE(s, 0) AS BIGINT) AS weight
  FROM t LEFT JOIN per USING (doc_id)
  WHERE COALESCE(s, 0) * 1000 >= 25 * len(tok)),
g AS (
  SELECT doc_id, weight,
         ('0x' || substr(sha256('wkeep1' || chr(31)
              || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
           AS bucket
  FROM kept),
mx AS (SELECT MAX(weight) AS w_max FROM g)
SELECT doc_id, weight,
       CAST(bucket AS INTEGER) AS bucket,
       CAST(LEAST(1000000, (500000 * weight) // w_max) AS BIGINT)
         AS keep_ppm,
       CASE WHEN bucket * w_max < 500000 * weight
            THEN 'Y' ELSE 'N' END AS keep_flag
FROM g, mx
""",

    "text_bpe_vocab": _bpe_oracle_sql(6),
    "text_bpe_encode": _bpe_encode_oracle_sql(6),
    "cur_bpe_pack": _bpe_pack_oracle_sql(6, 256),
    "text_bpe_fertility": _bpe_fertility_oracle_sql(6),
    "cur_epoch_plan_fertility": _epoch_plan_fertility_oracle_sql(6),

    # doc-level contamination drill-down: the matrix's distinct
    # inverted index carried to (source, doc, gram), double hub cap
    # (2..50 sources AND <=50 docs per gram — mirrors textops.
    # MAX_SOURCES_PER_GRAM / MAX_DOCS_PER_GRAM), per-source-pair
    # top-5 by shared distinct grams, deterministic (doc_a, doc_b)
    # tie-break
    "cur_contamination_pairs": """
WITH t AS (SELECT source, doc_id, string_split(text, ' ') AS tok
           FROM documents),
g AS (
  SELECT DISTINCT source AS src, doc_id AS doc,
         array_to_string(tok[i : i + 6], ' ') AS gram
  FROM (SELECT source, doc_id, tok, unnest(range(1, len(tok) - 5)) AS i
        FROM t WHERE len(tok) >= 7)),
st AS (
  SELECT gram, COUNT(DISTINCT src) AS n_src, COUNT(*) AS n_doc
  FROM g GROUP BY gram),
capped AS (
  SELECT g.src, g.doc, g.gram
  FROM g JOIN st USING (gram)
  WHERE st.n_src BETWEEN 2 AND 50 AND st.n_doc <= 50),
pairs AS (
  SELECT a.src AS source_a, b.src AS source_b,
         a.doc AS doc_a, b.doc AS doc_b,
         COUNT(*) AS shared_grams
  FROM capped a JOIN capped b USING (gram)
  WHERE a.src < b.src
  GROUP BY 1, 2, 3, 4),
rk AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY source_a, source_b
      ORDER BY shared_grams DESC, doc_a, doc_b) AS pair_rank
  FROM pairs)
SELECT source_a, source_b, doc_a, doc_b,
       CAST(shared_grams AS BIGINT) AS shared_grams,
       CAST(pair_rank AS INTEGER) AS pair_rank
FROM rk WHERE pair_rank <= 5
""",

    # span extraction for the flagged doc pairs: same capped index,
    # pair ranking re-derived, then the first 10 shared grams
    # lexicographically per flagged pair
    "cur_contamination_spans": """
WITH t AS (SELECT source, doc_id, string_split(text, ' ') AS tok
           FROM documents),
g AS (
  SELECT DISTINCT source AS src, doc_id AS doc,
         array_to_string(tok[i : i + 6], ' ') AS gram
  FROM (SELECT source, doc_id, tok, unnest(range(1, len(tok) - 5)) AS i
        FROM t WHERE len(tok) >= 7)),
st AS (
  SELECT gram, COUNT(DISTINCT src) AS n_src, COUNT(*) AS n_doc
  FROM g GROUP BY gram),
capped AS (
  SELECT g.src, g.doc, g.gram
  FROM g JOIN st USING (gram)
  WHERE st.n_src BETWEEN 2 AND 50 AND st.n_doc <= 50),
shared AS (
  SELECT a.src AS source_a, b.src AS source_b,
         a.doc AS doc_a, b.doc AS doc_b, gram
  FROM capped a JOIN capped b USING (gram)
  WHERE a.src < b.src),
flagged AS (
  SELECT source_a, source_b, doc_a, doc_b, pair_rank FROM (
    SELECT source_a, source_b, doc_a, doc_b,
           ROW_NUMBER() OVER (PARTITION BY source_a, source_b
             ORDER BY COUNT(*) DESC, doc_a, doc_b) AS pair_rank
    FROM shared GROUP BY source_a, source_b, doc_a, doc_b)
  WHERE pair_rank <= 5),
rk AS (
  SELECT s.source_a, s.source_b, s.doc_a, s.doc_b, f.pair_rank, s.gram,
         ROW_NUMBER() OVER (
             PARTITION BY s.source_a, s.source_b, s.doc_a, s.doc_b
             ORDER BY s.gram) AS gram_rank
  FROM shared s
  JOIN flagged f USING (source_a, source_b, doc_a, doc_b))
SELECT source_a, source_b, doc_a, doc_b,
       CAST(pair_rank AS INTEGER) AS pair_rank,
       CAST(gram_rank AS INTEGER) AS gram_rank,
       gram
FROM rk WHERE gram_rank <= 10
""",

    # audit-time contamination gate: per-doc count of distinct
    # cross-source-band grams (the drill-down index's flagged set —
    # source band 2..50, no doc cap), QUARANTINE at >= 1 hit;
    # zero-hit docs surface via the left join
    "cur_contamination_gate": """
WITH t AS (SELECT source, doc_id, string_split(text, ' ') AS tok
           FROM documents),
g AS (
  SELECT DISTINCT source AS src, doc_id AS doc,
         array_to_string(tok[i : i + 6], ' ') AS gram
  FROM (SELECT source, doc_id, tok, unnest(range(1, len(tok) - 5)) AS i
        FROM t WHERE len(tok) >= 7)),
st AS (
  SELECT gram, COUNT(DISTINCT src) AS n_src
  FROM g GROUP BY gram),
hits AS (
  SELECT g.doc, COUNT(*) AS flagged_hits
  FROM g JOIN st USING (gram)
  WHERE st.n_src BETWEEN 2 AND 50
  GROUP BY g.doc)
SELECT d.doc_id, d.source,
       CAST(COALESCE(h.flagged_hits, 0) AS BIGINT) AS flagged_hits,
       CASE WHEN COALESCE(h.flagged_hits, 0) >= 1
            THEN 'QUARANTINE' ELSE 'PASS' END AS gate_flag
FROM documents d LEFT JOIN hits h ON h.doc = d.doc_id
""",

    # positional span extraction: same capped index and pair ranking
    # as cur_contamination_pairs, then the flagged docs' grams are
    # re-generated WITH positions (restricted to the flagged-doc set,
    # mirroring the Spark side's broadcast semi-join) and maximal
    # shared runs come from gaps-and-islands on the diagonal
    # start_a - start_b; a run of L shared 7-grams covers L+6 tokens
    "cur_contamination_pos_spans": """
WITH t AS (SELECT source, doc_id, string_split(text, ' ') AS tok
           FROM documents),
g AS (
  SELECT DISTINCT source AS src, doc_id AS doc,
         array_to_string(tok[i : i + 6], ' ') AS gram
  FROM (SELECT source, doc_id, tok, unnest(range(1, len(tok) - 5)) AS i
        FROM t WHERE len(tok) >= 7)),
st AS (
  SELECT gram, COUNT(DISTINCT src) AS n_src, COUNT(*) AS n_doc
  FROM g GROUP BY gram),
capped AS (
  SELECT g.src, g.doc, g.gram
  FROM g JOIN st USING (gram)
  WHERE st.n_src BETWEEN 2 AND 50 AND st.n_doc <= 50),
flagged AS (
  SELECT source_a, source_b, doc_a, doc_b, pair_rank FROM (
    SELECT a.src AS source_a, b.src AS source_b,
           a.doc AS doc_a, b.doc AS doc_b,
           ROW_NUMBER() OVER (PARTITION BY a.src, b.src
             ORDER BY COUNT(*) DESC, a.doc, b.doc) AS pair_rank
    FROM capped a JOIN capped b USING (gram)
    WHERE a.src < b.src
    GROUP BY a.src, b.src, a.doc, b.doc)
  WHERE pair_rank <= 5),
pg AS (
  SELECT doc_id AS doc, CAST(i AS INTEGER) AS pos,
         array_to_string(tok[i : i + 6], ' ') AS gram
  FROM (SELECT doc_id, tok, unnest(range(1, len(tok) - 5)) AS i
        FROM t WHERE len(tok) >= 7)
  WHERE doc_id IN (SELECT doc_a FROM flagged
                   UNION SELECT doc_b FROM flagged)),
m AS (
  SELECT f.source_a, f.source_b, f.doc_a, f.doc_b, f.pair_rank,
         a.pos AS start_a, b.pos AS start_b,
         a.pos - b.pos AS diag
  FROM flagged f
  JOIN pg a ON a.doc = f.doc_a
  JOIN pg b ON b.doc = f.doc_b AND b.gram = a.gram),
isl AS (
  SELECT *, start_a - ROW_NUMBER() OVER (
      PARTITION BY source_a, source_b, doc_a, doc_b, diag
      ORDER BY start_a) AS island
  FROM m),
runs AS (
  SELECT source_a, source_b, doc_a, doc_b, pair_rank,
         MIN(start_a) AS s_a, MIN(start_b) AS s_b,
         COUNT(*) + 6 AS run_tokens
  FROM isl
  GROUP BY source_a, source_b, doc_a, doc_b, pair_rank, diag, island),
rk AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY source_a, source_b, doc_a, doc_b
      ORDER BY run_tokens DESC, s_a, s_b) AS run_rank
  FROM runs)
SELECT source_a, source_b, doc_a, doc_b,
       CAST(pair_rank AS INTEGER) AS pair_rank,
       CAST(s_a AS INTEGER) AS start_a,
       CAST(s_b AS INTEGER) AS start_b,
       CAST(run_tokens AS BIGINT) AS run_tokens,
       CAST(run_rank AS INTEGER) AS run_rank
FROM rk WHERE run_rank <= 10
""",

    # surgical span cut: the positional-runs chain, cut ranges taken
    # on the b side (default policy: no protected sources, the later
    # source pays), token positions dropped by NOT EXISTS against the
    # ranges, text rebuilt with an ordered string_agg; untouched docs
    # pass through verbatim
    "cur_contamination_cut": """
WITH t AS (SELECT source, doc_id, string_split(text, ' ') AS tok
           FROM documents),
g AS (
  SELECT DISTINCT source AS src, doc_id AS doc,
         array_to_string(tok[i : i + 6], ' ') AS gram
  FROM (SELECT source, doc_id, tok, unnest(range(1, len(tok) - 5)) AS i
        FROM t WHERE len(tok) >= 7)),
st AS (
  SELECT gram, COUNT(DISTINCT src) AS n_src, COUNT(*) AS n_doc
  FROM g GROUP BY gram),
capped AS (
  SELECT g.src, g.doc, g.gram
  FROM g JOIN st USING (gram)
  WHERE st.n_src BETWEEN 2 AND 50 AND st.n_doc <= 50),
flagged AS (
  SELECT source_a, source_b, doc_a, doc_b, pair_rank FROM (
    SELECT a.src AS source_a, b.src AS source_b,
           a.doc AS doc_a, b.doc AS doc_b,
           ROW_NUMBER() OVER (PARTITION BY a.src, b.src
             ORDER BY COUNT(*) DESC, a.doc, b.doc) AS pair_rank
    FROM capped a JOIN capped b USING (gram)
    WHERE a.src < b.src
    GROUP BY a.src, b.src, a.doc, b.doc)
  WHERE pair_rank <= 5),
pg AS (
  SELECT doc_id AS doc, CAST(i AS INTEGER) AS pos,
         array_to_string(tok[i : i + 6], ' ') AS gram
  FROM (SELECT doc_id, tok, unnest(range(1, len(tok) - 5)) AS i
        FROM t WHERE len(tok) >= 7)
  WHERE doc_id IN (SELECT doc_a FROM flagged
                   UNION SELECT doc_b FROM flagged)),
m AS (
  SELECT f.source_a, f.source_b, f.doc_a, f.doc_b, f.pair_rank,
         a.pos AS start_a, b.pos AS start_b,
         a.pos - b.pos AS diag
  FROM flagged f
  JOIN pg a ON a.doc = f.doc_a
  JOIN pg b ON b.doc = f.doc_b AND b.gram = a.gram),
isl AS (
  SELECT *, start_a - ROW_NUMBER() OVER (
      PARTITION BY source_a, source_b, doc_a, doc_b, diag
      ORDER BY start_a) AS island
  FROM m),
runs AS (
  SELECT source_a, source_b, doc_a, doc_b, pair_rank,
         MIN(start_a) AS s_a, MIN(start_b) AS s_b,
         COUNT(*) + 6 AS run_tokens
  FROM isl
  GROUP BY source_a, source_b, doc_a, doc_b, pair_rank, diag, island),
rk AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY source_a, source_b, doc_a, doc_b
      ORDER BY run_tokens DESC, s_a, s_b) AS run_rank
  FROM runs),
cuts AS (
  SELECT doc_b AS cid, s_b AS s, run_tokens AS l
  FROM rk WHERE run_rank <= 10),
aff AS (SELECT DISTINCT cid FROM cuts),
tkp AS (
  SELECT doc_id, source, CAST(i AS INTEGER) AS pos, tok[i] AS tk
  FROM (SELECT doc_id, source, tok, unnest(range(1, len(tok) + 1)) AS i
        FROM t)
  WHERE doc_id IN (SELECT cid FROM aff)),
kept AS (
  SELECT * FROM tkp p WHERE NOT EXISTS (
    SELECT 1 FROM cuts c
    WHERE c.cid = p.doc_id AND p.pos >= c.s AND p.pos < c.s + c.l)),
clean AS (
  SELECT doc_id, source, COUNT(*) AS n_kept,
         string_agg(tk, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id, source)
SELECT d.doc_id, d.source,
       CAST(len(string_split(d.text, ' ')) AS INTEGER) AS n_tokens,
       CAST(0 AS INTEGER) AS n_removed,
       d.text AS clean_text
FROM documents d WHERE d.doc_id NOT IN (SELECT cid FROM aff)
UNION ALL
SELECT d.doc_id, d.source,
       CAST(len(string_split(d.text, ' ')) AS INTEGER) AS n_tokens,
       CAST(len(string_split(d.text, ' ')) - COALESCE(c.n_kept, 0)
            AS INTEGER) AS n_removed,
       COALESCE(c.clean_text, '') AS clean_text
FROM documents d
JOIN aff ON aff.cid = d.doc_id
LEFT JOIN clean c ON c.doc_id = d.doc_id
""",

    # declared-profile TV drift: same integer-ppm floors as the full
    # monitor, reference masses from the generated VALUES list (the
    # Python-side Q_tot scalar is inlined, mirroring the Spark query)
    "text_source_divergence_declared": f"""
WITH q(word, q_ppm) AS (
  SELECT * FROM (VALUES {_reference_profile_values()}) AS v(word, q_ppm)),
sw AS (
  SELECT source, word, COUNT(*) AS c_sw FROM (
    SELECT source, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY source, word),
p AS (
  SELECT source, word, c_sw,
         c_sw * 1000000 // SUM(c_sw) OVER (PARTITION BY source) AS p_ppm
  FROM sw),
j AS (
  SELECT p.*, COALESCE(q.q_ppm, 0) AS q_ppm
  FROM p LEFT JOIN q USING (word))
SELECT source,
       CAST(SUM(c_sw) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST((SUM(ABS(p_ppm - q_ppm)) + {_reference_profile_qtot()}
             - SUM(q_ppm)) // 2 AS BIGINT) AS tv_ppm
FROM j GROUP BY source
""",

    # per-source total-variation drift: integer ppm floors both sides,
    # absent-word tail closed as Q_tot − Σ_present q (never a
    # source×vocab grid)
    "text_source_divergence": """
WITH sw AS (
  SELECT source, word, COUNT(*) AS c_sw FROM (
    SELECT source, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY source, word),
wt AS (SELECT word, SUM(c_sw) AS c_w FROM sw GROUP BY word),
q AS (
  SELECT word, c_w * 1000000 // (SELECT SUM(c_w) FROM wt) AS q_ppm
  FROM wt),
qtot AS (SELECT SUM(q_ppm) AS q_tot FROM q),
p AS (
  SELECT source, word, c_sw,
         c_sw * 1000000 // SUM(c_sw) OVER (PARTITION BY source) AS p_ppm
  FROM sw)
SELECT source,
       CAST(SUM(c_sw) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST((SUM(ABS(p_ppm - q_ppm)) + MIN(q_tot) - SUM(q_ppm)) // 2
            AS BIGINT) AS tv_ppm
FROM p JOIN q USING (word), qtot
GROUP BY source
""",

    # cross-source shared-7-gram matrix: distinct (source, gram)
    # inverted index, hub cap 2..50 sources per gram (mirrors
    # textops.MAX_SOURCES_PER_GRAM), unordered pairs once
    "cur_contamination_matrix": """
WITH t AS (SELECT source, string_split(text, ' ') AS tok FROM documents),
g AS (
  SELECT DISTINCT source AS src, array_to_string(tok[i : i + 6], ' ') AS gram
  FROM (SELECT source, tok, unnest(range(1, len(tok) - 5)) AS i
        FROM t WHERE len(tok) >= 7)),
capped AS (
  SELECT src, gram FROM (
    SELECT src, gram, COUNT(*) OVER (PARTITION BY gram) AS n_src FROM g)
  WHERE n_src BETWEEN 2 AND 50)
SELECT a.src AS source_a, b.src AS source_b,
       CAST(COUNT(*) AS BIGINT) AS shared_grams
FROM capped a JOIN capped b USING (gram)
WHERE a.src < b.src
GROUP BY a.src, b.src
""",

    # the Spark side tiles with operators.ranking.global_ntile (a
    # distributed exact NTILE); the plain window here is the semantic
    # twin — identical assignment, single-partition plan the engine
    # side deliberately avoids
    "o_revenue_deciles": """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
  FROM orders GROUP BY o_custkey
),
tiled AS (
  SELECT o_custkey, rev_d,
         NTILE(10) OVER (ORDER BY rev_d DESC, o_custkey) AS decile
  FROM per_cust
)
SELECT CAST(decile AS INTEGER) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(rev_d) AS DOUBLE) AS total_revenue,
       CAST(MIN(rev_d) AS DOUBLE) AS min_revenue,
       CAST(MAX(rev_d) AS DOUBLE) AS max_revenue
FROM tiled GROUP BY decile
""",

    # Pearson r from DECIMAL-exact moments cast to double at the end —
    # five double ops + sqrt on identical inputs on both engines (the
    # ts_anomaly_days discipline); den <= 0 (constant series) yields
    # NULL on both sides
    "ts_autocorrelation": """
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,2))) AS x_d
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, x_d,
         LAG(x_d, 1) OVER w AS lag1, LAG(x_d, 2) OVER w AS lag2,
         LAG(x_d, 3) OVER w AS lag3, LAG(x_d, 7) OVER w AS lag7
  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
pairs AS (
  SELECT event_type, lag, x_d, y_d FROM (
    SELECT event_type, x_d, 1 AS lag, lag1 AS y_d FROM lagged
    UNION ALL SELECT event_type, x_d, 2, lag2 FROM lagged
    UNION ALL SELECT event_type, x_d, 3, lag3 FROM lagged
    UNION ALL SELECT event_type, x_d, 7, lag7 FROM lagged
  ) WHERE y_d IS NOT NULL
),
m AS (
  SELECT event_type, lag,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(x_d) AS DOUBLE) AS sx,
         CAST(SUM(y_d) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x_d * y_d AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x_d * x_d AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y_d * y_d AS DECIMAL(38,4))) AS DOUBLE) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, CAST(lag AS INTEGER) AS lag, n_pairs,
       CASE WHEN sqrt(n_pairs * sxx - sx * sx)
                 * sqrt(n_pairs * syy - sy * sy) > 0
            THEN ROUND((n_pairs * sxy - sx * sy)
                       / (sqrt(n_pairs * sxx - sx * sx)
                          * sqrt(n_pairs * syy - sy * sy)), 4)
       END AS acf
FROM m
""",

    # same DECIMAL-exact-moments discipline as ts_autocorrelation; the
    # calendar-day lag is DATE + INTEGER on both engines, so date gaps
    # drop pairs identically
    "ts_cross_correlation": """
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,2))) AS total_d
  FROM events GROUP BY 1, 2
),
purch AS (
  SELECT day AS p_day, total_d AS y_d FROM daily
  WHERE event_type = 'purchase'
),
lead AS (
  SELECT event_type, t.lag, day + t.lag AS p_day, total_d AS x_d
  FROM daily, UNNEST([0, 1, 2, 3]) AS t(lag)
  WHERE event_type <> 'purchase'
),
pairs AS (
  SELECT event_type, lag, x_d, y_d FROM lead JOIN purch USING (p_day)
),
m AS (
  SELECT event_type, lag,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(x_d) AS DOUBLE) AS sx,
         CAST(SUM(y_d) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x_d * y_d AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x_d * x_d AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y_d * y_d AS DECIMAL(38,4))) AS DOUBLE) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, CAST(lag AS INTEGER) AS lag, n_pairs,
       CASE WHEN sqrt(n_pairs * sxx - sx * sx)
                 * sqrt(n_pairs * syy - sy * sy) > 0
            THEN ROUND((n_pairs * sxy - sx * sy)
                       / (sqrt(n_pairs * sxx - sx * sx)
                          * sqrt(n_pairs * syy - sy * sy)), 4)
       END AS xcorr
FROM m
""",

    # lift = p(xy)/(p(x)p(y)) from exact integer counts; the final
    # expression is the identical double multiply chain + one division
    # on both engines (no ln() — libm last-ulp drift)
    "text_bigram_lift": """
WITH toks AS (
  SELECT string_split(text, ' ') AS w FROM documents
),
uni AS (
  SELECT word, COUNT(*) AS c FROM toks, UNNEST(w) AS u(word)
  GROUP BY word
),
big AS (
  SELECT w[i] AS w1, w[i + 1] AS w2, COUNT(*) AS c_xy
  FROM toks, UNNEST(range(1, len(w))) AS t(i)
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
),
n AS (SELECT SUM(c) AS n_tok FROM uni),
m AS (SELECT SUM(GREATEST(len(w) - 1, 0)) AS m_big FROM toks)
SELECT big.w1, big.w2,
       CAST(c_xy AS BIGINT) AS c_xy,
       CAST(ux.c AS BIGINT) AS c_x,
       CAST(uy.c AS BIGINT) AS c_y,
       ROUND((CAST(c_xy AS DOUBLE) * CAST(n_tok AS DOUBLE)
              * CAST(n_tok AS DOUBLE))
             / (CAST(m_big AS DOUBLE) * CAST(ux.c AS DOUBLE)
                * CAST(uy.c AS DOUBLE)), 4) AS lift
FROM big
JOIN uni ux ON ux.word = big.w1
JOIN uni uy ON uy.word = big.w2
CROSS JOIN n CROSS JOIN m
""",

    # the Spark side computes rank AND running total with the
    # distributed global_rank_cumsum operator; the single-partition
    # ROW_NUMBER + SUM OVER here is the semantic twin. Integer cents
    # end-to-end; 10000*cum fits BIGINT comfortably at any tested SF
    "o_customer_revenue_rank": """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, rev_cents,
         CAST(ROW_NUMBER() OVER (ORDER BY rev_cents DESC, o_custkey)
              AS BIGINT) AS rank,
         CAST(SUM(rev_cents) OVER (ORDER BY rev_cents DESC, o_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_cents
  FROM per_cust
)
SELECT o_custkey, rank, rev_cents,
       CAST((10000 * cum_cents)
            // (SELECT MAX(cum_cents) FROM ranked) AS BIGINT)
         AS cum_share_bp
FROM ranked
""",

    # integer-exact importance gate: bucket*w_max < rate*w, bucket the
    # portable sha256 ppm hash; // and DIV agree (operands non-negative)
    "cur_weighted_sample": """
WITH w AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS weight,
         ('0x' || substr(sha256('wkeep1' || chr(31)
              || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
           AS bucket
  FROM documents),
mx AS (SELECT MAX(weight) AS w_max FROM w)
SELECT doc_id, weight,
       CAST(bucket AS INTEGER) AS bucket,
       CAST(LEAST(1000000, (500000 * weight) // w_max) AS BIGINT)
         AS keep_ppm,
       CASE WHEN bucket * w_max < 500000 * weight
            THEN 'Y' ELSE 'N' END AS keep_flag
FROM w, mx
""",

    # data-constrained epoch planning: exact integer water-filling of
    # a 1.5x-corpus token budget, uniform per source, absorption cap
    # 4 epochs; capped set is a prefix of (absorb_cap, source) order
    # (mirrors operators/curation.epoch_plan incl. the remainder +1
    # spread to the first `rem` uncapped sources in the same order)
    "cur_epoch_plan": """
WITH sizes AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY source),
caps AS (
  SELECT *, (4000000 * tokens) // 1000000 AS absorb_cap FROM sizes),
st AS (
  SELECT *,
         CAST(SUM(tokens) OVER () AS BIGINT) AS t_tot,
         CAST(COUNT(*) OVER () AS BIGINT) AS k,
         CAST(ROW_NUMBER() OVER (ORDER BY absorb_cap, source)
              AS BIGINT) AS i,
         CAST(COALESCE(SUM(absorb_cap) OVER (
              ORDER BY absorb_cap, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_a
  FROM caps),
cp AS (
  SELECT *,
         (1500000 * t_tot) // 1000000 AS b,
         ((1500000 * t_tot) // 1000000 >= cum_a
          AND absorb_cap <=
              ((1500000 * t_tot) // 1000000 - cum_a) // (k - i + 1))
           AS capped
  FROM st),
agg AS (
  SELECT *,
         CAST(SUM(CASE WHEN capped THEN absorb_cap ELSE 0 END) OVER ()
              AS BIGINT) AS cap_a,
         CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER ()
              AS BIGINT) AS n_cap,
         CAST(SUM(CASE WHEN capped THEN 0 ELSE 1 END) OVER (
              ORDER BY absorb_cap, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS uncap_rank
  FROM cp),
alloc AS (
  SELECT source, n_docs, tokens, absorb_cap, capped,
         CASE WHEN capped THEN absorb_cap
              ELSE (b - cap_a) // (k - n_cap)
                   + CASE WHEN uncap_rank <= (b - cap_a) % (k - n_cap)
                          THEN 1 ELSE 0 END
         END AS alloc_tokens
  FROM agg)
SELECT source, n_docs, tokens, absorb_cap,
       CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
       CAST(CASE WHEN tokens > 0
                 THEN (alloc_tokens * 1000000) // tokens
                 ELSE 0 END AS BIGINT) AS epochs_ppm,
       CASE WHEN capped THEN 'Y' ELSE 'N' END AS capped_flag
FROM alloc
""",

    # per-source τ=2 temperature mixing: keep_ppm_g = (rate ·
    # isqrt(min_n)) // isqrt(n_g), with isqrt the Newton-corrected
    # exact floor sqrt (mirrors curation._exact_isqrt — the double
    # candidate is within ±1, one correction pins it in both engines)
    "cur_source_temperature": """
WITH sizes AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source),
m AS (SELECT MIN(n_docs) AS min_n FROM sizes),
c AS (
  SELECT source, n_docs, min_n,
         CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS cg,
         CAST(floor(sqrt(CAST(min_n AS DOUBLE))) AS BIGINT) AS cm
  FROM sizes, m),
isq AS (
  SELECT source, n_docs,
         CASE WHEN (cg + 1) * (cg + 1) <= n_docs THEN cg + 1
              WHEN cg * cg > n_docs THEN cg - 1 ELSE cg END AS isq_g,
         CASE WHEN (cm + 1) * (cm + 1) <= min_n THEN cm + 1
              WHEN cm * cm > min_n THEN cm - 1 ELSE cm END AS isq_min
  FROM c),
rates AS (
  SELECT source, n_docs,
         CAST(LEAST(1000000, (500000 * isq_min) // isq_g) AS BIGINT)
           AS keep_ppm
  FROM isq),
gate AS (
  SELECT d.source, r.n_docs, r.keep_ppm,
         ('0x' || substr(sha256('stemp1' || chr(31)
              || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
           AS bucket
  FROM documents d JOIN rates r USING (source))
SELECT source, CAST(MAX(n_docs) AS BIGINT) AS n_docs,
       CAST(MAX(keep_ppm) AS BIGINT) AS keep_ppm,
       CAST(SUM(CASE WHEN bucket < keep_ppm THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept
FROM gate GROUP BY source
""",

    # full DSIR stage: the text_dsir_weight score chain feeding the
    # cur_weighted_sample integer gate — keep iff bucket*w_max <
    # rate*score, all integer (// == DIV on non-negative operands)
    "cur_dsir_resample": """
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS tok FROM documents),
idx AS (
  SELECT doc_id, lang, tok, unnest(range(1, len(tok))) AS i
  FROM t WHERE len(tok) >= 2),
g AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(sha256('dsir1' || chr(31)
               || array_to_string(tok[i : i + 1], ' ')), 1, 8))::BIGINT
              % 128 AS INTEGER) AS bucket
  FROM idx),
stats AS (
  SELECT bucket,
         COUNT(*) AS raw_n,
         COUNT(*) FILTER (WHERE lang = 'en') AS tgt_n
  FROM g GROUP BY bucket),
per AS (
  SELECT doc_id, COUNT(*) AS n_grams, SUM(tgt_n * 1000000 // raw_n) AS w
  FROM g JOIN stats USING (bucket) GROUP BY doc_id),
s AS (
  SELECT d.doc_id,
         CAST(CASE WHEN COALESCE(n_grams, 0) = 0 THEN 0
                   ELSE w // n_grams END AS BIGINT) AS weight,
         ('0x' || substr(sha256('wkeep1' || chr(31)
              || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
           AS bucket
  FROM documents d LEFT JOIN per USING (doc_id)),
mx AS (SELECT MAX(weight) AS w_max FROM s)
SELECT doc_id, weight,
       CAST(bucket AS INTEGER) AS bucket,
       CAST(LEAST(1000000, (500000 * weight) // w_max) AS BIGINT)
         AS keep_ppm,
       CASE WHEN bucket * w_max < 500000 * weight
            THEN 'Y' ELSE 'N' END AS keep_flag
FROM s, mx
""",

    # deterministic training-order shuffle: rank in (sha bucket, id)
    # order — the same portable hash as the curation gates
    "cur_training_order": """
WITH k AS (
  SELECT doc_id,
         ('0x' || substr(sha256('epoch1' || chr(31)
              || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
           AS shuffle_key
  FROM documents)
SELECT doc_id, shuffle_key,
       CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT)
         AS position,
       CAST((ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) - 1) % 8
            AS INTEGER) AS shard
FROM k
""",

    # embedding-space decontamination: rounded cosine vs every probe,
    # hit-count + max per corpus vector; SUM cast to BIGINT
    "cur_semantic_decontaminate": """
WITH p AS (SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv
           FROM embeddings WHERE vec_id % 50 = 0),
c AS (SELECT vec_id, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id % 50 <> 0),
s AS (
  SELECT c.vec_id, round(list_cosine_similarity(cv, pv), 4) AS sim
  FROM c CROSS JOIN p
)
SELECT vec_id,
       CAST(SUM(CASE WHEN sim >= 0.4 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       MAX(sim) AS max_sim,
       CASE WHEN SUM(CASE WHEN sim >= 0.4 THEN 1 ELSE 0 END) > 0
            THEN 'drop' ELSE 'keep' END AS verdict
FROM s GROUP BY vec_id
""",

    # kNN mislabel audit: same top-k contract as sim_cosine_topk, then
    # a vote count and an argmax with the tie electing the smallest
    # label; COUNT cast to BIGINT (HUGEINT rule)
    "sim_label_knn_audit": """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
                  label AS tl
           FROM embeddings WHERE vec_id % 10 = 0),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
             label AS nl
      FROM embeddings),
s AS (
  SELECT query_id, tl, neighbor_id, nl,
         round(list_cosine_similarity(qv, cv), 4) AS sim
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS rk
      FROM s),
v AS (SELECT query_id, tl, nl, CAST(COUNT(*) AS BIGINT) AS votes
      FROM r WHERE rk <= 5 GROUP BY 1, 2, 3),
p AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY votes DESC, nl) AS pr
      FROM v)
SELECT query_id, tl AS true_label, nl AS predicted_label, votes,
       (tl = nl) AS label_match
FROM p WHERE pr = 1
""",

    # vocabulary-coverage audit: top-20 vocab by (count DESC, token) —
    # a total order, so the cut is engine-exact; integer ppm
    "text_oov_rate": """
WITH tk AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), t -> t <> ''))
           AS token
  FROM documents
),
dt AS (
  SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS k
  FROM tk GROUP BY 1, 2
),
tc AS (SELECT token, CAST(SUM(k) AS BIGINT) AS c FROM dt GROUP BY 1),
v AS (SELECT token FROM tc ORDER BY c DESC, token LIMIT 20)
SELECT doc_id,
       CAST(SUM(k) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.token IS NULL THEN k ELSE 0 END)
            AS BIGINT) AS n_oov,
       CAST((1000000 * SUM(CASE WHEN v.token IS NULL THEN k ELSE 0 END))
            // SUM(k) AS BIGINT) AS oov_ppm
FROM dt LEFT JOIN v USING (token)
GROUP BY doc_id
""",

    # hard-negative mining: cosine top-k restricted to rows whose label
    # differs (IS DISTINCT FROM ≡ Spark's NOT(<=>), null-safe) — same
    # rounding/tiebreak contract as sim_cosine_topk
    "sim_hard_negatives": """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
           FROM embeddings WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv, label AS nl
      FROM embeddings),
s AS (
  SELECT query_id, neighbor_id, nl,
         round(list_cosine_similarity(qv, cv), 4) AS sim
  FROM q CROSS JOIN c
  WHERE query_id <> neighbor_id AND nl IS DISTINCT FROM ql
),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS rk
      FROM s)
SELECT query_id, neighbor_id, nl AS n_label, sim, CAST(rk AS INTEGER) AS rank
FROM r WHERE rk <= 3
""",

    # per-doc trigram-LM fluency: integer-ppm trigram MLE
    # (1e6*c3 // c2, window sums over the doc-trigram grain) averaged
    # per document — same tokenization/trigram construction as
    # text_kn_trigram; SUM outputs cast to BIGINT (HUGEINT rule)
    "text_doc_lm_score": """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
),
tri AS (
  SELECT doc_id,
         unnest(list_transform(range(1, CAST(len(tk) - 1 AS BIGINT)),
    i -> struct_pack(
      w1 := tk[CAST(i AS INTEGER)],
      w2 := tk[CAST(i + 1 AS INTEGER)],
      w3 := tk[CAST(i + 2 AS INTEGER)]))) AS g
  FROM toks WHERE len(tk) >= 3
),
dt AS (
  SELECT g.w1 AS w1, g.w2 AS w2, g.w3 AS w3, doc_id,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM tri GROUP BY 1, 2, 3, 4
),
sc AS (
  SELECT doc_id, k,
         CAST((1000000 * SUM(k) OVER (PARTITION BY w1, w2, w3))
              // (SUM(k) OVER (PARTITION BY w1, w2)) AS BIGINT) AS p_ppm
  FROM dt
)
SELECT doc_id,
       CAST(SUM(k) AS BIGINT) AS n_trigrams,
       CAST(SUM(k * p_ppm) // SUM(k) AS BIGINT) AS lm_score_ppm
FROM sc GROUP BY doc_id
""",

    # curriculum staging: lexical-diversity (TTR ppm, integer) quartile
    # — the oracle's plain NTILE(4) states exactly what the distributed
    # ranking machinery computes without a single-partition sort
    "cur_curriculum_order": """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
),
s AS (
  SELECT doc_id,
         CAST((1000000 * CAST(len(list_distinct(tk)) AS BIGINT))
              // len(tk) AS BIGINT) AS ttr_ppm
  FROM t WHERE len(tk) >= 1
)
SELECT doc_id, ttr_ppm,
       CAST(NTILE(4) OVER (ORDER BY ttr_ppm, doc_id) AS INTEGER) AS stage
FROM s
""",

    # embedding-space mixture balancing — the whole chain is integer
    # arithmetic (floor(x*1000) int64 L2 argmin with lowest-cid ties,
    # multiplicative-hash centroid sample, bucket<quota gate), so this
    # replays the balanced-mixture summary EXACTLY (cf. operators/
    # curation.cluster_balanced_sample). Per-round CTEs materialized
    # (multiply-referenced).
    "cur_cluster_balanced": """
WITH q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM embeddings),
cents AS MATERIALIZED (
  SELECT e.vec_id AS cid, q.qv AS qc
  FROM embeddings e JOIN q ON q.vec_id = e.vec_id
  ORDER BY ((e.vec_id % 1000000007) * 2654435761) % 1000000007, e.vec_id
  LIMIT 50),
assigned AS MATERIALIZED (
  SELECT vec_id, cid AS cluster_id FROM (
    SELECT q.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             CAST(list_sum(list_transform(list_zip(q.qv, c.qc),
                  x -> (x[1] - x[2]) * (x[1] - x[2]))) AS BIGINT),
             c.cid) AS rn
    FROM q CROSS JOIN cents c)
  WHERE rn = 1),
sizes AS MATERIALIZED (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_in_cluster
  FROM assigned GROUP BY cluster_id),
tot AS (
  SELECT CAST(SUM(n_in_cluster) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k_used
  FROM sizes),
gate AS (
  SELECT a.cluster_id, s.n_in_cluster,
         CAST(LEAST(1000000,
              (200000 * t.n) // (t.k_used * s.n_in_cluster)) AS BIGINT)
           AS keep_ppm,
         ('0x' || substr(sha256('cbal1' || chr(31)
              || CAST(a.vec_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
           AS bucket
  FROM assigned a JOIN sizes s USING (cluster_id) CROSS JOIN tot t)
SELECT cluster_id, n_in_cluster,
       CAST(MAX(keep_ppm) AS BIGINT) AS keep_ppm,
       CAST(SUM(CASE WHEN bucket < keep_ppm THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept
FROM gate GROUP BY cluster_id, n_in_cluster
""",

    "mm_audio_fingerprint": _AUDIO_FP + """
SELECT doc_id, n_frames, fp_hi, fp_lo FROM fp
""",

    # duration-blocked Hamming pairs — the block equality keeps the
    # exact SQL join from going N² globally (mirrors the pigeonhole
    # result exactly: both enumerate all same-length pairs <= 2 bits).
    # Degenerate fingerprints (< 2 frames or all-zero) are dropped
    # before pairing on BOTH sides — mirrors the Spark-side filter
    # (they pair quadratically within a length bucket at scale).
    "mm_audio_near_dup": _AUDIO_FP + """
, fpx2 AS (
  SELECT * FROM fp
  WHERE n_frames >= 2 AND NOT (fp_hi = 0 AND fp_lo = 0)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_frames,
       CAST(bit_count(xor(a.fp_hi, b.fp_hi))
            + bit_count(xor(a.fp_lo, b.fp_lo)) AS INTEGER) AS hamming
FROM fpx2 a JOIN fpx2 b
  ON a.n_frames = b.n_frames AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp_hi, b.fp_hi))
      + bit_count(xor(a.fp_lo, b.fp_lo)) <= 2
""",

    # Holt's linear trend, alpha=beta=1/2, exact 4^t-scaled integers —
    # the sequential recurrence replayed with a recursive CTE (mirrors
    # operators/sequence.holt_winters_trend; the /2 is exact, so //
    # truncate-vs-floor divergence cannot occur)
    "ts_holt_winters": """
WITH RECURSIVE r AS (
  SELECT user_id, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
f AS (SELECT * FROM r WHERE rn <= 16),
rec AS (
  SELECT user_id, rn, event_id, cents,
         4 * cents AS level_q4, CAST(0 AS BIGINT) AS trend_q4
  FROM f WHERE rn = 1
  UNION ALL
  SELECT f.user_id, f.rn, f.event_id, f.cents,
         f.cents * (CAST(1 AS BIGINT) << CAST(2 * f.rn - 1 AS INTEGER))
           + 2 * (rec.level_q4 + rec.trend_q4),
         (f.cents * (CAST(1 AS BIGINT) << CAST(2 * f.rn - 1 AS INTEGER))
           + 2 * (rec.level_q4 + rec.trend_q4)
           - 4 * rec.level_q4 + 4 * rec.trend_q4) // 2
  FROM rec JOIN f ON f.user_id = rec.user_id AND f.rn = rec.rn + 1
)
SELECT user_id, CAST(rn AS INTEGER) AS rn, event_id, cents,
       level_q4, trend_q4
FROM rec
""",

    # count-min sketch replayed cell-for-cell: same multiply-mod bucket
    # hashes, same d x w grid, same min-over-rows estimate
    "a_countmin_freq": f"""
WITH k AS (SELECT CAST(user_id AS BIGINT) AS key FROM events),
b AS (
  SELECT key, j, {_cm_bucket_case('key')} AS bucket
  FROM k, (SELECT unnest(range(0, {CM_ROWS})) AS j)
),
sketch AS (SELECT j, bucket, COUNT(*) AS cell_n FROM b GROUP BY 1, 2),
truth AS (SELECT key, COUNT(*) AS true_n FROM k GROUP BY key),
probes AS (
  SELECT key, true_n, j, {_cm_bucket_case('key')} AS bucket
  FROM truth, (SELECT unnest(range(0, {CM_ROWS})) AS j)
)
SELECT p.key AS user_id, p.true_n,
       MIN(s.cell_n) AS cm_est,
       MIN(s.cell_n) - p.true_n AS overcount
FROM probes p JOIN sketch s ON s.j = p.j AND s.bucket = p.bucket
GROUP BY p.key, p.true_n
""",

    # KMV bottom-k audience sketches + union-sample Jaccard estimate
    "a_kmv_jaccard": f"""
WITH m AS (
  SELECT DISTINCT event_type AS set_key,
         (CAST(user_id AS BIGINT) % {HASH_P} * {KMV_A} + {KMV_B})
           % {HASH_P} AS mh
  FROM events
),
sig AS (
  SELECT set_key, mh FROM (
    SELECT set_key, mh,
           ROW_NUMBER() OVER (PARTITION BY set_key ORDER BY mh) AS r
    FROM m
  ) WHERE r <= {KMV_K}
),
sizes AS (SELECT set_key, COUNT(*) AS sk_n FROM sig GROUP BY set_key),
pairs AS (
  SELECT a.set_key AS set_a, a.sk_n AS sk_a,
         b.set_key AS set_b, b.sk_n AS sk_b
  FROM sizes a JOIN sizes b ON a.set_key < b.set_key
),
u AS (
  SELECT set_a, set_b, sk_a, sk_b, mh,
         MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM (
    SELECT p.set_a, p.set_b, p.sk_a, p.sk_b, s.mh,
           1 AS in_a, CAST(NULL AS INTEGER) AS in_b
    FROM pairs p JOIN sig s ON s.set_key = p.set_a
    UNION ALL
    SELECT p.set_a, p.set_b, p.sk_a, p.sk_b, s.mh,
           CAST(NULL AS INTEGER), 1
    FROM pairs p JOIN sig s ON s.set_key = p.set_b
  ) GROUP BY 1, 2, 3, 4, 5
),
sampled AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY set_a, set_b
                               ORDER BY mh) AS r
  FROM u
)
SELECT set_a, set_b,
       CAST(sk_a AS INTEGER) AS sk_a, CAST(sk_b AS INTEGER) AS sk_b,
       CAST(COUNT(*) AS INTEGER) AS used_k,
       CAST(SUM(CASE WHEN in_a IS NOT NULL AND in_b IS NOT NULL
                     THEN 1 ELSE 0 END) AS INTEGER) AS overlap,
       CAST(SUM(CASE WHEN in_a IS NOT NULL AND in_b IS NOT NULL
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS jaccard_ppm
FROM sampled WHERE r <= {KMV_K}
GROUP BY set_a, set_b, sk_a, sk_b
""",

    # first-order event-type transition matrix, integer ppm
    "t_markov_transitions": """
WITH o AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
t AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS prev_total,
       CAST(n * 1000000 // (SUM(n) OVER (PARTITION BY prev_type))
            AS BIGINT) AS p_ppm
FROM t
""",

    # full curation pipeline: quality gate -> exact dedup -> minhash
    # near-dedup (subquery over the surviving pool) -> per-source
    # greedy token budget; disjoint union of stage kill sets
    "cur_end_to_end": f"""
WITH base AS (
  SELECT doc_id, source, text,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_unique,
         len(list_filter(string_split(text, ' '),
             x -> list_contains(['the','a','and','of','to','in','is','on'], x))) AS n_stop
  FROM documents
),
b2 AS (
  SELECT doc_id, source, text, n_tokens,
         CASE WHEN n_tokens < 20 THEN 'too_short'
              WHEN n_unique * 2 <= n_tokens THEN 'too_repetitive'
              WHEN n_stop * 50 < n_tokens THEN 'low_stopword'
              ELSE 'kept' END AS q_reason
  FROM base
),
poolq AS (SELECT * FROM b2 WHERE q_reason = 'kept'),
ek AS (SELECT *, MIN(doc_id) OVER (PARTITION BY sha256(text)) AS min_id FROM poolq),
poole AS (SELECT doc_id, source, n_tokens, text FROM ek WHERE doc_id = min_id),
nk AS (SELECT DISTINCT doc_b AS doc_id FROM ({_minhash_sql(src="poole")})),
pooln AS (SELECT * FROM poole WHERE doc_id NOT IN (SELECT doc_id FROM nk)),
bud AS (
  SELECT doc_id, source, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
             PARTITION BY source
             ORDER BY sha256('e2e' || chr(31) || CAST(doc_id AS VARCHAR)), doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_t,
         SUM(n_tokens) OVER (PARTITION BY source) AS total_t
  FROM pooln
),
verdicts AS (
  SELECT doc_id, source, n_tokens, 'quality:' || q_reason AS verdict
  FROM b2 WHERE q_reason <> 'kept'
  UNION ALL
  SELECT doc_id, source, n_tokens, 'exact_dup' FROM ek WHERE doc_id <> min_id
  UNION ALL
  SELECT p.doc_id, p.source, p.n_tokens, 'near_dup'
  FROM poole p JOIN nk USING (doc_id)
  UNION ALL
  SELECT doc_id, source, n_tokens,
         CASE WHEN before_t * 10 >= total_t * 6
              THEN 'over_budget' ELSE 'kept' END
  FROM bud
)
SELECT doc_id, source, n_tokens, verdict,
       CASE WHEN verdict = 'kept' THEN 'Y' ELSE 'N' END AS keep_flag
FROM verdicts
""",

    "cur_dup_aware_sample": """
WITH sized AS (
  SELECT doc_id,
         CAST(COUNT(*) OVER (PARTITION BY sha256(text)) AS INTEGER)
           AS cluster_size,
         CAST(('0x' || substr(sha256('dupsample1' || chr(31)
               || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % 1000000 AS INTEGER) AS bucket
  FROM documents)
SELECT doc_id, cluster_size, bucket,
       CASE WHEN CAST(bucket AS BIGINT) * cluster_size < 1000000
            THEN 'Y' ELSE 'N' END AS keep_flag
FROM sized
""",

    "ts_changepoint_per_type": """
WITH pts AS (
  SELECT event_type,
         day(CAST(ts AS TIMESTAMP)) AS x,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
  FROM events GROUP BY event_type, day(CAST(ts AS TIMESTAMP))),
scored AS (
  SELECT event_type, x,
         COUNT(*) OVER (PARTITION BY event_type)
           * SUM(y) OVER (PARTITION BY event_type ORDER BY x
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x)
           * SUM(y) OVER (PARTITION BY event_type) AS s,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM pts),
pick AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY abs(s) DESC, x) AS rk
  FROM scored)
SELECT event_type,
       CAST(n AS INTEGER) AS n_points,
       CAST(x AS BIGINT) AS change_x,
       CAST(abs(s) AS BIGINT) AS cusum_abs,
       CASE WHEN s > 0 THEN 'high-then-drop'
            WHEN s < 0 THEN 'low-then-rise'
            ELSE 'none' END AS shape
FROM pick WHERE rk = 1
""",

    "j_entity_resolution": """
WITH RECURSIVE
fp AS (
  SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
  FROM part a
  JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
  WHERE levenshtein(a.p_name, b.p_name) <= 2),
edges AS (SELECT id_a AS a, id_b AS b FROM fp
          UNION ALL SELECT id_b, id_a FROM fp),
nodes AS (SELECT DISTINCT a AS n FROM edges),
reach(node, origin) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.b, r.origin FROM reach r JOIN edges e ON e.a = r.node),
comp AS (SELECT node, MIN(origin) AS cid FROM reach GROUP BY node),
lab AS (
  SELECT p.p_partkey, COALESCE(c.cid, p.p_partkey) AS entity_id
  FROM part p LEFT JOIN comp c ON c.node = p.p_partkey)
SELECT p_partkey, entity_id,
       CASE WHEN p_partkey = entity_id THEN 'Y' ELSE 'N' END AS is_canonical,
       CAST(COUNT(*) OVER (PARTITION BY entity_id) AS INTEGER) AS n_members
FROM lab
""",

    # literal patterns only: replace-based counting has the same
    # left-to-right non-overlapping semantics as regexp_extract_all
    "t_journey_patterns": """
WITH j AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), ''
                    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS journey
  FROM events GROUP BY user_id)
SELECT user_id,
       CAST(length(journey) AS INTEGER) AS journey_len,
       CAST((length(journey) - length(replace(journey, 'vc', ''))) // 2
            AS INTEGER) AS n_view_click,
       CAST((length(journey) - length(replace(journey, 'cp', ''))) // 2
            AS INTEGER) AS n_click_purchase,
       CAST((length(journey) - length(replace(journey, 'se', ''))) // 2
            AS INTEGER) AS n_error_after_signup,
       CASE WHEN strpos(journey, 'p') > 0 THEN 'Y' ELSE 'N' END AS converted,
       CAST(strpos(journey, 'p') AS INTEGER) AS first_purchase_pos
FROM j
""",

    # sign * (abs(num) * scale // den): floor division and Spark's
    # truncating DIV agree on non-negative operands only, so the sign
    # factors out before the division on both sides
    "ts_trend_per_type": """
WITH pts AS (
  SELECT event_type,
         day(CAST(ts AS TIMESTAMP)) AS x,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
  FROM events GROUP BY event_type, day(CAST(ts AS TIMESTAMP))),
agg AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM pts GROUP BY event_type)
SELECT event_type,
       CAST(n AS INTEGER) AS n_points,
       CAST(sy AS BIGINT) AS total_y,
       CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
                 ELSE (CASE WHEN n * sxy - sx * sy > 0 THEN 1
                            WHEN n * sxy - sx * sy < 0 THEN -1
                            ELSE 0 END)
                      * (abs(n * sxy - sx * sy) * 1000000
                         // (n * sxx - sx * sx))
            END AS BIGINT) AS slope_ppm,
       CASE WHEN n * sxy - sx * sy > 0 THEN 'up'
            WHEN n * sxy - sx * sy < 0 THEN 'down'
            ELSE 'flat' END AS trend
FROM agg
""",

    # embedding = per-doc histogram of abs(ascii(ch)-128) % 16 over the
    # (ASCII) text — exactly the amplitude classes audio_embed derives
    # from the decoded samples ((b-128)*256 -> abs DIV 256 % 16)
    "mm_audio_ann": """
WITH chars AS (
  SELECT doc_id, text, unnest(range(1, octet_length(encode(text)) + 1)) AS i
  FROM documents),
bu AS (
  SELECT doc_id, abs(ascii(substr(text, i, 1)) - 128) % 16 AS b FROM chars),
hist AS (SELECT doc_id, b, COUNT(*) AS c FROM bu GROUP BY doc_id, b),
dense AS (
  SELECT d.doc_id, r.b, CAST(COALESCE(h.c, 0) AS DOUBLE) AS c
  FROM documents d
  CROSS JOIN (SELECT unnest(range(0, 16)) AS b) r
  LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.b = r.b),
vecs AS (SELECT doc_id, list(c ORDER BY b) AS v FROM dense GROUP BY doc_id),
q AS (SELECT doc_id AS query_id, v AS qv FROM vecs WHERE doc_id % 100 = 0),
c2 AS (SELECT doc_id AS neighbor_id, v AS cv FROM vecs),
s AS (
  SELECT query_id, neighbor_id,
         round(list_cosine_similarity(qv, cv), 4) AS sim
  FROM q CROSS JOIN c2 WHERE query_id <> neighbor_id),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) AS rk
  FROM s)
SELECT query_id, neighbor_id, sim, CAST(rk AS INTEGER) AS rank
FROM r WHERE rk <= 3
""",

    "j_fuzzy_part_match": """
SELECT a.p_brand,
       a.p_partkey AS id_a, b.p_partkey AS id_b,
       a.p_name AS text_a, b.p_name AS text_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
       CASE WHEN levenshtein(a.p_name, b.p_name) = 0
            THEN 'exact' ELSE 'near' END AS match_grade
FROM part a
JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 2
""",

    "t_event_type_affinity": """
WITH m AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type),
norms AS (
  SELECT event_type, sqrt(SUM(n * n)) AS norm FROM m GROUP BY event_type),
p AS (
  SELECT a.event_type AS item_a, b.event_type AS item_b,
         COUNT(*) AS n_users, SUM(a.n * b.n) AS dot
  FROM m a
  JOIN m b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT item_a, item_b,
       CAST(n_users AS INTEGER) AS n_users,
       CAST(dot AS BIGINT) AS dot,
       round(dot / (na.norm * nb.norm), 4) AS affinity
FROM p
JOIN norms na ON na.event_type = p.item_a
JOIN norms nb ON nb.event_type = p.item_b
""",

    "graph_pagerank": _pagerank_sql(threshold=0.4, iters=5),

    "graph_kcore": _kcore_sql(threshold=0.25, k=3, rounds=30),

    # Kneser-Ney trigram twin of textops.kn_trigram: same tokenization
    # as text_tfidf_topk (space split, empties dropped), positional
    # trigrams from the token list, all-integer discounting (D=0.75 as
    # 750000 ppm). SUM/COUNT outputs cast to BIGINT (HUGEINT rule).
    "text_kn_trigram": """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
),
tri AS (
  SELECT unnest(list_transform(range(1, CAST(len(tk) - 1 AS BIGINT)),
    i -> struct_pack(
      w1 := tk[CAST(i AS INTEGER)],
      w2 := tk[CAST(i + 1 AS INTEGER)],
      w3 := tk[CAST(i + 2 AS INTEGER)]))) AS g
  FROM toks WHERE len(tk) >= 3
),
flat AS (SELECT g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM tri),
c3 AS (SELECT w1, w2, w3, COUNT(*) AS c FROM flat GROUP BY 1, 2, 3),
ctx AS (SELECT w1, w2, CAST(SUM(c) AS BIGINT) AS ctx_n,
               COUNT(*) AS n_follow
        FROM c3 GROUP BY 1, 2),
cont AS (SELECT w3, COUNT(*) AS n_prec FROM c3 GROUP BY 1),
tt AS (SELECT COUNT(*) AS t FROM c3),
scored AS (
  SELECT c3.w1, c3.w2, c3.w3, c3.c, ctx.ctx_n, ctx.n_follow, cont.n_prec,
         CAST(GREATEST(c3.c * 1000000 - 750000, 0) // ctx.ctx_n
              + ((750000 * ctx.n_follow // ctx.ctx_n)
                 * (1000000 * cont.n_prec // tt.t)) // 1000000
              AS BIGINT) AS pkn_ppm
  FROM c3 JOIN ctx USING (w1, w2) JOIN cont USING (w3) CROSS JOIN tt
)
SELECT w1, w2, w3, c, ctx_n, n_follow, n_prec, pkn_ppm,
       CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w1, w2, w3) AS INTEGER) AS rk
FROM scored
ORDER BY c DESC, w1, w2, w3
LIMIT 100
""",

    # Adamic-Adar twin of graph.adamic_adar: same wedge enumeration as
    # graph_link_prediction with the center's 1e6 DIV deg weight riding
    # the wedge row; hub cap mirrored; SUM cast to BIGINT (HUGEINT
    # canonicalization — tests/test_oracle_dtypes.py)
    "graph_adamic_adar": f"""
WITH pairs AS ({_multiprobe_near_dup_sql(threshold=0.25)}),
sym AS (
  SELECT id_a AS u, id_b AS n FROM pairs
  UNION ALL SELECT id_b AS u, id_a AS n FROM pairs
),
deg AS (SELECT u AS node, COUNT(*) AS deg FROM sym GROUP BY u),
symw AS (
  SELECT s.u, s.n, d.deg AS deg_u FROM sym s
  JOIN deg d ON d.node = s.u
  WHERE d.deg <= {MAX_CENTER_DEGREE}
),
cn AS (
  SELECT e1.n AS v, e2.n AS w, COUNT(*) AS n_common,
         CAST(SUM(1000000 // e1.deg_u) AS BIGINT) AS aa_ppm
  FROM symw e1 JOIN symw e2 ON e1.u = e2.u AND e1.n < e2.n
  GROUP BY 1, 2
)
SELECT c.v AS id_a, c.w AS id_b, c.n_common, c.aa_ppm,
       CASE WHEN p.id_a IS NOT NULL THEN 'Y' ELSE 'N' END AS is_edge
FROM cn c
LEFT JOIN pairs p ON p.id_a = c.v AND p.id_b = c.w
""",

    # Matryoshka two-stage ANN: prefix-dim candidate window then exact
    # full-dim rerank — both ROW_NUMBER windows mirrored bit-for-bit
    "sim_matryoshka_rerank": """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
      FROM embeddings),
s AS (
  SELECT query_id, neighbor_id, qv, cv,
         round(list_cosine_similarity(qv[1:16], cv[1:16]), 4) AS prefix_sim
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY prefix_sim DESC, neighbor_id) AS prk FROM s),
f AS (
  SELECT query_id, neighbor_id, prefix_sim,
         round(list_cosine_similarity(qv, cv), 4) AS sim
  FROM r WHERE prk <= 20
),
rr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY sim DESC, neighbor_id) AS rk FROM f)
SELECT query_id, neighbor_id, prefix_sim, sim, CAST(rk AS INTEGER) AS rank
FROM rr WHERE rk <= 5
""",

    # NOTE: reproduces the byte->sample law via per-CHARACTER code
    # points — equivalent to the UTF-8 bytes the Spark side encodes
    # only because the fixture corpus is pure ASCII (where char count
    # == byte count and ascii(c) == the byte). The LEFT JOIN restores
    # zero-length documents (Spark emits an all-zero feature row for
    # them; a bare GROUP BY would drop them).
    "mm_audio_decode": """
WITH chars AS (
  SELECT doc_id, text, unnest(range(1, octet_length(encode(text)) + 1)) AS i
  FROM documents),
s AS (
  SELECT doc_id, (ascii(substr(text, i, 1)) - 128) * 256 AS smp
  FROM chars),
agg AS (
  SELECT doc_id,
         COUNT(*) AS n_samples,
         MAX(ABS(smp)) AS peak,
         SUM(smp * smp) AS energy
  FROM s GROUP BY doc_id)
SELECT d.doc_id,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(COALESCE(n_samples, 0) AS INTEGER) AS n_samples,
       CAST(COALESCE(n_samples, 0) * 1000 // 8000 AS INTEGER) AS duration_ms,
       CAST(COALESCE(peak, 0) AS INTEGER) AS peak,
       CAST(COALESCE(energy, 0) AS BIGINT) AS energy
FROM documents d LEFT JOIN agg USING (doc_id)
""",

    "mm_audio_resample": """
SELECT doc_id,
       CAST(8000 AS INTEGER) AS rate_in,
       CAST(3000 AS INTEGER) AS rate_out,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_in,
       CAST(octet_length(encode(text)) * 3000 // 8000 AS INTEGER) AS n_out
FROM documents
""",

    "cur_reservoir_sample": """
WITH h AS (
  SELECT source, doc_id,
         substr(sha256('res1' || chr(31) || CAST(doc_id AS VARCHAR)), 1, 16)
           AS rank_key
  FROM documents),
r AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY rank_key, doc_id) AS rk
  FROM h)
SELECT source, doc_id, CAST(rk AS INTEGER) AS sample_rank
FROM r WHERE rk <= 100
""",

    "sim_prototype_prune": """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
dims AS (SELECT label, v, unnest(range(1, len(v) + 1)) AS i FROM e),
dx AS (SELECT label, i, v[i] AS x FROM dims),
cent AS (
  SELECT label, list(m ORDER BY i) AS cv
  FROM (SELECT label, i, AVG(x) AS m FROM dx GROUP BY label, i)
  GROUP BY label),
scored AS (
  SELECT e.vec_id, e.label,
         round(list_cosine_similarity(e.v, c.cv), 4) AS sim
  FROM e JOIN cent c USING (label)),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY sim DESC, vec_id) AS rank,
         COUNT(*) OVER (PARTITION BY label) AS n
  FROM scored)
SELECT vec_id, label, sim, CAST(rank AS INTEGER) AS rank,
       CASE WHEN rank * 100 <= n * 90 THEN 'Y' ELSE 'N' END AS keep_flag
FROM r
""",

    "text_dsir_weight": """
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS tok FROM documents),
idx AS (
  SELECT doc_id, lang, tok, unnest(range(1, len(tok))) AS i
  FROM t WHERE len(tok) >= 2),
g AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(sha256('dsir1' || chr(31)
               || array_to_string(tok[i : i + 1], ' ')), 1, 8))::BIGINT
              % 128 AS INTEGER) AS bucket
  FROM idx),
stats AS (
  SELECT bucket,
         COUNT(*) AS raw_n,
         COUNT(*) FILTER (WHERE lang = 'en') AS tgt_n
  FROM g GROUP BY bucket),
per AS (
  SELECT doc_id, COUNT(*) AS n_grams, SUM(tgt_n * 1000000 // raw_n) AS w
  FROM g JOIN stats USING (bucket) GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(n_grams, 0) AS INTEGER) AS n_bigrams,
       CAST(COALESCE(w, 0) AS BIGINT) AS weight_ppm_sum,
       CAST(CASE WHEN COALESCE(n_grams, 0) = 0 THEN 0
                 ELSE w // n_grams END AS BIGINT) AS score_ppm
FROM documents d LEFT JOIN per USING (doc_id)
""",

    "dedup_span_coverage": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
base AS (SELECT doc_id, len(tok) AS n_tokens FROM t),
idx AS (
  SELECT doc_id, tok, unnest(range(1, len(tok) - 6)) AS i
  FROM t WHERE len(tok) >= 8
),
g AS (SELECT doc_id, i, array_to_string(tok[i : i + 7], ' ') AS gram FROM idx),
dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
occ AS (SELECT doc_id, i FROM g JOIN dup USING (gram)),
cov AS (
  SELECT doc_id, COUNT(DISTINCT ti) AS covered
  FROM (SELECT doc_id, unnest(range(i, i + 8)) AS ti FROM occ)
  GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(b.n_tokens AS INTEGER) AS n_tokens,
       CAST(COALESCE(covered, 0) AS INTEGER) AS covered_tokens,
       COALESCE(covered, 0) * 1000000 // b.n_tokens AS coverage_ppm,
       CASE WHEN COALESCE(covered, 0) * 2 >= b.n_tokens
            THEN 'Y' ELSE 'N' END AS drop_flag
FROM base b LEFT JOIN cov USING (doc_id)
""",

    "dedup_common_spans": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
idx AS (
  SELECT doc_id, tok, unnest(range(1, len(tok) - 6)) AS i
  FROM t WHERE len(tok) >= 8
),
g AS (SELECT doc_id, array_to_string(tok[i : i + 7], ' ') AS gram FROM idx)
SELECT gram, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
""",

    # bloom probe: positions from the SAME double-hash arithmetic the
    # Spark operator uses (h = 60-bit sha prefix; pos_j = (h%m + j*(1+h%(m-1)))%m,
    # m=65536, k=4); "bit set in the filter" == "position in the store's
    # distinct position set", exactly.
    "dedup_bloom_probe": """
WITH store AS (SELECT text FROM documents WHERE doc_id % 3 <> 0),
batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
sk AS (SELECT DISTINCT CAST('0x' || substr(sha256(text), 1, 15) AS BIGINT) AS h
       FROM store),
spos AS (SELECT DISTINCT (h % 65536 + t.j * (1 + h % 65535)) % 65536 AS pos
         FROM sk CROSS JOIN range(4) t(j)),
bk AS (SELECT doc_id, CAST('0x' || substr(sha256(text), 1, 15) AS BIGINT) AS h
       FROM batch),
bpos AS (SELECT DISTINCT doc_id,
                (h % 65536 + t.j * (1 + h % 65535)) % 65536 AS pos
         FROM bk CROSS JOIN range(4) t(j)),
hits AS (SELECT doc_id,
                MIN(CASE WHEN s.pos IS NULL THEN 0 ELSE 1 END) AS all_hit
         FROM bpos b LEFT JOIN spos s USING (pos) GROUP BY doc_id),
sh AS (SELECT DISTINCT sha256(text) AS ch FROM store),
dup AS (SELECT b.doc_id,
               CASE WHEN s.ch IS NULL THEN 0 ELSE 1 END AS is_dup
        FROM batch b LEFT JOIN sh s ON sha256(b.text) = s.ch)
SELECT h.doc_id,
       CASE WHEN h.all_hit = 1 THEN 'Y' ELSE 'N' END AS bloom_hit,
       CASE WHEN h.all_hit = 1 AND d.is_dup = 1 THEN 'dup'
            WHEN h.all_hit = 1 THEN 'false_positive'
            ELSE 'clean' END AS verdict
FROM hits h JOIN dup d ON h.doc_id = d.doc_id
""",

    "cur_gopher_filter": """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS tok,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
),
m AS (
  SELECT doc_id,
         len(tok) AS n_tokens,
         n_chars - len(tok) + 1 AS sum_token_len,
         len(list_filter(tok, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
         len(list_intersect(list_distinct(tok),
             ['the','a','and','of','to','in','is','on'])) AS n_stop
  FROM t
),
v AS (
  SELECT *,
         CASE WHEN n_tokens < 25 THEN 'too_few_tokens'
              WHEN sum_token_len < 3 * n_tokens
                   OR sum_token_len > 10 * n_tokens THEN 'word_length'
              WHEN n_alpha * 5 < n_tokens * 4 THEN 'low_alpha'
              WHEN n_stop < 2 THEN 'low_stopword'
              ELSE 'kept' END AS reason
  FROM m
)
SELECT doc_id,
       CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(sum_token_len AS INTEGER) AS sum_token_len,
       CAST(n_alpha AS INTEGER) AS n_alpha_tokens,
       CAST(n_stop AS INTEGER) AS n_stop_distinct,
       reason,
       CASE WHEN reason = 'kept' THEN 'Y' ELSE 'N' END AS keep_flag
FROM v
""",

    "meta_profile_orders": _profile_sql("orders", [
        ("o_orderkey", "num"), ("o_custkey", "num"),
        ("o_orderstatus", "other"), ("o_totalprice", "num"),
        ("o_orderdate", "other"), ("o_orderpriority", "other"),
    ]),

    "dedup_exact": """
SELECT sha256(text) AS content_hash,
       MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY 1
""",

    "dedup_ngram_jaccard": _JACCARD_CORE + """
SELECT doc_a, doc_b, n_common, size_a, size_b, jaccard
FROM pairs WHERE jaccard >= 0.2
""",

    "dedup_minhash_lsh": _minhash_sql(),

    "dedup_simhash": _simhash_sql(),

    # content-defined chunking: boundary at 1-based i iff i == n or
    # (i >= CDC_WINDOW and the top log2(CDC_DIVISOR) bits of the gear
    # rolling hash h_i = Σ_{j<window} GEAR[cp_{i-j} & 255] << j are
    # zero) — the exact rule in operators/dedup.cdc_chunks. The gear
    # table is inlined below from the same CDC_GEAR constant the Spark
    # scan reads; greatest(i - j, 1) only clamps positions the
    # i >= window guard already rejects, keeping every substr/ord call
    # total (DuckDB does not short-circuit vectorized predicates).
    "dedup_cdc_chunks": f"""
WITH gt AS (
  SELECT CAST({list(CDC_GEAR)!r} AS BIGINT[]) AS gl
),
d AS (
  SELECT doc_id, text, length(text) AS n FROM documents
),
pos AS (
  SELECT doc_id, text, n, CAST(unnest(range(1, n + 1)) AS INTEGER) AS i
  FROM d
),
b AS (
  SELECT doc_id, text, n, i FROM pos, gt
  WHERE i = n OR (i >= {CDC_WINDOW} AND ((
    {" + ".join(
        f"gl[(ord(substr(text, greatest(i - {j}, 1), 1)) & 255) + 1]"
        f" * {1 << j}" for j in range(CDC_WINDOW))}
  ) & {_cdc_masks(CDC_WINDOW, CDC_DIVISOR)[1]}) = 0)
),
seg AS (
  SELECT doc_id, n, i AS e,
         COALESCE(LAG(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1
           AS s
  FROM b
),
chunks AS (
  SELECT seg.doc_id, seg.n, seg.e - seg.s + 1 AS chunk_len,
         sha256(substr(d.text, seg.s, seg.e - seg.s + 1)) AS chunk_hash
  FROM seg JOIN d USING (doc_id)
),
shared AS (
  SELECT chunk_hash FROM chunks
  GROUP BY chunk_hash HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(ANY_VALUE(n) AS BIGINT) AS n_chars,
       CAST(COALESCE(SUM(CASE WHEN shared.chunk_hash IS NOT NULL
                              THEN chunk_len END), 0) AS BIGINT)
         AS dup_chunk_chars,
       ROUND(CAST(COALESCE(SUM(CASE WHEN shared.chunk_hash IS NOT NULL
                                    THEN chunk_len END), 0) AS DOUBLE)
             / ANY_VALUE(n), 4) AS dup_ratio
FROM chunks LEFT JOIN shared USING (chunk_hash)
GROUP BY doc_id
""",

    "text_quality": f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks,
         CAST(length(text) AS INTEGER) AS n_chars
  FROM documents
)
SELECT doc_id, n_chars,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       (n_chars - len(toks) + 1) / len(toks) AS avg_token_len,
       len(list_filter(toks, tk -> list_contains({STOPWORDS!r}, tk))) / len(toks) AS stopword_ratio,
       (n_chars - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) / n_chars AS punct_ratio,
       CAST(len(list_distinct(toks)) AS INTEGER) AS n_unique_tokens,
       len(list_distinct(toks)) / len(toks) AS ttr
FROM t
""",

    "text_lang_id": _lang_id_sql(),

    "text_token_stats": r"""
WITH t AS (
  SELECT doc_id, text,
         string_split(text, ' ') AS ws,
         regexp_extract_all(text, '\w+|[^\w\s]') AS bpe
  FROM documents
)
SELECT doc_id,
       CAST(len(ws) AS INTEGER) AS n_ws_tokens,
       CAST(len(bpe) AS INTEGER) AS n_bpe_tokens,
       CAST(list_sum(list_transform(ws, tk -> CAST(ceil(length(tk) / 4.0) AS BIGINT))) AS BIGINT) AS est_subword_tokens,
       length(text) / len(bpe) AS chars_per_token
FROM t
""",

    "text_fingerprint": _SHINGLES + """
SELECT d.doc_id,
       list_aggregate(list_transform(sh.shingle_set, s -> substr(sha256(s),1,16)), 'min') AS fp_min,
       list_aggregate(list_transform(sh.shingle_set, s -> substr(sha256(s),1,16)), 'max') AS fp_max,
       CAST(len(sh.shingle_set) AS INTEGER) AS n_shingles
FROM documents d JOIN sh ON sh.doc_id = d.doc_id
""",

    "text_winnowing": """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
g AS (
  SELECT doc_id, unnest(range(0, len(t) - 2)) AS pos, t
  FROM toks WHERE len(t) >= 6
),
h AS (
  SELECT doc_id, pos,
         substr(sha256(t[CAST(pos+1 AS INT)] || ' ' || t[CAST(pos+2 AS INT)] || ' ' || t[CAST(pos+3 AS INT)]), 1, 16) AS gh
  FROM g
),
sel AS (
  SELECT doc_id, pos, gh,
         MIN(gh) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS win_min,
         COUNT(*) OVER (PARTITION BY doc_id) AS n
  FROM h
)
SELECT doc_id, win_min AS fingerprint, CAST(MIN(pos) AS INTEGER) AS first_pos
FROM sel WHERE pos <= n - 4
GROUP BY doc_id, win_min
""",

    "sim_cosine_topk": """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
s AS (
  SELECT query_id, neighbor_id, round(list_cosine_similarity(qv, cv), 4) AS sim
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk FROM s)
SELECT query_id, neighbor_id, sim, CAST(rk AS INTEGER) AS rank
FROM r WHERE rk <= 5
""",

    "sim_lsh_ann": _lsh_ann_sql(),

    "sim_ivf_ann": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM e
         ORDER BY ((vec_id % 1000000007) * 2654435761) % 1000000007, vec_id
         LIMIT 50),
assign AS (
  SELECT vec_id, cent_id, v FROM (
    SELECT e.vec_id, c.cent_id, e.v,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY round(list_cosine_similarity(e.v, c.cv), 4) DESC, c.cent_id) AS rn
    FROM e CROSS JOIN cent c
  ) WHERE rn = 1
),
probes AS (SELECT vec_id AS query_id, cent_id, v AS qv FROM assign WHERE vec_id % 50 = 0),
lists AS (SELECT vec_id AS neighbor_id, cent_id, v AS cv FROM assign),
s AS (
  SELECT p.query_id, p.cent_id, l.neighbor_id,
         round(list_cosine_similarity(p.qv, l.cv), 4) AS sim
  FROM probes p JOIN lists l ON p.cent_id = l.cent_id AND p.query_id <> l.neighbor_id
),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk FROM s)
SELECT query_id, cent_id, neighbor_id, sim, CAST(rk AS INTEGER) AS rank
FROM r WHERE rk <= 5
""",

    # nprobe=2 twin of sim_ivf_ann: build-side assignment is identical
    # (rn = 1), probe-side keeps each query's TWO nearest cells (rn <= 2)
    # and unions their inverted lists before the top-k window.
    "sim_ivf_ann_nprobe": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM e
         ORDER BY ((vec_id % 1000000007) * 2654435761) % 1000000007, vec_id
         LIMIT 50),
scoredc AS (
  SELECT e.vec_id, c.cent_id, e.v,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY round(list_cosine_similarity(e.v, c.cv), 4) DESC, c.cent_id) AS rn
  FROM e CROSS JOIN cent c
),
probes AS (SELECT vec_id AS query_id, cent_id, v AS qv
           FROM scoredc WHERE rn <= 2 AND vec_id % 50 = 0),
lists AS (SELECT vec_id AS neighbor_id, cent_id, v AS cv
          FROM scoredc WHERE rn = 1),
s AS (
  SELECT p.query_id, p.cent_id, l.neighbor_id,
         round(list_cosine_similarity(p.qv, l.cv), 4) AS sim
  FROM probes p JOIN lists l ON p.cent_id = l.cent_id AND p.query_id <> l.neighbor_id
),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk FROM s)
SELECT query_id, cent_id, neighbor_id, sim, CAST(rk AS INTEGER) AS rank
FROM r WHERE rk <= 5
""",

    "sim_embedding_near_dup": _multiprobe_near_dup_sql(threshold=0.4),

    "sim_embedding_near_dup_lsh": _bucketed_near_dup_sql(threshold=0.4),

    # naive a<b<c triangle enumeration over the SAME (deterministic)
    # near-dup edge set — the Spark side's degree-ordered wedge join
    # finds each triangle exactly once at its rank-minimum corner, so
    # per-node counts are identical by construction.
    "graph_triangle_count": f"""
WITH pairs AS ({_multiprobe_near_dup_sql(threshold=0.25)}),
tri AS (
  SELECT e1.id_a AS x, e1.id_b AS y, e2.id_b AS z
  FROM pairs e1 JOIN pairs e2 ON e2.id_a = e1.id_b
  JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
),
corners AS (SELECT unnest([x, y, z]) AS vec_id FROM tri)
SELECT vec_id, COUNT(*) AS n_triangles FROM corners GROUP BY vec_id
""",

    # degree + triangle LEFT join over the same deterministic edge set;
    # integer ppm arithmetic mirrors graph.clustering_coefficient
    "graph_clustering_coeff": f"""
WITH pairs AS ({_multiprobe_near_dup_sql(threshold=0.25)}),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT id_a AS node FROM pairs UNION ALL SELECT id_b FROM pairs
  ) GROUP BY node
),
tri AS (
  SELECT e1.id_a AS x, e1.id_b AS y, e2.id_b AS z
  FROM pairs e1 JOIN pairs e2 ON e2.id_a = e1.id_b
  JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
),
corners AS (SELECT unnest([x, y, z]) AS node FROM tri),
tcnt AS (SELECT node, COUNT(*) AS n_triangles FROM corners GROUP BY node)
SELECT d.node AS vec_id, d.deg,
       COALESCE(t.n_triangles, 0) AS n_triangles,
       CAST(2 * COALESCE(t.n_triangles, 0) * 1000000
            // (d.deg * (d.deg - 1)) AS BIGINT) AS cc_ppm
FROM deg d LEFT JOIN tcnt t ON t.node = d.node
WHERE d.deg >= 2
""",

    # Newman assortativity over the same deterministic edge set:
    # BIGINT degree moments (exact), then one double expression —
    # the double products of identical ints are identical on both
    # engines, so no rounding dance beyond the final round(.,4)
    "graph_degree_assortativity": f"""
WITH pairs AS ({_multiprobe_near_dup_sql(threshold=0.25)}),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT id_a AS node FROM pairs UNION ALL SELECT id_b FROM pairs
  ) GROUP BY node
),
e AS (
  SELECT da.deg AS dx, db.deg AS dy
  FROM pairs p
  JOIN deg da ON da.node = p.id_a
  JOIN deg db ON db.node = p.id_b
),
m AS (
  SELECT CAST(2 * COUNT(*) AS BIGINT) AS n_points,
         CAST(SUM(dx + dy) AS BIGINT) AS s_x,
         CAST(SUM(dx * dx + dy * dy) AS BIGINT) AS s_xx,
         CAST(2 * SUM(dx * dy) AS BIGINT) AS s_xy
  FROM e
)
SELECT CAST(n_points / 2 AS BIGINT) AS n_edges, s_x, s_xx, s_xy,
       CASE WHEN CAST(n_points AS DOUBLE) * s_xx
                 - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE) <> 0.0
            THEN ROUND((CAST(n_points AS DOUBLE) * s_xy
                        - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE))
                       / (CAST(n_points AS DOUBLE) * s_xx
                          - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE)),
                       4) END AS assortativity
FROM m
""",

    # neighbor-Jaccard twin of graph.neighbor_jaccard, hub-center cap
    # mirrored (symw) so both sides compute the capped semantics:
    # wedge counts per endpoint pair, degrees joined back, edge flag
    # from the canonical pair list
    "graph_link_prediction": f"""
WITH pairs AS ({_multiprobe_near_dup_sql(threshold=0.25)}),
sym AS (
  SELECT id_a AS u, id_b AS n FROM pairs
  UNION ALL SELECT id_b AS u, id_a AS n FROM pairs
),
deg AS (SELECT u AS node, COUNT(*) AS deg FROM sym GROUP BY u),
symw AS (
  SELECT s.u, s.n FROM sym s
  JOIN deg d ON d.node = s.u
  WHERE d.deg <= {MAX_CENTER_DEGREE}
),
cn AS (
  SELECT e1.n AS v, e2.n AS w, COUNT(*) AS n_common
  FROM symw e1 JOIN symw e2 ON e1.u = e2.u AND e1.n < e2.n
  GROUP BY 1, 2
)
SELECT c.v AS id_a, c.w AS id_b, c.n_common,
       da.deg AS deg_a, db.deg AS deg_b,
       CAST(c.n_common * 1000000 // (da.deg + db.deg - c.n_common)
            AS BIGINT) AS jaccard_ppm,
       CASE WHEN p.id_a IS NOT NULL THEN 'Y' ELSE 'N' END AS is_edge
FROM cn c
JOIN deg da ON da.node = c.v
JOIN deg db ON db.node = c.w
LEFT JOIN pairs p ON p.id_a = c.v AND p.id_b = c.w
""",

    # fixed-point EWMA: the recurrence y_t = (c_t + y_t-1)/2 closed-
    # formed into a single integer prefix sum (cents * 2^(i-1)) // 2^t
    "ts_ewma_user_value": """
WITH r AS (
  SELECT user_id, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
f AS (SELECT * FROM r WHERE rn <= 40),
s AS (
  SELECT user_id, event_id, cents, rn,
         SUM(cents * (CAST(1 AS BIGINT) << (CAST(rn AS INTEGER) - 1)))
           OVER (PARTITION BY user_id ORDER BY rn) AS y
  FROM f
)
SELECT user_id, CAST(rn AS INTEGER) AS rn, event_id, cents,
       CAST(y // (CAST(1 AS BIGINT) << CAST(rn AS INTEGER)) AS BIGINT)
         AS ewma_cents
FROM s
""",

    # aHash replayed from the image-synthesis rule: width 32, height
    # GREATEST(1, ceil(bytes/96)), gray = (b0+b1+b2)//3 at the 8x8
    # NN-sample positions sx = x*4, sy = y*h//8 (ASCII corpus: char
    # index == byte index; zero padding beyond len)
    "mm_image_phash": _PHASH_BITS + """
SELECT doc_id, width, height, phash_hi, phash_lo,
       COUNT(*) OVER (PARTITION BY phash_hi, phash_lo) AS n_same_hash,
       MIN(doc_id) OVER (PARTITION BY phash_hi, phash_lo) AS canonical_id
FROM bits
""",

    # pigeonhole Hamming join: 4 chunks of 16 bits — hamming <= 3 pairs
    # must agree on at least one chunk, so candidates come from 4
    # equi-joins, verified with exact bit_count(xor)
    "mm_phash_near_dup": _PHASH_PAIRS_SQL,

    # cross-modal dedup audit: full outer of the text (minhash >= 0.5)
    # and image (phash hamming <= 3) near-dup pair sets. TEXT_ONLY =
    # same words, different rendering; IMAGE_ONLY = near-identical
    # images over different text — both are the disagreement rows a
    # multimodal curation pass re-examines before dropping anything
    "mm_cross_modal_audit": f"""
WITH t AS (SELECT doc_a, doc_b, jaccard FROM ({_minhash_sql(threshold=0.5)})),
i AS (SELECT doc_a, doc_b, hamming FROM ({_PHASH_PAIRS_SQL})),
j AS (
  SELECT COALESCE(t.doc_a, i.doc_a) AS doc_a,
         COALESCE(t.doc_b, i.doc_b) AS doc_b,
         COALESCE(t.jaccard, -1.0) AS text_jaccard,
         CAST(COALESCE(i.hamming, -1) AS INTEGER) AS image_hamming,
         CASE WHEN t.doc_a IS NOT NULL AND i.doc_a IS NOT NULL THEN 'BOTH'
              WHEN t.doc_a IS NOT NULL THEN 'TEXT_ONLY'
              ELSE 'IMAGE_ONLY' END AS modality
  FROM t FULL OUTER JOIN i ON t.doc_a = i.doc_a AND t.doc_b = i.doc_b
)
SELECT * FROM j
""",

    # gram first-occurrence (min doc id) joined back — novelty ppm
    "text_ngram_novelty": _SHINGLES + """
, inv AS (SELECT doc_id, unnest(shingle_set) AS gram FROM sh)
, firsts AS (SELECT gram, MIN(doc_id) AS first_doc FROM inv GROUP BY gram)
SELECT i.doc_id,
       CAST(COUNT(*) AS INTEGER) AS n_grams,
       CAST(COUNT(CASE WHEN f.first_doc = i.doc_id THEN 1 END) AS INTEGER)
         AS n_novel,
       CAST(COUNT(CASE WHEN f.first_doc = i.doc_id THEN 1 END) * 1000000
            // COUNT(*) AS BIGINT) AS novelty_ppm
FROM inv i JOIN firsts f USING (gram)
GROUP BY i.doc_id
""",

    "cur_survivorship": _survivorship_sql(threshold=0.5),

    # directed containment from the one a<b common-shingle join,
    # mirrored from dedup.containment_pairs
    "dedup_containment": _SHINGLES + """
, sizes AS (SELECT doc_id, len(shingle_set) AS set_size FROM sh)
, inv AS (SELECT doc_id, unnest(shingle_set) AS shingle FROM sh)
""" + _SHINGLE_DF_CAP + """
, common AS (
  SELECT a.doc_id AS lo, b.doc_id AS hi, COUNT(*) AS n_common
  FROM joinable a JOIN joinable b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
, directed AS (
  SELECT lo AS doc_a, hi AS doc_b, n_common FROM common
  UNION ALL
  SELECT hi AS doc_a, lo AS doc_b, n_common FROM common
)
SELECT d.doc_a, d.doc_b, d.n_common,
       CAST(s.set_size AS INTEGER) AS size_a,
       d.n_common / s.set_size AS containment
FROM directed d JOIN sizes s ON s.doc_id = d.doc_a
WHERE d.n_common / s.set_size >= 0.5
""",

    # integer char-bigram LM: rarity = C1(prefix)*1e6 // C2(bigram),
    # doc score = sum // count — no float anywhere
    "text_bigram_rarity": """
WITH bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(text)),
                               i -> substring(text, CAST(i AS INTEGER), 2))) AS bigram
  FROM documents WHERE len(text) >= 2
),
bp AS (SELECT doc_id, bigram, substring(bigram, 1, 1) AS pre FROM bg),
c2 AS (SELECT bigram, COUNT(*) AS c2 FROM bp GROUP BY bigram),
c1 AS (SELECT pre, COUNT(*) AS c1 FROM bp GROUP BY pre),
model AS (SELECT bigram, c1 * 1000000 // c2 AS rarity
          FROM c2 JOIN c1 ON substring(c2.bigram, 1, 1) = c1.pre),
per AS (SELECT doc_id, COUNT(*) AS n_bigrams, SUM(rarity) AS rarity_sum
        FROM bp JOIN model USING (bigram) GROUP BY doc_id)
SELECT doc_id, CAST(n_bigrams AS INTEGER) AS n_bigrams,
       CAST(rarity_sum // n_bigrams AS BIGINT) AS rarity_score
FROM per
""",

    # first/last-touch attribution; DECIMAL(18,2) accumulation matches
    # the Spark side exactly (same cast, exact decimal sum)
    "t_attribution": """
WITH conv AS (
  SELECT user_id AS c_user, event_id AS conv_id, ts AS conv_ts,
         value AS conv_value
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id AS t_user, event_id AS touch_id, ts AS touch_ts,
         event_type AS touch_type
  FROM events WHERE event_type <> 'purchase'
),
j AS (
  SELECT conv_id, conv_value, touch_type,
         ROW_NUMBER() OVER (PARTITION BY conv_id
                            ORDER BY touch_ts ASC, touch_id ASC) AS rn_f,
         ROW_NUMBER() OVER (PARTITION BY conv_id
                            ORDER BY touch_ts DESC, touch_id DESC) AS rn_l
  FROM conv JOIN touch
    ON c_user = t_user AND touch_ts <= conv_ts
   AND touch_ts >= conv_ts - INTERVAL 7 DAY
),
credited AS (
  SELECT touch_type, conv_value,
         unnest(list_filter([CASE WHEN rn_f = 1 THEN 'first_touch' END,
                             CASE WHEN rn_l = 1 THEN 'last_touch' END],
                            x -> x IS NOT NULL)) AS model
  FROM j WHERE rn_f = 1 OR rn_l = 1
)
SELECT model, touch_type, COUNT(*) AS n_conversions,
       CAST(SUM(CAST(conv_value AS DECIMAL(18,2))) AS DOUBLE) AS credited_value
FROM credited GROUP BY model, touch_type
""",

    "sim_semantic_dedup": _semantic_clusters_sql(threshold=0.4),

    # sentence stats: identical split/filter semantics to the Spark
    # array lambdas (split keeps empties, trim-filter drops them; word
    # split on single space matches Spark split(text, ' '))
    "text_sentence_stats": r"""
WITH s AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[.!?]+'),
                     x -> trim(x) <> '') AS sents
  FROM documents
),
w AS (
  SELECT doc_id, sents,
         list_transform(sents, x -> CAST(len(string_split(trim(x), ' ')) AS INTEGER)) AS wc
  FROM s
)
SELECT doc_id,
       CAST(len(sents) AS INTEGER) AS n_sentences,
       COALESCE(CAST(list_sum(wc) AS INTEGER), 0) AS total_words,
       COALESCE(CAST(list_max(wc) AS INTEGER), 0) AS max_sentence_words,
       CASE WHEN len(sents) > 0
            THEN CAST(list_sum(wc) * 100 // len(sents) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS avg_words_x100
FROM w
""",

    # RAKE: integer-ppm scoring (deg·1e6 // freq summed as BIGINT) so
    # no float accumulation order exists to drift; stopword list is
    # the shared functions.text.STOPWORDS constant
    "text_rake_keywords": f"""
WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
seg AS (
  SELECT doc_id,
         generate_subscripts(regexp_split_to_array(t, '[^a-z0-9 ]+'), 1)
           AS seg_idx,
         unnest(regexp_split_to_array(t, '[^a-z0-9 ]+')) AS seg
  FROM d
),
w AS (
  SELECT doc_id, seg_idx,
         generate_subscripts(regexp_split_to_array(seg, ' +'), 1)
           AS word_idx,
         unnest(regexp_split_to_array(seg, ' +')) AS word
  FROM seg
),
b AS (
  SELECT *, SUM(is_break) OVER (PARTITION BY doc_id, seg_idx
                                ORDER BY word_idx
                                ROWS UNBOUNDED PRECEDING) AS bucket
  FROM (
    SELECT *, CASE WHEN word IN
        ({', '.join("'" + s + "'" for s in STOPWORDS)})
      THEN 1 ELSE 0 END AS is_break
    FROM w WHERE word <> ''
  )
),
occ AS (
  SELECT doc_id, seg_idx, bucket,
         string_agg(word, ' ' ORDER BY word_idx) AS phrase,
         COUNT(*) AS phrase_len
  FROM b WHERE is_break = 0
  GROUP BY doc_id, seg_idx, bucket
),
members AS (
  SELECT doc_id, seg_idx, bucket, phrase, phrase_len,
         unnest(string_split(phrase, ' ')) AS word
  FROM occ
),
wstats AS (
  SELECT doc_id, word, COUNT(*) AS freq, SUM(phrase_len) AS deg
  FROM members GROUP BY doc_id, word
),
scored AS (
  SELECT m.doc_id, m.seg_idx, m.bucket, m.phrase, m.phrase_len,
         SUM(s.deg * 1000000 // s.freq) AS score_ppm
  FROM members m
  JOIN wstats s ON s.doc_id = m.doc_id AND s.word = m.word
  GROUP BY 1, 2, 3, 4, 5
),
dp AS (
  SELECT doc_id, phrase, ANY_VALUE(phrase_len) AS n_words,
         ANY_VALUE(score_ppm) AS score_ppm
  FROM scored GROUP BY doc_id, phrase
),
r AS (
  SELECT doc_id, phrase, n_words, score_ppm,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score_ppm DESC, phrase) AS rk
  FROM dp
)
SELECT doc_id, phrase, CAST(n_words AS BIGINT) AS n_words,
       CAST(score_ppm AS BIGINT) AS score_ppm,
       CAST(rk AS INTEGER) AS rank
FROM r WHERE rk <= 3
""",

    "text_repetition": """
WITH tf AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
cnts AS (
  SELECT doc_id, token, COUNT(*) AS cnt FROM tf GROUP BY doc_id, token
),
ranked AS (
  SELECT doc_id, token, cnt,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY cnt DESC, token) AS rk
  FROM cnts
),
per AS (
  SELECT doc_id,
         CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_distinct,
         MAX(CASE WHEN rk = 1 THEN token END) AS top_token,
         CAST(MAX(CASE WHEN rk = 1 THEN cnt END) AS BIGINT) AS top_count
  FROM ranked GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct,
       n_distinct * 1000000 // n_tokens AS distinct_ppm,
       top_token, top_count,
       top_count * 1000000 // n_tokens AS top_share_ppm
FROM per
""",

    "cur_sample_mixture": """
WITH per_doc AS (
  SELECT doc_id, lang, source,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         sha256('mix1' || chr(31) || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
strata AS (
  SELECT lang, source, CAST(SUM(n_tokens) AS BIGINT) AS st FROM per_doc
  GROUP BY lang, source
),
quotas AS (
  SELECT lang, source,
         CAST(10000 AS BIGINT) * st
           // CAST(SUM(st) OVER () AS BIGINT) AS token_quota
  FROM strata
),
ordered AS (
  SELECT p.doc_id, p.lang, p.source, p.n_tokens, q.token_quota,
         COALESCE(SUM(p.n_tokens) OVER (
           PARTITION BY p.lang, p.source ORDER BY p.h, p.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_t
  FROM per_doc p JOIN quotas q USING (lang, source)
)
SELECT doc_id, lang, source, n_tokens, token_quota,
       CASE WHEN before_t < token_quota THEN 'Y' ELSE 'N' END AS sampled
FROM ordered
""",

    "cur_token_budget": """
WITH per AS (
  SELECT lang, source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS stratum_tokens
  FROM documents GROUP BY lang, source
),
t AS (SELECT *, CAST(SUM(stratum_tokens) OVER () AS BIGINT) AS total FROM per)
SELECT lang, source, n_docs, stratum_tokens,
       stratum_tokens * 1000000 // total AS share_ppm,
       CAST(10000000 AS BIGINT) * stratum_tokens // total AS token_quota
FROM t
""",

    "mm_binary_features": """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CAST(octet_length(encode(text)) % 256 AS INTEGER) AS fake_width,
       CAST((octet_length(encode(text)) // 256) % 256 AS INTEGER) AS fake_height,
       sha256(text) AS checksum
FROM documents
""",

    # the corpus is pure ASCII, so byte slicing == char slicing and the
    # oracle can mirror the python stubs with string functions
    "mm_resize": """
WITH t AS (
  SELECT doc_id, text, CAST(octet_length(encode(text)) AS INTEGER) AS n
  FROM documents
),
s AS (SELECT doc_id, text, n, greatest(1, n // 64) AS stride FROM t),
sliced AS (
  SELECT doc_id, n,
         list_aggregate(
           list_transform(
             list_filter(range(0, 64), i -> i * stride < n),
             i -> substr(text, CAST(i * stride + 1 AS INT), 1)),
           'string_agg', '') AS out_str
  FROM s
)
SELECT doc_id, n AS n_bytes_in,
       CAST(length(out_str) AS INTEGER) AS n_bytes_out,
       sha256(out_str) AS out_checksum
FROM sliced
""",

    # mirrors the REAL PPM roundtrip: width fixed at 32, height =
    # ceil(bytes / (32*3)), output re-encoded at 16x16 so the out size
    # is the 13-byte 'P6\n16 16\n255\n' header + 16*16*3 pixel bytes
    "mm_image_decode": """
SELECT doc_id,
       CAST(32 AS INTEGER) AS width,
       GREATEST(1, CAST(CEIL(octet_length(encode(text)) / 96.0) AS INTEGER))
         AS height,
       CAST(16 AS INTEGER) AS out_width,
       CAST(16 AS INTEGER) AS out_height,
       CAST(13 + 16 * 16 * 3 AS INTEGER) AS out_n_bytes
FROM documents
""",

    # same raster arithmetic as mm_image_decode (32-wide RGB rows,
    # zero-padded); the byte-exact roundtrip is the Spark-side boolean
    "mm_png_decode": """
SELECT doc_id,
       CAST(32 AS INTEGER) AS width,
       GREATEST(1, CAST(CEIL(octet_length(encode(text)) / 96.0) AS INTEGER))
         AS height,
       CAST(96 * GREATEST(1, CAST(CEIL(octet_length(encode(text)) / 96.0)
                                  AS INTEGER)) AS INTEGER) AS n_pixel_bytes,
       TRUE AS roundtrip_ok
FROM documents
""",

    # baseline JPEG with one constant 8x8 block per byte: DC-only
    # blocks give the lossy decode a closed form (Q_DC = 16):
    #   rec(u) = clamp(2 * floor((u - 127) / 2) + 128, 0, 255)
    # pixel_sum = 64 * sum(rec) (padding blocks decode to rec(0) = 0);
    # width 64 (8 blocks/row), height = 8 * ceil(n/8).
    "mm_jpeg_decode": """
WITH d AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
),
r AS (
  SELECT doc_id, n,
         ascii(substr(text, CAST(i AS INTEGER), 1)) AS u,
         LEAST(255, GREATEST(0,
           2 * CAST(FLOOR((ascii(substr(text, CAST(i AS INTEGER), 1)) - 127)
                          / 2.0) AS BIGINT) + 128)) AS rec
  -- LEFT JOIN LATERAL so n = 0 still yields a (NULL-char) row: the
  -- codec pads empty docs to one 8x8-block row (width 64, height 8,
  -- pixel_sum 0, max_abs_err 0) — mirrors the mm_gif_decode oracle
  -- (round-6 ADVICE).
  FROM d LEFT JOIN LATERAL unnest(range(1, n + 1)) AS t(i) ON TRUE
)
SELECT doc_id,
       CAST(64 AS INTEGER) AS width,
       CAST(8 * GREATEST(1, (n + 7) // 8) AS INTEGER) AS height,
       CAST(8 * GREATEST(1, (n + 7) // 8) AS INTEGER) AS n_blocks,
       CAST(64 * COALESCE(SUM(rec), 0) AS BIGINT) AS pixel_sum,
       CAST(COALESCE(MAX(ABS(rec - u)), 0) AS INTEGER) AS max_abs_err
FROM r GROUP BY doc_id, n
""",

    # GIF87a with one palette-index pixel per byte: LOSSLESS, so the
    # decode replays the bytes exactly — width 64, height = ceil(n/64)
    # (min 1), pixel_sum = byte sum (zero padding adds nothing),
    # n_mismatch pinned 0 by the roundtrip
    "mm_gif_decode": """
WITH d AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
),
s AS (
  SELECT doc_id, n,
         CAST(COALESCE(SUM(ascii(substr(text, CAST(i AS INTEGER), 1))), 0)
              AS BIGINT) AS pixel_sum
  FROM d LEFT JOIN LATERAL unnest(range(1, n + 1)) AS t(i) ON TRUE
  GROUP BY doc_id, n
)
SELECT doc_id,
       CAST(64 AS INTEGER) AS width,
       CAST(GREATEST(1, (n + 63) // 64) AS INTEGER) AS height,
       pixel_sum,
       CAST(0 AS INTEGER) AS n_mismatch
FROM s
""",

    # QOI with one grayscale RGB pixel per byte: LOSSLESS, so the
    # decode replays the bytes exactly — width 64, height = ceil(n/64)
    # (min 1), pixel_sum = 3x byte sum (r=g=b; zero padding adds
    # nothing), n_mismatch pinned 0 by the roundtrip.
    # ASCII-ONLY FIXTURE ASSUMPTION (shared with the jpeg/gif oracles):
    # the LATERAL below indexes CHARACTERS (ascii(substr(text, i, 1)))
    # while n counts UTF-8 BYTES (octet_length(encode(text))) and the
    # Python codec synthesizes pixels from text.encode() bytes; the two
    # agree only while every document codepoint is < U+0080, which the
    # generated fixtures guarantee (tests/test_round7_ops.py pins the
    # generator's ASCII property). A non-ASCII corpus needs a byte-wise
    # unnest over encode(text) here instead.
    "mm_qoi_decode": """
WITH d AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
),
s AS (
  SELECT doc_id, n,
         CAST(COALESCE(SUM(ascii(substr(text, CAST(i AS INTEGER), 1))), 0)
              AS BIGINT) AS byte_sum
  FROM d LEFT JOIN LATERAL unnest(range(1, n + 1)) AS t(i) ON TRUE
  GROUP BY doc_id, n
)
SELECT doc_id,
       CAST(64 AS INTEGER) AS width,
       CAST(GREATEST(1, (n + 63) // 64) AS INTEGER) AS height,
       CAST(3 * byte_sum AS BIGINT) AS pixel_sum,
       CAST(0 AS INTEGER) AS n_mismatch
FROM s
""",

    "mm_frame_sample": """
WITH t AS (
  SELECT doc_id, text, CAST(octet_length(encode(text)) AS INTEGER) AS n
  FROM documents
),
f AS (SELECT doc_id, text, n, CAST((n + 255) // 256 AS INTEGER) AS n_frames FROM t),
idx AS (
  SELECT doc_id, text, n, unnest(range(0, n_frames, 4)) AS frame_idx FROM f
)
SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(length(substr(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS INTEGER) AS frame_len,
       sha256(substr(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS frame_checksum
FROM idx
""",

    "a_salted_event_totals": """
SELECT event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
       COUNT(event_id) AS event_id_count
FROM events
GROUP BY event_type
""",

    "dedup_cascade": _cascade_sql(threshold=0.5),
    "dedup_clusters": _clusters_sql(threshold=0.5),
    "dedup_incremental": _incremental_sql(threshold=0.5, mod=4),

    "cur_hash_split": """
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substr(sha256('split1' || chr(31) || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS INTEGER) AS bucket
  FROM documents)
SELECT doc_id, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'validation'
            ELSE 'test' END AS split
FROM h
""",

    "cur_stratified_quota": """
WITH r AS (
  SELECT doc_id, lang, source,
         substr(sha256('quota1' || chr(31) || CAST(doc_id AS VARCHAR)), 1, 16) AS rank_key
  FROM documents),
ranked AS (
  SELECT doc_id, lang, source,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang, source
                                 ORDER BY rank_key, doc_id) AS INTEGER) AS sample_rank
  FROM r)
SELECT doc_id, lang, source, sample_rank FROM ranked WHERE sample_rank <= 40
""",

    "cur_chunk_tokens": """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
st AS (SELECT doc_id, t, unnest(range(0, len(t), 24)) AS start FROM toks),
ch AS (SELECT doc_id, CAST(start // 24 AS INTEGER) AS chunk_idx,
              t[CAST(start + 1 AS INT):CAST(start + 32 AS INT)] AS chunk
       FROM st)
SELECT doc_id, chunk_idx,
       CAST(len(chunk) AS INTEGER) AS n_chunk_tokens,
       substr(sha256(array_to_string(chunk, ' ')), 1, 16) AS chunk_hash
FROM ch
""",

    "cur_pack_sequences": """
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
  FROM documents),
c AS (
  SELECT source, doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t)
SELECT source, doc_id, n_tokens,
       CAST(FLOOR(cum_before / 256) AS INTEGER) AS bin_id
FROM c
""",

    "cur_pii_scrub": f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS INTEGER) AS n_email,
       CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS INTEGER) AS n_phone,
       CAST(len(regexp_extract_all(text, '{_PII_IPV4}')) AS INTEGER) AS n_ipv4,
       sha256(
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_PHONE}', '<PHONE>', 'g'),
           '{_PII_IPV4}', '<IPV4>', 'g')) AS scrubbed_hash
FROM documents
""",

    # corr from exact integer co-moments: both engines evaluate the
    # same closed-form double expression over identical integers
    "ts_user_correlation": """
WITH daily AS (
  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         SUM(CAST(round(value * 100) AS BIGINT)) AS c
  FROM events WHERE user_id % 30 = 0
  GROUP BY 1, 2
),
m AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b,
         COUNT(*) AS n,
         SUM(a.c) AS sx, SUM(b.c) AS sy,
         SUM(a.c * b.c) AS sxy,
         SUM(a.c * a.c) AS sxx, SUM(b.c * b.c) AS syy
  FROM daily a JOIN daily b ON a.day = b.day AND a.user_id < b.user_id
  GROUP BY 1, 2
)
SELECT user_a, user_b, n AS n_days,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 4) AS corr
FROM m
WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 AND n >= 5
""",

    "t_sessionize": """
WITH ordered AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         epoch_us(CAST(ts AS TIMESTAMP))
           - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
flagged AS (
  SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
sessioned AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end
FROM sessioned
GROUP BY 1, 2
""",
    "text_tfidf_topk": """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM tok WHERE token <> '' GROUP BY doc_id, token
),
scored AS (
  SELECT doc_id, token, tf,
         COUNT(*) OVER (PARTITION BY token) AS df,
         (tf * 1000000) // (COUNT(*) OVER (PARTITION BY token) + 1) AS score
  FROM tf
)
SELECT doc_id, token, tf, df, score, rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, token) AS rk
  FROM scored
)
WHERE rk <= 3
""",
    "text_bm25_search": """
WITH d AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         string_split(text, ' ') AS tok
  FROM documents
),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, SUM(dl) AS total_dl FROM d
),
tf AS (
  SELECT doc_id, dl, term, COUNT(*) AS tf
  FROM (SELECT doc_id, dl, unnest(tok) AS term FROM d)
  WHERE term IN ('spark', 'stream', 'merge')
  GROUP BY doc_id, dl, term
),
scored AS (
  SELECT tf.doc_id,
         CAST(FLOOR(
           (CAST(44 * tf.tf * t.total_dl AS DOUBLE)
            / CAST(20 * tf.tf * t.total_dl
                   + 6 * (t.total_dl + 3 * tf.dl * t.n_docs) AS DOUBLE))
           * (CAST(2 * (t.n_docs - dfx.df) + 1 AS DOUBLE)
              / CAST(2 * dfx.df + 1 AS DOUBLE))
           * 1e9) AS BIGINT) AS term_score
  FROM tf
  JOIN (SELECT term, COUNT(*) AS df FROM tf GROUP BY term) dfx USING (term)
  CROSS JOIN totals t
)
SELECT doc_id, score, rk FROM (
  SELECT doc_id, CAST(SUM(term_score) AS BIGINT) AS score,
         ROW_NUMBER() OVER (ORDER BY SUM(term_score) DESC, doc_id) AS rk
  FROM scored GROUP BY doc_id
)
WHERE rk <= 10
""",
    "text_inverted_postings": """
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
)
SELECT term, COUNT(*) AS df,
       array_to_string(
         list_transform((list(doc_id ORDER BY doc_id))[1:20],
                        x -> CAST(x AS VARCHAR)),
         ',') AS postings
FROM pairs WHERE term <> ''
GROUP BY term
""",
    "cur_quality_filter": """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
),
m AS (
  SELECT doc_id,
         len(tok) AS n_tokens,
         len(list_distinct(tok)) AS n_unique,
         len(list_filter(tok, x -> list_contains(['the','a','and','of','to','in','is','on'], x))) AS n_stopwords
  FROM t
),
v AS (
  SELECT *,
         CASE WHEN n_tokens < 20 THEN 'too_short'
              WHEN n_unique * 2 <= n_tokens THEN 'too_repetitive'
              WHEN n_stopwords * 50 < n_tokens THEN 'low_stopword'
              ELSE 'kept' END AS reason
  FROM m
)
SELECT doc_id,
       CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(n_unique AS INTEGER) AS n_unique,
       CAST(n_stopwords AS INTEGER) AS n_stopwords,
       reason,
       CASE WHEN reason = 'kept' THEN 'Y' ELSE 'N' END AS keep_flag
FROM v
""",
    "cur_decontaminate": _SHINGLES + """
, inv AS (SELECT doc_id, unnest(shingle_set) AS shingle FROM sh)
SELECT t.doc_id AS train_id, b.doc_id AS bench_id, COUNT(*) AS n_common
FROM (SELECT * FROM inv WHERE doc_id % 10 <> 7) t
JOIN (SELECT * FROM inv WHERE doc_id % 10 = 7) b USING (shingle)
GROUP BY 1, 2
HAVING COUNT(*) >= 5
""",
    "t_funnel_conversion": """
WITH staged AS (
  SELECT user_id, event_type, ts,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM events
),
staged2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
              OVER (PARTITION BY user_id) AS t2
  FROM staged
),
staged3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
              OVER (PARTITION BY user_id) AS t3
  FROM staged2
),
per_user AS (
  SELECT user_id, MIN(t1) AS t1, MIN(t2) AS t2, MIN(t3) AS t3
  FROM staged3 GROUP BY user_id
),
agg AS (
  SELECT COALESCE(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END), 0) AS n1,
         COALESCE(SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END), 0) AS n2,
         COALESCE(SUM(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END), 0) AS n3
  FROM per_user
)
SELECT 'view' AS stage, CAST(n1 AS BIGINT) AS n_users FROM agg
UNION ALL SELECT 'click_after_view', CAST(n2 AS BIGINT) FROM agg
UNION ALL SELECT 'purchase_after_click', CAST(n3 AS BIGINT) FROM agg
""",
    "t_cohort_retention": """
WITH days AS (
  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events
),
first_seen AS (
  SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(FLOOR(date_diff('day', cohort_day, day) / 7.0) AS INTEGER) AS week_offset,
       COUNT(DISTINCT user_id) AS n_active
FROM days JOIN first_seen USING (user_id)
GROUP BY 1, 2
""",
    "t_rfm_segmentation": """
WITH per_user AS (
  SELECT user_id,
         MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS last_day,
         COUNT(*) AS frequency,
         SUM(CAST(value AS DECIMAL(18,2))) AS monetary_d
  FROM events GROUP BY user_id
),
scored AS (
  SELECT user_id,
         CAST(date_diff('day', last_day, MAX(last_day) OVER ()) AS INTEGER)
           AS recency_days,
         CAST(frequency AS BIGINT) AS frequency,
         CAST(monetary_d AS DOUBLE) AS monetary
  FROM per_user
),
tiled AS (
  SELECT user_id, recency_days, frequency, monetary,
         CAST(NTILE(5) OVER (ORDER BY recency_days ASC, user_id)
              AS INTEGER) AS r_score,
         CAST(NTILE(5) OVER (ORDER BY frequency DESC, user_id)
              AS INTEGER) AS f_score,
         CAST(NTILE(5) OVER (ORDER BY monetary DESC, user_id)
              AS INTEGER) AS m_score
  FROM scored
)
SELECT user_id, recency_days, frequency, monetary,
       r_score, f_score, m_score,
       CASE WHEN r_score = 1 AND f_score = 1 THEN 'champion'
            WHEN r_score >= 4 AND f_score >= 4 THEN 'hibernating'
            WHEN r_score >= 4 THEN 'at_risk'
            WHEN f_score <= 2 THEN 'loyal'
            ELSE 'regular' END AS segment
FROM tiled
""",

    # trend/seasonal sums run over DECIMALs (exact, associative) so
    # DuckDB's segment-tree frame evaluation cannot reorder a double
    # sum; every emitted float is one division/round of identical
    # inputs on both engines
    "ts_seasonal_decompose": """
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,2))) AS total_d
  FROM events GROUP BY 1, 2
),
t AS (
  SELECT event_type, day, total_d,
         SUM(total_d) OVER w7 AS sum7,
         COUNT(*) OVER w7 AS cnt7,
         CAST(isodow(day) - 1 AS INTEGER) AS dow
  FROM daily
  WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
tt AS (
  SELECT *, CASE WHEN cnt7 = 7 THEN CAST(sum7 AS DOUBLE) / 7.0 END
              AS trend
  FROM t
),
dt AS (
  SELECT *, CASE WHEN trend IS NOT NULL THEN
              CAST(ROUND(CAST(total_d AS DOUBLE) - trend, 6)
                   AS DECIMAL(18,6)) END AS detr
  FROM tt
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, dow,
       CAST(total_d AS DOUBLE) AS day_total,
       ROUND(trend, 4) AS trend,
       ROUND(CAST(SUM(detr) OVER wd AS DOUBLE) / COUNT(detr) OVER wd, 4)
         AS seasonal,
       ROUND(CAST(total_d AS DOUBLE) - trend
             - CAST(SUM(detr) OVER wd AS DOUBLE) / COUNT(detr) OVER wd,
             4) AS resid
FROM dt
WINDOW wd AS (PARTITION BY event_type, dow)
""",

    "ts_anomaly_days": """
WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,2))) AS day_total_d
  FROM events
  GROUP BY 1, 2
),
stats AS (
  SELECT event_type, day, day_total_d,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         CAST(SUM(day_total_d) OVER (PARTITION BY event_type) AS DOUBLE) AS s,
         CAST(SUM(CAST(day_total_d * day_total_d AS DECIMAL(38,4)))
              OVER (PARTITION BY event_type) AS DOUBLE) AS ss
  FROM daily
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(day_total_d AS DOUBLE) AS day_total,
       (CAST(day_total_d AS DOUBLE) - s / n)
         / sqrt((ss - s * s / n) / (n - 1)) AS z
FROM stats
WHERE abs((CAST(day_total_d AS DOUBLE) - s / n)
          / sqrt((ss - s * s / n) / (n - 1))) > 2.0
""",
    # the three iterative-training queries surface deterministic
    # invariant verdicts (see plans/ext_queries._ann_invariants and
    # sim_kmeans_clusters): the oracle checks the exact counts and the
    # TRUE literals the invariants must produce on any correct engine
    "sim_kmeans_clusters": """
SELECT (SELECT COUNT(*) FROM embeddings) AS n_points,
       (SELECT LEAST(50, COUNT(*)) FROM embeddings) AS k,
       TRUE AS all_assigned,
       TRUE AS clusters_within_seeds,
       TRUE AS inertia_decreased
""",
    "sim_pq_ann": """
SELECT vec_id AS query_id,
       CAST(5 AS BIGINT) AS n_neighbors,
       TRUE AS ranks_dense,
       TRUE AS neighbors_distinct,
       TRUE AS no_self,
       TRUE AS recall_floor_ok
FROM embeddings WHERE vec_id % 50 = 0
""",
    "sim_ivfpq_ann": """
SELECT vec_id AS query_id,
       CAST(5 AS BIGINT) AS n_neighbors,
       TRUE AS ranks_dense,
       TRUE AS neighbors_distinct,
       TRUE AS no_self,
       TRUE AS recall_floor_ok
FROM embeddings WHERE vec_id % 50 = 0
""",
}
