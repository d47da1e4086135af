"""Gate queries + DuckDB oracles for the training-data operators.

Every oracle is *generated* from the same module-level constants the Spark
operators use (MINHASH_PARAMS, LSH_PLANES, STOPWORDS, LANG_MARKERS), so the
two sides cannot drift. Registered into the same QUERIES/ORACLES registry as
the dataflow queries (imported by ``olake_spark.queries``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olake_spark.operators import dedup as dd
from olake_spark.operators import similarity as sim
from olake_spark.operators import text as tx
from olake_spark.queries import register, table

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB dialect), kept in lockstep with operators
# ---------------------------------------------------------------------------

_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"
_H60 = "('0x' || substring(md5({x}),1,15))::BIGINT"
_PUNCT_SQL = "'[.,!?;:''\"()\\[\\]{}-]'"

# GPT-2-style pretokenizer regex as a SQL literal (quotes doubled)
from olake_spark.operators.quality import BPE_PRETOKEN_RE as _BPE_RE  # noqa: E402

from olake_spark.materialize import materialize

BPE_SQL_RE = _BPE_RE.replace("'", "''")


def _stop_list() -> str:
    return "[" + ", ".join(f"'{w}'" for w in tx.STOPWORDS) + "]"


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@register(
    "text_token_stats",
    f"""
    SELECT doc_id, lang, len({_TOKS})::BIGINT AS n_tokens, length(text)::BIGINT AS n_chars
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = table(spark, sf_dir, "documents")
    return tx.with_token_count(df).select(
        "doc_id", "lang", "n_tokens", F.length("text").cast("long").alias("n_chars")
    )


@register(
    "text_quality_score",
    f"""
    WITH feat AS (
      SELECT doc_id,
             length(text)::DOUBLE AS n_chars,
             len({_TOKS})::DOUBLE AS n_tokens,
             (length(text) - length(regexp_replace(text, {_PUNCT_SQL}, '', 'g')))::DOUBLE AS n_punct,
             len(list_filter({_TOKS}, x -> list_contains({{stops}}, x)))::DOUBLE AS n_stop
      FROM documents
    ), ratios AS (
      SELECT doc_id, n_chars, n_tokens,
             CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio,
             CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END AS stop_ratio,
             CASE WHEN n_tokens > 0 THEN (n_chars - (n_tokens - 1)) / n_tokens ELSE 0.0 END AS mtl
      FROM feat
    )
    SELECT doc_id, n_tokens::BIGINT AS n_tokens,
           round(punct_ratio, 6) AS punct_ratio,
           round(stop_ratio, 6) AS stopword_ratio,
           round(mtl, 6) AS mean_token_len,
           round(CASE WHEN n_chars IS NULL THEN 0.0 ELSE
             (least(n_chars/500.0, 1.0) + (1.0 - punct_ratio) + (1.0 - stop_ratio)) / 3.0 END, 6)
             AS quality_score
    FROM ratios
    """.replace("{stops}", _stop_list()),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = table(spark, sf_dir, "documents")
    return tx.with_quality_features(df).select(
        "doc_id", "n_tokens", "punct_ratio", "stopword_ratio", "mean_token_len", "quality_score"
    )


def _langid_oracle() -> str:
    counts = {
        lang: "("
        + " + ".join(f"len(regexp_extract_all(lower(text), '\\b{w}\\b'))" for w in ws)
        + ")"
        for lang, ws in tx.LANG_MARKERS.items()
    }
    langs = list(tx.LANG_MARKERS)
    whens = []
    for lang in langs:  # same strict-majority rule as the Spark operator
        others = " AND ".join(f"c_{lang} > c_{o}" for o in langs if o != lang)
        whens.append(f"WHEN c_{lang} > 0 AND {others} THEN '{lang}'")
    case = "CASE WHEN has_cjk THEN 'zh' " + " ".join(whens) + " ELSE 'und' END"
    sel = ", ".join(f"{sql} AS c_{lang}" for lang, sql in counts.items())
    return f"""
    WITH c AS (
      SELECT doc_id, regexp_matches(text, '[一-鿿]') AS has_cjk, {sel} FROM documents
    )
    SELECT lang_pred, count(*) AS n_docs
    FROM (SELECT doc_id, {case} AS lang_pred FROM c)
    GROUP BY lang_pred
    """


@register("text_lang_id", _langid_oracle())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = table(spark, sf_dir, "documents")
    return tx.with_lang_id(df).groupBy("lang_pred").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "doc_fingerprint",
    f"SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.with_fingerprint(table(spark, sf_dir, "documents")).select("doc_id", "fingerprint")


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    f"""
    SELECT md5({_NORM}) AS fingerprint, min(doc_id) AS representative,
           count(*) AS n_dupes
    FROM documents GROUP BY 1
    """,
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.exact_dedup(table(spark, sf_dir, "documents"), "doc_id", "text")


def _minhash_sig_sql() -> str:
    h = _H60.format(x="s")
    mins = ", ".join(
        f"min(({a}*h + {b}) % {dd.HASH_PRIME}) AS m{i}"
        for i, (a, b) in enumerate(dd.MINHASH_PARAMS)
    )
    return f"""
    sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
          range(1, greatest(length({_NORM})-4,1)+1),
          i -> substring({_NORM}, i::INT, 5)))) AS s
      FROM documents
    ), hashed AS (SELECT doc_id, {h} % {dd.HASH_PRIME} AS h FROM sh),
    sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id)
    """


def _minhash_oracle(threshold: float = 0.7, num_bands: int = 4) -> str:
    k = len(dd.MINHASH_PARAMS)
    rpb = k // num_bands
    band_selects = []
    for j in range(num_bands):
        cols = ", ".join(f"m{j*rpb+r}::VARCHAR" for r in range(rpb))
        band_selects.append(
            f"SELECT doc_id, {j} AS band, md5(concat_ws('|', {cols})) AS bh FROM sig"
        )
    bands = " UNION ALL ".join(band_selects)
    eq = " + ".join(f"(sa.m{i} = sb.m{i})::INT" for i in range(k))
    return f"""
    WITH {_minhash_sig_sql()},
    bands AS ({bands}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, round(({eq})/{float(k)}, 6) AS est_jaccard
    FROM cand JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b
    WHERE round(({eq})/{float(k)}, 6) >= {threshold}
    """


@register("dedup_minhash_lsh", _minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.minhash_near_dups(table(spark, sf_dir, "documents"), "doc_id", "text", 0.7)


def _cluster_oracle() -> str:
    """Connected components over the MinHash pairs via a recursive
    reachability CTE: cluster id = min id reachable from each doc (docs with
    no pair cluster to themselves)."""
    return f"""
    WITH RECURSIVE mh AS MATERIALIZED ({_minhash_oracle()}),
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM mh
      UNION SELECT id_b, id_a FROM mh
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT d.doc_id,
           least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS cluster_id
    FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
    GROUP BY d.doc_id
    """


@register("dedup_minhash_clusters", _cluster_oracle())
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair → cluster step of the dedup pipeline (operators/dedup.py
    connected_components): MinHash candidate pairs collapse into
    min-label connected components; every document gets a cluster id
    (singletons label themselves)."""
    docs = table(spark, sf_dir, "documents")
    pairs = dd.minhash_near_dups(docs, "doc_id", "text", 0.7)
    return dd.connected_components(docs.select("doc_id"), pairs)


def _simhash_sql() -> str:
    h = _H60.format(x="w")
    votes = ", ".join(
        f"sum(((h >> {b}) & 1)*2 - 1) AS v{b}" for b in range(dd.SIMHASH_BITS)
    )
    bits = " + ".join(
        f"CASE WHEN v{b} > 0 THEN {1 << b}::BIGINT ELSE 0 END" for b in range(dd.SIMHASH_BITS)
    )
    return f"""
    tok AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
    th AS (SELECT doc_id, {h} AS h FROM tok),
    votes AS (SELECT doc_id, {votes} FROM th GROUP BY doc_id),
    sim AS (SELECT doc_id, ({bits}) AS simhash FROM votes)
    """


def _simhash_oracle(max_hamming: int = 3) -> str:
    width = dd.SIMHASH_BITS // dd.SIMHASH_BANDS
    bands = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {j} AS band, (simhash >> {j*width}) & {(1<<width)-1} AS bv FROM sim"
        for j in range(dd.SIMHASH_BANDS)
    )
    return f"""
    WITH {_simhash_sql()},
    bands AS ({bands})
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash))::INT AS hamming
    FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


@register("dedup_simhash", _simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash_near_dups(table(spark, sf_dir, "documents"), "doc_id", "text", 3)


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH g AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
         range(1, greatest(len({_TOKS})-2,1)+1),
         i -> array_to_string(({_TOKS})[i:i+2], ' ')))) AS ng
      FROM documents
    ), sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
    dfreq AS (SELECT ng, count(*) AS df FROM g GROUP BY ng),
    gc AS (SELECT g.doc_id, g.ng FROM g JOIN dfreq USING (ng) WHERE df <= 100),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
      FROM gc a JOIN gc b ON a.ng = b.ng AND a.doc_id < b.doc_id GROUP BY 1,2
    )
    SELECT id_a, id_b, round(c*1.0/(s1.n + s2.n - c), 6) AS jaccard
    FROM inter JOIN sizes s1 ON s1.doc_id = id_a JOIN sizes s2 ON s2.doc_id = id_b
    WHERE round(c*1.0/(s1.n + s2.n - c), 6) >= 0.2
    """,
)
def dedup_ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text", 3, 0.2, max_df=100
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_COS = (
    "list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
    "(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
    "sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])))"
)


@register(
    "similarity_topk_bruteforce",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round({_COS.format(a='q.qv', b='c.embedding')}, 9) AS s9
      FROM q JOIN embeddings c ON c.vec_id <> q.query_id
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, neighbor_id) AS "rank"
      FROM scored
    )
    SELECT query_id, neighbor_id, "rank", round(s9, 6) AS cosine_sim
    FROM ranked WHERE "rank" <= 5
    """,
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return sim.brute_force_topk(emb.filter(F.col("vec_id") < 5), emb, k=5)


def _plane_literal(plane: list[int]) -> str:
    return "[" + ", ".join(f"{float(w)!r}" for w in plane) + "]::DOUBLE[]"


def _lsh_sig_sql(vec: str, planes: list[list[int]] | None = None) -> str:
    terms = [
        f"CASE WHEN list_dot_product({vec}::DOUBLE[], {_plane_literal(p)}) > 0 "
        f"THEN {1 << j} ELSE 0 END"
        for j, p in enumerate(planes if planes is not None else sim.LSH_PLANES)
    ]
    return "(" + " + ".join(terms) + ")"


def _lsh_bands_sql(vec: str, src: str = "embeddings") -> str:
    """UNION ALL of one (vec_id, embedding, band, sig) select per LSH table —
    the banded multi-table relation the Spark side builds with
    explode(lsh_bands(...))."""
    return " UNION ALL ".join(
        f"SELECT vec_id, {vec}, {i} AS band, {_lsh_sig_sql(vec, planes)} AS sig FROM {src}"
        for i, planes in enumerate(sim.lsh_planes())
    )


@register(
    "similarity_topk_lsh",
    f"""
    WITH bands AS ({_lsh_bands_sql('embedding')}),
    q AS (SELECT vec_id AS query_id, embedding AS qv, band, sig FROM bands WHERE vec_id < 5),
    scored AS (
      SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id,
             round({_COS.format(a='q.qv', b='c.embedding')}, 9) AS s9
      FROM q JOIN bands c ON c.band = q.band AND c.sig = q.sig AND c.vec_id <> q.query_id
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, neighbor_id) AS "rank"
      FROM scored
    )
    SELECT query_id, neighbor_id, "rank", round(s9, 6) AS cosine_sim
    FROM ranked WHERE "rank" <= 5
    """,
)
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded multi-table LSH top-k (union of band matches across L tables —
    operators/similarity.py lsh_bucket_topk)."""
    emb = table(spark, sf_dir, "embeddings")
    return sim.lsh_bucket_topk(emb.filter(F.col("vec_id") < 5), emb, k=5)


@register(
    "similarity_topk_ivf",
    f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id % 97 = 0
    ), assign AS (
      SELECT e.vec_id, e.embedding, c.cent_id,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round({_COS.format(a='e.embedding', b='c.cv')}, 9) DESC,
                        c.cent_id) AS rn
      FROM embeddings e CROSS JOIN cents c
    ), cells AS (
      SELECT vec_id, embedding, cent_id AS cell FROM assign WHERE rn = 1
    ), q AS (
      SELECT vec_id AS query_id, embedding AS qv, cell FROM cells WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round({_COS.format(a='q.qv', b='c.embedding')}, 9) AS s9
      FROM q JOIN cells c ON c.cell = q.cell AND c.vec_id <> q.query_id
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, neighbor_id) AS "rank"
      FROM scored
    )
    SELECT query_id, neighbor_id, "rank", round(s9, 6) AS cosine_sim
    FROM ranked WHERE "rank" <= 5
    """,
)
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: corpus partitioned into nearest-centroid
    cells (deterministic centroid subset so the oracle reproduces the
    index), query searches only its cell (operators/similarity.py
    ivf_topk)."""
    emb = table(spark, sf_dir, "embeddings")
    return sim.ivf_topk(emb.filter(F.col("vec_id") < 5), emb, k=5)


@register(
    "similarity_topk_ivf_nprobe",
    f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id % 97 = 0
    ), assign AS (
      SELECT e.vec_id, e.embedding, c.cent_id,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round({_COS.format(a='e.embedding', b='c.cv')}, 9) DESC,
                        c.cent_id) AS rn
      FROM embeddings e CROSS JOIN cents c
    ), cells AS (
      SELECT vec_id, embedding, cent_id AS cell FROM assign WHERE rn = 1
    ), q AS (
      SELECT vec_id AS query_id, embedding AS qv, cent_id AS cell
      FROM assign WHERE vec_id < 5 AND rn <= 2
    ), scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round({_COS.format(a='q.qv', b='c.embedding')}, 9) AS s9
      FROM q JOIN cells c ON c.cell = q.cell AND c.vec_id <> q.query_id
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, neighbor_id) AS "rank"
      FROM scored
    )
    SELECT query_id, neighbor_id, "rank", round(s9, 6) AS cosine_sim
    FROM ranked WHERE "rank" <= 2
    """,
)
def similarity_topk_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the two scale levers the round-2 verdict asked for: the
    index is a PRECOMPUTED (id, vec, cell) assignment handed to the query
    (``ivf_build_index`` → ``ivf_topk(index=...)`` — at 100 TB this is a
    bucketed table, built once, not a per-run cost), and ``nprobe=2``
    searches the two nearest cells per query for recall."""
    emb = table(spark, sf_dir, "embeddings")
    cents = sim.stride_centroids(emb)
    idx = sim.ivf_build_index(emb, cents)
    return sim.ivf_topk(
        emb.filter(F.col("vec_id") < 5), centroids=cents, index=idx, k=2, nprobe=2
    )


_KMEANS_K = 8
_KMEANS_ITERS = 2
_KMEANS_SCALE = 10_000


def _kmeans_cte(iters: int = _KMEANS_ITERS, k: int = _KMEANS_K) -> str:
    """Unrolled Lloyd's iterations over quantized vectors — every sum is an
    exact integer below 2^53, so the result is identical under any
    aggregation order in any engine (see ivf_train_centroids docstring)."""
    cos = _COS.format(a="qv.v", b="c.cv")
    parts = [
        f"qv AS (SELECT vec_id, list_transform(embedding::DOUBLE[],"
        f" x -> floor(x * {float(_KMEANS_SCALE)})) AS v FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cid, v AS cv, 1::BIGINT AS n FROM qv"
        f" ORDER BY vec_id LIMIT {k})",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""a{i} AS (
      SELECT qv.vec_id, qv.v, c.cid,
             row_number() OVER (PARTITION BY qv.vec_id
               ORDER BY round({cos}, 9) DESC, c.cid) AS rn
      FROM qv CROSS JOIN c{i-1} c
    )"""
        )
        parts.append(
            f"""m{i} AS (
      SELECT cid, pos, sum(x) AS s, count(*) AS cnt
      FROM (SELECT cid, unnest(v) AS x, generate_subscripts(v, 1) AS pos
            FROM a{i} WHERE rn = 1)
      GROUP BY cid, pos
    )"""
        )
        parts.append(
            f"c{i} AS (SELECT cid, list(s ORDER BY pos) AS cv, max(cnt) AS n"
            f" FROM m{i} GROUP BY cid)"
        )
    return ",\n    ".join(parts)


@register(
    "ivf_kmeans_quantized",
    f"""
    WITH {_kmeans_cte()}
    SELECT cid AS cent_id, n AS n_members,
           to_json(cv::BIGINT[]) AS centsum_json
    FROM c{_KMEANS_ITERS}
    """,
)
def ivf_kmeans_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (operators/similarity.py
    ivf_train_centroids) in its exactly-reproducible quantized form:
    components quantize to floor(x*1e4) and centroids stay per-dimension
    SUMS (cosine is scale-invariant), so every aggregate is an exact
    integer — bit-identical under any partitioning, verifiable by a SQL
    oracle despite being an iterative algorithm."""
    emb = table(spark, sf_dir, "embeddings")
    cents = sim.ivf_train_centroids(
        emb, k=_KMEANS_K, iters=_KMEANS_ITERS, quantize_scale=_KMEANS_SCALE
    )
    return cents.select(
        F.col("_cent_id").alias("cent_id"),
        F.col("_n").alias("n_members"),
        F.to_json(F.col("_cent_v").cast("array<long>")).alias("centsum_json"),
    )


@register(
    "similarity_topk_ivf_trained",
    f"""
    WITH {_kmeans_cte()},
    assign AS (
      SELECT e.vec_id, e.embedding, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round({_COS.format(a='e.embedding', b='c.cv')}, 9) DESC,
                        c.cid) AS rn
      FROM embeddings e CROSS JOIN c{_KMEANS_ITERS} c
    ), cells AS (
      SELECT vec_id, embedding, cid AS cell FROM assign WHERE rn = 1
    ), q AS (
      SELECT vec_id AS query_id, embedding AS qv, cell FROM cells WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round({_COS.format(a='q.qv', b='c.embedding')}, 9) AS s9
      FROM q JOIN cells c ON c.cell = q.cell AND c.vec_id <> q.query_id
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, neighbor_id) AS "rank"
      FROM scored
    )
    SELECT query_id, neighbor_id, "rank", round(s9, 6) AS cosine_sim
    FROM ranked WHERE "rank" <= 5
    """,
)
def similarity_topk_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-means path wired end-to-end (round-2 verdict item 1): train
    quantized centroids, build the cell index from them, answer top-k from
    the trained cells — all under the exact-value oracle."""
    emb = table(spark, sf_dir, "embeddings")
    cents = sim.ivf_train_centroids(
        emb, k=_KMEANS_K, iters=_KMEANS_ITERS, quantize_scale=_KMEANS_SCALE
    )
    return sim.ivf_topk(emb.filter(F.col("vec_id") < 5), emb, centroids=cents, k=5)


@register(
    "similarity_topk_lsh_indexed",
    f"""
    WITH bands AS ({_lsh_bands_sql('embedding')}),
    q AS (SELECT vec_id AS query_id, embedding AS qv, band, sig FROM bands WHERE vec_id < 5),
    scored AS (
      SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id,
             round({_COS.format(a='q.qv', b='c.embedding')}, 9) AS s9
      FROM q JOIN bands c ON c.band = q.band AND c.sig = q.sig AND c.vec_id <> q.query_id
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, neighbor_id) AS "rank"
      FROM scored
    )
    SELECT query_id, neighbor_id, "rank", round(s9, 6) AS cosine_sim
    FROM ranked WHERE "rank" <= 5
    """,
)
def similarity_topk_lsh_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH top-k answered from a PRECOMPUTED banded relation
    (``lsh_build_index`` → ``lsh_bucket_topk(index=...)`` — the round-3
    verdict's artifact-lifecycle fix, mirroring the IVF index): the
    corpus-wide signature pass is the build step, each query run signs only
    the query set. Results must be identical to ``similarity_topk_lsh``,
    so the oracle SQL is the same."""
    emb = table(spark, sf_dir, "embeddings")
    idx = sim.lsh_build_index(emb)
    return sim.lsh_bucket_topk(emb.filter(F.col("vec_id") < 5), index=idx, k=5)


_PQ_SUB_LEN = 16  # 64 dims / 4 subspaces
_PQ_SQDIST = (
    "list_sum(list_transform(range(1, {n}+1), "
    "i -> (sv[i]-cv[i])*(sv[i]-cv[i])))".format(n=_PQ_SUB_LEN)
)
_PQ_DOT = (
    "list_sum(list_transform(range(1, {n}+1), "
    "i -> qsv[i]*cv[i]))".format(n=_PQ_SUB_LEN)
)

_PQ_ORACLE = f"""
    WITH qv AS (
      SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 10000.0)) AS v
      FROM embeddings
    ),
    subids AS (SELECT unnest([0, 1, 2, 3]) AS sub),
    cb AS (
      SELECT sub, vec_id AS code,
             list_slice(v, sub*{_PQ_SUB_LEN}+1, sub*{_PQ_SUB_LEN}+{_PQ_SUB_LEN}) AS cv
      FROM qv CROSS JOIN subids WHERE vec_id % 97 = 0
    ),
    subs AS (
      SELECT vec_id, sub,
             list_slice(v, sub*{_PQ_SUB_LEN}+1, sub*{_PQ_SUB_LEN}+{_PQ_SUB_LEN}) AS sv
      FROM qv CROSS JOIN subids
    ),
    enc AS (
      SELECT vec_id, sub, code FROM (
        SELECT s.vec_id, s.sub, cb.code,
               row_number() OVER (PARTITION BY s.vec_id, s.sub
                 ORDER BY {_PQ_SQDIST}, cb.code) AS rn
        FROM subs s JOIN cb ON cb.sub = s.sub
      ) WHERE rn = 1
    ),
    lut AS (
      SELECT q.vec_id AS query_id, cb.sub, cb.code,
             list_sum(list_transform(range(1, {_PQ_SUB_LEN}+1), i -> q.sv[i]*cb.cv[i])) AS pd
      FROM subs q JOIN cb ON cb.sub = q.sub WHERE q.vec_id < 3
    ),
    scored AS (
      SELECT l.query_id, e.vec_id AS neighbor_id, sum(l.pd)::BIGINT AS adc_dot
      FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
        AND l.query_id <> e.vec_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, "rank", adc_dot FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adc_dot DESC, neighbor_id)::INT AS "rank"
      FROM scored
    ) WHERE "rank" <= 5
    """


_IVFPQ_ORACLE = f"""
    WITH qv AS (
      SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 10000.0)) AS v
      FROM embeddings
    ),
    subids AS (SELECT unnest([0, 1, 2, 3]) AS sub),
    cb AS (
      SELECT sub, vec_id AS code,
             list_slice(v, sub*{_PQ_SUB_LEN}+1, sub*{_PQ_SUB_LEN}+{_PQ_SUB_LEN}) AS cv
      FROM qv CROSS JOIN subids WHERE vec_id % 97 = 0
    ),
    subs AS (
      SELECT vec_id, sub,
             list_slice(v, sub*{_PQ_SUB_LEN}+1, sub*{_PQ_SUB_LEN}+{_PQ_SUB_LEN}) AS sv
      FROM qv CROSS JOIN subids
    ),
    enc AS (
      SELECT vec_id, sub, code FROM (
        SELECT s.vec_id, s.sub, cb.code,
               row_number() OVER (PARTITION BY s.vec_id, s.sub
                 ORDER BY {_PQ_SQDIST}, cb.code) AS rn
        FROM subs s JOIN cb ON cb.sub = s.sub
      ) WHERE rn = 1
    ),
    cents AS (
      SELECT vec_id AS cent_id, embedding AS ccv FROM embeddings WHERE vec_id % 97 = 0
    ),
    assign AS (
      SELECT e.vec_id, c.cent_id,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round({_COS.format(a='e.embedding', b='c.ccv')}, 9) DESC,
                        c.cent_id) AS rn
      FROM embeddings e CROSS JOIN cents c
    ),
    cells AS (SELECT vec_id, cent_id AS cell FROM assign WHERE rn = 1),
    qcells AS (
      SELECT vec_id AS query_id, cent_id AS cell FROM assign
      WHERE vec_id < 3 AND rn <= 2
    ),
    lut AS (
      SELECT q.vec_id AS query_id, cb.sub, cb.code,
             list_sum(list_transform(range(1, {_PQ_SUB_LEN}+1), i -> q.sv[i]*cb.cv[i])) AS pd
      FROM subs q JOIN cb ON cb.sub = q.sub WHERE q.vec_id < 3
    ),
    scored AS (
      SELECT l.query_id, e.vec_id AS neighbor_id, sum(l.pd)::BIGINT AS adc_dot
      FROM enc e
      JOIN cells ce ON ce.vec_id = e.vec_id
      JOIN qcells qc ON qc.cell = ce.cell
      JOIN lut l ON l.query_id = qc.query_id AND l.sub = e.sub AND l.code = e.code
      WHERE l.query_id <> e.vec_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, "rank", adc_dot FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adc_dot DESC, neighbor_id)::INT AS "rank"
      FROM scored
    ) WHERE "rank" <= 3
    """


@register("similarity_topk_ivfpq", _IVFPQ_ORACLE)
def similarity_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic IVF-PQ pruned scan composed end-to-end (operators/pq.py
    ivfpq_index / ivfpq_topk): coarse stride-centroid cells prune the
    corpus to each query's nprobe=2 nearest cells, PQ codes ADC-score only
    those cells' vectors. The persisted artifact is (id, cell, m codes) —
    m+1 small ints per vector — and neither the corpus nor the index
    shuffles at query time (per-query LUT replicated per probed cell and
    broadcast). Exact-integer ADC keeps the oracle bit-for-bit."""
    from olake_spark.operators import pq as _pq

    emb = table(spark, sf_dir, "embeddings")
    cents = sim.stride_centroids(emb)
    cb = _pq.pq_stride_codebooks(emb)
    idx = _pq.ivfpq_index(emb, cents, cb)
    return _pq.ivfpq_topk(
        emb.filter(F.col("vec_id") < 3), idx, cb, cents, k=3, nprobe=2
    )


_PQT_K, _PQT_ITERS = 8, 2


def _pq_subspace_kmeans_cte(sub: int, k: int = _PQT_K, iters: int = _PQT_ITERS) -> str:
    """Unrolled per-subspace L2 Lloyd's iterations over quantized
    sub-vectors — init = first k by id, assignment = exact-integer squared
    distance (ties → lowest code), update = per-dimension floor-mean
    (floor of an exact-integer ratio) — mirroring pq_train_codebooks."""
    sqd = (
        "list_sum(list_transform(range(1, {n}+1), "
        "i -> (s.sv[i]-c.cv[i])*(s.sv[i]-c.cv[i])))".format(n=_PQ_SUB_LEN)
    )
    parts = [
        f"s{sub}c0 AS (SELECT vec_id AS code, sv AS cv FROM subs"
        f" WHERE sub = {sub} ORDER BY vec_id LIMIT {k})"
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""s{sub}a{i} AS (
      SELECT s.vec_id, s.sv, c.code,
             row_number() OVER (PARTITION BY s.vec_id
               ORDER BY {sqd}, c.code) AS rn
      FROM (SELECT vec_id, sv FROM subs WHERE sub = {sub}) s
      CROSS JOIN s{sub}c{i-1} c
    )"""
        )
        parts.append(
            f"""s{sub}c{i} AS (
      SELECT code, list(m ORDER BY pos) AS cv FROM (
        SELECT code, pos, floor(sum(x) / count(*)) AS m
        FROM (SELECT code, unnest(sv) AS x, generate_subscripts(sv, 1) AS pos
              FROM s{sub}a{i} WHERE rn = 1)
        GROUP BY code, pos
      ) GROUP BY code
    )"""
        )
    return ",\n    ".join(parts)


_PQ_TRAINED_ORACLE = f"""
    WITH qv AS (
      SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 10000.0)) AS v
      FROM embeddings
    ),
    subids AS (SELECT unnest([0, 1, 2, 3]) AS sub),
    subs AS (
      SELECT vec_id, sub,
             list_slice(v, sub*{_PQ_SUB_LEN}+1, sub*{_PQ_SUB_LEN}+{_PQ_SUB_LEN}) AS sv
      FROM qv CROSS JOIN subids
    ),
    {",    ".join(_pq_subspace_kmeans_cte(j) for j in range(4))},
    cb AS (
      {" UNION ALL ".join(f"SELECT {j} AS sub, code, cv FROM s{j}c{_PQT_ITERS}" for j in range(4))}
    ),
    enc AS (
      SELECT vec_id, sub, code FROM (
        SELECT s.vec_id, s.sub, cb.code,
               row_number() OVER (PARTITION BY s.vec_id, s.sub
                 ORDER BY {_PQ_SQDIST}, cb.code) AS rn
        FROM subs s JOIN cb ON cb.sub = s.sub
      ) WHERE rn = 1
    ),
    lut AS (
      SELECT q.vec_id AS query_id, cb.sub, cb.code,
             list_sum(list_transform(range(1, {_PQ_SUB_LEN}+1), i -> q.sv[i]*cb.cv[i])) AS pd
      FROM subs q JOIN cb ON cb.sub = q.sub WHERE q.vec_id < 3
    ),
    scored AS (
      SELECT l.query_id, e.vec_id AS neighbor_id, CAST(sum(l.pd) AS BIGINT) AS adc_dot
      FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
        AND l.query_id <> e.vec_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, "rank", adc_dot FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adc_dot DESC, neighbor_id)::INT AS "rank"
      FROM scored
    ) WHERE "rank" <= 5
    """


@register("similarity_topk_pq_trained", _PQ_TRAINED_ORACLE)
def similarity_topk_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION PQ path end-to-end under the exact-value oracle:
    per-subspace L2 k-means codebooks (quantized integers, floor-mean
    updates — operators/pq.py pq_train_codebooks), encode, ADC top-k.
    Completes the trained-component story the IVF family already has
    (similarity_topk_ivf_trained)."""
    from olake_spark.operators import pq as _pq

    emb = table(spark, sf_dir, "embeddings")
    cb = _pq.pq_train_codebooks(emb, k=_PQT_K, iters=_PQT_ITERS)
    codes = _pq.pq_encode(emb, cb)
    return _pq.pq_topk(emb.filter(F.col("vec_id") < 3), codes, cb, k=5)


# the composition query trains at 1 Lloyd's iteration per k-means (gate
# budget: each trained component is separately proven at 2 iterations by
# ivf_kmeans_quantized / similarity_topk_pq_trained; this query proves the
# trained COMPOSITION, and 1 vs 2 iterations changes nothing about that)
_IVFPQT_ITERS = 1

_IVFPQ_TRAINED_ORACLE = f"""
    WITH {_kmeans_cte(iters=_IVFPQT_ITERS)},
    assign AS (
      SELECT e.vec_id, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round({_COS.format(a='e.embedding', b='c.cv')}, 9) DESC,
                        c.cid) AS rn
      FROM embeddings e CROSS JOIN c{_IVFPQT_ITERS} c
    ),
    cells AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
    qcells AS (SELECT vec_id AS query_id, cid AS cell FROM assign
               WHERE rn <= 2 AND vec_id < 3),
    subids AS (SELECT unnest([0, 1, 2, 3]) AS sub),
    subs AS (
      SELECT vec_id, sub,
             list_slice(v, sub*{_PQ_SUB_LEN}+1, sub*{_PQ_SUB_LEN}+{_PQ_SUB_LEN}) AS sv
      FROM qv CROSS JOIN subids
    ),
    {",    ".join(_pq_subspace_kmeans_cte(j, iters=_IVFPQT_ITERS) for j in range(4))},
    cb AS (
      {" UNION ALL ".join(f"SELECT {j} AS sub, code, cv FROM s{j}c{_IVFPQT_ITERS}" for j in range(4))}
    ),
    enc AS (
      SELECT vec_id, sub, code FROM (
        SELECT s.vec_id, s.sub, cb.code,
               row_number() OVER (PARTITION BY s.vec_id, s.sub
                 ORDER BY {_PQ_SQDIST}, cb.code) AS rn
        FROM subs s JOIN cb ON cb.sub = s.sub
      ) WHERE rn = 1
    ),
    lut AS (
      SELECT q.vec_id AS query_id, cb.sub, cb.code,
             list_sum(list_transform(range(1, {_PQ_SUB_LEN}+1), i -> q.sv[i]*cb.cv[i])) AS pd
      FROM subs q JOIN cb ON cb.sub = q.sub WHERE q.vec_id < 3
    ),
    scored AS (
      SELECT l.query_id, e.vec_id AS neighbor_id, CAST(sum(l.pd) AS BIGINT) AS adc_dot
      FROM enc e
      JOIN cells cv ON cv.vec_id = e.vec_id
      JOIN qcells qc ON qc.cell = cv.cell
      JOIN lut l ON l.sub = e.sub AND l.code = e.code
        AND l.query_id = qc.query_id AND l.query_id <> e.vec_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, "rank", adc_dot FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adc_dot DESC, neighbor_id)::INT AS "rank"
      FROM scored
    ) WHERE "rank" <= 3
    """


@register("similarity_topk_ivfpq_trained", _IVFPQ_TRAINED_ORACLE)
def similarity_topk_ivfpq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION IVF-PQ path end-to-end: TRAINED coarse centroids
    (quantized Lloyd's, ivf_train_centroids) + TRAINED per-subspace PQ
    codebooks (pq_train_codebooks) composed into the pruned ADC scan
    (ivfpq_index → ivfpq_topk, nprobe=2) — the full FAISS-shaped pipeline
    with every learned component under the exact-value oracle. The oracle
    reuses the existing k-means CTE machinery (coarse + 4 subspaces), no
    fresh unrolls; pruning parity (nprobe=n_cells ≡ unpruned PQ over the
    same trained artifacts) is pinned in tests/test_pq.py."""
    from olake_spark.operators import pq as _pq

    emb = table(spark, sf_dir, "embeddings")
    cents = sim.ivf_train_centroids(
        emb, k=_KMEANS_K, iters=_IVFPQT_ITERS, quantize_scale=_KMEANS_SCALE
    )
    cb = _pq.pq_train_codebooks(emb, k=_PQT_K, iters=_IVFPQT_ITERS)
    idx = _pq.ivfpq_index(emb, cents, cb)
    return _pq.ivfpq_topk(
        emb.filter(F.col("vec_id") < 3), idx, cb, cents, k=3, nprobe=2
    )


# IVFADC proper: PQ codes encode the RESIDUAL (vector − coarse centroid);
# scoring adds dot(query, centroid) back per probed cell. Deterministic
# stride coarse centroids keep the oracle's unrolled work on the residual
# codebook training only (the trained-coarse composition is proven by
# similarity_topk_ivfpq_trained; residual vs raw encode is the delta here).
_IVFADC_ORACLE = f"""
    WITH qv AS (
      SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 10000.0)) AS v
      FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS cell, embedding AS ccv,
             list_transform(embedding::DOUBLE[], x -> floor(x * 10000.0)) AS qc
      FROM embeddings WHERE vec_id % 97 = 0
    ),
    assign AS (
      SELECT e.vec_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round({_COS.format(a='e.embedding', b='c.ccv')}, 9) DESC,
                        c.cell) AS rn
      FROM embeddings e CROSS JOIN cents c
    ),
    cells AS (SELECT vec_id, cell FROM assign WHERE rn = 1),
    res AS (
      SELECT q.vec_id, cl.cell,
             list_transform(range(1, 65), i -> q.v[i] - c.qc[i]) AS rv
      FROM qv q JOIN cells cl ON cl.vec_id = q.vec_id
      JOIN cents c ON c.cell = cl.cell
    ),
    subids AS (SELECT unnest([0, 1, 2, 3]) AS sub),
    subs AS (
      SELECT vec_id, sub,
             list_slice(rv, sub*{_PQ_SUB_LEN}+1, sub*{_PQ_SUB_LEN}+{_PQ_SUB_LEN}) AS sv
      FROM res CROSS JOIN subids
    ),
    {",    ".join(_pq_subspace_kmeans_cte(j, iters=_IVFPQT_ITERS) for j in range(4))},
    cb AS (
      {" UNION ALL ".join(f"SELECT {j} AS sub, code, cv FROM s{j}c{_IVFPQT_ITERS}" for j in range(4))}
    ),
    enc AS (
      SELECT vec_id, sub, code FROM (
        SELECT s.vec_id, s.sub, cb.code,
               row_number() OVER (PARTITION BY s.vec_id, s.sub
                 ORDER BY {_PQ_SQDIST}, cb.code) AS rn
        FROM subs s JOIN cb ON cb.sub = s.sub
      ) WHERE rn = 1
    ),
    qsubs AS (
      SELECT vec_id, sub,
             list_slice(v, sub*{_PQ_SUB_LEN}+1, sub*{_PQ_SUB_LEN}+{_PQ_SUB_LEN}) AS sv
      FROM qv CROSS JOIN subids WHERE vec_id < 3
    ),
    lut AS (
      SELECT q.vec_id AS query_id, cb.sub, cb.code,
             list_sum(list_transform(range(1, {_PQ_SUB_LEN}+1), i -> q.sv[i]*cb.cv[i])) AS pd
      FROM qsubs q JOIN cb ON cb.sub = q.sub
    ),
    qcells AS (SELECT vec_id AS query_id, cell FROM assign
               WHERE vec_id < 3 AND rn <= 2),
    cterm AS (
      SELECT q.vec_id AS query_id, qc.cell,
             list_sum(list_transform(range(1, 65), i -> q.v[i]*c.qc[i])) AS ct
      FROM qv q JOIN qcells qc ON qc.query_id = q.vec_id
      JOIN cents c ON c.cell = qc.cell
    ),
    scored AS (
      SELECT l.query_id, e.vec_id AS neighbor_id, ce.cell, sum(l.pd) AS r
      FROM enc e
      JOIN cells ce ON ce.vec_id = e.vec_id
      JOIN qcells qc ON qc.cell = ce.cell
      JOIN lut l ON l.query_id = qc.query_id AND l.sub = e.sub AND l.code = e.code
      WHERE l.query_id <> e.vec_id
      GROUP BY 1, 2, 3
    ),
    tot AS (
      SELECT s.query_id, s.neighbor_id, CAST(s.r + t.ct AS BIGINT) AS adc_dot
      FROM scored s JOIN cterm t ON t.query_id = s.query_id AND t.cell = s.cell
    )
    SELECT query_id, neighbor_id, "rank", adc_dot FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adc_dot DESC, neighbor_id)::INT AS "rank"
      FROM tot
    ) WHERE "rank" <= 3
    """


@register("similarity_topk_ivfpq_residual", _IVFADC_ORACLE)
def similarity_topk_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAISS IVFADC proper (Jégou et al. §IV): PQ codebooks trained on the
    RESIDUAL (vector − coarse centroid) instead of the raw vector, the
    centroid dot added back per probed cell at score time (operators/pq.py
    ivf_residuals → pq_train_codebooks(scale=1) → pq_encode → ivfadc_topk,
    nprobe=2). Residuals concentrate near zero, so the same m·k codebook
    budget resolves finer — ANN_RECALL.json's clustered section measures
    the recall gap vs the raw-encode variant at identical m."""
    from olake_spark.operators import pq as _pq

    emb = table(spark, sf_dir, "embeddings")
    cents = sim.stride_centroids(emb)
    # the residual frame feeds training AND encode — a lazy checkpoint
    # computes it once per action instead of per consumer (mirrors
    # FAISS, where residuals are a materialized build artifact)
    res = _pq.ivf_residuals(emb, cents).transform(materialize)
    cb = _pq.pq_train_codebooks(
        res, vec_col="rv", k=_PQT_K, iters=_IVFPQT_ITERS, scale=1
    )
    # _cell rides the encode groupBy (carry_cols) — no codes⋈res id join
    idx = _pq.pq_encode(res, cb, vec_col="rv", scale=1, carry_cols=["_cell"])
    return _pq.ivfadc_topk(
        emb.filter(F.col("vec_id") < 3), idx, cb, cents, k=3, nprobe=2
    )


_SQ8_ORACLE = """
    WITH qv AS (
      SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 10000.0)) AS v
      FROM embeddings
    ),
    idx AS (SELECT unnest(generate_series(1, 64)) AS gi),
    ex AS (SELECT vec_id, gi - 1 AS i, v[gi] AS x FROM qv CROSS JOIN idx),
    st AS (SELECT i, min(x) AS mn, max(x) - min(x) AS span FROM ex GROUP BY i),
    codes AS (
      SELECT e.vec_id, e.i,
             CASE WHEN st.span = 0 THEN 0.0
                  ELSE least(255.0, greatest(0.0,
                         floor(((e.x - st.mn) * 255.0) / st.span)))
             END AS code
      FROM ex e JOIN st ON st.i = e.i
    ),
    qw AS (
      SELECT e.vec_id AS query_id, e.i,
             e.x * st.span AS w, e.x * 255.0 * st.mn AS cterm
      FROM ex e JOIN st ON st.i = e.i
      WHERE e.vec_id < 3
    ),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             CAST(sum(q.w * c.code + q.cterm) AS BIGINT) AS sq_score
      FROM codes c JOIN qw q ON q.i = c.i AND q.query_id <> c.vec_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, "rank", sq_score FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sq_score DESC, neighbor_id)::INT AS "rank"
      FROM scored
    ) WHERE "rank" <= 5
    """


@register("similarity_topk_sq8", _SQ8_ORACLE)
def similarity_topk_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar quantization top-k (operators/pq.py sq8_*) — the third
    FAISS compression tier next to LSH/IVF and PQ: per-dimension 8-bit
    codes (4x compression at float32), asymmetric exact-query scoring,
    where score_255(q,c) = 255 * dot(q, dequantized(c)) keeps every
    intermediate an exact integer below 2^53 so the DuckDB oracle
    reproduces the ranking AND the score bit-for-bit. Train stats are d
    rows (broadcast); encode is one broadcast join (no corpus shuffle);
    scoring joins the broadcast per-query weight table on the dimension
    and the per-(query, neighbor) sum combines map-side."""
    from olake_spark.operators import pq as _pq

    emb = table(spark, sf_dir, "embeddings")
    stats = _pq.sq8_stats(emb)
    codes = _pq.sq8_encode(emb, stats)
    return _pq.sq8_topk(emb.filter(F.col("vec_id") < 3), codes, stats, k=5)


@register("similarity_topk_pq", _PQ_ORACLE)
def similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (operators/pq.py — the FAISS IVF-PQ
    compression half): stride codebooks (oracle-reproducible), exact-
    integer squared-L2 encode, per-query LUT, MIPS ranking by the exact
    Σ_sub dot(query_sub, codebook[code]) score. The corpus index is m
    small ints per vector — 64× compression at d=64/m=4 — and the oracle
    reproduces every adc_dot bit-for-bit because PQ approximates the
    VECTOR while the arithmetic on the approximation stays integral."""
    from olake_spark.operators import pq as _pq

    emb = table(spark, sf_dir, "embeddings")
    cb = _pq.pq_stride_codebooks(emb)
    codes = _pq.pq_encode(emb, cb)
    return _pq.pq_topk(emb.filter(F.col("vec_id") < 3), codes, cb, k=5)


_PQ_REFINED_ORACLE = f"""
    WITH qv AS (
      SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 10000.0)) AS v
      FROM embeddings
    ),
    subids AS (SELECT unnest([0, 1, 2, 3]) AS sub),
    cb AS (
      SELECT sub, vec_id AS code,
             list_slice(v, sub*{_PQ_SUB_LEN}+1, sub*{_PQ_SUB_LEN}+{_PQ_SUB_LEN}) AS cv
      FROM qv CROSS JOIN subids WHERE vec_id % 97 = 0
    ),
    subs AS (
      SELECT vec_id, sub,
             list_slice(v, sub*{_PQ_SUB_LEN}+1, sub*{_PQ_SUB_LEN}+{_PQ_SUB_LEN}) AS sv
      FROM qv CROSS JOIN subids
    ),
    enc AS (
      SELECT vec_id, sub, code FROM (
        SELECT s.vec_id, s.sub, cb.code,
               row_number() OVER (PARTITION BY s.vec_id, s.sub
                 ORDER BY {_PQ_SQDIST}, cb.code) AS rn
        FROM subs s JOIN cb ON cb.sub = s.sub
      ) WHERE rn = 1
    ),
    lut AS (
      SELECT q.vec_id AS query_id, cb.sub, cb.code,
             list_sum(list_transform(range(1, {_PQ_SUB_LEN}+1), i -> q.sv[i]*cb.cv[i])) AS pd
      FROM subs q JOIN cb ON cb.sub = q.sub WHERE q.vec_id < 3
    ),
    scored AS (
      SELECT l.query_id, e.vec_id AS neighbor_id, sum(l.pd)::BIGINT AS adc_dot
      FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
        AND l.query_id <> e.vec_id
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY adc_dot DESC, neighbor_id) AS rn
        FROM scored
      ) WHERE rn <= 9
    ),
    refined AS (
      SELECT c.query_id, c.neighbor_id,
             list_sum(list_transform(range(1, 65), i -> q.v[i]*n.v[i]))::BIGINT
               AS exact_dot
      FROM cand c
      JOIN qv q ON q.vec_id = c.query_id
      JOIN qv n ON n.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, "rank", exact_dot FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY exact_dot DESC, neighbor_id)::INT AS "rank"
      FROM refined
    ) WHERE "rank" <= 3
    """


@register("similarity_topk_pq_refined", _PQ_REFINED_ORACLE)
def similarity_topk_pq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAISS ``IndexRefineFlat`` composed end-to-end (r6 verdict #4): the
    ADC scan returns top-(k·r)=9 CANDIDATES per query from the compressed
    codes, then operators/pq.py pq_refine fetches only those 9 raw
    vectors per query (join cost ∝ candidates — bucketed corpus makes it
    exchange-free at scale) and re-scores them with the exact quantized
    dot, keeping top-k=3. The compressed scan only has to get the true
    neighbors INTO the candidate set, not rank them — PQ speed at
    near-exact recall, the production recall rung above residual ADC
    (ANN_RECALL.json pq_refine section logs recall + candidate
    fraction)."""
    from olake_spark.operators import pq as _pq

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    cb = _pq.pq_stride_codebooks(emb)
    codes = _pq.pq_encode(emb, cb)
    cand = _pq.pq_topk(queries, codes, cb, k=9)
    return _pq.pq_refine(cand, emb, queries, k=3)


@register(
    "embedding_near_dup_pairs",
    f"""
    WITH bands AS ({_lsh_bands_sql('embedding')})
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_COS.format(a='a.embedding', b='b.embedding')}, 6) AS cosine_sim
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
    WHERE round({_COS.format(a='a.embedding', b='b.embedding')}, 6) >= 0.2
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded multi-table LSH near-dup pairs (operators/similarity.py
    cosine_near_dup_pairs)."""
    return sim.cosine_near_dup_pairs(table(spark, sf_dir, "embeddings"), threshold=0.2)


@register(
    "semantic_dedup",
    f"""
    WITH RECURSIVE bands AS MATERIALIZED ({_lsh_bands_sql('embedding')}),
    nd AS MATERIALIZED (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
      WHERE round({_COS.format(a='a.embedding', b='b.embedding')}, 6) >= 0.3
    ),
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM nd
      UNION SELECT id_b, id_a FROM nd
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    cl AS (
      SELECT e.vec_id,
             least(e.vec_id, coalesce(min(r.dst), e.vec_id)) AS cluster_id
      FROM embeddings e LEFT JOIN reach r ON r.src = e.vec_id
      GROUP BY e.vec_id
    )
    SELECT e.vec_id, e.label FROM embeddings e
    JOIN cl ON cl.vec_id = e.vec_id
    WHERE cl.cluster_id = e.vec_id
    """,
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full semantic-dedup pipeline, composed end-to-end: embedding LSH
    candidate pairs (cosine ≥ 0.2) → connected components (min-label +
    pointer jumping, operators/dedup.py connected_components) → keep the
    canonical (minimum-id) member of every cluster. This is the
    training-data shape: 'collapse semantically-identical documents, keep
    one representative' — at 100 TB each stage is the same bounded
    bucket-join / label-propagation dataflow verified individually by
    embedding_near_dup_pairs and dedup_minhash_clusters."""
    emb = table(spark, sf_dir, "embeddings")
    pairs = sim.cosine_near_dup_pairs(emb, threshold=0.3)
    clusters = dd.connected_components(
        emb.select("vec_id"), pairs, id_col="vec_id"
    )
    return dd.keep_canonical(emb.select("vec_id", "label"), clusters, id_col="vec_id")


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


# pixel function shared (as closed-form SQL) with the Python synthesizer:
# R=(id*7+x*13+y*31)%256, G=(id*3+x*5+y*11)%256, B=(id+x+y)%256; checksum
# weight = (y*W + x + 1); dims w=8+(id*7)%57, h=8+(id*11)%41. The SQL
# oracle never touches the codec — a checksum match proves the Python
# decode(encode(pixels)) path reproduced every pixel at every position.
def _pix_sql(i: str, x: str, y: str) -> str:
    return (
        f"((({i})*7 + ({x})*13 + ({y})*31) % 256"
        f" + 2*((({i})*3 + ({x})*5 + ({y})*11) % 256)"
        f" + 4*((({i}) + ({x}) + ({y})) % 256))"
    )


@register(
    "multimodal_features",
    f"""
    WITH dims AS (
      SELECT doc_id::BIGINT AS id, 8 + (doc_id*7) % 57 AS w, 8 + (doc_id*11) % 41 AS h
      FROM documents
    ), ys AS (
      SELECT id, w, h, unnest(generate_series(0, h - 1)) AS y FROM dims
    ), cells AS (
      SELECT id, w, h, y, unnest(generate_series(0, w - 1)) AS x FROM ys
    ), px AS (
      SELECT id, w, h,
             sum((y*w + x + 1) * {_pix_sql("id", "x", "y")})::BIGINT AS cks
      FROM cells
      GROUP BY 1, 2, 3
    )
    SELECT id AS media_id,
           (54 + h * ((3*w + 3) // 4 * 4))::BIGINT AS n_bytes,
           'bmp' AS format, w::INT AS width, h::INT AS height,
           cks AS pix_checksum
    FROM px
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image feature extraction (operators/multimodal.py): synthesize
    one deterministic BMP per document id in a distributed Arrow kernel,
    then decode it for real (pure-stdlib codec) and report byte size,
    dimensions, and an exact position-weighted pixel checksum. The oracle
    recomputes n_bytes from the BMP layout formula (54-byte header +
    4-byte-padded rows) and the checksum from the pixel closed form — no
    codec on the oracle side, so agreement proves the decode is
    pixel-exact."""
    from olake_spark.operators.multimodal import extract_features, synthesize_images

    ids = table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("media_id")
    )
    media = synthesize_images(ids, fmt="bmp")
    return extract_features(media).drop("content_hash")


@register(
    "multimodal_decode_resize",
    f"""
    WITH dims AS (
      SELECT doc_id::BIGINT AS id, 8 + (doc_id*7) % 57 AS w, 8 + (doc_id*11) % 41 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS fmt
      FROM documents WHERE doc_id % 7 = 0
    ), oys AS (
      SELECT id, w, h, unnest(generate_series(0, h - 1)) AS y FROM dims
    ), ocells AS (
      SELECT id, w, h, y, unnest(generate_series(0, w - 1)) AS x FROM oys
    ), orig AS (
      SELECT id, sum((y*w + x + 1) * {_pix_sql("id", "x", "y")})::BIGINT AS cks
      FROM ocells GROUP BY 1
    ), res AS (
      SELECT d.id,
             sum((gy.y*24 + gx.x + 1) *
                 {_pix_sql("d.id", "(gx.x*d.w)//24", "(gy.y*d.h)//16")})::BIGINT AS cks
      FROM dims d,
           generate_series(0, 15) gy(y),
           generate_series(0, 23) gx(x)
      GROUP BY 1
    )
    SELECT d.id AS media_id, d.fmt, d.w::INT AS orig_w, d.h::INT AS orig_h,
           o.cks AS orig_checksum,
           24::INT AS res_w, 16::INT AS res_h, r.cks AS res_checksum
    FROM dims d JOIN orig o ON d.id = o.id JOIN res r ON d.id = r.id
    """,
)
def multimodal_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal image pipeline, pixel-verified cross-engine:
    synthesize mixed BMP/PNG images → decode (real codec) → exact
    nearest-neighbor resize to 24×16 → re-encode in the same format →
    decode AGAIN and checksum. The oracle computes both checksums purely
    from the pixel closed form and the NN index map (src = out*in//24),
    so a hash match proves decode→resize→encode→decode reproduced every
    pixel of every image in both formats. All stages are Arrow-batched
    ``mapInPandas`` kernels over id-derived data — no shuffle until the
    final join on the unique media_id."""
    from olake_spark.operators.multimodal import (
        extract_features,
        resize_images,
        synthesize_images,
    )

    ids = (
        table(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("long").alias("media_id"))
        .filter(F.col("media_id") % 7 == 0)
    )
    media = synthesize_images(ids)
    orig = extract_features(media).select(
        "media_id",
        F.col("format").alias("fmt"),
        F.col("width").alias("orig_w"),
        F.col("height").alias("orig_h"),
        F.col("pix_checksum").alias("orig_checksum"),
    )
    resized = extract_features(resize_images(media, 24, 16)).select(
        "media_id",
        F.col("width").alias("res_w"),
        F.col("height").alias("res_h"),
        F.col("pix_checksum").alias("res_checksum"),
    )
    return orig.join(resized, "media_id")


@register(
    "multimodal_video_frames",
    f"""
    WITH params AS (
      SELECT doc_id::BIGINT AS id,
             2 + doc_id % 4 AS nf,
             8 + (doc_id*5) % 17 AS w,
             8 + (doc_id*3) % 13 AS h
      FROM documents WHERE doc_id % 9 = 0
    ), frames AS (
      SELECT id, nf, w, h, unnest(generate_series(0, nf - 1)) AS t FROM params
    ), sampled AS (
      SELECT * FROM frames WHERE t % 2 = 0
    ), ys AS (
      SELECT id, nf, w, h, t, id*131 + 7*t AS seed,
             unnest(generate_series(0, h - 1)) AS y
      FROM sampled
    ), cells AS (
      SELECT id, nf, w, h, t, seed, y, unnest(generate_series(0, w - 1)) AS x
      FROM ys
    )
    SELECT id AS media_id, nf::INT AS n_frames, t::INT AS frame_idx,
           w::INT AS width, h::INT AS height,
           sum((y*w + x + 1) * {_pix_sql("seed", "x", "y")})::BIGINT AS pix_checksum
    FROM cells
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling (operators/multimodal.py sample_frames):
    synthesize APNG clips (real animated-PNG encodes, one independent
    zlib stream per frame), decode every 2nd frame, and checksum its
    pixels. The oracle computes frame counts, dims, and per-frame
    checksums purely from the frame-seed pixel closed form — agreement
    proves the container walk + per-frame DEFLATE decode + unfilter
    reproduced every pixel of every sampled frame. This makes all three
    modalities (image / audio / video) REAL decode paths under the
    exact-value gate."""
    from olake_spark.operators.multimodal import sample_frames, synthesize_videos

    ids = (
        table(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("long").alias("media_id"))
        .filter(F.col("media_id") % 9 == 0)
    )
    return sample_frames(synthesize_videos(ids), every_n=2)


# audio sample closed form: s(i) = ((id*31 + i*17) % 4001) - 2000;
# n = 800 + (id*37) % 1600; rate = 8k (even id) / 16k (odd);
# WAV bytes = 44 + 2n; decimation by 3 keeps indices 3i'
def _snd_sql(i: str, x: str) -> str:
    return f"((({i})*31 + ({x})*17) % 4001 - 2000)"


@register(
    "multimodal_audio_decode",
    f"""
    WITH params AS (
      SELECT doc_id::BIGINT AS id,
             800 + (doc_id*37) % 1600 AS n,
             CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS rate
      FROM documents WHERE doc_id % 5 = 0
    ), idx AS (
      SELECT id, n, rate, unnest(generate_series(0, n - 1)) AS i FROM params
    ), feats AS (
      SELECT id,
             max(abs({_snd_sql("id", "i")}))::INT AS peak,
             sum(abs({_snd_sql("id", "i")}))::BIGINT AS sum_abs,
             sum((i + 1) * {_snd_sql("id", "i")})::BIGINT AS sample_checksum
      FROM idx GROUP BY id
    ), ridx AS (
      SELECT id, n, unnest(generate_series(0, (n + 2) // 3 - 1)) AS j FROM params
    ), rfeats AS (
      SELECT id, sum((j + 1) * {_snd_sql("id", "j*3")})::BIGINT AS res_checksum
      FROM ridx GROUP BY id
    )
    SELECT p.id AS media_id, (44 + 2*p.n)::BIGINT AS n_bytes,
           p.rate::INT AS sample_rate, p.n::BIGINT AS n_samples,
           f.peak, f.sum_abs, f.sample_checksum,
           (p.rate // 3)::INT AS res_rate, ((p.n + 2) // 3)::BIGINT AS res_n_samples,
           r.res_checksum
    FROM params p JOIN feats f ON p.id = f.id JOIN rfeats r ON p.id = r.id
    """,
)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL audio pipeline, sample-verified cross-engine: synthesize
    RIFF PCM16 clips (real stdlib encode) → decode and feature-extract
    (peak, exact Σ|s|, position-weighted checksum) → decimate ×3 →
    re-encode → decode AGAIN. The oracle computes every number from the
    sample closed form and the decimation index map — no codec on the
    oracle side, so agreement proves decode→resample→encode→decode is
    sample-exact for every clip. Arrow-batched kernels, one join on the
    unique media id."""
    from olake_spark.operators.multimodal import (
        extract_audio_features,
        resample_audio,
        synthesize_audio,
    )

    ids = (
        table(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("long").alias("media_id"))
        .filter(F.col("media_id") % 5 == 0)
    )
    media = synthesize_audio(ids)
    orig = extract_audio_features(media).select(
        "media_id", "n_bytes", "sample_rate", "n_samples",
        "peak", "sum_abs", "sample_checksum",
    )
    res = extract_audio_features(resample_audio(media, 3)).select(
        "media_id",
        F.col("sample_rate").alias("res_rate"),
        F.col("n_samples").alias("res_n_samples"),
        F.col("sample_checksum").alias("res_checksum"),
    )
    return orig.join(res, "media_id")


# integer luma for the dHash oracle: gray = (299R + 587G + 114B) // 1000
# over the same pixel closed form the synthesizer uses
def _gray_sql(seed: str, x: str, y: str) -> str:
    r = f"((({seed})*7 + ({x})*13 + ({y})*31) % 256)"
    g = f"((({seed})*3 + ({x})*5 + ({y})*11) % 256)"
    b = f"((({seed}) + ({x}) + ({y})) % 256)"
    return f"((299*{r} + 587*{g} + 114*{b}) // 1000)"


# assemble 64 hash bits into a SIGNED BIGINT (two's-complement wrap via
# HUGEINT) so the oracle's value equals Spark's long bit-for-bit
def _bits_wrap(pos: str) -> str:
    s = f"sum(bit::HUGEINT * (1::HUGEINT << ({pos})))"
    return (
        f"CASE WHEN {s} >= 9223372036854775808::HUGEINT"
        f" THEN ({s} - 18446744073709551616::HUGEINT)::BIGINT"
        f" ELSE {s}::BIGINT END"
    )


_DHASH_WRAP = _bits_wrap("y*8 + x")


@register(
    "image_dhash",
    f"""
    WITH dims AS (
      SELECT doc_id::BIGINT AS id, 8 + (doc_id*7) % 57 AS w, 8 + (doc_id*11) % 41 AS h
      FROM documents WHERE doc_id % 11 = 0
    ), bits AS (
      SELECT d.id, gy.y, gx.x,
             CASE WHEN {_gray_sql("d.id", "(((gx.x+1)*d.w)//9)", "((gy.y*d.h)//8)")}
                   > {_gray_sql("d.id", "((gx.x*d.w)//9)", "((gy.y*d.h)//8)")}
                  THEN 1 ELSE 0 END AS bit
      FROM dims d, generate_series(0, 7) gy(y), generate_series(0, 7) gx(x)
    )
    SELECT id AS media_id, {_DHASH_WRAP} AS dhash
    FROM bits GROUP BY id
    """,
)
def image_dhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit perceptual difference hash (dHash — the public image
    near-dup key) computed by REAL decode: synthesize mixed BMP/PNG
    images, decode them with the stdlib codec, integer-luma them, NN
    resample to 9x8, and compare neighboring cells into a signed 64-bit
    hash. The oracle rebuilds every bit from the pixel closed form and
    assembles the same two's-complement BIGINT — agreement pins all 64
    bits of every image's hash across both engines and both formats."""
    from olake_spark.operators.multimodal import image_dhash, synthesize_images

    ids = (
        table(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("long").alias("media_id"))
        .filter(F.col("media_id") % 11 == 0)
    )
    return image_dhash(synthesize_images(ids))


@register(
    "image_phash_dedup",
    f"""
    WITH dims AS (
      SELECT doc_id::BIGINT AS id, 8 + (doc_id*7) % 57 AS w, 8 + (doc_id*11) % 41 AS h
      FROM documents WHERE doc_id % 6 = 0
    ), ob AS (
      SELECT d.id, gy.y, gx.x,
             CASE WHEN {_gray_sql("d.id", "(((gx.x+1)*d.w)//9)", "((gy.y*d.h)//8)")}
                   > {_gray_sql("d.id", "((gx.x*d.w)//9)", "((gy.y*d.h)//8)")}
                  THEN 1 ELSE 0 END AS bit
      FROM dims d, generate_series(0, 7) gy(y), generate_series(0, 7) gx(x)
    ), cb AS (
      -- the 32x24-resized copy: dHash grid -> copy pixel -> original
      -- pixel, both floor maps composed explicitly (never simplified away)
      SELECT d.id + 100000000 AS id, gy.y, gx.x,
             CASE WHEN {_gray_sql("d.id", "((((((gx.x+1)*32)//9))*d.w)//32)", "((((gy.y*24)//8)*d.h)//24)")}
                   > {_gray_sql("d.id", "(((((gx.x*32)//9))*d.w)//32)", "((((gy.y*24)//8)*d.h)//24)")}
                  THEN 1 ELSE 0 END AS bit
      FROM dims d, generate_series(0, 7) gy(y), generate_series(0, 7) gx(x)
    ), all_h AS (
      SELECT id, {_DHASH_WRAP} AS dhash FROM ob GROUP BY id
      UNION ALL
      SELECT id, {_DHASH_WRAP} AS dhash FROM cb GROUP BY id
    )
    SELECT a.id AS id_a, b.id AS id_b,
           bit_count(xor(a.dhash, b.dhash))::INT AS hamming
    FROM all_h a JOIN all_h b ON a.id < b.id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
    """,
)
def image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup end-to-end: synthesize a corpus, plant a
    rescaled (32x24) copy of every image under a shifted id, decode ALL
    payloads for real, dHash them, and find every pair within Hamming
    distance 6 via the pigeonhole band join (8 byte-bands — lossless for
    hamming < 8, so Spark's banded candidate generation must equal the
    oracle's brute-force all-pairs scan exactly). Demonstrates the
    standard image near-dup pipeline (decode -> dHash -> banded Hamming
    join) with scale-correct shape: one corpus shuffle on (band, value),
    no all-pairs comparison on the Spark side."""
    from olake_spark.operators.multimodal import (
        image_dhash,
        image_near_dups,
        resize_images,
        synthesize_images,
    )

    ids = (
        table(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("long").alias("media_id"))
        .filter(F.col("media_id") % 6 == 0)
    )
    orig = synthesize_images(ids)
    copies = resize_images(orig, 32, 24).withColumn(
        "media_id", F.col("media_id") + F.lit(100000000)
    )
    hashes = image_dhash(orig.unionByName(copies))
    return image_near_dups(hashes, max_hamming=6)


@register(
    "media_incremental_dedup",
    f"""
    WITH dims AS (
      SELECT doc_id::BIGINT AS id, 8 + (doc_id*7) % 57 AS w, 8 + (doc_id*11) % 41 AS h
      FROM documents WHERE doc_id % 6 = 0
    ), ib AS (  -- corpus index: originals
      SELECT d.id, gy.y, gx.x,
             CASE WHEN {_gray_sql("d.id", "(((gx.x+1)*d.w)//9)", "((gy.y*d.h)//8)")}
                   > {_gray_sql("d.id", "((gx.x*d.w)//9)", "((gy.y*d.h)//8)")}
                  THEN 1 ELSE 0 END AS bit
      FROM dims d, generate_series(0, 7) gy(y), generate_series(0, 7) gx(x)
    ), idx AS (SELECT id, {_DHASH_WRAP} AS dhash FROM ib GROUP BY id),
    cdims AS (
      SELECT doc_id::BIGINT AS id, 8 + (doc_id*7) % 57 AS w, 8 + (doc_id*11) % 41 AS h
      FROM documents WHERE doc_id % 12 = 0
    ), cb AS (  -- new batch part 1: rescaled copies of indexed originals
      SELECT d.id + 100000000 AS id, gy.y, gx.x,
             CASE WHEN {_gray_sql("d.id", "((((((gx.x+1)*32)//9))*d.w)//32)", "((((gy.y*24)//8)*d.h)//24)")}
                   > {_gray_sql("d.id", "(((((gx.x*32)//9))*d.w)//32)", "((((gy.y*24)//8)*d.h)//24)")}
                  THEN 1 ELSE 0 END AS bit
      FROM cdims d, generate_series(0, 7) gy(y), generate_series(0, 7) gx(x)
    ), fdims AS (  -- new batch part 2: genuinely fresh images
      SELECT doc_id::BIGINT + 500000000 AS id,
             8 + ((doc_id + 500000000)*7) % 57 AS w,
             8 + ((doc_id + 500000000)*11) % 41 AS h
      FROM documents WHERE doc_id % 6 = 0
    ), fb AS (
      SELECT d.id, gy.y, gx.x,
             CASE WHEN {_gray_sql("d.id", "(((gx.x+1)*d.w)//9)", "((gy.y*d.h)//8)")}
                   > {_gray_sql("d.id", "((gx.x*d.w)//9)", "((gy.y*d.h)//8)")}
                  THEN 1 ELSE 0 END AS bit
      FROM fdims d, generate_series(0, 7) gy(y), generate_series(0, 7) gx(x)
    ), newh AS (
      SELECT id, {_DHASH_WRAP} AS dhash FROM cb GROUP BY id
      UNION ALL
      SELECT id, {_DHASH_WRAP} AS dhash FROM fb GROUP BY id
    )
    SELECT n.id AS media_id, n.dhash
    FROM newh n
    WHERE NOT EXISTS (
      SELECT 1 FROM idx i WHERE bit_count(xor(n.dhash, i.dhash)) <= 6
    )
    """,
)
def media_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time media dedup against a persisted perceptual index
    (operators/multimodal.py incremental_phash_dedup — the media twin of
    incremental MinHash dedup): the corpus's dHash index meets a new
    batch that is half rescaled copies of indexed images, half genuinely
    fresh images. The banded batch-x-index join (cost ∝ batch, lossless
    for Hamming < 8) drops the copies; the fresh images survive. The
    oracle brute-forces NOT EXISTS over every (new, index) pair — the
    surviving set and every survivor's 64-bit hash must match exactly."""
    from olake_spark.operators.multimodal import (
        image_dhash,
        incremental_phash_dedup,
        resize_images,
        synthesize_images,
    )

    docs = table(spark, sf_dir, "documents")
    idx_ids = docs.select(F.col("doc_id").cast("long").alias("media_id")).filter(
        F.col("media_id") % 6 == 0
    )
    index = image_dhash(synthesize_images(idx_ids))
    copy_ids = idx_ids.filter(F.col("media_id") % 12 == 0)
    copies = resize_images(synthesize_images(copy_ids), 32, 24).withColumn(
        "media_id", F.col("media_id") + F.lit(100000000)
    )
    fresh = synthesize_images(
        idx_ids.select((F.col("media_id") + F.lit(500000000)).alias("media_id"))
    )
    new_hashes = image_dhash(copies.unionByName(fresh))
    return incremental_phash_dedup(new_hashes, index, max_hamming=6)


@register(
    "webdataset_ingest",
    """
    SELECT (doc_id // 8)::BIGINT AS shard_id,
           printf('%08d', doc_id) AS key,
           md5('doc-' || doc_id || ':' || repeat('ab', doc_id % 17)) AS txt_md5,
           length('doc-' || doc_id || ':' || repeat('ab', doc_id % 17))::BIGINT
             AS txt_size,
           (doc_id % 10)::BIGINT AS cls
    FROM documents
    """,
)
def webdataset_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset tar-shard ingest end-to-end (sources/webdataset.py):
    build REAL POSIX tar shards (8 docs per shard, {key}.txt + {key}.cls
    members, stdlib tarfile), then walk every shard and group members
    into training samples INSIDE the shard kernel — zero shuffle after
    the shard build, because the format guarantees samples never span
    shards. The oracle recomputes every sample's key, text md5/size, and
    label from the member closed forms — agreement proves the tar
    encode -> walk -> sample-grouping pipeline is byte-exact."""
    from olake_spark.sources.webdataset import (
        group_samples,
        synthesize_tar_shards,
    )

    ids = table(spark, sf_dir, "documents").select("doc_id")
    return group_samples(synthesize_tar_shards(ids, docs_per_shard=8))


@register(
    "video_phash_dedup",
    f"""
    WITH params AS (
      SELECT doc_id::BIGINT AS id,
             2 + doc_id % 4 AS nf,
             8 + (doc_id*5) % 17 AS w,
             8 + (doc_id*3) % 13 AS h
      FROM documents WHERE doc_id % 8 = 0
    ), seeds AS (
      SELECT id, w, h, id*131 + 7*(nf//2) AS seed FROM params
    ), ob AS (
      SELECT s.id, gy.y, gx.x,
             CASE WHEN {_gray_sql("s.seed", "(((gx.x+1)*s.w)//9)", "((gy.y*s.h)//8)")}
                   > {_gray_sql("s.seed", "((gx.x*s.w)//9)", "((gy.y*s.h)//8)")}
                  THEN 1 ELSE 0 END AS bit
      FROM seeds s, generate_series(0, 7) gy(y), generate_series(0, 7) gx(x)
    ), cb AS (
      SELECT s.id + 100000000 AS id, gy.y, gx.x,
             CASE WHEN {_gray_sql("s.seed", "((((((gx.x+1)*32)//9))*s.w)//32)", "((((gy.y*24)//8)*s.h)//24)")}
                   > {_gray_sql("s.seed", "(((((gx.x*32)//9))*s.w)//32)", "((((gy.y*24)//8)*s.h)//24)")}
                  THEN 1 ELSE 0 END AS bit
      FROM seeds s, generate_series(0, 7) gy(y), generate_series(0, 7) gx(x)
    ), all_h AS (
      SELECT id, {_DHASH_WRAP} AS vfp FROM ob GROUP BY id
      UNION ALL
      SELECT id, {_DHASH_WRAP} AS vfp FROM cb GROUP BY id
    )
    SELECT a.id AS id_a, b.id AS id_b, a.vfp AS vfp_a,
           bit_count(xor(a.vfp, b.vfp))::INT AS hamming
    FROM all_h a JOIN all_h b ON a.id < b.id
    WHERE bit_count(xor(a.vfp, b.vfp)) <= 6
    """,
)
def video_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual VIDEO dedup — the triad is complete (image dHash, audio
    energy fingerprint, video keyframe hash): synthesize APNG clips,
    plant a per-frame-rescaled (32x24) copy of each under a shifted id,
    decode only the MIDDLE frame of every clip (selective stream decode),
    dHash it, and find pairs within Hamming 6 via the lossless 8-band
    join. The oracle recomputes both keyframe hashes from the frame-seed
    pixel closed form (the copy through the explicitly composed floor
    maps) and brute-forces all pairs — membership plus all 64 bits of
    every paired clip's fingerprint are pinned cross-engine."""
    from olake_spark.operators.multimodal import (
        image_near_dups,
        resize_videos,
        synthesize_videos,
        video_fingerprint,
    )

    ids = (
        table(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("long").alias("media_id"))
        .filter(F.col("media_id") % 8 == 0)
    )
    media = synthesize_videos(ids)
    copies = resize_videos(media, 32, 24).withColumn(
        "media_id", F.col("media_id") + F.lit(100000000)
    )
    fps = video_fingerprint(media.unionByName(copies)).select("media_id", "vfp")
    # keep_hashes avoids a second full decode pass just to re-attach vfp_a
    pairs = image_near_dups(fps, hash_col="vfp", max_hamming=6, keep_hashes=True)
    return pairs.select("id_a", "id_b", F.col("h_a").alias("vfp_a"), "hamming")


@register(
    "audio_fp_dedup",
    f"""
    WITH params AS (
      SELECT doc_id::BIGINT AS id, 800 + (doc_id*37) % 1600 AS n
      FROM documents WHERE doc_id % 4 = 0
    ), idx AS (
      SELECT id, n, unnest(generate_series(0, n - 1)) AS i FROM params
    ), eo AS (
      SELECT id, (i*65)//n AS w,
             sum(abs({_snd_sql("id", "i")}))::BIGINT AS e
      FROM idx GROUP BY 1, 2
    ), ec AS (
      SELECT id + 100000000 AS id, (i*65)//n AS w,
             sum(abs(3 * ({_snd_sql("id", "i")})))::BIGINT AS e
      FROM idx GROUP BY 1, 2
    ), eall AS (
      SELECT * FROM eo UNION ALL SELECT * FROM ec
    ), bits AS (
      SELECT a.id, a.w AS pos,
             CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
      FROM eall a JOIN eall b ON a.id = b.id AND b.w = a.w + 1
      WHERE a.w < 64
    ), fps AS (
      SELECT id, {_bits_wrap("pos")} AS afp FROM bits GROUP BY id
    )
    SELECT a.id AS id_a, b.id AS id_b, a.afp AS afp_a,
           bit_count(xor(a.afp, b.afp))::INT AS hamming
    FROM fps a JOIN fps b ON a.id < b.id
    WHERE bit_count(xor(a.afp, b.afp)) <= 6
    """,
)
def audio_fp_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual audio dedup — near-dup keys now span all three
    modalities: synthesize WAV clips, plant a 3x-amplified re-encode of
    each under a shifted id, decode everything for real, compute the
    64-bit energy fingerprint (65 windows by w=(i*65)//n, bit =
    energy[w+1] > energy[w]; amplitude-scale invariant by construction),
    and find pairs within Hamming 6 via the same lossless 8-band
    pigeonhole join as the image family. The oracle recomputes both
    fingerprints from the sample closed form (the copy's energies from
    scratch with the explicit 3x term, never the algebraic shortcut) and
    brute-forces all pairs — pair membership AND all 64 bits of every
    paired clip's fingerprint are pinned cross-engine."""
    from olake_spark.operators.multimodal import (
        amplify_audio,
        audio_fingerprint,
        image_near_dups,
        synthesize_audio,
    )

    ids = (
        table(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("long").alias("media_id"))
        .filter(F.col("media_id") % 4 == 0)
    )
    media = synthesize_audio(ids)
    copies = amplify_audio(media, 3).withColumn(
        "media_id", F.col("media_id") + F.lit(100000000)
    )
    fps = audio_fingerprint(media.unionByName(copies))
    # keep_hashes: the band join already carries each side's fingerprint,
    # so no second decode pass / re-join is needed to surface afp_a
    pairs = image_near_dups(fps, hash_col="afp", max_hamming=6, keep_hashes=True)
    return pairs.select("id_a", "id_b", F.col("h_a").alias("afp_a"), "hamming")


# ---------------------------------------------------------------------------
# deterministic sampling (hash-threshold family)
# ---------------------------------------------------------------------------

_BUCKET_SQL = "('0x' || substring(md5({x}),1,15))::BIGINT"
_HS = 16**15


@register(
    "sample_stratified",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {_BUCKET_SQL.format(x="doc_id::VARCHAR")} <
      CASE lang WHEN 'en' THEN {int(0.5 * _HS)}
                WHEN 'fr' THEN {int(0.25 * _HS)}
                ELSE {int(0.1 * _HS)} END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language hash-threshold sampling (corpus rebalancing): keep 50%
    of en, 25% of fr, 10% of everything else — decided per row by a 60-bit
    md5 bucket, so the sample is stable under re-runs, retries, and any
    repartitioning (none of which holds for seed-based `sample()`)."""
    from olake_spark.operators.sampling import stratified_sample

    docs = table(spark, sf_dir, "documents")
    out = stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5, "fr": 0.25}, default_fraction=0.1
    )
    return out.select("doc_id", "lang")


@register(
    "sample_reservoir_pergroup",
    f"""
    WITH ranked AS (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {_BUCKET_SQL.format(x="doc_id::VARCHAR")}, doc_id
             ) AS rn
      FROM documents
    )
    SELECT lang, doc_id FROM ranked WHERE rn <= 7
    """,
)
def sample_reservoir_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group reservoir: exactly min(k, |group|) uniform
    rows per language — rank by key hash, keep the k smallest (one window
    shuffle on the group key)."""
    from olake_spark.operators.sampling import reservoir_per_group

    docs = table(spark, sf_dir, "documents")
    return reservoir_per_group(docs, ["lang"], "doc_id", k=7).select("lang", "doc_id")


@register(
    "sample_train_test_split",
    f"""
    SELECT CASE WHEN {_BUCKET_SQL.format(x="doc_id::VARCHAR || 'split'")} <
                     {int(0.2 * _HS)} THEN 'test' ELSE 'train' END AS split,
           lang, COUNT(*) AS n
    FROM documents GROUP BY 1, 2
    """,
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 80/20 train/test assignment as a column (salted so the split
    is independent of any sampling done with the bare key), aggregated per
    language to show the split is unbiased across strata."""
    from olake_spark.operators.sampling import split_train_test

    docs = table(spark, sf_dir, "documents")
    return (
        split_train_test(docs, "doc_id", test_fraction=0.2)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------


def _pii_injected_sql() -> str:
    return """
    SELECT doc_id,
           text || CASE doc_id % 4
             WHEN 0 THEN ' contact user' || doc_id || '@example.com for details'
             WHEN 1 THEN ' server 10.0.' || (doc_id % 256)::VARCHAR || '.1 and 555-123-4567'
             WHEN 2 THEN ' ssn 123-45-6789 on file'
             ELSE '' END AS text
    FROM documents
    """


def _pii_counts_sql() -> str:
    from olake_spark.operators.pii import PII_PATTERNS

    cols = ", ".join(
        f"len(regexp_extract_all(text, '{pat}'))::INT AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    return cols


def _pii_redact_sql() -> str:
    from olake_spark.operators.pii import PII_PATTERNS

    expr = "text"
    for name, pat in PII_PATTERNS.items():
        expr = f"regexp_replace({expr}, '{pat}', '[{name.upper()}]', 'g')"
    return expr


@register(
    "pii_scan_redact",
    f"""
    WITH injected AS ({_pii_injected_sql()})
    SELECT doc_id, {_pii_counts_sql()}, {_pii_redact_sql()} AS redacted
    FROM injected
    """,
)
def pii_scan_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents with synthetic identifiers injected
    deterministically (emails, dotted quads + phone, SSNs): per-pattern
    counts via one regexp pass each, then chained redaction to [TYPE]
    placeholders — identical regexes on both engines (dialect-portable
    subset: no lookarounds/backrefs)."""
    from olake_spark.operators.pii import pii_counts, redact_pii

    docs = table(spark, sf_dir, "documents")
    injected = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 4 == 0,
                   F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"),
                            F.lit("@example.com for details")))
            .when(F.col("doc_id") % 4 == 1,
                  F.concat(F.lit(" server 10.0."), (F.col("doc_id") % 256).cast("string"),
                           F.lit(".1 and 555-123-4567")))
            .when(F.col("doc_id") % 4 == 2, F.lit(" ssn 123-45-6789 on file"))
            .otherwise(F.lit("")),
        ),
    )
    counted = pii_counts(injected, "text")
    redacted = redact_pii(counted, "text", out_col="redacted")
    n_cols = [F.col(f"n_{name}").cast("int").alias(f"n_{name}")
              for name in ["email", "ipv4", "ssn", "phone"]]
    return redacted.select("doc_id", *n_cols, "redacted")


# ---------------------------------------------------------------------------
# corpus quality: repetition stats, BPE-ish token estimate, decontamination
# ---------------------------------------------------------------------------


@register(
    "text_repetition_stats",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), base AS (
      SELECT doc_id, len(t)::BIGINT AS n_tokens,
             round(CASE WHEN len(t) > 0
                        THEN 1.0 - len(list_distinct(t)) / len(t)::DOUBLE
                        ELSE 0.0 END, 6) AS dup_token_frac
      FROM toks
    ), grams AS (
      SELECT doc_id, n, array_to_string(t[i:i+n-1], ' ') AS gram
      FROM toks, (VALUES (2), (3), (5)) AS ns(n),
           unnest(generate_series(1, len(t) - n + 1)) AS u(i)
      WHERE len(t) >= n
    ), counts AS (
      SELECT doc_id, n, gram, count(*) AS cnt FROM grams GROUP BY 1, 2, 3
    ), per_doc AS (
      SELECT doc_id, n, max(cnt) AS max_cnt,
             sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_cnt
      FROM counts GROUP BY 1, 2
    ), piv AS (
      SELECT doc_id,
             max(CASE WHEN n = 2 THEN max_cnt * 2 END) AS top2_tok,
             max(CASE WHEN n = 3 THEN max_cnt * 3 END) AS top3_tok,
             max(CASE WHEN n = 5 THEN dup_cnt * 5 END) AS dup5_tok
      FROM per_doc GROUP BY 1
    )
    SELECT b.doc_id, b.n_tokens, b.dup_token_frac,
           round(coalesce(top2_tok, 0) / b.n_tokens::DOUBLE, 6) AS top2_frac,
           round(coalesce(top3_tok, 0) / b.n_tokens::DOUBLE, 6) AS top3_frac,
           round(coalesce(dup5_tok, 0) / b.n_tokens::DOUBLE, 6) AS dup5_frac
    FROM base b LEFT JOIN piv USING (doc_id)
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: duplicate-token
    fraction (per-row), top-2/3-gram token coverage, duplicated-5-gram token
    coverage. All shuffles keyed by the unique doc_id."""
    from olake_spark.operators.quality import repetition_stats

    docs = table(spark, sf_dir, "documents")
    return repetition_stats(docs, "doc_id", "text", top_ns=(2, 3), dup_ns=(5,))


_WS_RE = "[ \\t\\n\\r\\f\\x0B]+"  # explicit class: Java \s ∋ VT, RE2 \s ∌ VT


@register(
    "text_bpe_tokens",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{BPE_SQL_RE}'))::BIGINT
             AS n_bpe_tokens,
           len(string_split_regex(trim(text), '{_WS_RE}'))::BIGINT AS n_ws_tokens
    FROM documents
    """,
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-2-pretokenizer-regex token estimate vs whitespace token count —
    the cost-accounting pair a curation pipeline tracks per document. The
    oracle derives from the SAME module constant as the operator (drift
    impossible) and whitespace is the explicit cross-engine class."""
    from olake_spark.operators.quality import with_bpe_token_estimate

    docs = table(spark, sf_dir, "documents")
    df = with_bpe_token_estimate(docs)
    return df.select(
        "doc_id",
        "n_bpe_tokens",
        F.size(F.split(F.trim(F.col("text")), _WS_RE)).cast("long").alias("n_ws_tokens"),
    )


def _bpe_oracle() -> str:
    """Build the real-BPE oracle: the IDENTICAL rank-ordered replace-all
    algorithm as ``operators.bpe.encode_word``, expressed as one nested
    ``replace()`` chain over separator-wrapped symbol strings — no
    recursion, no UDF, runs on the DISTINCT pretoken set only."""
    from olake_spark.operators.bpe import DEFAULT_MERGES, SEP

    re_sql = BPE_SQL_RE  # pretokenizer regex, quotes doubled for SQL
    expr = "regexp_replace(pt, '(?s)(.)', chr(31)||'\\1'||chr(31), 'g')"
    for a, b in DEFAULT_MERGES:
        pat = SEP + a + SEP + SEP + b + SEP
        rep = SEP + a + b + SEP
        expr = f"replace({expr}, '{pat}', '{rep}')"
    return f"""
    WITH docs_f AS (
      SELECT doc_id, replace(text, chr(31), '') AS t
      FROM documents WHERE doc_id % 3 = 0
    ), pre AS (
      SELECT doc_id, regexp_extract_all(t, '{re_sql}') AS pts FROM docs_f
    ), expl AS (
      SELECT doc_id, unnest(pts) AS pt, generate_subscripts(pts, 1) AS pos
      FROM pre
    ), dpt AS (
      SELECT DISTINCT pt FROM expl
    ), enc AS (
      SELECT pt, {expr} AS state FROM dpt
    ), tok AS (
      SELECT pt,
             len(string_split(substr(state, 2, length(state)-2),
                              chr(31)||chr(31)))::BIGINT AS n_toks,
             replace(replace(state, chr(31)||chr(31), ' '), chr(31), '') AS tok_str
      FROM enc
    ), per_doc AS (
      SELECT e.doc_id, count(*)::BIGINT AS n_pretokens,
             sum(t2.n_toks)::BIGINT AS n_bpe_tokens,
             md5(string_agg(t2.tok_str, ' ' ORDER BY e.pos)) AS token_hash
      FROM expl e JOIN tok t2 USING (pt) GROUP BY 1
    )
    SELECT d.doc_id, coalesce(p.n_pretokens, 0) AS n_pretokens,
           coalesce(p.n_bpe_tokens, 0) AS n_bpe_tokens,
           coalesce(p.token_hash, md5('')) AS token_hash
    FROM docs_f d LEFT JOIN per_doc p USING (doc_id)
    """


def _bpe_train_oracle(n_merges: int = 6) -> str:
    """Unrolled distributed-BPE-training oracle: per iteration, adjacent
    weighted pair counts over the wrapped symbol states, deterministic
    argmax (cnt desc, a, b), replace-everywhere — the same single lazy
    plan shape the Spark operator unrolls."""

    def it(i: int) -> str:
        return f"""
    p{i} AS (
      SELECT wt, syms[j] AS a, syms[j+1] AS b FROM (
        SELECT wt, syms, generate_subscripts(syms, 1) AS j FROM (
          SELECT wt, string_split(substr(state, 2, length(state)-2),
                                  chr(31)||chr(31)) AS syms
          FROM s{i-1})
      ) WHERE j < len(syms)
    ),
    b{i} AS (SELECT a, b, sum(wt)::BIGINT AS cnt FROM p{i}
             GROUP BY 1, 2 ORDER BY cnt DESC, a, b LIMIT 1),
    s{i} AS (SELECT replace(st.state,
                    chr(31)||bb.a||chr(31)||chr(31)||bb.b||chr(31),
                    chr(31)||bb.a||bb.b||chr(31)) AS state, st.wt
             FROM s{i-1} st CROSS JOIN b{i} bb)"""

    unions = "\n      UNION ALL ".join(
        f'SELECT {i - 1} AS "rank", a, b, cnt FROM b{i}'
        for i in range(1, n_merges + 1)
    )
    return f"""
    WITH docs_f AS (
      SELECT replace(text, chr(31), '') AS t
      FROM documents WHERE doc_id % 3 = 0
    ), pts AS (
      SELECT pt, count(*)::BIGINT AS wt FROM (
        SELECT unnest(regexp_extract_all(t, '{BPE_SQL_RE}')) AS pt FROM docs_f
      ) GROUP BY pt
    ),
    s0 AS (SELECT regexp_replace(pt, '(?s)(.)', chr(31)||'\\1'||chr(31), 'g') AS state, wt
           FROM pts),
    {','.join(it(i) for i in range(1, n_merges + 1))}
    SELECT * FROM (
      {unions}
    )
    """


@register("bpe_train_merges", _bpe_train_oracle(5))
def bpe_train_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED BPE TRAINING (operators/bpe.py bpe_train_merges): learn
    the corpus's top-5 merges as ONE lazy plan — each iteration's argmax
    is a 1-row broadcast cross join and the merge applies via replace()
    with column arguments, so the data-dependent loop unrolls without any
    driver round-trip (the quantized-k-means trick applied to tokenizer
    training). Training state is one row per DISTINCT pretoken weighted
    by corpus frequency: vocabulary cost, corpus-equivalent result."""
    from olake_spark.operators.bpe import bpe_train_merges

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    return bpe_train_merges(docs, "doc_id", "text", n_merges=5)


@register("text_bpe_encode", _bpe_oracle())
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL merges-driven BPE encoding (operators/bpe.py): per document,
    the exact pretoken count, true BPE token count, and an md5 over the
    full in-order token sequence — the oracle runs the identical
    rank-ordered merge algorithm in pure SQL, so a hash match proves
    token-for-token agreement. Encoding cost is per DISTINCT pretoken
    (vocabulary-sized), not per corpus row."""
    from olake_spark.operators.bpe import bpe_encode

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    return bpe_encode(docs, "doc_id", "text")


@register(
    "decontaminate_overlap",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), grams AS (
      SELECT doc_id, array_to_string(t[i:i+3], ' ') AS gram
      FROM toks, unnest(generate_series(1, len(t) - 3)) AS u(i)
      WHERE len(t) >= 4
    ), bench AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 7
    ), corp AS (
      SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 10 <> 7
    ), hits AS (
      SELECT doc_id, count(*) AS n_shared_ngrams
      FROM corp JOIN bench USING (gram) GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(hits.n_shared_ngrams, 0) AS n_shared_ngrams,
           CASE WHEN coalesce(hits.n_shared_ngrams, 0) > 0 THEN 1 ELSE 0 END AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 7) d
    LEFT JOIN hits USING (doc_id)
    """,
)
def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every tenth document plays the held-out
    eval set; corpus docs are scored by distinct shared word 4-grams via a
    broadcast join against the (small) benchmark n-gram set — the corpus
    side never shuffles its text."""
    from olake_spark.operators.decontam import ngram_overlap

    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    scored = ngram_overlap(corpus, bench, "doc_id", "text", n=4)
    return scored.select(
        "doc_id",
        "n_shared_ngrams",
        F.when(F.col("n_shared_ngrams") > 0, F.lit(1)).otherwise(F.lit(0)).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# URL / domain curation + BM25 keyword scoring
# ---------------------------------------------------------------------------

_URL_INJECT_SQL = """
    SELECT doc_id,
           text || CASE doc_id % 5
             WHEN 0 THEN ' see https://spam' || (doc_id % 3)::VARCHAR
                         || '.junk.example/page' || doc_id::VARCHAR
             WHEN 1 THEN ' docs at http://docs.example.org/guide'
             WHEN 2 THEN ' cdn https://cdn' || (doc_id % 7)::VARCHAR
                         || '.assets-example.net/x and https://spam0.junk.example/x'
             ELSE '' END AS text
    FROM documents
"""


@register(
    "url_domain_stats",
    f"""
    WITH injected AS ({_URL_INJECT_SQL}),
    urls AS (
      SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[^\\s]+')) AS url
      FROM injected
    ), dom AS (
      SELECT doc_id, regexp_extract(url, 'https?://([^/\\s:]+)', 1) AS domain FROM urls
    )
    SELECT domain, count(*) AS n_urls, count(DISTINCT doc_id) AS n_docs,
           CASE WHEN regexp_matches(domain, '(^|\\.)junk\\.example$') THEN 1 ELSE 0 END
             AS blocked
    FROM dom GROUP BY domain
    """,
)
def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain URL/document counts with a blocklist flag, over documents
    with synthetic URLs injected deterministically (same injection SQL shape
    as the PII query). Extraction is per-row regex; the only shuffle is the
    domain aggregation."""
    from olake_spark.operators.urls import domain_stats

    docs = table(spark, sf_dir, "documents")
    injected = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit(" see https://spam"), (F.col("doc_id") % 3).cast("string"),
                         F.lit(".junk.example/page"), F.col("doc_id").cast("string")),
            )
            .when(F.col("doc_id") % 5 == 1, F.lit(" docs at http://docs.example.org/guide"))
            .when(
                F.col("doc_id") % 5 == 2,
                F.concat(F.lit(" cdn https://cdn"), (F.col("doc_id") % 7).cast("string"),
                         F.lit(".assets-example.net/x and https://spam0.junk.example/x")),
            )
            .otherwise(F.lit("")),
        ),
    )
    stats = domain_stats(injected, "doc_id", "text")
    return stats.withColumn(
        "blocked",
        F.when(F.col("domain").rlike(r"(^|\.)junk\.example$"), F.lit(1)).otherwise(F.lit(0)),
    )


_BM25_TERMS = ["spark", "join", "filter", "window"]


def _bm25_oracle() -> str:
    tf_cols = ",\n             ".join(
        f"len(regexp_extract_all(lower(text), '\\b{t}\\b'))::DOUBLE AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_cols = ",\n             ".join(
        f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_{t}" for t in _BM25_TERMS
    )
    score = " + ".join(
        f"ln(1.0 + (n_docs - df_{t} + 0.5) / (df_{t} + 0.5))"
        f" * (tf_{t} * 2.2) / (tf_{t} + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))"
        for t in _BM25_TERMS
    )
    tf_out = ", ".join(f"tf_{t}::BIGINT AS tf_{t}" for t in _BM25_TERMS)
    return f"""
    WITH base AS (
      SELECT doc_id, len({_TOKS})::DOUBLE AS dl,
             {tf_cols}
      FROM documents
    ), stats AS (
      SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl,
             {df_cols}
      FROM base
    )
    SELECT doc_id, dl::BIGINT AS dl, {tf_out},
           round(({score}) * 10000)::BIGINT AS bm25_e4
    FROM base, stats
    """


@register("bm25_keyword_scores", _bm25_oracle())
def bm25_keyword_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance of every document to a fixed seed-term set
    (k1=1.2, b=0.75): per-term tf in one scan, corpus stats as a 1-row
    broadcast, score as a pure column expression (scaled-int for the exact
    hash gate)."""
    from olake_spark.operators.bm25 import bm25_scores

    docs = table(spark, sf_dir, "documents")
    scored = bm25_scores(docs, _BM25_TERMS, "doc_id", "text")
    return scored.withColumn(
        "bm25_e4", F.round(F.col("bm25") * 10000).cast("bigint")
    ).drop("bm25")


# ---------------------------------------------------------------------------
# embedding utilities: L2 norm + int8 quantization
# ---------------------------------------------------------------------------


@register(
    "embedding_quantize_int8",
    """
    WITH m AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS maxabs
      FROM embeddings
    )
    SELECT vec_id,
           CAST(round(maxabs * 10000, 0) AS BIGINT) AS maxabs_e4,
           CAST(to_json(CASE WHEN maxabs > 0
                THEN list_transform(embedding::DOUBLE[],
                                    x -> CAST(round(x * 127.0 / maxabs) AS INT))
                ELSE list_transform(embedding::DOUBLE[], x -> 0) END) AS VARCHAR) AS q_json,
           CAST(round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                      * 10000, 0) AS BIGINT) AS l2_e4
    FROM m
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric max-abs int8 quantization of the embedding column plus the
    L2 norm — per-row higher-order array functions only (no shuffle); the
    4×-smaller int8 vectors are the candidate-generation representation at
    100 TB scale."""
    from olake_spark.operators.embeddings import quantize_int8
    from olake_spark.operators.similarity import _norm

    emb = table(spark, sf_dir, "embeddings")
    qd = quantize_int8(emb, "embedding")

    # arrays don't hash stably across pandas/duckdb bridges (list vs ndarray
    # repr) — serialize to canonical JSON text for the value-hash gate
    return qd.select(
        "vec_id",
        F.round(F.col("scale") * 127.0 * 10000).cast("bigint").alias("maxabs_e4"),
        F.to_json(F.col("q")).alias("q_json"),
        F.round(_norm(F.col("embedding")) * 10000).cast("bigint").alias("l2_e4"),
    )


# ---------------------------------------------------------------------------
# sequence packing / corpus shuffle / mixture sampling (training last-mile)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512
_PACK_SHARDS = 8


@register(
    "pack_sequences",
    f"""
    WITH tok AS (
      SELECT doc_id, len({_TOKS})::BIGINT AS n_tokens,
             {_BUCKET_SQL.format(x="doc_id::VARCHAR || 'pack'")} AS h
      FROM documents
    ), cum AS (
      SELECT doc_id, n_tokens, (h % {_PACK_SHARDS})::INT AS shard,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY h % {_PACK_SHARDS} ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
      FROM tok
    )
    SELECT doc_id, n_tokens, shard,
           (cum_before // {_PACK_BUDGET})::BIGINT AS seq_in_shard,
           (cum_before % {_PACK_BUDGET})::BIGINT AS offset_in_seq,
           (cum_before % {_PACK_BUDGET} + n_tokens > {_PACK_BUDGET}) AS straddles
    FROM cum
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (GPT data-loader shape): documents
    are hash-shuffled into shards, laid head-to-tail, and cut every
    ``budget`` tokens; each doc's sequence index / offset / boundary-straddle
    flag falls out of one prefix-sum window per shard. No global sort, no
    stateful scan — scale is bounded by shard size, which the caller picks."""
    from olake_spark.operators.packing import pack_offsets

    docs = tx.with_token_count(table(spark, sf_dir, "documents"))
    return pack_offsets(
        docs, "doc_id", "n_tokens", budget=_PACK_BUDGET, n_shards=_PACK_SHARDS
    ).select("doc_id", "n_tokens", "shard", "seq_in_shard", "offset_in_seq", "straddles")


@register(
    "corpus_shuffle",
    f"""
    WITH t AS (
      SELECT doc_id, {_BUCKET_SQL.format(x="doc_id::VARCHAR || 'shuffle'")} AS h
      FROM documents
    )
    SELECT doc_id, (h % {_PACK_SHARDS})::INT AS shard,
           (ROW_NUMBER() OVER (
              PARTITION BY h % {_PACK_SHARDS} ORDER BY h, doc_id) - 1)::BIGINT
             AS pos_in_shard
    FROM t
    """,
)
def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global shuffle: (shard, pos_in_shard) addresses decided
    only by the doc-id hash — reading shards in order replays the identical
    corpus order on any cluster size (resumable training epochs)."""
    from olake_spark.operators.packing import deterministic_shuffle

    docs = table(spark, sf_dir, "documents")
    return deterministic_shuffle(docs, "doc_id", n_shards=_PACK_SHARDS).select(
        "doc_id", "shard", "pos_in_shard"
    )


_MIX_WEIGHTS = {"en": 0.5, "zh": 0.15, "es": 0.15, "de": 0.1, "fr": 0.1}


def _mixture_oracle() -> str:
    values = ", ".join(f"('{s}', {w!r})" for s, w in _MIX_WEIGHTS.items())
    return f"""
    WITH wts(lang, wt) AS (VALUES {values}),
    counts AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ), j AS (
      SELECT c.lang, c.n, w.wt FROM counts c JOIN wts w USING (lang)
    ), cap AS (SELECT min(n / wt) AS c FROM j),
    fr AS (
      SELECT lang, least(1.0, wt * (SELECT c FROM cap) / n) AS f FROM j
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN fr ON d.lang = fr.lang
    WHERE {_BUCKET_SQL.format(x="d.doc_id::VARCHAR || 'mix'")} <
          CAST(floor(f * {float(_HS)!r}) AS BIGINT)
    """


@register("mixture_weighted_sample", _mixture_oracle())
def mixture_weighted_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample a multi-source corpus to target mixture weights: the
    largest achievable corpus keeps fraction min(1, w_s*C/n_s) per stratum
    (C = min n_s/w_s), decided per row by hash threshold. One tiny count
    agg + broadcast join — the scan side never shuffles."""
    from olake_spark.operators.sampling import mixture_weighted_sample

    docs = table(spark, sf_dir, "documents")
    return mixture_weighted_sample(docs, "doc_id", "lang", _MIX_WEIGHTS).select(
        "doc_id", "lang"
    )


@register(
    "curation_pipeline",
    f"""
    WITH feat AS (
      SELECT doc_id, lang, text,
             length(text)::DOUBLE AS n_chars,
             len({_TOKS})::DOUBLE AS n_tokens,
             (length(text) - length(regexp_replace(text, {_PUNCT_SQL}, '', 'g')))::DOUBLE AS n_punct,
             len(list_filter({_TOKS}, x -> list_contains({{stops}}, x)))::DOUBLE AS n_stop
      FROM documents
    ), scored AS (
      SELECT doc_id, lang, text, n_tokens::BIGINT AS n_tokens,
             round(CASE WHEN n_chars IS NULL THEN 0.0 ELSE
                   (least(n_chars/500.0, 1.0)
                    + (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END)
                    + (1.0 - CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END)) / 3.0 END,
                   6) AS quality_score
      FROM feat
    ), kept AS (
      SELECT * FROM scored WHERE quality_score >= 0.5 AND n_tokens >= 5
    ), uniq AS (
      SELECT * FROM kept
      QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5({_NORM}))
    ), wts(lang, wt) AS (VALUES {{mix_values}}),
    counts AS (SELECT lang, count(*) AS n FROM uniq GROUP BY lang),
    j AS (SELECT c.lang, c.n, w.wt FROM counts c JOIN wts w USING (lang)),
    cap AS (SELECT min(n / wt) AS c FROM j),
    fr AS (SELECT lang, least(1.0, wt * (SELECT c FROM cap) / n) AS f FROM j),
    mixed AS (
      SELECT u.doc_id, u.lang, u.n_tokens,
             {_BUCKET_SQL.format(x="u.doc_id::VARCHAR || 'pack'")} AS h
      FROM uniq u JOIN fr ON u.lang = fr.lang
      WHERE {_BUCKET_SQL.format(x="u.doc_id::VARCHAR || 'mix'")} <
            CAST(floor(f * {float(_HS)!r}) AS BIGINT)
    ), cum AS (
      SELECT doc_id, lang, n_tokens, (h % {_PACK_SHARDS})::INT AS shard,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY h % {_PACK_SHARDS} ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
      FROM mixed
    )
    SELECT doc_id, lang, n_tokens, shard,
           (cum_before // {_PACK_BUDGET})::BIGINT AS seq_in_shard,
           (cum_before % {_PACK_BUDGET})::BIGINT AS offset_in_seq
    FROM cum
    """.replace("{stops}", _stop_list())
       .replace("{mix_values}", ", ".join(f"('{s}', {w!r})" for s, w in _MIX_WEIGHTS.items())),
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole corpus-curation last mile as ONE composed lazy plan:
    quality gate → exact dedup (min-id survivor per fingerprint) → weighted
    mixture rebalance → sequence packing. Four operators, four narrow
    shuffles total (fingerprint window, strata count, broadcast-filtered
    mixture, shard window) — Catalyst pipelines the rest, which is the
    point of declaring each stage as a DataFrame transform instead of
    materializing between steps."""
    from olake_spark.operators.packing import pack_offsets
    from olake_spark.operators.sampling import mixture_weighted_sample

    docs = tx.with_quality_features(table(spark, sf_dir, "documents"))
    kept = docs.filter((F.col("quality_score") >= 0.5) & (F.col("n_tokens") >= 5))
    uniq = dd.drop_exact_dupes(kept, "doc_id", "text")
    # the mixture stage evaluates its input twice (per-stratum counts +
    # the hash-threshold scan); cache the gate->dedup result so the
    # tokenize/quality/fingerprint-window chain runs once (guide §2.1 — at
    # scale this is "persist the curated corpus", which a production
    # pipeline does anyway before rebalancing). Project to the three
    # columns the mixture/packing stages actually read BEFORE caching —
    # column pruning does not push through a cache boundary, and
    # materializing the full text column costs more than the recompute it
    # saves (guide §5). cache(), NOT localCheckpoint: this query declares
    # zero-jobs-at-construction (test_plans lazy probe) and a lazy
    # checkpoint still materializes its upstream AQE stages at
    # construction time.
    uniq = uniq.select("doc_id", "lang", "n_tokens").cache()
    mixed = mixture_weighted_sample(uniq, "doc_id", "lang", _MIX_WEIGHTS)
    packed = pack_offsets(mixed, "doc_id", "n_tokens", budget=_PACK_BUDGET,
                          n_shards=_PACK_SHARDS)
    return packed.select(
        "doc_id", "lang", "n_tokens", "shard", "seq_in_shard", "offset_in_seq"
    )


# ---------------------------------------------------------------------------
# data-quality audit + histogram profiling
# ---------------------------------------------------------------------------

_HIST_LO, _HIST_HI, _HIST_BINS = 900.0, 105000.0, 16


@register(
    "profile_histogram",
    f"""
    SELECT CAST(least({_HIST_BINS - 1}, greatest(0,
             floor((l_extendedprice::DOUBLE - {_HIST_LO!r}) / {_HIST_HI - _HIST_LO!r}
                   * {_HIST_BINS}))) AS INT) AS bin,
           count(*) AS n
    FROM lineitem WHERE l_extendedprice IS NOT NULL
    GROUP BY 1
    """,
)
def profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-range equi-width histogram of lineitem prices: one groupBy over
    a closed-form bin expression — no sort, no engine-private sketch, so the
    counts are bit-reproducible in ANSI SQL (approx_percentile profiles are
    not). Out-of-range values clamp into the edge bins."""
    from olake_spark.operators.profile import histogram

    li = table(spark, sf_dir, "lineitem")
    return histogram(li, "l_extendedprice", _HIST_LO, _HIST_HI, _HIST_BINS)


@register(
    "audit_pk_health",
    """
    SELECT 'orders' AS relation,
           count(*) AS n_rows,
           count(DISTINCT o_orderkey) AS n_distinct_keys,
           CAST(sum((o_orderkey IS NULL)::BIGINT) AS BIGINT) AS n_null_keys,
           count(o_orderkey) - count(DISTINCT o_orderkey) AS n_excess_rows
    FROM orders
    """,
)
def audit_pk_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key health of a landed table in one aggregation pass: total
    rows, distinct / null / duplicated keys — the check a lake table needs
    because (unlike the reference's source DBs) nothing enforces PKs after
    landing."""
    from olake_spark.operators.audit import audit_keys

    return audit_keys(table(spark, sf_dir, "orders"), ["o_orderkey"], name="orders")


@register(
    "audit_referential",
    """
    SELECT 'lineitem->orders' AS relation,
           (SELECT count(*) FROM lineitem) AS n_rows,
           (SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL) AS n_fk_set,
           (SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL AND NOT EXISTS
              (SELECT 1 FROM orders o WHERE o.o_orderkey = lineitem.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'orders->customer_pruned',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL),
           (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL AND NOT EXISTS
              (SELECT 1 FROM customer c WHERE c.c_custkey % 3 != 0
                 AND c.c_custkey = orders.o_custkey))
    """,
)
def audit_referential_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit via LEFT ANTI joins: lineitem→orders (clean
    by construction) and orders→customer with a third of the customers
    pruned, proving nonzero orphan counting. One shuffle join per relation
    (broadcast when the parent is dim-sized)."""
    from olake_spark.operators.audit import audit_summary

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 != 0)
    return audit_summary(
        [
            ("lineitem->orders", li, o, ["l_orderkey"], ["o_orderkey"]),
            ("orders->customer_pruned", o, c, ["o_custkey"], ["c_custkey"]),
        ]
    )


@register(
    "text_rare_token_ratio",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS t FROM documents
    ), dfreq AS (
      SELECT t, count(DISTINCT doc_id) AS df FROM tok GROUP BY t
    ), rare AS (
      SELECT t FROM dfreq
      WHERE df < floor(0.78 * (SELECT count(*) FROM documents))
    ), rc AS (
      SELECT doc_id, count(*) AS n_rare FROM tok JOIN rare USING (t) GROUP BY doc_id
    )
    SELECT d.doc_id,
           len({_TOKS})::BIGINT AS n_tokens,
           COALESCE(rc.n_rare, 0)::BIGINT AS n_rare,
           CAST(CASE WHEN len({_TOKS}) > 0
                THEN round(COALESCE(rc.n_rare, 0) * 1000000.0 / len({_TOKS}), 0)
                ELSE 0.0 END AS BIGINT) AS rare_ratio_e6
    FROM documents d LEFT JOIN rc USING (doc_id)
    """,
)
def text_rare_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-token occurrence ratio per document (gibberish up, boilerplate
    down): document frequencies from one explode+distinct agg, then a LEFT
    SEMI join of occurrences against only the sub-threshold vocabulary —
    provably skew-free because every join key has df < threshold. The
    corpus-relative threshold rides a broadcast one-row count frame inside
    the plan — building this query triggers ZERO Spark actions (asserted in
    test_plans.py)."""
    from olake_spark.operators.quality import rare_token_ratio

    docs = table(spark, sf_dir, "documents")
    return rare_token_ratio(docs, "doc_id", "text", min_df_fraction=0.78)


@register(
    "text_unigram_info",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
    vocab AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    tot AS (SELECT count(*) AS tt FROM tok),
    scored AS (
      SELECT tok.doc_id, length(bin(tot.tt)) - length(bin(vocab.c)) AS info
      FROM tok JOIN vocab USING (w) CROSS JOIN tot
    ),
    agg AS (
      SELECT doc_id, sum(info)::BIGINT AS info_sum, count(*)::BIGINT AS n_tokens
      FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_tokens, 0)::BIGINT AS n_tokens,
           COALESCE(a.info_sum, 0)::BIGINT AS info_sum,
           CASE WHEN COALESCE(a.n_tokens, 0) > 0
                THEN (1000 * a.info_sum) // a.n_tokens ELSE 0 END::BIGINT
             AS mean_info_e3
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def text_unigram_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram surprisal (operators/quality.py
    unigram_info_score) — the model-free perplexity-filter stand-in:
    info(w) = floor(log2 T) - floor(log2 c_w), exact-integer arithmetic
    (length(bin(n)) - 1) so the score is bit-identical cross-engine under
    any partitioning. High mean = gibberish/OCR noise; near-zero =
    boilerplate."""
    from olake_spark.operators.quality import unigram_info_score

    docs = table(spark, sf_dir, "documents")
    return unigram_info_score(docs, "doc_id", "text")


@register(
    "leakage_safe_split",
    f"""
    SELECT doc_id,
           CASE WHEN {_BUCKET_SQL.format(
               x="md5(" + _NORM + ") || 'content-split'")} <
               {int(0.2 * _HS)} THEN 'test' ELSE 'train' END AS split
    FROM documents
    """,
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-keyed train/test split (operators/sampling.py
    split_by_fingerprint): the split key is md5 of normalized text, so
    byte-identical duplicates can never straddle the split — id-keyed
    splits leak n-1 copies of every duplicated document into eval."""
    from olake_spark.operators.sampling import split_by_fingerprint

    docs = table(spark, sf_dir, "documents")
    return split_by_fingerprint(docs, "text", 0.2).select("doc_id", "split")


def _mixture_tokens_oracle() -> str:
    values = ", ".join(f"('{s}', {w!r})" for s, w in _MIX_WEIGHTS.items())
    return f"""
    WITH wts(lang, wt) AS (VALUES {values}),
    counts AS (
      SELECT lang, sum(len({_TOKS}))::DOUBLE AS n FROM documents GROUP BY lang
    ), j AS (
      SELECT c.lang, c.n, w.wt FROM counts c JOIN wts w USING (lang)
    ), cap AS (SELECT min(n / wt) AS c FROM j),
    fr AS (
      SELECT lang, least(1.0, wt * (SELECT c FROM cap) / n) AS f FROM j
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN fr ON d.lang = fr.lang
    WHERE {_BUCKET_SQL.format(x="d.doc_id::VARCHAR || 'mixtok'")} <
          CAST(floor(f * {float(_HS)!r}) AS BIGINT)
    """


@register("mixture_token_weighted", _mixture_tokens_oracle())
def mixture_token_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling (operators/sampling.py
    mixture_by_tokens) — what a pretraining mix actually targets: weights
    describe each source's share of the TOKEN stream, so long-document
    sources contribute fewer documents for the same share. Per-stratum
    token-mass aggregation + in-plan fraction arithmetic + broadcast join;
    the scan never shuffles."""
    from olake_spark.operators.sampling import mixture_by_tokens

    docs = table(spark, sf_dir, "documents")
    return mixture_by_tokens(docs, "doc_id", "lang", "text", _MIX_WEIGHTS).select(
        "doc_id", "lang"
    )


# positional 5-gram CTEs shared by the two ExactSubstr queries
_SUBSTR_GRAMS = f"""
    toks AS (SELECT doc_id, {_TOKS} AS l FROM documents),
    grams AS (
      SELECT doc_id, l, unnest(generate_series(1, len(l) - 4)) AS p
      FROM toks WHERE len(l) >= 5
    ),
    gh AS (
      SELECT doc_id, p,
        {_H60.format(x="array_to_string(l[p:p+4], ' ')")} AS h
      FROM grams
    )"""

_SUBSTR_ISLANDS = """
    pre AS (
      SELECT doc_id, p, lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
      FROM hits
    ),
    isl AS (
      SELECT doc_id, p,
             sum(CASE WHEN prev IS NULL OR p - prev > 5 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING)
               AS island
      FROM pre
    )"""


@register(
    "dedup_exact_substr_spans",
    f"""
    WITH {_SUBSTR_GRAMS},
    dup AS (SELECT h FROM gh GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT g.doc_id, g.p FROM gh g JOIN dup USING (h)),
    {_SUBSTR_ISLANDS}
    SELECT doc_id, min(p)::INT AS span_start, (max(p)+4)::INT AS span_end,
           (max(p)+4-min(p)+1)::INT AS span_len, count(*) AS n_grams
    FROM isl GROUP BY doc_id, island
    """,
)
def dedup_exact_substr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup, detection half (Lee et al. 2022): every maximal
    run of token positions whose 5-gram occurs in >= 2 distinct documents,
    reported as 1-based spans. The distributed plan is a positional
    inverted index (one shuffle on the gram hash for document frequency,
    one shuffle on doc id for the islands merge; the window sorts only a
    single document's duplicated positions) — the join-friendly
    equivalent of the paper's suffix-array scan. The oracle rebuilds
    identical spans with SQL window islands over the same grams."""
    docs = table(spark, sf_dir, "documents")
    return dd.duplicate_spans(docs, "doc_id", "text", min_len=5, min_docs=2)


@register(
    "dedup_strip_substr",
    f"""
    WITH {_SUBSTR_GRAMS},
    win AS (
      SELECT h, min(doc_id) AS win, count(DISTINCT doc_id) AS df
      FROM gh GROUP BY h
    ),
    hits AS (
      SELECT g.doc_id, g.p FROM gh g JOIN win w USING (h)
      WHERE w.df >= 2 AND g.doc_id != w.win
    ),
    {_SUBSTR_ISLANDS},
    spans AS (
      SELECT doc_id, min(p) AS span_start, max(p)+4 AS span_end
      FROM isl GROUP BY doc_id, island
    ),
    rpos AS (
      SELECT DISTINCT doc_id, p FROM (
        SELECT doc_id, unnest(generate_series(span_start, span_end)) AS p
        FROM spans)
    ),
    tp AS (
      SELECT doc_id, l, unnest(generate_series(1, len(l))) AS p FROM toks
    ),
    kept AS (
      SELECT t.doc_id, t.p, t.l[t.p] AS tok
      FROM tp t LEFT JOIN rpos r ON t.doc_id = r.doc_id AND t.p = r.p
      WHERE r.p IS NULL
    ),
    nrem AS (SELECT doc_id, count(*) AS n_removed FROM rpos GROUP BY doc_id),
    reb AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT n.doc_id, coalesce(r.clean_text, '') AS clean_text, n.n_removed
    FROM nrem n LEFT JOIN reb r USING (doc_id)
    """,
)
def dedup_strip_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup, removal half: delete every cross-document
    duplicated >=5-token span from all but its canonical occurrence (the
    smallest doc_id containing the gram keeps it — deterministic, so both
    engines agree exactly), and return the rewritten documents with their
    removed-token counts. Only changed documents are emitted: at corpus
    scale the cleaned minority is the delta you re-materialize. The
    oracle replays the same winner policy, islands merge, and ordered
    token rebuild in pure SQL."""
    docs = table(spark, sf_dir, "documents")
    return dd.strip_duplicate_spans(docs, "doc_id", "text", min_len=5)


@register(
    "dedup_line_level",
    f"""
    WITH lined AS (
      SELECT doc_id,
             text || chr(10) || 'Subscribe to our newsletter' || chr(10) ||
             CASE WHEN doc_id % 3 = 0 THEN 'Cookie policy applies'
                  ELSE 'unique line ' || doc_id::VARCHAR END AS text
      FROM documents
    ),
    lines AS (
      SELECT doc_id, unnest(ls) AS line, unnest(range(1, len(ls) + 1)) AS pos
      FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM lined)
    ),
    keyed AS (SELECT doc_id, pos, line, trim(lower(line)) AS k FROM lines),
    ldf AS (
      SELECT k, count(*) AS dfc
      FROM (SELECT DISTINCT doc_id, k FROM keyed WHERE k <> '') GROUP BY k
    ),
    hot AS (SELECT k FROM ldf WHERE dfc > 2),
    kept AS (
      SELECT doc_id, pos, line FROM keyed
      WHERE k = '' OR k NOT IN (SELECT k FROM hot)
    ),
    rebuilt AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
             count(*) AS n_lines
      FROM kept GROUP BY doc_id
    )
    SELECT l.doc_id,
           COALESCE(r.text, '') AS text,
           COALESCE(r.n_lines, 0)::BIGINT AS n_lines,
           (len(string_split(l.text, chr(10))) - COALESCE(r.n_lines, 0))::BIGINT
             AS n_dropped
    FROM lined l LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def dedup_line_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document boilerplate removal (operators/dedup.py
    drop_duplicate_lines — the CCNet/C4 line-dedup pass): lines recurring in
    > max_line_df distinct documents are dropped and each document is
    reassembled from its surviving lines in order. The fixture corpus is
    single-line, so the query deterministically appends one corpus-wide
    boilerplate line (always dropped), a 1-in-3 shared line (dropped), and
    a per-doc unique line (kept) before applying the operator."""
    docs = table(spark, sf_dir, "documents")
    lined = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("Subscribe to our newsletter"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("Cookie policy applies")).otherwise(
                F.concat(F.lit("unique line "), F.col("doc_id").cast("string"))
            ),
        ).alias("text"),
    )
    return dd.drop_duplicate_lines(lined, "doc_id", "text", max_line_df=2)


@register(
    "text_gopher_rules",
    f"""
    WITH t AS (
      SELECT doc_id, {_NORM} AS norm, {_TOKS} AS toks FROM documents
    ), m AS (
      SELECT doc_id,
             len(toks)::BIGINT AS n_words,
             (length(norm) - (len(toks) - 1))::BIGINT AS char_sum,
             (length(norm) - length(replace(norm, '#', '')))::BIGINT AS hashes,
             ((length(norm) - length(replace(norm, '...', ''))) / 3)::BIGINT
               AS ellipses,
             len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::BIGINT
               AS alpha_words,
             len(list_intersect(list_distinct(toks),
                 ['the','be','to','of','and','that','have','with']))::BIGINT
               AS stops
      FROM t
    )
    SELECT doc_id, n_words,
           (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
           (char_sum >= 3 * n_words AND char_sum <= 10 * n_words)
             AS ok_mean_word_len,
           (10 * (hashes + ellipses)) <= n_words AS ok_symbol_ratio,
           (5 * alpha_words) >= (4 * n_words) AS ok_alpha_words,
           stops >= 2 AS ok_stopwords,
           ((n_words >= 50 AND n_words <= 100000)
            AND (char_sum >= 3 * n_words AND char_sum <= 10 * n_words)
            AND ((10 * (hashes + ellipses)) <= n_words)
            AND ((5 * alpha_words) >= (4 * n_words))
            AND (stops >= 2)) AS passes_gopher
    FROM m
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher corpus-filter rule set (operators/quality.py
    gopher_quality_flags): word-count bounds, mean word length, symbol
    ratio, alphabetic-word fraction, stop-word presence — every threshold
    an exact-integer comparison, so flags are bit-identical cross-engine."""
    from olake_spark.operators.quality import gopher_quality_flags

    docs = table(spark, sf_dir, "documents")
    return gopher_quality_flags(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# incremental dedup: new batch vs persisted corpus index
# ---------------------------------------------------------------------------


@register(
    "dedup_incremental_exact",
    f"""
    WITH corpus AS (SELECT * FROM documents WHERE doc_id % 8 <> 7),
    batch AS (
      SELECT doc_id, text, source, lang FROM documents WHERE doc_id % 8 = 7
      UNION ALL
      SELECT doc_id + 1000000, text, source, lang FROM documents WHERE doc_id % 16 = 0
      UNION ALL
      SELECT doc_id + 2000000, text, source, lang FROM documents WHERE doc_id % 16 = 15
    ),
    idx AS (SELECT md5({_NORM}) AS fp FROM corpus GROUP BY 1),
    fresh AS (
      SELECT b.*, md5({_NORM}) AS fp FROM batch b
      WHERE md5({_NORM}) NOT IN (SELECT fp FROM idx)
    )
    SELECT doc_id, source, lang
    FROM (SELECT *, min(doc_id) OVER (PARTITION BY fp) AS first_id FROM fresh)
    WHERE doc_id = first_id
    """,
)
def dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-batch exact dedup against a persisted fingerprint index
    (operators/dedup.py incremental_exact_dedup). Modulo split so the
    shape holds at every SF: corpus = 7/8 of docs; the batch holds the
    fresh 1/8, a redelivery of corpus docs (%16==0) under new ids, and a
    second copy of half the fresh docs (%16==15) under higher ids.
    Survivors = exactly the fresh docs under their original ids —
    redeliveries lose to the index, batch-internal copies lose to
    first-wins; the corpus contributes only its index."""
    docs = table(spark, sf_dir, "documents")
    sel = ["doc_id", "text", "source", "lang"]
    corpus = docs.filter(F.col("doc_id") % 8 != 7)
    batch = (
        docs.filter(F.col("doc_id") % 8 == 7)
        .select(*sel)
        .unionByName(
            docs.filter(F.col("doc_id") % 16 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "source", "lang"
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 16 == 15).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"), "text", "source", "lang"
            )
        )
    )
    idx = dd.fingerprint_index(corpus, "doc_id", "text")
    return dd.incremental_exact_dedup(batch, idx, "doc_id", "text").select(
        "doc_id", "source", "lang"
    )


def _incremental_minhash_oracle(threshold: float = 0.7, num_bands: int = 4) -> str:
    k = len(dd.MINHASH_PARAMS)
    rpb = k // num_bands
    band_selects = []
    for j in range(num_bands):
        cols = ", ".join(f"m{j*rpb+r}::VARCHAR" for r in range(rpb))
        band_selects.append(
            f"SELECT doc_id, {j} AS band, md5(concat_ws('|', {cols})) AS bh FROM sig"
        )
    bands = " UNION ALL ".join(band_selects)
    eq = " + ".join(f"(sn.m{i} = sc.m{i})::INT" for i in range(k))
    return f"""
    WITH {_minhash_sig_sql()},
    bands AS ({bands}),
    cand AS (
      SELECT DISTINCT n.doc_id AS nid, c.doc_id AS cid
      FROM bands n JOIN bands c
        ON n.band = c.band AND n.bh = c.bh AND n.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
    ),
    dupes AS (
      SELECT DISTINCT nid
      FROM cand JOIN sig sn ON sn.doc_id = nid JOIN sig sc ON sc.doc_id = cid
      WHERE round(({eq})/{float(k)}, 6) >= {threshold}
    )
    SELECT doc_id, source
    FROM documents
    WHERE doc_id % 10 = 0 AND doc_id NOT IN (SELECT nid FROM dupes)
    """


@register("dedup_incremental_minhash", _incremental_minhash_oracle())
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-batch NEAR-dup dedup against a persisted MinHash signature
    index (operators/dedup.py incremental_minhash_dedup): corpus = 9/10
    of docs contributes only (id, m0..m15); batch = the remaining tenth
    (modulo split — the shape holds at every SF). A batch doc
    is dropped iff some corpus doc agrees on >= 1 LSH band AND the full
    signature estimates Jaccard >= 0.7 — candidates are batch x band-bucket,
    never batch x corpus."""
    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    idx = dd.minhash_index(corpus, "doc_id", "text")
    return dd.incremental_minhash_dedup(batch, idx, "doc_id", "text", threshold=0.7).select(
        "doc_id", "source"
    )


@register(
    "audit_numeric_outliers",
    """
    WITH nulls AS (
      SELECT l_returnflag AS grp,
             sum((l_extendedprice IS NULL)::BIGINT)::BIGINT AS n_nulls
      FROM lineitem GROUP BY 1
    ), vals AS (
      SELECT l_returnflag AS grp, l_extendedprice::DOUBLE AS v
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), med AS (
      SELECT grp, count(*)::BIGINT AS n, median(v) AS med FROM vals GROUP BY 1
    ), dev AS (
      SELECT vals.grp, m.n, m.med, abs(vals.v - m.med) AS ad
      FROM vals JOIN med m ON vals.grp IS NOT DISTINCT FROM m.grp
    ), mad AS (
      SELECT grp, n, med, median(ad) AS mad FROM dev GROUP BY 1, 2, 3
    ), flagged AS (
      SELECT d.grp, sum((d.ad > 3.0 * 1.4826 * m.mad)::BIGINT)::BIGINT AS n_outliers
      FROM dev d JOIN mad m ON d.grp IS NOT DISTINCT FROM m.grp GROUP BY 1
    )
    SELECT nu.grp AS l_returnflag, coalesce(m.n, 0) AS n, nu.n_nulls,
           round(m.med, 6) AS median, round(m.mad, 6) AS mad,
           coalesce(f.n_outliers, 0) AS n_outliers,
           CASE WHEN m.n > 0 THEN round(f.n_outliers / m.n::DOUBLE, 6) END AS outlier_frac
    FROM nulls nu LEFT JOIN mad m ON nu.grp IS NOT DISTINCT FROM m.grp
    LEFT JOIN flagged f ON nu.grp IS NOT DISTINCT FROM f.grp
    """,
)
def audit_numeric_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust numeric outlier audit (operators/audit.py
    numeric_outlier_stats): per return flag, exact median + MAD of
    extended price and the count beyond 3 scaled MADs — the heavy-tail-
    safe alternative to mean/stddev z-scores. Exact interpolated medians
    match bit-for-bit across engines."""
    from olake_spark.operators.audit import numeric_outlier_stats

    li = table(spark, sf_dir, "lineitem")
    return numeric_outlier_stats(li, "l_returnflag", "l_extendedprice", k=3.0)


_SRC_MIN_DOCS, _SRC_MIN_Q, _SRC_MAX_DUP = 10, 0.62, 0.05


@register(
    "source_quality_report",
    f"""
    WITH feat AS (
      SELECT source, text,
             length(text)::DOUBLE AS n_chars,
             len({{toks}})::DOUBLE AS n_tokens,
             (length(text) - length(regexp_replace(text, {_PUNCT_SQL}, '', 'g')))::DOUBLE AS n_punct,
             len(list_filter({{toks}}, x -> list_contains({{stops}}, x)))::DOUBLE AS n_stop
      FROM documents
    ), scored AS (
      SELECT source,
             coalesce(CAST(round(round(CASE WHEN n_chars IS NULL THEN 0.0 ELSE
                   (least(n_chars/500.0, 1.0)
                    + (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END)
                    + (1.0 - CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END)) / 3.0 END,
                   6) * 1e6) AS BIGINT), 0) AS q,
             md5(coalesce({{norm}}, '')) AS fp
      FROM feat
    ), agg AS (
      SELECT source, count(*)::BIGINT AS n_docs, sum(q)::BIGINT AS sum_quality_micro,
             count(DISTINCT fp)::BIGINT AS nfp
      FROM scored GROUP BY source
    )
    SELECT source, n_docs, sum_quality_micro,
           round(sum_quality_micro / (n_docs * 1000000.0), 6) AS mean_quality,
           round((n_docs - nfp) / n_docs::DOUBLE, 6) AS dup_rate,
           (n_docs >= {_SRC_MIN_DOCS} AND (sum_quality_micro < {int(round(_SRC_MIN_Q * 1e6))} * n_docs
             OR (n_docs - nfp) * 1000000 > {int(round(_SRC_MAX_DUP * 1e6))} * n_docs)) AS flagged
    FROM agg
    """.replace("{toks}", _TOKS).replace("{stops}", _stop_list()).replace("{norm}", _NORM),
)
def source_quality_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level corpus hygiene (operators/quality.py
    source_quality_report — the RefinedWeb/FineWeb domain-filtering
    pattern): per-source doc count, order-free exact-integer quality sum,
    exact-dup rate, and the flag decision (support floor + two cross-
    multiplied integer thresholds). Feeds source_quality_filter's
    anti-join."""
    from olake_spark.operators.quality import source_quality_report

    docs = table(spark, sf_dir, "documents")
    return source_quality_report(
        docs, "doc_id", "text", "source",
        min_docs=_SRC_MIN_DOCS, min_quality=_SRC_MIN_Q, max_dup_rate=_SRC_MAX_DUP,
    )


def _script_stats_oracle() -> str:
    from olake_spark.operators.text import SCRIPT_CLASSES

    counts = ", ".join(
        f"(length(text) - length(regexp_replace(text, '{re2}', '', 'g')))::BIGINT"
        f" AS n_{name}"
        for name, _, re2 in SCRIPT_CLASSES
    )
    names = [name for name, _, _ in SCRIPT_CLASSES]
    gr = "greatest(" + ", ".join(f"n_{n}" for n in names) + ")"
    ratios = ", ".join(
        f"CASE WHEN n_chars_total > 0 THEN round(n_{n} / n_chars_total::DOUBLE, 6)"
        f" ELSE 0.0 END AS ratio_{n}"
        for n in names
    )
    dominant = (
        "CASE WHEN " + gr + " = 0 THEN 'none' "
        + " ".join(f"WHEN n_{n} = {gr} THEN '{n}'" for n in names)
        + " END AS dominant_script"
    )
    return f"""
    WITH src AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
    c AS (
      SELECT doc_id, length(text)::BIGINT AS n_chars_total, {counts}
      FROM src
    )
    SELECT doc_id, n_chars_total, {', '.join(f'n_{n}' for n in names)},
           {ratios}, {dominant}
    FROM c
    """


@register("text_script_stats", _script_stats_oracle())
def text_script_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script profiling (operators/text.py with_script_stats):
    per-doc character counts/ratios for Latin/Cyrillic/CJK/Arabic/digit
    classes + dominant script — the script-level router multilingual
    corpora apply before any language model. Count-by-deletion keeps it
    pure codegen; the oracle renders the same ranges in RE2."""
    from olake_spark.operators.text import SCRIPT_CLASSES, with_script_stats

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    names = [n for n, _, _ in SCRIPT_CLASSES]
    return with_script_stats(docs, "text").select(
        "doc_id",
        "n_chars_total",
        *[f"n_{n}" for n in names],
        *[f"ratio_{n}" for n in names],
        "dominant_script",
    )


def _curate_incremental_oracle(threshold: float = 0.7, num_bands: int = 4) -> str:
    """Composed pipeline oracle: stream_curate's batch-equivalent gate +
    first-wins dedup over today's arrivals, then incremental MinHash
    near-dup against the persisted corpus index."""
    k = len(dd.MINHASH_PARAMS)
    rpb = k // num_bands
    band_selects = []
    for j in range(num_bands):
        cols = ", ".join(f"m{j*rpb+r}::VARCHAR" for r in range(rpb))
        band_selects.append(
            f"SELECT doc_id, {j} AS band, md5(concat_ws('|', {cols})) AS bh FROM sig"
        )
    bands = " UNION ALL ".join(band_selects)
    eq = " + ".join(f"(sn.m{i} = sc.m{i})::INT" for i in range(k))
    return f"""
    WITH gated AS (
      SELECT doc_id, source, text FROM documents
      WHERE doc_id % 10 = 0 AND len({_TOKS}) >= 5
    ),
    uniq AS (
      SELECT doc_id, source FROM gated
      QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5({_NORM}))
    ),
    {_minhash_sig_sql()},
    bands AS ({bands}),
    cand AS (
      SELECT DISTINCT n.doc_id AS nid, c.doc_id AS cid
      FROM bands n JOIN bands c
        ON n.band = c.band AND n.bh = c.bh
       AND n.doc_id IN (SELECT doc_id FROM uniq) AND c.doc_id % 10 <> 0
    ),
    dupes AS (
      SELECT DISTINCT nid
      FROM cand JOIN sig sn ON sn.doc_id = nid JOIN sig sc ON sc.doc_id = cid
      WHERE round(({eq})/{float(k)}, 6) >= {threshold}
    )
    SELECT doc_id, source FROM uniq
    WHERE doc_id NOT IN (SELECT nid FROM dupes)
    """


@register("curate_incremental_pipeline", _curate_incremental_oracle())
def curate_incremental_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production daily shape COMPOSED (round-3 verdict item 10):
    today's arrivals (doc_id % 10 = 0) run the streaming curation gate's
    batch equivalent (``curate_batch``: ≥5 tokens, first-wins per content
    fingerprint — ``tests/test_stream_curation.py`` pins stream == batch),
    then incremental MinHash near-dup against the PERSISTED corpus index
    (corpus = the other 9/10, contributing only signatures). Catches
    interface drift between the streaming and batch halves: the dedup
    consumes exactly what the gate emits."""
    from olake_spark.streaming.curation import curate_batch

    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    arrivals = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "source", "text")
    curated = curate_batch(arrivals, "doc_id", "text", min_tokens=5)
    # curated feeds BOTH the batch's signature computation and the final
    # anti-join inside incremental_minhash_dedup; materialize the gate
    # chain (tokenize + first-wins fingerprint window) once (guide §2.1)
    curated = curated.transform(materialize)
    idx = dd.minhash_index(corpus, "doc_id", "text")
    return dd.incremental_minhash_dedup(curated, idx, "doc_id", "text", threshold=0.7).select(
        "doc_id", "source"
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction + vocabulary coverage
# ---------------------------------------------------------------------------


@register(
    "tfidf_top_terms",
    f"""
    WITH tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf
      FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
      WHERE term <> '' GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
    n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, tf.term, tf, df, round(tf * ln(n_docs / df), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term ASC)::INT AS rank
      FROM scored)
    WHERE rank <= 3
    """,
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction (operators/tfidf.py tfidf_top_terms): the 3 most
    characteristic terms per document by tf * ln(N/df). Rank ties break on
    the rounded score then term ascending — deterministic under any
    partitioning; N rides a 1-row broadcast so construction is lazy."""
    from olake_spark.operators.tfidf import tfidf_top_terms

    docs = table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", top_n=3)


@register(
    "vocab_coverage",
    f"""
    WITH counts AS (
      SELECT term, count(*)::BIGINT AS n_occurrences
      FROM (SELECT unnest({_TOKS}) AS term FROM documents)
      WHERE term <> '' GROUP BY term
    ),
    total AS (SELECT sum(n_occurrences)::DOUBLE AS tot FROM counts),
    top AS (SELECT * FROM counts ORDER BY n_occurrences DESC, term ASC LIMIT 40)
    SELECT term, n_occurrences,
      row_number() OVER (ORDER BY n_occurrences DESC, term ASC)::INT AS rank,
      round(sum(n_occurrences) OVER (
        ORDER BY n_occurrences DESC, term ASC ROWS UNBOUNDED PRECEDING) / tot, 6)
        AS coverage
    FROM top CROSS JOIN total
    """,
)
def vocab_coverage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Zipf head (operators/tfidf.py vocab_coverage): top-40
    terms with cumulative token coverage — the pre-read for tokenizer vocab
    sizing and max_df dedup caps. The global order materializes only the
    top-k rows (TakeOrderedAndProject), never a full sort."""
    from olake_spark.operators.tfidf import vocab_coverage

    docs = table(spark, sf_dir, "documents")
    return vocab_coverage(docs, "text", top_k=40)


# ---------------------------------------------------------------------------
# document chunking + duplicate-span exposure
# ---------------------------------------------------------------------------


@register(
    "chunk_documents",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    c AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) <= 32 THEN 1
                  ELSE (len(toks) - 32 + 23) // 24 + 1 END AS nc
      FROM t
    ),
    e AS (SELECT doc_id, toks, unnest(range(0, nc)) AS chunk_id FROM c)
    SELECT doc_id, chunk_id::INT AS chunk_id,
           (chunk_id*24 + 1)::INT AS start_token,
           len(toks[(chunk_id*24 + 1) : (chunk_id*24 + 32)])::INT AS n_tokens,
           array_to_string(toks[(chunk_id*24 + 1) : (chunk_id*24 + 32)], ' ')
             AS chunk_text
    FROM e
    """,
)
def chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/embedding preprocessing (operators/chunking.py chunk_documents):
    every document split into 32-token windows advancing 24 tokens, with
    chunk index and 1-based start-token provenance. Pure array built-ins,
    one explode, zero shuffle."""
    from olake_spark.operators.chunking import chunk_documents

    docs = table(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", window=32, stride=24)


@register(
    "dup_span_stats",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    pos AS (
      SELECT doc_id, array_to_string(toks[i : i+4], ' ') AS g
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i FROM t)
    ),
    gdf AS (
      SELECT g, count(*) AS gdf
      FROM (SELECT DISTINCT doc_id, g FROM pos) GROUP BY g
    ),
    per_doc AS (
      SELECT pos.doc_id, count(*)::BIGINT AS n_grams,
             sum((gdf >= 2)::INT)::BIGINT AS n_dup_grams
      FROM pos JOIN gdf USING (g) GROUP BY pos.doc_id
    )
    SELECT d.doc_id,
           coalesce(n_grams, 0)::BIGINT AS n_grams,
           coalesce(n_dup_grams, 0)::BIGINT AS n_dup_grams,
           round(coalesce(n_dup_grams, 0) / greatest(coalesce(n_grams, 0), 1), 6)
             AS dup_fraction
    FROM documents d LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id
    """,
)
def dup_span_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-span exposure (operators/quality.py
    dup_span_stats): fraction of each doc's word 5-gram positions whose
    gram recurs in another document — the exact-repeated-span signal that
    doc-level dedup cannot see. One explode + a vocabulary-sized gram-df
    join; the corpus never self-joins."""
    from olake_spark.operators.quality import dup_span_stats

    docs = table(spark, sf_dir, "documents")
    return dup_span_stats(docs, "doc_id", "text", k=5)


# ---------------------------------------------------------------------------
# embedding group centroids + outlier ranking
# ---------------------------------------------------------------------------


@register(
    "embedding_centroid_outliers",
    f"""
    WITH ex AS (
      SELECT label, vec_id, unnest(embedding)::DOUBLE AS x,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ),
    cent AS (SELECT label, pos, round(avg(x), 6) AS c FROM ex GROUP BY label, pos),
    carr AS (SELECT label, list(c ORDER BY pos) AS cv FROM cent GROUP BY label),
    scored AS (
      SELECT vec_id, e.label,
             round({_COS.format(a='e.embedding', b='cv')}, 9) AS s9
      FROM embeddings e JOIN carr USING (label)
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY label ORDER BY s9 ASC, vec_id ASC)::INT AS outlier_rank
      FROM scored
    )
    SELECT vec_id, label, round(s9, 6) AS centroid_sim, outlier_rank
    FROM ranked WHERE outlier_rank <= 5
    """,
)
def embedding_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier detection (operators/embeddings.py
    centroid_outliers): cosine of every vector to its label's element-wise
    mean, bottom-5 per label = candidates for label-noise / cluster
    pruning. Centroid components are rounded to 6 decimals BEFORE the
    cosine so distributed-sum ordering cannot leak into ranks; the
    group-sized centroid relation broadcasts."""
    from olake_spark.operators.embeddings import centroid_outliers

    emb = table(spark, sf_dir, "embeddings")
    return centroid_outliers(emb, "vec_id", "label", "embedding", dim=64, bottom_k=5)


# ---------------------------------------------------------------------------
# model-based quality filtering (hashed bag-of-words linear classifier)
# ---------------------------------------------------------------------------


def _classifier_oracle() -> str:
    from olake_spark.operators.classifier import WEIGHT_SCALE, default_weights

    wl = "[" + ", ".join(str(w) for w in default_weights(256)) + "]"
    h = _H60.format(x="tok")
    return f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    contrib AS (
      SELECT doc_id, ({wl})[(({h}) % 256 + 1)::INT] AS w
      FROM tok WHERE tok <> ''
    ),
    agg AS (
      SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(w)::BIGINT AS z
      FROM contrib GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(n_tokens, 0)::BIGINT AS n_tokens,
           coalesce(z, 0)::BIGINT AS logit_micro,
           round(1.0/(1.0 + exp(-(coalesce(z, 0) / {float(WEIGHT_SCALE)}))), 6) AS score,
           round(1.0/(1.0 + exp(-(coalesce(z, 0) / {float(WEIGHT_SCALE)}))), 6) >= 0.5
             AS keep
    FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
    """


@register("classify_quality_hashed_bow", _classifier_oracle())
def classify_quality_hashed_bow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (operators/classifier.py
    classify_quality): a linear classifier over 256 hashed bag-of-words
    buckets scores every document; keep = sigmoid >= 0.5. Weights are
    integer micro-units so the logit is an exact order-free integer sum —
    the decision boundary is engine-independent; the weight table is an
    array literal in the plan (no join, no Python)."""
    from olake_spark.operators.classifier import classify_quality, default_weights

    docs = table(spark, sf_dir, "documents")
    return classify_quality(docs, "doc_id", "text", default_weights(256))


@register(
    "decontaminate_semantic",
    f"""
    WITH bands AS ({_lsh_bands_sql('embedding')}),
    hits AS (
      SELECT DISTINCT c.vec_id
      FROM bands c JOIN bands b
        ON c.band = b.band AND c.sig = b.sig
       AND c.vec_id < 450 AND b.vec_id >= 450
      WHERE round({_COS.format(a='c.embedding', b='b.embedding')}, 6) >= 0.3
    )
    SELECT vec_id, label FROM embeddings
    WHERE vec_id < 450 AND vec_id NOT IN (SELECT vec_id FROM hits)
    """,
)
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination (operators/decontam.py
    semantic_decontaminate): corpus = vectors < 450, benchmark = the rest;
    a corpus row is dropped iff it collides with a benchmark vector in any
    LSH table AND exact cosine >= 0.3 — the paraphrase-level contamination
    the n-gram pass (decontaminate_overlap) cannot see. Benchmark bands
    broadcast; corpus rows never shuffle."""
    from olake_spark.operators.decontam import semantic_decontaminate

    emb = table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") < 450)
    bench = emb.filter(F.col("vec_id") >= 450)
    return semantic_decontaminate(corpus, bench, "vec_id", "embedding", 0.3).select(
        "vec_id", "label"
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering key
# ---------------------------------------------------------------------------


def _zorder_oracle(bits: int = 16) -> str:
    def q(expr: str, lo: float, hi: float) -> str:
        span = float(hi) - float(lo)
        top = float((1 << bits) - 1)
        return (
            f"floor(least(greatest(({expr}::DOUBLE - {float(lo)!r}) / {span!r} * {top!r},"
            f" 0.0), {top!r}))::BIGINT"
        )

    dims = [q("user_id", 0.0, 2000.0), q('"value"', 0.0, 500.0)]
    terms = []
    for d, v in enumerate(dims):
        for b in range(bits):
            # full parens per term: DuckDB's << binds looser than +, so an
            # unparenthesized sum of shifts chains into nested shifts
            terms.append(f"(((({v}) >> {b}) & 1) << {b * len(dims) + d})")
    z = " + ".join(terms)
    return f"""
    SELECT event_id, ({z})::BIGINT AS z
    FROM events
    """


@register("zorder_key_events", _zorder_oracle())
def zorder_key_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column data-skipping layout (sinks/zorder.py zorder_key): the
    Morton interleave of 16-bit quantized (user_id, value) rank codes —
    the key write_zordered range-partitions and sorts on so predicates on
    EITHER column prune parquet row groups. Exact integer bit arithmetic,
    fully codegen'd."""
    from olake_spark.sinks.zorder import quantize_minmax, zorder_key

    ev = table(spark, sf_dir, "events")
    z = zorder_key(
        [
            quantize_minmax(F.col("user_id"), 0.0, 2000.0),
            quantize_minmax(F.col("value"), 0.0, 500.0),
        ]
    )
    return ev.select("event_id", z.alias("z"))


# ---------------------------------------------------------------------------
# HTML -> visible text extraction
# ---------------------------------------------------------------------------

_HTML_WRAP_SQL = (
    "'<html><head><style>h1 {color: red}</style></head><body><h1>Doc &amp; ' || source"
    " || '</h1><p>' || substring(text, 1, 80)"
    " || '</p><br><div>tail &lt;x&gt;</div>"
    "<script type=\"text/javascript\">var x = 1 < 2;</script></body></html>'"
)


def _strip_html_sql(x: str) -> str:
    from olake_spark.operators.text import HTML_ENTITIES

    for tag in ("script", "style"):
        x = f"regexp_replace({x}, '(?is)<{tag}\\b[^>]*>.*?</{tag}\\s*>', ' ', 'g')"
    x = (
        f"regexp_replace({x}, '(?i)<br\\s*/?>|</(p|div|li|h[1-6]|tr|table|ul|ol)\\s*>',"
        " chr(10), 'g')"
    )
    x = f"regexp_replace({x}, '(?s)<[^>]*>', ' ', 'g')"
    for ent, rep in HTML_ENTITIES:
        rep_sql = "''''" if rep == "'" else f"'{rep}'"
        x = f"regexp_replace({x}, '{ent}', {rep_sql}, 'g')"
    x = f"regexp_replace({x}, '&#(\\d+);', ' ', 'g')"
    x = f"regexp_replace({x}, '[ \\t\\r]+', ' ', 'g')"
    x = f"regexp_replace({x}, ' ?\\n ?', chr(10), 'g')"
    x = f"regexp_replace({x}, '\\n{{2,}}', chr(10), 'g')"
    x = f"regexp_replace({x}, '^\\n+|\\n+$', '', 'g')"
    return f"trim({x})"


@register(
    "html_text_extract",
    f"""
    WITH h AS (SELECT doc_id, {_HTML_WRAP_SQL} AS html FROM documents)
    SELECT doc_id, {_strip_html_sql('html')} AS text
    FROM h
    """,
)
def html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET-style visible-text extraction (operators/text.py strip_html):
    documents wrapped in a deterministic HTML shell (head/style, headings,
    entities, an inline script with a bare '<') are reduced back to their
    visible text as a pure codegen regex chain — script/style content
    dropped, block closers become line breaks (feeding line-level dedup),
    entities decoded, whitespace normalized. No parser, no Python."""
    from olake_spark.operators.text import strip_html

    docs = table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><head><style>h1 {color: red}</style></head><body><h1>Doc &amp; '),
        F.col("source"),
        F.lit("</h1><p>"),
        F.substring(F.col("text"), 1, 80),
        F.lit('</p><br><div>tail &lt;x&gt;</div>'
              '<script type="text/javascript">var x = 1 < 2;</script></body></html>'),
    )
    return docs.select("doc_id", strip_html(html).alias("text"))


# ---------------------------------------------------------------------------
# corpus snapshot diff + length-bucketed batching
# ---------------------------------------------------------------------------


@register(
    "corpus_diff_versions",
    f"""
    WITH old_v AS (SELECT doc_id, md5({_NORM}) AS old_fingerprint FROM documents),
    new_src AS (
      SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
      FROM documents WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT doc_id + 1000, text FROM documents WHERE doc_id < 30
    ),
    new_v AS (SELECT doc_id, md5({_NORM}) AS new_fingerprint FROM new_src)
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN old_fingerprint IS DISTINCT FROM new_fingerprint THEN 'changed'
                ELSE 'unchanged' END AS status,
           old_fingerprint, new_fingerprint
    FROM old_v o FULL OUTER JOIN new_v n ON o.doc_id = n.doc_id
    """,
)
def corpus_diff_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-governance snapshot diff (operators/audit.py corpus_diff):
    version N+1 drops every 7th doc, edits every 11th, and adds 30 new ids;
    the diff labels each id added/removed/changed/unchanged. One
    full-outer join on the id over scan-side fingerprints — wide text
    never crosses the shuffle."""
    from olake_spark.operators.audit import corpus_diff

    docs = table(spark, sf_dir, "documents")
    old = docs.select("doc_id", "text")
    new = (
        docs.filter(F.col("doc_id") % 7 != 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") < 30).select(
                (F.col("doc_id") + 1000).alias("doc_id"), "text"
            )
        )
    )
    return corpus_diff(old, new, "doc_id", "text")


@register(
    "length_bucket_stats",
    """
    WITH b AS (
      SELECT doc_id, n_chars,
             ntile(8) OVER (ORDER BY n_chars ASC, doc_id ASC) AS bucket
      FROM documents
    )
    SELECT bucket, count(*)::BIGINT AS n,
           min(n_chars)::BIGINT AS min_len, max(n_chars)::BIGINT AS max_len,
           round((max(n_chars) * count(*) - sum(n_chars))
                 / (max(n_chars) * count(*)), 6) AS padding_frac
    FROM b GROUP BY bucket
    """,
)
def length_bucket_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile length-bucketing (operators/packing.py length_bucket_stats):
    8 equal-count buckets by document length with per-bucket padding waste
    — the batching layout that minimizes pad tokens for inference/eval.
    ntile ties break on the id, so bucket assignment is deterministic."""
    from olake_spark.operators.packing import length_bucket_stats

    docs = table(spark, sf_dir, "documents")
    return length_bucket_stats(docs, "doc_id", "n_chars", 8)


@register(
    "dataset_card",
    f"""
    WITH base AS (
      SELECT doc_id, len({_TOKS})::BIGINT AS nt, md5({_NORM}) AS fp, lang FROM documents
    ),
    g AS (
      SELECT count(*)::BIGINT AS n, sum(nt)::BIGINT AS tot,
             count(DISTINCT fp)::BIGINT AS nfp
      FROM base
    ),
    card AS (
      SELECT 'n_docs' AS metric, n::DOUBLE AS value FROM g
      UNION ALL SELECT 'total_tokens', tot::DOUBLE FROM g
      UNION ALL SELECT 'mean_doc_tokens', round(tot::DOUBLE / n, 6) FROM g
      UNION ALL SELECT 'exact_dup_rate', round(1.0 - nfp::DOUBLE / n, 6) FROM g
    ),
    shares AS (
      SELECT 'lang_share_' || lang AS metric,
             round(count(*)::DOUBLE / (SELECT count(*) FROM documents), 6) AS value
      FROM documents GROUP BY lang
    )
    SELECT metric, value FROM card UNION ALL SELECT metric, value FROM shares
    """,
)
def dataset_card_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-note metric block (operators/profile.py dataset_card):
    document count, token totals/means, exact-duplicate rate, language
    shares — one global aggregate plus a language groupBy whose share
    denominator rides a global window over the k-language counts (no
    action during construction, no join)."""
    from olake_spark.operators.profile import dataset_card

    docs = table(spark, sf_dir, "documents")
    return dataset_card(docs, "doc_id", "text", "lang")


# ---------------------------------------------------------------------------
# cluster-keyed survivors + near-dup-safe split
# ---------------------------------------------------------------------------


def _keep_canonical_oracle() -> str:
    return f"""
    WITH clusters AS MATERIALIZED ({_cluster_oracle()})
    SELECT d.doc_id, d.source, d.lang
    FROM documents d JOIN clusters c ON c.doc_id = d.doc_id
    WHERE c.doc_id = c.cluster_id
    """


@register("dedup_keep_canonical", _keep_canonical_oracle())
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialization step of the dedup pipeline (operators/dedup.py
    keep_canonical): pairs -> connected components -> keep exactly the
    min-id representative of every near-dup cluster, original columns
    intact (singletons survive as their own representative)."""
    docs = table(spark, sf_dir, "documents")
    pairs = dd.minhash_near_dups(docs, "doc_id", "text", 0.7)
    clusters = dd.connected_components(docs.select("doc_id"), pairs)
    return dd.keep_canonical(docs, clusters).select("doc_id", "source", "lang")


def _cluster_split_oracle(test_fraction: float = 0.2) -> str:
    bucket = _BUCKET_SQL.format(x="c.cluster_id::VARCHAR || 'cluster-split'")
    return f"""
    WITH clusters AS MATERIALIZED ({_cluster_oracle()})
    SELECT d.doc_id, c.cluster_id,
           CASE WHEN {bucket} < {int(test_fraction * _HS)}
                THEN 'test' ELSE 'train' END AS split
    FROM documents d JOIN clusters c ON c.doc_id = d.doc_id
    """


@register("split_leakage_safe_neardup", _cluster_split_oracle())
def split_leakage_safe_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup-safe train/test split (operators/sampling.py
    split_by_cluster): the split key is the connected-component cluster id,
    so a document and all its near-duplicates land on one side — closing
    the paraphrase leakage a content-fingerprint split cannot."""
    from olake_spark.operators.sampling import split_by_cluster

    docs = table(spark, sf_dir, "documents")
    pairs = dd.minhash_near_dups(docs, "doc_id", "text", 0.7)
    clusters = dd.connected_components(docs.select("doc_id"), pairs)
    return split_by_cluster(docs, clusters, "doc_id", 0.2).select(
        "doc_id", "cluster_id", "split"
    )


@register(
    "profile_cardinality",
    """
    WITH g AS (
      SELECT count(*)::BIGINT AS n,
             sum((o_custkey IS NULL)::INT)::BIGINT AS ck_nulls,
             count(DISTINCT o_custkey)::BIGINT AS ck_nd,
             sum((o_orderstatus IS NULL)::INT)::BIGINT AS st_nulls,
             count(DISTINCT o_orderstatus)::BIGINT AS st_nd,
             sum((o_orderpriority IS NULL)::INT)::BIGINT AS pr_nulls,
             count(DISTINCT o_orderpriority)::BIGINT AS pr_nd
      FROM orders
    )
    SELECT 'o_custkey' AS col, n, ck_nulls AS n_nulls, ck_nd AS n_distinct,
           round(ck_nd / greatest(n - ck_nulls, 1), 6) AS distinct_frac FROM g
    UNION ALL
    SELECT 'o_orderstatus', n, st_nulls, st_nd,
           round(st_nd / greatest(n - st_nulls, 1), 6) FROM g
    UNION ALL
    SELECT 'o_orderpriority', n, pr_nulls, pr_nd,
           round(pr_nd / greatest(n - pr_nulls, 1), 6) FROM g
    """,
)
def profile_cardinality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column cardinality profile (operators/profile.py
    profile_cardinality): count / nulls / exact distinct / distinct
    fraction for three orders columns in ONE aggregation pass — the
    numbers that drive key detection, bucketing, and broadcast decisions.
    approx=True swaps in the HLL++ sketch at scale; exact here for the
    oracle."""
    from olake_spark.operators.profile import profile_cardinality

    orders = table(spark, sf_dir, "orders")
    return profile_cardinality(orders, ["o_custkey", "o_orderstatus", "o_orderpriority"])


# ---------------------------------------------------------------------------
# Mergeable distinct-count sketches (operators/sketches.py): KMV + HLL-32
# ---------------------------------------------------------------------------

from olake_spark.operators import sketches as sk  # noqa: E402

_SK_H = "('0x' || substring(md5(user_id::VARCHAR),1,15))::BIGINT"
_KMV_NUM = repr(63.0 * float(2**sk.HASH_BITS))
_HLL_NUM = repr(sk.HLL_ALPHA * sk.HLL_M * sk.HLL_M * float(2**sk.RHO_SCALE))

_KMV_ORACLE = f"""
    WITH h AS (
      SELECT DISTINCT event_type, {_SK_H} AS h FROM events
    ),
    rk AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h
    ),
    kept AS (SELECT * FROM rk WHERE rn <= 64)
    SELECT event_type, count(*)::BIGINT AS n_kept, max(h) AS kth_hash,
           CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
                ELSE round({_KMV_NUM} / max(h)::DOUBLE, 4)
           END AS est_distinct
    FROM kept GROUP BY 1
    """


@register("sketch_kmv_distinct", _KMV_ORACLE)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-user sketch per event type
    (operators/sketches.py kmv_sketch, k=64): the sketch STATE (k-th
    minimum hash) is bit-exact in the oracle, the estimate one exact
    division rounded late. The 100 TB story is mergeability — per-
    partition k-smallest sets combine associatively, so the distinct
    count never re-shuffles raw rows."""
    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    return sk.kmv_sketch(ev, "user_id", ["event_type"], k=64)


_HLL_ORACLE = f"""
    WITH h AS (
      SELECT event_type, {_SK_H} AS h FROM events
    ),
    r AS (SELECT event_type, h % {sk.HLL_M} AS b, h // {sk.HLL_M} AS rest FROM h),
    rr AS (
      SELECT event_type, b,
             CASE WHEN rest = 0 THEN {sk.RHO_SCALE}
                  ELSE {sk.RHO_SCALE} - length(bin(rest)) END AS rho
      FROM r
    ),
    regs AS (SELECT event_type, b, max(rho) AS m FROM rr GROUP BY 1, 2),
    gridb AS (SELECT unnest(generate_series(0, {sk.HLL_M - 1})) AS b),
    keysd AS (SELECT DISTINCT event_type FROM regs),
    dense AS (
      SELECT k.event_type, g.b, coalesce(regs.m, 0) AS m
      FROM keysd k CROSS JOIN gridb g
      LEFT JOIN regs ON regs.event_type = k.event_type AND regs.b = g.b
    )
    SELECT event_type,
           sum((1::BIGINT << ({sk.RHO_SCALE} - m)))::BIGINT AS harmonic_scaled,
           sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero_regs,
           round({_HLL_NUM} / sum((1::BIGINT << ({sk.RHO_SCALE} - m)))::DOUBLE, 4)
             AS est_distinct
    FROM dense GROUP BY 1
    """


@register("sketch_hll_distinct", _HLL_ORACLE)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog-32 distinct-user sketch per event type
    (operators/sketches.py hll_sketch): registers are map-side-
    combinable MAXes; the harmonic sum stays an exact BIGINT by scaling
    each 2^-M_j term to 2^(56-M_j), so the sketch state AND the raw
    estimate (one double division, rounded late) match the oracle
    bit-for-bit. No libm in the plan — the linear-counting correction is
    intentionally left to the consumer (n_zero_regs is surfaced)."""
    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    return sk.hll_sketch(ev, "user_id", ["event_type"])


# ---------------------------------------------------------------------------
# Bloom-filter semi-join (operators/bloom.py): runtime-filter pruning
# ---------------------------------------------------------------------------

_BLM = "('0x' || substring(md5({k}::VARCHAR || ':{j}'),1,15))::BIGINT % 64"

_BLOOM_ORACLE = f"""
    WITH dim AS (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5),
    bits AS (
      SELECT DISTINCT pos FROM (
        SELECT ({_BLM.format(k='s_suppkey', j=0)}) AS pos FROM dim
        UNION ALL
        SELECT ({_BLM.format(k='s_suppkey', j=1)}) FROM dim
      )
    ),
    probe AS (
      SELECT l_suppkey,
             ({_BLM.format(k='l_suppkey', j=0)}) AS q0,
             ({_BLM.format(k='l_suppkey', j=1)}) AS q1
      FROM lineitem
    ),
    flagged AS (
      SELECT p.l_suppkey,
             (b0.pos IS NOT NULL AND b1.pos IS NOT NULL) AS pass,
             (d.s_suppkey IS NOT NULL) AS is_true
      FROM probe p
      LEFT JOIN bits b0 ON b0.pos = p.q0
      LEFT JOIN bits b1 ON b1.pos = p.q1
      LEFT JOIN dim d ON d.s_suppkey = p.l_suppkey
    )
    SELECT count(*)::BIGINT AS n_scanned,
           sum(CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT AS n_pass_bloom,
           sum(CASE WHEN is_true THEN 1 ELSE 0 END)::BIGINT AS n_true_match,
           sum(CASE WHEN pass AND NOT is_true THEN 1 ELSE 0 END)::BIGINT
             AS n_false_pos
    FROM flagged
    """


@register("bloom_semi_join_prune", _BLOOM_ORACLE)
def bloom_semi_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter pruning audit (operators/bloom.py): a 64-bit/2-hash
    Bloom of a selective supplier subset probed against every lineitem
    row via broadcast joins — one fact scan, zero fact shuffles. The
    md5-derived bit set makes the EXACT false-positive rows reproducible
    in the oracle (n_bits deliberately tiny at gate scale so FPs exist
    and the accounting is exercised; production default is
    n_bits ≈ 10x|dim|). Spark's InjectRuntimeFilter does this natively
    with might_contain — this is the portable, oracle-checkable form of
    the same plan shape."""
    from olake_spark.operators import bloom as bl

    sup = table(spark, sf_dir, "supplier")
    dim = sup.filter(F.col("s_nationkey") < 5).select("s_suppkey")
    bits = bl.bloom_build(dim, "s_suppkey", n_bits=64, n_hashes=2)
    li = table(spark, sf_dir, "lineitem").select("l_suppkey")
    audit = bl.bloom_prune_audit(li, "l_suppkey", bits, n_bits=64, n_hashes=2)
    truth = audit.join(
        F.broadcast(dim.withColumn("_true", F.lit(True))),
        audit.l_suppkey == dim.s_suppkey,
        "left",
    )
    is_true = F.coalesce(F.col("_true"), F.lit(False))
    return truth.groupBy().agg(
        F.count(F.lit(1)).alias("n_scanned"),
        F.sum(F.when(F.col("_bloom_pass"), 1).otherwise(0)).alias("n_pass_bloom"),
        F.sum(F.when(is_true, 1).otherwise(0)).alias("n_true_match"),
        F.sum(F.when(F.col("_bloom_pass") & ~is_true, 1).otherwise(0)).alias(
            "n_false_pos"
        ),
    )


# ---------------------------------------------------------------------------
# Q-gram fuzzy join (operators/fuzzy.py): prefix-filtered, no cross join
# ---------------------------------------------------------------------------

_QG = """unnest(list_distinct(CASE WHEN length(s) >= 3
      THEN list_transform(generate_series(1, length(s)-2), i -> substring(s, i, 3))
      ELSE []::VARCHAR[] END)) AS g"""

_FUZZY_ORACLE = f"""
    WITH probes AS (
      SELECT min(p_partkey) AS probe_id, lower(substring(p_name, 2)) AS s
      FROM part WHERE p_partkey % 37 = 0 GROUP BY 2
    ),
    corpus AS (
      SELECT min(p_partkey) AS p_partkey, lower(p_name) AS s
      FROM part GROUP BY 2
    ),
    pg AS (SELECT probe_id, s, {_QG} FROM probes),
    cg AS (SELECT p_partkey, s, {_QG} FROM corpus),
    dfq AS (SELECT g, count(*) AS df FROM cg GROUP BY 1),
    lpref AS (
      SELECT probe_id, s, g FROM (
        SELECT pg.probe_id, pg.s, pg.g,
               row_number() OVER (PARTITION BY pg.probe_id
                 ORDER BY coalesce(dfq.df, 0), pg.g) AS rn
        FROM pg LEFT JOIN dfq ON dfq.g = pg.g
      ) WHERE rn <= 7
    ),
    rpref AS (
      SELECT p_partkey, s, g FROM (
        SELECT cg.p_partkey, cg.s, cg.g,
               row_number() OVER (PARTITION BY cg.p_partkey
                 ORDER BY dfq.df, cg.g) AS rn
        FROM cg JOIN dfq ON dfq.g = cg.g
      ) WHERE rn <= 7
    ),
    cand AS (
      SELECT DISTINCT l.probe_id, r.p_partkey, l.s AS ls, r.s AS rs
      FROM lpref l JOIN rpref r ON r.g = l.g
      WHERE abs(length(l.s) - length(r.s)) <= 2
    )
    SELECT probe_id, p_partkey, levenshtein(ls, rs)::INT AS dist
    FROM cand WHERE levenshtein(ls, rs) <= 2
    """


@register("fuzzy_join_qgram", _FUZZY_ORACLE)
def fuzzy_join_qgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered q-gram fuzzy join (operators/fuzzy.py; Gravano
    VLDB'01 count bound + Chaudhuri/PPJoin prefix filtering): probes are
    part names with the first character dropped (true edit distance 1),
    matched against the full part corpus by indexing only each string's
    q*d+1 = 7 RAREST 3-grams (rarity = corpus df) -> equi-join on prefix
    grams -> length filter -> levenshtein <= 2 verification. Lossless for
    the claimed distance, and hot grams never reach a prefix, so the one
    pairwise shuffle is skew-free by construction."""
    from olake_spark.operators.fuzzy import fuzzy_join

    part = table(spark, sf_dir, "part")
    # match on the DISTINCT-string domain (the fixture's names repeat
    # heavily; production string-matching dedupes first and fans out by
    # joining back) - representative id = min key per distinct string
    probes = (
        part.filter(F.col("p_partkey") % 37 == 0)
        .select(
            "p_partkey",
            F.lower(
                F.col("p_name").substr(F.lit(2), F.length("p_name"))
            ).alias("probe_name"),
        )
        .groupBy("probe_name")
        .agg(F.min("p_partkey").alias("probe_id"))
    )
    corpus = (
        part.select("p_partkey", F.lower("p_name").alias("p_name"))
        .groupBy("p_name")
        .agg(F.min("p_partkey").alias("p_partkey"))
    )
    return fuzzy_join(
        probes, corpus,
        "probe_id", "probe_name", "p_partkey", "p_name",
        q=3, max_dist=2,
    )


# PPJoin token-set similarity self-join over 3-word shingles. The oracle
# computes ground truth BRUTE-FORCE (all pairs, exact list_intersect) —
# so a match proves the prefix+length+positional pruning is lossless —
# and replicates the candidate pipeline only for the two audit counts.
_JAC_T = 0.5
_JAC_FRAC = repr(_JAC_T / (1.0 + _JAC_T))
_SHINGLES = (
    f"list_distinct(list_transform(range(1, greatest(len({_TOKS})-2,1)+1),"
    f" i -> array_to_string(({_TOKS})[i:i+2], ' ')))"
)

_JACCARD_JOIN_ORACLE = f"""
    WITH b2 AS (
      SELECT doc_id AS id, tk, len(tk) AS l FROM (
        SELECT doc_id, {_SHINGLES} AS tk FROM documents WHERE doc_id < 300
      ) WHERE len(tk) > 0
    ),
    truth AS (
      SELECT x.id AS id_a, y.id AS id_b,
             len(list_intersect(x.tk, y.tk)) AS o, x.l AS la, y.l AS lb
      FROM b2 x JOIN b2 y ON x.id < y.id
      WHERE len(list_intersect(x.tk, y.tk)) * {1.0 + _JAC_T}
            >= {_JAC_T} * (x.l + y.l)
    ),
    expl AS (SELECT id, l, unnest(tk) AS t FROM b2),
    dftbl AS (SELECT t, count(*) AS df FROM expl GROUP BY 1),
    pos AS (
      SELECT e.id, e.l, e.t,
             row_number() OVER (PARTITION BY e.id ORDER BY d.df, e.t) AS p
      FROM expl e JOIN dftbl d ON d.t = e.t
    ),
    pref AS (
      SELECT * FROM pos WHERE p <= l - ceil({_JAC_T}*l - 1e-9) + 1
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM pref a JOIN pref b ON a.t = b.t AND a.id < b.id
      WHERE {_JAC_T} * greatest(a.l, b.l) - 1e-9 <= least(a.l, b.l)
        AND 1 + least(a.l - a.p, b.l - b.p)
            >= {_JAC_FRAC} * (a.l + b.l) - 1e-9
    ),
    nc AS (SELECT count(*) AS n_candidates FROM cand),
    nu AS (
      SELECT count(*) AS n_uncapped_candidates FROM (
        SELECT DISTINCT a.id, b.id
        FROM expl a JOIN expl b ON a.t = b.t AND a.id < b.id
      )
    )
    SELECT id_a, id_b, o::INT AS overlap,
           round(o / (la + lb - o), 6) AS jaccard,
           n_candidates::BIGINT AS n_candidates,
           n_uncapped_candidates::BIGINT AS n_uncapped_candidates
    FROM truth, nc, nu
    """


@register("fuzzy_join_jaccard", _JACCARD_JOIN_ORACLE)
def fuzzy_join_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin token-set similarity self-join (operators/fuzzy.py
    jaccard_join; Xiao et al. WWW'08) over 3-word shingles of the
    documents corpus at Jaccard ≥ 0.5 — the record-linkage form users
    reach for first. Prefix (rarest l−⌈t·l⌉+1 shingles under the global
    df order) + length + positional filters prune candidates; exact
    ``array_intersect`` verification on candidates only. The ORACLE's
    pair set is brute-force ground truth, so agreement proves the
    pruning lossless; the in-band audit columns (filtered vs
    share-any-token candidate counts) measure the pruning ratio the
    prefix filter exists for.

    Gate-budget scoping: both sides restrict to doc_id < 300 — the
    oracle is deliberately brute-force O(n²) (that is the proof), so its
    cost is bounded by fixture size, not by the operator under test; 300
    docs keep 7 ground-truth pairs while holding the DuckDB side under
    ~2.5 s (r6 verdict: the full 500-doc oracle alone was 5 s of the
    worst gate query)."""
    from olake_spark.operators.dedup import word_ngrams
    from olake_spark.operators.fuzzy import jaccard_join

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300).select(
        "doc_id",
        word_ngrams(
            F.split(
                F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "),
                " ",
            ),
            3,
        ).alias("sh"),
    )
    return jaccard_join(docs, "doc_id", "sh", threshold=_JAC_T)


# ---------------------------------------------------------------------------
# Integer PageRank (operators/graph.py): Pregel dataflow, K unrolled rounds
# ---------------------------------------------------------------------------

_PR_ITER = """
    c{i} AS (
      SELECT e.dst AS node, sum(r.pr // o.d)::BIGINT AS cs
      FROM e JOIN r{p} r ON r.node = e.src JOIN outdeg o ON o.src = e.src
      GROUP BY 1
    ),
    r{i} AS (
      SELECT n.node,
             (SELECT b FROM base) + (85 * coalesce(c.cs, 0)) // 100 AS pr
      FROM nodes n LEFT JOIN c{i} c ON c.node = n.node
    )"""

_PAGERANK_ORACLE = f"""
    WITH e AS (
      SELECT DISTINCT 's' || l_suppkey::VARCHAR AS src,
                      'c' || o_custkey::VARCHAR AS dst
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    base AS (
      SELECT (15 * (1000000000000 // count(*))) // 100 AS b,
             1000000000000 // count(*) AS r0
      FROM nodes
    ),
    outdeg AS (SELECT src, count(*)::BIGINT AS d FROM e GROUP BY 1),
    r0 AS (SELECT node, (SELECT r0 FROM base) AS pr FROM nodes),
    {",".join(_PR_ITER.format(i=i, p=i - 1) for i in range(1, 4))}
    SELECT node, pr FROM (
      SELECT node, pr, row_number() OVER (ORDER BY pr DESC, node) AS rn
      FROM r3
    ) WHERE rn <= 20
    """


@register("graph_pagerank", _PAGERANK_ORACLE)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer PageRank, 3 rounds, over the supplier->customer
    trade graph (distinct lineitem x orders pairs, ids namespaced with
    's'/'c' prefixes). Every round is the Pregel join+agg dataflow with
    floor-division mass splitting - bit-identical to the oracle's 3
    unrolled CTE rounds. Top-20 by final rank, ties on node id."""
    from pyspark.sql import Window as W
    from olake_spark.operators.graph import pagerank

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
    )
    pr = pagerank(edges, iters=3)
    w = W.orderBy(F.col("pr").desc(), F.col("node"))
    return (
        pr.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 20)
        .select("node", "pr")
    )


# ---------------------------------------------------------------------------
# WebDataset WRITE planner (sources/webdataset.py wds_write_plan)
# ---------------------------------------------------------------------------

_WDS_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, strlen(text)::BIGINT AS sz,
             {_BUCKET_SQL.format(x="doc_id::VARCHAR || 'wds'")} AS h
      FROM documents
    ),
    cum AS (
      SELECT doc_id, sz, h, (h % 4)::INT AS stream,
             coalesce(sum(sz) OVER (
               PARTITION BY h % 4 ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS cum_before
      FROM t
    )
    SELECT doc_id, stream,
           (cum_before // 4096)::BIGINT AS shard_seq,
           (cum_before % 4096)::BIGINT AS offset_bytes
    FROM cum
    """


@register("webdataset_write_plan", _WDS_ORACLE)
def webdataset_write_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset shard-WRITE assignment (sources/webdataset.py
    wds_write_plan): documents hash into 4 writer streams, lay
    head-to-tail in (hash, key) order, and cut a new tar shard every
    4096 payload bytes — samples never split, shards overrun by at most
    one sample. Same two-level prefix-sum dataflow as pack_offsets (one
    shuffle, one window per stream, no global sort); the oracle pins
    every (stream, shard_seq, offset_bytes). The actual tar bytes
    (wds_build_shards) round-trip through the ingest kernels in
    tests/test_webdataset.py."""
    from olake_spark.sources.webdataset import wds_write_plan

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.octet_length("text").cast("long").alias("sz")
    )
    plan = wds_write_plan(docs, "doc_id", "sz", shard_bytes=4096, n_streams=4)
    return plan.select("doc_id", "stream", "shard_seq", "offset_bytes")


# ---------------------------------------------------------------------------
# end-to-end media curation pipeline (the media twin of
# curate_incremental_pipeline): WebDataset ingest → real decode →
# perceptual dedup → quality gate → WebDataset re-shard write plan
# ---------------------------------------------------------------------------

_MEDIA_CURATE_ORACLE = f"""
    WITH odims AS (
      SELECT doc_id::BIGINT AS id, 8 + (doc_id*7) % 57 AS w, 8 + (doc_id*11) % 41 AS h
      FROM documents WHERE doc_id % 6 = 0
    ), ob AS (
      SELECT d.id, gy.y, gx.x,
             CASE WHEN {_gray_sql("d.id", "(((gx.x+1)*d.w)//9)", "((gy.y*d.h)//8)")}
                   > {_gray_sql("d.id", "((gx.x*d.w)//9)", "((gy.y*d.h)//8)")}
                  THEN 1 ELSE 0 END AS bit
      FROM odims d, generate_series(0, 7) gy(y), generate_series(0, 7) gx(x)
    ), cdims AS (
      SELECT doc_id::BIGINT AS id, 8 + (doc_id*7) % 57 AS w, 8 + (doc_id*11) % 41 AS h
      FROM documents WHERE doc_id % 12 = 0
    ), cb AS (
      SELECT d.id + 100000000 AS id, gy.y, gx.x,
             CASE WHEN {_gray_sql("d.id", "((((((gx.x+1)*32)//9))*d.w)//32)", "((((gy.y*24)//8)*d.h)//24)")}
                   > {_gray_sql("d.id", "(((((gx.x*32)//9))*d.w)//32)", "((((gy.y*24)//8)*d.h)//24)")}
                  THEN 1 ELSE 0 END AS bit
      FROM cdims d, generate_series(0, 7) gy(y), generate_series(0, 7) gx(x)
    ), allm AS (
      SELECT o.id, o.dhash, d.w, d.h
      FROM (SELECT id, {_DHASH_WRAP} AS dhash FROM ob GROUP BY id) o
      JOIN odims d ON d.id = o.id
      UNION ALL
      SELECT id, dhash, 32 AS w, 24 AS h
      FROM (SELECT id, {_DHASH_WRAP} AS dhash FROM cb GROUP BY id)
    ), losers AS (
      SELECT DISTINCT b.id FROM allm a JOIN allm b ON a.id < b.id
      WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
    ), kept AS (
      SELECT * FROM allm
      WHERE id NOT IN (SELECT id FROM losers) AND w >= 16 AND h >= 16
    ), plan AS (
      SELECT id, dhash, w, h,
             {_BUCKET_SQL.format(x="printf('%08d', id) || 'wds'")} AS hh,
             printf('%08d', id) AS key, (3*w*h)::BIGINT AS sz
      FROM kept
    ), cum AS (
      SELECT id, dhash, w, h, (hh % 2)::INT AS stream,
             coalesce(sum(sz) OVER (
               PARTITION BY hh % 2 ORDER BY hh, key
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS cum_before
      FROM plan
    )
    SELECT id AS media_id, w::INT AS width, h::INT AS height, dhash, stream,
           (cum_before // 8192)::BIGINT AS shard_seq,
           (cum_before % 8192)::BIGINT AS offset_bytes
    FROM cum
    """


@register("media_curation_pipeline", _MEDIA_CURATE_ORACLE)
def media_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal curation flow composed END-TO-END as one lazy
    plan — the media twin of curate_incremental_pipeline: real tar shards
    carrying real BMP payloads (with planted 32×24 rescaled copies under
    shifted ids) are ingested (sources/webdataset.py untar_media, zero
    post-read shuffle), every payload is DECODED for real (stdlib codec),
    dHashed, near-dup'd via the lossless 8-band Hamming join (copies lose
    to their smaller-id originals), quality-gated on the DECODED
    dimensions (min(w, h) ≥ 16), and the survivors are assigned to output
    WebDataset shards by the two-level prefix-sum write planner. The
    oracle pins the surviving sample set AND every survivor's (stream,
    shard_seq, offset) from closed forms — interface drift between any
    two stages fails the query."""
    from olake_spark.operators.multimodal import (
        extract_features,
        image_dhash,
        image_near_dups,
    )
    from olake_spark.sources.webdataset import (
        synthesize_media_tar_shards,
        untar_media,
        wds_write_plan,
    )

    docs = table(spark, sf_dir, "documents")
    orig_ids = docs.select(F.col("doc_id").cast("long").alias("media_id")).filter(
        F.col("media_id") % 6 == 0
    )
    copy_ids = orig_ids.filter(F.col("media_id") % 12 == 0).select(
        (F.col("media_id") + F.lit(100_000_000)).alias("media_id")
    )
    shards = synthesize_media_tar_shards(orig_ids.unionByName(copy_ids))
    media = untar_media(shards)
    feats = extract_features(media)
    hashes = image_dhash(media)
    losers = image_near_dups(hashes, max_hamming=6).select(
        F.col("id_b").alias("media_id")
    ).distinct()
    kept = (
        hashes.join(losers, "media_id", "left_anti")
        .join(feats.select("media_id", "width", "height"), "media_id")
        .filter((F.col("width") >= 16) & (F.col("height") >= 16))
    )
    plan = wds_write_plan(
        kept.select(
            "media_id", "dhash", "width", "height",
            F.format_string("%08d", F.col("media_id")).alias("_key"),
            (3 * F.col("width") * F.col("height")).cast("long").alias("_sz"),
        ),
        "_key", "_sz", shard_bytes=8192, n_streams=2,
    )
    return plan.select(
        "media_id", "width", "height", "dhash", "stream", "shard_seq",
        "offset_bytes",
    )


# ---------------------------------------------------------------------------
# KMV set-overlap estimate (operators/sketches.py kmv_overlap)
# ---------------------------------------------------------------------------

_KMV_OVL_ORACLE = f"""
    WITH h AS (
      SELECT DISTINCT event_type AS grp, {_SK_H} AS h
      FROM events WHERE event_type IN ('click', 'view')
    ),
    kept AS (
      SELECT grp, h FROM (
        SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM h
      ) WHERE rn <= 64
    ),
    b2 AS (
      SELECT h, (count(*) = 2) AS in_both FROM kept GROUP BY h
    ),
    merged AS (
      SELECT h, in_both FROM (
        SELECT h, in_both, row_number() OVER (ORDER BY h) AS rn FROM b2
      ) WHERE rn <= 64
    ),
    agg AS (
      SELECT count(*)::BIGINT AS n_merged, max(h) AS kth_union_hash,
             sum(CASE WHEN in_both THEN 1 ELSE 0 END)::BIGINT AS n_both
      FROM merged
    )
    SELECT n_merged, kth_union_hash, n_both,
           round(CASE WHEN n_merged < 64 THEN n_merged::DOUBLE
                 ELSE {_KMV_NUM} / kth_union_hash::DOUBLE END, 4) AS est_union,
           round(n_both::DOUBLE / n_merged::DOUBLE, 6) AS est_jaccard,
           round((n_both::DOUBLE / n_merged::DOUBLE) *
                 (CASE WHEN n_merged < 64 THEN n_merged::DOUBLE
                  ELSE {_KMV_NUM} / kth_union_hash::DOUBLE END), 4)
             AS est_intersection
    FROM agg
    """


@register("sketch_kmv_overlap", _KMV_OVL_ORACLE)
def sketch_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard / intersection / union estimates between the click-user
    and view-user sets from MERGED KMV sketches (Beyer et al. SIGMOD'07):
    within the 64 smallest union hashes, the both-sketch fraction rho
    estimates Jaccard and rho x union-estimate the intersection size -
    the corpus-overlap primitive (how much does source A duplicate
    source B?) computed purely on mergeable sketch state."""
    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    return sk.kmv_overlap(ev, "user_id", "event_type", "click", "view", k=64)


_CMS_CELL = (
    "('0x' || substring(md5({r}::VARCHAR || '|' || {v}::VARCHAR),1,15))::BIGINT"
    f" % {sk.CMS_WIDTH}"
)

_CMS_ORACLE = f"""
    WITH rs AS (SELECT unnest(generate_series(0, {sk.CMS_DEPTH - 1})) AS r),
    counts AS (
      SELECT user_id, count(*)::BIGINT AS true_count FROM events GROUP BY 1
    ),
    cand AS (
      SELECT user_id, true_count FROM counts
      ORDER BY true_count DESC, user_id LIMIT 20
    ),
    cells AS (
      SELECT rs.r, {_CMS_CELL.format(r="rs.r", v="e.user_id")} AS c,
             count(*)::BIGINT AS cnt
      FROM events e CROSS JOIN rs
      GROUP BY 1, 2
    )
    SELECT cand.user_id, cand.true_count,
           min(coalesce(cells.cnt, 0))::BIGINT AS est_count
    FROM cand CROSS JOIN rs
    LEFT JOIN cells ON cells.r = rs.r
      AND cells.c = {_CMS_CELL.format(r="rs.r", v="cand.user_id")}
    GROUP BY 1, 2
    """


@register("sketch_cms_heavy_hitters", _CMS_ORACLE)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) frequency estimates
    for the top-20 users by event volume. The sketch STATE is exact
    integers in a sparse (row, cell) -> count relation (depth x width =
    4 x 256 counters regardless of corpus size) and merges by plain cell
    addition, so per-partition partials combine associatively; the probe
    side broadcasts the sketch — never a raw-data shuffle. Estimates are
    upper bounds (est_count >= true_count by construction), and the gate
    pins every counter's exact value through the min-over-rows probe."""
    ev = table(spark, sf_dir, "events").select("user_id")
    state = sk.cms_sketch(ev, "user_id")
    true_counts = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.col("true_count").desc(), F.col("user_id").asc())
        .limit(20)
    )
    est = sk.cms_point_estimate(state, true_counts, "user_id")
    return true_counts.join(est, "user_id").select(
        "user_id", "true_count", "est_count"
    )


# ---------------------------------------------------------------------------
# Incremental rollup maintenance (operators/incremental_agg.py)
# ---------------------------------------------------------------------------

_HLL_NUM2 = repr(sk.HLL_ALPHA * sk.HLL_M * sk.HLL_M * float(2**sk.RHO_SCALE))

_INC_ROLLUP_ORACLE = f"""
    WITH v AS (
      SELECT event_type, round(value * 1000000)::BIGINT AS vm, user_id
      FROM events
    ),
    basic AS (
      SELECT event_type, count(*)::BIGINT AS n, sum(vm)::BIGINT AS sum_micros,
             min(vm) AS min_micros, max(vm) AS max_micros
      FROM v GROUP BY 1
    ),
    h AS (SELECT event_type, {_SK_H} AS h FROM events),
    r AS (SELECT event_type, h % {sk.HLL_M} AS b, h // {sk.HLL_M} AS rest FROM h),
    rr AS (
      SELECT event_type, b,
             CASE WHEN rest = 0 THEN {sk.RHO_SCALE}
                  ELSE {sk.RHO_SCALE} - length(bin(rest)) END AS rho
      FROM r
    ),
    regs AS (SELECT event_type, b, max(rho) AS m FROM rr GROUP BY 1, 2),
    gridb AS (SELECT unnest(generate_series(0, {sk.HLL_M - 1})) AS b),
    keysd AS (SELECT DISTINCT event_type FROM regs),
    dense AS (
      SELECT k.event_type, g.b, coalesce(regs.m, 0) AS m
      FROM keysd k CROSS JOIN gridb g
      LEFT JOIN regs ON regs.event_type = k.event_type AND regs.b = g.b
    ),
    harm AS (
      SELECT event_type,
             sum((1::BIGINT << ({sk.RHO_SCALE} - m)))::BIGINT AS harmonic_scaled,
             sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero_regs
      FROM dense GROUP BY 1
    )
    SELECT b.event_type, n, sum_micros, min_micros, max_micros,
           harmonic_scaled, n_zero_regs,
           round({_HLL_NUM2} / harmonic_scaled::DOUBLE, 4) AS est_distinct
    FROM basic b JOIN harm USING (event_type)
    """


@register("incremental_rollup_merge", _INC_ROLLUP_ORACLE)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup refresh WITHOUT rescanning history
    (operators/incremental_agg.py): events split disjointly (event_id %
    5), each half builds its own mergeable per-key state (count / exact
    micro-unit sum / min / max / HLL registers), the two states MERGE
    (sums + element-wise register max) and finalize. The oracle is the
    FULL recompute over all events - so the gate itself proves
    merge(state(A), state(B)) == state(A | B), the associativity
    contract a 1000-partition ingestion rollup rests on."""
    from olake_spark.operators import incremental_agg as ia

    ev = table(spark, sf_dir, "events").select("event_type", "value", "user_id",
                                               "event_id")
    old = ev.filter(F.col("event_id") % 5 != 0)
    delta = ev.filter(F.col("event_id") % 5 == 0)
    s_old = ia.agg_state(old, ["event_type"], "value", "user_id")
    s_new = ia.agg_state(delta, ["event_type"], "value", "user_id")
    merged = ia.agg_state_merge(s_old.unionByName(s_new), ["event_type"])
    return ia.agg_finalize(merged, ["event_type"])


# ---------------------------------------------------------------------------
# DSIR importance resampling (operators/dsir.py)
# ---------------------------------------------------------------------------

from olake_spark.operators import dsir as _dsir  # noqa: E402

_DSIR_H = "('0x' || substring(md5(f),1,15))::BIGINT"
_DSIR_M = _dsir.DSIR_BUCKETS

_DSIR_ORACLE = f"""
    WITH norm AS (
      SELECT doc_id, lang,
             string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS toks
      FROM documents
    ),
    pos AS (
      SELECT doc_id, lang, unnest(toks) AS t, generate_subscripts(toks, 1) AS i
      FROM norm
    ),
    feats AS (
      SELECT doc_id, lang, 'u|' || t AS f FROM pos WHERE t <> ''
      UNION ALL
      SELECT a.doc_id, a.lang, 'b|' || a.t || ' ' || b.t AS f
      FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      WHERE a.t <> ''
    ),
    bucketed AS (SELECT doc_id, lang, {_DSIR_H} % {_DSIR_M} AS bucket FROM feats),
    docb AS (
      SELECT doc_id, bucket, count(*)::BIGINT AS cnt
      FROM bucketed WHERE lang <> 'en' GROUP BY 1, 2
    ),
    rawb AS (SELECT bucket, sum(cnt)::BIGINT AS r_cnt FROM docb GROUP BY 1),
    tgtb AS (
      SELECT bucket, count(*)::BIGINT AS t_cnt
      FROM bucketed WHERE lang = 'en' GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT sum(r_cnt) FROM rawb)::BIGINT AS R,
             (SELECT coalesce(sum(t_cnt), 0) FROM tgtb)::BIGINT AS T
    ),
    ratio AS (
      SELECT rawb.bucket,
             round(ln(
               ((coalesce(tgtb.t_cnt, 0) + 1) * (tot.R + {_DSIR_M}))::DOUBLE
               / ((rawb.r_cnt + 1) * (tot.T + {_DSIR_M}))::DOUBLE
             ) * 1000000, 0)::BIGINT AS lr_micros
      FROM rawb LEFT JOIN tgtb ON rawb.bucket = tgtb.bucket CROSS JOIN tot
    ),
    scored AS (
      SELECT docb.doc_id, sum(cnt)::BIGINT AS n_features,
             sum(cnt * lr_micros)::BIGINT AS score_micros
      FROM docb JOIN ratio ON docb.bucket = ratio.bucket GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(s.n_features, 0)::BIGINT AS n_features,
           coalesce(s.score_micros, 0)::BIGINT AS score_micros,
           round(coalesce(s.score_micros, 0) / 1000000.0, 6) AS log_weight
    FROM (SELECT DISTINCT doc_id FROM documents WHERE lang <> 'en') d
    LEFT JOIN scored s ON d.doc_id = s.doc_id
    """


@register("dsir_importance_weights", _DSIR_ORACLE)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. NeurIPS'23) target-likeness scores for the raw
    pool (non-English docs) against the English target corpus: add-1
    smoothed bag-of-hashed-ngrams likelihood ratio, summed per doc in
    EXACT micro-unit integers (partition-order-free; the gate compares
    the integer state, log_weight is its rounded double form). Both
    corpus models are 1024-row tables built map-side and broadcast —
    at 100 TB the raw pool shuffles once (per-doc feature counts) and
    the model join never shuffles it again."""
    docs = table(spark, sf_dir, "documents")
    raw = docs.filter(F.col("lang") != "en")
    target = docs.filter(F.col("lang") == "en")
    return _dsir.dsir_log_weights(raw, target, "doc_id", "text")


# ---------------------------------------------------------------------------
# Entity resolution: fuzzy blocking -> CC -> survivorship (operators/entity.py)
# ---------------------------------------------------------------------------

# the slim fixture has no address column; a 32-hex md5 of the key is the
# deterministic high-entropy stand-in (cross-entity edit distance ~27, so
# only the engineered 1- and 2-char deletions fall under the threshold)
_ER_RECORDS_SQL = """
    cust AS (
      SELECT c_custkey AS ck, c_name, md5(c_custkey::VARCHAR) AS a0, c_acctbal
      FROM customer WHERE c_custkey < 300
    ),
    records AS (
      SELECT ck*10+1 AS rid, c_name AS name, a0 AS addr, c_acctbal AS bal
      FROM cust
      UNION ALL
      SELECT ck*10+2, upper(c_name),
             substring(a0, 1, 5) || substring(a0, 7), NULL
      FROM cust
      UNION ALL
      SELECT ck*10+3, c_name,
             substring(a0, 1, 2) || substring(a0, 4, 5) || substring(a0, 10),
             c_acctbal
      FROM cust WHERE ck % 3 = 0
    )
"""

_ER_ORACLE = f"""
    WITH RECURSIVE {_ER_RECORDS_SQL},
    pairs AS MATERIALIZED (
      SELECT a.rid AS id_a, b.rid AS id_b
      FROM records a JOIN records b ON a.rid < b.rid
      WHERE abs(length(a.addr) - length(b.addr)) <= 2
        AND levenshtein(lower(a.addr), lower(b.addr)) <= 2
    ),
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    labels AS (
      SELECT rec.rid,
             least(rec.rid, coalesce(min(r.dst), rec.rid)) AS cluster_id
      FROM records rec LEFT JOIN reach r ON r.src = rec.rid
      GROUP BY rec.rid
    ),
    resolved AS (
      SELECT records.*, labels.cluster_id FROM records
      JOIN labels ON records.rid = labels.rid
    ),
    agg AS (
      SELECT cluster_id, count(*)::BIGINT AS n_records,
             min(name) AS name, max(bal) AS bal
      FROM resolved GROUP BY 1
    ),
    best_addr AS (
      SELECT cluster_id, addr FROM (
        SELECT cluster_id, addr, row_number() OVER (
          PARTITION BY cluster_id ORDER BY length(addr) DESC, addr ASC) AS rn
        FROM resolved)
      WHERE rn = 1
    )
    SELECT agg.cluster_id, agg.n_records, agg.name, agg.bal, best_addr.addr
    FROM agg JOIN best_addr ON agg.cluster_id = best_addr.cluster_id
    """


def _er_records(spark: SparkSession, sf_dir: str):
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 300)
        .select(
            "c_custkey",
            "c_name",
            F.md5(F.col("c_custkey").cast("string")).alias("a0"),
            "c_acctbal",
        )
    )
    r1 = cust.select(
        (F.col("c_custkey") * 10 + 1).alias("rid"),
        F.col("c_name").alias("name"),
        F.col("a0").alias("addr"),
        F.col("c_acctbal").alias("bal"),
    )
    r2 = cust.select(
        (F.col("c_custkey") * 10 + 2).alias("rid"),
        F.upper("c_name").alias("name"),
        F.expr("substring(a0, 1, 5) || substring(a0, 7)").alias("addr"),
        F.lit(None).cast("double").alias("bal"),
    )
    r3 = cust.filter(F.col("c_custkey") % 3 == 0).select(
        (F.col("c_custkey") * 10 + 3).alias("rid"),
        F.col("c_name").alias("name"),
        F.expr(
            "substring(a0, 1, 2) || substring(a0, 4, 5) || substring(a0, 10)"
        ).alias("addr"),
        F.col("c_acctbal").alias("bal"),
    )
    return r1.unionByName(r2).unionByName(r3)


@register("entity_resolution_golden", _ER_ORACLE)
def entity_resolution_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage end-to-end (operators/entity.py): dirty record
    variants of each customer (deterministic 1- and 2-char address
    deletions derived from the fixture) are matched via the LOSSLESS
    prefix-filtered q-gram fuzzy join (never a cross join), grouped
    transitively by connected components (r1~r2 d=1, r1~r3 d=2 chains a
    3-record entity even where r2~r3 exceeds the threshold), and folded
    to one golden record per entity by deterministic survivorship —
    most-complete address, MIN name, MAX balance (NULLs lose). The
    ORACLE brute-forces all pairs with levenshtein + a recursive
    reachability CTE, so the gate proves the indexed path finds exactly
    the clusters the quadratic path does."""
    from olake_spark.operators.entity import golden_records, resolve_entities

    records = _er_records(spark, sf_dir)
    resolved = resolve_entities(records, "rid", "addr", max_dist=2)
    return golden_records(
        resolved, "rid", longest_cols=["addr"], min_cols=["name"], max_cols=["bal"]
    ).select("cluster_id", "n_records", "name", "bal", "addr")


# ---------------------------------------------------------------------------
# Exact distributed order statistics (operators/quantiles.py)
# ---------------------------------------------------------------------------

_EXACT_Q_ORACLE = """
WITH v AS (
  SELECT l_returnflag, round(l_extendedprice * 1000000)::BIGINT AS vm
  FROM lineitem
),
n AS (SELECT l_returnflag, count(*) AS n FROM v GROUP BY 1),
r AS (
  SELECT l_returnflag, vm,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY vm) AS rk
  FROM v
)
SELECT r.l_returnflag, p.p::DOUBLE AS p, round(vm::DOUBLE / 1000000, 4) AS q,
       vm AS q_micros
FROM r JOIN n USING (l_returnflag)
JOIN (VALUES (0.5), (0.9), (0.99)) p(p) ON r.rk = ceil(p.p * n.n)
"""


@register("lineitem_exact_quantiles", _EXACT_Q_ORACLE)
def lineitem_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group p50/p90/p99 with NO global sort and NO per-group
    sort buffer (operators/quantiles.py): iterative histogram bisection
    over exact micro-unit integers — log_B(domain) map-side-combinable
    aggregation passes, each pruned by a literal global bound (parquet
    row-group skipping), all (group, p) searches advancing in one job
    per round. Bit-equal to the oracle's row_number-at-rank-ceil(p*n);
    the scale story Spark's own exact `percentile` (executor sort
    buffer) and `approx_percentile` (inexact by contract) both miss."""
    from olake_spark.operators.quantiles import exact_quantiles

    li = table(spark, sf_dir, "lineitem")
    return exact_quantiles(
        li, ["l_returnflag"], "l_extendedprice", [0.5, 0.9, 0.99], bins=8192
    )


# ---------------------------------------------------------------------------
# Triangle counting (operators/graph.py triangle_count)
# ---------------------------------------------------------------------------

_TRIANGLES_ORACLE = """
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem WHERE l_quantity <= 5
),
e AS (
  SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
  FROM ps a JOIN ps b
    ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
),
tri AS (
  SELECT e1.s1 AS n1, e1.s2 AS n2, e2.s2 AS n3
  FROM e e1
  JOIN e e2 ON e2.s1 = e1.s2
  JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
),
corners AS (
  SELECT n1 AS node FROM tri
  UNION ALL SELECT n2 FROM tri
  UNION ALL SELECT n3 FROM tri
),
nodes AS (
  SELECT s1 AS node FROM e UNION SELECT s2 FROM e
)
SELECT nodes.node, coalesce(c.n, 0)::BIGINT AS n_triangles
FROM nodes LEFT JOIN (
  SELECT node, count(*) AS n FROM corners GROUP BY 1
) c ON c.node = nodes.node
"""


@register("graph_triangles", _TRIANGLES_ORACLE)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting on the supplier co-supply graph
    (suppliers sharing a low-quantity part) via degree-ordered
    orientation (operators/graph.py triangle_count): each triangle is
    counted once at its lowest-(degree, id) corner, and the orientation
    caps oriented out-degree at O(sqrt(m)) so the wedge join never
    explodes on hubs — total wedge volume <= m^1.5, the published
    Schank/Wagner bound, regardless of skew. The oracle brute-forces
    the canonical triple join."""
    from olake_spark.operators.graph import triangle_count

    li = table(spark, sf_dir, "lineitem")
    ps = (
        li.filter(F.col("l_quantity") <= 5)
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    a, b = ps.alias("_ta"), ps.alias("_tb")
    edges = a.join(
        b,
        (F.col("_ta.l_partkey") == F.col("_tb.l_partkey"))
        & (F.col("_ta.l_suppkey") < F.col("_tb.l_suppkey")),
    ).select(
        F.col("_ta.l_suppkey").alias("src"), F.col("_tb.l_suppkey").alias("dst")
    )
    return triangle_count(edges)


# ---------------------------------------------------------------------------
# Filtered ANN + incremental IVF index maintenance (round 6)
# ---------------------------------------------------------------------------

@register(
    "similarity_topk_ivf_filtered",
    f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id % 97 = 0
    ), assign AS (
      SELECT e.vec_id, e.embedding, e.label, c.cent_id,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round({_COS.format(a='e.embedding', b='c.cv')}, 9) DESC,
                        c.cent_id) AS rn
      FROM embeddings e CROSS JOIN cents c
    ), cells AS (
      SELECT vec_id, embedding, label, cent_id AS cell FROM assign WHERE rn = 1
    ), q AS (
      SELECT vec_id AS query_id, embedding AS qv, cell FROM cells WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round({_COS.format(a='q.qv', b='c.embedding')}, 9) AS s9
      FROM q JOIN cells c
        ON c.cell = q.cell AND c.vec_id <> q.query_id AND c.label = 2
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, neighbor_id) AS "rank"
      FROM scored
    )
    SELECT query_id, neighbor_id, "rank", round(s9, 6) AS cosine_sim
    FROM ranked WHERE "rank" <= 5
    """,
)
def similarity_topk_ivf_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN (the metadata-constrained search every production
    vector store needs — FAISS IDSelector / Lucene filtered kNN): top-k
    restricted to ``label = 2`` neighbors. PRE-filter strategy: the
    predicate applies to the INDEX relation before the cell join, so the
    scan prunes to matching rows inside each probed cell (predicate
    pushdown into the index scan; with the index persisted bucketed on
    ``_cell`` + file-skipping stats on the label column the non-matching
    files never open). Post-filtering top-k would silently return < k
    when the filter is selective; pre-filtering keeps k full within the
    probed cells — and the oracle proves it against the same cell
    pruning."""
    emb = table(spark, sf_dir, "embeddings")
    cents = sim.stride_centroids(emb)
    # cell assignment is per-row (centroids frozen), so filtering the
    # corpus BEFORE assignment ≡ filtering the persisted index relation —
    # the form that lets parquet stats skip non-matching index files
    index = sim.ivf_build_index(emb.filter(F.col("label") == 2), cents)
    return sim.ivf_topk(
        emb.filter(F.col("vec_id") < 5),
        centroids=cents,
        index=index,
        k=5,
    )


@register(
    "similarity_topk_ivf_appended",
    f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
      WHERE vec_id % 97 = 0 AND vec_id < 400
    ), assign AS (
      SELECT e.vec_id, e.embedding, c.cent_id,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round({_COS.format(a='e.embedding', b='c.cv')}, 9) DESC,
                        c.cent_id) AS rn
      FROM embeddings e CROSS JOIN cents c
    ), cells AS (
      SELECT vec_id, embedding, cent_id AS cell FROM assign WHERE rn = 1
    ), q AS (
      SELECT vec_id AS query_id, embedding AS qv, cell FROM cells WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round({_COS.format(a='q.qv', b='c.embedding')}, 9) AS s9
      FROM q JOIN cells c ON c.cell = q.cell AND c.vec_id <> q.query_id
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, neighbor_id) AS "rank"
      FROM scored
    )
    SELECT query_id, neighbor_id, "rank", round(s9, 6) AS cosine_sim
    FROM ranked WHERE "rank" <= 5
    """,
)
def similarity_topk_ivf_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance (FAISS ``index.add`` semantics):
    the corpus arrives in two batches — the index is BUILT on the first
    (centroids frozen from it), and the second batch only runs
    ``ivf_assign`` for ITS OWN rows (cost ∝ batch × K centroids, never a
    corpus rescan) and unions into the index relation. The oracle
    rebuilds single-shot over everything, so the gate proves
    append(index(A), B) ≡ index(A ∪ B) under frozen centroids — the same
    refresh-cost-∝-batch contract as incremental dedup and the rollup
    delta commit. (Centroid RETRAINING drift is the documented limit:
    retrain is a rebuild, by design.)"""
    emb = table(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    cents = sim.stride_centroids(old)
    index_old = sim.ivf_build_index(old, cents)
    appended = sim.ivf_assign(
        new.select("vec_id", "embedding"), cents, "vec_id", "embedding"
    )
    full_index = index_old.unionByName(appended)
    return sim.ivf_topk(
        emb.filter(F.col("vec_id") < 5), centroids=cents, index=full_index, k=5
    )


# ---------------------------------------------------------------------------
# Corpus bigram LM (operators/lm.py): the KenLM-shaped quality filter on
# exact-integer statistics
# ---------------------------------------------------------------------------

_BIGRAMS_SQL = (
    f"list_filter(list_transform(range(1, greatest(len({_TOKS})-1,1)+1), "
    f"i -> struct_pack(w1 := ({_TOKS})[i], w2 := ({_TOKS})[i+1])), "
    "p -> p.w2 IS NOT NULL)"
)

_LM_TOP_ORACLE = f"""
    WITH bg AS (
      SELECT unnest({_BIGRAMS_SQL}) AS p FROM documents
    ),
    cnts AS (
      SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS cnt FROM bg GROUP BY 1, 2
    )
    SELECT w1, w2, cnt FROM (
      SELECT *, row_number() OVER (ORDER BY cnt DESC, w1, w2) AS rn FROM cnts
    ) WHERE rn <= 25
    """


@register("text_bigram_lm_top", _LM_TOP_ORACLE)
def text_bigram_lm_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM training (operators/lm.py bigram_counts): one explode +
    one map-side-combinable groupBy over whitespace tokens; the model
    relation is vocabulary-sized (Zipf-bounded), never corpus-sized.
    Reported as the deterministic top-25 (cnt desc, then bigram) so the
    oracle pins the full count table through its head."""
    from pyspark.sql import Window as W

    from olake_spark.operators.lm import bigram_counts

    lm = bigram_counts(table(spark, sf_dir, "documents"))
    w = W.partitionBy().orderBy(F.col("cnt").desc(), "w1", "w2")
    return (
        lm.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .select("w1", "w2", "cnt")
    )


_LM_SCORE_ORACLE = f"""
    WITH bg AS (
      SELECT unnest({_BIGRAMS_SQL}) AS p FROM documents
    ),
    lm AS (
      SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS cnt FROM bg GROUP BY 1, 2
    ),
    occ AS (
      SELECT doc_id, p.w1 AS w1, p.w2 AS w2
      FROM (SELECT doc_id, unnest({_BIGRAMS_SQL}) AS p
            FROM documents WHERE doc_id < 120)
    ),
    j AS (
      SELECT o.doc_id, coalesce(lm.cnt, 0) AS c
      FROM occ o LEFT JOIN lm ON lm.w1 = o.w1 AND lm.w2 = o.w2
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_bigrams,
           sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_known,
           round(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) / count(*), 6)
             AS coverage,
           round(sum(c) / count(*), 4) AS avg_bigram_cnt
    FROM j GROUP BY doc_id
    """


@register("text_bigram_lm_score", _LM_SCORE_ORACLE)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-distribution scoring against the corpus bigram LM (operators/
    lm.py lm_coverage_score) — the CCNet/Gopher-style LM quality filter
    on EXACT integers: per doc, the share of bigram occurrences the LM
    saw >= 2 times and the mean observed count, integers divided once at
    the end (same IEEE double in any engine — no float log-prob sum
    whose addition order could flip a rounding). Corpus rows shuffle
    once on doc_id; the vocabulary-sized LM broadcasts."""
    from olake_spark.operators.lm import bigram_counts, lm_coverage_score

    docs = table(spark, sf_dir, "documents")
    lm = bigram_counts(docs)
    return lm_coverage_score(
        docs.filter(F.col("doc_id") < 120), lm, min_count=2
    )


# ---------------------------------------------------------------------------
# k-core decomposition (operators/graph.py k_core): fixed-round peeling
# ---------------------------------------------------------------------------

def _kcore_round_cte(i: int, k: int) -> str:
    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs at every
    # reference, and the unrolled round chain re-expands EXPONENTIALLY
    # without it (3.4 s -> 0.05 s oracle)
    return (
        f"d{i} AS MATERIALIZED (SELECT u.a AS node, count(*) AS degree "
        f"FROM und u "
        f"JOIN a{i-1} x ON u.a = x.node JOIN a{i-1} y ON u.b = y.node "
        f"GROUP BY 1),\n"
        f"a{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE degree >= {k})"
    )


_KCORE_K, _KCORE_ROUNDS = 3, 6

_KCORE_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM (SELECT * FROM lineitem WHERE l_orderkey % 4 = 0) a
  JOIN (SELECT * FROM lineitem WHERE l_orderkey % 4 = 0) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (
  SELECT src, dst FROM pairs
  WHERE ('0x' || substring(md5(src::VARCHAR || '|' || dst::VARCHAR), 1, 15))
        ::BIGINT % 100 < 16
),
und AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM edges WHERE src <> dst
  UNION
  SELECT dst AS a, src AS b FROM edges WHERE src <> dst
),
a0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM und),
{",".join(_kcore_round_cte(i, _KCORE_K) for i in range(1, _KCORE_ROUNDS + 1))}
SELECT node, degree FROM d{_KCORE_ROUNDS} WHERE degree >= {_KCORE_K}
"""


@register("graph_kcore", _KCORE_ORACLE)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (operators/graph.py k_core; Matula-Beck
    peeling, 6 unrolled rounds at k=3) over a deterministically
    md5-sampled part co-occurrence graph — the dense-subgraph extractor
    behind community mining and spam-graph pruning. Each round
    semi-joins the surviving node set on both endpoints and recomputes
    degrees map-side; a lazy checkpoint per round keeps the plan linear.
    The fixture cascades (1604 -> 1547 survivors) and stabilizes inside
    the 6-round contract, so the fixed-round result IS the 3-core;
    degrees are exact integers and the oracle unrolls the same 6 CTE
    rounds bit-for-bit. (The natural TPC-H co-occurrence graph is too
    uniform to cascade — the 4%% edge sample is what makes peeling
    non-trivial, and the sampling hash is the repo-wide md5 H60 so
    DuckDB reproduces the same subgraph; quarter-orderkey scoping keeps the
    brute-force pair CTE inside the gate budget.)"""
    from olake_spark.operators.graph import k_core

    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .filter(F.col("l_orderkey") % 4 == 0)
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    ).distinct()
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("src").cast("string"),
                    F.col("dst").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    edges = pairs.filter(F.pmod(h, F.lit(100)) < 16)
    return k_core(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)


# ---------------------------------------------------------------------------
# Personalized PageRank (operators/graph.py personalized_pagerank)
# ---------------------------------------------------------------------------

_PPR_ITER = """
    pc{i} AS (
      SELECT e.dst AS node, sum(r.ppr // o.d)::BIGINT AS cs
      FROM e JOIN pr{p} r ON r.node = e.src JOIN outdeg o ON o.src = e.src
      GROUP BY 1
    ),
    pr{i} AS (
      SELECT n.node, n.b + (85 * coalesce(c.cs, 0)) // 100 AS ppr
      FROM nodes2 n LEFT JOIN pc{i} c ON c.node = n.node
    )"""

_PPR_ORACLE = f"""
    WITH e AS (
      SELECT DISTINCT 's' || l_suppkey::VARCHAR AS src,
                      'c' || o_custkey::VARCHAR AS dst
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    seeds AS (SELECT 's' || k::VARCHAR AS node
              FROM (SELECT unnest([1, 2, 3, 4, 5]) AS k)),
    sm AS (
      SELECT node, 1000000000000 // (SELECT count(*) FROM seeds) AS m
      FROM seeds
    ),
    nodes2 AS (
      SELECT n.node, coalesce(s.m, 0)::BIGINT AS r0,
             ((15 * coalesce(s.m, 0)) // 100)::BIGINT AS b
      FROM nodes n LEFT JOIN sm s ON s.node = n.node
    ),
    outdeg AS (SELECT src, count(*)::BIGINT AS d FROM e GROUP BY 1),
    pr0 AS (SELECT node, r0 AS ppr FROM nodes2),
    {",".join(_PPR_ITER.format(i=i, p=i - 1) for i in range(1, 4))}
    SELECT node, ppr FROM (
      SELECT node, ppr, row_number() OVER (ORDER BY ppr DESC, node) AS rn
      FROM pr3 WHERE ppr > 0
    ) WHERE rn <= 20
    """


@register("graph_personalized_pagerank", _PPR_ORACLE)
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a 5-supplier seed set over the
    supplier->customer trade graph (operators/graph.py
    personalized_pagerank; Haveliwala 2002): teleport mass returns to
    the SEEDS, so the stationary mass ranks customers by proximity to
    those suppliers — the related-items recommendation primitive. Same
    exact-integer Pregel dataflow as graph_pagerank (floor-division
    mass, 85//100 damping, 3 unrolled rounds) so the oracle reproduces
    every ppr bit-for-bit; the seed relation broadcasts. Top-20 positive
    ranks, ties on node id."""
    from pyspark.sql import Window as W

    from olake_spark.operators.graph import personalized_pagerank

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
    )
    seeds = spark.range(1, 6).select(
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("node")
    )
    pr = personalized_pagerank(edges, seeds, iters=3).filter(F.col("ppr") > 0)
    w = W.orderBy(F.col("ppr").desc(), F.col("node"))
    return (
        pr.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 20)
        .select("node", "ppr")
    )


# ---------------------------------------------------------------------------
# Feature binning with FROZEN edges (fit on train, transform everything) —
# the train/serve-skew guard, composed from exact_quantiles
# ---------------------------------------------------------------------------

_BINNING_ORACLE = """
WITH v AS (
  SELECT l_orderkey, round(l_extendedprice * 1000000)::BIGINT AS vm
  FROM lineitem
),
train AS (SELECT vm FROM v WHERE l_orderkey % 2 = 0),
n AS (SELECT count(*) AS n FROM train),
r AS (
  SELECT vm, row_number() OVER (ORDER BY vm) AS rk FROM train
),
edges AS MATERIALIZED (
  SELECT p.p, r.vm AS edge
  FROM r JOIN n ON true
  JOIN (SELECT unnest([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS p) p
    ON r.rk = greatest(1, ceil(p.p * n.n))
),
binned AS (
  SELECT v.vm, (SELECT count(*) FROM edges e WHERE e.edge <= v.vm) AS bin
  FROM v
)
SELECT bin::INT AS bin, count(*)::BIGINT AS n,
       round(min(vm) / 1000000.0, 2) AS min_price,
       round(max(vm) / 1000000.0, 2) AS max_price
FROM binned GROUP BY 1
"""


@register("feature_binning_frozen_edges", _BINNING_ORACLE)
def feature_binning_frozen_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile feature binning with FROZEN edges — fit decile edges on
    the TRAIN split only (even orderkeys) via operators/
    quantiles.exact_quantiles (exact micro-unit order statistics, no
    sort buffer), then transform the WHOLE relation against those
    frozen edges: bin = |edges ≤ v| via a broadcast of the 9-row edge
    set. This is the train/serve-skew guard — re-fitting edges on serve
    data silently shifts bins; frozen edges can't. Report: per-bin count
    + min/max (10 rows at any scale)."""
    from olake_spark.operators.quantiles import exact_quantiles

    li = table(spark, sf_dir, "lineitem")
    vm = F.round(F.col("l_extendedprice") * 1_000_000).cast("long")
    v = li.select(F.col("l_orderkey"), vm.alias("vm"))
    train = li.filter(F.col("l_orderkey") % 2 == 0).select(
        F.lit(1).alias("_g"), "l_extendedprice"
    )
    # q_micros IS the exact micro-unit edge (exact_quantiles quantizes by
    # 10^6 internally — feed it the raw price, never pre-scaled values,
    # or the scaling would compound)
    edges = exact_quantiles(
        train, ["_g"], "l_extendedprice",
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9],
        bins=8192,
    ).select(F.col("q_micros").alias("edge"))
    # bin per DISTINCT value (9x fan-out over the distinct relation only),
    # then join the bin map back — binning the raw rows through the cross
    # join would collapse duplicate values
    vm_bins = (
        v.select("vm").distinct()
        .crossJoin(F.broadcast(edges))
        .groupBy("vm")
        .agg(
            F.sum(
                F.when(F.col("edge") <= F.col("vm"), 1).otherwise(0)
            ).alias("bin")
        )
    )
    return (
        v.join(vm_bins, "vm")
        .groupBy(F.col("bin").cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("vm") / 1_000_000.0, 2).alias("min_price"),
            F.round(F.max("vm") / 1_000_000.0, 2).alias("max_price"),
        )
    )


# ---------------------------------------------------------------------------
# Fixed-round connected components (operators/graph.py
# connected_components_fixed) — the action-free flavor of the dedup
# cluster primitive, oracle-certified round by round
# ---------------------------------------------------------------------------

_CC_ROUNDS = 8


def _cc_round_cte(i: int) -> str:
    # AS MATERIALIZED is load-bearing (kcore lesson): DuckDB inlines plain
    # CTEs at every reference and the round chain re-expands exponentially
    return (
        f"p{i} AS MATERIALIZED (SELECT node, min(label) AS label FROM ("
        f"SELECT node, label FROM l{i-1} "
        f"UNION ALL SELECT u.b AS node, x.label FROM und u "
        f"JOIN l{i-1} x ON u.a = x.node) GROUP BY node),\n"
        f"l{i} AS MATERIALIZED (SELECT x.node, y.label AS label "
        f"FROM p{i} x JOIN p{i} y ON x.label = y.node)"
    )


_CC_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM (SELECT * FROM lineitem WHERE l_orderkey % 4 = 0) a
  JOIN (SELECT * FROM lineitem WHERE l_orderkey % 4 = 0) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (
  SELECT src, dst FROM pairs
  WHERE ('0x' || substring(md5(src::VARCHAR || '|' || dst::VARCHAR), 1, 15))
        ::BIGINT % 100 < 8
),
und AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM edges WHERE src <> dst
  UNION
  SELECT dst AS a, src AS b FROM edges WHERE src <> dst
),
l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM und),
{",".join(_cc_round_cte(i) for i in range(1, _CC_ROUNDS + 1))}
SELECT node, label AS component FROM l{_CC_ROUNDS}
"""


@register("graph_connected_components", _CC_ORACLE)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-round connected components (operators/graph.py
    connected_components_fixed): min-label propagation + pointer
    shortcutting, 8 unrolled rounds, over an md5-sampled (8%) part
    co-occurrence graph that fragments into 19 components — the cluster
    primitive behind every dedup "which duplicates are the same
    document" step, here certified bit-for-bit against 8 unrolled CTE
    round pairs (the dedup pipeline's convergence-loop twin lives in
    operators/dedup.connected_components). The fixture stabilizes at
    round 8 (round 9 changes nothing), so the fixed-round labels ARE
    the true component min-ids. Labels-sized relations are all that
    iterate; the raw pair fan-out happens once."""
    from olake_spark.operators.graph import connected_components_fixed

    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .filter(F.col("l_orderkey") % 4 == 0)
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    ).distinct()
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("src").cast("string"),
                    F.col("dst").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    edges = pairs.filter(F.pmod(h, F.lit(100)) < 8)
    return connected_components_fixed(edges, rounds=_CC_ROUNDS)


@register(
    "text_zipf_slope",
    f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS t FROM documents),
    counts AS (SELECT t, count(*) AS c FROM tok WHERE t <> '' GROUP BY t),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, t) AS r
      FROM counts QUALIFY r <= 1000
    ),
    m AS (
      SELECT count(*)::BIGINT AS v,
        sum(floor(ln(r::DOUBLE) * 1000000000)::BIGINT) AS sxn,
        sum(floor(ln(c::DOUBLE) * 1000000000)::BIGINT) AS syn,
        sum(floor(ln(r::DOUBLE) * ln(r::DOUBLE) * 1000000000)::BIGINT) AS sxxn,
        sum(floor(ln(r::DOUBLE) * ln(c::DOUBLE) * 1000000000)::BIGINT) AS sxyn
      FROM ranked
    ),
    f AS (
      SELECT v, v::DOUBLE AS n,
             sxn/1000000000.0 AS sx, syn/1000000000.0 AS sy,
             sxxn/1000000000.0 AS sxx, sxyn/1000000000.0 AS sxy
      FROM m
    ),
    g AS (
      SELECT v, n, sx, sy,
             n*sxx - sx*sx AS den, n*sxy - sx*sy AS num
      FROM f
    )
    SELECT v,
      CASE WHEN den > 0 THEN round(num/den, 6) END AS slope,
      CASE WHEN den > 0 THEN round((sy - (num/den)*sx)/n, 6) END AS intercept
    FROM g
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope of the corpus unigram distribution
    (operators/text.zipf_slope) — natural text sits near −1; templated
    or synthetic corpora drift, so the fit is a one-number generated-
    text / corpus-mix alarm. One token shuffle; the top-1000 ranking is
    vocabulary-sized; the regression moments are nano-floored BIGINT
    sums of per-token ln terms (order-free), finished by two closed-form
    divisions."""
    from olake_spark.operators.text import zipf_slope

    docs = table(spark, sf_dir, "documents")
    return zipf_slope(docs, "text", top_v=1000)
