"""Corpus-curation queries (round 2): repetition filtering, PII
redaction, benchmark decontamination, sequence packing, shard
balancing, and value-checked multimodal frame sampling.

These extend the LLM-pipeline surface (SURVEY.md §2.4) between
"corpus is deduplicated" (queries/llm.py, queries/training.py) and
"tokens reach the trainer". Every query here has an exact DuckDB
oracle — including the two that are NOT plain column algebra
(q_pack_sequences folds sequentially per stream and is oracled by a
recursive CTE; q_multimodal_frames value-checks binary frame bytes
against pure-SQL hex arithmetic).

The reference (samply/fhir2sql, /root/reference/src/main.rs) has no
counterpart for any of these; they exist for the north-star
training-data pipeline (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir2sql_spark.operators import packing, text
from fhir2sql_spark.operators.dedup import ngram_contamination
from fhir2sql_spark.operators.multimodal import frame_sample, synth_blobs
from fhir2sql_spark.registry import query
from fhir2sql_spark.tables import load


@query(
    "q_text_repetition",
    oracle="""
    WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    pos AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 2)) AS i
        FROM s
    ),
    g AS (
        SELECT doc_id,
               toks[CAST(i AS INT)] || ' ' || toks[CAST(i+1 AS INT)]
                 || ' ' || toks[CAST(i+2 AS INT)] AS gram
        FROM pos
    )
    SELECT doc_id,
           COUNT(*) AS n_grams,
           COUNT(DISTINCT gram) AS n_distinct,
           round(CAST(COUNT(*) - COUNT(DISTINCT gram) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS rep_ratio,
           (CAST(COUNT(*) - COUNT(DISTINCT gram) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) > 0.1 AS is_repetitive
    FROM g GROUP BY doc_id
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram repetition-ratio quality filter: (total - distinct) /
    total n-grams per doc, flag > 0.1. All JVM-side array ops — zero
    shuffles (operators/text.py:repetition_features); the flag uses
    the UNROUNDED IEEE ratio of exact ints in both engines."""
    rep = text.repetition_features(load(spark, sf_dir, "documents"), n=3)
    return rep.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "rep_ratio",
        "is_repetitive",
    )


# Synthetic PII injection shared by the Spark plan and the oracle:
# deterministic, built from doc_id only, so both engines construct the
# byte-identical pre-redaction text (the fixture corpus itself carries
# no PII to scrub).
_PII_SQL = """
        CASE WHEN doc_id % 7 = 0
             THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com now'
             ELSE text END
        || CASE WHEN doc_id % 5 = 0
                THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
"""


@query(
    "q_text_redact",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, {_PII_SQL} AS t FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{text.EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{text.PHONE_RE}')) AS INT) AS n_phones,
           regexp_replace(regexp_replace(t, '{text.EMAIL_RE}', '<EMAIL>', 'g'),
                          '{text.PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM p
    """,
)
def q_text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: tag-replace emails/phones and count removals
    (operators/text.py:redact_pii). PII is injected in-plan from
    doc_id so the pre-redaction text is identical in both engines;
    patterns stay inside the Java-regex/RE2 common subset."""
    docs = load(spark, sf_dir, "documents")
    with_pii = docs.select(
        "doc_id", F.expr(_PII_SQL.replace("AS VARCHAR", "AS STRING")).alias("text")
    )
    out = text.redact_pii(with_pii)
    return out.select(
        "doc_id",
        F.col("n_emails").cast("int").alias("n_emails"),
        F.col("n_phones").cast("int").alias("n_phones"),
        "redacted",
    )


@query(
    "q_decontaminate",
    oracle="""
    WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    pos AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 4)) AS i
        FROM s
    ),
    g AS (
        SELECT DISTINCT doc_id,
               toks[CAST(i AS INT)] || ' ' || toks[CAST(i+1 AS INT)]
                 || ' ' || toks[CAST(i+2 AS INT)] || ' ' || toks[CAST(i+3 AS INT)]
                 || ' ' || toks[CAST(i+4 AS INT)] AS gram
        FROM pos
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 7 = 0),
    corpus AS (SELECT doc_id, gram FROM g WHERE doc_id % 7 <> 0)
    SELECT c.doc_id, COUNT(*) AS n_matched_grams
    FROM corpus c JOIN bench b USING (gram)
    GROUP BY c.doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing >= 1 word 5-gram
    with the benchmark slice (doc_id % 7 = 0 stands in for an eval
    suite). The benchmark n-gram set is broadcast — the corpus never
    shuffles (operators/dedup.py:ngram_contamination)."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 7 == 0)
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    return ngram_contamination(corpus, bench, n=5)


@query(
    "q_pack_sequences",
    oracle="""
    WITH RECURSIVE t AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM documents
    ),
    pack(lang, rn, doc_id, n_tokens, acc, bin) AS (
        SELECT lang, rn, doc_id, n_tokens, n_tokens, 0 FROM t WHERE rn = 1
        UNION ALL
        SELECT t.lang, t.rn, t.doc_id, t.n_tokens,
               CASE WHEN p.acc + t.n_tokens > 256
                    THEN t.n_tokens ELSE p.acc + t.n_tokens END,
               CASE WHEN p.acc + t.n_tokens > 256
                    THEN p.bin + 1 ELSE p.bin END
        FROM pack p JOIN t ON t.lang = p.lang AND t.rn = p.rn + 1
    )
    SELECT doc_id, lang, n_tokens, CAST(bin AS INT) AS bin_id FROM pack
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential context-window packing (capacity 256 tokens)
    per lang stream, docs in doc_id order — the bin-assignment step of
    training-sequence packing. Inherently a sequential fold, so it
    runs as applyInPandas per stream (operators/packing.py); the
    oracle replays the identical fold as a recursive CTE."""
    return packing.pack_greedy(
        load(spark, sf_dir, "documents"), capacity=256, stream_col="lang"
    )


@query(
    "q_pack_sequences_bfd",
    oracle="""
    WITH RECURSIVE t AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY len(string_split(text, ' ')) DESC,
                                           doc_id) AS rn
        FROM documents
    ),
    pack(lang, rn, doc_id, n_tokens, loads, bin) AS (
        SELECT lang, rn, doc_id, n_tokens, [n_tokens], 0
        FROM t WHERE rn = 1
        UNION ALL
        SELECT t.lang, t.rn, t.doc_id, t.n_tokens,
            CASE WHEN list_max(list_filter(p.loads,
                                           x -> x + t.n_tokens <= 256))
                      IS NULL
                 THEN list_append(p.loads, t.n_tokens)
                 ELSE list_concat(list_concat(
                        p.loads[1:list_position(p.loads,
                            list_max(list_filter(p.loads,
                                x -> x + t.n_tokens <= 256))) - 1],
                        [list_max(list_filter(p.loads,
                            x -> x + t.n_tokens <= 256)) + t.n_tokens]),
                        p.loads[list_position(p.loads,
                            list_max(list_filter(p.loads,
                                x -> x + t.n_tokens <= 256))) + 1:])
            END,
            CASE WHEN list_max(list_filter(p.loads,
                                           x -> x + t.n_tokens <= 256))
                      IS NULL
                 THEN len(p.loads)
                 ELSE list_position(p.loads,
                        list_max(list_filter(p.loads,
                            x -> x + t.n_tokens <= 256))) - 1
            END
        FROM pack p JOIN t ON t.lang = p.lang AND t.rn = p.rn + 1
    )
    SELECT doc_id, lang, n_tokens, CAST(bin AS INT) AS bin_id FROM pack
    """,
)
def q_pack_sequences_bfd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-fit-decreasing packing — the quality twin of
    q_pack_sequences (SURVEY §8 r9 candidate): docs per lang stream
    sorted by (n_tokens DESC, doc_id), each placed into the FULLEST
    bin it still fits (tie: lowest bin id), else a new bin. BFD is
    the classical 11/9·OPT + 6/9 bin-packing bound vs greedy
    next-fit's 2·OPT — on this fixture it packs the same corpus into
    measurably fewer bins (pinned in tests/test_round10_ops.py
    alongside capacity-respect and same-corpus coverage).

    Exactness: the fold carries LIST state (per-bin loads), replayed
    in the oracle as a DuckDB recursive CTE over a list column —
    list_position picks the FIRST occurrence of the max fitting load,
    the same tie-break the pandas fold uses; all-integer arithmetic.
    Scale shape: identical to q_pack_sequences (applyInPandas per
    stream key; composite lang x shard keys bound group size at
    100 TB — bins never cross stream keys)."""
    return packing.pack_bfd(
        load(spark, sf_dir, "documents"), capacity=256, stream_col="lang"
    )


@query(
    "q_shard_balance",
    oracle="""
    WITH sized AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, n_tokens,
               ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS rnk
        FROM sized
    )
    SELECT doc_id, n_tokens,
           CAST(CASE WHEN (rnk // 8) % 2 = 0
                     THEN rnk % 8 ELSE 7 - (rnk % 8) END AS INT) AS shard
    FROM ranked
    """,
)
def q_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic balanced sharding for training export: serpentine
    rank-dealing over (n_tokens DESC, doc_id) into 8 shards
    (operators/packing.py:shard_assign — see its docstring for the
    distributed-rank form the global window becomes at 100 TB).

    Registered with ``distributed=True`` (round-4): the rank comes
    from range-repartition + per-partition windows + offset join
    (operators/packing.py:distributed_rank), property-tested
    identical to the global window and free of the single-task
    ``WindowExec: No Partition Defined`` plan."""
    return packing.shard_assign(
        load(spark, sf_dir, "documents"), n_shards=8, distributed=True
    )


@query(
    "q_multimodal_frames",
    oracle="""
    WITH blobs AS (
      SELECT range AS blob_id,
             CAST(64 + (range * 131) % 4033 AS INT) AS blob_len,
             substring(repeat(sha256('blob-' || CAST(range AS VARCHAR)), 130),
                       1, CAST((64 + (range * 131) % 4033) * 2 AS INT)) AS hx
      FROM range(0, 200)
    )
    SELECT blob_id, CAST(i AS INT) AS frame_no,
           substring(hx, CAST(i * 512 + 1 AS INT), 512) AS frame_hex,
           CAST(length(substring(hx, CAST(i * 512 + 1 AS INT), 512)) // 2
                AS INT) AS frame_len
    FROM blobs, range(0, 20) t(i)
    WHERE i <= FLOOR(blob_len / 256.0)
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride frame sampling over binary payloads
    (operators/multimodal.py:frame_sample, stride 256 B), frame BYTES
    value-checked: the blob fixture is pure SQL both engines reproduce
    byte-identically, so each frame's hex must equal the oracle's
    substring arithmetic — this pins the per-frame offset (ADVICE r1:
    frame_sample previously emitted the first window for every
    frame_no)."""
    frames = frame_sample(synth_blobs(spark, n=200), every_n_bytes=256)
    return frames.select(
        "blob_id",
        F.col("frame_no").cast("int").alias("frame_no"),
        F.lower(F.hex("frame_bytes")).alias("frame_hex"),
        F.length("frame_bytes").cast("int").alias("frame_len"),
    )


@query(
    "q_multimodal_embed",
    oracle="""
    WITH blobs AS (
      SELECT range AS blob_id,
             CAST(64 + (range * 131) % 4033 AS INT) AS blob_len,
             substring(repeat(sha256('blob-' || CAST(range AS VARCHAR)), 130),
                       1, CAST((64 + (range * 131) % 4033) * 2 AS INT)) AS hx
      FROM range(0, 200)
    ),
    nib AS (
      -- bucket = byte >> 5 depends only on the byte's FIRST hex
      -- nibble: (16*n1 + n2) // 32 == n1 // 2 because n2 <= 15
      SELECT blob_id,
             (strpos('0123456789abcdef',
                     substring(hx, CAST(i * 2 + 1 AS INT), 1)) - 1) // 2 AS b
      FROM blobs, range(0, 4100) t(i)
      WHERE i < blob_len
    )
    SELECT blob_id,
           CAST(SUM(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS INT) AS h0,
           CAST(SUM(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS INT) AS h1,
           CAST(SUM(CASE WHEN b = 2 THEN 1 ELSE 0 END) AS INT) AS h2,
           CAST(SUM(CASE WHEN b = 3 THEN 1 ELSE 0 END) AS INT) AS h3,
           CAST(SUM(CASE WHEN b = 4 THEN 1 ELSE 0 END) AS INT) AS h4,
           CAST(SUM(CASE WHEN b = 5 THEN 1 ELSE 0 END) AS INT) AS h5,
           CAST(SUM(CASE WHEN b = 6 THEN 1 ELSE 0 END) AS INT) AS h6,
           CAST(SUM(CASE WHEN b = 7 THEN 1 ELSE 0 END) AS INT) AS h7
    FROM nib GROUP BY blob_id
    """,
)
def q_multimodal_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary -> feature-vector extraction through the real Arrow
    path (operators/multimodal.py:byte_histogram_features): numpy
    byte-bucket histogram per blob via mapInPandas, value-checked
    against DuckDB recomputing the buckets from hex nibbles. The
    stand-in kernel is exact-integer; a production pipeline swaps in
    an image/audio model with the same plumbing."""
    from fhir2sql_spark.operators.multimodal import byte_histogram_features

    return byte_histogram_features(synth_blobs(spark, n=200))


@query(
    "q_multimodal_resize",
    oracle="""
    WITH blobs AS (
      SELECT range AS blob_id,
             CAST(64 + (range * 131) % 4033 AS INT) AS blob_len,
             substring(repeat(sha256('blob-' || CAST(range AS VARCHAR)), 130),
                       1, CAST((64 + (range * 131) % 4033) * 2 AS INT)) AS hx
      FROM range(0, 200)
    ),
    img AS (SELECT blob_id, blob_len, hx FROM blobs WHERE blob_id % 4 = 0)
    SELECT blob_id,
           CAST(8 AS INT) AS width,
           CAST(8 AS INT) AS height,
           string_agg(
             substring(hx, CAST(i * (blob_len // 64) * 2 + 1 AS INT), 2),
             '' ORDER BY i) AS resized_hex
    FROM img, range(0, 64) t(i)
    GROUP BY blob_id
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing (operators/multimodal.py:resize_images,
    8x8 target) with the output BYTES value-checked: the deterministic
    stand-in kernel stride-samples source bytes (position i*stride,
    stride = len//64 >= 1 since every fixture blob is >= 64 B, so the
    64-byte thumbnail never pads), and the oracle replays exactly that
    arithmetic over the fixture's hex text. Only image/* rows cross
    the Python boundary — the mime filter sits upstream of
    mapInPandas. A production pipeline swaps the kernel for
    PIL.Image.resize behind the same Arrow contract."""
    from fhir2sql_spark.operators.multimodal import resize_images

    resized = resize_images(synth_blobs(spark, n=200), target_w=8, target_h=8)
    return resized.select(
        "blob_id",
        "width",
        "height",
        F.lower(F.hex("content")).alias("resized_hex"),
    )


@query(
    "q_multimodal_phash_dedup",
    oracle="""
    WITH blobs AS (
      SELECT range AS blob_id, range // 4 AS grp,
             CAST(range % 4 AS INT) * 13 + 7 AS p
      FROM range(0, 200)
    ),
    hxs AS (
      SELECT blob_id,
             substring(h0, 1, p*2)
               || substring(sha256('perturb-' || CAST(blob_id AS VARCHAR)),
                            1, 2)
               || substring(h0, p*2+3) AS hx
      FROM (
        SELECT blob_id, p,
               substring(repeat(sha256('pblob-' || CAST(grp AS VARCHAR)), 5),
                         1, 144) AS h0
        FROM blobs
      )
    ),
    g AS (
      SELECT blob_id, CAST(i AS INT) AS p,
             (strpos('0123456789abcdef',
                     substring(hx, CAST(i*2+1 AS INT), 1)) - 1) * 16
             + strpos('0123456789abcdef',
                      substring(hx, CAST(i*2+2 AS INT), 1)) - 1 AS v
      FROM hxs, range(0, 72) t(i)
    ),
    bits AS (
      SELECT a.blob_id, a.p // 9 AS r, a.p % 9 AS c,
             CASE WHEN a.v > b.v THEN 1 ELSE 0 END AS bit
      FROM g a JOIN g b ON a.blob_id = b.blob_id AND b.p = a.p + 1
      WHERE a.p % 9 < 8
    ),
    bands AS MATERIALIZED (
      SELECT blob_id, r, CAST(SUM(bit * (1 << c)) AS BIGINT) AS band
      FROM bits GROUP BY blob_id, r
    ),
    cand AS (
      SELECT DISTINCT a.blob_id AS blob_a, b.blob_id AS blob_b
      FROM bands a JOIN bands b
        ON a.r = b.r AND a.band = b.band AND a.blob_id < b.blob_id
    )
    SELECT c.blob_a, c.blob_b,
           CAST(SUM(bit_count(xor(x.band, y.band))) AS BIGINT) AS hamming
    FROM cand c
    JOIN bands x ON x.blob_id = c.blob_a
    JOIN bands y ON y.blob_id = c.blob_b AND y.r = x.r
    GROUP BY c.blob_a, c.blob_b
    HAVING SUM(bit_count(xor(x.band, y.band))) <= 4
    """,
)
def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate IMAGE dedup (VERDICT r7 #5 — the
    multimodal analogue of exact text dedup): 64-bit dHash over each
    blob's leading 9x8 byte grid, Hamming-<=4 pairs found by one-byte
    band blocking (8 bands; pigeonhole guarantees any pair within
    Hamming < 8 shares a band — the q_dedup_simhash argument), exact
    distance only on band-collision candidates. The fixture plants
    groups of 4 one-byte-perturbed copies (operators/multimodal.py:
    phash_blobs), so every within-group pair (<= 4 bits apart) must
    surface while cross-group blobs (~32 bits) are rejected after
    band collisions.

    No image decoder ships in this container, so the gradient runs on
    raw payload bytes — a production pipeline inserts resize-to-9x8
    grayscale before the SAME arithmetic (the multimodal family's
    stub discipline, q_multimodal_resize). Everything is exact
    integer: hex-nibble byte extraction, bit comparisons, shifts,
    XOR popcounts — both engines replay bit-identically.

    Scale: bands ride the scan (no Python); one (band_no, band)
    exchange builds collision buckets via the winnow_pairs
    cooccurrence shape (collect_set + double posexplode, no
    self-join); candidates are collision-bounded, never all-pairs.
    Cites the reference only for contrast: samply/fhir2sql has no
    binary-payload surface (src/models.rs:3-6 is JSON-only)."""
    from fhir2sql_spark.operators.multimodal import (
        phash_blobs,
        phash_dedup_pairs,
    )

    return phash_dedup_pairs(phash_blobs(spark, n=200), k=4)


@query(
    "q_layout_zorder",
    oracle="""
    WITH m AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_partkey % 256 AS BIGINT) AS x,
               CAST(l_suppkey % 256 AS BIGINT) AS y
        FROM lineitem WHERE l_orderkey % 10 = 0
    )
    SELECT l_orderkey, l_linenumber, x, y,
           CAST(((((x >> 0) & 1) << 1) | (((y >> 0) & 1) << 0) | (((x >> 1) & 1) << 3) | (((y >> 1) & 1) << 2) | (((x >> 2) & 1) << 5) | (((y >> 2) & 1) << 4) | (((x >> 3) & 1) << 7) | (((y >> 3) & 1) << 6) | (((x >> 4) & 1) << 9) | (((y >> 4) & 1) << 8) | (((x >> 5) & 1) << 11) | (((y >> 5) & 1) << 10) | (((x >> 6) & 1) << 13) | (((y >> 6) & 1) << 12) | (((x >> 7) & 1) << 15) | (((y >> 7) & 1) << 14)) AS BIGINT) AS zkey
    FROM m
    """,
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key (round 3) — the data-layout lever behind
    Delta/Iceberg ZORDER BY: interleave the low 8 bits of two join/
    filter dimensions (part, supplier) into one Morton key
    (operators/layout.py), so writing the table as
    repartitionByRange(zkey).sortWithinPartitions(zkey) clusters BOTH
    dimensions at once and parquet row-group min/max stats prune scans
    for range predicates on either column — at 100 TB the dominant
    cost saver is the scan that never happens. The bit-interleave is
    one exact integer expression shared verbatim with the oracle
    (pure &/<<,| on BIGINT), zero shuffles in this projection form;
    the write-path clustering is exercised in
    tests/test_layout_zorder.py."""
    from fhir2sql_spark.operators.layout import morton_key

    l = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 10 == 0)
    m = l.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey") % 256).cast("long").alias("x"),
        (F.col("l_suppkey") % 256).cast("long").alias("y"),
    )
    return m.withColumn("zkey", morton_key("x", "y", 8))


_GOPHER_STOPS = ("and", "be", "have", "of", "that", "the", "to", "with")


@query(
    "q_quality_gopher",
    oracle=f"""
    WITH f AS (
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_words,
               length(replace(text, ' ', '')) AS word_chars,
               length(text) - length(replace(text, '#', ''))
                 + len(regexp_extract_all(text, '\\.\\.\\.')) AS n_symbols,
               len(list_filter(string_split(text, ' '),
                   x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
               len(list_filter(string_split(lower(text), ' '),
                   x -> x IN {_GOPHER_STOPS})) AS stop_hits
        FROM documents
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           round(CAST(word_chars AS DOUBLE) / greatest(n_words, 1), 6)
               AS mean_word_len,
           round(CAST(n_symbols AS DOUBLE) / greatest(n_words, 1), 6)
               AS symbol_ratio,
           round(CAST(alpha_words AS DOUBLE) / greatest(n_words, 1), 6)
               AS alpha_frac,
           CAST(stop_hits AS BIGINT) AS stop_hits,
           (n_words BETWEEN 50 AND 100000
            AND CAST(word_chars AS DOUBLE) / greatest(n_words, 1)
                BETWEEN 3 AND 10
            AND CAST(n_symbols AS DOUBLE) / greatest(n_words, 1) <= 0.1
            AND CAST(alpha_words AS DOUBLE) / greatest(n_words, 1) >= 0.8
            AND stop_hits >= 2) AS keep
    FROM f
    """,
)
def q_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", table A1 — the pre-dedup filter
    every web-scale pipeline runs): word count in [50, 1e5], mean word
    length in [3, 10], symbol-to-word ratio (# and ellipsis) <= 0.1,
    >= 80% of words alphabetic, and >= 2 Gopher stopword hits. One
    scan-side pass of compiled expressions — token counts and
    stopword/alpha hits are zero-width regexp_counts over the padded
    text (the marker_hits form: codegen, no per-token HOF lambda, no
    explode), ratios are exact-integer IEEE divisions, so flags are
    bit-deterministic and the whole filter rides the scan with
    map-side-only work at 100 TB. Oracle replays each rule over the
    literal-space token list."""
    c = F.col("text")
    n_words = text.nonempty_token_count(c)
    word_chars = F.length(F.regexp_replace(c, " ", ""))
    n_symbols = (
        F.length(c) - F.length(F.regexp_replace(c, "#", ""))
        + F.regexp_count(c, F.lit(r"\.\.\."))
    )
    alpha_words = F.regexp_count(
        F.concat(F.lit(" "), c), F.lit("(?= [^ ]*[A-Za-z])")
    )
    stop_hits = F.regexp_count(
        F.concat(F.lit(" "), F.lower(c), F.lit(" ")),
        F.lit("(?= (" + "|".join(_GOPHER_STOPS) + ") )"),
    )
    denom = F.greatest(n_words, F.lit(1)).cast("double")
    mean_wl = word_chars.cast("double") / denom
    sym_r = n_symbols.cast("double") / denom
    alpha_f = alpha_words.cast("double") / denom
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(sym_r, 6).alias("symbol_ratio"),
        F.round(alpha_f, 6).alias("alpha_frac"),
        stop_hits.cast("long").alias("stop_hits"),
        (
            n_words.between(50, 100000)
            & mean_wl.between(3, 10)
            & (sym_r <= 0.1)
            & (alpha_f >= 0.8)
            & (stop_hits >= 2)
        ).alias("keep"),
    )


@query(
    "q_dedup_paragraph",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    ch AS (
        SELECT doc_id, g.i AS idx,
               array_to_string(ts[CAST(g.i*8+1 AS INT) : CAST(g.i*8+8 AS INT)],
                               ' ') AS chunk
        FROM t, unnest(generate_series(0, (len(ts)-1)//8)) AS g(i)
    ),
    k AS (
        SELECT doc_id, idx, chunk,
               ROW_NUMBER() OVER (PARTITION BY md5(chunk)
                                  ORDER BY doc_id, idx) = 1 AS kept
        FROM ch
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(*) FILTER (WHERE NOT kept) AS BIGINT) AS n_dropped,
           round(CAST(COUNT(*) FILTER (WHERE kept) AS DOUBLE) / COUNT(*), 6)
               AS kept_frac,
           md5(COALESCE(string_agg(CASE WHEN kept THEN chunk END, ' '
                                   ORDER BY idx), '')) AS new_text_md5
    FROM k GROUP BY doc_id
    """,
)
def q_dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style paragraph-hash deduplication (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): hash every paragraph, keep only the FIRST occurrence of
    each hash corpus-wide, and REWRITE each document to its surviving
    paragraphs — the content-level dedup that removes boilerplate
    (headers, cookie banners) while keeping the rest of the page,
    upstream of the document-level dedups (q_dedup_exact/minhash).
    Paragraph boundary proxy for the newline-free fixture:
    non-overlapping 8-token chunks (real corpora split on blank
    lines); the keeper rule is the deterministic (doc_id, idx)
    row_number, the md5 chunk key is the engine-portable hash, and the
    rewritten document is pinned exactly by new_text_md5 = md5 of the
    kept chunks rejoined in order (md5('') for fully-dropped docs).

    Scale shape: two uniform exchanges — one keyed by chunk hash for
    the global first-occurrence window (md5 keys cannot skew; a
    boilerplate chunk repeated across millions of docs is ONE hot
    window partition but the window computes only row_number, no
    collect), one back on doc_id for the rollup. Both aggregate
    map-side; nothing is driver-side; at 100 TB this is the same
    2-exchange posture as q_dedup_exact with the explode bounded by
    token count / 8. (A round-8 A/B tried the min-struct winner
    election with a single text-carrying exchange: 6% better at
    sf100, 2x worse at sf1/sf10 because the chunk explode runs twice
    — the window form measured 2.3 / 4.1 / 94 s across the decades
    and stays.)"""
    docs = load(spark, sf_dir, "documents").withColumn(
        "ts", F.split(F.col("text"), " ")
    )
    ch = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, cast(floor((size(ts)-1)/8) as int)),"
                " i -> concat_ws(' ', slice(ts, i*8+1, 8)))"
            )
        ).alias("idx", "chunk"),
    )
    w = Window.partitionBy(F.md5("chunk")).orderBy("doc_id", "idx")
    k = ch.withColumn("kept", F.row_number().over(w) == 1)
    kept_struct = F.when(
        F.col("kept"), F.struct("idx", "chunk")
    )  # collect_list skips the NULLs for dropped chunks
    return k.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(~F.col("kept"), 1).otherwise(0)).alias("n_dropped"),
        F.round(
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            / F.count("*"),
            6,
        ).alias("kept_frac"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda x: x.chunk,
                ),
                " ",
            )
        ).alias("new_text_md5"),
    )
