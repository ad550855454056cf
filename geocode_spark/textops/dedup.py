"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (100 TB corpora):
 - exact dedup: one hash-groupBy on md5(text) — map-side partial agg, single
   shuffle keyed on the hash (uniform by construction, skew-free).
 - n-gram Jaccard: the exact-pairs baseline. Shuffle joins keyed on shingle;
   shingle keys are near-uniform (3-gram space is huge), so no salting needed.
   Quadratic only within a shingle's posting list — at web scale you run
   MinHash first and use this as the verifier.
 - MinHash+LSH: shingle -> 128-permutation signature (Arrow-vectorized pandas
   UDF, numpy inner loop) -> 32 bands x 4 rows -> band-key equi-join generates
   candidates -> exact Jaccard verification. Only candidate pairs are
   verified; the corpus is never self-joined on raw content.
 - SimHash: 60-bit signature (md5-bit majority) -> 5 x 12-bit chunk keys; by
   pigeonhole, any pair within Hamming distance 4 shares at least one chunk,
   so the chunk equi-join is a COMPLETE candidate generator for d<=4.

Every operator has a DuckDB oracle twin built from the same constants; the
MinHash query's oracle is the brute-force Jaccard (LSH at 32x4 has miss
probability <1e-13 for Jaccard>=0.85 pairs, and verification removes all
false positives, so outputs coincide on the test corpora).

The dedup corpus is derived deterministically from the driver's `documents`
table (duplicate + truncated-near-duplicate injection) — identically in both
engines — because the raw table contains no duplicate pairs to exercise.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

from ..caching import persist_tracked

WS = r"\s+"

# MinHash parameters (module constants — both engines, frozen).
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1; keeps a*h+b inside uint64
N_HASHES = 128
N_BANDS = 32
BAND_ROWS = N_HASHES // N_BANDS
_rng = np.random.default_rng(7)
MINHASH_A = _rng.integers(1, MINHASH_PRIME, size=N_HASHES, dtype=np.uint64)
MINHASH_B = _rng.integers(0, MINHASH_PRIME, size=N_HASHES, dtype=np.uint64)

SIMHASH_BITS = 60
SIMHASH_CHUNKS = 5  # 5 x 12 bits; complete for hamming <= 4 by pigeonhole
SIMHASH_MAX_HAMMING = 4


# ------------------------------------------------------------ corpus derivation
def near_dup_corpus(docs: DataFrame) -> DataFrame:
    """documents + injected exact copies (id%7==0 -> +1e6) and truncated
    near-copies (id%5==0 and >=20 tokens -> +2e6, last 2 words dropped)."""
    did = F.col("doc_id")
    toks = F.split(F.trim(F.col("text")), WS)
    base = docs.select(did.alias("doc_id"), F.col("text"))
    exact = docs.filter(did % 7 == 0).select(
        (did + 1_000_000).alias("doc_id"), F.col("text")
    )
    near = docs.filter((did % 5 == 0) & (F.size(toks) >= 20)).select(
        (did + 2_000_000).alias("doc_id"),
        F.array_join(F.slice(toks, 1, F.size(toks) - 2), " ").alias("text"),
    )
    return base.unionByName(exact).unionByName(near)


def corpus_sql(source: str) -> str:
    return f"""(
  SELECT doc_id, text FROM {source}
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM {source} WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         array_to_string(toks[1:len(toks)-2], ' ') AS text
  FROM (SELECT doc_id, string_split_regex(trim(text), '{WS}') AS toks
        FROM {source})
  WHERE doc_id % 5 = 0 AND len(toks) >= 20
)"""


# -------------------------------------------------------------------- shingles
def shingles_col(text: Column) -> Column:
    """Distinct word-3-gram shingles of lowercased, whitespace-split text.

    NOTE: as a single Column this re-evaluates the token split inside the
    higher-order-function lambda (HOF lambdas bypass codegen subexpression
    elimination, so each element indexes a fresh split — quadratic per doc).
    Hot paths must use with_shingles(), which stages the token array as a
    materialized column first.
    """
    toks = F.split(F.lower(F.trim(text)), WS)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - F.lit(3)),
        lambda i: F.concat_ws(
            " ", F.get(toks, i), F.get(toks, i + 1), F.get(toks, i + 2)
        ),
    )
    return F.when(n >= 3, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


@F.pandas_udf(ArrayType(StringType()))
def _shingle_udf(toks: pd.Series) -> pd.Series:
    """Distinct word-3-grams from a token array (Arrow batch in/out).

    Tokenization (split/lower/trim) stays JVM-side so locale semantics match
    the SQL oracle exactly; this UDF only concatenates + dedups, which is
    locale-free. Done in Python because Catalyst higher-order functions are
    interpreted per element AND get inlined (recomputed ~3x) into the filters
    Generate infers — a pandas UDF runs once in its own ArrowEvalPython node.
    """
    out = []
    for arr in toks:
        if arr is None or len(arr) < 3:
            out.append([])
        else:
            out.append(
                list(
                    dict.fromkeys(
                        " ".join(g) for g in zip(arr, arr[1:], arr[2:])
                    )
                )
            )
    return pd.Series(out)


def with_shingles(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, shingles, n_sh) for docs with >=3 tokens (== >=1 shingle)."""
    staged = df.withColumn(
        "_toks", F.split(F.lower(F.trim(F.col(text_col))), WS)
    ).filter(F.size("_toks") >= 3)
    return (
        staged.withColumn("shingles", _shingle_udf("_toks"))
        .withColumn("n_sh", F.size("shingles"))
        .select("doc_id", "shingles", "n_sh")
    )


def _shingles_sql(text: str) -> str:
    toks = f"string_split_regex(lower(trim({text})), '{WS}')"
    grams = (
        f"list_transform(generate_series(1, len({toks}) - 2),"
        f" i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2])"
    )
    return f"(CASE WHEN len({toks}) >= 3 THEN list_distinct({grams}) ELSE [] END)"


def _shingle_rows_cte(corpus: str) -> str:
    """CTEs: sh (doc_id, shingle set size) and shx (doc_id, shingle)."""
    return f"""
sh AS (
  SELECT doc_id, {_shingles_sql('text')} AS shingles FROM {corpus}
),
shn AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
shx AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh)"""


# ----------------------------------------------------------------- exact dedup
def dedup_exact(corpus: DataFrame) -> DataFrame:
    """Exact dedup: group on content hash; survivor = lowest doc_id."""
    return (
        corpus.select(F.md5(F.col("text")).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").cast("bigint").alias("survivor_id"),
            F.count("*").cast("bigint").alias("n_copies"),
        )
    )


def dedup_exact_oracle_sql(source: str) -> str:
    return f"""
SELECT md5(text) AS text_hash,
       CAST(min(doc_id) AS BIGINT) AS survivor_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM {corpus_sql(source)} GROUP BY 1
"""


# -------------------------------------------------------------- n-gram Jaccard
def _doc_int_sets(sh: DataFrame) -> DataFrame:
    """Dictionary-encode a shingle relation into per-doc SORTED int arrays.

    Returns (doc_id, n_sh, sids) where sids is the doc's shingle set as a
    sorted array of vocabulary ranks (rank order = ascending global document
    frequency, ties by shingle string — the exact prefix-filter order). The
    encoding is a pure bijection on the gate's shingle universe, so every
    count computed on sids (intersections, prefixes, positions) equals the
    same count on the string sets; downstream joins and verifies then move
    4-byte ints instead of ~20-byte strings and array_intersect hashes longs
    instead of UTF8 strings (guide §2.3 "narrower types" — measured 19x on
    the containment verify at sf1.0). The sorted array also encodes each
    element's global-order RANK as its position, which is what the ppjoin
    positional filter needs, replacing the per-doc row_number window of the
    string form with one groupBy.

    Scale note: the vocabulary ranking is a single-partition window over the
    DISTINCT-shingle relation — fine at vocabulary scale (28k distinct
    shingles for the 66k-doc gate corpus; vocabularies grow sublinearly in
    corpus size). At 100 TB swap in the standard two-pass id assignment
    (per-partition counts -> prefix-sum offsets), which preserves the same
    (df, shingle) order; nothing downstream depends on HOW ranks are
    assigned, only that they are that order's ranks.
    """
    from pyspark.sql.window import Window

    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    freq = ex.groupBy("shingle").agg(F.count("*").alias("df"))
    vocab = freq.select(
        "shingle",
        F.row_number()
        .over(Window.orderBy(F.col("df").asc(), F.col("shingle").asc()))
        .alias("sid"),
    )
    return (
        ex.join(vocab, "shingle")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("sid")).alias("sids"))
        .withColumn("n_sh", F.size("sids"))
    )


def _ceil_t_n(threshold: float, n: Column) -> Column:
    """ceil(threshold * n) as an exact integer column, with the module's
    1e-9 guard against IEEE t*n landing a hair above an integer (erring
    low only lengthens prefixes / loosens filters — never drops a pair)."""
    return F.ceil(F.lit(float(threshold)) * n - F.lit(1e-9))


def _jaccard_collisions(docint: DataFrame, threshold: float) -> DataFrame:
    """Prefix-collision rows (id_a, id_b, n_a, n_b) for the Jaccard join,
    id_a < id_b, NOT deduplicated (one row per surviving prefix collision).

    Beyond the classic prefix filter this applies two further exact-safe
    prunes (Xiao et al. 2008, ppjoin):
      - size filter: J >= t forces min(n_a,n_b) >= ceil(t*max(n_a,n_b));
      - positional filter: a collision at sorted positions (i, j) bounds the
        overlap by 1 + min(n_a-i-1, n_b-j-1); a qualifying pair always
        survives via its FIRST collision in the global order (all common
        elements sit at ranks >= that collision's on both sides), so
        filtering every collision row keeps candidate generation complete.
    Both prunes only shrink the candidate set; exact verification on the
    full sets removes all remaining false positives, so the operator output
    is unchanged."""
    plen = F.col("n_sh") - _ceil_t_n(threshold, F.col("n_sh")) + 1
    pref = docint.select(
        "doc_id",
        "n_sh",
        F.posexplode(F.slice("sids", F.lit(1), plen)).alias("_p", "sid"),
    )
    a = pref.select(
        F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"),
        F.col("_p").alias("p_a"), "sid",
    )
    b = pref.select(
        F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"),
        F.col("_p").alias("p_b"), "sid",
    )
    c_min = _ceil_t_n(threshold, F.greatest("n_a", "n_b"))
    return (
        a.join(b, "sid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.least("n_a", "n_b") >= c_min)
        .filter(
            1 + F.least(
                F.col("n_a") - F.col("p_a") - 1,
                F.col("n_b") - F.col("p_b") - 1,
            )
            >= c_min
        )
        .select("id_a", "id_b", "n_a", "n_b")
    )


def ngram_prefix_candidates(sh: DataFrame, threshold: float = 0.8) -> DataFrame:
    """AllPairs/ppjoin prefix-filter candidate pairs over a shingle relation
    (doc_id, shingles, n_sh). Exposed separately so skew tests can pin the
    candidate COUNT: a corpus-wide hot shingle (template boilerplate) must
    fall out of every prefix, keeping candidates bounded by the rare tail."""
    docint = _doc_int_sets(sh)
    return (
        _jaccard_collisions(docint, threshold)
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(corpus: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Exact word-3-gram Jaccard >= threshold (id_a < id_b) via PREFIX
    FILTERING (AllPairs/ppjoin candidate generation + exact verification).

    The round-1 form self-joined the FULL inverted index — quadratic in every
    shingle's posting list with unsalted hot keys on common 3-grams; at a
    100x corpus it is the first query to fall over. Prefix filtering bounds
    the join provably: order the shingle universe by ascending global
    document frequency (rarest first, ties by shingle string); J(A,B) >= t
    implies |A∩B| >= ceil(t*|A|), and by the prefix lemma any qualifying pair
    must collide within the first |A| - ceil(t*|A|) + 1 shingles of EACH side
    under that shared order. Only those prefix postings are joined — common
    3-grams fall out of candidate generation entirely (a doc keeps a frequent
    shingle in its prefix only when it has almost no rarer ones), so posting
    lists stay bounded by the rare tail. Exact jaccard verification on the
    candidate set (array_intersect on the full shingle sets) removes all
    false positives, so the output is IDENTICAL to the brute-force oracle.

    prefix_len is computed as n - ceil(t*n - 1e-9) + 1: the epsilon guards
    against IEEE t*n landing a hair above an integer, which would shorten a
    prefix and break completeness; erring long only adds candidates.

    r6 optimization (guide §2.3/§3.1): the whole join runs over the
    dictionary-encoded int form (_doc_int_sets) — candidate keys, positional
    prunes and the exact verify all move 4-byte ints instead of ~20-byte
    shingle strings, and verification intersects sorted int arrays instead
    of hashing UTF8 strings. Candidate rows are verified PER COLLISION and
    deduplicated after the (tiny) qualifying output instead of hash-
    aggregating the tens-of-millions-row candidate set first: the verify is
    row-local compute over broadcast-attached arrays, so duplicate
    collisions (bounded by the prefix length) are cheaper than a corpus-
    pairs-sized exchange. Output is bit-identical to the string form — the
    encoding is a bijection, counts are counts.

    Both persisted relations (shingles, int sets) feed multiple plan
    branches and Spark does not materialize common subtrees, so without the
    persists the Arrow shingle stage re-runs once per branch.
    """
    sh = persist_tracked(with_shingles(corpus))
    docint = persist_tracked(_doc_int_sets(sh))
    coll = _jaccard_collisions(docint, threshold)

    sa = docint.select(F.col("doc_id").alias("id_a"),
                       F.col("sids").alias("sids_a"))
    sb = docint.select(F.col("doc_id").alias("id_b"),
                       F.col("sids").alias("sids_b"))
    v = coll.join(sa, "id_a").join(sb, "id_b")
    common = F.size(F.array_intersect("sids_a", "sids_b"))
    jac = common.cast("double") / (
        F.col("n_a") + F.col("n_b") - common
    ).cast("double")
    return (
        v.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        .distinct()
    )


def ngram_jaccard_oracle_sql(source: str, threshold: float = 0.8) -> str:
    return f"""
WITH corpus AS (SELECT * FROM {corpus_sql(source)}),
{_shingle_rows_cte('corpus')},
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM shx a JOIN shx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(common AS DOUBLE)
             / CAST(na.n_sh + nb.n_sh - common AS DOUBLE), 6) AS jaccard
FROM common
JOIN shn na ON na.doc_id = id_a
JOIN shn nb ON nb.doc_id = id_b
WHERE CAST(common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - common AS DOUBLE)
      >= {threshold!r}
"""


# ----------------------------------------------------------------- MinHash+LSH
def _md5_int64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def _md5_u64_unique(strings: np.ndarray) -> np.ndarray:
    """uint64 md5 prefixes for an array of (unique) strings — the one
    remaining per-string Python loop; callers dedup first so each distinct
    string is hashed once per Arrow batch instead of once per occurrence."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
            for s in strings
        ),
        dtype=np.uint64,
        count=len(strings),
    )


@F.pandas_udf(ArrayType(LongType()))
def minhash_signature(shingles: pd.Series) -> pd.Series:
    """128-permutation MinHash signature (Arrow batch in, numpy inner loop).

    md5 is computed once per DISTINCT shingle per batch (np.unique + gather):
    near-duplicate corpora repeat most shingles across docs, so this cuts the
    dominant hashing cost several-fold while producing identical signatures.
    """
    A, B, P = MINHASH_A, MINHASH_B, np.uint64(MINHASH_PRIME)
    docs = [
        None if sh is None or len(sh) == 0 else np.asarray(sh, dtype=object)
        for sh in shingles
    ]
    live = [d for d in docs if d is not None]
    if not live:
        return pd.Series([None] * len(docs))
    uniq, inv = np.unique(np.concatenate(live), return_inverse=True)
    hu = _md5_u64_unique(uniq) % P
    out, pos = [], 0
    for d in docs:
        if d is None:
            out.append(None)
            continue
        h = hu[inv[pos : pos + len(d)]]
        pos += len(d)
        sig = ((A[:, None] * h[None, :] + B[:, None]) % P).min(axis=1)
        out.append(sig.astype(np.int64).tolist())
    return pd.Series(out)


def minhash_band_candidates(sh: DataFrame) -> DataFrame:
    """Banded-signature equi-join candidate pairs over a shingle relation
    (doc_id, shingles). Exposed separately so skew tests can pin the
    candidate COUNT under a corpus-wide hot template: band keys are whole
    signature slices, so boilerplate shared by dissimilar docs does not put
    them in one bucket — candidates scale with s^BAND_ROWS per band, not
    with the hot shingle's posting list."""
    sig = sh.withColumn("sig", minhash_signature("shingles"))
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        *[
                            F.get("sig", b * BAND_ROWS + r).alias(f"k{r}")
                            for r in range(BAND_ROWS)
                        ],
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.*")
    left = bands.select(F.col("doc_id").alias("id_a"), "band",
                        *[f"k{r}" for r in range(BAND_ROWS)])
    right = bands.select(F.col("doc_id").alias("id_b"), "band",
                         *[f"k{r}" for r in range(BAND_ROWS)])
    return (
        left.join(right, on=["band"] + [f"k{r}" for r in range(BAND_ROWS)])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_pairs(corpus: DataFrame, threshold: float = 0.8) -> DataFrame:
    """LSH candidate generation + exact-Jaccard verification.

    Output equals ngram_jaccard_pairs wherever LSH recall is 1 (which it is,
    to ~1e-13, for the >=0.85-Jaccard pairs these corpora contain).

    The shingle relation persist()s for the same reason as in
    ngram_jaccard_pairs: it feeds the band stage and both verify sides."""
    sh = persist_tracked(with_shingles(corpus))
    cand = minhash_band_candidates(sh)

    # exact verification on the candidate set only
    sa = sh.select(F.col("doc_id").alias("id_a"),
                   F.col("shingles").alias("sh_a"), F.col("n_sh").alias("n_a"))
    sb = sh.select(F.col("doc_id").alias("id_b"),
                   F.col("shingles").alias("sh_b"), F.col("n_sh").alias("n_b"))
    v = cand.join(sa, "id_a").join(sb, "id_b")
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = common.cast("double") / (
        F.col("n_a") + F.col("n_b") - common
    ).cast("double")
    return (
        v.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# oracle for minhash_lsh_pairs IS the brute-force jaccard (see module doc)
minhash_lsh_oracle_sql = ngram_jaccard_oracle_sql


# --------------------------------------------------------------------- SimHash
@F.pandas_udf(LongType())
def simhash60(text: pd.Series) -> pd.Series:
    """60-bit SimHash over whitespace tokens; bit source = md5 hex nibbles.

    Bit i (i=0..59) reads md5 bit (63-i) of each token (MSB-first over the
    first 15 hex nibbles) and lands at output position (59-i) — the exact
    layout the DuckDB oracle reproduces with hex-digit arithmetic.

    Vectorized: md5 is computed once per DISTINCT token per batch (token
    MULTIPLICITY within a row still counts, exactly as the oracle's unnest
    does). Per-row ±1 bit sums are a (rows, U) token-count matrix times the
    (U, 60) unique-bit matrix when the vocabulary U is small — a single BLAS
    call with no token-length intermediate (large fresh gather buffers fault
    ~100x slower than the arithmetic on this VM class) — falling back to
    small per-row gathers when U is large.
    """
    import re

    # bit i of the signature reads md5 bit (63-i) == np.unpackbits index i
    # (MSB-first) over the first 8 digest bytes; positions 59..0 weight it.
    weights = np.left_shift(
        np.uint64(1), np.arange(SIMHASH_BITS - 1, -1, -1, dtype=np.uint64)
    )
    ws = re.compile(r"\s+")
    out = np.zeros(len(text), dtype=np.int64)
    vals = text.to_numpy(dtype=object)
    for s in range(0, len(vals), 2000):
        chunk = vals[s : s + 2000]
        toks = [
            ws.split(t.strip().lower()) if t is not None else [""]
            for t in chunk
        ]
        lens = np.array([len(tk) for tk in toks])  # always >= 1
        flat = np.concatenate([np.asarray(tk, dtype=object) for tk in toks])
        uniq, inv = np.unique(flat, return_inverse=True)
        digests = b"".join(
            hashlib.md5(tok.encode("utf-8")).digest()[:8] for tok in uniq
        )
        bits_u = np.unpackbits(
            np.frombuffer(digests, dtype=np.uint8).reshape(-1, 8), axis=1
        )[:, :SIMHASH_BITS].astype(np.float64)
        pm = 2.0 * bits_u - 1.0  # (U, 60) in ±1
        if len(uniq) * len(chunk) <= 4_000_000:
            # counts @ pm: token sums are bounded by tokens-per-row, so the
            # float64 matmul is exact.
            row_of = np.repeat(np.arange(len(chunk), dtype=np.int64), lens)
            counts = np.bincount(
                row_of * len(uniq) + inv, minlength=len(chunk) * len(uniq)
            ).reshape(len(chunk), len(uniq)).astype(np.float64)
            sums = counts @ pm
        else:  # large vocabulary: small per-row gathers, no big intermediate
            sums = np.empty((len(chunk), SIMHASH_BITS))
            pos = 0
            for r, n in enumerate(lens):
                sums[r] = pm[inv[pos : pos + n]].sum(axis=0)
                pos += n
        out[s : s + len(chunk)] = (
            ((sums >= 0).astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
        )
    return pd.Series(out)


def simhash_signatures(corpus: DataFrame) -> DataFrame:
    return corpus.select("doc_id", simhash60(F.col("text")).alias("simhash"))


def simhash_pairs(corpus: DataFrame,
                  max_hamming: int = SIMHASH_MAX_HAMMING) -> DataFrame:
    """Pairs within Hamming distance `max_hamming` (<= 4: chunk join is a
    complete candidate generator by pigeonhole over 5 x 12-bit chunks).

    Signatures persist(): the relation feeds both sides of the chunk join and
    Spark would otherwise run the Arrow SimHash stage twice."""
    sig = persist_tracked(simhash_signatures(corpus))
    chunks = sig.select(
        "doc_id", "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", 12 * c)
                        .bitwiseAND(F.lit(4095))
                        .alias("ck"),
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("e"),
    ).select("doc_id", "simhash", "e.*")
    a = chunks.select(F.col("doc_id").alias("id_a"),
                      F.col("simhash").alias("h_a"), "chunk", "ck")
    b = chunks.select(F.col("doc_id").alias("id_b"),
                      F.col("simhash").alias("h_b"), "chunk", "ck")
    # verify per COLLISION row and dedup only the qualifying output (the
    # containment-join discipline): bit_count is a comparison-cheap
    # codegen filter, so evaluating it before the exchange means the
    # distinct shuffles |qualifying pairs| x (<= SIMHASH_CHUNKS dup hits)
    # rows instead of the full collision volume — a hot chunk value
    # (boilerplate-heavy corpora) otherwise pushes its c^2/2 collision
    # rows through the exchange just to drop them after
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("bigint")
    return (
        a.join(b, on=["chunk", "ck"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def _simhash_cte(corpus: str) -> str:
    nib = "strpos('0123456789abcdef', substr(h, (i.i // 4) + 1, 1)) - 1"
    bit = f"((({nib}) >> (3 - (i.i % 4))) & 1)"
    return f"""
toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '{WS}')) AS tok
  FROM {corpus}
),
hx AS (SELECT doc_id, md5(tok) AS h FROM toks),
bitsums AS (
  SELECT doc_id, i.i AS i,
         sum(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS s
  FROM hx CROSS JOIN (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS i) i
  GROUP BY doc_id, i.i
),
simsig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s >= 0 THEN (1::BIGINT << (59 - i)) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM bitsums GROUP BY doc_id
)"""


def simhash_signatures_oracle_sql(source: str) -> str:
    return f"""
WITH corpus AS (SELECT * FROM {corpus_sql(source)}),
{_simhash_cte('corpus')}
SELECT doc_id, simhash FROM simsig
"""


def simhash_pairs_oracle_sql(source: str,
                             max_hamming: int = SIMHASH_MAX_HAMMING) -> str:
    """Brute-force Hamming pairs — ground truth for the chunk-join variant."""
    return f"""
WITH corpus AS (SELECT * FROM {corpus_sql(source)}),
{_simhash_cte('corpus')}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM simsig a JOIN simsig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# ------------------------------------------------------- incremental dedup
# The production incremental-ingest scenario: an EXISTING canonical corpus
# and a NEW crawl batch; every new doc near-duplicating an existing doc is
# dropped before it ever enters the corpus. Candidate generation is the
# same banded-MinHash equi-join as minhash_lsh_pairs, restricted to
# CROSS-source pairs (existing bands x new bands — never existing x
# existing, the whole point of incremental over full-corpus dedup: the big
# side is touched once for signatures and no intra-side pairs are
# generated). Exact-Jaccard verification on candidates only; match =
# lowest-id qualifying existing doc (deterministic).
INCR_NEW_MOD = 3  # query-form split: doc_id % 3 == 0 is the "new crawl"
INCR_COPY_MOD = 7  # 1-in-7 existing docs get an injected copy in the batch
INCR_COPY_OFFSET = 3_000_000


def incremental_dedup(new_docs: DataFrame, existing_docs: DataFrame,
                      threshold: float = 0.8) -> DataFrame:
    """(doc_id, is_dup, match_id) for every NEW doc: is_dup=1 with the
    lowest-id existing match when some existing doc has word-3-gram
    Jaccard >= threshold; (0, NULL) otherwise."""
    sh_ex = persist_tracked(with_shingles(existing_docs))
    sh_new = persist_tracked(with_shingles(new_docs))
    sig = lambda sh: sh.withColumn("sig", minhash_signature("shingles"))

    def bands(sh, side):
        return sig(sh).select(
            F.col("doc_id").alias(f"{side}_id"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            *[
                                F.get("sig", b * BAND_ROWS + r).alias(f"k{r}")
                                for r in range(BAND_ROWS)
                            ],
                        )
                        for b in range(N_BANDS)
                    ]
                )
            ).alias("bk"),
        ).select(f"{side}_id", "bk.*")

    keys = ["band"] + [f"k{r}" for r in range(BAND_ROWS)]
    cand = (
        bands(sh_ex, "ex").join(bands(sh_new, "new"), keys)
        .select("ex_id", "new_id")
        .distinct()
    )
    v = (
        cand.join(
            sh_ex.select(F.col("doc_id").alias("ex_id"),
                         F.col("shingles").alias("sh_a"),
                         F.col("n_sh").alias("n_a")),
            "ex_id",
        )
        .join(
            sh_new.select(F.col("doc_id").alias("new_id"),
                          F.col("shingles").alias("sh_b"),
                          F.col("n_sh").alias("n_b")),
            "new_id",
        )
    )
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = common.cast("double") / (
        F.col("n_a") + F.col("n_b") - common
    ).cast("double")
    matches = (
        v.filter(jac >= threshold)
        .groupBy("new_id")
        .agg(F.min("ex_id").alias("match_id"))
    )
    return (
        new_docs.select("doc_id")
        .join(matches, new_docs.doc_id == matches.new_id, "left")
        .select(
            "doc_id",
            (F.col("match_id").isNotNull()).cast("int").alias("is_dup"),
            F.col("match_id").cast("bigint").alias("match_id"),
        )
    )


def incremental_split(docs: DataFrame):
    """Query-form derivation: existing = doc_id % 3 != 0; new batch =
    doc_id % 3 == 0 PLUS injected verbatim copies of 1-in-7 existing docs
    (id + 3e6) — identically derived in both engines, because the raw split
    contains no cross-side near-dups to exercise."""
    did = F.col("doc_id")
    existing = docs.filter(did % INCR_NEW_MOD != 0).select("doc_id", "text")
    new = docs.filter(did % INCR_NEW_MOD == 0).select("doc_id", "text")
    copies = existing.filter(did % INCR_COPY_MOD == 0).select(
        (did + INCR_COPY_OFFSET).alias("doc_id"), "text"
    )
    return new.unionByName(copies), existing


def incremental_dedup_oracle_sql(source: str,
                                 threshold: float = 0.8) -> str:
    """Brute-force cross-side Jaccard — the semantic ground truth for the
    banded cross-join (recall 1 to ~1e-13 at the >=0.85 pairs the split
    contains, exactly the minhash_lsh_pairs argument)."""
    return f"""
WITH existing AS (
  SELECT doc_id, text FROM {source} WHERE doc_id % {INCR_NEW_MOD} != 0
),
newdocs AS (
  SELECT doc_id, text FROM {source} WHERE doc_id % {INCR_NEW_MOD} = 0
  UNION ALL
  SELECT doc_id + {INCR_COPY_OFFSET} AS doc_id, text FROM existing
  WHERE doc_id % {INCR_COPY_MOD} = 0
),
exsh AS (
  SELECT doc_id, {_shingles_sql('text')} AS sh FROM existing
),
newsh AS (
  SELECT doc_id, {_shingles_sql('text')} AS sh FROM newdocs
),
matches AS (
  SELECT b.doc_id AS new_id, CAST(min(a.doc_id) AS BIGINT) AS match_id
  FROM exsh a JOIN newsh b
    ON len(list_intersect(a.sh, b.sh)) > 0
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
               AS DOUBLE) >= {threshold!r}
  GROUP BY b.doc_id
)
SELECT n.doc_id,
       CASE WHEN m.match_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup,
       m.match_id
FROM newdocs n LEFT JOIN matches m ON m.new_id = n.doc_id
"""


# ------------------------------------------------------------ n-gram novelty
# First-introducer novelty: what fraction of a document's distinct word
# 3-grams appear in NO lower-id document — the freshness/diversity signal
# a curation run uses to downweight recombinations of already-seen text
# (exact duplicates score 0 by construction; genuinely new material
# scores near 1000 permille). Ordering is by doc_id — in a dated corpus
# the id would be the crawl timestamp rank.
#
# Scale shape: the accepted dedup-family shape — one corpus-sized shingle
# explode, ONE keyed groupBy(shingle) for the first-introducer relation,
# one keyed join back, one groupBy(doc_id). Nothing is all-pairs; the
# first-introducer relation is |distinct shingles|, the same size class
# as the dedup candidates' shingle relation. The permille is exact
# integer arithmetic (n_novel * 1000 div n_shingles) — no floats.
def ngram_novelty(corpus: DataFrame) -> DataFrame:
    """(doc_id, n_shingles, n_novel, novelty_permille) for every corpus
    doc; docs with < 3 tokens score (0, 0, 0)."""
    shx = with_shingles(corpus).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    first = shx.groupBy("shingle").agg(
        F.min("doc_id").alias("first_doc")
    )
    per_doc = (
        shx.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.sum(
                F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
            ).cast("bigint").alias("n_novel"),
        )
    )
    return (
        corpus.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("bigint")
            .alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
            F.expr(
                "CAST((coalesce(n_novel, 0) * 1000)"
                " div greatest(coalesce(n_shingles, 0), 1) AS BIGINT)"
            ).alias("novelty_permille"),
        )
    )


def ngram_novelty_oracle_sql(source: str) -> str:
    """DuckDB twin over the same injected dup corpus."""
    return f"""
WITH {_shingle_rows_cte(corpus_sql(source))},
first_doc AS (
  SELECT shingle, min(doc_id) AS first_doc FROM shx GROUP BY shingle
),
per_doc AS (
  SELECT s.doc_id,
         CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN s.doc_id = f.first_doc THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM shx s JOIN first_doc f USING (shingle)
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(COALESCE(p.n_novel, 0) AS BIGINT) AS n_novel,
       CAST((COALESCE(p.n_novel, 0) * 1000)
            // greatest(COALESCE(p.n_shingles, 0), 1) AS BIGINT)
         AS novelty_permille
FROM (SELECT doc_id FROM {corpus_sql(source)}) d
LEFT JOIN per_doc p USING (doc_id)
"""


# ---------------------------------------------------------------- containment
# Asymmetric set containment C(A->B) = |A ∩ B| / |A| — the quotation /
# subset-duplication signal Jaccard structurally misses (a short doc fully
# quoted inside a long one has tiny Jaccard but containment 1.0). Candidate
# generation is the one-sided prefix filter: |A ∩ B| >= ceil(t·|A|) forces a
# collision between A's (df-ascending) prefix and B's FULL shingle index —
# only the probe side is prefixed (the containment prefix lemma; the
# symmetric two-prefix pruning of the Jaccard join does not apply). The
# verify pass and the threshold are exact integer cross-multiplications.
# Scale note: the full-index side's posting lists on globally frequent
# shingles are the hot keys of this join (the known asymmetric-join cost);
# at 100 TB the standard remedy is df-descending postings split into a
# broadcastable hot tier + a shuffled cold tier — same output by union.
CONTAIN_PERMILLE = 800


def containment_pairs(corpus: DataFrame,
                      permille: int = CONTAIN_PERMILLE) -> DataFrame:
    """(id_src, id_dst, containment_permille): ordered pairs where at
    least permille/1000 of id_src's word-3-shingles also occur in
    id_dst's (id_src != id_dst).

    r6 optimization (before: 281.6 s of the 841.5 s sf1.0 bench; after
    measured ~15 s cold / less under the bench's warm-cache protocol): the
    sf1.0 gate corpus is pathologically dense (66k docs over a 28k-shingle
    vocabulary), so the prefix-vs-full-index join emits 82M collision rows
    -> 79.4M DISTINCT candidate pairs, and the old verify shipped BOTH
    docs' full string-shingle arrays to every candidate row (~80 GB of
    array copies) and string-hash array_intersect'ed each — measured
    319.6 s of the 325 s total. Three exact-output-preserving changes
    (guide §2.3 narrower types, §3.1 broadcast the small side, Xiao et al.
    2008 positional filter):
      1. everything runs on _doc_int_sets' sorted int arrays — join keys,
         prefixes and the verify intersect move ints, not strings;
      2. a ppjoin-style positional filter prunes collisions that provably
         cannot reach ceil(t*|A|) overlap: at a collision at sorted
         positions (i, j), overlap <= 1 + min(n_a-i-1, n_b-j-1); a
         qualifying pair always survives via its FIRST collision in the
         global df order (its rarest common shingle sits within A's prefix
         AND within B's first n_b - c_min + 1 ranks — the set-containment
         index-prefix lemma), so completeness holds collision-by-collision;
      3. verification runs per collision row against the attached int
         arrays, and the output (43.5k rows at sf1.0) is deduplicated at
         the END — dropping the 79M-pair hash aggregate entirely. Each
         duplicate collision re-verifies (dup factor bounded by the prefix
         length), far cheaper row-local work than a pairs-sized exchange.
    """
    sh = persist_tracked(with_shingles(corpus))
    docint = persist_tracked(_doc_int_sets(sh))
    # c_min = ceil(permille/1000 * n) in exact integer arithmetic; equals
    # the old float ceil(t*n - 1e-9) for every integer n, permille <= 1000
    c_min_a = f"(({int(permille)} * n_sh + 999) div 1000)"
    pref = docint.select(
        F.col("doc_id").alias("id_src"),
        F.col("n_sh").alias("n_a"),
        F.expr(c_min_a).alias("c_min"),
        F.posexplode(
            F.expr(f"slice(sids, 1, n_sh - {c_min_a} + 1)")
        ).alias("p_a", "sid"),
    )
    full = docint.select(
        F.col("doc_id").alias("id_dst"),
        F.col("n_sh").alias("n_b"),
        F.posexplode("sids").alias("p_b", "sid"),
    )
    coll = (
        pref.join(full, "sid")
        .filter(F.col("id_src") != F.col("id_dst"))
        .filter(
            1 + F.least(
                F.col("n_a") - F.col("p_a") - 1,
                F.col("n_b") - F.col("p_b") - 1,
            )
            >= F.col("c_min")
        )
        .select("id_src", "id_dst", "n_a")
    )
    sa = docint.select(F.col("doc_id").alias("id_src"),
                       F.col("sids").alias("sids_a"))
    sb = docint.select(F.col("doc_id").alias("id_dst"),
                       F.col("sids").alias("sids_b"))
    common = F.size(F.array_intersect("sids_a", "sids_b")).cast("bigint")
    return (
        coll.join(sa, "id_src").join(sb, "id_dst")
        .withColumn("_common", common)
        .filter(
            F.col("_common") * 1000 >= F.lit(int(permille)) * F.col("n_a")
        )
        .select(
            "id_src", "id_dst",
            F.expr("(_common * 1000) div n_a")
            .cast("bigint").alias("containment_permille"),
        )
        .distinct()
    )


def containment_pairs_oracle_sql(source: str,
                                 permille: int = CONTAIN_PERMILLE) -> str:
    """Brute-force relational twin over the same shingle CTEs."""
    corpus = corpus_sql(source)
    return f"""
WITH {_shingle_rows_cte(corpus)},
common AS (
  SELECT a.doc_id AS id_src, b.doc_id AS id_dst,
         CAST(count(*) AS BIGINT) AS c
  FROM shx a JOIN shx b ON a.shingle = b.shingle
  WHERE a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_src, id_dst,
       CAST((c * 1000) // n_sh AS BIGINT) AS containment_permille
FROM common JOIN shn ON shn.doc_id = common.id_src
WHERE c * 1000 >= {int(permille)} * n_sh"""
