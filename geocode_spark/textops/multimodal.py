"""Multimodal columns: opaque binary payloads with typed metadata.

The pages fixture carries an `html: binary` column whose payload is a
deterministic synthetic image container: magic b"FIMG" + big-endian uint16
(width, height) + a text excerpt. Real image/audio decode libraries are NOT
installed in this environment, so decode_image's real lane is gated behind
an optional-dependency probe (has_image_library) and its deterministic fake
lane carries the gate — the Spark-side plumbing (binary column handling,
Arrow-batched pandas UDFs over mapInPandas, schema contracts, per-row
fan-out for frame sampling) is real and oracle-checked:

  image_meta    — header parse (magic/width/height/bytes/aspect) in a pandas
                  UDF; DuckDB oracle re-parses the SAME bytes via hex-digit
                  arithmetic, so the two independent binary decoders must agree.
  resize_plan   — aspect-preserving target dims (pure arithmetic).
  decode_image  — pixel decode: with PIL present, an Arrow-batched kernel
                  emits per-channel means; without it (this sandbox), raises
                  NotImplementedError unless fake=True, which emits
                  deterministic hash-like features that the oracle reproduces
                  (keeps the contract testable end to end either way).
  frame_sample  — pretend-video frame sampling: byte-length-derived frame
                  count, strided index explode (real per-frame fan-out shape).
  audio_meta    — treat post-header bytes as 8-bit PCM samples: sample count,
                  rate, integer duration (pure arithmetic).
  audio_features— windowed amplitude aggregates (count/sum/sum-of-squares/
                  peak per window) computed from the REAL bytes in an
                  Arrow-batched pandas UDF (binary -> numpy frombuffer); all
                  outputs are integers, so the DuckDB hex-parse oracle
                  compares exactly.

At scale: one Arrow-batched Python stage per binary op, no shuffle (pure
per-row), binary column pruned unless required (`.explain` shows ReadSchema
without `html` for queries that skip these ops).
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..caching import persist_tracked

MAGIC = b"FIMG"
MAGIC_HEX = "46494D47"
DEFAULT_MAX_DIM = 256
FRAME_STRIDE = 4

_META_SCHEMA = StructType(
    [
        StructField("format", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("error", StringType()),
    ]
)

MSG_TRUNCATE = 500  # F5/P5: reference geocode.py:253-254


def _invalid_container_msg(n: int) -> str:
    return f"invalid image container: {n} bytes"


@F.pandas_udf(_META_SCHEMA)
def _parse_header(html: pd.Series) -> pd.DataFrame:
    """Arrow-batched binary header parse (the real-decode integration point).

    Per-row error capture (F5): a payload that is not a valid container
    yields a deterministic error message; a payload that makes the decoder
    THROW yields str(ex)[:500] — an error row either way, never a dead task.
    """
    fmts, ws, hs, errs = [], [], [], []
    for b in html:
        try:
            if b is not None and len(b) >= 8 and bytes(b[:4]) == MAGIC:
                w, h = struct.unpack(">HH", bytes(b[4:8]))
                fmts.append("FIMG")
                ws.append(w)
                hs.append(h)
                errs.append(None)
            else:
                fmts.append(None)
                ws.append(None)
                hs.append(None)
                errs.append(
                    _invalid_container_msg(0 if b is None else len(b))
                )
        except Exception as ex:  # pragma: no cover - defensive per-row net
            fmts.append(None)
            ws.append(None)
            hs.append(None)
            errs.append(str(ex)[:MSG_TRUNCATE])
    return pd.DataFrame(
        {"format": fmts, "width": ws, "height": hs, "error": errs}
    )


def image_meta(pages: DataFrame) -> DataFrame:
    m = pages.select("url", F.length("html").cast("bigint").alias("n_bytes"),
                     _parse_header("html").alias("m"))
    return m.select(
        "url",
        F.col("m.format").alias("format"),
        F.col("m.width").alias("width"),
        F.col("m.height").alias("height"),
        "n_bytes",
        F.round(
            F.col("m.width").cast("double") / F.col("m.height").cast("double"), 6
        ).alias("aspect"),
        F.col("m.error").alias("error"),
    )


def resize_plan(pages: DataFrame, max_dim: int = DEFAULT_MAX_DIM) -> DataFrame:
    """Aspect-preserving resize targets; no-op when already within max_dim."""
    m = image_meta(pages)
    w, h = F.col("width"), F.col("height")
    longest = F.greatest(w, h)
    scale_needed = longest > max_dim
    tw = F.when(
        scale_needed,
        F.floor(w.cast("double") * max_dim / longest.cast("double")),
    ).otherwise(w).cast("bigint")
    th = F.when(
        scale_needed,
        F.floor(h.cast("double") * max_dim / longest.cast("double")),
    ).otherwise(h).cast("bigint")
    return m.select("url", "width", "height",
                    tw.alias("target_w"), th.alias("target_h"))


def has_image_library() -> bool:
    """Optional-dependency probe: True iff PIL is importable. The sandbox
    ships no image library, so the real decode path below is exercised
    only in environments that do (the probe keeps the capability gate
    honest instead of hardcoding 'not available')."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(pages: DataFrame, fake: bool = False) -> DataFrame:
    """Pixel decode to mean-channel features.

    fake=True emits deterministic header-derived pseudo-features (f0..f2)
    so the downstream contract (schema, batching, oracle compare) is
    exercised without a decoder. fake=False requires a real image library
    (probed via has_image_library); when present, decodes each binary
    payload in an Arrow-batched kernel and emits per-channel means into
    the SAME (url, f0, f1, f2) schema — when absent it raises
    NotImplementedError at plan-build time."""
    if not fake:
        if not has_image_library():
            raise NotImplementedError(
                "pixel decode requires an image library (PIL) — not "
                "available in this environment; pass fake=True for the "
                "deterministic plumbing-test features"
            )
        def kernel(batches):
            import io

            import pandas as pd
            from PIL import Image

            for pdf in batches:
                feats = []
                for payload in pdf["html"]:
                    try:
                        img = Image.open(io.BytesIO(payload)).convert("RGB")
                        px = img.resize((8, 8)).getdata()
                        chans = list(zip(*px))
                        feats.append(
                            [int(sum(c) // len(c)) for c in chans[:3]]
                        )
                    except Exception:
                        feats.append([-1, -1, -1])
                out = pd.DataFrame(
                    {
                        "url": pdf["url"],
                        "f0": [f[0] for f in feats],
                        "f1": [f[1] for f in feats],
                        "f2": [f[2] for f in feats],
                    }
                )
                yield out

        return pages.select("url", "html").mapInPandas(
            kernel, "url string, f0 bigint, f1 bigint, f2 bigint"
        )
    m = image_meta(pages)
    w, h = F.col("width"), F.col("height")
    return m.select(
        "url",
        (w * h % 256).cast("bigint").alias("f0"),
        ((w + h) % 256).cast("bigint").alias("f1"),
        ((w * 3 + h * 7) % 256).cast("bigint").alias("f2"),
    )


def frame_sample(pages: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Pretend-video frame sampling: frame count derived from byte length,
    one output row per sampled frame index (the real fan-out shape)."""
    n_frames = (F.length("html").cast("bigint") % 30 + 1)
    idx = F.sequence(F.lit(0).cast("bigint"), n_frames - 1,
                     F.lit(stride).cast("bigint"))
    return pages.select(
        "url", n_frames.alias("n_frames"), F.explode(idx).alias("frame_idx")
    )


HEADER_BYTES = 8
SAMPLE_RATE = 16000
AUDIO_WINDOW = 16


def audio_meta(pages: DataFrame, sample_rate: int = SAMPLE_RATE) -> DataFrame:
    """Audio-as-binary metadata: post-header bytes are 8-bit PCM samples.

    Pure column arithmetic (no Python): n_samples, fixed sample_rate, integer
    microsecond duration — the typed-metadata half of the audio contract."""
    n = F.greatest(
        F.length("html").cast("bigint") - HEADER_BYTES, F.lit(0).cast("bigint")
    )
    return pages.select(
        "url",
        n.alias("n_samples"),
        F.lit(sample_rate).cast("bigint").alias("sample_rate"),
        F.floor(n * 1000000 / sample_rate).cast("bigint").alias("duration_us"),
    )


def audio_features(pages: DataFrame, window: int = AUDIO_WINDOW) -> DataFrame:
    """Windowed amplitude features over the raw sample bytes.

    One output row per (url, window): sample count, sum, sum of squares and
    peak amplitude — all BIGINT, computed by numpy over the real binary
    payload inside an Arrow-batched mapInPandas stage (the integration point
    where a real audio decoder would slot in). Per-row fan-out is bounded by
    ceil(n_samples / window); no shuffle."""
    import numpy as np

    src = pages.select("url", "html")

    def feats(batches):
        for pdf in batches:
            # Vectorized across the whole Arrow batch: concatenate every
            # row's samples once, then one ufunc.reduceat per aggregate over
            # the absolute window-start offsets (window boundaries reset per
            # row because each row's first start IS the previous row's end).
            payloads = [
                bytes(p)
                for p in pdf["html"]
                if p is not None and len(p) > HEADER_BYTES
            ]
            urls = np.asarray(
                [
                    u
                    for u, p in zip(pdf["url"], pdf["html"])
                    if p is not None and len(p) > HEADER_BYTES
                ],
                dtype=object,
            )
            if not payloads:
                continue
            sam = [
                np.frombuffer(p, dtype=np.uint8, offset=HEADER_BYTES)
                for p in payloads
            ]
            lens = np.array([len(s) for s in sam], dtype=np.int64)
            cat = np.concatenate(sam).astype(np.int64)
            n_win = -(-lens // window)  # ceil
            row_start = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=row_start[1:])
            win_idx = np.concatenate([np.arange(k) for k in n_win])
            starts = np.repeat(row_start, n_win) + win_idx * window
            ends = np.append(starts[1:], len(cat))
            yield pd.DataFrame(
                {
                    "url": pd.Series(np.repeat(urls, n_win), dtype="object"),
                    "window_idx": pd.Series(win_idx, dtype="int64"),
                    "n_samples": pd.Series(ends - starts, dtype="int64"),
                    "sum_amp": pd.Series(
                        np.add.reduceat(cat, starts), dtype="int64"
                    ),
                    "sumsq_amp": pd.Series(
                        np.add.reduceat(cat * cat, starts), dtype="int64"
                    ),
                    "peak": pd.Series(
                        np.maximum.reduceat(cat, starts), dtype="int64"
                    ),
                }
            )

    return src.mapInPandas(
        feats,
        schema=(
            "url string, window_idx bigint, n_samples bigint,"
            " sum_amp bigint, sumsq_amp bigint, peak bigint"
        ),
    )


# ----------------------------------------------------------------- oracle side
def _nib(pos: int) -> str:
    return f"(strpos('0123456789ABCDEF', substr(hx, {pos}, 1)) - 1)"


def _u16_sql(first_nibble: int) -> str:
    n = first_nibble
    return (
        f"({_nib(n)} * 4096 + {_nib(n + 1)} * 256"
        f" + {_nib(n + 2)} * 16 + {_nib(n + 3)})"
    )


_HEX_CTE = f"""
hxp AS (
  SELECT url, hex(html) AS hx, CAST(octet_length(html) AS BIGINT) AS n_bytes
  FROM read_parquet('{{fix}}/pages.parquet')
),
meta AS (
  SELECT url, n_bytes,
         CASE WHEN n_bytes >= 8 AND substr(hx, 1, 8) = '{MAGIC_HEX}'
              THEN 'FIMG' END AS format,
         CASE WHEN n_bytes >= 8 AND substr(hx, 1, 8) = '{MAGIC_HEX}'
              THEN CAST({_u16_sql(9)} AS BIGINT) END AS width,
         CASE WHEN n_bytes >= 8 AND substr(hx, 1, 8) = '{MAGIC_HEX}'
              THEN CAST({_u16_sql(13)} AS BIGINT) END AS height
  FROM hxp
)"""


def image_meta_oracle_sql(fix: str) -> str:
    return f"""
WITH {_HEX_CTE.format(fix=fix)}
SELECT url, format, width, height, n_bytes,
       round(CAST(width AS DOUBLE) / CAST(height AS DOUBLE), 6) AS aspect,
       CASE WHEN format IS NULL
            THEN concat('invalid image container: ',
                        CAST(n_bytes AS VARCHAR), ' bytes') END AS error
FROM meta
"""


def resize_plan_oracle_sql(fix: str, max_dim: int = DEFAULT_MAX_DIM) -> str:
    return f"""
WITH {_HEX_CTE.format(fix=fix)}
SELECT url, width, height,
       CAST(CASE WHEN greatest(width, height) > {max_dim}
                 THEN floor(CAST(width AS DOUBLE) * {max_dim}
                            / CAST(greatest(width, height) AS DOUBLE))
                 ELSE width END AS BIGINT) AS target_w,
       CAST(CASE WHEN greatest(width, height) > {max_dim}
                 THEN floor(CAST(height AS DOUBLE) * {max_dim}
                            / CAST(greatest(width, height) AS DOUBLE))
                 ELSE height END AS BIGINT) AS target_h
FROM meta
"""


def decode_image_oracle_sql(fix: str) -> str:
    return f"""
WITH {_HEX_CTE.format(fix=fix)}
SELECT url,
       CAST(width * height % 256 AS BIGINT) AS f0,
       CAST((width + height) % 256 AS BIGINT) AS f1,
       CAST((width * 3 + height * 7) % 256 AS BIGINT) AS f2
FROM meta
"""


def audio_meta_oracle_sql(fix: str, sample_rate: int = SAMPLE_RATE) -> str:
    return f"""
SELECT url, n_samples,
       CAST({sample_rate} AS BIGINT) AS sample_rate,
       CAST(floor(n_samples * 1000000 / {sample_rate}) AS BIGINT) AS duration_us
FROM (
  SELECT url, CAST(greatest(octet_length(html) - {HEADER_BYTES}, 0) AS BIGINT)
              AS n_samples
  FROM read_parquet('{fix}/pages.parquet')
)
"""


def audio_features_oracle_sql(fix: str, window: int = AUDIO_WINDOW) -> str:
    """Independent byte decoder: hex-digit arithmetic over the same payload."""
    byte = (
        "(strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1) * 16"
        " + (strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1)"
    )
    return f"""
WITH hxp AS (
  SELECT url, hex(html) AS hx, CAST(octet_length(html) AS BIGINT) AS nb
  FROM read_parquet('{fix}/pages.parquet')
),
pos AS (
  SELECT url, hx, unnest(generate_series({HEADER_BYTES}, nb - 1)) AS i
  FROM hxp WHERE nb > {HEADER_BYTES}
),
byt AS (
  SELECT url, CAST((i - {HEADER_BYTES}) // {window} AS BIGINT) AS window_idx,
         {byte} AS byte
  FROM pos
)
SELECT url, window_idx,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(byte) AS BIGINT) AS sum_amp,
       CAST(sum(byte * byte) AS BIGINT) AS sumsq_amp,
       CAST(max(byte) AS BIGINT) AS peak
FROM byt GROUP BY url, window_idx
"""


def frame_sample_oracle_sql(fix: str, stride: int = FRAME_STRIDE) -> str:
    return f"""
SELECT url, n_frames, unnest(generate_series(0, n_frames - 1, {stride})) AS frame_idx
FROM (
  SELECT url, CAST(octet_length(html) AS BIGINT) % 30 + 1 AS n_frames
  FROM read_parquet('{fix}/pages.parquet')
)
"""


# -------------------------------------------------- perceptual byte hashing
DHASH_BITS = 60  # 61 sampled bytes -> 60 gradient bits (sign-bit free)
DHASH_CHUNKS = 5  # 12-bit chunks: Hamming<=4 complete by pigeonhole
DHASH_MAX_HAMMING = 4
_IMG_DUP_MOD = 9  # md5(url)-based deterministic exact-copy injection


def _dhash_sample_array():
    """Array expression of the 61 evenly spaced sampled payload bytes
    (pure Catalyst — the oracle builds the identical index arithmetic).

    Staged as ONE array column by image_bytehash: inlining all 122
    conv/substr calls into a single gradient-sum expression generates Java
    beyond janino's 64 KB method limit (ERROR CodeGenerator + interpreted
    fallback, round-3 verdict item #2). As a multi-use non-cheap alias the
    array survives Catalyst's projection collapse, and each downstream
    gradient bit is a tiny element_at comparison. All index arithmetic is
    integer (div), identical in both dialects."""
    def byte_at(j):
        # 1-based byte index into the full blob, then hex-substr
        idx = f"({HEADER_BYTES} + 1 + (({j} * (nb - {HEADER_BYTES} - 1))"\
              f" div {DHASH_BITS}))"
        return f"CAST(conv(substr(hx, 2 * {idx} - 1, 2), 16, 10) AS BIGINT)"

    return F.expr(
        "array(" + ", ".join(byte_at(j) for j in range(DHASH_BITS + 1)) + ")"
    )


def _dhash_bits_from_array(arr: str = "_sb"):
    """Gradient-bit sum over the staged sample array: bit j = 1 iff
    byte[j+1] > byte[j], landing at position 59-j (same weights the
    one-expression form used — value-identical to the oracle's inlined
    formula)."""
    bits = " + ".join(
        f"(CASE WHEN element_at({arr}, {j + 2}) > element_at({arr}, {j + 1})"
        f" THEN CAST({1 << (DHASH_BITS - 1 - j)} AS BIGINT) ELSE 0 END)"
        for j in range(DHASH_BITS)
    )
    return F.expr(bits)


def image_dup_corpus(pages: DataFrame) -> DataFrame:
    """pages + injected exact binary copies (deterministic md5(url) mod —
    the raw corpus has no duplicate payloads to exercise the hash join)."""
    cond = (
        F.conv(F.substring(F.md5("url"), 1, 2), 16, 10).cast("bigint")
        % _IMG_DUP_MOD == 0
    )
    base = pages.select("url", "html")
    dup = pages.filter(cond).select(
        F.concat(F.col("url"), F.lit("#imgdup")).alias("url"), "html"
    )
    return base.unionByName(dup)


def image_bytehash(images: DataFrame) -> DataFrame:
    """60-bit perceptual byte hash per image (url, n_bytes, hash60).

    The pixel-free stand-in for dHash: with a real decoder the same 61
    samples come from the resized luma plane; the gradient-bit and
    Hamming-join machinery downstream is identical. Payloads with fewer
    than 2 post-header bytes hash to NULL. Zero shuffle."""
    h = images.select(
        "url",
        F.hex("html").alias("hx"),
        F.length("html").cast("bigint").alias("nb"),
    )
    ok = F.col("nb") >= HEADER_BYTES + 2
    staged = h.withColumn("_sb", _dhash_sample_array())
    return staged.select(
        "url",
        F.col("nb").alias("n_bytes"),
        F.when(ok, _dhash_bits_from_array("_sb")).cast("bigint").alias("hash60"),
    )


def image_hash_pairs(images: DataFrame,
                     max_hamming: int = DHASH_MAX_HAMMING) -> DataFrame:
    """Image near-duplicate pairs: Hamming(hash60) <= max_hamming.

    Candidate generation is the SimHash chunk trick: 5 x 12-bit chunk keys
    — any pair within Hamming 4 agrees on >= 1 whole chunk (pigeonhole),
    so the equi-join on (chunk_idx, chunk_val) is complete; exact
    bit_count(xor) verifies. Never all-pairs.

    Oracle-gated as driver query `image_hash_pairs` over
    synthetic_image_corpus (high-entropy md5-chain payloads + injected
    byte-flip near-copies) against a brute-force all-pairs DuckDB twin.
    The fixture's own word-salad 'html' payloads stay out of the gate: their
    byte gradients collapse into ~1.6k hash values over 22k docs, making
    corpus-wide Hamming<=4 degenerate by construction."""
    # persist() the signature relation: it feeds BOTH join sides and the
    # verify pass, and Catalyst's projection collapse would otherwise inline
    # the ~60-comparison dhash expression tree into every chunk branch
    # (recomputing the hash per reference and blowing up codegen) — same
    # reason dedup persists its shingle relation
    sig = persist_tracked(
        image_bytehash(images)
        .filter(F.col("hash60").isNotNull())
        .select("url", "hash60")
    )
    chunk_w = DHASH_BITS // DHASH_CHUNKS
    chunks = sig.select(
        "url", "hash60",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk_idx"),
                    (
                        F.shiftright("hash60", c * chunk_w)
                        .bitwiseAND(F.lit((1 << chunk_w) - 1))
                    ).alias("chunk_val"),
                )
                for c in range(DHASH_CHUNKS)
            ])
        ).alias("ck"),
    ).select("url", "hash60", "ck.*")
    a = chunks.select(F.col("url").alias("url_a"),
                      F.col("hash60").alias("h_a"),
                      "chunk_idx", "chunk_val")
    b = chunks.select(F.col("url").alias("url_b"),
                      F.col("hash60").alias("h_b"),
                      "chunk_idx", "chunk_val")
    cand = (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("url_a") < F.col("url_b"))
        .select("url_a", "url_b", "h_a", "h_b")
        .distinct()
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("bigint")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("url_a", "url_b", "hamming")
    )


def _img_corpus_sql(fix: str) -> str:
    return f"""(
  SELECT url, html FROM read_parquet('{fix}/pages.parquet')
  UNION ALL
  SELECT url || '#imgdup' AS url, html
  FROM read_parquet('{fix}/pages.parquet')
  WHERE ('0x' || substr(md5(url), 1, 2))::BIGINT % {_IMG_DUP_MOD} = 0
)"""


def _dhash_sql() -> str:
    def byte_at(j):
        idx = f"({HEADER_BYTES} + 1 + (({j} * (nb - {HEADER_BYTES} - 1))"\
              f" // {DHASH_BITS}))"
        return f"('0x' || substr(hx, 2 * {idx} - 1, 2))::BIGINT"

    return " + ".join(
        f"(CASE WHEN {byte_at(j + 1)} > {byte_at(j)} THEN "
        f"CAST({1 << (DHASH_BITS - 1 - j)} AS BIGINT) ELSE 0 END)"
        for j in range(DHASH_BITS)
    )


def image_bytehash_oracle_sql(fix: str) -> str:
    return f"""
SELECT url, nb AS n_bytes,
       CASE WHEN nb >= {HEADER_BYTES + 2} THEN CAST({_dhash_sql()} AS BIGINT)
            END AS hash60
FROM (SELECT url, hex(html) AS hx,
             CAST(octet_length(html) AS BIGINT) AS nb
      FROM {_img_corpus_sql(fix)})
"""


def image_hash_pairs_oracle_sql(fix: str,
                                max_hamming: int = DHASH_MAX_HAMMING) -> str:
    """Brute-force all-pairs Hamming — the oracle twin of the chunk join
    (complete for Hamming <= 4 by pigeonhole, so outputs coincide)."""
    return f"""
WITH sig AS (SELECT url, hash60 FROM ({image_bytehash_oracle_sql(fix)})
             WHERE hash60 IS NOT NULL)
SELECT a.url AS url_a, b.url AS url_b,
       CAST(bit_count(xor(a.hash60, b.hash60)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.url < b.url
WHERE bit_count(xor(a.hash60, b.hash60)) <= {max_hamming}
"""


# ----------------------------------------- synthetic high-entropy image corpus
# The fixture 'html' payloads are word-salad TEXT whose byte gradients
# collapse (~1.6k distinct hashes over 22k docs), so corpus-wide Hamming<=4
# used to be degenerate and image_hash_pairs stayed pytest-gated. This corpus
# fixes the ENTROPY, not the machinery: payloads are md5-chain bytes (pure
# function of url — both engines derive them independently), and near-dups
# are injected by overwriting ONE payload byte, which can flip at most the
# two gradient bits that read it (Hamming <= 2 <= DHASH_MAX_HAMMING), while
# unrelated 60-bit hashes collide within Hamming 4 with prob ~4.5e-13.
SYN_IMG_MOD = 8        # 1-in-8 urls carry a synthetic image
SYN_DUP_MOD = 4        # 1-in-4 of those gets a byte-flip near-copy
SYN_IMG_WORDS = 5      # payload = 5 chained md5 blocks = 80 bytes
SYN_FLIP_HEX_POS = 47  # 1-indexed hex char; overwrites payload byte 24


def _syn_hex_col(url):
    return F.concat(
        *[F.md5(F.concat(url, F.lit(f"#{w}"))) for w in range(SYN_IMG_WORDS)]
    )


def synthetic_image_corpus(pages: DataFrame) -> DataFrame:
    """(url, html) with high-entropy 80-byte payloads + injected <=2-bit
    near-copies (url suffix '#syndup')."""
    sel = pages.filter(
        F.conv(F.substring(F.md5("url"), 1, 2), 16, 10).cast("bigint")
        % SYN_IMG_MOD == 0
    ).select("url")
    hx = _syn_hex_col(F.col("url"))
    base = sel.select("url", F.unhex(hx).alias("html"))
    flipped = F.concat(
        F.substring(hx, 1, SYN_FLIP_HEX_POS - 1),
        F.lit("ff"),
        F.substring(hx, SYN_FLIP_HEX_POS + 2, 10_000),
    )
    dup = sel.filter(
        F.conv(F.substring(F.md5("url"), 3, 2), 16, 10).cast("bigint")
        % SYN_DUP_MOD == 0
    ).select(
        F.concat(F.col("url"), F.lit("#syndup")).alias("url"),
        F.unhex(flipped).alias("html"),
    )
    return base.unionByName(dup)


def _syn_corpus_sql(fix: str) -> str:
    """DuckDB twin of synthetic_image_corpus, as (url, hx, nb) — the hash
    reads hex anyway, so the oracle never round-trips through binary."""
    md5s = " || ".join(
        f"md5(url || '#{w}')" for w in range(SYN_IMG_WORDS)
    )
    nb = 16 * SYN_IMG_WORDS
    return f"""(
  WITH sel AS (
    SELECT url FROM read_parquet('{fix}/pages.parquet')
    WHERE ('0x' || substr(md5(url), 1, 2))::BIGINT % {SYN_IMG_MOD} = 0
  )
  SELECT url, {md5s} AS hx, CAST({nb} AS BIGINT) AS nb FROM sel
  UNION ALL
  SELECT url || '#syndup' AS url,
         substr(hx, 1, {SYN_FLIP_HEX_POS - 1}) || 'ff'
           || substr(hx, {SYN_FLIP_HEX_POS + 2}) AS hx,
         CAST({nb} AS BIGINT) AS nb
  FROM (SELECT url, {md5s} AS hx FROM sel)
  WHERE ('0x' || substr(md5(url), 3, 2))::BIGINT % {SYN_DUP_MOD} = 0
)"""


def synthetic_image_hash_pairs_oracle_sql(
    fix: str, max_hamming: int = DHASH_MAX_HAMMING
) -> str:
    """Brute-force all-pairs Hamming over the synthetic corpus — complete
    oracle twin of the chunk join (pigeonhole completeness at <= 4)."""
    return f"""
WITH sig AS (
  SELECT url, CAST({_dhash_sql()} AS BIGINT) AS hash60
  FROM {_syn_corpus_sql(fix)}
)
SELECT a.url AS url_a, b.url AS url_b,
       CAST(bit_count(xor(a.hash60, b.hash60)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.url < b.url
WHERE bit_count(xor(a.hash60, b.hash60)) <= {max_hamming}
"""


# -------------------------------------------- audio sign-of-delta fingerprint
# The audio analog of the image dHash: fingerprint bit j is the SIGN of the
# energy delta between consecutive sample windows (1 iff e[j+1] > e[j]).
# Sign-of-delta is invariant to any monotone per-window energy scaling
# (gain changes, exact re-encodes), and a single corrupted sample perturbs
# ONE window's energy, flipping at most the two adjacent bits — so
# near-copies sit within Hamming 2 while unrelated 30-bit prints collide
# there with prob ~1.4e-7 per pair. Same candidate-then-verify shape as
# image_hash_pairs (pigeonhole chunk join), same synthetic-entropy gate
# rationale: the fixture's 40-byte payloads yield 2 windows = 1 bit, so
# the gate runs over an md5-chain corpus with injected byte-flip copies.
AUDIO_FP_BITS = 30
AUDIO_FP_CHUNKS = 3          # Hamming <= 2 complete: 2 flips miss >= 1 chunk
AUDIO_FP_MAX_HAMMING = 2
SYN_AUDIO_MOD = 8            # 1-in-8 urls carry a synthetic clip
SYN_AUDIO_DUP_MOD = 4        # 1-in-4 of those gets a byte-flip near-copy
SYN_AUDIO_WORDS = 32         # 32 md5 blocks = 512 bytes ~ 32 windows
SYN_AUDIO_FLIP_HEX = 101     # payload byte 50 -> window 2 -> bits {1, 2}


def _syn_audio_hex(url):
    return F.concat(
        *[F.md5(F.concat(url, F.lit(f"~{w}"))) for w in range(SYN_AUDIO_WORDS)]
    )


def synthetic_audio_corpus(pages: DataFrame) -> DataFrame:
    """(url, html): high-entropy 512-byte md5-chain clips for 1-in-8 urls
    (pure function of url — both engines derive them independently), plus
    byte-flip near-copies (url suffix '#synadup') for 1-in-4 of those."""
    sel = pages.filter(
        F.conv(F.substring(F.md5("url"), 5, 2), 16, 10).cast("bigint")
        % SYN_AUDIO_MOD == 0
    ).select("url")
    hx = _syn_audio_hex(F.col("url"))
    base = sel.select("url", F.unhex(hx).alias("html"))
    flipped = F.concat(
        F.substring(hx, 1, SYN_AUDIO_FLIP_HEX - 1),
        F.lit("ff"),
        F.substring(hx, SYN_AUDIO_FLIP_HEX + 2, 10_000),
    )
    dup = sel.filter(
        F.conv(F.substring(F.md5("url"), 7, 2), 16, 10).cast("bigint")
        % SYN_AUDIO_DUP_MOD == 0
    ).select(
        F.concat(F.col("url"), F.lit("#synadup")).alias("url"),
        F.unhex(flipped).alias("html"),
    )
    return base.unionByName(dup)


def audio_fingerprint(
    pages: DataFrame, window: int = AUDIO_WINDOW
) -> DataFrame:
    """(url, n_windows, fp): per clip, the packed sign-of-delta fingerprint
    over the first AUDIO_FP_BITS window-energy deltas (energy = sum of
    squared 8-bit samples per window — audio_features' sumsq lane). Rows
    without a payload past the header are dropped, matching
    audio_features. One Arrow-batched map stage, zero shuffle."""
    import numpy as np

    src = pages.select("url", "html")

    def kernel(batches):
        for pdf in batches:
            payloads = [
                bytes(p)
                for p in pdf["html"]
                if p is not None and len(p) > HEADER_BYTES
            ]
            urls = np.asarray(
                [
                    u
                    for u, p in zip(pdf["url"], pdf["html"])
                    if p is not None and len(p) > HEADER_BYTES
                ],
                dtype=object,
            )
            if not payloads:
                continue
            sam = [
                np.frombuffer(p, dtype=np.uint8, offset=HEADER_BYTES)
                for p in payloads
            ]
            lens = np.array([len(s) for s in sam], dtype=np.int64)
            cat = np.concatenate(sam).astype(np.int64)
            n_win = -(-lens // window)  # ceil
            row_start = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=row_start[1:])
            win_idx = np.concatenate([np.arange(k) for k in n_win])
            starts = np.repeat(row_start, n_win) + win_idx * window
            e = np.add.reduceat(cat * cat, starts)
            # delta p -> (e[p+1] > e[p]) where p+1 stays in the same page;
            # bit index = the left window's in-page index, capped at
            # AUDIO_FP_BITS. Contributions sum exactly in float64
            # (< 2^31 per page << 2^53).
            has_next = win_idx < np.repeat(n_win - 1, n_win)
            page_of = np.repeat(np.arange(len(lens)), n_win)
            p = np.nonzero(has_next)[0]
            j = win_idx[p]
            keep = j < AUDIO_FP_BITS
            p, j = p[keep], j[keep]
            bits = (e[p + 1] > e[p]).astype(np.int64)
            contrib = bits << j
            fp = np.bincount(
                page_of[p], weights=contrib, minlength=len(lens)
            ).astype(np.int64)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "n_windows": pd.Series(n_win, dtype="int64"),
                    "fp": pd.Series(fp, dtype="int64"),
                }
            )

    return src.mapInPandas(
        kernel, schema="url string, n_windows bigint, fp bigint"
    )


def audio_fingerprint_pairs(
    clips: DataFrame, max_hamming: int = AUDIO_FP_MAX_HAMMING
) -> DataFrame:
    """(url_a, url_b, hamming): clip pairs within Hamming max_hamming of
    each other's fingerprints — image_hash_pairs' pigeonhole chunk join
    over the 30-bit audio fingerprint (3 x 10-bit chunks: 2 bit flips
    cannot touch all 3), exact bit_count(xor) verify. Never all-pairs."""
    sig = persist_tracked(audio_fingerprint(clips).select("url", "fp"))
    chunk_w = AUDIO_FP_BITS // AUDIO_FP_CHUNKS
    chunks = sig.select(
        "url", "fp",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk_idx"),
                    (
                        F.shiftright("fp", c * chunk_w)
                        .bitwiseAND(F.lit((1 << chunk_w) - 1))
                    ).alias("chunk_val"),
                )
                for c in range(AUDIO_FP_CHUNKS)
            ])
        ).alias("ck"),
    ).select("url", "fp", "ck.*")
    a = chunks.select(F.col("url").alias("url_a"),
                      F.col("fp").alias("f_a"),
                      "chunk_idx", "chunk_val")
    b = chunks.select(F.col("url").alias("url_b"),
                      F.col("fp").alias("f_b"),
                      "chunk_idx", "chunk_val")
    cand = (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("url_a") < F.col("url_b"))
        .select("url_a", "url_b", "f_a", "f_b")
        .distinct()
    )
    ham = F.bit_count(F.col("f_a").bitwiseXOR(F.col("f_b"))).cast("bigint")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("url_a", "url_b", "hamming")
    )


def _syn_audio_corpus_sql(fix: str) -> str:
    md5s = " || ".join(
        f"md5(url || '~{w}')" for w in range(SYN_AUDIO_WORDS)
    )
    return f"""(
  WITH sel AS (
    SELECT url FROM read_parquet('{fix}/pages.parquet')
    WHERE ('0x' || substr(md5(url), 5, 2))::BIGINT % {SYN_AUDIO_MOD} = 0
  )
  SELECT url, {md5s} AS hx FROM sel
  UNION ALL
  SELECT url || '#synadup' AS url,
         substr(hx, 1, {SYN_AUDIO_FLIP_HEX - 1}) || 'ff'
           || substr(hx, {SYN_AUDIO_FLIP_HEX + 2}) AS hx
  FROM (SELECT url, {md5s} AS hx FROM sel)
  WHERE ('0x' || substr(md5(url), 7, 2))::BIGINT % {SYN_AUDIO_DUP_MOD} = 0
)"""


def _audio_fp_sql(fix: str, window: int = AUDIO_WINDOW) -> str:
    """(url, n_windows, fp) twin over the synthetic corpus: bytes decoded
    from the LOWERCASE md5-chain hex by digit arithmetic (independent of
    the kernel's frombuffer path), energies by GROUP BY window, sign
    bits by LEAD over window order."""
    byte = (
        "(strpos('0123456789abcdef', substr(hx, 2*i+1, 1)) - 1) * 16"
        " + (strpos('0123456789abcdef', substr(hx, 2*i+2, 1)) - 1)"
    )
    return f"""(
  WITH pos AS (
    SELECT url, hx,
           unnest(generate_series({HEADER_BYTES}, len(hx)//2 - 1)) AS i
    FROM {_syn_audio_corpus_sql(fix)}
  ), en AS (
    SELECT url, CAST((i - {HEADER_BYTES}) // {window} AS BIGINT) AS widx,
           SUM(CAST({byte} AS BIGINT) * CAST({byte} AS BIGINT)) AS e
    FROM pos GROUP BY url, widx
  ), de AS (
    SELECT url, widx, e,
           LEAD(e) OVER (PARTITION BY url ORDER BY widx) AS nxt
    FROM en
  )
  SELECT url, CAST(COUNT(*) AS BIGINT) AS n_windows,
         CAST(COALESCE(SUM(CASE WHEN nxt IS NOT NULL AND nxt > e
                                     AND widx < {AUDIO_FP_BITS}
                           THEN (CAST(1 AS BIGINT) << widx)
                           ELSE 0 END), 0) AS BIGINT) AS fp
  FROM de GROUP BY url
)"""


def audio_fingerprint_oracle_sql(
    fix: str, window: int = AUDIO_WINDOW
) -> str:
    return f"SELECT url, n_windows, fp FROM {_audio_fp_sql(fix, window)}"


def audio_fingerprint_pairs_oracle_sql(
    fix: str, max_hamming: int = AUDIO_FP_MAX_HAMMING
) -> str:
    """Brute-force all-pairs twin of the pigeonhole chunk join."""
    return f"""
WITH sig AS (
  SELECT url, fp FROM {_audio_fp_sql(fix)}
)
SELECT a.url AS url_a, b.url AS url_b,
       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.url < b.url
WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
"""
