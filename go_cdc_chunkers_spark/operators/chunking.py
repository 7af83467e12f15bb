"""P2-P3: the Spark chunking stage.

chunk_clips() turns clips(clip_id, bytes, ...) into the reference's Split()
output relation (chunkers.go:214-232):

  chunks(clip_id string, algo string, chunk_idx int, offset long,
         length int, chunk_hash binary)

The cutpoint scan runs inside one vectorized pandas UDF (ArrowEvalPython
node): bytes arrive as an Arrow batch, each row is chunked by the numpy
kernels (cdc/kernels.py -- byte-exact with the reference), per-chunk sha256
is computed in C-speed hashlib (cmd/cdc/stats.go:135's digest). Zero
row-at-a-time Python UDFs; the per-row loop below only dispatches whole-row
numpy work, mirroring the reference's inter-stream-only parallelism
(cmd/cdcbench/bench.go:100-136: one chunker per file, N workers == here one
kernel call per clip, N executor cores).

Chunking is embarrassingly parallel across rows and carries no cross-row
state, so the output is Arrow-batch-size invariant (the analogue of the
reference's buffer-equivalence guarantee, buffer_test.go:59-114; pinned by
tests/test_spark_chunking.py).

Empty bytes => zero chunk rows for that clip (explode_outer is NOT used, by
design: the reference's empty-stream chunk is zero-length and every consumer
skips it -- harness_test.go:140).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..cdc import kernels
from ..cdc.opts import ChunkerOpts, ResolvedOpts, resolve

CHUNK_ARRAY_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("offset", T.LongType(), False),
            T.StructField("length", T.IntegerType(), False),
            T.StructField("chunk_hash", T.BinaryType(), False),
        ]
    )
)

CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("algo", T.StringType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("length", T.IntegerType(), False),
        T.StructField("chunk_hash", T.BinaryType(), False),
    ]
)


def make_chunk_udf(algorithm: str, opts: ChunkerOpts | None = None,
                   digest: bool | str = True, decode_codec: bool = False):
    """Series->Series pandas UDF: binary -> array<struct<offset,length,hash>>.

    The ResolvedOpts (incl. any keyed Gear table derivation input) is captured
    in the closure; the derived table itself is memoized per worker process
    (cdc/tables.py mirrors the reference's process-wide cache,
    fastcdc.go:37-75).

    decode_codec=True returns a TWO-argument UDF (bytes, codec) that decodes
    each payload to int16 PCM (multimodal._decode_pcm_batch: pcm_s16le /
    RIFF-WAVE / G.711 / IMA-ADPCM / FLAC) and chunks the PCM byte stream
    instead of the storage bytes -- fused into the SAME single
    ArrowEvalPython node, so codec normalization costs zero extra Python
    stages. This is the north-star contract ("shingle each clip's decoded
    PCM bytes"): chunk identity becomes a property of the AUDIO, not of the
    container, so a FLAC upload of an existing WAV clip produces byte-
    identical chunks (lossless codecs) and dedups as the same content."""
    r: ResolvedOpts = resolve(algorithm, opts) if not isinstance(algorithm, ResolvedOpts) else algorithm

    def _rows(data, codecs=None):
        normalize = codecs is not None
        if not normalize:
            payloads = ((b, None) for b in data)
        else:
            payloads = zip(data, codecs)
        out = []
        for b, codec in payloads:
            if b is None:
                out.append([])
                continue
            raw = bytes(b)
            if normalize:
                # decode-for-real-or-raise: a NULL codec under
                # normalization would silently chunk the CONTAINER bytes
                # and the clip would never dedup against its decoded
                # twins -- same contract as the exact_first identity path
                # (multimodal._decode_pcm_batch raises on unknown codecs)
                if codec is None:
                    raise ValueError(
                        "normalize_pcm: codec column is NULL for a clip; "
                        "stamp a codec ('pcm_s16le' for raw PCM) or chunk "
                        "without codec_col")
                from . import multimodal

                raw = multimodal._decode_pcm_batch(raw, codec).tobytes()
            # Raw (offset, length, hash) tuples, NOT dicts: pyarrow's
            # list<struct> conversion takes the tuple fast path (~250x the
            # per-dict rate measured on this box -- the dict path re-probes
            # field names per element), and split_chunks already emits
            # tuples in struct field order.
            out.append(kernels.split_chunks(r, raw, digest=digest))
        return pd.Series(out)

    if decode_codec:

        @F.pandas_udf(CHUNK_ARRAY_TYPE)
        def _chunk_decoded(data: pd.Series, codec: pd.Series) -> pd.Series:
            return _rows(data, codec)

        return _chunk_decoded

    @F.pandas_udf(CHUNK_ARRAY_TYPE)
    def _chunk(data: pd.Series) -> pd.Series:
        return _rows(data)

    return _chunk


def chunk_clips(
    df: DataFrame,
    algorithm: str,
    opts: ChunkerOpts | None = None,
    data_col: str = "bytes",
    id_col: str = "clip_id",
    digest: bool | str = True,
    codec_col: str | None = None,
) -> DataFrame:
    """clips -> chunks relation (P3). One shuffle-free narrow stage:
    Scan -> ArrowEvalPython -> Generate(posexplode) -> Project.

    digest: "sha256" (default; reference-parity identity) or "poly128"
    (16-byte polynomial digest, ~2x chunking throughput -- the identity
    for near-dup signatures, where a non-cryptographic hash suffices;
    kernels.split_chunks documents the format).

    codec_col: when given, payloads are decoded to int16 PCM first
    (see make_chunk_udf decode_codec) and the PCM byte stream is chunked;
    still exactly one ArrowEvalPython (decode fused into the chunk UDF,
    pinned by tests/test_codec_normalize.py)."""
    udf = make_chunk_udf(algorithm, opts, digest=digest,
                         decode_codec=codec_col is not None)
    # posexplode_outer, not posexplode: the non-outer Generate makes Catalyst
    # insert a `size(udf(bytes)) > 0` pre-filter that extracts a SECOND
    # ArrowEvalPython node -- the chunk kernel would run twice per row. The
    # outer variant generates unconditionally; empty clips surface as one
    # null row which the post-Generate filter (on Generate *output*, no UDF
    # reference) drops, preserving the empty-input contract.
    chunks_expr = (udf(F.col(data_col), F.col(codec_col))
                   if codec_col is not None else udf(F.col(data_col)))
    return (
        df.select(F.col(id_col).alias("clip_id"), chunks_expr.alias("_chunks"))
        .select(
            "clip_id",
            F.posexplode_outer("_chunks").alias("chunk_idx", "_c"),
        )
        .filter(F.col("chunk_idx").isNotNull())
        .select(
            "clip_id",
            F.lit(algorithm).alias("algo"),
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("_c.offset").alias("offset"),
            F.col("_c.length").alias("length"),
            F.col("_c.chunk_hash").alias("chunk_hash"),
        )
    )


def chunk_transcripts(
    df: DataFrame,
    algorithm: str,
    opts: ChunkerOpts | None = None,
    text_col: str = "transcript",
    id_col: str = "clip_id",
) -> DataFrame:
    """Chunk the UTF-8 encoding of a text column with the same kernels."""
    return chunk_clips(
        df.select(F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("_raw")),
        algorithm,
        opts,
        data_col="_raw",
        id_col=id_col,
    )


def fingerprint_by_clip(chunks: DataFrame) -> DataFrame:
    """Per-clip fingerprint relation with the reference's profile cuts-hash
    (internal/testutil/testutil.go:30-111; tests/golden_test.go:52-92):
    cuts_hash = sha256 of the chunk lengths as little-endian uint64s in
    chunk order, computed entirely JVM-side (hex -> byte-swap -> unhex ->
    ordered concat -> sha2). Matches cdc/kernels.fingerprint()'s cuts_hash
    bit-for-bit (pinned in tests/test_spark_chunking.py)."""
    h = F.lpad(F.hex(F.col("length").cast("bigint")), 16, "0")
    le_hex = F.concat(*[F.substring(h, p, 2) for p in (15, 13, 11, 9, 7, 5, 3, 1)])
    return (
        chunks.withColumn("_le", le_hex)
        .groupBy("clip_id", "algo")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum("length").cast("long").alias("total_bytes"),
            F.min("length").cast("long").alias("min_len"),
            F.max("length").cast("long").alias("max_len"),
            F.sha2(
                F.unhex(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct(F.col("chunk_idx"), F.col("_le")))
                            ),
                            lambda x: x["_le"],
                        ),
                        "",
                    )
                ),
                256,
            ).alias("cuts_hash"),
        )
    )
