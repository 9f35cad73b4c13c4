"""Multimodal column plumbing (SURVEY.md §7.4).

Images/audio/video are opaque `binary` columns with typed metadata;
decode / feature-extraction runs as Arrow-batched pandas UDFs via
`mapInPandas`. The container ships no image/audio libraries, so the
actual codec step is STUBBED (clearly marked below) behind a
deterministic fake — but everything Spark-side is real and tested:
the binary schema, the Arrow batch iteration, the UDF signature, and
the output schema. The registered query's feature columns are
recomputed by a DuckDB oracle, so the pandas-UDF path itself is
differentially verified.

Scale notes: mapInPandas streams Arrow record batches — constant
memory per task regardless of table size; binary payloads stay
off-heap through Arrow. At 100 TB the media table would be parquet
with a `binary` column (or object-store URIs resolved inside the
UDF); partition sizing via spark.sql.files.maxPartitionBytes keeps
batches bounded.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.registry import load_table

FORMATS = ["png", "jpeg", "wav"]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_format", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("feature_0", T.LongType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table: the document text bytes stand in for
    an encoded image/audio payload (binary column + format metadata).
    In production this is `spark.read.parquet` over a binary column or
    `binaryFile` format over an object store."""
    d = load_table(spark, sf_dir, "documents")
    fmt = (
        F.when(F.col("doc_id") % 3 == 0, FORMATS[0])
        .when(F.col("doc_id") % 3 == 1, FORMATS[1])
        .otherwise(FORMATS[2])
    )
    return d.select(
        "doc_id",
        fmt.alias("media_format"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def decode_payload(payload: bytes, media_format: str):  # pragma: no cover
    """REAL decode step — STUB. The container has no PIL/librosa/
    ffmpeg; a production build plugs the codec in here. Everything
    around this function (schemas, Arrow batching, partitioning) is
    live and tested with the deterministic fake below."""
    raise NotImplementedError(
        "media decode requires an image/audio codec library not present "
        "in this environment (PIL/librosa); use extract_features' "
        "deterministic fake path"
    )


def _fake_features(payload: bytes) -> tuple[int, str, int]:
    """Deterministic stand-in for decode+featurize: byte length, md5,
    and an integer 'feature' derived from length (mirrored in SQL)."""
    n = len(payload)
    digest = hashlib.md5(payload).hexdigest()
    feature_0 = (n * 2654435761) % 1000000007
    return n, digest, feature_0


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The batch function is SELF-CONTAINED (imports and helpers inside
    the closure): cloudpickle ships it by value, so Python workers
    never need this package on their own sys.path — required when the
    driver process imported the engine by file path from another cwd.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def feats_of(payload: bytes) -> tuple[int, str, int]:
            n = len(payload)
            return (
                n,
                _hashlib.md5(payload).hexdigest(),
                (n * 2654435761) % 1000000007,
            )

        for pdf in it:
            feats = pdf["payload"].map(feats_of)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_format": pdf["media_format"],
                    "n_bytes": feats.map(lambda t: t[0]),
                    "payload_md5": feats.map(lambda t: t[1]),
                    "feature_0": feats.map(lambda t: t[2]),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: media synthesis → Arrow UDF featurization."""
    return extract_features(media_table(spark, sf_dir))


#: Oracle recomputing the pandas-UDF outputs relationally: octet_length
#: of the utf-8 payload, md5 over the same bytes, same affine feature.
MULTIMODAL_FEATURES_SQL = """
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INTEGER)
         WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS media_format,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5,
       (CAST(octet_length(encode(text)) AS BIGINT) * 2654435761)
         % 1000000007 AS feature_0
FROM documents
"""


# ---------------------------------------------------------------------------
# Frame sampling: the video-shaped operator — one input row fans out
# to N sampled-frame rows through the same Arrow batch path.
# ---------------------------------------------------------------------------

FRAME_CHARS = 64  # "frame" size in decoded units
FRAME_STRIDE = 4  # keep every 4th frame

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_chars", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row → N-rows frame sampling via mapInPandas: each media payload
    is "decoded" (deterministic fake: utf-8 text stands in for the
    frame stream — a real build decodes via the stubbed codec in
    `decode_payload`) and split into FRAME_CHARS-unit frames, keeping
    every FRAME_STRIDE-th. This is the standard video pre-processing
    shape for multimodal training data: bounded fan-out per row,
    constant-memory Arrow batch iteration, and the frame content
    hash for downstream dedup.

    Scale: fan-out ≤ len/FRAME_CHARS/FRAME_STRIDE rows per input; the
    UDF emits one output DataFrame per Arrow batch, so memory stays
    batch-bounded regardless of document size skew."""
    media = media_table(spark, sf_dir)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        F_CHARS, F_STRIDE = 64, 4

        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_chars": [],
                "frame_md5": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                text = bytes(payload).decode("utf-8")
                n_frames = (len(text) + F_CHARS - 1) // F_CHARS
                for i in range(0, n_frames, F_STRIDE):
                    frame = text[i * F_CHARS : (i + 1) * F_CHARS]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_chars"].append(len(frame))
                    out["frame_md5"].append(
                        _hashlib.md5(frame.encode("utf-8")).hexdigest()
                    )
            yield _pd.DataFrame(out)

    return media.mapInPandas(batches, FRAME_SCHEMA)


MULTIMODAL_FRAME_SAMPLE_SQL = f"""
SELECT doc_id,
       f.frame_idx AS frame_idx,
       CAST(length(substring(text, CAST(f.frame_idx * {FRAME_CHARS} + 1
                                        AS BIGINT), {FRAME_CHARS}))
            AS BIGINT) AS frame_chars,
       md5(substring(text, CAST(f.frame_idx * {FRAME_CHARS} + 1 AS BIGINT),
                     {FRAME_CHARS})) AS frame_md5
FROM documents,
     LATERAL (SELECT unnest(range(0,
                (length(text) + {FRAME_CHARS - 1}) // {FRAME_CHARS},
                {FRAME_STRIDE}))) f(frame_idx)
"""
