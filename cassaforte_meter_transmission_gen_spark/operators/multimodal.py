"""Multimodal column handling (SURVEY §2.10): treat image/audio/video
as opaque ``binary`` payloads with typed metadata, processed through
Arrow-batched ``mapInPandas`` operators.

The decode libraries (PIL/librosa/ffmpeg) are not available in this
environment, so the decode step is STUBBED — ``decode_stub='error'``
raises NotImplementedError exactly where a real decoder would plug in,
and ``decode_stub='fake'`` produces deterministic pseudo-features from
the payload bytes so the full Spark plumbing (schema, batching,
partitioning, UDF signature) is real and testable.

Scale design: payloads stay in executor memory as Arrow binary
columns; ``mapInPandas`` streams record batches (no per-row Python
overhead); feature outputs are narrow typed columns so downstream
plans never reshuffle the heavy payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the feature-extraction stage
FEATURE_SCHEMA = (
    "item_id bigint, n_bytes int, format string, "
    "width int, height int, feature_hash bigint"
)


def to_binary_payloads(df: DataFrame, id_col: str, payload_col: str, fmt: str) -> DataFrame:
    """Normalize any payload-ish column into the engine's multimodal
    shape: (item_id, payload binary, format string, n_bytes int)."""
    return df.select(
        F.col(id_col).cast("long").alias("item_id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.lit(fmt).alias("format"),
        F.octet_length(F.col(payload_col).cast("binary")).cast("int").alias("n_bytes"),
    )


def extract_features(df: DataFrame, decode_stub: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decode_stub='error'`` marks the real-decoder plug point;
    ``'fake'`` derives deterministic pseudo width/height/feature-hash
    from the bytes (first/last byte, length) so tests can assert the
    full pipeline shape.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd  # local import: executed on executors

        for pdf in batches:
            if decode_stub == "error":
                raise NotImplementedError(
                    "real image/audio decode requires PIL/librosa — plug the "
                    "decoder in here; the fake path exercises the plumbing"
                )
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            first = payloads.map(lambda b: b[0] if b else 0)
            last = payloads.map(lambda b: b[-1] if b else 0)
            out = pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    "format": pdf["format"],
                    # deterministic fake decode: pretend dims from bytes
                    "width": (first.astype("int64") % 64 + 1).astype("int32"),
                    "height": (last.astype("int64") % 64 + 1).astype("int32"),
                    "feature_hash": (
                        n_bytes.astype("int64") * 1_000_003
                        + first.astype("int64") * 31
                        + last.astype("int64")
                    ),
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)
