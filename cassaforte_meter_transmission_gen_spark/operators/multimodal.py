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


#: output schema of the resize stage (payload in, payload out)
RESIZE_SCHEMA = "item_id bigint, payload binary, n_bytes int, format string"


def resize_payloads(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Resize plumbing (image downscale / audio resample stand-in):
    stride-subsample each payload to at most ``target_bytes`` bytes
    (stride = ceil(n / target)). Deterministic and byte-exact, so the
    binary→binary Arrow round-trip is oracle-verifiable; a real
    PIL/ffmpeg resize plugs into the same mapInPandas seam with the
    same payload-in/payload-out schema.

    Scale shape matches the real thing: the heavy payload never leaves
    the task (no shuffle), output payloads are strictly smaller, and
    downstream stages see the same multimodal schema."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd  # local import: executed on executors

        for pdf in batches:
            payloads, sizes = [], []
            for b in pdf["payload"]:
                b = b or b""
                stride = max(1, -(-len(b) // target_bytes))
                rb = b[::stride]
                payloads.append(rb)
                sizes.append(len(rb))
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "payload": payloads,
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                    "format": pdf["format"],
                }
            )

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


#: output schema of the frame sampler
FRAME_SCHEMA = "item_id bigint, frame_idx int, frame_bytes binary, frame_len int"


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing (video → k evenly-spaced frames): slices
    each payload into ``n_frames`` byte ranges — the deterministic
    stand-in for an ffmpeg keyframe extractor, with the real fan-out
    shape: one input row → k output rows, payload bytes partitioned
    (never duplicated), Arrow-batched.

    At scale the fan-out happens inside the task (mapInPandas), so no
    shuffle carries the heavy bytes; downstream feature extraction
    sees narrow per-frame rows."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd  # local import: executed on executors

        for pdf in batches:
            rows = {"item_id": [], "frame_idx": [], "frame_bytes": [], "frame_len": []}
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                b = payload or b""
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    chunk = b[i * step: (i + 1) * step] if i < n_frames - 1 else b[i * step:]
                    rows["item_id"].append(item_id)
                    rows["frame_idx"].append(i)
                    rows["frame_bytes"].append(chunk)
                    rows["frame_len"].append(len(chunk))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
