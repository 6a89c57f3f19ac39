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


# --- real decoder for one format: BMP (pure Python, no codec libs) ---
#
# The decode seam above is stubbed because PIL/librosa are absent; BMP
# (24-bit uncompressed, the Windows DIB format) is simple enough to
# parse honestly in pure Python, so this pair makes the seam REAL for
# one format: a byte-exact encoder (used to synthesize test payloads)
# and a validating decoder that undoes everything the container does —
# 4-byte row padding, bottom-up row order, BGR channel order. The
# registry query multimodal_bmp_decode hash-gates the decoded pixels
# against a serial re-derivation, so the decode is verified content,
# not plumbing.

_BMP_HEADER_SIZE = 14 + 40  # BITMAPFILEHEADER + BITMAPINFOHEADER


def bmp_encode(width: int, height: int, rgb: bytes) -> bytes:
    """Encode canonical top-down RGB pixels (len == width*height*3) as
    a 24-bit uncompressed BMP: BITMAPFILEHEADER + BITMAPINFOHEADER,
    rows bottom-up, pixels BGR, each row padded to 4 bytes."""
    import struct

    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    row_size = (3 * width + 3) // 4 * 4
    image_size = row_size * height
    out = bytearray()
    out += struct.pack(
        "<2sIHHI", b"BM", _BMP_HEADER_SIZE + image_size, 0, 0, _BMP_HEADER_SIZE
    )
    out += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    pad = b"\x00" * (row_size - 3 * width)
    for y in range(height - 1, -1, -1):  # bottom-up
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        # RGB → BGR per pixel
        for x in range(width):
            p = row[x * 3 : x * 3 + 3]
            out += bytes((p[2], p[1], p[0]))
        out += pad
    return bytes(out)


def bmp_decode(b: bytes) -> tuple[int, int, bytes]:
    """Decode a 24-bit uncompressed BMP to (width, height, canonical
    top-down RGB bytes). Validates the container loudly (magic, header
    size, bpp, compression) — a truncated or foreign payload raises
    instead of yielding garbage features."""
    import struct

    if len(b) < _BMP_HEADER_SIZE or b[:2] != b"BM":
        raise ValueError("not a BMP payload (bad magic/size)")
    offset = struct.unpack_from("<I", b, 10)[0]
    hdr_size, width, height, planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", b, 14
    )
    if hdr_size != 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (hdr={hdr_size}, bpp={bpp}, "
            f"compression={compression})"
        )
    if width <= 0 or height <= 0:
        raise ValueError("unsupported BMP dimensions")
    row_size = (3 * width + 3) // 4 * 4
    if len(b) < offset + row_size * height:
        raise ValueError("truncated BMP pixel data")
    rgb = bytearray(width * height * 3)
    for y in range(height):
        src = offset + (height - 1 - y) * row_size  # stored bottom-up
        for x in range(width):
            bgr = b[src + x * 3 : src + x * 3 + 3]
            i = (y * width + x) * 3
            rgb[i : i + 3] = bytes((bgr[2], bgr[1], bgr[0]))
    return width, height, bytes(rgb)


def synthetic_bmp_pattern(
    item_id: int, width: int | None = None, height: int | None = None
) -> tuple[int, int, bytes]:
    """Deterministic per-id test image: width = id%5+2, height =
    id%3+2 (mixed widths exercise every row-padding amount 0-3) unless
    overridden (e.g. the canonical 8×8 aHash grid);
    pixel (y, x, channel) = (id·7919 + y·31 + x·3 + c) mod 256 in RGB
    order — a pure integer formula a SQL oracle re-derives exactly."""
    w = width if width is not None else item_id % 5 + 2
    h = height if height is not None else item_id % 3 + 2
    rgb = bytes(
        (item_id * 7919 + y * 31 + x * 3 + c) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    return w, h, rgb


def encode_synthetic_bmps(
    df: DataFrame,
    id_col: str = "item_id",
    width: int | None = None,
    height: int | None = None,
) -> DataFrame:
    """(id) → (item_id, payload binary, format 'bmp'): each row becomes
    a REAL BMP file of its synthetic pattern, built executor-side in
    Arrow batches — the encode half of the genuine-codec proof.
    ``width``/``height`` pin a fixed geometry (e.g. 8×8 for the
    word-packed aHash path); default derives mixed sizes from the id."""
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [
                bmp_encode(*synthetic_bmp_pattern(int(i), width, height))
                for i in ids
            ]
            yield pd.DataFrame(
                {"item_id": ids, "payload": payloads, "format": "bmp"}
            )

    return df.mapInPandas(run, schema="item_id bigint, payload binary, format string")


def decode_bmp_features(df: DataFrame) -> DataFrame:
    """(item_id, payload) → (item_id, width, height, pixels binary):
    the REAL decode path — container stripped (padding, bottom-up rows,
    BGR), canonical RGB pixels out. Same mapInPandas seam and narrow-
    output shape as the stubbed extract_features; a PIL decoder for
    other formats plugs in identically."""
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            widths, heights, pixels = [], [], []
            for b in pdf["payload"]:
                w, h, rgb = bmp_decode(bytes(b))
                widths.append(w)
                heights.append(h)
                pixels.append(rgb)
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "pixels": pixels,
                }
            )

    return df.mapInPandas(
        run, schema="item_id bigint, width int, height int, pixels binary"
    )


def perceptual_hash(df: DataFrame) -> DataFrame:
    """(item_id, width, height, pixels binary) → (item_id, n_pixels,
    phash bigint): the average-hash (aHash) perceptual fingerprint —
    per-pixel integer gray = r+g+b, bit p set iff
    ``gray_p · n_pixels > Σ gray`` (the exact-rational mean compare:
    no division, no float, ties resolve identically everywhere), bits
    packed in row-major pixel order. Two images that differ by a few
    pixels differ in a few BITS, so near-duplicate detection becomes
    small-Hamming-distance search — the SimHash discipline applied to
    decoded image content instead of token sets.

    Pure integer arithmetic over the decoded bytes (numpy int64 inside
    the same Arrow seam as the decoder), so a serial SQL oracle that
    re-derives the pixels reproduces every bit.

    LIMIT (enforced): the single-int64 packing holds at most 63 bits,
    so images with ``n_pixels > 63`` raise ValueError here instead of
    overflowing ``pd.Series(dtype='int64')`` executor-side. For
    arbitrary sizes — including the canonical 8×8 aHash grid, which is
    exactly 64 bits — use :func:`perceptual_hash_words`, which packs
    the same bits into ``array<bigint>`` words."""
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, ns, hashes = [], [], []
            for item_id, px in zip(pdf["item_id"], pdf["pixels"]):
                a = np.frombuffer(bytes(px), dtype=np.uint8).astype(np.int64)
                gray = a.reshape(-1, 3).sum(axis=1)
                n = int(gray.shape[0])
                if n > 63:
                    raise ValueError(
                        f"perceptual_hash packs bits into one int64 and "
                        f"supports at most 63 pixels (got {n}); use "
                        "perceptual_hash_words for larger images"
                    )
                total = int(gray.sum())
                bits = (gray * n) > total
                ph = 0
                for p in range(n):  # row-major pixel order
                    if bool(bits[p]):
                        ph |= 1 << p
                ids.append(int(item_id))
                ns.append(n)
                hashes.append(ph)
            yield pd.DataFrame(
                {
                    "item_id": pd.Series(ids, dtype="int64"),
                    "n_pixels": pd.Series(ns, dtype="int32"),
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return df.mapInPandas(
        run, schema="item_id bigint, n_pixels int, phash bigint"
    )


#: bits per fingerprint word in perceptual_hash_words: 56 = 7 whole
#: 8-bit bands per word, so band b lives entirely inside word b DIV 7
#: at byte offset b % 7 — banding never straddles a word boundary and
#: every word value stays < 2^56 (int64-safe on both engines).
PHASH_WORD_BITS = 56
PHASH_BAND_BITS = 8


def phash_band_count(n_pixels: int) -> int:
    """Bands derived from the fingerprint bit width: ``ceil(n/8)``
     8-bit bands cover all n bits, so a pair within Hamming distance
    ``d`` agrees on at least ``bands - d`` whole bands (pigeonhole) —
    any ``d < bands`` makes a banded equi-join lossless."""
    return -(-n_pixels // PHASH_BAND_BITS)


def perceptual_hash_words(df: DataFrame) -> DataFrame:
    """(item_id, width, height, pixels binary) → (item_id, n_pixels,
    words array<bigint>): the aHash fingerprint of
    :func:`perceptual_hash` for ARBITRARY image sizes — same exact-
    rational mean compare (bit p set iff ``gray_p·n > Σgray``), bits
    packed little-endian into 56-bit words (word w holds bits
    [56w, 56w+56)), so an 8×8 = 64-pixel grid — the canonical aHash
    size that overflows the single-int64 variant — emits two words and
    any size emits ``ceil(n/56)``. 56 = 7×8 keeps every 8-bit band
    inside one word: band b of :func:`phash_band_count` bands is
    ``(words[b DIV 7] >> 8·(b%7)) & 255`` on both engines, and
    Hamming distance is Σ bit_count(xor) over aligned words."""
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, ns, words_col = [], [], []
            for item_id, px in zip(pdf["item_id"], pdf["pixels"]):
                a = np.frombuffer(bytes(px), dtype=np.uint8).astype(np.int64)
                gray = a.reshape(-1, 3).sum(axis=1)
                n = int(gray.shape[0])
                total = int(gray.sum())
                bits = (gray * n) > total
                n_words = -(-n // PHASH_WORD_BITS) if n else 0
                words = [0] * n_words
                for p in range(n):  # row-major pixel order
                    if bool(bits[p]):
                        words[p // PHASH_WORD_BITS] |= 1 << (
                            p % PHASH_WORD_BITS
                        )
                ids.append(int(item_id))
                ns.append(n)
                words_col.append(words)
            yield pd.DataFrame(
                {
                    "item_id": pd.Series(ids, dtype="int64"),
                    "n_pixels": pd.Series(ns, dtype="int32"),
                    "words": words_col,
                }
            )

    return df.mapInPandas(
        run, schema="item_id bigint, n_pixels int, words array<bigint>"
    )


# --- second real image codec: PNG (stdlib zlib, no codec libs) ---
#
# BMP proved the decode seam with container parsing only; PNG makes it
# exercise real COMPRESSION: IDAT zlib inflate plus per-scanline filter
# reconstruction (all five filter types — None/Sub/Up/Average/Paeth —
# the encoder cycles them row by row so a decoder that botches any one
# of them fails the pixel hash). CRCs are verified on every chunk, so
# a corrupted container raises instead of yielding garbage.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    the linear estimate a + b − c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(width: int, height: int, rgb: bytes) -> bytes:
    """Encode canonical top-down RGB pixels (len == width*height*3) as
    an 8-bit truecolor PNG: signature + IHDR + one zlib-compressed
    IDAT + IEND. Scanline y uses filter type ``y % 5``, so every
    decoder filter path (None, Sub, Up, Average, Paeth) is exercised
    by any image of height ≥ 5 — and heights < 5 still mix filters."""
    import struct
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    bpp = 3
    stride = width * bpp
    raw = bytearray()
    prior = bytes(stride)
    for y in range(height):
        row = rgb[y * stride : (y + 1) * stride]
        ftype = y % 5
        raw.append(ftype)
        for i in range(stride):
            left = row[i - bpp] if i >= bpp else 0
            up = prior[i]
            upleft = prior[i - bpp] if i >= bpp else 0
            if ftype == 0:
                v = row[i]
            elif ftype == 1:
                v = row[i] - left
            elif ftype == 2:
                v = row[i] - up
            elif ftype == 3:
                v = row[i] - (left + up) // 2
            else:
                v = row[i] - _paeth(left, up, upleft)
            raw.append(v & 0xFF)
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def png_decode(b: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit truecolor PNG to (width, height, canonical
    top-down RGB bytes): chunk walk with CRC verification, IDAT zlib
    inflate, and per-scanline filter reconstruction (all five types).
    Validates the container loudly — bad signature, corrupted CRC,
    unsupported bit depth / color type / interlace, unknown filter
    type, and truncated or wrong-sized pixel data all raise."""
    import struct
    import zlib

    if b[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_PNG_SIG)
    width = height = None
    idat = bytearray()
    iend_seen = False
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(b):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", b, pos + 8 + length)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, ctype_f, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if (depth, ctype_f, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG variant (depth={depth}, "
                    f"color={ctype_f}, interlace={interlace}); engine "
                    "decodes 8-bit truecolor non-interlaced"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            iend_seen = True
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    if not iend_seen:
        raise ValueError("truncated PNG (missing IEND trailer)")
    raw = zlib.decompress(bytes(idat))
    bpp = 3
    stride = width * bpp
    if len(raw) != height * (1 + stride):
        raise ValueError("PNG pixel data has wrong decompressed size")
    rgb = bytearray(height * stride)
    prior = bytes(stride)
    for y in range(height):
        ftype = raw[y * (1 + stride)]
        line = raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)]
        row = bytearray(stride)
        for i in range(stride):
            left = row[i - bpp] if i >= bpp else 0
            up = prior[i]
            upleft = prior[i - bpp] if i >= bpp else 0
            if ftype == 0:
                v = line[i]
            elif ftype == 1:
                v = line[i] + left
            elif ftype == 2:
                v = line[i] + up
            elif ftype == 3:
                v = line[i] + (left + up) // 2
            elif ftype == 4:
                v = line[i] + _paeth(left, up, upleft)
            else:
                raise ValueError(f"unknown PNG filter type {ftype}")
            row[i] = v & 0xFF
        rgb[y * stride : (y + 1) * stride] = row
        prior = bytes(row)
    return width, height, bytes(rgb)


def encode_synthetic_pngs(
    df: DataFrame,
    id_col: str = "item_id",
    width: int | None = None,
    height: int | None = None,
) -> DataFrame:
    """(id) → (item_id, payload binary, format 'png'): each row becomes
    a REAL PNG of the same synthetic pattern the BMP path uses —
    zlib-compressed, filter types cycling per scanline."""
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [
                png_encode(*synthetic_bmp_pattern(int(i), width, height))
                for i in ids
            ]
            yield pd.DataFrame(
                {"item_id": ids, "payload": payloads, "format": "png"}
            )

    return df.mapInPandas(run, schema="item_id bigint, payload binary, format string")


def decode_png_features(df: DataFrame) -> DataFrame:
    """(item_id, payload) → (item_id, width, height, pixels binary)
    through the REAL PNG decode — CRC walk, inflate, filter
    reconstruction — same mapInPandas seam and output shape as
    :func:`decode_bmp_features`, so every downstream consumer
    (perceptual hashing, feature extraction) is codec-agnostic."""
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            widths, heights, pixels = [], [], []
            for b in pdf["payload"]:
                w, h, rgb = png_decode(bytes(b))
                widths.append(w)
                heights.append(h)
                pixels.append(rgb)
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "pixels": pixels,
                }
            )

    return df.mapInPandas(
        run, schema="item_id bigint, width int, height int, pixels binary"
    )


def wav_encode(sample_rate: int, samples: list[int]) -> bytes:
    """16-bit mono PCM WAV bytes from int16 samples via the stdlib
    ``wave`` module — a REAL audio container (RIFF/fmt/data chunks),
    no external codec libs, the audio sibling of :func:`bmp_encode`."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def wav_decode(b: bytes) -> tuple[int, int, list[int]]:
    """(sample_rate, n_samples, samples) back out of the WAV container
    — stdlib ``wave`` parse of the RIFF chunks + little-endian int16
    payload unpack."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(b), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            # ValueError (not assert: stripped under python -O) — matches
            # bmp_decode's loud-container contract; a stereo or 8-bit
            # payload must never silently mis-unpack into garbage.
            raise ValueError(
                f"unsupported WAV variant (channels={w.getnchannels()}, "
                f"sampwidth={w.getsampwidth()}); engine decodes 16-bit mono PCM"
            )
        rate = w.getframerate()
        n = w.getnframes()
        samples = list(struct.unpack(f"<{n}h", w.readframes(n)))
    return rate, n, samples


def synthetic_wav_pattern(item_id: int) -> tuple[int, list[int]]:
    """Deterministic int16 sample pattern per item: length and rate
    derive from the id; sample i = ((id·31 + i·7) mod 2048) − 1024 —
    integer, sign-alternating, reproducible in pure SQL."""
    n = item_id % 50 + 20
    rate = 8000 + (item_id % 3) * 4000
    return rate, [((item_id * 31 + i * 7) % 2048) - 1024 for i in range(n)]


def encode_synthetic_wavs(df: DataFrame, id_col: str = "item_id") -> DataFrame:
    """(id) → (item_id, payload binary, format 'wav'): each row becomes
    a REAL WAV file of its synthetic PCM pattern, built executor-side
    in Arrow batches."""
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [wav_encode(*synthetic_wav_pattern(int(i))) for i in ids]
            yield pd.DataFrame(
                {"item_id": ids, "payload": payloads, "format": "wav"}
            )

    return df.mapInPandas(run, schema="item_id bigint, payload binary, format string")


def decode_wav_features(df: DataFrame) -> DataFrame:
    """(item_id, payload) → integer audio features through the REAL
    decode: sample rate and count from the container, Σ|sample| (the
    integer loudness proxy) and the zero-crossing count (the integer
    pitch proxy — strict sign changes) from the PCM payload. All-int64
    so a serial SQL oracle that re-derives the samples pins every
    value; the float feature pipeline (MFCCs etc.) plugs into the same
    Arrow seam."""
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, rates, ns, sums, zcs = [], [], [], [], []
            for item_id, b in zip(pdf["item_id"], pdf["payload"]):
                rate, n, samples = wav_decode(bytes(b))
                a = np.asarray(samples, dtype=np.int64)
                ids.append(int(item_id))
                rates.append(rate)
                ns.append(n)
                sums.append(int(np.abs(a).sum()))
                zcs.append(int(((a[1:] * a[:-1]) < 0).sum()))
            yield pd.DataFrame(
                {
                    "item_id": pd.Series(ids, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "sum_abs": pd.Series(sums, dtype="int64"),
                    "zero_crossings": pd.Series(zcs, dtype="int64"),
                }
            )

    return df.mapInPandas(
        run,
        schema="item_id bigint, sample_rate int, n_samples int,"
        " sum_abs bigint, zero_crossings bigint",
    )


# ---------------------------------------------------------------------------
# GIF / LZW — the third compression family behind the codec seam.
# BMP proved container parsing, PNG proved zlib/deflate + scanline
# filters; GIF-LZW is a genuinely different algorithm: a variable-width
# code table built symmetrically by encoder and decoder (GIF87a layout,
# LSB-first bit packing, CLEAR/EOI control codes, 12-bit cap).
# Stdlib-only, like every codec here.
# ---------------------------------------------------------------------------

#: GIF LZW hard cap: code widths grow 3..12 bits, table ≤ 4096 entries
_GIF_MAX_CODE_BITS = 12


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits CLEAR, then greedy longest-match codes
    while growing the string table; code width bumps when the next
    free code would overflow it; the table resets via CLEAR at 4096.
    Returns the packed LSB-first code stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    def fresh_table() -> tuple[dict, int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = fresh_table()
    emit(clear, width)
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < _GIF_MAX_CODE_BITS:
            width += 1
        if next_code > (1 << _GIF_MAX_CODE_BITS):
            emit(clear, width)
            table, next_code, width = fresh_table()
        w = bytes([k])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of :func:`_lzw_encode`: rebuilds the identical string
    table from the code stream (including the code==next 'cScSc' case)
    and validates loudly — an out-of-range code or a stream that never
    reaches EOI raises instead of yielding garbage pixels."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    pos = 0

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended before EOI")
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table) and code != eoi:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW code {code} (table {len(table)})")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < _GIF_MAX_CODE_BITS:
                width += 1
        prev = entry


def gif_encode(
    width: int, height: int, indices: bytes, palette: bytes
) -> bytes:
    """Encode palette-indexed pixels (row-major, len == width*height)
    as a real GIF87a: logical screen descriptor, global color table
    (palette = n·3 RGB bytes, n a power of two ≥ 4), image descriptor,
    LZW-compressed data in ≤255-byte sub-blocks, trailer."""
    import struct

    n_colors = len(palette) // 3
    if n_colors * 3 != len(palette) or n_colors & (n_colors - 1) or n_colors < 4:
        raise ValueError("palette must be a power-of-two color count >= 4")
    if len(indices) != width * height:
        raise ValueError("indices length must be width*height")
    if max(indices) >= n_colors:
        raise ValueError("palette index out of range")
    mcs = max(2, n_colors.bit_length() - 1)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (n_colors.bit_length() - 2), 0, 0])
    out += palette
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    out.append(mcs)
    stream = _lzw_encode(indices, mcs)
    for lo in range(0, len(stream), 255):
        block = stream[lo : lo + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def gif_decode(b: bytes) -> tuple[int, int, bytes]:
    """Decode a GIF87a/89a produced by :func:`gif_encode` (one image,
    global color table, no interlace/extensions) to (width, height,
    canonical top-down RGB). Validates the container loudly: magic,
    GCT presence, descriptor type, sub-block framing, index range."""
    import struct

    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad magic)")
    packed = b[10]
    if not packed & 0x80:
        raise ValueError("unsupported GIF: no global color table")
    n_colors = 2 << (packed & 0x07)
    pos = 13
    palette = b[pos : pos + n_colors * 3]
    if len(palette) < n_colors * 3:
        raise ValueError("truncated GIF color table")
    pos += n_colors * 3
    if pos >= len(b) or b[pos] != 0x2C:
        raise ValueError(
            f"unsupported GIF block 0x{b[pos]:02x} (extensions not supported)"
            if pos < len(b)
            else "truncated GIF (no image descriptor)"
        )
    left, top, width, height = struct.unpack_from("<HHHH", b, pos + 1)
    flags = b[pos + 9]
    if left or top or flags & 0xC0:
        raise ValueError("unsupported GIF image descriptor (LCT/interlace)")
    pos += 10
    mcs = b[pos]
    pos += 1
    stream = bytearray()
    while True:
        if pos >= len(b):
            raise ValueError("truncated GIF data sub-blocks")
        n = b[pos]
        pos += 1
        if n == 0:
            break
        stream += b[pos : pos + n]
        if len(stream) < n:
            raise ValueError("truncated GIF sub-block")
        pos += n
    indices = _lzw_decode(bytes(stream), mcs)
    if len(indices) != width * height:
        raise ValueError(
            f"GIF pixel count mismatch: {len(indices)} != {width * height}"
        )
    rgb = bytearray(width * height * 3)
    for i, idx in enumerate(indices):
        if idx >= n_colors:
            raise ValueError("GIF index out of palette range")
        rgb[i * 3 : i * 3 + 3] = palette[idx * 3 : idx * 3 + 3]
    return width, height, bytes(rgb)


#: colors in the synthetic GIF palette (fits a 4-bit LZW code)
_GIF_PATTERN_COLORS = 16


def synthetic_gif_pattern(
    item_id: int, width: int | None = None, height: int | None = None
) -> tuple[int, int, bytes, bytes]:
    """Deterministic per-id palette image: width = id%5+6, height 8
    unless overridden; index (y, x) = (id·7919 + y·31 + (x div 2)·3)
    mod 16 — the div-2 creates horizontal runs so the LZW table gets
    real multi-symbol entries; palette color c =
    ((id·37 + c·11) % 256, (id·59 + c·23) % 256, (id·83 + c·29) % 256).
    Pure integer formulas a SQL oracle re-derives exactly."""
    w = width if width is not None else item_id % 5 + 6
    h = height if height is not None else 8
    indices = bytes(
        (item_id * 7919 + y * 31 + (x // 2) * 3) % _GIF_PATTERN_COLORS
        for y in range(h)
        for x in range(w)
    )
    palette = bytes(
        v % 256
        for c in range(_GIF_PATTERN_COLORS)
        for v in (item_id * 37 + c * 11, item_id * 59 + c * 23, item_id * 83 + c * 29)
    )
    return w, h, indices, palette


def encode_synthetic_gifs(df: DataFrame, id_col: str = "item_id") -> DataFrame:
    """(id) → (item_id, payload binary, format 'gif'): real GIF87a
    files built executor-side in Arrow batches."""
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                w, h, idx, pal = synthetic_gif_pattern(int(i))
                payloads.append(gif_encode(w, h, idx, pal))
            yield pd.DataFrame(
                {"item_id": ids, "payload": payloads, "format": "gif"}
            )

    return df.mapInPandas(run, schema="item_id bigint, payload binary, format string")


def decode_gif_features(df: DataFrame) -> DataFrame:
    """(item_id, payload) → (item_id, width, height, pixels binary):
    the real GIF decode path — sub-block reassembly, variable-width
    LZW inflate, palette application — canonical RGB out, same seam as
    the BMP/PNG/WAV decoders."""
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            widths, heights, pixels = [], [], []
            for b in pdf["payload"]:
                w, h, rgb = gif_decode(bytes(b))
                widths.append(w)
                heights.append(h)
                pixels.append(rgb)
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "pixels": pixels,
                }
            )

    return df.mapInPandas(
        run, schema="item_id bigint, width int, height int, pixels binary"
    )


# ---------------------------------------------------------------------------
# Animated GIF (GIF89a, multi-frame) — the VIDEO shape behind the codec
# seam: a real container holding N LZW-compressed frames, with frame
# SAMPLING (the training-pipeline read: decode every k-th frame, skip
# the rest) as a first-class operation. Upgrades the stubbed
# sample_frames plumbing to a genuine end-to-end decode.
# ---------------------------------------------------------------------------


def gif_encode_animation(
    width: int,
    height: int,
    frames: list[bytes],
    palette: bytes,
    delay_cs: int = 10,
) -> bytes:
    """Encode full-frame palette-indexed frames as a real animated
    GIF89a: one global color table, per frame a Graphic Control
    Extension (delay in centiseconds) followed by an image descriptor
    and its own LZW stream."""
    import struct

    n_colors = len(palette) // 3
    if n_colors * 3 != len(palette) or n_colors & (n_colors - 1) or n_colors < 4:
        raise ValueError("palette must be a power-of-two color count >= 4")
    if not frames:
        raise ValueError("animation needs at least one frame")
    mcs = max(2, n_colors.bit_length() - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (n_colors.bit_length() - 2), 0, 0])
    out += palette
    for indices in frames:
        if len(indices) != width * height:
            raise ValueError("frame length must be width*height")
        if max(indices) >= n_colors:
            raise ValueError("palette index out of range")
        # Graphic Control Extension: no disposal, no transparency
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        out.append(mcs)
        stream = _lzw_encode(indices, mcs)
        for lo in range(0, len(stream), 255):
            block = stream[lo : lo + 255]
            out.append(len(block))
            out += block
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def gif_decode_frames(b: bytes) -> tuple[int, int, list[bytes]]:
    """Decode an animated GIF to (width, height, [RGB frame, ...]).
    Accepts GIF87a/89a with a global color table and full-frame images
    (no local color tables, no interlace); extensions (GCE, comment,
    application) are walked and skipped per the sub-block framing.
    Validates loudly like the single-image decoder."""
    import struct

    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad magic)")
    packed = b[10]
    if not packed & 0x80:
        raise ValueError("unsupported GIF: no global color table")
    n_colors = 2 << (packed & 0x07)
    width, height = struct.unpack_from("<HH", b, 6)
    pos = 13
    palette = b[pos : pos + n_colors * 3]
    if len(palette) < n_colors * 3:
        raise ValueError("truncated GIF color table")
    pos += n_colors * 3
    frames: list[bytes] = []

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(b):
                raise ValueError("truncated GIF sub-blocks")
            n = b[p]
            p += 1
            if n == 0:
                return p
            p += n

    while True:
        if pos >= len(b):
            raise ValueError("truncated GIF (no trailer)")
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte then sub-blocks
            pos = skip_subblocks(pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"unsupported GIF block 0x{block:02x}")
        left, top, fw, fh = struct.unpack_from("<HHHH", b, pos)
        flags = b[pos + 8]
        if left or top or (fw, fh) != (width, height) or flags & 0xC0:
            raise ValueError("unsupported GIF frame (partial/LCT/interlace)")
        pos += 9
        mcs = b[pos]
        pos += 1
        stream = bytearray()
        while True:
            if pos >= len(b):
                raise ValueError("truncated GIF data sub-blocks")
            n = b[pos]
            pos += 1
            if n == 0:
                break
            stream += b[pos : pos + n]
            pos += n
        indices = _lzw_decode(bytes(stream), mcs)
        if len(indices) != width * height:
            raise ValueError("GIF frame pixel count mismatch")
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(indices):
            if idx >= n_colors:
                raise ValueError("GIF index out of palette range")
            rgb[i * 3 : i * 3 + 3] = palette[idx * 3 : idx * 3 + 3]
        frames.append(bytes(rgb))
    if not frames:
        raise ValueError("GIF contains no image frames")
    return width, height, frames


def synthetic_gif_animation(
    item_id: int,
) -> tuple[int, int, list[bytes], bytes]:
    """Deterministic per-id animation: width = id%4+5, height 6,
    n_frames = id%3+4; frame f's index (y, x) =
    (id·7919 + f·101 + y·31 + (x div 2)·3) mod 16 over the same
    palette formula as the still pattern — pure integers a SQL oracle
    re-derives per sampled frame."""
    w = item_id % 4 + 5
    h = 6
    n_frames = item_id % 3 + 4
    frames = [
        bytes(
            (item_id * 7919 + f * 101 + y * 31 + (x // 2) * 3)
            % _GIF_PATTERN_COLORS
            for y in range(h)
            for x in range(w)
        )
        for f in range(n_frames)
    ]
    palette = bytes(
        v % 256
        for c in range(_GIF_PATTERN_COLORS)
        for v in (item_id * 37 + c * 11, item_id * 59 + c * 23, item_id * 83 + c * 29)
    )
    return w, h, frames, palette


def encode_synthetic_gif_animations(
    df: DataFrame, id_col: str = "item_id"
) -> DataFrame:
    """(id) → (item_id, payload binary, format 'gif', n_frames):
    real animated GIF89a files built executor-side."""
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads, nf = [], []
            for i in ids:
                w, h, frames, pal = synthetic_gif_animation(int(i))
                payloads.append(gif_encode_animation(w, h, frames, pal))
                nf.append(len(frames))
            yield pd.DataFrame(
                {
                    "item_id": ids,
                    "payload": payloads,
                    "format": "gif",
                    "n_frames": pd.Series(nf, dtype="int32"),
                }
            )

    return df.mapInPandas(
        run,
        schema="item_id bigint, payload binary, format string, n_frames int",
    )


def sample_gif_frames(df: DataFrame, stride: int = 2) -> DataFrame:
    """(item_id, payload) → one row per SAMPLED frame (every
    ``stride``-th, starting at 0): (item_id, frame_idx, width, height,
    pixels binary) — the video-pipeline read: a training job decodes a
    bounded subset of frames, never the whole stream. Arrow-batched
    like every codec stage; output volume is n_frames/stride per clip
    regardless of container size."""
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, fidx, ws, hs, px = [], [], [], [], []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                w, h, frames = gif_decode_frames(bytes(payload))
                for f in range(0, len(frames), stride):
                    ids.append(int(item_id))
                    fidx.append(f)
                    ws.append(w)
                    hs.append(h)
                    px.append(frames[f])
            yield pd.DataFrame(
                {
                    "item_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "pixels": px,
                }
            )

    return df.mapInPandas(
        run,
        schema=(
            "item_id bigint, frame_idx int, width int, height int,"
            " pixels binary"
        ),
    )


def gif_motion_profile(df: DataFrame) -> DataFrame:
    """(item_id, payload) → one row per CONSECUTIVE frame pair:
    (item_id, frame_from, frame_to, sad, n_bytes) where ``sad`` is the
    exact integer sum of absolute RGB differences — the shot-boundary /
    motion-estimation read of a video pipeline (a cut is a SAD spike;
    static footage is a SAD floor). Decodes through the same
    variable-width-LZW animated-GIF path as the frame sampler, diffs
    vectorized in the Arrow batch; output is n_frames−1 rows per clip
    regardless of resolution."""
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, ffrom, fto, sads, nb = [], [], [], [], []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                w, h, frames = gif_decode_frames(bytes(payload))
                arrs = [
                    np.frombuffer(f, dtype=np.uint8).astype(np.int64)
                    for f in frames
                ]
                for f in range(len(frames) - 1):
                    ids.append(int(item_id))
                    ffrom.append(f)
                    fto.append(f + 1)
                    sads.append(int(np.abs(arrs[f] - arrs[f + 1]).sum()))
                    nb.append(w * h * 3)
            yield pd.DataFrame(
                {
                    "item_id": pd.Series(ids, dtype="int64"),
                    "frame_from": pd.Series(ffrom, dtype="int32"),
                    "frame_to": pd.Series(fto, dtype="int32"),
                    "sad": pd.Series(sads, dtype="int64"),
                    "n_bytes": pd.Series(nb, dtype="int32"),
                }
            )

    return df.mapInPandas(
        run,
        schema=(
            "item_id long, frame_from int, frame_to int,"
            " sad long, n_bytes int"
        ),
    )


#: autocorrelation lags reported by the pitch/periodicity profile
WAV_AUTOCORR_LAGS = (1, 2, 4)


def wav_autocorrelation(
    df: DataFrame, lags: tuple[int, ...] = WAV_AUTOCORR_LAGS
) -> DataFrame:
    """(item_id, payload) → per-clip integer autocorrelation profile:
    R(0) = Σ s², R(ℓ) = Σ_{i≥ℓ} s(i)·s(i−ℓ) for each lag, plus the
    normalized r(ℓ) in integer ppm (R(ℓ)·1e6 DIV R(0)) — the classic
    pitch / periodicity estimator (a pure tone peaks at its period's
    lag; noise decays immediately), and the spectral-shaped audio
    feature that stays EXACT integer arithmetic where a DFT's
    transcendental twiddle factors could never cross-engine match.
    int16 samples → products ≤ 2^30, sums safe in int64 to ~10^9
    samples per clip. Decodes through the same stdlib-wave container
    path as the loudness/ZCR features; Arrow-batched, payload never
    shuffles."""
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, ls, r0s, rls, ppm = [], [], [], [], []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                _rate, _n, samples = wav_decode(bytes(payload))
                s = np.asarray(samples, dtype=np.int64)
                r0 = int((s * s).sum())
                for lag in lags:
                    rl = int((s[lag:] * s[:-lag]).sum()) if len(s) > lag else 0
                    ids.append(int(item_id))
                    ls.append(lag)
                    r0s.append(r0)
                    rls.append(rl)
                    # int(a // b) in Python floors; Spark/DuckDB DIV
                    # truncates toward zero — match by trunc division
                    q = abs(rl) * 1_000_000 // r0 if r0 else 0
                    ppm.append(q if rl >= 0 else -q)
            yield pd.DataFrame(
                {
                    "item_id": pd.Series(ids, dtype="int64"),
                    "lag": pd.Series(ls, dtype="int32"),
                    "r0": pd.Series(r0s, dtype="int64"),
                    "r_lag": pd.Series(rls, dtype="int64"),
                    "r_ppm": pd.Series(ppm, dtype="int64"),
                }
            )

    return df.mapInPandas(
        run, schema="item_id long, lag int, r0 long, r_lag long, r_ppm long"
    )
