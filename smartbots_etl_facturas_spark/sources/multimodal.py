"""Multimodal columns: images/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature plumbing (BASELINE.json
north star).

Decoder tiers (image path):

- ``decoder="png"`` — REAL decode with the stdlib PNG codec below
  (zlib is always available): actual pixels in, resized pixels out.
- ``decoder="pil"`` — Pillow, any format; raises NotImplementedError
  when Pillow is absent (optional-dependency guard, not a stub).
- ``decoder="fake"`` — deterministic digest-derived metadata, for
  exercising the Spark plumbing (schema, partition sizing,
  mapInPandas batch shape) with arbitrary bytes.

Audio path: REAL WAV/PCM decode via the stdlib ``wave`` module
(``extract_audio_features(decoder="wav")`` — actual samples in,
spectral-free time-domain features out); ``decoder="int8"`` keeps the
byte-interpretation stub for arbitrary payloads. Video decode remains
stubbed (no codec is expressible with the stdlib); its Spark-side
plumbing is real and tested.

Scale notes: binary payloads ride the same DataFrame as their
metadata; keep ``spark.sql.files.maxPartitionBytes`` sized so a
partition of payloads fits executor memory, and push metadata-only
filters BEFORE any decode stage so Parquet column pruning keeps the
binary column unread for filtered-out rows.
"""

from __future__ import annotations

import hashlib
import os
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --- stdlib PNG codec -------------------------------------------------------
# The container ships no image libraries, but PNG needs only zlib: a
# minimal ISO/IEC 15948 codec (8-bit gray/RGB/RGBA, non-interlaced,
# all 5 scanline filters on decode, filter-0 on encode) makes the
# image path REAL — actual pixels decoded, resized and re-encoded —
# with Pillow as the optional full-format tier.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}       # colortype -> samples/pixel
_PNG_COLORTYPE = {1: 0, 3: 2, 4: 6}


def _unfilter_image(raw: bytes, h: int, stride: int, ch: int):
    """Vectorized scanline unfiltering: numpy row ops for filters
    0 (None), 1 (Sub: per-lane modular prefix sum), 2 (Up: wrapped
    add); filters 3/4 (Average/Paeth) carry a true sequential
    dependency along x, so they run a per-PIXEL loop with the
    channel lanes vectorized (w iterations, not w*ch). An image whose
    rows are all filter 0 — e.g. anything :func:`png_encode` wrote —
    short-circuits to a single reshape. Returns (h, stride) uint8.

    Differential-tested against :func:`_unfilter_row` (the scalar
    reference) over random rows of every filter type."""
    import numpy as np

    a = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = a[:, 0]
    data = a[:, 1:]
    if not filters.any():
        return data.copy()
    w = stride // ch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        row = data[y]
        if f == 0:
            rec = row.copy()
        elif f == 1:                             # Sub
            rec = np.cumsum(row.reshape(w, ch), axis=0,
                            dtype=np.uint8).reshape(stride)
        elif f == 2:                             # Up
            rec = row + prev                     # uint8 wraps mod 256
        elif f == 3:                             # Average
            rowpx = row.reshape(w, ch).astype(np.int16)
            prevpx = prev.reshape(w, ch).astype(np.int16)
            rec2 = np.empty((w, ch), dtype=np.int16)
            left = np.zeros(ch, dtype=np.int16)
            for x in range(w):
                left = (rowpx[x] + ((left + prevpx[x]) >> 1)) & 0xFF
                rec2[x] = left
            rec = rec2.astype(np.uint8).reshape(stride)
        elif f == 4:                             # Paeth
            rowpx = row.reshape(w, ch).astype(np.int16)
            prevpx = prev.reshape(w, ch).astype(np.int16)
            rec2 = np.empty((w, ch), dtype=np.int16)
            left = np.zeros(ch, dtype=np.int16)
            upleft = np.zeros(ch, dtype=np.int16)
            for x in range(w):
                up = prevpx[x]
                p = left + up - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, up, upleft))
                left = (rowpx[x] + pred) & 0xFF
                rec2[x] = left
                upleft = up
            rec = rec2.astype(np.uint8).reshape(stride)
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        out[y] = rec
        prev = rec
    return out


def _unfilter_row(f: int, row: bytearray, prev: bytes, ch: int) -> bytearray:
    if f == 0:
        return row
    n = len(row)
    if f == 1:                                   # Sub
        for i in range(ch, n):
            row[i] = (row[i] + row[i - ch]) & 0xFF
    elif f == 2:                                 # Up
        for i in range(n):
            row[i] = (row[i] + prev[i]) & 0xFF
    elif f == 3:                                 # Average
        for i in range(n):
            a = row[i - ch] if i >= ch else 0
            row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
    elif f == 4:                                 # Paeth
        for i in range(n):
            a = row[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            row[i] = (row[i] + pred) & 0xFF
    else:
        raise ValueError(f"invalid PNG filter type {f}")
    return row


def png_decode(data: bytes):
    """PNG bytes → numpy uint8 array (h, w, channels). Supports 8-bit
    gray / RGB / RGBA, non-interlaced (the overwhelmingly common
    shapes); anything else raises ValueError."""
    import numpy as np

    if bytes(data[:8]) != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, bytearray()
    w = h = colortype = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = bytes(data[pos + 4:pos + 8])
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, depth, colortype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or interlace != 0 or colortype not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth} colortype={colortype} "
                    f"interlace={interlace}); use decoder='pil'"
                )
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = _PNG_CHANNELS[colortype]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    return _unfilter_image(raw, h, stride, ch).reshape(h, w, ch)


def png_encode(arr) -> bytes:
    """numpy uint8 array (h, w[, channels]) → PNG bytes (filter 0)."""
    import numpy as np

    arr = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in _PNG_COLORTYPE:
        raise ValueError(f"unsupported channel count {ch}")

    def chunk(t: bytes, d: bytes) -> bytes:
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, _PNG_COLORTYPE[ch], 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def resize_nearest(arr, width: int, height: int):
    """Nearest-neighbor resample via numpy index gather (no loops)."""
    import numpy as np

    h, w = arr.shape[:2]
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return arr[yi][:, xi]

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("content", T.BinaryType(), True),        # opaque payload
    T.StructField("mime", T.StringType(), True),
    T.StructField("source_uri", T.StringType(), True),
])

IMAGE_FEATURES_SCHEMA = T.StructType(
    MEDIA_SCHEMA.fields
    + [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("content_digest", T.StringType(), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: dimensions derived
    from the content digest. Replaces the decode STEP, not the
    pipeline around it."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channels = 1 if digest[2] % 4 == 0 else 3
    return width, height, channels


def extract_image_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    One Python worker call per Arrow batch — payload bytes cross the
    JVM↔Python boundary once, vectorized, never row-at-a-time.

    ``decoder``: ``"fake"`` derives dimensions from the digest (pure
    plumbing test); ``"png"`` REALLY decodes PNG payloads with the
    stdlib codec above; ``"pil"`` uses Pillow (any format) and raises
    NotImplementedError when Pillow is absent.
    """
    if decoder not in ("fake", "png", "pil"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "pil":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "decoder='pil' requires Pillow, which this environment lacks; "
                "use decoder='png' (stdlib codec) or 'fake'"
            ) from exc
    pkg_root = _PKG_ROOT

    def _batches(batches: Iterator) -> Iterator:
        import sys

        import pandas as pd

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        from smartbots_etl_facturas_spark.sources.multimodal import (
            _fake_decode,
            png_decode,
        )

        def dims(b):
            if b is None:
                return (None, None, None)
            if decoder == "fake":
                return _fake_decode(bytes(b))
            if decoder == "png":
                arr = png_decode(bytes(b))
                return (arr.shape[1], arr.shape[0], arr.shape[2])
            import io

            import PIL.Image

            with PIL.Image.open(io.BytesIO(bytes(b))) as im:
                return (im.width, im.height, len(im.getbands()))

        for pdf in batches:
            feats = pdf["content"].map(dims)
            pdf = pdf.assign(
                width=feats.map(lambda t: t[0]).astype("Int32"),
                height=feats.map(lambda t: t[1]).astype("Int32"),
                channels=feats.map(lambda t: t[2]).astype("Int32"),
                content_digest=pdf["content"].map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16] if b is not None else None
                ),
            )
            yield pdf

    return df.mapInPandas(_batches, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    index (decode stubbed — frame count faked from payload size).
    Demonstrates the explode-shaped fanout a real sampler would use."""
    n_frames = (F.length("content") % 300 + 1).cast("int")
    return (
        df.filter(F.col("media_type") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))))
        .select("media_id", "frame_idx", "mime", "source_uri")
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = digest-of-id
    bytes repeated; no external fixtures needed)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * (4 + i % 7)
        mtype = ("image", "audio", "video")[i % 3]
        rows.append((i, mtype, bytearray(payload), f"application/x-{mtype}", f"mem://{i}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    MEDIA_SCHEMA.fields
    + [
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("resized", T.BinaryType(), True),
    ]
)


def resize_images(df: DataFrame, width: int = 224, height: int = 224,
                  decoder: str = "fake") -> DataFrame:
    """Resize stage via mapInPandas.

    ``decoder="png"`` is a REAL resize: stdlib PNG decode →
    nearest-neighbor numpy resample → PNG re-encode. ``"pil"`` uses
    Pillow's resampler (any input format, PNG out) when importable.
    ``"fake"`` folds the payload to a deterministic size-proportional
    digest chain — pipeline-shape testing without decodable inputs.
    The Spark plumbing (schema, Arrow batches, binary pass-through)
    is identical for all three."""
    if decoder not in ("fake", "png", "pil"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "pil":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError("decoder='pil' requires Pillow") from exc

    target = width * height // 64  # fake: fold payload to a size-proportional digest chain
    pkg_root = _PKG_ROOT

    def _batches(batches: Iterator) -> Iterator:
        import sys

        import pandas as pd

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        from smartbots_etl_facturas_spark.sources.multimodal import (
            png_decode,
            png_encode,
            resize_nearest,
        )

        def fake_resize(b):
            out = hashlib.sha256(bytes(b)).digest()
            while len(out) < target:
                out += hashlib.sha256(out).digest()
            return out[:target]

        def do_resize(b):
            if b is None:
                return None
            if decoder == "fake":
                return fake_resize(b)
            if decoder == "png":
                return png_encode(resize_nearest(png_decode(bytes(b)), width, height))
            import io

            import PIL.Image

            with PIL.Image.open(io.BytesIO(bytes(b))) as im:
                buf = io.BytesIO()
                im.resize((width, height)).save(buf, format="PNG")
                return buf.getvalue()

        for pdf in batches:
            yield pdf.assign(
                out_width=pd.Series([width] * len(pdf), dtype="Int32"),
                out_height=pd.Series([height] * len(pdf), dtype="Int32"),
                resized=pdf["content"].map(do_resize),
            )

    return df.mapInPandas(_batches, RESIZED_SCHEMA)


# --- stdlib WAV codec -------------------------------------------------------
# Like the PNG path above: the container ships no audio libraries,
# but RIFF/WAVE PCM needs only the stdlib ``wave`` module, so the
# audio decode tier is REAL — actual int16 samples decoded and
# featurized — with the int8 byte-interpretation stub kept for
# arbitrary (non-WAV) payloads.


def wav_encode(samples, sample_rate: int = 16000, n_channels: int = 1) -> bytes:
    """Encode an int16 numpy array (interleaved if multi-channel) as
    a RIFF/WAVE PCM16 payload. Deterministic byte output."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    try:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    finally:
        w.close()
    return buf.getvalue()


def wav_decode(data: bytes):
    """Decode a RIFF/WAVE PCM16 payload to (samples int16 ndarray
    with shape (n_frames, n_channels), sample_rate)."""
    import io
    import wave

    import numpy as np

    r = wave.open(io.BytesIO(bytes(data)), "rb")
    try:
        if r.getsampwidth() != 2:
            raise ValueError("wav_decode supports PCM16 only")
        raw = r.readframes(r.getnframes())
        arr = np.frombuffer(raw, dtype="<i2").reshape(-1, r.getnchannels())
        return arr, r.getframerate()
    finally:
        r.close()


def rawv_encode(frames) -> bytes:
    """Encode a stack of grayscale uint8 frames (n, h, w) as a RAWV
    payload: ``b"RAWV" + <I h + <I w + <I n_frames`` header followed
    by the frame bytes in order. The minimal deterministic video
    container the stdlib can round-trip — real codecs are out of this
    environment (the frame_sample stub's rationale); the SPARK-side
    plumbing over it (binary column → Arrow-batched per-frame decode →
    keyed joins) is the real, tested part."""
    import struct

    import numpy as np

    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim != 3:
        raise ValueError("rawv_encode expects (n_frames, h, w) uint8")
    n, h, w = a.shape
    return b"RAWV" + struct.pack("<III", h, w, n) + a.tobytes()


def rawv_decode(data: bytes):
    """Decode a RAWV payload to a uint8 ndarray of shape (n, h, w)."""
    import struct

    import numpy as np

    data = bytes(data)
    if data[:4] != b"RAWV":
        raise ValueError("not a RAWV payload")
    h, w, n = struct.unpack("<III", data[4:16])
    body = data[16:16 + n * h * w]
    if len(body) != n * h * w:
        raise ValueError("truncated RAWV payload")
    return np.frombuffer(body, dtype=np.uint8).reshape(n, h, w).copy()


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("sample_rate", T.LongType(), True),
    T.StructField("n_channels", T.LongType(), True),
    T.StructField("n_samples", T.LongType(), True),
    T.StructField("duration_s", T.DoubleType(), True),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("peak", T.LongType(), True),
    T.StructField("zero_crossings", T.LongType(), True),
])


def extract_audio_features(
    df: DataFrame, sample_rate: int = 16000, decoder: str = "int8"
) -> DataFrame:
    """Audio feature extraction via mapInPandas.

    ``decoder="wav"`` is a REAL decode: stdlib RIFF/WAVE PCM16 parse →
    time-domain features over the actual samples (channel 0 for the
    sample-wise features). ``decoder="int8"`` interprets arbitrary
    payload bytes as int8 samples at the given ``sample_rate`` — the
    plumbing-shape tier for non-WAV bytes. Features are
    engine-portable exact values: counts/peaks are integers; duration
    and RMS are exact-integer sums passed once through IEEE division/
    sqrt (both correctly rounded), so an oracle can pin them.
    """
    if decoder not in ("int8", "wav"):
        raise ValueError(f"unknown decoder {decoder!r}")
    pkg_root = _PKG_ROOT

    def _batches(batches: Iterator) -> Iterator:
        import sys

        import numpy as np
        import pandas as pd

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        from smartbots_etl_facturas_spark.sources.multimodal import wav_decode

        def feats(b):
            if b is None:
                return (None,) * 7
            if decoder == "wav":
                arr, sr = wav_decode(b)
                ch0 = arr[:, 0].astype(np.int64)
                n_ch = arr.shape[1]
            else:
                ch0 = np.frombuffer(bytes(b), dtype=np.int8).astype(np.int64)
                sr, n_ch = sample_rate, 1
            n = len(ch0)
            if n == 0:
                return (sr, n_ch, 0, 0.0, 0.0, 0, 0)
            # exact int64 sum of squares -> one division + one sqrt,
            # both IEEE correctly-rounded (engine-portable)
            sq = int((ch0 * ch0).sum())
            rms = float(np.sqrt(sq / n))
            zc = int(((ch0[:-1] >= 0) != (ch0[1:] >= 0)).sum())
            return (sr, n_ch, n, n / sr, rms, int(np.abs(ch0).max()), zc)

        for pdf in batches:
            out = [feats(b) for b in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "sample_rate": pd.Series([o[0] for o in out], dtype="Int64"),
                "n_channels": pd.Series([o[1] for o in out], dtype="Int64"),
                "n_samples": pd.Series([o[2] for o in out], dtype="Int64"),
                "duration_s": [o[3] for o in out],
                "rms": [o[4] for o in out],
                "peak": pd.Series([o[5] for o in out], dtype="Int64"),
                "zero_crossings": pd.Series([o[6] for o in out], dtype="Int64"),
            })

    return df.filter(F.col("media_type") == "audio").mapInPandas(_batches, AUDIO_FEATURES_SCHEMA)
