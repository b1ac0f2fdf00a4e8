"""Multimodal plumbing: binary columns, Arrow-batched feature
extraction (stubbed decode), frame-sampling fanout."""

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.sources.multimodal import (
    extract_image_features,
    frame_sample_plan,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=48).cache()


def test_feature_extraction_shapes(spark, media):
    out = extract_image_features(media)
    rows = out.collect()
    assert len(rows) == 48
    for r in rows:
        assert 64 <= r.width < 256
        assert 64 <= r.height < 256
        assert r.channels in (1, 3)
        assert len(r.content_digest) == 16


def test_feature_extraction_deterministic(spark, media):
    a = {r.media_id: (r.width, r.height, r.channels, r.content_digest)
         for r in extract_image_features(media).collect()}
    b = {r.media_id: (r.width, r.height, r.channels, r.content_digest)
         for r in extract_image_features(media).collect()}
    assert a == b


def test_pil_decoder_gated(spark, media):
    """Real decoder is stubbed in this container: either Pillow imports
    (and the call proceeds) or a clear NotImplementedError names it."""
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError, match="Pillow"):
            extract_image_features(media, decoder="pil")


def test_frame_sampling_fanout(spark, media):
    frames = frame_sample_plan(media, every_n=30)
    rows = frames.collect()
    assert len(rows) > 0
    vids = media.filter(F.col("media_type") == "video").count()
    assert len({r.media_id for r in rows}) == vids
    assert all(r.frame_idx % 30 == 0 for r in rows)


def test_metadata_filter_prunes_before_decode(spark, media):
    """Metadata-only filter then decode — the plan should read/decode
    only matching rows (count proves the filter happened upstream)."""
    out = extract_image_features(media.filter(F.col("media_type") == "image"))
    assert out.count() == media.filter(F.col("media_type") == "image").count()


def test_resize_images_batch_shape(spark):
    from smartbots_etl_facturas_spark.sources.multimodal import resize_images, synthetic_media

    out = resize_images(synthetic_media(spark, 12), width=64, height=64).collect()
    assert len(out) == 12
    for r in out:
        assert r.out_width == 64 and r.out_height == 64
        assert len(r.resized) == 64 * 64 // 64
    # deterministic: same payload → same resized bytes
    again = resize_images(synthetic_media(spark, 12), width=64, height=64).collect()
    assert [bytes(r.resized) for r in out] == [bytes(r.resized) for r in again]


def test_extract_audio_features(spark):
    from smartbots_etl_facturas_spark.sources.multimodal import (
        extract_audio_features,
        synthetic_media,
    )

    media = synthetic_media(spark, 12)
    out = {r.media_id: r for r in extract_audio_features(media).collect()}
    n_audio = media.filter("media_type = 'audio'").count()
    assert len(out) == n_audio > 0
    for r in out.values():
        assert r.n_samples > 0 and r.duration_s == r.n_samples / 16000
        assert r.rms > 0


# --- real PNG path ----------------------------------------------------------

def _gradient(h, w, ch):
    import numpy as np

    y = np.arange(h, dtype=np.uint32)[:, None, None]
    x = np.arange(w, dtype=np.uint32)[None, :, None]
    c = np.arange(ch, dtype=np.uint32)[None, None, :]
    return ((y * 7 + x * 13 + c * 101) % 256).astype(np.uint8)


def test_png_codec_roundtrip():
    import numpy as np

    from smartbots_etl_facturas_spark.sources.multimodal import png_decode, png_encode

    for h, w, ch in [(5, 7, 3), (4, 4, 1), (3, 9, 4)]:
        arr = _gradient(h, w, ch)
        back = png_decode(png_encode(arr))
        assert back.shape == (h, w, ch)
        assert np.array_equal(back, arr)


def test_png_decode_all_filter_types():
    """Hand-filter scanlines with each of the 5 PNG filter types and
    assert the decoder unfilters them back to the source pixels."""
    import struct
    import zlib

    import numpy as np

    from smartbots_etl_facturas_spark.sources.multimodal import png_decode

    h, w, ch = 6, 5, 3
    arr = _gradient(h, w, ch)
    stride = w * ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = arr[y].tobytes()
        f = y % 5
        filt = bytearray(row)
        if f == 1:
            for i in range(stride - 1, ch - 1, -1):
                filt[i] = (row[i] - row[i - ch]) & 0xFF
        elif f == 2:
            for i in range(stride):
                filt[i] = (row[i] - prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                filt[i] = (row[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                filt[i] = (row[i] - paeth(a, prev[i], c)) & 0xFF
        raw += bytes([f]) + bytes(filt)
        prev = row

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF)

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    assert np.array_equal(png_decode(png), arr)


def test_png_media_pipeline_real_decode(spark):
    """Real PNG bytes through the mapInPandas pipeline: dimensions come
    from the actual IHDR/pixels, and the resize stage emits a valid
    PNG of the target size with resampled pixels."""
    import numpy as np

    from smartbots_etl_facturas_spark.sources.multimodal import (
        extract_image_features,
        png_decode,
        png_encode,
        resize_images,
    )

    rows = [
        (i, "image", bytearray(png_encode(_gradient(16 + i, 10 + 2 * i, 3))),
         "image/png", f"mem://{i}")
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "media_id long, media_type string, "
                               "content binary, mime string, source_uri string")

    feats = {r.media_id: (r.width, r.height, r.channels)
             for r in extract_image_features(df, decoder="png").collect()}
    assert feats == {i: (10 + 2 * i, 16 + i, 3) for i in range(4)}

    resized = resize_images(df, width=8, height=6, decoder="png").collect()
    assert len(resized) == 4
    for r in resized:
        arr = png_decode(bytes(r.resized))
        assert arr.shape == (6, 8, 3)
    # resample correctness on one known image: nearest-neighbor gather
    src = _gradient(16, 10, 3)
    got = png_decode(bytes(next(r.resized for r in resized if r.media_id == 0)))
    yi = (np.arange(6) * 16) // 6
    xi = (np.arange(8) * 10) // 8
    assert np.array_equal(got, src[yi][:, xi])


def test_png_decode_rejects_garbage(spark):
    import pytest as _pytest

    from smartbots_etl_facturas_spark.sources.multimodal import png_decode

    with _pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"definitely not a png")


def test_pil_decoder_real_or_guarded(spark):
    """When Pillow is importable the 'pil' tier must really decode;
    otherwise it must raise the documented NotImplementedError."""
    from smartbots_etl_facturas_spark.sources.multimodal import (
        extract_image_features,
        png_encode,
    )

    rows = [(0, "image", bytearray(png_encode(_gradient(12, 9, 3))),
             "image/png", "mem://0")]
    df = spark.createDataFrame(rows, "media_id long, media_type string, "
                               "content binary, mime string, source_uri string")
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        import pytest as _pytest

        with _pytest.raises(NotImplementedError, match="Pillow"):
            extract_image_features(df, decoder="pil")
        return
    out = extract_image_features(df, decoder="pil").collect()[0]
    assert (out.width, out.height, out.channels) == (9, 12, 3)


def test_unfilter_vectorized_matches_scalar_reference():
    """Differential: the vectorized _unfilter_image must reproduce the
    scalar _unfilter_row reference byte-for-byte on random scanlines
    of every filter type and channel count."""
    import numpy as np

    from smartbots_etl_facturas_spark.sources.multimodal import (
        _unfilter_image,
        _unfilter_row,
    )

    rng = np.random.default_rng(42)
    for ch in (1, 3, 4):
        w, h = 23, 15
        stride = w * ch
        filters = rng.integers(0, 5, size=h)
        data = rng.integers(0, 256, size=(h, stride), dtype=np.uint8)
        raw = b"".join(
            bytes([filters[y]]) + data[y].tobytes() for y in range(h)
        )
        got = _unfilter_image(raw, h, stride, ch)
        prev = bytes(stride)
        for y in range(h):
            prev = bytes(
                _unfilter_row(int(filters[y]), bytearray(data[y].tobytes()), prev, ch)
            )
            assert got[y].tobytes() == prev, (ch, y, int(filters[y]))


def test_png_decode_throughput_floor():
    """Decode a few-hundred-image batch in bounded time — the old
    per-byte Python loop was ~50x slower on the filtered path; this
    pins the vectorized fast path (all-filter-0, one reshape) and the
    per-row vector path so a regression back to byte loops fails."""
    import time

    from smartbots_etl_facturas_spark.sources.multimodal import (
        png_decode,
        png_encode,
    )

    imgs = [png_encode(_gradient(64, 64, 3)) for _ in range(200)]
    t0 = time.monotonic()
    for b in imgs:
        assert png_decode(b).shape == (64, 64, 3)
    elapsed = time.monotonic() - t0
    assert elapsed < 10, f"200x 64x64 RGB decodes took {elapsed:.1f}s"


# --- real WAV path ----------------------------------------------------------

def test_wav_roundtrip():
    import numpy as np

    from smartbots_etl_facturas_spark.sources.multimodal import (
        wav_decode,
        wav_encode,
    )

    rng = np.random.default_rng(7)
    mono = rng.integers(-30000, 30000, size=500, dtype=np.int16)
    arr, sr = wav_decode(wav_encode(mono, 22050))
    assert sr == 22050 and arr.shape == (500, 1)
    assert (arr[:, 0] == mono).all()

    stereo = rng.integers(-30000, 30000, size=(300, 2), dtype=np.int16)
    arr2, sr2 = wav_decode(wav_encode(stereo.reshape(-1), 8000, n_channels=2))
    assert sr2 == 8000 and arr2.shape == (300, 2)
    assert (arr2 == stereo).all()


def test_wav_decode_rejects_non_pcm16():
    import io
    import wave

    import numpy as np
    import pytest as _pytest

    from smartbots_etl_facturas_spark.sources.multimodal import wav_decode

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(1)  # PCM8
    w.setframerate(8000)
    w.writeframes(np.zeros(10, dtype=np.uint8).tobytes())
    w.close()
    with _pytest.raises(ValueError):
        wav_decode(buf.getvalue())


def test_extract_audio_features_wav_tier(spark):
    import numpy as np

    from smartbots_etl_facturas_spark.sources.multimodal import (
        extract_audio_features,
        wav_encode,
    )

    # 100 Hz square wave at 8 kHz: 40-sample half-period, amp 5000,
    # 12 half-periods -> rms == amp, zc == 11, peak == amp
    n, half, amp = 480, 40, 5000
    ch0 = np.where((np.arange(n) // half) % 2 == 0, amp, -amp).astype("<i2")
    media = spark.createDataFrame(
        [(1, "audio", bytearray(wav_encode(ch0, 8000)), "audio/wav", "mem://1"),
         (2, "video", bytearray(b"xx"), "video/mp4", "mem://2")],
        "media_id long, media_type string, content binary, mime string, source_uri string",
    )
    rows = extract_audio_features(media, decoder="wav").collect()
    assert len(rows) == 1  # video row filtered out
    r = rows[0]
    assert (r.sample_rate, r.n_channels, r.n_samples) == (8000, 1, 480)
    assert r.duration_s == 480 / 8000
    assert r.rms == float(amp) and r.peak == amp and r.zero_crossings == 11


def test_extract_audio_features_bad_decoder(spark):
    import pytest as _pytest

    from smartbots_etl_facturas_spark.sources.multimodal import (
        extract_audio_features,
        synthetic_media,
    )

    with _pytest.raises(ValueError):
        extract_audio_features(synthetic_media(spark, 3), decoder="mp3")


# --- pHash image near-dup (round-12, operators/phash.py) ---------------------


def _noise_png(seed: int, patch: int = 0) -> bytes:
    import hashlib

    import numpy as np

    from smartbots_etl_facturas_spark.sources.multimodal import png_encode

    out = b""
    i = 0
    while len(out) < 1024:
        out += hashlib.sha256(f"{seed}:{i}".encode()).digest()
        i += 1
    img = np.frombuffer(out[:1024], dtype=np.uint8).reshape(32, 32).copy()
    if patch:
        img[4:8, 4:8] = np.minimum(
            img[4:8, 4:8].astype(np.int64) + patch, 255
        ).astype(np.uint8)
    return png_encode(img)


def test_phash_exact_integer_and_stable():
    """phash_bits is pure integer arithmetic: identical pixels →
    identical hash; gray/RGB of the same luminance agree; every hash
    has bit 0 (the DC slot) clear."""
    import numpy as np

    from smartbots_etl_facturas_spark.operators.phash import (
        _to_gray,
        phash_bits,
    )
    from smartbots_etl_facturas_spark.sources.multimodal import png_decode

    g = png_decode(_noise_png(7))
    assert phash_bits(_to_gray(g)) == phash_bits(_to_gray(g))
    assert phash_bits(_to_gray(g)) & 1 == 0
    # a gray image expanded to RGB has identical BT.601 luminance
    rgb = np.repeat(g, 3, axis=2)
    assert phash_bits(_to_gray(rgb)) == phash_bits(_to_gray(g))


def test_phash_images_and_banded_pairs(spark):
    """End-to-end: decode → hash → banded join finds exact (Hamming 0)
    and near (patched) duplicates, never the cross pairs; the
    candidate join is keyed on (band, slice) — NO nested-loop or
    cartesian stage anywhere in the plan."""
    from smartbots_etl_facturas_spark.operators.phash import (
        phash_images,
        phash_near_pairs,
    )
    from smartbots_etl_facturas_spark.plans.doctor import plan_report

    rows = []
    for s in range(8):
        rows.append((s, bytearray(_noise_png(s))))
        rows.append((s + 100, bytearray(_noise_png(s))))          # exact
        rows.append((s + 200, bytearray(_noise_png(s, patch=16))))  # near
    media = spark.createDataFrame(rows, "media_id long, content binary")
    sk = phash_images(media)
    pairs = phash_near_pairs(sk, max_distance=7, bands=8)
    rep = plan_report(pairs)
    assert rep.cartesian_products == 0
    assert rep.broadcast_nested_loop_joins == 0
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    for s in range(8):
        assert got[(s, s + 100)] == 0            # exact copy
        assert got[(s, s + 200)] <= 7            # near copy found
        assert got[(s + 100, s + 200)] == got[(s, s + 200)]
    # no cross-family pair survives the verify
    assert all(a % 100 == b % 100 for (a, b) in got)


def test_phash_banding_is_lossless_up_to_bound(spark):
    """Pigeonhole contract: for hashes within max_distance < bands,
    the banded join finds EVERY pair a brute-force comparison finds;
    distances >= bands are rejected at the API."""
    import pytest as _pytest

    from smartbots_etl_facturas_spark.operators.phash import (
        phash_near_pairs,
    )

    # craft sketches with known pairwise distances around the bound
    base = 0x0123456789ABCDEF
    sketches = spark.createDataFrame(
        [(0, base),
         (1, base ^ 0x7),                # d=3
         (2, base ^ 0x7F),               # d=7 (= max allowed)
         (3, base ^ ((1 << 63) - 1))],   # far
        "media_id long, phash long",
    )
    got = {(r.id_a, r.id_b): r.hamming
           for r in phash_near_pairs(sketches, max_distance=7).collect()}
    assert got[(0, 1)] == 3 and got[(0, 2)] == 7 and got[(1, 2)] == 4
    assert not any(3 in p for p in got)
    with _pytest.raises(ValueError):
        phash_near_pairs(sketches, max_distance=8, bands=8)


def test_phash_persisted_index_incremental_probe(spark, tmp_path):
    """Persisted pHash index (round-12): the corpus's band postings +
    hash table publish once; a delta batch hashes ONLY itself, probes
    the stored postings, and finds exactly its near/exact family
    members — bit-identical to what the self-join finds among the
    same pairs."""
    from smartbots_etl_facturas_spark.operators.phash import (
        build_phash_index,
        phash_images,
        phash_match_against_index,
        phash_near_pairs,
    )

    corpus_rows, delta_rows = [], []
    for s in range(6):
        corpus_rows.append((s, bytearray(_noise_png(s))))
        corpus_rows.append((s + 100, bytearray(_noise_png(s))))      # exact
        delta_rows.append((s + 200, bytearray(_noise_png(s, patch=16))))
    corpus = phash_images(
        spark.createDataFrame(corpus_rows, "media_id long, content binary")
    )
    delta = phash_images(
        spark.createDataFrame(delta_rows, "media_id long, content binary")
    )
    base = str(tmp_path / "phash_idx")
    build_phash_index(corpus, base, bands=8)
    got = {
        (r.delta_id, r.corpus_id): r.hamming
        for r in phash_match_against_index(delta, base,
                                           max_distance=7).collect()
    }
    # each delta matches exactly its base + exact twin, nothing else
    assert sorted(got) == sorted(
        [(s + 200, s) for s in range(6)] + [(s + 200, s + 100)
                                            for s in range(6)]
    )
    # distances agree with the self-join tier on the union
    self_pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_pairs(corpus.unionByName(delta),
                                  max_distance=7).collect()
    }
    for (d, c), h in got.items():
        assert self_pairs[(min(c, d), max(c, d))] == h
    # geometry contract: probing past the index's band bound raises
    import pytest as _pytest

    with _pytest.raises(ValueError):
        phash_match_against_index(delta, base, max_distance=8)


# --- audio fingerprint near-dup (round-12, operators/audiofp.py) -------------


def _noise_wav(seed: int, scale: int = 1, corrupt_frame: int | None = None,
               n: int = 4224) -> bytes:
    import hashlib

    import numpy as np

    from smartbots_etl_facturas_spark.sources.multimodal import wav_encode

    out = b""
    i = 0
    while len(out) < n * 2:
        out += hashlib.sha256(f"a:{seed}:{i}".encode()).digest()
        i += 1
    x = np.frombuffer(out[: n * 2], dtype="<i2").astype(np.int64)
    x = np.clip(x // 4, -8192, 8191) * scale
    if corrupt_frame is not None:
        seg = n // 32
        x = x.copy()
        x[corrupt_frame * seg:(corrupt_frame + 1) * seg] = 0
    return wav_encode(x.astype(np.int16))


def test_audio_fingerprint_invariants():
    """Exact-integer Haitsma-Kalker words: copy identity, EXACT
    amplitude-scaling invariance (energies scale by c^2 > 0), and the
    provable locality bound (one corrupted frame flips <= 2 of the 31
    words)."""
    import numpy as np

    from smartbots_etl_facturas_spark.operators.audiofp import (
        audio_fingerprint_words,
    )
    from smartbots_etl_facturas_spark.sources.multimodal import wav_decode

    def words(b):
        arr, _ = wav_decode(b)
        return audio_fingerprint_words(arr.astype(np.int64).sum(axis=1))

    base = words(_noise_wav(7))
    assert len(base) == 31
    assert words(_noise_wav(7)) == base
    assert words(_noise_wav(7, scale=2)) == base          # exact
    corrupted = words(_noise_wav(7, corrupt_frame=10))
    diff = sum(1 for a, b in zip(base, corrupted) if a != b)
    assert 0 < diff <= 2                                   # locality
    assert sum(1 for a, b in zip(base, words(_noise_wav(8)))
               if a == b) <= 2                             # cross-family


def test_afp_near_pairs_banded_join(spark):
    """End-to-end: decode → fingerprint → (frame, word) equi-join
    finds exact/scaled/corrupted family pairs and nothing across
    families; no cartesian or nested-loop stage in the plan."""
    from smartbots_etl_facturas_spark.operators.audiofp import (
        afp_near_pairs,
        audio_fingerprints,
    )
    from smartbots_etl_facturas_spark.plans.doctor import plan_report

    rows = []
    for s in range(6):
        rows.append((s * 4 + 0, bytearray(_noise_wav(s))))
        rows.append((s * 4 + 1, bytearray(_noise_wav(s))))           # exact
        rows.append((s * 4 + 2, bytearray(_noise_wav(s, scale=2))))  # scaled
        rows.append((s * 4 + 3,
                     bytearray(_noise_wav(s, corrupt_frame=10))))    # near
    media = spark.createDataFrame(rows, "media_id long, content binary")
    pairs = afp_near_pairs(audio_fingerprints(media), min_matches=29)
    rep = plan_report(pairs)
    assert rep.cartesian_products == 0
    assert rep.broadcast_nested_loop_joins == 0
    got = {(r.id_a, r.id_b): r.n_matched for r in pairs.collect()}
    assert len(got) == 6 * 6                  # 6 in-family pairs per family
    for s in range(6):
        b = s * 4
        assert got[(b, b + 1)] == 31 and got[(b, b + 2)] == 31
        assert got[(b + 1, b + 2)] == 31
        for other in (b, b + 1, b + 2):
            assert got[(other, b + 3)] >= 29
    assert all(a // 4 == b // 4 for (a, b) in got)


def test_afp_rejects_too_short(spark):
    import pytest as _pytest

    from smartbots_etl_facturas_spark.operators.audiofp import (
        audio_fingerprint_words,
    )

    with _pytest.raises(ValueError, match="too short"):
        audio_fingerprint_words(list(range(100)))


def test_afp_persisted_index_incremental_probe(spark, tmp_path):
    """Persisted audio-fingerprint index: corpus postings publish
    once; a delta batch fingerprints ONLY itself, probes the stored
    postings, and finds exactly its family members with the same
    match counts as the self-join tier."""
    from smartbots_etl_facturas_spark.operators.audiofp import (
        afp_index_geometry,
        afp_match_against_index,
        afp_near_pairs,
        audio_fingerprints,
        build_afp_index,
    )

    corpus_rows, delta_rows = [], []
    for s in range(5):
        corpus_rows.append((s * 4, bytearray(_noise_wav(s))))
        corpus_rows.append((s * 4 + 2, bytearray(_noise_wav(s, scale=2))))
        delta_rows.append((s * 4 + 3,
                           bytearray(_noise_wav(s, corrupt_frame=10))))
    corpus = audio_fingerprints(
        spark.createDataFrame(corpus_rows, "media_id long, content binary")
    )
    delta = audio_fingerprints(
        spark.createDataFrame(delta_rows, "media_id long, content binary")
    )
    base = str(tmp_path / "afp_idx")
    build_afp_index(corpus, base)
    assert afp_index_geometry(spark, base) == (32, 33)
    got = {
        (r.delta_id, r.corpus_id): r.n_matched
        for r in afp_match_against_index(delta, base,
                                         min_matches=29).collect()
    }
    assert sorted(got) == sorted(
        [(s * 4 + 3, s * 4) for s in range(5)]
        + [(s * 4 + 3, s * 4 + 2) for s in range(5)]
    )
    self_pairs = {
        (r.id_a, r.id_b): r.n_matched
        for r in afp_near_pairs(corpus.unionByName(delta),
                                min_matches=29).collect()
    }
    for (d, c), m in got.items():
        assert self_pairs[(min(c, d), max(c, d))] == m


def test_phash_ingest_loop_catches_within_batch_pairs(spark, tmp_path):
    """Round-13 verdict #8 pin: phash_match_against_index reports
    CROSS-BATCH matches only — two near-dup images in the same delta
    batch are invisible to it. The composed ingest loop (batch-local
    phash_near_pairs over the delta's own sketches + the probe)
    catches both kinds."""
    from smartbots_etl_facturas_spark.operators.phash import (
        build_phash_index,
        phash_images,
        phash_match_against_index,
        phash_near_pairs,
    )

    corpus = phash_images(spark.createDataFrame(
        [(s, bytearray(_noise_png(s))) for s in range(3)],
        "media_id long, content binary",
    ))
    # delta: one near-dup of corpus seed 0, one NEW within-batch pair
    # (seed 10 exact + patched), one singleton (seed 20)
    delta = phash_images(spark.createDataFrame(
        [(200, bytearray(_noise_png(0, patch=16))),
         (500, bytearray(_noise_png(10))),
         (501, bytearray(_noise_png(10, patch=16))),
         (600, bytearray(_noise_png(20)))],
        "media_id long, content binary",
    )).cache()
    base = str(tmp_path / "phash_idx")
    build_phash_index(corpus, base, bands=8)
    cross = {(r.delta_id, r.corpus_id)
             for r in phash_match_against_index(
                 delta, base, max_distance=7).collect()}
    # pinned blind spot: (500, 501) is NOT here
    assert cross == {(200, 0)}
    within = {(r.id_a, r.id_b)
              for r in phash_near_pairs(delta, max_distance=7).collect()}
    assert within == {(500, 501)}
    flagged = {d for d, _ in cross} | {b for _, b in within}
    assert flagged == {200, 501}          # composed loop: both caught
    delta.unpersist()


def test_afp_ingest_loop_catches_within_batch_pairs(spark, tmp_path):
    """Round-13 verdict #8 pin: afp_match_against_index reports
    CROSS-BATCH matches only — two near-dup recordings in the same
    delta batch are invisible to it. The composed ingest loop
    (batch-local afp_near_pairs over the delta's own fingerprints +
    the probe) catches both kinds."""
    from smartbots_etl_facturas_spark.operators.audiofp import (
        afp_match_against_index,
        afp_near_pairs,
        audio_fingerprints,
        build_afp_index,
    )

    corpus = audio_fingerprints(spark.createDataFrame(
        [(s, bytearray(_noise_wav(s))) for s in range(3)],
        "media_id long, content binary",
    ))
    delta = audio_fingerprints(spark.createDataFrame(
        [(200, bytearray(_noise_wav(0, corrupt_frame=10))),
         (500, bytearray(_noise_wav(10))),
         (501, bytearray(_noise_wav(10, scale=2)))]
        + [(600, bytearray(_noise_wav(20)))],
        "media_id long, content binary",
    )).cache()
    base = str(tmp_path / "afp_idx")
    build_afp_index(corpus, base)
    cross = {(r.delta_id, r.corpus_id)
             for r in afp_match_against_index(
                 delta, base, min_matches=29).collect()}
    assert cross == {(200, 0)}            # pinned blind spot: no (500, 501)
    within = {(r.id_a, r.id_b)
              for r in afp_near_pairs(delta, min_matches=29).collect()}
    assert within == {(500, 501)}
    flagged = {d for d, _ in cross} | {b for _, b in within}
    assert flagged == {200, 501}
    delta.unpersist()


# --- video fingerprint near-dup (round-13, operators/videofp.py) --------------


def _noise_frame(seed: str):
    import hashlib

    import numpy as np

    out = b""
    i = 0
    while len(out) < 1024:
        out += hashlib.sha256(f"{seed}:{i}".encode()).digest()
        i += 1
    return np.frombuffer(out[:1024], dtype=np.uint8).reshape(32, 32).copy()


def _noise_video(doc: int, variant: int, n_frames: int = 8) -> bytes:
    import numpy as np

    from smartbots_etl_facturas_spark.sources.multimodal import rawv_encode

    frames = np.stack([_noise_frame(f"v:{doc}:{j}") for j in range(n_frames)])
    if variant == 2:          # near copy: per-frame +16 patch
        f = frames.astype(np.int64)
        f[:, 4:8, 4:8] = np.minimum(f[:, 4:8, 4:8] + 16, 255)
        frames = f.astype(np.uint8)
    if variant == 3:          # one frame replaced entirely
        frames = frames.copy()
        frames[3] = _noise_frame(f"v:{doc}:corrupt")
    return rawv_encode(frames)


def test_rawv_roundtrip_and_errors():
    import numpy as np
    import pytest as _pytest

    from smartbots_etl_facturas_spark.sources.multimodal import (
        rawv_decode,
        rawv_encode,
    )

    frames = np.stack([_noise_frame(f"r:{j}") for j in range(5)])
    back = rawv_decode(rawv_encode(frames))
    assert back.shape == (5, 32, 32) and (back == frames).all()
    with _pytest.raises(ValueError, match="RAWV"):
        rawv_decode(b"nope" + b"\0" * 32)
    with _pytest.raises(ValueError, match="truncated"):
        rawv_decode(rawv_encode(frames)[:-10])


def test_video_frame_hash_margins_over_250_seeds():
    """The per-frame constructions' Hamming margins, measured over 250
    seeds in the video namespace: per-frame +16 patch stays <= 6 bits
    (inside the d<=7 operating point), a REPLACED frame vs its base
    and cross-family frames at the same index stay >= 10 bits (outside
    it) — both sides of the d<=7 / 8-band point have margin. The
    one-frame locality bound itself needs no measurement: frames hash
    independently, so exactly one (media, frame_idx) hash changes."""
    import numpy as np

    from smartbots_etl_facturas_spark.operators.phash import (
        _to_gray,
        phash_bits,
    )

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    patch_max, replaced_min, cross_min = 0, 64, 64
    prev_h = None
    for seed in range(250):
        base = _noise_frame(f"v:{seed}:0")
        h = phash_bits(_to_gray(base))
        patched = base.astype(np.int64)
        patched[4:8, 4:8] = np.minimum(patched[4:8, 4:8] + 16, 255)
        hp = phash_bits(_to_gray(patched.astype(np.uint8)))
        patch_max = max(patch_max, ham(h, hp))
        hr = phash_bits(_to_gray(_noise_frame(f"v:{seed}:corrupt")))
        replaced_min = min(replaced_min, ham(h, hr))
        if prev_h is not None:
            cross_min = min(cross_min, ham(h, prev_h))
        prev_h = h
    assert patch_max <= 6, patch_max
    assert replaced_min > 7, replaced_min
    assert cross_min > 7, cross_min


def test_vfp_near_pairs_invariants_and_plan(spark):
    """End-to-end: decode -> per-frame pHash -> (frame_idx, band,
    slice) equi-join. Exact/patched pairs match all 8 frames; pairs
    involving the one-frame-replaced variant match EXACTLY 7 (the
    provable independent-frame locality bound); zero cross-family
    pairs; no cartesian or nested-loop stage."""
    from smartbots_etl_facturas_spark.operators.videofp import (
        vfp_near_pairs,
        video_fingerprints,
    )
    from smartbots_etl_facturas_spark.plans.doctor import plan_report

    rows = [(d * 4 + v, bytearray(_noise_video(d, v)))
            for d in range(5) for v in (0, 1, 2, 3)]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    pairs = vfp_near_pairs(video_fingerprints(media), max_distance=7,
                           bands=8, min_frames=7)
    rep = plan_report(pairs)
    assert rep.cartesian_products == 0
    assert rep.broadcast_nested_loop_joins == 0
    got = {(r.id_a, r.id_b): r.n_matched for r in pairs.collect()}
    assert len(got) == 5 * 6
    assert all(a // 4 == b // 4 for (a, b) in got)
    for d in range(5):
        b = d * 4
        assert got[(b, b + 1)] == 8 and got[(b, b + 2)] == 8
        assert got[(b + 1, b + 2)] == 8
        for o in (b, b + 1, b + 2):
            assert got[(o, b + 3)] == 7
    # pigeonhole contract at the API
    import pytest as _pytest

    from smartbots_etl_facturas_spark.operators.videofp import (
        video_fingerprints as _vf,
    )

    with _pytest.raises(ValueError):
        vfp_near_pairs(_vf(media), max_distance=8, bands=8)


def test_vfp_persisted_index_incremental_probe(spark, tmp_path):
    """Persisted video index: corpus postings publish once; the delta
    batch fingerprints ONLY itself, probes the stored postings, and
    matches exactly its 3 family members on exactly 7 frames each —
    and the probe never re-reads the corpus payloads (only the
    delta's)."""
    from smartbots_etl_facturas_spark.operators.videofp import (
        build_vfp_index,
        vfp_index_bands,
        vfp_match_against_index,
        video_fingerprints,
    )

    corpus_rows = [(d * 4 + v, bytearray(_noise_video(d, v)))
                   for d in range(4) for v in (0, 1, 2)]
    delta_rows = [(d * 4 + 3, bytearray(_noise_video(d, 3)))
                  for d in range(4)]
    corpus = video_fingerprints(spark.createDataFrame(
        corpus_rows, "media_id long, content binary"))
    delta = video_fingerprints(spark.createDataFrame(
        delta_rows, "media_id long, content binary"))
    base = str(tmp_path / "vfp_idx")
    build_vfp_index(corpus, base, bands=8)
    assert vfp_index_bands(spark, base) == 8
    got = {(r.delta_id, r.corpus_id): r.n_matched
           for r in vfp_match_against_index(delta, base, max_distance=7,
                                            min_frames=7).collect()}
    assert sorted(got) == sorted(
        (d * 4 + 3, d * 4 + v) for d in range(4) for v in (0, 1, 2)
    )
    assert all(v == 7 for v in got.values())
    import pytest as _pytest

    with _pytest.raises(ValueError):
        vfp_match_against_index(delta, base, max_distance=8)


def test_vfp_ingest_loop_catches_within_batch_pairs(spark, tmp_path):
    """Round-13 verdict #8 pin, video member: the probe reports
    CROSS-BATCH matches only; the composed ingest loop (batch-local
    vfp_near_pairs over the delta's own fingerprints + the probe)
    catches both kinds."""
    from smartbots_etl_facturas_spark.operators.videofp import (
        build_vfp_index,
        vfp_match_against_index,
        vfp_near_pairs,
        video_fingerprints,
    )

    corpus = video_fingerprints(spark.createDataFrame(
        [(d, bytearray(_noise_video(d, 0))) for d in range(3)],
        "media_id long, content binary",
    ))
    delta = video_fingerprints(spark.createDataFrame(
        [(200, bytearray(_noise_video(0, 3))),        # cross-batch near-dup
         (500, bytearray(_noise_video(10, 0))),       # within-batch pair...
         (501, bytearray(_noise_video(10, 2))),       # ...of 500
         (600, bytearray(_noise_video(20, 0)))],
        "media_id long, content binary",
    )).cache()
    base = str(tmp_path / "vfp_idx")
    build_vfp_index(corpus, base, bands=8)
    cross = {(r.delta_id, r.corpus_id)
             for r in vfp_match_against_index(delta, base, max_distance=7,
                                              min_frames=7).collect()}
    assert cross == {(200, 0)}            # pinned blind spot: no (500, 501)
    within = {(r.id_a, r.id_b)
              for r in vfp_near_pairs(delta, max_distance=7,
                                      min_frames=7).collect()}
    assert within == {(500, 501)}
    flagged = {d for d, _ in cross} | {b for _, b in within}
    assert flagged == {200, 501}
    delta.unpersist()
