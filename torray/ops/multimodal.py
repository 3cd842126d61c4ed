"""Multimodal (binary-column) processing plumbing.

Images / audio / video are opaque ``binary`` columns with typed
metadata, processed by actor-pool ``map_batches`` stages: decoder
state (codec contexts, model weights) loads once per actor in
``__init__``, batches flow through ``__call__``.

Decoders:

- ``decoder="ppm"`` — REAL image decode for binary PPM/PGM (P6/P5):
  header parse + numpy pixel reshape, 8x8 block-mean thumbnail
  features, width/height emitted.  Pure numpy; no external libs.
- ``decoder="wav"`` — REAL audio decode via the stdlib ``wave``
  module: PCM16 samples -> 64-bin coarse magnitude spectrum
  (``np.fft.rfft``), duration emitted.
- ``decoder="stub"`` — deterministic sha-seeded fake features, for
  payloads in formats this container cannot decode (JPEG/PNG/MP3/...).
- ``decoder="pil"`` / ``"librosa"`` / ``"ffmpeg"`` — raise
  NotImplementedError until the real libraries are importable (the
  documented extension point; the actor/batch plumbing is identical).

Undecodable payloads (truncated header, wrong magic) yield null
features rather than failing the batch — at 100 TB a fraction of any
media corpus is always corrupt.

Batch-size guidance: large payload columns need SMALL batch sizes —
``batch_size * avg_payload * concurrency`` must fit in worker heaps;
callers pass ``batch_size`` explicitly for that reason.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["MEDIA_SCHEMA", "MediaFeatureExtractor", "extract_media_features",
           "media_table_from_payloads", "encode_ppm", "encode_wav",
           "encode_ppmv", "sample_video_frames", "VideoFrameSampler",
           "ImageHasher", "image_hashes", "image_dup_pairs",
           "AudioHasher", "audio_hashes", "audio_dup_pairs",
           "sniff_media_type"]

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),   # image | audio | video
    ("mime", pa.string()),
    ("width", pa.int32()),         # -1 when unknown / not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

FEATURE_DIM = 64


def media_table_from_payloads(payloads: list[bytes],
                              media_type: str = "image",
                              mime: str = "image/png") -> pa.Table:
    n = len(payloads)
    return pa.Table.from_arrays(
        [
            pa.array(range(n), pa.int64()),
            pa.array(payloads, pa.binary()),
            pa.array([media_type] * n, pa.string()),
            pa.array([mime] * n, pa.string()),
            pa.array([-1] * n, pa.int32()),
            pa.array([-1] * n, pa.int32()),
            pa.array([-1] * n, pa.int32()),
        ],
        schema=MEDIA_SCHEMA,
    )


# -- tiny encoders (test/synth side of the real decoders) -------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """uint8 array (h, w) or (h, w, 3) -> binary PGM/PPM bytes."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        magic, h, w = b"P5", *arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic, (h, w) = b"P6", arr.shape[:2]
    else:
        raise ValueError("expected (h,w) or (h,w,3) uint8 pixels")
    return b"%s\n%d %d\n255\n" % (magic, w, h) + arr.tobytes()


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> WAV bytes (stdlib wave)."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


# -- decode kernels ---------------------------------------------------------


def _decode_ppm(payload: bytes) -> tuple[np.ndarray, int, int] | None:
    """Binary PPM (P6) / PGM (P5) -> (float gray array (h, w), w, h)."""
    if not payload or payload[:2] not in (b"P5", b"P6"):
        return None
    # Header: magic, whitespace/comment-separated width height maxval,
    # one whitespace byte, then raw samples.
    pos, fields = 2, []
    try:
        while len(fields) < 3:
            while payload[pos:pos + 1].isspace():
                pos += 1
            if payload[pos:pos + 1] == b"#":
                pos = payload.index(b"\n", pos) + 1
                continue
            start = pos
            while not payload[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = fields
        channels = 3 if payload[:2] == b"P6" else 1
        need = w * h * channels * (2 if maxval > 255 else 1)
        raw = payload[pos:pos + need]
        if len(raw) < need or w <= 0 or h <= 0:
            return None
        dtype = np.dtype(">u2") if maxval > 255 else np.uint8
        arr = np.frombuffer(raw, dtype=dtype).astype(np.float64)
        arr = arr.reshape(h, w, channels).mean(axis=2) / maxval
        return arr, w, h
    except (ValueError, IndexError):
        return None


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int] | None:
    """WAV bytes -> (float mono samples, duration_ms)."""
    import wave

    try:
        with wave.open(io.BytesIO(payload or b""), "rb") as w:
            rate = w.getframerate()
            n = w.getnframes()
            width = w.getsampwidth()
            channels = w.getnchannels()
            raw = w.readframes(n)
    except (wave.Error, EOFError):
        return None
    if width == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
               - 128.0) / 128.0
    else:
        return None
    if channels > 1:
        arr = arr[: (len(arr) // channels) * channels]
        arr = arr.reshape(-1, channels).mean(axis=1)
    duration_ms = int(round(1000.0 * n / rate)) if rate else 0
    return arr, duration_ms


def _thumbnail_features(gray: np.ndarray, dim: int) -> np.ndarray:
    """8x8 block-mean thumbnail (the classic resize-to-grid feature) —
    pure-numpy 'resize' over arbitrary image sizes."""
    side = int(np.sqrt(dim))
    h, w = gray.shape
    ys = np.linspace(0, h, side + 1).astype(int)
    xs = np.linspace(0, w, side + 1).astype(int)
    out = np.empty((side, side), dtype=np.float64)
    for i in range(side):
        for j in range(side):
            block = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                         xs[j]:max(xs[j + 1], xs[j] + 1)]
            out[i, j] = block.mean()
    return out.reshape(-1).astype(np.float32)


def _spectrum_features(samples: np.ndarray, dim: int) -> np.ndarray:
    """Coarse magnitude spectrum: |rfft| folded into ``dim`` bins."""
    if samples.size == 0:
        return np.zeros(dim, dtype=np.float32)
    mag = np.abs(np.fft.rfft(samples))
    bins = np.array_split(mag, dim)
    return np.array([b.mean() if b.size else 0.0 for b in bins],
                    dtype=np.float32)


class MediaFeatureExtractor:
    """Actor-pool stage: decode + featurize binary payloads.

    Use as ``ds.map_batches(MediaFeatureExtractor,
    fn_constructor_kwargs={"decoder": "ppm"}, concurrency=N,
    batch_size=B, batch_format="pyarrow")`` — construction cost (model
    load / codec init) is paid once per actor, per the stateful-stage
    pattern."""

    def __init__(self, decoder: str = "stub", feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim
        self.decoder = decoder
        if decoder not in ("stub", "ppm", "wav"):
            if decoder in ("pil", "librosa", "ffmpeg"):
                raise NotImplementedError(
                    f"decoder {decoder!r} requires libraries not present in "
                    f"this environment; wire the real decode here")
            raise ValueError(f"unknown decoder {decoder!r}")

    def _decode_stub(self, payload: bytes) -> np.ndarray:
        """Deterministic fake feature vector: sha256-seeded — stable
        across processes, so pipelines over stub features are testable."""
        digest = hashlib.sha256(payload or b"").digest()
        seed = int.from_bytes(digest[:4], "big")
        rng = np.random.RandomState(seed)
        return rng.normal(size=self.feature_dim).astype(np.float32)

    def _one(self, payload: bytes):
        """-> (features | None, width, height, duration_ms)."""
        if self.decoder == "ppm":
            dec = _decode_ppm(payload)
            if dec is None:
                return None, -1, -1, -1
            gray, w, h = dec
            return _thumbnail_features(gray, self.feature_dim), w, h, -1
        if self.decoder == "wav":
            dec = _decode_wav(payload)
            if dec is None:
                return None, -1, -1, -1
            samples, dur = dec
            return _spectrum_features(samples, self.feature_dim), -1, -1, dur
        return self._decode_stub(payload), -1, -1, -1

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats, widths, heights, durs = [], [], [], []
        for p in payloads:
            f, w, h, d = self._one(p)
            feats.append(None if f is None else f.tolist())
            widths.append(w)
            heights.append(h)
            durs.append(d)
        sizes = [len(p) if p else 0 for p in payloads]
        return pa.table({
            "media_id": batch.column("media_id"),
            "media_type": batch.column("media_type"),
            "payload_bytes": pa.array(sizes, pa.int64()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
            "features": pa.array(feats, pa.list_(pa.float32())),
        })


def extract_media_features(media_ds, *, decoder: str = "stub",
                           concurrency: int = 2, batch_size: int = 16):
    """The full actor-pool stage over a MEDIA_SCHEMA Dataset.  Small
    batch_size on purpose: payloads are large."""
    return media_ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder": decoder},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Video: frame-sampling actor-pool stage
# ---------------------------------------------------------------------------

_PPMV_MAGIC = b"PPMV"


def encode_ppmv(frames: list) -> bytes:
    """Deterministic container for synthetic test video: the magic,
    a big-endian u32 frame count, then per frame a u32 length + the
    frame's PPM bytes.  Exists so the frame-sampling plumbing decodes
    REAL frames without any codec library."""
    parts = [_PPMV_MAGIC, len(frames).to_bytes(4, "big")]
    for f in frames:
        ppm = encode_ppm(f)
        parts.append(len(ppm).to_bytes(4, "big"))
        parts.append(ppm)
    return b"".join(parts)


def _decode_ppmv(payload: bytes):
    """-> list of per-frame PPM byte strings, or None if not PPMV /
    truncated."""
    if not payload or not payload.startswith(_PPMV_MAGIC):
        return None
    n = int.from_bytes(payload[4:8], "big")
    frames, pos = [], 8
    for _ in range(n):
        if pos + 4 > len(payload):
            return None
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        pos += 4
        if pos + ln > len(payload):
            return None
        frames.append(payload[pos:pos + ln])
        pos += ln
    return frames


class VideoFrameSampler:
    """Actor-pool stage: sample ``n_frames`` uniformly spaced frames
    from each video payload, decode each sampled frame, featurize ->
    ONE ROW PER SAMPLED FRAME ``(media_id, frame_idx, total_frames,
    width, height, features)``.

    codec='ppmv' decodes the real synthetic container above (frame
    indices ``round(linspace(0, total-1, n))``, deduplicated — the
    uniform-sampling recipe video encoders like VideoCLIP use);
    'mp4'/'ffmpeg' raise NotImplementedError AT CONSTRUCTION (the
    container has no codec libs — wire the real decode there).
    Undecodable payloads emit zero rows; the output schema stays
    fixed either way so downstream stages never see a schema flip.
    Setup (codec probe) runs once per actor; per-batch work is the
    decode itself, which is the point of the stage."""

    def __init__(self, n_frames: int = 4, feature_dim: int = FEATURE_DIM,
                 codec: str = "ppmv"):
        if codec in ("mp4", "ffmpeg", "webm"):
            raise NotImplementedError(
                f"codec {codec!r} requires libraries not present in this "
                f"environment; wire the real frame decode here")
        if codec != "ppmv":
            raise ValueError(f"unknown codec {codec!r}")
        self.n_frames = n_frames
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idx_out, tot_out = [], [], []
        w_out, h_out, feat_out = [], [], []
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        for mid, payload in zip(ids, payloads):
            frames = _decode_ppmv(payload)
            if not frames:
                continue
            total = len(frames)
            picks = np.unique(np.round(np.linspace(
                0, total - 1, min(self.n_frames, total))).astype(np.int64))
            for fi in picks:
                dec = _decode_ppm(frames[int(fi)])
                if dec is None:
                    continue
                gray, w, h = dec
                ids_out.append(mid)
                idx_out.append(int(fi))
                tot_out.append(total)
                w_out.append(w)
                h_out.append(h)
                feat_out.append(_thumbnail_features(
                    gray, self.feature_dim).tolist())
        return pa.table({
            "media_id": pa.array(ids_out, pa.int64()),
            "frame_idx": pa.array(idx_out, pa.int64()),
            "total_frames": pa.array(tot_out, pa.int64()),
            "width": pa.array(w_out, pa.int32()),
            "height": pa.array(h_out, pa.int32()),
            "features": pa.array(feat_out, pa.list_(pa.float32())),
        })


def sample_video_frames(media_ds, *, n_frames: int = 4,
                        codec: str = "ppmv", concurrency: int = 2,
                        batch_size: int = 8):
    """Frame-sampling over a MEDIA_SCHEMA Dataset.  batch_size is
    small on purpose — video payloads are the largest binary rows a
    pipeline carries, and a batch x concurrency of them must fit a
    worker heap."""
    return media_ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames, "codec": codec},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Image perceptual hashing: aHash/dHash + Hamming near-dup pairs
# ---------------------------------------------------------------------------


def _ahash64(gray: np.ndarray) -> int:
    """Average hash: 8x8 block-mean thumbnail thresholded at its mean.
    Bit i = 1 when cell i is brighter than the thumbnail average —
    invariant to uniform brightness/contrast scaling and to the small
    re-encode noise that defeats byte-exact dedup."""
    thumb = _thumbnail_features(gray, 64).reshape(8, 8)
    bits = (thumb > thumb.mean()).ravel()
    return int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])


def _dhash64(gray: np.ndarray) -> int:
    """Difference hash: 9x8 block means, bit = left cell > right cell.
    Captures horizontal gradients; complements aHash (flat images with
    one hot pixel hash identically under aHash but not dHash)."""
    h, w = gray.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 10).astype(int)
    cells = np.empty((8, 9), np.float64)
    for i in range(8):
        for j in range(9):
            block = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                         xs[j]:max(xs[j + 1], xs[j] + 1)]
            cells[i, j] = float(block.mean())
    bits = (cells[:, :-1] > cells[:, 1:]).ravel()
    return int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])


class ImageHasher:
    """Actor-pool stage: binary image payloads -> 64-bit perceptual
    hashes (aHash + dHash).  Same stateful-stage contract as
    :class:`MediaFeatureExtractor`: construction once per actor, small
    ``batch_size`` because payloads are large, only (id, 2 x int64,
    dims) leaves the stage — the image bytes never shuffle."""

    def __init__(self, decoder: str = "ppm"):
        if decoder != "ppm":
            if decoder == "pil":
                raise NotImplementedError(
                    "decoder 'pil' requires Pillow, absent in this "
                    "environment; wire the real decode here")
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ah, dh, ws, hs = [], [], [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            dec = _decode_ppm(payload)
            if dec is None:
                continue  # undecodable rows drop (logged-side metric)
            gray, w, h = dec
            ids.append(mid)
            ah.append(np.uint64(_ahash64(gray)).astype(np.int64))
            dh.append(np.uint64(_dhash64(gray)).astype(np.int64))
            ws.append(w)
            hs.append(h)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "ahash": pa.array(ah, pa.int64()),
            "dhash": pa.array(dh, pa.int64()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32())})


def image_hashes(media_ds, *, decoder: str = "ppm",
                 concurrency: int = 2, batch_size: int = 16):
    """Perceptual-hash stage over a MEDIA_SCHEMA Dataset."""
    return media_ds.map_batches(
        ImageHasher,
        fn_constructor_kwargs={"decoder": decoder},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def image_dup_pairs(media_ds, *, max_hamming: int = 3,
                    hash_col: str = "ahash", decoder: str = "ppm",
                    max_bucket: int = 256,
                    concurrency: int = 2, batch_size: int = 16):
    """Near-duplicate image pairs: perceptual-hash Hamming distance
    <= ``max_hamming``.

    Scale shape mirrors :func:`torray.ops.dedup.simhash_dedup`: the
    64-bit hash splits into ``max_hamming + 1`` bands, so any pair
    within the distance budget shares at least one exact band
    (pigeonhole); one narrow int64 ``(band_key, media_id, hash)``
    shuffle groups candidates and a vectorized xor+popcount verifies.
    Image bytes stay in the hashing stage's blocks; only 24 bytes per
    image per band move.
    """
    hashed = image_hashes(media_ds, decoder=decoder,
                          concurrency=concurrency, batch_size=batch_size)
    return _hash64_pairs(hashed, "media_id", hash_col,
                         max_hamming=max_hamming, max_bucket=max_bucket)


def _hash64_pairs(hashed_ds, id_col: str, hash_col: str, *,
                  max_hamming: int, max_bucket: int):
    """Generic banded Hamming join over a (id, 64-bit hash) Dataset:
    ``max_hamming + 1`` bands (pigeonhole guarantee), salted buckets,
    vectorized xor+popcount verify."""
    from torray.ops.dedup import (_popcount64, pair_counts,
                                  salted_bucket_pairs)

    n_bands = max_hamming + 1
    width = 64 // n_bands

    def banded(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sigs = batch.column(hash_col).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        keys = np.empty(n_bands * n, np.uint64)
        for band in range(n_bands):
            lo = band * width
            # the LAST band absorbs the 64 % n_bands remainder bits
            take = 64 - lo if band == n_bands - 1 else width
            mask = np.uint64((1 << take) - 1) if take < 64 \
                else np.uint64(0xFFFFFFFFFFFFFFFF)
            chunk = (sigs >> np.uint64(lo)) & mask
            keys[band * n:(band + 1) * n] = (
                (np.uint64(band) << np.uint64(58)) | chunk)
        return pa.table({
            "band_key": pa.array(keys.view(np.int64), pa.int64()),
            id_col: pa.array(np.tile(ids, n_bands), pa.int64()),
            "sig": pa.array(np.tile(sigs, n_bands).view(np.int64),
                            pa.int64())})

    def hamming_ok(pay_a: np.ndarray, pay_b: np.ndarray) -> np.ndarray:
        return _popcount64(pay_a.view(np.uint64)
                           ^ pay_b.view(np.uint64)) <= max_hamming

    pair_ds = salted_bucket_pairs(
        hashed_ds.map_batches(banded, batch_format="pyarrow"),
        "band_key", id_col, max_bucket=max_bucket,
        payload_col="sig", pair_filter=hamming_ok)
    return pair_counts(pair_ds).map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")


def _audiohash64(samples: np.ndarray) -> int:
    """Spectral fingerprint: 64 log-spaced |rfft| band energies
    thresholded at their median.  Robust to volume scaling (threshold
    is relative) and to the small sample noise a re-encode introduces
    — the audio analogue of the image aHash."""
    if samples.size == 0:
        return 0
    mag = np.abs(np.fft.rfft(samples))
    if mag.size < 2:
        return 0
    # log-spaced band edges emphasize the perceptually-dense low end;
    # bit = adjacent-band LOG-energy comparison (dHash-style gradient),
    # which stays stable on sparse spectra where a global median
    # threshold flips on ties
    edges = np.unique(np.geomspace(1, mag.size, 66).astype(int))
    e = np.full(65, -30.0, np.float64)
    for i in range(min(65, len(edges) - 1)):
        seg = mag[edges[i]:max(edges[i + 1], edges[i] + 1)]
        if seg.size:
            e[i] = float(np.log(seg.mean() + 1e-12))
    bits = e[:-1] > e[1:]
    return int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])


class AudioHasher:
    """Actor-pool stage: WAV payloads -> 64-bit spectral fingerprints.
    Same contract as :class:`ImageHasher`; only (id, int64, duration)
    leaves the stage."""

    def __init__(self, decoder: str = "wav"):
        if decoder != "wav":
            if decoder == "librosa":
                raise NotImplementedError(
                    "decoder 'librosa' requires libraries absent in "
                    "this environment; wire the real decode here")
            raise ValueError(f"unknown decoder {decoder!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hh, dur = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            dec = _decode_wav(payload)
            if dec is None:
                continue
            samples, d = dec
            ids.append(mid)
            hh.append(np.uint64(_audiohash64(samples)).astype(np.int64))
            dur.append(d)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "audiohash": pa.array(hh, pa.int64()),
            "duration_ms": pa.array(dur, pa.int32())})


def audio_hashes(media_ds, *, decoder: str = "wav",
                 concurrency: int = 2, batch_size: int = 16):
    return media_ds.map_batches(
        AudioHasher,
        fn_constructor_kwargs={"decoder": decoder},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def audio_dup_pairs(media_ds, *, max_hamming: int = 4,
                    decoder: str = "wav", max_bucket: int = 256,
                    concurrency: int = 2, batch_size: int = 16):
    """Near-duplicate audio pairs: spectral-fingerprint Hamming
    distance <= ``max_hamming``, banded exactly like
    :func:`image_dup_pairs` (pigeonhole over ``max_hamming + 1``
    bands, xor+popcount verify, audio bytes never shuffle)."""
    hashed = audio_hashes(media_ds, decoder=decoder,
                          concurrency=concurrency,
                          batch_size=batch_size)
    return _hash64_pairs(hashed, "media_id", "audiohash",
                         max_hamming=max_hamming, max_bucket=max_bucket)


# magic-byte table, checked in order (first match wins); the RIFF
# container is handled separately (format tag lives at bytes 8-12)
_MAGIC_TABLE = [
    ("pdf", b"%PDF"),
    ("png", b"\x89PNG"),
    ("gif", b"GIF8"),
    ("jpeg", b"\xff\xd8\xff"),
    ("zip", b"PK\x03\x04"),
    ("gzip", b"\x1f\x8b"),
    ("ppm", b"P6"),
    ("pgm", b"P5"),
]


def sniff_media_type(ds, *, payload_col: str = "payload",
                     out_col: str = "sniffed_type"):
    """Classify opaque binary payloads by their MAGIC BYTES —
    pdf/png/gif/jpeg/zip/gzip/ppm/pgm plus the RIFF container split
    into wav/avi — appending ``out_col`` (``'unknown'`` for
    unrecognized bytes, null for null payloads).  The binary-column
    twin of the reference's Content-Type gate
    (/root/reference/libs/functions.py:87-92 trusts headers; a corpus
    pipeline trusts bytes).  Fully vectorized: one ``binary_slice`` +
    equality kernel per table entry, no Python per row; payloads
    never leave the block."""

    def sniff(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.string()))
        col = t.column(payload_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.cast(pa.large_binary())
        verdict = pc.if_else(pc.is_valid(col),
                             pa.scalar("unknown"),
                             pa.scalar(None, pa.string()))
        for typ, prefix in _MAGIC_TABLE:
            m = pc.equal(pc.binary_slice(col, 0, len(prefix)),
                         pa.scalar(prefix, pa.large_binary()))
            verdict = pc.if_else(pc.fill_null(m, False),
                                 pa.scalar(typ), verdict)
        riff = pc.fill_null(pc.equal(
            pc.binary_slice(col, 0, 4),
            pa.scalar(b"RIFF", pa.large_binary())), False)
        fmt = pc.binary_slice(col, 8, 12)
        for typ, tag in (("wav", b"WAVE"), ("avi", b"AVI ")):
            m = pc.and_(riff, pc.fill_null(pc.equal(
                fmt, pa.scalar(tag, pa.large_binary())), False))
            verdict = pc.if_else(m, pa.scalar(typ), verdict)
        return t.append_column(out_col, verdict.cast(pa.string()))

    return ds.map_batches(sniff, batch_format="pyarrow")
