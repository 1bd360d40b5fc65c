"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` payload columns with typed metadata —
never decoded at rest, exactly like the flagship pipeline drops ``html``
the moment text is extracted (stages/extract.py, SURVEY.md §7.4.6).
Decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages: codec state (in a real deployment: PIL/ffmpeg
handles, a feature model) is built ONCE per actor in ``__init__``.

Three decoder tiers per stage:

- ``"auto"`` — REAL uncompressed formats parsed in pure numpy
  (``functions/codecs.py``): binary PGM/PPM + BMP images, RIFF/WAVE
  PCM audio, YUV4MPEG2 video. Genuine byte-format codecs, no
  external libraries, bit-exact round-trips under test.
- ``"real"``/``"pil"`` — the import-gated seam for COMPRESSED formats
  (JPEG/PNG via PIL, MP4 via ffmpeg, FLAC via soundfile): those wheels
  are absent from this container, so construction raises the STUB
  error; drop the lib in and the seam activates.
- ``"fake"`` (default) — deterministic byte-reshape stand-in for
  plumbing tests and payloads in no particular format.

Batch sizes default small: payload rows are MBs, and a batch ×
concurrency must fit a worker heap (SURVEY.md §4 memory row).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),  # images/video: pixel dims; audio: 0
        ("height", pa.int32()),
        ("n_frames", pa.int32()),  # video frame count / audio chunk count; images: 1
    ]
)

IMAGE_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("feature", pa.list_(pa.float32())),
        ("decoded_width", pa.int32()),
        ("decoded_height", pa.int32()),
    ]
)


def make_media_fixture(
    n: int = 32, kind: str = "image", seed: int = 42, codec: str = "raw"
) -> pa.Table:
    """Deterministic synthetic media table. ``codec="raw"`` payloads
    are seeded bytes (for the fake decoder); ``"pgm"``/``"ppm"``/
    ``"bmp"`` (images), ``"wav"`` (audio) and ``"y4m"`` (video) encode
    REAL byte formats via ``functions/codecs.py`` for the auto
    decoders."""
    from bioner_ray.functions import codecs

    rng = np.random.default_rng(seed)
    ids, kinds, payloads, ws, hs, fs = [], [], [], [], [], []
    for i in range(n):
        w = int(rng.integers(8, 33))
        h = int(rng.integers(8, 33))
        frames = 1 if kind == "image" else int(rng.integers(2, 9))
        if codec == "raw":
            payload = rng.integers(0, 256, size=w * h * frames, dtype=np.uint8).tobytes()
        elif codec == "pgm":
            payload = codecs.encode_pgm(rng.integers(0, 256, (h, w), dtype=np.uint8))
        elif codec == "ppm":
            payload = codecs.encode_ppm(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        elif codec == "bmp":
            payload = codecs.encode_bmp(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        elif codec == "wav":
            payload = codecs.encode_wav(
                rng.integers(-(2**15), 2**15, size=w * h * frames, dtype=np.int64).astype(np.int16)
            )
        elif codec == "y4m":
            payload = codecs.encode_y4m(rng.integers(0, 256, (frames, h, w), dtype=np.uint8))
        else:
            raise ValueError(f"unknown fixture codec: {codec}")
        payloads.append(payload)
        ids.append(i)
        kinds.append(kind)
        ws.append(w)
        hs.append(h)
        fs.append(frames)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
            "n_frames": pa.array(fs, type=pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in codec: bytes → (h, w) uint8 'pixels'."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    if arr.size < need:
        arr = np.pad(arr, (0, need - arr.size))
    return arr[:need].reshape(height, width)


class ImageFeatureExtractor:
    """Actor-pool callable: decode → resize → pooled feature vector.

    ``__init__`` builds the codec + "model" once per actor (the A1
    pattern, fasttext_encoder.py:14-15); ``__call__`` handles one Arrow
    batch. Decoders:

    - ``"auto"`` — REAL byte-format codecs (binary PGM/PPM, 24/32-bit
      BMP) parsed in pure numpy (``functions/codecs.py``); decoded dims
      come from the payload itself, RGB collapses to BT.601 luma.
    - ``"pil"`` (alias ``"real"``) — the import-gated seam for
      compressed formats (JPEG/PNG); PIL is absent from this container
      so construction raises the STUB error.
    - ``"fake"`` (default) — deterministic byte-reshape stand-in, kept
      for plumbing tests and payloads that aren't in any real format.
    """

    def __init__(self, decoder: str = "fake", target: int = 8, feature_dim: int = 16, seed: int = 7):
        if decoder in ("real", "pil"):
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "STUB: PIL is not installed in this container; compressed "
                    "image formats need it. Use decoder='auto' (real PGM/PPM/"
                    "BMP numpy codecs) or 'fake' (byte reshape)."
                ) from e
        elif decoder not in ("fake", "auto"):
            raise ValueError(f"unknown decoder: {decoder}")
        self.decoder = decoder
        self.target = target
        rng = np.random.default_rng(seed)
        self.proj = rng.normal(size=(target * target, feature_dim)).astype(np.float32)

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self.decoder == "auto":
            from bioner_ray.functions.codecs import decode_image

            return decode_image(payload)
        if self.decoder in ("real", "pil"):
            import PIL.Image
            from io import BytesIO

            img = np.asarray(PIL.Image.open(BytesIO(payload)).convert("L"))
            return img
        return _fake_decode(payload or b"", width, height)

    def _resize(self, img: np.ndarray) -> np.ndarray:
        """Mean-pool resize to (target, target) — vectorized bincount."""
        h, w = img.shape
        ys = (np.arange(h) * self.target // max(h, 1)).clip(0, self.target - 1)
        xs = (np.arange(w) * self.target // max(w, 1)).clip(0, self.target - 1)
        cell = ys[:, None] * self.target + xs[None, :]
        sums = np.bincount(cell.ravel(), weights=img.ravel().astype(np.float64),
                           minlength=self.target * self.target)
        counts = np.bincount(cell.ravel(), minlength=self.target * self.target)
        counts[counts == 0] = 1
        return (sums / counts).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        payloads = batch.column("payload").to_pylist()
        ws = batch.column("width").to_pylist()
        hs = batch.column("height").to_pylist()
        feats, dws, dhs = [], [], []
        for p, w, h in zip(payloads, ws, hs):
            img = self._decode(p or b"", w, h)
            pooled = self._resize(img)
            feats.append((pooled @ self.proj).tolist())
            dhs.append(img.shape[0])
            dws.append(img.shape[1])
        return pa.table(
            {
                "media_id": ids,
                "feature": pa.array(feats, type=pa.list_(pa.float32())),
                "decoded_width": pa.array(dws, type=pa.int32()),
                "decoded_height": pa.array(dhs, type=pa.int32()),
            }
        )


def image_feature_stage(ds, concurrency: int | tuple[int, int] = 2, batch_size: int = 16,
                        **extractor_kwargs):
    """Small batches by design: payload bytes dominate block memory."""
    return ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs=extractor_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Actor-pool callable: video payload → every ``stride``-th frame as
    its own media row (flat_map-shaped expansion inside map_batches).

    ``decoder="auto"`` parses REAL YUV4MPEG2 streams (Cmono/C420 luma,
    ``functions/codecs.py``) and emits each sampled frame as a binary
    PGM payload — a real format the image stage's auto decoder reads
    directly. ``decoder="real"`` stays the import-gated ffmpeg/pyav
    seam for compressed video; ``"fake"`` slices raw bytes by the
    metadata dims."""

    def __init__(self, decoder: str = "fake", stride: int = 2):
        if decoder == "real":
            raise NotImplementedError(
                "STUB: real video codecs (ffmpeg/pyav) are not available in "
                "this container; use decoder='auto' (Y4M numpy codec) or 'fake'"
            )
        if decoder not in ("fake", "auto"):
            raise ValueError(f"unknown decoder: {decoder}")
        self.decoder = decoder
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        from bioner_ray.functions.codecs import decode_y4m, encode_pgm

        ids_out, frame_ids, payloads_out, ws_out, hs_out = [], [], [], [], []
        for mid, payload, w, h, nf in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
            batch.column("n_frames").to_pylist(),
        ):
            if self.decoder == "auto":
                frames = decode_y4m(payload or b"")
                for fi in range(0, len(frames), self.stride):
                    ids_out.append(mid)
                    frame_ids.append(fi)
                    payloads_out.append(encode_pgm(frames[fi]))
                    hs_out.append(frames.shape[1])
                    ws_out.append(frames.shape[2])
                continue
            frame_bytes = w * h
            for fi in range(0, nf, self.stride):
                chunk = (payload or b"")[fi * frame_bytes : (fi + 1) * frame_bytes]
                ids_out.append(mid)
                frame_ids.append(fi)
                payloads_out.append(chunk)
                ws_out.append(w)
                hs_out.append(h)
        return pa.table(
            {
                "media_id": pa.array(ids_out, type=pa.int64()),
                "frame_id": pa.array(frame_ids, type=pa.int32()),
                "payload": pa.array(payloads_out, type=pa.binary()),
                "width": pa.array(ws_out, type=pa.int32()),
                "height": pa.array(hs_out, type=pa.int32()),
            }
        )


def frame_sample_stage(ds, stride: int = 2, concurrency: int | tuple[int, int] = 2,
                       batch_size: int = 8, **sampler_kwargs):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"stride": stride, **sampler_kwargs},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


AUDIO_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("n_windows", pa.int32()),
        ("rms", pa.list_(pa.float32())),   # per-window root-mean-square energy
        ("zcr", pa.list_(pa.float32())),   # per-window zero-crossing rate
    ]
)


class AudioFeatureExtractor:
    """Actor-pool callable: audio payload → windowed RMS + zero-crossing
    features (the MFCC-shaped plumbing with the codec stubbed).

    ``decoder="auto"`` parses REAL RIFF/WAVE PCM (8/16-bit, any channel
    count — channels average to mono) via ``functions/codecs.py``;
    ``decoder="real"`` (soundfile/librosa, compressed formats) raises
    NotImplementedError — those wheels are absent here;
    ``decoder="fake"`` interprets the payload bytes as int8 PCM
    samples, deterministically. Feature extraction itself (windowed
    reduce over the waveform) is real numpy and identical for all
    decoders.
    """

    def __init__(self, decoder: str = "fake", window: int = 256):
        if decoder == "real":
            raise NotImplementedError(
                "STUB: real audio codecs (soundfile/librosa) are not available "
                "in this container; use decoder='auto' (WAV numpy codec) or 'fake'"
            )
        if decoder not in ("fake", "auto"):
            raise ValueError(f"unknown decoder: {decoder}")
        self.decoder = decoder
        self.window = window

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.decoder == "auto":
            from bioner_ray.functions.codecs import decode_wav

            samples, _rate = decode_wav(payload or b"")
            return (samples.astype(np.float32) / 32768.0).mean(axis=1)
        return np.frombuffer(payload or b"", dtype=np.int8).astype(np.float32) / 128.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_windows, rms_out, zcr_out = [], [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            wave = self._decode(payload)
            n = len(wave) // self.window
            w = wave[: n * self.window].reshape(n, self.window)
            rms = np.sqrt((w * w).mean(axis=1)) if n else np.zeros(0, dtype=np.float32)
            zcr = (np.signbit(w[:, 1:]) != np.signbit(w[:, :-1])).mean(axis=1) if n else np.zeros(0)
            ids.append(mid)
            n_windows.append(n)
            rms_out.append(rms.astype(np.float32).tolist())
            zcr_out.append(np.asarray(zcr, dtype=np.float32).tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "n_windows": pa.array(n_windows, type=pa.int32()),
                "rms": pa.array(rms_out, type=pa.list_(pa.float32())),
                "zcr": pa.array(zcr_out, type=pa.list_(pa.float32())),
            },
            schema=AUDIO_FEATURES_SCHEMA,
        )


def audio_feature_stage(ds, concurrency: int | tuple[int, int] = 2, batch_size: int = 16,
                        **extractor_kwargs):
    """Small batches by design: payload bytes dominate block memory."""
    return ds.map_batches(
        AudioFeatureExtractor,
        fn_constructor_kwargs=extractor_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def payload_checksum_batch(batch: pa.Table) -> pa.Table:
    """Cheap integrity/metrics map: md5 + byte length per payload,
    without ever decoding — the 'treat media as opaque bytes' invariant."""
    payloads = batch.column("payload").to_pylist()
    return pa.table(
        {
            "media_id": batch.column("media_id"),
            "n_bytes": pa.array([len(p or b"") for p in payloads], type=pa.int64()),
            "md5": pa.array(
                [hashlib.md5(p or b"").hexdigest() for p in payloads], type=pa.string()
            ),
        }
    )
