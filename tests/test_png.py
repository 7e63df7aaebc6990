"""Pure-stdlib PNG decode: roundtrip, filter reconstruction, actor stage."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from featherstore_ray.stages.png import (
    decode_png,
    encode_png,
    resize_nearest,
    to_grayscale,
)


def _gradient(h, w, c):
    y = np.arange(h, dtype=np.uint8)[:, None, None]
    x = np.arange(w, dtype=np.uint8)[None, :, None]
    ch = np.arange(c, dtype=np.uint8)[None, None, :]
    return ((y * 3 + x * 7 + ch * 31) % 256).astype(np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    img = _gradient(13, 17, channels)
    assert (decode_png(encode_png(img)) == img).all()


def test_png_all_filter_types():
    """Hand-build IDAT rows with every filter type (0..4) and check the
    reconstruction against the spec's reference algorithm."""
    rng = np.random.default_rng(5)
    h, w, c = 5, 8, 3
    img = rng.integers(0, 256, (h, w, c)).astype(np.uint8)
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    scan = []
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prior = flat[y - 1] if y else np.zeros(stride, np.int32)
        enc = np.empty(stride, np.int32)
        for x in range(stride):
            left = cur[x - c] if x >= c else 0
            up = prior[x]
            ul = prior[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa_, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa_ <= pb and pa_ <= pc_ else (
                    up if pb <= pc_ else ul
                )
            enc[x] = (cur[x] - pred) % 256
        scan.append(bytes([f]) + enc.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", crc)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(scan)))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(png) == img).all()


def test_png_rejects_non_png_and_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png")
    # 16-bit depth IHDR
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    crc = zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", crc)
    )
    with pytest.raises(NotImplementedError):
        decode_png(png)


def test_png_decode_through_actor_stage(ray_session):
    """decoder='png' runs a REAL decode end-to-end through the actor-pool
    map_batches stage; features equal the directly computed pooling."""
    from featherstore_ray.stages.multimodal import decode_images

    imgs = [_gradient(24, 24, 3), _gradient(40, 20, 1)]
    payloads = [encode_png(i) for i in imgs]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "image": pa.array(payloads, pa.binary()),
        }
    )
    out = decode_images(
        ray.data.from_arrow(t), feat_dim=4, decoder="png"
    ).to_pandas().sort_values("doc_id")
    assert out["decode_ok"].all()
    for i, img in enumerate(imgs):
        px = resize_nearest(to_grayscale(img), (32, 32)).reshape(-1)
        exp = px.reshape(4, -1).mean(axis=1)
        got = np.asarray(out["feat"].iloc[i], dtype=np.float32)
        np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_multimodal_callable_decoder_injection(ray_session):
    """Custom decoders plug in as plain callables through the actor-pool
    constructor args (pickled once per actor)."""
    import numpy as np

    from featherstore_ray.stages.multimodal import (
        audio_features,
        decode_images,
        sample_frames,
    )

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "image": pa.array([b"aa", b"bb"], pa.binary()),
        }
    )

    def img_dec(payload: bytes) -> np.ndarray:
        return np.full(4, float(len(payload)), dtype=np.float32)

    out = decode_images(
        ray.data.from_arrow(t), feat_dim=4, decoder=img_dec
    ).to_pandas()
    assert all(np.allclose(f, 2.0) for f in out["feat"])

    def frame_dec(payload: bytes, idx: int) -> np.ndarray:
        return np.full(8, float(idx), dtype=np.float32)

    t2 = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "video": pa.array([b"vv"], pa.binary()),
        }
    )
    fr = sample_frames(
        ray.data.from_arrow(t2), num_frames=3, feat_dim=8, decoder=frame_dec
    ).to_pandas()
    assert list(fr["frame_idx"]) == [0, 1, 2]
    assert np.allclose(fr["frame_feat"].iloc[2], 2.0)

    def audio_dec(payload: bytes) -> np.ndarray:
        return np.ones((2, 4), dtype=np.float32)

    t3 = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "audio": pa.array([b"au"], pa.binary()),
        }
    )
    au = audio_features(
        ray.data.from_arrow(t3), num_windows=2, feat_dim=4, decoder=audio_dec
    ).to_pandas()
    assert np.allclose(au["audio_feat"].iloc[0], 1.0)


def test_wav_decode_through_actor_stage(ray_session):
    import io
    import wave

    from featherstore_ray.stages.multimodal import audio_features

    def make_wav(amp: float, hz: float = 440.0, sec: float = 0.5) -> bytes:
        sr = 8000
        t = np.arange(int(sr * sec)) / sr
        x = (amp * 32767 * np.sin(2 * np.pi * hz * t)).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(x.tobytes())
        return buf.getvalue()

    quiet, loud = make_wav(0.1), make_wav(0.8)
    t = pa.table(
        {
            "sid": pa.array([0, 1, 2], pa.int64()),
            "audio": pa.array([quiet, loud, None], pa.binary()),
        }
    )
    out = (
        audio_features(
            ray.data.from_arrow(t), num_windows=4, feat_dim=4, decoder="wav"
        )
        .to_pandas().sort_values("sid").reset_index(drop=True)
    )
    f_quiet = np.array(out["audio_feat"].iloc[0])
    f_loud = np.array(out["audio_feat"].iloc[1])
    # RMS of a sine at amp a is a/sqrt(2); windows are uniform
    assert np.allclose(f_quiet, 0.1 / np.sqrt(2), atol=0.01)
    assert np.allclose(f_loud, 0.8 / np.sqrt(2), atol=0.05)
    assert (f_loud > f_quiet * 5).all()
    assert out["n_windows"].tolist() == [4, 4, 0]
    assert np.allclose(out["audio_feat"].iloc[2], 0.0)  # null payload
    # deterministic across runs
    out2 = (
        audio_features(
            ray.data.from_arrow(t), num_windows=4, feat_dim=4, decoder="wav"
        )
        .to_pandas().sort_values("sid").reset_index(drop=True)
    )
    assert np.array_equal(
        np.concatenate(out["audio_feat"].to_numpy()),
        np.concatenate(out2["audio_feat"].to_numpy()),
    )


def test_image_resize_stage_real_png(ray_session):
    from featherstore_ray.stages.multimodal import resize_images

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
            for _ in range(6)]
    payloads = [encode_png(i) for i in imgs] + [None]
    t = pa.table({
        "img_id": list(range(7)),
        "image": pa.array(payloads, pa.binary()),
    })
    # consume as Arrow: a null row in a uniform-length list column trips
    # Ray's pandas tensor-extension cast (the stage is arrow-native anyway)
    batches = list(
        resize_images(ray.data.from_arrow(t).repartition(2),
                      out_hw=(4, 5), decoder="png", batch_size=3)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    out = pa.concat_tables(batches)
    order = np.argsort(out["img_id"].to_numpy(zero_copy_only=False))
    pixels = out["pixels"].to_pylist()
    assert set(out["height"].to_pylist()) == {4}
    assert set(out["width"].to_pylist()) == {5}
    by_id = {out["img_id"][int(i)].as_py(): pixels[int(i)] for i in order}
    for i, img in enumerate(imgs):
        gray = to_grayscale(img)
        # out_hw=(4, 5) = 4 rows x 5 cols; resize_nearest takes (w, h)
        want = resize_nearest(gray, (5, 4)).astype(np.float32)
        assert want.shape == (4, 5)
        np.testing.assert_allclose(
            np.asarray(by_id[i], dtype=np.float32), want.reshape(-1), atol=0)
    assert by_id[6] is None


def test_dhash_near_dups_exact_vs_brute_force(ray_session):
    """Pigeonhole banding is a COMPLETE candidate cover: the banded +
    first-equal-band-deduped pair set must equal all-pairs Hamming <= t."""
    import itertools

    from featherstore_ray.stages.multimodal import (
        _popcount64, dhash_images, dhash_near_dups)

    def synth(i):
        base = i % 12
        r, c = np.meshgrid(np.arange(20), np.arange(20), indexing="ij")
        px = ((r * 7 + c * 13 + base * 31) % 251).astype(np.uint8)
        v = i // 12
        if v:  # perturb one pixel -> near dup of its base image
            px = px.copy()
            px[(v * 3) % 20, (v * 5) % 20] = (
                int(px[(v * 3) % 20, (v * 5) % 20]) + 120) % 251
        return np.stack([px, px, px], axis=2)

    n = 72
    payloads = [encode_png(synth(i)) for i in range(n)]
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "image": pa.array(payloads, pa.binary())})
    out = (
        dhash_near_dups(ray.data.from_arrow(t).repartition(5),
                        max_hamming=3, num_buckets=16)
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    hd = dhash_images(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert hd["dhash_ok"].all()
    hs = hd["dhash"].to_numpy().astype(np.uint64)
    ref = sorted(
        (a, b, int(_popcount64(np.array([hs[a] ^ hs[b]], np.uint64))[0]))
        for a, b in itertools.combinations(range(n), 2)
        if int(_popcount64(np.array([hs[a] ^ hs[b]], np.uint64))[0]) <= 3
    )
    got = sorted(out.itertuples(index=False, name=None))
    assert got == ref
    assert len(ref) > 0  # the corpus actually contains near dups


def test_dhash_null_payloads_and_precomputed(ray_session):
    from featherstore_ray.stages.multimodal import dhash_images, dhash_near_dups

    img = np.full((12, 12, 3), 128, dtype=np.uint8)
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "image": pa.array([encode_png(img), None, encode_png(img)],
                          pa.binary()),
    })
    hd = dhash_images(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert list(hd["dhash_ok"]) == [True, False, True]
    # identical images -> hamming 0 pair; null payload dropped
    pairs = dhash_near_dups(
        ray.data.from_arrow(t), max_hamming=0, num_buckets=4
    ).to_pandas()
    assert list(pairs.itertuples(index=False, name=None)) == [(0, 2, 0)]
    # precomputed-hash path gives the same answer
    hs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 2], pa.int64()),
        "dhash": pa.array(hd["dhash"].dropna().astype("uint64").to_numpy(),
                          pa.uint64()),
    }))
    pairs2 = dhash_near_dups(hs, hashes_precomputed=True, max_hamming=0,
                             num_buckets=4).to_pandas()
    assert list(pairs2.itertuples(index=False, name=None)) == [(0, 2, 0)]
