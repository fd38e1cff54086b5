"""Vendored pure-Python GIF codec: spec-conformance and real-decode tests.

The video verse of the PNG/WAV playbook: genuine animated GIF89a
containers are encoded and decoded with stdlib-only code
(operators/gif.py), so the real video path — container-metadata frame
counts, sampled-frame LZW decode — executes in this dependency-locked
container instead of living behind an ffmpeg import that never runs.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_ingestion_bra_spark.operators import gif, multimodal


def _frames(w: int, h: int, nf: int, seed: int) -> list[bytes]:
    return [
        bytes((seed * 31 + f * 17 + j * 7) % 16 for j in range(w * h))
        for f in range(nf)
    ]


PAL16 = [(k * 17, k * 17, k * 17) for k in range(16)]


@pytest.mark.parametrize("nf", [1, 3, 8])
def test_roundtrip_animated(nf):
    w, h = 7, 5
    frames = _frames(w, h, nf, seed=nf)
    payload = gif.encode_gif(w, h, frames, PAL16, delays_cs=[4] * nf)
    assert payload[:6] == b"GIF89a" and payload[-1] == 0x3B
    meta, palette, decoded = gif.decode_gif(payload)
    assert (meta.width, meta.height, meta.n_frames) == (w, h, nf)
    assert meta.total_delay_cs == 4 * nf and meta.n_colors == 16
    assert [f.pixels for f in decoded] == frames
    assert palette[:3] == bytes((0, 0, 0)) and palette[45:48] == bytes((255,) * 3)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 16),
    nf=st.integers(1, 6),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_property(w, h, nf, seed):
    frames = _frames(w, h, nf, seed=seed)
    meta, _, decoded = gif.decode_gif(gif.encode_gif(w, h, frames, PAL16))
    assert (meta.width, meta.height, meta.n_frames) == (w, h, nf)
    assert [f.pixels for f in decoded] == frames


def test_lzw_table_overflow_clear_path():
    """A high-entropy buffer overflows the 4096-entry LZW table; the
    encoder must emit a clear code and the decoder must follow the reset."""
    import random

    rng = random.Random(11)
    data = bytes(rng.randrange(256) for _ in range(50_000))
    assert gif.lzw_decode(gif.lzw_encode(data, 8), 8) == data


def test_meta_parse_without_decode(monkeypatch):
    """parse_gif_meta must NEVER touch LZW decompression — that is the
    whole point of the metadata path at 100 TB."""
    payload = gif.encode_gif(5, 4, _frames(5, 4, 6, seed=3), PAL16, delays_cs=[7] * 6)
    calls = []
    monkeypatch.setattr(
        gif, "lzw_decode", lambda *a, **k: calls.append(1) or b""
    )
    m = gif.parse_gif_meta(payload)
    assert (m.width, m.height, m.n_frames, m.total_delay_cs) == (5, 4, 6, 42)
    assert calls == []


def test_sampled_decode_skips_unsampled_frames(monkeypatch):
    """decode_gif_frames must decompress exactly |indices| streams."""
    frames = _frames(6, 6, 8, seed=5)
    payload = gif.encode_gif(6, 6, frames, PAL16)
    real = gif.lzw_decode
    calls = []

    def counting(stream, mcs, **kw):
        calls.append(1)
        return real(stream, mcs, **kw)

    monkeypatch.setattr(gif, "lzw_decode", counting)
    meta, _, out = gif.decode_gif_frames(payload, {0, 3, 7})
    assert len(calls) == 3
    assert [f.index for f in out] == [0, 3, 7]
    assert [f.pixels for f in out] == [frames[0], frames[3], frames[7]]
    assert meta.n_frames == 8


def test_decode_rejects_corruption():
    payload = bytearray(gif.encode_gif(4, 4, _frames(4, 4, 2, seed=1), PAL16))
    with pytest.raises(ValueError, match="signature"):
        gif.decode_gif(b"JIF87a" + bytes(payload[6:]))
    with pytest.raises(ValueError, match="truncated|trailer"):
        gif.decode_gif(bytes(payload[:-1]))
    with pytest.raises(ValueError, match="truncated|trailer|marker|LZW|corrupt"):
        gif.decode_gif(bytes(payload[:30]))


def test_decode_rejects_out_of_scope():
    """Interlaced frames are declared unsupported — refused, not misread."""
    payload = bytearray(gif.encode_gif(4, 4, _frames(4, 4, 1, seed=2), PAL16))
    # image descriptor packed byte lives 9 bytes before the min-code-size;
    # find the 0x2C introducer after the 13-byte header + 48-byte GCT
    idx = bytes(payload).index(b"\x2c", 13 + 48)
    payload[idx + 9] |= 0x40  # set the interlace flag
    with pytest.raises(ValueError, match="interlaced"):
        gif.decode_gif(bytes(payload))


def test_encoder_rejects_bad_inputs():
    with pytest.raises(ValueError, match="power of two"):
        gif.encode_gif(2, 2, [bytes(4)], [(0, 0, 0)] * 3)
    with pytest.raises(ValueError, match="at least one frame"):
        gif.encode_gif(2, 2, [], PAL16)
    with pytest.raises(ValueError, match="width\\*height"):
        gif.encode_gif(2, 2, [bytes(3)], PAL16)


def test_gif_video_meta_spark(spark):
    """Real container metadata through the mapInPandas contract."""
    ids = [0, 7, 23]
    df = multimodal.synthesize_gif(
        spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    )
    rows = {r["doc_id"]: r for r in multimodal.gif_video_meta(df).collect()}
    for i in ids:
        w, h, nf, delay = multimodal._synth_gif_params(i)
        r = rows[i]
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf)
        assert r["duration_ms"] == nf * delay * 10


def test_gif_frame_features_spark(spark):
    """Sampled-frame decode through mapInPandas: every 2nd frame, features
    hand-recomputed from the synthetic pixel formula."""
    doc_id = 13
    df = multimodal.synthesize_gif(
        spark.createDataFrame([(doc_id,)], "doc_id bigint")
    )
    rows = multimodal.gif_frame_features(df, every_n=2).collect()
    w, h, nf, _ = multimodal._synth_gif_params(doc_id)
    assert [r["frame_idx"] for r in rows] == list(range(0, nf, 2))
    for r in rows:
        f = r["frame_idx"]
        gray = [((doc_id * 31 + f * 17 + j * 7) % 16) * 17 for j in range(w * h)]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert r["mean_intensity_e6"] == sum(gray) * 1_000_000 // (w * h * 255)


@pytest.mark.skipif(
    not pytest.importorskip("importlib").util.find_spec("PIL"),
    reason="Pillow not installed",
)
def test_vendored_codec_matches_pil():
    """When Pillow IS present, its decode of our encoder's output must
    agree frame-for-frame — spec conformance vs the reference library."""
    import io

    from PIL import Image

    w, h, nf = 9, 6, 4
    frames = _frames(w, h, nf, seed=8)
    data = gif.encode_gif(w, h, frames, PAL16, delays_cs=[5] * nf)
    with Image.open(io.BytesIO(data)) as img:
        assert img.size == (w, h)
        assert getattr(img, "n_frames", 1) == nf
        for f in range(nf):
            img.seek(f)
            assert img.convert("P").tobytes() == frames[f]


def test_gif_frame_thumbnails_spark(spark):
    """Thumbnail round trip: features must equal the hand-computed NN
    sample of the synthetic source frames, proving decode → resample →
    re-encode → re-decode all ran."""
    doc_id = 21
    df = multimodal.synthesize_gif(
        spark.createDataFrame([(doc_id,)], "doc_id bigint")
    )
    rows = multimodal.gif_frame_thumbnails(df, width=6, height=5, every_n=2).collect()
    w, h, nf, _ = multimodal._synth_gif_params(doc_id)
    assert [r["frame_idx"] for r in rows] == list(range(0, nf, 2))
    for r in rows:
        f = r["frame_idx"]
        want = []
        for ty in range(5):
            sy = ty * h // 5
            for tx in range(6):
                sx = tx * w // 6
                j = sy * w + sx
                want.append(((doc_id * 31 + f * 17 + j * 7) % 16) * 17)
        assert (r["width"], r["height"], r["n_pixels"]) == (6, 5, 30)
        assert r["mean_intensity_e6"] == sum(want) * 1_000_000 // (30 * 255)


@settings(max_examples=150, deadline=None)
@given(
    op=st.integers(0, 2),
    pos=st.integers(0, 10_000),
    byte=st.integers(0, 255),
    n_junk=st.integers(1, 20),
)
def test_decoder_contract_under_corruption(op, pos, byte, n_junk):
    """ANY corruption — truncation, byte flip, junk insertion — must either
    decode or raise ValueError; struct.error/IndexError never leak (the
    decoder failure contract, fuzz-pinned)."""
    payload = gif.encode_gif(
        6, 5, _frames(6, 5, 3, seed=9), PAL16, delays_cs=[4] * 3
    )
    b = bytearray(payload)
    if op == 0:
        b = b[: 1 + pos % (len(b) - 1)]
    elif op == 1:
        b[pos % len(b)] = byte
    else:
        i = pos % len(b)
        b = b[:i] + bytes([byte] * n_junk) + b[i:]
    for fn in (gif.decode_gif, gif.parse_gif_meta):
        try:
            fn(bytes(b))
        except ValueError:
            pass
