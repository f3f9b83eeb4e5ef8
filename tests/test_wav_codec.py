"""The WAV codec behind multimodal_audio_features is REAL: the writer
emits containers the stdlib ``wave`` module accepts, and the parser
decodes containers the stdlib ``wave`` module writes — including
16-bit PCM and odd-length (word-padded) chunks this repo's own
encoder never produces."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from kawa_spark.queries.llm_multimodal import _wav_decode, _wav_encode


def test_encoder_output_is_stdlib_readable():
    pcm = bytes(range(256)) * 3
    buf = _wav_encode(pcm, sample_rate=8000, bits=8)
    with wave.open(io.BytesIO(buf)) as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 1
        assert w.getframerate() == 8000
        assert w.readframes(w.getnframes()) == pcm


def test_decoder_reads_stdlib_written_16bit():
    samples = np.arange(-500, 500, 7, dtype=np.int16)
    out = io.BytesIO()
    with wave.open(out, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(samples.tobytes())
    dec = _wav_decode(out.getvalue())
    assert dec["sample_rate"] == 44100
    assert dec["bits"] == 16
    assert dec["n_channels"] == 1
    np.testing.assert_array_equal(dec["samples"], samples.astype(np.float64))


def test_roundtrip_8bit_centering():
    pcm = bytes([0, 127, 128, 129, 255])
    dec = _wav_decode(_wav_encode(pcm))
    np.testing.assert_array_equal(
        dec["samples"], np.array([-128.0, -1.0, 0.0, 1.0, 127.0])
    )


def test_decoder_walks_extra_and_odd_chunks():
    """Real WAV files carry LIST/INFO chunks before data, and RIFF
    chunks are word-aligned (odd-sized bodies get a pad byte). The
    parser must skip both correctly."""
    pcm = bytes([10, 200, 130])
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
    odd_junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    data = b"data" + struct.pack("<I", len(pcm)) + pcm + b"\x00"
    body = fmt + odd_junk + data
    buf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    dec = _wav_decode(buf)
    np.testing.assert_array_equal(
        dec["samples"], np.array([10.0, 200.0, 130.0]) - 128.0
    )


def test_decoder_rejects_garbage():
    with pytest.raises(ValueError, match="RIFF"):
        _wav_decode(b"not a wav at all")
    with pytest.raises(ValueError, match="non-PCM"):
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
        data = b"data" + struct.pack("<I", 0)
        body = fmt + data
        _wav_decode(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)


def test_encoder_pads_odd_data_chunk():
    """RIFF requires word-aligned chunks: an odd-length data chunk
    gets a trailing pad byte NOT counted in its declared size, and
    the RIFF size counts it (ADVICE r6). The container must stay
    stdlib-readable and total length even."""
    pcm = bytes([1, 2, 3])  # odd length
    buf = _wav_encode(pcm)
    assert len(buf) % 2 == 0
    declared_riff = struct.unpack("<I", buf[4:8])[0]
    assert declared_riff == len(buf) - 8  # pad inside the RIFF size
    # data chunk declares n=3 but carries 4 bytes (3 + pad)
    i = buf.index(b"data")
    assert struct.unpack("<I", buf[i + 4:i + 8])[0] == 3
    assert buf[i + 8:] == pcm + b"\x00"
    with wave.open(io.BytesIO(buf)) as w:
        assert w.readframes(w.getnframes()) == pcm
    # the repo's own parser walks it too
    dec = _wav_decode(buf)
    assert dec["samples"].size == 3
