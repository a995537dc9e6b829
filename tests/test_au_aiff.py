"""Sun AU + AIFF containers (`functions/au.py`, `functions/aiff.py`):
cross-container bit-identity with the WAV decoder (the javax.sound
container set), 80-bit extended rate parsing, tolerance, typed errors,
and the cross-container planted pairs in the audio dup fixture."""

import struct

import numpy as np
import pytest

from multimedia_indexing_ray.functions.aiff import (
    AiffError,
    _extended80,
    _parse_extended80,
    decode_aiff,
    encode_aiff,
    is_aiff,
)
from multimedia_indexing_ray.functions.au import (
    AuError,
    decode_au,
    encode_au,
    is_au,
)
from multimedia_indexing_ray.functions.wav import decode_wav, encode_wav
from multimedia_indexing_ray.stages.multimodal import _synth_pcm


def test_au_pcm16_bit_identical_to_wav():
    x = _synth_pcm(4000, seed=3)
    ref, _, _ = decode_wav(encode_wav(x))
    y, rate, warns = decode_au(encode_au(x))
    assert warns == [] and rate == 16000
    np.testing.assert_array_equal(y.view(np.uint32), ref.view(np.uint32))


@pytest.mark.parametrize("codec", ["mulaw", "alaw"])
def test_au_g711_bit_identical_to_wav_g711(codec):
    x = _synth_pcm(4000, seed=4)
    yw, _, _ = decode_wav(encode_wav(x, codec=codec))
    ya, _, _ = decode_au(encode_au(x, codec=codec))
    np.testing.assert_array_equal(ya.view(np.uint32), yw.view(np.uint32))


def test_au_pcm8_signed_and_annotation():
    # hand-built encoding-2 (signed PCM8) payload
    data = np.array([-128, -1, 0, 1, 127], dtype=np.int8).tobytes()
    pay = b".snd" + struct.pack(">IIIII", 24, len(data), 2, 8000, 1) + data
    y, rate, warns = decode_au(pay)
    assert rate == 8000 and warns == []
    np.testing.assert_allclose(y, np.array([-1.0, -1 / 128, 0, 1 / 128, 127 / 128],
                                           np.float32))
    x = _synth_pcm(1000, seed=5)
    a, b = encode_au(x), encode_au(x, annotation=b"encoder=b copy")
    assert a != b
    np.testing.assert_array_equal(decode_au(a)[0], decode_au(b)[0])


def test_aiff_pcm16_bit_identical_to_wav_incl_stereo_downmix():
    mono = _synth_pcm(4000, seed=6)
    stereo = _synth_pcm(4000, seed=6, stereo=True)
    for x in (mono, stereo):
        ref, _, _ = decode_wav(encode_wav(x))
        y, rate, warns = decode_aiff(encode_aiff(x))
        assert warns == [] and rate == 16000
        np.testing.assert_array_equal(y.view(np.uint32), ref.view(np.uint32))


def test_extended80_rate_roundtrip():
    for r in (8000, 11025, 16000, 22050, 44100, 48000, 96000):
        assert abs(_parse_extended80(_extended80(float(r))) - r) < 1e-6


def test_tolerance_and_typed_errors():
    x = _synth_pcm(3000, seed=7)
    a = encode_au(x)
    y, _, w = decode_au(a[:-100])
    assert "truncated_data" in w and len(y) < 3000
    with pytest.raises(AuError):
        decode_au(a[:-100], tolerant=False)
    with pytest.raises(AuError, match="bad_magic"):
        decode_au(b"JUNK" + a[4:])
    bad = bytearray(a)
    struct.pack_into(">I", bad, 12, 99)  # unknown encoding
    with pytest.raises(AuError, match="unsupported_encoding"):
        decode_au(bytes(bad))

    f = encode_aiff(x)
    y2, _, w2 = decode_aiff(f[:-100])
    assert w2 and len(y2) < 3000
    with pytest.raises(AiffError, match="bad_magic"):
        decode_aiff(b"RIFF" + f[4:])
    # AIFF missing COMM
    no_comm = f[:12] + f[12:].replace(b"COMM", b"XXXX", 1)
    with pytest.raises(AiffError, match="no_comm_chunk"):
        decode_aiff(no_comm)
    assert is_au(a) and not is_au(f) and is_aiff(f) and not is_aiff(a)


def test_dup_fixture_cross_container_pairs():
    from multimedia_indexing_ray.stages.multimodal import synthetic_dup_wav_table

    tbl = synthetic_dup_wav_table(8, seed=19)
    payloads = tbl["payload"].to_pylist()
    # dup rows 8+i for i%4 != 2 live in a DIFFERENT container
    assert payloads[8 + 0][:4] == b"FORM"  # stereo pcm -> AIFF
    assert payloads[8 + 1][:4] == b".snd"  # mulaw -> AU
    assert payloads[8 + 3][:4] == b".snd"  # alaw -> AU
    assert payloads[8 + 2][:4] == b"RIFF"  # adpcm stays WAV
    for i in range(8):
        def _dec(p):
            if p[:4] == b"FORM":
                return decode_aiff(p)[0]
            if p[:4] == b".snd":
                return decode_au(p)[0]
            return decode_wav(p)[0]
        a, b = _dec(payloads[i]), _dec(payloads[8 + i])
        np.testing.assert_array_equal(a.view(np.uint32), b.view(np.uint32))
