"""Entropy backend registry tests."""

import numpy as np
import pytest

from pyrecode_tpu import codecs


def _blob(n=4096, seed=0):
    rng = np.random.default_rng(seed)
    # compressible: sparse bytes
    b = rng.integers(0, 255, size=n).astype(np.uint8)
    b[rng.random(n) > 0.1] = 0
    return b.tobytes()


def test_zlib_roundtrip():
    data = _blob()
    c = codecs.compress(0, 1, data)
    assert codecs.de_compress(0, c) == data
    assert len(c) < len(data)


def test_zstd_roundtrip_with_context():
    from pyrecode_tpu.codecs.backends import make_compressor_context, make_decompressor_context

    data = _blob(seed=1)
    cctx = make_compressor_context(1, 3)
    dctx = make_decompressor_context(1)
    c = codecs.compress(1, 3, data, cctx)
    assert codecs.de_compress(1, c, dctx) == data


def test_zstd_stream_omits_content_size():
    """write_content_size=False (reference recode_writer.py:175-179) means the
    frame size must be recoverable without the stream header knowing it."""
    data = _blob(seed=2)
    codec = codecs.get_codec(1, 1)
    assert codec.decompress(codec.compress(data)) == data


@pytest.mark.parametrize("scheme", [4, 5])
def test_std_lib_schemes(scheme):
    data = _blob(seed=scheme)
    c = codecs.compress(scheme, 1, data)
    assert codecs.de_compress(scheme, c) == data


def test_all_available_schemes_roundtrip():
    data = _blob(seed=9)
    for scheme in codecs.available_schemes():
        codec = codecs.get_codec(scheme, 1)
        assert codec.decompress(codec.compress(data)) == data, scheme


def test_every_scheme_code_executes():
    """All 12 reference scheme codes plus the tpu-rans extension (12) must
    round-trip (pure-python fallbacks serve lz4/snappy/blosc when the C
    bindings are absent)."""
    assert codecs.available_schemes() == list(range(13))
    data = _blob(seed=11)
    for scheme in range(13):
        codec = codecs.get_codec(scheme, 1)
        assert codec.decompress(codec.compress(data)) == data, scheme


def test_purepy_lz4_snappy_formats():
    """Format-level checks of the fallbacks against spec test vectors."""
    from pyrecode_tpu.codecs import purepy

    # xxh32 known-answer vectors (seed 0)
    assert purepy.xxh32(b"") == 0x02CC5D05
    assert purepy.xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F

    rng = np.random.default_rng(4)
    streams = [b"", b"a", b"abcabcabcabcabcabc" * 100,
               (rng.integers(0, 8, 20000) * (rng.random(20000) < 0.2)
                ).astype(np.uint8).tobytes(),
               bytes(rng.integers(0, 256, 5000).astype(np.uint8))]
    for s in streams:
        assert purepy.lz4_frame_decompress(purepy.lz4_frame_compress(s)) == s
        assert purepy.snappy_decompress(purepy.snappy_compress(s)) == s
        assert purepy.blosc_decompress(purepy.blosc_compress(s)) == s
    # the repetitive streams actually compress
    rep = b"abcabcabcabcabcabc" * 100
    assert len(purepy.lz4_frame_compress(rep)) < len(rep) // 4
    assert len(purepy.snappy_compress(rep)) < len(rep) // 4


def test_import_checks_ok():
    assert codecs.import_checks({"compression_scheme": 0})
