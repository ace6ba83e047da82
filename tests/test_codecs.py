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


def test_unavailable_scheme_raises():
    from pyrecode_tpu.codecs import backends

    missing = [s for s in range(12) if s not in codecs.available_schemes()]
    for scheme in missing:
        with pytest.raises(ImportError):
            codecs.get_codec(scheme)
        with pytest.raises(ImportError):
            codecs.import_checks({"compression_scheme": scheme})


def test_import_checks_ok():
    assert codecs.import_checks({"compression_scheme": 0})
