"""Entropy backend registry (compression scheme codes 0-11).

Capability parity with the reference ``pyrecode/recode_compressors.py``:
scheme codes 0 zlib, 1 zstd, 2 lz4, 3 snappy, 4 bz2, 5 lzma, 6-11 blosc x
{zlib, zstd, lz4, snappy, blosclz, lz4hc} with bit-shuffle
(recode_compressors.py:103-118).  Imports are lazy with an availability table
(recode_compressors.py:7-37) and ``import_checks`` raises on read when the
required backend is missing (recode_compressors.py:123-129).

The compressed byte streams are produced by the same underlying libraries as
the reference, so containers are bit-compatible per scheme.  ``compress`` and
``de_compress`` keep the reference call signatures; the class-based
``get_codec`` API is the idiomatic entry point for new code.
"""

from .backends import (
    Codec,
    available_schemes,
    compress,
    de_compress,
    get_codec,
    import_checks,
    scheme_name,
)

__all__ = [
    "Codec",
    "available_schemes",
    "compress",
    "de_compress",
    "get_codec",
    "import_checks",
    "scheme_name",
]
