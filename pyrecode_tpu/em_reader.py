"""EM source-file readers: MRC, StreamPix SEQ, raw binary.

Capability parity with the reference ``pyrecode/em_reader.py``: the abstract
``EMReaderBase`` iteration/slicing protocol (em_reader.py:36-184), an
``MRCReader`` backed by mrcfile (em_reader.py:187-240), a ``SEQReader``
backed by pims (em_reader.py:243-304) and the ``emfile`` factory
(em_reader.py:11-34).  mrcfile/pims are optional; importing this module works
without them and the error is raised at reader construction.
"""

from __future__ import annotations

from abc import abstractmethod

import numpy as np

from .constants import rc_cfg as rc

DEFAULT_BUFFER_SIZE = 8 * 1024  # bytes


def emfile(file, file_type=None, mode="r", buffering=-1):
    """Open an EM source file by type code (0 binary / 1 MRC / 2 SEQ)."""
    if mode != "r":
        raise NotImplementedError("emfile supports only 'r' mode.")
    if file_type == rc.FILE_TYPE_MRC:
        return MRCReader(file)
    if file_type == rc.FILE_TYPE_SEQ:
        return SEQReader(file)
    if file_type == rc.FILE_TYPE_BINARY:
        raise NotImplementedError(
            "raw binary sources are read via fileutils.read_file with explicit geometry")
    raise ValueError(f"Source type {file_type!r} is not supported.")


class EMReaderBase:
    """Base class: header/shape/dtype properties, iteration, numpy-style
    slicing returning frame stacks."""

    def __init__(self, file, source_type="", fast_random_access=False,
                 buffer_size=DEFAULT_BUFFER_SIZE):
        self._source_filename = file
        self._source_type = source_type
        self._open()
        self._header = self._load_header()
        self._shape = self._get_shape()
        self._dtype = self._get_dtype()
        self.buffer_size = buffer_size
        self._fast_random_access = fast_random_access
        self._current_z = 0

    source_type = property(lambda self: self._source_type)
    shape = property(lambda self: self._shape)
    header = property(lambda self: self._header)
    dtype = property(lambda self: self._dtype)
    fast_random_access = property(lambda self: self._fast_random_access)

    @abstractmethod
    def _open(self):
        ...

    @abstractmethod
    def _load_header(self):
        ...

    @abstractmethod
    def _get_shape(self):
        ...

    @abstractmethod
    def _get_dtype(self):
        ...

    @abstractmethod
    def _get_frame(self, z_index):
        ...

    @abstractmethod
    def _get_sub_volume(self, slice_z, slice_y, slice_x):
        ...

    @abstractmethod
    def get_true_shape(self):
        ...

    @abstractmethod
    def close(self):
        ...

    @abstractmethod
    def serialize_header(self, fp):
        ...

    def __iter__(self):
        return self

    def __next__(self):
        if self._current_z >= self.shape[0]:
            raise StopIteration
        self._current_z += 1
        return self._get_frame(self._current_z - 1)

    def __getitem__(self, key):
        if isinstance(key, tuple):
            if len(key) == 3:
                return self._get_sub_volume(key[0], key[1], key[2])
            if len(key) == 2:
                return self._get_sub_volume(key[0], key[1], slice(0, self._shape[2]))
            return self._get_sub_volume(key[0], slice(0, self._shape[1]),
                                        slice(0, self._shape[2]))
        if isinstance(key, slice):
            return self._get_sub_volume(key, slice(0, self._shape[1]),
                                        slice(0, self._shape[2]))
        if isinstance(key, (int, np.integer)):
            if key >= self._shape[0]:
                raise IndexError(key)
            return self._get_frame(int(key))
        raise TypeError(type(key))

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, tb):
        self.close()

    def print_header(self):
        for field, value in self._header.items():
            print(f"{field}:\t{value}")


class MRCReader(EMReaderBase):
    """MRC/MRCS stacks via mrcfile."""

    def __init__(self, file):
        try:
            import mrcfile
        except ImportError as e:
            raise ImportError("Reading MRC files requires mrcfile to be installed") from e
        self._mrcfile = mrcfile
        super().__init__(file, "mrc", False)

    def _open(self):
        try:
            self._file_handle = self._mrcfile.open(self._source_filename, mode="r")
        except ValueError:
            self._file_handle = self._mrcfile.open(self._source_filename, mode="r",
                                                   permissive=True)
        self._stack = self._file_handle.data

    def _load_header(self):
        record = self._file_handle.header
        return {name: record[name] for name in record.dtype.names}

    def _get_shape(self):
        return (int(self._header["nz"]), int(self._header["ny"]), int(self._header["nx"]))

    def get_true_shape(self):
        return self._stack.shape

    def _get_dtype(self):
        return self._stack.dtype

    def _get_sub_volume(self, slice_z, slice_y, slice_x):
        if self._file_handle.is_single_image():
            return self._stack[np.newaxis, slice_y, slice_x]
        return self._stack[slice_z, slice_y, slice_x]

    def _get_frame(self, z_index):
        if self._file_handle.is_single_image():
            return self._stack[np.newaxis, :, :]
        return self._stack[z_index][np.newaxis, :, :]

    def close(self):
        self._file_handle.close()

    def serialize_header(self, fp):
        # the raw 1024-byte MRC header
        fp.write(self._file_handle.header.tobytes()[:1024].ljust(1024, b"\x00"))


class SEQReader(EMReaderBase):
    """StreamPix .seq stacks via pims."""

    def __init__(self, file, buffer_size=DEFAULT_BUFFER_SIZE):
        try:
            import pims
        except ImportError as e:
            raise ImportError("Reading Sequence files requires PIMS to be installed") from e
        self._pims = pims
        super().__init__(file, "seq", False, buffer_size)

    def _open(self):
        self._stack = self._pims.open(self._source_filename)
        self._is_open = True

    def _load_header(self):
        return self._stack.header_dict

    def _get_shape(self):
        h = self._stack.header_dict
        return (int(h["allocated_frames"]), int(h["height"]), int(h["width"]))

    def get_true_shape(self):
        frame = self._stack[0]
        return (len(self._stack), frame.shape[0], frame.shape[1])

    def _get_dtype(self):
        depth = self._header["bit_depth"]
        if depth == 8:
            return np.uint8
        if depth == 16:
            return np.int16
        raise TypeError(f"Sequence datasets with bit-depth {depth} are not supported.")

    def _get_frame(self, z_index):
        container = np.zeros((1, self._shape[1], self._shape[2]), dtype=self._dtype)
        container[0] = self._stack[z_index]
        return container

    def _get_sub_volume(self, slice_z, slice_y, slice_x):
        z_indices = range(*slice_z.indices(self._shape[0]))
        ny = len(range(*slice_y.indices(self._shape[1])))
        nx = len(range(*slice_x.indices(self._shape[2])))
        container = np.zeros((len(z_indices), ny, nx), dtype=self._dtype)
        for index, z in enumerate(z_indices):
            container[index] = self._stack[z][slice_y, slice_x]
        return container

    def close(self):
        self._stack.close()
        self._is_open = False

    def serialize_header(self, fp):
        # the reference serializes a 1024-byte placeholder (em_reader.py:300-304)
        fp.write(bytes(1024))
