"""Streaming history IO: non-blocking snapshot persistence for long runs.

The reference holds its entire run history in RAM and writes nothing
(``raytracer.py:124-136``).  At production scale a dense history does not
fit (1e6 rays ≈ 50 MB/frame), so the framework streams decimated snapshots
to disk *while the device computes the next chunk*.  The hot path is a
native C++ writer (``native/history_writer.cc``: bounded queue drained by a
background thread, loaded via ctypes — no pybind11 needed); a pure-Python
fallback keeps the feature available when the shared library isn't built.

File format "MSGW" v1: 16-byte header (magic ``MSGW``, u32 version, u64
record_bytes), then fixed-size records back to back.
"""

from __future__ import annotations

import ctypes
import json
import os
import struct
import subprocess
import threading
import queue as _queue
from typing import Optional

import numpy as np

_MAGIC = b"MSGW"
_HEADER = struct.Struct("<4sIQ")

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmsgwam_io.so")
_lib = None
_lib_lock = threading.Lock()


def _load_native() -> Optional[ctypes.CDLL]:
    """Load (building on first use if needed) the native writer library."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR], check=True,
                    capture_output=True, timeout=120,
                )
            except Exception:
                _lib = False
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib = False
            return None
        lib.msgwam_writer_open.restype = ctypes.c_void_p
        lib.msgwam_writer_open.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
        ]
        lib.msgwam_writer_push.restype = ctypes.c_int
        lib.msgwam_writer_push.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
        ]
        lib.msgwam_writer_pending.restype = ctypes.c_uint64
        lib.msgwam_writer_pending.argtypes = [ctypes.c_void_p]
        lib.msgwam_writer_close.restype = ctypes.c_int64
        lib.msgwam_writer_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


class HistoryWriter:
    """Append fixed-size float32/float64 records asynchronously.

    >>> w = HistoryWriter(path, record_shape=(2, 100), dtype=np.float32)
    >>> w.push(snapshot)        # returns immediately (bounded queue)
    >>> w.close()
    """

    def __init__(self, path, record_shape, dtype=np.float32,
                 max_queue: int = 16, native: Optional[bool] = None):
        self.path = str(path)
        self.record_shape = tuple(int(s) for s in record_shape)
        self.dtype = np.dtype(dtype)
        self.record_bytes = int(np.prod(self.record_shape)) * self.dtype.itemsize
        self._closed = False
        self._count = 0

        lib = _load_native() if native in (None, True) else None
        if native is True and lib is None:
            raise RuntimeError("native history writer unavailable")
        self._lib = lib
        if lib is not None:
            self._handle = lib.msgwam_writer_open(
                self.path.encode(), self.record_bytes, max_queue
            )
            if not self._handle:
                raise OSError(f"cannot open {self.path}")
        else:
            # pure-Python fallback: same protocol, a daemon writer thread
            self._fh = open(self.path, "wb")
            self._fh.write(_HEADER.pack(_MAGIC, 1, self.record_bytes))
            self._q: _queue.Queue = _queue.Queue(maxsize=max_queue)
            self._thread = threading.Thread(target=self._drain, daemon=True)
            self._thread.start()

        # sidecar metadata so readers can reconstruct shapes/dtypes
        with open(self.path + ".json", "w") as f:
            json.dump(
                {"record_shape": self.record_shape, "dtype": self.dtype.name},
                f,
            )

    def _drain(self):
        while True:
            rec = self._q.get()
            if rec is None:
                return
            self._fh.write(rec)

    def push(self, record) -> None:
        if self._closed:
            raise ValueError("writer closed")
        arr = np.ascontiguousarray(record, dtype=self.dtype)
        if arr.nbytes != self.record_bytes:
            raise ValueError(
                f"record has {arr.nbytes} bytes, expected {self.record_bytes}"
            )
        if self._lib is not None:
            rc = self._lib.msgwam_writer_push(
                self._handle, arr.ctypes.data_as(ctypes.c_void_p), arr.nbytes
            )
            if rc != 0:
                raise OSError("native writer failed")
        else:
            self._q.put(arr.tobytes())
        self._count += 1

    @property
    def pending(self) -> int:
        if self._closed:
            return 0
        if self._lib is not None:
            return int(self._lib.msgwam_writer_pending(self._handle))
        return self._q.qsize()

    def close(self) -> int:
        if self._closed:
            return self._count
        self._closed = True
        if self._lib is not None:
            written = int(self._lib.msgwam_writer_close(self._handle))
            if written < 0:
                raise OSError("native writer IO error")
        else:
            self._q.put(None)
            self._thread.join()
            self._fh.close()
            written = self._count
        return written

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_history(path):
    """Read back a streamed history file -> (n_records, *record_shape)."""
    with open(str(path) + ".json") as f:
        meta = json.load(f)
    shape = tuple(meta["record_shape"])
    dtype = np.dtype(meta["dtype"])
    with open(path, "rb") as f:
        magic, version, record_bytes = _HEADER.unpack(f.read(_HEADER.size))
        if magic != _MAGIC or version != 1:
            raise ValueError("not a MSGW v1 history file")
        payload = f.read()
    n = len(payload) // record_bytes
    flat = np.frombuffer(payload[: n * record_bytes], dtype=dtype)
    return flat.reshape((n,) + shape)
