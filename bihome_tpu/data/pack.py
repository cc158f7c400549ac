"""Image pack (.bhpk) writer + native reader bindings.

The native runtime's input pipeline (native/pack_reader.cc): all images of a
split live in one contiguous uint8 pack that C++ mmaps; batch gather is a
parallel memcpy and epochs are prefetched through a ring of preallocated
buffers. This replaces the reference's DataLoader(num_workers=8) host stack
(ref: train.py:80-281) for the streaming feed.

Pack format v1 (little-endian):
    0: b'BHPK'  4: u32 version=1  8: u64 count
    16: u32 height  20: u32 width  24: u32 channels  28: u32 reserved
    32: count*H*W*C uint8, image-major

The writer is Python (numpy.tofile — write speed is irrelevant, it runs once
offline); the reader is the C++ library, built on demand via native/Makefile.
A pure-numpy mmap fallback keeps everything working where no toolchain
exists.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

_MAGIC = b'BHPK'
_HEADER = struct.Struct('<4sIQIIII')   # magic, version, count, H, W, C, rsvd
HEADER_BYTES = _HEADER.size
assert HEADER_BYTES == 32

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libbihome_io.so')
_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def write_pack(path: str, images) -> None:
    """Write an iterable of [H,W,C] uint8 images (all same shape) as .bhpk."""
    it = iter(images)
    try:
        first = np.ascontiguousarray(next(it), dtype=np.uint8)
    except StopIteration:
        raise ValueError('cannot write an empty pack')
    if first.ndim == 2:
        first = first[..., None]
    h, w, c = first.shape
    count = 0
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(_HEADER.pack(_MAGIC, 1, 0, h, w, c, 0))
        for img in [first] + list(it):
            img = np.ascontiguousarray(img, dtype=np.uint8)
            if img.ndim == 2:
                img = img[..., None]
            if img.shape != (h, w, c):
                raise ValueError(
                    f'image {count} shape {img.shape} != {(h, w, c)}')
            img.tofile(f)
            count += 1
        f.seek(0)
        f.write(_HEADER.pack(_MAGIC, 1, count, h, w, c, 0))
    os.replace(tmp, path)


def _build_native() -> Optional[ctypes.CDLL]:
    """Build (if needed) and dlopen the native reader; None on failure."""
    global _lib, _lib_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _lib_failed:
            return None
        src = os.path.join(_NATIVE_DIR, 'pack_reader.cc')
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
                subprocess.run(['make', '-C', _NATIVE_DIR],
                               check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
        except (OSError, subprocess.SubprocessError):
            _lib_failed = True
            return None
        lib.bhpk_open.restype = ctypes.c_void_p
        lib.bhpk_open.argtypes = [ctypes.c_char_p]
        lib.bhpk_close.argtypes = [ctypes.c_void_p]
        lib.bhpk_count.restype = ctypes.c_int64
        lib.bhpk_count.argtypes = [ctypes.c_void_p]
        for name in ('bhpk_height', 'bhpk_width', 'bhpk_channels'):
            getattr(lib, name).restype = ctypes.c_int32
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.bhpk_gather.restype = ctypes.c_int
        lib.bhpk_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.bhpk_epoch_start.restype = ctypes.c_void_p
        lib.bhpk_epoch_start.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int]
        lib.bhpk_epoch_next.restype = ctypes.c_int
        lib.bhpk_epoch_next.argtypes = [ctypes.c_void_p,
                                        ctypes.POINTER(ctypes.c_uint8)]
        lib.bhpk_epoch_finish.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _build_native() is not None


class PackDataset:
    """A .bhpk pack as a dataset (load_image API, same as ImageFolderDataset).

    Uses the native mmap reader when the toolchain allows, else a numpy
    memmap. `gather`/`epoch_batches` expose the fast native paths."""

    def __init__(self, path: str, prefer_native: bool = True):
        self.path = path
        with open(path, 'rb') as f:
            magic, version, count, h, w, c, _ = _HEADER.unpack(
                f.read(HEADER_BYTES))
        if magic != _MAGIC or version != 1:
            raise ValueError(f'{path} is not a bhpk v1 pack')
        self.count, self.height, self.width, self.channels = count, h, w, c
        self._image_bytes = h * w * c
        self._handle = None
        self._lib = _build_native() if prefer_native else None
        if self._lib is not None:
            self._handle = self._lib.bhpk_open(path.encode())
            if not self._handle:                      # corrupt per C++ checks
                raise ValueError(f'native reader rejected {path}')
        else:
            self._mm = np.memmap(path, dtype=np.uint8, mode='r',
                                 offset=HEADER_BYTES,
                                 shape=(count, h, w, c))

    @property
    def native(self) -> bool:
        return self._handle is not None

    def __len__(self) -> int:
        return self.count

    def load_image(self, idx: int) -> np.ndarray:
        return self.gather(np.asarray([idx], dtype=np.int64))[0]

    def gather(self, indices: np.ndarray, threads: int = 4) -> np.ndarray:
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        n = len(indices)
        if self._handle is not None:
            out = np.empty((n, self.height, self.width, self.channels),
                           dtype=np.uint8)
            rc = self._lib.bhpk_gather(
                self._handle,
                indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
            if rc != 0:
                raise IndexError('pack gather index out of range')
            return out
        return np.array(self._mm[indices])

    def epoch_batches(self, indices: Sequence[int], batch_size: int,
                      prefetch: int = 4, threads: int = 2,
                      use_ring: Optional[bool] = None
                      ) -> Iterator[np.ndarray]:
        """Prefetched batch iterator over `indices` (truncated to a
        multiple of batch_size), matching BatchLoader.epoch() semantics.

        use_ring=None (auto): the prefetch ring only pays off when a spare
        core can run the producer; on 1-2 core hosts its extra buffer copy
        loses to a direct single-copy gather (tools/bench_loader.py)."""
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        steps = len(indices) // batch_size
        if steps == 0:
            return
        if use_ring is None:
            use_ring = (os.cpu_count() or 1) > 2
        if self._handle is None or not use_ring:
            for s in range(steps):
                yield self.gather(
                    indices[s * batch_size:(s + 1) * batch_size])
            return
        epoch = self._lib.bhpk_epoch_start(
            self._handle,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            steps * batch_size, batch_size, prefetch, threads)
        if not epoch:
            raise RuntimeError('bhpk_epoch_start failed')
        try:
            while True:
                out = np.empty(
                    (batch_size, self.height, self.width, self.channels),
                    dtype=np.uint8)
                if not self._lib.bhpk_epoch_next(
                        epoch,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))):
                    return
                yield out
        finally:
            self._lib.bhpk_epoch_finish(epoch)

    def close(self) -> None:
        if self._handle is not None:
            self._lib.bhpk_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class PackBatchLoader:
    """BatchLoader-compatible epoch streamer backed by the native prefetch
    ring (drop-in for datasets.BatchLoader when the dataset is a pack)."""

    def __init__(self, dataset: PackDataset, batch_size: int,
                 samples_per_epoch: int, random_seed: Optional[int] = None,
                 prefetch: int = 4, threads: int = 2):
        from bihome_tpu.data.datasets import EpochSampler
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = EpochSampler(len(dataset), samples_per_epoch,
                                    random_seed)
        self.prefetch = prefetch
        self.threads = threads

    def __len__(self) -> int:
        return self.sampler.samples_per_epoch // self.batch_size

    def epoch(self) -> Iterator[np.ndarray]:
        return self.dataset.epoch_batches(
            self.sampler.epoch_indices(), self.batch_size,
            prefetch=self.prefetch, threads=self.threads)
