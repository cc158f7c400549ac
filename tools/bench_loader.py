#!/usr/bin/env python3
"""Host input-pipeline microbenchmark: native .bhpk reader vs Python loader.

JAX-free. Writes a synthetic 320x240 pack, then times epoch streaming
(seeded sampling with replacement, batch 64) through:
  - datasets.BatchLoader over per-file .npy images (the Python path)
  - pack.PackBatchLoader over the .bhpk (native mmap + prefetch ring)

    python tools/bench_loader.py [--images 1024] [--batch 64]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bihome_tpu.data import datasets, pack  # noqa: E402


def run(loader, epochs=3):
    n = 0
    # warm epoch (page cache, thread spin-up)
    for b in loader.epoch():
        n += len(b)
    t0 = time.perf_counter()
    n = 0
    for _ in range(epochs):
        for b in loader.epoch():
            n += len(b)
    dt = time.perf_counter() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--images', type=int, default=1024)
    ap.add_argument('--batch', type=int, default=64)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (args.images, 240, 320, 3), dtype=np.uint8)

    with tempfile.TemporaryDirectory() as d:
        npy_dir = os.path.join(d, 'npy')
        os.makedirs(npy_dir)
        for i in range(args.images):
            np.save(os.path.join(npy_dir, f'{i:06d}.npy'), imgs[i])
        pack_path = os.path.join(d, 'pack.bhpk')
        pack.write_pack(pack_path, imgs)

        folder = datasets.ImageFolderDataset(npy_dir)
        py_rate = run(datasets.BatchLoader(folder, args.batch, args.images,
                                           random_seed=1))
        pk = pack.PackDataset(pack_path)
        assert pk.native, 'native reader not built'
        native_rate = run(pack.PackBatchLoader(pk, args.batch, args.images,
                                               random_seed=1))
        mm_rate = run(pack.PackBatchLoader(
            pack.PackDataset(pack_path, prefer_native=False), args.batch,
            args.images, random_seed=1))

    print(f'python .npy BatchLoader : {py_rate:10.0f} images/s')
    print(f'numpy-memmap pack       : {mm_rate:10.0f} images/s')
    print(f'native pack (C++ ring)  : {native_rate:10.0f} images/s '
          f'({native_rate / py_rate:.1f}x python)')


if __name__ == '__main__':
    main()
