"""Native input pipeline (.bhpk pack + C++ reader) tests.

Covers the writer/reader round trip, the prefetched epoch ring, the pure
numpy fallback, and the dataset-factory dispatch. JAX-free — these tests
exercise the host/native layer only."""

import os

import numpy as np
import pytest

from bihome_tpu.data import datasets, pack


@pytest.fixture(scope='module')
def pack_file(tmp_path_factory):
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (48, 24, 32, 3), dtype=np.uint8)
    path = str(tmp_path_factory.mktemp('pack') / 'pack.bhpk')
    pack.write_pack(path, imgs)
    return path, imgs


def test_header_and_roundtrip(pack_file):
    path, imgs = pack_file
    ds = pack.PackDataset(path)
    assert (len(ds), ds.height, ds.width, ds.channels) == (48, 24, 32, 3)
    idx = np.random.RandomState(1).randint(0, 48, 37)
    assert (ds.gather(idx) == imgs[idx]).all()
    assert (ds.load_image(5) == imgs[5]).all()


def test_native_builds_here():
    # The toolchain is part of this environment; the native reader must
    # actually be in play (not silently falling back).
    assert pack.native_available()


def test_epoch_prefetch_ring(pack_file):
    path, imgs = pack_file
    ds = pack.PackDataset(path)
    batches = list(ds.epoch_batches(np.arange(48), 16, prefetch=3,
                                    threads=2, use_ring=True))
    assert len(batches) == 3
    assert (np.concatenate(batches) == imgs).all()
    # early abort must not hang or leak the producer thread
    it = ds.epoch_batches(np.arange(48), 16, use_ring=True)
    next(it)
    it.close()
    # direct-gather mode (auto-selected on 1-2 core hosts)
    direct = list(ds.epoch_batches(np.arange(48), 16, use_ring=False))
    assert (np.concatenate(direct) == imgs).all()


def test_gather_out_of_range(pack_file):
    path, _ = pack_file
    ds = pack.PackDataset(path)
    with pytest.raises(IndexError):
        ds.gather(np.asarray([48]))


def test_numpy_fallback_matches_native(pack_file):
    path, imgs = pack_file
    ds = pack.PackDataset(path, prefer_native=False)
    assert not ds.native
    idx = np.random.RandomState(2).randint(0, 48, 20)
    assert (ds.gather(idx) == imgs[idx]).all()
    assert (np.concatenate(list(ds.epoch_batches(np.arange(48), 16)))
            == imgs).all()


def test_loader_matches_python_batchloader(pack_file):
    """PackBatchLoader must reproduce BatchLoader's seeded epoch exactly
    (same EpochSampler semantics, ref: src/data/coco/dataset.py:136-142)."""
    path, imgs = pack_file

    class _ArrayDs:
        def __len__(self):
            return len(imgs)

        def load_image(self, i):
            return imgs[i]

    ds = pack.PackDataset(path)
    native = np.concatenate(list(
        pack.PackBatchLoader(ds, 16, 48, random_seed=7).epoch()))
    python = np.concatenate(list(
        datasets.BatchLoader(_ArrayDs(), 16, 48, random_seed=7).epoch()))
    assert (native == python).all()


def test_make_dataset_dispatches_pack(pack_file):
    path, imgs = pack_file
    ds = datasets.make_dataset(path)
    assert isinstance(ds, pack.PackDataset)
    ds2 = datasets.make_dataset(os.path.dirname(path))
    assert isinstance(ds2, pack.PackDataset)
    assert (ds2.load_image(3) == imgs[3]).all()


def test_write_pack_validates_shapes(tmp_path):
    with pytest.raises(ValueError):
        pack.write_pack(str(tmp_path / 'bad.bhpk'),
                        [np.zeros((4, 4, 3), np.uint8),
                         np.zeros((5, 4, 3), np.uint8)])
    with pytest.raises(ValueError):
        pack.write_pack(str(tmp_path / 'empty.bhpk'), [])
