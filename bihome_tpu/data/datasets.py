"""Host-side datasets: file listing, decode, seeded epoch sampling, prefetch.

Replaces the reference's per-dataset Dataset/DatasetSampler/DataLoader stacks
(ref: src/data/{coco,flir_adas,clevr_change,cifar10}/dataset.py,
train.py:80-281). The heavy per-sample synthesis lives on-device
(data/pipeline.py); the host only has to list files, decode images, sample
epoch indices with the reference's seeded-choice semantics, and stream uint8
batches with a prefetch thread.

Image decode uses PIL (cv2 is not available here); .npy files load directly.
When a dataset directory is missing, SyntheticDataset provides a deterministic
stand-in so train/eval/bench run anywhere.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from bihome_tpu.data import synthetic


def _decode_image(path: str) -> np.ndarray:
    if path.endswith('.npy'):
        return np.load(path, allow_pickle=True)
    from PIL import Image
    with Image.open(path) as img:
        return np.asarray(img.convert('RGB'))


def rescale_keep_aspect(image: np.ndarray,
                        target_wh: Tuple[int, int]) -> np.ndarray:
    """Aspect-preserving resize covering target (ref: transforms.py:11-46)."""
    h, w = image.shape[:2]
    target_w, target_h = target_wh
    src_ratio = h / w
    if src_ratio < target_h / target_w:
        new_w, new_h = int(np.round(target_h / src_ratio)), target_h
    else:
        new_w, new_h = target_w, int(np.round(target_w * src_ratio))
    from PIL import Image
    return np.asarray(Image.fromarray(image).resize((new_w, new_h),
                                                    Image.BILINEAR))


def center_crop(image: np.ndarray,
                target_wh: Tuple[int, int]) -> np.ndarray:
    """Center crop (ref: transforms.py:87-122)."""
    h, w = image.shape[:2]
    new_w, new_h = target_wh
    top = (h - new_h) // 2 if h != new_h else 0
    left = (w - new_w) // 2 if w != new_w else 0
    return image[top:top + new_h, left:left + new_w]


class ImageFolderDataset:
    """Directory of .jpg/.jpeg/.npy images (COCO/FLIR-ADAS style,
    ref: src/data/coco/dataset.py:17-103)."""

    EXTENSIONS = ('.jpg', '.jpeg', '.npy')

    def __init__(self, dataset_root: str,
                 image_size: Tuple[int, int] = (320, 240)):
        self.dataset_root = dataset_root
        self.image_size = image_size
        self.filenames: List[str] = sorted(
            f for f in os.listdir(dataset_root)
            if f.lower().endswith(self.EXTENSIONS))
        if not self.filenames:
            raise FileNotFoundError(f'no images under {dataset_root}')
        self.filepaths = [os.path.join(dataset_root, f)
                          for f in self.filenames]

    def __len__(self) -> int:
        return len(self.filepaths)

    def load_image(self, idx: int) -> np.ndarray:
        img = _decode_image(self.filepaths[idx])
        if img.ndim == 2:
            img = np.tile(img[..., None], (1, 1, 3))
        w, h = self.image_size
        if img.shape[:2] != (h, w):
            img = center_crop(rescale_keep_aspect(img, (w, h)), (w, h))
        return np.ascontiguousarray(img[..., :3], dtype=np.uint8)

    def preprocess_offline(self, output_root: str) -> None:
        """Rescale+CenterCrop -> .npy dump
        (ref: src/data/coco/preprocess_offline.py:9-29)."""
        os.makedirs(output_root, exist_ok=True)
        for idx, name in enumerate(self.filenames):
            out = os.path.join(
                output_root, '.'.join(name.rsplit('.')[:-1]) + '.npy')
            np.save(out, self.load_image(idx), allow_pickle=True)


class HostPrepDataset:
    """Wraps any dataset with a host-side pre-datagen transform chain
    (``PairSpec.host_prep``: Rescale / RandomCrop / CenterCrop /
    ToGrayscale / Standardize parsed from the config TRANSFORMS list,
    ref: train.py:110-120)."""

    def __init__(self, dataset, host_prep, random_seed=None):
        from bihome_tpu.data import transforms_host
        self.dataset = dataset
        self.apply = transforms_host.build_host_prep(
            host_prep, np.random.RandomState(random_seed))

    def __len__(self) -> int:
        return len(self.dataset)

    def load_image(self, idx: int) -> np.ndarray:
        return self.apply(self.dataset.load_image(idx))


class SyntheticDataset:
    """Deterministic stand-in when no dataset directory exists."""

    def __init__(self, num_images: int = 256,
                 image_size: Tuple[int, int] = (320, 240), seed: int = 0):
        w, h = image_size
        self.pool = synthetic.make_image_pool(num_images, h, w, seed=seed)

    def __len__(self) -> int:
        return len(self.pool)

    def load_image(self, idx: int) -> np.ndarray:
        return self.pool[idx]


class EpochSampler:
    """Seeded per-epoch index choice with replacement
    (ref: src/data/coco/dataset.py:136-142)."""

    def __init__(self, dataset_len: int, samples_per_epoch: int,
                 random_seed: Optional[int] = None):
        self.dataset_len = dataset_len
        self.samples_per_epoch = samples_per_epoch
        self.random_state = (np.random.RandomState(random_seed)
                             if random_seed is not None else np.random)

    def epoch_indices(self) -> np.ndarray:
        return self.random_state.choice(np.arange(self.dataset_len),
                                        self.samples_per_epoch)


class BatchLoader:
    """Streams [B,H,W,3] uint8 batches with a background prefetch thread —
    the replacement for DataLoader(num_workers=8) now that synthesis is
    on-device."""

    def __init__(self, dataset, batch_size: int, samples_per_epoch: int,
                 random_seed: Optional[int] = None, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = EpochSampler(len(dataset), samples_per_epoch,
                                    random_seed)
        self.prefetch = prefetch

    def __len__(self) -> int:
        return self.sampler.samples_per_epoch // self.batch_size

    def epoch(self) -> Iterator[np.ndarray]:
        indices = self.sampler.epoch_indices()
        steps = len(self)
        q: 'queue.Queue' = queue.Queue(maxsize=self.prefetch)

        def producer():
            try:
                for s in range(steps):
                    batch_idx = indices[s * self.batch_size:
                                        (s + 1) * self.batch_size]
                    imgs = np.stack([self.dataset.load_image(int(i))
                                     for i in batch_idx])
                    q.put(imgs)
            finally:
                q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item


def make_dataset(split_path: str, image_size=(320, 240),
                 synthetic_fallback: bool = True, synthetic_seed: int = 0,
                 dataset_name: str = 'coco'):
    """Dataset factory for the config DATA section (dispatch by DATA.NAME,
    replacing the reference's importlib lookup, ref: train.py:555-564).
    Missing directories fall back to SyntheticDataset (this environment
    ships no datasets). A `.bhpk` pack path (or a directory containing
    `pack.bhpk`, written by preprocess_offline.py --pack) selects the
    native mmap/prefetch reader (data/pack.py, native/pack_reader.cc)."""
    pack_path = None
    if split_path.endswith('.bhpk') and os.path.isfile(split_path):
        pack_path = split_path
    elif (os.path.isdir(split_path)
          and os.path.isfile(os.path.join(split_path, 'pack.bhpk'))):
        pack_path = os.path.join(split_path, 'pack.bhpk')
    if pack_path is not None:
        from bihome_tpu.data.pack import PackDataset
        return PackDataset(pack_path)
    if os.path.isdir(split_path):
        try:
            if 'clevr_change' in dataset_name:
                from bihome_tpu.data.clevr_change import ClevrChangeDataset
                return ClevrChangeDataset(split_path, image_size)
            if 'cifar' in dataset_name:
                from bihome_tpu.data.cifar10 import Cifar10Dataset
                return Cifar10Dataset(split_path,
                                      train='test' not in split_path)
            # 'coco' and 'flir_adas' are image folders (.jpg/.jpeg/.npy).
            return ImageFolderDataset(split_path, image_size)
        except FileNotFoundError:
            if not synthetic_fallback:
                raise
    elif not synthetic_fallback:
        raise FileNotFoundError(split_path)
    return SyntheticDataset(image_size=image_size, seed=synthetic_seed)
