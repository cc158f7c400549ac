#!/usr/bin/env python3
"""Offline dataset preprocessor (ref: src/data/coco/preprocess_offline.py).

Rescale (aspect-preserving) + center-crop every image to WxH and dump .npy:

    python3 preprocess_offline.py --input_dir data/coco/train2014 \
        --output_dir data/coco/dataset/train2014 [--width 320 --height 240]
"""

import argparse

from bihome_tpu.data.datasets import ImageFolderDataset


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--input_dir', required=True)
    parser.add_argument('--output_dir', required=True)
    parser.add_argument('--width', type=int, default=320)
    parser.add_argument('--height', type=int, default=240)
    args = parser.parse_args()

    ds = ImageFolderDataset(args.input_dir,
                            image_size=(args.width, args.height))
    ds.preprocess_offline(args.output_dir)
    print(f'Wrote {len(ds)} .npy files to {args.output_dir}')


if __name__ == '__main__':
    main()
