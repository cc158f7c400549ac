#!/usr/bin/env python3
"""Offline dataset preprocessor (ref: src/data/coco/preprocess_offline.py).

Rescale (aspect-preserving) + center-crop every image to WxH and dump .npy:

    python3 preprocess_offline.py --input_dir data/coco/train2014 \
        --output_dir data/coco/dataset/train2014 [--width 320 --height 240]

Framework extension: --pack additionally writes a single contiguous
`pack.bhpk` into output_dir, which train.py/eval.py stream through the
native C++ mmap/prefetch reader (native/pack_reader.cc) instead of
per-file .npy loads.
"""

import argparse
import os

from bihome_tpu.data.datasets import ImageFolderDataset


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--input_dir', required=True)
    parser.add_argument('--output_dir', required=True)
    parser.add_argument('--width', type=int, default=320)
    parser.add_argument('--height', type=int, default=240)
    parser.add_argument('--pack', action='store_true',
                        help='also write a native pack.bhpk (fast path)')
    parser.add_argument('--pack_only', action='store_true',
                        help='write only pack.bhpk, skip the .npy dump')
    args = parser.parse_args()

    ds = ImageFolderDataset(args.input_dir,
                            image_size=(args.width, args.height))
    if not args.pack_only:
        ds.preprocess_offline(args.output_dir)
        print(f'Wrote {len(ds)} .npy files to {args.output_dir}')
    if args.pack or args.pack_only:
        from bihome_tpu.data.pack import write_pack
        os.makedirs(args.output_dir, exist_ok=True)
        out = os.path.join(args.output_dir, 'pack.bhpk')
        write_pack(out, (ds.load_image(i) for i in range(len(ds))))
        print(f'Wrote {len(ds)}-image pack to {out}')


if __name__ == '__main__':
    main()
