"""LFW dataset builder + packed-array store.

Replaces the reference's offline pipeline (dataset/generate_dataset.py)
and its JPEG-per-example on-disk layout with a TPU-friendly design:

- `build_dataset` walks an LFW directory tree (person subdirs of JPEGs,
  generate_dataset.py:136-178), applies the fixed face crop
  x 83..166 / y 92..175 from the lfwcrop spec
  (generate_dataset.py:20-23, 52-55), resizes to 64x64 and packs
  everything into ONE uint8 .npy array — memory-mappable, sequential-read
  friendly, no 265k-tiny-file problem.
- Augmentation is NOT materialized on disk (the reference writes 19
  augmented JPEG copies per face, generate_dataset.py:29-30,43-48);
  it runs on device per epoch instead (facegen/data/augment.py), which
  is both faster and a strictly richer augmentation distribution.
- `load_store` memory-maps the packed array; the training pipeline
  device_puts uint8 slices straight to HBM.

Directory default mirrors train.lua:166-170: `dataset/out_aug_64x64`
becomes `dataset/lfw64.npy` (and `--aws` maps under /mnt/datasets).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

# fixed crop box from the lfwcrop spec (generate_dataset.py:20-23)
CROP_X0, CROP_Y0 = 83, 92
CROP_X1, CROP_Y1 = 166, 175  # inclusive
SCALE = 64


def scan_image_paths(dirs: Sequence[str], exts: Tuple[str, ...] = (".jpg", ".jpeg", ".png", ".ppm", ".pgm")) -> List[str]:
    """Recursively collect image paths, sorted for determinism
    (generate_dataset.py:155-170 walks person subdirectories)."""
    out: List[str] = []
    for d in dirs:
        for root, _, files in os.walk(d):
            for f in sorted(files):
                if f.lower().endswith(exts):
                    out.append(os.path.join(root, f))
    out.sort()
    return out


def load_and_crop(path: str, crop: bool = True) -> np.ndarray:
    """Decode one image; if it is a 250x250 LFW original, apply the
    fixed face crop + resize to 64x64. Returns (64, 64, 3) uint8."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    arr = np.asarray(img, np.uint8)
    if crop and arr.shape[0] >= CROP_Y1 + 1 and arr.shape[1] >= CROP_X1 + 1:
        arr = arr[CROP_Y0 : CROP_Y1 + 1, CROP_X0 : CROP_X1 + 1]
    if arr.shape[:2] != (SCALE, SCALE):
        img = Image.fromarray(arr).resize((SCALE, SCALE), Image.BILINEAR)
        arr = np.asarray(img, np.uint8)
    return arr


def build_dataset(
    lfw_dir,
    out_path: str,
    limit: Optional[int] = None,
    workers: int = 8,
    crop: bool = True,
    exts: Optional[Tuple[str, ...]] = None,
) -> str:
    """Build the packed uint8 store: (N, 64, 64, 3) .npy at out_path.

    ``lfw_dir`` may be a single directory or a list of directories
    (dataset.lua:18-22 setDirs takes a list); ``exts`` restricts the
    file extensions scanned (dataset.lua:28-30 setFileExtension).

    Decoding is fanned out over host threads (PIL releases the GIL in
    its C decoder) — the analogue of the reference's single-threaded
    Python 2 loop (generate_dataset.py:41), minus the 20x disk blow-up.
    """
    dirs = [lfw_dir] if isinstance(lfw_dir, (str, os.PathLike)) else list(lfw_dir)
    if exts:
        # scan_image_paths compares f.lower().endswith(ext): normalize
        # the extension to lowercase too or 'JPG' could never match
        paths = scan_image_paths(
            dirs,
            tuple((e if e.startswith(".") else "." + e).lower() for e in exts),
        )
    else:
        paths = scan_image_paths(dirs)
    if limit:
        paths = paths[:limit]
    if not paths:
        raise FileNotFoundError(f"no images under {lfw_dir!r}")
    n = len(paths)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    arr = np.lib.format.open_memmap(
        out_path, mode="w+", dtype=np.uint8, shape=(n, SCALE, SCALE, 3)
    )

    jpeg_like = all(p.lower().endswith((".jpg", ".jpeg")) for p in paths)
    from facegen import native

    if jpeg_like and native.available():
        # native path: threaded libjpeg decode + crop + bilinear resize
        crop_box = (CROP_Y0, CROP_Y1, CROP_X0, CROP_X1) if crop else (0, 1 << 30, 0, 1 << 30)
        chunk = 2048
        for s in range(0, n, chunk):
            arr[s : s + chunk] = native.decode_crop_resize_batch(
                paths[s : s + chunk], SCALE, crop_box, workers
            )
    else:
        from concurrent.futures import ThreadPoolExecutor

        def work(i):
            arr[i] = load_and_crop(paths[i], crop=crop)

        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(work, range(n)))
    arr.flush()
    return out_path


def load_store(path: str) -> np.ndarray:
    """Memory-map a packed dataset; shape (N, 64, 64, 3) uint8."""
    return np.load(path, mmap_mode="r")


def default_store_path(aws: bool = False, dataset_dir: Optional[str] = None) -> str:
    """Mirrors train.lua:166-170 / sample.lua:61-65 directory selection."""
    if dataset_dir:
        return dataset_dir
    if aws:
        return "/mnt/datasets/lfw64.npy"
    return "dataset/lfw64.npy"


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Pack LFW into a uint8 npy store "
        "(replaces generate_dataset.py --path=/lfw)"
    )
    p.add_argument("--path", required=True, action="append",
                   help="image root directory; repeatable "
                        "(dataset.lua:18-22 setDirs list)")
    p.add_argument("--out", default="dataset/lfw64.npy")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--no-crop", action="store_true")
    p.add_argument("--ext", action="append", default=None,
                   help="file extension(s) to scan, e.g. --ext jpg "
                        "(dataset.lua:28-30 setFileExtension); default: "
                        "jpg/jpeg/png/ppm/pgm")
    args = p.parse_args(argv)
    out = build_dataset(args.path, args.out, args.limit, args.workers,
                        not args.no_crop, exts=args.ext)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
