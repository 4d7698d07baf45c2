"""Train a place-recognition vocabulary from a directory of images.

Reference analogue: `tools/createVoc/createVoc.cpp` (build a DBoW3
vocabulary from image ORB features) + `tools/convertVoc` (format
conversion) — here the artifact is a flat-tensor .npz
(retrieval/vocabulary.py), loadable by `apps/kitti.py --vocab`.

Usage:
  python tools/create_voc.py --images DIR [--out voc.npz] [--k 10]
      [--levels 3] [--max-images 50] [--max-desc 100000] [--cpu]
  python tools/create_voc.py --synthetic 20 --out voc.npz   # no data needed
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--images", help="directory of grayscale images")
parser.add_argument("--synthetic", type=int, default=0, metavar="N",
                    help="train from N synthetic billboard frames instead")
parser.add_argument("--out", default="voc.npz")
parser.add_argument("--k", type=int, default=10, help="branching factor")
parser.add_argument("--levels", type=int, default=3, help="tree depth")
parser.add_argument("--iters", type=int, default=6, help="k-means iters")
parser.add_argument("--n-features", type=int, default=2000)
parser.add_argument("--max-images", type=int, default=50)
parser.add_argument("--max-desc", type=int, default=100000)
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from vi_slam_tpu.features.extractor import OrbExtractor  # noqa: E402
from vi_slam_tpu.retrieval import vocabulary as voc  # noqa: E402
from vi_slam_tpu.utils.config import ExtractorConfig  # noqa: E402

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def load_gray(path):
    """Minimal image reader: .npy directly; PNG/JPG via matplotlib."""
    if path.endswith(".npy"):
        img = np.load(path)
    else:
        import matplotlib.image as mpimg

        img = mpimg.imread(path)
        if img.ndim == 3:
            img = img[..., :3] @ np.asarray([0.299, 0.587, 0.114])
        if img.max() <= 1.0:
            img = img * 255.0
    return np.asarray(img, np.float32)


def main():
    descs = []
    if args.synthetic:
        from vi_slam_tpu.io import synthetic

        W, H, FX = 1241, 376, 718.856
        world = synthetic.make_billboard_world(
            n_frames=args.synthetic, n_boards=4000, seed=17, speed=1.0
        )
        ext = OrbExtractor(ExtractorConfig(n_features=args.n_features), H, W)
        for i in range(args.synthetic):
            img = synthetic.render_billboard_image(
                world, world.poses_wc[i], FX, FX, 607.19, 185.22, W, H,
                baseline=0.0,
            )
            f = ext(np.asarray(img, np.float32))
            descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
            log(f"frame {i}: {len(descs[-1])} descriptors")
    elif args.images:
        names = sorted(os.listdir(args.images))[: args.max_images]
        if not names:
            parser.error(f"no images in {args.images}")
        ext = None
        for n in names:
            img = load_gray(os.path.join(args.images, n))
            if ext is None:
                ext = OrbExtractor(
                    ExtractorConfig(n_features=args.n_features),
                    img.shape[0], img.shape[1],
                )
            if img.shape[:2] != (ext.height, ext.width):
                log(f"skip {n}: shape {img.shape} != {ext.height}x{ext.width}")
                continue
            f = ext(img)
            descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
            log(f"{n}: {len(descs[-1])} descriptors")
    else:
        parser.error("need --images DIR or --synthetic N")

    alld = np.concatenate(descs)[: args.max_desc]
    log(f"training on {len(alld)} descriptors "
        f"(k={args.k}, L={args.levels})...")
    vocab = voc.train_vocabulary(
        alld, k=args.k, levels=args.levels, iters=args.iters
    )
    voc.save_vocabulary(args.out, vocab)
    log(f"saved {vocab.n_words}-word vocabulary to {args.out}")


if __name__ == "__main__":
    main()
