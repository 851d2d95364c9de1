"""Capture ground-truth oracle fixtures on a TF1.13 / SSIM_PIL machine.

The round-3 verdict flagged the two drift-prone parity oracles as
self-referential: `ops/resize.resize_tf1` is pinned against a numpy port
written from the same reading of TF1.13, and `ops/metrics.ssim_pil_like`
against hand-computed fixtures of the documented algorithm — not against the
actual `tf.image.resize_images` / `SSIM_PIL.compare_ssim` outputs the
reference runs (/root/reference/FISRnet.py:81,112,263-264 and :890-891).

THIS script closes that loop. It is standalone (no fisr_tpu imports) so it
can be copied alone to any machine that has the reference's environment:

    python 3.x + tensorflow==1.13.* + SSIM_PIL + Pillow + numpy

Run it there:

    python capture_oracle_fixtures.py --out fixtures/

then copy the two .npz files into this repo at tests/fixtures/. The
fixture-gated tests (tests/test_resize.py::test_resize_matches_tf1_fixture,
tests/test_metrics.py::test_ssim_matches_ssim_pil_fixture) activate
automatically once the files exist and pin bit-level parity against the
real TF1/SSIM_PIL outputs; until then they skip with a pointer here.

Inputs are generated with a fixed seed AND saved into the .npz alongside the
outputs, so nothing depends on RNG reproducibility across numpy versions.
"""

import argparse
import os

import numpy as np

# (in_h, in_w) -> (out_h, out_w): the shapes test_resize.py exercises plus
# the model-internal resizes (FISRnet's x1/4 and x1/2 bicubics at train patch
# and eval sizes, decoder bilinears; FISRnet.py:81,112 and ops.py:69).
RESIZE_CASES = [
    ((32, 48), (16, 24)),
    ((32, 48), (8, 12)),
    ((16, 24), (32, 48)),
    ((12, 20), (30, 44)),
    ((17, 13), (9, 21)),
    ((96, 96), (24, 24)),    # train patch -> level-1 input (x1/4)
    ((96, 96), (48, 48)),    # train patch -> level-2 input (x1/2)
    ((24, 24), (48, 48)),    # decoder bilinear x2
    ((192, 192), (48, 48)),  # eval window -> x1/4
]
RESIZE_METHODS = ["bilinear", "bicubic"]

N_SSIM_PAIRS = 8
SSIM_HW = (63, 97)  # non-multiple of the 7px tile on purpose (crop path)


def capture_resize(out_dir):
    import tensorflow as tf

    version = tf.__version__
    if not version.startswith("1."):
        # TF2's compat.v1 dispatches resize_images to the SAME legacy
        # ResizeBilinear/ResizeBicubic kernels (align_corners=False,
        # half_pixel_centers=False) the reference's 1.13 ran; graph mode
        # for call-form parity. The recorded version string keeps the
        # provenance honest.
        tf = tf.compat.v1
        tf.disable_eager_execution()
        version += " (compat.v1 legacy kernels)"
    method_ids = {
        "bilinear": tf.image.ResizeMethod.BILINEAR,
        "bicubic": tf.image.ResizeMethod.BICUBIC,
    }
    rng = np.random.RandomState(20260819)
    blobs = {}
    with tf.Session() as sess:
        for i, ((ih, iw), (oh, ow)) in enumerate(RESIZE_CASES):
            x = rng.uniform(-0.25, 1.25, size=(2, ih, iw, 3)).astype(np.float32)
            blobs[f"in_{i}"] = x
            for method in RESIZE_METHODS:
                # EXACTLY the reference call form: default align_corners=False
                y = sess.run(tf.image.resize_images(
                    tf.constant(x), (oh, ow), method=method_ids[method]))
                blobs[f"out_{i}_{method}"] = np.asarray(y, np.float32)
    blobs["cases"] = np.asarray(
        [[ih, iw, oh, ow] for (ih, iw), (oh, ow) in RESIZE_CASES], np.int32)
    blobs["tf_version"] = np.bytes_(version.encode())
    path = os.path.join(out_dir, "tf1_resize.npz")
    np.savez_compressed(path, **blobs)
    print(f"wrote {path} ({len(RESIZE_CASES)} cases x {RESIZE_METHODS})")


def capture_ssim(out_dir):
    from PIL import Image
    from SSIM_PIL import compare_ssim

    rng = np.random.RandomState(20260820)
    imgs_a, imgs_b, scores = [], [], []
    h, w = SSIM_HW
    for i in range(N_SSIM_PAIRS):
        a = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        if i == 0:
            b = a.copy()                      # identical -> 1.0
        elif i == 1:
            b = 255 - a                       # maximally different
        else:                                  # graded noise levels
            noise = rng.normal(0, 4 * i, size=a.shape)
            b = np.clip(a.astype(np.float64) + noise, 0, 255).astype(np.uint8)
        # EXACTLY the reference call form (FISRnet.py:890-891): uint8 RGB
        # PIL images, default tile_size=7, GPU off for determinism.
        s = compare_ssim(Image.fromarray(a), Image.fromarray(b), GPU=False)
        imgs_a.append(a)
        imgs_b.append(b)
        scores.append(s)
        print(f"pair {i}: SSIM_PIL = {s:.8f}")
    path = os.path.join(out_dir, "ssim_pil.npz")
    np.savez_compressed(path, a=np.stack(imgs_a), b=np.stack(imgs_b),
                        scores=np.asarray(scores, np.float64))
    print(f"wrote {path} ({N_SSIM_PAIRS} pairs)")


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", default="fixtures",
                   help="output dir (copy the .npz files to tests/fixtures/)")
    p.add_argument("--only", choices=["resize", "ssim"], default=None)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if args.only in (None, "resize"):
        capture_resize(args.out)
    if args.only in (None, "ssim"):
        capture_ssim(args.out)


if __name__ == "__main__":
    main()
