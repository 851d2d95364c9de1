"""Capture tf.image.ssim as the independent oracle for ops/metrics.ssim
(the standard Gaussian-window SSIM: 11x11 sigma=1.5 valid-padded, Wang et
al. 2004 — the definition SSIM_PIL approximates and the one our public
API exposes next to the reference's tile scorer `ssim_pil_like`,
/root/reference/FISRnet.py:890-891).

Why: every other drift-prone numeric op is now pinned against the other
implementation's actual output (resize, warp, losses, tf.image.psnr via
the train-loss oracle, Adam, schedules, flow viz); the Gaussian `ssim`
was still pinned only against its own identity/monotonicity properties.
tf.image.ssim is a fully independent implementation of the same
definition (separable Gaussian, same C1/C2, mean over H,W then channels),
so agreement here rules out kernel-normalization, padding and
channel-averaging drift in our depthwise-conv formulation.

Pairs cover: independent noise (low SSIM), noise-perturbed (high SSIM),
smooth gradients (degenerate variance), u8-quantized [0,1] images (the
eval path's value grid), odd non-multiple sizes, C=1 and C=3, a batched
[B,H,W,C] case, and one max_val=255 case.

Per repo convention the script also runs OUR implementation and prints
the measured deviation; the test pins ~10x above it.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/capture_ssim_oracle.py
"""

import json
import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "tests", "fixtures", "tf_oracle")


def make_pairs():
    """Seeded (name, a, b, max_val) cases; a, b float32 [B,H,W,C]."""
    rng = np.random.default_rng(20260820)
    cases = []

    def add(name, a, b, max_val=1.0):
        cases.append((name, a.astype(np.float32), b.astype(np.float32),
                      float(max_val)))

    # independent noise: SSIM near 0
    a = rng.uniform(size=(1, 32, 48, 3))
    b = rng.uniform(size=(1, 32, 48, 3))
    add("noise_independent", a, b)

    # perturbed: high SSIM, grayscale
    a = rng.uniform(size=(1, 64, 64, 1))
    add("noise_perturbed_c1", a, np.clip(a + rng.normal(0, 0.02, a.shape), 0, 1))

    # smooth gradient vs shifted/scaled gradient: near-zero local variance
    # exercises the C1/C2 stabilizers
    yy, xx = np.mgrid[0:40, 0:56].astype(np.float64)
    g = ((yy / 39 + xx / 55) / 2)[None, ..., None].repeat(3, axis=-1)
    add("gradient_vs_scaled", g, np.clip(g * 0.9 + 0.05, 0, 1))

    # u8-quantized smoothed noise at eval-like size (odd, not a window
    # multiple) — the value grid the test phase actually scores on
    a = rng.uniform(size=(1, 97, 133, 3))
    k = np.ones((5, 5)) / 25.0
    sm = np.stack([_conv2_same(a[0, ..., c], k) for c in range(3)], -1)[None]
    b = np.clip(sm + rng.normal(0, 0.05, sm.shape), 0, 1)
    a8 = (np.clip(sm, 0, 1) * 255).astype(np.uint8) / 255.0
    b8 = (b * 255).astype(np.uint8) / 255.0
    add("u8_quantized_97x133", a8, b8)

    # batched case: 4 pairs in one call
    a = rng.uniform(size=(4, 24, 36, 3))
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1)
    add("batch4_24x36", a, b)

    # max_val=255 on u8-valued floats
    a = (rng.uniform(size=(1, 48, 32, 3)) * 255).astype(np.uint8).astype(np.float64)
    b = np.clip(a + rng.normal(0, 12, a.shape), 0, 255)
    add("u8_range_maxval255", a, b, max_val=255.0)

    return cases


def _conv2_same(img, k):
    kh, kw = k.shape
    ph, pw = kh // 2, kw // 2
    p = np.pad(img, ((ph, ph), (pw, pw)), mode="edge")
    out = np.zeros_like(img)
    for i in range(kh):
        for j in range(kw):
            out += k[i, j] * p[i:i + img.shape[0], j:j + img.shape[1]]
    return out


def main():
    import tensorflow as tf

    cases = make_pairs()
    arrays, manifest_cases = {}, []
    for name, a, b, max_val in cases:
        tf_val = tf.image.ssim(tf.constant(a), tf.constant(b),
                               max_val=max_val).numpy().astype(np.float64)
        arrays[f"{name}_a"] = a
        arrays[f"{name}_b"] = b
        arrays[f"{name}_ssim"] = tf_val
        manifest_cases.append({"name": name, "shape": list(a.shape),
                               "max_val": max_val,
                               "tf_ssim": [float(v) for v in tf_val]})

    os.makedirs(OUT_DIR, exist_ok=True)
    np.savez_compressed(os.path.join(OUT_DIR, "ssim_tf.npz"), **arrays)

    # measure our deviation (CPU jax; the axon relay is not needed here)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from fisr_tpu.ops.metrics import ssim

    worst = 0.0
    for name, a, b, max_val in cases:
        ours = np.asarray(ssim(a, b, max_val=max_val), np.float64)
        dev = float(np.max(np.abs(ours - arrays[f"{name}_ssim"])))
        worst = max(worst, dev)
        print(f"{name:24s} tf={arrays[f'{name}_ssim']!s:>40} max|d|={dev:.3e}")

    manifest = {
        "tf_version": tf.__version__,
        "measured_max_abs_dev": worst,
        "cases": manifest_cases,
        "source": "tf.image.ssim (default 11x11 gaussian sigma=1.5, "
                  "k1=0.01 k2=0.03) on seeded pairs; independent oracle "
                  "for ops/metrics.ssim",
    }
    with open(os.path.join(OUT_DIR, "ssim_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"# measured max |ours - tf.image.ssim| = {worst:.3e} "
          f"over {len(cases)} cases")


if __name__ == "__main__":
    main()
