"""Capture a PWC-Net forward oracle by running the REFERENCE'S OWN
model_pwcnet.py graph (mode-'test' lg-6-2 wiring, the config FISR uses).

What is verbatim reference code here: ALL of ModelPWCNet's graph-building
methods — extract_features / warp / corr / predict_flow / refine_flow /
deconv / nn (/root/reference/FISR_tfoptflow/model_pwcnet.py:1012-1593) —
i.e. every piece of WIRING our models/pwcnet.py claims parity with: concat
orders, DenseNet connections, 20/2**lvl flow scalers, dilation rates,
deconv placement, final resize*4.

What is shimmed (and why): the reference vendors tfoptflow WITHOUT 8
upstream modules (README.md:102,134 tells users to fetch them), and TF2's
Keras-3 era guts `tf.compat.v1.layers`. The shims are:
  * tf.layers.conv2d / conv2d_transpose — v1-contract reimplementations on
    get_variable + tf.nn (same variable naming: <scope>/<name>/kernel,bias;
    SAME padding, dilations, stride; transpose kernel [k,k,out,in]);
  * core_costvol.cost_volume — the upstream algorithm (pad, 81 shifted
    slices, channel-mean, leaky_relu 0.1 INSIDE the module);
  * core_warp.dense_image_warp — tf.contrib.image.dense_image_warp
    semantics: query = grid - flow with flow[...,0]=dy, flow[...,1]=dx,
    floors clamped to [0, size-2], alphas to [0,1]. NOTE this is the
    documented contract of the module the reference instructs users to
    download (model_pwcnet.py:1163-1166 "Ref TF documentation:
    tf.contrib.image.dense_image_warp"); it SUBTRACTS the flow and reads
    it (y, x) — the PyTorch original ADDS (x, y). The trained network
    simply learns the field that makes its own warp consistent, so
    matching this exact quirk is what released-weight parity requires.
  * losses/multi_gpus/ckpt_mgr/lr/mixed_precision/utils + skimage — import
    stubs (the mode-'test' nn() path never calls them).

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/capture_pwc_oracle.py
"""

import json
import os
import sys
import types

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("MPLBACKEND", "Agg")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT_DIR = os.path.join(REPO, "tests", "fixtures", "tf_oracle")

IN_SHAPE = (1, 2, 64, 128, 3)  # [B, 2, H, W, 3], H/W multiples of 2**6


def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _v1_layers_shim(v1):
    """tf.compat.v1.layers.{conv2d, conv2d_transpose} by the v1 contract
    (Keras 3 removed them): same variable naming and math."""

    def conv2d(inputs, filters, kernel_size, strides=1, padding="valid",
               dilation_rate=1, kernel_initializer=None, name=None,
               reuse=None):
        k = int(kernel_size)
        s = int(strides)
        d = (int(dilation_rate) if not isinstance(dilation_rate, (tuple, list))
             else int(dilation_rate[0]))
        cin = int(inputs.shape[-1])
        with v1.variable_scope(name, reuse=reuse):
            kern = v1.get_variable(
                "kernel", [k, k, cin, filters],
                initializer=v1.glorot_normal_initializer())
            bias = v1.get_variable("bias", [filters],
                                   initializer=v1.zeros_initializer())
        y = v1.nn.conv2d(inputs, kern, strides=[1, s, s, 1],
                         padding=padding.upper(), dilations=[1, d, d, 1])
        return v1.nn.bias_add(y, bias)

    def conv2d_transpose(inputs, filters, kernel_size, strides=1,
                         padding="valid", name=None, reuse=None):
        k = int(kernel_size)
        s = int(strides)
        b, h, w, cin = (int(v) for v in inputs.shape)
        assert padding.lower() == "same"
        with v1.variable_scope(name, reuse=reuse):
            kern = v1.get_variable(
                "kernel", [k, k, filters, cin],  # TF layout: [k, k, OUT, IN]
                initializer=v1.glorot_normal_initializer())
            bias = v1.get_variable("bias", [filters],
                                   initializer=v1.zeros_initializer())
        y = v1.nn.conv2d_transpose(inputs, kern, [b, h * s, w * s, filters],
                                   strides=[1, s, s, 1], padding="SAME")
        return v1.nn.bias_add(y, bias)

    return types.SimpleNamespace(conv2d=conv2d,
                                 conv2d_transpose=conv2d_transpose)


def _upstream_cost_volume(v1):
    def cost_volume(c1, warp, search_range, name):
        pad = v1.pad(warp, [[0, 0], [search_range, search_range],
                            [search_range, search_range], [0, 0]])
        _, h, w, _ = (int(v) for v in c1.shape)
        out = []
        for y in range(2 * search_range + 1):
            for x in range(2 * search_range + 1):
                s = v1.slice(pad, [0, y, x, 0], [-1, h, w, -1])
                out.append(v1.reduce_mean(c1 * s, axis=3, keepdims=True))
        return v1.nn.leaky_relu(v1.concat(out, axis=3), alpha=0.1, name=name)

    return cost_volume


def _contrib_dense_image_warp(v1):
    """tf.contrib.image.dense_image_warp: query = grid - flow, flow read
    as (dy, dx); bilinear with floors clamped to [0, size-2], alpha to
    [0, 1] (the _interpolate_bilinear contract)."""

    def dense_image_warp(image, flow, name="dense_image_warp"):
        b, h, w, c = (int(v) for v in image.shape)
        gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        grid = np.stack([gy, gx], axis=-1)[None]  # [1, h, w, 2] (y, x)
        query = v1.constant(grid) - flow
        coords, alphas = [], []
        for dim, size in ((0, h), (1, w)):
            q = query[..., dim]
            f = v1.minimum(v1.maximum(0.0, v1.floor(q)), float(size - 2))
            alphas.append(v1.clip_by_value(q - f, 0.0, 1.0))
            coords.append(v1.cast(f, v1.int32))
        fy, fx = coords
        ay, ax = (a[..., None] for a in alphas)
        flat = v1.reshape(image, [b, h * w, c])

        def gather(yy, xx):
            return v1.gather(flat, yy * w + xx, batch_dims=1)

        tl, tr = gather(fy, fx), gather(fy, fx + 1)
        bl, br = gather(fy + 1, fx), gather(fy + 1, fx + 1)
        top = tl + (tr - tl) * ax
        bot = bl + (br - bl) * ax
        return v1.add(top + (bot - top) * ay, 0.0, name=name)

    return dense_image_warp


def install_shims(v1):
    # tensorflow -> v1 for the reference modules
    contrib = _mod("tensorflow.contrib")
    contrib.__path__ = []  # so `import tensorflow.contrib.x` treats it as a pkg
    mp = _mod("tensorflow.contrib.mixed_precision",
              LossScaleOptimizer=object, FixedLossScaleManager=object)
    slim = _mod("tensorflow.contrib.slim",
                model_analyzer=types.SimpleNamespace(
                    analyze_vars=lambda *a, **k: None))
    contrib.mixed_precision = mp
    contrib.slim = slim
    sys.modules["tensorflow"] = v1
    v1.contrib = contrib
    v1.layers = _v1_layers_shim(v1)

    _mod("skimage")
    _mod("skimage.io", imread=None, imsave=None)

    pkg = "FISR_tfoptflow"
    _mod(f"{pkg}.losses", pwcnet_loss=None)
    _mod(f"{pkg}.multi_gpus", assign_to_device=None, average_gradients=None)
    _mod(f"{pkg}.core_costvol", cost_volume=_upstream_cost_volume(v1))
    _mod(f"{pkg}.core_warp",
         dense_image_warp=_contrib_dense_image_warp(v1))
    _mod(f"{pkg}.utils", clean_dst_file=None, scale=None,
         tf_where=v1.where)
    _mod(f"{pkg}.ckpt_mgr", BestCheckpointSaver=object)
    _mod(f"{pkg}.lr", lr_multisteps_long=None, lr_multisteps_fine=None,
         lr_cyclic_long=None, lr_cyclic_fine=None)
    _mod(f"{pkg}.mixed_precision",
         float32_variable_storage_getter=lambda *a, **k: None)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def main():
    import tensorflow as tf_real

    v1 = tf_real.compat.v1
    v1.disable_eager_execution()
    install_shims(v1)

    from FISR_tfoptflow.model_pwcnet import ModelPWCNet  # noqa: E402

    import jax

    jax.config.update("jax_platforms", "cpu")
    from fisr_tpu.convert.oracle import deterministic_tf_vars, tf_vars_digest
    from fisr_tpu.convert.tf_import import export_pwcnet, pwcnet_name_map
    from fisr_tpu.models import pwcnet as our_pwcnet

    shapes = {n: a.shape for n, a in export_pwcnet(
        our_pwcnet.init_params(jax.random.PRNGKey(0))).items()}
    tf_vars = deterministic_tf_vars(shapes)
    digest = tf_vars_digest(tf_vars)

    rng = np.random.default_rng(17)
    x = rng.uniform(0.0, 1.0, IN_SHAPE).astype(np.float32)

    # the lg-6-2 test options FISR instantiates
    # (FISR_for_video_pwcnet_predict_from_img_test.py:89-106)
    mdl = object.__new__(ModelPWCNet)
    mdl.opts = {"pyr_lvls": 6, "flow_pred_lvl": 2, "search_range": 4,
                "use_dense_cx": True, "use_res_cx": True}
    mdl.dbg = False

    graph = v1.Graph()
    with graph.as_default():
        x_ph = v1.placeholder(v1.float32, IN_SHAPE, name="x")
        flow_pred, flow_pyr = mdl.nn(x_ph)
        names = sorted(v.op.name for v in v1.global_variables())
        want = sorted(pwcnet_name_map())
        if names != want:
            raise AssertionError(
                f"name contract broken: graph-only={sorted(set(names)-set(want))[:6]} "
                f"map-only={sorted(set(want)-set(names))[:6]}")
        gvars = v1.global_variables()
        phs = {v.op.name: v1.placeholder(v1.float32, v.shape) for v in gvars}
        assigns = [v.assign(phs[v.op.name]) for v in gvars]
        with v1.Session() as sess:
            sess.run(assigns, {phs[v.op.name]: tf_vars[v.op.name]
                               for v in gvars})
            pred, pyr = sess.run([flow_pred, flow_pyr], {x_ph: x})

    print(f"# flow_pred: {pred.shape} |max| {np.abs(pred).max():.4f}")
    for lvl, f in zip(range(6, 1, -1), pyr):
        print(f"# pyr lvl{lvl}: {f.shape} |max| {np.abs(f).max():.4f}")

    os.makedirs(OUT_DIR, exist_ok=True)
    arrays = {"input": x, "flow_pred": pred}
    arrays.update({f"pyr_lvl{lvl}": f
                   for lvl, f in zip(range(6, 1, -1), pyr)})
    np.savez(os.path.join(OUT_DIR, "pwc_forward.npz"), **arrays)
    with open(os.path.join(OUT_DIR, "pwc_manifest.json"), "w") as f:
        json.dump({"tf_version": tf_real.__version__,
                   "weights_digest": digest,
                   "in_shape": list(IN_SHAPE),
                   "opts": mdl.opts,
                   "warp_semantics": "tf.contrib dense_image_warp: "
                                     "query = grid - flow, flow=(dy,dx)",
                   "source": "/root/reference/FISR_tfoptflow/"
                             "model_pwcnet.py:1012-1593 nn() verbatim; "
                             "conv layers + costvol + warp shimmed "
                             "(see scripts/capture_pwc_oracle.py)"},
                  f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"# wrote {OUT_DIR}/pwc_forward.npz")


if __name__ == "__main__":
    main()
