"""TF1 checkpoint -> fisr_tpu param-pytree conversion (pure name mapping).

The reference ships its weights as TF1 checkpoints (FISRnet-122000 for
FISRnet, pwcnet.ckpt-595000 for the flow model — neither is bundled in the
repo; README.md:62-64,102 point at downloads). Conversion is a PURE rename:
our pytrees deliberately mirror the TF variable scopes (models/fisrnet.py,
models/pwcnet.py), conv kernels are HWIO on both sides, and deconv kernels
keep TF's conv2d_transpose [k, k, OUT, IN] layout (models/pwcnet._deconv
consumes it natively).

Input is a flat `{tf_variable_name: np.ndarray}` dict. Producing that dict
from a `.ckpt` requires a TF installation (`tf.train.load_checkpoint`) or
any TensorBundle reader (convert/tensor_bundle.py, no TF needed) — the
mapping below is the part that must be exact. It is round-trip tested AND
pinned against a real tf.train.Saver checkpoint of the reference's own
graph (tests/test_tf_oracle.py).

FISRnet variable grammar (FISRnet.py:73-173 + ops.py):
    FISRnet/level_{1,2,3}/enc/level_{0,1,2}/conv/0/{w,b}
    FISRnet/level_*/enc/level_*/res_block/{0,1}/conv/{0,1}/{w,b}
    FISRnet/level_*/bottleneck/{conv/0,res_block/0/conv/{0,1}}/{w,b}
    FISRnet/level_*/dec/level_{2,1,0}/{resize,conv/0,res_block/...}/{w,b}
    FISRnet/level_*/{FI-SR,SR}/{conv/0,res_block/0/...,conv/1,conv/2}/{w,b}

PWC-Net variable grammar (model_pwcnet.py, tf.layers kernel/bias names):
    pwcnet/featpyr/conv{lvl}{a,aa,b}/{kernel,bias}
    pwcnet/predict_flow/conv{lvl}_{0..4}/{kernel,bias}
    pwcnet/predict_flow/flow{lvl}/{kernel,bias}
    pwcnet/ctxt/dc_conv{lvl}{1..7}/{kernel,bias}
    pwcnet/upsample/up_{flow,feat}{lvl}/{kernel,bias}   (transpose convs)
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["fisrnet_name_map", "pwcnet_name_map", "convert_fisrnet",
           "convert_pwcnet", "export_fisrnet", "export_pwcnet"]


def _conv_entries(tf_prefix: str, path: tuple, names=("w", "b")) -> Dict[str, tuple]:
    return {f"{tf_prefix}/{names[0]}": path + ("w",),
            f"{tf_prefix}/{names[1]}": path + ("b",)}


def _res_entries(tf_prefix: str, path: tuple, names=("w", "b")) -> Dict[str, tuple]:
    out = {}
    out.update(_conv_entries(f"{tf_prefix}/conv/0", path + ("conv0",), names))
    out.update(_conv_entries(f"{tf_prefix}/conv/1", path + ("conv1",), names))
    return out


def fisrnet_name_map() -> Dict[str, tuple]:
    """{tf_var_name: pytree key path} for all 276 FISRnet variables
    (138 convs x {w, b})."""
    m: Dict[str, tuple] = {}
    for lvl in (1, 2, 3):
        base = f"FISRnet/level_{lvl}"
        p = (f"level_{lvl}",)
        for k in (0, 1, 2):
            ep = p + ("enc", f"level_{k}")
            m.update(_conv_entries(f"{base}/enc/level_{k}/conv/0", ep + ("conv_in",)))
            m.update(_res_entries(f"{base}/enc/level_{k}/res_block/0", ep + ("res0",)))
            m.update(_res_entries(f"{base}/enc/level_{k}/res_block/1", ep + ("res1",)))
        bp = p + ("bottleneck",)
        m.update(_conv_entries(f"{base}/bottleneck/conv/0", bp + ("conv_in",)))
        m.update(_res_entries(f"{base}/bottleneck/res_block/0", bp + ("res0",)))
        for k in (2, 1, 0):
            dp = p + ("dec", f"level_{k}")
            m.update(_conv_entries(f"{base}/dec/level_{k}/resize", dp + ("resize",)))
            m.update(_conv_entries(f"{base}/dec/level_{k}/conv/0", dp + ("conv_in",)))
            m.update(_res_entries(f"{base}/dec/level_{k}/res_block/0", dp + ("res0",)))
            m.update(_res_entries(f"{base}/dec/level_{k}/res_block/1", dp + ("res1",)))
        for tf_head, our_head in (("FI-SR", "fisr"), ("SR", "sr")):
            hp = p + (our_head,)
            m.update(_conv_entries(f"{base}/{tf_head}/conv/0", hp + ("conv0",)))
            m.update(_res_entries(f"{base}/{tf_head}/res_block/0", hp + ("res0",)))
            m.update(_conv_entries(f"{base}/{tf_head}/conv/1", hp + ("conv1",)))
            m.update(_conv_entries(f"{base}/{tf_head}/conv/2", hp + ("conv2",)))
    return m


def pwcnet_name_map(pyr_lvls: int = 6, flow_pred_lvl: int = 2,
                    use_res_cx: bool = True) -> Dict[str, tuple]:
    kb = ("kernel", "bias")
    m: Dict[str, tuple] = {}
    for lvl in range(1, pyr_lvls + 1):
        fp = ("feat", f"level_{lvl}")
        m.update(_conv_entries(f"pwcnet/featpyr/conv{lvl}a", fp + ("a",), kb))
        m.update(_conv_entries(f"pwcnet/featpyr/conv{lvl}aa", fp + ("aa",), kb))
        m.update(_conv_entries(f"pwcnet/featpyr/conv{lvl}b", fp + ("b",), kb))
    for lvl in range(pyr_lvls, flow_pred_lvl - 1, -1):
        lp = ("flow", f"level_{lvl}")
        for i in range(5):
            m.update(_conv_entries(f"pwcnet/predict_flow/conv{lvl}_{i}",
                                   lp + (f"conv{i}",), kb))
        m.update(_conv_entries(f"pwcnet/predict_flow/flow{lvl}", lp + ("pred",), kb))
        if use_res_cx or lvl == flow_pred_lvl:
            cp = ("ctx", f"level_{lvl}")
            for i in range(1, 8):
                m.update(_conv_entries(f"pwcnet/ctxt/dc_conv{lvl}{i}",
                                       cp + (f"dc{i}",), kb))
        if lvl != flow_pred_lvl:
            up = ("up", f"level_{lvl}")
            m.update(_conv_entries(f"pwcnet/upsample/up_flow{lvl}",
                                   up + ("flow",), kb))
            m.update(_conv_entries(f"pwcnet/upsample/up_feat{lvl}",
                                   up + ("feat",), kb))
    return m


def _set_path(tree: dict, path: tuple, value) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _convert(tf_vars: Dict[str, np.ndarray], name_map: Dict[str, tuple]) -> dict:
    params: dict = {}
    missing = [k for k in name_map if k not in tf_vars]
    if missing:
        raise KeyError(f"{len(missing)} variables missing from the checkpoint, "
                       f"e.g. {missing[:3]}")
    for tf_name, path in name_map.items():
        # pure rename, no layout fix-ups: conv kernels are HWIO on both
        # sides, and deconv kernels keep TF's [k, k, OUT, IN] layout (our
        # _deconv consumes it natively via transpose_kernel=True)
        _set_path(params, path, np.asarray(tf_vars[tf_name], np.float32))
    return params


def convert_fisrnet(tf_vars: Dict[str, np.ndarray]) -> dict:
    """TF FISRnet checkpoint variables -> fisrnet param pytree."""
    return _convert(tf_vars, fisrnet_name_map())


def normalize_tf_vars(tf_vars: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip ':0' suffixes and drop optimizer slots / bookkeeping variables
    that ride along in TF1 train checkpoints (Adam moments, beta powers,
    global_step) — everything the name maps don't cover."""
    tf_vars = {k.split(":")[0]: v for k, v in tf_vars.items()}
    return {k: v for k, v in tf_vars.items()
            if not (k.endswith(("/Adam", "/Adam_1"))
                    or k.split("/")[-1] in ("beta1_power", "beta2_power",
                                            "global_step"))}


def load_tf_checkpoint(prefix: str, model: str, verify_crc: bool = False,
                       **convert_kw) -> dict:
    """ONE-CALL path from a TF1 TensorBundle checkpoint prefix (the format of
    the released FISRnet-122000 / pwcnet.ckpt-595000 weights,
    /root/reference/FISRnet.py:1101-1115, README.md:62-64) to a ready param
    pytree: read bundle -> normalize/drop slots -> scope-name convert ->
    structural validation against a fresh init. No TF required anywhere
    (convert/tensor_bundle.py is a pure-Python bundle reader).

    `model` is 'fisrnet' or 'pwcnet'. Raises KeyError listing missing
    variables if the checkpoint does not cover the param tree.
    """
    import jax

    from fisr_tpu.convert.tensor_bundle import read_bundle
    from fisr_tpu.models import fisrnet as fisrnet_mod
    from fisr_tpu.models import pwcnet as pwcnet_mod

    tf_vars = normalize_tf_vars(read_bundle(prefix, verify=verify_crc))
    if model == "fisrnet":
        params = convert_fisrnet(tf_vars)
        ref = fisrnet_mod.init_params(jax.random.PRNGKey(0))
    elif model == "pwcnet":
        params = convert_pwcnet(tf_vars, **convert_kw)
        ref = pwcnet_mod.init_params(jax.random.PRNGKey(0))
    else:
        raise ValueError(f"unknown model {model!r}")
    ref_flat, ref_def = jax.tree_util.tree_flatten(ref)
    got_flat, got_def = jax.tree_util.tree_flatten(params)
    if ref_def != got_def:
        raise ValueError(f"converted {model} tree structure mismatch")
    for r, g in zip(ref_flat, got_flat):
        if tuple(r.shape) != tuple(g.shape):
            raise ValueError(
                f"converted {model} shape mismatch: {r.shape} vs {g.shape}")
    return params


def convert_pwcnet(tf_vars: Dict[str, np.ndarray], pyr_lvls: int = 6,
                   flow_pred_lvl: int = 2, use_res_cx: bool = True) -> dict:
    return _convert(tf_vars, pwcnet_name_map(pyr_lvls, flow_pred_lvl, use_res_cx))


def _get_path(tree, path):
    for key in path:
        tree = tree[key]
    return tree


def export_fisrnet(params: dict) -> Dict[str, np.ndarray]:
    """Inverse mapping (our pytree -> TF var dict) — used for round-trip
    testing and for exporting weights back to the reference format."""
    return {name: np.asarray(_get_path(params, path))
            for name, path in fisrnet_name_map().items()}


def export_pwcnet(params: dict, **kw) -> Dict[str, np.ndarray]:
    return {name: np.asarray(_get_path(params, path))
            for name, path in pwcnet_name_map(**kw).items()}
