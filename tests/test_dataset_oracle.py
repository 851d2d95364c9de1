"""Flow-dataset parity vs the reference's OWN OpticalFlowDataset
(FISR_tfoptflow/dataset_base.py:99-1104, run verbatim on a synthetic
corpus by scripts/capture_dataset_oracle.py — all captured deviations
were exactly 0.0; every pin here is bit-exact).

Pins data/flow_dataset.FlowDataset's on-disk and sampling contracts:
* ID-file grammar both directions — our reader parses the files the
  reference's `_create_ID_files` wrote; the ID files our writer produces
  were consumed by the reference's `_load_ID_files` at capture (dev 0.0)
  and their bytes are pinned here;
* `from_folder` on a reference-prepared corpus dir (its split manifests,
  mixed reference/our-written Middlebury .flo) reproduces the source
  arrays bit-exactly in ID-file order;
* random-crop slicing semantics (dataset_base.py:578-590): same (y0, x0)
  offsets slice the image PAIR and the flow label identically in ours;
* the documented val-crop design difference: the reference RANDOM-crops
  validation samples (dataset_base.py:640-650) — pinned against its
  captured offsets — while ours center-crops for deterministic metrics.
"""

import json
import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "tf_oracle")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIX, "dataset_manifest.json")),
    reason="dataset_base oracle fixtures not captured")


def _load():
    with open(os.path.join(FIX, "dataset_manifest.json")) as f:
        man = json.load(f)
    return man, np.load(os.path.join(FIX, "dataset_base.npz"))


def _write_corpus(tmp_path, man, z, with_ref_id_files=True):
    from fisr_tpu.data import flo as flo_io
    from fisr_tpu.data.png_io import write_png

    root = str(tmp_path)
    for i, sid in enumerate(man["ids"]):
        write_png(z["pairs"][i, 0], os.path.join(root, f"{sid}_img1.png"))
        write_png(z["pairs"][i, 1], os.path.join(root, f"{sid}_img2.png"))
        flo_io.write_flo(z["flows"][i], os.path.join(root, f"{sid}_flow.flo"))
    if with_ref_id_files:
        for key, name in (("trn_id_bytes", man["id_files"][0]),
                          ("val_id_bytes", man["id_files"][1])):
            with open(os.path.join(root, name), "wb") as f:
                f.write(z[key].tobytes())
    return root


class _Offsets:
    """rng stub feeding _sample a scripted (y0, x0) crop draw."""

    def __init__(self, y0, x0):
        self.seq = [y0, x0]

    def integers(self, lo, hi):
        v = self.seq.pop(0)
        assert lo <= v < hi
        return v


def test_our_reader_parses_reference_id_files(tmp_path):
    from fisr_tpu.data.flow_dataset import _read_id_file

    man, z = _load()
    root = _write_corpus(tmp_path, man, z)
    n_val = int(len(man["ids"]) * man["corpus"]["val_split"])
    trn = _read_id_file(os.path.join(root, man["id_files"][0]))
    val = _read_id_file(os.path.join(root, man["id_files"][1]))
    assert trn == man["ids"][: len(man["ids"]) - n_val]
    assert val == man["ids"][len(man["ids"]) - n_val:]


def test_our_id_files_stay_reference_consumable(tmp_path):
    """The reference consumed these exact bytes at capture (dev 0.0);
    pin that our writer still produces them."""
    from fisr_tpu.data.flow_dataset import _write_id_file

    man, z = _load()
    n_val = int(len(man["ids"]) * man["corpus"]["val_split"])
    path = os.path.join(str(tmp_path), "train_split.txt")
    _write_id_file(path, man["ids"][: len(man["ids"]) - n_val])
    with open(path, "rb") as f:
        assert f.read() == z["our_trn_id_bytes"].tobytes()


def test_from_folder_on_reference_prepared_corpus(tmp_path):
    from fisr_tpu.data.flow_dataset import FlowDataset

    man, z = _load()
    root = _write_corpus(tmp_path, man, z)
    ds = FlowDataset.from_folder(root, val_split=man["corpus"]["val_split"])
    n_val = int(len(man["ids"]) * man["corpus"]["val_split"])
    assert ds.ids == man["ids"]
    assert ds.split_sizes == (len(man["ids"]) - n_val, n_val)
    np.testing.assert_array_equal(ds.pairs, z["pairs"])
    np.testing.assert_array_equal(ds.flows, z["flows"])


def test_train_crop_slicing_matches_reference(tmp_path):
    """Feed the reference's recovered (y0, x0) draws into our _sample:
    image pair and label must crop to its outputs bit-exactly."""
    from fisr_tpu.data.flow_dataset import FlowDataset

    man, z = _load()
    root = _write_corpus(tmp_path, man, z)
    ch, cw = man["corpus"]["crop"]
    ds = FlowDataset.from_folder(root, val_split=man["corpus"]["val_split"],
                                 crop_hw=(ch, cw))
    for k, sid in enumerate(man["crop_sids"]):
        y0, x0 = man["crop_offs"][k]
        ds._rng = _Offsets(y0, x0)
        x, y = ds._sample(ds.ids.index(sid), train=True)
        np.testing.assert_array_equal(
            x, z["crop_imgs"][k].astype(np.float32) / 255.0)
        np.testing.assert_array_equal(y, z["crop_lbls"][k])


def test_val_crop_documented_difference(tmp_path):
    """Reference val crops are random (pinned via captured offsets);
    ours are the deterministic center crop of the same samples."""
    from fisr_tpu.data.flow_dataset import FlowDataset

    man, z = _load()
    ch, cw = man["corpus"]["crop"]
    ids = man["ids"]
    # the reference's captured val outputs ARE offset slices of the source
    for k, sid in enumerate(man["val_ids"]):
        i = ids.index(sid)
        y0, x0 = man["val_offs"][k]
        np.testing.assert_array_equal(
            z["val_images"][k],
            z["pairs"][i][:, y0:y0 + ch, x0:x0 + cw])
        np.testing.assert_array_equal(
            z["val_labels"][k],
            z["flows"][i][y0:y0 + ch, x0:x0 + cw])
    # ours: same slicing math, center offsets, every val batch identical
    root = _write_corpus(tmp_path, man, z)
    ds = FlowDataset.from_folder(root, val_split=man["corpus"]["val_split"],
                                 crop_hw=(ch, cw))
    h, w = man["corpus"]["h"], man["corpus"]["w"]
    y0, x0 = (h - ch) // 2, (w - cw) // 2
    i = ids.index(man["val_ids"][0])
    x, y = ds._sample(i, train=False)
    np.testing.assert_array_equal(
        x, z["pairs"][i][:, y0:y0 + ch, x0:x0 + cw]
        .astype(np.float32) / 255.0)
    np.testing.assert_array_equal(y, z["flows"][i][y0:y0 + ch, x0:x0 + cw])
