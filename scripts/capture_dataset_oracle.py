"""Capture the reference's OpticalFlowDataset (FISR_tfoptflow/dataset_base.py:
99-1104) running VERBATIM on a synthetic on-disk corpus — the oracle for
data/flow_dataset.FlowDataset's on-disk and sampling contracts.

What is verbatim reference code here: the whole dataset lifecycle our
FlowDataset claims parity with — `prepare`/`_create_ID_files` (the
`img1###img2###flow` ID-file grammar, dataset_base.py:248-254),
`_load_ID_files` (:256-375), `_preload_all_samples`/`_load_sample`
(:376-531), the seeded shuffle + `next_batch` pointer/wrap semantics
(:430-490), and the random-crop preprocessing in `_get_train_samples`
(:578-590: y offset drawn before x, SAME offsets slicing image pair and
flow label). Also `optflow.flow_read`/`flow_write` (:65-161), pinning
Middlebury .flo cross-compat in BOTH directions against data/flo.py.

What is shimmed / ours (and why):
  * the dataset SUBCLASS glue (`set_folders`, `_build_ID_sets`,
    `simplify_IDs`) — abstract in the base (raise NotImplementedError);
    tfoptflow ships them per-dataset (FlyingChairs etc., not vendored).
    The glue only lists file names; every behavior captured is base-class.
  * skimage.io — not installed; `imread` := our png_io.read_png (both
    return RGB uint8 for RGB PNGs), `imsave` unused here.
  * FISR_tfoptflow.utils — not vendored (one of the 8 missing modules);
    `clean_dst_file` is implemented to its documented one-line contract
    (ensure parent dir, drop stale file), `scale` unused (aug_type=None —
    the Augmenter is pinned separately by capture_augment_oracle.py).
  * options: _DEFAULT_DS_TRAIN_OPTIONS with in_memory=True,
    crop_preproc=(48, 64), aug_type=None, val_split=0.2 — isolates the
    load/split/crop/batch path (the heavy-aug path needs upstream
    `utils.scale`).

Deliberate non-goals (documented design differences, not drift): our
batches() reshuffles per epoch instead of reproducing next_batch's
mid-epoch wrap reshuffle; normalizes x to [0,1] at assembly (the
reference divides inside the model's adapt_x); and center-crops val
samples for deterministic metrics where the reference RANDOM-crops them
(dataset_base.py:640-650 — its val numbers move run to run). The captured
wrap sequence is stored for the record, not pinned against our iterator.

Prints measured deviations; the test (tests/test_dataset_oracle.py) pins
~2-10x above them per repo convention.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/capture_dataset_oracle.py
"""

import json
import os
import sys
import tempfile
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT_DIR = os.path.join(REPO, "tests", "fixtures", "tf_oracle")

N, H, W = 10, 64, 96
CROP = (48, 64)
VAL_SPLIT = 0.2
BATCH = 3
SEED = 1969  # the reference's default random_seed (dataset_base.py:40)


def install_shims():
    def _clean_dst_file(dst_file):
        dst_dir = os.path.dirname(dst_file)
        if dst_dir and not os.path.exists(dst_dir):
            os.makedirs(dst_dir)
        if os.path.exists(dst_file):
            os.remove(dst_file)

    sys.modules.setdefault(
        "FISR_tfoptflow.utils",
        types.SimpleNamespace(scale=None, clean_dst_file=_clean_dst_file))
    from fisr_tpu.data.png_io import read_png
    sk = types.ModuleType("skimage")
    sk_io = types.ModuleType("skimage.io")
    sk_io.imread = lambda p: np.asarray(read_png(p))
    sk_io.imsave = None
    sk.io = sk_io
    sys.modules.setdefault("skimage", sk)
    sys.modules.setdefault("skimage.io", sk_io)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def make_corpus(rng):
    """Smooth multi-frequency pairs + spatially-varying flows.

    Flow fields vary per-pixel so a crop's content identifies its offset
    uniquely (the capture recovers the reference's crop offsets by exact
    slice search).
    """
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    pairs = np.zeros((N, 2, H, W, 3), np.uint8)
    flows = np.zeros((N, H, W, 2), np.float32)
    for i in range(N):
        ph = rng.uniform(0, 6.28, (2, 3))
        fr = rng.uniform(0.05, 0.3, (2, 3))
        for t in range(2):
            img = np.stack([127.5 + 127.5 * np.sin(fr[t, c] * (xx + 7 * t)
                                                   + fr[t, (c + 1) % 3] * yy
                                                   + ph[t, c])
                            for c in range(3)], -1)
            pairs[i, t] = img.astype(np.uint8)
        a, b = rng.uniform(-4, 4, 2)
        flows[i, :, :, 0] = a * np.sin(0.07 * yy + 0.11 * xx + a)
        flows[i, :, :, 1] = b * np.cos(0.05 * yy + 0.13 * xx + b)
    return pairs, flows


def find_crop_offset(full, crop):
    ch, cw = crop.shape[:2]
    for y0 in range(full.shape[0] - ch + 1):
        for x0 in range(full.shape[1] - cw + 1):
            if np.array_equal(full[y0:y0 + ch, x0:x0 + cw], crop):
                return y0, x0
    raise AssertionError("crop not found in source sample")


def main():
    install_shims()
    from FISR_tfoptflow import dataset_base, optflow
    from fisr_tpu.data import flo as flo_io
    from fisr_tpu.data.flow_dataset import (FlowDataset, _read_id_file,
                                            _write_id_file)
    from fisr_tpu.data.png_io import write_png

    rng = np.random.default_rng(20260820)
    pairs, flows = make_corpus(rng)
    ids = [f"{i:04d}" for i in range(N)]

    root = tempfile.mkdtemp(prefix="dataset_oracle_")
    for i, sid in enumerate(ids):
        write_png(pairs[i, 0], os.path.join(root, f"{sid}_img1.png"))
        write_png(pairs[i, 1], os.path.join(root, f"{sid}_img2.png"))
        flo_path = os.path.join(root, f"{sid}_flow.flo")
        if i % 2 == 0:  # half written by the reference, half by us:
            optflow.flow_write(flows[i], flo_path)  # optflow.py:145-161
        else:
            flo_io.write_flo(flows[i], flo_path)

    # --- Middlebury .flo cross-read, both directions, both writers -------
    flo_dev = 0.0
    for i, sid in enumerate(ids):
        flo_path = os.path.join(root, f"{sid}_flow.flo")
        ref_read = optflow.flow_read(flo_path)
        our_read = flo_io.read_flo(flo_path)
        flo_dev = max(flo_dev,
                      float(np.abs(ref_read - flows[i]).max()),
                      float(np.abs(our_read - flows[i]).max()))
    print(f"flo cross-read (both writers x both readers) max dev: {flo_dev}")

    # --- the verbatim reference dataset ----------------------------------
    class SynthFlowDataset(dataset_base.OpticalFlowDataset):
        """Subclass glue only — every captured behavior is base-class."""

        def __init__(self, mode, ds_root, options):
            self.min_flow = self.avg_flow = self.max_flow = 0.0
            super().__init__(mode=mode, ds_root=ds_root, options=options)

        def set_folders(self):
            self._trn_dir = self._val_dir = self._tst_dir = self._ds_root
            self._trn_lbl_dir = self._val_lbl_dir = self._ds_root
            self._val_pred_lbl_dir = self._ds_root + "/pred"
            self._tst_pred_lbl_dir = self._ds_root + "/pred"

        def _build_ID_sets(self):
            tuples = [(f"{s}_img1.png", f"{s}_img2.png", f"{s}_flow.flo")
                      for s in ids]
            n_val = int(len(tuples) * self.opts["val_split"])
            self._trn_IDs = tuples[:len(tuples) - n_val]
            self._val_IDs = tuples[len(tuples) - n_val:]
            self._tst_IDs = []

        def simplify_IDs(self, IDs):
            return [ID[0][:-len("_img1.png")] for ID in IDs]

    opts = dict(dataset_base._DEFAULT_DS_TRAIN_OPTIONS)
    opts.update(verbose=False, in_memory=True, crop_preproc=CROP,
                aug_type=None, val_split=VAL_SPLIT, random_seed=SEED)
    ds = SynthFlowDataset("train_with_val", root, opts)

    # ID files as the reference wrote them (prepare -> _create_ID_files)
    with open(ds._trn_IDs_file, "rb") as f:
        trn_id_bytes = f.read()
    with open(ds._val_IDs_file, "rb") as f:
        val_id_bytes = f.read()
    id_basename = (os.path.basename(ds._trn_IDs_file),
                   os.path.basename(ds._val_IDs_file))
    print(f"reference ID files: {id_basename}")

    # our reader on the reference's files
    our_trn_ids = _read_id_file(ds._trn_IDs_file)
    our_val_ids = _read_id_file(ds._val_IDs_file)
    assert our_trn_ids == ids[:8] and our_val_ids == ids[8:], (
        our_trn_ids, our_val_ids)

    # our loader on the reference-prepared folder (same split manifests)
    ours = FlowDataset.from_folder(root, val_split=VAL_SPLIT)
    assert ours.split_sizes == (len(ds._trn_IDs), len(ds._val_IDs))
    assert ours.ids == ids
    load_dev = max(float(np.abs(ours.pairs.astype(np.int32)
                                - pairs.astype(np.int32)).max()),
                   float(np.abs(ours.flows - flows).max()))
    print(f"our from_folder vs source corpus max dev: {load_dev}")

    # reference preloaded train/val samples vs source (in ID-file order)
    pre_dev = 0.0
    for n, ID in enumerate(ds._trn_IDs):
        i = ids.index(ID[0][:-len("_img1.png")])
        pre_dev = max(pre_dev,
                      float(np.abs(ds._images_train[n].astype(np.int32)
                                   - pairs[i].astype(np.int32)).max()),
                      float(np.abs(ds._labels_train[n] - flows[i]).max()))
    print(f"reference preload vs source max dev: {pre_dev}")

    # --- seeded next_batch stream across a wrap (trn_size=8, batch=3) ----
    batches = []
    for _ in range(4):
        images, labels, IDs = ds.next_batch(BATCH, split="train")
        batches.append((np.asarray(images), np.asarray(labels),
                        [str(s) for s in IDs]))
    batch_ids = [b[2] for b in batches]
    print(f"next_batch ID stream (wrap after 3rd): {batch_ids}")

    # recover each crop's offsets by exact search against its source flow
    crop_imgs, crop_lbls, crop_sids, crop_offs = [], [], [], []
    for images, labels, IDs in batches[:2]:
        for k, sid in enumerate(IDs):
            i = ids.index(sid)
            y0, x0 = find_crop_offset(flows[i], labels[k])
            assert np.array_equal(
                pairs[i][:, y0:y0 + CROP[0], x0:x0 + CROP[1]], images[k])
            crop_imgs.append(images[k])
            crop_lbls.append(labels[k])
            crop_sids.append(sid)
            crop_offs.append((y0, x0))
    print(f"crop offsets recovered (y0,x0): {crop_offs}")

    # --- val path: loaded preprocess=False, then RANDOM-cropped too ------
    # (dataset_base.py:640-650 random-crops validation samples so they
    # batch with training samples; our FlowDataset center-crops val for
    # deterministic metrics — documented design difference, the crop
    # SLICING semantics are what this pins)
    val_images, val_labels, val_IDs = map(
        np.asarray, ds.get_samples(idx=[0, 1], split="val", as_list=False,
                                   simple_IDs=True))
    val_dev = 0.0
    val_offs = []
    for k, sid in enumerate(val_IDs):
        i = ids.index(str(sid))
        y0, x0 = find_crop_offset(flows[i], val_labels[k])
        val_offs.append((y0, x0))
        val_dev = max(val_dev,
                      float(np.abs(val_images[k].astype(np.int32)
                                   - pairs[i][:, y0:y0 + CROP[0],
                                              x0:x0 + CROP[1]]
                                   .astype(np.int32)).max()))
    print(f"reference val samples (random-cropped, offs {val_offs}) "
          f"max dev: {val_dev}")

    # --- reverse direction: OUR ID files consumed by the reference -------
    root2 = tempfile.mkdtemp(prefix="dataset_oracle_rev_")
    for i, sid in enumerate(ids):
        write_png(pairs[i, 0], os.path.join(root2, f"{sid}_img1.png"))
        write_png(pairs[i, 1], os.path.join(root2, f"{sid}_img2.png"))
        flo_io.write_flo(flows[i], os.path.join(root2, f"{sid}_flow.flo"))
    _write_id_file(os.path.join(root2, f"train_{VAL_SPLIT}split.txt"), ids[:8])
    _write_id_file(os.path.join(root2, f"val_{VAL_SPLIT}split.txt"), ids[8:])
    with open(os.path.join(root2, f"train_{VAL_SPLIT}split.txt"), "rb") as f:
        our_trn_id_bytes = f.read()
    ds2 = SynthFlowDataset("train_with_val", root2, opts)
    assert [t[0] for t in ds2._trn_IDs] == [f"{s}_img1.png" for s in ids[:8]]
    rev_dev = 0.0
    for n in range(len(ds2._trn_IDs)):
        rev_dev = max(rev_dev,
                      float(np.abs(ds2._images_train[n].astype(np.int32)
                                   - pairs[n].astype(np.int32)).max()))
    print(f"reference loader on OUR ID files max dev: {rev_dev}")

    os.makedirs(OUT_DIR, exist_ok=True)
    np.savez_compressed(
        os.path.join(OUT_DIR, "dataset_base.npz"),
        pairs=pairs, flows=flows,
        trn_id_bytes=np.frombuffer(trn_id_bytes, np.uint8),
        val_id_bytes=np.frombuffer(val_id_bytes, np.uint8),
        our_trn_id_bytes=np.frombuffer(our_trn_id_bytes, np.uint8),
        crop_imgs=np.stack(crop_imgs), crop_lbls=np.stack(crop_lbls),
        crop_offs=np.asarray(crop_offs, np.int32),
        val_images=val_images, val_labels=val_labels,
        val_offs=np.asarray(val_offs, np.int32),
    )
    manifest = {
        "source": "FISR_tfoptflow/dataset_base.py:99-1104 run verbatim "
                  "(subclass glue only; see capture script docstring)",
        "corpus": {"n": N, "h": H, "w": W, "crop": list(CROP),
                   "val_split": VAL_SPLIT, "batch": BATCH, "seed": SEED},
        "ids": ids,
        "id_files": list(id_basename),
        "crop_sids": crop_sids,
        "crop_offs": [list(o) for o in crop_offs],
        "batch_id_stream": batch_ids,
        "val_ids": [str(s) for s in val_IDs],
        "val_offs": [list(o) for o in val_offs],
        "measured": {"flo_cross_read": flo_dev, "from_folder": load_dev,
                     "ref_preload": pre_dev, "val": val_dev,
                     "ref_on_our_id_files": rev_dev},
    }
    with open(os.path.join(OUT_DIR, "dataset_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print("wrote dataset_base.npz + dataset_manifest.json")


if __name__ == "__main__":
    main()
