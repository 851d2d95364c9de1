"""Flow dataset, TB event writer, and offline prep CLI."""

import os
import pytest

import numpy as np

from fisr_tpu.data.augment import AugmentOptions
from fisr_tpu.data.flow_dataset import FlowDataset
from fisr_tpu.utils.tb_writer import TBLogger, crc32c


def test_flow_dataset_synthetic_batches():
    ds = FlowDataset.synthetic(n=6, h=32, w=32, crop_hw=(24, 24),
                               aug=AugmentOptions())
    assert ds.train_size == 5 and ds.val_size == 1
    batches = list(ds.batches(2, train=True, epoch_seed=0))
    assert len(batches) == 2
    b = batches[0]
    assert b["x"].shape == (2, 2, 24, 24, 3)
    assert b["y"].shape == (2, 24, 24, 2)
    assert b["x"].max() <= 1.0
    vb = next(ds.batches(1, train=False))
    assert vb["x"].shape == (1, 2, 24, 24, 3)


def test_eval_batches_yield_partial_tail():
    """Eval iteration must cover EVERY val sample: a final partial batch is
    yielded (train keeps fixed-size batches). A val split smaller than the
    batch size previously yielded nothing, silently making best-checkpoint
    metrics empty."""
    ds = FlowDataset.synthetic(n=8, h=16, w=16, val_split=0.4)  # 5 train / 3 val
    assert ds.val_size == 3
    sizes = [len(b["x"]) for b in ds.batches(2, train=False)]
    assert sizes == [2, 1]
    # val split smaller than batch: one partial batch with all samples
    sizes = [len(b["x"]) for b in ds.batches(8, train=False)]
    assert sizes == [3]
    # threaded path agrees
    sizes = [len(b["x"]) for b in ds.batches(2, train=False, num_workers=2)]
    assert sizes == [2, 1]
    # training contract unchanged: fixed-size batches only
    sizes = [len(b["x"]) for b in ds.batches(2, train=True, epoch_seed=0)]
    assert sizes == [2, 2]


def test_pwc_weight_decay_matches_tf_l2_loss():
    """gamma * sum(l2_loss(v)) with l2_loss = sum(v^2)/2 (reference
    model_pwcnet.py:524) — the decay term must carry the /2."""
    import jax.numpy as jnp

    from fisr_tpu.train.pwc_loss import pwcnet_loss

    params = {"a": jnp.full((2, 2), 3.0), "b": jnp.asarray([1.0, 2.0])}
    y = jnp.zeros((1, 4, 4, 2))
    total = pwcnet_loss(y, [], params=params, gamma=0.1)
    want = 0.1 * 0.5 * (4 * 9.0 + 1.0 + 4.0)
    np.testing.assert_allclose(float(total), want, rtol=1e-6)


def test_flow_dataset_folder_roundtrip(tmp_path):
    from fisr_tpu.data import flo as flo_io
    from fisr_tpu.data.png_io import write_png

    rng = np.random.default_rng(0)
    for i in range(2):
        write_png(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8).astype(np.uint8),
                  tmp_path / f"s{i}_img1.png")
        write_png(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8).astype(np.uint8),
                  tmp_path / f"s{i}_img2.png")
        flo_io.write_flo(rng.normal(size=(16, 16, 2)).astype(np.float32),
                         tmp_path / f"s{i}_flow.flo")
    ds = FlowDataset.from_folder(str(tmp_path), val_split=0.5)
    assert ds.pairs.shape == (2, 2, 16, 16, 3)
    assert ds.flows.shape == (2, 16, 16, 2)


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def test_tb_logger_writes_readable_records(tmp_path):
    lg = TBLogger(str(tmp_path))
    lg.log_scalar("loss", 1.5, step=1)
    lg.log_scalars({"a": 1.0, "b": 2.0}, step=2)
    lg.log_image("img", np.zeros((4, 4, 3), np.uint8), step=3)
    lg.close()
    # validate TFRecord framing + crcs by re-parsing
    import struct

    from fisr_tpu.utils.tb_writer import _masked_crc

    data = open(lg.path, "rb").read()
    pos, n_records = 0, 0
    while pos < len(data):
        (length,) = struct.unpack("<Q", data[pos : pos + 8])
        (hcrc,) = struct.unpack("<I", data[pos + 8 : pos + 12])
        assert hcrc == _masked_crc(data[pos : pos + 8])
        payload = data[pos + 12 : pos + 12 + length]
        (pcrc,) = struct.unpack("<I", data[pos + 12 + length : pos + 16 + length])
        assert pcrc == _masked_crc(payload)
        pos += 16 + length
        n_records += 1
    assert n_records == 4  # file_version + 3 events


@pytest.mark.slow
def test_prepare_cli_roundtrip(tmp_path):
    """flow-from-mat -> warp-from-mat produce reference-format artifacts."""
    from fisr_tpu.cli.prepare import main as prep_main
    from fisr_tpu.data import flo as flo_io
    from fisr_tpu.data import matio
    from fisr_tpu.data.synth import synthetic_arrays

    a = synthetic_arrays(n_samples=1, h=32, w=32)
    mat = str(tmp_path / "lr.mat")
    matio.write_train_mat(mat, "LR_data", a["lr"])
    flo_out = str(tmp_path / "f.flo")
    prep_main(["flow-from-mat", "--mat", mat, "--ss", "1", "--out", flo_out])
    flows = flo_io.read_flo_5dim(flo_out)
    assert flows.shape == (1, 8, 32, 32, 2)

    warp_out = str(tmp_path / "w.mat")
    prep_main(["warp-from-mat", "--mat", mat, "--flo", flo_out, "--ss", "1",
               "--out", warp_out])
    warps = matio.read_warp_mat(warp_out)
    assert warps.shape == (1, 8, 32, 32, 3)
    assert 0.0 <= warps.min() and warps.max() <= 1.0

    # stride-2 variant
    flo2 = str(tmp_path / "f2.flo")
    prep_main(["flow-from-mat", "--mat", mat, "--ss", "2", "--out", flo2])
    assert flo_io.read_flo_5dim(flo2).shape == (1, 4, 32, 32, 2)


def test_flow_dataset_persisted_id_splits(tmp_path):
    # dataset_base.py:197-265 parity: the split is written to ID files on
    # first load and reused byte-identically afterwards, even when the
    # corpus gains new samples.
    from fisr_tpu.data import flo as flo_io
    from fisr_tpu.data.png_io import write_png

    def add_sample(i):
        rng = np.random.default_rng(i)
        for tag in ("img1", "img2"):
            write_png(rng.integers(0, 255, (16, 16, 3)).astype(np.uint8),
                      tmp_path / f"s{i:02d}_{tag}.png")
        flo_io.write_flo(rng.normal(size=(16, 16, 2)).astype(np.float32),
                         tmp_path / f"s{i:02d}_flow.flo")

    for i in range(6):
        add_sample(i)
    ds1 = FlowDataset.from_folder(str(tmp_path), val_split=0.25)
    trn_file = tmp_path / "train_0.25split.txt"
    val_file = tmp_path / "val_0.25split.txt"
    assert trn_file.exists() and val_file.exists()
    manifest = trn_file.read_bytes() + val_file.read_bytes()
    assert b"###" in manifest  # reference's tuple separator

    # reload: identical split, manifests untouched
    ds2 = FlowDataset.from_folder(str(tmp_path), val_split=0.25)
    assert (trn_file.read_bytes() + val_file.read_bytes()) == manifest
    np.testing.assert_array_equal(ds1.pairs, ds2.pairs)
    assert ds1.train_size == ds2.train_size == 5
    assert ds1.val_size == ds2.val_size == 1

    # corpus regenerated with MORE samples: split stays what was persisted
    add_sample(6)
    ds3 = FlowDataset.from_folder(str(tmp_path), val_split=0.25)
    assert ds3.train_size == 5 and ds3.val_size == 1
    np.testing.assert_array_equal(ds3.flows, ds1.flows)

    # a manifest pointing at deleted samples is a hard error
    os.remove(tmp_path / "s03_img1.png")
    try:
        FlowDataset.from_folder(str(tmp_path), val_split=0.25)
        assert False, "expected FileNotFoundError"
    except FileNotFoundError as e:
        assert "s03" in str(e)

    # opt-out keeps the in-memory fractional behavior, no files consulted
    add_sample(3)
    ds4 = FlowDataset.from_folder(str(tmp_path), val_split=0.25,
                                  persist_split=False)
    assert ds4.train_size + ds4.val_size == 7
