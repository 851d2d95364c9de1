"""Pure-Python TensorBundle (TF checkpoint V2) reader/writer.

Pins the container formats (LevelDB table, bundle protos, masked crc32c)
by write -> read round trips, and the full import path: FISRnet params ->
TF-named bundle on disk -> convert.cli --ckpt -> orbax -> exact tree match.
"""

import subprocess
import sys

import jax
import numpy as np
import pytest

from fisr_tpu.convert import tensor_bundle as tb


def test_roundtrip_mixed_dtypes(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a/w": rng.normal(size=(3, 3, 4, 8)).astype(np.float32),
        "a/b": rng.normal(size=(8,)).astype(np.float32),
        "counts": rng.integers(0, 100, size=(5, 2)).astype(np.int64),
        "flags": np.array([True, False, True]),
        "scalar": np.float64(3.25).reshape(()),
        "half": rng.normal(size=(4, 4)).astype(np.float16),
        "empty": np.zeros((0,), np.float32),
        "empty2d": np.zeros((0, 3), np.float32),
    }
    prefix = str(tmp_path / "model.ckpt-100")
    tb.write_bundle(prefix, tensors)
    out = tb.read_bundle(prefix, verify=True)  # crc checked end to end
    assert set(out) == set(tensors)
    for k in tensors:
        assert out[k].dtype == tensors[k].dtype, k
        np.testing.assert_array_equal(out[k], tensors[k])


def test_parse_shape_proto3_empty_dim_is_zero():
    """TF (proto3) serializes a zero-size dim as an EMPTY Dim message —
    the omitted size field must default to 0, not 1."""
    # TensorShapeProto{dim: [Dim{}, Dim{size: 3}]}
    buf = bytes([0x12, 0x00,          # field 2 (Dim), empty payload
                 0x12, 0x02, 0x08, 0x03])  # field 2, Dim{1: 3}
    assert tb._parse_shape(buf) == (0, 3)


def test_roundtrip_many_variables_multiblock(tmp_path):
    # 400 small tensors forces multiple 4KB index/data blocks, exercising
    # prefix compression, restart arrays, and the index-block indirection.
    rng = np.random.default_rng(1)
    tensors = {
        f"net/layer_{i:03d}/sub_{j}/kernel": rng.normal(size=(j + 1, 3)).astype(np.float32)
        for i in range(100) for j in range(4)
    }
    prefix = str(tmp_path / "big")
    tb.write_bundle(prefix, tensors, crc=False)
    out = tb.read_bundle(prefix)
    assert len(out) == 400
    for k in tensors:
        np.testing.assert_array_equal(out[k], tensors[k])


def test_list_variables(tmp_path):
    prefix = str(tmp_path / "lv")
    tb.write_bundle(prefix, {"x": np.zeros((2, 3), np.float32),
                             "y": np.zeros((4,), np.int32)}, crc=False)
    lv = tb.list_variables(prefix)
    assert lv["x"] == ((2, 3), np.dtype("<f4"))
    assert lv["y"] == ((4,), np.dtype("<i4"))


def test_corruption_detected(tmp_path):
    prefix = str(tmp_path / "bad")
    tb.write_bundle(prefix, {"x": np.arange(1024, dtype=np.float32)})
    data_path = prefix + ".data-00000-of-00001"
    raw = bytearray(open(data_path, "rb").read())
    raw[100] ^= 0xFF
    open(data_path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="crc mismatch"):
        tb.read_bundle(prefix, verify=True)
    # and a truncated index is rejected up front
    open(prefix + ".index", "wb").write(b"junk")
    with pytest.raises(ValueError):
        tb.read_bundle(prefix)


def test_snappy_decoder():
    # snappy framing: literals + all three copy-tag widths, incl. an
    # overlapping copy (RLE-style), built by hand against the format spec
    payload = b"abcdefgh" * 7  # 56 bytes: fits a 1-byte literal tag
    lit = bytes([(len(payload) - 1) << 2]) + payload       # literal tag
    copy1 = bytes([((8 - 4) << 2) | 1, 8])                 # len 8, off 8
    copy2 = bytes([((20 - 1) << 2) | 2]) + (16).to_bytes(2, "little")
    src = tb._write_varint(len(payload) + 8 + 20) + lit + copy1 + copy2
    out = tb._snappy_decode(src)
    ref = bytearray(payload)
    for _ in range(8):
        ref.append(ref[-8])
    for _ in range(20):
        ref.append(ref[-16])
    assert out == bytes(ref)


@pytest.mark.slow
def test_fisrnet_full_import_via_cli(tmp_path):
    # End to end: params -> TF-named bundle -> cli --ckpt -> orbax -> load
    from fisr_tpu.convert import tf_import
    from fisr_tpu.models import fisrnet
    from fisr_tpu.train.checkpoint import CheckpointManager

    params = fisrnet.init_params(jax.random.PRNGKey(3))
    tf_vars = tf_import.export_fisrnet(params)
    # optimizer-slot junk that real train checkpoints carry must be ignored
    tf_vars["FISRnet/level_1/enc/level_0/conv/0/w/Adam"] = np.zeros(3, np.float32)
    tf_vars["beta1_power"] = np.float32(0.9).reshape(())
    prefix = str(tmp_path / "FISRnet-122000")
    tb.write_bundle(prefix, tf_vars, crc=False)

    out_dir = str(tmp_path / "orbax")
    r = subprocess.run(
        [sys.executable, "-m", "fisr_tpu.convert.cli", "--model", "fisrnet",
         "--ckpt", prefix, "--out", out_dir, "--step", "122000"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "122000" in r.stdout

    restored = CheckpointManager(out_dir).restore(122000)["params"]
    ref_leaves = jax.tree_util.tree_leaves(params)
    got_leaves = jax.tree_util.tree_leaves(restored)
    assert len(ref_leaves) == len(got_leaves) == 276  # 138 convs x (w, b)
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
