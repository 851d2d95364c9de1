"""Cross-validate our TF-free WRITERS with TensorFlow's real READERS.

The bundle/event READERS are pinned against real TF-written files
(tests/test_tf_oracle.py); these tests close the other direction — files
WE write must parse with TF's own parsers:

  * utils/tb_writer.TBLogger events -> tf summary_iterator (the actual
    TensorBoard record/proto/CRC path)
  * convert/tensor_bundle.write_bundle -> tf.train.load_checkpoint (the
    actual TensorBundle reader the released .ckpt files come from)

Gated on TF being importable (it is in this image; the tests self-skip
elsewhere). Slow lane: the TF import alone costs ~8 s.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

tf = pytest.importorskip("tensorflow")


def test_tb_events_parse_with_tf(tmp_path):
    from fisr_tpu.utils.tb_writer import TBLogger

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    logger = TBLogger(str(tmp_path))
    logger.log_scalar("train/loss", 0.125, step=3)
    logger.log_scalars({"val/EPE": 2.5, "val/loss": 1.0}, step=4)
    logger.log_image("val/panel", img, step=4)
    logger.close()

    events = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert len(events) == 1
    seen = {}
    imgs = {}
    for ev in tf.compat.v1.train.summary_iterator(
            os.path.join(tmp_path, events[0])):
        for v in ev.summary.value:
            if v.HasField("simple_value"):
                seen[(v.tag, ev.step)] = v.simple_value
            if v.HasField("image"):
                imgs[(v.tag, ev.step)] = v.image
    assert seen[("train/loss", 3)] == pytest.approx(0.125)
    assert seen[("val/EPE", 4)] == pytest.approx(2.5)
    assert seen[("val/loss", 4)] == pytest.approx(1.0)
    im = imgs[("val/panel", 4)]
    assert (im.height, im.width) == (16, 24)
    decoded = np.asarray(tf.io.decode_png(im.encoded_image_string))
    np.testing.assert_array_equal(decoded, img)


def test_write_bundle_reads_with_tf(tmp_path):
    from fisr_tpu.convert.tensor_bundle import write_bundle

    rng = np.random.default_rng(11)
    tensors = {
        "FISRnet/level_1/enc/level_0/conv/0/w": rng.standard_normal(
            (3, 3, 4, 8)).astype(np.float32),
        "FISRnet/level_1/enc/level_0/conv/0/b": rng.standard_normal(
            (8,)).astype(np.float32),
        "pwcnet/featpyr/conv1a/kernel": rng.standard_normal(
            (3, 3, 3, 16)).astype(np.float32),
        "odd/vector": rng.standard_normal((7,)).astype(np.float32),
        "odd/scalarish": rng.standard_normal((1, 1, 2, 2)).astype(np.float32),
    }
    prefix = str(tmp_path / "ours.ckpt")
    write_bundle(prefix, tensors)

    reader = tf.train.load_checkpoint(prefix)
    names = sorted(reader.get_variable_to_shape_map())
    assert names == sorted(tensors)
    for name, want in tensors.items():
        got = reader.get_tensor(name)
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(got, want, err_msg=name)
