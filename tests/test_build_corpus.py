"""Corpus builder: raw frames -> full training dataset -> trainable store."""

import numpy as np

from fisr_tpu.cli.build_corpus import build_corpus
from fisr_tpu.data.dataset import TrainStore
from fisr_tpu.data.synth import _scene
from fisr_tpu.data.png_io import write_png, list_pngs
import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from the fast lane


def test_build_corpus_end_to_end(tmp_path):
    import jax

    from fisr_tpu.models import pwcnet

    # 12 consecutive RGB frames of a moving scene
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    scene = _scene(np.random.default_rng(0), 12, 96, 128)
    for i in range(12):
        write_png(scene[i].astype(np.uint8), frames_dir / f"fr_{i:03d}.png")

    cfg = pwcnet.PWCNetConfig(pyr_lvls=4, flow_pred_lvl=2, search_range=2,
                              cost_volume_impl="xla")
    pwc = pwcnet.init_params(jax.random.PRNGKey(1), cfg)
    # patch the prepare module's config indirectly: use full-size pwc but at
    # tiny patches the default lg-6-2 also works; keep it cheap with ss calls
    paths = build_corpus(list_pngs(str(frames_dir)), str(tmp_path / "out"),
                         n_samples=3, patch=32, pwc_params=None, seed=0,
                         verbose=False)

    store = TrainStore.from_files(**paths, val_size=1)
    assert store.data.shape == (3, 32, 32, 15)
    assert store.label.shape == (3, 64, 64, 21)
    assert store.flow.shape == (3, 32, 32, 16)
    assert store.flow_ss2.shape == (3, 32, 32, 8)
    assert store.warp.shape == (3, 32, 32, 24)
    assert store.warp_ss2.shape == (3, 32, 32, 12)
    # LR is the exact TF1-bicubic decimation of HR (subsampling identity)
    hr0 = store.label[0].reshape(64, 64, 7, 3)
    lr0 = store.data[0].reshape(32, 32, 5, 3)
    # HR frame 1 (seq idx 0) == window frame 1; LR frame 1 (seq idx 1) ==
    # window frame 2 subsampled... check a frame present in both: window
    # frame 2 = HR seq 1 = LR seq 1
    np.testing.assert_allclose(lr0[:, :, 1], hr0[::2, ::2, 1], atol=1e-6)
    # one training batch flows through
    batch = next(store.batches(2, epoch_seed=0))
    assert batch["data"].shape == (2, 32, 32, 15)
