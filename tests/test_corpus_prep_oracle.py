"""Train-data-prep parity vs the reference's OWN prep scripts.

Fixtures from scripts/capture_corpus_prep_oracle.py: the verbatim
FISR_pwcnet_predict_from_mat.py + FISR_warp_mat_with_flo.py chains
(reference readers on OUR .mat, real predict_from_img_pairs on
deterministic weights, reference write_flow/warp_flow) for ss in {1, 2},
plus an amplified-flow warp chain that makes layout/sign bugs show at
full scale (swapped fwd/bwd positions read 66.6 u8 vs our 0.56).

Bounds calibrated at capture:
  * flows: rms dev 7.3% of flow rms — the documented x2-up/AA-down resize
    chain deviation (skimage-semantics cv2 in the capture vs TF1-legacy
    bilinear on device), same class as the video oracle's flow stage;
  * warps on identical flows: max 0.56 u8 count (cv2.remap's 1/32
    fixed-point coordinate quantization vs our exact bilinear).
"""

import json
import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "tf_oracle")

slow = pytest.mark.slow
needs_fixture = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIX, "corpus_prep_manifest.json")),
    reason="corpus-prep oracle fixtures not captured")


@pytest.fixture(scope="module")
def oracle():
    with open(os.path.join(FIX, "corpus_prep_manifest.json")) as f:
        man = json.load(f)
    z = np.load(os.path.join(FIX, "corpus_prep.npz"))
    return man, z


@needs_fixture
@pytest.mark.parametrize("ss", [1, 2])
def test_flo_reader_reads_reference_written_file(oracle, ss):
    """Our 5-dim .flo reader on the file the reference's write_flow
    produced — byte-contract pin in the reference-writes direction."""
    from fisr_tpu.data import flo as flo_io

    _, z = oracle
    got = flo_io.read_flo_5dim(os.path.join(FIX, f"corpus_ss{ss}.flo"))
    np.testing.assert_array_equal(got, z[f"flow_ss{ss}"])


@needs_fixture
@pytest.mark.parametrize("ss", [1, 2])
def test_warps_match_reference_on_identical_flows(oracle, ss):
    """warps_for_sequences vs the reference's warp loop (YUV2RGB_matlab ->
    cv2.remap at flow*0.5 BORDER_REPLICATE -> RGB2YUV_matlab) on the SAME
    flows: only interpolator quantization may differ."""
    from fisr_tpu.cli.prepare import warps_for_sequences

    man, z = oracle
    ours = warps_for_sequences(z["data_yuv"], z[f"flow_ss{ss}"], ss)
    dev = np.abs(ours - z[f"warp_ss{ss}"]).max()
    assert dev <= 1.5, dev  # measured 0.36 (u8 counts)


@needs_fixture
def test_amplified_warp_chain_pins_layout(oracle):
    """~4 px distinct-direction flows per (num, position): a fwd/bwd
    position swap reads ~67 u8 counts, ours must stay ~quantization."""
    from fisr_tpu.cli.prepare import warps_for_sequences

    man, z = oracle
    ours = warps_for_sequences(z["data_yuv"], z["flow_amp"], 1)
    ref = z["warp_amp"]
    dev = np.abs(ours - ref).max()
    assert dev <= 2.0, dev  # measured 0.56
    n, h, w = man["n"], man["h"], man["w"]
    swapped = ref.reshape(n, 4, 2, h, w, 3)[:, :, ::-1].reshape(ref.shape)
    assert np.abs(ours - swapped).max() > 10 * dev


@slow
@needs_fixture
@pytest.mark.parametrize("ss", [1, 2])
def test_flows_match_reference_prep_chain(oracle, ss):
    """flows_for_sequences (device x2-trick pipeline) vs the reference's
    full prep chain on identical weights/frames: resize-chain-bounded."""
    import jax

    from fisr_tpu.cli.prepare import flows_for_sequences
    from fisr_tpu.convert.oracle import deterministic_tf_vars, tf_vars_digest
    from fisr_tpu.convert.tf_import import convert_pwcnet, export_pwcnet
    from fisr_tpu.models import pwcnet

    man, z = oracle
    shapes = {n: a.shape for n, a in export_pwcnet(
        pwcnet.init_params(jax.random.PRNGKey(0))).items()}
    tf_vars = deterministic_tf_vars(shapes)
    assert tf_vars_digest(tf_vars) == man["weights_digest"], (
        "weight generator drifted — re-run "
        "scripts/capture_corpus_prep_oracle.py")

    ref = z[f"flow_ss{ss}"]
    ours = flows_for_sequences(convert_pwcnet(tf_vars), z["data_yuv"], ss)
    assert ours.shape == ref.shape
    rms = np.sqrt(np.mean(ref**2))
    dev = np.sqrt(np.mean((ours - ref) ** 2))
    assert dev <= 0.25 * rms, (dev, rms)  # measured 0.073*rms
