"""flow viz / extra flow formats / profiling utilities."""

import numpy as np

from fisr_tpu.utils import flow_viz
from fisr_tpu.utils.profiling import StepTimer, device_memory_stats, trace


def test_flow_to_img_properties():
    flow = np.zeros((8, 8, 2), np.float32)
    img0 = flow_viz.flow_to_img(flow)
    assert img0.shape == (8, 8, 3) and img0.dtype == np.uint8
    # zero flow -> zero saturation -> white
    assert np.all(img0 == 255)
    # opposite directions -> different hues (fixed scale: under the
    # default NORM_MINMAX a constant-magnitude field normalizes to
    # saturation 0 = white, matching cv2 — see test_optflow_oracle)
    fl = np.zeros((2, 2, 2), np.float32)
    fl[0, :, 0] = 10.0
    fl[1, :, 0] = -10.0
    img = flow_viz.flow_to_img(fl, flow_mag_max=10.0)
    assert not np.array_equal(img[0, 0], img[1, 0])


def test_flow_to_img_nan_guard():
    """The reference zeroes NaN magnitudes (optflow.py:209-213): a NaN
    pixel renders white; the REST of the image is unaffected (no NaN
    poisoning of the min-max normalization)."""
    fl = np.zeros((4, 4, 2), np.float32)
    fl[..., 0] = np.linspace(1, 8, 16).reshape(4, 4)
    clean = flow_viz.flow_to_img(fl)
    fl_nan = fl.copy()
    fl_nan[2, 2] = np.nan
    img = flow_viz.flow_to_img(fl_nan)
    assert np.all(img[2, 2] == 255)  # sat 0 -> white
    # NaN sample relocates the min-max range's min to 0; every other
    # pixel must still be a finite, defined rendering
    assert img.dtype == np.uint8 and np.isfinite(img).all()
    with_max = flow_viz.flow_to_img(fl_nan, flow_mag_max=8.0)
    keep = np.ones((4, 4), bool)
    keep[2, 2] = False
    np.testing.assert_array_equal(
        with_max[keep], flow_viz.flow_to_img(fl, flow_mag_max=8.0)[keep])


def test_flow_to_img_overflow_saturates():
    """Magnitudes above flow_mag_max clip to FULL saturation (defined
    behavior) instead of the reference's platform-dependent u8 wrap:
    a 2x-over-max flow renders identically to an exactly-max flow."""
    fl_over = np.zeros((1, 1, 2), np.float32)
    fl_over[..., 0] = 20.0
    fl_max = np.zeros((1, 1, 2), np.float32)
    fl_max[..., 0] = 10.0
    np.testing.assert_array_equal(
        flow_viz.flow_to_img(fl_over, flow_mag_max=10.0),
        flow_viz.flow_to_img(fl_max, flow_mag_max=10.0))


def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(6, 9, 3)).astype(np.float32)
    p = tmp_path / "t.pfm"
    flow_viz.write_pfm(p, data)
    back, scale = flow_viz.read_pfm(p)
    np.testing.assert_allclose(back, data, rtol=1e-6)
    assert scale == 1.0


def test_kitti_png_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    flow = (rng.normal(size=(5, 7, 2)) * 10).astype(np.float32)
    valid = rng.integers(0, 2, size=(5, 7)).astype(bool)
    p = tmp_path / "k.png"
    flow_viz.write_kitti_png(p, flow, valid)
    back, v = flow_viz.read_kitti_png(p)
    np.testing.assert_allclose(back, flow, atol=1 / 64.0)
    np.testing.assert_array_equal(v, valid)


def test_trace_and_steptimer(capsys):
    holder = {}
    with trace("unit", holder, verbose=False):
        sum(range(1000))
    assert holder["unit"] >= 0

    st = StepTimer(batch_size=8)
    st.tick()
    st.tick()
    assert st.sec_per_step >= 0
    assert st.samples_per_sec > 0
    assert ":" in st.eta_str(100)

    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_param_summary_and_float_color():
    import jax
    from fisr_tpu.models import fisrnet
    from fisr_tpu.utils.summary import print_params
    from fisr_tpu.ops.color import yuv2rgb_float

    params = fisrnet.init_params(jax.random.PRNGKey(0))
    total = print_params(params, max_depth=1)
    assert total == 48_316_251

    # utils.py:94-103 numpy twin
    rng = np.random.default_rng(0)
    yuv = rng.uniform(0, 255, (4, 5, 3))
    m = np.array([[1.0, 1.0, 1.0],
                  [-0.000007154783816076815, -0.3441331386566162, 1.7720025777816772],
                  [1.4019975662231445, -0.7141380310058594, 0.00001542569043522235]])
    want = np.dot(yuv, m)
    want[:, :, 0] -= 179.45477266423404
    want[:, :, 1] += 135.45870971679688
    want[:, :, 2] -= 226.8183044444304
    got = np.asarray(yuv2rgb_float(yuv))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_assert_fits_hbm_guardrail():
    """HBM pre-flight (VERDICT r4 item 7): an over-budget program must raise
    an actionable error naming the remedies; an in-budget one returns the
    accounting; no introspection -> no-op None."""
    import jax
    import jax.numpy as jnp
    import pytest

    from fisr_tpu.utils.profiling import assert_fits_hbm

    f = jax.jit(lambda x: x @ x + 1.0)
    x = jnp.ones((64, 64), jnp.float32)

    info = assert_fits_hbm(f, (x,), what="tiny matmul",
                           limit_bytes=1 << 30)
    assert info is not None and info["need_bytes"] > 0

    with pytest.raises(RuntimeError, match="fisr_grid|sharded|geometry"):
        assert_fits_hbm(f, (x,), what="tiny matmul", limit_bytes=1000)

    # compiled-object form (what the serving daemon passes)
    compiled = f.lower(x).compile()
    with pytest.raises(RuntimeError, match="HBM"):
        assert_fits_hbm(compiled, what="compiled form", limit_bytes=1000)

    # backend without memory_analysis introspection -> None, never a crash
    class _NoIntrospection:
        def memory_analysis(self):
            raise NotImplementedError("backend exposes no memory analysis")

    assert assert_fits_hbm(_NoIntrospection(), what="bare",
                           limit_bytes=None) is None

    # but a genuine trace/compile error must PROPAGATE (ADVICE r4), not be
    # swallowed to resurface later at execution with less context
    bad = jax.jit(lambda x: x @ jnp.ones((3, 3)))  # shape mismatch at trace
    with pytest.raises(Exception, match="dot|shape|rank|size"):
        assert_fits_hbm(bad, (x,), what="mis-shaped")
