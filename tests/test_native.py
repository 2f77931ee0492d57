"""Native C++ component tests (built on demand; skipped without g++)."""

import numpy as np
import pytest

from anticipated_vins_mono_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_native_csv_matches_python(tmp_path):
    from anticipated_vins_mono_tpu.utils import euroc
    seqs = euroc.available_sequences()
    if not seqs:
        pytest.skip("no EuRoC GT")
    path = f"{euroc.REFERENCE_GT_DIR}/{seqs[0]}/data.csv"
    gt_py = euroc.load_gt_csv(path, max_rows=500)
    gt_c = native.load_euroc_csv(path, max_rows=500)
    np.testing.assert_allclose(gt_c["t"], gt_py["t"], atol=1e-9)
    np.testing.assert_allclose(gt_c["p"], gt_py["p"], atol=1e-12)
    np.testing.assert_allclose(gt_c["ba"], gt_py["ba"], atol=1e-12)


def test_aligner_batches():
    al = native.MeasurementAligner()
    # 200 Hz IMU, frames at 0.1 s
    for k in range(100):
        t = k * 0.005
        al.push_imu(t, [0.1 * k, 0, 9.8], [0, 0, 0.01 * k])
    # first frame at t=0.1: waits until IMU >= t
    out = al.frame_batch(0.1)
    assert out is not None
    dts, acc, gyr, acc0, gyr0 = out
    np.testing.assert_allclose(dts.sum(), 0.1, atol=1e-9)
    assert abs(acc0[0] - 0.0) < 1e-9          # boundary sample at t≈0
    # second frame: interval (0.1, 0.25] with interpolated end sample
    out2 = al.frame_batch(0.2501)
    dts2, acc2, gyr2, acc02, gyr02 = out2
    np.testing.assert_allclose(dts2.sum(), 0.1501, atol=1e-9)
    # boundary sample ≈ value at t=0.1 (sample 20)
    np.testing.assert_allclose(acc02[0], 0.1 * 20, atol=0.1)
    # last sample interpolated at the frame time
    assert dts2[-1] > 0
    # a frame beyond available IMU returns None (wait)
    assert al.frame_batch(2.0) is None


def test_hamming_matches_numpy():
    rng = np.random.default_rng(0)
    b1 = rng.random((20, 256)) > 0.5
    b2 = rng.random((30, 256)) > 0.5
    d1 = native.pack_descriptors(b1)
    d2 = native.pack_descriptors(b2)
    out = native.hamming_all_pairs(d1, d2)
    ref = (b1[:, None, :] ^ b2[None, :, :]).sum(-1)
    np.testing.assert_array_equal(out, ref)
