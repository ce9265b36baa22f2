"""Flow error measures on synthetic fields with known answers."""

import numpy as np

from pcfa_tpu.metrics import flow_errors


def test_ee_analytic():
    flow = np.zeros((4, 4, 2))
    gt = np.zeros((4, 4, 2))
    gt[..., 0] = 3.0
    gt[..., 1] = 4.0
    ee = flow_errors.compute_EE(flow, gt)
    np.testing.assert_allclose(ee, 5.0)


def test_aee_with_nan():
    flow = np.zeros((4, 4, 2))
    gt = np.zeros((4, 4, 2))
    gt[..., 0] = 2.0
    gt[0, 0] = np.nan  # invalid pixel excluded from the average
    aee = flow_errors.compute_AEE(flow, gt)
    np.testing.assert_allclose(aee, 2.0)


def test_aae_identical_is_zero():
    rng = np.random.default_rng(1)
    flow = rng.standard_normal((6, 6, 2))
    assert flow_errors.compute_AAE(flow, flow) < 1e-5


def test_bp_thresholds():
    gt = np.zeros((10, 10, 2))
    flow = np.zeros((10, 10, 2))
    flow[:5, :, 0] = 4.0  # EE = 4 > 3px on half the pixels
    assert flow_errors.compute_BP(flow, gt) == 50.0


def test_fl_kitti15_five_percent_rule():
    # A pixel with EE > 3px but < 5% of a long GT vector is NOT bad under Fl.
    gt = np.zeros((1, 2, 2))
    gt[0, 0, 0] = 100.0
    gt[0, 1, 0] = 100.0
    flow = gt.copy()
    flow[0, 0, 0] = 96.0  # EE=4 > 3 but 4 < 5%·100 → good
    flow[0, 1, 0] = 94.0  # EE=6 > 3 and 6 > 5 → bad
    assert flow_errors.compute_BP(flow, gt) == 100.0  # plain BP: both bad
    assert flow_errors.compute_Fl(flow, gt) == 50.0


def test_all_measures_dict():
    rng = np.random.default_rng(2)
    flow = rng.standard_normal((8, 8, 2))
    gt = flow + 0.1
    result = flow_errors.get_all_error_measures(flow, gt)
    assert set(result) == {"AAE", "AEE", "BP", "Fl"}
    np.testing.assert_allclose(result["AEE"], np.hypot(0.1, 0.1), rtol=1e-5)


def test_area_measures():
    gt = np.zeros((4, 4, 2))
    flow = np.zeros((4, 4, 2))
    flow[0, :, 0] = 10.0
    area = np.zeros((4, 4), dtype=bool)
    area[1:, :] = True  # exclude the bad row
    result = flow_errors.get_all_error_measures_area(flow, gt, area)
    assert result["AEE"] == 0.0
