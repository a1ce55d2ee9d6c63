import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqdex_tpu.seqdex import reservoir as reslib
from seqdex_tpu.seqdex import tvalue as tvlib


def test_reservoir_insert_and_sample():
    template = {"pose": jnp.zeros(7), "q": jnp.zeros(23)}
    res = reslib.create(template, capacity=16, num_types=2)
    samples = {
        "pose": jnp.arange(8 * 7, dtype=jnp.float32).reshape(8, 7),
        "q": jnp.ones((8, 23)),
    }
    type_idx = jnp.array([0, 0, 1, 1, 0, 1, 0, 1], dtype=jnp.int32)
    valid = jnp.array([True, True, True, False, True, True, True, True])
    res = jax.jit(reslib.insert, static_argnames=())(res, samples, type_idx, valid)
    assert int(res.count[0]) == 4
    assert int(res.count[1]) == 3
    s = reslib.sample(res, jax.random.PRNGKey(0), jnp.int32(0))
    assert s["pose"].shape == (7,)
    # sampled entry must be one of the inserted type-0 rows
    inserted = np.asarray(samples["pose"])[np.array([0, 1, 4, 6])]
    assert any(np.allclose(np.asarray(s["pose"]), row) for row in inserted)


def test_reservoir_overwrite_when_full():
    template = jnp.zeros(3)
    res = reslib.create(template, capacity=4, num_types=1)
    for i in range(5):
        samples = jnp.full((4, 3), float(i))
        res = reslib.insert(
            res, samples, jnp.zeros(4, dtype=jnp.int32), jnp.ones(4, dtype=bool)
        )
    assert int(res.count[0]) == 4
    assert np.isfinite(np.asarray(res.data)).all()


def test_reservoir_save_load(tmp_path):
    template = jnp.zeros(5)
    res = reslib.create(template, capacity=8, num_types=1)
    samples = jnp.arange(4 * 5, dtype=jnp.float32).reshape(4, 5)
    res = reslib.insert(res, samples, jnp.zeros(4, dtype=jnp.int32),
                        jnp.ones(4, dtype=bool))
    path = str(tmp_path / "res.npz")
    reslib.save(path, res)
    res2 = reslib.load(path, res.data)
    assert int(res2.count[0]) == 4
    np.testing.assert_allclose(np.asarray(res2.data), np.asarray(res.data))


def test_tvalue_learns_separable_data():
    """Success/failure distinguished by quaternion z-component sign — the
    grasp->insert T-value's actual job (block flipped vs upright)."""
    rng = np.random.RandomState(0)

    def make_quats(n, up):
        # rotations close to identity (up) vs close to 180deg-x flip (down)
        base = np.array([0, 0, 0, 1.0]) if up else np.array([1.0, 0, 0, 0])
        q = base[None] + rng.randn(n, 4) * 0.15
        return q / np.linalg.norm(q, axis=1, keepdims=True)

    succ = make_quats(600, True)
    fail = make_quats(600, False)
    ts, acc = tvlib.train_offline(
        succ, fail, tvlib.GRASP_INSERT_IN, tvlib.GRASP_INSERT_HIDDEN,
        rollouts=300, eval_every=300, log=lambda *_: None,
        cfg=tvlib.TValueTrainConfig(batch_per_class=64, input_noise=0.05),
    )
    assert acc > 0.9, acc
    # gate semantics: confident on a clean success sample
    conf = float(tvlib.tvalue_confidence(ts.params, jnp.asarray([0, 0, 0, 1.0])))
    assert conf > 0.8, conf


def test_tvalue_save_load(tmp_path):
    params = tvlib.init_grasp_insert_tvalue(jax.random.PRNGKey(0))
    path = str(tmp_path / "tv.npz")
    tvlib.save_tvalue(path, params)
    params2 = tvlib.load_tvalue(path, tvlib.GRASP_INSERT_IN, tvlib.GRASP_INSERT_HIDDEN)
    x = jnp.ones(4)
    np.testing.assert_allclose(
        np.asarray(tvlib.tvalue_logits(params, x)),
        np.asarray(tvlib.tvalue_logits(params2, x)),
        rtol=1e-6,
    )


def test_camera_seg_stats():
    from seqdex_tpu.sim.camera import make_segmentation_camera

    cam = make_segmentation_camera(32, 32, fov_x=0.5)
    # one box 1m in front of the camera, another behind it (occluded)
    box_pos = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]])
    box_quat = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (2, 1))
    half = jnp.tile(jnp.array([0.1, 0.1, 0.1]), (2, 1))
    cam_pos = jnp.zeros(3)
    cam_quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    c0, x0, y0 = cam(cam_pos, cam_quat, jnp.int32(0), box_pos, box_quat, half)
    c1, x1, y1 = cam(cam_pos, cam_quat, jnp.int32(1), box_pos, box_quat, half)
    assert float(c0) > 10  # front box visible, centered
    assert abs(float(x0) - 15.5) < 2 and abs(float(y0) - 15.5) < 2
    assert float(c1) == 0  # rear box fully occluded
    # move the rear box sideways so it peeks out
    box_pos2 = box_pos.at[1, 0].set(0.5)
    c2, *_ = cam(cam_pos, cam_quat, jnp.int32(1), box_pos2, box_quat, half)
    assert float(c2) > 0


def test_tvalue_temperature_calibration():
    """Temperature scaling: accuracy invariant, gate-clearing fraction
    recovers when an accurate net is under-confident (the VERDICT r4
    failure mode: val-acc 0.8 gate clears 0.99 on ~nothing)."""
    rng = np.random.default_rng(0)
    succ = rng.normal(0.5, 0.4, (400, 4)).astype(np.float32)
    fail = rng.normal(-0.5, 0.4, (400, 4)).astype(np.float32)
    ts, _ = tvlib.train_offline(succ, fail, in_dim=4, hidden=(32, 16),
                                rollouts=300, eval_every=300,
                                log=lambda *a: None)
    xs = np.concatenate([succ[:100], fail[:100]])
    ys = np.concatenate([np.ones(100), np.zeros(100)])
    before = tvlib.calibration_report(ts.params, xs, ys)
    temp = tvlib.fit_temperature(ts.params, xs, ys)
    calibrated = tvlib.apply_temperature(ts.params, temp)
    after = tvlib.calibration_report(calibrated, xs, ys)
    # monotonic transform: decisions at 0.5 unchanged
    assert after["val_acc"] == pytest.approx(before["val_acc"], abs=1e-6)
    # an accurate-but-soft net must clear the 0.99 gate after calibration
    assert before["frac_succ_above_gate"] < 0.2
    assert after["frac_succ_above_gate"] > 0.5
    assert after["ece"] < before["ece"]


def test_tvalue_operating_point_gate():
    """fit_gate_temperature: the target fraction of true successes clears
    the absolute 0.99 gate; accuracy unchanged; false-accepts reported."""
    rng = np.random.default_rng(1)
    succ = rng.normal(0.5, 0.5, (400, 4)).astype(np.float32)
    fail = rng.normal(-0.5, 0.5, (400, 4)).astype(np.float32)
    ts, _ = tvlib.train_offline(succ, fail, in_dim=4, hidden=(32, 16),
                                rollouts=300, eval_every=300,
                                log=lambda *a: None)
    xs = np.concatenate([succ[:100], fail[:100]])
    ys = np.concatenate([np.ones(100), np.zeros(100)])
    temp = tvlib.fit_gate_temperature(ts.params, xs, ys, target_tpr=0.8)
    gate = tvlib.apply_temperature(ts.params, temp)
    rep = tvlib.calibration_report(gate, xs, ys)
    base = tvlib.calibration_report(ts.params, xs, ys)
    assert rep["val_acc"] == pytest.approx(base["val_acc"], abs=1e-6)
    assert rep["frac_succ_above_gate"] >= 0.7
    # sharpening lets some hard negatives through — must stay bounded for a
    # separable problem
    assert rep["frac_fail_above_gate"] < 0.5
