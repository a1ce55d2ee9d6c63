"""Golden-trajectory regression harness.

SURVEY.md section 4: the reference has no tests; our physics-parity story is
(a) analytic unit tests (test_kinematics/test_sim) and (b) THIS file — locked
trajectories of canonical scenarios. When a solver change intentionally
shifts physics, regenerate with:

    python -m tests.test_golden  (writes tests/golden/*.npz)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full franka_allegro scene

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _scenario():
    from seqdex_tpu.core.builders import (
        DEFAULT_ARM_QPOS,
        franka_allegro,
        ground,
        lego_brick,
        table,
    )
    from seqdex_tpu.sim.scene import compile_scene
    from seqdex_tpu.sim.simulator import SimConfig, make_sim

    scene = compile_scene(
        franka_allegro(), bodies=[lego_brick("1x2")], statics=[table(), ground()]
    )
    sim = make_sim(scene, SimConfig(substeps=2, max_contacts=48))
    q0 = jnp.zeros(scene.art.ndof, dtype=jnp.float32).at[:7].set(
        jnp.asarray(DEFAULT_ARM_QPOS, dtype=jnp.float32)
    )
    s = sim.init_state()._replace(
        q=q0,
        ctrl=q0.at[7:23].set(jnp.asarray(scene.art.upper[7:23], dtype=jnp.float32)),
        body_pos=jnp.array([[0.25, 0.19, 0.66]], dtype=jnp.float32),
        body_quat=jnp.array([[0.19, 0.0, 0.0, 0.9819]], dtype=jnp.float32),
    )
    step = jax.jit(sim.step)
    traj_q, traj_bp = [], []
    for i in range(40):
        s = step(s)
        traj_q.append(np.asarray(s.q))
        traj_bp.append(np.asarray(s.body_pos[0]))
    return np.stack(traj_q), np.stack(traj_bp)


def test_golden_trajectory():
    path = os.path.join(GOLDEN_DIR, "grasp_scene_close.npz")
    if not os.path.exists(path):
        pytest.skip("golden file not generated yet (python -m tests.test_golden)")
    ref = np.load(path)
    q, bp = _scenario()
    # tolerance: contact solvers are iterative; small numeric drift is fine,
    # behavioral changes are not
    np.testing.assert_allclose(q, ref["q"], atol=5e-3)
    np.testing.assert_allclose(bp, ref["body_pos"], atol=5e-3)


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    q, bp = _scenario()
    np.savez(os.path.join(GOLDEN_DIR, "grasp_scene_close.npz"), q=q, body_pos=bp)
    print(f"wrote golden: q{q.shape}, body_pos{bp.shape}")
    print("final q[:3]:", q[-1][:3].round(4), "body:", bp[-1].round(4))


if __name__ == "__main__":
    main()
