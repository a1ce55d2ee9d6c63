"""Teleoperation: key events -> end-effector pose deltas -> IK targets.

TPU-native mirror of `policy_sequencing/teleoperation.py:22-88` (viewer
keyboard -> EE deltas), headless: callers feed key tokens (e.g. from a real
keyboard loop, a script, or a test) and get 6-dof EE deltas compatible with
the envs' `control_ik` pipeline. Also provides the perturbation-window logic
(`apply_teleoper_perturbation`, `..._grasp_sim.py:1624-1631`).
"""

from __future__ import annotations

import numpy as np

# key -> (dpos xyz, drot rpy); WASDQE translate, IJKLUO rotate
KEY_BINDINGS = {
    "w": ((+1, 0, 0), (0, 0, 0)),
    "s": ((-1, 0, 0), (0, 0, 0)),
    "a": ((0, +1, 0), (0, 0, 0)),
    "d": ((0, -1, 0), (0, 0, 0)),
    "q": ((0, 0, +1), (0, 0, 0)),
    "e": ((0, 0, -1), (0, 0, 0)),
    "i": ((0, 0, 0), (+1, 0, 0)),
    "k": ((0, 0, 0), (-1, 0, 0)),
    "j": ((0, 0, 0), (0, +1, 0)),
    "l": ((0, 0, 0), (0, -1, 0)),
    "u": ((0, 0, 0), (0, 0, +1)),
    "o": ((0, 0, 0), (0, 0, -1)),
}


class Teleoperator:
    """Accumulates key presses into a 6-dof delta pose per control step."""

    def __init__(self, pos_step: float = 0.01, rot_step: float = 0.05,
                 decay: float = 0.0):
        self.pos_step = pos_step
        self.rot_step = rot_step
        self.decay = decay
        self._dpos = np.zeros(3)
        self._drot = np.zeros(3)

    def key(self, token: str):
        if token in KEY_BINDINGS:
            dp, dr = KEY_BINDINGS[token]
            self._dpos += np.asarray(dp, dtype=float) * self.pos_step
            self._drot += np.asarray(dr, dtype=float) * self.rot_step

    def pop_dpose(self) -> np.ndarray:
        """6-dof (pos_err, rot_err) for `control_ik`; resets accumulators
        (or decays them for continuous-hold behavior)."""
        out = np.concatenate([self._dpos, self._drot])
        self._dpos *= self.decay
        self._drot *= self.decay
        return out


class PerturbationWindow:
    """Random perturbation windows used for robustness training
    (`..._grasp_sim.py:1624-1631`): near a sampled step, the arm target gets
    a random 6-dof offset."""

    def __init__(self, episode_length: int, width: int = 4,
                 pos_scale: float = 0.15, rot_scale: float = 0.05, seed: int = 0):
        self.rng = np.random.RandomState(seed)
        self.episode_length = episode_length
        self.width = width
        self.pos_scale = pos_scale
        self.rot_scale = rot_scale
        self.resample()

    def resample(self):
        self.center = self.rng.randint(0, self.episode_length)
        self.direction = self.rng.uniform(-1, 1, 6)

    def dpose(self, step: int) -> np.ndarray:
        if abs(step - self.center) < self.width:
            return np.concatenate(
                [self.direction[:3] * self.pos_scale, self.direction[3:] * self.rot_scale]
            )
        return np.zeros(6)
