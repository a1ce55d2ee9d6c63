"""Batched rigid-body simulator: the TPU-native `gym.simulate`.

Replaces the IsaacGym step (`tasks/hand_base/base_task.py:130-150`:
pre_physics -> control_freq_inv x simulate -> post_physics) with a pure
function `step(state, targets) -> state` built by `make_sim`. One env's state
is a small pytree; batching is `vmap`, multi-chip is sharding of the leading
env axis.

Integration scheme per substep (dt_sub = dt / substeps, reference budget
dt = 1/60, 2 substeps — `utils/config.py:188`):
  1. FK + world-frame CRBA mass matrix / Newton-Euler bias.
  2. Implicit joint-space PD (PhysX DOF drive semantics:
     stiffness/damping/effort per dof, `..._grasp_sim.py:580-592`):
     (M + dt*(Kd + Dj) + dt^2*Kp) qd+ = M qd + dt*(Kp (q* - q) clamped - bias)
     — unconditionally stable for the stiff finger drives.
  3. Unconstrained ("free") velocity update for free bodies (gravity,
     gyroscopic with angular-velocity clamp).
  4. Contact narrowphase + friction-cone impulse QP (see contact.py) against
     the implicitly damped mass operator.
  5. Symplectic Euler position update, joint-limit clamp, quaternion
     renormalisation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import quat_apply, quat_integrate, quat_to_matrix
from .contact import make_narrowphase, solve_contact_qp
from .kinematics import make_dynamics, make_kinematics
from .scene import OWNER_BODY, OWNER_LINK, CompiledScene


class SimState(NamedTuple):
    """Dynamic state of one environment (vmap over the leading env axis)."""

    q: jnp.ndarray  # (D,)
    qd: jnp.ndarray  # (D,)
    ctrl: jnp.ndarray  # (D,) PD position targets
    body_pos: jnp.ndarray  # (B, 3)
    body_quat: jnp.ndarray  # (B, 4) xyzw
    body_linvel: jnp.ndarray  # (B, 3)
    body_angvel: jnp.ndarray  # (B, 3)
    # diagnostics from the last substep
    link_contact_force: jnp.ndarray  # (L,) net contact force magnitude per link
    body_contact_force: jnp.ndarray  # (B,)
    # per-env domain-randomization scales (identity by default; sampled by
    # the DR engine, `envs/randomization.py` — mirrors base_task.py:229-423)
    kp_scale: jnp.ndarray = None  # (D,)
    kd_scale: jnp.ndarray = None  # (D,)
    mu_scale: jnp.ndarray = None  # ()
    mass_scale: jnp.ndarray = None  # ()
    gravity_offset: jnp.ndarray = None  # (3,)
    # warm-started inverse of the implicitly-damped mass operator Mt(q):
    # refined by 2 Newton-Schulz iterations per substep (quadratic
    # convergence; Mt moves O(h*qd) between substeps so the residual stays
    # ~1e-8) instead of a per-substep Cholesky — the batched 23x23
    # factorization serializes on TPU (measured 6.4 ms at 2048 envs vs
    # <0.5 ms for the NS matmuls)
    minv: jnp.ndarray = None  # (D, D)
    # per-env runtime geometry/mass overrides (contact.GeomTables) — the
    # multi-type target-brick mechanism; None = use the compiled statics
    geom: object = None
    # per-env entity collision-filter words (n_entities = 1 robot + B bodies
    # + 1 statics): a point-collider pair collides iff
    # (word[entity_pt] & word[entity_col]) == 0 — PhysX filter semantics
    # (`gui.py:3074-3079` per-phase switching); None = all collide
    collision_filter: jnp.ndarray = None
    # per-env DOF effort/stiffness scaling (`gui.py:3080-3086` per-phase
    # set_dof_effort); None = 1
    effort_scale: jnp.ndarray = None
    # persistent narrowphase pair list (SimConfig.select_every > 1): the
    # (K,) selection triple carried across control steps between re-select
    # ticks; None when persistence is off
    sel_depth: jnp.ndarray = None  # (K,)
    sel_pt: jnp.ndarray = None  # (K,) i32
    sel_col: jnp.ndarray = None  # (K,) i32


@dataclasses.dataclass(frozen=True)
class SimConfig:
    dt: float = 1.0 / 60.0  # control-rate timestep (reference `utils/config.py:188`)
    substeps: int = 2  # physics substeps per control step (reference sim.substeps)
    solver_iterations: int = 16  # = PhysX TGS position iters in the reference cfg
    max_contacts: int = 64
    baumgarte: float = 0.2
    compliance: float = 1e-4
    max_depenetration_vel: float = 0.5
    gravity: tuple = (0.0, 0.0, -9.81)
    max_angvel: float = 50.0
    # PD drive gains per dof — set by the env to the reference's DOF props
    # (arm: kp 400 kd 80 effort 200; hand: kp 50 kd 1 effort 5,
    #  `..._grasp_sim.py:580-592`)
    stiffness: tuple = ()
    damping: tuple = ()
    effort: tuple = ()
    # use the optimized contact-solver path (None = auto: TPU backends only)
    use_pallas: object = None
    # "factored" (default: factored-matvec XLA iteration, A never re-read)
    # or "pallas" (experimental VMEM-resident kernel)
    contact_solver_mode: str = "factored"
    # envs per Pallas program (VMEM working set ~ env_block * (3K)^2 * 4 B)
    pallas_env_block: int = 8
    # links whose net contact-force magnitude the env consumes (FSR pads +
    # arm links). Empty = accumulate for ALL links; a short tuple turns the
    # (L, K) one-hot accumulation into a (len, K) one + scatter — the envs
    # read ~19 of ~40 links, and the unused (B, K) body accumulation is
    # skipped entirely (no consumer in any env)
    force_links: tuple = ()
    # exact per-substep Cholesky for Minv instead of warm-started
    # Newton-Schulz (slow; for accuracy cross-checks)
    minv_exact: bool = False
    minv_ns_iters: int = 2
    # matrix-free QP iterations (scatter wrenches to bodies / gather
    # responses instead of re-reading the (3K,3K) Delassus each iteration).
    # None = auto: on for heap-scale scenes (B > 8). With
    # contact_precond="exact" the Jacobi step sizes are identical to the
    # dense path (A assembled once for the row-sum); "cs" skips A entirely
    # via a Cauchy-Schwarz row-sum bound (smaller, always-safe steps)
    contact_segmented: object = None
    contact_precond: str = "exact"
    # neighbor-list narrowphase (contact.py docstring): None = auto (on for
    # heap-scale point x collider products), True/False = force
    neighbor_list: object = None
    nl_candidates: int = 64
    nl_group_size: int = 64
    # PhysX-parity contact reuse: pair selection (the O(P*C) narrowphase
    # grid) runs ONCE per control step in `step`; each substep re-derives
    # depth/normal/position for the stored pairs with O(K) math. PhysX
    # likewise generates contacts once per `gym.simulate` step and lets the
    # TGS substeps reuse them. False = reselect every substep (exact
    # reference for tests)
    reuse_contacts: bool = False
    # QP iteration budget for warm-started substeps (impulse caching across
    # the fixed pair list, PhysX-style): substep 1 runs the full
    # `solver_iterations` cold; later substeps start from the previous
    # impulses and may use fewer. None = full budget everywhere
    warm_iterations: object = None
    # Cross-CONTROL-step pair persistence: re-run the O(P*C) selection grid
    # only every `select_every` control steps; in between, the stored pair
    # list (SimState.sel_*) is refreshed with O(K) math per substep. The
    # cadence is driven by a UNIFORM scalar `tick` the caller threads in
    # (the PPO rollout scan index) — a per-env counter would batch the
    # branch and run both sides. Heap bricks move ~mm per control step and
    # the top-K list carries separated near-pairs as margin, so a <=
    # (select_every - 1)-step-stale pair list still catches forming
    # contacts; callers that do not pass a tick re-select every step.
    # Requires reuse_contacts.
    select_every: int = 1


def default_drive_params(ndof: int, arm_dofs: int = 7):
    """Reference DOF drive table (`..._grasp_sim.py:580-592`)."""
    kp = np.full(ndof, 50.0)
    kd = np.full(ndof, 1.0)
    eff = np.full(ndof, 5.0)
    kp[:arm_dofs] = 400.0
    kd[:arm_dofs] = 80.0
    eff[:arm_dofs] = 200.0
    return tuple(kp), tuple(kd), tuple(eff)


class Simulator(NamedTuple):
    """Bundle of pure functions closed over one compiled scene."""

    scene: CompiledScene
    config: SimConfig
    init_state: object  # (q0=None) -> SimState (single env)
    step: object  # (SimState) -> SimState  — one control step
    substep: object  # (SimState) -> SimState
    fk: object  # (q, qd) -> FkResult
    site_jacobian: object
    mass_matrix: object
    minv_at: object  # (q static) -> (D, D) exact damped-mass-operator inverse


def make_sim(scene: CompiledScene, config: SimConfig) -> Simulator:
    art = scene.art
    D, B, L = art.ndof, scene.nbodies, art.nlinks
    (fk, site_jacobian, point_jacobian_tau, point_velocity,
     point_jacobian_rows, point_jacobian_planes,
     point_jacobian_rows_soa) = make_kinematics(art)
    mass_matrix, bias_forces, link_jacobians, com_world = make_dynamics(
        art, gravity=config.gravity
    )
    narrowphase, point_world_fn = make_narrowphase(
        scene, config.max_contacts, neighbor_list=config.neighbor_list,
        nl_candidates=config.nl_candidates,
        nl_group_size=config.nl_group_size)

    kp = jnp.asarray(config.stiffness if config.stiffness else default_drive_params(D)[0],
                     dtype=jnp.float32)
    kd = jnp.asarray(config.damping if config.damping else default_drive_params(D)[1],
                     dtype=jnp.float32)
    effort = jnp.asarray(config.effort if config.effort else default_drive_params(D)[2],
                         dtype=jnp.float32)
    joint_damping = jnp.asarray(art.joint_damping, dtype=jnp.float32) * 0.0  # drives own the damping
    lower = jnp.asarray(art.lower, dtype=jnp.float32)
    upper = jnp.asarray(art.upper, dtype=jnp.float32)
    g = jnp.asarray(config.gravity, dtype=jnp.float32)

    inv_mass_b = jnp.asarray(scene.body_inv_mass, dtype=jnp.float32)
    inertia_b = jnp.asarray(scene.body_inertia, dtype=jnp.float32)
    inv_inertia_b = jnp.asarray(scene.body_inv_inertia, dtype=jnp.float32)
    body_kinematic = jnp.asarray(scene.body_kinematic)

    pt_owner_kind = jnp.asarray(scene.pt_owner_kind)
    pt_owner = jnp.asarray(scene.pt_owner)
    col_owner_kind = jnp.asarray(scene.col_owner_kind)
    col_owner = jnp.asarray(scene.col_owner)

    h = config.dt / config.substeps
    # Optimized contact solver (kernels/fused_contact.py). auto (None) =
    # factored-matvec path on TPU backends: the plain XLA path spends ~half
    # the substep materializing + re-reading the batched (3K, 3K) Delassus
    # from HBM (v5e trace, 2048 envs: QP while-loop 6.7 ms + row-sum 6.5 ms
    # + assembly fusions ~5 ms of a 35 ms substep); the factored iteration
    # builds A once for the preconditioner and never re-reads it.
    try:
        plat = jax.devices()[0].platform
    except Exception:
        plat = "cpu"
    on_tpu = plat in ("tpu", "axon")
    use_pallas = on_tpu if config.use_pallas is None else bool(config.use_pallas)
    if B > 8 and config.use_pallas is None:
        # the factored body-coupling assembly carries 6*B rows per env —
        # for heap-scale scenes (Search: B = 132) the XLA path stays cheaper
        use_pallas = False
    segmented = (B > 8 if config.contact_segmented is None
                 else bool(config.contact_segmented))
    if use_pallas:
        segmented = False
    if use_pallas:
        from .kernels.fused_contact import make_fused_solver

        fused_solver = make_fused_solver(
            min(config.max_contacts, 2 * scene.npoints), D,
            config.solver_iterations,
            reg=config.compliance, env_block=config.pallas_env_block,
            interpret=not on_tpu,  # CPU: interpreter mode (tests)
            mode=config.contact_solver_mode)
    else:
        fused_solver = None

    def _mt_of(M, kp_e, kd_e):
        return M + jnp.diag(h * (kd_e + joint_damping) + h * h * kp_e)

    _minv_cache = {}

    def minv_at(q) -> jnp.ndarray:
        """Exact inverse of the damped mass operator at a STATIC pose q.

        Evaluated eagerly (even mid-trace, via ensure_compile_time_eval) and
        memoized, so env resets can seed the warm-started `SimState.minv`
        with an already-converged inverse at their canonical reset pose."""
        with jax.ensure_compile_time_eval():
            q = jnp.asarray(q, dtype=jnp.float32)
            key = np.asarray(q).tobytes()
            if key not in _minv_cache:
                fk_res = fk(q, jnp.zeros(D, dtype=jnp.float32))
                Mt = _mt_of(mass_matrix(fk_res), kp, kd)
                _minv_cache[key] = jnp.asarray(
                    np.linalg.inv(np.asarray(Mt, dtype=np.float64)),
                    dtype=jnp.float32,
                )
            return _minv_cache[key]

    def init_state(q0=None) -> SimState:
        if q0 is None:
            q0 = 0.5 * (lower + upper)
        with jax.ensure_compile_time_eval():
            q0 = jnp.asarray(q0, dtype=jnp.float32)
        minv0 = minv_at(q0)
        return SimState(
            q=q0,
            qd=jnp.zeros(D, dtype=jnp.float32),
            ctrl=q0,
            body_pos=jnp.zeros((B, 3), dtype=jnp.float32),
            body_quat=jnp.tile(jnp.array([0, 0, 0, 1.0], dtype=jnp.float32), (B, 1)),
            body_linvel=jnp.zeros((B, 3), dtype=jnp.float32),
            body_angvel=jnp.zeros((B, 3), dtype=jnp.float32),
            link_contact_force=jnp.zeros(L, dtype=jnp.float32),
            body_contact_force=jnp.zeros(B, dtype=jnp.float32),
            kp_scale=jnp.ones(D, dtype=jnp.float32),
            kd_scale=jnp.ones(D, dtype=jnp.float32),
            mu_scale=jnp.ones((), dtype=jnp.float32),
            mass_scale=jnp.ones((), dtype=jnp.float32),
            gravity_offset=jnp.zeros(3, dtype=jnp.float32),
            minv=minv0,
            **(
                {
                    # all-masked pair list; the first re-select tick (tick 0
                    # after any reset-carrying epoch boundary) overwrites it.
                    # Size mirrors the narrowphase's clamped budget
                    # (contact.py: K = min(max_contacts, 2P))
                    "sel_depth": jnp.full(
                        min(config.max_contacts, 2 * scene.npoints), -1e9,
                        dtype=jnp.float32),
                    "sel_pt": jnp.zeros(
                        min(config.max_contacts, 2 * scene.npoints),
                        dtype=jnp.int32),
                    "sel_col": jnp.zeros(
                        min(config.max_contacts, 2 * scene.npoints),
                        dtype=jnp.int32),
                }
                if config.select_every > 1
                else {}
            ),
        )

    def _substep_sol(state: SimState, fk_res=None, contact_sel=None,
                     lam0=None):
        # callers that already ran FK at this exact (q, qd) — the env's
        # pre-physics IK pass — hand it in to skip the recompute
        if fk_res is None:
            fk_res = fk(state.q, state.qd)
        M = mass_matrix(fk_res)
        bias = bias_forces(fk_res, state.qd)
        # implicit PD (see module docstring); DR scales on drive gains
        kp_e = kp * state.kp_scale
        kd_e = kd * state.kd_scale
        eff_e = (effort if state.effort_scale is None
                 else effort * state.effort_scale)
        tau_spring = jnp.clip(kp_e * (state.ctrl - state.q), -eff_e, eff_e)
        Mt = _mt_of(M, kp_e, kd_e)
        if config.minv_exact or state.minv is None:
            # dense inverse via Cholesky: exact but the batched 23x23
            # factorization serializes on TPU — accuracy-check path only
            chol = jax.scipy.linalg.cho_factor(Mt)
            Minv = jax.scipy.linalg.cho_solve(
                chol, jnp.eye(Mt.shape[0], dtype=Mt.dtype)
            )
        else:
            # warm-started Newton-Schulz: X <- X (2I - Mt X); quadratic
            # convergence from the previous substep's inverse (see SimState)
            X = state.minv
            for _ in range(config.minv_ns_iters):
                X = 2.0 * X - X @ (Mt @ X)
            Minv = 0.5 * (X + X.T)
            # divergence guard: NS only converges while ||I - Mt X|| < 1;
            # a large between-substep configuration jump (teleport reset,
            # joint-limit snap) can leave the warm start outside that
            # region, and the iteration then blows up to NaN within two
            # substeps. Detect via the residual and fall back to the
            # always-convergent seed X0 = Mt^T/(||Mt||_1 ||Mt||_inf)
            # refined by the same NS chain (under-estimates the inverse —
            # soft robot for a few substeps — and recovers geometrically
            # through the warm start)
            R = jnp.eye(Mt.shape[0], dtype=Mt.dtype) - Mt @ Minv
            bad = (~jnp.all(jnp.isfinite(Minv))) | (
                jnp.max(jnp.abs(R)) > 0.9)
            a1 = jnp.max(jnp.sum(jnp.abs(Mt), axis=0))
            ainf = jnp.max(jnp.sum(jnp.abs(Mt), axis=1))
            Xs = Mt.T / (a1 * ainf)
            for _ in range(config.minv_ns_iters):
                Xs = 2.0 * Xs - Xs @ (Mt @ Xs)
            Minv = jnp.where(bad, 0.5 * (Xs + Xs.T), Minv)
        rhs = M @ state.qd + h * (tau_spring - bias)
        qd_free = Minv @ rhs

        # free bodies: gravity + gyroscopic (DR gravity offset / mass scale)
        # (per-env runtime overrides when `state.geom` is set — multi-type)
        inv_mass_e = inv_mass_b if state.geom is None else state.geom.inv_mass
        inertia_e = inertia_b if state.geom is None else state.geom.inertia
        inv_inertia_e = (inv_inertia_b if state.geom is None
                         else state.geom.inv_inertia)
        g_eff = g + state.gravity_offset
        grav = jnp.where(body_kinematic[:, None] | (inv_mass_e == 0.0)[:, None], 0.0,
                         jnp.broadcast_to(g_eff, (B, 3)))
        v_free = state.body_linvel + h * grav
        R = quat_to_matrix(state.body_quat)  # (B, 3, 3)
        Iw = jnp.einsum("bij,bjk,blk->bil", R, inertia_e, R)
        Iw_inv = jnp.einsum("bij,bjk,blk->bil", R, inv_inertia_e, R)
        gyro = jnp.cross(state.body_angvel, jnp.einsum("bij,bj->bi", Iw, state.body_angvel))
        w_free = state.body_angvel - h * jnp.einsum("bij,bj->bi", Iw_inv, gyro)
        w_free = jnp.clip(w_free, -config.max_angvel, config.max_angvel)

        # contacts (narrowphase precompacts all static per-point/per-collider
        # solver tables to the K winners — no index gathers below);
        # state.geom carries the per-env multi-type brick overrides
        if contact_sel is None:
            contacts = narrowphase(fk_res.pos, fk_res.quat, state.body_pos,
                                   state.body_quat, state.geom,
                                   state.collision_filter)
        else:
            contacts = narrowphase.refresh(fk_res.pos, fk_res.quat,
                                           state.body_pos, state.body_quat,
                                           state.geom, contact_sel)
        contacts = contacts._replace(friction=contacts.friction * state.mu_scale)
        # robot jacobian rows: (point side) minus (collider side); zero anc
        # rows already encode "not robot-owned"
        Jpx, Jpy, Jpz = point_jacobian_rows_soa(
            fk_res, contacts.anc_pt, contacts.px, contacts.py, contacts.pz)
        Jcx, Jcy, Jcz = point_jacobian_rows_soa(
            fk_res, contacts.anc_col, contacts.px, contacts.py, contacts.pz)
        Jx, Jy, Jz = Jpx - Jcx, Jpy - Jcy, Jpz - Jcz  # (K, D)
        body_of_pt = contacts.body_pt
        body_of_col = contacts.body_col
        if B > 0:
            com_b = (jnp.asarray(scene.body_com, dtype=jnp.float32)
                     if state.geom is None else state.geom.com)
            com_w = state.body_pos + quat_apply(state.body_quat, com_b)
            # ONE combined (B, 19) table gather per contact side (gather
            # cost is ~latency-per-row: the 6 separate (K, 3) + inverse-mass
            # + inverse-inertia gathers measured ~8 ms/substep at Search
            # scale). Columns: com_w(3) v_free(3) w_free(3) inv_mass(1)
            # Iw_inv(9) — the solver consumes the pre-gathered mass slices
            inv_mass_eff = inv_mass_e / state.mass_scale
            Iw_inv_eff = Iw_inv / state.mass_scale
            bodytab = jnp.concatenate(
                [com_w, v_free, w_free, inv_mass_eff[:, None],
                 Iw_inv_eff.reshape(B, 9)], axis=1)
            g_pt = bodytab[jnp.clip(body_of_pt, 0, B - 1)]  # (K, 19)
            g_col = bodytab[jnp.clip(body_of_col, 0, B - 1)]
            cw_pt, vb_pt, wb_pt = g_pt[:, 0:3], g_pt[:, 3:6], g_pt[:, 6:9]
            cw_col, vb_col, wb_col = (g_col[:, 0:3], g_col[:, 3:6],
                                      g_col[:, 6:9])
            valid_pt_f = body_of_pt >= 0
            valid_col_f = body_of_col >= 0
            pre_gathered = (
                g_pt[:, 9] * valid_pt_f,
                g_col[:, 9] * valid_col_f,
                g_pt[:, 10:19].reshape(-1, 3, 3)
                * valid_pt_f[:, None, None],
                g_col[:, 10:19].reshape(-1, 3, 3)
                * valid_col_f[:, None, None],
            )
            r_pt = (contacts.px - cw_pt[:, 0], contacts.py - cw_pt[:, 1],
                    contacts.pz - cw_pt[:, 2])
            r_col = (contacts.px - cw_col[:, 0], contacts.py - cw_col[:, 1],
                     contacts.pz - cw_col[:, 2])
        else:
            zK = jnp.zeros_like(contacts.px)
            r_pt = (zK, zK, zK)
            r_col = (zK, zK, zK)
            pre_gathered = None

        # relative velocity at contact, using free (post-drive) velocities
        vrx = Jx @ qd_free  # (K,) — robot side already (point - collider)
        vry = Jy @ qd_free
        vrz = Jz @ qd_free
        if B > 0:
            on_pt = (body_of_pt >= 0).astype(jnp.float32)
            on_col = (body_of_col >= 0).astype(jnp.float32)
            rpx, rpy, rpz = r_pt
            rcx, rcy, rcz = r_col
            vrx = vrx + on_pt * (vb_pt[:, 0] + wb_pt[:, 1] * rpz - wb_pt[:, 2] * rpy) \
                - on_col * (vb_col[:, 0] + wb_col[:, 1] * rcz - wb_col[:, 2] * rcy)
            vry = vry + on_pt * (vb_pt[:, 1] + wb_pt[:, 2] * rpx - wb_pt[:, 0] * rpz) \
                - on_col * (vb_col[:, 1] + wb_col[:, 2] * rcx - wb_col[:, 0] * rcz)
            vrz = vrz + on_pt * (vb_pt[:, 2] + wb_pt[:, 0] * rpy - wb_pt[:, 1] * rpx) \
                - on_col * (vb_col[:, 2] + wb_col[:, 0] * rcy - wb_col[:, 1] * rcx)

        sol = solve_contact_qp(
            contacts,
            (Jx, Jy, Jz),
            r_pt,
            r_col,
            (vrx, vry, vrz),
            Minv,
            (inv_mass_e / state.mass_scale) if B > 0
            else jnp.zeros(0, dtype=jnp.float32),
            (Iw_inv / state.mass_scale) if B > 0 else jnp.zeros((0, 3, 3), dtype=jnp.float32),
            pre_gathered=pre_gathered,
            dt=h,
            baumgarte=config.baumgarte,
            compliance=config.compliance,
            iterations=(config.solver_iterations if lam0 is None
                        else int(config.warm_iterations
                                 or config.solver_iterations)),
            max_depenetration_vel=config.max_depenetration_vel,
            fused_solver=fused_solver,
            segmented=segmented,
            precond=config.contact_precond,
            lam0=lam0,
        )

        qd_new = qd_free + sol.dqd
        v_new = v_free + sol.dbody_v
        w_new = w_free + sol.dbody_w

        # integrate positions
        q_new = state.q + h * qd_new
        q_clamped = jnp.clip(q_new, lower, upper)
        at_limit = q_new != q_clamped
        qd_new = jnp.where(at_limit, 0.0, qd_new)
        body_pos_new = state.body_pos + h * v_new
        body_quat_new = quat_integrate(state.body_quat, w_new, h)

        # diagnostics: contact force magnitudes (impulse / dt), accumulated
        # per link with one-hot matmuls (no scatters in the hot loop). When
        # `force_links` is set only those rows are accumulated (the envs
        # read FSR + arm links only); the per-body accumulation has no
        # consumer and is skipped
        fmag = sol.fmag / h  # (K,)
        if config.force_links:
            rows = jnp.asarray(config.force_links, dtype=jnp.int32)  # (R,)
            ohR_pt = (rows[:, None] == contacts.link_pt[None, :])
            ohR_col = (rows[:, None] == contacts.link_col[None, :])
            row_force = (ohR_pt.astype(fmag.dtype) @ fmag
                         + ohR_col.astype(fmag.dtype) @ fmag)  # (R,)
            link_force = jnp.zeros(L, dtype=fmag.dtype).at[rows].set(row_force)
        else:
            ohL_pt = (jnp.arange(L, dtype=jnp.int32)[:, None] == contacts.link_pt[None, :])
            ohL_col = (jnp.arange(L, dtype=jnp.int32)[:, None] == contacts.link_col[None, :])
            link_force = (ohL_pt.astype(fmag.dtype) @ fmag
                          + ohL_col.astype(fmag.dtype) @ fmag)
        body_force = jnp.zeros(B, dtype=fmag.dtype)

        new_state = state._replace(
            q=q_clamped.astype(state.q.dtype),
            qd=qd_new.astype(state.q.dtype),
            body_pos=body_pos_new,
            body_quat=body_quat_new,
            body_linvel=v_new,
            body_angvel=w_new,
            link_contact_force=link_force,
            body_contact_force=body_force,
            minv=Minv,
        )
        # basis-major flat impulses for warm-starting the next substep's
        # solve (valid while the pair list is held fixed by `step`)
        return new_state, sol.impulses.T.reshape(-1)

    def substep(state: SimState, fk_res=None, contact_sel=None) -> SimState:
        return _substep_sol(state, fk_res, contact_sel)[0]

    def step(state: SimState, fk0=None, tick=None) -> SimState:
        if not config.reuse_contacts:
            for i in range(config.substeps):
                state = substep(state, fk0 if i == 0 else None)
            return state
        fk_res = fk(state.q, state.qd) if fk0 is None else fk0

        def _fresh_select(_):
            return narrowphase.select(fk_res.pos, fk_res.quat, state.body_pos,
                                      state.body_quat, state.geom,
                                      state.collision_filter)

        if (config.select_every > 1 and tick is not None
                and state.sel_depth is not None):
            # uniform scalar cadence: lax.cond on an UNBATCHED predicate
            # stays a real branch under vmap, so off-tick steps skip the
            # O(P*C) grid entirely
            do = (jnp.asarray(tick, jnp.int32) % config.select_every) == 0
            sel = jax.lax.cond(
                do, _fresh_select,
                lambda _: (state.sel_depth, state.sel_pt, state.sel_col),
                operand=None)
            state = state._replace(sel_depth=sel[0], sel_pt=sel[1],
                                   sel_col=sel[2])
        else:
            sel = _fresh_select(None)
        lam = None
        for i in range(config.substeps):
            state, lam = _substep_sol(state, fk_res if i == 0 else None,
                                      contact_sel=sel, lam0=lam)
        return state

    return Simulator(
        scene=scene,
        config=config,
        init_state=init_state,
        step=step,
        substep=substep,
        fk=fk,
        site_jacobian=site_jacobian,
        mass_matrix=mass_matrix,
        minv_at=minv_at,
    )
