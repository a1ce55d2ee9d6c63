"""Batched forward kinematics for fixed-base articulations.

TPU-native replacement for PhysX's rigid-body state + Jacobian tensors
(reference: `gym.acquire_rigid_body_state_tensor` / `acquire_jacobian_tensor`
in `tasks/block_assembly/allegro_hand_block_assembly_grasp_sim.py:236-243`).

All functions are built by a factory that closes over the static
`Articulation` tables (they become XLA constants), take per-env `(q, qd)`
vectors, and are `vmap`/`jit`-safe. The link loop is a static Python loop
over the (small, ~35-link) topology — XLA unrolls and fuses it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# fp32-accurate einsums: the mass matrix feeds a Cholesky solve — bf16 MXU
# passthrough is not acceptable there
HI = jax.lax.Precision.HIGHEST

from ..core.math import quat_apply, quat_from_angle_axis, quat_mul, quat_to_matrix
from ..core.model import JOINT_PRISMATIC, JOINT_REVOLUTE, Articulation


class FkResult(NamedTuple):
    """World-frame kinematic state of every link (per env)."""

    pos: jnp.ndarray  # (L, 3) link-frame origin
    quat: jnp.ndarray  # (L, 4) xyzw
    linvel: jnp.ndarray  # (L, 3) velocity of link origin
    angvel: jnp.ndarray  # (L, 3)
    dof_axis_w: jnp.ndarray  # (D, 3) world joint axes
    dof_origin_w: jnp.ndarray  # (D, 3) world joint origins


def make_kinematics(art: Articulation):
    """Returns (fk, site_jacobian, com_jacobians) closures."""

    L, D = art.nlinks, art.ndof
    parent = art.parent  # host ints, used for static indexing
    origin_pos = jnp.asarray(art.origin_pos, dtype=jnp.float32)
    origin_quat = jnp.asarray(art.origin_quat, dtype=jnp.float32)
    axis = jnp.asarray(art.axis, dtype=jnp.float32)
    base_pos = jnp.asarray(art.base_pos, dtype=jnp.float32)
    base_quat = jnp.asarray(art.base_quat, dtype=jnp.float32)
    dof_index = art.dof_index  # host ints
    joint_type = art.joint_type  # host ints
    dof_link = art.dof_link
    anc = jnp.asarray(art.ancestor_mask, dtype=jnp.float32)  # (L, D)

    # ---- level-batched FK tables (host-side, static) -------------------
    # depth of each link in the tree; links at the same depth are processed
    # as ONE batched op per quantity instead of a per-link Python loop (the
    # serial fk below costs ~2000 tiny (N,3)/(N,4) VPU kernels at 2048 envs
    # — the profiled round-3 substep tail, ROUND3.md §2)
    depth_np = np.zeros(L, dtype=np.int64)
    for _i in range(L):
        if parent[_i] >= 0:
            depth_np[_i] = depth_np[int(parent[_i])] + 1
    max_depth = int(depth_np.max()) + 1 if L else 0
    levels = [np.nonzero(depth_np == k)[0].astype(np.int32)
              for k in range(max_depth)]
    # row of each link in the level-ordered concatenation
    level_order = np.concatenate(levels) if L else np.zeros(0, np.int32)
    row_of_link = np.zeros(L, dtype=np.int64)
    row_of_link[level_order] = np.arange(L)
    inv_perm = row_of_link[np.arange(L)]  # quat_acc[inv_perm] = link order
    parent_clip = np.where(parent < 0, 0, parent).astype(np.int32)
    root_mask_np = (parent < 0)
    is_rev_link = (np.asarray(joint_type) == JOINT_REVOLUTE)
    is_pris_link = (np.asarray(joint_type) == JOINT_PRISMATIC)
    dof_clip = np.where(np.asarray(dof_index) < 0, 0,
                        np.asarray(dof_index)).astype(np.int32)
    has_dof = (np.asarray(dof_index) >= 0)
    # link-ancestor matrix incl self: AncL[i, a] = 1 if a on path root->i
    ancL_np = np.zeros((L, L), dtype=np.float32)
    for _i in range(L):
        _j = _i
        while _j >= 0:
            ancL_np[_i, _j] = 1.0
            _j = int(parent[_j])
    ancL = jnp.asarray(ancL_np)
    rev_link_j = jnp.asarray(is_rev_link, dtype=jnp.float32)
    pris_link_j = jnp.asarray(is_pris_link, dtype=jnp.float32)
    root_mask_j = jnp.asarray(root_mask_np)
    # per-dof masks (D,)
    dl = np.asarray(dof_link)
    rev_dof = jnp.asarray(is_rev_link[dl], dtype=jnp.float32)
    pris_dof = jnp.asarray(is_pris_link[dl], dtype=jnp.float32)
    dof_parent = parent[dl]  # (D,) link parent of each dof's link
    dof_parent_clip = np.where(dof_parent < 0, 0, dof_parent).astype(np.int32)
    dof_root = jnp.asarray(dof_parent < 0)

    def _quat_chain(q: jnp.ndarray) -> jnp.ndarray:
        """All link quats (L, 4) via a per-tree-depth batched sweep."""
        acc = None  # (rows_so_far, 4) in level order
        for k, idx in enumerate(levels):
            if k == 0:
                p_quat = jnp.broadcast_to(base_quat, (len(idx), 4))
            else:
                p_quat = acc[row_of_link[parent[idx]]]
            j_quat = quat_mul(p_quat, origin_quat[idx])
            ang = q[dof_clip[idx]] * jnp.asarray(
                is_rev_link[idx], dtype=q.dtype)
            rot = quat_from_angle_axis(ang, axis[idx])
            l_quat = quat_mul(j_quat, rot)
            acc = l_quat if acc is None else jnp.concatenate([acc, l_quat])
        return acc[inv_perm]

    def fk(q: jnp.ndarray, qd: jnp.ndarray) -> FkResult:
        quat = _quat_chain(q)  # (L, 4)
        # parent quats / batched joint frames
        pq = jnp.where(root_mask_j[:, None], base_quat, quat[parent_clip])
        a_w = quat_apply(quat_mul(pq, origin_quat), axis)  # (L, 3) world axes
        q_link = q[dof_clip] * jnp.asarray(has_dof, dtype=q.dtype)
        off = quat_apply(pq, origin_pos)  # parent-rotated joint offsets
        d = off + pris_link_j[:, None] * a_w * q_link[:, None]
        pos = base_pos + jax.lax.dot_general(
            ancL, d, dimension_numbers=(((1,), (0,)), ((), ())), precision=HI)
        j_pos = jnp.where(root_mask_j[:, None], base_pos,
                          pos[parent_clip]) + off
        dof_axis_w = a_w[dl]  # (D, 3)
        dof_origin_w = j_pos[dl]  # (D, 3)
        # angular velocity: sum of revolute ancestor axis rates
        s = (qd * rev_dof)[:, None] * dof_axis_w  # (D, 3)
        av = jax.lax.dot_general(
            anc, s, dimension_numbers=(((1,), (0,)), ((), ())), precision=HI)
        # linear velocity of link origins via SoA Jacobian planes (L, D)
        ox, oy, oz = dof_origin_w[:, 0], dof_origin_w[:, 1], dof_origin_w[:, 2]
        ax_, ay_, az_ = dof_axis_w[:, 0], dof_axis_w[:, 1], dof_axis_w[:, 2]
        rx = pos[:, 0, None] - ox[None, :]
        ry = pos[:, 1, None] - oy[None, :]
        rz = pos[:, 2, None] - oz[None, :]
        w = anc * qd[None, :]
        lvx = jnp.sum(w * ((ay_ * rz - az_ * ry) * rev_dof + ax_ * pris_dof), axis=1)
        lvy = jnp.sum(w * ((az_ * rx - ax_ * rz) * rev_dof + ay_ * pris_dof), axis=1)
        lvz = jnp.sum(w * ((ax_ * ry - ay_ * rx) * rev_dof + az_ * pris_dof), axis=1)
        return FkResult(
            pos=pos,
            quat=quat,
            linvel=jnp.stack([lvx, lvy, lvz], axis=-1),
            angvel=av,
            dof_axis_w=dof_axis_w,
            dof_origin_w=dof_origin_w,
        )

    def fk_serial(q: jnp.ndarray, qd: jnp.ndarray) -> FkResult:
        pos, quat, lv, av = [], [], [], []
        for i in range(L):
            if parent[i] < 0:
                p_pos, p_quat = base_pos, base_quat
                p_lv = jnp.zeros(3, dtype=q.dtype)
                p_av = jnp.zeros(3, dtype=q.dtype)
            else:
                pi = int(parent[i])
                p_pos, p_quat, p_lv, p_av = pos[pi], quat[pi], lv[pi], av[pi]
            # joint frame (fixed part) in world
            j_pos = p_pos + quat_apply(p_quat, origin_pos[i])
            j_quat = quat_mul(p_quat, origin_quat[i])
            # velocity of the joint origin point (rigidly attached to parent)
            r = j_pos - p_pos
            j_lv = p_lv + jnp.cross(p_av, r)
            jt = int(joint_type[i])
            if jt == JOINT_REVOLUTE:
                d = int(dof_index[i])
                rot = quat_from_angle_axis(q[d], axis[i])
                l_quat = quat_mul(j_quat, rot)
                a_w = quat_apply(j_quat, axis[i])
                l_av = p_av + a_w * qd[d]
                l_pos, l_lv = j_pos, j_lv
            elif jt == JOINT_PRISMATIC:
                d = int(dof_index[i])
                a_w = quat_apply(j_quat, axis[i])
                l_pos = j_pos + a_w * q[d]
                l_quat = j_quat
                l_av = p_av
                l_lv = j_lv + a_w * qd[d] + jnp.cross(p_av, a_w * q[d])
            else:  # fixed
                l_pos, l_quat, l_lv, l_av = j_pos, j_quat, j_lv, p_av
            pos.append(l_pos)
            quat.append(l_quat)
            lv.append(l_lv)
            av.append(l_av)
        pos = jnp.stack(pos)
        quat = jnp.stack(quat)
        lv = jnp.stack(lv)
        av = jnp.stack(av)
        # world joint frames per dof (for Jacobians / contact torque mapping)
        dof_axis_w = []
        dof_origin_w = []
        for d in range(D):
            li = int(dof_link[d])
            pi = int(parent[li])
            if pi < 0:
                pq, pp = base_quat, base_pos
            else:
                pq, pp = quat[pi], pos[pi]
            jq = quat_mul(pq, origin_quat[li])
            dof_axis_w.append(quat_apply(jq, axis[li]))
            dof_origin_w.append(pp + quat_apply(pq, origin_pos[li]))
        return FkResult(
            pos=pos,
            quat=quat,
            linvel=lv,
            angvel=av,
            dof_axis_w=jnp.stack(dof_axis_w),
            dof_origin_w=jnp.stack(dof_origin_w),
        )

    def point_jacobian_tau(fk_res: FkResult, link_idx: jnp.ndarray, p_w: jnp.ndarray,
                           force_w: jnp.ndarray) -> jnp.ndarray:
        """Map world point forces on links to generalized torques: tau = J^T f.

        link_idx: (N,) int32, p_w: (N, 3), force_w: (N, 3) -> (D,)
        For revolute dof d: tau_d = sum_n anc[link_n, d] * (a_d x (p_n - o_d)) . f_n
        """
        a = fk_res.dof_axis_w  # (D, 3)
        o = fk_res.dof_origin_w  # (D, 3)
        rel = p_w[:, None, :] - o[None, :, :]  # (N, D, 3)
        lever = jnp.cross(jnp.broadcast_to(a[None], rel.shape), rel)  # (N, D, 3)
        mask = anc[link_idx]  # (N, D)
        return jnp.einsum("nd,ndk,nk->d", mask, lever, force_w, precision=HI)

    def site_jacobian(fk_res: FkResult, link: int, offset=None) -> jnp.ndarray:
        """6 x D geometric Jacobian of a point on `link` (rows: lin 3, ang 3).

        Mirrors the slice of the PhysX jacobian used by `control_ik`
        (`..._grasp_sim.py:1794-1803`): world-frame, columns = dofs.
        """
        p = fk_res.pos[link]
        if offset is not None:
            p = p + quat_apply(fk_res.quat[link], offset)
        a = fk_res.dof_axis_w  # (D, 3)
        o = fk_res.dof_origin_w
        mask = anc[link]  # (D,)
        lin = jnp.cross(a, p[None, :] - o) * mask[:, None]  # (D, 3)
        ang = a * mask[:, None]
        return jnp.concatenate([lin.T, ang.T], axis=0)  # (6, D)

    def point_velocity(fk_res: FkResult, link_idx: jnp.ndarray, p_w: jnp.ndarray):
        """World velocity of material points attached to links. (N,3)"""
        lv = fk_res.linvel[link_idx]
        av = fk_res.angvel[link_idx]
        return lv + jnp.cross(av, p_w - fk_res.pos[link_idx])

    def point_jacobian_rows(fk_res: FkResult, link_idx: jnp.ndarray, p_w: jnp.ndarray):
        """Translational Jacobians of points on links: (N, 3, D).

        v_p = J qd ; used to build contact Jacobians for the QP solver.
        """
        a = fk_res.dof_axis_w  # (D, 3)
        o = fk_res.dof_origin_w
        rel = p_w[:, None, :] - o[None, :, :]  # (N, D, 3)
        lever = jnp.cross(jnp.broadcast_to(a[None], rel.shape), rel)  # (N, D, 3)
        mask = anc[link_idx]  # (N, D)
        return jnp.swapaxes(lever * mask[..., None], 1, 2)  # (N, 3, D)

    def point_jacobian_rows_soa(fk_res: FkResult, anc_mask: jnp.ndarray,
                                px: jnp.ndarray, py: jnp.ndarray,
                                pz: jnp.ndarray):
        """Translational point Jacobians, (K, D)-oriented, gather-free.

        anc_mask: (K, D) dof ancestor mask for each contact's link (zero rows
        for body/static owners) — precompacted by the narrowphase so no
        `anc[link_idx]` gather happens in the hot loop. px/py/pz: (K,) SoA
        point world coordinates. Returns (Jx, Jy, Jz), each (K, D)."""
        a = fk_res.dof_axis_w  # (D, 3)
        o = fk_res.dof_origin_w  # (D, 3)
        rx = px[:, None] - o[None, :, 0]  # (K, D)
        ry = py[:, None] - o[None, :, 1]
        rz = pz[:, None] - o[None, :, 2]
        ax, ay, az = a[None, :, 0], a[None, :, 1], a[None, :, 2]
        jx = (ay * rz - az * ry) * anc_mask
        jy = (az * rx - ax * rz) * anc_mask
        jz = (ax * ry - ay * rx) * anc_mask
        return jx, jy, jz

    def point_jacobian_planes(fk_res: FkResult, link_idx: jnp.ndarray,
                              p_w: jnp.ndarray, scale: jnp.ndarray = None):
        """SoA translational point Jacobians: (Jx, Jy, Jz), each (D, N).

        Same content as `point_jacobian_rows` but laid out with the big
        contact axis LAST so the TPU (8, 128) tiling pads nothing material
        (the AoS (N, D, 3) form pads its minor dims >40x). `scale` optionally
        multiplies per-point columns (masking)."""
        a = fk_res.dof_axis_w  # (D, 3)
        o = fk_res.dof_origin_w  # (D, 3)
        mask = anc[link_idx].T  # (D, N)
        if scale is not None:
            mask = mask * scale[None, :]
        # rel components, (D, N)
        rx = p_w[None, :, 0] - o[:, 0, None]
        ry = p_w[None, :, 1] - o[:, 1, None]
        rz = p_w[None, :, 2] - o[:, 2, None]
        ax, ay, az = a[:, 0, None], a[:, 1, None], a[:, 2, None]
        jx = (ay * rz - az * ry) * mask
        jy = (az * rx - ax * rz) * mask
        jz = (ax * ry - ay * rx) * mask
        return jx, jy, jz

    fk.reference = fk_serial  # serial per-link implementation, kept for tests
    return (fk, site_jacobian, point_jacobian_tau, point_velocity,
            point_jacobian_rows, point_jacobian_planes, point_jacobian_rows_soa)


def make_dynamics(art: Articulation, gravity=(0.0, 0.0, -9.81)):
    """Mass matrix + bias forces via world-frame link Jacobians.

    CRBA-equivalent: M = sum_l J_l^T I_l J_l, assembled with einsums so XLA
    maps it onto the MXU (batched over envs). Bias via Newton-Euler with
    qdd = 0. Replaces the PhysX articulation solver
    (`gym.simulate`, `base_task.py:140`).
    """
    L, D = art.nlinks, art.ndof
    anc = jnp.asarray(art.ancestor_mask, dtype=jnp.float32)  # (L, D)
    mass = jnp.asarray(art.mass, dtype=jnp.float32)  # (L,)
    com = jnp.asarray(art.com, dtype=jnp.float32)  # (L, 3)
    inertia = jnp.asarray(art.inertia, dtype=jnp.float32)  # (L, 3, 3)
    armature = jnp.asarray(art.armature, dtype=jnp.float32)  # (D,)
    mass3 = jnp.tile(jnp.asarray(art.mass, dtype=jnp.float32), 3)  # (3L,)
    g = jnp.asarray(gravity, dtype=jnp.float32)
    parent = art.parent

    def com_world(fk_res: FkResult):
        return fk_res.pos + quat_apply(fk_res.quat, com)  # (L, 3)

    def link_jacobian_planes(fk_res: FkResult):
        """SoA com Jacobians: 6 planes of (L, D) — (jlin_x/y/z, jang_x/y/z).

        TPU layout discipline: no trailing-3 tensors (they pad 3 -> 128
        lanes and cost >40x in HBM traffic); the D axis is the minor dim.
        """
        a = fk_res.dof_axis_w  # (D, 3)
        o = fk_res.dof_origin_w  # (D, 3)
        c = com_world(fk_res)  # (L, 3)
        rx = c[:, 0, None] - o[None, :, 0]  # (L, D)
        ry = c[:, 1, None] - o[None, :, 1]
        rz = c[:, 2, None] - o[None, :, 2]
        ax, ay, az = a[None, :, 0], a[None, :, 1], a[None, :, 2]
        jlx = (ay * rz - az * ry) * anc
        jly = (az * rx - ax * rz) * anc
        jlz = (ax * ry - ay * rx) * anc
        jax_ = ax * anc
        jay = ay * anc
        jaz = az * anc
        return (jlx, jly, jlz), (jax_, jay, jaz)

    def link_jacobians(fk_res: FkResult):
        """(Jlin, Jang): (L, D, 3) translational/rotational Jacobians at coms.

        AoS view for callers that want per-link blocks (non-hot paths)."""
        (jlx, jly, jlz), (jax_, jay, jaz) = link_jacobian_planes(fk_res)
        return (jnp.stack([jlx, jly, jlz], axis=-1),
                jnp.stack([jax_, jay, jaz], axis=-1))

    # static per-link inertia component planes (L,) — the world inertia is
    # computed directly in plane form from the quaternion (iw = R I R^T
    # expanded component-wise); materializing (L, 3, 3) tensors and slicing
    # them back into planes cost 2.75 ms/substep at 2048 envs (v5e trace:
    # the (2048,33,3,3) fusion + its 9-way (2048,33,1,1) plane-slice)
    _I = [[inertia[:, a, b] for b in range(3)] for a in range(3)]

    def _rot_planes(quat):
        """Rotation-matrix component planes: 3x3 nest of (L,) arrays."""
        x, y, z, w = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
        xx, yy, zz = x * x, y * y, z * z
        xy, xz, yz = x * y, x * z, y * z
        wx, wy, wz = w * x, w * y, w * z
        return ((1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
                (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
                (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)))

    def _iw_planes(quat):
        """World-frame inertia component planes iw[a][b]: (L,) each."""
        R = _rot_planes(quat)
        t = [[sum(R[a][c] * _I[c][d] for c in range(3)) for d in range(3)]
             for a in range(3)]
        return [[sum(t[a][d] * R[b][d] for d in range(3)) for b in range(3)]
                for a in range(3)]

    def mass_matrix(fk_res: FkResult) -> jnp.ndarray:
        """CRBA via two stacked (3L, D) matmuls on the MXU.

        M = Jlin^T diag(m) Jlin + Jang^T Iw Jang with all factors stored as
        stacked component planes (3L, D)."""
        (jlx, jly, jlz), (jax_, jay, jaz) = link_jacobian_planes(fk_res)
        iw = _iw_planes(fk_res.quat)
        # W rows: (Iw jang)_a = sum_b Iw[l, a, b] * jang_b[l]
        w_rows = [
            iw[aa][0][:, None] * jax_ + iw[aa][1][:, None] * jay
            + iw[aa][2][:, None] * jaz
            for aa in range(3)
        ]
        # single stacked (6L, D) factor pair: M = lhs^T rhs, contraction on
        # dim 0 via dot_general (no transpose relayout)
        lhs = jnp.concatenate(
            [mass3[:, None] * jnp.concatenate([jlx, jly, jlz], axis=0),
             jnp.concatenate([jax_, jay, jaz], axis=0)], axis=0)
        rhs = jnp.concatenate([jlx, jly, jlz] + w_rows, axis=0)
        M = jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(((0,), (0,)), ((), ())), precision=HI
        )
        return M + jnp.diag(armature)

    # per-dof static tables for the closed-form bias (mirror kinematics)
    _dl = np.asarray(art.dof_link)
    _jt = np.asarray(art.joint_type)
    _rev_dof = jnp.asarray(_jt[_dl] == JOINT_REVOLUTE, dtype=jnp.float32)
    _pris_dof = jnp.asarray(_jt[_dl] == JOINT_PRISMATIC, dtype=jnp.float32)
    _dof_parent = np.asarray(parent)[_dl]
    _dof_parent_clip = np.where(_dof_parent < 0, 0, _dof_parent).astype(np.int32)
    _dof_root = jnp.asarray(_dof_parent < 0)

    def _ancmv(x):
        """anc @ x with full fp32 accumulation: (L, D) @ (D, k) -> (L, k)."""
        return jax.lax.dot_general(
            anc, x, dimension_numbers=(((1,), (0,)), ((), ())), precision=HI)

    def bias_forces(fk_res: FkResult, qd: jnp.ndarray) -> jnp.ndarray:
        """C(q, qd) qd - tau_gravity, as generalized forces (D,).

        Closed-form batched Newton-Euler with qdd = 0: the link accelerations
        are a_com_l = d/dt (J_l(c_l) qd), expanded term-by-term into
        ancestor-matvec combinations of per-dof vectors — no per-link Python
        loop (the serial forward recursion below is kept as `.reference`;
        equality is pinned by tests/test_fk_batched.py).
        """
        c = com_world(fk_res)
        a_d = fk_res.dof_axis_w  # (D, 3)
        o_d = fk_res.dof_origin_w  # (D, 3)
        w_pl = jnp.where(_dof_root[:, None], 0.0,
                         fk_res.angvel[_dof_parent_clip])  # (D, 3)
        v_pl = jnp.where(_dof_root[:, None], 0.0,
                         fk_res.linvel[_dof_parent_clip])
        p_pl = fk_res.pos[_dof_parent_clip]
        v_od = v_pl + jnp.cross(w_pl, o_d - p_pl)  # joint-origin point vel
        k = qd[:, None] * jnp.cross(w_pl, a_d)  # (D, 3) = qd * da/dt
        u = k * _rev_dof[:, None]
        alpha = _ancmv(u)  # (L, 3), qdd = 0
        # a_com = Au x c - A(u x o) + A(k*pris) + w x v_com - A(m)
        Au = alpha
        Auxo = _ancmv(jnp.cross(u, o_d))
        Tpris = _ancmv(k * _pris_dof[:, None])
        # com point velocities via SoA planes (L, D)
        rx = c[:, 0, None] - o_d[None, :, 0]
        ry = c[:, 1, None] - o_d[None, :, 1]
        rz = c[:, 2, None] - o_d[None, :, 2]
        axp = a_d[None, :, 0]
        ayp = a_d[None, :, 1]
        azp = a_d[None, :, 2]
        wgt = anc * qd[None, :]
        vcx = jnp.sum(wgt * ((ayp * rz - azp * ry) * _rev_dof + axp * _pris_dof), axis=1)
        vcy = jnp.sum(wgt * ((azp * rx - axp * rz) * _rev_dof + ayp * _pris_dof), axis=1)
        vcz = jnp.sum(wgt * ((axp * ry - ayp * rx) * _rev_dof + azp * _pris_dof), axis=1)
        v_com = jnp.stack([vcx, vcy, vcz], axis=-1)  # (L, 3)
        m_d = (qd * _rev_dof)[:, None] * jnp.cross(a_d, v_od)
        a_com = (jnp.cross(Au, c) - Auxo + Tpris
                 + jnp.cross(fk_res.angvel, v_com) - _ancmv(m_d))
        w = fk_res.angvel
        F = mass[:, None] * (a_com - g[None, :])  # (L, 3)
        # N = Iw alpha + w x (Iw w), all in component planes (no (L,3,3))
        iw = _iw_planes(fk_res.quat)
        wx, wy, wz = w[:, 0], w[:, 1], w[:, 2]
        alx, aly, alz = alpha[:, 0], alpha[:, 1], alpha[:, 2]
        iwa = [iw[a][0] * alx + iw[a][1] * aly + iw[a][2] * alz for a in range(3)]
        iww = [iw[a][0] * wx + iw[a][1] * wy + iw[a][2] * wz for a in range(3)]
        Nx = iwa[0] + wy * iww[2] - wz * iww[1]
        Ny = iwa[1] + wz * iww[0] - wx * iww[2]
        Nz = iwa[2] + wx * iww[1] - wy * iww[0]
        (jlx, jly, jlz), (jax_, jay, jaz) = link_jacobian_planes(fk_res)
        tau = (
            jnp.sum(jlx * F[:, 0, None] + jly * F[:, 1, None] + jlz * F[:, 2, None],
                    axis=0)
            + jnp.sum(jax_ * Nx[:, None] + jay * Ny[:, None] + jaz * Nz[:, None],
                      axis=0)
        )
        return tau

    def bias_forces_serial(fk_res: FkResult, qd: jnp.ndarray) -> jnp.ndarray:
        """Serial Newton-Euler reference implementation (tests only)."""
        c = com_world(fk_res)
        R = quat_to_matrix(fk_res.quat)
        iw = jnp.einsum("lab,lbc,ldc->lad", R, inertia, R, precision=HI)
        # forward: angular accel (qdd = 0) and com linear accel per link
        alpha = [None] * L
        a_org = [None] * L  # accel of link origin
        for i in range(L):
            pi = int(parent[i])
            if pi < 0:
                p_alpha = jnp.zeros(3, dtype=qd.dtype)
                p_aorg = jnp.zeros(3, dtype=qd.dtype)
                p_av = jnp.zeros(3, dtype=qd.dtype)
                p_pos = None
            else:
                p_alpha, p_aorg = alpha[pi], a_org[pi]
                p_av = fk_res.angvel[pi]
                p_pos = fk_res.pos[pi]
            if p_pos is None:
                r = jnp.zeros(3, dtype=qd.dtype)
            else:
                r = fk_res.pos[i] - p_pos
            a_o = p_aorg + jnp.cross(p_alpha, r) + jnp.cross(p_av, jnp.cross(p_av, r))
            d = int(art.dof_index[i])
            if int(art.joint_type[i]) == JOINT_REVOLUTE:
                a_w = None  # axis from fk dof tables
                aw = fk_res.dof_axis_w[d]
                al = p_alpha + jnp.cross(p_av, aw) * qd[d]
            elif int(art.joint_type[i]) == JOINT_PRISMATIC:
                aw = fk_res.dof_axis_w[d]
                al = p_alpha
                a_o = a_o + 2.0 * jnp.cross(p_av, aw * qd[d])
            else:
                al = p_alpha
            alpha[i] = al
            a_org[i] = a_o
        alpha = jnp.stack(alpha)  # (L, 3)
        a_org = jnp.stack(a_org)
        rc = c - fk_res.pos  # com offset world
        w = fk_res.angvel
        a_com = a_org + jnp.cross(alpha, rc) + jnp.cross(w, jnp.cross(w, rc))
        F = mass[:, None] * (a_com - g[None, :])  # (L, 3)
        N = jnp.einsum("lab,lb->la", iw, alpha, precision=HI) + jnp.cross(w, jnp.einsum("lab,lb->la", iw, w, precision=HI))
        (jlx, jly, jlz), (jax_, jay, jaz) = link_jacobian_planes(fk_res)
        tau = (
            jnp.sum(jlx * F[:, 0, None] + jly * F[:, 1, None] + jlz * F[:, 2, None],
                    axis=0)
            + jnp.sum(jax_ * N[:, 0, None] + jay * N[:, 1, None] + jaz * N[:, 2, None],
                      axis=0)
        )
        return tau

    bias_forces.reference = bias_forces_serial
    return mass_matrix, bias_forces, link_jacobians, com_world
