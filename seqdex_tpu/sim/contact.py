"""Batched contact pipeline: SDF narrowphase + friction-cone impulse QP.

TPU-native replacement for the PhysX TGS contact solver the reference runs
(16 position iterations, 8M-pair GPU buffer — sim config at
`utils/config.py:198-204`, `cfg/allegro_hand_block_assembly_grasp_sim.yaml`).

Design:
* Narrowphase = dense (points x colliders) signed-distance evaluation with a
  static pair mask, followed by a static top-K selection of the deepest
  candidates. Fixed shapes end-to-end — the TPU analog of PhysX's capped
  contact-pair buffer.
* Solver = velocity-level convex QP over contact impulses with isotropic
  Coulomb cones (the "contact QP" of the build spec):
      min_l  1/2 l^T (A + R) l + l^T b     s.t.  l in cone(mu)
  solved by diagonally preconditioned projected-Jacobi iterations — fully
  parallel over contacts (no Gauss-Seidel serialization), MXU-friendly
  (A is a dense 3K x 3K Delassus matrix per env).
* Baumgarte stabilization enters through b; compliance R softens stacking.

All shapes static; everything vmaps over the env axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST

from ..core.math import quat_apply, quat_conjugate, skew
from ..core.model import GEOM_BOX, GEOM_PLANE, GEOM_SPHERE
from .scene import OWNER_BODY, OWNER_LINK, OWNER_STATIC, CompiledScene


def box_sdf_normal(p, half):
    """SDF + outward world(-frame-of-box) normal of an axis-aligned box.

    p: (..., 3) point in box frame; half: (..., 3). Branch-free.
    """
    q = jnp.abs(p) - half
    qp = jnp.maximum(q, 0.0)
    outside = jnp.linalg.norm(qp, axis=-1)
    max_in = jnp.max(q, axis=-1)
    sdf = outside + jnp.minimum(max_in, 0.0)
    sgn = jnp.where(p >= 0, 1.0, -1.0)
    n_out = qp * sgn / jnp.maximum(outside, 1e-9)[..., None]
    inside_axis = jnp.argmax(q, axis=-1)
    n_in = jax.nn.one_hot(inside_axis, 3, dtype=p.dtype) * sgn
    n = jnp.where((outside > 1e-9)[..., None], n_out, n_in)
    return sdf, n


class ContactSet(NamedTuple):
    """K selected contacts (per env)."""

    depth: jnp.ndarray  # (K,) penetration depth (>0 active)
    active: jnp.ndarray  # (K,) bool
    normal: jnp.ndarray  # (K, 3) world, pushes point out of collider
    pos: jnp.ndarray  # (K, 3) world contact position
    friction: jnp.ndarray  # (K,)
    pt_idx: jnp.ndarray  # (K,) int index into point table
    col_idx: jnp.ndarray  # (K,) int index into collider table


def make_narrowphase(scene: CompiledScene, max_contacts: int):
    P, C = scene.npoints, scene.ncolliders
    pt_owner_kind = jnp.asarray(scene.pt_owner_kind)
    pt_owner = jnp.asarray(scene.pt_owner)
    pt_offset = jnp.asarray(scene.pt_offset, dtype=jnp.float32)
    pt_radius = jnp.asarray(scene.pt_radius, dtype=jnp.float32)
    pt_friction = jnp.asarray(scene.pt_friction, dtype=jnp.float32)
    col_kind = scene.col_kind  # host ints — used for static branch selection
    col_owner_kind = jnp.asarray(scene.col_owner_kind)
    col_owner = jnp.asarray(scene.col_owner)
    col_pos = jnp.asarray(scene.col_pos, dtype=jnp.float32)
    col_quat = jnp.asarray(scene.col_quat, dtype=jnp.float32)
    col_size = jnp.asarray(scene.col_size, dtype=jnp.float32)
    col_friction = jnp.asarray(scene.col_friction, dtype=jnp.float32)
    pair_mask = jnp.asarray(scene.pair_mask)
    K = max_contacts

    is_box = jnp.asarray(col_kind == GEOM_BOX)
    is_sphere = jnp.asarray(col_kind == GEOM_SPHERE)
    is_plane = jnp.asarray(col_kind == GEOM_PLANE)

    def point_world(fk_pos, fk_quat, body_pos, body_quat):
        """World positions of all contact points. (P, 3)"""
        lk = jnp.clip(pt_owner, 0, fk_pos.shape[0] - 1)
        bk = jnp.clip(pt_owner, 0, max(body_pos.shape[0] - 1, 0))
        p_link = fk_pos[lk] + quat_apply(fk_quat[lk], pt_offset)
        if body_pos.shape[0] > 0:
            p_body = body_pos[bk] + quat_apply(body_quat[bk], pt_offset)
        else:
            p_body = p_link
        return jnp.where((pt_owner_kind == OWNER_LINK)[:, None], p_link, p_body)

    def collider_world(fk_pos, fk_quat, body_pos, body_quat):
        """World pose of all colliders. ((C,3), (C,4))"""
        lk = jnp.clip(col_owner, 0, fk_pos.shape[0] - 1)
        bk = jnp.clip(col_owner, 0, max(body_pos.shape[0] - 1, 0))
        p_link = fk_pos[lk] + quat_apply(fk_quat[lk], col_pos)
        q_link = _qmul(fk_quat[lk], col_quat)
        if body_pos.shape[0] > 0:
            p_body = body_pos[bk] + quat_apply(body_quat[bk], col_pos)
            q_body = _qmul(body_quat[bk], col_quat)
        else:
            p_body, q_body = p_link, q_link
        kind = col_owner_kind[:, None]
        p = jnp.where(kind == OWNER_STATIC, col_pos,
                      jnp.where(kind == OWNER_LINK, p_link, p_body))
        q = jnp.where(kind == OWNER_STATIC, col_quat,
                      jnp.where(kind == OWNER_LINK, q_link, q_body))
        return p, q

    def narrowphase(fk_pos, fk_quat, body_pos, body_quat) -> ContactSet:
        pw = point_world(fk_pos, fk_quat, body_pos, body_quat)  # (P, 3)
        cp, cq = collider_world(fk_pos, fk_quat, body_pos, body_quat)
        # point in each collider frame: (P, C, 3)
        rel = pw[:, None, :] - cp[None, :, :]
        p_local = quat_apply(quat_conjugate(cq)[None, :, :], rel)
        # box sdf
        sdf_box, n_box = box_sdf_normal(p_local, col_size[None, :, :])
        # sphere sdf
        r_loc = jnp.linalg.norm(p_local, axis=-1)
        sdf_sph = r_loc - col_size[None, :, 0]
        n_sph = p_local / jnp.maximum(r_loc, 1e-9)[..., None]
        # plane z=0 (in collider frame, normal +z)
        sdf_pln = p_local[..., 2]
        n_pln = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0], dtype=pw.dtype), p_local.shape
        )
        sdf = jnp.where(is_box[None, :], sdf_box,
                        jnp.where(is_sphere[None, :], sdf_sph, sdf_pln))
        n_local = jnp.where(is_box[None, :, None], n_box,
                            jnp.where(is_sphere[None, :, None], n_sph, n_pln))
        depth = pt_radius[:, None] - sdf  # (P, C)
        depth = jnp.where(pair_mask, depth, -1e9)
        # static top-K deepest candidates
        flat = depth.reshape(-1)
        top_depth, top_idx = jax.lax.top_k(flat, K)
        pidx = top_idx // C
        cidx = top_idx % C
        n_world = quat_apply(cq[cidx], n_local[pidx, cidx])
        # contact position: point surface projected onto collider
        pos = pw[pidx] - n_world * (pt_radius[pidx] + jnp.maximum(top_depth, 0.0) * 0.5)[:, None]
        mu = 0.5 * (pt_friction[pidx] + col_friction[cidx])
        return ContactSet(
            depth=top_depth,
            active=top_depth > 0.0,
            normal=n_world,
            pos=pos,
            friction=mu,
            pt_idx=pidx,
            col_idx=cidx,
        )

    return narrowphase, point_world


def _qmul(a, b):
    from ..core.math import quat_mul

    return quat_mul(a, b)


def _tangent_basis(n):
    """Two unit tangents orthogonal to n: (..., 3) -> ((..., 3), (..., 3))."""
    # pick helper axis least aligned with n
    h = jnp.where(
        (jnp.abs(n[..., 0]) < 0.7)[..., None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype=n.dtype), n.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], dtype=n.dtype), n.shape),
    )
    t1 = jnp.cross(n, h)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def project_cone(lam, mu):
    """Project impulses onto the second-order friction cone.

    lam: (..., 3) = (n, t1, t2) components; mu: (...,).
    """
    ln = lam[..., 0]
    lt = lam[..., 1:]
    tn = jnp.linalg.norm(lt, axis=-1)
    inside = tn <= mu * ln
    below = mu * tn <= -ln  # polar cone -> zero
    # projection onto cone boundary
    scale = jnp.maximum(mu * tn + ln, 0.0) / (mu**2 + 1.0)
    ln_p = scale
    lt_dir = lt / jnp.maximum(tn, 1e-9)[..., None]
    lt_p = (mu * scale)[..., None] * lt_dir
    ln_out = jnp.where(inside, ln, jnp.where(below, 0.0, ln_p))
    lt_out = jnp.where(inside[..., None], lt, jnp.where(below[..., None], 0.0, lt_p))
    return jnp.concatenate([ln_out[..., None], lt_out], axis=-1)


class SolveResult(NamedTuple):
    impulses: jnp.ndarray  # (K, 3) world contact impulses in (n, t1, t2) basis
    force_world: jnp.ndarray  # (K, 3) impulse vector in world coords
    dqd: jnp.ndarray  # (D,) robot velocity change
    dbody_v: jnp.ndarray  # (B, 3)
    dbody_w: jnp.ndarray  # (B, 3)


def solve_contact_qp(
    contacts: ContactSet,
    # contact jacobian pieces
    J_robot: jnp.ndarray,  # (K, 3, D) robot dof rows (0 where robot uninvolved)
    body_idx_pt: jnp.ndarray,  # (K,) body index of point owner or -1
    body_idx_col: jnp.ndarray,  # (K,) body index of collider owner or -1
    r_pt: jnp.ndarray,  # (K, 3) contact pos - body com (point side)
    r_col: jnp.ndarray,  # (K, 3) collider side
    v_rel: jnp.ndarray,  # (K, 3) world relative velocity (point - collider) at contact
    chol_M,  # cho_factor of the (implicitly damped) robot mass matrix
    inv_mass_b: jnp.ndarray,  # (B,)
    inv_inertia_w: jnp.ndarray,  # (B, 3, 3) world-frame inverse inertia
    *,
    dt: float,
    baumgarte: float,
    compliance: float,
    iterations: int,
    max_depenetration_vel: float = 0.5,
):
    """Solve the contact impulse QP (see module docstring). Per-env."""
    K = contacts.depth.shape[0]
    B = inv_mass_b.shape[0]
    n = contacts.normal
    t1, t2 = _tangent_basis(n)
    basis = jnp.stack([n, t1, t2], axis=1)  # (K, 3basis, 3world)

    # Contact-frame jacobian rows J_c = basis @ (J_pt - J_col).
    # Robot part: (K, 3, D)
    Jr = jnp.einsum("kbw,kwd->kbd", basis, J_robot, precision=HI)
    # Body parts enter via per-body index one-hots (B small).
    onehot_pt = jax.nn.one_hot(body_idx_pt, B, dtype=n.dtype)  # (K, B) 0 rows for -1
    onehot_col = jax.nn.one_hot(body_idx_col, B, dtype=n.dtype)

    # W = M^-1 J^T for the robot block: (K, 3, D)
    D = Jr.shape[-1]
    Wr = jax.scipy.linalg.cho_solve(chol_M, Jr.reshape(-1, D).T).T.reshape(K, 3, D)

    # Delassus: robot block + body blocks
    A = jnp.einsum("kbd,lcd->kblc", Jr, Wr, precision=HI)  # (K, 3, K, 3)

    # Body contributions, for each (point-side, collider-side) combination:
    # lin: basis·basis' * invm[shared body]; ang: (r x basis)^T Iinv (r' x basis')
    if B > 0:
        for oa, ra, sa in ((onehot_pt, r_pt, 1.0), (onehot_col, r_col, -1.0)):
            for ob, rb, sb in ((onehot_pt, r_pt, 1.0), (onehot_col, r_col, -1.0)):
                share = oa @ (ob * inv_mass_b[None, :]).T  # (K, K) invm if same body
                lin = jnp.einsum("kbw,lcw->kblc", basis, basis, precision=HI) * share[:, None, :, None]
                rxb_a = jnp.cross(ra[:, None, :], basis)
                rxb_b = jnp.cross(rb[:, None, :], basis)
                Iinv_a = jnp.einsum("kb,bxy->kxy", oa, inv_inertia_w)
                share_b = oa @ ob.T
                ang = jnp.einsum("kbx,kxy,lcy->kblc", rxb_a, Iinv_a, rxb_b, precision=HI)
                ang = ang * share_b[:, None, :, None]
                A = A + (sa * sb) * (lin + ang)

    A = A.reshape(3 * K, 3 * K)
    act = contacts.active
    # rhs: relative velocity in contact frame + Baumgarte bias
    b = jnp.einsum("kbw,kw->kb", basis, v_rel)  # (K, 3)
    bias = jnp.minimum(baumgarte / dt * jnp.maximum(contacts.depth, 0.0),
                       max_depenetration_vel)
    b = b.at[:, 0].add(-bias)
    b = b.reshape(3 * K)

    reg = compliance
    # Projected-Jacobi step size: row-sum (infinity-norm) scaling so the
    # parallel update contracts even when many contacts couple through one
    # body (plain 1/diag diverges there).
    act_cols = jnp.repeat(act, 3)
    row_sum = jnp.sum(jnp.abs(A) * act_cols[None, :], axis=1)  # (3K,)
    row_sum = jnp.max(row_sum.reshape(K, 3), axis=-1)  # (K,)
    alpha = 1.0 / (jnp.maximum(row_sum, 1e-6) + reg)
    mu = jnp.where(act, contacts.friction, 0.0)

    def body_fn(_, lam):
        g = (jnp.dot(A, lam, precision=HI) + reg * lam + b).reshape(K, 3)
        lam2 = lam.reshape(K, 3) - alpha[:, None] * g
        lam2 = project_cone(lam2, mu)
        lam2 = jnp.where(act[:, None], lam2, 0.0)
        return lam2.reshape(3 * K)

    lam = jax.lax.fori_loop(0, iterations, body_fn, jnp.zeros(3 * K, dtype=b.dtype))
    lam_k = lam.reshape(K, 3)
    f_world = jnp.einsum("kb,kbw->kw", lam_k, basis)  # (K, 3) impulses, world

    # velocity updates
    dqd = jnp.einsum("kbd,kb->d", Wr, lam_k, precision=HI)
    if B > 0:
        dbody_v = jnp.einsum("kb,kw->bw", onehot_pt * inv_mass_b[None, :], f_world) - \
                  jnp.einsum("kb,kw->bw", onehot_col * inv_mass_b[None, :], f_world)
        tq_pt = jnp.cross(r_pt, f_world)  # (K, 3)
        tq_col = jnp.cross(r_col, f_world)
        tq = jnp.einsum("kb,kw->bw", onehot_pt, tq_pt) - jnp.einsum(
            "kb,kw->bw", onehot_col, tq_col
        )
        dbody_w = jnp.einsum("bxy,by->bx", inv_inertia_w, tq)
    else:
        dbody_v = jnp.zeros((0, 3), dtype=b.dtype)
        dbody_w = jnp.zeros((0, 3), dtype=b.dtype)

    return SolveResult(
        impulses=lam_k,
        force_world=f_world,
        dqd=dqd,
        dbody_v=dbody_v,
        dbody_w=dbody_w,
    )
