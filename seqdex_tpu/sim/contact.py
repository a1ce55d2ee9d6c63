"""Batched contact pipeline: SDF narrowphase + friction-cone impulse QP.

TPU-native replacement for the PhysX TGS contact solver the reference runs
(16 position iterations, 8M-pair GPU buffer — sim config at
`utils/config.py:198-204`, `cfg/allegro_hand_block_assembly_grasp_sim.yaml`).

Design:
* Narrowphase = dense (colliders x points) signed-distance evaluation with a
  static pair mask, then per-point best-2 collider selection and a static
  top-K. Fixed shapes end-to-end — the TPU analog of PhysX's capped
  contact-pair buffer.
* Solver = velocity-level convex QP over contact impulses with isotropic
  Coulomb cones (the "contact QP" of the build spec):
      min_l  1/2 l^T (A + R) l + l^T b     s.t.  l in cone(mu)
  solved by row-sum-preconditioned projected-Jacobi iterations — fully
  parallel over contacts, MXU-friendly (A is a dense 3K x 3K Delassus).

Layout notes (the hot-path discipline): TPU tiles the two minor dims to
(8, 128) fp32, so every narrowphase array keeps the big point axis LAST
((C, P), components as separate planes — SoA), and the solver flattens all
(K, 3, ...) tensors to (3K, ...) matrices before any contraction. Writing
this with (..., 3)-trailing AoS shapes costs >10x in padded HBM traffic.

All shapes static; everything vmaps over the env axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST

from ..core.math import quat_apply, quat_to_matrix
from ..core.model import GEOM_BOX, GEOM_PLANE, GEOM_SPHERE
from .scene import OWNER_BODY, OWNER_LINK, OWNER_STATIC, CompiledScene


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
    col_kind = scene.col_kind  # host ints
    col_owner_kind = jnp.asarray(scene.col_owner_kind)
    col_owner = jnp.asarray(scene.col_owner)
    col_pos = jnp.asarray(scene.col_pos, dtype=jnp.float32)
    col_quat = jnp.asarray(scene.col_quat, dtype=jnp.float32)
    col_size = jnp.asarray(scene.col_size, dtype=jnp.float32)
    col_friction = jnp.asarray(scene.col_friction, dtype=jnp.float32)
    pair_mask_T = jnp.asarray(scene.pair_mask.T)  # (C, P)
    K = max_contacts

    is_box = jnp.asarray((col_kind == GEOM_BOX)[:, None])  # (C, 1)
    is_sphere = jnp.asarray((col_kind == GEOM_SPHERE)[:, None])

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
        from ..core.math import quat_mul

        lk = jnp.clip(col_owner, 0, fk_pos.shape[0] - 1)
        bk = jnp.clip(col_owner, 0, max(body_pos.shape[0] - 1, 0))
        p_link = fk_pos[lk] + quat_apply(fk_quat[lk], col_pos)
        q_link = quat_mul(fk_quat[lk], col_quat)
        if body_pos.shape[0] > 0:
            p_body = body_pos[bk] + quat_apply(body_quat[bk], col_pos)
            q_body = quat_mul(body_quat[bk], col_quat)
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
        Rc = quat_to_matrix(cq)  # (C, 3, 3)

        # SoA: point coordinates in every collider frame, planes of (C, P)
        pwT = pw.T  # (3, P)
        # local = Rc^T (pw - cp):  l[c, i, :] = sum_j Rc[c, j, i] * (pwT[j] - cp[c, j])
        rel = pwT[None, :, :] - cp[:, :, None]  # (C, 3, P)
        lx = (Rc[:, 0, 0, None] * rel[:, 0] + Rc[:, 1, 0, None] * rel[:, 1]
              + Rc[:, 2, 0, None] * rel[:, 2])  # (C, P)
        ly = (Rc[:, 0, 1, None] * rel[:, 0] + Rc[:, 1, 1, None] * rel[:, 1]
              + Rc[:, 2, 1, None] * rel[:, 2])
        lz = (Rc[:, 0, 2, None] * rel[:, 0] + Rc[:, 1, 2, None] * rel[:, 1]
              + Rc[:, 2, 2, None] * rel[:, 2])

        hx = col_size[:, 0, None]
        hy = col_size[:, 1, None]
        hz = col_size[:, 2, None]

        # box SDF + normal (branch-free, SoA planes)
        qx, qy, qz = jnp.abs(lx) - hx, jnp.abs(ly) - hy, jnp.abs(lz) - hz
        qxp, qyp, qzp = jnp.maximum(qx, 0.0), jnp.maximum(qy, 0.0), jnp.maximum(qz, 0.0)
        outside = jnp.sqrt(qxp * qxp + qyp * qyp + qzp * qzp)
        max_in = jnp.maximum(qx, jnp.maximum(qy, qz))
        sdf_box = outside + jnp.minimum(max_in, 0.0)
        sx = jnp.where(lx >= 0, 1.0, -1.0)
        sy = jnp.where(ly >= 0, 1.0, -1.0)
        sz = jnp.where(lz >= 0, 1.0, -1.0)
        inv_out = 1.0 / jnp.maximum(outside, 1e-9)
        # outside normal
        nbx_o, nby_o, nbz_o = qxp * sx * inv_out, qyp * sy * inv_out, qzp * sz * inv_out
        # inside normal: face of max penetration
        in_x = (qx >= qy) & (qx >= qz)
        in_y = (~in_x) & (qy >= qz)
        in_z = ~(in_x | in_y)
        use_out = outside > 1e-9
        nbx = jnp.where(use_out, nbx_o, jnp.where(in_x, sx, 0.0))
        nby = jnp.where(use_out, nby_o, jnp.where(in_y, sy, 0.0))
        nbz = jnp.where(use_out, nbz_o, jnp.where(in_z, sz, 0.0))

        # sphere SDF
        r_loc = jnp.sqrt(lx * lx + ly * ly + lz * lz)
        sdf_sph = r_loc - hx
        inv_r = 1.0 / jnp.maximum(r_loc, 1e-9)
        nsx, nsy, nsz = lx * inv_r, ly * inv_r, lz * inv_r

        # plane z=0
        sdf_pln = lz

        sdf = jnp.where(is_box, sdf_box, jnp.where(is_sphere, sdf_sph, sdf_pln))
        nx = jnp.where(is_box, nbx, jnp.where(is_sphere, nsx, 0.0))
        ny = jnp.where(is_box, nby, jnp.where(is_sphere, nsy, 0.0))
        nz = jnp.where(is_box, nbz, jnp.where(is_sphere, nsz, 1.0))

        depth = pt_radius[None, :] - sdf  # (C, P)
        depth = jnp.where(pair_mask_T, depth, -1e9)

        # per-point best-2 colliders (reduce over the C axis), then top-K over
        # 2P candidates — no full sort of the P*C grid. A point in deep
        # simultaneous contact with 3+ colliders drops its 3rd contact.
        c1 = jnp.argmax(depth, axis=0)  # (P,)
        d1 = jnp.max(depth, axis=0)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, depth.shape, 0)
        depth2 = jnp.where(row_iota == c1[None, :], -1e9, depth)
        c2 = jnp.argmax(depth2, axis=0)
        d2 = jnp.max(depth2, axis=0)
        cand_depth = jnp.concatenate([d1, d2])  # (2P,)
        cand_col = jnp.concatenate([c1, c2])
        top_depth, top_i = jax.lax.top_k(cand_depth, K)
        pidx = top_i % P
        cidx = cand_col[top_i]

        # gather normals (local) for the K winners, rotate to world
        n_local = jnp.stack(
            [nx[cidx, pidx], ny[cidx, pidx], nz[cidx, pidx]], axis=-1
        )  # (K, 3)
        n_world = jnp.einsum("kij,kj->ki", Rc[cidx], n_local, precision=HI)
        pos = pw[pidx] - n_world * (
            pt_radius[pidx] + jnp.maximum(top_depth, 0.0) * 0.5
        )[:, None]
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


def _tangent_basis(n):
    """Two unit tangents orthogonal to n: (..., 3) -> ((..., 3), (..., 3))."""
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
    scale = jnp.maximum(mu * tn + ln, 0.0) / (mu**2 + 1.0)
    ln_p = scale
    lt_dir = lt / jnp.maximum(tn, 1e-9)[..., None]
    lt_p = (mu * scale)[..., None] * lt_dir
    ln_out = jnp.where(inside, ln, jnp.where(below, 0.0, ln_p))
    lt_out = jnp.where(inside[..., None], lt, jnp.where(below[..., None], 0.0, lt_p))
    return jnp.concatenate([ln_out[..., None], lt_out], axis=-1)


class SolveResult(NamedTuple):
    impulses: jnp.ndarray  # (K, 3) contact impulses in (n, t1, t2) basis
    force_world: jnp.ndarray  # (K, 3) impulse vector in world coords
    dqd: jnp.ndarray  # (D,) robot velocity change
    dbody_v: jnp.ndarray  # (B, 3)
    dbody_w: jnp.ndarray  # (B, 3)


def solve_contact_qp(
    contacts: ContactSet,
    J_planes,  # (Jx, Jy, Jz): (D, K) SoA robot point-jacobian planes
    body_idx_pt: jnp.ndarray,  # (K,) body index of point owner or -1
    body_idx_col: jnp.ndarray,  # (K,) body index of collider owner or -1
    r_pt: jnp.ndarray,  # (K, 3) contact pos - body com (point side)
    r_col: jnp.ndarray,  # (K, 3) collider side
    v_rel: jnp.ndarray,  # (K, 3) world relative velocity (point - collider)
    inv_M,  # (D, D) inverse of the (implicitly damped) robot mass matrix
    inv_mass_b: jnp.ndarray,  # (B,)
    inv_inertia_w: jnp.ndarray,  # (B, 3, 3) world-frame inverse inertia
    *,
    dt: float,
    baumgarte: float,
    compliance: float,
    iterations: int,
    max_depenetration_vel: float = 0.5,
    use_pallas: bool = False,
):
    """Solve the contact impulse QP (see module docstring). Per-env.

    Flattened contact index is BASIS-MAJOR: row b*K + k (b in {n, t1, t2}).
    This keeps every (3, K)-shaped plane reshaping to (3K,) without
    transposes through padded minor dims."""
    K = contacts.depth.shape[0]
    B = inv_mass_b.shape[0]
    Jx, Jy, Jz = J_planes
    D = Jx.shape[0]
    n = contacts.normal
    t1, t2 = _tangent_basis(n)
    basis = jnp.stack([n, t1, t2], axis=1)  # (K, 3basis, 3world)
    # Bm[w, b, k] = basis[k, b, w] — world-component planes
    Bm = jnp.transpose(basis, (2, 1, 0))  # (3w, 3b, K)

    # robot jacobian in contact frame, transposed layout: (D, 3K) basis-major
    # JrT[d, b*K+k] = sum_w basis[k,b,w] * Jw[d,k]
    JrT = (
        Bm[0].reshape(1, 3, K) * Jx[:, None, :]
        + Bm[1].reshape(1, 3, K) * Jy[:, None, :]
        + Bm[2].reshape(1, 3, K) * Jz[:, None, :]
    ).reshape(D, 3 * K)
    WrT = jnp.dot(inv_M, JrT, precision=HI)  # (D, 3K)
    A = jnp.dot(JrT.T, WrT, precision=HI)  # (3K, 3K)

    if B > 0:
        onehot_pt = jax.nn.one_hot(body_idx_pt, B, dtype=n.dtype)  # (K, B)
        onehot_col = jax.nn.one_hot(body_idx_col, B, dtype=n.dtype)
        # signed involvement: a contact pushes its point-side body and pulls
        # its collider-side body — one pass instead of a (pt,col)^2 loop
        sigma = onehot_pt - onehot_col  # (K, B)
        B_f = Bm.reshape(3, 3 * K)  # (3w, 3K)
        bb = jnp.dot(B_f.T, B_f, precision=HI)  # (3K, 3K)
        T = jnp.dot(sigma * inv_mass_b[None, :], sigma.T, precision=HI)  # (K, K)
        A = A + bb * jnp.tile(T, (3, 3))
        # rotational: per-body signed arm jacobians H_b = oh_pt*rxb_pt - oh_col*rxb_col
        rxb_pt = jnp.cross(r_pt[:, None, :], basis)  # (K, 3b, 3w)
        rxb_col = jnp.cross(r_col[:, None, :], basis)
        Rm_pt = jnp.transpose(rxb_pt, (2, 1, 0)).reshape(1, 3, 3 * K)  # (1, 3w, 3K)
        Rm_col = jnp.transpose(rxb_col, (2, 1, 0)).reshape(1, 3, 3 * K)
        oh_pt_cols = jnp.tile(onehot_pt.T, (1, 3)).reshape(B, 1, 3 * K)
        oh_col_cols = jnp.tile(onehot_col.T, (1, 3)).reshape(B, 1, 3 * K)
        H = oh_pt_cols * Rm_pt - oh_col_cols * Rm_col  # (B, 3w, 3K)
        A = A + jnp.einsum("bxm,bxy,byn->mn", H, inv_inertia_w, H, precision=HI)

    act = contacts.active
    b3 = jnp.einsum("wbk,kw->bk", Bm, v_rel, precision=HI)  # (3b, K)
    bias = jnp.minimum(
        baumgarte / dt * jnp.maximum(contacts.depth, 0.0), max_depenetration_vel
    )
    b = b3.at[0].add(-bias).reshape(3 * K)

    reg = compliance
    act_cols = jnp.tile(act, 3)
    row_sum = jnp.sum(jnp.abs(A) * act_cols[None, :], axis=1)
    row_sum = jnp.max(row_sum.reshape(3, K), axis=0)  # (K,)
    alpha = 1.0 / (jnp.maximum(row_sum, 1e-6) + reg)
    mu = jnp.where(act, contacts.friction, 0.0)

    from .kernels.qp import qp_iterations

    lam = qp_iterations(
        A, b, alpha, mu, act,
        iterations=iterations, reg=reg, use_pallas=use_pallas,
    )
    lam3 = lam.reshape(3, K)  # basis-major
    lam_k = lam3.T  # (K, 3)
    f_world = jnp.einsum("wbk,bk->kw", Bm, lam3, precision=HI)  # (K, 3)

    dqd = jnp.dot(WrT, lam, precision=HI)  # (D,)
    if B > 0:
        dbody_v = jnp.einsum("kb,kw->bw", onehot_pt * inv_mass_b[None, :], f_world) - \
                  jnp.einsum("kb,kw->bw", onehot_col * inv_mass_b[None, :], f_world)
        tq_pt = jnp.cross(r_pt, f_world)
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
