"""Batched contact pipeline: SDF narrowphase + friction-cone impulse QP.

TPU-native replacement for the PhysX TGS contact solver the reference runs
(16 position iterations, 8M-pair GPU buffer — sim config at
`utils/config.py:198-204`, `cfg/allegro_hand_block_assembly_grasp_sim.yaml`).

Design:
* Narrowphase = dense (colliders x points) signed-distance evaluation with a
  static pair mask, then per-point best-2 collider selection and a static
  top-K. Fixed shapes end-to-end — the TPU analog of PhysX's capped
  contact-pair buffer. Normals/positions are RE-derived per selected contact
  (K-sized math from gathered tiny tables), never gathered out of (C, P)
  planes — 2D plane gathers measured ~9 ms/substep at 2048 envs.
* Solver = velocity-level convex QP over contact impulses with isotropic
  Coulomb cones (the "contact QP" of the build spec):
      min_l  1/2 l^T (A + R) l + l^T b     s.t.  l in cone(mu)
  solved by row-sum-preconditioned projected-Jacobi iterations — fully
  parallel over contacts, MXU-friendly (A is a dense 3K x 3K Delassus).

Layout notes (the hot-path discipline): TPU tiles the two minor dims to
(8, 128) fp32, so NOTHING in the hot path carries a trailing length-3 axis
(it pads 3 -> 128 lanes, >40x HBM traffic): world vectors live as SoA
component planes ((K,) each), the (C, P) grids keep the big point axis last,
and the solver works on (3K,)-flat basis-major vectors / (3K, D) matrices.
The body-coupling Delassus terms are assembled as same-body-masked OUTER
PRODUCTS of (3K,) vectors instead of (., B, .) one-hot contractions — the
Search scene has B = 132 free bodies and any B-sized einsum there is a
100x-padded matmul.

All shapes static; everything vmaps over the env axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

HI = jax.lax.Precision.HIGHEST

from ..core.math import quat_apply, quat_mul, quat_to_matrix
from ..core.model import GEOM_BOX, GEOM_PLANE, GEOM_SPHERE
from .scene import OWNER_BODY, OWNER_LINK, OWNER_STATIC, CompiledScene


class GeomTables(NamedTuple):
    """Per-env runtime geometry overrides (multi-type target bricks).

    The reference builds ALL 8 lego types into every env and targets
    `segmentation_id = i % 8` (`..._grasp_sim.py:706-745,959-965`); the
    TPU-native equivalent keeps ONE compiled target-brick slot whose collider
    sizes/positions, contact-point offsets, and mass properties are runtime
    per-env state gathered from an (8, ...) type table at reset — one
    program trains all 8 types simultaneously with no extra narrowphase
    cost. Tables are FULL (C/P/B-sized); non-target rows just repeat the
    static values.
    """

    col_size: jnp.ndarray  # (C, 3)
    col_pos: jnp.ndarray  # (C, 3) in owner frame
    pt_offset: jnp.ndarray  # (P, 3) in owner frame
    inv_mass: jnp.ndarray  # (B,)
    inertia: jnp.ndarray  # (B, 3, 3)
    inv_inertia: jnp.ndarray  # (B, 3, 3)
    com: jnp.ndarray  # (B, 3)


class ContactSet(NamedTuple):
    """K selected contacts (per env). World vectors are SoA planes."""

    depth: jnp.ndarray  # (K,) penetration depth (>0 active)
    active: jnp.ndarray  # (K,) bool
    nx: jnp.ndarray  # (K,) world normal components (pushes point out)
    ny: jnp.ndarray
    nz: jnp.ndarray
    px: jnp.ndarray  # (K,) world contact position components
    py: jnp.ndarray
    pz: jnp.ndarray
    friction: jnp.ndarray  # (K,)
    pt_idx: jnp.ndarray  # (K,) int index into point table
    col_idx: jnp.ndarray  # (K,) int index into collider table
    # static per-point / per-collider data compacted to the K winners so the
    # solver never gathers again:
    anc_pt: jnp.ndarray  # (K, D) dof ancestor mask of the point's link (0 rows for body/static owners)
    anc_col: jnp.ndarray  # (K, D) same for the collider's link
    body_pt: jnp.ndarray  # (K,) body index of point owner or -1
    body_col: jnp.ndarray  # (K,) body index of collider owner or -1
    link_pt: jnp.ndarray  # (K,) link index of point owner or -1
    link_col: jnp.ndarray  # (K,) link index of collider owner or -1

    @property
    def normal(self):  # AoS view for non-hot-path consumers/tests
        return jnp.stack([self.nx, self.ny, self.nz], axis=-1)

    @property
    def pos(self):
        return jnp.stack([self.px, self.py, self.pz], axis=-1)


def _best2_reduce(depth):
    """Top-2 (value, index) over axis 0 of a (C, P) grid in ONE pass.

    A 4-operand `lax.reduce` with an associative top-2-merge monoid; XLA
    fuses the depth producer into the reduce body so the grid is never
    materialized and is read exactly once (vs 4 passes for max/argmax x2).
    Returns (d1, c1, d2, c2), each (P,).
    """
    C = depth.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, depth.shape, 0)
    neg = jnp.full_like(depth, -1e9)
    zero = jnp.zeros_like(iota)

    def merge(a, b):
        d1a, i1a, d2a, i2a = a
        d1b, i1b, d2b, i2b = b
        a_first = d1a >= d1b
        d1 = jnp.where(a_first, d1a, d1b)
        i1 = jnp.where(a_first, i1a, i1b)
        # runner-up of the union = max(loser's best, winner's second)
        lo = jnp.where(a_first, d1b, d1a)
        li = jnp.where(a_first, i1b, i1a)
        ws = jnp.where(a_first, d2a, d2b)
        wi = jnp.where(a_first, i2a, i2b)
        take_lo = lo >= ws
        d2 = jnp.where(take_lo, lo, ws)
        i2 = jnp.where(take_lo, li, wi)
        return d1, i1, d2, i2

    init = (jnp.float32(-1e9), jnp.int32(0), jnp.float32(-1e9), jnp.int32(0))
    return jax.lax.reduce((depth, iota, neg, zero), init, merge, (0,))


def make_narrowphase(scene: CompiledScene, max_contacts: int,
                     neighbor_list=None, nl_candidates: int = 64,
                     nl_group_size: int = 64):
    """Contact generation closure.

    Two selection strategies over the (points x colliders) SDF product:
    * dense — evaluate every legal pair (small scenes; exact).
    * neighbor-list — points are grouped by owner (brick / robot link) into a
      static (G, S) grid; per group the M nearest colliders are selected each
      substep by center distance minus collider circumradius (a LOWER bound
      on the true gap, so no contact-capable collider is ever culled while
      M >= the number of colliders within reach), and the SDF is evaluated
      only on (G, M, S). The 132-brick Search heap evaluates 5723 x 508 =
      2.9M pairs dense (~19 ms/substep of a 33 ms substep at 128 envs on
      v5e); the grid path evaluates ~0.5M.
      `neighbor_list=None` auto-enables when P*C is heap-scale.
    """
    P, C = scene.npoints, scene.ncolliders
    art = scene.art
    D = art.ndof
    pt_owner_kind = np.asarray(scene.pt_owner_kind)
    pt_owner = np.asarray(scene.pt_owner)
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
    # the dense selection draws from best-2-per-point candidates, so 2P is
    # the largest meaningful budget — clamp so oversized configs (probe
    # runs, generous scene defaults) stay valid
    K = min(max_contacts, 2 * P)
    B = scene.nbodies

    is_box = jnp.asarray((col_kind == GEOM_BOX)[:, None])  # (C, 1)
    is_sphere = jnp.asarray((col_kind == GEOM_SPHERE)[:, None])
    # per-collider kind flags as (C,) float rows for the per-contact stage
    is_box_c = jnp.asarray((col_kind == GEOM_BOX).astype(np.float32))
    is_sphere_c = jnp.asarray((col_kind == GEOM_SPHERE).astype(np.float32))

    # ---- static per-point solver tables (compacted to winners by 1D row
    # gathers — point identity is static, so everything downstream of pt_idx
    # is a constant table) ----
    anc_np = np.asarray(art.ancestor_mask, dtype=np.float32)  # (L, D)
    pt_is_link = pt_owner_kind == OWNER_LINK
    anc_byP = np.where(
        pt_is_link[:, None], anc_np[np.clip(pt_owner, 0, art.nlinks - 1)], 0.0
    )  # (P, D)
    body_inv_mass = np.asarray(scene.body_inv_mass)
    body_of_pt_byP = np.where(pt_owner_kind == OWNER_BODY, pt_owner, -1)
    if B > 0:
        kinematic_or_inf = (
            np.asarray(scene.body_kinematic)
            | (body_inv_mass == 0.0)
        )
        body_of_pt_byP = np.where(
            (body_of_pt_byP >= 0)
            & kinematic_or_inf[np.clip(body_of_pt_byP, 0, B - 1)],
            -1,
            body_of_pt_byP,
        )
    anc_byP = jnp.asarray(anc_byP)
    body_of_pt_byP = jnp.asarray(body_of_pt_byP.astype(np.int32))
    link_of_pt_byP = jnp.asarray(
        np.where(pt_is_link, pt_owner, -1).astype(np.int32))

    # static per-collider solver tables
    col_owner_np = np.asarray(scene.col_owner)
    col_kind_np = np.asarray(scene.col_owner_kind)
    anc_byC = np.where(
        (col_kind_np == OWNER_LINK)[:, None],
        anc_np[np.clip(col_owner_np, 0, art.nlinks - 1)],
        0.0,
    )  # (C, D)
    body_of_col_byC = np.where(col_kind_np == OWNER_BODY, col_owner_np, -1)
    if B > 0:
        body_of_col_byC = np.where(
            (body_of_col_byC >= 0)
            & kinematic_or_inf[np.clip(body_of_col_byC, 0, B - 1)],
            -1,
            body_of_col_byC,
        )
    anc_byC = jnp.asarray(anc_byC)
    body_of_col_byC = jnp.asarray(body_of_col_byC.astype(np.int32))
    link_of_col_byC = jnp.asarray(
        np.where(col_kind_np == OWNER_LINK, col_owner_np, -1).astype(np.int32))

    pt_owner_j = jnp.asarray(pt_owner)
    pt_kind_j = jnp.asarray(pt_owner_kind)

    def point_world(fk_pos, fk_quat, body_pos, body_quat, geom=None):
        """World positions of all contact points. (P, 3)"""
        off = pt_offset if geom is None else geom.pt_offset
        lk = jnp.clip(pt_owner_j, 0, fk_pos.shape[0] - 1)
        bk = jnp.clip(pt_owner_j, 0, max(body_pos.shape[0] - 1, 0))
        p_link = fk_pos[lk] + quat_apply(fk_quat[lk], off)
        if body_pos.shape[0] > 0:
            p_body = body_pos[bk] + quat_apply(body_quat[bk], off)
        else:
            p_body = p_link
        return jnp.where((pt_kind_j == OWNER_LINK)[:, None], p_link, p_body)

    def collider_world(fk_pos, fk_quat, body_pos, body_quat, geom=None):
        """World pose of all colliders. ((C,3), (C,4))"""
        cpos = col_pos if geom is None else geom.col_pos
        lk = jnp.clip(col_owner, 0, fk_pos.shape[0] - 1)
        bk = jnp.clip(col_owner, 0, max(body_pos.shape[0] - 1, 0))
        p_link = fk_pos[lk] + quat_apply(fk_quat[lk], cpos)
        q_link = quat_mul(fk_quat[lk], col_quat)
        if body_pos.shape[0] > 0:
            p_body = body_pos[bk] + quat_apply(body_quat[bk], cpos)
            q_body = quat_mul(body_quat[bk], col_quat)
        else:
            p_body, q_body = p_link, q_link
        kind = col_owner_kind[:, None]
        p = jnp.where(kind == OWNER_STATIC, cpos,
                      jnp.where(kind == OWNER_LINK, p_link, p_body))
        q = jnp.where(kind == OWNER_STATIC, col_quat,
                      jnp.where(kind == OWNER_LINK, q_link, q_body))
        return p, q

    # entity index per point / collider for runtime collision-filter words:
    # 0 = robot links, 1..B = bodies, B+1 = statics
    _pt_entity = jnp.asarray(np.where(
        pt_owner_kind == OWNER_LINK, 0,
        np.where(pt_owner_kind == OWNER_BODY, pt_owner + 1, B + 1)
    ).astype(np.int32))
    _col_entity = jnp.asarray(np.where(
        np.asarray(scene.col_owner_kind) == OWNER_LINK, 0,
        np.where(np.asarray(scene.col_owner_kind) == OWNER_BODY,
                 np.asarray(scene.col_owner) + 1, B + 1)
    ).astype(np.int32))

    # combined per-point / per-collider STATIC gather tables: ONE row
    # gather per side instead of ~6 (each gather fusion measured ~0.8 ms
    # per substep at 2048 envs — the dominant narrowphase cost after the
    # factored solver). Integer ids are float-encoded (exact in fp32).
    _staticP = jnp.concatenate([
        pt_radius[:, None], pt_friction[:, None],
        body_of_pt_byP[:, None].astype(jnp.float32),
        link_of_pt_byP[:, None].astype(jnp.float32),
        anc_byP,
    ], axis=1)  # (P, 4 + D)
    _staticC = jnp.concatenate([
        col_friction[:, None], is_box_c[:, None], is_sphere_c[:, None],
        body_of_col_byC[:, None].astype(jnp.float32),
        link_of_col_byC[:, None].astype(jnp.float32),
        anc_byC,
    ], axis=1)  # (C, 5 + D)

    def _per_contact(top_depth, pidx, cidx, pw, cp, cq, csize) -> ContactSet:
        """K-sized per-winner stage: recompute normal/position from tiny
        gathered tables (shared by the dense and neighbor-list paths)."""
        # ONE gather per side (gather cost is ~latency-per-row, so the
        # runtime columns are concatenated with the static table first)
        gP = jnp.concatenate([pw, _staticP], axis=1)[pidx]  # (K, 7 + D)
        gC = jnp.concatenate([cp, cq, csize, _staticC], axis=1)[cidx]
        return _contact_math(top_depth, pidx, cidx, gP, gC,
                             recompute_depth=False)

    def _contact_math(top_depth, pidx, cidx, gP, gC,
                      recompute_depth) -> ContactSet:
        """Shared K-sized contact math. gP = (K, 7+D) point rows
        [pw(3), radius, mu, body, link, anc(D)]; gC = (K, 15+D) collider rows
        [cp(3), cq(4), size(3), mu, boxf, sphf, body, link, anc(D)].

        With `recompute_depth` the penetration depth is re-derived from the
        CURRENT poses (contact-reuse path: the pair list was selected at the
        start of the control step — PhysX parity, which generates contacts
        once per step and lets the TGS substeps reuse them); `top_depth` then
        only carries pair validity (selection-masked pairs stay -1e9)."""
        kx, ky, kz = gP[:, 0], gP[:, 1], gP[:, 2]
        r_k = gP[:, 3]
        mu_pt = gP[:, 4]
        body_pt_k = gP[:, 5].astype(jnp.int32)
        link_pt_k = gP[:, 6].astype(jnp.int32)
        anc_pt_k = gP[:, 7:]
        cp_k = gC[:, 0:3]
        cq_k = gC[:, 3:7]  # (K, 4) xyzw
        sz_k = gC[:, 7:10]
        mu_col = gC[:, 10]
        boxf = gC[:, 11]
        sphf = gC[:, 12]
        body_col_k = gC[:, 13].astype(jnp.int32)
        link_col_k = gC[:, 14].astype(jnp.int32)
        anc_col_k = gC[:, 15:]

        # rotation-matrix entries from the quaternion, componentwise
        qx_, qy_, qz_, qw_ = cq_k[:, 0], cq_k[:, 1], cq_k[:, 2], cq_k[:, 3]
        r00 = 1 - 2 * (qy_ * qy_ + qz_ * qz_)
        r01 = 2 * (qx_ * qy_ - qz_ * qw_)
        r02 = 2 * (qx_ * qz_ + qy_ * qw_)
        r10 = 2 * (qx_ * qy_ + qz_ * qw_)
        r11 = 1 - 2 * (qx_ * qx_ + qz_ * qz_)
        r12 = 2 * (qy_ * qz_ - qx_ * qw_)
        r20 = 2 * (qx_ * qz_ - qy_ * qw_)
        r21 = 2 * (qy_ * qz_ + qx_ * qw_)
        r22 = 1 - 2 * (qy_ * qy_ + qx_ * qx_)

        dxw = kx - cp_k[:, 0]
        dyw = ky - cp_k[:, 1]
        dzw = kz - cp_k[:, 2]
        # local coords: R^T d
        lxk = r00 * dxw + r10 * dyw + r20 * dzw
        lyk = r01 * dxw + r11 * dyw + r21 * dzw
        lzk = r02 * dxw + r12 * dyw + r22 * dzw

        # box normal (local)
        bqx = jnp.abs(lxk) - sz_k[:, 0]
        bqy = jnp.abs(lyk) - sz_k[:, 1]
        bqz = jnp.abs(lzk) - sz_k[:, 2]
        bqxp, bqyp, bqzp = (jnp.maximum(bqx, 0.0), jnp.maximum(bqy, 0.0),
                            jnp.maximum(bqz, 0.0))
        outside_k = jnp.sqrt(bqxp * bqxp + bqyp * bqyp + bqzp * bqzp)
        sx = jnp.where(lxk >= 0, 1.0, -1.0)
        sy = jnp.where(lyk >= 0, 1.0, -1.0)
        sz_ = jnp.where(lzk >= 0, 1.0, -1.0)
        inv_out = 1.0 / jnp.maximum(outside_k, 1e-9)
        in_x = (bqx >= bqy) & (bqx >= bqz)
        in_y = (~in_x) & (bqy >= bqz)
        in_z = ~(in_x | in_y)
        use_out = outside_k > 1e-9
        nbx = jnp.where(use_out, bqxp * sx * inv_out, jnp.where(in_x, sx, 0.0))
        nby = jnp.where(use_out, bqyp * sy * inv_out, jnp.where(in_y, sy, 0.0))
        nbz = jnp.where(use_out, bqzp * sz_ * inv_out, jnp.where(in_z, sz_, 0.0))
        # sphere normal (local)
        rl = jnp.sqrt(lxk * lxk + lyk * lyk + lzk * lzk)
        inv_rl = 1.0 / jnp.maximum(rl, 1e-9)
        nsx, nsy, nsz = lxk * inv_rl, lyk * inv_rl, lzk * inv_rl
        # plane normal (local) = +z
        nlx = boxf * nbx + sphf * nsx
        nly = boxf * nby + sphf * nsy
        nlz = boxf * nbz + sphf * nsz + (1.0 - boxf - sphf) * 1.0

        # world normal = R n_local
        nxw = r00 * nlx + r01 * nly + r02 * nlz
        nyw = r10 * nlx + r11 * nly + r12 * nlz
        nzw = r20 * nlx + r21 * nly + r22 * nlz

        if recompute_depth:
            # depth at the CURRENT pose for the stored (point, collider)
            # pair; selection legality (pair mask / filter words, encoded as
            # -1e9 selection depth) is carried over from the select pass
            sdf_box_k = outside_k + jnp.minimum(
                jnp.maximum(bqx, jnp.maximum(bqy, bqz)), 0.0)
            sdf_sph_k = rl - sz_k[:, 0]
            sdf_k = (boxf * sdf_box_k + sphf * sdf_sph_k
                     + (1.0 - boxf - sphf) * lzk)
            valid = top_depth > -1e8
            top_depth = jnp.where(valid, r_k - sdf_k, -1e9)

        off = r_k + jnp.maximum(top_depth, 0.0) * 0.5
        pxw = kx - nxw * off
        pyw = ky - nyw * off
        pzw = kz - nzw * off

        mu = 0.5 * (mu_pt + mu_col)
        return ContactSet(
            depth=top_depth,
            active=top_depth > 0.0,
            nx=nxw, ny=nyw, nz=nzw,
            px=pxw, py=pyw, pz=pzw,
            friction=mu,
            pt_idx=pidx,
            col_idx=cidx,
            anc_pt=anc_pt_k,
            anc_col=anc_col_k,
            body_pt=body_pt_k,
            body_col=body_col_k,
            link_pt=link_pt_k,
            link_col=link_col_k,
        )

    def _dense_select(fk_pos, fk_quat, body_pos, body_quat, geom=None,
                      collision_filter=None):
        csize = col_size if geom is None else geom.col_size
        pw = point_world(fk_pos, fk_quat, body_pos, body_quat, geom)  # (P, 3)
        cp, cq = collider_world(fk_pos, fk_quat, body_pos, body_quat, geom)

        # SoA: point coordinates in every collider frame, planes of (C, P).
        # The rotation entries come straight from the quaternion as (C,)
        # planes and the relative position is expanded per component — no
        # (C, 3, P) intermediate (materializing it costs 4.5 GB/substep at
        # Search scale: 128 envs x 508 x 3 x 5723 fp32, v5e trace r4)
        cqx, cqy, cqz, cqw = cq[:, 0], cq[:, 1], cq[:, 2], cq[:, 3]
        r00 = (1 - 2 * (cqy * cqy + cqz * cqz))[:, None]
        r01 = (2 * (cqx * cqy - cqz * cqw))[:, None]
        r02 = (2 * (cqx * cqz + cqy * cqw))[:, None]
        r10 = (2 * (cqx * cqy + cqz * cqw))[:, None]
        r11 = (1 - 2 * (cqx * cqx + cqz * cqz))[:, None]
        r12 = (2 * (cqy * cqz - cqx * cqw))[:, None]
        r20 = (2 * (cqx * cqz - cqy * cqw))[:, None]
        r21 = (2 * (cqy * cqz + cqx * cqw))[:, None]
        r22 = (1 - 2 * (cqy * cqy + cqx * cqx))[:, None]
        dx = pw[None, :, 0] - cp[:, 0, None]  # (C, P) via broadcast
        dy = pw[None, :, 1] - cp[:, 1, None]
        dz = pw[None, :, 2] - cp[:, 2, None]
        lx = r00 * dx + r10 * dy + r20 * dz
        ly = r01 * dx + r11 * dy + r21 * dz
        lz = r02 * dx + r12 * dy + r22 * dz

        hx = csize[:, 0, None]
        hy = csize[:, 1, None]
        hz = csize[:, 2, None]

        # box SDF (branch-free, SoA planes — selection only, no normals)
        qx, qy, qz = jnp.abs(lx) - hx, jnp.abs(ly) - hy, jnp.abs(lz) - hz
        qxp, qyp, qzp = jnp.maximum(qx, 0.0), jnp.maximum(qy, 0.0), jnp.maximum(qz, 0.0)
        outside = jnp.sqrt(qxp * qxp + qyp * qyp + qzp * qzp)
        max_in = jnp.maximum(qx, jnp.maximum(qy, qz))
        sdf_box = outside + jnp.minimum(max_in, 0.0)
        # sphere SDF
        r_loc = jnp.sqrt(lx * lx + ly * ly + lz * lz)
        sdf_sph = r_loc - hx
        # plane z=0
        sdf = jnp.where(is_box, sdf_box, jnp.where(is_sphere, sdf_sph, lz))

        depth = pt_radius[None, :] - sdf  # (C, P)
        depth = jnp.where(pair_mask_T, depth, -1e9)
        if collision_filter is not None:
            # PhysX-style filter words: pair collides iff words AND to zero
            wp = collision_filter[_pt_entity]  # (P,)
            wc = collision_filter[_col_entity]  # (C,)
            gate = (wc[:, None] & wp[None, :]) == 0  # (C, P)
            depth = jnp.where(gate, depth, -1e9)

        # per-point best-2 colliders in ONE variadic reduce over the C axis
        # (the max/argmax x2 formulation ran 4 read-passes over the (C, P)
        # grid — 11.9 ms/substep at Search scale), then top-K over 2P
        # candidates. A point in deep simultaneous contact with 3+ colliders
        # drops its 3rd contact.
        d1, c1, d2, c2 = _best2_reduce(depth)
        cand_depth = jnp.concatenate([d1, d2])  # (2P,)
        cand_col = jnp.concatenate([c1, c2])
        top_depth, top_i = jax.lax.top_k(cand_depth, K)
        pidx = top_i % P
        cidx = cand_col[top_i]
        return top_depth, pidx, cidx, pw, cp, cq, csize

    def narrowphase(fk_pos, fk_quat, body_pos, body_quat, geom=None,
                    collision_filter=None) -> ContactSet:
        top_depth, pidx, cidx, pw, cp, cq, csize = _dense_select(
            fk_pos, fk_quat, body_pos, body_quat, geom, collision_filter)
        return _per_contact(top_depth, pidx, cidx, pw, cp, cq, csize)

    def select(fk_pos, fk_quat, body_pos, body_quat, geom=None,
               collision_filter=None):
        """Pair selection only: (sel_depth, pt_idx, col_idx), each (K,).

        `sel_depth` encodes legality (-1e9 for masked/padding winners); the
        per-substep `refresh` recomputes real depths for the stored pairs."""
        top_depth, pidx, cidx, *_ = _dense_select(
            fk_pos, fk_quat, body_pos, body_quat, geom, collision_filter)
        return top_depth, pidx, cidx

    def refresh(fk_pos, fk_quat, body_pos, body_quat, geom, sel) -> ContactSet:
        """K-sized contact regeneration for a stored pair list `sel` =
        (sel_depth, pt_idx, col_idx) at the CURRENT poses.

        The TPU analog of PhysX persistent contact pairs: `gym.simulate`
        generates contacts once per control step and the TGS substeps reuse
        them (`utils/config.py:188` dt / sim.substeps semantics); here the
        select pass runs once in `Simulator.step` and each substep only pays
        O(K) math instead of the O(P*C) grid."""
        sel_depth, pidx, cidx = sel
        off_tbl = pt_offset if geom is None else geom.pt_offset
        off_k = off_tbl[pidx]  # (K, 3)
        ok_k = pt_owner_j[pidx]
        kind_k = pt_kind_j[pidx]
        lk = jnp.clip(ok_k, 0, fk_pos.shape[0] - 1)
        bk = jnp.clip(ok_k, 0, max(body_pos.shape[0] - 1, 0))
        p_link = fk_pos[lk] + quat_apply(fk_quat[lk], off_k)
        if body_pos.shape[0] > 0:
            p_body = body_pos[bk] + quat_apply(body_quat[bk], off_k)
        else:
            p_body = p_link
        pw_k = jnp.where((kind_k == OWNER_LINK)[:, None], p_link, p_body)

        cpos_tbl = col_pos if geom is None else geom.col_pos
        csize_tbl = col_size if geom is None else geom.col_size
        cpos_k = cpos_tbl[cidx]
        cquat_k = col_quat[cidx]
        csize_k = csize_tbl[cidx]
        cok = jnp.clip(col_owner[cidx], 0, fk_pos.shape[0] - 1)
        cbk = jnp.clip(col_owner[cidx], 0, max(body_pos.shape[0] - 1, 0))
        ckind = col_owner_kind[cidx][:, None]
        cp_link = fk_pos[cok] + quat_apply(fk_quat[cok], cpos_k)
        cq_link = quat_mul(fk_quat[cok], cquat_k)
        if body_pos.shape[0] > 0:
            cp_body = body_pos[cbk] + quat_apply(body_quat[cbk], cpos_k)
            cq_body = quat_mul(body_quat[cbk], cquat_k)
        else:
            cp_body, cq_body = cp_link, cq_link
        cp_k = jnp.where(ckind == OWNER_STATIC, cpos_k,
                         jnp.where(ckind == OWNER_LINK, cp_link, cp_body))
        cq_k = jnp.where(ckind == OWNER_STATIC, cquat_k,
                         jnp.where(ckind == OWNER_LINK, cq_link, cq_body))

        gP = jnp.concatenate([pw_k, _staticP[pidx]], axis=1)
        gC = jnp.concatenate([cp_k, cq_k, csize_k, _staticC[cidx]], axis=1)
        return _contact_math(sel_depth, pidx, cidx, gP, gC,
                             recompute_depth=True)

    narrowphase.select = select
    narrowphase.refresh = refresh

    # ------------------------------------------------------------------
    # neighbor-list path: static (G, S) point grid + per-group top-M
    # candidate colliders by center distance (see factory docstring)
    # ------------------------------------------------------------------
    # measured on v5e (128-env Search heap): the grid path's per-candidate
    # row gathers cost ~10 ns/row — (G x M) candidate-data + winner-id
    # gathers total ~30 ms/substep, losing to the fused dense pass (the
    # single-read variadic best-2 above). Auto therefore stays DENSE at any
    # scale; the grid path remains available for scenes so large the dense
    # O(P*C) pass itself dominates its gather bill (P*C >> 10M)
    auto_nl = False
    use_nl = auto_nl if neighbor_list is None else bool(neighbor_list)
    if not use_nl:
        return narrowphase, point_world

    M = min(nl_candidates, C)
    # --- host-side grid build ---
    pt_kind_np = np.asarray(scene.pt_owner_kind)
    pt_owner_np = np.asarray(scene.pt_owner)
    pt_off_np = np.asarray(scene.pt_offset, dtype=np.float64)
    pt_rad_np = np.asarray(scene.pt_radius, dtype=np.float64)
    chunks = []  # (kind, owner, np point-index array)
    seen = {}
    for p in range(P):
        key = (int(pt_kind_np[p]), int(pt_owner_np[p]))
        seen.setdefault(key, []).append(p)
    for key, idxs in seen.items():
        n = len(idxs)
        k = max(1, -(-n // nl_group_size))  # ceil
        size = -(-n // k)
        for i in range(0, n, size):
            chunks.append((key[0], key[1], np.asarray(idxs[i:i + size])))
    G = len(chunks)
    S = max(len(c[2]) for c in chunks)
    grid_idx_np = np.zeros((G, S), dtype=np.int32)
    grid_valid_np = np.zeros((G, S), dtype=bool)
    grp_kind_np = np.zeros(G, dtype=np.int32)
    grp_owner_np = np.zeros(G, dtype=np.int32)
    grp_centroid_np = np.zeros((G, 3))
    grp_radius_np = np.zeros(G)
    gc_mask_np = np.zeros((G, C), dtype=bool)
    pm_np = np.asarray(scene.pair_mask)
    for gi, (kind, owner, idxs) in enumerate(chunks):
        n = len(idxs)
        grid_idx_np[gi, :n] = idxs
        grid_valid_np[gi, :n] = True
        grp_kind_np[gi] = kind
        grp_owner_np[gi] = owner
        cen = pt_off_np[idxs].mean(axis=0)
        grp_centroid_np[gi] = cen
        grp_radius_np[gi] = float(
            np.max(np.linalg.norm(pt_off_np[idxs] - cen, axis=1)
                   + pt_rad_np[idxs]))
        gc_mask_np[gi] = pm_np[idxs].any(axis=0)
    grid_idx = jnp.asarray(grid_idx_np)
    grid_valid = jnp.asarray(grid_valid_np)
    grp_owner_link = jnp.asarray(
        np.clip(grp_owner_np, 0, art.nlinks - 1).astype(np.int32))
    grp_owner_body = jnp.asarray(
        np.clip(grp_owner_np, 0, max(B - 1, 0)).astype(np.int32))
    grp_is_link = jnp.asarray(grp_kind_np == OWNER_LINK)
    grp_centroid = jnp.asarray(grp_centroid_np, dtype=jnp.float32)
    gc_mask = jnp.asarray(gc_mask_np)
    grp_entity_np = np.where(grp_kind_np == OWNER_LINK, 0,
                             np.where(grp_kind_np == OWNER_BODY,
                                      grp_owner_np + 1, B + 1))
    grp_entity = jnp.asarray(grp_entity_np.astype(np.int32))
    # identity planes in grid order (pair-legality re-derivation; see
    # native.build_pair_mask: ~(same_entry | same_owner | same_group))
    pt_entry_np = np.asarray(scene.pt_entry)
    pt_gid_np = np.asarray(scene.pt_group_id)
    g_pentry = jnp.asarray(pt_entry_np[grid_idx_np].astype(np.float32))
    g_pgid = jnp.asarray(pt_gid_np[grid_idx_np].astype(np.float32))
    g_pkind = jnp.asarray(pt_kind_np[grid_idx_np].astype(np.float32))
    g_powner = jnp.asarray(pt_owner_np[grid_idx_np].astype(np.float32))
    g_prad = jnp.asarray(pt_rad_np[grid_idx_np].astype(np.float32))
    col_entry_f = jnp.asarray(np.asarray(scene.col_entry).astype(np.float32))
    col_gid_f = jnp.asarray(np.asarray(scene.col_group_id).astype(np.float32))
    col_okind_f = jnp.asarray(col_kind_np.astype(np.float32))  # owner kind
    col_ownerf = jnp.asarray(col_owner_np.astype(np.float32))
    is_plane_c = jnp.asarray((np.asarray(scene.col_kind) == GEOM_PLANE))
    flat_pt = jnp.asarray(grid_idx_np.reshape(-1))

    def _nl_select(fk_pos, fk_quat, body_pos, body_quat, geom=None,
                   collision_filter=None):
        csize = col_size if geom is None else geom.col_size
        pw = point_world(fk_pos, fk_quat, body_pos, body_quat, geom)  # (P, 3)
        cp, cq = collider_world(fk_pos, fk_quat, body_pos, body_quat, geom)

        # ---- candidate selection: per-group nearest-M colliders ----
        gl = fk_pos[grp_owner_link] + quat_apply(
            fk_quat[grp_owner_link], grp_centroid)
        if body_pos.shape[0] > 0:
            gb = body_pos[grp_owner_body] + quat_apply(
                body_quat[grp_owner_body], grp_centroid)
        else:
            gb = gl
        gcen = jnp.where(grp_is_link[:, None], gl, gb)  # (G, 3)
        # collider circumradius from the RUNTIME size (geom overrides)
        r_c = jnp.where(
            is_plane_c, 1e9,
            jnp.sqrt(jnp.sum(csize * csize, axis=1)))  # (C,) sphere: r*sqrt3 bound
        d2 = (jnp.square(gcen[:, 0:1] - cp[None, :, 0])
              + jnp.square(gcen[:, 1:2] - cp[None, :, 1])
              + jnp.square(gcen[:, 2:3] - cp[None, :, 2]))  # (G, C)
        score = jnp.sqrt(d2) - r_c[None, :]  # lower bound on surface gap
        score = jnp.where(gc_mask, score, 1e9)
        if collision_filter is not None:
            wg = collision_filter[grp_entity]  # (G,)
            wc = collision_filter[_col_entity]  # (C,)
            score = jnp.where((wg[:, None] & wc[None, :]) == 0, score, 1e9)
        neg, cand = jax.lax.top_k(-score, M)  # (G, M)
        cand_ok = neg > -1e8

        # ---- gather candidate collider rows: pose + size + identity ----
        tbl = jnp.concatenate([
            cp, cq, csize,
            col_entry_f[:, None], col_okind_f[:, None],
            col_ownerf[:, None], col_gid_f[:, None],
            is_box_c[:, None], is_sphere_c[:, None],
        ], axis=1)  # (C, 16)
        # one-hot MXU gather instead of (G*M) dynamic row gathers (measured
        # ~10 ns/row on v5e -> ~30 ms/substep at Search scale, r4). The
        # one-hot is exact in any dtype and HIGHEST-precision bf16x6
        # reconstructs x*1.0 exactly, so this is a bit-exact gather that
        # rides the systolic array
        oh = (cand.reshape(-1)[:, None]
              == jnp.arange(C, dtype=cand.dtype)[None, :]).astype(jnp.float32)
        gcand = jax.lax.dot_general(
            oh, tbl, (((1,), (0,)), ((), ())), precision=HI,
        ).reshape(G, M, tbl.shape[1])  # (G, M, 16)
        ccx, ccy, ccz = gcand[..., 0], gcand[..., 1], gcand[..., 2]
        cqx, cqy, cqz, cqw = (gcand[..., 3], gcand[..., 4], gcand[..., 5],
                              gcand[..., 6])
        chx, chy, chz = gcand[..., 7], gcand[..., 8], gcand[..., 9]
        centry = gcand[..., 10]
        ckind = gcand[..., 11]
        cowner = gcand[..., 12]
        cgid = gcand[..., 13]
        cbox = gcand[..., 14]
        csph = gcand[..., 15]

        # rotation planes (G, M)
        r00 = 1 - 2 * (cqy * cqy + cqz * cqz)
        r01 = 2 * (cqx * cqy - cqz * cqw)
        r02 = 2 * (cqx * cqz + cqy * cqw)
        r10 = 2 * (cqx * cqy + cqz * cqw)
        r11 = 1 - 2 * (cqx * cqx + cqz * cqz)
        r12 = 2 * (cqy * cqz - cqx * cqw)
        r20 = 2 * (cqx * cqz - cqy * cqw)
        r21 = 2 * (cqy * cqz + cqx * cqw)
        r22 = 1 - 2 * (cqy * cqy + cqx * cqx)

        # point grid planes (G, S)
        pwx = pw[:, 0][grid_idx]
        pwy = pw[:, 1][grid_idx]
        pwz = pw[:, 2][grid_idx]
        # local coords (G, M, S): R^T (p - c)
        dx = pwx[:, None, :] - ccx[:, :, None]
        dy = pwy[:, None, :] - ccy[:, :, None]
        dz = pwz[:, None, :] - ccz[:, :, None]
        lx = r00[..., None] * dx + r10[..., None] * dy + r20[..., None] * dz
        ly = r01[..., None] * dx + r11[..., None] * dy + r21[..., None] * dz
        lz = r02[..., None] * dx + r12[..., None] * dy + r22[..., None] * dz
        qx = jnp.abs(lx) - chx[..., None]
        qy = jnp.abs(ly) - chy[..., None]
        qz = jnp.abs(lz) - chz[..., None]
        qxp, qyp, qzp = (jnp.maximum(qx, 0.0), jnp.maximum(qy, 0.0),
                         jnp.maximum(qz, 0.0))
        outside = jnp.sqrt(qxp * qxp + qyp * qyp + qzp * qzp)
        max_in = jnp.maximum(qx, jnp.maximum(qy, qz))
        sdf_box = outside + jnp.minimum(max_in, 0.0)
        r_loc = jnp.sqrt(lx * lx + ly * ly + lz * lz)
        sdf = (cbox[..., None] * sdf_box
               + csph[..., None] * (r_loc - chx[..., None])
               + (1.0 - cbox - csph)[..., None] * lz)
        depth = g_prad[:, None, :] - sdf  # (G, M, S)
        # pair legality: ~(same_entry | same_owner | same_group)
        same_entry = centry[..., None] == g_pentry[:, None, :]
        same_owner = ((ckind[..., None] == g_pkind[:, None, :])
                      & (cowner[..., None] == g_powner[:, None, :]))
        same_group = ((cgid[..., None] >= 0) & (g_pgid[:, None, :] >= 0)
                      & (cgid[..., None] == g_pgid[:, None, :]))
        legal = (~(same_entry | same_owner | same_group)
                 & cand_ok[..., None] & grid_valid[:, None, :])
        depth = jnp.where(legal, depth, -1e9)

        # per-point best-2 over the M candidates
        d1 = jnp.max(depth, axis=1)  # (G, S)
        m1 = jnp.argmax(depth, axis=1)
        m_iota = jax.lax.broadcasted_iota(jnp.int32, depth.shape, 1)
        depth2 = jnp.where(m_iota == m1[:, None, :], -1e9, depth)
        d2_ = jnp.max(depth2, axis=1)
        m2 = jnp.argmax(depth2, axis=1)
        c1 = jnp.take_along_axis(cand, m1, axis=1)  # (G, S)
        c2 = jnp.take_along_axis(cand, m2, axis=1)
        cand_depth = jnp.concatenate([d1.reshape(-1), d2_.reshape(-1)])
        cand_col = jnp.concatenate([c1.reshape(-1), c2.reshape(-1)])
        GS = G * S
        top_depth, top_i = jax.lax.top_k(cand_depth, K)
        pidx = flat_pt[top_i % GS]
        cidx = cand_col[top_i]
        return top_depth, pidx, cidx, pw, cp, cq, csize

    def narrowphase_nl(fk_pos, fk_quat, body_pos, body_quat, geom=None,
                       collision_filter=None) -> ContactSet:
        top_depth, pidx, cidx, pw, cp, cq, csize = _nl_select(
            fk_pos, fk_quat, body_pos, body_quat, geom, collision_filter)
        return _per_contact(top_depth, pidx, cidx, pw, cp, cq, csize)

    def select_nl(fk_pos, fk_quat, body_pos, body_quat, geom=None,
                  collision_filter=None):
        top_depth, pidx, cidx, *_ = _nl_select(
            fk_pos, fk_quat, body_pos, body_quat, geom, collision_filter)
        return top_depth, pidx, cidx

    narrowphase_nl.dense = narrowphase  # exact reference for tests
    narrowphase_nl.grid_shape = (G, M, S)
    narrowphase_nl.select = select_nl
    narrowphase_nl.refresh = refresh  # K-sized, selection-path-independent
    return narrowphase_nl, point_world


def _tangent_basis_soa(nx, ny, nz):
    """Two unit tangents orthogonal to n, componentwise. 6x (K,)."""
    use_x = jnp.abs(nx) < 0.7
    hx = jnp.where(use_x, 1.0, 0.0)
    hy = jnp.where(use_x, 0.0, 1.0)
    # t1 = n x h
    t1x = ny * 0.0 - nz * hy
    t1y = nz * hx - nx * 0.0
    t1z = nx * hy - ny * hx
    inv = 1.0 / jnp.maximum(jnp.sqrt(t1x * t1x + t1y * t1y + t1z * t1z), 1e-9)
    t1x, t1y, t1z = t1x * inv, t1y * inv, t1z * inv
    # t2 = n x t1
    t2x = ny * t1z - nz * t1y
    t2y = nz * t1x - nx * t1z
    t2z = nx * t1y - ny * t1x
    return (t1x, t1y, t1z), (t2x, t2y, t2z)


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
    fmag: jnp.ndarray  # (K,) impulse magnitude (diagnostics)
    dqd: jnp.ndarray  # (D,) robot velocity change
    dbody_v: jnp.ndarray  # (B, 3)
    dbody_w: jnp.ndarray  # (B, 3)


def solve_contact_qp(
    contacts: ContactSet,
    J_planes,  # (Jx, Jy, Jz): (K, D) contact-point translational jacobians
    r_pt,  # (rx, ry, rz): (K,) contact pos - point-body com, SoA
    r_col,  # (rx, ry, rz): (K,) collider side, SoA
    v_rel,  # (vx, vy, vz): (K,) world relative velocity (point - collider)
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
    fused_solver=None,
    segmented: bool = False,
    precond: str = "exact",
    pre_gathered=None,
    lam0=None,
):
    """Solve the contact impulse QP (see module docstring). Per-env.

    Flattened contact index is BASIS-MAJOR: row b*K + k (b in {n, t1, t2}).
    The Delassus A = A_robot + A_body where A_robot = Jr Minv Jr^T is two
    MXU matmuls and A_body is assembled from same-body-masked outer products
    (no B-sized contraction — see module docstring)."""
    K = contacts.depth.shape[0]
    B = inv_mass_b.shape[0]
    Jx, Jy, Jz = J_planes
    D = Jx.shape[1]
    nx, ny, nz = contacts.nx, contacts.ny, contacts.nz
    (t1x, t1y, t1z), (t2x, t2y, t2z) = _tangent_basis_soa(nx, ny, nz)
    # basis component planes bw[b][w]: (K,)
    bw = ((nx, ny, nz), (t1x, t1y, t1z), (t2x, t2y, t2z))
    # stacked basis world-components: bs[w] = (3K,), basis-major
    bs = tuple(jnp.concatenate([bw[b][w] for b in range(3)]) for w in range(3))

    if fused_solver is None:
        # robot jacobian in contact frame: (3K, D) basis-major, no transposes
        Jr = jnp.concatenate(
            [bw[b][0][:, None] * Jx + bw[b][1][:, None] * Jy + bw[b][2][:, None] * Jz
             for b in range(3)], axis=0
        )  # (3K, D)
        W = jax.lax.dot_general(
            Jr, inv_M, dimension_numbers=(((1,), (0,)), ((), ())), precision=HI
        )  # (3K, D)
        A = jax.lax.dot_general(
            W, Jr, dimension_numbers=(((1,), (1,)), ((), ())), precision=HI
        )  # (3K, 3K)

    if B > 0:
        valid_pt = contacts.body_pt >= 0
        valid_col = contacts.body_col >= 0
        bpt = jnp.clip(contacts.body_pt, 0, B - 1)
        bcl = jnp.clip(contacts.body_col, 0, B - 1)
        if pre_gathered is not None:
            # caller already gathered the per-contact mass slices as part of
            # its combined (B, 19) body-table gather (simulator.py substep)
            invm_pt, invm_col, Ii_pt, Ii_col = pre_gathered
        else:
            invm_pt = inv_mass_b[bpt] * valid_pt  # (K,)
            invm_col = inv_mass_b[bcl] * valid_col
            Ii_pt = inv_inertia_w[bpt] * valid_pt[:, None, None]  # (K, 3, 3)
            Ii_col = inv_inertia_w[bcl] * valid_col[:, None, None]
    else:
        zK = jnp.zeros_like(contacts.px)
        valid_pt = valid_col = zK > 0
        bpt = bcl = jnp.zeros_like(contacts.body_pt)
        invm_pt = invm_col = zK
        Ii_pt = Ii_col = jnp.zeros((K, 3, 3), dtype=zK.dtype)

    if fused_solver is not None:
        # --- fused Pallas path: A is assembled and iterated in VMEM -------
        # All stacking happens HERE (XLA, K-sized, fused for free); the
        # kernel is concat/transpose-free (see kernels/fused_contact.py).
        act_f = contacts.active
        vxf, vyf, vzf = v_rel
        b3f = [bw[b][0] * vxf + bw[b][1] * vyf + bw[b][2] * vzf
               for b in range(3)]
        bias_f = jnp.minimum(
            baumgarte / dt * jnp.maximum(contacts.depth, 0.0),
            max_depenetration_vel)
        mu_f = jnp.where(act_f, contacts.friction, 0.0)
        rpx, rpy, rpz = r_pt
        rcx, rcy, rcz = r_col

        # contact-frame robot jacobian, (D, 3K) basis-major columns
        Jr_blocks = [bw[b][0][:, None] * Jx + bw[b][1][:, None] * Jy
                     + bw[b][2][:, None] * Jz for b in range(3)]  # (K, D) x3
        JrT = jnp.concatenate(Jr_blocks, axis=0).T  # (D, 3K)

        def g_planes(rx, ry, rz, b):  # (r x basis_b) K-planes
            return (ry * bw[b][2] - rz * bw[b][1],
                    rz * bw[b][0] - rx * bw[b][2],
                    rx * bw[b][1] - ry * bw[b][0])

        gp = [g_planes(rpx, rpy, rpz, b) for b in range(3)]  # [b][x]
        gc = [g_planes(rcx, rcy, rcz, b) for b in range(3)]

        # body-coupling factors: A_body = Xb^T Yb (docstring of
        # kernels/fused_contact.py derives the equivalence to the masked
        # outer-product assembly below)
        x_rows, y_rows = [], []
        for beta in range(B):
            pt_oh = ((contacts.body_pt == beta) & valid_pt).astype(jnp.float32)
            col_oh = ((contacts.body_col == beta) & valid_col).astype(jnp.float32)
            d3 = jnp.tile(pt_oh - col_oh, 3)  # (3K,)
            im = inv_mass_b[beta]
            Ii = inv_inertia_w[beta]  # (3, 3)
            h = [jnp.concatenate(
                [pt_oh * gp[b][x] - col_oh * gc[b][x] for b in range(3)])
                for x in range(3)]  # (3K,) per x
            for w in range(3):
                x_rows.append(bs[w] * d3)
                y_rows.append(im * bs[w] * d3)
            for x in range(3):
                x_rows.append(h[x])
                y_rows.append(Ii[x, 0] * h[0] + Ii[x, 1] * h[1]
                              + Ii[x, 2] * h[2])
        RB = max(8, ((6 * B + 7) // 8) * 8)
        while len(x_rows) < RB:  # pad to the tile-aligned row count
            x_rows.append(jnp.zeros(3 * K, dtype=jnp.float32))
            y_rows.append(jnp.zeros(3 * K, dtype=jnp.float32))
        Xb = jnp.stack(x_rows)  # (RB, 3K)
        Yb = jnp.stack(y_rows)

        vec = jnp.zeros((8, 3 * K), dtype=jnp.float32)
        vec = vec.at[0].set(jnp.concatenate(
            [b3f[0] - bias_f, b3f[1], b3f[2]]))
        vec = vec.at[1].set(jnp.tile(act_f.astype(jnp.float32), 3))
        veck = jnp.zeros((8, K), dtype=jnp.float32)
        veck = veck.at[0].set(mu_f)
        veck = veck.at[1].set(act_f.astype(jnp.float32))

        lam3, dqd = fused_solver(JrT, inv_M, Xb, Yb, vec, veck)
        lam_k = lam3.T
        fx = bw[0][0] * lam3[0] + bw[1][0] * lam3[1] + bw[2][0] * lam3[2]
        fy = bw[0][1] * lam3[0] + bw[1][1] * lam3[1] + bw[2][1] * lam3[2]
        fz = bw[0][2] * lam3[0] + bw[1][2] * lam3[1] + bw[2][2] * lam3[2]
        fmag = jnp.sqrt(fx * fx + fy * fy + fz * fz)
        if B > 0:
            ohT_pt = ((jnp.arange(B, dtype=jnp.int32)[:, None]
                       == contacts.body_pt[None, :])
                      & valid_pt[None, :]).astype(jnp.float32)
            ohT_col = ((jnp.arange(B, dtype=jnp.int32)[:, None]
                        == contacts.body_col[None, :])
                       & valid_col[None, :]).astype(jnp.float32)
            f_kw = jnp.stack([fx, fy, fz], axis=-1)
            dbody_v = inv_mass_b[:, None] * (ohT_pt @ f_kw - ohT_col @ f_kw)
            tq_pt = jnp.stack(
                [rpy * fz - rpz * fy, rpz * fx - rpx * fz,
                 rpx * fy - rpy * fx], axis=-1)
            tq_col = jnp.stack(
                [rcy * fz - rcz * fy, rcz * fx - rcx * fz,
                 rcx * fy - rcy * fx], axis=-1)
            tq = ohT_pt @ tq_pt - ohT_col @ tq_col
            dbody_w = jnp.einsum("bxy,by->bx", inv_inertia_w, tq, precision=HI)
        else:
            dbody_v = jnp.zeros((0, 3), dtype=lam3.dtype)
            dbody_w = jnp.zeros((0, 3), dtype=lam3.dtype)
        return SolveResult(
            impulses=lam_k,
            fmag=jnp.where(act_f, fmag, 0.0),
            dqd=dqd,
            dbody_v=dbody_v,
            dbody_w=dbody_w,
        )

    # the segmented path never materializes A for the ITERATIONS; with
    # precond="exact" it is still assembled once for the row-sum
    # preconditioner (bit-identical step sizes to the dense path), with
    # precond="cs" not at all (Cauchy-Schwarz bound, see below)
    need_A = (not segmented) or precond == "exact"

    if B > 0:
        # arm x basis planes g[side][x] = (3K,): (r x basis_b)_x per contact
        def arm_cross(r, sign):
            rx, ry, rz = r
            gx = jnp.concatenate([ry * bw[b][2] - rz * bw[b][1] for b in range(3)])
            gy = jnp.concatenate([rz * bw[b][0] - rx * bw[b][2] for b in range(3)])
            gz = jnp.concatenate([rx * bw[b][1] - ry * bw[b][0] for b in range(3)])
            return (gx, gy, gz)

        g_pt = arm_cross(r_pt, +1.0)
        g_col = arm_cross(r_col, +1.0)

        # u_rot[side][x] = (Iinv_side g_side)_x stacked (3K,)
        def rot_u(Ii, g):
            Ii3 = jnp.tile(Ii, (3, 1, 1))  # (3K, 3, 3) basis-major tile
            return tuple(
                Ii3[:, x, 0] * g[0] + Ii3[:, x, 1] * g[1] + Ii3[:, x, 2] * g[2]
                for x in range(3)
            )

        u_rot_pt = rot_u(Ii_pt, g_pt)
        u_rot_col = rot_u(Ii_col, g_col)
        invm_pt3 = jnp.tile(invm_pt, 3)  # (3K,)
        invm_col3 = jnp.tile(invm_col, 3)

    if B > 0 and need_A:
        # same-body pair masks, expanded to (3K, 3K) by basis-major tiling
        def pair_mask(bm, vm, bn, vn):
            m = (bm[:, None] == bn[None, :]) & vm[:, None] & vn[None, :]
            return jnp.tile(m.astype(jnp.float32), (3, 3))

        S_pp = pair_mask(bpt, valid_pt, bpt, valid_pt)
        S_pc = pair_mask(bpt, valid_pt, bcl, valid_col)
        S_cp = pair_mask(bcl, valid_col, bpt, valid_pt)
        S_cc = pair_mask(bcl, valid_col, bcl, valid_col)

        def tr_block(u_invm3):
            # sum_w outer(bs[w], bs[w] * u_invm3)  — invm on the n side
            return sum(bs[w][:, None] * (bs[w] * u_invm3)[None, :] for w in range(3))

        def rot_block(g_m, u_n):
            return sum(g_m[x][:, None] * u_n[x][None, :] for x in range(3))

        A = A + S_pp * (tr_block(invm_pt3) + rot_block(g_pt, u_rot_pt))
        A = A - S_pc * (tr_block(invm_col3) + rot_block(g_pt, u_rot_col))
        A = A - S_cp * (tr_block(invm_pt3) + rot_block(g_col, u_rot_pt))
        A = A + S_cc * (tr_block(invm_col3) + rot_block(g_col, u_rot_col))

    act = contacts.active
    vx, vy, vz = v_rel
    b3 = [bw[b][0] * vx + bw[b][1] * vy + bw[b][2] * vz for b in range(3)]
    bias = jnp.minimum(
        baumgarte / dt * jnp.maximum(contacts.depth, 0.0), max_depenetration_vel
    )
    b = jnp.concatenate([b3[0] - bias, b3[1], b3[2]])  # (3K,)

    reg = compliance
    on_pt_f = valid_pt.astype(jnp.float32)
    on_col_f = valid_col.astype(jnp.float32)
    if B > 0 and (segmented or precond == "cs"):
        oh_pt = ((jnp.arange(B, dtype=jnp.int32)[:, None]
                  == contacts.body_pt[None, :])
                 & valid_pt[None, :]).astype(jnp.float32)  # (B, K)
        oh_col = ((jnp.arange(B, dtype=jnp.int32)[:, None]
                   == contacts.body_col[None, :])
                  & valid_col[None, :]).astype(jnp.float32)

    if need_A:
        act_cols = jnp.tile(act, 3)
        row_sum = jnp.sum(jnp.abs(A) * act_cols[None, :], axis=1)
        row_sum = jnp.max(row_sum.reshape(3, K), axis=0)  # (K,)
    else:
        # Cauchy-Schwarz bound: A is PSD so |A_kj| <= sqrt(A_kk A_jj); rows
        # couple only through a shared body or the robot, so
        # rowsum_k <= s_k * (T[body_pt(k)] + T[body_col(k)] + rob_k * T_rob)
        # with s = sqrt(diag A) and T the per-body/robot s-mass. An upper
        # bound => smaller Jacobi steps (never divergence); heap physics
        # quality is pinned by tests/test_segmented_qp.py
        diag_r = jnp.sum(W * Jr, axis=1)  # (3K,)
        if B > 0:
            # invm_pt / u_rot_pt are already validity-masked (zero rows for
            # static/kinematic/robot-owned sides)
            diag_b = (invm_pt3 + sum(g_pt[x] * u_rot_pt[x] for x in range(3))
                      + invm_col3
                      + sum(g_col[x] * u_rot_col[x] for x in range(3)))
        else:
            diag_b = 0.0
        s = jnp.sqrt(jnp.maximum(diag_r + diag_b, 0.0))  # (3K,)
        s3 = s.reshape(3, K)
        sc = jnp.sum(s3, axis=0) * act  # (K,) per-contact s-mass
        rob = (((contacts.link_pt >= 0) | (contacts.link_col >= 0)) & act)
        t_rob = jnp.sum(jnp.where(rob, sc, 0.0))
        per_k = rob.astype(jnp.float32) * t_rob
        if B > 0:
            T = (jax.lax.dot_general(oh_pt, sc[:, None],
                                     (((1,), (0,)), ((), ())), precision=HI)
                 + jax.lax.dot_general(oh_col, sc[:, None],
                                       (((1,), (0,)), ((), ())), precision=HI)
                 )[:, 0]  # (B,)
            per_k = per_k + on_pt_f * T[bpt] + on_col_f * T[bcl]
        row_sum = jnp.max(s3, axis=0) * per_k
    alpha = 1.0 / (jnp.maximum(row_sum, 1e-6) + reg)
    mu = jnp.where(act, contacts.friction, 0.0)

    from .kernels.qp import _project_cone_bm, qp_iterations

    if segmented:
        # matrix-free projected Jacobi: per iteration the body coupling is
        # (scatter contact wrenches to bodies via (B, K) one-hot matmuls)
        # -> (apply per-body inverse mass/inertia) -> (gather responses back
        # to contacts). HBM per iteration is O(B + K), vs the dense path
        # re-reading the (3K, 3K) Delassus every iteration (2.7 GB/substep
        # at Search scale: B=132, K=192, 128 envs)
        rpx, rpy, rpz = r_pt
        rcx, rcy, rcz = r_col

        def Aop(lam):
            t = jax.lax.dot_general(lam, Jr, (((0,), (0,)), ((), ())),
                                    precision=HI)  # (D,) = Jr^T lam
            a_r = jax.lax.dot_general(W, t, (((1,), (0,)), ((), ())),
                                      precision=HI)  # (3K,)
            if B == 0:
                return a_r
            lam3 = lam.reshape(3, K)
            fx = bw[0][0] * lam3[0] + bw[1][0] * lam3[1] + bw[2][0] * lam3[2]
            fy = bw[0][1] * lam3[0] + bw[1][1] * lam3[1] + bw[2][1] * lam3[2]
            fz = bw[0][2] * lam3[0] + bw[1][2] * lam3[1] + bw[2][2] * lam3[2]
            tpx = rpy * fz - rpz * fy
            tpy = rpz * fx - rpx * fz
            tpz = rpx * fy - rpy * fx
            tcx = rcy * fz - rcz * fy
            tcy = rcz * fx - rcx * fz
            tcz = rcx * fy - rcy * fx
            Fp = jnp.stack([fx, fy, fz, tpx, tpy, tpz], axis=1)  # (K, 6)
            Fc = jnp.stack([fx, fy, fz, tcx, tcy, tcz], axis=1)
            U = (jax.lax.dot_general(oh_pt, Fp, (((1,), (0,)), ((), ())),
                                     precision=HI)
                 - jax.lax.dot_general(oh_col, Fc, (((1,), (0,)), ((), ())),
                                       precision=HI))  # (B, 6)
            vb = inv_mass_b[:, None] * U[:, :3]
            wb = jnp.einsum("bxy,by->bx", inv_inertia_w, U[:, 3:],
                            precision=HI)
            vw = jnp.concatenate([vb, wb], axis=1)  # (B, 6)
            # gather-back as one-hot dots (the (K,)-row dynamic gathers cost
            # ~60 ns/row when XLA peels an iteration out of the while loop —
            # 3 ms/substep at Search scale; the (K, B) x (B, 6) matmul is
            # trivial flops and layout-stable)
            g_p = jax.lax.dot_general(oh_pt, vw, (((0,), (0,)), ((), ())),
                                      precision=HI)  # (K, 6)
            g_c = jax.lax.dot_general(oh_col, vw, (((0,), (0,)), ((), ())),
                                      precision=HI)
            vp, wp = g_p[:, 0:3], g_p[:, 3:6]
            vc, wc = g_c[:, 0:3], g_c[:, 3:6]
            dux = (on_pt_f * (vp[:, 0] + wp[:, 1] * rpz - wp[:, 2] * rpy)
                   - on_col_f * (vc[:, 0] + wc[:, 1] * rcz - wc[:, 2] * rcy))
            duy = (on_pt_f * (vp[:, 1] + wp[:, 2] * rpx - wp[:, 0] * rpz)
                   - on_col_f * (vc[:, 1] + wc[:, 2] * rcx - wc[:, 0] * rcz))
            duz = (on_pt_f * (vp[:, 2] + wp[:, 0] * rpy - wp[:, 1] * rpx)
                   - on_col_f * (vc[:, 2] + wc[:, 0] * rcy - wc[:, 1] * rcx))
            ab = jnp.concatenate(
                [bw[c][0] * dux + bw[c][1] * duy + bw[c][2] * duz
                 for c in range(3)])
            return a_r + ab

        def body_it(_, lam):
            grad = Aop(lam) + reg * lam + b
            lam2 = lam.reshape(3, K) - alpha[None, :] * grad.reshape(3, K)
            lam2 = _project_cone_bm(lam2, mu)
            lam2 = jnp.where(act[None, :], lam2, 0.0)
            return lam2.reshape(3 * K)

        from .kernels.qp import qp_first_iterate

        if lam0 is None:
            init = qp_first_iterate(b, alpha, mu, act)
            n_it = iterations - 1
        else:
            # warm start (PhysX-style impulse caching): project the caller's
            # previous-solve impulses onto the current cone and iterate the
            # full budget from there
            init = jnp.where(act[None, :],
                             _project_cone_bm(lam0.reshape(3, K), mu),
                             0.0).reshape(3 * K)
            n_it = iterations
        lam = jax.lax.fori_loop(0, n_it, body_it, init)
    else:
        lam = qp_iterations(
            A, b, alpha, mu, act,
            iterations=iterations, reg=reg, use_pallas=use_pallas,
        )
    lam3 = lam.reshape(3, K)  # basis-major
    lam_k = lam3.T  # (K, 3)
    # world impulse components (K,)
    fx = bw[0][0] * lam3[0] + bw[1][0] * lam3[1] + bw[2][0] * lam3[2]
    fy = bw[0][1] * lam3[0] + bw[1][1] * lam3[1] + bw[2][1] * lam3[2]
    fz = bw[0][2] * lam3[0] + bw[1][2] * lam3[1] + bw[2][2] * lam3[2]
    fmag = jnp.sqrt(fx * fx + fy * fy + fz * fz)

    dqd = jax.lax.dot_general(
        W, lam, dimension_numbers=(((0,), (0,)), ((), ())), precision=HI
    )  # (D,)
    if B > 0:
        # scatter-free: one-hot accumulate via (B, K) masks x (K,) planes
        ohT_pt = ((jnp.arange(B, dtype=jnp.int32)[:, None] == contacts.body_pt[None, :])
                  & valid_pt[None, :]).astype(jnp.float32)  # (B, K)
        ohT_col = ((jnp.arange(B, dtype=jnp.int32)[:, None] == contacts.body_col[None, :])
                   & valid_col[None, :]).astype(jnp.float32)
        f_kw = jnp.stack([fx, fy, fz], axis=-1)  # (K, 3) — tiny matmul operand
        dbody_v = inv_mass_b[:, None] * (ohT_pt @ f_kw - ohT_col @ f_kw)
        rpx, rpy, rpz = r_pt
        rcx, rcy, rcz = r_col
        tq_pt = jnp.stack(
            [rpy * fz - rpz * fy, rpz * fx - rpx * fz, rpx * fy - rpy * fx], axis=-1
        )  # (K, 3)
        tq_col = jnp.stack(
            [rcy * fz - rcz * fy, rcz * fx - rcx * fz, rcx * fy - rcy * fx], axis=-1
        )
        tq = ohT_pt @ tq_pt - ohT_col @ tq_col  # (B, 3)
        dbody_w = jnp.einsum("bxy,by->bx", inv_inertia_w, tq, precision=HI)
    else:
        dbody_v = jnp.zeros((0, 3), dtype=b.dtype)
        dbody_w = jnp.zeros((0, 3), dtype=b.dtype)

    return SolveResult(
        impulses=lam_k,
        fmag=jnp.where(act, fmag, 0.0),
        dqd=dqd,
        dbody_v=dbody_v,
        dbody_w=dbody_w,
    )
