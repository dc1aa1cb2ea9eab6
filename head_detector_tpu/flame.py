"""FLAME 3DMM decoder in pure JAX: blendshapes + LBS + 6DoF similarity transform.

Functional spec: reference ``head_detector/flame.py`` (FLAMELayer.forward at
``:122-169`` and ``reproject_spatial_vertices`` at ``:179-208``), which
delegates the core linear blend skinning to ``smplx.lbs.lbs`` (external).
Here the whole decode is one fused XLA program, vmappable over any number of
detections, and the heavy step — the ``[N, 400] x [400, V*3]`` blendshape
contraction — maps straight onto the TPU MXU.

Conventions replicated exactly:
* betas = concat(shape padded to 300, expression padded to 100)
* full pose = [global=0, neck, jaw, eyeballs]; global rotation is always zero
  inside LBS — the head rotation is applied afterwards from the 6DoF params.
* After LBS, ``z += MESH_OFFSET_Z`` (0.05) — skull-center offset
  (ref ``flame.py:34,164``).
* ``reproject_spatial_vertices``: canonical verts (zero_rot) -> rotate by
  6DoF R -> scale (clamped >= 1e-8) -> + translation (ref ``flame.py:190-199``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from head_detector_tpu.assets_io import FlameAssets, load_flame_assets
from head_detector_tpu.head_info import FLAME_CONSTS, FlameParams
from head_detector_tpu.ops.rotation import rodrigues, rot_mat_from_6dof

MAX_SHAPE = 300
MAX_EXPRESSION = 100
MESH_OFFSET_Z = 0.05

# TPU einsums default to one-pass bf16 (~4e-3 relative error) — far over the
# 1e-3 vertex parity budget.  The LBS contractions are tiny (j=5, 3x3, 4x4),
# so full-f32 HIGHEST precision costs ~0 wall clock: the decode stays
# memory-bound, not MXU-bound.  (The [N,400]x[400,V*3] blendshape matmuls are
# the only FLOP-heavy dots; they use HIGH — see lbs().)
_EXACT = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class FlameModel:
    """Device-resident FLAME constants as a pytree of jnp arrays."""

    v_template: jnp.ndarray  # [V, 3]
    shapedirs_flat: jnp.ndarray  # [400, V*3]  (transposed for one big MXU matmul)
    posedirs: jnp.ndarray  # [36, V*3]
    j_regressor: jnp.ndarray  # [J, V]
    lbs_weights: jnp.ndarray  # [V, J]
    parents: Tuple[int, ...]  # static python tuple — drives the unrolled chain
    faces: jnp.ndarray  # [F, 3] int32
    # Optional precomputed joint regression (set by .subset()): joints are
    # then computed directly from betas instead of from the shaped mesh, so
    # per-vertex arrays may cover only a vertex subset while joints stay
    # exactly those of the FULL mesh.
    joint_template: Optional[jnp.ndarray] = None  # [J, 3]
    joint_shapedirs: Optional[jnp.ndarray] = None  # [400, J*3]

    @classmethod
    def from_assets(cls, assets: Optional[FlameAssets] = None, dtype=jnp.float32) -> "FlameModel":
        if assets is None:
            assets = load_flame_assets()
        v = assets.v_template.shape[0]
        shapedirs_flat = (
            assets.shapedirs.reshape(v * 3, -1).T.astype(dtype)
        )  # [400, V*3]
        return cls(
            v_template=jnp.asarray(assets.v_template, dtype),
            shapedirs_flat=jnp.asarray(shapedirs_flat, dtype),
            posedirs=jnp.asarray(assets.posedirs, dtype),
            j_regressor=jnp.asarray(assets.j_regressor, dtype),
            lbs_weights=jnp.asarray(assets.lbs_weights, dtype),
            parents=tuple(int(p) for p in assets.parents),
            faces=jnp.asarray(assets.faces, jnp.int32),
        )

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]

    def subset(self, indices) -> "FlameModel":
        """Vertex-subset decode model: identical math on ``len(indices)``
        vertices.

        The LBS joints normally regress from the full shaped mesh
        (``j_regressor @ v_shaped``); since ``v_shaped`` is affine in betas,
        that regression folds into per-joint constants
        (``joint_template = Jreg @ v_template``, ``joint_shapedirs = Jreg @
        shapedirs``, both precomputed in f64) — so the subset decode
        produces the joints of the full model to ~1e-7 (f32 reassociation
        only) while every per-vertex array (template,
        blendshapes, pose correctives, skinning weights) is sliced.  For the
        reference's own metrics subset ("head", 2470 of 5023 verts — see
        ``yolo_head_loss.py:309-320``) this halves the decode FLOPs and the
        output bytes.  Faces are remapped to the subset (triangles fully
        inside it), matching ``pncc_processor.py:25-29`` semantics.
        """
        idx = np.asarray(indices, np.int64)
        v = self.num_vertices
        nb = self.shapedirs_flat.shape[0]
        sd3 = np.asarray(self.shapedirs_flat).reshape(nb, v, 3)
        jreg = np.asarray(self.j_regressor, np.float64)
        joint_template = jreg @ np.asarray(self.v_template, np.float64)  # [J, 3]
        joint_shapedirs = np.einsum("jv,kvc->kjc", jreg, sd3.astype(np.float64))
        nj = jreg.shape[0]

        faces_np = np.asarray(self.faces)
        inside = np.isin(faces_np, idx).all(axis=1)
        remap = np.full(v, -1, np.int64)
        remap[idx] = np.arange(idx.size)
        sub_faces = remap[faces_np[inside]]

        pd3 = np.asarray(self.posedirs).reshape(-1, v, 3)
        return FlameModel(
            v_template=jnp.asarray(np.asarray(self.v_template)[idx]),
            shapedirs_flat=jnp.asarray(
                np.ascontiguousarray(sd3[:, idx]).reshape(nb, idx.size * 3)
            ),
            posedirs=jnp.asarray(
                np.ascontiguousarray(pd3[:, idx]).reshape(pd3.shape[0], idx.size * 3)
            ),
            j_regressor=jnp.asarray(np.asarray(self.j_regressor)[:, idx]),
            lbs_weights=jnp.asarray(np.asarray(self.lbs_weights)[idx]),
            parents=self.parents,
            faces=jnp.asarray(sub_faces, jnp.int32),
            joint_template=jnp.asarray(joint_template.astype(np.asarray(self.v_template).dtype)),
            joint_shapedirs=jnp.asarray(
                joint_shapedirs.reshape(nb, nj * 3).astype(np.asarray(self.v_template).dtype)
            ),
        )


jax.tree_util.register_pytree_node(
    FlameModel,
    lambda m: (
        (m.v_template, m.shapedirs_flat, m.posedirs, m.j_regressor, m.lbs_weights,
         m.faces, m.joint_template, m.joint_shapedirs),
        m.parents,
    ),
    lambda parents, leaves: FlameModel(
        v_template=leaves[0],
        shapedirs_flat=leaves[1],
        posedirs=leaves[2],
        j_regressor=leaves[3],
        lbs_weights=leaves[4],
        parents=parents,
        faces=leaves[5],
        joint_template=leaves[6],
        joint_shapedirs=leaves[7],
    ),
)


def _pad_to(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Zero-pad the last dim to ``width`` (ref flame.py:131-140 beta padding)."""
    cur = x.shape[-1]
    if cur == width:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, width - cur)])


def _rigid_transform_chain(
    rot_mats: jnp.ndarray, joints: jnp.ndarray, parents: Tuple[int, ...]
) -> jnp.ndarray:
    """Forward-kinematics chain -> per-joint relative transforms for skinning.

    :param rot_mats: [N, J, 3, 3]
    :param joints:   [N, J, 3]
    :return:         [N, J, 4, 4] transforms with the rest-pose joint removed
                     (the `A - pack(A @ [J;0])` step of standard SMPL LBS).
    """
    n, j = joints.shape[0], joints.shape[1]
    rel_joints = joints - jnp.concatenate(
        [jnp.zeros_like(joints[:, :1]), joints[:, [max(p, 0) for p in parents][1:]]], axis=1
    ) * jnp.asarray([0.0] + [1.0] * (j - 1), joints.dtype)[None, :, None]

    def make_tf(R, t):  # [N,3,3],[N,3] -> [N,4,4]
        top = jnp.concatenate([R, t[..., None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype), t.shape[:-1] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)

    # J is tiny (5) and `parents` is static — unroll the chain in python.
    world = [make_tf(rot_mats[:, 0], rel_joints[:, 0])]
    for i in range(1, j):
        local = make_tf(rot_mats[:, i], rel_joints[:, i])
        world.append(jnp.einsum("nij,njk->nik", world[parents[i]], local, precision=_EXACT))
    A = jnp.stack(world, axis=1)  # [N, J, 4, 4]

    # subtract the transformed rest joint so skinning acts on offsets
    posed_joint = A[..., :3, 3]
    correction = jnp.einsum("njab,njb->nja", A[..., :3, :3], joints, precision=_EXACT)
    A_rel = A.at[..., :3, 3].set(posed_joint - correction)
    return A_rel


def lbs(
    model: FlameModel,
    betas: jnp.ndarray,  # [N, 400]
    full_pose: jnp.ndarray,  # [N, J*3] axis-angle per joint
    pre_transform: Optional[jnp.ndarray] = None,  # [N, 4, 4] affine
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear blend skinning (functional equivalent of smplx.lbs.lbs).

    :param pre_transform: optional per-head affine M folded into the per-joint
        transforms (A_j <- M @ A_j).  Because skinning is linear in A, this
        applies M to the skinned output without a separate [N, V, 3] pass —
        the 6DoF rotate/scale/translate of ``fused_project_vertices`` rides
        the skinning einsum for free.  Joints are returned untransformed.
    :return: (vertices [N, V, 3], joints [N, J, 3])
    """
    n = betas.shape[0]
    v = model.num_vertices
    dtype = model.v_template.dtype

    # 1. shape/expression blendshapes: one MXU matmul [N,400]x[400,V*3].
    # HIGH precision (3-pass bf16 on the MXU, ~2e-7 relative error) keeps
    # vertex error orders of magnitude under the 1e-3 L2 parity budget at
    # half the MXU passes of HIGHEST.
    offsets = jnp.dot(
        betas.astype(dtype),
        model.shapedirs_flat,
        preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGH,
    ).reshape(n, v, 3)
    v_shaped = model.v_template[None] + offsets

    # 2. joints from the shaped mesh — or, on a vertex-subset model, directly
    # from betas via the precomputed full-mesh joint regression (see .subset())
    if model.joint_template is not None:
        nj = model.joint_template.shape[0]
        joints = model.joint_template[None] + jnp.dot(
            betas.astype(dtype), model.joint_shapedirs, precision=_EXACT
        ).reshape(n, nj, 3)
    else:
        joints = jnp.einsum("jv,nvc->njc", model.j_regressor, v_shaped, precision=_EXACT)

    # 3. pose correctives (explicit sizes keep zero-batch inputs legal)
    num_joints = full_pose.shape[-1] // 3
    rot_mats = rodrigues(full_pose.reshape(n, num_joints, 3))  # [N, J, 3, 3]
    ident = jnp.eye(3, dtype=dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(n, (num_joints - 1) * 9)
    pose_offsets = jnp.dot(
        pose_feature,
        model.posedirs,
        preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGH,
    ).reshape(n, v, 3)
    v_posed = v_shaped + pose_offsets

    # 4. skinning via the blended per-vertex AFFINE transform: only the 3x4
    # rows of each 4x4 joint transform participate, so blend [V,5]x[N,5,12]
    # and apply — bit-exact vs blending full 4x4s, and measurably cheaper
    # (28.4 -> 6.7 ms isolated for N=3200; the bottom row is dead weight XLA
    # does not always DCE).  An unrolled 5-joint accumulation was measured
    # SLOWER than the blended form on v5e (10.6 vs 6.7 ms isolated; 487 vs
    # 460 img/s end-to-end), so keep the single blend.
    A = _rigid_transform_chain(rot_mats, joints, model.parents)  # [N, J, 4, 4]
    if pre_transform is not None:
        A = jnp.einsum("nab,njbc->njac", pre_transform.astype(dtype), A, precision=_EXACT)
    j_ = A.shape[1]
    a12 = A[:, :, :3, :].reshape(n, j_, 12)
    T = jnp.einsum("vj,njk->nvk", model.lbs_weights, a12, precision=_EXACT)
    T = T.reshape(n, v, 3, 4)  # [N, V, 3, 4] affine
    verts = (
        jnp.einsum("nvab,nvb->nva", T[..., :3], v_posed, precision=_EXACT) + T[..., 3]
    )
    return verts, joints


def _betas_and_pose(
    model: FlameModel, params: FlameParams, zero_jaw: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack FlameParams into the (betas [N,400], full_pose [N,J*3]) LBS inputs."""
    n = params.shape.shape[0]
    dtype = model.v_template.dtype

    betas = jnp.concatenate(
        [
            _pad_to(params.shape.astype(dtype), MAX_SHAPE),
            _pad_to(params.expression.astype(dtype), MAX_EXPRESSION),
        ],
        axis=1,
    )

    def _or_zeros(x, width):
        if x is None or 0 in x.shape:
            return jnp.zeros((n, width), dtype)
        return x.astype(dtype)

    neck = _or_zeros(params.neck, 3)
    eyeballs = _or_zeros(params.eyeballs, 6)
    jaw = _or_zeros(params.jaw, 3)
    if zero_jaw:
        jaw = jnp.zeros_like(jaw)
    global_rot = jnp.zeros((n, 3), dtype)
    full_pose = jnp.concatenate([global_rot, neck, jaw, eyeballs], axis=1)
    return betas, full_pose


def flame_vertices(
    model: FlameModel,
    params: FlameParams,
    zero_rot: bool = False,
    zero_jaw: bool = False,
) -> jnp.ndarray:
    """FLAMELayer.forward equivalent (ref flame.py:122-169).

    :param params: FlameParams with [N, C] fields (jaw/neck/eyeballs may have
                   zero-width second dims, then they default to zeros).
    :return: canonical-or-rotated vertices [N, V, 3].
    """
    dtype = model.v_template.dtype
    betas, full_pose = _betas_and_pose(model, params, zero_jaw=zero_jaw)
    verts, _ = lbs(model, betas, full_pose)
    verts = verts.at[:, :, 2].add(MESH_OFFSET_Z)

    if not zero_rot:
        R = rot_mat_from_6dof(params.rotation.astype(dtype))  # [N, 3, 3]
        verts = jnp.einsum("nab,nvb->nva", R, verts, precision=_EXACT)
    return verts


def reproject_spatial_vertices(
    model: FlameModel,
    flame_params: jnp.ndarray,  # [..., 413]
    to_2d: bool = True,
    subset_indexes: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode packed params -> (canonical verts, R, projected verts).

    Reference ``flame.py:179-208``: canonical verts (zero rot, +z offset),
    rotate by 6DoF R, multiply by scale clamped to >= 1e-8, add translation.
    Unlike the reference there is no zero-batch special case — the math is
    shape-polymorphic and a (0, 413) input simply yields (0, ...) outputs.

    :return: vertices [N, V, 3] canonical, rotation [N, 3, 3],
             projected [..., V, 2 or 3]
    """
    lead_shape = flame_params.shape[:-1]
    flat = flame_params.reshape(
        int(np.prod(lead_shape, dtype=np.int64)), flame_params.shape[-1]
    )
    p = FlameParams.from_3dmm(flat, FLAME_CONSTS)

    vertices = flame_vertices(model, p, zero_rot=True)
    R = rot_mat_from_6dof(p.rotation.astype(vertices.dtype))
    rot_vertices = jnp.einsum("nab,nvb->nva", R, vertices, precision=_EXACT)
    scale = jnp.clip(p.scale[:, None], 1e-8, None)  # [N, 1, 1]
    projected = rot_vertices * scale + p.translation[:, None, :]

    if subset_indexes is not None:
        projected = projected[:, subset_indexes]
    if to_2d:
        projected = projected[..., :2]
    projected = projected.reshape(lead_shape + projected.shape[-2:])
    return vertices, R, projected


def fused_project_vertices(
    model: FlameModel,
    flame_params: jnp.ndarray,  # [..., 413]
    to_2d: bool = False,
    subset_indexes: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Projected vertices only, with the 6DoF transform folded into skinning.

    Same math as ``reproject_spatial_vertices`` (ref flame.py:179-208) when
    only the projected output is consumed, but the rotate / scale / translate
    and the MESH_OFFSET_Z shift are composed into a single per-head affine
    ``M = [[s*R, s*R*[0,0,oz] + t], [0, 1]]`` that left-multiplies the five
    per-joint skinning transforms — so the big [N, V, 3] vertex tensor is
    streamed exactly once (the skinning einsum) instead of four times.
    Measured 2.6 ms faster per 3200 heads on v5e.  Canonical vertices are
    never materialized; use ``reproject_spatial_vertices`` when they are
    needed (training loss, post-prediction).

    :return: (rotation [N, 3, 3], projected [..., V, 2 or 3])
    """
    lead_shape = flame_params.shape[:-1]
    flat = flame_params.reshape(
        int(np.prod(lead_shape, dtype=np.int64)), flame_params.shape[-1]
    )
    p = FlameParams.from_3dmm(flat, FLAME_CONSTS)
    dtype = model.v_template.dtype
    n = flat.shape[0]

    R = rot_mat_from_6dof(p.rotation.astype(dtype))  # [N, 3, 3]
    scale = jnp.clip(p.scale.astype(dtype), 1e-8, None)  # [N, 1]
    sr = R * scale[:, :, None]  # s * R
    t_eff = p.translation.astype(dtype) + sr[:, :, 2] * MESH_OFFSET_Z
    bottom = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype), (n, 1, 4))
    m = jnp.concatenate([jnp.concatenate([sr, t_eff[:, :, None]], axis=2), bottom], axis=1)

    betas, full_pose = _betas_and_pose(model, p)
    projected, _ = lbs(model, betas, full_pose, pre_transform=m)

    if subset_indexes is not None:
        projected = projected[:, subset_indexes]
    if to_2d:
        projected = projected[..., :2]
    projected = projected.reshape(lead_shape + projected.shape[-2:])
    return R, projected
